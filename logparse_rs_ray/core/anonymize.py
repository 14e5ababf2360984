"""Deterministic field anonymization, byte-compatible with the reference.

Config format = the reference's anonymizer JSON (version 1):
/root/reference/crates/logparse_core/src/anonymizer/rules.rs:5-53 and
docs/python/anonymizer.md.  Semantics pinned against anonymizer/table.rs:

* rule resolution: field rule's ``mode`` wins, else ``defaults.mode``, else
  passthrough (table.rs:17-27).  When a field rule exists, its ``tokenize``
  cfg REPLACES the defaults cfg entirely (missing prefix falls back to
  ``"T_"``, NOT to the defaults prefix) — table.rs:25, 52.
* token = ``prefix + 16 lowercase hex chars`` of FNV-1a 64 over
  ``field_salt ++ defaults_salt ++ value`` (field salt prepends the defaults
  salt; table.rs:28-44).
* ``fixed`` without a value -> ``"REDACTED"`` (table.rs:58, 64-66).
* ``map`` miss falls back to tokenize (default) / fixed / reject; reject
  KEEPS the original value in the output (bindings lib.rs:353-359) and the
  pair never enters the integrity table (table.rs:67).
* null values are never anonymized (bindings lib.rs:353).

Architecture difference from the reference (SURVEY.md §2.3/ST2): the
reference funnels every record through one process-global
``RwLock<AnonymizerCore>`` whose memo table doubles as the integrity table —
an inherent serialization point.  Because tokens are pure functions of
(config, field, value), this engine keeps the transform STATELESS
(vectorized per batch, no lock, no memo) and derives the integrity table AS
DATA: each batch emits its distinct (field, original, replacement) pairs and
a ``groupby(field, original).first()`` dedups them globally — determinism
guarantees every duplicate carries the identical replacement, so ``first`` is
safe.  :class:`SerialAnonymizer` reproduces the reference's stateful engine
exactly and serves as the conformance oracle in tests.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .fnv import FNV_OFFSET, FNV_PRIME, fnv1a64_arrow

__all__ = [
    "AnonConfig",
    "FieldRule",
    "load_anon_config",
    "SerialAnonymizer",
    "anonymize_column",
    "tokenize_scalar",
]

_MODES = {"fixed", "map", "tokenize"}
_FALLBACKS = {"tokenize", "fixed", "reject"}


@dataclass(frozen=True)
class FieldRule:
    mode: str | None = None  # "fixed" | "map" | "tokenize" | None
    fixed: str | None = None
    map: dict[str, str] = dc_field(default_factory=dict)
    fallback: str | None = None  # "tokenize" | "fixed" | "reject" | None
    tokenize_prefix: str | None = None
    tokenize_salt: str | None = None


@dataclass(frozen=True)
class AnonConfig:
    defaults_mode: str | None = None
    defaults_fixed: str | None = None
    defaults_prefix: str | None = None
    defaults_salt: str = ""
    fields: dict[str, FieldRule] = dc_field(default_factory=dict)

    def resolve(self, field_name: str) -> tuple[str | None, str | None, str, str | None]:
        """-> (mode, fixed, token_prefix, field_salt) per table.rs:17-27."""
        fr = self.fields.get(field_name)
        mode = (fr.mode if fr and fr.mode is not None else self.defaults_mode)
        fixed = (fr.fixed if fr and fr.fixed is not None else self.defaults_fixed)
        if fr is not None:
            prefix = fr.tokenize_prefix if fr.tokenize_prefix is not None else "T_"
            salt = fr.tokenize_salt
        else:
            prefix = self.defaults_prefix if self.defaults_prefix is not None else "T_"
            salt = None
        return mode, fixed, prefix, salt


def _parse_rule(d: dict) -> FieldRule:
    mode = d.get("mode")
    if mode is not None and mode not in _MODES:
        raise ValueError(f"Unknown anonymizer mode: {mode}")
    fb = d.get("fallback")
    if fb is not None and fb not in _FALLBACKS:
        raise ValueError(f"Unknown anonymizer fallback: {fb}")
    tk = d.get("tokenize", {}) or {}
    return FieldRule(
        mode=mode,
        fixed=d.get("fixed"),
        map=dict(d.get("map", {}) or {}),
        fallback=fb,
        tokenize_prefix=tk.get("prefix"),
        tokenize_salt=tk.get("salt"),
    )


def load_anon_config(source: str | dict) -> AnonConfig:
    """Parse reference-format anonymizer JSON (text, path contents, or dict).

    Rejects version != 1 (table.rs:83-87).
    """
    d = json.loads(source) if isinstance(source, str) else source
    version = d.get("version")
    if version is not None and version != 1:
        raise ValueError(f"Unsupported anonymizer config version: {version}")
    defaults = d.get("defaults", {}) or {}
    dmode = defaults.get("mode")
    if dmode is not None and dmode not in _MODES:
        raise ValueError(f"Unknown anonymizer mode: {dmode}")
    dtk = defaults.get("tokenize", {}) or {}
    return AnonConfig(
        defaults_mode=dmode,
        defaults_fixed=defaults.get("fixed"),
        defaults_prefix=dtk.get("prefix"),
        defaults_salt=dtk.get("salt") or "",
        fields={k: _parse_rule(v) for k, v in (d.get("fields", {}) or {}).items()},
    )


def tokenize_scalar(cfg: AnonConfig, prefix: str, field_salt: str | None, value: str) -> str:
    """Scalar salted token (oracle path)."""
    h = FNV_OFFSET
    payload = (field_salt or "").encode("utf-8") + cfg.defaults_salt.encode("utf-8") + value.encode("utf-8")
    for b in payload:
        h = ((h ^ b) * FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return f"{prefix}{h:016x}"


class SerialAnonymizer:
    """Stateful reference-equivalent engine: memo + integrity table.

    Mirrors AnonymizerCore (table.rs:6-78) exactly; used as the conformance
    oracle and for tiny driver-side audits.  ``table`` has the reference's
    export shape ``{field: {original: replacement}}`` (bindings lib.rs:319-335).
    """

    def __init__(self, cfg: AnonConfig):
        self.cfg = cfg
        self.table: dict[str, dict[str, str]] = {}

    def anonymize_one(self, field_name: str, orig: str) -> str | None:
        memo = self.table.get(field_name)
        if memo is not None and orig in memo:
            return memo[orig]
        mode, fixed, prefix, field_salt = self.cfg.resolve(field_name)
        fr = self.cfg.fields.get(field_name)
        if mode is None:
            return None
        if mode == "fixed":
            repl = fixed if fixed is not None else "REDACTED"
        elif mode == "map":
            fmap = fr.map if fr else {}
            if orig in fmap:
                repl = fmap[orig]
            else:
                fb = fr.fallback if fr else None
                if fb == "fixed":
                    repl = fixed if fixed is not None else "REDACTED"
                elif fb == "reject":
                    return None
                else:
                    repl = tokenize_scalar(self.cfg, prefix, field_salt, orig)
        else:  # tokenize
            repl = tokenize_scalar(self.cfg, prefix, field_salt, orig)
        self.table.setdefault(field_name, {})[orig] = repl
        return repl

    def status(self) -> dict:
        """{enabled, fields, pairs} per bindings lib.rs:302-317."""
        return {
            "enabled": True,
            "fields": len(self.table),
            "pairs": sum(len(m) for m in self.table.values()),
        }

    def export_json(self) -> str:
        """Pretty sorted-keys JSON, reference export shape (rust_accel.py:391-414)."""
        return json.dumps(self.table, indent=2, sort_keys=True)


def anonymize_column(
    cfg: AnonConfig, field_name: str, col: pa.Array | pa.ChunkedArray
) -> tuple[pa.Array, pa.Array]:
    """Vectorized anonymization of one string column.

    Returns ``(anonymized_column, replaced_mask)`` where the mask marks slots
    whose value was actually replaced (i.e. belongs in the integrity table:
    reject/passthrough/null slots are False).  Pure function of (cfg, value) —
    safe to run concurrently on any worker with no shared state.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    mode, fixed, prefix, field_salt = cfg.resolve(field_name)
    valid = pc.is_valid(col)
    none_mask = pa.array(np.zeros(n, dtype=bool))
    if mode is None or n == 0:
        return col, none_mask

    def _tokens(values: pa.Array) -> pa.Array:
        # fully vectorized: FNV over buffers, then one hexlify pass formats
        # every 16-hex-char token at once (no per-row Python)
        import binascii

        salt_prefix = (field_salt or "").encode("utf-8") + cfg.defaults_salt.encode("utf-8")
        h = fnv1a64_arrow(values, prefix=salt_prefix)
        hx = np.frombuffer(binascii.hexlify(h.astype(">u8").tobytes()), dtype="S16")
        hex_arr = pa.array(hx).cast(pa.string())
        return pc.binary_join_element_wise(
            pa.array(np.full(len(h), prefix, dtype=object), type=pa.string()), hex_arr, ""
        )

    if mode == "fixed":
        repl_value = fixed if fixed is not None else "REDACTED"
        out = pc.if_else(valid, pa.scalar(repl_value, type=pa.string()), col)
        return out, valid

    if mode == "tokenize":
        toks = _tokens(col)
        out = pc.if_else(valid, toks, col)
        return out, valid

    # mode == "map" — vectorized broadcast-dict lookup: index_in against the
    # map's key set, take from the value set (the reference's J2 lookup,
    # SURVEY.md §2.4, without per-row Python)
    fr = cfg.fields.get(field_name)
    fmap = fr.map if fr else {}
    fb = fr.fallback if fr else None
    col = col.cast(pa.string())
    if fmap:
        keys = pa.array(list(fmap.keys()), type=pa.string())
        vals = pa.array(list(fmap.values()), type=pa.string())
        pos = pc.index_in(col, value_set=keys)
        hit = pc.and_kleene(pc.is_valid(pos), valid)
        hit = pc.fill_null(hit, False)
        mapped = pc.take(vals, pos)  # null where miss
    else:
        hit = pa.array(np.zeros(n, dtype=bool))
        mapped = pa.nulls(n, type=pa.string())
    miss = pc.and_(valid, pc.invert(hit))
    if fb == "reject":
        out = pc.if_else(hit, mapped, col)
        return out, hit
    if fb == "fixed":
        repl_value = fixed if fixed is not None else "REDACTED"
        out = pc.if_else(hit, mapped, pc.if_else(miss, pa.scalar(repl_value, type=pa.string()), col))
        return out, valid
    # tokenize fallback (default): tokens for all rows, selected on miss
    toks = _tokens(col)
    out = pc.if_else(hit, mapped, pc.if_else(miss, toks, col))
    return out, valid
