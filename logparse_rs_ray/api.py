"""Scalar convenience API — the reference's one-line-callable surface
(``docs/python/api.md``; ``rust_accel.py:262-368``) for interactive and
debug use.

These wrappers share the exact kernels the batch pipelines use
(``core.tokenize`` / ``core.fnv`` / ``core.schema``), so a value checked
here is byte-identical to what ``WebtextParser`` emits for the same line —
pinned by ``tests/test_scalar_api.py`` over the tokenizer-quirk corpus.
Semantic choices follow the repo's documented forks: last-dup-wins field
names (the reference's Rust primary path, SURVEY §1.4) and the Rust
error messages for missing/unknown types.

Module state mirrors the reference's process-global schema: ``load_schema``
/ ``load_embedded_schema`` set it; ``parse_kv_with_schema`` hot-reloads on
mtime change (``ensure_schema_loaded``, schema.rs:97-115).  Import-time
preload honors the reference env order (rust_accel.py:79-92):
``LOGPARSE_USE_EMBEDDED=1`` wins, else ``LOGPARSE_PRELOAD_SCHEMA`` /
``SCHEMA_JSON_PATH``.  NOTHING here touches Ray.
"""

from __future__ import annotations

import os

from .core.fnv import fnv1a64
from .core.schema import CompiledSchema, SchemaCache
from .core.schema import load_schema as _load_schema_file
from .core.tokenize import extract_field_bytes, split_csv_bytes

__all__ = [
    "get_field",
    "get_fields",
    "extract_type_subtype",
    "load_schema",
    "load_embedded_schema",
    "parse_kv",
    "parse_kv_with_schema",
    "parse_kv_enriched",
    "parse_kv_enriched_with_schema",
    "load_anonymizer",
    "set_anonymizer_json",
    "get_anonymizer_status",
    "export_integrity_table",
    "parse_kv_enriched_anon",
    "parse_kv_enriched_with_schema_anon",
]

TYPE_INDEX = 3

_SCHEMA: CompiledSchema | None = None
_CACHE = SchemaCache()


def get_fields(line: str) -> list[str]:
    """Quote-aware CSV split with every §1.5 pinned quirk (byte-as-char
    quoted decoding, discard-after-quote, trailing comma, empty line)."""
    return split_csv_bytes(line.encode("utf-8"))


def get_field(line: str, index: int) -> str | None:
    """Single-field projection without a full split (tokenizer.rs:4-65
    edge semantics: one-past-the-end is '' unless the line ends with ','
    — then None; anything further is None)."""
    return extract_field_bytes(line.encode("utf-8"), index)


def extract_type_subtype(line: str) -> tuple[str | None, str | None]:
    """The (type, subtype) fields at indices 3/4 — the vendor-log
    convenience one-liner (bindings lib.rs:130-134; docs
    csv_helpers.md)."""
    return get_field(line, TYPE_INDEX), get_field(line, TYPE_INDEX + 1)


def load_schema(schema_path: str) -> bool:
    """Load + compile a reference-format schema JSON into module state."""
    global _SCHEMA
    _SCHEMA = _load_schema_file(schema_path)
    return True


def load_embedded_schema() -> bool:
    """Load the packaged default (PAN-style) schema — the reference's
    ``--features embed_schema`` build (rust_accel.py:72-78) without the
    compile-time gate: this package always ships its default schema."""
    global _SCHEMA
    from .webtext import pan_schema

    _SCHEMA = pan_schema()
    return True


def _require_schema() -> CompiledSchema:
    if _SCHEMA is None:
        raise ValueError(
            "No schema loaded. Call load_schema() or parse_kv_with_schema().")
    return _SCHEMA


def _parse_with(schema: CompiledSchema, line: str,
                include_all: bool = False) -> dict[str, str | None]:
    t = get_field(line, TYPE_INDEX)
    if not t:
        raise ValueError("Could not extract log type at index 3")
    if t not in schema.type_to_fields:
        raise ValueError(f"Unknown log type in schema: {t}")
    fields = get_fields(line)
    out: dict[str, str | None] = {}
    # positional iteration + dict insert == last-dup-wins (parser.rs:19-22)
    for i, name in enumerate(schema.type_to_fields[t]):
        out[name] = fields[i] if i < len(fields) else None
    if include_all:
        for i, v in enumerate(fields):
            k = f"field_{i}"
            if k not in out:
                out[k] = v
    return out


def parse_kv(line: str, include_all: bool = False) -> dict[str, str | None]:
    """Parse one CSV line against the loaded schema (scalar ``parse_kv``,
    lib.rs:62-71).  ``include_all`` adds ``field_i`` index keys for every
    position not already named (rust_accel.py:272-282)."""
    return _parse_with(_require_schema(), line, include_all)


def parse_kv_with_schema(line: str, schema_path: str,
                         include_all: bool = False) -> dict[str, str | None]:
    """Parse with an explicit schema path, mtime-hot-reloaded between calls
    (lib.rs:74-82)."""
    return _parse_with(_CACHE.get(schema_path), line, include_all)


def _excerpt(line: str, limit: int = 256) -> str:
    """First ``min(256, len)`` BYTES of the line (lib.rs:158-159 slices the
    &str by bytes).  The Rust reference would panic on a multi-byte
    boundary; we back off to the previous character boundary instead —
    identical output for any input the reference itself accepts."""
    raw = line.encode("utf-8")
    if len(raw) <= limit:
        return line
    cut = raw[:limit]
    while cut:
        try:
            return cut.decode("utf-8")
        except UnicodeDecodeError as e:
            if e.end != len(cut):
                raise  # malformed interior bytes, not a boundary cut
            cut = cut[:e.start]  # drop the truncated trailing sequence
    return ""


def _enrich(parsed: dict, line: str) -> dict:
    return {
        "parsed": parsed,
        "raw_excerpt": _excerpt(line),
        "hash64": fnv1a64(line),
    }


def parse_kv_enriched(line: str, include_all: bool = False) -> dict:
    """``{parsed, raw_excerpt, hash64}`` envelope (lib.rs:143-164)."""
    return _enrich(parse_kv(line, include_all), line)


def parse_kv_enriched_with_schema(line: str, schema_path: str,
                                  include_all: bool = False) -> dict:
    return _enrich(parse_kv_with_schema(line, schema_path, include_all), line)


# --- anonymizer scalar surface (docs/python/api.md "Anonymizer";
# bindings lib.rs:283-390) — module-global engine like the reference's
# ANONYMIZER RwLock, sharing core.anonymize's conformance-pinned kernels

_ANON: "SerialAnonymizer | None" = None


def load_anonymizer(config_path: str) -> bool:
    """Load anonymizer rules from a JSON file (lib.rs:283-290).  Replaces
    any previous engine and resets its integrity table, like the
    reference's ``*g = Some(anon)``."""
    global _ANON
    from .core.anonymize import SerialAnonymizer, load_anon_config

    with open(config_path, encoding="utf-8") as fh:
        _ANON = SerialAnonymizer(load_anon_config(fh.read()))
    return True


def set_anonymizer_json(config_json: str) -> bool:
    """Load anonymizer rules from a JSON string (lib.rs:295-300)."""
    global _ANON
    from .core.anonymize import SerialAnonymizer, load_anon_config

    _ANON = SerialAnonymizer(load_anon_config(config_json))
    return True


def get_anonymizer_status() -> dict:
    """``{enabled, fields, pairs}`` when loaded, ``{enabled: False}``
    otherwise (lib.rs:305-317)."""
    if _ANON is None:
        return {"enabled": False}
    return _ANON.status()


def export_integrity_table() -> dict[str, dict[str, str]]:
    """field -> {original: replacement} audit export (lib.rs:322-334);
    empty dict when no engine is loaded."""
    if _ANON is None:
        return {}
    return {f: dict(m) for f, m in _ANON.table.items()}


def _enrich_anon(parse, line: str) -> dict:
    """Anon-enriched envelope: parse, anonymize every replaceable string
    value through the global engine, add ``_anonymized`` + the reference's
    timing keys (lib.rs:340-378 — values are wall timings, keys/shape are
    the contract)."""
    import time

    t0 = time.perf_counter_ns()
    parsed = parse()
    parse_ns = time.perf_counter_ns() - t0
    t1 = time.perf_counter_ns()
    if _ANON is not None:
        for k, v in parsed.items():
            if isinstance(v, str):
                repl = _ANON.anonymize_one(k, v)
                if repl is not None:
                    parsed[k] = repl
    anonymize_ns = time.perf_counter_ns() - t1
    out = _enrich(parsed, line)
    out["_anonymized"] = True
    out["parse_ns"] = parse_ns
    out["anonymize_ns"] = anonymize_ns
    out["runtime_ns_total"] = parse_ns + anonymize_ns
    return out


def parse_kv_enriched_anon(line: str, include_all: bool = False) -> dict:
    """Enriched parse with anonymization when an engine is loaded
    (lib.rs:340-378; a no-engine call still parses and stamps the
    envelope, exactly like the reference's ``else parsed0`` arm)."""
    return _enrich_anon(lambda: parse_kv(line, include_all), line)


def parse_kv_enriched_with_schema_anon(line: str, schema_path: str,
                                       include_all: bool = False) -> dict:
    """Same, ensuring ``schema_path`` is loaded first (lib.rs:381-390)."""
    return _enrich_anon(
        lambda: parse_kv_with_schema(line, schema_path, include_all), line)


# import-time preload, reference order (rust_accel.py:79-92): embedded wins
# when explicitly requested, else an env-named schema file; failures are
# swallowed to keep import robust, exactly like the reference
try:
    if os.getenv("LOGPARSE_USE_EMBEDDED") == "1":
        load_embedded_schema()
    else:
        _pre = (os.getenv("LOGPARSE_PRELOAD_SCHEMA")
                or os.getenv("SCHEMA_JSON_PATH"))
        if _pre:
            load_schema(_pre)
except Exception:
    pass
