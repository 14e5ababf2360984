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
    "get_schema_status",
    "parse_many",
    "parse_file",
    "parse_many_parallel",
    "parse_file_parallel",
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
_SCHEMA_SOURCE: str | None = None  # "embedded" | "file" | None
_SCHEMA_PATH: str | None = None
_SCHEMA_MTIME_MS: int | None = None
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
    global _SCHEMA, _SCHEMA_SOURCE, _SCHEMA_PATH, _SCHEMA_MTIME_MS
    _SCHEMA = _load_schema_file(schema_path)
    _SCHEMA_SOURCE, _SCHEMA_PATH = "file", schema_path
    try:
        _SCHEMA_MTIME_MS = int(os.stat(schema_path).st_mtime * 1000)
    except OSError:
        _SCHEMA_MTIME_MS = None
    return True


def load_embedded_schema() -> bool:
    """Load the packaged default (PAN-style) schema — the reference's
    ``--features embed_schema`` build (rust_accel.py:72-78) without the
    compile-time gate: this package always ships its default schema."""
    global _SCHEMA, _SCHEMA_SOURCE, _SCHEMA_PATH, _SCHEMA_MTIME_MS
    from .webtext import pan_schema

    _SCHEMA = pan_schema()
    _SCHEMA_SOURCE, _SCHEMA_PATH, _SCHEMA_MTIME_MS = "embedded", None, None
    return True


def get_schema_status() -> dict[str, object]:
    """Runtime schema status (reference docs/python/api.md:32-33;
    rust_accel.py:448-468).  Keys: ``loaded`` (bool), ``source``
    ("embedded"|"file"|None), ``path`` (str|None), ``mtime_epoch_ms``
    (int|None)."""
    return {
        "loaded": _SCHEMA is not None,
        "source": _SCHEMA_SOURCE if _SCHEMA is not None else None,
        "path": _SCHEMA_PATH if _SCHEMA is not None else None,
        "mtime_epoch_ms": _SCHEMA_MTIME_MS if _SCHEMA is not None else None,
    }


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


# --- streaming generator surface (reference rust_accel.py:473-564 — the
# convenience API the reference's own examples/test_parser.py:8-17 drives)


def parse_many(lines, *, anonymized: bool = False, include_all: bool = False,
               schema_path: str | None = None):
    """Parse an iterable of log lines, yielding one enriched dict per
    line (rust_accel.py:473-507).  Falsy lines are skipped; each line is
    ``rstrip("\\n")``-ed; the anonymized variant routes through the global
    anonymizer engine exactly like ``parse_kv_enriched_anon``."""
    if anonymized:
        if schema_path:
            for line in lines:
                if not line:
                    continue
                yield parse_kv_enriched_with_schema_anon(
                    line.rstrip("\n"), schema_path, include_all=include_all)
        else:
            for line in lines:
                if not line:
                    continue
                yield parse_kv_enriched_anon(line.rstrip("\n"),
                                             include_all=include_all)
    else:
        if schema_path:
            for line in lines:
                if not line:
                    continue
                yield parse_kv_enriched_with_schema(
                    line.rstrip("\n"), schema_path, include_all=include_all)
        else:
            for line in lines:
                if not line:
                    continue
                yield parse_kv_enriched(line.rstrip("\n"),
                                        include_all=include_all)


def parse_file(path: str, *, anonymized: bool = False,
               include_all: bool = False, schema_path: str | None = None,
               encoding: str = "utf-8", errors: str = "ignore"):
    """Stream-parse a file of log lines (rust_accel.py:509-525): a thin
    ``parse_many`` over the opened file — memory stays one line deep."""
    with open(path, encoding=encoding, errors=errors) as f:
        yield from parse_many(f, anonymized=anonymized,
                              include_all=include_all,
                              schema_path=schema_path)


def _parse_batch_enriched(buf: list[str], include_all: bool):
    """Vectorized batch analog of the reference's Rayon batch fast path
    (rust_accel.py:528-551): one ``WebtextParser`` pass over the buffered
    lines (Arrow split + per-column takes — no per-row Python in the
    parse), then per-line enriched dicts off the columnar result.  Output
    is pinned equal to the sequential ``parse_many`` by pytest."""
    import pyarrow as pa

    from .stages.parse import WebtextParser

    schema = _require_schema()
    parser = WebtextParser(schema, on_error="skip",
                           strip_syslog_prefix=False,
                           include_all=include_all)
    t = parser(pa.table({"text": pa.array(buf, type=pa.string())}))
    errs = t["_error"].to_pylist()
    types = t["log_type"].to_pylist()
    # record-for-record parity with the sequential generator: yield every
    # record BEFORE the first bad line, then raise its scalar-style error
    # (round-5 review: raising before yielding dropped the batch's good
    # prefix, which parse_many would have delivered)
    n_ok = len(errs)
    first_err = None
    for i, e in enumerate(errs):
        if e:
            n_ok, first_err = i, (e, types[i])
            break
    hashes = t["hash64"].to_pylist()
    excerpts = t["raw_excerpt"].to_pylist()
    cols = {c: t[c].to_pylist() for c in schema.union_columns}
    all_fields = t["all_fields"].to_pylist() if include_all else None
    for i, line_type in enumerate(types[:n_ok]):
        parsed: dict[str, str | None] = {}
        for name in schema.type_to_fields[line_type]:
            parsed[name] = cols[name][i]
        if include_all:
            for j, v in enumerate(all_fields[i]):
                k = f"field_{j}"
                if k not in parsed:
                    parsed[k] = v
        yield {"parsed": parsed, "raw_excerpt": excerpts[i],
               "hash64": hashes[i]}
    if first_err is not None:
        err, line_type = first_err
        if err == "no_type_at_index_3":
            raise ValueError("Could not extract log type at index 3")
        raise ValueError(f"Unknown log type in schema: {line_type}")


def parse_many_parallel(lines, *, batch_size: int = 1024,
                        include_all: bool = False,
                        schema_path: str | None = None):
    """Batched parse of an iterable (rust_accel.py:528-551): lines buffer
    to ``batch_size`` and run through the vectorized Arrow batch kernel —
    the repo's stand-in for the reference's Rayon thread pool (same
    buffer/flush protocol, same yielded records as ``parse_many``).
    Unlike the reference's fast path, ``include_all`` is honored."""
    if schema_path:
        load_schema(schema_path)
    _require_schema()
    buf: list[str] = []
    for line in lines:
        if not line:
            continue
        buf.append(line.rstrip("\n"))
        if len(buf) >= batch_size:
            yield from _parse_batch_enriched(buf, include_all)
            buf = []
    if buf:
        yield from _parse_batch_enriched(buf, include_all)


def parse_file_parallel(path: str, *, batch_size: int = 1024,
                        encoding: str = "utf-8", errors: str = "ignore",
                        schema_path: str | None = None):
    """Read a file and parse through the batched kernel
    (rust_accel.py:554-560)."""
    with open(path, encoding=encoding, errors=errors) as f:
        yield from parse_many_parallel(f, batch_size=batch_size,
                                       include_all=False,
                                       schema_path=schema_path)


# import-time preload, reference order (rust_accel.py:79-92 + lib.rs:505-514):
# embedded wins when explicitly requested, else an env-named schema file
# (generic then legacy names); failures are swallowed to keep import robust,
# exactly like the reference
try:
    if os.getenv("LOGPARSE_USE_EMBEDDED") == "1":
        load_embedded_schema()
    else:
        _pre = (os.getenv("LOGPARSE_PRELOAD_SCHEMA")
                or os.getenv("SCHEMA_JSON_PATH")
                or os.getenv("PAN_RUST_PRELOAD_SCHEMA"))
        if _pre:
            load_schema(_pre)
except Exception:
    pass

# import-time anonymizer preload (reference lib.rs:516-526, generic + legacy
# env names; VERDICT r04 item 3 — previously only the CLI honored these)
try:
    _anon_pre = (os.getenv("LOGPARSE_ANON_CONFIG")
                 or os.getenv("PAN_RUST_ANON_CONFIG"))
    if _anon_pre:
        load_anonymizer(_anon_pre)
except Exception:
    pass
