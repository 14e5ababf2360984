"""Reference-format schema JSON loading and compilation.

Byte-compatible with the reference's schema format
(/root/reference/crates/logparse_core/src/schema.rs:10-95,
/root/reference/docs/schema.md): a JSON document with
``palo_alto_syslog_fields.log_types.{name}.{type_value, fields: [str | {name}]}``.

Differences from the reference by design (SURVEY.md §1.4, §2.3/ST1):

* No process-global mutable cache, no mtime hot-reload: a schema is compiled
  ONCE on the driver into an immutable :class:`CompiledSchema` and shipped to
  workers inside the ``map_batches`` closure / actor ``__init__``.  The
  sha256 of the schema JSON is part of the run lineage.
* Duplicate field names follow the reference's *primary* (Rust) path: every
  position is parsed, and on name collision the LAST duplicate position wins
  (schema.rs:69-78 keeps duplicates in order; the map-insert loop at
  parser.rs:19-22 makes the last one visible).  The Python-fallback
  first-wins behavior is intentionally not reproduced.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

__all__ = ["sanitize_identifier", "CompiledSchema", "compile_schema", "load_schema"]

# Log-type dispatch convention: the type value lives at CSV index 3 and the
# subtype at index 4 (reference parser.rs:11; bindings lib.rs:127-134).
TYPE_INDEX = 3
SUBTYPE_INDEX = 4


def sanitize_identifier(name: str) -> str:
    """Schema field name -> snake_case identifier (reference schema.rs:39-56).

    trim -> lowercase -> ' ', '/', '-' to '_' -> any other non-[a-z0-9_]
    char to '_' -> prefix '_' unless the result starts with an ascii letter
    or '_'.  Pinned cases: "Src IP"->"src_ip", "9bad"->"_9bad", ""->"_".
    """
    s = name.strip().lower()
    s = s.replace(" ", "_").replace("/", "_").replace("-", "_")
    out = "".join(ch if (ch.isascii() and (ch.isalnum() or ch == "_")) else "_" for ch in s)
    if not out or not (out[0] == "_" or (out[0].isascii() and out[0].isalpha())):
        out = "_" + out
    return out


@dataclass(frozen=True)
class CompiledSchema:
    """Immutable compiled schema: routing table + per-type column layouts.

    ``type_to_fields`` maps a ``type_value`` (the routing key extracted at CSV
    index 3) to the ordered list of sanitized field names for that type —
    duplicates preserved positionally, exactly as the reference stores them.

    ``type_to_columns`` maps a type_value to the DEDUPED output column list
    (last-dup-wins position visible), i.e. the Arrow schema of that sink.

    ``union_columns`` is the stable union of all sinks' columns (sorted by
    first-seen type then position) — the wide layout the single-pass parse
    stage emits before routing, so every batch has one fixed Arrow schema.
    """

    type_to_fields: dict[str, tuple[str, ...]]
    schema_sha256: str
    type_to_columns: dict[str, tuple[str, ...]] = field(default_factory=dict)
    union_columns: tuple[str, ...] = ()

    @staticmethod
    def from_type_map(type_to_fields: dict[str, list[str]], sha: str = "") -> "CompiledSchema":
        t2f = {t: tuple(fs) for t, fs in type_to_fields.items()}
        t2c: dict[str, tuple[str, ...]] = {}
        union: list[str] = []
        seen_union: set[str] = set()
        for t in sorted(t2f):
            cols: list[str] = []
            seen: set[str] = set()
            # last-dup-wins: a later position with the same name overwrites the
            # earlier value, but the column itself appears once
            for name in t2f[t]:
                if name not in seen:
                    seen.add(name)
                    cols.append(name)
            t2c[t] = tuple(cols)
            for name in cols:
                if name not in seen_union:
                    seen_union.add(name)
                    union.append(name)
        return CompiledSchema(
            type_to_fields=t2f,
            schema_sha256=sha,
            type_to_columns=t2c,
            union_columns=tuple(union),
        )

    def value_positions(self, type_value: str) -> list[tuple[str, int]]:
        """(column, source CSV index) pairs; last duplicate position wins."""
        pos: dict[str, int] = {}
        for i, name in enumerate(self.type_to_fields[type_value]):
            pos[name] = i
        return list(pos.items())


def compile_schema(schema_json: str | dict) -> CompiledSchema:
    """Compile reference-format schema JSON text (or parsed dict)."""
    if isinstance(schema_json, str):
        sha = hashlib.sha256(schema_json.encode("utf-8")).hexdigest()
        root = json.loads(schema_json)
    else:
        root = schema_json
        sha = hashlib.sha256(
            json.dumps(root, sort_keys=True).encode("utf-8")
        ).hexdigest()
    log_types = root.get("palo_alto_syslog_fields", {}).get("log_types", {})
    type_to_fields: dict[str, list[str]] = {}
    for _name, tdef in log_types.items():
        fields: list[str] = []
        for f in tdef.get("fields", []):
            raw = f if isinstance(f, str) else f["name"]
            fields.append(sanitize_identifier(raw))
        type_to_fields[tdef["type_value"]] = fields
    return CompiledSchema.from_type_map(type_to_fields, sha)


def load_schema(path: str) -> CompiledSchema:
    with open(path, "r", encoding="utf-8") as fh:
        return compile_schema(fh.read())


class SchemaCache:
    """Mtime-checked schema cache — the reference's ``ensure_schema_loaded``
    (crates/logparse_core/src/schema.rs:97-115): a long-running service
    recompiles when the file on disk changes, otherwise reuses the compiled
    schema.

    Batch pipelines intentionally DON'T use this (one immutable compiled
    schema per run, its sha256 recorded in checkpoint lineage, so a
    mid-run edit can never split a run across two schema versions); the
    cache is for the CLI/service tier where the reference's hot-reload
    semantics apply between runs.
    """

    def __init__(self):
        self._path: str | None = None
        self._mtime: float | None = None
        self._schema: CompiledSchema | None = None

    def get(self, path: str) -> CompiledSchema:
        import os

        mtime = os.stat(path).st_mtime
        if self._schema is None or path != self._path or mtime != self._mtime:
            self._schema = load_schema(path)
            self._path = path
            self._mtime = mtime
        return self._schema
