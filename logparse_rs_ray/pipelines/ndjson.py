"""NDJSON conversion pipeline — the reference's ``parse_file_to_ndjson``
(S3/S4: bindings lib.rs:392-463) re-expressed on Ray Data.

Per routed sink, one NDJSON part-file set with the reference's enriched
envelope per line::

    {"parsed": {<sanitized field>: value-or-null, ...},
     "raw_excerpt": "<first 256 bytes>", "hash64": <u64>}

Reference policies preserved: empty/malformed/unknown-type lines are
SKIPPED (they flow to the dead-letter parquet sink instead of erroring —
lib.rs:412-423); ``parsed`` contains exactly the type's schema fields with
null for missing trailing fields (parser.rs:19-22).  ``runtime_ns``
(lib.rs:153-162, a per-record parse timing) is emitted when the upstream
parse ran with ``record_timing=True`` (``WebtextParser`` then carries a
``_parse_ns`` column = batch parse wall amortized per row — the honest
vectorized analog of row-at-a-time timing); absent that column the envelope
omits the field, as before.
"""

from __future__ import annotations

import pyarrow as pa

from ..core.schema import CompiledSchema
from ..webtext import pan_schema

__all__ = ["write_ndjson_sinks"]


def write_ndjson_sinks(parsed_ds, out_dir: str, schema: CompiledSchema | None = None):
    """Parsed (union-layout) Dataset -> per-sink NDJSON directories."""
    schema = schema or pan_schema()

    for t, cols in schema.type_to_columns.items():
        def envelope(batch: pa.Table, _t=t, _cols=cols) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.and_(pc.equal(batch["log_type"], _t), pc.equal(batch["_error"], ""))
            sub = batch.filter(m)
            parsed = pa.StructArray.from_arrays(
                [sub[c].combine_chunks() if isinstance(sub[c], pa.ChunkedArray) else sub[c]
                 for c in _cols],
                names=list(_cols),
            )
            out = {
                "parsed": parsed,
                "raw_excerpt": sub["raw_excerpt"],
                "hash64": sub["hash64"],
            }
            if "_parse_ns" in sub.column_names:  # envelope runtime_ns parity
                out["runtime_ns"] = sub["_parse_ns"]
            return pa.table(out)

        out = parsed_ds.map_batches(envelope, batch_format="pyarrow", batch_size=None)
        out.write_json(f"{out_dir}/{t}")
