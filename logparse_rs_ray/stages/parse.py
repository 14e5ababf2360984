"""Vectorized schema-driven parse stage (the engine's hot path).

Re-expresses the reference's parse semantics
(/root/reference/crates/logparse_core/src/parser.rs:7-24 dispatch at CSV
index 3; bindings lib.rs:143-188 enrichment; lib.rs:412-423 skip policy) as a
single zero-copy Arrow ``map_batches`` transform:

input batch  (url, warc_ts, text, lang, ...)
output batch (url, warc_ts, lang, extracted_text, log_type, <union field
              columns>, hash64, raw_excerpt, _error)

Design notes (SURVEY.md §2.2, §7):

* One fixed Arrow schema per run: the per-type column layouts are compiled
  on the driver (CompiledSchema.union_columns) so every output batch has the
  same wide nullable-string layout regardless of the type mix inside it.
  The router then projects each sink down to its own columns.
* Fast path: ``pc.split_pattern(',')`` + numpy index arithmetic over the
  list offsets + one ``pc.take`` per output column — no Python per row.
  Rows containing a quote byte (rare) are patched through the exact
  reference tokenizer (`core.tokenize.split_csv_bytes`).
* Error policy is a flag, mirroring the reference's two paths: "skip"
  (NDJSON path — bad rows get ``_error`` set and flow to the dead-letter
  sink) or "fail" (batch path — first bad row raises ValueError,
  lib.rs:241-245).
* ``hash64``/``raw_excerpt`` match the reference enrichment: FNV-1a 64 over
  the raw extracted line bytes, first ≤256 bytes of the line
  (lib.rs:153-162).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.fnv import fnv1a64_arrow
from ..core.schema import CompiledSchema, TYPE_INDEX
from ..core.strkit import csv_split_column, extract_csv_payload
from ..core.tokenize import split_csv_bytes

__all__ = ["WebtextParser", "make_parse_fn", "PASSTHROUGH_COLUMNS"]

PASSTHROUGH_COLUMNS = ("url", "warc_ts", "lang")


class WebtextParser:
    """Callable batch transform: webtext rows -> parsed union-layout rows.

    Usable as a plain function (stateless tasks) or as an actor-pool class —
    the compiled schema is built once in ``__init__`` either way.
    """

    def __init__(self, schema: CompiledSchema, *, on_error: str = "skip",
                 strip_syslog_prefix: bool = True, text_column: str = "text"):
        if on_error not in ("skip", "fail"):
            raise ValueError(f"on_error must be 'skip' or 'fail', got {on_error!r}")
        self.schema = schema
        self.on_error = on_error
        self.strip_syslog_prefix = strip_syslog_prefix
        self.text_column = text_column
        # type_value -> list[(column, source CSV position)], last-dup-wins
        self._positions = {t: schema.value_positions(t) for t in schema.type_to_fields}
        self._union = list(schema.union_columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        text = batch[self.text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        payload = extract_csv_payload(text) if self.strip_syslog_prefix else text.cast(pa.large_string())

        splits, quoted_mask = csv_split_column(payload)
        offs = np.asarray(splits.offsets)
        flat: pa.Array = splits.values
        starts = offs[:-1].astype(np.int64)
        nfields = (offs[1:] - offs[:-1]).astype(np.int64)

        # empty payload -> reference yields zero fields (split_pattern yields [""])
        pay_len = pc.binary_length(payload).to_numpy(zero_copy_only=False)
        empty = pay_len == 0
        nfields = np.where(empty, 0, nfields)

        # exact-tokenizer patch rows: quoted lines re-split per reference rules
        patch: dict[int, list[str]] = {}
        if quoted_mask.any():
            pay_np = payload.to_numpy(zero_copy_only=False)
            for i in np.nonzero(quoted_mask)[0]:
                patch[int(i)] = split_csv_bytes(pay_np[i].encode("utf-8"))
                nfields[i] = len(patch[int(i)])

        # routing key: CSV index 3 (reference parser.rs:11)
        type_idx = starts + TYPE_INDEX
        type_ok = nfields > TYPE_INDEX
        type_take = pa.array(np.where(type_ok, type_idx, 0), type=pa.int64())
        log_type_np = np.asarray(
            pc.take(flat, type_take).to_numpy(zero_copy_only=False), dtype=object
        )
        log_type_np[~type_ok] = None
        for i, fields in patch.items():
            log_type_np[i] = fields[TYPE_INDEX] if len(fields) > TYPE_INDEX else None

        known = np.zeros(n, dtype=bool)
        type_masks: dict[str, np.ndarray] = {}
        for t in self._positions:
            m = log_type_np == t
            if m.any():
                type_masks[t] = m
                known |= m

        errors = np.full(n, "", dtype=object)
        errors[~type_ok] = "no_type_at_index_3"
        unknown = type_ok & ~known
        errors[unknown] = "unknown_log_type"
        if self.on_error == "fail" and (errors != "").any():
            bad = int(np.nonzero(errors != "")[0][0])
            raise ValueError(f"parse error at row {bad}: {errors[bad]}")

        # one pc.take per union column
        columns: dict[str, pa.Array] = {}
        for col in self._union:
            idx = np.full(n, -1, dtype=np.int64)
            for t, m in type_masks.items():
                pos = dict(self._positions[t]).get(col)
                if pos is None:
                    continue
                valid = m & (nfields > pos)
                idx[valid] = starts[valid] + pos
            take_arr = pa.array(idx, type=pa.int64(), mask=idx < 0)
            out = pc.take(flat, take_arr)
            if patch:
                out_np = np.asarray(out.to_numpy(zero_copy_only=False), dtype=object)
                for i, fields in patch.items():
                    t = log_type_np[i]
                    if t is None or t not in self._positions:
                        continue
                    pos = dict(self._positions[t]).get(col)
                    out_np[i] = fields[pos] if pos is not None and pos < len(fields) else None
                out = pa.array(out_np, type=pa.string())
            columns[col] = out.cast(pa.string()) if out.type != pa.string() else out

        hash64 = fnv1a64_arrow(payload)
        excerpt = pc.binary_slice(payload.cast(pa.large_binary()), 0, 256).cast(pa.large_string())

        result: dict[str, pa.Array | pa.ChunkedArray] = {}
        for c in PASSTHROUGH_COLUMNS:
            if c in batch.column_names:
                result[c] = batch[c]
        result["extracted_text"] = payload.cast(pa.string())
        result["log_type"] = pa.array(log_type_np, type=pa.string())
        for col in self._union:
            result[col] = columns[col]
        result["hash64"] = pa.array(hash64, type=pa.uint64())
        result["raw_excerpt"] = excerpt.cast(pa.string())
        result["_error"] = pa.array(errors, type=pa.string())
        return pa.table(result)


def make_parse_fn(schema: CompiledSchema, **kwargs) -> WebtextParser:
    return WebtextParser(schema, **kwargs)
