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

import time

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
                 strip_syslog_prefix: bool = True, text_column: str = "text",
                 include_all: bool = False, record_timing: bool = False):
        if on_error not in ("skip", "fail"):
            raise ValueError(f"on_error must be 'skip' or 'fail', got {on_error!r}")
        self.schema = schema
        self.on_error = on_error
        self.strip_syslog_prefix = strip_syslog_prefix
        self.text_column = text_column
        # reference lib.rs:153-162 measures per-record parse nanoseconds;
        # the vectorized analog is the batch's parse wall amortized per row,
        # emitted as a `_parse_ns` column when requested (NDJSON envelope
        # `runtime_ns` parity)
        self.record_timing = record_timing
        # M7 (reference rust_accel.py:272-314): include_all adds a
        # list<string> column with every positional CSV field
        self.include_all = include_all
        # type_value -> list[(column, source CSV position)], last-dup-wins
        self._positions = {t: schema.value_positions(t) for t in schema.type_to_fields}
        self._union = list(schema.union_columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        t_start = time.perf_counter_ns() if self.record_timing else 0
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

        # exact-tokenizer patch rows: quoted lines re-split per reference
        # rules; only those few rows pay per-row Python (typ. <2% of traffic)
        patch: dict[int, list[str]] = {}
        patch_idx = np.nonzero(quoted_mask)[0]
        if len(patch_idx):
            pay_quoted = pc.take(payload, pa.array(patch_idx, type=pa.int64()))
            for i, s in zip(patch_idx, pay_quoted.to_pylist()):
                patch[int(i)] = split_csv_bytes(s.encode("utf-8"))
                nfields[i] = len(patch[int(i)])
        patch_mask_arrow = pa.array(quoted_mask) if patch else None

        # routing key: CSV index 3 (reference parser.rs:11) — stays Arrow
        type_idx = starts + TYPE_INDEX
        type_ok_np = nfields > TYPE_INDEX
        type_take = pa.array(np.where(type_ok_np, type_idx, -1), type=pa.int64(),
                             mask=~type_ok_np)
        log_type = pc.take(flat, type_take).cast(pa.string())
        if patch:
            repl = pa.array(
                [patch[int(i)][TYPE_INDEX] if len(patch[int(i)]) > TYPE_INDEX else None
                 for i in patch_idx],
                type=pa.string(),
            )
            log_type = pc.replace_with_mask(log_type, patch_mask_arrow, repl)

        known = np.zeros(n, dtype=bool)
        type_masks: dict[str, np.ndarray] = {}
        for t in self._positions:
            m_np = pc.fill_null(pc.equal(log_type, t), False).to_numpy(zero_copy_only=False)
            if m_np.any():
                type_masks[t] = m_np
                known |= m_np

        type_ok_and_known = known
        no_type = ~np.asarray(pc.is_valid(log_type))
        unknown = ~no_type & ~type_ok_and_known
        if self.on_error == "fail" and (no_type.any() or unknown.any()):
            bad = int(np.nonzero(no_type | unknown)[0][0])
            reason = "no_type_at_index_3" if no_type[bad] else "unknown_log_type"
            raise ValueError(f"parse error at row {bad}: {reason}")
        errors = pc.if_else(
            pa.array(no_type), pa.scalar("no_type_at_index_3", type=pa.string()),
            pc.if_else(pa.array(unknown), pa.scalar("unknown_log_type", type=pa.string()),
                       pa.scalar("", type=pa.string())),
        )

        # one pc.take per union column; quoted rows patched via replace_with_mask
        columns: dict[str, pa.Array] = {}
        pos_maps = {t: dict(self._positions[t]) for t in type_masks}
        patch_types = {
            int(i): (patch[int(i)][TYPE_INDEX] if len(patch[int(i)]) > TYPE_INDEX else None)
            for i in patch_idx
        } if patch else {}
        for col in self._union:
            idx = np.full(n, -1, dtype=np.int64)
            for t, m in type_masks.items():
                pos = pos_maps[t].get(col)
                if pos is None:
                    continue
                valid = m & (nfields > pos)
                idx[valid] = starts[valid] + pos
            take_arr = pa.array(idx, type=pa.int64(), mask=idx < 0)
            out = pc.take(flat, take_arr).cast(pa.string())
            if patch:
                repl_vals = []
                for i in patch_idx:
                    t = patch_types[int(i)]
                    pos = pos_maps.get(t, {}).get(col) if t is not None else None
                    fields = patch[int(i)]
                    repl_vals.append(fields[pos] if pos is not None and pos < len(fields) else None)
                out = pc.replace_with_mask(out, patch_mask_arrow, pa.array(repl_vals, type=pa.string()))
            columns[col] = out

        hash64 = fnv1a64_arrow(payload)
        from ..core.strkit import utf8_safe_truncate

        excerpt = utf8_safe_truncate(payload, 256)

        result: dict[str, pa.Array | pa.ChunkedArray] = {}
        for c in PASSTHROUGH_COLUMNS:
            if c in batch.column_names:
                result[c] = batch[c]
        result["extracted_text"] = payload.cast(pa.string())
        result["log_type"] = log_type
        for col in self._union:
            result[col] = columns[col]
        result["hash64"] = pa.array(hash64, type=pa.uint64())
        result["raw_excerpt"] = excerpt.cast(pa.string())
        result["_error"] = errors
        if self.include_all:
            # field_i positional copies as one list<string> column (M7).
            # Quoted/empty rows need their exact field lists; lists don't
            # support replace_with_mask, so splice ONLY the affected rows
            # via concat + take — the unaffected majority stays columnar.
            fast = pa.LargeListArray.from_arrays(
                pa.array(offs.astype(np.int64)), flat.cast(pa.large_string())
            ).cast(pa.list_(pa.string()))
            affected = sorted(set(patch) | set(np.nonzero(empty)[0].tolist()))
            if affected:
                repl = pa.array(
                    [[] if empty[i] else patch[i] for i in affected],
                    type=pa.list_(pa.string()),
                )
                comb = pa.concat_arrays([fast, repl])
                idx = np.arange(n, dtype=np.int64)
                for r, i in enumerate(affected):
                    idx[i] = n + r
                result["all_fields"] = comb.take(pa.array(idx))
            else:
                result["all_fields"] = fast
        if self.record_timing:
            per_row = (time.perf_counter_ns() - t_start) // max(n, 1)
            result["_parse_ns"] = pa.array(np.full(n, per_row, dtype=np.int64))
        return pa.table(result)


def make_parse_fn(schema: CompiledSchema, **kwargs) -> WebtextParser:
    return WebtextParser(schema, **kwargs)
