"""Vectorized string/bytes kernels used by the batch parse stages.

All functions are zero-Python-per-row: they operate on Arrow buffers with
numpy gathers and pyarrow.compute kernels, so batches of hundreds of
thousands of rows stay columnar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["slice_from_positions", "extract_csv_payload", "csv_split_column",
           "utf8_safe_truncate"]


def utf8_safe_truncate(arr: pa.Array | pa.ChunkedArray, max_bytes: int) -> pa.Array:
    """First <= max_bytes BYTES of each string, backed off to a UTF-8 char
    boundary.  The reference byte-slices a &str (lib.rs:158) and would panic
    on a char straddling the boundary; this engine trims the partial char
    instead of crashing (documented divergence — identical output whenever
    the reference doesn't panic).  Vectorized: only rows longer than
    max_bytes are inspected, and only their last 3 boundary bytes.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets, data = _string_buffers(arr)
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    cut = np.minimum(lens, max_bytes)
    long_rows = np.nonzero(lens > max_bytes)[0]
    if not len(long_rows):
        # nothing to cut — zero-copy pass-through (the common case: short
        # log lines under a 256-byte excerpt cap); the cast only widens
        # offsets / validates UTF-8, exactly like the rebuild path's cast
        return arr.cast(pa.large_string())
    if len(long_rows):
        # a cut is mid-char iff the byte AT the cut is a continuation byte
        # (0b10xxxxxx); back off until the cut lands on a char start
        for _ in range(3):
            pos = starts[long_rows] + cut[long_rows]
            is_cont = (data[pos] & 0xC0) == 0x80
            if not is_cont.any():
                break
            cut[long_rows] = cut[long_rows] - is_cont.astype(np.int64)
    out_off, out_data = _gather_varlen(data, starts, cut)
    built = pa.Array.from_buffers(
        pa.large_binary(), len(arr),
        [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(out_data.tobytes())],
    ).cast(pa.large_string())
    if arr.null_count:
        # null rows have zero-length buffer ranges; restore their nullness
        built = pc.if_else(pc.is_valid(arr), built,
                           pa.scalar(None, type=pa.large_string()))
    return built


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets:int64[n+1], data:uint8) of a string/binary array."""
    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        dt = np.int64
    else:
        dt = np.int32
    _v, off_buf, data_buf = arr.buffers()
    offsets = np.frombuffer(off_buf, dtype=dt, count=len(arr) + 1,
                            offset=arr.offset * np.dtype(dt).itemsize).astype(np.int64)
    data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None else np.empty(0, np.uint8)
    return offsets, data


def _gather_varlen(data: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Gather variable-length byte slices into a packed buffer.

    Returns (new_offsets:int64[n+1], new_data:uint8[total]).
    """
    lens = np.maximum(lens, 0)
    out_off = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    total = int(out_off[-1])
    if total == 0:
        return out_off, np.empty(0, np.uint8)
    # index trick: for each output byte, source index = start[row] + intra-row pos
    idx = np.arange(total, dtype=np.int64)
    row_base = np.repeat(out_off[:-1], lens)
    src_base = np.repeat(starts, lens)
    return out_off, data[idx - row_base + src_base]


def slice_from_positions(arr: pa.Array | pa.ChunkedArray, starts_rel: np.ndarray) -> pa.Array:
    """Per-row suffix slice: row i -> bytes[starts_rel[i]:] of that row.

    ``starts_rel[i] < 0`` keeps the whole row.  Returns a binary array.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets, data = _string_buffers(arr)
    starts = offsets[:-1]
    ends = offsets[1:]
    rel = np.where(starts_rel < 0, 0, starts_rel)
    new_starts = np.minimum(starts + rel, ends)
    out_off, out_data = _gather_varlen(data, new_starts, ends - new_starts)
    return pa.Array.from_buffers(
        pa.large_binary(), len(arr),
        [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(out_data.tobytes())],
    )


def extract_csv_payload(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Strip the syslog prefix: find the first ``" 1,"`` and keep from ``"1,"``;
    otherwise keep the (whitespace-trimmed) line.

    Matches the reference example's ``extract_csv``
    (/root/reference/examples/pan_dynamic_parser.py:828-831), vectorized.
    Returns a string array (payload, whitespace-trimmed).

    Implementation: one ``split_pattern(max_splits=1)`` C++ kernel + a take
    on the per-row tail — allocation-light on purpose (this sandbox pays
    ~35us/page on first-touch faults, so big numpy byte gathers are poison
    in freshly-started workers).
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # null rows must NOT collapse to zero-length list slots — the take-based
    # tail extraction below would then read the NEXT row's content.  A null
    # line is treated as an empty line (it dead-letters downstream).
    text = pc.fill_null(text, "")
    parts = pc.split_pattern(text, " 1,", max_splits=1)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    po = np.asarray(parts.offsets, dtype=np.int64)
    po = po - po[0]
    nparts = np.diff(po)
    matched = nparts == 2
    # matched rows -> the tail after ' 1,'; unmatched -> the whole line
    tail_idx = po[:-1] + np.where(matched, 1, 0)
    tail = pc.take(parts.values, pa.array(tail_idx, type=pa.int64()))
    # reference keeps from '1,': re-prefix the stripped '1,' on matched rows
    prefixed = pc.binary_join_element_wise(pa.scalar("1,"), tail, "")
    out = pc.if_else(pa.array(matched), prefixed, tail)
    # .strip() on both branches in the reference — Python strips UNICODE
    # whitespace, so use the unicode-aware trim
    return pc.utf8_trim_whitespace(out)


def csv_split_column(payload: pa.Array | pa.ChunkedArray) -> tuple[pa.ListArray, np.ndarray]:
    """Split a column of CSV lines into a list<string> per row.

    Fast path: ``pc.split_pattern(',')`` for every row (correct for all
    quote-free lines, which dominate real log traffic).  Rows containing a
    double-quote byte are flagged in the returned bool mask — the caller
    patches those rows through the exact per-row tokenizer
    (`core.tokenize.split_csv_bytes`).  Empty rows get an empty field list
    (the reference yields zero fields for an empty line).
    """
    if isinstance(payload, pa.ChunkedArray):
        payload = payload.combine_chunks()
    as_str = payload if pa.types.is_string(payload.type) or pa.types.is_large_string(payload.type) else payload.cast(pa.large_string())
    splits = pc.split_pattern(as_str, ",")
    quoted = pc.match_substring(as_str, '"').to_numpy(zero_copy_only=False)
    return splits, quoted
