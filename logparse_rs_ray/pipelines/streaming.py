"""Incremental (bounded-state) stream processing over an ordered event log.

Ray Data has no watermarks or incremental operators (SURVEY.md §2.8), and
most window semantics here are expressed as ``groupby().map_groups`` over
ts-sorted groups (pipelines/windows.py).  This module demonstrates the
custom-operator tier for ordered-stream semantics: tumbling windows that
CLOSE as the stream advances, with per-worker state bounded by the live
key set — never by stream length.

Shape (fully distributed; VERDICT r01 item 3 removed the old driver
funnel):

1. ONE hash shuffle co-locates each key's events into one of ``n_shards``
   partitions (``stages/shuffle.hash_partition``) — the analog of reading
   per-key-range ordered log partitions in production.
2. Each shard task sorts its partition by ts (in production the log
   partition is already ts-ordered) and REPLAYS it through the rolling
   window machine in bounded chunks: per chunk, (key, window) segments are
   reduced vectorized (lexsort + reduceat) and fed segment-by-segment into
   the open-window dict — exactly the per-event state machine, collapsed
   over runs of equal (key, window).  Windows close and are EMITTED the
   moment a key's window advances; at most one window per live key is ever
   held open.
3. Closed + flushed windows leave the task as Arrow rows — the driver only
   ever sees the final (small) window table.

Partitioning assumption (documented per the brief): events must reach the
machine in non-decreasing ts order PER KEY — guaranteed by the per-shard
sort here, by ordered log partitions in production.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.shuffle import hash_partition, input_size_bytes

__all__ = ["streaming_tumbling_counts", "auto_shard_count"]

# Each shard partition must fit one task (its ts-sort is in-task); the
# hash shuffle guarantees shard size ≈ input/n_shards for non-degenerate
# key distributions, so sizing shards from input bytes bounds the in-task
# working set by construction (VERDICT r02 item 4 / ADVICE r02).
TARGET_SHARD_BYTES = 64 << 20


def auto_shard_count(n_bytes: int | None, *, target_shard_bytes: int = TARGET_SHARD_BYTES,
                     min_shards: int = 4) -> int:
    """Shard count sized so input/n_shards ≈ ``target_shard_bytes`` —
    a shard's in-task sort/replay memory is then bounded no matter the
    stream length.  Unknown size -> a generous 64 shards (safe direction)."""
    if n_bytes is None:
        return 64
    return max(min_shards, -(-n_bytes // target_shard_bytes))

_OUT_SCHEMA = pa.schema([
    ("user_id", pa.int64()),
    ("window_start_us", pa.int64()),
    ("n_events", pa.int64()),
    ("sum_value_cents", pa.int64()),
])


class _OpenWindows:
    """At most ONE open window per key (per-key ts order closes older
    windows on arrival) — state is bounded by the live key set."""

    def __init__(self):
        # key -> [window_start_us, count, value_sum]
        self.open: dict[int, list] = {}

    def feed(self, keys, wss, counts, sums):
        """Ingest pre-reduced (key, window) segments in per-key ws order;
        RETURNS the windows these segments closed (incremental emission)."""
        closed = []
        open_ = self.open
        for k, ws, c, s in zip(keys, wss, counts, sums):
            cur = open_.get(k)
            if cur is None:
                open_[k] = [ws, c, s]
            elif cur[0] == ws:
                cur[1] += c
                cur[2] += s
            else:  # per-key ts order => cur[0] < ws: close and roll
                closed.append((k, cur[0], cur[1], cur[2]))
                open_[k] = [ws, c, s]
        return closed

    def flush(self):
        out = [(k, ws, c, s) for k, (ws, c, s) in sorted(self.open.items())]
        self.open.clear()
        return out


def _reduce_segments(keys, ts_us, vals, window_us):
    """Collapse a ts-ordered chunk to (key, window) segments, vectorized.

    Lexsort by (key, ts) preserves per-key ts order, so per key the
    segments come out window-ascending — the exact order the state machine
    needs."""
    ws = (ts_us // window_us) * window_us
    order = np.lexsort((ts_us, keys))
    k, w, v = keys[order], ws[order], vals[order]
    new_seg = np.ones(len(k), dtype=bool)
    if len(k) > 1:
        new_seg[1:] = (k[1:] != k[:-1]) | (w[1:] != w[:-1])
    starts = np.nonzero(new_seg)[0]
    counts = np.diff(np.append(starts, len(k)))
    sums = np.add.reduceat(v, starts) if len(k) else np.empty(0, dtype=np.int64)
    return k[starts], w[starts], counts.astype(np.int64), sums


def streaming_tumbling_counts(sf_dir: str, *, window_minutes: int = 60,
                              n_shards: int | None = None, chunk_rows: int = 65536):
    """(user_id, window_start_epoch_us, n_events, sum_value_cents) computed
    INCREMENTALLY by per-shard window machines over the ts-ordered stream.

    ``n_shards=None`` (default) sizes the shard count from input bytes
    (``auto_shard_count``) so each shard partition — which one task
    ts-sorts and replays — is bounded by ``TARGET_SHARD_BYTES`` regardless
    of stream length; the chunked replay then bounds the segment-reduce
    working set to ``chunk_rows``.  Must equal the batch hourly-window
    result (pytest + oracle pin this).
    """
    import ray.data as rd

    window_us = window_minutes * 60 * 1_000_000

    if n_shards is None:
        n_shards = auto_shard_count(input_size_bytes(f"{sf_dir}/events.parquet"))

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    shards = hash_partition(ds, ["user_id"], n_shards)

    def shard_windows(batch: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        if batch.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        keys = np.asarray(batch["user_id"], dtype=np.int64)
        ts_us = (batch["ts"].combine_chunks() if isinstance(batch["ts"], pa.ChunkedArray)
                 else batch["ts"]).cast(pa.int64()).to_numpy()
        # half away from zero (== DuckDB ROUND); np.round is half-even
        v = np.asarray(batch["value"], dtype=np.float64) * 100
        vals = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        # the ordered-log replay: ts-sort the shard once, then stream it
        # through the machine in bounded chunks
        order = np.argsort(ts_us, kind="stable")
        keys, ts_us, vals = keys[order], ts_us[order], vals[order]
        machine = _OpenWindows()
        rows: list[tuple] = []
        for lo in range(0, len(keys), chunk_rows):
            hi = min(lo + chunk_rows, len(keys))
            segs = _reduce_segments(keys[lo:hi], ts_us[lo:hi], vals[lo:hi], window_us)
            rows.extend(machine.feed(*segs))
        rows.extend(machine.flush())
        arr = np.array(rows, dtype=np.int64).reshape(-1, 4)
        return pa.table({
            "user_id": pa.array(arr[:, 0]),
            "window_start_us": pa.array(arr[:, 1]),
            "n_events": pa.array(arr[:, 2]),
            "sum_value_cents": pa.array(arr[:, 3]),
        })

    out = shards.map_batches(shard_windows, batch_format="pyarrow", batch_size=None)
    # final window table is small relative to the stream: one typed table
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow", batch_size=None)] or
        [_OUT_SCHEMA.empty_table()])
    return tbl.sort_by([("user_id", "ascending"), ("window_start_us", "ascending")])
