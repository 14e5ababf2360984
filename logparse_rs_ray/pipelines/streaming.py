"""Incremental (stateful-actor) stream processing over an ordered event log.

Ray Data has no watermarks or incremental operators (SURVEY.md §2.8), and
most window semantics here are expressed as ``groupby().map_groups`` over
ts-sorted groups (pipelines/windows.py).  This module demonstrates the
LAST-RESORT tier of the custom-operator ladder — raw Ray actors holding
mutable state — for semantics a Dataset transform can't express: processing
an ordered stream INCREMENTALLY, emitting per-window results as windows
close, with bounded per-actor state.

Shape: the input is treated as an ordered, hash-partitioned log.  A pool of
``n_actors`` keyed actors each own the key range ``hash(key) % n_actors``;
the driver streams ts-ordered batches (``iter_batches`` — backpressured:
batch N+1 is submitted only after batch N's actor calls are awaited, so
actor compute overlaps the next batch's prefetch) and routes each batch's
rows to the owning actors.  Each actor keeps AT MOST ONE open window per
key (the per-key ts-order invariant closes older windows on arrival) and
RETURNS closed windows from every ``add()`` call — actor state is bounded
by the live key set, never by stream length.  ``flush()`` drains the open
windows at end of stream.

Partitioning assumption (documented per the brief): events must reach an
actor in non-decreasing ts order PER KEY — guaranteed here by sorting the
Dataset by ts before iteration; in production, by reading an ordered log
partition per key range.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["streaming_tumbling_counts"]


def _make_window_actor():
    import ray

    @ray.remote(num_cpus=0.5)
    class _WindowActor:
        """Owns one key-hash shard; at most one open window per key."""

        def __init__(self, window_us: int):
            self.window_us = window_us
            # key -> [window_start_us, count, value_sum]
            self.open: dict[int, list] = {}

        def add(self, keys, ts_us, values):
            """Ingest one routed batch slice; RETURNS the windows this batch
            closed (incremental emission — nothing accumulates here)."""
            w = self.window_us
            closed = []
            open_ = self.open
            for k, t, v in zip(keys, ts_us, values):
                ws = (t // w) * w
                cur = open_.get(k)
                if cur is None:
                    open_[k] = [ws, 1, v]
                elif cur[0] == ws:
                    cur[1] += 1
                    cur[2] += v
                else:  # ts order per key => cur[0] < ws: close and roll
                    closed.append((k, cur[0], cur[1], cur[2]))
                    open_[k] = [ws, 1, v]
            return closed

        def flush(self):
            out = [(k, ws, c, s) for k, (ws, c, s) in sorted(self.open.items())]
            self.open.clear()
            return out

    return _WindowActor


def streaming_tumbling_counts(sf_dir: str, *, window_minutes: int = 60,
                              n_actors: int = 4):
    """(user_id, window_start_epoch_us, n_events, sum_value_cents) computed
    INCREMENTALLY by keyed window actors over the ts-ordered event stream.

    Must equal the batch hourly-window result (pytest + oracle pin this).
    """
    import ray
    import ray.data as rd

    Actor = _make_window_actor()
    window_us = window_minutes * 60 * 1_000_000
    actors = [Actor.remote(window_us) for _ in range(n_actors)]

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"]).sort("ts")
    rows: list[tuple] = []
    prev_refs: list = []
    for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        keys = np.asarray(batch["user_id"], dtype=np.int64)
        ts_us = batch["ts"].cast(pa.int64()).to_numpy()
        vals = np.round(np.asarray(batch["value"], dtype=np.float64) * 100).astype(np.int64)
        shard = keys % n_actors
        # backpressure: await the PREVIOUS batch's calls (collecting their
        # closed windows) before submitting this one — actors stay one batch
        # deep while the driver prefetches the next
        for out in ray.get(prev_refs):
            rows.extend(out)
        calls = []
        for a in range(n_actors):
            m = shard == a
            if m.any():
                calls.append(actors[a].add.remote(keys[m].tolist(),
                                                  ts_us[m].tolist(),
                                                  vals[m].tolist()))
        prev_refs = calls
    for out in ray.get(prev_refs):
        rows.extend(out)
    for out in ray.get([a.flush.remote() for a in actors]):
        rows.extend(out)
    for a in actors:
        ray.kill(a)
    if not rows:
        return pa.table({"user_id": pa.array([], type=pa.int64()),
                         "window_start_us": pa.array([], type=pa.int64()),
                         "n_events": pa.array([], type=pa.int64()),
                         "sum_value_cents": pa.array([], type=pa.int64())})
    arr = np.array(rows, dtype=np.int64)
    t = pa.table({
        "user_id": pa.array(arr[:, 0]),
        "window_start_us": pa.array(arr[:, 1]),
        "n_events": pa.array(arr[:, 2]),
        "sum_value_cents": pa.array(arr[:, 3]),
    })
    return t.sort_by([("user_id", "ascending"), ("window_start_us", "ascending")])
