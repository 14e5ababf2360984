"""Watermark / late-data stress: 1M-event synthetic stream, exact ground
truth from an independent pandas replica.

Corpus: ``n_events`` events over ``n_users`` users, timestamps a few
seconds apart with deterministic jitter — the op's own multiplicative-hash
arrival jitter then reorders delivery, so every shard sees genuine
out-of-order arrivals.  Runs BOTH watermark ops
(``log_watermark_late_events`` binary split and ``log_late_update_census``
three-way split) in one fresh Ray session with a 512 MB object store and
asserts every per-window count equals the serial replica exactly, plus the
cross-op invariants (on_time agree; updates + dropped == late).

Usage: python tools/stress_watermark.py [n_events]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_USERS = 50_000
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def build(path: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(781)
    eid = np.arange(N_EVENTS, dtype=np.int64)
    base = np.int64(1_700_000_000_000_000)            # epoch us
    gaps = rng.integers(1, 8_000_000, size=N_EVENTS)  # 1 us .. 8 s apart
    ts = base + np.cumsum(gaps)
    # deterministic deep stragglers: every 997th event carries a timestamp
    # two hours old, far past window end + allowed lateness -> DROPPED
    ts[eid % 997 == 0] -= 7_200_000_000
    pq.write_table(pa.table({
        "event_id": pa.array(eid),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, N_USERS, size=N_EVENTS,
                                         dtype=np.int64)),
    }), f"{path}/events.parquet", row_group_size=1 << 17)


def replica(path: str):
    import pandas as pd
    import pyarrow.parquet as pq

    from logparse_rs_ray.pipelines.windows import (
        WM_ALLOWED_LATE_US, WM_DELAY_US, WM_JITTER_MOD, WM_JITTER_MULT,
        WM_SHARDS, WM_WINDOW_US)

    ev = pq.read_table(f"{path}/events.parquet").to_pandas()
    ev["shard"] = ev.user_id % WM_SHARDS
    ev["arr"] = ev.event_id + (ev.event_id * WM_JITTER_MULT) % WM_JITTER_MOD
    ev["ts_us"] = ev.ts.astype("int64")
    ev = ev.sort_values(["shard", "arr", "event_id"])
    wm = ev.groupby("shard").ts_us.apply(
        lambda s: s.cummax().shift(1)).reset_index(drop=True)
    ev = ev.reset_index(drop=True)
    ev["wm"] = wm
    ev["wstart"] = (ev.ts_us // WM_WINDOW_US) * WM_WINDOW_US
    past_end = ev.wm - WM_DELAY_US - ev.wstart - WM_WINDOW_US
    late = ev.wm.notna() & (past_end >= 0)
    dropped = ev.wm.notna() & (past_end >= WM_ALLOWED_LATE_US)
    df = pd.DataFrame({"w": ev.wstart, "late": late, "dropped": dropped})
    g = df.groupby("w")
    return pd.DataFrame({
        "n_on_time": g.late.apply(lambda s: int((~s).sum())),
        "n_late": g.late.sum().astype(int),
        "n_updates": (g.late.sum() - g.dropped.sum()).astype(int),
        "n_dropped": g.dropped.sum().astype(int),
    })


def main() -> None:
    import shutil

    import ray

    work = "/tmp/stress_watermark"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    build(work)
    truth = replica(work)

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
             object_store_memory=512 * 1024 * 1024, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from logparse_rs_ray.pipelines.windows import (
        log_late_update_census, log_watermark_late_events)

    t0 = time.perf_counter()
    bi = (log_watermark_late_events(work, num_partitions=16)
          .to_pandas().set_index("window_start_us"))
    wall_bi = time.perf_counter() - t0
    t0 = time.perf_counter()
    tri = (log_late_update_census(work, num_partitions=16)
           .to_pandas().set_index("window_start_us"))
    wall_tri = time.perf_counter() - t0
    ray.shutdown()

    assert bi.index.tolist() == truth.index.tolist()
    assert (bi.n_on_time == truth.n_on_time).all()
    assert (bi.n_late == truth.n_late).all()
    assert tri.index.tolist() == truth.index.tolist()
    assert (tri.n_on_time == truth.n_on_time).all()
    assert (tri.n_updates == truth.n_updates).all()
    assert (tri.n_dropped == truth.n_dropped).all()

    print(json.dumps({
        "metric": "watermark/lateness stress (exact pandas ground truth)",
        "n_events": N_EVENTS, "n_windows": len(truth), "num_cpus": CPUS,
        "object_store_mb": 512,
        "totals": {"on_time": int(truth.n_on_time.sum()),
                   "updates": int(truth.n_updates.sum()),
                   "dropped": int(truth.n_dropped.sum())},
        "binary_wall_sec": round(wall_bi, 1),
        "census_wall_sec": round(wall_tri, 1),
        "events_per_sec": round(N_EVENTS / wall_bi, 1),
    }))


if __name__ == "__main__":
    main()
