"""Reproducible stress check for the event-exchange family (both regimes).

VERDICT r04 item 9: funnel / sessionize / user-paths all share
``_event_exchange`` (compact column-pruned read + ONE user-keyed hash
exchange).  This builds an events table with EXACT constructed ground
truth — every user gets a deterministic funnel pattern (user_id % 8) and a
deterministic session layout (1 + user_id % 3 sessions an hour apart,
in-session events 60 s apart) — and runs the three ops twice in fresh Ray
sessions:

* **forced shuffle regime** under a 512 MB object store (the scale path:
  user-keyed HASH_SHUFFLE exchange, per-partition vectorized kernels);
* **tree regime** (single co-located block) under the same cap.

Sanity is EXACT, not statistical: per-stage funnel counts equal the
pattern census, every user's (n_sessions, n_events) equals the layout,
and every user's path string equals the constructed event order.

Usage: python tools/stress_events.py [n_users]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_USERS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
STORE_MB = 512

# funnel patterns (event types of session 0, in time order) and the
# strict-order stages each reaches: stage0 = has signup, stage1 = click
# after first signup, stage2 = purchase after that first click
PATTERNS = [
    (["signup"], 1),
    (["signup", "click"], 2),
    (["signup", "click", "purchase"], 3),
    (["click", "signup"], 1),            # click precedes signup
    (["purchase", "click", "signup"], 1),
    (["signup", "purchase", "click"], 2),  # purchase precedes the click
    (["view", "view"], 0),               # never signs up
    (["view", "signup", "view", "click", "purchase"], 3),
]


def build_events(path: str):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_us = 1_700_000_000_000_000  # fixed epoch-us origin
    users, types, ts = [], [], []
    for u in range(N_USERS):
        pat = PATTERNS[u % len(PATTERNS)][0]
        n_sess = 1 + u % 3
        t0 = base_us + u * 1_000_000  # spread users a second apart
        order = []
        for i, et in enumerate(pat):  # session 0: the funnel pattern
            order.append((et, t0 + i * 60_000_000))
        for s in range(1, n_sess):    # later sessions: 2 views each
            st = t0 + s * 3_600_000_000
            order.append(("view", st))
            order.append(("view", st + 60_000_000))
        for et, t in order:
            users.append(u)
            types.append(et)
            ts.append(t)
    n = len(users)
    # shuffle row order so nothing relies on input ordering
    rng = np.random.default_rng(99)
    perm = rng.permutation(n)
    users = np.asarray(users, dtype=np.int64)[perm]
    types = np.asarray(types, dtype=object)[perm]
    ts = np.asarray(ts, dtype=np.int64)[perm]
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(users),
        "event_type": pa.array(types.tolist(), pa.string()),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    })
    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, f"{path}/events.parquet", row_group_size=65536)

    # constructed ground truth
    per_pat = [0] * len(PATTERNS)
    for u in range(N_USERS):
        per_pat[u % len(PATTERNS)] += 1
    funnel = {0: 0, 1: 0, 2: 0}
    for (pat, depth), cnt in zip(PATTERNS, per_pat):
        for s in range(depth):
            funnel[s] += cnt
    uids = np.arange(N_USERS, dtype=np.int64)
    n_sess = 1 + uids % 3
    pat_len = np.asarray([len(p) for p, _ in PATTERNS], dtype=np.int64)
    n_events = pat_len[uids % len(PATTERNS)] + 2 * (n_sess - 1)
    paths = {}
    for u in range(N_USERS):
        pat = PATTERNS[u % len(PATTERNS)][0]
        evs = list(pat) + ["view", "view"] * (u % 3)
        paths[u] = "->".join(evs)
    return {"funnel": funnel, "n_sessions": n_sess, "n_events": n_events,
            "paths": paths, "total_events": n}


def run_regime(sf_dir: str, mode: str, truth) -> dict:
    import numpy as np
    import ray

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False,
             object_store_memory=STORE_MB * 1024 * 1024)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from logparse_rs_ray.pipelines.windows import (log_funnel,
                                                   log_sessionize,
                                                   log_user_paths)

    out = {}
    t0 = time.perf_counter()
    fun = log_funnel(sf_dir, mode=mode).to_pandas()
    out["funnel_sec"] = round(time.perf_counter() - t0, 1)
    got = dict(zip(fun.stage_idx, fun.n_users))
    assert got == truth["funnel"], (mode, got, truth["funnel"])

    t0 = time.perf_counter()
    ses = log_sessionize(sf_dir, mode=mode).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    out["sessionize_sec"] = round(time.perf_counter() - t0, 1)
    assert len(ses) == N_USERS, (mode, len(ses))
    assert (ses.user_id.to_numpy() == np.arange(N_USERS)).all()
    assert (ses.n_sessions.to_numpy() == truth["n_sessions"]).all(), mode
    assert (ses.n_events.to_numpy() == truth["n_events"]).all(), mode

    t0 = time.perf_counter()
    pth = log_user_paths(sf_dir, mode=mode).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    out["paths_sec"] = round(time.perf_counter() - t0, 1)
    ray.shutdown()
    assert len(pth) == N_USERS, (mode, len(pth))
    want = np.asarray([truth["paths"][u] for u in pth.user_id], dtype=object)
    mism = int((pth.path.to_numpy() != want).sum())
    assert mism == 0, (mode, mism)

    total = out["funnel_sec"] + out["sessionize_sec"] + out["paths_sec"]
    out["events_per_sec_overall"] = round(
        3 * truth["total_events"] / max(total, 1e-9), 1)
    out["exact"] = True
    return out


def main():
    sf_dir = "/tmp/events_stress"
    truth = build_events(sf_dir)
    out = {
        "metric": "event-exchange stress (funnel/sessionize/paths, both "
                  "regimes, exact constructed ground truth)",
        "n_users": N_USERS, "n_events": truth["total_events"],
        "num_cpus": CPUS, "object_store_mb": STORE_MB,
        "shuffle": run_regime(sf_dir, "shuffle", truth),
        "tree": run_regime(sf_dir, "tree", truth),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
