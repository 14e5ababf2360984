"""Zipf-hot-key join stress: measures the straggler cost of an unsalted
hash join and the recovery from ``salted_join``.

Corpus: ``n_rows`` fact rows over a 100k-key domain where ONE hot key
carries ``hot_frac`` (default 30%) of all rows — the shape of a viral
domain / null-bucket key at crawl scale.  Dimension side: one row per
key.  The unsalted ``hash_join`` puts the hot key's entire row set in one
partition (one aggregator does 30% of the work while 15 idle); with
``salted_join`` the hot key fans across ``num_salts`` sub-partitions.

Correctness: both plans must produce the identical joined row multiset —
asserted via count + two order-independent checksums (sum of value,
sum of value*dim_attr), exact in int64.

Measured finding (BASELINE.md "skew join"): on a single node the
pipelined shuffle send dominates and the vectorized probe is cheap, so
even 90% single-key skew costs NO wall-time here (salting's extra map +
replication reads 0.88-0.97x) — the reason to salt is per-aggregator
HEAP: unsalted, one aggregator buffers the hot key's whole row set
(~460 MB at 32M rows x 90%), which is the partition that stops fitting
first on a real cluster; salted bounds it at 1/num_salts.

Usage: python tools/stress_skew_join.py [n_rows]   (env: HOT_FRAC)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
N_KEYS = 100_000
HOT_KEY = 7
HOT_FRAC = float(os.environ.get("HOT_FRAC", "0.5"))
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PARTS = 16


def build(path: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(779)
    n_hot = int(N_ROWS * HOT_FRAC)
    keys = np.concatenate([
        np.full(n_hot, HOT_KEY, dtype=np.int64),
        rng.integers(0, N_KEYS, size=N_ROWS - n_hot, dtype=np.int64),
    ])
    rng.shuffle(keys)
    value = rng.integers(0, 1000, size=N_ROWS, dtype=np.int64)
    pq.write_table(pa.table({"k": pa.array(keys), "value": pa.array(value)}),
                   f"{path}/fact.parquet", row_group_size=1 << 18)
    dim_k = np.arange(N_KEYS, dtype=np.int64)
    pq.write_table(pa.table({"dk": pa.array(dim_k),
                             "attr": pa.array((dim_k * 13 + 5) % 997)}),
                   f"{path}/dim.parquet")


def run(work: str, *, salted: bool) -> dict:
    import ray

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
             object_store_memory=2048 * 1024 * 1024, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa

    import ray.data as rd
    from logparse_rs_ray.stages.join import hash_join, salted_join

    fact = rd.read_parquet(f"{work}/fact.parquet", columns=["k", "value"])
    dim = rd.read_parquet(f"{work}/dim.parquet")
    t0 = time.perf_counter()
    if salted:
        j = salted_join(fact, dim, "k", "dk", hot_keys=[HOT_KEY],
                        num_salts=PARTS, num_partitions=PARTS)
    else:
        j = hash_join(fact, dim, "k", "dk", num_partitions=PARTS)

    def checksum(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.sum(b["value"]).as_py() or 0
        va = pc.sum(pc.multiply(b["value"], b["attr"])).as_py() or 0
        return pa.table({"n": pa.array([b.num_rows], pa.int64()),
                         "sv": pa.array([v], pa.int64()),
                         "sva": pa.array([va], pa.int64())})

    parts = j.map_batches(checksum, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    wall = time.perf_counter() - t0
    ray.shutdown()
    return {"wall_sec": round(wall, 1),
            "rows_per_sec": round(N_ROWS / wall, 1),
            "n": int(parts.n.sum()), "sv": int(parts.sv.sum()),
            "sva": int(parts.sva.sum())}


def main() -> None:
    import shutil

    work = "/tmp/stress_skew_join"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    build(work)

    unsalted = run(work, salted=False)
    salted = run(work, salted=True)
    for f in ("n", "sv", "sva"):
        assert unsalted[f] == salted[f], (f, unsalted[f], salted[f])
    print(json.dumps({
        "metric": f"Zipf-hot join stress ({int(HOT_FRAC*100)}% single-key skew)",
        "n_rows": N_ROWS, "n_keys": N_KEYS, "hot_frac": HOT_FRAC,
        "num_cpus": CPUS, "num_partitions": PARTS,
        "unsalted": unsalted, "salted": salted,
        "speedup": round(unsalted["wall_sec"] / salted["wall_sec"], 2),
    }))


if __name__ == "__main__":
    main()
