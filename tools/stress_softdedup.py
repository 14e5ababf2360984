"""Reproducible stress check for soft dedup (both regimes).

Builds a 100k-doc corpus whose texts are drawn (seeded) from a 20k-entry
pool — average duplicate-cluster size 5, max ~20 — and runs
``doc_soft_dedup_weights`` twice in fresh Ray sessions:

* **forced shuffle regime** under a 512 MB object store (the corpus-key
  scale path: ONE co-located exchange, counts attached per partition);
* **tree/broadcast regime** (count map broadcast) under the same cap.

Sanity is EXACT, not statistical: the generator knows how many times each
pool text was drawn, so every document's dup_count must equal its pool
entry's draw count, in both regimes.

Usage: python tools/stress_softdedup.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
POOL = 20_000
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
STORE_MB = 512


def build_corpus(path: str):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(4242)
    pool = np.array([" ".join(f"w{p}x{j}" for j in range(30))
                     for p in range(POOL)], dtype=object)
    picks = rng.integers(0, POOL, size=N_DOCS)
    texts = pool[picks]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * N_DOCS),
        "source": pa.array(["web"] * N_DOCS),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, f"{path}/documents.parquet")
    counts = np.bincount(picks, minlength=POOL)
    return counts[picks]  # expected dup_count per doc_id


def run_regime(sf_dir: str, mode: str, expected) -> dict:
    import numpy as np
    import ray

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False,
             object_store_memory=STORE_MB * 1024 * 1024)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from logparse_rs_ray.pipelines.dedup import doc_soft_dedup_weights

    t0 = time.perf_counter()
    df = doc_soft_dedup_weights(sf_dir, mode=mode).to_pandas()
    wall = time.perf_counter() - t0
    ray.shutdown()
    df = df.sort_values("doc_id").reset_index(drop=True)
    assert len(df) == N_DOCS, (mode, len(df))
    mismatches = int((df.dup_count.to_numpy() != expected).sum())
    assert mismatches == 0, (mode, mismatches)
    return {"wall_sec": round(wall, 1),
            "docs_per_sec": round(N_DOCS / wall, 1),
            "exact_counts": True}


def main():
    sf_dir = "/tmp/softdedup_stress"
    expected = build_corpus(sf_dir)
    out = {
        "metric": "soft-dedup stress (both regimes, exact per-doc counts)",
        "n_docs": N_DOCS, "pool": POOL, "num_cpus": CPUS,
        "object_store_mb": STORE_MB,
        "shuffle": run_regime(sf_dir, "shuffle", expected),
        "tree": run_regime(sf_dir, "tree", expected),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
