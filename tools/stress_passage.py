"""Reproducible stress check for passage-level dedup (both regimes).

Builds a boilerplate-heavy corpus — ``n_docs`` docs of 64 words (8
passages) where every EVEN passage slot comes from a tiny shared
boilerplate pool (navigation chrome, footers) and every odd slot is
unique — and runs ``doc_passage_dedup`` twice in fresh Ray sessions:

* **broadcast regime** (the primary path) with the object store capped
  at 512 MB — the spill-bounded memory check;
* **forced co-located regime** (``broadcast_max_drop=0``) with a 1 GiB
  cap.  Finding (recorded in BASELINE.md): under a 512 MB store this
  regime's two-branch union -> hash-shuffle topology starves in Ray's
  streaming-executor operator-budget split (upstream map gets no budget
  and stalls indefinitely, regardless of partition count); 1 GiB clears
  it.  Production object stores are 10-100x larger per node, so this is
  a sandbox-tight-budget artifact, but the floor is documented honestly.

Sanity: every shared passage keeps exactly ONE copy corpus-wide, so
``dropped == shared_slots - pool_size`` exactly, in both regimes.

Usage: python tools/stress_passage.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
POOL = 64           # distinct boilerplate passages
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def build_corpus(path: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(777)
    boiler = np.array([" ".join(f"nav{b:02d}w{j}" for j in range(8))
                       for b in range(POOL)], dtype=object)
    doc_ids = np.arange(N_DOCS, dtype=np.int64)
    # passages 0,2,4,6 boilerplate; 1,3,5,7 unique to the doc
    picks = rng.integers(0, POOL, size=(N_DOCS, 4))
    texts = [
        " ".join(p for i in range(4)
                 for p in (boiler[picks[d, i]],
                           " ".join(f"u{d}x{i}w{j}" for j in range(8))))
        for d in range(N_DOCS)
    ]
    pq.write_table(pa.table({"doc_id": pa.array(doc_ids),
                             "text": pa.array(texts, type=pa.string())}),
                   f"{path}/documents.parquet")


def run_regime(work: str, *, store_mb: int, broadcast_max_drop: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
             object_store_memory=store_mb * 1024 * 1024,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from logparse_rs_ray.pipelines.dedup import doc_passage_dedup

    t0 = time.perf_counter()
    out = doc_passage_dedup(work, broadcast_max_drop=broadcast_max_drop,
                            num_partitions=16).to_pandas()
    wall = time.perf_counter() - t0
    dropped = int(out.n_dropped.sum())
    expect = 4 * N_DOCS - POOL     # every shared slot minus one keeper each
    assert len(out) == N_DOCS, len(out)
    assert dropped == expect, (dropped, expect)
    ray.shutdown()
    return {"dropped_passages": dropped, "wall_sec": round(wall, 1),
            "docs_per_sec": round(N_DOCS / wall, 1),
            "object_store_mb": store_mb}


def main() -> None:
    import shutil

    work = "/tmp/stress_passage_corpus"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    build_corpus(work)

    res = {
        "metric": "passage dedup stress (both regimes)",
        "n_docs": N_DOCS, "passages_per_doc": 8, "boiler_pool": POOL,
        "num_cpus": CPUS,
        "broadcast": run_regime(work, store_mb=512,
                                broadcast_max_drop=5_000_000),
        "colocated": run_regime(work, store_mb=1024, broadcast_max_drop=0),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
