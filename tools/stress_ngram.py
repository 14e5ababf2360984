"""Reproducible shuffle-path stress check for the n-gram Jaccard verifier.

Builds the round-2 pathological corpus — 100k docs where EVERY doc is a
20-way duplicate (≈1.05M LSH candidate pairs incl. cross-group band
collisions) — and runs the FORCED scale path (``mode="shuffle"``,
hash-join verification, broadcast gate off) with the object store capped
at 512 MB.  Prints one JSON line with pair count, wall seconds and
pairs/sec so rounds are comparable (BASELINE.md "Shuffle-path stress
check"; round-2 reference: 1,052,400 pairs in 195 s at 32 CPUs with the
per-pair-loop kernel).

Usage: python tools/stress_ngram.py [n_docs] [dup_factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
DUP = int(sys.argv[2]) if len(sys.argv) > 2 else 20
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def build_corpus(path: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    words = np.array([f"w{i:03d}" for i in range(1000)], dtype=object)
    rng = np.random.default_rng(12345)
    n_groups = N_DOCS // DUP
    # 12 tokens per group text -> plenty of k=3 shingles
    picks = rng.integers(0, len(words), size=(n_groups, 12))
    group_text = np.array([" ".join(words[p]) for p in picks], dtype=object)
    doc_ids = np.arange(N_DOCS, dtype=np.int64)
    texts = group_text[doc_ids // DUP]
    pq.write_table(pa.table({"doc_id": pa.array(doc_ids),
                             "text": pa.array(texts, type=pa.string())}),
                   f"{path}/documents.parquet")


def main() -> None:
    import shutil

    import ray

    work = "/tmp/stress_ngram_corpus"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    build_corpus(work)

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
             object_store_memory=512 * 1024 * 1024, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from logparse_rs_ray.pipelines.dedup import verified_pairs_ngram

    t0 = time.perf_counter()
    out = verified_pairs_ngram(work, mode="shuffle", broadcast_max_cands=0,
                               num_partitions=16)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "ngram hash-join verification stress (forced scale path)",
        "n_docs": N_DOCS, "dup_factor": DUP,
        "verified_pairs": out.num_rows,
        "wall_sec": round(wall, 1),
        "pairs_per_sec": round(out.num_rows / wall, 1),
        "num_cpus": CPUS,
        "object_store_mb": 512,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
