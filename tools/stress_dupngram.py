"""Reproducible stress check for the sliding duplicated-n-gram signal.

Builds the same boilerplate-heavy corpus shape as ``stress_passage.py`` —
``n_docs`` docs of 64 words where every EVEN 8-word slot comes from a tiny
shared boilerplate pool and every odd slot is unique to the doc — and runs
``doc_dup_ngram_stats`` in a fresh Ray session with the object store
capped at 512 MB.

Ground truth is exact and closed-form: with boiler/unique slots
alternating, the ONLY sliding 8-gram that can repeat corpus-wide is the
aligned gram at the start of each boiler slot (every other position mixes
in a doc-unique word), so per doc ``n_grams == 57`` and ``n_dup_grams``
equals the number of its 4 boiler slots whose picked passage occurs >= 2
times in the whole corpus (computed exactly from the pick matrix — with
4*n_docs picks over a 64-passage pool every passage occurs thousands of
times, but the assertion derives it, never assumes it).

Usage: python tools/stress_dupngram.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
POOL = 64
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def build_corpus(path: str):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(778)
    boiler = np.array([" ".join(f"nav{b:02d}w{j}" for j in range(8))
                       for b in range(POOL)], dtype=object)
    picks = rng.integers(0, POOL, size=(N_DOCS, 4))
    texts = [
        " ".join(p for i in range(4)
                 for p in (boiler[picks[d, i]],
                           " ".join(f"u{d}x{i}w{j}" for j in range(8))))
        for d in range(N_DOCS)
    ]
    pq.write_table(pa.table({"doc_id": pa.array(np.arange(N_DOCS,
                                                          dtype=np.int64)),
                             "text": pa.array(texts, type=pa.string())}),
                   f"{path}/documents.parquet")
    pool_count = np.bincount(picks.ravel(), minlength=POOL)
    dup_per_doc = (pool_count[picks] >= 2).sum(axis=1).astype(np.int64)
    return dup_per_doc


def main() -> None:
    import shutil

    import numpy as np
    import ray

    work = "/tmp/stress_dupngram_corpus"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    dup_per_doc = build_corpus(work)

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
             object_store_memory=512 * 1024 * 1024, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from logparse_rs_ray.pipelines.textops import doc_dup_ngram_stats

    t0 = time.perf_counter()
    out = (doc_dup_ngram_stats(work, num_partitions=16)
           .to_pandas().sort_values("doc_id"))
    wall = time.perf_counter() - t0
    ray.shutdown()

    assert len(out) == N_DOCS, len(out)
    assert (out.n_grams == 57).all()
    got = out.n_dup_grams.to_numpy()
    assert (got == dup_per_doc).all(), \
        f"{int((got != dup_per_doc).sum())} docs diverge from ground truth"
    assert (out.dup_permille == (1000 * got) // 57).all()

    print(json.dumps({
        "metric": "sliding dup-ngram stress (exact ground truth)",
        "n_docs": N_DOCS, "grams_per_doc": 57, "boiler_pool": POOL,
        "num_cpus": CPUS, "object_store_mb": 512,
        "total_dup_grams": int(got.sum()),
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(N_DOCS / wall, 1),
    }))


if __name__ == "__main__":
    main()
