"""Reproducible stress check for the real-codec multimodal decode tier.

Runs ``mm_mixed_decode`` — the MixedMediaProbe dispatch stage routing
genuine PNG / WAV / MP4 payloads through all three in-repo parsers — over
a synthetic N-doc corpus in a fresh Ray session with a 512 MB object
store cap (the payload-bounded explicit batch_size is the claim under
test: decoded batches must stream, never pile up).

Sanity is EXACT, not statistical: every doc's (modality, n_units,
checksum) must equal the synthesis rule's closed form, computed here
vectorized with numpy over the full max-dimension grids (masked per doc)
— an independent second implementation of the oracle arithmetic.

Usage: python tools/stress_multimodal.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
STORE_MB = 512


def ground_truth(n: int):
    """Vectorized closed-form (modality, n_units, checksum) per doc —
    independent of both the pipeline and the DuckDB oracle."""
    import numpy as np

    ids = np.arange(n, dtype=np.int64)
    m = ids % 3
    n_units = np.zeros(n, dtype=np.int64)
    checksum = np.zeros(n, dtype=np.int64)

    # image branch: full (H, W, 3) grid masked per doc
    img = ids[m == 0]
    if len(img):
        w = 8 + img % 9
        h = 8 + img % 7
        r = np.arange(14, dtype=np.int64)
        c = np.arange(16, dtype=np.int64)
        ch = np.arange(3, dtype=np.int64)
        # (docs, r, c, ch) in manageable chunks
        vals = ((img[:, None, None, None] * 31 + r[None, :, None, None] * 7
                 + c[None, None, :, None] * 3 + ch[None, None, None, :] * 11)
                % 256)
        mask = ((r[None, :, None, None] < h[:, None, None, None])
                & (c[None, None, :, None] < w[:, None, None, None]))
        checksum[m == 0] = (vals * mask).sum(axis=(1, 2, 3))
        n_units[m == 0] = w * h * 3
    # audio branch
    aud = ids[m == 1]
    if len(aud):
        nfr = 16 + aud % 49
        nch = 1 + aud % 2
        f = np.arange(64, dtype=np.int64)
        c2 = np.arange(2, dtype=np.int64)
        vals = np.abs((aud[:, None, None] * 131 + f[None, :, None] * 17
                       + c2[None, None, :] * 29) % 4096 - 2048)
        mask = ((f[None, :, None] < nfr[:, None, None])
                & (c2[None, None, :] < nch[:, None, None]))
        checksum[m == 1] = (vals * mask).sum(axis=(1, 2))
        n_units[m == 1] = nfr * nch
    # video branch
    vid = ids[m == 2]
    if len(vid):
        nt = 1 + vid % 3
        t = np.arange(3, dtype=np.int64)
        j = np.arange(16, dtype=np.int64)
        ns = 4 + (vid[:, None] + t[None, :]) % 13           # (docs, t)
        tmask = t[None, :] < nt[:, None]
        vals = 100 + (vid[:, None, None] * 7 + t[None, :, None] * 11
                      + j[None, None, :] * 3) % 900
        mask = tmask[:, :, None] & (j[None, None, :] < ns[:, :, None])
        checksum[m == 2] = (vals * mask).sum(axis=(1, 2))
        n_units[m == 2] = (ns * tmask).sum(axis=1)
    modality = np.asarray(["image", "audio", "video"], dtype=object)[m]
    return modality, n_units, checksum


def main():
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    work = "/tmp/stress_multimodal"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64))}),
        f"{work}/documents.parquet", row_group_size=65536)

    want_mod, want_units, want_sum = ground_truth(N_DOCS)

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False,
             object_store_memory=STORE_MB * 1024 * 1024)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from logparse_rs_ray.pipelines.multimodal import mm_mixed_decode

    t0 = time.perf_counter()
    got = mm_mixed_decode(work).to_pandas()
    wall = time.perf_counter() - t0
    ray.shutdown()

    got = got.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == N_DOCS, len(got)
    assert (got.doc_id.to_numpy() == np.arange(N_DOCS)).all()
    assert (got.modality.to_numpy() == want_mod).all(), "modality mismatch"
    assert (got.n_units.to_numpy() == want_units).all(), "n_units mismatch"
    assert (got.checksum.to_numpy() == want_sum).all(), "checksum mismatch"

    print(json.dumps({
        "metric": "stress_multimodal", "n_docs": N_DOCS,
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(N_DOCS / wall),
        "num_cpus": CPUS, "object_store_mb": STORE_MB,
        "exact": True,
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
