"""Small-file compaction for hive-partitioned parquet output dirs.

A resumable 100-TB run (`state/checkpoint.py` publishes per-partition
dirs; the flagship's hive write fans each sink into per-task files)
legitimately leaves many small parquet files behind — each retried or
narrow partition contributes its own.  Readers pay per-file open/footer
costs, so the operational fix is a COMPACTION pass: merge each leaf
directory's files into ~``target_bytes`` outputs.

Shape: one independent Ray task per leaf directory (the same
filesystem-shuffle idiom as the flagship's integrity/report
consolidation — ``from_items(dirs).repartition(n)``), so compaction
parallelism scales with the partition count and a given directory is
only ever touched by one task.

Crash safety is a two-phase commit per directory:

1. write merged data to ``.compact-*.tmp`` files in the directory;
2. atomically create a ``_compact_commit`` marker naming the originals
   to delete and the tmp->final renames;
3. delete originals, rename tmps, delete the marker.

Recovery on rerun: a directory with a marker replays step 3 verbatim
(deletes/renames are idempotent — missing originals are skipped, a tmp
whose final already exists is dropped); a directory whose files are all
``compact-*`` outputs is skipped, so re-running is a no-op.  Readers
must ignore dotfiles (``.compact-*.tmp``) — pyarrow's dataset readers
already do.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024
MARKER = "_compact_commit"


def _leaf_dirs(root: str) -> list[str]:
    leaves = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(dirpath)
    return sorted(leaves)


def _recover(dirpath: str) -> bool:
    """Replay a pending commit marker.  Returns True if one was found."""
    marker = os.path.join(dirpath, MARKER)
    if not os.path.exists(marker):
        return False
    with open(marker, encoding="utf-8") as fh:
        plan = json.load(fh)
    for name in plan["delete"]:
        p = os.path.join(dirpath, name)
        if os.path.exists(p):
            os.remove(p)
    for tmp, final in plan["rename"]:
        tp, fp = os.path.join(dirpath, tmp), os.path.join(dirpath, final)
        if os.path.exists(tp):
            if os.path.exists(fp):
                os.remove(tp)
            else:
                os.rename(tp, fp)
    os.remove(marker)
    return True


def compact_one_dir(dirpath: str, *,
                    target_bytes: int = DEFAULT_TARGET_BYTES) -> dict:
    """Compact a single directory's parquet files.  Idempotent."""
    import pyarrow.parquet as pq

    recovered = _recover(dirpath)
    files = sorted(f for f in os.listdir(dirpath)
                   if f.endswith(".parquet") and not f.startswith("."))
    originals = [f for f in files if not f.startswith("compact-")]
    if len(files) <= 1 or not originals:
        return {"dir": dirpath, "in_files": len(files), "out_files": len(files),
                "rows": None, "recovered": recovered, "skipped": True}

    tables = [pq.read_table(os.path.join(dirpath, f)) for f in files]
    merged = pa.concat_tables(tables, promote_options="default")
    n_rows = merged.num_rows
    n_out = max(1, -(-merged.nbytes // target_bytes))
    per = -(-n_rows // n_out)

    renames: list[tuple[str, str]] = []
    for i in range(n_out):
        part = merged.slice(i * per, per)
        tmp, final = f".compact-{i:05d}.tmp", f"compact-{i:05d}.parquet"
        pq.write_table(part, os.path.join(dirpath, tmp))
        renames.append((tmp, final))
    plan = {"delete": files, "rename": renames}
    marker_tmp = os.path.join(dirpath, "." + MARKER + ".tmp")
    with open(marker_tmp, "w", encoding="utf-8") as fh:
        json.dump(plan, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(marker_tmp, os.path.join(dirpath, MARKER))  # atomic commit point
    _recover(dirpath)
    return {"dir": dirpath, "in_files": len(files), "out_files": n_out,
            "rows": n_rows, "recovered": recovered, "skipped": False}


def compact_tree(root: str, *, target_bytes: int = DEFAULT_TARGET_BYTES,
                 parallel: bool = True) -> dict:
    """Compact every leaf directory under ``root``; one Ray task each."""
    leaves = _leaf_dirs(root)
    if not leaves:
        return {"root": root, "dirs": 0, "in_files": 0, "out_files": 0}
    if parallel and len(leaves) > 1:
        import ray.data as rd

        def work(b: pa.Table) -> pa.Table:
            stats = [compact_one_dir(d, target_bytes=target_bytes)
                     for d in b["item"].to_pylist()]
            return pa.table({
                "dir": pa.array([s["dir"] for s in stats]),
                "in_files": pa.array([s["in_files"] for s in stats],
                                     pa.int64()),
                "out_files": pa.array([s["out_files"] for s in stats],
                                      pa.int64()),
            })

        res = (rd.from_items(leaves).repartition(len(leaves))
               .map_batches(work, batch_format="pyarrow", batch_size=None)
               .to_pandas())
        in_f, out_f = int(res.in_files.sum()), int(res.out_files.sum())
    else:
        stats = [compact_one_dir(d, target_bytes=target_bytes)
                 for d in leaves]
        in_f = sum(s["in_files"] for s in stats)
        out_f = sum(s["out_files"] for s in stats)
    return {"root": root, "dirs": len(leaves),
            "in_files": in_f, "out_files": out_f}
