"""Key-based hash partitioning (the scale-path shuffle primitive).

Ray Data 2.49 supports true hash partitioning — ``Dataset.repartition(P,
keys=[...])`` routes every row of a key to exactly one output block — but
only under ``DataContext.shuffle_strategy = HASH_SHUFFLE``.  Each Dataset
carries its OWN context copy (``ds.context``), so the strategy is set on
the input dataset's plan only — nothing global is touched and other
pipelines' plans are unaffected.

This replaces the ``repartition(1)`` combiner-tree tail wherever the
distinct-key set itself scales with the corpus (LSH band buckets, content
hashes, per-doc shingle joins): each output block holds a co-located
subset of keys, and per-block work stays bounded by ``num_partitions``
sizing instead of collapsing onto one task.

``hash_merge`` is the shuffle-mode twin of ``aggregate.tree_merge``: same
(keys, agg_specs) contract, but the merge runs once per hash partition —
no single task ever sees the whole key set.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["enable_hash_shuffle", "hash_partition", "hash_merge",
           "input_size_bytes", "resolve_mode"]

# Aggregator actors are concat/IO workers, not compute: Ray's default sizing
# reserves ~half the cluster CPUs PER shuffle operator for them, which
# deadlocks a DAG chaining several shuffle/join ops on a small CPU budget
# (each op's actor pool waits for CPUs the other ops' pools hold; measured:
# 5 ops x 16 partitions x 0.05 CPU = the entire 4-CPU test cluster).  A
# near-zero per-partition CPU keeps every pool schedulable regardless of DAG
# width; the real work stays in the map tasks either side of the exchange.
_AGG_CPUS_PER_PARTITION = 0.01


def _aggregator_cap() -> int:
    """Aggregator-actor pool size scaled to the cluster: spawning an actor
    costs a worker process (~150 ms+), and on a small box that fixed cost
    dominates small shuffles — 4 aggregators handle 16 partitions fine.
    On a big cluster more aggregators spread the exchange (Ray caps at 64).
    """
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:
        ncpu = 0
    return max(4, min(64, (ncpu or 32) // 8))


def enable_hash_shuffle(ds):
    """Switch ``ds``'s (per-plan) context to hash shuffling with lightweight
    aggregator actors.  Returns ``ds`` for chaining."""
    from ray.data.context import ShuffleStrategy

    ctx = ds.context
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = _AGG_CPUS_PER_PARTITION
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = _AGG_CPUS_PER_PARTITION
    ctx.join_operator_actor_num_cpus_per_partition_override = _AGG_CPUS_PER_PARTITION
    ctx.max_hash_shuffle_aggregators = _aggregator_cap()
    return ds


# Size-based planner cutover for the dual-mode (tree | shuffle) merges: the
# combiner tree funnels the distinct-key partials into ONE task, which is
# the cheaper plan while that fits comfortably — above the threshold the
# hash shuffle spreads the key directory.  64 MiB of on-disk input is far
# below any single-task limit, so the cutover is conservative in the safe
# direction; correctness is mode-invariant (tested both ways).
AUTO_TREE_MAX_BYTES = 64 << 20


def input_size_bytes(*paths: str) -> int | None:
    """Total on-disk bytes of the inputs, DIRECTORY-aware (a parquet
    "file" may be a write_parquet directory of part files; getsize on a dir
    returns the ~4 KiB inode).  ``None`` when any path is unreadable."""
    import glob
    import os

    def size_of(p: str) -> int:
        if os.path.isdir(p):
            return sum(os.path.getsize(f)
                       for f in glob.glob(f"{p}/**/*", recursive=True)
                       if os.path.isfile(f))
        return os.path.getsize(p)

    try:
        return sum(size_of(p) for p in paths)
    except OSError:
        return None


def resolve_mode(mode: str, *paths: str) -> str:
    """``"auto"`` -> ``"tree"`` when every input file is under
    ``AUTO_TREE_MAX_BYTES``, else ``"shuffle"``; other values pass through."""
    if mode != "auto":
        return mode
    total = input_size_bytes(*paths)
    if total is None:
        return "shuffle"  # unknown size: assume big
    return "tree" if total < AUTO_TREE_MAX_BYTES else "shuffle"


def hash_partition(ds, keys: list[str], num_partitions: int):
    """Hash-partition ``ds`` by ``keys`` into ``num_partitions`` blocks.

    Every row of a given key tuple lands in exactly one output block, so a
    per-block ``map_batches`` afterwards sees complete key groups.
    """
    return enable_hash_shuffle(ds).repartition(num_partitions, keys=list(keys))


def hash_merge(partials, keys: list[str], agg_specs: list[tuple[str, str]],
               *, num_partitions: int = 16):
    """Merge a Dataset of partial aggregates with ONE hash shuffle.

    Shuffle-mode twin of ``aggregate.tree_merge`` (same contract:
    ``agg_specs`` = [(column, fn)], fn in {sum, min, max}; column names
    preserved).  Result: ``num_partitions`` blocks, each holding one row
    per distinct key of its hash range — the key set never funnels through
    a single task, so it scales to corpus-sized key domains (distinct
    URLs, text hashes, LSH buckets).
    """
    keys = list(keys)

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        g = batch.group_by(keys).aggregate(agg_specs)
        return g.rename_columns(keys + [c for c, _ in agg_specs])

    part = hash_partition(partials, keys, num_partitions)
    return part.map_batches(merge, batch_format="pyarrow", batch_size=None)
