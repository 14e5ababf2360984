"""Join operators: broadcast (small-side) joins and hash-partitioned joins.

The reference has no relational joins (SURVEY.md §2.4) — its only "joins"
are broadcast dict lookups.  This module supplies the two join shapes a
100 TB pipeline needs:

* :class:`BroadcastJoiner` — the small side (dimension table) is put in the
  object store ONCE (``ray.put``) and joined inside every ``map_batches``
  task with Arrow's C++ hash join (``pa.Table.join``).  No shuffle; the
  small table is fetched at most once per worker process (plasma-local
  afterwards).  This is the right shape whenever one side fits in a worker
  heap — nation/region/customer dimensions, lookup maps, vocab tables.
* :func:`hash_join` — both sides large: delegates to ``Dataset.join``
  (hash-partitioned shuffle join).  ``num_partitions`` must be sized so one
  partition of the bigger side fits in a worker heap (skewed keys: salt the
  build side upstream or raise num_partitions).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["BroadcastJoiner", "broadcast_join", "hash_join"]


class BroadcastJoiner:
    """map_batches callable: Arrow hash-join each batch against a broadcast table.

    Pass an instance to ``ds.map_batches(BroadcastJoiner(small_tbl, ...))``:
    Ray serializes the constructed object once per task/actor; the small
    table rides in the closure (or, when given a ``ray.ObjectRef``, is
    fetched from the local object store on first use).
    """

    def __init__(self, small: "pa.Table | object", keys: list[str] | str,
                 right_keys: list[str] | str | None = None,
                 join_type: str = "inner",
                 columns: list[str] | None = None):
        self._small = small  # pa.Table or ObjectRef[pa.Table]
        self._resolved: pa.Table | None = None
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        rk = right_keys if right_keys is not None else keys
        self.right_keys = [rk] if isinstance(rk, str) else list(rk)
        self.join_type = join_type
        self.columns = columns

    def _table(self) -> pa.Table:
        if self._resolved is None:
            small = self._small
            if not isinstance(small, pa.Table):
                import ray

                small = ray.get(small)
            if self.columns is not None:
                keep = list(dict.fromkeys(self.right_keys + self.columns))
                small = small.select(keep)
            self._resolved = small.combine_chunks()
        return self._resolved

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(
            self._table(), keys=self.keys, right_keys=self.right_keys,
            join_type=self.join_type,
        )


def broadcast_join(ds, small: pa.Table, keys, right_keys=None, *,
                   join_type: str = "inner", columns: list[str] | None = None,
                   **map_kwargs):
    """ds ⋈ small — no shuffle; see BroadcastJoiner."""
    return ds.map_batches(
        BroadcastJoiner(small, keys, right_keys, join_type, columns),
        batch_format="pyarrow", batch_size=None, **map_kwargs,
    )


# ~64 MiB of input per join partition: each partition carries a fixed
# aggregator-actor cost (measured 0.3-0.5 s each at toy scale), so the
# count must grow with the data, not sit at a constant — 16 partitions is
# simultaneously too many for a 20 MB toy join and far too few at 100 TB.
JOIN_PARTITION_BYTES = 64 * 1024 * 1024


def auto_join_partitions(*paths: str, lo: int = 4, hi: int = 512) -> int:
    """Size-derived hash-join partition count from the on-disk bytes of
    the join inputs; ``lo`` when sizes are unknown (safe small side)."""
    from .shuffle import input_size_bytes

    n = input_size_bytes(*paths)
    if n is None:
        return lo
    return max(lo, min(hi, -(-n // JOIN_PARTITION_BYTES)))


def hash_join(left, right, on, right_on=None, *, join_type: str = "inner",
              num_partitions: int = 32):
    """Large ⋈ large via Ray Data's hash-partitioned shuffle join.

    CONSTRAINT: both sides must carry at least one schema'd block per
    join key column — Ray's zero-COLUMN empty blocks (born when a read
    splits a file into more blocks than rows, or when a map/repartition
    stage sees only empty input) make the per-partition pyarrow
    concatenation fail with "No match ... for key field reference".
    ``sources.read_table`` forces one block for degenerate files, which
    covers reads; a side that a FILTER can empty entirely must not feed
    this operator — use the union + ``hash_partition`` + per-block
    membership pattern instead (``dedup._key_filter_survivors``).
    """
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = on if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on)
    )
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=on, right_on=right_on)
