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


_SALT_COL = "__join_salt"


def sample_hot_keys(ds, on: str, *, threshold_frac: float = 0.05,
                    max_keys: int = 64) -> "pa.Array":
    """Detect join keys carrying more than ``threshold_frac`` of the rows.

    One cheap counting pass: per-block (key, count) partials (bounded by
    the block's distinct keys) funnel through a driver-side accumulation
    that only keeps keys already heavy INSIDE some block — a key can only
    exceed a global fraction if it exceeds a proportional share of at
    least one block, so the driver state stays bounded by
    ``max_keys x n_blocks`` candidate rows, never the key domain.
    """
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        g = b.select([on]).group_by([on]).aggregate([([], "count_all")])
        g = g.rename_columns([on, "cnt"])
        order = pc.select_k_unstable(g, k=max_keys,
                                     sort_keys=[("cnt", "descending")])
        return g.take(order)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    total = 0
    counts: dict = {}
    for t in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for k, c in zip(t[on].to_pylist(), t["cnt"].to_pylist()):
            counts[k] = counts.get(k, 0) + c
            total += c
    # total undercounts keys trimmed by per-block top-k, so re-count rows
    total = ds.count()
    hot = [k for k, c in counts.items() if c >= threshold_frac * total]
    return pa.array(hot[:max_keys])


def salted_join(left, right, on: str, right_on: str | None = None, *,
                hot_keys, num_salts: int = 16, num_partitions: int = 32,
                join_type: str = "inner"):
    """Skew-safe hash join: Zipf-hot keys are split across ``num_salts``
    sub-partitions so no single join partition holds a hot key's entire
    row set (the straggler that caps ``hash_join`` throughput at
    1/skew).

    Left rows of a hot key get a round-robin salt; the right side's hot
    rows are REPLICATED once per salt (right side's hot subset must be
    small relative to a partition — it usually is, skew lives on the
    probe side); all other rows ride salt 0.  Joining on
    ``(key, salt)`` is then row-for-row equivalent to the unsalted join
    for ``inner`` and ``left`` joins (each left hot row sees exactly one
    replica).  ``right``/``full`` joins would duplicate unmatched right
    hot rows per salt — rejected.

    ``hot_keys``: iterable / pa.Array of key values (from
    ``sample_hot_keys`` or domain knowledge).  Empty -> plain
    ``hash_join``.
    """
    import numpy as np
    import pyarrow.compute as pc

    if join_type not in ("inner", "left_outer"):
        raise ValueError(f"salted_join supports inner/left_outer only, "
                         f"got {join_type!r}")
    right_on = on if right_on is None else right_on
    hot = pa.array(list(hot_keys)) if not isinstance(
        hot_keys, (pa.Array, pa.ChunkedArray)) else hot_keys
    if len(hot) == 0:
        return hash_join(left, right, on, right_on, join_type=join_type,
                         num_partitions=num_partitions)

    def salt_left(b: pa.Table) -> pa.Table:
        is_hot = np.asarray(pc.is_in(b[on], value_set=hot))
        salt = np.zeros(b.num_rows, dtype=np.int32)
        n_hot = int(is_hot.sum())
        if n_hot:  # round-robin within the batch: even split, no hashing
            salt[is_hot] = np.arange(n_hot, dtype=np.int32) % num_salts
        return b.append_column(_SALT_COL, pa.array(salt))

    def salt_right(b: pa.Table) -> pa.Table:
        is_hot = np.asarray(pc.is_in(b[right_on], value_set=hot))
        cold = b.filter(pa.array(~is_hot)).append_column(
            _SALT_COL, pa.array(np.zeros(int((~is_hot).sum()),
                                         dtype=np.int32)))
        hot_rows = b.filter(pa.array(is_hot))
        replicas = [hot_rows.append_column(
            _SALT_COL, pa.array(np.full(hot_rows.num_rows, s,
                                        dtype=np.int32)))
                    for s in range(num_salts)]
        return pa.concat_tables([cold] + replicas)

    lsalted = left.map_batches(salt_left, batch_format="pyarrow",
                               batch_size=None)
    rsalted = right.map_batches(salt_right, batch_format="pyarrow",
                                batch_size=None)
    joined = hash_join(lsalted, rsalted, (on, _SALT_COL),
                       (right_on, _SALT_COL), join_type=join_type,
                       num_partitions=num_partitions)
    return joined.drop_columns([_SALT_COL])
