"""Aggregation helpers: two-phase grouped counts, top-k, error counts.

The reference's aggregates are in-memory ``collections.Counter`` over a
single process (pan_dynamic_parser.py:1039-1096).  Here every count is a
TWO-PHASE aggregate designed for the 100 TB case (SURVEY.md §2.5, §4.2):

1. partial: inside ``map_batches``, ``pyarrow.TableGroupBy`` collapses each
   block to at most |distinct keys in block| rows — value-skewed keys (the
   hot domains) are pre-combined before they ever hit the network;
2. final: a small ``groupby(keys).sum("count")`` shuffle over the partials.

This neutralizes hot-key skew without salting for counts (the partial
already collapses a hot key to ONE row per block).  Salting is reserved for
the routed-write path where raw rows must co-locate (stages/route.py).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["count_by", "top_k", "sum_by", "multi_count", "multi_count_fn", "grouped_agg"]


def grouped_agg(ds, keys: str | list[str], sum_cols: dict[str, str] | None = None,
                *, count_name: str | None = None):
    """Multi-column grouped sums (+ row count) with per-block pre-aggregation.

    ``sum_cols`` maps output name -> input column.  Two-phase: pyarrow
    ``group_by().aggregate(sum, count_all)`` collapses each block, then one
    small ``groupby(keys).sum(...)`` shuffle merges partials.  Output columns:
    ``keys + list(sum_cols) + ([count_name] if count_name)``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    sum_cols = sum_cols or {}
    out_names = list(sum_cols)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys + list(dict.fromkeys(sum_cols.values())))
        aggs = [(col, "sum") for col in sum_cols.values()] + [([], "count_all")]
        g = t.group_by(keys).aggregate(aggs)
        # pyarrow names: keys..., '<col>_sum' per agg (in order), 'count_all'
        mapping = {f"{col}_sum": name for name, col in sum_cols.items()}
        mapping["count_all"] = "__rows"
        return g.rename_columns([mapping.get(c, c) for c in g.column_names])

    p = ds.map_batches(partial, batch_format="pyarrow")
    final = p.groupby(keys).sum(out_names + ["__rows"])

    def rename(batch: pa.Table) -> pa.Table:
        ren = {f"sum({n})": n for n in out_names}
        ren["sum(__rows)"] = count_name or "__rows"
        t = batch.rename_columns([ren.get(c, c) for c in batch.column_names])
        if count_name is None:
            t = t.drop_columns(["__rows"])
        return t

    return final.map_batches(rename, batch_format="pyarrow")


def _partial_count_fn(keys: list[str], drop_null_keys: bool):
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.select(keys)
        if drop_null_keys:
            for k in keys:
                t = t.filter(pc.is_valid(t[k]))
        t = t.group_by(keys).aggregate([([], "count_all")])
        return t.rename_columns(keys + ["count"])

    return fn


def count_by(ds, keys: str | list[str], *, count_name: str = "count",
             drop_null_keys: bool = False):
    """Grouped row counts with per-block pre-aggregation.

    Returns a Dataset with columns ``keys + [count_name]``.  Null keys are
    kept as their own group (matching SQL GROUP BY) unless
    ``drop_null_keys`` — dropping inside the partial avoids a separate
    filter stage.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    partial = ds.map_batches(_partial_count_fn(keys, drop_null_keys), batch_format="pyarrow")
    final = partial.groupby(keys).sum("count")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(keys + [count_name])

    return final.map_batches(rename, batch_format="pyarrow")


def sum_by(ds, keys: str | list[str], value_col: str, *, sum_name: str | None = None):
    """Grouped sum with per-block pre-aggregation."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    sum_name = sum_name or f"sum_{value_col}"

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys + [value_col]).group_by(keys).aggregate([(value_col, "sum")])
        return t.rename_columns(keys + [sum_name])

    p = ds.map_batches(partial, batch_format="pyarrow")
    final = p.groupby(keys).sum(sum_name)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(keys + [sum_name])

    return final.map_batches(rename, batch_format="pyarrow")


def top_k(ds, keys: str | list[str], k: int, *, count_name: str = "count",
          drop_null_keys: bool = False):
    """Top-k keys by count desc (reference ``Counter.most_common(k)``,
    pan_dynamic_parser.py:1073-1081).  The sort input is already collapsed
    to one row per distinct key, so the global sort is tiny."""
    counts = count_by(ds, keys, count_name=count_name, drop_null_keys=drop_null_keys)
    return counts.sort(count_name, descending=True).limit(k)


def multi_count_fn(dims: dict[str, str], *, mask_col: str | None = None):
    """One-pass multi-dimension partial counter for report-style aggregates.

    ``dims`` maps dimension name -> key column.  Emits a tall table
    ``(dim, key, count)`` per batch (null keys dropped); final aggregation is
    ``groupby(["dim", "key"]).sum("count")``.  All report dimensions are
    counted in a SINGLE pass over the data instead of one lineage execution
    per dimension.
    """
    import numpy as np
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        dims_out: list[str] = []
        keys_out: list[pa.Array] = []
        counts_out: list[pa.Array] = []
        sizes: list[int] = []
        for dim, col in dims.items():
            if col not in batch.column_names:
                continue
            t = batch.select([col])
            t = t.filter(pc.is_valid(t[col]))
            if t.num_rows == 0:
                continue
            g = t.group_by([col]).aggregate([([], "count_all")])
            keys_out.append(g[col].combine_chunks().cast(pa.string()))
            counts_out.append(g["count_all"].combine_chunks())
            dims_out.append(dim)
            sizes.append(g.num_rows)
        if not dims_out:
            return pa.table({
                "dim": pa.array([], type=pa.string()),
                "key": pa.array([], type=pa.string()),
                "count": pa.array([], type=pa.int64()),
            })
        dim_col = pa.array(np.repeat(np.array(dims_out, dtype=object), sizes), type=pa.string())
        return pa.table({
            "dim": dim_col,
            "key": pa.concat_arrays(keys_out),
            "count": pa.concat_arrays([c.cast(pa.int64()) for c in counts_out]),
        })

    return fn


def multi_count(ds, dims: dict[str, str]):
    """(dim, key, count) Dataset over all dimensions in one pass."""
    partial = ds.map_batches(multi_count_fn(dims), batch_format="pyarrow")
    final = partial.groupby(["dim", "key"]).sum("count")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["dim", "key", "count"])

    return final.map_batches(rename, batch_format="pyarrow")
