"""Aggregation helpers: two-phase grouped counts/sums, top-k, multi-dim counts.

The reference's aggregates are in-memory ``collections.Counter`` over a
single process (pan_dynamic_parser.py:1039-1096).  Here every aggregate is
TWO-PHASE, designed for the 100 TB case (SURVEY.md §2.5, §4.2):

1. **partial**: inside ``map_batches``, ``pyarrow.TableGroupBy`` collapses
   each block to at most |distinct keys in block| rows — value-skewed keys
   (hot domains) are pre-combined before they ever leave the task;
2. **merge**: the partials are combined with an associative pyarrow
   group_by.  Two merge strategies:

   * ``mode="tree"`` (default): ``repartition(fanin) -> merge ->
     repartition(1) -> merge`` — a combiner tree of plain map tasks, no
     sort-based shuffle at all.  Orders of magnitude cheaper than Ray's
     sort-based ``groupby`` when the distinct-key set fits one task
     (counts over bounded dims, report aggregates, dedup of deterministic
     pairs).  This is exactly a MapReduce combiner cascade.
   * ``mode="shuffle"``: one key-based hash shuffle
     (``stages/shuffle.hash_merge``) — required when the distinct-key set
     itself is too large for one task (e.g. billions of URLs); keys are
     co-located across ``final_partitions`` merge tasks, never funneled.

Sums/counts/mins are associative+commutative, so the tree merge is exact.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["count_by", "top_k", "sum_by", "multi_count", "multi_count_fn",
           "grouped_agg", "tree_merge", "local_topk",
           "exact_grouped_quantiles"]


def exact_grouped_quantiles(load, prep, qs, *, nbins: int = 4096,
                            max_passes: int = 8, fanin: int = 8):
    """EXACT grouped ``quantile_disc`` over an UNBOUNDED integer domain via
    iterative histogram refinement (distributed selection), all quantiles
    simultaneously — the generic engine behind
    ``q_median_price_by_priority`` and ``log_value_mad_outliers``.

    ``load()`` returns a fresh Dataset per pass (the input is scanned
    O(log_nbins(domain)) times, 2-3 passes for cent-scale domains);
    ``prep(batch)`` maps each block to exactly two columns:
    ``grp`` (string group key) and ``val`` (int64).  Returns
    ``(groups: list[str], res: np.ndarray[groups x qs] int64)`` with the
    DuckDB ``quantile_disc`` rank rule (k-th smallest, k = ceil(n*q)).
    Groups with no rows are absent.  Driver state is groups x qs x nbins
    counts per pass; per-block partials ride the combiner tree — nothing
    corpus-sized ever moves.
    """
    import numpy as np
    import pyarrow.compute as pc

    nq = len(qs)

    def stats(b: pa.Table) -> pa.Table:
        g = prep(b).group_by(["grp"]).aggregate(
            [("val", "count"), ("val", "min"), ("val", "max")])
        return g.rename_columns(["grp", "cnt", "vmin", "vmax"])

    base = pa.concat_tables(list(tree_merge(
        load().map_batches(stats, batch_format="pyarrow", batch_size=None),
        ["grp"], [("cnt", "sum"), ("vmin", "min"), ("vmax", "max")],
        fanin=fanin).iter_batches(batch_format="pyarrow", batch_size=None)))
    groups = base["grp"].to_pylist()
    if not groups:
        return [], np.empty((0, nq), dtype=np.int64)
    n = np.asarray(base["cnt"], dtype=np.int64)
    # unit u = g * nq + qi: independent (lo, hi, k) per group x quantile
    lo = np.repeat(np.asarray(base["vmin"], dtype=np.int64), nq)
    hi = np.repeat(np.asarray(base["vmax"], dtype=np.int64), nq)
    k = np.maximum(np.ceil(np.repeat(n, nq) *
                           np.tile(np.asarray(qs), len(groups)))
                   .astype(np.int64), 1)

    for _ in range(max_passes):
        live = lo < hi
        if not live.any():
            break
        binw = np.where(live, -(-(hi - lo + 1) // nbins), 1)
        grp_arr = pa.array([str(g) for g in groups], type=pa.string())
        lo_c, hi_c, binw_c, live_c = (lo.copy(), hi.copy(), binw.copy(),
                                      live.copy())

        def hist(b: pa.Table, *, grp_arr=grp_arr, lo_c=lo_c, hi_c=hi_c,
                 binw_c=binw_c, live_c=live_c) -> pa.Table:
            t = prep(b)
            gi = np.asarray(
                pc.fill_null(pc.index_in(t["grp"], value_set=grp_arr), -1),
                dtype=np.int64)
            v = np.asarray(t["val"], dtype=np.int64)
            ok = gi >= 0
            gi, v = gi[ok], v[ok]
            keys, cnts = [], []
            for qi in range(nq):             # nq tiny — rows vectorized
                u = gi * nq + qi
                m = live_c[u] & (v >= lo_c[u]) & (v <= hi_c[u])
                um, vm = u[m], v[m]
                packed = um * nbins + (vm - lo_c[um]) // binw_c[um]
                ub, cnt = np.unique(packed, return_counts=True)
                keys.append(ub)
                cnts.append(cnt)
            return pa.table({
                "gkey": pa.array(np.concatenate(keys).astype(np.int64)),
                "cnt": pa.array(np.concatenate(cnts).astype(np.int64))})

        hb = pa.concat_tables(list(tree_merge(
            load().map_batches(hist, batch_format="pyarrow", batch_size=None),
            ["gkey"], [("cnt", "sum")],
            fanin=fanin).iter_batches(batch_format="pyarrow",
                                      batch_size=None)))
        gkey = np.asarray(hb["gkey"], dtype=np.int64)
        cnt = np.asarray(hb["cnt"], dtype=np.int64)
        order = np.argsort(gkey)
        gkey, cnt = gkey[order], cnt[order]
        u_all, bins_all = gkey // nbins, gkey % nbins
        for u in np.unique(u_all):           # bounded: groups x quantiles
            m = u_all == u
            cum = np.cumsum(cnt[m])
            j = int(np.searchsorted(cum, k[u]))
            b_sel = int(bins_all[m][j])
            k[u] -= int(cum[j - 1]) if j else 0
            new_lo = lo[u] + b_sel * binw[u]
            hi[u] = min(hi[u], new_lo + binw[u] - 1)
            lo[u] = new_lo
    assert (lo == hi).all(), "histogram refinement did not converge"
    return groups, lo.reshape(len(groups), nq).astype(np.int64)


def tree_merge(partials, keys: list[str], agg_specs: list[tuple[str, str]],
               *, fanin: int = 8):
    """Merge a Dataset of partial aggregate tables with a combiner tree.

    ``agg_specs`` = [(column, fn)] with fn in {sum, min, max}; column names
    are preserved through the merge (pyarrow's ``_sum`` suffixes renamed
    back).  Result: ONE block holding one row per distinct key.
    """

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        g = batch.group_by(keys).aggregate(agg_specs)
        return g.rename_columns(keys + [c for c, _ in agg_specs])

    out = partials
    if fanin > 1:
        out = out.repartition(fanin).map_batches(merge, batch_format="pyarrow",
                                                 batch_size=None)
    return out.repartition(1).map_batches(merge, batch_format="pyarrow",
                                          batch_size=None)


def tree_combine(ds, combine_fn, *, fanin: int = 8):
    """Combiner cascade for MERGEABLE-SKETCH partials that pyarrow
    group_by cannot express (register max per group, sketch sums, bounded
    candidate unions): repartition(fanin) -> combine -> repartition(1) ->
    combine.  ``combine_fn`` maps a block of partial rows to one (or few)
    combined rows and must be associative over row concatenation."""
    out = ds
    if fanin > 1:
        out = out.repartition(fanin).map_batches(
            combine_fn, batch_format="pyarrow", batch_size=None)
    return out.repartition(1).map_batches(combine_fn, batch_format="pyarrow",
                                          batch_size=None)


def grouped_agg(ds, keys, sum_cols=None, *, count_name=None, mode="tree",
                fanin=8, final_partitions=None):
    """Multi-column grouped sums (+ row count) with per-block pre-aggregation.

    ``sum_cols`` maps output name -> input column.  Output columns:
    ``keys + list(sum_cols) + ([count_name] if count_name)``.
    ``final_partitions`` is used as the repartition width under shuffle
    mode (ignored under tree mode, which has its own ``fanin``).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    sum_cols = sum_cols or {}
    out_names = list(sum_cols)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys + list(dict.fromkeys(sum_cols.values())))
        aggs = [(col, "sum") for col in sum_cols.values()] + [([], "count_all")]
        g = t.group_by(keys).aggregate(aggs)
        mapping = {f"{col}_sum": name for name, col in sum_cols.items()}
        mapping["count_all"] = "__rows"
        return g.rename_columns([mapping.get(c, c) for c in g.column_names])

    p = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def finalize(batch: pa.Table) -> pa.Table:
        t = batch.select(keys + out_names + ["__rows"])
        if count_name is not None:
            return t.rename_columns(keys + out_names + [count_name])
        return t.drop_columns(["__rows"])

    specs = [(n, "sum") for n in out_names] + [("__rows", "sum")]
    if mode == "tree":
        merged = tree_merge(p, keys, specs, fanin=fanin)
    else:
        from .shuffle import hash_merge

        merged = hash_merge(p, keys, specs,
                            num_partitions=final_partitions or 16)
    return merged.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def _partial_count_fn(keys, drop_null_keys):
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.select(keys)
        if drop_null_keys:
            for k in keys:
                t = t.filter(pc.is_valid(t[k]))
        t = t.group_by(keys).aggregate([([], "count_all")])
        return t.rename_columns(keys + ["count"])

    return fn


def count_by(ds, keys, *, count_name="count", drop_null_keys=False, mode="tree",
             fanin=8, final_partitions=None):
    """Grouped row counts with per-block pre-aggregation.

    Returns a Dataset with columns ``keys + [count_name]``.  Null keys are
    kept as their own group (matching SQL GROUP BY) unless ``drop_null_keys``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    partial = ds.map_batches(_partial_count_fn(keys, drop_null_keys),
                             batch_format="pyarrow", batch_size=None)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(keys + [count_name])

    if mode == "tree":
        merged = tree_merge(partial, keys, [("count", "sum")], fanin=fanin)
    else:
        from .shuffle import hash_merge

        merged = hash_merge(partial, keys, [("count", "sum")],
                            num_partitions=final_partitions or 16)
    if count_name == "count":
        return merged
    return merged.map_batches(rename, batch_format="pyarrow", batch_size=None)


def sum_by(ds, keys, value_col, *, sum_name=None, mode="tree", fanin=8):
    """Grouped sum with per-block pre-aggregation."""
    sum_name = sum_name or f"sum_{value_col}"
    return grouped_agg(ds, keys, {sum_name: value_col}, mode=mode, fanin=fanin)


def top_k(ds, keys, k, *, count_name="count", drop_null_keys=False, mode="tree",
          fanin=8, final_partitions=None):
    """Top-k keys by count desc (reference ``Counter.most_common(k)``,
    pan_dynamic_parser.py:1073-1081).  The sort input is already collapsed
    to one row per distinct key, so the global sort is tiny."""
    counts = count_by(ds, keys, count_name=count_name, drop_null_keys=drop_null_keys,
                      mode=mode, fanin=fanin, final_partitions=final_partitions)
    # per-block prefilter: merged blocks hold complete key groups (tree:
    # one block; shuffle: hash-disjoint), so the final sort sees at most
    # blocks x k candidate rows even for corpus-sized key sets
    keys = [keys] if isinstance(keys, str) else list(keys)
    counts = local_topk(counts, [count_name] + keys, k)
    return counts.sort(count_name, descending=True).limit(k)


def multi_count_fn(dims):
    """One-pass multi-dimension partial counter for report-style aggregates.

    ``dims`` maps dimension name -> key column.  Emits a tall table
    ``(dim, key, count)`` per batch (null keys dropped).  All report
    dimensions are counted in a SINGLE pass over the data instead of one
    lineage execution per dimension.
    """
    import numpy as np
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        dims_out = []
        keys_out = []
        counts_out = []
        sizes = []
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
        dim_col = pa.array(np.repeat(np.array(dims_out, dtype=object), sizes),
                           type=pa.string())
        return pa.table({
            "dim": dim_col,
            "key": pa.concat_arrays(keys_out),
            "count": pa.concat_arrays([c.cast(pa.int64()) for c in counts_out]),
        })

    return fn


def multi_count(ds, dims, *, mode="tree", fanin=8, final_partitions=None):
    """(dim, key, count) Dataset over all dimensions in one pass."""
    partial = ds.map_batches(multi_count_fn(dims), batch_format="pyarrow",
                             batch_size=None)
    if mode == "tree":
        return tree_merge(partial, ["dim", "key"], [("count", "sum")], fanin=fanin)

    from .shuffle import hash_merge

    return hash_merge(partial, ["dim", "key"], [("count", "sum")],
                      num_partitions=final_partitions or 16)


def local_topk(ds, sort_keys, k, *, descending=None):
    """Per-block top-k prefilter before a global ``sort().limit(k)``.

    Valid whenever each block holds COMPLETE key groups — true after
    either merge mode (tree: everything in one block; shuffle: hash
    partitions hold disjoint keys) — so the global top-k always survives
    the prefilter and the final all-to-all sort sees at most
    ``blocks x k`` rows instead of the whole key directory.  The
    ``doc_term_df`` top-N plan (VERDICT r02 item 1), generalized.
    """
    descending = descending or [True] + [False] * (len(sort_keys) - 1)
    order = [(c, "descending" if d else "ascending")
             for c, d in zip(sort_keys, descending)]

    def prune(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        return b.sort_by(order).slice(0, k)

    return ds.map_batches(prune, batch_format="pyarrow", batch_size=None)
