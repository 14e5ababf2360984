"""Relational query suite over the TPC-H-ish test tables.

Each query exists twice: a Ray-Data-first implementation (column-pruned
reads, two-phase aggregates, broadcast joins for dimension tables, hash
joins only where both sides are large) and an ANSI-SQL oracle string for
DuckDB — the driver's correctness gate runs both and compares row counts,
schemas and value hashes (column names must match EXACTLY).

Money aggregates are computed in integer cents (``round(x*100)`` /
``round(x*10000)``) so both engines do exact integer arithmetic — float
sums across different reduction orders are not bit-stable, integers are.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..sources import read_table
from ..stages.aggregate import count_by, grouped_agg
from ..stages.join import broadcast_join, hash_join

__all__ = ["QUERIES", "ORACLE_SQL"]


def _read_small(sf_dir: str, name: str, columns=None) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{name}.parquet", columns=columns)


def _cents(col, scale: int = 100):
    # half_towards_infinity == DuckDB ROUND (half away from zero); pyarrow's
    # default is banker's rounding, which diverges on exact .5 (ADVICE r01)
    return pc.cast(pc.round(pc.multiply(col, float(scale)),
                            round_mode="half_towards_infinity"), pa.int64())


def _ts(y: int, m: int, d: int) -> pa.Scalar:
    import datetime

    return pa.scalar(datetime.datetime(y, m, d), type=pa.timestamp("us"))


# --- q1: pricing summary (grouped multi-agg over the fact table) -----------

def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1: the (returnflag, linestatus) pricing-summary census —
    grouped multi-aggregate in integer cents through the combiner tree."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["l_shipdate"], _ts(1998, 9, 2)))
        disc_price = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty": pc.cast(b["l_quantity"], pa.int64()),
            "base_cents": _cents(b["l_extendedprice"]),
            "disc_cents": _cents(disc_price, 10000),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    out = grouped_agg(
        prepped, ["l_returnflag", "l_linestatus"],
        {"sum_qty": "qty", "sum_base_cents": "base_cents", "sum_disc_cents": "disc_cents"},
        count_name="count_order", final_partitions=1,
    )
    return out.sort(["l_returnflag", "l_linestatus"])


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- q6: global filtered aggregate -----------------------------------------

def q6_revenue_forecast(sf_dir: str):
    """Single-row TPC-H Q6 census: revenue from the date/discount/quantity
    band, integer cents, per-block partial -> one combiner."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(b["l_shipdate"], _ts(1994, 1, 1)),
                    pc.less(b["l_shipdate"], _ts(1997, 1, 1))),
            pc.and_(pc.greater_equal(b["l_discount"], 0.02),
                    pc.less_equal(b["l_discount"], 0.09)),
        )
        m = pc.and_(m, pc.less(b["l_quantity"], 24.0))
        b = b.filter(m)
        rev = pc.multiply(b["l_extendedprice"], b["l_discount"])
        return pa.table({"one": pa.array([1] * b.num_rows, type=pa.int64()),
                         "rev_cents": _cents(rev, 10000)})

    prepped = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    return grouped_agg(prepped, ["one"], {"revenue_cents": "rev_cents"},
                       count_name="n_rows", final_partitions=1)


Q6_SQL = """
SELECT CAST(1 AS BIGINT) AS one,
       CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 24
GROUP BY 1
"""


# --- broadcast join chain (dimension enrichment) ---------------------------

def q_customer_regions(sf_dir: str):
    """(r_name, n_customers, acctbal_cents) — customer census per region via
    a broadcast nation⋈region dimension join."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _read_small(sf_dir, "region", ["r_regionkey", "r_name"])
    dim = nation.join(region, keys=["n_regionkey"], right_keys=["r_regionkey"])
    ds = broadcast_join(cust, dim, "c_nationkey", "n_nationkey",
                        columns=["n_name", "r_name"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "r_name": b["r_name"],
            "n_name": b["n_name"],
            "acct_cents": _cents(b["c_acctbal"]),
        })

    out = grouped_agg(ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
                      ["r_name", "n_name"], {"sum_acctbal_cents": "acct_cents"},
                      count_name="n_customers", final_partitions=1)
    return out.sort(["r_name", "n_name"])


Q_CUSTOMER_REGIONS_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents,
       COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# --- large-large hash join -------------------------------------------------

def q_order_lineitem_join(sf_dir: str):
    """(o_orderpriority, n_lines, sum_qty) — the canonical orders⋈lineitem
    hash join (size-derived partitions) with a grouped rollup above it."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def prep_li(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "qty": pc.cast(b["l_quantity"], pa.int64())})

    li = li.map_batches(prep_li, batch_format="pyarrow", batch_size=None)
    from ..stages.join import auto_join_partitions

    joined = hash_join(orders, li, on="o_orderkey", right_on="l_orderkey",
                       num_partitions=auto_join_partitions(
                           f"{sf_dir}/orders.parquet",
                           f"{sf_dir}/lineitem.parquet"))
    out = grouped_agg(joined, ["o_orderpriority"], {"sum_qty": "qty"},
                      count_name="n_lines", final_partitions=1)
    return out.sort("o_orderpriority")


Q_ORDER_LINEITEM_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(*) AS n_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- top-k with deterministic tie-break ------------------------------------

def q_top_parts_by_quantity(sf_dir: str):
    """Top-10 parts by total shipped quantity (grouped sum -> bounded
    top-k; no corpus-wide sort)."""
    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"l_partkey": b["l_partkey"],
                         "qty": pc.cast(b["l_quantity"], pa.int64())})

    from ..stages.aggregate import local_topk

    agg = grouped_agg(li.map_batches(prep, batch_format="pyarrow", batch_size=None),
                      ["l_partkey"], {"sum_qty": "qty"})
    agg = local_topk(agg, ["sum_qty", "l_partkey"], 10)
    return agg.sort(["sum_qty", "l_partkey"], descending=[True, False]).limit(10)


Q_TOP_PARTS_SQL = """
SELECT l_partkey, CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY l_partkey
ORDER BY sum_qty DESC, l_partkey
LIMIT 10
"""


# --- sort + limit (raw values pass through — no float rounding needed) -----

def q_orders_sort_limit(sf_dir: str):
    """Top-10 orders by price — the ORDER BY ... LIMIT shape (bounded
    output, so the distributed sort is legitimate here)."""
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


Q_ORDERS_SORT_SQL = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


# --- filter + project (row passthrough) ------------------------------------

def q_filter_project(sf_dir: str):
    """Row filter + column projection + derived cents column — the simplest
    scan shape, kept as a gate canary."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_shipdate",
                             "l_returnflag", "l_extendedprice"])

    def f(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["l_shipdate"], _ts(1995, 1, 1)),
                    pc.equal(b["l_returnflag"], "R"))
        return b.filter(m).select(["l_orderkey", "l_linenumber", "l_extendedprice"])

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


Q_FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_returnflag = 'R'
"""


# --- distinct --------------------------------------------------------------

def q_distinct_flags(sf_dir: str):
    """DISTINCT (l_returnflag, l_linestatus) via per-block dedup -> one
    combiner (never a corpus-wide unique shuffle on a bounded domain)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])

    def per_block(b: pa.Table) -> pa.Table:
        return b.group_by(["l_returnflag", "l_linestatus"]).aggregate([])

    # per-block distinct then global distinct via groupby count (two-phase)
    dd = count_by(ds.map_batches(per_block, batch_format="pyarrow", batch_size=None),
                  ["l_returnflag", "l_linestatus"], final_partitions=1)
    return dd.select_columns(["l_returnflag", "l_linestatus"]).sort(
        ["l_returnflag", "l_linestatus"]
    )


Q_DISTINCT_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


# --- grouped count over orders --------------------------------------------

def q_count_by_priority(sf_dir: str):
    """(o_orderpriority, n_orders) — GROUP BY COUNT over a bounded key
    domain through the combiner tree."""
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority"])
    return count_by(ds, "o_orderpriority", count_name="n_orders",
                    final_partitions=1).sort("o_orderpriority")


Q_COUNT_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- union ------------------------------------------------------------------

def q_union_counts(sf_dir: str):
    """UNION ALL of two filtered subsets -> grouped counts (ds.union)."""
    hi = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    lo = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def f_hi(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["l_quantity"], 45.0)).select(["l_returnflag"])

    def f_lo(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b["l_quantity"], 5.0)).select(["l_returnflag"])

    u = hi.map_batches(f_hi, batch_format="pyarrow", batch_size=None).union(
        lo.map_batches(f_lo, batch_format="pyarrow", batch_size=None)
    )
    return count_by(u, "l_returnflag", count_name="n_rows",
                    final_partitions=1).sort("l_returnflag")


Q_UNION_SQL = """
SELECT l_returnflag, COUNT(*) AS n_rows FROM (
  SELECT l_returnflag FROM lineitem WHERE l_quantity > 45
  UNION ALL
  SELECT l_returnflag FROM lineitem WHERE l_quantity < 5
) GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- INTERSECT / EXCEPT distinct set ops -------------------------------------

URGENT_PRIO = "1-URGENT"
LOW_PRIO = "5-LOW"


def q_intersect_except(sf_dir: str, *, mode: str = "auto",
                       num_partitions: int = 8):
    """(set_op, n_keys) — INTERSECT / EXCEPT over customer key sets (the
    two distinct set operations missing next to UNION): customers with
    urgent orders vs customers with low-priority orders.

    One pass over orders: per-block distinct custkeys carry (in_a, in_b)
    flags; flags merge with MAX (set union of evidence) through the
    size-gated tree/hash regimes; the census over the merged directory is
    3 bounded rows computed partition-locally (complete key groups after
    either merge) and tree-summed.
    """
    import numpy as np

    from ..stages.aggregate import tree_merge
    from ..stages.shuffle import hash_merge, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/orders.parquet")
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def flags(b: pa.Table) -> pa.Table:
        a = pc.equal(b["o_orderpriority"], URGENT_PRIO)
        bb = pc.equal(b["o_orderpriority"], LOW_PRIO)
        t = pa.table({
            "o_custkey": b["o_custkey"],
            "in_a": pc.cast(a, pa.int64()),
            "in_b": pc.cast(bb, pa.int64()),
        })
        g = t.group_by(["o_custkey"]).aggregate([("in_a", "max"), ("in_b", "max")])
        return g.rename_columns(["o_custkey", "in_a", "in_b"])

    partial = ds.map_batches(flags, batch_format="pyarrow", batch_size=None)
    specs = [("in_a", "max"), ("in_b", "max")]
    if mode == "shuffle":
        merged = hash_merge(partial, ["o_custkey"], specs,
                            num_partitions=num_partitions)
    else:
        merged = tree_merge(partial, ["o_custkey"], specs, fanin=8)

    def census(b: pa.Table) -> pa.Table:
        ia = np.asarray(b["in_a"], dtype=np.int64) if b.num_rows else np.zeros(0, np.int64)
        ib = np.asarray(b["in_b"], dtype=np.int64) if b.num_rows else np.zeros(0, np.int64)
        return pa.table({
            "set_op": pa.array(["except_low", "except_urgent", "intersect"]),
            "n_keys": pa.array([int((ia & ~ib & 1).sum()),
                                int((ib & ~ia & 1).sum()),
                                int((ia & ib).sum())], type=pa.int64()),
        })

    out = tree_merge(merged.map_batches(census, batch_format="pyarrow",
                                        batch_size=None),
                     ["set_op"], [("n_keys", "sum")], fanin=8)
    return out.sort("set_op")


Q_INTERSECT_EXCEPT_SQL = f"""
WITH a AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '{URGENT_PRIO}'),
     b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '{LOW_PRIO}')
SELECT 'except_low' AS set_op,
       (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_keys
UNION ALL
SELECT 'except_urgent',
       (SELECT COUNT(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a))
UNION ALL
SELECT 'intersect',
       (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
ORDER BY set_op
"""


# --- top-N per group (QUALIFY / row_number <= N) ------------------------------

def q_top_orders_per_customer(sf_dir: str, *, n: int = 2,
                              num_partitions: int | None = None):
    """(o_custkey, o_orderkey, price_cents, rn) — each customer's top-``n``
    orders by total price (the classic top-N-per-group window).  ONE
    customer-keyed exchange co-locates each customer's orders; one lexsort
    + segment-rank per partition picks the winners.  Output is
    corpus-proportional (customers x n) — no trailing sort (the gate is
    order-insensitive).
    """
    import numpy as np

    from ..stages.join import auto_join_partitions
    from ..stages.shuffle import hash_partition

    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/orders.parquet")
    ds = read_table(sf_dir, "orders",
                    columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b["o_custkey"],
                         "o_orderkey": b["o_orderkey"],
                         "price_cents": _cents(b["o_totalprice"])})

    def topn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "o_orderkey": pa.array([], pa.int64()),
                             "price_cents": pa.array([], pa.int64()),
                             "rn": pa.array([], pa.int64())})
        c = np.asarray(b["o_custkey"], dtype=np.int64)
        k = np.asarray(b["o_orderkey"], dtype=np.int64)
        p = np.asarray(b["price_cents"], dtype=np.int64)
        order = np.lexsort((k, -p, c))   # per customer: price desc, key asc
        cs = c[order]
        starts = np.ones(len(cs), dtype=bool)
        starts[1:] = cs[1:] != cs[:-1]
        seg_start = np.nonzero(starts)[0]
        rn = np.arange(len(cs)) - seg_start[np.cumsum(starts) - 1] + 1
        keep = order[rn <= n]
        out = b.take(pa.array(keep, type=pa.int64()))
        return out.append_column("rn", pa.array(rn[rn <= n].astype(np.int64)))

    rows = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    return hash_partition(rows, ["o_custkey"], num_partitions).map_batches(
        topn, batch_format="pyarrow", batch_size=None)


Q_TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
       CAST(rn AS BIGINT) AS rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 2
ORDER BY o_custkey, rn
"""


def q_ntile_orders(sf_dir: str, *, k: int = 4,
                   num_partitions: int | None = None):
    """(o_custkey, o_orderkey, price_cents, tile) — NTILE(``k``) buckets of
    each customer's orders by price (the quantile-bucket window shape, e.g.
    price-band assignment).  Same plan as ``q_top_orders_per_customer``:
    ONE customer-keyed exchange, per-partition lexsort + segment rank; the
    tile follows SQL NTILE semantics (the first ``n % k`` tiles get
    ``n//k + 1`` rows).  Corpus-proportional output — no trailing sort.
    """
    import numpy as np

    from ..stages.join import auto_join_partitions
    from ..stages.shuffle import hash_partition

    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/orders.parquet")
    ds = read_table(sf_dir, "orders",
                    columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b["o_custkey"],
                         "o_orderkey": b["o_orderkey"],
                         "price_cents": _cents(b["o_totalprice"])})

    def ntile(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "o_orderkey": pa.array([], pa.int64()),
                             "price_cents": pa.array([], pa.int64()),
                             "tile": pa.array([], pa.int64())})
        c = np.asarray(b["o_custkey"], dtype=np.int64)
        kk = np.asarray(b["o_orderkey"], dtype=np.int64)
        p = np.asarray(b["price_cents"], dtype=np.int64)
        order = np.lexsort((kk, -p, c))  # per customer: price desc, key asc
        cs = c[order]
        starts = np.ones(len(cs), dtype=bool)
        starts[1:] = cs[1:] != cs[:-1]
        seg_id = np.cumsum(starts) - 1
        seg_start = np.nonzero(starts)[0]
        r = np.arange(len(cs)) - seg_start[seg_id]        # 0-based rank
        n = np.diff(np.append(seg_start, len(cs)))[seg_id]  # group size
        sz, big = n // k, n % k
        thresh = big * (sz + 1)
        tile = np.where(r < thresh, r // (sz + 1),
                        big + (r - thresh) // np.maximum(sz, 1)) + 1
        out = b.take(pa.array(order, type=pa.int64()))
        return out.append_column("tile", pa.array(tile.astype(np.int64)))

    rows = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    return hash_partition(rows, ["o_custkey"], num_partitions).map_batches(
        ntile, batch_format="pyarrow", batch_size=None)


Q_NTILE_ORDERS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
       CAST(ntile(4) OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT) AS tile
FROM orders
"""


# --- exact grouped quantile over an unbounded domain (iterative
# histogram refinement / distributed selection) ------------------------------

MEDIAN_QS = (0.25, 0.5, 0.9)


def _q_col(q: float) -> str:
    return "median_cents" if q == 0.5 else f"p{int(q * 100)}_cents"


def q_median_price_by_priority(sf_dir: str, *, qs=MEDIAN_QS,
                               nbins: int = 4096, max_passes: int = 8,
                               fanin: int = 8):
    """(o_orderpriority, p25_cents, median_cents, p90_cents) — EXACT
    grouped ``quantile_disc`` of order price via iterative histogram
    refinement (the distributed selection algorithm), ALL quantiles
    simultaneously: pass 0 collects per-group (count, min, max); each
    refinement pass histograms the still-in-range values into ``nbins``
    buckets per (group, quantile) unit, the driver narrows every unit's
    [lo, hi] to the bucket holding its target rank, and the loop ends
    when each range collapses to one value.

    This is the third quantile shape next to ``doc_len_quantiles`` (exact,
    needs a small discrete domain — shuffle volume O(distinct values)) and
    ``log_value_quantiles`` (DDSketch, approximate): EXACT over an
    UNBOUNDED integer domain, at the price of O(log_nbins(domain)) corpus
    scans (2-3 passes for cent prices, <= 6 for a full 64-bit domain) —
    the quantiles SHARE each read pass (one pass histograms every live
    unit), so p25/p50/p90 cost the same scans as the median alone.
    Driver state is groups x quantiles x nbins counts per pass; nothing
    corpus-sized ever moves — per-block partials through the combiner
    tree.  Quantile rule matches DuckDB ``quantile_disc``: the k-th
    smallest with k = ceil(n*q).  Bounded output (one row per priority).
    """
    from ..stages.aggregate import exact_grouped_quantiles

    def load():
        return read_table(sf_dir, "orders",
                          columns=["o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"grp": b["o_orderpriority"],
                         "val": _cents(b["o_totalprice"])})

    prios, res = exact_grouped_quantiles(load, prep, qs, nbins=nbins,
                                         max_passes=max_passes, fanin=fanin)
    return pa.table({
        "o_orderpriority": pa.array([str(p) for p in prios],
                                    type=pa.string()),
        **{_q_col(q): pa.array(res[:, qi]) for qi, q in enumerate(qs)},
    }).sort_by("o_orderpriority")            # bounded output — sort is fine


Q_MEDIAN_PRICE_SQL = """
SELECT o_orderpriority,
       CAST(quantile_disc(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.25)
            AS BIGINT) AS p25_cents,
       CAST(quantile_disc(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.5)
            AS BIGINT) AS median_cents,
       CAST(quantile_disc(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.9)
            AS BIGINT) AS p90_cents
FROM orders
GROUP BY o_orderpriority
"""


# --- UNPIVOT (wide -> long, the inverse of q_pivot_lang_source) -------------

UNPIVOT_MEASURES = [("quantity", "l_quantity"),
                    ("extendedprice", "l_extendedprice"),
                    ("discount", "l_discount"),
                    ("tax", "l_tax")]


def q_unpivot_lineitem(sf_dir: str):
    """(l_orderkey, l_linenumber, measure, value_x100) — UNPIVOT of the four
    lineitem measure columns into long form (one output row per input row
    per measure).  Embarrassingly parallel: each block expands 4x in place
    via broadcasted-take label columns — zero shuffle, corpus-proportional
    output, sortless.  Values in integer hundredths (``round(x*100)``) so
    both engines compare exactly.
    """
    import numpy as np

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber"] +
                            [c for _, c in UNPIVOT_MEASURES])

    def unpivot(b: pa.Table) -> pa.Table:
        zeros = pa.array(np.zeros(b.num_rows, dtype=np.int64))
        parts = []
        for name, col in UNPIVOT_MEASURES:
            parts.append(pa.table({
                "l_orderkey": b["l_orderkey"],
                "l_linenumber": pc.cast(b["l_linenumber"], pa.int64()),
                "measure": pa.array([name], type=pa.string()).take(zeros),
                "value_x100": _cents(b[col]),
            }))
        return pa.concat_tables(parts)

    return ds.map_batches(unpivot, batch_format="pyarrow", batch_size=None)


Q_UNPIVOT_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, m.measure,
       CAST(ROUND(CASE m.measure
                  WHEN 'quantity'      THEN l_quantity
                  WHEN 'extendedprice' THEN l_extendedprice
                  WHEN 'discount'      THEN l_discount
                  ELSE l_tax END * 100) AS BIGINT) AS value_x100
FROM lineitem
CROSS JOIN (VALUES ('quantity'), ('extendedprice'), ('discount'), ('tax'))
           AS m(measure)
"""


# --- grouped filter (HAVING) ------------------------------------------------

def q_having_active_customers(sf_dir: str):
    """Customers with >= 15 orders (post-aggregation filter = HAVING)."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey"])
    counts = count_by(ds, "o_custkey", count_name="n_orders")

    def having(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["n_orders"], 15))

    return counts.map_batches(having, batch_format="pyarrow",
                              batch_size=None)


Q_HAVING_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
ORDER BY o_custkey
"""


# --- scalar-subquery pattern ------------------------------------------------

def q_above_average_orders(sf_dir: str):
    """Count orders above the global average total price per status.

    The scalar (global average) is computed first and broadcast into the
    filter — the distributed form of a scalar subquery.  Counts only, so
    float averaging differences cannot surface in the output."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    avg = pc.mean(t["o_totalprice"]).as_py()
    ds = read_table(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])

    def above(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["o_totalprice"], avg)).select(["o_orderstatus"])

    return count_by(ds.map_batches(above, batch_format="pyarrow", batch_size=None),
                    "o_orderstatus", count_name="n_above",
                    final_partitions=1).sort("o_orderstatus")


Q_ABOVE_AVG_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_above
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""



def q_orders_running_total(sf_dir: str, *, num_partitions: int | None = None):
    """(o_custkey, o_orderkey, o_orderdate, price_cents, running_cents) —
    per-customer running revenue in order-date order (the SQL
    ``SUM() OVER (PARTITION BY ... ORDER BY ...)`` cumulative window,
    which Ray Data has no native operator for).

    Scale shape: ONE hash exchange by customer co-locates each key's rows;
    the cumulative sum is a lexsort + segment-base subtraction per
    partition (no per-group loop, no global sort — the final presentation
    sort is over the already-computed result).  Cents stay integer for
    cross-engine parity.
    """
    import numpy as np

    from ..stages.shuffle import hash_partition, input_size_bytes
    from .streaming import auto_shard_count

    if num_partitions is None:
        num_partitions = auto_shard_count(
            input_size_bytes(f"{sf_dir}/orders.parquet"))
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey",
                                               "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({"o_custkey": b["o_custkey"],
                         "o_orderkey": b["o_orderkey"],
                         "o_orderdate": b["o_orderdate"],
                         "price_cents": cents})

    def running(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("running_cents",
                                   pa.array([], type=pa.int64()))
        cust = np.asarray(b["o_custkey"], dtype=np.int64)
        okey = np.asarray(b["o_orderkey"], dtype=np.int64)
        date = b["o_orderdate"].to_numpy(zero_copy_only=False)
        cents = np.asarray(b["price_cents"], dtype=np.int64)
        order = np.lexsort((okey, date, cust))
        c, p = cust[order], cents[order]
        cum = np.cumsum(p)
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(first)
        seg_len = np.diff(np.append(starts, len(c)))
        excl_base = np.repeat(cum[starts] - p[starts], seg_len)
        out = b.take(pa.array(order, type=pa.int64()))
        return out.append_column("running_cents", pa.array(cum - excl_base))

    part = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    return hash_partition(part, ["o_custkey"], num_partitions).map_batches(
        running, batch_format="pyarrow", batch_size=None)


Q_ORDERS_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS BIGINT)
         AS running_cents
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def q3_urgent_revenue(sf_dir: str):
    """(c_mktsegment, revenue_cents, n_lines) — TPC-H Q3-shaped three-way
    join: discounted revenue of '1-URGENT' orders per customer market
    segment.  Plan: the fact table hash-joins the FILTERED orders (the
    predicate is pushed below the exchange, so only urgent order keys
    shuffle), then the customer segment map rides a broadcast join —
    lineitem itself crosses exactly one exchange.
    """
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderpriority"])

    def urgent(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
        return b.select(["o_orderkey", "o_custkey"])

    urgent_orders = orders.map_batches(urgent, batch_format="pyarrow",
                                       batch_size=None)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prep_li(b: pa.Table) -> pa.Table:
        disc = pc.multiply(b["l_extendedprice"],
                           pc.subtract(1.0, b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "disc_cents": _cents(disc, 10000)})

    li = li.map_batches(prep_li, batch_format="pyarrow", batch_size=None)
    from ..stages.join import auto_join_partitions

    joined = hash_join(li, urgent_orders, on="l_orderkey",
                       right_on="o_orderkey",
                       num_partitions=auto_join_partitions(
                           f"{sf_dir}/orders.parquet",
                           f"{sf_dir}/lineitem.parquet"))
    cust = _read_small(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    enriched = broadcast_join(joined, cust, "o_custkey", "c_custkey",
                              columns=["c_mktsegment"])
    out = grouped_agg(enriched, ["c_mktsegment"],
                      {"revenue_cents": "disc_cents"},
                      count_name="n_lines", final_partitions=1)
    return out.sort("c_mktsegment")


Q3_URGENT_REVENUE_SQL = """
SELECT c_mktsegment,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- correlated-subquery shape (above own-group average) ---------------------

def q_above_avg_orders(sf_dir: str, *, num_partitions: int | None = None):
    """(c_custkey, n_orders, n_above_avg) — per customer, how many of their
    orders exceed their own average order value: the correlated-subquery
    shape (WHERE price > (SELECT AVG(...) correlated)) re-expressed as a
    self-aggregate + one co-located comparison pass.

    Exactness trick: ``price > avg`` is compared as integer cross-
    multiplication ``price_cents * n > sum_cents`` — no float division, so
    both engines agree bit-for-bit.  Scale shape: compact (custkey,
    price_cents) rows cross ONE hash exchange; each partition holds whole
    customers, so per-customer sums and the comparison are one lexsort +
    segment reduce — the corpus never passes twice and nothing joins back.
    """
    from ..stages.shuffle import hash_partition, input_size_bytes, resolve_mode
    from .streaming import auto_shard_count

    path = f"{sf_dir}/orders.parquet"
    if num_partitions is None:
        num_partitions = auto_shard_count(input_size_bytes(path))
    mode = resolve_mode("auto", path)
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": b["o_custkey"],
                         "price_cents": _cents(b["o_totalprice"])})

    rows = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    part = (hash_partition(rows, ["c_custkey"], num_partitions)
            if mode == "shuffle" else rows.repartition(1))
    return part.map_batches(above_avg_kernel, batch_format="pyarrow",
                            batch_size=None)


def above_avg_kernel(b: pa.Table) -> pa.Table:
    """Per-partition above-own-average census over (c_custkey, price_cents)
    rows; assumes whole customers are co-located.  Module-level so
    hypothesis drives it directly against a serial oracle."""
    import numpy as np

    from .. import tune_worker_threads

    tune_worker_threads()
    if b.num_rows == 0:
        return pa.table({k: pa.array([], type=pa.int64())
                         for k in ("c_custkey", "n_orders", "n_above_avg")})
    c = np.asarray(b["c_custkey"], dtype=np.int64)
    p = np.asarray(b["price_cents"], dtype=np.int64)
    order = np.argsort(c, kind="stable")
    c, p = c[order], p[order]
    starts = np.nonzero(np.concatenate(([True], c[1:] != c[:-1])))[0]
    n = np.diff(np.append(starts, len(c)))
    tot = np.add.reduceat(p, starts)
    above = p * np.repeat(n, n) > np.repeat(tot, n)
    n_above = np.add.reduceat(above.astype(np.int64), starts)
    return pa.table({"c_custkey": pa.array(c[starts]),
                     "n_orders": pa.array(n.astype(np.int64)),
                     "n_above_avg": pa.array(n_above)})


Q_ABOVE_AVG_ORDERS_SQL = """
WITH o AS (SELECT o_custkey AS c_custkey,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
           FROM orders),
w AS (SELECT c_custkey, price_cents,
             COUNT(*) OVER (PARTITION BY c_custkey) AS n,
             SUM(price_cents) OVER (PARTITION BY c_custkey) AS tot
      FROM o)
SELECT c_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN price_cents * n > tot THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above_avg
FROM w
GROUP BY c_custkey
ORDER BY c_custkey
"""


# --- pivot (long -> wide conditional aggregation) ----------------------------

PIVOT_SOURCES = [f"src{i}" for i in range(20)]


def q_pivot_lang_source(sf_dir: str):
    """(lang, src0..src19) — document counts pivoted source-wise into wide
    columns (the long->wide conditional-aggregation shape; fixed, known
    column domain as SQL PIVOT requires).

    Scale shape: per-block (lang, source) count partials -> combiner tree
    (bounded key set: langs x sources) -> the pivot itself runs on the
    tiny merged table in one final task via a searchsorted scatter.
    """
    import numpy as np

    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "documents", columns=["lang", "source"])

    def hist(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "source", "cnt"])

    partial = ds.map_batches(hist, batch_format="pyarrow", batch_size=None)
    merged = tree_merge(partial, ["lang", "source"], [("cnt", "sum")], fanin=8)

    def pivot(b: pa.Table) -> pa.Table:
        cols = {"lang": pa.array([], type=pa.string())}
        cols.update({s: pa.array([], type=pa.int64()) for s in PIVOT_SOURCES})
        if b.num_rows == 0:
            return pa.table(cols)
        langs = np.asarray(b["lang"].to_pylist(), dtype=object)
        srcs = np.asarray(b["source"].to_pylist(), dtype=object)
        cnt = np.asarray(b["cnt"], dtype=np.int64)
        ulang = np.unique(langs)
        wide = np.zeros((len(ulang), len(PIVOT_SOURCES)), dtype=np.int64)
        li = np.searchsorted(ulang, langs)
        src_idx = {s: j for j, s in enumerate(PIVOT_SOURCES)}
        # out-of-domain sources contribute 0 to every pivot column but the
        # lang row survives (matching the oracle's CASE WHEN semantics,
        # which never crashes on unknown values)
        sj = np.array([src_idx.get(s, -1) for s in srcs], dtype=np.int64)
        known = sj >= 0
        np.add.at(wide, (li[known], sj[known]), cnt[known])  # keys unique
        out = {"lang": pa.array([str(x) for x in ulang], type=pa.string())}
        out.update({s: pa.array(wide[:, j], type=pa.int64())
                    for j, s in enumerate(PIVOT_SOURCES)})
        return pa.table(out)

    return merged.map_batches(pivot, batch_format="pyarrow",
                              batch_size=None).sort("lang")


Q_PIVOT_LANG_SOURCE_SQL = "SELECT lang,\n" + ",\n".join(
    f"       CAST(SUM(CASE WHEN source = '{s}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS {s}" for s in PIVOT_SOURCES
) + "\nFROM documents GROUP BY lang ORDER BY lang"


# --- ROLLUP (hierarchical subtotals) ----------------------------------------

def q_rollup_pricing(sf_dir: str):
    """(l_returnflag, l_linestatus, sum_qty, sum_disc_cents) with ROLLUP
    subtotal rows — per-flag subtotals and the grand total marked 'ALL'
    (COALESCE'd in the oracle so both engines emit the same marker).

    Scale shape: the corpus collapses ONCE to the finest-grain partial
    (per-block group_by + combiner merge, bounded key set); every coarser
    rollup level is derived from the tiny merged table inside one final
    task — never a second corpus pass per level.
    """
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        disc = pc.multiply(b["l_extendedprice"],
                           pc.subtract(1.0, b["l_discount"]))
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty": pc.cast(b["l_quantity"], pa.int64()),
            "disc_cents": _cents(disc, 10000),
        })

    fine = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": "qty", "sum_disc_cents": "disc_cents"},
        final_partitions=1)

    def rollup(b: pa.Table) -> pa.Table:
        cols = ["l_returnflag", "l_linestatus", "sum_qty", "sum_disc_cents"]
        if b.num_rows == 0:
            return b.select(cols)
        aggs = [("sum_qty", "sum"), ("sum_disc_cents", "sum")]
        by_flag = (b.group_by(["l_returnflag"]).aggregate(aggs)
                   .rename_columns(["l_returnflag", "sum_qty",
                                    "sum_disc_cents"]))
        by_flag = by_flag.add_column(
            1, "l_linestatus",
            pa.array(["ALL"] * by_flag.num_rows, type=pa.string()))
        total = pa.table({
            "l_returnflag": pa.array(["ALL"], type=pa.string()),
            "l_linestatus": pa.array(["ALL"], type=pa.string()),
            "sum_qty": pa.array([pc.sum(b["sum_qty"]).as_py()],
                                type=pa.int64()),
            "sum_disc_cents": pa.array([pc.sum(b["sum_disc_cents"]).as_py()],
                                       type=pa.int64()),
        })
        return pa.concat_tables([b.select(cols), by_flag.select(cols),
                                 total.select(cols)])

    return (fine.map_batches(rollup, batch_format="pyarrow", batch_size=None)
            .sort(["l_returnflag", "l_linestatus"]))


def q_cube_pricing(sf_dir: str):
    """GROUP BY CUBE re-expression: all four grouping levels (flag x
    status, flag, status, grand total) derived from the SAME finest-grain
    merged partial inside one final task — the corpus collapses exactly
    once regardless of how many cube levels exist (2^n levels cost 2^n
    tiny group_bys over a bounded table, never 2^n corpus passes)."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty": pc.cast(b["l_quantity"], pa.int64()),
        })

    fine = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["l_returnflag", "l_linestatus"], {"sum_qty": "qty"},
        final_partitions=1)

    def cube(b: pa.Table) -> pa.Table:
        cols = ["l_returnflag", "l_linestatus", "sum_qty"]
        if b.num_rows == 0:
            return b.select(cols)
        out = [b.select(cols)]
        n_all = pa.array(["ALL"], type=pa.string())
        for keep in (["l_returnflag"], ["l_linestatus"]):
            g = (b.group_by(keep).aggregate([("sum_qty", "sum")])
                 .rename_columns(keep + ["sum_qty"]))
            marker = pa.array(["ALL"] * g.num_rows, type=pa.string())
            missing = "l_linestatus" if keep == ["l_returnflag"] else "l_returnflag"
            g = g.append_column(missing, marker)
            out.append(g.select(cols))
        out.append(pa.table({
            "l_returnflag": n_all, "l_linestatus": n_all,
            "sum_qty": pa.array([pc.sum(b["sum_qty"]).as_py()], pa.int64()),
        }))
        return pa.concat_tables(out)

    return (fine.map_batches(cube, batch_format="pyarrow", batch_size=None)
            .sort(["l_returnflag", "l_linestatus"]))


Q_CUBE_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def q_grouping_sets_pricing(sf_dir: str):
    """GROUPING SETS re-expression — the general form next to ROLLUP and
    CUBE: explicit NON-hierarchical sets ((flag, status), (flag,
    ship_year), ()) that neither of the other two produces.

    Scale shape (shared with rollup/cube): the corpus collapses ONCE to
    the finest grain the union of all sets needs (flag x status x year,
    bounded), and every requested set is derived from that tiny merged
    table inside one final task — k sets cost k group_bys over a bounded
    table, never k corpus passes.
    """
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_shipdate",
                             "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "ship_year": pc.cast(pc.year(b["l_shipdate"]), pa.string()),
            "qty": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
        })

    fine = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["l_returnflag", "l_linestatus", "ship_year"], {"sum_qty": "qty"},
        final_partitions=1)

    cols = ["l_returnflag", "l_linestatus", "ship_year", "sum_qty"]
    sets = [["l_returnflag", "l_linestatus"], ["l_returnflag", "ship_year"],
            []]

    def grouping_sets(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select(cols)
        out = []
        for keep in sets:
            if keep:
                g = (b.group_by(keep).aggregate([("sum_qty", "sum")])
                     .rename_columns(keep + ["sum_qty"]))
            else:
                g = pa.table({"sum_qty": pa.array(
                    [pc.sum(b["sum_qty"]).as_py()], pa.int64())})
            for missing in ("l_returnflag", "l_linestatus", "ship_year"):
                if missing not in keep:
                    g = g.append_column(
                        missing, pa.array(["ALL"] * g.num_rows, pa.string()))
            out.append(g.select(cols))
        return pa.concat_tables(out)

    return (fine.map_batches(grouping_sets, batch_format="pyarrow",
                             batch_size=None)
            .sort(["l_returnflag", "l_linestatus", "ship_year"]))


Q_GROUPING_SETS_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       COALESCE(CAST(ship_year AS VARCHAR), 'ALL') AS ship_year,
       CAST(SUM(qty) AS BIGINT) AS sum_qty
FROM (SELECT l_returnflag, l_linestatus,
             year(l_shipdate) AS ship_year,
             CAST(ROUND(l_quantity) AS BIGINT) AS qty
      FROM lineitem)
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag, ship_year), ())
ORDER BY l_returnflag, l_linestatus, ship_year
"""


def q_moving_avg_orders(sf_dir: str, *, num_partitions: int | None = None):
    """(o_custkey, o_orderkey, ma3_cents) — frame-based window: per
    customer, the moving average of the current + 2 preceding orders by
    date (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), integer floor-division
    so both engines agree exactly.

    One customer-keyed exchange; per partition one lexsort + a cumsum
    difference gives every frame sum without a per-row loop.
    """
    import numpy as np

    from ..stages.join import auto_join_partitions
    from ..stages.shuffle import hash_partition

    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/orders.parquet")
    ds = read_table(sf_dir, "orders",
                    columns=["o_custkey", "o_orderkey", "o_orderdate",
                             "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"], "o_orderkey": b["o_orderkey"],
            "date_us": b["o_orderdate"].cast(pa.int64()) if not isinstance(
                b["o_orderdate"], pa.ChunkedArray)
            else b["o_orderdate"].combine_chunks().cast(pa.int64()),
            "price_cents": _cents(b["o_totalprice"]),
        })

    def ma(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "o_orderkey": pa.array([], pa.int64()),
                             "ma3_cents": pa.array([], pa.int64())})
        c = np.asarray(b["o_custkey"], dtype=np.int64)
        k = np.asarray(b["o_orderkey"], dtype=np.int64)
        d = np.asarray(b["date_us"], dtype=np.int64)
        p = np.asarray(b["price_cents"], dtype=np.int64)
        order = np.lexsort((k, d, c))
        cs, ks, ps = c[order], k[order], p[order]
        starts = np.ones(len(cs), dtype=bool)
        starts[1:] = cs[1:] != cs[:-1]
        seg_start = np.nonzero(starts)[0]
        pos = np.arange(len(cs)) - seg_start[np.cumsum(starts) - 1]
        cum = np.cumsum(ps)
        # exclusive prefix at frame start, segment-clamped to 3 rows
        frame_len = np.minimum(pos + 1, 3)
        frame_start = np.arange(len(cs)) - frame_len + 1
        base = np.where(frame_start > 0, cum[np.maximum(frame_start - 1, 0)], 0)
        frame_sum = cum - base
        return pa.table({
            "o_custkey": pa.array(cs), "o_orderkey": pa.array(ks),
            "ma3_cents": pa.array(frame_sum // frame_len),
        })

    rows = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    return hash_partition(rows, ["o_custkey"], num_partitions).map_batches(
        ma, batch_format="pyarrow", batch_size=None)


Q_MOVING_AVG_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            OVER w // COUNT(*) OVER w AS BIGINT) AS ma3_cents
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


Q_ROLLUP_PRICING_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                AS BIGINT)) AS BIGINT) AS sum_disc_cents
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


# --- full-outer join (both-side null alignment) -----------------------------

# value threshold chosen so both sides have members the other lacks at the
# test scales (sf0.001: 7 vs 7 users, 5 common; sf0.01: 75 vs 67, 31 common)
FULL_OUTER_VALUE_THR = 150.0


def q_full_outer_join(sf_dir: str, *, num_partitions: int | None = None):
    """(user_id, n_clicks, n_purchases) — FULL OUTER join of two per-user
    activity aggregates (high-value clicks vs high-value purchases), the
    one outer-join polarity not yet covered next to hash/broadcast/semi/
    anti/as-of/range.

    Scale shape: each side first collapses to ONE compact row per user
    (per-block partials + combiner merge — corpus rows never reach the
    join), then Ray Data's native hash-partitioned ``full_outer`` join
    aligns the two key sets; unmatched rows surface as nulls and are
    coalesced vectorized.  The join input is aggregate-sized, so the
    exchange moves O(distinct users), not O(events).
    """
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.and_(
            pc.is_in(b["event_type"],
                     value_set=pa.array(["click", "purchase"])),
            pc.greater(b["value"], FULL_OUTER_VALUE_THR)))
        return keep.select(["user_id", "event_type"])

    rows = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)
    # ONE corpus scan: both join sides branch off the same materialized
    # compact aggregate (branching an unmaterialized lineage re-executes
    # the whole read per consumer)
    agg = count_by(rows, ["user_id", "event_type"], count_name="n").materialize()

    def side(event_type: str, out_name: str):
        def pick(b: pa.Table) -> pa.Table:
            keep = b.filter(pc.equal(b["event_type"], event_type))
            return pa.table({"user_id": keep["user_id"],
                             out_name: keep["n"]})

        return agg.map_batches(pick, batch_format="pyarrow", batch_size=None)

    clicks = side("click", "n_clicks")
    purch = side("purchase", "n_purchases")
    if num_partitions is None:
        # the join inputs are per-user aggregates — smaller than events but
        # still corpus-proportional (distinct users), so the partition count
        # must track input size, not sit at a constant
        from ..stages.join import auto_join_partitions

        num_partitions = auto_join_partitions(f"{sf_dir}/events.parquet")
    # Ray's full-outer join coalesces the key column itself: right-only
    # rows arrive with user_id already filled, only the counts are null
    joined = hash_join(clicks, purch, on="user_id",
                       join_type="full_outer", num_partitions=num_partitions)

    def finalize(b: pa.Table) -> pa.Table:
        zero = pa.scalar(0, pa.int64())
        return pa.table({
            "user_id": b["user_id"],
            "n_clicks": pc.coalesce(b["n_clicks"], zero),
            "n_purchases": pc.coalesce(b["n_purchases"], zero),
        })

    return joined.map_batches(finalize, batch_format="pyarrow",
                              batch_size=None)


Q_FULL_OUTER_JOIN_SQL = f"""
WITH c AS (SELECT user_id, COUNT(*) AS n_clicks FROM events
           WHERE event_type = 'click' AND value > {FULL_OUTER_VALUE_THR}
           GROUP BY user_id),
     p AS (SELECT user_id, COUNT(*) AS n_purchases FROM events
           WHERE event_type = 'purchase' AND value > {FULL_OUTER_VALUE_THR}
           GROUP BY user_id)
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       COALESCE(c.n_clicks, 0) AS n_clicks,
       COALESCE(p.n_purchases, 0) AS n_purchases
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
ORDER BY user_id
"""


# --- TPC-H Q5 shape: fact-fact join chain with dims broadcast ---------------

def q_3way_revenue(sf_dir: str):
    """(r_name, revenue_x10k, n_lines) — per-region discounted revenue for
    1995 orders: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region (the
    TPC-H Q5 join chain; reference has no joins — this is the relational
    capability the engine adds on top of it).

    Scale shape: the two small dims (nation ⋈ region, ≤ 25 rows) join
    driver-side and ride every customer block as a broadcast; customer
    collapses to a (c_custkey, r_name) map.  The two FACT joins are
    hash-partitioned exchanges with size-derived partition counts, and the
    date predicate on orders is applied BELOW its exchange so only the
    matching year's orders shuffle.  After the joins each block reduces to
    bounded (r_name, revenue, count) partials through the combiner tree —
    nothing corpus-sized funnels through the driver.
    """
    from ..stages.join import auto_join_partitions

    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read_small(sf_dir, "region", ["r_regionkey", "r_name"])
    dim = nation.join(region, keys=["n_regionkey"], right_keys=["r_regionkey"])

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = broadcast_join(cust, dim, "c_nationkey", "n_nationkey",
                          columns=["r_name"]).select_columns(
                              ["c_custkey", "r_name"])

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_orders(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["o_orderdate"], _ts(1995, 1, 1)),
                       pc.less(b["o_orderdate"], _ts(1996, 1, 1)))
        b = b.filter(keep)
        return b.select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(prep_orders, batch_format="pyarrow",
                                batch_size=None)
    n_oc = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                f"{sf_dir}/customer.parquet")
    o_region = hash_join(orders, cust, on="o_custkey", right_on="c_custkey",
                         num_partitions=n_oc).select_columns(
                             ["o_orderkey", "r_name"])

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prep_li(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(1.0, b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "rev": _cents(rev, 10000)})

    li = li.map_batches(prep_li, batch_format="pyarrow", batch_size=None)
    n_ol = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                f"{sf_dir}/lineitem.parquet")
    joined = hash_join(o_region, li, on="o_orderkey", right_on="l_orderkey",
                       num_partitions=n_ol)
    out = grouped_agg(joined, ["r_name"], {"revenue_x10k": "rev"},
                      count_name="n_lines", final_partitions=1)
    return out.sort("r_name")


Q_3WAY_REVENUE_SQL = """
SELECT r_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                AS BIGINT)) AS BIGINT) AS revenue_x10k,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
GROUP BY r_name
ORDER BY r_name
"""


# --- ordered string aggregation (LISTAGG) ------------------------------------

STRING_AGG_K = 5


def q_string_agg(sf_dir: str):
    """(o_orderpriority, top_keys) — the ``STRING_AGG`` / LISTAGG surface:
    per priority, the keys of its 5 highest-value orders joined ','-ordered
    by rank (ties to the smaller key).

    Scale shape: per-block top-5 per priority (≤ 25 compact rows leave each
    block), candidates collapse to one tiny block for the final pick; the
    string build touches only priorities × 5 rows.  The corpus never
    shuffles and no global sort runs — a LISTAGG over raw corpus-sized
    groups would be an anti-pattern (unbounded strings), so the operator is
    deliberately the bounded-top-k form.
    """
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "o_orderkey": pa.array([], pa.int64()),
                             "price_x100": pa.array([], pa.int64())})
        if "price_x100" not in b.column_names:
            b = pa.table({"o_orderpriority": b["o_orderpriority"],
                          "o_orderkey": b["o_orderkey"],
                          "price_x100": _cents(b["o_totalprice"])})
        import numpy as np

        pri = b["o_orderpriority"].combine_chunks().dictionary_encode()
        codes = np.asarray(pri.indices, dtype=np.int64)
        key = np.asarray(b["o_orderkey"], dtype=np.int64)
        price = np.asarray(b["price_x100"], dtype=np.int64)
        order = np.lexsort((key, -price, codes))
        c_sorted = codes[order]
        new_grp = np.concatenate([[True], c_sorted[1:] != c_sorted[:-1]])
        grp_start = np.maximum.accumulate(
            np.where(new_grp, np.arange(len(order)), 0))
        rank = np.arange(len(order)) - grp_start
        return b.take(pa.array(order[rank < STRING_AGG_K]))

    cand = ds.map_batches(local_top, batch_format="pyarrow", batch_size=None)
    final = cand.repartition(1).map_batches(local_top, batch_format="pyarrow",
                                            batch_size=None)

    def build(b: pa.Table) -> pa.Table:
        import numpy as np

        # bounded input (priorities x 5): assemble rank-ordered strings
        pri = b["o_orderpriority"].to_pylist()
        key = np.asarray(b["o_orderkey"], dtype=np.int64)
        price = np.asarray(b["price_x100"], dtype=np.int64)
        order = np.lexsort((key, -price,
                            np.asarray(pa.array(pri).dictionary_encode()
                                       .indices, dtype=np.int64)))
        out: dict[str, list[str]] = {}
        for i in order:
            out.setdefault(pri[i], []).append(str(key[i]))
        pris = sorted(out)
        return pa.table({"o_orderpriority": pa.array(pris, pa.string()),
                         "top_keys": pa.array([",".join(out[p]) for p in pris],
                                              pa.string())})

    return final.map_batches(build, batch_format="pyarrow", batch_size=None)


Q_STRING_AGG_SQL = f"""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                     DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_orderpriority,
       STRING_AGG(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top_keys
FROM ranked
WHERE rn <= {STRING_AGG_K}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- correlated EXISTS / NOT EXISTS ----------------------------------------

def q_exists_urgent_clean(sf_dir: str, *, mode: str = "tree",
                          final_partitions: int | None = None):
    """Customers with at least one URGENT-priority order and no
    'F'-status order — the EXISTS + NOT EXISTS correlated-subquery shape
    (decorrelated into one grouped flag-aggregation over the fact table).

    Scale shape: one pass over ``orders`` emitting two 0/1 flags, a
    grouped sum per customer (tree combiner at toy scale, hash shuffle
    beyond — ``mode``), then a streamed post-filter.  The ``customer``
    membership semi-join is a broadcast set (dimension table).  Output is
    per-customer → no trailing sort (the gate is order-insensitive).
    """
    ds = read_table(sf_dir, "orders",
                    columns=["o_custkey", "o_orderpriority", "o_orderstatus"])

    def flags(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "is_urgent": pc.cast(pc.equal(b["o_orderpriority"], "1-URGENT"),
                                 pa.int64()),
            "is_f": pc.cast(pc.equal(b["o_orderstatus"], "F"), pa.int64()),
        })

    agg = grouped_agg(ds.map_batches(flags, batch_format="pyarrow",
                                     batch_size=None),
                      "o_custkey", {"n_urgent": "is_urgent", "n_f": "is_f"},
                      mode=mode, final_partitions=final_partitions)
    cust_keys = _read_small(sf_dir, "customer", ["c_custkey"])["c_custkey"]

    def pick(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(b["n_urgent"], 0), pc.equal(b["n_f"], 0))
        b = b.filter(keep)
        b = b.filter(pc.is_in(b["o_custkey"], value_set=cust_keys.combine_chunks()))
        return pa.table({"c_custkey": b["o_custkey"]})

    return agg.map_batches(pick, batch_format="pyarrow", batch_size=None)


Q_EXISTS_URGENT_CLEAN_SQL = """
SELECT c.c_custkey
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
ORDER BY c.c_custkey
"""


# --- TPC-H Q17 shape: correlated aggregate subquery as a self-join ---------

def q17_small_quantity_revenue(sf_dir: str):
    """Count + revenue of lineitems whose quantity is below 20% of the
    per-part average quantity (TPC-H Q17's correlated AVG subquery,
    decorrelated into a grouped-sum + join against the same fact table).

    The float predicate ``qty < 0.2 * AVG(qty)`` is restated exactly in
    integers: ``5 * qty * cnt < sum_qty`` (quantities are integral), so
    both engines evaluate the same arithmetic.  Revenue is integer cents.

    Scale shape: pass 1 is a per-part grouped sum (bounded by the part
    dimension — ``part`` is a dimension table at every TPC-H scale, so
    the per-part thresholds broadcast); pass 2 streams lineitem once
    against the broadcast map.  Output is one row.
    """
    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"l_partkey": b["l_partkey"],
                         "qty": pc.cast(b["l_quantity"], pa.int64())})

    per_part = pa.concat_tables(list(grouped_agg(
        li.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "l_partkey", {"sum_qty": "qty"}, count_name="cnt",
    ).iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"l_partkey": pa.array([], type=pa.int64()),
                   "sum_qty": pa.array([], type=pa.int64()),
                   "cnt": pa.array([], type=pa.int64())})]).combine_chunks()

    def small_qty(b: pa.Table) -> pa.Table:
        b = pa.table({"l_partkey": b["l_partkey"],
                      "qty": pc.cast(b["l_quantity"], pa.int64()),
                      "price_cents": _cents(b["l_extendedprice"])})
        return b

    scored = broadcast_join(
        li.map_batches(small_qty, batch_format="pyarrow", batch_size=None),
        per_part, "l_partkey")

    def partial(b: pa.Table) -> pa.Table:
        # 5 * qty * cnt < sum_qty  <=>  qty < 0.2 * avg(qty) exactly
        lhs = pc.multiply(pc.multiply(b["qty"], pa.scalar(5, pa.int64())),
                          b["cnt"])
        b = b.filter(pc.less(lhs, b["sum_qty"]))
        return pa.table({
            "n_small": pa.array([b.num_rows], type=pa.int64()),
            "revenue_cents": pa.array(
                [pc.sum(b["price_cents"]).as_py() or 0], type=pa.int64()),
        })

    parts = scored.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def total(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_small": pa.array([pc.sum(b["n_small"]).as_py() or 0],
                                type=pa.int64()),
            "revenue_cents": pa.array([pc.sum(b["revenue_cents"]).as_py() or 0],
                                      type=pa.int64()),
        })

    return parts.repartition(1).map_batches(total, batch_format="pyarrow",
                                            batch_size=None)


Q17_SMALL_QTY_SQL = """
WITH s AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT COUNT(*) AS n_small,
       CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)), 0)
            AS BIGINT) AS revenue_cents
FROM lineitem l JOIN s ON l.l_partkey = s.l_partkey
WHERE 5 * CAST(ROUND(l.l_quantity) AS BIGINT) * s.cnt < s.sum_qty
"""


# --- RANGE-frame window: value-based sliding aggregate ----------------------

RANGE_WINDOW_DAYS = 30


def q_range_window_revenue(sf_dir: str, *, window_days: int = RANGE_WINDOW_DAYS,
                           num_partitions: int = 8, mode: str = "auto"):
    """(o_orderkey, o_custkey, rev30_cents) — the RANGE (value-based)
    window frame next to ``q_moving_avg_orders``' ROWS frame: per
    customer, total order revenue within the trailing ``window_days``-day
    interval INCLUDING the current row's date peers (SQL RANGE semantics:
    equal-date orders share one frame, so ties need no ordering rule).

    Scale shape: one custkey-keyed hash exchange (size-gated to a single
    block below the threshold); inside each partition ONE lexsort by
    (cust, day) + a global prefix sum, with both frame edges found by TWO
    vectorized ``searchsorted`` calls over composite ``cust * 2^22 + day``
    keys — no per-customer Python loop.  Output is corpus-∝ and sortless.
    """
    import functools

    from ..stages.shuffle import hash_partition, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/orders.parquet")
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey", "o_orderdate",
                             "o_totalprice"])
    part = (hash_partition(ds, ["o_custkey"], num_partitions)
            if mode == "shuffle" else ds.repartition(1))
    kernel = functools.partial(range_window_kernel, window_days=window_days)
    # no trailing sort: one row per order — the gate compares
    # order-insensitively, a global sort would be an all-to-all for nothing
    return part.map_batches(kernel, batch_format="pyarrow", batch_size=None)


def range_window_kernel(b: pa.Table, window_days: int) -> pa.Table:
    """Per-partition trailing-RANGE revenue kernel over co-located
    (orderkey, custkey, date, price) rows, date peers included.
    Module-level so hypothesis can drive it against a brute-force oracle."""
    import numpy as np

    from .. import tune_worker_threads

    tune_worker_threads()
    day_shift = np.int64(1) << 22  # day index must stay below this
    if b.num_rows == 0:
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "o_custkey": pa.array([], pa.int64()),
                         "rev30_cents": pa.array([], pa.int64())})
    ok = np.asarray(b["o_orderkey"], dtype=np.int64)
    cust = np.asarray(b["o_custkey"], dtype=np.int64)
    ts = (b["o_orderdate"].combine_chunks()
          if isinstance(b["o_orderdate"], pa.ChunkedArray)
          else b["o_orderdate"]).cast(pa.int64()).to_numpy()
    day = ts // 86_400_000_000  # midnight-exact dates -> exact day index
    assert day.max() < day_shift and day.min() >= 0, "day index overflow"
    assert cust.max() < (np.int64(1) << 40), "custkey overflows key pack"
    cents = np.asarray(_cents(b["o_totalprice"]), dtype=np.int64)

    order = np.lexsort((day, cust))
    ok_s, cust_s, day_s, cents_s = (ok[order], cust[order], day[order],
                                    cents[order])
    key = cust_s * day_shift + day_s
    cum = np.concatenate([[0], np.cumsum(cents_s)])
    lo = np.searchsorted(key, cust_s * day_shift
                         + np.maximum(day_s - window_days, 0), "left")
    hi = np.searchsorted(key, key, "right")
    rev = cum[hi] - cum[lo]
    return pa.table({"o_orderkey": pa.array(ok_s),
                     "o_custkey": pa.array(cust_s),
                     "rev30_cents": pa.array(rev.astype(np.int64))})


Q_RANGE_WINDOW_SQL = f"""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL {RANGE_WINDOW_DAYS} DAY PRECEDING
               AND CURRENT ROW) AS BIGINT) AS rev30_cents
FROM orders
ORDER BY o_custkey, o_orderkey
"""


# --- TPC-H Q13 shape: two-level aggregation with a LEFT-JOIN zero bucket ----

def q13_custdist(sf_dir: str, *, num_partitions: int | None = None):
    """(c_count, custdist) — TPC-H Q13 customer distribution: how many
    customers placed exactly N orders, INCLUDING the zero-order customers
    the LEFT JOIN surfaces.

    Scale shape: orders collapse to one compact (custkey, count) row per
    customer (per-block pre-agg + size-gated tree/hash merge — order rows
    never reach the join), the pruned customer key column LEFT-joins that
    aggregate through Ray's hash-partitioned join (zero-order customers
    arrive as nulls -> c_count 0; orphan order custkeys drop, matching the
    SQL), and the final histogram is bounded by max-orders-per-customer
    through the combiner tree.  Every exchange moves key-∝ compact rows.
    """
    from ..stages.join import auto_join_partitions
    from ..stages.shuffle import resolve_mode

    orders = read_table(sf_dir, "orders", columns=["o_custkey"])
    mode = resolve_mode("auto", f"{sf_dir}/orders.parquet")
    per_cust = count_by(orders, ["o_custkey"], count_name="c_count", mode=mode)

    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/customer.parquet",
                                              f"{sf_dir}/orders.parquet")
    joined = hash_join(cust, per_cust, on="c_custkey", right_on="o_custkey",
                       join_type="left_outer", num_partitions=num_partitions)

    def zero(b: pa.Table) -> pa.Table:
        return pa.table({"c_count": pc.coalesce(b["c_count"],
                                                pa.scalar(0, pa.int64()))})

    counts = joined.map_batches(zero, batch_format="pyarrow", batch_size=None)
    hist = count_by(counts, ["c_count"], count_name="custdist")
    return hist.sort(["custdist", "c_count"], descending=[True, True])


Q13_CUSTDIST_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- TPC-H Q18 shape: HAVING-filtered fact self-aggregation join-back -------

Q18_QTY_THR = 250


def q18_large_orders(sf_dir: str, *, qty_thr: int = Q18_QTY_THR,
                     num_partitions: int | None = None):
    """(o_orderkey, o_custkey, totalprice_cents, sum_qty) — TPC-H Q18
    large-volume orders: orders whose total line quantity exceeds
    ``qty_thr``, top 100 by price (orderkey tiebreak makes LIMIT
    deterministic).

    Scale shape: lineitem collapses to one (orderkey, sum_qty) row per
    order (size-gated tree/hash merge), the HAVING filter cuts that to the
    hot tail BEFORE the join, and the orderkey-keyed hash join aligns it
    with the pruned orders columns — correct at any hot-set size, no
    driver materialization.  The top-100 runs through the per-block
    ``local_topk`` prefilter, so the global sort sees blocks x 100 rows.
    """
    from ..stages.aggregate import local_topk
    from ..stages.join import auto_join_partitions
    from ..stages.shuffle import resolve_mode

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "qty": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
        })

    mode = resolve_mode("auto", f"{sf_dir}/lineitem.parquet")
    sums = grouped_agg(li.map_batches(prep, batch_format="pyarrow",
                                      batch_size=None),
                       ["l_orderkey"], {"sum_qty": "qty"}, mode=mode)

    thr = pa.scalar(qty_thr, pa.int64())

    def having(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["sum_qty"], thr))

    hot = sums.map_batches(having, batch_format="pyarrow", batch_size=None)

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def money(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "totalprice_cents": _cents(b["o_totalprice"]),
        })

    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                              f"{sf_dir}/lineitem.parquet")
    joined = hash_join(
        orders.map_batches(money, batch_format="pyarrow", batch_size=None),
        hot, on="o_orderkey", right_on="l_orderkey",
        join_type="inner", num_partitions=num_partitions)
    joined = joined.select_columns(["o_orderkey", "o_custkey",
                                    "totalprice_cents", "sum_qty"])
    pruned = local_topk(joined, ["totalprice_cents", "o_orderkey"], 100,
                        descending=[True, False])
    return pruned.sort(["totalprice_cents", "o_orderkey"],
                       descending=[True, False]).limit(100)


Q18_LARGE_ORDERS_SQL = f"""
WITH s AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > {Q18_QTY_THR}
)
SELECT o.o_orderkey, o.o_custkey,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       s.sum_qty
FROM orders o JOIN s ON o.o_orderkey = s.l_orderkey
ORDER BY totalprice_cents DESC, o.o_orderkey
LIMIT 100
"""


# --- TPC-H Q22 shape: global scalar subquery + NOT-EXISTS anti-join --------

def q22_idle_rich_customers(sf_dir: str, *, num_partitions: int | None = None):
    """(c_mktsegment, n_cust, total_acctbal_cents) — TPC-H Q22 shape:
    customers whose balance exceeds the global positive-balance average
    AND who placed no URGENT order, censused per market segment.

    The float average predicate is restated EXACTLY in integers
    (acctbal_cents * cnt > sum_cents — the Q17 cross-multiply trick), so
    both engines do identical arithmetic.  Scale shape: the global scalar
    is two int64s from a combiner funnel; the NOT EXISTS decorrelates to
    ONE custkey-keyed hash exchange of tagged compact rows (rich
    customers + urgent-order keys), with the membership test per
    co-located partition — correct at any key-set size, no driver-side
    membership table.  The output census is bounded (segments) through
    the combiner tree.
    """
    from ..stages.aggregate import tree_merge
    from ..stages.join import auto_join_partitions

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def scalar_partial(b: pa.Table) -> pa.Table:
        pos = b.filter(pc.greater(b["c_acctbal"], 0.0))
        cents = _cents(pos["c_acctbal"])
        return pa.table({
            "sum_cents": pa.array([pc.sum(cents).as_py() or 0], pa.int64()),
            "cnt": pa.array([pos.num_rows], pa.int64()),
        })

    g = pa.concat_tables(list(
        cust.map_batches(scalar_partial, batch_format="pyarrow",
                         batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    sum_cents = pc.sum(g["sum_cents"]).as_py() or 0
    cnt = pc.sum(g["cnt"]).as_py() or 0

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderpriority"])

    # NOT EXISTS via the key-co-located union pattern (not Dataset.join:
    # either side can be emptied outright — no rich customers / no urgent
    # orders — and a filter-emptied side breaks the shuffle join's schema
    # unification; the tagged union never loses its schema)
    def urgent(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
        return pa.table({
            "c_custkey": keep["o_custkey"],
            "c_mktsegment": pa.nulls(keep.num_rows, pa.string()),
            "acctbal_cents": pa.nulls(keep.num_rows, pa.int64()),
            "is_key": pa.array([1] * keep.num_rows, pa.int8()),
        })

    def rich(b: pa.Table) -> pa.Table:
        cents = _cents(b["c_acctbal"])
        lhs = pc.multiply(cents, pa.scalar(cnt, pa.int64()))
        keep = b.filter(pc.greater(lhs, pa.scalar(sum_cents, pa.int64())))
        return pa.table({
            "c_custkey": keep["c_custkey"],
            "c_mktsegment": keep["c_mktsegment"],
            "acctbal_cents": _cents(keep["c_acctbal"]),
            "is_key": pa.array([0] * keep.num_rows, pa.int8()),
        })

    from ..stages.shuffle import hash_partition

    mixed = cust.map_batches(rich, batch_format="pyarrow",
                             batch_size=None).union(
        orders.map_batches(urgent, batch_format="pyarrow", batch_size=None))
    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/customer.parquet",
                                              f"{sf_dir}/orders.parquet")
    colocated = hash_partition(mixed, ["c_custkey"], num_partitions)

    def anti_census(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c_mktsegment": pa.array([], pa.string()),
                             "total_acctbal_cents": pa.array([], pa.int64()),
                             "n_cust": pa.array([], pa.int64())})
        keyset = pc.unique(b.filter(pc.equal(b["is_key"], 1))["c_custkey"])
        keep = b.filter(pc.equal(b["is_key"], 0))
        keep = keep.filter(pc.invert(pc.is_in(keep["c_custkey"],
                                              value_set=keyset)))
        g = keep.select(["c_mktsegment", "acctbal_cents"]) \
                .group_by(["c_mktsegment"]) \
                .aggregate([("acctbal_cents", "sum"), ([], "count_all")])
        return g.rename_columns(["c_mktsegment", "total_acctbal_cents",
                                 "n_cust"])

    partial = colocated.map_batches(anti_census, batch_format="pyarrow",
                                    batch_size=None)
    out = tree_merge(partial, ["c_mktsegment"],
                     [("total_acctbal_cents", "sum"), ("n_cust", "sum")])
    return out.select_columns(["c_mktsegment", "n_cust",
                               "total_acctbal_cents"]).sort("c_mktsegment")


Q22_IDLE_RICH_SQL = """
WITH g AS (
  SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
         COUNT(*) AS cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment, COUNT(*) AS n_cust,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS total_acctbal_cents
FROM customer c, g
WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * g.cnt > g.sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


# --- RANK / DENSE_RANK without a corpus sort --------------------------------

def rank_maps_from_histogram(h):
    """Descending RANK / DENSE_RANK / COUNT maps from a (segment, cents,
    cnt) value histogram: for each distinct (segment, value) row, rank =
    1 + rows-with-larger-value-in-segment, dense = distinct-larger + 1.
    Returns (packed keys sorted asc, rank, dense, n_seg, segments).
    Module-level so hypothesis can drive it against a brute-force oracle.
    """
    import numpy as np

    h = h.sort_values(["c_mktsegment", "cents"]).reset_index(drop=True)
    segs = sorted(h.c_mktsegment.unique())
    seg_code = {s: i for i, s in enumerate(segs)}
    cnt = h.cnt.to_numpy(dtype=np.int64)
    si = h.c_mktsegment.map(seg_code).to_numpy(dtype=np.int64)
    cents = h.cents.to_numpy(dtype=np.int64)
    offset = np.int64(1) << 31
    if cnt.size and (cents.max() + offset >= (1 << 32)
                     or cents.min() + offset < 0):
        raise ValueError("q_rank_customers: acctbal cents outside the "
                         "(seg << 32) | (cents + 2^31) key packing range")
    starts = np.concatenate(([True], si[1:] != si[:-1]))
    seg_idx = np.nonzero(starts)[0]
    n_seg = np.add.reduceat(cnt, seg_idx)[np.cumsum(starts) - 1]
    cum = np.cumsum(cnt)                         # rows <= this value, global
    grp_base = np.maximum.accumulate(np.where(starts, cum - cnt, 0))
    cum_in_seg = cum - grp_base                  # rows <= value, in segment
    rank = n_seg - cum_in_seg + 1                # 1 + larger-in-segment
    pos_in_seg = np.arange(len(cnt)) - np.maximum.accumulate(
        np.where(starts, np.arange(len(cnt)), 0))
    n_distinct = np.add.reduceat(np.ones(len(cnt), dtype=np.int64),
                                 seg_idx)[np.cumsum(starts) - 1]
    dense = n_distinct - pos_in_seg              # distinct larger + 1
    keys = (si << 32) | (cents + offset)
    return keys, rank, dense, n_seg, segs


def q_rank_customers(sf_dir: str):
    """(c_custkey, c_mktsegment, bal_rank, bal_dense_rank, n_seg) — RANK()
    and DENSE_RANK() of each customer's balance (descending) within its
    market segment, plus the segment size — the rank-window trio next to
    ``doc_len_rank``'s ascending RANK.

    Scale shape: no per-segment sort of the corpus — pass 1 builds the
    (segment, acctbal_cents) value histogram (per-block partials,
    associative tree merge; shuffle volume = O(distinct balances), which
    is bounded by the cent domain, not the row count); the driver turns
    the histogram into rank/dense-rank maps broadcast via ``ray.put``;
    pass 2 assigns vectorized with one ``searchsorted`` per block.
    Output is corpus-∝ and sortless (the gate is order-insensitive).
    """
    import numpy as np
    import ray

    from .. import tune_worker_threads
    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "customer",
                    columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def hist(b: pa.Table) -> pa.Table:
        t = pa.table({"c_mktsegment": b["c_mktsegment"],
                      "cents": _cents(b["c_acctbal"])})
        g = t.group_by(["c_mktsegment", "cents"]).aggregate([([], "count_all")])
        return g.rename_columns(["c_mktsegment", "cents", "cnt"])

    partial = ds.map_batches(hist, batch_format="pyarrow", batch_size=None)
    h = tree_merge(partial, ["c_mktsegment", "cents"], [("cnt", "sum")],
                   fanin=8).to_pandas()
    if len(h) == 0:  # empty corpus: reduceat on a fabricated segment throws
        return pa.table({"c_custkey": pa.array([], pa.int64()),
                         "c_mktsegment": pa.array([], pa.string()),
                         "bal_rank": pa.array([], pa.int64()),
                         "bal_dense_rank": pa.array([], pa.int64()),
                         "n_seg": pa.array([], pa.int64())})
    keys, rank, dense, n_seg, segs = rank_maps_from_histogram(h)
    offset = np.int64(1) << 31  # must match rank_maps_from_histogram's pack
    ref = ray.put((keys, rank, dense, n_seg, segs))

    def assign(b: pa.Table) -> pa.Table:
        tune_worker_threads()
        keys, rank, dense, n_seg, segs = ray.get(ref)
        code = pc.cast(pc.index_in(b["c_mktsegment"],
                                   value_set=pa.array(segs)),
                       pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.asarray(_cents(b["c_acctbal"]), dtype=np.int64)
        k = (code << 32) | (cents + offset)
        pos = np.searchsorted(keys, k)
        return pa.table({
            "c_custkey": b["c_custkey"],
            "c_mktsegment": b["c_mktsegment"],
            "bal_rank": pa.array(rank[pos], type=pa.int64()),
            "bal_dense_rank": pa.array(dense[pos], type=pa.int64()),
            "n_seg": pa.array(n_seg[pos], type=pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


Q_RANK_CUSTOMERS_SQL = """
SELECT c_custkey, c_mktsegment,
       RANK() OVER (PARTITION BY c_mktsegment
                    ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT) DESC)
           AS bal_rank,
       DENSE_RANK() OVER (PARTITION BY c_mktsegment
                          ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT) DESC)
           AS bal_dense_rank,
       COUNT(*) OVER (PARTITION BY c_mktsegment) AS n_seg
FROM customer
ORDER BY c_custkey
"""


# --- FIRST_VALUE / LAST_VALUE per partition ---------------------------------

def q_first_last_order(sf_dir: str, *, num_partitions: int = 8,
                       mode: str = "auto"):
    """(o_custkey, first_price_cents, last_price_cents, n_orders) — the
    FIRST_VALUE / LAST_VALUE window pair: each customer's earliest and
    latest order price by (date, orderkey) order.

    Scale shape: one custkey-keyed hash exchange (size-gated to a single
    block below the threshold); inside each partition ONE lexsort by
    (cust, day, orderkey) and the group boundary rows are picked with two
    vectorized edge masks — no per-customer loop, no corpus sort, output
    is per-customer and sortless.
    """
    import numpy as np

    from .. import tune_worker_threads
    from ..stages.shuffle import hash_partition, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/orders.parquet")
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey", "o_orderdate",
                             "o_totalprice"])
    part = (hash_partition(ds, ["o_custkey"], num_partitions)
            if mode == "shuffle" else ds.repartition(1))

    def firstlast(b: pa.Table) -> pa.Table:
        tune_worker_threads()
        if b.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "first_price_cents": pa.array([], pa.int64()),
                             "last_price_cents": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64())})
        cust = np.asarray(b["o_custkey"], dtype=np.int64)
        ok = np.asarray(b["o_orderkey"], dtype=np.int64)
        ts = (b["o_orderdate"].combine_chunks()
              if isinstance(b["o_orderdate"], pa.ChunkedArray)
              else b["o_orderdate"]).cast(pa.int64()).to_numpy()
        cents = np.asarray(_cents(b["o_totalprice"]), dtype=np.int64)
        order = np.lexsort((ok, ts, cust))
        c_s = cust[order]
        first = np.concatenate([[True], c_s[1:] != c_s[:-1]])
        last = np.concatenate([c_s[1:] != c_s[:-1], [True]])
        fi, li = np.nonzero(first)[0], np.nonzero(last)[0]
        return pa.table({
            "o_custkey": pa.array(c_s[fi]),
            "first_price_cents": pa.array(cents[order][fi]),
            "last_price_cents": pa.array(cents[order][li]),
            "n_orders": pa.array(li - fi + 1),
        })

    return part.map_batches(firstlast, batch_format="pyarrow",
                            batch_size=None)


Q_FIRST_LAST_ORDER_SQL = """
SELECT DISTINCT o_custkey,
       FIRST_VALUE(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
           AS first_price_cents,
       LAST_VALUE(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
           AS last_price_cents,
       COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey
"""


# --- TPC-H Q10 shape: returned-item revenue, top-20 customers --------------

def q10_returned_revenue(sf_dir: str, *, num_partitions: int | None = None):
    """(c_custkey, c_name, n_name, revenue_x10k) — TPC-H Q10 returned-item
    reporting: the 20 customers who returned the most revenue ('R' flag)
    for orders placed in 1996Q1 (custkey tiebreak makes LIMIT
    deterministic).

    Scale shape: lineitem pre-collapses per block to (orderkey, revenue)
    partials BEFORE the join — only 'R' lines move; the date-filtered
    orders key column hash-joins those compact rows, and the per-customer
    revenue merge is size-gated.  The top-20 cut happens on the compact
    per-customer aggregate (``local_topk`` prefilter -> blocks x 20 rows
    global sort), and ONLY the 20 winners are enriched with name/nation
    via a driver-side dimension join — names never ride the exchanges.
        CONSTRAINT: the date-filtered side feeds ``hash_join`` — a window
    matching nothing empties it and trips the join's documented
    zero-block schema limitation (fine on real data; see stages/join.py).
    """
    from ..stages.aggregate import local_topk
    from ..stages.join import auto_join_partitions
    from ..stages.shuffle import resolve_mode

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_returnflag",
                             "l_extendedprice", "l_discount"])

    def prep_li(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        t = pa.table({"l_orderkey": b["l_orderkey"], "rev": _cents(rev, 10000)})
        g = t.group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    li_agg = li.map_batches(prep_li, batch_format="pyarrow", batch_size=None)

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_o(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["o_orderdate"], _ts(1996, 1, 1)),
                       pc.less(b["o_orderdate"], _ts(1996, 4, 1)))
        return b.filter(keep).select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(prep_o, batch_format="pyarrow", batch_size=None)
    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                              f"{sf_dir}/lineitem.parquet")
    joined = hash_join(orders, li_agg, on="o_orderkey", right_on="l_orderkey",
                       num_partitions=num_partitions)
    mode = resolve_mode("auto", f"{sf_dir}/orders.parquet")
    per_cust = grouped_agg(joined, ["o_custkey"], {"revenue_x10k": "rev"},
                           mode=mode)
    pruned = local_topk(per_cust, ["revenue_x10k", "o_custkey"], 20,
                        descending=[True, False])
    top = pa.concat_tables(list(
        pruned.sort(["revenue_x10k", "o_custkey"], descending=[True, False])
        .limit(20).iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"o_custkey": pa.array([], pa.int64()),
                   "revenue_x10k": pa.array([], pa.int64())})]).combine_chunks()

    # bounded enrichment: 20 winners x (customer ⋈ nation) driver-side
    cust = _read_small(sf_dir, "customer",
                       ["c_custkey", "c_name", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_custkey"],
                                value_set=top["o_custkey"].combine_chunks()))
    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    dim = cust.join(nation, keys=["c_nationkey"], right_keys=["n_nationkey"])
    out = top.rename_columns(["c_custkey", "revenue_x10k"]).join(
        dim, keys=["c_custkey"])
    out = out.select(["c_custkey", "c_name", "n_name", "revenue_x10k"])
    idx = pc.sort_indices(out, sort_keys=[("revenue_x10k", "descending"),
                                          ("c_custkey", "ascending")])
    # bounded table: return it directly (a 0-row Ray dataset loses its
    # schema in to_pandas; the driver contract accepts pyarrow Tables)
    return out.take(idx)


Q10_RETURNED_REVENUE_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                AS BIGINT)) AS BIGINT) AS revenue_x10k
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue_x10k DESC, c.c_custkey
LIMIT 20
"""


# --- TPC-H Q14 shape: promo revenue share -----------------------------------

def q14_promo_revenue(sf_dir: str):
    """(promo_x10k, total_x10k, n_lines) — TPC-H Q14 promotion effect:
    discounted revenue from PROMO-type parts vs all parts for one ship
    month (the ratio is left to the reader in integers — a float division
    would break the driver's hash contract).

    Scale shape: ``part`` is a dimension at every TPC-H scale, so the
    partkey -> is_promo flag broadcasts (8-byte keys + 1 bit; the name
    and type strings never leave the driver); lineitem streams once with
    per-block (promo, total) partials through the combiner funnel.
    Output is one row.
    """
    part = _read_small(sf_dir, "part", ["p_partkey", "p_type"])
    flag = pa.table({
        "l_partkey": part["p_partkey"],
        "is_promo": pc.cast(pc.equal(part["p_type"], "PROMO"), pa.int64()),
    })

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_extendedprice", "l_discount",
                             "l_shipdate"])
    scored = broadcast_join(li, flag, "l_partkey")

    # the date filter lives INSIDE the partial (not a prior stage): Ray
    # drops 0-row blocks outright, so a window matching nothing would
    # otherwise starve the funnel and emit 0 rows where the SQL emits 1
    def partial(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["l_shipdate"], _ts(1996, 9, 1)),
                       pc.less(b["l_shipdate"], _ts(1996, 10, 1)))
        b = b.filter(keep)
        rev = _cents(pc.multiply(b["l_extendedprice"],
                                 pc.subtract(1.0, b["l_discount"])), 10000)
        b = b.append_column("rev", rev)
        promo = pc.sum(pc.multiply(b["rev"], b["is_promo"])).as_py() or 0
        total = pc.sum(b["rev"]).as_py() or 0
        return pa.table({"promo_x10k": pa.array([promo], pa.int64()),
                         "total_x10k": pa.array([total], pa.int64()),
                         "n_lines": pa.array([b.num_rows], pa.int64())})

    parts = scored.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)

    def total(b: pa.Table) -> pa.Table:
        return pa.table({
            "promo_x10k": pa.array([pc.sum(b["promo_x10k"]).as_py() or 0],
                                   pa.int64()),
            "total_x10k": pa.array([pc.sum(b["total_x10k"]).as_py() or 0],
                                   pa.int64()),
            "n_lines": pa.array([pc.sum(b["n_lines"]).as_py() or 0],
                                pa.int64()),
        })

    return parts.repartition(1).map_batches(total, batch_format="pyarrow",
                                            batch_size=None)


Q14_PROMO_REVENUE_SQL = """
SELECT CAST(COALESCE(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                     * 10000) AS BIGINT)
                     ELSE 0 END), 0) AS BIGINT) AS promo_x10k,
       CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                    * 10000) AS BIGINT)), 0) AS BIGINT)
           AS total_x10k,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01'
"""


# --- TPC-H Q15 shape: top supplier by quarterly revenue ---------------------

def q15_top_supplier(sf_dir: str):
    """(s_suppkey, s_name, total_revenue_x10k) — TPC-H Q15 top supplier:
    the supplier(s) with the maximum discounted revenue shipped in 1996Q1
    (ties all surface, exactly like the reference query's ``= MAX``).

    Scale shape: lineitem collapses per block to (suppkey, revenue)
    partials; the supplier key set is dimension-bounded, so the merge is
    the combiner tree; the global max is two scalars off that compact
    table and the winners join the supplier dimension driver-side.
    Nothing corpus-sized moves after the first pass.
    """
    li = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_extendedprice", "l_discount",
                             "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["l_shipdate"], _ts(1996, 1, 1)),
                       pc.less(b["l_shipdate"], _ts(1996, 4, 1)))
        b = b.filter(keep)
        rev = _cents(pc.multiply(b["l_extendedprice"],
                                 pc.subtract(1.0, b["l_discount"])), 10000)
        t = pa.table({"l_suppkey": b["l_suppkey"], "rev": rev})
        g = t.group_by(["l_suppkey"]).aggregate([("rev", "sum")])
        return g.rename_columns(["l_suppkey", "rev"])

    partial = li.map_batches(prep, batch_format="pyarrow", batch_size=None)
    from ..stages.aggregate import tree_merge

    per_supp = pa.concat_tables(list(
        tree_merge(partial, ["l_suppkey"], [("rev", "sum")], fanin=8)
        .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"l_suppkey": pa.array([], pa.int64()),
                   "rev": pa.array([], pa.int64())})]).combine_chunks()
    if per_supp.num_rows == 0:
        return pa.table({
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "total_revenue_x10k": pa.array([], pa.int64())})
    best = pc.max(per_supp["rev"])
    winners = per_supp.filter(pc.equal(per_supp["rev"], best))
    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = winners.rename_columns(["s_suppkey", "total_revenue_x10k"]).join(
        supp, keys=["s_suppkey"])
    out = out.select(["s_suppkey", "s_name", "total_revenue_x10k"])
    idx = pc.sort_indices(out, sort_keys=[("s_suppkey", "ascending")])
    return out.take(idx)  # bounded; Tables keep schema on 0 rows


Q15_TOP_SUPPLIER_SQL = """
WITH r AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT)) AS BIGINT) AS total_revenue_x10k
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue_x10k
FROM supplier s JOIN r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue_x10k = (SELECT MAX(total_revenue_x10k) FROM r)
ORDER BY s.s_suppkey
"""


# --- TPC-H Q19 shape: OR'd brand/size/quantity predicate triples ------------

Q19_TRIPLES = (("Brand#12", 5, 1, 11), ("Brand#23", 10, 10, 20),
               ("Brand#3", 15, 20, 30))  # (brand, max_size, qty_lo, qty_hi)


def q19_discounted_revenue(sf_dir: str):
    """(revenue_x10k, n_lines) — TPC-H Q19 shape: revenue from lineitems
    matching any of three OR'd (brand, size-range, quantity-range)
    predicate triples.

    Scale shape: the part predicate collapses to a partkey -> triple-mask
    byte driver-side (a dimension-bounded broadcast of 9 bytes/part); the
    lineitem pass evaluates all three quantity windows vectorized against
    the mask bits and funnels two scalars.  One corpus pass, no join
    exchange at all.
    """
    import numpy as np

    part = _read_small(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    mask = np.zeros(len(part), dtype=np.int64)
    brand = part["p_brand"].to_numpy(zero_copy_only=False)
    size = part["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    for bit, (b_name, max_size, _, _) in enumerate(Q19_TRIPLES):
        hit = (brand == b_name) & (size >= 1) & (size <= max_size)
        mask |= hit.astype(np.int64) << bit
    flag = pa.table({"l_partkey": part["p_partkey"],
                     "pmask": pa.array(mask)})

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity", "l_extendedprice",
                             "l_discount"])
    scored = broadcast_join(li, flag, "l_partkey")

    def partial(b: pa.Table) -> pa.Table:
        qty = np.asarray(pc.round(b["l_quantity"]).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        pmask = np.asarray(b["pmask"], dtype=np.int64)
        keep = np.zeros(len(qty), dtype=bool)
        for bit, (_, _, lo, hi) in enumerate(Q19_TRIPLES):
            keep |= ((pmask >> bit) & 1).astype(bool) & (qty >= lo) & (qty <= hi)
        b = b.filter(pa.array(keep))
        rev = _cents(pc.multiply(b["l_extendedprice"],
                                 pc.subtract(1.0, b["l_discount"])), 10000)
        return pa.table({
            "revenue_x10k": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
            "n_lines": pa.array([b.num_rows], pa.int64())})

    parts = scored.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)

    def total(b: pa.Table) -> pa.Table:
        return pa.table({
            "revenue_x10k": pa.array([pc.sum(b["revenue_x10k"]).as_py() or 0],
                                     pa.int64()),
            "n_lines": pa.array([pc.sum(b["n_lines"]).as_py() or 0],
                                pa.int64())})

    return parts.repartition(1).map_batches(total, batch_format="pyarrow",
                                            batch_size=None)


Q19_DISCOUNTED_REVENUE_SQL = f"""
SELECT CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                    * 10000) AS BIGINT)), 0) AS BIGINT)
           AS revenue_x10k,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = '{Q19_TRIPLES[0][0]}' AND p.p_size BETWEEN 1 AND {Q19_TRIPLES[0][1]}
       AND CAST(ROUND(l.l_quantity) AS BIGINT) BETWEEN {Q19_TRIPLES[0][2]} AND {Q19_TRIPLES[0][3]})
   OR (p.p_brand = '{Q19_TRIPLES[1][0]}' AND p.p_size BETWEEN 1 AND {Q19_TRIPLES[1][1]}
       AND CAST(ROUND(l.l_quantity) AS BIGINT) BETWEEN {Q19_TRIPLES[1][2]} AND {Q19_TRIPLES[1][3]})
   OR (p.p_brand = '{Q19_TRIPLES[2][0]}' AND p.p_size BETWEEN 1 AND {Q19_TRIPLES[2][1]}
       AND CAST(ROUND(l.l_quantity) AS BIGINT) BETWEEN {Q19_TRIPLES[2][2]} AND {Q19_TRIPLES[2][3]})
"""


# --- TPC-H Q7 shape: cross-nation trade volume ------------------------------

def q7_nation_volume(sf_dir: str, *, num_partitions: int | None = None):
    """(supp_nation, cust_nation, l_year, volume_x10k, n_lines) — TPC-H Q7
    shape: discounted revenue shipped between every DISTINCT pair of
    supplier-nation and customer-nation, per ship year 1996-1997.

    Scale shape: both nation lookups are dimension broadcasts (supplier
    and the nation names ride every block; customer pre-collapses to a
    (custkey, nation) map exactly like ``q_3way_revenue``); the two fact
    joins are orderkey-keyed hash exchanges with size-derived partition
    counts and the year filter applied BELOW the exchange.  The
    (25 x 24 x years) census merges through the combiner tree.
        CONSTRAINT: the date-filtered side feeds ``hash_join`` — a window
    matching nothing empties it and trips the join's documented
    zero-block schema limitation (fine on real data; see stages/join.py).
    """
    from ..stages.join import auto_join_partitions

    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])

    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp = supp.join(nation, keys=["s_nationkey"], right_keys=["n_nationkey"])
    supp_map = pa.table({"l_suppkey": supp["s_suppkey"],
                         "supp_nation": supp["n_name"]})

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = broadcast_join(cust, nation, "c_nationkey", "n_nationkey",
                          columns=["n_name"])

    def cust_prep(b: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": b["c_custkey"],
                         "cust_nation": b["n_name"]})

    cust = cust.map_batches(cust_prep, batch_format="pyarrow", batch_size=None)

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                              f"{sf_dir}/customer.parquet")
    o_nation = hash_join(orders, cust, on="o_custkey", right_on="c_custkey",
                         num_partitions=num_partitions).select_columns(
                             ["o_orderkey", "cust_nation"])

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_shipdate",
                             "l_extendedprice", "l_discount"])

    def li_prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["l_shipdate"], _ts(1996, 1, 1)),
                       pc.less(b["l_shipdate"], _ts(1998, 1, 1)))
        b = b.filter(keep)
        rev = _cents(pc.multiply(b["l_extendedprice"],
                                 pc.subtract(1.0, b["l_discount"])), 10000)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "l_year": pc.cast(pc.year(b["l_shipdate"]),
                                           pa.int64()),
                         "rev": rev})

    li = li.map_batches(li_prep, batch_format="pyarrow", batch_size=None)
    li = broadcast_join(li, supp_map, "l_suppkey")

    n_ol = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                f"{sf_dir}/lineitem.parquet")
    joined = hash_join(li, o_nation, on="l_orderkey", right_on="o_orderkey",
                       num_partitions=n_ol)

    def diff_nation(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b["supp_nation"], b["cust_nation"]))

    joined = joined.map_batches(diff_nation, batch_format="pyarrow",
                                batch_size=None)
    out = grouped_agg(joined, ["supp_nation", "cust_nation", "l_year"],
                      {"volume_x10k": "rev"}, count_name="n_lines",
                      final_partitions=1)
    return out.sort(["supp_nation", "cust_nation", "l_year"])


Q7_NATION_VOLUME_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                AS BIGINT)) AS BIGINT) AS volume_x10k,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  AND sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, EXTRACT(YEAR FROM l.l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


# --- TPC-H Q5 shape: local-supplier volume by nation ------------------------

Q5_REGION = "ASIA"


def q5_local_supplier_volume(sf_dir: str, *, region: str = Q5_REGION,
                             num_partitions: int | None = None):
    """(n_name, revenue_x10k, n_lines) — TPC-H Q5 shape: discounted revenue
    from orders placed in 1996 where the customer and the supplier sit in
    the SAME nation of one region (``ASIA``), grouped per nation.

    Scale shape: region -> nation -> supplier collapse driver-side to a
    (suppkey, nationkey, name) broadcast map; customers pre-collapse to a
    regional (custkey, nationkey) map via the same broadcast (the inner
    broadcast join doubles as the region membership filter, so non-ASIA
    customers never reach the exchange).  The two fact joins are
    orderkey-keyed hash exchanges with size-derived partition counts; the
    order-date window is applied BELOW the exchange and the local-supplier
    predicate (c_nationkey == s_nationkey) below the final aggregate.  The
    census is <= 25 nations, merged through the combiner tree.
        CONSTRAINT: the date-filtered orders side feeds ``hash_join`` — a
    window matching nothing empties it and trips the join's documented
    zero-block schema limitation (fine on real data; see stages/join.py).
    """
    from ..stages.join import auto_join_partitions

    region_t = _read_small(sf_dir, "region", ["r_regionkey", "r_name"])
    region_t = region_t.filter(pc.equal(region_t["r_name"], region))
    nation = _read_small(sf_dir, "nation",
                         ["n_nationkey", "n_name", "n_regionkey"])
    nation = nation.filter(pc.is_in(nation["n_regionkey"],
                                    value_set=region_t["r_regionkey"]))

    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp = supp.join(nation.select(["n_nationkey", "n_name"]),
                     keys=["s_nationkey"], right_keys=["n_nationkey"])
    supp_map = pa.table({"l_suppkey": supp["s_suppkey"],
                         "s_nationkey": supp["s_nationkey"],
                         "n_name": supp["n_name"]})

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = broadcast_join(cust, nation.select(["n_nationkey"]),
                          "c_nationkey", "n_nationkey", columns=[])

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def orders_prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["o_orderdate"], _ts(1996, 1, 1)),
                       pc.less(b["o_orderdate"], _ts(1997, 1, 1)))
        b = b.filter(keep)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"]})

    orders = orders.map_batches(orders_prep, batch_format="pyarrow",
                                batch_size=None)
    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                              f"{sf_dir}/customer.parquet")
    o_nation = hash_join(orders, cust, on="o_custkey", right_on="c_custkey",
                         num_partitions=num_partitions).select_columns(
                             ["o_orderkey", "c_nationkey"])

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])

    def li_prep(b: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(b["l_extendedprice"],
                                 pc.subtract(1.0, b["l_discount"])), 10000)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"], "rev": rev})

    li = li.map_batches(li_prep, batch_format="pyarrow", batch_size=None)
    li = broadcast_join(li, supp_map, "l_suppkey")

    n_ol = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                f"{sf_dir}/lineitem.parquet")
    joined = hash_join(li, o_nation, on="l_orderkey", right_on="o_orderkey",
                       num_partitions=n_ol)

    def local_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["s_nationkey"], b["c_nationkey"]))

    joined = joined.map_batches(local_only, batch_format="pyarrow",
                                batch_size=None)
    out = grouped_agg(joined, ["n_name"], {"revenue_x10k": "rev"},
                      count_name="n_lines", final_partitions=1)
    return out.sort(["revenue_x10k", "n_name"], descending=[True, False])


Q5_LOCAL_SUPPLIER_SQL = f"""
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                AS BIGINT)) AS BIGINT) AS revenue_x10k,
       COUNT(*) AS n_lines
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue_x10k DESC, n.n_name
"""


# --- TPC-H Q9 shape: product-line profit by nation and year -----------------

def q9_product_profit(sf_dir: str, *, name_token: str = "red",
                      num_partitions: int | None = None):
    """(n_name, o_year, profit_x10k, n_lines) — TPC-H Q9 shape: per
    supplier-nation / order-year profit on parts whose name contains
    ``name_token``.  The reference schema has no partsupp table, so
    supply cost is ``p_retailprice`` (flat per part) — the join topology
    and the amount arithmetic are Q9's.

    Scale shape: part (name filter -> partkey/cost) and supplier
    (suppkey -> nation) are dimension broadcasts; the part join is
    INNER so the name filter prunes lineitem before the orderkey hash
    exchange against the pruned orders (orderkey, year) columns.  The
    (nations x years) census merges through the combiner tree.
    """
    from ..stages.join import auto_join_partitions

    part = _read_small(sf_dir, "part", ["p_partkey", "p_name",
                                        "p_retailprice"])
    part = part.filter(pc.match_substring(part["p_name"], name_token))
    cost_map = pa.table({
        "l_partkey": part["p_partkey"],
        "cost_x10k": _cents(part["p_retailprice"], 10000),
    })

    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp = supp.join(nation, keys=["s_nationkey"], right_keys=["n_nationkey"])
    supp_map = pa.table({"l_suppkey": supp["s_suppkey"],
                         "n_name": supp["n_name"]})

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey", "l_suppkey",
                             "l_quantity", "l_extendedprice", "l_discount"])
    li = broadcast_join(li, cost_map, "l_partkey")  # inner: name filter prunes
    li = broadcast_join(li, supp_map, "l_suppkey")

    def amount(b: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(b["l_extendedprice"],
                                 pc.subtract(1.0, b["l_discount"])), 10000)
        qty = pc.cast(pc.round(b["l_quantity"]), pa.int64())
        cost = pc.multiply(b["cost_x10k"], qty)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "n_name": b["n_name"],
                         "amount": pc.subtract(rev, cost)})

    li = li.map_batches(amount, batch_format="pyarrow", batch_size=None)

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def o_prep(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_year": pc.cast(pc.year(b["o_orderdate"]),
                                           pa.int64())})

    orders = orders.map_batches(o_prep, batch_format="pyarrow",
                                batch_size=None)
    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                              f"{sf_dir}/lineitem.parquet")
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                       num_partitions=num_partitions)
    out = grouped_agg(joined, ["n_name", "o_year"],
                      {"profit_x10k": "amount"}, count_name="n_lines",
                      final_partitions=1)
    return out.sort(["n_name", "o_year"])


Q9_PRODUCT_PROFIT_SQL = """
SELECT n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                     AS BIGINT)
                - CAST(ROUND(p.p_retailprice * 10000) AS BIGINT)
                  * CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT)
           AS profit_x10k,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
ORDER BY n.n_name, o_year
"""


# --- TPC-H Q4 shape: EXISTS-gated order-priority census ---------------------

Q4_QTY_THR = 45


def q4_order_priority(sf_dir: str, *, qty_thr: int = Q4_QTY_THR,
                      num_partitions: int | None = None):
    """(o_orderpriority, n_orders) — TPC-H Q4 shape: how many orders per
    priority contain at least one heavy lineitem (quantity > ``qty_thr``
    stands in for the reference's receipt-after-commit predicate, which
    needs date columns this schema does not carry).

    Scale shape: the EXISTS decorrelates to a distinct-orderkey set built
    with per-block pre-aggregation and a size-gated merge (compact 8-byte
    keys — lineitem rows never reach the join), an orderkey-keyed hash
    semi-join against the pruned orders columns, and a bounded priority
    census through the combiner tree.

    CONSTRAINT: the quantity-filtered key set feeds ``hash_join`` — a
    ``qty_thr`` above the quantity domain empties it and trips the join's
    documented zero-block schema limitation (fine on real data; see
    stages/join.py).
    """
    from ..stages.join import auto_join_partitions
    from ..stages.shuffle import resolve_mode

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    thr = pa.scalar(float(qty_thr))

    def heavy(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["l_quantity"], thr)).select(["l_orderkey"])

    mode = resolve_mode("auto", f"{sf_dir}/lineitem.parquet")
    keys = count_by(li.map_batches(heavy, batch_format="pyarrow",
                                   batch_size=None),
                    ["l_orderkey"], count_name="__n", mode=mode) \
        .select_columns(["l_orderkey"])

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"])
    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                              f"{sf_dir}/lineitem.parquet")
    joined = hash_join(orders, keys, on="o_orderkey", right_on="l_orderkey",
                       num_partitions=num_partitions)
    out = count_by(joined, ["o_orderpriority"], count_name="n_orders")
    return out.sort("o_orderpriority")


Q4_ORDER_PRIORITY_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > {Q4_QTY_THR})
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- TPC-H Q12 shape: line-status x order-priority class census -------------

HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def q12_linestatus_priority(sf_dir: str, *, num_partitions: int | None = None):
    """(l_linestatus, high_lines, low_lines) — TPC-H Q12 shape with
    ``l_linestatus`` standing in for the ship-mode column this schema
    does not carry: per line status, how many lineitems belong to
    high-priority orders (URGENT/HIGH) vs the rest.

    Scale shape: lineitem pre-collapses per block to (orderkey, status,
    n) partials — at most orders x statuses compact rows reach the hash
    exchange; orders carries a 0/1 high flag; the joined partials reduce
    to the bounded (status x 2) census through the combiner tree.
    """
    from ..stages.join import auto_join_partitions

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus"])

    def li_agg(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        g = b.group_by(["l_orderkey", "l_linestatus"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["l_orderkey", "l_linestatus", "n"])

    li = li.map_batches(li_agg, batch_format="pyarrow", batch_size=None)

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"])

    def o_prep(b: pa.Table) -> pa.Table:
        hi = pc.cast(pc.is_in(b["o_orderpriority"],
                              value_set=pa.array(HIGH_PRIORITIES)),
                     pa.int64())
        return pa.table({"o_orderkey": b["o_orderkey"], "hi": hi})

    orders = orders.map_batches(o_prep, batch_format="pyarrow",
                                batch_size=None)
    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                              f"{sf_dir}/lineitem.parquet")
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                       num_partitions=num_partitions)

    def split(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_linestatus": b["l_linestatus"],
            "high": pc.multiply(b["n"], b["hi"]),
            "low": pc.multiply(b["n"], pc.subtract(pa.scalar(1, pa.int64()),
                                                   b["hi"])),
        })

    out = grouped_agg(joined.map_batches(split, batch_format="pyarrow",
                                         batch_size=None),
                      ["l_linestatus"],
                      {"high_lines": "high", "low_lines": "low"},
                      final_partitions=1)
    return out.sort("l_linestatus")


Q12_LINESTATUS_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --- TPC-H Q8 shape: national market share ----------------------------------

Q8_REGION = "EUROPE"
Q8_NATION = "NATION_3"


def q8_market_share(sf_dir: str, *, region: str = Q8_REGION,
                    nation: str = Q8_NATION,
                    num_partitions: int | None = None):
    """(o_year, nation_x10k, total_x10k, n_lines) — TPC-H Q8 market
    share: of all revenue sold to ``region``'s customers per order year,
    the share supplied by ``nation`` (numerator and denominator in
    integer deci-milli-cents; the division is the reader's).

    Scale shape: the customer side collapses to region-member custkeys
    through a broadcast dimension join BEFORE the orders exchange (the
    region filter prunes ~4/5 of orders below the lineitem join);
    supplier nation rides lineitem as a broadcast; the year census is
    bounded and merges through the combiner tree.
    CONSTRAINT: the region/date filters feed ``hash_join`` — inputs where
    they match nothing trip the join's documented zero-block limitation.
    """
    from ..stages.join import auto_join_partitions

    nation_t = _read_small(sf_dir, "nation",
                           ["n_nationkey", "n_name", "n_regionkey"])
    region_t = _read_small(sf_dir, "region", ["r_regionkey", "r_name"])
    dim = nation_t.join(region_t, keys=["n_regionkey"],
                        right_keys=["r_regionkey"])

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = broadcast_join(cust, dim, "c_nationkey", "n_nationkey",
                          columns=["r_name"])

    def in_region(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["r_name"], region)).select(["c_custkey"])

    cust = cust.map_batches(in_region, batch_format="pyarrow",
                            batch_size=None)

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"],
                         "o_year": pc.cast(pc.year(b["o_orderdate"]),
                                           pa.int64())})

    orders = orders.map_batches(o_prep, batch_format="pyarrow",
                                batch_size=None)
    if num_partitions is None:
        num_partitions = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                              f"{sf_dir}/customer.parquet")
    o_reg = hash_join(orders, cust, on="o_custkey", right_on="c_custkey",
                      num_partitions=num_partitions).select_columns(
                          ["o_orderkey", "o_year"])

    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp = supp.join(nation_t.select(["n_nationkey", "n_name"]),
                     keys=["s_nationkey"], right_keys=["n_nationkey"])
    supp_map = pa.table({
        "l_suppkey": supp["s_suppkey"],
        "is_nation": pc.cast(pc.equal(supp["n_name"], nation), pa.int64()),
    })

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount"])

    def li_prep(b: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(b["l_extendedprice"],
                                 pc.subtract(1.0, b["l_discount"])), 10000)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"], "rev": rev})

    li = li.map_batches(li_prep, batch_format="pyarrow", batch_size=None)
    li = broadcast_join(li, supp_map, "l_suppkey")

    n_ol = auto_join_partitions(f"{sf_dir}/orders.parquet",
                                f"{sf_dir}/lineitem.parquet")
    joined = hash_join(li, o_reg, on="l_orderkey", right_on="o_orderkey",
                       num_partitions=n_ol)

    def split(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_year": b["o_year"],
            "nat": pc.multiply(b["rev"], b["is_nation"]),
            "tot": b["rev"],
        })

    out = grouped_agg(joined.map_batches(split, batch_format="pyarrow",
                                         batch_size=None),
                      ["o_year"], {"nation_x10k": "nat", "total_x10k": "tot"},
                      count_name="n_lines", final_partitions=1)
    return out.sort("o_year")


Q8_MARKET_SHARE_SQL = f"""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN sn.n_name = '{Q8_NATION}'
                     THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                     * 10000) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS nation_x10k,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                AS BIGINT)) AS BIGINT) AS total_x10k,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN region r   ON cn.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q8_REGION}'
GROUP BY EXTRACT(YEAR FROM o.o_orderdate)
ORDER BY o_year
"""


# --- TPC-H Q16 shape: distinct suppliers per brand/type ---------------------

Q16_EXCLUDE_BRAND = "Brand#1"


def q16_supplier_counts(sf_dir: str, *, exclude_brand: str = Q16_EXCLUDE_BRAND,
                        num_partitions: int = 16):
    """(p_brand, p_type, supplier_cnt) — TPC-H Q16 shape: how many
    DISTINCT suppliers shipped parts of each brand/type, excluding one
    brand (the schema has no partsupp, so shipment pairs from lineitem
    stand in for the supplier catalogue).

    Scale shape: COUNT(DISTINCT) decorrelates to two distinct passes —
    the corpus collapses to distinct (partkey, suppkey) pairs with
    per-block pre-aggregation and a size-gated merge; the part dimension
    broadcast maps pairs to (brand, type, suppkey) triples, whose
    distinct set is bounded (brands x types x suppliers) and merges
    through the combiner tree before the final bounded census.
    """
    from ..stages.shuffle import resolve_mode

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    mode = resolve_mode("auto", f"{sf_dir}/lineitem.parquet")
    pairs = count_by(li, ["l_partkey", "l_suppkey"], count_name="__n",
                     mode=mode, final_partitions=num_partitions) \
        .select_columns(["l_partkey", "l_suppkey"])

    part = _read_small(sf_dir, "part", ["p_partkey", "p_brand", "p_type"])
    part = part.filter(pc.not_equal(part["p_brand"], exclude_brand))
    pairs = broadcast_join(pairs, part, "l_partkey", "p_partkey")

    triples = count_by(pairs, ["p_brand", "p_type", "l_suppkey"],
                       count_name="__n") \
        .select_columns(["p_brand", "p_type"])
    out = count_by(triples, ["p_brand", "p_type"], count_name="supplier_cnt")
    return out.sort(["supplier_cnt", "p_brand", "p_type"],
                    descending=[True, False, False])


Q16_SUPPLIER_COUNTS_SQL = f"""
SELECT p.p_brand, p.p_type,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> '{Q16_EXCLUDE_BRAND}'
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
"""


# --- TPC-H Q21 shape: the sole-blocking-supplier census ---------------------

Q21_TOP = 10


def q21_waiting_supplier(sf_dir: str, *, top: int = Q21_TOP,
                         num_partitions: int = 8, mode: str = "auto"):
    """(s_name, numwait) — TPC-H Q21 shape: for each supplier, how many
    of its returned lineitems ('R' standing in for the missing
    receipt-after-commit dates) sit in multi-supplier orders where it is
    the ONLY supplier with a return — the classic EXISTS + NOT-EXISTS
    self-join pair, decorrelated into per-order co-located flags.

    Scale shape: lineitem pre-collapses per block to (orderkey, suppkey,
    n_returned, n_rows) partials; ONE orderkey-keyed exchange co-locates
    each order's pairs (size-gated to a single block below the
    threshold); inside a partition the blame test is one lexsort +
    segment reduction, emitting per-supplier partial counts that merge
    through the combiner tree (bounded by the supplier dimension).  The
    top-``top`` cut and name join touch only the bounded census.
    """
    import numpy as np

    from ..stages.aggregate import tree_merge
    from ..stages.shuffle import hash_partition, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/lineitem.parquet")
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def pair_partial(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        t = pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "r": pc.cast(pc.equal(b["l_returnflag"], "R"), pa.int64()),
        })
        g = t.group_by(["l_orderkey", "l_suppkey"]).aggregate([("r", "sum")])
        return g.rename_columns(["l_orderkey", "l_suppkey", "n_r"])

    pairs = li.map_batches(pair_partial, batch_format="pyarrow",
                           batch_size=None)
    part = (hash_partition(pairs, ["l_orderkey"], num_partitions)
            if mode == "shuffle" else pairs.repartition(1))

    census = part.map_batches(blame_census_kernel, batch_format="pyarrow",
                              batch_size=None)
    merged = pa.concat_tables(list(
        tree_merge(census, ["l_suppkey"], [("numwait", "sum")], fanin=8)
        .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"l_suppkey": pa.array([], pa.int64()),
                   "numwait": pa.array([], pa.int64())})]).combine_chunks()

    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = merged.join(supp, keys=["l_suppkey"], right_keys=["s_suppkey"])
    out = out.select(["s_name", "numwait"])
    idx = pc.sort_indices(out, sort_keys=[("numwait", "descending"),
                                          ("s_name", "ascending")])
    return out.take(idx).slice(0, top)  # bounded; schema survives 0 rows


def blame_census_kernel(b: pa.Table) -> pa.Table:
    """Per-partition Q21 blame kernel over co-located (orderkey, suppkey,
    n_r) pair partials: a supplier is blamed for its returned rows in a
    multi-supplier order where it is the ONLY supplier with a return.
    Module-level so hypothesis can drive it against a brute-force oracle."""
    import numpy as np

    from .. import tune_worker_threads

    tune_worker_threads()
    if b.num_rows == 0:
        return pa.table({"l_suppkey": pa.array([], pa.int64()),
                         "numwait": pa.array([], pa.int64())})
    # finish the pair merge (co-located by orderkey)
    g = b.group_by(["l_orderkey", "l_suppkey"]).aggregate(
        [("n_r", "sum")])
    ok = np.asarray(g["l_orderkey"], dtype=np.int64)
    sk = np.asarray(g["l_suppkey"], dtype=np.int64)
    nr = np.asarray(g["n_r_sum"], dtype=np.int64)
    order = np.argsort(ok, kind="stable")
    ok, sk, nr = ok[order], sk[order], nr[order]
    starts = np.concatenate(([True], ok[1:] != ok[:-1]))
    seg = np.cumsum(starts) - 1
    seg_idx = np.nonzero(starts)[0]
    n_supp = np.add.reduceat(np.ones_like(ok), seg_idx)
    n_supp_r = np.add.reduceat((nr > 0).astype(np.int64), seg_idx)
    qual = (nr > 0) & (n_supp[seg] >= 2) & (n_supp_r[seg] == 1)
    t = pa.table({"l_suppkey": pa.array(sk[qual]),
                  "numwait": pa.array(nr[qual])})
    g2 = t.group_by(["l_suppkey"]).aggregate([("numwait", "sum")])
    return g2.rename_columns(["l_suppkey", "numwait"])


Q21_WAITING_SUPPLIER_SQL = f"""
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT {Q21_TOP}
"""


# --- TPC-H Q2 shape: minimum-cost supplier per part -------------------------

Q2_PART_SIZE = 15
Q2_TOP = 100
_Q2_ACCT_OFF = 1 << 30  # acctbal cents offset so the packed key is positive
_Q2_SUPP_BITS = 24


def q2_min_cost_supplier(sf_dir: str, *, part_size: int = Q2_PART_SIZE,
                         top: int = Q2_TOP):
    """(p_partkey, s_suppkey, acct_cents) — TPC-H Q2 shape: for every
    size-``part_size`` part, the shipping supplier with the LOWEST
    account balance (standing in for the missing partsupp supply cost),
    suppkey breaking ties; top ``top`` by balance descending.

    Scale shape: the correlated MIN decorrelates into a packed-key MIN
    aggregation — (acctbal_cents + offset) << 24 | suppkey — over the
    distinct shipment pairs, so the per-part argmin merges associatively
    through the size-gated merge with no join-back pass; the part-size
    filter and name join touch only the part-dimension-bounded result.
    """
    import numpy as np

    from ..stages.shuffle import hash_merge, resolve_mode

    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    acct = _cents(supp["s_acctbal"])
    sk = supp["s_suppkey"].combine_chunks().to_numpy(zero_copy_only=False)
    ac = acct.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(sk) and (sk.max() >= (1 << _Q2_SUPP_BITS) or sk.min() < 0):
        raise ValueError("q2_min_cost_supplier: suppkey overflows key pack")
    if len(ac) and (ac.max() + _Q2_ACCT_OFF >= (1 << 39)
                    or ac.min() + _Q2_ACCT_OFF < 0):
        raise ValueError("q2_min_cost_supplier: acctbal outside key pack")
    packed = (ac + _Q2_ACCT_OFF) << _Q2_SUPP_BITS | sk
    supp_map = pa.table({"l_suppkey": pa.array(sk.astype(np.int64)),
                         "packed": pa.array(packed.astype(np.int64))})

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    scored = broadcast_join(li, supp_map, "l_suppkey")

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_partkey"]).aggregate([("packed", "min")])
        return g.rename_columns(["l_partkey", "packed"])

    p = scored.map_batches(partial, batch_format="pyarrow", batch_size=None)
    mode = resolve_mode("auto", f"{sf_dir}/lineitem.parquet")
    specs = [("packed", "min")]
    if mode == "shuffle":
        merged_ds = hash_merge(p, ["l_partkey"], specs, num_partitions=16)
    else:
        from ..stages.aggregate import tree_merge

        merged_ds = tree_merge(p, ["l_partkey"], specs, fanin=8)
    merged = pa.concat_tables(list(
        merged_ds.iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"l_partkey": pa.array([], pa.int64()),
                   "packed": pa.array([], pa.int64())})]).combine_chunks()

    part = _read_small(sf_dir, "part", ["p_partkey", "p_size"])
    keep = part.filter(pc.equal(part["p_size"], part_size))["p_partkey"]
    merged = merged.filter(pc.is_in(merged["l_partkey"],
                                    value_set=keep.combine_chunks()))
    pk = merged["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
    pv = merged["packed"].combine_chunks().to_numpy(zero_copy_only=False)
    win_sk = pv & ((1 << _Q2_SUPP_BITS) - 1)
    win_ac = (pv >> _Q2_SUPP_BITS) - _Q2_ACCT_OFF
    out = pa.table({"p_partkey": pa.array(pk.astype(np.int64)),
                    "s_suppkey": pa.array(win_sk.astype(np.int64)),
                    "acct_cents": pa.array(win_ac.astype(np.int64))})
    idx = pc.sort_indices(out, sort_keys=[("acct_cents", "descending"),
                                          ("p_partkey", "ascending")])
    return out.take(idx).slice(0, top)  # bounded; schema survives 0 rows


Q2_MIN_COST_SQL = f"""
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ranked AS (
  SELECT p.p_partkey, s.s_suppkey,
         CAST(ROUND(s.s_acctbal * 100) AS BIGINT) AS acct_cents,
         ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                            ORDER BY CAST(ROUND(s.s_acctbal * 100) AS BIGINT),
                                     s.s_suppkey) AS rn
  FROM pairs
  JOIN part p     ON pairs.l_partkey = p.p_partkey
  JOIN supplier s ON pairs.l_suppkey = s.s_suppkey
  WHERE p.p_size = {Q2_PART_SIZE}
)
SELECT p_partkey, s_suppkey, acct_cents
FROM ranked WHERE rn = 1
ORDER BY acct_cents DESC, p_partkey
LIMIT {Q2_TOP}
"""


# --- TPC-H Q11 shape: parts above a global value fraction -------------------

Q11_NATION = "NATION_19"  # has suppliers at every generated scale
Q11_FRACTION_DEN = 1000  # qualify when value * DEN > total


def q11_important_parts(sf_dir: str, *, nation: str = Q11_NATION,
                        fraction_den: int = Q11_FRACTION_DEN):
    """(l_partkey, value_cents) — TPC-H Q11 shape: parts whose shipped
    revenue from ``nation``'s suppliers exceeds 1/``fraction_den`` of
    that nation's total (the HAVING-over-global-scalar pattern; revenue
    stands in for the missing partsupp stock value).

    The float fraction predicate is exact in integers:
    ``value * fraction_den > total``.  Scale shape: the nation filter is
    a broadcast supplier map; per-part revenue collapses per block and
    merges through the combiner tree (part is dimension-bounded at every
    TPC-H scale — q17's argument); the global total and the qualifying
    filter read off that compact table driver-side.
    """
    from ..stages.aggregate import tree_merge

    nation_t = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp = supp.join(nation_t, keys=["s_nationkey"],
                     right_keys=["n_nationkey"])
    supp = supp.filter(pc.equal(supp["n_name"], nation))
    supp_keys = pa.table({"l_suppkey": supp["s_suppkey"]})

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    li = broadcast_join(li, supp_keys, "l_suppkey")  # inner: nation filter

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"l_partkey": b["l_partkey"],
                      "v": _cents(b["l_extendedprice"])})
        g = t.group_by(["l_partkey"]).aggregate([("v", "sum")])
        return g.rename_columns(["l_partkey", "v"])

    p = li.map_batches(partial, batch_format="pyarrow", batch_size=None)
    per_part = pa.concat_tables(list(
        tree_merge(p, ["l_partkey"], [("v", "sum")], fanin=8)
        .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"l_partkey": pa.array([], pa.int64()),
                   "v": pa.array([], pa.int64())})]).combine_chunks()
    total = pc.sum(per_part["v"]).as_py() or 0
    lhs = pc.multiply(per_part["v"], pa.scalar(fraction_den, pa.int64()))
    out = per_part.filter(pc.greater(lhs, pa.scalar(total, pa.int64())))
    out = out.rename_columns(["l_partkey", "value_cents"])
    idx = pc.sort_indices(out, sort_keys=[("value_cents", "descending"),
                                          ("l_partkey", "ascending")])
    return out.take(idx)  # bounded; schema survives 0 rows


Q11_IMPORTANT_PARTS_SQL = f"""
WITH v AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = '{Q11_NATION}'
  GROUP BY l.l_partkey
)
SELECT l_partkey, value_cents
FROM v
WHERE value_cents * {Q11_FRACTION_DEN} > (SELECT SUM(value_cents) FROM v)
ORDER BY value_cents DESC, l_partkey
"""


# --- TPC-H Q20 shape: dominant suppliers ------------------------------------

Q20_FAIR_MULT = 2  # dominant = share above FAIR_MULT x the fair 1/n share


def q20_dominant_suppliers(sf_dir: str, *, num_partitions: int = 8,
                           mode: str = "auto"):
    """(s_suppkey, s_name, n_dominated) — TPC-H Q20 shape: suppliers who
    shipped more than ``Q20_FAIR_MULT``x their fair share of some part's
    total quantity (``q * n_suppliers > MULT * total`` in exact integers
    — the correlated share-of-group-total subquery; an absolute >50%
    share is scale-dependent and goes empty as supplier counts grow, a
    fair-share multiple is not).

    Scale shape: lineitem pre-collapses per block to (partkey, suppkey,
    qty) partials; ONE partkey-keyed exchange co-locates each part's
    pairs (size-gated to a single block below the threshold); inside a
    partition the dominance test is one group-merge + segment reduction;
    the per-supplier census merges through the combiner tree (bounded by
    the supplier dimension) and only that census joins the names.
    """
    import numpy as np

    from ..stages.aggregate import tree_merge
    from ..stages.shuffle import hash_partition, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/lineitem.parquet")
    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_quantity"])

    def pair_partial(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        t = pa.table({"l_partkey": b["l_partkey"],
                      "l_suppkey": b["l_suppkey"],
                      "q": pc.cast(pc.round(b["l_quantity"]), pa.int64())})
        g = t.group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])
        return g.rename_columns(["l_partkey", "l_suppkey", "q"])

    pairs = li.map_batches(pair_partial, batch_format="pyarrow",
                           batch_size=None)
    part = (hash_partition(pairs, ["l_partkey"], num_partitions)
            if mode == "shuffle" else pairs.repartition(1))

    census = part.map_batches(dominate_census_kernel,
                              batch_format="pyarrow", batch_size=None)
    merged = pa.concat_tables(list(
        tree_merge(census, ["l_suppkey"], [("n_dominated", "sum")], fanin=8)
        .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"l_suppkey": pa.array([], pa.int64()),
                   "n_dominated": pa.array([], pa.int64())})]).combine_chunks()

    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = merged.join(supp, keys=["l_suppkey"], right_keys=["s_suppkey"])
    out = pa.table({"s_suppkey": out["l_suppkey"], "s_name": out["s_name"],
                    "n_dominated": out["n_dominated"]})
    idx = pc.sort_indices(out, sort_keys=[("n_dominated", "descending"),
                                          ("s_suppkey", "ascending")])
    return out.take(idx)  # bounded; schema survives 0 rows


def dominate_census_kernel(b: pa.Table) -> pa.Table:
    """Per-partition Q20 dominance kernel over co-located (partkey,
    suppkey, q) pair partials: dominant = share above Q20_FAIR_MULT x the
    fair 1/n share (``q * n_supp > MULT * total`` exact in integers).
    Module-level so hypothesis can drive it against a brute-force oracle."""
    import numpy as np

    from .. import tune_worker_threads

    tune_worker_threads()
    if b.num_rows == 0:
        return pa.table({"l_suppkey": pa.array([], pa.int64()),
                         "n_dominated": pa.array([], pa.int64())})
    g = b.group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])
    pk = np.asarray(g["l_partkey"], dtype=np.int64)
    sk = np.asarray(g["l_suppkey"], dtype=np.int64)
    q = np.asarray(g["q_sum"], dtype=np.int64)
    order = np.argsort(pk, kind="stable")
    pk, sk, q = pk[order], sk[order], q[order]
    starts = np.concatenate(([True], pk[1:] != pk[:-1]))
    seg = np.cumsum(starts) - 1
    seg_idx = np.nonzero(starts)[0]
    tot = np.add.reduceat(q, seg_idx)
    ns = np.add.reduceat(np.ones_like(q), seg_idx)
    qual = q * ns[seg] > Q20_FAIR_MULT * tot[seg]
    t = pa.table({"l_suppkey": pa.array(sk[qual]),
                  "one": pa.array(np.ones(int(qual.sum()),
                                          dtype=np.int64))})
    g2 = t.group_by(["l_suppkey"]).aggregate([("one", "sum")])
    return g2.rename_columns(["l_suppkey", "n_dominated"])


Q20_DOMINANT_SUPPLIERS_SQL = f"""
WITH pq AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
pt AS (SELECT l_partkey, SUM(q) AS tot, COUNT(*) AS ns
       FROM pq GROUP BY l_partkey)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_dominated
FROM pq
JOIN pt ON pq.l_partkey = pt.l_partkey
JOIN supplier s ON pq.l_suppkey = s.s_suppkey
WHERE pq.q * pt.ns > {Q20_FAIR_MULT} * pt.tot
GROUP BY s.s_suppkey, s.s_name
ORDER BY n_dominated DESC, s.s_suppkey
"""


QUERIES = {
    "q11_important_parts": q11_important_parts,
    "q20_dominant_suppliers": q20_dominant_suppliers,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_order_priority": q4_order_priority,
    "q8_market_share": q8_market_share,
    "q12_linestatus_priority": q12_linestatus_priority,
    "q16_supplier_counts": q16_supplier_counts,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q_rank_customers": q_rank_customers,
    "q_first_last_order": q_first_last_order,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q7_nation_volume": q7_nation_volume,
    "q9_product_profit": q9_product_profit,
    "q10_returned_revenue": q10_returned_revenue,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q13_custdist": q13_custdist,
    "q22_idle_rich_customers": q22_idle_rich_customers,
    "q_range_window_revenue": q_range_window_revenue,
    "q18_large_orders": q18_large_orders,
    "q_3way_revenue": q_3way_revenue,
    "q_exists_urgent_clean": q_exists_urgent_clean,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q_string_agg": q_string_agg,
    "q_cube_pricing": q_cube_pricing,
    "q_grouping_sets_pricing": q_grouping_sets_pricing,
    "q_moving_avg_orders": q_moving_avg_orders,
    "q_intersect_except": q_intersect_except,
    "q_top_orders_per_customer": q_top_orders_per_customer,
    "q_ntile_orders": q_ntile_orders,
    "q_median_price_by_priority": q_median_price_by_priority,
    "q_unpivot_lineitem": q_unpivot_lineitem,
    "q_full_outer_join": q_full_outer_join,
    "q_rollup_pricing": q_rollup_pricing,
    "q_above_avg_orders": q_above_avg_orders,
    "q_pivot_lang_source": q_pivot_lang_source,
    "q1_pricing_summary": q1_pricing_summary,
    "q_orders_running_total": q_orders_running_total,
    "q3_urgent_revenue": q3_urgent_revenue,
    "q6_revenue_forecast": q6_revenue_forecast,
    "q_customer_regions": q_customer_regions,
    "q_order_lineitem_join": q_order_lineitem_join,
    "q_top_parts_by_quantity": q_top_parts_by_quantity,
    "q_orders_sort_limit": q_orders_sort_limit,
    "q_filter_project": q_filter_project,
    "q_distinct_flags": q_distinct_flags,
    "q_count_by_priority": q_count_by_priority,
    "q_union_counts": q_union_counts,
    "q_having_active_customers": q_having_active_customers,
    "q_above_average_orders": q_above_average_orders,
}

ORACLE_SQL = {
    "q11_important_parts": Q11_IMPORTANT_PARTS_SQL,
    "q20_dominant_suppliers": Q20_DOMINANT_SUPPLIERS_SQL,
    "q2_min_cost_supplier": Q2_MIN_COST_SQL,
    "q4_order_priority": Q4_ORDER_PRIORITY_SQL,
    "q8_market_share": Q8_MARKET_SHARE_SQL,
    "q12_linestatus_priority": Q12_LINESTATUS_SQL,
    "q16_supplier_counts": Q16_SUPPLIER_COUNTS_SQL,
    "q21_waiting_supplier": Q21_WAITING_SUPPLIER_SQL,
    "q_rank_customers": Q_RANK_CUSTOMERS_SQL,
    "q_first_last_order": Q_FIRST_LAST_ORDER_SQL,
    "q5_local_supplier_volume": Q5_LOCAL_SUPPLIER_SQL,
    "q7_nation_volume": Q7_NATION_VOLUME_SQL,
    "q9_product_profit": Q9_PRODUCT_PROFIT_SQL,
    "q10_returned_revenue": Q10_RETURNED_REVENUE_SQL,
    "q14_promo_revenue": Q14_PROMO_REVENUE_SQL,
    "q15_top_supplier": Q15_TOP_SUPPLIER_SQL,
    "q19_discounted_revenue": Q19_DISCOUNTED_REVENUE_SQL,
    "q13_custdist": Q13_CUSTDIST_SQL,
    "q22_idle_rich_customers": Q22_IDLE_RICH_SQL,
    "q_range_window_revenue": Q_RANGE_WINDOW_SQL,
    "q18_large_orders": Q18_LARGE_ORDERS_SQL,
    "q_3way_revenue": Q_3WAY_REVENUE_SQL,
    "q_exists_urgent_clean": Q_EXISTS_URGENT_CLEAN_SQL,
    "q17_small_quantity_revenue": Q17_SMALL_QTY_SQL,
    "q_string_agg": Q_STRING_AGG_SQL,
    "q_cube_pricing": Q_CUBE_SQL,
    "q_grouping_sets_pricing": Q_GROUPING_SETS_SQL,
    "q_moving_avg_orders": Q_MOVING_AVG_SQL,
    "q_intersect_except": Q_INTERSECT_EXCEPT_SQL,
    "q_top_orders_per_customer": Q_TOP_ORDERS_PER_CUSTOMER_SQL,
    "q_ntile_orders": Q_NTILE_ORDERS_SQL,
    "q_median_price_by_priority": Q_MEDIAN_PRICE_SQL,
    "q_unpivot_lineitem": Q_UNPIVOT_SQL,
    "q_full_outer_join": Q_FULL_OUTER_JOIN_SQL,
    "q_rollup_pricing": Q_ROLLUP_PRICING_SQL,
    "q_above_avg_orders": Q_ABOVE_AVG_ORDERS_SQL,
    "q_pivot_lang_source": Q_PIVOT_LANG_SOURCE_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q_orders_running_total": Q_ORDERS_RUNNING_TOTAL_SQL,
    "q3_urgent_revenue": Q3_URGENT_REVENUE_SQL,
    "q6_revenue_forecast": Q6_SQL,
    "q_customer_regions": Q_CUSTOMER_REGIONS_SQL,
    "q_order_lineitem_join": Q_ORDER_LINEITEM_SQL,
    "q_top_parts_by_quantity": Q_TOP_PARTS_SQL,
    "q_orders_sort_limit": Q_ORDERS_SORT_SQL,
    "q_filter_project": Q_FILTER_PROJECT_SQL,
    "q_distinct_flags": Q_DISTINCT_SQL,
    "q_count_by_priority": Q_COUNT_PRIORITY_SQL,
    "q_union_counts": Q_UNION_SQL,
    "q_having_active_customers": Q_HAVING_SQL,
    "q_above_average_orders": Q_ABOVE_AVG_SQL,
}
