"""Round-4 continuation operators, batch 7: the TPC-H fill-in set (Q7, Q9,
Q10, Q14, Q15, Q19), the RANK/DENSE_RANK and FIRST/LAST_VALUE window
shapes, and soft dedup (duplicate down-weighting).

Engineered tables pin the edges the generated corpus cannot guarantee —
rank ties, negative balances, equal-date order tiebreaks, max-revenue
ties, predicate boundaries, and both size-gated regimes; generated-data
tests pin DuckDB parity end-to-end."""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write(tmp_path, name, table):
    pq.write_table(table, tmp_path / f"{name}.parquet")


def _duck(sf_dir, tables, sql):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def _customers(rows):
    """rows: (custkey, mktsegment, acctbal)."""
    return pa.table({
        "c_custkey": pa.array([r[0] for r in rows], type=pa.int64()),
        "c_name": pa.array([f"c{r[0]}" for r in rows]),
        "c_nationkey": pa.array([0] * len(rows), type=pa.int32()),
        "c_acctbal": pa.array([float(r[2]) for r in rows]),
        "c_mktsegment": pa.array([r[1] for r in rows]),
    })


def _orders(rows):
    """rows: (orderkey, custkey, totalprice, date)."""
    return pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], type=pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows)),
        "o_totalprice": pa.array([float(r[2]) for r in rows]),
        "o_orderdate": pa.array([r[3] for r in rows], type=pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
    })


@pytest.mark.usefixtures("ray_session")
class TestRankCustomers:
    def test_ties_negatives_and_singleton(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import q_rank_customers

        # seg A: 500.00 twice (tie), 100.00, -99.99 (negative) -> RANK
        # 1,1,3,4; DENSE 1,1,2,3.  seg B: one member -> rank 1/1, n_seg 1.
        _write(tmp_path, "customer", _customers([
            (1, "A", 500.0), (2, "A", 500.0), (3, "A", 100.0),
            (4, "A", -99.99), (5, "B", 7.5)]))
        got = (q_rank_customers(str(tmp_path)).to_pandas()
               .sort_values("c_custkey").reset_index(drop=True))
        assert got.bal_rank.tolist() == [1, 1, 3, 4, 1]
        assert got.bal_dense_rank.tolist() == [1, 1, 2, 3, 1]
        assert got.n_seg.tolist() == [4, 4, 4, 4, 1]

    def test_empty_corpus_keeps_schema(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import q_rank_customers

        _write(tmp_path, "customer", _customers([]))
        got = q_rank_customers(str(tmp_path)).to_pandas()
        assert len(got) == 0
        assert list(got.columns) == ["c_custkey", "c_mktsegment", "bal_rank",
                                     "bal_dense_rank", "n_seg"]

    def test_matches_duckdb_on_generated(self):
        from logparse_rs_ray.pipelines.relational import (
            Q_RANK_CUSTOMERS_SQL, q_rank_customers)

        got = (q_rank_customers(SF).to_pandas()
               .sort_values("c_custkey").reset_index(drop=True))
        want = _duck(SF, ["customer"], Q_RANK_CUSTOMERS_SQL)
        assert got.values.tolist() == want.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestFirstLastOrder:
    def test_tiebreak_and_singleton(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import q_first_last_order

        d1 = datetime.datetime(2024, 1, 1)
        d2 = datetime.datetime(2024, 6, 1)
        # cust 1: equal-date orders 10/11 -> orderkey breaks the tie both
        # ends; cust 2: one order -> first == last
        _write(tmp_path, "orders", _orders([
            (11, 1, 222.0, d1), (10, 1, 111.0, d1), (12, 1, 333.0, d2),
            (20, 2, 55.0, d1)]))
        got = (q_first_last_order(str(tmp_path)).to_pandas()
               .sort_values("o_custkey").reset_index(drop=True))
        assert got.values.tolist() == [[1, 11100, 33300, 3], [2, 5500, 5500, 1]]

    def test_regimes_agree_and_match_duckdb(self):
        from logparse_rs_ray.pipelines.relational import (
            Q_FIRST_LAST_ORDER_SQL, q_first_last_order)

        tree = (q_first_last_order(SF, mode="tree").to_pandas()
                .sort_values("o_custkey").reset_index(drop=True))
        shuf = (q_first_last_order(SF, mode="shuffle").to_pandas()
                .sort_values("o_custkey").reset_index(drop=True))
        want = _duck(SF, ["orders"], Q_FIRST_LAST_ORDER_SQL)
        assert tree.values.tolist() == want.values.tolist()
        assert shuf.values.tolist() == want.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestTpchFillIns:
    def test_q7_matches_duckdb(self):
        from logparse_rs_ray.pipelines.relational import (
            Q7_NATION_VOLUME_SQL, q7_nation_volume)

        got = q7_nation_volume(SF).to_pandas()
        want = _duck(SF, ["lineitem", "supplier", "nation", "orders",
                          "customer"], Q7_NATION_VOLUME_SQL)
        assert got.values.tolist() == want.values.tolist()
        # same-nation trade must be excluded
        assert (got.supp_nation != got.cust_nation).all()

    def test_q9_matches_duckdb(self):
        from logparse_rs_ray.pipelines.relational import (
            Q9_PRODUCT_PROFIT_SQL, q9_product_profit)

        got = q9_product_profit(SF).to_pandas()
        want = _duck(SF, ["lineitem", "part", "supplier", "nation",
                          "orders"], Q9_PRODUCT_PROFIT_SQL)
        assert got.values.tolist() == want.values.tolist()

    def test_q10_matches_duckdb(self):
        from logparse_rs_ray.pipelines.relational import (
            Q10_RETURNED_REVENUE_SQL, q10_returned_revenue)

        got = q10_returned_revenue(SF).to_pandas()
        want = _duck(SF, ["customer", "orders", "lineitem", "nation"],
                     Q10_RETURNED_REVENUE_SQL)
        assert got.values.tolist() == want.values.tolist()
        assert len(got) == 20
        # descending revenue with custkey tiebreak
        r = got.revenue_x10k.tolist()
        assert r == sorted(r, reverse=True)

    def test_q14_and_q19_single_row(self):
        from logparse_rs_ray.pipelines.relational import (
            Q14_PROMO_REVENUE_SQL, Q19_DISCOUNTED_REVENUE_SQL,
            q14_promo_revenue, q19_discounted_revenue)

        got14 = q14_promo_revenue(SF).to_pandas()
        want14 = _duck(SF, ["lineitem", "part"], Q14_PROMO_REVENUE_SQL)
        assert got14.values.tolist() == want14.values.tolist()
        assert 0 < got14.promo_x10k[0] < got14.total_x10k[0]

        got19 = q19_discounted_revenue(SF).to_pandas()
        want19 = _duck(SF, ["lineitem", "part"], Q19_DISCOUNTED_REVENUE_SQL)
        assert got19.values.tolist() == want19.values.tolist()

    def test_q15_surfaces_all_ties(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import q15_top_supplier

        d = datetime.datetime(1996, 2, 1)
        n = 4
        _write(tmp_path, "lineitem", pa.table({
            "l_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
            "l_partkey": pa.array([1] * n, type=pa.int64()),
            "l_suppkey": pa.array([7, 8, 8, 9], type=pa.int64()),
            "l_linenumber": pa.array([1] * n, type=pa.int32()),
            "l_quantity": pa.array([1.0] * n),
            # supp 7: 200; supp 8: 100+100 = 200 (tie); supp 9: 50
            "l_extendedprice": pa.array([200.0, 100.0, 100.0, 50.0]),
            "l_discount": pa.array([0.0] * n),
            "l_tax": pa.array([0.0] * n),
            "l_returnflag": pa.array(["N"] * n),
            "l_linestatus": pa.array(["O"] * n),
            "l_shipdate": pa.array([d] * n, type=pa.timestamp("us")),
        }))
        _write(tmp_path, "supplier", pa.table({
            "s_suppkey": pa.array([7, 8, 9], type=pa.int64()),
            "s_name": pa.array(["s7", "s8", "s9"]),
            "s_nationkey": pa.array([0, 0, 0], type=pa.int32()),
            "s_acctbal": pa.array([0.0, 0.0, 0.0]),
        }))
        got = q15_top_supplier(str(tmp_path)).to_pandas()
        assert got.values.tolist() == [[7, "s7", 2000000], [8, "s8", 2000000]]

    def test_q15_matches_duckdb_on_generated(self):
        from logparse_rs_ray.pipelines.relational import (
            Q15_TOP_SUPPLIER_SQL, q15_top_supplier)

        got = q15_top_supplier(SF).to_pandas()
        want = _duck(SF, ["lineitem", "supplier"], Q15_TOP_SUPPLIER_SQL)
        assert got.values.tolist() == want.values.tolist()


def _lineitems_rsf(rows):
    """rows: (orderkey, suppkey, returnflag)."""
    n = len(rows)
    return pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
        "l_partkey": pa.array([1] * n, type=pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], type=pa.int64()),
        "l_linenumber": pa.array(list(range(1, n + 1)), type=pa.int32()),
        "l_quantity": pa.array([1.0] * n),
        "l_extendedprice": pa.array([1.0] * n),
        "l_discount": pa.array([0.0] * n),
        "l_tax": pa.array([0.0] * n),
        "l_returnflag": pa.array([r[2] for r in rows]),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([datetime.datetime(1996, 1, 1)] * n,
                               type=pa.timestamp("us")),
    })


@pytest.mark.usefixtures("ray_session")
class TestQ21WaitingSupplier:
    def test_blame_rules(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import q21_waiting_supplier

        # order 1: supp 7 has 2 R rows, supp 8 clean -> supp 7 blamed, +2
        # order 2: supps 7 and 8 BOTH have R -> nobody blamed
        # order 3: single-supplier order with R -> no co-supplier, skip
        # order 4: supp 8 R among clean 7 -> supp 8 blamed, +1
        _write(tmp_path, "lineitem", _lineitems_rsf([
            (1, 7, "R"), (1, 7, "R"), (1, 8, "N"),
            (2, 7, "R"), (2, 8, "R"),
            (3, 7, "R"),
            (4, 8, "R"), (4, 7, "N")]))
        _write(tmp_path, "supplier", pa.table({
            "s_suppkey": pa.array([7, 8], type=pa.int64()),
            "s_name": pa.array(["s7", "s8"]),
            "s_nationkey": pa.array([0, 0], type=pa.int32()),
            "s_acctbal": pa.array([0.0, 0.0]),
        }))
        for mode in ("tree", "shuffle"):
            got = q21_waiting_supplier(str(tmp_path), mode=mode).to_pandas()
            assert got.values.tolist() == [["s7", 2], ["s8", 1]]

    def test_matches_duckdb_on_generated(self):
        from logparse_rs_ray.pipelines.relational import (
            Q21_WAITING_SUPPLIER_SQL, q21_waiting_supplier)

        got = q21_waiting_supplier(SF).to_pandas()
        want = _duck(SF, ["supplier", "lineitem"], Q21_WAITING_SUPPLIER_SQL)
        assert got.values.tolist() == want.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestQ2MinCostSupplier:
    def test_min_tiebreak_and_negative_balance(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import q2_min_cost_supplier

        # part 1 shipped by supps 7 (-5.00) and 8 (10.00) -> 7 wins with a
        # NEGATIVE balance; part 2 by supps 8 and 9 tied at 10.00 -> the
        # smaller suppkey 8 wins; part 3 has the wrong size -> excluded
        _write(tmp_path, "lineitem", pa.table({
            "l_orderkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "l_partkey": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
            "l_suppkey": pa.array([7, 8, 8, 9, 7], type=pa.int64()),
            "l_linenumber": pa.array([1] * 5, type=pa.int32()),
            "l_quantity": pa.array([1.0] * 5),
            "l_extendedprice": pa.array([1.0] * 5),
            "l_discount": pa.array([0.0] * 5),
            "l_tax": pa.array([0.0] * 5),
            "l_returnflag": pa.array(["N"] * 5),
            "l_linestatus": pa.array(["O"] * 5),
            "l_shipdate": pa.array([datetime.datetime(1996, 1, 1)] * 5,
                                   type=pa.timestamp("us")),
        }))
        _write(tmp_path, "supplier", pa.table({
            "s_suppkey": pa.array([7, 8, 9], type=pa.int64()),
            "s_name": pa.array(["s7", "s8", "s9"]),
            "s_nationkey": pa.array([0] * 3, type=pa.int32()),
            "s_acctbal": pa.array([-5.0, 10.0, 10.0]),
        }))
        _write(tmp_path, "part", pa.table({
            "p_partkey": pa.array([1, 2, 3], type=pa.int64()),
            "p_name": pa.array(["a", "b", "c"]),
            "p_brand": pa.array(["Brand#1"] * 3),
            "p_type": pa.array(["STANDARD"] * 3),
            "p_size": pa.array([15, 15, 7], type=pa.int32()),
            "p_retailprice": pa.array([1.0] * 3),
        }))
        got = q2_min_cost_supplier(str(tmp_path)).to_pandas()
        # ordered by acct desc: part 2 (1000) before part 1 (-500)
        assert got.values.tolist() == [[2, 8, 1000], [1, 7, -500]]

    def test_matches_duckdb_on_generated(self):
        from logparse_rs_ray.pipelines.relational import (
            Q2_MIN_COST_SQL, q2_min_cost_supplier)

        got = q2_min_cost_supplier(SF).to_pandas()
        want = _duck(SF, ["lineitem", "part", "supplier"], Q2_MIN_COST_SQL)
        assert got.values.tolist() == want.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestTpchFillIns2:
    def test_q4_q12_q16_match_duckdb(self):
        from logparse_rs_ray.pipelines.relational import (
            Q4_ORDER_PRIORITY_SQL, Q12_LINESTATUS_SQL,
            Q16_SUPPLIER_COUNTS_SQL, q4_order_priority,
            q12_linestatus_priority, q16_supplier_counts)

        assert (q4_order_priority(SF).to_pandas().values.tolist() ==
                _duck(SF, ["orders", "lineitem"],
                      Q4_ORDER_PRIORITY_SQL).values.tolist())
        assert (q12_linestatus_priority(SF).to_pandas().values.tolist() ==
                _duck(SF, ["lineitem", "orders"],
                      Q12_LINESTATUS_SQL).values.tolist())
        assert (q16_supplier_counts(SF).to_pandas().values.tolist() ==
                _duck(SF, ["lineitem", "part"],
                      Q16_SUPPLIER_COUNTS_SQL).values.tolist())

    def test_q8_share_bounds(self):
        from logparse_rs_ray.pipelines.relational import (
            Q8_MARKET_SHARE_SQL, q8_market_share)

        got = q8_market_share(SF).to_pandas()
        want = _duck(SF, ["lineitem", "supplier", "nation", "orders",
                          "customer", "region"], Q8_MARKET_SHARE_SQL)
        assert got.values.tolist() == want.values.tolist()
        assert (got.nation_x10k <= got.total_x10k).all()


@pytest.mark.usefixtures("ray_session")
class TestQ11Q20:
    def test_q20_fair_share_boundary(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import q20_dominant_suppliers

        # part 1: supps 7/8/9 ship 6/2/1 (tot 9, ns 3): 6*3 = 2*9 exactly
        # -> NOT dominant (strict >).  part 2: supps 7/8 ship 9/1 (tot 10,
        # ns 2): 9*2 = 18 < 20 -> no.  part 3: supps 7/8/9 ship 7/1/1
        # (tot 9, ns 3): 7*3 = 21 > 18 -> supp 7 dominates one part.
        rows = [(1, 7, 6.0), (1, 8, 2.0), (1, 9, 1.0),
                (2, 7, 9.0), (2, 8, 1.0),
                (3, 7, 7.0), (3, 8, 1.0), (3, 9, 1.0)]
        n = len(rows)
        _write(tmp_path, "lineitem", pa.table({
            "l_orderkey": pa.array(list(range(n)), type=pa.int64()),
            "l_partkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "l_suppkey": pa.array([r[1] for r in rows], type=pa.int64()),
            "l_linenumber": pa.array([1] * n, type=pa.int32()),
            "l_quantity": pa.array([r[2] for r in rows]),
            "l_extendedprice": pa.array([1.0] * n),
            "l_discount": pa.array([0.0] * n),
            "l_tax": pa.array([0.0] * n),
            "l_returnflag": pa.array(["N"] * n),
            "l_linestatus": pa.array(["O"] * n),
            "l_shipdate": pa.array([datetime.datetime(1996, 1, 1)] * n,
                                   type=pa.timestamp("us")),
        }))
        _write(tmp_path, "supplier", pa.table({
            "s_suppkey": pa.array([7, 8, 9], type=pa.int64()),
            "s_name": pa.array(["s7", "s8", "s9"]),
            "s_nationkey": pa.array([0] * 3, type=pa.int32()),
            "s_acctbal": pa.array([0.0] * 3),
        }))
        for mode in ("tree", "shuffle"):
            got = q20_dominant_suppliers(str(tmp_path), mode=mode).to_pandas()
            assert got.values.tolist() == [[7, "s7", 1]]

    def test_q11_q20_match_duckdb(self):
        from logparse_rs_ray.pipelines.relational import (
            Q11_IMPORTANT_PARTS_SQL, Q20_DOMINANT_SUPPLIERS_SQL,
            q11_important_parts, q20_dominant_suppliers)

        got11 = q11_important_parts(SF).to_pandas()
        want11 = _duck(SF, ["lineitem", "supplier", "nation"],
                       Q11_IMPORTANT_PARTS_SQL)
        assert got11.values.tolist() == want11.values.tolist()
        assert len(got11) > 0  # NATION_19 has suppliers at every scale

        got20 = q20_dominant_suppliers(SF).to_pandas()
        want20 = _duck(SF, ["lineitem", "supplier"],
                       Q20_DOMINANT_SUPPLIERS_SQL)
        assert got20.values.tolist() == want20.values.tolist()
        assert len(got20) > 0


@pytest.mark.usefixtures("ray_session")
class TestBurstCensus:
    def _events(self, rows):
        """rows: (event_id, user_id, ts_us)."""
        return pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        })

    def test_window_edges_and_peers(self, tmp_path):
        from logparse_rs_ray.pipelines.windows import log_burst_census

        base = 1_700_000_000_000_000  # µs
        w = 60  # seconds
        rows = [
            # user 1: events at 0s, 60s (exactly in range — RANGE is
            # inclusive), 121s -> max burst 2
            (1, 1, base), (2, 1, base + 60_000_000),
            (3, 1, base + 121_000_000),
            # user 2: three equal-ts events (peers share one frame) -> 3
            (4, 2, base), (5, 2, base), (6, 2, base),
            # user 3: singleton -> 1
            (7, 3, base),
            # user 4: 0s, 60.000001s (just outside) -> 1
            (8, 4, base), (9, 4, base + 60_000_001),
        ]
        pq.write_table(self._events(rows), tmp_path / "events.parquet")
        for mode in ("tree", "shuffle"):
            got = (log_burst_census(str(tmp_path), window_s=w, mode=mode)
                   .to_pandas().sort_values("user_id").reset_index(drop=True))
            assert got.values.tolist() == [[1, 2], [2, 3], [3, 1], [4, 1]]

    def test_matches_duckdb_on_generated(self):
        from logparse_rs_ray.pipelines.windows import (
            LOG_BURST_CENSUS_SQL, log_burst_census)

        for mode in ("tree", "shuffle"):
            got = (log_burst_census(SF, mode=mode).to_pandas()
                   .sort_values("user_id").reset_index(drop=True))
            want = _duck(SF, ["events"], LOG_BURST_CENSUS_SQL)
            assert got.values.tolist() == want.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestWindowedFunnel:
    def _events(self, rows):
        """rows: (event_id, user_id, event_type, ts_us)."""
        return pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[3] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        })

    def test_window_boundary_inclusive(self, tmp_path):
        from logparse_rs_ray.pipelines.windows import log_funnel_windowed

        base = 1_700_000_000_000_000
        h = 3_600_000_000
        rows = [
            # user 1 converts exactly AT the 72h edge (inclusive <=)
            (1, 1, "signup", base), (2, 1, "click", base + 72 * h),
            # user 2 clicks one µs past the edge -> not converted
            (3, 2, "signup", base), (4, 2, "click", base + 72 * h + 1),
            # user 3 full chain inside windows
            (5, 3, "signup", base), (6, 3, "click", base + h),
            (7, 3, "purchase", base + 2 * h),
        ]
        pq.write_table(self._events(rows), tmp_path / "events.parquet")
        for mode in ("tree", "shuffle"):
            got = log_funnel_windowed(str(tmp_path), mode=mode).to_pandas()
            assert got.n_users.tolist() == [3, 2, 1]

    def test_window_tighter_than_unbounded_on_generated(self):
        from logparse_rs_ray.pipelines.windows import (
            LOG_FUNNEL_WINDOWED_SQL, log_funnel, log_funnel_windowed)

        wf = log_funnel_windowed(SF).to_pandas()
        want = _duck(SF, ["events"], LOG_FUNNEL_WINDOWED_SQL)
        assert wf.values.tolist() == want.values.tolist()
        uf = log_funnel(SF).to_pandas()
        assert (wf.n_users <= uf.n_users).all()
        assert wf.n_users.iloc[0] == uf.n_users.iloc[0]  # stage 1 unbounded


@pytest.mark.usefixtures("ray_session")
class TestNextEventAccuracy:
    def test_split_boundary_and_tiebreak(self, tmp_path):
        from logparse_rs_ray.pipelines.windows import log_next_event_accuracy

        import datetime as dt

        def t(day, h=0):
            return dt.datetime(2024, 1, day, h)

        # user 1 (train): view->click, view->error (tie 1-1: pred 'click'
        # lexicographically); transition AT the split goes to EVAL (< is
        # strict).  user 2 (eval): view->click (correct), view->error
        # (wrong).
        rows = [
            (1, 1, "view", t(2)), (2, 1, "click", t(3)),
            (3, 1, "view", t(4)), (4, 1, "error", t(5)),
            (5, 1, "view", t(15, 23)), (6, 1, "click", t(16)),  # eval (==)
            (7, 2, "view", t(20)), (8, 2, "click", t(21)),
            (9, 2, "view", t(22)), (10, 2, "error", t(23)),
        ]
        pq.write_table(pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[3] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }), tmp_path / "events.parquet")
        for mode in ("tree", "shuffle"):
            got = log_next_event_accuracy(str(tmp_path), mode=mode) \
                .to_pandas()
            # model: view->click (1-1 tie, lexicographic), click->view,
            # error->view.  eval: view 3 transitions (boundary ->click
            # correct, ->click correct, ->error wrong) = 2/3; click 1
            # transition ->view correct = 1/1; error has no eval rows.
            assert got.values.tolist() == [["click", 1, 1], ["view", 3, 2]]

    def test_matches_duckdb_on_generated(self):
        from logparse_rs_ray.pipelines.windows import (
            LOG_NEXT_EVENT_ACCURACY_SQL, log_next_event_accuracy)

        got = log_next_event_accuracy(SF).to_pandas()
        want = _duck(SF, ["events"], LOG_NEXT_EVENT_ACCURACY_SQL)
        assert got.values.tolist() == want.values.tolist()
        assert (got.n_correct <= got.n_eval).all()


@pytest.mark.usefixtures("ray_session")
class TestSeasonalNaiveEval:
    def test_lag_join_and_missing_baseline(self, tmp_path):
        import datetime as dt

        from logparse_rs_ray.pipelines.logops import log_seasonal_naive_eval

        base = dt.datetime(2024, 1, 1, 0)
        week = dt.timedelta(hours=168)
        # hour H: 3 events; hour H+1w: 1 event (err 2); hour H2+1w has NO
        # baseline hour -> skipped
        rows = ([base] * 3 + [base + week] * 1 +
                [base + week + dt.timedelta(hours=5)] * 4)
        pq.write_table(pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(rows, pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }), tmp_path / "events.parquet")
        got = log_seasonal_naive_eval(str(tmp_path)).to_pandas()
        assert got.values.tolist() == [[1, 2, 1]]

    def test_matches_duckdb_on_generated(self):
        from logparse_rs_ray.pipelines.logops import (
            LOG_SEASONAL_NAIVE_SQL, log_seasonal_naive_eval)

        got = log_seasonal_naive_eval(SF).to_pandas()
        want = _duck(SF, ["events"], LOG_SEASONAL_NAIVE_SQL)
        assert got.values.tolist() == want.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestCompressibility:
    def test_matches_serial_zlib(self):
        import zlib

        import pyarrow.parquet as _pq

        from logparse_rs_ray.pipelines.textops import (
            ZLIB_LEVEL, doc_compressibility)

        got = (doc_compressibility(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        tbl = _pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
        assert len(got) == len(texts)
        for _, row in got.sample(50, random_state=7).iterrows():
            raw = texts[row.doc_id].encode()
            assert row.text_bytes == len(raw)
            assert row.zlib_bytes == len(zlib.compress(raw, ZLIB_LEVEL))
        # repetitive word-soup text must actually compress
        assert (got.zlib_bytes < got.text_bytes).mean() > 0.9


@pytest.mark.usefixtures("ray_session")
class TestAnnRecallCensus:
    def test_bounds_and_pq_exactness(self):
        from logparse_rs_ray.pipelines.similarity import (
            N_QUERIES, ann_recall_census)

        df = ann_recall_census(SF).to_pandas()
        assert len(df) == 3 * N_QUERIES
        assert set(df.method) == {"ivf", "lsh", "pq"}
        assert df.recall_pct.between(0, 100).all()
        # PQ re-ranks its shortlist with exact cosine; the shortlist
        # usually covers the true top-k here, but codebook training
        # samples depend on block arrival order — floor, don't pin
        assert df[df.method == "pq"].recall_pct.mean() >= 60

    def test_exact_self_recall_is_100(self):
        from logparse_rs_ray.pipelines import similarity as sim

        exact = sim.ann_topk_cosine(SF)
        t = (exact if hasattr(exact, "to_pandas") else exact).to_pandas()
        # sanity for the census arithmetic: intersecting the exact result
        # with itself must give k hits per query
        g = t.groupby("query_id").vec_id.nunique()
        assert (g == sim.TOP_K).all()


@pytest.mark.usefixtures("ray_session")
class TestBm25TopK:
    def test_matches_serial_replica(self):
        import numpy as np
        import pyarrow.parquet as _pq

        from logparse_rs_ray.pipelines.textops import (
            BM25_B, BM25_K1, BM25_TERMS, doc_bm25_topk)

        got = doc_bm25_topk(SF).to_pandas()
        tbl = _pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        ids = tbl["doc_id"].to_pylist()
        docs = [t.lower().split() for t in tbl["text"].to_pylist()]
        n = len(docs)
        avgdl = sum(len(d) for d in docs) / n
        dfs = np.array([sum(1 for d in docs if t in d) for t in BM25_TERMS],
                       dtype=np.float64)
        idf = np.log(1.0 + (n - dfs + 0.5) / (dfs + 0.5))
        rows = []
        for i, d in enumerate(docs):
            dl = float(len(d))
            denom_base = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            score = 0.0
            for ti, t in enumerate(BM25_TERMS):
                tf = float(d.count(t))
                score += idf[ti] * tf * (BM25_K1 + 1.0) / (tf + denom_base)
            rows.append((ids[i], int(np.floor(score * 1e6))))
        rows.sort(key=lambda r: (-r[1], r[0]))
        assert got.values.tolist() == [list(r) for r in rows[:len(got)]]
        assert len(got) == 10

    def test_term_absence_scores_zero(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_bm25_topk

        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["nothing relevant here", "also irrelevant"]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["w", "w"]),
            "n_chars": pa.array([21, 15], pa.int64()),
        }), tmp_path / "documents.parquet")
        got = doc_bm25_topk(str(tmp_path), k=5).to_pandas()
        assert got.score_x1e6.tolist() == [0, 0]


@pytest.mark.usefixtures("ray_session")
class TestMinhashAccuracy:
    def test_exact_dup_pairs_estimate_100(self, tmp_path):
        from logparse_rs_ray.pipelines.dedup import dedup_minhash_accuracy

        text = "alpha beta gamma delta epsilon zeta eta theta " * 4
        other = "one two three four five six seven eight nine ten " * 4
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([text, text, other]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["w"] * 3),
            "n_chars": pa.array([len(text), len(text), len(other)],
                                pa.int64()),
        }), tmp_path / "documents.parquet")
        got = dedup_minhash_accuracy(str(tmp_path)).to_pandas()
        dup = got[(got.doc_a == 1) & (got.doc_b == 2)]
        assert len(dup) == 1
        assert dup.true_pct.iloc[0] == 100
        assert dup.est_pct.iloc[0] == 100
        assert dup.abs_err_pct.iloc[0] == 0

    def test_estimator_error_bounded_on_generated(self):
        from logparse_rs_ray.pipelines.dedup import dedup_minhash_accuracy

        df = dedup_minhash_accuracy(SF).to_pandas()
        assert len(df) > 0
        assert df.est_pct.between(0, 100).all()
        # 64 permutations -> sigma ~= 6.25 pct; mean |err| well inside
        assert df.abs_err_pct.mean() <= 15
        assert (df.abs_err_pct == (df.est_pct - df.true_pct).abs()).all()

    def test_bbit_variant_pins_dups_and_bounds_error(self, tmp_path):
        from logparse_rs_ray.pipelines.dedup import (
            dedup_minhash_accuracy, dedup_minhash_bbit_accuracy)

        # exact dup pair: every low bit matches -> m=1 -> debiased est 100
        text = "alpha beta gamma delta epsilon zeta eta theta " * 4
        other = "one two three four five six seven eight nine ten " * 4
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([text, text, other]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["w"] * 3),
            "n_chars": pa.array([len(text), len(text), len(other)],
                                pa.int64()),
        }), tmp_path / "documents.parquet")
        got = dedup_minhash_bbit_accuracy(str(tmp_path)).to_pandas()
        dup = got[(got.doc_a == 1) & (got.doc_b == 2)]
        assert dup.est_pct.iloc[0] == 100 and dup.abs_err_pct.iloc[0] == 0
        # generated corpus: 1-bit estimator is noisier than full-width but
        # still debiased — bound, don't pin
        df = dedup_minhash_bbit_accuracy(SF).to_pandas()
        full = dedup_minhash_accuracy(SF).to_pandas()
        assert len(df) == len(full)
        assert df.est_pct.between(0, 100).all()
        assert df.abs_err_pct.mean() <= 30


@pytest.mark.usefixtures("ray_session")
class TestPmiPhrases:
    def test_matches_serial_replica_and_regimes_agree(self):
        import math
        from collections import Counter

        import numpy as np
        import pyarrow.parquet as _pq

        from logparse_rs_ray.pipelines.textops import (
            PMI_MIN_COUNT, PMI_TOP_N, doc_pmi_phrases)

        tbl = _pq.read_table(f"{SF}/documents.parquet", columns=["text"])
        uni: Counter = Counter()
        big: Counter = Counter()
        for t in tbl["text"].to_pylist():
            toks = [w for w in t.lower().split() if w]
            uni.update(toks)
            big.update(zip(toks, toks[1:]))
        n_uni, n_big = sum(uni.values()), sum(big.values())
        log_const = 2 * math.log(n_uni) - math.log(n_big)
        rows = []
        for (a, c), n in big.items():
            if n < PMI_MIN_COUNT:
                continue
            pmi = (np.log(np.float64(n)) - np.log(np.float64(uni[a]))
                   - np.log(np.float64(uni[c])) + log_const)
            rows.append((f"{a} {c}", n,
                         int(np.floor(pmi * 1000))))
        rows.sort(key=lambda r: (-r[2], r[0]))
        want = [list(r) for r in rows[:PMI_TOP_N]]
        for mode in ("tree", "shuffle"):
            got = doc_pmi_phrases(SF, mode=mode).to_pandas()
            assert got.values.tolist() == want, mode


    def test_small_corpus_is_still_rank_ordered(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_pmi_phrases

        # fewer qualifying bigrams than top_n: the final block must STILL
        # come out (-pmi, bigram)-ordered (review finding: the early
        # return leaked partition-concatenation order)
        texts = (["alpha beta"] * 12 + ["gamma delta"] * 12 +
                 ["alpha delta"] * 12 + ["alpha beta gamma delta"] * 12)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["w"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }), tmp_path / "documents.parquet")
        got = doc_pmi_phrases(str(tmp_path)).to_pandas()
        assert 0 < len(got) < 30
        ranks = list(zip(-got.pmi_x1000, got.bigram))
        assert ranks == sorted(ranks)


@pytest.mark.usefixtures("ray_session")
class TestSplitAssign:
    def test_matches_duckdb_and_proportions(self):
        from logparse_rs_ray.pipelines.textops import (
            DOC_SPLIT_ASSIGN_SQL, doc_split_assign)

        got = (doc_split_assign(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = _duck(SF, ["documents"], DOC_SPLIT_ASSIGN_SQL)
        assert got.values.tolist() == want.values.tolist()
        frac = got.split.value_counts(normalize=True)
        assert 0.7 < frac.get("train", 0) < 0.9
        assert frac.get("val", 0) > 0 and frac.get("test", 0) > 0

    def test_deterministic_and_salt_sensitive(self):
        from logparse_rs_ray.pipelines.textops import doc_split_assign

        a = (doc_split_assign(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (doc_split_assign(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b)  # re-derivable without state
        c = (doc_split_assign(SF, salt=1).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert not a.split.equals(c.split)  # salt actually enters the hash


@pytest.mark.usefixtures("ray_session")
class TestSoftDedupWeights:
    def _docs(self, texts):
        return pa.table({
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["web"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        })

    def test_counts_and_regimes(self, tmp_path):
        from logparse_rs_ray.pipelines.dedup import doc_soft_dedup_weights

        _write(tmp_path, "documents",
               self._docs(["a", "b", "a", "c", "a", "b"]))
        for mode in ("tree", "shuffle"):
            got = (doc_soft_dedup_weights(str(tmp_path), mode=mode)
                   .to_pandas().sort_values("doc_id").reset_index(drop=True))
            assert got.dup_count.tolist() == [3, 2, 3, 1, 3, 2]

    def test_auto_falls_back_to_shuffle_over_broadcast_cap(self, tmp_path):
        from logparse_rs_ray.pipelines.dedup import doc_soft_dedup_weights

        # tree regime with a distinct-hash table over the cap must pick
        # the co-located shuffle plan, not raise (review finding)
        _write(tmp_path, "documents",
               self._docs(["a", "b", "a", "c", "a", "b"]))
        got = (doc_soft_dedup_weights(str(tmp_path), mode="tree",
                                      broadcast_max_keys=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got.dup_count.tolist() == [3, 2, 3, 1, 3, 2]

    def test_matches_duckdb_on_generated(self):
        from logparse_rs_ray.pipelines.dedup import (
            DOC_SOFT_DEDUP_SQL, doc_soft_dedup_weights)

        got = (doc_soft_dedup_weights(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = _duck(SF, ["documents"], DOC_SOFT_DEDUP_SQL)
        assert got.values.tolist() == want.values.tolist()
        # every document is annotated, none dropped
        assert len(got) == 500
