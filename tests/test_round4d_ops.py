"""Round-4 continuation operators, batch 4: cosine range search, the
EXISTS/NOT-EXISTS correlated-subquery shape, and the TPC-H Q17
correlated-aggregate shape.

Each test pins the operator against a serial Python/DuckDB oracle on an
engineered corpus covering edges the generated tables may not hit: vectors
exactly on the similarity radius, customers with every flag combination
(urgent+F, urgent-only, F-only, neither, no orders at all), and lineitems
exactly on the 20%-of-average quantity boundary."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# --- ann_range_search -------------------------------------------------------

def _write_embeddings(tmp_path, vecs):
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), type=pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestAnnRangeSearch:
    def test_radius_and_self_exclusion(self, tmp_path):
        from logparse_rs_ray.pipelines.similarity import ann_range_search

        # query 0 = e_x.  vec 3 at cos=1 (parallel), vec 4 at cos~0.6,
        # vec 5 exactly orthogonal, vec 6 anti-parallel.  Queries 1/2 are
        # e_y/e_z so their neighbor sets differ.
        vecs = [
            [1, 0, 0, 0],            # query 0
            [0, 1, 0, 0],            # query 1
            [0, 0, 1, 0],            # query 2
            [2, 0, 0, 0],            # cos=1 with q0
            [3, 4, 0, 0],            # cos=0.6 with q0, 0.8 with q1
            [0, 0, 0, 1],            # orthogonal to all queries
            [-1, 0, 0, 0],           # cos=-1 with q0
        ]
        sf = _write_embeddings(tmp_path, vecs)
        got = ann_range_search(sf, threshold=0.5).to_pandas()
        pairs = set(zip(got["query_id"], got["vec_id"]))
        # self-pairs excluded even though cos(self)=1
        assert (0, 0) not in pairs and (1, 1) not in pairs
        # q0 <-> q1/q2 are orthogonal; q0 sees 3 (1.0) and 4 (0.6)
        assert pairs == {(0, 3), (0, 4), (1, 4)}
        cm = dict(zip(zip(got["query_id"], got["vec_id"]), got["cos_pct"]))
        assert cm[(0, 3)] == 1000 and cm[(0, 4)] == 600 and cm[(1, 4)] == 800

    def test_block_structure_independent(self, tmp_path):
        from logparse_rs_ray.pipelines.similarity import ann_range_search

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(200, 8)).astype(np.float32)
        sf = _write_embeddings(tmp_path, vecs)
        got = ann_range_search(sf, threshold=0.3).to_pandas()
        # serial oracle
        m = vecs.astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        cos = m[:3] @ m.T
        want = set()
        for q in range(3):
            for v in range(200):
                if v != q and cos[q, v] >= 0.3:
                    want.add((q, v, int(np.floor(cos[q, v] * 1000))))
        assert set(zip(got["query_id"], got["vec_id"], got["cos_pct"])) == want

    def test_matches_duckdb_on_generated(self):
        import duckdb

        from logparse_rs_ray.pipelines.similarity import (
            ANN_RANGE_SQL, ann_range_search)

        got = ann_range_search(SF).to_pandas().sort_values(
            ["query_id", "vec_id"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{SF}/embeddings.parquet')")
        want = con.execute(ANN_RANGE_SQL).df()
        assert got.values.tolist() == want.values.tolist()


# --- q_exists_urgent_clean --------------------------------------------------

def _write_orders_customers(tmp_path, orders, custkeys):
    """orders: list of (custkey, priority, status)."""
    t = pa.table({
        "o_orderkey": pa.array(range(len(orders)), type=pa.int64()),
        "o_custkey": pa.array([c for c, _, _ in orders], type=pa.int64()),
        "o_orderstatus": pa.array([s for _, _, s in orders]),
        "o_totalprice": pa.array([100.0] * len(orders)),
        "o_orderdate": pa.array([0] * len(orders),
                                type=pa.timestamp("us")),
        "o_orderpriority": pa.array([p for _, p, _ in orders]),
    })
    pq.write_table(t, tmp_path / "orders.parquet")
    c = pa.table({"c_custkey": pa.array(custkeys, type=pa.int64())})
    pq.write_table(c, tmp_path / "customer.parquet")
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestExistsUrgentClean:
    def test_flag_matrix(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import q_exists_urgent_clean

        orders = [
            (1, "1-URGENT", "O"),                      # urgent only -> keep
            (2, "1-URGENT", "O"), (2, "5-LOW", "F"),   # urgent + F -> drop
            (3, "5-LOW", "F"),                         # F only -> drop
            (4, "3-MEDIUM", "O"),                      # neither -> drop
            (1, "2-HIGH", "P"),                        # extra clean order
        ]
        # customer 5 has no orders (EXISTS fails); 9 is an orphan custkey
        # in orders only (not a customer) — add an order for it to prove
        # the membership semi-join filters it.
        orders.append((9, "1-URGENT", "O"))
        sf = _write_orders_customers(tmp_path, orders, [1, 2, 3, 4, 5])
        got = q_exists_urgent_clean(sf).to_pandas()
        assert sorted(got["c_custkey"]) == [1]

    def test_shuffle_mode_equals_tree_and_duckdb(self):
        import duckdb

        from logparse_rs_ray.pipelines.relational import (
            Q_EXISTS_URGENT_CLEAN_SQL, q_exists_urgent_clean)

        a = sorted(q_exists_urgent_clean(SF).to_pandas()["c_custkey"])
        b = sorted(q_exists_urgent_clean(
            SF, mode="shuffle", final_partitions=5).to_pandas()["c_custkey"])
        assert a == b
        con = duckdb.connect()
        for t in ("orders", "customer"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        want = con.execute(Q_EXISTS_URGENT_CLEAN_SQL).df()
        assert a == want["c_custkey"].tolist()


# --- q17_small_quantity_revenue ----------------------------------------------

def _write_lineitem(tmp_path, rows):
    """rows: list of (partkey, qty, price)."""
    t = pa.table({
        "l_orderkey": pa.array(range(len(rows)), type=pa.int64()),
        "l_partkey": pa.array([p for p, _, _ in rows], type=pa.int64()),
        "l_suppkey": pa.array([0] * len(rows), type=pa.int64()),
        "l_linenumber": pa.array([1] * len(rows), type=pa.int32()),
        "l_quantity": pa.array([float(q) for _, q, _ in rows]),
        "l_extendedprice": pa.array([float(x) for _, _, x in rows]),
        "l_discount": pa.array([0.0] * len(rows)),
        "l_tax": pa.array([0.0] * len(rows)),
        "l_returnflag": pa.array(["N"] * len(rows)),
        "l_linestatus": pa.array(["O"] * len(rows)),
        "l_shipdate": pa.array([0] * len(rows), type=pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestQ17SmallQuantity:
    def test_exact_boundary(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import (
            q17_small_quantity_revenue)

        # part 1: qtys 1,1,1,2,5 -> sum=10, cnt=5, 0.2*avg = 0.4.
        #   5*qty*cnt < sum  <=>  25*qty < 10: nothing qualifies (qty>=1).
        # part 2: qtys 1,9 -> sum=10, cnt=2, threshold qty<1.0:
        #   5*1*2=10 == 10 -> the boundary row is EXCLUDED (strict <).
        # part 3: qtys 1,11 -> sum=12, cnt=2: 5*1*2=10 < 12 -> included.
        rows = [(1, 1, 10.0), (1, 1, 10.0), (1, 1, 10.0), (1, 2, 10.0),
                (1, 5, 10.0),
                (2, 1, 30.0), (2, 9, 30.0),
                (3, 1, 7.5), (3, 11, 7.5)]
        got = q17_small_quantity_revenue(_write_lineitem(tmp_path, rows))
        df = got.to_pandas()
        assert df["n_small"].tolist() == [1]
        assert df["revenue_cents"].tolist() == [750]

    def test_matches_duckdb_on_generated(self):
        import duckdb

        from logparse_rs_ray.pipelines.relational import (
            Q17_SMALL_QTY_SQL, q17_small_quantity_revenue)

        got = q17_small_quantity_revenue(SF).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"read_parquet('{SF}/lineitem.parquet')")
        want = con.execute(Q17_SMALL_QTY_SQL).df()
        assert got["n_small"].tolist() == want["n_small"].tolist()
        assert got["revenue_cents"].tolist() == want["revenue_cents"].tolist()
