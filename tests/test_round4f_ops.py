"""Round-4 continuation operators, batch 6: TPC-H Q13 (custdist) and Q18
(large-volume orders).

Both are pinned on engineered tables exercising the join-polarity edges the
generated corpus cannot guarantee: zero-order customers in the Q13 LEFT
JOIN, orphan custkeys/orderkeys on either side, and the exact HAVING
boundary + LIMIT tiebreak in Q18."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write(tmp_path, name, table):
    pq.write_table(table, tmp_path / f"{name}.parquet")


def _customers(keys):
    return pa.table({
        "c_custkey": pa.array(keys, type=pa.int64()),
        "c_name": pa.array([f"c{k}" for k in keys]),
        "c_nationkey": pa.array([0] * len(keys), type=pa.int32()),
        "c_acctbal": pa.array([0.0] * len(keys)),
        "c_mktsegment": pa.array(["BUILDING"] * len(keys)),
    })


def _orders(rows):
    """rows: (orderkey, custkey, totalprice)."""
    return pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], type=pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows)),
        "o_totalprice": pa.array([float(r[2]) for r in rows]),
        "o_orderdate": pa.array([datetime.datetime(2024, 1, 1)] * len(rows),
                                type=pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
    })


def _lineitems(rows):
    """rows: (orderkey, quantity)."""
    n = len(rows)
    return pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
        "l_partkey": pa.array([1] * n, type=pa.int64()),
        "l_suppkey": pa.array([1] * n, type=pa.int64()),
        "l_linenumber": pa.array(list(range(1, n + 1)), type=pa.int32()),
        "l_quantity": pa.array([float(r[1]) for r in rows]),
        "l_extendedprice": pa.array([100.0] * n),
        "l_discount": pa.array([0.0] * n),
        "l_tax": pa.array([0.0] * n),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([datetime.datetime(2024, 1, 1)] * n,
                               type=pa.timestamp("us")),
    })


@pytest.mark.usefixtures("ray_session")
class TestQ13Custdist:
    def test_zero_bucket_and_orphans(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import q13_custdist

        # customers 1-5; cust 1 has 2 orders, cust 2 has 1, custs 3-5 none;
        # order 40 points at custkey 99 (orphan -> must not count anywhere)
        _write(tmp_path, "customer", _customers([1, 2, 3, 4, 5]))
        _write(tmp_path, "orders", _orders(
            [(10, 1, 100.0), (20, 1, 100.0), (30, 2, 100.0), (40, 99, 100.0)]))
        got = q13_custdist(str(tmp_path)).to_pandas()
        # custdist desc, c_count desc: 3 customers with 0, 1 with 1, 1 with 2
        assert got.values.tolist() == [[0, 3], [2, 1], [1, 1]]

    def test_matches_duckdb_on_generated(self):
        import duckdb

        from logparse_rs_ray.pipelines.relational import (
            Q13_CUSTDIST_SQL, q13_custdist)

        got = q13_custdist(SF).to_pandas()
        con = duckdb.connect()
        for t in ("customer", "orders"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        want = con.execute(Q13_CUSTDIST_SQL).df()
        assert got.values.tolist() == want.values.tolist()
        assert got.custdist.sum() == 150  # every sf0.001 customer counted once


@pytest.mark.usefixtures("ray_session")
class TestQ18LargeOrders:
    def test_having_boundary_and_tiebreak(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import q18_large_orders

        # order 1 sums exactly to the threshold -> excluded (strict >);
        # order 2 exceeds by 1 -> included; order 3 far above; order 99 is
        # an orphan (no orders row) and must drop at the join
        _write(tmp_path, "orders", _orders(
            [(1, 7, 500.0), (2, 8, 300.0), (3, 9, 300.0)]))
        _write(tmp_path, "lineitem", _lineitems(
            [(1, 50), (1, 50), (2, 51), (2, 50), (3, 200), (99, 300)]))
        got = q18_large_orders(str(tmp_path), qty_thr=100).to_pandas()
        # price ties between orders 2 and 3 break by orderkey asc
        assert got.values.tolist() == [[2, 8, 30000, 101], [3, 9, 30000, 200]]

    def test_limit_100_on_generated(self):
        import duckdb

        from logparse_rs_ray.pipelines.relational import (
            Q18_LARGE_ORDERS_SQL, q18_large_orders)

        got = q18_large_orders(SF, qty_thr=150).to_pandas()
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        want = con.execute(
            Q18_LARGE_ORDERS_SQL.replace("> 250", "> 150")).df()
        assert len(got) == 100  # sf0.001 has >100 orders above 150
        assert got.values.tolist() == want.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestQ22IdleRich:
    def test_boundary_anti_and_negative(self, tmp_path):
        import pyarrow.parquet as pq  # noqa: F401  (helpers use module-level pq)

        from logparse_rs_ray.pipelines.relational import (
            q22_idle_rich_customers)

        # positive balances: 100, 200, 300 -> avg 200. cust 2 sits EXACTLY
        # on the average (strict > excludes); cust 3 is above but has an
        # urgent order (anti-join drops); cust 4 is above with only a
        # non-urgent order (kept); cust 5 is negative (never eligible).
        cust = pa.table({
            "c_custkey": pa.array([2, 3, 4, 5], type=pa.int64()),
            "c_name": pa.array(["a", "b", "c", "d"]),
            "c_nationkey": pa.array([0] * 4, type=pa.int32()),
            "c_acctbal": pa.array([200.0, 300.0, 100.0, -50.0]),
            "c_mktsegment": pa.array(["S1", "S1", "S2", "S2"]),
        })
        # make the positive avg (200+300+100)/3 = 200; cust 3 (300) > avg
        _write(tmp_path, "customer", cust)
        _write(tmp_path, "orders", pa.table({
            "o_orderkey": pa.array([1, 2], type=pa.int64()),
            "o_custkey": pa.array([3, 4], type=pa.int64()),
            "o_orderstatus": pa.array(["O", "O"]),
            "o_totalprice": pa.array([1.0, 1.0]),
            "o_orderdate": pa.array(
                [datetime.datetime(2024, 1, 1)] * 2, type=pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT", "3-MEDIUM"]),
        }))
        got = q22_idle_rich_customers(str(tmp_path)).to_pandas()
        # only cust 3 is above-average; it has an urgent order -> empty
        assert got.values.tolist() == []

    def test_kept_customer(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import (
            q22_idle_rich_customers)

        # avg over positives = (100+400)/2 = 250; cust 9 (400) above with a
        # non-urgent order only -> kept
        cust = pa.table({
            "c_custkey": pa.array([8, 9], type=pa.int64()),
            "c_name": pa.array(["a", "b"]),
            "c_nationkey": pa.array([0, 0], type=pa.int32()),
            "c_acctbal": pa.array([100.0, 400.0]),
            "c_mktsegment": pa.array(["S1", "S2"]),
        })
        _write(tmp_path, "customer", cust)
        _write(tmp_path, "orders", pa.table({
            "o_orderkey": pa.array([1], type=pa.int64()),
            "o_custkey": pa.array([9], type=pa.int64()),
            "o_orderstatus": pa.array(["O"]),
            "o_totalprice": pa.array([1.0]),
            "o_orderdate": pa.array([datetime.datetime(2024, 1, 1)],
                                    type=pa.timestamp("us")),
            "o_orderpriority": pa.array(["3-MEDIUM"]),
        }))
        got = q22_idle_rich_customers(str(tmp_path)).to_pandas()
        assert got.values.tolist() == [["S2", 1, 40000]]


@pytest.mark.usefixtures("ray_session")
class TestSessionLengthHist:
    @staticmethod
    def _events(tmp_path, rows):
        """rows: (user_id, minutes_offset)."""
        base = datetime.datetime(2024, 1, 1)
        t = pa.table({
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array([base + datetime.timedelta(minutes=m)
                            for _, m in rows], type=pa.timestamp("us")),
            "user_id": pa.array([u for u, _ in rows], type=pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(['{"k": 1}'] * len(rows)),
        })
        pq.write_table(t, tmp_path / "events.parquet")
        return str(tmp_path)

    def test_gap_boundaries(self, tmp_path):
        from logparse_rs_ray.pipelines.windows import log_session_length_hist

        # user 1: events at 0,10,20 (one 3-event session), then 51 (gap 31
        # min > 30 -> new 1-event session); user 2: 0 and exactly 30 min
        # later (gap == 30 NOT > 30 -> same session of 2)
        sf = self._events(tmp_path, [(1, 0), (1, 10), (1, 20), (1, 51),
                                     (2, 0), (2, 30)])
        got = log_session_length_hist(sf).to_pandas()
        assert got.values.tolist() == [[1, 1], [2, 1], [3, 1]]

    def test_shuffle_regime_matches_tree(self, tmp_path):
        import logparse_rs_ray.stages.shuffle as sh
        from logparse_rs_ray.pipelines.windows import log_session_length_hist

        rows = [(u, m) for u in range(1, 9) for m in range(0, 200, 7)]
        sf = self._events(tmp_path, rows)
        tree = log_session_length_hist(sf).to_pandas()
        old = sh.AUTO_TREE_MAX_BYTES
        sh.AUTO_TREE_MAX_BYTES = 0
        try:
            shuf = log_session_length_hist(sf).to_pandas()
        finally:
            sh.AUTO_TREE_MAX_BYTES = old
        assert tree.values.tolist() == shuf.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestGroupingSets:
    def test_sets_and_markers(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import (
            q_grouping_sets_pricing)

        sf = tmp_path
        _write(sf, "lineitem", _lineitems([(1, 10), (1, 20), (2, 5)]))
        got = q_grouping_sets_pricing(str(sf)).to_pandas()
        # helpers write flag=N status=O shipdate=2024 qty as given:
        # set (flag,status) -> one row (N, O, ALL, 35)
        # set (flag,year)   -> one row (N, ALL, 2024, 35)
        # grand total       -> (ALL, ALL, ALL, 35)
        assert got.values.tolist() == [
            ["ALL", "ALL", "ALL", 35],
            ["N", "ALL", "2024", 35],
            ["N", "O", "ALL", 35],
        ]
        # exactly the requested sets — no (status,year) row, no (year) row
        assert len(got) == 3


@pytest.mark.usefixtures("ray_session")
class TestEventTransitions:
    @staticmethod
    def _events(tmp_path, rows):
        """rows: (user_id, minutes_offset, event_type)."""
        base = datetime.datetime(2024, 1, 1)
        t = pa.table({
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array([base + datetime.timedelta(minutes=m)
                            for _, m, _ in rows], type=pa.timestamp("us")),
            "user_id": pa.array([u for u, _, _ in rows], type=pa.int64()),
            "event_type": pa.array([e for _, _, e in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(['{"k": 1}'] * len(rows)),
        })
        pq.write_table(t, tmp_path / "events.parquet")
        return str(tmp_path)

    def test_transitions_and_user_boundaries(self, tmp_path):
        from logparse_rs_ray.pipelines.windows import log_event_transitions

        # user 1: a->b->b; user 2: b->a.  No cross-user pair (1's last 'b'
        # never pairs with 2's first 'b').
        sf = self._events(tmp_path, [
            (1, 0, "a"), (1, 1, "b"), (1, 2, "b"),
            (2, 0, "b"), (2, 1, "a"),
        ])
        got = log_event_transitions(sf).to_pandas()
        assert got.values.tolist() == [
            ["a", "b", 1], ["b", "a", 1], ["b", "b", 1]]

    def test_equal_ts_breaks_by_event_id(self, tmp_path):
        from logparse_rs_ray.pipelines.windows import log_event_transitions

        # both events at minute 0: event_id order decides prev/next
        sf = self._events(tmp_path, [(1, 0, "x"), (1, 0, "y")])
        got = log_event_transitions(sf).to_pandas()
        assert got.values.tolist() == [["x", "y", 1]]


@pytest.mark.usefixtures("ray_session")
class TestLabelJoinStats:
    def test_join_and_word_rule(self, tmp_path):
        from logparse_rs_ray.pipelines.similarity import doc_label_join_stats

        docs = pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["  a  b ", "one", "dropped"]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([7, 3, 7], type=pa.int64()),
        })
        emb = pa.table({
            "vec_id": pa.array([1, 2, 99], type=pa.int64()),  # 99 orphan
            "embedding": pa.array([[0.0] * 4] * 3,
                                  type=pa.list_(pa.float32())),
            "label": pa.array([7, 7, 8], type=pa.int32()),
        })
        _write(tmp_path, "documents", docs)
        _write(tmp_path, "embeddings", emb)
        got = doc_label_join_stats(str(tmp_path)).to_pandas()
        # doc 3 has no embedding, vec 99 has no doc -> both drop (inner);
        # leading/trailing whitespace must not inflate the word count
        assert got.values.tolist() == [[7, 2, 10, 3]]


@pytest.mark.usefixtures("ray_session")
class TestRangeWindowRevenue:
    @staticmethod
    def _orders_dated(tmp_path, rows):
        """rows: (orderkey, custkey, day_offset, totalprice)."""
        base = datetime.datetime(2024, 1, 1)
        t = pa.table({
            "o_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], type=pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows)),
            "o_totalprice": pa.array([float(r[3]) for r in rows]),
            "o_orderdate": pa.array(
                [base + datetime.timedelta(days=r[2]) for r in rows],
                type=pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
        })
        pq.write_table(t, tmp_path / "orders.parquet")
        return str(tmp_path)

    def test_frame_edges_and_date_peers(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import (
            q_range_window_revenue)

        # cust 1: day 0 (100), day 30 (200) -> day-30 row includes day-0
        # (exactly 30 days back, inclusive); day 31 (400) excludes day 0.
        # cust 2: two orders on the SAME day -> RANGE peers, both frames
        # hold both orders regardless of tie order.
        sf = self._orders_dated(tmp_path, [
            (1, 1, 0, 100.0), (2, 1, 30, 200.0), (3, 1, 31, 400.0),
            (4, 2, 5, 10.0), (5, 2, 5, 20.0),
        ])
        got = q_range_window_revenue(sf).to_pandas() \
            .sort_values("o_orderkey").reset_index(drop=True)
        assert got.values.tolist() == [
            [1, 1, 10000],            # just itself
            [2, 1, 30000],            # 100+200, day 0 is in [0, 30]
            [3, 1, 60000],            # 200+400, day 0 out of [1, 31]
            [4, 2, 3000], [5, 2, 3000],  # same-day peers share the frame
        ]

    def test_regimes_agree(self, tmp_path):
        import logparse_rs_ray.stages.shuffle as sh
        from logparse_rs_ray.pipelines.relational import (
            q_range_window_revenue)

        rows = [(i, i % 5, (i * 7) % 90, float(i)) for i in range(1, 60)]
        sf = self._orders_dated(tmp_path, rows)
        tree = q_range_window_revenue(sf).to_pandas() \
            .sort_values("o_orderkey").reset_index(drop=True)
        old = sh.AUTO_TREE_MAX_BYTES
        sh.AUTO_TREE_MAX_BYTES = 0
        try:
            shuf = q_range_window_revenue(sf).to_pandas() \
                .sort_values("o_orderkey").reset_index(drop=True)
        finally:
            sh.AUTO_TREE_MAX_BYTES = old
        assert tree.values.tolist() == shuf.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestEwmaAnomaly:
    @staticmethod
    def _events_valued(tmp_path, rows):
        """rows: (event_type, minutes_offset, value)."""
        base = datetime.datetime(2024, 1, 1)
        t = pa.table({
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array([base + datetime.timedelta(minutes=m)
                            for _, m, _ in rows], type=pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), type=pa.int64()),
            "event_type": pa.array([e for e, _, _ in rows]),
            "value": pa.array([float(v) for _, _, v in rows]),
            "props": pa.array(['{"k": 1}'] * len(rows)),
        })
        pq.write_table(t, tmp_path / "events.parquet")
        return str(tmp_path)

    def test_flat_series_has_no_anomalies(self, tmp_path):
        from logparse_rs_ray.pipelines.windows import log_value_ewma_anomaly

        rows = [("a", m, 10.0) for m in range(40)]
        got = log_value_ewma_anomaly(self._events_valued(tmp_path, rows)) \
            .to_pandas()
        assert got.values.tolist() == [["a", 40, 0]]

    def test_spike_flags_after_warmup_only(self, tmp_path):
        from logparse_rs_ray.pipelines.windows import log_value_ewma_anomaly

        # big spike at index 5 (inside warmup -> ignored) and at index 30
        # (past warmup -> flagged); mild noise elsewhere
        rows = [("a", m, 10.0 + (m % 3) * 0.1) for m in range(40)]
        rows[5] = ("a", 5, 1000.0)
        rows[30] = ("a", 30, 1000.0)
        got = log_value_ewma_anomaly(self._events_valued(tmp_path, rows)) \
            .to_pandas()
        assert got.n_events[0] == 40
        assert got.n_anomalies[0] >= 1  # index-30 spike flagged
        # warmup spike must NOT be counted as anomalous
        rows2 = [("b", m, 10.0) for m in range(40)]
        rows2[5] = ("b", 5, 1000.0)
        got2 = log_value_ewma_anomaly(self._events_valued(tmp_path, rows2)) \
            .to_pandas()
        # only the post-spike settling can flag; the spike itself cannot
        assert got2.n_anomalies[0] <= 1

    def test_matches_pandas_replica_on_generated(self):
        import pandas as pd
        import pyarrow.parquet as pqt

        from logparse_rs_ray.pipelines.windows import log_value_ewma_anomaly

        got = log_value_ewma_anomaly(SF).to_pandas()
        t = pqt.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "ts", "event_id", "value"]
                           ).to_pandas()
        t = t.sort_values(["event_type", "ts", "event_id"], kind="mergesort")
        want = []
        for et, g in t.groupby("event_type", sort=True):
            v = g["value"].astype(float).reset_index(drop=True)
            m_prev = v.ewm(alpha=0.25, adjust=False).mean().shift(1)
            d = (v - m_prev).abs()
            s_prev = d.fillna(0.0).ewm(alpha=0.25, adjust=False).mean().shift(1)
            import numpy as np
            idx = np.arange(len(v))
            anom = (idx >= 10) & (d.to_numpy() > 3.0 * s_prev.to_numpy())
            want.append([et, len(v), int(anom.sum())])
        assert got.values.tolist() == want


@pytest.mark.usefixtures("ray_session")
class TestPhashDedup:
    @staticmethod
    def _serial(texts):
        """Independent numpy replica of the aHash bucket census."""
        import numpy as np
        out = {}
        for doc_id, t in enumerate(texts):
            data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            hist = np.bincount(data >> 4, minlength=16).astype(np.int64)
            bits = (hist * 16) > hist.sum()
            ph = int((bits.astype(np.int64) << np.arange(16)).sum())
            n, keeper = out.get(ph, (0, doc_id))
            out[ph] = (n + 1, min(keeper, doc_id))
        return sorted((ph, n, k) for ph, (n, k) in out.items() if n > 1)

    def test_engineered_collision_and_keeper(self, tmp_path):
        from logparse_rs_ray.pipelines.multimodal import mm_phash_dedup

        # docs 0 and 2 are byte-permutations of each other -> identical
        # histograms -> same phash; doc 1 differs
        texts = ["abcabc", "zzz!!!", "cbacba"]
        sf = _write(tmp_path, "documents", pa.table({
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([6, 6, 6], type=pa.int64()),
        })) or str(tmp_path)
        got = mm_phash_dedup(sf).to_pandas()
        want = self._serial(texts)
        assert [tuple(r) for r in got.values.tolist()] == want
        assert got.keeper_doc_id.tolist() == [0]  # min doc_id survives

    def test_matches_serial_replica_on_generated(self):
        import pyarrow.parquet as pqt

        from logparse_rs_ray.pipelines.multimodal import mm_phash_dedup

        got = mm_phash_dedup(SF).to_pandas()
        texts = pqt.read_table(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"]).to_pandas() \
            .sort_values("doc_id")["text"].tolist()
        want = self._serial(texts)
        assert [tuple(r) for r in got.values.tolist()] == want
