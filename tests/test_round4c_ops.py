"""Round-4 continuation operators, batch 3: TPC-H Q5-shape 3-way join,
ordered STRING_AGG top-k, rolling 7-day distinct actives, lang-ID
confusion census.

Each test pins the operator against a serial Python/DuckDB oracle on an
engineered corpus covering the edges the gate's generated tables may not
hit: window gaps of exactly w-1 / w / w+1 days, tie-breaks in the top-k
string build, groups smaller than k, detector-vs-label disagreement."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, rows):
    """rows: list of (user_id, day_offset) -> events.parquet with one event
    per row at midnight + day_offset days from 2024-01-01."""
    import pyarrow.parquet as pq

    base = datetime.datetime(2024, 1, 1)
    t = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([base + datetime.timedelta(days=d, hours=u % 24)
                        for u, d in rows], type=pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], type=pa.int64()),
        "event_type": pa.array(["click"] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def _rolling_oracle(rows, w=7):
    """Brute-force (day_num, dau, wau) over (user, day_offset) rows."""
    epoch = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
    pairs = {(u, epoch + d) for u, d in rows}
    days = sorted({d for _, d in pairs})
    out = []
    for d in days:
        dau = sum(1 for _, pd_ in pairs if pd_ == d)
        wau = len({u for u, pd_ in pairs if d - (w - 1) <= pd_ <= d})
        out.append((d, dau, wau))
    return out


@pytest.mark.usefixtures("ray_session")
class TestRollingActiveUsers:
    def test_window_gap_edges(self, tmp_path):
        from logparse_rs_ray.pipelines.windows import log_rolling_active_users

        # user 1: gap of exactly 6 (merges), user 2: gap of exactly 7
        # (adjacent intervals), user 3: gap of 8 (hole), user 4: dense run
        rows = [(1, 0), (1, 6), (2, 0), (2, 7), (3, 0), (3, 8),
                (4, 0), (4, 1), (4, 2), (1, 6), (2, 0)]  # dup events too
        sf = _write_events(tmp_path, rows)
        got = log_rolling_active_users(sf).to_pandas()
        want = _rolling_oracle(rows)
        assert [tuple(r) for r in got.itertuples(index=False)] == want

    def test_shuffle_mode_equals_tree(self, tmp_path):
        from logparse_rs_ray.pipelines.windows import log_rolling_active_users

        rows = [(u, (u * 3 + k) % 20) for u in range(40) for k in range(3)]
        sf = _write_events(tmp_path, rows)
        a = log_rolling_active_users(sf, mode="tree").to_pandas()
        b = log_rolling_active_users(sf, mode="shuffle",
                                     num_partitions=5).to_pandas()
        pd.testing.assert_frame_equal(a, b)
        want = _rolling_oracle(rows)
        assert [tuple(r) for r in a.itertuples(index=False)] == want

    def test_wau_not_sum_of_dau(self, tmp_path):
        from logparse_rs_ray.pipelines.windows import log_rolling_active_users

        # one user active every day: wau must stay 1, never 7
        rows = [(1, d) for d in range(10)]
        sf = _write_events(tmp_path, rows)
        got = log_rolling_active_users(sf).to_pandas()
        assert (got.wau == 1).all() and (got.dau == 1).all()


def _write_orders(tmp_path, rows):
    """rows: (orderkey, priority, totalprice)."""
    import pyarrow.parquet as pq

    t = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
        "o_custkey": pa.array([r[0] % 7 for r in rows], type=pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows)),
        "o_totalprice": pa.array([float(r[2]) for r in rows]),
        "o_orderdate": pa.array([datetime.datetime(2024, 1, 1)] * len(rows),
                                type=pa.timestamp("us")),
        "o_orderpriority": pa.array([r[1] for r in rows]),
    })
    pq.write_table(t, tmp_path / "orders.parquet")
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestStringAgg:
    def test_ties_and_small_groups(self, tmp_path):
        from logparse_rs_ray.pipelines.relational import q_string_agg

        rows = ([(k, "1-URGENT", 100.0) for k in range(10)]       # all tied
                + [(100 + k, "2-HIGH", 50.0 + k) for k in range(3)])  # < k
        sf = _write_orders(tmp_path, rows)
        got = q_string_agg(sf).to_pandas().set_index("o_orderpriority")
        # ties at equal price break to the SMALLER key, rank-ordered
        assert got.loc["1-URGENT", "top_keys"] == "0,1,2,3,4"
        # a group smaller than k emits what exists, highest price first
        assert got.loc["2-HIGH", "top_keys"] == "102,101,100"

    def test_matches_duckdb_on_generated(self):
        import duckdb

        from logparse_rs_ray.pipelines.relational import (Q_STRING_AGG_SQL,
                                                          q_string_agg)

        got = q_string_agg(SF).to_pandas().sort_values(
            "o_orderpriority").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"read_parquet('{SF}/orders.parquet')")
        want = con.sql(Q_STRING_AGG_SQL).df()
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestThreeWayRevenue:
    def test_matches_duckdb(self):
        import duckdb

        from logparse_rs_ray.pipelines.relational import (Q_3WAY_REVENUE_SQL,
                                                          q_3way_revenue)

        got = q_3way_revenue(SF).to_pandas().sort_values(
            "r_name").reset_index(drop=True)
        con = duckdb.connect()
        for t in ["lineitem", "orders", "customer", "nation", "region"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        want = con.sql(Q_3WAY_REVENUE_SQL).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert got.n_lines.sum() > 0  # the date band actually selects rows


@pytest.mark.usefixtures("ray_session")
class TestLangidConfusion:
    def test_matches_serial_detector(self, tmp_path):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.textops import (LangIdScorer,
                                                       doc_langid_confusion)

        texts = ["the quick fox and the dog", "le chat est la",
                 "el perro y el gato es", "zzz qqq", ""]
        langs = ["en", "fr", "en", "de", "fr"]  # labels disagree on purpose
        t = pa.table({
            "doc_id": pa.array(range(5), type=pa.int64()),
            "text": pa.array(texts), "lang": pa.array(langs),
            "source": pa.array(["s"] * 5),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        })
        pq.write_table(t, tmp_path / "documents.parquet")
        got = doc_langid_confusion(str(tmp_path)).to_pandas()
        pred = LangIdScorer()(t)["pred_lang"].to_pylist()
        from collections import Counter

        want = Counter(zip(langs, pred))
        got_map = {(r.lang, r.pred_lang): r.n_docs
                   for r in got.itertuples(index=False)}
        assert got_map == dict(want)
        # bounded census, sorted output
        assert list(got.lang) == sorted(got.lang)


def _dsir_serial(table: pa.Table, buckets=16384, target_lang="en"):
    """Serial replica of doc_dsir_weights over one in-memory table."""
    from logparse_rs_ray.functions.hashing import (segment_sum,
                                                   shingle_hashes,
                                                   tokenize_flat)

    uni, uoff = tokenize_flat(table["text"])
    bi, boff = shingle_hashes(table["text"], k=2)
    ub = (uni % np.uint64(buckets)).astype(np.int64)
    bb = (bi % np.uint64(buckets)).astype(np.int64) + buckets
    n_u, n_b = np.diff(uoff), np.diff(boff)
    off = np.zeros(table.num_rows + 1, dtype=np.int64)
    np.cumsum(n_u + n_b, out=off[1:])
    flat = np.empty(int(off[-1]), dtype=np.int64)
    u_dst = np.repeat(off[:-1], n_u) + (np.arange(len(ub))
                                        - np.repeat(uoff[:-1], n_u))
    b_dst = np.repeat(off[:-1] + n_u, n_b) + (np.arange(len(bb))
                                              - np.repeat(boff[:-1], n_b))
    flat[u_dst] = ub
    flat[b_dst] = bb
    raw = np.bincount(flat, minlength=2 * buckets).astype(np.int64)
    is_tgt = np.asarray([l == target_lang for l in
                         table["lang"].to_pylist()])
    tgt = np.bincount(flat[np.repeat(is_tgt, np.diff(off))],
                      minlength=2 * buckets).astype(np.int64)
    d = 2.0 * buckets
    lam = (np.log((tgt + 1.0) / (tgt.sum() + d))
           - np.log((raw + 1.0) / (raw.sum() + d)))
    sums = segment_sum(lam[flat], off)
    n = np.diff(off)
    mean = np.where(n > 0, sums / np.maximum(n, 1), 0.0)
    return (n.astype(np.int64), np.floor(mean * 1e6).astype(np.int64))


@pytest.mark.usefixtures("ray_session")
class TestDsirWeights:
    def test_matches_serial_replica(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.textops import doc_dsir_weights

        got = (doc_dsir_weights(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text", "lang"])
        t = t.take(pa.array(np.argsort(np.asarray(t["doc_id"]))))
        n, w = _dsir_serial(t)
        assert list(got.n_feats) == list(n)
        assert list(got.logw_x1e6) == list(w)

    def test_target_lang_scores_higher(self, tmp_path):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.textops import doc_dsir_weights

        en = ["the cat and the dog sat with a hat"] * 20
        fr = ["le chat est dans la maison et le chien"] * 20
        t = pa.table({
            "doc_id": pa.array(range(40), type=pa.int64()),
            "text": pa.array(en + fr),
            "lang": pa.array(["en"] * 20 + ["fr"] * 20),
            "source": pa.array(["s"] * 40),
            "n_chars": pa.array([len(x) for x in en + fr], type=pa.int64()),
        })
        pq.write_table(t, tmp_path / "documents.parquet")
        got = doc_dsir_weights(str(tmp_path)).to_pandas()
        w_en = got[got.doc_id < 20].logw_x1e6
        w_fr = got[got.doc_id >= 20].logw_x1e6
        assert w_en.min() > w_fr.max()

    def test_block_structure_independent(self, tmp_path):
        # empty docs + odd block sizes: same answer regardless of blocking
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.textops import doc_dsir_weights

        texts = ["alpha beta gamma", "", "the the the", "x", "le la les"]
        t = pa.table({
            "doc_id": pa.array(range(5), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en", "en", "fr", "fr", "fr"]),
            "source": pa.array(["s"] * 5),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        })
        pq.write_table(t, tmp_path / "documents.parquet")
        got = (doc_dsir_weights(str(tmp_path)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        n, w = _dsir_serial(t)
        assert list(got.n_feats) == list(n)
        assert list(got.logw_x1e6) == list(w)
        # empty doc: zero features, zero weight
        assert got.loc[1, "n_feats"] >= 1  # bigram sentinel for empty docs
