"""Round-3 breadth operators: PII redaction, per-group ranks, mergeable
Count-Min / grouped-HLL sketches.

Each test pins the operator against a serial oracle (DuckDB on the same
patterns, exact counts for the sketches) plus the merge/mode invariants
the distributed shape relies on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

PII_CORPUS = [
    "contact me at jane.doe+spam@example.co.uk or on +1-555-867-5309 now",
    "server 10.0.255.3 returned 404 twice, then 10.0.255.4 once",
    "no pii here at all",
    "",
    "a@b.io x 999.999.999.999 y +12345678 z 7",
    "edge: v1.2.3.4 is a version-like quad and 1.2.3.4.5 a quint",
    "mixed: bob@corp.example called +49-30-1234567 from 192.168.0.1 (attempt 2)",
]


class TestRedactPii:
    def test_chain_matches_duckdb_on_pii_corpus(self):
        """Engine parity: the Arrow RE2 chain and the generated DuckDB SQL
        must agree byte-for-byte on text where EVERY pattern arm fires."""
        import duckdb

        from logparse_rs_ray.pipelines.logops import _redact_sql, redact_pii

        red, hits = redact_pii(pa.array(PII_CORPUS))
        con = duckdb.connect()
        con.execute("CREATE TABLE events AS SELECT * FROM (SELECT "
                    "row_number() OVER () - 1 AS event_id, col0 AS props "
                    "FROM (SELECT UNNEST(?) AS col0))", [PII_CORPUS])
        want = con.execute(_redact_sql()).df()
        assert red.to_pylist() == want.redacted.tolist()
        assert hits.to_pylist() == want.n_hits.tolist()

    def test_tags_and_counts_pinned(self):
        from logparse_rs_ray.pipelines.logops import redact_pii

        red, hits = redact_pii(pa.array(PII_CORPUS))
        red = red.to_pylist()
        assert red[0] == "contact me at <EMAIL> or on <PHONE> now"
        assert red[1] == "server <IP> returned <NUM> twice, then <IP> once"
        assert red[2] == "no pii here at all" and hits[2].as_py() == 0
        assert red[3] == "" and hits[3].as_py() == 0
        # \d{1,3} quads: 999.999.999.999 is an <IP> by the documented
        # pattern (no range check); phone needs 8-15 digits after '+'
        assert red[4] == "<EMAIL> x <IP> y <PHONE> z <NUM>"
        # a digit-boundary quad inside a longer dotted run still matches
        # per RE2 leftmost-longest-free semantics documented in the op
        assert "<IP>" in red[5]
        assert red[6] == "mixed: <EMAIL> called <PHONE> from <IP> (attempt <NUM>)"

    @pytest.mark.usefixtures("ray_session")
    def test_query_runs_and_counts_digit_runs(self):
        from logparse_rs_ray.pipelines.logops import log_redact_pii

        out = log_redact_pii(SF).to_pandas()
        assert (out.n_hits >= 1).all()          # every props has "k": N
        assert out.redacted.str.contains("<NUM>").all()
        assert not out.redacted.str.contains(r"\d", regex=True).any()


@pytest.mark.usefixtures("ray_session")
class TestLenRank:
    def test_matches_pandas_min_rank(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.textops import doc_len_rank

        out = doc_len_rank(SF).to_pandas()
        df = pq.read_table(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"]).to_pandas()
        df["len_rank"] = (df.groupby("lang").n_chars.rank(method="min")
                          .astype("int64"))
        df["n_lang"] = df.groupby("lang").lang.transform("size")
        exp = (df[["doc_id", "lang", "len_rank", "n_lang"]]
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)
        # ties must actually occur so the RANK (not ROW_NUMBER) semantics
        # are exercised
        assert (df.groupby(["lang", "n_chars"]).size() > 1).any()


class TestCountMinSketch:
    def test_overestimate_only_merge_linear_and_bound(self):
        from logparse_rs_ray.functions.sketches import (
            CMS_W, cms_build, cms_merge, cms_query)

        rng = np.random.default_rng(7)
        # zipf-ish term universe large enough to force some collisions
        terms = [f"t{i}" for i in range(5000)]
        freq = rng.zipf(1.5, size=200_000)
        ids = np.minimum(freq, len(terms)) - 1
        vals, counts = np.unique(ids, return_counts=True)
        keys = pa.array([terms[v] for v in vals])
        sk = cms_build(keys, counts)
        est = cms_query(sk, keys)
        true = counts.astype(np.int64)
        n = int(true.sum())
        assert (est >= true).all()                     # one-sided error
        assert (est - true).max() <= (np.e / CMS_W) * n * 4
        # merge linearity: sketch of halves == sketch of whole
        half = len(vals) // 2
        merged = cms_merge([cms_build(keys[:half], counts[:half]),
                            cms_build(keys[half:], counts[half:])])
        assert (merged == sk).all()

    @pytest.mark.usefixtures("ray_session")
    def test_query_tops_match_exact_counts(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.textops import doc_cms_heavy_terms

        out = doc_cms_heavy_terms(SF, k=10).to_pandas()
        txt = pq.read_table(f"{SF}/documents.parquet",
                            columns=["text"]).to_pandas().text
        exact = pd.Series(" ".join(txt).split(" ")).value_counts()
        # CMS may only overestimate, and on this small vocab the top set
        # must agree with the exact counts
        assert len(out) == 10
        for term, est in zip(out.term, out.est_cnt):
            assert est >= exact[term]
            assert est - exact[term] <= 60          # e/W * N slack
        assert set(out.term[:5]) <= set(exact.index[:10])


class TestGroupedHll:
    @pytest.mark.usefixtures("ray_session")
    def test_within_5pct_of_exact_per_group(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.logops import log_event_user_hll

        out = log_event_user_hll(SF).to_pandas().set_index("event_type")
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "user_id"]).to_pandas()
        exact = ev.groupby("event_type").user_id.nunique()
        assert set(out.index) == set(exact.index)
        for et, true in exact.items():
            assert abs(out.loc[et].approx_users - true) <= max(2, 0.05 * true), et

    def test_grouped_merge_equals_whole(self):
        import pickle

        from logparse_rs_ray.functions.sketches import hll_merge, hll_sketch

        ids = pa.array([str(i % 997) for i in range(10_000)])
        whole = hll_sketch(ids)
        parts = hll_merge([hll_sketch(ids[:3000]), hll_sketch(ids[3000:])])
        assert (whole == parts).all()


@pytest.mark.usefixtures("ray_session")
class TestRollup:
    def test_levels_consistent_and_modes(self):
        from logparse_rs_ray.pipelines.relational import q_rollup_pricing

        out = q_rollup_pricing(SF).to_pandas()
        fine = out[(out.l_returnflag != "ALL") & (out.l_linestatus != "ALL")]
        flag = out[(out.l_returnflag != "ALL") & (out.l_linestatus == "ALL")]
        grand = out[(out.l_returnflag == "ALL")]
        assert len(grand) == 1 and grand.l_linestatus.iloc[0] == "ALL"
        # each rollup level must re-sum exactly from the finer level
        for col in ("sum_qty", "sum_disc_cents"):
            per_flag = fine.groupby("l_returnflag")[col].sum()
            for _, r in flag.iterrows():
                assert r[col] == per_flag[r.l_returnflag]
            assert grand[col].iloc[0] == fine[col].sum()


@pytest.mark.usefixtures("ray_session")
class TestUserPaths:
    def test_matches_serial_join_and_modes_agree(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.windows import log_user_paths

        out = log_user_paths(SF).to_pandas().set_index("user_id")
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_id",
                                    "event_type"]).to_pandas()
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        exp = ev.groupby("user_id").event_type.agg("->".join)
        n = ev.groupby("user_id").size()
        assert len(out) == len(exp)
        for uid, path in exp.items():
            assert out.loc[uid].path == path, uid
            assert out.loc[uid].n_events == n[uid]
        # row order is deliberately not part of the contract (no trailing
        # sort) — compare order-insensitively
        forced = (log_user_paths(SF, mode="shuffle", num_partitions=4)
                  .to_pandas().sort_values("user_id").reset_index(drop=True))
        tree = (log_user_paths(SF, mode="tree").to_pandas()
                .sort_values("user_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(forced, tree)


@pytest.mark.usefixtures("ray_session")
class TestInterarrival:
    def test_matches_serial_diffs_and_modes_agree(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.windows import log_interarrival

        out = log_interarrival(SF).to_pandas().set_index("gap_h")
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_id"]).to_pandas()
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        us = ev.ts.astype("int64")
        same = ev.user_id.to_numpy()[1:] == ev.user_id.to_numpy()[:-1]
        gaps = (us.to_numpy()[1:] - us.to_numpy()[:-1])[same] // 3_600_000_000
        exp = pd.Series(gaps).value_counts().sort_index()
        assert len(out) == len(exp)
        for g, cnt in exp.items():
            assert out.loc[g].n_pairs == cnt, g
        forced = log_interarrival(SF, mode="shuffle", num_partitions=4).to_pandas()
        tree = log_interarrival(SF, mode="tree").to_pandas()
        pd.testing.assert_frame_equal(forced, tree)


@pytest.mark.usefixtures("ray_session")
class TestAboveAvgOrders:
    def test_matches_pandas_and_cross_mult_exactness(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.relational import q_above_avg_orders

        out = q_above_avg_orders(SF).to_pandas().set_index("c_custkey")
        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_custkey", "o_totalprice"]).to_pandas()
        o["cents"] = (o.o_totalprice * 100).round().astype("int64")
        g = o.groupby("o_custkey").cents
        n, tot = g.size(), g.sum()
        above = (o.cents * o.o_custkey.map(n) >
                 o.o_custkey.map(tot)).groupby(o.o_custkey).sum()
        assert len(out) == len(n)
        for ck in n.index:
            assert out.loc[ck].n_orders == n[ck]
            assert out.loc[ck].n_above_avg == above[ck], ck
        # multi-order customers exist, so the comparison is non-trivial
        assert (n > 1).any() and above.sum() > 0


@pytest.mark.usefixtures("ray_session")
class TestPivot:
    def test_wide_counts_match_crosstab(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.relational import (
            PIVOT_SOURCES, q_pivot_lang_source)

        out = q_pivot_lang_source(SF).to_pandas().set_index("lang")
        d = pq.read_table(f"{SF}/documents.parquet",
                          columns=["lang", "source"]).to_pandas()
        ct = pd.crosstab(d.lang, d.source)
        assert list(out.columns) == PIVOT_SOURCES
        for lang in ct.index:
            for s in PIVOT_SOURCES:
                assert out.loc[lang, s] == ct.loc[lang].get(s, 0), (lang, s)
        assert out.to_numpy().sum() == len(d)


@pytest.mark.usefixtures("ray_session")
class TestGroupedDistinct:
    def test_exact_equals_pandas_and_modes_agree(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.logops import log_event_user_distinct

        out = log_event_user_distinct(SF).to_pandas().set_index("event_type")
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "user_id"]).to_pandas()
        exact = ev.groupby("event_type").user_id.nunique()
        assert dict(out.n_users) == dict(exact)
        forced = log_event_user_distinct(SF, mode="shuffle",
                                         num_partitions=4).to_pandas()
        tree = log_event_user_distinct(SF, mode="tree").to_pandas()
        pd.testing.assert_frame_equal(forced, tree)


@pytest.mark.usefixtures("ray_session")
class TestGroupedDDQuantiles:
    def test_per_group_relative_error_bound(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.functions.sketches import DD_ALPHA
        from logparse_rs_ray.pipelines.logops import log_value_quantiles_by_type

        out = log_value_quantiles_by_type(SF).to_pandas().set_index("event_type")
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "value"]).to_pandas()
        for et, g in ev.groupby("event_type"):
            v = np.sort(g.value.to_numpy())
            for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
                true = v[int(np.ceil(len(v) * q)) - 1]
                est = out.loc[et][col]
                assert abs(est - true) <= 2 * DD_ALPHA * abs(true) + 1e-9, (et, col)
        assert set(out.index) == set(ev.event_type.unique())


# --- property-based kernel conformance (no Ray needed) ----------------------

def _events_table(rows):
    """rows = list of (user_id, ts_us, event_id, event_type)."""
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows], type=pa.string()),
    })


class TestWindowKernelProperties:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows_st = st.lists(
        st.tuples(st.integers(0, 5),                      # user_id (collisions)
                  st.integers(0, 10**7),                  # ts us (tie-prone)
                  st.integers(0, 50),                     # event_id
                  st.sampled_from(["signup", "click", "purchase", "view"])),
        max_size=60, unique_by=lambda r: (r[0], r[1], r[2]))

    @settings(max_examples=150, deadline=None)
    @given(rows_st)
    def test_paths_kernel_matches_pandas(self, rows):
        from logparse_rs_ray.pipelines.windows import paths_kernel

        out = paths_kernel(_events_table(rows)).to_pandas()
        df = (pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "et"])
              .sort_values(["user_id", "ts", "event_id"]))
        exp = df.groupby("user_id").et.agg("->".join)
        got = dict(zip(out.user_id, out.path))
        assert got == dict(exp)
        assert dict(zip(out.user_id, out.n_events)) == dict(
            df.groupby("user_id").size())

    @settings(max_examples=150, deadline=None)
    @given(rows_st)
    def test_gaps_kernel_matches_pandas(self, rows):
        from logparse_rs_ray.pipelines.windows import gaps_kernel

        out = gaps_kernel(_events_table(rows)).to_pandas()
        df = (pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "et"])
              .sort_values(["user_id", "ts", "event_id"]))
        gaps = []
        for _, g in df.groupby("user_id"):
            t = g.ts.to_numpy()
            gaps.extend((t[1:] - t[:-1]) // 3_600_000_000)
        exp = pd.Series(gaps, dtype="int64").value_counts().sort_index()
        assert dict(zip(out.gap_h, out.n_pairs)) == dict(exp)

    @settings(max_examples=150, deadline=None)
    @given(rows_st)
    def test_funnel_kernel_matches_serial_replay(self, rows):
        from logparse_rs_ray.pipelines.windows import (FUNNEL_STAGES,
                                                       funnel_census_kernel)

        names = [s for _, s in FUNNEL_STAGES]
        keep = [r for r in rows if r[3] in names]
        compact = pa.table({
            "user_id": pa.array([r[0] for r in keep], type=pa.int64()),
            "code": pa.array([names.index(r[3]) for r in keep], type=pa.int8()),
            "ts": pa.array([r[1] for r in keep], type=pa.timestamp("us")),
        })
        out = funnel_census_kernel(compact).to_pandas().set_index("stage")
        n = dict.fromkeys(names, 0)
        df = pd.DataFrame(keep, columns=["user_id", "ts", "event_id", "et"])
        for _, g in df.groupby("user_id"):
            t_prev = None
            for stage in names:
                sel = g.ts[(g.et == stage)] if t_prev is None else \
                    g.ts[(g.et == stage) & (g.ts > t_prev)]
                if sel.empty:
                    break
                t_prev = sel.min()
                n[stage] += 1
        if not keep:
            assert len(out) == 0
        else:
            assert dict(out.n_users) == n


class TestAutoJoinPartitions:
    def test_size_derived_bounds(self, tmp_path):
        from logparse_rs_ray.stages.join import (JOIN_PARTITION_BYTES,
                                                 auto_join_partitions)

        f = tmp_path / "x.bin"
        f.write_bytes(b"z" * 1024)
        assert auto_join_partitions(str(f)) == 4                    # floor
        assert auto_join_partitions("/nonexistent/file") == 4       # unknown
        big = tmp_path / "big.bin"
        big.write_bytes(b"z" * (2 * JOIN_PARTITION_BYTES + 1))
        assert auto_join_partitions(str(big)) == 4                  # < lo
        # summed sides cross the per-partition budget -> ceil division
        many = 10 * JOIN_PARTITION_BYTES
        blob = tmp_path / "blob.bin"
        blob.write_bytes(b"z" * many)
        assert auto_join_partitions(str(blob)) == 10
        assert auto_join_partitions(str(blob), str(big)) == 13


class TestAboveAvgKernelProperty:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 6),
                              st.integers(-10**9, 10**9)), max_size=50))
    def test_kernel_matches_pandas(self, rows):
        from logparse_rs_ray.pipelines.relational import above_avg_kernel

        t = pa.table({"c_custkey": pa.array([r[0] for r in rows],
                                            type=pa.int64()),
                      "price_cents": pa.array([r[1] for r in rows],
                                              type=pa.int64())})
        out = above_avg_kernel(t).to_pandas().set_index("c_custkey")
        df = pd.DataFrame(rows, columns=["c", "p"])
        for ck, g in df.groupby("c"):
            assert out.loc[ck].n_orders == len(g)
            # strict mean comparison, float-free
            assert out.loc[ck].n_above_avg == int(
                (g.p * len(g) > g.p.sum()).sum()), ck
        assert len(out) == df.c.nunique()


@pytest.mark.usefixtures("ray_session")
class TestHashVectorizer:
    def test_deterministic_unit_norm_and_serial_parity(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.core.fnv import fnv1a64
        from logparse_rs_ray.pipelines.similarity import (EMBED_DIM,
                                                          HashVectorizer,
                                                          doc_embed_hashvec)

        out = doc_embed_hashvec(SF).to_pandas().set_index("doc_id")
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        assert len(out) == len(docs)
        # serial oracle: per-token signed bucket counts, L2-normalized
        for _, r in docs.head(40).iterrows():
            v = np.zeros(EMBED_DIM)
            for tok in r.text.split(" "):
                h = fnv1a64(tok)
                v[h % EMBED_DIM] += -1.0 if (h >> 63) else 1.0
            n = np.linalg.norm(v)
            exp = (v / n if n else v).astype(np.float32)
            got = np.asarray(out.loc[r.doc_id].embedding, dtype=np.float32)
            np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-7)
        norms = np.linalg.norm(np.stack(out.embedding.to_numpy()), axis=1)
        assert ((np.abs(norms - 1) < 1e-5) | (norms == 0)).all()
        # determinism across runs (actor-pool state is pure)
        again = doc_embed_hashvec(SF).to_pandas().set_index("doc_id")
        for did in list(out.index[:10]):
            np.testing.assert_array_equal(
                np.asarray(out.loc[did].embedding),
                np.asarray(again.loc[did].embedding))

    def test_batch_slice_invariance(self):
        """Any slice of the input produces the same rows (no cross-row
        state), so block boundaries cannot change results."""
        import pyarrow as pa

        from logparse_rs_ray.pipelines.similarity import HashVectorizer

        t = pa.table({"doc_id": pa.array(range(6), type=pa.int64()),
                      "text": pa.array(["a b", "", "c c c", "a", "b c", "x y z"])})
        v = HashVectorizer()
        whole = v(t).to_pandas()
        parts = pd.concat([v(t.slice(0, 2)).to_pandas(),
                           v(t.slice(2, 2)).to_pandas(),
                           v(t.slice(4)).to_pandas()]).reset_index(drop=True)
        for i in range(6):
            np.testing.assert_array_equal(np.asarray(whole.embedding[i]),
                                          np.asarray(parts.embedding[i]))


@pytest.mark.usefixtures("ray_session")
class TestSemanticPairs:
    def test_no_false_positives_recall_floor_and_determinism(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.core.fnv import fnv1a64
        from logparse_rs_ray.pipelines.dedup import doc_semantic_pairs
        from logparse_rs_ray.pipelines.similarity import EMBED_DIM

        thr = 0.95
        out = doc_semantic_pairs(SF, threshold=thr).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()

        def vec(text):
            v = np.zeros(EMBED_DIM)
            for t in text.split(" "):
                h = fnv1a64(t)
                v[h % EMBED_DIM] += -1.0 if (h >> 63) else 1.0
            n = np.linalg.norm(v)
            return v / n if n else v

        mat = np.stack([vec(t) for t in docs.text])
        ids = docs.doc_id.to_numpy()
        pos = {d: i for i, d in enumerate(ids)}
        # zero false positives: every emitted pair clears the threshold
        assert len(out) > 0
        for a, b, cp in zip(out.vec_a, out.vec_b, out.cos_pct):
            cos = float(mat[pos[a]] @ mat[pos[b]])
            assert cos >= thr - 1e-9, (a, b)
            assert cp == int(np.floor(cos * 1000))
        # recall floor vs brute force (sign-bit LSH with 4 planes keeps a
        # deterministic subset; on this corpus it must find >= 1/3)
        cos_all = mat @ mat.T
        iu = np.triu_indices(len(ids), 1)
        true_pairs = int((cos_all[iu] >= thr).sum())
        assert len(out) >= max(1, true_pairs // 3)
        # determinism (as a SET — pair output is order-free since the
        # trailing corpus sort was dropped, VERDICT r03 item 2)
        again = doc_semantic_pairs(SF, threshold=thr).to_pandas()
        key = ["vec_a", "vec_b"]
        pd.testing.assert_frame_equal(
            out.sort_values(key).reset_index(drop=True),
            again.sort_values(key).reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
class TestSemanticSurvivors:
    def test_keep_one_per_cluster_and_payload_intact(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import (_union_find_clusters,
                                                     doc_semantic_pairs,
                                                     doc_semantic_survivors)

        surv = doc_semantic_survivors(SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "source"]).to_pandas()
        pairs = doc_semantic_pairs(SF).to_pandas()
        # serial replica: drop every non-min member of each component
        clusters = _union_find_clusters(
            pa.table({"vec_a": pa.array(pairs.vec_a, type=pa.int64()),
                      "vec_b": pa.array(pairs.vec_b, type=pa.int64())}))
        lab = dict(zip(clusters["vec_id"].to_pylist(),
                       clusters["cluster_id"].to_pylist()))
        dropped = {d for d, c in lab.items() if c < d}
        assert dropped, "corpus must actually contain semantic near-dups"
        exp = docs[~docs.doc_id.isin(dropped)]
        got = surv.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, exp.sort_values("doc_id").reset_index(drop=True))


class TestRedactParityProperty:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # alphabet chosen to hit every pattern arm and its boundaries: emails,
    # dotted quads, +phones, digit runs, and RE2 metacharacter bait
    text_st = st.lists(
        st.text(alphabet=st.sampled_from(list("ab9@.+-_ %1")), max_size=30),
        min_size=1, max_size=8)

    @settings(max_examples=120, deadline=None)
    @given(text_st)
    def test_arrow_chain_equals_duckdb_chain(self, texts):
        import duckdb

        from logparse_rs_ray.pipelines.logops import _redact_sql, redact_pii

        red, hits = redact_pii(pa.array(texts, type=pa.string()))
        con = duckdb.connect()
        con.execute("CREATE TABLE events AS SELECT * FROM (SELECT "
                    "row_number() OVER () - 1 AS event_id, col0 AS props "
                    "FROM (SELECT UNNEST(?) AS col0))", [texts])
        want = con.execute(_redact_sql()).df()
        assert red.to_pylist() == want.redacted.tolist()
        assert hits.to_pylist() == [int(x) for x in want.n_hits]


# --- review regressions (round-3 self-review findings) -----------------------

class TestDDBinsSentinels:
    def test_nan_and_inf_degrade_not_poison(self):
        from logparse_rs_ray.functions.sketches import dd_bins

        bins = dd_bins(np.array([np.nan, np.inf, -np.inf, 0.0, -5.0, 1.0, 1e308]))
        # every sentinel lands in a bounded far bin; nothing wraps to
        # INT64_MIN (which overflowed the grouped packer's key arithmetic)
        assert bins.min() > -50_000 and bins.max() < 50_000
        assert bins[0] == bins[3] == bins[4]       # nan == clamped zero/neg
        assert bins[1] == bins[6]                  # inf == clamped 1e308

    @pytest.mark.usefixtures("ray_session")
    def test_grouped_quantiles_survive_nan_rows(self, tmp_path):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.logops import log_value_quantiles_by_type

        ts = pd.to_datetime(["2024-01-01"] * 6)
        t = pa.table({"ts": pa.array(ts, type=pa.timestamp("us")),
                      "event_type": pa.array(["a", "a", "a", "a", "b", "b"]),
                      "user_id": pa.array([0] * 6, type=pa.int64()),
                      "event_id": pa.array(range(6), type=pa.int64()),
                      "value": pa.array([1.0, 2.0, 4.0, float("nan"),
                                         10.0, 10.0]),
                      "props": pa.array(["{}"] * 6)})
        pq.write_table(t, tmp_path / "events.parquet")
        out = log_value_quantiles_by_type(str(tmp_path)).to_pandas()
        # the NaN row degrades one tail estimate of group 'a'; group 'b'
        # is exact within the sketch bound and nothing crashes
        assert set(out.event_type) == {"a", "b"}
        b = out.set_index("event_type").loc["b"]
        assert abs(b.p50 - 10.0) <= 0.25


@pytest.mark.usefixtures("ray_session")
class TestPivotUnknownSource:
    def test_out_of_domain_source_keeps_lang_row(self, tmp_path):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.relational import q_pivot_lang_source

        t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                      "text": pa.array(["x", "y", "z"]),
                      "lang": pa.array(["en", "en", "zz"]),
                      "source": pa.array(["src3", "src99", "weird"]),
                      "n_chars": pa.array([1, 1, 1], type=pa.int64())})
        pq.write_table(t, tmp_path / "documents.parquet")
        out = q_pivot_lang_source(str(tmp_path)).to_pandas().set_index("lang")
        # unknown sources contribute zero but the lang rows survive —
        # matching the SQL oracle's CASE WHEN semantics (never a KeyError)
        assert set(out.index) == {"en", "zz"}
        assert out.loc["en", "src3"] == 1
        assert out.loc["en"].drop("src3").sum() == 0
        assert out.loc["zz"].sum() == 0


@pytest.mark.usefixtures("ray_session")
class TestSemanticClustersRegimes:
    def test_pairs_ds_override_distributed_equals_union_find(self):
        from logparse_rs_ray.pipelines.dedup import (_semantic_pairs_ds,
                                                     neardup_clusters)

        fast = neardup_clusters(SF, pairs_ds=_semantic_pairs_ds(SF))
        forced = neardup_clusters(SF, pairs_ds=_semantic_pairs_ds(SF),
                                  small_graph_max_pairs=1)
        assert fast.num_rows > 1          # regime actually exercised
        assert fast.sort_by("vec_id").equals(forced.sort_by("vec_id"))


@pytest.mark.usefixtures("ray_session")
class TestLmScore:
    SF = "/root/testdata/sf0.001"

    @staticmethod
    def _oracle():
        import numpy as np
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.textops import LM_SAMPLE_MOD, _LM_KNUTH

        t = pq.read_table(f"{TestLmScore.SF}/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas()
        cnt = np.zeros(65536, dtype=np.int64)
        for _, r in t.iterrows():
            if (int(r["doc_id"]) * _LM_KNUTH) % (1 << 32) % LM_SAMPLE_MOD == 0:
                bs = r["text"].encode("utf-8")
                for i in range(len(bs) - 1):
                    cnt[bs[i] * 256 + bs[i + 1]] += 1
        row_tot = cnt.reshape(256, 256).sum(axis=1)
        logp = np.log2((cnt + 1.0) / np.repeat(row_tot + 256.0, 256))
        want = {}
        for _, r in t.iterrows():
            bs = r["text"].encode("utf-8")
            n = max(len(bs) - 1, 0)
            bits = (-sum(logp[bs[i] * 256 + bs[i + 1]] for i in range(n)) / n
                    if n else 0.0)
            want[int(r["doc_id"])] = (n, int(np.floor(bits * 1000)))
        return want

    def test_matches_serial_oracle_exactly(self):
        from logparse_rs_ray.pipelines.textops import doc_lm_score

        out = doc_lm_score(self.SF).to_pandas()
        want = self._oracle()
        assert len(out) == len(want)
        for _, r in out.iterrows():
            assert (r["n_pairs"], r["bits_x1000"]) == want[r["doc_id"]], \
                r["doc_id"]

    def test_fluent_text_beats_noise(self):
        # the whole point of the filter: text drawn from the corpus
        # distribution must score fewer bits/byte than uniform byte noise
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from logparse_rs_ray.pipelines.textops import doc_lm_score

        rng = np.random.default_rng(7)
        noise = "".join(chr(c) for c in rng.integers(33, 127, size=4000))
        fluent = pq.read_table(
            f"{self.SF}/documents.parquet",
            columns=["text"])["text"][1].as_py()
        import os
        import shutil
        tmp = "/tmp/lm_score_probe"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(pa.table({
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array([fluent, noise]),
        }), f"{tmp}/documents.parquet")
        out = doc_lm_score(tmp).to_pandas().set_index("doc_id")
        assert out.loc[0, "bits_x1000"] < out.loc[1, "bits_x1000"]

    def test_sortless_plan(self):
        from logparse_rs_ray.pipelines.textops import doc_lm_score

        out = doc_lm_score(self.SF)
        out.count()  # execute so stats() carries the real plan
        assert "Sort" not in out.stats()


@pytest.mark.usefixtures("ray_session")
class TestMedianRefinement:
    SF = "/root/testdata/sf0.001"

    @staticmethod
    def _pandas_rule(q):
        # quantile_disc: k-th smallest with k = ceil(n*q), per group
        import pyarrow.parquet as pq

        t = pq.read_table(f"{TestMedianRefinement.SF}/orders.parquet",
                          columns=["o_orderpriority", "o_totalprice"]
                          ).to_pandas()
        t["cents"] = np.round(t["o_totalprice"] * 100).astype(np.int64)
        want = {}
        for prio, g in t.groupby("o_orderpriority"):
            v = np.sort(g["cents"].to_numpy())
            want[prio] = int(v[max(int(np.ceil(q * len(v))), 1) - 1])
        return want

    def test_matches_pandas_rule_all_quantiles(self):
        from logparse_rs_ray.pipelines.relational import (
            MEDIAN_QS, _q_col, q_median_price_by_priority)

        out = q_median_price_by_priority(self.SF).to_pandas()
        for q in MEDIAN_QS:
            want = self._pandas_rule(q)
            got = dict(zip(out["o_orderpriority"], out[_q_col(q)]))
            assert got == want, q

    def test_forced_multipass_equals_default(self):
        # nbins=4 forces ~13 passes over the cents domain — every driver
        # narrowing step is exercised, the answer must not move
        from logparse_rs_ray.pipelines.relational import (
            q_median_price_by_priority)

        slow = q_median_price_by_priority(self.SF, nbins=4, max_passes=16)
        fast = q_median_price_by_priority(self.SF)
        assert slow.equals(fast)

    def test_single_quantile_variant(self):
        from logparse_rs_ray.pipelines.relational import (
            q_median_price_by_priority)

        out = q_median_price_by_priority(self.SF, qs=(0.99,)).to_pandas()
        want = self._pandas_rule(0.99)
        got = dict(zip(out["o_orderpriority"], out["p99_cents"]))
        assert got == want


@pytest.mark.usefixtures("ray_session")
class TestUnpivot:
    SF = "/root/testdata/sf0.001"

    def test_matches_pandas_melt(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.relational import (
            UNPIVOT_MEASURES, q_unpivot_lineitem)

        out = q_unpivot_lineitem(self.SF).to_pandas()
        raw = pq.read_table(
            f"{self.SF}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber"] +
                    [c for _, c in UNPIVOT_MEASURES]).to_pandas()
        assert len(out) == 4 * len(raw)
        melted = raw.melt(id_vars=["l_orderkey", "l_linenumber"],
                          var_name="col", value_name="val")
        melted["measure"] = melted["col"].str.removeprefix("l_")
        melted["value_x100"] = np.round(
            melted["val"] * 100).astype(np.int64)
        melted["l_linenumber"] = melted["l_linenumber"].astype(np.int64)
        key = ["l_orderkey", "l_linenumber", "measure", "value_x100"]
        a = out[key].sort_values(key).reset_index(drop=True)
        b = melted[key].sort_values(key).reset_index(drop=True)
        assert a.equals(b)

    def test_sortless_plan(self):
        from logparse_rs_ray.pipelines.relational import q_unpivot_lineitem

        out = q_unpivot_lineitem(self.SF)
        out.count()
        assert "Sort" not in out.stats()


@pytest.mark.usefixtures("ray_session")
class TestKeepBest:
    SF = "/root/testdata/sf0.001"

    @staticmethod
    def _mk_corpus(tmpdir):
        import os
        import shutil

        import pyarrow.parquet as pq

        shutil.rmtree(tmpdir, ignore_errors=True)
        os.makedirs(tmpdir)
        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep green forest before dusk "
                "falls softly over the quiet sleeping valley tonight ") * 3
        docs = {
            10: base,                                  # cluster A, short
            11: base.replace("forest", "woods", 1),    # cluster A, short
            12: base + "plus an extra tail of several additional tokens "
                       "making this copy clearly the longest one",  # A, BEST
            20: "completely different unrelated text about ships " * 8,
            21: "completely different unrelated text about ships " * 8,
            30: "a lone singleton document with its own unique words here",
            31: "another independent solitary text sharing no shingles",
        }
        pq.write_table(pa.table({
            "doc_id": pa.array(sorted(docs), type=pa.int64()),
            "text": pa.array([docs[i] for i in sorted(docs)]),
            "source": pa.array([f"src{i % 3}" for i in sorted(docs)]),
        }), f"{tmpdir}/documents.parquet")
        return docs

    def test_longest_wins_ties_to_min_id(self):
        from logparse_rs_ray.pipelines.dedup import (
            dedup_minhash_keep_best, dedup_minhash_survivors)

        tmp = "/tmp/keep_best_probe"
        self._mk_corpus(tmp)
        best = sorted(dedup_minhash_keep_best(tmp).to_pandas()["doc_id"])
        keep1 = sorted(dedup_minhash_survivors(tmp).to_pandas()["doc_id"])
        # cluster A {10,11,12}: longest (12) survives under keep-best,
        # min id (10) under keep-one; tie cluster {20,21} -> 20 both ways
        assert best == [12, 20, 30, 31]
        assert keep1 == [10, 20, 30, 31]
        assert len(best) == len(keep1)  # same dedup cardinality

    def test_serial_replay_on_real_corpus(self):
        import re

        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import (
            _union_find_clusters, dedup_minhash_keep_best,
            verified_pairs_ngram)

        out = sorted(dedup_minhash_keep_best(self.SF).to_pandas()["doc_id"])

        pairs = verified_pairs_ngram(self.SF).rename_columns(
            ["vec_a", "vec_b", "jaccard_pct"])
        clusters = _union_find_clusters(pairs).to_pandas()
        docs = pq.read_table(f"{self.SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        ntok = {int(r["doc_id"]): len(re.findall(r"\S+", r["text"]))
                for _, r in docs.iterrows()}
        drop = set()
        for _, grp in clusters.groupby("cluster_id"):
            ids = [int(x) for x in grp["vec_id"]]
            winner = max(ids, key=lambda i: (ntok[i], -i))
            drop.update(set(ids) - {winner})
        want = sorted(set(docs["doc_id"].astype(int)) - drop)
        assert out == want


@pytest.mark.usefixtures("ray_session")
class TestOverlapPairs:
    SF = "/root/testdata/sf0.001"

    @staticmethod
    def _serial_fps(text: str, k: int, p: int) -> set:
        import numpy as np

        data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        if len(data) < k:
            return set()
        h = np.zeros(len(data) - k + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                h = h * np.uint64(0x100000001B3) + data[j:len(data) - k + 1 + j]
        return set(int(x) for x in h[h % np.uint64(p) == 0].view(np.int64))

    @classmethod
    def _serial_pairs(cls, docs: dict, *, k=16, p=8, min_shared=3,
                      max_bucket=256) -> dict:
        from collections import Counter, defaultdict

        fps = {i: cls._serial_fps(t, k, p) for i, t in docs.items()}
        by_fp = defaultdict(list)
        for i, s in fps.items():
            for f in s:
                by_fp[f].append(i)
        shared = Counter()
        for f, ids in by_fp.items():
            if 2 <= len(ids) <= max_bucket:   # over-cap = stop-fingerprint
                ids = sorted(ids)
                for x in range(len(ids)):
                    for y in range(x + 1, len(ids)):
                        shared[(ids[x], ids[y])] += 1
        return {pr: c for pr, c in shared.items() if c >= min_shared}

    def test_matches_serial_replica_on_real_corpus(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import doc_overlap_pairs

        out = doc_overlap_pairs(self.SF).to_pandas()
        docs = dict(zip(
            *(c.to_pylist() for c in pq.read_table(
                f"{self.SF}/documents.parquet",
                columns=["doc_id", "text"]).columns)))
        want = self._serial_pairs(docs)
        got = {(int(r["doc_a"]), int(r["doc_b"])): int(r["n_shared"])
               for _, r in out.iterrows()}
        assert got == want
        assert len(got) > 0  # the corpus has near-dups; shared fps exist

    def test_containment_detected_unrelated_not(self):
        import os
        import shutil

        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import doc_overlap_pairs

        rng = np.random.default_rng(5)

        def rand_text(n):
            return "".join(chr(c) for c in rng.integers(97, 123, size=n))

        big = rand_text(3000)
        contained = rand_text(200) + big[1000:1600] + rand_text(200)
        unrelated = rand_text(1500)
        tmp = "/tmp/overlap_probe"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array([big, contained, unrelated]),
        }), f"{tmp}/documents.parquet")
        out = doc_overlap_pairs(tmp, min_shared=2).to_pandas()
        pairs = {(int(r["doc_a"]), int(r["doc_b"])) for _, r in out.iterrows()}
        assert (1, 2) in pairs      # the 600-byte shared slice is seen
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_stop_fingerprint_cap(self):
        import os
        import shutil

        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import doc_overlap_pairs

        # 6 docs all sharing one boilerplate slab; max_bucket=4 makes its
        # fingerprints stop-fps -> no pairs survive
        slab = "shared boilerplate text that appears everywhere " * 10
        tmp = "/tmp/overlap_stopfp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(6), type=pa.int64()),
            "text": pa.array([f"doc {i} intro. " + slab for i in range(6)]),
        }), f"{tmp}/documents.parquet")
        dropped = doc_overlap_pairs(tmp, max_bucket=4, min_shared=2)
        kept = doc_overlap_pairs(tmp, max_bucket=256, min_shared=2)
        assert dropped.count() == 0
        assert kept.count() == 15   # all C(6,2) pairs share the slab

    def test_block_composition_independence(self):
        from logparse_rs_ray.pipelines.dedup import doc_overlap_pairs

        a = doc_overlap_pairs(self.SF).to_pandas()
        b = doc_overlap_pairs(self.SF, num_partitions=3,
                              mode="shuffle").to_pandas()
        key = ["doc_a", "doc_b", "n_shared"]
        assert a[key].sort_values(key).reset_index(drop=True).equals(
            b[key].sort_values(key).reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
class TestCdcChunkDedup:
    SF = "/root/testdata/sf0.001"

    @staticmethod
    def _serial_chunks(text: str, k=16, p=64, min_chunk=16) -> list:
        """Pinned chunk rule: starts = {0} + selections kept by the
        min-chunk clamp (>= min_chunk after the previous RAW selection or
        the doc start)."""
        data = text.encode("utf-8")
        if not data:
            return []
        starts = [0]
        if len(data) >= k:
            arr = np.frombuffer(data, dtype=np.uint8)
            hs = np.zeros(len(arr) - k + 1, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(k):
                    hs = hs * np.uint64(0x100000001B3) + arr[j:len(arr) - k + 1 + j]
            raw = [int(x) for x in np.nonzero(hs % np.uint64(p) == 0)[0]]
            prev = 0
            for j in raw:
                if j - prev >= min_chunk and j != 0:
                    starts.append(j)
                prev = j
        ss = sorted(set(starts))
        return [data[a:b] for a, b in zip(ss, ss[1:] + [len(data)])]

    @classmethod
    def _serial_census(cls, docs: dict) -> dict:
        from collections import Counter

        chunks = {i: cls._serial_chunks(t) for i, t in docs.items()}
        counts = Counter(c for cs in chunks.values() for c in cs)
        return {i: (sum(counts[c] >= 2 for c in cs), len(cs))
                for i, cs in chunks.items() if cs}

    def test_matches_serial_replica(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import doc_cdc_chunk_dedup

        out = doc_cdc_chunk_dedup(self.SF).to_pandas()
        docs = dict(zip(*(c.to_pylist() for c in pq.read_table(
            f"{self.SF}/documents.parquet",
            columns=["doc_id", "text"]).columns)))
        want = self._serial_census(docs)
        got = {int(r["doc_id"]): (int(r["n_dup_chunks"]), int(r["n_chunks"]))
               for _, r in out.iterrows()}
        assert got == want
        assert any(d > 0 for d, _ in got.values())  # corpus has shared runs

    def test_insertion_robustness(self):
        """A mid-doc insertion must leave MOST chunks shared — the whole
        point of content-defined over fixed-offset chunking."""
        import os
        import shutil

        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import doc_cdc_chunk_dedup

        rng = np.random.default_rng(9)
        base = "".join(chr(c) for c in rng.integers(97, 123, size=6000))
        edited = base[:3000] + "INSERTED TEN" + base[3000:]
        tmp = "/tmp/cdc_probe"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array([base, edited]),
        }), f"{tmp}/documents.parquet")
        out = doc_cdc_chunk_dedup(tmp).to_pandas().set_index("doc_id")
        frac = out.loc[1, "n_dup_chunks"] / out.loc[1, "n_chunks"]
        assert frac > 0.6, dict(out["n_dup_chunks"])
        # unrelated control: fresh random text shares nothing
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array([base,
                              "".join(chr(c) for c in
                                      rng.integers(97, 123, size=6000))]),
        }), f"{tmp}/documents.parquet")
        out2 = doc_cdc_chunk_dedup(tmp).to_pandas()
        # unrelated docs share (near) nothing — tolerate rare sub-min-size
        # tail-chunk collisions
        assert (out2["n_dup_chunks"] / out2["n_chunks"]).max() < 0.05

    def test_edges(self):
        import os
        import shutil

        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import doc_cdc_chunk_dedup

        tmp = "/tmp/cdc_edge"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(["tiny", "", None, "tiny"]),
        }), f"{tmp}/documents.parquet")
        out = doc_cdc_chunk_dedup(tmp).to_pandas().set_index("doc_id")
        # empty/null docs absent; sub-k docs are one whole chunk; the two
        # identical tiny docs deduplicate against each other
        assert sorted(out.index) == [1, 4]
        assert (out["n_chunks"] == 1).all() and (out["n_dup_chunks"] == 1).all()


@pytest.mark.usefixtures("ray_session")
class TestOverlapSurvivors:
    SF = "/root/testdata/sf0.001"

    def test_contained_doc_dropped_partial_overlap_kept(self):
        import os
        import shutil

        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import doc_overlap_survivors

        rng = np.random.default_rng(13)

        def rand_text(n):
            return "".join(chr(c) for c in rng.integers(97, 123, size=n))

        big = rand_text(4000)
        subset = big[500:2500]                 # fully contained excerpt
        half_a = rand_text(1500) + big[3000:3600]  # partial overlap with big
        unrelated = rand_text(2000)
        tmp = "/tmp/overlap_surv_probe"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array([big, subset, half_a, unrelated]),
            "source": pa.array(["s"] * 4),
        }), f"{tmp}/documents.parquet")
        out = doc_overlap_survivors(tmp, min_shared=2)
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        kept = sorted(df["doc_id"])
        # subset (2) is >=80% contained in big -> dropped; the partial
        # overlapper (3) shares only ~25% of its own fingerprints -> kept
        assert kept == [1, 3, 4]

    def test_serial_replica_on_real_corpus(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import doc_overlap_survivors

        out = doc_overlap_survivors(self.SF)
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        got = sorted(int(x) for x in df["doc_id"])

        docs = dict(zip(*(c.to_pylist() for c in pq.read_table(
            f"{self.SF}/documents.parquet",
            columns=["doc_id", "text"]).columns)))
        fps = {i: TestOverlapPairs._serial_fps(t, 16, 8)
               for i, t in docs.items()}
        pairs = TestOverlapPairs._serial_pairs(docs)
        drop = set()
        for (x, y), s in pairs.items():
            cx, cy = len(fps[x]), len(fps[y])
            small = x if (cx < cy or (cx == cy and x > y)) else y
            if s * 100 >= 80 * (len(fps[small])):
                drop.add(small)
        want = sorted(set(docs) - drop)
        assert got == want
        assert len(drop) > 0   # the corpus has contained near-dups

    def test_no_pairs_keeps_everything(self):
        import os
        import shutil

        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import doc_overlap_survivors

        tmp = "/tmp/overlap_surv_nodup"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["alpha beta gamma words",
                              "entirely different text content"]),
            "source": pa.array(["a", "b"]),
        }), f"{tmp}/documents.parquet")
        out = doc_overlap_survivors(tmp)
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert sorted(df["doc_id"]) == [1, 2]
