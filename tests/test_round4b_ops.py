"""Round-4 continuation operators: inverted-index build, quality-weighted
deterministic sampling, bigram phrase statistics.

Each test pins the operator against a serial Python oracle on an engineered
corpus (the DuckDB oracle runs in the gate replica; these cover the edges
the gate's generated corpus may not hit: posting-list caps, rate clamps,
whitespace-run tokenization)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts, n_chars=None, sources=None):
    import pyarrow.parquet as pq

    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources or ["src1"] * n),
        "n_chars": pa.array(n_chars or [len(x) for x in texts],
                            type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


@pytest.mark.usefixtures("ray_session")
class TestInvertedIndex:
    def test_matches_serial_index_and_caps_postings(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_inverted_index

        # 'hot' appears in 20 docs (> cap=16); 'rare' in one; multi-space
        # and repeated-within-doc tokens exercise the distinct rule
        texts = [f"hot  doc{i} filler" for i in range(20)]
        texts.append("rare rare rare")
        sf = _write_docs(tmp_path, texts)
        out = doc_inverted_index(sf).to_pandas().set_index("term")

        serial: dict[str, set[int]] = {}
        for i, tx in enumerate(texts):
            for tok in set(_tokens(tx)):
                serial.setdefault(tok, set()).add(i)
        assert set(out.index) == set(serial)
        for term, docs in serial.items():
            assert out.loc[term, "df"] == len(docs)
            want = ",".join(str(d) for d in sorted(docs)[:16])
            assert out.loc[term, "postings"] == want
        # the capped hot term still reports its FULL document frequency
        assert out.loc["hot", "df"] == 20
        assert out.loc["hot", "postings"].count(",") == 15

    def test_sf_runs_and_df_agrees_with_term_df(self):
        from logparse_rs_ray.pipelines.textops import (doc_inverted_index,
                                                       doc_term_df)

        idx = doc_inverted_index(SF).to_pandas().set_index("term")
        top = doc_term_df(SF).to_pandas()
        # the index must agree with the independent df plan on its top terms
        for _, r in top.iterrows():
            assert idx.loc[r["term"], "df"] == r["df"]


@pytest.mark.usefixtures("ray_session")
class TestWeightedSample:
    def test_membership_matches_serial_rule(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import (SHUFFLE_KNUTH,
                                                       doc_weighted_sample)

        # n_chars spanning below/above the clamp; ids past 2^32 exercise the
        # fold
        n = 500
        ids = list(range(n - 2)) + [2**33 + 7, 2**40 + 1]
        import pyarrow.parquet as pq

        t = pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(["x"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["src1"] * n),
            "n_chars": pa.array([(7 * i) % 1200 for i in range(n)],
                                type=pa.int64()),
        })
        pq.write_table(t, tmp_path / "documents.parquet")
        out = doc_weighted_sample(str(tmp_path)).to_pandas()

        kept = set()
        permille_of = {}
        for i, d in enumerate(ids):
            n_chars = (7 * i) % 1200
            permille = min(900, 100 + n_chars)
            h = (((d + 12345) % 2**32) * SHUFFLE_KNUTH) % 2**32 % 1000
            permille_of[d] = permille
            if h < permille:
                kept.add(d)
        assert set(out.doc_id) == kept
        for _, r in out.iterrows():
            assert r["permille"] == permille_of[r["doc_id"]]
        # rates clamp at 900 so even the longest docs can be dropped
        assert out.permille.max() <= 900

    def test_deterministic_and_rate_proportional(self):
        from logparse_rs_ray.pipelines.textops import doc_weighted_sample

        a = doc_weighted_sample(SF).to_pandas().sort_values("doc_id")
        b = doc_weighted_sample(SF).to_pandas().sort_values("doc_id")
        assert list(a.doc_id) == list(b.doc_id)
        # long docs must be kept at a visibly higher rate than short ones
        # (47..558 chars -> 147..658 permille at sf0.001)
        assert 0.1 < len(a) / 500 < 0.95


@pytest.mark.usefixtures("ray_session")
class TestBigramPhrases:
    def test_matches_serial_counter(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_bigram_phrases

        texts = [
            "the cat sat on the mat",
            "the cat  ran",          # double space: still adjacent
            " leading space the cat",
            "single",
            "",
            "the cat the cat the cat",
        ]
        sf = _write_docs(tmp_path, texts)
        out = doc_bigram_phrases(sf).to_pandas()

        c: Counter = Counter()
        for tx in texts:
            toks = _tokens(tx)
            c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        want = dict(sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50])
        got = dict(zip(out.bigram, out.cnt))
        assert got == want

    def test_topk_tiebreak_is_lexicographic(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_bigram_phrases

        # 60 distinct bigrams all with count 1: top-50 must be the 50
        # lexicographically smallest (matching ORDER BY cnt DESC, bigram)
        texts = [f"w{i:02d} z" for i in range(60)]
        sf = _write_docs(tmp_path, texts)
        out = doc_bigram_phrases(sf).to_pandas()
        assert len(out) == 50
        assert sorted(out.bigram) == [f"w{i:02d} z" for i in range(50)]


@pytest.mark.usefixtures("ray_session")
class TestSourceOverlap:
    def test_matches_serial_pair_census(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_source_overlap

        texts = [
            ("breaking news today here extra words", "feedA"),
            ("breaking news today here different tail", "feedB"),
            ("breaking news today here", "feedC"),
            ("breaking news today here", "feedC"),   # same src: 1 distinct
            ("totally different start of text", "feedA"),
            ("totally different start of text", "feedB"),
            ("short one", "feedA"),
            ("short one", "feedB"),
            ("", "feedA"),
            ("", "feedB"),
        ]
        import pyarrow.parquet as pq

        t = pa.table({
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array([x[0] for x in texts]),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array([x[1] for x in texts]),
            "n_chars": pa.array([len(x[0]) for x in texts], type=pa.int64()),
        })
        pq.write_table(t, tmp_path / "documents.parquet")
        out = doc_source_overlap(str(tmp_path)).to_pandas()

        from itertools import combinations
        serial: Counter = Counter()
        by_src: dict[str, set] = {}
        for tx, src in texts:
            pfx = " ".join(_tokens(tx)[:4])
            by_src.setdefault(src, set()).add(pfx)
        for a, b in combinations(sorted(by_src), 2):
            n = len(by_src[a] & by_src[b])
            if n:
                serial[(a, b)] = n
        got = {(r.source_a, r.source_b): r.n_shared
               for r in out.itertuples()}
        assert got == dict(serial)
        # feedA-feedB share 4 distinct prefixes ('breaking news today
        # here', 'totally different start of', 'short one', ''); feedC's
        # duplicate doc contributes its prefix ONCE
        assert got[("feedA", "feedB")] == 4
        assert got[("feedA", "feedC")] == 1

    def test_sf_bounded_and_symmetric_free(self):
        from logparse_rs_ray.pipelines.textops import doc_source_overlap

        out = doc_source_overlap(SF).to_pandas()
        # strictly ordered pairs only, never a self-pair or both polarities
        assert (out.source_a < out.source_b).all()
        assert (out.n_shared >= 1).all()


@pytest.mark.usefixtures("ray_session")
class TestPcaTop:
    def test_matches_numpy_eigh_on_quantized_covariance(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.similarity import (PCA_SCALE_BITS,
                                                          embed_pca_top)

        out = embed_pca_top(SF, k=4)
        emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
        X = np.asarray(emb["embedding"].combine_chunks().flatten(),
                       dtype=np.float64).reshape(len(emb), -1)
        Q = np.round(X * float(1 << PCA_SCALE_BITS))
        Qf = Q / float(1 << PCA_SCALE_BITS)
        mu = Qf.mean(axis=0)
        C = (Qf.T @ Qf) / len(Qf) - np.outer(mu, mu)
        w, V = np.linalg.eigh(C)
        w, V = w[::-1], V[:, ::-1]
        d = X.shape[1]
        for comp in range(4):
            got = out[out.component == comp].sort_values("dim")
            v = got.loading_x1e6.to_numpy() / 1e6
            cos = abs(v @ V[:, comp]) / np.linalg.norm(v)
            assert cos >= 0.9999, (comp, cos)
            lam = got.eigenvalue_x1e9.iloc[0] / 1e9
            # power iteration converges geometrically in the eigengap;
            # 1e-5 relative is far below any consumer's noise floor
            assert abs(lam - w[comp]) <= 1e-5 * max(w[comp], 1e-9)
            assert len(got) == d
        # eigenvalues come out descending
        eigs = out.groupby("component").eigenvalue_x1e9.first()
        assert list(eigs) == sorted(eigs, reverse=True)

    def test_gram_partial_is_block_composition_independent(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.similarity import pca_gram_partial

        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        whole = pca_gram_partial(t).to_pandas().set_index("idx").val
        # any split of the corpus sums to the identical integer statistics
        for cut in (1, 137, 250, 499):
            a = pca_gram_partial(t.slice(0, cut)).to_pandas().set_index("idx").val
            b = pca_gram_partial(t.slice(cut)).to_pandas().set_index("idx").val
            assert ((a + b) == whole).all()

    def test_determinism(self):
        from logparse_rs_ray.pipelines.similarity import embed_pca_top

        a = embed_pca_top(SF, k=2)
        b = embed_pca_top(SF, k=2)
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
class TestReservoirSample:
    def test_matches_serial_bottom_k(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.textops import (SHUFFLE_KNUTH,
                                                       doc_reservoir_sample)

        out = doc_reservoir_sample(SF).to_pandas()
        ids = pq.read_table(f"{SF}/documents.parquet",
                            columns=["doc_id"])["doc_id"].to_pylist()
        ranked = sorted(ids, key=lambda d: (
            ((d + 777) % 2**32 * SHUFFLE_KNUTH) % 2**32, d))
        assert sorted(out.doc_id) == sorted(ranked[:100])
        assert len(out) == 100
        # h column carries the rank key (auditability of the draw)
        for _, r in out.head(5).iterrows():
            assert r["h"] == ((r["doc_id"] + 777) % 2**32
                              * SHUFFLE_KNUTH) % 2**32

    def test_exact_k_even_with_tiny_blocks(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_reservoir_sample

        sf = _write_docs(tmp_path, [f"doc {i}" for i in range(37)])
        out = doc_reservoir_sample(sf, k=10).to_pandas()
        assert len(out) == 10


@pytest.mark.usefixtures("ray_session")
class TestEmbedOutliers:
    def test_matches_serial_residual_replica(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.similarity import (PCA_SCALE_BITS,
                                                          _pca_stats,
                                                          embed_outliers)

        out = embed_outliers(SF, n_components=8, top=50).to_pandas()
        comps, mu, _ = _pca_stats(SF, 8, 200, PCA_SCALE_BITS)
        V = np.stack(comps)
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        X = np.asarray(t["embedding"].combine_chunks().flatten(),
                       dtype=np.float64).reshape(len(t), -1)
        ids = np.asarray(t["vec_id"])
        Xc = X - mu
        P = Xc @ V.T
        res = np.einsum("ij,ij->i", Xc, Xc) - np.einsum("ij,ij->i", P, P)
        r = np.round(np.maximum(res, 0.0) * 1e9).astype(np.int64)
        order = np.lexsort((ids, -r))[:50]
        want = list(zip(ids[order], r[order]))
        got = list(zip(out.vec_id, out.residual_x1e9))
        assert got == want
        # residuals are sorted descending and non-negative
        assert (out.residual_x1e9 >= 0).all()
        assert list(out.residual_x1e9) == sorted(out.residual_x1e9,
                                                 reverse=True)

    def test_more_components_shrink_residuals(self):
        from logparse_rs_ray.pipelines.similarity import embed_outliers

        r2 = embed_outliers(SF, n_components=2, top=10).to_pandas()
        r16 = embed_outliers(SF, n_components=16, top=10).to_pandas()
        # projecting onto a larger subspace can only remove more energy
        assert r16.residual_x1e9.max() <= r2.residual_x1e9.max()
