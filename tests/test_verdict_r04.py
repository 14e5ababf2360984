"""Regression tests for VERDICT r03 items (round 4).

Item 2 done-criterion: the ~20 corpus-sized per-doc/per-event outputs no
longer end in a global ``Dataset.sort()`` — no ``AllToAllOperator[Sort]``
in the executed plan.  The correctness gate compares order-insensitively
(it accepted the sortless ``log_redact_pii`` in round 3), so ordering the
full output corpus was pure all-to-all waste at scale.
"""
from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# Every query whose output is corpus-proportional (one row per doc / vector /
# event / user / order) and which previously carried a trailing global sort.
SORTLESS_QUERIES = [
    "doc_quality",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_len_rank",
    "doc_decontaminate",
    "doc_repetition",
    "doc_shuffle_shards",
    "doc_pack_sequences",
    "doc_chunk",
    "doc_tfidf_top",
    "mm_decode_meta",
    "mm_thumbnails",
    "mm_frame_samples",
    "mm_audio_levels",
    "doc_exact_dedup",
    "dedup_exact_hash",
    "dedup_simhash_pairs",
    "doc_passage_dedup",
    "doc_semantic_pairs",
    "doc_curation",
    "embed_cluster_assign",
    "log_anonymize_users",
    "log_sessionize",
    "log_semi_join_purchasers",
    "log_semi_join_bloom",
    "log_asof_last_signup",
    "log_first_event_per_user",
    "q_having_active_customers",
    "q_orders_running_total",
    "q_above_avg_orders",
    "q_full_outer_join",
    # round-4 additions with corpus-proportional outputs: born sortless
    "doc_quality_classifier",
    "doc_vocab_coverage",
    "q_top_orders_per_customer",
    "q_moving_avg_orders",
    "q_ntile_orders",
    "doc_lm_score",
    "q_unpivot_lineitem",
    "doc_inverted_index",
    "doc_weighted_sample",
    # continuation-4 additions with corpus-proportional outputs
    "q_rank_customers",
    "q_first_last_order",
    "q_range_window_revenue",
    "doc_soft_dedup_weights",
    "log_burst_census",
    "doc_compressibility",
    # survivor anti-joins (minhash/simhash/semantic) return a pa.Table in
    # the broadcast regime — covered by their own two-regime pytests
]


class TestRound4Ops:
    """Kernel-level checks for the round-4 operators (their end-to-end
    values are oracle-gated; these pin the edges the oracle can't see)."""

    def test_modality_sniffer_unknown_payload(self):
        import pyarrow as pa

        from logparse_rs_ray.pipelines.multimodal import ModalitySniffer

        sniff = ModalitySniffer()
        out = sniff(pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "payload": pa.array([b"\x89PNG\r\n\x1a\nxx", b"nope", b""],
                                type=pa.binary()),
        }))
        assert out["modality"].to_pylist() == ["image", "unknown", "unknown"]
        assert out["n_bytes"].to_pylist() == [10, 4, 0]

    def test_quality_classifier_empty_and_edge_docs(self):
        import pyarrow as pa

        from logparse_rs_ray.pipelines.textops import QualityClassifier

        clf = QualityClassifier()
        out = clf(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["", "the and of a to in is " * 10]),
        }))
        # null text scores exactly like an empty doc (real crawls have nulls)
        nulls = clf(pa.table({
            "doc_id": pa.array([9], type=pa.int64()),
            "text": pa.array([None], type=pa.string()),
        }))
        assert nulls["score"].to_pylist() == [out["score"].to_pylist()[0]]
        assert nulls["keep"].to_pylist() == [0]
        assert out["score"].to_pylist()[0] == -QualityClassifier.TARGET_MEAN100 // QualityClassifier.DIV
        assert out["keep"].to_pylist()[0] == 0
        assert out["keep"].to_pylist()[1] == 1  # stopword-rich doc passes

    @pytest.mark.usefixtures("ray_session")
    def test_priority_dedup_numeric_rank_beats_doc_id(self, tmp_path):
        """src2 beats src10 (numeric rank, not lexicographic) even when the
        src10 copy has the smaller doc_id; singletons keep themselves."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import dedup_exact_priority

        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": ["dup text", "dup text", "dup text", "unique"],
            "source": ["src10", "src2", "src5", "src7"],
        })
        pq.write_table(tbl, tmp_path / "documents.parquet")
        out = (dedup_exact_priority(str(tmp_path)).to_pandas()
               .sort_values("keeper_doc_id").reset_index(drop=True))
        assert out.keeper_doc_id.tolist() == [2, 4]
        assert out.keeper_source.tolist() == ["src2", "src7"]
        assert out.n_copies.tolist() == [3, 1]

    @pytest.mark.usefixtures("ray_session")
    def test_sliding_windows_cover_each_event_twice(self):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.windows import (
            SLIDE_PER_WINDOW,
            log_sliding_window_counts,
        )

        out = log_sliding_window_counts(SF).to_pandas()
        n_events = pq.read_metadata(f"{SF}/events.parquet").num_rows
        assert out.n_events.sum() == SLIDE_PER_WINDOW * n_events
        assert (out.ws_us % 1_800_000_000 == 0).all()

    @pytest.mark.usefixtures("ray_session")
    def test_embed_quantize_error_bound_and_determinism(self):
        import numpy as np
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.similarity import (
            QUANT_SCALE_FP,
            embed_quantize,
        )

        out = embed_quantize(SF).to_pandas().sort_values("vec_id")
        emb = (pq.read_table(f"{SF}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
               .to_pandas().sort_values("vec_id"))
        X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
        scales = out.scale_x1e9.to_numpy() / QUANT_SCALE_FP
        codes = np.stack(out.codes.to_numpy()).astype(np.float64)
        assert np.abs(codes).max() <= 127
        # reconstruction error bounded by scale/2 per component
        err = np.abs(codes * scales[:, None] - X)
        assert (err <= scales[:, None] / 2 + 1e-12).all()
        again = embed_quantize(SF).to_pandas().sort_values("vec_id")
        assert (np.stack(again.codes.to_numpy()) == codes).all()

    def test_embed_quantize_zero_vector(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.similarity import embed_quantize

        t = pa.table({
            "vec_id": pa.array([0], type=pa.int64()),
            "embedding": pa.array([[0.0] * 8], type=pa.list_(pa.float32())),
            "label": pa.array([0], type=pa.int32()),
        })
        pq.write_table(t, tmp_path / "embeddings.parquet")
        out = embed_quantize(str(tmp_path)).to_pandas()
        assert out.codes.iloc[0].tolist() == [0] * 8  # no 0/0, scale=1

    @pytest.mark.usefixtures("ray_session")
    def test_vocab_coverage_bounds_and_threshold(self):
        from logparse_rs_ray.pipelines.textops import doc_vocab_coverage

        out = doc_vocab_coverage(SF).to_pandas()
        assert ((out.oov_pm >= 0) & (out.oov_pm <= 1000)).all()
        assert (out.n_oov <= out.n_words).all()


@pytest.mark.usefixtures("ray_session")
class TestKmeansCombinerHop:
    """VERDICT r03 item 4: the M-step combiner cascade (``m_step="tree"``)
    bounds the driver read at k rows per round regardless of block count."""

    def test_tree_mode_matches_driver_mode(self):
        from logparse_rs_ray.pipelines.similarity import embed_kmeans

        driver = embed_kmeans(SF, k=8, iters=3).to_pandas()
        tree = embed_kmeans(SF, k=8, iters=3, m_step="tree").to_pandas()
        assert driver.cluster.tolist() == tree.cluster.tolist()
        assert driver.n_vectors.tolist() == tree.n_vectors.tolist()

    def test_tree_mode_block_count_independent(self, tmp_path, monkeypatch):
        """Same vectors split across 1 vs 7 parquet row groups -> identical
        census (the combiner is associative over block concatenation)."""
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.similarity import embed_kmeans

        src = pq.read_table(f"{SF}/embeddings.parquet")
        one = tmp_path / "one"
        many = tmp_path / "many"
        for d, rg in ((one, src.num_rows), (many, max(1, src.num_rows // 7))):
            d.mkdir()
            pq.write_table(src, str(d / "embeddings.parquet"), row_group_size=rg)
        a = embed_kmeans(str(one), k=8, iters=2, m_step="tree").to_pandas()
        b = embed_kmeans(str(many), k=8, iters=2, m_step="tree").to_pandas()
        assert a.n_vectors.tolist() == b.n_vectors.tolist()

    def test_bad_mode_rejected(self):
        from logparse_rs_ray.pipelines.similarity import embed_kmeans

        with pytest.raises(ValueError):
            embed_kmeans(SF, m_step="nope")


@pytest.mark.usefixtures("ray_session")
class TestFlagshipEmptyCorpus:
    def test_zero_row_input_produces_empty_report(self, tmp_path):
        """A 0-row corpus flows through parse -> enrich -> route -> write ->
        consolidation without tripping any vectorized kernel or the bucket
        merge (the resumable-run edge after all partitions are filtered)."""
        import ray.data as rd

        from logparse_rs_ray.pipelines.flagship import run_flagship
        from logparse_rs_ray.webtext import generate_webtext_table

        rep = run_flagship(rd.from_arrow(generate_webtext_table(0, seed=1)),
                           str(tmp_path / "out"),
                           generated_at="2025-01-01T00:00:00Z")
        assert rep["total_logs"] == 0
        assert rep["errors"] == 0
        assert rep["by_log_type"] == []


class TestReportTopkPushdown:
    """VERDICT r03 item 3: the driver-side report collect is bounded by
    dims x k — heavy key-proportional dims are pruned per block."""

    def _tall(self, counts: dict[str, dict[str, int]]):
        import pyarrow as pa

        dims, keys, cnts = [], [], []
        for dim, kv in counts.items():
            for key, c in kv.items():
                dims.append(dim)
                keys.append(key)
                cnts.append(c)
        return pa.table({"dim": pa.array(dims), "key": pa.array(keys),
                         "count": pa.array(cnts, type=pa.int64())})

    def test_trim_kernel_prunes_heavy_dims_only(self):
        import pyarrow.compute as pc

        from logparse_rs_ray.pipelines.flagship import _trim_tall_topk

        tall = self._tall({
            "top_sources": {f"10.0.0.{i}": i for i in range(100)},
            "by_log_type": {f"t{i}": 5 for i in range(30)},
        })
        out = _trim_tall_topk(10)(tall)
        heavy = out.filter(pc.equal(out["dim"], "top_sources"))
        assert heavy.num_rows == 10
        assert sorted(heavy["count"].to_pylist(), reverse=True) == list(range(99, 89, -1))
        bounded = out.filter(pc.equal(out["dim"], "by_log_type"))
        assert bounded.num_rows == 30  # non-top-k dims pass through whole

    def test_trim_is_a_valid_prefilter_across_disjoint_blocks(self):
        """Blocks hold complete (dim, key) groups (the post-merge invariant):
        per-block trim + final assemble == assemble over the untrimmed
        table."""
        import pyarrow as pa

        from logparse_rs_ray.pipelines.flagship import (
            _assemble_report,
            _trim_tall_topk,
        )

        tall = self._tall({
            "top_sources": {f"ip{i:03d}": (i * 37) % 101 for i in range(80)},
            "top_domains": {f"d{i:03d}.com": (i * 13) % 53 for i in range(60)},
            "by_action": {"allow": 7, "deny": 3},
        })
        # disjoint key split = what a hash partition does
        blocks = [tall.slice(0, 50), tall.slice(50)]
        trim = _trim_tall_topk(10)
        trimmed = pa.concat_tables([trim(b) for b in blocks])
        assert _assemble_report(trimmed, k=10) == _assemble_report(tall, k=10)

    @pytest.mark.usefixtures("ray_session")
    def test_report_from_sinks_matches_untrimmed(self):
        import ray.data as rd

        from logparse_rs_ray.pipelines.flagship import (
            REPORT_DIMS,
            _assemble_report,
            _report_prep,
            enrich_webtext,
            flagship_report_from_sinks,
            parse_webtext,
        )
        from logparse_rs_ray.stages.aggregate import multi_count
        from logparse_rs_ray.webtext import generate_webtext_table

        table = generate_webtext_table(2000, seed=7)
        sinks = enrich_webtext(parse_webtext(rd.from_arrow(table)))
        got = flagship_report_from_sinks(sinks, k=10)

        sinks2 = enrich_webtext(parse_webtext(rd.from_arrow(table)))
        prepped = sinks2.map_batches(_report_prep, batch_format="pyarrow",
                                     batch_size=None)
        tall = multi_count(prepped, dict(REPORT_DIMS))
        import pyarrow as pa

        want = _assemble_report(
            pa.Table.from_pandas(tall.to_pandas(), preserve_index=False), k=10)
        assert got == want


@pytest.mark.usefixtures("ray_session")
class TestNoTrailingCorpusSort:
    @pytest.mark.parametrize("name", SORTLESS_QUERIES)
    def test_plan_has_no_alltoall_sort(self, name):
        import __ray_entry__ as entrymod

        out = entrymod.queries()[name](SF)
        # consume so stats() reflects the executed plan
        n = out.count()
        assert n >= 0
        assert "Sort" not in out.stats(), f"{name} plan still contains a Sort"
