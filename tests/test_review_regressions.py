"""Regressions for the round-1 adversarial review findings: every entry here
reproduced a crash or corruption before its fix."""

import numpy as np
import pyarrow as pa
import pytest

from logparse_rs_ray.core.strkit import extract_csv_payload, utf8_safe_truncate
from logparse_rs_ray.functions.hashing import segment_sum, simhash_signatures
from logparse_rs_ray.stages.parse import WebtextParser
from logparse_rs_ray.webtext import pan_schema


class TestUtf8Excerpt:
    def test_multibyte_straddling_truncation_boundary(self):
        # 255 ascii bytes + 'é' (2 bytes at positions 255-256): a raw byte
        # slice at 256 would split the char and the string cast would raise
        line = "1,t,s,TRAFFIC,start," + "x" * 234 + "é" + ",end"
        parser = WebtextParser(pan_schema(), strip_syslog_prefix=False)
        out = parser(pa.table({"text": [line]}))  # must not raise
        exc = out["raw_excerpt"][0].as_py()
        assert len(exc.encode("utf-8")) <= 256
        assert line.startswith(exc)

    def test_truncate_kernel_edges(self):
        arr = pa.array(["a" * 300, "é" * 200, "short", ""])
        out = utf8_safe_truncate(arr, 256)
        vals = out.to_pylist()
        assert vals[0] == "a" * 256
        assert vals[1] == "é" * 128  # 256 bytes == 128 2-byte chars exactly
        assert vals[2] == "short" and vals[3] == ""
        # 4-byte chars: 255 ascii + emoji straddling
        arr2 = pa.array(["b" * 255 + "\U0001F600" + "tail"])
        v = utf8_safe_truncate(arr2, 256).to_pylist()[0]
        assert v == "b" * 255  # emoji trimmed, boundary respected


class TestNullTextRows:
    def test_null_line_does_not_steal_neighbor_content(self):
        texts = ["prefix 1,a,b,TRAFFIC,x", None, "plain line"]
        out = extract_csv_payload(pa.array(texts, type=pa.string())).to_pylist()
        assert out == ["1,a,b,TRAFFIC,x", "", "plain line"]

    def test_null_rows_deadletter_through_parser(self):
        parser = WebtextParser(pan_schema())
        batch = pa.table({"text": pa.array(
            ["p 1,t,s,TRAFFIC,sub,1.2.3.4", None, "p 1,t,s,THREAT,spy"],
            type=pa.string())})
        out = parser(batch)
        assert out["log_type"].to_pylist() == ["TRAFFIC", None, "THREAT"]
        assert out["_error"].to_pylist()[1] == "no_type_at_index_3"


class TestEmptyTrailingDocs:
    def test_simhash_trailing_null_doc(self):
        sig = simhash_signatures(pa.array(["hello world", None]))
        assert len(sig) == 2 and sig[1] == 0

    def test_langid_trailing_empty_doc(self, ray_session):
        from logparse_rs_ray.pipelines.textops import LangIdScorer

        out = LangIdScorer()(pa.table({
            "doc_id": [1, 2, 3],
            "text": pa.array(["the quick fox", "der und das", ""], type=pa.string()),
        }))
        assert out["pred_lang"].to_pylist() == ["en", "de", "unknown"]

    def test_segment_sum_empty_segments(self):
        arr = np.array([1, 2, 3])
        off = np.array([0, 0, 2, 3, 3])
        assert segment_sum(arr, off).tolist() == [0, 3, 3, 0]


class TestMegaBuckets:
    def test_giant_duplicate_cluster_stays_connected(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.dedup import minhash_candidate_pairs

        # 600 identical docs: every LSH bucket exceeds max_bucket=500
        sf = str(tmp_path)
        text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        pq.write_table(pa.table({
            "doc_id": pa.array(range(600), type=pa.int64()),
            "text": pa.array([text] * 600),
            "lang": pa.array(["en"] * 600),
            "source": pa.array(["s"] * 600),
            "n_chars": pa.array([len(text)] * 600, type=pa.int64()),
        }), f"{sf}/documents.parquet")
        pairs = minhash_candidate_pairs(sf).to_pandas()
        # star pairing: cluster stays connected (>= n-1 edges reach all docs)
        assert len(pairs) >= 599
        import itertools

        nodes = set(pairs["doc_a"]) | set(pairs["doc_b"])
        assert nodes == set(range(600))


class TestManifestInvalidation:
    def test_input_regrouping_invalidates(self, ray_session, tmp_path):
        from logparse_rs_ray.state.checkpoint import run_partitioned_flagship
        from logparse_rs_ray.webtext import webtext_dataset

        src = str(tmp_path / "in")
        webtext_dataset(1200).repartition(4).write_parquet(src)
        out = str(tmp_path / "out")
        r1 = run_partitioned_flagship(src, out, num_partitions=2)
        assert r1["all_done"] and r1["completed"] == 2

        # append new input files -> groups change -> nothing may be skipped
        import glob

        import ray.data as rd

        webtext_dataset(300, seed=7).repartition(2).write_parquet(src)
        r2 = run_partitioned_flagship(src, out, num_partitions=2)
        assert r2["skipped"] == 0 and r2["completed"] == 2
        total = r2["report"]["total_logs"] + r2["report"]["errors"]
        assert total == 1500


class TestHllNulls:
    def test_nulls_do_not_count(self):
        from logparse_rs_ray.functions.sketches import hll_estimate, hll_sketch

        vals = pa.array(["a", "b", None, None, "c"])
        est = hll_estimate(hll_sketch(vals))
        assert abs(est - 3) < 1
        only_null = pa.array([None, None], type=pa.string())
        assert hll_estimate(hll_sketch(only_null)) == 0
