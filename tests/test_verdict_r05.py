"""Round-5 regressions (VERDICT r04 items 3/7 + ADVICE r04).

Covers the scalar generator surface (``parse_many`` / ``parse_file`` /
``parse_many_parallel`` / ``parse_file_parallel``), ``get_schema_status``,
the import-time ``LOGPARSE_ANON_CONFIG`` preload, the shared ANN top-k
finalizer, and the ADVICE empty-candidate / typed-empty-output fixes.

No Ray in the scalar tier tests; pipeline tests use the session fixture.
"""
from __future__ import annotations

import importlib
import json
import os

import pytest

from logparse_rs_ray import api
from logparse_rs_ray.webtext import generate_webtext_table, pan_schema

from .oracle import extract_csv


def _parseable_lines(n: int = 400, seed: int = 23) -> list[str]:
    """Webtext corpus payloads the scalar parser accepts (known type at
    CSV index 3), plus pinned quote-quirk lines exercising the exact-
    tokenizer patch path inside the batch kernel."""
    schema = pan_schema()
    lines = []
    for text in generate_webtext_table(n, seed=seed)["text"].to_pylist():
        payload = extract_csv(text)
        fields = api.get_fields(payload)
        if len(fields) > api.TYPE_INDEX and \
                fields[api.TYPE_INDEX] in schema.type_to_fields:
            lines.append(payload)
    t = next(iter(schema.type_to_fields))
    lines.append(f'a,"b,c",{"x"},{t},"he said ""hi""",z')
    lines.append(f"1,2,3,{t},")
    assert len(lines) > 50
    return lines



def _schema_file(tmp_path, type_value: str = "T") -> str:
    """Reference-format schema file with one custom type."""
    from logparse_rs_ray.webtext import PAN_SCHEMA_JSON

    root = json.loads(json.dumps(PAN_SCHEMA_JSON))
    lt = root["palo_alto_syslog_fields"]["log_types"]
    name = next(iter(lt))
    lt[name]["type_value"] = type_value
    p = tmp_path / "schema.json"
    p.write_text(json.dumps(root))
    return str(p)

class TestSchemaStatus:
    def test_unloaded(self):
        api._SCHEMA = None
        assert api.get_schema_status() == {
            "loaded": False, "source": None, "path": None,
            "mtime_epoch_ms": None}

    def test_embedded(self):
        api.load_embedded_schema()
        st = api.get_schema_status()
        assert st["loaded"] is True
        assert st["source"] == "embedded"
        assert st["path"] is None and st["mtime_epoch_ms"] is None

    def test_file_with_mtime(self, tmp_path):
        path = _schema_file(tmp_path)
        os.utime(path, (1, 1_700_000_000))
        api.load_schema(path)
        st = api.get_schema_status()
        assert st == {"loaded": True, "source": "file", "path": path,
                      "mtime_epoch_ms": 1_700_000_000_000}


class TestParseManyAndFile:
    def setup_method(self):
        api.load_embedded_schema()
        api._ANON = None

    def test_parse_many_matches_scalar_calls(self):
        lines = _parseable_lines(200)
        got = list(api.parse_many(lines))
        want = [api.parse_kv_enriched(l) for l in lines]
        assert got == want

    def test_parse_many_skips_falsy_and_rstrips(self):
        lines = _parseable_lines(100)[:5]
        mixed = [lines[0] + "\n", "", lines[1], None, lines[2]]
        got = list(api.parse_many(mixed))
        assert got == [api.parse_kv_enriched(l) for l in lines[:3]]

    def test_parse_many_include_all_and_schema_path(self, tmp_path):
        path = _schema_file(tmp_path, "CUSTOMT")
        line = ",".join(["x"] * 3 + ["CUSTOMT"] + ["v"] * 60)
        (rec,) = list(api.parse_many([line], schema_path=path,
                                     include_all=True))
        want = api.parse_kv_enriched_with_schema(line, path,
                                                 include_all=True)
        assert rec == want
        assert any(k.startswith("field_") for k in rec["parsed"])

    def test_parse_many_anonymized_routes_through_engine(self):
        api.set_anonymizer_json(json.dumps(
            {"version": 1, "fields": {"src_ip": {"mode": "tokenize", "tokenize": {"prefix": "IP_"}}}}))
        lines = _parseable_lines(120)
        got = list(api.parse_many(lines, anonymized=True))
        assert all(r["_anonymized"] is True for r in got)
        # same parsed payloads as the scalar anon calls on a fresh engine
        api.set_anonymizer_json(json.dumps(
            {"version": 1, "fields": {"src_ip": {"mode": "tokenize", "tokenize": {"prefix": "IP_"}}}}))
        want = [api.parse_kv_enriched_anon(l) for l in lines]
        for g, w in zip(got, want):
            assert g["parsed"] == w["parsed"]
            assert g["hash64"] == w["hash64"]

    def test_parse_file_streams_lines(self, tmp_path):
        lines = _parseable_lines(100)
        p = tmp_path / "log.txt"
        p.write_text("\n".join(lines) + "\n")
        got = list(api.parse_file(str(p)))
        assert got == [api.parse_kv_enriched(l) for l in lines]


class TestParseParallelParity:
    """The batched vectorized path must yield exactly what the sequential
    generator yields (the reference's own fallback contract,
    rust_accel.py:536-539)."""

    def setup_method(self):
        api.load_embedded_schema()
        api._ANON = None

    @pytest.mark.parametrize("batch_size", [7, 1024])
    def test_matches_sequential(self, batch_size):
        lines = _parseable_lines(400)
        got = list(api.parse_many_parallel(lines, batch_size=batch_size))
        want = list(api.parse_many(lines))
        assert got == want

    def test_include_all_honored(self):
        lines = _parseable_lines(150)
        got = list(api.parse_many_parallel(lines, include_all=True,
                                           batch_size=32))
        want = list(api.parse_many(lines, include_all=True))
        assert got == want

    def test_schema_path_loads_module_state(self, tmp_path):
        path = _schema_file(tmp_path, "CUSTOMT")
        line = ",".join(["x"] * 3 + ["CUSTOMT"] + ["v"] * 10)
        got = list(api.parse_many_parallel([line], schema_path=path))
        assert got == [api.parse_kv_enriched(line)]
        assert api.get_schema_status()["path"] == path

    def test_error_parity_unknown_type(self):
        with pytest.raises(ValueError, match="Unknown log type"):
            list(api.parse_many_parallel(["a,b,c,NOPE,x"]))
        with pytest.raises(ValueError, match="index 3"):
            list(api.parse_many_parallel(["a,b"]))

    def test_parse_file_parallel(self, tmp_path):
        lines = _parseable_lines(200)
        p = tmp_path / "log.txt"
        p.write_text("\n".join(lines) + "\n")
        got = list(api.parse_file_parallel(str(p), batch_size=64))
        assert got == [api.parse_kv_enriched(l) for l in lines]


class TestAnonImportPreload:
    def test_env_config_loads_engine_at_import(self, tmp_path, monkeypatch):
        cfg = tmp_path / "anon.json"
        cfg.write_text(json.dumps({"version": 1, "fields": {"src_ip": {"mode": "tokenize", "tokenize": {"prefix": "IP_"}}}}))
        monkeypatch.delenv("LOGPARSE_USE_EMBEDDED", raising=False)
        monkeypatch.setenv("LOGPARSE_ANON_CONFIG", str(cfg))
        mod = importlib.reload(api)
        assert mod.get_anonymizer_status()["enabled"] is True

    def test_legacy_env_name(self, tmp_path, monkeypatch):
        cfg = tmp_path / "anon.json"
        cfg.write_text(json.dumps({"version": 1, "fields": {"user": {"mode": "tokenize", "tokenize": {"prefix": "U_"}}}}))
        monkeypatch.delenv("LOGPARSE_ANON_CONFIG", raising=False)
        monkeypatch.setenv("PAN_RUST_ANON_CONFIG", str(cfg))
        mod = importlib.reload(api)
        assert mod.get_anonymizer_status()["enabled"] is True

    def test_absent_env_leaves_engine_unloaded(self, monkeypatch):
        monkeypatch.delenv("LOGPARSE_ANON_CONFIG", raising=False)
        monkeypatch.delenv("PAN_RUST_ANON_CONFIG", raising=False)
        mod = importlib.reload(api)
        assert mod.get_anonymizer_status() == {"enabled": False}

    def teardown_method(self):
        importlib.reload(api)


class TestAdviceEmptyCandidates:
    """ADVICE r04: all-pruned candidate sets must return typed empty
    tables, not schema-less empty Datasets (Ray drops 0-row blocks)."""

    def test_pmi_all_below_min_count(self, ray_session, sf_small):
        import pyarrow as pa

        from logparse_rs_ray.pipelines.textops import doc_pmi_phrases

        res = doc_pmi_phrases(sf_small, min_count=10**9)
        tbl = res if isinstance(res, pa.Table) else pa.concat_tables(
            list(res.iter_batches(batch_format="pyarrow", batch_size=None)))
        assert tbl.num_rows == 0
        assert tbl.column_names == ["bigram", "n_ab", "pmi_x1000"]

    def test_pmi_normal_path_unchanged(self, ray_session, sf_small):
        import pyarrow as pa

        from logparse_rs_ray.pipelines.textops import doc_pmi_phrases

        res = doc_pmi_phrases(sf_small)
        tbl = res if isinstance(res, pa.Table) else pa.concat_tables(
            list(res.iter_batches(batch_format="pyarrow", batch_size=None)))
        assert tbl.num_rows > 0
        assert tbl.column_names == ["bigram", "n_ab", "pmi_x1000"]
        pmi = tbl["pmi_x1000"].to_pylist()
        assert pmi == sorted(pmi, reverse=True) or len(set(pmi)) < len(pmi)

    def test_bm25_typed_result(self, ray_session, sf_small):
        import pyarrow as pa

        from logparse_rs_ray.pipelines.textops import doc_bm25_topk

        tbl = doc_bm25_topk(sf_small)
        assert isinstance(tbl, pa.Table)
        assert tbl.column_names == ["doc_id", "score_x1e6"]
        assert 0 < tbl.num_rows <= 20


class TestEwmaSegmentedScan:
    """VERDICT r04 item 2: the shuffle regime must never hold a full
    per-type series — forced multi-chunk runs must match the whole-series
    serial recursion."""

    @staticmethod
    def _serial_census(sf, alpha=0.25, k=3.0, warmup=10):
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf}/events.parquet",
                          columns=["event_type", "ts", "event_id", "value"]
                          ).to_pandas()
        t = t.sort_values(["event_type", "ts", "event_id"], kind="mergesort")
        rows = []
        for et, g in t.groupby("event_type", sort=True):
            v = g["value"].astype(float).reset_index(drop=True)
            m_prev = v.ewm(alpha=alpha, adjust=False).mean().shift(1)
            d = (v - m_prev).abs()
            s_prev = d.fillna(0.0).ewm(alpha=alpha, adjust=False) \
                      .mean().shift(1)
            idx = np.arange(len(v))
            with np.errstate(invalid="ignore"):
                anom = (idx >= warmup) & (d.to_numpy() > k * s_prev.to_numpy())
            rows.append([et, len(v), int(anom.sum())])
        return rows

    def test_forced_multichunk_matches_serial(self, ray_session, sf_small):
        from logparse_rs_ray.pipelines.windows import log_value_ewma_anomaly

        # hourly buckets over the 30-day corpus -> ~720 chunks per type
        got = log_value_ewma_anomaly(sf_small, mode="shuffle",
                                     bucket_secs=3600).to_pandas()
        assert got.values.tolist() == self._serial_census(sf_small)
        # nontrivial: the corpus must actually have anomalies to compare
        assert got.n_anomalies.sum() > 0

    def test_regimes_agree_on_small_corpus(self, ray_session, sf_tiny):
        from logparse_rs_ray.pipelines.windows import log_value_ewma_anomaly

        tree = log_value_ewma_anomaly(sf_tiny, mode="tree").to_pandas()
        shuf = log_value_ewma_anomaly(sf_tiny, mode="shuffle",
                                      bucket_secs=7200).to_pandas()
        assert tree.values.tolist() == shuf.values.tolist()

    def test_randomized_spiky_series_multichunk(self, ray_session, tmp_path):
        import datetime

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from logparse_rs_ray.pipelines.windows import log_value_ewma_anomaly

        rng = np.random.default_rng(77)
        base = datetime.datetime(2024, 1, 1)
        rows_t, rows_ts, rows_v = [], [], []
        for et in ("a", "b", "c"):
            n = int(rng.integers(50, 300))
            vals = rng.normal(100.0, 5.0, n)
            spikes = rng.choice(n, size=max(1, n // 20), replace=False)
            vals[spikes] *= 10.0
            for i in range(n):
                rows_t.append(et)
                rows_ts.append(base + datetime.timedelta(
                    minutes=int(rng.integers(0, 60 * 24 * 10))))
                rows_v.append(float(vals[i]))
        t = pa.table({
            "event_id": pa.array(range(len(rows_t)), type=pa.int64()),
            "ts": pa.array(rows_ts, type=pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows_t), type=pa.int64()),
            "event_type": pa.array(rows_t),
            "value": pa.array(rows_v),
            "props": pa.array(["{}"] * len(rows_t)),
        })
        pq.write_table(t, tmp_path / "events.parquet")
        sf = str(tmp_path)
        got = log_value_ewma_anomaly(sf, mode="shuffle", bucket_secs=3600,
                                     num_partitions=5).to_pandas()
        assert got.values.tolist() == self._serial_census(sf)
        assert got.n_anomalies.sum() > 0


class TestPngCodec:
    """VERDICT r04 item 6: a real codec behind the multimodal actor
    interface — baseline PNG via stdlib zlib (core/png.py)."""

    def test_roundtrip_all_filters_and_shapes(self):
        import numpy as np

        from logparse_rs_ray.core.png import decode_png, encode_png

        rng = np.random.default_rng(7)
        for shape in [(5, 7), (5, 7, 3), (1, 1), (12, 16, 3), (3, 1, 3)]:
            arr = rng.integers(0, 256, shape, dtype=np.uint8)
            for f in range(5):
                filts = np.full(shape[0], f)
                assert (decode_png(encode_png(arr, row_filters=filts))
                        == arr).all(), (shape, f)
            mixed = rng.integers(0, 5, shape[0])
            assert (decode_png(encode_png(arr, row_filters=mixed))
                    == arr).all()

    def test_crc_corruption_rejected(self):
        import numpy as np

        from logparse_rs_ray.core.png import encode_png, decode_png

        data = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
        data[40] ^= 0xFF  # flip a byte inside IDAT
        with pytest.raises(ValueError):
            decode_png(bytes(data))

    def test_non_png_rejected(self):
        from logparse_rs_ray.core.png import decode_png

        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"plain text payload")


class TestPngActorStages:
    @staticmethod
    def _mixed_batch():
        import numpy as np
        import pyarrow as pa

        from logparse_rs_ray.core.png import encode_png

        img0 = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(8, 6, 3)
        img1 = (np.arange(5 * 9, dtype=np.uint8) * 7 % 256).astype(
            np.uint8).reshape(5, 9)  # greyscale
        corrupt = bytearray(encode_png(img0))
        corrupt[41] ^= 0xAA
        payloads = [encode_png(img0), b"just text", encode_png(img1),
                    bytes(corrupt)]
        return pa.table({
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }), img0, img1

    def test_decode_stage_real_and_fallback(self):
        import numpy as np

        from logparse_rs_ray.pipelines.multimodal import ImageDecodeStub

        batch, img0, img1 = self._mixed_batch()
        out = ImageDecodeStub()(batch).to_pandas()
        # row 0: real RGB decode — IHDR dims, pixel histogram, pixel sum
        assert list(out.loc[0, ["width", "height", "channels"]]) == [6, 8, 3]
        assert out.loc[0, "pix_sum"] == int(img0.sum(dtype=np.int64))
        assert (np.array(out.loc[0, "features"]) ==
                np.bincount(img0.reshape(-1) >> 4, minlength=16)).all()
        # row 2: real greyscale decode
        assert list(out.loc[2, ["width", "height", "channels"]]) == [9, 5, 1]
        assert out.loc[2, "pix_sum"] == int(img1.sum(dtype=np.int64))
        # rows 1 (text) and 3 (corrupt PNG): stub fallback — dims from
        # byte length, histogram/sum over payload bytes
        for i in (1, 3):
            nb = out.loc[i, "n_bytes"]
            assert out.loc[i, "width"] == nb % 640
            assert out.loc[i, "height"] == nb % 480
            assert out.loc[i, "channels"] == 3

    def test_thumbnail_stage_real_resize(self):
        import numpy as np

        from logparse_rs_ray.pipelines.multimodal import ThumbnailStub

        batch, img0, img1 = self._mixed_batch()
        st = ThumbnailStub(width=4, height=4)
        out = st(batch).to_pandas()

        def nn(img):
            h, w = img.shape[:2]
            rows = (np.arange(4) * h) // 4
            cols = (np.arange(4) * w) // 4
            flat = img[rows][:, cols].reshape(-1)[:ThumbnailStub.TH_BYTES]
            buf = np.zeros(ThumbnailStub.TH_BYTES, dtype=np.uint8)
            buf[:len(flat)] = flat
            return buf.tobytes()

        assert bytes(out.loc[0, "thumb"]) == nn(img0)
        assert bytes(out.loc[2, "thumb"]) == nn(img1)
        # stub rows: first TH_BYTES payload bytes zero-padded
        want = b"just text" + b"\x00" * (ThumbnailStub.TH_BYTES - 9)
        assert bytes(out.loc[1, "thumb"]) == want

    def test_batch_size_bounds_decode_batches(self, ray_session, sf_tiny):
        """The explicit batch_size must actually bound per-batch payload
        memory in the running pipeline."""
        import pyarrow as pa
        import ray.data as rd

        from logparse_rs_ray.pipelines.multimodal import attach_png_payload
        from logparse_rs_ray.sources import read_table

        ds = read_table(sf_tiny, "documents", columns=["doc_id"])
        ds = ds.map_batches(attach_png_payload, batch_format="pyarrow",
                            batch_size=None)
        sizes = ds.map_batches(
            lambda b: pa.table({"rows": pa.array([b.num_rows])}),
            batch_format="pyarrow", batch_size=64).to_pandas()
        assert sizes.rows.max() <= 64
        assert sizes.rows.sum() == 500

    def test_png_thumbs_pipeline_matches_serial(self, ray_session, sf_tiny):
        import numpy as np

        from logparse_rs_ray.core.png import decode_png
        from logparse_rs_ray.pipelines.multimodal import (
            ThumbnailStub, attach_png_payload, mm_png_thumbs)
        from logparse_rs_ray.sources import read_table

        got = mm_png_thumbs(sf_tiny).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        ids = read_table(sf_tiny, "documents", columns=["doc_id"]) \
            .to_pandas().sort_values("doc_id")
        import pyarrow as pa

        batch = pa.table({"doc_id": pa.array(ids.doc_id.to_numpy())})
        payloads = attach_png_payload(batch)
        st = ThumbnailStub()
        for row_i in (0, 7, 123, 499):
            raw = payloads["payload"][row_i].as_py()
            img = decode_png(raw)
            flat = st._resize(img).reshape(-1)[:ThumbnailStub.TH_BYTES]
            buf = np.zeros(ThumbnailStub.TH_BYTES, dtype=np.uint8)
            buf[:len(flat)] = flat
            assert got.loc[row_i, "thumb_hex"] == buf.tobytes().hex()


class TestRound5ReviewRegressions:
    """Round-5 code-review findings."""

    def test_magic_prefixed_garbage_falls_back_to_stub(self):
        """decode_png must raise ValueError (not struct/zlib errors) on
        magic-prefixed garbage so the actor stages' stub fallback engages
        instead of the Ray task dying."""
        import numpy as np
        import pyarrow as pa

        from logparse_rs_ray.core.png import PNG_MAGIC, decode_png
        from logparse_rs_ray.pipelines.multimodal import ImageDecodeStub

        for bad in (PNG_MAGIC + b"The quick brown fox", PNG_MAGIC,
                    PNG_MAGIC + b"\xff\xff\xff\xffXXXX"):
            with pytest.raises(ValueError):
                decode_png(bad)
        batch = pa.table({
            "doc_id": pa.array([0], type=pa.int64()),
            "payload": pa.array([PNG_MAGIC + b"just text"],
                                type=pa.binary()),
        })
        out = ImageDecodeStub()(batch).to_pandas()
        nb = out.loc[0, "n_bytes"]
        assert out.loc[0, "width"] == nb % 640  # stub values stand
        assert out.loc[0, "pix_sum"] == 0       # stub rows decode nothing

    def test_parallel_yields_good_prefix_before_error(self):
        """parse_many_parallel must deliver every record preceding the
        first bad line in a batch, exactly like the sequential generator,
        THEN raise the same error."""
        api.load_embedded_schema()
        lines = _parseable_lines(50)
        mixed = lines[:5] + ["a,b,c,NOPE,x"] + lines[5:8]

        def drain(gen):
            got, err = [], None
            try:
                for rec in gen:
                    got.append(rec)
            except ValueError as e:
                err = str(e)
            return got, err

        seq_got, seq_err = drain(api.parse_many(mixed))
        par_got, par_err = drain(api.parse_many_parallel(mixed,
                                                         batch_size=1024))
        assert seq_err == par_err and "Unknown log type" in par_err
        assert par_got == seq_got
        assert len(par_got) == 5

    def test_side_buckets_file_atomic_and_pinned(self, ray_session,
                                                 tmp_path):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from logparse_rs_ray.state.checkpoint import run_partitioned_flagship
        from logparse_rs_ray.webtext import generate_webtext_table

        src = tmp_path / "in"
        src.mkdir()
        pq.write_table(generate_webtext_table(500, seed=3),
                       src / "part0.parquet")
        out = tmp_path / "out"
        run_partitioned_flagship(str(src), str(out), num_partitions=1)
        sb = json.load(open(out / "side_buckets.json"))
        assert sb["side_buckets"] >= 8
        assert not (out / "side_buckets.json.tmp").exists()
        # resume reuses the pinned value even if the cluster answer changes
        sb2 = json.load(open(out / "side_buckets.json"))
        res = run_partitioned_flagship(str(src), str(out), num_partitions=1)
        assert res["skipped"] == 1
        assert json.load(open(out / "side_buckets.json")) == sb2
