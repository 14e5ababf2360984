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
