"""Regressions for ADVICE r01 findings: rounding-mode parity, torn manifest
lines, defaults.mode under-anonymization guard."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest


class TestRoundingParity:
    def test_cents_matches_duckdb_on_exact_half(self):
        import duckdb

        from logparse_rs_ray.pipelines.relational import _cents

        # 0.125 * 100 = 12.5 exactly in binary: half-even would give 12,
        # DuckDB ROUND gives 13 (half away from zero)
        vals = [0.125, 2.675, 0.375, 1.005, 490.125]
        got = _cents(pa.array(vals, type=pa.float64())).to_pylist()
        # CAST to DOUBLE: a bare list literal parses as DECIMAL, which is
        # exact arithmetic the float pipeline (and parquet column) never sees
        want = duckdb.sql(
            "SELECT CAST(ROUND(CAST(v AS DOUBLE) * 100) AS BIGINT) "
            "FROM (SELECT UNNEST({}) AS v)".format(vals)
        ).fetchall()
        assert got == [w[0] for w in want]

    def test_streaming_rounding_matches_duckdb_on_exact_half(self):
        # the numpy path in streaming.py: sign * floor(abs + .5)
        v = np.array([0.125, -0.125, 2.675, -2.675]) * 100
        got = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64).tolist()
        import duckdb

        want = [r[0] for r in duckdb.sql(
            "SELECT CAST(ROUND(v) AS BIGINT) FROM (SELECT UNNEST([12.5, -12.5, 267.5, -267.5]) AS v)"
        ).fetchall()]
        assert got == want


class TestTornManifestLine:
    def test_load_tolerates_partial_trailing_line(self, tmp_path):
        from logparse_rs_ray.state.checkpoint import Manifest

        p = str(tmp_path / "manifest.jsonl")
        good = {"partition_id": 0, "status": "done", "lineage": {"x": 1},
                "input_files": ["a.parquet"]}
        with open(p, "w") as fh:
            fh.write(json.dumps(good) + "\n")
            fh.write('{"partition_id": 1, "status": "done", "inp')  # torn

        m = Manifest.load(p)
        assert 0 in m.records
        assert 1 not in m.records  # torn line == unfinished partition
        assert m.is_done(0, {"x": 1}, ["a.parquet"])
        assert not m.is_done(1, {"x": 1}, ["b.parquet"])

    def test_resume_appends_after_torn_line(self, tmp_path):
        from logparse_rs_ray.state.checkpoint import Manifest

        p = str(tmp_path / "manifest.jsonl")
        with open(p, "w") as fh:
            fh.write('{"partition_id": 0, "status": "done", "line')  # torn only

        m = Manifest.load(p)
        assert m.records == {}
        m.mark_done({"partition_id": 0, "status": "done", "lineage": {},
                     "input_files": []})
        m2 = Manifest.load(p)
        assert 0 in m2.records  # re-written record wins over the torn line


class TestDefaultsModeGuard:
    def test_defaults_mode_requires_explicit_columns(self):
        from logparse_rs_ray.core.anonymize import load_anon_config
        from logparse_rs_ray.stages.enrich import Enricher

        cfg = load_anon_config({
            "version": 1,
            "defaults": {"mode": "tokenize",
                         "tokenize": {"prefix": "T_", "salt": "s"}},
            "fields": {"user": {"mode": "tokenize"}},
        })
        with pytest.raises(ValueError, match="defaults.mode"):
            Enricher(cfg, None)
        # explicit column list is accepted
        e = Enricher(cfg, None, anonymize_columns=["user", "other"])
        assert e.anon_columns == ["user", "other"]
