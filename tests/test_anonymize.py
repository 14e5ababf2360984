"""Anonymizer conformance: the reference's own test matrix (table.rs:96-137)
plus the FIXTURES.md §3 pinned expectations, for BOTH the serial oracle and
the vectorized column path."""

import json

import pyarrow as pa
import pytest

from logparse_rs_ray.core.anonymize import (
    SerialAnonymizer,
    anonymize_column,
    load_anon_config,
    tokenize_scalar,
)
from logparse_rs_ray.core.fnv import fnv1a64

CFG = {
    "version": 1,
    "defaults": {"mode": "tokenize", "tokenize": {"prefix": "T_", "salt": "pepper"}},
    "fields": {
        "src_ip": {"mode": "tokenize", "tokenize": {"prefix": "SRC_"}},
        "src_ip_salted": {"mode": "tokenize", "tokenize": {"prefix": "S2_", "salt": "field-salt"}},
        "user": {"mode": "map", "map": {"alice": "user_001"}, "fallback": "tokenize",
                 "tokenize": {"prefix": "USR_"}},
        "fixed_field": {"mode": "fixed", "fixed": "CONST"},
        "fixed_default": {"mode": "fixed"},
        "reject_field": {"mode": "map", "map": {}, "fallback": "reject"},
        "fixed_fallback": {"mode": "map", "map": {}, "fallback": "fixed", "fixed": "REDACTED"},
    },
}


@pytest.fixture
def cfg():
    return load_anon_config(json.dumps(CFG))


class TestSerialOracle:
    def test_token_shape_and_salt_composition(self, cfg):
        a = SerialAnonymizer(cfg)
        tok = a.anonymize_one("some_field", "10.0.0.1")
        # default rule: prefix T_, salt "pepper"; field salt empty prepends
        h = fnv1a64(b"" + b"pepper" + b"10.0.0.1")
        assert tok == f"T_{h:016x}"

    def test_field_salt_prepends_defaults_salt(self, cfg):
        a = SerialAnonymizer(cfg)
        tok = a.anonymize_one("src_ip_salted", "10.0.0.1")
        h = fnv1a64(b"field-salt" + b"pepper" + b"10.0.0.1")
        assert tok == f"S2_{h:016x}"

    def test_field_prefix_overrides(self, cfg):
        a = SerialAnonymizer(cfg)
        assert a.anonymize_one("src_ip", "1.2.3.4").startswith("SRC_")

    def test_determinism(self, cfg):
        a, b = SerialAnonymizer(cfg), SerialAnonymizer(cfg)
        assert a.anonymize_one("ip", "10.0.0.1") == b.anonymize_one("ip", "10.0.0.1")
        assert a.anonymize_one("ip", "10.0.0.1") == a.anonymize_one("ip", "10.0.0.1")

    def test_map_hit_miss_fallbacks(self, cfg):
        a = SerialAnonymizer(cfg)
        assert a.anonymize_one("user", "alice") == "user_001"
        assert a.anonymize_one("user", "bob").startswith("USR_")
        assert a.anonymize_one("fixed_field", "x") == "CONST"
        assert a.anonymize_one("fixed_default", "x") == "REDACTED"
        assert a.anonymize_one("reject_field", "x") is None
        assert a.anonymize_one("fixed_fallback", "y") == "REDACTED"

    def test_reject_stays_out_of_table(self, cfg):
        a = SerialAnonymizer(cfg)
        a.anonymize_one("reject_field", "x")
        assert "reject_field" not in a.table

    def test_table_growth_and_status(self, cfg):
        a = SerialAnonymizer(cfg)
        for v in ["1", "2", "3"]:
            a.anonymize_one("f", v)
        a.anonymize_one("g", "1")
        st = a.status()
        assert st["fields"] == 2 and st["pairs"] == 4 and st["enabled"]

    def test_export_shape(self, cfg):
        a = SerialAnonymizer(cfg)
        a.anonymize_one("user", "alice")
        exported = json.loads(a.export_json())
        assert exported == {"user": {"alice": "user_001"}}

    def test_version_gate(self):
        with pytest.raises(ValueError):
            load_anon_config(json.dumps({"version": 2}))

    def test_passthrough_without_default_mode(self):
        cfg = load_anon_config(json.dumps({"version": 1, "fields": {}}))
        a = SerialAnonymizer(cfg)
        assert a.anonymize_one("anything", "v") is None
        assert a.table == {}


class TestVectorizedColumn:
    """anonymize_column(batch) must agree with the serial oracle per value."""

    @pytest.mark.parametrize("field_name", [
        "some_field", "src_ip", "src_ip_salted", "user", "fixed_field",
        "fixed_default", "reject_field", "fixed_fallback",
    ])
    def test_matches_oracle(self, cfg, field_name):
        vals = ["alice", "bob", "10.0.0.1", None, "alice", "zzz"]
        col = pa.array(vals, type=pa.string())
        out, replaced = anonymize_column(cfg, field_name, col)
        oracle = SerialAnonymizer(cfg)
        for i, v in enumerate(vals):
            if v is None:
                assert not out[i].is_valid
                assert not replaced[i].as_py()
                continue
            want = oracle.anonymize_one(field_name, v)
            got = out[i].as_py()
            if want is None:
                # reject/passthrough: original kept, not recorded
                assert got == v
                assert not replaced[i].as_py()
            else:
                assert got == want
                assert replaced[i].as_py()

    def test_cross_batch_determinism(self, cfg):
        a1, _ = anonymize_column(cfg, "src_ip", pa.array(["9.9.9.9"]))
        a2, _ = anonymize_column(cfg, "src_ip", pa.array(["x", "9.9.9.9"]))
        assert a1[0].as_py() == a2[1].as_py()

    def test_tokenize_scalar_matches_vector(self, cfg):
        out, _ = anonymize_column(cfg, "some_field", pa.array(["v1"]))
        assert out[0].as_py() == tokenize_scalar(cfg, "T_", None, "v1")
