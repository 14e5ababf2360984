"""Scalar convenience API parity (VERDICT r03 items 7-8): the one-line
``parse_kv`` / ``parse_kv_enriched`` / ``get_fields`` surface of the
reference (``rust_accel.py:262-368``, ``docs/python/api.md``) plus the
embedded-schema fallback + load-order (``rust_accel.py:72-92``).

No Ray anywhere — this is the pure scalar tier.
"""
from __future__ import annotations

import importlib
import json
import os

import pytest

from logparse_rs_ray import api
from logparse_rs_ray.core.fnv import fnv1a64
from logparse_rs_ray.webtext import PAN_SCHEMA_JSON, generate_webtext_table, pan_schema

from .oracle import extract_csv

# the reference's pinned tokenizer-quirk corpus (tokenizer.rs:133-177 + §1.5)
QUIRK_CASES = [
    ("a,b,c", ["a", "b", "c"]),
    ('a,"b,c",d', ["a", "b,c", "d"]),
    ('a,"he said ""hi""",c', ["a", 'he said "hi"', "c"]),
    ("a,b,", ["a", "b", ""]),
    ("", []),
    ('x,"quoted"JUNK,z', ["x", "quoted", "z"]),   # discard-after-quote
    ('x,"é",z', ["x", "Ã©", "z"]),  # quoted byte-as-char
    ("x,é,z", ["x", "é", "z"]),          # unquoted UTF-8 intact
]


class TestGetFieldsAndField:
    @pytest.mark.parametrize("line,want", QUIRK_CASES)
    def test_get_fields_pinned_cases(self, line, want):
        assert api.get_fields(line) == want

    def test_get_field_agrees_with_get_fields_everywhere(self):
        for line, want in QUIRK_CASES:
            fields = api.get_fields(line)
            for i in range(len(fields) + 2):
                got = api.get_field(line, i)
                if i < len(fields):
                    assert got == fields[i], (line, i)
        # edge semantics (tokenizer.rs:165-175)
        assert api.get_field("a,b", 2) == ""     # one past end, no trailing ,
        assert api.get_field("a,b,", 3) is None  # trailing , -> None past end
        assert api.get_field("a,b", 5) is None


def _loaded_embedded():
    api.load_embedded_schema()
    return api


class TestParseKv:
    def setup_method(self):
        api.load_embedded_schema()

    def test_matches_serial_oracle_on_webtext_corpus(self):
        """parse_kv over every parseable corpus line == the serial oracle's
        positional record (same kernels as the batch parser)."""
        schema = pan_schema()
        table = generate_webtext_table(300, seed=11)
        n_checked = 0
        for text in table["text"].to_pylist():
            payload = extract_csv(text)
            fields = api.get_fields(payload)
            if len(fields) <= api.TYPE_INDEX:
                with pytest.raises(ValueError, match="index 3"):
                    api.parse_kv(payload)
                continue
            t = fields[api.TYPE_INDEX]
            if t not in schema.type_to_fields:
                with pytest.raises(ValueError, match="Unknown log type"):
                    api.parse_kv(payload)
                continue
            want = {name: (fields[p] if p < len(fields) else None)
                    for name, p in dict(schema.value_positions(t)).items()}
            assert api.parse_kv(payload) == want
            n_checked += 1
        assert n_checked > 100  # the corpus is mostly parseable

    def test_include_all_adds_only_missing_index_keys(self):
        out_plain = None
        table = generate_webtext_table(50, seed=3)
        for text in table["text"].to_pylist():
            payload = extract_csv(text)
            try:
                out_plain = api.parse_kv(payload)
            except ValueError:
                continue
            out_all = api.parse_kv(payload, include_all=True)
            fields = api.get_fields(payload)
            assert set(out_plain).issubset(out_all)
            for i, v in enumerate(fields):
                k = f"field_{i}"
                if k not in out_plain:
                    assert out_all[k] == v
            break
        assert out_plain is not None

    def test_no_schema_loaded_raises(self):
        api._SCHEMA = None
        with pytest.raises(ValueError, match="No schema loaded"):
            api.parse_kv("a,b,c,TRAFFIC,x")

    def test_enriched_envelope(self):
        api.load_embedded_schema()
        table = generate_webtext_table(20, seed=5)
        for text in table["text"].to_pylist():
            payload = extract_csv(text)
            try:
                env = api.parse_kv_enriched(payload)
            except ValueError:
                continue
            assert env["parsed"] == api.parse_kv(payload)
            assert env["raw_excerpt"] == payload[:256]
            assert env["hash64"] == fnv1a64(payload)
            return
        pytest.fail("no parseable line found")

    def test_excerpt_is_byte_limited_and_boundary_safe(self):
        long_ascii = "x" * 300
        assert api._excerpt(long_ascii) == "x" * 256
        # multi-byte char straddling the 256-byte cut: back off, never break
        s = "a" * 255 + "é" + "tail"
        out = api._excerpt(s)
        assert out == "a" * 255
        assert len(out.encode("utf-8")) <= 256


class TestSchemaLoadOrder:
    """Reference load order (rust_accel.py:79-92): explicit path > embedded
    (when LOGPARSE_USE_EMBEDDED=1) > env path."""

    def _schema_file(self, tmp_path, type_value="CUSTOM"):
        root = json.loads(json.dumps(PAN_SCHEMA_JSON))
        lt = root["palo_alto_syslog_fields"]["log_types"]
        name = next(iter(lt))
        lt[name]["type_value"] = type_value
        p = tmp_path / "schema.json"
        p.write_text(json.dumps(root))
        return str(p)

    def test_explicit_path_beats_module_state(self, tmp_path):
        api.load_embedded_schema()
        path = self._schema_file(tmp_path)
        fields = api.get_fields("a,b,c,CUSTOM,x,y")
        out = api.parse_kv_with_schema("a,b,c,CUSTOM,x,y", path)
        assert out  # parsed under the explicit schema
        # module state untouched by the explicit-path call
        with pytest.raises(ValueError, match="Unknown log type"):
            api.parse_kv("a,b,c,CUSTOM,x,y")
        assert len(fields) == 6

    def test_hot_reload_on_mtime_change(self, tmp_path):
        path = self._schema_file(tmp_path, "T_ONE")
        assert api.parse_kv_with_schema("a,b,c,T_ONE,x", path)
        # rewrite with a different type_value; bump mtime
        os.utime(path, None)
        p2 = self._schema_file(tmp_path, "T_TWO")
        assert p2 == path
        os.utime(path, (1, 2_000_000_000))
        assert api.parse_kv_with_schema("a,b,c,T_TWO,x", path)
        with pytest.raises(ValueError, match="Unknown log type"):
            api.parse_kv_with_schema("a,b,c,T_ONE,x", path)

    def test_import_preload_embedded_wins_over_env_path(self, tmp_path, monkeypatch):
        path = self._schema_file(tmp_path, "ENVTYPE")
        monkeypatch.setenv("LOGPARSE_USE_EMBEDDED", "1")
        monkeypatch.setenv("LOGPARSE_PRELOAD_SCHEMA", path)
        mod = importlib.reload(api)
        # embedded schema (PAN types) active, env file ignored
        assert mod._SCHEMA is not None
        assert "TRAFFIC" in mod._SCHEMA.type_to_fields
        assert "ENVTYPE" not in mod._SCHEMA.type_to_fields

    def test_import_preload_env_path(self, tmp_path, monkeypatch):
        path = self._schema_file(tmp_path, "ENVTYPE")
        monkeypatch.delenv("LOGPARSE_USE_EMBEDDED", raising=False)
        monkeypatch.setenv("LOGPARSE_PRELOAD_SCHEMA", path)
        mod = importlib.reload(api)
        assert mod._SCHEMA is not None
        assert "ENVTYPE" in mod._SCHEMA.type_to_fields

    def test_import_preload_absent_env_leaves_unloaded(self, monkeypatch):
        monkeypatch.delenv("LOGPARSE_USE_EMBEDDED", raising=False)
        monkeypatch.delenv("LOGPARSE_PRELOAD_SCHEMA", raising=False)
        monkeypatch.delenv("SCHEMA_JSON_PATH", raising=False)
        mod = importlib.reload(api)
        assert mod._SCHEMA is None

    def test_cli_embedded_gate(self, monkeypatch, tmp_path):
        from logparse_rs_ray import cli

        path = self._schema_file(tmp_path, "ENVTYPE")
        monkeypatch.setenv("LOGPARSE_USE_EMBEDDED", "1")
        monkeypatch.setenv("LOGPARSE_PRELOAD_SCHEMA", path)
        schema = cli._load_schema(None)
        assert "TRAFFIC" in schema.type_to_fields      # embedded, not env
        monkeypatch.delenv("LOGPARSE_USE_EMBEDDED")
        schema = cli._load_schema(None)
        assert "ENVTYPE" in schema.type_to_fields      # env path now wins
        # explicit argument beats everything
        monkeypatch.setenv("LOGPARSE_USE_EMBEDDED", "1")
        p3 = tmp_path / "explicit.json"
        p3.write_text((tmp_path / "schema.json").read_text())
        schema = cli._load_schema(str(p3))
        assert "ENVTYPE" in schema.type_to_fields


class TestTypeSubtype:
    def test_basic_and_out_of_bounds(self):
        assert api.extract_type_subtype("ts,serial,x,THREAT,spyware,rest") \
            == ("THREAT", "spyware")
        # fields 3/4 absent -> None (tokenizer edge semantics)
        assert api.extract_type_subtype("a,b") == (None, None)
        # quote-aware: the type field itself may be quoted
        assert api.extract_type_subtype('a,b,c,"THREAT,X",sub')[0] == "THREAT,X"


class TestAnonScalarApi:
    CFG = """{
      "version": 1,
      "defaults": {"tokenize": {"salt": "s1"}},
      "fields": {
        "src_ip": {"mode": "tokenize", "tokenize": {"prefix": "IP_"}},
        "action": {"mode": "map", "map": {"allow": "ok"},
                    "fallback": "fixed", "fixed": "OTHER"},
        "device_name": {"mode": "fixed", "fixed": "DEV"}
      }
    }"""

    def _load(self, tmp_path):
        api.load_embedded_schema()
        assert api.set_anonymizer_json(self.CFG) is True

    def test_status_and_export_lifecycle(self, tmp_path):
        api._ANON = None
        assert api.get_anonymizer_status() == {"enabled": False}
        assert api.export_integrity_table() == {}
        self._load(tmp_path)
        st = api.get_anonymizer_status()
        assert st == {"enabled": True, "fields": 0, "pairs": 0}

    def test_enriched_anon_matches_serial_oracle(self, tmp_path):
        from logparse_rs_ray.core.anonymize import (
            SerialAnonymizer, load_anon_config)

        self._load(tmp_path)
        line = ("2024/01/01 00:00:00,SER123,1,TRAFFIC,start,2024/01/01 "
                "00:00:00,10.0.0.1,10.0.0.2,,,rule1,,,app1")
        env = api.parse_kv_enriched_anon(line)
        # envelope contract (bindings lib.rs:340-378)
        assert env["_anonymized"] is True
        for k in ("parse_ns", "anonymize_ns", "runtime_ns_total",
                  "raw_excerpt", "hash64", "parsed"):
            assert k in env
        assert env["runtime_ns_total"] == env["parse_ns"] + env["anonymize_ns"]
        # values match the conformance-pinned serial engine
        oracle = SerialAnonymizer(load_anon_config(self.CFG))
        plain = api.parse_kv(line)
        for k, v in plain.items():
            want = oracle.anonymize_one(k, v) if isinstance(v, str) else None
            assert env["parsed"][k] == (want if want is not None else v)
        # tokenization is memoized + exported
        env2 = api.parse_kv_enriched_anon(line)
        assert env2["parsed"]["src_ip"] == env["parsed"]["src_ip"]
        table = api.export_integrity_table()
        assert table["src_ip"][plain["src_ip"]] == env["parsed"]["src_ip"]
        assert env["parsed"]["src_ip"].startswith("IP_")
        st = api.get_anonymizer_status()
        assert st["enabled"] is True and st["pairs"] >= 2

    def test_load_anonymizer_from_file_and_no_engine_passthrough(
            self, tmp_path):
        api.load_embedded_schema()
        p = tmp_path / "anon.json"
        p.write_text(self.CFG)
        assert api.load_anonymizer(str(p)) is True
        assert api.get_anonymizer_status()["enabled"] is True
        # no engine -> parse still succeeds, values untouched
        api._ANON = None
        line = ("2024/01/01 00:00:00,SER123,1,TRAFFIC,start,2024/01/01 "
                "00:00:00,10.0.0.1,10.0.0.2,,,rule1,,,app1")
        env = api.parse_kv_enriched_anon(line)
        assert env["parsed"] == api.parse_kv(line)
        assert env["_anonymized"] is True
