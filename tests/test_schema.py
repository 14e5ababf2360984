"""Schema compile conformance (reference schema.rs:39-127; SURVEY.md §1.4)."""

import json

from logparse_rs_ray.core.schema import (
    CompiledSchema,
    compile_schema,
    sanitize_identifier,
)

MINI_SCHEMA = {
    "palo_alto_syslog_fields": {
        "log_types": {
            "traffic": {
                "type_value": "TRAFFIC",
                "description": "t",
                "field_count": 8,
                "fields": [
                    "FUTURE_USE",
                    {"name": "Receive Time"},
                    {"name": "Serial Number"},
                    {"name": "Type"},
                    {"name": "Src IP"},
                    {"name": "Dst IP"},
                    {"name": "Action"},
                    "FUTURE_USE",
                ],
            },
            "threat": {
                "type_value": "THREAT",
                "fields": ["f0", "f1", "f2", "f3", {"name": "Misc/Field"}],
            },
        }
    }
}


class TestSanitize:
    def test_pinned_cases(self):
        assert sanitize_identifier("Src IP") == "src_ip"
        assert sanitize_identifier("src-ip") == "src_ip"
        assert sanitize_identifier("9bad") == "_9bad"
        assert sanitize_identifier("") == "_"

    def test_misc_field(self):
        assert sanitize_identifier("Misc/Field") == "misc_field"

    def test_non_ascii_to_underscore(self):
        assert sanitize_identifier("a€b") == "a_b"
        assert sanitize_identifier("  Trim Me  ") == "trim_me"


class TestCompile:
    def test_type_map(self):
        cs = compile_schema(MINI_SCHEMA)
        assert set(cs.type_to_fields) == {"TRAFFIC", "THREAT"}
        assert cs.type_to_fields["TRAFFIC"] == (
            "future_use", "receive_time", "serial_number", "type",
            "src_ip", "dst_ip", "action", "future_use",
        )
        assert cs.type_to_fields["THREAT"] == ("f0", "f1", "f2", "f3", "misc_field")

    def test_last_dup_wins_positions(self):
        cs = compile_schema(MINI_SCHEMA)
        pos = dict(cs.value_positions("TRAFFIC"))
        # duplicate FUTURE_USE at indices 0 and 7: LAST position wins
        assert pos["future_use"] == 7
        assert pos["src_ip"] == 4

    def test_columns_dedupe_keep_first_slot(self):
        cs = compile_schema(MINI_SCHEMA)
        assert cs.type_to_columns["TRAFFIC"] == (
            "future_use", "receive_time", "serial_number", "type",
            "src_ip", "dst_ip", "action",
        )

    def test_union_columns_cover_all_types(self):
        cs = compile_schema(MINI_SCHEMA)
        assert set(cs.union_columns) >= set(cs.type_to_columns["TRAFFIC"])
        assert set(cs.union_columns) >= set(cs.type_to_columns["THREAT"])

    def test_sha_stable(self):
        text = json.dumps(MINI_SCHEMA)
        assert compile_schema(text).schema_sha256 == compile_schema(text).schema_sha256

    def test_from_type_map_roundtrip(self):
        cs = CompiledSchema.from_type_map({"T": ["a", "b", "a"]})
        assert cs.type_to_fields["T"] == ("a", "b", "a")
        assert dict(cs.value_positions("T"))["a"] == 2


class TestSchemaHotReload:
    def test_mtime_reload(self, tmp_path):
        """ensure_schema_loaded parity (reference schema.rs:97-115): same
        mtime -> cached object; changed file -> recompiled schema."""
        import json
        import os
        import time

        from logparse_rs_ray.core.schema import SchemaCache

        p = str(tmp_path / "schema.json")

        def write(type_value):
            with open(p, "w") as fh:
                json.dump({"palo_alto_syslog_fields": {"log_types": {
                    "t": {"type_value": type_value, "fields": ["A", "B"]}}}}, fh)

        write("TRAFFIC")
        cache = SchemaCache()
        s1 = cache.get(p)
        assert cache.get(p) is s1  # unchanged mtime -> same compiled object

        time.sleep(0.01)
        write("THREAT")
        os.utime(p)  # make sure mtime ticks even on coarse filesystems
        s2 = cache.get(p)
        assert s2 is not s1
        assert "THREAT" in s2.type_to_fields and "TRAFFIC" not in s2.type_to_fields

    def test_cli_load_schema_uses_cache(self, tmp_path, monkeypatch):
        import json

        import logparse_rs_ray.cli as cli

        p = str(tmp_path / "schema.json")
        with open(p, "w") as fh:
            json.dump({"palo_alto_syslog_fields": {"log_types": {
                "t": {"type_value": "X", "fields": ["F"]}}}}, fh)
        monkeypatch.setattr(cli, "_SCHEMA_CACHE", None)
        s1 = cli._load_schema(p)
        assert cli._load_schema(p) is s1
