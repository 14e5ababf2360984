"""Conformance against the reference's OWN production artifacts: the real
10-type PAN schema (117-field TRAFFIC, duplicate FUTURE_USE positions) and
anonymizer.sample.json, on the realistic 45-field line from
examples/test_parser.py:12."""

import pyarrow as pa
import pytest

from logparse_rs_ray.core.anonymize import SerialAnonymizer, load_anon_config
from logparse_rs_ray.core.schema import TYPE_INDEX, load_schema
from logparse_rs_ray.core.tokenize import split_csv
from logparse_rs_ray.core.fnv import fnv1a64
from logparse_rs_ray.stages.enrich import Enricher
from logparse_rs_ray.stages.parse import WebtextParser

SCHEMA_PATH = "/root/reference/examples/schema/schema.json"
ANON_PATH = "/root/reference/examples/schema/anonymizer.sample.json"

# examples/test_parser.py:12 (syslog-prefixed, 45 CSV fields)
PAN_LINE = (
    "Oct 30 09:46:12 1,2012/10/30 09:46:12,01606001116,TRAFFIC,start,1,"
    "2012/04/10 04:39:58,192.168.0.2,204.232.231.46,0.0.0.0,0.0.0.0,rule1,"
    "crusher,,web-browsing,vsys1,trust,untrust,ethernet1/2,ethernet1/1,"
    "forwardAll,2012/04/10 04:39:59,11449,1,59324,80,0,0,0x200000,tcp,allow,"
    "78,78,0,1,2012/04/10 04:39:59,0,any,0,0,0x0,"
    "192.168.0.0-192.168.255.255,United States,0,1,0"
)


@pytest.fixture(scope="module")
def schema():
    return load_schema(SCHEMA_PATH)


@pytest.fixture(scope="module")
def anon_cfg():
    return load_anon_config(open(ANON_PATH).read())


class TestReferenceSchema:
    def test_schema_compiles(self, schema):
        assert set(schema.type_to_fields) == {
            "CONFIG", "DECRYPTION", "GLOBALPROTECT", "HIPMATCH", "IPTAG",
            "SCTP", "SYSTEM", "THREAT", "TRAFFIC", "USERID",
        }
        # schema.json TRAFFIC declares field_count 120 but carries 117
        # entries — informational only, never validated (schema.rs:27-28)
        assert len(schema.type_to_fields["TRAFFIC"]) == 117

    def test_realistic_line_parse(self, schema):
        parser = WebtextParser(schema)
        out = parser(pa.table({"text": [PAN_LINE]}))
        payload = PAN_LINE[PAN_LINE.find(" 1,") + 1:]
        fields = split_csv(payload)
        assert out["extracted_text"][0].as_py() == payload
        assert out["log_type"][0].as_py() == "TRAFFIC"
        assert int(out["hash64"][0].as_py()) == fnv1a64(payload)
        assert out["raw_excerpt"][0].as_py() == payload[:256]
        pos = dict(schema.value_positions("TRAFFIC"))
        for name, p in pos.items():
            want = fields[p] if p < len(fields) else None
            assert out[name][0].as_py() == want, (name, p)
        # dup positions: last wins (FUTURE_USE appears many times in TRAFFIC)
        assert pos["future_use"] == max(
            i for i, n in enumerate(schema.type_to_fields["TRAFFIC"])
            if n == "future_use"
        )
        # short line: 45 fields < 117 -> trailing schema fields are null
        tail_cols = [n for n, p in pos.items() if p >= len(fields)]
        assert tail_cols and all(out[c][0].as_py() is None for c in tail_cols)

    def test_sample_anonymizer_on_realistic_line(self, schema, anon_cfg):
        parser = WebtextParser(schema)
        parsed = parser(pa.table({"text": [PAN_LINE]}))
        enriched = Enricher(anon_cfg, None, url_column="__none__")(parsed)
        oracle = SerialAnonymizer(anon_cfg)
        assert enriched["source_address"][0].as_py() == oracle.anonymize_one(
            "source_address", "192.168.0.2")
        assert enriched["source_address"][0].as_py().startswith("SRC_")
        assert enriched["destination_address"][0].as_py() == oracle.anonymize_one(
            "destination_address", "204.232.231.46")
        # the config's 'rule'/'user' rules target fields this schema doesn't
        # produce (schema has rule_name/source_user) -> those stay
        # passthrough, exactly as the reference's per-key application would
        # 'rule' exists only as another type's union column -> null here,
        # and null values are never anonymized (bindings lib.rs:353)
        assert enriched["rule"][0].as_py() is None
        assert enriched["rule_name"][0].as_py() == "rule1"
        assert enriched["source_user"][0].as_py() == "crusher"
        assert oracle.anonymize_one("rule_name", "rule1") is None

    def test_type_at_index_3_convention(self, schema):
        payload = PAN_LINE[PAN_LINE.find(" 1,") + 1:]
        assert split_csv(payload)[TYPE_INDEX] == "TRAFFIC"
