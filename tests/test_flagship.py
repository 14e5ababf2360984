"""End-to-end flagship conformance vs the pure-Python oracle (north-rule
gates: per-sink counts, routed-row sets, byte-identical extracted text per
url, integrity table equality, report aggregates)."""

import json
from collections import Counter

import pyarrow.parquet as pq
import pytest

from logparse_rs_ray.core.anonymize import load_anon_config
from logparse_rs_ray.webtext import (
    default_anon_config_json,
    generate_webtext_table,
    pan_schema,
)

from .oracle import run_oracle

N_ROWS = 3000


@pytest.fixture(scope="module")
def flagship_run(ray_session, tmp_path_factory):
    import ray.data as rd

    from logparse_rs_ray.pipelines.flagship import run_flagship

    out = str(tmp_path_factory.mktemp("flagship"))
    table = generate_webtext_table(N_ROWS, seed=42)
    report = run_flagship(rd.from_arrow(table), out, generated_at="2025-06-01T00:00:00Z")
    oracle = run_oracle(table, pan_schema(), load_anon_config(default_anon_config_json()))
    return table, report, oracle, out


def _read_sink(out_dir: str, sink: str):
    import glob

    files = glob.glob(f"{out_dir}/sinks/sink={sink}/*.parquet")
    assert files, f"no files for sink {sink}"
    return pq.read_table(files)


class TestFlagshipConformance:
    def test_per_sink_counts(self, flagship_run):
        _table, report, oracle, out = flagship_run
        got = {r["key"]: r["count"] for r in report["by_log_type"]}
        want = dict(oracle["counters"]["by_log_type"])
        assert got == want

    def test_routed_row_sets_per_sink(self, flagship_run):
        _table, _report, oracle, out = flagship_run
        for sink, rows in oracle["rows_by_sink"].items():
            if sink == "_deadletter":
                continue
            t = _read_sink(out, sink)
            got_urls = set(t["url"].to_pylist())
            want_urls = {r["url"] for r in rows}
            assert got_urls == want_urls, f"sink {sink} routed-row set mismatch"

    def test_deadletter_set(self, flagship_run):
        _table, report, oracle, out = flagship_run
        t = _read_sink(out, "_deadletter")
        assert set(t["url"].to_pylist()) == {r["url"] for r in oracle["rows_by_sink"]["_deadletter"]}
        assert report["errors"] == len(oracle["rows_by_sink"]["_deadletter"])

    def test_byte_identical_extracted_text_per_url(self, flagship_run):
        _table, _report, oracle, out = flagship_run
        for sink in list(oracle["rows_by_sink"]):
            if sink == "_deadletter":
                continue
            t = _read_sink(out, sink)
            for url, text in zip(t["url"].to_pylist(), t["extracted_text"].to_pylist()):
                assert text.encode("utf-8") == oracle["extracted"][url].encode("utf-8")

    def test_parsed_values_and_anonymization(self, flagship_run):
        _table, _report, oracle, out = flagship_run
        for sink, rows in oracle["rows_by_sink"].items():
            if sink == "_deadletter":
                continue
            t = _read_sink(out, sink)
            cols = [c for c in t.column_names if not c.startswith("_") and c != "sink"]
            got = {r["url"]: r for r in t.select(cols).to_pylist()}
            for want in rows:
                g = got[want["url"]]
                for k, v in want.items():
                    if k in ("hash64",):
                        assert int(g[k]) == v, (sink, want["url"], k)
                    elif k in g:
                        assert g[k] == v, (sink, want["url"], k, g[k], v)

    def test_integrity_table_equals_serial_oracle(self, flagship_run):
        _table, _report, oracle, out = flagship_run
        import glob

        t = pq.read_table(glob.glob(f"{out}/integrity/*.parquet"))
        got: dict[str, dict[str, str]] = {}
        for f, o, r in zip(t["field"].to_pylist(), t["original"].to_pylist(),
                           t["replacement"].to_pylist()):
            got.setdefault(f, {})[o] = r
        assert got == oracle["integrity"]

    def test_report_counters(self, flagship_run):
        _table, report, oracle, _out = flagship_run
        for dim in ("by_action", "by_region", "by_severity", "error_reasons"):
            got = {r["key"]: r["count"] for r in report[dim]}
            assert got == dict(oracle["counters"][dim]), dim

    def test_topk_sets_within_count_buckets(self, flagship_run):
        # ties are order-unstable: assert top-k as (count -> key set) prefix
        _table, report, oracle, _out = flagship_run
        for dim in ("top_applications", "top_domains"):
            got = [(r["key"], r["count"]) for r in report[dim]]
            mc = oracle["counters"][dim].most_common()
            k = len(got)
            assert len(mc) >= k
            cutoff = mc[k - 1][1] if k else 0
            # every reported entry's count matches the oracle count
            for key, cnt in got:
                assert oracle["counters"][dim][key] == cnt
            # all strictly-above-cutoff keys must be present
            must = {key for key, c in mc if c > cutoff}
            assert must <= {key for key, _ in got}

    def test_report_total(self, flagship_run):
        _table, report, oracle, _out = flagship_run
        assert report["total_logs"] == sum(oracle["counters"]["by_log_type"].values())

    def test_report_json_written_and_deterministic_fields(self, flagship_run):
        _table, report, _oracle, out = flagship_run
        on_disk = json.load(open(f"{out}/report.json"))
        assert on_disk["generated_at"] == "2025-06-01T00:00:00Z"
        assert on_disk["total_logs"] == report["total_logs"]


class TestIntegrityExports:
    def test_integrity_json_export_reference_shape(self, flagship_run):
        from logparse_rs_ray.pipelines.flagship import export_integrity_json

        _table, _report, oracle, out = flagship_run
        path = export_integrity_json(out)
        got = json.load(open(path))
        assert got == oracle["integrity"]
        # pretty + sorted (reference rust_accel.py:391-414)
        text = open(path).read()
        assert text == json.dumps(got, indent=2, sort_keys=True)

    def test_integrity_status(self, flagship_run):
        from logparse_rs_ray.pipelines.flagship import integrity_status

        _table, _report, oracle, out = flagship_run
        st = integrity_status(out)
        assert st["enabled"]
        assert st["fields"] == len(oracle["integrity"])
        assert st["pairs"] == sum(len(m) for m in oracle["integrity"].values())


class TestSaltedRouting:
    def test_salt_column_splits_hot_key(self, ray_session):
        import pyarrow as pa

        from logparse_rs_ray.stages.route import add_salt_column

        # a pathologically hot key: every row identical sink, distinct hashes
        batch = pa.table({
            "hash64": pa.array(list(range(10_000)), type=pa.uint64()),
            "sink": pa.array(["hot"] * 10_000),
        })
        salted = add_salt_column(batch, num_salts=16)
        counts = salted.group_by(["salt"]).aggregate([([], "count_all")])
        per_salt = counts["count_all"].to_pylist()
        assert len(per_salt) == 16
        # near-uniform split: no sub-partition holds more than 2x the mean
        assert max(per_salt) < 2 * (10_000 / 16)


class TestDeterministicGeneration:
    def test_partition_independence(self):
        from logparse_rs_ray.webtext import generate_webtext_batch

        whole = generate_webtext_table(200, seed=42)
        a = generate_webtext_batch(0, 87, seed=42)
        b = generate_webtext_batch(87, 200, seed=42)
        import pyarrow as pa

        assert pa.concat_tables([a, b]).equals(whole)

    def test_hot_domain_skew_present(self):
        t = generate_webtext_table(5000, seed=42)
        domains = Counter(u.split("/")[2] for u in t["url"].to_pylist())
        top2 = sum(c for _, c in domains.most_common(2))
        assert 0.3 < top2 / 5000 < 0.5


class TestActorPoolMode:
    def test_actor_pool_stages_match_task_mode(self, ray_session, tmp_path):
        """The parse/enrich stages run identically as an actor pool
        (concurrency=N — state built once per actor) and as stateless
        tasks; results must be byte-identical."""
        import ray.data as rd

        from logparse_rs_ray.pipelines.flagship import run_flagship

        table = generate_webtext_table(1500, seed=42)
        rep_task = run_flagship(rd.from_arrow(table), str(tmp_path / "task"))
        rep_pool = run_flagship(rd.from_arrow(table), str(tmp_path / "pool"),
                                map_kwargs={"concurrency": 2})
        for k in ("total_logs", "errors", "by_log_type", "top_domains", "by_region"):
            assert rep_task[k] == rep_pool[k], k
