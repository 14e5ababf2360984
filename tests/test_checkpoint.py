"""Kill/resume conformance (FIXTURES.md §4, SURVEY.md §5.2 item 5):
a run killed after K of P partitions, resumed, must produce outputs
identical to an uninterrupted run."""

import glob
import json

import pyarrow.dataset as pads
import pytest


@pytest.fixture(scope="module")
def webtext_input(ray_session, tmp_path_factory):
    from logparse_rs_ray.webtext import webtext_dataset

    path = str(tmp_path_factory.mktemp("wt_in"))
    webtext_dataset(4000).repartition(8).write_parquet(path)
    return path


def _final_state(out_dir: str):
    sink_rows = {}
    for d in sorted(glob.glob(f"{out_dir}/partitions/*/sinks/sink=*")):
        sink = d.rsplit("=", 1)[1]
        t = pads.dataset(d).to_table(columns=["url", "hash64"])
        sink_rows.setdefault(sink, set()).update(
            zip(t["url"].to_pylist(), t["hash64"].to_pylist()))
    integ = {}
    it = pads.dataset(sorted(glob.glob(f"{out_dir}/integrity/*.parquet"))).to_table()
    for f, o, r in zip(it["field"].to_pylist(), it["original"].to_pylist(),
                       it["replacement"].to_pylist()):
        integ[(f, o)] = r
    report = json.load(open(f"{out_dir}/report.json"))
    return sink_rows, integ, report


@pytest.mark.usefixtures("ray_session")
class TestResume:
    def test_killed_then_resumed_equals_uninterrupted(self, webtext_input, tmp_path):
        from logparse_rs_ray.state.checkpoint import run_partitioned_flagship

        full = str(tmp_path / "full")
        r1 = run_partitioned_flagship(webtext_input, full, num_partitions=4)
        assert r1["all_done"] and r1["completed"] == 4

        # "killed" run: only 2 of 4 partitions execute
        cut = str(tmp_path / "cut")
        r2 = run_partitioned_flagship(webtext_input, cut, num_partitions=4,
                                      max_partitions=2)
        assert not r2["all_done"] and r2["completed"] == 2 and r2["report"] is None

        # resume: skips the 2 finished partitions, completes the rest
        r3 = run_partitioned_flagship(webtext_input, cut, num_partitions=4)
        assert r3["all_done"] and r3["skipped"] == 2 and r3["completed"] == 2

        s_full, i_full, rep_full = _final_state(full)
        s_cut, i_cut, rep_cut = _final_state(cut)
        assert s_full == s_cut
        assert i_full == i_cut
        for k in ("total_logs", "errors", "by_log_type", "by_region", "top_domains"):
            assert rep_full[k] == rep_cut[k], k

    def test_lineage_change_invalidates(self, webtext_input, tmp_path):
        from logparse_rs_ray.state.checkpoint import run_partitioned_flagship
        from logparse_rs_ray.webtext import default_anon_config_json

        out = str(tmp_path / "lineage")
        run_partitioned_flagship(webtext_input, out, num_partitions=2)
        # changed anonymizer config -> different lineage -> nothing skipped
        cfg = default_anon_config_json()
        cfg["defaults"]["tokenize"]["salt"] = "different-salt"
        r = run_partitioned_flagship(webtext_input, out, num_partitions=2,
                                     anon_config=cfg, max_partitions=0)
        assert r["skipped"] == 0

    def test_manifest_records_metrics_and_lineage(self, webtext_input, tmp_path):
        from logparse_rs_ray.state.checkpoint import Manifest, run_partitioned_flagship

        out = str(tmp_path / "mani")
        run_partitioned_flagship(webtext_input, out, num_partitions=2)
        m = Manifest.load(f"{out}/manifest.jsonl")
        assert len(m.records) == 2
        for rec in m.records.values():
            assert rec["status"] == "done"
            assert rec["metrics"]["input_rows"] > 0
            assert rec["metrics"]["wall_s"] > 0
            assert set(rec["lineage"]) == {"schema_sha256", "anon_sha256", "engine"}

    def test_lineage_change_rerun_refreshes_consolidated_outputs(self, webtext_input, tmp_path):
        """After a config change forces recomputation, the consolidated
        integrity table must reflect the NEW tokens, not stale bucket files."""
        import glob

        import pyarrow.dataset as pads

        from logparse_rs_ray.state.checkpoint import run_partitioned_flagship
        from logparse_rs_ray.webtext import default_anon_config_json

        out = str(tmp_path / "relin")
        run_partitioned_flagship(webtext_input, out, num_partitions=2)
        t1 = pads.dataset(glob.glob(f"{out}/integrity/*.parquet")).to_table()
        tokens1 = set(t1["replacement"].to_pylist())

        cfg = default_anon_config_json()
        cfg["fields"]["src_ip"]["tokenize"]["salt"] = "rotated-salt"
        r = run_partitioned_flagship(webtext_input, out, num_partitions=2,
                                     anon_config=cfg)
        assert r["all_done"] and r["completed"] == 2 and r["skipped"] == 0
        t2 = pads.dataset(glob.glob(f"{out}/integrity/*.parquet")).to_table()
        tokens2 = set(t2["replacement"].to_pylist())
        ip1 = {t for t in tokens1 if t.startswith("IP_")}
        ip2 = {t for t in tokens2 if t.startswith("IP_")}
        assert ip1 and ip2 and ip1.isdisjoint(ip2)
