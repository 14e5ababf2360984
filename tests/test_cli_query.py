"""The ``query`` CLI subcommand: registry listing (no Ray session) and a
full run-to-parquet round trip in a subprocess (the CLI owns its own Ray
session, so it must not run in-process under the shared test fixture)."""

from __future__ import annotations

import json
import subprocess
import sys

SF = "/root/testdata/sf0.001"


def _cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "logparse_rs_ray.cli", *args],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)


class TestQueryCli:
    def test_list_needs_no_ray(self):
        r = _cli("query", "--list")
        assert r.returncode == 0
        names = r.stdout.split()
        assert "q1_pricing_summary" in names
        assert "doc_bm25_topk" in names
        assert len(names) >= 150

    def test_unknown_name_fails_cleanly(self):
        r = _cli("query", "no_such_query", "--num-cpus", "2")
        assert r.returncode == 2
        assert "unknown query" in r.stderr

    def test_run_to_parquet(self, tmp_path):
        import pyarrow.parquet as pq

        out = tmp_path / "res.parquet"
        r = _cli("query", "q_count_by_priority", "--sf-dir", SF,
                 "--num-cpus", "4", "--output", str(out))
        assert r.returncode == 0, r.stderr[-500:]
        status = json.loads(r.stdout.strip().splitlines()[-1])
        assert status["status"] == "ok"
        tbl = pq.read_table(out)
        assert tbl.num_rows == status["rows"] == 5
        assert tbl.column_names == ["o_orderpriority", "n_orders"]
