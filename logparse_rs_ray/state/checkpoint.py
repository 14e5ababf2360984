"""Resumable partitioned execution with a lineage-carrying manifest.

The reference has no checkpointing (SURVEY.md §4.1: rerun from scratch).
The north rule requires: "resumable from checkpoint with per-partition
lineage + metrics".  Design (SURVEY.md §4.2):

* the input is split into P partitions (file groups — deterministic);
* each partition executes as its OWN streaming pipeline into an isolated
  ``partitions/p{ID:04d}/`` directory (write to ``...inprogress``, atomic
  rename on success — idempotent by partition id);
* a ``manifest.jsonl`` records one line per finished partition:
  partition id, input files, row/byte metrics, wall seconds, and the
  LINEAGE (schema sha256, anonymizer config sha256, engine version) —
  resume skips partitions whose manifest entry matches the current lineage
  and re-runs the rest, so a config/code change invalidates stale work;
* the cross-partition consolidation (integrity dedup, report merge) runs
  over the union of the per-partition bucketed side sinks — per-bucket
  tasks again, resumable via their own per-bucket output files.

A killed run loses at most its in-flight partitions; re-running the same
command completes the remainder and produces outputs identical to an
uninterrupted run (tests/test_checkpoint.py pins this).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field

__all__ = ["Manifest", "run_partitioned_flagship", "consolidate"]

ENGINE_VERSION = "logparse_rs_ray-0.1.0"


@dataclass
class Manifest:
    path: str
    records: dict[int, dict] = field(default_factory=dict)

    @classmethod
    def load(cls, path: str) -> "Manifest":
        m = cls(path)
        if os.path.exists(path):
            with open(path, "r", encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        # torn trailing line from a kill mid-append (records
                        # embed full input_files lists, which can exceed one
                        # write buffer): treat as an unfinished partition —
                        # the exact kill/resume scenario this module exists
                        # to survive (ADVICE r01)
                        continue
                    m.records[rec["partition_id"]] = rec
        return m

    def mark_done(self, rec: dict) -> None:
        self.records[rec["partition_id"]] = rec
        # if a prior append was killed mid-line, the file ends without a
        # newline — appending directly would concatenate this record onto
        # the torn fragment, corrupting it too; terminate the fragment first
        prefix = ""
        if os.path.exists(self.path) and os.path.getsize(self.path) > 0:
            with open(self.path, "rb") as fh:
                fh.seek(-1, os.SEEK_END)
                if fh.read(1) != b"\n":
                    prefix = "\n"
        with open(self.path, "a", encoding="utf-8") as fh:
            fh.write(prefix + json.dumps(rec, sort_keys=True) + "\n")

    def is_done(self, pid: int, lineage: dict, input_files: list[str] | None = None) -> bool:
        """A partition only counts as done if lineage AND its input file
        group match — adding files to the input dir or changing
        --partitions regroups the files, which must invalidate the old
        record (skipping on id+lineage alone would silently drop the new
        files from the run)."""
        rec = self.records.get(pid)
        if not (rec and rec.get("status") == "done" and rec.get("lineage") == lineage):
            return False
        return input_files is None or rec.get("input_files") == input_files


def _lineage(schema, anon_cfg_json: dict | str | None) -> dict:
    cfg_text = json.dumps(anon_cfg_json, sort_keys=True) if isinstance(anon_cfg_json, dict) else (anon_cfg_json or "")
    return {
        "schema_sha256": schema.schema_sha256,
        "anon_sha256": hashlib.sha256(cfg_text.encode()).hexdigest(),
        "engine": ENGINE_VERSION,
    }


def _partition_files(input_files: list[str], num_partitions: int) -> list[list[str]]:
    groups: list[list[str]] = [[] for _ in range(num_partitions)]
    for i, f in enumerate(sorted(input_files)):
        groups[i % num_partitions].append(f)
    return [g for g in groups if g]


def run_partitioned_flagship(
    input_path: str,
    out_dir: str,
    *,
    num_partitions: int = 8,
    schema=None,
    anon_config: dict | None = None,
    max_partitions: int | None = None,
    generated_at: str = "1970-01-01T00:00:00Z",
) -> dict:
    """Resumable flagship run.  ``max_partitions`` limits how many pending
    partitions run this invocation (used by the kill/resume test).

    Returns {"completed": n, "skipped": n, "report": ... or None}.
    The report/integrity consolidation only runs when every partition is
    done.
    """
    import functools
    import json as _json

    import ray.data as rd

    from ..core.anonymize import load_anon_config
    from ..pipelines.flagship import (append_report_rows, auto_side_buckets,
                                      enrich_webtext, parse_webtext)
    from ..stages.route import add_sink_column
    from ..webtext import default_anon_config_json, pan_schema

    schema = schema or pan_schema()
    anon_json = anon_config if anon_config is not None else default_anon_config_json()
    cfg = load_anon_config(anon_json)
    lineage = _lineage(schema, anon_json)

    files = sorted(glob.glob(os.path.join(input_path, "*.parquet"))) or [input_path]
    parts = _partition_files(files, num_partitions)

    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest.load(os.path.join(out_dir, "manifest.jsonl"))

    # side-sink bucket count pinned PER OUT_DIR on first invocation: buckets
    # hash-partition the key space, so every partition root consolidated
    # together must share the count even when a resume runs on a
    # different-size cluster (flagship.auto_side_buckets note)
    sb_path = os.path.join(out_dir, "side_buckets.json")
    if os.path.exists(sb_path):
        with open(sb_path, encoding="utf-8") as fh:
            side_buckets = int(_json.load(fh)["side_buckets"])
    else:
        side_buckets = auto_side_buckets()
        # atomic publish like every other checkpoint state: a crash
        # mid-write must never leave a truncated file that bricks resume
        tmp_sb = sb_path + ".tmp"
        with open(tmp_sb, "w", encoding="utf-8") as fh:
            _json.dump({"side_buckets": side_buckets}, fh)
        os.replace(tmp_sb, sb_path)

    # partition dirs beyond the current grouping (e.g. --partitions shrank)
    # would otherwise leak stale data into the consolidation glob
    for d in glob.glob(os.path.join(out_dir, "partitions", "p[0-9][0-9][0-9][0-9]")):
        if int(os.path.basename(d)[1:]) >= len(parts):
            shutil.rmtree(d, ignore_errors=True)

    completed = skipped = 0
    for pid, group in enumerate(parts):
        if manifest.is_done(pid, lineage, group):
            skipped += 1
            continue
        if max_partitions is not None and completed >= max_partitions:
            break
        pdir = os.path.join(out_dir, "partitions", f"p{pid:04d}")
        tmp = pdir + ".inprogress"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(pdir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = rd.read_parquet(group)
        parsed = parse_webtext(ds, schema)
        enriched = enrich_webtext(parsed, cfg, emit_integrity_rows=True,
                                  integrity_buckets=side_buckets)
        routed = enriched.map_batches(add_sink_column, batch_format="pyarrow",
                                      batch_size=None)
        routed = routed.map_batches(
            functools.partial(append_report_rows, n_buckets=side_buckets),
            batch_format="pyarrow", batch_size=None)
        routed.write_parquet(f"{tmp}/sinks", partition_cols=["sink"])
        os.replace(tmp, pdir)  # atomic publish: partition done
        wall = time.perf_counter() - t0
        import pyarrow.parquet as pq

        in_rows = sum(pq.read_metadata(f).num_rows for f in group)
        manifest.mark_done({
            "partition_id": pid,
            "status": "done",
            "input_files": group,
            "metrics": {"input_rows": in_rows, "wall_s": round(wall, 3)},
            "lineage": lineage,
        })
        completed += 1

    all_done = all(manifest.is_done(pid, lineage, g) for pid, g in enumerate(parts))
    if completed > 0:
        # some partition was (re)computed this invocation — drop previously
        # consolidated outputs so skip-if-exists bucket files can't serve
        # stale results (e.g. after a lineage change forced recomputation)
        shutil.rmtree(os.path.join(out_dir, "integrity"), ignore_errors=True)
        try:
            os.remove(os.path.join(out_dir, "report.json"))
        except FileNotFoundError:
            pass
    report = consolidate(out_dir, generated_at=generated_at) if all_done else None
    return {"completed": completed, "skipped": skipped, "all_done": all_done,
            "report": report}


def consolidate(out_dir: str, *, generated_at: str, k: int = 10) -> dict:
    """Cross-partition integrity dedup + report merge over the union of the
    per-partition bucketed side sinks — delegates to the shared per-bucket
    consolidation (pipelines.flagship.consolidate_sinks)."""
    from ..pipelines.flagship import consolidate_sinks
    from ..sources import write_json_report

    sink_roots = sorted(glob.glob(f"{out_dir}/partitions/p[0-9][0-9][0-9][0-9]/sinks"))
    report = consolidate_sinks(sink_roots, f"{out_dir}/integrity", k=k)
    report["generated_at"] = generated_at
    write_json_report(report, f"{out_dir}/report.json")
    return report
