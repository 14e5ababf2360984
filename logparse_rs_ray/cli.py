"""CLI entry point — the ``ray job submit`` surface of the engine.

Usage (single node / in a job):

    python -m logparse_rs_ray.cli run \
        --input /path/to/webtext_parquet_dir --output /tmp/out \
        [--schema schema.json] [--anon-config anon.json] \
        [--partitions 8] [--max-partitions K] [--ndjson]

Env-var extension points, byte-compatible with the reference's (§2.9,
/root/reference/docs/env.md): ``LOGPARSE_PRELOAD_SCHEMA`` /
``SCHEMA_JSON_PATH`` provide a default schema path, ``LOGPARSE_ANON_CONFIG``
a default anonymizer config path.

Re-running the same command resumes from the manifest (checkpointed
partitions are skipped).  The CLI owns the Ray session (guarded init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


_SCHEMA_CACHE = None


def _load_schema(path: str | None):
    """CLI-tier schema resolution with the reference's hot-reload semantics
    (ensure_schema_loaded, schema.rs:97-115): a repeated call in the same
    process recompiles only when the file's mtime changed."""
    global _SCHEMA_CACHE
    from .core.schema import SchemaCache
    from .webtext import pan_schema

    # reference load order (rust_accel.py:79-92): explicit path first, then
    # LOGPARSE_USE_EMBEDDED=1 forces the packaged schema (ignoring env
    # paths), then env-named files, then the packaged default
    if not path and os.environ.get("LOGPARSE_USE_EMBEDDED") == "1":
        return pan_schema()
    path = path or os.environ.get("LOGPARSE_PRELOAD_SCHEMA") or os.environ.get("SCHEMA_JSON_PATH")
    if not path:
        return pan_schema()
    if _SCHEMA_CACHE is None:
        _SCHEMA_CACHE = SchemaCache()
    return _SCHEMA_CACHE.get(path)


def _load_anon(path: str | None) -> dict | None:
    path = path or os.environ.get("LOGPARSE_ANON_CONFIG")
    if not path:
        return None
    with open(path, "r", encoding="utf-8") as fh:
        return json.load(fh)


def _query_registry() -> dict:
    """The same merged registry ``__ray_entry__.queries()`` exposes,
    importable without the repo root on sys.path."""
    from .pipelines import query_registry

    return query_registry()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="logparse_rs_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="resumable partitioned flagship run")
    runp.add_argument("--input", required=True)
    runp.add_argument("--output", required=True)
    runp.add_argument("--schema")
    runp.add_argument("--anon-config")
    runp.add_argument("--partitions", type=int, default=8)
    runp.add_argument("--max-partitions", type=int, default=None)
    runp.add_argument("--generated-at", default="1970-01-01T00:00:00Z")
    runp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    ndp = sub.add_parser("ndjson", help="parse to per-sink NDJSON (reference parse_file_to_ndjson)")
    ndp.add_argument("--input", required=True)
    ndp.add_argument("--output", required=True)
    ndp.add_argument("--schema")
    ndp.add_argument("--format", choices=["parquet", "text"],
                     default="parquet",
                     help="input layout: parquet table with a text column, "
                          "or raw log files/dirs (one line per record — "
                          "the reference's parse_file_to_ndjson input)")
    ndp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    curp = sub.add_parser(
        "curate", help="corpus curation -> sharded training export "
                       "(quality gate + holdout + decontamination + dedup)")
    curp.add_argument("--input", required=True,
                      help="dir containing documents.parquet")
    curp.add_argument("--output", required=True,
                      help="export dir (one subdir per shard)")
    curp.add_argument("--shards", type=int, default=16)
    curp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    cp = sub.add_parser(
        "compact", help="merge small parquet files in a hive-partitioned "
                        "output tree (one crash-safe task per leaf dir)")
    cp.add_argument("--input", required=True, help="output tree root")
    cp.add_argument("--target-mb", type=int, default=128,
                    help="target compacted file size (MiB)")
    cp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    qp = sub.add_parser(
        "query", help="run one registry query (see `query --list`) over an "
                      "sf-style table dir; print head or write parquet")
    qp.add_argument("name", nargs="?", help="query name from the registry")
    qp.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    qp.add_argument("--output", help="write full result to this parquet "
                                     "path instead of printing the head")
    qp.add_argument("--head", type=int, default=20)
    qp.add_argument("--list", action="store_true",
                    help="list registered query names and exit")
    qp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    args = p.parse_args(argv)

    if args.cmd == "query" and args.list:
        for name in sorted(_query_registry()):
            print(name)
        return 0
    if args.cmd == "query" and not args.name:
        p.error("query: a name is required (or --list)")
    if args.cmd == "query" and args.name not in _query_registry():
        # validate BEFORE paying Ray startup — the registry needs no session
        print(f"unknown query {args.name!r} (see `query --list`)",
              file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        if args.cmd == "run":
            from .state.checkpoint import run_partitioned_flagship

            result = run_partitioned_flagship(
                args.input, args.output,
                num_partitions=args.partitions,
                schema=_load_schema(args.schema),
                anon_config=_load_anon(args.anon_config),
                max_partitions=args.max_partitions,
                generated_at=args.generated_at,
            )
            print(json.dumps({
                "completed": result["completed"], "skipped": result["skipped"],
                "all_done": result["all_done"],
                "total_logs": (result["report"] or {}).get("total_logs"),
            }))
        elif args.cmd == "ndjson":
            import ray.data as rd

            from .pipelines.flagship import parse_webtext
            from .pipelines.ndjson import write_ndjson_sinks

            schema = _load_schema(args.schema)
            if args.format == "text":
                from .sources import read_log_lines

                src = read_log_lines(args.input)
            else:
                src = rd.read_parquet(args.input)
            parsed = parse_webtext(src, schema)
            write_ndjson_sinks(parsed, args.output, schema)
            print(json.dumps({"status": "ok", "output": args.output}))
        elif args.cmd == "curate":
            from .pipelines.curation import doc_training_export

            census = doc_training_export(args.input, n_shards=args.shards,
                                         out_dir=args.output).to_pandas()
            print(json.dumps({
                "status": "ok", "output": args.output,
                "shards": len(census),
                "n_docs": int(census.n_docs.sum()),
                "n_tokens": int(census.n_tokens.sum()),
            }))
        elif args.cmd == "compact":
            from .state.compact import compact_tree

            stats = compact_tree(args.input,
                                 target_bytes=args.target_mb * 1024 * 1024)
            print(json.dumps({"status": "ok", **stats}))
        elif args.cmd == "query":
            import pyarrow as pa
            import pyarrow.parquet as pq

            res = _query_registry()[args.name](args.sf_dir)
            if isinstance(res, pa.Table):
                tbl = res
            elif hasattr(res, "to_arrow_refs") or hasattr(res, "iter_batches"):
                parts = list(res.iter_batches(batch_format="pyarrow",
                                              batch_size=None))
                if parts:
                    tbl = pa.concat_tables(parts)
                else:
                    # all-empty Dataset: recover the column names/types from
                    # the Dataset schema so the printed head / written
                    # parquet keeps a typed zero-row table instead of
                    # silently collapsing to zero columns (ADVICE r04)
                    try:
                        sch = res.schema()
                        arrow_sch = getattr(sch, "base_schema", None) or sch
                        tbl = arrow_sch.empty_table()
                    except Exception:
                        tbl = pa.table({})
            else:  # pandas
                tbl = pa.Table.from_pandas(res, preserve_index=False)
            if args.output:
                pq.write_table(tbl, args.output)
                print(json.dumps({"status": "ok", "query": args.name,
                                  "rows": tbl.num_rows,
                                  "output": args.output}))
            else:
                print(tbl.slice(0, args.head).to_pandas().to_string())
                print(json.dumps({"status": "ok", "query": args.name,
                                  "rows": tbl.num_rows}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
