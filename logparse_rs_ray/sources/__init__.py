"""Source/sink helpers: column-pruned parquet reads, small-result writers."""

from __future__ import annotations

import json
import os

__all__ = ["read_table", "read_ndjson", "read_log_lines",
           "write_json_report"]


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs):
    """Column-pruned parquet read of one test table.

    Always pass ``columns`` in pipelines — reading all columns for a
    two-column transform is wrong at 100 TB (prune at the read).

    Degenerate-file guard: when a file holds fewer rows than the split
    count Ray would choose, the surplus read blocks are ZERO-COLUMN
    empties that skip every map UDF and poison pyarrow schema unification
    inside shuffle joins.  A footer rowcount probe (driver-side, metadata
    only) forces one block for such files; at real scale rows >> blocks
    and the probe changes nothing.
    """
    import ray.data as rd

    path = os.path.join(sf_dir, f"{name}.parquet")
    if "override_num_blocks" not in kwargs:
        try:
            import pyarrow.parquet as pq

            if pq.read_metadata(path).num_rows < 16:
                kwargs["override_num_blocks"] = 1
        except Exception:
            pass
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_json_report(report: dict, path: str) -> None:
    """Small driver-side JSON report (reference pan_dynamic_parser.py:1301-1310).
    Timestamps must be injected by the caller — never datetime.now() here."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)
    os.replace(tmp, path)


def read_log_lines(paths, **kwargs):
    """Distributed raw log-file source: one row per line, column ``text``
    — the shape ``WebtextParser`` / ``run_flagship`` consume, so pointing
    the engine at raw syslog files on disk (the reference's primary input
    mode: pan_dynamic_parser.py ``main()`` / ``parse_file_to_ndjson`` read
    log files line-by-line) is one call.  Ray's text datasource lists
    files in parallel, splits by file, and streams blocks with
    backpressure — a directory of large logs never funnels through the
    driver.  Empty lines are dropped by default (``drop_empty_lines``
    passes through via ``kwargs``); non-UTF8 bytes surface as the usual
    parser dead-letter rows downstream, not a read failure, when
    ``encoding`` kwargs allow (default utf-8 with replacement is NOT
    applied — pass ``encoding`` explicitly for Latin-1 logs).
    """
    import ray.data as rd

    return rd.read_text(paths, **kwargs)


def read_ndjson(path, column_types: dict | None = None, **kwargs):
    """Distributed NDJSON (one JSON object per line) reader — re-ingests
    the envelopes ``parse_file_to_ndjson`` emits so downstream pipelines
    can consume a prior run's output as a source (reference README.md
    round-trip: parse -> NDJSON -> analytics).  Ray's JSON datasource
    splits by file and streams blocks; pass a directory for a sharded run.

    ``column_types`` pins Arrow types that JSON inference gets wrong —
    most importantly ``{"hash64": pa.uint64()}``: the engine's FNV hashes
    exceed 2^53, so type inference reads them as float64 and silently
    loses precision.  Unlisted fields are still inferred.
    """
    import pyarrow as pa
    import ray.data as rd

    if column_types:
        from pyarrow import json as pj

        kwargs.setdefault("parse_options", pj.ParseOptions(
            explicit_schema=pa.schema(list(column_types.items())),
            unexpected_field_behavior="infer"))
    return rd.read_json(path, **kwargs)
