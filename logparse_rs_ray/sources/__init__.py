"""Source/sink helpers: column-pruned parquet reads, small-result writers."""

from __future__ import annotations

import json
import os

__all__ = ["read_table", "write_json_report"]


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs):
    """Column-pruned parquet read of one test table.

    Always pass ``columns`` in pipelines — reading all columns for a
    two-column transform is wrong at 100 TB (prune at the read).
    """
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns, **kwargs)


def write_json_report(report: dict, path: str) -> None:
    """Small driver-side JSON report (reference pan_dynamic_parser.py:1301-1310).
    Timestamps must be injected by the caller — never datetime.now() here."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)
    os.replace(tmp, path)
