"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side at a given sf, compare row count, sorted
column names and order-insensitive value content.

Usage: python tools/check_queries.py [sf_dir] [query ...] [--json PATH]

``--json PATH`` also writes the full per-query result map (status, rows,
wall) — the committed CORRECTNESS_full_r{N} artifact (VERDICT r04 item 4).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes to strings for comparison; sort rows by all columns
    s = df.astype(str).sort_values(list(df.columns)).reset_index(drop=True)
    return s


def main():
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            results[name] = {"status": "error", "err": f"{type(e).__name__}: {e}"}
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(got),
                             "sec": round(dt, 1)}
            print(f"ok(rows-only) {name}: {len(got)} rows in {dt:.1f}s cols={list(got.columns)}")
            continue
        want = canon(con.execute(oracles[name]).fetchdf())
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"cols {list(got.columns)} != {list(want.columns)}")
        if len(got) != len(want):
            status.append(f"rows {len(got)} != {len(want)}")
        if not status and not got.equals(want):
            diff = (got != want)
            ndiff = int(diff.any(axis=1).sum())
            status.append(f"{ndiff} differing rows")
            bad = diff.any(axis=1)
            print(got[bad].head(3))
            print(want[bad].head(3))
        if status:
            failures.append(name)
            results[name] = {"status": "fail", "detail": "; ".join(status)}
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            results[name] = {"status": "oracle_match", "rows": len(got),
                             "sec": round(dt, 1)}
            print(f"OK   {name}: {len(got)} rows in {dt:.1f}s")
    ray.shutdown()
    if json_path:
        import json as _json

        with open(json_path, "w", encoding="utf-8") as fh:
            _json.dump({"sf_dir": sf_dir,
                        "n_queries": len(results),
                        "n_oracle_match": sum(1 for r in results.values()
                                              if r["status"] == "oracle_match"),
                        "n_rows_only": sum(1 for r in results.values()
                                           if r["status"] == "rows_only"),
                        "failures": failures,
                        "results": results}, fh, indent=1)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
