"""Head-to-head single-core comparison against the reference's runnable
engine (the pure-Python fallback shim — the Rust extension isn't built in
this environment), on the SAME realistic PAN line and the reference's own
production schema.  Measurement only; no reference code is imported into
the engine.

Usage: python tools/bench_reference.py [n_lines]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, "/root/repo")

LINE = (
    "1,2012/10/30 09:46:12,01606001116,TRAFFIC,start,1,2012/04/10 04:39:58,"
    "192.168.0.2,204.232.231.46,0.0.0.0,0.0.0.0,rule1,crusher,,web-browsing,"
    "vsys1,trust,untrust,ethernet1/2,ethernet1/1,forwardAll,2012/04/10 04:39:59,"
    "11449,1,59324,80,0,0,0x200000,tcp,allow,78,78,0,1,2012/04/10 04:39:59,0,"
    "any,0,0,0x0,192.168.0.0-192.168.255.255,United States,0,1,0"
)
SCHEMA = "/root/reference/examples/schema/schema.json"


def bench_reference(n: int) -> float:
    os.environ["LOGPARSE_RS_DISABLE_RUST"] = "1"
    spec = importlib.util.spec_from_file_location(
        "rust_accel", "/root/reference/bindings/python/python/logparse_rs/rust_accel.py")
    ra = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ra)
    ra.load_schema(SCHEMA)
    ra.parse_kv_enriched(LINE)  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        ra.parse_kv_enriched(LINE)
    return n / (time.perf_counter() - t0)


def bench_ours(n: int) -> float:
    import pyarrow as pa

    from logparse_rs_ray.core.schema import load_schema
    from logparse_rs_ray.stages.parse import WebtextParser

    p = WebtextParser(load_schema(SCHEMA), strip_syslog_prefix=False)
    batch = pa.table({"text": [LINE] * n})
    p(batch)  # warm
    t0 = time.perf_counter()
    p(batch)
    return n / (time.perf_counter() - t0)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    ref = bench_reference(min(n, 20000))
    ours = bench_ours(n)
    import json

    print(json.dumps({
        "reference_python_fallback_lines_per_sec": round(ref),
        "ours_single_core_lines_per_sec": round(ours),
        "speedup_single_core": round(ours / ref, 2),
    }))
