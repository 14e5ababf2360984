"""Benchmark harness: headline flagship pipeline + representative queries.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec = best of BENCH_REPEAT runs>,
   "unit": "sec", "queries": {name: sec, ...}, "sf": <sf>, "num_cpus": N,
   "docs": n, "docs_per_sec": r, "estimator": "min_of_N",
   "raw_runs_sec": [...], "ab_vs_r4": {interleaved fresh-process A/B vs
   the round-4 final commit — the artifact's own noise control}, ...}

Env:
  GRAFT_SF_DIR   test-table dir (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS CPU count for ray.init (default 32)
  WEBTEXT_ROWS   override synthetic webtext row count (default 6M x sf)

``--scaling`` runs the headline pipeline in two fresh processes
(num_cpus=8 then 32) on the SAME pre-materialized input and reports both
throughputs + scaling efficiency (the sandbox proxy for the N vs 4N-node
cluster criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE_ROOT = "/tmp/logparse_bench_cache"
# round-4 final commit (the tree VERDICT r04 graded): the in-artifact A/B
# baseline (VERDICT r04 item 8 — base the embedded A/B on the commit the
# previous VERDICT graded, not a late-round intermediate)
AB_BASE_REF = "19c1045"


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_from_dir(SF_DIR)
N_DOCS = int(os.environ.get("WEBTEXT_ROWS", str(int(6_000_000 * SF))))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q_customer_regions",
    "q_order_lineitem_join",
    "q_top_parts_by_quantity",
    "log_parse_props",
    "log_hourly_window",
    "log_sessionize",
    "doc_token_stats",
    "doc_exact_dedup",
    "dedup_minhash_pairs",
    "ann_topk_cosine",
    "doc_term_df",
    "doc_len_quantiles",
    "doc_curation",
    "doc_passage_dedup",
    "doc_tfidf_top",
    "doc_training_export",
    "log_streaming_window",
    "q_orders_running_total",
    "log_funnel",
    "q_full_outer_join",
    # round-4 additions (appended — the prior list stays comparable across
    # rounds)
    "doc_quality_classifier",
    "q_moving_avg_orders",
    "dedup_exact_priority",
    "dedup_simhash_survivors",
    "ann_topk_int8",
    "doc_lm_score",
    "q_median_price_by_priority",
    "doc_cdc_chunk_dedup",
    "doc_inverted_index",
    "doc_bigram_phrases",
    "doc_source_overlap",
    "embed_pca_top",
    "doc_bpe_encode_stats",
    "q7_nation_volume",
    "q10_returned_revenue",
    "q_rank_customers",
    "doc_soft_dedup_weights",
    "log_attribution_last_touch",
    "log_cohort_matrix",
    "doc_pmi_phrases",
    # round-5 additions
    "q5_local_supplier_volume",
    "doc_dup_ngram_stats",
    "log_watermark_late_events",
]


def materialize_webtext(n_docs: int) -> str:
    """Deterministic synthetic webtext parquet, cached across runs so both
    scaling levels read the identical input (and the page cache is warm)."""
    path = f"{CACHE_ROOT}/webtext_{n_docs}"
    marker = f"{path}/_SUCCESS"
    if os.path.exists(marker):
        return path
    from logparse_rs_ray.webtext import webtext_dataset

    shutil.rmtree(path, ignore_errors=True)
    # 64+ files so the read stage can saturate 32 CPUs (file count caps
    # read-task parallelism)
    webtext_dataset(n_docs).repartition(64).write_parquet(path)
    open(marker, "w").close()
    return path


def _parse_stage_stats(stats: str) -> dict:
    """Per-operator wall / remote-wall / UDF seconds out of ``ds.stats()``
    text (VERDICT r02 item 9: stage timings belong in the BENCH artifact,
    not prose)."""
    import re

    out: dict[str, dict] = {}
    cur = None
    unit = {"us": 1e-6, "ms": 1e-3, "s": 1.0}
    for line in stats.splitlines():
        m = re.match(r"Operator (\d+) (.+?): .*? in ([\d.]+)s", line)
        if m:
            cur = f"op{m.group(1)} {m.group(2)[:70]}"
            out[cur] = {"wall_s": float(m.group(3))}
            continue
        if cur is None:
            continue
        m2 = re.search(r"\* (Remote wall|UDF) time:.*?([\d.]+)(us|ms|s) total", line)
        if m2:
            key = "remote_wall_s" if m2.group(1) == "Remote wall" else "udf_s"
            out[cur][key] = round(float(m2.group(2)) * unit[m2.group(3)], 3)
    return out


def run_bench() -> dict:
    import ray

    # log_to_driver=False: worker prints must never interleave with the
    # single JSON line the driver parses from stdout
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from logparse_rs_ray.pipelines.flagship import run_flagship

    wt_path = materialize_webtext(N_DOCS)
    # warm-up (untimed): page cache + one full-pipeline pass over a slice so
    # every worker process pre-faults its allocator pools — this sandbox has
    # ~35us/page first-touch faults, which otherwise dominate the first task
    # on every fresh worker and poison the scaling comparison
    rd.read_parquet(wt_path).count()
    warm_dir = "/tmp/logparse_bench_warmup"
    shutil.rmtree(warm_dir, ignore_errors=True)
    run_flagship(rd.read_parquet(wt_path), warm_dir,
                 generated_at="1970-01-01T00:00:00Z")
    shutil.rmtree(warm_dir, ignore_errors=True)
    # read+scan-only baseline for the bottleneck hint, measured WARM (the
    # cold first pass above is dominated by worker startup + page faults and
    # would spuriously blame io).  count() on an untransformed parquet read
    # answers from file METADATA without touching data (ADVICE r02) — force
    # a real scan through a row-counting map_batches instead.
    import pyarrow as _pa

    t0 = time.perf_counter()
    rd.read_parquet(wt_path).map_batches(
        lambda b: _pa.table({"n": _pa.array([b.num_rows])}),
        batch_format="pyarrow", batch_size=None).sum("n")
    io_scan_s = time.perf_counter() - t0

    # default 5: single-iteration numbers are at the mercy of this sandbox's
    # multi-minute co-tenant slow windows (see BASELINE.md methodology note)
    repeat = int(os.environ.get("BENCH_REPEAT", "5"))
    times = []
    stage_sink: dict = {}
    for i in range(repeat):
        out_dir = "/tmp/logparse_bench_out"
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = rd.read_parquet(wt_path)
        # per-stage stats captured on the last iteration only (stats()
        # rendering is driver-side work that shouldn't pollute the median)
        run_flagship(ds, out_dir, generated_at="1970-01-01T00:00:00Z",
                     stats_sink=stage_sink if i == repeat - 1 else None)
        times.append(time.perf_counter() - t0)
    # best-of-N is the capability estimator under co-tenant noise (the same
    # rationale as --scaling's best-of-interleaved, accepted in VERDICT r01
    # item 10); the full wall_ms distribution + raw runs stay in the
    # artifact so the estimator is auditable
    headline = min(times)

    # per-iteration wall_ms stats block (reference README.md:241-247 parity)
    ms = sorted(t * 1000 for t in times)

    def pctl(p: float) -> float:
        i = min(len(ms) - 1, max(0, round(p / 100 * (len(ms) - 1))))
        return ms[i]

    stats = {
        "wall_ms": {
            "mean": round(sum(ms) / len(ms), 1),
            "median": round(pctl(50), 1),
            "p90": round(pctl(90), 1),
            "p99": round(pctl(99), 1),
            "min": round(ms[0], 1),
            "max": round(ms[-1], 1),
        },
        "iterations": repeat,
        "io_scan_s": round(io_scan_s, 3),
        # read+scan-only pass vs the full pipeline: if scanning the input
        # already costs most of the wall time, the pipeline is IO-bound
        "bottleneck_hint": ("io_scan" if io_scan_s > 0.5 * headline
                            else "compute(parse+enrich+write)"),
        "stages": _parse_stage_stats(stage_sink.get("flagship_stats", "")),
    }

    # domain-routed variant (north-star fan-out shape: per-domain writers,
    # salted Zipf-hot domains) — one timed pass
    if not os.environ.get("BENCH_SKIP_QUERIES"):
        from logparse_rs_ray.webtext import _HOT_DOMAINS

        dom_dir = "/tmp/logparse_bench_dom"
        shutil.rmtree(dom_dir, ignore_errors=True)
        t0 = time.perf_counter()
        run_flagship(rd.read_parquet(wt_path), dom_dir,
                     generated_at="1970-01-01T00:00:00Z",
                     route_key="domain", hot_keys=list(_HOT_DOMAINS))
        domain_routed = time.perf_counter() - t0
        shutil.rmtree(dom_dir, ignore_errors=True)
    else:
        domain_routed = None

    # in-artifact interleaved A/B vs the round-4 final commit (VERDICT r04
    # item 8): the driver's own bench JSON carries a same-window relative
    # number, so cross-round headline drift is attributable to the code,
    # not the hour this process happened to run in.  Skipped in child
    # processes (BENCH_SKIP_AB guards recursion) and when the ref is absent.
    ab_summary = None
    if not os.environ.get("BENCH_SKIP_QUERIES") and not os.environ.get("BENCH_SKIP_AB"):
        try:
            ab = run_ab(AB_BASE_REF, rounds=int(os.environ.get("AB_ROUNDS", "2")))
            ab_summary = {k: ab[k] for k in
                          ("current_best_sec", "base_best_sec",
                           "current_median_sec", "base_median_sec",
                           "speedup_vs_base", "raw_current_sec",
                           "raw_base_sec", "base_ref")}
        except Exception as e:  # a broken worktree must not sink the artifact
            ab_summary = {"error": str(e)[:200], "base_ref": AB_BASE_REF}

    import __ray_entry__ as entrymod

    qfns = entrymod.queries()
    qtimes: dict[str, float] = {}
    bench_queries = [] if os.environ.get("BENCH_SKIP_QUERIES") else BENCH_QUERIES
    for name in bench_queries:
        t0 = time.perf_counter()
        res = qfns[name](SF_DIR)
        # consume
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        qtimes[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    out = {
        "metric": "end-to-end parse->route->aggregate throughput (docs/sec)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF,
        "num_cpus": NUM_CPUS,
        "docs": N_DOCS,
        "docs_per_sec": round(N_DOCS / headline, 1),
        "estimator": f"min_of_{repeat}",
        "raw_runs_sec": [round(t, 3) for t in times],
        "stats": stats,
    }
    if ab_summary is not None:
        out["ab_vs_r4"] = ab_summary
    if domain_routed is not None:
        out["domain_routed_sec"] = round(domain_routed, 3)
        out["domain_routed_docs_per_sec"] = round(N_DOCS / domain_routed, 1)
    return out


def run_scaling() -> dict:
    """Same headline job at N and 4N CPUs in fresh processes.

    Levels default to 2 and 8 CPUs (override with SCALE_LO/SCALE_HI): both
    levels must sit below the single box's shared memory/disk-bandwidth
    ceiling for the proxy to mirror the real criterion — on a cluster, 4N
    NODES bring 4x bandwidth with them, but on one machine the disk and
    memory bus are shared, so CPU counts past ~16 measure bus saturation,
    not pipeline scalability (full curve in BASELINE.md).

    Uses 4x the default row count (unless WEBTEXT_ROWS overrides) so compute
    dominates the fixed per-execution overhead.

    ``SCALE_WEAK=1`` switches to WEAK scaling (the cluster-realistic shape:
    4N nodes arrive with 4x the data AND 4x the disks/memory buses): the hi
    level processes ``hi/lo`` times the lo level's docs, and efficiency is
    ``t_lo / t_hi`` (1.0 = perfect).  Each child also reports its warm
    read+scan-only wall (``io_scan_s``) — the no-UDF hardware ceiling of the
    box — so the output decomposes pipeline efficiency against the
    shared-memory-bus ceiling a single machine imposes on the strong-scaling
    proxy (BASELINE.md round-5 diagnosis).
    """
    n_docs = int(os.environ.get("WEBTEXT_ROWS", str(8 * N_DOCS)))
    lo_cpus = int(os.environ.get("SCALE_LO", "2"))
    hi_cpus = int(os.environ.get("SCALE_HI", str(4 * lo_cpus)))
    weak = os.environ.get("SCALE_WEAK") == "1"
    ratio = hi_cpus / lo_cpus
    hi_docs = int(n_docs * ratio) if weak else n_docs

    def run_at(ncpu: int, docs: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
                   WEBTEXT_ROWS=str(docs), BENCH_SKIP_QUERIES="1",
                   BENCH_SKIP_AB="1",
                   BENCH_REPEAT=os.environ.get("BENCH_REPEAT", "3"))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # the first child materializes the cached input; later children reuse it
    # (identical bytes both levels); each child warms its own worker pool
    # and the page cache with an untimed full pass before its timed run.
    # The sandbox shows sustained multi-minute slow windows (other tenants),
    # so the levels are INTERLEAVED and the best run per level is kept —
    # a sustained slowdown then hits both levels instead of biasing one.
    rounds = int(os.environ.get("SCALE_ROUNDS", "2"))
    lo_runs, hi_runs = [], []
    for _ in range(rounds):
        lo_runs.append(run_at(lo_cpus, n_docs))
        hi_runs.append(run_at(hi_cpus, hi_docs))
    lo = min(lo_runs, key=lambda r: r["value"])
    hi = min(hi_runs, key=lambda r: r["value"])
    if weak:
        eff = lo["value"] / hi["value"]
    else:
        eff = (lo["value"] / hi["value"]) / ratio
    out = {
        "metric": (f"{'weak' if weak else 'strong'} scaling efficiency "
                   f"({lo_cpus} -> {hi_cpus} CPUs"
                   + (", input scaled with CPUs)" if weak else ", same input)")),
        f"sec_{lo_cpus}cpu": lo["value"],
        f"sec_{hi_cpus}cpu": hi["value"],
        f"docs_per_sec_{lo_cpus}cpu": lo["docs_per_sec"],
        f"docs_per_sec_{hi_cpus}cpu": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        # ALL interleaved child runs, so the best-of-two estimator is
        # auditable (VERDICT r01 item 10)
        "raw_runs_sec": {f"{lo_cpus}cpu": [r["value"] for r in lo_runs],
                         f"{hi_cpus}cpu": [r["value"] for r in hi_runs]},
        "docs": n_docs,
        "sf": SF,
    }
    if weak:
        out[f"docs_{lo_cpus}cpu"] = n_docs
        out[f"docs_{hi_cpus}cpu"] = hi_docs
    # decomposition vs the no-UDF scan ceiling: the pure parquet read+scan
    # (zero Python, zero write) measures the box's shared memory-bus limit;
    # pipeline efficiency is graded against that ceiling, not against the
    # unreachable ideal of a single machine acting like 4x the machines
    scan_lo = min((r["stats"]["io_scan_s"] for r in lo_runs), default=None)
    scan_hi = min((r["stats"]["io_scan_s"] for r in hi_runs), default=None)
    if scan_lo and scan_hi and not weak:
        scan_eff = (scan_lo / scan_hi) / ratio
        out["io_scan_s"] = {f"{lo_cpus}cpu": scan_lo, f"{hi_cpus}cpu": scan_hi}
        out["scan_ceiling_efficiency"] = round(scan_eff, 3)
        out["efficiency_vs_scan_ceiling"] = round(eff / scan_eff, 3)
    return out


def run_ab(base_ref: str, rounds: int | None = None) -> dict:
    """Same-input A/B against a named git ref: fresh child processes for
    the CURRENT tree and a worktree of ``base_ref`` ALTERNATE within one
    invocation over the same cached input (page cache warm for both, the
    sandbox's multi-minute co-tenant slow windows hit both variants instead
    of biasing one).  Reports per-variant medians so cross-round headline
    drift is attributable to the code, not the hour (VERDICT r02 item 8).
    """
    here = os.path.dirname(os.path.abspath(__file__))
    # keyed by ref: a cached worktree from an earlier --ab against a
    # DIFFERENT ref must never be silently reused
    worktree = f"/tmp/logparse_ab_base_{base_ref.replace('/', '_')}"
    if not os.path.exists(f"{worktree}/bench.py"):
        shutil.rmtree(worktree, ignore_errors=True)
        subprocess.run(["git", "-C", here, "worktree", "add", "--force",
                        worktree, base_ref], check=True, capture_output=True)

    def run_one(bench_path: str) -> float:
        env = dict(os.environ, BENCH_SKIP_QUERIES="1", BENCH_SKIP_AB="1",
                   BENCH_REPEAT="1", GRAFT_SF_DIR=SF_DIR,
                   RAY_GRAFT_CPUS=str(NUM_CPUS), WEBTEXT_ROWS=str(N_DOCS))
        out = subprocess.run([sys.executable, bench_path], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])["value"]

    if rounds is None:
        rounds = int(os.environ.get("AB_ROUNDS", "3"))
    cur: list[float] = []
    base: list[float] = []
    for _ in range(rounds):
        cur.append(run_one(os.path.join(here, "bench.py")))
        base.append(run_one(os.path.join(worktree, "bench.py")))

    def med(xs: list[float]) -> float:
        return sorted(xs)[len(xs) // 2]

    return {
        "metric": f"A/B headline: current tree vs {base_ref} "
                  "(interleaved fresh processes, same cached input)",
        "current_median_sec": med(cur),
        "base_median_sec": med(base),
        # best-of is the capability estimator under interleaved co-tenant
        # noise (same rationale as --scaling); medians + raws stay recorded
        "current_best_sec": min(cur),
        "base_best_sec": min(base),
        "speedup_vs_base": round(min(base) / min(cur), 3),
        "raw_current_sec": cur,
        "raw_base_sec": base,
        "base_ref": base_ref,
        "docs": N_DOCS,
        "num_cpus": NUM_CPUS,
        "sf": SF,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--ab" in sys.argv:
        ref = sys.argv[sys.argv.index("--ab") + 1]
        print(json.dumps(run_ab(ref)))
    else:
        print(json.dumps(run_bench()))
