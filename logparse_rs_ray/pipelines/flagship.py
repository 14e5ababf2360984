"""Flagship pipeline: webtext -> parse -> enrich -> route -> aggregate.

The Ray-Data-native re-expression of the reference's end-to-end flows
(SURVEY.md §3.1-§3.4): schema-driven parse with skip-to-dead-letter policy,
deterministic anonymization with a derived integrity table, broadcast lookup
enrichment, hive-partitioned routed sinks, and one-pass multi-dimension
aggregates producing the JSON report.

Execution shape (designed so the INPUT is read and parsed exactly ONCE):

1. pass 1 (full data, streaming): read -> parse (vectorized map_batches) ->
   enrich+anonymize (+ per-batch integrity pair rows appended with
   ``log_type="_integrity"``) -> add sink -> hive-partitioned parquet write.
2. integrity export: read back ONLY ``sink=_integrity`` (3 columns) ->
   groupby(field, original).first() -> parquet.  Tiny.
3. report: read back the routed sinks (already parsed, column-pruned) ->
   one ``multi_count`` pass -> small collected result -> report JSON.

Ray Data has no cross-consumer common-subexpression reuse, so any design
that consumes the parse lineage from k places re-parses k times; writing
the routed output first and aggregating from the (much smaller, columnar)
sinks is the scalable shape.
"""

from __future__ import annotations

import pyarrow as pa

from ..core.anonymize import AnonConfig, load_anon_config
from ..core.schema import CompiledSchema
from ..sources import write_json_report
from ..stages.aggregate import multi_count
from ..stages.enrich import Enricher
from ..stages.parse import WebtextParser
from ..stages.route import DEADLETTER, add_sink_column
from ..webtext import LANG_REGION, default_anon_config_json, pan_schema

__all__ = [
    "parse_webtext",
    "enrich_webtext",
    "flagship_report_from_sinks",
    "run_flagship",
    "export_integrity",
    "REPORT_DIMS",
]

INTEGRITY = Enricher.INTEGRITY_TYPE
SIDE_BUCKETS = 8  # FLOOR for the side-sink bucket count (see auto_side_buckets)


def auto_side_buckets() -> int:
    """Side-sink bucket count, scaled to the cluster (VERDICT r04 item 1):
    consolidation runs ONE merge task per bucket and its work (dedup/merge
    of per-block partial rows whose keys are near-unique per doc) is
    corpus-proportional, so a fixed count pins the phase's parallelism.
    cpus/4 balances merge parallelism against the hive fan-out cost of the
    routed write (each write task opens one file per bucket dir; measured
    round-5: nb=16 at 32 CPUs cost +1.5 s of write for ~0 merge gain on
    this box, so the knob stays conservative — consolidation also splits
    integrity|report into separate tasks, doubling parallelism per
    bucket).  Capped at 32 — past that, shard by run partition
    (state/checkpoint), which multiplies merge parallelism without
    widening any single write.
    """
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            if cpus:
                return max(SIDE_BUCKETS, min(32, cpus // 4))
    except Exception:
        pass
    return SIDE_BUCKETS


REPORT_DIMS = {
    "by_log_type": "log_type",
    "by_action": "action",
    "top_sources": "src_ip",
    "top_applications": "application",
    "by_region": "region",
    "top_domains": "domain",
    "by_severity": "severity",
    "error_reasons": "_error_key",
}

TOPK_DIMS = {"top_sources", "top_applications", "top_domains"}


def parse_webtext(ds, schema: CompiledSchema | None = None, **map_kwargs):
    """webtext Dataset -> parsed union-layout Dataset (no anonymization)."""
    schema = schema or pan_schema()
    return ds.map_batches(WebtextParser(schema), batch_format="pyarrow", batch_size=None, **map_kwargs)


def enrich_webtext(parsed_ds, anon_cfg: AnonConfig | None = None, *,
                   emit_integrity_rows: bool = False,
                   integrity_buckets: int = SIDE_BUCKETS, **map_kwargs):
    if anon_cfg is None:
        anon_cfg = load_anon_config(default_anon_config_json())
    return parsed_ds.map_batches(
        Enricher(anon_cfg, LANG_REGION, emit_integrity_rows=emit_integrity_rows,
                 integrity_buckets=integrity_buckets),
        batch_format="pyarrow", batch_size=None, **map_kwargs,
    )


def _report_prep(batch: pa.Table) -> pa.Table:
    """Pre-aggregate projection: keep only report key columns; dimension keys
    are nulled where they don't apply (dead-letter rows only count error
    reasons; clean rows count everything else)."""
    import pyarrow.compute as pc

    err = batch["_error"].combine_chunks() if isinstance(batch["_error"], pa.ChunkedArray) else batch["_error"]
    is_dead = pc.not_equal(err, "")
    cols: dict[str, pa.Array] = {}
    for dim, key in REPORT_DIMS.items():
        if key == "_error_key":
            cols[key] = pc.if_else(is_dead, err, pa.nulls(batch.num_rows, pa.string()))
        elif key in batch.column_names:
            col = batch[key]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[key] = pc.if_else(is_dead, pa.nulls(batch.num_rows, pa.string()), col.cast(pa.string()))
    return pa.table(cols)


REPORT_SINK = "_report"


def append_report_rows(batch: pa.Table, *,
                       n_buckets: int = SIDE_BUCKETS) -> pa.Table:
    """Append this block's report partial counts as side rows
    (``sink="_reportNN"``, ``_rep_dim/_rep_key/_rep_count`` set, data
    columns null) — the same zero-extra-pass trick as the integrity pairs.

    NN = FNV(dim ++ key) % n_buckets, so the hive-partitioned write
    hash-partitions the partials on disk and the report merge becomes one
    independent task per bucket (a filesystem shuffle — no object-store
    all-to-all, and per-bucket results are globally correct because buckets
    partition the key space).  Callers pass ``auto_side_buckets()`` so the
    merge parallelism follows the cluster."""
    import numpy as np
    import pyarrow.compute as pc

    from ..core.fnv import fnv1a64_arrow
    from ..stages.aggregate import multi_count_fn

    # integrity pair rows are side data, not log records — exclude them
    lt = batch["log_type"]
    if isinstance(lt, pa.ChunkedArray):
        lt = lt.combine_chunks()
    data_rows = batch.filter(
        pc.fill_null(pc.invert(pc.starts_with(lt, INTEGRITY)), True)
    )
    tall = multi_count_fn(dict(REPORT_DIMS))(_report_prep(data_rows))
    n = batch.num_rows
    batch = batch.append_column("_rep_dim", pa.nulls(n, pa.string()))
    batch = batch.append_column("_rep_key", pa.nulls(n, pa.string()))
    batch = batch.append_column("_rep_count", pa.nulls(n, pa.int64()))
    if tall.num_rows == 0:
        return batch
    m = tall.num_rows
    joined = pc.binary_join_element_wise(tall["dim"].combine_chunks(),
                                         tall["key"].combine_chunks(), "\x00")
    bucket = (fnv1a64_arrow(joined) % np.uint64(n_buckets)).astype(np.int64)
    pool = np.array([f"{REPORT_SINK}{b:02d}" for b in range(n_buckets)],
                    dtype=object)
    sink_names = pool[bucket]
    cols: dict[str, pa.Array] = {}
    for name in batch.column_names:
        f = batch.schema.field(name)
        if name == "sink":
            cols[name] = pa.array(sink_names, type=pa.string())
        elif name == "_error":
            cols[name] = pa.array([""] * m, type=pa.string())
        elif name == "salt":  # domain-routed runs: side rows go to salt=0
            cols[name] = pa.array(np.zeros(m, dtype=np.int32))
        elif name == "_rep_dim":
            cols[name] = tall["dim"].combine_chunks()
        elif name == "_rep_key":
            cols[name] = tall["key"].combine_chunks()
        elif name == "_rep_count":
            cols[name] = tall["count"].combine_chunks()
        else:
            cols[name] = pa.nulls(m, type=f.type)
    return pa.concat_tables([batch, pa.table(cols).cast(batch.schema)])


def read_sinks_for_report(out_dir: str):
    """Column-pruned readback of the routed sinks for the report pass —
    skips the `_integrity` directory entirely and reads ONLY the report key
    columns (never extracted_text/raw_excerpt, which dominate the bytes)."""
    import glob

    import ray.data as rd

    # partition-dir pruning: list the files of every DATA sink, skipping the
    # bucketed _integrityNN/_reportNN side sinks (this Ray version can't
    # bind a read filter to a hive partition column)
    side = (f"sink={INTEGRITY}", f"sink={REPORT_SINK}")
    # recursive: domain-routed runs nest salt=N sub-partitions under sinks
    files = [f for d in glob.glob(f"{out_dir}/sinks/sink=*")
             if not d.split("/")[-1].startswith(side)
             for f in glob.glob(f"{d}/**/*.parquet", recursive=True)]
    cols = sorted({v for v in REPORT_DIMS.values() if v != "_error_key"} | {"_error"})
    return rd.read_parquet(files, columns=cols)


def _bucket_dirs(out_dir: str, prefix: str) -> list[str]:
    import glob

    return sorted(glob.glob(f"{out_dir}/sinks/sink={prefix}[0-9][0-9]"))


def consolidate_sinks(sink_roots: list[str], integrity_dest: str, *,
                      k: int = 10) -> dict:
    """Integrity dedup + report merge over the bucketed side sinks, in ONE
    Ray execution: one task per bucket handles both that bucket's
    integrity files (dedup -> idempotent per-bucket parquet under
    ``integrity_dest``) and its report files (merged counts -> per-dim
    totals + top-k candidate rows).

    Buckets partition their key spaces, so per-bucket results are globally
    exact: the global top-k is the top-k of the union of per-bucket
    top-k's, and per-bucket integrity tables are disjoint.  Data reaches
    the tasks through the bucket directories the routed write already
    produced — a FILESYSTEM shuffle.  This was measured (VERDICT r04
    item 1 diagnosis, BASELINE.md round-5) against the object-store
    alternative: a ``hash_merge`` exchange of the same partial rows ran
    4-17x slower (Ray's hash shuffle moves these ~0.5 GB of compact rows
    at ~30 MB/s on this box), so the dir-hash co-location stays.  The
    anonymized-value/report key sets are near-unique per doc — the merge
    is corpus-proportional work, so the bucket count (the merge
    parallelism) scales with the cluster via ``auto_side_buckets``.
    Bucket ids are discovered from the directories, but every root
    consolidated together must share one bucket count (keys partition by
    hash mod n) — ``run_flagship`` resolves it once per run and the
    checkpointed flow pins it in ``side_buckets.json``.  ``sink_roots``
    may span multiple partition runs (checkpointed executions).
    """
    import glob as _glob
    import json as _json
    import os as _os

    import ray.data as rd

    _os.makedirs(integrity_dest, exist_ok=True)
    bucket_ids: set[int] = set()
    for root in sink_roots:
        for prefix in (INTEGRITY, REPORT_SINK):
            for d in _glob.glob(f"{root}/sink={prefix}[0-9][0-9]"):
                bucket_ids.add(int(d[-2:]))
    # ONE item per (bucket, kind): the integrity dedup and the report merge
    # of a bucket are independent, so splitting them doubles consolidation
    # parallelism at zero extra file reads (round-5 diagnosis)
    items = []
    for b in sorted(bucket_ids):
        idirs = [d for root in sink_roots
                 for d in sorted(_glob.glob(f"{root}/sink={INTEGRITY}{b:02d}"))]
        rdirs = [d for root in sink_roots
                 for d in sorted(_glob.glob(f"{root}/sink={REPORT_SINK}{b:02d}"))]
        if idirs:
            items.append({"bucket": b, "integrity_dirs": _json.dumps(idirs),
                          "report_dirs": _json.dumps([])})
        if rdirs:
            items.append({"bucket": b, "integrity_dirs": _json.dumps([]),
                          "report_dirs": _json.dumps(rdirs)})

    def merge_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from .. import tune_worker_threads

        tune_worker_threads()

        def files(dirs):
            # recursive: salted runs nest salt=N sub-dirs under each bucket
            return [f for d in dirs
                    for f in sorted(_glob.glob(f"{d}/**/*.parquet", recursive=True))]

        def read_cols(flist, columns, names):
            # per-file pq reads skip pyarrow.dataset's per-fragment schema
            # unification — these files all share the routed write's schema,
            # and the file count grows with upstream write parallelism
            parts = [pq.ParquetFile(f).read(columns=columns) for f in flist]
            return pa.concat_tables(parts).rename_columns(names)

        outs = []
        for row in batch.to_pylist():
            b = row["bucket"]
            ifiles = files(_json.loads(row["integrity_dirs"]))
            if ifiles:
                final = f"{integrity_dest}/{INTEGRITY}{b:02d}.parquet"
                if not _os.path.exists(final):  # resumable per-bucket output
                    t = read_cols(ifiles,
                                  ["_pair_field", "_pair_original",
                                   "_pair_replacement"],
                                  ["field", "original", "replacement"])
                    g = t.group_by(["field", "original"]).aggregate(
                        [("replacement", "min")]
                    ).rename_columns(["field", "original", "replacement"])
                    tmp = final + ".tmp"
                    pq.write_table(g, tmp)
                    _os.replace(tmp, final)  # atomic publish
            rfiles = files(_json.loads(row["report_dirs"]))
            if rfiles:
                t = read_cols(rfiles, ["_rep_dim", "_rep_key", "_rep_count"],
                              ["dim", "key", "count"])
                g = t.group_by(["dim", "key"]).aggregate([("count", "sum")])
                g = g.rename_columns(["dim", "key", "count"])
                keep = []
                for dim in REPORT_DIMS:
                    sub = g.filter(pc.equal(g["dim"], dim))
                    total = int(pc.sum(sub["count"]).as_py() or 0)
                    order = pc.sort_indices(
                        sub, sort_keys=[("count", "descending"), ("key", "ascending")]
                    )
                    limit = k if dim in TOPK_DIMS else len(order)
                    keep.append(sub.take(order.slice(0, limit)))
                    keep.append(pa.table({
                        "dim": pa.array([f"__total__{dim}"]),
                        "key": pa.array([""]),
                        "count": pa.array([total], type=pa.int64()),
                    }))
                outs.append(pa.concat_tables(keep))
        if not outs:
            return pa.table({"dim": pa.array([], type=pa.string()),
                             "key": pa.array([], type=pa.string()),
                             "count": pa.array([], type=pa.int64())})
        return pa.concat_tables(outs)

    if items:
        # one block per bucket item => one merge task per bucket dir, with
        # the standard batch_size=None whole-block contract (ADVICE r01:
        # batch_size=1 was an undocumented carve-out of the repo hard rule)
        merged_df = rd.from_items(items).repartition(len(items)).map_batches(
            merge_bucket, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        merged = pa.Table.from_pandas(merged_df, preserve_index=False)
    else:
        merged = pa.table({"dim": pa.array([], type=pa.string()),
                           "key": pa.array([], type=pa.string()),
                           "count": pa.array([], type=pa.int64())})
    if merged.num_rows == 0:
        merged = pa.table({"dim": pa.array([], type=pa.string()),
                           "key": pa.array([], type=pa.string()),
                           "count": pa.array([], type=pa.int64())})
    import pyarrow.compute as pc

    merged = merged.set_column(2, "count", merged["count"].cast(pa.int64()))
    totals: dict[str, int] = {}
    is_total = pc.starts_with(merged["dim"], "__total__")
    total_rows = merged.filter(is_total)
    for d, c in zip(total_rows["dim"].to_pylist(), total_rows["count"].to_pylist()):
        dim = d[len("__total__"):]
        totals[dim] = totals.get(dim, 0) + int(c)
    report = _assemble_report(merged.filter(pc.invert(is_total)), k=k)
    report["total_logs"] = totals.get("by_log_type", 0)
    report["errors"] = totals.get("error_reasons", 0)
    return report


def report_from_partials(out_dir: str, *, k: int = 10) -> dict:
    """Back-compat wrapper: report-only consolidation of one run's sinks."""
    import tempfile

    return consolidate_sinks([f"{out_dir}/sinks"],
                             tempfile.mkdtemp(prefix="integ_unused_"), k=k)


def _trim_tall_topk(k: int):
    """Per-block per-dim top-k prefilter over the (dim, key, count) tall
    table (VERDICT r03 item 3).  Valid as a prefilter whenever blocks hold
    complete (dim, key) groups — true after either merge mode (tree: one
    block; shuffle: disjoint hash partitions) — so the global top-k always
    survives.  Non-top-k dims (log_type/action/region/severity/error
    reasons) have bounded key sets and pass through whole; the heavy
    key-proportional dims (per-source, per-domain) never reach the driver
    with more than ``blocks x k`` rows."""
    import pyarrow.compute as pc

    topk = pa.array(sorted(TOPK_DIMS), type=pa.string())

    def trim(b: pa.Table) -> pa.Table:
        heavy_mask = pc.is_in(b["dim"], value_set=topk)
        out = [b.filter(pc.invert(heavy_mask))]
        heavy = b.filter(heavy_mask)
        for dim in TOPK_DIMS:
            sub = heavy.filter(pc.equal(heavy["dim"], dim))
            if sub.num_rows > k:
                order = pc.sort_indices(
                    sub, sort_keys=[("count", "descending"), ("key", "ascending")])
                sub = sub.take(order.slice(0, k))
            out.append(sub)
        return pa.concat_tables(out)

    return trim


def flagship_report_from_sinks(sinks_ds, *, k: int = 10) -> dict:
    """One multi_count pass over the routed sinks -> report dict.  The
    driver only ever collects a dims-bounded table: top-k dims are pruned
    per block before ``to_pandas`` (key-proportional dims like per-source
    counts can be millions of rows at corpus scale)."""
    prepped = sinks_ds.map_batches(_report_prep, batch_format="pyarrow", batch_size=None)
    tall = multi_count(prepped, {d: key for d, key in REPORT_DIMS.items()})
    tall = tall.map_batches(_trim_tall_topk(k), batch_format="pyarrow",
                            batch_size=None)
    import pyarrow as _pa

    return _assemble_report(_pa.Table.from_pandas(tall.to_pandas(), preserve_index=False), k=k)


def _assemble_report(tall: pa.Table, *, k: int = 10) -> dict:
    """(dim, key, count) table -> report dict.  All sorting/top-k happens in
    multi-threaded Arrow kernels — the heavy dims (per-source counts) can be
    millions of rows and a per-dim pandas sort is 20x slower."""
    import pyarrow.compute as pc

    report: dict = {}
    total = 0
    errors = 0
    for dim in REPORT_DIMS:
        sub = tall.filter(pc.equal(tall["dim"], dim)).select(["key", "count"])
        dim_sum = int(pc.sum(sub["count"]).as_py() or 0)
        if dim == "by_log_type":
            total = dim_sum
        if dim == "error_reasons":
            errors = dim_sum
        order = pc.sort_indices(sub, sort_keys=[("count", "descending"),
                                                ("key", "ascending")])
        if dim in TOPK_DIMS:
            order = order.slice(0, k)
        picked = sub.take(order)
        report[dim] = [
            {"key": key, "count": cnt}
            for key, cnt in zip(picked["key"].to_pylist(), picked["count"].to_pylist())
        ]
    report["total_logs"] = total
    report["errors"] = errors
    return report


def export_integrity(out_dir: str):
    """Back-compat wrapper: integrity-only consolidation of one run's sinks
    (see consolidate_sinks for the mechanics)."""
    consolidate_sinks([f"{out_dir}/sinks"], f"{out_dir}/integrity")


def integrity_status(out_dir: str) -> dict:
    """{enabled, fields, pairs} over the exported integrity table —
    reference anonymizer status (bindings lib.rs:302-317)."""
    import glob as _glob

    import pyarrow.dataset as pads

    files = sorted(_glob.glob(f"{out_dir}/integrity/*.parquet"))
    if not files:
        return {"enabled": False, "fields": 0, "pairs": 0}
    t = pads.dataset(files).to_table(columns=["field"])
    import pyarrow.compute as pc

    return {
        "enabled": True,
        "fields": len(pc.unique(t["field"])),
        "pairs": t.num_rows,
    }


def export_integrity_json(out_dir: str, json_path: str | None = None) -> str:
    """Pretty sorted-keys JSON export with the reference's shape
    ``{field: {original: replacement}}`` (rust_accel.py:391-414,
    lib.rs:319-335).  Driver-side: the integrity table is an audit
    artifact, small relative to the corpus."""
    import glob as _glob
    import json as _json

    import pyarrow.dataset as pads

    files = sorted(_glob.glob(f"{out_dir}/integrity/*.parquet"))
    table: dict[str, dict[str, str]] = {}
    if files:
        t = pads.dataset(files).to_table()
        for f, o, r in zip(t["field"].to_pylist(), t["original"].to_pylist(),
                           t["replacement"].to_pylist()):
            table.setdefault(f, {})[o] = r
    json_path = json_path or f"{out_dir}/integrity_table.json"
    tmp = json_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        _json.dump(table, fh, indent=2, sort_keys=True)
    import os as _os

    _os.replace(tmp, json_path)
    return json_path


def run_flagship(
    webtext_ds,
    out_dir: str,
    *,
    schema: CompiledSchema | None = None,
    anon_config: dict | str | None = None,
    generated_at: str = "1970-01-01T00:00:00Z",
    write_integrity: bool = True,
    k: int = 10,
    map_kwargs: dict | None = None,
    route_key: str = "log_type",
    hot_keys: list[str] | None = None,
    num_salts: int = 16,
    stats_sink: dict | None = None,
) -> dict:
    """Full pipeline; returns the report dict (also written under out_dir).

    ``generated_at`` is injected, never datetime.now() — reproducibility
    (SURVEY.md §7.4 risk 6).

    ``route_key`` selects the fan-out key: ``"log_type"`` reproduces the
    reference's per-type sinks; ``"domain"`` is the north star's per-domain
    writer fan-out.  ``hot_keys`` (e.g. ``webtext._HOT_DOMAINS``) adds the
    ``salt`` sub-partition for Zipf-hot keys so no single writer or reader
    ever owns an entire hot directory.
    """
    schema = schema or pan_schema()
    cfg = load_anon_config(anon_config if anon_config is not None else default_anon_config_json())
    mk = map_kwargs or {}

    # a rerun must not append into stale outputs (write_parquet adds files
    # to an existing directory) — for resumable runs use state/checkpoint
    import shutil

    shutil.rmtree(f"{out_dir}/sinks", ignore_errors=True)
    shutil.rmtree(f"{out_dir}/integrity", ignore_errors=True)

    n_buckets = auto_side_buckets()
    parsed = parse_webtext(webtext_ds, schema, **mk)
    enriched = enrich_webtext(parsed, cfg, emit_integrity_rows=write_integrity,
                              integrity_buckets=n_buckets, **mk)

    def route(b: pa.Table) -> pa.Table:
        return add_sink_column(b, key_col=route_key, hot_keys=hot_keys,
                               num_salts=num_salts)

    import functools

    routed = enriched.map_batches(route, batch_format="pyarrow", batch_size=None, **mk)
    routed = routed.map_batches(
        functools.partial(append_report_rows, n_buckets=n_buckets),
        batch_format="pyarrow", batch_size=None, **mk)
    partition_cols = ["sink", "salt"] if hot_keys else ["sink"]
    routed.write_parquet(f"{out_dir}/sinks", partition_cols=partition_cols)
    if stats_sink is not None:
        # executed per-operator stats of the fused write plan (bench.py
        # parses per-stage wall/UDF times into BENCH JSON)
        stats_sink["flagship_stats"] = routed.stats()

    # integrity dedup + report merge share one per-bucket consolidation
    # execution (the integrity dirs are simply absent when write_integrity
    # is off)
    report = consolidate_sinks([f"{out_dir}/sinks"], f"{out_dir}/integrity", k=k)
    report["generated_at"] = generated_at
    report["schema_sha256"] = schema.schema_sha256
    report["deadletter_sink"] = DEADLETTER
    write_json_report(report, f"{out_dir}/report.json")
    return report
