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
                   emit_integrity_rows: bool = False, **map_kwargs):
    if anon_cfg is None:
        anon_cfg = load_anon_config(default_anon_config_json())
    return parsed_ds.map_batches(
        Enricher(anon_cfg, LANG_REGION, emit_integrity_rows=emit_integrity_rows),
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


def append_report_rows(batch: pa.Table) -> pa.Table:
    """Append this block's report partial counts as side rows
    (``sink="_report"``, ``_rep_dim/_rep_key/_rep_count`` set, data columns
    null) — the same zero-extra-pass trick as the integrity pairs: the
    report then reads ONLY the tiny ``sink=_report`` directory instead of
    re-scanning the routed data."""
    import pyarrow.compute as pc

    from ..stages.aggregate import multi_count_fn

    # integrity pair rows are side data, not log records — exclude them
    lt = batch["log_type"]
    if isinstance(lt, pa.ChunkedArray):
        lt = lt.combine_chunks()
    data_rows = batch.filter(
        pc.fill_null(pc.not_equal(lt, INTEGRITY), True)
    )
    tall = multi_count_fn(dict(REPORT_DIMS))(_report_prep(data_rows))
    n = batch.num_rows
    batch = batch.append_column("_rep_dim", pa.nulls(n, pa.string()))
    batch = batch.append_column("_rep_key", pa.nulls(n, pa.string()))
    batch = batch.append_column("_rep_count", pa.nulls(n, pa.int64()))
    if tall.num_rows == 0:
        return batch
    m = tall.num_rows
    cols: dict[str, pa.Array] = {}
    for name in batch.column_names:
        f = batch.schema.field(name)
        if name == "sink":
            cols[name] = pa.array([REPORT_SINK] * m, type=pa.string())
        elif name == "_error":
            cols[name] = pa.array([""] * m, type=pa.string())
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

    # partition-dir pruning: list the files of every sink except _integrity
    # (this Ray version can't bind a read filter to a hive partition column)
    files = [f for d in glob.glob(f"{out_dir}/sinks/sink=*")
             if not d.endswith(f"sink={INTEGRITY}")
             for f in glob.glob(f"{d}/*.parquet")]
    cols = sorted({v for v in REPORT_DIMS.values() if v != "_error_key"} | {"_error"})
    return rd.read_parquet(files, columns=cols)


def report_from_partials(out_dir: str, *, k: int = 10) -> dict:
    """Merge the ``sink=_report`` partial rows -> report dict.  Reads a few
    MB instead of re-scanning the routed data."""
    import ray.data as rd

    from ..stages.aggregate import tree_merge

    parts = rd.read_parquet(f"{out_dir}/sinks/sink={REPORT_SINK}",
                            columns=["_rep_dim", "_rep_key", "_rep_count"])

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["dim", "key", "count"])

    tall = tree_merge(parts.map_batches(rename, batch_format="pyarrow", batch_size=None),
                      ["dim", "key"], [("count", "sum")], fanin=8)
    return _assemble_report(tall.to_pandas(), k=k)


def flagship_report_from_sinks(sinks_ds, *, k: int = 10) -> dict:
    """One multi_count pass over the routed sinks -> report dict."""
    prepped = sinks_ds.map_batches(_report_prep, batch_format="pyarrow", batch_size=None)
    tall = multi_count(prepped, {d: key for d, key in REPORT_DIMS.items()})
    return _assemble_report(tall.to_pandas(), k=k)


def _assemble_report(df, *, k: int = 10) -> dict:
    # the tall table is bounded by total distinct keys across dims — for
    # very high-cardinality dims at production scale, slice per dim with
    # sort+limit instead of to_pandas (top_k on the tall ds); the testbed
    # cardinalities are small enough to collect.
    report: dict = {}
    total = 0
    errors = 0
    for dim in REPORT_DIMS:
        sub = df[df["dim"] == dim].drop(columns=["dim"]).sort_values(
            ["count", "key"], ascending=[False, True]
        )
        if dim == "by_log_type":
            total = int(sub["count"].sum())
        if dim == "error_reasons":
            errors = int(sub["count"].sum())
        if dim in TOPK_DIMS:
            sub = sub.head(k)
        report[dim] = sub.to_dict(orient="records")
    report["total_logs"] = total
    report["errors"] = errors
    return report


def export_integrity(out_dir: str):
    """sinks/_integrity pair rows -> deduped integrity table parquet.

    groupby(field, original).first() — the canonical exact-dedup shuffle;
    determinism of tokens makes ``first`` safe (SURVEY.md §2.6/D2).
    """
    import ray.data as rd

    pairs = rd.read_parquet(
        f"{out_dir}/sinks/sink={INTEGRITY}",
        columns=["_pair_field", "_pair_original", "_pair_replacement"],
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["field", "original", "replacement"])

    # exact dedup: determinism guarantees one distinct replacement per
    # (field, original), so an associative min-merge IS "first" — the
    # combiner tree avoids a sort shuffle entirely.  (At a scale where the
    # distinct pair set exceeds one task, switch to a groupby shuffle.)
    from ..stages.aggregate import tree_merge

    deduped = tree_merge(
        pairs.map_batches(rename, batch_format="pyarrow", batch_size=None),
        ["field", "original"], [("replacement", "min")], fanin=8,
    )
    deduped.write_parquet(f"{out_dir}/integrity")
    return deduped


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
) -> dict:
    """Full pipeline; returns the report dict (also written under out_dir).

    ``generated_at`` is injected, never datetime.now() — reproducibility
    (SURVEY.md §7.4 risk 6).
    """
    schema = schema or pan_schema()
    cfg = load_anon_config(anon_config if anon_config is not None else default_anon_config_json())
    mk = map_kwargs or {}

    parsed = parse_webtext(webtext_ds, schema, **mk)
    enriched = enrich_webtext(parsed, cfg, emit_integrity_rows=write_integrity, **mk)
    routed = enriched.map_batches(add_sink_column, batch_format="pyarrow", batch_size=None, **mk)
    routed = routed.map_batches(append_report_rows, batch_format="pyarrow", batch_size=None, **mk)
    routed.write_parquet(f"{out_dir}/sinks", partition_cols=["sink"])

    if write_integrity:
        export_integrity(out_dir)

    report = report_from_partials(out_dir, k=k)
    report["generated_at"] = generated_at
    report["schema_sha256"] = schema.schema_sha256
    report["deadletter_sink"] = DEADLETTER
    write_json_report(report, f"{out_dir}/report.json")
    return report
