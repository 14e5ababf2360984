"""Log/telemetry-style queries over the ``events`` and ``documents`` tables.

These re-express the reference's parse -> enrich -> route -> aggregate
capabilities over the driver's test tables so the DuckDB oracle gate can
verify them: regex field extraction (the grok analog of the CSV parser),
lookup enrichment (lang -> region, the anonymizer ``map`` mode analog),
route counts per sink, top-k, windowed (hour-bucketed) aggregation, and
deterministic anonymization (FNV tokens — not SQL-expressible, checked by
pytest against the serial oracle instead).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..core.anonymize import anonymize_column
from ..sources import read_table
from ..stages.aggregate import count_by, grouped_agg

__all__ = ["QUERIES", "ORACLE_SQL"]

# lang -> region enrichment map (FIXTURES.md §1; mirrors webtext.LANG_REGION)
LANG_REGION = {"en": "AMER", "de": "EMEA", "fr": "EMEA", "es": "AMER", "zh": "APAC", "ar": "EMEA"}


# --- parse: regex field extraction from the props JSON-ish column ----------

def log_parse_props(sf_dir: str):
    """(event_type, n_props, sum_k) — regex-extract the numeric `k` from the
    semi-structured JSON ``props`` column and aggregate per event type."""
    ds = read_table(sf_dir, "events", columns=["event_type", "props"])

    def prep(b: pa.Table) -> pa.Table:
        ks = pc.struct_field(pc.extract_regex(b["props"], r'"k": (?P<k>\d+)'), "k")
        return pa.table({
            "event_type": b["event_type"],
            "k": pc.cast(ks, pa.int64()),
        })

    out = grouped_agg(ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
                      ["event_type"], {"sum_k": "k"}, count_name="n_events",
                      final_partitions=1)
    return out.sort("event_type")


LOG_PARSE_PROPS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- route: per-sink counts ------------------------------------------------

def log_route_counts(sf_dir: str):
    """(event_type, n_rows) — the router's per-sink row census."""
    ds = read_table(sf_dir, "events", columns=["event_type"])
    return count_by(ds, "event_type", count_name="n_rows",
                    final_partitions=1).sort("event_type")


LOG_ROUTE_COUNTS_SQL = """
SELECT event_type, COUNT(*) AS n_rows
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- top-k users by activity ----------------------------------------------

def log_topk_users(sf_dir: str):
    """Top-20 users by event count (bounded local-topk prefilter, no
    corpus-wide sort)."""
    from ..stages.aggregate import local_topk

    ds = read_table(sf_dir, "events", columns=["user_id"])
    counts = count_by(ds, "user_id", count_name="n_events", final_partitions=1)
    # prefilter each merged block to its local top-10 so the global sort
    # never sees the (corpus-sized) distinct-user directory
    counts = local_topk(counts, ["n_events", "user_id"], 10)
    return counts.sort(["n_events", "user_id"], descending=[True, False]).limit(10)


LOG_TOPK_USERS_SQL = """
SELECT user_id, COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY n_events DESC, user_id
LIMIT 10
"""


# --- windowed aggregate: tumbling 1-hour buckets ---------------------------

def log_hourly_window(sf_dir: str):
    """(hour, event_type, n_events, sum_value_cents) — tumbling-hour grouped
    aggregate over the event stream."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b["ts"], unit="hour")
        return pa.table({
            "hour": hour,
            "event_type": b["event_type"],
            # half_towards_infinity == DuckDB ROUND (half away from zero)
            "value_cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                            round_mode="half_towards_infinity"),
                                   pa.int64()),
        })

    out = grouped_agg(ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
                      ["hour", "event_type"], {"sum_value_cents": "value_cents"},
                      count_name="n_events", final_partitions=1)
    return out.sort(["hour", "event_type"])


LOG_HOURLY_WINDOW_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def log_dow_hour_heatmap(sf_dir: str):
    """(isodow, hour, n_events) — day-of-week x hour-of-day activity
    matrix (the ops-dashboard heatmap).  Bounded key set (7 x 24), so the
    corpus collapses to per-block partials through the combiner tree.
    Arrow's ``day_of_week`` counts Monday=0; +1 matches DuckDB ``isodow``
    (Monday=1) exactly — both ISO, no locale dependence.
    """
    ds = read_table(sf_dir, "events", columns=["ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "isodow": pc.cast(pc.add(pc.day_of_week(b["ts"]), 1), pa.int64()),
            "hour": pc.cast(pc.hour(b["ts"]), pa.int64()),
        })

    out = count_by(ds.map_batches(prep, batch_format="pyarrow",
                                  batch_size=None),
                   ["isodow", "hour"], count_name="n_events",
                   final_partitions=1)
    return out.sort(["isodow", "hour"])


LOG_DOW_HOUR_HEATMAP_SQL = """
SELECT CAST(isodow(ts) AS BIGINT) AS isodow,
       CAST(hour(ts) AS BIGINT) AS hour,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY isodow, hour
"""


def log_spike_detection(sf_dir: str):
    """(hour, event_type, n_events, prev3_sum, is_spike) — trailing-window
    rate-spike detection per event type: an hour is a spike when its count
    exceeds 5/3 of the mean of the previous three hours' counts, computed
    in exact integer arithmetic (``9*cnt > 5*sum_prev3``; hours with no
    full history never flag).  The alerting-shaped windowed analytic over
    the parse->route->aggregate output.

    Scale shape: the corpus collapses to (hour, type) partial counts per
    block (bounded key set: hours x types) through the combiner tree; the
    trailing-window pass then runs in ONE tiny task over the aggregated
    series — the raw events never see a window operator.
    """
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"hour": pc.floor_temporal(b["ts"], unit="hour"),
                         "event_type": b["event_type"]})

    counts = count_by(ds.map_batches(prep, batch_format="pyarrow",
                                     batch_size=None),
                      ["hour", "event_type"], count_name="n_events",
                      final_partitions=1)

    def window(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"hour": pa.array([], type=pa.timestamp("us")),
                             "event_type": pa.array([], type=pa.string()),
                             "n_events": pa.array([], type=pa.int64()),
                             "prev3_sum": pa.array([], type=pa.int64()),
                             "is_spike": pa.array([], type=pa.int64())})
        hour = b["hour"].to_numpy(zero_copy_only=False)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        n = np.asarray(b["n_events"], dtype=np.int64)
        order = np.lexsort((hour, et))
        hour, et, n = hour[order], et[order], n[order]
        prev3 = np.zeros(len(n), dtype=np.int64)
        valid = np.zeros(len(n), dtype=bool)
        # trailing sums within each (contiguous hourly) type series
        for lag in (1, 2, 3):
            same = np.zeros(len(n), dtype=bool)
            same[lag:] = ((et[lag:] == et[:-lag]) &
                          (hour[lag:] - hour[:-lag]
                           == np.timedelta64(lag, "h")))
            prev3[lag:] += np.where(same[lag:], n[:-lag], 0)
            if lag == 3:
                valid = same
        is_spike = (valid & (9 * n > 5 * prev3)).astype(np.int64)
        return pa.table({"hour": pa.array(hour),
                         "event_type": pa.array(et, type=pa.string()),
                         "n_events": pa.array(n),
                         "prev3_sum": pa.array(np.where(valid, prev3, 0)),
                         "is_spike": pa.array(is_spike)})

    out = counts.repartition(1).map_batches(window, batch_format="pyarrow",
                                            batch_size=None)
    return out.sort(["hour", "event_type"])


LOG_SPIKE_DETECTION_SQL = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT hour, event_type, n_events,
         lag(n_events, 1) OVER win AS p1, lag(hour, 1) OVER win AS h1,
         lag(n_events, 2) OVER win AS p2, lag(hour, 2) OVER win AS h2,
         lag(n_events, 3) OVER win AS p3, lag(hour, 3) OVER win AS h3
  FROM c WINDOW win AS (PARTITION BY event_type ORDER BY hour)
)
SELECT hour, event_type, n_events,
       CASE WHEN h3 = hour - INTERVAL 3 HOUR
                  AND h2 = hour - INTERVAL 2 HOUR
                  AND h1 = hour - INTERVAL 1 HOUR
            THEN CAST(p1 + p2 + p3 AS BIGINT) ELSE 0 END AS prev3_sum,
       CASE WHEN h3 = hour - INTERVAL 3 HOUR
                  AND h2 = hour - INTERVAL 2 HOUR
                  AND h1 = hour - INTERVAL 1 HOUR
                  AND 9 * n_events > 5 * (p1 + p2 + p3)
            THEN 1 ELSE 0 END AS is_spike
FROM w
ORDER BY hour, event_type
"""


def log_value_quantiles(sf_dir: str, *, qs=(0.5, 0.9, 0.99)):
    """(q_pct, value_est) — approximate quantiles of the CONTINUOUS
    ``events.value`` column via a DDSketch-style log-histogram (<= 1%
    relative error guaranteed).  The mergeable-sketch answer where the
    exact value-histogram method (``doc_len_quantiles``) requires a
    discrete integer domain.  Approximate by construction -> rows-only;
    the pytest pins the error bound against the true quantiles and
    merge==whole.

    Scale shape: per-block sparse (bin, count) partials (bin count bounded
    by the value dynamic range, ~2.3k bins for 10^-9..10^9 at alpha=1%,
    regardless of corpus size) -> associative ``tree_merge`` -> one tiny
    final read-off.  No shuffle, no sort, nothing corpus-sized ever moves.
    """
    import numpy as np

    from ..functions.sketches import dd_bins, dd_quantiles
    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "events", columns=["value"])

    def hist(b: pa.Table) -> pa.Table:
        bins = dd_bins(np.asarray(b["value"], dtype=np.float64))
        ub, cnt = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(ub),
                         "cnt": pa.array(cnt.astype(np.int64))})

    merged = tree_merge(ds.map_batches(hist, batch_format="pyarrow",
                                       batch_size=None),
                        ["bin"], [("cnt", "sum")], fanin=8)
    tbl = pa.concat_tables(list(
        merged.iter_batches(batch_format="pyarrow", batch_size=None)))
    est = dd_quantiles(np.asarray(tbl["bin"]), np.asarray(tbl["cnt"]), qs)
    return pa.table({
        "q_pct": pa.array([int(q * 100) for q in qs], type=pa.int64()),
        "value_est": pa.array(est, type=pa.float64()),
    })


def log_value_quantiles_by_type(sf_dir: str, *, qs=(0.5, 0.9, 0.99)):
    """(event_type, p50, p90, p99) — GROUPED approximate quantiles of the
    continuous ``value`` column: the per-group DDSketch variant of
    ``log_value_quantiles``, completing the grouped-sketch family next to
    ``log_event_user_hll`` (grouped cardinality) and ``doc_len_quantiles``
    (grouped exact over a discrete domain).  Rows-only (<=1% relative
    error); pytest pins the per-group bound and merge==whole.

    Scale shape: per-block sparse (event_type, bin, count) partials —
    bounded by groups x ~2.3k bins regardless of corpus size — merged
    associatively; one tiny final read-off per group.  No shuffle.
    """
    import numpy as np

    from ..functions.sketches import dd_quantiles
    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def hist(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate([])  # distinct groups
        from ..functions.sketches import DD_PACK_OFFSET, DD_PACK_STRIDE, dd_bins

        et = (b["event_type"].combine_chunks()
              if isinstance(b["event_type"], pa.ChunkedArray)
              else b["event_type"])
        bins = dd_bins(np.asarray(b["value"], dtype=np.float64))
        # stride is DERIVED from DD_GAMMA (sketches.py) so tightening
        # DD_ALPHA can never silently alias groups; the assert is the
        # cheap tripwire if dd_bins' clamp contract ever changes
        assert np.abs(bins).max(initial=0) < DD_PACK_OFFSET
        codes = pc.index_in(et, value_set=g["event_type"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        key = codes * DD_PACK_STRIDE + (bins + DD_PACK_OFFSET)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "event_type": g["event_type"].take(pa.array(uk // DD_PACK_STRIDE)),
            "bin": pa.array(uk % DD_PACK_STRIDE - DD_PACK_OFFSET),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    merged = tree_merge(ds.map_batches(hist, batch_format="pyarrow",
                                       batch_size=None),
                        ["event_type", "bin"], [("cnt", "sum")], fanin=8)

    def readoff(t: pa.Table) -> pa.Table:
        cols = {"event_type": pa.array([], type=pa.string())}
        cols.update({f"p{int(q*100)}": pa.array([], type=pa.float64())
                     for q in qs})
        if t.num_rows == 0:
            return pa.table(cols)
        out: dict[str, list] = {"event_type": []}
        for q in qs:
            out[f"p{int(q*100)}"] = []
        ets = np.asarray(t["event_type"].to_pylist(), dtype=object)
        bins = np.asarray(t["bin"], dtype=np.int64)
        cnts = np.asarray(t["cnt"], dtype=np.int64)
        for et in np.unique(ets):
            m = ets == et
            est = dd_quantiles(bins[m], cnts[m], qs)
            out["event_type"].append(str(et))
            for q, v in zip(qs, est):
                out[f"p{int(q*100)}"].append(float(v))
        return pa.table({"event_type": pa.array(out["event_type"],
                                                type=pa.string()),
                         **{f"p{int(q*100)}":
                            pa.array(out[f"p{int(q*100)}"], type=pa.float64())
                            for q in qs}})

    return merged.map_batches(readoff, batch_format="pyarrow",
                              batch_size=None).sort("event_type")


def log_hourly_topk(sf_dir: str, *, topk: int = 3,
                    num_partitions: int | None = None):
    """(hour, user_id, n_events, rk) — per-hour top-``topk`` users by event
    count (the trending-entities windowed top-k; ties -> smaller user_id).

    Scale shape: per-block (hour, user) count partials, then ONE hash
    exchange keyed by hour ONLY — the coarser key still co-locates every
    (hour, user) group, so the count completion AND the per-hour top-k are
    both partition-local (one group_by + one lexsort per block).  No
    global sort, no second exchange; a pathologically hot hour must fit
    one task (salt the hour like the flagship's hot domains if it ever
    cannot).
    """
    import numpy as np

    from ..stages.shuffle import hash_partition, input_size_bytes
    from .streaming import auto_shard_count

    if num_partitions is None:  # size partitions to the input, not a constant
        num_partitions = auto_shard_count(
            input_size_bytes(f"{sf_dir}/events.parquet"))
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({"hour": pc.floor_temporal(b["ts"], unit="hour"),
                      "user_id": b["user_id"]})
        g = t.group_by(["hour", "user_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["hour", "user_id", "n"])

    partial = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def topk_in_partition(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"hour": pa.array([], type=pa.timestamp("us")),
                             "user_id": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64()),
                             "rk": pa.array([], type=pa.int64())})
        g = b.group_by(["hour", "user_id"]).aggregate([("n", "sum")])
        g = g.rename_columns(["hour", "user_id", "n_events"])
        hour = g["hour"].to_numpy(zero_copy_only=False)
        user = np.asarray(g["user_id"], dtype=np.int64)
        n = np.asarray(g["n_events"], dtype=np.int64)
        order = np.lexsort((user, -n, hour))
        h_s = hour[order]
        first = np.ones(len(h_s), dtype=bool)
        first[1:] = h_s[1:] != h_s[:-1]
        seg_start = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        rk = np.arange(len(h_s), dtype=np.int64) - starts[seg_start] + 1
        keep = order[rk <= topk]
        out = g.take(pa.array(keep, type=pa.int64()))
        return out.append_column("rk", pa.array(rk[rk <= topk]))

    out = hash_partition(partial, ["hour"], num_partitions).map_batches(
        topk_in_partition, batch_format="pyarrow", batch_size=None)
    return out.sort(["hour", "rk"])


LOG_HOURLY_TOPK_SQL = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS hour, user_id, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT hour, user_id, n_events, rk
FROM (SELECT *, row_number() OVER (PARTITION BY hour
                                   ORDER BY n_events DESC, user_id) AS rk
      FROM c)
WHERE rk <= 3
ORDER BY hour, rk
"""


# --- enrich: lang -> region broadcast lookup over documents ----------------

def doc_region_enrich(sf_dir: str):
    """(region, n_docs, sum_chars) — broadcast lang->region dictionary
    enrichment (J2) then a bounded census."""
    ds = read_table(sf_dir, "documents", columns=["lang", "n_chars"])
    langs = pa.array(list(LANG_REGION.keys()), type=pa.string())
    regions = pa.array(list(LANG_REGION.values()) + ["OTHER"], type=pa.string())

    def prep(b: pa.Table) -> pa.Table:
        pos = pc.index_in(b["lang"].combine_chunks() if isinstance(b["lang"], pa.ChunkedArray) else b["lang"],
                          value_set=langs)
        pos = pc.if_else(pc.is_valid(pos), pos, pa.scalar(len(langs), type=pa.int32()))
        return pa.table({
            "region": pc.take(regions, pos),
            "n_chars": b["n_chars"],
        })

    out = grouped_agg(ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
                      ["region"], {"sum_chars": "n_chars"}, count_name="n_docs",
                      final_partitions=1)
    return out.sort("region")


DOC_REGION_SQL = """
SELECT CASE lang WHEN 'en' THEN 'AMER' WHEN 'es' THEN 'AMER'
                 WHEN 'de' THEN 'EMEA' WHEN 'fr' THEN 'EMEA' WHEN 'ar' THEN 'EMEA'
                 WHEN 'zh' THEN 'APAC' ELSE 'OTHER' END AS region,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1
ORDER BY region
"""


# --- text analysis: token counts per lang ----------------------------------

def doc_token_stats(sf_dir: str):
    """(lang, n_docs, n_tokens, max_tokens) — whitespace-token counting per
    language, fully vectorized (one regex count per batch)."""
    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def prep(b: pa.Table) -> pa.Table:
        # len(text.split()) == number of \S+ runs; 0 for all-whitespace
        toks = pc.count_substring_regex(b["text"], r"\S+")
        return pa.table({"lang": b["lang"], "tokens": pc.cast(toks, pa.int64())})

    out = grouped_agg(ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
                      ["lang"], {"sum_tokens": "tokens"}, count_name="n_docs",
                      final_partitions=1)
    return out.sort("lang")


DOC_TOKEN_STATS_SQL = """
SELECT lang,
       CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS sum_tokens,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang
ORDER BY lang
"""


# --- exact dedup: keeper per distinct text ---------------------------------

def doc_exact_dedup(sf_dir: str, *, mode: str = "auto", num_partitions: int = 16):
    """Keeper per distinct FULL TEXT.  The key domain is the corpus itself,
    so the default merge is the hash shuffle (keys co-located across
    ``num_partitions`` tasks); ``mode="tree"`` remains for small corpora."""
    from ..stages.shuffle import resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/documents.parquet")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        # per-block partial: min doc_id + count per text
        g = b.group_by(["text"]).aggregate([("doc_id", "min"), ([], "count_all")])
        return g.rename_columns(["text", "keeper", "n"])

    from ..stages.aggregate import tree_merge
    from ..stages.shuffle import hash_merge

    partial = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    specs = [("keeper", "min"), ("n", "sum")]
    if mode == "shuffle":
        merged = hash_merge(partial, ["text"], specs, num_partitions=num_partitions)
    else:
        merged = tree_merge(partial, ["text"], specs, fanin=8)

    def finalize(b: pa.Table) -> pa.Table:
        t = b.rename_columns(["text", "keeper_doc_id", "n_copies"])
        return t.select(["keeper_doc_id", "n_copies"])

    return merged.map_batches(finalize, batch_format="pyarrow", batch_size=None)


DOC_EXACT_DEDUP_SQL = """
SELECT MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY text
ORDER BY keeper_doc_id
"""


# --- anonymization over events (NOT SQL-expressible: FNV tokens) -----------

_EVENT_ANON = {
    "version": 1,
    "defaults": {"tokenize": {"prefix": "T_", "salt": "events-pepper"}},
    "fields": {"user_token": {"mode": "tokenize", "tokenize": {"prefix": "U_", "salt": "usr"}}},
}


def log_anonymize_users(sf_dir: str, *, mode: str = "auto", num_partitions: int = 8):
    """Distinct (user_id, deterministic token).  Rows-only driver check; the
    token function itself is conformance-tested against the serial oracle.

    The distinct-user key set is ∝ corpus, so the default merge is
    size-gated like its siblings (VERDICT r02 item 7): combiner tree below
    the auto threshold, ONE hash shuffle above it — the user directory
    never funnels through a single task at scale.
    """
    from ..core.anonymize import load_anon_config
    from ..stages.shuffle import hash_merge, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/events.parquet")
    cfg = load_anon_config(_EVENT_ANON)
    ds = read_table(sf_dir, "events", columns=["user_id"])

    def prep(b: pa.Table) -> pa.Table:
        uniq = pc.unique(b["user_id"].combine_chunks() if isinstance(b["user_id"], pa.ChunkedArray) else b["user_id"])
        s = pc.cast(uniq, pa.string())
        tok, _ = anonymize_column(cfg, "user_token", s)
        return pa.table({"user_id": uniq, "user_token": tok})

    from ..stages.aggregate import tree_merge

    partial = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    # dedup via min-merge (token is deterministic -> min == the value)
    if mode == "shuffle":
        out = hash_merge(partial, ["user_id"], [("user_token", "min")],
                         num_partitions=num_partitions)
    else:
        out = tree_merge(partial, ["user_id"], [("user_token", "min")], fanin=4)
    return out


def approx_distinct_parts(sf_dir: str):
    """Approximate distinct l_partkey via mergeable HyperLogLog sketches:
    one 4 KiB register array per block, elementwise-max merge, one estimate.
    Rows-only (approximate by construction); pytest pins <5% error vs exact.
    """
    import pickle

    from ..functions.sketches import hll_estimate, hll_merge, hll_sketch

    ds = read_table(sf_dir, "lineitem", columns=["l_partkey"])

    def sketch(b: pa.Table) -> pa.Table:
        s = hll_sketch(pc.cast(b["l_partkey"], pa.string()))
        return pa.table({"sketch": pa.array([pickle.dumps(s)], type=pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow", batch_size=None).to_pandas()
    merged = hll_merge([pickle.loads(b) for b in parts["sketch"]])
    return pa.table({"approx_distinct_parts": pa.array([int(round(hll_estimate(merged)))],
                                                       type=pa.int64())})


def log_event_user_distinct(sf_dir: str, *, mode: str = "auto",
                            num_partitions: int = 8):
    """(event_type, n_users) — EXACT grouped COUNT(DISTINCT): the
    two-level-aggregation re-expression (per-block distinct (group, user)
    pairs -> pair-level dedup merge -> bounded per-group census), i.e. the
    exact sibling of ``log_event_user_hll`` (same answer, but the shuffle
    carries the distinct pair set instead of fixed-size registers).

    Scale shape: blocks emit pre-deduped pairs (shrinks the exchange to
    block-distinct pairs); the pair set is corpus-keyed, so the dedup
    merge is size-gated tree/hash-shuffle like exact-dedup; the final
    census is a tiny count per group.
    """
    from ..stages.aggregate import tree_merge
    from ..stages.shuffle import hash_merge, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/events.parquet")
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def pairs(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "user_id"]).aggregate([])
        return g.append_column("one", pa.array([1] * g.num_rows,
                                               type=pa.int64()))

    p = ds.map_batches(pairs, batch_format="pyarrow", batch_size=None)
    if mode == "shuffle":
        dedup = hash_merge(p, ["event_type", "user_id"], [("one", "min")],
                           num_partitions=num_partitions)
    else:
        dedup = tree_merge(p, ["event_type", "user_id"], [("one", "min")],
                           fanin=8)
    return count_by(dedup, "event_type",
                    count_name="n_users").sort("event_type")


LOG_EVENT_USER_DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def log_event_user_hll(sf_dir: str, *, fanin: int = 8):
    """(event_type, approx_users) — approximate distinct users PER GROUP
    via grouped HyperLogLog: the mergeable grouped-cardinality primitive
    (exact grouped COUNT(DISTINCT) needs a corpus shuffle by (group, user);
    this moves one 4 KiB register array per group per block instead).

    Rows-only (approximate); pytest pins <5% error vs exact per group and
    the merge==whole property.  Scale shape: per-block per-group sketches
    -> combiner tree with elementwise-max per group — shuffle volume =
    O(groups x blocks x 4 KiB), independent of row count.
    """
    import pickle

    from ..functions.sketches import hll_estimate, hll_merge, hll_sketch

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def sketch(b: pa.Table) -> pa.Table:
        et = (b["event_type"].combine_chunks()
              if isinstance(b["event_type"], pa.ChunkedArray)
              else b["event_type"])
        groups, regs = [], []
        for v in pc.unique(et).to_pylist():     # bounded: few event types
            uid = b.filter(pc.equal(et, v))["user_id"]
            groups.append(v)
            regs.append(pickle.dumps(hll_sketch(pc.cast(uid, pa.string()))))
        return pa.table({"event_type": pa.array(groups, type=pa.string()),
                         "regs": pa.array(regs, type=pa.binary())})

    def merge(t: pa.Table) -> pa.Table:
        acc: dict[str, list] = {}
        for g, r in zip(t["event_type"].to_pylist(), t["regs"].to_pylist()):
            acc.setdefault(g, []).append(pickle.loads(r))
        return pa.table({
            "event_type": pa.array(sorted(acc), type=pa.string()),
            "regs": pa.array([pickle.dumps(hll_merge(acc[g]))
                              for g in sorted(acc)], type=pa.binary())})

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "approx_users": pa.array(
                [int(round(hll_estimate(pickle.loads(r))))
                 for r in t["regs"].to_pylist()], type=pa.int64())})

    from ..stages.aggregate import tree_combine

    merged = tree_combine(
        ds.map_batches(sketch, batch_format="pyarrow", batch_size=None),
        merge, fanin=fanin)
    return merged.map_batches(finalize, batch_format="pyarrow",
                              batch_size=None).sort("event_type")


# --- PII redaction -----------------------------------------------------------

# (name, RE2 pattern, replacement tag), applied IN ORDER — later patterns see
# the text after earlier replacements (tags carry no digits, so the digit-run
# catch-all cannot mangle an earlier tag).  RE2-only syntax (no lookaround/
# backrefs) so pyarrow's replace_substring_regex and DuckDB's regexp_replace
# — both RE2 — agree byte-for-byte; the oracle SQL below is GENERATED from
# this same list (single source of truth).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d-]{6,13}\d", "<PHONE>"),
    ("number", r"\d+", "<NUM>"),
]


def redact_pii(arr: pa.Array | pa.ChunkedArray):
    """Apply the PII pattern chain to a string array.  Returns
    ``(redacted, n_hits)`` where ``n_hits`` counts every replaced span
    across all patterns.  Pure RE2 kernels — vectorized, no Python rows.
    """
    n_hits = pa.nulls(len(arr), pa.int64())
    n_hits = pc.fill_null(n_hits, 0)
    out = arr
    for _, pat, tag in PII_PATTERNS:
        n_hits = pc.add(n_hits, pc.cast(
            pc.count_substring_regex(out, pat), pa.int64()))
        out = pc.replace_substring_regex(out, pat, tag)
    return out, n_hits


def log_redact_pii(sf_dir: str):
    """(event_id, redacted, n_hits) — PII-redact the ``props`` payload of
    every event with the email/IPv4/phone/digit-run chain (the scrubbing
    pass a training-data pipeline runs before export; generalizes the
    reference's PAN anonymization from fixed columns to free text).

    Scale shape: embarrassingly parallel — one vectorized RE2 pass per
    block, zero shuffles, zero state; output is written per block.  The
    pattern set fires on real spans here (digit runs in props); the
    email/IP/phone arms are pinned by pytest on a synthetic PII corpus.
    """
    from .. import tune_worker_threads

    ds = read_table(sf_dir, "events", columns=["event_id", "props"])

    def redact(b: pa.Table) -> pa.Table:
        tune_worker_threads()
        red, n = redact_pii(b["props"])
        return pa.table({"event_id": b["event_id"],
                         "redacted": red, "n_hits": n})

    # deliberately NO trailing sort: the output is the corpus-sized redacted
    # payload, and a global sort would push every text byte through an
    # all-to-all exchange for nothing — row order is not part of this
    # operator's contract (the correctness gate compares order-insensitive)
    return ds.map_batches(redact, batch_format="pyarrow", batch_size=None)


def _redact_sql() -> str:
    """Generate the nested regexp_replace oracle from PII_PATTERNS."""
    txt, counts = "props", []
    for i, (_, pat, tag) in enumerate(PII_PATTERNS):
        counts.append(f"len(regexp_extract_all({txt}, '{pat}'))")
        txt = f"regexp_replace({txt}, '{pat}', '{tag}', 'g')"
    total = " + ".join(counts)
    return (f"SELECT event_id, {txt} AS redacted,\n"
            f"       CAST({total} AS BIGINT) AS n_hits\n"
            f"FROM events ORDER BY event_id")


LOG_REDACT_PII_SQL = _redact_sql()


# --- robust outlier census (median / MAD) -----------------------------------

def log_value_mad_outliers(sf_dir: str, *, k: int = 5, nbins: int = 4096,
                           max_passes: int = 8, fanin: int = 8):
    """(event_type, n_events, n_outliers, median_x1e6, mad_x1e6) — robust
    per-type outlier census of the continuous ``value`` column: an event is
    an outlier when |value - median| > ``k`` x MAD (median absolute
    deviation), the mean/stddev-free rule that survives the very outliers
    it hunts.  Values are fixed-point 1e-6 ints so both engines do exact
    integer selection and comparison.

    Scale shape: two EXACT grouped-median passes through the shared
    histogram-refinement engine (``exact_grouped_quantiles`` — per-block
    bounded partials, combiner tree, O(log_nbins(domain)) scans each),
    medians/MADs broadcast in the closure (bounded: one pair per event
    type), then ONE census pass.  Nothing corpus-sized ever moves.
    """
    import numpy as np

    from ..stages.aggregate import exact_grouped_quantiles

    def load():
        return read_table(sf_dir, "events", columns=["event_type", "value"])

    def _val(b: pa.Table):
        # half away from zero == DuckDB ROUND (pyarrow default is banker's)
        return pc.cast(pc.round(pc.multiply(b["value"], 1e6),
                                round_mode="half_towards_infinity"),
                       pa.int64())

    def prep_med(b: pa.Table) -> pa.Table:
        return pa.table({"grp": b["event_type"], "val": _val(b)})

    groups, med = exact_grouped_quantiles(load, prep_med, (0.5,),
                                          nbins=nbins,
                                          max_passes=max_passes, fanin=fanin)
    grp_arr = pa.array([str(g) for g in groups], type=pa.string())
    med_by_g = med[:, 0]

    def prep_dev(b: pa.Table, *, grp_arr=grp_arr,
                 med_by_g=med_by_g) -> pa.Table:
        gi = np.asarray(pc.index_in(b["event_type"], value_set=grp_arr),
                        dtype=np.int64)
        dev = np.abs(np.asarray(_val(b), dtype=np.int64) - med_by_g[gi])
        return pa.table({"grp": b["event_type"], "val": pa.array(dev)})

    groups2, mad = exact_grouped_quantiles(load, prep_dev, (0.5,),
                                           nbins=nbins,
                                           max_passes=max_passes,
                                           fanin=fanin)
    mad_by_name = dict(zip(groups2, mad[:, 0]))
    mad_by_g = np.asarray([mad_by_name[g] for g in groups], dtype=np.int64)

    def census(b: pa.Table, *, grp_arr=grp_arr, med_by_g=med_by_g,
               mad_by_g=mad_by_g) -> pa.Table:
        gi = np.asarray(pc.index_in(b["event_type"], value_set=grp_arr),
                        dtype=np.int64)
        dev = np.abs(np.asarray(_val(b), dtype=np.int64) - med_by_g[gi])
        out = (dev > k * mad_by_g[gi]).astype(np.int64)
        return pa.table({"event_type": b["event_type"],
                         "is_out": pa.array(out)})

    agg = grouped_agg(load().map_batches(census, batch_format="pyarrow",
                                         batch_size=None),
                      "event_type", {"n_outliers": "is_out"},
                      count_name="n_events", final_partitions=1)

    def attach(b: pa.Table) -> pa.Table:
        gi = np.asarray(pc.index_in(b["event_type"], value_set=grp_arr),
                        dtype=np.int64)
        return pa.table({
            "event_type": b["event_type"],
            "n_events": b["n_events"],
            "n_outliers": b["n_outliers"],
            "median_x1e6": pa.array(med_by_g[gi]),
            "mad_x1e6": pa.array(mad_by_g[gi]),
        })

    # bounded output (one row per event type) — sort is fine
    return agg.map_batches(attach, batch_format="pyarrow",
                           batch_size=None).sort("event_type")


LOG_VALUE_MAD_SQL = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) AS val
  FROM events
),
m AS (SELECT event_type, quantile_disc(val, 0.5) AS med
      FROM v GROUP BY event_type),
d AS (SELECT v.event_type, ABS(v.val - m.med) AS dev, m.med AS med
      FROM v JOIN m USING (event_type)),
md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
       FROM d GROUP BY event_type)
SELECT d.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN d.dev > 5 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(MIN(d.med) AS BIGINT) AS median_x1e6,
       CAST(MIN(md.mad) AS BIGINT) AS mad_x1e6
FROM d JOIN md USING (event_type)
GROUP BY d.event_type
ORDER BY event_type
"""


# --- seasonal-naive forecast evaluation --------------------------------------

SEASONAL_LAG_HOURS = 168  # one week


def log_seasonal_naive_eval(sf_dir: str, *,
                            lag_hours: int = SEASONAL_LAG_HOURS):
    """(n_hours, abs_err_sum, actual_sum) — the forecast-baseline eval
    every capacity-planning pipeline runs: predict each hour's event
    count with the same hour one week earlier and census the total
    absolute error (integer-exact; the MAE and relative error are the
    reader's one division).  Hours whose baseline hour had no events are
    skipped, matching the SQL inner join.

    Scale shape: the hourly count census is time-span-bounded (per-block
    partials through the combiner tree); the lag join runs driver-side
    on that compact table with one searchsorted.  No corpus-sized
    exchange anywhere.
    """
    import numpy as np

    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "events", columns=["ts"])

    def hourly(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        hour = pc.cast(pc.floor_temporal(b["ts"], unit="hour"), pa.int64())
        t = pa.table({"hour_us": hour})
        g = t.group_by(["hour_us"]).aggregate([([], "count_all")])
        return g.rename_columns(["hour_us", "n"])

    census = pa.concat_tables(list(
        tree_merge(ds.map_batches(hourly, batch_format="pyarrow",
                                  batch_size=None),
                   ["hour_us"], [("n", "sum")], fanin=8)
        .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"hour_us": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64())})]).combine_chunks()
    h = np.asarray(census["hour_us"], dtype=np.int64)
    n = np.asarray(census["n"], dtype=np.int64)
    order = np.argsort(h)
    h, n = h[order], n[order]
    lag_us = np.int64(lag_hours) * 3_600_000_000
    pos = np.searchsorted(h, h - lag_us)
    valid = (pos < len(h)) & (h[np.minimum(pos, len(h) - 1)] == h - lag_us)
    err = np.abs(n[valid] - n[pos[valid]])
    return pa.table({
        "n_hours": pa.array([int(valid.sum())], pa.int64()),
        "abs_err_sum": pa.array([int(err.sum())], pa.int64()),
        "actual_sum": pa.array([int(n[valid].sum())], pa.int64()),
    })


LOG_SEASONAL_NAIVE_SQL = f"""
WITH h AS (SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
           FROM events GROUP BY 1)
SELECT COUNT(*) AS n_hours,
       CAST(COALESCE(SUM(ABS(a.n - b.n)), 0) AS BIGINT) AS abs_err_sum,
       CAST(COALESCE(SUM(a.n), 0) AS BIGINT) AS actual_sum
FROM h a JOIN h b ON a.hour = b.hour + INTERVAL {SEASONAL_LAG_HOURS} HOUR
"""


QUERIES = {
    "log_seasonal_naive_eval": log_seasonal_naive_eval,
    "approx_distinct_parts": approx_distinct_parts,
    "log_value_mad_outliers": log_value_mad_outliers,
    "log_event_user_hll": log_event_user_hll,
    "log_event_user_distinct": log_event_user_distinct,
    "log_redact_pii": log_redact_pii,
    "log_parse_props": log_parse_props,
    "log_route_counts": log_route_counts,
    "log_topk_users": log_topk_users,
    "log_hourly_window": log_hourly_window,
    "log_dow_hour_heatmap": log_dow_hour_heatmap,
    "log_hourly_topk": log_hourly_topk,
    "log_value_quantiles": log_value_quantiles,
    "log_value_quantiles_by_type": log_value_quantiles_by_type,
    "log_spike_detection": log_spike_detection,
    "doc_region_enrich": doc_region_enrich,
    "doc_token_stats": doc_token_stats,
    "doc_exact_dedup": doc_exact_dedup,
    "log_anonymize_users": log_anonymize_users,
}

ORACLE_SQL = {
    "log_seasonal_naive_eval": LOG_SEASONAL_NAIVE_SQL,
    "log_redact_pii": LOG_REDACT_PII_SQL,
    "log_value_mad_outliers": LOG_VALUE_MAD_SQL,
    "log_event_user_distinct": LOG_EVENT_USER_DISTINCT_SQL,
    "log_parse_props": LOG_PARSE_PROPS_SQL,
    "log_route_counts": LOG_ROUTE_COUNTS_SQL,
    "log_topk_users": LOG_TOPK_USERS_SQL,
    "log_hourly_window": LOG_HOURLY_WINDOW_SQL,
    "log_dow_hour_heatmap": LOG_DOW_HOUR_HEATMAP_SQL,
    "log_hourly_topk": LOG_HOURLY_TOPK_SQL,
    "log_spike_detection": LOG_SPIKE_DETECTION_SQL,
    "doc_region_enrich": DOC_REGION_SQL,
    "doc_token_stats": DOC_TOKEN_STATS_SQL,
    "doc_exact_dedup": DOC_EXACT_DEDUP_SQL,
    # log_anonymize_users: intentionally no SQL oracle (FNV not expressible);
    # driver records rows-only, pytest covers token correctness.
}
