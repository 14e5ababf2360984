"""Stream-shaped and specialty-join operators over the ``events`` table.

Ray Data has no event-time windows (SURVEY.md §2.8 / ray guide); per-key
window semantics are expressed as one hash shuffle (auto-gated to a
single-block collapse at small input) + vectorized segment arithmetic per
block — no per-group pandas and no sort-based groupby anywhere in this
module.  Ordering assumptions stated per operator.  Joins Ray Data lacks
natively:

* **sessionize** — gap-based sessions per user: lexsort + reduceat per
  block; oracle: SQL window functions.
* **first-event per user** — ROW_NUMBER()=1 analog as a two-phase min-by
  reduction (block-local firsts -> per-user candidates shuffle).
* **semi / anti join** — broadcast the key set, filter inside map_batches
  (no shuffle; the Bloom-filter pattern at scale).
* **as-of join** — merged-rank trick: purchases+signups lexsorted
  together; position minus purchase-rank gives the per-user as-of signup
  index, fully vectorized.  Oracle: DuckDB ASOF JOIN.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..sources import read_table
from ..stages.aggregate import tree_merge

__all__ = ["QUERIES", "ORACLE_SQL"]

SESSION_GAP_MIN = 30


def log_sessionize(sf_dir: str, *, num_partitions: int = 8, mode: str = "auto"):
    """Sessions per user: a new session starts when the gap from the
    previous event exceeds 30 minutes.

    ONE hash shuffle co-locates each user's events (no sort-based groupby);
    inside each block the whole computation is a lexsort + vectorized
    boundary/gap arithmetic — session starts are counted with one
    ``add.reduceat`` over user segments.  Below the auto-mode size
    threshold the input collapses to one block instead (same kernel, no
    shuffle actors — gap arithmetic isn't associative, so there is no
    combiner-tree middle ground)."""
    import numpy as np

    from ..stages.shuffle import hash_partition, resolve_mode

    from ..stages.shuffle import input_size_bytes
    from .streaming import auto_shard_count

    if num_partitions is None:
        num_partitions = auto_shard_count(
            input_size_bytes(f"{sf_dir}/events.parquet"))
    mode = resolve_mode(mode, f"{sf_dir}/events.parquet")
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    part = (hash_partition(ds, ["user_id"], num_partitions)
            if mode == "shuffle" else ds.repartition(1))

    def sessions(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_sessions": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64())})
        u = np.asarray(b["user_id"], dtype=np.int64)
        ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
              else b["ts"]).cast(pa.int64()).to_numpy()
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        new_user = np.ones(len(u), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        gap_us = np.empty(len(ts), dtype=np.int64)
        gap_us[0] = np.iinfo(np.int64).max
        gap_us[1:] = ts[1:] - ts[:-1]
        new_session = (new_user | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000)).astype(np.int64)
        starts = np.nonzero(new_user)[0]
        n_sessions = np.add.reduceat(new_session, starts)
        n_events = np.diff(np.append(starts, len(u)))
        return pa.table({"user_id": pa.array(u[starts]),
                         "n_sessions": pa.array(n_sessions.astype(np.int64)),
                         "n_events": pa.array(n_events.astype(np.int64))})

    return part.map_batches(sessions, batch_format="pyarrow",
                            batch_size=None)


LOG_SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM flagged
GROUP BY user_id
ORDER BY user_id
"""


def log_session_length_hist(sf_dir: str, *, num_partitions: int = 8,
                            mode: str = "auto"):
    """(session_len, n_sessions) — the session-length distribution: how
    many sessions contain exactly N events, corpus-wide (the engagement
    histogram next to ``log_sessionize``'s per-user counts).

    Same scale shape as sessionize: ONE user-keyed hash shuffle co-locates
    each user's events (gap arithmetic isn't associative, so there is no
    combiner middle ground), the per-block kernel is a lexsort + cumsum +
    bincount, and only the BOUNDED histogram partial (max events per
    session) leaves each block through the combiner tree.
    """
    import numpy as np

    from ..stages.aggregate import tree_merge
    from ..stages.shuffle import hash_partition, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/events.parquet")
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    part = (hash_partition(ds, ["user_id"], num_partitions)
            if mode == "shuffle" else ds.repartition(1))

    def hist(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        if b.num_rows == 0:
            return pa.table({"session_len": pa.array([], type=pa.int64()),
                             "n_sessions": pa.array([], type=pa.int64())})
        u = np.asarray(b["user_id"], dtype=np.int64)
        ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
              else b["ts"]).cast(pa.int64()).to_numpy()
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        new_user = np.ones(len(u), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        gap_us = np.empty(len(ts), dtype=np.int64)
        gap_us[0] = np.iinfo(np.int64).max
        gap_us[1:] = ts[1:] - ts[:-1]
        new_session = new_user | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000)
        sid = np.cumsum(new_session) - 1  # block-local session ids
        lens = np.bincount(sid)
        ulen, cnt = np.unique(lens, return_counts=True)
        return pa.table({"session_len": pa.array(ulen.astype(np.int64)),
                         "n_sessions": pa.array(cnt.astype(np.int64))})

    partial = part.map_batches(hist, batch_format="pyarrow", batch_size=None)
    out = tree_merge(partial, ["session_len"], [("n_sessions", "sum")])
    return out.sort("session_len")


LOG_SESSION_LEN_HIST_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
lens AS (
  SELECT user_id, sid, COUNT(*) AS session_len FROM sess GROUP BY user_id, sid
)
SELECT CAST(session_len AS BIGINT) AS session_len,
       COUNT(*) AS n_sessions
FROM lens GROUP BY session_len ORDER BY session_len
"""


def log_semi_join_purchasers(sf_dir: str):
    """Events of users who have >= 1 'purchase' event (broadcast semi join:
    the purchaser key set ships in the task closure, no shuffle)."""
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    purchasers = pc.unique(
        ev.filter(pc.equal(ev["event_type"], "purchase"))["user_id"].combine_chunks()
    )
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type"])

    def semi(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["user_id"], value_set=purchasers))

    return ds.map_batches(semi, batch_format="pyarrow", batch_size=None)


LOG_SEMI_JOIN_SQL = """
SELECT event_id, user_id, event_type
FROM events e
WHERE EXISTS (SELECT 1 FROM events p
              WHERE p.user_id = e.user_id AND p.event_type = 'purchase')
ORDER BY event_id
"""


def log_semi_join_bloom(sf_dir: str, *, num_partitions: int = 8):
    """Same result as ``log_semi_join_purchasers`` — events of users with a
    'purchase' event — via the plan that survives key sets too large to
    broadcast: a 128 KiB mergeable Bloom filter prunes definite
    non-members in one shuffle-free pass, then ONE hash semi-join over
    only the surviving candidates (true members + ~0.03% false positives)
    restores exactness.

    Scale shape: the filter is built DISTRIBUTED (per-block partial bit
    arrays, OR-merged on the driver — 128 KiB each, like the HLL/k-means
    partials) and broadcast once via ``ray.put``; the broadcast variant's
    driver-side full-column read disappears, and the exact join's
    exchange carries only candidate rows.  False negatives are impossible,
    so the join sees every true member; the oracle is the SAME SQL as the
    broadcast variant.
    """
    import numpy as np
    import ray

    from ..functions.sketches import bloom_build, bloom_contains, bloom_merge
    from ..stages.shuffle import enable_hash_shuffle, hash_merge

    ev_cols = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial_bloom(b: pa.Table) -> pa.Table:
        ids = np.asarray(
            b.filter(pc.equal(b["event_type"], "purchase"))["user_id"],
            dtype=np.int64)
        return pa.table({"bits": pa.array([bloom_build(ids).tobytes()],
                                          type=pa.binary())})

    # distributed OR cascade: each combine task ORs its whole block of
    # 128 KiB partials into ONE blob, so the driver reads num_partitions
    # blobs, never one per input block (at 100 TB that difference is
    # ~800k blobs vs a handful)
    def or_blobs(b: pa.Table) -> pa.Table:
        merged = bloom_merge([np.frombuffer(x.as_py(), dtype=np.uint64)
                              for x in b["bits"]])
        return pa.table({"bits": pa.array([merged.tobytes()],
                                          type=pa.binary())})

    blobs = ev_cols.map_batches(partial_bloom, batch_format="pyarrow",
                                batch_size=None)
    blobs = blobs.repartition(8).map_batches(or_blobs, batch_format="pyarrow",
                                             batch_size=None)
    bits = bloom_merge([
        np.frombuffer(r["bits"], dtype=np.uint64)
        for batch in blobs.iter_batches(batch_format="pyarrow",
                                        batch_size=None)
        for r in batch.to_pylist()])
    ref = ray.put(bits)

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "event_type"])

    def prefilter(b: pa.Table) -> pa.Table:
        keep = bloom_contains(ray.get(ref),
                              np.asarray(b["user_id"], dtype=np.int64))
        return b.filter(pa.array(keep))

    cand = ds.map_batches(prefilter, batch_format="pyarrow", batch_size=None)

    # exact verify: distributed-distinct purchaser keys, hash semi-join
    def keys_partial(b: pa.Table) -> pa.Table:
        u = pc.unique(b.filter(
            pc.equal(b["event_type"], "purchase"))["user_id"].combine_chunks())
        return pa.table({"user_id": u})

    purch_keys = hash_merge(
        ev_cols.map_batches(keys_partial, batch_format="pyarrow",
                            batch_size=None),
        ["user_id"], [], num_partitions=num_partitions)
    return enable_hash_shuffle(cand).join(purch_keys, "left_semi",
                                         num_partitions, on=("user_id",))


def log_anti_join_no_errors(sf_dir: str):
    """Users with zero 'error' events (broadcast anti join) + their event
    counts."""
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    err_users = pc.unique(
        ev.filter(pc.equal(ev["event_type"], "error"))["user_id"].combine_chunks()
    )
    ds = read_table(sf_dir, "events", columns=["user_id"])

    def anti_count(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.invert(pc.is_in(b["user_id"], value_set=err_users)))
        g = keep.group_by(["user_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "n"])

    partial = ds.map_batches(anti_count, batch_format="pyarrow", batch_size=None)
    merged = tree_merge(partial, ["user_id"], [("n", "sum")], fanin=4)
    # collect to a typed table (an all-empty Dataset loses its schema)
    import pandas as pd

    df = merged.to_pandas()
    if len(df) == 0:
        df = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                           "n_events": pd.Series(dtype="int64")})
    else:
        df = df.rename(columns={"n": "n_events"})
    df = df.sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(df[["user_id", "n_events"]], preserve_index=False)


LOG_ANTI_JOIN_SQL = """
SELECT user_id, COUNT(*) AS n_events
FROM events e
WHERE NOT EXISTS (SELECT 1 FROM events x
                  WHERE x.user_id = e.user_id AND x.event_type = 'error')
GROUP BY user_id
ORDER BY user_id
"""


def log_asof_last_signup(sf_dir: str, *, num_partitions: int = 8,
                         mode: str = "auto"):
    """For each purchase, the user's most recent signup at-or-before it.

    As-of join, fully vectorized with the merged-rank trick: purchases and
    signups are lexsorted together by (user, ts, kind); a purchase's
    position minus its rank among purchases yields how many signups
    precede it globally, and subtracting the user's signup-start offset
    gives the per-user as-of index — no per-group pandas, no per-row loop.
    One hash shuffle co-locates each user above the auto threshold; below
    it the block collapse makes the same kernel exact on one task.
    """
    import numpy as np

    from ..stages.shuffle import hash_partition, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/events.parquet")
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def keep(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"], value_set=pa.array(["purchase", "signup"]))
        return b.filter(m)

    filtered = ds.map_batches(keep, batch_format="pyarrow", batch_size=None)
    part = (hash_partition(filtered, ["user_id"], num_partitions)
            if mode == "shuffle" else filtered.repartition(1))

    def asof_block(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        empty = pa.table({"event_id": pa.array([], type=pa.int64()),
                          "user_id": pa.array([], type=pa.int64()),
                          "signup_epoch_us": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        et = np.asarray(b["event_type"].to_pylist(), dtype=object)
        is_p = et == "purchase"
        u = np.asarray(b["user_id"], dtype=np.int64)
        ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
              else b["ts"]).cast(pa.int64()).to_numpy()
        eid = np.asarray(b["event_id"], dtype=np.int64)
        if not is_p.any():
            return empty
        # signups sort before purchases at equal (user, ts): "at-or-before"
        kind = is_p.astype(np.int8)
        order = np.lexsort((kind, ts, u))
        u_s, ts_s, eid_s, k_s = u[order], ts[order], eid[order], kind[order]
        n = len(u_s)
        sign_before = np.cumsum(k_s == 0)  # signups at-or-before each merged pos
        # per-user signup-start offset: signups before the user's first row
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = u_s[1:] != u_s[:-1]
        user_start = np.maximum.accumulate(np.where(new_user, np.arange(n), 0))
        base = np.where(user_start > 0, sign_before[user_start - 1], 0)
        p_idx = np.nonzero(k_s == 1)[0]
        k_in_user = sign_before[p_idx] - base[p_idx]  # signups <= this purchase
        # global index of that signup: signup rows sorted by (user, ts) keep
        # their merged order, so the j-th signup of the block is at merged
        # rank j among signups
        sig_pos_in_merged = np.nonzero(k_s == 0)[0]
        sig_ts = ts_s[sig_pos_in_merged]
        has = k_in_user > 0
        out_ts = np.full(len(p_idx), -1, dtype=np.int64)
        if has.any():
            out_ts[has] = sig_ts[(base[p_idx] + k_in_user - 1)[has]]
        return pa.table({"event_id": pa.array(eid_s[p_idx]),
                         "user_id": pa.array(u_s[p_idx]),
                         "signup_epoch_us": pa.array(out_ts)})

    return part.map_batches(asof_block, batch_format="pyarrow",
                            batch_size=None)


LOG_ASOF_SQL = """
SELECT p.event_id, p.user_id,
       COALESCE(CAST(epoch_us(s.ts) AS BIGINT), -1) AS signup_epoch_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
ORDER BY p.event_id
"""


def log_streaming_window(sf_dir: str):
    """Incremental keyed-actor tumbling windows (pipelines/streaming.py) —
    the stateful-streaming tier of the operator ladder, still SQL-checkable
    because the closed-window results equal the batch GROUP BY."""
    from .streaming import streaming_tumbling_counts

    return streaming_tumbling_counts(sf_dir)


LOG_STREAMING_WINDOW_SQL = """
SELECT user_id,
       CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_start_us,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY 1, 2
ORDER BY user_id, window_start_us
"""


def log_first_event_per_user(sf_dir: str, *, num_partitions: int = 8,
                             mode: str = "auto"):
    """Per-partition ranking (ROW_NUMBER() = 1 analog): each user's first
    event by (ts, event_id).

    min-by is associative, so this is a two-phase reduction with NO
    sort-based groupby: each block keeps its local first row per user
    (one lexsort), the per-user candidates hash-shuffle (volume = users ×
    blocks, not events), and each partition repeats the same kernel.
    Below the auto-mode threshold the candidates collapse to one block
    (combiner style) instead of shuffling."""
    import numpy as np

    from ..stages.shuffle import hash_partition, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/events.parquet")
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def local_first(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        if b.num_rows == 0:
            return b
        u = np.asarray(b["user_id"], dtype=np.int64)
        ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
              else b["ts"]).cast(pa.int64()).to_numpy()
        eid = np.asarray(b["event_id"], dtype=np.int64)
        order = np.lexsort((eid, ts, u))
        firsts = order[np.ones(len(u), dtype=bool) if len(u) == 1 else
                       np.concatenate([[True], u[order][1:] != u[order][:-1]])]
        return b.take(pa.array(firsts))

    partial = ds.map_batches(local_first, batch_format="pyarrow", batch_size=None)
    cand = (hash_partition(partial, ["user_id"], num_partitions)
            if mode == "shuffle" else partial.repartition(1))
    merged = cand.map_batches(local_first, batch_format="pyarrow", batch_size=None)
    return merged.select_columns(["user_id", "event_id", "event_type"])


LOG_FIRST_EVENT_SQL = """
SELECT user_id, event_id, event_type
FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""



def log_user_retention(sf_dir: str, *, num_partitions: int | None = None,
                       mode: str = "auto"):
    """(hour, n_active, n_retained_next) — hour-over-hour user retention:
    distinct active users per hour, and how many of them are also active
    in the NEXT hour (the cohort-retention / stickiness telemetry metric).

    Scale shape: per-block distinct (user, hour) pairs (compact rows),
    ONE hash exchange by user_id so each user's active-hour set is
    co-located; retention falls out of one lexsort + neighbor-diff per
    partition (user u retained in h iff (u, h+1h) sits adjacent in the
    sorted distinct pairs); the per-hour census partials then tree-merge
    (window count is bounded).  Below the auto-mode threshold the input
    collapses to one block — same kernel, no shuffle actors.
    """
    import numpy as np

    from ..stages.shuffle import hash_partition, resolve_mode

    from ..stages.shuffle import input_size_bytes
    from .streaming import auto_shard_count

    if num_partitions is None:
        num_partitions = auto_shard_count(
            input_size_bytes(f"{sf_dir}/events.parquet"))
    mode = resolve_mode(mode, f"{sf_dir}/events.parquet")
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def distinct_pairs(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b["user_id"],
                      "hour": pc.floor_temporal(b["ts"], unit="hour")})
        g = t.group_by(["user_id", "hour"]).aggregate([])
        return g.rename_columns(["user_id", "hour"])

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow",
                           batch_size=None)
    if mode == "shuffle":
        pairs = hash_partition(pairs, ["user_id"], num_partitions)
    else:
        pairs = pairs.repartition(1)

    def census(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"hour": pa.array([], type=pa.timestamp("us")),
                             "n_active": pa.array([], type=pa.int64()),
                             "n_retained_next": pa.array([], type=pa.int64())})
        # complete per-user groups: re-distinct across source blocks, then
        # neighbor arithmetic on the (user, hour)-sorted pairs
        g = b.group_by(["user_id", "hour"]).aggregate([])
        u = np.asarray(g["user_id"], dtype=np.int64)
        h = g["hour"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, u))
        u, h = u[order], h[order]
        retained = np.zeros(len(u), dtype=np.int64)
        if len(u) > 1:
            retained[:-1] = ((u[1:] == u[:-1]) &
                             (h[1:] - h[:-1] == np.timedelta64(1, "h")))
        t = pa.table({"hour": pa.array(h),
                      "one": pa.array(np.ones(len(u), dtype=np.int64)),
                      "ret": pa.array(retained)})
        p = t.group_by(["hour"]).aggregate([("one", "sum"), ("ret", "sum")])
        return p.rename_columns(["hour", "n_active", "n_retained_next"])

    partial = pairs.map_batches(census, batch_format="pyarrow",
                                batch_size=None)
    merged = tree_merge(partial, ["hour"],
                        [("n_active", "sum"), ("n_retained_next", "sum")],
                        fanin=8)
    return merged.sort("hour")


LOG_USER_RETENTION_SQL = """
WITH a AS (SELECT DISTINCT date_trunc('hour', ts) AS hour, user_id FROM events)
SELECT a.hour, COUNT(*) AS n_active,
       CAST(COUNT(b.user_id) AS BIGINT) AS n_retained_next
FROM a LEFT JOIN a b ON b.user_id = a.user_id
                    AND b.hour = a.hour + INTERVAL 1 HOUR
GROUP BY a.hour
ORDER BY a.hour
"""


ROLLING_WINDOW_DAYS = 7


def log_rolling_active_users(sf_dir: str, *, num_partitions: int | None = None,
                             mode: str = "auto"):
    """(day_num, dau, wau) — per calendar day: distinct users active that
    day (DAU) and distinct users active in the trailing 7-day window
    (WAU) — the classic sliding-window COUNT DISTINCT the Dataset API has
    no operator for.

    Scale shape: windowed distinct is NOT a sum of daily distincts, so the
    plan uses interval coverage instead of a window join: per-block
    distinct (user, day) pairs (compact rows), ONE hash exchange by
    user_id co-locating each user's active-day set, then per user the
    sorted days merge into intervals [day, day+6] (gap > 6 starts a new
    one) and each covered day gets a +1 — a user contributes to WAU(d)
    exactly once iff it was active in [d-6, d].  The per-day census
    partials (bounded: calendar-sized) tree-merge; coverage days with no
    actual event that day are dropped at the end to match the oracle's
    day domain.  Days travel as epoch-day BIGINTs for cross-engine hash
    parity.
    """
    import numpy as np

    from ..stages.shuffle import (hash_partition, input_size_bytes,
                                  resolve_mode)
    from .streaming import auto_shard_count

    if num_partitions is None:
        num_partitions = auto_shard_count(
            input_size_bytes(f"{sf_dir}/events.parquet"))
    mode = resolve_mode(mode, f"{sf_dir}/events.parquet")
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    w = ROLLING_WINDOW_DAYS

    def distinct_pairs(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(pc.floor_temporal(b["ts"], unit="day"),
                              pa.date32()), pa.int32())
        t = pa.table({"user_id": b["user_id"],
                      "day_num": pc.cast(day, pa.int64())})
        return t.group_by(["user_id", "day_num"]).aggregate([])

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow",
                           batch_size=None)
    if mode == "shuffle":
        pairs = hash_partition(pairs, ["user_id"], num_partitions)
    else:
        pairs = pairs.repartition(1)

    def census(b: pa.Table) -> pa.Table:
        empty = pa.table({"day_num": pa.array([], type=pa.int64()),
                          "dau": pa.array([], type=pa.int64()),
                          "wau": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        # complete per-user groups: re-distinct across source blocks
        g = b.group_by(["user_id", "day_num"]).aggregate([])
        u = np.asarray(g["user_id"], dtype=np.int64)
        d = np.asarray(g["day_num"], dtype=np.int64)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        # merged coverage intervals [start, end]: a new interval opens on a
        # user change or a gap > w-1 days
        new_iv = np.concatenate([[True],
                                 (u[1:] != u[:-1]) | (d[1:] - d[:-1] > w - 1)])
        starts = d[new_iv]
        last = np.concatenate([new_iv[1:], [True]])   # run ends (d sorted
        ends = d[last] + (w - 1)                      # within each run)
        lengths = ends - starts + 1
        total = int(lengths.sum())
        # emit each interval's covered days: repeat(start) + intra-offset
        base = np.repeat(starts, lengths)
        off = np.arange(total) - np.repeat(np.cumsum(lengths) - lengths,
                                           lengths)
        cov = pa.table({"day_num": pa.array(base + off),
                        "one": pa.array(np.ones(total, dtype=np.int64))})
        wau = cov.group_by(["day_num"]).aggregate([("one", "sum")])
        dau = pa.table({"day_num": pa.array(d),
                        "one": pa.array(np.ones(len(d), dtype=np.int64))
                        }).group_by(["day_num"]).aggregate([("one", "sum")])
        merged = (wau.rename_columns(["day_num", "wau"])
                  .join(dau.rename_columns(["day_num", "dau"]),
                        keys=["day_num"], join_type="full outer"))
        zero = pa.scalar(0, pa.int64())
        return pa.table({"day_num": merged["day_num"],
                         "dau": pc.coalesce(merged["dau"], zero),
                         "wau": pc.coalesce(merged["wau"], zero)})

    partial = pairs.map_batches(census, batch_format="pyarrow",
                                batch_size=None)
    merged = tree_merge(partial, ["day_num"],
                        [("dau", "sum"), ("wau", "sum")], fanin=8)

    def present_only(b: pa.Table) -> pa.Table:
        # coverage extends w-1 days past a user's last event; the oracle's
        # day domain is days with >= 1 event, i.e. dau > 0
        return b.filter(pc.greater(b["dau"], 0))

    return merged.map_batches(present_only, batch_format="pyarrow",
                              batch_size=None).sort("day_num")


LOG_ROLLING_ACTIVE_SQL = f"""
WITH pairs AS (SELECT DISTINCT user_id,
                      CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                      AS day_num
               FROM events),
     days AS (SELECT DISTINCT day_num FROM pairs)
SELECT d.day_num,
       (SELECT COUNT(*) FROM pairs p WHERE p.day_num = d.day_num) AS dau,
       (SELECT COUNT(DISTINCT p.user_id) FROM pairs p
        WHERE p.day_num BETWEEN d.day_num - {ROLLING_WINDOW_DAYS - 1}
                            AND d.day_num) AS wau
FROM days d
ORDER BY d.day_num
"""


# contiguous half-open value bands [lo, hi) — the small side of the range join
VALUE_BANDS = [(0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 200.0),
               (3, 200.0, 400.0), (4, 400.0, 1e6)]


def q_value_band_join(sf_dir: str):
    """(band, n_events, sum_value_cents) — range join of ``events.value``
    into a small banded lookup table (the inequality-predicate join Ray
    Data has no operator for).

    Scale shape: the band table is tiny and sorted, so the join is a
    broadcast binary search — one ``np.searchsorted`` per batch against
    the band bounds riding the task closure (the standard small-side
    range-join plan; an interval tree replaces searchsorted for
    overlapping bands), then a bounded combiner-tree census.  Zero
    shuffle, the big side never moves.
    """
    import numpy as np

    from ..sources import read_table
    from ..stages.aggregate import grouped_agg

    bounds = np.array([b[1] for b in VALUE_BANDS], dtype=np.float64)
    ds = read_table(sf_dir, "events", columns=["value"])

    def assign(b: pa.Table) -> pa.Table:
        v = np.asarray(b["value"], dtype=np.float64)
        band = (np.searchsorted(bounds, v, side="right") - 1).astype(np.int64)
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({"band": pa.array(band), "value_cents": cents})

    out = grouped_agg(ds.map_batches(assign, batch_format="pyarrow",
                                     batch_size=None),
                      ["band"], {"sum_value_cents": "value_cents"},
                      count_name="n_events", final_partitions=1)
    return out.select_columns(["band", "n_events",
                               "sum_value_cents"]).sort("band")


Q_VALUE_BAND_JOIN_SQL = """
WITH bands(band, lo, hi) AS (VALUES (0, 0.0, 50.0), (1, 50.0, 100.0),
                                    (2, 100.0, 200.0), (3, 200.0, 400.0),
                                    (4, 400.0, 1000000.0))
SELECT CAST(b.band AS BIGINT) AS band,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band
ORDER BY band
"""


def _event_exchange(sf_dir: str, columns: list[str],
                    num_partitions: int | None, mode: str,
                    transform=None):
    """Shared shape for per-user window ops: compact column-pruned read +
    optional per-block compaction + ONE user-keyed hash exchange
    (auto-gated to a single block below the size threshold — window
    arithmetic is not associative, so there is no combiner-tree middle
    ground).  Every sizing/gating policy change lands here once."""
    from ..stages.shuffle import hash_partition, input_size_bytes, resolve_mode
    from .streaming import auto_shard_count

    if num_partitions is None:
        num_partitions = auto_shard_count(
            input_size_bytes(f"{sf_dir}/events.parquet"))
    mode = resolve_mode(mode, f"{sf_dir}/events.parquet")
    ds = read_table(sf_dir, "events", columns=columns)
    if transform is not None:
        ds = ds.map_batches(transform, batch_format="pyarrow",
                            batch_size=None)
    return (hash_partition(ds, ["user_id"], num_partitions)
            if mode == "shuffle" else ds.repartition(1))


def log_user_paths(sf_dir: str, *, num_partitions: int | None = None,
                   mode: str = "auto"):
    """(user_id, path, n_events) — ordered grouped string aggregation: each
    user's event types joined '->' in (ts, event_id) order (the journey /
    clickstream-path primitive; SQL ``string_agg(... ORDER BY ...)``).

    Scale shape: one user-keyed exchange, then per partition ONE lexsort +
    a zero-copy list reassembly — the sorted event-type strings become the
    values buffer of a LargeListArray with user-boundary offsets, and
    ``binary_join`` emits every path in one vectorized kernel (no per-user
    Python, no string concat loop).
    """
    part = _event_exchange(sf_dir, ["user_id", "ts", "event_id",
                                    "event_type"], num_partitions, mode)
    # no trailing sort: one row per user with a payload-sized path string —
    # a global sort would push all path bytes through an all-to-all for row
    # order that is not part of the contract (gate compares order-insensitive)
    return part.map_batches(paths_kernel, batch_format="pyarrow",
                            batch_size=None)


def paths_kernel(b: pa.Table) -> pa.Table:
    """Per-partition path assembly; assumes all of a user's rows are in
    ``b`` (the exchange guarantees it).  Module-level so hypothesis can
    drive it directly against a serial oracle."""
    import numpy as np

    from .. import tune_worker_threads

    tune_worker_threads()
    if b.num_rows == 0:
        return pa.table({"user_id": pa.array([], type=pa.int64()),
                         "path": pa.array([], type=pa.string()),
                         "n_events": pa.array([], type=pa.int64())})
    u = np.asarray(b["user_id"], dtype=np.int64)
    eid = np.asarray(b["event_id"], dtype=np.int64)
    ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
          else b["ts"]).cast(pa.int64()).to_numpy()
    order = np.lexsort((eid, ts, u))
    us = u[order]
    starts = np.nonzero(np.concatenate(([True], us[1:] != us[:-1])))[0]
    et = (b["event_type"].combine_chunks()
          if isinstance(b["event_type"], pa.ChunkedArray)
          else b["event_type"]).take(pa.array(order))
    offsets = pa.array(np.append(starts, len(us)).astype(np.int64))
    lst = pa.LargeListArray.from_arrays(offsets, et)
    return pa.table({
        "user_id": pa.array(us[starts]),
        "path": pc.cast(pc.binary_join(lst, "->"), pa.string()),
        "n_events": pa.array(np.diff(np.append(starts, len(us)))
                             .astype(np.int64)),
    })


LOG_USER_PATHS_SQL = """
SELECT user_id,
       string_agg(event_type, '->' ORDER BY ts, event_id) AS path,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""


EWMA_ALPHA = 0.25
EWMA_K = 3.0
EWMA_WARMUP = 10


EWMA_BUCKET_SECS = 86400  # chunk width: one (type, day) series per task


def _ewm(arr, alpha: float):
    """pandas' adjust=False EWMA recursion (y_0 = x_0;
    y_t = (1-a) y_{t-1} + a x_t) — the serial reference kernel."""
    import pandas as pd

    return pd.Series(arr).ewm(alpha=alpha, adjust=False).mean().to_numpy()


def _ewma_chunks(b: pa.Table):
    """(code, types, bucket, sorted (start, end) chunk slices, v sorted)
    shared by the three EWMA scan kernels: dictionary-encode the type,
    lexsort by (type, bucket, ts, event_id), and cut chunk boundaries
    where (type, bucket) changes."""
    import numpy as np

    et = (b["event_type"].combine_chunks()
          if isinstance(b["event_type"], pa.ChunkedArray)
          else b["event_type"])
    d = et.dictionary_encode()
    code = np.asarray(d.indices, dtype=np.int64)
    types = d.dictionary.to_pylist()
    eid = np.asarray(b["event_id"], dtype=np.int64)
    ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
          else b["ts"]).cast(pa.int64()).to_numpy()
    bucket = np.asarray(b["bucket"], dtype=np.int64)
    order = np.lexsort((eid, ts, bucket, code))
    c_s, bk_s = code[order], bucket[order]
    v_s = np.asarray(b["value"], dtype=np.float64)[order]
    change = (c_s[1:] != c_s[:-1]) | (bk_s[1:] != bk_s[:-1])
    starts = np.nonzero(np.concatenate(([True], change)))[0]
    ends = np.append(starts[1:], len(c_s))
    return c_s, types, bk_s, starts, ends, v_s


def _ewma_chunk_mprev(v, alpha: float, m_in: float):
    """Per-element prior-EWMA inside one chunk.  ``m_in`` is the exact
    running mean entering the chunk; NaN marks the series-first chunk
    (whose first element has no prior — d stays NaN there, matching the
    serial ``shift(1)``).  The prepend trick keeps the in-chunk arithmetic
    the exact pandas recursion: ewm over [state] + values continues the
    recursion bitwise."""
    import numpy as np

    if np.isnan(m_in):
        y = _ewm(v, alpha)
        return np.concatenate(([np.nan], y[:-1]))
    return _ewm(np.concatenate(([m_in], v)), alpha)[:-1]


def log_value_ewma_anomaly(sf_dir: str, *, alpha: float = EWMA_ALPHA,
                           k: float = EWMA_K, warmup: int = EWMA_WARMUP,
                           num_partitions: int = 8, mode: str = "auto",
                           bucket_secs: int = EWMA_BUCKET_SECS):
    """(event_type, n_events, n_anomalies) — EWMA-based value anomaly
    census per event type: an event is anomalous when its value deviates
    from the type's exponentially-weighted running mean by more than
    ``k`` x the running mean absolute deviation (both ``adjust=False``
    recursions over the (ts, event_id)-ordered series), after ``warmup``
    events of history.  The classic stateful streaming detector.

    Scale shape (VERDICT r04 item 2 — no task ever holds a full per-type
    series): the recursion is non-associative element-wise but IS a
    linear recurrence, so it decomposes into a SEGMENTED SCAN over
    (event_type, time-bucket) chunks — m_out = (1-a)^n * m_in + wsum with
    wsum = a * sum (1-a)^(n-1-i) v_i — and likewise for the deviation
    EWMA s over d = |v - m_prev|:

    * ONE (type, bucket)-keyed hash exchange co-locates each chunk
      (max task state = one type's events per ``bucket_secs`` window —
      tune the width down as event rates grow), materialized once
      (compact numeric columns only) and scanned three times;
    * pass A: per-chunk (n, decay, wsum, from-scratch m_out) summaries;
      the driver composes the per-type prefix states in bucket order —
      driver memory is O(types x time buckets), time-derived and
      corpus-INdependent;
    * pass B: with the broadcast m_in states, per-chunk d series and its
      (decay, wsum, from-scratch s_out) summaries; driver composes s_in;
    * pass C: with (m_in, s_in, global offset) per chunk, count
      anomalies; bounded per-type census through the combiner tree.

    The in-chunk arithmetic is the exact pandas recursion (prepend
    trick), so a single-chunk run is bitwise the serial replica; across
    chunks the closed-form state composition can differ from the serial
    recursion by float rounding — pytest pins census equality on the
    test corpora and a forced multi-chunk regime.  The ``tree`` regime
    (small inputs) keeps the one-task pandas path.  Rows-only gate entry
    (recursive state is not SQL-expressible).
    """
    import numpy as np

    from ..stages.aggregate import tree_merge
    from ..stages.shuffle import hash_partition, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/events.parquet")
    ds = read_table(sf_dir, "events",
                    columns=["event_type", "ts", "event_id", "value"])
    bucket_us = int(bucket_secs) * 1_000_000

    def add_bucket(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        ts = (b["ts"].combine_chunks()
              if isinstance(b["ts"], pa.ChunkedArray)
              else b["ts"]).cast(pa.int64())
        # int64 division truncates toward zero == floor for the epoch-us
        # timestamps here (all positive) — exact, no float round-trip
        bk = pc.divide(ts, pa.scalar(bucket_us, pa.int64()))
        return b.append_column("bucket", bk)

    if mode != "shuffle":
        # small-input regime: whole series in one task, pure pandas —
        # the bitwise serial reference path
        part = ds.map_batches(add_bucket, batch_format="pyarrow",
                              batch_size=None).repartition(1)
        kernel = _make_ewma_census(alpha, k, warmup, None)
        partial = part.map_batches(kernel, batch_format="pyarrow",
                                   batch_size=None)
        out = tree_merge(partial, ["event_type"],
                         [("n_events", "sum"), ("n_anomalies", "sum")])
        return out.sort("event_type")

    part = hash_partition(
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None),
        ["event_type", "bucket"], num_partitions).materialize()

    # pass A: per-chunk linear-map summaries for the mean recursion
    def m_summary(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "decay": pa.array([], pa.float64()),
                             "wsum": pa.array([], pa.float64()),
                             "m_first": pa.array([], pa.float64())})
        c_s, types, bk_s, starts, ends, v_s = _ewma_chunks(b)
        out = {"event_type": [], "bucket": [], "n": [], "decay": [],
               "wsum": [], "m_first": []}
        for st, en in zip(starts, ends):  # loop bounded by chunks/partition
            v = v_s[st:en]
            n = en - st
            w = alpha * (1.0 - alpha) ** (n - 1 - np.arange(n))
            out["event_type"].append(types[c_s[st]])
            out["bucket"].append(int(bk_s[st]))
            out["n"].append(int(n))
            out["decay"].append(float((1.0 - alpha) ** n))
            out["wsum"].append(float(w @ v))
            out["m_first"].append(float(_ewm(v, alpha)[-1]))
        return pa.table({"event_type": pa.array(out["event_type"], pa.string()),
                         "bucket": pa.array(out["bucket"], pa.int64()),
                         "n": pa.array(out["n"], pa.int64()),
                         "decay": pa.array(out["decay"], pa.float64()),
                         "wsum": pa.array(out["wsum"], pa.float64()),
                         "m_first": pa.array(out["m_first"], pa.float64())})

    summaries = pa.concat_tables(list(
        part.map_batches(m_summary, batch_format="pyarrow", batch_size=None)
            .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"event_type": pa.array([], pa.string())})])
    if summaries.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_events": pa.array([], pa.int64()),
                         "n_anomalies": pa.array([], pa.int64())})
    sdf = summaries.to_pandas().sort_values(["event_type", "bucket"],
                                            kind="mergesort")

    # driver-side prefix composition (O(types x buckets) rows)
    m_in: dict[tuple, float] = {}
    off: dict[tuple, int] = {}
    state, cum, cur_t = np.nan, 0, None
    for r in sdf.itertuples(index=False):
        key = (r.event_type, r.bucket)
        if r.event_type != cur_t:
            cur_t, state, cum = r.event_type, np.nan, 0
        m_in[key], off[key] = state, cum
        state = (r.m_first if np.isnan(state)
                 else r.decay * state + r.wsum)
        cum += r.n

    # pass B: deviation-series summaries given the broadcast m states
    def s_summary(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "decay": pa.array([], pa.float64()),
                             "wsum": pa.array([], pa.float64()),
                             "s_first": pa.array([], pa.float64())})
        c_s, types, bk_s, starts, ends, v_s = _ewma_chunks(b)
        out = {"event_type": [], "bucket": [], "decay": [], "wsum": [],
               "s_first": []}
        for st, en in zip(starts, ends):
            v = v_s[st:en]
            n = en - st
            key = (types[c_s[st]], int(bk_s[st]))
            d = np.nan_to_num(np.abs(v - _ewma_chunk_mprev(v, alpha,
                                                           m_in[key])))
            w = alpha * (1.0 - alpha) ** (n - 1 - np.arange(n))
            out["event_type"].append(key[0])
            out["bucket"].append(key[1])
            out["decay"].append(float((1.0 - alpha) ** n))
            out["wsum"].append(float(w @ d))
            out["s_first"].append(float(_ewm(d, alpha)[-1]))
        return pa.table({"event_type": pa.array(out["event_type"], pa.string()),
                         "bucket": pa.array(out["bucket"], pa.int64()),
                         "decay": pa.array(out["decay"], pa.float64()),
                         "wsum": pa.array(out["wsum"], pa.float64()),
                         "s_first": pa.array(out["s_first"], pa.float64())})

    s_sum = pa.concat_tables(list(
        part.map_batches(s_summary, batch_format="pyarrow", batch_size=None)
            .iter_batches(batch_format="pyarrow", batch_size=None)))
    ssdf = s_sum.to_pandas().sort_values(["event_type", "bucket"],
                                         kind="mergesort")
    s_in: dict[tuple, float] = {}
    state, cur_t = np.nan, None
    for r in ssdf.itertuples(index=False):
        key = (r.event_type, r.bucket)
        if r.event_type != cur_t:
            cur_t, state = r.event_type, np.nan
        s_in[key] = state
        state = (r.s_first if np.isnan(state)
                 else r.decay * state + r.wsum)

    # pass C: anomaly census with full (m_in, s_in, offset) state
    kernel = _make_ewma_census(alpha, k, warmup,
                               {key: (m_in[key], s_in[key], off[key])
                                for key in m_in})
    partial = part.map_batches(kernel, batch_format="pyarrow",
                               batch_size=None)
    out = tree_merge(partial, ["event_type"],
                     [("n_events", "sum"), ("n_anomalies", "sum")])
    return out.sort("event_type")


def _make_ewma_census(alpha: float, k: float, warmup: int,
                      state_map: dict | None):
    """Census kernel over co-located (type, bucket) chunks.  With
    ``state_map=None`` every chunk is treated as a series start (the
    one-task tree regime, where each type occupies exactly one chunk
    per bucket but the whole series is co-located — chunks chain through
    the SAME composition driver-side in shuffle mode).  Module-level so
    hypothesis can drive it directly."""
    import numpy as np

    def census(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "n_events": pa.array([], pa.int64()),
                          "n_anomalies": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        if state_map is None:
            # whole-series regime: chunk boundaries are per (type, bucket)
            # but the partition holds every chunk of a type contiguously —
            # collapse buckets so the recursion runs unbroken per type
            b = b.set_column(b.column_names.index("bucket"), "bucket",
                             pa.array(np.zeros(b.num_rows, dtype=np.int64)))
        c_s, types, bk_s, starts, ends, v_s = _ewma_chunks(b)
        agg: dict[str, list[int]] = {}
        for st, en in zip(starts, ends):
            v = v_s[st:en]
            n = en - st
            key = (types[c_s[st]], int(bk_s[st]))
            if state_map is None:
                mi, si, base = np.nan, np.nan, 0
            else:
                mi, si, base = state_map[key]
            d = np.abs(v - _ewma_chunk_mprev(v, alpha, mi))
            ds_ = np.nan_to_num(d)
            if np.isnan(si):
                ys = _ewm(ds_, alpha)
                s_prev = np.concatenate(([np.nan], ys[:-1]))
            else:
                s_prev = _ewm(np.concatenate(([si], ds_)), alpha)[:-1]
            idx = base + np.arange(n)
            with np.errstate(invalid="ignore"):
                anom = (idx >= warmup) & (d > k * s_prev)
            t = key[0]
            cur = agg.get(t, [0, 0])
            cur[0] += int(n)
            cur[1] += int(anom.sum())
            agg[t] = cur
        keys = sorted(agg)
        return pa.table({"event_type": pa.array(keys, pa.string()),
                         "n_events": pa.array([agg[t][0] for t in keys],
                                              pa.int64()),
                         "n_anomalies": pa.array([agg[t][1] for t in keys],
                                                 pa.int64())})

    return census


def log_event_transitions(sf_dir: str, *, num_partitions: int | None = None,
                          mode: str = "auto"):
    """(prev_type, next_type, n_pairs) — first-order Markov transition
    census over each user's event sequence in (ts, event_id) order: the
    behavioral-model primitive next to paths (full journeys) and
    inter-arrival (gap timing).

    Scale shape: one user-keyed exchange; per partition ONE lexsort, a
    dictionary-encoded consecutive-pair bincount (prev*K+next flat keys —
    no per-pair Python), and only the BOUNDED (types x types) census
    leaves each block through the combiner tree.
    """
    import numpy as np

    from ..stages.aggregate import tree_merge

    part = _event_exchange(sf_dir, ["user_id", "ts", "event_id",
                                    "event_type"], num_partitions, mode)

    def trans(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        empty = pa.table({"prev_type": pa.array([], pa.string()),
                          "next_type": pa.array([], pa.string()),
                          "n_pairs": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        enc = pc.dictionary_encode(b["event_type"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        dic = enc.dictionary
        codes = np.asarray(enc.indices, dtype=np.int64)
        u = np.asarray(b["user_id"], dtype=np.int64)
        ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
              else b["ts"]).cast(pa.int64()).to_numpy()
        eid = np.asarray(b["event_id"], dtype=np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, c_s = u[order], codes[order]
        same = u_s[1:] == u_s[:-1]
        if not same.any():
            return empty
        k = len(dic)
        key = c_s[:-1][same] * k + c_s[1:][same]
        cnt = np.bincount(key, minlength=k * k)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "prev_type": dic.take(pa.array(nz // k, pa.int64())),
            "next_type": dic.take(pa.array(nz % k, pa.int64())),
            "n_pairs": pa.array(cnt[nz].astype(np.int64)),
        })

    partial = part.map_batches(trans, batch_format="pyarrow", batch_size=None)
    out = tree_merge(partial, ["prev_type", "next_type"],
                     [("n_pairs", "sum")])
    return out.sort(["prev_type", "next_type"])


LOG_EVENT_TRANSITIONS_SQL = """
WITH lagged AS (
  SELECT user_id, event_type AS next_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, next_type, COUNT(*) AS n_pairs
FROM lagged WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY prev_type, next_type
"""


def log_interarrival(sf_dir: str, *, num_partitions: int | None = None,
                     mode: str = "auto"):
    """(gap_h, n_pairs) — census of hour-bucketed gaps between consecutive
    events of the same user (the LAG()-window inter-arrival distribution;
    load-model input for capacity planning).

    Scale shape: one user-keyed exchange, per-partition lexsort + masked
    neighbor diff, then the census collapses to bounded (gap_h, count)
    rows merged by the combiner tree — the corpus never re-shuffles.
    Bucket arithmetic is integer microseconds // 3.6e9 in BOTH engines
    (DuckDB ``date_diff('second', ...)`` counts boundary crossings, which
    diverges from floor division — epoch_us subtraction does not).
    """
    part = _event_exchange(sf_dir, ["user_id", "ts", "event_id"],
                           num_partitions, mode)
    partial = part.map_batches(gaps_kernel, batch_format="pyarrow",
                               batch_size=None)
    return tree_merge(partial, ["gap_h"], [("n_pairs", "sum")],
                      fanin=8).sort("gap_h")


def gaps_kernel(b: pa.Table) -> pa.Table:
    """Per-partition masked neighbor-diff census; same co-location
    assumption as ``paths_kernel``."""
    import numpy as np

    from .. import tune_worker_threads

    tune_worker_threads()
    if b.num_rows == 0:
        return pa.table({"gap_h": pa.array([], type=pa.int64()),
                         "n_pairs": pa.array([], type=pa.int64())})
    u = np.asarray(b["user_id"], dtype=np.int64)
    eid = np.asarray(b["event_id"], dtype=np.int64)
    ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
          else b["ts"]).cast(pa.int64()).to_numpy()
    order = np.lexsort((eid, ts, u))
    us, tss = u[order], ts[order]
    same = us[1:] == us[:-1]
    gap_h = (tss[1:] - tss[:-1])[same] // 3_600_000_000
    vals, cnts = np.unique(gap_h, return_counts=True)
    return pa.table({"gap_h": pa.array(vals, type=pa.int64()),
                     "n_pairs": pa.array(cnts.astype(np.int64))})


LOG_INTERARRIVAL_SQL = """
WITH g AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT (epoch_us(ts) - epoch_us(prev)) // 3600000000 AS gap_h,
       COUNT(*) AS n_pairs
FROM g WHERE prev IS NOT NULL
GROUP BY gap_h
ORDER BY gap_h
"""


FUNNEL_STAGES = [(0, "signup"), (1, "click"), (2, "purchase")]


def funnel_census_kernel(b: pa.Table, window_us: int | None = None) -> pa.Table:
    """Per-partition strict-order funnel census over compact (user_id,
    code, ts) rows; assumes all of a user's rows are co-located.
    ``window_us`` bounds each stage to land within that interval of the
    previous stage's timestamp (None = unbounded, the classic funnel).
    Module-level so hypothesis can drive it against a serial oracle."""
    import numpy as np

    from .. import tune_worker_threads

    tune_worker_threads()
    stage_names = [s for _, s in FUNNEL_STAGES]
    if b.num_rows == 0:
        return pa.table({"stage_idx": pa.array([], type=pa.int64()),
                         "stage": pa.array([], type=pa.string()),
                         "n_users": pa.array([], type=pa.int64())})
    sentinel = np.iinfo(np.int64).max
    u = np.asarray(b["user_id"], dtype=np.int64)
    c = np.asarray(b["code"], dtype=np.int8)
    ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
          else b["ts"]).cast(pa.int64()).to_numpy()
    order = np.lexsort((ts, u))
    u, c, ts = u[order], c[order], ts[order]
    starts = np.nonzero(np.concatenate(([True], u[1:] != u[:-1])))[0]
    seg_len = np.diff(np.append(starts, len(u)))
    # stage 1: first signup ts per user
    t_prev = np.minimum.reduceat(np.where(c == 0, ts, sentinel), starts)
    counts = [int(np.count_nonzero(t_prev < sentinel))]
    # stages 2..n: first strictly-later event of the next code
    for code in range(1, len(stage_names)):
        gate = np.repeat(t_prev, seg_len)
        ok = (c == code) & (ts > gate)
        if window_us is not None:
            # guard the sentinel: gate+w would overflow for users who
            # never reached the previous stage
            ok &= (gate < sentinel) & (ts - gate <= window_us)
        t_prev = np.minimum.reduceat(np.where(ok, ts, sentinel), starts)
        counts.append(int(np.count_nonzero(t_prev < sentinel)))
    return pa.table({
        "stage_idx": pa.array([i for i, _ in FUNNEL_STAGES], type=pa.int64()),
        "stage": pa.array(stage_names, type=pa.string()),
        "n_users": pa.array(counts, type=pa.int64()),
    })


def log_funnel(sf_dir: str, *, num_partitions: int | None = None,
               mode: str = "auto"):
    """(stage_idx, stage, n_users) — strict-order conversion funnel: users
    with a signup, users whose first signup is followed by a later click,
    and users whose first such click is followed by a later purchase (the
    product-analytics funnel the reference's Counter aggregates cannot
    express; cf. pan_dynamic_parser.py:1039-1096 which only counts flat
    dimensions).

    Scale shape: compact (user_id, stage_code, ts) rows, ONE hash exchange
    by user_id so each user's funnel events are co-located, then the whole
    chain is vectorized per partition — three masked ``minimum.reduceat``
    passes over user segments (first signup ts -> first later click ts ->
    first later purchase ts), no per-user Python.  The per-stage census is
    3 rows per partition, tree-merged.  Below the auto-mode threshold the
    input collapses to one block (same kernel, no shuffle actors).
    """
    return _funnel(sf_dir, None, num_partitions, mode)


def _funnel(sf_dir: str, window_us: int | None, num_partitions, mode):
    """Shared funnel pipeline: compact -> user exchange -> reduceat
    kernel (optionally window-bounded) -> bounded census."""
    import functools

    stage_names = [s for _, s in FUNNEL_STAGES]

    def compact(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        keep = b.filter(pc.is_in(b["event_type"],
                                 value_set=pa.array(stage_names)))
        code = pc.index_in(keep["event_type"],
                           value_set=pa.array(stage_names))
        return pa.table({"user_id": keep["user_id"],
                         "code": pc.cast(code, pa.int8()),
                         "ts": keep["ts"]})

    rows = _event_exchange(sf_dir, ["user_id", "ts", "event_type"],
                           num_partitions, mode, transform=compact)
    kernel = (funnel_census_kernel if window_us is None else
              functools.partial(funnel_census_kernel, window_us=window_us))
    partial = rows.map_batches(kernel, batch_format="pyarrow",
                               batch_size=None)
    merged = tree_merge(partial, ["stage_idx", "stage"], [("n_users", "sum")],
                        fanin=8)
    return merged.select_columns(["stage_idx", "stage",
                                  "n_users"]).sort("stage_idx")


FUNNEL_WINDOW_HOURS = 72


def log_funnel_windowed(sf_dir: str, *,
                        window_hours: int = FUNNEL_WINDOW_HOURS,
                        num_partitions: int | None = None,
                        mode: str = "auto"):
    """(stage_idx, stage, n_users) — the TIME-BOUNDED conversion funnel:
    like ``log_funnel`` but each stage must land within ``window_hours``
    of the previous stage's timestamp (the form product analytics
    actually ships — unbounded funnels overcount wandering-back users).

    Scale shape: identical to ``log_funnel`` (one user-keyed exchange,
    masked ``minimum.reduceat`` chain per partition, bounded census) —
    the window is one extra vectorized mask in the shared kernel.
    """
    return _funnel(sf_dir, int(window_hours) * 3_600_000_000,
                   num_partitions, mode)


LOG_FUNNEL_WINDOWED_SQL = f"""
WITH s AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s.t1
        AND e.ts <= s.t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= c.t2 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
      GROUP BY e.user_id)
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS stage_idx, 'signup' AS stage,
         (SELECT COUNT(*) FROM s) AS n_users
  UNION ALL
  SELECT 1, 'click', (SELECT COUNT(*) FROM c)
  UNION ALL
  SELECT 2, 'purchase', (SELECT COUNT(*) FROM p)
) ORDER BY stage_idx
"""


LOG_FUNNEL_SQL = """
WITH s AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS stage_idx, 'signup' AS stage,
         (SELECT COUNT(*) FROM s) AS n_users
  UNION ALL
  SELECT 1, 'click', (SELECT COUNT(*) FROM c)
  UNION ALL
  SELECT 2, 'purchase', (SELECT COUNT(*) FROM p)
) ORDER BY stage_idx
"""


# --- sliding (overlapping) windows ------------------------------------------

SLIDE_US = 1_800_000_000           # 30-minute slide
SLIDE_PER_WINDOW = 2               # 60-minute window = 2 slides


def log_sliding_window_counts(sf_dir: str):
    """(ws_us, n_events) — 60-minute windows sliding every 30 minutes (the
    overlapping-window shape next to the tumbling ``log_hourly_window``).

    Shuffle-free: each event belongs to exactly ``SLIDE_PER_WINDOW`` window
    starts, all computable from its own timestamp, so a block emits a
    bounded (window, count) census (keys ∝ corpus time span, not rows) and
    the combiner tree sums them.  Window starts are integer epoch_us so
    both engines do identical arithmetic.
    """
    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "events", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        import numpy as np

        ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
              else b["ts"]).cast(pa.int64()).to_numpy()
        half = ts // SLIDE_US
        starts = np.concatenate(
            [half - k for k in range(SLIDE_PER_WINDOW)]) if len(half) else half
        uk, cnt = np.unique(starts, return_counts=True)
        return pa.table({"ws_us": pa.array(uk * SLIDE_US),
                         "n_events": pa.array(cnt.astype(np.int64))})

    merged = tree_merge(ds.map_batches(partial, batch_format="pyarrow",
                                       batch_size=None),
                        ["ws_us"], [("n_events", "sum")], fanin=8)
    return merged.sort("ws_us")


LOG_SLIDING_WINDOW_SQL = f"""
WITH h AS (SELECT epoch_us(ts) // {SLIDE_US} AS half FROM events),
w AS (SELECT half AS hw FROM h
      UNION ALL SELECT half - 1 FROM h)
SELECT hw * {SLIDE_US} AS ws_us, COUNT(*) AS n_events
FROM w GROUP BY hw ORDER BY ws_us
"""


# --- burst-rate census: max events per user in any trailing window ----------

BURST_WINDOW_S = 3600


def log_burst_census(sf_dir: str, *, window_s: int = BURST_WINDOW_S,
                     num_partitions: int = 8, mode: str = "auto"):
    """(user_id, max_burst) — per user, the MAXIMUM number of events
    falling in any trailing ``window_s``-second window (SQL RANGE frame
    semantics incl. equal-timestamp peers) — the bot / scraper / runaway-
    client detector next to the EWMA value detector.

    Scale shape: ONE user-keyed hash exchange (size-gated to a single
    block below the threshold); inside each partition one lexsort by
    (user, ts) and BOTH frame edges come from two vectorized
    ``searchsorted`` calls over composite ``code * span + ts_rel`` keys
    (dense per-partition user codes x partition-relative microseconds),
    then a per-user ``maximum.reduceat``.  No per-user loop; output is
    per-user and sortless.
    """
    import functools

    from ..stages.shuffle import hash_partition, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/events.parquet")
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    part = (hash_partition(ds, ["user_id"], num_partitions)
            if mode == "shuffle" else ds.repartition(1))
    kernel = functools.partial(burst_census_kernel,
                               window_us=int(window_s) * 1_000_000)
    return part.map_batches(kernel, batch_format="pyarrow", batch_size=None)


def burst_census_kernel(b: pa.Table, window_us: int) -> pa.Table:
    """Per-partition trailing-window max-count kernel over co-located
    (user_id, ts) rows (RANGE semantics incl. equal-ts peers).
    Module-level so hypothesis can drive it against a brute-force oracle."""
    import numpy as np

    from .. import tune_worker_threads

    tune_worker_threads()
    w_us = np.int64(window_us)
    if b.num_rows == 0:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "max_burst": pa.array([], pa.int64())})
    user = np.asarray(b["user_id"], dtype=np.int64)
    ts = (b["ts"].combine_chunks()
          if isinstance(b["ts"], pa.ChunkedArray)
          else b["ts"]).cast(pa.int64()).to_numpy()
    order = np.lexsort((ts, user))
    u_s, t_s = user[order], ts[order]
    t_rel = t_s - t_s.min()
    span = np.int64(t_rel.max()) + w_us + 2
    codes = np.cumsum(np.concatenate(([0], (u_s[1:] != u_s[:-1])
                                      .astype(np.int64))))
    n_users = int(codes[-1]) + 1
    # int64 headroom guard: the composite pack needs codes*span < 2^63
    if span > 0 and n_users > (np.iinfo(np.int64).max // span):
        raise ValueError("log_burst_census: partition time span x "
                         "distinct users overflows the composite key — "
                         "raise num_partitions")
    key = codes * span + t_rel
    lo = np.searchsorted(key, key - w_us, side="left")
    hi = np.searchsorted(key, key, side="right")
    cnt = hi - lo
    starts = np.concatenate(([True], u_s[1:] != u_s[:-1]))
    seg_idx = np.nonzero(starts)[0]
    mx = np.maximum.reduceat(cnt, seg_idx)
    return pa.table({"user_id": pa.array(u_s[seg_idx]),
                     "max_burst": pa.array(mx.astype(np.int64))})


LOG_BURST_CENSUS_SQL = f"""
SELECT user_id, CAST(MAX(c) AS BIGINT) AS max_burst FROM (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL {BURST_WINDOW_S} SECONDS
                              PRECEDING AND CURRENT ROW) AS c
  FROM events) t
GROUP BY user_id
ORDER BY user_id
"""


# --- last-touch attribution ---------------------------------------------------

def log_attribution_last_touch(sf_dir: str, *, num_partitions: int | None = None,
                               mode: str = "auto"):
    """(event_type, n_attributed) — LAST-TOUCH attribution: each purchase
    is credited to the user's most recent preceding non-purchase event
    (LAG ... IGNORE NULLS semantics, (ts, event_id) ordering); purchases
    with no prior touch are unattributed and dropped.

    Scale shape: one user-keyed exchange of compact rows; per partition
    one lexsort + a segment-reset ``maximum.accumulate`` finds every
    purchase's predecessor index in O(n) — no per-user loop; the census
    is bounded by the event-type set and tree-merges.
    """
    rows = _event_exchange(sf_dir, ["user_id", "ts", "event_id",
                                    "event_type"], num_partitions, mode)
    partial = rows.map_batches(last_touch_kernel, batch_format="pyarrow",
                               batch_size=None)
    merged = tree_merge(partial, ["event_type"], [("n_attributed", "sum")],
                        fanin=8)
    return merged.select_columns(["event_type",
                                  "n_attributed"]).sort("event_type")


def last_touch_kernel(b: pa.Table) -> pa.Table:
    """Per-partition last-touch credit over co-located user rows.
    Module-level so hypothesis can drive it against a brute-force oracle."""
    import numpy as np

    from .. import tune_worker_threads

    tune_worker_threads()
    if b.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_attributed": pa.array([], pa.int64())})
    u = np.asarray(b["user_id"], dtype=np.int64)
    eid = np.asarray(b["event_id"], dtype=np.int64)
    ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
          else b["ts"]).cast(pa.int64()).to_numpy()
    et = (b["event_type"].combine_chunks()
          if isinstance(b["event_type"], pa.ChunkedArray)
          else b["event_type"])
    codes_arr = et.dictionary_encode()
    code = np.asarray(codes_arr.indices, dtype=np.int64)
    types = codes_arr.dictionary.to_pylist()
    try:
        pur = types.index("purchase")
    except ValueError:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_attributed": pa.array([], pa.int64())})
    order = np.lexsort((eid, ts, u))
    u_s, c_s = u[order], code[order]
    idx = np.arange(len(u_s))
    nonpur = c_s != pur
    # latest non-purchase index so far, reset at user boundaries: the
    # accumulate can only carry indexes FORWARD, and a carried index from
    # the previous user is rejected by the segment-start comparison
    cand = np.maximum.accumulate(np.where(nonpur, idx, -1))
    starts = np.concatenate(([True], u_s[1:] != u_s[:-1]))
    seg_start = np.maximum.accumulate(np.where(starts, idx, 0))
    valid = (c_s == pur) & (cand >= seg_start)
    credit = c_s[cand[valid]]
    cnt = np.bincount(credit, minlength=len(types))
    keep = np.nonzero(cnt)[0]
    return pa.table({
        "event_type": pa.array([types[i] for i in keep], pa.string()),
        "n_attributed": pa.array(cnt[keep].astype(np.int64)),
    })


LOG_ATTRIBUTION_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
         LAG(CASE WHEN event_type <> 'purchase' THEN event_type END
             IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_touch
  FROM events)
SELECT last_touch AS event_type, COUNT(*) AS n_attributed
FROM ordered
WHERE event_type = 'purchase' AND last_touch IS NOT NULL
GROUP BY last_touch
ORDER BY event_type
"""


# --- temporal-split next-event prediction accuracy ---------------------------

PRED_SPLIT_TS = "2024-01-16"  # events span Jan 2024; mid-month holdout


def log_next_event_accuracy(sf_dir: str, *, split_ts: str = PRED_SPLIT_TS,
                            num_partitions: int | None = None,
                            mode: str = "auto"):
    """(event_type, n_eval, n_correct) — the model-eval-as-pipeline shape:
    train a first-order next-event predictor (per current type, the most
    frequent successor; ties to the lexicographically smaller type) on
    transitions whose successor lands BEFORE ``split_ts``, then score it
    on the held-out later transitions — the temporal train/eval split
    every behavioral model ships with.

    Scale shape: the whole computation reduces to ONE bounded census —
    per-partition (current, next, is_train) transition counts (types² x 2
    rows per block) through the combiner tree; the argmax model and the
    accuracy read off that census driver-side.  One user-keyed exchange,
    no second corpus pass, no broadcast-back.
    """
    import datetime as _dt
    import functools

    # the parquet stores naive timestamps as UTC epoch-µs — anchor the
    # split the same way so both engines compare identical integers
    split_us = int(_dt.datetime.fromisoformat(split_ts)
                   .replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)

    rows = _event_exchange(sf_dir, ["user_id", "ts", "event_id",
                                    "event_type"], num_partitions, mode)
    kernel = functools.partial(transition_split_kernel, split_us=split_us)
    partial = rows.map_batches(kernel, batch_format="pyarrow",
                               batch_size=None)
    census = pa.concat_tables(list(
        tree_merge(partial, ["cur", "nxt", "is_train"], [("n", "sum")],
                   fanin=8)
        .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"cur": pa.array([], pa.string()),
                   "nxt": pa.array([], pa.string()),
                   "is_train": pa.array([], pa.int8()),
                   "n": pa.array([], pa.int64())})]).combine_chunks()

    cur = census["cur"].to_pylist()
    nxt = census["nxt"].to_pylist()
    trn = census["is_train"].to_pylist()
    n = census["n"].to_pylist()
    best: dict[str, tuple[int, str]] = {}
    for c, x, t, k in zip(cur, nxt, trn, n):
        if t == 1 and (c not in best or (-k, x) < (-best[c][0], best[c][1])):
            best[c] = (k, x)
    agg: dict[str, list[int]] = {}
    for c, x, t, k in zip(cur, nxt, trn, n):
        if t == 0 and c in best:
            a = agg.setdefault(c, [0, 0])
            a[0] += k
            if x == best[c][1]:
                a[1] += k
    keys = sorted(agg)
    return pa.table({
        "event_type": pa.array(keys, pa.string()),
        "n_eval": pa.array([agg[k][0] for k in keys], pa.int64()),
        "n_correct": pa.array([agg[k][1] for k in keys], pa.int64()),
    })


def transition_split_kernel(b: pa.Table, split_us: int) -> pa.Table:
    """Per-partition (current, next, is_train) transition census over
    co-located user rows ((ts, event_id) ordering; a transition is train
    iff its SUCCESSOR lands before the split)."""
    import numpy as np

    from .. import tune_worker_threads

    tune_worker_threads()
    empty = pa.table({"cur": pa.array([], pa.string()),
                      "nxt": pa.array([], pa.string()),
                      "is_train": pa.array([], pa.int8()),
                      "n": pa.array([], pa.int64())})
    if b.num_rows == 0:
        return empty
    u = np.asarray(b["user_id"], dtype=np.int64)
    eid = np.asarray(b["event_id"], dtype=np.int64)
    ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
          else b["ts"]).cast(pa.int64()).to_numpy()
    et = (b["event_type"].combine_chunks()
          if isinstance(b["event_type"], pa.ChunkedArray)
          else b["event_type"])
    d = et.dictionary_encode()
    code = np.asarray(d.indices, dtype=np.int64)
    types = d.dictionary.to_pylist()
    order = np.lexsort((eid, ts, u))
    u_s, c_s, t_s = u[order], code[order], ts[order]
    same = u_s[1:] == u_s[:-1]
    if not same.any():
        return empty
    cur = c_s[:-1][same]
    nxt = c_s[1:][same]
    train = (t_s[1:][same] < split_us).astype(np.int64)
    nt = len(types)
    key = (cur * nt + nxt) * 2 + train
    cnt = np.bincount(key, minlength=nt * nt * 2)
    keep = np.nonzero(cnt)[0]
    return pa.table({
        "cur": pa.array([types[k // 2 // nt] for k in keep], pa.string()),
        "nxt": pa.array([types[(k // 2) % nt] for k in keep], pa.string()),
        "is_train": pa.array([k % 2 for k in keep], pa.int8()),
        "n": pa.array(cnt[keep].astype(np.int64)),
    })


LOG_NEXT_EVENT_ACCURACY_SQL = f"""
WITH pairs AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER w AS nxt,
         LEAD(ts) OVER w AS nts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
train AS (SELECT cur, nxt, COUNT(*) AS c FROM pairs
          WHERE nxt IS NOT NULL AND nts < TIMESTAMP '{PRED_SPLIT_TS}'
          GROUP BY cur, nxt),
model AS (SELECT cur, nxt AS pred FROM (
            SELECT cur, nxt,
                   ROW_NUMBER() OVER (PARTITION BY cur
                                      ORDER BY c DESC, nxt) AS rn
            FROM train) t WHERE rn = 1),
ev AS (SELECT p.cur, p.nxt, m.pred FROM pairs p
       JOIN model m ON p.cur = m.cur
       WHERE p.nxt IS NOT NULL AND p.nts >= TIMESTAMP '{PRED_SPLIT_TS}')
SELECT cur AS event_type, COUNT(*) AS n_eval,
       CAST(SUM(CASE WHEN nxt = pred THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct
FROM ev GROUP BY cur ORDER BY event_type
"""


# --- cohort retention matrix --------------------------------------------------

WEEK_US = 7 * 24 * 3_600_000_000
COHORT_MAX_OFFSET = 512  # epoch-week offsets must stay below this


def log_cohort_matrix(sf_dir: str, *, num_partitions: int | None = None,
                      mode: str = "auto"):
    """(cohort_week, week_offset, n_active) — the classic cohort
    retention heatmap: users grouped by the epoch-week of their FIRST
    event, censused by how many are active N weeks later.

    Scale shape: one user-keyed exchange of (user, ts) rows; per
    partition one lexsort derives each user's cohort week and distinct
    active weeks, and the bounded (cohort x offset) census partials
    tree-merge.  Epoch-week flooring is integer µs arithmetic, identical
    in both engines.
    """
    rows = _event_exchange(sf_dir, ["user_id", "ts"], num_partitions, mode)
    partial = rows.map_batches(cohort_matrix_kernel, batch_format="pyarrow",
                               batch_size=None)
    merged = tree_merge(partial, ["cohort_week", "week_offset"],
                        [("n_active", "sum")], fanin=8)
    return merged.select_columns(["cohort_week", "week_offset",
                                  "n_active"]).sort(["cohort_week",
                                                     "week_offset"])


def cohort_matrix_kernel(b: pa.Table) -> pa.Table:
    """Per-partition cohort census over co-located user rows.
    Module-level so hypothesis can drive it against a brute-force oracle."""
    import numpy as np

    from .. import tune_worker_threads

    tune_worker_threads()
    if b.num_rows == 0:
        return pa.table({"cohort_week": pa.array([], pa.int64()),
                         "week_offset": pa.array([], pa.int64()),
                         "n_active": pa.array([], pa.int64())})
    u = np.asarray(b["user_id"], dtype=np.int64)
    ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
          else b["ts"]).cast(pa.int64()).to_numpy()
    week = ts // WEEK_US
    order = np.lexsort((week, u))
    u_s, w_s = u[order], week[order]
    starts = np.concatenate(([True], u_s[1:] != u_s[:-1]))
    seg = np.cumsum(starts) - 1
    cohort = w_s[np.nonzero(starts)[0]][seg]   # each user's first week
    # distinct (user, week) pairs only
    first_pair = np.concatenate(([True], (u_s[1:] != u_s[:-1])
                                 | (w_s[1:] != w_s[:-1])))
    off = (w_s - cohort)[first_pair]
    coh = cohort[first_pair]
    if off.size and off.max() >= COHORT_MAX_OFFSET:
        raise ValueError("log_cohort_matrix: week offset exceeds the "
                         "census key packing bound")
    key = coh * COHORT_MAX_OFFSET + off
    uniq, cnt = np.unique(key, return_counts=True)
    return pa.table({
        "cohort_week": pa.array(uniq // COHORT_MAX_OFFSET),
        "week_offset": pa.array(uniq % COHORT_MAX_OFFSET),
        "n_active": pa.array(cnt.astype(np.int64)),
    })


LOG_COHORT_MATRIX_SQL = """
WITH f AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id),
w AS (SELECT e.user_id,
             CAST(FLOOR(EPOCH(f.first_ts) / 604800) AS BIGINT)
                 AS cohort_week,
             CAST(FLOOR(EPOCH(e.ts) / 604800)
                  - FLOOR(EPOCH(f.first_ts) / 604800) AS BIGINT)
                 AS week_offset
      FROM events e JOIN f USING (user_id))
SELECT cohort_week, week_offset, COUNT(DISTINCT user_id) AS n_active
FROM w GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


# --- CUSUM change-point detection ---------------------------------------------

CUSUM_K_CENTS = 6000    # drift allowance per event (cents)
CUSUM_H_CENTS = 50000   # alarm threshold on the accumulated excess


def log_value_cusum(sf_dir: str, *, k_cents: int = CUSUM_K_CENTS,
                    h_cents: int = CUSUM_H_CENTS,
                    num_partitions: int = 8, mode: str = "auto"):
    """(event_type, n_events, n_alarms, max_s) — one-sided CUSUM
    change-point detection per event type: the classic upward-drift
    alarm (S_i = max(0, S_{i-1} + x_i - k), alarm on crossing h) next to
    the EWMA detector.  Unlike EWMA's float recursion, the reset-at-zero
    CUSUM has a closed form — S_i = C_i - min(0, min_{j<=i} C_j) over the
    running sum C — so the whole series is EXACT integer arithmetic and
    carries a real SQL oracle.

    Scale shape: one type-keyed exchange co-locates each type's full
    ordered series (sequential-state family, like EWMA); per segment the
    closed form is one cumsum + one minimum.accumulate (the per-segment
    loop is bounded by the TYPE count, not rows); only the bounded
    census leaves each block.
    """
    import functools

    from ..stages.shuffle import hash_partition, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/events.parquet")
    ds = read_table(sf_dir, "events",
                    columns=["event_type", "ts", "event_id", "value"])
    part = (hash_partition(ds, ["event_type"], num_partitions)
            if mode == "shuffle" else ds.repartition(1))
    kernel = functools.partial(cusum_census_kernel, k_cents=k_cents,
                               h_cents=h_cents)
    partial = part.map_batches(kernel, batch_format="pyarrow",
                               batch_size=None)
    merged = tree_merge(partial, ["event_type"],
                        [("n_events", "sum"), ("n_alarms", "sum"),
                         ("max_s", "max")], fanin=8)
    return merged.select_columns(["event_type", "n_events", "n_alarms",
                                  "max_s"]).sort("event_type")


def cusum_census_kernel(b: pa.Table, k_cents: int, h_cents: int) -> pa.Table:
    """Per-partition CUSUM census over co-located type series.
    Module-level so hypothesis can drive it against a serial recursion."""
    import numpy as np

    from .. import tune_worker_threads

    tune_worker_threads()
    if b.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_events": pa.array([], pa.int64()),
                         "n_alarms": pa.array([], pa.int64()),
                         "max_s": pa.array([], pa.int64())})
    et = (b["event_type"].combine_chunks()
          if isinstance(b["event_type"], pa.ChunkedArray)
          else b["event_type"])
    d = et.dictionary_encode()
    code = np.asarray(d.indices, dtype=np.int64)
    types = d.dictionary.to_pylist()
    eid = np.asarray(b["event_id"], dtype=np.int64)
    ts = (b["ts"].combine_chunks() if isinstance(b["ts"], pa.ChunkedArray)
          else b["ts"]).cast(pa.int64()).to_numpy()
    cents = np.asarray(
        pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                         round_mode="half_towards_infinity"),
                pa.int64()), dtype=np.int64)
    order = np.lexsort((eid, ts, code))
    c_s, x_s = code[order], cents[order]
    starts = np.nonzero(np.concatenate(([True], c_s[1:] != c_s[:-1])))[0]
    ends = np.append(starts[1:], len(c_s))
    out_t, out_n, out_a, out_m = [], [], [], []
    for st, en in zip(starts, ends):     # loop bounded by TYPE count
        dd = x_s[st:en] - k_cents
        c = np.cumsum(dd)
        m = np.minimum.accumulate(c)
        s = c - np.minimum(m, 0)
        s_prev = np.concatenate(([0], s[:-1]))
        out_t.append(types[c_s[st]])
        out_n.append(en - st)
        out_a.append(int(((s > h_cents) & (s_prev <= h_cents)).sum()))
        out_m.append(int(s.max()))
    return pa.table({"event_type": pa.array(out_t, pa.string()),
                     "n_events": pa.array(out_n, pa.int64()),
                     "n_alarms": pa.array(out_a, pa.int64()),
                     "max_s": pa.array(out_m, pa.int64())})


LOG_VALUE_CUSUM_SQL = f"""
WITH d AS (SELECT event_type, ts, event_id,
                  CAST(ROUND(value * 100) AS BIGINT) - {CUSUM_K_CENTS} AS d
           FROM events),
c AS (SELECT event_type, ts, event_id,
             SUM(d) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM d),
s AS (SELECT event_type, ts, event_id,
             cum - LEAST(0, MIN(cum) OVER (PARTITION BY event_type
                                           ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING)) AS s
      FROM c),
x AS (SELECT event_type, s,
             LAG(s, 1, 0) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS s_prev
      FROM s)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN s > {CUSUM_H_CENTS} AND s_prev <= {CUSUM_H_CENTS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
       CAST(MAX(s) AS BIGINT) AS max_s
FROM x GROUP BY event_type
ORDER BY event_type
"""


# --- event-time watermarks / late-data accounting ---------------------------

WM_SHARDS = 16                   # Kafka-style source shards (user_id % S)
WM_DELAY_US = 120_000_000        # bounded-out-of-orderness watermark delay
WM_WINDOW_US = 3_600_000_000     # tumbling hour
WM_JITTER_MULT = 2654435761     # Knuth multiplicative hash
WM_JITTER_MOD = 97               # arrival displacement <= 96 positions


def _watermark_arrays(b: pa.Table):
    """Per-partition core shared by the watermark ops: lexsort by
    (shard, arrival, event_id), exclusive per-shard running-max watermark.
    Returns ``(wstart, wm_prev, has_wm)`` aligned to the sorted rows; the
    loop is over <= `shards` segments, never rows."""
    import numpy as np

    shard = np.asarray(b["shard"], dtype=np.int64)
    arr = np.asarray(b["arr"], dtype=np.int64)
    eid = np.asarray(b["event_id"], dtype=np.int64)
    ts = np.asarray(b["ts_us"], dtype=np.int64)
    order = np.lexsort((eid, arr, shard))
    sh_s, ts_s = shard[order], ts[order]
    wm_prev = np.empty(len(ts_s), dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, sh_s[1:] != sh_s[:-1]])
    bounds = np.append(starts, len(ts_s))
    for i in range(len(starts)):
        lo, hi = bounds[i], bounds[i + 1]
        run = np.maximum.accumulate(ts_s[lo:hi])
        wm_prev[lo] = np.iinfo(np.int64).min      # first arrival: no wm yet
        wm_prev[lo + 1:hi] = run[:-1]
    wstart = (ts_s // WM_WINDOW_US) * WM_WINDOW_US
    has_wm = wm_prev != np.iinfo(np.int64).min
    return wstart, wm_prev, has_wm


def _watermark_rows(sf_dir: str, shards: int):
    """Compact (shard, arr, event_id, ts_us) rows for the watermark ops."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        eid = np.asarray(b["event_id"], dtype=np.int64)
        return pa.table({
            "shard": pa.array(np.asarray(b["user_id"], dtype=np.int64)
                              % shards),
            "arr": pa.array(eid + (eid * WM_JITTER_MULT) % WM_JITTER_MOD),
            "event_id": b["event_id"],
            "ts_us": pc.cast(b["ts"], pa.int64()),
        })

    return ds.map_batches(prep, batch_format="pyarrow", batch_size=None)


def log_watermark_late_events(sf_dir: str, *, shards: int = WM_SHARDS,
                              delay_us: int = WM_DELAY_US,
                              num_partitions: int | None = None):
    """(window_start_us, n_on_time, n_late) — Flink-style event-time
    accounting that Ray Data has no operator for: each source shard
    (``user_id % shards``, the Kafka-partition analog) tracks a watermark
    ``max(event ts seen so far) - delay``; an arriving event whose hourly
    window END the shard's watermark has already passed is LATE (would be
    dropped / dead-lettered by a window operator), everything else is
    on-time.  Arrival order is a deterministic jitter of the event log
    (``event_id + (event_id * 2654435761) % 97``) so the census is exactly
    reproducible in SQL — the synthetic network reordering that makes
    watermark semantics observable on an otherwise time-ordered log.

    Scale shape: compact (shard, arr, event_id, ts) rows, ONE hash
    exchange keyed by SHARD (each shard's arrival sequence must be scanned
    in order; shards are the unit of streaming parallelism, exactly as in
    the real system) -> per-shard lexsort + exclusive running-max
    watermark (vectorized; the per-partition loop is over <= ``shards``
    segments, never rows) -> bounded per-window census through the
    combiner tree.  Nothing corpus-sized crosses a second exchange.
    """
    import numpy as np

    from ..stages.aggregate import grouped_agg
    from ..stages.shuffle import hash_partition

    if num_partitions is None:
        num_partitions = shards
    rows = _watermark_rows(sf_dir, shards)

    def flag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"window_start_us": pa.array([], pa.int64()),
                             "on_time": pa.array([], pa.int64()),
                             "late": pa.array([], pa.int64())})
        wstart, wm_prev, has_wm = _watermark_arrays(b)
        late = (wm_prev - delay_us >= wstart + WM_WINDOW_US) & has_wm
        return pa.table({"window_start_us": pa.array(wstart),
                         "on_time": pa.array((~late).astype(np.int64)),
                         "late": pa.array(late.astype(np.int64))})

    flagged = hash_partition(rows, ["shard"], num_partitions).map_batches(
        flag, batch_format="pyarrow", batch_size=None)
    out = grouped_agg(flagged, ["window_start_us"],
                      {"n_on_time": "on_time", "n_late": "late"},
                      final_partitions=1)
    return out.sort("window_start_us")


LOG_WATERMARK_LATE_SQL = f"""
WITH a AS (
  SELECT event_id, ts, user_id % {WM_SHARDS} AS shard,
         event_id + (event_id * {WM_JITTER_MULT}) % {WM_JITTER_MOD} AS arr
  FROM events
), w AS (
  SELECT ts,
         MAX(ts) OVER (PARTITION BY shard ORDER BY arr, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS wm
  FROM a
)
SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_start_us,
       CAST(COUNT(*) FILTER (WHERE wm IS NULL OR
            epoch_us(wm) - {WM_DELAY_US} <
            epoch_us(date_trunc('hour', ts)) + {WM_WINDOW_US}) AS BIGINT)
           AS n_on_time,
       CAST(COUNT(*) FILTER (WHERE wm IS NOT NULL AND
            epoch_us(wm) - {WM_DELAY_US} >=
            epoch_us(date_trunc('hour', ts)) + {WM_WINDOW_US}) AS BIGINT)
           AS n_late
FROM w
GROUP BY 1
ORDER BY 1
"""


WM_ALLOWED_LATE_US = 1_800_000_000   # 30 min of allowed lateness


def log_late_update_census(sf_dir: str, *, shards: int = WM_SHARDS,
                           delay_us: int = WM_DELAY_US,
                           allowed_us: int = WM_ALLOWED_LATE_US,
                           num_partitions: int | None = None):
    """(window_start_us, n_on_time, n_updates, n_dropped) — the
    allowed-lateness tier of the watermark semantics
    (``log_watermark_late_events`` is the binary on-time/late split): a
    late event whose window state is still retained (watermark < window
    end + allowed lateness) triggers an UPDATE (re-emission downstream
    must handle a retraction); once the watermark passes end + allowed,
    the state is gone and the event is DROPPED.  The three-way census is
    the dimensioning input for both the retraction rate a consumer must
    absorb and the dead-letter volume.

    Same scale shape as ``log_watermark_late_events`` (shared shard
    exchange + per-shard exclusive running-max via ``_watermark_arrays``).
    """
    import numpy as np

    from ..stages.aggregate import grouped_agg
    from ..stages.shuffle import hash_partition

    if num_partitions is None:
        num_partitions = shards
    rows = _watermark_rows(sf_dir, shards)

    def flag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"window_start_us": pa.array([], pa.int64()),
                             "on_time": pa.array([], pa.int64()),
                             "update": pa.array([], pa.int64()),
                             "dropped": pa.array([], pa.int64())})
        wstart, wm_prev, has_wm = _watermark_arrays(b)
        wend = wstart + WM_WINDOW_US
        wm = wm_prev - delay_us
        late = (wm >= wend) & has_wm
        dropped = (wm >= wend + allowed_us) & has_wm
        update = late & ~dropped
        return pa.table({
            "window_start_us": pa.array(wstart),
            "on_time": pa.array((~late).astype(np.int64)),
            "update": pa.array(update.astype(np.int64)),
            "dropped": pa.array(dropped.astype(np.int64)),
        })

    flagged = hash_partition(rows, ["shard"], num_partitions).map_batches(
        flag, batch_format="pyarrow", batch_size=None)
    out = grouped_agg(flagged, ["window_start_us"],
                      {"n_on_time": "on_time", "n_updates": "update",
                       "n_dropped": "dropped"}, final_partitions=1)
    return out.sort("window_start_us")


LOG_LATE_UPDATE_SQL = f"""
WITH a AS (
  SELECT event_id, ts, user_id % {WM_SHARDS} AS shard,
         event_id + (event_id * {WM_JITTER_MULT}) % {WM_JITTER_MOD} AS arr
  FROM events
), w AS (
  SELECT ts,
         MAX(ts) OVER (PARTITION BY shard ORDER BY arr, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS wm
  FROM a
), c AS (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS wstart,
         CASE WHEN wm IS NULL THEN 0
              ELSE epoch_us(wm) - {WM_DELAY_US}
                   - epoch_us(date_trunc('hour', ts)) - {WM_WINDOW_US}
         END AS past_end,
         wm IS NOT NULL AS has_wm
  FROM w
)
SELECT wstart AS window_start_us,
       CAST(COUNT(*) FILTER (WHERE NOT has_wm OR past_end < 0) AS BIGINT)
           AS n_on_time,
       CAST(COUNT(*) FILTER (WHERE has_wm AND past_end >= 0
                             AND past_end < {WM_ALLOWED_LATE_US}) AS BIGINT)
           AS n_updates,
       CAST(COUNT(*) FILTER (WHERE has_wm
                             AND past_end >= {WM_ALLOWED_LATE_US}) AS BIGINT)
           AS n_dropped
FROM c
GROUP BY 1
ORDER BY 1
"""


QUERIES = {
    "log_late_update_census": log_late_update_census,
    "log_watermark_late_events": log_watermark_late_events,
    "log_value_cusum": log_value_cusum,
    "log_cohort_matrix": log_cohort_matrix,
    "log_next_event_accuracy": log_next_event_accuracy,
    "log_attribution_last_touch": log_attribution_last_touch,
    "log_funnel_windowed": log_funnel_windowed,
    "log_burst_census": log_burst_census,
    "log_streaming_window": log_streaming_window,
    "log_sliding_window_counts": log_sliding_window_counts,
    "log_funnel": log_funnel,
    "log_user_paths": log_user_paths,
    "log_interarrival": log_interarrival,
    "log_user_retention": log_user_retention,
    "log_rolling_active_users": log_rolling_active_users,
    "q_value_band_join": q_value_band_join,
    "log_sessionize": log_sessionize,
    "log_session_length_hist": log_session_length_hist,
    "log_event_transitions": log_event_transitions,
    "log_value_ewma_anomaly": log_value_ewma_anomaly,
    "log_first_event_per_user": log_first_event_per_user,
    "log_semi_join_purchasers": log_semi_join_purchasers,
    "log_semi_join_bloom": log_semi_join_bloom,
    "log_anti_join_no_errors": log_anti_join_no_errors,
    "log_asof_last_signup": log_asof_last_signup,
}

ORACLE_SQL = {
    "log_late_update_census": LOG_LATE_UPDATE_SQL,
    "log_watermark_late_events": LOG_WATERMARK_LATE_SQL,
    "log_value_cusum": LOG_VALUE_CUSUM_SQL,
    "log_cohort_matrix": LOG_COHORT_MATRIX_SQL,
    "log_next_event_accuracy": LOG_NEXT_EVENT_ACCURACY_SQL,
    "log_attribution_last_touch": LOG_ATTRIBUTION_SQL,
    "log_funnel_windowed": LOG_FUNNEL_WINDOWED_SQL,
    "log_burst_census": LOG_BURST_CENSUS_SQL,
    "log_streaming_window": LOG_STREAMING_WINDOW_SQL,
    "log_sliding_window_counts": LOG_SLIDING_WINDOW_SQL,
    "log_funnel": LOG_FUNNEL_SQL,
    "log_user_paths": LOG_USER_PATHS_SQL,
    "log_interarrival": LOG_INTERARRIVAL_SQL,
    "log_user_retention": LOG_USER_RETENTION_SQL,
    "log_rolling_active_users": LOG_ROLLING_ACTIVE_SQL,
    "q_value_band_join": Q_VALUE_BAND_JOIN_SQL,
    "log_sessionize": LOG_SESSIONIZE_SQL,
    "log_session_length_hist": LOG_SESSION_LEN_HIST_SQL,
    "log_event_transitions": LOG_EVENT_TRANSITIONS_SQL,
    "log_first_event_per_user": LOG_FIRST_EVENT_SQL,
    "log_semi_join_purchasers": LOG_SEMI_JOIN_SQL,
    "log_semi_join_bloom": LOG_SEMI_JOIN_SQL,  # same result, scale plan
    "log_anti_join_no_errors": LOG_ANTI_JOIN_SQL,
    "log_asof_last_signup": LOG_ASOF_SQL,
}
