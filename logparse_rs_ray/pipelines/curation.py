"""End-to-end corpus curation: the canonical "clean my training data" run.

One pipeline composing the individually-tested signals into a filtered
corpus (reference analogue: the flagship's parse->enrich->route composition,
re-aimed at the training-data table):

* quality gate       — word count in [min_words, max_words], duplicate-word
                       ratio below max_dup_pml (Gopher-style rules, the
                       `doc_repetition` kernel)
* benchmark holdout  — benchmark docs (doc_id % bench_mod == 0) never enter
                       the training corpus
* decontamination    — docs sharing a k-token shingle with the benchmark
                       set are dropped (broadcast small side, same machinery
                       as `doc_decontaminate`)
* exact dedup        — one surviving copy per distinct text (min doc_id
                       keeps, same rule as `dedup_exact_hash`)

Scale shape: TWO corpus passes and ONE compact-row shuffle.

* pass 1 collects the benchmark's distinct shingle hashes (small by
  construction, `ray.put` once).
* pass 2 computes every per-doc signal vectorized and emits COMPACT rows
  (doc_id, text_hash, lang, n_words, ok-flag) — ~30 B/row; the full text
  never shuffles.
* the exact-dup keeper rule needs docs with identical text co-located:
  one `hash_partition` by text_hash of the compact rows, then a
  per-partition lexsort keeps the min doc_id of each hash run.  The
  keeper set is corpus-sized, so broadcasting it would NOT scale — the
  compact-row shuffle is the honest 100-TB plan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.fnv import fnv1a64_arrow
from ..functions.hashing import segment_sum, shingle_hashes
from ..sources import read_table
from .textops import repetition_signals

__all__ = ["doc_curation", "DOC_CURATION_SQL", "QUERIES", "ORACLE_SQL"]


def _arr(x):
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x


def doc_curation(sf_dir: str, *, k_shingle: int = 5, bench_mod: int = 97,
                 min_words: int = 15, max_words: int = 90,
                 max_dup_pml: int = 600, num_partitions: int = 8):
    """(doc_id, lang, n_words) of the docs surviving curation, by doc_id."""
    import ray as _ray

    from ..stages.shuffle import hash_partition

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    # pass 1: benchmark shingles (small side), shipped once
    def bench_grams(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"])
        ntok = np.asarray(pc.count_substring_regex(b["text"], r"\S+"), dtype=np.int64)
        mask = (ids % bench_mod == 0) & (ntok >= k_shingle)
        if not mask.any():
            return pa.table({"h": pa.array([], type=pa.uint64())})
        sub = b.take(pa.array(np.nonzero(mask)[0]))
        sh, _ = shingle_hashes(sub["text"], k=k_shingle)
        return pa.table({"h": pa.array(np.unique(sh))})

    parts = docs.map_batches(bench_grams, batch_format="pyarrow", batch_size=None)
    all_h = [np.asarray(b["h"], dtype=np.uint64)
             for b in parts.iter_batches(batch_format="pyarrow", batch_size=None)]
    bench = (np.unique(np.concatenate(all_h)) if all_h
             else np.empty(0, dtype=np.uint64))
    ref = _ray.put(bench)

    # pass 2: all per-doc signals -> compact rows (text never shuffles)
    def signals(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "text_hash": pa.array([], type=pa.int64()),
                             "lang": pa.array([], type=pa.string()),
                             "n_words": pa.array([], type=pa.int64()),
                             "ok": pa.array([], type=pa.int8())})
        rep = repetition_signals(b.select(["doc_id", "text"]))
        n_words = rep["n_words"].to_numpy()
        dup_pml = rep["dup_word_pml"].to_numpy()
        ids = np.asarray(b["doc_id"])
        is_bench = ids % bench_mod == 0

        # contamination: any k-gram shingle in the broadcast benchmark set
        contaminated = np.zeros(b.num_rows, dtype=bool)
        bench_h = _ray.get(ref)
        ntok = np.asarray(pc.count_substring_regex(b["text"], r"\S+"), dtype=np.int64)
        cand = ~is_bench & (ntok >= k_shingle)
        if len(bench_h) and cand.any():
            sub_idx = np.nonzero(cand)[0]
            sh, off = shingle_hashes(b.take(pa.array(sub_idx))["text"], k=k_shingle)
            pos = np.minimum(np.searchsorted(bench_h, sh), len(bench_h) - 1)
            hit = (bench_h[pos] == sh).astype(np.int64)
            # any hit within a doc's shingle segment flags the doc
            # (segment_sum is empty-segment-safe, unlike bare reduceat)
            contaminated[sub_idx] = segment_sum(hit, off) > 0

        ok = (~is_bench & ~contaminated
              & (n_words >= min_words) & (n_words <= max_words)
              & (dup_pml < max_dup_pml))
        h = fnv1a64_arrow(_arr(b["text"]))
        return pa.table({
            "doc_id": b["doc_id"],
            "text_hash": pa.array(h.astype(np.int64)),
            "lang": b["lang"],
            "n_words": rep["n_words"],
            "ok": pa.array(ok.astype(np.int8)),
        })

    compact = docs.map_batches(signals, batch_format="pyarrow", batch_size=None)

    # one shuffle by text_hash co-locates duplicate groups; min doc_id keeps
    def keep_min(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "lang": pa.array([], type=pa.string()),
                             "n_words": pa.array([], type=pa.int64())})
        h = np.asarray(b["text_hash"])
        ids = np.asarray(b["doc_id"])
        order = np.lexsort((ids, h))
        hs = h[order]
        first = np.empty(len(hs), dtype=bool)
        first[0] = True
        np.not_equal(hs[1:], hs[:-1], out=first[1:])
        keep = b.take(pa.array(order[first]))
        keep = keep.filter(pc.equal(keep["ok"], 1))
        return keep.select(["doc_id", "lang", "n_words"])

    # stays a Dataset: the kept set is corpus-∝ (compact rows, but still
    # too big to funnel through the driver at real scale) — consumers
    # stream it or aggregate it (doc_training_export)
    return hash_partition(compact, ["text_hash"], num_partitions).map_batches(
        keep_min, batch_format="pyarrow", batch_size=None)


DOC_CURATION_SQL = """
WITH wc AS (
  SELECT doc_id, w, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY doc_id, w
),
sig AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
         CAST(((SUM(c) - COUNT(*)) * 1000) // SUM(c) AS BIGINT) AS dup_pml
  FROM wc GROUP BY doc_id
),
keeper AS (SELECT MIN(doc_id) AS kid FROM documents GROUP BY text),
toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents WHERE trim(text) <> ''
),
g AS (
  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS gram
  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
  WHERE len(t) >= 5
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
contam AS (
  SELECT DISTINCT doc_id FROM g JOIN bench USING (gram) WHERE doc_id % 97 <> 0
)
SELECT d.doc_id, d.lang, s.n_words
FROM documents d JOIN sig s USING (doc_id)
WHERE d.doc_id IN (SELECT kid FROM keeper)
  AND d.doc_id % 97 <> 0
  AND d.doc_id NOT IN (SELECT doc_id FROM contam)
  AND s.n_words BETWEEN 15 AND 90
  AND s.dup_pml < 600
ORDER BY d.doc_id
"""


def doc_training_export(sf_dir: str, *, n_shards: int = 16,
                        out_dir: str | None = "/tmp/logparse_training_export"):
    """(shard, n_docs, n_tokens) — the full training-data export composed
    from the individually-proven operators: curation (quality gate +
    benchmark holdout + decontamination + exact dedup) -> deterministic
    Knuth training-shard assignment -> hive-partitioned parquet write (one
    directory per shard, the flagship's resumable sink layout) -> per-shard
    census as the returned manifest.

    Scale shape: inherits curation's two-corpus-pass / one-compact-shuffle
    plan and stays a DATASET end-to-end — the kept set is corpus-∝ and
    never funnels through the driver; the shard column is a pure function
    of doc_id (no RNG, no all-to-all — `doc_shuffle_shards`' rule), one
    ``materialize()`` (object-store-resident, spillable) lets the write
    and the census share the curated blocks instead of re-executing the
    lineage, and the census is a bounded combiner-tree group-by.  The
    oracle wraps the curation SQL unchanged, so the composition is
    verified end-to-end, not just its parts.
    """
    import shutil

    from ..stages.aggregate import grouped_agg
    from .textops import knuth_shard

    kept = doc_curation(sf_dir)

    def add_shard(b: pa.Table) -> pa.Table:
        shard = knuth_shard(np.asarray(b["doc_id"], dtype=np.int64), n_shards)
        return b.append_column("shard", pa.array(shard, type=pa.int64()))

    sharded = kept.map_batches(add_shard, batch_format="pyarrow",
                               batch_size=None).materialize()

    if out_dir:
        shutil.rmtree(out_dir, ignore_errors=True)
        sharded.write_parquet(out_dir, partition_cols=["shard"])

    census = grouped_agg(sharded.map_batches(
        lambda b: pa.table({"shard": b["shard"], "n_words": b["n_words"]}),
        batch_format="pyarrow", batch_size=None),
        ["shard"], {"n_tokens": "n_words"}, count_name="n_docs",
        final_partitions=1)
    return census.select_columns(["shard", "n_docs", "n_tokens"]).sort("shard")


from .textops import knuth_shard_sql as _shard_sql  # noqa: E402  (one shard rule)

DOC_TRAINING_EXPORT_SQL = f"""
SELECT {_shard_sql(16)} AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_tokens
FROM ({DOC_CURATION_SQL.replace("ORDER BY d.doc_id", "")}) kept
GROUP BY 1
ORDER BY shard
"""


QUERIES = {"doc_curation": doc_curation,
           "doc_training_export": doc_training_export}
ORACLE_SQL = {"doc_curation": DOC_CURATION_SQL,
              "doc_training_export": DOC_TRAINING_EXPORT_SQL}
