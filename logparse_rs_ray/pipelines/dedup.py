"""Deduplication pipelines over the ``documents`` table.

Training-data-pipeline operators the reference lacks but a 100 TB corpus
needs (driver brief): exact dedup, MinHash+LSH near-dup, SimHash near-dup,
n-gram Jaccard verification, embedding-cosine near-dup.

Scale shapes:

* **exact**: content-hash per batch (vectorized FNV) -> hash-keyed dedup.
  The reference's integrity-table dedup (SURVEY.md §2.6/D2) generalized.
* **MinHash-LSH**: per-batch signatures (no Python per row) -> explode to
  (band_id, band_key, doc_id) rows -> groupby band bucket -> candidate
  pairs inside buckets -> exact Jaccard verification of candidates only.
  The all-pairs problem never materializes; only same-bucket pairs do.
* **SimHash**: 64-bit signature, banded into 4x16-bit chunks (any pair
  within Hamming distance 3 shares >= 1 chunk) -> bucket groupby ->
  popcount verification.
* **embedding cosine**: blocked by a coarse key (label) -> per-block
  normalized matmul -> pairs above threshold.  The coarse key is the IVF
  idea: only same-cell pairs are compared.

Candidate-pair verification happens inside ``map_groups``/per-bucket tasks;
the final pair list is small relative to the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.fnv import fnv1a64_arrow
from ..functions.hashing import (
    band_keys,
    hamming_distance_u64,
    minhash_signatures,
    shingle_hashes,
    simhash_signatures,
)
from .. import auto_pool_size
from ..sources import read_table
from ..stages.aggregate import tree_merge
from ..stages.shuffle import hash_merge, hash_partition

__all__ = ["QUERIES", "ORACLE_SQL", "minhash_candidate_pairs", "verified_pairs_ngram",
           "simhash_pairs", "embedding_neardup_pairs", "exact_dedup_by_hash"]


# --- exact dedup via content hash ------------------------------------------

def exact_dedup_by_hash(sf_dir: str, *, mode: str = "auto", num_partitions: int = 16):
    """(text_hash, keeper_doc_id, n_copies) — vectorized FNV content hash +
    min-merge; keys stay 8-byte ints instead of full text (shuffle-light).

    The distinct-hash key set is ∝ corpus, so the default merge is the
    hash shuffle (``mode="shuffle"``): per-block partials are co-located by
    key across ``num_partitions`` tasks and never funnel through one task.
    ``mode="tree"`` keeps the combiner cascade for bounded key sets.
    """
    from ..stages.shuffle import resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/documents.parquet")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        h = fnv1a64_arrow(b["text"].combine_chunks() if isinstance(b["text"], pa.ChunkedArray) else b["text"])
        t = pa.table({"text_hash": pa.array(h.astype(np.int64)), "keeper": b["doc_id"]})
        g = t.group_by(["text_hash"]).aggregate([("keeper", "min"), ([], "count_all")])
        return g.rename_columns(["text_hash", "keeper", "n"])

    partial = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    specs = [("keeper", "min"), ("n", "sum")]
    if mode == "shuffle":
        merged = hash_merge(partial, ["text_hash"], specs, num_partitions=num_partitions)
    else:
        merged = tree_merge(partial, ["text_hash"], specs, fanin=8)

    def finalize(b: pa.Table) -> pa.Table:
        return b.rename_columns(["text_hash", "keeper_doc_id", "n_copies"])

    return merged.map_batches(finalize, batch_format="pyarrow", batch_size=None)


# FNV isn't SQL-expressible, but the hash is injective on this corpus, so
# the (keeper, n) multiset equals plain GROUP BY text — exposed WITHOUT the
# hash column for the oracle:

def dedup_exact_hash(sf_dir: str):
    """(keeper_doc_id, n_copies) — byte-exact text dedup by 64-bit FNV with
    min-doc_id keeper (the registry face of ``exact_dedup_by_hash``)."""
    out = exact_dedup_by_hash(sf_dir)
    return out.select_columns(["keeper_doc_id", "n_copies"])


# --- priority-rule exact dedup ----------------------------------------------

_PRI_SHIFT = 40  # packed keep-key = source_rank << 40 | doc_id


def dedup_exact_priority(sf_dir: str, *, mode: str = "auto",
                         num_partitions: int = 16):
    """(keeper_doc_id, keeper_source, n_copies) — exact dedup where the
    SURVIVOR is chosen by source priority (lower ``srcN`` index wins, then
    smallest doc_id), the cross-source crawl-preference rule (e.g. keep
    the curated-source copy over the common-crawl copy).

    Same shuffle-light machinery as ``exact_dedup_by_hash`` — the keep
    rule rides the merge as ONE packed int64 ``(rank << 40) | doc_id``
    min-merged alongside the content hash, so an arbitrary lexicographic
    keep rule costs nothing extra at scale."""
    from ..stages.shuffle import resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/documents.parquet")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def prep(b: pa.Table) -> pa.Table:
        h = fnv1a64_arrow(b["text"].combine_chunks()
                          if isinstance(b["text"], pa.ChunkedArray) else b["text"])
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        rank = np.asarray(
            pc.cast(pc.utf8_slice_codeunits(b["source"], 3, 32), pa.int64()),
            dtype=np.int64)
        if ids.size and (ids.max() >= (1 << _PRI_SHIFT) or ids.min() < 0
                         or rank.max() >= (1 << (62 - _PRI_SHIFT))):
            raise ValueError("dedup_exact_priority: doc_id/rank outside the "
                             "packed keep-key domain")
        t = pa.table({
            "text_hash": pa.array(h.astype(np.int64)),
            "keep_key": pa.array((rank << _PRI_SHIFT) | ids),
        })
        g = t.group_by(["text_hash"]).aggregate(
            [("keep_key", "min"), ([], "count_all")])
        return g.rename_columns(["text_hash", "keep_key", "n"])

    partial = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    specs = [("keep_key", "min"), ("n", "sum")]
    if mode == "shuffle":
        merged = hash_merge(partial, ["text_hash"], specs,
                            num_partitions=num_partitions)
    else:
        merged = tree_merge(partial, ["text_hash"], specs, fanin=8)

    def finalize(b: pa.Table) -> pa.Table:
        kk = np.asarray(b["keep_key"], dtype=np.int64)
        rank = kk >> _PRI_SHIFT
        ids = kk & ((1 << _PRI_SHIFT) - 1)
        src = pa.array(["src" + str(r) for r in rank.tolist()],
                       type=pa.string())
        return pa.table({"keeper_doc_id": pa.array(ids),
                         "keeper_source": src,
                         "n_copies": b["n"].cast(pa.int64())})

    return merged.map_batches(finalize, batch_format="pyarrow", batch_size=None)


DEDUP_EXACT_PRIORITY_SQL = """
SELECT keeper_doc_id, keeper_source, n_copies FROM (
  SELECT doc_id AS keeper_doc_id, source AS keeper_source,
         COUNT(*) OVER (PARTITION BY text) AS n_copies,
         row_number() OVER (PARTITION BY text
                            ORDER BY CAST(substr(source, 4) AS BIGINT),
                                     doc_id) AS rn
  FROM documents)
WHERE rn = 1
ORDER BY keeper_doc_id
"""


DEDUP_EXACT_HASH_SQL = """
SELECT MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY text
ORDER BY keeper_doc_id
"""


# --- normalized exact dedup ---------------------------------------------------

def _normalize_text(col) -> pa.Array:
    """Canonical text form shared with the SQL oracle: every whitespace run
    collapses to one space, then lowercase, then strip leading/trailing
    spaces — ``trim(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ')``.
    Both engines run RE2, so the ``\\s`` class is identical."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    col = pc.replace_substring_regex(col, r"\s+", " ")
    col = pc.utf8_lower(col)
    return pc.utf8_trim(col, " ")


def dedup_exact_normalized(sf_dir: str, *, mode: str = "auto",
                           num_partitions: int = 16):
    """(keeper_doc_id, n_copies) — exact dedup AFTER text canonicalization
    (whitespace collapse + lowercase + trim): catches re-wrapped, re-cased
    and re-indented copies that byte-exact dedup (``dedup_exact_hash``)
    misses — the standard first normalization step of a curation pipeline.

    Scale shape is ``exact_dedup_by_hash`` unchanged: normalization is one
    extra vectorized Arrow kernel per block before the FNV hash, keys stay
    8-byte ints through the size-gated tree/shuffle merge, text never
    shuffles."""
    from ..stages.shuffle import resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/documents.parquet")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        h = fnv1a64_arrow(_normalize_text(b["text"]))
        t = pa.table({"norm_hash": pa.array(h.astype(np.int64)),
                      "keeper": b["doc_id"]})
        g = t.group_by(["norm_hash"]).aggregate(
            [("keeper", "min"), ([], "count_all")])
        return g.rename_columns(["norm_hash", "keeper", "n"])

    partial = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    specs = [("keeper", "min"), ("n", "sum")]
    if mode == "shuffle":
        merged = hash_merge(partial, ["norm_hash"], specs,
                            num_partitions=num_partitions)
    else:
        merged = tree_merge(partial, ["norm_hash"], specs, fanin=8)

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({"keeper_doc_id": b["keeper"], "n_copies": b["n"]})

    return merged.map_batches(finalize, batch_format="pyarrow",
                              batch_size=None)


DEDUP_EXACT_NORMALIZED_SQL = """
SELECT MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY trim(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
ORDER BY keeper_doc_id
"""


# --- MinHash + LSH ----------------------------------------------------------

def _signature_batch_fn(num_perm: int, bands: int, k: int):
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        sig = minhash_signatures(texts, num_perm=num_perm, k=k)
        bk = band_keys(sig, bands=bands)
        n = batch.num_rows
        doc_ids = np.asarray(batch["doc_id"])
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, bands)),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_key": pa.array(bk.reshape(-1).astype(np.int64)),
        })

    return fn


def _bucket_pairs(exploded, keys: list[str], payload_cols: list[str],
                  pair_fn, *, mode: str = "shuffle", num_partitions: int = 16,
                  fanin: int = 4, max_bucket: int = 500):
    """Bucketed pair generation in two scale regimes.

    * ``mode="shuffle"`` (default, the 100-TB path): ONE hash shuffle
      co-locates every row of a bucket key into one of ``num_partitions``
      blocks; each block list-aggregates its (complete) buckets and calls
      ``pair_fn(arrays...) -> pa.Table`` per bucket.  The bucket directory
      is spread across the partitions — no task ever holds it whole.
    * ``mode="tree"``: the combiner cascade (per-block list-agg ->
      explode+re-agg merge levels -> one final block) — cheaper than a
      shuffle while the whole bucket directory fits one task (small
      corpora, bounded key sets).

    Both modes produce identical pair sets: buckets are independent, and
    pair generation sorts within each bucket.
    """
    list_names = [f"{c}_list" for c in payload_cols]

    def collect(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([(c, "list") for c in payload_cols])
        return g.rename_columns(keys + list_names)

    def remerge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        import pyarrow.compute as _pc

        lens = _pc.list_value_length(batch[list_names[0]].combine_chunks())
        flat_cols = {c: batch[f"{c}_list"].combine_chunks().flatten() for c in payload_cols}
        reps = np.asarray(lens, dtype=np.int64)
        key_cols = {kc: pa.array(np.repeat(np.asarray(batch[kc]), reps)) for kc in keys}
        t = pa.table({**key_cols, **{c: flat_cols[c] for c in payload_cols}})
        return collect(t)

    if mode == "shuffle":
        # one hash shuffle: complete buckets per block, then list-agg per block
        merged = hash_partition(exploded, keys, num_partitions).map_batches(
            collect, batch_format="pyarrow", batch_size=None)
    else:
        level0 = exploded.map_batches(collect, batch_format="pyarrow", batch_size=None)
        merged = level0
        if fanin > 1:
            merged = merged.repartition(fanin).map_batches(remerge, batch_format="pyarrow",
                                                           batch_size=None)
        merged = merged.repartition(1).map_batches(remerge, batch_format="pyarrow",
                                                   batch_size=None)

    def gen_pairs(batch: pa.Table) -> pa.Table:
        outs = []
        n_capped = 0
        lists = {c: batch[f"{c}_list"].combine_chunks() for c in payload_cols}
        for i in range(batch.num_rows):
            arrays = [np.asarray(lists[c][i].values) for c in payload_cols]
            size = len(arrays[0])
            if size < 2:
                continue
            if size > max_bucket:
                # mega-bucket (a giant duplicate cluster): all-pairs would be
                # O(size^2) — switch to the pair_fn's BOUNDED mode (O(size)
                # candidates: a star for unfiltered candidate generation, a
                # signature-sorted chain where a distance filter applies).
                # Bounded candidates preserve connectivity for exact-dup
                # clusters; graded near-dup mega-clusters may fragment —
                # recoverable with a union-find / second LSH round at scale.
                # Never a silent drop: the cap is logged.
                n_capped += 1
                order = np.argsort(arrays[0])
                arrays = [a[order] for a in arrays]
                t = pair_fn(*arrays, star=True)
            else:
                t = pair_fn(*arrays)
            if t is not None and t.num_rows:
                outs.append(t)
        if n_capped:
            print(f"[bucket_pairs] {n_capped} mega-buckets (> {max_bucket}) "
                  "reduced to star pairings")
        if not outs:
            return pair_fn(*[np.empty(0, dtype=np.int64) for _ in payload_cols],
                           empty=True)
        return pa.concat_tables(outs)

    return merged.map_batches(gen_pairs, batch_format="pyarrow", batch_size=None)


def minhash_candidate_pairs(sf_dir: str, *, num_perm: int = 64, bands: int = 16,
                            k: int = 3, mode: str = "auto",
                            num_partitions: int = 16):
    """Distinct candidate pairs (doc_a < doc_b) sharing >= 1 LSH bucket."""
    from ..stages.shuffle import resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/documents.parquet")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    exploded = ds.map_batches(_signature_batch_fn(num_perm, bands, k),
                              batch_format="pyarrow", batch_size=None)

    def pair_fn(ids: np.ndarray, *, empty: bool = False, star: bool = False) -> pa.Table:
        if empty or len(ids) < 2:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64())})
        ids = np.sort(ids)
        if star:
            return pa.table({"doc_a": pa.array(np.full(len(ids) - 1, ids[0])),
                             "doc_b": pa.array(ids[1:])})
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"doc_a": pa.array(ids[a]), "doc_b": pa.array(ids[b])})

    pairs = _bucket_pairs(exploded, ["band_id", "band_key"], ["doc_id"], pair_fn,
                          mode=mode, num_partitions=num_partitions)

    # distinct pairs (a pair may share several bands); pair key set ∝
    # dup-rate × corpus, so the default merge is the hash shuffle too
    def distinct(b: pa.Table) -> pa.Table:
        g = b.group_by(["doc_a", "doc_b"]).aggregate([])
        return g.append_column("one", pa.array(np.ones(g.num_rows, dtype=np.int64)))

    dd = pairs.map_batches(distinct, batch_format="pyarrow", batch_size=None)
    if mode == "shuffle":
        merged = hash_merge(dd, ["doc_a", "doc_b"], [("one", "min")],
                            num_partitions=num_partitions)
    else:
        merged = tree_merge(dd, ["doc_a", "doc_b"], [("one", "min")], fanin=4)
    return merged.map_batches(
        lambda b: b.drop_columns(["one"]), batch_format="pyarrow", batch_size=None)


def _blob_views(col) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64, raw uint8) zero-copy views of a binary column."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = np.frombuffer(col.buffers()[1], dtype=np.int32, count=len(col) + 1,
                        offset=col.offset * 4).astype(np.int64)
    raw = (np.frombuffer(col.buffers()[2], dtype=np.uint8)
           if col.buffers()[2] is not None else np.empty(0, dtype=np.uint8))
    return off, raw


def _shingle_blob_batch(batch: pa.Table, k: int) -> pa.Table:
    """(doc_id, shingles: binary) for one batch — per-doc DISTINCT sorted
    shingle hashes serialized as raw little-endian u64 bytes (Arrow's hash
    join rejects list-typed payload columns; binary passes through)."""
    from .. import tune_worker_threads

    tune_worker_threads()
    sh, off = shingle_hashes(batch["text"], k=k)
    n = len(off) - 1
    # per-doc distinct via sort + unique within segments (vectorized:
    # sort (doc, hash) pairs once, then drop equal-neighbor rows)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    order = np.lexsort((sh, doc_of))
    d, h = doc_of[order], sh[order]
    keep = np.ones(len(d), dtype=bool)
    if len(d) > 1:
        keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    d, h = d[keep], h[keep]
    counts = np.bincount(d, minlength=n)
    new_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=new_off[1:])
    blobs = [h[new_off[i]:new_off[i + 1]].tobytes() for i in range(n)]
    return pa.table({"doc_id": batch["doc_id"],
                     "shingles": pa.array(blobs, type=pa.binary())})


def _shingle_set_table(ds, *, k: int) -> "object":
    return ds.map_batches(lambda b: _shingle_blob_batch(b, k),
                          batch_format="pyarrow", batch_size=None)


def _batch_jaccard(len_a: np.ndarray, vals_a: np.ndarray,
                   len_b: np.ndarray, vals_b: np.ndarray,
                   threshold: float) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized exact Jaccard over n pairs of sorted-DISTINCT u64 sets.

    Segment i of ``vals_a``/``vals_b`` (lengths ``len_a[i]``/``len_b[i]``)
    is pair i's two sets.  ONE lexsort over every element in the batch
    replaces the old per-pair Python loop (VERDICT r02 item 3): after
    sorting by (pair, value), an element present on both sides of a pair
    forms an equal-adjacent run of exactly 2 (each side is distinct within
    itself), so intersections fall out of one neighbor compare + bincount.

    Returns ``(keep_mask, jaccard_pct int64)``; ``np.round`` is half-even,
    matching the previous ``round()`` arithmetic bit-for-bit.
    """
    n = len(len_a)
    pid = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), len_a),
                          np.repeat(np.arange(n, dtype=np.int64), len_b)])
    vals = np.concatenate([vals_a, vals_b])
    order = np.lexsort((vals, pid))
    p, v = pid[order], vals[order]
    inter = np.zeros(n, dtype=np.int64)
    if len(p) > 1:
        dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
        if dup.any():
            inter = np.bincount(p[1:][dup], minlength=n).astype(np.int64)
    union = len_a + len_b - inter
    ok = (len_a > 0) & (len_b > 0)
    j = np.zeros(n, dtype=np.float64)
    j[ok] = inter[ok] / union[ok]
    return ok & (j >= threshold), np.round(j * 100).astype(np.int64)


def _blob_segments(off: np.ndarray, raw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lens in u64 elements, contiguous u64 value array) for a blob column
    view — blobs are adjacent in the values buffer, every blob a multiple
    of 8 bytes, so the whole column is one aligned u64 view."""
    lens = ((off[1:] - off[:-1]) // 8).astype(np.int64)
    vals = raw[off[0]:off[-1]].view(np.uint64) if len(off) > 1 else np.empty(0, np.uint64)
    return lens, vals


def _verify_ngram_broadcast(sf_dir: str, pairs_tbl: pa.Table, *, k: int,
                            threshold: float, empty_tbl: pa.Table) -> pa.Table:
    """Small-candidate-count verification (candidate count bounded by the
    broadcast gate): the pair table is tiny and lives on the driver;
    shingle sets for the candidate docs are computed DISTRIBUTED in one
    column-pruned documents pass (the expensive part), collected once
    (bounded: one blob per candidate doc — exactly what the old path also
    held before ``ray.put``), and ONE vectorized Jaccard call finishes
    driver-side.  vs r02: no ``ray.put`` round-trip, no third Ray
    execution over the pair Dataset, no per-pair Python loop (VERDICT r02
    items 3+5)."""
    a_ids_all = np.asarray(pairs_tbl["doc_a"])
    b_ids_all = np.asarray(pairs_tbl["doc_b"])
    if len(a_ids_all) == 0:
        return empty_tbl
    id_arr = pa.array(np.unique(np.concatenate([a_ids_all, b_ids_all])),
                      type=pa.int64())

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def shingle_blobs(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.is_in(batch["doc_id"], value_set=id_arr))
        if sub.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "shingles": pa.array([], type=pa.binary())})
        return _shingle_blob_batch(sub, k)

    small = pa.concat_tables(list(
        docs.map_batches(shingle_blobs, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"doc_id": pa.array([], type=pa.int64()),
                   "shingles": pa.array([], type=pa.binary())})]).combine_chunks()
    if small.num_rows == 0:
        return empty_tbl
    off_s, raw_s = _blob_views(small["shingles"])
    lens, flat = _blob_segments(off_s, raw_s)
    starts = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    sid = np.asarray(small["doc_id"])
    sorter = np.argsort(sid)

    def gather(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # segment-gather each pair side's set into one contiguous array
        pos = sorter[np.minimum(np.searchsorted(sid, ids, sorter=sorter),
                                len(sid) - 1)]
        found = sid[pos] == ids
        l = np.where(found, lens[pos], 0)
        tot = int(l.sum())
        row_of = np.repeat(np.arange(len(pos)), l)
        cum = np.zeros(len(pos) + 1, dtype=np.int64)
        np.cumsum(l, out=cum[1:])
        idx = starts[pos][row_of] + (np.arange(tot, dtype=np.int64) - cum[:-1][row_of])
        return l.astype(np.int64), flat[idx]

    len_a, vals_a = gather(a_ids_all)
    len_b, vals_b = gather(b_ids_all)
    keep, jpct = _batch_jaccard(len_a, vals_a, len_b, vals_b, threshold)
    tbl = pa.table({"doc_a": pa.array(a_ids_all[keep], type=pa.int64()),
                    "doc_b": pa.array(b_ids_all[keep], type=pa.int64()),
                    "jaccard_pct": pa.array(jpct[keep], type=pa.int64())})
    return tbl.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


def verified_pairs_ngram(sf_dir: str, *, threshold: float = 0.5, k: int = 3,
                         num_perm: int = 64, bands: int = 16,
                         mode: str = "auto", num_partitions: int = 8,
                         broadcast_max_cands: int = 10_000):
    """LSH candidates verified by EXACT n-gram (k-token shingle) Jaccard.

    Returns (doc_a, doc_b, jaccard_pct) with jaccard >= threshold, fully
    distributed, in two size regimes (VERDICT r01 item 2 removed the old
    unbounded driver-side verification):

    * **broadcast** (candidate count <= ``broadcast_max_cands``): the
      candidate docs' shingle sets — the SMALL side, bounded by the gate —
      are computed in tasks, collected once and broadcast via ``ray.put``;
      Jaccard then runs as one ``map_batches`` over the candidate-pair
      Dataset (a broadcast hash join, the idiomatic small-side plan).
    * **hash-join** (above the gate): candidate pairs hash-JOIN their two
      shingle sets (semi-join docs to candidate ids first, so shingles are
      only computed for candidate docs), Jaccard per joined row in tasks.
      Driver memory stays O(1) no matter the dup rate.
    """
    from ..stages.shuffle import enable_hash_shuffle

    # candidate pairs are ∝ dup-rate, a tiny fraction of the corpus —
    # materializing avoids re-executing the LSH lineage for each consumer
    # below (they stay distributed blocks in the object store, not driver
    # memory).  enable_hash_shuffle also tunes the JOIN aggregator pools
    # below (joins are hash exchanges regardless of candidate merge mode).
    cands = enable_hash_shuffle(
        minhash_candidate_pairs(sf_dir, num_perm=num_perm, bands=bands, k=k,
                                mode=mode, num_partitions=num_partitions).materialize())

    n_cands = cands.count()
    empty_tbl = pa.table({"doc_a": pa.array([], type=pa.int64()),
                          "doc_b": pa.array([], type=pa.int64()),
                          "jaccard_pct": pa.array([], type=pa.int64())})
    if n_cands == 0:
        return empty_tbl
    if n_cands <= broadcast_max_cands:
        # the pair table is bounded by the gate — collect it once (count is
        # metadata on the materialized blocks, the collect reuses them)
        pairs_tbl = pa.concat_tables(list(
            cands.iter_batches(batch_format="pyarrow", batch_size=None)) or
            [pa.table({"doc_a": pa.array([], type=pa.int64()),
                       "doc_b": pa.array([], type=pa.int64())})])
        return _verify_ngram_broadcast(sf_dir, pairs_tbl, k=k,
                                       threshold=threshold, empty_tbl=empty_tbl)

    # needed doc ids = both pair sides, emitted in ONE pass (block-local
    # dedup only — left_semi tolerates duplicate right keys, so no global
    # distinct shuffle is needed)
    def both_ids(b: pa.Table) -> pa.Table:
        a = b["doc_a"].combine_chunks() if isinstance(b["doc_a"], pa.ChunkedArray) else b["doc_a"]
        bb = b["doc_b"].combine_chunks() if isinstance(b["doc_b"], pa.ChunkedArray) else b["doc_b"]
        u = pc.unique(pa.concat_arrays([a, bb]))
        return pa.table({"doc_id": u})

    need = cands.map_batches(both_ids, batch_format="pyarrow", batch_size=None)

    docs = enable_hash_shuffle(read_table(sf_dir, "documents", columns=["doc_id", "text"]))
    cand_docs = docs.join(need, "left_semi", num_partitions, on=("doc_id",))
    shingles = _shingle_set_table(cand_docs, k=k)

    joined = cands.join(shingles, "inner", num_partitions,
                        on=("doc_a",), right_on=("doc_id",), right_suffix="_a")
    joined = joined.join(shingles, "inner", num_partitions,
                         on=("doc_b",), right_on=("doc_id",), right_suffix="_b")

    def jaccard(batch: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        if batch.num_rows == 0:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "jaccard_pct": pa.array([], type=pa.int64())})
        name_a = "shingles" if "shingles" in batch.column_names else "shingles_a"
        off_a, raw_a = _blob_views(batch[name_a])
        off_b, raw_b = _blob_views(batch["shingles_b"])
        # zero-copy u64 views over the WHOLE blob columns (blobs are
        # adjacent, 8-byte-multiple sized) -> one vectorized kernel call
        # per batch instead of a Python loop per pair (VERDICT r02 item 3)
        len_a, vals_a = _blob_segments(off_a, raw_a)
        len_b, vals_b = _blob_segments(off_b, raw_b)
        keep, jpct = _batch_jaccard(len_a, vals_a, len_b, vals_b, threshold)
        a_ids = np.asarray(batch["doc_a"])
        b_ids = np.asarray(batch["doc_b"])
        return pa.table({"doc_a": pa.array(a_ids[keep], type=pa.int64()),
                         "doc_b": pa.array(b_ids[keep], type=pa.int64()),
                         "jaccard_pct": pa.array(jpct[keep], type=pa.int64())})

    verified = joined.map_batches(jaccard, batch_format="pyarrow", batch_size=None)
    # final pair list is small: one typed table, deterministically ordered
    tbl = pa.concat_tables(
        [b for b in verified.iter_batches(batch_format="pyarrow", batch_size=None)] or
        [pa.table({"doc_a": pa.array([], type=pa.int64()),
                   "doc_b": pa.array([], type=pa.int64()),
                   "jaccard_pct": pa.array([], type=pa.int64())})])
    return tbl.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


# --- SimHash ---------------------------------------------------------------

def simhash_pairs(sf_dir: str, *, max_hamming: int = 3, mode: str = "auto",
                  num_partitions: int = 16):
    """Near-dup pairs by 64-bit SimHash, Hamming <= max_hamming.

    Banding: 4 chunks of 16 bits — any pair within distance 3 collides on
    at least one chunk (pigeonhole).  Verification popcounts the full sig.
    """
    from ..stages.shuffle import resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/documents.parquet")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sig_fn(batch: pa.Table) -> pa.Table:
        sig = simhash_signatures(batch["text"])
        n = batch.num_rows
        doc_ids = np.asarray(batch["doc_id"])
        chunks = np.empty((n, 4), dtype=np.int64)
        for c in range(4):
            chunks[:, c] = ((sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, 4)),
            "chunk_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
            "chunk_val": pa.array(chunks.reshape(-1)),
            "sig": pa.array(np.repeat(sig.astype(np.int64), 4)),
        })

    exploded = ds.map_batches(sig_fn, batch_format="pyarrow", batch_size=None)

    def pair_fn(ids: np.ndarray, sigs: np.ndarray, *, empty: bool = False,
                star: bool = False) -> pa.Table:
        if empty or len(ids) < 2:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        o = np.argsort(ids)
        ids, sigs = np.asarray(ids)[o], np.asarray(sigs, dtype=np.int64)[o].astype(np.uint64)
        if star:
            # distance-filtered bounded mode: chain members sorted by
            # SIGNATURE so near-identical signatures are adjacent — a min-star
            # would be filtered apart by the hamming threshold
            so = np.argsort(sigs, kind="stable")
            ids, sigs = ids[so], sigs[so]
            a = np.arange(0, len(ids) - 1, dtype=np.int64)
            b = a + 1
        else:
            a, b = np.triu_indices(len(ids), k=1)
        d = np.asarray(hamming_distance_u64(sigs[a], sigs[b]), dtype=np.int64)
        keep = d <= max_hamming
        return pa.table({"doc_a": pa.array(ids[a][keep]),
                         "doc_b": pa.array(ids[b][keep]),
                         "hamming": pa.array(d[keep])})

    pairs = _bucket_pairs(exploded, ["chunk_id", "chunk_val"],
                          ["doc_id", "sig"], pair_fn,
                          mode=mode, num_partitions=num_partitions)
    if mode == "shuffle":
        merged = hash_merge(pairs, ["doc_a", "doc_b"], [("hamming", "min")],
                            num_partitions=num_partitions)
    else:
        merged = tree_merge(pairs, ["doc_a", "doc_b"], [("hamming", "min")], fanin=4)
    return merged


# --- embedding cosine near-dup ---------------------------------------------

def embedding_neardup_pairs_ds(sf_dir: str, *, threshold: float = 0.40,
                               num_partitions: int = 8, tile: int = 2048,
                               max_cell: int = 100_000, ds=None):
    """Dataset-returning variant of ``embedding_neardup_pairs`` — the pair
    list stays distributed (ADVICE r02: consumers that only need blocks,
    like the clustering propagation, must not funnel O(edges) through the
    driver).

    The label column is the coarse quantizer (IVF cell): only same-cell
    pairs are compared.  Cells are co-located with ONE hash shuffle (no
    sort-based groupby); inside a cell the matmul is TILED (``tile`` query
    rows at a time against the cell matrix) so peak memory is
    O(tile × cell) instead of O(cell²).  Compute is still O(cell²) per
    cell — at production scale the quantizer (a sampled k-means) is sized
    so cells stay under ``max_cell``; cells above it are processed anyway
    but logged, mirroring the LSH mega-bucket policy (never a silent drop).
    """
    # ds override: callers that PRODUCE (vec_id, embedding, label) upstream
    # (e.g. the text->hashvec->LSH-cell composition) reuse this kernel
    if ds is None:
        ds = read_table(sf_dir, "embeddings",
                        columns=["vec_id", "embedding", "label"])
    part = hash_partition(ds, ["label"], num_partitions)

    def pairs_in_block(batch: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        empty = pa.table({"vec_a": pa.array([], type=pa.int64()),
                          "vec_b": pa.array([], type=pa.int64()),
                          "cos_pct": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        labels = np.asarray(batch["label"])
        ids_all = np.asarray(batch["vec_id"])
        emb = batch["embedding"].combine_chunks()
        dim = len(emb[0]) if batch.num_rows else 0
        flat = np.asarray(emb.flatten(), dtype=np.float64).reshape(-1, dim)
        norms = np.linalg.norm(flat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        flat = flat / norms
        outs = [empty]

        def emit_all_pairs(ids: np.ndarray, mat: np.ndarray) -> None:
            n = len(ids)
            for i0 in range(0, n, tile):
                i1 = min(i0 + tile, n)
                cos = mat[i0:i1] @ mat.T  # (tile, n)
                a_rel, b = np.nonzero(cos >= threshold)
                a = a_rel + i0
                keep = b > a  # upper triangle only
                if not keep.any():
                    continue
                a, b = a[keep], b[keep]
                outs.append(pa.table({
                    "vec_a": pa.array(ids[a].astype(np.int64)),
                    "vec_b": pa.array(ids[b].astype(np.int64)),
                    "cos_pct": pa.array(np.floor(cos[a - i0, b] * 1000).astype(np.int64)),
                }))

        def emit_chain_pairs(ids: np.ndarray, mat: np.ndarray) -> None:
            # O(n) bounded degradation for a subcell of (near-)identical
            # vectors: adjacent id-sorted pairs — preserves connectivity
            # for clustering, same policy as the LSH mega-bucket chain
            cos = np.einsum("ij,ij->i", mat[:-1], mat[1:])
            keep = cos >= threshold
            if keep.any():
                outs.append(pa.table({
                    "vec_a": pa.array(ids[:-1][keep].astype(np.int64)),
                    "vec_b": pa.array(ids[1:][keep].astype(np.int64)),
                    "cos_pct": pa.array(np.floor(cos[keep] * 1000).astype(np.int64)),
                }))

        for lbl in np.unique(labels):
            sel = np.nonzero(labels == lbl)[0]
            ids = ids_all[sel]
            o = np.argsort(ids)
            ids = ids[o]
            mat = flat[sel[o]]
            n = len(ids)
            if n < 2:
                continue
            if n <= max_cell:
                emit_all_pairs(ids, mat)
                continue
            # mega-cell fallback (VERDICT r02 item 10): sub-split by a
            # deterministic hyperplane-LSH signature with enough bits that
            # the EXPECTED subcell is under max_cell; only same-signature
            # members are all-pairs compared, so a pathological cell can no
            # longer dominate a run with O(n²) compute.  Near-identical
            # vectors share signatures w.h.p. so dup clusters stay intact;
            # graded near-dups across signature boundaries may be missed —
            # approximate-by-construction, logged, never silently dropped.
            nbits = max(1, int(np.ceil(np.log2(n / max_cell))) + 1)
            print(f"[embed_neardup] cell {lbl!r} has {n} vectors "
                  f"(> {max_cell}); sub-splitting by {nbits}-bit hyperplane LSH")
            rng = np.random.default_rng(0xC0FFEE)  # deterministic planes
            planes = rng.standard_normal((mat.shape[1], nbits))
            sig = (mat @ planes > 0) @ (np.int64(1) << np.arange(nbits, dtype=np.int64))
            o2 = np.lexsort((ids, sig))
            sig_s, ids_s, mat_s = sig[o2], ids[o2], mat[o2]
            bounds = np.nonzero(np.diff(sig_s))[0] + 1
            for lo, hi in zip(np.r_[0, bounds], np.r_[bounds, n]):
                if hi - lo < 2:
                    continue
                if hi - lo <= max_cell:
                    emit_all_pairs(ids_s[lo:hi], mat_s[lo:hi])
                else:  # identical-signature mass (e.g. exact dup flood)
                    emit_chain_pairs(ids_s[lo:hi], mat_s[lo:hi])
        return pa.concat_tables(outs)

    return part.map_batches(pairs_in_block, batch_format="pyarrow", batch_size=None)


def embedding_neardup_pairs(sf_dir: str, *, threshold: float = 0.40,
                            num_partitions: int = 8, tile: int = 2048,
                            max_cell: int = 100_000):
    """Table-returning form: the verified pair list is small relative to
    the corpus — collect to one typed, deterministically ordered Table."""
    out = embedding_neardup_pairs_ds(sf_dir, threshold=threshold,
                                     num_partitions=num_partitions, tile=tile,
                                     max_cell=max_cell)
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow", batch_size=None)] or
        [pa.table({"vec_a": pa.array([], type=pa.int64()),
                   "vec_b": pa.array([], type=pa.int64()),
                   "cos_pct": pa.array([], type=pa.int64())})])
    return tbl.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])


EMBED_NEARDUP_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(FLOOR(list_cosine_similarity(a.embedding, b.embedding) * 1000) AS BIGINT) AS cos_pct
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.40
ORDER BY vec_a, vec_b
"""


# --- connected components over the near-dup pair graph ---------------------

def _union_find_clusters(pairs: pa.Table) -> pa.Table:
    """Small-graph fast path: classic union-find over a BOUNDED pair list
    (gated by the caller), min-id canonical labels."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["vec_a"].to_pylist(), pairs["vec_b"].to_pylist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:  # union by min id keeps labels canonical
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    items = sorted((n, find(n)) for n in parent)
    return pa.table({"vec_id": pa.array([n for n, _ in items], type=pa.int64()),
                     "cluster_id": pa.array([c for _, c in items], type=pa.int64())})


def neardup_clusters(sf_dir: str, *, threshold: float = 0.40,
                     num_partitions: int = 8, max_rounds: int = 50,
                     small_graph_max_pairs: int = 100_000, pairs_ds=None):
    """(vec_id, cluster_id) — connected components of the embedding
    near-dup graph; cluster_id = min vec_id reachable (the canonical
    keeper).

    Two size regimes (same planner pattern as the n-gram verification):
    below ``small_graph_max_pairs`` the bounded pair list runs through a
    driver union-find; above it, distributed min-label propagation — each
    round joins the edge list against the current labels and hash-merges
    the min per node, O(cluster diameter) rounds of bounded shuffles.
    Near-dup clusters have tiny diameters, so rounds stay single-digit.
    """
    from ..stages.shuffle import enable_hash_shuffle, hash_merge

    # the pair list stays a Dataset end-to-end (ADVICE r02): the regime is
    # gated on count() over the materialized blocks, and the big-graph
    # branch derives edges/labels with map_batches — driver memory is O(1)
    # there no matter the edge count
    # pairs_ds override: compositions that PRODUCE the pair graph upstream
    # (e.g. the raw-text semantic path) reuse both size regimes
    if pairs_ds is None:
        pairs_ds = embedding_neardup_pairs_ds(sf_dir, threshold=threshold)
    pairs_ds = enable_hash_shuffle(pairs_ds.materialize())
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return pa.table({"vec_id": pa.array([], type=pa.int64()),
                         "cluster_id": pa.array([], type=pa.int64())})
    if n_pairs <= small_graph_max_pairs:
        # bounded by the gate — the union-find path may collect the table
        pairs = pa.concat_tables(list(
            pairs_ds.iter_batches(batch_format="pyarrow", batch_size=None)))
        return _union_find_clusters(pairs)

    # undirected edge list, both directions — built block-wise in tasks
    def as_edges(b: pa.Table) -> pa.Table:
        va = b["vec_a"].combine_chunks() if isinstance(b["vec_a"], pa.ChunkedArray) else b["vec_a"]
        vb = b["vec_b"].combine_chunks() if isinstance(b["vec_b"], pa.ChunkedArray) else b["vec_b"]
        return pa.table({"src": pa.concat_arrays([va, vb]),
                         "dst": pa.concat_arrays([vb, va])})

    edges = pairs_ds.map_batches(as_edges, batch_format="pyarrow",
                                 batch_size=None).materialize()

    # initial labels: per-block distinct nodes -> one hash_merge dedup
    def node_partial(b: pa.Table) -> pa.Table:
        u = pc.unique(b["src"].combine_chunks() if isinstance(b["src"], pa.ChunkedArray) else b["src"])
        return pa.table({"node": u, "label": u})

    labels = hash_merge(edges.map_batches(node_partial, batch_format="pyarrow",
                                          batch_size=None),
                        ["node"], [("label", "min")],
                        num_partitions=num_partitions).materialize()

    # one propagation round = ONE co-locating hash exchange: edge rows
    # (key=src, dst) and label rows (key=node, label) are unioned into a
    # mixed relation, hash-partitioned by key, and each block joins its
    # (complete) key groups with one vectorized searchsorted lookup.  This
    # deliberately avoids Ray's JoinOperator: on sparse graphs its
    # per-partition acero join crashes when a partition receives only
    # schemaless empty shuffle blocks, and the lookup needs no suffixes.
    def edge_rows(b: pa.Table) -> pa.Table:
        return pa.table({"key": b["src"], "dst": b["dst"],
                         "label": pa.nulls(b.num_rows, pa.int64())})

    def label_rows(b: pa.Table) -> pa.Table:
        return pa.table({"key": b["node"], "dst": pa.nulls(b.num_rows, pa.int64()),
                         "label": b["label"]})

    def local_prop(b: pa.Table) -> pa.Table:
        is_label = pc.is_valid(b["label"])
        lab = b.filter(is_label)
        edg = b.filter(pc.invert(is_label))
        if lab.num_rows == 0 or edg.num_rows == 0:
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "label": pa.array([], type=pa.int64())})
        keys = np.asarray(lab["key"])
        labs = np.asarray(lab["label"])
        order = np.argsort(keys)
        keys, labs = keys[order], labs[order]
        ek = np.asarray(edg["key"])
        pos = np.minimum(np.searchsorted(keys, ek), len(keys) - 1)
        found = keys[pos] == ek  # every edge key has its label co-located
        return pa.table({"node": pa.array(np.asarray(edg["dst"])[found]),
                         "label": pa.array(labs[pos[found]])})

    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        mixed = edges.map_batches(edge_rows, batch_format="pyarrow",
                                  batch_size=None).union(
            labels.map_batches(label_rows, batch_format="pyarrow", batch_size=None))
        cand = hash_partition(mixed, ["key"], num_partitions).map_batches(
            local_prop, batch_format="pyarrow", batch_size=None)
        new_labels = hash_merge(cand.union(labels), ["node"], [("label", "min")],
                                num_partitions=num_partitions).materialize()
        # convergence: sum of labels strictly decreases until fixpoint
        # (prev_sum carried forward — one distributed pass per round, not two)
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    out = pa.concat_tables(list(labels.map_batches(
        lambda b: pa.table({"vec_id": b["node"], "cluster_id": b["label"]}),
        batch_format="pyarrow", batch_size=None,
    ).iter_batches(batch_format="pyarrow", batch_size=None)))
    return out.sort_by([("vec_id", "ascending")])


# --- keep-one dedup: the corpus AFTER near-dup removal ---------------------

def _key_filter_survivors(corpus, keys_ds_or_tbl, key: str, payload: str,
                          payload_type, *, keep_present: bool,
                          broadcast_max_keys: int,
                          num_partitions: int) -> pa.Table:
    """Filter ``corpus`` by membership of ``key`` in a key set — the shared
    keep-one tail of the dedup pipelines, in both polarities
    (``keep_present=False`` = anti / drop-set, ``True`` = semi /
    survivor-set).  Below ``broadcast_max_keys`` the key set broadcasts
    (``ray.put`` once, one corpus pass); above it the same filter runs per
    hash partition (key-co-located union of corpus + key rows), so a
    corpus-sized key set never funnels through the driver or every task
    closure.  Returns the (key, payload) result table sorted by key.
    """
    import ray.data as rd

    from ..stages.join import broadcast_join

    keys_ds = (rd.from_arrow(keys_ds_or_tbl)
               if isinstance(keys_ds_or_tbl, pa.Table) else keys_ds_or_tbl)
    keys_ds = keys_ds.materialize()
    n_keys = keys_ds.count()

    if n_keys <= broadcast_max_keys:
        keys_tbl = pa.concat_tables(
            list(keys_ds.iter_batches(batch_format="pyarrow",
                                      batch_size=None)) or
            [pa.table({key: pa.array([], type=pa.int64())})])
        out = broadcast_join(corpus, keys_tbl.select([key]), key,
                             join_type="left semi" if keep_present
                             else "left anti")
    else:  # corpus-sized key set: co-locate by key instead of broadcasting

        def mark(role: int):
            def f(b: pa.Table) -> pa.Table:
                return pa.table({
                    key: b[key],
                    payload: (b[payload] if role == 0
                              else pa.nulls(b.num_rows, payload_type)),
                    "is_key": pa.array(np.full(b.num_rows, role, dtype=np.int8)),
                })
            return f

        mixed = corpus.map_batches(mark(0), batch_format="pyarrow",
                                   batch_size=None).union(
            keys_ds.map_batches(mark(1), batch_format="pyarrow",
                                batch_size=None))

        def part_filter(b: pa.Table) -> pa.Table:
            keyset = pc.unique(b.filter(pc.equal(b["is_key"], 1))[key])
            keep = b.filter(pc.equal(b["is_key"], 0))
            mask = pc.is_in(keep[key], value_set=keyset)
            if not keep_present:
                mask = pc.invert(mask)
            keep = keep.filter(mask)
            return pa.table({key: keep[key], payload: keep[payload]})

        out = hash_partition(mixed, [key], num_partitions).map_batches(
            part_filter, batch_format="pyarrow", batch_size=None)

    tbl = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({key: pa.array([], type=pa.int64()),
                   payload: pa.array([], type=payload_type)})])
    return tbl.select([key, payload]).sort_by([(key, "ascending")])


def _anti_join_survivors(corpus, drop: pa.Table, key: str, payload: str,
                         payload_type, *, broadcast_max_drop: int,
                         num_partitions: int) -> pa.Table:
    """``corpus`` minus rows whose ``key`` appears in ``drop`` (see
    ``_key_filter_survivors``)."""
    return _key_filter_survivors(corpus, drop, key, payload, payload_type,
                                 keep_present=False,
                                 broadcast_max_keys=broadcast_max_drop,
                                 num_partitions=num_partitions)


def embed_dedup_survivors(sf_dir: str, *, threshold: float = 0.40,
                          num_partitions: int = 8,
                          broadcast_max_drop: int = 5_000_000):
    """(vec_id, label) — the deduplicated corpus: every vector except
    non-representative members of a near-dup cluster (the min-id member
    survives).  This is the canonical end-to-end training-data dedup
    output: cluster the near-dup graph, then a shuffle-free anti-join of
    the full corpus against the (small) drop set.

    Scale shape: the drop set is bounded by the number of nodes that
    appear in any near-dup pair — tiny relative to a 100 TB corpus — so it
    is broadcast; past ``broadcast_max_drop`` the key-co-located regime of
    ``_anti_join_survivors`` takes over.  The corpus pass reads only the
    two output columns.
    """
    clusters = neardup_clusters(sf_dir, threshold=threshold,
                                num_partitions=num_partitions)
    drop = clusters.filter(pc.less(clusters["cluster_id"], clusters["vec_id"]))
    drop = pa.table({"vec_id": drop["vec_id"]})

    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "label"])
    sch = corpus.schema()  # ray Schema: parallel .names / .types (Arrow types)
    label_type = dict(zip(sch.names, sch.types))["label"]
    return _anti_join_survivors(corpus, drop, "vec_id", "label", label_type,
                                broadcast_max_drop=broadcast_max_drop,
                                num_partitions=num_partitions)


def dedup_minhash_survivors(sf_dir: str, *, threshold: float = 0.5, k: int = 3,
                            num_partitions: int = 8,
                            broadcast_max_drop: int = 5_000_000):
    """(doc_id, source) — the TEXT corpus after fuzzy (MinHash-LSH +
    exact-n-gram-verified) near-dup removal: connected components over the
    verified pair graph, min-doc_id representative survives, everything
    else in its cluster is dropped.  The RefinedWeb/CCNet fuzzy-dedup
    keep-one output, end-to-end — LSH candidates -> exact Jaccard verify
    -> union-find -> anti-join — all on the distributed primitives the
    individual operators already proved out.

    Scale shape: verified pairs are ∝ true dup rate (bounded, from
    ``verified_pairs_ngram``'s dual-regime verification); clustering a
    pair list this size is the union-find fast path (the distributed
    min-label propagation in ``neardup_clusters`` is the >100k-pair
    regime); the survivors pass is the shared broadcast/co-located
    anti-join — the corpus text itself never shuffles.
    """
    pairs = verified_pairs_ngram(sf_dir, threshold=threshold, k=k,
                                 num_partitions=num_partitions)
    pairs = pairs.rename_columns(["vec_a", "vec_b", "jaccard_pct"])
    clusters = _union_find_clusters(pairs)
    drop = clusters.filter(pc.less(clusters["cluster_id"], clusters["vec_id"]))
    drop = pa.table({"doc_id": drop["vec_id"]})

    corpus = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return _anti_join_survivors(corpus, drop, "doc_id", "source", pa.string(),
                                broadcast_max_drop=broadcast_max_drop,
                                num_partitions=num_partitions)


def dedup_simhash_survivors(sf_dir: str, *, max_hamming: int = 3,
                            num_partitions: int = 16,
                            broadcast_max_drop: int = 5_000_000):
    """(doc_id, source) — the TEXT corpus after SimHash near-dup removal:
    completes the keep-one survivor trio next to ``dedup_minhash_survivors``
    (lexical Jaccard) and ``doc_semantic_survivors`` (embedding cosine).

    Banded 64-bit SimHash pairs (Hamming <= ``max_hamming``, pigeonhole
    over 4x16-bit chunks) -> connected components through the shared
    size-gated regime (driver union-find below 100k pairs, distributed
    min-label propagation above) -> min-doc_id representative survives via
    the shared broadcast/co-located anti-join.  The corpus text never
    shuffles: signatures ride the bucket exchange as compact int64 rows,
    the drop set is dup-rate-∝, and the survivors pass reads only the two
    output columns.
    """
    pairs = simhash_pairs(sf_dir, max_hamming=max_hamming,
                          num_partitions=num_partitions)
    pairs = pairs.map_batches(
        lambda b: pa.table({"vec_a": b["doc_a"], "vec_b": b["doc_b"]}),
        batch_format="pyarrow", batch_size=None)
    clusters = neardup_clusters(sf_dir, num_partitions=num_partitions,
                                pairs_ds=pairs)
    drop = clusters.filter(pc.less(clusters["cluster_id"], clusters["vec_id"]))
    drop = pa.table({"doc_id": drop["vec_id"]})
    corpus = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return _anti_join_survivors(corpus, drop, "doc_id", "source", pa.string(),
                                broadcast_max_drop=broadcast_max_drop,
                                num_partitions=num_partitions)


# --- incremental dedup against a prior corpus snapshot ----------------------

def dedup_incremental(sf_dir: str, *, mode: str = "auto",
                      num_partitions: int | None = None,
                      broadcast_max_keep: int = 5_000_000):
    """(doc_id, source) — the crawl-update case: docs of the NEW batch
    (odd doc_ids here; in production, the fresh crawl) that survive exact
    dedup against BOTH the prior corpus snapshot (even doc_ids / the
    existing index) and the new batch itself (min doc_id keeps).  The
    reference's "shared mutable index" problem (SURVEY §2.3 ST2)
    re-expressed as data: the prior index is just another Dataset of
    compact (hash, origin) rows, co-located with the new batch's rows by
    ONE hash exchange — no actor holds the index, no index is broadcast.

    Scale shape: both sides emit compact (text_hash, rank) int64 rows
    (text never shuffles); one exchange by hash; a partition-local lexsort
    decides survival (any prior-side row kills every new-side row of that
    hash; otherwise the minimum new rank survives).  The prior side reads
    ONLY its hash column's worth of data.
    """
    from ..stages.shuffle import input_size_bytes, resolve_mode
    from .streaming import auto_shard_count

    path = f"{sf_dir}/documents.parquet"
    mode = resolve_mode(mode, path)
    if num_partitions is None:
        num_partitions = auto_shard_count(input_size_bytes(path))
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def compact(b: pa.Table) -> pa.Table:
        h = fnv1a64_arrow(b["text"].combine_chunks()
                          if isinstance(b["text"], pa.ChunkedArray)
                          else b["text"])
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        # prior snapshot rows get rank -1: they dominate every new row
        rank = np.where(ids % 2 == 0, np.int64(-1), ids)
        return pa.table({"h": pa.array(h.astype(np.int64)),
                         "rank": pa.array(rank)})

    def survivors(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64())})
        h = np.asarray(b["h"], dtype=np.int64)
        r = np.asarray(b["rank"], dtype=np.int64)
        order = np.lexsort((r, h))
        h_s, r_s = h[order], r[order]
        first = np.ones(len(h_s), dtype=bool)
        first[1:] = h_s[1:] != h_s[:-1]
        win = r_s[first]                       # min rank per hash
        return pa.table({"doc_id": pa.array(win[win >= 0])})

    rows = docs.map_batches(compact, batch_format="pyarrow", batch_size=None)
    if mode == "shuffle":
        rows = hash_partition(rows, ["h"], num_partitions)
    else:
        rows = rows.repartition(1)
    keep = rows.map_batches(survivors, batch_format="pyarrow",
                            batch_size=None)
    # survivor ids are ∝ the NEW batch: broadcast below the gate, else the
    # doc_id-co-located regime (a 10 TB crawl update never funnels through
    # the driver)
    corpus = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return _key_filter_survivors(corpus, keep, "doc_id", "source",
                                 pa.string(), keep_present=True,
                                 broadcast_max_keys=broadcast_max_keep,
                                 num_partitions=num_partitions)


DEDUP_INCREMENTAL_SQL = """
SELECT d.doc_id, d.source
FROM documents d
WHERE d.doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM documents p
                  WHERE p.doc_id % 2 = 0 AND p.text = d.text)
  AND NOT EXISTS (SELECT 1 FROM documents n
                  WHERE n.doc_id % 2 = 1 AND n.text = d.text
                    AND n.doc_id < d.doc_id)
ORDER BY d.doc_id
"""


# --- passage-level exact dedup (ExactSubstr/CCNet-shaped) ------------------

# rank = doc_id << _PID_BITS | pid: a single int64 orders passages by
# (doc_id, pid), so "first occurrence in the corpus" is a plain MIN.
# Documented bound: < 2^20 passages per doc (8.4M words at window 8) and
# doc_id < 2^43 — both far above any web-page corpus row.
_PID_BITS = 20


def _passage_arrays(b: pa.Table, window: int):
    """Vectorized passage extraction for one batch: returns
    ``(npass, pid, passages)`` where ``passages`` is an Arrow string array
    of every consecutive ``window``-word slice of each doc (last slice may
    be shorter), joined by ' ', in (doc, pid) order.

    Shape: one ``split_pattern`` + one ListArray rebuild over the SAME
    flat word values with finer offsets (a cut every ``window`` words) +
    one ``binary_join`` — no Python loop, no per-passage allocation until
    the join kernel itself.
    """
    from .. import tune_worker_threads

    tune_worker_threads()
    words = pc.split_pattern(b["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    # offsets index into words.values directly (slice-adjusted by Arrow)
    doc_off = np.asarray(words.offsets, dtype=np.int64)
    nw = np.diff(doc_off)                       # >= 1: split of "" is ['']
    npass = (nw + window - 1) // window
    total = int(npass.sum())
    first_of_doc = np.cumsum(npass) - npass
    pid = np.arange(total, dtype=np.int64) - np.repeat(first_of_doc, npass)
    starts = np.repeat(doc_off[:-1], npass) + pid * window
    offsets = np.append(starts, doc_off[-1])
    plist = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                     words.values)
    return npass, pid, pc.binary_join(plist, " ")


def _rebuild_clean_docs(b: pa.Table, drop_sorted: np.ndarray,
                        window: int) -> pa.Table:
    """Reconstruct each doc of ``b`` without its dropped passages.
    ``drop_sorted`` = sorted int64 ranks of passages to remove (for this
    batch's docs at least — extra ranks are harmless)."""
    ids = np.asarray(b["doc_id"], dtype=np.int64)
    npass, pid, passages = _passage_arrays(b, window)
    rank = (np.repeat(ids, npass) << _PID_BITS) | pid
    idx = np.searchsorted(drop_sorted, rank)
    np.minimum(idx, max(len(drop_sorted) - 1, 0), out=idx)
    is_drop = ((drop_sorted[idx] == rank) if len(drop_sorted)
               else np.zeros(len(rank), dtype=bool))
    keep = ~is_drop
    # segments are non-empty (npass >= 1 per doc), so reduceat is safe here
    first_of_doc = np.cumsum(npass) - npass
    n_kept = np.add.reduceat(keep.astype(np.int64), first_of_doc)
    kept = passages.filter(pa.array(keep))
    off = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(n_kept, out=off[1:])
    clean = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(off, type=pa.int32()),
                                 kept.combine_chunks()
                                 if isinstance(kept, pa.ChunkedArray) else kept),
        " ")
    return pa.table({
        "doc_id": pa.array(ids),
        "n_passages": pa.array(npass),
        "n_dropped": pa.array(npass - n_kept),
        "clean_text": clean,
    })


def doc_passage_dedup(sf_dir: str, *, window: int = 8,
                      num_partitions: int | None = None,
                      broadcast_max_drop: int = 5_000_000):
    """(doc_id, n_passages, n_dropped, clean_text) — passage-level exact
    dedup with text reconstruction: each doc is cut into consecutive
    ``window``-word passages; a passage that already occurred earlier in
    the corpus (smaller (doc_id, pid)) is removed, and the doc's text is
    rebuilt from the surviving passages.  The ExactSubstr/CCNet-style
    answer to boilerplate that repeats ACROSS documents, where whole-doc
    exact dedup (``dedup_exact_hash``) sees nothing.

    Scale shape: pass 1 emits compact (hash, rank) int64 rows — text
    never shuffles; ONE hash exchange by passage hash co-locates each
    hash's occurrences, so the non-winners fall out of a partition-local
    sort; the dropped-rank set (∝ duplicated passages only) is broadcast
    (``ray.put`` once) into a second corpus pass that rebuilds the text —
    or, degenerate corpora past ``broadcast_max_drop``, co-located with
    the docs by a doc_id hash exchange instead.  Passage equality is by
    64-bit FNV (injective on any real corpus slice; same contract as
    ``dedup_exact_hash``).
    """
    if num_partitions is None:  # size partitions to the input, not a constant
        from ..stages.shuffle import input_size_bytes
        from .streaming import auto_shard_count

        num_partitions = auto_shard_count(
            input_size_bytes(f"{sf_dir}/documents.parquet"))
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def compact(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        npass, pid, passages = _passage_arrays(b, window)
        h = fnv1a64_arrow(passages)
        rank = (np.repeat(ids, npass) << _PID_BITS) | pid
        return pa.table({"h": pa.array(h.astype(np.int64)),
                         "rank": pa.array(rank)})

    def dropped_in_partition(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"rank": pa.array([], type=pa.int64())})
        h = np.asarray(b["h"], dtype=np.int64)
        r = np.asarray(b["rank"], dtype=np.int64)
        order = np.lexsort((r, h))
        h_s, r_s = h[order], r[order]
        first = np.ones(len(h_s), dtype=bool)
        first[1:] = h_s[1:] != h_s[:-1]
        return pa.table({"rank": pa.array(r_s[~first])})

    rows = docs.map_batches(compact, batch_format="pyarrow", batch_size=None)
    dropped = hash_partition(rows, ["h"], num_partitions).map_batches(
        dropped_in_partition, batch_format="pyarrow", batch_size=None)
    dropped = dropped.materialize()
    n_drop = dropped.count()

    if n_drop <= broadcast_max_drop:
        import ray

        drop_tbl = pa.concat_tables(
            list(dropped.iter_batches(batch_format="pyarrow", batch_size=None))
            or [pa.table({"rank": pa.array([], type=pa.int64())})])
        ref = ray.put(np.sort(np.asarray(drop_tbl["rank"], dtype=np.int64)))

        def rebuild(b: pa.Table) -> pa.Table:
            return _rebuild_clean_docs(b, ray.get(ref), window)

        out = docs.map_batches(rebuild, batch_format="pyarrow", batch_size=None)
    else:  # degenerate corpus: co-locate docs with their dropped ranks
        import ray.data as rd

        def mark_docs(b: pa.Table) -> pa.Table:
            return pa.table({"doc_id": b["doc_id"], "text": b["text"],
                             "rank": pa.nulls(b.num_rows, pa.int64())})

        def mark_drop(b: pa.Table) -> pa.Table:
            r = np.asarray(b["rank"], dtype=np.int64)
            return pa.table({"doc_id": pa.array(r >> _PID_BITS),
                             "text": pa.nulls(b.num_rows, pa.string()),
                             "rank": b["rank"]})

        mixed = docs.map_batches(mark_docs, batch_format="pyarrow",
                                 batch_size=None).union(
            dropped.map_batches(mark_drop, batch_format="pyarrow",
                                batch_size=None))

        def rebuild_part(b: pa.Table) -> pa.Table:
            drop = np.sort(np.asarray(
                b.filter(pc.is_valid(b["rank"]))["rank"], dtype=np.int64))
            docs_b = (b.filter(pc.is_valid(b["text"]))
                      .select(["doc_id", "text"]))
            if docs_b.num_rows == 0:
                return pa.table({"doc_id": pa.array([], type=pa.int64()),
                                 "n_passages": pa.array([], type=pa.int64()),
                                 "n_dropped": pa.array([], type=pa.int64()),
                                 "clean_text": pa.array([], type=pa.string())})
            return _rebuild_clean_docs(docs_b, drop, window)

        out = hash_partition(mixed, ["doc_id"], num_partitions).map_batches(
            rebuild_part, batch_format="pyarrow", batch_size=None)
    return out


DOC_PASSAGE_DEDUP_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
p AS (
  SELECT doc_id, pid,
         array_to_string(w[pid*8+1 : pid*8+8], ' ') AS passage
  FROM (SELECT doc_id, w,
               UNNEST(generate_series(0, CAST((len(w)-1)//8 AS BIGINT))) AS pid
        FROM toks)
),
r AS (
  SELECT doc_id, pid, passage,
         row_number() OVER (PARTITION BY passage ORDER BY doc_id, pid) AS rn
  FROM p
)
SELECT doc_id,
       COUNT(*) AS n_passages,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       COALESCE(string_agg(CASE WHEN rn = 1 THEN passage END, ' ' ORDER BY pid),
                '') AS clean_text
FROM r
GROUP BY doc_id
ORDER BY doc_id
"""


EMBED_DEDUP_SURVIVORS_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.40
),
edges AS (SELECT va AS src, vb AS dst FROM pairs
          UNION ALL SELECT vb, va FROM pairs),
reach(node, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT reach.node, edges.dst FROM reach JOIN edges ON edges.src = reach.r
),
clusters AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node)
SELECT e.vec_id, e.label
FROM embeddings e
WHERE NOT EXISTS (SELECT 1 FROM clusters c
                  WHERE c.node = e.vec_id AND c.cluster_id < e.vec_id)
ORDER BY e.vec_id
"""


NEARDUP_CLUSTERS_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.40
),
edges AS (SELECT va AS src, vb AS dst FROM pairs
          UNION ALL SELECT vb, va FROM pairs),
reach(node, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT reach.node, edges.dst FROM reach JOIN edges ON edges.src = reach.r
)
SELECT node AS vec_id, MIN(r) AS cluster_id
FROM reach
GROUP BY node
ORDER BY vec_id
"""


def _semantic_pairs_ds(sf_dir: str, *, threshold: float = 0.95,
                       n_planes: int = 4, num_partitions: int = 8):
    """(vec_a, vec_b, cos_pct) — SemDedup end-to-end from RAW TEXT: no
    precomputed embeddings table.  Composition: HashVectorizer (actor-pool
    embedding inference) -> deterministic sign-bit LSH coarse cells (the
    quantizer) -> the same hash-co-located tiled cosine pair kernel the
    embeddings-table path uses (``embedding_neardup_pairs_ds``).

    Rows-only and LSH-approximate: only same-cell pairs are compared, so
    recall follows the sign-bit collision probability (identical texts
    always collide: same embedding -> same cell -> cos 1.0).  Pytest pins
    zero false positives under a serial replay, a recall floor on this
    corpus, and determinism.

    Scale shape: two shuffle-free corpus passes fused into one (embed +
    label in the same map_batches chain) + ONE hash exchange by cell.
    """
    from .similarity import EMBED_DIM, HashVectorizer, _list_matrix

    # fixed seeded hyperplanes -> deterministic cells across runs/engines
    planes = np.random.default_rng(1234).standard_normal(
        (EMBED_DIM, n_planes))

    class EmbedAndLabel(HashVectorizer):
        def __call__(self, batch: pa.Table) -> pa.Table:
            t = super().__call__(batch)
            mat = _list_matrix(t["embedding"])
            if mat.size == 0:
                mat = np.zeros((0, EMBED_DIM))
            bits = (mat @ planes) > 0
            label = bits @ (1 << np.arange(n_planes))
            return pa.table({"vec_id": t["doc_id"],
                             "embedding": t["embedding"],
                             "label": pa.array(label.astype(np.int32))})

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    labeled = docs.map_batches(EmbedAndLabel, batch_format="pyarrow",
                               batch_size=None, concurrency=auto_pool_size())
    return embedding_neardup_pairs_ds(sf_dir, threshold=threshold,
                                      num_partitions=num_partitions,
                                      ds=labeled)


def doc_semantic_pairs(sf_dir: str, *, threshold: float = 0.95,
                       n_planes: int = 4, num_partitions: int = 8):
    """Public form of ``_semantic_pairs_ds`` (see its docstring).  Pair
    output is unordered: the pair set is near-dup-rate-proportional (corpus-∝
    worst case), so a trailing global sort would be an all-to-all over the
    whole output for ordering no consumer needs (union-find is order-free,
    the correctness gate compares order-insensitively)."""
    return _semantic_pairs_ds(sf_dir, threshold=threshold, n_planes=n_planes,
                              num_partitions=num_partitions)


def doc_semantic_survivors(sf_dir: str, *, threshold: float = 0.95,
                           n_planes: int = 4, num_partitions: int = 8,
                           broadcast_max_drop: int = 5_000_000):
    """(doc_id, source) — the TEXT corpus after raw-text SemDedup: the
    full composition embed (HashVectorizer) -> LSH cells -> verified
    cosine pairs -> union-find clusters -> keep-one anti-join, mirroring
    ``dedup_minhash_survivors`` with semantic instead of lexical pairs.

    Scale shape: clustering reuses ``neardup_clusters``' size-gated dual
    regime (driver union-find below 100k pairs, distributed min-label
    propagation above — the pair list never funnels through the driver at
    scale); the survivors pass is the shared broadcast/co-located
    anti-join — the corpus text itself never shuffles.
    """
    clusters = neardup_clusters(
        sf_dir, num_partitions=num_partitions,
        pairs_ds=_semantic_pairs_ds(sf_dir, threshold=threshold,
                                    n_planes=n_planes,
                                    num_partitions=num_partitions))
    drop = clusters.filter(pc.less(clusters["cluster_id"],
                                   clusters["vec_id"]))
    drop = pa.table({"doc_id": drop["vec_id"]})
    corpus = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return _anti_join_survivors(corpus, drop, "doc_id", "source", pa.string(),
                                broadcast_max_drop=broadcast_max_drop,
                                num_partitions=num_partitions)


# --- sampled substring-fingerprint overlap (partial containment) ------------

FP_BASE = np.uint64(0x100000001B3)   # polynomial rolling-hash base
FP_K = 16                            # fingerprinted substring length (bytes)
FP_P = 8                             # content-defined selection: h % p == 0


def _rolling_kgram(b: pa.Table, *, k: int, p: int):
    """Shared core: per-batch rolling ``k``-byte polynomial hash + LBFS
    content-defined selection (``hash % p == 0``) over the concatenated
    doc bytes.  Returns ``(off, data, pos, doc_idx, h)``: doc byte offsets,
    the packed byte buffer, the SELECTED global window-start positions,
    their doc indices, and the full hash array.  Cross-doc windows are
    masked; docs shorter than ``k`` select nothing.  Fully vectorized (k
    multiply-adds over the whole buffer).
    """
    arr = b["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(pc.cast(arr, pa.binary()), b"")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0]:off[-1]]
    off = off - off[0]
    n_win = len(data) - k + 1
    if n_win <= 0:
        e = np.empty(0, dtype=np.int64)
        return off, data, e, e, np.empty(0, dtype=np.uint64)
    h = np.zeros(n_win, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            np.multiply(h, FP_BASE, out=h)
            h += data[j:n_win + j]
    # window start s belongs to doc d iff off[d] <= s <= off[d+1]-k
    nh = np.maximum(np.diff(off) - k + 1, 0)
    delta = np.zeros(n_win + 1, dtype=np.int64)
    starts = off[:-1][nh > 0]
    np.add.at(delta, starts, 1)
    np.add.at(delta, starts + nh[nh > 0], -1)
    valid = np.cumsum(delta[:-1]) > 0
    sel = valid & (h % np.uint64(p) == 0)
    pos = np.nonzero(sel)[0]
    doc_idx = np.searchsorted(off[1:], pos, side="right")
    return off, data, pos, doc_idx, h


def _doc_fingerprints(b: pa.Table, *, k: int, p: int):
    """Per-doc sampled substring fingerprints for a pyarrow batch.

    Rolling ``k``-byte polynomial hash over each doc's bytes; a position is
    SELECTED iff ``hash % p == 0`` — the LBFS/rsync content-defined rule
    (Muthitacharoen et al. 2001; the sampled-fingerprint idea behind MOSS
    winnowing, Schleimer et al. 2003) — so the same substring selects the
    same fingerprints wherever it appears, independent of position, doc or
    block composition.  Returns (doc_idx:int64, fp:int64) with per-doc
    duplicate fingerprints removed.  Docs shorter than ``k`` bytes emit
    nothing.
    """
    _off, _data, pos, doc_idx, h = _rolling_kgram(b, k=k, p=p)
    if len(pos) == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    fp = h[pos].view(np.int64)
    # per-doc dedup of repeated fingerprints
    order = np.lexsort((fp, doc_idx))
    doc_idx, fp = doc_idx[order], fp[order]
    first = np.ones(len(fp), dtype=bool)
    first[1:] = (doc_idx[1:] != doc_idx[:-1]) | (fp[1:] != fp[:-1])
    return doc_idx[first], fp[first]


def doc_overlap_pairs(sf_dir: str, *, k: int = FP_K, p: int = FP_P,
                      min_shared: int = 3, mode: str = "auto",
                      num_partitions: int = 16, max_bucket: int = 256,
                      agg_mode: str | None = None):
    """(doc_a, doc_b, n_shared) — document pairs sharing >= ``min_shared``
    sampled substring fingerprints: the PARTIAL-OVERLAP / containment
    detector (quotation, excerpting, one doc embedding a slice of another)
    that whole-doc MinHash misses — Jaccard over full shingle sets is tiny
    when a short doc is contained in a long one, but the shared substring
    still selects the same fingerprints in both.

    Scale shape: fingerprinting is one vectorized corpus pass emitting
    compact (fp, doc_id) rows (expected density ``(len-k+1)/p`` per doc —
    text never shuffles); the bucket exchange reuses ``_bucket_pairs``'s
    size-gated tree/shuffle regimes; fingerprints shared by more than
    ``max_bucket`` docs are STOP-FINGERPRINTS (boilerplate) and are
    dropped, never exploded quadratically (the MOSS practice); per-pair
    shared counts merge through the combiner tree.  Rows-only (rolling
    hash not SQL-expressible): pytest pins exact equality against a
    serial Python replica plus containment / unrelated-doc properties.
    """
    from ..stages.aggregate import grouped_agg
    from ..stages.shuffle import resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/documents.parquet")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp_rows(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        doc_idx, fp = _doc_fingerprints(b, k=k, p=p)
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        return pa.table({"fp": pa.array(fp),
                         "doc_id": pa.array(ids[doc_idx])})

    exploded = ds.map_batches(fp_rows, batch_format="pyarrow",
                              batch_size=None)

    def pair_fn(ids: np.ndarray, *, empty: bool = False,
                star: bool = False) -> pa.Table:
        if empty or star or len(ids) < 2:
            # star == over-cap bucket == stop-fingerprint: dropped entirely
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "n_shared": pa.array([], type=pa.int64())})
        ids = np.sort(np.asarray(ids, dtype=np.int64))
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"doc_a": pa.array(ids[a]), "doc_b": pa.array(ids[b]),
                         "n_shared": pa.array(np.ones(len(a), np.int64))})

    cand = _bucket_pairs(exploded, ["fp"], ["doc_id"], pair_fn,
                         mode=mode, num_partitions=num_partitions,
                         max_bucket=max_bucket)
    counted = grouped_agg(cand, ["doc_a", "doc_b"],
                          {"n_shared": "n_shared"},
                          mode=agg_mode or mode,
                          final_partitions=num_partitions)

    def keep(bt: pa.Table) -> pa.Table:
        return bt.filter(pc.greater_equal(bt["n_shared"], min_shared))

    return counted.map_batches(keep, batch_format="pyarrow", batch_size=None)


def doc_overlap_survivors(sf_dir: str, *, k: int = FP_K, p: int = FP_P,
                          min_shared: int = 3, containment_pct: int = 80,
                          mode: str = "auto", num_partitions: int = 16,
                          max_bucket: int = 256,
                          broadcast_max_drop: int = 5_000_000):
    """(doc_id, source) — the corpus after CONTAINMENT dedup: a doc whose
    sampled-fingerprint set is >= ``containment_pct``% covered by a pair
    partner's (shared fingerprints >= that fraction of ITS OWN count) is
    dropped in favor of the partner with MORE fingerprints — removing
    quoted / excerpted / truncated subset copies that whole-doc MinHash
    never pairs (their full-set Jaccard vanishes).  The fourth survivor
    rule next to min-id (MinHash/SimHash/semantic) and keep-best-quality.

    Drop rule per pair (a, b) with fingerprint counts c_a, c_b and
    ``n_shared`` s: the smaller-count side x (ties: the LARGER doc_id)
    is dropped iff ``s * 100 >= containment_pct * c_x``.  Integer
    arithmetic only; deterministic.

    Scale shape: the pair graph is dup-rate-∝ (from ``doc_overlap_pairs``,
    stop-fingerprints capped); fingerprint counts are fetched by ONE
    corpus pass filtered to pair members (membership broadcasts via
    ``ray.put`` — the ``dedup_minhash_keep_best`` pattern), so nothing
    corpus-sized reaches the driver; survivors ride the shared
    broadcast/co-located anti-join and corpus text never shuffles.
    """
    import ray

    pairs_ds = doc_overlap_pairs(sf_dir, k=k, p=p, min_shared=min_shared,
                                 mode=mode, num_partitions=num_partitions,
                                 max_bucket=max_bucket)
    pairs = pa.concat_tables(list(
        pairs_ds.iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"doc_a": pa.array([], type=pa.int64()),
                   "doc_b": pa.array([], type=pa.int64()),
                   "n_shared": pa.array([], type=pa.int64())})])
    corpus = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    if pairs.num_rows == 0:
        drop = pa.table({"doc_id": pa.array([], type=pa.int64())})
        return _anti_join_survivors(corpus, drop, "doc_id", "source",
                                    pa.string(),
                                    broadcast_max_drop=broadcast_max_drop,
                                    num_partitions=num_partitions)
    a = np.asarray(pairs["doc_a"], dtype=np.int64)
    bb = np.asarray(pairs["doc_b"], dtype=np.int64)
    s = np.asarray(pairs["n_shared"], dtype=np.int64)
    members = np.unique(np.concatenate([a, bb]))
    member_ref = ray.put(members)

    text_ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp_counts(bt: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        mem = ray.get(member_ref)
        ids = np.asarray(bt["doc_id"], dtype=np.int64)
        pos = np.searchsorted(mem, ids)
        pos = np.minimum(pos, len(mem) - 1)
        sub = bt.filter(pa.array(mem[pos] == ids))
        if sub.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_fps": pa.array([], type=pa.int64())})
        doc_idx, _fp = _doc_fingerprints(sub, k=k, p=p)
        cnt = np.bincount(doc_idx, minlength=sub.num_rows)
        return pa.table({"doc_id": sub["doc_id"],
                         "n_fps": pa.array(cnt.astype(np.int64))})

    census = pa.concat_tables(list(
        text_ds.map_batches(fp_counts, batch_format="pyarrow",
                            batch_size=None)
               .iter_batches(batch_format="pyarrow", batch_size=None)))
    cid = np.asarray(census["doc_id"], dtype=np.int64)
    cn = np.asarray(census["n_fps"], dtype=np.int64)
    lookup = np.zeros(len(members), dtype=np.int64)
    lookup[np.searchsorted(members, cid)] = cn
    c_a = lookup[np.searchsorted(members, a)]
    c_b = lookup[np.searchsorted(members, bb)]
    # contained side x: fewer fingerprints; ties -> the larger doc_id
    a_is_small = (c_a < c_b) | ((c_a == c_b) & (a > bb))
    x_id = np.where(a_is_small, a, bb)
    c_x = np.where(a_is_small, c_a, c_b)
    dropped = x_id[s * 100 >= containment_pct * c_x]
    drop = pa.table({"doc_id": pa.array(np.unique(dropped))})
    return _anti_join_survivors(corpus, drop, "doc_id", "source",
                                pa.string(),
                                broadcast_max_drop=broadcast_max_drop,
                                num_partitions=num_partitions)


CDC_P = 64   # expected content-defined chunk size (bytes)


def doc_cdc_chunk_dedup(sf_dir: str, *, k: int = FP_K, p: int = CDC_P,
                        min_chunk: int = FP_K,
                        mode: str = "auto", num_partitions: int = 16):
    """(doc_id, n_dup_chunks, n_chunks) — content-defined-chunking dedup
    census: each doc splits at positions where the rolling ``k``-byte hash
    satisfies ``h % p == 0`` (boundaries move WITH the content — the
    rsync/LBFS/casync chunking rule), each chunk is FNV-hashed, and a
    chunk instance counts as dup if the same chunk bytes occur anywhere
    else in the corpus.  The insertion-robust sibling of
    ``doc_passage_dedup``: a 10-byte insertion shifts every fixed word
    window after it, but content-defined boundaries re-synchronize within
    ~p bytes, so shared runs keep deduplicating.

    Chunk rule (pinned for the serial oracle): a selected position is KEPT
    iff it lies >= ``min_chunk`` bytes after the previous RAW selection in
    the doc (or the doc start) — the standard CDC minimum-size clamp,
    phrased against raw selections so it stays stateless/vectorizable;
    without it adjacent selections make 1-byte chunks that collide
    trivially.  Chunk starts = {0} ∪ {kept positions}, ends = next start
    or doc end; docs shorter than ``k`` bytes are one whole chunk; empty
    docs have zero chunks (absent from the census).

    Scale shape: one vectorized corpus pass emits compact (chunk_hash,
    doc_id) rows (text never shuffles); ONE hash exchange co-locates
    equal chunk hashes so dup marking is block-local; the per-doc census
    merges through the size-gated tree/shuffle aggregate.  Output is
    corpus-∝ and sortless.  Rows-only (rolling hash not SQL-expressible).
    """
    from ..stages.aggregate import grouped_agg
    from ..stages.shuffle import resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/documents.parquet")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk_rows(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        from ..core.strkit import _gather_varlen

        tune_worker_threads()
        off, data, pos, pdoc, _h = _rolling_kgram(b, k=k, p=p)
        if len(pos):
            # min-chunk clamp vs the previous RAW selection (or doc start)
            base = np.where(
                np.concatenate([[False], pdoc[1:] == pdoc[:-1]]),
                np.concatenate([[0], pos[:-1]]), off[pdoc])
            kmask = (pos - base) >= min_chunk
            pos, pdoc = pos[kmask], pdoc[kmask]
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        doclen = np.diff(off)
        # candidate chunk starts: doc start (docs with bytes) + selections
        d0 = np.nonzero(doclen > 0)[0]
        all_doc = np.concatenate([d0, pdoc])
        all_start = np.concatenate([off[:-1][d0], pos])
        order = np.lexsort((all_start, all_doc))
        all_doc, all_start = all_doc[order], all_start[order]
        keep = np.ones(len(all_doc), dtype=bool)   # drop start==0 dup
        keep[1:] = (all_doc[1:] != all_doc[:-1]) | \
                   (all_start[1:] != all_start[:-1])
        all_doc, all_start = all_doc[keep], all_start[keep]
        ends = np.empty(len(all_start), dtype=np.int64)
        if len(all_start):
            ends[:-1] = np.where(all_doc[1:] == all_doc[:-1],
                                 all_start[1:], off[all_doc[:-1] + 1])
            ends[-1] = off[all_doc[-1] + 1]
        out_off, out_data = _gather_varlen(data, all_start, ends - all_start)
        chunks = pa.Array.from_buffers(
            pa.large_binary(), len(all_start),
            [None, pa.py_buffer(out_off.tobytes()),
             pa.py_buffer(out_data.tobytes())])
        return pa.table({
            "chunk_hash": pa.array(
                fnv1a64_arrow(chunks).view(np.int64)),
            "doc_id": pa.array(ids[all_doc]),
        })

    rows = ds.map_batches(chunk_rows, batch_format="pyarrow",
                          batch_size=None)
    part = hash_partition(rows, ["chunk_hash"], num_partitions)

    def mark(bt: pa.Table) -> pa.Table:
        if bt.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "dup": pa.array([], type=pa.int64())})
        hsh = np.asarray(bt["chunk_hash"], dtype=np.int64)
        order = np.argsort(hsh, kind="stable")
        hs = hsh[order]
        starts = np.ones(len(hs), dtype=bool)
        starts[1:] = hs[1:] != hs[:-1]
        seg = np.cumsum(starts) - 1
        cnt = np.bincount(seg)
        dup = (cnt[seg] >= 2).astype(np.int64)
        ids = np.asarray(bt["doc_id"], dtype=np.int64)[order]
        return pa.table({"doc_id": pa.array(ids), "dup": pa.array(dup)})

    marked = part.map_batches(mark, batch_format="pyarrow", batch_size=None)
    return grouped_agg(marked, ["doc_id"], {"n_dup_chunks": "dup"},
                       count_name="n_chunks", mode=mode,
                       final_partitions=num_partitions)


def dedup_minhash_keep_best(sf_dir: str, *, threshold: float = 0.5, k: int = 3,
                            num_partitions: int = 8,
                            broadcast_max_drop: int = 5_000_000):
    """(doc_id, source) — fuzzy dedup keeping the HIGHEST-QUALITY member of
    each near-dup cluster instead of the min-id one: the curation-grade
    keep rule (when near-dups differ — truncation, boilerplate damage —
    keep the best copy, not an arbitrary one).  Quality = the integer
    ``n_tokens`` facet of ``doc_quality`` (the longest fluent copy wins);
    ties break to the smaller doc_id, so the output is deterministic and
    equals ``dedup_minhash_survivors`` whenever all cluster members tie.

    Scale shape: same verified-pair graph + clustering as
    ``dedup_minhash_survivors``; the quality lookup is ONE extra corpus
    pass that scores ONLY cluster members (membership broadcasts via
    ``ray.put``, dup-rate-∝) and emits packed ``score * 2^32 + (2^32-1 -
    doc_id)`` rows — argmax-by-max, the same packed-rule trick as
    ``dedup_exact_priority`` — so the winner per cluster falls out of one
    max over dup-∝ rows.  Corpus text never shuffles.
    """
    import ray

    pairs = verified_pairs_ngram(sf_dir, threshold=threshold, k=k,
                                 num_partitions=num_partitions)
    pairs = pairs.rename_columns(["vec_a", "vec_b", "jaccard_pct"])
    clusters = _union_find_clusters(pairs)
    members = np.asarray(clusters["vec_id"], dtype=np.int64)   # sorted
    clust = np.asarray(clusters["cluster_id"], dtype=np.int64)
    assert (members < (1 << 32)).all(), "doc_id must fit 32 bits for packing"
    member_ref = ray.put((members, clust))

    corpus = read_table(sf_dir, "documents",
                        columns=["doc_id", "text", "source"])

    def score_members(b: pa.Table) -> pa.Table:
        mem, cl = ray.get(member_ref)
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        pos = np.searchsorted(mem, ids)
        pos = np.minimum(pos, len(mem) - 1) if len(mem) else pos
        hit = (mem[pos] == ids) if len(mem) else np.zeros(len(ids), bool)
        sub = b.filter(pa.array(hit))
        if sub.num_rows == 0:
            return pa.table({"cluster_id": pa.array([], type=pa.int64()),
                             "packed": pa.array([], type=pa.int64())})
        ntok = np.asarray(
            pc.fill_null(pc.count_substring_regex(sub["text"], r"\S+"), 0),
            dtype=np.int64)
        sid = np.asarray(sub["doc_id"], dtype=np.int64)
        packed = ntok * (1 << 32) + ((1 << 32) - 1 - sid)
        return pa.table({"cluster_id": pa.array(cl[pos[hit]]),
                         "packed": pa.array(packed)})

    scored = pa.concat_tables(list(
        corpus.map_batches(score_members, batch_format="pyarrow",
                           batch_size=None)
              .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"cluster_id": pa.array([], type=pa.int64()),
                   "packed": pa.array([], type=pa.int64())})])
    if scored.num_rows:
        best = scored.group_by(["cluster_id"]).aggregate([("packed", "max")])
        winners = ((1 << 32) - 1 -
                   (np.asarray(best["packed_max"], dtype=np.int64) %
                    (1 << 32)))
        drop_ids = np.setdiff1d(members, winners)
    else:
        drop_ids = members
    drop = pa.table({"doc_id": pa.array(drop_ids.astype(np.int64))})
    # fresh column-pruned read for the survivors pass — the text column
    # must not ride the anti-join
    out_corpus = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return _anti_join_survivors(out_corpus, drop, "doc_id", "source",
                                pa.string(),
                                broadcast_max_drop=broadcast_max_drop,
                                num_partitions=num_partitions)


# --- soft dedup: down-weight duplicates instead of dropping them ------------

SOFT_DEDUP_BROADCAST_MAX = 200_000


def doc_soft_dedup_weights(sf_dir: str, *, mode: str = "auto",
                           num_partitions: int = 16,
                           broadcast_max_keys: int = SOFT_DEDUP_BROADCAST_MAX):
    """(doc_id, dup_count) — soft dedup: instead of dropping exact
    duplicates, every document is annotated with its duplicate-cluster
    size so a training loader can down-weight it (weight = 1/dup_count;
    the integer count is emitted — the driver's hash contract forbids
    float columns).

    Accepted risk (ADVICE r04): clusters are keyed by the 64-bit FNV-1a
    hash of ``text`` while the DuckDB oracle groups by the exact text —
    a 64-bit collision would merge two distinct texts' counts and diverge
    from the oracle.  This is the same accepted trade as the whole
    exact-dedup family (collision odds ~n²/2⁶⁵; at the gate scales it is
    ~10⁻⁹), kept because shipping hashes instead of text across the
    exchange is the entire scale story; a paranoid deployment can add the
    survivor ops' text-equality verification pass.

    Scale shape (size-gated like the other exact dedups):

    * ``shuffle`` regime (corpus-sized key sets): ONE exchange of compact
      (text_hash, doc_id) rows co-located by hash; each partition counts
      its hashes and attaches the count with one ``index_in`` — the count
      table never funnels through the driver and text never shuffles.
    * ``tree`` regime (small inputs): per-block (hash, count) partials
      merge through the combiner tree; if the distinct-hash table is
      under ``broadcast_max_keys`` it broadcasts (``ray.put`` once) and a
      second corpus pass attaches counts with zero exchanges.
    """
    from ..stages.shuffle import resolve_mode

    from .. import tune_worker_threads

    mode = resolve_mode(mode, f"{sf_dir}/documents.parquet")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(b: pa.Table) -> pa.Table:
        tune_worker_threads()
        h = fnv1a64_arrow(b["text"].combine_chunks()
                          if isinstance(b["text"], pa.ChunkedArray)
                          else b["text"])
        return pa.table({"text_hash": pa.array(h.astype(np.int64)),
                         "doc_id": b["doc_id"]})

    def shuffle_plan():
        part = hash_partition(
            ds.map_batches(keyed, batch_format="pyarrow", batch_size=None),
            ["text_hash"], num_partitions)

        def attach(b: pa.Table) -> pa.Table:
            tune_worker_threads()
            if b.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "dup_count": pa.array([], pa.int64())})
            g = b.group_by(["text_hash"]).aggregate([([], "count_all")])
            pos = pc.index_in(b["text_hash"], value_set=g["text_hash"])
            return pa.table({
                "doc_id": b["doc_id"],
                "dup_count": pc.take(g["count_all"], pos),
            })

        return part.map_batches(attach, batch_format="pyarrow",
                                batch_size=None)

    if mode == "shuffle":
        return shuffle_plan()

    # tree regime: bounded distinct-hash table -> broadcast count map
    import ray

    partial = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None) \
        .map_batches(lambda b: b.group_by(["text_hash"])
                     .aggregate([([], "count_all")])
                     .rename_columns(["text_hash", "cnt"]),
                     batch_format="pyarrow", batch_size=None)
    counts = pa.concat_tables(list(
        tree_merge(partial, ["text_hash"], [("cnt", "sum")], fanin=8)
        .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"text_hash": pa.array([], pa.int64()),
                   "cnt": pa.array([], pa.int64())})]).combine_chunks()
    if counts.num_rows > broadcast_max_keys:
        # auto must pick a plan that works: a small-bytes input can still
        # hold a broadcast-unfriendly distinct-hash set — fall back to the
        # co-located shuffle plan instead of raising
        return shuffle_plan()
    ref = ray.put(counts)

    def attach_bc(b: pa.Table) -> pa.Table:
        tune_worker_threads()
        counts = ray.get(ref)
        h = fnv1a64_arrow(b["text"].combine_chunks()
                          if isinstance(b["text"], pa.ChunkedArray)
                          else b["text"])
        pos = pc.index_in(pa.array(h.astype(np.int64)),
                          value_set=counts["text_hash"])
        return pa.table({"doc_id": b["doc_id"],
                         "dup_count": pc.take(counts["cnt"], pos)})

    return ds.map_batches(attach_bc, batch_format="pyarrow", batch_size=None)


DOC_SOFT_DEDUP_SQL = """
SELECT d.doc_id, c.dup_count
FROM documents d
JOIN (SELECT text, COUNT(*) AS dup_count FROM documents GROUP BY text) c
  ON d.text = c.text
ORDER BY d.doc_id
"""


# --- sketch-accuracy monitoring: MinHash estimate vs exact Jaccard ----------

def dedup_minhash_accuracy(sf_dir: str, *, num_perm: int = 64,
                           bands: int = 16, k: int = 3, mode: str = "auto",
                           num_partitions: int = 8,
                           b_bits: int | None = None):
    """(doc_a, doc_b, true_pct, est_pct, abs_err_pct) — sketch-quality
    monitoring (the dedup twin of ``ann_recall_census``): for every LSH
    candidate pair, the MinHash-estimated Jaccard (matching permutation
    fraction) next to the EXACT k-shingle Jaccard, with the absolute
    error — the number that tells you whether ``num_perm`` is sized
    right before a 100-TB dedup run trusts the sketch.

    Scale shape: the pair set is dup-∝ (bounded by the LSH gate), so
    the per-pair arithmetic is driver-side over compact tables; the
    expensive parts — LSH bucketing, exact shingle verification, and
    the signature pass over ONLY the paired docs (membership broadcast)
    — are the existing distributed operators.  Rows-only (MinHash is
    not SQL-expressible); pytest pins exact-dup pairs at 100 and bounds
    the estimator error.
    """
    import ray

    from ..functions.hashing import minhash_signatures

    pairs_ds = verified_pairs_ngram(sf_dir, threshold=0.0, k=k,
                                    num_perm=num_perm, bands=bands,
                                    mode=mode, num_partitions=num_partitions)
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "true_pct": pa.array([], pa.int64()),
                      "est_pct": pa.array([], pa.int64()),
                      "abs_err_pct": pa.array([], pa.int64())})
    pairs = (pairs_ds if isinstance(pairs_ds, pa.Table) else
             pa.concat_tables(list(pairs_ds.iter_batches(
                 batch_format="pyarrow", batch_size=None)) or
                 [empty.select(["doc_a", "doc_b"])
                  .append_column("jaccard_pct", pa.array([], pa.int64()))]))
    if pairs.num_rows == 0:
        return empty
    da = np.asarray(pairs["doc_a"], dtype=np.int64)
    db = np.asarray(pairs["doc_b"], dtype=np.int64)
    ids = np.unique(np.concatenate([da, db]))
    ref = ray.put(pa.array(ids))

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sigs(b: pa.Table) -> pa.Table:
        import ray as _ray

        keep = pc.is_in(b["doc_id"], value_set=_ray.get(ref))
        b = b.filter(keep)
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sig": pa.array([], pa.list_(pa.int64()))})
        s = minhash_signatures(b["text"], num_perm=num_perm, k=k)
        return pa.table({
            "doc_id": b["doc_id"],
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(s.reshape(-1).astype(np.int64)), num_perm)
            .cast(pa.list_(pa.int64())),
        })

    sig_tbl = pa.concat_tables(list(
        docs.map_batches(sigs, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"doc_id": pa.array([], pa.int64()),
                   "sig": pa.array([], pa.list_(pa.int64()))})]).combine_chunks()
    sid = np.asarray(sig_tbl["doc_id"], dtype=np.int64)
    smat = np.asarray(sig_tbl["sig"].to_pylist(), dtype=np.int64).reshape(
        len(sid), num_perm)
    pos = {int(d): i for i, d in enumerate(sid)}
    ia = np.array([pos[int(d)] for d in da], dtype=np.int64)
    ib = np.array([pos[int(d)] for d in db], dtype=np.int64)
    if b_bits is None:
        est = (smat[ia] == smat[ib]).sum(axis=1) * 100 // num_perm
    else:
        # b-bit minhash (Li & Koenig): keep only the low b bits of each
        # permutation's min; unrelated pairs still match with prob 2^-b,
        # so the raw match fraction m is debiased as (m - c) / (1 - c)
        mask = (1 << b_bits) - 1
        m = ((smat[ia] & mask) == (smat[ib] & mask)).mean(axis=1)
        c = 2.0 ** -b_bits
        est = np.clip((m - c) / (1.0 - c), 0.0, 1.0)
        est = np.floor(est * 100).astype(np.int64)
    true = np.asarray(pairs["jaccard_pct"], dtype=np.int64)
    return pa.table({
        "doc_a": pa.array(da), "doc_b": pa.array(db),
        "true_pct": pa.array(true),
        "est_pct": pa.array(est.astype(np.int64)),
        "abs_err_pct": pa.array(np.abs(est - true).astype(np.int64)),
    })


def dedup_minhash_bbit_accuracy(sf_dir: str, *, b_bits: int = 1, **kw):
    """(doc_a, doc_b, true_pct, est_pct, abs_err_pct) — the b-BIT MinHash
    variant of the accuracy census: each permutation keeps only its low
    ``b_bits`` (a 64x storage cut at b=1) and the match fraction is
    debiased for the 2^-b accidental-collision floor — the estimator that
    makes sketch storage feasible at 100 TB, with its (larger) error
    measured next to the full-width sketch's."""
    return dedup_minhash_accuracy(sf_dir, b_bits=b_bits, **kw)


QUERIES = {
    "dedup_minhash_bbit_accuracy": dedup_minhash_bbit_accuracy,
    "dedup_minhash_accuracy": dedup_minhash_accuracy,
    "doc_soft_dedup_weights": doc_soft_dedup_weights,
    "dedup_minhash_keep_best": dedup_minhash_keep_best,
    "doc_overlap_pairs": doc_overlap_pairs,
    "doc_overlap_survivors": doc_overlap_survivors,
    "doc_cdc_chunk_dedup": doc_cdc_chunk_dedup,
    "dedup_exact_priority": dedup_exact_priority,
    "doc_semantic_pairs": doc_semantic_pairs,
    "doc_semantic_survivors": doc_semantic_survivors,
    "dedup_exact_hash": dedup_exact_hash,
    "dedup_exact_normalized": dedup_exact_normalized,
    "dedup_minhash_pairs": verified_pairs_ngram,
    "dedup_simhash_pairs": simhash_pairs,
    "embed_neardup_cosine": embedding_neardup_pairs,
    "embed_neardup_clusters": neardup_clusters,
    "embed_dedup_survivors": embed_dedup_survivors,
    "doc_passage_dedup": doc_passage_dedup,
    "dedup_minhash_survivors": dedup_minhash_survivors,
    "dedup_simhash_survivors": dedup_simhash_survivors,
    "dedup_incremental": dedup_incremental,
}

ORACLE_SQL = {
    "doc_soft_dedup_weights": DOC_SOFT_DEDUP_SQL,
    "dedup_exact_priority": DEDUP_EXACT_PRIORITY_SQL,
    "dedup_exact_hash": DEDUP_EXACT_HASH_SQL,
    "dedup_exact_normalized": DEDUP_EXACT_NORMALIZED_SQL,
    "embed_neardup_cosine": EMBED_NEARDUP_SQL,
    "embed_neardup_clusters": NEARDUP_CLUSTERS_SQL,
    "embed_dedup_survivors": EMBED_DEDUP_SURVIVORS_SQL,
    "doc_passage_dedup": DOC_PASSAGE_DEDUP_SQL,
    "dedup_incremental": DEDUP_INCREMENTAL_SQL,
    # minhash/simhash (incl. dedup_minhash_keep_best): probabilistic
    # sketches, not SQL-expressible; pytest verifies them against
    # brute-force oracles on tiny corpora instead.
}
