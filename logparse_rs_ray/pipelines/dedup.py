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
from ..sources import read_table
from ..stages.aggregate import tree_merge

__all__ = ["QUERIES", "ORACLE_SQL", "minhash_candidate_pairs", "verified_pairs_ngram",
           "simhash_pairs", "embedding_neardup_pairs", "exact_dedup_by_hash"]


# --- exact dedup via content hash ------------------------------------------

def exact_dedup_by_hash(sf_dir: str):
    """(text_hash, keeper_doc_id, n_copies) — vectorized FNV content hash +
    min-merge; keys stay 8-byte ints instead of full text (shuffle-light)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        h = fnv1a64_arrow(b["text"].combine_chunks() if isinstance(b["text"], pa.ChunkedArray) else b["text"])
        t = pa.table({"text_hash": pa.array(h.astype(np.int64)), "keeper": b["doc_id"]})
        g = t.group_by(["text_hash"]).aggregate([("keeper", "min"), ([], "count_all")])
        return g.rename_columns(["text_hash", "keeper", "n"])

    partial = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    merged = tree_merge(partial, ["text_hash"], [("keeper", "min"), ("n", "sum")], fanin=8)

    def finalize(b: pa.Table) -> pa.Table:
        return b.rename_columns(["text_hash", "keeper_doc_id", "n_copies"])

    return merged.map_batches(finalize, batch_format="pyarrow", batch_size=None).sort("keeper_doc_id")


# FNV isn't SQL-expressible, but the hash is injective on this corpus, so
# the (keeper, n) multiset equals plain GROUP BY text — exposed WITHOUT the
# hash column for the oracle:

def dedup_exact_hash(sf_dir: str):
    out = exact_dedup_by_hash(sf_dir)
    return out.select_columns(["keeper_doc_id", "n_copies"]).sort("keeper_doc_id")


DEDUP_EXACT_HASH_SQL = """
SELECT MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY text
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


def _bucket_pairs_tree(exploded, keys: list[str], payload_cols: list[str],
                       pair_fn, *, fanin: int = 4, max_bucket: int = 500):
    """Bucketed pair generation WITHOUT a sort-based groupby shuffle.

    Per-block: list-aggregate payload columns per bucket key.  Merge levels
    explode the lists and re-aggregate (associative).  The final single
    block walks its buckets (already collapsed to one row each) and calls
    ``pair_fn(arrays...) -> pa.Table`` per bucket.  At a scale where the
    bucket directory exceeds one task, switch the merge to a groupby
    shuffle (mode flag on the callers).
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
                            k: int = 3):
    """Distinct candidate pairs (doc_a < doc_b) sharing >= 1 LSH bucket."""
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

    pairs = _bucket_pairs_tree(exploded, ["band_id", "band_key"], ["doc_id"], pair_fn)

    # distinct pairs (a pair may share several bands)
    def distinct(b: pa.Table) -> pa.Table:
        g = b.group_by(["doc_a", "doc_b"]).aggregate([])
        return g.append_column("one", pa.array(np.ones(g.num_rows, dtype=np.int64)))

    dd = pairs.map_batches(distinct, batch_format="pyarrow", batch_size=None)
    return tree_merge(dd, ["doc_a", "doc_b"], [("one", "min")], fanin=4).map_batches(
        lambda b: b.drop_columns(["one"]), batch_format="pyarrow", batch_size=None)


def verified_pairs_ngram(sf_dir: str, *, threshold: float = 0.5, k: int = 3,
                         num_perm: int = 64, bands: int = 16):
    """LSH candidates verified by EXACT n-gram (k-token shingle) Jaccard.

    Returns (doc_a, doc_b, jaccard) with jaccard >= threshold.  The shingle
    sets of the candidate docs are recomputed via a broadcast of the
    candidate ids — candidates are a tiny fraction of the corpus.
    """
    import pandas as pd

    cands = minhash_candidate_pairs(sf_dir, num_perm=num_perm, bands=bands, k=k).to_pandas()
    if len(cands) == 0:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "jaccard_pct": pa.array([], type=pa.int64())})
    need = np.unique(np.concatenate([cands["doc_a"].to_numpy(), cands["doc_b"].to_numpy()]))
    need_set = set(need.tolist())

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def shingles_of_needed(batch: pa.Table):
        mask = pc.is_in(batch["doc_id"], value_set=pa.array(list(need_set), type=pa.int64()))
        sub = batch.filter(mask)
        if sub.num_rows == 0:
            return []
        sh, off = shingle_hashes(sub["text"], k=k)
        ids = np.asarray(sub["doc_id"])
        return [(int(ids[i]), set(sh[off[i]:off[i + 1]].tolist())) for i in range(len(ids))]

    shards = ds.map_batches(
        lambda b: pa.table({"blob": pa.array([__import__("pickle").dumps(shingles_of_needed(b))], type=pa.binary())}),
        batch_format="pyarrow", batch_size=None,
    ).to_pandas()
    import pickle

    sets: dict[int, set] = {}
    for blob in shards["blob"]:
        for did, s in pickle.loads(blob):
            sets[did] = s
    out_a, out_b, out_j = [], [], []
    for a, b in zip(cands["doc_a"], cands["doc_b"]):
        sa, sb = sets.get(int(a)), sets.get(int(b))
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out_a.append(int(a)); out_b.append(int(b)); out_j.append(int(round(j * 100)))
    return pa.table({"doc_a": pa.array(out_a, type=pa.int64()),
                     "doc_b": pa.array(out_b, type=pa.int64()),
                     "jaccard_pct": pa.array(out_j, type=pa.int64())}).sort_by(
        [("doc_a", "ascending"), ("doc_b", "ascending")])


# --- SimHash ---------------------------------------------------------------

def simhash_pairs(sf_dir: str, *, max_hamming: int = 3):
    """Near-dup pairs by 64-bit SimHash, Hamming <= max_hamming.

    Banding: 4 chunks of 16 bits — any pair within distance 3 collides on
    at least one chunk (pigeonhole).  Verification popcounts the full sig.
    """
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

    pairs = _bucket_pairs_tree(exploded, ["chunk_id", "chunk_val"],
                               ["doc_id", "sig"], pair_fn)
    merged = tree_merge(pairs, ["doc_a", "doc_b"], [("hamming", "min")], fanin=4)
    return merged.sort(["doc_a", "doc_b"])


# --- embedding cosine near-dup ---------------------------------------------

def embedding_neardup_pairs(sf_dir: str, *, threshold: float = 0.40):
    """Pairs (vec_a < vec_b) with cosine >= threshold, blocked by label.

    The label column is the coarse quantizer (IVF cell): only same-cell
    pairs are compared — per cell a normalized matmul.  At production scale
    the cells come from a k-means trained on a sample and the per-cell work
    is one task each.
    """
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def pairs_in_cell(g):
        import pandas as pd

        ids = g["vec_id"].to_numpy()
        o = np.argsort(ids)
        ids = ids[o]
        mat = np.stack(g["embedding"].to_numpy()[o]).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        cos = mat @ mat.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = cos[a, b] >= threshold
        return pd.DataFrame({
            "vec_a": ids[a][keep].astype(np.int64),
            "vec_b": ids[b][keep].astype(np.int64),
            "cos_pct": np.floor(cos[a, b][keep] * 1000).astype(np.int64),
        })

    out = ds.groupby("label").map_groups(pairs_in_cell, batch_format="pandas")
    # pairs are few: collect to a typed Table so an all-empty result still
    # carries the schema (a Dataset of empty pandas blocks loses it)
    import pandas as pd

    df = out.to_pandas()
    if len(df) == 0:
        df = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                           "vec_b": pd.Series(dtype="int64"),
                           "cos_pct": pd.Series(dtype="int64")})
    df = df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(df[["vec_a", "vec_b", "cos_pct"]], preserve_index=False)


EMBED_NEARDUP_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(FLOOR(list_cosine_similarity(a.embedding, b.embedding) * 1000) AS BIGINT) AS cos_pct
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.40
ORDER BY vec_a, vec_b
"""


QUERIES = {
    "dedup_exact_hash": dedup_exact_hash,
    "dedup_minhash_pairs": verified_pairs_ngram,
    "dedup_simhash_pairs": simhash_pairs,
    "embed_neardup_cosine": embedding_neardup_pairs,
}

ORACLE_SQL = {
    "dedup_exact_hash": DEDUP_EXACT_HASH_SQL,
    "embed_neardup_cosine": EMBED_NEARDUP_SQL,
    # minhash/simhash: probabilistic sketches, not SQL-expressible; pytest
    # verifies them against brute-force oracles on tiny corpora instead.
}
