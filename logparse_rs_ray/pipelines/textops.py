"""Text-analysis operators over ``documents``: quality scoring, language-ID
heuristic, token counting, document fingerprinting.

The SQL-expressible ones (quality ratios, token counts — pure arithmetic on
counts) carry DuckDB oracles; language-ID and the FNV fingerprint are
rows-only (verified by pytest against serial Python oracles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import auto_pool_size
from ..core.fnv import fnv1a64_arrow
from ..sources import read_table

__all__ = ["QUERIES", "ORACLE_SQL"]


# --- quality scoring --------------------------------------------------------

def doc_quality(sf_dir: str):
    """Per-doc quality facets, all integer for cross-engine parity:
    n_bytes, n_tokens, n_vowels, n_spaces, mean_token_len_x100."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        text = b["text"]
        nbytes = pc.binary_length(pc.cast(text, pa.binary()))
        ntok = pc.count_substring_regex(text, r"\S+")
        nvowel = pc.count_substring_regex(text, r"[aeiou]")
        nspace = pc.count_substring_regex(text, r" ")
        # mean token length x100 (0 for token-less docs), same arithmetic in SQL
        nonspace = pc.count_substring_regex(text, r"\S")
        ntok_np = np.asarray(ntok, dtype=np.int64)
        nonspace_np = np.asarray(nonspace, dtype=np.int64)
        mean100 = np.where(ntok_np > 0,
                           (nonspace_np * 100) // np.maximum(ntok_np, 1),
                           0).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_bytes": pc.cast(nbytes, pa.int64()),
            "n_tokens": pc.cast(ntok, pa.int64()),
            "n_vowels": pc.cast(nvowel, pa.int64()),
            "n_spaces": pc.cast(nspace, pa.int64()),
            "mean_token_len_x100": pa.array(mean100),
        })

    return ds.map_batches(prep, batch_format="pyarrow", batch_size=None)


DOC_QUALITY_SQL = """
SELECT doc_id,
       strlen(text) AS n_bytes,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
       length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_vowels,
       length(text) - length(regexp_replace(text, ' ', '', 'g')) AS n_spaces,
       CASE WHEN trim(text) = '' THEN 0
            ELSE CAST(length(regexp_replace(text, '\\s', '', 'g')) * 100
                 // GREATEST(len(string_split_regex(trim(text), '\\s+')), 1) AS BIGINT) END
         AS mean_token_len_x100
FROM documents
ORDER BY doc_id
"""


# --- BPE-ish token counting -------------------------------------------------

# GPT-2-style pre-tokenizer approximation in RE2 syntax (both pyarrow and
# DuckDB use RE2, so the counts match exactly; RE2 has no lookahead, so the
# trailing-space subtlety of the original pattern is simplified away)
BPE_ISH_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)| ?[[:alpha:]]+| ?[[:digit:]]+"
    r"| ?[^\s[:alpha:][:digit:]]+|\s+"
)


def doc_bpe_token_stats(sf_dir: str):
    """Per-lang totals of BPE-ish subword-ish token counts — the training-
    data-pipeline token budget estimator (whitespace counting is in
    doc_token_stats; this is the tokenizer-shaped variant)."""
    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def prep(b: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(b["text"], BPE_ISH_PATTERN)
        return pa.table({"lang": b["lang"], "tokens": pc.cast(toks, pa.int64())})

    from ..stages.aggregate import grouped_agg

    out = grouped_agg(ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
                      ["lang"], {"sum_bpe_tokens": "tokens"}, count_name="n_docs",
                      final_partitions=1)
    return out.sort("lang")


# the pattern contains a single quote -> double it for the SQL literal
DOC_BPE_TOKEN_SQL = f"""
SELECT lang,
       CAST(SUM(len(regexp_extract_all(text,
            '{BPE_ISH_PATTERN.replace("'", "''")}'))) AS BIGINT) AS sum_bpe_tokens,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang
ORDER BY lang
"""


# --- language-ID heuristic (rows-only) -------------------------------------

# tiny per-language stopword lists; scoring = argmax of stopword hits
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is"},
    "de": {"der", "die", "das", "und", "ist", "ein"},
    "fr": {"le", "la", "les", "et", "est", "un"},
    "es": {"el", "la", "los", "y", "es", "un"},
}


class LangIdScorer:
    """Actor-pool stage: stopword tables built once per actor (__init__),
    vectorized token membership per batch."""

    def __init__(self):
        self.langs = sorted(_STOPWORDS)
        self.sets = [pa.array(sorted(_STOPWORDS[lang])) for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(pc.utf8_lower(batch["text"]))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        from ..functions.hashing import segment_sum

        n = batch.num_rows
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        for li, vs in enumerate(self.sets):
            hit = np.asarray(pc.is_in(flat, value_set=vs), dtype=np.int64)
            if len(hit):
                # segment_sum is safe for zero-token docs anywhere in the
                # batch (reduceat raises on a trailing empty segment)
                scores[:, li] = segment_sum(hit, off)
        best = np.argmax(scores, axis=1)
        best_score = scores[np.arange(n), best]
        lang = np.array(self.langs, dtype=object)[best]
        lang[best_score == 0] = "unknown"
        return pa.table({
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(lang, type=pa.string()),
            "stopword_hits": pa.array(best_score),
        })


def doc_lang_id(sf_dir: str):
    """(doc_id, lang_pred, score_x1000) — stopword-profile language-ID
    heuristic as an actor-pool stage (profiles compiled once per actor)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(LangIdScorer, batch_format="pyarrow", batch_size=None,
                          concurrency=auto_pool_size())


# SQL oracle generated FROM the same stopword dict (stays in sync by
# construction).  argmax tie-break = first language in sorted order, exactly
# np.argmax's first-max rule; 0 hits -> 'unknown'.
def _lang_id_sql() -> str:
    langs = sorted(_STOPWORDS)
    hits = ",\n       ".join(
        "len(list_filter(toks, x -> x IN ({}))) AS h_{}".format(
            ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lang])), lang)
        for lang in langs)
    g = "GREATEST({})".format(", ".join(f"h_{lang}" for lang in langs))
    first_max = "\n            ".join(
        f"WHEN h_{lang} = {g} THEN '{lang}'" for lang in langs[:-1])
    return f"""
WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
           FROM documents),
h AS (SELECT doc_id,
       {hits}
      FROM t)
SELECT doc_id,
       CASE WHEN {g} = 0 THEN 'unknown'
            {first_max}
            ELSE '{langs[-1]}' END AS pred_lang,
       CAST({g} AS BIGINT) AS stopword_hits
FROM h
ORDER BY doc_id
"""


DOC_LANG_ID_SQL = _lang_id_sql()


class _ConfusionCounter(LangIdScorer):
    """Per-block (label, prediction) census partial — the detector runs
    exactly as in ``doc_lang_id`` (same actor-pool stage, stopword tables
    built once per actor), then the block collapses to bounded
    (lang, pred_lang, n_docs) rows before anything leaves the task."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pred = super().__call__(batch)
        t = pa.table({"lang": batch["lang"], "pred_lang": pred["pred_lang"],
                      "one": pa.array(np.ones(batch.num_rows,
                                              dtype=np.int64))})
        g = t.group_by(["lang", "pred_lang"]).aggregate([("one", "sum")])
        return g.rename_columns(["lang", "pred_lang", "n_docs"])


def doc_langid_confusion(sf_dir: str):
    """(lang, pred_lang, n_docs) — confusion matrix of the corpus's labeled
    language vs the stopword detector's prediction (the drift / detector-
    quality monitor a curation pipeline runs alongside ``doc_lang_id``).

    Scale shape: the census key set is bounded (langs²), so each block's
    partial rides the combiner tree — the corpus never shuffles and the
    detector cost is the same single vectorized pass as ``doc_lang_id``.
    """
    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    partial = ds.map_batches(_ConfusionCounter, batch_format="pyarrow",
                             batch_size=None, concurrency=auto_pool_size())
    merged = tree_merge(partial, ["lang", "pred_lang"], [("n_docs", "sum")],
                        fanin=8)
    return merged.sort(["lang", "pred_lang"])


DOC_LANGID_CONFUSION_SQL = f"""
SELECT d.lang, p.pred_lang, COUNT(*) AS n_docs
FROM documents d
JOIN ({_lang_id_sql()}) p ON d.doc_id = p.doc_id
GROUP BY d.lang, p.pred_lang
ORDER BY d.lang, p.pred_lang
"""


# --- fingerprinting (rows-only: FNV not in SQL) ----------------------------

def doc_fingerprint(sf_dir: str):
    """Deterministic 64-bit fingerprint of the normalized text (lowercase,
    collapsed whitespace) — the reference's hash64 enrichment (M9)
    generalized to a content fingerprint."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(pc.utf8_lower(b["text"]), r"\s+", " ")
        norm = pc.utf8_trim_whitespace(norm)
        h = fnv1a64_arrow(norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm)
        return pa.table({"doc_id": b["doc_id"],
                         "fingerprint": pa.array(h.astype(np.int64))})

    return ds.map_batches(fp, batch_format="pyarrow", batch_size=None)


# --- exact distributed grouped quantiles (value-histogram method) ----------

def doc_len_quantiles(sf_dir: str, *, qs=(0.5, 0.9, 0.99)):
    """Exact p50/p90/p99 of n_chars per lang WITHOUT a global sort: the
    integer value domain is histogrammed per block ((lang, n_chars) counts,
    pre-combined per block), merged associatively, and the quantile is read
    off the cumulative histogram.  Shuffle volume = O(distinct values), not
    O(rows) — the scale shape for quantiles over discrete domains.

    Quantile rule matches DuckDB ``quantile_disc``: index ceil(n*q)-1 of
    the sorted values.
    """
    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "documents", columns=["lang", "n_chars"])

    def hist(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n_chars", "cnt"])

    partial = ds.map_batches(hist, batch_format="pyarrow", batch_size=None)
    merged = tree_merge(partial, ["lang", "n_chars"], [("cnt", "sum")], fanin=8)

    def quantiles(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             **{f"p{int(q*100)}": pa.array([], type=pa.int64())
                                for q in qs}})
        t = b.sort_by([("lang", "ascending"), ("n_chars", "ascending")])
        langs = np.asarray(t["lang"].to_pylist(), dtype=object)
        vals = np.asarray(t["n_chars"])
        cnts = np.asarray(t["cnt"])
        out: dict[str, list] = {"lang": []}
        for q in qs:
            out[f"p{int(q*100)}"] = []
        for lang in np.unique(langs):
            m = langs == lang
            v, c = vals[m], cnts[m]
            cum = np.cumsum(c)
            n = cum[-1]
            out["lang"].append(str(lang))
            for q in qs:
                k = int(np.ceil(n * q))  # value where cum >= ceil(n*q)
                out[f"p{int(q*100)}"].append(int(v[np.searchsorted(cum, k)]))
        return pa.table({"lang": pa.array(out["lang"], type=pa.string()),
                         **{f"p{int(q*100)}": pa.array(out[f"p{int(q*100)}"],
                                                       type=pa.int64())
                            for q in qs}})

    return merged.map_batches(quantiles, batch_format="pyarrow",
                              batch_size=None).sort("lang")


DOC_LEN_QUANTILES_SQL = """
SELECT lang,
       CAST(quantile_disc(n_chars, 0.5)  AS BIGINT) AS p50,
       CAST(quantile_disc(n_chars, 0.9)  AS BIGINT) AS p90,
       CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99
FROM documents
GROUP BY lang
ORDER BY lang
"""


def doc_len_rank(sf_dir: str):
    """(doc_id, lang, len_rank, n_lang) — RANK() of each document's length
    within its language, plus the language size (the window-function rank
    the reference's flat Counter aggregates cannot express).

    Scale shape: the window function is re-expressed WITHOUT a per-lang
    sort of the corpus — pass 1 builds the (lang, n_chars) value histogram
    (per-block partials, associative tree merge; shuffle volume = O(distinct
    values)); the driver turns the small histogram into a rank map
    (rank(v) = 1 + count of smaller values, i.e. SQL RANK with ties) that
    is broadcast via ``ray.put``; pass 2 assigns ranks vectorized with one
    ``searchsorted`` per block.  Driver state is bounded by the value
    domain (langs x distinct lengths), never by row count.  Integer
    outputs only (driver-contract hash rule).
    """
    import ray

    from .. import tune_worker_threads
    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "lang", "n_chars"])

    def hist(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n_chars", "cnt"])

    partial = ds.map_batches(hist, batch_format="pyarrow", batch_size=None)
    h = tree_merge(partial, ["lang", "n_chars"], [("cnt", "sum")],
                   fanin=8).to_pandas()
    h = h.sort_values(["lang", "n_chars"]).reset_index(drop=True)
    langs = sorted(h.lang.unique())
    lang_code = {l: i for i, l in enumerate(langs)}
    cnt = h.cnt.to_numpy(dtype=np.int64)
    li = h.lang.map(lang_code).to_numpy(dtype=np.int64)
    starts = np.concatenate(([True], li[1:] != li[:-1]))
    cum = np.cumsum(cnt) - cnt                      # rows before this value
    grp_base = np.maximum.accumulate(np.where(starts, cum, 0))
    rank = cum - grp_base + 1                       # 1 + smaller-in-group
    n_lang = np.add.reduceat(cnt, np.nonzero(starts)[0])[
        np.cumsum(starts) - 1]
    nc = h.n_chars.to_numpy(dtype=np.int64)
    # the histogram holds every distinct n_chars, so this one check covers
    # the per-block packers too (ADVICE r03: an oversized value would
    # corrupt the packed keys of all langs sharing high bits)
    if nc.size and (nc.max() >= (1 << 32) or nc.min() < 0):
        raise ValueError("doc_len_rank: n_chars outside [0, 2^32) breaks "
                         "the (lang << 32) | n_chars key packing")
    keys = (li << 32) | nc
    ref = ray.put((keys, rank, n_lang, langs))

    def assign(b: pa.Table) -> pa.Table:
        tune_worker_threads()
        keys, rank, n_lang, langs = ray.get(ref)
        code = pc.cast(pc.index_in(b["lang"], value_set=pa.array(langs)),
                       pa.int64()).to_numpy(zero_copy_only=False)
        k = (code << 32) | np.asarray(b["n_chars"], dtype=np.int64)
        pos = np.searchsorted(keys, k)
        return pa.table({
            "doc_id": b["doc_id"], "lang": b["lang"],
            "len_rank": pa.array(rank[pos], type=pa.int64()),
            "n_lang": pa.array(n_lang[pos], type=pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow",
                          batch_size=None)


DOC_LEN_RANK_SQL = """
SELECT doc_id, lang,
       RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS len_rank,
       COUNT(*) OVER (PARTITION BY lang) AS n_lang
FROM documents
ORDER BY doc_id
"""


def doc_length_outliers(sf_dir: str, *, lo_q: float = 0.1, hi_q: float = 0.9):
    """(lang, p10, p90, n_docs, n_below, n_above) — per-lang quantile-gated
    length-outlier census (the Gopher/RefinedWeb "drop the tails" filter,
    reported rather than applied so it is oracle-checkable).  ``n_below``
    counts docs strictly under the p10 length, ``n_above`` strictly over
    the p90; quantile rule = DuckDB ``quantile_disc``.

    Scale shape: the SAME one-pass (lang, n_chars) value histogram as
    ``doc_len_quantiles`` — both the thresholds AND the tail counts are
    read off the merged cumulative histogram, so the filter costs ZERO
    extra corpus passes (a naive plan re-scans the corpus against
    broadcast thresholds).  Shuffle volume = O(distinct lengths).
    """
    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "documents", columns=["lang", "n_chars"])

    def hist(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n_chars", "cnt"])

    partial = ds.map_batches(hist, batch_format="pyarrow", batch_size=None)
    merged = tree_merge(partial, ["lang", "n_chars"], [("cnt", "sum")], fanin=8)

    def census(b: pa.Table) -> pa.Table:
        cols = ("lang", "p10", "p90", "n_docs", "n_below", "n_above")
        if b.num_rows == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             **{c: pa.array([], type=pa.int64())
                                for c in cols[1:]}})
        t = b.sort_by([("lang", "ascending"), ("n_chars", "ascending")])
        langs = np.asarray(t["lang"].to_pylist(), dtype=object)
        vals = np.asarray(t["n_chars"], dtype=np.int64)
        cnts = np.asarray(t["cnt"], dtype=np.int64)
        out: dict[str, list] = {c: [] for c in cols}
        for lang in np.unique(langs):
            m = langs == lang
            v, c = vals[m], cnts[m]
            cum = np.cumsum(c)
            n = int(cum[-1])
            lo = int(v[np.searchsorted(cum, int(np.ceil(n * lo_q)))])
            hi = int(v[np.searchsorted(cum, int(np.ceil(n * hi_q)))])
            i_lo = np.searchsorted(v, lo)          # first idx with v >= lo
            i_hi = np.searchsorted(v, hi, "right")  # first idx with v > hi
            out["lang"].append(str(lang))
            out["p10"].append(lo)
            out["p90"].append(hi)
            out["n_docs"].append(n)
            out["n_below"].append(int(cum[i_lo - 1]) if i_lo else 0)
            out["n_above"].append(n - int(cum[i_hi - 1]) if i_hi else n)
        return pa.table({"lang": pa.array(out["lang"], type=pa.string()),
                         **{c: pa.array(out[c], type=pa.int64())
                            for c in cols[1:]}})

    return merged.map_batches(census, batch_format="pyarrow",
                              batch_size=None).sort("lang")


DOC_LENGTH_OUTLIERS_SQL = """
WITH t AS (
  SELECT lang,
         CAST(quantile_disc(n_chars, 0.1) AS BIGINT) AS lo,
         CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS hi
  FROM documents GROUP BY lang
)
SELECT d.lang, t.lo AS p10, t.hi AS p90,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN d.n_chars < t.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_below,
       CAST(SUM(CASE WHEN d.n_chars > t.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above
FROM documents d JOIN t USING (lang)
GROUP BY d.lang, t.lo, t.hi
ORDER BY d.lang
"""


# --- term document frequency (corpus-sized vocabulary -> hash shuffle) -----

def doc_term_df(sf_dir: str, *, top_n: int = 50, num_partitions: int = 8):
    """Top-``top_n`` terms by DOCUMENT frequency.  The vocabulary keyset is
    ∝ corpus, so the merge is the hash shuffle (the oracle-checked exercise
    of ``stages/shuffle.hash_merge``); per-block work stays vectorized:
    tokenize whole column, per-doc distinct via one lexsort, block-local
    pre-aggregation before the exchange.
    """
    from ..stages.shuffle import hash_merge

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def block_df(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        toks = pc.utf8_split_whitespace(pc.utf8_lower(b["text"]))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        # flatten() honors the list array's offset (unlike .values)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(object)
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        doc_of = np.repeat(np.arange(len(off) - 1, dtype=np.int64), np.diff(off))
        nonempty = np.asarray([len(x) > 0 for x in flat], dtype=bool)
        flat, doc_of = flat[nonempty], doc_of[nonempty]
        order = np.lexsort((flat, doc_of))
        f, d = flat[order], doc_of[order]
        keep = np.ones(len(f), dtype=bool)
        if len(f) > 1:
            keep[1:] = (d[1:] != d[:-1]) | (f[1:] != f[:-1])
        t = pa.table({"term": pa.array(f[keep], type=pa.string())})
        g = t.group_by(["term"]).aggregate([([], "count_all")])
        return g.rename_columns(["term", "df"])

    partial = ds.map_batches(block_df, batch_format="pyarrow", batch_size=None)
    merged = hash_merge(partial, ["term"], [("df", "sum")],
                        num_partitions=num_partitions)

    # top-N WITHOUT a global sort (VERDICT r02 item 1): after hash_merge the
    # partitions hold disjoint keys, so each block's local top-N (one
    # lexsort) is a superset of its contribution to the global answer; the
    # candidates (≤ partitions × top_n rows) collapse to one tiny block for
    # the final pick.  No AllToAll Sort operator ever touches the
    # corpus-sized vocabulary.
    def local_topn(b: pa.Table) -> pa.Table:
        if b.num_rows <= top_n:
            return b
        df = np.asarray(b["df"], dtype=np.int64)
        term = np.asarray(b["term"].to_pylist(), dtype=object)
        order = np.lexsort((term, -df))[:top_n]
        return b.take(pa.array(order))

    cand = merged.map_batches(local_topn, batch_format="pyarrow", batch_size=None)
    return cand.repartition(1).map_batches(local_topn, batch_format="pyarrow",
                                           batch_size=None)


DOC_TERM_DF_SQL = """
SELECT term, COUNT(*) AS df
FROM (SELECT doc_id, UNNEST(list_distinct(string_split_regex(lower(text), '\\s+'))) AS term
      FROM documents)
WHERE term <> ''
GROUP BY term
ORDER BY df DESC, term
LIMIT 50
"""


# --- benchmark decontamination (broadcast small-side n-gram overlap) -------

def doc_decontaminate(sf_dir: str, *, k: int = 5, bench_mod: int = 97):
    """Doc ids of corpus documents sharing >= 1 k-token shingle with the
    BENCHMARK subset (here: ``doc_id % bench_mod == 0`` — the stand-in for
    an eval set) — the decontamination pass of a training-data pipeline.

    Scale shape: the benchmark is the SMALL side by construction, so its
    distinct shingle hashes are computed in tasks, collected once and
    broadcast via ``ray.put``; the corpus pass is then ONE ``map_batches``
    with a vectorized ``searchsorted`` membership test per batch — no
    shuffle, no join, corpus never materializes.  Shingles are 64-bit FNV
    rolling hashes (collision probability ~ n_grams²/2⁶⁴, negligible);
    docs with fewer than ``k`` tokens carry no k-gram and are excluded on
    both sides, matching the SQL semantics exactly.
    """
    import ray as _ray

    from ..functions.hashing import segment_sum, shingle_hashes

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_grams(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"])
        ntok = np.asarray(pc.count_substring_regex(b["text"], r"\S+"), dtype=np.int64)
        mask = (ids % bench_mod == 0) & (ntok >= k)
        if not mask.any():
            return pa.table({"h": pa.array([], type=pa.uint64())})
        sub = b.take(pa.array(np.nonzero(mask)[0]))
        sh, _ = shingle_hashes(sub["text"], k=k)
        return pa.table({"h": pa.array(np.unique(sh))})

    parts = docs.map_batches(bench_grams, batch_format="pyarrow", batch_size=None)
    all_h = [np.asarray(b["h"], dtype=np.uint64)
             for b in parts.iter_batches(batch_format="pyarrow", batch_size=None)]
    bench = (np.unique(np.concatenate(all_h)) if all_h
             else np.empty(0, dtype=np.uint64))
    ref = _ray.put(bench)  # sorted distinct benchmark shingles, shipped once

    def flag(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64())})
        ids = np.asarray(b["doc_id"])
        ntok = np.asarray(pc.count_substring_regex(b["text"], r"\S+"), dtype=np.int64)
        mask = (ids % bench_mod != 0) & (ntok >= k)
        if not mask.any():
            return empty
        bench_h = _ray.get(ref)
        if len(bench_h) == 0:
            return empty
        sub = b.take(pa.array(np.nonzero(mask)[0]))
        sh, off = shingle_hashes(sub["text"], k=k)
        pos = np.minimum(np.searchsorted(bench_h, sh), len(bench_h) - 1)
        hit = (bench_h[pos] == sh).astype(np.int64)
        per_doc = segment_sum(hit, off)
        sel = np.asarray(sub["doc_id"])[per_doc > 0]
        return pa.table({"doc_id": pa.array(sel, type=pa.int64())})

    return docs.map_batches(flag, batch_format="pyarrow",
                            batch_size=None)


DOC_DECONTAMINATE_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents WHERE trim(text) <> ''
),
g AS (
  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS gram
  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
  WHERE len(t) >= 5
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
SELECT DISTINCT doc_id FROM g JOIN bench USING (gram)
WHERE doc_id % 97 <> 0
ORDER BY doc_id
"""


# --- stratified (per-source quota) sampling --------------------------------

def doc_stratified_sample(sf_dir: str, *, per_lang: int = 50,
                          num_partitions: int = 8, mode: str = "auto"):
    """Deterministic per-language quota sample (``per_lang`` docs per lang,
    smallest doc_ids win) — the source-balancing operator of a training-data
    mix.  min-k per group is associative: each block keeps its local k per
    lang (one lexsort), candidates merge (hash-shuffled by lang above the
    auto threshold, single block below) and the same kernel runs again.
    Shuffle volume = langs × k × blocks, never the corpus.
    """
    from ..stages.shuffle import hash_partition, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/documents.parquet")
    ds = read_table(sf_dir, "documents", columns=["lang", "doc_id"])

    def local_quota(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        lang = np.asarray(b["lang"].to_pylist(), dtype=object)
        did = np.asarray(b["doc_id"])
        order = np.lexsort((did, lang))
        l_s, d_s = lang[order], did[order]
        new_seg = np.ones(len(l_s), dtype=bool)
        new_seg[1:] = l_s[1:] != l_s[:-1]
        seg_id = np.cumsum(new_seg) - 1
        starts = np.nonzero(new_seg)[0]
        rank = np.arange(len(l_s)) - starts[seg_id]
        keep = order[rank < per_lang]
        return b.take(pa.array(keep))

    partial = ds.map_batches(local_quota, batch_format="pyarrow", batch_size=None)
    cand = (hash_partition(partial, ["lang"], num_partitions)
            if mode == "shuffle" else partial.repartition(1))
    merged = cand.map_batches(local_quota, batch_format="pyarrow", batch_size=None)
    return merged.select_columns(["lang", "doc_id"]).sort(["lang", "doc_id"])


DOC_STRATIFIED_SAMPLE_SQL = """
SELECT lang, doc_id
FROM (SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents)
WHERE rn <= 50
ORDER BY lang, doc_id
"""


# --- repetition signals (Gopher-style quality rules) -----------------------

def doc_repetition(sf_dir: str):
    """Per-doc word-repetition signals — the Gopher "repetitious document"
    quality rules re-expressed over the word-stream corpus: total words,
    distinct words, most-common-word fraction and duplicate-word fraction
    (both per-mille, floor — integer for cross-engine parity).

    Shuffle-free: every signal is a pure function of one document, so this
    is a single vectorized corpus pass.  Per batch: one ``split_pattern``
    -> flatten -> ``dictionary_encode`` (exact word identity — no hash
    collisions) -> one lexsort over (doc, code) -> run-length counts give
    distinct/max per doc with ``reduceat``.  No Python loop over rows.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(repetition_signals, batch_format="pyarrow",
                          batch_size=None)


def repetition_signals(b: pa.Table) -> pa.Table:
    """Vectorized per-doc word-repetition kernel (shared with curation)."""
    n = b.num_rows
    if n == 0:
        return pa.table({k: pa.array([], type=pa.int64())
                         for k in ("doc_id", "n_words", "n_distinct",
                                   "top_word_pml", "dup_word_pml")})

    def _arr(x):  # normalize ChunkedArray | Array -> one contiguous Array
        return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

    words = pc.split_pattern(_arr(b["text"]), " ")
    lens = pc.list_value_length(words).to_numpy().astype(np.int64)
    flat = _arr(pc.list_flatten(words))
    codes = _arr(pc.dictionary_encode(flat)).indices.to_numpy().astype(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    order = np.lexsort((codes, doc_idx))
    di, cd = doc_idx[order], codes[order]
    new_grp = np.empty(len(di), dtype=bool)
    new_grp[0] = True
    np.logical_or(di[1:] != di[:-1], cd[1:] != cd[:-1], out=new_grp[1:])
    grp_doc = di[new_grp]                       # owning doc of each (doc,word) group
    n_distinct = np.bincount(grp_doc, minlength=n)
    starts = np.flatnonzero(new_grp)
    counts = np.diff(np.r_[starts, len(di)])    # occurrences per (doc,word)
    doc_first = np.empty(len(grp_doc), dtype=bool)
    doc_first[0] = True
    np.not_equal(grp_doc[1:], grp_doc[:-1], out=doc_first[1:])
    # split(" ") yields >=1 token per doc (even ""), so every doc owns
    # >=1 group and reduceat segments are non-empty
    max_c = np.maximum.reduceat(counts, np.flatnonzero(doc_first))
    return pa.table({
        "doc_id": b["doc_id"],
        "n_words": pa.array(lens),
        "n_distinct": pa.array(n_distinct.astype(np.int64)),
        "top_word_pml": pa.array((max_c.astype(np.int64) * 1000) // lens),
        "dup_word_pml": pa.array(((lens - n_distinct) * 1000) // lens),
    })


DOC_REPETITION_SQL = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (
  SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_words,
       COUNT(*) AS n_distinct,
       CAST((MAX(c) * 1000) // SUM(c) AS BIGINT) AS top_word_pml,
       CAST(((SUM(c) - COUNT(*)) * 1000) // SUM(c) AS BIGINT) AS dup_word_pml
FROM wc
GROUP BY doc_id
ORDER BY doc_id
"""


# --- approximate heavy hitters: Count-Min sketch (one pass, fixed state) ---

def doc_cms_heavy_terms(sf_dir: str, *, k: int = 20, cand_per_block: int = 64):
    """(term, est_cnt) — top-k corpus terms by Count-Min-estimated count:
    the ONE-PASS approximate sibling of ``doc_heavy_hitters`` (which needs
    two corpus passes for exactness).  Rows-only: CMS overestimates under
    collision; pytest pins the one-sided error bound, merge linearity and
    agreement with exact counts on this corpus.

    Scale shape: one fixed 256 KiB sketch + <= ``cand_per_block`` local
    top terms per block, merged through a combiner tree (sketches SUM,
    candidates union) — state is O(1) per block and the driver never sees
    a corpus-sized vocabulary.  The candidate recall argument is the same
    averaging bound as doc_heavy_hitters pass 1.
    """
    import pickle

    from .. import tune_worker_threads
    from ..functions.sketches import cms_build, cms_merge, cms_query

    ds = read_table(sf_dir, "documents", columns=["text"])

    def _arr(x):
        return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

    def _row(sk: np.ndarray, cands: np.ndarray) -> pa.Table:
        return pa.table({
            "sketch": pa.array([pickle.dumps(sk)], type=pa.binary()),
            "cands": pa.array([[str(c) for c in cands]],
                              type=pa.list_(pa.string())),
        })

    def sketch(b: pa.Table) -> pa.Table:
        tune_worker_threads()
        flat = _arr(pc.list_flatten(pc.split_pattern(_arr(b["text"]), " ")))
        vc = _arr(pc.value_counts(flat))
        terms, counts = vc.field("values"), vc.field("counts").to_numpy()
        top = np.argsort(-counts, kind="stable")[:cand_per_block]
        return _row(cms_build(terms, counts),
                    np.asarray(terms.to_pylist(), dtype=object)[top])

    # candidate-union bound: at 100 TB the union across ~10^5-10^6 blocks
    # could reach tens of millions of strings; each merge hop prunes to the
    # top CAND_CAP by the locally-merged sketch estimate (a global heavy
    # hitter is heavy within its merge subtree, the SpaceSaving-style recall
    # argument; approximate by construction, pinned by pytest on this corpus)
    CAND_CAP = 4096

    def merge(t: pa.Table) -> pa.Table:
        sk = cms_merge([pickle.loads(s) for s in t["sketch"].to_pylist()])
        lists = [np.asarray(c, dtype=object) for c in t["cands"].to_pylist()]
        cands = (np.unique(np.concatenate(lists)) if lists
                 else np.array([], dtype=object))
        if len(cands) > CAND_CAP:
            est = cms_query(sk, pa.array(list(cands), type=pa.string()))
            cands = cands[np.argsort(-est, kind="stable")[:CAND_CAP]]
        return _row(sk, cands)

    def finalize(t: pa.Table) -> pa.Table:
        sk = pickle.loads(t["sketch"][0].as_py())
        cands_py = t["cands"][0].as_py()
        est = cms_query(sk, pa.array(cands_py, type=pa.string()))
        # candidate list is combiner-bounded (<= blocks x cand_per_block),
        # so a driver-side top-k sort here is O(candidates), not O(vocab)
        order = sorted(range(len(est)),
                       key=lambda i: (-est[i], cands_py[i]))[:k]
        return pa.table({
            "term": pa.array([cands_py[i] for i in order], type=pa.string()),
            "est_cnt": pa.array([int(est[i]) for i in order],
                                type=pa.int64())})

    from ..stages.aggregate import tree_combine

    parts = ds.map_batches(sketch, batch_format="pyarrow", batch_size=None)
    merged = tree_combine(parts, merge, fanin=8)
    return merged.map_batches(finalize, batch_format="pyarrow",
                              batch_size=None)


# --- exact heavy hitters, shuffle-free (two-pass local-threshold plan) -----

def doc_heavy_hitters(sf_dir: str, *, k: int = 30):
    """(term, cnt) for every word whose corpus frequency is >= 1/k of all
    word occurrences — EXACT result with NO corpus-sized shuffle, in
    contrast to ``doc_term_df`` which hash-shuffles the full vocabulary.
    The classic two-pass heavy-hitter plan (Misra-Gries-style recall
    guarantee with exact block counts):

    * pass 1: per block, exact local counts (``dictionary_encode`` +
      ``bincount``); emit terms with ``cnt_b * k >= n_b`` plus the block
      total.  Averaging argument: a term with global ``cnt * k >= N``
      must be a local heavy hitter in >= 1 block (else summing the strict
      inequalities contradicts the global one), so the candidate union
      (<= k rows per block) has perfect recall.
    * pass 2: broadcast the candidate list; per block count ONLY candidate
      occurrences (``index_in`` + ``bincount``); tree-merge the bounded
      partials; keep ``cnt * k >= N``.

    Driver holds only the candidate union (<= k x blocks rows); worker
    state is one block's dictionary at a time.
    """
    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "documents", columns=["text"])

    def _arr(x):
        return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

    def pass1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"term": pa.array([None], type=pa.string()),
                             "cnt": pa.array([0], type=pa.int64())})
        flat = _arr(pc.list_flatten(pc.split_pattern(_arr(b["text"]), " ")))
        d = _arr(pc.dictionary_encode(flat))
        idx = d.indices.to_numpy().astype(np.int64)
        cnt = np.bincount(idx, minlength=len(d.dictionary))
        nb = np.int64(len(idx))
        cand = np.flatnonzero(cnt * k >= nb)
        terms = d.dictionary.take(pa.array(cand)).cast(pa.string())
        return pa.table({
            # null term row = the block's word total (for N)
            "term": pa.concat_arrays([terms, pa.array([None], type=pa.string())]),
            "cnt": pa.array(np.r_[cnt[cand], nb].astype(np.int64)),
        })

    p1 = pa.concat_tables(list(
        ds.map_batches(pass1, batch_format="pyarrow", batch_size=None)
          .iter_batches(batch_format="pyarrow", batch_size=None)))
    is_total = pc.is_null(p1["term"])
    n_total = pc.sum(p1.filter(is_total)["cnt"]).as_py() or 0
    cand_terms = pc.unique(_arr(p1.filter(pc.invert(is_total))["term"]))
    if n_total == 0 or len(cand_terms) == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})

    def pass2(b: pa.Table) -> pa.Table:
        flat = _arr(pc.list_flatten(pc.split_pattern(_arr(b["text"]), " ")))
        pos = pc.index_in(flat, value_set=cand_terms)
        pos = pos.drop_null().to_numpy().astype(np.int64)
        cnt = np.bincount(pos, minlength=len(cand_terms))
        return pa.table({"term": cand_terms,
                         "cnt": pa.array(cnt.astype(np.int64))})

    merged = tree_merge(
        ds.map_batches(pass2, batch_format="pyarrow", batch_size=None),
        ["term"], [("cnt", "sum")])

    def finalize(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.greater_equal(pc.multiply(b["cnt"], k), n_total))
        return keep.sort_by([("term", "ascending")])

    out = merged.map_batches(finalize, batch_format="pyarrow", batch_size=None)
    return pa.concat_tables(list(
        out.iter_batches(batch_format="pyarrow", batch_size=None)))


DOC_HEAVY_HITTERS_SQL = """
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM words)
SELECT w AS term, CAST(COUNT(*) AS BIGINT) AS cnt
FROM words, tot
GROUP BY w, tot.n
HAVING COUNT(*) * 30 >= tot.n
ORDER BY term
"""


# --- deterministic global shuffle (training-shard assignment) --------------

SHUFFLE_KNUTH = 2654435761  # Knuth multiplicative hash constant (2^32 / phi)

# ONE definition of the shard rule, shared by doc_shuffle_shards and
# doc_pack_sequences (python + SQL) so the assignments cannot drift apart.
# Arithmetic stays in [0, 2^64): ids fold mod 2^32 first so the product
# never wraps (HUGEINT on the SQL side for the same reason).


def knuth_shard(ids: np.ndarray, n_shards: int) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    # x % 2^32 == x & (2^32-1) on unsigned ints; the bitwise form skips
    # numpy's 64-bit division (~10x faster, same SQL-twin arithmetic)
    mask32 = np.uint64((1 << 32) - 1)
    with np.errstate(over="ignore"):
        h = ((ids & mask32) * np.uint64(SHUFFLE_KNUTH)) & mask32
    return (h % np.uint64(n_shards)).astype(np.int64)


def knuth_shard_sql(n_shards: int) -> str:
    return (f"CAST((CAST(doc_id % 4294967296 AS HUGEINT) * {SHUFFLE_KNUTH})"
            f" % 4294967296 % {n_shards} AS BIGINT)")


def doc_shuffle_shards(sf_dir: str, *, n_shards: int = 16):
    """(doc_id, shard) — deterministic pseudo-random training-shard
    assignment via the Knuth multiplicative hash.  The scale answer to
    ``Dataset.random_shuffle()`` for training output: no all-to-all
    shuffle and no RNG state; each doc's shard is a pure function of its
    id, so the assignment is resumable, reproducible across engines (the
    SQL oracle computes the identical arithmetic) and the actual data
    movement is a single hive-partitioned ``write_parquet`` by ``shard``
    (one directory per shard, exactly the flagship's sink layout).
    Arithmetic stays in [0, 2^64): ids are folded mod 2^32 first so the
    product never wraps.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def assign(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "shard": pa.array(knuth_shard(np.asarray(b["doc_id"]), n_shards)),
        })

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


# HUGEINT for the product: (2^32-1) * 2654435761 overflows BIGINT (the
# uint64 side has headroom: ~1.1e19 < 2^64)
DOC_SHUFFLE_SHARDS_SQL = f"""
SELECT doc_id, {knuth_shard_sql(16)} AS shard
FROM documents
ORDER BY doc_id
"""


# --- training-sequence packing ---------------------------------------------

def doc_pack_sequences(sf_dir: str, *, n_shards: int = 16, budget: int = 512):
    """(doc_id, shard, pack_id, pack_offset) — deterministic sequence
    packing for pretraining output: docs are assigned to shards by the
    Knuth hash (same rule as ``doc_shuffle_shards``), then packed in
    doc_id order into fixed ``budget``-token bins by exclusive prefix sum
    (a doc whose tokens straddle a boundary opens the next pack —
    cumulative semantics, identical arithmetic in the SQL oracle's window
    function).

    Scale shape: one pass emits compact rows (doc_id, shard, n_tok);
    ONE hash shuffle by shard co-locates each shard; the per-shard prefix
    sum is one vectorized lexsort + cumsum per partition.  Each shard must
    fit one task — size ``n_shards`` ∝ corpus (the same contract as the
    streaming shards' ``auto_shard_count``).
    """
    from ..stages.shuffle import hash_partition

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        return pa.table({
            "doc_id": b["doc_id"],
            "shard": pa.array(knuth_shard(np.asarray(b["doc_id"]), n_shards)),
            "n_tok": pc.cast(pc.list_value_length(words), pa.int64()),
        })

    compact = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def pack(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({k: pa.array([], type=pa.int64())
                             for k in ("doc_id", "shard", "pack_id", "pack_offset")})
        ids = np.asarray(b["doc_id"])
        shard = np.asarray(b["shard"])
        ntok = np.asarray(b["n_tok"])
        order = np.lexsort((ids, shard))
        s, n = shard[order], ntok[order]
        c = np.cumsum(n) - n                     # exclusive prefix sum
        seg_first = np.empty(len(s), dtype=bool)
        seg_first[0] = True
        np.not_equal(s[1:], s[:-1], out=seg_first[1:])
        base = c[seg_first][np.cumsum(seg_first) - 1]  # shard-start broadcast
        cum = c - base
        return pa.table({
            "doc_id": pa.array(ids[order]),
            "shard": pa.array(s),
            "pack_id": pa.array(cum // budget),
            "pack_offset": pa.array(cum % budget),
        })

    return hash_partition(compact, ["shard"], min(8, n_shards)).map_batches(
        pack, batch_format="pyarrow", batch_size=None)


DOC_PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id, {knuth_shard_sql(16)} AS shard,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
),
c AS (
  SELECT doc_id, shard,
         COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM t
)
SELECT doc_id, shard,
       CAST(cum // 512 AS BIGINT) AS pack_id,
       CAST(cum % 512 AS BIGINT) AS pack_offset
FROM c
ORDER BY doc_id
"""


# --- fixed-window token chunking --------------------------------------------

def doc_chunk(sf_dir: str, *, window: int = 32):
    """(doc_id, chunk_id, tok_start, tok_len) — split each document into
    fixed ``window``-token context chunks (the map side of training-sequence
    preparation; ``doc_pack_sequences`` is the bin-packing counterpart).

    Scale shape: a pure shuffle-free map — each batch expands rows locally with
    one np.repeat/arange pass (no Python loop, no exchange); output rows ∝
    corpus tokens / window and stream straight to the consumer.  Token rule
    is the same single-space split as ``doc_pack_sequences`` so the two
    operators agree on budgets.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        ntok = np.asarray(pc.list_value_length(pc.split_pattern(b["text"], " ")),
                          dtype=np.int64)
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        nchunks = (ntok + window - 1) // window      # ntok >= 1 (split of "")
        total = int(nchunks.sum())
        doc_rep = np.repeat(ids, nchunks)
        ntok_rep = np.repeat(ntok, nchunks)
        first_of_doc = np.repeat(np.cumsum(nchunks) - nchunks, nchunks)
        chunk_id = np.arange(total, dtype=np.int64) - first_of_doc
        tok_start = chunk_id * window
        return pa.table({
            "doc_id": pa.array(doc_rep, type=pa.int64()),
            "chunk_id": pa.array(chunk_id, type=pa.int64()),
            "tok_start": pa.array(tok_start, type=pa.int64()),
            "tok_len": pa.array(np.minimum(window, ntok_rep - tok_start),
                                type=pa.int64()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow",
                          batch_size=None)


# DuckDB 1.0 has no lateral generate_series over a column; the scalar
# list-returning form + UNNEST expands identically.
DOC_CHUNK_SQL = """
SELECT doc_id, chunk_id, chunk_id * 32 AS tok_start,
       LEAST(32, n_tok - chunk_id * 32) AS tok_len
FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
             UNNEST(generate_series(0,
                 CAST((len(string_split(text, ' ')) - 1) // 32 AS BIGINT))) AS chunk_id
      FROM documents)
ORDER BY doc_id, chunk_id
"""


# --- per-doc top term by tf/df (tf-idf-shaped, integer score) ---------------

def doc_tfidf_top(sf_dir: str, *, num_partitions: int | None = None):
    """(doc_id, top_term, score) — each document's most distinctive term by
    an integer tf-idf-shaped score ``tf * 1e6 // df`` (idf = 1/df keeps the
    arithmetic exact in both engines; log-idf would hash-mismatch on floats).
    Ties break toward the lexicographically smallest term.

    Scale shape: per-block (doc, term, tf) rows (one lexsort+run-length pass,
    docs never straddle blocks because documents are one row each); ONE hash
    exchange by term — each partition then holds ALL rows of its terms, so
    df is a partition-local count (no second df table, no join operator);
    ONE hash exchange back by doc_id for the per-doc argmax.  Both exchanges
    move compact integer+term rows, never text.
    """
    from ..stages.shuffle import hash_partition, input_size_bytes
    from .streaming import auto_shard_count

    if num_partitions is None:
        num_partitions = auto_shard_count(
            input_size_bytes(f"{sf_dir}/documents.parquet"))
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def block_tf(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        toks = pc.utf8_split_whitespace(pc.utf8_lower(b["text"]))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(object)
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        doc_of = np.repeat(ids, np.diff(off))
        nonempty = np.asarray([len(x) > 0 for x in flat], dtype=bool)
        flat, doc_of = flat[nonempty], doc_of[nonempty]
        if len(flat) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string()),
                             "tf": pa.array([], type=pa.int64())})
        order = np.lexsort((flat, doc_of))
        f, d = flat[order], doc_of[order]
        first = np.ones(len(f), dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (f[1:] != f[:-1])
        starts = np.flatnonzero(first)
        tf = np.diff(np.append(starts, len(f)))
        return pa.table({"doc_id": pa.array(d[starts]),
                         "term": pa.array(f[starts], type=pa.string()),
                         "tf": pa.array(tf.astype(np.int64))})

    tf_rows = ds.map_batches(block_tf, batch_format="pyarrow", batch_size=None)

    # exchange 1: by term — df is a partition-local run length
    def score_in_partition(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string()),
                             "score": pa.array([], type=pa.int64())})
        term = b["term"].to_numpy(zero_copy_only=False).astype(object)
        tf = np.asarray(b["tf"], dtype=np.int64)
        order = np.argsort(term, kind="stable")
        t_sorted = term[order]
        first = np.ones(len(t_sorted), dtype=bool)
        first[1:] = t_sorted[1:] != t_sorted[:-1]
        seg = np.cumsum(first) - 1
        df_per_seg = np.bincount(seg)           # (doc, term) rows are unique
        df = np.empty(len(term), dtype=np.int64)
        df[order] = df_per_seg[seg]
        return pa.table({"doc_id": b["doc_id"],
                         "term": b["term"],
                         "score": pa.array((tf * 1_000_000) // df)})

    scored = hash_partition(tf_rows, ["term"], num_partitions).map_batches(
        score_in_partition, batch_format="pyarrow", batch_size=None)

    # exchange 2: by doc — per-doc argmax (score desc, term asc)
    def doc_argmax(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "top_term": pa.array([], type=pa.string()),
                             "score": pa.array([], type=pa.int64())})
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        term = b["term"].to_numpy(zero_copy_only=False).astype(object)
        score = np.asarray(b["score"], dtype=np.int64)
        order = np.lexsort((term, -score, ids))
        i, t, s = ids[order], term[order], score[order]
        first = np.ones(len(i), dtype=bool)
        first[1:] = i[1:] != i[:-1]
        return pa.table({"doc_id": pa.array(i[first]),
                         "top_term": pa.array(t[first], type=pa.string()),
                         "score": pa.array(s[first])})

    return hash_partition(scored, ["doc_id"], num_partitions).map_batches(
        doc_argmax, batch_format="pyarrow", batch_size=None)


DOC_TFIDF_TOP_SQL = """
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(string_split_regex(lower(text), '\\s+')) AS term
        FROM documents)
  WHERE term <> '' GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, CAST(tf.tf * 1000000 // df.df AS BIGINT) AS score
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term AS top_term, score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn
      FROM scored)
WHERE rn = 1
ORDER BY doc_id
"""


# --- weighted dataset mixing -------------------------------------------------

MIX_SALT = 12345  # decorrelates the mix hash from the shard hash (same Knuth
                  # constant, different input) so mixing doesn't bias shards


def doc_mix_sources(sf_dir: str):
    """(source, weight_permille, n_total, n_kept) — deterministic weighted
    source mixing: each source gets a keep-rate from its numeric suffix
    (``src0`` = 1000‰ … downweighted by 45‰ per index mod 20 — the stand-in
    for a curated mixture table), and a doc survives iff its salted Knuth
    hash lands under the source's threshold.  The no-RNG re-expression of
    weighted dataset interleaving for training mixtures: membership is a
    pure function of (doc_id, source), so the mix is resumable and
    reproducible across engines (the SQL oracle computes the identical
    arithmetic).

    Scale shape: ONE corpus pass of per-block partial census rows (mixture
    source lists are small by definition) -> combiner-tree merge; the kept
    rows themselves never need to move — a downstream stage re-derives the
    keep bit from doc_id for free.
    """
    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def census(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.uint64)
        h = (((ids + np.uint64(MIX_SALT)) % np.uint64(1 << 32))
             * np.uint64(SHUFFLE_KNUTH)) % np.uint64(1 << 32) % np.uint64(1000)
        srcnum = np.asarray(
            pc.cast(pc.utf8_slice_codeunits(b["source"], 3, 32), pa.int64()),
            dtype=np.int64)
        weight = 1000 - (srcnum % 20) * 45
        t = pa.table({
            "source": b["source"],
            "weight_permille": pa.array(weight),
            "n_total": pa.array(np.ones(len(ids), dtype=np.int64)),
            "n_kept": pa.array((h.astype(np.int64) < weight).astype(np.int64)),
        })
        g = t.group_by(["source", "weight_permille"]).aggregate(
            [("n_total", "sum"), ("n_kept", "sum")])
        return g.rename_columns(["source", "weight_permille", "n_total", "n_kept"])

    partial = ds.map_batches(census, batch_format="pyarrow", batch_size=None)
    merged = tree_merge(partial, ["source", "weight_permille"],
                        [("n_total", "sum"), ("n_kept", "sum")], fanin=8)
    return merged.sort("source")


DOC_MIX_SOURCES_SQL = f"""
WITH w AS (
  SELECT doc_id, source,
         1000 - (CAST(substr(source, 4) AS BIGINT) % 20) * 45 AS weight_permille,
         CAST((CAST((doc_id + {MIX_SALT}) % 4294967296 AS HUGEINT)
               * {SHUFFLE_KNUTH}) % 4294967296 % 1000 AS BIGINT) AS h
  FROM documents
)
SELECT source, weight_permille,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN h < weight_permille THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM w
GROUP BY source, weight_permille
ORDER BY source
"""


# --- quality-classifier inference (fasttext-style filter, integer linear) ---

class QualityClassifier:
    """Actor-pool inference stage — the quality-filter model of an LLM data
    pipeline (fastText / Gopher-rules stand-in).  The "model" (integer
    weight vector + stopword table) is built ONCE per actor in
    ``__init__``; ``__call__`` scores a whole batch vectorized.  Integer
    arithmetic end to end so the DuckDB oracle reproduces scores exactly.

    score = W_STOP * stopword_hits + n_tokens - |mean_tok_len_x100 - TARGET| // DIV
    keep  = score >= THRESHOLD and MIN_TOKENS <= n_tokens <= MAX_TOKENS
    """

    W_STOP = 10
    TARGET_MEAN100 = 450
    DIV = 25
    THRESHOLD = 20
    MIN_TOKENS = 5
    MAX_TOKENS = 100_000

    def __init__(self):
        from .. import tune_worker_threads

        tune_worker_threads()
        # real version: self.model = fasttext.load_model(...)
        self.stopwords = pa.array(sorted(_STOPWORDS["en"]))

    def __call__(self, b: pa.Table) -> pa.Table:
        from ..functions.hashing import segment_sum

        # null text scores like an empty doc (the test corpus is null-free,
        # but a real crawl isn't; an unguarded null wraps the int64 cast)
        text = pc.fill_null(b["text"], "")
        ntok = np.asarray(pc.count_substring_regex(text, r"\S+"), dtype=np.int64)
        nonspace = np.asarray(pc.count_substring_regex(text, r"\S"), dtype=np.int64)
        mean100 = np.where(ntok > 0, nonspace * 100 // np.maximum(ntok, 1), 0)
        toks = pc.utf8_split_whitespace(pc.utf8_lower(text))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        hit = np.asarray(pc.is_in(toks.flatten(), value_set=self.stopwords),
                         dtype=np.int64)
        stop_hits = (segment_sum(hit, off) if len(hit)
                     else np.zeros(b.num_rows, dtype=np.int64))
        score = (self.W_STOP * stop_hits + ntok
                 - np.abs(mean100 - self.TARGET_MEAN100) // self.DIV)
        keep = ((score >= self.THRESHOLD) & (ntok >= self.MIN_TOKENS)
                & (ntok <= self.MAX_TOKENS)).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "score": pa.array(score.astype(np.int64)),
            "keep": pa.array(keep),
        })


def doc_quality_classifier(sf_dir: str):
    """(doc_id, score, keep) — model-scored quality filtering as an
    autoscaling actor pool; embarrassingly parallel, zero shuffle, no
    trailing sort (corpus-proportional output)."""
    from .. import auto_pool_size

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(QualityClassifier, batch_format="pyarrow",
                          batch_size=None, concurrency=auto_pool_size())


_QC = QualityClassifier
_QC_STOPS = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS["en"]))
DOC_QUALITY_CLASSIFIER_SQL = f"""
WITH f AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS ntok,
         CASE WHEN trim(text) = '' THEN 0
              ELSE CAST(length(regexp_replace(text, '\\s', '', 'g')) * 100
                   // GREATEST(len(string_split_regex(trim(text), '\\s+')), 1)
                   AS BIGINT) END AS mean100,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x IN ({_QC_STOPS}))) AS stop_hits
  FROM documents)
SELECT doc_id,
       CAST({_QC.W_STOP} * stop_hits + ntok
            - ABS(mean100 - {_QC.TARGET_MEAN100}) // {_QC.DIV} AS BIGINT) AS score,
       CAST(CASE WHEN {_QC.W_STOP} * stop_hits + ntok
                      - ABS(mean100 - {_QC.TARGET_MEAN100}) // {_QC.DIV}
                      >= {_QC.THRESHOLD}
                  AND ntok BETWEEN {_QC.MIN_TOKENS} AND {_QC.MAX_TOKENS}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM f
ORDER BY doc_id
"""


# --- vocabulary-coverage (OOV-rate) scoring ---------------------------------

VOCAB_MIN_DF_PCT = 2  # shared with the generated SQL oracle below


def doc_vocab_coverage(sf_dir: str, *, min_df_pct: int = VOCAB_MIN_DF_PCT,
                       num_partitions: int = 8):
    """(doc_id, n_words, n_oov, oov_pm) — out-of-vocabulary rate per doc
    against a corpus-derived vocabulary (the cheap stand-in for LM-
    perplexity quality scoring; RefinedWeb/CCNet use the same shape).

    Two passes + one broadcast, no corpus-sized shuffle of payloads:
    pass 1 computes document frequency per term (block-local distinct ->
    ONE hash exchange by term) and keeps terms whose df >= ``min_df_pct``%
    of docs — a deterministic threshold vocabulary (no top-K tie
    ambiguity).  The vocab is broadcast via ``ray.put`` (bounded: df
    threshold caps it at 100/min_df_pct x corpus-average distinct terms);
    pass 2 scores every doc vectorized with one ``is_in`` kernel.
    """
    import ray

    import pyarrow.parquet as pq

    from ..stages.shuffle import hash_merge

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def block_df(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        toks = pc.utf8_split_whitespace(pc.utf8_lower(b["text"]))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(object)
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        doc_of = np.repeat(np.arange(len(off) - 1, dtype=np.int64), np.diff(off))
        nonempty = np.asarray([len(x) > 0 for x in flat], dtype=bool)
        flat, doc_of = flat[nonempty], doc_of[nonempty]
        order = np.lexsort((flat, doc_of))
        f, d = flat[order], doc_of[order]
        keep = np.ones(len(f), dtype=bool)
        if len(f) > 1:
            keep[1:] = (d[1:] != d[:-1]) | (f[1:] != f[:-1])
        t = pa.table({"term": pa.array(f[keep], type=pa.string())})
        g = t.group_by(["term"]).aggregate([([], "count_all")])
        return g.rename_columns(["term", "df"])

    partial = ds.map_batches(block_df, batch_format="pyarrow", batch_size=None)
    merged = hash_merge(partial, ["term"], [("df", "sum")],
                        num_partitions=num_partitions)

    def above_threshold(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(
            pc.multiply(b["df"].cast(pa.int64()), 100),
            min_df_pct * n_docs)).select(["term"])

    batches = list(
        merged.map_batches(above_threshold, batch_format="pyarrow",
                           batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None))
    vocab = (pa.concat_tables(batches)["term"].combine_chunks()
             if batches else pa.array([], type=pa.string()))
    vocab_ref = ray.put(vocab)

    def score(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads
        from ..functions.hashing import segment_sum

        tune_worker_threads()
        vocab = ray.get(vocab_ref)
        toks = pc.utf8_split_whitespace(pc.utf8_lower(b["text"]))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        lens = np.asarray(pc.binary_length(flat), dtype=np.int64)
        word = (lens > 0).astype(np.int64)
        inv = np.asarray(pc.is_in(flat, value_set=vocab), dtype=np.int64)
        oov = word * (1 - inv)
        if len(flat):
            n_words = segment_sum(word, off)
            n_oov = segment_sum(oov, off)
        else:
            n_words = np.zeros(b.num_rows, dtype=np.int64)
            n_oov = np.zeros(b.num_rows, dtype=np.int64)
        pm = np.where(n_words > 0, 1000 * n_oov // np.maximum(n_words, 1), 0)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_words": pa.array(n_words),
            "n_oov": pa.array(n_oov),
            "oov_pm": pa.array(pm.astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


DOC_VOCAB_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT doc_id, t
  FROM (SELECT doc_id, UNNEST(string_split_regex(lower(text), '\\s+')) AS t
        FROM documents)
  WHERE t <> ''),
vocab AS (
  SELECT t FROM (SELECT t, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY t)
  WHERE df * 100 >= {VOCAB_MIN_DF_PCT} * (SELECT COUNT(*) FROM documents)),
per AS (
  SELECT doc_id, COUNT(*) AS n_words,
         SUM(CASE WHEN t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END) AS n_oov
  FROM toks GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(per.n_words, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(per.n_oov, 0) AS BIGINT) AS n_oov,
       CAST(CASE WHEN COALESCE(per.n_words, 0) > 0
                 THEN 1000 * per.n_oov // per.n_words ELSE 0 END AS BIGINT)
         AS oov_pm
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
"""


# --- byte-bigram LM quality score (the CCNet/Gopher perplexity-filter
# shape: train a cheap LM on a corpus sample, score every doc, filter on
# bits-per-byte) -------------------------------------------------------------

LM_SAMPLE_MOD = 10      # train on ~1/10 of docs (deterministic id hash)
_LM_KNUTH = 2654435761  # Fibonacci-hash multiplier for the sample pick


def _byte_pairs(b: pa.Table):
    """Vectorized per-doc byte-bigram extraction for a pyarrow batch.

    Returns ``(pair_ids, poff)``: all within-doc byte pairs of the batch
    in document order (``pair_ids[k] = byte_i * 256 + byte_{i+1}``), plus
    per-doc segment offsets into that array (``poff`` has len(docs)+1
    entries; empty/1-byte docs get empty segments).  Zero-copy off the
    Arrow buffers; cross-doc boundary pairs are dropped by construction.
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
    npairs = np.maximum(np.diff(off) - 1, 0)
    poff = np.concatenate([[0], np.cumsum(npairs)])
    if len(data) < 2:
        return np.empty(0, dtype=np.int64), poff
    pairs = data[:-1].astype(np.int64) * 256 + data[1:]
    valid = np.ones(len(data) - 1, dtype=bool)
    ends = off[1:-1]                       # boundary between doc j and j+1
    ends = ends[(ends > 0) & (ends <= len(valid))]
    valid[ends - 1] = False                # pair straddling the boundary
    # empty docs in the middle also invalidate the PREVIOUS position once —
    # already covered: a zero-length doc contributes no in-range positions
    # and its boundary equals its neighbor's, masking the same slot.
    return pairs[valid], poff


def doc_lm_score(sf_dir: str, *, sample_mod: int = LM_SAMPLE_MOD,
                 fanin: int = 8, _with_lang: bool = False):
    """(doc_id, n_pairs, bits_x1000) — byte-bigram language-model score per
    document: mean ``-log2 P(next byte | byte)`` under an add-one-smoothed
    bigram model trained on a deterministic ~1/``sample_mod`` sample of the
    corpus itself.  This is the CCNet/Gopher "perplexity filter" shape with
    the KenLM swapped for a 64 KiB byte-bigram table: gibberish/binary spew
    scores high bits-per-byte, fluent text scores low, and the filter
    thresholds on it.

    Scale shape: pass 1 emits a (bigram_id, cnt) partial per block — the
    key set is bounded at 65,536 regardless of corpus size, so the
    combiner tree (``tree_merge``) applies; the merged model (<= 0.5 MiB)
    broadcasts via ``ray.put`` and pass 2 scores every doc with two
    gathers + one ``segment_sum``.  No corpus-sized shuffle, text never
    leaves its block, output is corpus-∝ and sortless.  Per-doc sums use
    ``segment_sum`` (not a batch cumsum) so the float reduction order is
    per-document — results are independent of block coalescing.

    Rows-only (log2 arithmetic is not reasonably SQL-expressible): pytest
    pins exact integer equality against a serial Python oracle plus the
    fluent-text-beats-noise ordering property.
    """
    import ray

    from ..functions.hashing import segment_sum
    from ..stages.aggregate import tree_merge

    cols = ["doc_id", "text"] + (["lang"] if _with_lang else [])
    ds = read_table(sf_dir, "documents", columns=cols)

    def sample_counts(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        pick = ((ids * _LM_KNUTH) % (1 << 32)) % sample_mod == 0
        sub = b.filter(pa.array(pick))
        if sub.num_rows == 0:
            return pa.table({"bigram_id": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        pairs, _ = _byte_pairs(sub)
        cnt = np.bincount(pairs, minlength=65536).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bigram_id": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(cnt[nz])})

    partial = ds.map_batches(sample_counts, batch_format="pyarrow",
                             batch_size=None)
    merged = tree_merge(partial, ["bigram_id"], [("cnt", "sum")], fanin=fanin)
    batches = list(merged.iter_batches(batch_format="pyarrow",
                                       batch_size=None))
    cnt = np.zeros(65536, dtype=np.int64)
    if batches:
        t = pa.concat_tables([pa.Table.from_batches([x]) if
                              isinstance(x, pa.RecordBatch) else x
                              for x in batches])
        cnt[np.asarray(t["bigram_id"], dtype=np.int64)] = \
            np.asarray(t["cnt"], dtype=np.int64)
    row_tot = cnt.reshape(256, 256).sum(axis=1)
    logp = np.log2((cnt + 1.0) / np.repeat(row_tot + 256.0, 256))
    logp_ref = ray.put(logp)

    def score(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        table = ray.get(logp_ref)
        pairs, poff = _byte_pairs(b)
        lp = table[pairs] if len(pairs) else np.empty(0, dtype=np.float64)
        sums = segment_sum(lp, poff)
        n = np.diff(poff)
        bits = np.where(n > 0, -sums / np.maximum(n, 1), 0.0)
        out = {
            "doc_id": b["doc_id"],
            "n_pairs": pa.array(n.astype(np.int64)),
            "bits_x1000": pa.array(np.floor(bits * 1000).astype(np.int64)),
        }
        if _with_lang:
            out["lang"] = b["lang"]
        return pa.table(out)

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


# --- CCNet head/middle/tail perplexity buckets -------------------------------

CCNET_BUCKETS = 3


def doc_ccnet_buckets(sf_dir: str, *, n_buckets: int = CCNET_BUCKETS,
                      num_partitions: int | None = None):
    """(doc_id, lang, bits_x1000, bucket) — CCNet's head/middle/tail split:
    per LANGUAGE, rank documents by LM score (``doc_lm_score``'s
    bits-per-byte, ascending — fluent text first) and cut into
    ``n_buckets`` NTILE groups (bucket 1 = head = most fluent).  The
    pretraining-mix primitive: loaders sample head/middle heavily and
    drop or down-weight tail.

    Scale shape: scores are corpus-∝ compact rows (ONE corpus pass via
    ``doc_lm_score``); the (lang, bits) histogram is BOUNDED (score domain
    is per-mille bits-per-byte), so exact global ranks come from a
    combiner-tree census + driver-side cumulative offsets (the
    ``q_rank_customers`` trick) — no corpus-wide sort.  One compact hash
    exchange by (lang, bits) then gives each tied group its within-group
    doc_id order, so NTILE's row-level tie-break (bits, doc_id) is exact.
    Output corpus-∝ and sortless.

    Rows-only (the LM score is not SQL-expressible); pytest pins the
    buckets against a serial pandas NTILE replica over the same scores.
    """
    import ray

    from ..stages.aggregate import tree_merge
    from ..stages.shuffle import hash_partition, input_size_bytes
    from .streaming import auto_shard_count

    if num_partitions is None:
        num_partitions = auto_shard_count(
            input_size_bytes(f"{sf_dir}/documents.parquet"))
    scored = doc_lm_score(sf_dir, _with_lang=True)

    def hist(b: pa.Table) -> pa.Table:
        g = (b.select(["lang", "bits_x1000"])
             .group_by(["lang", "bits_x1000"]).aggregate([([], "count_all")]))
        return g.rename_columns(["lang", "bits_x1000", "cnt"])

    partial = scored.map_batches(hist, batch_format="pyarrow",
                                 batch_size=None)
    merged = tree_merge(partial, ["lang", "bits_x1000"], [("cnt", "sum")])
    t = pa.concat_tables(list(merged.iter_batches(batch_format="pyarrow",
                                                  batch_size=None)))
    df = t.to_pandas().sort_values(["lang", "bits_x1000"])
    base: dict = {}
    sizes: dict = {}
    for lang, g in df.groupby("lang", sort=False):
        cum = g.cnt.cumsum().shift(1, fill_value=0).astype(int)
        for bits, off in zip(g.bits_x1000, cum):
            base[(lang, int(bits))] = int(off)
        sizes[lang] = int(g.cnt.sum())
    maps_ref = ray.put((base, sizes))

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "bits_x1000": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        base_m, sizes_m = ray.get(maps_ref)
        lang = np.asarray(b["lang"].to_pylist(), dtype=object)
        bits = np.asarray(b["bits_x1000"], dtype=np.int64)
        did = np.asarray(b["doc_id"], dtype=np.int64)
        order = np.lexsort((did, bits, lang))
        lang_s, bits_s, did_s = lang[order], bits[order], did[order]
        new_g = np.ones(len(order), dtype=bool)
        new_g[1:] = (lang_s[1:] != lang_s[:-1]) | (bits_s[1:] != bits_s[:-1])
        g_first = np.maximum.accumulate(np.where(new_g,
                                                 np.arange(len(order)), 0))
        within = np.arange(len(order)) - g_first
        starts = np.flatnonzero(new_g)
        g_base = np.empty(len(starts), dtype=np.int64)
        g_n = np.empty(len(starts), dtype=np.int64)
        for i, s in enumerate(starts):          # bounded: distinct (lang,bits)
            g_base[i] = base_m[(lang_s[s], int(bits_s[s]))]
            g_n[i] = sizes_m[lang_s[s]]
        seg_id = np.cumsum(new_g) - 1
        rank = g_base[seg_id] + within          # 0-based global rank per lang
        n = g_n[seg_id]
        q, r = n // n_buckets, n % n_buckets
        big = r * (q + 1)
        bucket = np.where(rank < big, rank // np.maximum(q + 1, 1),
                          r + (rank - big) // np.maximum(q, 1)) + 1
        return pa.table({"doc_id": pa.array(did_s),
                         "lang": pa.array(lang_s.astype(str)),
                         "bits_x1000": pa.array(bits_s),
                         "bucket": pa.array(bucket.astype(np.int64))})

    return hash_partition(scored, ["lang", "bits_x1000"],
                          num_partitions).map_batches(
        assign, batch_format="pyarrow", batch_size=None)


# --- DSIR-style importance weights (data selection) --------------------------

DSIR_BUCKETS = 16384          # hashed feature space per n-gram order
DSIR_TARGET_LANG = "en"       # the "target domain" seed set


def doc_dsir_weights(sf_dir: str, *, buckets: int = DSIR_BUCKETS,
                     target_lang: str = DSIR_TARGET_LANG, fanin: int = 8):
    """(doc_id, n_feats, logw_x1e6) — hashed-n-gram importance weight per
    document: mean log-likelihood ratio of the doc's unigram+bigram hash
    features under a target-domain bag model vs the raw-corpus bag model
    (the DSIR data-selection statistic — docs scoring high look like the
    target domain and get up-sampled).  Target seed = the corpus's
    ``lang == target_lang`` slice; both models are add-one-smoothed
    multinomials over ``2 x buckets`` hashed features.

    Scale shape: pass 1 emits a (bucket, tgt_cnt, raw_cnt) partial per
    block — the key set is bounded at 2 x ``buckets`` regardless of corpus
    size, so the combiner tree applies; the merged log-ratio table
    (~256 KiB) broadcasts via ``ray.put`` and pass 2 scores every doc with
    one gather + ``segment_sum``.  No corpus-sized shuffle, text never
    leaves its block, output is corpus-∝ and sortless.  Per-doc float sums
    reduce in within-doc order only — results are independent of block
    coalescing.

    Rows-only (FNV feature hashing + log arithmetic are not
    SQL-expressible): pytest pins exact integer equality against a serial
    replica and the target-looks-like-target ordering property.
    """
    import ray

    from ..functions.hashing import segment_sum, shingle_hashes, tokenize_flat
    from ..stages.aggregate import tree_merge

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def doc_features(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """Flat bucket ids (unigrams then bigrams, disjoint ranges) plus
        per-doc offsets into the combined feature stream."""
        uni, uoff = tokenize_flat(b["text"])
        bi, boff = shingle_hashes(b["text"], k=2)
        ub = (uni % np.uint64(buckets)).astype(np.int64)
        bb = (bi % np.uint64(buckets)).astype(np.int64) + buckets
        n_u, n_b = np.diff(uoff), np.diff(boff)
        off = np.zeros(b.num_rows + 1, dtype=np.int64)
        np.cumsum(n_u + n_b, out=off[1:])
        flat = np.empty(int(off[-1]), dtype=np.int64)
        # interleave per doc: unigram run then bigram run
        u_dst = np.repeat(off[:-1], n_u) + (np.arange(len(ub))
                                            - np.repeat(uoff[:-1], n_u))
        b_dst = np.repeat(off[:-1] + n_u, n_b) + (np.arange(len(bb))
                                                  - np.repeat(boff[:-1], n_b))
        flat[u_dst] = ub
        flat[b_dst] = bb
        return flat, off

    def counts(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        flat, off = doc_features(b)
        if len(flat) == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "tgt_cnt": pa.array([], type=pa.int64()),
                             "raw_cnt": pa.array([], type=pa.int64())})
        raw = np.bincount(flat, minlength=2 * buckets).astype(np.int64)
        is_tgt = np.asarray(pc.equal(b["lang"], target_lang)).astype(bool)
        feat_tgt = np.repeat(is_tgt, np.diff(off))
        tgt = np.bincount(flat[feat_tgt],
                          minlength=2 * buckets).astype(np.int64)
        nz = np.nonzero(raw)[0]
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "tgt_cnt": pa.array(tgt[nz]),
                         "raw_cnt": pa.array(raw[nz])})

    partial = ds.map_batches(counts, batch_format="pyarrow", batch_size=None)
    merged = tree_merge(partial, ["bucket"],
                        [("tgt_cnt", "sum"), ("raw_cnt", "sum")], fanin=fanin)
    tgt = np.zeros(2 * buckets, dtype=np.int64)
    raw = np.zeros(2 * buckets, dtype=np.int64)
    for t in merged.iter_batches(batch_format="pyarrow", batch_size=None):
        if isinstance(t, pa.RecordBatch):
            t = pa.Table.from_batches([t])
        idx = np.asarray(t["bucket"], dtype=np.int64)
        tgt[idx] += np.asarray(t["tgt_cnt"], dtype=np.int64)
        raw[idx] += np.asarray(t["raw_cnt"], dtype=np.int64)
    d = 2.0 * buckets
    lam = (np.log((tgt + 1.0) / (tgt.sum() + d))
           - np.log((raw + 1.0) / (raw.sum() + d)))
    lam_ref = ray.put(lam)

    def score(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        table = ray.get(lam_ref)
        flat, off = doc_features(b)
        vals = table[flat] if len(flat) else np.empty(0, dtype=np.float64)
        sums = segment_sum(vals, off)
        n = np.diff(off)
        mean = np.where(n > 0, sums / np.maximum(n, 1), 0.0)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_feats": pa.array(n.astype(np.int64)),
            "logw_x1e6": pa.array(np.floor(mean * 1e6).astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


# --- inverted index (posting-list build) ------------------------------------

def _flat_tokens(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Lower-cased whitespace tokens of ``b['text']`` as a flat object array
    plus the doc index of each token, empties removed (the shared tokenizer
    rule of ``doc_term_df`` / the SQL twin ``string_split_regex(lower(text),
    '\\s+') ... <> ''``)."""
    toks = pc.utf8_split_whitespace(pc.utf8_lower(b["text"]))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(object)
    off = np.asarray(toks.offsets, dtype=np.int64)
    off = off - off[0]
    doc_of = np.repeat(np.arange(len(off) - 1, dtype=np.int64), np.diff(off))
    nonempty = flat != ""
    return flat[nonempty], doc_of[nonempty]


def doc_inverted_index(sf_dir: str, *, cap: int = 16,
                       num_partitions: int = 8):
    """(term, df, postings) — search-index build over the corpus: document
    frequency per term plus the first ``cap`` posting doc_ids (ascending,
    comma-joined) — the retrieval-index shape of a training-data pipeline
    (dedup against an index, contamination lookups, hard-negative mining).

    Scale shape: per-block distinct (term, doc_id) pairs (block-local
    distinct IS global distinct — a document never straddles blocks), ONE
    hash exchange by term co-locates each posting list, then one lexsort +
    zero-copy LargeListArray ``binary_join`` per partition emits every
    capped list with no per-term Python.  Text never shuffles; posting rows
    are compact (term, doc_id) ints.  Output is vocabulary-∝ and sortless
    (the gate compares order-insensitively).
    """
    from ..stages.shuffle import hash_partition

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def block_pairs(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        flat, doc_of = _flat_tokens(b)
        ids = np.asarray(b["doc_id"], dtype=np.int64)[doc_of]
        order = np.lexsort((ids, flat))
        f, d = flat[order], ids[order]
        keep = np.ones(len(f), dtype=bool)
        if len(f) > 1:
            keep[1:] = (d[1:] != d[:-1]) | (f[1:] != f[:-1])
        return pa.table({"term": pa.array(f[keep], type=pa.string()),
                         "doc_id": pa.array(d[keep])})

    pairs = ds.map_batches(block_pairs, batch_format="pyarrow",
                           batch_size=None)

    def postings_kernel(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        if b.num_rows == 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64()),
                             "postings": pa.array([], type=pa.string())})
        term = np.asarray(b["term"].to_pylist(), dtype=object)
        d = np.asarray(b["doc_id"], dtype=np.int64)
        order = np.lexsort((d, term))
        t, d = term[order], d[order]
        seg = np.concatenate(([True], t[1:] != t[:-1]))
        starts = np.nonzero(seg)[0]
        counts = np.diff(np.append(starts, len(t)))
        rank = np.arange(len(t), dtype=np.int64) - np.repeat(starts, counts)
        kept = d[rank < cap]
        kept_counts = np.minimum(counts, cap)
        offsets = pa.array(np.append(0, np.cumsum(kept_counts)))
        strs = pc.cast(pa.array(kept), pa.string())
        lst = pa.LargeListArray.from_arrays(offsets, strs)
        return pa.table({
            "term": pa.array(t[starts], type=pa.string()),
            "df": pa.array(counts.astype(np.int64)),
            "postings": pc.cast(pc.binary_join(lst, ","), pa.string()),
        })

    return hash_partition(pairs, ["term"], num_partitions).map_batches(
        postings_kernel, batch_format="pyarrow", batch_size=None)


DOC_INVERTED_INDEX_SQL = """
WITH pairs AS (
  SELECT doc_id, term FROM (
    SELECT doc_id,
           UNNEST(list_distinct(string_split_regex(lower(text), '\\s+'))) AS term
    FROM documents)
  WHERE term <> ''
),
r AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rk
  FROM pairs
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CASE WHEN rk <= 16 THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS postings
FROM r GROUP BY term
"""


# --- quality-weighted deterministic sampling ---------------------------------

def doc_weighted_sample(sf_dir: str, *, salt: int = 12345):
    """Kept rows of a per-doc WEIGHTED deterministic sample: each doc
    survives with probability proportional to a quality proxy
    (``permille = min(900, 100 + n_chars)``), decided by a salted Knuth
    hash of its id — the quality-proportional downsampling step of a
    training-data mixture (upweight long/high-quality docs without RNG
    state).  Differs from ``doc_mix_sources`` (fixed per-SOURCE rates):
    here the rate is a per-ROW function of a computed signal.

    Scale shape: embarrassingly parallel, zero shuffle, one corpus pass;
    membership is a pure function of (doc_id, n_chars), so downstream
    stages can re-derive it for free.  Arithmetic stays in [0, 2^64) and
    mirrors the SQL twin exactly (ids fold mod 2^32 before the multiply).
    """
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "source", "n_chars"])
    mask32 = np.uint64((1 << 32) - 1)

    def sample(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = (((ids + np.uint64(salt)) & mask32)
                 * np.uint64(SHUFFLE_KNUTH)) & mask32
        bucket = (h % np.uint64(1000)).astype(np.int64)
        n_chars = np.asarray(b["n_chars"], dtype=np.int64)
        permille = np.minimum(900, 100 + n_chars)
        keep = bucket < permille
        t = b.filter(pa.array(keep))
        return t.append_column("permille", pa.array(permille[keep]))

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=None)


DOC_WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars,
       LEAST(900, 100 + n_chars) AS permille
FROM documents
WHERE (CAST((doc_id + 12345) % 4294967296 AS HUGEINT) * {SHUFFLE_KNUTH})
      % 4294967296 % 1000 < LEAST(900, 100 + n_chars)
"""


# --- deterministic exact-k uniform sample ------------------------------------

def doc_reservoir_sample(sf_dir: str, *, k: int = 100, salt: int = 777):
    """Exactly ``k`` uniformly-pseudo-random docs — the eval-subset /
    spot-check draw.  The deterministic answer to reservoir sampling:
    rank every doc by a salted Knuth hash and keep the ``k`` smallest
    (ties to doc_id), so the sample is exact-k, reproducible across
    engines and re-derivable without RNG state.

    Scale shape: per-block local bottom-k (one lexsort over the block),
    candidates (blocks × k compact rows) collapse to one tiny block for
    the final pick — the corpus never shuffles and no global sort runs.
    """
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "source", "n_chars"])
    mask32 = np.uint64((1 << 32) - 1)

    def bottom_k(b: pa.Table) -> pa.Table:
        if "h" in b.column_names:                 # final-pick reinvocation
            t = b
            h = np.asarray(b["h"], dtype=np.int64)
        else:
            ids = np.asarray(b["doc_id"], dtype=np.uint64)
            with np.errstate(over="ignore"):
                h = (((ids + np.uint64(salt)) & mask32)
                     * np.uint64(SHUFFLE_KNUTH)) & mask32
            h = h.astype(np.int64)
            t = b.append_column("h", pa.array(h))
        if t.num_rows <= k:
            return t
        order = np.lexsort((np.asarray(b["doc_id"], dtype=np.int64), h))[:k]
        return t.take(pa.array(order))

    cand = ds.map_batches(bottom_k, batch_format="pyarrow", batch_size=None)
    return cand.repartition(1).map_batches(bottom_k, batch_format="pyarrow",
                                           batch_size=None)


DOC_RESERVOIR_SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars,
       CAST((CAST((doc_id + 777) % 4294967296 AS HUGEINT) * {SHUFFLE_KNUTH})
            % 4294967296 AS BIGINT) AS h
FROM documents
ORDER BY h, doc_id
LIMIT 100
"""


# --- bigram phrase statistics (tokenizer / vocab design) ---------------------

def doc_bigram_phrases(sf_dir: str, *, top_n: int = 50,
                       num_partitions: int = 8):
    """Top-``top_n`` adjacent word pairs by corpus count — the phrase /
    merge-candidate statistics of tokenizer training (the first BPE merge
    step lifted to word granularity).  Ties break lexicographically.

    Scale shape: pairs are formed block-locally from the same flat token
    array the tokenizer rule already produces (documents never straddle
    blocks, so no cross-block pair is lost); block-local pre-aggregation
    shrinks the exchange to distinct (bigram, cnt) partials; the pair
    vocabulary is corpus-∝ so the merge is the hash shuffle; final top-N
    follows the ``doc_term_df`` plan (per-partition local top-N on complete
    key groups -> one tiny block) — no AllToAll Sort touches the
    corpus-sized pair table.
    """
    from ..stages.shuffle import hash_merge

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def block_pairs(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        flat, doc_of = _flat_tokens(b)
        if len(flat) < 2:
            return pa.table({"bigram": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        adj = doc_of[1:] == doc_of[:-1]
        big = flat[:-1][adj] + " " + flat[1:][adj]
        t = pa.table({"bigram": pa.array(big, type=pa.string())})
        g = t.group_by(["bigram"]).aggregate([([], "count_all")])
        return g.rename_columns(["bigram", "cnt"])

    partial = ds.map_batches(block_pairs, batch_format="pyarrow",
                             batch_size=None)
    merged = hash_merge(partial, ["bigram"], [("cnt", "sum")],
                        num_partitions=num_partitions)

    def local_topn(b: pa.Table, *, final: bool = False) -> pa.Table:
        # the final block must always rank: the prune-pass early return
        # would leak partition-concatenation order on small corpora
        if not final and b.num_rows <= top_n:
            return b
        cnt = np.asarray(b["cnt"], dtype=np.int64)
        big = np.asarray(b["bigram"].to_pylist(), dtype=object)
        order = np.lexsort((big, -cnt))[:top_n]
        return b.take(pa.array(order))

    import functools

    cand = merged.map_batches(local_topn, batch_format="pyarrow",
                              batch_size=None)
    return cand.repartition(1).map_batches(
        functools.partial(local_topn, final=True), batch_format="pyarrow",
        batch_size=None)


DOC_BIGRAM_PHRASES_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> t <> '') AS l
  FROM documents
),
pairs AS (
  SELECT l[i] || ' ' || l[i+1] AS bigram
  FROM toks, UNNEST(generate_series(1, len(l)-1)) AS u(i)
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM pairs GROUP BY bigram
ORDER BY cnt DESC, bigram
LIMIT 50
"""


# --- cross-source overlap audit ----------------------------------------------

def doc_source_overlap(sf_dir: str, *, k: int = 4,
                       num_partitions: int = 8):
    """(source_a, source_b, n_shared) — corpus-mixture overlap audit: for
    every source pair, how many distinct ``k``-token document PREFIXES they
    share (boilerplate / syndication leakage between feeds; the signal that
    tells a mixture designer two "independent" sources are not).

    Scale shape: per-block DISTINCT (prefix, source) rows — the dedup
    before the exchange is what bounds hot prefixes: a prefix contributes
    at most sources² pairs no matter how many documents carry it.  ONE
    hash exchange by prefix co-locates each prefix's source set; pair
    expansion is the vectorized repeat/arange combination kernel (no
    per-prefix Python); the census collapses to a bounded sources² key set
    through the combiner tree.
    """
    from ..stages.aggregate import tree_merge
    from ..stages.shuffle import hash_partition

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def block_prefix(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        if b.num_rows == 0:
            return pa.table({"pfx": pa.array([], type=pa.string()),
                             "source": pa.array([], type=pa.string())})
        flat, doc_of = _flat_tokens(b)
        # first-k tokens per doc, space-joined (docs with < k tokens use
        # what they have; zero-token docs get '' — the SQL twin agrees)
        n_docs = b.num_rows
        counts = np.bincount(doc_of, minlength=n_docs)
        starts = np.cumsum(counts) - counts
        rank = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, counts)
        kept = flat[rank < k]
        kept_counts = np.minimum(counts, k)
        offsets = pa.array(np.append(0, np.cumsum(kept_counts)))
        lst = pa.LargeListArray.from_arrays(
            offsets, pa.array(kept, type=pa.string()))
        pfx = pc.cast(pc.binary_join(lst, " "), pa.string())
        t = pa.table({"pfx": pfx, "source": b["source"]})
        # block-local distinct (prefix, source)
        return t.group_by(["pfx", "source"]).aggregate([]).select(
            ["pfx", "source"])

    pairs = ds.map_batches(block_prefix, batch_format="pyarrow",
                           batch_size=None)

    def pair_census(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        empty = pa.table({"source_a": pa.array([], type=pa.string()),
                          "source_b": pa.array([], type=pa.string()),
                          "n_shared": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        pfx = np.asarray(b["pfx"].to_pylist(), dtype=object)
        src = np.asarray(b["source"].to_pylist(), dtype=object)
        order = np.lexsort((src, pfx))
        p, s = pfx[order], src[order]
        # distinct (pfx, source) across blocks
        keep = np.ones(len(p), dtype=bool)
        if len(p) > 1:
            keep[1:] = (p[1:] != p[:-1]) | (s[1:] != s[:-1])
        p, s = p[keep], s[keep]
        seg = np.concatenate(([True], p[1:] != p[:-1]))
        seg_starts = np.nonzero(seg)[0]
        seg_counts = np.diff(np.append(seg_starts, len(p)))
        rank = (np.arange(len(p), dtype=np.int64)
                - np.repeat(seg_starts, seg_counts))
        # each row pairs with the rows after it in its segment: the
        # repeat/arange combination kernel (sources are sorted ascending
        # within a segment, so source_a < source_b by construction)
        kfollow = np.repeat(seg_counts, seg_counts) - 1 - rank
        total = int(kfollow.sum())
        if total == 0:
            return empty
        left = np.repeat(np.arange(len(p), dtype=np.int64), kfollow)
        excl = np.cumsum(kfollow) - kfollow
        j = np.arange(total, dtype=np.int64) - np.repeat(excl, kfollow) + 1
        right = left + j
        t = pa.table({"source_a": pa.array(s[left], type=pa.string()),
                      "source_b": pa.array(s[right], type=pa.string())})
        g = t.group_by(["source_a", "source_b"]).aggregate([([], "count_all")])
        return g.rename_columns(["source_a", "source_b", "n_shared"])

    partial = hash_partition(pairs, ["pfx"], num_partitions).map_batches(
        pair_census, batch_format="pyarrow", batch_size=None)
    # bounded sources² key set -> combiner tree; sort is fine on a census
    return tree_merge(partial, ["source_a", "source_b"],
                      [("n_shared", "sum")]).sort(["source_a", "source_b"])


DOC_SOURCE_OVERLAP_SQL = """
WITH t AS (
  SELECT DISTINCT source,
         array_to_string(list_slice(list_filter(
             string_split_regex(lower(text), '\\s+'), x -> x <> ''),
             1, 4), ' ') AS pfx
  FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM t a JOIN t b ON a.pfx = b.pfx AND a.source < b.source
GROUP BY 1, 2
ORDER BY source_a, source_b
"""


# --- BPE merge training ------------------------------------------------------

BPE_EOW = "</w>"  # end-of-word marker symbol (Sennrich-style)


def _bpe_merge_loop(words, counts, n_merges):
    """Serial Sennrich merge loop over WORD TYPES: symbols start as
    characters + the end-of-word marker; each round counts every adjacent
    symbol position weighted by word frequency (overlaps count, as in the
    reference algorithm), merges the most frequent pair corpus-wide
    (ties: lexicographically smallest pair), and rewrites words
    left-to-right non-overlapping.  Returns [(rank, left, right, count)].
    """
    syms = [tuple(w) + (BPE_EOW,) for w in words]
    merges = []
    for rank in range(1, n_merges + 1):
        pair_counts: dict = {}
        for s, c in zip(syms, counts):
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        (left, right), cnt = min(pair_counts.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, cnt))
        new = left + right
        for j, s in enumerate(syms):
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == left and s[i + 1] == right:
                    out.append(new)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[j] = tuple(out)
    return merges


def _bpe_word_counts(sf_dir: str, max_vocab: int,
                     num_partitions: int) -> pa.Table:
    """ONE distributed corpus pass to (word type, count), capped to the
    ``max_vocab`` most frequent types (count desc, term asc) through the
    disjoint-partition local-top-k plan — the shared front half of BPE
    training and encoding.  The type-keyed merge is size-gated like every
    corpus-key aggregation: combiner tree below the threshold (no shuffle
    operator spin-up), term-keyed hash exchange above it (a 100 TB type
    set never funnels through one task)."""
    from ..stages.aggregate import tree_merge
    from ..stages.shuffle import hash_merge, resolve_mode

    ds = read_table(sf_dir, "documents", columns=["text"])
    mode = resolve_mode("auto", f"{sf_dir}/documents.parquet")

    def block_counts(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        flat, _ = _flat_tokens(b)
        t = pa.table({"term": pa.array(flat, type=pa.string())})
        g = t.group_by(["term"]).aggregate([([], "count_all")])
        return g.rename_columns(["term", "cnt"])

    partial = ds.map_batches(block_counts, batch_format="pyarrow",
                             batch_size=None)
    if mode == "tree":
        merged = tree_merge(partial, ["term"], [("cnt", "sum")])
    else:
        merged = hash_merge(partial, ["term"], [("cnt", "sum")],
                            num_partitions=num_partitions)

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows <= max_vocab:
            return b
        cnt = np.asarray(b["cnt"], dtype=np.int64)
        term = np.asarray(b["term"].to_pylist(), dtype=object)
        order = np.lexsort((term, -cnt))[:max_vocab]
        return b.take(pa.array(order))

    cand = merged.map_batches(local_top, batch_format="pyarrow",
                              batch_size=None)
    return pa.concat_tables(list(
        cand.repartition(1).map_batches(local_top, batch_format="pyarrow",
                                        batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"term": pa.array([], type=pa.string()),
                   "cnt": pa.array([], type=pa.int64())})]).combine_chunks()


def doc_bpe_train_merges(sf_dir: str, *, n_merges: int = 12,
                         max_vocab: int = 65536, num_partitions: int = 8):
    """(merge_rank, left, right, pair_count) — the first ``n_merges`` BPE
    merges trained on the corpus: the tokenizer-TRAINING operator
    (``doc_bigram_phrases`` surfaces word-level merge candidates; this is
    the real subword algorithm).

    Scale shape is how production tokenizer trainers work: ONE distributed
    corpus pass collapses text to (word type, count) — the vocabulary is
    type-∝, not corpus-∝ (``_bpe_word_counts``) — then the merge loop
    iterates over word TYPES on the driver (the standard Sennrich/HF
    formulation) — no further corpus pass per merge.  Rows-only gate entry
    (iterative, not SQL-expressible); pytest pins it against an
    independent serial replica.
    """
    vocab = _bpe_word_counts(sf_dir, max_vocab, num_partitions)
    words = vocab["term"].to_pylist()
    counts = np.asarray(vocab["cnt"], dtype=np.int64).tolist() if vocab.num_rows else []
    merges = _bpe_merge_loop(words, counts, n_merges)

    import pandas as pd

    return pd.DataFrame({
        "merge_rank": pd.Series([m[0] for m in merges], dtype="int64"),
        "left": [m[1] for m in merges],
        "right": [m[2] for m in merges],
        "pair_count": pd.Series([m[3] for m in merges], dtype="int64"),
    })


def _bpe_encode_len(word: str, merges: list[tuple[str, str]],
                    memo: dict) -> int:
    """Subword count of one word TYPE under the trained merge list: apply
    merges in rank order (the training rewrite, left-to-right
    non-overlapping) to chars + ``BPE_EOW`` and return the final symbol
    count (EOW included, as in the Sennrich formulation)."""
    n = memo.get(word)
    if n is None:
        s = tuple(word) + (BPE_EOW,)
        for left, right in merges:
            if len(s) < 2:
                break
            out, i, ln = [], 0, len(s)
            while i < ln:
                if i < ln - 1 and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = tuple(out)
        n = len(s)
        memo[word] = n
    return n


class _BpeEncoder:
    """Actor-pool encode stage: the (tiny) trained merge list ships once in
    the constructor; the word-type -> token-count memo persists across
    batches, so each actor pays the merge rewrite once per word TYPE it
    ever sees (types repeat heavily across blocks — Zipf)."""

    def __init__(self, merges: list[tuple[str, str]]):
        from .. import tune_worker_threads

        tune_worker_threads()
        self._merges = merges
        self._memo: dict = {}

    def __call__(self, b: pa.Table) -> pa.Table:
        lang_codes = pc.dictionary_encode(b["lang"])
        if isinstance(lang_codes, pa.ChunkedArray):
            lang_codes = lang_codes.combine_chunks()
        langs = lang_codes.dictionary.to_pylist()
        codes = np.asarray(lang_codes.indices, dtype=np.int64)
        n_docs = np.bincount(codes, minlength=len(langs))

        flat, doc_of = _flat_tokens(b)
        if len(flat):
            uniq, inv = np.unique(flat, return_inverse=True)
            ntok = np.fromiter(
                (_bpe_encode_len(w, self._merges, self._memo) for w in uniq),
                dtype=np.int64, count=len(uniq))
            tok_codes = codes[doc_of]
            n_words = np.bincount(tok_codes, minlength=len(langs))
            n_bpe = np.bincount(tok_codes, weights=ntok[inv],
                                minlength=len(langs)).astype(np.int64)
        else:
            n_words = np.zeros(len(langs), dtype=np.int64)
            n_bpe = np.zeros(len(langs), dtype=np.int64)
        return pa.table({
            "lang": pa.array(langs, type=pa.string()),
            "n_docs": pa.array(n_docs, type=pa.int64()),
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, type=pa.int64()),
        })


def doc_bpe_encode_stats(sf_dir: str, *, n_merges: int = 12,
                         max_vocab: int = 65536, num_partitions: int = 8):
    """(lang, n_docs, n_words, n_bpe_tokens) — the corpus token budget
    under the corpus-TRAINED subword tokenizer: train the first
    ``n_merges`` BPE merges (``doc_bpe_train_merges`` front half), then
    re-encode every document and census true subword token counts per
    language (``doc_bpe_token_stats`` is the regex approximation; this is
    the real tokenizer applied at corpus scale).

    Scale shape: training collapses to word TYPES (one distributed pass,
    type-∝ driver state); the encode pass is embarrassingly parallel — the
    merge table is tiny and ships once per actor (``__init__``), the
    word-type memo amortizes the rewrite across batches, and the output is
    a bounded per-lang census through the combiner tree.  No corpus-sized
    shuffle anywhere.  Rows-only gate entry (iterative training is not
    SQL-expressible); pytest pins it against an independent serial
    replica.
    """
    from .. import auto_pool_size
    from ..stages.aggregate import tree_merge

    vocab = _bpe_word_counts(sf_dir, max_vocab, num_partitions)
    words = vocab["term"].to_pylist()
    counts = (np.asarray(vocab["cnt"], dtype=np.int64).tolist()
              if vocab.num_rows else [])
    merges = [(m[1], m[2]) for m in _bpe_merge_loop(words, counts, n_merges)]

    ds = read_table(sf_dir, "documents", columns=["lang", "text"])
    partial = ds.map_batches(_BpeEncoder, fn_constructor_kwargs={"merges": merges},
                             batch_format="pyarrow", batch_size=None,
                             concurrency=auto_pool_size())
    out = tree_merge(partial, ["lang"],
                     [("n_docs", "sum"), ("n_words", "sum"),
                      ("n_bpe_tokens", "sum")])
    return out.sort("lang")


# --- compressibility: the gzip-quality signal --------------------------------

ZLIB_LEVEL = 6  # pinned: the ratio must be deterministic across engines


def doc_compressibility(sf_dir: str):
    """(doc_id, text_bytes, zlib_bytes) — per-document zlib-compressed
    size at a pinned level: the compression-ratio quality signal
    (template/boilerplate and low-entropy SEO text compress far better
    than natural prose; the inverse flags binary-ish junk).  Integer
    bytes only — the ratio is the reader's (driver hash contract).

    Scale shape: embarrassingly parallel — one corpus pass, zlib's C
    deflate per document inside ``map_batches`` (no state, so a plain
    task pool; the Python loop only dispatches into C), per-doc sortless
    output, text never shuffles.  Not SQL-expressible (rows-only check);
    pytest pins equality with a serial zlib replica.
    """
    import zlib

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def compress(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        col = (b["text"].combine_chunks()
               if isinstance(b["text"], pa.ChunkedArray) else b["text"])
        raw = [t.encode() if t is not None else b"" for t in col.to_pylist()]
        return pa.table({
            "doc_id": b["doc_id"],
            "text_bytes": pa.array([len(r) for r in raw], pa.int64()),
            "zlib_bytes": pa.array(
                [len(zlib.compress(r, ZLIB_LEVEL)) for r in raw],
                pa.int64()),
        })

    return ds.map_batches(compress, batch_format="pyarrow", batch_size=None)


# --- BM25 query scoring -------------------------------------------------------

BM25_TERMS = ("table", "query", "spark")
BM25_K1 = 1.5
BM25_B = 0.75
BM25_K = 10


def doc_bm25_topk(sf_dir: str, *, terms: tuple = BM25_TERMS, k: int = BM25_K):
    """(doc_id, score_x1e6) — BM25 retrieval: the top-``k`` documents for
    a fixed term query under Okapi BM25 (k1=1.5, b=0.75), ties to the
    smaller doc_id.  The score is per-doc deterministic (a pure function
    of tf/dl and the broadcast global stats, independent of block
    composition), emitted as floor(score * 1e6) int64.

    Scale shape: pass 1 funnels |terms|+2 scalars (per-term document
    frequency, corpus doc count, total token count) through the combiner
    tree; pass 2 broadcasts those stats via the closure and scores each
    block vectorized (one whitespace split, |terms| equality masks +
    bincounts — no Python loop over rows), keeping a local top-k per
    block so the global sort sees blocks x k rows.  Rows-only: BM25's
    log/division is float math DuckDB cannot reproduce bit-exactly;
    pytest pins a serial replica instead.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    term_arr = pa.array(list(terms), pa.string())

    def stats_partial(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        toks = pc.utf8_split_whitespace(pc.utf8_lower(b["text"]))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        doc_of = np.repeat(np.arange(len(off) - 1, dtype=np.int64),
                           np.diff(off))
        code = pc.index_in(flat, value_set=term_arr).to_numpy(
            zero_copy_only=False)
        dfs = []
        for ti in range(len(terms)):
            hits = doc_of[code == ti]
            dfs.append(len(np.unique(hits)))
        return pa.table({
            "term_idx": pa.array(range(len(terms) + 2), pa.int64()),
            "val": pa.array(dfs + [b.num_rows, int(len(doc_of))], pa.int64()),
        })

    p = ds.map_batches(stats_partial, batch_format="pyarrow", batch_size=None)
    from ..stages.aggregate import tree_merge

    g = pa.concat_tables(list(
        tree_merge(p, ["term_idx"], [("val", "sum")], fanin=8)
        .iter_batches(batch_format="pyarrow", batch_size=None)) or
        [pa.table({"term_idx": pa.array([], pa.int64()),
                   "val": pa.array([], pa.int64())})]).combine_chunks()
    stats = dict(zip(g["term_idx"].to_pylist(), g["val"].to_pylist()))
    n_docs = stats.get(len(terms), 0)
    total_toks = stats.get(len(terms) + 1, 0)
    if n_docs == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score_x1e6": pa.array([], pa.int64())})
    avgdl = total_toks / n_docs
    # Lucene-form idf: ln(1 + (n-df+0.5)/(df+0.5)) — strictly positive, so
    # tf/length still rank documents when every term is corpus-common (the
    # classic floored idf collapses to all-zero scores on a small-vocab
    # corpus where df ~ n)
    dfv = np.array([stats.get(i, 0) for i in range(len(terms))],
                   dtype=np.float64)
    idf = np.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))

    def score_block(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        toks = pc.utf8_split_whitespace(pc.utf8_lower(b["text"]))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        nd = len(off) - 1
        dl = np.diff(off).astype(np.float64)
        doc_of = np.repeat(np.arange(nd, dtype=np.int64), np.diff(off))
        code = pc.index_in(flat, value_set=term_arr).to_numpy(
            zero_copy_only=False)
        score = np.zeros(nd, dtype=np.float64)
        denom_base = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        for ti in range(len(terms)):
            tf = np.bincount(doc_of[code == ti], minlength=nd).astype(
                np.float64)
            score += idf[ti] * tf * (BM25_K1 + 1.0) / (tf + denom_base)
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        sx = np.floor(score * 1e6).astype(np.int64)
        order = np.lexsort((ids, -sx))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "score_x1e6": pa.array(sx[order])})

    cand = ds.map_batches(score_block, batch_format="pyarrow",
                          batch_size=None)

    def final(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        sx = np.asarray(b["score_x1e6"], dtype=np.int64)
        order = np.lexsort((ids, -sx))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "score_x1e6": pa.array(sx[order])})

    # bounded candidates (<= k per block): finalize DRIVER-side so an
    # all-empty candidate set still returns a typed table instead of a
    # schema-less empty Dataset (ADVICE r04; Ray drops 0-row blocks so a
    # repartition(1) final stage would simply never run)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "score_x1e6": pa.array([], pa.int64())})
    merged = pa.concat_tables([empty] + list(cand.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    return final(merged)


# --- deterministic train/val/test split --------------------------------------

SPLIT_SALT = 999
SPLIT_TRAIN_PML = 800   # [0, 800) train
SPLIT_VAL_PML = 900     # [800, 900) val, [900, 1000) test


def doc_split_assign(sf_dir: str, *, salt: int = SPLIT_SALT):
    """(doc_id, source, split) — deterministic 80/10/10 train/val/test
    assignment by a salted Knuth hash of the doc id: the canonical
    leakage-safe ML split (membership is a pure function of the id, so
    every pipeline stage and engine re-derives the same split — no RNG
    state, no split files to ship).

    Scale shape: embarrassingly parallel, zero shuffle, one corpus pass,
    per-doc sortless output.  Arithmetic stays in [0, 2^64) and mirrors
    the SQL twin exactly (ids fold mod 2^32 before the multiply — the
    ``doc_weighted_sample`` contract).
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    mask32 = np.uint64((1 << 32) - 1)
    names = pa.array(["train", "val", "test"], pa.string())

    def assign(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        ids = np.asarray(b["doc_id"], dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = (((ids + np.uint64(salt)) & mask32)
                 * np.uint64(SHUFFLE_KNUTH)) & mask32
        bucket = (h % np.uint64(1000)).astype(np.int64)
        code = np.full(len(bucket), 2, dtype=np.int64)
        code[bucket < SPLIT_VAL_PML] = 1
        code[bucket < SPLIT_TRAIN_PML] = 0
        return pa.table({
            "doc_id": b["doc_id"],
            "source": b["source"],
            "split": pc.take(names, pa.array(code)),
        })

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


DOC_SPLIT_ASSIGN_SQL = f"""
SELECT doc_id, source,
       CASE WHEN b < {SPLIT_TRAIN_PML} THEN 'train'
            WHEN b < {SPLIT_VAL_PML} THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, source,
             (CAST((doc_id + {SPLIT_SALT}) % 4294967296 AS HUGEINT)
              * {SHUFFLE_KNUTH}) % 4294967296 % 1000 AS b
      FROM documents)
ORDER BY doc_id
"""


# --- PMI collocation mining ---------------------------------------------------

PMI_TOP_N = 30
PMI_MIN_COUNT = 10


def doc_pmi_phrases(sf_dir: str, *, top_n: int = PMI_TOP_N,
                    min_count: int = PMI_MIN_COUNT, mode: str = "auto",
                    num_partitions: int = 8):
    """(bigram, n_ab, pmi_x1000) — top collocations by pointwise mutual
    information (word2vec-style phrase detection: PMI ranks "new york"
    above "of the" where raw counts cannot), count-floored to kill the
    rare-pair PMI explosion.

    Scale shape: ONE corpus pass emits a tagged union census — unigram
    rows carry a null second word next to the bigram rows — so the text
    is tokenized once and both vocabularies ride ONE hash-merged
    exchange.  Attaching the two unigram counts is size-gated: below the
    threshold the unigram slice broadcasts (``ray.put`` once), above it
    the bigram slice hash-JOINs it twice (w1 then w2 keyed exchanges of
    already-merged compact rows).  Totals are two scalars through
    per-block sum funnels (nothing vocabulary-sized reaches the driver
    in shuffle mode).  The top-N prunes per disjoint partition and the
    final block is ALWAYS rank-ordered.  Rows-only: PMI's log is float
    math; pytest pins a serial replica.
    """
    import math

    from ..stages.shuffle import hash_merge, resolve_mode

    mode = resolve_mode(mode, f"{sf_dir}/documents.parquet")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def mixed_partial(b: pa.Table) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        flat, doc_of = _flat_tokens(b)
        uni = pa.table({"w1": pa.array(flat, type=pa.string()),
                        "w2": pa.nulls(len(flat), pa.string())})
        if len(flat) >= 2:
            adj = doc_of[1:] == doc_of[:-1]
            big = pa.table({"w1": pa.array(flat[:-1][adj], type=pa.string()),
                            "w2": pa.array(flat[1:][adj], type=pa.string())})
            t = pa.concat_tables([uni, big])
        else:
            t = uni
        g = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return g.rename_columns(["w1", "w2", "cnt"])

    census = hash_merge(ds.map_batches(mixed_partial, batch_format="pyarrow",
                                       batch_size=None),
                        ["w1", "w2"], [("cnt", "sum")],
                        num_partitions=num_partitions).materialize()

    def uni_slice(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.is_null(b["w2"]))
        return pa.table({"term": keep["w1"], "cnt": keep["cnt"]})

    def big_slice(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.is_valid(b["w2"]))
        return pa.table({"w1": keep["w1"], "w2": keep["w2"],
                         "n_ab": keep["cnt"]})

    uni = census.map_batches(uni_slice, batch_format="pyarrow",
                             batch_size=None)
    big = census.map_batches(big_slice, batch_format="pyarrow",
                             batch_size=None)

    def scalar_sum(col):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array(
                [pc.sum(b[col]).as_py() or 0], pa.int64())})
        return f

    def funnel(d, col) -> int:
        t = pa.concat_tables(list(
            d.map_batches(scalar_sum(col), batch_format="pyarrow",
                          batch_size=None)
            .iter_batches(batch_format="pyarrow", batch_size=None)) or
            [pa.table({"n": pa.array([], pa.int64())})])
        return pc.sum(t["n"]).as_py() or 0

    n_uni = funnel(uni, "cnt")
    n_big = funnel(big, "n_ab")
    if n_big == 0 or n_uni == 0:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "n_ab": pa.array([], pa.int64()),
                         "pmi_x1000": pa.array([], pa.int64())})
    log_const = math.log(n_uni) * 2 - math.log(n_big)

    if mode == "shuffle":
        from ..stages.join import hash_join

        c1 = uni.map_batches(lambda b: b.rename_columns(["w1", "c1"]),
                             batch_format="pyarrow", batch_size=None)
        c2 = uni.map_batches(lambda b: b.rename_columns(["w2", "c2"]),
                             batch_format="pyarrow", batch_size=None)
        scored = hash_join(big, c1, on="w1", num_partitions=num_partitions)
        scored = hash_join(scored, c2, on="w2",
                           num_partitions=num_partitions)
    else:
        import ray

        uni_tbl = pa.concat_tables(list(uni.iter_batches(
            batch_format="pyarrow", batch_size=None)) or
            [pa.table({"term": pa.array([], pa.string()),
                       "cnt": pa.array([], pa.int64())})]).combine_chunks()
        ref = ray.put(uni_tbl)

        def attach(b: pa.Table) -> pa.Table:
            from .. import tune_worker_threads

            tune_worker_threads()
            u = ray.get(ref)
            p1 = pc.index_in(b["w1"], value_set=u["term"])
            p2 = pc.index_in(b["w2"], value_set=u["term"])
            return pa.table({"w1": b["w1"], "w2": b["w2"],
                             "n_ab": b["n_ab"],
                             "c1": pc.take(u["cnt"], p1),
                             "c2": pc.take(u["cnt"], p2)})

        scored = big.map_batches(attach, batch_format="pyarrow",
                                 batch_size=None)

    def pmi_topn(b: pa.Table, *, final: bool = False) -> pa.Table:
        from .. import tune_worker_threads

        tune_worker_threads()
        if "pmi_x1000" not in b.column_names:
            b = b.filter(pc.greater_equal(b["n_ab"],
                                          pa.scalar(min_count, pa.int64())))
            if b.num_rows == 0:
                return pa.table({"bigram": pa.array([], pa.string()),
                                 "n_ab": pa.array([], pa.int64()),
                                 "pmi_x1000": pa.array([], pa.int64())})
            n_ab = np.asarray(b["n_ab"], dtype=np.float64)
            c1 = np.asarray(b["c1"], dtype=np.float64)
            c2 = np.asarray(b["c2"], dtype=np.float64)
            pmi = np.log(n_ab) - np.log(c1) - np.log(c2) + log_const
            joined = pc.binary_join_element_wise(
                b["w1"].combine_chunks() if isinstance(b["w1"], pa.ChunkedArray) else b["w1"],
                b["w2"].combine_chunks() if isinstance(b["w2"], pa.ChunkedArray) else b["w2"],
                " ")
            b = pa.table({
                "bigram": joined,
                "n_ab": b["n_ab"],
                "pmi_x1000": pa.array(np.floor(pmi * 1000).astype(np.int64)),
            })
        if not final and b.num_rows <= top_n:
            return b
        pmi = np.asarray(b["pmi_x1000"], dtype=np.int64)
        name = np.asarray(b["bigram"].to_pylist(), dtype=object)
        order = np.lexsort((name, -pmi))[:top_n]
        return b.take(pa.array(order))

    cand = scored.map_batches(pmi_topn, batch_format="pyarrow",
                              batch_size=None)
    # bounded candidates (<= top_n per partition): finalize DRIVER-side so
    # an all-pruned candidate set (every bigram under min_count) still
    # returns a typed empty table instead of a schema-less empty Dataset
    # (ADVICE r04; Ray drops 0-row blocks so a repartition(1) final stage
    # would simply never run)
    empty = pa.table({"bigram": pa.array([], pa.string()),
                      "n_ab": pa.array([], pa.int64()),
                      "pmi_x1000": pa.array([], pa.int64())})
    merged = pa.concat_tables([empty] + list(cand.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    return pmi_topn(merged, final=True)


# --- duplicated sliding-n-gram fraction (cross-doc repetition signal) -------

_DUP_NGRAM_N = 8
_DUP_NGRAM_P = np.uint64(0x100000001B3)  # FNV prime as the rolling multiplier


def doc_dup_ngram_stats(sf_dir: str, *, n: int = _DUP_NGRAM_N,
                        num_partitions: int | None = None):
    """(doc_id, n_grams, n_dup_grams, dup_permille) — fraction of each
    document's SLIDING word ``n``-grams that occur more than once anywhere
    in the corpus (itself included).  The Gopher/CCNet "duplicated n-gram
    fraction" curation signal: ``doc_passage_dedup`` tiles disjoint
    windows and rewrites text; this measures overlap at every position and
    keeps docs intact, which is the form quality-filter thresholds use.
    Docs shorter than ``n`` words have no grams and (like the SQL) emit no
    row.

    Scale shape: pass 1 emits compact (gram_hash, doc_id) int64 rows —
    text never shuffles; ONE hash exchange by gram hash co-locates each
    gram's occurrences so the >=2 test is partition-local; per-doc partial
    counts then merge through a second compact hash exchange keyed by
    doc_id (corpus-sized key set -> ``hash_merge``, never a driver funnel).
    Gram equality is by 64-bit rolling FNV over per-token FNV hashes
    (injective on any real corpus slice; same accepted-collision contract
    as ``dedup_exact_hash`` — the oracle groups by exact gram text).
    Output is corpus-proportional and deliberately unsorted.
    """
    from .. import tune_worker_threads
    from ..stages.shuffle import hash_merge, hash_partition, input_size_bytes
    from .streaming import auto_shard_count

    if num_partitions is None:
        num_partitions = auto_shard_count(
            input_size_bytes(f"{sf_dir}/documents.parquet"))
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def gram_rows(b: pa.Table) -> pa.Table:
        tune_worker_threads()
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        doc_off = np.asarray(words.offsets, dtype=np.int64)
        nw = np.diff(doc_off)
        th = fnv1a64_arrow(words.values).astype(np.uint64)
        # avalanche-finalize (splitmix64) BEFORE combining: raw FNV values
        # of related tokens keep FNV's affine suffix structure, and a
        # polynomial in the FNV prime extends that structure — measured ~1%
        # systematic gram collisions on a 100k-doc corpus without this mix
        th = (th ^ (th >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        th = (th ^ (th >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        th = th ^ (th >> np.uint64(31))
        # rolling polynomial over n consecutive token hashes on the flat
        # stream (uint64 wraparound); cross-doc positions sliced away below
        g = th.copy()
        for k in range(1, n):
            g[:-k if k else None] = g[:len(g) - k] * _DUP_NGRAM_P + th[k:]
        vc = np.maximum(nw - n + 1, 0)          # valid gram starts per doc
        total = int(vc.sum())
        first_of_doc = np.cumsum(vc) - vc
        pos = np.arange(total, dtype=np.int64) - np.repeat(first_of_doc, vc)
        starts = np.repeat(doc_off[:-1], vc) + pos
        return pa.table({"g": pa.array(g[starts].view(np.int64)),
                         "doc_id": pa.array(np.repeat(ids, vc))})

    def stats_in_partition(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "n_dup_grams": pa.array([], pa.int64())})
        g = np.asarray(b["g"], dtype=np.int64)
        d = np.asarray(b["doc_id"], dtype=np.int64)
        order = np.argsort(g, kind="stable")
        g_s = g[order]
        run_start = np.ones(len(g_s), dtype=bool)
        run_start[1:] = g_s[1:] != g_s[:-1]
        run_id = np.cumsum(run_start) - 1
        run_len = np.bincount(run_id)
        dup = np.empty(len(g_s), dtype=np.int64)
        dup[order] = (run_len[run_id] >= 2).astype(np.int64)
        t = pa.table({"doc_id": pa.array(d), "dup": pa.array(dup)})
        out = t.group_by(["doc_id"]).aggregate([("dup", "sum"),
                                                ([], "count_all")])
        return out.rename_columns(["doc_id", "n_dup_grams", "n_grams"])

    rows = docs.map_batches(gram_rows, batch_format="pyarrow",
                            batch_size=None)
    partials = hash_partition(rows, ["g"], num_partitions).map_batches(
        stats_in_partition, batch_format="pyarrow", batch_size=None)
    merged = hash_merge(partials, ["doc_id"],
                        [("n_grams", "sum"), ("n_dup_grams", "sum")],
                        num_partitions=num_partitions)

    def finalize(b: pa.Table) -> pa.Table:
        ng = np.asarray(b["n_grams"], dtype=np.int64)
        nd = np.asarray(b["n_dup_grams"], dtype=np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "n_grams": b["n_grams"],
                         "n_dup_grams": b["n_dup_grams"],
                         "dup_permille": pa.array((1000 * nd) // ng)})

    return merged.map_batches(finalize, batch_format="pyarrow",
                              batch_size=None)


DOC_DUP_NGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
ng AS (
  SELECT doc_id, array_to_string(w[i : i + {_DUP_NGRAM_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, w,
               UNNEST(generate_series(1, len(w) - {_DUP_NGRAM_N - 1})) AS i
        FROM toks)
),
gc AS (SELECT gram, COUNT(*) AS c FROM ng GROUP BY gram)
SELECT ng.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN gc.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_grams,
       CAST((1000 * SUM(CASE WHEN gc.c >= 2 THEN 1 ELSE 0 END)) // COUNT(*)
            AS BIGINT) AS dup_permille
FROM ng JOIN gc USING (gram)
GROUP BY ng.doc_id
"""


QUERIES = {
    "doc_ccnet_buckets": doc_ccnet_buckets,
    "doc_dup_ngram_stats": doc_dup_ngram_stats,
    "doc_pmi_phrases": doc_pmi_phrases,
    "doc_split_assign": doc_split_assign,
    "doc_bm25_topk": doc_bm25_topk,
    "doc_compressibility": doc_compressibility,
    "doc_quality": doc_quality,
    "doc_quality_classifier": doc_quality_classifier,
    "doc_vocab_coverage": doc_vocab_coverage,
    "doc_bpe_token_stats": doc_bpe_token_stats,
    "doc_lang_id": doc_lang_id,
    "doc_langid_confusion": doc_langid_confusion,
    "doc_fingerprint": doc_fingerprint,
    "doc_len_quantiles": doc_len_quantiles,
    "doc_len_rank": doc_len_rank,
    "doc_term_df": doc_term_df,
    "doc_decontaminate": doc_decontaminate,
    "doc_stratified_sample": doc_stratified_sample,
    "doc_shuffle_shards": doc_shuffle_shards,
    "doc_repetition": doc_repetition,
    "doc_heavy_hitters": doc_heavy_hitters,
    "doc_cms_heavy_terms": doc_cms_heavy_terms,
    "doc_pack_sequences": doc_pack_sequences,
    "doc_chunk": doc_chunk,
    "doc_tfidf_top": doc_tfidf_top,
    "doc_mix_sources": doc_mix_sources,
    "doc_length_outliers": doc_length_outliers,
    "doc_lm_score": doc_lm_score,
    "doc_inverted_index": doc_inverted_index,
    "doc_weighted_sample": doc_weighted_sample,
    "doc_bigram_phrases": doc_bigram_phrases,
    "doc_source_overlap": doc_source_overlap,
    "doc_reservoir_sample": doc_reservoir_sample,
    "doc_dsir_weights": doc_dsir_weights,
    "doc_bpe_train_merges": doc_bpe_train_merges,
    "doc_bpe_encode_stats": doc_bpe_encode_stats,
}

ORACLE_SQL = {
    "doc_dup_ngram_stats": DOC_DUP_NGRAM_SQL,
    "doc_split_assign": DOC_SPLIT_ASSIGN_SQL,
    "doc_quality": DOC_QUALITY_SQL,
    "doc_quality_classifier": DOC_QUALITY_CLASSIFIER_SQL,
    "doc_vocab_coverage": DOC_VOCAB_COVERAGE_SQL,
    "doc_bpe_token_stats": DOC_BPE_TOKEN_SQL,
    "doc_lang_id": DOC_LANG_ID_SQL,
    "doc_langid_confusion": DOC_LANGID_CONFUSION_SQL,
    "doc_len_quantiles": DOC_LEN_QUANTILES_SQL,
    "doc_len_rank": DOC_LEN_RANK_SQL,
    "doc_term_df": DOC_TERM_DF_SQL,
    "doc_decontaminate": DOC_DECONTAMINATE_SQL,
    "doc_stratified_sample": DOC_STRATIFIED_SAMPLE_SQL,
    "doc_shuffle_shards": DOC_SHUFFLE_SHARDS_SQL,
    "doc_repetition": DOC_REPETITION_SQL,
    "doc_heavy_hitters": DOC_HEAVY_HITTERS_SQL,
    "doc_pack_sequences": DOC_PACK_SEQUENCES_SQL,
    "doc_chunk": DOC_CHUNK_SQL,
    "doc_tfidf_top": DOC_TFIDF_TOP_SQL,
    "doc_mix_sources": DOC_MIX_SOURCES_SQL,
    "doc_length_outliers": DOC_LENGTH_OUTLIERS_SQL,
    "doc_inverted_index": DOC_INVERTED_INDEX_SQL,
    "doc_weighted_sample": DOC_WEIGHTED_SAMPLE_SQL,
    "doc_bigram_phrases": DOC_BIGRAM_PHRASES_SQL,
    "doc_source_overlap": DOC_SOURCE_OVERLAP_SQL,
    "doc_reservoir_sample": DOC_RESERVOIR_SAMPLE_SQL,
    # doc_fingerprint, doc_lm_score, doc_dsir_weights: rows-only (FNV / log
    # arithmetic not SQL-expressible); pytest verifies each against a serial
    # Python oracle.  doc_bpe_train_merges: rows-only (iterative merge
    # training); pytest pins it against an independent serial replica.
}
