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

    return ds.map_batches(prep, batch_format="pyarrow", batch_size=None).sort("doc_id")


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
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(LangIdScorer, batch_format="pyarrow", batch_size=None,
                          concurrency=2).sort("doc_id")


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

    return ds.map_batches(fp, batch_format="pyarrow", batch_size=None).sort("doc_id")


QUERIES = {
    "doc_quality": doc_quality,
    "doc_bpe_token_stats": doc_bpe_token_stats,
    "doc_lang_id": doc_lang_id,
    "doc_fingerprint": doc_fingerprint,
}

ORACLE_SQL = {
    "doc_quality": DOC_QUALITY_SQL,
    "doc_bpe_token_stats": DOC_BPE_TOKEN_SQL,
    "doc_lang_id": DOC_LANG_ID_SQL,
    # doc_fingerprint: rows-only (FNV not SQL-expressible); pytest verifies
    # it against a serial Python oracle.
}
