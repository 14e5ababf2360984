"""Round-4 continuation operators, batch 5: normalized exact dedup and
BPE merge training.

Normalized dedup is pinned on engineered case/whitespace variants (the
generated corpus has no natural normalization collapses); BPE training is
pinned against an independent serial Sennrich replica, including the
classic low/lower/newest corpus, tie-breaks, and overlap counting."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_documents(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["src1"] * len(texts)),
        "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestDedupExactNormalized:
    def test_case_and_whitespace_variants_collapse(self, tmp_path):
        from logparse_rs_ray.pipelines.dedup import dedup_exact_normalized

        texts = [
            "Hello World",          # 0: keeper of the hello group
            "hello   world",        # 1: whitespace run
            "  hello world  ",      # 2: leading/trailing
            "HELLO\tWORLD",         # 3: tab + case
            "hello\nworld",         # 4: newline
            "helloworld",           # 5: distinct (no space)
            "other doc",            # 6: distinct
        ]
        sf = _write_documents(tmp_path, texts)
        got = dedup_exact_normalized(sf).to_pandas()
        rows = sorted(map(tuple, got[["keeper_doc_id", "n_copies"]].values.tolist()))
        assert rows == [(0, 5), (5, 1), (6, 1)]

    def test_byte_exact_dedup_would_miss(self, tmp_path):
        from logparse_rs_ray.pipelines.dedup import (
            dedup_exact_hash, dedup_exact_normalized)

        sf = _write_documents(tmp_path, ["A b", "a  B", "a b"])
        byte = dedup_exact_hash(sf).to_pandas()
        norm = dedup_exact_normalized(sf).to_pandas()
        assert len(byte) == 3          # all byte-distinct
        assert len(norm) == 1          # all normalize-equal
        assert norm["n_copies"].tolist() == [3]

    def test_tree_equals_shuffle_and_duckdb(self):
        import duckdb

        from logparse_rs_ray.pipelines.dedup import (
            DEDUP_EXACT_NORMALIZED_SQL, dedup_exact_normalized)

        a = dedup_exact_normalized(SF, mode="tree").to_pandas()
        b = dedup_exact_normalized(SF, mode="shuffle",
                                   num_partitions=5).to_pandas()
        key = ["keeper_doc_id", "n_copies"]
        assert sorted(map(tuple, a[key].values.tolist())) == \
            sorted(map(tuple, b[key].values.tolist()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        want = con.execute(DEDUP_EXACT_NORMALIZED_SQL).df()
        assert sorted(map(tuple, a[key].values.tolist())) == \
            sorted(map(tuple, want[key].values.tolist()))


# --- BPE merge training -------------------------------------------------------

def _serial_bpe(texts, n_merges):
    """Independent reference implementation (dict-based Sennrich)."""
    words = collections.Counter()
    for t in texts:
        words.update(w for w in t.lower().split() if w)
    syms = {w: tuple(w) + ("</w>",) for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = collections.Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((rank, l, r, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges


@pytest.mark.usefixtures("ray_session")
class TestBpeTrainMerges:
    def test_classic_corpus(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_bpe_train_merges

        # Sennrich's running example: 'es' then 'est' then 'est</w>' ...
        texts = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        sf = _write_documents(tmp_path, [" ".join(texts)])
        got = doc_bpe_train_merges(sf, n_merges=4)
        want = _serial_bpe([" ".join(texts)], 4)
        assert list(map(tuple, got.values.tolist())) == want
        # first merge must be the classic ('e', 's') with count 9
        assert want[0][1:] == ("e", "s", 9)

    def test_overlap_counting_and_ties(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_bpe_train_merges

        # 'aaa' has two overlapping (a,a) positions -> count 2 per word;
        # 'bc bc' ties (b,c) with (c,'</w>') -> lexicographic pick
        texts = ["aaa aaa", "bc bc bc bc"]
        got = doc_bpe_train_merges(_write_documents(tmp_path, texts),
                                   n_merges=3)
        want = _serial_bpe(texts, 3)
        assert list(map(tuple, got.values.tolist())) == want

    def test_matches_serial_replica_on_generated(self):
        import duckdb

        from logparse_rs_ray.pipelines.textops import doc_bpe_train_merges

        got = doc_bpe_train_merges(SF, n_merges=8)
        con = duckdb.connect()
        texts = [r[0] for r in con.execute(
            f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()]
        want = _serial_bpe(texts, 8)
        assert list(map(tuple, got.values.tolist())) == want

    def test_vocab_cap_changes_nothing_when_loose(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_bpe_train_merges

        texts = ["red green blue red green", "blue blue red"]
        sf = _write_documents(tmp_path, texts)
        a = doc_bpe_train_merges(sf, n_merges=3, max_vocab=65536)
        b = doc_bpe_train_merges(sf, n_merges=3, max_vocab=3)  # = #types
        pd.testing.assert_frame_equal(a, b)

    def test_empty_corpus(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_bpe_train_merges

        got = doc_bpe_train_merges(_write_documents(tmp_path, [""]),
                                   n_merges=3)
        assert len(got) == 0
        assert list(got.columns) == ["merge_rank", "left", "right",
                                     "pair_count"]


# --- log_value_mad_outliers ---------------------------------------------------

def _write_events_values(tmp_path, rows):
    """rows: list of (event_type, value)."""
    import datetime

    t = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([datetime.datetime(2024, 1, 1)] * len(rows),
                       type=pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), type=pa.int64()),
        "event_type": pa.array([e for e, _ in rows]),
        "value": pa.array([float(v) for _, v in rows]),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestMadOutliers:
    def test_boundary_and_zero_mad(self, tmp_path):
        from logparse_rs_ray.pipelines.logops import log_value_mad_outliers

        rows = (
            # type a: values 1..7 -> median 4 (x1e6), devs {0,1,1,2,2,3,3}
            # sorted devs [0,1,1,2,2,3,3] -> MAD = 2e6 (k=ceil(7*.5)=4).
            # With k=1: outlier iff dev > 2e6 -> values 1 and 7 (dev 3e6).
            [("a", v) for v in (1, 2, 3, 4, 5, 6, 7)]
            # type b: all equal -> MAD 0; any deviation is an outlier
            + [("b", 5), ("b", 5), ("b", 5), ("b", 9)]
            # type c: negative values, boundary dev == k*MAD excluded
            + [("c", -1), ("c", -2), ("c", -3)]
        )
        sf = _write_events_values(tmp_path, rows)
        got = log_value_mad_outliers(sf, k=1).to_pandas().set_index("event_type")
        assert got.loc["a", "median_x1e6"] == 4_000_000
        assert got.loc["a", "mad_x1e6"] == 2_000_000
        assert got.loc["a", "n_outliers"] == 2
        assert got.loc["b", "mad_x1e6"] == 0
        assert got.loc["b", "n_outliers"] == 1
        # c: median -2e6 (k=ceil(3*.5)=2 -> 2nd smallest = -2e6),
        # devs {1e6,0,1e6} -> MAD 1e6; k=1 -> dev > 1e6 -> none (both == 1e6)
        assert got.loc["c", "median_x1e6"] == -2_000_000
        assert got.loc["c", "n_outliers"] == 0

    def test_matches_duckdb_on_generated(self):
        import duckdb

        from logparse_rs_ray.pipelines.logops import (
            LOG_VALUE_MAD_SQL, log_value_mad_outliers)

        got = log_value_mad_outliers(SF).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{SF}/events.parquet')")
        want = con.execute(LOG_VALUE_MAD_SQL).df()
        assert got.values.tolist() == want.values.tolist()


def _serial_encode_stats(rows, n_merges):
    """Independent replica of doc_bpe_encode_stats: train with _serial_bpe,
    re-encode every word type, census per lang."""
    texts = [t for _, t in rows]
    merges = [(m[1], m[2]) for m in _serial_bpe(texts, n_merges)]
    enc = {}

    def ntok(w):
        if w not in enc:
            s = tuple(w) + ("</w>",)
            for l, r in merges:
                out, i = [], 0
                while i < len(s):
                    if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = tuple(out)
            enc[w] = len(s)
        return enc[w]

    per = {}
    for lang, text in rows:
        d = per.setdefault(lang, [0, 0, 0])
        d[0] += 1
        for w in text.lower().split():
            if w:
                d[1] += 1
                d[2] += ntok(w)
    return pd.DataFrame(
        [(k, *v) for k, v in sorted(per.items())],
        columns=["lang", "n_docs", "n_words", "n_bpe_tokens"])


@pytest.mark.usefixtures("ray_session")
class TestBpeEncodeStats:
    def test_zero_merges_is_chars_plus_eow(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_bpe_encode_stats

        texts = ["low lower", "newest"]
        got = doc_bpe_encode_stats(_write_documents(tmp_path, texts),
                                   n_merges=0).to_pandas()
        # each word encodes to len(word) chars + the </w> symbol
        assert got.values.tolist() == [["en", 2, 3, len("lowlowernewest") + 3]]

    def test_matches_serial_replica_on_generated(self):
        import duckdb

        from logparse_rs_ray.pipelines.textops import doc_bpe_encode_stats

        got = doc_bpe_encode_stats(SF, n_merges=8).to_pandas()
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT lang, text FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
        want = _serial_encode_stats(rows, 8)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                      check_dtype=False)

    def test_merges_reduce_token_count(self, tmp_path):
        from logparse_rs_ray.pipelines.textops import doc_bpe_encode_stats

        texts = ["the the the cat sat on the mat"] * 3
        sf = _write_documents(tmp_path, texts)
        t0 = doc_bpe_encode_stats(sf, n_merges=0).to_pandas()
        t8 = doc_bpe_encode_stats(sf, n_merges=8).to_pandas()
        assert t8.n_bpe_tokens[0] < t0.n_bpe_tokens[0]
        assert (t8.n_docs[0], t8.n_words[0]) == (t0.n_docs[0], t0.n_words[0])


@pytest.mark.usefixtures("ray_session")
class TestBpeWordCountRegimes:
    def test_tree_equals_shuffle(self):
        """The size-gated type-keyed merge must be regime-invariant."""
        import logparse_rs_ray.stages.shuffle as sh
        from logparse_rs_ray.pipelines.textops import _bpe_word_counts

        tree = _bpe_word_counts(SF, 65536, 8).sort_by([("term", "ascending")])
        old = sh.AUTO_TREE_MAX_BYTES
        sh.AUTO_TREE_MAX_BYTES = 0  # every input looks big -> shuffle path
        try:
            shuf = _bpe_word_counts(SF, 65536, 8).sort_by(
                [("term", "ascending")])
        finally:
            sh.AUTO_TREE_MAX_BYTES = old
        assert tree.equals(shuf)
