"""Property-based conformance (hypothesis): the vectorized/batch kernels must
agree with the serial reference-semantics oracles on arbitrary inputs."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from logparse_rs_ray.core.anonymize import (
    SerialAnonymizer,
    anonymize_column,
    load_anon_config,
)
from logparse_rs_ray.core.fnv import fnv1a64, fnv1a64_arrow
from logparse_rs_ray.core.strkit import csv_split_column, extract_csv_payload
from logparse_rs_ray.core.tokenize import extract_field, split_csv

# lines over a CSV-hostile alphabet (quotes, commas, whitespace, unicode)
line_st = st.text(
    alphabet=st.sampled_from(list('abc",é中 13\t.')), max_size=40
)
value_st = st.text(max_size=20)


class TestTokenizerProperties:
    @settings(max_examples=300, deadline=None)
    @given(line_st)
    def test_extract_field_agrees_with_split(self, line):
        fields = split_csv(line)
        for i in range(len(fields)):
            assert extract_field(line, i) == fields[i]
        edge = extract_field(line, len(fields))
        assert edge == (None if line.endswith(",") else "")
        assert extract_field(line, len(fields) + 1) is None

    @settings(max_examples=200, deadline=None)
    @given(st.lists(line_st, max_size=20))
    def test_vectorized_split_fast_path_matches_serial(self, lines):
        # the batch layer: quote-free rows must match split_csv exactly;
        # quoted rows are flagged for the exact fallback
        arr = pa.array(lines, type=pa.string())
        splits, quoted = csv_split_column(arr)
        for i, line in enumerate(lines):
            if quoted[i] or line == "":
                continue  # fallback path / empty-line special case
            assert splits[i].as_py() == split_csv(line), line

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(max_size=30), max_size=20))
    def test_fnv_vector_matches_scalar(self, values):
        arr = pa.array(values, type=pa.string())
        vec = fnv1a64_arrow(arr)
        for i, v in enumerate(values):
            assert int(vec[i]) == fnv1a64(v)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(alphabet=st.sampled_from(list("ab 1,:x\n\xa0\u2009")), max_size=30),
                    max_size=10))
    def test_payload_extraction_matches_python_oracle(self, texts):
        def oracle(line: str) -> str:
            idx = line.find(" 1,")
            return line[idx + 1:].strip() if idx != -1 else line.strip()

        arr = pa.array(texts, type=pa.string())
        out = extract_csv_payload(arr)
        for i, t in enumerate(texts):
            assert out[i].as_py() == oracle(t), repr(t)


ANON_CFG = load_anon_config({
    "version": 1,
    "defaults": {"mode": "tokenize", "tokenize": {"prefix": "T_", "salt": "s"}},
    "fields": {
        "m": {"mode": "map", "map": {"a": "A", "b": "B"}, "fallback": "tokenize",
              "tokenize": {"prefix": "M_", "salt": "fs"}},
        "r": {"mode": "map", "map": {"a": "A"}, "fallback": "reject"},
        "f": {"mode": "fixed"},
    },
})


class TestAnonymizerProperties:
    @settings(max_examples=150, deadline=None)
    @given(st.sampled_from(["m", "r", "f", "other"]),
           st.lists(st.one_of(value_st, st.none()), max_size=15))
    def test_column_matches_serial_engine(self, field, values):
        col = pa.array(values, type=pa.string())
        out, replaced = anonymize_column(ANON_CFG, field, col)
        oracle = SerialAnonymizer(ANON_CFG)
        for i, v in enumerate(values):
            if v is None:
                assert not out[i].is_valid
                continue
            want = oracle.anonymize_one(field, v)
            if want is None:
                assert out[i].as_py() == v
                assert not replaced[i].as_py()
            else:
                assert out[i].as_py() == want
                assert replaced[i].as_py()


class TestGeneratorProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 5000), st.integers(1, 60))
    def test_any_slice_matches_whole(self, start, length):
        from logparse_rs_ray.webtext import generate_webtext_rows

        ids = np.arange(start, start + length, dtype=np.int64)
        a = generate_webtext_rows(ids)
        # non-contiguous subset must equal row-wise selection
        sub = ids[::2]
        b = generate_webtext_rows(sub)
        assert b.equals(a.take(pa.array(np.arange(0, length, 2))))


class TestTextKernelProperties:
    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.lists(st.sampled_from(["a", "b", "c", "dd", "e f"]),
                             max_size=30),
                    min_size=1, max_size=25))
    def test_repetition_kernel_matches_serial_counter(self, word_lists):
        from collections import Counter

        from logparse_rs_ray.pipelines.textops import repetition_signals

        texts = [" ".join(ws) for ws in word_lists]
        b = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        out = repetition_signals(b)
        for i, text in enumerate(texts):
            c = Counter(text.split(" "))  # "" splits to [""] like the kernel
            n = sum(c.values())
            assert out["n_words"][i].as_py() == n
            assert out["n_distinct"][i].as_py() == len(c)
            assert out["top_word_pml"][i].as_py() == max(c.values()) * 1000 // n
            assert out["dup_word_pml"][i].as_py() == (n - len(c)) * 1000 // n


class TestPassageKernelProperties:
    @given(st.lists(st.text(alphabet=st.sampled_from(list("ab é x")),
                            max_size=40), min_size=1, max_size=12),
           st.integers(1, 5))
    @settings(max_examples=60, deadline=None)
    def test_passage_arrays_match_python_split(self, texts, window):
        """Vectorized passage extraction (ListArray offset rebuild +
        binary_join) == pure-Python windowed split, on arbitrary text
        incl. unicode, empty strings and repeated separators."""
        import numpy as np
        import pyarrow as pa

        from logparse_rs_ray.pipelines.dedup import _passage_arrays

        b = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        npass, pid, passages = _passage_arrays(b, window)
        flat = passages.to_pylist()
        k = 0
        for d, t in enumerate(texts):
            words = t.split(" ")
            expect = [" ".join(words[i * window:(i + 1) * window])
                      for i in range((len(words) + window - 1) // window)]
            assert npass[d] == len(expect), (d, t)
            got = flat[k:k + len(expect)]
            assert got == expect, (d, t)
            assert list(pid[k:k + len(expect)]) == list(range(len(expect)))
            k += len(expect)
        assert k == len(flat)


class TestBurstKernelProperties:
    @given(st.lists(st.tuples(st.integers(0, 4),           # user
                              st.integers(0, 200)),        # ts (µs scale)
                    min_size=1, max_size=60),
           st.integers(1, 50))                             # window µs
    @settings(max_examples=120, deadline=None)
    def test_burst_kernel_matches_brute_force(self, rows, w):
        """Composite-key double-searchsorted RANGE counting == O(n²)
        brute force, on arbitrary users/timestamps incl. equal-ts peers
        and cross-user adjacency (the packing's leakage risk)."""
        from logparse_rs_ray.pipelines.windows import burst_census_kernel

        b = pa.table({
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        })
        got = burst_census_kernel(b, window_us=w)
        got_map = dict(zip(got["user_id"].to_pylist(),
                           got["max_burst"].to_pylist()))
        want: dict[int, int] = {}
        for u, t in rows:
            n = sum(1 for uu, tt in rows if uu == u and t - w <= tt <= t)
            want[u] = max(want.get(u, 0), n)
        assert got_map == want


class TestRangeWindowKernelProperties:
    @given(st.lists(st.tuples(st.integers(0, 3),            # custkey
                              st.integers(0, 40),           # day index
                              st.integers(0, 500)),         # price (cents/100)
                    min_size=1, max_size=50),
           st.integers(1, 15))                              # window days
    @settings(max_examples=100, deadline=None)
    def test_range_window_matches_brute_force(self, rows, w):
        """Composite-key prefix-sum RANGE framing == O(n²) brute force,
        incl. equal-date peers sharing one frame and adjacent customers."""
        import datetime

        from logparse_rs_ray.pipelines.relational import range_window_kernel

        base = datetime.datetime(2020, 1, 1)
        b = pa.table({
            "o_orderkey": pa.array(range(len(rows)), type=pa.int64()),
            "o_custkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "o_orderdate": pa.array(
                [base + datetime.timedelta(days=r[1]) for r in rows],
                type=pa.timestamp("us")),
            "o_totalprice": pa.array([float(r[2]) for r in rows]),
        })
        got = range_window_kernel(b, window_days=w)
        got_map = dict(zip(got["o_orderkey"].to_pylist(),
                           got["rev30_cents"].to_pylist()))
        for i, (cu, d, p) in enumerate(rows):
            want = sum(pp * 100 for (cc, dd, pp) in rows
                       if cc == cu and d - w <= dd <= d)
            assert got_map[i] == want, (i, rows, w)


class TestRankMapProperties:
    @given(st.lists(st.tuples(st.sampled_from(["A", "B", "C"]),
                              st.integers(-100, 100)),      # cents
                    min_size=1, max_size=40))
    @settings(max_examples=120, deadline=None)
    def test_rank_maps_match_brute_force(self, rows):
        """Histogram-derived descending RANK / DENSE_RANK / COUNT maps ==
        per-row brute force, incl. ties, negatives and singleton segments."""
        from collections import Counter

        import pandas as pd

        from logparse_rs_ray.pipelines.relational import \
            rank_maps_from_histogram

        hist = Counter(rows)
        h = pd.DataFrame([(seg, cents, n)
                          for (seg, cents), n in hist.items()],
                         columns=["c_mktsegment", "cents", "cnt"])
        keys, rank, dense, n_seg, segs = rank_maps_from_histogram(h)
        seg_code = {s: i for i, s in enumerate(segs)}
        offset = np.int64(1) << 31
        for seg, cents in set(rows):
            k = (np.int64(seg_code[seg]) << 32) | (cents + offset)
            pos = np.searchsorted(keys, k)
            in_seg = [c for s2, c in rows if s2 == seg]
            want_rank = 1 + sum(1 for c in in_seg if c > cents)
            want_dense = 1 + len({c for c in in_seg if c > cents})
            assert rank[pos] == want_rank, (seg, cents, rows)
            assert dense[pos] == want_dense, (seg, cents, rows)
            assert n_seg[pos] == len(in_seg)


class TestBlameDominateKernelProperties:
    @given(st.lists(st.tuples(st.integers(0, 6),            # orderkey
                              st.integers(0, 3),            # suppkey
                              st.booleans()),               # returned?
                    min_size=1, max_size=50))
    @settings(max_examples=120, deadline=None)
    def test_blame_kernel_matches_brute_force(self, rows):
        """Q21 blame (sole returner in a multi-supplier order) == brute
        force, incl. partial pair-merge inputs (duplicate pair rows)."""
        from collections import Counter

        from logparse_rs_ray.pipelines.relational import blame_census_kernel

        b = pa.table({
            "l_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "l_suppkey": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_r": pa.array([int(r[2]) for r in rows], type=pa.int64()),
        })
        got = blame_census_kernel(b)
        got_map = dict(zip(got["l_suppkey"].to_pylist(),
                           got["numwait"].to_pylist()))
        nr: Counter = Counter()
        for o, s2, r in rows:
            nr[(o, s2)] += int(r)
        want: Counter = Counter()
        orders = {o for o, _, _ in rows}
        for o in orders:
            supps = {s2 for (oo, s2) in nr if oo == o}
            returners = [s2 for s2 in supps if nr[(o, s2)] > 0]
            if len(supps) >= 2 and len(returners) == 1:
                want[returners[0]] += nr[(o, returners[0])]
        assert got_map == dict(want)

    @given(st.lists(st.tuples(st.integers(0, 5),            # partkey
                              st.integers(0, 3),            # suppkey
                              st.integers(1, 20)),          # qty
                    min_size=1, max_size=50))
    @settings(max_examples=120, deadline=None)
    def test_dominate_kernel_matches_brute_force(self, rows):
        """Q20 fair-share dominance == brute force, incl. the exact
        equality boundary (strict >) and partial pair-merge inputs."""
        from collections import Counter

        from logparse_rs_ray.pipelines.relational import (
            Q20_FAIR_MULT, dominate_census_kernel)

        b = pa.table({
            "l_partkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "l_suppkey": pa.array([r[1] for r in rows], type=pa.int64()),
            "q": pa.array([r[2] for r in rows], type=pa.int64()),
        })
        got = dominate_census_kernel(b)
        got_map = dict(zip(got["l_suppkey"].to_pylist(),
                           got["n_dominated"].to_pylist()))
        qsum: Counter = Counter()
        for p2, s2, q in rows:
            qsum[(p2, s2)] += q
        want: Counter = Counter()
        for p2 in {p for p, _, _ in rows}:
            pairs = {s2: q for (pp, s2), q in qsum.items() if pp == p2}
            tot = sum(pairs.values())
            for s2, q in pairs.items():
                if q * len(pairs) > Q20_FAIR_MULT * tot:
                    want[s2] += 1
        assert got_map == dict(want)


class TestFunnelKernelProperties:
    @given(st.lists(st.tuples(st.integers(0, 3),            # user
                              st.integers(0, 2),            # stage code
                              st.integers(0, 100)),         # ts
                    min_size=1, max_size=40),
           st.one_of(st.none(), st.integers(1, 30)))        # window or None
    @settings(max_examples=120, deadline=None)
    def test_funnel_kernel_matches_brute_force(self, rows, w):
        """Masked-reduceat funnel chain (unbounded AND windowed) == per-user
        brute force, incl. same-ts stage collisions and missing stages."""
        from logparse_rs_ray.pipelines.windows import funnel_census_kernel

        b = pa.table({
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "code": pa.array([r[1] for r in rows], type=pa.int8()),
            "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
        })
        got = funnel_census_kernel(b, window_us=w)
        got_counts = dict(zip(got["stage"].to_pylist(),
                              got["n_users"].to_pylist()))
        want = [0, 0, 0]
        for u in {r[0] for r in rows}:
            ev = [(c, t) for uu, c, t in rows if uu == u]
            t_prev = min((t for c, t in ev if c == 0), default=None)
            if t_prev is None:
                continue
            want[0] += 1
            for stage in (1, 2):
                cand = [t for c, t in ev if c == stage and t > t_prev
                        and (w is None or t - t_prev <= w)]
                if not cand:
                    t_prev = None
                    break
                t_prev = min(cand)
                want[stage] += 1
        assert [got_counts["signup"], got_counts["click"],
                got_counts["purchase"]] == want, (rows, w)


class TestLastTouchKernelProperties:
    @given(st.lists(st.tuples(st.integers(0, 3),              # user
                              st.integers(0, 50),             # ts
                              st.sampled_from(["view", "click", "purchase"])),
                    min_size=1, max_size=40))
    @settings(max_examples=120, deadline=None)
    def test_last_touch_matches_brute_force(self, rows):
        """Segment-reset maximum.accumulate credit == per-purchase brute
        force, incl. equal-ts event_id tiebreaks, purchase-first users and
        cross-user adjacency (carried-index rejection)."""
        from collections import Counter

        from logparse_rs_ray.pipelines.windows import last_touch_kernel

        b = pa.table({
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
        })
        got = last_touch_kernel(b)
        got_map = dict(zip(got["event_type"].to_pylist(),
                           got["n_attributed"].to_pylist()))
        want: Counter = Counter()
        for i, (u, t, ty) in enumerate(rows):
            if ty != "purchase":
                continue
            prior = [(tt, j, tyj) for j, (uu, tt, tyj) in enumerate(rows)
                     if uu == u and tyj != "purchase"
                     and (tt, j) < (t, i)]
            if prior:
                want[max(prior)[2]] += 1
        assert got_map == dict(want), rows


class TestCohortKernelProperties:
    @given(st.lists(st.tuples(st.integers(0, 4),             # user
                              st.integers(0, 30)),           # day index
                    min_size=1, max_size=40))
    @settings(max_examples=100, deadline=None)
    def test_cohort_kernel_matches_brute_force(self, rows):
        """Lexsort cohort/offset census == per-user brute force, incl.
        multi-event weeks (distinct-week dedup) and week boundaries."""
        from collections import Counter

        from logparse_rs_ray.pipelines.windows import (
            WEEK_US, cohort_matrix_kernel)

        day_us = 24 * 3_600_000_000
        b = pa.table({
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] * day_us for r in rows],
                           type=pa.timestamp("us")),
        })
        got = cohort_matrix_kernel(b)
        got_map = {(c, o): n for c, o, n in
                   zip(got["cohort_week"].to_pylist(),
                       got["week_offset"].to_pylist(),
                       got["n_active"].to_pylist())}
        want: Counter = Counter()
        for u in {r[0] for r in rows}:
            weeks = {(d * day_us) // WEEK_US for uu, d in rows if uu == u}
            cohort = min(weeks)
            for w in weeks:
                want[(cohort, w - cohort)] += 1
        assert got_map == dict(want), rows


class TestCusumKernelProperties:
    @given(st.lists(st.tuples(st.sampled_from(["a", "b"]),
                              st.integers(0, 50),           # ts
                              st.integers(0, 200)),         # value cents/100
                    min_size=1, max_size=40),
           st.integers(0, 100),                             # k (cents)
           st.integers(1, 300))                             # h (cents)
    @settings(max_examples=120, deadline=None)
    def test_closed_form_matches_serial_recursion(self, rows, k, h):
        """S_i = C_i - min(0, min C_j) closed form == the textbook
        max(0, S_prev + d) recursion, incl. alarm crossings and max_s."""
        from collections import defaultdict

        from logparse_rs_ray.pipelines.windows import cusum_census_kernel

        b = pa.table({
            "event_type": pa.array([r[0] for r in rows]),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "value": pa.array([r[2] / 100.0 for r in rows]),
        })
        got = cusum_census_kernel(b, k_cents=k, h_cents=h)
        got_map = {t: (n, a, m) for t, n, a, m in
                   zip(got["event_type"].to_pylist(),
                       got["n_events"].to_pylist(),
                       got["n_alarms"].to_pylist(),
                       got["max_s"].to_pylist())}
        series = defaultdict(list)
        for i, (t, ts_, v) in enumerate(rows):
            series[t].append((ts_, i, v))
        want = {}
        for t, evs in series.items():
            evs.sort()
            s, alarms, mx = 0, 0, 0
            for _, _, v in evs:
                prev = s
                s = max(0, s + v - k)
                mx = max(mx, s)
                if s > h and prev <= h:
                    alarms += 1
            want[t] = (len(evs), alarms, mx)
        assert got_map == want, (rows, k, h)


class TestWatermarkArraysProperty:
    """The pure-numpy per-partition watermark core equals a pandas replica
    on arbitrary (shard, arr, event_id, ts) row sets — any shard mix, ties
    in arrival order, single-row shards, negative timestamps."""

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 3),        # shard
                              st.integers(0, 50),       # arr (ties likely)
                              st.integers(0, 10**6),    # event_id
                              st.integers(-10**9, 10**9)),  # ts_us
                    min_size=1, max_size=60, unique_by=lambda t: t[2]))
    def test_matches_pandas_replica(self, rows):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from logparse_rs_ray.pipelines.windows import (
            WM_WINDOW_US, _watermark_arrays)

        b = pa.table({
            "shard": pa.array([r[0] for r in rows], pa.int64()),
            "arr": pa.array([r[1] for r in rows], pa.int64()),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "ts_us": pa.array([r[3] for r in rows], pa.int64()),
        })
        wstart, wm_prev, has_wm = _watermark_arrays(b)

        df = pd.DataFrame(rows, columns=["shard", "arr", "event_id", "ts_us"])
        df = df.sort_values(["shard", "arr", "event_id"])
        wm = df.groupby("shard").ts_us.apply(
            lambda s: s.cummax().shift(1)).reset_index(drop=True)
        want_w = ((df.ts_us // WM_WINDOW_US) * WM_WINDOW_US).to_numpy()
        assert (wstart == want_w).all()
        assert (has_wm == wm.notna().to_numpy()).all()
        got = np.where(has_wm, wm_prev, 0)
        want = np.where(wm.notna().to_numpy(), wm.fillna(0).to_numpy(), 0)
        assert (got == want.astype(np.int64)).all()
