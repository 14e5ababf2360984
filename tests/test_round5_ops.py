"""Round-5 additions: TPC-H Q5 (local-supplier volume) and the sliding
duplicated-n-gram fraction signal (``doc_dup_ngram_stats``).

Both carry DuckDB oracles in the driver gate; these tests pin the pieces
the gate cannot see — engineered dup/edge corpora, a serial Python oracle,
and forced multi-partition equivalence for the two-exchange plan.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestQ5LocalSupplierVolume:
    def test_local_predicate_and_region_filter(self):
        """Every output nation is in the query region, and the census
        equals a serial pandas replica of the 6-table join."""
        import pandas as pd

        from logparse_rs_ray.pipelines.relational import (
            Q5_REGION, q5_local_supplier_volume)

        got = q5_local_supplier_volume(SF).to_pandas()

        t = {n: pq.read_table(f"{SF}/{n}.parquet").to_pandas()
             for n in ["region", "nation", "customer", "supplier",
                       "orders", "lineitem"]}
        nat = t["nation"].merge(
            t["region"][t["region"].r_name == Q5_REGION],
            left_on="n_regionkey", right_on="r_regionkey")
        df = (t["lineitem"]
              .merge(t["supplier"], left_on="l_suppkey", right_on="s_suppkey")
              .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
              .merge(t["orders"], left_on="l_orderkey", right_on="o_orderkey")
              .merge(t["customer"], left_on="o_custkey", right_on="c_custkey"))
        df = df[(df.c_nationkey == df.s_nationkey)
                & (df.o_orderdate >= "1996-01-01")
                & (df.o_orderdate < "1997-01-01")]
        rev = (df.l_extendedprice * (1 - df.l_discount) * 10000).round(0)
        want = (pd.DataFrame({"n_name": df.n_name,
                              "revenue_x10k": rev.astype("int64")})
                .groupby("n_name", as_index=False)
                .agg(revenue_x10k=("revenue_x10k", "sum"),
                     n_lines=("revenue_x10k", "size"))
                .sort_values(["revenue_x10k", "n_name"],
                             ascending=[False, True])
                .reset_index(drop=True))
        want["n_lines"] = want["n_lines"].astype("int64")
        assert got.columns.tolist() == ["n_name", "revenue_x10k", "n_lines"]
        pd.testing.assert_frame_equal(got, want)
        region_nations = set(nat.n_name)
        assert set(got.n_name) <= region_nations

    def test_forced_partition_equivalence(self):
        from logparse_rs_ray.pipelines.relational import (
            q5_local_supplier_volume)

        a = q5_local_supplier_volume(SF).to_pandas()
        b = q5_local_supplier_volume(SF, num_partitions=7).to_pandas()
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestDupNgramStats:
    def _run(self, sf_dir, **kw):
        from logparse_rs_ray.pipelines.textops import doc_dup_ngram_stats

        return (doc_dup_ngram_stats(sf_dir, **kw).to_pandas()
                .sort_values("doc_id").set_index("doc_id"))

    def test_pinned_corpus_semantics(self, tmp_path):
        """A shared 8-word span marks every sliding position it covers in
        BOTH docs; docs under 8 words emit no row; within-doc repetition
        counts too (corpus-level >= 2 occurrences)."""
        boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": [f"{boiler} x1 x2",      # 3 grams: dup, uniq, uniq
                     f"y0 {boiler}",         # 2 grams: uniq, dup
                     "short doc",            # < 8 words -> no row
                     f"{boiler} {boiler}"],  # self-repetition: 9 grams
        })
        pq.write_table(tbl, tmp_path / "documents.parquet")
        out = self._run(str(tmp_path))
        assert out.index.tolist() == [1, 2, 4]
        # doc 4's tiling repeats the boiler gram and every rotation of it
        # appears twice within doc 4 alone EXCEPT the 7 mixed grams that
        # span the junction... compute via the serial oracle instead:
        grams: dict[str, int] = {}
        docs = {r["doc_id"]: r["text"] for r in tbl.to_pylist()}
        per_doc: dict[int, list[str]] = {}
        for did, text in docs.items():
            w = text.split(" ")
            gs = [" ".join(w[i:i + 8]) for i in range(len(w) - 7)]
            per_doc[did] = gs
            for g in gs:
                grams[g] = grams.get(g, 0) + 1
        for did in (1, 2, 4):
            gs = per_doc[did]
            ndup = sum(1 for g in gs if grams[g] >= 2)
            assert out.loc[did, "n_grams"] == len(gs), did
            assert out.loc[did, "n_dup_grams"] == ndup, did
            assert out.loc[did, "dup_permille"] == (1000 * ndup) // len(gs)
        assert out.loc[1, "n_dup_grams"] == 1     # only the boiler gram
        assert out.loc[2, "n_dup_grams"] == 1

    def test_serial_oracle_and_partition_equivalence(self):
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pylist()
        grams: dict[str, int] = {}
        per_doc: dict[int, list[str]] = {}
        for r in docs:
            w = r["text"].split(" ")
            gs = [" ".join(w[i:i + 8]) for i in range(len(w) - 7)]
            if gs:
                per_doc[r["doc_id"]] = gs
                for g in gs:
                    grams[g] = grams.get(g, 0) + 1
        out = self._run(SF)
        assert set(out.index) == set(per_doc)
        for did, gs in per_doc.items():
            ndup = sum(1 for g in gs if grams[g] >= 2)
            assert out.loc[did, "n_grams"] == len(gs)
            assert out.loc[did, "n_dup_grams"] == ndup
        forced = self._run(SF, num_partitions=5)
        assert out.equals(forced)


@pytest.mark.usefixtures("ray_session")
class TestSaltedJoin:
    def _tables(self):
        import ray.data as rd

        left = rd.from_arrow(pa.table({
            "k": pa.array([1, 1, 1, 1, 1, 2, 3, 9], type=pa.int64()),
            "v": pa.array(range(8), type=pa.int64())}))
        right = rd.from_arrow(pa.table({
            "rk": pa.array([1, 2, 2, 4], type=pa.int64()),
            "w": pa.array([10, 20, 30, 40], type=pa.int64())}))
        return left, right

    @staticmethod
    def _canon(df):
        cols = sorted(df.columns)
        return (df[cols].sort_values(cols).reset_index(drop=True)
                .astype(str))

    def test_inner_equivalence_and_fact_table(self):
        from logparse_rs_ray.sources import read_table
        from logparse_rs_ray.stages.join import hash_join, salted_join

        li = read_table(SF, "lineitem", columns=["l_orderkey", "l_quantity"])
        o = read_table(SF, "orders", columns=["o_orderkey", "o_orderpriority"])
        a = hash_join(li, o, "l_orderkey", "o_orderkey",
                      num_partitions=4).to_pandas()
        b = salted_join(li, o, "l_orderkey", "o_orderkey",
                        hot_keys=[1, 7, 32, 33], num_salts=5,
                        num_partitions=4).to_pandas()
        assert self._canon(a).equals(self._canon(b))

    def test_left_outer_keeps_unmatched_once(self):
        from logparse_rs_ray.stages.join import hash_join, salted_join

        left, right = self._tables()
        a = hash_join(left, right, "k", "rk", join_type="left_outer",
                      num_partitions=2).to_pandas()
        b = salted_join(left, right, "k", "rk", hot_keys=[1, 2],
                        num_salts=3, join_type="left_outer",
                        num_partitions=2).to_pandas()
        assert len(b) == len(a)                    # k=3,9 appear exactly once
        assert self._canon(a).equals(self._canon(b))

    def test_rejects_outer_right_and_empty_hot_falls_back(self):
        from logparse_rs_ray.stages.join import salted_join

        left, right = self._tables()
        with pytest.raises(ValueError):
            salted_join(left, right, "k", "rk", hot_keys=[1],
                        join_type="full_outer")
        out = salted_join(left, right, "k", "rk", hot_keys=[],
                          num_partitions=2).to_pandas()
        assert len(out) == 7                       # plain inner join

    def test_sample_hot_keys_finds_the_zipf_key(self):
        import numpy as np
        import ray.data as rd

        from logparse_rs_ray.stages.join import sample_hot_keys

        rng = np.random.default_rng(5)
        keys = np.concatenate([np.full(5000, 42, dtype=np.int64),
                               rng.integers(100, 10_000, size=5000)])
        ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(8)
        hot = sample_hot_keys(ds, "k", threshold_frac=0.2)
        assert hot.to_pylist() == [42]


@pytest.mark.usefixtures("ray_session")
class TestWatermarkLateEvents:
    def test_engineered_late_event(self, tmp_path):
        """One shard, three events: the second arrives AFTER an event an
        hour+delay newer (jitter disabled by construction via event_id
        spacing), so its window is past the watermark -> late."""
        import datetime as dt

        import numpy as np

        from logparse_rs_ray.pipelines.windows import (
            WM_JITTER_MOD, WM_JITTER_MULT, log_watermark_late_events)

        base = dt.datetime(2024, 1, 1)
        # pick event_ids whose jitter preserves arrival order: jitter(e) is
        # in [0, 96], so ids spaced >= 97 apart can never swap
        eids = np.array([0, 970, 1940], dtype=np.int64)
        arr = eids + (eids * WM_JITTER_MULT) % WM_JITTER_MOD
        assert (np.diff(arr) > 0).all()
        tbl = pa.table({
            "event_id": pa.array(eids),
            "ts": pa.array([base + dt.timedelta(hours=0, minutes=30),
                            base + dt.timedelta(hours=5),
                            # window [0:30]'s hour ended at 01:00; watermark
                            # is 05:00-2min >= 01:00 -> LATE
                            base + dt.timedelta(minutes=40)],
                           type=pa.timestamp("us")),
            "user_id": pa.array([3, 3, 3], type=pa.int64()),
        })
        pq.write_table(tbl, tmp_path / "events.parquet")
        out = (log_watermark_late_events(str(tmp_path)).to_pandas()
               .set_index("window_start_us"))
        h0 = int(base.timestamp() * 1_000_000)
        assert out.loc[h0, "n_on_time"] == 1       # the 00:30 first arrival
        assert out.loc[h0, "n_late"] == 1          # the 00:40 straggler
        assert out.n_late.sum() == 1

    def test_serial_replica_and_partition_equivalence(self):
        import numpy as np
        import pandas as pd

        from logparse_rs_ray.pipelines.windows import (
            WM_DELAY_US, WM_JITTER_MOD, WM_JITTER_MULT, WM_SHARDS,
            WM_WINDOW_US, log_watermark_late_events)

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_id", "user_id", "ts"]).to_pandas()
        ev["shard"] = ev.user_id % WM_SHARDS
        ev["arr"] = ev.event_id + (ev.event_id * WM_JITTER_MULT) % WM_JITTER_MOD
        ev["ts_us"] = ev.ts.astype("int64")
        rows = []
        for _, g in ev.groupby("shard"):
            g = g.sort_values(["arr", "event_id"])
            wm = g.ts_us.cummax().shift(1)
            wstart = (g.ts_us // WM_WINDOW_US) * WM_WINDOW_US
            late = wm.notna() & (wm - WM_DELAY_US >= wstart + WM_WINDOW_US)
            rows.append(pd.DataFrame({"w": wstart, "late": late}))
        rep = pd.concat(rows)
        want = (rep.groupby("w")
                .agg(n_on_time=("late", lambda s: int((~s).sum())),
                     n_late=("late", "sum")).reset_index()
                .rename(columns={"w": "window_start_us"}))
        got = log_watermark_late_events(SF).to_pandas()
        assert got.window_start_us.tolist() == want.window_start_us.tolist()
        assert got.n_on_time.tolist() == want.n_on_time.astype(int).tolist()
        assert got.n_late.tolist() == want.n_late.astype(int).tolist()
        assert got.n_late.sum() > 0                # semantics exercised
        forced = log_watermark_late_events(SF, num_partitions=5).to_pandas()
        assert got.equals(forced)


@pytest.mark.usefixtures("ray_session")
class TestPrunePrototypes:
    def test_serial_replica_seeds_excluded_and_drops_happen(self):
        import numpy as np

        from logparse_rs_ray.pipelines.similarity import (
            N_SEEDS, PROTO_COS_MAX, embed_prune_prototypes)

        got = (embed_prune_prototypes(SF).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        emb = pq.read_table(f"{SF}/embeddings.parquet",
                            columns=["vec_id", "embedding"]).to_pandas()
        mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        order = np.argsort(emb.vec_id.to_numpy())
        mat = mat[order]
        ids = emb.vec_id.to_numpy()[order]
        smat = mat[:N_SEEDS]
        sims = mat[N_SEEDS:] @ smat.T
        cluster = np.argmax(sims, axis=1)
        best = np.floor(sims[np.arange(len(sims)), cluster] * 1000).astype(int)
        keep = best < PROTO_COS_MAX
        assert (got.vec_id.to_numpy() == ids[N_SEEDS:][keep]).all()
        assert (got.cluster.to_numpy() == cluster[keep]).all()
        assert (got.cos_pct.to_numpy() == best[keep]).all()
        assert (got.vec_id >= N_SEEDS).all()          # seeds never candidates
        n_total = len(ids) - N_SEEDS
        assert 0 < len(got) < n_total                 # prunes some, not all


@pytest.mark.usefixtures("ray_session")
class TestLateUpdateCensus:
    def test_three_way_split_consistent_with_binary(self):
        """on_time matches the binary op; updates + dropped == late; all
        three classes are populated at SF (semantics exercised)."""
        from logparse_rs_ray.pipelines.windows import (
            log_late_update_census, log_watermark_late_events)

        tri = (log_late_update_census(SF).to_pandas()
               .set_index("window_start_us"))
        bi = (log_watermark_late_events(SF).to_pandas()
              .set_index("window_start_us"))
        assert tri.index.equals(bi.index)
        assert (tri.n_on_time == bi.n_on_time).all()
        assert ((tri.n_updates + tri.n_dropped) == bi.n_late).all()
        assert tri.n_updates.sum() > 0 and tri.n_dropped.sum() > 0

    def test_infinite_allowed_lateness_drops_nothing(self):
        from logparse_rs_ray.pipelines.windows import log_late_update_census

        out = log_late_update_census(SF, allowed_us=1 << 62).to_pandas()
        assert out.n_dropped.sum() == 0


@pytest.mark.usefixtures("ray_session")
class TestCompaction:
    def _fragmented_tree(self, tmp_path):
        """A 2-sink hive tree with 6 small files per sink."""
        import numpy as np

        root = tmp_path / "out"
        for sink in ("a", "b"):
            d = root / f"sink={sink}"
            d.mkdir(parents=True)
            for i in range(6):
                pq.write_table(
                    pa.table({"x": pa.array(np.arange(i * 10, i * 10 + 10)),
                              "s": pa.array([sink] * 10)}),
                    d / f"part-{i}.parquet")
        return str(root)

    @staticmethod
    def _read_all(root):
        import pyarrow.dataset as pads

        return (pads.dataset(root).to_table().to_pandas()
                .sort_values(["s", "x"]).reset_index(drop=True))

    def test_merges_preserves_content_and_is_idempotent(self, tmp_path):
        import os

        from logparse_rs_ray.state.compact import compact_tree

        root = self._fragmented_tree(tmp_path)
        before = self._read_all(root)
        stats = compact_tree(root)
        assert stats == {"root": root, "dirs": 2, "in_files": 12,
                         "out_files": 2}
        after = self._read_all(root)
        assert before.equals(after)
        for sink in ("a", "b"):
            files = os.listdir(f"{root}/sink={sink}")
            assert files == ["compact-00000.parquet"]
        again = compact_tree(root)
        assert again["in_files"] == again["out_files"] == 2   # no-op rerun

    def test_crash_recovery_replays_marker(self, tmp_path):
        """Simulate a crash right after the commit marker landed (originals
        not yet deleted, tmps not yet renamed): rerun must finish the
        commit, not duplicate rows."""
        import json
        import os
        import shutil

        from logparse_rs_ray.state.compact import (MARKER, compact_one_dir)

        root = self._fragmented_tree(tmp_path)
        d = f"{root}/sink=a"
        before = self._read_all(f"{root}/sink=a")
        files = sorted(os.listdir(d))
        # hand-craft the post-marker crash state: tmps written, marker
        # committed, originals still present
        import pyarrow.parquet as pqt
        tables = [pqt.read_table(f"{d}/{f}") for f in files]
        merged = pa.concat_tables(tables)
        pqt.write_table(merged, f"{d}/.compact-00000.tmp")
        with open(f"{d}/{MARKER}", "w", encoding="utf-8") as fh:
            json.dump({"delete": files,
                       "rename": [[".compact-00000.tmp",
                                   "compact-00000.parquet"]]}, fh)
        stats = compact_one_dir(d)
        assert stats["recovered"] is True and stats["skipped"] is True
        assert sorted(os.listdir(d)) == ["compact-00000.parquet"]
        after = self._read_all(d)
        assert before.equals(after)


@pytest.mark.usefixtures("ray_session")
class TestCcnetBuckets:
    def test_matches_pandas_ntile_replica(self):
        import pandas as pd

        from logparse_rs_ray.pipelines.textops import (
            doc_ccnet_buckets, doc_lm_score)

        got = (doc_ccnet_buckets(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        scores = (doc_lm_score(SF, _with_lang=True).to_pandas()
                  .sort_values("doc_id").reset_index(drop=True))
        # serial NTILE(3) replica: per lang, rank by (bits, doc_id)
        rep = scores.sort_values(["lang", "bits_x1000", "doc_id"]).copy()
        parts = []
        for _, g in rep.groupby("lang", sort=False):
            n = len(g)
            q, r = divmod(n, 3)
            rank = pd.RangeIndex(n).to_numpy()
            big = r * (q + 1)
            bucket = [rk // (q + 1) + 1 if rk < big
                      else r + (rk - big) // max(q, 1) + 1 for rk in rank]
            g = g.assign(bucket=bucket)
            parts.append(g)
        want = (pd.concat(parts).sort_values("doc_id")
                .reset_index(drop=True))
        assert got.doc_id.tolist() == want.doc_id.tolist()
        assert got.lang.tolist() == want.lang.tolist()
        assert got.bits_x1000.tolist() == want.bits_x1000.tolist()
        assert got.bucket.tolist() == want.bucket.tolist()
        # CCNet semantics: within a lang, head scores <= tail scores
        for _, g in got.groupby("lang"):
            assert g[g.bucket == 1].bits_x1000.max() <= \
                g[g.bucket == 3].bits_x1000.min()
        # buckets balanced to within one doc per lang
        sizes = got.groupby(["lang", "bucket"]).size()
        for lang, g in sizes.groupby(level=0):
            assert g.max() - g.min() <= 1

    def test_forced_partition_equivalence(self):
        from logparse_rs_ray.pipelines.textops import doc_ccnet_buckets

        a = (doc_ccnet_buckets(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (doc_ccnet_buckets(SF, num_partitions=5).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestRound5Edges:
    def test_compact_nested_hive_levels(self, tmp_path):
        """Two partition levels plus files at an intermediate level: every
        directory that holds parquet files is compacted independently."""
        import os

        from logparse_rs_ray.state.compact import compact_tree

        root = tmp_path / "out"
        for sub in ("sink=a/date=1", "sink=a/date=2"):
            d = root / sub
            d.mkdir(parents=True)
            for i in range(3):
                pq.write_table(pa.table({"x": [i, i + 10]}),
                               d / f"p{i}.parquet")
        # intermediate-level stray files next to subdirs
        for i in range(2):
            pq.write_table(pa.table({"x": [100 + i]}),
                           root / "sink=a" / f"stray{i}.parquet")
        stats = compact_tree(str(root))
        assert stats["dirs"] == 3 and stats["out_files"] == 3
        assert sorted(os.listdir(root / "sink=a/date=1")) == \
            ["compact-00000.parquet"]
        assert "compact-00000.parquet" in os.listdir(root / "sink=a")
        import pyarrow.dataset as pads

        vals = sorted(pads.dataset(str(root)).to_table()["x"].to_pylist())
        assert vals == sorted([0, 10, 1, 11, 2, 12] * 2 + [100, 101])

    def test_salted_join_single_salt_degenerates(self):
        import ray.data as rd

        from logparse_rs_ray.stages.join import hash_join, salted_join

        left = rd.from_arrow(pa.table({"k": [1, 1, 2], "v": [1, 2, 3]}))
        right = rd.from_arrow(pa.table({"rk": [1, 2], "w": [10, 20]}))
        a = hash_join(left, right, "k", "rk", num_partitions=2).to_pandas()
        b = salted_join(left, right, "k", "rk", hot_keys=[1], num_salts=1,
                        num_partitions=2).to_pandas()
        cols = sorted(a.columns)
        assert (a[cols].sort_values(cols).reset_index(drop=True)
                .equals(b[cols].sort_values(cols).reset_index(drop=True)))

    def test_watermark_single_event_is_on_time(self, tmp_path):
        import datetime as dt

        from logparse_rs_ray.pipelines.windows import (
            log_late_update_census, log_watermark_late_events)

        pq.write_table(pa.table({
            "event_id": pa.array([5], pa.int64()),
            "ts": pa.array([dt.datetime(2024, 1, 1, 0, 30)],
                           type=pa.timestamp("us")),
            "user_id": pa.array([9], pa.int64()),
        }), tmp_path / "events.parquet")
        bi = log_watermark_late_events(str(tmp_path)).to_pandas()
        assert bi.n_on_time.tolist() == [1] and bi.n_late.tolist() == [0]
        tri = log_late_update_census(str(tmp_path)).to_pandas()
        assert tri.n_on_time.tolist() == [1]
        assert tri.n_updates.tolist() == [0] == tri.n_dropped.tolist()

    def test_dup_ngram_single_gram_docs(self, tmp_path):
        """Exactly-8-word docs: one gram each; two identical docs dup each
        other, a distinct one stays unique."""
        g1 = "a1 a2 a3 a4 a5 a6 a7 a8"
        g2 = "b1 b2 b3 b4 b5 b6 b7 b8"
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [g1, g1, g2],
        }), tmp_path / "documents.parquet")
        from logparse_rs_ray.pipelines.textops import doc_dup_ngram_stats

        out = (doc_dup_ngram_stats(str(tmp_path)).to_pandas()
               .sort_values("doc_id").set_index("doc_id"))
        assert out.n_grams.tolist() == [1, 1, 1]
        assert out.n_dup_grams.tolist() == [1, 1, 0]
        assert out.dup_permille.tolist() == [1000, 1000, 0]
