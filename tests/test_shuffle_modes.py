"""Shuffle-mode vs tree-mode equivalence for the corpus-keyed dedup ops.

VERDICT r01 items 1 & 5: the LSH bucket merge and exact-hash dedup must not
funnel through one task.  These tests force >= 4 hash partitions and assert
the shuffle-mode outputs are byte-identical to the combiner-tree outputs
(buckets/keys are independent, so the two execution shapes must agree).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _df(obj) -> pd.DataFrame:
    """Canonicalize: outputs are order-free since the trailing corpus sorts
    were dropped (VERDICT r03 item 2), so compare as sorted frames."""
    out = obj.to_pandas() if hasattr(obj, "to_pandas") else obj
    return out.sort_values(list(out.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
class TestHashPartition:
    def test_each_key_lands_in_exactly_one_block(self):
        import ray.data

        from logparse_rs_ray.stages.shuffle import hash_partition

        ds = ray.data.range(20000).map_batches(
            lambda b: pa.table({"k": pa.array(np.asarray(b["id"]) % 101)}),
            batch_format="pyarrow", batch_size=None)
        part = hash_partition(ds, ["k"], 6)

        def keys_in_block(b: pa.Table) -> pa.Table:
            u = np.unique(np.asarray(b["k"]))
            return pa.table({"k": pa.array(u),
                             "blocks": pa.array(np.ones(len(u), dtype=np.int64))})

        per = part.map_batches(keys_in_block, batch_format="pyarrow",
                               batch_size=None).to_pandas()
        counts = per.groupby("k")["blocks"].sum()
        assert len(counts) == 101
        assert counts.max() == 1  # no key straddles two blocks

    def test_grouped_agg_shuffle_equals_tree(self):
        from logparse_rs_ray.pipelines.logops import log_hourly_window
        from logparse_rs_ray.sources import read_table
        from logparse_rs_ray.stages.aggregate import count_by

        ds1 = read_table(SF, "events", columns=["event_type"])
        ds2 = read_table(SF, "events", columns=["event_type"])
        a = _df(count_by(ds1, "event_type", mode="shuffle",
                         final_partitions=3)).sort_values("event_type").reset_index(drop=True)
        b = _df(count_by(ds2, "event_type", mode="tree")).sort_values("event_type").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_hash_merge_equals_tree_merge(self):
        import ray.data

        from logparse_rs_ray.stages.aggregate import tree_merge
        from logparse_rs_ray.stages.shuffle import hash_merge

        def mk():
            return ray.data.range(10000).map_batches(
                lambda b: pa.table({"k": pa.array(np.asarray(b["id"]) % 53),
                                    "v": pa.array(np.asarray(b["id"], dtype=np.int64))}),
                batch_format="pyarrow", batch_size=None)

        specs = [("v", "sum")]
        a = _df(hash_merge(mk(), ["k"], specs, num_partitions=5)).sort_values("k").reset_index(drop=True)
        b = _df(tree_merge(mk(), ["k"], specs, fanin=4)).sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
class TestDedupModeEquivalence:
    def test_minhash_candidates_shuffle_equals_tree(self):
        from logparse_rs_ray.pipelines.dedup import minhash_candidate_pairs

        shuf = _df(minhash_candidate_pairs(SF, mode="shuffle", num_partitions=5))
        tree = _df(minhash_candidate_pairs(SF, mode="tree"))
        key = ["doc_a", "doc_b"]
        pd.testing.assert_frame_equal(
            shuf.sort_values(key).reset_index(drop=True),
            tree.sort_values(key).reset_index(drop=True))

    def test_simhash_pairs_shuffle_equals_tree(self):
        from logparse_rs_ray.pipelines.dedup import simhash_pairs

        shuf = _df(simhash_pairs(SF, mode="shuffle", num_partitions=5))
        tree = _df(simhash_pairs(SF, mode="tree"))
        pd.testing.assert_frame_equal(shuf, tree)

    def test_exact_dedup_shuffle_equals_tree(self):
        from logparse_rs_ray.pipelines.dedup import exact_dedup_by_hash

        shuf = _df(exact_dedup_by_hash(SF, mode="shuffle", num_partitions=5))
        tree = _df(exact_dedup_by_hash(SF, mode="tree"))
        pd.testing.assert_frame_equal(shuf, tree)

    def test_stratified_sample_modes_agree(self):
        from logparse_rs_ray.pipelines.textops import doc_stratified_sample

        shuf = _df(doc_stratified_sample(SF, mode="shuffle", num_partitions=5))
        one = _df(doc_stratified_sample(SF, mode="tree"))
        pd.testing.assert_frame_equal(shuf, one)

    def test_sessionize_modes_agree(self):
        from logparse_rs_ray.pipelines.windows import log_sessionize

        shuf = _df(log_sessionize(SF, mode="shuffle", num_partitions=5))
        one = _df(log_sessionize(SF, mode="tree"))
        pd.testing.assert_frame_equal(shuf, one)

    def test_first_event_modes_agree(self):
        from logparse_rs_ray.pipelines.windows import log_first_event_per_user

        shuf = _df(log_first_event_per_user(SF, mode="shuffle", num_partitions=5))
        one = _df(log_first_event_per_user(SF, mode="tree"))
        pd.testing.assert_frame_equal(shuf, one)

    def test_neardup_clusters_unionfind_equals_propagation(self):
        from logparse_rs_ray.pipelines.dedup import neardup_clusters

        uf = _df(neardup_clusters(SF))                            # union-find path
        lp = _df(neardup_clusters(SF, small_graph_max_pairs=0))   # label propagation
        pd.testing.assert_frame_equal(uf, lp)

    def test_ngram_verify_broadcast_equals_hashjoin(self):
        from logparse_rs_ray.pipelines.dedup import verified_pairs_ngram

        bc = _df(verified_pairs_ngram(SF))                          # broadcast path
        hj = _df(verified_pairs_ngram(SF, broadcast_max_cands=0))   # hash-join path
        pd.testing.assert_frame_equal(bc, hj)

    def test_doc_exact_dedup_shuffle_equals_tree(self):
        from logparse_rs_ray.pipelines.logops import doc_exact_dedup

        shuf = _df(doc_exact_dedup(SF, mode="shuffle", num_partitions=5))
        tree = _df(doc_exact_dedup(SF, mode="tree"))
        pd.testing.assert_frame_equal(shuf, tree)


@pytest.mark.usefixtures("ray_session")
class TestAsofModes:
    def test_asof_modes_agree(self):
        from logparse_rs_ray.pipelines.windows import log_asof_last_signup

        shuf = _df(log_asof_last_signup(SF, mode="shuffle", num_partitions=5))
        one = _df(log_asof_last_signup(SF, mode="tree"))
        pd.testing.assert_frame_equal(shuf, one)
