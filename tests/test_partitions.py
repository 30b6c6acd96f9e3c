"""Dataset partition generator invariants (reference data_partition.py:
31-148 / data_partition_dirty.py — sizes, disjointness, composition,
determinism)."""

import pytest
from pyspark.sql import functions as F

from geospatial_object_matching_spark.plans.partitions import (
    create_dataset_partition,
    partition_summary,
)


def _ids(spark, prefix, n, parts=4):
    return spark.range(n, numPartitions=parts).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("obj_id")
    )


@pytest.fixture(scope="module")
def partition(spark):
    # 200 matched + 50 cands-only + 80 index-only
    matched = _ids(spark, "m", 200)
    cands = matched.unionByName(_ids(spark, "c", 50))
    index = matched.unionByName(_ids(spark, "i", 80))
    return create_dataset_partition(
        cands,
        index,
        seed=3,
        train_size_ratios={"small": 0.1, "large": 0.5},
        test_size_ratios={"small": 0.2, "large": 1.0},
        train_neg_samples=(2,),
        test_neg_samples=(2,),
    )


def test_train_pair_shape(partition):
    for size, expected_pos in (("small", 20), ("large", 100)):
        pairs = partition["train"][size][2].toPandas()
        pos = pairs[pairs.cand_id == pairs.index_id]
        neg = pairs[pairs.cand_id != pairs.index_id]
        assert len(pos) == expected_pos
        assert (neg.groupby("cand_id").size() == 2).all()


def test_matching_disjoint_from_train(partition):
    for size in ("small", "large"):
        train_cands = {
            r["cand_id"] for r in partition["train"][size][2].collect()
        }
        test_cands = {
            r["cand_id"]
            for r in partition["test"]["matching"][size][2].collect()
        }
        assert not (train_cands & test_cands)


def test_blocking_sets_composition(partition):
    for size in ("small", "large"):
        b = partition["test"]["blocking"][size]
        cands = {r["obj_id"] for r in b["cands"].collect()}
        index = {r["obj_id"] for r in b["index"].collect()}
        # all blocking cands are matched ids disjoint from train
        train_cands = {
            r["cand_id"] for r in partition["train"][size][2].collect()
        }
        assert not (cands & train_cands)
        assert all(c.startswith("m") for c in cands)
        if size == "large":  # index ratio 1.0 → exactly the removal gap:
            # index_test = index − removed(non_matched_rat of cands_test),
            # so missing ≈ 20% of test cands (data_partition.py:112-127).
            # At ratio < 1 the reference ALSO ratio-samples the index side,
            # so most small-ratio cands lack twins by design — structural
            # checks only there.
            missing = cands - index
            assert len(missing) == int(0.2 * len(cands))


def test_summary_deterministic(spark, partition):
    s1 = partition_summary(partition).toPandas().sort_values(
        ["split", "size", "key"]
    ).reset_index(drop=True)
    matched = _ids(spark, "m", 200, parts=9)
    cands = matched.unionByName(_ids(spark, "c", 50, parts=3))
    index = matched.unionByName(_ids(spark, "i", 80, parts=7))
    p2 = create_dataset_partition(
        cands,
        index,
        seed=3,
        train_size_ratios={"small": 0.1, "large": 0.5},
        test_size_ratios={"small": 0.2, "large": 1.0},
        train_neg_samples=(2,),
        test_neg_samples=(2,),
    )
    s2 = partition_summary(p2).toPandas().sort_values(
        ["split", "size", "key"]
    ).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(s1, s2)


def _gen_expected():
    import importlib
    import os
    import sys

    tools_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    sys.path.insert(0, tools_dir)
    try:
        return importlib.import_module("gen_expected")
    finally:
        sys.path.remove(tools_dir)


class TestIndependentPartitionOracle:
    """Round-4 promotion: geo_partitions is independent-tier — the pure-
    python spec sim (md5-rank sampling + scalar xxhash64 draws, no engine
    imports) must reproduce the distributed engine summary exactly, and a
    wrong-seed engine run must be caught."""

    def test_sim_matches_engine_summary(self, spark, partition):
        import pandas as pd

        gen = _gen_expected()
        eng = (
            partition_summary(partition)
            .toPandas()
            .sort_values(["split", "size", "key"])
            .reset_index(drop=True)
        )
        cands = [f"m{i}" for i in range(200)] + [f"c{i}" for i in range(50)]
        index = [f"m{i}" for i in range(200)] + [f"i{i}" for i in range(80)]
        sim = gen.partition_summary_sim(
            cands,
            index,
            seed=3,
            train_ratios={"small": 0.1, "large": 0.5},
            test_ratios={"small": 0.2, "large": 1.0},
            neg=(2,),
        )
        pd.testing.assert_frame_equal(eng, sim.astype(eng.dtypes.to_dict()))

    def test_sim_catches_composition_bug(self, spark, partition):
        """The summary surface is count-level, so the bug classes it can
        catch are compositional (wrong sample size, broken train/test
        disjointness, wrong non-matched removal) — simulate one: an engine
        regression of non_matched_rat 0.2 → 0.3 must flip counts."""
        gen = _gen_expected()
        eng = (
            partition_summary(partition)
            .toPandas()
            .sort_values(["split", "size", "key"])
            .reset_index(drop=True)
        )
        cands = [f"m{i}" for i in range(200)] + [f"c{i}" for i in range(50)]
        index = [f"m{i}" for i in range(200)] + [f"i{i}" for i in range(80)]
        sim = gen.partition_summary_sim(
            cands,
            index,
            seed=3,
            train_ratios={"small": 0.1, "large": 0.5},
            test_ratios={"small": 0.2, "large": 1.0},
            neg=(2,),
            non_matched_rat=0.3,
        )
        assert not eng[["n_rows", "n_pos"]].equals(
            sim[["n_rows", "n_pos"]].astype(
                eng[["n_rows", "n_pos"]].dtypes.to_dict()
            )
        )
