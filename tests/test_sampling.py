"""Sampling operators: determinism, partition invariance, and the
no-global-sort plan property (SURVEY.md §2.7 R1/R2; round-2 fix for the
single-task ``Window.orderBy`` scale-killer)."""

import pytest
from pyspark.sql import functions as F

from geospatial_object_matching_spark.operators.sampling import (
    negative_sample_pairs,
    sample_ids_fraction,
    with_global_positions,
)


def _ids(spark, n, parts):
    return spark.range(0, n, numPartitions=parts).select(
        F.concat(F.lit("id"), F.col("id").cast("string")).alias("obj_id")
    )


def test_global_positions_match_sort_order(spark):
    df = _ids(spark, 500, 7).withColumn(
        "_h", F.md5(F.col("obj_id"))
    )
    got = (
        with_global_positions(df, ["_h"], partitions=5)
        .select("_h", "_pos")
        .toPandas()
        .sort_values("_pos")
    )
    assert list(got["_pos"]) == list(range(500))
    assert list(got["_h"]) == sorted(got["_h"])


def test_sample_fraction_deterministic_and_partition_invariant(spark):
    a = sample_ids_fraction(_ids(spark, 1000, 3), "obj_id", 0.2, seed=7)
    b = sample_ids_fraction(_ids(spark, 1000, 13), "obj_id", 0.2, seed=7)
    sa = {r["obj_id"] for r in a.collect()}
    sb = {r["obj_id"] for r in b.collect()}
    assert sa == sb
    assert len(sa) == 200


def test_sample_fraction_is_hash_prefix(spark):
    """The sample must be exactly the ``take`` smallest md5(seed|id) values."""
    df = _ids(spark, 300, 4)
    got = {r["obj_id"] for r in sample_ids_fraction(df, "obj_id", 0.1, 5).collect()}
    ranked = (
        df.withColumn("_h", F.md5(F.concat(F.lit("5|"), F.col("obj_id"))))
        .toPandas()
        .sort_values("_h")
    )
    assert got == set(ranked["obj_id"].iloc[:30])


def test_negative_sampling_partition_invariant(spark):
    cands = _ids(spark, 60, 2)
    for parts in (3, 11):
        idx = _ids(spark, 200, parts)
        out = negative_sample_pairs(cands, idx, n_neg=3, seed=9).toPandas()
        pos = out[out.cand_id == out.index_id]
        neg = out[out.cand_id != out.index_id]
        assert len(pos) == 60
        assert (neg.groupby("cand_id").size() == 3).all()
        if parts == 3:
            first = set(map(tuple, out.itertuples(index=False)))
        else:
            assert set(map(tuple, out.itertuples(index=False))) == first


@pytest.mark.parametrize("fn_name", ["sample", "negative"])
def test_no_single_partition_exchange(spark, fn_name):
    """Neither sampler may plan a SinglePartition Exchange (the global-sort
    window shape this round removed)."""
    if fn_name == "sample":
        df = sample_ids_fraction(_ids(spark, 1000, 4), "obj_id", 0.2, seed=7)
    else:
        df = negative_sample_pairs(
            _ids(spark, 50, 2), _ids(spark, 200, 4), n_neg=2, seed=3
        )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan[:4000]
