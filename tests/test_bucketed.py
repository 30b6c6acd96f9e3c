"""Bucketed-table co-located joins: the persisted-layout scale path —
joining two tables bucketed on the join key must produce NO Exchange
(and no Sort) in the physical plan, and the join result must equal the
plain shuffle join's."""

import pandas as pd
from pyspark.sql import functions as F

from geospatial_object_matching_spark.sources.bucketed import (
    co_located_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange_and_matches_plain(spark, tmp_path):
    n = 5_000
    props = spark.range(n).select(
        F.col("id").alias("obj_id"),
        (F.col("id") % 97).cast("double").alias("area"),
    )
    pairs = spark.range(n * 2).select(
        (F.col("id") % n).alias("obj_id"),
        (F.col("id") % 13).alias("cand_rank"),
    )

    write_bucketed(props, "t_props_b", "obj_id", n_buckets=8,
                   path=str(tmp_path / "props"))
    write_bucketed(pairs, "t_pairs_b", "obj_id", n_buckets=8,
                   path=str(tmp_path / "pairs"))
    try:
        # keep the big sides out of broadcast range so the planner must
        # pick SortMergeJoin — the case bucketing optimizes
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = co_located_join(spark, "t_props_b", "t_pairs_b", "obj_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # THE property bucketing buys: no shuffle of either side. (A Sort
        # can remain — Spark only trusts sortBy ordering when each bucket
        # is a single file, which multi-task writers don't guarantee; the
        # Exchange is the scale-dominant cost either way.)
        assert "Exchange" not in plan, plan

        got = (
            joined.groupBy("obj_id")
            .agg(F.count("*").alias("n"), F.sum("area").alias("s"))
            .toPandas()
            .sort_values("obj_id")
            .reset_index(drop=True)
        )
        want = (
            pairs.join(props, "obj_id")
            .groupBy("obj_id")
            .agg(F.count("*").alias("n"), F.sum("area").alias("s"))
            .toPandas()
            .sort_values("obj_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_props_b")
        spark.sql("DROP TABLE IF EXISTS t_pairs_b")
