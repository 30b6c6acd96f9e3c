"""Snapshot checkpoint manager: idempotent resume + lineage metrics."""

import pytest
from pyspark.sql import functions as F

from geospatial_object_matching_spark.sources.checkpoint import CheckpointManager


class TestCheckpoint:
    def test_stage_runs_once_and_resumes(self, spark, tmp_path):
        cm = CheckpointManager(spark, str(tmp_path), run_id="r1")
        calls = {"n": 0}

        def compute():
            calls["n"] += 1
            return spark.range(100).select(
                F.col("id"), (F.col("id") * 2).alias("v")
            )

        a = cm.run_stage("double", compute)
        assert a.count() == 100
        assert calls["n"] == 1

        b = cm.run_stage("double", compute)
        assert b.count() == 100
        assert calls["n"] == 1  # resumed from snapshot, not recomputed

        # a NEW manager over the same dir (fresh process restart) resumes too
        cm2 = CheckpointManager(spark, str(tmp_path), run_id="r1")
        c = cm2.run_stage("double", compute)
        assert c.count() == 100
        assert calls["n"] == 1

    def test_params_key_new_snapshot(self, spark, tmp_path):
        cm = CheckpointManager(spark, str(tmp_path), run_id="r2")
        calls = {"n": 0}

        def compute():
            calls["n"] += 1
            return spark.range(10)

        cm.run_stage("s", compute, params={"k": 1})
        cm.run_stage("s", compute, params={"k": 2})
        cm.run_stage("s", compute, params={"k": 1})
        assert calls["n"] == 2

    def test_metrics_lineage(self, spark, tmp_path):
        cm = CheckpointManager(spark, str(tmp_path), run_id="r3")
        cm.run_stage("a", lambda: spark.range(50))
        cm.run_stage("b", lambda: spark.range(70))
        m = cm.metrics()
        assert [e["stage"] for e in m] == ["a", "b"]
        assert m[0]["row_count"] == 50 and m[1]["row_count"] == 70
        assert m[1]["parent_snapshot_id"] == m[0]["snapshot_id"]
        assert all(e["total_bytes"] > 0 and e["num_files"] >= 1 for e in m)

    def test_mid_pipeline_kill_resume(self, spark, tmp_path):
        """Simulate a crash between stages: stage1 committed, stage2 not —
        a fresh manager re-runs only stage2."""
        cm = CheckpointManager(spark, str(tmp_path), run_id="r4")
        calls = {"s1": 0, "s2": 0}

        def s1():
            calls["s1"] += 1
            return spark.range(20)

        def s2():
            calls["s2"] += 1
            return spark.range(30)

        cm.run_stage("s1", s1)
        # "crash" — restart with a new manager
        cm_re = CheckpointManager(spark, str(tmp_path), run_id="r4")
        cm_re.run_stage("s1", s1)
        cm_re.run_stage("s2", s2)
        assert calls == {"s1": 1, "s2": 1}
