"""Dissect phase A at one core count: properties materialize vs each
aggregation job, with JVM GC time per step.

Usage: python tools/phase_a_probe.py CPUS [n_entities] [driver_mem]
"""

from __future__ import annotations

import os
import sys
import time

if len(sys.argv) > 3:
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = sys.argv[3]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1])
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000

    from pyspark.sql import functions as F

    from bench import build_spark
    from geospatial_object_matching_spark.config import OBJECT_PROPERTIES
    from geospatial_object_matching_spark.operators.blocking import (
        bkafi_feature_order,
    )
    from geospatial_object_matching_spark.operators.properties import (
        pages_to_properties,
    )
    from geospatial_object_matching_spark.operators.scaler import robust_scaler_fit
    from geospatial_object_matching_spark.sources.pages import generate_pages_df

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()

    def gc_ms() -> int:
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

    def step(name, fn):
        g0, t0 = gc_ms(), time.time()
        out = fn()
        print(
            f"[step] {name}: {time.time() - t0:.1f}s (gc {gc_ms() - g0} ms)",
            flush=True,
        )
        return out

    pages = generate_pages_df(spark, n_entities, seed=42).persist()
    step("generate+persist pages", pages.count)

    properties = pages_to_properties(pages, zoom=15, log1p=True).persist()
    step("properties materialize", properties.count)
    step("bkafi_feature_order", lambda: bkafi_feature_order(properties, "std"))
    step(
        "robust_scaler_fit(25 cols)",
        lambda: robust_scaler_fit(
            properties.filter(F.col("source") == "cands"), list(OBJECT_PROPERTIES)
        ),
    )

    def job_counts():
        return (
            properties.groupBy("obj_id")
            .agg(
                F.max((F.col("source") == "cands").cast("int")).alias("c"),
                F.max((F.col("source") == "index").cast("int")).alias("i"),
            )
            .agg(F.sum("c").alias("n_c"), F.sum("i").alias("n_i"))
            .first()
        )

    step("job_counts", job_counts)
    # repeat the two big ones warm (codegen JIT already paid)
    spark.catalog.clearCache()
    pages2 = generate_pages_df(spark, n_entities, seed=42).persist()
    step("pages re-persist", pages2.count)
    properties2 = pages_to_properties(pages2, zoom=15, log1p=True).persist()
    step("properties materialize (warm)", properties2.count)
    step(
        "robust_scaler_fit warm",
        lambda: robust_scaler_fit(
            properties2.filter(F.col("source") == "cands"), list(OBJECT_PROPERTIES)
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
