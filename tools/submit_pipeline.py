"""spark-submit entrypoint for the flagship pipeline (north_rule: jobs
launched via ``spark-submit --py-files`` on multi-executor clusters).

Examples:
    spark-submit --master local[32] \
        --py-files gom.zip tools/submit_pipeline.py \
        --pages /data/pages --out /data/run1 --dim 3 --percentile 0.95

    # synthetic input (no pages path): generate N entities deterministically
    spark-submit tools/submit_pipeline.py --entities 60000 --out /tmp/run1

Stages checkpoint under --out/checkpoints (resume on rerun); outputs land
as parquet under --out; per-stage lineage metrics print as JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (parquet or iceberg)")
    ap.add_argument("--format", default="auto", choices=["auto", "parquet", "iceberg"])
    ap.add_argument("--entities", type=int, default=10_000,
                    help="synthetic entity count when --pages is not given")
    ap.add_argument("--out", required=True)
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--percentile", type=float, default=0.95)
    ap.add_argument("--zoom", type=int, default=15)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from geospatial_object_matching_spark.plans.pipeline import run_pipeline
    from geospatial_object_matching_spark.sources.checkpoint import CheckpointManager
    from geospatial_object_matching_spark.sources.pages import generate_pages_df
    from geospatial_object_matching_spark.sources.pages_io import read_pages

    # under spark-submit the session/master comes from the launcher
    spark = SparkSession.builder.appName("gom-pipeline").getOrCreate()

    if args.pages:
        pages = read_pages(spark, args.pages, fmt=args.format)
    else:
        pages = generate_pages_df(spark, args.entities, seed=42)

    cm = CheckpointManager(spark, os.path.join(args.out, "checkpoints"))
    res = run_pipeline(
        spark,
        pages,
        bkafi_dim=args.dim,
        k=args.k,
        decision_percentile=args.percentile,
        zoom=args.zoom,
        checkpoints=cm,
    )
    res["matches"].write.mode("overwrite").parquet(
        os.path.join(args.out, "matches")
    )
    res["pair_features"].write.mode("overwrite").parquet(
        os.path.join(args.out, "pair_features")
    )
    print(json.dumps({"stages": cm.metrics(), "counts": res["counts"]}, indent=1))


if __name__ == "__main__":
    main()
