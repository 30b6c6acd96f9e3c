"""kNN strategies at the scale where broadcast is no longer dispatchable.

Beyond ``conf.broadcast_index_max_rows`` the 100-TB story rests on a
distributed exact strategy. This bench measures the candidates exactly
there (round-4 outcome: ``knn_join_range`` won by 15× over the equi-depth
ring loop and 5× over broadcast itself at the 2M crossover — BENCH.md):

- Base vectors are the REAL flagship kNN input: sf0.1 fixture pages →
  extract → 25 properties → BKAFI(3) → RobustScaler — ~48k index rows.
- Scale-up is density-honest: copies are TRANSLATED along dim 0 by the
  full base width (a 100-TB corpus covers more geography; it does not
  make one city 33× denser) plus a tiny deterministic jitter so no two
  rows coincide. Local cluster structure — what kNN pruning actually
  depends on — is preserved by construction.
- Measured: the chosen --strategy at the 2M crossover vs the broadcast
  kernel on identical input, and at 2× that scale (sub-linear-degradation
  target). Result-set equality between the two strategies is asserted on
  a 2k-query subsample.

Usage: python tools/equidepth_bench.py [--strategy range|equidepth]
                                       [--scales N,M] [--quick]
Writes one JSON line per measurement; full table goes to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_DIR = "/tmp/eqd_base"


def build_base_vectors(spark, sf_dir: str, n_entities: int):
    """Flagship BKAFI(3) scaled vectors from the pages fixture, persisted
    to parquet so repeated bench runs skip the property stage."""
    from pyspark.sql import functions as F

    from geospatial_object_matching_spark.operators.blocking import (
        bkafi_feature_order,
        bkafi_vectors,
    )
    from geospatial_object_matching_spark.operators.extract import extract_objects
    from geospatial_object_matching_spark.operators.properties import (
        compute_properties,
    )
    from geospatial_object_matching_spark.sources.pages import generate_pages_df

    if os.path.exists(f"{BASE_DIR}/index/_SUCCESS"):
        return
    pages = generate_pages_df(spark, n_entities, seed=42)
    objects = extract_objects(pages, zoom=15)
    props = compute_properties(objects)
    order = bkafi_feature_order(props)
    cands, index = bkafi_vectors(props, order[:3])
    cands.write.mode("overwrite").parquet(f"{BASE_DIR}/cands")
    index.write.mode("overwrite").parquet(f"{BASE_DIR}/index")


def scale_up(spark, side: str, copies: int, seed: int):
    """Tile ``copies`` translated-and-jittered copies along dim 0."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{BASE_DIR}/{side}")
    row = base.agg(
        F.min(F.element_at("features", 1)).alias("lo"),
        F.max(F.element_at("features", 1)).alias("hi"),
    ).first()
    width = (row["hi"] - row["lo"]) * 1.05
    delta = width * 1e-3
    df = base.withColumn(
        "_c", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
    )
    # deterministic per-(id, copy, dim) jitter in [-delta, delta]
    def jit(d):
        h = F.xxhash64(F.lit(seed), F.col("obj_id"), F.col("_c"), F.lit(d))
        return (F.pmod(h, F.lit(2_000_001)) / F.lit(1_000_000.0) - 1.0) * delta

    feats = F.array(
        F.element_at("features", 1) + F.col("_c") * F.lit(width) + jit(0),
        F.element_at("features", 2) + jit(1),
        F.element_at("features", 3) + jit(2),
    )
    return df.select(
        F.concat_ws("#", "obj_id", F.col("_c").cast("string")).alias("obj_id"),
        feats.alias("features"),
    )


def materialize(df, path):
    df.write.mode("overwrite").parquet(path)
    return None


def timed_knn(spark, cands_path, index_path, k, strategy, conf, **kw):
    from pyspark.sql import functions as F

    from geospatial_object_matching_spark.operators.knn import (
        knn_join,
        knn_join_equidepth,
    )

    spark.catalog.clearCache()
    cands = spark.read.parquet(cands_path)
    index = spark.read.parquet(index_path)
    t0 = time.time()
    if strategy == "equidepth":
        res = knn_join_equidepth(cands, index, k, conf=conf, **kw)
    elif strategy == "range":
        from geospatial_object_matching_spark.operators.knn import knn_join_range

        res = knn_join_range(cands, index, k, **kw)
    else:
        res = knn_join(cands, index, k, strategy=strategy, conf=conf)
    n = res.count()
    return time.time() - t0, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="0.5M/1M instead of 2M/4M")
    ap.add_argument("--entities", type=int, default=60000)
    ap.add_argument("--queries", type=int, default=50000)
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--rows-per-bin", type=int, default=None)
    ap.add_argument("--init-radius", type=int, default=None)
    ap.add_argument(
        "--scales", type=str, default=None,
        help="comma-separated index sizes, overrides quick/full pair",
    )
    ap.add_argument("--strategy", type=str, default="equidepth")
    ap.add_argument("--no-broadcast", action="store_true")
    ap.add_argument("--no-equality", action="store_true")
    args = ap.parse_args()
    eq_kw = {}
    if args.rows_per_bin is not None:
        eq_kw["rows_per_bin"] = args.rows_per_bin
    if args.init_radius is not None:
        eq_kw["init_radius"] = args.init_radius

    from pyspark.sql import functions as F

    from geospatial_object_matching_spark.config import EngineConf
    from geospatial_object_matching_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf = EngineConf(shuffle_partitions=cpus * 2)
    spark = get_spark("eqd-bench", master=f"local[{cpus}]", conf=conf)
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    build_base_vectors(spark, sf_dir, args.entities)
    n_base = spark.read.parquet(f"{BASE_DIR}/index").count()

    if args.scales:
        scales = [int(s) for s in args.scales.split(",")]
    elif args.quick:
        scales = [500_000, 1_000_000]
    else:
        scales = [2_000_000, 4_000_000]
    scale_a, scale_b = scales[0], scales[-1]
    out = {
        "n_base": n_base,
        "queries": args.queries,
        "k": args.k,
        "cpus": cpus,
        "eq_kw": eq_kw,
    }

    # fixed query set: one jittered copy of cands, subsampled, placed in
    # the middle copy of the scaled index so edge bins are not special
    for n_target in scales:
        copies = max(1, round(n_target / n_base))
        idx_path = f"/tmp/eqd_idx_{n_target}"
        if not os.path.exists(f"{idx_path}/_SUCCESS"):
            materialize(scale_up(spark, "index", copies, seed=7), idx_path)
        q_path = f"/tmp/eqd_q_{n_target}"
        if not os.path.exists(f"{q_path}/_SUCCESS"):
            q = (
                scale_up(spark, "cands", copies, seed=11)
                .withColumn(
                    "_r", F.pmod(F.xxhash64(F.lit(3), "obj_id"), F.lit(1 << 20))
                )
                .orderBy("_r")
                .limit(args.queries)
                .drop("_r")
            )
            materialize(q, q_path)
        n_idx = spark.read.parquet(idx_path).count()

        t_eq, n_eq = timed_knn(
            spark, q_path, idx_path, args.k, args.strategy, conf, **eq_kw
        )
        out[f"{args.strategy}_{n_target}"] = {
            "n_index": n_idx,
            "sec": round(t_eq, 1),
            "rows": n_eq,
        }
        print(json.dumps(out), flush=True)
        if n_target == scale_a and not args.no_broadcast:
            t_b, n_b = timed_knn(spark, q_path, idx_path, args.k, "broadcast", conf)
            out[f"broadcast_{n_target}"] = {"sec": round(t_b, 1), "rows": n_b}
            out["ratio_at_crossover"] = round(t_eq / t_b, 2)
            print(json.dumps(out), flush=True)

    # correctness: strategy equality on a 2k-query subsample at scale_a
    if not args.no_equality:
        from geospatial_object_matching_spark.operators.knn import (
            knn_join_broadcast,
            knn_join_equidepth,
        )

        sub = spark.read.parquet(f"/tmp/eqd_q_{scale_a}").limit(2000)
        idx = spark.read.parquet(f"/tmp/eqd_idx_{scale_a}")
        if args.strategy == "range":
            from geospatial_object_matching_spark.operators.knn import (
                knn_join_range,
            )

            a = knn_join_range(sub, idx, args.k, **eq_kw).toPandas()
        else:
            a = knn_join_equidepth(sub, idx, args.k, conf=conf, **eq_kw).toPandas()
        b = knn_join_broadcast(sub, idx, args.k).toPandas()
        key = lambda p: set(
            map(tuple, p[["cand_id", "index_id", "rank", "dist"]].values)
        )
        out["strategies_equal_2k"] = key(a) == key(b)
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
