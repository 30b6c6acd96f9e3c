"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Primary metric (BASELINE.json): spatial-join + match-decision throughput
(pages/sec) through the flagship pipeline pages → extract → 25 properties
→ BKAFI kNN blocking → threshold match decisions. Secondary: the heavy
relational/training-data operators at the same SF.

Scaling evidence (north_rule N vs 4N): ``SPARK_GRAFT_SCALING=1`` reruns
the pipeline at local[cpus/4] and reports scaling efficiency
(t_small/t_big / 4). tools/scaling_bench.py writes the full table to
BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def wait_quiet(threshold: float, max_wait: float, poll: float = 15.0) -> float:
    """Block until the 1-min loadavg drops below ``threshold`` (or
    ``max_wait`` elapses) and return the final reading. Co-tenant load on
    this host arrives in 20-40 min storms that swing wall times ±30%
    (BENCH.md round 4 recorded loadavg 1.7→16 during one run), which was
    starting to mask real round-over-round deltas — the recorded bench now
    waits for a quiet window and stamps the loadavg it actually ran at."""
    t0 = time.time()
    la = loadavg1()
    while la >= threshold and time.time() - t0 < max_wait:
        time.sleep(poll)
        la = loadavg1()
    return la


def build_spark(cpus: int):
    from geospatial_object_matching_spark.config import EngineConf
    from geospatial_object_matching_spark.session import get_spark

    conf = EngineConf(shuffle_partitions=max(cpus * 2, 8))
    return get_spark("gom-bench", master=f"local[{cpus}]", conf=conf)


def run_geo_pipeline(spark, sf_dir: str, n_entities: int) -> dict:
    """Flagship throughput workload; returns timing + row counts."""
    from pyspark.sql import functions as F

    from geospatial_object_matching_spark.plans.pipeline import run_pipeline
    from geospatial_object_matching_spark.sources.pages import generate_pages_df

    pages = generate_pages_df(spark, n_entities, seed=42).persist()
    n_pages = pages.count()  # materialize input outside the timed window

    t0 = time.time()
    res = run_pipeline(
        spark, pages, bkafi_dim=3, decision_percentile=0.95, with_features=True
    )
    # the two result materializations are independent — overlap them from
    # driver threads (same policy run_pipeline applies internally); on a
    # saturated small-core run this is neutral, on the big-core run it
    # fills cores a sequential count would leave idle
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_m = pool.submit(res["matches"].count)
        f_f = pool.submit(res["pair_features"].count)
        n_matches = f_m.result()
        n_feat = f_f.result()
    wall = time.time() - t0
    pages.unpersist()
    return {
        "sec": round(wall, 3),
        "n_pages": n_pages,
        "n_matches": n_matches,
        "n_pair_features": n_feat,
        "pages_per_sec": round(n_pages / wall, 1),
    }


def timed_count(mk_df) -> tuple[float, int]:
    """Time plan CONSTRUCTION + count: queries with eager driver stages
    (geo_image_blocking's render collect / broadcast / intersection
    count) do real work before the returned frame exists."""
    t0 = time.time()
    n = mk_df().count()
    return time.time() - t0, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from geospatial_object_matching_spark.plans import entry_queries as EQ

    li_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    n_entities = max(2000, li_rows // 10)

    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "2"))
    queries: dict[str, float] = {}

    # quiet-window gate (round 5): wait (bounded) for 1-min loadavg < 4
    # before the flagship timing; record what we actually got either way
    quiet_thresh = float(os.environ.get("SPARK_GRAFT_QUIET_LOAD", "4"))
    quiet_wait = float(os.environ.get("SPARK_GRAFT_QUIET_MAXWAIT", "600"))
    la_start = wait_quiet(quiet_thresh, quiet_wait)
    la_trials: list[float] = []

    # min-of-N trials (flagship: min-of-3): this host's steal-time
    # variance is 2-10x run to run (memory note
    # "sandbox-performance-traps"); clearCache between trials so Spark's
    # plan-equality CacheManager can't serve cached stages.
    geo_trials = max(trials, 3)
    geo = None
    for i in range(geo_trials):
        if i:
            spark.catalog.clearCache()
        la_trials.append(loadavg1())
        g2 = run_geo_pipeline(spark, sf_dir, n_entities)
        if geo is None or g2["sec"] < geo["sec"]:
            geo = g2
    queries["geo_pipeline"] = geo["sec"]

    for name in (
        "group_agg",
        "topk_window",
        "knn_window",
        "ratio_feature",
        "percentile_agg",
        "dedup_exact",
        "minhash_dedup",
        # ANN headline is the bucketed IVF path (data-adaptive cells, one
        # cid equi-join); the exact crossJoin cosine_topk stays an
        # oracle/test-only reference — never a bench-headline plan.
        "ivf_topk",
        # media-path headline: render (S7) + encode (S8) every object
        # scan-side, then the broadcast-GEMM IndexFlatIP top-k + PC@k —
        # the reference's image-blocking baseline spends 176.75 s (ViT-
        # B/32, Hague) on the same shape (BASELINE.md / TR Table 3)
        "geo_image_blocking",
        "text_scores",
        "tumbling_window",
    ):
        t, _ = timed_count(lambda: EQ.QUERIES[name](spark, sf_dir))
        for _ in range(trials - 1):
            spark.catalog.clearCache()
            t2, _ = timed_count(lambda: EQ.QUERIES[name](spark, sf_dir))
            t = min(t, t2)
        queries[name] = round(t, 3)

    result = {
        "metric": "spatial-join + match-decision throughput",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "geo": geo,
        "loadavg": {
            "gate": quiet_thresh,
            "at_start": round(la_start, 2),
            "per_flagship_trial": [round(v, 2) for v in la_trials],
            "at_end": round(loadavg1(), 2),
        },
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        spark.stop()
        small_cpus = max(1, cpus // 4)
        spark_small = build_spark(small_cpus)
        spark_small.sparkContext.setLogLevel("ERROR")
        geo_small = run_geo_pipeline(spark_small, sf_dir, n_entities)
        spark_small.stop()
        eff = (geo_small["sec"] / geo["sec"]) / (cpus / small_cpus)
        result["scaling"] = {
            "cpus_big": cpus,
            "cpus_small": small_cpus,
            "sec_big": geo["sec"],
            "sec_small": geo_small["sec"],
            "efficiency": round(eff, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
