"""One instrumented flagship run at a given core count, with phase walls.

Usage: python tools/phase_probe.py CPUS [sf_dir] [n_entities]

Prints the [phase]/[knn-range] markers (SPARK_GRAFT_PHASE_LOG) plus
generation / pipeline / count walls, so an N-vs-4N pair of runs shows
which phase is the non-scaling term.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_PHASE_LOG", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_entities = int(sys.argv[3]) if len(sys.argv) > 3 else 600_000

    from bench import build_spark
    from geospatial_object_matching_spark.plans.pipeline import run_pipeline
    from geospatial_object_matching_spark.sources.pages import generate_pages_df

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    pages = generate_pages_df(spark, n_entities, seed=42).persist()
    n_pages = pages.count()
    print(f"[probe] generated {n_pages} pages @ {time.time() - t0:.1f}s", flush=True)

    t1 = time.time()
    res = run_pipeline(
        spark, pages, bkafi_dim=3, decision_percentile=0.95, with_features=True
    )
    print(f"[probe] run_pipeline returned @ {time.time() - t1:.1f}s", flush=True)

    from concurrent.futures import ThreadPoolExecutor

    t2 = time.time()
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_m = pool.submit(res["matches"].count)
        f_f = pool.submit(res["pair_features"].count)
        n_matches = f_m.result()
        n_feat = f_f.result()
    t3 = time.time()
    print(
        f"[probe] counts (matches={n_matches}, feats={n_feat}) "
        f"@ {t3 - t2:.1f}s; TOTAL timed {t3 - t1:.3f}s cpus={cpus}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
