"""Time knn_join_range alone on the real sf1-class BKAFI input, with
per-task round-1 kernel timings (SPARK_GRAFT_PHASE_LOG).

Usage: python tools/knn_probe.py CPUS [n_entities] [halo_slices]
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
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    halo = int(sys.argv[3]) if len(sys.argv) > 3 else -1

    from pyspark.sql import functions as F

    from bench import build_spark
    from geospatial_object_matching_spark.config import NN_PARAM, OBJECT_PROPERTIES
    from geospatial_object_matching_spark.operators.blocking import (
        bkafi_feature_order,
        bkafi_vectors,
    )
    from geospatial_object_matching_spark.operators.knn import knn_join_range
    from geospatial_object_matching_spark.operators.properties import (
        pages_to_properties,
    )
    from geospatial_object_matching_spark.operators.scaler import robust_scaler_fit
    from geospatial_object_matching_spark.sources.pages import generate_pages_df

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    pages = generate_pages_df(spark, n_entities, seed=42).persist()
    pages.count()
    props = pages_to_properties(pages, zoom=15, log1p=True).persist()
    props.count()
    order = bkafi_feature_order(props, "std")
    feats = order[:3]
    stats = robust_scaler_fit(
        props.filter(F.col("source") == "cands"), list(OBJECT_PROPERTIES)
    )
    stats = {f: stats[f] for f in feats}
    cands_v, index_v = bkafi_vectors(props, feats, stats=stats)
    cands_v, index_v = cands_v.persist(), index_v.persist()
    print(f"[probe] cands={cands_v.count()} index={index_v.count()}", flush=True)

    kwargs = {} if halo < 0 else {"halo_slices": halo}
    t0 = time.time()
    out = knn_join_range(cands_v, index_v, NN_PARAM, **kwargs)
    n = out.count()
    print(
        f"[probe] knn_range rows={n} wall={time.time() - t0:.1f}s "
        f"cpus={cpus} halo={halo}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
