"""Round-6 isolation benchmarks (guide §1.4: noop sink / stage splits).

NOT part of the frozen driver bench (`bench.py` is unchanged); this file
reproduces the per-operator measurements cited in OPTIMIZATION_r06.md:

    python bench_extra.py minhash   [sf_dir]   # stage split of the LSH path
    python bench_extra.py ivf       [sf_dir]   # IVF assign/full splits
    python bench_extra.py knn       [sf_dir]   # flagship-shape kNN isolation
    python bench_extra.py flagship  [sf_dir]   # phase-A component walls
    python bench_extra.py kernels              # in-process per-object kernels

Default sf_dir is /root/testdata/sf1.0 (the scale the driver measures
at). All timings are wall seconds on the current session's local[32].
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _spark(cpus: int = 32):
    from geospatial_object_matching_spark.config import EngineConf
    from geospatial_object_matching_spark.session import get_spark

    s = get_spark(
        "gom-bench-extra",
        master=f"local[{cpus}]",
        conf=EngineConf(shuffle_partitions=2 * cpus),
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def bench_minhash(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from geospatial_object_matching_spark.operators import dedup as DD

    spark = _spark()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = d.count()
    spark.sparkContext.setJobDescription("minhash: signatures only")
    sigs = DD.minhash_signatures(d, n_hashes=64, shingle_k=5)
    print(f"signatures noop: {_noop(sigs):.1f}s ({n} docs)")
    spark.sparkContext.setJobDescription("minhash: full")
    t0 = time.time()
    rows = DD.minhash_lsh_pairs(sigs, bands=16, n_hashes=64, n_ids=n).count()
    print(f"full pairs: {time.time() - t0:.1f}s rows={rows}")
    spark.stop()


def bench_ivf(sf_dir: str) -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from geospatial_object_matching_spark.operators import similarity as SIM

    spark = _spark()
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    t0 = time.time()
    sample = e.select("vec_id", "embedding").orderBy("vec_id").limit(10000).collect()
    C = SIM.ivf_kmeans_centroids(np.array([r[1] for r in sample]), 16)
    print(f"sample+kmeans: {time.time() - t0:.2f}s")
    spark.sparkContext.setJobDescription("ivf: assign only")
    base = SIM.ivf_assign(
        e.select(F.col("vec_id"), F.col("embedding").cast("array<double>").alias("bv")),
        C,
        vec_col="bv",
    )
    print(f"assign noop: {_noop(base):.2f}s")
    for trial in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        n = SIM.ivf_cosine_topk(e, q, k=5, n_centroids=16, n_probe=4).count()
        print(f"full trial{trial}: {time.time() - t0:.2f}s rows={n}")
    spark.stop()


def bench_knn(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from geospatial_object_matching_spark.config import NN_PARAM, OBJECT_PROPERTIES
    from geospatial_object_matching_spark.operators.blocking import (
        bkafi_feature_order,
        bkafi_vectors,
    )
    from geospatial_object_matching_spark.operators.knn import knn_join
    from geospatial_object_matching_spark.operators.properties import (
        pages_to_properties,
    )
    from geospatial_object_matching_spark.operators.scaler import robust_scaler_fit
    from geospatial_object_matching_spark.sources.pages import generate_pages_df

    spark = _spark()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    pages = generate_pages_df(spark, max(2000, li // 10), seed=42)
    props = pages_to_properties(pages, zoom=15, log1p=True).persist()
    print("props:", props.count())
    order = bkafi_feature_order(props, "std")
    stats = robust_scaler_fit(
        props.filter(F.col("source") == "cands"), order[:3]
    )
    cands_v, index_v = bkafi_vectors(props, order[:3], stats=stats)
    cands_v, index_v = cands_v.persist(), index_v.persist()
    print("cands:", cands_v.count(), "index:", index_v.count())
    for trial in range(2):
        t0 = time.time()
        n = knn_join(cands_v, index_v, NN_PARAM, strategy="auto").count()
        print(f"knn trial{trial}: {time.time() - t0:.1f}s rows={n}")
    spark.stop()


def bench_flagship(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from geospatial_object_matching_spark.config import OBJECT_PROPERTIES
    from geospatial_object_matching_spark.operators.blocking import (
        bkafi_feature_order,
    )
    from geospatial_object_matching_spark.operators.matching import (
        matched_pair_vectors,
        percentile_thresholds,
    )
    from geospatial_object_matching_spark.operators.properties import (
        pages_to_properties,
    )
    from geospatial_object_matching_spark.operators.scaler import robust_scaler_fit
    from geospatial_object_matching_spark.sources.pages import generate_pages_df

    spark = _spark()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    pages = generate_pages_df(spark, max(2000, li // 10), seed=42).persist()
    pages.count()
    t0 = time.time()
    props = pages_to_properties(pages, zoom=15, log1p=True).persist()
    props.count()
    t1 = time.time()
    print(f"featurize+persist+count: {t1 - t0:.1f}s")
    order = bkafi_feature_order(props, "std")
    t2 = time.time()
    print(f"bkafi order: {t2 - t1:.1f}s")
    stats = robust_scaler_fit(
        props.filter(F.col("source") == "cands"), order[:3]
    )
    t3 = time.time()
    print(f"scaler fit (bkafi_dim cols): {t3 - t2:.1f}s")
    stats25 = robust_scaler_fit(
        props.filter(F.col("source") == "cands"), list(OBJECT_PROPERTIES)
    )
    t4 = time.time()
    print(f"scaler fit (all 25 cols, the old phase-A shape): {t4 - t3:.1f}s")
    dists, _ = matched_pair_vectors(props, order[:3])
    thr = percentile_thresholds(dists, (0.5, 0.75, 0.9, 0.95, 0.99))
    t5 = time.time()
    print(f"matched thresholds leg: {t5 - t4:.1f}s")
    spark.stop()


def bench_kernels() -> None:
    import numpy as np

    from geospatial_object_matching_spark.functions import geometry as G
    from geospatial_object_matching_spark.operators.extract import parse_pages_batch
    from geospatial_object_matching_spark.operators.render import render_mesh
    from geospatial_object_matching_spark.sources.pages import generate_pages_pdf

    pdf = generate_pages_pdf(700, seed=42)
    rows = list(parse_pages_batch(pdf))
    coords = [r[5] for r in rows]
    offs = [r[6] for r in rows]
    n = len(rows)

    def best_of(f, reps=3):
        b = 1e9
        for _ in range(reps):
            t0 = time.time()
            f()
            b = min(b, time.time() - t0)
        return b

    full = best_of(lambda: G.compute_properties_batch(coords, offs, log1p=True))
    print(f"25-property kernel: {full / n * 1e3:.3f} ms/obj")
    orig = G.convex_hull_3d_volume
    G.convex_hull_3d_volume = lambda *a, **k: 0.0
    no3 = best_of(lambda: G.compute_properties_batch(coords, offs, log1p=True))
    G.convex_hull_3d_volume = orig
    print(f"  of which exact 3-D hull: {(full - no3) / n * 1e3:.3f} ms/obj")
    rend = best_of(lambda: [render_mesh(c, o) for c, o in zip(coords, offs)])
    print(f"render_mesh: {rend / n * 1e3:.3f} ms/obj")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "kernels"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
    {
        "minhash": lambda: bench_minhash(sf),
        "ivf": lambda: bench_ivf(sf),
        "knn": lambda: bench_knn(sf),
        "flagship": lambda: bench_flagship(sf),
        "kernels": bench_kernels,
    }[what]()
