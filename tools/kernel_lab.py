"""Offline lab for the round-1 kNN kernel: collect the real sf1-class
BKAFI vectors once, dump them to /tmp, and profile searcher variants
without Spark in the loop.

Usage:
  python tools/kernel_lab.py dump [n_entities]   # build + save vectors
  python tools/kernel_lab.py profile             # window stats + timings
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

NPZ = "/tmp/knn_lab_vectors.npz"


def dump(n_entities: int) -> None:
    from pyspark.sql import functions as F

    from bench import build_spark
    from geospatial_object_matching_spark.config import OBJECT_PROPERTIES
    from geospatial_object_matching_spark.operators.blocking import (
        bkafi_feature_order,
        bkafi_vectors,
    )
    from geospatial_object_matching_spark.operators.properties import (
        pages_to_properties,
    )
    from geospatial_object_matching_spark.operators.scaler import robust_scaler_fit
    from geospatial_object_matching_spark.sources.pages import generate_pages_df

    spark = build_spark(16)
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
    c = cands_v.select("obj_id", "features").collect()
    i = index_v.select("obj_id", "features").collect()
    np.savez(
        NPZ,
        c_ids=np.array([r[0] for r in c], dtype=object),
        c_mat=np.array([r[1] for r in c], dtype=np.float64),
        i_ids=np.array([r[0] for r in i], dtype=object),
        i_mat=np.array([r[1] for r in i], dtype=np.float64),
    )
    print(f"dumped {len(c)} cands, {len(i)} index rows -> {NPZ}")
    spark.stop()


def profile() -> None:
    from geospatial_object_matching_spark.operators.knn import _make_local_searcher

    z = np.load(NPZ, allow_pickle=True)
    i_ids, i_mat = z["i_ids"], z["i_mat"]
    c_mat = z["c_mat"]
    k = 21

    # simulate one 16-core slice: take the middle 1/32 of the index by x0
    order = np.argsort(i_mat[:, 0], kind="stable")
    n = len(order)
    sl = order[n // 2 - n // 64 : n // 2 + n // 64]
    slice_ids, slice_mat = i_ids[sl], i_mat[sl]
    lo_v, hi_v = slice_mat[:, 0].min(), slice_mat[:, 0].max()
    qm = c_mat[(c_mat[:, 0] >= lo_v) & (c_mat[:, 0] <= hi_v)]
    rng = np.random.default_rng(0)
    qs = qm[rng.choice(len(qm), size=min(3000, len(qm)), replace=False)]
    print(f"slice rows={len(slice_mat)}, queries={len(qs)}")

    search = _make_local_searcher(slice_ids, slice_mat, k)
    # instrument window sizes by monkeypatching searchsorted? simpler:
    # re-run the window logic here for stats
    x0s = np.sort(slice_mat[:, 0])
    t0 = time.time()
    kths = np.empty(len(qs))
    for bi in range(len(qs)):
        _ids, d = search(qs[bi])
        kths[bi] = d[-1]
    wall = time.time() - t0
    print(f"current searcher: {wall:.2f}s total, {wall / len(qs) * 1e3:.3f} ms/query")

    # window rows needed per query = rows with |x0 - q0| <= kth
    lo = np.searchsorted(x0s, qs[:, 0] - kths)
    hi = np.searchsorted(x0s, qs[:, 0] + kths)
    w = hi - lo
    print(
        "final-window rows: p50=%d p90=%d p99=%d max=%d (slice=%d)"
        % (np.percentile(w, 50), np.percentile(w, 90), np.percentile(w, 99), w.max(), len(slice_mat))
    )
    print("kth dist: p50=%.4f p90=%.4f p99=%.4f" % tuple(np.percentile(kths, [50, 90, 99])))


if __name__ == "__main__":
    if sys.argv[1] == "dump":
        dump(int(sys.argv[2]) if len(sys.argv) > 2 else 600_000)
    else:
        profile()
