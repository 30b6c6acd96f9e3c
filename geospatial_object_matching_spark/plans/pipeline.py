"""The flagship end-to-end plan: pages → match decisions.

Mirrors the reference's §3.1/§3.3 lifecycles as one DataFrame dataflow,
optionally snapshot-checkpointed per stage (resume = skip completed
stages):

    pages ──extract──▶ objects ──properties──▶ properties(p1..p25)
        │                                          │
        │                      ┌── ratio stats ────┤ (feature order)
        │                      ▼                   ▼
        │                 BKAFI vectors ──kNN──▶ candidates (rank≤k)
        │                      │                   │
        │        matched dists + percentile thr    │
        │                      └──────────┬────────┘
        ▼                                 ▼
    tiles / PIP                  match decisions (dist ≤ threshold)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONF, EngineConf, NN_PARAM
from ..operators.blocking import bkafi_feature_order, bkafi_vectors
from ..operators.extract import extract_objects
from ..operators.knn import knn_join
from ..operators.matching import (
    matched_pair_vectors,
    pair_features,
    percentile_thresholds,
    threshold_stats,
)
from ..operators.properties import compute_properties
from ..sources.checkpoint import CheckpointManager


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    bkafi_dim: int = 3,
    k: int = NN_PARAM,
    decision_percentile: float = 0.95,
    zoom: int = 15,
    checkpoints: CheckpointManager | None = None,
    knn_strategy: str = "auto",
    conf: EngineConf = DEFAULT_CONF,
    with_features: bool = True,
) -> dict:
    """Returns {'objects', 'properties', 'candidates', 'matches',
    'stats', 'feature_order', 'thresholds'}."""

    def stage(name, fn, params=None):
        if checkpoints is not None:
            return checkpoints.run_stage(name, fn, params)
        return fn()

    objects = stage("objects", lambda: extract_objects(pages, zoom=zoom)).persist()
    properties = stage(
        "properties", lambda: compute_properties(objects, log1p=True)
    ).persist()

    order = bkafi_feature_order(properties, criterion="std")
    feats = order[:bkafi_dim]

    cands_v, index_v = bkafi_vectors(properties, feats)
    cands_v, index_v = cands_v.persist(), index_v.persist()
    candidates = stage(
        "candidates",
        lambda: knn_join(cands_v, index_v, k, strategy=knn_strategy, conf=conf),
        params={"dim": bkafi_dim, "k": k},
    ).persist()

    # threshold matcher (bkafi_with_threshold.py lifecycle)
    dists, _ = matched_pair_vectors(properties, feats)
    thresholds = percentile_thresholds(
        dists, (0.5, 0.75, 0.9, 0.95, 0.99)
    )
    thr = thresholds[decision_percentile]
    matches = candidates.filter(F.col("dist") <= F.lit(thr)).withColumn(
        "label", (F.col("cand_id") == F.col("index_id")).cast("int")
    )

    features = None
    if with_features:
        features = stage(
            "pair_features",
            lambda: pair_features(
                candidates.select("cand_id", "index_id"), properties
            ),
            params={"dim": bkafi_dim, "k": k},
        )

    n_c = objects.filter(F.col("source") == "cands").count()
    n_i = objects.filter(F.col("source") == "index").count()
    n_int = (
        objects.filter(F.col("source") == "cands")
        .select("obj_id")
        .intersect(objects.filter(F.col("source") == "index").select("obj_id"))
        .count()
    )
    stats = threshold_stats(candidates, thresholds, n_c, n_i, n_int)

    return {
        "objects": objects,
        "properties": properties,
        "candidates": candidates,
        "matches": matches,
        "pair_features": features,
        "stats": stats,
        "feature_order": order,
        "thresholds": thresholds,
        "counts": {"cands": n_c, "index": n_i, "intersection": n_int},
    }
