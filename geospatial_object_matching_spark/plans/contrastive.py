"""M5 — contrastive image-matching lifecycle.

Reference analog ("contrastive_training_matching_with
contamination.py":27-151 ``run_pipeline``): blocking-based training
pairs of rendered object images → CLIP visual encoder →
``ContrastiveBinaryClassifier`` head on ``|emb1 - emb2|`` trained with
BCE-with-logits (AdamW, shuffled mini-batches) → binary
precision/recall/F1 via sigmoid > 0.5.

Spark-first lifecycle (encoder stand-in documented in
operators/contrastive.py):

    pages ─extract─▶ objects ─render (S7)─▶ PNG blobs
        │                                   │
        ▼                                   ▼
    properties ─BKAFI blocking─▶ pairs   image_embeddings (S8)
        │                          │        │
        └── blocking-based pair ───┴─join──▶ |diff| features (JVM cols)
            partition (pos/neg)             │
                                            ▼
            driver fit: MLPMatcher head (numpy Adam, logistic loss —
            the same |diff| → MLP → sigmoid topology as the reference
            head, two hidden layers vs its one)
                                            ▼
            broadcast weights ─▶ distributed predict ─▶ P/R/F1 row
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONF, EngineConf
from ..operators.blocking import run_bkafi_blocking
from ..operators.contrastive import image_embeddings, pair_diff_features
from ..operators.extract import extract_objects
from ..operators.matching import precision_recall_f1
from ..operators.matching_model import MLPMatcher, predict_matches
from ..operators.properties import pages_to_properties
from ..operators.render import render_objects_png
from .matching_quality import blocking_based_pairs, train_test_split_pairs


def run_contrastive_matching(
    spark: SparkSession,
    pages: DataFrame,
    dim: int | None = None,
    n_neg: int = 2,
    seed: int = 1,
    embed_seed: int = 7,
    conf: EngineConf = DEFAULT_CONF,
    train_cap: int = 60_000,
    hidden: tuple[int, int] = (32, 16),
    max_iter: int = 300,
) -> pd.DataFrame:
    """Full M5 lifecycle; returns one row:
    (model, precision, recall, f1) on the held-out test pairs.

    ``train_cap`` bounds the driver-side fit exactly as in
    run_matching_quality: tighten the entity-hash window, never collect
    more than ~cap pairs at any corpus scale."""
    pages = pages.persist()
    props = pages_to_properties(pages, zoom=15, log1p=True)
    blocking = run_bkafi_blocking(
        props, dims=[3], k_list=(n_neg + 1,), nn_param=n_neg + 1, conf=conf
    )
    matched = (
        props.filter(F.col("source") == "cands")
        .select("obj_id")
        .intersect(props.filter(F.col("source") == "index").select("obj_id"))
    )
    pairs = blocking_based_pairs(blocking.candidates, n_neg, matched_ids=matched)

    objects = extract_objects(pages).select(
        F.concat_ws("|", "source", "obj_id").alias("objkey"),
        "coords",
        "ring_offsets",
    )
    from ..operators.contrastive import EMBED_DIM

    n_dim = dim if dim is not None else EMBED_DIM
    emb = image_embeddings(
        render_objects_png(objects, id_col="objkey"),
        dim=dim,
        seed=embed_seed,
    ).select(
        F.split("obj_id", "\\|").getItem(0).alias("source"),
        F.split("obj_id", "\\|").getItem(1).alias("obj_id"),
        "embedding",
    ).persist()
    feats = pair_diff_features(
        pairs,
        emb.filter(F.col("source") == "cands").select("obj_id", "embedding"),
        emb.filter(F.col("source") == "index").select("obj_id", "embedding"),
        n_dim,
    ).persist()
    d_cols = [f"d{i}" for i in range(n_dim)]

    train, test = train_test_split_pairs(feats, 0.7, seed)
    n_train = train.count()
    if n_train > train_cap:
        train, _ = train_test_split_pairs(
            feats, 0.7 * (train_cap / n_train), seed
        )
    train_pdf = (
        train.select("cand_id", "index_id", "label", *d_cols)
        .toPandas()
        .sort_values(["cand_id", "index_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    head = MLPMatcher(hidden=hidden, max_iter=max_iter, seed=seed).fit(
        train_pdf[d_cols].to_numpy(dtype=np.float64),
        train_pdf["label"].to_numpy(dtype=np.int64),
        d_cols,
    )
    scored = predict_matches(
        head, test, d_cols, keep_cols=("cand_id", "index_id", "label")
    )
    m = precision_recall_f1(scored)
    pages.unpersist()
    return pd.DataFrame(
        [
            {
                "model": "ContrastiveImageMatcher",
                "precision": round(m["precision"], 3),
                "recall": round(m["recall"], 3),
                "f1": round(m["f1"], 3),
            }
        ]
    )
