"""Kabsch/Procrustes centroid-frame alignment (SURVEY.md §2.3 J7;
reference blocking.py:78-92 'centroid_with_transform').

The reference computes H = index_centered · cands_centeredᵀ over the full
point lists, which is only shape-consistent when |C| == |I|; this engine
implements the standard Kabsch estimator over *matched pairs*: two
aggregations produce the means and the 3×3 cross-covariance
H = Σ (iᵢ−ī)(cᵢ−c̄)ᵀ, a 3×3 SVD runs on the driver, and the resulting
rotation/scale/translation is applied as pure column arithmetic
(broadcast literals — no UDF, no shuffle beyond the two aggs).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CENT = ("centroid_x", "centroid_y", "centroid_z")


def fit_centroid_transform(objects: DataFrame) -> dict:
    """Estimate rotation R, scale s, translation t mapping index-frame
    centroids onto the cands frame, from matched (same obj_id) pairs."""
    c = objects.filter(F.col("source") == "cands").select(
        "obj_id", *[F.col(x).alias(f"c_{x}") for x in CENT]
    )
    i = objects.filter(F.col("source") == "index").select(
        "obj_id", *[F.col(x).alias(f"i_{x}") for x in CENT]
    )
    m = c.join(i, "obj_id")

    means = m.agg(
        *[F.avg(f"c_{x}").alias(f"mc_{x}") for x in CENT],
        *[F.avg(f"i_{x}").alias(f"mi_{x}") for x in CENT],
    ).first()
    mc = np.array([means[f"mc_{x}"] for x in CENT])
    mi = np.array([means[f"mi_{x}"] for x in CENT])

    # 3x3 cross-covariance + norms in ONE aggregation
    aggs = []
    for a, xa in enumerate(CENT):
        for b, xb in enumerate(CENT):
            aggs.append(
                F.sum(
                    (F.col(f"i_{xa}") - F.lit(float(mi[a])))
                    * (F.col(f"c_{xb}") - F.lit(float(mc[b])))
                ).alias(f"h_{a}{b}")
            )
    aggs.append(
        F.sum(
            sum(
                ((F.col(f"c_{x}") - F.lit(float(mc[k]))) ** 2 for k, x in enumerate(CENT)),
                F.lit(0.0),
            )
        ).alias("ss_c")
    )
    aggs.append(
        F.sum(
            sum(
                ((F.col(f"i_{x}") - F.lit(float(mi[k]))) ** 2 for k, x in enumerate(CENT)),
                F.lit(0.0),
            )
        ).alias("ss_i")
    )
    row = m.agg(*aggs).first()
    H = np.array([[row[f"h_{a}{b}"] for b in range(3)] for a in range(3)])

    U, S, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:  # reflection guard (blocking.py:86-88)
        Vt[-1, :] *= -1
        R = Vt.T @ U.T
    scale = float(np.sqrt(row["ss_c"] / row["ss_i"])) if row["ss_i"] else 1.0
    t = mc - scale * (R @ mi)
    return {"R": R.tolist(), "scale": scale, "t": t.tolist()}


def apply_centroid_transform(objects: DataFrame, params: dict) -> DataFrame:
    """x' = s·R·x + t on index-side centroids (column expressions only)."""
    R = params["R"]
    s = params["scale"]
    t = params["t"]
    exprs = {}
    for a, xa in enumerate(CENT):
        exprs[xa] = sum(
            (F.lit(s * R[a][b]) * F.col(xb) for b, xb in enumerate(CENT)),
            F.lit(float(t[a])),
        )
    # one select: sequential withColumn would feed the already-transformed
    # centroid_x into centroid_y's expression
    return objects.select(
        *[
            c
            for c in objects.columns
            if c not in CENT
        ],
        *[
            F.when(F.col("source") == "index", exprs[xa])
            .otherwise(F.col(xa))
            .alias(xa)
            for xa in CENT
        ],
    )
