"""RobustScaler as a two-phase Spark aggregation (SURVEY.md §2.4 A9).

Reference semantics (blocking.py:106-112, sklearn RobustScaler): per-feature
center = median, scale = IQR (linear-interpolated quartiles), fit on the
*cands* side only, applied to both sides; zero IQR → scale 1.

Implemented as one exact ``percentile(col, array(0.25,0.5,0.75))``
aggregation (Spark's exact percentile is linear-interpolated, same as
numpy/sklearn) collected as 3 numbers per feature and folded back in as
literals — the fit is O(|features|) driver state, never a shuffle of the
data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robust_scaler_fit(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """{col: (center, scale)} from exact percentiles over ``df``."""
    aggs = [
        F.percentile(F.col(c), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias(c)
        for c in cols
    ]
    row = df.agg(*aggs).first()
    out = {}
    for c in cols:
        q1, med, q3 = row[c]
        iqr = q3 - q1
        out[c] = (float(med), float(iqr) if iqr != 0.0 else 1.0)
    return out


def robust_scaler_transform(
    df: DataFrame, stats: dict[str, tuple[float, float]], suffix: str = ""
) -> DataFrame:
    """Apply (x - center) / scale as column expressions (JVM-side)."""
    out = df
    for c, (center, scale) in stats.items():
        out = out.withColumn(
            f"{c}{suffix}", (F.col(c) - F.lit(center)) / F.lit(scale)
        )
    return out
