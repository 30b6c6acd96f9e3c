"""Result sink (SURVEY.md §2.1 S6; reference utils.py:280-346).

Seed-mean result aggregation: metric rows per (model/config, seed) →
``groupBy().pivot().agg(avg)`` → CSV. The reference's pandas pivot and
3-seed averaging (utils.py:303-346) as one Spark plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seed_mean_results(
    metrics: DataFrame,
    key_col: str = "model",
    metric_col: str = "metric",
    value_col: str = "value",
) -> DataFrame:
    """rows (key, seed, metric, value) → one row per key with one column
    per metric holding the seed mean, rounded 3 (utils.py:311-318)."""
    return (
        metrics.groupBy(key_col)
        .pivot(metric_col)
        .agg(F.round(F.avg(value_col), 3))
    )


def write_results_csv(results: DataFrame, path: str) -> None:
    results.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
