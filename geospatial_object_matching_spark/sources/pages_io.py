"""Pages table reader: Iceberg when available, parquet otherwise
(BASELINE.json input_hint names an Iceberg table; this sandbox has no
Iceberg runtime jar — SURVEY.md §7 — so ``auto`` probes and falls back)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, path: str, fmt: str = "auto") -> DataFrame:
    """Read the pages table. ``path`` is a filesystem path (parquet) or a
    catalog table identifier (iceberg)."""
    if fmt == "iceberg" or (fmt == "auto" and _iceberg_available(spark) and "/" not in path):
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)
