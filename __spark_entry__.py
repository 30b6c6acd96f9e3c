"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship geospatial blocking+matching pipeline on a
deterministic synthetic pages table sized off sf0.001; ``queries`` maps
every implemented operator family (SURVEY.md §2 + training-data ops) to a
(spark, sf_dir) → DataFrame callable; ``oracle_sql`` carries the DuckDB
equivalents (rows-only for engine-defined kernels — their exact-parity
checks live in tests/ against the numpy oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from geospatial_object_matching_spark.plans import entry_queries as EQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages → extract → 25 properties → BKAFI kNN blocking →
    threshold match decisions, at sf0.001 scale."""
    return EQ.q_geo_match_decisions(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLE_SQL)
