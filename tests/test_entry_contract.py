"""Driver-contract guard inside the pytest gate: a fast subset of
``__spark_entry__`` queries checked against their DuckDB oracles at
sf0.001 (the full sweep lives in tools/parity_check.py)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
FAST_QUERIES = [
    "filter_project", "semi_join", "anti_join", "group_agg", "topk_window",
    "ratio_feature", "percentile_agg", "robust_scale", "set_intersect",
    "set_except", "union_label", "ratio_stats", "seed_mean_pivot",
    "sampled_subset", "negative_sampling", "contamination", "knn_window",
    "tumbling_window", "dedup_exact", "token_count", "text_scores",
    "fingerprint", "cosine_topk", "embedding_near_dup",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    fn = E.queries()[name]
    sql = E.oracle_sql()[name]
    spark_pdf = fn(spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(sql).df()
    assert len(spark_pdf) == len(duck_pdf)
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av = pd.to_numeric(a[c]).astype(float)
            bv = pd.to_numeric(b[c]).astype(float)
            ok = (av.isna() & bv.isna()) | ((av - bv).abs() <= 1e-6 + 1e-9 * bv.abs())
            assert ok.all(), f"{name}.{c}"
        else:
            assert (a[c].astype(str) == b[c].astype(str)).all(), f"{name}.{c}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"cand_id", "index_id", "rank", "dist", "label"}
