"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir,
compare row count + column names + order-insensitive values.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
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


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            bad = ~(
                (av.isna() & bv.isna())
                | ((av - bv).abs() <= 1e-6 + 1e-9 * bv.abs())
            )
        else:
            try:
                bad = av.astype(str) != bv.astype(str)
            except Exception:
                bad = pd.Series([True] * len(av))
        if bad.any():
            i = bad.idxmax()
            problems.append(
                f"col {c}: {int(bad.sum())} mismatches, first row {i}: "
                f"spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}"
            )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from geospatial_object_matching_spark.session import get_spark
    from geospatial_object_matching_spark.config import EngineConf

    spark = get_spark("parity", master="local[8]", conf=EngineConf(shuffle_partitions=8))
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    qs = E.queries()
    sqls = E.oracle_sql()
    failures = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = sqls.get(name)
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures[name] = [f"SPARK ERROR: {ex}"]
            print(f"[FAIL-SPARK] {name}: {str(ex).splitlines()[0][:160]}")
            continue
        if sql is None:
            print(f"[ROWS-ONLY] {name}: {len(spark_pdf)} rows")
            if len(spark_pdf) == 0 and not name.startswith("geo_pip"):
                failures[name] = ["0 rows from rows-only query"]
            continue
        try:
            duck_pdf = con.sql(sql).df()
        except Exception as ex:
            failures[name] = [f"DUCK ERROR: {ex}"]
            print(f"[FAIL-DUCK] {name}: {str(ex).splitlines()[0][:160]}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures[name] = problems
            print(f"[MISMATCH] {name}: {problems[:2]}")
        else:
            print(f"[OK] {name}: {len(spark_pdf)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {sorted(failures)}")
        sys.exit(1)
    print("ALL QUERIES PASS")


if __name__ == "__main__":
    main()
