"""exact_percentiles must be BIT-identical to Spark's exact percentile
aggregate — it replaces a single-reducer serial agg in the scaler fit and
the threshold percentiles, so any ulp drift would flip oracle hashes."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from geospatial_object_matching_spark.operators.scaler import (
    exact_percentiles,
    robust_scaler_fit,
)

PROBS = [0.25, 0.5, 0.75, 0.95, 0.99]


def bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


def spark_reference(spark, df, cols, probs):
    row = df.agg(
        *[
            F.percentile(F.col(c), F.array(*[F.lit(p) for p in probs])).alias(c)
            for c in cols
        ]
    ).first()
    return {c: row[c] and [float(v) for v in row[c]] for c in cols}


def assert_bit_equal(got, want, ctx):
    assert (got is None) == (want is None), ctx
    if want is None:
        return
    for g, w, p in zip(got, want, PROBS):
        if math.isnan(w):
            assert math.isnan(g), f"{ctx} p={p}: {g} vs nan"
        else:
            assert bits(g) == bits(w), f"{ctx} p={p}: {g!r} vs {w!r}"


CASES = {
    "uniform": np.random.default_rng(0).uniform(-5, 5, 20_000),
    "heavy_dup": np.repeat([1.0, 2.0, 2.0, 3.0], 5_000)
    + np.random.default_rng(1).integers(0, 2, 20_000) * 0.0,
    "half_constant": np.concatenate(
        [np.full(10_000, 7.25), np.random.default_rng(2).normal(7.25, 1e-9, 10_000)]
    ),
    "signed_zeros": np.concatenate(
        [np.full(5_000, -0.0), np.full(5_000, 0.0), np.full(2, 1.0)]
    ),
    "with_nan": np.concatenate(
        [np.random.default_rng(3).normal(0, 1, 15_000), np.full(300, np.nan)]
    ),
    "mostly_nan": np.concatenate([np.array([3.0, 1.0, 2.0]), np.full(500, np.nan)]),
    "tiny": np.array([4.0]),
    "tiny2": np.array([2.0, 1.0]),
    "skewed": np.random.default_rng(4).pareto(0.6, 20_000),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_exact_percentiles_bit_parity(spark, name):
    data = CASES[name]
    df = spark.createDataFrame(
        [(float(v),) for v in data], "x double"
    ).repartition(7)
    df = df.persist()
    try:
        got = exact_percentiles(df, ["x"], PROBS)
        want = spark_reference(spark, df, ["x"], PROBS)
        assert_bit_equal(got["x"], want["x"], name)
    finally:
        df.unpersist()


def test_exact_percentiles_multicol_and_nulls(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(8_000):
        rows.append(
            (
                float(rng.normal()),
                float(rng.uniform()) if i % 3 else None,
                float(i % 5),
            )
        )
    df = spark.createDataFrame(rows, "a double, b double, c double").repartition(5)
    got = exact_percentiles(df, ["a", "b", "c"], PROBS)
    want = spark_reference(spark, df, ["a", "b", "c"], PROBS)
    for c in ("a", "b", "c"):
        assert_bit_equal(got[c], want[c], c)


@pytest.mark.parametrize("name", sorted(CASES))
def test_exact_percentiles_runlength_path(spark, name):
    # interior_cap=0 forces EVERY populated bracket through the
    # (value, count) run-length aggregation — the round-5 ADVICE fix: a
    # constant or heavily-duplicated column must never collect O(n)
    # duplicate rows to the driver (the bracket cannot shrink below the
    # modal value, so the raw-row path would ship every duplicate)
    data = CASES[name]
    df = spark.createDataFrame(
        [(float(v),) for v in data], "x double"
    ).repartition(7)
    got = exact_percentiles(df, ["x"], PROBS, interior_cap=0)
    want = spark_reference(spark, df, ["x"], PROBS)
    assert_bit_equal(got["x"], want["x"], name)


def test_exact_percentiles_fallback_path(spark):
    # accuracy=4 makes the brackets so loose the interior misses ranks →
    # the fallback single-agg path must produce identical values
    data = np.random.default_rng(9).normal(0, 1, 5_000)
    df = spark.createDataFrame([(float(v),) for v in data], "x double")
    got = exact_percentiles(df, ["x"], PROBS, accuracy=4)
    want = spark_reference(spark, df, ["x"], PROBS)
    assert_bit_equal(got["x"], want["x"], "fallback")


def test_robust_scaler_fit_matches_numpy(spark):
    data = np.random.default_rng(11).normal(3.0, 2.0, 9_999)
    df = spark.createDataFrame([(float(v),) for v in data], "x double")
    center, scale = robust_scaler_fit(df, ["x"])["x"]
    q1, med, q3 = np.percentile(data, [25, 50, 75])
    assert center == pytest.approx(med, abs=1e-12)
    assert scale == pytest.approx(q3 - q1, abs=1e-12)
