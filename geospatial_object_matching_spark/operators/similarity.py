"""Similarity search over an embedding column (training-data pipeline).

- brute-force cosine top-k: filtered cross join + JVM dot product
  (``F.aggregate``/``zip_with``) + rank window — the exact baseline, and
  the DuckDB-oracle-checkable path.
- LSH-bucketed top-k: deterministic random-hyperplane signs bucket the
  vectors; search compares only same-bucket (plus optional neighbor-
  bucket) rows — the 100-TB path (bucket join ≪ cross join).
- embedding near-dup: cosine ≥ threshold pairs within a bucketing key.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(c: str):
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(c), lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force).

    Output: (query_id, vec_id, rank, cosine) — ties broken by vec_id;
    self-matches excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("bv"),
    )
    pairs = q.crossJoin(base).filter(F.col("query_id") != F.col("vec_id"))
    cos = _dot("qv", "bv") / (_norm("qv") * _norm("bv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cosine")
    )


def _projection_matrix(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.normal(0.0, 1.0, (n_planes, dim)).tolist()


def lsh_bucket(
    embeddings: DataFrame,
    n_planes: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id as a JVM expression: sign bits of
    fixed projections packed into a long. Deterministic (seeded planes
    are literals baked into the plan)."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _projection_matrix(dim, n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(v, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return embeddings.withColumn("bucket", bucket)


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only same-LSH-bucket rows. The bucket
    equi-join replaces the cross join — at scale this is the difference
    between |Q|·|B| and |Q|·|B|/2^planes comparisons."""
    base = lsh_bucket(embeddings, n_planes, seed, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("bv"),
        "bucket",
    )
    q = lsh_bucket(queries, n_planes, seed, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        "bucket",
    )
    pairs = q.join(base, "bucket").filter(F.col("query_id") != F.col("vec_id"))
    cos = _dot("qv", "bv") / (_norm("qv") * _norm("bv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bucket_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine ≥ threshold pairs; the bucket column (a cluster/label/LSH
    key) turns the quadratic self-join into a per-bucket equi-join."""
    lhs = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
        *( [F.col(bucket_col).alias("bk")] if bucket_col else [] ),
    )
    rhs = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
        *( [F.col(bucket_col).alias("bk")] if bucket_col else [] ),
    )
    on = ["bk"] if bucket_col else []
    pairs = (
        lhs.join(rhs, on) if on else lhs.crossJoin(rhs)
    ).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot("va", "vb") / (_norm("va") * _norm("vb"))
    out = pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
    return out
