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


def dense_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_cap: int = 2_000_000,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine via a broadcast dense index matrix + one BLAS
    GEMM per Arrow batch + argpartition — the flat-inner-product index
    analog of :func:`cosine_topk`, with the identical output contract
    ``(query_id, vec_id, rank, cosine)`` (rank by cosine desc, ties by
    vec_id asc, self-matches excluded when ``exclude_self``).

    ``exclude_self=False`` keeps index rows whose id equals the query id —
    the cross-table blocking form (reference blocking.py:176-191 searches
    a faiss index of INDEX objects with CAND queries, where the id
    equality IS the true match the PC@k metric looks for).

    Scale shape: the index (ids + L2-normalized float64 matrix) is
    collected ONCE on the driver (dispatch-capped at ``index_cap`` rows,
    the same pattern as ``knn_join_broadcast``) and broadcast to
    executors; each query partition streams ``Q_unit @ M.T`` through a
    reused GEMM buffer and keeps k rows per query — |Q|·|B|·d FLOPs
    inside BLAS instead of |Q|·|B| shuffled rows through a rank window.
    Past the cap, use :func:`lsh_cosine_topk` / :func:`ivf_cosine_topk`
    (approximate) or shard the index and merge per-query top-k (the
    ``knn_join_range`` pattern).

    Semantics note: zero-norm vectors get cosine 0.0 against everything
    (the crossJoin form yields NaN there); identical on any input
    without zero vectors.
    """
    import pandas as pd
    from pyspark.sql import types as T

    n_index = embeddings.count()
    if n_index > index_cap:
        raise ValueError(
            f"dense index has {n_index} rows > cap {index_cap}; use "
            "lsh_cosine_topk/ivf_cosine_topk or a sharded exact merge"
        )
    idx_pdf = embeddings.select(id_col, vec_col).toPandas()
    ids = idx_pdf[id_col].tolist()
    M = np.array(idx_pdf[vec_col].tolist(), dtype=np.float64)
    nrm = np.linalg.norm(M, axis=1, keepdims=True)
    M = np.where(nrm > 0, M / np.where(nrm == 0, 1.0, nrm), 0.0)
    MT = np.ascontiguousarray(M.T)  # (d, B) — clean GEMM operand
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast((ids, MT))

    q_id_type = queries.schema[id_col].dataType
    b_id_type = embeddings.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", q_id_type),
            T.StructField("vec_id", b_id_type),
            T.StructField("rank", T.IntegerType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def gen(batches):
        ids_l, MT_l = bc.value
        B = MT_l.shape[1]
        id_pos = {v: i for i, v in enumerate(ids_l)}
        m = min(B, k + 8)
        rows_per = max(1, 32_000_000 // max(B, 1))
        sbuf = np.empty((rows_per, B), dtype=np.float64)
        for pdf in batches:
            qids_all = pdf[id_col].tolist()
            Q = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            qn = np.linalg.norm(Q, axis=1, keepdims=True)
            Q = np.where(qn > 0, Q / np.where(qn == 0, 1.0, qn), 0.0)
            out_q, out_v, out_r, out_c = [], [], [], []
            for lo in range(0, len(Q), rows_per):
                Qc = np.ascontiguousarray(Q[lo : lo + rows_per])
                S = np.dot(Qc, MT_l, out=sbuf[: len(Qc)])
                for i in range(len(Qc)):
                    s = S[i]
                    pos = (
                        id_pos.get(qids_all[lo + i]) if exclude_self else None
                    )
                    if pos is not None:
                        s[pos] = -np.inf
                    if B <= m:
                        cand = list(range(B))
                    else:
                        cand = np.argpartition(-s, m - 1)[:m].tolist()
                    cand.sort(key=lambda j: (-s[j], ids_l[j]))
                    top = cand[: min(k, len(cand))]
                    # exact tie boundary: if the kth kept score equals the
                    # worst candidate score, ties may straddle the
                    # argpartition cut — re-derive candidates from >= kth
                    if len(cand) > len(top) and B > m:
                        kth = s[top[-1]]
                        if kth <= min(s[j] for j in cand):
                            cand = np.nonzero(s >= kth)[0].tolist()
                            cand.sort(key=lambda j: (-s[j], ids_l[j]))
                            top = cand[: min(k, len(cand))]
                    n_keep = sum(1 for j in top if s[j] > -np.inf)
                    top = top[:n_keep]
                    out_q.extend([qids_all[lo + i]] * len(top))
                    out_v.extend(ids_l[j] for j in top)
                    out_r.extend(range(1, len(top) + 1))
                    out_c.extend(float(s[j]) for j in top)
            yield pd.DataFrame(
                {
                    "query_id": out_q,
                    "vec_id": out_v,
                    "rank": pd.array(out_r, dtype="int32"),
                    "cosine": pd.array(out_c, dtype="float64"),
                }
            )

    return queries.select(id_col, vec_col).mapInPandas(gen, out_schema)


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


# --------------------------------------------------------------------------
# IVF (coarse-quantizer) ANN — the k-means analog of the LSH scale path
# --------------------------------------------------------------------------


def ivf_kmeans_centroids(
    X: np.ndarray,
    n_centroids: int,
    n_iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer — the IVF SPEC
    shared with the test oracle (tools/gen_expected.py reimplements it
    from this docstring, like the LSH plane spec):

    - rows of ``X`` are L2-normalized first (zero rows stay zero);
    - init: ``Generator(PCG64(seed)).choice(len(X), n_centroids,
      replace=False)`` row indices;
    - ``n_iters`` Lloyd rounds: assign = argmax dot (first max wins),
      centroid = mean of assigned rows re-normalized (empty cluster keeps
      its previous centroid), then ROUNDED to 9 decimals — the rounding is
      part of the spec so independent reimplementations cannot drift by
      ulps across iterations.
    """
    X = np.asarray(X, dtype=np.float64)
    nrm = np.linalg.norm(X, axis=1, keepdims=True)
    X = np.where(nrm > 0, X / np.where(nrm == 0, 1.0, nrm), 0.0)
    rng = np.random.Generator(np.random.PCG64(seed))
    idx = rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)
    C = np.round(X[idx].copy(), 9)
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                vn = np.linalg.norm(v)
                if vn > 0:
                    C[c] = v / vn
        C = np.round(C, 9)
    return C


def _centroid_dot(vec, centroid: np.ndarray):
    arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cid",
) -> DataFrame:
    """Nearest-centroid id as a pure JVM expression: argmax over the
    per-centroid dot products (first max wins, matching np.argmax).
    Centroids are unit vectors, so argmax dot == argmax cosine — no
    normalization of the row vector needed."""
    v = F.col(vec_col).cast("array<double>")
    dots = F.array(*[_centroid_dot(v, c) for c in centroids])
    return embeddings.withColumn(
        out_col, (F.array_position(dots, F.array_max(dots)) - 1).cast("int")
    )


def ivf_probes(
    queries: DataFrame,
    centroids: np.ndarray,
    n_probe: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``n_probe`` centroid ids per query (dot desc, cid asc on ties)
    as JVM expressions: structs of (-dot, cid) array-sorted ascending,
    sliced, exploded."""
    v = F.col(vec_col).cast("array<double>")
    arr = F.array(
        *[
            F.struct(
                (-_centroid_dot(v, c)).alias("nd"), F.lit(i).alias("c")
            )
            for i, c in enumerate(centroids)
        ]
    )
    probes = F.slice(F.array_sort(arr), 1, n_probe)
    return queries.withColumn("_p", F.explode(probes)).withColumn(
        "cid", F.col("_p.c").cast("int")
    ).drop("_p")


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 8,
    seed: int = 7,
    train_cap: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k by cosine: a driver-fit coarse quantizer
    (BOUNDED deterministic sample: first ``train_cap`` rows by id) buckets
    the index by nearest centroid; each query probes its ``n_probe``
    nearest centroids and ranks only those buckets' rows.

    The scale shape: comparisons drop from |Q|·|B| (cross join) to
    ~|Q|·n_probe·|B|/n_centroids through ONE equi-join on cid — same
    join plan as the LSH path, but with data-adaptive buckets (k-means
    balances occupancy where hyperplanes cannot). All per-row math is
    JVM expressions (centroid literals); the only Python is the
    driver-side k-means on a capped sample."""
    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(train_cap)
        .collect()
    )
    C = ivf_kmeans_centroids(
        np.array([r[1] for r in sample], dtype=np.float64),
        n_centroids,
        n_iters=n_iters,
        seed=seed,
    )
    base = ivf_assign(
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("bv"),
        ),
        C,
        vec_col="bv",
    )
    q = ivf_probes(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        ),
        C,
        n_probe,
        vec_col="qv",
    )
    # each index vector lives in exactly one cid and probe cids are
    # distinct, so a (query, vec) pair appears at most once — no dedup
    pairs = q.join(base, "cid").filter(F.col("query_id") != F.col("vec_id"))
    cos = _dot("qv", "bv") / (_norm("qv") * _norm("bv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
