"""Deterministic sampling operators (SURVEY.md §2.7 R1-R3; reference
data_partition.py:40-148, contamination_experiments.py:67-85).

The reference seeds ``np.random`` with ``seed + hash(cand_id) % 1e6``
(data_partition.py:56-57) — process-salted ``hash()`` makes that
non-reproducible across runs, so the engine defines its own *stable*
per-key scheme: every random draw is a pure function of (seed, key) via
md5/xxhash, making all samples partition-count- and run-invariant
(SURVEY.md §7 hard-part 4). Everything is column expressions or one
position-join; no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_ids_fraction(
    df: DataFrame, id_col: str, fraction: float, seed: int
) -> DataFrame:
    """R2: deterministic ratio subsample — rank by md5(seed||id), keep the
    first ``floor(frac*n)`` (data_partition.py:40-53 semantics, seeded
    choice-without-replacement)."""
    n = df.count()
    take = int(fraction * n)
    ranked = df.withColumn(
        "_h", F.md5(F.concat(F.lit(str(seed) + "|"), F.col(id_col).cast("string")))
    )
    w = Window.orderBy("_h")
    return (
        ranked.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= take)
        .drop("_h", "_r")
    )


def negative_sample_pairs(
    cand_ids: DataFrame,
    index_ids: DataFrame,
    n_neg: int,
    seed: int,
    id_col: str = "obj_id",
) -> DataFrame:
    """R1: per-candidate negative sampling without replacement.

    For each cand, draw ``n_neg`` distinct index ids ≠ cand (reference
    data_partition.py:55-60) via hashed positions into a row-numbered index
    table: pos_j = xxhash64(seed, cand_id, j) mod |I| for an oversampled
    j range, dedup per cand keeping draw order, take the first n_neg.
    One equi-join on position — no cross join, fully distributed.
    Positives (cand_id, cand_id) are unioned in, mirroring
    ``[(cand_id, cand_id)] + neg_pairs``.
    """
    n_index = index_ids.count()
    idx = index_ids.select(
        F.col(id_col).alias("index_id"),
        (F.row_number().over(Window.orderBy(id_col)) - 1).alias("_pos"),
    )
    oversample = 2 * n_neg + 10
    draws = cand_ids.select(F.col(id_col).alias("cand_id")).withColumn(
        "_j", F.explode(F.sequence(F.lit(0), F.lit(oversample - 1)))
    )
    draws = draws.withColumn(
        "_pos",
        F.pmod(F.xxhash64(F.lit(seed), F.col("cand_id"), F.col("_j")), F.lit(n_index)),
    )
    joined = draws.join(idx, "_pos").filter(F.col("index_id") != F.col("cand_id"))
    # dedup repeated positions per cand, keep earliest draw order
    w_dedup = Window.partitionBy("cand_id", "index_id").orderBy("_j")
    w_rank = Window.partitionBy("cand_id").orderBy("_j")
    negs = (
        joined.withColumn("_dup", F.row_number().over(w_dedup))
        .filter(F.col("_dup") == 1)
        .withColumn("_r", F.row_number().over(w_rank))
        .filter(F.col("_r") <= n_neg)
        .select("cand_id", "index_id")
    )
    pos = cand_ids.select(
        F.col(id_col).alias("cand_id"), F.col(id_col).alias("index_id")
    )
    return pos.unionByName(negs)


def contaminate_features(
    df: DataFrame, cols: list[str], level: float, seed: int, key_col: str
) -> DataFrame:
    """R3: contamination injection (contamination_experiments.py:67-85) —
    on a deterministic hash-picked ``level`` fraction of rows, replace each
    feature x with min(1/x, 1000) (x==0 stays 0)."""
    frac_expr = (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}|"), F.col(key_col))), 1, 8), 16, 10).cast("double")
        / F.lit(float(0xFFFFFFFF))
    )
    picked = frac_expr < F.lit(level)
    out = df
    for c in cols:
        contaminated = F.when(F.col(c) == 0.0, F.lit(0.0)).otherwise(
            F.least(F.lit(1000.0), 1.0 / F.col(c))
        )
        out = out.withColumn(c, F.when(picked, contaminated).otherwise(F.col(c)))
    return out
