"""Deterministic sampling operators (SURVEY.md §2.7 R1-R3; reference
data_partition.py:40-148, contamination_experiments.py:67-85).

The reference seeds ``np.random`` with ``seed + hash(cand_id) % 1e6``
(data_partition.py:56-57) — process-salted ``hash()`` makes that
non-reproducible across runs, so the engine defines its own *stable*
per-key scheme: every random draw is a pure function of (seed, key) via
md5/xxhash, making all samples partition-count- and run-invariant
(SURVEY.md §7 hard-part 4).

Scale note: both R1 and R2 need *global positions by a sort key* — the
naive ``row_number() OVER (ORDER BY key)`` plans a single-task global
sort of the whole table. ``with_global_positions`` replaces it with the
distributed equivalent: range-repartition on the key, sort within
partitions, per-partition local ranks (streamed, no shuffle) + a
driver-side cumulative-offset map of ``num_partitions`` ints.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
import pyspark.sql.types as T


def with_global_positions(
    df: DataFrame,
    order_cols: list[str],
    pos_col: str = "_pos",
    partitions: int | None = None,
) -> DataFrame:
    """0-based global positions by ``order_cols`` (must be duplicate-free
    across rows), computed distributedly.

    Plan: repartitionByRange(order_cols) + sortWithinPartitions gives a
    globally sorted layout; per-partition row counts (one tiny agg job)
    become cumulative offsets broadcast to a mapInPandas that streams each
    sorted partition once, adding ``offset[pid] + local_rank``. No
    single-task Exchange anywhere; driver state is num_partitions ints.
    """
    spark = df.sparkSession
    P = partitions or spark.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(P, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist()  # pin range boundaries across the two jobs below
    )
    counts = (
        parts.groupBy(F.spark_partition_id().alias("_pid"))
        .count()
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[int(row["_pid"])] = acc
        acc += int(row["count"])
    bc = spark.sparkContext.broadcast(offsets)

    schema = T.StructType(
        list(parts.schema.fields) + [T.StructField(pos_col, T.LongType(), False)]
    )

    def add_pos(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        pos = bc.value.get(pid, 0)
        for pdf in batches:
            out = pdf.copy()
            out[pos_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield out

    return parts.mapInPandas(add_pos, schema=schema)


def sample_ids_fraction(
    df: DataFrame, id_col: str, fraction: float, seed: int
) -> DataFrame:
    """R2: deterministic ratio subsample — rank by md5(seed||id), keep the
    first ``floor(frac*n)`` (data_partition.py:40-53 semantics, seeded
    choice-without-replacement).

    Scale path: md5 is uniform on the hex space, so rows with hashes above
    ``fraction·(1+margin)`` of the space cannot be in the sample — an
    analytic prefix-cutoff filter (pushed to the scan) drops them before
    the exact distributed ranking of the small superset. The margin covers
    binomial variance; if the superset unexpectedly undershoots ``take``
    (tiny inputs), fall back to ranking the full table.
    """
    n = df.count()
    take = int(fraction * n)
    if take <= 0:
        return df.limit(0)
    ranked = df.withColumn(
        "_h", F.md5(F.concat(F.lit(str(seed) + "|"), F.col(id_col).cast("string")))
    )
    frac_cut = (take / n) * 1.3 + 10.0 / n  # margin: 30% + 10 rows absolute
    if frac_cut < 1.0:
        cutoff = format(min(int(frac_cut * 16**8), 16**8 - 1), "08x")
        superset = ranked.filter(F.col("_h") <= cutoff).persist()
        if superset.count() < take:  # margin missed (degenerate n) — exact fallback
            superset = ranked
    else:
        superset = ranked
    pos = with_global_positions(superset, ["_h"])
    return pos.filter(F.col("_pos") < take).drop("_h", "_pos")


def negative_sample_pairs(
    cand_ids: DataFrame,
    index_ids: DataFrame,
    n_neg: int,
    seed: int,
    id_col: str = "obj_id",
) -> DataFrame:
    """R1: per-candidate negative sampling without replacement.

    For each cand, draw ``n_neg`` distinct index ids ≠ cand (reference
    data_partition.py:55-60) via hashed positions into a position-indexed
    table: pos_j = xxhash64(seed, cand_id, j) mod |I| for an oversampled
    j range, dedup per cand keeping draw order, take the first n_neg.
    Index positions come from ``with_global_positions`` (distributed — no
    global-sort window); the draw join is an equi-join on position.
    Positives (cand_id, cand_id) are unioned in, mirroring
    ``[(cand_id, cand_id)] + neg_pairs``.
    """
    n_index = index_ids.count()
    idx = with_global_positions(
        index_ids.select(F.col(id_col).alias("index_id")), ["index_id"]
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
    # (windows partitioned by cand_id — distributed, no global sort)
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
