"""Dataset partition generator (reference data_partition.py:31-148 and the
dirty-clean variant data_partition_dirty.py — identical partition logic;
the dirty variant differs only in which object store the ids come from).

Builds the reference's ``dataset_partition_dict`` as DataFrames:

    train[size][n_neg]        — labeled (cand_id, index_id) pair sets:
                                positives (id, id) for a ratio-sampled
                                subset of matched ids + n_neg per-cand
                                negative draws (R1)
    test.matching[size][n]    — same shape over matched ids DISJOINT from
                                that size's train cands
    test.blocking[size]       — (cands_ids, index_ids) id sets: cands
                                disjoint from train, index with
                                ``non_matched_rat`` of the sampled cands
                                removed (so ~20% of test cands have no
                                index twin — data_partition.py:112-127)

All sampling is the engine's deterministic md5/xxhash scheme
(operators/sampling.py) — the reference's process-salted ``hash()``
seeding is not reproducible across runs, so exact id parity with the
reference is impossible by construction; the invariants (sizes,
disjointness, composition) are the oracle-checkable surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import negative_sample_pairs, sample_ids_fraction

TRAIN_SIZE_RATIOS = {"small": 0.1, "medium": 0.4, "large": 0.6}
TEST_SIZE_RATIOS = {"small": 0.1, "medium": 0.5, "large": 1.0}
NEG_SAMPLES = (2, 5)


def create_dataset_partition(
    cands_ids: DataFrame,
    index_ids: DataFrame,
    seed: int = 1,
    train_size_ratios: dict[str, float] | None = None,
    test_size_ratios: dict[str, float] | None = None,
    train_neg_samples: tuple[int, ...] = NEG_SAMPLES,
    test_neg_samples: tuple[int, ...] = NEG_SAMPLES,
    non_matched_rat: float = 0.2,
    id_col: str = "obj_id",
) -> dict:
    """Returns {'train': {size: {n: pairs_df}},
    'test': {'matching': {size: {n: pairs_df}},
             'blocking': {size: {'cands': df, 'index': df}}}}."""
    train_size_ratios = train_size_ratios or TRAIN_SIZE_RATIOS
    test_size_ratios = test_size_ratios or TEST_SIZE_RATIOS
    cands_ids = cands_ids.select(F.col(id_col).alias(id_col))
    index_ids = index_ids.select(F.col(id_col).alias(id_col)).persist()
    inter = cands_ids.intersect(index_ids).persist()

    out: dict = {"train": {}, "test": {"matching": {}, "blocking": {}}}
    train_ids: dict[str, DataFrame] = {}
    for size, ratio in train_size_ratios.items():
        # per-(seed,size) salt keeps the sizes independent draws, like the
        # reference's sequential np.random.choice calls
        train_ids[size] = sample_ids_fraction(
            inter, id_col, ratio, seed=seed * 1000 + len(size)
        ).persist()
        out["train"][size] = {
            n: negative_sample_pairs(train_ids[size], index_ids, n, seed)
            for n in train_neg_samples
        }

    for size, ratio in test_size_ratios.items():
        pool = inter.join(
            train_ids.get(size, train_ids[next(iter(train_ids))]),
            id_col,
            "left_anti",
        ).persist()
        # matching: ratio-sampled matched ids disjoint from train
        test_ids = sample_ids_fraction(
            pool, id_col, ratio, seed=seed * 2000 + len(size)
        )
        out["test"]["matching"][size] = {
            n: negative_sample_pairs(test_ids, index_ids, n, seed + 1)
            for n in test_neg_samples
        }
        # blocking: cands sample + index with non_matched_rat of the
        # sampled cands removed, then ratio-sampled
        cands_test = sample_ids_fraction(
            pool, id_col, ratio, seed=seed * 3000 + len(size)
        ).persist()
        removed = sample_ids_fraction(
            cands_test, id_col, non_matched_rat, seed=seed * 4000 + len(size)
        )
        index_kept = index_ids.join(removed, id_col, "left_anti")
        index_test = sample_ids_fraction(
            index_kept, id_col, ratio, seed=seed * 5000 + len(size)
        )
        out["test"]["blocking"][size] = {
            "cands": cands_test,
            "index": index_test,
        }
    return out


def partition_summary(partition: dict) -> DataFrame:
    """One row per (split, size, key): row count + positive count — the
    compact driver-checkable surface of the partition dict."""
    frames = []
    for size, by_n in partition["train"].items():
        for n, pairs in by_n.items():
            frames.append(
                pairs.agg(
                    F.lit("train").alias("split"),
                    F.lit(size).alias("size"),
                    F.lit(f"neg{n}").alias("key"),
                    F.count("*").alias("n_rows"),
                    F.sum(
                        (F.col("cand_id") == F.col("index_id")).cast("long")
                    ).alias("n_pos"),
                )
            )
    for size, by_n in partition["test"]["matching"].items():
        for n, pairs in by_n.items():
            frames.append(
                pairs.agg(
                    F.lit("test_matching").alias("split"),
                    F.lit(size).alias("size"),
                    F.lit(f"neg{n}").alias("key"),
                    F.count("*").alias("n_rows"),
                    F.sum(
                        (F.col("cand_id") == F.col("index_id")).cast("long")
                    ).alias("n_pos"),
                )
            )
    for size, sides in partition["test"]["blocking"].items():
        for side, df in sides.items():
            frames.append(
                df.agg(
                    F.lit("test_blocking").alias("split"),
                    F.lit(size).alias("size"),
                    F.lit(side).alias("key"),
                    F.count("*").alias("n_rows"),
                    F.lit(0).cast("long").alias("n_pos"),
                )
            )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
