"""Numpy RF matcher: planted-signal fit, distributed predict parity,
feature-importance criterion wiring."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geospatial_object_matching_spark.operators.matching_model import (
    RandomForestMatcher,
    feature_importance_order,
    predict_matches,
    train_matcher,
)


def make_data(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, (n, 5))
    # label determined by feature 2 (strong) + feature 0 (weak)
    y = ((X[:, 2] + 0.3 * X[:, 0] + rng.normal(0, 0.3, n)) > 0).astype(np.int64)
    return X, y


class TestRF:
    def test_fit_predict_accuracy(self):
        X, y = make_data()
        m = RandomForestMatcher(n_trees=20, max_depth=6, seed=3)
        m.fit(X[:1500], y[:1500], [f"f{i}" for i in range(5)])
        acc = (m.predict(X[1500:]) == y[1500:]).mean()
        assert acc > 0.85

    def test_importance_ranks_signal_feature(self):
        X, y = make_data()
        m = RandomForestMatcher(n_trees=20, max_depth=6, seed=3)
        m.fit(X, y, [f"f{i}_ratio" for i in range(5)])
        ranking = m.feature_importance_ranking()
        assert ranking[0][0] == "f2_ratio"
        assert feature_importance_order(m)[0] == "f2"

    def test_determinism(self):
        X, y = make_data()
        a = RandomForestMatcher(n_trees=10, seed=7).fit(X, y, list("abcde"))
        b = RandomForestMatcher(n_trees=10, seed=7).fit(X, y, list("abcde"))
        np.testing.assert_array_equal(a.importances_, b.importances_)
        np.testing.assert_array_equal(a.predict_proba(X), b.predict_proba(X))


class TestSparkPredict:
    def test_distributed_predict_matches_local(self, spark):
        X, y = make_data(500)
        m = RandomForestMatcher(n_trees=10, max_depth=5, seed=1)
        m.fit(X, y, [f"f{i}" for i in range(5)])
        rows = [
            (str(i), str(i), *[float(v) for v in X[i]]) for i in range(len(X))
        ]
        df = spark.createDataFrame(
            rows,
            "cand_id string, index_id string, f0 double, f1 double, f2 double, "
            "f3 double, f4 double",
        )
        out = (
            predict_matches(m, df, [f"f{i}" for i in range(5)])
            .toPandas()
            .set_index("cand_id")
        )
        local = m.predict_proba(X)
        for i in range(len(X)):
            assert out.loc[str(i), "score"] == pytest.approx(local[i], abs=1e-12)

    def test_learned_feature_order_end_to_end(self, spark):
        """feature_importance BKAFI criterion on the geospatial fixture:
        learned order is deterministic, covers all 25 properties, and
        blocking with it achieves sane recall."""
        from geospatial_object_matching_spark.config import OBJECT_PROPERTIES
        from geospatial_object_matching_spark.operators.blocking import (
            run_bkafi_blocking,
        )
        from geospatial_object_matching_spark.operators.matching_model import (
            learned_feature_order,
        )
        from geospatial_object_matching_spark.operators.properties import (
            pages_to_properties,
        )
        from geospatial_object_matching_spark.sources.pages import (
            generate_pages_df,
        )

        props = pages_to_properties(
            generate_pages_df(spark, 60, seed=42), log1p=True
        ).persist()
        order1, model = learned_feature_order(props, n_neg=2, seed=1, n_trees=10)
        order2, _ = learned_feature_order(props, n_neg=2, seed=1, n_trees=10)
        assert order1 == order2
        assert sorted(order1) == sorted(OBJECT_PROPERTIES)

        res = run_bkafi_blocking(
            props, dims=[3], k_list=(20,), feature_order=order1,
            strategy="broadcast",
        )
        recall = res.recall["blocking_recall"].iloc[0]
        assert recall >= 0.5  # learned features must be informative

    def test_matching_end_to_end_with_contamination(self, spark):
        """Reference lifecycle §3.2 + contamination replay
        (contamination_experiments.py): train on clean pair features,
        evaluate on clean and 25%-contaminated test pairs; quality must be
        high clean and degrade gracefully."""
        from pyspark.sql import functions as F

        from geospatial_object_matching_spark.config import OBJECT_PROPERTIES
        from geospatial_object_matching_spark.operators.matching import (
            label_pairs,
            pair_features,
            precision_recall_f1,
        )
        from geospatial_object_matching_spark.operators.matching_model import (
            predict_matches,
            train_matcher,
        )
        from geospatial_object_matching_spark.operators.properties import (
            pages_to_properties,
        )
        from geospatial_object_matching_spark.operators.sampling import (
            contaminate_features,
            negative_sample_pairs,
        )
        from geospatial_object_matching_spark.sources.pages import (
            generate_pages_df,
        )

        props = pages_to_properties(
            generate_pages_df(spark, 120, seed=42), log1p=True
        ).persist()
        cands_ids = props.filter(F.col("source") == "cands").select("obj_id")
        index_ids = props.filter(F.col("source") == "index").select("obj_id")
        matched = cands_ids.intersect(index_ids)
        pairs = label_pairs(negative_sample_pairs(matched, index_ids, 3, seed=2))
        feats = pair_features(pairs, props).persist()
        ratio_cols = [f"{p}_ratio" for p in OBJECT_PROPERTIES]

        # deterministic hash split train/test
        is_train = F.substring(
            F.md5(F.concat("cand_id", F.lit("|"), "index_id")), 1, 1
        ).isin(*list("01234567"))
        train = feats.filter(is_train)
        test = feats.filter(~is_train).persist()

        model = train_matcher(train, ratio_cols, n_trees=15, max_depth=7, seed=3)

        def f1_of(test_df):
            scored = predict_matches(
                model, test_df, ratio_cols, keep_cols=("cand_id", "index_id", "label")
            )
            return precision_recall_f1(scored)["f1"]

        clean_f1 = f1_of(test)
        assert clean_f1 > 0.8, clean_f1

        dirty = contaminate_features(
            test.withColumn(
                "_k", F.concat("cand_id", F.lit("|"), "index_id")
            ),
            ratio_cols,
            level=0.25,
            seed=5,
            key_col="_k",
        )
        dirty_f1 = f1_of(dirty)
        assert dirty_f1 > 0.5 * clean_f1, (clean_f1, dirty_f1)

    def test_train_matcher_from_df(self, spark):
        X, y = make_data(800)
        rows = [
            (*[float(v) for v in X[i]], int(y[i])) for i in range(len(X))
        ]
        df = spark.createDataFrame(
            rows, "f0 double, f1 double, f2 double, f3 double, f4 double, label int"
        )
        m = train_matcher(df, [f"f{i}" for i in range(5)], n_trees=10, seed=2)
        assert m.feature_importance_ranking()[0][0] == "f2"
