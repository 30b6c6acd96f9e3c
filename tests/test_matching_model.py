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
