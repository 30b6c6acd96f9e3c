"""Injected-bug flip tests for the two remaining golden-tier oracles.

``geo_blocking_fi`` and ``geo_matching_quality`` capture learned-model
outputs bit-for-bit (oracle/expected/README.md: golden tier — the engine's
own output under fixed seeds).  A golden comparison only has teeth if a
deterministic kernel bug actually CHANGES the captured output; these tests
prove that for the two bug classes the golden hash demonstrably catches:

- a feature-importance *ordering* bug (wrong sort direction,
  classifier.py:191-207 semantics) changes the BKAFI feature order and
  therefore the blocking candidate pairs that ``geo_blocking_fi`` emits;
- a CV *scorer* bug (class-1 F1 instead of macro F1 — the reference uses
  GridSearchCV(scoring='f1_macro'), classifier.py:152-163) changes the
  ``cv_f1`` column that ``geo_matching_quality`` emits.

Scope note, measured not assumed: a tree-impurity bug (cubic impurity in
place of gini) does NOT move either output at fixture scale — the planted
pairs stay separable under slightly different splits.  The golden tier
guards the *selection and ranking* surface of the learned models; split-
kernel formula parity is covered by the numpy-oracle suites in
test_matching_model.py (separability, determinism, local==distributed).
"""

import numpy as np
import pytest

from geospatial_object_matching_spark.operators import matching_model as mm
from geospatial_object_matching_spark.operators.blocking import (
    run_bkafi_blocking,
)
from geospatial_object_matching_spark.operators.properties import (
    pages_to_properties,
)
from geospatial_object_matching_spark.plans.matching_quality import (
    run_matching_quality,
)
from geospatial_object_matching_spark.sources.pages import generate_pages_df


@pytest.fixture(scope="module")
def props(spark):
    df = pages_to_properties(
        generate_pages_df(spark, 120, seed=42), zoom=15, log1p=True
    ).persist()
    df.count()
    yield df
    df.unpersist()


def _ascending_ranking(self):
    """Injected bug: importance sort direction inverted."""
    return sorted(
        zip(self.feature_names, self.importances_), key=lambda kv: kv[1]
    )


def _class1_f1(y_true, y_pred):
    """Injected bug: plain class-1 F1 where the scorer must macro-average."""
    tp = float(np.sum((y_pred == 1) & (y_true == 1)))
    fp = float(np.sum((y_pred == 1) & (y_true != 1)))
    fn = float(np.sum((y_pred != 1) & (y_true == 1)))
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0


class TestGoldenOracleFlips:
    def test_blocking_fi_flips_on_importance_sort_bug(
        self, spark, props, monkeypatch
    ):
        order_good, model = mm.learned_feature_order(
            props, n_neg=2, seed=1, n_trees=10
        )
        # the flip is only meaningful if the ranking is non-degenerate
        assert len(set(np.round(model.importances_, 12))) > 5

        monkeypatch.setattr(
            mm.RandomForestMatcher,
            "feature_importance_ranking",
            _ascending_ranking,
        )
        order_bad, _ = mm.learned_feature_order(
            props, n_neg=2, seed=1, n_trees=10
        )
        assert order_bad[:3] != order_good[:3]

        def pair_set(order):
            res = run_bkafi_blocking(
                props, dims=[3], k_list=(1, 5), nn_param=5,
                feature_order=order,
            )
            return {
                (r["cand_id"], r["index_id"], r["rank"])
                for r in res.candidates.collect()
            }

        # the golden artifact itself (the candidate pair rows) moves, so
        # the driver's value-hash comparison would go red
        assert pair_set(order_good) != pair_set(order_bad)

    def test_matching_quality_flips_on_scorer_bug(
        self, spark, props, monkeypatch
    ):
        base = run_matching_quality(spark, props, bkafi_dim=3, n_neg=2, seed=1)
        monkeypatch.setattr(mm, "_f1_macro", _class1_f1)
        bad = run_matching_quality(spark, props, bkafi_dim=3, n_neg=2, seed=1)
        # cv_f1 is part of the emitted rows — the golden hash flips
        assert not base.equals(bad)
        assert (
            base.sort_values("model")["cv_f1"].to_numpy()
            != bad.sort_values("model")["cv_f1"].to_numpy()
        ).any()
