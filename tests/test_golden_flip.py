"""Flip + parity tests for the learned-model oracles.

All three learned-model oracles are INDEPENDENT since round 5 (the golden
tier is empty): ``geo_blocking_fi`` first — tools/gen_expected.py::expected_blocking_fi
recomputes the whole fi chain (xxhash64 negative draws → ratio features →
seeded RF importances → BKAFI kNN) without engine imports, and reproduced
the previously-captured golden byte-identically on first run; the
engine↔sim agreement is asserted directly in
``test_blocking_fi_sim_matches_engine`` below.  A golden/independent
comparison only has teeth if a deterministic kernel bug actually CHANGES
the output; these tests prove that for the bug classes the oracle
demonstrably catches:

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

    def test_blocking_fi_sim_matches_engine(self, spark, props):
        """Round-5 promotion evidence: the gen_expected standalone fi
        chain (xxhash64 draws → ratio features → seeded RF importances)
        yields EXACTLY the engine's learned feature order on the fixture.
        Catches any future drift between the engine fit and the
        independent oracle spec."""
        import math as _math
        import sys as _sys

        _sys.path.insert(0, "/root/repo/tools")
        import gen_expected as GE

        from geospatial_object_matching_spark.config import OBJECT_PROPERTIES

        order_engine, _ = mm.learned_feature_order(
            props, n_neg=2, seed=1, n_trees=15
        )

        pdf = props.toPandas()
        vals = {
            p: {
                s: dict(
                    zip(g["obj_id"], g[p])
                )
                for s, g in pdf.groupby("source")
            }
            for p in OBJECT_PROPERTIES
        }
        ids_c = set(vals[OBJECT_PROPERTIES[0]]["cands"])
        ids_i = sorted(vals[OBJECT_PROPERTIES[0]]["index"])
        matched = sorted(ids_c.intersection(ids_i))
        pairs = sorted(GE.negative_pairs_sim(matched, ids_i, n_neg=2, seed=1))
        X = np.empty((len(pairs), len(OBJECT_PROPERTIES)))
        y = np.empty(len(pairs), dtype=np.int64)
        for r, (cid, iid) in enumerate(pairs):
            y[r] = 1 if cid == iid else 0
            for fj, p in enumerate(OBJECT_PROPERTIES):
                c, i = vals[p]["cands"][cid], vals[p]["index"][iid]
                if i == 0.0:
                    X[r, fj] = 1000.0
                else:
                    rr = GE.spark_round(c / i, 3)
                    X[r, fj] = 1000.0 if _math.isnan(rr) else min(1000.0, rr)
        order_sim = [
            n.split("_ratio")[0]
            for n in GE.rf_importance_order(
                X, y, [f"{p}_ratio" for p in OBJECT_PROPERTIES], n_trees=15
            )
        ]
        assert order_sim == order_engine

    def test_matching_quality_flips_on_scorer_bug(
        self, spark, props, monkeypatch
    ):
        base = run_matching_quality(spark, props, bkafi_dim=3, n_neg=2, seed=1)
        monkeypatch.setattr(mm, "_f1_macro", _class1_f1)
        bad = run_matching_quality(spark, props, bkafi_dim=3, n_neg=2, seed=1)
        # cv_f1 is part of the emitted rows — the oracle hash flips
        assert not base.equals(bad)
        assert (
            base.sort_values("model")["cv_f1"].to_numpy()
            != bad.sort_values("model")["cv_f1"].to_numpy()
        ).any()

    def test_matching_quality_sim_matches_engine(self, spark):
        """Round-5 promotion evidence: gen_expected's standalone
        matching-quality chain (oracle BKAFI pairs → ratio features → md5
        split → RF/GB CV-grid spec transcriptions) reproduces the engine
        lifecycle EXACTLY on the fixture. The independent recomputation
        also reproduced the r4 engine-captured golden parquet
        byte-identically on first regeneration."""
        import sys as _sys

        _sys.path.insert(0, "/root/repo/tools")
        import gen_expected as GE

        from geospatial_object_matching_spark.operators.properties import (
            pages_to_properties,
        )

        n = 40
        exp = GE.expected_matching_quality(n)
        pages = generate_pages_df(spark, n, seed=42)
        pr = pages_to_properties(pages, zoom=15, log1p=True)
        got = run_matching_quality(spark, pr, bkafi_dim=3, n_neg=2, seed=1)
        assert exp.to_dict("records") == got.to_dict("records")

    def test_contrastive_quality_sim_matches_engine(self, spark):
        """Same promotion evidence for the contrastive lifecycle: scalar
        render+encode (bit-identical embeddings, verified 109/109) →
        blocking pairs → |diff| features → MLP-spec fit → P/R/F1."""
        import sys as _sys

        _sys.path.insert(0, "/root/repo/tools")
        import gen_expected as GE

        from geospatial_object_matching_spark.plans.contrastive import (
            run_contrastive_matching,
        )

        n = 30
        exp = GE.expected_contrastive_quality(n)
        pages = generate_pages_df(spark, n, seed=42)
        got = run_contrastive_matching(spark, pages, n_neg=2, seed=1)
        assert exp.to_dict("records") == got.to_dict("records")
