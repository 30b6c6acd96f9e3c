"""Match classifier: driver-fit numpy random forest + distributed predict
(SURVEY.md §2.10 M1-M4; reference classifier.py).

The reference grid-searches sklearn models on driver-collected numpy
arrays (classifier.py:106-163) — the same topology here, with a
self-contained histogram-based random forest (no sklearn in this
environment): bootstrap-bagged CART trees, Gini split criterion over
quantile-binned thresholds, feature subsampling. Fit state is a plain
dict → broadcast to executors → Arrow-batched ``predict_udf`` scores any
DataFrame (M2); ``feature_importances`` (impurity decrease, normalized)
feeds the BKAFI ``feature_importance`` criterion (blocking.py:139-142).

Train sets here are candidate-pair feature tables (tens of k rows × 25) —
driver fit is the right topology at any SF because blocking bounds the
pair count per candidate; a billion-row fit would swap this for
``pyspark.ml`` GBTClassifier with the same surface.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
import pyspark.sql.types as T

# ----------------------------------------------------------------------
# numpy CART + forest
# ----------------------------------------------------------------------


def _gini(counts: np.ndarray) -> np.ndarray:
    tot = counts.sum(axis=-1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        p = counts / tot
    g = 1.0 - (p**2).sum(axis=-1)
    return np.where(tot[..., 0] > 0, g, 0.0)


def _best_split(X, y, feat_idx, n_bins=32):
    """Best (feature, threshold, gain) via binned class histograms."""
    n = len(y)
    parent_counts = np.array([np.sum(y == 0), np.sum(y == 1)], dtype=np.float64)
    parent_gini = _gini(parent_counts)
    best = (None, None, 0.0)
    for f in feat_idx:
        x = X[:, f]
        qs = np.unique(np.quantile(x, np.linspace(0.02, 0.98, n_bins)))
        if len(qs) < 2:
            continue
        # histogram of (bin, class)
        bins = np.searchsorted(qs, x, side="right")
        hist = np.zeros((len(qs) + 1, 2))
        np.add.at(hist, (bins, y), 1.0)
        left = np.cumsum(hist, axis=0)[:-1]  # counts with x <= qs[t]
        right = parent_counts - left
        nl = left.sum(axis=1)
        nr = right.sum(axis=1)
        valid = (nl > 0) & (nr > 0)
        if not valid.any():
            continue
        child = (nl * _gini(left) + nr * _gini(right)) / n
        gain = parent_gini - child
        gain[~valid] = -1.0
        t = int(gain.argmax())
        if gain[t] > best[2]:
            best = (f, float(qs[t]), float(gain[t]))
    return best


def _fit_tree(X, y, rng, max_depth, min_samples, max_features, importances):
    """Returns flat node list: (feature, threshold, left, right, value)."""
    nodes = []

    def grow(idx, depth):
        node_id = len(nodes)
        nodes.append(None)
        ysub = y[idx]
        pos = float(ysub.mean()) if len(ysub) else 0.0
        if depth >= max_depth or len(idx) < min_samples or pos in (0.0, 1.0):
            nodes[node_id] = (-1, 0.0, -1, -1, pos)
            return node_id
        feat_idx = rng.choice(X.shape[1], max_features, replace=False)
        f, thr, gain = _best_split(X[idx], ysub, feat_idx)
        if f is None or gain <= 1e-12:
            nodes[node_id] = (-1, 0.0, -1, -1, pos)
            return node_id
        importances[f] += gain * len(idx)
        mask = X[idx, f] <= thr
        left = grow(idx[mask], depth + 1)
        right = grow(idx[~mask], depth + 1)
        nodes[node_id] = (f, thr, left, right, pos)
        return node_id

    grow(np.arange(len(y)), 0)
    return nodes


def _predict_tree(nodes, X):
    out = np.empty(len(X))
    for i in range(len(X)):
        n = 0
        while True:
            f, thr, left, right, val = nodes[n]
            if f < 0:
                out[i] = val
                break
            n = left if X[i, f] <= thr else right
    return out


class RandomForestMatcher:
    """Bagged CART forest with Gini importances (RandomForestClassifier
    analog, reference config.py:78-83 hyperparameter shape)."""

    def __init__(
        self,
        n_trees: int = 30,
        max_depth: int = 8,
        min_samples: int = 4,
        seed: int = 1,
    ):
        self.n_trees = n_trees
        self.max_depth = max_depth
        self.min_samples = min_samples
        self.seed = seed
        self.trees: list = []
        self.feature_names: list[str] = []
        self.importances_: np.ndarray | None = None

    def fit(self, X: np.ndarray, y: np.ndarray, feature_names: list[str]):
        rng = np.random.Generator(np.random.PCG64(self.seed))
        self.feature_names = list(feature_names)
        n, d = X.shape
        max_features = max(1, int(np.sqrt(d)))
        imp = np.zeros(d)
        self.trees = []
        for _ in range(self.n_trees):
            boot = rng.integers(0, n, n)
            self.trees.append(
                _fit_tree(
                    X[boot], y[boot], rng, self.max_depth, self.min_samples,
                    max_features, imp,
                )
            )
        self.importances_ = imp / imp.sum() if imp.sum() else imp
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return np.mean([_predict_tree(t, X) for t in self.trees], axis=0)

    def predict(self, X: np.ndarray) -> np.ndarray:
        return (self.predict_proba(X) >= 0.5).astype(np.int32)

    def feature_importance_ranking(self) -> list[tuple[str, float]]:
        """Sorted desc — classifier.py:191-207 semantics."""
        pairs = list(zip(self.feature_names, self.importances_))
        return sorted(pairs, key=lambda kv: kv[1], reverse=True)

    def to_dict(self) -> dict:
        return {
            "trees": self.trees,
            "feature_names": self.feature_names,
        }


# ----------------------------------------------------------------------
# Spark surface
# ----------------------------------------------------------------------


def train_matcher(
    features_df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    **kwargs,
) -> RandomForestMatcher:
    """Collect the (bounded) train pair table and fit on driver
    (reference lifecycle §3.2: GridSearchCV.fit on numpy)."""
    pdf = features_df.select(*feature_cols, label_col).toPandas()
    X = pdf[feature_cols].to_numpy(dtype=np.float64)
    y = pdf[label_col].to_numpy(dtype=np.int64)
    return RandomForestMatcher(**kwargs).fit(X, y, feature_cols)


def predict_matches(
    model: RandomForestMatcher,
    features_df: DataFrame,
    feature_cols: list[str],
    keep_cols: tuple[str, ...] = ("cand_id", "index_id"),
) -> DataFrame:
    """Broadcast model → Arrow-batched scoring (M2: batch predict)."""
    spark = features_df.sparkSession
    bc = spark.sparkContext.broadcast(model.to_dict())
    schema = T.StructType(
        [features_df.schema[c] for c in keep_cols]
        + [
            T.StructField("score", T.DoubleType(), False),
            T.StructField("pred", T.IntegerType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = bc.value
        m = RandomForestMatcher()
        m.trees = state["trees"]
        m.feature_names = state["feature_names"]
        for pdf in batches:
            X = pdf[list(feature_cols)].to_numpy(dtype=np.float64)
            proba = m.predict_proba(X)
            out = pdf[list(keep_cols)].copy()
            out["score"] = proba
            out["pred"] = (proba >= 0.5).astype(np.int32)
            yield out

    return features_df.select(*keep_cols, *feature_cols).mapInPandas(
        kernel, schema=schema
    )


def feature_importance_order(
    model: RandomForestMatcher,
) -> list[str]:
    """BKAFI feature order from importances: '{prop}_ratio' → prop
    (blocking.py:139-142)."""
    return [
        name.split("_ratio")[0] for name, _ in model.feature_importance_ranking()
    ]


def learned_feature_order(
    properties: DataFrame,
    n_neg: int = 2,
    seed: int = 1,
    **rf_kwargs,
) -> tuple[list[str], RandomForestMatcher]:
    """End-to-end 'feature_importance' BKAFI criterion (the reference
    default, config.py:68): build a labeled train pair set (positives =
    matched ids, negatives = deterministic per-candidate samples,
    data_partition.py:55-60 semantics), compute 25 ratio features, fit the
    forest, return properties ordered by importance desc."""
    from ..config import OBJECT_PROPERTIES
    from .matching import label_pairs, pair_features
    from .sampling import negative_sample_pairs

    cands_ids = properties.filter(F.col("source") == "cands").select("obj_id")
    index_ids = properties.filter(F.col("source") == "index").select("obj_id")
    matched = cands_ids.intersect(index_ids)
    pairs = negative_sample_pairs(matched, index_ids, n_neg, seed)
    feats = pair_features(label_pairs(pairs), properties)
    ratio_cols = [f"{p}_ratio" for p in OBJECT_PROPERTIES]
    model = train_matcher(feats, ratio_cols, **rf_kwargs)
    return feature_importance_order(model), model
