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
    sort_cols = [
        c for c in ("cand_id", "index_id") if c in features_df.columns
    ] or list(feature_cols)
    cols = list(dict.fromkeys([*sort_cols, *feature_cols, label_col]))
    pdf = (
        features_df.select(*cols)
        .toPandas()
        .sort_values(sort_cols, kind="mergesort")  # partition-order-proof fit
        .reset_index(drop=True)
    )
    X = pdf[list(feature_cols)].to_numpy(dtype=np.float64)
    y = pdf[label_col].to_numpy(dtype=np.int64)
    return RandomForestMatcher(**kwargs).fit(X, y, feature_cols)


def predict_matches(
    model,
    features_df: DataFrame,
    feature_cols: list[str],
    keep_cols: tuple[str, ...] = ("cand_id", "index_id"),
) -> DataFrame:
    """Broadcast model → Arrow-batched scoring (M2: batch predict).
    Accepts any backbone with ``to_dict()`` (see ``model_from_dict``)."""
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
        m = model_from_dict(bc.value)
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


# ----------------------------------------------------------------------
# second backbone: gradient-boosted trees (GradientBoostingClassifier
# analog, reference config.py:107-114) + cv grid search (classifier.py:
# 152-163, GridSearchCV cv=3, macro-F1 scorer)
# ----------------------------------------------------------------------


def _best_split_reg(X, r, feat_idx, n_bins=32):
    """Best (feature, threshold) minimizing squared error of a residual
    fit, via binned sums (one pass per feature)."""
    n = len(r)
    tot_sum = r.sum()
    best = (None, None, -1.0)
    for f in feat_idx:
        x = X[:, f]
        qs = np.unique(np.quantile(x, np.linspace(0.02, 0.98, n_bins)))
        if len(qs) < 2:
            continue
        bins = np.searchsorted(qs, x, side="right")
        s = np.zeros(len(qs) + 1)
        c = np.zeros(len(qs) + 1)
        np.add.at(s, bins, r)
        np.add.at(c, bins, 1.0)
        ls = np.cumsum(s)[:-1]
        lc = np.cumsum(c)[:-1]
        rs = tot_sum - ls
        rc = n - lc
        valid = (lc > 0) & (rc > 0)
        if not valid.any():
            continue
        # variance reduction ∝ sum_l²/n_l + sum_r²/n_r
        with np.errstate(invalid="ignore", divide="ignore"):
            score = np.where(valid, ls**2 / lc + rs**2 / rc, -np.inf)
        t = int(score.argmax())
        if score[t] > best[2]:
            best = (f, float(qs[t]), float(score[t]))
    return best[0], best[1]


def _fit_reg_tree(X, g, h, max_depth, min_samples):
    """Regression tree on gradients with Newton leaf values
    (sum(g)/sum(h)); flat node list like _fit_tree."""
    nodes = []

    def grow(idx, depth):
        node_id = len(nodes)
        nodes.append(None)
        gs, hs = g[idx].sum(), h[idx].sum()
        val = gs / hs if hs > 0 else 0.0
        if depth >= max_depth or len(idx) < min_samples:
            nodes[node_id] = (-1, 0.0, -1, -1, val)
            return node_id
        f, thr = _best_split_reg(X[idx], g[idx], np.arange(X.shape[1]))
        if f is None:
            nodes[node_id] = (-1, 0.0, -1, -1, val)
            return node_id
        mask = X[idx, f] <= thr
        if mask.all() or not mask.any():
            nodes[node_id] = (-1, 0.0, -1, -1, val)
            return node_id
        left = grow(idx[mask], depth + 1)
        right = grow(idx[~mask], depth + 1)
        nodes[node_id] = (f, thr, left, right, val)
        return node_id

    grow(np.arange(len(g)), 0)
    return nodes


def _sigmoid(z):
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))


class GradientBoostingMatcher:
    """Logistic-loss gradient boosting over shallow regression trees
    (GradientBoostingClassifier analog; Newton leaf steps)."""

    kind = "gb"

    def __init__(
        self,
        n_rounds: int = 60,
        max_depth: int = 3,
        learning_rate: float = 0.1,
        min_samples: int = 3,
        seed: int = 1,
    ):
        self.n_rounds = n_rounds
        self.max_depth = max_depth
        self.learning_rate = learning_rate
        self.min_samples = min_samples
        self.seed = seed
        self.trees: list = []
        self.f0: float = 0.0
        self.feature_names: list[str] = []

    def fit(self, X: np.ndarray, y: np.ndarray, feature_names: list[str]):
        self.feature_names = list(feature_names)
        y = y.astype(np.float64)
        p0 = min(max(y.mean(), 1e-6), 1 - 1e-6)
        self.f0 = float(np.log(p0 / (1 - p0)))
        F_val = np.full(len(y), self.f0)
        self.trees = []
        for _ in range(self.n_rounds):
            p = _sigmoid(F_val)
            g = y - p
            h = p * (1 - p)
            tree = _fit_reg_tree(X, g, h, self.max_depth, self.min_samples)
            step = _predict_tree(tree, X)
            F_val = F_val + self.learning_rate * step
            self.trees.append(tree)
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        F_val = np.full(len(X), self.f0)
        for tree in self.trees:
            F_val = F_val + self.learning_rate * _predict_tree(tree, X)
        return _sigmoid(F_val)

    def predict(self, X: np.ndarray) -> np.ndarray:
        return (self.predict_proba(X) >= 0.5).astype(np.int32)

    def to_dict(self) -> dict:
        return {
            "kind": self.kind,
            "trees": self.trees,
            "f0": self.f0,
            "lr": self.learning_rate,
            "feature_names": self.feature_names,
        }


def _best_split_xgb(X, g, h, feat_idx, lam, n_bins=32):
    """Best (feature, threshold) maximizing the XGBoost split gain
    G_L^2/(H_L+lam) + G_R^2/(H_R+lam) - G^2/(H+lam) — hessian-weighted,
    L2-regularized (the structural difference from the classic
    GradientBoostingMatcher, whose splits minimize unweighted residual
    variance)."""
    G, H = g.sum(), h.sum()
    parent = G * G / (H + lam)
    best = (None, None, 0.0)
    for f in feat_idx:
        x = X[:, f]
        qs = np.unique(np.quantile(x, np.linspace(0.02, 0.98, n_bins)))
        if len(qs) < 2:
            continue
        bins = np.searchsorted(qs, x, side="right")
        sg = np.zeros(len(qs) + 1)
        sh = np.zeros(len(qs) + 1)
        np.add.at(sg, bins, g)
        np.add.at(sh, bins, h)
        gl = np.cumsum(sg)[:-1]
        hl = np.cumsum(sh)[:-1]
        gr = G - gl
        hr = H - hl
        gain = gl * gl / (hl + lam) + gr * gr / (hr + lam) - parent
        t = int(gain.argmax())
        if gain[t] > best[2]:
            best = (f, float(qs[t]), float(gain[t]))
    return best[0], best[1]


def _fit_xgb_tree(X, g, h, max_depth, min_samples, lam):
    """Regression tree with XGB gain splits and -G/(H+lam) leaves (sign
    folded: g here is y - p, so leaves ADD toward the label)."""
    nodes = []

    def grow(idx, depth):
        node_id = len(nodes)
        nodes.append(None)
        gs, hs = g[idx].sum(), h[idx].sum()
        val = gs / (hs + lam)
        if depth >= max_depth or len(idx) < min_samples:
            nodes[node_id] = (-1, 0.0, -1, -1, val)
            return node_id
        f, thr = _best_split_xgb(X[idx], g[idx], h[idx], np.arange(X.shape[1]), lam)
        if f is None:
            nodes[node_id] = (-1, 0.0, -1, -1, val)
            return node_id
        mask = X[idx, f] <= thr
        if mask.all() or not mask.any():
            nodes[node_id] = (-1, 0.0, -1, -1, val)
            return node_id
        left = grow(idx[mask], depth + 1)
        right = grow(idx[~mask], depth + 1)
        nodes[node_id] = (f, thr, left, right, val)
        return node_id

    grow(np.arange(len(g)), 0)
    return nodes


class XGBoostMatcher(GradientBoostingMatcher):
    """XGBClassifier analog (the 6th reference backbone, config.py:75-76):
    logistic-loss boosting like GradientBoostingMatcher but with
    hessian-weighted L2-regularized split gain and -G/(H+lambda) leaves —
    a genuinely distinct booster, not a hyperparameter alias."""

    kind = "xgb"

    def __init__(
        self,
        n_rounds: int = 60,
        max_depth: int = 3,
        learning_rate: float = 0.1,
        min_samples: int = 3,
        reg_lambda: float = 1.0,
        seed: int = 1,
    ):
        super().__init__(n_rounds, max_depth, learning_rate, min_samples, seed)
        self.reg_lambda = reg_lambda

    def fit(self, X: np.ndarray, y: np.ndarray, feature_names: list[str]):
        self.feature_names = list(feature_names)
        y = y.astype(np.float64)
        p0 = min(max(y.mean(), 1e-6), 1 - 1e-6)
        self.f0 = float(np.log(p0 / (1 - p0)))
        F_val = np.full(len(y), self.f0)
        self.trees = []
        for _ in range(self.n_rounds):
            p = _sigmoid(F_val)
            g = y - p
            h = p * (1 - p)
            tree = _fit_xgb_tree(
                X, g, h, self.max_depth, self.min_samples, self.reg_lambda
            )
            F_val = F_val + self.learning_rate * _predict_tree(tree, X)
            self.trees.append(tree)
        return self

    def to_dict(self) -> dict:
        d = super().to_dict()
        d["kind"] = self.kind
        d["reg_lambda"] = self.reg_lambda
        return d


def model_from_dict(state: dict):
    """Rebuild a broadcastable matcher from its to_dict() state."""
    if state.get("kind") == "mlp":
        m = MLPMatcher()
        m.params = state["params"]
        m.norm = state["norm"]
        m.feature_names = state["feature_names"]
        return m
    if state.get("kind") == "ada":
        m = AdaBoostMatcher()
        m.stumps = state["stumps"]
        m.feature_names = state["feature_names"]
        return m
    if state.get("kind") == "bagging":
        m = BaggingMatcher()
        m.trees = state["trees"]
        m.feature_names = state["feature_names"]
        return m
    if state.get("kind") == "xgb":
        m = XGBoostMatcher()
        m.trees = state["trees"]
        m.f0 = state["f0"]
        m.learning_rate = state["lr"]
        m.reg_lambda = state.get("reg_lambda", 1.0)
        m.feature_names = state["feature_names"]
        return m
    if state.get("kind") == "gb":
        m = GradientBoostingMatcher()
        m.trees = state["trees"]
        m.f0 = state["f0"]
        m.learning_rate = state["lr"]
        m.feature_names = state["feature_names"]
        return m
    m = RandomForestMatcher()
    m.trees = state["trees"]
    m.feature_names = state["feature_names"]
    return m


# ----------------------------------------------------------------------
# cv grid search (classifier.py:152-163: GridSearchCV(cv=3, macro-F1))
# ----------------------------------------------------------------------

MATCHER_BACKBONES = {
    "RandomForestMatcher": RandomForestMatcher,
    "GradientBoostingMatcher": GradientBoostingMatcher,
    "XGBoostMatcher": XGBoostMatcher,
    "BaggingMatcher": None,   # bound after class definitions below
    "AdaBoostMatcher": None,
}

#: small grids in the reference's param_dict shape (config.py:79-128);
#: DEFAULT keeps the driver query fast — FULL adds the other backbones
DEFAULT_PARAM_GRIDS = {
    "RandomForestMatcher": {"n_trees": [15, 30], "max_depth": [5, 8]},
    "GradientBoostingMatcher": {
        "n_rounds": [40, 80],
        "learning_rate": [0.1, 0.3],
        "max_depth": [3],
    },
}

FULL_PARAM_GRIDS = {
    **DEFAULT_PARAM_GRIDS,
    "XGBoostMatcher": {
        "n_rounds": [40, 80],
        "learning_rate": [0.1, 0.3],
        "reg_lambda": [1.0],
        "max_depth": [3],
    },
    "BaggingMatcher": {"n_trees": [10, 20], "max_samples": [0.8, 1.0]},
    "AdaBoostMatcher": {"n_estimators": [50, 100], "learning_rate": [0.5, 1.0]},
}


def _f1_macro(y_true, y_pred) -> float:
    """Macro-averaged binary F1 (the reference's GridSearchCV scorer)."""
    f1s = []
    for cls in (0, 1):
        tp = float(np.sum((y_pred == cls) & (y_true == cls)))
        fp = float(np.sum((y_pred == cls) & (y_true != cls)))
        fn = float(np.sum((y_pred != cls) & (y_true == cls)))
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if prec + rec else 0.0)
    return float(np.mean(f1s))


def _param_combos(grid: dict) -> list[dict]:
    keys = sorted(grid)
    combos = [{}]
    for k in keys:
        combos = [dict(c, **{k: v}) for c in combos for v in grid[k]]
    return combos


def _stratified_folds(y: np.ndarray, cv: int, seed: int):
    """Deterministic stratified k-fold index arrays."""
    rng = np.random.Generator(np.random.PCG64(seed))
    folds = [[] for _ in range(cv)]
    for cls in np.unique(y):
        idx = np.flatnonzero(y == cls)
        rng.shuffle(idx)
        for i, chunk in enumerate(np.array_split(idx, cv)):
            folds[i].extend(chunk.tolist())
    return [np.array(sorted(f)) for f in folds]


def cv_grid_search(
    X: np.ndarray,
    y: np.ndarray,
    feature_names: list[str],
    param_grids: dict | None = None,
    cv: int = 3,
    seed: int = 1,
):
    """Per-backbone GridSearchCV analog: best params by mean macro-F1 over
    stratified folds; refit the winner on all rows. Returns
    {backbone: {"model", "best_params", "cv_f1"}}."""
    grids = param_grids or DEFAULT_PARAM_GRIDS
    folds = _stratified_folds(y, cv, seed)
    out = {}
    for name, grid in grids.items():
        cls = MATCHER_BACKBONES[name]
        best = (None, -1.0)
        for params in _param_combos(grid):
            scores = []
            for i in range(cv):
                test_idx = folds[i]
                train_idx = np.concatenate([folds[j] for j in range(cv) if j != i])
                m = cls(seed=seed, **params).fit(
                    X[train_idx], y[train_idx], feature_names
                )
                scores.append(_f1_macro(y[test_idx], m.predict(X[test_idx])))
            mean_f1 = float(np.mean(scores))
            if mean_f1 > best[1]:
                best = (params, mean_f1)
        model = cls(seed=seed, **best[0]).fit(X, y, feature_names)
        out[name] = {"model": model, "best_params": best[0], "cv_f1": best[1]}
    return out


# ----------------------------------------------------------------------
# additional backbones: Bagging (reference config.py:116-120) and
# AdaBoost-SAMME (config.py:102-105). The Newton-step boosting in
# GradientBoostingMatcher doubles as the XGBClassifier analog (same
# second-order objective); MLP/CLIP remain out of scope (SURVEY §2.10).
# ----------------------------------------------------------------------


class BaggingMatcher(RandomForestMatcher):
    """BaggingClassifier analog: bootstrap-bagged full-feature CART trees
    (RandomForest minus feature subsampling, plus a max_samples knob)."""

    kind = "bagging"

    def __init__(
        self,
        n_trees: int = 20,
        max_depth: int = 8,
        min_samples: int = 4,
        max_samples: float = 1.0,
        seed: int = 1,
    ):
        super().__init__(
            n_trees=n_trees, max_depth=max_depth, min_samples=min_samples, seed=seed
        )
        self.max_samples = max_samples

    def fit(self, X: np.ndarray, y: np.ndarray, feature_names: list[str]):
        rng = np.random.Generator(np.random.PCG64(self.seed))
        self.feature_names = list(feature_names)
        n, d = X.shape
        take = max(1, int(self.max_samples * n))
        imp = np.zeros(d)
        self.trees = []
        for _ in range(self.n_trees):
            boot = rng.integers(0, n, take)
            self.trees.append(
                _fit_tree(
                    X[boot], y[boot], rng, self.max_depth, self.min_samples,
                    d, imp,  # max_features = ALL features
                )
            )
        self.importances_ = imp / imp.sum() if imp.sum() else imp
        return self


def _fit_stump_weighted(X: np.ndarray, y: np.ndarray, w: np.ndarray):
    """Best weighted decision stump: (feature, threshold, left_class).
    One sorted cumulative-weight pass per feature."""
    best = (0, 0.0, 1, np.inf)  # feature, thr, left_class, weighted error
    ypm = np.where(y == 1, 1.0, -1.0)
    for f in range(X.shape[1]):
        order = np.argsort(X[:, f], kind="stable")
        xs = X[order, f]
        ws = (w * ypm)[order]
        # cum[i] = Σ_{j<=i} w_j*y_j for x <= xs[i]
        cum = np.cumsum(ws)
        total = cum[-1]
        # split after i (x <= xs[i] goes left). err(left=+1) =
        # Σ_left w[y=-1] + Σ_right w[y=+1] = C - cum[i] rearranged; use
        # margins: score(i) = cum[i] - (total - cum[i]) = 2cum[i]-total;
        # left_class=+1 err = (W - score)/2 with W = Σw
        valid = xs[:-1] < xs[1:]
        if not valid.any():
            continue
        W = w.sum()
        score = 2 * cum[:-1] - total
        err_pos = (W - score) / 2.0  # left=+1, right=-1
        err_neg = (W + score) / 2.0  # left=-1, right=+1
        err_pos[~valid] = np.inf
        err_neg[~valid] = np.inf
        i_pos = int(err_pos.argmin())
        i_neg = int(err_neg.argmin())
        if err_pos[i_pos] < best[3]:
            best = (f, float((xs[i_pos] + xs[i_pos + 1]) / 2.0), 1, float(err_pos[i_pos]))
        if err_neg[i_neg] < best[3]:
            best = (f, float((xs[i_neg] + xs[i_neg + 1]) / 2.0), 0, float(err_neg[i_neg]))
    return best


class AdaBoostMatcher:
    """SAMME AdaBoost over weighted decision stumps
    (AdaBoostClassifier(algorithm='SAMME') analog)."""

    kind = "ada"

    def __init__(
        self,
        n_estimators: int = 50,
        learning_rate: float = 1.0,
        seed: int = 1,
    ):
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.seed = seed
        self.stumps: list = []  # (feature, thr, left_class, alpha)
        self.feature_names: list[str] = []

    def fit(self, X: np.ndarray, y: np.ndarray, feature_names: list[str]):
        self.feature_names = list(feature_names)
        n = len(y)
        w = np.full(n, 1.0 / n)
        self.stumps = []
        for _ in range(self.n_estimators):
            f, thr, left_cls, err = _fit_stump_weighted(X, y, w)
            err = max(err, 1e-10)
            if err >= 0.5:
                break
            alpha = self.learning_rate * np.log((1 - err) / err)
            pred = np.where(X[:, f] <= thr, left_cls, 1 - left_cls)
            w = w * np.exp(alpha * (pred != y))
            w /= w.sum()
            self.stumps.append((int(f), float(thr), int(left_cls), float(alpha)))
            if err <= 1e-9:
                break
        return self

    def _decision(self, X: np.ndarray) -> np.ndarray:
        F_val = np.zeros(len(X))
        total = 0.0
        for f, thr, left_cls, alpha in self.stumps:
            pred = np.where(X[:, f] <= thr, left_cls, 1 - left_cls)
            F_val += alpha * np.where(pred == 1, 1.0, -1.0)
            total += alpha
        return F_val / total if total > 0 else F_val

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return (self._decision(X) + 1.0) / 2.0

    def predict(self, X: np.ndarray) -> np.ndarray:
        return (self._decision(X) >= 0.0).astype(np.int32)

    def to_dict(self) -> dict:
        return {
            "kind": self.kind,
            "stumps": self.stumps,
            "feature_names": self.feature_names,
        }


MATCHER_BACKBONES["BaggingMatcher"] = BaggingMatcher
MATCHER_BACKBONES["AdaBoostMatcher"] = AdaBoostMatcher


class MLPMatcher:
    """MLPClassifier analog (reference config.py:96-101: hidden (64,32),
    relu, adam, batch 16): a two-hidden-layer numpy MLP with logistic
    loss and Adam, deterministic under its seed (seeded init + seeded
    epoch shuffles)."""

    kind = "mlp"

    def __init__(
        self,
        hidden: tuple[int, int] = (64, 32),
        batch_size: int = 16,
        max_iter: int = 200,
        learning_rate: float = 1e-3,
        seed: int = 1,
    ):
        self.hidden = tuple(hidden)
        self.batch_size = batch_size
        self.max_iter = max_iter
        self.learning_rate = learning_rate
        self.seed = seed
        self.params: list = []  # [(W1,b1),(W2,b2),(W3,b3)] as lists
        self.norm: tuple = ()  # (mean, std) standardization
        self.feature_names: list[str] = []

    def fit(self, X: np.ndarray, y: np.ndarray, feature_names: list[str]):
        self.feature_names = list(feature_names)
        rng = np.random.Generator(np.random.PCG64(self.seed))
        mu = X.mean(axis=0)
        sd = np.where(X.std(axis=0) == 0, 1.0, X.std(axis=0))
        self.norm = (mu.tolist(), sd.tolist())
        Xs = (X - mu) / sd
        yv = y.astype(np.float64)
        d = X.shape[1]
        sizes = [d, *self.hidden, 1]
        Ws = [
            rng.normal(0, np.sqrt(2.0 / sizes[i]), (sizes[i], sizes[i + 1]))
            for i in range(3)
        ]
        bs = [np.zeros(sizes[i + 1]) for i in range(3)]
        # adam state
        mW = [np.zeros_like(w) for w in Ws]
        vW = [np.zeros_like(w) for w in Ws]
        mB = [np.zeros_like(b) for b in bs]
        vB = [np.zeros_like(b) for b in bs]
        b1, b2, eps = 0.9, 0.999, 1e-8
        t = 0
        n = len(yv)
        for _ in range(self.max_iter):
            order = rng.permutation(n)
            for s in range(0, n, self.batch_size):
                idx = order[s : s + self.batch_size]
                xb, yb = Xs[idx], yv[idx]
                # forward
                z1 = xb @ Ws[0] + bs[0]
                a1 = np.maximum(z1, 0)
                z2 = a1 @ Ws[1] + bs[1]
                a2 = np.maximum(z2, 0)
                z3 = (a2 @ Ws[2] + bs[2]).ravel()
                p = _sigmoid(z3)
                # backward (logistic loss)
                g3 = ((p - yb) / len(yb))[:, None]
                grads_W = [None, None, a2.T @ g3]
                grads_b = [None, None, g3.sum(axis=0)]
                g2 = (g3 @ Ws[2].T) * (z2 > 0)
                grads_W[1] = a1.T @ g2
                grads_b[1] = g2.sum(axis=0)
                g1 = (g2 @ Ws[1].T) * (z1 > 0)
                grads_W[0] = xb.T @ g1
                grads_b[0] = g1.sum(axis=0)
                t += 1
                for i in range(3):
                    mW[i] = b1 * mW[i] + (1 - b1) * grads_W[i]
                    vW[i] = b2 * vW[i] + (1 - b2) * grads_W[i] ** 2
                    mB[i] = b1 * mB[i] + (1 - b1) * grads_b[i]
                    vB[i] = b2 * vB[i] + (1 - b2) * grads_b[i] ** 2
                    mhW = mW[i] / (1 - b1**t)
                    vhW = vW[i] / (1 - b2**t)
                    mhB = mB[i] / (1 - b1**t)
                    vhB = vB[i] / (1 - b2**t)
                    Ws[i] -= self.learning_rate * mhW / (np.sqrt(vhW) + eps)
                    bs[i] -= self.learning_rate * mhB / (np.sqrt(vhB) + eps)
        self.params = [(w.tolist(), b.tolist()) for w, b in zip(Ws, bs)]
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        mu, sd = np.array(self.norm[0]), np.array(self.norm[1])
        a = (np.asarray(X, dtype=np.float64) - mu) / sd
        for i, (w, b) in enumerate(self.params):
            a = a @ np.array(w) + np.array(b)
            if i < 2:
                a = np.maximum(a, 0)
        return _sigmoid(a.ravel())

    def predict(self, X: np.ndarray) -> np.ndarray:
        return (self.predict_proba(X) >= 0.5).astype(np.int32)

    def to_dict(self) -> dict:
        return {
            "kind": self.kind,
            "params": self.params,
            "norm": self.norm,
            "feature_names": self.feature_names,
        }


MATCHER_BACKBONES["MLPMatcher"] = MLPMatcher
FULL_PARAM_GRIDS["MLPMatcher"] = {"max_iter": [150], "learning_rate": [1e-3, 3e-3]}
