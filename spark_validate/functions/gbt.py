"""Tiny histogram-based gradient-boosted trees (binary logloss + L2), numpy.

The reference's DomainClassifierCalculator trains LightGBM
(`/root/reference/nannyml/drift/multivariate/domain_classifier/calculator.py:76-96`),
and its DLE loss models are LightGBM regressors
(`/root/reference/nannyml/performance_estimation/direct_loss_estimation/dle.py:436-447`);
LightGBM is not installed in this container. This is a deterministic,
dependency-free stand-in with the same model family (second-order boosted
depth-limited trees over feature-quantile histogram splits), so the
discriminator can pick up NONLINEAR chunk-vs-reference drift that a logistic
regression misses, and DLE can learn nonlinear loss surfaces a ridge cannot.

Deliberately small: equi-depth bin candidates per feature, greedy gain splits
with L2 leaf regularization and a Newton leaf step — the LightGBM objective
math, none of its systems machinery. Per-chunk inputs here are ~10-20k rows ×
a handful of features, so the O(rounds · depth · features · bins) cost is
microseconds-to-milliseconds inside the Arrow worker.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))


class _Node:
    __slots__ = ("feature", "threshold", "left", "right", "value")

    def __init__(self, value: float = 0.0):
        self.feature: Optional[int] = None
        self.threshold: float = 0.0
        self.left: Optional["_Node"] = None
        self.right: Optional["_Node"] = None
        self.value: float = value


def _leaf_value(g_sum: float, h_sum: float, lam: float) -> float:
    return -g_sum / (h_sum + lam)


def _best_split(
    binned: np.ndarray,
    g: np.ndarray,
    h: np.ndarray,
    idx: np.ndarray,
    n_bins_per_f: List[int],
    cand: List[np.ndarray],
    lam: float,
    min_child: float,
) -> Optional[Tuple[int, float, float]]:
    """Vectorized histogram split search: per feature, bincount the gradient/
    hessian into the prebuilt bins, cumulative-sum to get every candidate's
    left totals at once (the LightGBM histogram trick)."""
    gi, hi = g[idx], h[idx]
    G, H = gi.sum(), hi.sum()
    base = G * G / (H + lam)
    best = None
    best_gain = 1e-12
    for f in range(binned.shape[1]):
        nb = n_bins_per_f[f]
        if nb == 0:
            continue
        bf = binned[idx, f]
        gb = np.bincount(bf, weights=gi, minlength=nb + 1)
        hb = np.bincount(bf, weights=hi, minlength=nb + 1)
        GL = np.cumsum(gb)[:-1]  # left totals for "value <= cand[f][j]"
        HL = np.cumsum(hb)[:-1]
        GR = G - GL
        HR = H - HL
        ok = (HL >= min_child) & (HR >= min_child)
        if not ok.any():
            continue
        gains = np.where(ok, GL * GL / (HL + lam) + GR * GR / (HR + lam) - base, -np.inf)
        j = int(np.argmax(gains))
        if gains[j] > best_gain:
            best_gain = float(gains[j])
            best = (f, float(cand[f][j]), best_gain)
    return best


def _fit_tree(
    X: np.ndarray,
    binned: np.ndarray,
    g: np.ndarray,
    h: np.ndarray,
    idx: np.ndarray,
    n_bins_per_f: List[int],
    cand: List[np.ndarray],
    depth: int,
    lam: float,
    min_child: float,
) -> _Node:
    node = _Node(_leaf_value(g[idx].sum(), h[idx].sum(), lam))
    if depth <= 0 or len(idx) < 2 * min_child:
        return node
    split = _best_split(binned, g, h, idx, n_bins_per_f, cand, lam, min_child)
    if split is None:
        return node
    f, thr, _ = split
    mask = X[idx, f] <= thr
    node.feature, node.threshold = f, thr
    node.left = _fit_tree(X, binned, g, h, idx[mask], n_bins_per_f, cand, depth - 1, lam, min_child)
    node.right = _fit_tree(X, binned, g, h, idx[~mask], n_bins_per_f, cand, depth - 1, lam, min_child)
    return node


def _predict_tree(node: _Node, X: np.ndarray, out: np.ndarray, idx: np.ndarray) -> None:
    if node.feature is None:
        out[idx] += node.value
        return
    mask = X[idx, node.feature] <= node.threshold
    _predict_tree(node.left, X, out, idx[mask])
    _predict_tree(node.right, X, out, idx[~mask])


def _make_bins(X_tr: np.ndarray, n_bins: int):
    """Equi-depth candidate thresholds per feature + bin indices, computed ONCE."""
    cand, cols = [], []
    for f in range(X_tr.shape[1]):
        qs = np.unique(np.quantile(X_tr[:, f], np.linspace(0.02, 0.98, n_bins)))
        cand.append(qs)
        cols.append(np.searchsorted(qs, X_tr[:, f], side="left"))
    binned = np.column_stack(cols) if cols else np.zeros((len(X_tr), 0), dtype=np.int64)
    return cand, binned, [len(q) for q in cand]


def gbdt_train_scores(
    X_tr: np.ndarray,
    y_tr: np.ndarray,
    X_va: np.ndarray,
    n_rounds: int = 30,
    learning_rate: float = 0.3,
    max_depth: int = 3,
    n_bins: int = 32,
    lam: float = 1.0,
    min_child: float = 5.0,
) -> np.ndarray:
    """Train on (X_tr, y_tr), return raw margin scores for X_va."""
    p0 = min(max(float(y_tr.mean()), 1e-6), 1 - 1e-6)
    f0 = float(np.log(p0 / (1 - p0)))
    cand, binned, n_bins_per_f = _make_bins(X_tr, n_bins)
    all_idx = np.arange(len(y_tr))
    pred_tr = np.full(len(y_tr), f0)
    pred_va = np.full(len(X_va), f0)
    for _ in range(n_rounds):
        p = _sigmoid(pred_tr)
        g = p - y_tr
        h = p * (1 - p)
        tree = _fit_tree(X_tr, binned, g, h, all_idx, n_bins_per_f, cand, max_depth, lam, min_child)
        delta_tr = np.zeros(len(y_tr))
        _predict_tree(tree, X_tr, delta_tr, all_idx)
        pred_tr += learning_rate * delta_tr
        delta_va = np.zeros(len(X_va))
        _predict_tree(tree, X_va, delta_va, np.arange(len(X_va)))
        pred_va += learning_rate * delta_va
    return pred_va


class GBTRegressor:
    """Histogram GBDT with squared loss — the L2 objective gives g = pred − y,
    h = 1, so the Newton leaf step is exactly the regularized mean residual.
    Same split machinery as the classifier above (the reference's DLE trains
    LightGBM *regressors* on per-row losses, dle.py:436-447). Deterministic;
    plain-numpy nodes, picklable for Spark broadcast; `state()` round-trips
    through JSON for the fitted-state store."""

    def __init__(
        self,
        n_rounds: int = 60,
        learning_rate: float = 0.15,
        max_depth: int = 4,
        n_bins: int = 32,
        lam: float = 1.0,
        min_child: float = 5.0,
    ):
        self.n_rounds = n_rounds
        self.learning_rate = learning_rate
        self.max_depth = max_depth
        self.n_bins = n_bins
        self.lam = lam
        self.min_child = min_child
        self.f0 = 0.0
        self.trees: List[_Node] = []

    def fit(self, X: np.ndarray, y: np.ndarray) -> "GBTRegressor":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self.f0 = float(y.mean()) if len(y) else 0.0
        cand, binned, n_bins_per_f = _make_bins(X, self.n_bins)
        all_idx = np.arange(len(y))
        pred = np.full(len(y), self.f0)
        h = np.ones(len(y))
        self.trees = []
        for _ in range(self.n_rounds):
            g = pred - y
            tree = _fit_tree(X, binned, g, h, all_idx, n_bins_per_f, cand, self.max_depth, self.lam, self.min_child)
            delta = np.zeros(len(y))
            _predict_tree(tree, X, delta, all_idx)
            pred += self.learning_rate * delta
            self.trees.append(tree)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        out = np.full(len(X), self.f0)
        idx = np.arange(len(X))
        delta = np.zeros(len(X))
        for tree in self.trees:
            delta[:] = 0.0
            _predict_tree(tree, X, delta, idx)
            out += self.learning_rate * delta
        return out

    # -- JSON-safe state (preorder-flattened trees) ---------------------
    def state(self) -> dict:
        def flat(node: _Node, acc: list) -> int:
            i = len(acc)
            acc.append(None)
            if node.feature is None:
                acc[i] = [-1, node.value, -1, -1]
            else:
                acc[i] = [node.feature, node.threshold, -1, -1]
                acc[i][2] = flat(node.left, acc)
                acc[i][3] = flat(node.right, acc)
            return i

        trees = []
        for t in self.trees:
            acc: list = []
            flat(t, acc)
            trees.append(acc)
        return {"f0": self.f0, "learning_rate": self.learning_rate, "trees": trees}

    @classmethod
    def from_state(cls, st: dict) -> "GBTRegressor":
        def unflat(acc: list, i: int) -> _Node:
            f, thr_or_val, li, ri = acc[i]
            if f == -1:
                return _Node(thr_or_val)
            n = _Node()
            n.feature, n.threshold = int(f), float(thr_or_val)
            n.left, n.right = unflat(acc, li), unflat(acc, ri)
            return n

        m = cls(learning_rate=float(st["learning_rate"]))
        m.f0 = float(st["f0"])
        m.trees = [unflat(acc, 0) for acc in st["trees"]]
        return m


def auc_from_scores(y: np.ndarray, s: np.ndarray) -> float:
    """Mann-Whitney AUC with average ranks for ties."""
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s))
    ss = s[order]
    i, r = 0, 1
    while i < len(s):
        j = i
        while j + 1 < len(s) and ss[j + 1] == ss[i]:
            j += 1
        ranks[order[i : j + 1]] = (2 * r + (j - i)) / 2
        r += j - i + 1
        i = j + 1
    n1 = y.sum()
    n0 = len(y) - n1
    if n1 == 0 or n0 == 0:
        return 0.5
    return float((ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0))


def gbdt_cv_auc(X: np.ndarray, y: np.ndarray, folds: int = 5, seed: int = 16, **kw) -> float:
    """Stratified k-fold CV AUROC of the numpy GBDT (mirrors the reference's
    cross-validated LightGBM AUROC, calculator.py:420-424)."""
    rng = np.random.default_rng(seed)
    idx_pos = rng.permutation(np.where(y == 1)[0])
    idx_neg = rng.permutation(np.where(y == 0)[0])
    scores = np.zeros(len(y))
    got = np.zeros(len(y), dtype=bool)
    for f in range(folds):
        test = np.concatenate([idx_pos[f::folds], idx_neg[f::folds]])
        train = np.setdiff1d(np.arange(len(y)), test)
        scores[test] = gbdt_train_scores(X[train], y[train], X[test], **kw)
        got[test] = True
    return auc_from_scores(y[got], scores[got])
