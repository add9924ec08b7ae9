"""Probability calibration (reference `nannyml/calibration.py`).

scipy/sklearn are unavailable here, so isotonic regression is implemented
directly: pool-adjacent-violators on tie-averaged points, then linear
interpolation with clipped extrapolation — the same behavior as sklearn's
``IsotonicRegression(out_of_bounds='clip', increasing=True)`` that the
reference uses (`calibration.py:120-149`).

``needs_calibration`` (`calibration.py:226-327`): stratified shuffle-split
cross-validation comparing Expected Calibration Error before/after
calibration, with the reference's early exits (single class, AUROC > 0.999).
Split indices come from a seeded numpy generator — fold membership differs
from sklearn's StratifiedShuffleSplit but the decision procedure is the same.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np


def pava(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators: weighted isotonic (non-decreasing) fit."""
    y = y.astype(np.float64).copy()
    w = w.astype(np.float64).copy()
    n = len(y)
    # block representation: value, weight, count
    vals: List[float] = []
    wts: List[float] = []
    cnts: List[int] = []
    for i in range(n):
        vals.append(y[i])
        wts.append(w[i])
        cnts.append(1)
        while len(vals) > 1 and vals[-2] > vals[-1]:
            v = (vals[-2] * wts[-2] + vals[-1] * wts[-1]) / (wts[-2] + wts[-1])
            wt = wts[-2] + wts[-1]
            ct = cnts[-2] + cnts[-1]
            vals = vals[:-2] + [v]
            wts = wts[:-2] + [wt]
            cnts = cnts[:-2] + [ct]
    out = np.empty(n)
    pos = 0
    for v, ct in zip(vals, cnts):
        out[pos : pos + ct] = v
        pos += ct
    return out


class IsotonicCalibrator:
    """Isotonic probability calibrator with clip extrapolation."""

    def __init__(self):
        self._x: np.ndarray = np.array([])
        self._y: np.ndarray = np.array([])

    def fit(self, y_pred_proba: np.ndarray, y_true: np.ndarray) -> "IsotonicCalibrator":
        x = np.asarray(y_pred_proba, dtype=np.float64)
        y = np.asarray(y_true, dtype=np.float64)
        order = np.argsort(x, kind="mergesort")
        x, y = x[order], y[order]
        # average ties so x is strictly increasing (sklearn's make_unique)
        ux, inv, counts = np.unique(x, return_inverse=True, return_counts=True)
        uy = np.bincount(inv, weights=y) / counts
        fitted = pava(uy, counts.astype(np.float64))
        self._x, self._y = ux, fitted
        return self

    def calibrate(self, y_pred_proba: np.ndarray) -> np.ndarray:
        if len(self._x) == 0:
            raise RuntimeError("fit first")
        return np.interp(np.asarray(y_pred_proba, dtype=np.float64), self._x, self._y)

    # state for the JSON store / broadcast into UDFs
    def get_state(self) -> dict:
        return {"x": self._x.tolist(), "y": self._y.tolist()}

    def set_state(self, state: dict) -> "IsotonicCalibrator":
        self._x = np.asarray(state["x"], dtype=np.float64)
        self._y = np.asarray(state["y"], dtype=np.float64)
        return self


class NoopCalibrator:
    def fit(self, y_pred_proba, y_true):
        return self

    def calibrate(self, y_pred_proba):
        return np.asarray(y_pred_proba, dtype=np.float64)

    def get_state(self) -> dict:
        return {"noop": True}

    def set_state(self, state: dict):
        return self


def _bin_index_edges(n: int, bin_count: int) -> List[Tuple[int, int]]:
    """Equal-count index bin edges (`calibration.py:164-190`)."""
    bin_width = n // bin_count
    return [
        (i * bin_width, (i + 1) * bin_width if i < bin_count - 1 else n)
        for i in range(bin_count)
    ]


def expected_calibration_error(y_true: np.ndarray, y_pred_proba: np.ndarray, bin_count: int = 10) -> float:
    """ECE over equal-count score bins (`calibration.py:193-223`)."""
    order = np.argsort(y_pred_proba)
    y = np.asarray(y_true, dtype=np.float64)[order]
    p = np.asarray(y_pred_proba, dtype=np.float64)[order]
    n = len(p)
    ece = 0.0
    for lo, hi in _bin_index_edges(n, bin_count):
        if hi <= lo:
            continue
        conf = p[lo:hi].mean()
        acc = y[lo:hi].mean()
        ece += (hi - lo) / n * abs(acc - conf)
    return ece


def _auc(y: np.ndarray, s: np.ndarray) -> float:
    order = np.argsort(s, kind="mergesort")
    ss = s[order]
    ranks = np.empty(len(s))
    i = 0
    r = 1
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
        return float("nan")
    return float((ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0))


def needs_calibration(
    y_true: np.ndarray,
    y_pred_proba: np.ndarray,
    bin_count: int = 10,
    split_count: int = 10,
    seed: int = 42,
) -> bool:
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred_proba = np.asarray(y_pred_proba, dtype=np.float64)
    if len(np.unique(y_true)) == 1:
        return False
    if _auc(y_true, y_pred_proba) > 0.999:
        return False
    rng = np.random.default_rng(seed)
    n = len(y_true)
    test_size = max(int(0.1 * n), 1)
    ys, ps, cs = [], [], []
    pos_idx = np.where(y_true == 1)[0]
    neg_idx = np.where(y_true != 1)[0]
    for _ in range(split_count):
        # stratified test split
        t_pos = rng.choice(pos_idx, max(int(round(test_size * len(pos_idx) / n)), 1), replace=False)
        t_neg = rng.choice(neg_idx, max(int(round(test_size * len(neg_idx) / n)), 1), replace=False)
        test = np.concatenate([t_pos, t_neg])
        train = np.setdiff1d(np.arange(n), test)
        cal = IsotonicCalibrator().fit(y_pred_proba[train], y_true[train])
        ys.append(y_true[test])
        ps.append(y_pred_proba[test])
        cs.append(cal.calibrate(y_pred_proba[test]))
    yv, pv, cv = np.concatenate(ys), np.concatenate(ps), np.concatenate(cs)
    return expected_calibration_error(yv, pv, bin_count) > expected_calibration_error(yv, cv, bin_count)
