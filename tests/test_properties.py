"""Property-based tests (hypothesis) for the pure-python/numpy kernels.

These cover the math the Spark expressions are built on, across arbitrary
inputs rather than fixtures: chunk-key arithmetic, PAVA isotonic invariants,
exact KS/Wasserstein kernels vs their definitions, and MinHash's Jaccard
estimator. Spark-side equivalents are pinned by the DuckDB oracles; these
pin the kernels themselves.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_validate.calibration import pava
from spark_validate.functions.gbt import auc_from_scores
from spark_validate.functions.mathstats import ks_stat_2samp, wasserstein_1d


# ---- SizeBasedChunker key arithmetic (mirrors chunking.py::SizeBasedChunker.assign)


def _chunk_keys(n: int, size: int, incomplete: str):
    """Driver-side replica of the chunk-key assignment for n rows."""
    n_full = n // size
    rem = n % size
    keys = []
    for idx in range(n):
        cid = idx // size
        if rem != 0 and incomplete == "drop" and idx >= n_full * size:
            continue
        if rem != 0 and incomplete == "append" and n_full > 0:
            cid = min(cid, n_full - 1)
        keys.append(cid)
    return keys, n_full, rem


@given(
    n=st.integers(1, 5000),
    size=st.integers(1, 600),
    incomplete=st.sampled_from(["keep", "append", "drop"]),
)
@settings(max_examples=200, deadline=None)
def test_size_chunk_assignment_invariants(n, size, incomplete):
    keys, n_full, rem = _chunk_keys(n, size, incomplete)
    if incomplete == "drop":
        assert len(keys) == n_full * size
    else:
        assert len(keys) == n
    if not keys:
        return
    # contiguous, non-decreasing, starting at 0
    assert keys[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(keys, keys[1:]))
    counts = np.bincount(keys)
    if incomplete == "keep":
        assert all(c == size for c in counts[:-1])
        assert counts[-1] == (rem or size)
    elif incomplete == "drop":
        assert all(c == size for c in counts)
    else:  # append
        if n_full > 0:
            assert all(c == size for c in counts[:-1])
            assert counts[-1] == size + rem if rem else counts[-1] == size


# ---- PAVA isotonic regression


@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=200),
    st.lists(st.floats(0.01, 100, allow_nan=False), min_size=1, max_size=200),
)
@settings(max_examples=200, deadline=None)
def test_pava_monotone_and_weighted_mean_preserving(ys, ws):
    k = min(len(ys), len(ws))
    y = np.asarray(ys[:k])
    w = np.asarray(ws[:k])
    out = pava(y, w)
    assert (np.diff(out) >= -1e-8).all()
    # weighted mean preserved
    assert np.isclose((out * w).sum(), (y * w).sum(), rtol=1e-9, atol=1e-6)
    # idempotent: already-isotonic input is unchanged
    out2 = pava(out, w)
    np.testing.assert_allclose(out2, out, rtol=1e-12, atol=1e-9)


# ---- exact KS / Wasserstein kernels vs definitions


@given(
    st.lists(st.floats(-100, 100, allow_nan=False), min_size=2, max_size=150),
    st.lists(st.floats(-100, 100, allow_nan=False), min_size=2, max_size=150),
)
@settings(max_examples=150, deadline=None)
def test_ks_kernel_matches_definition(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    got = ks_stat_2samp(a, b)
    # definition: sup over all observed points of |ECDF_a - ECDF_b|
    pts = np.concatenate([a, b])
    ecdf_a = np.searchsorted(np.sort(a), pts, side="right") / len(a)
    ecdf_b = np.searchsorted(np.sort(b), pts, side="right") / len(b)
    want = np.max(np.abs(ecdf_a - ecdf_b))
    assert np.isclose(got, want, atol=1e-12)
    assert 0.0 <= got <= 1.0


@given(
    st.lists(st.floats(-100, 100, allow_nan=False), min_size=2, max_size=120),
    st.lists(st.floats(-100, 100, allow_nan=False), min_size=2, max_size=120),
)
@settings(max_examples=150, deadline=None)
def test_wasserstein_kernel_properties(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    got = wasserstein_1d(a, b)
    assert got >= -1e-12
    # symmetry and identity
    assert np.isclose(got, wasserstein_1d(b, a), atol=1e-9)
    assert np.isclose(wasserstein_1d(a, a), 0.0, atol=1e-12)
    # translation: W(a + c, b + c) == W(a, b)
    assert np.isclose(wasserstein_1d(a + 5.0, b + 5.0), got, atol=1e-8)


# ---- Mann-Whitney AUC


@given(st.lists(st.tuples(st.booleans(), st.floats(-10, 10, allow_nan=False)), min_size=4, max_size=200))
@settings(max_examples=150, deadline=None)
def test_auc_bounds_and_complement(pairs):
    y = np.array([1.0 if t else 0.0 for t, _ in pairs])
    s = np.array([v for _, v in pairs])
    if y.sum() == 0 or y.sum() == len(y):
        assert auc_from_scores(y, s) == 0.5
        return
    auc = auc_from_scores(y, s)
    assert 0.0 <= auc <= 1.0
    # flipping scores complements the AUC
    assert np.isclose(auc_from_scores(y, -s), 1.0 - auc, atol=1e-12)
