"""Pure-numpy statistical kernels vs golden values and properties.

Golden values match the reference's scipy results (scipy unavailable here;
values pinned from the scipy documentation examples and the NannyML unit
fixtures in tests/drift/test_univariate_drift_methods.py).
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_validate.functions.mathstats import (
    chi2_sf,
    chi2_stat_2xk,
    gaussian_kde_at,
    hellinger_from_probs,
    js_distance_from_probs,
    ks_stat_2samp,
    l_infinity_from_probs,
    psi_from_probs,
    wasserstein_1d,
)


def test_js_identical_is_zero():
    assert js_distance_from_probs([0.25, 0.25, 0.5], [0.25, 0.25, 0.5]) == 0.0


def test_js_disjoint_is_one():
    # disjoint supports → JS distance (base 2) = 1
    assert np.isclose(js_distance_from_probs([1.0, 0.0], [0.0, 1.0], base=2), 1.0)


def test_js_scipy_doc_example():
    # scipy.spatial.distance.jensenshannon([1,0,0],[0,1,0], 2.0) == 1.0
    assert np.isclose(js_distance_from_probs([1, 0, 0], [0, 1, 0], 2.0), 1.0)
    # jensenshannon([1.0, 0.0], [0.5, 0.5], base=2) ≈ 0.5579230452841438
    v = js_distance_from_probs([1.0, 0.0], [0.5, 0.5], base=2.0)
    assert np.isclose(v, 0.5579230452841438)
    # hand-checked base-e value: sqrt(0.5*(ln(4/3) + 0.5*ln(2/3) + 0.5*ln 2))
    ve = js_distance_from_probs([1.0, 0.0], [0.5, 0.5], base=math.e)
    assert np.isclose(ve, math.sqrt(0.5 * (math.log(4 / 3) + 0.5 * math.log(2 / 3) + 0.5 * math.log(2))))


def test_nannyml_js_categorical_golden():
    # NannyML fixture (tests/drift/test_univariate_drift_methods.py:53-60):
    # ref = choice(a,b,c,d) uniform-ish 10k, ana = choice(a,b,c,e) → JS ≈ 0.5
    rng = np.random.RandomState(1)
    ref = rng.choice(["a", "b", "c", "d"], 10_000)
    ana = rng.choice(["a", "b", "c", "e"], 1_000)
    cats = sorted(set(ref))
    ref_p = np.array([np.mean(ref == c) for c in cats])
    ana_p = np.array([np.mean(ana == c) for c in cats])
    leftover = 1 - ana_p.sum()
    p = np.append(ref_p, 0.0)
    q = np.append(ana_p, leftover)
    assert round(js_distance_from_probs(p, q, 2.0), 2) == 0.50


def test_hellinger_golden():
    # identical → 0; disjoint → 1
    assert hellinger_from_probs([0.5, 0.5], [0.5, 0.5]) == 0.0
    assert np.isclose(hellinger_from_probs([1, 0], [0, 1]), 1.0)


def test_l_infinity():
    assert np.isclose(l_infinity_from_probs([0.2, 0.8], [0.5, 0.5]), 0.3)


def test_psi_symmetric_zero():
    assert np.isclose(psi_from_probs([0.5, 0.5], [0.5, 0.5]), 0.0)
    assert psi_from_probs([0.9, 0.1], [0.1, 0.9]) > 0


def test_chi2_sf_golden():
    # known: P(X > 3.841) for df=1 ≈ 0.05; P(X > 5.991) df=2 ≈ 0.05
    assert np.isclose(chi2_sf(3.841458820694124, 1), 0.05, atol=1e-9)
    assert np.isclose(chi2_sf(5.991464547107979, 2), 0.05, atol=1e-9)
    assert np.isclose(chi2_sf(0.0, 5), 1.0)
    # large x → 0
    assert chi2_sf(1e4, 3) < 1e-12


def test_chi2_stat_2x2_matches_hand_calc():
    # scipy.stats.chi2_contingency([[10,20],[20,10]], correction=False) → 6.6667
    stat, dof = chi2_stat_2xk([10, 20], [20, 10])
    assert np.isclose(stat, 20 / 3)
    assert dof == 1


def test_kde_matches_normal_density():
    rng = np.random.RandomState(0)
    x = rng.normal(0, 1, 20_000)
    # density at 0 of N(0,1) is 1/sqrt(2π) ≈ 0.3989
    d = gaussian_kde_at(x, 0.0)[0]
    assert abs(d - 0.3989) < 0.02


def test_ks_stat_golden():
    a = [1, 2, 3, 4, 5]
    b = [6, 7, 8, 9, 10]
    assert np.isclose(ks_stat_2samp(a, b), 1.0)
    assert np.isclose(ks_stat_2samp(a, a), 0.0)


def test_wasserstein_shifted_normals():
    # W1(N(0,1), N(1,1)) = 1 analytically; NannyML golden ≈ 1.01 at these sizes
    rng = np.random.RandomState(1)
    a = rng.normal(0, 1, 10_000)
    b = rng.normal(1, 1, 1_000)
    assert abs(wasserstein_1d(a, b) - 1.0) < 0.1
    # translation invariance: W1(a, a+c) = |c|
    assert np.isclose(wasserstein_1d(a, a + 3.0), 3.0, atol=1e-9)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(min_value=0.01, max_value=10), min_size=2, max_size=12),
    st.lists(st.floats(min_value=0.01, max_value=10), min_size=2, max_size=12),
)
def test_js_properties(p, q):
    k = min(len(p), len(q))
    p, q = p[:k], q[:k]
    d = js_distance_from_probs(p, q, 2.0)
    assert 0.0 <= d <= 1.0 + 1e-12
    # symmetry
    assert np.isclose(d, js_distance_from_probs(q, p, 2.0))


@settings(max_examples=30, deadline=None)
@given(st.floats(min_value=0.001, max_value=200), st.integers(min_value=1, max_value=50))
def test_chi2_sf_monotone(x, df):
    v1 = chi2_sf(x, df)
    v2 = chi2_sf(x * 1.5, df)
    assert 0.0 <= v2 <= v1 <= 1.0
