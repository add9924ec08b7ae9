"""Inter-column correlation drift (spark_validate/drift/correlation.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.chunking import SizeBasedChunker
from spark_validate.drift.correlation import CorrelationDriftCalculator


def _frame(rng, n, rho, start=0):
    """Bivariate normal-ish integers with target correlation rho (plus noise
    columns), values kept integral so the decimal sums are exact."""
    x = rng.integers(0, 1000, size=n).astype(float)
    noise = rng.integers(0, 1000, size=n).astype(float)
    y = rho * x + (1 - abs(rho)) * noise
    return pd.DataFrame(
        {"ord": range(start, start + n), "x": x, "y": np.round(y, 3), "z": noise}
    )


def test_corr_matches_numpy_pairwise(spark):
    rng = np.random.default_rng(11)
    ref = _frame(rng, 500, 0.9)
    ana = pd.concat(
        [_frame(rng, 250, 0.9, start=0), _frame(rng, 250, -0.9, start=250)],
        ignore_index=True,
    )
    ana["ord"] = range(len(ana))
    calc = CorrelationDriftCalculator(
        ["x", "y", "z"], chunker=SizeBasedChunker(chunk_size=250, order_by=["ord"])
    ).fit(spark.createDataFrame(ref))

    # fitted reference correlations match numpy
    for (a, b) in [("x", "y"), ("x", "z"), ("y", "z")]:
        want = np.corrcoef(ref[a], ref[b])[0, 1]
        assert calc._ref[f"{a}+{b}"] == pytest.approx(want, abs=1e-9)

    res = calc.calculate(spark.createDataFrame(ana)).toPandas()
    corr = res[res["method"] == "pearson_corr"].set_index(["chunk_index", "column_name"])
    for ci, chunk in enumerate([ana.iloc[:250], ana.iloc[250:]]):
        for (a, b) in [("x", "y"), ("x", "z"), ("y", "z")]:
            want = np.corrcoef(chunk[a], chunk[b])[0, 1]
            assert corr.loc[(ci, f"{a}+{b}"), "value"] == pytest.approx(want, abs=1e-9)

    # the flipped-sign chunk alerts on x+y, the stable chunk does not
    shift = res[res["method"] == "corr_shift"].set_index(["chunk_index", "column_name"])
    assert shift.loc[(0, "x+y"), "value"] < 0.25 and not shift.loc[(0, "x+y"), "alert"]
    assert shift.loc[(1, "x+y"), "value"] > 1.0 and shift.loc[(1, "x+y"), "alert"]
    # informational corr rows never carry thresholds or alerts
    assert corr["upper_threshold"].isna().all() and not corr["alert"].any()


def test_pairwise_complete_null_semantics(spark):
    """A NULL in one column removes the row only from that column's pairs —
    R's use='pairwise.complete.obs'."""
    pdf = pd.DataFrame(
        {
            "ord": range(12),
            "x": [1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12],
            "y": [2.0, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24],
            "z": [5.0, 1, 4, 2, 8, 6, 3, 7, 9, 0, 2, 5],
        }
    )
    ana = pdf.copy()
    ana.loc[[2, 5], "y"] = np.nan  # kills (x,y) and (y,z) rows, not (x,z)
    calc = CorrelationDriftCalculator(
        ["x", "y", "z"], chunker=SizeBasedChunker(chunk_size=12, order_by=["ord"])
    ).fit(spark.createDataFrame(pdf))
    res = calc.calculate(spark.createDataFrame(ana)).toPandas()
    corr = res[res["method"] == "pearson_corr"].set_index("column_name")["value"]
    ok = ana.dropna(subset=["y"])
    assert corr["x+y"] == pytest.approx(np.corrcoef(ok.x, ok.y)[0, 1], abs=1e-9)
    assert corr["y+z"] == pytest.approx(np.corrcoef(ok.y, ok.z)[0, 1], abs=1e-9)
    assert corr["x+z"] == pytest.approx(np.corrcoef(ana.x, ana.z)[0, 1], abs=1e-9)


def test_degenerate_chunk_and_reference(spark):
    """Constant-in-chunk → NULL corr/shift (no fabricated 0); a pair
    degenerate in the REFERENCE has no fitted value → NULL shift, no alert."""
    ref = pd.DataFrame(
        {"ord": range(10), "x": range(10), "y": range(10), "c": [7.0] * 10}
    )
    ana = pd.DataFrame(
        {
            "ord": range(10),
            "x": [1.0] * 5 + list(range(5)),  # first chunk: x constant
            "y": range(10),
            "c": range(10),  # c now varies, but the fit saw a constant
        }
    )
    calc = CorrelationDriftCalculator(
        ["x", "y", "c"], chunker=SizeBasedChunker(chunk_size=5, order_by=["ord"])
    ).fit(spark.createDataFrame(ref))
    assert calc._ref["x+c"] is None and calc._ref["y+c"] is None
    res = calc.calculate(spark.createDataFrame(ana)).toPandas()
    idx = res.set_index(["chunk_index", "column_name", "method"])
    assert np.isnan(idx.loc[(0, "x+y", "pearson_corr"), "value"])
    assert np.isnan(idx.loc[(0, "x+y", "corr_shift"), "value"])
    assert not idx.loc[(0, "x+y", "corr_shift"), "alert"]
    # chunk 1: x varies again, corr defined, shift vs fitted 1.0 tiny
    assert idx.loc[(1, "x+y", "corr_shift"), "value"] == pytest.approx(0.0, abs=1e-9)
    # degenerate-reference pair: shift NULL everywhere, alert false
    assert res[(res.column_name == "x+c") & (res.method == "corr_shift")]["value"].isna().all()
    assert not res[res.column_name == "x+c"]["alert"].any()


def test_state_roundtrip_and_validation(spark):
    ref = pd.DataFrame({"ord": range(20), "x": range(20), "y": [v * 2 for v in range(20)]})
    calc = CorrelationDriftCalculator(
        ["x", "y"], chunker=SizeBasedChunker(chunk_size=10, order_by=["ord"])
    ).fit(spark.createDataFrame(ref))
    st = calc.get_state()
    clone = CorrelationDriftCalculator(
        ["x", "y"], chunker=SizeBasedChunker(chunk_size=10, order_by=["ord"])
    ).set_state(st)
    a = calc.calculate(spark.createDataFrame(ref)).toPandas()
    b = clone.calculate(spark.createDataFrame(ref)).toPandas()
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(KeyError):
        CorrelationDriftCalculator(["x", "z"]).set_state(st)  # stale pair set
    with pytest.raises(ValueError):
        CorrelationDriftCalculator(["x"])
    with pytest.raises(ValueError):
        CorrelationDriftCalculator(pairs=[("x", "x")])
    with pytest.raises(ValueError):
        CorrelationDriftCalculator(["x", "y"], pairs=[("x", "y")])


def test_runner_kind_fused_equals_standalone(spark, tmp_path):
    from spark_validate.runner import run_suite

    n = 600
    idx = np.arange(n)
    pdf = pd.DataFrame({"ord": idx, "x": (idx * 7 % 101).astype(float)})
    pdf["y"] = pdf.x * 2 + (idx % 13)
    ana = pdf.copy()
    flip = idx >= 400  # last chunk: relationship inverts
    ana.loc[flip, "y"] = -2 * ana.loc[flip, "x"] + (idx[flip] % 13)
    refp, anap = str(tmp_path / "ref.parquet"), str(tmp_path / "ana.parquet")
    spark.createDataFrame(pdf).write.parquet(refp)
    spark.createDataFrame(ana).write.parquet(anap)
    cfg = {
        "run_id": "corr",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": refp,
        "analysis": anap,
        "chunking": {"chunk_size": 200, "order_by": ["ord"]},
        "checks": [
            {"type": "correlation_drift", "columns": ["x", "y"]},
            {"type": "range", "columns": ["x"]},  # second check forces fusion
        ],
    }
    report = run_suite(spark, cfg)
    key = [k for k in report if k.startswith("correlation_drift")][0]
    assert report[key]["alerts"] == 1
    res = spark.read.parquet(str(tmp_path / "out" / "results")).toPandas()
    fused = res[res["method"].isin(["pearson_corr", "corr_shift"])].sort_values(
        ["chunk_key", "method"]
    )
    standalone = (
        CorrelationDriftCalculator(
            ["x", "y"], chunker=SizeBasedChunker(chunk_size=200, order_by=["ord"])
        )
        .fit(spark.read.parquet(refp))
        .calculate(spark.read.parquet(anap))
        .toPandas()
        .sort_values(["chunk_key", "method"])
    )
    np.testing.assert_allclose(
        fused["value"].to_numpy(dtype=float), standalone["value"].to_numpy(dtype=float)
    )
    assert fused["alert"].tolist() == standalone["alert"].tolist()
    # second run loads fitted correlations from the store
    report2 = run_suite(spark, {**cfg, "run_id": "corr"})
    assert report2[key]["fitted_from_store"] is True


def test_plan_shape(spark):
    """One codegen aggregate, no Python workers, no joins beyond the
    broadcast header attach."""
    from tests.test_plans import plan_str

    pdf = pd.DataFrame({"ord": range(50), "x": range(50), "y": [v * 3 % 7 for v in range(50)]})
    df = spark.createDataFrame(pdf)
    calc = CorrelationDriftCalculator(
        ["x", "y"], chunker=SizeBasedChunker(chunk_size=25, order_by=["ord"])
    ).fit(df)
    plan = plan_str(calc.calculate(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_null_indicator_mode_missingness_pattern_drift(spark):
    """null_indicators=True correlates IS-NULL flags: fields that go missing
    TOGETHER in reference but independently in analysis shift the null-corr
    even though each column's missing RATE is unchanged."""
    n = 400
    rng = np.random.default_rng(5)
    joint = rng.random(n) < 0.3  # reference: x,y null together (corr 1)
    ref = pd.DataFrame(
        {
            "ord": range(n),
            "x": np.where(joint, np.nan, rng.random(n)),
            "y": np.where(joint, np.nan, rng.random(n)),
        }
    )
    mx = rng.random(n) < 0.3  # analysis: independent nulls, SAME rates
    my = rng.random(n) < 0.3
    ana = pd.DataFrame(
        {
            "ord": range(n),
            "x": np.where(mx, np.nan, rng.random(n)),
            "y": np.where(my, np.nan, rng.random(n)),
        }
    )
    calc = CorrelationDriftCalculator(
        ["x", "y"],
        chunker=SizeBasedChunker(chunk_size=n, order_by=["ord"]),
        null_indicators=True,
    ).fit(spark.createDataFrame(ref))
    assert calc._ref["x+y"] == pytest.approx(1.0, abs=1e-9)
    res = calc.calculate(spark.createDataFrame(ana)).toPandas()
    m = res.set_index("method")
    want = np.corrcoef(mx.astype(float), my.astype(float))[0, 1]
    assert m.loc["null_corr", "value"] == pytest.approx(want, abs=1e-9)
    assert m.loc["null_corr_shift", "value"] > 0.8 and m.loc["null_corr_shift", "alert"]
    # per-column missing RATES are ~equal across periods — the rate check
    # alone could not have seen this
    assert abs(ref.x.isna().mean() - ana.x.isna().mean()) < 0.07

    # mode-mismatched stored state must force a refit, not score silently
    st = calc.get_state()
    with pytest.raises(ValueError):
        CorrelationDriftCalculator(["x", "y"], null_indicators=False).set_state(st)
