"""Column-stats calculator tests vs pandas/numpy oracles (NannyML formulas)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.calculators import (
    ColumnStatsCalculator,
    MissingValuesCalculator,
    SummaryStatsAvgCalculator,
    SummaryStatsMedianCalculator,
    SummaryStatsStdCalculator,
)
from spark_validate.chunking import SizeBasedChunker
from spark_validate.thresholds import StandardDeviationThreshold


@pytest.fixture(scope="module")
def drift_frame(spark):
    """Deterministic frame: 4000 ref rows + 2000 analysis rows, NaNs injected."""
    rng = np.random.default_rng(42)
    n_ref, n_ana = 4000, 2000
    x = np.concatenate([rng.normal(0, 1, n_ref), rng.normal(0.6, 1, n_ana)])
    y = rng.uniform(0, 1, n_ref + n_ana)
    x[rng.choice(n_ref + n_ana, 300, replace=False)] = np.nan
    pdf = pd.DataFrame({"id": np.arange(n_ref + n_ana), "x": x, "y": y})
    pdf["is_ref"] = pdf["id"] < n_ref
    return spark.createDataFrame(pdf), pdf


def _chunk_values(pdf, col, size=500, fn=None):
    out = []
    for i in range(0, len(pdf), size):
        chunk = pdf.iloc[i : i + size]
        out.append(fn(chunk[col]))
    return out


def test_missing_rate_matches_pandas(spark, drift_frame):
    sdf, pdf = drift_frame
    ref = sdf.filter("is_ref")
    ana = sdf.filter("NOT is_ref")
    calc = MissingValuesCalculator(
        ["x"], chunker=SizeBasedChunker(chunk_size=500, order_by=["id"])
    ).fit(ref)
    res = calc.calculate(ana).orderBy("chunk_index").toPandas()
    expected = _chunk_values(pdf[~pdf.is_ref], "x", 500, lambda s: s.isna().mean())
    assert np.allclose(res["value"].to_numpy(), expected)
    # sampling error: sqrt(p(1-p))/sqrt(n) with p = reference missing rate
    p = pdf[pdf.is_ref]["x"].isna().mean()
    assert np.allclose(res["sampling_error"].to_numpy(), math.sqrt(p * (1 - p)) / math.sqrt(500))
    assert set(res["period"]) == {"analysis"}
    assert res["chunk_key"].iloc[0] == "[0:499]"


def test_avg_and_thresholds(spark, drift_frame):
    sdf, pdf = drift_frame
    ref, ana = sdf.filter("is_ref"), sdf.filter("NOT is_ref")
    calc = SummaryStatsAvgCalculator(["x"], chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]))
    calc.fit(ref)
    res = calc.calculate(ana).orderBy("chunk_index").toPandas()
    expected = _chunk_values(pdf[~pdf.is_ref], "x", 500, lambda s: s.mean())
    assert np.allclose(res["value"].to_numpy(), expected)
    # thresholds = mean ± 3·std_pop over reference per-chunk means
    ref_means = np.array(_chunk_values(pdf[pdf.is_ref], "x", 500, lambda s: s.mean()))
    lo = ref_means.mean() - 3 * ref_means.std()
    up = ref_means.mean() + 3 * ref_means.std()
    assert np.allclose(res["lower_threshold"].iloc[0], lo)
    assert np.allclose(res["upper_threshold"].iloc[0], up)
    # analysis mean shifted by +0.6 → all chunks alert high
    assert res["alert"].all()
    # reference result: no alerts expected
    ref_res = calc.reference_result.toPandas()
    assert not ref_res["alert"].any()
    # SE = ref_std(ddof=1)/sqrt(n)
    ref_std = pdf[pdf.is_ref]["x"].std()
    n_nonnull = 500  # chunk size (NannyML uses chunk row count)
    assert np.allclose(res["sampling_error"].iloc[0], ref_std / math.sqrt(n_nonnull))


def test_std_sampling_error_formula(spark, drift_frame):
    sdf, pdf = drift_frame
    ref, ana = sdf.filter("is_ref"), sdf.filter("NOT is_ref")
    calc = SummaryStatsStdCalculator(["y"], chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]))
    calc.fit(ref)
    res = calc.calculate(ana).orderBy("chunk_index").toPandas()
    expected = _chunk_values(pdf[~pdf.is_ref], "y", 500, lambda s: s.std())
    assert np.allclose(res["value"].to_numpy(), expected)
    # delta-method SE (nannyml/sampling_error/summary_stats.py:35-66)
    refy = pdf[pdf.is_ref]["y"]
    _std = refy.std()
    _mu4 = ((refy - refy.mean()) ** 4).mean()
    n = 500.0
    paren = _mu4 - (n - 3) * _std**4 / (n - 1)
    se = (1 / (2 * _std)) * math.sqrt(paren / n)
    assert np.allclose(res["sampling_error"].iloc[0], se)


def test_median_matches_pandas(spark, drift_frame):
    sdf, pdf = drift_frame
    ref, ana = sdf.filter("is_ref"), sdf.filter("NOT is_ref")
    calc = SummaryStatsMedianCalculator(["y"], chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]))
    calc.fit(ref)
    res = calc.calculate(ana).orderBy("chunk_index").toPandas()
    expected = _chunk_values(pdf[~pdf.is_ref], "y", 500, lambda s: s.median())
    assert np.allclose(res["value"].to_numpy(), expected)
    assert res["sampling_error"].notna().all()


def test_multi_metric_single_pass(spark, drift_frame):
    sdf, pdf = drift_frame
    ref, ana = sdf.filter("is_ref"), sdf.filter("NOT is_ref")
    calc = ColumnStatsCalculator(
        ["x", "y"],
        metrics=("avg", "sum", "min", "max", "count", "missing_rate"),
        chunker=SizeBasedChunker(chunk_size=1000, order_by=["id"]),
    ).fit(ref)
    res = calc.calculate(ana).toPandas()
    # 2 chunks × 2 columns × 6 metrics
    assert len(res) == 2 * 2 * 6
    pivot = res.set_index(["chunk_key", "column_name", "method"])["value"]
    a0 = pdf[~pdf.is_ref].iloc[:1000]
    assert np.isclose(pivot[("[0:999]", "x", "sum")], a0["x"].sum())
    assert np.isclose(pivot[("[0:999]", "x", "min")], a0["x"].min())
    assert np.isclose(pivot[("[0:999]", "y", "max")], a0["y"].max())
    assert np.isclose(pivot[("[0:999]", "x", "count")], a0["x"].notna().sum())


def test_empty_chunk_value_is_null(spark):
    # all-NaN chunk → NULL value, no alert (methods.py:293-294 analog)
    pdf = pd.DataFrame({"id": range(40), "x": [1.0] * 20 + [np.nan] * 20})
    sdf = spark.createDataFrame(pdf)
    calc = SummaryStatsAvgCalculator(["x"], chunker=SizeBasedChunker(chunk_size=20, order_by=["id"]))
    calc.fit(sdf)
    res = calc.calculate(sdf).orderBy("chunk_index").toPandas()
    assert np.isclose(res["value"].iloc[0], 1.0)
    assert pd.isna(res["value"].iloc[1])
    assert not res["alert"].iloc[1]
