"""Rankers + distribution calculators."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.calculators import SummaryStatsAvgCalculator
from spark_validate.chunking import SizeBasedChunker
from spark_validate.distribution import categorical_distribution, continuous_distribution
from spark_validate.rankers import CorrelationRanker, alert_count_rank


@pytest.fixture(scope="module")
def rk_frame(spark):
    rng = np.random.default_rng(8)
    n = 4000
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            # x drifts hard after row 2000, y stays flat
            "x": np.r_[rng.normal(0, 1, 2000), rng.normal(3, 1, 2000)],
            "y": rng.normal(0, 1, n),
            "cat": rng.choice(list("abcdefgh"), n),
        }
    )
    pdf["is_ref"] = pdf["id"] < 2000
    return spark.createDataFrame(pdf), pdf


def test_alert_count_ranker(spark, rk_frame):
    sdf, _ = rk_frame
    calc = SummaryStatsAvgCalculator(["x", "y"], chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]))
    calc.fit(sdf.filter("is_ref"))
    res = calc.calculate(sdf.filter("NOT is_ref"))
    ranked = alert_count_rank(res).toPandas()
    assert ranked["column_name"].iloc[0] == "x"  # drifted column ranks first
    assert ranked["rank"].tolist() == [1, 2]
    assert ranked[ranked.column_name == "x"]["n_alerts"].iloc[0] == 4
    only = alert_count_rank(res, only_drifting=True).toPandas()
    assert "x" in set(only["column_name"])
    assert (only["n_alerts"] > 0).all()


def test_correlation_ranker(spark, rk_frame):
    sdf, _ = rk_frame
    drift = SummaryStatsAvgCalculator(["x", "y"], chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]))
    drift.fit(sdf.filter("is_ref"))
    drift_res = drift.calculate(sdf.filter("NOT is_ref"))
    # use avg(x) itself as the 'performance' series — x's drift correlates 1.0
    perf = drift_res.filter(F.col("column_name") == "x")
    ranker = CorrelationRanker().fit(drift.reference_result.filter(F.col("column_name") == "x"), "avg")
    ranked = ranker.rank(drift_res, perf).toPandas()
    assert ranked["column_name"].iloc[0] == "x"
    assert ranked["pearsonr_correlation"].iloc[0] > 0.99
    # reference-parity columns (ranker.py:376-391)
    assert set(ranked.columns) >= {"pearsonr_correlation", "pearsonr_pvalue", "has_drifted"}
    assert ranked["pearsonr_pvalue"].iloc[0] < 0.05  # near-perfect corr
    assert ranked["has_drifted"].equals(ranked["n_alerts"] > 0)


def test_categorical_distribution(spark, rk_frame):
    sdf, pdf = rk_frame
    out = categorical_distribution(
        sdf, "cat", chunker=SizeBasedChunker(chunk_size=1000, order_by=["id"]), top_k=3
    ).toPandas()
    # 3 kept + Other per chunk
    per_chunk = out.groupby("chunk_key")["value"].nunique()
    assert (per_chunk == 4).all()
    assert np.allclose(out.groupby("chunk_key")["freq"].sum(), 1.0)
    # counts match pandas for one chunk
    keep = out[out.chunk_key == "[0:999]"].set_index("value")["cnt"]
    c = pdf.iloc[:1000]["cat"].value_counts()
    top3 = set(pdf["cat"].value_counts().index[:3])
    for v in top3:
        assert keep[v] == c[v]
    assert keep["Other"] == c[~c.index.isin(top3)].sum()


def test_continuous_distribution(spark, rk_frame):
    sdf, pdf = rk_frame
    out = continuous_distribution(
        sdf, "x", chunker=SizeBasedChunker(chunk_size=2000, order_by=["id"]), points=40
    ).toPandas()
    assert set(out.groupby("chunk_key").size()) == {40}
    # density integrates to ~1, cdf ends near 1
    for key, grp in out.groupby("chunk_key"):
        assert abs(grp["cdf"].iloc[-1] - 1.0) < 0.1
        assert (grp["density"] >= 0).all()


def test_pearsonr_pvalue_matches_numeric_integration():
    """The homegrown t-distribution SF (regularized incomplete beta) against
    a scipy-free numeric integration of the Student-t density."""
    import math

    import numpy as np

    from spark_validate.functions.mathstats import pearsonr_pvalue, t_sf_two_sided

    def t_sf_numeric(t, df):
        # integrate the t-density from |t| to a far cutoff (Simpson)
        c = math.exp(math.lgamma((df + 1) / 2) - math.lgamma(df / 2)) / math.sqrt(df * math.pi)
        # heavy tails at tiny df need a far cutoff (t-density ~ x^-(df+1))
        cutoff = abs(t) + (200.0 if df >= 5 else 20000.0)
        xs = np.linspace(abs(t), cutoff, 4_000_001)
        ys = c * (1 + xs * xs / df) ** (-(df + 1) / 2)
        from numpy import trapz

        return 2.0 * float(np.trapz(ys, xs))

    for r, n in [(0.5, 10), (-0.9, 5), (0.1, 100), (0.05, 1000), (0.8, 4)]:
        t = r * math.sqrt((n - 2) / (1 - r * r))
        want = t_sf_numeric(t, n - 2)
        got = pearsonr_pvalue(r, n)
        assert abs(got - want) < 1e-6, (r, n, got, want)
    # scipy golden values (precomputed): pearsonr(r=0.5,n=10) -> 0.14112...
    assert abs(pearsonr_pvalue(0.5, 10) - 0.141121) < 1e-5
    assert pearsonr_pvalue(1.0, 10) == 0.0
    assert math.isnan(pearsonr_pvalue(0.5, 2))
    assert math.isnan(pearsonr_pvalue(None, 10))
    assert t_sf_two_sided(0.0, 5) == 1.0


def test_result_compat_accessors(spark, rk_frame):
    """Reference Result-object compat surface (nannyml/base.py:104-312):
    filter by period/metrics/columns, wide pivot, values/alerts series."""
    from spark_validate import filter_result, result_to_wide, values_with_alerts

    sdf, _ = rk_frame
    calc = SummaryStatsAvgCalculator(["x", "y"], chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]))
    calc.fit(sdf.filter("is_ref"))
    res = calc.calculate(sdf.filter("NOT is_ref"))

    only_x = filter_result(res, period="analysis", metrics="avg", columns="x").toPandas()
    assert set(only_x["column_name"]) == {"x"}
    assert set(only_x["method"]) == {"avg"}
    assert set(only_x["period"]) == {"analysis"}
    assert filter_result(res, period="all").count() == res.count()

    wide = result_to_wide(res).toPandas()
    assert "x__avg" in wide.columns and "y__avg" in wide.columns
    long_x = res.filter("column_name = 'x'").orderBy("chunk_index").toPandas()
    assert np.allclose(wide.sort_values("chunk_index")["x__avg"].to_numpy(), long_x["value"].to_numpy())

    va = values_with_alerts(res, "avg", "x").toPandas()
    assert list(va.columns) == ["chunk_key", "chunk_index", "value", "alert"]
    assert len(va) == len(long_x)
