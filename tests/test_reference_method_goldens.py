"""The reference's pinned method goldens, end-to-end through Spark.

Re-encodes `tests/drift/test_univariate_drift_methods.py` (seed 1,
CountBasedChunker(1) = one chunk holding the whole series) and asserts the
SAME rounded values out of `UnivariateDriftCalculator` — numpy kernels are
already golden-tested in `test_mathstats.py`; this pins the full
fit → histogram → per-chunk pipeline to the reference's numbers.
"""

import numpy as np
import pandas as pd
import pytest

from spark_validate.chunking import CountBasedChunker
from spark_validate.drift.univariate import UnivariateDriftCalculator


def _value(spark, ref, ana, method, kind, computation="auto", n_bins_ecdf=10_000):
    """Run one (reference series, analysis series) pair through the
    calculator with a single whole-series chunk; return the metric value."""
    rdf = spark.createDataFrame(pd.DataFrame({"A": ref, "idx": np.arange(len(ref))}))
    adf = spark.createDataFrame(pd.DataFrame({"A": ana, "idx": np.arange(len(ana))}))
    kw = dict(
        column_names=["A"],
        chunker=CountBasedChunker(chunk_number=1, order_by=["idx"]),
        computation=computation,
        n_bins_ecdf=n_bins_ecdf,
    )
    if kind == "cont":
        calc = UnivariateDriftCalculator(continuous_methods=[method], categorical_methods=[], **kw)
    else:
        calc = UnivariateDriftCalculator(continuous_methods=[], categorical_methods=[method], **kw)
    calc.fit(rdf)
    out = calc.calculate(adf).toPandas()
    calc.release_cache()
    assert len(out) == 1
    return float(out["value"].iloc[0])


def test_js_goldens(spark):
    np.random.seed(1)
    ref_n = np.random.normal(0, 1, 10_000)
    ana_n = np.random.normal(0, 1, 1000)  # SAME stream — the reference does not reseed
    assert round(_value(spark, ref_n, ana_n, "jensen_shannon", "cont"), 2) == 0.05
    np.random.seed(1)
    ref_q = np.random.choice(np.linspace(0, 2, 6), 10_000)
    assert _value(spark, ref_q, ref_q, "jensen_shannon", "cont") == 0.0
    np.random.seed(1)
    ref_q = np.random.choice(np.linspace(0, 2, 6), 10_000)
    ana_q = np.random.choice(np.linspace(0, 2, 3), 1000)
    assert round(_value(spark, ref_q, ana_q, "jensen_shannon", "cont"), 2) == 0.73
    np.random.seed(1)
    ref_c = np.random.choice(["a", "b", "c", "d"], 10_000)
    ana_c = np.random.choice(["a", "b", "c", "e"], 1000)
    assert round(_value(spark, ref_c, ana_c, "jensen_shannon", "cat"), 2) == 0.50


def test_l_infinity_goldens(spark):
    ref = np.array(["a", "a", "b", "b", "c", "c"])
    assert round(_value(spark, ref, np.array(list(ref) + ["d"]), "l_infinity", "cat"), 2) == 0.14
    assert round(_value(spark, ref, ref, "l_infinity", "cat"), 2) == 0.0
    assert round(_value(spark, ref, np.array(["b"] * 5), "l_infinity", "cat"), 2) == 0.67


def test_wasserstein_goldens(spark):
    np.random.seed(1)
    ref = np.random.normal(0, 1, 10_000)
    assert round(_value(spark, ref, ref, "wasserstein", "cont"), 2) == 0.0
    np.random.seed(1)
    ref = np.random.normal(0, 1, 10_000)
    ana = np.random.normal(1, 1, 1000)
    assert round(_value(spark, ref, ana, "wasserstein", "cont"), 2) == 1.01
    np.random.seed(1)
    ref_big = np.random.normal(0, 1, 100_000)
    ana_neg = np.random.normal(-4, 1, 1000)
    assert round(_value(spark, ref_big, ana_neg, "wasserstein", "cont"), 2) == 3.99


def test_wasserstein_out_of_range_golden(spark):
    # ref :124-130 — the ESTIMATED path with heavy out-of-range mass
    np.random.seed(1)
    ref = np.random.normal(0, 1, 15_000)
    ana = np.random.normal(0, 10, 1_000_000)
    assert round(_value(spark, ref, ana, "wasserstein", "cont", computation="estimated"), 3) == 7.180


def test_hellinger_goldens(spark):
    np.random.seed(1)
    ref = np.random.normal(0, 1, 10_000)
    assert round(_value(spark, ref, ref, "hellinger", "cont"), 2) == 0.0
    np.random.seed(1)
    ref = np.random.normal(0, 1, 10_000)
    far = np.random.normal(7, 1, 10_000)
    assert round(_value(spark, ref, far, "hellinger", "cont"), 2) == 1.0
    np.random.seed(1)
    ref = np.random.normal(0, 1, 10_000)
    near = np.random.normal(-2, 1, 10_000)
    assert round(_value(spark, ref, near, "hellinger", "cont"), 2) == 0.63
    np.random.seed(1)
    ref_q = np.random.choice(np.linspace(0, 2, 6), 10_000)
    ana_q = np.random.choice(np.linspace(0, 2, 3), 1000)
    assert round(_value(spark, ref_q, ana_q, "hellinger", "cont"), 2) == 0.72
    np.random.seed(1)
    ref_c = np.random.choice(["a", "b", "c", "d"], 10_000)
    ana_c = np.random.choice(["a", "b", "c", "e"], 1000)
    assert round(_value(spark, ref_c, ana_c, "hellinger", "cat"), 2) == 0.50
