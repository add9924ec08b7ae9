"""Regression pins for the round-6 single-pipeline drift restructure.

The univariate calculator now computes every binned continuous family and
the categorical hist family + l_infinity through ONE aggregation each with
the per-method values melted out (`drift/univariate.py::
_binned_continuous_methods`, `_cat_hist_methods`). These tests pin that the
merged pipelines score each method identically to a calculator running that
method alone — the property the melt must never break — and that the
joint-drift projected cell index keeps the inline expressions' NULL/NaN
semantics (the fused-suite path still uses the inline form, so the two
implementations are compared directly).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.chunking import SizeBasedChunker
from spark_validate.drift import UnivariateDriftCalculator
from spark_validate.drift.joint import JointHistogramDrift

CONT_METHODS = (
    "jensen_shannon", "hellinger", "tvd", "kl", "psi",
    "kolmogorov_smirnov", "cramer_von_mises", "wasserstein",
)
CAT_METHODS = ("jensen_shannon", "hellinger", "tvd", "kl", "psi", "l_infinity", "chi2")


@pytest.fixture(scope="module")
def drift_frames(spark):
    rng = np.random.default_rng(11)
    n_ref, n_ana = 4000, 2000
    pdf_ref = pd.DataFrame(
        {
            "id": np.arange(n_ref),
            "x": rng.normal(0, 1, n_ref),
            "cat": rng.choice(["a", "b", "c", "d"], n_ref, p=[0.4, 0.3, 0.2, 0.1]),
        }
    )
    pdf_ana = pd.DataFrame(
        {
            "id": np.arange(n_ana),
            "x": rng.normal(0.6, 1.4, n_ana),  # out-of-range mass exercises leftovers
            "cat": rng.choice(["a", "b", "c", "e"], n_ana, p=[0.25, 0.25, 0.25, 0.25]),
        }
    )
    return spark.createDataFrame(pdf_ref), spark.createDataFrame(pdf_ana)


def _values(res):
    rows = res.select("chunk_key", "column_name", "method", "value").collect()
    return {(r["chunk_key"], r["column_name"], r["method"]): r["value"] for r in rows}


def test_multi_method_values_match_each_single_method(spark, drift_frames):
    """One calculator scoring ALL methods must agree per (chunk, column,
    method) with a calculator scoring that method alone: the merged
    aggregation computes the same formulas over the same rows; only float
    summation order may differ (window-sorted vs unsorted input), so the
    tolerance is ulp-level, far tighter than the 1e-9 the oracles round to."""
    ref, ana = drift_frames
    chunker = SizeBasedChunker(chunk_size=500, order_by=["id"])
    multi = UnivariateDriftCalculator(
        column_names=["x", "cat"],
        continuous_methods=CONT_METHODS,
        categorical_methods=CAT_METHODS,
        chunker=chunker,
        n_bins_doane=10,
        n_bins_ecdf=200,
        computation="estimated",
    ).fit(ref)
    got = _values(multi.calculate(ana))
    assert len(got) == 4 * (len(CONT_METHODS) + len(CAT_METHODS))

    for cont_m, cat_m, col in [
        (("kolmogorov_smirnov",), (), "x"),
        (("wasserstein",), (), "x"),
        (("cramer_von_mises",), (), "x"),
        (("jensen_shannon",), (), "x"),
        (("psi",), (), "x"),
        ((), ("l_infinity",), "cat"),
        ((), ("jensen_shannon",), "cat"),
        ((), ("chi2",), "cat"),
    ]:
        single = UnivariateDriftCalculator(
            column_names=[col],
            continuous_methods=cont_m,
            categorical_methods=cat_m,
            chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]),
            n_bins_doane=10,
            n_bins_ecdf=200,
            computation="estimated",
        ).fit(ref)
        for key, v in _values(single.calculate(ana)).items():
            assert key in got, key
            if v is None:
                assert got[key] is None, key
            else:
                assert got[key] == pytest.approx(v, rel=1e-12, abs=1e-12), key


def test_joint_projected_cells_match_inline_exprs(spark):
    """`_project_cells` + `_count_exprs_cell` (standalone path) must count
    exactly what the inline `_count_exprs` (fused path) counts — including
    the edge rows: NULL axes (excluded from __n and all cells), NaN axes
    (complete, so counted in __n, but a NULL bucket keeps them out of every
    cell), and out-of-range values (overflow cells)."""
    rows = [  # (x, y, kind) — NaN/NULL injected in-plan so ingestion can't fold them
        (1.0, 1.0, "ok"), (2.0, 99.0, "ok"), (50.0, 50.0, "ok"), (99.0, 2.0, "ok"),
        (150.0, 50.0, "ok"), (-5.0, 50.0, "ok"),  # out-of-range → overflow cells
        (0.0, 4.0, "nanx"), (3.0, 0.0, "nany"),   # NaN axis: complete, bucket NULL
        (0.0, 5.0, "nullx"), (7.0, 0.0, "nully"),  # NULL axis: excluded entirely
    ]
    base = spark.createDataFrame(rows, "x double, y double, kind string")
    nan, null = F.lit(float("nan")), F.lit(None).cast("double")
    df = base.select(
        F.when(F.col("kind") == "nanx", nan)
        .when(F.col("kind") == "nullx", null)
        .otherwise(F.col("x")).alias("x"),
        F.when(F.col("kind") == "nany", nan)
        .when(F.col("kind") == "nully", null)
        .otherwise(F.col("y")).alias("y"),
    )
    chk = JointHistogramDrift("x", "y", n_bins_x=4, n_bins_y=4)
    chk._state = {"lo_x": 0.0, "hi_x": 100.0, "lo_y": 0.0, "hi_y": 100.0}

    inline = df.agg(*chk._count_exprs("")).first().asDict()
    projected = chk._project_cells(df, []).agg(*chk._count_exprs_cell("")).first().asDict()
    assert inline == projected
    # sanity on the documented semantics themselves
    assert inline["__n"] == 8  # the two NULL-axis rows excluded
    assert sum(v for k, v in inline.items() if k != "__n") == 6  # NaN rows in no cell
