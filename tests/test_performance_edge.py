"""Edge-path regressions in the performance family (round-5 review):
degenerate chunks under ANSI mode, per_prediction normalization semantics,
NULL labels/features, robust-threshold fit, boundary clamping."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.chunking import SizeBasedChunker
from spark_validate.performance import PerformanceCalculator
from spark_validate.performance.cbpe import CBPE


def _binary_frame(spark, n=400, pos_rate=0.5, seed=3):
    rng = np.random.default_rng(seed)
    score = rng.uniform(0, 1, n)
    pdf = pd.DataFrame(
        {
            "id": range(n),
            "y_true": (rng.uniform(0, 1, n) < np.where(score > 0.5, pos_rate + 0.3, pos_rate - 0.3).clip(0, 1)).astype(int),
            "y_pred": (score > 0.5).astype(int),
            "score": score,
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_cbpe_degenerate_chunk_no_ansi_crash(spark):
    # a chunk with ZERO predicted positives: precision must be NULL, not an
    # ANSI DIVIDE_BY_ZERO that kills the whole estimate job
    sdf, _ = _binary_frame(spark, 400)
    calc = CBPE(
        metrics=("precision", "recall", "accuracy", "f1"),
        y_pred="y_pred", y_pred_proba="score",
        chunker=SizeBasedChunker(chunk_size=100, order_by=["id"]),
    ).fit(sdf)
    ana = sdf.withColumn("y_pred", F.lit(0))  # no predicted positives at all
    res = calc.estimate(ana).toPandas()
    prec = res[res["method"] == "precision"]
    assert len(prec) == 4 and prec["value"].isna().all()
    rec = res[res["method"] == "recall"]
    assert rec["value"].notna().all()  # fn>0 keeps recall defined (≈0)


def test_business_value_per_prediction_numpy_replica(spark):
    # reference normalizes the cm PER PREDICTED-CLASS COLUMN
    # (cm/cm.sum(axis=0), NaN→0) — binary_classification.py:794-797
    pdf = pd.DataFrame(
        {
            "id": range(100),
            "y_true": [1] * 50 + [0] * 50,
            "y_pred": [1] * 40 + [0] * 10 + [0] * 45 + [1] * 5,
            "score": [0.9] * 50 + [0.1] * 50,
        }
    )
    sdf = spark.createDataFrame(pdf)
    bv_matrix = [[2.0, -1.0], [-3.0, 5.0]]  # [[tn, fp], [fn, tp]]
    calc = PerformanceCalculator(
        metrics=("business_value",),
        business_value_matrix=bv_matrix,
        normalize_business_value="per_prediction",
        chunker=SizeBasedChunker(chunk_size=100, order_by=["id"]),
    ).fit(sdf)
    got = calc.calculate(sdf).toPandas()["value"].iloc[0]
    tp = ((pdf.y_true == 1) & (pdf.y_pred == 1)).sum()
    fp = ((pdf.y_true == 0) & (pdf.y_pred == 1)).sum()
    tn = ((pdf.y_true == 0) & (pdf.y_pred == 0)).sum()
    fn = ((pdf.y_true == 1) & (pdf.y_pred == 0)).sum()
    cm = np.array([[tn, fp], [fn, tp]], dtype=float)
    cm = cm / cm.sum(axis=0, keepdims=True)
    bv = np.array(bv_matrix, dtype=float)
    want = float((bv * cm).sum())
    assert got == pytest.approx(want, rel=1e-12)
    # the old grand-total normalization would disagree
    assert got != pytest.approx(
        float((bv * np.array([[tn, fp], [fn, tp]])).sum() / 100.0), rel=1e-6
    )


def test_multiclass_fit_tolerates_null_labels(spark):
    pdf = pd.DataFrame(
        {
            "id": range(90),
            "y_true": (["a", "b", "c"] * 30),
            "y_pred": (["a", "b", "c"] * 30),
        }
    )
    pdf.loc[5, "y_true"] = None
    sdf = spark.createDataFrame(pdf)
    calc = PerformanceCalculator(
        metrics=("accuracy",),
        problem_type="multiclass_classification",
        chunker=SizeBasedChunker(chunk_size=30, order_by=["id"]),
    ).fit(sdf)
    assert calc._classes == ["a", "b", "c"]  # None filtered, no TypeError


def test_regression_mape_tolerates_zero_target(spark):
    pdf = pd.DataFrame(
        {"id": range(60), "yt": [0.0, 2.0, 4.0] * 20, "yp": [0.1, 2.2, 3.9] * 20}
    )
    sdf = spark.createDataFrame(pdf)
    calc = PerformanceCalculator(
        metrics=("mape", "mae"),
        problem_type="regression",
        y_true="yt", y_pred="yp",
        chunker=SizeBasedChunker(chunk_size=30, order_by=["id"]),
    ).fit(sdf)
    res = calc.calculate(sdf).toPandas()
    assert res[res["method"] == "mape"]["value"].notna().all()  # no ANSI crash


def test_auroc_se_fraction_uses_minority_class(spark):
    # 80% positive reference: the reference computes fraction AFTER the
    # minority flip (sampling_error/binary_classification.py:71) → 0.2
    sdf, pdf = _binary_frame(spark, 1000, seed=9)
    pdf2 = pdf.copy()
    pdf2["y_true"] = (np.arange(len(pdf2)) % 5 != 0).astype(int)  # 80% pos
    sdf2 = spark.createDataFrame(pdf2)
    calc = PerformanceCalculator(
        metrics=("roc_auc",), y_pred_proba="score",
        chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]),
    ).fit(sdf2)
    frac = calc._se["roc_auc"]["fraction"]
    assert frac == pytest.approx(0.2, abs=0.01)


def test_mad_threshold_fit_supported(spark):
    from spark_validate.thresholds import MedianAbsoluteDeviationThreshold

    sdf, _ = _binary_frame(spark, 600)
    calc = PerformanceCalculator(
        metrics=("accuracy",),
        threshold=MedianAbsoluteDeviationThreshold(),
        chunker=SizeBasedChunker(chunk_size=100, order_by=["id"]),
    ).fit(sdf)  # previously AttributeError: no attribute 'lower'
    lo, up = calc._thresholds["accuracy"]
    assert lo is not None and up is not None and lo <= up <= 1.0


def test_confidence_bounds_clamped_to_metric_limits(spark):
    sdf, _ = _binary_frame(spark, 300)
    calc = PerformanceCalculator(
        metrics=("accuracy",), y_pred_proba="score",
        chunker=SizeBasedChunker(chunk_size=100, order_by=["id"]),
    ).fit(sdf)
    res = calc.calculate(sdf).toPandas()
    ok = res["upper_confidence_boundary"].dropna()
    assert (ok <= 1.0 + 1e-12).all()
    lo = res["lower_confidence_boundary"].dropna()
    assert (lo >= -1e-12).all()


def test_calculate_survives_fully_unlabeled_chunk(spark):
    # the delayed-labels case: one analysis chunk has NO labels at all —
    # n_chunk = 0 must yield NULL sampling error, not an ANSI crash in std/√n
    sdf, pdf = _binary_frame(spark, 300)
    calc = PerformanceCalculator(
        metrics=("accuracy", "precision"),
        chunker=SizeBasedChunker(chunk_size=100, order_by=["id"]),
    ).fit(sdf)
    ana = sdf.withColumn(
        "y_true", F.when(F.col("id") < 100, None).otherwise(F.col("y_true"))
    )
    res = calc.calculate(ana).toPandas()
    first = res[res["chunk_index"] == 0]
    assert len(first) == 2
    assert first["value"].isna().all() and first["sampling_error"].isna().all()
    labeled = res[res["chunk_index"] > 0]
    assert labeled["value"].notna().all()


def test_dle_unscored_chunk_emits_nothing(spark):
    # a scoring outage (y_pred all NULL in one chunk) must not fabricate a
    # loss estimate at the never-trained (0, 0²) point — the chunk emits no
    # rows rather than a confident number
    from spark_validate.performance.dle import DLE

    rng = np.random.default_rng(6)
    n = 300
    pdf = pd.DataFrame(
        {
            "id": range(n),
            "f1": rng.normal(0, 1, n),
            "yt": rng.normal(10, 2, n),
        }
    )
    pdf["yp"] = pdf["yt"] + rng.normal(0, 1, n)
    sdf = spark.createDataFrame(pdf)
    calc = DLE(
        metrics=("mae",), feature_column_names=["f1"],
        y_true="yt", y_pred="yp", loss_model="ridge",
        chunker=SizeBasedChunker(chunk_size=100, order_by=["id"]),
    ).fit(sdf)
    ana = sdf.withColumn("yp", F.when(F.col("id") < 100, None).otherwise(F.col("yp")))
    res = calc.estimate(ana).toPandas()
    assert 0 not in set(res["chunk_index"])  # unscored chunk absent
    assert res["value"].notna().all()


def test_dle_scores_null_features_like_fit(spark):
    from spark_validate.performance.dle import DLE

    rng = np.random.default_rng(4)
    n = 400
    pdf = pd.DataFrame(
        {
            "id": range(n),
            "f1": rng.normal(0, 1, n),
            "f2": rng.normal(0, 1, n),
            "yt": rng.normal(10, 2, n),
        }
    )
    pdf["yp"] = pdf["yt"] + rng.normal(0, 1, n)
    sdf = spark.createDataFrame(pdf)
    calc = DLE(
        metrics=("mae",), feature_column_names=["f1", "f2"],
        y_true="yt", y_pred="yp", loss_model="ridge",
        chunker=SizeBasedChunker(chunk_size=100, order_by=["id"]),
    ).fit(sdf)
    ana = sdf.withColumn("f1", F.when(F.col("id") % 7 == 0, None).otherwise(F.col("f1")))
    res = calc.estimate(ana).toPandas()
    assert res["value"].notna().all() and np.isfinite(res["value"]).all()
