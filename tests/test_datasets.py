"""Dataset loaders (ref nannyml/datasets/datasets.py) drive the estimators
end-to-end — the quick-start path a reference user lands on first."""

import pytest
from pyspark.sql import functions as F

from spark_validate.chunking import SizeBasedChunker
from spark_validate.datasets import (
    load_synthetic_car_loan_dataset,
    load_synthetic_car_price_dataset,
    load_synthetic_multiclass_classification_dataset,
)

N = 20_000


def test_car_loan_dataset_cbpe_end_to_end(spark):
    ref, ana, tgt = load_synthetic_car_loan_dataset(spark, n_rows=N, n_parts=8)
    assert ref.count() == N // 2 and ana.count() == N - N // 2
    assert "repaid" in ref.columns and "repaid" not in ana.columns
    from spark_validate.performance.cbpe import CBPE

    est = CBPE(
        metrics=("roc_auc", "accuracy"),
        y_true="repaid",
        y_pred="y_pred",
        y_pred_proba="y_pred_proba",
        chunker=SizeBasedChunker(chunk_size=2500, order_by=["id"]),
    ).fit(ref)
    res = est.estimate(ana).toPandas()
    assert set(res["method"]) == {"roc_auc", "accuracy"}
    assert res["value"].between(0, 1).all()
    # deterministic: same seed → same data → same estimates
    ref2, ana2, _ = load_synthetic_car_loan_dataset(spark, n_rows=N, n_parts=8)
    assert ref2.agg(F.sum("car_value")).first()[0] == ref.agg(F.sum("car_value")).first()[0]


def test_multiclass_dataset_runs_performance_calc(spark):
    ref, ana, tgt = load_synthetic_multiclass_classification_dataset(spark, n_rows=N, n_parts=8)
    classes = ["prepaid_card", "highstreet_card", "upmarket_card"]
    from spark_validate.performance.calculator import PerformanceCalculator

    calc = PerformanceCalculator(
        problem_type="multiclass_classification",
        metrics=("accuracy", "f1"),
        y_true="y_true",
        y_pred="y_pred",
        y_pred_proba={c: f"y_pred_proba_{c}" for c in classes},
        chunker=SizeBasedChunker(chunk_size=2500, order_by=["id"]),
    ).fit(ref)
    # analysis targets rejoin by id, as the reference's quick start does
    res = calc.calculate(ana.join(tgt, "id")).toPandas()
    acc = res[res["method"] == "accuracy"]["value"]
    assert len(acc) > 0 and acc.between(0.3, 1).all()  # informative model


def test_car_price_dataset_dle_detects_drift_degradation(spark):
    ref, ana, tgt = load_synthetic_car_price_dataset(spark, n_rows=N, n_parts=8)
    from spark_validate.performance.dle import DLE

    est = DLE(
        metrics=("mae",),
        feature_column_names=["car_age", "km_driven", "price_new", "accident_count"],
        chunker=SizeBasedChunker(chunk_size=2500, order_by=["id"]),
    ).fit(ref)
    res = est.estimate(ana).orderBy("chunk_index").toPandas()
    # km_driven drifts up in the last quarter → noise scale grows → estimated
    # MAE in the final chunks exceeds the first chunks
    assert res["value"].iloc[-1] > res["value"].iloc[0]


def test_titanic_dataset_contract(spark):
    from spark_validate.datasets import load_titanic_dataset

    ref, ana, tgt = load_titanic_dataset(spark, n_rows=1309, n_parts=4)
    assert ref.count() + ana.count() == 1309
    assert "Survived" in ref.columns and "Survived" not in ana.columns
    assert set(tgt.columns) == {"PassengerId", "Survived"}
    pdf = ref.toPandas()
    # kaggle-like shape: missing ages, class-skewed fares, binary target
    assert pdf["Age"].isna().mean() > 0.1
    assert pdf.groupby("Pclass")["Fare"].mean()[1] > pdf.groupby("Pclass")["Fare"].mean()[3]
    assert set(pdf["Survived"].unique()) <= {0, 1}
    # survival structure a drift/performance calculator can find
    by_sex = pdf.groupby("Sex")["Survived"].mean()
    assert by_sex["female"] > by_sex["male"] + 0.2


def test_california_housing_dataset_contract(spark):
    from spark_validate.datasets import load_modified_california_housing_dataset

    ref, ana, tgt = load_modified_california_housing_dataset(spark, n_rows=8000, n_parts=4)
    assert "clf_target" in ref.columns and "clf_target" not in ana.columns
    # analysis second half carries the MedInc drift → univariate drift fires
    from spark_validate.drift import UnivariateDriftCalculator

    calc = UnivariateDriftCalculator(
        ["MedInc"], continuous_methods=("jensen_shannon",),
        chunker=SizeBasedChunker(chunk_size=1000, order_by=["id"]),
    ).fit(ref)
    res = calc.calculate(ana).orderBy("chunk_index").toPandas()
    assert res["value"].iloc[-1] > res["value"].iloc[0] + 0.05


def test_us_census_dataset_contract(spark):
    from spark_validate.datasets import load_us_census_ma_employment_data

    ref, ana, tgt = load_us_census_ma_employment_data(spark, n_rows=8000, n_parts=4)
    assert {"AGEP", "SCHL", "y_pred_proba"} <= set(ref.columns)
    assert "employed" not in ana.columns and "employed" in tgt.columns
    pdf = ref.toPandas()
    assert 0.4 < pdf["employed"].mean() < 0.95
