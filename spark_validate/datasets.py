"""Synthetic datasets — the reference's quick-start loaders, Spark-native.

Reference: `nannyml/datasets/datasets.py:48-243` ships canned CSVs
(`load_synthetic_car_loan_dataset`, `load_synthetic_multiclass_classification_dataset`,
`load_synthetic_car_price_dataset`, …) returning
``(reference, analysis, analysis_targets)``. Shipping data files is not an
option here (and would be pointless at Spark scale), so each loader is a
deterministic seeded GENERATOR with the same return contract and column
roles: feature columns + ``timestamp`` + ``id`` + model outputs
(``y_pred_proba``/``y_pred``), targets split into a separate frame for the
analysis period, and a drift injected partway through analysis so every
calculator has something to find.

Rows are generated distributed (mapInPandas over a range — no driver-side
materialization), so ``n_rows`` can be as large as the cluster can hold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPOCH = pd.Timestamp("2024-01-01")


def _generate(spark: SparkSession, n_rows: int, n_parts: int, make_batch):
    """Distributed generation: each partition synthesizes its id range."""

    def gen(iterator):
        for pdf in iterator:
            for pid in pdf["part"]:
                pid = int(pid)
                rows = n_rows // n_parts + (1 if pid < n_rows % n_parts else 0)
                start = (n_rows // n_parts) * pid + min(pid, n_rows % n_parts)
                rng = np.random.default_rng(1234 + pid)
                ids = np.arange(start, start + rows, dtype=np.int64)
                yield make_batch(ids, rng)

    probe = make_batch(np.arange(2, dtype=np.int64), np.random.default_rng(0))
    schema = ", ".join(
        f"`{c}` {'bigint' if probe[c].dtype.kind == 'i' else 'timestamp' if probe[c].dtype.kind == 'M' else 'string' if probe[c].dtype.kind in 'OU' else 'double'}"
        for c in probe.columns
    )
    parts = spark.range(n_parts).select(F.col("id").alias("part"))
    return parts.mapInPandas(gen, schema)


def _split(df: DataFrame, n_rows: int, y_cols):
    """reference = first half; analysis = second half with targets split off."""
    half = n_rows // 2
    reference = df.filter(F.col("id") < half)
    analysis_all = df.filter(F.col("id") >= half)
    analysis = analysis_all.drop(*y_cols)
    analysis_targets = analysis_all.select("id", *y_cols)
    return reference, analysis, analysis_targets


def load_synthetic_car_loan_dataset(spark: SparkSession, n_rows: int = 100_000, n_parts: int = 32):
    """Binary classification (ref datasets.py:168-192): loan features,
    ``repaid`` target, calibratable ``y_pred_proba``; analysis period drifts
    ``debt_to_income_ratio`` upward after 3/4 of the timeline."""

    def make(ids, rng):
        n = len(ids)
        drift = ids >= (3 * n_rows) // 4
        car_value = rng.gamma(4.0, 6000.0, n)
        debt_to_income_ratio = np.clip(rng.beta(2, 5, n) + np.where(drift, 0.25, 0.0), 0, 1.2)
        loan_length = rng.integers(12, 85, n).astype(np.int64)
        driver_tenure = rng.uniform(0, 30, n)
        salary_range = np.take(
            np.array(["0 - 20K", "20K - 40K", "40K - 60K", "60K+"]), rng.integers(0, 4, n)
        )
        repaid_loan_on_prev_car = np.take(np.array(["False", "True"]), rng.integers(0, 2, n))
        z = (
            1.2
            - 4.0 * debt_to_income_ratio
            + 0.00002 * car_value
            + 0.05 * driver_tenure
            - 0.01 * loan_length
            + np.where(repaid_loan_on_prev_car == "True", 0.8, -0.2)
        )
        p_true = 1 / (1 + np.exp(-z))
        repaid = (rng.uniform(0, 1, n) < p_true).astype(np.int64)
        # model score: informative but miscalibrated (so CBPE has work to do)
        y_pred_proba = 1 / (1 + np.exp(-(0.8 * z + 0.3 + rng.normal(0, 0.4, n))))
        return pd.DataFrame(
            {
                "id": ids,
                "car_value": car_value,
                "salary_range": salary_range,
                "debt_to_income_ratio": debt_to_income_ratio,
                "loan_length": loan_length,
                "repaid_loan_on_prev_car": repaid_loan_on_prev_car,
                "driver_tenure": driver_tenure,
                "timestamp": _EPOCH + pd.to_timedelta(ids * 300, unit="s"),
                "y_pred_proba": y_pred_proba,
                "y_pred": (y_pred_proba >= 0.5).astype(np.int64),
                "repaid": repaid,
            }
        )

    return _split(_generate(spark, n_rows, n_parts, make), n_rows, ["repaid"])


def load_synthetic_multiclass_classification_dataset(
    spark: SparkSession, n_rows: int = 100_000, n_parts: int = 32
):
    """3-class credit-card product model (ref datasets.py:109-133): per-class
    probability columns ``y_pred_proba_{cls}`` + ``y_pred`` + ``y_true``."""
    classes = ["prepaid_card", "highstreet_card", "upmarket_card"]

    def make(ids, rng):
        n = len(ids)
        drift = ids >= (3 * n_rows) // 4
        income = rng.gamma(3.0, 20_000.0, n) * np.where(drift, 1.5, 1.0)
        score = np.clip(rng.normal(620, 80, n), 300, 850)
        tenure = rng.uniform(0, 20, n)
        logits = np.stack(
            [
                2.0 - 0.00003 * income + 0.002 * (650 - score),
                0.5 + 0.00001 * income + 0.001 * (score - 600) + 0.02 * tenure,
                -2.5 + 0.00004 * income + 0.004 * (score - 650),
            ],
            axis=1,
        )
        noisy = logits + rng.normal(0, 0.8, logits.shape)
        p = np.exp(noisy - noisy.max(axis=1, keepdims=True))
        p /= p.sum(axis=1, keepdims=True)
        true_logits = logits + rng.normal(0, 0.5, logits.shape)
        y_true_idx = true_logits.argmax(axis=1)
        out = {
            "id": ids,
            "stated_income": income,
            "credit_bureau_score": score,
            "is_customer_years": tenure,
            "timestamp": _EPOCH + pd.to_timedelta(ids * 300, unit="s"),
        }
        for j, c in enumerate(classes):
            out[f"y_pred_proba_{c}"] = p[:, j]
        out["y_pred"] = np.take(np.array(classes), p.argmax(axis=1))
        out["y_true"] = np.take(np.array(classes), y_true_idx)
        return pd.DataFrame(out)

    return _split(_generate(spark, n_rows, n_parts, make), n_rows, ["y_true"])


def load_synthetic_car_price_dataset(spark: SparkSession, n_rows: int = 100_000, n_parts: int = 32):
    """Regression (ref datasets.py:216-243): used-car price model with
    ``y_pred``/``y_true``; analysis drifts ``km_driven`` upward (so DLE's
    loss model sees feature-dependent error growth)."""

    def make(ids, rng):
        n = len(ids)
        drift = ids >= (3 * n_rows) // 4
        car_age = rng.integers(0, 20, n).astype(np.int64)
        km_driven = rng.gamma(2.0, 30_000.0, n) * np.where(drift, 1.8, 1.0)
        price_new = rng.gamma(5.0, 8_000.0, n)
        accident_count = rng.poisson(0.4, n).astype(np.int64)
        y_true = (
            price_new * np.exp(-0.11 * car_age - 0.0000035 * km_driven - 0.15 * accident_count)
            * rng.lognormal(0, 0.08 + 0.000001 * km_driven, n)
        )
        y_pred = price_new * np.exp(-0.11 * car_age - 0.0000035 * km_driven - 0.15 * accident_count)
        return pd.DataFrame(
            {
                "id": ids,
                "car_age": car_age,
                "km_driven": km_driven,
                "price_new": price_new,
                "accident_count": accident_count,
                "timestamp": _EPOCH + pd.to_timedelta(ids * 300, unit="s"),
                "y_pred": y_pred,
                "y_true": y_true,
            }
        )

    return _split(_generate(spark, n_rows, n_parts, make), n_rows, ["y_true"])


def load_titanic_dataset(spark: SparkSession, n_rows: int = 1309, n_parts: int = 4):
    """Titanic-shaped tutorial dataset (ref datasets.py:74-104).

    The reference ships the real CSVs (kaggle train = reference, test =
    analysis); shipping data files is out of scope here, so this is a
    deterministic generator with the SAME column names/dtypes and kaggle-like
    marginals (class mix, sex-dependent survival, fare by class, missing Age
    and Cabin), letting reference tutorials run 1:1 against Spark frames.
    """

    def make(ids, rng):
        n = len(ids)
        pclass = rng.choice([1, 2, 3], n, p=[0.25, 0.21, 0.54]).astype(np.int64)
        sex = rng.choice(["male", "female"], n, p=[0.64, 0.36])
        age = np.round(np.clip(rng.normal(29.7, 14.5, n), 0.4, 80.0), 1)
        age[rng.random(n) < 0.20] = np.nan  # kaggle-like 20% missing ages
        sibsp = rng.choice([0, 1, 2, 3, 4], n, p=[0.68, 0.23, 0.06, 0.02, 0.01]).astype(np.int64)
        parch = rng.choice([0, 1, 2, 3], n, p=[0.76, 0.13, 0.09, 0.02]).astype(np.int64)
        fare = np.round(rng.gamma(1.8, 1.0, n) * np.where(pclass == 1, 48.0, np.where(pclass == 2, 11.0, 7.5)), 4)
        embarked = rng.choice(["S", "C", "Q"], n, p=[0.70, 0.21, 0.09])
        cabin = np.where(
            (pclass == 1) & (rng.random(n) < 0.8),
            pd.Series(rng.integers(1, 130, n)).map(lambda i: f"C{i}").to_numpy(),
            None,
        )
        # survival odds: female >> male, 1st > 3rd class, children favored
        logit = (
            -0.8
            + 2.5 * (sex == "female")
            + 0.9 * (pclass == 1)
            + 0.4 * (pclass == 2)
            + 0.7 * (np.nan_to_num(age, nan=29.7) < 12)
        )
        p = 1.0 / (1.0 + np.exp(-logit))
        survived = (rng.random(n) < p).astype(np.int64)
        return pd.DataFrame(
            {
                "PassengerId": ids + 1,
                "Pclass": pclass,
                "Name": pd.Series(ids).map(lambda i: f"Passenger, No. {i}").to_numpy(),
                "Sex": sex,
                "Age": age,
                "SibSp": sibsp,
                "Parch": parch,
                "Ticket": pd.Series(ids).map(lambda i: f"T{100000 + i}").to_numpy(),
                "Fare": fare,
                "Cabin": cabin,
                "Embarked": embarked,
                "Survived": survived,
            }
        )

    df = _generate(spark, n_rows, n_parts, make)
    split = (2 * n_rows) // 3  # kaggle train/test proportion ≈ 891/418
    reference = df.filter(F.col("PassengerId") <= split)
    analysis_all = df.filter(F.col("PassengerId") > split)
    return (
        reference,
        analysis_all.drop("Survived"),
        analysis_all.select("PassengerId", "Survived"),
    )


def load_modified_california_housing_dataset(spark: SparkSession, n_rows: int = 20_000, n_parts: int = 8):
    """California-housing-shaped binary dataset (ref datasets.py:135-160):
    the reference's modified version turns the sklearn regression data into
    a timestamped binary problem with model scores. Deterministic generator,
    same column names (MedInc … Longitude + timestamp + y_pred_proba +
    y_pred + clf_target); analysis drifts MedInc/Latitude after the split.
    """

    def make(ids, rng):
        n = len(ids)
        drift = ids >= (3 * n_rows) // 4
        med_inc = rng.gamma(2.5, 1.55, n) * np.where(drift, 1.35, 1.0)
        house_age = rng.uniform(1, 52, n)
        ave_rooms = np.clip(rng.normal(5.4, 1.2, n), 1.0, 20.0)
        ave_bedrms = np.clip(rng.normal(1.1, 0.15, n), 0.5, 5.0)
        population = rng.gamma(3.0, 475.0, n)
        ave_occup = np.clip(rng.normal(3.0, 0.9, n), 0.8, 15.0)
        lat = rng.uniform(32.5, 42.0, n) + np.where(drift, 1.5, 0.0)
        lon = rng.uniform(-124.3, -114.3, n)
        logit = 0.9 * (med_inc - 3.9) + 0.05 * (ave_rooms - 5.4) - 0.02 * (house_age - 26)
        p = 1.0 / (1.0 + np.exp(-logit))
        clf_target = (rng.random(n) < p).astype(np.int64)
        y_pred_proba = np.round(np.clip(p + rng.normal(0, 0.08, n), 0.0, 1.0), 4)
        return pd.DataFrame(
            {
                "id": ids,
                "MedInc": med_inc,
                "HouseAge": house_age,
                "AveRooms": ave_rooms,
                "AveBedrms": ave_bedrms,
                "Population": population,
                "AveOccup": ave_occup,
                "Latitude": lat,
                "Longitude": lon,
                "timestamp": _EPOCH + pd.to_timedelta(ids * 3600, unit="s"),
                "y_pred_proba": y_pred_proba,
                "y_pred": (y_pred_proba >= 0.5).astype(np.int64),
                "clf_target": clf_target,
            }
        )

    return _split(_generate(spark, n_rows, n_parts, make), n_rows, ["clf_target"])


def load_us_census_ma_employment_data(spark: SparkSession, n_rows: int = 100_000, n_parts: int = 32):
    """US-census-MA-employment-shaped binary dataset (ref datasets.py:244-268,
    ACS PUMS features, target ``employed``). Deterministic generator with the
    reference's core feature columns (AGEP age, SCHL education, MAR marital,
    SEX, DIS disability, ESP/MIG/CIT categorical codes) and model outputs;
    analysis drifts the age distribution upward after the split."""

    def make(ids, rng):
        n = len(ids)
        drift = ids >= (3 * n_rows) // 4
        agep = np.clip(rng.normal(43, 17, n) + np.where(drift, 8.0, 0.0), 16, 95).astype(np.int64)
        schl = rng.integers(1, 25, n).astype(np.int64)  # ACS education codes
        mar = rng.choice([1, 2, 3, 4, 5], n, p=[0.48, 0.07, 0.11, 0.02, 0.32]).astype(np.int64)
        sex = rng.choice([1, 2], n).astype(np.int64)
        dis = rng.choice([1, 2], n, p=[0.14, 0.86]).astype(np.int64)
        cit = rng.choice([1, 2, 3, 4, 5], n, p=[0.82, 0.02, 0.04, 0.05, 0.07]).astype(np.int64)
        mig = rng.choice([1, 2, 3], n, p=[0.86, 0.01, 0.13]).astype(np.int64)
        working_age = (agep >= 22) & (agep <= 62)
        logit = (
            -0.4 + 1.6 * working_age + 0.08 * (schl - 12) - 1.1 * (dis == 1) - 0.015 * np.abs(agep - 42)
        )
        p = 1.0 / (1.0 + np.exp(-logit))
        employed = (rng.random(n) < p).astype(np.int64)
        y_pred_proba = np.round(np.clip(p + rng.normal(0, 0.06, n), 0.0, 1.0), 4)
        return pd.DataFrame(
            {
                "id": ids,
                "AGEP": agep,
                "SCHL": schl,
                "MAR": mar,
                "SEX": sex,
                "DIS": dis,
                "CIT": cit,
                "MIG": mig,
                "y_pred_proba": y_pred_proba,
                "y_pred": (y_pred_proba >= 0.5).astype(np.int64),
                "employed": employed,
            }
        )

    return _split(_generate(spark, n_rows, n_parts, make), n_rows, ["employed"])
