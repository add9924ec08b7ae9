"""DLE — label-free regression performance estimation."""

import numpy as np
import pandas as pd
import pytest

from spark_validate.chunking import SizeBasedChunker
from spark_validate.performance.dle import DLE

N_REF, N_ANA, CHUNK = 3000, 1500, 500


@pytest.fixture(scope="module")
def dle_frame(spark):
    rng = np.random.default_rng(6)
    n = N_REF + N_ANA
    f1 = rng.uniform(0, 10, n)
    f2 = rng.uniform(0, 5, n)
    y_true = 2 * f1 + f2 + rng.normal(0, 1 + 0.3 * f1, n)  # heteroscedastic noise
    y_pred = 2 * f1 + f2
    pdf = pd.DataFrame({"id": np.arange(n), "f1": f1, "f2": f2, "y_true": y_true, "y_pred": y_pred})
    pdf["is_ref"] = pdf["id"] < N_REF
    return spark.createDataFrame(pdf), pdf


def test_dle_estimates_track_realized(spark, dle_frame):
    sdf, pdf = dle_frame
    est = DLE(
        metrics=("mae", "mse", "rmse"),
        feature_column_names=["f1", "f2"],
        chunker=SizeBasedChunker(chunk_size=CHUNK, order_by=["id"]),
    )
    est.fit(sdf.filter("is_ref"))
    res = est.estimate(sdf.filter("NOT is_ref").drop("y_true")).orderBy("chunk_index").toPandas()
    piv = res.set_index(["chunk_index", "method"])["value"]
    a = pdf[~pdf.is_ref].reset_index(drop=True)
    for i in range(3):
        c = a.iloc[i * CHUNK : (i + 1) * CHUNK]
        realized_mae = np.abs(c.y_true - c.y_pred).mean()
        est_mae = piv[(i, "mae")]
        assert abs(est_mae - realized_mae) / realized_mae < 0.25  # tracks within 25%
        assert piv[(i, "rmse")] == pytest.approx(np.sqrt(piv[(i, "mse")]))
    assert res["upper_threshold"].notna().all()


def test_dle_thresholds_alert_on_degradation(spark, dle_frame):
    sdf, pdf = dle_frame
    est = DLE(
        metrics=("mae",),
        feature_column_names=["f1", "f2"],
        chunker=SizeBasedChunker(chunk_size=CHUNK, order_by=["id"]),
    )
    est.fit(sdf.filter("is_ref"))
    # degrade the model: shift predictions, pushing f1 high → predicted loss up?
    # DLE estimates from features; drift the feature distribution upward so
    # the heteroscedastic noise model predicts larger losses → alert
    from pyspark.sql import functions as F

    drifted = sdf.filter("NOT is_ref").withColumn("f1", F.col("f1") + 8).drop("y_true")
    res = est.estimate(drifted).toPandas()
    assert res["alert"].any()


def test_dle_hyperparameter_tuning_picks_alpha(spark):
    """tune_hyperparameters selects the CV-best ridge alpha deterministically
    (ref dle.py:143-168 tunes its loss model with FLAML; same spirit here)."""
    import numpy as np
    import pandas as pd
    from spark_validate.chunking import SizeBasedChunker
    from spark_validate.performance.dle import DLE

    rng = np.random.default_rng(4)
    n = 3000
    x = rng.standard_normal(n)
    y_pred = x + rng.standard_normal(n) * 0.1
    y_true = x + rng.standard_normal(n) * (0.2 + 0.3 * np.abs(x))  # heteroscedastic
    pdf = pd.DataFrame({"id": np.arange(n), "x": x, "y_pred": y_pred, "y_true": y_true})
    sdf = spark.createDataFrame(pdf)
    est = DLE(
        metrics=("mae",),
        feature_column_names=["x"],
        chunker=SizeBasedChunker(chunk_size=1000, order_by=["id"]),
        loss_model="ridge",
        tune_hyperparameters=True,
    )
    est.fit(sdf.filter("id < 2000"))
    alpha = est._models["abs"].alpha
    assert alpha in est.tune_alphas
    # deterministic: re-fitting picks the same alpha
    est2 = DLE(
        metrics=("mae",),
        feature_column_names=["x"],
        chunker=SizeBasedChunker(chunk_size=1000, order_by=["id"]),
        loss_model="ridge",
        tune_hyperparameters=True,
    )
    est2.fit(sdf.filter("id < 2000"))
    assert est2._models["abs"].alpha == alpha
    res = est.estimate(sdf.filter("id >= 2000").drop("y_true")).toPandas()
    assert res["value"].notna().all()


def test_gbt_regressor_learns_nonlinear_loss_ridge_cannot():
    """The default loss model is the reference's LightGBM family (histogram
    GBDT, ref dle.py:436-447): on a multiplicative-interaction loss surface
    the ridge has ~zero signal while the GBT tracks it."""
    from spark_validate.functions.gbt import GBTRegressor
    from spark_validate.performance.dle import _RidgeLossModel

    rng = np.random.default_rng(11)
    n = 6000
    X = rng.uniform(-2, 2, size=(n, 2))
    y = np.abs(X[:, 0] * X[:, 1])  # symmetric interaction: linear R² ≈ 0
    tr, va = slice(0, 4000), slice(4000, n)
    gbt = GBTRegressor(n_rounds=80, max_depth=4).fit(X[tr], y[tr])
    ridge = _RidgeLossModel().fit(X[tr], y[tr])
    var = y[va].var()
    mse_gbt = ((gbt.predict(X[va]) - y[va]) ** 2).mean()
    mse_ridge = ((ridge.predict(X[va]) - y[va]) ** 2).mean()
    assert mse_gbt < 0.25 * var  # explains most of the variance
    assert mse_ridge > 0.8 * var  # the linear model can't
    # JSON state round-trips to identical predictions
    st = gbt.state()
    import json

    clone = GBTRegressor.from_state(json.loads(json.dumps(st)))
    np.testing.assert_allclose(clone.predict(X[va]), gbt.predict(X[va]))


def test_dle_gbt_default_tracks_nonlinear_heteroscedastic_loss(spark):
    """End-to-end DLE with the default GBT loss model on noise whose scale is
    a nonlinear function of the features."""
    rng = np.random.default_rng(12)
    n = 6000
    f1 = rng.uniform(-2, 2, n)
    f2 = rng.uniform(-2, 2, n)
    sigma = 0.2 + np.abs(f1 * f2)  # interaction noise scale
    y_pred = f1 + f2
    y_true = y_pred + rng.normal(0, sigma)
    pdf = pd.DataFrame({"id": np.arange(n), "f1": f1, "f2": f2, "y_true": y_true, "y_pred": y_pred})
    sdf = spark.createDataFrame(pdf)
    est = DLE(
        metrics=("mae",),
        feature_column_names=["f1", "f2"],
        chunker=SizeBasedChunker(chunk_size=1000, order_by=["id"]),
    )
    est.fit(sdf.filter("id < 4000"))
    res = est.estimate(sdf.filter("id >= 4000").drop("y_true")).orderBy("chunk_index").toPandas()
    a = pdf[pdf.id >= 4000].reset_index(drop=True)
    for i in range(2):
        c = a.iloc[i * 1000 : (i + 1) * 1000]
        realized = np.abs(c.y_true - c.y_pred).mean()
        assert abs(res["value"][i] - realized) / realized < 0.15
