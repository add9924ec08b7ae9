"""Per-chunk calibration drift (performance/calib_drift.py) — numpy ECE
replica, NULL/empty conventions, state roundtrip, runner wiring."""

import json

import numpy as np
import pandas as pd
import pytest

from spark_validate.chunking import SizeBasedChunker
from spark_validate.performance.calib_drift import CalibrationDriftCalculator


def _ece_np(p, y, B=10):
    b = np.minimum((np.asarray(p) * B).astype(int), B - 1)
    y = np.asarray(y)
    n, e = len(p), 0.0
    for i in range(B):
        m = b == i
        if m.sum():
            e += m.sum() / n * abs(y[m].mean() - np.asarray(p)[m].mean())
    return e


def test_ece_matches_numpy_and_alerts_on_miscalibrated_chunk(spark):
    rng = np.random.RandomState(3)
    n = 4000
    p = rng.uniform(0, 1, n)
    y = (rng.uniform(0, 1, n) < p).astype(int)  # calibrated reference
    ref = pd.DataFrame({"rid": range(n), "p": p, "y": y})
    p2 = rng.uniform(0, 1, 2000)
    true_p = np.where(np.arange(2000) < 1000, p2, p2**2)  # chunk 1 overconfident
    y2 = (rng.uniform(0, 1, 2000) < true_p).astype(int)
    ana = pd.DataFrame({"rid": range(2000), "p": p2, "y": y2})

    calc = CalibrationDriftCalculator(
        y_true="y", y_pred_proba="p", bin_count=10,
        chunker=SizeBasedChunker(chunk_size=1000, order_by=["rid"]),
        ece_threshold=0.08,
    ).fit(spark.createDataFrame(ref))
    assert calc._state["ece"] == pytest.approx(_ece_np(p, y), rel=1e-9)

    res = calc.calculate(spark.createDataFrame(ana)).toPandas()
    ece = res[res.method == "ece"].set_index("chunk_index")["value"]
    assert ece[0] == pytest.approx(_ece_np(p2[:1000], y2[:1000]), rel=1e-9)
    assert ece[1] == pytest.approx(_ece_np(p2[1000:], y2[1000:]), rel=1e-9)
    alerts = res[res.method == "ece"].set_index("chunk_index")["alert"]
    assert not bool(alerts[0]) and bool(alerts[1])
    delta = res[res.method == "ece_delta"].set_index("chunk_index")["value"]
    assert delta[1] == pytest.approx(ece[1] - calc._state["ece"], rel=1e-9)
    assert not res[res.method == "ece_delta"]["alert"].any()


def test_reliability_bins_and_null_handling(spark):
    rows = [
        (0, 0.05, 0), (1, 0.05, 0), (2, 0.95, 1), (3, 0.95, 0),
        (4, None, 1), (5, 0.5, None),  # dropped rows
    ]
    df = spark.createDataFrame(rows, "rid int, p double, y int")
    calc = CalibrationDriftCalculator(
        y_true="y", y_pred_proba="p", bin_count=10,
        chunker=SizeBasedChunker(chunk_size=6, order_by=["rid"]),
    ).fit(df)
    rel = calc.reliability(df).toPandas().set_index("bin")
    assert rel.loc[0, "weight"] == pytest.approx(0.5)  # 2 of 4 valid rows
    assert rel.loc[0, "confidence"] == pytest.approx(0.05)
    assert rel.loc[0, "accuracy"] == 0.0
    assert rel.loc[9, "accuracy"] == pytest.approx(0.5)
    assert pd.isna(rel.loc[5, "confidence"])  # empty bin
    # p == 1.0 would clamp into the last bin
    one = spark.createDataFrame([(0, 1.0, 1)], "rid int, p double, y int")
    r1 = calc.reliability(one).toPandas().set_index("bin")
    assert r1.loc[9, "weight"] == pytest.approx(1.0)


def test_state_roundtrip_and_validation(spark):
    df = spark.createDataFrame(
        [(i, (i % 10) / 10 + 0.05, i % 2) for i in range(100)],
        "rid int, p double, y int",
    )
    calc = CalibrationDriftCalculator(
        y_true="y", y_pred_proba="p",
        chunker=SizeBasedChunker(chunk_size=100, order_by=["rid"]),
    ).fit(df)
    blob = json.dumps(calc.get_state())
    calc2 = CalibrationDriftCalculator(
        y_true="y", y_pred_proba="p", chunker=calc.chunker
    )
    calc2.set_state(json.loads(blob))
    assert calc2._state == calc._state
    with pytest.raises(ValueError):
        CalibrationDriftCalculator(bin_count=5).set_state(json.loads(blob))
    with pytest.raises(ValueError):
        CalibrationDriftCalculator(bin_count=1)
    empty = spark.createDataFrame([(0, None, None)], "rid int, p double, y int")
    with pytest.raises(ValueError):
        CalibrationDriftCalculator(
            y_true="y", y_pred_proba="p", chunker=calc.chunker
        ).fit(empty)


def test_runner_kind_and_store_roundtrip(spark, tmp_path):
    from spark_validate.runner import run_suite

    n = 600
    pdf = pd.DataFrame(
        {
            "rid": range(n),
            "proba": [((i * 37) % 100) / 100 + 0.005 for i in range(n)],
            "label": [(i * 37) % 100 < 50 for i in range(n)],
        }
    )
    pdf["label"] = pdf["label"].astype(int)
    src = str(tmp_path / "ev.parquet")
    spark.createDataFrame(pdf).write.parquet(src)
    cfg = {
        "run_id": "calib",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": src,
        "analysis": src,
        "chunking": {"chunk_size": 200, "order_by": ["rid"]},
        "checks": [
            {"type": "calibration_drift", "y_true": "label",
             "y_pred_proba": "proba", "ece_threshold": 0.9}
        ],
    }
    rep = run_suite(spark, cfg)
    (name, info), = rep.items()
    assert info["rows"] == 6 and info["alerts"] == 0  # 3 chunks x 2 methods
    rep2 = run_suite(spark, cfg)
    assert list(rep2.values())[0]["fitted_from_store"] is True
