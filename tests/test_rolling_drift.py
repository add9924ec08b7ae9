import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.chunking import SizeBasedChunker
from spark_validate.drift import RollingDriftCalculator
from spark_validate.runner import run_suite


def _step_frame(spark):
    # 4 chunks of 100 rows; chunks 0-1 ~ U[0,1), chunks 2-3 shifted to
    # U[5,6) — the step lands between chunk 1 and 2
    rows = []
    for i in range(400):
        base = 5.0 if i >= 200 else 0.0
        rows.append((i, base + (i * 37 % 100) / 100.0))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id", "v"]))


def test_rolling_spike_at_step_only(spark):
    df = _step_frame(spark)
    calc = RollingDriftCalculator(
        "v", n_bins=10, chunker=SizeBasedChunker(chunk_size=100, order_by=["id"])
    ).fit(df.filter(F.col("id") < 200))
    res = calc.calculate(df).toPandas().sort_values("chunk_index")
    vals = res.set_index("chunk_index")["value"]
    assert pd.isna(vals[0])  # no predecessor
    assert vals[1] < 0.05  # same distribution
    assert vals[2] > 0.9  # the step: disjoint histograms -> JS ~ 1
    assert vals[3] < 0.05  # stable again after the step
    alerts = res.set_index("chunk_index")["alert"]
    assert not alerts[0] and not alerts[1] and alerts[2] and not alerts[3]


def test_rolling_nan_reference_and_analysis(spark):
    # A NaN in the reference must not poison hi (F.max sorts NaN above all
    # doubles -> every bucket predicate false -> silent 0 drift forever);
    # NaN analysis rows must not inflate the __n denominator.
    pdf = pd.DataFrame(
        {"id": range(8), "v": [0.0, 0.01, 0.02, np.nan, 0.0, 0.01, 0.99, 0.98]}
    )
    df = spark.createDataFrame(pdf)
    calc = RollingDriftCalculator(
        "v", n_bins=10, chunker=SizeBasedChunker(chunk_size=4, order_by=["id"])
    ).fit(df)
    assert calc._state["hi"] == pytest.approx(0.99)  # NaN ignored in fit
    res = calc.calculate(df).toPandas().set_index("chunk_index")
    # chunk 0 holds 3 non-NaN rows all in bucket 1; chunk 1 is 2+2 split —
    # identical shape to the hand-computed case with p=(1,0), q=(.5,.5)
    p_term = 1.0 * math.log2(2.0 / 1.5)
    q_term = 0.5 * math.log2(2 * 0.5 / 1.5) + 0.5 * math.log2(2 * 0.5 / 0.5)
    expect = math.sqrt(0.5 * (p_term + q_term))
    assert np.isclose(res.loc[1, "value"], expect, rtol=1e-12)


def test_rolling_hand_computed_two_chunks(spark):
    # chunk 0: 4 values in bucket 1; chunk 1: 2 in bucket 1, 2 in bucket 10
    pdf = pd.DataFrame(
        {"id": range(8), "v": [0.0, 0.01, 0.02, 0.03, 0.0, 0.01, 0.99, 0.98]}
    )
    df = spark.createDataFrame(pdf)
    calc = RollingDriftCalculator(
        "v", n_bins=10, chunker=SizeBasedChunker(chunk_size=4, order_by=["id"])
    ).fit(df)
    res = calc.calculate(df).toPandas().set_index("chunk_index")
    # p = (1,0), q = (.5,.5) over {bucket1, bucket10}:
    # js_div = 0.5*(1*log2(2/1.5)) + 0.5*(0.5*log2(1/1.5) + 0.5*log2(2))
    p_term = 1.0 * math.log2(2.0 / 1.5)
    q_term = 0.5 * math.log2(2 * 0.5 / 1.5) + 0.5 * math.log2(2 * 0.5 / 0.5)
    expect = math.sqrt(0.5 * (p_term + q_term))
    assert np.isclose(res.loc[1, "value"], expect, rtol=1e-12)


def test_rolling_categorical_and_state_roundtrip(spark):
    pdf = pd.DataFrame(
        {
            "id": range(12),
            "fmt": ["jpeg", "jpeg", "png", "gif", "jpeg", "png"] * 2,
        }
    )
    # chunk 1 flips composition vs chunk 0
    pdf.loc[6:, "fmt"] = ["gif", "gif", "gif", "webp", "webp", None]
    df = spark.createDataFrame(pdf)
    calc = RollingDriftCalculator(
        "fmt",
        n_bins=2,
        categorical=True,
        chunker=SizeBasedChunker(chunk_size=6, order_by=["id"]),
    ).fit(df.filter(F.col("id") < 6))
    assert calc._state["categories"] == ["jpeg", "png"]  # top-2, count desc
    res = calc.calculate(df).toPandas().set_index("chunk_index")
    # chunk0 over {jpeg, png, other}: (3/6, 2/6, 1/6); chunk1 (NULL excluded,
    # base 5): (0, 0, 1) -> hand-fold the JS
    p = [3 / 6, 2 / 6, 1 / 6]
    q = [0.0, 0.0, 1.0]
    div = 0.0
    for pi, qi in zip(p, q):
        if qi > 0:
            div += qi * math.log2(2 * qi / (qi + pi))
        if pi > 0:
            div += pi * math.log2(2 * pi / (pi + qi))
    assert np.isclose(res.loc[1, "value"], math.sqrt(0.5 * div), rtol=1e-12)

    clone = RollingDriftCalculator(
        "x", chunker=SizeBasedChunker(chunk_size=6, order_by=["id"])
    ).set_state(calc.get_state())
    res2 = clone.calculate(df).toPandas().set_index("chunk_index")
    assert np.isclose(res.loc[1, "value"], res2.loc[1, "value"], rtol=0)

    with pytest.raises(ValueError):
        RollingDriftCalculator("fmt", categorical=True).fit(
            df.filter(F.col("fmt").isNull())
        )


def test_rolling_drift_in_runner_fused_matches_standalone(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "id": range(300),
            "v": [float(i % 7) for i in range(200)] + [40.0 + i % 3 for i in range(100)],
            "w": [1.0] * 300,
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(tmp_path / "t"))

    def cfg(tag, fused):
        return {
            "run_id": f"roll_{tag}",
            "output_dir": str(tmp_path / f"out_{tag}"),
            "store_dir": str(tmp_path / f"store_{tag}"),
            "reference": str(tmp_path / "t"),
            "analysis": str(tmp_path / "t"),
            "chunking": {"chunk_size": 100, "order_by": ["id"]},
            "fused": fused,
            "checks": [
                {"type": "rolling_drift", "column": "v", "n_bins": 8},
                {"type": "missing", "columns": ["v", "w"]},  # fusion partner
            ],
        }

    run_suite(spark, cfg("f", True))
    run_suite(spark, cfg("s", False))
    read = lambda tag: (
        spark.read.parquet(str(tmp_path / f"out_{tag}" / "results"))
        .filter(F.col("method") == "rolling_jensen_shannon")
        .toPandas()
        .sort_values("chunk_index")
        .reset_index(drop=True)
    )
    f, s = read("f"), read("s")
    assert f["value"].fillna(-1).tolist() == s["value"].fillna(-1).tolist()
    assert pd.isna(f.loc[0, "value"])
    assert f.loc[2, "value"] > 0.9  # the planted step between chunks 1 and 2
    assert f.loc[2, "alert"] and not f.loc[1, "alert"]
