"""RFF-MMD drift (drift/mmd.py) — numpy replica, joint-only drift
detection, sigma fit, NULL/dim handling, state roundtrip, runner wiring."""

import json

import numpy as np
import pandas as pd
import pytest

from spark_validate.chunking import SizeBasedChunker
from spark_validate.drift.mmd import MMDDriftCalculator, rff_params


def _vdf(spark, M, start=0):
    pdf = pd.DataFrame(
        {"rid": range(start, start + len(M)),
         "embedding": [list(map(float, r)) for r in M]}
    )
    return spark.createDataFrame(pdf)


def _np_mmd(ref, blk, W, b, K):
    W, b = np.array(W), np.array(b)
    phi = lambda X: np.cos(X @ W.T + b)
    return (2 / K) * ((phi(ref).mean(0) - phi(blk).mean(0)) ** 2).sum()


def test_mmd_matches_numpy_and_detects_joint_only_drift(spark):
    rng = np.random.RandomState(0)
    D, K = 16, 64
    ref = rng.standard_normal((3000, D))
    a0 = rng.standard_normal((1000, D))  # null
    # strong joint correlation, near-identical marginals: invisible to
    # per-dimension statistics, visible to the kernel two-sample test
    c = rng.standard_normal((1000, 1))
    a1 = np.hstack([c] * D) * 0.7 + rng.standard_normal((1000, D)) * 0.3
    calc = MMDDriftCalculator(
        column_name="embedding", n_features=K, seed=7,
        chunker=SizeBasedChunker(chunk_size=1000, order_by=["rid"]),
        mmd_threshold=0.01,
    ).fit(_vdf(spark, ref))
    # fitted bandwidth: sigma^2 = sum of per-dim variances ~ D
    assert calc._state["sigma"] == pytest.approx(np.sqrt(D), rel=0.1)
    res = (
        calc.calculate(_vdf(spark, np.vstack([a0, a1])))
        .toPandas()
        .set_index("chunk_index")
    )
    W, b = rff_params(D, K, calc._state["sigma"], 7)
    assert res.loc[0, "value"] == pytest.approx(_np_mmd(ref, a0, W, b, K), abs=1e-6)
    assert res.loc[1, "value"] == pytest.approx(_np_mmd(ref, a1, W, b, K), abs=1e-6)
    assert not bool(res.loc[0, "alert"]) and bool(res.loc[1, "alert"])
    # per-dim means barely move — the joint shift is what MMD sees
    assert abs(a1.mean() - ref.mean()) < 0.05
    assert res.loc[1, "value"] > 10 * res.loc[0, "value"]
    # split-half null scale: same-distribution halves score ~null, far
    # below the planted joint shift — the threshold-calibration aid the
    # module docstring advertises
    self_mmd = calc._state["ref_self_mmd"]
    assert self_mmd is not None and 0.0 <= self_mmd < res.loc[1, "value"] / 10
    # numpy replica of the same content-hash split is infeasible here, but
    # the magnitude must sit at the null floor (chunk 0 is a fresh null draw)
    assert self_mmd < max(res.loc[0, "value"] * 10, 0.01)


def test_null_and_wrong_dim_vectors_excluded(spark):
    rng = np.random.RandomState(1)
    ref = rng.standard_normal((500, 8))
    calc = MMDDriftCalculator(
        column_name="embedding", n_features=16, sigma=2.0, seed=3,
        chunker=SizeBasedChunker(chunk_size=500, order_by=["rid"]),
        mmd_threshold=0.05,
    ).fit(_vdf(spark, ref))
    rows = [(0, list(map(float, ref[0]))), (1, None), (2, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "rid int, embedding array<double>")
    res = calc.calculate(df).toPandas()
    # only row 0 is valid; MMD computed over it alone, not NULL
    assert len(res) == 1 and res.loc[0, "value"] is not None
    empty = spark.createDataFrame([(0, None)], "rid int, embedding array<double>")
    with pytest.raises(ValueError):
        MMDDriftCalculator(
            column_name="embedding", n_features=16, sigma=1.0,
            chunker=calc.chunker,
        ).fit(empty)


def test_state_roundtrip_and_validation(spark):
    rng = np.random.RandomState(2)
    calc = MMDDriftCalculator(
        column_name="embedding", n_features=8, sigma=1.5, seed=11,
        chunker=SizeBasedChunker(chunk_size=100, order_by=["rid"]),
    ).fit(_vdf(spark, rng.standard_normal((200, 4))))
    blob = json.dumps(calc.get_state())
    calc2 = MMDDriftCalculator(
        column_name="embedding", n_features=8, chunker=calc.chunker
    )
    calc2.set_state(json.loads(blob))
    assert calc2._state["mu_ref"] == calc._state["mu_ref"]
    assert calc2._state["ref_self_mmd"] == calc._state["ref_self_mmd"]
    # restored projection == freshly seeded projection (reproducibility)
    W, b = rff_params(4, 8, 1.5, 11)
    assert calc2._state["W"] == W and calc2._state["b"] == b
    with pytest.raises(ValueError):
        MMDDriftCalculator(n_features=4).set_state(json.loads(blob))
    with pytest.raises(ValueError):
        MMDDriftCalculator(n_features=1)


def test_streaming_mmd_matches_batch(spark, tmp_path):
    """Per-window MMD equals the batch value over a matching hourly period
    chunker, including the alert on the drifted final hour."""
    from spark_validate.chunking import PeriodBasedChunker
    from spark_validate.streaming import streaming_mmd_drift

    rng = np.random.RandomState(9)
    n, D = 1200, 8
    ts = pd.date_range("2024-06-03", periods=n, freq="9s")  # 3 hours
    X = rng.standard_normal((n, D))
    X[2 * n // 3:] += 1.0  # final hour shifted
    pdf = pd.DataFrame(
        {"ts": ts, "rid": range(n), "embedding": [list(map(float, r)) for r in X]}
    )
    ref, ana = pdf.iloc[: n // 3], pdf.iloc[n // 3 :]
    calc = MMDDriftCalculator(
        column_name="embedding", n_features=16, seed=4,
        chunker=PeriodBasedChunker(offset="H", timestamp_column="ts"),
        mmd_threshold=0.05,
    ).fit(spark.createDataFrame(ref))
    batch = calc.calculate(spark.createDataFrame(ana)).toPandas()

    src = str(tmp_path / "mmd_stream")
    spark.createDataFrame(ana).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_mmd_drift(stream, calc, "ts", window_duration="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sv_mmd")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    s = spark.sql("SELECT * FROM sv_mmd").toPandas()
    s["hour"] = pd.to_datetime(s["window_start"]).dt.strftime("%Y-%m-%d %H")
    b = batch.copy()
    b["hour"] = b["chunk_key"].str.slice(0, 13)
    joined = b.merge(s, on="hour")
    assert len(joined) == 2
    np.testing.assert_allclose(joined["value"], joined["mmd"], rtol=1e-12)
    assert (joined["alert_x"].astype(bool) == joined["alert_y"].astype(bool)).all()
    assert bool(s[s["hour"] == s["hour"].max()]["alert"].iloc[0])


def test_runner_kind(spark):
    from spark_validate.drift.mmd import MMDDriftCalculator
    from spark_validate.runner import build_check

    chk = build_check(
        spark,
        {"type": "mmd_drift", "column": "vec", "n_features": 32, "sigma": 2.0},
        SizeBasedChunker(chunk_size=10, order_by=["rid"]),
    )
    assert isinstance(chk, MMDDriftCalculator)
    assert chk.column_name == "vec" and chk.n_features == 32 and chk.sigma == 2.0
