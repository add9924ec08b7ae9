"""Prior-shift quantification (performance/quantify.py)."""

import numpy as np
import pandas as pd
import pytest

from spark_validate.chunking import SizeBasedChunker
from spark_validate.performance.quantify import PriorShiftEstimator


def _labeled(n, prior, tpr, fpr, seed, id_offset=0):
    """Deterministic noisy classifier with known operating point."""
    rng = np.random.RandomState(seed)
    y = (rng.rand(n) < prior).astype(int)
    p = np.where(y == 1, (rng.rand(n) < tpr), (rng.rand(n) < fpr)).astype(int)
    return pd.DataFrame({"id": np.arange(n) + id_offset, "y_true": y, "y_pred": p})


def test_acc_recovers_planted_prior_where_cc_is_biased(spark):
    """Reference prior 0.5; analysis prior drops to 0.2. The raw
    positive-prediction rate (CC) is pulled toward fpr·0.8 + tpr·0.2 —
    biased upward — while the adjusted estimate (ACC) inverts the fitted
    tpr/fpr and lands near the true prior."""
    tpr, fpr = 0.85, 0.15
    ref = _labeled(20_000, 0.5, tpr, fpr, seed=1)
    ana = _labeled(20_000, 0.2, tpr, fpr, seed=2, id_offset=100_000)
    est = PriorShiftEstimator(
        chunker=SizeBasedChunker(chunk_size=10_000, order_by=["id"]),
        shift_threshold=0.1,
    ).fit(spark.createDataFrame(ref))

    st = est.get_state()
    assert abs(st["tpr"] - tpr) < 0.02 and abs(st["fpr"] - fpr) < 0.02
    assert abs(st["ref_prior"] - 0.5) < 0.02

    res = est.calculate(spark.createDataFrame(ana)).toPandas()
    acc = res[res.method == "prevalence_acc"]
    cc = res[res.method == "prevalence_cc"]
    assert len(acc) == 2 and len(cc) == 2
    for v in acc["value"]:
        assert abs(v - 0.2) < 0.03  # adjusted estimate ≈ true prior
    for v in cc["value"]:
        assert v > 0.25  # raw rate biased toward fpr + (tpr-fpr)·π
        assert abs(v - 0.2) > abs(acc["value"].iloc[0] - 0.2)
    assert acc["alert"].all()  # |0.2 − 0.5| >> 0.1 band
    assert cc["alert"].isna().all()  # informational rows carry no alert
    assert cc["upper_threshold"].isna().all()

    # state roundtrip: identical scores
    est2 = PriorShiftEstimator(chunker=est.chunker, shift_threshold=0.1)
    est2.set_state(est.get_state())
    pd.testing.assert_frame_equal(
        res, est2.calculate(spark.createDataFrame(ana)).toPandas()
    )


def test_clamping_degenerate_and_single_class_reference(spark):
    """π̂ clamps to [0,1] under sampling noise; a no-information classifier
    (tpr ≈ fpr) yields NULL estimates and never alerts; a single-class
    reference refuses to fit."""
    ch = SizeBasedChunker(chunk_size=5_000, order_by=["id"])
    # analysis with prior 0: raw (q − fpr)/(tpr − fpr) goes negative → clamp
    tpr, fpr = 0.9, 0.2
    ref = _labeled(10_000, 0.5, tpr, fpr, seed=3)
    ana0 = _labeled(10_000, 0.0, tpr, fpr, seed=4, id_offset=50_000)
    est = PriorShiftEstimator(chunker=ch).fit(spark.createDataFrame(ref))
    res = est.calculate(spark.createDataFrame(ana0)).toPandas()
    acc = res[res.method == "prevalence_acc"]["value"]
    assert (acc >= 0.0).all() and (acc <= 1.0).all()
    assert (acc < 0.05).all()

    # degenerate: tpr ≈ fpr carries no prior information (min_rate_gap
    # bounds how small an inverted gap we are willing to divide by —
    # sampled rates are never EXACTLY equal, so the knob is the contract)
    degen = _labeled(10_000, 0.5, 0.3, 0.3, seed=5)
    d = PriorShiftEstimator(chunker=ch, min_rate_gap=0.02).fit(
        spark.createDataFrame(degen)
    )
    dres = d.calculate(spark.createDataFrame(ana0)).toPandas()
    dacc = dres[dres.method == "prevalence_acc"]
    assert dacc["value"].isna().all()
    assert not dacc["alert"].fillna(False).any()

    with pytest.raises(ValueError, match="both classes"):
        PriorShiftEstimator(chunker=ch).fit(
            spark.createDataFrame(_labeled(1_000, 1.0, 0.9, 0.1, seed=6))
        )


def test_prior_shift_runner_kind(spark, tmp_path):
    from spark_validate.runner import run_suite

    ref = _labeled(4_000, 0.5, 0.9, 0.1, seed=7)
    ana = _labeled(4_000, 0.15, 0.9, 0.1, seed=8, id_offset=10_000)
    rsrc, asrc = str(tmp_path / "ref.parquet"), str(tmp_path / "ana.parquet")
    spark.createDataFrame(ref).write.parquet(rsrc)
    spark.createDataFrame(ana).write.parquet(asrc)
    cfg = {
        "run_id": "prior",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": rsrc,
        "analysis": asrc,
        "chunking": {"chunk_size": 1_000, "order_by": ["id"]},
        "checks": [{"type": "prior_shift", "shift_threshold": 0.1}],
    }
    report = run_suite(spark, cfg)
    key = next(k for k in report if "prior_shift" in k)
    assert report[key]["alerts"] == 4  # every chunk's ACC far below the band
    # second run loads tpr/fpr/prior from the store
    report2 = run_suite(spark, cfg)
    assert report2[key]["fitted_from_store"] is True


def test_streaming_prior_shift_matches_batch(spark, tmp_path):
    """Per-window prevalence estimates equal the batch hourly-chunk path."""
    from spark_validate.chunking import PeriodBasedChunker
    from spark_validate.streaming import streaming_prior_shift

    tpr, fpr = 0.85, 0.15
    ref = _labeled(6_000, 0.5, tpr, fpr, seed=11)
    ref["ts"] = pd.Timestamp("2024-06-02") + pd.to_timedelta(ref["id"], unit="s")
    # analysis: clean hour (prior 0.5) then a shifted hour (prior 0.15)
    a1 = _labeled(3_600, 0.5, tpr, fpr, seed=12, id_offset=20_000)
    a2 = _labeled(3_600, 0.15, tpr, fpr, seed=13, id_offset=30_000)
    ana = pd.concat([a1, a2], ignore_index=True)
    ana["ts"] = pd.Timestamp("2024-06-03") + pd.to_timedelta(
        np.arange(len(ana)), unit="s"
    )
    est = PriorShiftEstimator(
        chunker=PeriodBasedChunker(offset="H", timestamp_column="ts"),
        shift_threshold=0.1,
    ).fit(spark.createDataFrame(ref))
    batch = est.calculate(spark.createDataFrame(ana)).toPandas()

    src = str(tmp_path / "prior_stream")
    spark.createDataFrame(ana).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_prior_shift(stream, est, "ts", window_duration="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sv_prior_shift")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    s = spark.sql("SELECT * FROM sv_prior_shift").toPandas()
    b = batch.copy()
    b["hour"] = b["chunk_key"].str.slice(0, 13)
    s["hour"] = pd.to_datetime(s["window_start"]).dt.strftime("%Y-%m-%d %H")
    joined = b.merge(s, on=["hour", "method"], suffixes=("_b", "_s"))
    assert len(joined) == 4  # 2 hours × 2 methods
    np.testing.assert_allclose(joined["value_b"], joined["value_s"], rtol=1e-12)
    acc = joined[joined.method == "prevalence_acc"]
    assert (acc["alert_b"].astype(bool) == acc["alert_s"].astype(bool)).all()
    assert bool(acc[acc.hour == "2024-06-03 01"]["alert_s"].iloc[0])
