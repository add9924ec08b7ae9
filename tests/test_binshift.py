"""Per-bin share-shift attribution (drift/binshift.py) — numpy replica,
out-of-range movers, tie-breaks, state roundtrip, runner wiring."""

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.chunking import SizeBasedChunker
from spark_validate.drift.binshift import BinShiftCalculator


def _fit_calc(spark, ref_vals, **kw):
    ref = pd.DataFrame({"rid": range(len(ref_vals)), "x": ref_vals})
    kw.setdefault("chunker", SizeBasedChunker(chunk_size=4, order_by=["rid"]))
    calc = BinShiftCalculator(["x"], **kw)
    return calc.fit(spark.createDataFrame(ref))


def test_movers_match_numpy_histogram(spark):
    rng = np.random.RandomState(11)
    ref_vals = rng.uniform(0.0, 10.0, 500)
    ana_vals = np.concatenate([rng.uniform(5.0, 10.0, 200)])  # mass to the top half
    calc = _fit_calc(
        spark, ref_vals,
        chunker=SizeBasedChunker(chunk_size=200, order_by=["rid"]),
        n_bins=5, top_m=7, delta_threshold=0.1,
    )
    ana = pd.DataFrame({"rid": range(len(ana_vals)), "x": ana_vals})
    mv = calc.movers(spark.createDataFrame(ana)).toPandas().sort_values("bucket")

    lo, hi = ref_vals.min(), ref_vals.max()
    p, edges = np.histogram(ref_vals, bins=5, range=(lo, hi))
    p = p / len(ref_vals)
    q = np.histogram(ana_vals, bins=5, range=(lo, hi))[0] / len(ana_vals)
    # out-of-range analysis mass (values beyond ref max land in bucket 5)
    q_above = (ana_vals > hi).sum() / len(ana_vals)
    got = mv.set_index("bucket")
    for b in range(5):
        assert got.loc[b, "ref_share"] == pytest.approx(p[b])
        assert got.loc[b, "chunk_share"] == pytest.approx(q[b])
        assert got.loc[b, "delta"] == pytest.approx(q[b] - p[b])
        assert got.loc[b, "bin_lo"] == pytest.approx(edges[b])
        assert got.loc[b, "bin_hi"] == pytest.approx(edges[b + 1])
    assert got.loc[5, "ref_share"] == 0.0
    assert got.loc[5, "chunk_share"] == pytest.approx(q_above)
    assert got.loc[-1, "chunk_share"] == 0.0
    # ranking: largest |delta| first
    by_rank = mv.sort_values("rank")
    deltas = by_rank["delta"].abs().to_numpy()
    assert (np.diff(deltas) <= 1e-15).all()


def test_out_of_range_mass_is_top_mover_and_alerts(spark):
    ref_vals = list(np.linspace(0.0, 1.0, 50))
    calc = _fit_calc(
        spark, ref_vals,
        chunker=SizeBasedChunker(chunk_size=50, order_by=["rid"]),
        n_bins=4, top_m=2, delta_threshold=0.2,
    )
    ana = pd.DataFrame({"rid": range(50), "x": [5.0] * 30 + [0.5] * 20})
    mv = calc.movers(spark.createDataFrame(ana)).toPandas()
    top = mv[mv["rank"] == 1].iloc[0]
    assert top["bucket"] == 4  # the above-range bin
    assert top["delta"] == pytest.approx(0.6)
    assert bool(top["alert"])
    assert top["bin_lo"] == pytest.approx(1.0) and pd.isna(top["bin_hi"])
    res = calc.calculate(spark.createDataFrame(ana)).toPandas()
    assert res.loc[0, "method"] == "bin_delta_max"
    assert res.loc[0, "value"] == pytest.approx(0.6)
    assert bool(res.loc[0, "alert"])
    # violations carry the runner sink shape (incl. violation_kind — the
    # sampling path at runner.py struct-references it) with labeled,
    # NULL-edge-explicit observed values
    v = calc.violations(spark.createDataFrame(ana)).toPandas()
    assert "violation_kind" in v.columns and (v["violation_kind"] == "bin_shift").all()
    top_v = v[v["row_id"] == "bin_4"]["observed_value"].iloc[0]
    assert "delta=0.6" in top_v and "+inf" in top_v


def test_identical_population_all_zero_deltas_tiebreak(spark):
    vals = list(np.linspace(0.0, 1.0, 40))
    calc = _fit_calc(
        spark, vals,
        chunker=SizeBasedChunker(chunk_size=40, order_by=["rid"]),
        n_bins=4, top_m=3,
    )
    ana = pd.DataFrame({"rid": range(40), "x": vals})
    mv = calc.movers(spark.createDataFrame(ana)).toPandas().sort_values("rank")
    assert (mv["delta"].abs() < 1e-12).all()
    assert not mv["alert"].any()
    # all-zero deltas -> deterministic bucket-asc order starting at -1
    assert mv["bucket"].tolist() == [-1, 0, 1]


def test_state_roundtrip_and_degenerate_reference(spark):
    calc = _fit_calc(spark, [3.0] * 20, n_bins=4)  # constant column
    st = calc._state["x"]
    assert st["lo"] == 2.5 and st["hi"] == 3.5  # np.histogram ±0.5 widening
    assert sum(st["probs"]) == pytest.approx(1.0)
    blob = json.dumps(calc.get_state())  # JSON-serializable state
    calc2 = BinShiftCalculator(["x"], chunker=calc.chunker, n_bins=4)
    calc2.set_state(json.loads(blob))
    assert calc2._state == calc._state
    with pytest.raises(ValueError):
        BinShiftCalculator(["y"], n_bins=4).set_state(json.loads(blob))
    with pytest.raises(ValueError):
        _fit_calc(spark, [None, None], n_bins=4)


def test_streaming_bin_shift_matches_batch(spark, tmp_path):
    """The streaming compile emits per-(window, bin) shares equal to batch
    movers over a matching hourly period chunker; the all-NULL window emits
    no rows; the out-of-range bin carries the same alert."""
    from spark_validate.chunking import PeriodBasedChunker
    from spark_validate.streaming import streaming_bin_shift

    n = 1600
    ts = pd.date_range("2024-06-03", periods=n, freq="9s")  # 4 hours
    idx = np.arange(n)
    rng = np.random.RandomState(5)
    x = rng.uniform(0.0, 10.0, n)
    # last streamed hour: a third of the mass escapes above the ref range
    x = np.where((idx >= 3 * n // 4) & (idx % 3 == 0), 25.0, x)
    pdf = pd.DataFrame({"ts": ts, "id": idx, "x": x})
    hour1 = (ts >= "2024-06-03 01:00:00") & (ts < "2024-06-03 02:00:00")
    pdf.loc[np.asarray(hour1), "x"] = None
    ref, ana = pdf.iloc[: n // 4], pdf.iloc[n // 4 :]

    calc = BinShiftCalculator(
        ["x"],
        chunker=PeriodBasedChunker(offset="H", timestamp_column="ts"),
        n_bins=4,
        top_m=6,
        delta_threshold=0.1,
    ).fit(spark.createDataFrame(ref))
    batch = calc.movers(spark.createDataFrame(ana)).toPandas()

    src = str(tmp_path / "binshift_stream")
    spark.createDataFrame(ana).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_bin_shift(stream, calc, "ts", window_duration="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sv_binshift")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    s = spark.sql("SELECT * FROM sv_binshift").toPandas()
    assert set(s["bucket"]) == set(range(-1, 5))
    s["hour"] = pd.to_datetime(s["window_start"]).dt.strftime("%Y-%m-%d %H")
    assert "2024-06-03 01" not in set(s["hour"])  # all-NULL window dropped
    b = batch.copy()
    b["hour"] = b["chunk_key"].str.slice(0, 13)
    joined = b.merge(s, on=["hour", "bucket"], suffixes=("_b", "_s"))
    assert len(joined) >= 8
    np.testing.assert_allclose(joined["chunk_share_b"], joined["chunk_share_s"], rtol=1e-12)
    np.testing.assert_allclose(joined["delta_b"], joined["delta_s"], rtol=1e-12)
    for c in ("bin_lo", "bin_hi"):
        same = (joined[f"{c}_b"] == joined[f"{c}_s"]) | (
            joined[f"{c}_b"].isna() & joined[f"{c}_s"].isna()
        )
        assert same.all()
    assert (joined["alert_b"].astype(bool) == joined["alert_s"].astype(bool)).all()
    last = s[s["hour"] == s["hour"].max()]
    assert bool(last[last.bucket == 4]["alert"].iloc[0])  # escaped mass alerts


def test_importance_weights_rebalance_to_reference(spark):
    """Weighting the drifted analysis sample by the binned density ratio
    reproduces the reference bin shares; out-of-range mass weighs 0,
    NULLs stay NULL, ratios clip at max_weight."""
    rng = np.random.RandomState(3)
    ref_vals = rng.uniform(0.0, 1.0, 2000)
    calc = _fit_calc(
        spark, ref_vals,
        chunker=SizeBasedChunker(chunk_size=2000, order_by=["rid"]),
        n_bins=4,
    )
    # analysis: heavy low-bin skew + some out-of-range + a NULL
    ana_vals = np.concatenate([rng.uniform(0.0, 0.25, 600),
                               rng.uniform(0.25, 1.0, 300), [5.0] * 100])
    ana = pd.DataFrame({"rid": range(len(ana_vals) + 1),
                        "x": list(ana_vals) + [None]})
    out = calc.importance_weights(spark.createDataFrame(ana), max_weight=10.0)
    pdf = out.toPandas()
    assert pdf.loc[pdf["x"].isna(), "importance_weight"].isna().all()
    assert (pdf.loc[pdf["x"] > 1.0, "importance_weight"] == 0.0).all()
    # weighted bin shares ~ reference shares (exact: both are ratios of
    # the same counts)
    st = calc._state["x"]
    valid = pdf[pdf["x"].notna() & (pdf["x"] <= 1.0)]
    b = np.minimum(((valid["x"] - st["lo"]) / (st["hi"] - st["lo"]) * 4).astype(int), 3)
    wsum = valid["importance_weight"].sum()
    for i in range(4):
        share = valid.loc[b.values == i, "importance_weight"].sum() / wsum
        assert share == pytest.approx(st["probs"][i], rel=1e-9)
    # a bin with tiny analysis mass clips at max_weight
    tiny = pd.DataFrame({"rid": range(1000),
                         "x": [0.1] * 999 + [0.9]})
    w = calc.importance_weights(spark.createDataFrame(tiny), max_weight=10.0).toPandas()
    assert w.loc[w["x"] == 0.9, "importance_weight"].iloc[0] == 10.0
    with pytest.raises(ValueError):
        calc.importance_weights(spark.createDataFrame(ana), column="nope")


def test_streaming_calibration_drift_matches_batch(spark, tmp_path):
    """Per-window ECE equals the batch value over a matching hourly period
    chunker; empty windows emit nothing; delta carries the fitted ref ECE."""
    from spark_validate.chunking import PeriodBasedChunker
    from spark_validate.performance.calib_drift import CalibrationDriftCalculator
    from spark_validate.streaming import streaming_calibration_drift

    rng = np.random.RandomState(8)
    n = 1200
    ts = pd.date_range("2024-06-03", periods=n, freq="9s")
    p = rng.uniform(0, 1, n)
    y = (rng.uniform(0, 1, n) < np.where(np.arange(n) >= 2 * n // 3, p**3, p)).astype(int)
    pdf = pd.DataFrame({"ts": ts, "rid": range(n), "p": p, "y": y})
    ref, ana = pdf.iloc[: n // 3], pdf.iloc[n // 3 :]
    calc = CalibrationDriftCalculator(
        y_true="y", y_pred_proba="p", bin_count=10,
        chunker=PeriodBasedChunker(offset="H", timestamp_column="ts"),
        ece_threshold=0.15,
    ).fit(spark.createDataFrame(ref))
    batch = calc.calculate(spark.createDataFrame(ana)).toPandas()

    src = str(tmp_path / "calib_stream")
    spark.createDataFrame(ana).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_calibration_drift(stream, calc, "ts", window_duration="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sv_calib")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    s = spark.sql("SELECT * FROM sv_calib").toPandas()
    s["hour"] = pd.to_datetime(s["window_start"]).dt.strftime("%Y-%m-%d %H")
    b = batch[batch.method == "ece"].copy()
    b["hour"] = b["chunk_key"].str.slice(0, 13)
    joined = b.merge(s, on="hour")
    assert len(joined) == 2
    np.testing.assert_allclose(joined["value"], joined["ece"], rtol=1e-12)
    assert (joined["alert_x"].astype(bool) == joined["alert_y"].astype(bool)).all()
    assert bool(s[s["hour"] == s["hour"].max()]["alert"].iloc[0])  # miscalibrated hour
    np.testing.assert_allclose(
        s["ece"] - s["ece_delta"], calc._state["ece"], rtol=1e-12
    )


def test_runner_kind(spark):
    from spark_validate.runner import build_check

    chk = build_check(
        spark,
        {"type": "bin_shift", "columns": ["x"], "n_bins": 7, "top_m": 3},
        SizeBasedChunker(chunk_size=10, order_by=["rid"]),
    )
    assert isinstance(chk, BinShiftCalculator)
    assert chk.n_bins == 7 and chk.top_m == 3
