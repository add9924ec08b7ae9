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


def test_runner_kind(spark):
    from spark_validate.runner import build_check

    chk = build_check(
        spark,
        {"type": "bin_shift", "columns": ["x"], "n_bins": 7, "top_m": 3},
        SizeBasedChunker(chunk_size=10, order_by=["rid"]),
    )
    assert isinstance(chk, BinShiftCalculator)
    assert chk.n_bins == 7 and chk.top_m == 3
