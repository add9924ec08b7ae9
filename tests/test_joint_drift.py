"""Joint 2-D histogram drift (spark_validate/drift/joint.py)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.chunking import SizeBasedChunker
from spark_validate.drift.joint import JointHistogramDrift


def _numpy_js(ref_xy, ana_xy, n_bins=8):
    """Independent replica: width_bucket per axis + base-2 JS distance."""
    rx, ry = ref_xy[:, 0].astype(float), ref_xy[:, 1].astype(float)
    lox, hix, loy, hiy = rx.min(), rx.max(), ry.min(), ry.max()
    if hix <= lox:
        hix = lox + 1.0
    if hiy <= loy:
        hiy = loy + 1.0

    def bucket(v, lo, hi):
        b = np.floor((v - lo) / ((hi - lo) / n_bins)).astype(int) + 1
        b = np.where(v < lo, 0, b)
        b = np.where(v >= hi, n_bins + 1, b)
        return b

    def grid(xy):
        bx, by = bucket(xy[:, 0].astype(float), lox, hix), bucket(xy[:, 1].astype(float), loy, hiy)
        g = np.zeros((n_bins + 2, n_bins + 2))
        for i, j in zip(bx, by):
            g[i, j] += 1
        return g / max(len(xy), 1)

    p, q = grid(ref_xy).ravel(), grid(ana_xy).ravel()
    tot = 0.0
    for pi, qi in zip(p, q):
        if pi > 0:
            tot += pi * math.log2(2 * pi / (pi + qi))
        if qi > 0:
            tot += qi * math.log2(2 * qi / (qi + pi))
    return math.sqrt(max(0.5 * tot, 0.0))


def test_joint_js_matches_numpy_replica(spark):
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 50, size=(400, 2))
    ana = rng.integers(0, 50, size=(300, 2))
    ana[:150, 1] = ana[:150, 0]  # half the analysis collapses to the diagonal
    ref_df = spark.createDataFrame(pd.DataFrame(ref, columns=["x", "y"]))
    ana_df = spark.createDataFrame(
        pd.DataFrame(ana, columns=["x", "y"]).assign(ord=range(len(ana)))
    )
    calc = JointHistogramDrift(
        "x", "y", chunker=SizeBasedChunker(chunk_size=300, order_by=["ord"])
    ).fit(ref_df)
    got = calc.calculate(ana_df).toPandas()["value"].iloc[0]
    want = _numpy_js(ref, ana)
    assert got == pytest.approx(want, abs=1e-12)


def test_joint_drift_sees_what_marginals_miss(spark):
    """x, y uniform in both periods; analysis sets y := x. The y marginal
    stays ~uniform (univariate JS small) but the joint collapses onto the
    diagonal (joint JS large + alerting)."""
    n = 2000
    pdf = pd.DataFrame({"doc_id": range(n)})
    pdf["x"] = (pdf.doc_id * 7) % 101
    pdf["y"] = (pdf.doc_id * 13) % 101
    ref = spark.createDataFrame(pdf)
    ana = spark.createDataFrame(pdf.assign(y=pdf.x))

    chunker = SizeBasedChunker(chunk_size=n, order_by=["doc_id"])
    joint = JointHistogramDrift("x", "y", chunker=chunker).fit(ref)
    jres = joint.calculate(ana).toPandas()
    assert jres["value"].iloc[0] > 0.3
    assert bool(jres["alert"].iloc[0])

    # same data through the univariate path: y-marginal drift is tiny
    marg = JointHistogramDrift("y", "y", chunker=chunker).fit(ref)
    mres = marg.calculate(ana).toPandas()
    assert mres["value"].iloc[0] < 0.1


def test_joint_null_rows_excluded_and_empty_chunk_null(spark):
    ref = spark.createDataFrame(
        pd.DataFrame({"x": [0.0, 1.0, 2.0, 3.0], "y": [0.0, 1.0, 2.0, 3.0]})
    )
    ana = spark.createDataFrame(
        [(0, 1.0, 1.0), (1, None, 5.0), (2, 5.0, None), (3, None, None)],
        "ord long, x double, y double",
    )
    calc = JointHistogramDrift(
        "x", "y", chunker=SizeBasedChunker(chunk_size=2, order_by=["ord"])
    ).fit(ref)
    res = calc.calculate(ana).toPandas().sort_values("chunk_key").reset_index(drop=True)
    # chunk 0 has one complete pair (in-range → zero-ish drift vs the 4-pt
    # uniform ref, but non-null); chunk 1 has none → NULL value
    assert res["value"].notna().tolist() == [True, False]


def test_joint_state_roundtrip_and_psi(spark):
    pdf = pd.DataFrame({"ord": range(200)})
    pdf["x"] = (pdf.ord * 3) % 17
    pdf["y"] = (pdf.ord * 5) % 23
    ref = spark.createDataFrame(pdf)
    ana = spark.createDataFrame(pdf.assign(y=(pdf.x + 1) % 17))
    for method in ("jensen_shannon", "psi"):
        calc = JointHistogramDrift(
            "x", "y", method=method,
            chunker=SizeBasedChunker(chunk_size=100, order_by=["ord"]),
        ).fit(ref)
        clone = JointHistogramDrift("x", "y").set_state(calc.get_state())
        clone.chunker = calc.chunker
        a = calc.calculate(ana).toPandas()["value"].tolist()
        b = clone.calculate(ana).toPandas()["value"].tolist()
        assert a == b
        assert all(v >= 0 for v in a)


def test_joint_degenerate_axis_and_fit_validation(spark):
    ref = spark.createDataFrame(pd.DataFrame({"x": [5.0] * 10, "y": range(10)}))
    calc = JointHistogramDrift("x", "y").fit(ref)  # hi_x == lo_x widens
    st = calc.get_state()
    assert st["hi_x"] == st["lo_x"] + 1.0
    empty = spark.createDataFrame(
        [(None, 1.0), (2.0, None)], "x double, y double"
    )
    with pytest.raises(ValueError, match="non-null"):
        JointHistogramDrift("x", "y").fit(empty)
    with pytest.raises(ValueError, match="method"):
        JointHistogramDrift("x", "y", method="nope")


def test_joint_drift_runner_kind_fused(spark, tmp_path):
    """Config-driven joint_drift runs through run_suite, participates in the
    fused shared-scan pass (fuse_contrib), and its fused values equal the
    standalone calculate path."""
    from spark_validate.runner import run_suite

    n = 600
    pdf = pd.DataFrame({"ord": range(n)})
    pdf["x"] = (pdf.ord * 7) % 101
    pdf["y"] = (pdf.ord * 13) % 101
    ref_pdf = pdf
    ana_pdf = pdf.assign(y=np.where(pdf.ord % 2 == 0, pdf.x, pdf.y))
    refp, anap = str(tmp_path / "ref.parquet"), str(tmp_path / "ana.parquet")
    spark.createDataFrame(ref_pdf).write.parquet(refp)
    spark.createDataFrame(ana_pdf).write.parquet(anap)
    cfg = {
        "run_id": "joint",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": refp,
        "analysis": anap,
        "chunking": {"chunk_size": 200, "order_by": ["ord"]},
        "checks": [
            {"type": "joint_drift", "column_x": "x", "column_y": "y"},
            {"type": "range", "columns": ["x"]},  # second check forces fusion
        ],
    }
    report = run_suite(spark, cfg)
    assert "joint_drift__x_y" in report
    res = spark.read.parquet(str(tmp_path / "out" / "results")).toPandas()
    fused_vals = (
        res[res["method"] == "joint_jensen_shannon"]
        .sort_values("chunk_key")["value"]
        .tolist()
    )
    assert len(fused_vals) == 3 and all(v > 0.1 for v in fused_vals)

    standalone = (
        JointHistogramDrift(
            "x", "y", chunker=SizeBasedChunker(chunk_size=200, order_by=["ord"])
        )
        .fit(spark.read.parquet(refp))
        .calculate(spark.read.parquet(anap))
        .toPandas()
        .sort_values("chunk_key")["value"]
        .tolist()
    )
    assert fused_vals == standalone

    # second run loads fitted state from the store instead of refitting
    report2 = run_suite(spark, {**cfg, "run_id": "joint2"})
    assert report2["joint_drift__x_y"]["fitted_from_store"] is False  # new run_id
    report3 = run_suite(spark, cfg)
    assert report3["joint_drift__x_y"]["fitted_from_store"] is True
