"""CBPE + calibration vs numpy oracles re-implementing the reference formulas."""

import numpy as np
import pandas as pd
import pytest

from spark_validate.calibration import (
    IsotonicCalibrator,
    expected_calibration_error,
    needs_calibration,
    pava,
)
from spark_validate.chunking import SizeBasedChunker
from spark_validate.performance.cbpe import CBPE

N_REF, N_ANA, CHUNK = 4000, 2000, 500


def test_pava_monotone_and_mean_preserving():
    y = np.array([3.0, 1.0, 2.0, 5.0, 4.0])
    w = np.ones(5)
    out = pava(y, w)
    assert (np.diff(out) >= -1e-12).all()
    assert np.isclose(out.sum(), y.sum())
    # pooled blocks are means of violators
    np.testing.assert_allclose(out, [2, 2, 2, 4.5, 4.5])


def test_isotonic_calibrator_recovers_monotone_trend():
    rng = np.random.default_rng(0)
    p = rng.uniform(0, 1, 5000)
    y = (rng.uniform(0, 1, 5000) < p**2).astype(float)  # true prob = p²
    cal = IsotonicCalibrator().fit(p, y)
    grid = np.linspace(0.05, 0.95, 10)
    est = cal.calibrate(grid)
    assert (np.diff(est) >= -1e-12).all()
    assert np.max(np.abs(est - grid**2)) < 0.1  # close to the true curve


def test_needs_calibration_decisions():
    rng = np.random.default_rng(1)
    p = rng.uniform(0, 1, 4000)
    # miscalibrated scores (true prob = p³) → needs calibration
    y_bad = (rng.uniform(0, 1, 4000) < p**3).astype(float)
    assert needs_calibration(y_bad, p)
    # single-class early exit
    assert not needs_calibration(np.ones(100), rng.uniform(0, 1, 100))
    # near-perfect separation early exit (AUROC > 0.999)
    y_sep = (p > 0.5).astype(float)
    assert not needs_calibration(y_sep, p)


def test_ece_zero_for_perfectly_calibrated_bins():
    y = np.array([0, 1] * 500)
    p = np.full(1000, 0.5)
    assert expected_calibration_error(y, p, bin_count=4) < 1e-12


@pytest.fixture(scope="module")
def cbpe_frame(spark):
    rng = np.random.default_rng(33)
    n = N_REF + N_ANA
    true_p = rng.uniform(0.05, 0.95, n)
    y = (rng.uniform(0, 1, n) < true_p).astype(int)
    score = np.clip(true_p + rng.normal(0, 0.05, n), 0.001, 0.999)
    pred = (score > 0.5).astype(int)
    pdf = pd.DataFrame({"id": np.arange(n), "y_true": y, "y_pred": pred, "score": score})
    pdf["is_ref"] = pdf["id"] < N_REF
    return spark.createDataFrame(pdf), pdf


def test_cbpe_estimates_match_numpy_oracle(spark, cbpe_frame):
    sdf, pdf = cbpe_frame
    est = CBPE(
        metrics=("accuracy", "precision", "recall", "f1", "roc_auc"),
        y_true="y_true",
        y_pred="y_pred",
        y_pred_proba="score",
        chunker=SizeBasedChunker(chunk_size=CHUNK, order_by=["id"]),
    )
    est.fit(sdf.filter("is_ref"))
    res = est.estimate(sdf.filter("NOT is_ref")).orderBy("chunk_index").toPandas()
    # numpy oracle: same calibrator applied per chunk, same expected-confusion
    cal = est._calibrator
    a = pdf[~pdf.is_ref].reset_index(drop=True)
    piv = res.set_index(["chunk_index", "method"])["value"]
    for i in range(2):
        c = a.iloc[i * CHUNK : (i + 1) * CHUNK]
        p = cal.calibrate(c["score"].to_numpy())
        pred = c["y_pred"].to_numpy()
        TP = p[pred == 1].sum()
        FP = (1 - p[pred == 1]).sum()
        FN = p[pred == 0].sum()
        TN = (1 - p[pred == 0]).sum()
        assert abs(piv[(i, "accuracy")] - (TP + TN) / CHUNK) < 1e-9
        assert abs(piv[(i, "precision")] - TP / (TP + FP)) < 1e-9
        assert abs(piv[(i, "recall")] - TP / (TP + FN)) < 1e-9
        assert abs(piv[(i, "f1")] - TP / (TP + 0.5 * (FP + FN))) < 1e-9
        # estimated ROC-AUC oracle (reference estimate_roc_auc, incl. round-5)
        order = np.argsort(-c["score"].to_numpy(), kind="mergesort")
        pc = p[order]
        tps = np.round(np.cumsum(pc), 5)
        fps = np.round(1 + np.arange(len(pc)) - np.cumsum(pc), 5)
        tpr = np.r_[0, tps] / tps[-1]
        fpr = np.r_[0, fps] / fps[-1]
        auc = float(np.trapz(tpr, fpr))
        assert abs(piv[(i, "roc_auc")] - auc) < 1e-6
    # estimated accuracy should track realized accuracy reasonably
    realized = [
        (a.iloc[i * CHUNK : (i + 1) * CHUNK].y_true == a.iloc[i * CHUNK : (i + 1) * CHUNK].y_pred).mean()
        for i in range(4)
    ]
    estimated = [piv[(i, "accuracy")] for i in range(4)]
    assert np.max(np.abs(np.array(realized) - np.array(estimated))) < 0.05


def test_cbpe_estimates_without_labels(spark, cbpe_frame):
    sdf, _ = cbpe_frame
    est = CBPE(
        metrics=("accuracy",),
        y_true="y_true",
        y_pred="y_pred",
        y_pred_proba="score",
        chunker=SizeBasedChunker(chunk_size=CHUNK, order_by=["id"]),
    )
    est.fit(sdf.filter("is_ref"))
    unlabeled = sdf.filter("NOT is_ref").drop("y_true")  # analysis has NO labels
    res = est.estimate(unlabeled).toPandas()
    assert len(res) == 4
    assert res["value"].notna().all()
    assert res["upper_threshold"].notna().all()


@pytest.fixture(scope="module")
def mc_frame(spark):
    """Multiclass: 3 classes, miscalibrated per-class scores."""
    rng = np.random.default_rng(21)
    n = N_REF + N_ANA
    classes = ["a", "b", "c"]
    yt = rng.choice(classes, n)
    raw = rng.uniform(0.05, 0.4, size=(n, 3))
    for i, cls in enumerate(classes):
        raw[yt == cls, i] += rng.uniform(0.2, 0.8, size=(yt == cls).sum())
    probs = (raw**2) / (raw**2).sum(axis=1, keepdims=True)  # squared → miscalibrated
    yp = np.array(classes)[probs.argmax(axis=1)]
    pdf = pd.DataFrame(
        {"id": np.arange(n), "y_true": yt, "y_pred": yp,
         "p_a": probs[:, 0], "p_b": probs[:, 1], "p_c": probs[:, 2]}
    )
    pdf["is_ref"] = pdf["id"] < N_REF
    return pdf, spark.createDataFrame(pdf)


def _mc_calibrated(pdf, classes):
    """Numpy replica of the reference's per-class calibrate + renormalize."""
    ref = pdf[pdf.is_ref]
    cals = {}
    for cls in classes:
        y = (ref["y_true"] == cls).to_numpy(dtype=float)
        p = ref[f"p_{cls}"].to_numpy()
        if needs_calibration(y, p):
            cals[cls] = IsotonicCalibrator().fit(p, y)
        else:
            cals[cls] = None
    ana = pdf[~pdf.is_ref].reset_index(drop=True)
    mat = np.stack(
        [
            (cals[cls].calibrate(ana[f"p_{cls}"].to_numpy()) if cals[cls] else ana[f"p_{cls}"].to_numpy())
            for cls in classes
        ],
        axis=1,
    )
    denom = mat.sum(axis=1, keepdims=True)
    uniform = np.full_like(mat, 1 / len(classes))
    mat = np.divide(mat, denom, out=uniform, where=denom != 0)
    return ana, mat


def test_cbpe_multiclass_vs_numpy_oracle(mc_frame):
    pdf, sdf = mc_frame
    classes = ["a", "b", "c"]
    bvm = [[1.0, -1.0, -0.5], [-2.0, 2.0, -0.25], [0.0, -3.0, 3.0]]
    est = CBPE(
        metrics=("accuracy", "f1", "confusion_matrix", "business_value"),
        y_pred_proba={c: f"p_{c}" for c in classes},
        problem_type="multiclass_classification",
        business_value_matrix=bvm,
        chunker=SizeBasedChunker(chunk_size=CHUNK, order_by=["id"]),
        calibration_sample=10**9,  # use the full reference (no sampling noise)
    )
    est.fit(sdf.filter("is_ref"))
    res = est.estimate(sdf.filter("NOT is_ref").drop("y_true")).orderBy("chunk_index").toPandas()
    piv = res.set_index(["chunk_index", "method"])["value"]

    ana, cal = _mc_calibrated(pdf, classes)
    c = slice(0, CHUNK)
    pred = ana["y_pred"].to_numpy()[c]
    calc = cal[c]
    # accuracy = mean calibrated proba of the predicted class
    idx = np.array([classes.index(p) for p in pred])
    want_acc = calc[np.arange(len(idx)), idx].mean()
    assert np.isclose(piv[(0, "accuracy")], want_acc, atol=1e-9)
    # macro estimated f1
    f1s = []
    for i, cls in enumerate(classes):
        is_p = pred == cls
        tp = calc[is_p, i].sum()
        fp = (1 - calc[is_p, i]).sum()
        fn = calc[~is_p, i].sum()
        f1s.append(tp / (tp + 0.5 * (fp + fn)))
    assert np.isclose(piv[(0, "f1")], np.mean(f1s), atol=1e-9)
    # expected confusion matrix + business value
    bv = 0.0
    for i, t in enumerate(classes):
        for j, p in enumerate(classes):
            cm_ij = calc[pred == p, i].sum()
            assert np.isclose(piv[(0, f"true_{t}_pred_{p}")], cm_ij, atol=1e-9)
            bv += bvm[i][j] * cm_ij
    assert np.isclose(piv[(0, "business_value")], bv, atol=1e-9)
    # chunk count sanity
    assert res[res.method == "accuracy"].shape[0] == N_ANA // CHUNK


def test_cbpe_multiclass_auc_ap_run(mc_frame):
    """roc_auc / average_precision estimated values are finite and in [0,1]."""
    pdf, sdf = mc_frame
    classes = ["a", "b", "c"]
    est = CBPE(
        metrics=("roc_auc", "average_precision"),
        y_pred_proba={c: f"p_{c}" for c in classes},
        problem_type="multiclass_classification",
        chunker=SizeBasedChunker(chunk_size=CHUNK, order_by=["id"]),
    )
    est.fit(sdf.filter("is_ref"))
    res = est.estimate(sdf.filter("NOT is_ref").drop("y_true")).toPandas()
    vals = res["value"]
    assert vals.notna().all()
    assert ((vals >= 0) & (vals <= 1)).all()
    # the model genuinely ranks well → estimates should be clearly > 0.5
    assert res[res.method == "roc_auc"]["value"].min() > 0.7


def test_cbpe_binary_confusion_matrix_normalization(spark, cbpe_frame):
    """Estimated CM normalization parity (ref metrics.py:1404-1498): 'true'
    rows and 'pred' columns each sum to 1; 'all' sums to 1 across cells."""
    sdf, _ = cbpe_frame
    from spark_validate.chunking import SizeBasedChunker

    out = {}
    for norm in (None, "all", "true", "pred"):
        est = CBPE(
            metrics=("confusion_matrix",),
            y_true="y_true",
            y_pred="y_pred",
            y_pred_proba="score",
            normalize_confusion_matrix=norm,
            chunker=SizeBasedChunker(chunk_size=1000, order_by=["id"]),
        ).fit(sdf.filter("is_ref"))
        res = est.estimate(sdf.filter("NOT is_ref")).toPandas()
        out[norm] = res.pivot_table(index="chunk_index", columns="method", values="value")
    raw = out[None]
    tot = raw.sum(axis=1)
    allp = out["all"]
    assert np.allclose(allp.sum(axis=1), 1.0)
    assert np.allclose(allp["true_positive"], raw["true_positive"] / tot)
    t = out["true"]
    assert np.allclose(t["true_positive"] + t["false_negative"], 1.0)
    assert np.allclose(t["true_negative"] + t["false_positive"], 1.0)
    p = out["pred"]
    assert np.allclose(p["true_positive"] + p["false_positive"], 1.0)
    assert np.allclose(p["true_negative"] + p["false_negative"], 1.0)


def test_cbpe_multiclass_sampling_errors_present(mc_frame):
    _, sdf = mc_frame
    from spark_validate.chunking import SizeBasedChunker

    classes = sorted(r[0] for r in sdf.select("y_true").distinct().collect())
    est = CBPE(
        metrics=("accuracy", "f1", "roc_auc"),
        problem_type="multiclass_classification",
        y_pred_proba={c: f"p_{c}" for c in classes},
        chunker=SizeBasedChunker(chunk_size=1000, order_by=["id"]),
    ).fit(sdf.filter("is_ref"))
    res = est.estimate(sdf.filter("NOT is_ref")).toPandas()
    for mth in ("accuracy", "f1", "roc_auc"):
        g = res[res.method == mth]
        assert g["sampling_error"].notna().all(), mth
        assert (g["sampling_error"] > 0).all(), mth
        assert g["upper_confidence_boundary"].notna().all(), mth
