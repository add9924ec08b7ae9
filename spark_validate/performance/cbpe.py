"""CBPE — Confidence-Based Performance Estimation (reference
`nannyml/performance_estimation/confidence_based/cbpe.py:56-592` +
`metrics.py`).

Estimates classification performance WITHOUT labels: calibrate the model's
scores on the reference period (isotonic, `calibration.py:120-149`), then
treat each calibrated score as the probability the row is positive and build
the *expected* confusion matrix per chunk:

    TP = Σ p̂·1[pred=1]   FP = Σ (1−p̂)·1[pred=1]
    FN = Σ p̂·1[pred=0]   TN = Σ (1−p̂)·1[pred=0]      (metrics.py:762-787)

Every label-style estimated metric is then a closed-form expression over one
``groupBy(chunk)`` pass. Estimated ROC-AUC/AP integrate a synthetic
ROC/PR curve from the calibrated masses in uncalibrated-score order
(metrics.py:444-480, 596-645) — expressed with per-chunk windows, no UDF.

Calibration itself is applied with a broadcast piecewise-linear lookup in an
Arrow-batched ``pandas_udf`` (np.interp over the fitted isotonic breakpoints).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks, join_headers_long
from spark_validate.performance.calculator import _safe_div
from spark_validate.calibration import IsotonicCalibrator, NoopCalibrator, needs_calibration
from spark_validate.chunking import CHUNK_KEY, Chunker, DefaultChunker
from spark_validate.performance.calculator import PerformanceCalculator
from spark_validate.result import conform_result
from spark_validate.thresholds import StandardDeviationThreshold, alert_expr

CBPE_METRICS = (
    "roc_auc",
    "average_precision",
    "f1",
    "precision",
    "recall",
    "specificity",
    "accuracy",
    "business_value",
    "confusion_matrix",
)

_LIMITS = {m: (0.0, 1.0) for m in ("roc_auc", "average_precision", "f1", "precision", "recall", "specificity", "accuracy")}


@dataclass
class CBPE:
    """fit(reference with labels) → estimate(analysis without labels)."""

    metrics: Sequence[str]
    y_true: str = "y_true"
    y_pred: str = "y_pred"
    y_pred_proba: object = "y_pred_proba"  # str (binary) | Dict[class, col] (multiclass)
    problem_type: str = "binary_classification"
    chunker: Chunker = field(default_factory=DefaultChunker)
    threshold: object = field(default_factory=StandardDeviationThreshold)
    business_value_matrix: Optional[Sequence[Sequence[float]]] = None
    normalize_confusion_matrix: Optional[str] = None  # None|'all'|'true'|'pred'
    normalize_business_value: Optional[str] = None  # None | 'per_prediction'
    calibration_sample: int = 500_000

    def __post_init__(self):
        bad = set(self.metrics) - set(CBPE_METRICS)
        if bad:
            raise ValueError(f"unknown CBPE metrics {sorted(bad)}")
        if self.problem_type not in ("binary_classification", "multiclass_classification"):
            raise ValueError(f"CBPE problem_type must be classification, got {self.problem_type!r}")
        if self.problem_type == "multiclass_classification":
            if not isinstance(self.y_pred_proba, dict):
                raise ValueError(
                    "multiclass CBPE requires y_pred_proba as a dict mapping class → proba column "
                    "(ref cbpe.py:539-580)"
                )
            self.classes = sorted(self.y_pred_proba.keys())
            if "business_value" in self.metrics:
                k = len(self.classes)
                bvm = self.business_value_matrix
                if bvm is None or len(bvm) != k or any(len(r) != k for r in bvm):
                    raise ValueError(f"multiclass business_value_matrix must be {k}×{k}")
        else:
            self.classes = None
            if "business_value" in self.metrics and self.business_value_matrix is None:
                raise ValueError("business_value requires business_value_matrix")
        self._calibrator = None
        self._calibrators: Optional[Dict] = None  # multiclass: class → calibrator
        self._thresholds: Dict[str, Tuple[Optional[float], Optional[float]]] = {}
        self._se: Dict[str, dict] = {}
        self._fitted = False

    # -------------------------------------------------------------- calibration

    def _fit_calibrator(self, reference: DataFrame) -> None:
        """Collect a seeded reference (score, label) sample — thin columns
        only; 10^12-row references are sampled, which is statistically ample
        for 1-D monotone fits — decide need, fit isotonic.

        Multiclass (ref cbpe.py:539-552 _fit_calibrators): one calibrator per
        class on the one-vs-rest binarized labels, fitted from the SAME
        sample collect."""
        n = reference.count()
        frac = min(1.0, self.calibration_sample / max(n, 1))
        if self.problem_type == "multiclass_classification":
            cols = [F.col(self.y_true).cast("string").alias("y")] + [
                F.col(self.y_pred_proba[c]).cast("double").alias(f"p_{i}")
                for i, c in enumerate(self.classes)
            ]
            pdf = reference.select(*cols).dropna().sample(fraction=frac, seed=42).toPandas()
            self._calibrators = {}
            for i, c in enumerate(self.classes):
                y = (pdf["y"] == str(c)).to_numpy(dtype=float)
                p = pdf[f"p_{i}"].to_numpy()
                if needs_calibration(y, p):
                    self._calibrators[c] = IsotonicCalibrator().fit(p, y)
                else:
                    self._calibrators[c] = NoopCalibrator().fit(p, y)
            return
        pdf = (
            reference.select(
                F.col(self.y_pred_proba).cast("double").alias("p"),
                F.col(self.y_true).cast("double").alias("y"),
            )
            .dropna()
            .sample(fraction=frac, seed=42)
            .toPandas()
        )
        p, y = pdf["p"].to_numpy(), pdf["y"].to_numpy()
        if needs_calibration(y, p):
            self._calibrator = IsotonicCalibrator().fit(p, y)
        else:
            self._calibrator = NoopCalibrator().fit(p, y)

    def _with_calibrated(self, df: DataFrame) -> DataFrame:
        """Add calibrated probability column via broadcast np.interp."""
        if isinstance(self._calibrator, NoopCalibrator):
            return df.withColumn("_cal_p", F.col(self.y_pred_proba).cast("double"))
        xs = self._calibrator._x
        ys = self._calibrator._y
        bx = df.sparkSession.sparkContext.broadcast((xs, ys))

        @F.pandas_udf("double")
        def _interp(p: pd.Series) -> pd.Series:
            x, y = bx.value
            return pd.Series(np.interp(p.to_numpy(dtype=np.float64), x, y))

        return df.withColumn("_cal_p", _interp(F.col(self.y_pred_proba).cast("double")))

    def _with_calibrated_mc(self, df: DataFrame) -> DataFrame:
        """Add ``_cal`` — the per-class calibrated probabilities, renormalized
        to sum 1 per row with a uniform fallback when the calibrated sum is 0
        (ref cbpe.py:556-580 _calibrate_predicted_probabilities)."""
        params = []
        for c in self.classes:
            cal = self._calibrators[c]
            if isinstance(cal, NoopCalibrator):
                params.append(None)
            else:
                params.append((cal._x, cal._y))
        bx = df.sparkSession.sparkContext.broadcast(params)
        k = len(self.classes)

        @F.pandas_udf("array<double>")
        def _cal_all(probas: pd.Series) -> pd.Series:
            ps = bx.value
            mat = np.stack(probas.to_numpy())  # (rows, k)
            out = np.empty_like(mat, dtype=np.float64)
            for i, xy in enumerate(ps):
                col = mat[:, i].astype(np.float64)
                out[:, i] = col if xy is None else np.interp(col, xy[0], xy[1])
            denom = out.sum(axis=1, keepdims=True)
            uniform = np.full_like(out, 1.0 / k)
            out = np.divide(out, denom, out=uniform, where=denom != 0)
            return pd.Series(list(out))

        # NULL probabilities must DROP the row (reference common_nan_removal,
        # mirroring the binary path) — F.array never yields NULL and Arrow
        # delivers null elements as NaN, which would otherwise poison every
        # aggregate in the row's chunk
        cols = [F.col(self.y_pred_proba[c]).cast("double") for c in self.classes]
        complete = df
        for col in cols:
            complete = complete.filter(col.isNotNull())
        arr = F.array(*cols)
        return complete.withColumn("_cal", _cal_all(arr))

    # -------------------------------------------------------------- estimation

    def _estimated_chunk_values(self, df: DataFrame) -> Tuple[DataFrame, DataFrame]:
        if self.problem_type == "multiclass_classification":
            return self._estimated_chunk_values_mc(df)
        assigned, headers = assign_chunks(self._with_calibrated(df), self.chunker)
        p = F.col("_cal_p")
        pred = F.col(self.y_pred).cast("double")
        ok = p.isNotNull() & pred.isNotNull()
        counts = assigned.groupBy(CHUNK_KEY).agg(
            F.sum(F.when(ok & (pred == 1), p).otherwise(F.lit(0.0))).alias("tp"),
            F.sum(F.when(ok & (pred == 1), 1 - p).otherwise(F.lit(0.0))).alias("fp"),
            F.sum(F.when(ok & (pred == 0), p).otherwise(F.lit(0.0))).alias("fn"),
            F.sum(F.when(ok & (pred == 0), 1 - p).otherwise(F.lit(0.0))).alias("tn"),
            F.count(F.when(ok, 1)).alias("n_chunk"),
        )
        exprs: Dict[str, F.Column] = {}
        tot = F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
        # _safe_div throughout: a chunk with zero predicted positives (or
        # all-NULL probas) must yield NULL, not an ANSI DIVIDE_BY_ZERO that
        # kills the whole estimate job — the realized path already guards
        if "accuracy" in self.metrics:
            exprs["accuracy"] = _safe_div(F.col("tp") + F.col("tn"), tot)
        if "precision" in self.metrics:
            exprs["precision"] = _safe_div(F.col("tp"), F.col("tp") + F.col("fp"))
        if "recall" in self.metrics:
            exprs["recall"] = _safe_div(F.col("tp"), F.col("tp") + F.col("fn"))
        if "specificity" in self.metrics:
            exprs["specificity"] = _safe_div(F.col("tn"), F.col("tn") + F.col("fp"))
        if "f1" in self.metrics:
            # estimate_f1 (metrics.py:762-787): TP / (TP + 0.5(FP+FN))
            exprs["f1"] = _safe_div(
                F.col("tp"), F.col("tp") + 0.5 * (F.col("fp") + F.col("fn"))
            )
        if "business_value" in self.metrics:
            (tn_v, fp_v), (fn_v, tp_v) = self.business_value_matrix
            if self.normalize_business_value == "per_prediction":
                # reference confidence_based/metrics.py:2298-2301: the cm
                # normalizes PER PREDICTED-CLASS COLUMN (cm/cm.sum(axis=0),
                # NaN→0), i.e. pred-0 cells over tn+fn, pred-1 over fp+tp
                pred0 = F.col("tn") + F.col("fn")
                pred1 = F.col("fp") + F.col("tp")
                bv = (
                    F.coalesce(_safe_div(F.col("tn"), pred0), F.lit(0.0)) * F.lit(float(tn_v))
                    + F.coalesce(_safe_div(F.col("fn"), pred0), F.lit(0.0)) * F.lit(float(fn_v))
                    + F.coalesce(_safe_div(F.col("fp"), pred1), F.lit(0.0)) * F.lit(float(fp_v))
                    + F.coalesce(_safe_div(F.col("tp"), pred1), F.lit(0.0)) * F.lit(float(tp_v))
                )
            else:
                bv = (
                    F.col("tn") * F.lit(float(tn_v))
                    + F.col("fp") * F.lit(float(fp_v))
                    + F.col("fn") * F.lit(float(fn_v))
                    + F.col("tp") * F.lit(float(tp_v))
                )
            exprs["business_value"] = bv
        parts = []
        if exprs:
            pairs = [F.struct(F.lit(m).alias("method"), v.cast("double").alias("value")) for m, v in exprs.items()]
            parts.append(
                counts.select(CHUNK_KEY, "n_chunk", F.explode(F.array(*pairs)).alias("kv")).select(
                    CHUNK_KEY, "n_chunk", "kv.method", "kv.value"
                )
            )
        if "confusion_matrix" in self.metrics:
            # expected-count cells with the reference's normalization options
            # (metrics.py:1404-1498): 'all' = /total, 'true' = per actual row
            # (tn,fp over expected negatives; fn,tp over expected positives),
            # 'pred' = per predicted column
            tp, tn, fp, fn = F.col("tp"), F.col("tn"), F.col("fp"), F.col("fn")
            norm = self.normalize_confusion_matrix
            # expected counts are sums of calibrated probas and can hit 0
            # (e.g. a chunk whose calibrated positives are all exactly 0) —
            # NULL, not ANSI DIVIDE_BY_ZERO
            if norm == "all":
                d = tp + tn + fp + fn
                tp, tn, fp, fn = (_safe_div(x, d) for x in (tp, tn, fp, fn))
            elif norm == "true":
                tp, fn = _safe_div(tp, tp + fn), _safe_div(fn, tp + fn)
                tn, fp = _safe_div(tn, tn + fp), _safe_div(fp, tn + fp)
            elif norm == "pred":
                tp, fp = _safe_div(tp, tp + fp), _safe_div(fp, tp + fp)
                tn, fn = _safe_div(tn, tn + fn), _safe_div(fn, tn + fn)
            cm = [
                F.struct(F.lit("true_positive").alias("method"), tp.cast("double").alias("value")),
                F.struct(F.lit("true_negative").alias("method"), tn.cast("double").alias("value")),
                F.struct(F.lit("false_positive").alias("method"), fp.cast("double").alias("value")),
                F.struct(F.lit("false_negative").alias("method"), fn.cast("double").alias("value")),
            ]
            parts.append(
                counts.select(CHUNK_KEY, "n_chunk", F.explode(F.array(*cm)).alias("kv")).select(
                    CHUNK_KEY, "n_chunk", "kv.method", "kv.value"
                )
            )
        if "roc_auc" in self.metrics:
            parts.append(self._estimate_auc(assigned).join(counts.select(CHUNK_KEY, "n_chunk"), CHUNK_KEY))
        if "average_precision" in self.metrics:
            parts.append(self._estimate_ap(assigned).join(counts.select(CHUNK_KEY, "n_chunk"), CHUNK_KEY))
        out = parts[0]
        for x in parts[1:]:
            out = out.unionByName(x)
        return out, headers

    def _estimated_chunk_values_mc(self, df: DataFrame) -> Tuple[DataFrame, DataFrame]:
        """Multiclass estimation (ref metrics.py:2340-3580): macro means of
        one-vs-rest binary estimates over renormalized per-class calibrated
        probabilities; accuracy = E[p̂ of the predicted class]; expected k×k
        confusion matrix cm[i,j] = Σ_{pred=c_j} p̂_i."""
        assigned, headers = assign_chunks(self._with_calibrated_mc(df), self.chunker)
        classes = self.classes
        k = len(classes)
        pred = F.col(self.y_pred).cast("string")
        ok = pred.isNotNull() & F.col("_cal").isNotNull()
        assigned = assigned.filter(ok)
        cal = lambda i: F.element_at("_cal", i + 1)  # noqa: E731
        # probability of the predicted class (0 when pred outside classes —
        # matches max(onehot·probas) in metrics.py:3018-3021)
        p_pred = F.lit(0.0)
        for i, c in enumerate(classes):
            p_pred = F.when(pred == str(c), cal(i)).otherwise(p_pred)

        cc = [
            F.struct(
                F.lit(str(c)).alias("cls"),
                F.sum(F.when(pred == str(c), cal(i)).otherwise(F.lit(0.0))).alias("tp"),
                F.sum(F.when(pred == str(c), 1 - cal(i)).otherwise(F.lit(0.0))).alias("fp"),
                F.sum(F.when(pred != str(c), cal(i)).otherwise(F.lit(0.0))).alias("fn"),
                F.sum(F.when(pred != str(c), 1 - cal(i)).otherwise(F.lit(0.0))).alias("tn"),
            )
            for i, c in enumerate(classes)
        ]
        cm_cells = [
            F.struct(
                F.lit(f"true_{classes[i]}_pred_{classes[j]}").alias("cell"),
                F.lit(i).alias("i"),
                F.lit(j).alias("j"),
                F.sum(F.when(pred == str(classes[j]), cal(i)).otherwise(F.lit(0.0))).alias("v"),
            )
            for i in range(k)
            for j in range(k)
        ]
        agg = assigned.groupBy(CHUNK_KEY).agg(
            F.array(*cc).alias("_cc"),
            F.array(*cm_cells).alias("_cm"),
            F.avg(p_pred).alias("_acc"),
            F.count(F.lit(1)).alias("n_chunk"),
        )
        n_by_chunk = agg.select(CHUNK_KEY, "n_chunk")
        parts = []
        ovr_metrics = {"precision", "recall", "specificity", "f1"} & set(self.metrics)
        if ovr_metrics or "accuracy" in self.metrics:
            percls = agg.select(CHUNK_KEY, "_acc", "n_chunk", F.explode("_cc").alias("c")).select(
                CHUNK_KEY, "_acc", "n_chunk", "c.tp", "c.fp", "c.fn", "c.tn"
            )
            exprs = {
                # zero-able expected denominators → NULL; F.avg skips nulls,
                # matching the realized macro path
                "precision": _safe_div(F.col("tp"), F.col("tp") + F.col("fp")),
                "recall": _safe_div(F.col("tp"), F.col("tp") + F.col("fn")),
                "specificity": _safe_div(F.col("tn"), F.col("tn") + F.col("fp")),
                # estimate_f1 (metrics.py:762-787)
                "f1": _safe_div(F.col("tp"), F.col("tp") + 0.5 * (F.col("fp") + F.col("fn"))),
            }
            macro = percls.groupBy(CHUNK_KEY).agg(
                F.max("_acc").alias("accuracy"),
                F.max("n_chunk").alias("n_chunk"),
                *[F.avg(e).alias(m) for m, e in exprs.items() if m in ovr_metrics],
            )
            pairs = [
                F.struct(F.lit(m).alias("method"), F.col(m).cast("double").alias("value"))
                for m in self.metrics
                if m in ("accuracy", "precision", "recall", "specificity", "f1")
            ]
            parts.append(
                macro.select(CHUNK_KEY, "n_chunk", F.explode(F.array(*pairs)).alias("kv")).select(
                    CHUNK_KEY, "n_chunk", "kv.method", "kv.value"
                )
            )
        for metric, fn in (("roc_auc", self._estimate_auc), ("average_precision", self._estimate_ap)):
            if metric not in self.metrics:
                continue
            per_cls = []
            for i, c in enumerate(classes):
                one = assigned.withColumn("_cal_c", cal(i))
                per_cls.append(
                    fn(one, score_col=F.col(self.y_pred_proba[c]), cal_col="_cal_c").select(
                        CHUNK_KEY, "value"
                    )
                )
            ovr = per_cls[0]
            for a in per_cls[1:]:
                ovr = ovr.unionByName(a)
            parts.append(
                ovr.groupBy(CHUNK_KEY)
                .agg(F.avg("value").alias("value"))
                .join(n_by_chunk, CHUNK_KEY)
                .select(CHUNK_KEY, "n_chunk", F.lit(metric).alias("method"), "value")
            )
        if {"confusion_matrix", "business_value"} & set(self.metrics):
            cells = agg.select(CHUNK_KEY, "n_chunk", F.explode("_cm").alias("c")).select(
                CHUNK_KEY, "n_chunk", "c.cell", "c.i", "c.j", "c.v"
            )
            w_chunk = Window.partitionBy(CHUNK_KEY)
            w_row = Window.partitionBy(CHUNK_KEY, "i")
            w_col = Window.partitionBy(CHUNK_KEY, "j")
            if "confusion_matrix" in self.metrics:
                norm = self.normalize_confusion_matrix
                v = F.col("v")
                # expected-count rows/cols can sum to 0 for absent classes
                if norm == "all":
                    v = _safe_div(v, F.sum("v").over(w_chunk))
                elif norm == "true":
                    v = _safe_div(v, F.sum("v").over(w_row))
                elif norm == "pred":
                    v = _safe_div(v, F.sum("v").over(w_col))
                parts.append(
                    cells.select(
                        CHUNK_KEY, "n_chunk", F.col("cell").alias("method"), v.cast("double").alias("value")
                    )
                )
            if "business_value" in self.metrics:
                bvm = self.business_value_matrix
                vexpr = F.lit(0.0)
                for i in range(k):
                    for j in range(k):
                        vexpr = F.when((F.col("i") == i) & (F.col("j") == j), F.lit(float(bvm[i][j]))).otherwise(vexpr)
                cm = F.col("v")
                if self.normalize_business_value == "per_prediction":
                    colsum = F.sum("v").over(w_col)
                    cm = F.when(colsum > 0, F.col("v") / colsum).otherwise(F.lit(0.0))
                scored = cells.select(CHUNK_KEY, "n_chunk", (cm * vexpr).alias("_cmv"))
                parts.append(
                    scored.groupBy(CHUNK_KEY, "n_chunk")
                    .agg(F.sum("_cmv").cast("double").alias("value"))
                    .select(CHUNK_KEY, "n_chunk", F.lit("business_value").alias("method"), "value")
                )
        out = parts[0]
        for x in parts[1:]:
            out = out.unionByName(x)
        return out, headers

    def _roc_points(self, assigned: DataFrame, score_col=None, cal_col="_cal_p") -> DataFrame:
        """Per-row synthetic ROC point in uncalibrated-score descending order
        (metrics.py:466-480): tps=cum(calibrated) rounded to 5, fps=rank−tps."""
        s = (score_col if score_col is not None else F.col(self.y_pred_proba)).cast("double")
        df = assigned.select(CHUNK_KEY, s.alias("_s"), F.col(cal_col).alias("_p")).filter(
            F.col("_s").isNotNull() & F.col("_p").isNotNull()
        )
        w = Window.partitionBy(CHUNK_KEY).orderBy(F.desc("_s"), F.desc("_p")).rowsBetween(
            Window.unboundedPreceding, 0
        )
        w_rank = Window.partitionBy(CHUNK_KEY).orderBy(F.desc("_s"), F.desc("_p"))
        return (
            df.withColumn("_tps", F.round(F.sum("_p").over(w), 5))
            .withColumn("_rank", F.row_number().over(w_rank))
            .withColumn("_fps", F.round(F.col("_rank") - F.sum("_p").over(w), 5))
        )

    def _estimate_auc(self, assigned: DataFrame, score_col=None, cal_col="_cal_p") -> DataFrame:
        pts = self._roc_points(assigned, score_col, cal_col)
        w_tot = Window.partitionBy(CHUNK_KEY)
        pts = pts.withColumn("_tp_tot", F.max("_tps").over(w_tot)).withColumn(
            "_fp_tot", F.max("_fps").over(w_tot)
        )
        w_lag = Window.partitionBy(CHUNK_KEY).orderBy("_rank")
        tpr = F.col("_tps") / F.col("_tp_tot")
        fpr = F.col("_fps") / F.col("_fp_tot")
        tpr_prev = F.coalesce(F.lag(tpr).over(w_lag), F.lit(0.0))
        fpr_prev = F.coalesce(F.lag(fpr).over(w_lag), F.lit(0.0))
        with_trap = pts.withColumn("_trap", (fpr - fpr_prev) * (tpr + tpr_prev) / 2)
        return with_trap.groupBy(CHUNK_KEY).agg(F.sum("_trap").cast("double").alias("value")).select(
            CHUNK_KEY, F.lit("roc_auc").alias("method"), "value"
        )

    def _estimate_ap(self, assigned: DataFrame, score_col=None, cal_col="_cal_p") -> DataFrame:
        """estimate_ap (metrics.py:596-645): AP = Σ Δrecall·precision over the
        synthetic PR curve (recall_0 = 0, precision = tps/rank)."""
        pts = self._roc_points(assigned, score_col, cal_col)
        w_tot = Window.partitionBy(CHUNK_KEY)
        pts = pts.withColumn("_tp_tot", F.max("_tps").over(w_tot))
        w_lag = Window.partitionBy(CHUNK_KEY).orderBy("_rank")
        recall = F.col("_tps") / F.col("_tp_tot")
        recall_prev = F.coalesce(F.lag(recall).over(w_lag), F.lit(0.0))
        precision = F.col("_tps") / F.col("_rank")
        with_term = pts.withColumn("_term", (recall - recall_prev) * precision)
        return with_term.groupBy(CHUNK_KEY).agg(F.sum("_term").cast("double").alias("value")).select(
            CHUNK_KEY, F.lit("average_precision").alias("method"), "value"
        )

    # -------------------------------------------------------------- fit / estimate

    def fit(self, reference: DataFrame) -> "CBPE":
        from spark_validate.functions.fitcache import cached_for_fit, chunker_columns

        proba_cols = (
            list(self.y_pred_proba.values())
            if isinstance(self.y_pred_proba, dict)
            else [self.y_pred_proba]
        )
        cols = [self.y_true, self.y_pred] + proba_cols + chunker_columns(self.chunker)
        with cached_for_fit(reference, columns=cols) as ref:
            return self._fit(ref)

    def _fit(self, reference: DataFrame) -> "CBPE":
        self._fit_calibrator(reference)
        # sampling-error components: same closed forms as realized performance
        # (the reference's CBPE metrics reuse the sampling_error/* modules too)
        helper = PerformanceCalculator(
            metrics=tuple(self.metrics),
            problem_type=self.problem_type,
            y_true=self.y_true,
            y_pred=self.y_pred,
            y_pred_proba=self.y_pred_proba,
            business_value_matrix=self.business_value_matrix,
            normalize_business_value=self.normalize_business_value,
            normalize_confusion_matrix=self.normalize_confusion_matrix,
            chunker=self.chunker,
        )
        if self.problem_type == "multiclass_classification":
            helper._classes = [str(c) for c in self.classes]
        helper._fit_se_components(reference)
        self._se = helper._se
        self._fitted = True
        ref_long, ref_headers = self._estimated_chunk_values(reference)
        ref_long = ref_long.persist()
        # generic per-method fit — see PerformanceCalculator._fit
        from spark_validate.thresholds import fit_thresholds_grouped

        for r in fit_thresholds_grouped(ref_long, ["method"], self.threshold).collect():
            lo, up = r["lower_threshold"], r["upper_threshold"]
            lo_l, up_l = _LIMITS.get(r["method"], (None, None))
            if lo is not None and lo_l is not None:
                lo = max(lo, lo_l)
            if up is not None and up_l is not None:
                up = min(up, up_l)
            self._thresholds[r["method"]] = (lo, up)
        self._reference_result = self._finalize(ref_long, ref_headers, "reference")
        ref_long.unpersist()
        return self

    def _finalize(self, long_df: DataFrame, headers, period: str) -> DataFrame:
        from spark_validate.performance.calculator import _clamped_bounds, _thr_frame

        thr = _thr_frame(
            long_df.sparkSession, self._thresholds,
            cm_normalized=getattr(self, 'normalize_confusion_matrix', None) is not None,
        )
        helper = PerformanceCalculator.__new__(PerformanceCalculator)
        helper._se = self._se
        lcb, ucb = _clamped_bounds()
        out = (
            long_df.join(F.broadcast(thr), "method", "left")
            .withColumn("sampling_error", PerformanceCalculator._se_expr(helper))
            .withColumn("lower_confidence_boundary", lcb)
            .withColumn("upper_confidence_boundary", ucb)
            .withColumn("alert", alert_expr())
            .withColumn(
                "column_name",
                F.lit(
                    ",".join(self.y_pred_proba[c] for c in self.classes)
                    if isinstance(self.y_pred_proba, dict)
                    else self.y_pred_proba
                ),
            )
            .drop("n_chunk", "_lim_lo", "_lim_up")
        )
        return conform_result(join_headers_long(out, headers, period))

    def estimate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        if not self._fitted:
            raise RuntimeError("call fit(reference) first")
        long_df, headers = self._estimated_chunk_values(df)
        return self._finalize(long_df, headers, period)

    # runner-protocol alias: estimators "calculate" their estimate
    calculate = estimate

    # ---- JSON state for the FittedStore (the reference pickles fitted
    # estimators via its store; here the state is the calibrator breakpoints
    # + thresholds + sampling-error components — reference_result is not
    # persisted and is unavailable on a store-loaded instance)

    def get_state(self) -> dict:
        if not self._fitted:
            raise RuntimeError("fit first")
        st = {
            "thresholds": {m: [lo, up] for m, (lo, up) in self._thresholds.items()},
            "se": self._se,
        }
        if self._calibrators is not None:
            st["calibrators"] = {str(c): cal.get_state() for c, cal in self._calibrators.items()}
        elif self._calibrator is not None:
            st["calibrator"] = self._calibrator.get_state()
        return st

    def set_state(self, st: dict) -> "CBPE":
        def mk(d):
            return NoopCalibrator() if d.get("noop") else IsotonicCalibrator().set_state(d)

        if st.get("calibrators") is not None:
            self._calibrators = {c: mk(st["calibrators"][str(c)]) for c in self.classes}
        if st.get("calibrator") is not None:
            self._calibrator = mk(st["calibrator"])
        self._thresholds = {m: (v[0], v[1]) for m, v in st["thresholds"].items()}
        self._se = st.get("se", {})
        self._reference_result = None
        self._fitted = True
        return self

    @property
    def reference_result(self) -> DataFrame:
        if not self._fitted:
            raise RuntimeError("not fitted")
        return self._reference_result
