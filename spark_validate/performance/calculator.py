"""Realized performance calculation (reference §2.7,
`nannyml/performance_calculation/**`).

Every label-based metric is a closed-form expression over per-chunk confusion
counts / error sums → ONE ``groupBy(chunk)`` pass computes all of them.
Rank-based metrics (ROC-AUC, average precision) use per-chunk window ranks —
the Mann-Whitney formulation for AUC, threshold-grouped cumulative precision
for AP — still fully distributed, no Python in the path.

Metrics (binary, `metrics/binary_classification.py`): roc_auc :54,
average_precision :145, f1 :241, precision :336, recall :430, specificity
:523, accuracy :608, business_value :688, confusion_matrix :812.
Multiclass (`metrics/multiclass_classification.py`): macro-averaged variants.
Regression (`metrics/regression.py`): mae :42, mape :131, mse :220, msle
:309, rmse :402, rmsle :500.

Sampling errors follow `nannyml/sampling_error/{binary_classification,
regression}.py`: closed forms over reference confusion rates (e.g. accuracy
SE = sqrt(acc·(1−acc))/√n; precision SE = sqrt(p(1−p))/√(n·pos_pred_rate);
f1's correcting-factor variant; MAE/MSE/MSLE SE = std(loss)/√n; RMSE/RMSLE
delta-method). AUROC components use the negatives-below-rank distribution.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks, join_headers_long
from spark_validate.chunking import CHUNK_KEY, Chunker, DefaultChunker
from spark_validate.result import conform_result
from spark_validate.thresholds import StandardDeviationThreshold, alert_expr

BINARY_METRICS = (
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
MULTICLASS_METRICS = (
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
REGRESSION_METRICS = ("mae", "mape", "mse", "msle", "rmse", "rmsle")

def _safe_div(num, den):
    """NULL instead of an ANSI divide-by-zero error when the denominator is 0."""
    return F.when(den != 0, num / den)


_LIMITS = {
    "roc_auc": (0.0, 1.0),
    "average_precision": (0.0, 1.0),
    "f1": (0.0, 1.0),
    "precision": (0.0, 1.0),
    "recall": (0.0, 1.0),
    "specificity": (0.0, 1.0),
    "accuracy": (0.0, 1.0),
}

# confidence boundaries clamp to each metric's value range (the reference
# clips via np.minimum/np.maximum, confidence_based/metrics.py:261-265);
# regression losses are bounded below by 0
_BOUND_LIMITS = {**_LIMITS, **{m: (0.0, None) for m in REGRESSION_METRICS}}


def _is_cm_method(m: str) -> bool:
    return m in ("true_positive", "false_positive", "true_negative", "false_negative") or (
        m.startswith("true_") and "_pred_" in m
    )


def _thr_frame(spark, thresholds: Dict[str, tuple], cm_normalized: bool = False):
    """Broadcastable (method, thresholds, bound limits) helper frame.
    Confusion-matrix cells bound below by 0 (counts) or to [0, 1] when the
    calculator normalizes them to rates."""
    cm_lim = (0.0, 1.0) if cm_normalized else (0.0, None)
    rows = [
        (m, lo, up, *(cm_lim if _is_cm_method(m) else _BOUND_LIMITS.get(m, (None, None))))
        for m, (lo, up) in thresholds.items()
    ] or [(None, None, None, None, None)]
    return spark.createDataFrame(
        rows,
        "method string, lower_threshold double, upper_threshold double, "
        "_lim_lo double, _lim_up double",
    ).filter(F.col("method").isNotNull())


def _clamped_bounds():
    """(lower, upper) confidence-boundary columns clamped to _lim_lo/_lim_up;
    NULL sampling error stays NULL (greatest/least alone would resurrect a
    limit value for a NULL bound — Spark's greatest ignores NULLs)."""
    lcb = F.col("value") - 3 * F.col("sampling_error")
    ucb = F.col("value") + 3 * F.col("sampling_error")
    lo = F.when(lcb.isNotNull() & F.col("_lim_lo").isNotNull(), F.greatest(lcb, F.col("_lim_lo"))).otherwise(lcb)
    up = F.when(ucb.isNotNull() & F.col("_lim_up").isNotNull(), F.least(ucb, F.col("_lim_up"))).otherwise(ucb)
    return lo, up


@dataclass
class PerformanceCalculator:
    """fit(reference) learns thresholds + sampling-error components;
    calculate(analysis) emits one long row per (chunk × metric)."""

    metrics: Sequence[str]
    y_true: str = "y_true"
    y_pred: str = "y_pred"
    y_pred_proba: Optional[str] = None
    problem_type: str = "binary_classification"
    chunker: Chunker = field(default_factory=DefaultChunker)
    threshold: object = field(default_factory=StandardDeviationThreshold)
    business_value_matrix: Optional[Sequence[Sequence[float]]] = None  # [[tn, fp], [fn, tp]]
    normalize_business_value: Optional[str] = None  # None | 'per_prediction'
    normalize_confusion_matrix: Optional[str] = None  # None|'all'|'true'|'pred'

    def __post_init__(self):
        valid = {
            "binary_classification": set(BINARY_METRICS),
            "multiclass_classification": set(MULTICLASS_METRICS),
            "regression": set(REGRESSION_METRICS),
        }[self.problem_type]
        bad = set(self.metrics) - valid
        if bad:
            raise ValueError(f"metrics {sorted(bad)} invalid for {self.problem_type}")
        if "business_value" in self.metrics and self.business_value_matrix is None:
            raise ValueError(
                "business_value requires business_value_matrix "
                "([[tn, fp], [fn, tp]] for binary; k×k value[true_i][pred_j] for multiclass)"
            )
        rank_based = {"roc_auc", "average_precision"} & set(self.metrics)
        if rank_based and not self.y_pred_proba:
            raise ValueError(f"{sorted(rank_based)} need y_pred_proba")
        self._thresholds: Dict[str, Tuple[Optional[float], Optional[float]]] = {}
        self._se: Dict[str, dict] = {}
        self._classes: Optional[list] = None
        self._fitted = False

    # ------------------------------------------------------------------ values

    def _binary_chunk_values(self, assigned: DataFrame) -> DataFrame:
        """All binary metrics from one confusion-count pass + window ranks."""
        yt = F.col(self.y_true).cast("double")
        yp = F.col(self.y_pred).cast("double")
        both = yt.isNotNull() & yp.isNotNull()
        tp = F.sum(F.when(both & (yt == 1) & (yp == 1), 1).otherwise(0)).cast("double")
        fp = F.sum(F.when(both & (yt == 0) & (yp == 1), 1).otherwise(0)).cast("double")
        tn = F.sum(F.when(both & (yt == 0) & (yp == 0), 1).otherwise(0)).cast("double")
        fn = F.sum(F.when(both & (yt == 1) & (yp == 0), 1).otherwise(0)).cast("double")
        counts = assigned.groupBy(CHUNK_KEY).agg(
            tp.alias("tp"), fp.alias("fp"), tn.alias("tn"), fn.alias("fn"),
            # n for the SE formulas counts the LABELED rows the confusion
            # cells actually used — counting unlabeled rows would shrink
            # std/sqrt(n·frac) on partially-labeled chunks (the fit-side
            # invariant at _fit_se_components; the multiclass path filters
            # nulls before counting too)
            F.count(F.when(both, F.lit(1))).alias("n_chunk"),
        )
        exprs: Dict[str, F.Column] = {}
        if "accuracy" in self.metrics:
            exprs["accuracy"] = _safe_div(
                F.col("tp") + F.col("tn"), F.col("tp") + F.col("tn") + F.col("fp") + F.col("fn")
            )
        if "precision" in self.metrics:
            exprs["precision"] = _safe_div(F.col("tp"), F.col("tp") + F.col("fp"))
        if "recall" in self.metrics:
            exprs["recall"] = _safe_div(F.col("tp"), F.col("tp") + F.col("fn"))
        if "specificity" in self.metrics:
            exprs["specificity"] = _safe_div(F.col("tn"), F.col("tn") + F.col("fp"))
        if "f1" in self.metrics:
            exprs["f1"] = _safe_div(2 * F.col("tp"), 2 * F.col("tp") + F.col("fp") + F.col("fn"))
        if "business_value" in self.metrics:
            (tn_v, fp_v), (fn_v, tp_v) = self.business_value_matrix
            if self.normalize_business_value == "per_prediction":
                # reference binary_classification.py:794-797: the cm
                # normalizes PER PREDICTED-CLASS COLUMN (cm/cm.sum(axis=0),
                # NaN→0) — dividing by the grand total would disagree with
                # both the reference and this file's own multiclass path
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
            pairs = [
                F.struct(F.lit(m).alias("method"), v.cast("double").alias("value")) for m, v in exprs.items()
            ]
            parts.append(
                counts.select(
                    CHUNK_KEY, "n_chunk", F.explode(F.array(*pairs)).alias("kv")
                ).select(CHUNK_KEY, "n_chunk", "kv.method", "kv.value")
            )
        if "confusion_matrix" in self.metrics:
            norm = self.normalize_confusion_matrix
            tot = F.col("tp") + F.col("tn") + F.col("fp") + F.col("fn")
            def _n(v, row_tot, col_tot):
                # a chunk can miss a class entirely → zero row/col totals;
                # NULL (not DIVIDE_BY_ZERO under ANSI) like the macro metrics
                if norm == "all":
                    return _safe_div(v, tot)
                if norm == "true":
                    return _safe_div(v, row_tot)
                if norm == "pred":
                    return _safe_div(v, col_tot)
                return v
            cm_pairs = [
                F.struct(F.lit("true_positive").alias("method"), _n(F.col("tp"), F.col("tp") + F.col("fn"), F.col("tp") + F.col("fp")).cast("double").alias("value")),
                F.struct(F.lit("true_negative").alias("method"), _n(F.col("tn"), F.col("tn") + F.col("fp"), F.col("tn") + F.col("fn")).cast("double").alias("value")),
                F.struct(F.lit("false_positive").alias("method"), _n(F.col("fp"), F.col("fp") + F.col("tn"), F.col("fp") + F.col("tp")).cast("double").alias("value")),
                F.struct(F.lit("false_negative").alias("method"), _n(F.col("fn"), F.col("fn") + F.col("tp"), F.col("fn") + F.col("tn")).cast("double").alias("value")),
            ]
            parts.append(
                counts.select(CHUNK_KEY, "n_chunk", F.explode(F.array(*cm_pairs)).alias("kv")).select(
                    CHUNK_KEY, "n_chunk", "kv.method", "kv.value"
                )
            )
        if "roc_auc" in self.metrics:
            parts.append(self._auc_per_chunk(assigned).join(counts.select(CHUNK_KEY, "n_chunk"), CHUNK_KEY))
        if "average_precision" in self.metrics:
            parts.append(self._ap_per_chunk(assigned).join(counts.select(CHUNK_KEY, "n_chunk"), CHUNK_KEY))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _auc_per_chunk(self, assigned: DataFrame, group_cols: Tuple[str, ...] = (CHUNK_KEY,)) -> DataFrame:
        """Mann-Whitney AUC with average ranks for ties — two windows, no UDF.

        ``group_cols`` generalizes the grouping so the one-vs-rest multiclass
        path can rank ALL classes in a single pass (partition by
        (chunk, class)) instead of one window pass per class."""
        yt = F.col(self.y_true).cast("double")
        s = F.col(self.y_pred_proba).cast("double")
        df = assigned.select(*group_cols, yt.alias("_y"), s.alias("_s")).filter(
            F.col("_y").isNotNull() & F.col("_s").isNotNull()
        )
        w_rank = Window.partitionBy(*group_cols).orderBy("_s")
        w_tie = Window.partitionBy(*group_cols, "_s")
        ranked = df.withColumn("_r", F.rank().over(w_rank)).withColumn(
            "_avg_r", F.col("_r") + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0
        )
        agg = ranked.groupBy(*group_cols).agg(
            F.sum(F.when(F.col("_y") == 1, F.col("_avg_r")).otherwise(F.lit(0.0))).alias("_rank_sum"),
            F.sum(F.when(F.col("_y") == 1, 1).otherwise(0)).cast("double").alias("_n1"),
            F.sum(F.when(F.col("_y") == 0, 1).otherwise(0)).cast("double").alias("_n0"),
        )
        auc = (F.col("_rank_sum") - F.col("_n1") * (F.col("_n1") + 1) / 2) / (F.col("_n1") * F.col("_n0"))
        return agg.select(
            *group_cols,
            F.lit("roc_auc").alias("method"),
            F.when((F.col("_n1") > 0) & (F.col("_n0") > 0), auc).cast("double").alias("value"),
        )

    def _ap_per_chunk(self, assigned: DataFrame, group_cols: Tuple[str, ...] = (CHUNK_KEY,)) -> DataFrame:
        """sklearn-equivalent AP: group ties by score, cumulative TP/FP in
        descending-score order, AP = Σ (ΔTP/n_pos) · precision@group.
        ``group_cols`` as in :meth:`_auc_per_chunk`."""
        yt = F.col(self.y_true).cast("double")
        s = F.col(self.y_pred_proba).cast("double")
        df = assigned.select(*group_cols, yt.alias("_y"), s.alias("_s")).filter(
            F.col("_y").isNotNull() & F.col("_s").isNotNull()
        )
        grp = df.groupBy(*group_cols, "_s").agg(
            F.sum("_y").alias("_tp_g"), F.count(F.lit(1)).alias("_n_g")
        )
        w = Window.partitionBy(*group_cols).orderBy(F.desc("_s")).rowsBetween(Window.unboundedPreceding, 0)
        cum = grp.withColumn("_cum_tp", F.sum("_tp_g").over(w)).withColumn("_cum_n", F.sum("_n_g").over(w))
        w_tot = Window.partitionBy(*group_cols)
        cum = cum.withColumn("_n_pos", F.sum("_tp_g").over(w_tot))
        # a chunk with zero positives (possible per OvR class) → NULL AP,
        # not ANSI DIVIDE_BY_ZERO
        term = _safe_div(F.col("_tp_g"), F.col("_n_pos")) * (F.col("_cum_tp") / F.col("_cum_n"))
        agg = cum.groupBy(*group_cols).agg(
            F.sum(term).alias("_ap"), F.max("_n_pos").alias("_n_pos")
        )
        return agg.select(
            *group_cols,
            F.lit("average_precision").alias("method"),
            F.when(F.col("_n_pos") > 0, F.col("_ap")).cast("double").alias("value"),
        )

    def _multiclass_chunk_values(self, assigned: DataFrame) -> DataFrame:
        """Macro-averaged one-vs-rest metrics from a per-(chunk, class)
        confusion pass; accuracy from the plain match rate."""
        yt = F.col(self.y_true).cast("string")
        yp = F.col(self.y_pred).cast("string")
        classes = self._classes
        per_class = []
        for cls in classes:
            is_t = (yt == cls).cast("int")
            is_p = (yp == cls).cast("int")
            per_class.append(
                F.struct(
                    F.lit(cls).alias("cls"),
                    F.sum(is_t * is_p).cast("double").alias("tp"),
                    F.sum((1 - is_t) * is_p).cast("double").alias("fp"),
                    F.sum(is_t * (1 - is_p)).cast("double").alias("fn"),
                    F.sum((1 - is_t) * (1 - is_p)).cast("double").alias("tn"),
                )
            )
        agg = assigned.filter(yt.isNotNull() & yp.isNotNull()).groupBy(CHUNK_KEY).agg(
            F.array(*per_class).alias("_cc"),
            F.avg((yt == yp).cast("double")).alias("_acc"),
            F.count(F.lit(1)).alias("n_chunk"),
        )
        cc = agg.select(CHUNK_KEY, "_acc", "n_chunk", F.explode("_cc").alias("c")).select(
            CHUNK_KEY, "_acc", "n_chunk", "c.cls", "c.tp", "c.fp", "c.fn", "c.tn"
        )
        # null-on-zero denominators (degenerate chunks missing a class would
        # otherwise throw under ANSI mode); F.avg skips nulls in the macro
        exprs = {
            "precision": _safe_div(F.col("tp"), F.col("tp") + F.col("fp")),
            "recall": _safe_div(F.col("tp"), F.col("tp") + F.col("fn")),
            "specificity": _safe_div(F.col("tn"), F.col("tn") + F.col("fp")),
            "f1": _safe_div(2 * F.col("tp"), 2 * F.col("tp") + F.col("fp") + F.col("fn")),
        }
        macro = cc.groupBy(CHUNK_KEY).agg(
            F.max("_acc").alias("accuracy"),
            F.max("n_chunk").alias("n_chunk"),
            *[F.avg(e).alias(m) for m, e in exprs.items() if m in self.metrics],
        )
        pairs = [
            F.struct(F.lit(m).alias("method"), F.col(m).cast("double").alias("value"))
            for m in self.metrics
            if m in ("accuracy", "precision", "recall", "specificity", "f1")
        ]
        n_by_chunk = macro.select(CHUNK_KEY, "n_chunk")
        parts: list = []
        if pairs:
            parts.append(
                macro.select(CHUNK_KEY, "n_chunk", F.explode(F.array(*pairs)).alias("kv")).select(
                    CHUNK_KEY, "n_chunk", "kv.method", "kv.value"
                )
            )

        def _ovr_macro(metric: str, per_chunk_fn: str) -> DataFrame:
            """Macro average of a binary rank metric over one-vs-rest splits —
            ONE exploded pass: rows become (chunk, class, binarized y, class
            score) and the rank windows partition by (chunk, class), instead
            of k separate window passes over the full data."""
            splits = F.array(
                *[
                    F.struct(
                        F.lit(str(cls)).alias("_cls"),
                        (yt == cls).cast("double").alias("_y1"),
                        F.col(self._proba_col(cls)).cast("double").alias("_s1"),
                    )
                    for cls in classes
                ]
            )
            one = assigned.select(CHUNK_KEY, F.explode(splits).alias("kv")).select(
                CHUNK_KEY, "kv._cls", "kv._y1", "kv._s1"
            )
            helper = PerformanceCalculator(
                metrics=(metric,), y_true="_y1", y_pred=self.y_pred, y_pred_proba="_s1",
                chunker=self.chunker,
            )
            per_cls = getattr(helper, per_chunk_fn)(one, group_cols=(CHUNK_KEY, "_cls"))
            return per_cls.groupBy(CHUNK_KEY).agg(F.avg("value").alias("value"))

        if "roc_auc" in self.metrics:
            parts.append(
                _ovr_macro("roc_auc", "_auc_per_chunk").join(n_by_chunk, CHUNK_KEY).select(
                    CHUNK_KEY, "n_chunk", F.lit("roc_auc").alias("method"), "value"
                )
            )
        if "average_precision" in self.metrics:
            # macro OVR AP (ref multiclass_classification.py:920-1024); NaN
            # when a chunk holds a single target class
            nuniq = assigned.filter(yt.isNotNull()).groupBy(CHUNK_KEY).agg(
                F.countDistinct(yt).alias("_nu")
            )
            ap = (
                _ovr_macro("average_precision", "_ap_per_chunk")
                .join(nuniq, CHUNK_KEY)
                .select(CHUNK_KEY, F.when(F.col("_nu") > 1, F.col("value")).alias("value"))
            )
            parts.append(
                ap.join(n_by_chunk, CHUNK_KEY).select(
                    CHUNK_KEY, "n_chunk", F.lit("average_precision").alias("method"), "value"
                )
            )
        if {"confusion_matrix", "business_value"} & set(self.metrics):
            parts.extend(self._multiclass_cm_parts(assigned, n_by_chunk, yt, yp, classes))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _multiclass_cm_parts(self, assigned, n_by_chunk, yt, yp, classes) -> list:
        """k×k confusion counts per chunk, densified over the fitted classes
        (ref multiclass_classification.py:714-918 confusion_matrix with
        sklearn labels= semantics, :1039-1184 business_value = Σ value·cm)."""
        spark = assigned.sparkSession
        cls_strs = [str(c) for c in classes]
        pc = (
            assigned.filter(yt.isNotNull() & yp.isNotNull() & yt.isin(cls_strs) & yp.isin(cls_strs))
            .groupBy(CHUNK_KEY, yt.alias("_t"), yp.alias("_p"))
            .agg(F.count(F.lit(1)).cast("double").alias("_c"))
        )
        cells = F.broadcast(
            spark.createDataFrame([(t, p) for t in cls_strs for p in cls_strs], "_t string, _p string")
        )
        dense = (
            n_by_chunk.crossJoin(cells)
            .join(pc, [CHUNK_KEY, "_t", "_p"], "left")
            .withColumn("_c", F.coalesce(F.col("_c"), F.lit(0.0)))
        )
        w_chunk = Window.partitionBy(CHUNK_KEY)
        w_row = Window.partitionBy(CHUNK_KEY, "_t")
        w_col = Window.partitionBy(CHUNK_KEY, "_p")
        parts = []
        if "confusion_matrix" in self.metrics:
            norm = self.normalize_confusion_matrix
            v = F.col("_c")
            # dense k×k frame includes all-zero rows/cols for classes absent
            # from a chunk → guard every normalization denominator (NULL, not
            # ANSI DIVIDE_BY_ZERO)
            if norm == "all":
                v = _safe_div(v, F.sum("_c").over(w_chunk))
            elif norm == "true":
                v = _safe_div(v, F.sum("_c").over(w_row))
            elif norm == "pred":
                v = _safe_div(v, F.sum("_c").over(w_col))
            parts.append(
                dense.select(
                    CHUNK_KEY,
                    "n_chunk",
                    F.concat(F.lit("true_"), F.col("_t"), F.lit("_pred_"), F.col("_p")).alias("method"),
                    v.cast("double").alias("value"),
                )
            )
        if "business_value" in self.metrics:
            bvm = self.business_value_matrix
            vals = [
                (cls_strs[i], cls_strs[j], float(bvm[i][j]))
                for i in range(len(classes))
                for j in range(len(classes))
            ]
            vmap = F.broadcast(spark.createDataFrame(vals, "_t string, _p string, _v double"))
            cm = F.col("_c")
            if self.normalize_business_value == "per_prediction":
                colsum = F.sum("_c").over(w_col)
                cm = F.when(colsum > 0, F.col("_c") / colsum).otherwise(F.lit(0.0))
            scored = dense.join(vmap, ["_t", "_p"]).select(
                CHUNK_KEY, "n_chunk", (cm * F.col("_v")).alias("_cmv")
            )
            parts.append(
                scored.groupBy(CHUNK_KEY, "n_chunk").agg(F.sum("_cmv").cast("double").alias("value")).select(
                    CHUNK_KEY, "n_chunk", F.lit("business_value").alias("method"), "value"
                )
            )
        return parts

    def _proba_col(self, cls) -> str:
        """Multiclass probas: dict-style column mapping {class: column}."""
        if isinstance(self.y_pred_proba, dict):
            return self.y_pred_proba[cls]
        return f"{self.y_pred_proba}_{cls}"

    def _regression_chunk_values(self, assigned: DataFrame) -> DataFrame:
        yt = F.col(self.y_true).cast("double")
        yp = F.col(self.y_pred).cast("double")
        err = yt - yp
        exprs = {
            "mae": F.avg(F.abs(err)),
            # sklearn mean_absolute_percentage_error clamps the denominator
            # at machine eps — a y_true of exactly 0 must not ANSI-crash the job
            "mape": F.avg(F.abs(err) / F.greatest(F.abs(yt), F.lit(2.220446049250313e-16))),
            "mse": F.avg(err * err),
            "msle": F.avg(F.pow(F.log1p(yt) - F.log1p(yp), 2)),
            "rmse": F.sqrt(F.avg(err * err)),
            "rmsle": F.sqrt(F.avg(F.pow(F.log1p(yt) - F.log1p(yp), 2))),
        }
        aggs = [F.count(F.lit(1)).alias("n_chunk")] + [
            exprs[m].alias(m) for m in self.metrics
        ]
        wide = assigned.filter(yt.isNotNull() & yp.isNotNull()).groupBy(CHUNK_KEY).agg(*aggs)
        pairs = [F.struct(F.lit(m).alias("method"), F.col(m).cast("double").alias("value")) for m in self.metrics]
        return wide.select(CHUNK_KEY, "n_chunk", F.explode(F.array(*pairs)).alias("kv")).select(
            CHUNK_KEY, "n_chunk", "kv.method", "kv.value"
        )

    def _chunk_values(self, df: DataFrame):
        assigned, headers = assign_chunks(df, self.chunker)
        if self.problem_type == "binary_classification":
            return self._binary_chunk_values(assigned), headers
        if self.problem_type == "multiclass_classification":
            return self._multiclass_chunk_values(assigned), headers
        return self._regression_chunk_values(assigned), headers

    # ------------------------------------------------------------------ fit

    def _fit_se_components(self, reference: DataFrame) -> None:
        """Closed-form sampling-error components from one reference pass."""
        yt = F.col(self.y_true).cast("double")
        yp = F.col(self.y_pred).cast("double")
        se: Dict[str, dict] = {}
        if self.problem_type == "binary_classification":
            # null labels/predictions are excluded from every cell, so n must
            # exclude them too (the multiclass branch already filters)
            reference = reference.filter(yt.isNotNull() & yp.isNotNull())
            aggs = [
                F.avg((yt == yp).cast("double")).alias("acc"),
                F.avg(yp).alias("pos_pred_rate"),
                F.avg(yt).alias("pos_rate"),
                F.sum(((yt == 1) & (yp == 1)).cast("double")).alias("tp"),
                F.sum(((yt == 0) & (yp == 1)).cast("double")).alias("fp"),
                F.sum(((yt == 1) & (yp == 0)).cast("double")).alias("fn"),
                F.sum(((yt == 0) & (yp == 0)).cast("double")).alias("tn"),
                F.count(F.lit(1)).alias("n"),
            ]
            if "business_value" in self.metrics and self.business_value_matrix is not None:
                # ride the same pass (was a second stddev job over the frame)
                (tn_v, fp_v), (fn_v, tp_v) = self.business_value_matrix
                w_bv = (
                    F.when((yt == 1) & (yp == 1), float(tp_v))
                    .when((yt == 0) & (yp == 0), float(tn_v))
                    .when((yt == 0) & (yp == 1), float(fp_v))
                    .otherwise(float(fn_v))
                )
                aggs.append(F.stddev_pop(w_bv).alias("bv_std"))
            row = reference.agg(*aggs).first()
            acc, n = row["acc"], row["n"]
            tp, fp, fn, tn = row["tp"], row["fp"], row["fn"], row["tn"]
            se["accuracy"] = {"std": math.sqrt(max(acc * (1 - acc), 0.0))}
            prec = tp / (tp + fp) if (tp + fp) > 0 else float("nan")
            se["precision"] = {
                "std": math.sqrt(max(prec * (1 - prec), 0.0)) if prec == prec else float("nan"),
                "fraction": row["pos_pred_rate"],
            }
            rec = tp / (tp + fn) if (tp + fn) > 0 else float("nan")
            se["recall"] = {
                "std": math.sqrt(max(rec * (1 - rec), 0.0)) if rec == rec else float("nan"),
                "fraction": row["pos_rate"],
            }
            spec = tn / (tn + fp) if (tn + fp) > 0 else float("nan")
            se["specificity"] = {
                "std": math.sqrt(max(spec * (1 - spec), 0.0)) if spec == spec else float("nan"),
                "fraction": 1 - row["pos_rate"],
            }
            rel = tp + fp + fn
            if rel > 0:
                cf = rel / ((fp + fn) * 0.5 + tp)
                q = tp / rel
                se["f1"] = {"std": cf * math.sqrt(max(q * (1 - q), 0.0)), "fraction": rel / n}
            if "roc_auc" in self.metrics and self.y_pred_proba:
                se["roc_auc"] = self._fit_auroc_se(reference)
            if "average_precision" in self.metrics and self.y_pred_proba:
                se["average_precision"] = self._fit_ap_se(reference)
            if "business_value" in self.metrics and self.business_value_matrix is not None:
                # std of the per-row weighted value (bse.business_value_
                # sampling_error_components :803-845) — rides the shared pass
                se["business_value"] = {"std": row["bv_std"], "bv_norm": self.normalize_business_value}
            if "confusion_matrix" in self.metrics:
                # per-cell components (bse :387-801): binomial std of the
                # cell indicator over its normalization denominator
                norm = self.normalize_confusion_matrix
                cells = {
                    "true_positive": (tp, tp + fn, tp + fp),
                    "false_negative": (fn, tp + fn, tn + fn),
                    "true_negative": (tn, tn + fp, tn + fn),
                    "false_positive": (fp, tn + fp, tp + fp),
                }
                for cell, (x, row_tot, col_tot) in cells.items():
                    if norm in (None, "all"):
                        q = x / n
                        rel = 1.0
                    else:
                        denom = row_tot if norm == "true" else col_tot
                        q = x / denom if denom > 0 else float("nan")
                        rel = denom / n
                    std = math.sqrt(max(q * (1 - q), 0.0)) if q == q else float("nan")
                    se[cell] = {"std": std, "fraction": rel, "cm_norm": norm}
        elif self.problem_type == "multiclass_classification":
            # one OvR counts pass for all per-class components
            # (`sampling_error/multiclass_classification.py:21-487`)
            yts = F.col(self.y_true).cast("string")
            yps = F.col(self.y_pred).cast("string")
            classes = self._classes or []
            aggs = [
                F.count(F.lit(1)).alias("n"),
                F.avg((yts == yps).cast("double")).alias("acc"),
            ]
            for i, c in enumerate(classes):
                t, p_ = yts == str(c), yps == str(c)
                aggs += [
                    F.sum((t & p_).cast("double")).alias(f"tp{i}"),
                    F.sum((~t & p_).cast("double")).alias(f"fp{i}"),
                    F.sum((t & ~p_).cast("double")).alias(f"fn{i}"),
                    F.sum((~t & ~p_).cast("double")).alias(f"tn{i}"),
                ]
            # confusion-matrix cells and the business-value std ride the SAME
            # reference pass (previously one extra groupBy-collect job and one
            # extra stddev job per fit — pure driver round-trips at bench
            # scale, pure extra scans at cluster scale)
            if "confusion_matrix" in self.metrics:
                for i, t_ in enumerate(classes):
                    for j, p_ in enumerate(classes):
                        aggs.append(
                            F.sum(((yts == str(t_)) & (yps == str(p_))).cast("long")).alias(f"cm{i}_{j}")
                        )
            if "business_value" in self.metrics and self.business_value_matrix is not None:
                w_bv = F.lit(None).cast("double")
                for i in range(len(classes)):
                    for j in range(len(classes)):
                        w_bv = F.when(
                            (yts == str(classes[i])) & (yps == str(classes[j])),
                            float(self.business_value_matrix[i][j]),
                        ).otherwise(w_bv)
                aggs.append(F.stddev_pop(w_bv).alias("bv_std"))
            row = reference.filter(yts.isNotNull() & yps.isNotNull()).agg(*aggs).first()
            n = row["n"]
            acc = row["acc"]
            se["accuracy"] = {"std": math.sqrt(max(acc * (1 - acc), 0.0))}

            def _cls_component(x, rel):
                q = x / rel if rel > 0 else float("nan")
                var = q * (1 - q) if q == q else float("nan")
                return [var, rel / n if n else float("nan")]

            comps = {"f1": [], "precision": [], "recall": [], "specificity": []}
            for i in range(len(classes)):
                tp, fp, fn, tn = (row[f"tp{i}"], row[f"fp{i}"], row[f"fn{i}"], row[f"tn{i}"])
                comps["f1"].append(_cls_component(tp, tp + fp + fn))
                comps["precision"].append(_cls_component(tp, tp + fp))
                comps["recall"].append(_cls_component(tp, tp + fn))
                comps["specificity"].append(_cls_component(tn, tn + fp))
            for m_, cc in comps.items():
                if m_ in self.metrics:
                    se[m_] = {"mc": cc, "scale": 1.0}
            if "roc_auc" in self.metrics and isinstance(self.y_pred_proba, dict):
                se["roc_auc"] = {"mc": self._fit_mc_auroc_components(reference), "scale": 1.2}
            if "average_precision" in self.metrics and isinstance(self.y_pred_proba, dict):
                # ref average_precision_sampling_error_components
                # (sampling_error/multiclass_classification.py:417-487):
                # per-class bootstrap var over N=50 resamples of size
                # min(n/2, 50k) on binarized OvR labels; chunk SE =
                # sqrt(mean_c(var_c * s_c) / n_chunk) — the constant
                # mean_c(var_c*s_c) is all we need to store
                se["average_precision"] = self._fit_mc_ap_component(reference)
            if "confusion_matrix" in self.metrics:
                # ref multiclass_confusion_matrix_sampling_error_components
                # (:361-414): per-cell binomial std over the normalization
                # denominator + relevant proportion; same application law as
                # the binary cm_norm cells, keyed by the dense method name.
                # Cell counts came from the shared aggregate above (a cell
                # expression is exactly the old isin-filtered groupBy count).
                norm = self.normalize_confusion_matrix
                cm = {
                    (str(t_), str(p_)): row[f"cm{i}_{j}"]
                    for i, t_ in enumerate(classes)
                    for j, p_ in enumerate(classes)
                }
                true_marg = {str(c): sum(cm.get((str(c), str(p)), 0) for p in classes) for c in classes}
                pred_marg = {str(c): sum(cm.get((str(t), str(c)), 0) for t in classes) for c in classes}
                for t_ in classes:
                    for p_ in classes:
                        x = cm.get((str(t_), str(p_)), 0)
                        if norm == "true":
                            denom = true_marg[str(t_)]
                        elif norm == "pred":
                            denom = pred_marg[str(p_)]
                        else:  # 'all' and None both use n as the indicator base
                            denom = n
                        q = x / denom if denom else float("nan")
                        std = math.sqrt(max(q * (1 - q), 0.0)) if q == q else float("nan")
                        rel = (denom / n) if (norm in ("true", "pred") and n) else 1.0
                        se[f"true_{t_}_pred_{p_}"] = {"std": std, "fraction": rel, "cm_norm": norm}
            if "business_value" in self.metrics and self.business_value_matrix is not None:
                se["business_value"] = {"std": row["bv_std"], "bv_norm": self.normalize_business_value}
        elif self.problem_type == "regression":
            err = yt - yp
            row = reference.agg(
                F.stddev_pop(F.abs(err)).alias("mae_std"),
                F.stddev_pop(F.abs(err) / F.greatest(F.abs(yt), F.lit(2.220446049250313e-16))).alias("mape_std"),
                F.stddev_pop(err * err).alias("mse_std"),
                F.avg(err * err).alias("mse_mean"),
                F.stddev_pop(F.pow(F.log1p(yt) - F.log1p(yp), 2)).alias("msle_std"),
                F.avg(F.pow(F.log1p(yt) - F.log1p(yp), 2)).alias("msle_mean"),
            ).first()
            se["mae"] = {"std": row["mae_std"]}
            se["mape"] = {"std": row["mape_std"]}
            se["mse"] = {"std": row["mse_std"]}
            se["msle"] = {"std": row["msle_std"]}
            se["rmse"] = {"std": row["mse_std"], "mean": row["mse_mean"]}
            se["rmsle"] = {"std": row["msle_std"], "mean": row["msle_mean"]}
        self._se = se

    # Reference caps sampling-error fits at 50k rows
    # (`sampling_error/binary_classification.py:27-29` MAX_RESAMPLE_SIZE) — the
    # SE component is an estimate; a bounded seeded sample suffices at any scale.
    MAX_RESAMPLE_SIZE = 50_000

    def _fit_auroc_se(self, reference: DataFrame) -> dict:
        """AUROC components (`sampling_error/binary_classification.py:36-75`):
        per-positive fraction of negatives ranked below it; std of that
        distribution + positive fraction.

        A global rank over the full reference would collapse to one task (and
        at 10^12 rows, one very large one). Instead: seeded sample down to
        ≤ MAX_RESAMPLE_SIZE, then the rank pass runs in bounded driver numpy —
        exactly the reference's own scalability device.
        """
        yt = F.col(self.y_true).cast("double")
        s = F.col(self.y_pred_proba).cast("double")
        df = reference.select(yt.alias("_y"), s.alias("_s")).filter(
            F.col("_y").isNotNull() & F.col("_s").isNotNull()
        )
        row = df.agg(F.sum("_y").alias("n1"), F.count(F.lit(1)).alias("n")).first()
        n1, n = row["n1"], row["n"]
        if not n or not n1 or n1 == n:
            return {"std": None, "fraction": (n1 / n) if n else None}
        if n > self.MAX_RESAMPLE_SIZE:
            df = df.sample(fraction=self.MAX_RESAMPLE_SIZE / n, seed=42)
        pdf = df.toPandas()
        y = pdf["_y"].to_numpy(dtype=np.float64)
        p = pdf["_s"].to_numpy(dtype=np.float64)
        if y.mean() > 0.5:  # reference flips the minority class
            y = 1.0 - y
            p = 1.0 - p
        order = np.argsort(p, kind="stable")
        y = y[order]
        neg_below = np.concatenate(([0.0], np.cumsum(1.0 - y)[:-1]))
        n0s = float((1.0 - y).sum())
        # fraction AFTER the flip (`sampling_error/binary_classification.py:71`
        # computes n_pos/len over the flipped labels) — the minority share.
        # Using the raw positive rate would understate SE ~(maj/min)× on
        # imbalanced data; the multiclass path already flips.
        frac = float(y.mean())
        if n0s == 0 or y.sum() == 0:
            return {"std": None, "fraction": frac}
        ser = neg_below[y == 1.0] / n0s
        return {"std": float(np.std(ser)), "fraction": frac}

    def _fit_ap_se(self, reference: DataFrame) -> dict:
        """AP components (`bse.ap_sampling_error_components :95-128`): bootstrap
        std over N=50 resamples of size min(n/2, 50k), extrapolated 1/√n.
        Runs on a seeded ≤50k collected sample (same device as AUROC)."""
        from spark_validate.functions.mathstats import average_precision

        df = reference.select(
            F.col(self.y_true).cast("double").alias("_y"),
            F.col(self.y_pred_proba).cast("double").alias("_s"),
        ).filter(F.col("_y").isNotNull() & F.col("_s").isNotNull())
        n = df.count()
        if not n:
            return {"std": None, "sample_size": None}
        if n > self.MAX_RESAMPLE_SIZE:
            df = df.sample(fraction=self.MAX_RESAMPLE_SIZE / n, seed=42)
        pdf = df.toPandas()
        y = pdf["_y"].to_numpy(np.float64)
        s = pdf["_s"].to_numpy(np.float64)
        sample_size = int(min(n // 2, self.MAX_RESAMPLE_SIZE))
        if sample_size < 2 or y.sum() == 0 or y.sum() == len(y):
            return {"std": None, "sample_size": sample_size}
        rng = np.random.default_rng(42)
        aps = []
        for _ in range(50):  # bse.N_EXPERIMENTS
            idx = rng.choice(len(y), size=min(sample_size, len(y)), replace=True)
            aps.append(average_precision(y[idx], s[idx]))
        return {"std": float(np.nanstd(aps)), "sample_size": sample_size}

    def _fit_mc_auroc_components(self, reference: DataFrame) -> list:
        """Per-class OvR AUROC components (var(ser), fraction) from one
        seeded ≤50k sample (`mse.auroc_sampling_error_components :27-75`)."""
        cols = [F.col(self.y_true).cast("string").alias("_y")] + [
            F.col(self.y_pred_proba[c]).cast("double").alias(f"_s{i}")
            for i, c in enumerate(self._classes)
        ]
        df = reference.select(*cols).dropna()
        n = df.count()
        if n > self.MAX_RESAMPLE_SIZE:
            df = df.sample(fraction=self.MAX_RESAMPLE_SIZE / n, seed=42)
        pdf = df.toPandas()
        comps = []
        for i, c in enumerate(self._classes):
            y = (pdf["_y"] == str(c)).to_numpy(np.float64)
            p = pdf[f"_s{i}"].to_numpy(np.float64)
            if y.mean() > 0.5:
                y, p = 1.0 - y, 1.0 - p
            order = np.argsort(p, kind="stable")
            ys = y[order]
            n0s = float((1.0 - ys).sum())
            if n0s == 0 or ys.sum() == 0:
                comps.append([float("nan"), float("nan")])
                continue
            neg_below = np.concatenate(([0.0], np.cumsum(1.0 - ys)[:-1]))
            ser = neg_below[ys == 1.0] / n0s
            comps.append([float(np.var(ser)), float(y.mean())])
        return comps

    def _fit_mc_ap_component(self, reference: DataFrame) -> dict:
        """Macro-OvR AP bootstrap components on one seeded ≤50k sample
        (`sampling_error/multiclass_classification.py:417-487`): per class,
        var over N=50 resamples of size min(n/2, 50k); stored as the single
        constant mean_c(var_c·s_c) so chunk SE = sqrt(C / n_chunk)."""
        from spark_validate.functions.mathstats import average_precision

        cols = [F.col(self.y_true).cast("string").alias("_y")] + [
            F.col(self.y_pred_proba[c]).cast("double").alias(f"_s{i}")
            for i, c in enumerate(self._classes)
        ]
        df = reference.select(*cols).dropna()
        n = df.count()
        if not n:
            return {"mc_ap_c": None}
        if n > self.MAX_RESAMPLE_SIZE:
            df = df.sample(fraction=self.MAX_RESAMPLE_SIZE / n, seed=42)
        pdf = df.toPandas()
        sample_size = int(min(n // 2, self.MAX_RESAMPLE_SIZE))
        if sample_size < 2:
            return {"mc_ap_c": None}
        rng = np.random.default_rng(42)
        var_times_s = []
        for i, c in enumerate(self._classes):
            y = (pdf["_y"] == str(c)).to_numpy(np.float64)
            p = pdf[f"_s{i}"].to_numpy(np.float64)
            if y.sum() == 0 or y.sum() == len(y):
                continue
            aps = []
            for _ in range(50):  # mse.N_EXPERIMENTS
                idx = rng.choice(len(y), sample_size, replace=True)
                aps.append(average_precision(y[idx], p[idx]))
            var_times_s.append(float(np.var(aps)) * sample_size)
        if not var_times_s:
            return {"mc_ap_c": None}
        return {"mc_ap_c": float(np.mean(var_times_s))}

    def fit(self, reference: DataFrame) -> "PerformanceCalculator":
        from spark_validate.functions.fitcache import cached_for_fit, chunker_columns

        if isinstance(self.y_pred_proba, dict):
            proba_cols = list(self.y_pred_proba.values())
        elif self.y_pred_proba and self.problem_type == "multiclass_classification":
            # string proba in multiclass = per-class prefix convention
            # (_proba_col: f"{y_pred_proba}_{cls}"); classes aren't known until
            # fit, so include every prefixed column plus the bare name
            proba_cols = [self.y_pred_proba] + [
                c for c in reference.columns if c.startswith(f"{self.y_pred_proba}_")
            ]
        else:
            proba_cols = [self.y_pred_proba] if self.y_pred_proba else []
        cols = [self.y_true, self.y_pred] + proba_cols + chunker_columns(self.chunker)
        with cached_for_fit(reference, columns=cols) as ref:
            return self._fit(ref)

    def _fit(self, reference: DataFrame) -> "PerformanceCalculator":
        if self.problem_type == "multiclass_classification":
            # NULL labels are tolerated (excluded from confusion cells and
            # n alike); they must not enter the class list — sorted() would
            # TypeError on None, and None is not a class
            self._classes = sorted(
                r[0]
                for r in reference.select(F.col(self.y_true).cast("string"))
                .filter(F.col(self.y_true).isNotNull())
                .distinct()
                .collect()
            )
        self._fit_se_components(reference)
        self._fitted = True
        ref_long, ref_headers = self._chunk_values(reference)
        ref_long = ref_long.persist()
        # generic per-method fit: dispatches constant / stddev / MAD /
        # quantile in one aggregate (an isinstance ladder assuming constant
        # in the else-branch crashed on the robust threshold types)
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

    # ---- JSON state for the FittedStore (thresholds + SE components +
    # multiclass label set; reference_result is not persisted)

    def get_state(self) -> dict:
        if not self._fitted:
            raise RuntimeError("fit first")
        return {
            "thresholds": {m: [lo, up] for m, (lo, up) in self._thresholds.items()},
            "se": self._se,
            "classes": self._classes if self.problem_type == "multiclass_classification" else None,
        }

    def set_state(self, st: dict) -> "PerformanceCalculator":
        self._thresholds = {m: (v[0], v[1]) for m, v in st["thresholds"].items()}
        self._se = st.get("se", {})
        if st.get("classes") is not None:
            self._classes = list(st["classes"])
        self._reference_result = None
        self._fitted = True
        return self

    # ------------------------------------------------------------------ calculate

    def _se_expr(self) -> F.Column:
        # n = 0 (a fully-unlabeled chunk — the delayed-labels case) must
        # yield NULL sampling error, not an ANSI division crash in std/√n;
        # NULLing n short-circuits every branch below to NULL
        n = F.when(F.col("n_chunk") > 0, F.col("n_chunk").cast("double"))
        m = F.col("method")
        expr = F.lit(None).cast("double")
        for metric, comp in self._se.items():
            if "mc_ap_c" in comp:
                # multiclass AP (mse.py:460-487): SE = sqrt(mean_c(var_c·s_c)/n)
                c_ = comp["mc_ap_c"]
                if c_ is not None and c_ == c_:
                    e = F.sqrt(F.lit(float(c_)) / n)
                    expr = F.when(m == metric, e).otherwise(expr)
                continue
            if "mc" in comp:
                # macro OvR combine (mse.py:21-24; auroc applies ×1.2 :93-96)
                parts = [
                    F.lit(float(var)) / (n * F.lit(float(frac)))
                    for var, frac in comp["mc"]
                    if var == var and frac == frac and frac > 0
                ]
                if not parts:
                    continue
                e = F.lit(float(comp.get("scale", 1.0))) * F.sqrt(sum(parts[1:], parts[0])) / F.lit(
                    float(len(comp["mc"]))
                )
                expr = F.when(m == metric, e).otherwise(expr)
                continue
            std = comp.get("std")
            if std is None or std != std:
                continue
            if "sample_size" in comp:  # bootstrap-extrapolated (AP, bse :131-149)
                s = comp["sample_size"]
                if s:
                    e = F.lit(float(std)) * F.sqrt(F.lit(float(s)) / n)
                    expr = F.when(m == metric, e).otherwise(expr)
                continue
            if "bv_norm" in comp:  # business value (bse :845-867)
                e = F.lit(float(std)) * F.sqrt(n) if comp["bv_norm"] is None else F.lit(float(std)) / F.sqrt(n)
                expr = F.when(m == metric, e).otherwise(expr)
                continue
            if "cm_norm" in comp:  # confusion-matrix cells (bse :459-801)
                norm = comp["cm_norm"]
                frac = comp.get("fraction")
                if norm is None:
                    e = F.lit(float(std)) * F.sqrt(n)
                elif norm == "all":
                    e = F.lit(float(std)) / F.sqrt(n)
                else:
                    if frac is None or frac != frac or frac <= 0:
                        continue
                    e = F.lit(float(std)) / F.sqrt(n * F.lit(float(frac)))
                expr = F.when(m == metric, e).otherwise(expr)
                continue
            if metric in ("accuracy", "mae", "mape", "mse", "msle"):
                e = F.lit(float(std)) / F.sqrt(n)
            elif metric in ("precision", "recall", "specificity", "f1", "roc_auc"):
                frac = comp.get("fraction")
                if frac is None or frac != frac or frac <= 0:
                    continue
                e = F.lit(float(std)) / F.sqrt(n * F.lit(float(frac)))
            elif metric in ("rmse", "rmsle"):
                mean = comp.get("mean")
                if not mean:
                    continue
                e = F.sqrt(F.lit(float(std)) ** 2 / (4 * n * F.lit(float(mean))))
            else:
                continue
            expr = F.when(m == metric, e).otherwise(expr)
        return expr

    def _finalize(self, long_df: DataFrame, headers, period: str) -> DataFrame:
        thr = _thr_frame(
            long_df.sparkSession, self._thresholds,
            cm_normalized=self.normalize_confusion_matrix is not None,
        )
        lcb, ucb = _clamped_bounds()
        out = (
            long_df.join(F.broadcast(thr), "method", "left")
            .withColumn("sampling_error", self._se_expr())
            .withColumn("lower_confidence_boundary", lcb)
            .withColumn("upper_confidence_boundary", ucb)
            .withColumn("alert", alert_expr())
            .withColumn("column_name", F.lit(self.y_pred))
            .drop("n_chunk", "_lim_lo", "_lim_up")
        )
        return conform_result(join_headers_long(out, headers, period))

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        if not self._fitted:
            raise RuntimeError("call fit(reference) first")
        long_df, headers = self._chunk_values(df)
        return self._finalize(long_df, headers, period)

    @property
    def reference_result(self) -> DataFrame:
        if not self._fitted:
            raise RuntimeError("not fitted")
        return self._reference_result
