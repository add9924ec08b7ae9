"""Prior-shift (prevalence) estimation — quantification without labels.

When the TRUE class balance moves in production, the naive estimate (the
share of positive PREDICTIONS, "classify & count") is biased by the
classifier's own error rates. The Adjusted Classify & Count estimator
(Forman 2005; the binary case of black-box shift estimation, Lipton et al.
2018) inverts the reference confusion behavior:

    P(pred=1) = tpr · π + fpr · (1 − π)
    ⇒  π̂ = (q − fpr) / (tpr − fpr),   q = observed positive-prediction rate

with tpr/fpr fitted ONCE on the labeled reference period. Label-free like
CBPE (`performance/cbpe.py`) but estimating the TARGET DISTRIBUTION rather
than a performance metric — the two answer complementary monitoring
questions. The reference has no quantification module; its closest surface
is the output-drift check on the prediction column, which sees that q moved
but not what the move means for the true prior.

Scale: fit is one labeled-reference aggregate (4 counters); calculate is
ONE ``groupBy(chunk)`` of 2 counters per chunk plus constant-folded
arithmetic — no joins, no windows, map-side combinable. The same two
counters compile to a streaming tumbling window unchanged.

Semantics pinned by tests: rows with NULL y_pred are excluded; π̂ is
clamped to [0, 1] (sampling noise can push the raw ratio outside);
a degenerate reference (tpr ≈ fpr: the classifier carries no prior
information) yields NULL estimates and never alerts; alerts fire when
|π̂ − reference prior| exceeds ``shift_threshold``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks, join_headers_long
from spark_validate.chunking import CHUNK_KEY, Chunker, DefaultChunker
from spark_validate.result import conform_result


@dataclass
class PriorShiftEstimator:
    """fit(labeled reference) → calculate(unlabeled analysis)."""

    y_true: str = "y_true"
    y_pred: str = "y_pred"
    chunker: Chunker = field(default_factory=DefaultChunker)
    shift_threshold: float = 0.05  # alert when |π̂ − ref prior| exceeds this
    min_rate_gap: float = 1e-6  # tpr − fpr below this → degenerate reference
    _state: Optional[dict] = None

    def fit(self, reference: DataFrame) -> "PriorShiftEstimator":
        yt = F.col(self.y_true).cast("double")
        yp = F.col(self.y_pred).cast("double")
        row = (
            reference.filter(yt.isNotNull() & yp.isNotNull())
            .agg(
                F.count(F.when(yt == 1, F.lit(1))).alias("n_pos"),
                F.count(F.when(yt == 0, F.lit(1))).alias("n_neg"),
                F.count(F.when((yt == 1) & (yp == 1), F.lit(1))).alias("tp"),
                F.count(F.when((yt == 0) & (yp == 1), F.lit(1))).alias("fp"),
            )
            .first()
        )
        n_pos, n_neg = int(row["n_pos"]), int(row["n_neg"])
        if n_pos == 0 or n_neg == 0:
            raise ValueError(
                "reference needs both classes to fit tpr/fpr "
                f"(n_pos={n_pos}, n_neg={n_neg})"
            )
        self._state = {
            "tpr": int(row["tp"]) / n_pos,
            "fpr": int(row["fp"]) / n_neg,
            "ref_prior": n_pos / (n_pos + n_neg),
        }
        return self

    def get_state(self) -> dict:
        if self._state is None:
            raise RuntimeError("fit first")
        return {"version": 1, **self._state}

    def set_state(self, state: dict) -> None:
        self._state = {k: float(state[k]) for k in ("tpr", "fpr", "ref_prior")}

    # shared arithmetic: the SAME column expression feeds batch chunks and
    # streaming windows (and the DuckDB oracle mirrors it op-for-op)
    def _estimates(self, q: F.Column) -> F.Column:
        st = self._state
        gap = st["tpr"] - st["fpr"]
        if abs(gap) < self.min_rate_gap:
            return F.lit(None).cast("double")
        return F.greatest(
            F.lit(0.0), F.least(F.lit(1.0), (q - F.lit(st["fpr"])) / F.lit(gap))
        )

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        """Long rows per chunk: ``prevalence_cc`` (raw positive-prediction
        rate, informational — NO thresholds, it is the BIASED estimate),
        ``prevalence_acc`` (the adjusted estimate, thresholded at reference
        prior ± shift_threshold)."""
        if self._state is None:
            raise RuntimeError("fit first (or set_state)")
        yp = F.col(self.y_pred).cast("double")
        assigned, headers = assign_chunks(df, self.chunker)
        agg = assigned.filter(yp.isNotNull()).groupBy(CHUNK_KEY).agg(
            F.avg(yp).alias("_q")
        )
        acc = self._estimates(F.col("_q"))
        prior = self._state["ref_prior"]
        lo = max(prior - self.shift_threshold, 0.0)
        up = min(prior + self.shift_threshold, 1.0)
        rows = agg.select(
            CHUNK_KEY,
            F.explode(
                F.array(
                    F.struct(
                        F.lit("prevalence_cc").alias("method"),
                        F.col("_q").cast("double").alias("value"),
                        F.lit(None).cast("double").alias("lower_threshold"),
                        F.lit(None).cast("double").alias("upper_threshold"),
                        F.lit(None).cast("boolean").alias("alert"),
                    ),
                    F.struct(
                        F.lit("prevalence_acc").alias("method"),
                        acc.cast("double").alias("value"),
                        F.lit(lo).cast("double").alias("lower_threshold"),
                        F.lit(up).cast("double").alias("upper_threshold"),
                        F.when(
                            acc.isNotNull(), (acc < F.lit(lo)) | (acc > F.lit(up))
                        ).alias("alert"),
                    ),
                )
            ).alias("kv"),
        ).select(
            CHUNK_KEY,
            F.lit(self.y_pred).alias("column_name"),
            "kv.method",
            "kv.value",
            "kv.lower_threshold",
            "kv.upper_threshold",
            "kv.alert",
        )
        return conform_result(join_headers_long(rows, headers, period))
