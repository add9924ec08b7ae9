"""Per-chunk calibration drift — reliability bins + expected calibration
error over time.

The reference decides ONCE whether scores need calibration
(`nannyml/calibration.py:193-223`, ECE over the reference) and CBPE then
trusts the calibrated scores forever.  In production, calibration itself
drifts (prior shift, feature drift, retrained upstreams), and a model that
was well-calibrated at fit time quietly stops being so — the standard
monitor is the reliability diagram + ECE per time slice (Guo et al. 2017's
fixed-width-bin construction).  This calculator distributes it:

* ``fit(reference)`` — one aggregation: per fixed-width probability bin,
  the count, label sum, and score sum; reference ECE and per-bin
  accuracy/confidence/weight go into small JSON state.
* ``calculate(analysis)`` — one ``groupBy(chunk)`` aggregation with
  3 × bin_count conditional sums (no explode, no second shuffle); emits
  conformed rows: method ``ece`` (alerting on a constant upper threshold)
  and ``ece_delta`` (ece − reference ece, informational).
* ``reliability(analysis)`` — the per-(chunk, bin) diagram table:
  weight / confidence / accuracy next to the reference's, for the report
  layer.

Exactness contract (the engine's decimal-moment device): label sums are
integers; score sums quantize each score to 12 decimals via a
``decimal(38,12)`` cast so partial-aggregation order cannot change the
sum; ECE is an EXPLICIT bin-ascending addition chain, not a row
aggregate — bit-identical in any engine that mirrors the chain.  Rows
with a NULL label or score are excluded (missingness is the
missing-values check's job); an empty chunk yields NULL ECE, no alert.
Fixed-width bins (not the reference's equal-count fit-time bins) because
they need no fitted edges and make the per-chunk pass a pure conditional
aggregate; the fit-time ``needs_calibration`` gate keeps the reference's
equal-count construction.

Threshold guidance: ECE is upward-biased on small chunks — a perfectly
calibrated model still scores ≈ Σ_b w_b·E|binomial noise| (~0.05 at
n=400 rows × 10 bins), so size ``ece_threshold`` to the chunk row count
(or compare ``ece_delta`` against same-sized reference chunks) rather
than reading small-chunk ECE as miscalibration.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks, join_headers_long
from spark_validate.chunking import CHUNK_KEY, Chunker, DefaultChunker
from spark_validate.result import conform_result

_DEC = "decimal(38,12)"


@dataclass
class CalibrationDriftCalculator:
    """fit(reference) → calculate(analysis) / reliability(analysis)."""

    y_true: str = "y_true"
    y_pred_proba: str = "y_pred_proba"
    bin_count: int = 10
    chunker: Chunker = field(default_factory=DefaultChunker)
    ece_threshold: float = 0.05  # alert when a chunk's ECE exceeds this
    _state: Optional[Dict] = None

    def __post_init__(self):
        if self.bin_count < 2:
            raise ValueError(f"bin_count must be >= 2, got {self.bin_count}")

    # -- shared expressions ----------------------------------------------------

    def _valid(self):
        y = F.col(self.y_true).cast("double")
        p = F.col(self.y_pred_proba).cast("double")
        return F.when(y.isNotNull() & p.isNotNull(), F.struct(y.alias("y"), p.alias("p")))

    def _aggs(self):
        """3 × bin_count conditional sums over the valid (y, p) struct."""
        B = self.bin_count
        v = self._valid()
        p, y = v["p"], v["y"]
        # Spark's least() IGNORES NULLs (least(NULL, 9) == 9), so the bucket
        # must be explicitly NULL-guarded or dropped rows land in the last bin
        b = F.when(p.isNotNull(), F.least(F.floor(p * F.lit(B)), F.lit(B - 1)))
        aggs = []
        for i in range(B):
            hit = b == F.lit(i)
            aggs += [
                F.count(F.when(hit, F.lit(1))).alias(f"__c{i}"),
                F.coalesce(F.sum(F.when(hit, y)), F.lit(0.0)).cast("long").alias(f"__y{i}"),
                F.coalesce(F.sum(F.when(hit, p.cast(_DEC))), F.lit(0).cast(_DEC)).alias(f"__p{i}"),
            ]
        return aggs

    def _ece_expr(self):
        """Explicit bin-ascending chain: Σ (c_i/n)·|y_i/c_i − p_i/c_i|."""
        B = self.bin_count
        n = F.col("__c0")
        for i in range(1, B):
            n = n + F.col(f"__c{i}")
        ece = None
        for i in range(B):
            c = F.col(f"__c{i}")
            acc = F.col(f"__y{i}") / c
            conf = F.col(f"__p{i}").cast("double") / c
            term = F.when(c > 0, (c / n) * F.abs(acc - conf)).otherwise(F.lit(0.0))
            ece = term if ece is None else ece + term
        return n, F.when(n > 0, ece)

    # -- fit -------------------------------------------------------------------

    def fit(self, reference: DataFrame) -> "CalibrationDriftCalculator":
        row = reference.agg(*self._aggs()).first()
        B = self.bin_count
        n = sum(row[f"__c{i}"] for i in range(B))
        if n == 0:
            raise ValueError("reference has no rows with both label and score")
        bins, ece = [], 0.0
        for i in range(B):
            c = row[f"__c{i}"]
            acc = row[f"__y{i}"] / c if c else None
            conf = float(row[f"__p{i}"]) / c if c else None
            bins.append({"count": int(c), "accuracy": acc, "confidence": conf,
                         "weight": c / n})
            # same left-to-right chain as the Spark expression
            ece = ece + ((c / n) * abs(acc - conf) if c else 0.0)
        self._state = {"n_ref": int(n), "ece": ece, "bins": bins}
        return self

    def get_state(self) -> dict:
        if self._state is None:
            raise RuntimeError("fit first")
        return {"version": 1, "bin_count": self.bin_count, "state": self._state}

    def set_state(self, state: dict) -> None:
        if state["bin_count"] != self.bin_count:
            raise ValueError(
                f"stored state has bin_count={state['bin_count']}, calculator has {self.bin_count}"
            )
        self._state = state["state"]

    # -- outputs ---------------------------------------------------------------

    def _wide(self, df: DataFrame):
        assigned, headers = assign_chunks(df, self.chunker)
        return assigned.groupBy(CHUNK_KEY).agg(*self._aggs()), headers

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        if self._state is None:
            raise RuntimeError("fit first")
        wide, headers = self._wide(df)
        n, ece = self._ece_expr()
        wide = wide.withColumn("__ece", ece)
        col_name = f"{self.y_pred_proba}|{self.y_true}"
        thr = float(self.ece_threshold)
        rows = [
            wide.select(
                CHUNK_KEY,
                F.lit(col_name).alias("column_name"),
                F.lit("ece").alias("method"),
                F.col("__ece").cast("double").alias("value"),
                F.lit(None).cast("double").alias("lower_threshold"),
                F.lit(thr).alias("upper_threshold"),
                F.coalesce(F.col("__ece") > F.lit(thr), F.lit(False)).alias("alert"),
            ),
            wide.select(
                CHUNK_KEY,
                F.lit(col_name).alias("column_name"),
                F.lit("ece_delta").alias("method"),
                (F.col("__ece") - F.lit(float(self._state["ece"]))).cast("double").alias("value"),
                F.lit(None).cast("double").alias("lower_threshold"),
                F.lit(None).cast("double").alias("upper_threshold"),
                F.lit(False).alias("alert"),
            ),
        ]
        long_df = rows[0].unionByName(rows[1])
        return conform_result(join_headers_long(long_df, headers, period))

    def reliability(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        """Per-(chunk, bin) reliability-diagram rows: the chunk's weight /
        confidence / accuracy beside the reference's."""
        if self._state is None:
            raise RuntimeError("fit first")
        wide, _ = self._wide(df)
        B = self.bin_count
        n, _ = self._ece_expr()
        wide = wide.withColumn("__n", n)
        structs = []
        for i in range(B):
            c = F.col(f"__c{i}")
            st = self._state["bins"][i]
            structs.append(
                F.struct(
                    F.lit(i).alias("bin"),
                    F.lit(i / B).alias("bin_lo"),
                    F.lit((i + 1) / B).alias("bin_hi"),
                    F.when(F.col("__n") > 0, c / F.col("__n")).cast("double").alias("weight"),
                    F.when(c > 0, F.col(f"__p{i}").cast("double") / c).cast("double").alias("confidence"),
                    F.when(c > 0, F.col(f"__y{i}") / c).cast("double").alias("accuracy"),
                    F.lit(st["weight"]).cast("double").alias("ref_weight"),
                    F.lit(st["accuracy"]).cast("double").alias("ref_accuracy"),
                )
            )
        return (
            wide.select(CHUNK_KEY, F.explode(F.array(*structs)).alias("kv"))
            .select(CHUNK_KEY, "kv.*")
            .withColumn("period", F.lit(period))
        )
