"""Inter-column correlation drift — the RELATIONSHIP between columns as a
monitored quantity.

Univariate drift (`drift/univariate.py`, reference
`nannyml/drift/univariate/calculator.py`) watches marginals; the joint 2-D
histogram (`drift/joint.py`) watches one pair's full joint density. This
check watches the SUFFICIENT STATISTIC most practitioners actually reason
about: the Pearson correlation of every monitored pair, per chunk, against
the reference-fitted value. It is the cheapest possible multivariate drift
signal (one aggregate row per chunk, no grid, no model — contrast the
reference's PCA reconstruction error,
`nannyml/drift/multivariate/data_reconstruction/calculator.py:226-293`,
which detects the same class of shift but costs a fit and can't name the
pair) and the standard "correlation stability" surface of
Evidently/whylogs-class monitors that NannyML itself lacks.

Execution shape (the 100 TB story): fit is ONE reference aggregation;
calculate is ONE ``groupBy(chunk)`` aggregation of pure codegen expressions
(per pair: pairwise-complete n, Σx, Σy, Σx², Σy², Σxy) followed by a
projection — map-side combinable, zero joins beyond the ≤#chunks header
attach, and therefore fusable into the shared-scan suite pass via
``fuse_contrib``. p columns monitored pairwise cost C(p,2)·6 aggregate
buffers — sums, not histograms — so even 40 columns (780 pairs) is ~4.7k
doubles per partial-agg state.

Cross-engine determinism (the DuckDB oracle must hash-match): all six sums
are accumulated as fixed-scale DECIMAL(38,6) — decimal addition is
order-independent, so the per-chunk sums are bit-identical at any
parallelism — then corr/shift are derived with plain IEEE double
arithmetic mirrored expression-for-expression in the oracle SQL (the
`checks/profile.py::ZScoreOutlierCalculator` device).

Semantics:
* pairwise-complete: a row contributes to a pair iff BOTH columns are
  non-null (NaN normalized to NULL for float columns) — R's
  ``use="pairwise.complete.obs"`` convention; the missing-values check
  owns NULL-rate drift.
* a chunk pair with n < 2 or a degenerate variance (vx ≤ 0 or vy ≤ 0)
  yields NULL corr and NULL shift, never 0 — constant-in-chunk is "no
  evidence", not "no drift".
* a pair degenerate in the REFERENCE has no fitted value: its shift rows
  are NULL and never alert (the fit records None).
* two method rows per (chunk, pair): ``pearson_corr`` (informational —
  thresholds stripped, alert always false) and ``corr_shift`` =
  |corr_chunk − corr_ref| with the alert threshold (default 0.25, the
  classic "weak→moderate band jump" rule of thumb).
"""

from __future__ import annotations

import math
from itertools import combinations
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks, nan_to_null
from spark_validate.checks.constraints import _FUSE_HDR_COLS, _attach_const_threshold
from spark_validate.chunking import CHUNK_KEY, DefaultChunker

_DEC = "decimal(38,6)"  # order-independent exact sums (profile.py device):
                        # the double products x·x / x·y round to 6 dp
                        # identically in Spark and DuckDB before summation


def _pair_key(x: str, y: str) -> str:
    return f"{x}+{y}"


class CorrelationDriftCalculator:
    """Reference-fitted drift on pairwise Pearson correlations.

    ``pairs`` takes explicit (x, y) tuples; ``column_names`` expands to all
    C(p,2) combinations in the given order. Exactly one of the two must be
    provided.
    """

    def __init__(
        self,
        column_names: Optional[Sequence[str]] = None,
        pairs: Optional[Sequence[Tuple[str, str]]] = None,
        chunker=None,
        upper_threshold: float = 0.25,
        null_indicators: bool = False,
    ):
        if (column_names is None) == (pairs is None):
            raise ValueError("provide exactly one of column_names / pairs")
        if pairs is not None:
            self.pairs: List[Tuple[str, str]] = [(str(x), str(y)) for x, y in pairs]
        else:
            cols = list(column_names)
            if len(cols) < 2:
                raise ValueError("need at least 2 columns to correlate")
            self.pairs = list(combinations(cols, 2))
        if len(set(self.pairs)) != len(self.pairs):
            raise ValueError("duplicate column pair")
        for x, y in self.pairs:
            if x == y:
                raise ValueError(f"pair ({x!r}, {y!r}) correlates a column with itself")
        self.chunker = chunker or DefaultChunker()
        self.upper_threshold = float(upper_threshold)
        # null_indicators: correlate each column's IS-NULL flag instead of
        # its value — missingness-PATTERN drift (fields that used to go
        # missing together decoupling, or a new joint-dropout mode), the
        # structured-missingness shift no per-column missing RATE can see.
        # Indicator pairs are trivially complete (the flag is defined on
        # every row) and works on any dtype, not just numerics.
        self.null_indicators = bool(null_indicators)
        self._ref: Optional[Dict[str, Optional[float]]] = None  # pair key -> corr

    # ---- expressions --------------------------------------------------------

    def _value(self, c: str, dtypes) -> F.Column:
        v = nan_to_null(F.col(c), dtypes[c])  # NaN counts as missing, both modes
        if self.null_indicators:
            return v.isNull().cast("double")
        return v.cast("double")

    def _sum_exprs(self, dtypes, prefix: str) -> List[F.Column]:
        exprs = []
        for x, y in self.pairs:
            k = _pair_key(x, y)
            vx = self._value(x, dtypes)
            vy = self._value(y, dtypes)
            both = vx.isNotNull() & vy.isNotNull()
            gx = F.when(both, vx)
            gy = F.when(both, vy)
            exprs += [
                F.count(F.when(both, F.lit(1))).alias(f"{prefix}{k}__n"),
                F.sum(gx.cast(_DEC)).alias(f"{prefix}{k}__sx"),
                F.sum(gy.cast(_DEC)).alias(f"{prefix}{k}__sy"),
                F.sum((gx * gx).cast(_DEC)).alias(f"{prefix}{k}__sxx"),
                F.sum((gy * gy).cast(_DEC)).alias(f"{prefix}{k}__syy"),
                F.sum((gx * gy).cast(_DEC)).alias(f"{prefix}{k}__sxy"),
            ]
        return exprs

    @staticmethod
    def _corr_col(prefix: str, k: str) -> F.Column:
        # plain IEEE double arithmetic, mirrored verbatim in the oracle SQL
        n = F.col(f"{prefix}{k}__n").cast("double")
        sx = F.col(f"{prefix}{k}__sx").cast("double")
        sy = F.col(f"{prefix}{k}__sy").cast("double")
        sxx = F.col(f"{prefix}{k}__sxx").cast("double")
        syy = F.col(f"{prefix}{k}__syy").cast("double")
        sxy = F.col(f"{prefix}{k}__sxy").cast("double")
        mux = sx / n
        muy = sy / n
        vx = sxx / n - mux * mux
        vy = syy / n - muy * muy
        cov = sxy / n - mux * muy
        return F.when(
            (F.col(f"{prefix}{k}__n") >= 2) & (vx > 0) & (vy > 0),
            cov / F.sqrt(vx * vy),
        ).cast("double")

    @staticmethod
    def _corr_from_row(row: dict, k: str) -> Optional[float]:
        n = row[f"{k}__n"]
        if n is None or n < 2:
            return None
        n = float(n)
        mux = float(row[f"{k}__sx"]) / n
        muy = float(row[f"{k}__sy"]) / n
        vx = float(row[f"{k}__sxx"]) / n - mux * mux
        vy = float(row[f"{k}__syy"]) / n - muy * muy
        if vx <= 0 or vy <= 0:
            return None
        cov = float(row[f"{k}__sxy"]) / n - mux * muy
        return cov / math.sqrt(vx * vy)

    # ---- fit / calculate ----------------------------------------------------

    def fit(self, reference: DataFrame) -> "CorrelationDriftCalculator":
        dtypes = dict(reference.dtypes)
        for x, y in self.pairs:
            for c in (x, y):
                if c not in dtypes:
                    raise ValueError(f"column {c!r} not in reference")
        row = reference.agg(*self._sum_exprs(dtypes, "")).first().asDict()
        self._ref = {
            _pair_key(x, y): self._corr_from_row(row, _pair_key(x, y))
            for x, y in self.pairs
        }
        return self

    @property
    def _methods(self) -> Tuple[str, str]:
        if self.null_indicators:
            return ("null_corr", "null_corr_shift")
        return ("pearson_corr", "corr_shift")

    def _long(self, wide: DataFrame, prefix: str, hdr_cols=()) -> DataFrame:
        m_corr, m_shift = self._methods
        structs = []
        for x, y in self.pairs:
            k = _pair_key(x, y)
            corr = self._corr_col(prefix, k)
            ref = self._ref[k]
            shift = (
                F.abs(corr - F.lit(float(ref))) if ref is not None
                else F.lit(None).cast("double")
            )
            structs += [
                F.struct(
                    F.lit(k).alias("column_name"),
                    F.lit(m_corr).alias("method"),
                    corr.alias("value"),
                ),
                F.struct(
                    F.lit(k).alias("column_name"),
                    F.lit(m_shift).alias("method"),
                    shift.alias("value"),
                ),
            ]
        return wide.select(CHUNK_KEY, *hdr_cols, F.explode(F.array(*structs)).alias("kv")).select(
            CHUNK_KEY, *hdr_cols, "kv.column_name", "kv.method", "kv.value"
        )

    def _strip_informational(self, out: DataFrame) -> DataFrame:
        # corr rows are informational: a stored row with value=0.9,
        # upper_threshold=0.25, alert=false would contradict itself
        keep = F.col("method") == self._methods[1]
        return (
            out.withColumn("lower_threshold", F.when(keep, F.col("lower_threshold")))
            .withColumn("upper_threshold", F.when(keep, F.col("upper_threshold")))
            .withColumn("alert", F.when(keep, F.col("alert")).otherwise(F.lit(False)))
        )

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        if self._ref is None:
            raise RuntimeError("fit first")
        dtypes = dict(df.dtypes)
        assigned, headers = assign_chunks(df, self.chunker)
        wide = assigned.groupBy(CHUNK_KEY).agg(*self._sum_exprs(dtypes, ""))
        long_df = self._long(wide, "")
        out = _attach_const_threshold(long_df, headers, period, None, self.upper_threshold)
        return self._strip_informational(out)

    def fuse_contrib(self, dtypes, prefix: str):
        """Suite-fusion hook — the whole check is aggregate expressions."""
        if self._ref is None:
            raise RuntimeError("fit first")
        exprs = self._sum_exprs(dtypes, prefix)

        def fin(wide: DataFrame, period: str) -> DataFrame:
            long_df = self._long(wide, prefix, hdr_cols=_FUSE_HDR_COLS)
            out = _attach_const_threshold(long_df, None, period, None, self.upper_threshold)
            return self._strip_informational(out)

        return exprs, fin

    # ---- state --------------------------------------------------------------

    def get_state(self) -> dict:
        if self._ref is None:
            raise RuntimeError("fit first")
        return {
            "pairs": [list(p) for p in self.pairs],
            "upper_threshold": self.upper_threshold,
            "null_indicators": self.null_indicators,
            "corr": {k: v for k, v in self._ref.items()},
        }

    def set_state(self, state: dict) -> "CorrelationDriftCalculator":
        # the CONFIGURED pairs govern: stored state that doesn't cover them
        # (a pair added to the config since the fit) raises KeyError so the
        # runner refits instead of silently scoring the old pair set
        self.upper_threshold = float(state["upper_threshold"])
        if bool(state.get("null_indicators", False)) != self.null_indicators:
            # value-corr state scoring null-flags (or vice versa) would be
            # silently wrong — raise so the runner refits
            raise ValueError("stored state has a different null_indicators mode")
        corr = state["corr"]
        self._ref = {}
        for x, y in self.pairs:
            k = _pair_key(x, y)
            v = corr[k]  # KeyError -> runner refits (stale-state contract)
            self._ref[k] = None if v is None else float(v)
        return self
