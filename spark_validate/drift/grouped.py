"""Conditional (per-group) drift — drift of a column WITHIN each category.

A corpus-wide histogram can stay perfectly still while one segment moves:
widths drift only for ``fmt='png'`` images, prices only for one returnflag.
The reference has no conditional variant of its UnivariateDriftCalculator
(`nannyml/drift/univariate/calculator.py` is whole-frame only); the
idiomatic Spark answer is not a new engine but a DERIVATION — each group
becomes its own column ``value@group`` (``when(group == g, value)``), and
the existing multi-column calculator runs over all of them in its usual
amortized single fit + single analysis pass. NULLs (rows of other groups)
are excluded from histograms by the calculator's standard non-null
semantics, so each derived column's distribution IS the conditional
distribution, and every facility of the univariate path — shared
histogram exchanges, thresholds, ECDF sketches, state roundtrip, fused
suites — applies unchanged.

Group discovery is fit-time and BOUNDED: the top ``top_k_groups``
reference groups by count, ranked Spark-side with ``LIMIT`` before any
collect (the same driver-OOM guard as the categorical-drift fit —
`drift/univariate.py` round-4 fix). Analysis rows outside the fitted
groups are simply not monitored (they surface through the ordinary
whole-frame drift / unseen-values checks, which this calculator
complements rather than replaces).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.drift.univariate import UnivariateDriftCalculator


class GroupedDriftCalculator:
    """Per-group drift of ``value_col`` conditioned on ``group_col``.

    Output rows carry ``column_name = "<value_col>@<group>"`` — one drift
    series per fitted group, same long schema as the univariate
    calculator. Group values must not contain ``.`` or backticks (they
    become column names).
    """

    def __init__(
        self,
        value_col: str,
        group_col: str,
        continuous_methods: Sequence[str] = ("jensen_shannon",),
        categorical_methods: Sequence[str] = ("jensen_shannon",),
        top_k_groups: int = 20,
        chunker=None,
        threshold=None,
        n_bins_doane: Optional[int] = None,
        computation: str = "auto",
    ):
        self.value_col = value_col
        self.group_col = group_col
        self.continuous_methods = tuple(continuous_methods)
        self.categorical_methods = tuple(categorical_methods)
        self.top_k_groups = int(top_k_groups)
        self.chunker = chunker
        self.threshold = threshold
        self.n_bins_doane = n_bins_doane
        self.computation = computation
        self._groups: Optional[list] = None
        self._calc: Optional[UnivariateDriftCalculator] = None

    # ---- derivation ---------------------------------------------------------

    def _colname(self, g) -> str:
        return f"{self.value_col}@{g}"

    def _derived(self, df: DataFrame) -> DataFrame:
        assert self._groups is not None
        derived = [
            F.when(F.col(self.group_col) == F.lit(g), F.col(self.value_col)).alias(
                self._colname(g)
            )
            for g in self._groups
        ]
        return df.select(*df.columns, *derived)

    def _build_inner(self) -> UnivariateDriftCalculator:
        return UnivariateDriftCalculator(
            [self._colname(g) for g in self._groups],
            continuous_methods=self.continuous_methods,
            categorical_methods=self.categorical_methods,
            chunker=self.chunker,
            threshold=self.threshold,
            n_bins_doane=self.n_bins_doane,
            computation=self.computation,
        )

    # ---- fit / calculate ----------------------------------------------------

    def fit(self, reference: DataFrame) -> "GroupedDriftCalculator":
        # bounded discovery: rank + LIMIT run distributed; only ≤K tiny rows
        # reach the driver. (cnt DESC, group ASC) is a total order → the
        # fitted group set is deterministic even under count ties.
        top = (
            reference.filter(F.col(self.group_col).isNotNull())
            .groupBy(self.group_col)
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .orderBy(F.desc("_cnt"), F.asc(self.group_col))
            .limit(self.top_k_groups)
            .collect()
        )
        if not top:
            raise ValueError(f"reference has no non-null {self.group_col}")
        groups = [row[self.group_col] for row in top]
        for g in groups:
            if "." in str(g) or "`" in str(g):
                raise ValueError(f"group value {g!r} cannot form a column name")
        # stable presentation order independent of reference counts
        self._groups = sorted(groups, key=str)
        self._calc = self._build_inner()
        self._calc.fit(self._derived(reference))
        return self

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        if self._calc is None:
            raise RuntimeError("fit first")
        return self._calc.calculate(self._derived(df), period)

    def release_cache(self):
        if self._calc is not None:
            self._calc.release_cache()

    # ---- state --------------------------------------------------------------

    def get_state(self) -> dict:
        if self._calc is None:
            raise RuntimeError("fit first")
        return {
            "value_col": self.value_col,
            "group_col": self.group_col,
            "groups": list(self._groups),
            "inner": self._calc.get_state(),
        }

    def set_state(self, state: dict) -> "GroupedDriftCalculator":
        self.value_col = state["value_col"]
        self.group_col = state["group_col"]
        self._groups = list(state["groups"])
        self._calc = self._build_inner()
        self._calc.set_state(state["inner"])
        return self
