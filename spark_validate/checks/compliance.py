"""Generic SQL-predicate compliance — Deequ's ``satisfies`` analyzer.

Every rule is a named BOOLEAN SQL expression over the row ("l_shipdate <=
l_receiptdate", "w * h >= 1024", "fmt != 'bmp' OR w <= 256"); the check
reports the per-chunk rate of rows VIOLATING each rule and streams the
violating rows. This is the escape hatch for the cross-column business
invariants the typed checks (range/domain/fd/…) don't model — Deequ's
``Compliance``/``satisfies`` and Great Expectations'
``expect_*_to_satisfy`` carry the same surface; NannyML has no analog
(closest is the thresholded stats family, `nannyml/data_quality/`).

NULL semantics: a rule evaluating to NULL (any NULL operand under SQL
three-valued logic) counts as a VIOLATION — "cannot prove compliant" is
non-compliant, the Deequ convention. Rules that must tolerate NULLs say
so explicitly (``x IS NULL OR x > 0``).

Scale shape: each rule compiles to one codegen conditional-count aggregate
in the single ``groupBy(chunk)`` pass — fusable into the suite's shared
scan; violations are a pushdown-friendly filter of the same expression.
The expression string is parsed by Catalyst, so rules stay JVM-side —
never a Python UDF.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks
from spark_validate.checks.constraints import _FUSE_HDR_COLS, _attach_const_threshold
from spark_validate.chunking import CHUNK_KEY, Chunker, DefaultChunker
from spark_validate.thresholds import ConstantThreshold


@dataclass
class ComplianceCheck:
    """Per-chunk violation rate for each named boolean rule."""

    rules: Dict[str, str]  # rule name -> boolean SQL expression
    chunker: Chunker = field(default_factory=DefaultChunker)
    threshold: ConstantThreshold = field(default_factory=lambda: ConstantThreshold(lower=None, upper=0))
    id_column: Optional[str] = None  # row identity in violation output

    def __post_init__(self):
        if not self.rules:
            raise ValueError("rules must be non-empty")

    def _violates(self, sql: str) -> F.Column:
        # NULL predicate -> violation (cannot prove compliant)
        return ~F.coalesce(F.expr(sql), F.lit(False))

    def _exprs(self, prefix: str):
        exprs = [F.count(F.lit(1)).alias(f"{prefix}__rows")]
        for i, sql in enumerate(self.rules.values()):
            exprs.append(
                F.count(F.when(self._violates(sql), F.lit(1))).alias(f"{prefix}__r{i}")
            )
        return exprs

    def _melt(self, wide: DataFrame, prefix: str, hdr_cols=()) -> DataFrame:
        pairs = [
            F.struct(
                F.lit(name).alias("column_name"),
                F.lit("compliance_violation_rate").alias("method"),
                (F.col(f"{prefix}__r{i}") / F.col(f"{prefix}__rows"))
                .cast("double")
                .alias("value"),
            )
            for i, name in enumerate(self.rules.keys())
        ]
        return wide.select(
            CHUNK_KEY, *hdr_cols, F.explode(F.array(*pairs)).alias("kv")
        ).select(CHUNK_KEY, *hdr_cols, "kv.column_name", "kv.method", "kv.value")

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        assigned, headers = assign_chunks(df, self.chunker)
        wide = assigned.groupBy(CHUNK_KEY).agg(*self._exprs(""))
        long_df = self._melt(wide, "")
        return _attach_const_threshold(
            long_df, headers, period, self.threshold.lower, self.threshold.upper
        )

    def fuse_contrib(self, dtypes, prefix: str):
        exprs = self._exprs(prefix)

        def fin(wide: DataFrame, period: str) -> DataFrame:
            long_df = self._melt(wide, prefix, hdr_cols=_FUSE_HDR_COLS)
            return _attach_const_threshold(
                long_df, None, period, self.threshold.lower, self.threshold.upper
            )

        return exprs, fin

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        row_id = row_id or self.id_column
        assigned = self.chunker.assign(df)
        parts = []
        for name, sql in self.rules.items():
            parts.append(
                assigned.filter(self._violates(sql)).select(
                    F.lit("compliance").alias("check"),
                    F.lit(name).alias("column_name"),
                    F.col(CHUNK_KEY),
                    (
                        F.col(row_id).cast("string")
                        if row_id
                        else F.lit(None).cast("string")
                    ).alias("row_id"),
                    F.lit("rule_violation").alias("violation_kind"),
                    F.lit(sql).alias("observed_value"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
