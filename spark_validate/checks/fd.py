"""Functional-dependency check: determinant columns → dependent column.

A functional dependency ``(a, b) → c`` holds when every distinct
determinant tuple maps to at most ONE distinct non-null dependent value —
zip→city, order→customer, sku→brand. Violations are the classic silent
join-corruption signal: an upstream merge duplicated a key with two
payloads, and every downstream join now fans out. Deequ/GreatExpectations
carry this as a first-class analyzer; the closest reference analogs are
the seen-set / duplicate machinery (`nannyml/data_quality/unseen/
calculator.py:126-131`) and the uniqueness semantics NannyML's docs call
out for identifier columns. The cross-modal
:class:`~spark_validate.image.consistency.CaptionConsistencyCheck` is the
special case ``phash → caption``; this is the relational general form
(multi-column determinant, any dependent).

Semantics:
  * rows with ANY NULL determinant component are ignored (no identity →
    nothing to contradict);
  * NULL dependents never count as a distinct value (missing values are
    the missing-rate check's job) but their rows still count toward the
    group and the per-chunk row base;
  * the dependency is judged over the WHOLE frame, the violating-row rate
    is reported PER CHUNK (corpus-level identity, chunk-level reporting —
    the UniquenessCheck convention).

Scale design (10^12 rows): two-level collapse — ``groupBy(dets…, dep)``
first, so map-side combine folds repeated (determinant, value) rows to one
shuffle row each; ``groupBy(dets…)`` then runs over the collapsed pairs.
The violating-group frame holds only determinants with ≥2 distinct
dependents — tiny in healthy data — so AQE broadcasts the join back to
the corpus; the corpus itself is never re-shuffled for the rate
aggregation. Witnesses are MIN/MAX dependent values (bounded,
deterministic — never a collect_list).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks
from spark_validate.checks.constraints import _attach_const_threshold
from spark_validate.chunking import CHUNK_KEY, Chunker, DefaultChunker


@dataclass
class FunctionalDependencyCheck:
    """Per-chunk rate of rows whose determinant group violates
    ``determinants → dependent``; violating rows as violation output."""

    determinants: Sequence[str]
    dependent: str
    chunker: Chunker = field(default_factory=DefaultChunker)
    upper_threshold: float = 0.0  # violating-row rate above this alerts

    def __post_init__(self):
        if not self.determinants:
            raise ValueError("determinants must be non-empty")
        if self.dependent in self.determinants:
            raise ValueError("dependent cannot be one of the determinants")

    def _det_ok(self) -> F.Column:
        return reduce(
            lambda a, b: a & b, [F.col(c).isNotNull() for c in self.determinants]
        )

    def violating_groups(self, df: DataFrame) -> DataFrame:
        """One row per violating determinant tuple: (dets…, n_rows,
        n_values, value_a, value_b)."""
        dets, dep = list(self.determinants), self.dependent
        pairs = (
            df.filter(self._det_ok())
            .groupBy(*dets, dep)
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        grouped = pairs.groupBy(*dets).agg(
            F.sum("_cnt").alias("n_rows"),
            F.count(F.when(F.col(dep).isNotNull(), F.lit(1))).alias("n_values"),
            F.min(dep).alias("value_a"),
            F.max(dep).alias("value_b"),
        )
        return grouped.filter(F.col("n_values") > 1)

    def _label(self) -> str:
        return f"{','.join(self.determinants)}->{self.dependent}"

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        assigned, headers = assign_chunks(df, self.chunker)
        dets = list(self.determinants)
        bad = self.violating_groups(df).select(*dets, F.lit(1).alias("_fd_bad"))
        # NULL determinant components never match the join key, so ignored
        # rows contribute 0 to __bad_rows by construction.
        marked = assigned.join(bad, dets, "left")
        agg = marked.groupBy(CHUNK_KEY).agg(
            F.count(F.lit(1)).alias("__rows"),
            F.sum(F.coalesce(F.col("_fd_bad"), F.lit(0))).alias("__bad_rows"),
        )
        long_df = agg.select(
            CHUNK_KEY,
            F.lit(self._label()).alias("column_name"),
            F.lit("fd_violation_rate").alias("method"),
            (F.col("__bad_rows") / F.col("__rows")).cast("double").alias("value"),
        )
        return _attach_const_threshold(
            long_df, headers, period, None, self.upper_threshold
        )

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        """Every row of every violating group, with the witness values."""
        assigned = self.chunker.assign(df)
        dets = list(self.determinants)
        bad = self.violating_groups(df)
        rows = assigned.join(bad, dets, "inner")
        return rows.select(
            F.lit("fd").alias("check"),
            F.lit(self._label()).alias("column_name"),
            F.col(CHUNK_KEY),
            (
                F.col(row_id).cast("string")
                if row_id
                else F.concat_ws("|", *[F.col(c).cast("string") for c in dets])
            ).alias("row_id"),
            F.lit("fd_violation").alias("violation_kind"),
            F.concat_ws(
                " <> ",
                F.col("value_a").cast("string"),
                F.col("value_b").cast("string"),
            ).alias("observed_value"),
        )
