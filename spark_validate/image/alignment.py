"""Cross-modal alignment gate — the CLIP-score filter for image+caption
tables.

Web-scraped image+caption corpora are gated on the cosine between the
image embedding and the caption embedding (LAION-400M/5B kept pairs with
CLIP cosine ≥ 0.28; DataComp made the same score its primary baseline
filter).  This module supplies that gate for a table that already carries
both embedding columns (the encoders themselves are model inference, out
of engine scope — same boundary as the phash/embedding dedup ops):

* ``cosine_sql`` / ``with_alignment_score`` — the score as ONE Catalyst
  SQL expression per row: three single-pass ``aggregate`` folds (dot,
  |a|², |b|²) over ``zip_with``/``transform`` arrays, JVM-side, zero
  shuffle, zero Python.  Norms are floored at 1e-12 (the convention the
  embedding-dedup ops already use) so zero vectors score NULL-safe 0.
* ``alignment_rule`` — the gate as compliance-rule TEXT, so it fuses into
  the suite's shared scan and streams via the stateless violation path
  like any other row-local rule.
* ``AlignmentCheck`` — per-chunk mean score + misalignment rate (score
  below ``min_score`` or incomputable), violation rows naming each
  misaligned pair.  Reference model: NannyML has no cross-modal surface;
  the rate plugs into the standard threshold/alert layer.

A missing or empty vector on either side yields a NULL score — under the
compliance NULL-is-violation convention such pairs count as misaligned
(cannot prove alignment), and the curation stage drops them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks
from spark_validate.chunking import CHUNK_KEY, Chunker, DefaultChunker

__all__ = [
    "cosine_sql",
    "with_alignment_score",
    "alignment_rule",
    "AlignmentCheck",
]

NORM_FLOOR = 1e-12


def _dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        f" CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def cosine_sql(vec_a: str, vec_b: str) -> str:
    """Cosine similarity of two ``array<double>``-castable columns as SQL
    TEXT: dot / (max(|a|, 1e-12) · max(|b|, 1e-12)).  NULL when either
    side is NULL or the lengths differ (zip_with pads with NULL → NULL
    products → NULL sum); 0 for zero vectors via the norm floor."""
    a, b = f"CAST({vec_a} AS ARRAY<DOUBLE>)", f"CAST({vec_b} AS ARRAY<DOUBLE>)"
    na = f"greatest(sqrt({_dot(a, a)}), {NORM_FLOOR!r})"
    nb = f"greatest(sqrt({_dot(b, b)}), {NORM_FLOOR!r})"
    return f"CASE WHEN {vec_a} IS NOT NULL AND {vec_b} IS NOT NULL AND size({a}) = size({b}) THEN {_dot(a, b)} / ({na} * {nb}) END"


def with_alignment_score(
    df: DataFrame,
    vec_a: str = "image_embedding",
    vec_b: str = "caption_embedding",
    out_col: str = "alignment_score",
) -> DataFrame:
    """Add the per-row cosine alignment score (double; NULL when either
    vector is missing or the dims disagree)."""
    return df.withColumn(out_col, F.expr(cosine_sql(vec_a, vec_b)))


def alignment_rule(
    vec_a: str = "image_embedding",
    vec_b: str = "caption_embedding",
    min_score: float = 0.28,
) -> dict:
    """The gate as `checks.compliance.ComplianceCheck` rules input — one
    named boolean "complies" expression (NULL = violation), fusable into
    the shared scan and streamable via the stateless compliance kind.
    Default 0.28 is the published LAION-400M CLIP-cosine cut."""
    return {"cross_modal_alignment": f"({cosine_sql(vec_a, vec_b)}) >= {float(min_score)!r}"}


@dataclass
class AlignmentCheck:
    """Per-chunk alignment profile: mean score + misalignment rate."""

    vec_a: str = "image_embedding"
    vec_b: str = "caption_embedding"
    id_col: str = "image_id"
    min_score: float = 0.28
    chunker: Chunker = field(default_factory=DefaultChunker)
    upper_threshold: float = 0.0  # alert when the misalignment rate exceeds this

    def _score(self) -> F.Column:
        return F.expr(cosine_sql(self.vec_a, self.vec_b))

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        from spark_validate.checks.constraints import _attach_const_threshold

        assigned, headers = assign_chunks(df, self.chunker)
        s = self._score()
        bad = F.when(F.coalesce(s >= F.lit(float(self.min_score)), F.lit(False)), None).otherwise(1)
        wide = assigned.groupBy(CHUNK_KEY).agg(
            F.count(F.lit(1)).alias("__rows"),
            F.avg(s).alias("__mean"),
            F.count(bad).alias("__bad"),
        )
        col_name = f"{self.vec_a}~{self.vec_b}"
        parts = [
            wide.select(
                CHUNK_KEY,
                F.lit(col_name).alias("column_name"),
                F.lit("alignment_mean").alias("method"),
                F.col("__mean").cast("double").alias("value"),
            ),
            wide.select(
                CHUNK_KEY,
                F.lit(col_name).alias("column_name"),
                F.lit("misalignment_rate").alias("method"),
                (F.col("__bad") / F.col("__rows")).cast("double").alias("value"),
            ),
        ]
        long_df = parts[0].unionByName(parts[1])
        # threshold/alert applies to the rate row only; the mean is
        # informational and must not inherit a rate-scaled bound
        return _attach_const_threshold(
            long_df, headers, period, None, None
        ).withColumn(
            "upper_threshold",
            F.when(F.col("method") == "misalignment_rate", F.lit(float(self.upper_threshold))),
        ).withColumn(
            "alert",
            F.when(
                F.col("method") == "misalignment_rate",
                F.coalesce(F.col("value") > F.lit(float(self.upper_threshold)), F.lit(False)),
            ).otherwise(F.lit(False)),
        )

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        assigned = self.chunker.assign(df)
        s = self._score()
        rid = row_id or self.id_col
        return (
            assigned.withColumn("__s", s)
            .filter(~F.coalesce(F.col("__s") >= F.lit(float(self.min_score)), F.lit(False)))
            .select(
                F.lit("alignment").alias("check"),
                F.lit(f"{self.vec_a}~{self.vec_b}").alias("column_name"),
                F.col(CHUNK_KEY),
                F.col(rid).cast("string").alias("row_id"),
                F.lit("misaligned_pair").alias("violation_kind"),
                F.coalesce(
                    F.col("__s").cast("string"), F.lit("incomputable")
                ).alias("observed_value"),
            )
        )
