"""Segment performance-gap rollup — worst-vs-best cohort per chunk.

``SegmentedChunker`` makes every calculator per-cohort; the first question
a per-segment metric table raises is *how unequal are the cohorts, and
which one is worst* — Fairlearn's ``MetricFrame.difference()`` /
model-fairness dashboards reduce the segment axis to exactly this number.
``segment_gap`` performs that reduction on ANY result frame whose
``chunk_key`` carries the segmented composite form ``<base>|<segment>``:
per (base chunk × column × method), the max−min metric value across
segments, with the extreme segment names and values (``max_*`` / ``min_*``
— orientation-neutral, since "best" flips for error metrics like MAE).

Pure post-processing over the ≤(chunks × segments × methods) result frame
— one groupBy on a frame that is already tiny by construction; no contact
with the data-side tables.  Determinism: the max side ties
break toward the LARGER segment label, the min side toward the smaller
(both via struct(value, segment) extrema) — stable in any
engine.  NULL metric values (e.g. a precision with no predicted
positives in that cohort) are excluded before the rollup; ``n_segments``
counts the cohorts that actually produced a value, and single-segment
groups report gap 0 over one cohort rather than disappearing.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["segment_gap"]


def segment_gap(
    result: DataFrame,
    sep: str = "|",
    gap_threshold: Optional[float] = None,
) -> DataFrame:
    """Collapse a SegmentedChunker result frame to per-(base chunk ×
    column × method) cohort gaps.  ``gap_threshold`` adds an ``alert``
    column (gap strictly above the threshold); without it ``alert`` is
    False everywhere (informational rollup)."""
    # Split on the FIRST separator: the base chunker never emits the
    # separator, but a segment VALUE may (e.g. a pipe-bearing category), so
    # last-occurrence parsing would truncate it.  A key with no separator at
    # all is not a SegmentedChunker key — fail loudly, not group silently.
    pos = F.locate(sep, F.col("chunk_key"))
    bad = F.raise_error(
        F.concat(
            F.lit(f"segment_gap: chunk_key without segment separator {sep!r}: "),
            F.col("chunk_key"),
        )
    )
    base = F.when(pos > 0, F.substring(F.col("chunk_key"), F.lit(1), pos - 1)).otherwise(bad)
    seg = F.when(pos > 0, F.col("chunk_key").substr(pos + len(sep), F.length("chunk_key"))).otherwise(bad)
    keys = ["chunk_key", "column_name", "method"]
    carry = [c for c in ("period",) if c in result.columns]
    df = result.filter(F.col("value").isNotNull()).select(
        base.alias("chunk_key"),
        seg.alias("segment"),
        *carry,
        "column_name",
        "method",
        F.col("value").cast("double").alias("value"),
    )
    hi = F.max(F.struct(F.col("value"), F.col("segment")))
    lo = F.min(F.struct(F.col("value"), F.col("segment")))
    out = df.groupBy(*keys, *carry).agg(
        F.count(F.lit(1)).alias("n_segments"),
        hi.alias("_hi"),
        lo.alias("_lo"),
    )
    gap = (F.col("_hi")["value"] - F.col("_lo")["value"]).alias("gap")
    alert = (
        F.coalesce(F.col("_hi")["value"] - F.col("_lo")["value"] > F.lit(float(gap_threshold)), F.lit(False))
        if gap_threshold is not None
        else F.lit(False)
    )
    return out.select(
        *keys,
        *carry,
        "n_segments",
        gap,
        F.col("_hi")["segment"].alias("max_segment"),
        F.col("_hi")["value"].alias("max_value"),
        F.col("_lo")["segment"].alias("min_segment"),
        F.col("_lo")["value"].alias("min_value"),
        alert.alias("alert"),
    )
