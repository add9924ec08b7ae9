"""Bounded reference caching for multi-pass fit() stages.

Every calculator's fit makes several passes over the reference frame
(summary aggregates, histogram shuffles, seeded sample collects, a chunked
threshold pass). Without caching, each pass re-runs the scan and any
derived-column expressions. Fitting is a once-per-deployment cost, but at
sandbox/benchmark scale the repeated scans dominate fit wall time.

``cached_for_fit`` persists the frame at MEMORY_AND_DISK (spills, never
OOMs) for the duration of the fit and always unpersists on exit. For
references too large to be worth caching (the passes themselves are already
bounded aggregations), disable globally with
``SPARK_VALIDATE_NO_FIT_CACHE=1`` — the helper then passes the frame
through untouched. Analysis/calculate passes are NOT cached by this helper:
they are the recurring production cost and stay single-pass by design.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark import StorageLevel
from pyspark.sql import DataFrame


@contextmanager
def cached_for_fit(df: DataFrame, columns=None):
    """``columns``: the set the fit actually reads. Persisting the full-width
    frame would defeat column pruning (each pass previously scanned 1–3
    parquet columns; the cache would materialize every column, including fat
    payload/map columns) — so callers MUST pass their needed columns, and the
    cache stores only that projection. ``None`` caches the frame as-is (only
    correct when the caller already projected)."""
    if os.environ.get("SPARK_VALIDATE_NO_FIT_CACHE", "") == "1":
        yield df
        return
    if columns is not None:
        have = set(df.columns)
        cols = [c for c in dict.fromkeys(columns) if c in have]
        df = df.select(*cols)
    p = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        yield p
    finally:
        p.unpersist(blocking=False)


def chunker_columns(chunker) -> list:
    """The input columns a chunker's assign/headers read — callers add these
    to their ``cached_for_fit`` projection. A SegmentedChunker contributes
    its base chunker's columns (recursively) plus the segment column."""
    cols = []
    base = getattr(chunker, "base", None)  # SegmentedChunker wraps a base
    if base is not None:
        cols.extend(chunker_columns(base))
    ts = getattr(chunker, "timestamp_column", None)
    if ts:
        cols.append(ts)
    for c in getattr(chunker, "order_by", None) or []:
        cols.append(c)
    for c in getattr(chunker, "columns", None) or []:  # PartitionChunker
        cols.append(c)
    seg = getattr(chunker, "segment_col", None)
    if seg:
        cols.append(seg)
    seen, out = set(), []
    for c in cols:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out
