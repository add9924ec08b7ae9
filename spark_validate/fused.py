"""Suite-level shared-scan fusion.

The reference runner loops calculators over the same frame
(`nannyml/runner.py:112-249`), which on Spark means N checks = N scans +
N shuffles of the fact table. At 100 TB the scan IS the cost: a suite of
stats + missing + range + domain checks re-reads the corpus four times for
four tiny per-chunk aggregates.

``fused_calculate`` computes ONE ``groupBy(chunk_key)`` aggregation carrying
every fused check's expressions — one scan, one shuffle, then each check's
long-form result is a projection of the persisted per-chunk wide frame
(≤ #chunks rows). Results are identical to the per-check path: the same
aggregate expressions run, only batched into one physical aggregation
(pinned by tests/test_runner.py::test_fused_matches_standalone).

Fusable checks expose ``fuse_contrib(dtypes, prefix) -> (agg_exprs,
finisher)``: ColumnStatsCalculator (which also backs MissingValues / the
summary-stats family), NumericalRangeCalculator, and UnseenValuesCalculator
(and thus DomainCheck) on the broadcast-list path. Checks that need their
own join/distinct topology (uniqueness, referential, drift histograms) keep
their standalone plans — fusing them into one agg would force a common
shuffle key they don't share.
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_validate.chunking import CHUNK_INDEX, CHUNK_KEY, ROW_INDEX, Chunker


def is_fusable(calc) -> bool:
    """True when the (fitted) calculator can contribute to a fused pass."""
    if not hasattr(calc, "fuse_contrib"):
        return False
    fus = getattr(calc, "fusable", True)  # UnseenValues: list-path only
    return bool(fus)


def fused_calculate(
    checks: Dict[str, object],
    df: DataFrame,
    chunker: Chunker,
    period: str = "analysis",
) -> Dict[str, DataFrame]:
    """Run every check in ``checks`` (name → fitted calculator) over ``df``
    with ONE scan + ONE chunk-keyed aggregation; returns name → result.

    The shared wide aggregate (one row per chunk) is persisted so the
    per-check projections don't recompute it; callers should trigger their
    actions promptly — the cache is ≤ #chunks rows either way.
    """
    if not checks:
        return {}, None
    assigned = chunker.assign(df)
    dtypes = dict(df.dtypes)

    # common chunk-header fields ride along in the same aggregation (the
    # ColumnStatsCalculator one-pass device, generalized to the suite)
    has_idx = ROW_INDEX in assigned.columns
    ts = chunker.timestamp_column
    hdr_aggs = [
        (F.min(ROW_INDEX) if has_idx else F.lit(None).cast("long")).alias("start_index"),
        (F.max(ROW_INDEX) if has_idx else F.lit(None).cast("long")).alias("end_index"),
        (F.min(ts) if ts else F.lit(None).cast("timestamp")).alias("start_ts"),
        (F.max(ts) if ts else F.lit(None).cast("timestamp")).alias("end_ts"),
    ]

    aggs = list(hdr_aggs)
    finishers: Dict[str, Tuple[str, object]] = {}
    for i, (name, calc) in enumerate(checks.items()):
        prefix = f"_f{i}_"
        exprs, fin = calc.fuse_contrib(dtypes, prefix)
        aggs.extend(exprs)
        finishers[name] = fin

    wide = assigned.groupBy(CHUNK_KEY).agg(*aggs)
    order_col = "start_index" if has_idx else ("start_ts" if ts else CHUNK_KEY)
    # ≤ #chunks rows: the unpartitioned window is a single tiny task
    wide = wide.withColumn(CHUNK_INDEX, F.row_number().over(Window.orderBy(order_col)) - F.lit(1))
    wide = wide.persist()
    results = {name: fin(wide, period) for name, fin in finishers.items()}
    return results, wide
