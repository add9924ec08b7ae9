"""Incremental validation over Structured Streaming.

The reference is strictly batch (no streaming anywhere in NannyML; scheduled
re-runs via APScheduler, `nannyml/cli/run.py:46-58`). This engine keeps batch
as the primary mode (with lineage-table resume), but exposes the chunk-level
checks as STREAMING aggregations too: a tumbling event-time window is exactly
a PeriodBasedChunker chunk, so the same per-chunk metrics stream out of
``readStream → withWatermark → groupBy(window(ts))``, with alerts evaluated
against batch-fitted (broadcast) thresholds.

Semantics: watermarked windows handle late data; in append output mode a
window's metric row is emitted once the watermark passes — the streaming
equivalent of a completed chunk/partition in the lineage table.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_column_stats(
    stream: DataFrame,
    timestamp_column: str,
    columns: Sequence[str],
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-window missing-rate/avg/min/max/count for each column — the
    streaming analog of ColumnStatsCalculator's single agg pass."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        v = F.col(c)
        aggs += [
            ((F.count(F.lit(1)) - F.count(v)) / F.count(F.lit(1))).alias(f"{c}__missing_rate"),
            F.avg(v).alias(f"{c}__avg"),
            F.min(v).alias(f"{c}__min"),
            F.max(v).alias(f"{c}__max"),
        ]
    return (
        stream.withWatermark(timestamp_column, watermark)
        .groupBy(F.window(timestamp_column, window_duration).alias("chunk_window"))
        .agg(*aggs)
        .select(
            F.col("chunk_window.start").alias("start_ts"),
            F.col("chunk_window.end").alias("end_ts"),
            "*",
        )
        .drop("chunk_window")
    )


def streaming_violations(
    stream: DataFrame,
    column: str,
    domain: Optional[Sequence[str]] = None,
    valid_range: Optional[Tuple[float, float]] = None,
    range_kind: str = "out_of_range",
) -> DataFrame:
    """Row-level violation stream (domain and/or range) — a stateless filter,
    so it runs in append mode with no watermark requirement. ``range_kind``
    labels range trips (the fitted z-score gate reuses the range machinery
    with its own label)."""
    v = F.col(column)
    cond = F.lit(False)
    kind = F.lit(None).cast("string")
    if domain is not None:
        bad_domain = v.isNotNull() & ~v.cast("string").isin([str(x) for x in domain])
        cond = cond | bad_domain
        kind = F.when(bad_domain, F.lit("unseen_value")).otherwise(kind)
    if valid_range is not None:
        lo, hi = valid_range
        bad_range = v.isNotNull() & ((v < F.lit(lo)) | (v > F.lit(hi)))
        cond = cond | bad_range
        kind = F.when(bad_range, F.lit(range_kind)).otherwise(kind)
    return stream.filter(cond).withColumn("violation_kind", kind).withColumn(
        "column_name", F.lit(column)
    )


def streaming_quantiles(
    stream: DataFrame,
    timestamp_column: str,
    columns: Sequence[str],
    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    accuracy: int = 10_000,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-window quantile profile — the streaming analog of
    QuantileStatsCalculator's approx path (GK sketch per window × column,
    bounded state; exact quantiles are batch-only on a stream)."""
    qs = "array(" + ", ".join(repr(float(q)) for q in quantiles) + ")"
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(
            F.expr(f"approx_percentile(CAST(`{c}` AS DOUBLE), {qs}, {int(accuracy)})").alias(f"{c}__q")
        )
    out = (
        stream.withWatermark(timestamp_column, watermark)
        .groupBy(F.window(timestamp_column, window_duration).alias("chunk_window"))
        .agg(*aggs)
        .select(
            F.col("chunk_window.start").alias("start_ts"),
            F.col("chunk_window.end").alias("end_ts"),
            "*",
        )
        .drop("chunk_window")
    )
    for c in columns:
        for i, q in enumerate(quantiles):
            out = out.withColumn(f"{c}__p{q * 100:g}", F.col(f"{c}__q")[i])
        out = out.drop(f"{c}__q")
    return out


def streaming_cardinality(
    stream: DataFrame,
    timestamp_column: str,
    columns: Sequence[str],
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-window approximate distinct count/ratio per column — the streaming
    analog of CardinalityCalculator's approx path (a tumbling window is a
    chunk). HLL++ sketches merge inside the windowed aggregation, so state
    per (window × column) is one bounded sketch — exact distinct counting
    is a batch job (unbounded per-window state on a stream)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(F.approx_count_distinct(c).alias(f"{c}__approx_distinct"))
    out = (
        stream.withWatermark(timestamp_column, watermark)
        .groupBy(F.window(timestamp_column, window_duration).alias("chunk_window"))
        .agg(*aggs)
        .select(
            F.col("chunk_window.start").alias("start_ts"),
            F.col("chunk_window.end").alias("end_ts"),
            "*",
        )
        .drop("chunk_window")
    )
    for c in columns:
        out = out.withColumn(
            f"{c}__approx_distinct_ratio", F.col(f"{c}__approx_distinct") / F.col("n_rows")
        )
    return out


def attach_thresholds(
    stats: DataFrame,
    thresholds: Dict[str, Tuple[Optional[float], Optional[float]]],
    metric_suffix: str = "__avg",
) -> DataFrame:
    """Evaluate batch-fitted thresholds against a streaming stats frame:
    adds ``{col}__alert`` per configured column. Thresholds are literals
    (broadcast by construction) — the fit stays a batch job, exactly like the
    reference's fit-on-reference / monitor-forever split."""
    out = stats
    for col, (lo, up) in thresholds.items():
        v = F.col(f"{col}{metric_suffix}")
        below = F.lit(False) if lo is None else v < F.lit(lo)
        above = F.lit(False) if up is None else v > F.lit(up)
        out = out.withColumn(f"{col}__alert", F.coalesce(below | above, F.lit(False)))
    return out


def streaming_freshness(
    stream: DataFrame,
    timestamp_column: str,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
    bucket_seconds: Optional[int] = 60,
    min_rows: Optional[int] = None,
    min_bucket_fill: Optional[float] = None,
    rsd: float = 0.01,
) -> DataFrame:
    """Per-window ingest health — the streaming analog of
    ``checks/freshness.py::FreshnessCheck``'s aggregate metrics: row volume,
    observed event-time span, and temporal completeness (approx distinct
    ``bucket_seconds`` buckets ÷ the buckets the WINDOW should contain — an
    outage inside the window reads as missing buckets). HLL++ merges inside
    the windowed aggregation so per-window state is one bounded sketch; the
    batch check owns exact bucket counts and the max-gap sort (unbounded
    per-window state on a stream), and wall-clock staleness belongs to the
    watermark/trigger layer, not a deterministic aggregate.

    A window with NO rows never emits (there is nothing to aggregate) —
    silence detection is the ``min_rows`` alert on the windows that DO emit
    plus the consumer noticing absent windows; both thresholds are optional
    (``freshness_alert`` stays False without them).
    """
    ts = F.col(timestamp_column).cast("timestamp").cast("double")
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min(ts).alias("__mn"),
        F.max(ts).alias("__mx"),
    ]
    if bucket_seconds:
        # tight rsd: bucket counts are small (window/bucket ≤ thousands), so
        # a dense high-precision sketch is still a few-KB bounded state and
        # keeps the fill rate honest enough for a 0.8-style threshold
        aggs.append(
            F.approx_count_distinct(
                F.floor(ts / F.lit(float(bucket_seconds))), rsd
            ).alias("__nb")
        )
    out = (
        stream.withWatermark(timestamp_column, watermark)
        .groupBy(F.window(timestamp_column, window_duration).alias("chunk_window"))
        .agg(*aggs)
        .select(
            F.col("chunk_window.start").alias("window_start"),
            F.col("chunk_window.end").alias("window_end"),
            "*",
        )
        .drop("chunk_window")
    )
    out = out.withColumn("span_seconds", (F.col("__mx") - F.col("__mn")).cast("double"))
    alert = F.lit(False)
    if bucket_seconds:
        expected = F.ceil(
            (F.col("window_end").cast("double") - F.col("window_start").cast("double"))
            / F.lit(float(bucket_seconds))
        )
        out = out.withColumn(
            "bucket_fill_rate",
            (F.col("__nb") / expected.cast("double")).cast("double"),
        ).drop("__nb")
        if min_bucket_fill is not None:
            alert = alert | (F.col("bucket_fill_rate") < F.lit(float(min_bucket_fill)))
    if min_rows is not None:
        alert = alert | (F.col("n_rows") < F.lit(int(min_rows)))
    return out.drop("__mn", "__mx").withColumn(
        "freshness_alert", F.coalesce(alert, F.lit(False))
    )


def streaming_benford(
    stream: DataFrame,
    timestamp_column: str,
    columns: Sequence[str],
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
    upper_threshold: float = 0.015,
) -> DataFrame:
    """Per-window Benford first-digit MAD — the streaming analog of
    BenfordCalculator (a tumbling window is a chunk). The digit counts are
    the batch check's own codegen expressions compiled into one windowed
    aggregation, so per-window values are formula-identical to a batch run
    chunked on the same windows; state per (window × column) is 10 counters.
    """
    from spark_validate.checks.profile import BenfordCalculator
    from spark_validate.chunking import CHUNK_KEY

    calc = BenfordCalculator(list(columns))
    wide = (
        stream.withWatermark(timestamp_column, watermark)
        .groupBy(F.window(timestamp_column, window_duration).alias("chunk_window"))
        .agg(*calc._exprs({}, ""))
        .select(
            F.col("chunk_window.start").cast("string").alias(CHUNK_KEY),
            F.col("chunk_window.start").alias("start_ts"),
            F.col("chunk_window.end").alias("end_ts"),
            "*",
        )
        .drop("chunk_window")
    )
    long_df = calc._melt(wide, "", hdr_cols=("start_ts", "end_ts"))
    return (
        long_df.withColumn("lower_threshold", F.lit(None).cast("double"))
        .withColumn("upper_threshold", F.lit(float(upper_threshold)))
        .withColumn(
            "alert",
            F.coalesce(F.col("value") > F.lit(float(upper_threshold)), F.lit(False)),
        )
    )


def streaming_sessions(
    stream: DataFrame,
    user_col: str = "user_id",
    timestamp_column: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-session aggregates on the ingest stream via Spark's native
    dynamic-gap ``session_window`` — the streaming sibling of
    ``sessionize.session_stats`` (same gap rule: a silence longer than
    ``gap`` closes the session). State per live (user × session) is one
    merging window, closed and emitted once the watermark passes its end —
    bounded by construction. Rows with a NULL actor or timestamp carry no
    session and are dropped here (the batch labeler keeps them as
    NULL-session rows)."""
    ok = F.col(user_col).isNotNull() & F.col(timestamp_column).isNotNull()
    out = (
        stream.filter(ok)
        .withWatermark(timestamp_column, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(timestamp_column), gap).alias("sw"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("sw.start").alias("start_ts"),
            F.col("sw.end").alias("end_ts"),
            "n_events",
        )
    )
    return out
