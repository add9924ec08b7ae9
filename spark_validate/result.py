"""Canonical long-form result/violation/lineage schemas.

The reference wraps results in a pandas MultiIndex frame
(`nannyml/base.py:24-312`); its own database writer flattens to long rows
(`nannyml/io/db/entities.py:73-111`) — one row per (chunk × column × method)
with value / thresholds / alert. We adopt that long form as THE result schema:
it is stable-width, Spark-native, and unions across checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("chunk_key", T.StringType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("start_index", T.LongType()),
        T.StructField("end_index", T.LongType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("end_ts", T.TimestampType()),
        T.StructField("period", T.StringType()),
        T.StructField("column_name", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("sampling_error", T.DoubleType()),
        T.StructField("lower_confidence_boundary", T.DoubleType()),
        T.StructField("upper_confidence_boundary", T.DoubleType()),
        T.StructField("lower_threshold", T.DoubleType()),
        T.StructField("upper_threshold", T.DoubleType()),
        T.StructField("alert", T.BooleanType()),
    ]
)

RESULT_COLUMNS = [f.name for f in RESULT_SCHEMA.fields]

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("check", T.StringType()),
        T.StructField("column_name", T.StringType()),
        T.StructField("chunk_key", T.StringType()),
        T.StructField("row_id", T.StringType()),
        T.StructField("violation_kind", T.StringType()),
        T.StructField("observed_value", T.StringType()),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("partition_id", T.StringType()),
        T.StructField("checkpoint_epoch", T.LongType()),
        T.StructField("rows_seen", T.LongType()),
        T.StructField("metrics", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("status", T.StringType()),
    ]
)


def conform_result(df: DataFrame) -> DataFrame:
    """Project/cast a result-shaped DataFrame onto RESULT_SCHEMA column order,
    filling absent optional columns with NULL."""
    cols = []
    for fld in RESULT_SCHEMA.fields:
        if fld.name in df.columns:
            cols.append(F.col(fld.name).cast(fld.dataType).alias(fld.name))
        else:
            cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
    return df.select(*cols)


def filter_result(
    df: DataFrame,
    period: str | None = None,
    metrics=None,
    columns=None,
    methods=None,
) -> DataFrame:
    """Reference-compat accessor (`nannyml/base.py:104-186`
    ``Result.filter(period, metrics)``): narrow a long result frame by
    period ('reference'/'analysis'/'all'), metric/method names, and column
    names. ``metrics`` and ``methods`` are aliases (the reference uses
    'metrics' for performance results and methods for drift)."""
    out = df
    if period and period != "all":
        out = out.filter(F.col("period") == period)
    sel = metrics if metrics is not None else methods
    if sel is not None:
        sel = [sel] if isinstance(sel, str) else list(sel)
        out = out.filter(F.col("method").isin(sel))
    if columns is not None:
        columns = [columns] if isinstance(columns, str) else list(columns)
        out = out.filter(F.col("column_name").isin(columns))
    return out


def result_to_wide(df: DataFrame, values: str = "value") -> DataFrame:
    """Reference-compat ``to_df(multilevel=True)`` analog
    (`nannyml/base.py:188-244`): pivot the long frame to one row per chunk
    with a ``<column>__<method>`` column per (column_name, method) pair —
    the flat-Spark stand-in for the pandas MultiIndex. Pivot width is
    #columns × #methods (bounded by the check config, not the data), so the
    pivot is safe at any row scale."""
    keyed = df.withColumn(
        "_cm",
        F.when(
            F.col("column_name").isNotNull() & (F.col("column_name") != ""),
            F.concat_ws("__", "column_name", "method"),
        ).otherwise(F.col("method")),
    )
    idx = ["chunk_key", "chunk_index", "start_ts", "end_ts", "period"]
    return (
        keyed.groupBy(*idx)
        .pivot("_cm")
        .agg(F.first(values))
        .orderBy("chunk_index")
    )


def values_with_alerts(df: DataFrame, method: str, column: str | None = None):
    """Reference-compat ``values(key)`` / ``alerts(key)`` accessor pair
    (`nannyml/base.py:246-312`): the (chunk, value, alert) series for one
    method (and optionally one column)."""
    out = df.filter(F.col("method") == method)
    if column is not None:
        out = out.filter(F.col("column_name") == column)
    return out.select("chunk_key", "chunk_index", "value", "alert").orderBy("chunk_index")
