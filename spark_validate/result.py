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
