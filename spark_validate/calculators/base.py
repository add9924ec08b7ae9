"""Shared fit/calculate plumbing for chunked calculators.

Execution shape (the whole engine rests on this):

* ``fit(reference)`` — aggregate the reference into a SMALL fitted state
  (per-column components + per-(column, method) thresholds). The state lives
  on the driver and is serializable; anything joined back in at calculate
  time is broadcast.
* ``calculate(analysis)`` — ONE ``groupBy(chunk_key)`` pass over the data
  computing every (column × metric) simultaneously, then a melt to the long
  result schema and a broadcast join against thresholds. Rows scale with
  chunks, not input rows, after the first aggregation.

Reference template: ``nannyml/base.py:315-382`` (AbstractCalculator), but the
chunk loop (`nannyml/drift/univariate/calculator.py:330-365`) is replaced by a
single shuffle.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.chunking import CHUNK_KEY, Chunker


def assign_chunks(df: DataFrame, chunker: Chunker) -> Tuple[DataFrame, DataFrame]:
    """Assign chunk keys and build the per-chunk header table (tiny)."""
    assigned = chunker.assign(df)
    headers = chunker.headers(assigned)
    return assigned, headers


def nan_to_null(col: F.Column, dtype: str) -> F.Column:
    """NannyML drops NaNs before every computation (`nannyml/base.py:545-567`);
    Spark aggregates skip NULLs but propagate NaNs — normalize NaN → NULL for
    float types so the semantics line up."""
    if dtype in ("double", "float"):
        return F.when(F.isnan(col), F.lit(None)).otherwise(col)
    return col


def join_headers_long(long_df: DataFrame, headers: DataFrame, period: str) -> DataFrame:
    """Attach chunk headers (broadcast — one row per chunk) + period label."""
    return long_df.join(F.broadcast(headers), CHUNK_KEY, "left").withColumn("period", F.lit(period))
