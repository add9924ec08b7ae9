"""Sources & sinks (reference: `nannyml/io/file_reader.py:16-85`,
`nannyml/io/raw_files_writer.py:16-95`).

Parquet/CSV/JSON/ORC via the Spark datasource API (pushdown + pruning free);
Iceberg via the catalog when its runtime jar is on the classpath (import-try
per the environment contract — the jar is absent in this container)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, path_or_table: str, fmt: Optional[str] = None) -> DataFrame:
    """Read a source by extension or explicit format. ``table:<name>`` reads
    from the session catalog (Iceberg/Hive when configured)."""
    if path_or_table.startswith("table:"):
        return spark.read.table(path_or_table[len("table:"):])
    f = fmt
    if f is None:
        low = path_or_table.lower()
        if low.endswith((".pq", ".parquet")) or "parquet" in low:
            f = "parquet"
        elif low.endswith(".csv"):
            f = "csv"
        elif low.endswith((".json", ".jsonl")):
            f = "json"
        elif low.endswith(".orc"):
            f = "orc"
        else:
            f = "parquet"
    reader = spark.read
    if f == "csv":
        return reader.option("header", True).option("inferSchema", True).csv(path_or_table)
    return reader.format(f).load(path_or_table)


def write_results(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "append", partition_by=None):
    """Long-form results/violations sink. On Iceberg deployments this becomes
    ``writeTo(...).append()`` for snapshot-atomic publishes."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    getattr(w, fmt)(path)
