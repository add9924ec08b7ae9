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
    """Long-form results/violations sink.

    ``table:<name>`` writes to the session catalog: the DataSourceV2
    ``writeTo(name).append()`` path first (snapshot-atomic on Iceberg), then
    the V1 ``insertInto`` fallback for builtin-catalog tables (this
    container has no Iceberg jar; the V2 call raises "Cannot write into v1
    table"). ``insertInto`` is positional — the frame's column order must
    match the table schema, which holds for our conformed long results."""
    if path.startswith("table:"):
        name = path[len("table:"):]
        spark = df.sparkSession
        if not spark.catalog.tableExists(name):
            save_catalog_table(df, name, partition_by=partition_by, fmt=fmt)
            return
        if mode == "overwrite":
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.format(fmt).saveAsTable(name)
            return
        try:
            df.writeTo(name).append()
        except Exception as e:  # pragma: no cover - exercised only sans Iceberg
            if "v1 table" not in str(e):
                raise
            df.write.mode("append").insertInto(name)
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    getattr(w, fmt)(path)


def save_catalog_table(df: DataFrame, name: str, partition_by=None, fmt: str = "parquet") -> None:
    """Materialize ``df`` as a (re-created) partitioned catalog table — the
    sandbox stand-in for an Iceberg table: reads via ``table:<name>`` hit the
    catalog's file index, so partition filters prune at the scan exactly as
    Iceberg metadata pruning would (asserted in tests/test_plans.py)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).saveAsTable(name)
