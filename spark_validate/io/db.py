"""DatabaseWriter — long-form metric rows into a SQL database.

Reference: `nannyml/io/db/database_writer.py:19-133` +
`nannyml/io/db/entities.py:45-111` (SQLModel `run` table + per-chunk
`metric` rows with start/end timestamps, value, thresholds, alert). Same
surface here, minus the ORM: the engine's canonical RESULT_SCHEMA already
IS the reference's flattened DbMetric row.

Two paths:

* ``jdbc:*`` URLs → Spark's JDBC datasource (executors write in parallel;
  needs the vendor driver jar on the classpath — absent in this container,
  so it is attempted and surfaced, never silently skipped).
* ``sqlite:///path`` → stdlib ``sqlite3`` on the driver. This is scale-safe
  BY CONSTRUCTION of the result shape: metric rows are per
  (chunk × column × method) — thousands of rows for a 10^12-row input, not
  data-scale — and are streamed via ``toLocalIterator`` in bounded batches,
  never a full ``collect`` of anything row-scale.
"""

from __future__ import annotations

import datetime as _dt
import itertools
from typing import Iterable, Optional

from pyspark.sql import DataFrame

_METRIC_COLS = [
    "chunk_key",
    "chunk_index",
    "start_ts",
    "end_ts",
    "period",
    "column_name",
    "method",
    "value",
    "sampling_error",
    "lower_threshold",
    "upper_threshold",
    "alert",
]

_SQLITE_DDL_MODELS = (
    # reference `nannyml/io/db/entities.py:25-44` Model entity: upserted by
    # name so repeated runs of the same monitored model share one row
    "CREATE TABLE IF NOT EXISTS models ("
    " id INTEGER PRIMARY KEY AUTOINCREMENT,"
    " name TEXT NOT NULL UNIQUE)"
)

_SQLITE_DDL_RUNS = (
    "CREATE TABLE IF NOT EXISTS runs ("
    " id INTEGER PRIMARY KEY AUTOINCREMENT,"
    " run_id TEXT NOT NULL,"
    " model_id INTEGER REFERENCES models(id),"
    " model_name TEXT,"
    " execution_timestamp TEXT NOT NULL)"
)

_SQLITE_DDL_METRICS = (
    "CREATE TABLE IF NOT EXISTS {table} ("
    " id INTEGER PRIMARY KEY AUTOINCREMENT,"
    " run_id INTEGER NOT NULL REFERENCES runs(id),"
    " chunk_key TEXT, chunk_index INTEGER,"
    " start_timestamp TEXT, end_timestamp TEXT, timestamp TEXT,"
    " period TEXT, column_name TEXT, metric_name TEXT,"
    " value REAL, sampling_error REAL,"
    " lower_threshold REAL, upper_threshold REAL,"
    " alert INTEGER)"
)


def _batched(it: Iterable, size: int):
    it = iter(it)
    while True:
        chunk = list(itertools.islice(it, size))
        if not chunk:
            return
        yield chunk


class DatabaseWriter:
    """Write conformed long-form results into ``runs`` + a metrics table.

    Mirrors the reference's run bookkeeping: every ``write()`` inserts a new
    ``runs`` row and links each metric row to it
    (`database_writer.py:80-101`).
    """

    def __init__(
        self,
        connection_string: str,
        table: str = "metrics",
        model_name: Optional[str] = None,
        batch_size: int = 10_000,
        jdbc_mode: str = "append",
    ):
        self.connection_string = connection_string
        self.table = table
        self.model_name = model_name
        self.batch_size = batch_size
        self.jdbc_mode = jdbc_mode

    # ------------------------------------------------------------------
    def write(self, result: DataFrame, run_id: str = "run") -> int:
        """Write one result frame; returns the number of metric rows written."""
        if self.connection_string.startswith("jdbc:"):
            return self._write_jdbc(result, run_id)
        if self.connection_string.startswith("sqlite:///"):
            return self._write_sqlite(result, run_id)
        raise ValueError(
            f"unsupported connection string {self.connection_string!r}; "
            "expected jdbc:<vendor>://... or sqlite:///path"
        )

    def _metric_frame(self, result: DataFrame, run_id: str) -> DataFrame:
        """Conform to the reference's flattened DbMetric column names — the
        SAME shape both backends write, so queries/dashboards are portable.
        (JDBC has no driver-side ``runs`` table; the run label is carried on
        every row instead of a foreign key.)"""
        from pyspark.sql import functions as F

        cols = [c for c in _METRIC_COLS if c in result.columns]
        out = result.select(*cols)
        mid = (
            F.col("start_ts").cast("long")
            + (F.col("end_ts").cast("long") - F.col("start_ts").cast("long")) / 2
        ).cast("timestamp")
        return (
            out.withColumn("run_id", F.lit(run_id))
            .withColumn("timestamp", mid)  # before the renames it references
            .withColumnRenamed("start_ts", "start_timestamp")
            .withColumnRenamed("end_ts", "end_timestamp")
            .withColumnRenamed("method", "metric_name")
        )

    def _write_jdbc(self, result: DataFrame, run_id: str) -> int:
        # executor-parallel write; the count() is one extra pass over a
        # chunk-cardinality frame (cheap) to honor the rows-written contract
        frame = self._metric_frame(result, run_id)
        n = frame.count()
        (
            frame.write.format("jdbc")
            .option("url", self.connection_string)
            .option("dbtable", self.table)
            .mode(self.jdbc_mode)
            .save()
        )
        return n

    def _write_sqlite(self, result: DataFrame, run_id: str) -> int:
        import sqlite3

        path = self.connection_string[len("sqlite:///"):]
        rows_written = 0
        sel = result.select(*[c for c in _METRIC_COLS if c in result.columns])
        cols = sel.columns
        conn = sqlite3.connect(path)
        try:
            conn.execute(_SQLITE_DDL_MODELS)
            conn.execute(_SQLITE_DDL_RUNS)
            conn.execute(_SQLITE_DDL_METRICS.format(table=self.table))
            model_pk = None
            if self.model_name:
                # upsert-by-name (reference `database_writer.py:80-92` upserts
                # the Model entity before creating the Run)
                conn.execute(
                    "INSERT INTO models (name) VALUES (?) ON CONFLICT(name) DO NOTHING",
                    (self.model_name,),
                )
                model_pk = conn.execute(
                    "SELECT id FROM models WHERE name = ?", (self.model_name,)
                ).fetchone()[0]
            cur = conn.execute(
                "INSERT INTO runs (run_id, model_id, model_name, execution_timestamp)"
                " VALUES (?, ?, ?, ?)",
                (run_id, model_pk, self.model_name, _dt.datetime.now(_dt.timezone.utc).isoformat()),
            )
            run_pk = cur.lastrowid
            insert = (
                f"INSERT INTO {self.table} (run_id, chunk_key, chunk_index,"
                " start_timestamp, end_timestamp, timestamp, period, column_name,"
                " metric_name, value, sampling_error, lower_threshold,"
                " upper_threshold, alert) VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?,?)"
            )

            def to_row(r):
                d = {c: r[c] for c in cols}
                start, end = d.get("start_ts"), d.get("end_ts")
                mid = start + (end - start) / 2 if start is not None and end is not None else None
                return (
                    run_pk,
                    d.get("chunk_key"),
                    d.get("chunk_index"),
                    start.isoformat() if start else None,
                    end.isoformat() if end else None,
                    mid.isoformat() if mid else None,
                    d.get("period"),
                    d.get("column_name"),
                    d.get("method"),
                    d.get("value"),
                    d.get("sampling_error"),
                    d.get("lower_threshold"),
                    d.get("upper_threshold"),
                    None if d.get("alert") is None else int(d["alert"]),
                )

            for batch in _batched(sel.toLocalIterator(), self.batch_size):
                conn.executemany(insert, [to_row(r) for r in batch])
                rows_written += len(batch)
            conn.commit()
        finally:
            conn.close()
        return rows_written
