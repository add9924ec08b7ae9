"""Snapshot diff — validate one corpus/table version against another.

The ingest-side sibling of the referential check: given OLD and NEW
snapshots of a keyed table (two Iceberg snapshots, two nightly drops), emit
the rows that were ``added`` / ``removed`` / ``changed`` and a one-row-per-
status summary. This is how a 10^12-row pipeline answers "what did last
night's load actually do" without diffing files by hand — NannyML has no
analog (it monitors model inputs, not table versions); the semantics follow
engine-agnostic snapshot-diff practice (Iceberg changelog scans, Delta CDF).

Scale shape: ONE full-outer shuffle join on the key columns — the minimum
possible for a diff; co-located (bucketed) tables skip the exchange
entirely. Change detection is a null-safe column comparison (codegen
``<=>``), not a serialized-row hash, so the DuckDB oracle replicates it
bit-for-bit and heterogeneous columns need no encoding convention. Only
diff rows leave the join (the unchanged bulk is counted in the summary
aggregate, never materialized).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """(key..., status) for every key that differs between snapshots.

    ``status``: ``added`` (key only in NEW), ``removed`` (only in OLD),
    ``changed`` (in both, any ``compare_cols`` value differs null-safely).
    ``compare_cols`` defaults to every shared non-key column.
    """
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    o = old.select(*keys, *[F.col(c).alias(f"_o_{c}") for c in compare_cols], F.lit(1).alias("_in_o"))
    n = new.select(*keys, *[F.col(c).alias(f"_n_{c}") for c in compare_cols], F.lit(1).alias("_in_n"))
    j = o.join(n, keys, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(F.col("_in_o").isNull(), F.lit("added"))
        .when(F.col("_in_n").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status")
    )


class SnapshotDiffCheck:
    """Runner check (kind ``snapshot``): treat the suite's REFERENCE table as
    the old snapshot and the ANALYSIS table as the new one; report per-chunk
    ``added_rate`` / ``changed_rate`` (fraction of the chunk's rows that are
    new keys / changed rows vs the reference) and stream the full diff —
    including ``removed`` keys, which by definition have no analysis chunk —
    as violation rows. One full-outer key join total; the per-chunk
    attribution is a broadcast-friendly id join against only the diff rows.
    """

    def __init__(
        self,
        key_columns: Sequence[str],
        compare_columns: Optional[Sequence[str]] = None,
        chunker=None,
        upper_threshold: Optional[float] = None,
    ):
        from spark_validate.chunking import DefaultChunker

        self.key_columns = list(key_columns)
        self.compare_columns = list(compare_columns) if compare_columns else None
        self.chunker = chunker or DefaultChunker()
        self.upper_threshold = upper_threshold
        self._old: Optional[DataFrame] = None

    def fit(self, reference: DataFrame) -> "SnapshotDiffCheck":
        self._old = reference
        return self

    def _diff(self, df: DataFrame) -> DataFrame:
        if self._old is None:
            raise RuntimeError("fit first")
        return snapshot_diff(self._old, df, self.key_columns, self.compare_columns)

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        from spark_validate.calculators.base import assign_chunks
        from spark_validate.checks.constraints import _attach_const_threshold
        from spark_validate.chunking import CHUNK_KEY

        assigned, headers = assign_chunks(df, self.chunker)
        d = self._diff(df).withColumnRenamed("status", "_sv_status")
        marked = assigned.join(d, self.key_columns, "left")
        wide = marked.groupBy(CHUNK_KEY).agg(
            F.count(F.lit(1)).alias("__rows"),
            F.count(F.when(F.col("_sv_status") == "added", 1)).alias("__added"),
            F.count(F.when(F.col("_sv_status") == "changed", 1)).alias("__changed"),
        )
        key_name = "+".join(self.key_columns)
        long_df = wide.select(
            CHUNK_KEY,
            F.lit(key_name).alias("column_name"),
            F.explode(F.array(
                F.struct(
                    F.lit("added_rate").alias("method"),
                    (F.col("__added") / F.col("__rows")).cast("double").alias("value"),
                ),
                F.struct(
                    F.lit("changed_rate").alias("method"),
                    (F.col("__changed") / F.col("__rows")).cast("double").alias("value"),
                ),
            )).alias("kv"),
        ).select(CHUNK_KEY, "column_name", "kv.method", "kv.value")
        return _attach_const_threshold(long_df, headers, period, None, self.upper_threshold)

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        """The full diff as violation rows. ``removed`` keys have no analysis
        chunk — their chunk_key is NULL by construction."""
        from spark_validate.chunking import CHUNK_KEY

        assigned = self.chunker.assign(df).select(
            *[F.col(c).alias(f"_a_{c}") for c in self.key_columns], F.col(CHUNK_KEY)
        )
        d = self._diff(df)
        cond = None
        for c in self.key_columns:
            eq = d[c] == F.col(f"_a_{c}")
            cond = eq if cond is None else (cond & eq)
        joined = d.join(assigned, cond, "left")
        key_str = F.concat_ws("|", *[d[c].cast("string") for c in self.key_columns])
        return joined.select(
            F.lit("snapshot").alias("check"),
            F.lit("+".join(self.key_columns)).alias("column_name"),
            F.col(CHUNK_KEY),
            key_str.alias("row_id"),
            F.col("status").alias("violation_kind"),
            F.lit(None).cast("string").alias("observed_value"),
        )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """One row per status — added / removed / changed / unchanged counts.

    Same single full-outer join; the unchanged bulk is aggregated away
    map-side, never emitted row-by-row."""
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    o = old.select(*keys, *[F.col(c).alias(f"_o_{c}") for c in compare_cols], F.lit(1).alias("_in_o"))
    n = new.select(*keys, *[F.col(c).alias(f"_n_{c}") for c in compare_cols], F.lit(1).alias("_in_n"))
    j = o.join(n, keys, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(F.col("_in_o").isNull(), F.lit("added"))
        .when(F.col("_in_n").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
