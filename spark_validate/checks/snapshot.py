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
