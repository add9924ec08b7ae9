"""Shared per-chunk contamination-rate machinery.

The three benchmark-leakage checks — text n-gram (`text/decontaminate.py::
DecontaminationCheck`), image phash (`image/phash.py::
PhashDecontaminationCheck`) and embedding cosine (`sim/ann.py::
EmbeddingLeakageCheck`) — differ only in HOW a row matches the benchmark;
the per-chunk rate (matched rows / rows, one count per chunk, constant
upper threshold) is identical. This helper is that shared body, so a fix to
the rate semantics lands once. Violations stay per-check (their observed
values are genuinely different: overlap stats vs hamming vs cosine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contamination_rate(
    df: DataFrame,
    chunker,
    bad_ids: DataFrame,
    id_col: str,
    column_name: str,
    method: str,
    upper_threshold: float,
    period: str = "analysis",
) -> DataFrame:
    """Per-chunk rate of rows whose id appears in ``bad_ids`` (a one-column
    ``_id`` frame of DISTINCT matched ids — a row near several benchmark
    rows counts once). Left join + count keeps every chunk's denominator
    exact; the long-form result carries a constant upper threshold (default
    contract: any leakage alerts)."""
    from spark_validate.calculators.base import assign_chunks
    from spark_validate.checks.constraints import _attach_const_threshold
    from spark_validate.chunking import CHUNK_KEY

    assigned, headers = assign_chunks(df, chunker)
    per_chunk = (
        assigned.join(bad_ids, assigned[id_col] == bad_ids["_id"], "left")
        .groupBy(CHUNK_KEY)
        .agg(
            F.count(F.lit(1)).alias("__rows"),
            F.count("_id").cast("double").alias("__bad"),
        )
        .select(
            CHUNK_KEY,
            F.lit(column_name).alias("column_name"),
            F.lit(method).alias("method"),
            (F.col("__bad") / F.col("__rows")).cast("double").alias("value"),
        )
    )
    return _attach_const_threshold(per_chunk, headers, period, None, upper_threshold)
