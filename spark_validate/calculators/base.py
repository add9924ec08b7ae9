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

from contextlib import contextmanager
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


def presample_chunks(
    assigned: DataFrame,
    headers: DataFrame,
    cap: int,
    hash_cols: Optional[list] = None,
    seed: int = 17,
) -> DataFrame:
    """Deterministic per-chunk hash-sample to ≤ ~``cap`` rows, applied BEFORE
    any chunk shuffle.

    The sampling contract for per-chunk-model operators (SURVEY §7.3):
    per-chunk model training at 10^12 scale is inherently sampled — a chunk
    must never reach a single Python worker unbounded. This filter is a pure
    NARROW operation (no shuffle, no window): per-chunk row counts come from
    the already-computed ``headers`` aggregate (≤ #chunks rows, collected
    driver-side — the same bounded device the reference uses for
    MAX_RESAMPLE_SIZE sampling), and each row survives iff
    ``hash(row) / 2^63 < cap / n_chunk``. Chunks at or under ``cap`` pass
    through untouched (no filter is even added when none exceed it, so
    small-scale goldens are bit-identical).

    Determinism: the hash is ``xxhash64`` over ``hash_cols`` (defaults to the
    chunker's row index when present — unique per row — else the full row
    struct) plus the chunk key and a fixed seed; the kept set is a pure
    function of the data, independent of partitioning or cluster size.
    The kept count is binomial around ``cap`` (±~1% at cap=10k).
    """
    from spark_validate.chunking import ROW_INDEX

    counts = headers.select(CHUNK_KEY, "n_rows").collect()
    frac = {r[CHUNK_KEY]: cap / r["n_rows"] for r in counts if r["n_rows"] > cap}
    if not frac:
        return assigned
    if hash_cols is None:
        hash_cols = [ROW_INDEX] if ROW_INDEX in assigned.columns else [
            c for c in assigned.columns if c != CHUNK_KEY
        ]
    frac_map = F.create_map(
        *[lit for k, v in sorted(frac.items()) for lit in (F.lit(k), F.lit(float(v)))]
    )
    u = (
        F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in hash_cols]), F.col(CHUNK_KEY), F.lit(seed)),
            F.lit(1_000_000_007),
        ).cast("double")
        / 1_000_000_007.0
    )
    return assigned.filter(F.coalesce(frac_map[F.col(CHUNK_KEY)], F.lit(1.0)) > u)


def strip_informational(out: DataFrame, alerting_method: str) -> DataFrame:
    """NULL the thresholds and force ``alert = False`` on every row whose
    method is not ``alerting_method``. Informational companion rows (a mean,
    a per-doc ratio, a 2^H rescale) must not carry a threshold they were
    never compared against — a stored row saying value=1.0,
    upper_threshold=0.0, alert=false contradicts itself for any downstream
    consumer. Shared by UrlBlocklistCheck / BoilerplateCheck /
    LMQualityCheck (VERDICT r5 #6)."""
    keep = F.col("method") == alerting_method
    return (
        out.withColumn("lower_threshold", F.when(keep, F.col("lower_threshold")))
        .withColumn("upper_threshold", F.when(keep, F.col("upper_threshold")))
        .withColumn("alert", F.when(keep, F.col("alert")).otherwise(F.lit(False)))
    )


@contextmanager
def chunker_n_hint(chunker, n):
    """Temporarily thread an already-computed TOTAL row count into a
    size/count-based chunker so its ``assign`` skips the count job (one
    driver round-trip per fit pass at bench scale, one scan at cluster
    scale). Scoped: the hint is removed on exit so a later ``calculate``
    over a DIFFERENT frame can never reuse a stale count."""
    if n is None:
        yield
        return
    chunker._n_hint = int(n)
    try:
        yield
    finally:
        try:
            del chunker._n_hint
        except AttributeError:
            pass
