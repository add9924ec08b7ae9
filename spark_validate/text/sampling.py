"""Deterministic corpus sampling — hash-threshold and stratified variants.

Beyond-reference operator for training-data pipelines: corpus construction
needs reproducible downsampling (rebuild the same corpus from the same
inputs), per-source/per-language quota mixing, and decisions that are a
pure function of the ROW (so a re-run, a recompute after executor loss, or
a different partitioning all agree — ``df.sample()`` gives none of that).

Mechanism: ``keep = substr(md5(salt || ':' || key), 1, 8) < hex(rate·2^32)``.
The md5-hex prefix is uniform over [0, 2^32) and its LOWERCASE-HEX string
order equals its numeric order, so one string comparison implements the
threshold — bit-identically replicable in any engine with md5 (the DuckDB
oracle runs the same expression verbatim).

Scale: a narrow map-side filter — no shuffle, no RNG state, no driver
coordination; stratified rates compile to one bounded CASE chain (#strata
literals). At 100 TB this composes with scan pruning: the filter sits
directly above the parquet reader.

NULL sampling keys hash to NULL and are dropped (documented; pass a
coalesced key column if nulls must be retained).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BUCKET_COL = "sample_bucket"


def rate_to_hex(rate: float) -> str:
    """8-hex-char threshold for a keep probability in [0, 1]."""
    r = float(rate)
    if r <= 0.0:
        return "00000000"
    if r >= 1.0:
        return "g"  # sorts after every hex digit → keeps all rows
    return format(int(r * (1 << 32)), "08x")


def hash_bucket(key: Column, salt: str = "s42") -> Column:
    """Uniform 8-hex-char bucket, a pure function of (salt, key)."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, 8
    )


def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "s42",
    keep_bucket: bool = False,
) -> DataFrame:
    """Keep each row iff its hash bucket falls below ``rate`` — reproducible
    Bernoulli(rate) sampling keyed on ``key_col``. Changing ``salt`` draws an
    independent sample; keeping it fixed makes every re-run identical."""
    b = hash_bucket(F.col(key_col), salt)
    out = df.withColumn(_HASH_BUCKET_COL, b).filter(
        F.col(_HASH_BUCKET_COL) < F.lit(rate_to_hex(rate))
    )
    return out if keep_bucket else out.drop(_HASH_BUCKET_COL)


def with_split(
    df: DataFrame,
    weights: Mapping[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split42",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test assignment.

    Every row gets exactly one split label, a pure function of
    ``(salt, key)``: the same md5 bucket as :func:`deterministic_sample`
    compared against CUMULATIVE hex thresholds — ``bucket < cum_1`` →
    first split, ``< cum_2`` → second, …, with the LAST split taking the
    ``otherwise`` branch so integer truncation in the thresholds can never
    drop a row. Splits are therefore disjoint and exhaustive by
    construction, stable under repartitioning/recompute, and adding data
    later never reshuffles existing rows between splits (the property
    ``randomSplit`` lacks).

    ``weights`` must sum to 1 (±1e-9). Rows whose key is NULL get a NULL
    split (surfaced, not silently folded into the last split).
    One narrow projection — no shuffle, no RNG state.
    """
    weights = dict(weights or {"train": 0.8, "val": 0.1, "test": 0.1})
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    bad = {k: w for k, w in weights.items() if not float(w) > 0}
    if bad:  # a non-positive weight makes thresholds non-monotone: some
        # split would silently never receive rows
        raise ValueError(f"split weights must be positive, got {bad}")
    total = sum(float(w) for w in weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    names = list(weights)
    b = hash_bucket(F.col(key_col), salt)
    cum = 0.0
    expr = F.when(b.isNull(), F.lit(None).cast("string"))
    for name in names[:-1]:
        cum += float(weights[name])
        expr = expr.when(b < F.lit(rate_to_hex(cum)), F.lit(name))
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def solve_mixture_rates(
    counts: Mapping[str, int],
    targets: Mapping[str, float],
    fraction: float = 1.0,
) -> dict[str, float]:
    """Per-stratum keep rates that realize a TARGET mixture.

    Training-data mixing: given observed per-group row counts and target
    proportions (e.g. ``{"en": 0.5, "de": 0.3, "fr": 0.2}``), find the
    largest corpus whose expected composition matches the targets exactly
    without oversampling any group: scale ``M = min_g(n_g / t_g)`` (the
    binding group is kept whole), then ``rate_g = t_g * M / n_g``.
    ``fraction`` shrinks the output corpus below that maximum (0 < f ≤ 1).

    Groups absent from ``targets`` get no rate (the sampler drops them via
    ``default_rate=0``). A target group with zero observed rows makes the
    mixture unsatisfiable → ValueError, not a silent empty sample.

    Pure integer/double arithmetic in a fixed operation order
    (``t * M / n``), so an external replica (the DuckDB oracle) computing
    the same expressions gets bit-identical rates and hence bit-identical
    hex thresholds.
    """
    if not 0.0 < float(fraction) <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    bad = {k: t for k, t in targets.items() if not float(t) > 0}
    if bad:
        raise ValueError(f"target weights must be positive, got {bad}")
    missing = [g for g in targets if int(counts.get(g, 0)) <= 0]
    if missing:
        raise ValueError(f"target groups with no observed rows: {missing}")
    scale = min(int(counts[g]) / float(t) for g, t in targets.items())
    scale = scale * float(fraction)
    return {
        g: min(1.0, float(t) * scale / int(counts[g])) for g, t in targets.items()
    }


def mixture_sample(
    df: DataFrame,
    targets: Mapping[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    fraction: float = 1.0,
    salt: str = "mix42",
    keep_bucket: bool = False,
) -> DataFrame:
    """Deterministic sample whose expected group mixture equals ``targets``.

    Two steps, both scale-safe: ONE map-side-combined ``groupBy(stratum)``
    count whose result is bounded by the number of target groups (collected
    to the driver — #groups literals, never rows), then the same narrow
    hash-threshold filter as :func:`stratified_sample` with the solved
    rates. No RNG state; re-runs and recomputes agree row-for-row.
    """
    observed = {
        r[0]: r[1]
        for r in df.filter(F.col(stratum_col).isin(list(targets)))
        .groupBy(stratum_col)
        .count()
        .collect()
    }
    rates = solve_mixture_rates(observed, targets, fraction)
    return stratified_sample(
        df, rates, stratum_col, key_col=key_col,
        default_rate=0.0, salt=salt, keep_bucket=keep_bucket,
    )


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "s42",
    keep_bucket: bool = False,
) -> DataFrame:
    """Per-stratum keep rates (e.g. language/source quota mixing): one CASE
    chain of hex thresholds, then the same single narrow filter."""
    items = sorted(rates.items())
    thr: Column
    if not items:
        thr = F.lit(rate_to_hex(default_rate))
    else:
        cases = F.when(
            F.col(stratum_col) == F.lit(items[0][0]), F.lit(rate_to_hex(items[0][1]))
        )
        for value, r in items[1:]:
            cases = cases.when(F.col(stratum_col) == F.lit(value), F.lit(rate_to_hex(r)))
        thr = cases.otherwise(F.lit(rate_to_hex(default_rate)))
    b = hash_bucket(F.col(key_col), salt)
    out = df.withColumn(_HASH_BUCKET_COL, b).filter(F.col(_HASH_BUCKET_COL) < thr)
    return out if keep_bucket else out.drop(_HASH_BUCKET_COL)
