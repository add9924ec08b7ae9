"""Cross-table reconciliation — do two tables agree on their aggregates?

The ETL-era workhorse every production validation engine carries
(dbt-utils ``equal_rowcount``/``fewer_rows_than``, Deequ's dataset-match
verification, GE's ``expect_table_row_count_to_equal_other_table``):
group BOTH tables by a shared key (a day, a partition, a tenant), compute
the same measures on each side (row count, sums, distinct keys), and flag
key groups where the sides disagree beyond tolerance. This is how a
10^12-row pipeline proves "the silver table still accounts for every
bronze row" without comparing rows one by one. NannyML has no analog (it
monitors model inputs, not pipeline conservation); the per-chunk
reporting convention follows the repo's UniquenessCheck shape.

Scale design: each side collapses to ONE aggregation by the key columns
(map-side partial combine does the heavy lifting; the shuffle carries one
row per key per side), then a single null-safe full-outer join of the two
ALREADY-AGGREGATED frames — both tiny relative to the inputs, usually
broadcast by AQE. The corpora themselves are never joined row-to-row.

Cross-engine determinism: sums are accumulated as ``DECIMAL(38,6)``
(order-independent addition — the z-score device), then derived to double,
so a DuckDB oracle hash-matches bit-for-bit at any parallelism.

Tolerance: a side pair matches when
``abs(expected − actual) <= abs_tol + rel_tol * greatest(|expected|,
|actual|)`` (the ``isclose`` convention); a key missing on either side
never matches.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.chunking import Chunker, DefaultChunker

_DEC = "decimal(38,6)"


def _measure_exprs(measures: Sequence[dict]):
    """[(name, agg_expr)] for one side. Supported aggs: ``count`` (rows),
    ``sum`` (decimal-exact over ``column``), ``distinct`` (exact distinct
    count of ``column``)."""
    out = []
    for m in measures:
        name = m.get("name") or (
            m["agg"] if m["agg"] == "count" else f"{m['agg']}_{m['column']}"
        )
        agg = m["agg"]
        if agg == "count":
            expr = F.count(F.lit(1)).cast("double")
        elif agg == "sum":
            expr = F.sum(F.col(m["column"]).cast(_DEC)).cast("double")
        elif agg == "distinct":
            expr = F.count_distinct(F.col(m["column"])).cast("double")
        else:
            raise ValueError(f"unknown reconciliation agg {agg!r}")
        out.append((name, expr.alias(name)))
    return out


def reconcile(
    expected: DataFrame,
    actual: DataFrame,
    keys: Sequence[str],
    measures: Sequence[dict],
    rel_tol: float = 0.0,
    abs_tol: float = 0.0,
) -> DataFrame:
    """Long per-(key, measure) comparison: (keys…, measure, expected,
    actual, diff, match). Keys present on only one side carry NULL on the
    other and ``match = false`` for every measure. NULL key values form
    their own group (null-safe join) — a NULL-keyed stratum silently
    diverging is exactly what this check must see."""
    keys = list(keys)
    ms = _measure_exprs(measures)
    e = expected.groupBy(*keys).agg(*[x for _, x in ms])
    a = actual.groupBy(*keys).agg(*[x for _, x in ms])
    ee = e.select(
        *[F.col(k).alias(f"_ek_{k}") for k in keys],
        *[F.col(n).alias(f"_e_{n}") for n, _ in ms],
    )
    aa = a.select(
        *[F.col(k).alias(f"_ak_{k}") for k in keys],
        *[F.col(n).alias(f"_a_{n}") for n, _ in ms],
    )
    cond = None
    for k in keys:
        c = F.col(f"_ek_{k}").eqNullSafe(F.col(f"_ak_{k}"))
        cond = c if cond is None else (cond & c)
    j = ee.join(aa, cond, "full_outer")
    rows = []
    for n, _ in ms:
        ev, av = F.col(f"_e_{n}"), F.col(f"_a_{n}")
        diff = av - ev
        close = F.abs(diff) <= (
            F.lit(float(abs_tol))
            + F.lit(float(rel_tol)) * F.greatest(F.abs(ev), F.abs(av))
        )
        rows.append(
            F.struct(
                F.lit(n).alias("measure"),
                ev.alias("expected"),
                av.alias("actual"),
                diff.alias("diff"),
                F.coalesce(close, F.lit(False)).alias("match"),
            )
        )
    return j.select(
        *[F.coalesce(F.col(f"_ek_{k}"), F.col(f"_ak_{k}")).alias(k) for k in keys],
        F.explode(F.array(*rows)).alias("m"),
    ).select(*keys, "m.measure", "m.expected", "m.actual", "m.diff", "m.match")


@dataclass
class ReconciliationCheck:
    """Runner check (kind ``reconciliation``): the fitted REFERENCE table is
    the expected side, the analysis table the actual side. ``calculate``
    reports the per-chunk rate of rows whose key group fails ANY measure
    (group-level verdicts attributed to chunks — the snapshot-diff
    convention); ``violations`` streams one row per (failed key × measure)
    with both values as the witness."""

    keys: Sequence[str]
    measures: Sequence[dict]
    rel_tol: float = 0.0
    abs_tol: float = 0.0
    chunker: Chunker = field(default_factory=DefaultChunker)
    upper_threshold: float = 0.0  # mismatched-row RATE above this alerts
    # dropped-stratum COUNT above this alerts — separate from the rate
    # threshold: a fractional rate tolerance (0.2 = "20% of rows may
    # mismatch") must not make one globally-missing key alert every chunk
    expected_only_threshold: float = 0.0
    _expected: Optional[DataFrame] = None

    def fit(self, reference: DataFrame) -> "ReconciliationCheck":
        self._expected = reference
        return self

    def compare(self, df: DataFrame) -> DataFrame:
        if self._expected is None:
            raise RuntimeError("fit first")
        return reconcile(
            self._expected, df, self.keys, self.measures, self.rel_tol, self.abs_tol
        )

    def _mismatched_keys(self, df: DataFrame) -> DataFrame:
        keys = list(self.keys)
        return (
            self.compare(df)
            .groupBy(*keys)
            .agg(F.min(F.col("match").cast("int")).alias("_ok"))
            .filter(F.col("_ok") == 0)
            .select(*keys, F.lit(1).alias("_recon_bad"))
        )

    def _expected_only_count(self, df: DataFrame) -> DataFrame:
        """ONE-row frame counting key groups present in the reference but
        absent from the analysis frame. Such keys have no analysis row to
        attribute to a chunk, so the rate metric alone can never see them;
        this dedicated count lets the rate path alert on dropped strata.
        Null-safe anti-join (a NULL-keyed stratum counts like any other)."""
        keys = list(self.keys)
        e_keys = self._expected.select(*keys).dropDuplicates(keys).select(
            *[F.col(k).alias(f"_ek_{k}") for k in keys]
        )
        a_keys = df.select(*keys).dropDuplicates(keys).select(
            *[F.col(k).alias(f"_ak_{k}") for k in keys]
        )
        cond = None
        for k in keys:
            c = F.col(f"_ek_{k}").eqNullSafe(F.col(f"_ak_{k}"))
            cond = c if cond is None else (cond & c)
        return (
            e_keys.join(a_keys, cond, "left_anti")
            .agg(F.count(F.lit(1)).cast("double").alias("__exp_only"))
        )

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        from spark_validate.calculators.base import assign_chunks
        from spark_validate.chunking import CHUNK_KEY

        keys = list(self.keys)
        assigned, headers = assign_chunks(df, self.chunker)
        # Null-safe join-back: reconcile() preserves NULL-keyed groups, so
        # the attribution join must too — a plain equality join would leave
        # every NULL-keyed analysis row unmarked forever.
        bad = self._mismatched_keys(df).select(
            *[F.col(k).alias(f"_bk_{k}") for k in keys], "_recon_bad"
        )
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"_bk_{k}"))
            cond = c if cond is None else (cond & c)
        marked = assigned.join(bad, cond, "left")
        wide0 = marked.groupBy(CHUNK_KEY).agg(
            F.count(F.lit(1)).alias("__rows"),
            F.sum(F.coalesce(F.col("_recon_bad"), F.lit(0))).alias("__bad"),
        )
        # Expected-only keys never appear in any chunk; repeat the dataset-
        # level count on every chunk row (broadcast 1-row cross join, lazy)
        # so upper_threshold=0 alerts when a stratum is dropped entirely.
        exp = F.broadcast(self._expected_only_count(df))
        wide = wide0.crossJoin(exp)
        # ADVICE r5: an EMPTY analysis frame yields zero chunk rows, so the
        # most severe drop case (every expected key missing) would emit no
        # result and no alert. Emit one synthetic chunk carrying the
        # expected-only count when the chunked aggregate is empty.
        synth = (
            wide0.agg(F.count(F.lit(1)).alias("_nch"))
            .filter(F.col("_nch") == 0)
            .crossJoin(exp)
            .filter(F.col("__exp_only") > 0)
            .select(
                F.lit("[empty]").alias(CHUNK_KEY),
                F.lit(0).cast("long").alias("__rows"),
                F.lit(0).cast("long").alias("__bad"),
                F.col("__exp_only"),
            )
        )
        wide = wide.unionByName(synth)
        col_name = "+".join(keys)
        # per-method upper bounds: the rate row compares against
        # upper_threshold, the count row against expected_only_threshold
        long_df = wide.select(
            CHUNK_KEY,
            F.explode(
                F.array(
                    F.struct(
                        F.lit("reconciliation_mismatch_rate").alias("method"),
                        # when(>0): the synthetic empty-analysis chunk has 0
                        # rows — NULL rate, not an ANSI division error
                        F.when(F.col("__rows") > 0, F.col("__bad") / F.col("__rows"))
                        .cast("double")
                        .alias("value"),
                        F.lit(float(self.upper_threshold)).alias("upper"),
                    ),
                    F.struct(
                        F.lit("reconciliation_expected_only_keys").alias("method"),
                        F.col("__exp_only").alias("value"),
                        F.lit(float(self.expected_only_threshold)).alias("upper"),
                    ),
                )
            ).alias("kv"),
        ).select(
            CHUNK_KEY,
            F.lit(col_name).alias("column_name"),
            F.col("kv.method").alias("method"),
            F.col("kv.value").alias("value"),
            F.lit(None).cast("double").alias("lower_threshold"),
            F.col("kv.upper").cast("double").alias("upper_threshold"),
        )
        from spark_validate.calculators.base import join_headers_long
        from spark_validate.result import conform_result
        from spark_validate.thresholds import alert_expr

        out = long_df.withColumn("alert", alert_expr())
        return conform_result(join_headers_long(out, headers, period))

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        from spark_validate.chunking import CHUNK_KEY

        keys = list(self.keys)
        failed = self.compare(df).filter(~F.col("match"))
        return failed.select(
            F.lit("reconciliation").alias("check"),
            F.col("measure").alias("column_name"),
            F.lit(None).cast("string").alias(CHUNK_KEY),
            F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias("row_id"),
            F.lit("reconciliation_mismatch").alias("violation_kind"),
            F.concat_ws(
                " <> ",
                F.col("expected").cast("string"),
                F.col("actual").cast("string"),
            ).alias("observed_value"),
        )
