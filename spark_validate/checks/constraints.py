"""Constraint checks: range, unseen values, domain, uniqueness, referential.

Range/unseen follow the reference data-quality calculators
(`nannyml/data_quality/range/calculator.py:25-249`,
`nannyml/data_quality/unseen/calculator.py:29-268`): default thresholds are
``ConstantThreshold(upper=0)`` — ANY violation alerts.

Uniqueness and referential integrity have no reference analog (NannyML never
checks either); they are the north-rule web-scale extensions:

* uniqueness — two-phase hash aggregate. ``groupBy(key)`` benefits from
  map-side partial aggregation automatically; for hot-key floods AQE skew
  handling applies, and the optional ``sample_salt`` pre-aggregation splits
  pathological single-key floods.
* referential — LEFT ANTI join against the reference manifest; Spark/AQE
  picks broadcast vs sort-merge by manifest size (``broadcast()`` hint when
  the caller knows it is small).

Every check exposes ``violations(df)`` — the exploded violation-row table
(north rule) — alongside the chunked long-form result.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks, join_headers_long, nan_to_null
from spark_validate.chunking import CHUNK_KEY, Chunker, DefaultChunker
from spark_validate.result import conform_result
from spark_validate.thresholds import ConstantThreshold, alert_expr


def _attach_const_threshold(long_df: DataFrame, headers, period, lower, upper) -> DataFrame:
    out = (
        long_df.withColumn("lower_threshold", F.lit(lower).cast("double"))
        .withColumn("upper_threshold", F.lit(upper).cast("double"))
        .withColumn("alert", alert_expr())
    )
    if headers is None:  # fused path: header columns already ride in long_df
        return conform_result(out.withColumn("period", F.lit(period)))
    return conform_result(join_headers_long(out, headers, period))


_FUSE_HDR_COLS = ("chunk_index", "start_index", "end_index", "start_ts", "end_ts")


@dataclass
class NumericalRangeCalculator:
    """Out-of-range count/rate per (chunk, column) vs reference [min, max]
    (`nannyml/data_quality/range/calculator.py`, fit :142-143, stats :117-123;
    default ConstantThreshold(upper=0) :37)."""

    column_names: Sequence[str]
    normalize: bool = True
    chunker: Chunker = field(default_factory=DefaultChunker)
    threshold: ConstantThreshold = field(default_factory=lambda: ConstantThreshold(lower=None, upper=0))
    _ranges: Optional[Dict[str, tuple]] = None

    def fit(self, reference: DataFrame) -> "NumericalRangeCalculator":
        dtypes = dict(reference.dtypes)
        aggs = []
        for c in self.column_names:
            v = nan_to_null(F.col(c), dtypes[c])
            aggs += [F.min(v).alias(f"{c}__lo"), F.max(v).alias(f"{c}__hi")]
        row = reference.agg(*aggs).first().asDict()
        self._ranges = {c: (row[f"{c}__lo"], row[f"{c}__hi"]) for c in self.column_names}
        return self

    def _oor(self, c: str, dtypes) -> F.Column:
        lo, hi = self._ranges[c]
        v = nan_to_null(F.col(c), dtypes[c])
        return (v.isNotNull() & ((v < F.lit(lo)) | (v > F.lit(hi)))).cast("int")

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        if self._ranges is None:
            raise RuntimeError("fit first")
        dtypes = dict(df.dtypes)
        assigned, headers = assign_chunks(df, self.chunker)
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in self.column_names:
            aggs.append(F.sum(self._oor(c, dtypes)).cast("double").alias(f"{c}__oor"))
        wide = assigned.groupBy(CHUNK_KEY).agg(*aggs)
        method = "out_of_range_rate" if self.normalize else "out_of_range_count"
        pairs = [
            F.struct(
                F.lit(c).alias("column_name"),
                F.lit(method).alias("method"),
                (
                    (F.col(f"{c}__oor") / F.col("__rows")) if self.normalize else F.col(f"{c}__oor")
                ).cast("double").alias("value"),
            )
            for c in self.column_names
        ]
        long_df = wide.select(CHUNK_KEY, F.explode(F.array(*pairs)).alias("kv")).select(
            CHUNK_KEY, "kv.column_name", "kv.method", "kv.value"
        )
        return _attach_const_threshold(long_df, headers, period, self.threshold.lower, self.threshold.upper)

    def fuse_contrib(self, dtypes, prefix: str):
        """Suite-fusion hook (see ColumnStatsCalculator.fuse_contrib)."""
        if self._ranges is None:
            raise RuntimeError("fit first")
        exprs = [F.count(F.lit(1)).alias(f"{prefix}__rows")]
        for c in self.column_names:
            exprs.append(F.sum(self._oor(c, dtypes)).cast("double").alias(f"{prefix}{c}__oor"))
        method = "out_of_range_rate" if self.normalize else "out_of_range_count"

        def fin(wide: DataFrame, period: str) -> DataFrame:
            pairs = [
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.lit(method).alias("method"),
                    (
                        (F.col(f"{prefix}{c}__oor") / F.col(f"{prefix}__rows"))
                        if self.normalize else F.col(f"{prefix}{c}__oor")
                    ).cast("double").alias("value"),
                )
                for c in self.column_names
            ]
            long_df = wide.select(
                CHUNK_KEY, *_FUSE_HDR_COLS, F.explode(F.array(*pairs)).alias("kv")
            ).select(CHUNK_KEY, *_FUSE_HDR_COLS, "kv.column_name", "kv.method", "kv.value")
            return _attach_const_threshold(long_df, None, period, self.threshold.lower, self.threshold.upper)

        return exprs, fin

    def get_state(self) -> dict:
        if self._ranges is None:
            raise RuntimeError("fit first")
        return {"ranges": {c: [lo, hi] for c, (lo, hi) in self._ranges.items()}}

    def set_state(self, state: dict) -> "NumericalRangeCalculator":
        self._ranges = {c: (v[0], v[1]) for c, v in state["ranges"].items()}
        return self

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        """Exploded violation rows (north rule) — a pure filter per column."""
        if self._ranges is None:
            raise RuntimeError("fit first")
        dtypes = dict(df.dtypes)
        assigned = self.chunker.assign(df)
        parts = []
        for c in self.column_names:
            lo, hi = self._ranges[c]
            v = nan_to_null(F.col(c), dtypes[c])
            parts.append(
                assigned.filter(v.isNotNull() & ((v < F.lit(lo)) | (v > F.lit(hi)))).select(
                    F.lit("numerical_range").alias("check"),
                    F.lit(c).alias("column_name"),
                    F.col(CHUNK_KEY),
                    (F.col(row_id).cast("string") if row_id else F.lit(None).cast("string")).alias("row_id"),
                    F.lit("out_of_range").alias("violation_kind"),
                    F.col(c).cast("string").alias("observed_value"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


@dataclass
class UnseenValuesCalculator:
    """Count/rate of categorical values absent from the reference seen-set
    (`nannyml/data_quality/unseen/calculator.py`, seen set :158-159, stats
    :126-131; default ConstantThreshold(upper=0) :45).

    Scale path: ``max_seen`` caps the broadcast seen-set; above it the check
    switches to a distinct-values LEFT ANTI join (no driver collection).
    With ``manifest_dir`` set (the runner points it under the store), the
    anti-join seen-set persists as a parquet manifest instead of refusing
    JSON serialization — load-or-fit works at any cardinality.
    """

    column_names: Sequence[str]
    normalize: bool = True
    chunker: Chunker = field(default_factory=DefaultChunker)
    threshold: ConstantThreshold = field(default_factory=lambda: ConstantThreshold(lower=None, upper=0))
    max_seen: int = 100_000
    manifest_dir: Optional[str] = None
    _seen: Optional[Dict[str, object]] = None  # col → list (small) or DataFrame (large)
    _manifest_sources: Optional[Dict[str, str]] = None  # col → restored-from path

    def fit(self, reference: DataFrame) -> "UnseenValuesCalculator":
        self._seen = {}
        self._manifest_sources = None  # a refit owns its manifest writes again
        # one pass: approx distinct per column to choose strategy
        approx = reference.agg(
            *[F.approx_count_distinct(c).alias(c) for c in self.column_names]
        ).first()
        for c in self.column_names:
            if approx[c] <= self.max_seen:
                vals = [
                    r[0]
                    for r in reference.select(F.col(c).cast("string")).filter(F.col(c).isNotNull()).distinct().collect()
                ]
                self._seen[c] = vals
            else:
                self._seen[c] = reference.select(F.col(c).cast("string").alias("value")).filter(
                    F.col("value").isNotNull()
                ).distinct()
        return self

    def get_state(self) -> dict:
        if self._seen is None:
            raise RuntimeError("fit first")
        out = {}
        for c, v in self._seen.items():
            if isinstance(v, list):
                out[c] = v
                continue
            if self.manifest_dir is None:
                from spark_validate.io.store import StateNotSerializable

                raise StateNotSerializable(
                    f"column {c!r} uses the high-cardinality anti-join path; its seen-set "
                    "lives in a DataFrame and is not JSON-serializable — set manifest_dir "
                    "to persist it as a parquet manifest"
                )
            # Parquet manifest: the distinct-values frame lands under
            # manifest_dir/<col>; the JSON state carries only the pointer.
            # Written once at fit-save time, read lazily on restore — the
            # seen-set never transits the driver at any cardinality.
            import os

            src = (self._manifest_sources or {}).get(c)
            if src is not None:
                # restored FROM a manifest: re-emit the pointer — writing
                # mode('overwrite') to the very path the lazy frame reads
                # from would corrupt it mid-plan
                out[c] = {"__manifest__": src}
                continue
            path = os.path.join(self.manifest_dir, c)
            v.write.mode("overwrite").parquet(path)
            out[c] = {"__manifest__": path}
        return {"seen": out}

    def set_state(self, state: dict) -> "UnseenValuesCalculator":
        from pyspark.sql import SparkSession

        seen: Dict[str, object] = {}
        sources: Dict[str, str] = {}
        for c, v in dict(state["seen"]).items():
            if isinstance(v, dict) and "__manifest__" in v:
                spark = SparkSession.getActiveSession()
                if spark is None:
                    raise RuntimeError("no active SparkSession to read seen-set manifest")
                try:
                    seen[c] = spark.read.parquet(v["__manifest__"])
                except Exception as exc:
                    # a pointer whose parquet vanished is stale state — the
                    # runner's stale handler (ValueError) refits + resaves
                    raise ValueError(
                        f"seen-set manifest unreadable at {v['__manifest__']!r}: {exc}"
                    ) from exc
                sources[c] = v["__manifest__"]
            else:
                seen[c] = v
        self._seen = seen
        self._manifest_sources = sources
        return self

    def _unseen_flag(self, c: str) -> F.Column:
        v = F.col(c).cast("string")
        seen = self._seen[c]
        if isinstance(seen, list):
            return (v.isNotNull() & ~v.isin(seen)).cast("int")
        raise RuntimeError("large-cardinality column requires join path (calculate handles it)")

    @property
    def fusable(self) -> bool:
        """Fusable only when every seen-set is a broadcastable list — the
        high-cardinality anti-join path needs its own join, not an agg expr."""
        return self._seen is not None and all(isinstance(s, list) for s in self._seen.values())

    def fuse_contrib(self, dtypes, prefix: str):
        """Suite-fusion hook (see ColumnStatsCalculator.fuse_contrib)."""
        if self._seen is None:
            raise RuntimeError("fit first")
        if not self.fusable:
            raise RuntimeError("high-cardinality seen-set: not fusable (anti-join path)")
        method = "unseen_values_rate" if self.normalize else "unseen_values_count"
        exprs = [F.count(F.lit(1)).alias(f"{prefix}__rows")]
        for c in self.column_names:
            exprs.append(F.sum(self._unseen_flag(c)).cast("double").alias(f"{prefix}{c}__unseen"))

        def fin(wide: DataFrame, period: str) -> DataFrame:
            pairs = [
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.lit(method).alias("method"),
                    (
                        (F.col(f"{prefix}{c}__unseen") / F.col(f"{prefix}__rows"))
                        if self.normalize else F.col(f"{prefix}{c}__unseen")
                    ).cast("double").alias("value"),
                )
                for c in self.column_names
            ]
            long_df = wide.select(
                CHUNK_KEY, *_FUSE_HDR_COLS, F.explode(F.array(*pairs)).alias("kv")
            ).select(CHUNK_KEY, *_FUSE_HDR_COLS, "kv.column_name", "kv.method", "kv.value")
            return _attach_const_threshold(long_df, None, period, self.threshold.lower, self.threshold.upper)

        return exprs, fin

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        if self._seen is None:
            raise RuntimeError("fit first")
        assigned, headers = assign_chunks(df, self.chunker)
        method = "unseen_values_rate" if self.normalize else "unseen_values_count"
        small_cols = [c for c in self.column_names if isinstance(self._seen[c], list)]
        big_cols = [c for c in self.column_names if c not in small_cols]
        parts = []
        if small_cols:
            aggs = [F.count(F.lit(1)).alias("__rows")]
            for c in small_cols:
                aggs.append(F.sum(self._unseen_flag(c)).cast("double").alias(f"{c}__unseen"))
            wide = assigned.groupBy(CHUNK_KEY).agg(*aggs)
            pairs = [
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.lit(method).alias("method"),
                    (
                        (F.col(f"{c}__unseen") / F.col("__rows")) if self.normalize else F.col(f"{c}__unseen")
                    ).cast("double").alias("value"),
                )
                for c in small_cols
            ]
            parts.append(
                wide.select(CHUNK_KEY, F.explode(F.array(*pairs)).alias("kv")).select(
                    CHUNK_KEY, "kv.column_name", "kv.method", "kv.value"
                )
            )
        for c in big_cols:
            seen_df = self._seen[c]
            tot = assigned.groupBy(CHUNK_KEY).agg(F.count(F.lit(1)).alias("__rows"))
            unseen = (
                assigned.select(CHUNK_KEY, F.col(c).cast("string").alias("value"))
                .filter(F.col("value").isNotNull())
                .join(seen_df, "value", "left_anti")
                .groupBy(CHUNK_KEY)
                .agg(F.count(F.lit(1)).alias("__unseen"))
            )
            joined = tot.join(unseen, CHUNK_KEY, "left").withColumn(
                "__unseen", F.coalesce(F.col("__unseen"), F.lit(0))
            )
            val = (F.col("__unseen") / F.col("__rows")) if self.normalize else F.col("__unseen")
            parts.append(
                joined.select(
                    CHUNK_KEY,
                    F.lit(c).alias("column_name"),
                    F.lit(method).alias("method"),
                    val.cast("double").alias("value"),
                )
            )
        long_df = parts[0]
        for p in parts[1:]:
            long_df = long_df.unionByName(p)
        return _attach_const_threshold(long_df, headers, period, self.threshold.lower, self.threshold.upper)

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        assigned = self.chunker.assign(df)
        parts = []
        for c in self.column_names:
            seen = self._seen[c]
            v = F.col(c).cast("string")
            base = assigned.filter(v.isNotNull())
            if isinstance(seen, list):
                bad = base.filter(~v.isin(seen))
            else:
                bad = base.join(seen.withColumnRenamed("value", c + "__seen"), v == F.col(c + "__seen"), "left_anti")
            parts.append(
                bad.select(
                    F.lit("unseen_values").alias("check"),
                    F.lit(c).alias("column_name"),
                    F.col(CHUNK_KEY),
                    (F.col(row_id).cast("string") if row_id else F.lit(None).cast("string")).alias("row_id"),
                    F.lit("unseen_value").alias("violation_kind"),
                    v.alias("observed_value"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


def DomainCheck(column_names: Sequence[str], domain: Sequence[str], normalize: bool = True, chunker=None):
    """Constant-domain check (e.g. ``fmt ∈ {jpeg, png, webp}``) — a degenerate
    unseen-values check with a fixed seen-set (north rule's format check;
    closest reference analog `nannyml/data_quality/unseen/calculator.py:126-131`)."""
    calc = UnseenValuesCalculator(
        column_names=column_names, normalize=normalize, chunker=chunker or DefaultChunker()
    )
    calc._seen = {c: [str(v) for v in domain] for c in column_names}
    return calc


@dataclass
class UniquenessCheck:
    """Duplicate-key detection at scale (north rule; no reference analog).

    Two-phase: ``groupBy(key).count() → filter(count > 1)``. Map-side partial
    aggregation makes the shuffle carry only distinct keys per task;
    ``n_buckets`` optionally pre-shards very hot composite keys by hashing the
    key into a salt column first (useful when a single key floods — the
    pathological duplicate case uniqueness checks exist to catch).
    """

    key_columns: Sequence[str]
    chunker: Optional[Chunker] = None
    salt_buckets: int = 0  # 0 → plain two-phase agg (AQE handles mild skew)

    def duplicates(self, df: DataFrame) -> DataFrame:
        """(key..., dup_count) for every key appearing more than once."""
        keys = [F.col(c) for c in self.key_columns]
        if self.salt_buckets > 1:
            # phase 1: (hash(key) % S, key) partial counts — shards a flooded
            # key across S reducers; phase 2: re-aggregate by key alone
            salted = df.withColumn("_salt", F.pmod(F.hash(*keys), F.lit(self.salt_buckets)))
            partial = salted.groupBy("_salt", *keys).agg(F.count(F.lit(1)).alias("_cnt"))
            counts = partial.groupBy(*keys).agg(F.sum("_cnt").alias("dup_count"))
        else:
            counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("dup_count"))
        return counts.filter(F.col("dup_count") > 1)

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        """Long result: one row per chunk with the duplicate-row rate (rows
        belonging to keys seen >1 times in the FULL frame)."""
        chunker = self.chunker or DefaultChunker()
        assigned, headers = assign_chunks(df, chunker)
        dups = self.duplicates(df).select(*self.key_columns, "dup_count")
        marked = assigned.join(dups, list(self.key_columns), "left")
        agg = marked.groupBy(CHUNK_KEY).agg(
            F.count(F.lit(1)).alias("__rows"),
            F.sum(F.when(F.col("dup_count").isNotNull(), 1).otherwise(0)).alias("__dup_rows"),
        )
        long_df = agg.select(
            CHUNK_KEY,
            F.lit("+".join(self.key_columns)).alias("column_name"),
            F.lit("duplicate_rate").alias("method"),
            (F.col("__dup_rows") / F.col("__rows")).cast("double").alias("value"),
        )
        return _attach_const_threshold(long_df, headers, period, None, 0.0)

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        chunker = self.chunker or DefaultChunker()
        assigned = chunker.assign(df)
        dups = self.duplicates(df)
        bad = assigned.join(dups, list(self.key_columns), "inner")
        key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in self.key_columns])
        return bad.select(
            F.lit("uniqueness").alias("check"),
            F.lit("+".join(self.key_columns)).alias("column_name"),
            F.col(CHUNK_KEY),
            (F.col(row_id).cast("string") if row_id else key_str).alias("row_id"),
            F.lit("duplicate_key").alias("violation_kind"),
            F.col("dup_count").cast("string").alias("observed_value"),
        )


@dataclass
class ReferentialIntegrityCheck:
    """Foreign-key / manifest membership (north rule's phash-vs-manifest check;
    generalizes the reference's seen-set idea
    `nannyml/data_quality/unseen/calculator.py:126-131` to a join).

    ``broadcast_manifest=True`` hints a broadcast join; otherwise Spark/AQE
    chooses (sort-merge for big manifests)."""

    column: str
    manifest: DataFrame
    manifest_column: Optional[str] = None
    chunker: Optional[Chunker] = None
    broadcast_manifest: bool = True

    def _manifest_df(self) -> DataFrame:
        mc = self.manifest_column or self.column
        m = self.manifest.select(F.col(mc).alias(self.column)).distinct()
        return F.broadcast(m) if self.broadcast_manifest else m

    def orphans(self, df: DataFrame) -> DataFrame:
        return df.join(self._manifest_df(), [self.column], "left_anti")

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        chunker = self.chunker or DefaultChunker()
        assigned, headers = assign_chunks(df, chunker)
        tot = assigned.groupBy(CHUNK_KEY).agg(F.count(F.lit(1)).alias("__rows"))
        orph = (
            assigned.join(self._manifest_df(), [self.column], "left_anti")
            .groupBy(CHUNK_KEY)
            .agg(F.count(F.lit(1)).alias("__orphans"))
        )
        agg = tot.join(orph, CHUNK_KEY, "left").withColumn("__orphans", F.coalesce(F.col("__orphans"), F.lit(0)))
        long_df = agg.select(
            CHUNK_KEY,
            F.lit(self.column).alias("column_name"),
            F.lit("orphan_rate").alias("method"),
            (F.col("__orphans") / F.col("__rows")).cast("double").alias("value"),
        )
        return _attach_const_threshold(long_df, headers, period, None, 0.0)

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        chunker = self.chunker or DefaultChunker()
        assigned = chunker.assign(df)
        bad = assigned.join(self._manifest_df(), [self.column], "left_anti")
        return bad.select(
            F.lit("referential_integrity").alias("check"),
            F.lit(self.column).alias("column_name"),
            F.col(CHUNK_KEY),
            (F.col(row_id).cast("string") if row_id else F.lit(None).cast("string")).alias("row_id"),
            F.lit("orphan").alias("violation_kind"),
            F.col(self.column).cast("string").alias("observed_value"),
        )
