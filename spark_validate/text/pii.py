"""PII detection and redaction over a text column — a training-data-pipeline
op the reference does not have (closest spirit: NannyML's data-quality
calculators, `nannyml/data_quality/unseen/calculator.py:29` — a per-chunk
"bad rows" rate); pattern set follows the public C4/CCNet-style scrubbing
recipes (emails, phone numbers, IP addresses, US-SSN shapes).

Everything is pure codegen: ``regexp_extract_all`` / ``regexp_replace``
column expressions — no UDFs, no shuffle beyond the per-chunk aggregation,
so the scan cost at 10^12 rows is one pass over the text column with the
regex evaluated inside whole-stage codegen.

Pattern-dialect contract: every pattern must behave identically under Java
``java.util.regex`` (Spark) and RE2 (DuckDB oracle) — so no backreferences,
no lookaround; only character classes, bounded quantifiers, alternation and
``\\b`` word boundaries (word char = ``[A-Za-z0-9_]`` in both engines).
Each pattern is wrapped in one outer capture group and extracted with
group index 1 on both sides (Spark's ``regexp_extract_all`` defaults to
group 1; DuckDB's defaults to 0).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies in this order, and SSN before phone matters if a
# caller reorders — an SSN (ddd-dd-dddd) never matches the phone shapes below
# (middle group is 2 digits, phone needs 3), so the defaults are disjoint.
PII_PATTERNS: Dict[str, str] = {
    "email": r"([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})",
    "ipv4": r"(\b(?:\d{1,3}\.){3}\d{1,3}\b)",
    "ssn": r"(\b\d{3}-\d{2}-\d{4}\b)",
    "phone": r"(\(\d{3}\) ?\d{3}[- ]\d{4}|\b\d{3}[-.]\d{3}[-.]\d{4}\b)",
}


def with_pii_counts(
    df: DataFrame,
    text_col: str = "text",
    kinds: Optional[Sequence[str]] = None,
    patterns: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Add one ``n_<kind>`` match-count column per PII kind plus
    ``pii_total`` and ``has_pii``. Narrow (no shuffle); NULL text counts 0."""
    pats = dict(patterns or PII_PATTERNS)
    use = list(kinds) if kinds is not None else list(pats)
    out = df
    t = F.coalesce(F.col(text_col), F.lit(""))
    for k in use:
        out = out.withColumn(
            f"n_{k}", F.size(F.regexp_extract_all(t, F.lit(pats[k]), F.lit(1))).cast("int")
        )
    total = None
    for k in use:
        total = F.col(f"n_{k}") if total is None else total + F.col(f"n_{k}")
    return out.withColumn("pii_total", total.cast("int")).withColumn(
        "has_pii", F.col("pii_total") > 0
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: Optional[str] = None,
    kinds: Optional[Sequence[str]] = None,
    patterns: Optional[Dict[str, str]] = None,
    token_format: str = "<{kind}>",
) -> DataFrame:
    """Replace every PII match with a typed token (default ``<EMAIL>`` …).

    Chained ``regexp_replace`` in ``PII_PATTERNS`` order; later patterns scan
    the already-redacted text, so overlapping shapes resolve deterministically
    by that order. Still a single narrow projection."""
    pats = dict(patterns or PII_PATTERNS)
    use = list(kinds) if kinds is not None else list(pats)
    col = F.col(text_col)
    for k in use:
        col = F.regexp_replace(col, pats[k], token_format.format(kind=k.upper()))
    return df.withColumn(out_col or text_col, col)


class PiiRateCheck:
    """Runner-compatible check: per-chunk rate of documents containing each
    PII kind — one result row per (chunk, kind) with
    ``value = docs_with_kind / docs``, plus an ``any`` row. Default
    ``ConstantThreshold(upper=0)``: any PII doc alerts (the data-quality
    default, `nannyml/data_quality/unseen/calculator.py:268`).

    Fit is a no-op (the rule is constant), so the check is load-free on
    resume. ``violations()`` names each offending doc with per-kind counts.
    Fusable: the per-row flags are plain expressions, so the fused suite
    pass carries them in the shared groupBy(chunk) aggregation.
    """

    def __init__(
        self,
        text_col: str = "text",
        id_col: Optional[str] = "doc_id",
        kinds: Optional[Sequence[str]] = None,
        patterns: Optional[Dict[str, str]] = None,
        chunker=None,
        upper_threshold: float = 0.0,
    ):
        from spark_validate.chunking import DefaultChunker

        self.text_col = text_col
        self.id_col = id_col
        self.patterns = dict(patterns or PII_PATTERNS)
        self.kinds = list(kinds) if kinds is not None else list(self.patterns)
        self.chunker = chunker or DefaultChunker()
        self.upper_threshold = upper_threshold

    def fit(self, reference: DataFrame) -> "PiiRateCheck":
        return self

    def _flag(self, kind: str) -> F.Column:
        t = F.coalesce(F.col(self.text_col), F.lit(""))
        return (
            F.size(F.regexp_extract_all(t, F.lit(self.patterns[kind]), F.lit(1))) > 0
        ).cast("int")

    def _aggs(self, prefix: str = ""):
        aggs = [F.count(F.lit(1)).alias(f"{prefix}__rows")]
        any_flag = None
        for k in self.kinds:
            f = self._flag(k)
            any_flag = f if any_flag is None else F.greatest(any_flag, f)
            aggs.append(F.sum(f).cast("double").alias(f"{prefix}pii__{k}"))
        aggs.append(F.sum(any_flag).cast("double").alias(f"{prefix}pii__any"))
        return aggs

    def _long(self, wide: DataFrame, extra_cols, prefix: str = "") -> DataFrame:
        rows = F.col(f"{prefix}__rows")
        pairs = [
            F.struct(
                F.lit(self.text_col).alias("column_name"),
                F.lit(f"pii_{k}_rate").alias("method"),
                (F.col(f"{prefix}pii__{k}") / rows).cast("double").alias("value"),
            )
            for k in [*self.kinds, "any"]
        ]
        from spark_validate.chunking import CHUNK_KEY

        return wide.select(CHUNK_KEY, *extra_cols, F.explode(F.array(*pairs)).alias("kv")).select(
            CHUNK_KEY, *extra_cols, "kv.column_name", "kv.method", "kv.value"
        )

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        from spark_validate.calculators.base import assign_chunks
        from spark_validate.checks.constraints import _attach_const_threshold
        from spark_validate.chunking import CHUNK_KEY

        assigned, headers = assign_chunks(df, self.chunker)
        wide = assigned.groupBy(CHUNK_KEY).agg(*self._aggs())
        return _attach_const_threshold(
            self._long(wide, ()), headers, period, None, self.upper_threshold
        )

    def fuse_contrib(self, dtypes, prefix: str):
        from spark_validate.checks.constraints import _FUSE_HDR_COLS, _attach_const_threshold

        exprs = self._aggs(prefix)

        def fin(wide: DataFrame, period: str) -> DataFrame:
            return _attach_const_threshold(
                self._long(wide, _FUSE_HDR_COLS, prefix), None, period, None, self.upper_threshold
            )

        return exprs, fin

    def get_state(self) -> dict:
        return {"kinds": self.kinds, "patterns": self.patterns}

    def set_state(self, state: dict) -> "PiiRateCheck":
        self.kinds = list(state["kinds"])
        self.patterns = dict(state["patterns"])
        return self

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        from spark_validate.chunking import CHUNK_KEY

        rid = row_id or self.id_col
        assigned = self.chunker.assign(df)
        counted = with_pii_counts(assigned, self.text_col, self.kinds, self.patterns)
        parts = []
        for k in self.kinds:
            parts.append(
                counted.filter(F.col(f"n_{k}") > 0).select(
                    F.lit("pii").alias("check"),
                    F.lit(self.text_col).alias("column_name"),
                    F.col(CHUNK_KEY),
                    (F.col(rid).cast("string") if rid else F.lit(None).cast("string")).alias(
                        "row_id"
                    ),
                    F.lit(f"pii_{k}").alias("violation_kind"),
                    F.col(f"n_{k}").cast("string").alias("observed_value"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
