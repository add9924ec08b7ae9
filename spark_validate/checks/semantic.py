"""Semantic-type inference + conformance — "this column IS emails".

Physical schema checks (`checks/schema.py`) catch a string column turning
into an int; they are blind to a string column that silently stops
containing what it used to contain — emails becoming free text, ISO dates
becoming epoch strings, UUIDs becoming row numbers. Great Expectations'
pattern expectations and Deequ's ``hasPattern`` cover the ASSERTION half;
this check adds the INFERENCE half (profilers like whylogs): fit learns
each column's dominant semantic type from the reference (highest
full-match rate over a pattern battery, if it clears ``min_match``), and
calculate reports the per-chunk match rate of that fitted type with an
alert when a chunk falls below the band.

Patterns are anchored full-matches constrained to the Java↔RE2-identical
dialect (no lookaround/backrefs — the PII-module convention) so a DuckDB
oracle evaluates them byte-identically.

Scale shape: fit is ONE reference aggregation (a conditional count per
column × pattern); calculate is one ``groupBy(chunk)`` of conditional
counts for the fitted pattern only — pure codegen, fusable into the
suite's shared scan. NULLs are excluded from both numerator and base (the
missing-values check owns NULL-rate drift); an all-NULL chunk×column
yields NULL, never an alert.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks
from spark_validate.checks.constraints import _FUSE_HDR_COLS, _attach_const_threshold
from spark_validate.chunking import CHUNK_KEY, Chunker, DefaultChunker

# anchored full-match battery, Java == RE2 semantics; ORDER matters — ties
# break toward the earlier (more specific) pattern
SEMANTIC_PATTERNS = [
    ("uuid", "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
    ("email", "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"),
    ("url", "^https?://[^ ]+$"),
    ("ipv4", "^([0-9]{1,3}\\.){3}[0-9]{1,3}$"),
    ("date_iso", "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
    ("timestamp_iso", "^[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}:[0-9]{2}.*$"),
    ("integer_string", "^-?[0-9]+$"),
    ("decimal_string", "^-?[0-9]+\\.[0-9]+$"),
]


@dataclass
class SemanticTypeCheck:
    """Per-chunk conformance to each column's fitted semantic type."""

    column_names: Sequence[str]
    min_match: float = 0.9
    patterns: Sequence[tuple] = tuple(SEMANTIC_PATTERNS)
    chunker: Chunker = field(default_factory=DefaultChunker)
    id_column: Optional[str] = None
    _fitted: Optional[Dict[str, tuple]] = None  # col -> (type|None, ref_rate)

    def fit(self, reference: DataFrame) -> "SemanticTypeCheck":
        aggs = []
        for c in self.column_names:
            s = F.col(c).cast("string")
            aggs.append(F.count(s).alias(f"{c}__n"))
            for name, pat in self.patterns:
                aggs.append(
                    F.count(F.when(s.rlike(pat), F.lit(1))).alias(f"{c}__{name}")
                )
        row = reference.agg(*aggs).first().asDict()
        self._fitted = {}
        for c in self.column_names:
            n = row[f"{c}__n"]
            if not n:
                self._fitted[c] = (None, None)
                continue
            best, best_rate = None, -1.0
            for name, _ in self.patterns:  # earlier pattern wins ties (>)
                rate = row[f"{c}__{name}"] / n
                if rate > best_rate:
                    best, best_rate = name, rate
            if best_rate < self.min_match:
                self._fitted[c] = (None, best_rate)
            else:
                self._fitted[c] = (best, best_rate)
        return self

    def _pattern(self, type_name: str) -> str:
        return dict(self.patterns)[type_name]

    def _exprs(self, prefix: str):
        if self._fitted is None:
            raise RuntimeError("fit first")
        exprs = []
        for c in self.column_names:
            s = F.col(c).cast("string")
            exprs.append(F.count(s).alias(f"{prefix}{c}__n"))
            t, _ = self._fitted[c]
            hit = (
                F.count(F.when(s.rlike(self._pattern(t)), F.lit(1)))
                if t is not None
                else F.lit(None).cast("long")
            )
            exprs.append(hit.alias(f"{prefix}{c}__hit"))
        return exprs

    def _melt(self, wide: DataFrame, prefix: str, hdr_cols=()) -> DataFrame:
        pairs = []
        for c in self.column_names:
            t, _ = self._fitted[c]
            n = F.col(f"{prefix}{c}__n")
            rate = F.when(
                n > 0, F.col(f"{prefix}{c}__hit") / n
            ).cast("double")
            pairs.append(
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.lit(f"semantic_match_rate[{t or 'unknown'}]").alias("method"),
                    (rate if t is not None else F.lit(None).cast("double")).alias(
                        "value"
                    ),
                )
            )
        return wide.select(
            CHUNK_KEY, *hdr_cols, F.explode(F.array(*pairs)).alias("kv")
        ).select(CHUNK_KEY, *hdr_cols, "kv.column_name", "kv.method", "kv.value")

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        assigned, headers = assign_chunks(df, self.chunker)
        wide = assigned.groupBy(CHUNK_KEY).agg(*self._exprs(""))
        long_df = self._melt(wide, "")
        return _attach_const_threshold(long_df, headers, period, self.min_match, None)

    def fuse_contrib(self, dtypes, prefix: str):
        exprs = self._exprs(prefix)

        def fin(wide: DataFrame, period: str) -> DataFrame:
            long_df = self._melt(wide, prefix, hdr_cols=_FUSE_HDR_COLS)
            return _attach_const_threshold(long_df, None, period, self.min_match, None)

        return exprs, fin

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        row_id = row_id or self.id_column
        if self._fitted is None:
            raise RuntimeError("fit first")
        assigned = self.chunker.assign(df)
        parts = []
        for c in self.column_names:
            t, _ = self._fitted[c]
            if t is None:
                continue
            s = F.col(c).cast("string")
            parts.append(
                assigned.filter(s.isNotNull() & ~s.rlike(self._pattern(t))).select(
                    F.lit("semantic_types").alias("check"),
                    F.lit(c).alias("column_name"),
                    F.col(CHUNK_KEY),
                    (
                        F.col(row_id).cast("string")
                        if row_id
                        else F.lit(None).cast("string")
                    ).alias("row_id"),
                    F.lit(f"not_{t}").alias("violation_kind"),
                    s.substr(1, 256).alias("observed_value"),
                )
            )
        if not parts:
            raise RuntimeError("no column fitted a semantic type")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def get_state(self) -> dict:
        if self._fitted is None:
            raise RuntimeError("fit first")
        return {
            "min_match": self.min_match,
            "patterns": [list(p) for p in self.patterns],
            "fitted": {c: list(v) for c, v in self._fitted.items()},
        }

    def set_state(self, state: dict) -> "SemanticTypeCheck":
        self.min_match = float(state["min_match"])
        self.patterns = [tuple(p) for p in state["patterns"]]
        self._fitted = {c: tuple(v) for c, v in state["fitted"].items()}
        missing = [c for c in self.column_names if c not in self._fitted]
        if missing:
            raise ValueError(f"stored state lacks columns {missing}")
        return self
