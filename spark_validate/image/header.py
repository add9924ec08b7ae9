"""Structural payload-header validation — pure JVM column expressions.

The north rule's fmt checks have two tiers. The *domain* tier (`DomainCheck`)
validates the declared ``fmt`` string against an allowed set. This module is
the *structural* tier: does the binary payload actually BE what the row
declares — magic signature present, header long enough, header-encoded
dimensions equal to the ``w``/``h`` metadata columns?

Scale story: this runs BEFORE (or instead of) the Arrow decode pass. Magic
and dimension fields are fixed-offset byte slices, so the whole check
compiles to ``substring``/``hex``/``conv`` column expressions inside
whole-stage codegen — zero Python, zero shuffle, a narrow map over the scan.
At 10^12 images that is the difference between triaging structural
corruption at scan speed and paying a full decode for every broken blob
(the decode pass can then run on the structurally-valid survivors only).

Format specs are data, not code: each maps a declared fmt value to
  * ``magics`` — acceptable hex signatures at byte offset 1 (any-of),
  * ``also``   — extra required ``(offset, hex)`` signatures (e.g. WEBP's
                 'WEBP' at offset 9 inside the RIFF container),
  * ``dims_be`` — optional ``(w_offset, h_offset, n_bytes)`` of big-endian
                 header dimensions to compare against the metadata columns
                 (PNG's IHDR encodes both at fixed offsets; so does the
                 deterministic SVI0 fake codec used in this container).

Reference analog: NannyML validates column-level schema/domain only
(`nannyml/data_quality/unseen/calculator.py:126-131`); payload-structure
checks are a north-rule web-scale extension.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks
from spark_validate.chunking import CHUNK_KEY, Chunker, DefaultChunker

# Real container signatures (public magic numbers). PNG additionally carries
# IHDR width/height as big-endian u32 at byte offsets 17 and 21 — parseable
# with substring/conv, no decoder needed.
REAL_SPECS: Dict[str, dict] = {
    "png": {"magics": ["89504E470D0A1A0A"], "dims_be": (17, 21, 4)},
    "jpeg": {"magics": ["FFD8FF"]},
    "jpg": {"magics": ["FFD8FF"]},
    "gif": {"magics": ["474946383761", "474946383961"]},
    "webp": {"magics": ["52494646"], "also": [(9, "57454250")]},
    "bmp": {"magics": ["424D"]},
}

# The deterministic fake codec this container synthesizes
# (`image/synth.py`): 'SVI0' magic + 4-byte big-endian w + 4-byte h.
SVI0_SPEC: dict = {"magics": ["53564930"], "dims_be": (5, 9, 4)}


def svi0_specs(fmts: Sequence[str]) -> Dict[str, dict]:
    """Every declared fmt maps to the SVI0 container (the synth tables
    declare jpeg/png/webp but all payloads are SVI0 — the fake-codec world's
    analog of 'every fmt uses the same real container')."""
    return {f: SVI0_SPEC for f in fmts}


def _spec_min_len(spec: dict) -> int:
    n = max((len(m) // 2 for m in spec.get("magics", [""])), default=0)
    for off, sig in spec.get("also", []):
        n = max(n, off - 1 + len(sig) // 2)
    if spec.get("dims_be"):
        w_off, h_off, nb = spec["dims_be"]
        n = max(n, w_off - 1 + nb, h_off - 1 + nb)
    return n


def _be_field(bytes_col: Column, off: int, nb: int) -> Column:
    """Big-endian unsigned header field as a long (hex slice → base-10)."""
    return F.conv(F.hex(F.substring(bytes_col, off, nb)), 16, 10).cast("long")


def header_issue_expr(
    bytes_col: Column,
    fmt_col: Column,
    w_col: Optional[Column] = None,
    h_col: Optional[Column] = None,
    specs: Optional[Dict[str, dict]] = None,
) -> Column:
    """Per-row structural verdict: NULL when the header is consistent, else
    one of ``null_payload`` / ``truncated`` / ``unknown_format`` /
    ``magic_mismatch`` / ``dim_mismatch``. One CASE chain over the (bounded)
    spec map — whole-stage-codegen friendly, no UDF."""
    specs = specs if specs is not None else REAL_SPECS
    blen = F.length(bytes_col)

    def fmt_branch(spec: dict) -> Column:
        min_len = _spec_min_len(spec)
        magic_ok = F.lit(False)
        for m in spec.get("magics", []):
            magic_ok = magic_ok | (F.hex(F.substring(bytes_col, 1, len(m) // 2)) == F.lit(m.upper()))
        for off, sig in spec.get("also", []):
            magic_ok = magic_ok & (F.hex(F.substring(bytes_col, off, len(sig) // 2)) == F.lit(sig.upper()))
        issue = F.when(blen < F.lit(min_len), F.lit("truncated")).when(
            ~magic_ok, F.lit("magic_mismatch")
        )
        dims = spec.get("dims_be")
        if dims and w_col is not None and h_col is not None:
            w_off, h_off, nb = dims
            dim_bad = (_be_field(bytes_col, w_off, nb) != w_col.cast("long")) | (
                _be_field(bytes_col, h_off, nb) != h_col.cast("long")
            )
            # NULL metadata dims: nothing to compare — structural verdict
            # stays at the magic tier (missing metadata is the missing-values
            # calculator's finding, not a header inconsistency)
            issue = issue.when(
                w_col.isNotNull() & h_col.isNotNull() & dim_bad, F.lit("dim_mismatch")
            )
        return issue.otherwise(F.lit(None).cast("string"))

    out = F.when(bytes_col.isNull(), F.lit("null_payload"))
    for fmt_value, spec in sorted(specs.items()):
        out = out.when(fmt_col == F.lit(fmt_value), fmt_branch(spec))
    # fmt NULL or outside the spec map: the payload cannot be structurally
    # interpreted — explicit verdict (the fmt DOMAIN check alerts separately)
    return out.otherwise(F.lit("unknown_format"))


@dataclass
class PayloadHeaderCheck:
    """Chunked structural-header check over an image table.

    ``calculate`` emits the long-form per-chunk ``header_violation_rate``
    (ConstantThreshold(upper=0) semantics — any structural inconsistency
    alerts, same contract as the other north-rule checks); ``violations``
    emits one exploded row per broken payload with the issue kind and the
    first header bytes as the observed value.
    """

    fmt_col: str = "fmt"
    bytes_col: str = "bytes"
    w_col: Optional[str] = "w"
    h_col: Optional[str] = "h"
    specs: Optional[Dict[str, dict]] = None  # None → SVI0 spec per observed fmt
    chunker: Chunker = field(default_factory=DefaultChunker)
    upper_threshold: float = 0.0

    def _specs(self, df: DataFrame) -> Dict[str, dict]:
        if self.specs is not None:
            return self.specs
        # default container world: every declared fmt is an SVI0 payload.
        # The spec map must be bounded + deterministic — build it from the
        # check config's domain, not a distinct scan: callers with a real
        # fmt universe pass specs explicitly.
        from spark_validate.image.synth import FMTS, UNSEEN_FMT

        return svi0_specs([*FMTS, UNSEEN_FMT])

    def _issue(self, df: DataFrame) -> Column:
        return header_issue_expr(
            F.col(self.bytes_col),
            F.col(self.fmt_col),
            F.col(self.w_col) if self.w_col else None,
            F.col(self.h_col) if self.h_col else None,
            self._specs(df),
        )

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        from spark_validate.checks.constraints import _attach_const_threshold

        assigned, headers = assign_chunks(df, self.chunker)
        agg = assigned.withColumn("_sv_issue", self._issue(df)).groupBy(CHUNK_KEY).agg(
            F.count(F.lit(1)).alias("__rows"),
            F.count("_sv_issue").alias("__bad"),
        )
        long_df = agg.select(
            CHUNK_KEY,
            F.lit(self.bytes_col).alias("column_name"),
            F.lit("header_violation_rate").alias("method"),
            (F.col("__bad") / F.col("__rows")).cast("double").alias("value"),
        )
        return _attach_const_threshold(long_df, headers, period, None, self.upper_threshold)

    def violations(self, df: DataFrame, row_id: Optional[str] = "image_id") -> DataFrame:
        assigned = self.chunker.assign(df)
        return (
            assigned.withColumn("_sv_issue", self._issue(df))
            .filter(F.col("_sv_issue").isNotNull())
            .select(
                F.lit("payload_header").alias("check"),
                F.lit(self.bytes_col).alias("column_name"),
                F.col(CHUNK_KEY),
                (F.col(row_id).cast("string") if row_id else F.lit(None).cast("string")).alias(
                    "row_id"
                ),
                F.col("_sv_issue").alias("violation_kind"),
                # first 16 header bytes, hex — enough to see magic + dims
                F.hex(F.substring(F.col(self.bytes_col), 1, 16)).alias("observed_value"),
            )
        )
