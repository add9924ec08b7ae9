"""The north-rule validation suite over an image+caption table.

Composes the engine's checks exactly as BASELINE.json's north_star describes:

* schema contract (name/type verdicts at metadata cost + required non-null)
* per-partition column stats (null rate, min/max w/h) — one
  ``groupBy(partition).agg`` pass
* fmt domain check
* structural payload headers (magic + header-dim consistency, zero-UDF)
* caption quality (token/char/quality features with fitted 3σ thresholds)
* image_id uniqueness — two-phase (optionally salted) hash aggregate
* phash referential check vs a reference manifest (broadcast or sort-merge
  anti-join)
* distribution drift: KS on w/h, chi2 + JS on fmt, PSI on phash-derived
  histogram buckets
* payload checks: decode pixel stats + PSNR-vs-reference equivalence in
  ``mapInPandas`` (Arrow), range-partitioned on image_id

Returns the long-form results / violations tables; ``run_and_collect``
materializes everything and reports row counts + alert counts (the shape a
scheduled production run persists to the results store).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.calculators import ColumnStatsCalculator
from spark_validate.checks import DomainCheck, ReferentialIntegrityCheck, UniquenessCheck
from spark_validate.chunking import Chunker, PartitionChunker
from spark_validate.drift import UnivariateDriftCalculator
from spark_validate.image.payload import payload_checks
from spark_validate.image.synth import FMTS

# BASELINE.json input_hint: the exact shape of the north-rule table
NORTH_SCHEMA = {
    "image_id": "string",
    "bytes": "binary",
    "w": "int",
    "h": "int",
    "fmt": "string",
    "caption": "string",
    "phash": "bigint",
}


@dataclass
class ImageValidationSuite:
    chunker: Chunker = field(default_factory=PartitionChunker)
    fmt_domain: tuple = tuple(FMTS)
    phash_buckets: int = 64
    include_payload_checks: bool = True
    include_header_check: bool = True
    include_caption_checks: bool = True
    include_schema_check: bool = True
    include_phash_dedup: bool = False  # near-dup sweep (adds one shuffle + verify)
    include_profile_checks: bool = True  # z-score row gates + HLL++ cardinality
    include_consistency_check: bool = True  # caption↔image conflict + spam rates
    include_category_shift: bool = True  # fmt share-shift attribution
    caption_spam_max_groups: int = 50  # spread bound before a caption is spam
    include_joint_drift: bool = True  # (w,h) 2-D drift the marginals miss
    include_correlation_drift: bool = True  # w↔h Pearson-corr shift per chunk
    phash_max_hamming: int = 4
    phash_n_blocks: int = 8  # Manku tables: the corpus-scale operating point
    salt_buckets: int = 16

    def _with_phash_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn("phash_bucket", F.pmod(F.col("phash"), F.lit(self.phash_buckets)).cast("string"))

    def run(
        self,
        reference: DataFrame,
        analysis: DataFrame,
        manifest: Optional[DataFrame] = None,
        broadcast_manifest: bool = True,
    ) -> Dict[str, DataFrame]:
        out: Dict[str, DataFrame] = {}

        # 0. schema contract — metadata tier costs zero executor work (the
        # schema comes from the catalog/parquet footer), so a widened or
        # missing column fails BEFORE any task launches; the data tier
        # enforces required non-null keys per chunk
        if self.include_schema_check:
            from spark_validate.checks.schema import SchemaCheck

            sc = SchemaCheck(
                expected=dict(NORTH_SCHEMA),
                required=("image_id", "bytes"),
                chunker=self.chunker,
            )
            out["schema"] = sc.calculate(analysis)
            out["schema_verdicts"] = sc.verdicts(analysis)

        # 1. column stats with reference-fitted thresholds (single agg pass)
        stats = ColumnStatsCalculator(
            ["w", "h"],
            metrics=("missing_rate", "avg", "min", "max"),
            chunker=self.chunker,
        ).fit(reference)
        out["column_stats"] = stats.calculate(analysis)

        # 2. fmt domain
        dom = DomainCheck(["fmt"], domain=list(self.fmt_domain), chunker=self.chunker)
        out["fmt_domain"] = dom.calculate(analysis)
        out["fmt_violations"] = dom.violations(analysis, row_id="image_id")

        # 2b. structural payload headers — magic + header-dim consistency as
        # pure column expressions (scan-speed triage BEFORE the Arrow decode)
        if self.include_header_check:
            from spark_validate.image.header import PayloadHeaderCheck

            hdr = PayloadHeaderCheck(chunker=self.chunker)
            out["payload_header"] = hdr.calculate(analysis)
            out["header_violations"] = hdr.violations(analysis, row_id="image_id")

        # 3. image_id uniqueness (salted two-phase)
        uniq = UniquenessCheck(["image_id"], chunker=self.chunker, salt_buckets=self.salt_buckets)
        out["uniqueness"] = uniq.calculate(analysis)
        out["duplicate_keys"] = uniq.duplicates(analysis)

        # 4. phash referential vs manifest
        if manifest is None:
            manifest = reference.select("phash").distinct()
        refchk = ReferentialIntegrityCheck(
            column="phash", manifest=manifest, chunker=self.chunker, broadcast_manifest=broadcast_manifest
        )
        out["referential"] = refchk.calculate(analysis)
        out["orphans"] = refchk.violations(analysis, row_id="image_id")

        # 5. drift: KS on w/h (continuous), chi2+JS on fmt, PSI on phash buckets
        drift_wh = UnivariateDriftCalculator(
            ["w", "h"],
            continuous_methods=("kolmogorov_smirnov",),
            chunker=self.chunker,
            n_bins_ecdf=1000,
        ).fit(reference)
        out["drift_wh"] = drift_wh.calculate(analysis)

        drift_cat = UnivariateDriftCalculator(
            ["fmt", "phash_bucket"],
            categorical_methods=("jensen_shannon", "chi2", "psi"),
            chunker=self.chunker,
        ).fit(self._with_phash_bucket(reference))
        out["drift_cat"] = drift_cat.calculate(self._with_phash_bucket(analysis))

        # 5b. fmt attribution: WHICH format moved when drift_cat alerts —
        # per-chunk share deltas vs the fitted reference shares, reference-
        # unseen formats folded into an exact __other__ lump
        if self.include_category_shift:
            from spark_validate.drift.catshift import CategoryShiftCalculator

            cs = CategoryShiftCalculator(
                ["fmt"], chunker=self.chunker, delta_threshold=0.02
            ).fit(reference)
            out["fmt_share_shift"] = cs.calculate(analysis)

        # 6. perceptual near-duplicates (banded exact-recall Hamming join —
        # recall 1 for hamming ≤ bands−1, no image bytes in the shuffle)
        if self.include_phash_dedup:
            from spark_validate.image.phash import phash_near_duplicates

            out["phash_near_dups"] = phash_near_duplicates(
                analysis, max_hamming=self.phash_max_hamming, n_blocks=self.phash_n_blocks
            )

        # 6b. caption-side quality: the table is image+CAPTION pairs — derive
        # token/char/quality features as pure column expressions (text/
        # quality.py, fully codegen'd) and run the standard stats calculator
        # with reference-fitted 3σ thresholds over them. Degraded caption
        # batches (empty/truncated/noise-flooded) alert like any other drift.
        if self.include_caption_checks:
            from spark_validate.text.quality import with_quality_score

            cap_cols = ["token_count", "char_count", "quality_score"]
            cq = ColumnStatsCalculator(
                cap_cols, metrics=("missing_rate", "avg"), chunker=self.chunker
            ).fit(with_quality_score(reference, "caption"))
            out["caption_quality"] = cq.calculate(with_quality_score(analysis, "caption"))

            # 6c. caption PII scrubbing: per-chunk rate of captions carrying
            # email/ipv4/ssn/phone spans — pure codegen regex flags in the
            # same chunk aggregation shape; any PII caption alerts
            from spark_validate.text.pii import PiiRateCheck

            out["caption_pii"] = PiiRateCheck(
                text_col="caption", id_col="image_id", chunker=self.chunker
            ).calculate(analysis)

        # 6d. profile gates: reference-fitted z-score row outliers on w/h
        # (catches corrupt-metadata floods: 0×0 or 10^6-px dims) + HLL++
        # cardinality (an image_id ratio under 1.0 means duplication before
        # the exact uniqueness pass even runs) — both pure agg expressions
        if self.include_profile_checks:
            from spark_validate.checks import CardinalityCalculator, ZScoreOutlierCalculator

            zs = ZScoreOutlierCalculator(["w", "h"], z=4.0, chunker=self.chunker).fit(reference)
            out["zscore_outliers"] = zs.calculate(analysis)
            card = CardinalityCalculator(["image_id", "fmt"], exact=False, chunker=self.chunker)
            out["cardinality"] = card.calculate(analysis)

        # 6d2. record-level completeness + cross-column invariants: rows
        # missing several fields at once are unusable for training even when
        # every column's own null rate looks healthy; the compliance rules
        # encode the image-table business invariants (dims positive, bytes
        # present when dims are). Both pure agg expressions.
        if self.include_profile_checks:
            from spark_validate.checks import ComplianceCheck, RowCompletenessCalculator

            out["row_completeness"] = RowCompletenessCalculator(
                ["bytes", "w", "h", "fmt", "caption"],
                min_fraction=0.8,
                chunker=self.chunker,
                id_column="image_id",
            ).calculate(analysis)
            out["compliance"] = ComplianceCheck(
                rules={
                    "dims_positive": "w > 0 AND h > 0",
                    "bytes_when_dims": "(w IS NULL AND h IS NULL) OR bytes IS NOT NULL",
                },
                chunker=self.chunker,
                id_column="image_id",
            ).calculate(analysis)

        # 6e. cross-modal consistency: images sharing one phash must agree
        # on the caption — contradictory supervision otherwise. Two-level
        # caption collapse, conflicted-group frame broadcast back.
        if self.include_consistency_check:
            from spark_validate.image.consistency import CaptionConsistencyCheck

            cc = CaptionConsistencyCheck(
                group_col="phash", caption_col="caption", chunker=self.chunker
            )
            out["caption_consistency"] = cc.calculate(analysis)

            # the inverse gate: one caption stamped across many distinct
            # image identities is boilerplate supervision (same two-level
            # collapse keyed the other way)
            from spark_validate.image.consistency import CaptionSpamCheck

            spam = CaptionSpamCheck(
                group_col="phash",
                caption_col="caption",
                max_groups=self.caption_spam_max_groups,
                chunker=self.chunker,
            )
            out["caption_spam"] = spam.calculate(analysis)

        # 6f. joint (w,h) drift: the aspect-mix shift univariate KS on w and
        # h separately cannot see (marginals flat, joint mass moves) — one
        # pivoted width_bucket×width_bucket count aggregation per chunk
        if self.include_joint_drift:
            from spark_validate.drift.joint import JointHistogramDrift

            jd = JointHistogramDrift("w", "h", chunker=self.chunker).fit(reference)
            out["joint_drift_wh"] = jd.calculate(analysis)

        # 6c. w↔h correlation drift — the aspect-ratio relationship as ONE
        # number per chunk (cheap, attributable; the joint histogram above
        # localizes the 2-D shape when this trips)
        if self.include_correlation_drift:
            from spark_validate.drift.correlation import CorrelationDriftCalculator

            cd = CorrelationDriftCalculator(pairs=[("w", "h")], chunker=self.chunker).fit(reference)
            out["correlation_drift_wh"] = cd.calculate(analysis)

        # 7. payload checks — ONE fused Arrow pass (pixel stats + PSNR
        # equivalence; each side decoded exactly once)
        if self.include_payload_checks:
            out["payload"] = payload_checks(analysis, reference)
        return out

    def run_and_collect(self, reference, analysis, manifest=None, broadcast_manifest=True) -> Dict[str, dict]:
        """Materialize every check; return {check: {rows, alerts, secs}}."""
        results = self.run(reference, analysis, manifest, broadcast_manifest)
        report = {}
        for name, df in results.items():
            t0 = time.time()
            if "alert" in df.columns:
                row = df.agg(
                    F.count(F.lit(1)).alias("rows"), F.sum(F.col("alert").cast("int")).alias("alerts")
                ).first()
                report[name] = {"rows": row["rows"], "alerts": row["alerts"] or 0, "secs": time.time() - t0}
            elif "passes" in df.columns:
                row = df.agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum((~F.col("passes")).cast("int")).alias("failures"),
                ).first()
                report[name] = {"rows": row["rows"], "failures": row["failures"] or 0, "secs": time.time() - t0}
            else:
                report[name] = {"rows": df.count(), "secs": time.time() - t0}
        return report
