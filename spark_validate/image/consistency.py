"""Cross-modal caption↔image consistency (beyond-reference, image axis).

An image+caption training corpus routinely carries the SAME image under
several rows (re-crawls, mirrors, near-identical re-encodes that share a
phash). Those duplicates are benign for dedup but poisonous for training
when the copies disagree on the caption — the model sees contradictory
supervision for one visual input. This check finds image groups (exact
phash, or any precomputed group key such as a near-dup cluster id) whose
rows carry MORE THAN ONE distinct caption, reports the per-chunk rate of
rows living in such conflicted groups, and emits the conflicting rows as
violations.

Closest reference analog is the seen-set / duplicate machinery
(`nannyml/data_quality/unseen/calculator.py:126-131`); the cross-modal
conflict semantics are new.

Scale design (10^12 rows): the distinct-caption count is a TWO-LEVEL
collapse — ``groupBy(group, caption)`` first (map-side combine folds the
boilerplate caption copies before the shuffle; a billion-copy
image+caption pair crosses the wire once), then ``groupBy(group)`` over
the already-collapsed pairs. The conflicted-group frame that joins back
to the corpus holds only groups with ≥2 distinct captions — tiny in
practice, so AQE broadcasts it; the corpus itself is never re-shuffled
for the rate aggregation (join key stays the group column).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks
from spark_validate.checks.constraints import _attach_const_threshold
from spark_validate.chunking import CHUNK_KEY, Chunker, DefaultChunker


def elect_canonical_captions(
    df: DataFrame,
    group_col: str = "phash",
    caption_col: str = "caption",
) -> DataFrame:
    """One row per image group: the ELECTED caption — most frequent non-null
    caption, ties broken by the lexicographically smallest — plus
    ``support`` (rows carrying the winner), ``n_rows`` (non-null-caption
    rows) and ``n_captions`` (distinct non-null captions). The curation
    complement of :class:`CaptionConsistencyCheck`: where the check reports
    conflicted groups, the election RESOLVES them so dedup can keep one row
    per image with the majority caption instead of whichever caption the
    keeper row happened to carry.

    Scale: the same two-level collapse as the check — ``groupBy(group,
    caption)`` map-side combines boilerplate copies before the shuffle; the
    window that picks the winner runs over the COLLAPSED pairs frame
    (one row per distinct caption per group, partitioned by group — never a
    global sort, never a collect_list of raw rows).
    """
    g, c = group_col, caption_col
    pairs = (
        df.filter(F.col(g).isNotNull() & F.col(c).isNotNull())
        .groupBy(g, c)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w = Window.partitionBy(g).orderBy(F.desc("_cnt"), F.asc(c))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_rows", F.sum("_cnt").over(Window.partitionBy(g)))
        .withColumn("n_captions", F.count(F.lit(1)).over(Window.partitionBy(g)))
        .filter(F.col("_rn") == 1)
        .select(
            g,
            F.col(c).alias("canonical_caption"),
            F.col("_cnt").alias("support"),
            "n_rows",
            "n_captions",
        )
    )


def apply_canonical_captions(
    df: DataFrame,
    group_col: str = "phash",
    caption_col: str = "caption",
) -> DataFrame:
    """Rewrite every row's caption to its group's elected caption. Rows
    whose group is NULL or has no non-null caption keep their original;
    ``caption_replaced`` marks rows whose text actually changed (NULL
    captions gaining the canonical text count as replaced). The join key is
    the group column — the same key every dedup stage shuffles on — and the
    election frame is one row per group, so AQE broadcasts it when small."""
    g, c = group_col, caption_col
    elected = elect_canonical_captions(df, g, c).select(g, "canonical_caption")
    out = df.join(elected, g, "left")
    new_caption = F.coalesce(F.col("canonical_caption"), F.col(c))
    return out.select(
        *[col for col in df.columns if col != c],
        new_caption.alias(c),
        (
            F.col("canonical_caption").isNotNull()
            & (F.col(c).isNull() | (F.col(c) != F.col("canonical_caption")))
        ).alias("caption_replaced"),
    )


@dataclass
class CaptionSpamCheck:
    """Flag captions attached to MANY distinct image identities — the
    INVERSE of :class:`CaptionConsistencyCheck`. A boilerplate caption
    stamped across unrelated images ("stock photo", an SEO template, a
    watermark transcription) is near-zero-information supervision: the
    model learns to emit the template for everything. Web-scale
    image+caption curation pipelines gate on exactly this signal; the
    reference's closest analog is again the seen-set duplicate machinery
    (`nannyml/data_quality/unseen/calculator.py:126-131`), the cross-modal
    spam semantics are new.

    Semantics: a caption is SPAM when it appears with more than
    ``max_groups`` distinct non-null image groups (exact phash by default;
    pass a near-dup cluster id for fuzzier identity). NULL captions are
    ignored (missing captions are the missing-values check's job). Rows
    whose group is NULL still count toward the caption's row count but
    never toward its group count (no image identity → can't evidence
    spread).

    Scale: the same two-level collapse as the consistency check —
    ``groupBy(caption, group)`` first so a billion identical
    (caption, image) rows map-side combine to one shuffled pair, then
    ``groupBy(caption)`` over the collapsed pairs. The spam-caption frame
    joining back to the corpus holds only offending captions (tiny → AQE
    broadcast); witnesses are bounded MIN/MAX groups, never a
    collect_list.
    """

    group_col: str = "phash"
    caption_col: str = "caption"
    max_groups: int = 1
    chunker: Optional[Chunker] = None
    upper_threshold: float = 0.0  # spam-row rate above this alerts

    def spam_captions(self, df: DataFrame) -> DataFrame:
        """One row per spam caption: (caption, n_rows, n_groups,
        group_a, group_b) for captions spanning > max_groups distinct
        non-null groups. group_a/group_b are the min/max witness
        identities (bounded, deterministic)."""
        g, c = self.group_col, self.caption_col
        pairs = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c, g)
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        grouped = pairs.groupBy(c).agg(
            F.sum("_cnt").alias("n_rows"),
            F.count(F.when(F.col(g).isNotNull(), F.lit(1))).alias("n_groups"),
            F.min(g).alias("group_a"),
            F.max(g).alias("group_b"),
        )
        return grouped.filter(F.col("n_groups") > int(self.max_groups))

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        """Long result: per-chunk rate of rows carrying a caption that is
        spammy anywhere in the FULL frame (corpus-level identity,
        chunk-level reporting — the UniquenessCheck convention)."""
        chunker = self.chunker or DefaultChunker()
        assigned, headers = assign_chunks(df, chunker)
        bad = self.spam_captions(df).select(
            self.caption_col, F.lit(1).alias("_spam")
        )
        marked = assigned.join(bad, self.caption_col, "left")
        agg = marked.groupBy(CHUNK_KEY).agg(
            F.count(F.lit(1)).alias("__rows"),
            F.sum(F.coalesce(F.col("_spam"), F.lit(0))).alias("__bad_rows"),
        )
        long_df = agg.select(
            CHUNK_KEY,
            F.lit(f"{self.caption_col}@{self.group_col}").alias("column_name"),
            F.lit("caption_spam_rate").alias("method"),
            (F.col("__bad_rows") / F.col("__rows")).cast("double").alias("value"),
        )
        return _attach_const_threshold(
            long_df, headers, period, None, self.upper_threshold
        )

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        """Every row carrying a spam caption, with the group-spread witness."""
        chunker = self.chunker or DefaultChunker()
        assigned = chunker.assign(df)
        bad = self.spam_captions(df)
        rows = assigned.join(bad, self.caption_col, "inner")
        return rows.select(
            F.lit("caption_spam").alias("check"),
            F.lit(f"{self.caption_col}@{self.group_col}").alias("column_name"),
            F.col(CHUNK_KEY),
            (
                F.col(row_id).cast("string")
                if row_id
                else F.col(self.caption_col).cast("string")
            ).alias("row_id"),
            F.lit("caption_spam").alias("violation_kind"),
            F.concat_ws(
                " ",
                F.concat(F.lit("groups="), F.col("n_groups").cast("string")),
                F.concat(
                    F.lit("span="),
                    F.col("group_a").cast("string"),
                    F.lit(".."),
                    F.col("group_b").cast("string"),
                ),
            ).alias("observed_value"),
        )


@dataclass
class CaptionConsistencyCheck:
    """Flag image groups whose rows disagree on the caption.

    ``group_col`` is the image identity (exact phash by default; pass a
    near-dup cluster id for fuzzier identity). NULL groups are ignored
    (no image identity → nothing to conflict with); NULL captions do not
    count as a distinct caption (missing captions are the missing-values
    check's job), but their rows still count toward the group size.
    """

    group_col: str = "phash"
    caption_col: str = "caption"
    chunker: Optional[Chunker] = None
    upper_threshold: float = 0.0  # conflict-row rate above this alerts

    def conflicts(self, df: DataFrame) -> DataFrame:
        """One row per conflicted group: (group, n_rows, n_captions,
        sample_captions) for groups with ≥2 distinct non-null captions.
        ``sample_captions`` carries the lexicographic min/max captions —
        a bounded, deterministic witness pair (never a collect_list)."""
        g, c = self.group_col, self.caption_col
        pairs = (
            df.filter(F.col(g).isNotNull())
            .groupBy(g, c)
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        grouped = pairs.groupBy(g).agg(
            F.sum("_cnt").alias("n_rows"),
            F.count(F.when(F.col(c).isNotNull(), F.lit(1))).alias("n_captions"),
            F.min(c).alias("caption_a"),
            F.max(c).alias("caption_b"),
        )
        return grouped.filter(F.col("n_captions") > 1)

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        """Long result: per-chunk rate of rows belonging to a group whose
        captions conflict anywhere in the FULL frame (corpus-level identity,
        chunk-level reporting — same convention as UniquenessCheck)."""
        chunker = self.chunker or DefaultChunker()
        assigned, headers = assign_chunks(df, chunker)
        bad = self.conflicts(df).select(self.group_col, F.lit(1).alias("_conflict"))
        marked = assigned.join(bad, self.group_col, "left")
        agg = marked.groupBy(CHUNK_KEY).agg(
            F.count(F.lit(1)).alias("__rows"),
            F.sum(F.coalesce(F.col("_conflict"), F.lit(0))).alias("__bad_rows"),
        )
        long_df = agg.select(
            CHUNK_KEY,
            F.lit(f"{self.group_col}+{self.caption_col}").alias("column_name"),
            F.lit("caption_conflict_rate").alias("method"),
            (F.col("__bad_rows") / F.col("__rows")).cast("double").alias("value"),
        )
        return _attach_const_threshold(
            long_df, headers, period, None, self.upper_threshold
        )

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        """Every row of every conflicted group, with the witness captions."""
        chunker = self.chunker or DefaultChunker()
        assigned = chunker.assign(df)
        bad = self.conflicts(df)
        rows = assigned.join(bad, self.group_col, "inner")
        return rows.select(
            F.lit("caption_consistency").alias("check"),
            F.lit(f"{self.group_col}+{self.caption_col}").alias("column_name"),
            F.col(CHUNK_KEY),
            (
                F.col(row_id).cast("string")
                if row_id
                else F.col(self.group_col).cast("string")
            ).alias("row_id"),
            F.lit("caption_conflict").alias("violation_kind"),
            F.concat_ws(
                " <> ",
                F.col("caption_a").cast("string"),
                F.col("caption_b").cast("string"),
            ).alias("observed_value"),
        )
