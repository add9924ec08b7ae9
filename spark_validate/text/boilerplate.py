"""Corpus-common n-gram boilerplate detection — the line-dedup analog of
CCNet/RefinedWeb re-expressed at the word-n-gram level (our synthetic corpus
has no newline structure, so "line" generalizes to "word n-gram span").

Per document: the fraction of its DISTINCT word n-grams that occur in at
least ``min_docs`` documents corpus-wide. A doc dominated by spans shared
with many other documents is navigation chrome / templated boilerplate, not
content — public pipelines drop or trim such docs (CCNet paragraph-hash
dedup, RefinedWeb line dedup, Gopher §A1.2 duplicated-content filters).

Distinct from the other text ops in this package:
  * ``repetition_stats`` (quality.py) — WITHIN-doc duplication,
  * ``ngram_overlap`` (decontaminate.py) — overlap vs an external benchmark,
  * this module — overlap vs the REST OF THE CORPUS itself.

Scale shape (the part that must survive 10^12 docs):
  * Distinct grams per doc are built by the same codegen window shingler as
    dedup/decontamination (`text/dedup.py::_shingles`) — no Python, no UDF.
  * Document frequency per gram is ONE map-side-combined count shuffle keyed
    by the gram string. Grams are already distinct within a doc, so
    ``count(*)`` IS document frequency — no count-distinct buffer.
  * Membership comes back via a LEFT SEMI hash join of the exploded
    (doc, gram) frame against the >=min_docs gram set, keyed on the gram.
    The probe side's gram build (scan + explode) is recomputed rather than
    cached — a narrow all-codegen pipeline that is far cheaper than
    materializing an exploded corpus at 10^12 docs. Under AQE a small
    common-gram set broadcasts (the observed plan at test scale:
    BroadcastHashJoin LeftSemi); past broadcast size it degrades to a
    shuffled hash join on ``g``, the same key the frequency aggregation
    already spread, so skew stays bounded by true gram membership — linear
    fan-out, never quadratic.
  * No collect, no driver-side state, no per-doc O(n^2): hot boilerplate
    grams spread across reducers by gram value exactly like the repetition
    and decontamination shuffles.

Reference model: NannyML-style per-entity quality metrics
(`/root/reference/nannyml/data_quality/simple/metrics.py`) re-expressed as
corpus-level Spark aggregations; filter thresholds follow public practice
(Rae et al. 2021 table A1; Penedo et al. 2023 §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.text.dedup import _shingles_of, _tokens


def common_ngram_rate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-doc corpus-boilerplate stats:
    ``(id, n_grams, n_common, common_rate, flagged)``.

    ``n_grams``     = distinct word ``n``-grams in the doc (short docs
                      contribute their whole text as one gram — same
                      convention as every other shingler here),
    ``n_common``    = how many of those occur in >= ``min_docs`` docs
                      (the doc itself counts, so ``min_docs=2`` means
                      "shared with at least one OTHER document"),
    ``common_rate`` = n_common / n_grams (rounded to 9 for display),
    ``flagged``     = UNROUNDED rate >= ``threshold`` (IEEE division is
                      deterministic across engines, so oracles replicate).
    """
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            F.coalesce(F.col(text_col), F.lit("")).alias("_sv_txt"),
        )
        .select("id", _tokens("_sv_txt").alias("_t"))
        .select("id", F.array_distinct(_shingles_of("_t", n)).alias("s"))
    )
    ex = sh.select("id", F.explode("s").alias("g"))
    # distinct-per-doc grams => count(*) is document frequency
    dfreq = ex.groupBy("g").agg(F.count(F.lit(1)).alias("_df"))
    hits = (
        ex.join(dfreq.filter(F.col("_df") >= int(min_docs)), "g", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    base = sh.select("id", F.size("s").alias("n_grams"))
    rate = F.col("n_common") / F.col("n_grams")
    return (
        base.join(hits, "id", "left")
        .withColumn("n_common", F.coalesce(F.col("n_common"), F.lit(0)))
        .select(
            F.col("id").alias(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_common").cast("long").alias("n_common"),
            F.round(rate, 9).alias("common_rate"),
            (rate >= F.lit(float(threshold))).alias("flagged"),
        )
    )


class BoilerplateCheck:
    """Runner-compatible check: per-chunk boilerplate health — one result row
    per chunk and method:

      * ``boilerplate_doc_rate`` — fraction of the chunk's docs whose
        corpus-common-gram rate crosses ``threshold`` (the drop candidates),
      * ``mean_common_rate``     — chunk mean of the per-doc rate (a drift
        signal: a crawler snapshot suddenly full of templated chrome moves
        this before the doc rate trips).

    Metric computation is global (one gram-frequency shuffle for the whole
    frame via :func:`common_ngram_rate`); the per-chunk rates attribute each
    doc to ITS chunk. Alerts on a constant upper threshold (default 0.0 on
    the doc rate: any flagged doc alerts)."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        n: int = 5,
        min_docs: int = 2,
        threshold: float = 0.5,
        chunker=None,
        upper_threshold: float = 0.0,
    ):
        from spark_validate.chunking import DefaultChunker

        self.text_col = text_col
        self.id_col = id_col
        self.n = int(n)
        self.min_docs = int(min_docs)
        self.threshold = float(threshold)
        self.chunker = chunker or DefaultChunker()
        self.upper_threshold = upper_threshold

    def _stats(self, df: DataFrame) -> DataFrame:
        cached = getattr(self, "_stats_cache", None)
        if cached is not None and cached[0] is df:
            return cached[1]
        out = common_ngram_rate(
            df,
            text_col=self.text_col,
            id_col=self.id_col,
            n=self.n,
            min_docs=self.min_docs,
            threshold=self.threshold,
        )
        self._stats_cache = (df, out)
        return out

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        from spark_validate.calculators.base import assign_chunks
        from spark_validate.checks.constraints import _attach_const_threshold
        from spark_validate.chunking import CHUNK_KEY

        assigned, headers = assign_chunks(df, self.chunker)
        stats = self._stats(df).withColumnRenamed(self.id_col, "_sid")
        joined = assigned.join(stats, assigned[self.id_col] == stats["_sid"], "left")
        wide = joined.groupBy(CHUNK_KEY).agg(
            F.count(F.lit(1)).alias("__rows"),
            F.count(F.when(F.col("flagged"), F.lit(1))).cast("double").alias("_nflag"),
            F.avg("common_rate").alias("_mean_rate"),
        )
        long_df = wide.select(
            CHUNK_KEY,
            F.lit(self.text_col).alias("column_name"),
            F.lit("boilerplate_doc_rate").alias("method"),
            (F.col("_nflag") / F.col("__rows")).cast("double").alias("value"),
        ).unionByName(
            wide.select(
                CHUNK_KEY,
                F.lit(self.text_col).alias("column_name"),
                F.lit("mean_common_rate").alias("method"),
                F.col("_mean_rate").cast("double").alias("value"),
            )
        )
        out = _attach_const_threshold(long_df, headers, period, None, self.upper_threshold)
        from spark_validate.calculators.base import strip_informational

        # only the doc rate alerts; mean_common_rate is informational — any
        # corpus where two docs share one n-gram has a positive mean, so the
        # doc-rate threshold would fire on it spuriously
        return strip_informational(out, "boilerplate_doc_rate")

    def violations(self, df: DataFrame, row_id=None) -> DataFrame:
        from spark_validate.chunking import CHUNK_KEY

        assigned = self.chunker.assign(df).select(
            F.col(self.id_col).alias("_aid"), F.col(CHUNK_KEY).alias("chunk_key")
        )
        offenders = self._stats(df).filter(F.col("flagged"))
        return (
            offenders.join(assigned, offenders[self.id_col] == assigned["_aid"])
            .select(
                F.lit("boilerplate").alias("check"),
                F.lit(self.text_col).alias("column_name"),
                "chunk_key",
                F.col(self.id_col).cast("string").alias("row_id"),
                F.lit("common_ngram_rate_over_limit").alias("violation_kind"),
                F.col("common_rate").cast("string").alias("observed_value"),
            )
        )
