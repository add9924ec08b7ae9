"""Benchmark decontamination — n-gram overlap between a training corpus and
an evaluation/benchmark set.

Beyond-reference operator for training-data pipelines (NannyML has no text
ops; the practice is public: GPT-3 appendix C and Llama 2 report flagging
training documents that share long word n-grams with evaluation benchmarks).

Spark-first topology, sized for a 100 TB corpus vs a small benchmark:

* The benchmark n-gram universe is distinct-aggregated over the (small)
  benchmark side only and **broadcast** by default — the common case is a
  few thousand eval documents vs billions of training docs, so the per-doc
  membership test is a narrow map-side semi-join: no shuffle of the corpus
  by gram, no hot-gram skew (stopword-heavy grams like "of the" are hot
  keys only under a shuffle join; a broadcast join never shuffles them).
* Per-doc counts are ONE groupBy(id) over the semi-join survivors; docs
  with zero overlap re-enter via a left join keyed the same way, so the
  exchange is reused.
* With ``broadcast_benchmark=False`` (a benchmark too large to broadcast)
  the same plan runs as a shuffle hash join; AQE skew-join handles hot
  grams.

Everything is deterministic column expressions (tokenize → shingle →
md5-free string grams) — the DuckDB oracle replicates it exactly.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.text.dedup import _shingles_of, _tokens


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """Distinct word n-grams across the benchmark set — one column ``g``.

    Documents shorter than ``n`` tokens contribute their whole text as a
    single gram (same convention as the dedup shinglers, so a verbatim copy
    of a short benchmark doc still collides).
    """
    return (
        benchmark.select(F.coalesce(F.col(text_col), F.lit("")).alias("_sv_txt"))
        .select(_tokens("_sv_txt").alias("_t"))
        .select(F.explode(F.array_distinct(_shingles_of("_t", n))).alias("g"))
        # a NULL/blank benchmark row would otherwise contribute the
        # empty-string gram, marking EVERY empty/NULL corpus doc 100%
        # contaminated — missing benchmark text is missing data, not a gram
        # (the dedup.py NULL-text convention)
        .filter(F.col("g") != "")
        .distinct()
    )


def _doc_grams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.coalesce(F.col(text_col), F.lit("")).alias("_sv_txt"),
        )
        .select("id", _tokens("_sv_txt").alias("_t"))
        .select("id", F.array_distinct(_shingles_of("_t", n)).alias("s"))
    )


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-training-doc benchmark contamination:
    ``(id, n_ngrams, n_overlap, overlap_rate, contaminated)``.

    ``n_ngrams``  = distinct word ``n``-grams in the doc,
    ``n_overlap`` = how many of them occur anywhere in the benchmark set,
    ``contaminated`` = ``overlap_rate >= threshold``. A verbatim copy of a
    benchmark document scores 1.0; ``threshold`` tunes how aggressive the
    drop is (public practice uses long n-grams, n=8..13, with low
    thresholds).
    """
    bench = benchmark_ngrams(benchmark, text_col=text_col, n=n)
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    sh = _doc_grams(docs, text_col, id_col, n)
    base = sh.select("id", F.size("s").alias("n_ngrams"))
    hits = (
        sh.select("id", F.explode("s").alias("g"))
        .join(bench, "g", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    rate = F.col("n_overlap") / F.col("n_ngrams")
    return (
        base.join(hits, "id", "left")
        .withColumn("n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)))
        .withColumn("overlap_rate", F.round(rate, 9))
        .withColumn("contaminated", rate >= F.lit(float(threshold)))
    )


def streaming_ngram_contamination(
    stream: DataFrame,
    benchmark: DataFrame,
    ts_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
    window_duration: str = "1 hour",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Contaminated-document stream: validate a corpus INGEST stream against
    a static benchmark set in-flight.

    Topology (all streaming-legal, nothing stateful beyond the windowed agg):
    watermark on the raw stream (BEFORE any filtering join, so clean docs
    still advance event time) → explode the stream's n-grams →
    **stream-static LEFT SEMI join** against the broadcast benchmark gram
    universe (stateless — no stream state) → one ``groupBy(window, id)``
    counting surviving grams (``n_ngrams`` rides along via ``first``).
    Zero-overlap documents never survive the semi join, so the aggregate
    only ever holds state for documents that touch the benchmark at all —
    the stream analog of emitting violations, not verdicts-for-everyone.
    Emits one append-mode row per contaminated doc once its window closes.
    """
    wm = watermark or window_duration
    bench = F.broadcast(benchmark_ngrams(benchmark, text_col=text_col, n=n))
    sh = (
        stream.select(
            F.col(id_col).alias("id"),
            F.col(ts_col).alias("_sv_ts"),
            F.coalesce(F.col(text_col), F.lit("")).alias("_sv_txt"),
        )
        # watermark BEFORE the semi join: rows the join drops (clean docs)
        # must still advance event time, or a stream of clean documents
        # would never close any window
        .withWatermark("_sv_ts", wm)
        .select("id", "_sv_ts", _tokens("_sv_txt").alias("_t"))
        .select("id", "_sv_ts", F.array_distinct(_shingles_of("_t", n)).alias("s"))
    )
    ex = sh.select("id", "_sv_ts", F.size("s").alias("n_ngrams"), F.explode("s").alias("g"))
    hits = ex.join(bench, "g", "left_semi")
    agg = (
        hits
        .groupBy(F.window("_sv_ts", window_duration).alias("window"), F.col("id"))
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.first("n_ngrams").alias("n_ngrams"),
        )
    )
    rate = F.col("n_overlap") / F.col("n_ngrams")
    return (
        agg.filter(rate >= F.lit(float(threshold)))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col("id").cast("string").alias("row_id"),
            F.col("n_ngrams"),
            F.col("n_overlap"),
            F.round(rate, 9).alias("overlap_rate"),
            F.lit("benchmark_contamination").alias("violation_kind"),
        )
    )


class DecontaminationCheck:
    """Runner-compatible check: per-chunk rate of training documents whose
    n-gram overlap with the configured benchmark set crosses ``threshold``,
    plus violation rows naming each contaminated doc's overlap. Alerts on a
    constant upper threshold (default 0.0: any contamination alerts) —
    same contract as ``TextDedupCheck`` / ``PhashDedupCheck``."""

    def __init__(
        self,
        benchmark: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        n: int = 5,
        threshold: float = 0.5,
        chunker=None,
        upper_threshold: float = 0.0,
        broadcast_benchmark: bool = True,
    ):
        from spark_validate.chunking import DefaultChunker

        self.benchmark = benchmark
        self.text_col = text_col
        self.id_col = id_col
        self.n = n
        self.threshold = threshold
        self.chunker = chunker or DefaultChunker()
        self.upper_threshold = upper_threshold
        self.broadcast_benchmark = broadcast_benchmark

    def _contaminated(self, df: DataFrame) -> DataFrame:
        return ngram_overlap(
            df,
            self.benchmark,
            text_col=self.text_col,
            id_col=self.id_col,
            n=self.n,
            threshold=self.threshold,
            broadcast_benchmark=self.broadcast_benchmark,
        ).filter(F.col("contaminated"))

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        from spark_validate.checks.contamination import contamination_rate

        bad = self._contaminated(df).select(F.col("id").alias("_id"))
        return contamination_rate(
            df, self.chunker, bad, self.id_col, self.text_col,
            "contamination_rate", self.upper_threshold, period,
        )

    def violations(self, df: DataFrame, row_id=None) -> DataFrame:
        from spark_validate.chunking import CHUNK_KEY

        assigned = self.chunker.assign(df).select(
            F.col(self.id_col).alias("id"), F.col(CHUNK_KEY).alias("chunk_key")
        )
        return (
            self._contaminated(df)
            .join(assigned, "id")
            .select(
                F.lit("decontamination").alias("check"),
                F.lit(self.text_col).alias("column_name"),
                "chunk_key",
                F.col("id").cast("string").alias("row_id"),
                F.lit("benchmark_contamination").alias("violation_kind"),
                F.concat(
                    F.lit("overlap_rate="), F.round("overlap_rate", 4).cast("string"),
                    F.lit(" n_overlap="), F.col("n_overlap").cast("string"),
                ).alias("observed_value"),
            )
        )
