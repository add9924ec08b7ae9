"""Corpus-frequency LINE deduplication — CCNet/RefinedWeb line-level dedup.

The web-corpus cleaning step that removes navigation chrome, cookie
banners and templated boilerplate WITHIN documents: split every doc into
lines, count in how many distinct documents each line occurs, and delete
from each doc the lines whose document frequency reaches ``min_docs``
(CCNet's paragraph-hash dedup, Wenzek et al. LREC 2020 §3.1; RefinedWeb
line-wise filtering, Penedo et al. 2023 §4.2). Unlike
``boilerplate.common_ngram_rate`` — which SCORES docs by their shared-span
fraction and drops whole documents — this op REWRITES the text, keeping
the unique content of otherwise-fine docs.

Scale shape (10^12 docs):
  * line split is codegen ``split``/``posexplode`` — no Python;
  * document frequency is the exact-cardinality two-level collapse:
    ``groupBy(line, doc)`` folds within-doc copies map-side, then
    ``groupBy(line)`` counts docs — the hot boilerplate line becomes one
    row per partition before the shuffle;
  * removal is a LEFT join of the exploded frame against the ≥min_docs
    line set on the line key (AQE broadcasts a small common set; past
    broadcast size it degrades to a shuffled hash join on the same key
    the frequency aggregation already spread);
  * reassembly is ONE ``groupBy(doc)`` whose ``collect_list`` is bounded
    by the document's own line count — per-doc state, never corpus state.

Determinism: line membership is exact string equality; reassembly orders
by the original line position (``array_sort`` over (pos, line) structs),
so output text is byte-stable at any parallelism and a DuckDB oracle
replicates it with ``string_agg(... ORDER BY pos)``.

Semantics:
  * lines shorter than ``min_line_chars`` (default 1 → empty lines) are
    never counted and never removed — document structure survives;
  * eligibility is a pure function of the line text, so an ineligible
    line can never collide with a common (eligible) one;
  * a doc whose every line is removed keeps an empty-string text (callers
    drop it via the curation stage's ``min_remaining``).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_frequencies(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n",
    min_line_chars: int = 1,
) -> DataFrame:
    """(line, doc_freq) for every eligible line: in how many DISTINCT
    documents does the line occur."""
    lines = df.select(
        F.col(id_col).alias("_sv_id"),
        F.explode(F.split(F.col(text_col), re.escape(delimiter), -1)).alias("line"),
    ).filter(F.length("line") >= min_line_chars)
    return (
        lines.groupBy("line", "_sv_id")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n",
    min_docs: int = 2,
    min_line_chars: int = 1,
    frequencies: Optional[DataFrame] = None,
) -> DataFrame:
    """Rewrite ``text_col`` with corpus-common lines removed.

    Returns the input frame (all other columns untouched) with the text
    rewritten plus ``lines_total`` / ``lines_removed`` / ``lines_kept``
    (kept ELIGIBLE lines — short/structural lines are in neither removed
    nor kept). ``frequencies`` lets a caller reuse / pre-filter a
    :func:`line_frequencies` frame (e.g. computed over survivors only)."""
    freq = (
        frequencies
        if frequencies is not None
        else line_frequencies(df, text_col, id_col, delimiter, min_line_chars)
    )
    common = freq.filter(F.col("doc_freq") >= min_docs).select(
        "line", F.lit(True).alias("_sv_common")
    )
    exploded = df.select(
        F.col(id_col).alias("_sv_id"),
        F.posexplode(F.split(F.col(text_col), re.escape(delimiter), -1)).alias(
            "pos", "line"
        ),
    )
    eligible = F.length("line") >= min_line_chars
    marked = exploded.join(common, "line", "left").withColumn(
        "_sv_drop", eligible & F.coalesce(F.col("_sv_common"), F.lit(False))
    )
    rebuilt = marked.groupBy("_sv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("_sv_drop"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            delimiter,
        ).alias("_sv_new_text"),
        F.count(F.lit(1)).alias("lines_total"),
        F.count(F.when(F.col("_sv_drop"), F.lit(1))).alias("lines_removed"),
        F.count(F.when(eligible & ~F.col("_sv_drop"), F.lit(1))).alias("lines_kept"),
    )
    out = df.join(rebuilt, df[id_col] == rebuilt["_sv_id"], "left")
    return out.select(
        *[c for c in df.columns if c != text_col],
        F.coalesce(F.col("_sv_new_text"), F.col(text_col)).alias(text_col),
        F.coalesce(F.col("lines_total"), F.lit(0)).alias("lines_total"),
        F.coalesce(F.col("lines_removed"), F.lit(0)).alias("lines_removed"),
        F.coalesce(F.col("lines_kept"), F.lit(0)).alias("lines_kept"),
    )
