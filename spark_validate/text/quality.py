"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, fingerprinting. All JVM-side column expressions (no UDFs) —
these run over every document at corpus scale, so they must stay inside
whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny stopword profiles — the n-gram/stopword-ratio heuristic; not a model
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "他"],
}

_P57 = (1 << 57) - 13  # prime < 2^57 so acc*31 + h stays inside int64 (ANSI)


def _tokens(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """token_count, char_count, avg_token_len, space_ratio, upper_ratio,
    digit_ratio, punct_ratio — single projection, fully codegen'd."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_space = n_chars - F.length(F.regexp_replace(t, r" ", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?'\"()\[\]{}-]", ""))
    tokens = n_space + 1
    return (
        df.withColumn("token_count", tokens.cast("long"))
        .withColumn("char_count", n_chars.cast("long"))
        .withColumn("avg_token_len", (n_chars - n_space).cast("double") / tokens)
        .withColumn("space_ratio", n_space.cast("double") / F.greatest(n_chars, F.lit(1)))
        .withColumn("upper_ratio", n_upper.cast("double") / F.greatest(n_chars, F.lit(1)))
        .withColumn("digit_ratio", n_digit.cast("double") / F.greatest(n_chars, F.lit(1)))
        .withColumn("punct_ratio", n_punct.cast("double") / F.greatest(n_chars, F.lit(1)))
    )


# GPT-2-style pretokenizer, simplified to the Java↔RE2-identical dialect
# (the original uses a negative lookahead RE2 lacks): contraction suffixes,
# letter runs, digit runs, punctuation/symbol runs. Whitespace is not a
# token. One outer capture group — extracted as group 1 on both engines.
# Whitespace is spelled as an explicit class, NOT \s: Java's \s includes
# vertical tab (\x0B) while RE2's does not, so \s inside the negated class
# would make the two engines disagree on any text containing a VT.
BPE_TOKEN_PATTERN = r"('(?:s|t|re|ve|m|ll|d)|\p{L}+|\p{N}+|[^ \t\n\x0B\f\r\p{L}\p{N}]+)"


def with_bpe_token_count(
    df: DataFrame, text_col: str = "text", out_col: str = "bpe_token_count"
) -> DataFrame:
    """Subword-style token count — the 'BPE-ish regex' counter that
    approximates an LLM tokenizer's token count far better than whitespace
    splitting (punctuation, contractions and digit runs count separately).
    Pure codegen regexp_extract_all; narrow, no shuffle."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.withColumn(
        out_col, F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_PATTERN), F.lit(1))).cast("long")
    )


def with_language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-ratio language heuristic: per language, the fraction of tokens
    hitting its stopword profile; argmax wins ('und' when nothing hits)."""
    toks = _tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    scores = []
    for lang, words in _STOPWORDS.items():
        # occurrence-weighted (set-based intersect would undercount repeats)
        occ = F.size(F.filter(toks, lambda x: x.isin(words)))
        scores.append(F.struct((occ.cast("double") / n).alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col, F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    ).withColumn(out_col + "_score", best["score"])


def with_quality_score(df: DataFrame, text_col: str = "text", out_col: str = "quality_score") -> DataFrame:
    """Heuristic quality in [0,1]: length band + sane token length + low
    digit/punct noise + stopword presence. Composable with filters for corpus
    cleaning; every term is a codegen'd expression."""
    feats = with_text_features(df, text_col)
    if "lang_pred_score" not in feats.columns:
        feats = with_language_id(feats, text_col)
    length_term = F.least(F.col("char_count").cast("double") / 200.0, F.lit(1.0))
    token_len_ok = F.when((F.col("avg_token_len") >= 3) & (F.col("avg_token_len") <= 12), 1.0).otherwise(0.3)
    noise_term = F.greatest(F.lit(0.0), F.lit(1.0) - 2.0 * (F.col("digit_ratio") + F.col("punct_ratio")))
    stop_term = F.least(F.col("lang_pred_score") * 5.0, F.lit(1.0))
    score = (0.3 * length_term + 0.2 * token_len_ok + 0.2 * noise_term + 0.3 * stop_term).cast("double")
    return feats.withColumn(out_col, score)


def with_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Order-sensitive rolling document fingerprint: fold token hashes through
    h ← (31·h + hash(token)) mod p — a polynomial rolling hash evaluated with
    ``aggregate`` over the token array, entirely JVM-side."""
    toks = _tokens(text_col)
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(31) + F.pmod(F.xxhash64(x), F.lit(_P57)), F.lit(_P57)),
    )
    return df.withColumn(out_col, fp)


def _ngram_array(words, n: int):
    """Word n-grams of an already-split token array, as space-joined strings.
    zip_with over shifted slices — pure codegen, no UDF, no explode."""
    if n == 1:
        return words
    out = F.slice(words, 1, F.greatest(F.size(words) - (n - 1), F.lit(0)))
    for i in range(1, n):
        nxt = F.slice(words, i + 1, F.greatest(F.size(words) - (n - 1), F.lit(0)))
        out = F.zip_with(out, nxt, lambda a, b: F.concat(a, F.lit(" "), b))
    return out


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngrams: tuple = (2, 3),
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1,
    'repetitious text' filters; reference model: NannyML-style per-entity
    quality metrics re-expressed as Spark aggregations).

    Returns one row per document:
      * ``n_words``          — non-empty whitespace tokens
      * ``dup_word_frac``    — fraction of tokens that are repeats of an
        earlier token: (n_words − n_distinct) / n_words
      * ``top_word_frac``    — occurrences of the most frequent token / n_words
      * ``dup_line_frac``    — (n_lines − n_distinct_lines) / n_lines
        (0 for single-line text)
      * ``top_{n}gram_frac`` per n in ``ngrams`` — occurrences of the most
        frequent word-n-gram / total n-gram count (NULL when the doc has
        fewer than n words)

    Scale shape: one long (doc, gram-kind, gram) frame — lines are kind 0,
    unigrams kind 1, n-grams kind n+1 — reduced by ONE map-side-combined
    count shuffle keyed by the gram itself, then ONE per-doc pivot
    aggregation. No joins between kinds, no per-doc O(n²) higher-order
    scans, no collect; a doc's grams are its own shuffle keys, so
    corpus-wide hot words never concentrate on one reducer. dup/top
    fractions are single int→double divisions (bit-identical across
    engines)."""
    toks = F.filter(_tokens(text_col), lambda x: x != "")
    lines = F.filter(F.split(F.col(text_col), r"\n"), lambda x: F.trim(x) != "")

    base = df.select(F.col(id_col).alias("_id"), toks.alias("_w"), lines.alias("_l"))

    gram_frames = [
        base.select("_id", F.lit(0).alias("_k"), F.explode("_l").alias("_g")),
        base.select("_id", F.lit(1).alias("_k"), F.explode("_w").alias("_g")),
    ]
    for n in ngrams:
        if n < 1:
            raise ValueError(f"ngram sizes must be >= 1, got {n}")
        # kind = n + 1: kinds 0/1 are reserved for lines/unigrams, so an
        # explicit 1-gram request gets its own bucket instead of silently
        # doubling the unigram totals (and corrupting every word fraction)
        gram_frames.append(
            base.select(
                "_id", F.lit(n + 1).alias("_k"), F.explode(_ngram_array(F.col("_w"), n)).alias("_g")
            )
        )
    grams = gram_frames[0]
    for f in gram_frames[1:]:
        grams = grams.unionByName(f)

    counts = grams.groupBy("_id", "_k", "_g").agg(F.count(F.lit(1)).alias("_c"))

    def _tot(k):
        return F.sum(F.when(F.col("_k") == k, F.col("_c")))

    def _top(k):
        return F.max(F.when(F.col("_k") == k, F.col("_c")))

    def _dst(k):
        return F.count(F.when(F.col("_k") == k, F.lit(1)))

    aggs = [
        _tot(1).alias("_nw"),
        _dst(1).alias("_dw"),
        _top(1).alias("_tw"),
        _tot(0).alias("_nl"),
        _dst(0).alias("_dl"),
    ]
    for n in ngrams:
        aggs += [_tot(n + 1).alias(f"_t{n}"), _top(n + 1).alias(f"_m{n}")]
    per_doc = counts.groupBy("_id").agg(*aggs)

    out_cols = [
        F.coalesce(F.col("_nw"), F.lit(0)).cast("long").alias("n_words"),
        ((F.col("_nw") - F.col("_dw")).cast("double") / F.col("_nw")).alias("dup_word_frac"),
        (F.col("_tw").cast("double") / F.col("_nw")).alias("top_word_frac"),
        ((F.col("_nl") - F.col("_dl")).cast("double") / F.col("_nl")).alias("dup_line_frac"),
    ]
    for n in ngrams:
        out_cols.append(
            (F.col(f"_m{n}").cast("double") / F.col(f"_t{n}")).alias(f"top_{n}gram_frac")
        )
    # left join back so empty/whitespace-only docs keep a row (NULL fracs)
    ids = df.select(F.col(id_col).alias("_id"))
    return (
        ids.join(per_doc, "_id", "left")
        .select(F.col("_id").alias(id_col), *out_cols)
    )


# Gopher (Rae et al. 2021, table A1) repetition filter limits, word-level
GOPHER_REPETITION_RULES = {
    "dup_line_frac": 0.30,
    "top_2gram_frac": 0.20,
    "top_3gram_frac": 0.18,
}


class RepetitionCheck:
    """Runner-compatible check: per-chunk rate of documents whose repetition
    signals exceed the configured Gopher-style limits — one result row per
    (chunk, rule) with value = fraction of the chunk's docs over that rule's
    max, plus violation rows naming each offending doc, rule, and observed
    fraction. Metric computation is global (one gram-count shuffle for the
    whole frame via ``repetition_stats``); the per-chunk rate attributes
    each doc to ITS chunk. Alerts on a constant upper threshold (default
    0.0: any over-limit doc alerts)."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        rules: dict | None = None,
        chunker=None,
        upper_threshold: float = 0.0,
    ):
        from spark_validate.chunking import DefaultChunker

        self.text_col = text_col
        self.id_col = id_col
        self.rules = dict(rules or GOPHER_REPETITION_RULES)
        self.chunker = chunker or DefaultChunker()
        self.upper_threshold = upper_threshold
        ns = sorted(
            int(m.split("_")[1].rstrip("gramfrc")) for m in self.rules if "gram_frac" in m
        )
        self._ngrams = tuple(ns) or (2,)

    def _stats(self, df: DataFrame) -> DataFrame:
        cached = getattr(self, "_stats_cache", None)
        if cached is not None and cached[0] is df:
            return cached[1]
        out = repetition_stats(
            df, text_col=self.text_col, id_col=self.id_col, ngrams=self._ngrams
        )
        self._stats_cache = (df, out)
        return out

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        from spark_validate.calculators.base import assign_chunks
        from spark_validate.checks.constraints import _attach_const_threshold
        from spark_validate.chunking import CHUNK_KEY

        assigned, headers = assign_chunks(df, self.chunker)
        stats = self._stats(df).withColumnRenamed(self.id_col, "_sid")
        joined = assigned.join(
            stats, assigned[self.id_col] == stats["_sid"], "left"
        )
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for metric, limit in sorted(self.rules.items()):
            aggs.append(
                F.count(F.when(F.col(metric) > limit, F.lit(1))).cast("double").alias(metric)
            )
        wide = joined.groupBy(CHUNK_KEY).agg(*aggs)
        long_parts = [
            wide.select(
                CHUNK_KEY,
                F.lit(self.text_col).alias("column_name"),
                F.lit(f"{metric}_rate").alias("method"),
                (F.col(metric) / F.col("__rows")).cast("double").alias("value"),
            )
            for metric in sorted(self.rules)
        ]
        long_df = long_parts[0]
        for p in long_parts[1:]:
            long_df = long_df.unionByName(p)
        return _attach_const_threshold(long_df, headers, period, None, self.upper_threshold)

    def violations(self, df: DataFrame, row_id=None) -> DataFrame:
        from spark_validate.chunking import CHUNK_KEY

        assigned = self.chunker.assign(df).select(
            F.col(self.id_col).alias("_aid"), F.col(CHUNK_KEY).alias("chunk_key")
        )
        stats = self._stats(df)
        parts = []
        for metric, limit in sorted(self.rules.items()):
            parts.append(
                stats.filter(F.col(metric) > limit).select(
                    F.col(self.id_col),
                    F.lit(metric).alias("_metric"),
                    F.col(metric).cast("string").alias("_observed"),
                )
            )
        offenders = parts[0]
        for p in parts[1:]:
            offenders = offenders.unionByName(p)
        return (
            offenders.join(assigned, offenders[self.id_col] == assigned["_aid"])
            .select(
                F.lit("repetition").alias("check"),
                F.lit(self.text_col).alias("column_name"),
                "chunk_key",
                F.col(self.id_col).cast("string").alias("row_id"),
                F.concat(F.col("_metric"), F.lit("_over_limit")).alias("violation_kind"),
                F.col("_observed").alias("observed_value"),
            )
        )


# -- Gopher document-quality rules ---------------------------------------------
#
# The named heuristic battery from Rae et al. 2021 (Gopher, §A1.1 "quality
# filtering"), the de-facto standard web-corpus gate (reused by MassiveText,
# RefinedWeb, Dolma). Every rule is ONE Catalyst SQL expression (codegen,
# no UDF, narrow — the whole battery is a single projection over the corpus),
# expressed as SQL TEXT so the same strings feed three consumers:
# `with_gopher_flags` (per-doc flag columns), `ComplianceCheck` via
# `gopher_compliance_rules` (per-chunk violation rates + violation rows,
# fusable into the suite's shared scan), and the curation `gopher_quality`
# stage (a conjunction filter). Reference model: NannyML has no document
# gate; the nearest machinery is the threshold/alert layer
# (`nannyml/thresholds.py`) these rules' rates plug into.

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_exprs(text_col: str, th: dict) -> dict:
    """rule name → boolean Spark-SQL expression TEXT ("complies" sense).
    NULL text yields NULL/failing rules (the compliance NULL-is-violation
    convention)."""
    t = f"coalesce({text_col}, '')"
    # non-empty whitespace tokens / non-blank lines
    W = f"filter(split({t}, '\\\\s+'), x -> x != '')"
    L = f"filter(split({t}, '\\n'), x -> trim(x) != '')"
    n = f"size({W})"
    nl = f"size({L})"
    char_sum = f"aggregate({W}, 0L, (a, x) -> a + length(x))"
    hash_cnt = f"(length({t}) - length(replace({t}, '#', '')))"
    ell_cnt = (
        f"((length({t}) - length(replace({t}, '...', ''))) / 3"
        f" + (length({t}) - length(replace({t}, '…', ''))))"
    )
    alpha = f"size(filter({W}, x -> x rlike '[A-Za-z]'))"
    # escape quotes/backslashes: stopwords is an override knob, and a word
    # like "don't" must not break the generated SQL literal
    stops = ", ".join(
        "'" + w.replace("\\", "\\\\").replace("'", "\\'") + "'" for w in th["stopwords"]
    )
    stop_hits = f"size(array_intersect(transform({W}, x -> lower(x)), array({stops})))"
    return {
        "word_count_range": f"{n} BETWEEN {th['min_words']} AND {th['max_words']}",
        "mean_word_length": (
            f"CASE WHEN {n} > 0 THEN CAST({char_sum} AS DOUBLE) / {n} END"
            f" BETWEEN {th['min_mean_word_len']} AND {th['max_mean_word_len']}"
        ),
        "symbol_word_ratio": (
            f"CASE WHEN {n} > 0 THEN ({hash_cnt} + {ell_cnt}) / {n} END"
            f" <= {th['max_symbol_word_ratio']}"
        ),
        "bullet_line_frac": (
            f"CASE WHEN {nl} > 0 THEN CAST(size(filter({L},"
            f" x -> trim(x) rlike '^[•\\\\-\\\\*]')) AS DOUBLE) / {nl} END"
            f" <= {th['max_bullet_line_frac']}"
        ),
        "ellipsis_line_frac": (
            f"CASE WHEN {nl} > 0 THEN CAST(size(filter({L},"
            f" x -> trim(x) rlike '(\\\\.\\\\.\\\\.|…)$')) AS DOUBLE) / {nl} END"
            f" <= {th['max_ellipsis_line_frac']}"
        ),
        "alpha_word_ratio": (
            f"CASE WHEN {n} > 0 THEN CAST({alpha} AS DOUBLE) / {n} END"
            f" >= {th['min_alpha_word_ratio']}"
        ),
        "stopword_hits": f"{stop_hits} >= {th['min_stopword_hits']}",
    }


def gopher_thresholds(**overrides) -> dict:
    """Published Gopher defaults; override any knob (e.g. ``min_words=10``
    for short-document corpora)."""
    th = {
        "min_words": 50,
        "max_words": 100_000,
        "min_mean_word_len": 3,
        "max_mean_word_len": 10,
        "max_symbol_word_ratio": 0.1,
        "max_bullet_line_frac": 0.9,
        "max_ellipsis_line_frac": 0.3,
        "min_alpha_word_ratio": 0.8,
        "min_stopword_hits": 2,
        "stopwords": GOPHER_STOPWORDS,
    }
    unknown = set(overrides) - set(th)
    if unknown:
        raise ValueError(f"unknown gopher threshold(s): {sorted(unknown)}")
    th.update(overrides)
    return th


def with_gopher_flags(
    df: DataFrame, text_col: str = "text", prefix: str = "gopher_", **overrides
) -> DataFrame:
    """One boolean column per Gopher rule (True = complies; NULL-guarded
    rules come back NULL on degenerate docs and fail the pass flag) plus
    ``{prefix}pass`` — the conjunction the curation gate filters on."""
    th = gopher_thresholds(**overrides)
    out = df
    pass_col = F.lit(True)
    for name, sql in _gopher_exprs(text_col, th).items():
        flag = F.expr(sql)
        out = out.withColumn(f"{prefix}{name}", flag)
        pass_col = pass_col & F.coalesce(flag, F.lit(False))
    return out.withColumn(f"{prefix}pass", pass_col)


def gopher_compliance_rules(text_col: str = "text", **overrides) -> dict:
    """The rule battery as `checks.compliance.ComplianceCheck` input —
    per-chunk violation rates, violation rows, and shared-scan fusion come
    from the existing machinery for free."""
    return dict(_gopher_exprs(text_col, gopher_thresholds(**overrides)))
