"""Gopher repetition-removal battery — the second half of the Rae et al.
2021 filter set (§A1.1 "repetition removal", Table A1): documents dominated
by repeated lines, paragraphs, or n-grams are boilerplate/spam and poison
LLM training mixes.  Reused verbatim by MassiveText, RefinedWeb, Dolma and
DataTrove, so the rule NAMES and published CAPS here are the de-facto
standard.

Thirteen per-document fractions, each ONE Catalyst SQL expression over the
document's own text (higher-order array functions — `array_sort` + an
`aggregate` run-length scan; JVM-side, zero Python, zero shuffle: every
statistic depends only on its own row, so the whole battery is a narrow
projection that scales embarrassingly to 10^12 docs):

* ``dup_line_frac`` / ``dup_para_frac`` — fraction of lines (paragraphs)
  that are repeats of an earlier identical line (occurrences beyond the
  first, over trimmed non-blank elements).
* ``dup_line_char_frac`` / ``dup_para_char_frac`` — character mass of those
  repeats over the total character mass of all lines (paragraphs).
* ``top_{2,3,4}gram_char_frac`` — characters covered by the single most
  frequent word n-gram (count × gram length, over ``length(text)``); 0.0
  when no n-gram occurs twice — a gram seen once is not repetition, and
  scoring it would auto-fail every short clean document (DataTrove's
  implementation skips the count-1 case the same way).
* ``dup_{5..10}gram_char_frac`` — character mass of n-gram occurrences
  beyond each gram's first (over ``length(text)``).

Conventions (documented because the paper leaves them ambiguous; the DuckDB
oracle in ``__spark_entry__`` mirrors each one bit-exactly):

* words = non-empty ``\\s+`` tokens; grams joined with a single space and
  measured by ``length`` of the joined string; denominators for gram rules
  use ``length(text)`` (whitespace included) and the fraction is clamped to
  1.0 — overlapping occurrences can otherwise exceed the text length (the
  reference implementations either clamp or dedup character spans; we clamp
  and say so).
* top-gram ties on count are broken toward the LONGER gram (maximizes the
  reported coverage; deterministic — equal count and equal length give the
  same product regardless of which gram "wins").
* degenerate inputs (no lines / fewer than n words / empty text) yield NULL
  fractions; under the compliance NULL-is-violation convention a NULL
  fraction fails the gate, same as the word-count rule already does.

Reference model: NannyML has no corpus gate; the rates these rules emit
plug into the same threshold/alert layer (`nannyml/thresholds.py`) as every
other check.  Rule caps from Rae et al. 2021 Table A1.

Sibling: ``quality.py::repetition_stats`` reports COUNT-fraction signals
(dup-word / top-word / top-gram occurrence shares) via one gram-keyed
shuffle; this module reports the paper's CHARACTER-fraction rules with
their published caps and needs no shuffle at all — prefer it as the
curation gate, and the sibling when you want the gram-level count
breakdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "repetition_thresholds",
    "with_repetition_stats",
    "repetition_compliance_rules",
]

#: published caps from Gopher Table A1 (repetition removal)
_DEFAULTS = {
    "max_dup_line_frac": 0.30,
    "max_dup_para_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_dup_para_char_frac": 0.20,
    "max_top_2gram_char_frac": 0.20,
    "max_top_3gram_char_frac": 0.18,
    "max_top_4gram_char_frac": 0.16,
    "max_dup_5gram_char_frac": 0.15,
    "max_dup_6gram_char_frac": 0.14,
    "max_dup_7gram_char_frac": 0.13,
    "max_dup_8gram_char_frac": 0.12,
    "max_dup_9gram_char_frac": 0.11,
    "max_dup_10gram_char_frac": 0.10,
}


def repetition_thresholds(**overrides) -> dict:
    """Published Gopher repetition caps; override any knob by name."""
    th = dict(_DEFAULTS)
    unknown = set(overrides) - set(th)
    if unknown:
        raise ValueError(f"unknown repetition threshold(s): {sorted(unknown)}")
    th.update(overrides)
    return th


def _dup_scan(arr: str) -> tuple[str, str]:
    """(dup_count, dup_chars) SQL over a string array: occurrences beyond
    each element's first, via ONE adjacent-equal `aggregate` pass over the
    sorted copy.  The array argument of `aggregate` is evaluated once per
    row — an index-lambda formulation (`filter(sequence(...), i ->
    element_at(S, i) ...)`) re-derives S per element, which measured ~60×
    slower on gram arrays."""
    s = f"array_sort({arr})"
    dup = "a.prev IS NOT NULL AND x = a.prev"
    scan = (
        f"aggregate({s},"
        f" named_struct('prev', CAST(NULL AS STRING), 'dn', 0, 'dch', 0L),"
        f" (a, x) -> named_struct("
        f"   'prev', x,"
        f"   'dn', a.dn + IF({dup}, 1, 0),"
        f"   'dch', a.dch + IF({dup}, CAST(length(x) AS BIGINT), 0L)),"
        f" a -> named_struct('dn', a.dn, 'dch', a.dch))"
    )
    return f"{scan}.dn", f"{scan}.dch"


def _top_run(arr: str) -> str:
    """SQL for struct(cnt, len) of the most frequent element of a string
    array (ties on count → longer element), via a run-length scan of the
    sorted copy.  The run expression is repeated inline — SQL lambdas have
    no let-binding."""
    s = f"array_sort({arr})"
    run = "IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, 1)"
    better = f"({run} > a.bc OR ({run} = a.bc AND length(x) > a.bl))"
    return (
        f"aggregate({s},"
        f" named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'bc', 0, 'bl', 0),"
        f" (a, x) -> named_struct("
        f"   'prev', x,"
        f"   'run', {run},"
        f"   'bc', IF({better}, {run}, a.bc),"
        f"   'bl', IF({better}, length(x), a.bl)),"
        f" a -> named_struct('cnt', a.bc, 'len', a.bl))"
    )


def _elems(split_expr: str) -> str:
    """Trimmed non-blank elements of a split."""
    return f"filter(transform({split_expr}, x -> trim(x)), x -> x != '')"


def _grams(words: str, n: int) -> str:
    """Word n-gram array (space-joined), empty when the doc is too short."""
    return (
        f"CASE WHEN size({words}) >= {n} THEN"
        f" transform(sequence(1, size({words}) - {n} + 1),"
        f" i -> concat_ws(' ', slice({words}, i, {n})))"
        f" ELSE array_repeat('', 0) END"
    )


def repetition_fracs(
    text_col: str,
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
) -> dict:
    """rule-stem → double-valued Spark-SQL fraction expression TEXT.
    NULL on degenerate docs (no lines / too few words / empty text)."""
    t = f"coalesce({text_col}, '')"
    words = _elems(f"split({t}, '\\\\s+')")
    out = {}
    for stem, arr in (
        ("dup_line", _elems(f"split({t}, '\\n')")),
        ("dup_para", _elems(f"split({t}, '\\n{{2,}}')")),
    ):
        cnt, chars = _dup_scan(arr)
        total_chars = f"aggregate({arr}, 0L, (a, x) -> a + length(x))"
        out[f"{stem}_frac"] = (
            f"CASE WHEN size({arr}) > 0 THEN CAST({cnt} AS DOUBLE) / size({arr}) END"
        )
        out[f"{stem}_char_frac"] = (
            f"CASE WHEN {total_chars} > 0 THEN"
            f" CAST({chars} AS DOUBLE) / {total_chars} END"
        )
    for n in top_ns:
        top = _top_run(_grams(words, n))
        out[f"top_{n}gram_char_frac"] = (
            f"CASE WHEN length({t}) > 0 AND size({words}) >= {n} THEN"
            f" IF({top}.cnt >= 2, least(CAST(1.0 AS DOUBLE),"
            f" CAST({top}.cnt AS DOUBLE) * {top}.len / length({t})),"
            f" CAST(0.0 AS DOUBLE)) END"
        )
    for n in dup_ns:
        _, chars = _dup_scan(_grams(words, n))
        out[f"dup_{n}gram_char_frac"] = (
            f"CASE WHEN length({t}) > 0 AND size({words}) >= {n} THEN"
            f" least(CAST(1.0 AS DOUBLE), CAST({chars} AS DOUBLE) / length({t})) END"
        )
    return out


def _family_scan(arr: str) -> str:
    """One `aggregate` pass over the sorted array emitting
    struct(n, chars, dn, dch): total elements, total chars, duplicate
    occurrences beyond first, and their character mass."""
    s = f"array_sort({arr})"
    dup = "a.prev IS NOT NULL AND x = a.prev"
    return (
        f"aggregate({s},"
        f" named_struct('prev', CAST(NULL AS STRING), 'n', 0, 'chars', 0L,"
        f"              'dn', 0, 'dch', 0L),"
        f" (a, x) -> named_struct("
        f"   'prev', x,"
        f"   'n', a.n + 1,"
        f"   'chars', a.chars + CAST(length(x) AS BIGINT),"
        f"   'dn', a.dn + IF({dup}, 1, 0),"
        f"   'dch', a.dch + IF({dup}, CAST(length(x) AS BIGINT), 0L)),"
        f" a -> named_struct('n', a.n, 'chars', a.chars, 'dn', a.dn, 'dch', a.dch))"
    )


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", prefix: str = "rep_", **overrides
) -> DataFrame:
    """One double column per repetition fraction plus ``{prefix}pass`` —
    True only when EVERY fraction is non-NULL and under its published cap
    (the curation gate's conjunction).

    Fast path: the word array and each rule family's single-pass scan
    struct land in intermediate columns, so every array is tokenized,
    gram-built and sorted ONCE per row; the fractions are cheap field
    extractions.  (`CollapseProject` does not inline expensive expressions
    with multiple downstream references, so the staging survives
    optimization — measured ~40× over evaluating the self-contained
    `repetition_fracs` expressions per output column.)"""
    th = repetition_thresholds(**overrides)
    t = f"coalesce({text_col}, '')"
    words = _elems(f"split({t}, '\\\\s+')")
    tmp = {
        "_rep_len": f"length({t})",
        "_rep_W": words,
        "_rep_line": _family_scan(_elems(f"split({t}, '\\n')")),
        "_rep_para": _family_scan(_elems(f"split({t}, '\\n{{2,}}')")),
    }
    for n in (2, 3, 4):
        tmp[f"_rep_top{n}"] = _top_run(_grams("_rep_W", n))
    for n in (5, 6, 7, 8, 9, 10):
        tmp[f"_rep_dup{n}"] = _family_scan(_grams("_rep_W", n))
    out = df
    for name, sql in tmp.items():
        out = out.withColumn(name, F.expr(sql))
    fracs = {}
    for stem in ("line", "para"):
        s = f"_rep_{stem}"
        fracs[f"dup_{stem}_frac"] = (
            f"CASE WHEN {s}.n > 0 THEN CAST({s}.dn AS DOUBLE) / {s}.n END"
        )
        fracs[f"dup_{stem}_char_frac"] = (
            f"CASE WHEN {s}.chars > 0 THEN CAST({s}.dch AS DOUBLE) / {s}.chars END"
        )
    for n in (2, 3, 4):
        s = f"_rep_top{n}"
        fracs[f"top_{n}gram_char_frac"] = (
            f"CASE WHEN {s}.cnt >= 2 THEN least(CAST(1.0 AS DOUBLE),"
            f" CAST({s}.cnt AS DOUBLE) * {s}.len / _rep_len)"
            f" WHEN {s}.cnt = 1 THEN CAST(0.0 AS DOUBLE) END"
        )
    for n in (5, 6, 7, 8, 9, 10):
        s = f"_rep_dup{n}"
        fracs[f"dup_{n}gram_char_frac"] = (
            f"CASE WHEN {s}.n > 0 THEN least(CAST(1.0 AS DOUBLE),"
            f" CAST({s}.dch AS DOUBLE) / _rep_len) END"
        )
    pass_col = F.lit(True)
    for stem, sql in fracs.items():
        out = out.withColumn(f"{prefix}{stem}", F.expr(sql))
        ok = F.col(f"{prefix}{stem}") <= F.lit(th[f"max_{stem}"])
        pass_col = pass_col & F.coalesce(ok, F.lit(False))
    return out.withColumn(f"{prefix}pass", pass_col).drop(*tmp)


def repetition_compliance_rules(text_col: str = "text", **overrides) -> dict:
    """The battery as boolean "complies" rules for
    `checks.compliance.ComplianceCheck` — per-chunk violation rates,
    violation rows, shared-scan fusion and the streaming compliance kind
    all come from the existing machinery (every rule is row-local)."""
    th = repetition_thresholds(**overrides)
    return {
        stem: f"({sql}) <= {th[f'max_{stem}']}"
        for stem, sql in repetition_fracs(text_col).items()
    }
