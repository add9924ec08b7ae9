"""Gopher repetition-removal battery (text/repetition.py) — semantics on
crafted documents, NULL conventions, fast-path ≡ expression-path identity,
compliance/curation/runner wiring."""

import math

import pytest
from pyspark.sql import functions as F

from spark_validate.text.repetition import (
    repetition_compliance_rules,
    repetition_fracs,
    repetition_thresholds,
    with_repetition_stats,
)

DOCS = [
    (0, "a b c d e f g h i j k l"),                 # 12 distinct 1-char words
    (1, "x y z\nx y z\nx y z\nother line"),         # 3 identical lines
    (2, ("w1 w2 w3 w4 w5 " * 4).strip()),           # doc = 4x the same 5 words
    (3, None),
    (4, ""),
    (5, "one\n\ntwo\n\none\n\nthree"),              # duplicate paragraph
]


def _stats(spark, rows=DOCS, **over):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = with_repetition_stats(df, **over).orderBy("doc_id").collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_duplicate_line_and_paragraph_fractions(spark):
    s = _stats(spark)
    # doc 1: lines = [x y z, x y z, x y z, other line]; 2 repeats of 5 chars
    assert s[1]["rep_dup_line_frac"] == pytest.approx(2 / 4)
    assert s[1]["rep_dup_line_char_frac"] == pytest.approx(10 / 25)
    # single paragraph (no blank lines) -> zero dup paragraphs
    assert s[1]["rep_dup_para_frac"] == 0.0
    # doc 5: paragraphs [one, two, one, three]; one repeat of 3 chars / 14
    assert s[5]["rep_dup_para_frac"] == pytest.approx(1 / 4)
    assert s[5]["rep_dup_para_char_frac"] == pytest.approx(3 / 14)
    # doc 0 has no repetition anywhere
    assert s[0]["rep_dup_line_frac"] == 0.0
    assert s[0]["rep_dup_5gram_char_frac"] == 0.0


def test_top_ngram_char_fraction(spark):
    s = _stats(spark)
    # doc 0: every 2-gram unique -> no repetition -> 0.0 (count-1 grams
    # don't score; the DataTrove convention)
    assert s[0]["rep_top_2gram_char_frac"] == 0.0
    # doc 1: top 2-gram "y z" occurs 3x, len 3, text len 28
    assert s[1]["rep_top_2gram_char_frac"] == pytest.approx(9 / 28)


def test_dup_ngram_clamped_to_one(spark):
    s = _stats(spark)
    # doc 2: every 5..10-gram window repeats; occurrence mass > len(text)
    for n in range(5, 11):
        assert s[2][f"rep_dup_{n}gram_char_frac"] == 1.0


def test_null_and_degenerate_docs(spark):
    s = _stats(spark)
    for d in (3, 4):
        assert all(v is None for k, v in s[d].items()
                   if k.startswith("rep_") and k != "rep_pass")
        assert s[d]["rep_pass"] is False
    # doc 5 has only 4 words -> 5..10-gram fracs incomputable (NULL)
    assert s[5]["rep_dup_5gram_char_frac"] is None
    assert s[5]["rep_pass"] is False


def test_pass_gate_and_overrides(spark):
    rows = [(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon alpha beta")]
    s = _stats(spark, rows=rows)
    # one repeated 2-gram ("alpha beta" x2, 20 chars / 116) stays under the
    # published 0.20 cap; every other fraction is 0 -> gate passes
    assert s[0]["rep_top_2gram_char_frac"] == pytest.approx(20 / 116)
    assert s[0]["rep_pass"] is True
    s = _stats(spark, rows=rows, max_top_2gram_char_frac=0.1)
    assert s[0]["rep_pass"] is False
    with pytest.raises(ValueError):
        repetition_thresholds(max_top_11gram_char_frac=0.5)


def test_fast_path_matches_expression_path(spark):
    """with_repetition_stats (staged single-pass scans) must agree exactly
    with the self-contained repetition_fracs expressions the compliance
    rules embed."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    fast = with_repetition_stats(df).orderBy("doc_id").collect()
    slow = df.select(
        "doc_id",
        *[F.expr(sql).alias(stem) for stem, sql in repetition_fracs("text").items()],
    ).orderBy("doc_id").collect()
    for fr, sr in zip(fast, slow):
        for stem in repetition_fracs("text"):
            a, b = fr[f"rep_{stem}"], sr[stem]
            assert (a is None and b is None) or a == b, (fr["doc_id"], stem, a, b)


def test_compliance_wiring(spark):
    from spark_validate.checks import ComplianceCheck
    from spark_validate.chunking import PartitionChunker

    rows = [
        ("p0", 0, "x y\nx y\nx y\nx y"),       # heavy duplicate lines
        ("p0", 1, "q w e r t y u i o p a s"),  # clean
    ]
    df = spark.createDataFrame(rows, ["part", "doc_id", "text"])
    chk = ComplianceCheck(
        rules=repetition_compliance_rules("text"),
        chunker=PartitionChunker(columns=["part"]),
        id_column="doc_id",
    )
    res = chk.calculate(df).toPandas()
    rates = res.set_index("column_name")["value"]
    assert rates["dup_line_frac"] == pytest.approx(0.5)   # doc 0 violates
    # doc 0's 5-gram fracs are NULL (4 words) -> NULL-is-violation
    assert rates["dup_5gram_char_frac"] == pytest.approx(0.5)


def test_curation_stage(spark):
    from spark_validate.text.curate import curate

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon"),
        (1, "spam spam spam\nspam spam spam\nspam spam spam\n"
            "spam spam spam\nspam spam spam"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    res = curate(df, [{"stage": "gopher_repetition"}])
    kept = [r["doc_id"] for r in res.curated.select("doc_id").collect()]
    assert kept == [0]
    ann = {r["doc_id"]: r["dropped_by"] for r in res.annotated.collect()}
    assert ann == {0: None, 1: "gopher_repetition"}


def test_runner_kind_builds_compliance_check(spark):
    from spark_validate.checks import ComplianceCheck
    from spark_validate.runner import build_check

    chk = build_check(
        spark,
        {"type": "gopher_repetition", "column": "text", "max_dup_line_frac": 0.5},
        None,
    )
    assert isinstance(chk, ComplianceCheck)
    assert len(chk.rules) == 13
    assert "<= 0.5" in chk.rules["dup_line_frac"]
