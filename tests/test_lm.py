"""Bigram-LM quality scoring: hand-computed probabilities, OOV floor,
top-K truncation bound, state roundtrip, the per-chunk runner check."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.text import LMQualityCheck, NgramLMQuality

REF = [
    (0, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (4, "a cat and a dog"),
]


@pytest.fixture(scope="module")
def fitted(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    return NgramLMQuality().fit(ref)


def test_lm_hand_computed(spark, fitted):
    # vocab = {the,cat,sat,on,mat,dog,rug,a,and} = 9 distinct -> V = 10
    assert fitted._v == 10
    assert fitted._uni["the"] == 4 and fitted._bi["the cat"] == 1
    ana = spark.createDataFrame([(1, "the cat sat")], "doc_id long, text string")
    row = fitted.score(ana).first()
    # 'the cat': (1+1)/(4+10); 'cat sat': (1+1)/(2+10)
    want = (-math.log2(2 / 14) - math.log2(2 / 12)) / 2
    assert row["n_bigrams"] == 2
    assert abs(row["cross_entropy"] - want) < 1e-12
    assert abs(row["perplexity"] - 2**want) < 1e-12


def test_lm_oov_floor_and_short_docs(spark, fitted):
    ana = spark.createDataFrame(
        [(1, "zebra quantum flux"), (3, "x"), (5, None), (7, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in fitted.score(ana).collect()}
    # fully-OOV transitions take the unigram backoff floor: p = 1/(N_tokens+V)
    # exactly -> perplexity = N_tokens + V (17 ref tokens + V=10 here). This
    # floor is strictly WORSE than any known-head transition's 1/(c1+V) —
    # the monotonicity pure add-1 lacks (gibberish must never beat real text)
    assert abs(out[1]["perplexity"] - (fitted._n_tokens + fitted._v)) < 1e-9
    assert fitted._n_tokens == 17
    for d in (3, 5, 7):  # <2 tokens keeps the row with NULL entropy
        assert out[d]["n_bigrams"] == 0 and out[d]["cross_entropy"] is None


def test_lm_gibberish_never_beats_known_head_transitions(spark, fitted):
    """The backoff ordering guarantee: the worst all-known-head doc (every
    transition unseen) still scores strictly below pure OOV gibberish."""
    ana = spark.createDataFrame(
        [(1, "mat rug and on sat"), (2, "zzz qqq www yyy xxx")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["cross_entropy"] for r in fitted.score(ana).collect()}
    assert out[1] < out[2]


def test_lm_topk_truncation_bounds_state(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    lm = NgramLMQuality(max_vocab=3, max_bigrams=4).fit(ref)
    assert len(lm._uni) == 3
    # deterministic pick: count desc, key asc — 'the'(4) then 'a'(2),'and'... ties by word
    assert "the" in lm._uni
    # every kept bigram's head is in the kept vocab: a bigram whose w1 was
    # truncated would score with c1=0 and could reach p > 1 (negative bits)
    assert all(g.split(" ", 1)[0] in lm._uni for g in lm._bi)
    # truncated grams score as unseen (count 0), not as errors, and bits
    # stay positive for every transition
    ana = spark.createDataFrame([(1, "rug and mat")], "doc_id long, text string")
    row = lm.score(ana).first()
    assert row["cross_entropy"] is not None and row["cross_entropy"] > 0
    assert row["perplexity"] > 1


def test_lm_state_roundtrip(spark, fitted):
    clone = NgramLMQuality().set_state(fitted.get_state())
    ana = spark.createDataFrame([(1, "the cat sat on a rug")], "doc_id long, text string")
    a = fitted.score(ana).first()
    b = clone.score(ana).first()
    assert a["cross_entropy"] == b["cross_entropy"]


def test_lm_check_degenerate_reference_and_guards(spark):
    """A reference with no scorable stddev leaves the bounds NULL (no alert)
    instead of a hair-trigger (mu, mu) band; pre-fit access raises cleanly."""
    from spark_validate.chunking import CountBasedChunker

    check = LMQualityCheck(chunker=CountBasedChunker(chunk_number=2, order_by=["doc_id"]))
    with pytest.raises(RuntimeError, match="fit first"):
        check.calculate(spark.createDataFrame(REF, "doc_id long, text string"))
    with pytest.raises(RuntimeError, match="fit first"):
        check.violations(spark.createDataFrame(REF, "doc_id long, text string"))

    one_doc = spark.createDataFrame([(0, "only one doc here")], "doc_id long, text string")
    check.fit(one_doc)
    ana = spark.createDataFrame(REF, "doc_id long, text string")
    res = check.calculate(ana).filter("method = 'mean_cross_entropy'").collect()
    assert res and all(r["upper_threshold"] is None and not r["alert"] for r in res)
    assert check.violations(ana).count() == 0
    # state roundtrip preserves the NULL bounds
    clone = LMQualityCheck().set_state(check.get_state())
    assert clone._bounds() == (None, None)


def test_lm_quality_check_in_runner(spark, tmp_path):
    """lm_quality as a config check: reference-fitted 3-sigma entropy bounds;
    a chunk of gibberish alerts; violation rows name the worst docs."""
    from spark_validate.runner import run_suite

    normal = "the quick brown fox jumps over the lazy dog again and again"
    n = 120
    rows = []
    for i in range(n):
        part = "p0" if i < n // 2 else "p1"
        text = normal if part == "p0" else f"zzq{i} wqx{i} jkl{i} vbn{i} qwe{i}"
        rows.append({"image_id": f"d{i:03d}", "part": part, "caption": text})
    pdf = pd.DataFrame(rows)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(tmp_path / "docs"))
    ref = pdf[pdf["part"] == "p0"]
    spark.createDataFrame(ref).write.mode("overwrite").parquet(str(tmp_path / "ref"))
    cfg = {
        "run_id": "lm",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": str(tmp_path / "ref"),
        "analysis": str(tmp_path / "docs"),
        "chunking": {"partition_columns": ["part"]},
        "checks": [{"type": "lm_quality", "column": "caption", "id_column": "image_id"}],
    }
    report = run_suite(spark, cfg)
    assert report["lm_quality__caption"]["alerts"] > 0
    res = spark.read.parquet(str(tmp_path / "out" / "results" / "check=lm_quality__caption"))
    vals = {
        (r["chunk_key"], r["method"]): r.asDict()
        for r in res.filter("period='analysis'").collect()
    }
    h0 = vals[("part=p0", "mean_cross_entropy")]
    h1 = vals[("part=p1", "mean_cross_entropy")]
    assert not h0["alert"] and h1["alert"]  # gibberish chunk trips the bound
    assert h1["value"] > h0["value"]
    # perplexity rows are informational: no thresholds, never alert
    p1 = vals[("part=p1", "mean_perplexity")]
    assert p1["upper_threshold"] is None and not p1["alert"]

    viol = spark.read.parquet(str(tmp_path / "out" / "violations" / "check=lm_quality__caption"))
    v = viol.toPandas()
    assert len(v) == n // 2  # every gibberish doc named
    assert set(v["violation_kind"]) == {"high_perplexity"}
