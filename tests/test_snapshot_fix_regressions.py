"""Regression tests for the round-5 end-of-round behavioral fixes
(VERDICT r5 'What's wrong' #2): each test fails on the pre-snapshot code.

(a) curate shields pre-existing user columns the pipeline helpers produce;
(b) repetition_stats(ngrams=[1]) gets its own kind bucket (no doubled
    unigram totals) and n < 1 raises;
(c) benchmark_ngrams drops the empty gram a NULL/blank benchmark row would
    contribute (an empty corpus doc must not be 100% contaminated);
(d) BoilerplateCheck's mean_common_rate row is informational — it never
    carries thresholds and never alerts.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_curate_preserves_user_columns_named_like_helper_outputs(spark):
    """A crawl table shipping its own hosts / lang_pred / rep_* /
    lines_kept columns must come out of the pipeline with its data intact
    (text/curate.py shield/unshield)."""
    from spark_validate.text import curate

    t1 = ("the quick brown fox jumps over one lazy dog while seven green "
          "birds watch from tall oak trees near an old stone bridge today")
    t2 = ("every morning the village baker carries warm fresh bread across "
          "three narrow streets toward the busy market square before sunrise")
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [t1, t2],
                "hosts": ["user-host-1", "user-host-2"],
                "lang_pred": ["user-lang", "user-lang"],
                "rep_custom": [11, 22],
                "lines_kept": [7, 8],
            }
        )
    )
    res = curate(
        df,
        stages=[
            {"stage": "gopher_repetition"},
            {"stage": "lang", "allowed": ["en"]},
            {"stage": "url_blocklist", "domains": ["bad.org"]},
            {"stage": "line_dedup"},
        ],
    )
    out = res.curated.orderBy("doc_id").toPandas()
    assert list(out["hosts"]) == ["user-host-1", "user-host-2"]
    assert list(out["lang_pred"]) == ["user-lang", "user-lang"]
    assert list(out["rep_custom"]) == [11, 22]
    assert list(out["lines_kept"]) == [7, 8]


def test_repetition_stats_explicit_unigram_request(spark):
    """ngrams=[1] must produce top_1gram_frac == top_word_frac (its own kind
    bucket), not silently double the unigram totals; n < 1 raises."""
    from spark_validate.text.quality import repetition_stats

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a a b c"]})
    )
    out = repetition_stats(df, ngrams=(1,)).collect()[0].asDict()
    assert out["n_words"] == 4
    assert out["top_word_frac"] == 0.5  # 'a' twice / 4 — NOT diluted to 2/8
    assert out["top_1gram_frac"] == 0.5
    assert out["dup_word_frac"] == 0.25
    with pytest.raises(ValueError, match=">= 1"):
        repetition_stats(df, ngrams=(0,)).collect()


def test_benchmark_ngrams_ignores_null_and_blank_rows(spark):
    """A NULL/blank benchmark row previously contributed the empty-string
    gram, marking every empty corpus doc 100% contaminated."""
    from spark_validate.text.decontaminate import benchmark_ngrams, ngram_overlap

    bench = spark.createDataFrame(
        pd.DataFrame({"text": ["alpha beta gamma delta epsilon zeta", None, "", "   "]})
    )
    grams = {r["g"] for r in benchmark_ngrams(bench, n=5).collect()}
    assert "" not in grams and grams  # real grams survive, empty gram gone
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["", "alpha beta gamma delta epsilon zeta"]})
    )
    out = {r["id"]: r.asDict() for r in ngram_overlap(docs, bench, n=5).collect()}
    assert out[1]["n_overlap"] == 0 and not out[1]["contaminated"]
    assert out[2]["contaminated"]


def test_boilerplate_mean_common_rate_never_alerts(spark):
    """mean_common_rate is informational: no thresholds, alert always False,
    even when every doc is flagged boilerplate."""
    from spark_validate.chunking import SizeBasedChunker
    from spark_validate.text.boilerplate import BoilerplateCheck

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(6)),
                "text": ["one two three four five six seven"] * 6,  # all shared
            }
        )
    )
    chk = BoilerplateCheck(chunker=SizeBasedChunker(chunk_size=3, order_by=["doc_id"]))
    out = chk.calculate(df).toPandas()
    mean_rows = out[out["method"] == "mean_common_rate"]
    assert len(mean_rows) == 2
    assert (mean_rows["value"] > 0).all()  # the informational value is real
    assert not mean_rows["alert"].any()
    assert mean_rows["upper_threshold"].isna().all()
    assert mean_rows["lower_threshold"].isna().all()
    # and the alerting row still alerts
    doc_rows = out[out["method"] == "boilerplate_doc_rate"]
    assert doc_rows["alert"].all()
