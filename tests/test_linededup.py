import pandas as pd
from pyspark.sql import functions as F

from spark_validate.text.curate import curate
from spark_validate.text.linededup import dedup_lines, line_frequencies


def _corpus(spark):
    # "COOKIE BANNER" in 3 docs (common at min_docs=3); "rare line" in 2
    # (kept); empty lines structural; within-doc duplicate counts once
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "COOKIE BANNER\nalpha one\n\nCOOKIE BANNER",
                "COOKIE BANNER\nbeta two\nrare line",
                "COOKIE BANNER\ngamma three",
                "rare line\ndelta four",
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_line_frequencies_distinct_per_doc(spark):
    freq = {
        r["line"]: r["doc_freq"]
        for r in line_frequencies(_corpus(spark)).collect()
    }
    assert freq["COOKIE BANNER"] == 3  # doc 1's duplicate counts once
    assert freq["rare line"] == 2
    assert "" not in freq  # empty lines never counted


def test_dedup_lines_rewrite_and_counts(spark):
    out = dedup_lines(_corpus(spark), min_docs=3).toPandas().set_index("doc_id")
    assert out.loc[1, "text"] == "alpha one\n"  # both banner copies gone,
    # the structural empty line survives
    assert out.loc[1, "lines_total"] == 4
    assert out.loc[1, "lines_removed"] == 2
    assert out.loc[1, "lines_kept"] == 1
    assert out.loc[2, "text"] == "beta two\nrare line"  # freq-2 line kept
    assert out.loc[4, "text"] == "rare line\ndelta four"  # untouched doc
    assert out.loc[4, "lines_removed"] == 0
    # min_docs high enough -> identity rewrite
    ident = dedup_lines(_corpus(spark), min_docs=99).toPandas().set_index("doc_id")
    orig = _corpus(spark).toPandas().set_index("doc_id")
    assert (ident["text"] == orig["text"]).all()


def test_dedup_lines_all_removed_yields_empty(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["same", "same"]})
    )
    out = dedup_lines(df, min_docs=2).toPandas().set_index("doc_id")
    assert (out["text"] == "").all() and (out["lines_kept"] == 0).all()


def test_line_dedup_curation_stage_survivor_frequencies(spark):
    # docs 1-3 share the banner; doc 3 is dropped by quality FIRST, but the
    # banner still has freq 2 among survivors -> removed at min_docs=2.
    # doc 4+5 share "only in dropped docs" with doc 6 — doc 4 and 5 are
    # dropped by quality, so among survivors the line is unique to doc 6
    # and MUST survive (dropped docs don't vote).
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "BANNER\ncontent alpha",
                "BANNER\ncontent beta",
                "x",  # dropped: too short
                # docs 4/5 carry the shared line but fail the digit gate:
                "only in dropped docs\n123456789 123456789",
                "only in dropped docs\n987654321 987654321",
                "only in dropped docs\ncontent gamma",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    res = curate(
        df,
        stages=[
            {"stage": "quality", "min_chars": 5, "max_digit_ratio": 0.2},
            {"stage": "line_dedup", "min_docs": 2, "min_remaining": 1},
        ],
    )
    kept = res.curated.toPandas().set_index("doc_id").sort_index()
    assert set(kept.index) == {1, 2, 6}
    assert kept.loc[1, "text"] == "content alpha"
    assert kept.loc[2, "text"] == "content beta"
    # the dropped docs' copies didn't vote: doc 6 keeps the line
    assert kept.loc[6, "text"] == "only in dropped docs\ncontent gamma"
    report = res.report().toPandas().set_index("stage")
    assert report.loc["quality", "docs_dropped"] == 3
    assert report.loc["line_dedup", "docs_dropped"] == 0


def test_line_dedup_stage_min_remaining_drops_hollow_docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["BANNER ONLY LINE", "BANNER ONLY LINE", "real content here"],
        }
    )
    res = curate(
        spark.createDataFrame(pdf),
        stages=[{"stage": "line_dedup", "min_docs": 2, "min_remaining": 1}],
    )
    kept = res.curated.toPandas()
    assert kept["doc_id"].tolist() == [3]
    ann = res.annotated.toPandas().set_index("doc_id")
    assert ann.loc[1, "dropped_by"] == "line_dedup"
    assert pd.isna(ann.loc[3, "dropped_by"])
