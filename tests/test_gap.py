"""Segment performance-gap rollup (performance/gap.py)."""

import pandas as pd
import pytest

from spark_validate.performance.gap import segment_gap


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "chunk_key string, column_name string, method string, value double, period string"
    )


def test_gap_extremes_ties_and_nulls(spark):
    rows = [
        ("[0:9]|a", "m", "accuracy", 0.9, "analysis"),
        ("[0:9]|b", "m", "accuracy", 0.7, "analysis"),
        ("[0:9]|c", "m", "accuracy", 0.9, "analysis"),   # tie with a on max
        ("[0:9]|d", "m", "accuracy", None, "analysis"),  # excluded
        ("[0:9]|a", "m", "f1", 0.5, "analysis"),         # single segment
    ]
    out = segment_gap(_frame(spark, rows), gap_threshold=0.15).toPandas()
    acc = out[out.method == "accuracy"].iloc[0]
    assert acc["chunk_key"] == "[0:9]" and acc["n_segments"] == 3
    assert acc["gap"] == pytest.approx(0.2)
    # value tie on max -> larger segment label wins
    assert acc["max_segment"] == "c" and acc["max_value"] == 0.9
    assert acc["min_segment"] == "b" and acc["min_value"] == 0.7
    assert bool(acc["alert"])
    f1 = out[out.method == "f1"].iloc[0]
    assert f1["n_segments"] == 1 and f1["gap"] == 0.0 and not bool(f1["alert"])
    # period column carried through
    assert set(out["period"]) == {"analysis"}


def test_gap_groups_periods_separately_and_no_threshold(spark):
    rows = [
        ("[0:9]|a", "m", "acc", 0.9, "reference"),
        ("[0:9]|b", "m", "acc", 0.1, "reference"),
        ("[0:9]|a", "m", "acc", 0.6, "analysis"),
        ("[0:9]|b", "m", "acc", 0.5, "analysis"),
    ]
    out = segment_gap(_frame(spark, rows)).toPandas().set_index("period")
    assert out.loc["reference", "gap"] == pytest.approx(0.8)
    assert out.loc["analysis", "gap"] == pytest.approx(0.1, abs=1e-12)
    assert not out["alert"].any()  # informational without a threshold


def test_gap_null_segment_label_and_sep_in_segment_value(spark):
    # SegmentedChunker labels NULL cohorts '__null__'. The split is on the
    # FIRST separator: the base chunker never emits '|', but a segment
    # VALUE may — it must survive intact, not be truncated to its last
    # token. Nested segmentation (base|seg1|seg2) therefore rolls up the
    # full composite cohort 'seg1|seg2' as the segment.
    rows = [
        ("2024-01|east|__null__", "m", "acc", 0.4, "analysis"),
        ("2024-01|east|south", "m", "acc", 0.8, "analysis"),
    ]
    out = segment_gap(_frame(spark, rows)).toPandas().iloc[0]
    assert out["chunk_key"] == "2024-01"
    assert out["min_segment"] == "east|__null__" and out["max_segment"] == "east|south"
    assert out["gap"] == pytest.approx(0.4)


def test_gap_rejects_non_segmented_key(spark):
    # a key with no separator is not a SegmentedChunker key — loud error,
    # not a silently-empty base with seg == whole key
    rows = [("[0:9]", "m", "acc", 0.5, "analysis")]
    with pytest.raises(Exception, match="without segment separator"):
        segment_gap(_frame(spark, rows)).collect()
