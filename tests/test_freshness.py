"""Freshness / temporal-completeness check (spark_validate/checks/freshness.py)."""

import datetime

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.checks.freshness import FreshnessCheck
from spark_validate.chunking import SizeBasedChunker


def _ts(s):
    return pd.Timestamp(s)


def _frame(spark):
    """2 chunks of 6 rows each at a 10s cadence: chunk 0 has a planted
    300s outage hole, chunk 1 (an hour later) is the newest data."""
    t0 = _ts("2024-06-01 00:00:00")
    chunk0 = [t0 + pd.Timedelta(seconds=s) for s in (0, 10, 20, 330, 340, 350)]
    t1 = _ts("2024-06-01 01:00:00")
    chunk1 = [t1 + pd.Timedelta(seconds=10 * i) for i in range(6)]
    pdf = pd.DataFrame({"ord": range(12), "ts": chunk0 + chunk1})
    return spark.createDataFrame(pdf), pdf


def test_metrics_hand_computed(spark):
    df, pdf = _frame(spark)
    as_of = "2024-06-01 01:02:00"  # 70s after the newest row (01:00:50)
    chk = FreshnessCheck(
        timestamp_column="ts",
        bucket_seconds=60,
        as_of=as_of,
        max_staleness_seconds=3000.0,
        min_bucket_fill=0.9,
        max_gap_alert_seconds=120.0,
        chunker=SizeBasedChunker(chunk_size=6, order_by=["ord"]),
    )
    res = chk.calculate(df).toPandas()
    m = res.set_index(["chunk_index", "method"])["value"]
    # chunk 0: newest row 00:05:50 → staleness = 3370s > 3000 (alert)
    assert m.loc[(0, "staleness_seconds")] == pytest.approx(3370.0)
    assert m.loc[(1, "staleness_seconds")] == pytest.approx(70.0)
    assert m.loc[(0, "span_seconds")] == pytest.approx(350.0)
    assert m.loc[(1, "span_seconds")] == pytest.approx(50.0)
    # chunk 0 spans buckets 0..5 (6 expected), rows land in buckets {0, 5} → 2/6
    assert m.loc[(0, "bucket_fill_rate")] == pytest.approx(2 / 6)
    assert m.loc[(1, "bucket_fill_rate")] == pytest.approx(1.0)
    assert m.loc[(0, "max_gap_seconds")] == pytest.approx(310.0)
    assert m.loc[(1, "max_gap_seconds")] == pytest.approx(10.0)

    a = res.set_index(["chunk_index", "method"])["alert"]
    assert a.loc[(0, "staleness_seconds")] and not a.loc[(1, "staleness_seconds")]
    assert a.loc[(0, "bucket_fill_rate")] and not a.loc[(1, "bucket_fill_rate")]
    assert a.loc[(0, "max_gap_seconds")] and not a.loc[(1, "max_gap_seconds")]
    assert not a.loc[(0, "span_seconds")]  # informational: never alerts

    v = chk.violations(df).toPandas()
    assert len(v) == 1 and v.iloc[0]["violation_kind"] == "time_gap"
    assert v.iloc[0]["observed_value"].startswith("310.0@2024-06-01 00:05:30")


def test_default_as_of_is_frame_max(spark):
    df, _ = _frame(spark)
    chk = FreshnessCheck(chunker=SizeBasedChunker(chunk_size=6, order_by=["ord"]))
    res = chk.calculate(df).toPandas()
    m = res.set_index(["chunk_index", "method"])["value"]
    assert m.loc[(1, "staleness_seconds")] == pytest.approx(0.0)
    assert m.loc[(0, "staleness_seconds")] == pytest.approx(3300.0)


def test_null_ts_and_tiny_chunks(spark):
    pdf = pd.DataFrame(
        {
            "ord": range(4),
            "ts": [pd.Timestamp("2024-06-01"), pd.Timestamp("2024-06-01 00:01:00"), None, None],
        }
    )
    df = spark.createDataFrame(pdf)
    chk = FreshnessCheck(
        max_staleness_seconds=10.0,
        max_gap_alert_seconds=5.0,
        chunker=SizeBasedChunker(chunk_size=2, order_by=["ord"]),
    )
    res = chk.calculate(df).toPandas()
    c1 = res[res.chunk_index == 1].set_index("method")
    # all-NULL-ts chunk: every metric NULL, nothing alerts
    assert c1["value"].isna().all() and not c1["alert"].any()
    # a 1-valid-row chunk has no gap
    pdf2 = pd.DataFrame({"ord": [0], "ts": [pd.Timestamp("2024-06-01")]})
    res2 = FreshnessCheck(chunker=SizeBasedChunker(chunk_size=2, order_by=["ord"])).calculate(
        spark.createDataFrame(pdf2)
    ).toPandas()
    assert np.isnan(res2.set_index("method").loc["max_gap_seconds", "value"])
    # all-NULL frame cannot default as_of
    pdf3 = pd.DataFrame({"ord": [0], "ts": [pd.NaT]})
    with pytest.raises(ValueError):
        FreshnessCheck(chunker=SizeBasedChunker(chunk_size=2, order_by=["ord"])).calculate(
            spark.createDataFrame(pdf3)
        )


def test_runner_kind_freshness(spark, tmp_path):
    from spark_validate.runner import run_suite

    df, pdf = _frame(spark)
    refp, anap = str(tmp_path / "ref.parquet"), str(tmp_path / "ana.parquet")
    df.write.parquet(refp)
    df.write.parquet(anap)
    cfg = {
        "run_id": "fresh",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": refp,
        "analysis": anap,
        "chunking": {"chunk_size": 6, "order_by": ["ord"]},
        "checks": [
            {
                "type": "freshness",
                "column": "ts",
                "as_of": "2024-06-01 01:02:00",
                "max_staleness_seconds": 3000,
                "max_gap_alert_seconds": 120,
                "min_bucket_fill": 0.9,
            }
        ],
    }
    report = run_suite(spark, cfg)
    entry = report["freshness__ts"]
    assert entry["rows"] == 8 and entry["alerts"] == 3
    v = spark.read.parquet(str(tmp_path / "out" / "violations")).toPandas()
    assert (v["violation_kind"] == "time_gap").sum() == 1
