import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.checks import ComplianceCheck
from spark_validate.chunking import PartitionChunker
from spark_validate.runner import run_suite
from spark_validate.thresholds import ConstantThreshold


def _frame(spark):
    pdf = pd.DataFrame(
        {
            "part": ["p0"] * 3 + ["p1"] * 3,
            "lo": [1.0, 2.0, 3.0, 4.0, 5.0, None],
            "hi": [2.0, 1.0, 4.0, 5.0, None, 1.0],
            "id": list(range(6)),
        }
    )
    return spark.createDataFrame(pdf)


def test_compliance_null_is_violation(spark):
    chk = ComplianceCheck(
        rules={"ordered": "lo <= hi"},
        chunker=PartitionChunker(columns=["part"]),
        threshold=ConstantThreshold(lower=None, upper=0.4),
    )
    res = chk.calculate(_frame(spark)).toPandas().set_index("chunk_key")
    # p0: row1 violates (2>1) -> 1/3; p1: rows with NULL operands violate -> 2/3
    assert np.isclose(res.loc["part=p0", "value"], 1 / 3)
    assert np.isclose(res.loc["part=p1", "value"], 2 / 3)
    assert not bool(res.loc["part=p0", "alert"]) and bool(res.loc["part=p1", "alert"])
    v = chk.violations(_frame(spark), row_id="id").toPandas()
    assert sorted(v["row_id"].astype(int)) == [1, 4, 5]
    assert (v["observed_value"] == "lo <= hi").all()
    with pytest.raises(ValueError):
        ComplianceCheck(rules={})


def test_compliance_fused_matches_standalone(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "id": range(100),
            "a": [float(i) for i in range(100)],
            "b": [float(i * 2 if i % 9 else -1) for i in range(100)],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(tmp_path / "t"))

    def cfg(tag, fused):
        return {
            "run_id": f"comp_{tag}",
            "output_dir": str(tmp_path / f"out_{tag}"),
            "store_dir": str(tmp_path / f"store_{tag}"),
            "reference": str(tmp_path / "t"),
            "analysis": str(tmp_path / "t"),
            "chunking": {"chunk_size": 25, "order_by": ["id"]},
            "fused": fused,
            "checks": [
                {
                    "type": "compliance",
                    "rules": {"b_dominates": "b >= a"},
                    "id_column": "id",
                    "upper_threshold": 0.05,
                },
                {"type": "missing", "columns": ["a"]},
            ],
        }

    run_suite(spark, cfg("f", True))
    run_suite(spark, cfg("s", False))
    read = lambda tag: (
        spark.read.parquet(str(tmp_path / f"out_{tag}" / "results"))
        .filter(F.col("method") == "compliance_violation_rate")
        .toPandas()
        .sort_values("chunk_index")
        .reset_index(drop=True)
    )
    f, s = read("f"), read("s")
    assert f["value"].tolist() == s["value"].tolist()
    # i=0: b=-1 < a=0 violates; every multiple of 9 except 0 satisfies b>=a
    assert np.isclose(f.loc[0, "value"], 3 / 25)  # i in {0, 9? ...}
    v = spark.read.parquet(str(tmp_path / "out_f" / "violations")).toPandas()
    assert set(v[v["violation_kind"] == "rule_violation"]["row_id"].astype(int)) == {
        i for i in range(100) if (i % 9 == 0 and -1 < i) or (i == 0)
    }


def test_streaming_compliance_row_completeness_benford(spark, tmp_path):
    """The three new streaming kinds: stateless rule/completeness violation
    streams + the windowed Benford aggregate matching the batch formula."""
    from spark_validate.streaming.runner import run_streaming_suite

    n = 120  # two 1-minute windows; the second closes the first's watermark
    pdf = pd.DataFrame(
        {
            "id": range(n),
            "v": [float((i % 9) + 1) for i in range(n)],
            "w": [None if i % 5 == 0 else float(i + 1) for i in range(n)],
        }
    )
    pdf["ts"] = pd.date_range("2024-06-01", periods=n, freq="1s")
    stream_dir, out_dir = (str(tmp_path / d) for d in ("stream", "out"))
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(stream_dir)
    cfg = {
        "output_dir": out_dir,
        "stream": stream_dir,
        "stream_schema_from": stream_dir,
        "timestamp_column": "ts",
        "window": "1 minute",
        "watermark": "0 seconds",
        "checks": [
            {
                "type": "compliance",
                "rules": {"w_positive": "w > 0"},
                "id_column": "id",
            },
            {
                "type": "row_completeness",
                "columns": ["v", "w"],
                "min_fraction": 1.0,
                "id_column": "id",
            },
            {"type": "benford", "columns": ["v"]},
        ],
    }
    queries = run_streaming_suite(spark, cfg)
    try:
        for q in queries.values():
            q.processAllAvailable()
    finally:
        for q in queries.values():
            q.stop()

    comp = spark.read.parquet(f"{out_dir}/compliance").toPandas()
    assert set(comp["row_id"].astype(int)) == {i for i in range(n) if i % 5 == 0}
    rc = spark.read.parquet(f"{out_dir}/row_completeness").toPandas()
    assert set(rc["row_id"].astype(int)) == {i for i in range(n) if i % 5 == 0}
    assert (rc["observed_value"] == "1/2").all()

    # append mode emits only watermark-closed windows: the first minute
    bf = spark.read.parquet(f"{out_dir}/benford__v").toPandas()
    bf = bf.sort_values("start_ts").reset_index(drop=True)
    assert len(bf) >= 1
    # batch replica chunked on the same 60-row window
    from spark_validate.checks import BenfordCalculator
    from spark_validate.chunking import SizeBasedChunker

    batch = (
        BenfordCalculator(["v"], chunker=SizeBasedChunker(chunk_size=60, order_by=["id"]))
        .calculate(spark.read.parquet(stream_dir))
        .toPandas()
        .sort_values("chunk_index")
        .reset_index(drop=True)
    )
    assert np.isclose(bf["value"].iloc[0], batch["value"].iloc[0], rtol=1e-12)
    assert bool(bf["alert"].iloc[0]) == bool(batch["alert"].iloc[0])
