import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from spark_validate.checks import BenfordCalculator, RowCompletenessCalculator
from spark_validate.chunking import PartitionChunker, SizeBasedChunker
from spark_validate.runner import run_suite
from spark_validate.thresholds import ConstantThreshold


def test_row_completeness_hand_computed(spark):
    pdf = pd.DataFrame(
        {
            "part": ["p0"] * 4 + ["p1"] * 2,
            "x": [1.0, None, 3.0, None, 5.0, 6.0],
            "y": ["a", None, None, "d", "e", None],
        }
    )
    df = spark.createDataFrame(pdf)
    calc = RowCompletenessCalculator(
        ["x", "y"],
        min_fraction=1.0,
        chunker=PartitionChunker(columns=["part"]),
        threshold=ConstantThreshold(lower=None, upper=0.4),
    )
    res = calc.calculate(df).toPandas().set_index(["chunk_key", "method"])["value"]
    # p0 rows nn: 2,0,1,1 -> mean 4/8; incomplete(<2): 3/4
    assert np.isclose(res[("part=p0", "row_completeness")], 0.5)
    assert np.isclose(res[("part=p0", "incomplete_row_rate")], 0.75)
    # p1 rows nn: 2,1 -> mean 3/4; incomplete 1/2
    assert np.isclose(res[("part=p1", "row_completeness")], 0.75)
    alerts = calc.calculate(df).toPandas().set_index(["chunk_key", "method"])["alert"]
    assert bool(alerts[("part=p0", "incomplete_row_rate")])  # 0.75 > 0.4
    assert not bool(alerts[("part=p0", "row_completeness")])  # informational
    v = calc.violations(df).toPandas()
    assert sorted(v["observed_value"]) == ["0/2", "1/2", "1/2", "1/2"]
    # NaN counts as missing (nan_to_null)
    pdf2 = pdf.copy()
    pdf2.loc[0, "x"] = float("nan")
    res2 = (
        RowCompletenessCalculator(["x", "y"], chunker=PartitionChunker(columns=["part"]))
        .calculate(spark.createDataFrame(pdf2))
        .toPandas()
        .set_index(["chunk_key", "method"])["value"]
    )
    assert np.isclose(res2[("part=p0", "row_completeness")], 3 / 8)


def test_benford_conformant_vs_flat(spark):
    # Benford-exact sample: digit d appears round(N*log10(1+1/d)) times
    n = 10_000
    vals = []
    for d in range(1, 10):
        cnt = round(n * math.log10(1 + 1 / d))
        vals += [float(d) * 10.0] * cnt
    benford = pd.DataFrame({"id": range(len(vals)), "v": vals})
    flat = pd.DataFrame(
        {"id": range(9000), "v": [float(1 + i % 9) for i in range(9000)]}
    )
    chunker = SizeBasedChunker(chunk_size=10**6, order_by=["id"])
    c = BenfordCalculator(["v"], chunker=chunker)
    good = c.calculate(spark.createDataFrame(benford)).toPandas()
    bad = c.calculate(spark.createDataFrame(flat)).toPandas()
    assert good["value"].iloc[0] < 0.001 and not good["alert"].iloc[0]
    # flat digits: each q = 1/9; MAD vs Benford ~ 0.057
    assert bad["value"].iloc[0] > 0.05 and bool(bad["alert"].iloc[0])


def test_benford_null_zero_negative_semantics(spark):
    pdf = pd.DataFrame(
        {
            "id": range(6),
            "v": [None, 0.0, -200.0, 0.0000001, 3.0, 900.0],
        }
    )
    df = spark.createDataFrame(pdf)
    c = BenfordCalculator(["v"], chunker=SizeBasedChunker(chunk_size=10, order_by=["id"]))
    res = c.calculate(df).toPandas()
    # only -200 (digit 2), 3.0 (3), 900 (9) carry digits; NULL/0/1e-7 excluded
    q = 1 / 3
    expect = (
        sum(abs(q - math.log10(1 + 1 / d)) for d in (2, 3, 9))
        + sum(math.log10(1 + 1 / d) for d in (1, 4, 5, 6, 7, 8))
    ) / 9.0
    assert np.isclose(res["value"].iloc[0], expect, rtol=1e-12)
    # all-excluded chunk -> NULL value, no alert
    empty = spark.createDataFrame(pd.DataFrame({"id": [0, 1], "v": [0.0, None]}))
    r2 = c.calculate(empty).toPandas()
    assert pd.isna(r2["value"].iloc[0]) and not bool(r2["alert"].iloc[0])


def test_completeness_benford_fused_in_runner(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "id": range(100),
            "v": [float((i % 9) + 1) * (10 ** (i % 3)) for i in range(100)],
            "w": [None if i % 4 == 0 else float(i) for i in range(100)],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(tmp_path / "t"))
    cfg = {
        "run_id": "cbf",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": str(tmp_path / "t"),
        "analysis": str(tmp_path / "t"),
        "chunking": {"chunk_size": 50, "order_by": ["id"]},
        "checks": [
            {"type": "row_completeness", "columns": ["v", "w"], "upper_threshold": 0.1},
            {"type": "benford", "columns": ["v"]},
            {"type": "missing", "columns": ["w"]},
        ],
    }
    report = run_suite(spark, cfg)
    res = spark.read.parquet(str(tmp_path / "out" / "results")).toPandas()
    rc = res[res["method"] == "incomplete_row_rate"]
    assert np.allclose(sorted(rc["value"]), [0.24, 0.26])
    assert rc["alert"].all()
    bf = res[res["method"] == "benford_mad"]
    assert len(bf) == 2 and bf["value"].notna().all()
    assert report["row_completeness__v_w"]["alerts"] == 2
