"""Int8 embedding quantization (sim/quantize.py): bounds, saturation, state."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_validate.chunking import SizeBasedChunker
from spark_validate.sim import QuantizationErrorCheck, dequantize, fit_minmax, quantize

DIM = 8


def _vec_frame(spark, n, scale=1.0, shift=0.0, seed=3):
    rng = np.random.default_rng(seed)
    rows = [
        (i, (rng.uniform(-1, 1, DIM) * scale + shift).tolist()) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_quantize_roundtrip_error_within_half_step(spark):
    df = _vec_frame(spark, 500)
    st = fit_minmax(df, "embedding")
    assert st["dim"] == DIM and len(st["lo"]) == DIM
    rt = dequantize(quantize(df, st), st)
    pdf = rt.toPandas()
    orig = np.array(pdf["embedding"].tolist())
    deq = np.array(pdf["embedding_dq"].tolist())
    half_step = (np.array(st["hi"]) - np.array(st["lo"])) / (2 * 255)
    assert (np.abs(orig - deq) <= half_step + 1e-12).all()
    # dtype contract: signed bytes
    q = quantize(df, st)
    assert dict(q.dtypes)["embedding_q"] == "array<tinyint>"
    qv = np.array(q.toPandas()["embedding_q"].tolist())
    assert qv.min() >= -128 and qv.max() <= 127


def test_quantize_saturates_out_of_range(spark):
    ref = _vec_frame(spark, 300)
    st = fit_minmax(ref, "embedding")
    far = spark.createDataFrame(
        [(0, [10.0] * DIM), (1, [-10.0] * DIM)], "vec_id bigint, embedding array<double>"
    )
    q = quantize(far, st).toPandas()["embedding_q"].tolist()
    assert set(q[0]) == {127} and set(q[1]) == {-128}  # saturate, never wrap


def test_quantization_error_check_alerts_on_range_drift(spark):
    ref = _vec_frame(spark, 600)
    ana_ok = _vec_frame(spark, 300, seed=4)
    ana_drift = _vec_frame(spark, 300, scale=5.0, seed=5)  # outside the fitted box
    ana = ana_ok.union(
        ana_drift.withColumn("vec_id", F.col("vec_id") + 300)
    )
    chk = QuantizationErrorCheck(
        chunker=SizeBasedChunker(chunk_size=300, order_by=["vec_id"])
    ).fit(ref)
    res = chk.calculate(ana).toPandas().sort_values("chunk_key").reset_index(drop=True)
    assert len(res) == 2
    assert not res["alert"].iloc[0]  # in-range chunk: error ≤ half a step
    assert res["alert"].iloc[1]      # drifted chunk: saturation error >> step
    assert res["max_abs_err"].iloc[1] > 10 * res["max_abs_err"].iloc[0]


def test_quantize_degenerate_dim_and_state_roundtrip(spark):
    rows = [(i, [float(i % 7), 3.5]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    st = fit_minmax(df, "embedding")
    assert st["hi"][1] == st["lo"][1] + 1.0  # degenerate dim widened
    rt = dequantize(quantize(df, st), st).toPandas()
    assert all(abs(v[1] - 3.5) < 1e-12 for v in rt["embedding_dq"])  # exact constant
    chk = QuantizationErrorCheck(chunker=SizeBasedChunker(chunk_size=50, order_by=["vec_id"]))
    chk.fit(df)
    clone = QuantizationErrorCheck(chunker=chk.chunker).set_state(chk.get_state())
    a = chk.calculate(df).toPandas().sort_values("chunk_key")["max_abs_err"].tolist()
    b = clone.calculate(df).toPandas().sort_values("chunk_key")["max_abs_err"].tolist()
    assert a == b
