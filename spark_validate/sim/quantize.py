"""Int8 embedding quantization — the storage/bandwidth path for
petabyte-scale embedding tables.

A float32 embedding column is 4 bytes/dim; affine int8 quantization cuts
that 4× (and most ANN recall loss at this precision is negligible — the
standard faiss/ScaNN storage trick). Everything here is codegen column
expressions over the array type — no UDFs, no shuffle:

* :func:`fit_minmax` — per-dimension [lo, hi] from the reference corpus,
  ONE aggregate of 2·dim min/max expressions (same `F.get` device as
  `drift/embedding.py`; state = 2·dim floats, broadcastable constants).
* :func:`quantize` — ``q_i = clamp(round((v_i − lo_i)·255/(hi_i − lo_i)))
  − 128`` as ``array<tinyint>`` (clamp BEFORE round so the round argument
  is non-negative — keeps the half-up convention identical across
  engines). Out-of-range analysis values saturate at the byte edges,
  they never wrap.
* :func:`dequantize` — the affine inverse, ``array<double>``.
* :class:`QuantizationErrorCheck` — per-chunk reconstruction-error gate:
  ``max_abs_err`` (order-independent → bit-exact across engines and
  parallelism) and ``mean_abs_err``; alert when the max exceeds the
  fitted bound ``(hi−lo)/2·255`` by more than ``tolerance`` (values
  INSIDE the fitted range can never exceed half a quantization step —
  a larger error means range drift: the corpus moved outside the fitted
  box, time to refit).

Scale: quantize/dequantize are narrow projections (parquet-scan speed);
the error check is one `groupBy(chunk)` aggregate. Degenerate dims
(hi == lo in reference) quantize to a constant and dequantize exactly.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).filter(F.col("d") > 0).first()
    if row is None:
        raise ValueError(f"cannot infer dim: no non-empty {vec_col}")
    return int(row["d"])


def fit_minmax(df: DataFrame, vec_col: str = "embedding", dim: Optional[int] = None) -> dict:
    """Per-dimension [lo, hi] over the reference — one aggregate pass."""
    d = dim or _infer_dim(df, vec_col)
    v = F.col(vec_col)
    aggs = []
    for i in range(d):
        e = F.get(v, i).cast("double")
        aggs += [F.min(e).alias(f"lo{i}"), F.max(e).alias(f"hi{i}")]
    row = df.filter(v.isNotNull()).agg(*aggs).first().asDict()
    los, his = [], []
    for i in range(d):
        lo, hi = row[f"lo{i}"], row[f"hi{i}"]
        if lo is None:
            raise ValueError(f"dimension {i} is all-null in the reference")
        lo, hi = float(lo), float(hi)
        if hi <= lo:
            hi = lo + 1.0  # degenerate dim: quantizes to 0, dequantizes to lo
        los.append(lo)
        his.append(hi)
    return {"dim": d, "lo": los, "hi": his}


def _scale_exprs(state: dict):
    los = F.array(*[F.lit(x) for x in state["lo"]])
    his = F.array(*[F.lit(x) for x in state["hi"]])
    return los, his


def quantize(
    df: DataFrame, state: dict, vec_col: str = "embedding", out_col: str = "embedding_q"
) -> DataFrame:
    los, his = _scale_exprs(state)
    v = F.col(vec_col)

    def q(x, i):
        lo = F.get(los, i)
        hi = F.get(his, i)
        scaled = (x.cast("double") - lo) * F.lit(255.0) / (hi - lo)
        clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(255.0))
        return (F.round(clamped, 0) - F.lit(128)).cast("tinyint")

    return df.withColumn(
        out_col, F.when(v.isNotNull(), F.transform(v, q)).otherwise(F.lit(None))
    )


def dequantize(
    df: DataFrame, state: dict, q_col: str = "embedding_q", out_col: str = "embedding_dq"
) -> DataFrame:
    los, his = _scale_exprs(state)
    v = F.col(q_col)

    def dq(x, i):
        lo = F.get(los, i)
        hi = F.get(his, i)
        return lo + (x.cast("double") + F.lit(128.0)) * (hi - lo) / F.lit(255.0)

    return df.withColumn(
        out_col, F.when(v.isNotNull(), F.transform(v, dq)).otherwise(F.lit(None))
    )


class QuantizationErrorCheck:
    """Per-chunk int8 reconstruction-error profile + range-drift alert."""

    def __init__(
        self,
        vec_col: str = "embedding",
        dim: Optional[int] = None,
        chunker=None,
        tolerance: float = 1e-9,
    ):
        from spark_validate.chunking import DefaultChunker

        self.vec_col = vec_col
        self.dim = dim
        self.chunker = chunker or DefaultChunker()
        self.tolerance = float(tolerance)
        self._state: Optional[dict] = None

    def fit(self, reference: DataFrame) -> "QuantizationErrorCheck":
        self._state = fit_minmax(reference, self.vec_col, self.dim)
        return self

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        if self._state is None:
            raise RuntimeError("fit first")
        from spark_validate.calculators.base import assign_chunks
        from spark_validate.chunking import CHUNK_KEY

        st = self._state
        # the in-range bound: half a quantization step on the widest dim
        bound = max((hi - lo) / (2.0 * 255.0) for lo, hi in zip(st["lo"], st["hi"]))
        assigned, _ = assign_chunks(df, self.chunker)
        rt = dequantize(
            quantize(assigned, st, self.vec_col, "_q"), st, "_q", "_dq"
        )
        err = F.zip_with(
            F.col(self.vec_col), F.col("_dq"), lambda a, b: F.abs(a.cast("double") - b)
        )
        row_max = F.array_max(err)
        row_mean = F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x) / F.size(err)
        agg = rt.groupBy(CHUNK_KEY).agg(
            F.max(row_max).alias("max_abs_err"),
            F.avg(row_mean).alias("mean_abs_err"),
            F.count(self.vec_col).alias("n_vectors"),
        )
        return agg.select(
            CHUNK_KEY,
            F.lit(self.vec_col).alias("column_name"),
            F.lit("int8_roundtrip").alias("method"),
            F.col("max_abs_err").cast("double"),
            F.col("mean_abs_err").cast("double"),
            F.col("n_vectors").cast("long"),
            F.lit(float(bound)).alias("in_range_bound"),
            (F.col("max_abs_err") > bound + self.tolerance).alias("alert"),
        ).withColumn("period", F.lit(period))

    def get_state(self) -> dict:
        if self._state is None:
            raise RuntimeError("fit first")
        return dict(self._state)

    def set_state(self, state: dict) -> "QuantizationErrorCheck":
        self._state = {
            "dim": int(state["dim"]),
            "lo": [float(x) for x in state["lo"]],
            "hi": [float(x) for x in state["hi"]],
        }
        return self
