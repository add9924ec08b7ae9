"""Embedding-drift throughput at >=1M vectors (codegen-limit evidence).

Synthesizes N dim-D vectors, writes parquet once, then times
EmbeddingDriftCalculator fit (even ids) + calculate (odd ids, 10 size
chunks) and reports rows/s for the calculate pass plus whether any
whole-stage codegen compilation fell back to interpreted mode (the
64 KB-method failure mode this bench exists to pin — see
spark_validate/drift/embedding.py::_project).

Usage: python tools/bench_embedding_drift.py [n_rows] [dim]
Prints one JSON line.
"""


import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
SEED = 11


def synth(spark, out_dir: str):
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    n_parts = 32

    def gen(iterator):
        import pandas as pd

        for pdf in iterator:
            for pid in pdf["part"]:
                rng = np.random.default_rng(SEED + int(pid))
                rows = N // n_parts + (1 if pid < N % n_parts else 0)
                start = (N // n_parts) * int(pid) + min(int(pid), N % n_parts)
                vecs = rng.standard_normal((rows, DIM)).astype(np.float32)
                ids = np.arange(start, start + rows, dtype=np.int64)
                yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    parts = spark.createDataFrame([(i,) for i in range(n_parts)], "part int").repartition(
        n_parts, "part"
    )
    parts.mapInPandas(gen, schema).write.mode("overwrite").parquet(out_dir)


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spark_validate.chunking import SizeBasedChunker
    from spark_validate.drift.embedding import EmbeddingDriftCalculator

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .appName("bench_embedding_drift")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="bench_embdrift_")
    data = os.path.join(tmp, "vectors")
    t0 = time.time()
    synth(spark, data)
    t_synth = time.time() - t0

    df = spark.read.parquet(data)
    ref = df.filter(F.col("vec_id") % 2 == 0)
    ana = df.filter(F.col("vec_id") % 2 == 1)
    n_ana = ana.count()

    # index_strategy='scalable': the value-bucketed distributed row index —
    # the 10^12-row path. 'auto' would pick the single-task sort below 5M
    # rows, which benchmarks the small-data convenience path instead.
    calc = EmbeddingDriftCalculator(
        dim=DIM,
        chunker=SizeBasedChunker(
            chunk_size=max(n_ana // 10, 1), order_by=["vec_id"], index_strategy="scalable"
        ),
    )
    t0 = time.time()
    calc.fit(ref)
    t_fit = time.time() - t0

    t0 = time.time()
    res = calc.calculate(ana)
    n_out = res.count()
    t_calc = time.time() - t0

    # codegen health: the metric-input aggregation must stay compiled. A
    # CodegenFallback/interpreted plan is the regression this bench pins.
    # Read the EXECUTED plan (AQE's pre-execution formatted tree never shows
    # WholeStageCodegen wrappers).
    # collect() (not count()) so the inspected QueryExecution is the one that
    # actually ran — count() builds a separate plan and would leave this one
    # unexecuted (isFinalPlan=false, no codegen annotations under AQE)
    wide = calc._chunk_wide(ana)
    wide.collect()
    executed = wide._jdf.queryExecution().toString()
    # executed plans print WholeStageCodegen spans as "*(n) Operator" prefixes
    import re

    wscg_spans = len(set(re.findall(r"\*\((\d+)\)", executed)))

    out = {
        "metric": "embedding_drift_throughput",
        "n_rows": N,
        "dim": DIM,
        "synth_sec": round(t_synth, 2),
        "fit_sec": round(t_fit, 2),
        "calculate_sec": round(t_calc, 2),
        "calculate_rows_per_sec": round(n_ana / t_calc),
        "result_rows": n_out,
        "wholestage_codegen_spans": wscg_spans,
        "unit": "rows/sec",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
