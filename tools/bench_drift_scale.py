"""Drift-at-scale evidence: UnivariateDriftCalculator over 10M+ rows.

Deterministic synthetic table (spark.range + xxhash64-derived uniforms — no
driver data), reference vs analysis with a mean shift injected in the last
quarter. Times fit (reference histograms) and calculate (analysis pass:
ALL continuous methods × 2 columns from ONE exploded histogram shuffle +
one categorical counts shuffle).

Usage: python tools/bench_drift_scale.py [n_rows]   (default 10_000_000)
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000


def synth(spark, n):
    from pyspark.sql import functions as F

    # uniform in [0,1) from a 64-bit avalanche hash — deterministic, no RNG state
    u = lambda salt: (F.xxhash64(F.col("id"), F.lit(salt)).cast("double") / F.lit(2.0**64)) + F.lit(0.5)  # noqa: E731
    df = (
        spark.range(n)
        .withColumn("u1", u(1))
        .withColumn("u2", u(2))
        .withColumn("u3", u(3))
        .withColumn("is_ana", F.col("id") >= n // 2)
        .withColumn("drifted", F.col("id") >= (3 * n) // 4)
    )
    return (
        df.select(
            "id",
            "is_ana",
            # 8 weeks per period half → PeriodBasedChunker is a pure expression
            # (the scale-path chunker: no row index, no count jobs)
            F.timestamp_seconds(
                (F.lit(1700000000.0) + (F.col("id") % (n // 2)) / F.lit(float(n // 2)) * F.lit(4838400.0)).cast("long")
            ).alias("ts"),
            # price: lognormal-ish, +15% scale shift when drifted
            (F.exp(F.lit(2.0) + F.lit(1.2) * (F.col("u1") + F.col("u2") - 1)) * F.when(F.col("drifted"), 1.15).otherwise(1.0)).alias("price"),
            # qty: uniform integers, distribution change when drifted
            (F.floor(F.col("u2") * F.when(F.col("drifted"), 70).otherwise(50)) + 1).cast("double").alias("qty"),
            # category: skewed 8-way, re-skewed when drifted
            F.concat(F.lit("c"), F.floor(F.pow(F.col("u3"), F.when(F.col("drifted"), 2.0).otherwise(3.0)) * 8).cast("int").cast("string")).alias("cat"),
        )
    )


def main():
    from spark_validate.chunking import PeriodBasedChunker
    from spark_validate.drift.univariate import UnivariateDriftCalculator
    from spark_validate.session import get_spark

    spark = get_spark("bench_drift_scale", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    df = synth(spark, N)
    ref = df.filter("NOT is_ana")
    ana = df.filter("is_ana")
    calc = UnivariateDriftCalculator(
        column_names=["price", "qty", "cat"],
        continuous_methods=["jensen_shannon", "kolmogorov_smirnov", "wasserstein", "hellinger", "psi"],
        categorical_methods=["jensen_shannon", "chi2", "l_infinity", "hellinger"],
        chunker=PeriodBasedChunker(offset="W", timestamp_column="ts"),
    )
    t0 = time.time()
    calc.fit(ref)
    fit_s = time.time() - t0
    t0 = time.time()
    res = calc.calculate(ana)
    rows = res.count()
    alerts = res.filter("alert").count()
    calc_s = time.time() - t0
    calc.release_cache()
    out = {
        "n_rows": N,
        "fit_s": round(fit_s, 1),
        "calculate_s": round(calc_s, 1),
        "rows_per_sec_calculate": round(N / 2 / calc_s),
        "result_rows": rows,
        "alerts": alerts,
        "methods": 5 * 2 + 4,  # 5 continuous × 2 cols + 4 categorical × 1 col
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
