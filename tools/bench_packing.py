"""Sequence packing + split at 1M+ documents: throughput + invariants.

Synthesizes N docs with deterministic token counts (uniform 1..1023, so
~512 tokens/doc — straddlers and multi-doc packs both common at ctx=2048),
then times:

1. with_split — train/val/test assignment (narrow projection)
2. pack_sequences — concat-and-chunk slices (bucket window + explode),
   verifying token conservation and full-pack fill
3. pack_sequences_greedy — per-bucket Arrow greedy walk, verifying the
   never-overflow invariant

Usage: python tools/bench_packing.py [n_rows]
Prints one JSON line; used for BENCH/BASELINE.md §6.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CTX = 2048
BUCKETS = 256


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spark_validate.text.packing import pack_sequences, pack_sequences_greedy
    from spark_validate.text.sampling import with_split

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    docs = spark.range(N).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(1023)) + 1).alias("token_count"),
    )
    docs.write.mode("overwrite").parquet("/tmp/bench_packing_docs")
    docs = spark.read.parquet("/tmp/bench_packing_docs")
    total_tokens = docs.agg(F.sum("token_count")).first()[0]

    out = {"rows": N, "ctx": CTX, "buckets": BUCKETS, "total_tokens": int(total_tokens)}

    t0 = time.time()
    split_counts = {
        r["split"]: r["n"]
        for r in with_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out["split_s"] = round(time.time() - t0, 2)
    out["split_docs_per_s"] = int(N / out["split_s"])
    out["split_train_frac"] = round(split_counts["train"] / N, 4)

    t0 = time.time()
    packed = pack_sequences(docs, context_len=CTX, n_buckets=BUCKETS)
    inv = packed.agg(
        F.sum("slice_len").alias("tok"),
        F.count(F.lit(1)).alias("slices"),
        F.max(F.col("slice_start") + F.col("slice_len")).alias("max_end"),
    ).first()
    out["pack_s"] = round(time.time() - t0, 2)
    out["pack_docs_per_s"] = int(N / out["pack_s"])
    out["pack_conserves"] = int(inv["tok"]) == int(total_tokens)
    out["pack_slices"] = int(inv["slices"])
    out["pack_bounds_ok"] = int(inv["max_end"]) <= CTX

    t0 = time.time()
    greedy = pack_sequences_greedy(docs, context_len=CTX, n_buckets=BUCKETS)
    g = (
        greedy.join(docs, "doc_id")
        .groupBy("bucket", "pack_index")
        .agg(F.sum("token_count").alias("tot"), F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("packs"),
            F.sum(((F.col("tot") > CTX) & (F.col("n") > 1)).cast("int")).alias("overflow"),
            F.avg("tot").alias("avg_fill"),
        )
        .first()
    )
    out["greedy_s"] = round(time.time() - t0, 2)
    out["greedy_docs_per_s"] = int(N / out["greedy_s"])
    out["greedy_packs"] = int(g["packs"])
    out["greedy_overflow_packs"] = int(g["overflow"])
    out["greedy_fill_ratio"] = round(float(g["avg_fill"]) / CTX, 4)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
