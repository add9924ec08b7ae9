"""Benchmark corpus-common n-gram boilerplate detection at 1M+ documents.

Synthesizes N ~30-token docs from a 50k vocab (so random 5-gram collisions
are essentially zero) and plants a templated 10-token boilerplate span in
every 20th doc, then times `common_ngram_rate` end-to-end (gram frequency
shuffle + semi-join membership + per-doc rates).

Checks, alongside the wall:
  * every planted doc's rate >= the planted-span share (recall 1.0),
  * clean docs' common rate ~0 (random 5-grams from a 50k vocab collide with
    probability ~N*grams/50000^5 — zero at any feasible N).

Usage: python tools/bench_boilerplate.py [n_rows]
Prints one JSON line; used for BENCH/BASELINE.md §6d2.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
SEED = 13
WORDS = 30
PLANT_EVERY = 20
PLANT_WORDS = 10  # templated span length (=> 6 planted 5-grams per doc)


def synth(spark):
    from pyspark.sql import functions as F

    rand_words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(SEED + j)), F.lit(50_000)).cast("string"),
        )
        for j in range(WORDS)
    ]
    plain = F.array_join(F.array(*rand_words), " ")
    planted_span = " ".join(f"tmpl{j}" for j in range(PLANT_WORDS))
    # planted docs: templated span + (WORDS - PLANT_WORDS) random tail words
    tail = F.array_join(F.array(*rand_words[: WORDS - PLANT_WORDS]), " ")
    text = F.when(
        F.col("id") % PLANT_EVERY == 0, F.concat(F.lit(planted_span + " "), tail)
    ).otherwise(plain)
    return spark.range(N).select(F.col("id").alias("doc_id"), text.alias("text"))


def main():
    from pyspark.sql import functions as F

    from spark_validate.session import get_spark
    from spark_validate.text import common_ngram_rate

    spark = get_spark()
    docs = synth(spark)
    # total distinct 5-grams per doc: WORDS - 4 = 26; planted span grams: 6
    plant_rate_floor = (PLANT_WORDS - 4) / (WORDS - 4)

    t0 = time.time()
    out = common_ngram_rate(docs, n=5, min_docs=2, threshold=plant_rate_floor - 1e-9)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("flagged").cast("long")).alias("n_flagged"),
        F.sum(F.when(F.col("doc_id") % PLANT_EVERY == 0, F.col("flagged").cast("long"))).alias(
            "planted_flagged"
        ),
        F.max(F.when(F.col("doc_id") % PLANT_EVERY != 0, F.col("common_rate"))).alias(
            "max_clean_rate"
        ),
    ).collect()[0]
    wall = time.time() - t0

    planted = N // PLANT_EVERY + (1 if N % PLANT_EVERY else 0)
    print(
        json.dumps(
            {
                "op": "common_ngram_rate",
                "rows": N,
                "wall_s": round(wall, 2),
                "docs_per_sec": round(N / wall, 1),
                "planted": planted,
                "planted_flagged": int(agg["planted_flagged"]),
                "recall": round(int(agg["planted_flagged"]) / planted, 6),
                "false_flags": int(agg["n_flagged"]) - int(agg["planted_flagged"]),
                "max_clean_rate": float(agg["max_clean_rate"] or 0.0),
            }
        )
    )


if __name__ == "__main__":
    main()
