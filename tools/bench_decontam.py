"""Benchmark decontamination + deterministic sampling at 1M+ documents.

Synthesizes N ~30-token training docs from a 50k vocab, a B-doc benchmark
set from a DISJOINT vocab, and N/200 planted verbatim benchmark copies in
the training side, then times:

1. ngram_overlap (broadcast benchmark universe, n=5) — reports docs/s and
   planted-copy detection (all planted must flag contaminated at rate 1.0;
   the disjoint-vocab clean docs must not)
2. stratified deterministic sampling over a synthetic lang column —
   reports docs/s (a narrow filter: this measures scan+hash throughput)
   and per-stratum achieved rates

Usage: python tools/bench_decontam.py [n_rows] [bench_rows]
Prints one JSON line; used for BENCH/BASELINE.md §6d.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
PLANTED = N // 200
SEED = 11
WORDS = 30


def synth(spark):
    from pyspark.sql import functions as F

    def words(prefix, vocab, seed):
        return F.array(
            *[
                F.concat(
                    F.lit(prefix),
                    F.pmod(F.xxhash64(F.col("id"), F.lit(seed + j)), F.lit(vocab)).cast("string"),
                )
                for j in range(WORDS)
            ]
        )

    # training docs: vocab w0..w49999; benchmark: DISJOINT vocab b0..b19999
    train = spark.range(N).select(
        F.col("id").alias("doc_id"), F.array_join(words("w", 50_000, SEED), " ").alias("text")
    )
    bench = spark.range(B).select(
        F.col("id").alias("doc_id"), F.array_join(words("b", 20_000, SEED + 100), " ").alias("text")
    )
    # planted verbatim benchmark copies (cycled) appended to the train side
    planted = (
        spark.range(PLANTED)
        .select(F.pmod(F.col("id"), F.lit(B)).alias("bid"), (F.col("id") + N).alias("doc_id"))
        .join(bench.select(F.col("doc_id").alias("bid"), "text"), "bid")
        .select("doc_id", "text")
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("es"), F.lit("fr"), F.lit("zh")),
        (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(3)), F.lit(5)) + 1).cast("int"),
    )
    return train.unionByName(planted).withColumn("lang", lang), bench


def main():
    from pyspark.sql import functions as F

    from spark_validate.session import get_spark
    from spark_validate.text import ngram_overlap, stratified_sample

    spark = get_spark("bench_decontam", cores=32, shuffle_partitions=64)
    docs, bench = synth(spark)
    docs = docs.localCheckpoint(eager=True)  # synth untimed
    bench = bench.localCheckpoint(eager=True)
    out = {"rows": N + PLANTED, "bench_rows": B}

    t0 = time.time()
    ov = ngram_overlap(docs, bench, n=5, threshold=0.5)
    agg = ov.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.col("contaminated").cast("long")).alias("flagged"),
        F.sum((F.col("contaminated") & (F.col("id") >= N)).cast("long")).alias("planted_hit"),
        F.sum((F.col("contaminated") & (F.col("id") < N)).cast("long")).alias("false_pos"),
    ).first()
    wall = time.time() - t0
    out["decontam"] = {
        "wall_s": round(wall, 1),
        "docs_per_sec": round((N + PLANTED) / wall, 1),
        "flagged": agg["flagged"],
        "planted": PLANTED,
        "planted_recall": round(agg["planted_hit"] / PLANTED, 4),
        "false_positives": agg["false_pos"],
    }

    t1 = time.time()
    samp = stratified_sample(
        docs, {"en": 0.8, "de": 0.5, "es": 0.5, "fr": 0.25, "zh": 0.1}, stratum_col="lang"
    )
    got = {r["lang"]: r["n"] for r in samp.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    wall = time.time() - t1
    out["sampling"] = {
        "wall_s": round(wall, 1),
        "docs_per_sec": round((N + PLANTED) / wall, 1),
        "achieved_rates": {k: round(got.get(k, 0) / base[k], 4) for k in sorted(base)},
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
