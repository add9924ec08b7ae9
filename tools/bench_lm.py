"""Benchmark the bigram-LM perplexity filter at 1M+ documents.

Synthesizes N ~30-token docs from a Zipf-ish 10k vocab (hash-weighted so
common words dominate, like real text) and makes every 25th doc gibberish
(per-doc-unique vocab — fully OOV transitions). Fits on the even half,
scores everything, and checks the planted separation alongside the wall:

  * every HELD-OUT gibberish doc (odd id — fully OOV, unigram-backoff
    floor 1/(N_tokens+V)) must score above every held-out normal doc
    (training-half gibberish is memorized by construction — its own
    bigrams were seen once — so it is excluded from the check),
  * model size stays within the configured top-K caps.

Usage: python tools/bench_lm.py [n_rows]
Prints one JSON line; used for BENCH/BASELINE.md §6d3.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
SEED = 29
WORDS = 30
GIBBERISH_EVERY = 25


def synth(spark):
    from pyspark.sql import functions as F

    # Zipf-ish: word index = hash % (hash2 % 100 + 1)-biased pick over 10k;
    # cheap approximation: square a uniform draw so low ids dominate
    def word(j):
        u = F.pmod(F.xxhash64(F.col("id"), F.lit(SEED + j)), F.lit(10_000)).cast("double")
        idx = F.floor(F.pow(u / 10_000.0, F.lit(2.0)) * 10_000).cast("long")
        return F.concat(F.lit("w"), idx.cast("string"))

    normal = F.array_join(F.array(*[word(j) for j in range(WORDS)]), " ")
    gibberish = F.array_join(
        F.array(
            *[
                F.concat(
                    F.lit("g"),
                    F.col("id").cast("string"),
                    F.lit("x"),
                    F.lit(str(j)),
                )
                for j in range(WORDS)
            ]
        ),
        " ",
    )
    text = F.when(F.col("id") % GIBBERISH_EVERY == 0, gibberish).otherwise(normal)
    return spark.range(N).select(F.col("id").alias("doc_id"), text.alias("text"))


def main():
    from pyspark.sql import functions as F

    from spark_validate.session import get_spark
    from spark_validate.text.lm import NgramLMQuality

    spark = get_spark()
    docs = synth(spark)

    lm = NgramLMQuality(max_vocab=50_000, max_bigrams=200_000)
    t0 = time.time()
    lm.fit(docs.filter(F.col("doc_id") % 2 == 0))
    fit_s = time.time() - t0

    t1 = time.time()
    gib = (F.col("doc_id") % GIBBERISH_EVERY == 0) & (F.col("doc_id") % 2 == 1)
    norm = (F.col("doc_id") % GIBBERISH_EVERY != 0) & (F.col("doc_id") % 2 == 1)
    agg = (
        lm.score(docs)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.when(gib, F.col("cross_entropy"))).alias("min_gib"),
            F.max(F.when(norm, F.col("cross_entropy"))).alias("max_norm"),
        )
        .collect()[0]
    )
    score_s = time.time() - t1

    print(
        json.dumps(
            {
                "op": "lm_quality",
                "rows": N,
                "fit_s": round(fit_s, 2),
                "score_s": round(score_s, 2),
                "docs_per_sec_score": round(N / score_s, 1),
                "model_unigrams": len(lm._uni),
                "model_bigrams": len(lm._bi),
                "min_gibberish_entropy": (
                    round(float(agg["min_gib"]), 4) if agg["min_gib"] is not None else None
                ),
                "max_normal_entropy": (
                    round(float(agg["max_norm"]), 4) if agg["max_norm"] is not None else None
                ),
                # None when N is too small for any held-out gibberish doc
                "separation_ok": (
                    bool(agg["min_gib"] > agg["max_norm"])
                    if agg["min_gib"] is not None and agg["max_norm"] is not None
                    else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
