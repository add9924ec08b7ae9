"""Text dedup at 1M+ documents: signatures, LSH sweep, clusters, simhash.

Synthesizes N ~30-token documents + N/100 planted near-dup twins (one word
appended — shingle Jaccard ≈ 0.96 at k=6), then times:

1. MinHash signatures (32 hashes, k=6) — the codegen window-shingle pipeline
2. full near-dup pair sweep (signatures → 16-band LSH → Jaccard ≥ 0.8
   verify), reporting planted-pair recall
3. near_duplicate_clusters (pairs → connected components → keep flags)
4. SimHash fingerprints (60-bit, Arrow token-voting kernel)

Usage: python tools/bench_text_dedup.py [n_rows]
Prints one JSON line; used for BENCH/BASELINE.md §6.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
TWINS = N // 100
SEED = 7
WORDS = 30


def synth(spark):
    from pyspark.sql import functions as F

    # deterministic pseudo-text: 30 words drawn from a 50k vocab by hashing
    words = F.array(
        *[
            F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id"), F.lit(SEED + j)), F.lit(50_000)).cast("string"))
            for j in range(WORDS)
        ]
    )
    base = spark.range(N).select(F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text"))
    twins = (
        spark.range(TWINS)
        .select(
            (F.col("id") + N).alias("doc_id"),
            F.concat(F.array_join(words, " "), F.lit(" extraword")).alias("text"),
        )
    )
    return base.unionByName(twins)


def main():
    from pyspark.sql import functions as F

    from spark_validate.session import get_spark
    from spark_validate.text import (
        lsh_candidate_pairs,
        minhash_signatures,
        near_duplicate_clusters,
        ngram_jaccard,
        simhash,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_text_dedup", cores=cpus, shuffle_partitions=cpus)
    docs = synth(spark).repartition(cpus * 2).localCheckpoint(eager=True)
    n_docs = docs.count()
    out = {"n_docs": n_docs, "planted": TWINS}

    t0 = time.time()
    sigs = minhash_signatures(docs, n_hashes=32, shingle_k=6)
    sigs.write.format("noop").mode("overwrite").save()
    out["signatures_s"] = round(time.time() - t0, 1)
    out["signatures_docs_per_s"] = round(n_docs / out["signatures_s"])

    t0 = time.time()
    sigs = minhash_signatures(docs, n_hashes=32, shingle_k=6)
    pairs = lsh_candidate_pairs(sigs, n_bands=16, max_bucket=200, n_hashes=32)
    verified = ngram_jaccard(docs, pairs, shingle_k=6).filter(F.col("jaccard") >= 0.8)
    found = verified.filter((F.col("id_a") < N) & (F.col("id_b") >= N)).count()
    out["pair_sweep_s"] = round(time.time() - t0, 1)
    out["pair_sweep_docs_per_s"] = round(n_docs / out["pair_sweep_s"])
    out["planted_recall"] = round(found / TWINS, 4)

    t0 = time.time()
    cl = near_duplicate_clusters(docs, threshold=0.8, n_hashes=32, shingle_k=6, n_bands=16)
    kept = cl.filter("keep").count()
    out["clusters_s"] = round(time.time() - t0, 1)
    out["kept_docs"] = kept
    out["dedup_ratio"] = round(1.0 - kept / n_docs, 4)

    t0 = time.time()
    simhash(docs).write.format("noop").mode("overwrite").save()
    out["simhash_s"] = round(time.time() - t0, 1)
    out["simhash_docs_per_s"] = round(n_docs / out["simhash_s"])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
