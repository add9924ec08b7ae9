"""Benchmark the codegen scrubbing ops (PII counts+redaction, URL
extraction+blocklist) at 1M+ documents.

Synthesizes N ~25-word docs; every 10th doc gets an email + phone span and
every 15th a blocklisted URL. Times one full pass per op (count aggregate
drains the scan) and checks planted recall exactly.

Usage: python tools/bench_scrub.py [n_rows]
Prints one JSON line; used for BENCH/BASELINE.md §6d4.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
SEED = 41
WORDS = 25


def synth(spark):
    from pyspark.sql import functions as F

    words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(SEED + j)), F.lit(20_000)).cast("string"),
        )
        for j in range(WORDS)
    ]
    base = F.array_join(F.array(*words), " ")
    pii = F.when(
        F.col("id") % 10 == 0,
        F.concat(
            F.lit(" mail u"),
            F.col("id").cast("string"),
            F.lit("@host.example call (415) 555-0100"),
        ),
    ).otherwise(F.lit(""))
    url = F.when(
        F.col("id") % 15 == 0,
        F.concat(F.lit(" see http://cdn.blocked.example/i"), F.col("id").cast("string")),
    ).otherwise(F.lit(""))
    return spark.range(N).select(
        F.col("id").alias("doc_id"), F.concat(base, pii, url).alias("text")
    )


def main():
    from pyspark.sql import functions as F

    from spark_validate.session import get_spark
    from spark_validate.text import redact_pii, with_blocklist_flags, with_pii_counts

    spark = get_spark()
    docs = synth(spark).persist()
    n = docs.count()  # materialize so the timed passes measure the ops

    t0 = time.time()
    pii = (
        with_pii_counts(docs)
        .agg(
            F.sum(F.col("has_pii").cast("long")).alias("pii_docs"),
            F.sum("n_email").alias("emails"),
            F.sum("n_phone").alias("phones"),
        )
        .collect()[0]
    )
    pii_s = time.time() - t0

    t1 = time.time()
    red = (
        redact_pii(docs, "text", out_col="clean")
        .agg(F.sum(F.length("clean")).alias("chars"))
        .collect()[0]
    )
    red_s = time.time() - t1

    t2 = time.time()
    urls = (
        with_blocklist_flags(docs, ["blocked.example"])
        .agg(
            F.sum(F.col("is_blocked").cast("long")).alias("blocked_docs"),
            F.sum("n_urls").alias("urls"),
        )
        .collect()[0]
    )
    url_s = time.time() - t2
    docs.unpersist()

    planted_pii = (N + 9) // 10
    planted_url = (N + 14) // 15
    print(
        json.dumps(
            {
                "op": "scrubbing",
                "rows": n,
                "pii_scan_s": round(pii_s, 2),
                "pii_docs_per_sec": round(N / pii_s, 1),
                "redact_s": round(red_s, 2),
                "url_scan_s": round(url_s, 2),
                "url_docs_per_sec": round(N / url_s, 1),
                "pii_recall": round(int(pii["pii_docs"]) / planted_pii, 6),
                "emails_found": int(pii["emails"]),
                "phones_found": int(pii["phones"]),
                "url_recall": round(int(urls["blocked_docs"]) / planted_url, 6),
            }
        )
    )


if __name__ == "__main__":
    main()
