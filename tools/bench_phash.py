"""phash near-dup at 1M+ vectors: minimal vs Manku multi-block construction.

Synthesizes N random 64-bit phashes + N/100 planted ≤4-flip twins, runs
`phash_near_duplicates` at n_blocks = 5 (minimal pigeonhole) and 8 (Manku
C(8,4)=70 tables × 32-bit keys) and reports wall, planted recall (must be
1.0 for both — the guarantee), and the random-candidate load the cap/verify
had to absorb.

Usage: python tools/bench_phash.py [n_rows] [n_blocks,n_blocks,…]

The second argument restricts the constructions: at ≥10M rows the minimal
construction's random-candidate load is O(n²) (≈37B verifies at 10M —
dead by design; see BENCH/BASELINE.md §6b2), so the 10M tier runs Manku
only (`bench_phash.py 10000000 8`).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BLOCKS = tuple(int(x) for x in sys.argv[2].split(",")) if len(sys.argv) > 2 else (5, 8)
PAIRS = N // 100
SEED = 13


def synth(spark):
    from pyspark.sql import functions as F

    base = (
        spark.range(N)
        .select(
            F.concat(F.lit("im"), F.col("id").cast("string")).alias("image_id"),
            F.xxhash64(F.col("id"), F.lit(SEED)).alias("phash"),
        )
    )
    # twins: flip 4 deterministic id-dependent bits of the first PAIRS hashes
    flip = F.expr(
        "shiftleft(1L, cast(id % 61 as int)) | shiftleft(1L, cast((id*7+11) % 61 as int)) "
        "| shiftleft(1L, cast((id*13+29) % 61 as int)) | shiftleft(1L, cast((id*23+43) % 61 as int))"
    )
    twins = (
        spark.range(PAIRS)
        .select(
            F.concat(F.lit("tw"), F.col("id").cast("string")).alias("image_id"),
            F.xxhash64(F.col("id"), F.lit(SEED)).bitwiseXOR(flip).alias("phash"),
        )
    )
    return base.unionByName(twins)


def main():
    from pyspark.sql import functions as F

    from spark_validate.image.phash import phash_near_duplicates
    from spark_validate.session import get_spark

    spark = get_spark("bench_phash", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    import tempfile

    d = tempfile.mkdtemp(prefix="svbench_ph_")
    synth(spark).write.mode("overwrite").parquet(d)
    df = spark.read.parquet(d)
    n = df.count()
    out = {"n_rows": n, "planted_pairs": PAIRS, "configs": {}}
    for nb in BLOCKS:
        t0 = time.time()
        # persist the pair RESULT before deriving the two report counts —
        # the earlier version recomputed the whole banded sweep for each
        # count, so every reported wall paid the sweep twice
        pairs = phash_near_duplicates(df, max_hamming=4, n_blocks=nb, max_bucket=100_000).persist()
        planted = pairs.filter(
            F.col("id_a").startswith("im") & F.col("id_b").startswith("tw")
            | F.col("id_a").startswith("tw") & F.col("id_b").startswith("im")
        ).count()
        total = pairs.count()
        wall = time.time() - t0
        pairs.unpersist()
        out["configs"][f"n_blocks={nb}"] = {
            "wall_s": round(wall, 1),
            "hashes_per_sec": round(n / wall),
            "pairs_found": total,
            "planted_recall": round(planted / PAIRS, 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
