"""1M-row throughput microbench: caption consistency / election / joint drift.

Prints one JSON line per op. Run on an idle host:
    python tools/bench_consistency.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_validate.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_consistency", cores=cpus, shuffle_partitions=cpus)

    # image-shaped corpus: ~5 rows per phash group, ~2% of groups conflicted
    rid = F.col("id")
    df = (
        spark.range(0, n, 1, cpus * 2)
        .select(
            rid.alias("image_id"),
            (rid % (n // 5)).alias("phash"),
            F.when(
                (F.pmod(F.xxhash64(rid), F.lit(50)) == 0),
                F.concat(F.lit("variant-"), rid.cast("string")),
            )
            .otherwise(F.concat(F.lit("caption-"), (rid % (n // 5)).cast("string")))
            .alias("caption"),
            (rid * 7 % 101).cast("int").alias("w"),
            (rid * 13 % 101).cast("int").alias("h"),
        )
        .persist()
    )
    df.count()  # materialize the input outside the timed region

    from spark_validate.chunking import PartitionChunker
    from spark_validate.drift.joint import JointHistogramDrift
    from spark_validate.image.consistency import (
        CaptionConsistencyCheck,
        elect_canonical_captions,
    )

    chunker = PartitionChunker()
    out = {}

    t0 = time.time()
    cc = CaptionConsistencyCheck(chunker=chunker)
    res = cc.calculate(df)
    rows = res.count()
    w = time.time() - t0
    out["caption_consistency"] = {"secs": round(w, 2), "rows_per_sec": round(n / w), "chunks": rows}

    t0 = time.time()
    el = elect_canonical_captions(df)
    n_groups = el.count()
    w = time.time() - t0
    out["caption_election"] = {"secs": round(w, 2), "rows_per_sec": round(n / w), "groups": n_groups}

    t0 = time.time()
    jd = JointHistogramDrift("w", "h", chunker=chunker).fit(df)
    fit_w = time.time() - t0
    t0 = time.time()
    rows = jd.calculate(df).count()
    calc_w = time.time() - t0
    out["joint_drift"] = {
        "fit_secs": round(fit_w, 2),
        "calc_secs": round(calc_w, 2),
        "calc_rows_per_sec": round(n / calc_w),
        "chunks": rows,
    }

    from spark_validate.drift.grouped import GroupedDriftCalculator

    gdf = df.withColumn("fmt", F.element_at(F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")), (F.col("image_id") % 3 + 1).cast("int")))
    t0 = time.time()
    gd = GroupedDriftCalculator(
        "w", "fmt", chunker=chunker, categorical_methods=(), n_bins_doane=10
    ).fit(gdf)
    fit_w = time.time() - t0
    t0 = time.time()
    rows = gd.calculate(gdf).count()
    calc_w = time.time() - t0
    gd.release_cache()
    out["grouped_drift"] = {
        "fit_secs": round(fit_w, 2),
        "calc_secs": round(calc_w, 2),
        "calc_rows_per_sec": round(n / calc_w),
        "series": rows,
    }

    print(json.dumps({"n_rows": n, "cpus": cpus, "ops": out}))


if __name__ == "__main__":
    main()
