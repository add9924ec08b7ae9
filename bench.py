"""Benchmark harness — prints ONE JSON line per the driver contract.

Three sections:

1. ``queries`` — every ``__spark_entry__.queries()`` entry timed at
   ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
   ``local[$SPARK_GRAFT_CPUS]``.
2. ``image_suite`` — the north-rule validation suite (column stats, domain,
   uniqueness, referential, drift, payload PSNR) over a synthesized
   image+caption table; reports images/sec.
3. ``scaling`` — the same image suite at local[N] and local[4N] cores on the
   SAME input, reporting throughput at both plus
   ``efficiency = thr_4N / (4 × thr_N)`` (sandbox proxy for the N vs 4N
   executor criterion; same-machine caveat: shared memory bandwidth makes
   this a lower bound).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_IMAGE_ROWS,
BENCH_SKIP_SCALING=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
IMAGE_ROWS = int(os.environ.get("BENCH_IMAGE_ROWS", "2000000"))
SKIP_SCALING = os.environ.get("BENCH_SKIP_SCALING", "") == "1"


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_queries(spark) -> dict:
    import __spark_entry__ as entry

    times = {}
    for name, fn in entry.queries().items():
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        _ = n
    return times


_IMG_DIR = None


def build_image_tables(spark, n_rows, parts):
    """Materialize the synthetic tables to parquet ONCE (the real workload
    reads a stored Iceberg/parquet table; regenerating payload bytes per
    action would bench the generator, not the engine)."""
    global _IMG_DIR
    import tempfile

    from spark_validate.image import synth_image_table

    if _IMG_DIR is None:
        _IMG_DIR = tempfile.mkdtemp(prefix="svbench_img_")
        synth_image_table(spark, n_rows, n_partitions=parts, dup_rate=0.0, orphan_rate=0.0).write.mode(
            "overwrite"
        ).parquet(f"{_IMG_DIR}/ref")
        synth_image_table(
            spark, n_rows, n_partitions=parts, dup_rate=0.0001, orphan_rate=0.001,
            unseen_fmt_rate=0.001, drift=False, seed=42,  # same seed → PSNR joins line up
        ).write.mode("overwrite").parquet(f"{_IMG_DIR}/ana")
    return spark.read.parquet(f"{_IMG_DIR}/ref"), spark.read.parquet(f"{_IMG_DIR}/ana")


def run_image_suite(spark, n_rows, parts) -> dict:
    from spark_validate.suite import ImageValidationSuite

    ref, ana = build_image_tables(spark, n_rows, parts)
    suite = ImageValidationSuite()
    t0 = time.time()
    report = suite.run_and_collect(ref, ana)
    wall = time.time() - t0
    return {
        "rows": n_rows,
        "wall_s": round(wall, 2),
        "images_per_sec": round(n_rows / wall, 1),
        "checks": {k: {kk: vv for kk, vv in v.items() if kk != "secs"} for k, v in report.items()},
    }


def new_session(cores: int):
    from pyspark.sql import SparkSession

    from spark_validate.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        # new master requires a fresh context
        SparkSession._instantiatedSession = None
    return get_spark("bench", cores=cores, shuffle_partitions=cores)


def main():
    out = {"metric": "suite_wall_time", "unit": "sec", "sf": _sf_from_dir(SF_DIR)}

    spark = new_session(CPUS)
    t0 = time.time()
    out["queries"] = run_queries(spark)
    queries_wall = time.time() - t0

    t1 = time.time()
    img = run_image_suite(spark, IMAGE_ROWS, CPUS * 2)
    img_wall = time.time() - t1
    out["image_suite"] = img

    out["value"] = round(queries_wall + img_wall, 2)

    if not SKIP_SCALING:
        n_small = max(CPUS // 4, 1)
        rows = IMAGE_ROWS
        # same input (same synth parameters) at N and 4N cores
        spark = new_session(n_small)
        t0 = time.time()
        run_image_suite(spark, rows, n_small * 2)
        t_n = time.time() - t0
        spark = new_session(CPUS)
        t0 = time.time()
        run_image_suite(spark, rows, CPUS * 2)
        t_4n = time.time() - t0
        thr_n, thr_4n = rows / t_n, rows / t_4n
        out["scaling"] = {
            "cores_n": n_small,
            "cores_4n": CPUS,
            "throughput_n": round(thr_n, 1),
            "throughput_4n": round(thr_4n, 1),
            "efficiency": round(thr_4n / (4 * thr_n), 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
