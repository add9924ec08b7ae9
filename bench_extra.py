"""Extra benchmarks for optimization work (guide §1) — NOT the driver contract.

Times a subset of ``__spark_entry__.queries()`` with the same methodology as
bench.py (df.count() after build, fit split via _FIT_LOG), optionally:

- ``--only a,b,c``   run only the named queries
- ``--repeat N``     repeat each query N times, report min (default 1)
- ``--explain DIR``  also write .explain("formatted") per query to DIR
- ``--noop``         additionally time a noop-sink materialization (full
                     columns, guide §1.4) alongside the count() timing

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line {"queries": {...}, "splits": {...}, "noop": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", default="")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    from bench import new_session

    import __spark_entry__ as entry

    spark = new_session(CPUS)
    only = {s for s in args.only.split(",") if s}
    times, splits, noop_t = {}, {}, {}
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best, best_split = None, None
        for _ in range(args.repeat):
            entry._FIT_LOG.clear()
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.count()
            total = time.time() - t0
            fit_s = sum(entry._FIT_LOG)
            if best is None or total < best:
                best = total
                best_split = {"fit_s": round(fit_s, 3), "calc_s": round(total - fit_s, 3)}
        times[name] = round(best, 3)
        if best_split and best_split["fit_s"] > 0:
            splits[name] = best_split
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if args.noop:
            df = fn(spark, SF_DIR)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            noop_t[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {times[name]}s", file=sys.stderr)
    out = {"sf_dir": SF_DIR, "queries": times, "splits": splits}
    if noop_t:
        out["noop"] = noop_t
    print(json.dumps(out))


if __name__ == "__main__":
    main()
