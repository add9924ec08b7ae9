"""A/B harness for the cluster-op regression (round-4 verdict item #1).

Times the three dedup-cluster registry queries idle-to-idle at a given SF
dir, printing one JSON line. Run before/after an engine change to isolate
the cluster ops from the common-query tide:

    python tools/bench_clusters_ab.py [sf_dir] [label]
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    label = sys.argv[2] if len(sys.argv) > 2 else "run"
    from spark_validate.session import get_spark

    import __spark_entry__ as E

    spark = get_spark()
    qs = E.queries()
    names = ["dedup_clusters", "embedding_clusters", "phash_clusters"]
    # warm the session + parquet cache with one unrelated query
    qs["count_chunks"](spark, sf_dir).collect()
    out = {}
    for name in names:
        t0 = time.time()
        n = len(qs[name](spark, sf_dir).collect())
        out[name] = {"secs": round(time.time() - t0, 2), "rows": n}
    print(json.dumps({"label": label, "sf_dir": sf_dir, "clusters": out}))


if __name__ == "__main__":
    main()
