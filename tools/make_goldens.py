"""Freeze golden outputs for the fitted-model queries the DuckDB oracle
cannot express (isotonic CBPE, PCA reconstruction, GBDT domain classifier).

These queries are deterministic end to end — seeded fits, 9-decimal rounded
outputs (partition-order float noise ~1e-15 vanishes at the rounding), and
cross-session-shape stability is asserted below by re-running each query
under a second, deliberately different Spark configuration (32 cores, 1 MB
file splits vs 8 cores default splits) and requiring an identical value
hash. The frozen parquet then serves as the oracle: ``oracle_sql()`` reads
it via DuckDB ``read_parquet`` keyed on the events row count (so one SQL
string selects the right scale factor's golden), upgrading these entries
from rows-only to full rows+schema+hash checks. Closeness of the underlying
math to the reference pipeline is covered separately by the numpy-replica
tests (tests/test_cbpe.py, test_multivariate.py).

Usage: python tools/make_goldens.py [sf_dir ...]
       (default: /root/testdata/sf0.001 /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_QUERIES = [
    "cbpe_estimated_accuracy",
    "cbpe_multiclass",
    "pca_reconstruction",
    "domain_classifier",
    "dle_estimated_mae",
    "continuous_dist",
]


def _fresh_session(cores, shuffle, extra=None):
    from pyspark.sql import SparkSession

    from spark_validate.session import get_spark

    act = SparkSession.getActiveSession()
    if act is not None:
        act.stop()
        SparkSession._instantiatedSession = None
    return get_spark("goldens", cores=cores, shuffle_partitions=shuffle, extra_conf=extra or {})


def main():
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    from tools.check_oracle import frame_hash

    results = {}  # (sf_dir, name) -> (pdf, n_events)
    for cfg_i, (cores, shuffle, extra) in enumerate(
        [(8, 8, {}), (32, 32, {"spark.sql.files.maxPartitionBytes": "1m"})]
    ):
        spark = _fresh_session(cores, shuffle, extra)
        import importlib

        import __spark_entry__ as E

        importlib.reload(E)
        qs = E.queries()
        for sf_dir in sf_dirs:
            n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
            for name in GOLDEN_QUERIES:
                pdf = qs[name](spark, sf_dir).toPandas()
                key = (sf_dir, name)
                if cfg_i == 0:
                    results[key] = (pdf, n_events)
                else:
                    prev_hash = frame_hash(results[key][0])
                    if frame_hash(pdf) != prev_hash:
                        raise SystemExit(
                            f"NON-DETERMINISTIC across session shapes: {name} @ {sf_dir}"
                        )
                    print(f"stable  {name} @ {os.path.basename(sf_dir)} ({len(pdf)} rows)")

    for (sf_dir, name), (pdf, n_events) in results.items():
        base = os.path.basename(sf_dir.rstrip("/"))
        out_dir = os.path.join(REPO, "goldens", base)
        os.makedirs(out_dir, exist_ok=True)
        pdf = pdf.copy()
        pdf["_n_events"] = int(n_events)  # scale-factor key for the static SQL
        path = os.path.join(out_dir, f"{name}.parquet")
        pdf.to_parquet(path, engine="pyarrow", index=False)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
