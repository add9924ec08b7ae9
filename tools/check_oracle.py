"""Local replica of the driver's DuckDB-oracle correctness harness.

Runs every ``queries()`` entry via Spark and the matching ``oracle_sql()``
via DuckDB at sf0.01, compares row counts, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if pd.isna(v):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = ["|".join(norm_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from spark_validate.session import get_spark

    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        ok_rows = len(spdf) == len(dpdf)
        ok_schema = sorted(spdf.columns) == sorted(dpdf.columns)
        h1, h2 = frame_hash(spdf), frame_hash(dpdf)
        ok_hash = h1 == h2
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{status} {name}: rows {len(spdf)}/{len(dpdf)} schema={ok_schema} hash={'=' if ok_hash else '≠'} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_schema and ok_rows:
                merged = _diff(spdf, dpdf)
                if merged is not None:
                    print(merged)
    print(f"\n{len(failures)} failures: {failures}")
    sys.exit(1 if failures else 0)


def _diff(a: pd.DataFrame, b: pd.DataFrame, n=5):
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    diffs = []
    for c in cols:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            bad = ~((a[c] == b[c]) | (a[c].isna() & b[c].isna()))
        else:
            bad = a[c].astype(str) != b[c].astype(str)
        if bad.any():
            i = bad.idxmax()
            diffs.append(f"  col {c}: first diff row {i}: spark={a[c][i]!r} duck={b[c][i]!r} (n={bad.sum()})")
    return "\n".join(diffs[:n]) if diffs else None


if __name__ == "__main__":
    main()
