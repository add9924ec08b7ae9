"""Physical-plan regression guards — the scale properties the engine is
designed around, asserted on the actual Catalyst output so they cannot
silently rot:

* no row-at-a-time Python UDFs anywhere (Arrow-only Python surface),
* no cartesian products in any query plan,
* predicate pushdown + column pruning reach the parquet scan,
* small dimension joins broadcast,
* the scalable row index never collapses to a single-task global sort.
"""

import os

import pytest

SF_DIR = os.environ.get("SPARK_VALIDATE_TEST_SF", "/root/testdata/sf0.001")


def plan_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def entry_queries():
    import __spark_entry__ as entry

    return entry.queries()


def test_no_row_python_udfs_or_cartesians_anywhere(spark, entry_queries):
    """Every driver-contract query compiles without BatchEvalPython (row-wise
    Python, the 10-100x-slower-than-Arrow path) and without CartesianProduct
    (the quadratic join that kills any 100TB run)."""
    offenders = {}
    for name, fn in entry_queries.items():
        p = plan_str(fn(spark, SF_DIR))
        bad = [m for m in ("BatchEvalPython", "CartesianProduct") if m in p]
        if bad:
            offenders[name] = bad
    assert not offenders, f"scale-hostile operators in plans: {offenders}"


def test_scan_pushdown_and_column_pruning(spark, entry_queries):
    """The chunked stats query must push its reference-period timestamp
    filter into the parquet scan and read only the referenced columns —
    at 100TB a full-width unpushed scan is the whole job's cost."""
    p = plan_str(entry_queries["chunk_column_stats"](spark, SF_DIR))
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert pushed and any("l_shipdate" in l and "[]" not in l.replace("[],", "") for l in pushed), pushed
    schemas = [l for l in p.splitlines() if "ReadSchema" in l]
    assert schemas
    for line in schemas:
        # lineitem has 16 columns; the stats pass needs the order key + the
        # analyzed columns only
        n_cols = line.split("struct<", 1)[1].count(":")
        assert n_cols <= 6, f"scan reads {n_cols} columns: {line}"


def test_referential_check_broadcasts_small_dimension(spark, entry_queries):
    """Orphan detection against a small reference manifest must be a
    broadcast anti/semi join, not a sort-merge shuffle of the fact table."""
    p = plan_str(entry_queries["referential_orphans"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_scalable_row_index_has_no_single_partition_exchange(spark, lineitem):
    """strategy='scalable' must not funnel the table through one task the
    way a global window/sort would (Exchange SinglePartition)."""
    from spark_validate.chunking import with_row_index

    df = with_row_index(lineitem, ["l_shipdate", "l_orderkey", "l_linenumber"], "scalable")
    p = plan_str(df)
    assert "SinglePartition" not in p, p
    # the sort strategy (kept for tiny data) IS the single-task shape
    df_sort = with_row_index(lineitem, ["l_shipdate", "l_orderkey", "l_linenumber"], "sort")
    assert "SinglePartition" in plan_str(df_sort)


def test_drift_histogram_cache_lifecycle(spark, lineitem):
    """The shared per-method histogram is persisted during calculate (its
    branches are NOT deduped by ReuseExchange — measured 2.2x slower without
    the cache) and MUST be released by release_cache(): a leaked persist per
    calculator accumulates executor memory over a long suite."""
    from spark_validate.chunking import SizeBasedChunker
    from spark_validate.drift.univariate import UnivariateDriftCalculator

    import time

    def cached_ids():
        return {r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()}

    order = ["l_shipdate", "l_orderkey", "l_linenumber"]
    ref = lineitem.filter("l_shipdate < DATE'1998-07-01'")
    ana = lineitem.filter("l_shipdate >= DATE'1998-07-01'")
    # Identity-based via the delta of cached RDD ids, not a global count:
    # other tests' non-blocking unpersists drain asynchronously on the shared
    # session, so global counts are racy — but their ids can only DISAPPEAR
    # from storage, never appear, so ids new since `before` belong to this
    # calculator. (df.rdd.id() can't be used directly: the Python-facing
    # .rdd wrapper is a different RDD than the JVM-cached one.)
    before = cached_ids()
    calc = UnivariateDriftCalculator(
        column_names=["l_extendedprice", "l_quantity"],
        continuous_methods=["jensen_shannon", "hellinger", "psi", "wasserstein"],
        chunker=SizeBasedChunker(chunk_size=2000, order_by=order),
    ).fit(ref)
    res = calc.calculate(ana)
    assert res.count() > 0
    # shared histogram lives while results are read
    live = cached_ids() - before
    assert live and len(calc._live_caches) > 0
    calc.release_cache()
    for _ in range(50):  # release is unpersist(blocking=False) — poll
        if not (live & cached_ids()):
            break
        time.sleep(0.2)
    assert not (live & cached_ids())  # and is fully released afterwards


def test_catalog_table_partition_pruning_and_append(spark):
    """Iceberg-shaped evidence (north rule: the input IS a catalog table):
    the image table materialized as a fmt-partitioned catalog table is read
    through the ``table:`` form, and a fmt filter prunes AT THE SCAN — the
    file index serves only the matching partition directories, the sandbox
    analog of Iceberg metadata pruning. Results append back via the
    ``table:`` sink."""
    from pyspark.sql import functions as F

    from spark_validate.image import synth_image_table
    from spark_validate.io import read_table, save_catalog_table, write_results

    img = synth_image_table(spark, 2000, n_partitions=4, dup_rate=0.0, orphan_rate=0.0)
    save_catalog_table(img, "sv_imgcat", partition_by=["fmt"])

    full = read_table(spark, "table:sv_imgcat")
    fmts = [r[0] for r in full.select("fmt").distinct().collect()]
    assert len(fmts) >= 3
    one = read_table(spark, "table:sv_imgcat").filter(F.col("fmt") == fmts[0]).select("image_id", "w")
    # 1) plan: partition filter present at the scan node
    plan = one._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("fmt" in l for l in pf), plan
    # 2) files: the pruned scan serves a strict subset of the table's files
    assert 0 < len(one.inputFiles()) < len(full.inputFiles())
    # 3) results append back through the table: sink (V2 writeTo on Iceberg,
    #    insertInto fallback on the builtin catalog)
    res = one.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.lit(str(fmts[0])).alias("fmt"), "n"
    )
    spark.sql("DROP TABLE IF EXISTS sv_imgcat_results")
    write_results(res, "table:sv_imgcat_results")
    write_results(res, "table:sv_imgcat_results")  # second write = true append
    out = spark.read.table("sv_imgcat_results").collect()
    assert len(out) == 2 and all(r["n"] == one.count() for r in out)
    spark.sql("DROP TABLE IF EXISTS sv_imgcat")
    spark.sql("DROP TABLE IF EXISTS sv_imgcat_results")


def test_read_source_time_travel_plumbing(spark, tmp_path):
    """Snapshot-pinned source config: read_source's dict form carries
    Iceberg time-travel args (snapshot-id / as-of-timestamp reader options)
    and arbitrary reader options. The container has no Iceberg jar, so the
    observable contract is (a) generic options demonstrably reach the
    reader (pathGlobFilter prunes files), (b) time-travel args are
    harmless no-ops on the builtin-catalog stand-in tables (unknown v1
    options are ignored), keeping one config portable across both."""
    from pyspark.sql import functions as F

    from spark_validate.io import read_source, save_catalog_table

    df = spark.range(100).select(F.col("id"), (F.col("id") % 4).alias("part"))
    df.write.mode("overwrite").partitionBy("part").parquet(str(tmp_path / "src"))

    # (a) options reach the path reader: glob restricted to two partitions
    got = read_source(
        spark,
        {"path": str(tmp_path / "src"), "format": "parquet",
         "options": {"pathGlobFilter": "*.parquet", "recursiveFileLookup": "false"}},
    )
    assert got.count() == 100
    two = read_source(
        spark,
        {"path": str(tmp_path / "src") + "/part=[01]", "format": "parquet"},
    )
    assert two.count() == 50

    # (b) snapshot args no-op on a builtin catalog table (Iceberg would
    # honor them; v1 relations ignore unknown reader options)
    save_catalog_table(df, "sv_tt_probe", partition_by=["part"])
    pinned = read_source(
        spark,
        {"path": "table:sv_tt_probe", "snapshot_id": 42,
         "as_of_timestamp": 1700000000000},
    )
    assert pinned.count() == 100
    spark.sql("DROP TABLE IF EXISTS sv_tt_probe")


def test_read_table_csv_user_options_override_defaults(spark, tmp_path):
    """The CSV convenience defaults (header, inferSchema) must lose to
    caller-supplied options — regression: they were applied after the
    options dict and silently clobbered it."""
    from spark_validate.io import read_source

    p = str(tmp_path / "d.csv")
    with open(p, "w") as f:
        f.write("10,20\n30,40\n")
    headerless = read_source(spark, {"path": p, "options": {"header": "false"}})
    assert headerless.count() == 2  # first row is DATA, not a header
    defaulted = read_source(spark, {"path": p})
    assert defaulted.count() == 1  # default header=True consumes row one
