"""Chunker parity tests vs the reference semantics (nannyml/chunk.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.chunking import (
    CountBasedChunker,
    DefaultChunker,
    PartitionChunker,
    PeriodBasedChunker,
    SizeBasedChunker,
    ROW_INDEX,
    with_row_index,
)


def _mini(spark, n=23):
    pdf = pd.DataFrame(
        {
            "id": range(n),
            "ts": pd.date_range("2020-01-06", periods=n, freq="D"),
            "x": [float(i) for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf)


def test_row_index_strategies_agree(spark):
    df = _mini(spark, 101).repartition(7)
    a = with_row_index(df, ["id"], strategy="sort").select("id", ROW_INDEX).toPandas()
    b = with_row_index(df, ["id"], strategy="scalable").select("id", ROW_INDEX).toPandas()
    a = a.sort_values("id").reset_index(drop=True)
    b = b.sort_values("id").reset_index(drop=True)
    assert (a[ROW_INDEX] == a["id"]).all()
    assert (a[ROW_INDEX].astype("int64") == b[ROW_INDEX].astype("int64")).all()


@pytest.mark.parametrize(
    "incomplete,expected_keys",
    [
        ("keep", ["[0:9]", "[10:19]", "[20:22]"]),
        ("append", ["[0:9]", "[10:22]"]),
        ("drop", ["[0:9]", "[10:19]"]),
    ],
)
def test_size_chunker_incomplete(spark, incomplete, expected_keys):
    # mirrors nannyml/chunk.py:383-408 leftover handling
    df = _mini(spark, 23)
    ch = SizeBasedChunker(chunk_size=10, incomplete=incomplete, order_by=["id"], timestamp_column="ts")
    assigned = ch.assign(df)
    keys = [r["chunk_key"] for r in assigned.select("chunk_key").distinct().orderBy("chunk_key").collect()]
    assert sorted(keys) == sorted(expected_keys)
    hdr = ch.headers(assigned).orderBy("chunk_index").collect()
    assert [h["chunk_key"] for h in hdr] == expected_keys
    if incomplete == "append":
        assert hdr[-1]["n_rows"] == 13
        assert hdr[-1]["end_index"] == 22
    if incomplete == "drop":
        assert sum(h["n_rows"] for h in hdr) == 20


def test_size_chunker_exact_division(spark):
    df = _mini(spark, 20)
    ch = SizeBasedChunker(chunk_size=10, order_by=["id"])
    keys = sorted(r["chunk_key"] for r in ch.assign(df).select("chunk_key").distinct().collect())
    assert keys == ["[0:9]", "[10:19]"]


def test_count_chunker(spark):
    # chunk_size = n // number (nannyml/chunk.py:483-486): 23 // 4 = 5 → 4 full + remainder
    df = _mini(spark, 23)
    ch = CountBasedChunker(chunk_number=4, order_by=["id"])
    hdr = ch.headers(ch.assign(df)).orderBy("chunk_index").collect()
    assert [h["n_rows"] for h in hdr] == [5, 5, 5, 5, 3]
    assert hdr[0]["chunk_key"] == "[0:4]"
    assert hdr[-1]["chunk_key"] == "[20:22]"


def test_default_chunker_is_ten(spark):
    df = _mini(spark, 100)
    ch = DefaultChunker(order_by=["id"])
    assert ch.headers(ch.assign(df)).count() == 10


def test_period_chunker_month_and_week(spark):
    df = _mini(spark, 60)  # 2020-01-06 .. 2020-03-05
    chm = PeriodBasedChunker(offset="M", timestamp_column="ts")
    keys = sorted(r["chunk_key"] for r in chm.assign(df).select("chunk_key").distinct().collect())
    assert keys == ["2020-01", "2020-02", "2020-03"]
    # weekly keys match pandas Period strings (W-SUN): '2020-01-06/2020-01-12'
    chw = PeriodBasedChunker(offset="W", timestamp_column="ts")
    got = sorted(r["chunk_key"] for r in chw.assign(df).select("chunk_key").distinct().collect())
    pdf = df.select("ts").toPandas()
    expected = sorted(str(p) for p in pd.to_datetime(pdf["ts"]).dt.to_period("W").unique())
    assert got == expected


def test_period_headers_have_ts_bounds(spark):
    df = _mini(spark, 60)
    ch = PeriodBasedChunker(offset="M", timestamp_column="ts")
    hdr = ch.headers(ch.assign(df)).orderBy("chunk_index").collect()
    assert hdr[0]["start_ts"] == pd.Timestamp("2020-01-06")
    assert hdr[0]["chunk_index"] == 0


def test_partition_chunker_columns(spark):
    df = _mini(spark, 10).withColumn("part", (F.col("id") % 2).cast("string"))
    ch = PartitionChunker(columns=["part"])
    keys = sorted(r["chunk_key"] for r in ch.assign(df).select("chunk_key").distinct().collect())
    assert keys == ["part=0", "part=1"]


def test_chunker_on_real_lineitem(spark, lineitem):
    ch = SizeBasedChunker(chunk_size=1000, order_by=["l_orderkey", "l_linenumber"])
    hdr = ch.headers(ch.assign(lineitem))
    rows = hdr.orderBy("chunk_index").collect()
    n = lineitem.count()
    assert sum(r["n_rows"] for r in rows) == n
    assert rows[0]["chunk_key"] == "[0:999]"


def test_period_chunker_anchored_week_matches_pandas(spark):
    """W-WED etc. (pandas aliases the reference accepts) produce pandas
    Period-identical 'start/end' keys."""
    import pandas as pd
    from spark_validate.chunking import PeriodBasedChunker

    dates = pd.date_range("2026-01-01", "2026-02-15", freq="D")
    sdf = spark.createDataFrame(pd.DataFrame({"ts": dates}))
    for anchor in ("W-WED", "W-SUN", "W-MON"):
        ch = PeriodBasedChunker(offset=anchor, timestamp_column="ts")
        got = {r.ts: r.chunk_key for r in ch.assign(sdf).collect()}
        for t in dates:
            assert got[t] == str(pd.Period(t, freq=anchor)), (anchor, t)


def test_row_index_null_keys_not_dropped(spark):
    """NULL order keys must not be silently dropped by the value-bucketed
    index — they rank first (nulls-first, like the range partitioner)."""
    import pandas as pd
    from spark_validate.chunking import ROW_INDEX, with_row_index

    pdf = pd.DataFrame({"k": [5.0, None, 1.0, 3.0, None, 2.0], "v": list("abcdef")})
    sdf = spark.createDataFrame(pdf)
    out = with_row_index(sdf, ["k"], strategy="scalable", num_partitions=4).toPandas()
    assert len(out) == 6  # nothing dropped
    assert sorted(out[ROW_INDEX]) == list(range(6))
    # nulls first, then ascending keys
    ordered = out.sort_values(ROW_INDEX)
    assert ordered["k"].iloc[:2].isna().all()
    assert list(ordered["k"].iloc[2:]) == [1.0, 2.0, 3.0, 5.0]


def test_period_chunker_minute_second_match_pandas(spark):
    """Sub-hour offsets ('T'/'min', 'S') — pandas Period-identical keys, the
    natural granularity for streaming micro-batch validation."""
    import pandas as pd
    from spark_validate.chunking import PeriodBasedChunker

    ts = pd.date_range("2026-03-01 10:15:42", periods=40, freq="73s")
    sdf = spark.createDataFrame(pd.DataFrame({"ts": ts}))
    for offset in ("T", "min", "S"):
        ch = PeriodBasedChunker(offset=offset, timestamp_column="ts")
        got = {r.ts: r.chunk_key for r in ch.assign(sdf).collect()}
        for t in ts:
            assert got[t] == str(pd.Period(t, freq=offset)), (offset, t)


def test_segmented_chunker_composite_keys_and_parity(spark):
    """Wrapping a base chunker with SegmentedChunker slices every chunk by
    segment value: keys are '<base>|<segment>', NULL segments label as
    __null__, headers order deterministically, and an UNCHANGED calculator's
    per-composite-chunk values equal running it on each segment's rows."""
    import pandas as pd

    from spark_validate.calculators import ColumnStatsCalculator
    from spark_validate.chunking import SegmentedChunker, SizeBasedChunker

    n = 120
    pdf = pd.DataFrame({
        "id": range(n),
        "seg": [None if i % 10 == 9 else ("A" if i % 2 == 0 else "B") for i in range(n)],
        "x": [float(i) for i in range(n)],
    })
    df = spark.createDataFrame(pdf)
    base = SizeBasedChunker(chunk_size=60, order_by=["id"])
    ch = SegmentedChunker(base=base, segment_col="seg")

    assigned = ch.assign(df)
    keys = {r["chunk_key"] for r in assigned.select("chunk_key").distinct().collect()}
    assert keys == {
        "[0:59]|A", "[0:59]|B", "[0:59]|__null__",
        "[60:119]|A", "[60:119]|B", "[60:119]|__null__",
    }
    hdr = ch.headers(assigned).orderBy("chunk_index").toPandas()
    # deterministic: within a base chunk, composite indices order by key
    assert hdr["chunk_key"].tolist() == sorted(
        hdr["chunk_key"], key=lambda k: (int(k.split(":")[0][1:]), k)
    )

    stats = ColumnStatsCalculator(["x"], metrics=("avg",), chunker=ch).fit(df)
    res = stats.calculate(df).toPandas().set_index("chunk_key")
    seg_a_first = pdf[(pdf.id < 60) & (pdf.seg == "A")]["x"].mean()
    assert abs(res.loc["[0:59]|A", "value"] - seg_a_first) < 1e-12
    null_last = pdf[(pdf.id >= 60) & (pdf.seg.isna())]["x"].mean()
    assert abs(res.loc["[60:119]|__null__", "value"] - null_last) < 1e-12


def test_segment_by_in_runner_config(spark, tmp_path):
    """chunking.segment_by slices EVERY suite check per segment through the
    ordinary runner path."""
    import pandas as pd

    from spark_validate.runner import run_suite

    n = 200
    pdf = pd.DataFrame({
        "id": range(n),
        "grp": ["g1" if i % 2 == 0 else "g2" for i in range(n)],
        "v": [float(i % 50) for i in range(n)],
    })
    src = str(tmp_path / "seg.parquet")
    spark.createDataFrame(pdf).write.parquet(src)
    cfg = {
        "run_id": "segrun",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": src,
        "analysis": src,
        "chunking": {"chunk_size": 100, "order_by": ["id"], "segment_by": "grp"},
        "checks": [{"type": "column_stats", "columns": ["v"], "metrics": ["avg"]}],
    }
    run_suite(spark, cfg)
    res = spark.read.parquet(str(tmp_path / "out" / "results")).toPandas()
    res = res[res["method"] == "avg"]
    assert len(res) == 4  # 2 base chunks × 2 segments
    assert set(res["chunk_key"]) == {"[0:99]|g1", "[0:99]|g2", "[100:199]|g1", "[100:199]|g2"}
