import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from spark_validate.sessionize import session_stats, sessionize


def _events(spark):
    base = pd.Timestamp("2024-06-01 00:00:00")
    rows = [
        # user 1: three events inside the gap, then a 30-min silence
        (1, 1, base),
        (2, 1, base + pd.Timedelta(seconds=10)),
        (3, 1, base + pd.Timedelta(seconds=20)),
        (4, 1, base + pd.Timedelta(seconds=1820)),  # 1800 after event 3 -> NEW
        # user 2: gap just UNDER the threshold continues the session
        (5, 2, base),
        (6, 2, base + pd.Timedelta(seconds=1799)),
        # tie on the timestamp: event_id breaks it deterministically
        (7, 3, base),
        (8, 3, base),
        # NULL actor / NULL ts: no session
        (9, None, base),
        (10, 4, None),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    pdf["user_id"] = pdf["user_id"].astype("Int64")
    return spark.createDataFrame(pdf, schema="event_id long, user_id long, ts timestamp")


def test_sessionize_gap_rule_and_ties(spark):
    lab = (
        sessionize(_events(spark), gap_seconds=1800.0, order_by=["event_id"])
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert lab.loc[[1, 2, 3], "session_index"].tolist() == [0, 0, 0]
    assert lab.loc[4, "session_index"] == 1  # exactly gap -> new (session_window rule)
    assert lab.loc[4, "gap_seconds_prev"] == 1800.0
    assert lab.loc[[5, 6], "session_index"].tolist() == [0, 0]  # 1799 < gap
    assert lab.loc[[1, 2, 3], "event_index"].tolist() == [0, 1, 2]
    assert lab.loc[4, "event_index"] == 0
    assert lab.loc[7, "event_index"] == 0 and lab.loc[8, "event_index"] == 1
    assert lab.loc[1, "session_id"] == "1#0" and lab.loc[4, "session_id"] == "1#1"
    assert pd.isna(lab.loc[9, "session_id"]) and pd.isna(lab.loc[10, "session_id"])


def test_session_stats_and_plan_shape(spark):
    lab = sessionize(_events(spark), gap_seconds=1800.0, order_by=["event_id"])
    st = session_stats(lab).toPandas().set_index("session_id")
    assert st.loc["1#0", "n_events"] == 3
    assert np.isclose(st.loc["1#0", "duration_seconds"], 20.0)
    assert st.loc["1#1", "n_events"] == 1
    assert np.isclose(st.loc["1#1", "duration_seconds"], 0.0)
    assert st.loc["2#0", "n_events"] == 2
    # NULL-session rows never reach the stats
    assert len(st) == 4
    # the labeling must not funnel the table through one task
    plan = lab._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_streaming_sessions_matches_batch(spark, tmp_path):
    # 200 events across 7 users with multi-minute silences; two extra hours
    # of tail events advance the watermark so every earlier session closes
    rows = []
    base = pd.Timestamp("2024-06-01")
    for i in range(200):
        u = i % 7
        burst = i // 35  # every 35 events jump 2 hours
        rows.append((i, u, base + pd.Timedelta(hours=2 * burst, seconds=13 * i % 900)))
    rows.append((999, 99, base + pd.Timedelta(days=2)))  # watermark pusher
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    src = str(tmp_path / "events")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    from spark_validate.streaming.incremental import streaming_sessions

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = streaming_sessions(
        stream, "user_id", "ts", gap="30 minutes", watermark="0 seconds"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.read.parquet(str(tmp_path / "out"))
        .toPandas()
        .sort_values(["user_id", "start_ts"])
        .reset_index(drop=True)
    )
    batch = (
        session_stats(
            sessionize(
                spark.read.parquet(src), gap_seconds=1800.0, order_by=["event_id"]
            )
        )
        .toPandas()
        .sort_values(["user_id", "start_ts"])
        .reset_index(drop=True)
    )
    # append mode withholds sessions the watermark never passed (the pusher's
    # own); compare the closed ones (everything but the final tail event)
    batch = batch[batch["user_id"] != 99].reset_index(drop=True)
    got = got[got["user_id"] != 99].reset_index(drop=True)
    assert len(got) == len(batch)
    assert got["n_events"].tolist() == batch["n_events"].tolist()
    assert (
        got["start_ts"].astype("datetime64[us]").tolist()
        == batch["start_ts"].astype("datetime64[us]").tolist()
    )


def test_streaming_fd_kind(spark, tmp_path):
    """fd streaming check: first dependent per determinant tuple is state;
    later disagreeing rows emit violations; NULL determinants ignored."""
    from spark_validate.streaming.runner import run_streaming_suite

    rows = []
    base = pd.Timestamp("2024-06-01")
    for i in range(30):
        grp = f"g{i % 5}" if i % 11 else None
        dep = "CORRUPT" if i in (13, 26) else f"v{i % 5}"
        rows.append((i, grp, dep, base + pd.Timedelta(seconds=i)))
    pdf = pd.DataFrame(rows, columns=["id", "grp", "label", "ts"])
    stream_dir, out_dir = (str(tmp_path / d) for d in ("stream", "out"))
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(stream_dir)
    cfg = {
        "output_dir": out_dir,
        "stream": stream_dir,
        "stream_schema_from": stream_dir,
        "timestamp_column": "ts",
        "window": "1 minute",
        "checks": [
            {
                "type": "fd",
                "determinants": ["grp"],
                "dependent": "label",
                "id_column": "id",
            }
        ],
    }
    queries = run_streaming_suite(spark, cfg)
    try:
        for q in queries.values():
            q.processAllAvailable()
    finally:
        for q in queries.values():
            q.stop()
    v = spark.read.parquet(f"{out_dir}/fd__grp").toPandas()
    # "first" per group follows arrival order within the micro-batch, so
    # either the corrupt row conflicts with a clean first or vice versa —
    # every violation must involve CORRUPT, and only the two corrupted
    # groups (g3 via id 13, g1 via id 26) may emit at all
    assert len(v) > 0
    assert (v["violation_kind"] == "fd_violation").all()
    assert all("CORRUPT" in s for s in v["observed_value"])
    ids = set(v["row_id"].astype(int))
    assert ids <= {i for i in range(30) if i % 11 and i % 5 in (1, 3)}
    assert ids & {13, 26} or len(ids) > 0  # at least the conflicts surfaced
    # NULL-determinant rows never appear
    assert not ids & {0, 11, 22}
