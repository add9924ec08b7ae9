"""Per-category share-shift attribution (drift/catshift.py)."""

import numpy as np
import pandas as pd
import pytest

from spark_validate.chunking import SizeBasedChunker
from spark_validate.drift.catshift import CategoryShiftCalculator


@pytest.fixture(scope="module")
def shifted(spark):
    """Reference a/b/c/d (40/30/20/10); analysis drops d entirely, shrinks a,
    and introduces e (reference-unseen). One NULL row per period (must be
    excluded from every share)."""
    rng = np.random.RandomState(11)
    ref = pd.DataFrame({
        "id": range(2000),
        "cat": rng.choice(list("abcd"), 2000, p=[0.4, 0.3, 0.2, 0.1]),
    })
    ana = pd.DataFrame({
        "id": range(2000),
        "cat": rng.choice(list("abce"), 2000, p=[0.2, 0.3, 0.2, 0.3]),
    })
    ref.loc[0, "cat"] = None
    ana.loc[0, "cat"] = None
    return (
        spark.createDataFrame(ref[["id", "cat"]]),
        spark.createDataFrame(ana[["id", "cat"]]),
        ref,
        ana,
    )


def test_movers_attribution_semantics(spark, shifted):
    rdf, adf, ref, ana = shifted
    calc = CategoryShiftCalculator(
        ["cat"], chunker=SizeBasedChunker(chunk_size=2000, order_by=["id"]),
        top_m=3, delta_threshold=0.05,
    ).fit(rdf)
    mv = calc.movers(adf).toPandas().sort_values("rank").reset_index(drop=True)
    assert len(mv) == 3  # top_m bound

    rvc = ref["cat"].dropna().value_counts(normalize=True)
    avc = ana["cat"].dropna().value_counts(normalize=True)
    # __other__ absorbs the reference-unseen 'e' mass
    other = mv[mv.category == "__other__"]
    assert len(other) == 1
    assert other["ref_share"].iloc[0] == 0.0
    assert abs(other["chunk_share"].iloc[0] - avc["e"]) < 1e-12
    # the vanished category surfaces with chunk_share 0
    d_row = mv[mv.category == "d"]
    if len(d_row):
        assert d_row["chunk_share"].iloc[0] == 0.0
        assert abs(d_row["delta"].iloc[0] + rvc["d"]) < 1e-12
    # ranking is by |delta| descending
    assert (mv["delta"].abs().diff().dropna() <= 1e-15).all()
    # every reported share matches pandas exactly
    for _, r in mv.iterrows():
        if r.category != "__other__":
            assert abs(r.ref_share - rvc.get(r.category, 0.0)) < 1e-12
            want_q = avc.get(r.category, 0.0) if r.category != "e" else 0.0
            assert abs(r.chunk_share - want_q) < 1e-12


def test_calculate_long_rows_and_state_roundtrip(spark, shifted):
    rdf, adf, _, _ = shifted
    ch = SizeBasedChunker(chunk_size=1000, order_by=["id"])
    calc = CategoryShiftCalculator(["cat"], chunker=ch, delta_threshold=0.05).fit(rdf)
    res = calc.calculate(adf).toPandas()
    assert set(res["method"]) == {"share_delta_max"}
    assert len(res) == 2  # one row per chunk
    assert res["alert"].all()  # planted 30% emerging mass clears 0.05
    assert (res["upper_threshold"] == 0.05).all()
    # state roundtrip reproduces movers exactly
    c2 = CategoryShiftCalculator(["cat"], chunker=ch, delta_threshold=0.05)
    c2.set_state(calc.get_state())
    pd.testing.assert_frame_equal(
        calc.movers(adf).toPandas(), c2.movers(adf).toPandas()
    )
    # stored state missing a configured column forces an explicit error
    c3 = CategoryShiftCalculator(["cat", "extra"], chunker=ch)
    with pytest.raises(ValueError, match="extra"):
        c3.set_state(calc.get_state())


def test_other_sentinel_collision_refused(spark):
    """A real reference category literally named '__other__' would collide
    with the unseen-tail lump (double-joined counts, conflicting ref_share
    rows) — fit and set_state both refuse loudly."""
    pdf = pd.DataFrame({"id": range(4), "cat": ["a", "b", "__other__", "a"]})
    sdf = spark.createDataFrame(pdf)
    calc = CategoryShiftCalculator(
        ["cat"], chunker=SizeBasedChunker(chunk_size=4, order_by=["id"])
    )
    with pytest.raises(ValueError, match="__other__"):
        calc.fit(sdf)
    good = CategoryShiftCalculator(
        ["cat"], chunker=SizeBasedChunker(chunk_size=4, order_by=["id"])
    ).fit(spark.createDataFrame(pd.DataFrame({"id": range(2), "cat": ["a", "b"]})))
    st = good.get_state()
    st["state"]["cat"]["counts"]["__other__"] = 1
    with pytest.raises(ValueError, match="__other__"):
        good.set_state(st)


def test_max_categories_bound_and_tail_lump(spark):
    """A high-cardinality column keeps only top max_categories in state; the
    tail becomes nonzero __other__ reference mass."""
    n = 1000
    pdf = pd.DataFrame({
        "id": range(n),
        # 500 hot rows of 'hot', the rest all-distinct ids
        "cat": ["hot"] * 500 + [f"v{i}" for i in range(n - 500)],
    })
    sdf = spark.createDataFrame(pdf)
    calc = CategoryShiftCalculator(
        ["cat"], chunker=SizeBasedChunker(chunk_size=n, order_by=["id"]),
        max_categories=10, top_m=5,
    ).fit(sdf)
    st = calc._state["cat"]
    assert len(st["counts"]) == 10
    assert "hot" in st["counts"]
    mv = calc.movers(sdf).toPandas()
    other = mv[mv.category == "__other__"]
    # scoring reference against itself: every kept category delta == 0,
    # __other__ keeps the exact tail mass on both sides → delta == 0 too
    assert (mv["delta"].abs() < 1e-12).all()
    if len(other):
        assert abs(other["ref_share"].iloc[0] - (n - 500 - 9) / n) < 1e-12


def test_streaming_category_shift_matches_batch(spark, tmp_path):
    """The streaming compile emits per-(window, category) shares equal to
    batch movers over a matching hourly period chunker; the batch path owns
    ranking, the stream carries the same |delta|>threshold alert."""
    from spark_validate.chunking import PeriodBasedChunker
    from spark_validate.streaming import streaming_category_shift

    n = 1200
    ts = pd.date_range("2024-06-03", periods=n, freq="9s")  # 3 hours
    idx = np.arange(n)
    cat = np.where(idx % 4 == 0, "a", np.where(idx % 4 == 1, "b", "c"))
    # last streamed hour: the 'a' slot becomes a brand-new category
    cat = np.where((idx >= 2 * n // 3) & (idx % 4 == 0), "zzz", cat)
    pdf = pd.DataFrame({"ts": ts, "id": idx, "cat": cat})
    # middle hour goes entirely NULL: batch emits no movers rows for that
    # chunk, so the stream must emit no rows for that window either
    hour1 = (ts >= "2024-06-03 01:00:00") & (ts < "2024-06-03 02:00:00")
    pdf.loc[np.asarray(hour1), "cat"] = None
    ref, ana = pdf.iloc[: n // 3], pdf.iloc[n // 3 :]

    calc = CategoryShiftCalculator(
        ["cat"],
        chunker=PeriodBasedChunker(offset="H", timestamp_column="ts"),
        top_m=10,
        delta_threshold=0.1,
    ).fit(spark.createDataFrame(ref))
    batch = calc.movers(spark.createDataFrame(ana)).toPandas()

    src = str(tmp_path / "catshift_stream")
    spark.createDataFrame(ana).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_category_shift(stream, calc, "ts", window_duration="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sv_catshift")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    s = spark.sql("SELECT * FROM sv_catshift").toPandas()
    assert set(s["category"]) == {"a", "b", "c", "__other__"}
    # the all-NULL hour yields NO window rows (batch parity: no totals row)
    s["hour"] = pd.to_datetime(s["window_start"]).dt.strftime("%Y-%m-%d %H")
    assert "2024-06-03 01" not in set(s["hour"])
    # per-window shares equal the batch movers (hour-keyed join per category)
    b = batch.copy()
    b["hour"] = b["chunk_key"].str.slice(0, 13)  # period key '2024-06-03 12'
    assert "2024-06-03 01" not in set(b["hour"])
    joined = b.merge(s, on=["hour", "category"], suffixes=("_b", "_s"))
    assert len(joined) >= 4
    np.testing.assert_allclose(joined["chunk_share_b"], joined["chunk_share_s"], rtol=1e-12)
    np.testing.assert_allclose(joined["delta_b"], joined["delta_s"], rtol=1e-12)
    assert (joined["alert_b"].astype(bool) == joined["alert_s"].astype(bool)).all()
    # the drifted final hour alerts on the __other__ lump
    last = s[s["hour"] == s["hour"].max()]
    assert bool(last[last.category == "__other__"]["alert"].iloc[0])


def test_runner_kind_category_shift(spark, tmp_path):
    from spark_validate.runner import run_suite

    n = 300
    ref = pd.DataFrame({"id": range(n), "seg": ["A"] * 150 + ["B"] * 100 + ["C"] * 50, "ord": range(n)})
    ana = pd.DataFrame({"id": range(n), "seg": ["A"] * 50 + ["B"] * 100 + ["D"] * 150, "ord": range(n)})
    rsrc, asrc = str(tmp_path / "ref.parquet"), str(tmp_path / "ana.parquet")
    spark.createDataFrame(ref).write.parquet(rsrc)
    spark.createDataFrame(ana).write.parquet(asrc)
    cfg = {
        "run_id": "catshift",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": rsrc,
        "analysis": asrc,
        "chunking": {"chunk_size": 150, "order_by": ["ord"]},
        "checks": [
            {"type": "category_shift", "columns": ["seg"], "top_m": 3, "delta_threshold": 0.1}
        ],
    }
    report = run_suite(spark, cfg)
    key = next(k for k in report if "category_shift" in k)
    assert report[key]["alerts"] >= 1
    res = spark.read.parquet(str(tmp_path / "out" / "results")).toPandas()
    res = res[res["method"] == "share_delta_max"]
    assert len(res) == 2
    vio = spark.read.parquet(str(tmp_path / "out" / "violations")).toPandas()
    vio = vio[vio["check"].str.startswith("category_shift")]
    # chunk 2 is pure D (unseen) → __other__ is its top mover
    assert "__other__" in set(vio["row_id"])
    # second run loads fitted state from the store
    report2 = run_suite(spark, cfg)
    assert report2[key]["fitted_from_store"] is True
