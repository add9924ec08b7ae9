"""EmbeddingDriftCalculator vs an independent numpy replica, plus plumbing
(state round-trip, NULL rows, planted drift detection, no-UDF plan)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_validate.chunking import SizeBasedChunker
from spark_validate.drift.embedding import EmbeddingDriftCalculator

DIM = 8
N_REF = 400
N_ANA = 200
CHUNK = 50


def _vec(rng, shift=None, scale=1.0):
    v = rng.standard_normal(DIM) * scale + 1.0
    if shift is not None:
        v = v + shift
    return v.tolist()


# directional shift: first half of the dims only — rotates the centroid
# (a uniform all-dims shift is parallel to the reference centroid and is
# correctly invisible to the cosine metric; mean_shift_linf catches it)
_DIR_SHIFT = np.array([0.8] * (DIM // 2) + [0.0] * (DIM - DIM // 2))


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(7)
    # base mean 1.0 per dim: realistic embeddings have a non-zero centroid
    # (a zero-centroid reference makes cosine-to-centroid noise, not signal)
    ref_rows = [(i, _vec(rng)) for i in range(N_REF)]
    # analysis: chunks 0-1 in-distribution, chunk 2 directionally shifted,
    # chunk 3 scaled (norm distribution change)
    ana_rows = []
    for i in range(N_ANA):
        chunk = i // CHUNK
        shift = _DIR_SHIFT if chunk == 2 else None
        scale = 2.0 if chunk == 3 else 1.0
        ana_rows.append((i, _vec(rng, shift, scale)))
    schema = "vec_id long, embedding array<double>"
    return (
        spark.createDataFrame(ref_rows, schema),
        spark.createDataFrame(ana_rows, schema),
        np.array([r[1] for r in ref_rows]),
        np.array([r[1] for r in ana_rows]),
    )


def _numpy_replica(ref, ana, n_bins=10):
    mu = ref.mean(axis=0)
    sigma = ref.std(axis=0, ddof=1)
    norms_ref = np.linalg.norm(ref, axis=1)
    lo, hi = norms_ref.min(), norms_ref.max()
    edges = np.linspace(lo, hi, n_bins + 1)
    p = np.histogram(norms_ref, bins=edges)[0] / len(norms_ref)
    out = {}
    for c in range(len(ana) // CHUNK):
        chunk = ana[c * CHUNK : (c + 1) * CHUNK]
        m = chunk.mean(axis=0)
        cos = float(m @ mu / (np.linalg.norm(m) * np.linalg.norm(mu)))
        linf = float(np.max(np.abs(m - mu) / sigma))
        norms = np.linalg.norm(chunk, axis=1)
        inb = norms[(norms >= lo) & (norms <= hi)]
        b = np.minimum(np.floor((inb - lo) / (hi - lo) * n_bins).astype(int), n_bins - 1)
        q = np.bincount(b, minlength=n_bins) / len(norms)
        leftover = max(1.0 - q.sum(), 0.0)
        jp = sum(pi * math.log2(2 * pi / (pi + qi)) for pi, qi in zip(p, q) if pi > 0)
        jq = sum(qi * math.log2(2 * qi / (pi + qi)) for pi, qi in zip(p, q) if qi > 0)
        js = math.sqrt(max(0.5 * (jp + jq) + 0.5 * leftover, 0.0))
        out[c] = {"centroid_cosine": 1.0 - cos, "mean_shift_linf": linf, "norm_js": js}
    return out


def test_matches_numpy_replica(spark, frames):
    ref_df, ana_df, ref_np, ana_np = frames
    calc = EmbeddingDriftCalculator(chunker=SizeBasedChunker(chunk_size=CHUNK, order_by=["vec_id"]))
    calc.fit(ref_df)
    got = {
        (r["chunk_index"], r["method"]): r["value"]
        for r in calc.calculate(ana_df).collect()
    }
    want = _numpy_replica(ref_np, ana_np)
    assert len(got) == 3 * (N_ANA // CHUNK)
    for c, metrics in want.items():
        for m, v in metrics.items():
            assert got[(c, m)] == pytest.approx(v, abs=1e-9), (c, m)


def test_planted_drift_alerts(spark, frames):
    ref_df, ana_df, _, _ = frames
    calc = EmbeddingDriftCalculator(chunker=SizeBasedChunker(chunk_size=CHUNK, order_by=["vec_id"]))
    calc.fit(ref_df)
    res = calc.calculate(ana_df).collect()
    by = {(r["chunk_index"], r["method"]): r for r in res}
    # the directionally-shifted chunk fires both centroid metrics; the scaled
    # chunk fires the norm-distribution metric; in-distribution chunks stay quiet
    assert by[(2, "mean_shift_linf")]["alert"] and by[(2, "centroid_cosine")]["alert"]
    assert by[(3, "norm_js")]["alert"]
    for m in ("centroid_cosine", "mean_shift_linf", "norm_js"):
        assert not by[(0, m)]["alert"] and not by[(1, m)]["alert"], m


def test_state_roundtrip_and_null_rows(spark, frames):
    ref_df, ana_df, _, _ = frames
    calc = EmbeddingDriftCalculator(chunker=SizeBasedChunker(chunk_size=CHUNK, order_by=["vec_id"]))
    calc.fit(ref_df)
    # restore into a calculator configured with a DIFFERENT n_bins: the state
    # is self-contained and must win (mispaired probs vs binning is silent
    # corruption otherwise)
    clone = EmbeddingDriftCalculator(
        chunker=SizeBasedChunker(chunk_size=CHUNK, order_by=["vec_id"]), n_bins=7
    ).set_state(calc.get_state())
    assert clone.n_bins == calc.n_bins and clone.dim == calc.dim
    a = calc.calculate(ana_df).orderBy("chunk_index", "method").collect()
    b = clone.calculate(ana_df).orderBy("chunk_index", "method").collect()
    assert [(r["value"], r["alert"]) for r in a] == [(r["value"], r["alert"]) for r in b]
    # NULL embeddings: skipped by means/norms, never crash, never alert-poison
    with_nulls = ana_df.withColumn(
        "embedding", F.when(F.col("vec_id") % 7 == 0, F.lit(None)).otherwise(F.col("embedding"))
    )
    rows = calc.calculate(with_nulls).collect()
    assert all(r["value"] is not None for r in rows)


def test_runner_embedding_drift_check(spark, frames, tmp_path):
    from spark_validate.runner import run_suite

    ref_df, ana_df, _, _ = frames
    ref_path, ana_path = str(tmp_path / "ref.parquet"), str(tmp_path / "ana.parquet")
    ref_df.write.parquet(ref_path)
    ana_df.write.parquet(ana_path)
    cfg = {
        "run_id": "embdrift",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": ref_path,
        "analysis": ana_path,
        "chunking": {"chunk_size": CHUNK, "order_by": ["vec_id"]},
        "checks": [{"type": "embedding_drift", "column": "embedding", "dim": DIM}],
    }
    report = run_suite(spark, cfg)
    (entry,) = report.values()
    assert entry["rows"] == 3 * (N_ANA // CHUNK)
    assert entry["alerts"] >= 2  # the planted chunks fire
    # second run loads fitted state from the store (calculate-only rerun)
    report2 = run_suite(spark, {**cfg, "run_id": "embdrift"})
    (entry2,) = report2.values()
    assert entry2["fitted_from_store"] is True
    # same-run_id reruns append to results/ (size-based chunks don't prune);
    # the calculate-only pass reproduces the same metric rows and alerts
    assert entry2["rows"] == 2 * entry["rows"] and entry2["alerts"] == 2 * entry["alerts"]


def test_streaming_embedding_drift_matches_batch(spark, frames, tmp_path):
    """The streaming compilation must equal the batch path per hourly window
    (a tumbling window IS a period chunk)."""
    from spark_validate.chunking import PeriodBasedChunker
    from spark_validate.streaming import streaming_embedding_drift

    ref_df, ana_df, _, _ = frames
    # give analysis rows hourly timestamps: 50 rows per hour = one chunk/hour
    ts = F.to_timestamp(
        F.lit("2024-03-01 00:00:00").cast("timestamp")
        + (F.col("vec_id") / CHUNK).cast("int") * F.expr("INTERVAL 1 HOUR")
    )
    ana_ts = ana_df.withColumn("ts", ts)
    ref_ts = ref_df.withColumn("ts", ts)
    calc = EmbeddingDriftCalculator(chunker=PeriodBasedChunker(offset="h", timestamp_column="ts"))
    calc.fit(ref_ts)
    batch = {
        (str(r["start_ts"]), r["method"]): r["value"]
        for r in calc.calculate(ana_ts).collect()
    }

    src = str(tmp_path / "emb_stream")
    ana_ts.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_embedding_drift(stream, calc, "ts", window_duration="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sv_emb_drift")
        .start()
    )
    q.processAllAvailable()
    rows = spark.sql("SELECT * FROM sv_emb_drift").collect()
    q.stop()
    assert len(rows) == len(batch)
    for r in rows:
        want = batch[(str(r["window_start"]), r["method"])]
        assert r["value"] == pytest.approx(want, abs=1e-12), r["method"]


def test_plan_is_udf_free(spark, frames):
    ref_df, ana_df, _, _ = frames
    calc = EmbeddingDriftCalculator(chunker=SizeBasedChunker(chunk_size=CHUNK, order_by=["vec_id"]))
    calc.fit(ref_df)
    from tests.test_plans import plan_str

    plan = plan_str(calc.calculate(ana_df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_constant_norm_degenerate_range(spark):
    """hi == lo reference norm range: exactly-equal values land in the TOP
    bucket (n_bins - 1), matching the non-degenerate norm == hi rule and the
    DuckDB oracle convention; identical analysis data → norm_js == 0."""
    rows = [(i, [3.0, 4.0]) for i in range(100)]  # every norm exactly 5.0
    schema = "vec_id long, embedding array<double>"
    sdf = spark.createDataFrame(rows, schema)
    calc = EmbeddingDriftCalculator(
        methods=("norm_js",), chunker=SizeBasedChunker(chunk_size=50, order_by=["vec_id"]), dim=2
    )
    calc.fit(sdf)
    probs = calc._fitted["norm_probs"]
    assert probs[-1] == pytest.approx(1.0) and sum(probs[:-1]) == 0.0
    res = calc.calculate(sdf).toPandas()
    assert (res["value"].abs() < 1e-12).all()


def test_fit_histogram_includes_dropped_partial_chunk(spark):
    """norm_probs come from the FULL reference even when the chunker drops
    the final partial chunk — the fitted state stays internally consistent
    with the full-table mu/sigma/lo/hi pass."""
    # 105 rows, chunk_size 50, incomplete='drop' → rows 100-104 are dropped
    # from chunk aggregates; give ONLY those rows the global max norm
    rows = [(i, [1.0, 0.0]) for i in range(100)] + [(i, [10.0, 0.0]) for i in range(100, 105)]
    schema = "vec_id long, embedding array<double>"
    sdf = spark.createDataFrame(rows, schema)
    calc = EmbeddingDriftCalculator(
        methods=("norm_js",),
        chunker=SizeBasedChunker(chunk_size=50, order_by=["vec_id"], incomplete="drop"),
        dim=2,
    )
    calc.fit(sdf)
    st = calc._fitted
    assert st["norm_hi"] == pytest.approx(10.0)
    # the top bucket holds the 5 dropped-chunk rows: 5/105
    assert st["norm_probs"][-1] == pytest.approx(5 / 105)
    assert sum(st["norm_probs"]) == pytest.approx(1.0)


def test_streaming_runner_embedding_drift_only(spark, frames, tmp_path):
    """An embedding_drift-only streaming config gets its OWN sink key and
    checkpoint (regression: the kind previously reused the undefined/stale
    `name` of the column_stats/drift kinds — NameError standalone, silent
    checkpoint collision after a drift check)."""
    from spark_validate.streaming.runner import run_streaming_suite

    ref_df, ana_df, _, _ = frames
    ts = F.to_timestamp(
        F.lit("2024-03-01 00:00:00").cast("timestamp")
        + (F.col("vec_id") / CHUNK).cast("int") * F.expr("INTERVAL 1 HOUR")
    )
    ref_dir, stream_dir = str(tmp_path / "ref"), str(tmp_path / "stream")
    ref_df.withColumn("ts", ts).write.parquet(ref_dir)
    ana_df.withColumn("ts", ts).write.parquet(stream_dir)
    cfg = {
        "output_dir": str(tmp_path / "out"),
        "reference": ref_dir,
        "stream": stream_dir,
        "timestamp_column": "ts",
        "window": "1 hour",
        "watermark": "0 seconds",
        "checks": [{"type": "embedding_drift", "column": "embedding", "dim": DIM}],
    }
    queries = run_streaming_suite(spark, cfg)
    try:
        assert set(queries) == {"embedding_drift__embedding"}
        for q in queries.values():
            q.processAllAvailable()
        sentinel = ana_df.withColumn("ts", ts + F.expr("INTERVAL 48 HOUR")).limit(1)
        sentinel.write.mode("append").parquet(stream_dir)
        for q in queries.values():
            q.processAllAvailable()
    finally:
        for q in queries.values():
            q.stop()
    out = spark.read.parquet(str(tmp_path / "out" / "embedding_drift__embedding"))
    assert out.count() > 0


def test_high_dim_balanced_fold(spark):
    """dim=1024 end-to-end: a left-nested sum chain this deep blows Catalyst's
    recursive plan walks (StackOverflowError past ~700 terms); the balanced
    binary fold (depth 10 at 1024) must plan AND evaluate. The fitted norm is
    checked BIT-exactly against a Python replica of the same balanced
    association (float summation order is part of the operator contract)."""
    dim = 1024
    base = [float((i % 7) - 3) / 4.0 for i in range(dim)]
    rows = [(i, base) for i in range(60)]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    calc = EmbeddingDriftCalculator(
        methods=("norm_js", "centroid_cosine"),  # exercises the norm AND dot/m2 folds
        chunker=SizeBasedChunker(chunk_size=30, order_by=["vec_id"]),
        dim=dim,
    )
    calc.fit(sdf)
    terms = [x * x for x in base]
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    expected = math.sqrt(terms[0])
    assert calc._fitted["norm_lo"] == expected  # bit-exact
    res = calc.calculate(sdf).toPandas()
    assert len(res) == 2 * 2  # 2 chunks × 2 methods
    assert (res["value"].abs() < 1e-9).all()
