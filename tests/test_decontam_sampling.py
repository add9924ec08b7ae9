"""Benchmark decontamination (n-gram overlap) + deterministic sampling."""

import hashlib

from pyspark.sql import functions as F

from spark_validate.text import (
    deterministic_sample,
    hash_bucket,
    ngram_overlap,
    rate_to_hex,
    stratified_sample,
)


def test_ngram_overlap_flags_planted_copy(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),  # verbatim copy
            (2, "alpha beta gamma delta epsilon iota kappa lambda"),  # partial
            (3, "one two three four five six seven eight"),  # clean
            (4, None),  # null text stays a (clean) row
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in ngram_overlap(docs, bench, n=5, threshold=0.5).collect()
    }
    assert out[1]["overlap_rate"] == 1.0 and out[1]["contaminated"]
    # doc 2: of its 4 5-grams only [alpha..epsilon] occurs in the benchmark
    assert out[2]["n_ngrams"] == 4 and out[2]["n_overlap"] == 1
    assert out[2]["overlap_rate"] == 0.25 and not out[2]["contaminated"]
    assert out[3]["n_overlap"] == 0 and not out[3]["contaminated"]
    assert out[4]["n_overlap"] == 0  # null text → no grams in common


def test_ngram_overlap_short_doc_whole_text_gram(spark):
    # docs shorter than n tokens fall back to the whole text as one gram:
    # a verbatim short benchmark doc still collides
    bench = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "other text")], "doc_id long, text string"
    )
    rows = {r["id"]: r for r in ngram_overlap(docs, bench, n=5).collect()}
    assert rows[1]["overlap_rate"] == 1.0
    assert rows[2]["n_overlap"] == 0


def test_ngram_overlap_shuffle_join_path_agrees(spark, documents):
    bench = documents.filter(F.col("doc_id") % 20 == 0)
    train = documents.filter(F.col("doc_id") % 20 != 0)
    a = ngram_overlap(train, bench, n=5, broadcast_benchmark=True)
    b = ngram_overlap(train, bench, n=5, broadcast_benchmark=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_hash_bucket_is_md5_prefix(spark):
    # the bucket must be exactly the md5-hex prefix so any engine (the DuckDB
    # oracle included) reproduces the same sample
    df = spark.createDataFrame([(17,), (42,)], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", hash_bucket(F.col("doc_id"), "s42").alias("b")).collect()
    }
    for k, v in got.items():
        assert v == hashlib.md5(f"s42:{k}".encode()).hexdigest()[:8]


def test_deterministic_sample_rate_and_reproducibility(spark):
    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    s1 = deterministic_sample(df, 0.3, salt="a")
    s2 = deterministic_sample(df, 0.3, salt="a")
    n1 = s1.count()
    assert n1 == s2.count()
    assert abs(n1 / 20000 - 0.3) < 0.02  # uniform within ~4σ
    # nested property: a higher-rate sample contains the lower-rate one
    wide = {r["doc_id"] for r in deterministic_sample(df, 0.6, salt="a").collect()}
    narrow = {r["doc_id"] for r in s1.collect()}
    assert narrow <= wide
    # different salt → essentially independent draw
    other = {r["doc_id"] for r in deterministic_sample(df, 0.3, salt="b").collect()}
    assert abs(len(narrow & other) / 20000 - 0.09) < 0.02


def test_deterministic_sample_extremes(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    assert deterministic_sample(df, 0.0).count() == 0
    assert deterministic_sample(df, 1.0).count() == 100


def test_stratified_sample_rates(spark):
    df = (
        spark.range(30000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, "en")
            .when(F.col("doc_id") % 3 == 1, "de")
            .otherwise("zh"),
        )
    )
    out = stratified_sample(
        df, {"en": 0.8, "de": 0.2}, stratum_col="lang", default_rate=0.05
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(got["en"] / 10000 - 0.8) < 0.03
    assert abs(got["de"] / 10000 - 0.2) < 0.03
    assert abs(got.get("zh", 0) / 10000 - 0.05) < 0.02


def test_solve_mixture_rates_binding_group_kept_whole():
    from spark_validate.text import solve_mixture_rates

    # en is the binding group: 1000/0.5 = 2000 < 900/0.3 = 3000 < 800/0.2
    rates = solve_mixture_rates(
        {"en": 1000, "de": 900, "fr": 800}, {"en": 0.5, "de": 0.3, "fr": 0.2}
    )
    assert rates["en"] == 1.0
    # expected output composition equals the targets
    expected = {g: rates[g] * n for g, n in {"en": 1000, "de": 900, "fr": 800}.items()}
    total = sum(expected.values())
    assert abs(expected["de"] / total - 0.3) < 1e-12
    assert abs(expected["fr"] / total - 0.2) < 1e-12
    # fraction shrinks every rate proportionally
    half = solve_mixture_rates(
        {"en": 1000, "de": 900, "fr": 800}, {"en": 0.5, "de": 0.3, "fr": 0.2},
        fraction=0.5,
    )
    assert abs(half["de"] - rates["de"] * 0.5) < 1e-15


def test_solve_mixture_rates_errors():
    import pytest

    from spark_validate.text import solve_mixture_rates

    with pytest.raises(ValueError, match="no observed rows"):
        solve_mixture_rates({"en": 10}, {"en": 0.5, "xx": 0.5})
    with pytest.raises(ValueError, match="positive"):
        solve_mixture_rates({"en": 10, "de": 5}, {"en": 1.0, "de": 0.0})
    with pytest.raises(ValueError, match="fraction"):
        solve_mixture_rates({"en": 10}, {"en": 1.0}, fraction=0.0)


def test_mixture_sample_realizes_targets(spark):
    from spark_validate.text import mixture_sample

    # 60k en / 30k de / 6k zh; target 50/50 en-de → zh dropped, de binding
    df = (
        spark.range(96000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 16 < 10, "en")
            .when(F.col("doc_id") % 16 < 15, "de")
            .otherwise("zh"),
        )
    )
    out = mixture_sample(df, {"en": 0.5, "de": 0.5}, stratum_col="lang")
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "zh" not in got  # non-target groups dropped
    assert got["de"] == 30000  # binding group kept whole (rate exactly 1)
    assert abs(got["en"] / got["de"] - 1.0) < 0.05  # realized 50/50 mixture
    # deterministic: a re-run selects the identical rows
    again = mixture_sample(df, {"en": 0.5, "de": 0.5}, stratum_col="lang")
    assert out.select("doc_id").subtract(again.select("doc_id")).count() == 0


def test_rate_to_hex_monotone_bounds():
    assert rate_to_hex(0.0) == "00000000"
    assert rate_to_hex(1.0) == "g"  # sorts after all hex
    assert rate_to_hex(0.25) < rate_to_hex(0.5) < rate_to_hex(0.75) < "g"


def test_decontamination_check_in_runner(spark, tmp_path):
    """Config-driven decontamination check: per-chunk contaminated-doc rate
    + violation rows carrying the overlap, benchmark read from its own
    table path (like referential's manifest)."""
    import pandas as pd

    from spark_validate.runner import run_suite

    rows = []
    for i in range(200):
        toks = [f"w{(i * 17 + j) % 10_000_019}" for j in range(20)]
        rows.append((i, " ".join(toks), "p0" if i % 2 == 0 else "p1"))
    docs = pd.DataFrame(rows, columns=["doc_id", "text", "part"])
    bench = docs.head(5).copy()  # docs 0..4 ARE the benchmark → contaminated
    spark.createDataFrame(docs).write.mode("overwrite").parquet(str(tmp_path / "docs"))
    spark.createDataFrame(bench.drop(columns=["part"])).write.mode("overwrite").parquet(
        str(tmp_path / "bench")
    )
    cfg = {
        "run_id": "decon",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": str(tmp_path / "docs"),
        "analysis": str(tmp_path / "docs"),
        "chunking": {"partition_columns": ["part"]},
        "checks": [
            {
                "type": "decontamination",
                "column": "text",
                "id_column": "doc_id",
                "benchmark": str(tmp_path / "bench"),
                "n": 5,
                "threshold": 0.5,
            }
        ],
    }
    report = run_suite(spark, cfg)
    rep = report["decontamination__text"]
    assert rep["alerts"] > 0
    viol = spark.read.parquet(str(tmp_path / "out" / "violations"))
    bad = viol.filter(F.col("check") == "decontamination__text")  # runner keys by check name
    ids = {int(r["row_id"]) for r in bad.collect()}
    assert ids == {0, 1, 2, 3, 4}
    assert bad.first()["violation_kind"] == "benchmark_contamination"


def test_sampling_and_overlap_plans_are_narrow(spark, documents):
    # sampling must be a pure filter (no shuffle); the broadcast overlap join
    # must not shuffle the corpus by gram
    plan = deterministic_sample(documents, 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    bench = documents.filter(F.col("doc_id") % 20 == 0)
    train = documents.filter(F.col("doc_id") % 20 != 0)
    oplan = (
        ngram_overlap(train, bench, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in oplan or "BroadcastExchange" in oplan
    assert "CartesianProduct" not in oplan and "BatchEvalPython" not in oplan


def test_with_split_disjoint_exhaustive_and_proportional(spark):
    from spark_validate.text import with_split

    df = spark.range(20000).select(F.col("id").alias("doc_id"))
    out = with_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}).toPandas()
    counts = out["split"].value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    assert counts.sum() == 20000  # exhaustive: every row labeled exactly once
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    assert abs(counts["test"] / 20000 - 0.1) < 0.01


def test_with_split_stable_under_partitioning_and_growth(spark):
    from spark_validate.text import with_split

    a = with_split(spark.range(5000).select(F.col("id").alias("doc_id")))
    b = with_split(
        spark.range(8000).select(F.col("id").alias("doc_id")).repartition(17)
    )
    pa = a.toPandas().set_index("doc_id")["split"]
    pb = b.toPandas().set_index("doc_id")["split"]
    # the first 5000 keys keep their assignment when the corpus grows and
    # the physical layout changes — no reshuffling between splits
    assert (pb.loc[pa.index] == pa).all()


def test_with_split_null_key_and_weight_validation(spark):
    import pytest as _pytest

    from spark_validate.text import with_split

    df = spark.createDataFrame([(1,), (None,)], "doc_id bigint")
    out = with_split(df).toPandas().set_index("doc_id", drop=False)
    assert out.loc[1, "split"] in ("train", "val", "test")
    assert out[out["doc_id"].isna()]["split"].isna().all()
    with _pytest.raises(ValueError):
        with_split(df, {"train": 0.5, "test": 0.4})  # doesn't sum to 1
    with _pytest.raises(ValueError):
        with_split(df, {"all": 1.0})  # fewer than two splits


def test_with_split_rejects_nonpositive_weights(spark):
    import pytest as _pytest

    from spark_validate.text import with_split

    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with _pytest.raises(ValueError, match="positive"):
        with_split(df, {"train": 1.2, "val": -0.3, "test": 0.1})
    with _pytest.raises(ValueError, match="positive"):
        with_split(df, {"train": 1.0, "val": 0.0})
