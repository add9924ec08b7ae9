"""Curation pipeline: stage composition, first-fail attribution, sequential
survivor semantics, transforms."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.text import curate


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


LONG = "the quick brown fox jumps over the lazy dog and keeps running far away " * 3


def test_first_fail_attribution_and_report(spark):
    df = _docs(
        spark,
        [
            (1, LONG),                                   # survives
            (2, "too short"),                            # quality
            (3, LONG + " mail me at a@b.com now"),       # pii (drop)
            (4, LONG + " see http://x.bad.org/p"),       # url_blocklist
            (5, LONG),                                   # exact dup of 1 → dropped
            (6, "short AND a@b.com"),                    # quality wins (first fail)
        ],
    )
    res = curate(
        df,
        [
            {"stage": "quality", "min_chars": 50},
            {"stage": "pii", "action": "drop", "kinds": ["email"]},
            {"stage": "url_blocklist", "domains": ["bad.org"]},
            {"stage": "exact_dedup"},
        ],
    )
    got = {r["doc_id"]: r["dropped_by"] for r in res.annotated.collect()}
    assert got == {
        1: None,
        2: "quality",
        3: "pii",
        4: "url_blocklist",
        5: "exact_dedup",
        6: "quality",
    }
    assert sorted(r["doc_id"] for r in res.curated.collect()) == [1]
    rep = {r["stage"]: (r["docs_dropped"], r["docs_remaining"]) for r in res.report().collect()}
    assert rep["input"] == (0, 6)
    assert rep["quality"] == (2, 4)
    assert rep["pii"] == (1, 3)
    assert rep["url_blocklist"] == (1, 2)
    assert rep["exact_dedup"] == (1, 1)


def test_sequential_dedup_keeper_over_survivors(spark):
    """If the min-id copy of a duplicate group is dropped by an EARLIER
    stage, the next surviving copy becomes the keeper — the keeper set is
    computed over survivors, not the raw corpus."""
    df = _docs(
        spark,
        [
            (1, LONG + " leak@pii.com"),  # min-id copy killed by pii first
            (2, LONG + " leak@pii.com"),  # same text → keeper among survivors
            (3, LONG + " leak@pii.com"),  # duplicate of 2 → dedup drops it
        ],
    )
    res = curate(
        df,
        [
            {"stage": "pii", "action": "drop", "kinds": ["email"]},
            {"stage": "exact_dedup"},
        ],
    )
    got = {r["doc_id"]: r["dropped_by"] for r in res.annotated.collect()}
    assert got == {1: "pii", 2: "pii", 3: "pii"}  # all share the pii text!
    # now make only doc 1 carry PII: 2 becomes keeper, 3 dedup-dropped
    df2 = _docs(
        spark,
        [(1, LONG + " leak@pii.com"), (2, LONG), (3, LONG)],
    )
    res2 = curate(
        df2,
        [
            {"stage": "pii", "action": "drop", "kinds": ["email"]},
            {"stage": "exact_dedup"},
        ],
    )
    got2 = {r["doc_id"]: r["dropped_by"] for r in res2.annotated.collect()}
    assert got2 == {1: "pii", 2: None, 3: "exact_dedup"}


def test_redact_transform_feeds_later_stages(spark):
    """pii action=redact rewrites the text column IN the pipeline: two docs
    differing only in their email become exact duplicates after redaction."""
    df = _docs(
        spark,
        [(1, LONG + " alice@a.com"), (2, LONG + " bob@b.org"), (3, LONG + " x")],
    )
    res = curate(
        df,
        [
            {"stage": "pii", "action": "redact", "kinds": ["email"]},
            {"stage": "exact_dedup"},
        ],
    )
    got = {r["doc_id"]: r["dropped_by"] for r in res.annotated.collect()}
    assert got == {1: None, 2: "exact_dedup", 3: None}
    # redaction visible in the surviving text
    t1 = res.curated.filter("doc_id = 1").select("text").first()[0]
    assert "<EMAIL>" in t1 and "alice" not in t1
    # transform stages take no attribution slot
    assert res.stage_names == ["exact_dedup"]


def test_decontaminate_and_sample_stages(spark):
    bench = _docs(spark, [(100, LONG)])
    df = _docs(
        spark,
        [(1, LONG), (2, "completely different words all over this text here okay")],
    )
    res = curate(
        df,
        [{"stage": "decontaminate", "benchmark": bench, "n": 5, "threshold": 0.5}],
    )
    got = {r["doc_id"]: r["dropped_by"] for r in res.annotated.collect()}
    assert got == {1: "decontaminate", 2: None}
    # deterministic sampling: same salt → same kept set on rerun
    big = _docs(spark, [(i, f"doc number {i} with stable text") for i in range(200)])
    r1 = curate(big, [{"stage": "sample", "rate": 0.3}])
    r2 = curate(big, [{"stage": "sample", "rate": 0.3}])
    k1 = sorted(r["doc_id"] for r in r1.curated.collect())
    k2 = sorted(r["doc_id"] for r in r2.curated.collect())
    assert k1 == k2 and 20 < len(k1) < 100


def test_lang_and_lm_stages(spark):
    en = "the cat sat of the and to in is it that for the house " * 4
    es = "el la de que y en un una es por el la de que y en " * 4
    df = _docs(spark, [(1, en), (2, es)])
    res = curate(df, [{"stage": "lang", "allowed": ["en"]}])
    got = {r["doc_id"]: r["dropped_by"] for r in res.annotated.collect()}
    assert got == {1: None, 2: "lang"}
    # lm_quality: gibberish scores above the bits bound, normal text below
    ref = _docs(spark, [(i, en) for i in range(10, 20)])
    df2 = _docs(spark, [(1, en), (2, "zxq qvw plk mnb vcx " * 8)])
    res2 = curate(
        df2, [{"stage": "lm_quality", "reference": ref, "max_bits": 6.0}]
    )
    got2 = {r["doc_id"]: r["dropped_by"] for r in res2.annotated.collect()}
    assert got2 == {1: None, 2: "lm_quality"}


def test_duplicate_stage_names_deduplicated(spark):
    df = _docs(spark, [(1, LONG), (2, "x"), (3, "y" * 600)])
    res = curate(
        df,
        [
            {"stage": "quality", "min_chars": 50},
            {"stage": "quality", "max_chars": 500},
        ],
    )
    assert res.stage_names == ["quality", "quality_1"]
    got = {r["doc_id"]: r["dropped_by"] for r in res.annotated.collect()}
    assert got == {1: None, 2: "quality", 3: "quality_1"}


def test_run_curation_config_job(spark, tmp_path):
    """Config-driven curation job: curated/annotated/report sinks + stage
    table refs resolved via read_table; the runner CLI dispatches on the
    `curation` key (run_scheduled picks run_curation)."""
    from spark_validate.runner import run_scheduled

    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [LONG, "tiny", LONG, LONG + " a@b.com", "unique words here and there okay fine", LONG],
        }
    )
    bench = pd.DataFrame({"doc_id": [99], "text": ["unique words here and there okay fine"]})
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(tmp_path / "in"))
    spark.createDataFrame(bench).write.mode("overwrite").parquet(str(tmp_path / "bench"))
    cfg = {
        "input": str(tmp_path / "in"),
        "output_dir": str(tmp_path / "out"),
        "write_annotated": True,
        "curation": [
            {"stage": "quality", "min_chars": 30},
            {"stage": "pii", "action": "redact"},
            {"stage": "exact_dedup"},
            {"stage": "decontaminate", "benchmark": str(tmp_path / "bench"), "threshold": 0.5},
        ],
    }
    (report,) = run_scheduled(spark, cfg)
    assert report["input"]["docs_remaining"] == 6
    assert report["quality"]["docs_dropped"] == 1  # "tiny"
    # docs 0/2/5 identical; 3 redacts to LONG + " <EMAIL>" (still distinct)
    assert report["exact_dedup"]["docs_dropped"] == 2
    assert report["decontaminate"]["docs_dropped"] == 1  # benchmark verbatim
    assert report["decontaminate"]["docs_remaining"] == 2
    cur = spark.read.parquet(str(tmp_path / "out" / "curated")).toPandas()
    assert sorted(cur["doc_id"]) == [0, 3]
    assert "<EMAIL>" in cur[cur.doc_id == 3]["text"].iloc[0]
    ann = spark.read.parquet(str(tmp_path / "out" / "annotated")).toPandas()
    assert len(ann) == 6 and ann["dropped_by"].isna().sum() == 2
    # idempotent rerun: sinks overwrite, not append (no corpus duplication)
    (report2,) = run_scheduled(spark, cfg)
    assert report2 == report
    cur2 = spark.read.parquet(str(tmp_path / "out" / "curated")).toPandas()
    assert len(cur2) == len(cur)


def test_image_caption_pipeline_with_phash_dedup(spark):
    """One pipeline curates an image+caption table: caption gates (quality,
    pii redact) + image-axis Hamming near-dup keep — the north-rule
    image+caption shape end-to-end."""
    cap = "a photo of a dog on a beach with waves and sand and sun " * 2
    rows = [
        # (image_id, phash, caption)
        (1, 0x1111222233334444, cap),
        (2, 0x1111222233334445, cap + "x"),   # 1 bit from #1 → near-dup, dropped
        (3, 0x7777888899990000, cap + "yy"),  # far in Hamming → kept
        (4, 0x0F0F0F0F0F0F0F0F, "short"),     # caption quality drop
        (5, 0x00FF00FF00FF00FF, cap + " email me a@b.co"),  # redacted, kept
    ]
    pdf = pd.DataFrame(rows, columns=["image_id", "phash", "caption"])
    df = spark.createDataFrame(pdf)
    res = curate(
        df,
        [
            {"stage": "quality", "min_chars": 30},
            {"stage": "pii", "action": "redact", "kinds": ["email"]},
            {"stage": "phash_dedup", "max_hamming": 4},
        ],
        text_col="caption",
        id_col="image_id",
    )
    got = {r["image_id"]: r["dropped_by"] for r in res.annotated.collect()}
    assert got == {1: None, 2: "phash_dedup", 3: None, 4: "quality", 5: None}
    c5 = res.curated.filter("image_id = 5").select("caption").first()[0]
    assert "<EMAIL>" in c5 and "a@b.co" not in c5


def test_persist_path_identical_results_and_cached_plan(spark):
    """persist=True caches the upstream frame ahead of each corpus-shaped
    stage: identical results, and the final plan reads the cache instead of
    re-deriving the pipeline (InMemoryTableScan replaces repeated scans)."""
    df = _docs(
        spark,
        [(i, LONG + f" tail {i}") for i in range(1, 8)]
        + [(8, LONG + " tail 1"), (9, "small")],
    )
    stages = [
        {"stage": "quality", "min_chars": 50},
        {"stage": "exact_dedup"},
        {"stage": "decontaminate", "benchmark": _docs(spark, [(0, LONG + " tail 2")]), "threshold": 0.9},
    ]
    plain = curate(df, stages)
    cached = curate(df, stages, persist=True)
    try:
        a = plain.annotated.orderBy("doc_id").toPandas()
        b = cached.annotated.orderBy("doc_id").toPandas()
        pd.testing.assert_frame_equal(a, b)
        plan = cached.annotated._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
    finally:
        cached.unpersist()


def test_embedding_dedup_stage(spark):
    """Embedding-axis dedup stage: near-identical vectors collapse to the
    min-id representative among survivors."""
    import numpy as np

    base = np.array([1.0, 0.0, 0.5, 0.2])
    rows = [
        (1, "short", [float(x) for x in base]),                    # quality drop
        (2, LONG, [float(x) for x in base * 2.0]),                 # same direction as 1 → keeper (1 already dropped)
        (3, LONG + " b", [float(x) for x in base * 3.0 + 1e-4]),   # cos ~1 vs 2 → dropped
        (4, LONG + " c", [0.0, 1.0, 0.0, 0.0]),                    # orthogonal → kept
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "embedding"])
    df = spark.createDataFrame(pdf)
    res = curate(
        df,
        [
            {"stage": "quality", "min_chars": 30},
            {"stage": "embedding_dedup", "threshold": 0.99},
        ],
    )
    got = {r["doc_id"]: r["dropped_by"] for r in res.annotated.collect()}
    assert got == {1: "quality", 2: None, 3: "embedding_dedup", 4: None}


def test_run_curation_split_and_packing_sinks(spark, tmp_path):
    """curate → split → pack in one config: the curated sink carries the
    deterministic split column and packing/ holds pack assignments over the
    train split, token-conserving against the curated docs."""
    from spark_validate.text.curate import run_curation

    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            "text": [
                ("word " * (20 + (i * 7) % 60)).strip() for i in range(200)
            ],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(tmp_path / "in"))
    cfg = {
        "input": str(tmp_path / "in"),
        "output_dir": str(tmp_path / "out"),
        "curation": [{"stage": "quality", "min_chars": 30}],
        "split": {"train": 0.8, "val": 0.1, "test": 0.1},
        "packing": {"context_len": 256, "n_buckets": 4},
    }
    run_curation(spark, cfg)
    cur = spark.read.parquet(str(tmp_path / "out" / "curated")).toPandas()
    assert set(cur["split"]) <= {"train", "val", "test"}
    assert (cur["split"] == "train").sum() > 0
    packed = spark.read.parquet(str(tmp_path / "out" / "packing")).toPandas()
    # only train docs are packed, and every train doc's tokens are conserved
    train = cur[cur["split"] == "train"].copy()
    assert set(packed["doc_id"]) == set(train["doc_id"])
    toks = train.set_index("doc_id")["text"].str.count(" ") + 1
    per_doc = packed.groupby("doc_id")["slice_len"].sum()
    assert (per_doc == toks.loc[per_doc.index]).all()


def test_curate_canonical_captions_stage(spark):
    """canonical_captions transform: survivors elect per-group majority
    captions — dropped rows DON'T vote (their votes would flip the
    election here) — and the rewrite feeds later dedup so the keeper
    carries the majority caption; attribution untouched."""
    from spark_validate.text.curate import curate

    rows = [
        # group 1 survivors vote "a cat" 2-1; the two quality-dropped rows
        # carry "a dog" — counting them would flip the majority to 3-2
        (0, 1, "same pair text", "a dog"),
        (1, 1, "same pair text", "a cat"),
        (2, 1, "same pair text", "a cat"),
        (3, 1, "x", "a dog"),   # dropped: text fails min_chars
        (6, 1, "y", "a dog"),   # dropped: text fails min_chars
        # group 2: single row keeps its caption
        (4, 2, "a bird text here", "a bird"),
        # NULL group: untouched
        (5, None, "null group text", "keep-me"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, phash long, text string, caption string")
    res = curate(
        df,
        [
            {"stage": "quality", "min_chars": 3},
            {"stage": "canonical_captions", "group_column": "phash",
             "caption_column": "caption"},
            {"stage": "exact_dedup"},  # on text: the group-1 trio collapses
        ],
        text_col="text",
        id_col="doc_id",
    )
    ann = res.annotated.toPandas().sort_values("doc_id").reset_index(drop=True)
    # survivors of group 1 rewritten to the SURVIVOR majority ("a cat"),
    # proving the dropped "a dog" votes were excluded
    assert ann.loc[ann.doc_id.isin([0, 1, 2]), "caption"].tolist() == ["a cat"] * 3
    assert ann.loc[ann.doc_id == 3, "dropped_by"].iloc[0] == "quality"
    assert ann.loc[ann.doc_id == 5, "caption"].iloc[0] == "keep-me"
    cur = res.curated.toPandas().sort_values("doc_id")
    # exact dedup after the rewrite keeps ONE group-1 row (min id 0) — with
    # the elected caption, not doc 0's original dissent
    assert cur["doc_id"].tolist() == [0, 4, 5]
    assert cur.loc[cur.doc_id == 0, "caption"].iloc[0] == "a cat"
