"""URL extraction + domain blocklist: hand-computed extraction, suffix-match
semantics, curation filter, the per-chunk rate check (standalone + fused)."""

import pandas as pd
from pyspark.sql import functions as F

from spark_validate.text import (
    UrlBlocklistCheck,
    blocklist_filter,
    with_blocklist_flags,
    with_urls,
)

DOCS = [
    (0, "no links here"),
    (1, "see https://cdn.example.com/a.jpg and http://Example.com:8080/x?q=1 end"),
    (2, "bad one http://ads.tracker.net/px.gif inline"),
    (3, "apex https://tracker.net done"),
    (4, "lookalike https://nottracker.net/page stays"),  # suffix must not match
    (5, None),
]
BLOCK = ["tracker.net"]


def test_url_extraction_hand_computed(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in with_urls(df).collect()}
    assert out[0]["n_urls"] == 0 and out[0]["hosts"] == []
    assert out[1]["n_urls"] == 2
    assert out[1]["hosts"] == ["cdn.example.com", "example.com"]  # lowercased
    assert out[1]["urls"][1] == "http://Example.com:8080/x?q=1"
    assert out[5]["n_urls"] == 0  # NULL text


def test_blocklist_match_semantics(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in with_blocklist_flags(df, BLOCK).collect()}
    assert out[2]["is_blocked"] and out[2]["n_blocked_urls"] == 1  # subdomain
    assert out[3]["is_blocked"]  # apex
    assert not out[4]["is_blocked"]  # 'nottracker.net' is NOT a suffix match
    assert not out[1]["is_blocked"] and not out[0]["is_blocked"]

    kept = blocklist_filter(df, BLOCK)
    assert kept.columns == ["doc_id", "text"]  # projection restored
    assert {r["doc_id"] for r in kept.collect()} == {0, 1, 4, 5}


def test_url_edge_cases(spark):
    """Sentence-final punctuation and userinfo must not defeat the blocklist;
    a pre-existing 'hosts' column must not short-circuit the text scan."""
    rows = [
        (0, "visit https://bad.tracker.net. next sentence"),  # trailing period
        (1, "login http://alice@tracker.net/home now"),  # userinfo@host
        (2, "bare https://tracker.net, comma after"),  # trailing comma
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in with_blocklist_flags(df, BLOCK).collect()}
    assert out[0]["hosts"] == ["bad.tracker.net"] and out[0]["is_blocked"]
    assert out[1]["hosts"] == ["tracker.net"] and out[1]["is_blocked"]
    assert out[2]["hosts"] == ["tracker.net"] and out[2]["is_blocked"]

    # a crawl table shipping an unrelated 'hosts' metadata column: the text
    # column is still scanned (hosts recomputed), unless explicitly vouched
    trap = df.withColumn("hosts", F.array(F.lit("decoy.example")))
    out2 = {r["doc_id"]: r.asDict() for r in with_blocklist_flags(trap, BLOCK).collect()}
    assert out2[1]["is_blocked"] and out2[1]["hosts"] == ["tracker.net"]


def test_url_check_in_runner_fused(spark, tmp_path):
    """url_blocklist as a config check rides the fused suite pass; values
    match the standalone calculate() path."""
    from spark_validate.chunking import PartitionChunker
    from spark_validate.runner import run_suite

    n = 80
    pdf = pd.DataFrame(
        {
            "image_id": [f"d{i:03d}" for i in range(n)],
            "part": ["p0" if i < n // 2 else "p1" for i in range(n)],
            "caption": [
                "src http://cdn.tracker.net/i.png" if i % 20 == 5 else f"img {i} https://ok.org/{i}"
                for i in range(n)
            ],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(tmp_path / "docs"))
    cfg = {
        "run_id": "urls",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": str(tmp_path / "docs"),
        "analysis": str(tmp_path / "docs"),
        "chunking": {"partition_columns": ["part"]},
        "checks": [
            {
                "type": "url_blocklist",
                "column": "caption",
                "id_column": "image_id",
                "domains": BLOCK,
            }
        ],
    }
    report = run_suite(spark, cfg)
    assert report["url_blocklist__caption"]["alerts"] > 0
    res = spark.read.parquet(str(tmp_path / "out" / "results" / "check=url_blocklist__caption"))
    got = {
        (r["chunk_key"], r["method"]): (r["value"], r["alert"])
        for r in res.filter("period='analysis'").collect()
    }
    # docs 5 and 25 land in p0; 45 and 65 in p1 — 2 blocked per 40-doc chunk
    assert got[("part=p0", "blocked_doc_rate")] == (2 / 40, True)
    assert got[("part=p1", "blocked_doc_rate")] == (2 / 40, True)
    assert got[("part=p0", "urls_per_doc")] == (1.0, False)  # informational, never alerts
    # informational rows carry no thresholds either (a row with value=1.0,
    # upper_threshold=0.0, alert=false would contradict itself)
    thr = {
        (r["chunk_key"], r["method"]): (r["lower_threshold"], r["upper_threshold"])
        for r in res.filter("period='analysis'").collect()
    }
    assert thr[("part=p0", "urls_per_doc")] == (None, None)
    assert thr[("part=p0", "blocked_doc_rate")][1] == 0.0

    df = spark.read.parquet(str(tmp_path / "docs"))
    alone = UrlBlocklistCheck(
        BLOCK, text_col="caption", id_col="image_id", chunker=PartitionChunker(columns=["part"])
    ).calculate(df)
    for r in alone.collect():
        assert got[(r["chunk_key"], r["method"])] == (r["value"], r["alert"])

    viol = spark.read.parquet(
        str(tmp_path / "out" / "violations" / "check=url_blocklist__caption")
    )
    v = viol.toPandas()
    assert set(v["row_id"]) == {"d005", "d025", "d045", "d065"}
    assert set(v["observed_value"]) == {"cdn.tracker.net"}
