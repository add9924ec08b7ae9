"""PII detection/redaction: hand-computed counts, redaction fixpoint, the
per-chunk rate check (standalone + fused runner path), violation rows."""

import pandas as pd
from pyspark.sql import functions as F

from spark_validate.text import PiiRateCheck, redact_pii, with_pii_counts

DOCS = [
    (0, "plain text with no pii at all"),
    (1, "write to alice.smith+spam@mail-host.co.uk or bob@x.io today"),  # 2 emails
    (2, "server 10.0.3.17 and 192.168.255.1 are up"),  # 2 ipv4
    (3, "ssn 123-45-6789 on file"),  # 1 ssn, 0 phone (middle group is 2 digits)
    (4, "call (415) 555-0173 or 650-555-0100 or 206.555.0199"),  # 3 phones
    (5, None),  # NULL text counts zero everywhere
    (6, "mixed: a@b.com from 8.8.8.8 ssn 000-11-2222 tel 415-555-2671"),
]


def _counts(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in with_pii_counts(df).collect()}


def test_pii_counts_hand_computed(spark):
    out = _counts(spark)
    assert out[0]["pii_total"] == 0 and not out[0]["has_pii"]
    assert out[1]["n_email"] == 2 and out[1]["pii_total"] == 2
    assert out[2]["n_ipv4"] == 2 and out[2]["n_email"] == 0
    assert out[3]["n_ssn"] == 1 and out[3]["n_phone"] == 0
    assert out[4]["n_phone"] == 3 and out[4]["n_ssn"] == 0
    assert out[5]["pii_total"] == 0 and not out[5]["has_pii"]
    r6 = out[6]
    assert (r6["n_email"], r6["n_ipv4"], r6["n_ssn"], r6["n_phone"]) == (1, 1, 1, 1)
    assert r6["pii_total"] == 4 and r6["has_pii"]


def test_redaction_is_complete_and_typed(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    red = redact_pii(df, "text", out_col="clean")
    # rescanning the redacted text finds nothing
    rescan = with_pii_counts(red.select("doc_id", F.col("clean").alias("text")))
    assert rescan.agg(F.sum("pii_total")).first()[0] == 0
    rows = {r["doc_id"]: r["clean"] for r in red.collect()}
    assert rows[6] == "mixed: <EMAIL> from <IPV4> ssn <SSN> tel <PHONE>"
    assert rows[0] == DOCS[0][1]  # clean docs untouched
    assert rows[5] is None  # NULL stays NULL


def test_pii_rate_check_chunked(spark):
    from spark_validate.chunking import PartitionChunker

    rows = [
        (i, "p0" if i < 10 else "p1", "contact me@x.io" if i in (12, 15) else "nothing here")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, part string, text string")
    check = PiiRateCheck(chunker=PartitionChunker(columns=["part"]))
    res = check.calculate(df)
    vals = {(r["chunk_key"], r["method"]): r["value"] for r in res.collect()}
    assert vals[("part=p1", "pii_email_rate")] == 2 / 10
    assert vals[("part=p0", "pii_email_rate")] == 0.0
    assert vals[("part=p1", "pii_any_rate")] == 2 / 10
    alerts = {(r["chunk_key"], r["method"]): r["alert"] for r in res.collect()}
    assert alerts[("part=p1", "pii_email_rate")] and not alerts[("part=p0", "pii_email_rate")]

    viol = check.violations(df)
    v = viol.toPandas()
    assert set(v["row_id"]) == {"12", "15"}
    assert set(v["violation_kind"]) == {"pii_email"}


def test_pii_check_in_runner_fused(spark, tmp_path):
    """pii as a config check rides the fused shared-scan pass; results match
    the standalone calculate() path row-for-row."""
    from spark_validate.runner import run_suite

    n = 100
    pdf = pd.DataFrame(
        {
            "image_id": [f"d{i:04d}" for i in range(n)],
            "part": ["p0" if i < n // 2 else "p1" for i in range(n)],
            "caption": [
                "reach admin@corp.example now" if i % 25 == 3 else f"caption {i} ok"
                for i in range(n)
            ],
            "w": [64] * n,
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(tmp_path / "docs"))
    cfg = {
        "run_id": "pii",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": str(tmp_path / "docs"),
        "analysis": str(tmp_path / "docs"),
        "chunking": {"partition_columns": ["part"]},
        "checks": [
            {"type": "pii", "column": "caption", "id_column": "image_id"},
            {"type": "missing", "columns": ["w"]},
        ],
    }
    report = run_suite(spark, cfg)
    rep = report["pii__caption"]
    assert rep["alerts"] > 0
    res = spark.read.parquet(str(tmp_path / "out" / "results" / "check=pii__caption"))
    got = {(r["chunk_key"], r["method"]): r["value"] for r in res.filter("period='analysis'").collect()}
    # 4 docs with i % 25 == 3 -> two per 50-row partition chunk
    assert got[("part=p0", "pii_email_rate")] == 2 / 50
    assert got[("part=p1", "pii_email_rate")] == 2 / 50
    assert got[("part=p0", "pii_any_rate")] == 2 / 50
    assert got[("part=p0", "pii_phone_rate")] == 0.0

    # standalone path must agree exactly
    from spark_validate.chunking import PartitionChunker

    df = spark.read.parquet(str(tmp_path / "docs"))
    alone = PiiRateCheck(
        text_col="caption", id_col="image_id", chunker=PartitionChunker(columns=["part"])
    ).calculate(df)
    alone_vals = {(r["chunk_key"], r["method"]): r["value"] for r in alone.collect()}
    for k, v in alone_vals.items():
        assert got[k] == v, k

    viol = spark.read.parquet(str(tmp_path / "out" / "violations" / "check=pii__caption"))
    v = viol.toPandas()
    assert set(v["row_id"]) == {f"d{i:04d}" for i in range(n) if i % 25 == 3}
