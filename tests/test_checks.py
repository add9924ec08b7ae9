"""Constraint checks: range, unseen, domain, uniqueness, referential."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.checks import (
    DomainCheck,
    NumericalRangeCalculator,
    ReferentialIntegrityCheck,
    UniquenessCheck,
    UnseenValuesCalculator,
)
from spark_validate.chunking import SizeBasedChunker


@pytest.fixture(scope="module")
def qframe(spark):
    rng = np.random.default_rng(5)
    n_ref, n_ana = 2000, 2000
    x = np.concatenate([rng.uniform(0, 100, n_ref), rng.uniform(-10, 120, n_ana)])
    cat = np.concatenate(
        [rng.choice(["a", "b", "c"], n_ref), rng.choice(["a", "b", "c", "NEW"], n_ana, p=[0.3, 0.3, 0.3, 0.1])]
    )
    key = np.arange(n_ref + n_ana)
    key[-10:] = key[0:10]  # inject 10 duplicate keys in analysis tail
    pdf = pd.DataFrame({"id": np.arange(n_ref + n_ana), "k": key, "x": x, "cat": cat})
    pdf["is_ref"] = pdf["id"] < n_ref
    return spark.createDataFrame(pdf), pdf


def test_range_check(spark, qframe):
    sdf, pdf = qframe
    ref, ana = sdf.filter("is_ref"), sdf.filter("NOT is_ref")
    calc = NumericalRangeCalculator(["x"], chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]))
    calc.fit(ref)
    lo, hi = calc._ranges["x"]
    res = calc.calculate(ana).orderBy("chunk_index").toPandas()
    a = pdf[~pdf.is_ref].reset_index(drop=True)
    for i in range(4):
        chunk = a.iloc[i * 500 : (i + 1) * 500]
        exp = ((chunk["x"] < lo) | (chunk["x"] > hi)).mean()
        assert np.isclose(res["value"].iloc[i], exp)
    # default threshold: upper=0 → any violation alerts
    assert res["alert"].all()
    v = calc.violations(ana, row_id="id").toPandas()
    exp_total = ((a["x"] < lo) | (a["x"] > hi)).sum()
    assert len(v) == exp_total
    assert set(v["violation_kind"]) == {"out_of_range"}


def test_unseen_values(spark, qframe):
    sdf, pdf = qframe
    ref, ana = sdf.filter("is_ref"), sdf.filter("NOT is_ref")
    calc = UnseenValuesCalculator(["cat"], chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]))
    calc.fit(ref)
    assert sorted(calc._seen["cat"]) == ["a", "b", "c"]
    res = calc.calculate(ana).orderBy("chunk_index").toPandas()
    a = pdf[~pdf.is_ref].reset_index(drop=True)
    for i in range(4):
        chunk = a.iloc[i * 500 : (i + 1) * 500]
        assert np.isclose(res["value"].iloc[i], (chunk["cat"] == "NEW").mean())
    assert res["alert"].all()
    v = calc.violations(ana).toPandas()
    assert len(v) == (a["cat"] == "NEW").sum()


def test_unseen_large_cardinality_join_path(spark, qframe):
    sdf, _ = qframe
    ref, ana = sdf.filter("is_ref"), sdf.filter("NOT is_ref")
    calc = UnseenValuesCalculator(
        ["cat"], chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]), max_seen=1
    )
    calc.fit(ref)
    assert not isinstance(calc._seen["cat"], list)  # anti-join path
    res = calc.calculate(ana).orderBy("chunk_index").toPandas()
    calc2 = UnseenValuesCalculator(["cat"], chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]))
    calc2.fit(ref)
    res2 = calc2.calculate(ana).orderBy("chunk_index").toPandas()
    np.testing.assert_allclose(res["value"].to_numpy(), res2["value"].to_numpy())


def test_unseen_manifest_state_roundtrip(spark, qframe, tmp_path):
    # High-cardinality seen-set persists as a parquet manifest when
    # manifest_dir is set; without it get_state still refuses (ValueError)
    import pytest

    sdf, _ = qframe
    ref, ana = sdf.filter("is_ref"), sdf.filter("NOT is_ref")
    ch = SizeBasedChunker(chunk_size=500, order_by=["id"])
    calc = UnseenValuesCalculator(["cat"], chunker=ch, max_seen=1).fit(ref)
    with pytest.raises(ValueError, match="manifest_dir"):
        calc.get_state()
    calc.manifest_dir = str(tmp_path / "manifest")
    state = calc.get_state()
    assert "__manifest__" in state["seen"]["cat"]
    import json

    blob = json.loads(json.dumps(state))  # must be pure JSON
    restored = UnseenValuesCalculator(["cat"], chunker=ch, max_seen=1).set_state(blob)
    assert not isinstance(restored._seen["cat"], list)
    a = calc.calculate(ana).orderBy("chunk_index").toPandas()
    b = restored.calculate(ana).orderBy("chunk_index").toPandas()
    np.testing.assert_allclose(a["value"].to_numpy(), b["value"].to_numpy())


def test_runner_unseen_high_cardinality_completes_and_restores(spark, qframe, tmp_path):
    # An unseen check whose column exceeds max_seen must neither abort the
    # suite at state-save time nor refit on the second run: the runner
    # points manifest_dir under the store, so load-or-fit works above the
    # broadcast cap.
    from spark_validate.runner import run_suite

    sdf, _ = qframe
    sdf.filter("is_ref").write.mode("overwrite").parquet(str(tmp_path / "ref"))
    sdf.filter("NOT is_ref").write.mode("overwrite").parquet(str(tmp_path / "ana"))
    cfg = {
        "run_id": "unseenhc",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": str(tmp_path / "ref"),
        "analysis": str(tmp_path / "ana"),
        "chunking": {"chunk_size": 500, "order_by": ["id"]},
        "checks": [{"type": "unseen", "columns": ["cat"], "max_seen": 1}],
    }
    report = run_suite(spark, cfg)
    (entry,) = report.values()
    assert entry["fitted_from_store"] is False and entry["rows"] > 0
    # JSON state + parquet manifest landed under the store
    import glob

    assert glob.glob(str(tmp_path / "store" / "*__manifest" / "cat" / "*.parquet"))
    report2 = run_suite(spark, cfg)
    (entry2,) = report2.values()
    assert entry2["fitted_from_store"] is True
    r1 = spark.read.parquet(str(tmp_path / "out" / "results")).toPandas()
    assert (r1[r1["method"].str.startswith("unseen")]["value"] >= 0).all()


def test_domain_check(spark, qframe):
    sdf, pdf = qframe
    ana = sdf.filter("NOT is_ref")
    chk = DomainCheck(["cat"], domain=["a", "b"], chunker=SizeBasedChunker(chunk_size=500, order_by=["id"]))
    res = chk.calculate(ana).orderBy("chunk_index").toPandas()
    a = pdf[~pdf.is_ref].reset_index(drop=True)
    exp = (~a.iloc[:500]["cat"].isin(["a", "b"])).mean()
    assert np.isclose(res["value"].iloc[0], exp)


def test_uniqueness(spark, qframe):
    sdf, pdf = qframe
    chk = UniquenessCheck(["k"], chunker=SizeBasedChunker(chunk_size=1000, order_by=["id"]))
    dups = chk.duplicates(sdf).toPandas()
    assert len(dups) == 10
    assert (dups["dup_count"] == 2).all()
    # salted variant agrees
    chk_salted = UniquenessCheck(["k"], salt_buckets=8)
    dups_s = chk_salted.duplicates(sdf).toPandas()
    assert sorted(dups_s["k"]) == sorted(dups["k"])
    v = chk.violations(sdf).toPandas()
    assert len(v) == 20  # both rows of each duplicated key
    res = chk.calculate(sdf).orderBy("chunk_index").toPandas()
    assert np.isclose(res["value"].sum() * 1000, 20)  # 20 dup rows across chunks
    assert res["alert"].any()


def test_referential_integrity(spark, qframe):
    sdf, pdf = qframe
    ref, ana = sdf.filter("is_ref"), sdf.filter("NOT is_ref")
    # manifest = categories seen in reference
    manifest = ref.select(F.col("cat").alias("cat")).distinct()
    chk = ReferentialIntegrityCheck(
        column="cat", manifest=manifest, chunker=SizeBasedChunker(chunk_size=500, order_by=["id"])
    )
    orph = chk.orphans(ana).count()
    a = pdf[~pdf.is_ref]
    assert orph == (a["cat"] == "NEW").sum()
    res = chk.calculate(ana).orderBy("chunk_index").toPandas()
    assert np.isclose(res["value"].mean(), (a["cat"] == "NEW").mean(), atol=0.05)
    v = chk.violations(ana).toPandas()
    assert set(v["observed_value"]) == {"NEW"}


# --- schema contract (checks/schema.py) ---------------------------------------


def test_schema_verdicts_classify_each_kind(spark):
    from spark_validate.checks.schema import SchemaCheck

    df = spark.createDataFrame(
        [("a", 1, 2.0)], "image_id string, w int, extra double"
    )
    chk = SchemaCheck(
        expected={"image_id": "string", "w": "bigint", "bytes": "binary"},
        allow_extra=False,
    )
    got = {r["column_name"]: r["status"] for r in chk.verdicts(df).collect()}
    assert got == {
        "image_id": "ok",
        "w": "type_mismatch",
        "bytes": "missing_column",
        "extra": "unexpected_column",
    }
    assert chk.n_schema_violations(df) == 3
    # aliases: a contract written with engine-agnostic spellings still matches
    ok = SchemaCheck(expected={"image_id": "varchar", "w": "integer", "extra": "double"})
    assert ok.n_schema_violations(df) == 0


def test_schema_check_required_nulls_alert_and_violations(spark):
    import pandas as pd

    from spark_validate.checks.schema import SchemaCheck
    from spark_validate.chunking import SizeBasedChunker

    pdf = pd.DataFrame(
        {
            "image_id": [f"i{k}" if k % 7 else None for k in range(100)],
            "w": list(range(100)),
        }
    )
    df = spark.createDataFrame(pdf)
    chk = SchemaCheck(
        expected={"image_id": "string", "w": "bigint"},
        required=("image_id", "bytes"),  # bytes missing from the frame entirely
        chunker=SizeBasedChunker(chunk_size=50, order_by=["w"]),
    )
    res = chk.calculate(df).toPandas()
    nulls = res[res.method == "required_null_rate"]
    by_col = nulls.groupby("column_name")["value"].sum()
    assert by_col["image_id"] > 0
    assert (nulls[nulls.column_name == "bytes"]["value"] == 1.0).all()  # absent column
    assert bool(nulls["alert"].all())  # upper threshold 0: any null alerts
    meta = res[res.method == "schema_violations"]
    # 'bytes' is both required and contracted? not contracted here → metadata
    # violations = 0 (both contract columns match)
    assert (meta["value"] == 0.0).all()

    v = chk.violations(df, row_id="w").toPandas()
    assert len(v) == 15  # k % 7 == 0 for k in 0..99
    assert (v["violation_kind"] == "required_null").all()


def test_schema_check_clean_table_silent(spark):
    from spark_validate.checks.schema import SchemaCheck
    from spark_validate.chunking import SizeBasedChunker

    df = spark.range(100).select(
        F.col("id").cast("string").alias("image_id"), F.col("id").cast("int").alias("w")
    )
    chk = SchemaCheck(
        expected={"image_id": "string", "w": "int"},
        required=("image_id",),
        chunker=SizeBasedChunker(chunk_size=50, order_by=["image_id"]),
    )
    res = chk.calculate(df).toPandas()
    assert not bool(res["alert"].any())
    assert chk.violations(df).count() == 0


def test_snapshot_diff_nullsafe_semantics(spark):
    from spark_validate.checks import snapshot_diff, snapshot_diff_summary

    old = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 4, 5], "v": ["a", None, "c", None, "e"], "w": [1, 1, 1, 1, 1]})
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {"k": [2, 3, 4, 5, 6], "v": ["b", "c", None, "e", "f"], "w": [1, 1, 2, 1, 1]}
        )
    )
    # k=1 removed; k=2 null→'b' changed; k=3 same but w same → unchanged;
    # k=4 v null→null BUT w 1→2 → changed; k=5 fully equal; k=6 added
    d = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert d == {1: "removed", 2: "changed", 4: "changed", 6: "added"}
    s = {r["status"]: r["n_rows"] for r in snapshot_diff_summary(old, new, ["k"]).collect()}
    assert s == {"removed": 1, "changed": 2, "unchanged": 2, "added": 1}
    # compare_cols restriction: only v → k=4's w change is invisible
    d2 = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"], compare_cols=["v"]).collect()}
    assert d2 == {1: "removed", 2: "changed", 6: "added"}
