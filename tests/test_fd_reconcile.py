import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.checks import FunctionalDependencyCheck, ReconciliationCheck, reconcile
from spark_validate.chunking import PartitionChunker
from spark_validate.runner import run_suite


@pytest.fixture()
def fd_frame(spark):
    # groups: g1 consistent ("a"), g2 violating ("b"/"B"), g3 consistent with
    # extra NULL deps, NULL-det rows ignored even though their deps differ
    pdf = pd.DataFrame(
        {
            "part": ["p0", "p0", "p0", "p0", "p1", "p1", "p1", "p1", "p1"],
            "det": ["g1", "g1", "g2", "g2", "g2", "g3", "g3", None, None],
            "dep": ["a", "a", "b", "B", "b", "c", None, "x", "y"],
        }
    )
    return spark.createDataFrame(pdf)


def test_fd_semantics_hand_computed(spark, fd_frame):
    chk = FunctionalDependencyCheck(
        ["det"], "dep", chunker=PartitionChunker(columns=["part"])
    )
    bad = chk.violating_groups(fd_frame).collect()
    assert len(bad) == 1
    (g2,) = bad
    assert g2["det"] == "g2" and g2["n_values"] == 2
    assert g2["value_a"] == "B" and g2["value_b"] == "b"
    assert g2["n_rows"] == 3  # all rows of the group, not distinct pairs

    res = chk.calculate(fd_frame).toPandas().set_index("chunk_key")
    # p0: 4 rows, 2 in g2 -> 0.5; p1: 5 rows, 1 in g2 -> 0.2 (NULL dets count
    # toward the row base but never toward violations)
    assert np.isclose(res.loc["part=p0", "value"], 0.5)
    assert np.isclose(res.loc["part=p1", "value"], 0.2)
    assert res["alert"].all()
    assert (res["column_name"] == "det->dep").all()

    v = chk.violations(fd_frame).toPandas()
    assert len(v) == 3  # every row of g2, incl. its consistent-copy rows
    assert set(v["observed_value"]) == {"B <> b"}
    assert set(v["violation_kind"]) == {"fd_violation"}


def test_fd_multi_determinant_and_null_dep_only_group(spark):
    pdf = pd.DataFrame(
        {
            "a": ["x", "x", "x", "y"],
            "b": [1, 1, 1, 1],
            "dep": ["v", None, "w", None],
        }
    )
    df = spark.createDataFrame(pdf)
    chk = FunctionalDependencyCheck(["a", "b"], "dep")
    bad = chk.violating_groups(df).collect()
    assert len(bad) == 1 and bad[0]["a"] == "x"
    # group (y,1) has only a NULL dep -> zero distinct values -> no violation
    with pytest.raises(ValueError):
        FunctionalDependencyCheck([], "dep")
    with pytest.raises(ValueError):
        FunctionalDependencyCheck(["dep"], "dep")


def test_reconcile_tolerance_and_missing_keys(spark):
    exp = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b", "c", None],
                "v": [10.0, 10.0, 100.0, 7.0, 3.0],
            }
        )
    )
    act = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b", "d", None],
                "v": [10.0, 10.0, 100.4, 1.0, 3.0],
            }
        )
    )
    out = reconcile(
        exp,
        act,
        ["k"],
        [{"name": "rc", "agg": "count"}, {"name": "sv", "agg": "sum", "column": "v"}],
        rel_tol=0.005,
    ).toPandas()
    out["k"] = out["k"].fillna("<null>")
    m = out.set_index(["k", "measure"])
    assert bool(m.loc[("a", "rc"), "match"]) and bool(m.loc[("a", "sv"), "match"])
    # b: sum differs by 0.4 on ~100 -> within 0.5% tolerance; count matches
    assert bool(m.loc[("b", "sv"), "match"]) and np.isclose(m.loc[("b", "sv"), "diff"], 0.4)
    # c only in expected, d only in actual -> never match, NULL side values
    assert not bool(m.loc[("c", "rc"), "match"]) and pd.isna(m.loc[("c", "rc"), "actual"])
    assert not bool(m.loc[("d", "sv"), "match"]) and pd.isna(m.loc[("d", "sv"), "expected"])
    # NULL key forms its own matched group (null-safe join)
    assert bool(m.loc[("<null>", "sv"), "match"])
    with pytest.raises(ValueError):
        reconcile(exp, act, ["k"], [{"agg": "median", "column": "v"}])


def test_reconciliation_check_chunk_attribution(spark):
    exp = spark.createDataFrame(
        pd.DataFrame({"part": ["p0"] * 4 + ["p1"] * 4, "k": ["a", "a", "b", "b", "c", "c", "d", "d"]})
    )
    act = spark.createDataFrame(
        pd.DataFrame({"part": ["p0"] * 4 + ["p1"] * 3, "k": ["a", "a", "b", "b", "c", "c", "d"]})
    )
    chk = ReconciliationCheck(
        keys=["k"],
        measures=[{"name": "rc", "agg": "count"}],
        chunker=PartitionChunker(columns=["part"]),
    ).fit(exp)
    out = chk.calculate(act).toPandas()
    res = out[out["method"] == "reconciliation_mismatch_rate"].set_index("chunk_key")
    assert np.isclose(res.loc["part=p0", "value"], 0.0)
    assert np.isclose(res.loc["part=p1", "value"], 1 / 3)  # d's surviving row
    assert bool(res.loc["part=p1", "alert"]) and not bool(res.loc["part=p0", "alert"])
    # every expected key still has analysis rows -> expected-only count 0, no alert
    eo = out[out["method"] == "reconciliation_expected_only_keys"]
    assert (eo["value"] == 0.0).all() and not eo["alert"].any()
    v = chk.violations(act).toPandas()
    assert v["row_id"].tolist() == ["d"] and v["observed_value"].tolist() == ["2.0 <> 1.0"]


def test_reconciliation_null_key_and_expected_only(spark):
    # NULL-keyed stratum diverges (3 ref rows vs 2 analysis rows) and key
    # "gone" exists only in the reference: the rate path must see BOTH.
    exp = spark.createDataFrame(
        pd.DataFrame(
            {
                "part": ["p0"] * 3 + ["p0", "p0"],
                "k": [None, None, None, "gone", "ok"],
                "v": [1.0, 1.0, 1.0, 5.0, 2.0],
            }
        )
    )
    act = spark.createDataFrame(
        pd.DataFrame(
            {
                "part": ["p0", "p0", "p0"],
                "k": [None, None, "ok"],
                "v": [1.0, 1.0, 2.0],
            }
        )
    )
    chk = ReconciliationCheck(
        keys=["k"],
        measures=[{"name": "rc", "agg": "count"}],
        chunker=PartitionChunker(columns=["part"]),
    ).fit(exp)
    out = chk.calculate(act).toPandas()
    rate = out[out["method"] == "reconciliation_mismatch_rate"].iloc[0]
    # 2 of 3 analysis rows are NULL-keyed and that stratum mismatches:
    # a plain equality join-back would report 0 here.
    assert np.isclose(rate["value"], 2 / 3) and bool(rate["alert"])
    eo = out[out["method"] == "reconciliation_expected_only_keys"].iloc[0]
    assert eo["value"] == 1.0 and bool(eo["alert"])  # "gone" dropped entirely
    # independent thresholds: a fractional RATE tolerance must not silence
    # (or be silenced by) the dropped-stratum COUNT — and vice versa
    chk2 = ReconciliationCheck(
        keys=["k"],
        measures=[{"name": "rc", "agg": "count"}],
        chunker=PartitionChunker(columns=["part"]),
        upper_threshold=0.9,           # tolerate the NULL-stratum mismatch rate
        expected_only_threshold=0.0,   # but zero tolerance for dropped keys
    ).fit(exp)
    out2 = chk2.calculate(act).toPandas().set_index("method")
    assert not bool(out2.loc["reconciliation_mismatch_rate", "alert"])
    assert bool(out2.loc["reconciliation_expected_only_keys", "alert"])
    chk3 = ReconciliationCheck(
        keys=["k"],
        measures=[{"name": "rc", "agg": "count"}],
        chunker=PartitionChunker(columns=["part"]),
        upper_threshold=0.0,
        expected_only_threshold=5.0,   # tolerate a few dropped keys
    ).fit(exp)
    out3 = chk3.calculate(act).toPandas().set_index("method")
    assert bool(out3.loc["reconciliation_mismatch_rate", "alert"])
    assert not bool(out3.loc["reconciliation_expected_only_keys", "alert"])


def test_fd_and_reconciliation_in_runner(spark, tmp_path):
    ref = pd.DataFrame(
        {
            "image_id": [f"id{i}" for i in range(40)],
            "phash_grp": [f"g{i % 10}" for i in range(40)],
            "fmt": ["jpeg" if i % 10 != 3 else "png" for i in range(40)],
            "part": ["p0"] * 20 + ["p1"] * 20,
        }
    )
    ana = ref.copy()
    # FD violation: group g3 now carries two fmts in p1
    ana.loc[(ana["phash_grp"] == "g3") & (ana["part"] == "p1"), "fmt"] = "webp"
    ana.loc[33, "fmt"] = "png"
    # reconciliation mismatch: p1 loses two rows vs reference
    ana = ana[~ana["image_id"].isin(["id38", "id39"])]
    spark.createDataFrame(ref).write.mode("overwrite").parquet(str(tmp_path / "ref"))
    spark.createDataFrame(ana).write.mode("overwrite").parquet(str(tmp_path / "ana"))
    cfg = {
        "run_id": "fdrec",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": str(tmp_path / "ref"),
        "analysis": str(tmp_path / "ana"),
        "chunking": {"partition_columns": ["part"]},
        "checks": [
            {
                "type": "fd",
                "determinants": ["phash_grp"],
                "dependent": "fmt",
                "id_column": "image_id",
            },
            {
                "type": "reconciliation",
                "keys": ["part"],
                "measures": [{"name": "row_count", "agg": "count"}],
                "id_column": "image_id",
            },
        ],
    }
    report = run_suite(spark, cfg)
    assert set(report) == {"fd__phash_grp_fmt", "reconciliation__part"}
    res = spark.read.parquet(str(tmp_path / "out" / "results")).toPandas()
    fd = res[res["method"] == "fd_violation_rate"].set_index("chunk_key")["value"]
    # g3 violates corpus-wide: p0 holds 2 of its rows (of 20), p1 holds 2 (of 18)
    assert np.isclose(fd["part=p0"], 2 / 20)
    assert np.isclose(fd["part=p1"], 2 / 18)
    rec = res[res["method"] == "reconciliation_mismatch_rate"].set_index("chunk_key")["value"]
    assert np.isclose(rec["part=p0"], 0.0)
    assert np.isclose(rec["part=p1"], 1.0)  # every surviving p1 row is in the bad group
    v = spark.read.parquet(str(tmp_path / "out" / "violations")).toPandas()
    kinds = v["violation_kind"].value_counts().to_dict()
    assert kinds["fd_violation"] == 4
    assert kinds["reconciliation_mismatch"] == 1
    recv = v[v["violation_kind"] == "reconciliation_mismatch"]
    assert recv["row_id"].tolist() == ["p1"] and recv["observed_value"].tolist() == ["20.0 <> 18.0"]


def test_reconciliation_empty_analysis_emits_expected_only_alert(spark):
    """ADVICE r5: with ZERO analysis rows there are no chunk rows at all —
    the most severe drop case (every expected key missing) must still emit
    a synthetic chunk carrying the expected-only count and alert."""
    exp = spark.createDataFrame(
        pd.DataFrame({"part": ["p0", "p0"], "k": ["a", "b"], "v": [1.0, 2.0]})
    )
    act = exp.filter("1 = 0")
    chk = ReconciliationCheck(
        keys=["k"],
        measures=[{"name": "rc", "agg": "count"}],
        chunker=PartitionChunker(columns=["part"]),
    ).fit(exp)
    out = chk.calculate(act).toPandas()
    eo = out[out["method"] == "reconciliation_expected_only_keys"]
    assert len(eo) == 1
    assert eo.iloc[0]["value"] == 2.0
    assert bool(eo.iloc[0]["alert"])
    rate = out[out["method"] == "reconciliation_mismatch_rate"]
    assert len(rate) == 1 and pd.isna(rate.iloc[0]["value"])
