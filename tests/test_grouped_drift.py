"""Conditional per-group drift (spark_validate/drift/grouped.py)."""

import numpy as np
import pandas as pd
import pytest

from spark_validate.chunking import SizeBasedChunker
from spark_validate.drift.grouped import GroupedDriftCalculator
from spark_validate.drift.univariate import UnivariateDriftCalculator


def _corpus(n, drift_group=None, rng_seed=5):
    rng = np.random.default_rng(rng_seed)
    pdf = pd.DataFrame(
        {
            "ord": range(n),
            "fmt": np.take(["png", "jpeg", "webp"], np.arange(n) % 3),
            "w": rng.normal(100, 10, n),
        }
    )
    if drift_group:
        pdf.loc[pdf.fmt == drift_group, "w"] += 40.0
    return pdf


def test_grouped_drift_isolates_the_moved_segment(spark):
    """Only the png widths move; the png series alerts, jpeg/webp stay low,
    and the whole-frame univariate value sits between (diluted)."""
    n = 3000
    ref = spark.createDataFrame(_corpus(n))
    ana = spark.createDataFrame(_corpus(n, drift_group="png", rng_seed=6))
    chunker = SizeBasedChunker(chunk_size=n, order_by=["ord"])
    calc = GroupedDriftCalculator(
        "w", "fmt", continuous_methods=("jensen_shannon",),
        categorical_methods=(), chunker=chunker,
    ).fit(ref)
    res = calc.calculate(ana).toPandas().set_index("column_name")["value"]
    calc.release_cache()
    assert res["w@png"] > 0.5
    assert res["w@jpeg"] < 0.15 and res["w@webp"] < 0.15

    whole = UnivariateDriftCalculator(
        ["w"], continuous_methods=("jensen_shannon",), categorical_methods=(),
        chunker=chunker,
    ).fit(ref)
    wres = whole.calculate(ana).toPandas()["value"].iloc[0]
    whole.release_cache()
    assert res["w@jpeg"] < wres < res["w@png"]  # dilution, the check's raison d'être


def test_grouped_drift_matches_manual_derivation(spark):
    """The wrapper's values equal running the univariate calculator over
    hand-derived when(fmt==g, w) columns — the derivation IS the design."""
    from pyspark.sql import functions as F

    n = 1200
    ref = spark.createDataFrame(_corpus(n))
    ana = spark.createDataFrame(_corpus(n, drift_group="jpeg", rng_seed=7))
    chunker = SizeBasedChunker(chunk_size=600, order_by=["ord"])
    g = GroupedDriftCalculator(
        "w", "fmt", chunker=chunker, categorical_methods=()
    ).fit(ref)
    got = (
        g.calculate(ana).toPandas().sort_values(["chunk_key", "column_name"])["value"].tolist()
    )
    g.release_cache()

    def derive(df):
        return df.select(
            "ord", *[F.when(F.col("fmt") == x, F.col("w")).alias(f"w@{x}") for x in ("jpeg", "png", "webp")]
        )

    manual = UnivariateDriftCalculator(
        [f"w@{x}" for x in ("jpeg", "png", "webp")],
        continuous_methods=("jensen_shannon",), categorical_methods=(),
        chunker=SizeBasedChunker(chunk_size=600, order_by=["ord"]),
    ).fit(derive(ref))
    want = (
        manual.calculate(derive(ana)).toPandas()
        .sort_values(["chunk_key", "column_name"])["value"].tolist()
    )
    manual.release_cache()
    assert got == want


def test_grouped_drift_topk_bound_and_validation(spark):
    """Group discovery is bounded to the top-K reference groups by count
    (deterministic (cnt DESC, group ASC) rank); invalid group values and
    empty references raise."""
    pdf = pd.DataFrame(
        {
            "ord": range(100),
            # g0: 50 rows, g1: 30, g2: 20 → top-2 keeps g0, g1
            "grp": ["g0"] * 50 + ["g1"] * 30 + ["g2"] * 20,
            "v": np.arange(100, dtype=float),
        }
    )
    ref = spark.createDataFrame(pdf)
    calc = GroupedDriftCalculator(
        "v", "grp", top_k_groups=2,
        chunker=SizeBasedChunker(chunk_size=100, order_by=["ord"]),
        categorical_methods=(),
    ).fit(ref)
    assert calc._groups == ["g0", "g1"]
    res = calc.calculate(ref).toPandas()
    calc.release_cache()
    assert sorted(res["column_name"]) == ["v@g0", "v@g1"]

    with pytest.raises(ValueError, match="column name"):
        GroupedDriftCalculator("v", "grp").fit(
            spark.createDataFrame(pdf.assign(grp="a.b"))
        )
    with pytest.raises(ValueError, match="non-null"):
        GroupedDriftCalculator("v", "grp").fit(
            spark.createDataFrame(pdf.assign(grp=None).astype({"grp": object}))
        )


def test_grouped_drift_state_roundtrip_and_runner(spark, tmp_path):
    from spark_validate.runner import run_suite

    n = 1200
    ref_pdf = _corpus(n)
    ana_pdf = _corpus(n, drift_group="png", rng_seed=8)
    refp, anap = str(tmp_path / "ref.parquet"), str(tmp_path / "ana.parquet")
    spark.createDataFrame(ref_pdf).write.parquet(refp)
    spark.createDataFrame(ana_pdf).write.parquet(anap)

    chunker = SizeBasedChunker(chunk_size=400, order_by=["ord"])
    calc = GroupedDriftCalculator("w", "fmt", chunker=chunker, categorical_methods=()).fit(
        spark.read.parquet(refp)
    )
    clone = GroupedDriftCalculator("w", "fmt", chunker=chunker, categorical_methods=())
    clone.set_state(calc.get_state())
    a = calc.calculate(spark.read.parquet(anap)).toPandas()
    b = clone.calculate(spark.read.parquet(anap)).toPandas()
    calc.release_cache()
    clone.release_cache()
    assert a.sort_values(["chunk_key", "column_name"])["value"].tolist() == \
        b.sort_values(["chunk_key", "column_name"])["value"].tolist()

    cfg = {
        "run_id": "grouped",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": refp,
        "analysis": anap,
        "chunking": {"chunk_size": 400, "order_by": ["ord"]},
        "checks": [
            {
                "type": "grouped_drift",
                "column": "w",
                "group_column": "fmt",
                "categorical_methods": [],
            }
        ],
    }
    report = run_suite(spark, cfg)
    assert "grouped_drift__w_fmt" in report
    res = spark.read.parquet(str(tmp_path / "out" / "results")).toPandas()
    png = res[res["column_name"] == "w@png"]
    assert len(png) == 3 and (png["value"] > 0.3).all()
    # store reload on re-run
    report2 = run_suite(spark, cfg)
    assert report2["grouped_drift__w_fmt"]["fitted_from_store"] is True
