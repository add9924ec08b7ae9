"""Cross-modal alignment gate (image/alignment.py) — cosine semantics,
NULL/zero/dim-mismatch conventions, check + compliance + curation +
runner wiring."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.chunking import SizeBasedChunker
from spark_validate.image.alignment import (
    AlignmentCheck,
    alignment_rule,
    cosine_sql,
    with_alignment_score,
)

ROWS = [
    (0, [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]),    # cosine 1 (scale-invariant)
    (1, [1.0, 1.0, 0.0], [-1.0, -1.0, 0.0]),  # cosine -1
    (2, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),    # orthogonal -> 0
    (3, [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]),    # zero vector -> 0 via floor
    (4, None, [1.0, 0.0, 0.0]),               # NULL vector -> NULL
    (5, [1.0, 0.0], [1.0, 0.0, 0.0]),         # dim mismatch -> NULL
]
SCHEMA = "image_id int, image_embedding array<double>, caption_embedding array<double>"


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_score_semantics(spark):
    out = {r["image_id"]: r["alignment_score"]
           for r in with_alignment_score(_df(spark)).collect()}
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(-1.0)
    assert out[2] == 0.0 and out[3] == 0.0
    assert out[4] is None and out[5] is None


def test_check_rate_mean_and_violations(spark):
    chk = AlignmentCheck(
        id_col="image_id", min_score=0.5,
        chunker=SizeBasedChunker(chunk_size=6, order_by=["image_id"]),
        upper_threshold=0.3,
    )
    res = chk.calculate(_df(spark)).toPandas().set_index("method")
    # misaligned: ids 1,2,3 (below 0.5) + 4,5 (incomputable) -> 5/6
    assert res.loc["misalignment_rate", "value"] == pytest.approx(5 / 6)
    assert bool(res.loc["misalignment_rate", "alert"])
    # mean over computable scores only: (1 - 1 + 0 + 0) / 4
    assert res.loc["alignment_mean", "value"] == pytest.approx(0.0, abs=1e-12)
    assert not bool(res.loc["alignment_mean", "alert"])
    assert pd.isna(res.loc["alignment_mean", "upper_threshold"])
    v = chk.violations(_df(spark)).toPandas()
    assert sorted(v["row_id"].astype(int)) == [1, 2, 3, 4, 5]
    # runner sink shape: violation_kind present (sampling path needs it),
    # incomputable pairs say so instead of a NULL observed value
    assert (v["violation_kind"] == "misaligned_pair").all()
    assert set(v[v["row_id"].isin(["4", "5"])]["observed_value"]) == {"incomputable"}


def test_compliance_rule_fusion_shape(spark):
    from spark_validate.checks import ComplianceCheck

    chk = ComplianceCheck(
        rules=alignment_rule(min_score=0.5),
        chunker=SizeBasedChunker(chunk_size=6, order_by=["image_id"]),
        id_column="image_id",
    )
    res = chk.calculate(_df(spark)).toPandas()
    assert res.loc[0, "column_name"] == "cross_modal_alignment"
    assert res.loc[0, "value"] == pytest.approx(5 / 6)  # NULL-is-violation


def test_curation_stage_drops_misaligned(spark):
    from spark_validate.text.curate import curate

    res = curate(
        _df(spark),
        [{"stage": "alignment", "vector_a": "image_embedding",
          "vector_b": "caption_embedding", "min_score": 0.5}],
        id_col="image_id",
    )
    kept = [r["image_id"] for r in res.curated.select("image_id").collect()]
    assert kept == [0]


def test_runner_kind(spark):
    from spark_validate.runner import build_check

    chk = build_check(
        spark,
        {"type": "alignment", "vector_a": "a", "vector_b": "b",
         "min_score": 0.4, "id_column": "rid"},
        SizeBasedChunker(chunk_size=10, order_by=["rid"]),
    )
    assert isinstance(chk, AlignmentCheck)
    assert chk.min_score == 0.4 and chk.vec_a == "a" and chk.id_col == "rid"
