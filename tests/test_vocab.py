"""VocabDriftCheck — OOV-rate drift vs a reference-fitted top-K vocabulary."""

import pytest
from pyspark.sql import functions as F

from spark_validate.chunking import SizeBasedChunker
from spark_validate.text.vocab import VocabDriftCheck


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_oov_rate(spark):
    # reference: 'the' x5, 'cat' x3, 'sat' x2, 'mat' x1 → top-2 vocab {the, cat}
    ref = _docs(
        spark,
        [
            (0, "the cat sat"),
            (2, "the cat sat the mat"),
            (4, "the cat the"),
        ],
    )
    chk = VocabDriftCheck(
        top_k=2,
        chunker=SizeBasedChunker(chunk_size=2, order_by=["doc_id"]),
        upper_threshold=0.5,
    )
    chk.fit(ref)
    assert chk._vocab == ["the", "cat"]
    assert chk._coverage == pytest.approx(8 / 11)
    # analysis chunk 0: docs 1,3 → tokens the,cat,dog | cat,dog,dog
    #   → 6 tokens, 3 OOV ('dog' x3) → 0.5
    # chunk 1: doc 5 → zebra zebra → 2 tokens, 2 OOV → 1.0 (alert: > 0.5)
    ana = _docs(spark, [(1, "the cat dog"), (3, "cat dog dog"), (5, "zebra zebra")])
    res = {r["chunk_index"]: r for r in chk.calculate(ana).collect()}
    assert res[0]["value"] == pytest.approx(0.5)
    assert res[1]["value"] == pytest.approx(1.0)
    assert not res[0]["alert"] and res[1]["alert"]


def test_vocab_tiebreak_and_token_pattern(spark):
    # counts tie between 'aa' and 'bb' → (cnt DESC, token ASC) keeps 'aa';
    # tokens lowercase and split on non-[a-z0-9'] chars; apostrophes stay
    ref = _docs(spark, [(0, "AA bb! don't,don't X9")])
    chk = VocabDriftCheck(top_k=3, chunker=SizeBasedChunker(chunk_size=10, order_by=["doc_id"]))
    chk.fit(ref)
    assert chk._vocab == ["don't", "aa", "bb"]


def test_tokenless_chunk_yields_null(spark):
    ref = _docs(spark, [(0, "alpha beta")])
    chk = VocabDriftCheck(
        top_k=10, chunker=SizeBasedChunker(chunk_size=1, order_by=["doc_id"]), upper_threshold=0.5
    )
    chk.fit(ref)
    # doc 1 has tokens; doc 3 is punctuation-only; doc 5 is NULL text
    ana = _docs(spark, [(1, "alpha gamma"), (3, "?!... --"), (5, None)])
    res = {r["chunk_index"]: r for r in chk.calculate(ana).collect()}
    assert len(res) == 3  # every chunk emits a row
    assert res[0]["value"] == pytest.approx(0.5)
    assert res[1]["value"] is None and res[2]["value"] is None
    assert not res[1]["alert"] and not res[2]["alert"]  # NULL never alerts


def test_state_roundtrip(spark):
    ref = _docs(spark, [(0, "a b c a b a")])
    ana = _docs(spark, [(1, "a b z z")])
    chk = VocabDriftCheck(top_k=2, chunker=SizeBasedChunker(chunk_size=5, order_by=["doc_id"]))
    chk.fit(ref)
    clone = VocabDriftCheck(
        chunker=SizeBasedChunker(chunk_size=5, order_by=["doc_id"])
    ).set_state(chk.get_state())
    a = chk.calculate(ana).collect()
    b = clone.calculate(ana).collect()
    assert [(r["value"], r["alert"]) for r in a] == [(r["value"], r["alert"]) for r in b]
    assert clone._coverage == chk._coverage


def test_violations_per_doc(spark):
    ref = _docs(spark, [(0, "a b c a b a")])
    chk = VocabDriftCheck(
        top_k=3, chunker=SizeBasedChunker(chunk_size=5, order_by=["doc_id"]), upper_threshold=0.5
    )
    chk.fit(ref)
    ana = _docs(spark, [(1, "a b"), (3, "z z q a")])  # rates 0.0 and 0.75
    v = chk.violations(ana, row_id="doc_id").collect()
    assert [r["row_id"] for r in v] == ["3"]
    assert v[0]["violation_kind"] == "oov_rate_above_threshold"


def test_runner_vocab_drift_check(spark, tmp_path):
    from spark_validate.runner import run_suite

    ref = _docs(spark, [(i, "alpha beta gamma") for i in range(0, 40, 2)])
    ana = _docs(
        spark,
        [(i, "alpha beta gamma" if i < 20 else "omega psi chi") for i in range(1, 40, 2)],
    )
    ref_path, ana_path = str(tmp_path / "ref.parquet"), str(tmp_path / "ana.parquet")
    ref.write.parquet(ref_path)
    ana.write.parquet(ana_path)
    cfg = {
        "run_id": "vocab",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": ref_path,
        "analysis": ana_path,
        "chunking": {"chunk_size": 5, "order_by": ["doc_id"]},
        "checks": [
            {
                "type": "vocab_drift",
                "column": "text",
                "top_k": 10,
                "upper_threshold": 0.5,
            }
        ],
    }
    report = run_suite(spark, cfg)
    (entry,) = report.values()
    assert entry["rows"] == 4 and entry["alerts"] == 2  # last 2 chunks all-OOV
    # second run loads the fitted vocab from the store
    report2 = run_suite(spark, {**cfg, "run_id": "vocab"})
    (entry2,) = report2.values()
    assert entry2["fitted_from_store"] is True


def test_plan_shape(spark):
    """Broadcast vocab join, no cartesian, no Python workers."""
    from tests.test_plans import plan_str

    ref = _docs(spark, [(0, "a b c d e f")])
    ana = _docs(spark, [(1, "a b x")])
    chk = VocabDriftCheck(top_k=3, chunker=SizeBasedChunker(chunk_size=5, order_by=["doc_id"]))
    chk.fit(ref)
    plan = plan_str(chk.calculate(ana))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
