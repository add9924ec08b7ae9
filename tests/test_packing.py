"""Sequence packing (text/packing.py): conservation, bounds, determinism."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_validate.text.packing import pack_sequences, pack_sequences_greedy, packing_stats

CTX = 512


@pytest.fixture(scope="module")
def corpus(spark):
    # deterministic token counts 1..600: plenty of straddlers at ctx=512
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(600)) + 1).alias("token_count"),
    ).cache()


def test_pack_sequences_conserves_and_fills(spark, corpus):
    out = pack_sequences(corpus, context_len=CTX, n_buckets=8).toPandas()
    toks = corpus.toPandas().set_index("doc_id")["token_count"]
    # conservation: every token of every doc lands in exactly one slice
    per_doc = out.groupby("doc_id")["slice_len"].sum()
    assert (per_doc == toks.loc[per_doc.index]).all()
    assert set(per_doc.index) == set(toks.index)
    # slices respect pack bounds
    assert (out["slice_start"] >= 0).all()
    assert (out["slice_start"] + out["slice_len"] <= CTX).all()
    assert (out["slice_len"] > 0).all()
    # every pack except each bucket's last is filled to exactly CTX
    fill = out.groupby(["bucket", "pack_index"])["slice_len"].sum().reset_index()
    last = fill.groupby("bucket")["pack_index"].transform("max")
    full = fill[fill["pack_index"] < last]
    assert (full["slice_len"] == CTX).all()


def test_pack_sequences_straddlers_contiguous(spark, corpus):
    out = pack_sequences(corpus, context_len=CTX, n_buckets=8).toPandas()
    multi = out[out.groupby("doc_id")["pack_index"].transform("count") > 1]
    assert len(multi) > 0  # ctx=512 with docs up to 600 tokens must straddle
    for _, g in multi.groupby("doc_id"):
        g = g.sort_values("pack_index")
        # consecutive packs; middle slices start at 0 and run to the cut
        assert (g["pack_index"].diff().dropna() == 1).all()
        assert (g["slice_start"].iloc[1:] == 0).all()
        assert (g["slice_start"].iloc[0] + g["slice_len"].iloc[0] == CTX).all()


def test_pack_sequences_deterministic_under_partitioning(spark, corpus):
    a = pack_sequences(corpus, context_len=CTX, n_buckets=8).toPandas()
    b = pack_sequences(corpus.repartition(13), context_len=CTX, n_buckets=8).toPandas()
    key = ["doc_id", "pack_index"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_pack_sequences_greedy_never_splits_never_overflows(spark, corpus):
    out = pack_sequences_greedy(corpus, context_len=CTX, n_buckets=8)
    pdf = out.join(corpus, "doc_id").toPandas()
    # one row per doc — never split
    assert pdf["doc_id"].is_unique and len(pdf) == 2000
    # pack totals never exceed ctx except single-doc oversized packs
    g = pdf.groupby(["bucket", "pack_index"]).agg(
        total=("token_count", "sum"), n=("doc_id", "count"), over=("oversized", "any")
    )
    bad = g[g["total"] > CTX]
    assert (bad["n"] == 1).all() and bad["over"].all()
    assert (pdf["oversized"] == (pdf["token_count"] > CTX)).all()
    # pack_index is nondecreasing in doc order within a bucket (greedy walk)
    for _, grp in pdf.sort_values("doc_id").groupby("bucket"):
        assert grp["pack_index"].is_monotonic_increasing


def test_packing_stats_fill_ratio(spark, corpus):
    packed = pack_sequences(corpus, context_len=CTX, n_buckets=8)
    stats = packing_stats(packed, CTX).toPandas()
    assert len(stats) == 8
    assert (stats["fill_ratio"] <= 1.0).all()
    # only the final pack per bucket is part-empty: ratio ≥ (n-1)/n
    lower = (stats["n_packs"] - 1) / stats["n_packs"]
    assert (stats["fill_ratio"] >= lower).all()


def test_pack_sequences_drops_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, None)], "doc_id bigint, token_count bigint"
    )
    out = pack_sequences(df, context_len=CTX).toPandas()
    assert set(out["doc_id"]) == {1}
    g = pack_sequences_greedy(df, context_len=CTX).toPandas()
    assert set(g["doc_id"]) == {1}


def test_pack_sequences_duplicate_ids_conserve(spark):
    """Duplicate ids are window peers: the ROWS frame keeps their spans
    disjoint (the default RANGE frame would overlap them and break token
    conservation)."""
    rows = [(f"d{i % 50}", 37 + (i % 11)) for i in range(400)]  # every id ×8
    df = spark.createDataFrame(rows, "doc_id string, token_count bigint")
    out = pack_sequences(df, context_len=128, n_buckets=4).toPandas()
    assert out["slice_len"].sum() == sum(t for _, t in rows)  # conservation
    fill = out.groupby(["bucket", "pack_index"])["slice_len"].sum().reset_index()
    last = fill.groupby("bucket")["pack_index"].transform("max")
    assert (fill[fill["pack_index"] < last]["slice_len"] == 128).all()
