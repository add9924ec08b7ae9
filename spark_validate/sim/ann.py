"""Approximate nearest-neighbor search over embedding columns.

* ``brute_force_topk`` — exact cosine top-k: dot products via
  ``F.zip_with`` + ``F.aggregate`` (JVM-side array math, no Python in the
  scan), global top-k via a single ``orderBy(...).limit(k)`` (Spark runs this
  as per-partition TakeOrdered + driver merge — no full sort).
* ``lsh_bucket_topk`` — the scale path: random-hyperplane signatures (seeded,
  deterministic) bucket the corpus; the query only scans its own bucket
  (optionally multi-probe neighbors at Hamming distance 1).
* ``embedding_near_duplicates`` — same-bucket pairs with cosine ≥ threshold:
  the embedding-cosine near-dup detector for training corpora.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(vec_col: str, query: Sequence[float]):
    q = [float(x) for x in query]
    qn = float(np.linalg.norm(q)) or 1.0
    qlit = F.array(*[F.lit(x) for x in q])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return _dot(v, qlit) / (F.greatest(_norm(v), F.lit(1e-12)) * F.lit(qn))


def brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k. orderBy+limit compiles to TakeOrderedAndProject:
    each partition keeps k rows, the driver merges — no global shuffle."""
    sim = cosine_expr(vec_col, query)
    return (
        df.select(F.col(id_col).alias("id"), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def signature_expr(vec_col: str, planes: np.ndarray):
    """Random-hyperplane LSH signature as an int (bit i = sign(v·plane_i))."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = []
    for i in range(planes.shape[0]):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bits.append(F.when(_dot(v, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("int")


def lsh_bucket_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k: scan only the query's LSH bucket (plus Hamming-1 neighbor
    buckets when ``multiprobe``), exact cosine within. Recall is tunable via
    n_planes/multiprobe; the scan is a partition-pruned filter, not a full
    pass, once the bucket column is materialized/partitioned on."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    q = np.asarray(query, dtype=np.float64)
    q_sig = int(sum((1 << i) for i in range(n_planes) if float(planes[i] @ q) >= 0))
    probe = [q_sig] + ([q_sig ^ (1 << i) for i in range(n_planes)] if multiprobe else [])
    bucketed = df.withColumn("_sig", signature_expr(vec_col, planes))
    cand = bucketed.filter(F.col("_sig").isin(probe))
    sim = cosine_expr(vec_col, query)
    return (
        cand.select(F.col(id_col).alias("id"), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 42,
    dim: Optional[int] = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine: LSH-bucket self-join (pairs
    only form inside a bucket), exact cosine verify ≥ threshold."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    sig = df.withColumn("_sig", signature_expr(vec_col, planes))
    a = sig.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "_sig")
    b = sig.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "_sig")
    pairs = a.join(b, "_sig").filter(F.col("id_a") < F.col("id_b"))
    va = F.transform(F.col("va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("vb"), lambda x: x.cast("double"))
    cos = _dot(va, vb) / (F.greatest(_norm(va), F.lit(1e-12)) * F.greatest(_norm(vb), F.lit(1e-12)))
    return pairs.withColumn("cosine", cos).filter(F.col("cosine") >= threshold).select(
        "id_a", "id_b", "cosine"
    )
