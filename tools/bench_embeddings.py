"""Embedding-scale evidence: near-dup detection + ANN at >=1M vectors.

Synthesizes N dim-D unit-ish vectors with PAIRS planted near-duplicate
twins (cosine >= ~0.98), writes parquet once, then times:

* embedding_near_duplicates (banded hyperplane LSH + bucket cap + exact
  cosine verify) — wall, pair count, planted-pair recall;
* IVFIndex build + probe top-k vs brute-force top-k (result agreement).

Usage: python tools/bench_embeddings.py [n_rows] [dim]
Prints one JSON line.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
PAIRS = max(N // 100, 1)  # 1% planted twins
SEED = 7


def synth(spark, out_dir: str):
    """Write base vectors + twins; twin of row i is id N+j with cosine>=0.98."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    n_parts = 32

    def gen(iterator):
        import pandas as pd

        for pdf in iterator:
            for pid in pdf["part"]:
                rng = np.random.default_rng(SEED + int(pid))
                rows = N // n_parts + (1 if pid < N % n_parts else 0)
                start = (N // n_parts) * int(pid) + min(int(pid), N % n_parts)
                base = rng.standard_normal((rows, DIM)).astype(np.float32)
                base /= np.linalg.norm(base, axis=1, keepdims=True)
                ids = np.arange(start, start + rows, dtype=np.int64)
                # twins for the first PAIRS global ids: tiny perturbation
                is_twin = ids < PAIRS
                twin_ids = ids[is_twin] + N
                # 0.02·g on a unit vector → noise norm ≈ 0.02·√64 = 0.16 →
                # cosine ≈ 1/√(1+0.16²) ≈ 0.987, safely above the 0.95 sweep
                twins = base[is_twin] + 0.02 * rng.standard_normal((int(is_twin.sum()), DIM)).astype(np.float32)
                twins /= np.linalg.norm(twins, axis=1, keepdims=True)
                all_ids = np.concatenate([ids, twin_ids])
                all_vecs = np.concatenate([base, twins])
                yield pd.DataFrame({"vec_id": all_ids, "embedding": list(all_vecs)})

    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    parts = spark.range(n_parts).select(F.col("id").alias("part"))
    parts.mapInPandas(gen, schema).write.mode("overwrite").parquet(out_dir)


def main():
    from spark_validate.session import get_spark
    from spark_validate.sim.ann import IVFIndex, brute_force_topk, embedding_near_duplicates

    spark = get_spark("bench_embeddings", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    out = {}
    d = tempfile.mkdtemp(prefix="svbench_emb_")
    t0 = time.time()
    synth(spark, f"{d}/vecs")
    vecs = spark.read.parquet(f"{d}/vecs")
    out["n_vectors"] = vecs.count()
    out["dim"] = DIM
    out["synth_s"] = round(time.time() - t0, 1)

    # near-duplicate sweep
    # rows_per_band sized to the corpus: random-pair candidates scale
    # n²·b/2^r, so r ≈ log2(n)+1 keeps the candidate set O(n) even on
    # worst-case isotropic data (real embedding corpora cluster, which only
    # helps the planted/near side)
    r = max(8, int(np.ceil(np.log2(max(out["n_vectors"], 2)))) + 1)
    t0 = time.time()
    dups = embedding_near_duplicates(
        vecs, threshold=0.95, n_bands=8, rows_per_band=r, dim=DIM, max_bucket=200
    )
    planted = dups.filter(
        ((dups.id_b - dups.id_a) == N) & (dups.id_a < PAIRS)
    ).count()
    n_pairs = dups.count()
    wall = time.time() - t0
    out["near_dup"] = {
        "wall_s": round(wall, 1),
        "vectors_per_sec": round(out["n_vectors"] / wall),
        "pairs_found": n_pairs,
        "planted_pairs": PAIRS,
        "planted_recall": round(planted / PAIRS, 4),
    }

    # ANN: IVF probe vs brute force on the same query
    rng = np.random.default_rng(123)
    query = rng.standard_normal(DIM)
    query /= np.linalg.norm(query)
    t0 = time.time()
    brute = [r.id for r in brute_force_topk(vecs, query, k=10).collect()]
    brute_s = time.time() - t0
    t0 = time.time()
    ivf = IVFIndex(seed=5).fit(vecs)  # auto: n_lists ~ sqrt(n), n_probe = n_lists/8
    ivf_build_s = time.time() - t0
    t0 = time.time()
    probed = [r.id for r in ivf.topk(vecs, query, k=10).collect()]
    ivf_probe_s = time.time() - t0
    out["ann"] = {
        "brute_topk_s": round(brute_s, 1),
        "ivf_build_s": round(ivf_build_s, 1),
        "ivf_probe_s": round(ivf_probe_s, 1),
        "recall_at_10": round(len(set(brute) & set(probed)) / 10, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
