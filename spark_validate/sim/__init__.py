from spark_validate.sim.ann import (
    IVFIndex,
    brute_force_topk,
    embedding_near_duplicates,
    lsh_bucket_topk,
)

__all__ = ["brute_force_topk", "lsh_bucket_topk", "embedding_near_duplicates", "IVFIndex"]
