from spark_validate.sim.ann import brute_force_topk, lsh_bucket_topk, embedding_near_duplicates

__all__ = ["brute_force_topk", "lsh_bucket_topk", "embedding_near_duplicates"]
