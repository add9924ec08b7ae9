from spark_validate.sim.ann import (
    IVFIndex,
    brute_force_topk,
    EmbeddingLeakageCheck,
    embedding_decontaminate,
    embedding_near_duplicates,
    embedding_clusters,
    ivf_probe_topk,
    lsh_bucket_topk,
    write_ivf_partitioned,
)
from spark_validate.sim.quantize import (
    QuantizationErrorCheck,
    dequantize,
    fit_minmax,
    quantize,
)

__all__ = [
    "QuantizationErrorCheck",
    "dequantize",
    "fit_minmax",
    "quantize",
    "brute_force_topk",
    "lsh_bucket_topk",
    "EmbeddingLeakageCheck",
    "embedding_decontaminate",
    "embedding_near_duplicates",
    "embedding_clusters",
    "IVFIndex",
    "write_ivf_partitioned",
    "ivf_probe_topk",
]
