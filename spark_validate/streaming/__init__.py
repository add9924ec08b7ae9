from spark_validate.streaming.incremental import (
    streaming_column_stats,
    streaming_freshness,
    streaming_cardinality,
    streaming_quantiles,
    streaming_violations,
    attach_thresholds,
)
from spark_validate.streaming.stateful import (
    running_group_stats,
    streaming_caption_conflicts,
    streaming_duplicate_keys,
)
from spark_validate.streaming.drift import (
    streaming_bin_shift,
    streaming_category_shift,
    streaming_correlation_drift,
    streaming_payload_drift,
    streaming_prior_shift,
    streaming_embedding_drift,
    streaming_grouped_drift,
    streaming_joint_drift,
    streaming_phash_drift,
    streaming_univariate_drift,
    streaming_vocab_drift,
)

__all__ = [
    "streaming_column_stats",
    "streaming_cardinality",
    "streaming_freshness",
    "streaming_quantiles",
    "streaming_violations",
    "attach_thresholds",
    "running_group_stats",
    "streaming_caption_conflicts",
    "streaming_duplicate_keys",
    "streaming_univariate_drift",
    "streaming_category_shift",
    "streaming_bin_shift",
    "streaming_correlation_drift",
    "streaming_payload_drift",
    "streaming_prior_shift",
    "streaming_embedding_drift",
    "streaming_grouped_drift",
    "streaming_joint_drift",
    "streaming_phash_drift",
    "streaming_vocab_drift",
]
