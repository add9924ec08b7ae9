from spark_validate.streaming.incremental import (
    streaming_column_stats,
    streaming_violations,
    attach_thresholds,
)

__all__ = ["streaming_column_stats", "streaming_violations", "attach_thresholds"]
