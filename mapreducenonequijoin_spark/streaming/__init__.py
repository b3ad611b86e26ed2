from .windows import (
    run_streaming_to_df,
    sessionize_batch,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "run_streaming_to_df",
    "tumbling_counts",
    "sliding_counts",
    "sessionize_batch",
]
