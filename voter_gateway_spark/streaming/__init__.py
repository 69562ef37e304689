from voter_gateway_spark.streaming.events import (
    hourly_counts,
    sessionize,
    stream_hourly_counts,
)
from voter_gateway_spark.streaming.index_dedup import (
    admit_batch,
    bootstrap_index,
    stream_dedup_against_index,
)

__all__ = [
    "hourly_counts",
    "sessionize",
    "stream_hourly_counts",
    "admit_batch",
    "bootstrap_index",
    "stream_dedup_against_index",
]
