from voter_gateway_spark.streaming.events import (
    hourly_counts,
    sessionize,
    stream_hourly_counts,
)

__all__ = ["hourly_counts", "sessionize", "stream_hourly_counts"]
