from mini_lakehouse_control_plane_executor_spark.streaming.windows import (
    stream_events,
    tumbling_counts,
    sliding_counts,
    sessionize_stream,
)

__all__ = ["stream_events", "tumbling_counts", "sliding_counts", "sessionize_stream"]
