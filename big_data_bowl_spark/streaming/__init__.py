from .stream_ops import (
    hourly_window_agg,
    read_events_stream,
    run_stream_to_memory,
    sessionize,
)

__all__ = ["hourly_window_agg", "read_events_stream", "run_stream_to_memory",
           "sessionize"]
