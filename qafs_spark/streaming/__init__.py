from .ingest import (
    read_event_stream,
    save_stream,
    session_agg,
    sliding_agg,
    tumbling_agg,
)

__all__ = [
    "read_event_stream",
    "save_stream",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
]
