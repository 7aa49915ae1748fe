from .dedup_lsh import streaming_minhash_dedup
from .stateful import latest_state_stream
from .ingest import (
    read_event_stream,
    save_stream,
    session_agg,
    sliding_agg,
    tumbling_agg,
)

__all__ = [
    "latest_state_stream",
    "streaming_minhash_dedup",
    "read_event_stream",
    "save_stream",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
]
