from .events import (
    event_stream_schema,
    normalize_event_ts,
    probe_event_ts_dtype,
    read_events,
    read_events_stream,
)
from .feature_dataset import (
    derived_partition_predicates,
    feature_path,
    partition_expr,
    read_feature,
    write_feature,
)

__all__ = [
    "derived_partition_predicates",
    "event_stream_schema",
    "normalize_event_ts",
    "probe_event_ts_dtype",
    "read_events",
    "read_events_stream",
    "feature_path",
    "partition_expr",
    "read_feature",
    "write_feature",
]
