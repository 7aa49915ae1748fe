from .feature_dataset import (
    derived_partition_predicates,
    feature_path,
    partition_expr,
    read_feature,
    write_feature,
)

__all__ = [
    "derived_partition_predicates",
    "feature_path",
    "partition_expr",
    "read_feature",
    "write_feature",
]
