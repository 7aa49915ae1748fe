"""qafs-spark: a PySpark-native quality-aware feature store.

A from-scratch rebuild of the capabilities of rodrigobaron/qafs (reference at
/root/reference, v0.1.1) on Spark DataFrames: named/versioned/validated
timeseries features in partitioned Parquet, a SQL metadata registry,
point-in-time ("time travel") reads, resample/as-of alignment for training
sets, cloudpickled transform features evaluated as a lazy DAG — plus the
large-scale data-pipeline extensions (dedup families, similarity search,
text analysis, multimodal columns, streaming ingest) under
:mod:`qafs_spark.pipeline` and :mod:`qafs_spark.streaming`.
"""

from .checks import Check, Column
from .core import FeatureStore, InFeature, OutFeature
from .exceptions import (
    FeatureStoreException,
    MissingFeatureException,
    RemoteFeatureStoreException,
    SchemaError,
)
from .storage import LocalStorage
from .version import __version__

__all__ = [
    "Check",
    "Column",
    "FeatureStore",
    "InFeature",
    "OutFeature",
    "FeatureStoreException",
    "MissingFeatureException",
    "RemoteFeatureStoreException",
    "SchemaError",
    "LocalStorage",
    "__version__",
]
