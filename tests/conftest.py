import random
import shutil
import string
import tempfile

import pandas as pd
import pytest


@pytest.fixture(scope="session")
def spark():
    from qafs_spark.session import get_spark

    s = get_spark(app_name="qafs-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture
def tmp_store(spark):
    path = tempfile.mkdtemp(prefix="qafs_spark_test_")
    yield path
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture
def fs(spark, tmp_store):
    """FeatureStore over a throwaway local dir with a deterministic clock."""
    from qafs_spark import FeatureStore

    clock_state = {"t": pd.Timestamp("2021-06-01 12:00:00")}

    def clock():
        # monotonically increasing, deterministic created_time defaults
        clock_state["t"] += pd.Timedelta("1s")
        return clock_state["t"]

    store = FeatureStore(storage=tmp_store, spark=spark, clock=clock)
    yield store


def random_string(n):
    return "".join(random.choice(string.ascii_lowercase) for _ in range(n))
