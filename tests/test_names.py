import pandas as pd
import pytest

from qafs_spark.exceptions import FeatureStoreException
from qafs_spark.names import split_name, unpack_list, validate_name


# Semantics from reference tests/test_feature_store.py:104-128
def test_split_name():
    assert split_name(name="y", namespace="x") == ("x", "y")
    assert split_name(name="y/z", namespace="x") == ("x", "y/z")
    assert split_name(name="y/z") == ("y", "z")
    assert split_name(name="z") == (None, "z")


def test_unpack_list():
    assert unpack_list("test/test1") == [("test", "test1")]
    assert unpack_list("test1", namespace="test") == [("test", "test1")]
    assert unpack_list(["test1", "test2"], namespace="test") == [
        ("test", "test1"),
        ("test", "test2"),
    ]
    assert unpack_list(["test/test1", "test/test2"]) == [
        ("test", "test1"),
        ("test", "test2"),
    ]
    assert unpack_list(
        [{"name": "test/test1"}, {"name": "test2", "namespace": "test"}]
    ) == [("test", "test1"), ("test", "test2")]
    df = pd.DataFrame({"namespace": ["test", "test"], "name": ["test1", "test2"]})
    assert unpack_list(df) == [("test", "test1"), ("test", "test2")]


def test_validate_name():
    validate_name("abc_1.2#ok-too")
    with pytest.raises(FeatureStoreException):
        validate_name("bad/name")
    with pytest.raises(FeatureStoreException):
        validate_name("bad name")
