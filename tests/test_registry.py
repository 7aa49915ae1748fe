import pytest

from qafs_spark.exceptions import FeatureStoreException, MissingFeatureException
from qafs_spark.registry import Registry


@pytest.fixture
def reg(tmp_path):
    return Registry(str(tmp_path / "fs.db"))


def test_namespace_crud(reg):
    reg.create_namespace("ns1", description="d1")
    with pytest.raises(FeatureStoreException):
        reg.create_namespace("ns1")  # duplicate raises (ref tests:137-139)
    reg.create_namespace("ns2")
    assert {n["name"] for n in reg.list_namespaces()} == {"ns1", "ns2"}

    reg.update_namespace("ns1", description="d1-mod")
    ns = reg.get_namespace("ns1")
    assert ns["description"] == "d1-mod"
    assert ns["version"] == 2  # version bump (ref tests:154)

    with pytest.raises(MissingFeatureException):
        reg.update_namespace("nope", description="x")

    # meta merge; None deletes (ref tests:160-170)
    reg.update_namespace("ns1", meta={"key1": "value1"})
    reg.update_namespace("ns1", meta={"key2": "value2"})
    assert reg.get_namespace("ns1")["meta"] == {"key1": "value1", "key2": "value2"}
    reg.update_namespace("ns1", meta={"key2": None})
    assert reg.get_namespace("ns1")["meta"] == {"key1": "value1"}

    assert [n["name"] for n in reg.list_namespaces(regex="ns2")] == ["ns2"]

    reg.create_feature("ns1", "f1")
    with pytest.raises(FeatureStoreException):
        reg.delete_namespace("ns1")  # still has features (ref tests:180-181)
    reg.delete_feature("ns1", "f1")
    reg.delete_namespace("ns1")
    assert reg.get_namespace("ns1") is None


def test_feature_crud(reg):
    reg.create_namespace("test")
    reg.create_feature("test", "f1", description="f1")
    with pytest.raises(FeatureStoreException):
        reg.create_feature("test", "f1")
    with pytest.raises(MissingFeatureException):
        reg.create_feature("ghost", "f1")  # namespace must exist

    reg.update_feature("test", "f1", meta={"a": 1})
    f = reg.get_feature("test", "f1")
    assert f["version"] == 2 and f["meta"] == {"a": 1}

    # serialized immutability (ref tests:415-417)
    with pytest.raises(FeatureStoreException):
        reg.update_feature("test", "f1", serialized=True)

    with pytest.raises(MissingFeatureException):
        reg.delete_feature("test", "nope")
    reg.delete_feature("test", "f1")
    assert reg.get_feature("test", "f1") is None


def test_partition_scheme_validation(reg):
    reg.create_namespace("test")
    with pytest.raises(FeatureStoreException):
        reg.create_feature("test", "f1", partition="weekly")
    reg.create_feature("test", "f2", partition="year")
    assert reg.get_feature("test", "f2")["partition"] == "year"


def test_registry_url_styles(tmp_path):
    """Reference-style SQLAlchemy URLs work for the sqlite dialect; other
    dialects fail loudly at construction naming the constraint (reference
    connection.py passes any URL to create_engine — we support the subset
    the stdlib can honor, explicitly)."""
    import pytest

    from qafs_spark.exceptions import FeatureStoreException
    from qafs_spark.registry import Registry

    r = Registry(f"sqlite:///{tmp_path}/meta.db")  # 4 slashes total → abs
    r.create_namespace("u1")
    assert r.get_namespace("u1") is not None
    r.close()
    # plain path reopens the same file
    r2 = Registry(f"{tmp_path}/meta.db")
    assert r2.get_namespace("u1") is not None
    r2.close()

    with pytest.raises(FeatureStoreException, match="dialect"):
        Registry("postgresql://host/db")
    with pytest.raises(FeatureStoreException, match="sqlite:///"):
        Registry("sqlite://nope")
