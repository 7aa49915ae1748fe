"""Pin the check-YAML parity claim against pandera itself (round-11
verdict task 8).

The reference stores every feature's check as
``pandera.io.to_yaml(DataFrameSchema({name: check}))`` and reloads with
``pandera.io.from_yaml`` (reference core.py:281, :414). Our
:mod:`qafs_spark.checks` writes a format-parity YAML without importing
pandera (its pyspark support is row-at-a-time; enforcement here is
native Spark expressions). This test round-trips OUR YAML through REAL
pandera when the library is importable, pinning the format claim; in
environments without pandera (this sandbox forbids installs) it SKIPS
with that reason — the skip is the documented state, not a pass.
"""

import pytest

from qafs_spark.checks import Check, Column

pandera = pytest.importorskip(
    "pandera",
    reason="pandera not installed in this environment (installs are "
    "forbidden); the YAML parity claim is pinned only where pandera is "
    "available — see module docstring",
)


def _col():
    return Column(
        float,
        checks=[Check.greater_than(0), Check.in_range(0, 10)],
        nullable=False,
        name="ns/x",
    )


def test_yaml_loads_in_real_pandera():
    """pandera.io.from_yaml must accept our to_yaml output and agree on
    the column name, nullability, and check inventory."""
    import pandera.io

    schema = pandera.io.from_yaml(_col().to_yaml())
    assert set(schema.columns) == {"ns/x"}
    col = schema.columns["ns/x"]
    assert col.nullable is False
    got = {c.name if hasattr(c, "name") else str(c) for c in col.checks}
    assert {"greater_than", "in_range"} <= got


def test_pandera_yaml_loads_in_ours():
    """The reverse direction: YAML pandera itself emits for an equivalent
    schema must parse into an equivalent qafs_spark Column."""
    import pandera as pa
    import pandera.io

    schema = pa.DataFrameSchema(
        {
            "ns/x": pa.Column(
                float,
                checks=[pa.Check.greater_than(0), pa.Check.in_range(0, 10)],
                nullable=False,
            )
        }
    )
    ours = Column.from_yaml(pandera.io.to_yaml(schema))
    assert ours.name == "ns/x"
    assert ours.nullable is False
    assert {c.name for c in ours.checks} == {"greater_than", "in_range"}
