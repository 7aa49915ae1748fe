"""Feature/namespace name validation and parsing.

Semantics are specified by the reference test-suite
(reference: tests/test_feature_store.py:104-128) and the registry model
(reference: src/qafs/model.py:32, :42-45, :134-136):

* names match ``^[a-zA-Z0-9\\.#_-]+$``
* full name is ``namespace/name``
* ``split_name``/``unpack_list`` accept the convenience spellings users
  actually write: ``"ns/name"`` strings, bare names + namespace kwarg,
  lists of either, lists of dicts, and DataFrames with namespace/name
  columns.

Everything here is driver-side metadata handling — no Spark involved.
"""

from __future__ import annotations

import re
from typing import Any, Iterable, List, Optional, Tuple

from .exceptions import FeatureStoreException

NAME_PATTERN = re.compile(r"^[a-zA-Z0-9\.#_-]+$")


def validate_name(name: str) -> str:
    """Validate a bare (no namespace) feature/namespace name."""
    if not isinstance(name, str) or not NAME_PATTERN.match(name):
        raise FeatureStoreException(
            f"Invalid name {name!r}: must match {NAME_PATTERN.pattern}"
        )
    return name


def split_name(
    name: Optional[str] = None, namespace: Optional[str] = None
) -> Tuple[Optional[str], str]:
    """Split ``"ns/name"`` into ``(ns, name)``.

    An explicitly-passed ``namespace`` wins and the name is kept verbatim
    (reference: tests/test_feature_store.py:108-111):

    >>> split_name(name="y/z")
    ('y', 'z')
    >>> split_name(name="y/z", namespace="x")
    ('x', 'y/z')
    >>> split_name(name="z")
    (None, 'z')
    """
    if name is None:
        raise FeatureStoreException("name is required")
    if namespace is None and "/" in name:
        namespace, name = name.split("/", 1)
    return namespace, name


def unpack_list(
    features: Any, namespace: Optional[str] = None
) -> List[Tuple[Optional[str], str]]:
    """Normalize any user spelling of "a set of features" to [(ns, name)].

    Accepted (reference: tests/test_feature_store.py:113-128):
      * ``"ns/name"`` or ``"name"`` (with ``namespace=``)
      * list of strings
      * list of dicts ``{"name": ..., "namespace": ...}``
      * list of objects with ``.name`` / ``.namespace`` (InFeature/OutFeature)
      * a DataFrame (pandas or Spark) with ``name`` (+ optional ``namespace``)
        columns, e.g. the output of ``FeatureStore.list_features``.
    """
    if features is None:
        return []
    if isinstance(features, str):
        return [split_name(features, namespace)]
    if hasattr(features, "name") and hasattr(features, "namespace") and not _is_dataframe(features):
        ns = features.namespace if features.namespace is not None else namespace
        return [split_name(features.name, ns)]
    if _is_dataframe(features):
        rows = _dataframe_rows(features)
        return [
            split_name(r.get("name"), r.get("namespace") or namespace) for r in rows
        ]
    if isinstance(features, Iterable):
        out: List[Tuple[Optional[str], str]] = []
        for item in features:
            if isinstance(item, str):
                out.append(split_name(item, namespace))
            elif isinstance(item, dict):
                out.append(split_name(item.get("name"), item.get("namespace") or namespace))
            elif hasattr(item, "name"):
                ns = getattr(item, "namespace", None) or namespace
                out.append(split_name(item.name, ns))
            else:
                raise FeatureStoreException(f"Cannot interpret feature spec: {item!r}")
        return out
    raise FeatureStoreException(f"Cannot interpret feature spec: {features!r}")


def full_name(namespace: Optional[str], name: str) -> str:
    return f"{namespace}/{name}"


def _is_dataframe(obj: Any) -> bool:
    # Duck-typed so we don't import pyspark/pandas at module import time.
    return hasattr(obj, "columns") and (hasattr(obj, "iterrows") or hasattr(obj, "collect"))


def _dataframe_rows(df: Any) -> List[dict]:
    if hasattr(df, "iterrows"):  # pandas
        return [row.to_dict() for _, row in df.iterrows()]
    return [row.asDict() for row in df.collect()]  # pyspark
