"""Virtual (transform) features: cloudpickled user functions over parents.

Registry format parity with the reference (src/qafs/model.py:144-162,
src/qafs/utils.py:29-58): ``{"format": "cloudpickle", "function": <b64>,
"args": ["ns/name", ...]}``. Evaluation parity with src/qafs/model.py:183-218
and src/qafs/timeseries.py:17-32: recursively load parents, outer-align +
ffill, order columns to ``args``, apply the function, coerce the result to a
single ``value`` column. Cycle detection via the ``callers`` chain
(model.py:188-190); unlike the reference, evaluation memoizes per feature so
diamond dependencies read shared parents once (SURVEY §3.3 "free win").

Execution is ``mapInPandas`` — the user function stays written against
pandas (reference-compatible), runs vectorized over Arrow batches on
executors, and composes into the surrounding lazy plan. The contract is that
the function is *row-local* (elementwise over its inputs); cross-row
functions (rolling windows etc.) should be expressed as Spark-column
transforms instead (`column_transform`).
"""

from __future__ import annotations

import base64
from typing import Callable, Dict, List, Optional

import cloudpickle
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .exceptions import FeatureStoreException

TRANSFORM_FORMAT = "cloudpickle"


def serialize_transform(func: Callable, args: List[str]) -> Dict:
    return {
        "format": TRANSFORM_FORMAT,
        "function": base64.b64encode(cloudpickle.dumps(func)).decode("ascii"),
        "args": list(args),
    }


def deserialize_transform(payload: Dict) -> Callable:
    if payload.get("format") != TRANSFORM_FORMAT:
        raise FeatureStoreException(
            f"Unknown transform format {payload.get('format')!r}"
        )
    return cloudpickle.loads(base64.b64decode(payload["function"]))


_FAMILY_TYPES = {
    "int": T.LongType(),
    "float": T.DoubleType(),
    "str": T.StringType(),
    "bool": T.BooleanType(),
    "datetime": T.TimestampType(),
}


def concrete_type_for(dtype_family: Optional[str]) -> Optional[T.DataType]:
    """Declared check dtype → Spark type, or None when not concrete (then
    the caller falls back to cached sample inference)."""
    return _FAMILY_TYPES.get(dtype_family)


def infer_output_type(aligned: DataFrame, func: Callable,
                      parent_cols: List[str], time_col: str = "time") -> T.DataType:
    """Infer the mapInPandas output type by running the function on a small
    driver sample. This RUNS A SPARK JOB — callers must cache the result per
    feature version (FeatureStore._transform_type_cache) so plan
    construction stays job-free on repeated loads."""
    sample = aligned.limit(100).toPandas()
    if sample.empty:
        return T.StringType()
    out = _apply(func, sample, parent_cols, time_col)
    probe = pd.DataFrame({"value": out.values})
    spark = aligned.sparkSession
    return spark.createDataFrame(probe).schema["value"].dataType


def _apply(func: Callable, pdf: pd.DataFrame, parent_cols: List[str],
           time_col: str) -> pd.Series:
    x = pdf.set_index(time_col)[parent_cols]
    out = func(x)
    if isinstance(out, pd.DataFrame):
        if out.shape[1] != 1:
            raise FeatureStoreException(
                "Transform functions must return a single column "
                f"(got {out.shape[1]})"
            )
        out = out.iloc[:, 0]
    if not isinstance(out, pd.Series):
        raise FeatureStoreException(
            f"Transform must return a Series/1-col DataFrame, got {type(out)}"
        )
    return out


def apply_transform(
    aligned: DataFrame,
    func: Callable,
    parent_cols: List[str],
    value_type: T.DataType,
    time_col: str = "time",
) -> DataFrame:
    """Run the user function over the aligned parents → (time, value)."""
    out_schema = T.StructType(
        [
            T.StructField(time_col, T.TimestampType()),
            T.StructField("value", value_type),
        ]
    )

    def runner(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vals = _apply(func, pdf, parent_cols, time_col)
            yield pd.DataFrame({time_col: pdf[time_col].values, "value": vals.values})

    return aligned.select(time_col, *parent_cols).mapInPandas(runner, schema=out_schema)


def column_transform(aligned: DataFrame, expr, time_col: str = "time") -> DataFrame:
    """Fast path (qafs-spark extension): the transform is a Spark Column
    expression over the parent columns — pure JVM, whole-stage codegen, no
    Python workers in the hot path."""
    return aligned.select(F.col(time_col), expr.alias("value"))
