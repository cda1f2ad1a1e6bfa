"""Validation utilities — the reference's ``ensure_type`` (P5,
``/root/reference/dask_traj/utils/validation.py:14-143``) re-homed
for a relational engine.

Two layers:

- ``ensure_type``: driver-side numpy validation with the reference's
  public semantics (dtype cast with warning, ndim check with
  optional length-1 promotion, shape-pattern matching where None
  means "any") — used for index sets / small arrays entering
  operators.
- ``ensure_schema``: the Spark-native analog — casts a DataFrame to
  a target StructType (schema-on-write), erroring on missing
  columns; extra columns are dropped. Shape patterns are meaningless
  relationally; column names + types ARE the schema.
"""

from __future__ import annotations

import warnings

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def ensure_type(
    val,
    dtype,
    ndim: int,
    name: str,
    length: int | None = None,
    can_be_none: bool = False,
    shape=None,
    warn_on_cast: bool = True,
    add_newaxis_on_deficient_ndim: bool = False,
):
    """Validate/coerce a numpy array (reference-parity surface)."""
    if val is None:
        if can_be_none:
            return None
        raise TypeError(f"{name} must not be None")
    arr = np.asarray(val)
    if arr.dtype != np.dtype(dtype):
        if warn_on_cast:
            warnings.warn(
                f"Casting {name} dtype={arr.dtype} to {np.dtype(dtype)}",
                stacklevel=2,
            )
        arr = arr.astype(dtype)
    if arr.ndim == ndim - 1 and add_newaxis_on_deficient_ndim:
        arr = arr[np.newaxis]
    if arr.ndim != ndim:
        raise ValueError(f"{name} must be {ndim}-dimensional, got {arr.ndim}")
    if length is not None and len(arr) != length:
        raise ValueError(f"{name} must have length {length}, got {len(arr)}")
    if shape is not None:
        for want, got in zip(shape, arr.shape):
            if want is not None and want != got:
                raise ValueError(
                    f"{name} must have shape {shape}, got {arr.shape}"
                )
    return np.ascontiguousarray(arr)


def ensure_schema(df: DataFrame, schema: T.StructType, name: str = "df") -> DataFrame:
    """Cast ``df`` to ``schema`` (order + types), raising on missing
    columns; extra columns are dropped."""
    from pyspark.sql import functions as F

    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"{name} is missing required columns {missing}")
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
