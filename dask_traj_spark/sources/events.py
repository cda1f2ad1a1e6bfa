"""Events-table loader: normalizes the ``ts`` column across the
parquet encodings the testdata generator has shipped.

Seen in the wild (driver testdata has changed between rounds):

- ``TIMESTAMP(NANOS)``: Spark's vectorized parquet reader rejects it
  ([PARQUET_TYPE_ILLEGAL]); with ``spark.sql.legacy.parquet.nanosAsLong``
  (a dynamic SQL conf) it reads as BIGINT nanos → convert to micros.
- ``timestamp[us]`` without a timezone: reads as TIMESTAMP_NTZ, which
  time functions like ``unix_micros`` reject → cast to TIMESTAMP (the
  session timezone is UTC in all our entrypoints, so wall-clock values
  are preserved).
- plain TIMESTAMP: pass through.

``normalize_event_ts`` is the single helper for all three; it works on
batch and streaming DataFrames alike (both expose ``dtypes`` from the
analyzed schema) and is shared with ``streaming/ingest`` sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` normalized to TimestampType.

    Handles BIGINT epoch-nanos (legacy nanosAsLong scans), TIMESTAMP_NTZ
    (timezone-less parquet micros), and TIMESTAMP (no-op).
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dt == "timestamp_ntz":
        # Session tz is UTC in every entrypoint; the cast reinterprets
        # the wall-clock instant in the session zone, preserving values.
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
