"""Events-table loader: normalizes nanosecond parquet timestamps.

The TESTDATA events parquet stores ``TIMESTAMP(NANOS)`` which
Spark's vectorized parquet reader rejects ([PARQUET_TYPE_ILLEGAL]).
``spark.sql.legacy.parquet.nanosAsLong`` (a dynamic SQL conf) reads
them as BIGINT nanos; we convert to proper TimestampType (micros)
right after the scan so every downstream op sees a timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
