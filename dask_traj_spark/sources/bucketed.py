"""Hash-bucketed coords tables — shuffle-free co-located joins.

``save_tables(..., bucket_frames=N)`` (loaders.py) gives hive-style
frame-range partitions for *pruning*; this module adds Spark
**bucketing** (``bucketBy`` + ``sortBy``) for *join co-location*:
two tables bucketed on the same key into the same bucket count can
be equi-joined with ZERO exchange — each task reads matching bucket
files from both sides, already hash-partitioned and sorted.

Why it matters at 100 TB: the heavy self-joins in this engine
(frame-to-frame displacement, per-atom time series, coords ⋈ coords
pair kernels keyed by atom) shuffle the full coords table every
query if stored flat. Bucketed by ``atom_id``, the shuffle happens
once at write time; every subsequent self-join (or join against any
table bucketed the same way) is a local zipper merge. The write is
exactly as expensive as one shuffle — it amortizes after the first
query.

The bucket count must match between join sides (Spark can coalesce
2:1 ratios with ``spark.sql.bucketing.coalesceBucketsInJoin``); we
default to 32 to line up with test/bench parallelism — on a real
cluster size it to (total size / ~1 GB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def save_coords_bucketed(
    coords: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 32,
    key: str = "atom_id",
) -> None:
    """Write coords as an external parquet table hash-bucketed (and
    sorted) by ``key``, secondarily sorted by frame for merge-
    friendly scans. One shuffle now, zero for every later join on
    ``key``."""
    (
        coords.repartition(n_buckets, key)
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key, "frame_id")
        .format("parquet")
        .saveAsTable(table)
    )


def frame_displacements_bucketed(
    spark: SparkSession, table: str, lag: int = 1
) -> DataFrame:
    """Per-atom frame-to-frame displacement (finite-difference
    velocity) as a window lag — no join at all. The bucketed table's
    hash distribution on atom_id satisfies the window's required
    clustering, so the executed plan has NO Exchange: each task
    lags within its own bucket files. (A self-join formulation
    would also equi-key on the frame adjacency, which defeats
    single-key bucket co-location —
    ``spark.sql.requireAllClusterKeysForCoPartition``.)"""
    from pyspark.sql import Window

    w = Window.partitionBy("atom_id").orderBy("frame_id")
    c = spark.table(table)
    return (
        c.select(
            "frame_id",
            "atom_id",
            (F.lead("x", lag).over(w) - F.col("x")).alias("dx"),
            (F.lead("y", lag).over(w) - F.col("y")).alias("dy"),
            (F.lead("z", lag).over(w) - F.col("z")).alias("dz"),
        )
        .where(F.col("dx").isNotNull())
    )


def rmsf_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Root-mean-square fluctuation per atom: per-atom mean position
    (aggregate), joined back to the rows (self-join on atom_id), then
    the mean squared deviation. On a bucketed table BOTH the
    aggregation and the join are co-located — zero Exchange in the
    executed plan; at 100 TB this is the difference between a
    full-table shuffle per query and none."""
    c = spark.table(table)
    mean = c.groupBy("atom_id").agg(
        F.avg("x").alias("mx"), F.avg("y").alias("my"), F.avg("z").alias("mz")
    )
    dev = c.join(mean.hint("merge"), "atom_id").select(
        "atom_id",
        (
            (F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx"))
            + (F.col("y") - F.col("my")) * (F.col("y") - F.col("my"))
            + (F.col("z") - F.col("mz")) * (F.col("z") - F.col("mz"))
        ).alias("sq"),
    )
    return dev.groupBy("atom_id").agg(F.sqrt(F.avg("sq")).alias("rmsf"))
