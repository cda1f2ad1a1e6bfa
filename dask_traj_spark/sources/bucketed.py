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


def append_coords_bucketed(
    coords: DataFrame,
    table: str,
    n_buckets: int = 32,
    key: str = "atom_id",
) -> None:
    """Append frames to an existing bucketed table (one-shot
    new-segment flow). Correct — new rows hash into the right
    buckets — but each append task adds one file per bucket it
    touches, so a table ingested in T batches carries O(T × buckets)
    files. ``compact_bucketed`` restores one-file-per-bucket.

    NOT idempotent: a blind append re-run duplicates rows. Streaming
    ingest must use ``overwrite_coords_bucketed_batch``, whose
    replay overwrites the batch's own partition."""
    (
        coords.repartition(n_buckets, key)
        .write.mode("append")
        .bucketBy(n_buckets, key)
        .sortBy(key, "frame_id")
        .format("parquet")
        .saveAsTable(table)
    )


def overwrite_coords_bucketed_batch(
    coords: DataFrame,
    table: str,
    batch_id: int,
    n_buckets: int = 32,
    key: str = "atom_id",
) -> None:
    """Exactly-once micro-batch append: stamp rows with ``batch_id``,
    store the table hive-partitioned by it (bucketed by ``key``
    within each partition), and make every write a DYNAMIC PARTITION
    OVERWRITE of that one batch partition.

    Replays are idempotent by construction: if the driver dies after
    the files land but before the streaming checkpoint commits, the
    restarted query re-runs the same ``batch_id`` and the overwrite
    replaces the partial partition instead of appending next to it.
    This is the standard Spark recovery contract for foreachBatch
    sinks without transactional storage (the alternative — a
    committed-ids ledger — still leaks the append/commit race this
    closes).

    Bucketed-join co-location survives the extra partition level:
    bucket b's files across all batch partitions form one bucket
    group, so per-atom self-joins stay zero-exchange; queries that
    don't filter on ``batch_id`` simply ignore it (and ops like
    ``compact_bucketed`` fold it away)."""
    spark = coords.sparkSession
    stamped = coords.withColumn("batch_id", F.lit(int(batch_id)))
    if not spark.catalog.tableExists(table):
        (
            stamped.repartition(n_buckets, key)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .bucketBy(n_buckets, key)
            .sortBy(key, "frame_id")
            .format("parquet")
            .saveAsTable(table)
        )
        return
    # insertInto is positional — align to the catalog column order
    # (partition column last); dynamic mode overwrites only the batch
    # partition(s) present in this DataFrame.
    # dynamic partition-overwrite only for THIS insert — restore the
    # session conf so later mode('overwrite').partitionBy writes keep
    # their default truncate-table semantics
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        cols = spark.table(table).columns
        (
            stamped.select(*cols)
            .repartition(n_buckets, key)
            .write.insertInto(table, overwrite=True)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def bucket_file_stats(spark: SparkSession, table: str) -> dict[int, int]:
    """Files per bucket id, parsed from the bucket suffix Spark
    encodes in every file name (``..._00007.c000``). The compaction
    trigger: any bucket with more than a handful of files (or files
    far below the parquet row-group sweet spot) is paying per-file
    open/footer costs on every scan. Driver-side metadata only — no
    data read. (On a real cluster the same listing comes from the
    catalog/manifest, not a local walk.)"""
    import re

    counts: dict[int, int] = {}
    for f in spark.table(table).inputFiles():
        m = re.search(r"_(\d{5})(?:\.c\d+)?\.", f.rsplit("/", 1)[-1])
        if m:
            b = int(m.group(1))
            counts[b] = counts.get(b, 0) + 1
    return counts


def compact_bucketed(
    spark: SparkSession,
    src_table: str,
    dst_table: str,
    dst_path: str,
    n_buckets: int = 32,
    key: str = "atom_id",
) -> None:
    """OPTIMIZE-style rewrite of a fragmented bucketed table into an
    identically-bucketed table with exactly one file per bucket
    (``repartition(n_buckets, key)`` → each task holds exactly one
    bucket's rows and writes one file). Costs one shuffle — the same
    price as the original write — and every co-located plan
    (window/agg/join with zero Exchange) holds unchanged on the
    compacted table. At 100 TB you run this per hive partition of
    the frame-range layout, compacting only partitions whose
    ``bucket_file_stats`` crossed the threshold, not the whole
    table.

    Reads the table's parquet files by *path*, not through the
    catalog: against the catalog table Spark sees a matching bucket
    spec, elides the repartition as redundant, and lets write tasks
    mirror the fragmented input file groups — re-emitting one file
    per (task, bucket), i.e. the fragmentation survives. A plain
    path scan has no bucket metadata, so the exchange is real and
    each bucket lands in exactly one writer."""
    files = spark.table(src_table).inputFiles()
    dirs = sorted({f.rsplit("/", 1)[0] for f in files})
    src = spark.read.parquet(*dirs)
    (
        src.repartition(n_buckets, key)
        .write.mode("overwrite")
        .option("path", dst_path)
        .bucketBy(n_buckets, key)
        .sortBy(key, "frame_id")
        .format("parquet")
        .saveAsTable(dst_table)
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
