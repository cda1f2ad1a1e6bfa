"""Bucketed coords tables: round-trip, co-located self-join with no
exchange, correctness of displacements vs a direct computation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_traj_spark.sources.bucketed import (
    frame_displacements_bucketed,
    save_coords_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_table(spark, traj_triclinic, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bucketed") / "coords_b")
    save_coords_bucketed(
        traj_triclinic.coords, "coords_bucketed_test", path, n_buckets=8
    )
    yield "coords_bucketed_test"
    spark.sql("DROP TABLE IF EXISTS coords_bucketed_test")


def test_round_trip_count(spark, traj_triclinic, bucketed_table):
    n = spark.table(bucketed_table).count()
    assert n == traj_triclinic.coords.count()


def test_displacement_window_has_no_exchange(spark, bucketed_table):
    out = frame_displacements_bucketed(spark, bucketed_table)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Window" in plan


def test_rmsf_agg_and_join_have_no_exchange(spark, bucketed_table):
    from dask_traj_spark.sources.bucketed import rmsf_bucketed

    out = rmsf_bucketed(spark, bucketed_table)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_rmsf_matches_direct(spark, traj_triclinic, bucketed_table):
    from dask_traj_spark.sources.bucketed import rmsf_bucketed

    got = (
        rmsf_bucketed(spark, bucketed_table)
        .where(F.col("atom_id") == 3)
        .first()["rmsf"]
    )
    pdf = (
        traj_triclinic.coords.where(F.col("atom_id") == 3)
        .toPandas()[["x", "y", "z"]]
        .to_numpy()
    )
    want = np.sqrt(((pdf - pdf.mean(axis=0)) ** 2).sum(axis=1).mean())
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_displacements_match_direct(spark, traj_triclinic, bucketed_table):
    out = (
        frame_displacements_bucketed(spark, bucketed_table)
        .where((F.col("atom_id") == 7) & (F.col("frame_id") < 5))
        .orderBy("frame_id")
        .toPandas()
    )
    direct = (
        traj_triclinic.coords.where(
            (F.col("atom_id") == 7) & (F.col("frame_id") < 6)
        )
        .orderBy("frame_id")
        .toPandas()
    )
    got = out[["dx", "dy", "dz"]].to_numpy()
    want = np.diff(direct[["x", "y", "z"]].to_numpy(), axis=0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_append_then_compact_restores_one_file_per_bucket(
    spark, traj_triclinic, tmp_path_factory
):
    """Ingest-in-batches fragments the table (files per bucket grows
    with batch count); compaction rewrites to exactly one file per
    bucket with identical content and the same zero-exchange plans."""
    from dask_traj_spark.sources.bucketed import (
        append_coords_bucketed,
        bucket_file_stats,
        compact_bucketed,
        save_coords_bucketed,
    )

    base = tmp_path_factory.mktemp("compact")
    c = traj_triclinic.coords
    first = c.where(F.col("frame_id") < 50)
    rest = c.where(F.col("frame_id") >= 50)
    save_coords_bucketed(first, "coords_frag_test", str(base / "frag"), n_buckets=8)
    append_coords_bucketed(rest, "coords_frag_test", n_buckets=8)

    frag = bucket_file_stats(spark, "coords_frag_test")
    assert sum(frag.values()) > 8, frag  # two batches → >1 file in some bucket

    compact_bucketed(
        spark, "coords_frag_test", "coords_compact_test", str(base / "compact"),
        n_buckets=8,
    )
    comp = bucket_file_stats(spark, "coords_compact_test")
    assert set(comp) == set(range(8)) and all(v == 1 for v in comp.values()), comp

    # content identical
    a = spark.table("coords_frag_test")
    b = spark.table("coords_compact_test")
    assert a.count() == b.count() == c.count()
    assert a.exceptAll(b).count() == 0

    # co-located plans still exchange-free on the compacted table
    out = frame_displacements_bucketed(spark, "coords_compact_test")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    spark.sql("DROP TABLE IF EXISTS coords_frag_test")
    spark.sql("DROP TABLE IF EXISTS coords_compact_test")


def test_frame_partition_compaction(spark, traj_triclinic, tmp_path_factory):
    """Partition-scoped OPTIMIZE: appending fragments only some
    frame_bucket partitions; compaction rewrites exactly those,
    preserves content, and pruning still works."""
    from dask_traj_spark.sources.loaders import (
        compact_frame_partitions,
        partition_file_stats,
        save_tables,
    )

    base = str(tmp_path_factory.mktemp("hivecompact") / "tables")
    first = traj_triclinic.slice_frames(0, 60)
    save_tables(first, base, bucket_frames=20)
    coords_path = f"{base}/coords.parquet"

    # append the remaining frames — fragments the touched buckets
    rest = traj_triclinic.coords.where(F.col("frame_id") >= 60)
    (
        rest.withColumn("frame_bucket", F.expr("frame_id div 20"))
        .repartition(4)
        .write.mode("append")
        .partitionBy("frame_bucket")
        .parquet(coords_path)
    )
    before = partition_file_stats(coords_path)
    assert any(n > 1 for n in before.values()), before

    n_total = spark.read.parquet(coords_path).count()
    compacted = compact_frame_partitions(spark, coords_path, min_files=2)
    assert compacted, before
    after = partition_file_stats(coords_path)
    for b in compacted:
        assert after[b] <= max(1, before[b] // 2), (b, before[b], after[b])
    # untouched partitions keep their layout; content identical
    for b, n in before.items():
        if b not in compacted:
            assert after[b] == n
    assert spark.read.parquet(coords_path).count() == n_total
    got = spark.read.parquet(coords_path).select(
        "frame_id", "atom_id", "x", "y", "z"
    )
    assert got.exceptAll(
        traj_triclinic.coords.select("frame_id", "atom_id", "x", "y", "z")
    ).count() == 0
