"""Trajectory loading (S1-S9) — Spark-native.

The reference's loader builds one delayed read per frame-chunk and
infers schema by computing a sample chunk
(``/root/reference/dask_traj/core/dask_traj.py:61-213``). In Spark
the canonical store is a directory of Parquet tables with STATIC
schemas (no sample-compute at plan time; scans are partitioned and
column-pruned by the Parquet source itself):

    <dir>/coords.parquet      (frame_id, atom_id, x, y, z)
    <dir>/frames.parquet      optional
    <dir>/unitcell.parquet    optional
    <dir>/topology.parquet    optional

Text ``.xyz`` files load through the custom Python DataSource in
``xyz.py`` (chunked ``partitions()``, analogous to the reference's
``load_chunks`` — core/dask_traj.py:103-140). Unknown extensions
raise NotImplementedError exactly like the reference's
unimplemented-format path (core/dask_traj.py:167-169).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from dask_traj_spark import schemas
from dask_traj_spark.trajectory import Trajectory

#: extension → loader kind; mirrors the reference's ``file_returns``
#: dispatch (core/dask_traj.py:26-56). Formats we can parse today
#: map to a loader; known-but-unimplemented raise.
SUPPORTED_EXTENSIONS = {
    ".parquet": "parquet_dir",
    "": "parquet_dir",  # a directory of tables
    ".xyz": "xyz",
    ".xyz.gz": "xyz",
    ".dcd": "dcd",
    ".xtc": "xtc",
    ".trr": "trr",
    ".gro": "gro",
    ".binpos": "binpos",
    ".lammpstrj": "lammpstrj",
    ".inpcrd": "restart",
    ".restrt": "restart",
    ".rst7": "restart",
    ".crd": "mdcrd",
    ".mdcrd": "mdcrd",
    ".nc": "netcdf",
    ".netcdf": "netcdf",
    ".ncdf": "netcdf",
    ".ncrst": "ncrestart",
    ".arc": "arc",
    ".h5": "hdf5",
    ".hdf5": "hdf5",
    ".lh5": "lh5",
}
KNOWN_UNIMPLEMENTED = {
    ".pdb", ".pdb.gz", ".xml", ".mol2", ".hoomdxml",
    ".hdf", ".gsd", ".stk", ".dtr", ".tng",
}


def load(spark_or_path, path: str | None = None, **options) -> Trajectory:
    """``load(spark, path)`` or ``load(path)`` (reference-parity
    one-arg form, using the active SparkSession) → Trajectory. Lazy:
    nothing reads until an action runs (reference S1,
    core/dask_traj.py:61-100)."""
    if path is None:
        if not isinstance(spark_or_path, str):
            raise TypeError("usage: load(spark, path) or load(path)")
        path = spark_or_path
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            from dask_traj_spark.session import get_spark

            spark = get_spark()
    else:
        spark = spark_or_path
    top = options.pop("top", None)
    ext = _extension(path)
    kind = SUPPORTED_EXTENSIONS.get(ext)
    if kind is None:
        if ext in KNOWN_UNIMPLEMENTED:
            raise NotImplementedError(
                f"Format {ext!r} is recognized but not implemented yet"
            )
        raise NotImplementedError(f"Unknown trajectory format {ext!r}")
    if kind == "parquet_dir":
        traj = load_tables(spark, path)
    elif kind == "xyz":
        from dask_traj_spark.sources.xyz import load_xyz

        traj = load_xyz(spark, path, **options)
    elif kind == "dcd":
        from dask_traj_spark.sources.dcd import load_dcd

        traj = load_dcd(spark, path, **options)
    elif kind == "xtc":
        from dask_traj_spark.sources.xtc import load_xtc

        traj = load_xtc(spark, path, **options)
    elif kind == "trr":
        from dask_traj_spark.sources.trr import load_trr

        traj = load_trr(spark, path, **options)
    elif kind == "gro":
        from dask_traj_spark.sources.gro import load_gro

        traj = load_gro(spark, path, **options)
    elif kind == "binpos":
        from dask_traj_spark.sources.binpos import load_binpos

        traj = load_binpos(spark, path, **options)
    elif kind == "lammpstrj":
        from dask_traj_spark.sources.lammpstrj import load_lammpstrj

        traj = load_lammpstrj(spark, path, **options)
    elif kind == "restart":
        from dask_traj_spark.sources.amber import load_restart

        traj = load_restart(spark, path, **options)
    elif kind == "mdcrd":
        from dask_traj_spark.sources.amber import load_mdcrd

        traj = load_mdcrd(spark, path, top=top, **options)
        top = None  # consumed (supplies the atom count + topology)
    elif kind == "netcdf":
        from dask_traj_spark.sources.netcdf3 import load_netcdf

        traj = load_netcdf(spark, path, **options)
    elif kind == "ncrestart":
        from dask_traj_spark.sources.netcdf3 import load_ncrestart

        traj = load_ncrestart(spark, path, **options)
    elif kind == "arc":
        from dask_traj_spark.sources.arc import load_arc

        traj = load_arc(spark, path, **options)
    elif kind == "hdf5":
        from dask_traj_spark.sources.hdf5 import load_hdf5

        traj = load_hdf5(spark, path, **options)
    elif kind == "lh5":
        from dask_traj_spark.sources.hdf5 import load_lh5

        traj = load_lh5(spark, path, **options)
    else:
        raise AssertionError(kind)
    if top is not None:
        # reference S1: load(traj, top=...) parses the topology file
        # eagerly and validates it against the trajectory
        # (core/dask_traj.py:80-83 — without reproducing its
        # unbound-name bug on topology-bearing extensions, §8)
        from dask_traj_spark.sources.topology import load_topology

        tdf = load_topology(spark, top)
        n_top = tdf.count()
        if n_top != traj.n_atoms:
            raise ValueError(
                f"topology has {n_top} atoms but trajectory has "
                f"{traj.n_atoms}"
            )
        traj.topology = tdf
    return traj


def load_multi(
    spark: SparkSession,
    paths: "list[str] | str",
    chunks: int = 100,
    check_topology: bool = False,
    **options,
) -> Trajectory:
    """Load a sequence of trajectory files (a glob pattern or an
    explicit ordered list) as ONE trajectory, frames renumbered
    across the file boundary.

    The reference is single-file; at real scale a trajectory is
    always a directory of segment files. Each file keeps its own
    chunked DataSource scan (per-file partitions ⇒ parallel decode
    across files AND chunks); concatenation is the lazy UNION ALL of
    ``Trajectory.join`` (U1), so nothing materializes here.
    """
    import glob as _glob

    if isinstance(paths, str):
        paths = sorted(_glob.glob(paths))
    if not paths:
        raise ValueError("load_multi: no input files")
    trajs = [load(spark, p, chunks=chunks, **options) for p in paths]
    out = trajs[0]
    for t in trajs[1:]:
        out = out.join(t, check_topology=check_topology)
    return out


def _extension(path: str) -> str:
    base = os.path.basename(path.rstrip("/"))
    if "." not in base:
        return ""
    for suffix in (".pdb.gz", ".xyz.gz"):
        if base.lower().endswith(suffix):
            return suffix
    return os.path.splitext(base)[1].lower()


def load_tables(spark: SparkSession, directory: str) -> Trajectory:
    """Load the canonical Parquet table layout. A ``frame_bucket``
    hive-partition column (written by ``save_tables(...,
    bucket_frames=N)``) is dropped after the scan — it exists purely
    so frame-range predicates prune whole directories."""
    def opt(name: str) -> DataFrame | None:
        p = os.path.join(directory, f"{name}.parquet")
        return spark.read.parquet(p) if os.path.exists(p) else None

    coords = opt("coords")
    if coords is None:
        raise FileNotFoundError(f"{directory}/coords.parquet not found")
    # normalize column ORDER, not just the set: after a dynamic
    # partition-overwrite compaction the scan can surface data
    # columns in a different order, and positional consumers
    # (exceptAll, union, packed feeds) would silently mismatch
    coords = coords.select("frame_id", "atom_id", "x", "y", "z")
    return Trajectory(coords, opt("frames"), opt("unitcell"), opt("topology"))


def save_tables(
    traj: Trajectory,
    directory: str,
    mode: str = "overwrite",
    bucket_frames: int | None = None,
) -> None:
    """Sink: write the trajectory back as Parquet tables (the
    reference has NO sinks at all — SURVEY.md S11; Spark gives us
    this for free).

    100 TB layout: coords range-partitioned on frame_id and sorted
    by (frame_id, atom_id) inside every file, so scans stream frames
    in order. With ``bucket_frames=N`` a ``frame_bucket =
    frame_id div N`` hive-partition column is added — frame-range
    predicates then prune whole directories before any I/O
    (PartitionFilters in the scan node), the parquet-source analog
    of the reference's chunk culling (core/dask_traj.py:212).
    """
    from pyspark.sql import functions as F

    coords = traj.coords
    path = os.path.join(directory, "coords.parquet")
    if bucket_frames:
        (
            coords.withColumn(
                "frame_bucket", F.expr(f"frame_id div {int(bucket_frames)}")
            )
            .repartitionByRange("frame_bucket", "frame_id")
            .sortWithinPartitions("frame_id", "atom_id")
            .write.mode(mode)
            .partitionBy("frame_bucket")
            .parquet(path)
        )
    else:
        (
            coords.repartitionByRange("frame_id")
            .sortWithinPartitions("frame_id", "atom_id")
            .write.mode(mode)
            .parquet(path)
        )
    for name, df in (
        ("frames", traj._frames),
        ("unitcell", traj.unitcell),
        ("topology", traj.topology),
    ):
        if df is not None:
            df.write.mode(mode).parquet(os.path.join(directory, f"{name}.parquet"))
    import json

    with open(os.path.join(directory, "_traj_meta.json"), "w") as fh:
        json.dump({"bucket_frames": bucket_frames}, fh)


def load_frame_range(
    spark: SparkSession, directory: str, lo: int, hi: int
) -> Trajectory:
    """Load only frames ``lo <= frame_id < hi``. When the layout was
    written with ``bucket_frames=N`` this adds the derived
    ``frame_bucket`` predicate so whole hive partitions are pruned
    before any I/O — a frame_id predicate alone cannot prune a
    directory keyed on a derived column, so the engine derives it
    from the stored metadata."""
    import json

    from pyspark.sql import functions as F

    meta_path = os.path.join(directory, "_traj_meta.json")
    n = None
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            n = json.load(fh).get("bucket_frames")
    coords = spark.read.parquet(os.path.join(directory, "coords.parquet"))
    pred = (F.col("frame_id") >= lo) & (F.col("frame_id") < hi)
    if n and "frame_bucket" in coords.columns:
        pred = (
            pred
            & (F.col("frame_bucket") >= lo // n)
            & (F.col("frame_bucket") <= max(lo, hi - 1) // n)
        )
    coords = coords.where(pred)
    if "frame_bucket" in coords.columns:
        coords = coords.drop("frame_bucket")

    def opt(name: str) -> DataFrame | None:
        p = os.path.join(directory, f"{name}.parquet")
        if not os.path.exists(p):
            return None
        return spark.read.parquet(p).where(
            (F.col("frame_id") >= lo) & (F.col("frame_id") < hi)
        )

    t = load_tables(spark, directory)
    return Trajectory(coords, opt("frames"), opt("unitcell"), t.topology)


def from_wide_pandas(
    spark: SparkSession,
    xyz,
    time=None,
    unitcell_lengths=None,
    unitcell_angles=None,
    topology_rows=None,
) -> Trajectory:
    """Build a Trajectory from driver-side numpy arrays (tests,
    small data): xyz (n_frames, n_atoms, 3) float32 → long coords."""
    import numpy as np
    import pandas as pd

    xyz = np.asarray(xyz, dtype=np.float32)
    n_frames, n_atoms, _ = xyz.shape
    fi = np.repeat(np.arange(n_frames, dtype=np.int64), n_atoms)
    ai = np.tile(np.arange(n_atoms, dtype=np.int32), n_frames)
    coords_pdf = pd.DataFrame(
        {
            "frame_id": fi,
            "atom_id": ai,
            "x": xyz[..., 0].ravel(),
            "y": xyz[..., 1].ravel(),
            "z": xyz[..., 2].ravel(),
        }
    )
    coords = spark.createDataFrame(coords_pdf, schema=schemas.COORDS_SCHEMA)

    frames = None
    if time is not None:
        frames = spark.createDataFrame(
            pd.DataFrame(
                {
                    "frame_id": np.arange(n_frames, dtype=np.int64),
                    "time": np.asarray(time, dtype=np.float64),
                    "step": np.arange(n_frames, dtype=np.int64),
                }
            ),
            schema=schemas.FRAMES_SCHEMA,
        )

    unitcell = None
    if unitcell_lengths is not None and unitcell_angles is not None:
        ul = np.asarray(unitcell_lengths, dtype=np.float32).reshape(n_frames, 3)
        ua = np.asarray(unitcell_angles, dtype=np.float32).reshape(n_frames, 3)
        uc_pdf = pd.DataFrame(
            {
                "frame_id": np.arange(n_frames, dtype=np.int64),
                "a": ul[:, 0], "b": ul[:, 1], "c": ul[:, 2],
                "alpha": ua[:, 0], "beta": ua[:, 1], "gamma": ua[:, 2],
            }
        )
        from dask_traj_spark.operators.unitcell import with_box_vectors

        unitcell = with_box_vectors(
            spark.createDataFrame(
                uc_pdf,
                schema="frame_id long, a float, b float, c float, "
                "alpha float, beta float, gamma float",
            )
        )

    topology = None
    if topology_rows is not None:
        topology = spark.createDataFrame(topology_rows, schema=schemas.TOPOLOGY_SCHEMA)

    return Trajectory(coords, frames, unitcell, topology)


def partition_file_stats(coords_path: str) -> dict[int, int]:
    """Data files per ``frame_bucket=`` hive partition of a coords
    layout written by ``save_tables(bucket_frames=N)``. Driver-side
    listing only — the compaction trigger. (On object stores the
    same numbers come from the catalog/manifest listing.)"""
    import glob

    stats: dict[int, int] = {}
    for d in glob.glob(os.path.join(coords_path, "frame_bucket=*")):
        b = int(d.rsplit("=", 1)[1])
        stats[b] = len(glob.glob(os.path.join(d, "*.parquet")))
    return stats


def compact_frame_partitions(
    spark: SparkSession,
    coords_path: str,
    min_files: int = 2,
    target_files: int = 1,
) -> list[int]:
    """Partition-scoped OPTIMIZE for the frame-range hive layout:
    rewrite only the ``frame_bucket=`` directories whose file count
    reached ``min_files``, coalescing each to ``target_files``
    frame-sorted files. Untouched partitions keep their files —
    at 100 TB you compact the tail the last ingest wrote, never the
    whole table. Uses dynamic partition overwrite so the rewrite
    replaces exactly the partitions it read (atomic per partition on
    HDFS-like stores; on object stores pair with a manifest commit).

    Returns the list of compacted bucket ids."""
    stats = partition_file_stats(coords_path)
    todo = sorted(b for b, n in stats.items() if n >= min_files)
    if not todo:
        return []
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        frag = spark.read.parquet(coords_path).where(
            F.col("frame_bucket").isin([int(b) for b in todo])
        )
        (
            frag.repartition(max(1, target_files * len(todo)), "frame_bucket")
            .sortWithinPartitions("frame_id", "atom_id")
            .write.mode("overwrite")
            .partitionBy("frame_bucket")
            .parquet(coords_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return todo
