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

from pyspark.sql import DataFrame, SparkSession

from dask_traj_spark import schemas
from dask_traj_spark.trajectory import Trajectory

#: extension → loader kind; mirrors the reference's ``file_returns``
#: dispatch (core/dask_traj.py:26-56). Formats we can parse today
#: map to a loader; known-but-unimplemented raise.
SUPPORTED_EXTENSIONS = {
    ".parquet": "parquet_dir",
    "": "parquet_dir",  # a directory of tables
    ".xyz": "xyz",
}
KNOWN_UNIMPLEMENTED = {
    ".xtc", ".trr", ".dcd", ".binpos", ".nc", ".netcdf", ".h5", ".hdf5",
    ".lh5", ".pdb", ".pdb.gz", ".xml", ".mol2", ".hoomdxml", ".crd",
    ".mdcrd", ".inpcrd", ".restrt", ".rst7", ".ncrst", ".lammpstrj",
    ".gro", ".arc", ".hdf", ".xyz.gz", ".gsd", ".stk", ".dtr",
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
    ext = _extension(path)
    kind = SUPPORTED_EXTENSIONS.get(ext)
    if kind is None:
        if ext in KNOWN_UNIMPLEMENTED:
            raise NotImplementedError(
                f"Format {ext!r} is recognized but not implemented yet"
            )
        raise NotImplementedError(f"Unknown trajectory format {ext!r}")
    if kind == "parquet_dir":
        return load_tables(spark, path)
    if kind == "xyz":
        from dask_traj_spark.sources.xyz import load_xyz

        return load_xyz(spark, path, **options)
    raise AssertionError(kind)


def _extension(path: str) -> str:
    base = os.path.basename(path.rstrip("/"))
    if "." not in base:
        return ""
    return base[base.index(".") :].lower() if base.endswith(".pdb.gz") else os.path.splitext(base)[1].lower()


def load_tables(spark: SparkSession, directory: str) -> Trajectory:
    """Load the canonical Parquet table layout."""
    def opt(name: str) -> DataFrame | None:
        p = os.path.join(directory, f"{name}.parquet")
        return spark.read.parquet(p) if os.path.exists(p) else None

    coords = opt("coords")
    if coords is None:
        raise FileNotFoundError(f"{directory}/coords.parquet not found")
    return Trajectory(coords, opt("frames"), opt("unitcell"), opt("topology"))


def save_tables(traj: Trajectory, directory: str, mode: str = "overwrite") -> None:
    """Sink: write the trajectory back as Parquet tables (the
    reference has NO sinks at all — SURVEY.md S11; Spark gives us
    this for free). coords is repartitioned by frame ranges so a
    re-load scans align with frame locality."""
    traj.coords.repartitionByRange("frame_id", "atom_id").write.mode(mode).parquet(
        os.path.join(directory, "coords.parquet")
    )
    for name, df in (
        ("frames", traj._frames),
        ("unitcell", traj.unitcell),
        ("topology", traj.topology),
    ):
        if df is not None:
            df.write.mode(mode).parquet(os.path.join(directory, f"{name}.parquet"))


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

        unitcell = with_box_vectors(spark.createDataFrame(uc_pdf))

    topology = None
    if topology_rows is not None:
        topology = spark.createDataFrame(topology_rows, schema=schemas.TOPOLOGY_SCHEMA)

    return Trajectory(coords, frames, unitcell, topology)
