"""BINPOS (AMBER/Scripps) trajectory source + sink.

Public layout: 4-byte magic ``fxyz`` then, per frame, int32 natoms
followed by 3·natoms float32 coordinates (Å, little-endian). Fixed
frame stride ⇒ header-free chunked partition planning like DCD.
Reference: ``file_returns['.binpos'] = ['xyz']``
(core/dask_traj.py:29). Å → nm on read (G11).
"""

from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import SparkSession

from dask_traj_spark.trajectory import Trajectory

MAGIC = b"fxyz"
ANGSTROM_TO_NM = 0.1


class BinposInfo:
    def __init__(self, n_frames: int, n_atoms: int):
        self.n_frames = n_frames
        self.n_atoms = n_atoms
        self.frame_size = 4 + 12 * n_atoms


def read_info(path: str) -> BinposInfo:
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"not a BINPOS file: {path}")
        n_atoms = struct.unpack("<i", f.read(4))[0]
    frame_size = 4 + 12 * n_atoms
    return BinposInfo((size - 4) // frame_size, n_atoms)


def _read_frames(path: str, info: BinposInfo, start: int, count: int):
    with open(path, "rb") as f:
        f.seek(4 + start * info.frame_size)
        for fid in range(start, min(start + count, info.n_frames)):
            n = struct.unpack("<i", f.read(4))[0]
            if n != info.n_atoms:
                raise ValueError(f"frame {fid}: natoms {n} != {info.n_atoms}")
            xyz = np.frombuffer(f.read(12 * n), dtype="<f4").reshape(n, 3)
            yield fid, (xyz.astype(np.float64) * ANGSTROM_TO_NM).astype(np.float32)


def write_binpos(traj: Trajectory, path: str) -> None:
    """Sink: driver-side BINPOS export (nm → Å)."""
    xyz, _time = traj.to_numpy()
    n_frames, n_atoms, _ = xyz.shape
    ang = (xyz.astype(np.float64) / ANGSTROM_TO_NM).astype("<f4")
    with open(path, "wb") as f:
        f.write(MAGIC)
        for fid in range(n_frames):
            f.write(struct.pack("<i", n_atoms))
            f.write(ang[fid].tobytes())


try:  # Spark >= 4.0 Python DataSource API
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _BinposPartition(InputPartition):
        def __init__(self, start, count):
            self.start = start
            self.count = count

    class BinposDataSourceReader(DataSourceReader):
        def __init__(self, schema, options):
            self.path = options.get("path")
            self.chunks = int(options.get("chunks", 100))
            self.info = read_info(self.path)

        def partitions(self):
            return [
                _BinposPartition(s, self.chunks)
                for s in range(0, self.info.n_frames, self.chunks)
            ]

        def read(self, partition):
            from dask_traj_spark.sources._arrow import frames_to_record_batches

            yield from frames_to_record_batches(
                _read_frames(self.path, self.info, partition.start, partition.count)
            )

    class BinposDataSource(DataSource):
        """``spark.read.format("binpostraj").option("chunks", N).load(p)``"""

        @classmethod
        def name(cls):
            return "binpostraj"

        def schema(self):
            return "frame_id long, atom_id int, x float, y float, z float"

        def reader(self, schema):
            return BinposDataSourceReader(schema, self.options)

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    HAVE_DATASOURCE_API = False


_REGISTERED: set[int] = set()


def register(spark: SparkSession) -> None:
    if HAVE_DATASOURCE_API and id(spark) not in _REGISTERED:
        spark.dataSource.register(BinposDataSource)
        _REGISTERED.add(id(spark))


def load_binpos(spark: SparkSession, path: str, chunks: int = 100) -> Trajectory:
    """Load a .binpos trajectory (xyz only — no time/box in the
    format; time falls back to arange, reference S8)."""
    info = read_info(path)
    if HAVE_DATASOURCE_API:
        register(spark)
        coords = (
            spark.read.format("binpostraj")
            .option("path", path)
            .option("chunks", str(chunks))
            .load()
        )
    else:  # pragma: no cover
        import pandas as pd

        rows = [
            (fid, aid, float(x), float(y), float(z))
            for fid, xyz in _read_frames(path, info, 0, info.n_frames)
            for aid, (x, y, z) in enumerate(xyz)
        ]
        coords = spark.createDataFrame(
            pd.DataFrame(rows, columns=["frame_id", "atom_id", "x", "y", "z"]),
            schema="frame_id long, atom_id int, x float, y float, z float",
        )
    frames = spark.createDataFrame(
        [(fid, float(fid), fid) for fid in range(info.n_frames)],
        "frame_id long, time double, step long",
    )
    return Trajectory(coords, frames=frames, unitcell=None)
