"""DCD (CHARMM/NAMD) binary trajectory source + sink.

A real binary trajectory format, implemented from the public CHARMM
/X-PLOR container description (Fortran-record framing: every block
is wrapped in 4-byte little-endian length prefix/suffix):

- header record: ``'CORD'`` + 20 int32 control words (icntrl):
  [0]=n_frames, [1]=first step, [2]=step interval, [10]=unit-cell
  flag, [19]=CHARMM version tag;
- title record: int32 count + 80-byte title lines;
- natoms record: one int32;
- per frame: optional unit-cell record (6 float64 — the XTLA layout
  ``[a, cos γ, b, cos β, cos α, c]``), then three float32 records
  (all x, all y, all z) in Å.

Fixed frame stride ⇒ byte offsets are computable from the header
alone, so ``partitions()`` needs NO file scan (unlike text XYZ): one
``InputPartition`` per frame-chunk with a seek offset — the
reference's chunked lazy load (core/dask_traj.py:103-140,329-361)
expressed as a Spark 4 Python DataSource. Coordinates are converted
Å → nm on read (G11).

The writer is driver-side (collect → file): correct for the
small/medium trajectories a format export is for; a distributed
writer would stream fixed-stride frame blocks per partition.
"""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import SparkSession

from dask_traj_spark.trajectory import Trajectory

ANGSTROM_TO_NM = 0.1
_HDR = struct.Struct("<i4s20i i")  # reclen, 'CORD', icntrl, reclen


class DCDInfo:
    def __init__(self, n_frames, n_atoms, has_cell, data_offset, frame_size):
        self.n_frames = n_frames
        self.n_atoms = n_atoms
        self.has_cell = has_cell
        self.data_offset = data_offset
        self.frame_size = frame_size


def read_info(path: str) -> DCDInfo:
    with open(path, "rb") as f:
        rl = struct.unpack("<i", f.read(4))[0]
        if rl != 84:
            raise ValueError(f"not a DCD file (header record {rl} != 84)")
        magic = f.read(4)
        if magic != b"CORD":
            raise ValueError(f"not a DCD file (magic {magic!r})")
        icntrl = struct.unpack("<20i", f.read(80))
        f.read(4)  # trailing reclen
        n_frames = icntrl[0]
        has_cell = icntrl[10] == 1
        # title record
        trl = struct.unpack("<i", f.read(4))[0]
        f.seek(trl, 1)
        f.read(4)
        # natoms record
        f.read(4)
        n_atoms = struct.unpack("<i", f.read(4))[0]
        f.read(4)
        data_offset = f.tell()
        coord_block = 4 + 4 * n_atoms + 4
        cell_block = (4 + 48 + 4) if has_cell else 0
        frame_size = cell_block + 3 * coord_block
        return DCDInfo(n_frames, n_atoms, has_cell, data_offset, frame_size)


def _read_frames(path: str, info: DCDInfo, start: int, count: int):
    """Yield (frame_id, xyz_nm (n_atoms, 3) float32) for frames
    [start, start+count)."""
    with open(path, "rb") as f:
        f.seek(info.data_offset + start * info.frame_size)
        for fid in range(start, min(start + count, info.n_frames)):
            if info.has_cell:
                f.seek(4 + 48 + 4, 1)
            cols = []
            for _ in range(3):
                f.seek(4, 1)
                cols.append(np.frombuffer(f.read(4 * info.n_atoms), dtype="<f4"))
                f.seek(4, 1)
            xyz = np.stack(cols, axis=-1) * np.float32(ANGSTROM_TO_NM)
            yield fid, xyz


def read_cells(path: str) -> list[tuple[int, float, float, float, float, float, float]]:
    """(frame_id, a, b, c, alpha, beta, gamma) per frame, lengths nm.
    XTLA layout stores cosines of the angles."""
    info = read_info(path)
    if not info.has_cell:
        return []
    out = []
    with open(path, "rb") as f:
        for fid in range(info.n_frames):
            f.seek(info.data_offset + fid * info.frame_size + 4)
            a, cg, b, cb, ca, c = struct.unpack("<6d", f.read(48))
            deg = lambda x: math.degrees(math.acos(max(-1.0, min(1.0, x))))  # noqa: E731
            out.append(
                (
                    fid,
                    a * ANGSTROM_TO_NM,
                    b * ANGSTROM_TO_NM,
                    c * ANGSTROM_TO_NM,
                    deg(ca),
                    deg(cb),
                    deg(cg),
                )
            )
    return out


def write_dcd(
    traj: Trajectory, path: str, step_interval: int = 1
) -> None:
    """Sink: driver-side DCD export (nm → Å). Writes the unit-cell
    records when the trajectory has one."""
    xyz, _time = traj.to_numpy()
    n_frames, n_atoms, _ = xyz.shape
    cells = None
    if traj.have_unitcell:
        uc = traj.unitcell_lengths_angles.orderBy("frame_id").toPandas()
        cells = uc[["a", "b", "c", "alpha", "beta", "gamma"]].to_numpy()

    with open(path, "wb") as f:
        icntrl = [0] * 20
        icntrl[0] = n_frames
        icntrl[1] = 0
        icntrl[2] = step_interval
        icntrl[10] = 1 if cells is not None else 0
        icntrl[19] = 24  # CHARMM version tag
        f.write(struct.pack("<i", 84))
        f.write(b"CORD")
        f.write(struct.pack("<20i", *icntrl))
        f.write(struct.pack("<i", 84))
        title = b"Written by dask_traj_spark".ljust(80)[:80]
        f.write(struct.pack("<i", 84 + 0))  # 4 + 80
        f.write(struct.pack("<i", 1))
        f.write(title)
        f.write(struct.pack("<i", 84))
        f.write(struct.pack("<i", 4))
        f.write(struct.pack("<i", n_atoms))
        f.write(struct.pack("<i", 4))
        ang = xyz.astype(np.float64) / ANGSTROM_TO_NM
        for fid in range(n_frames):
            if cells is not None:
                a, b, c, al, be, ga = cells[fid]
                rec = struct.pack(
                    "<6d",
                    a / ANGSTROM_TO_NM,
                    math.cos(math.radians(ga)),
                    b / ANGSTROM_TO_NM,
                    math.cos(math.radians(be)),
                    math.cos(math.radians(al)),
                    c / ANGSTROM_TO_NM,
                )
                f.write(struct.pack("<i", 48) + rec + struct.pack("<i", 48))
            for d in range(3):
                col = ang[fid, :, d].astype("<f4").tobytes()
                f.write(struct.pack("<i", 4 * n_atoms))
                f.write(col)
                f.write(struct.pack("<i", 4 * n_atoms))


try:  # Spark >= 4.0 Python DataSource API
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _DCDPartition(InputPartition):
        def __init__(self, start, count):
            self.start = start
            self.count = count

    class DCDDataSourceReader(DataSourceReader):
        def __init__(self, schema, options):
            self.path = options.get("path")
            self.chunks = int(options.get("chunks", 100))
            self.info = read_info(self.path)

        def partitions(self):
            # header-only planning: offsets are arithmetic, no scan
            return [
                _DCDPartition(s, self.chunks)
                for s in range(0, self.info.n_frames, self.chunks)
            ]

        def read(self, partition):
            from dask_traj_spark.sources._arrow import frames_to_record_batches

            yield from frames_to_record_batches(
                _read_frames(self.path, self.info, partition.start, partition.count)
            )

    class DCDDataSource(DataSource):
        """``spark.read.format("dcdtraj").option("chunks", N).load(p)``"""

        @classmethod
        def name(cls):
            return "dcdtraj"

        def schema(self):
            return "frame_id long, atom_id int, x float, y float, z float"

        def reader(self, schema):
            return DCDDataSourceReader(schema, self.options)

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older pyspark
    HAVE_DATASOURCE_API = False


_REGISTERED: set[int] = set()


def register(spark: SparkSession) -> None:
    if HAVE_DATASOURCE_API and id(spark) not in _REGISTERED:
        spark.dataSource.register(DCDDataSource)
        _REGISTERED.add(id(spark))


def load_dcd(spark: SparkSession, path: str, chunks: int = 100) -> Trajectory:
    """Load a .dcd binary trajectory (lazy chunked scan). Unit-cell
    records (tiny: 48 bytes/frame) are indexed driver-side into the
    per-frame unitcell dimension."""
    info = read_info(path)
    if HAVE_DATASOURCE_API:
        register(spark)
        coords = (
            spark.read.format("dcdtraj")
            .option("path", path)
            .option("chunks", str(chunks))
            .load()
        )
    else:  # fallback: driver-side decode (small files only)
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
    unitcell = None
    cells = read_cells(path)
    if cells:
        unitcell = spark.createDataFrame(
            cells,
            "frame_id long, a float, b float, c float, "
            "alpha float, beta float, gamma float",
        )
    return Trajectory(coords, unitcell=unitcell)
