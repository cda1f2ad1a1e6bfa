"""Tinker ARC (.arc) trajectory source — text, multi-frame.

Public layout per frame: ``natoms [title]`` line; optionally one
box line (``a b c alpha beta gamma``); then one line per atom:
``serial name x y z type [bonded...]`` (Å, free format). Reference:
``file_returns['.arc'] = [xyz, unitcell_lengths, unitcell_angles]``
(core/dask_traj.py:27). Same chunked-DataSource shape as XYZ; the
box line is auto-detected (6 floats, first token non-integer-like
position — an atom line always starts with an integer serial AND
has a name token in position 2).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession

from dask_traj_spark.trajectory import Trajectory

ANGSTROM_TO_NM = 0.1


def _is_box_line(parts: list[bytes]) -> bool:
    """Box = exactly 6 floats; atom lines have a non-numeric name in
    field 2."""
    if len(parts) != 6:
        return False
    try:
        [float(p) for p in parts]
        return True
    except ValueError:
        return False


def index_arc(path: str):
    """→ [(frame_id, atoms_offset, n_atoms, box|None)] where box is
    (a,b,c,alpha,beta,gamma) in Å/deg."""
    frames = []
    with open(path, "rb") as f:
        fid = 0
        while True:
            head = f.readline()
            if not head.strip():
                break
            n = int(head.split()[0])
            pos = f.tell()
            nxt = f.readline()
            parts = nxt.split()
            if _is_box_line(parts):
                box = tuple(float(p) for p in parts)
                atoms_offset = f.tell()
            else:
                box = None
                atoms_offset = pos
                f.seek(pos)
            for _ in range(n):
                f.readline()
            frames.append((fid, atoms_offset, n, box))
            fid += 1
    return frames


def _decode_frame_arrays(path: str, specs):
    """specs: [(frame_id, atoms_offset, n)] → (frame_id, xyz f32 nm)."""
    with open(path, "rb") as f:
        for fid, offset, n in specs:
            f.seek(offset)
            rows = []
            for _ in range(n):
                parts = f.readline().split()
                if len(parts) < 5:
                    # short/truncated atom line: documented contract is
                    # ValueError, not IndexError out of a Spark task
                    raise ValueError(
                        f"malformed ARC atom line in frame {fid}"
                    )
                rows.append((parts[2], parts[3], parts[4]))
            xyz = (np.array(rows, dtype=np.float64) * ANGSTROM_TO_NM).astype(
                np.float32
            )
            yield fid, xyz


try:  # Spark >= 4.0 Python DataSource API
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _ArcPartition(InputPartition):
        def __init__(self, specs):
            self.specs = specs

    class ArcDataSourceReader(DataSourceReader):
        def __init__(self, schema, options):
            self.path = options.get("path")
            self.chunks = int(options.get("chunks", 10))

        def partitions(self):
            idx = [(fid, off, n) for fid, off, n, _b in index_arc(self.path)]
            return [
                _ArcPartition(idx[i : i + self.chunks])
                for i in range(0, len(idx), self.chunks)
            ]

        def read(self, partition):
            from dask_traj_spark.sources._arrow import frames_to_record_batches

            yield from frames_to_record_batches(
                _decode_frame_arrays(self.path, partition.specs)
            )

    class ArcDataSource(DataSource):
        """``spark.read.format("arctraj").option("chunks", N).load(p)``"""

        @classmethod
        def name(cls):
            return "arctraj"

        def schema(self):
            return "frame_id long, atom_id int, x float, y float, z float"

        def reader(self, schema):
            return ArcDataSourceReader(schema, self.options)

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    HAVE_DATASOURCE_API = False


_REGISTERED: set[int] = set()


def register(spark: SparkSession) -> None:
    if HAVE_DATASOURCE_API and id(spark) not in _REGISTERED:
        spark.dataSource.register(ArcDataSource)
        _REGISTERED.add(id(spark))


def load_arc(spark: SparkSession, path: str, chunks: int = 10) -> Trajectory:
    """Load a Tinker .arc trajectory (time = arange fallback, S8)."""
    idx = index_arc(path)
    if not idx:
        raise ValueError(f"empty ARC file: {path}")
    if HAVE_DATASOURCE_API:
        register(spark)
        coords = (
            spark.read.format("arctraj")
            .option("path", path)
            .option("chunks", str(chunks))
            .load()
        )
    else:  # pragma: no cover
        import pandas as pd

        rows = [
            (fid, aid, float(x), float(y), float(z))
            for fid, xyz in _decode_frame_arrays(
                path, [(f, o, n) for f, o, n, _b in idx]
            )
            for aid, (x, y, z) in enumerate(xyz)
        ]
        coords = spark.createDataFrame(
            pd.DataFrame(rows, columns=["frame_id", "atom_id", "x", "y", "z"]),
            schema="frame_id long, atom_id int, x float, y float, z float",
        )
    frames = spark.createDataFrame(
        [(fid, float(fid), fid) for fid, _o, _n, _b in idx],
        "frame_id long, time double, step long",
    )
    unitcell = None
    if any(b is not None for _f, _o, _n, b in idx):
        unitcell = spark.createDataFrame(
            [
                (
                    fid,
                    b[0] * ANGSTROM_TO_NM,
                    b[1] * ANGSTROM_TO_NM,
                    b[2] * ANGSTROM_TO_NM,
                    b[3],
                    b[4],
                    b[5],
                )
                for fid, _o, _n, b in idx
                if b is not None
            ],
            "frame_id long, a float, b float, c float, "
            "alpha float, beta float, gamma float",
        )
    return Trajectory(coords, frames=frames, unitcell=unitcell)
