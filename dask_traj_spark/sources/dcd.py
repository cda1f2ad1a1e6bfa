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

Two writers: ``write_dcd`` (driver-side collect → one file, for
small exports) and ``write_dcd_parts`` (distributed — every
partition writes a standalone part file for its frame range;
``merge_dcd_parts`` stitches them into a single file when needed).
"""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import SparkSession, functions as F

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


def _must_read(f, n: int, what: str) -> bytes:
    b = f.read(n)
    if len(b) < n:
        # the documented corrupt-file contract is ValueError, never a
        # raw struct.error out of a Spark task
        raise ValueError(f"truncated DCD file (short {what})")
    return b


def read_info(path: str) -> DCDInfo:
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        rl = struct.unpack("<i", _must_read(f, 4, "header record length"))[0]
        if rl != 84:
            raise ValueError(f"not a DCD file (header record {rl} != 84)")
        magic = f.read(4)
        if magic != b"CORD":
            raise ValueError(f"not a DCD file (magic {magic!r})")
        icntrl = struct.unpack("<20i", _must_read(f, 80, "icntrl block"))
        f.read(4)  # trailing reclen
        hdr_frames = icntrl[0]
        has_cell = icntrl[10] == 1
        # title record
        trl = struct.unpack("<i", _must_read(f, 4, "title record length"))[0]
        if trl < 0 or trl > size:
            raise ValueError(f"corrupt DCD title record length {trl}")
        f.seek(trl, 1)
        f.read(4)
        # natoms record
        f.read(4)
        n_atoms = struct.unpack("<i", _must_read(f, 4, "atom count"))[0]
        if n_atoms <= 0:
            raise ValueError(f"corrupt DCD atom count {n_atoms}")
        f.read(4)
        data_offset = f.tell()
        coord_block = 4 + 4 * n_atoms + 4
        cell_block = (4 + 48 + 4) if has_cell else 0
        frame_size = cell_block + 3 * coord_block
        # bound the frame count by what the file can actually hold:
        # simulations killed mid-write leave a stale header count
        # (reading by file size is the ecosystem convention), and a
        # CORRUPT header claiming 2^31 frames would otherwise turn
        # any full-file read into a multi-hour empty-read spin
        avail = max(0, (size - data_offset) // frame_size)
        n_frames = avail if hdr_frames <= 0 else min(hdr_frames, avail)
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
                raw = _must_read(f, 4 * info.n_atoms, "coordinate block")
                cols.append(np.frombuffer(raw, dtype="<f4"))
                f.seek(4, 1)
            xyz = np.stack(cols, axis=-1) * np.float32(ANGSTROM_TO_NM)
            yield fid, xyz


def read_cells(path: str) -> list[tuple[int, float, float, float, float, float, float]]:
    """(frame_id, a, b, c, alpha, beta, gamma) per frame, lengths nm.

    The XTLA layout ``[a, X γ, b, X β, X α, c]`` stores the angle
    slots either as cosines (CHARMM ≥ c22 XTLA convention) or as
    plain degrees (many NAMD / older CHARMM writers). Sniff per
    frame, the same heuristic the MD tool ecosystem settled on: all
    three values in [-1, 1] → cosines, else degrees. (A real cell
    angle below ~57.3° = 1 rad is chemically implausible, so the
    ranges don't collide in practice; a stored 90.0 interpreted as a
    cosine would clamp to cos=1 → 0° and silently corrupt every MIC
    distance downstream.)"""
    info = read_info(path)
    if not info.has_cell:
        return []
    out = []
    with open(path, "rb") as f:
        for fid in range(info.n_frames):
            f.seek(info.data_offset + fid * info.frame_size + 4)
            a, g_, b, b_, a_, c = struct.unpack("<6d", _must_read(f, 48, "cell record"))
            if all(abs(v) <= 1.0 for v in (g_, b_, a_)):
                conv = lambda x: math.degrees(  # noqa: E731
                    math.acos(max(-1.0, min(1.0, x)))
                )
            else:
                conv = lambda x: float(x)  # noqa: E731  (already degrees)
            out.append(
                (
                    fid,
                    a * ANGSTROM_TO_NM,
                    b * ANGSTROM_TO_NM,
                    c * ANGSTROM_TO_NM,
                    conv(a_),
                    conv(b_),
                    conv(g_),
                )
            )
    return out


def _write_dcd_file(
    path: str,
    xyz: "np.ndarray",
    cells: "np.ndarray | None",
    step_interval: int = 1,
) -> None:
    """Serialize one standalone DCD file: xyz (n_frames, n_atoms, 3)
    in nm, cells (n_frames, 6) lengths nm / angles deg or None."""
    n_frames, n_atoms, _ = xyz.shape
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


def write_dcd(
    traj: Trajectory, path: str, step_interval: int = 1
) -> None:
    """Sink: driver-side DCD export (nm → Å). Writes the unit-cell
    records when the trajectory has one."""
    xyz, _time = traj.to_numpy()
    cells = None
    if traj.have_unitcell:
        uc = traj.unitcell_lengths_angles.orderBy("frame_id").toPandas()
        cells = uc[["a", "b", "c", "alpha", "beta", "gamma"]].to_numpy()
    _write_dcd_file(path, xyz, cells, step_interval)


def write_dcd_parts(
    traj: Trajectory, directory: str, frames_per_part: int = 100
) -> list[tuple[int, str, int]]:
    """Distributed sink: executors write standalone ``.dcd`` part
    files (``part-00000.dcd``, ...) covering contiguous frame
    ranges — the sink analog of the chunked sources, and the only
    shape that scales (one writer per partition, no driver
    materialization; the directory-of-parts is to DCD what a parquet
    directory is to parquet). Paths assume a filesystem all
    executors can reach (true in local mode and on any cluster with
    shared storage). Returns the manifest [(part_no, path,
    n_frames)] in frame order; ``merge_dcd_parts`` stitches a
    single-file DCD from it when one is required."""
    import os

    import pandas as pd

    os.makedirs(directory, exist_ok=True)
    cells = None
    cell_fids = None
    if traj.have_unitcell:
        uc = traj.unitcell_lengths_angles.orderBy("frame_id").toPandas()
        cell_fids = uc["frame_id"].to_numpy(np.int64)
        cells = uc[["a", "b", "c", "alpha", "beta", "gamma"]].to_numpy()
    spark = traj.coords.sparkSession
    b_cells = spark.sparkContext.broadcast((cell_fids, cells))

    fpp = int(frames_per_part)
    coords = traj.coords.withColumn(
        "part_no", F.expr(f"frame_id div {fpp}").cast("int")
    )

    def write_part(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        (part,) = key
        pdf = pdf.sort_values(["frame_id", "atom_id"])
        frame_ids = pdf["frame_id"].unique()
        nf = len(frame_ids)
        na = len(pdf) // nf
        xyz = pdf[["x", "y", "z"]].to_numpy(np.float64).reshape(nf, na, 3)
        # gather cells BY frame_id, not positionally — a sliced or
        # renumbered trajectory's frame ids are neither dense nor
        # zero-based, so cells_all[min:max+1] would misalign.
        fids_all, cells_all = b_cells.value
        cells_part = None
        if cells_all is not None:
            idx = np.searchsorted(fids_all, frame_ids)
            bad = (idx >= len(fids_all)) | (
                np.take(fids_all, np.minimum(idx, len(fids_all) - 1)) != frame_ids
            )
            if bad.any():
                raise ValueError(
                    f"part {part}: no unitcell row for frame ids "
                    f"{frame_ids[bad][:5].tolist()}"
                )
            cells_part = cells_all[idx]
        p = os.path.join(directory, f"part-{part:05d}.dcd")
        _write_dcd_file(p, xyz, cells_part)
        return pd.DataFrame([(int(part), p, nf)], columns=["part_no", "path", "n_frames"])

    manifest = (
        coords.groupBy("part_no")
        .applyInPandas(write_part, "part_no int, path string, n_frames long")
        .collect()
    )
    return sorted((r["part_no"], r["path"], r["n_frames"]) for r in manifest)


def merge_dcd_parts(directory: str, out_path: str) -> None:
    """Driver-side stitch: concatenate the frame payloads of a
    part directory under one header (parts are standalone DCDs with
    identical n_atoms/cell flags; payload records are fixed-stride,
    so this is a byte copy)."""
    import glob

    parts = sorted(glob.glob(f"{directory}/part-*.dcd"))
    if not parts:
        raise ValueError(f"no part-*.dcd files in {directory}")
    infos = [read_info(p) for p in parts]
    n_atoms = infos[0].n_atoms
    has_cell = infos[0].has_cell
    for p, i in zip(parts, infos):
        if i.n_atoms != n_atoms or i.has_cell != has_cell:
            raise ValueError(f"part {p} layout mismatch")
    total = sum(i.n_frames for i in infos)
    with open(out_path, "wb") as out:
        with open(parts[0], "rb") as f:
            header = f.read(infos[0].data_offset)
        # patch the frame count in icntrl[0] (offset 8 in the file)
        header = header[:8] + struct.pack("<i", total) + header[12:]
        out.write(header)
        for p, i in zip(parts, infos):
            with open(p, "rb") as f:
                f.seek(i.data_offset)
                out.write(f.read())


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
