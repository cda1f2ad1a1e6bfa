"""MDTraj HDF5 (``.h5``/``.hdf5``) trajectory source — import-gated
on ``h5py``.

The MDTraj HDF5 layout (public spec, mdtraj.org "HDF5 trajectory
format"; ``file_returns['.h5'] = ['data']`` special case in the
reference, core/dask_traj.py:32-33) stores root datasets:

- ``coordinates``  float32 (n_frames, n_atoms, 3), nm
- ``time``         float32 (n_frames,), ps            [optional]
- ``cell_lengths`` float32 (n_frames, 3), nm          [optional]
- ``cell_angles``  float32 (n_frames, 3), degrees     [optional]
- ``topology``     1-element string dataset, JSON     [optional]

h5py is not installed in every environment (not in this one), so the
loader is gated: without h5py, :func:`load_hdf5` raises
``NotImplementedError`` naming the missing dependency. With h5py the
read path is the same chunked design as the binary sources: frame
chunks → partitions, per-partition h5py slice reads (HDF5 chunked
storage makes a frame-range slice an O(range) read, not O(file)).
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from dask_traj_spark.schemas import COORDS_SCHEMA
from dask_traj_spark.trajectory import Trajectory

try:  # pragma: no cover - h5py absent in the test container
    import h5py  # noqa: F401

    HAVE_H5PY = True
except ImportError:
    HAVE_H5PY = False


def _require_h5py() -> None:
    if not HAVE_H5PY:
        raise NotImplementedError(
            "Reading .h5/.hdf5 (MDTraj HDF5) trajectories requires the "
            "optional dependency h5py, which is not installed"
        )


def _topology_from_json(spark: SparkSession, topo_json: str):
    """MDTraj topology JSON (chains → residues → atoms) → the
    topology dimension table."""
    doc = json.loads(topo_json)
    rows = []
    for chain in doc.get("chains", []):
        for res in chain.get("residues", []):
            for atom in res.get("atoms", []):
                rows.append(
                    (
                        int(atom["index"]),
                        atom.get("name", ""),
                        atom.get("element", ""),
                        0.0,  # masses are not stored in the JSON
                        int(res.get("index", 0)),
                        res.get("name", ""),
                        int(chain.get("index", 0)),
                    )
                )
    return spark.createDataFrame(
        rows,
        "atom_id int, name string, element string, mass double, "
        "residue_id int, residue_name string, chain_id int",
    )


def load_hdf5(spark: SparkSession, path: str, chunks: int = 100) -> Trajectory:
    """Load an MDTraj HDF5 trajectory. Frame chunks parallelize via
    ``mapInPandas`` over a chunk-spec DataFrame (each task opens the
    file and slices its own frame range); h5py must be installed on
    the executors."""
    _require_h5py()
    import h5py

    with h5py.File(path, "r") as f:
        n_frames, n_atoms, _ = f["coordinates"].shape
        have_time = "time" in f
        have_cell = "cell_lengths" in f and "cell_angles" in f
        time = f["time"][:].tolist() if have_time else None
        cells = (
            (f["cell_lengths"][:].tolist(), f["cell_angles"][:].tolist())
            if have_cell
            else None
        )
        topo_json = None
        if "topology" in f:
            raw = f["topology"][0]
            topo_json = raw.decode() if isinstance(raw, bytes) else str(raw)

    specs = [
        (s, min(chunks, n_frames - s)) for s in range(0, n_frames, chunks)
    ]
    spec_df = spark.createDataFrame(specs, "start long, count long")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            with h5py.File(path, "r") as f:
                coords = f["coordinates"]
                for start, count in zip(pdf["start"], pdf["count"]):
                    xyz = coords[int(start) : int(start + count)]
                    nf, na, _ = xyz.shape
                    flat = xyz.reshape(nf * na, 3)
                    import numpy as np

                    yield pd.DataFrame(
                        {
                            "frame_id": np.repeat(
                                np.arange(start, start + nf, dtype="int64"), na
                            ),
                            "atom_id": np.tile(np.arange(na, dtype="int32"), nf),
                            "x": flat[:, 0],
                            "y": flat[:, 1],
                            "z": flat[:, 2],
                        }
                    )

    coords = spec_df.repartition(max(1, len(specs))).mapInPandas(
        gen, schema=COORDS_SCHEMA
    )
    frames = spark.createDataFrame(
        [
            (i, float(time[i]) if time else float(i), i)
            for i in range(n_frames)
        ],
        "frame_id long, time double, step long",
    )
    unitcell = None
    if cells:
        lengths, angles = cells
        unitcell = spark.createDataFrame(
            [
                (i, *map(float, lengths[i]), *map(float, angles[i]))
                for i in range(n_frames)
            ],
            "frame_id long, a float, b float, c float, "
            "alpha float, beta float, gamma float",
        )
    topology = _topology_from_json(spark, topo_json) if topo_json else None
    return Trajectory(coords, frames=frames, unitcell=unitcell, topology=topology)


def load_lh5(spark: SparkSession, path: str, chunks: int = 100) -> Trajectory:
    """Load a legacy MSMBuilder2 "lossy HDF5" (``.lh5``) trajectory
    (``file_returns['.lh5'] = ['xyz']``, core/dask_traj.py:40).

    Public layout (MDTraj's LH5 format doc): one root dataset
    ``XYZList`` of int16 with shape (n_frames, n_atoms, 3); physical
    coordinates in nm are the stored fixed-point values divided by
    1000. No time, no unit cell. Same chunked h5py read shape as
    :func:`load_hdf5`; gated on h5py identically."""
    _require_h5py()
    import h5py

    with h5py.File(path, "r") as f:
        n_frames, n_atoms, _ = f["XYZList"].shape

    specs = [
        (s, min(chunks, n_frames - s)) for s in range(0, n_frames, chunks)
    ]
    spec_df = spark.createDataFrame(specs, "start long, count long")

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            with h5py.File(path, "r") as f:
                ds = f["XYZList"]
                for start, count in zip(pdf["start"], pdf["count"]):
                    raw = ds[int(start) : int(start + count)]
                    xyz = raw.astype("float32") / np.float32(1000.0)
                    nf, na, _ = xyz.shape
                    flat = xyz.reshape(nf * na, 3)
                    yield pd.DataFrame(
                        {
                            "frame_id": np.repeat(
                                np.arange(start, start + nf, dtype="int64"), na
                            ),
                            "atom_id": np.tile(np.arange(na, dtype="int32"), nf),
                            "x": flat[:, 0],
                            "y": flat[:, 1],
                            "z": flat[:, 2],
                        }
                    )

    coords = spec_df.repartition(max(1, len(specs))).mapInPandas(
        gen, schema=COORDS_SCHEMA
    )
    return Trajectory(coords)
