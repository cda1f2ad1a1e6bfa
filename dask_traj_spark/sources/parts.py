"""Distributed sinks for the self-framed formats (XTC, TRR).

Every partition serializes its contiguous frame range to a
standalone part file (``part-00000.xtc``, ...). Because XTC and TRR
carry a full header per frame, a part directory concatenates into a
single valid file by plain byte append (``merge_parts``) — no
header patching, unlike DCD (see ``dcd.write_dcd_parts`` /
``merge_dcd_parts`` for the single-global-header case).

Scale shape: one writer task per frame-range group (applyInPandas),
per-frame time/box metadata broadcast (it is ~n_frames × 12 floats —
tiny even at 10^8 frames), nothing materializes on the driver.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from dask_traj_spark.trajectory import Trajectory

_SERIALIZERS = {}


def _get_serializer(fmt: str):
    if not _SERIALIZERS:
        from dask_traj_spark.sources.trr import _write_trr_file
        from dask_traj_spark.sources.xtc import _write_xtc_file

        _SERIALIZERS["xtc"] = _write_xtc_file
        _SERIALIZERS["trr"] = _write_trr_file
    try:
        return _SERIALIZERS[fmt]
    except KeyError:
        raise ValueError(
            f"format {fmt!r}: expected one of {sorted(_SERIALIZERS)} "
            "(DCD parts: sources.dcd.write_dcd_parts)"
        ) from None


def write_traj_parts(
    traj: Trajectory,
    directory: str,
    fmt: str,
    frames_per_part: int = 100,
) -> list[tuple[int, str, int]]:
    """Distributed export: part files of ``frames_per_part`` frames
    each, written by executors. Returns the frame-ordered manifest
    [(part_no, path, n_frames)]."""
    import pandas as pd

    serialize = _get_serializer(fmt)
    os.makedirs(directory, exist_ok=True)

    time_pdf = traj.frames.orderBy("frame_id").select("frame_id", "time").toPandas()
    time_arr = time_pdf["time"].to_numpy(dtype=np.float64)
    boxes = None
    if traj.have_unitcell:
        uc = traj.unitcell_vectors.orderBy("frame_id").toPandas()
        boxes = uc[["ax", "ay", "az", "bx", "by", "bz", "cx", "cy", "cz"]].to_numpy(
            dtype=np.float64
        ).reshape(-1, 3, 3)
    spark = traj.coords.sparkSession
    b_meta = spark.sparkContext.broadcast((time_arr, boxes))

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
        xyz = (
            pdf[["x", "y", "z"]].to_numpy(np.float32).reshape(nf, na, 3)
        )
        t_all, b_all = b_meta.value
        lo, hi = int(frame_ids.min()), int(frame_ids.max()) + 1
        p = os.path.join(directory, f"part-{part:05d}.{fmt}")
        serialize(
            p,
            xyz,
            t_all[lo:hi] if t_all is not None and len(t_all) >= hi else None,
            b_all[lo:hi] if b_all is not None else None,
            step_offset=lo,
        )
        return pd.DataFrame(
            [(int(part), p, nf)], columns=["part_no", "path", "n_frames"]
        )

    manifest = (
        coords.groupBy("part_no")
        .applyInPandas(write_part, "part_no int, path string, n_frames long")
        .collect()
    )
    return sorted((r["part_no"], r["path"], r["n_frames"]) for r in manifest)


def merge_parts(directory: str, out_path: str, fmt: str) -> None:
    """Byte-concatenate a part directory into one file (valid for
    the per-frame-header formats this module writes)."""
    import glob

    parts = sorted(glob.glob(os.path.join(directory, f"part-*.{fmt}")))
    if not parts:
        raise ValueError(f"no part-*.{fmt} files in {directory}")
    with open(out_path, "wb") as out:
        for p in parts:
            with open(p, "rb") as f:
                out.write(f.read())
