"""Angles (G3/G4) — SQL and vectorized forms.

Semantics per the reference's pure-array path
(``/root/reference/dask_traj/geometry/angle.py:142-176``): for each
triplet (i, j, k), u = MIC(r_i − r_j), v = MIC(r_k − r_j), angle =
arccos(û · v̂). Returned in radians, float32, as
(frame_id, triplet_id, angle_rad).

SQL form: three broadcast-pair joins stitched per frame + a codegen'd
acos expression. Vectorized form: the numpy kernel over packed
frame blocks (see distance.py's vectorized-forms section) — zero
shuffles when the trajectory is already frame-packed.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
from pyspark.sql import DataFrame, functions as F

from dask_traj_spark import schemas
from dask_traj_spark.operators import kernels
from dask_traj_spark.operators.distance import (
    _VECTORIZED_THRESHOLD,
    _add_displacement,
    _block_arrays,
    _iter_frame_blocks,
    _normalize_indices,
    _packed_input,
    _pairs_df,
)


def _leg_sql(
    traj,
    pairs_df: DataFrame,
    use_box: bool,
    out: tuple[str, str, str],
    ids_a=None,
    ids_b=None,
) -> DataFrame:
    """Displacement r_b − r_a for a (triplet_id, a, b) table."""
    from dask_traj_spark.operators.distance import _pair_coords_sql

    df = _pair_coords_sql(
        traj, pairs_df, "a", "b", "triplet_id", ids_a=ids_a, ids_b=ids_b
    )
    df = _add_displacement(traj, df, use_box)
    return df.select(
        "frame_id",
        "triplet_id",
        F.col("_dx").alias(out[0]),
        F.col("_dy").alias(out[1]),
        F.col("_dz").alias(out[2]),
    )


def compute_angles(
    traj,
    angle_indices: Iterable,
    periodic: bool = True,
    form: str = "auto",
    n_atoms: int | None = None,
) -> DataFrame:
    """Angle at the middle atom of each (i, j, k) triplet.

    Reference driver: geometry/angle.py:58-139.
    """
    arr = _normalize_indices(angle_indices, 3, n_atoms or traj.n_atoms, "angle_indices")
    if len(arr) == 0:  # empty short-circuit (angle.py:98-99)
        return traj.spark.createDataFrame([], schemas.ANGLES_SCHEMA)
    if form == "auto":
        form = "vectorized" if len(arr) >= _VECTORIZED_THRESHOLD else "sql"
    if form == "vectorized":
        return _vectorized_angles(traj, arr, periodic)

    use_box = periodic and traj.have_unitcell
    spark = traj.spark
    # u-leg: (j -> i), v-leg: (j -> k)
    u_pairs = _pairs_df(spark, np.stack([arr[:, 1], arr[:, 0]], axis=1), ["triplet_id", "a", "b"])
    v_pairs = _pairs_df(spark, np.stack([arr[:, 1], arr[:, 2]], axis=1), ["triplet_id", "a", "b"])
    u = _leg_sql(
        traj, u_pairs, use_box, ("ux", "uy", "uz"),
        ids_a=arr[:, 1], ids_b=arr[:, 0],
    )
    v = _leg_sql(
        traj, v_pairs, use_box, ("vx", "vy", "vz"),
        ids_a=arr[:, 1], ids_b=arr[:, 2],
    )
    j = u.join(v, ["frame_id", "triplet_id"])
    # x*x, not pow(x,2): multiplication is IEEE exact-rounded, pow is
    # not guaranteed — matters for bit-reproducibility vs the oracle
    sq = lambda c: F.col(c) * F.col(c)  # noqa: E731
    un = F.sqrt(sq("ux") + sq("uy") + sq("uz"))
    vn = F.sqrt(sq("vx") + sq("vy") + sq("vz"))
    dot = F.col("ux") * F.col("vx") + F.col("uy") * F.col("vy") + F.col("uz") * F.col("vz")
    cosang = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), dot / (un * vn)))
    return j.select(
        "frame_id",
        "triplet_id",
        F.acos(cosang).cast("float").alias("angle_rad"),
    )


def _vectorized_angles(traj, arr: np.ndarray, periodic: bool) -> DataFrame:
    import pandas as pd

    sel = np.unique(arr)
    packed, lookup = _packed_input(traj, periodic, atoms=sel)
    sc = traj.spark.sparkContext
    b = sc.broadcast(np.searchsorted(sel, arr).astype(np.int32))
    b_lookup = sc.broadcast(lookup)
    n_trip = len(arr)

    def gen(batches):
        t = b.value
        ti, tj, tk = t[:, 0], t[:, 1], t[:, 2]
        for block in _iter_frame_blocks(batches):
            fids, xyz, box, ortho = _block_arrays(block, b_lookup.value)
            ang = kernels.angles_np(xyz, ti, tj, tk, box, ortho)
            yield pd.DataFrame(
                {
                    "frame_id": np.repeat(fids, n_trip),
                    "triplet_id": np.tile(np.arange(n_trip, dtype=np.int32), len(fids)),
                    "angle_rad": ang.ravel(),
                }
            )

    return packed.mapInPandas(gen, schema=schemas.ANGLES_SCHEMA)
