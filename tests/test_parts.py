"""Distributed XTC/TRR parts sinks: write → merge → reload parity."""

from __future__ import annotations

import numpy as np
import pytest

import dask_traj_spark as dts
from dask_traj_spark.sources.loaders import from_wide_pandas
from dask_traj_spark.sources.parts import merge_parts, write_traj_parts


@pytest.fixture(scope="module")
def traj12(spark):
    rng = np.random.default_rng(31)
    xyz = rng.uniform(-1, 4, (12, 30, 3)).astype(np.float32)
    traj = from_wide_pandas(
        spark,
        xyz,
        time=np.arange(12) * 2.5,
        unitcell_lengths=np.full((12, 3), 5.0),
        unitcell_angles=np.tile([90.0, 90.0, 90.0], (12, 1)),
    )
    return traj, xyz


@pytest.mark.parametrize("fmt,atol", [("trr", 0.0), ("xtc", 6e-4)])
def test_parts_round_trip(spark, traj12, tmp_path, fmt, atol):
    traj, xyz = traj12
    d = str(tmp_path / f"{fmt}_parts")
    manifest = write_traj_parts(traj, d, fmt, frames_per_part=5)
    assert [m[0] for m in manifest] == [0, 1, 2]
    assert [m[2] for m in manifest] == [5, 5, 2]

    out = str(tmp_path / f"merged.{fmt}")
    merge_parts(d, out, fmt)
    back = dts.load(spark, out, chunks=4)
    assert back.n_frames == 12 and back.n_atoms == 30
    got, t = back.to_numpy()
    if atol == 0.0:
        np.testing.assert_array_equal(got, xyz)
    else:
        np.testing.assert_allclose(got, xyz, atol=atol)
    np.testing.assert_allclose(t, np.arange(12) * 2.5)


def test_unknown_format_raises(traj12, tmp_path):
    traj, _ = traj12
    with pytest.raises(ValueError, match="format"):
        write_traj_parts(traj, str(tmp_path / "x"), "dcdx")
