"""Differential tests for G3/G4 (angles) against the numpy golden."""

from __future__ import annotations

import numpy as np
import pytest

from dask_traj_spark.operators.angle import compute_angles
from tests import golden

ATOL = 1e-4  # arccos amplifies float32 error near 0/pi


def _collect(df):
    pdf = df.toPandas().sort_values(["frame_id", "triplet_id"])
    n_frames = pdf["frame_id"].nunique()
    return pdf["angle_rad"].to_numpy().reshape(n_frames, -1)


@pytest.mark.parametrize("form", ["sql", "vectorized"])
class TestAngles:
    def test_nonperiodic(self, traj_nocell, xyz_small, triplets120, form):
        got = _collect(compute_angles(traj_nocell, triplets120, periodic=False, form=form))
        want = golden.angles(xyz_small, triplets120)
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_ortho(self, traj_ortho, xyz_small, triplets120, box_ortho, form):
        got = _collect(compute_angles(traj_ortho, triplets120, periodic=True, form=form))
        want = golden.angles(xyz_small, triplets120, box=box_ortho)
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_triclinic(self, traj_triclinic, xyz_small, triplets120, box_triclinic, form):
        got = _collect(compute_angles(traj_triclinic, triplets120, periodic=True, form=form))
        want = golden.angles(xyz_small, triplets120, box=box_triclinic)
        np.testing.assert_allclose(got, want, atol=ATOL)


def test_empty_triplets(traj_nocell):
    df = compute_angles(traj_nocell, np.empty((0, 3), dtype=np.int32))
    assert df.count() == 0


def test_invalid_triplets_raise(traj_nocell):
    with pytest.raises(ValueError):
        compute_angles(traj_nocell, np.array([[0, 1, 999999]]))
