"""Differential tests for G1/G2 against the numpy golden oracle,
mirroring the reference's test matrix (tests/test_geometry.py:
opt × periodic parametrization → here sql-form × vectorized-form ×
{nocell, ortho, triclinic})."""

from __future__ import annotations

import numpy as np
import pytest

from dask_traj_spark.operators.distance import (
    compute_distances,
    compute_displacements,
)
from tests import golden

ATOL = 1e-5


def _collect_dist(df):
    pdf = df.toPandas().sort_values(["frame_id", "pair_id"])
    n_frames = pdf["frame_id"].nunique()
    return pdf["dist"].to_numpy().reshape(n_frames, -1)


def _collect_disp(df):
    pdf = df.toPandas().sort_values(["frame_id", "pair_id"])
    n_frames = pdf["frame_id"].nunique()
    return pdf[["dx", "dy", "dz"]].to_numpy().reshape(n_frames, -1, 3)


@pytest.mark.parametrize("form", ["sql", "vectorized"])
class TestDistances:
    def test_nonperiodic(self, traj_nocell, xyz_small, pairs45, form):
        got = _collect_dist(compute_distances(traj_nocell, pairs45, periodic=False, form=form))
        want = golden.distances(xyz_small, pairs45)
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_periodic_flag_ignored_without_cell(self, traj_nocell, xyz_small, pairs45, form):
        got = _collect_dist(compute_distances(traj_nocell, pairs45, periodic=True, form=form))
        want = golden.distances(xyz_small, pairs45)
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_ortho_mic(self, traj_ortho, xyz_small, pairs45, box_ortho, form):
        got = _collect_dist(compute_distances(traj_ortho, pairs45, periodic=True, form=form))
        want = golden.distances(xyz_small, pairs45, box=box_ortho)
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_triclinic_mic(self, traj_triclinic, xyz_small, pairs45, box_triclinic, form):
        got = _collect_dist(compute_distances(traj_triclinic, pairs45, periodic=True, form=form))
        want = golden.distances(xyz_small, pairs45, box=box_triclinic)
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_displacements_nonperiodic(self, traj_nocell, xyz_small, pairs45, form):
        got = _collect_disp(
            compute_displacements(traj_nocell, pairs45, periodic=False, form=form)
        )
        want = golden.displacements(xyz_small, pairs45)
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_displacements_triclinic(
        self, traj_triclinic, xyz_small, pairs45, box_triclinic, form
    ):
        got = _collect_disp(
            compute_displacements(traj_triclinic, pairs45, periodic=True, form=form)
        )
        want = golden.displacements(xyz_small, pairs45, box=box_triclinic)
        np.testing.assert_allclose(got, want, atol=ATOL)


def test_forms_agree(traj_triclinic, pairs45):
    a = _collect_dist(compute_distances(traj_triclinic, pairs45, periodic=True, form="sql"))
    b = _collect_dist(
        compute_distances(traj_triclinic, pairs45, periodic=True, form="vectorized")
    )
    np.testing.assert_allclose(a, b, atol=ATOL)


def test_empty_pairs(traj_nocell):
    # P4: empty selection short-circuits (reference distance.py:107-108)
    df = compute_distances(traj_nocell, np.empty((0, 2), dtype=np.int32))
    assert df.count() == 0
    assert df.columns == ["frame_id", "pair_id", "dist"]


def test_invalid_pairs_raise(traj_nocell):
    # P3: out-of-range indices raise (reference distance.py:105-106)
    with pytest.raises(ValueError):
        compute_distances(traj_nocell, np.array([[0, 999999]]))
    with pytest.raises(ValueError):
        compute_distances(traj_nocell, np.array([[-1, 1]]))
