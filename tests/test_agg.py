"""COM / COG / closest-contact (G5/G6/G7) vs the numpy golden."""

from __future__ import annotations

import numpy as np

from dask_traj_spark.operators.distance import (
    compute_center_of_geometry,
    compute_center_of_mass,
    find_closest_contact,
)
from tests import golden


def _collect_xyz(df):
    pdf = df.toPandas().sort_values("frame_id")
    return pdf[["x", "y", "z"]].to_numpy()


def test_center_of_mass(traj_triclinic, xyz_small, masses):
    got = _collect_xyz(compute_center_of_mass(traj_triclinic))
    want = golden.center_of_mass(xyz_small, masses)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_center_of_geometry(traj_triclinic, xyz_small):
    got = _collect_xyz(compute_center_of_geometry(traj_triclinic))
    want = golden.center_of_geometry(xyz_small)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_closest_contact_single_frame(traj_nocell, xyz_small):
    # reference computes frame=0 only (distance.py:393-464)
    g1, g2 = list(range(10)), list(range(10, 20))
    df = find_closest_contact(traj_nocell, g1, g2, frame=0, periodic=False)
    rows = df.collect()
    assert len(rows) == 1
    want = golden.closest_contact(xyz_small[:1], g1, g2)[0]
    got = rows[0]
    assert (got["i"], got["j"]) == (want[1], want[2])
    np.testing.assert_allclose(got["dist"], want[3], atol=1e-5)


def test_closest_contact_all_frames(traj_triclinic, xyz_small, box_triclinic):
    # generalization beyond the reference: per-frame min over groups
    g1, g2 = list(range(10)), list(range(10, 20))
    df = find_closest_contact(traj_triclinic, g1, g2, periodic=True)
    pdf = df.toPandas().sort_values("frame_id").reset_index(drop=True)
    want = golden.closest_contact(xyz_small, g1, g2, box=box_triclinic)
    assert len(pdf) == xyz_small.shape[0]
    for f, (wf, wi, wj, wd) in enumerate(want):
        np.testing.assert_allclose(pdf.loc[f, "dist"], wd, atol=1e-5)
        assert (pdf.loc[f, "i"], pdf.loc[f, "j"]) == (wi, wj)
