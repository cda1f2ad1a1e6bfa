"""Trajectory algebra: slicing (P1/P2), join/concat (U1), content
hash (U2), materialization (S10), loaders — mirrors the reference's
tests/test_dask_traj.py coverage."""

from __future__ import annotations

import numpy as np
import pytest

from dask_traj_spark.sources.loaders import from_wide_pandas, load, load_tables, save_tables


def _xyz_of(traj):
    xyz, _ = traj.to_numpy()
    return xyz


class TestSlicing:
    def test_head(self, traj_nocell, xyz_small):
        t5 = traj_nocell.slice_frames(None, 5)
        assert t5.n_frames == 5
        np.testing.assert_array_equal(_xyz_of(t5), xyz_small[:5])

    def test_stride(self, traj_nocell, xyz_small):
        t = traj_nocell.slice_frames(None, None, 10)
        np.testing.assert_array_equal(_xyz_of(t), xyz_small[::10])

    def test_reverse(self, traj_nocell, xyz_small):
        t = traj_nocell.slice_frames(None, None, -1)
        np.testing.assert_array_equal(_xyz_of(t), xyz_small[::-1])

    def test_negative_stop(self, traj_nocell, xyz_small):
        t = traj_nocell.slice_frames(None, -1)
        assert t.n_frames == xyz_small.shape[0] - 1

    def test_atom_slice(self, traj_nocell, xyz_small):
        t = traj_nocell.atom_slice(list(range(10)))
        assert t.n_atoms == 10
        np.testing.assert_array_equal(_xyz_of(t), xyz_small[:, :10])
        assert t.topology.count() == 10


class TestJoin:
    def test_concat(self, spark, xyz_small, topology_rows):
        a = from_wide_pandas(spark, xyz_small[:10], topology_rows=topology_rows)
        b = from_wide_pandas(spark, xyz_small[10:20], topology_rows=topology_rows)
        j = a.join(b)
        assert j.n_frames == 20
        np.testing.assert_array_equal(_xyz_of(j), xyz_small[:20])

    def test_mismatched_atoms_raise(self, spark, xyz_small):
        a = from_wide_pandas(spark, xyz_small[:2])
        b = from_wide_pandas(spark, xyz_small[:2, :100])
        with pytest.raises(ValueError, match="atoms"):
            a.join(b)

    def test_mismatched_unitcell_raise(self, spark, xyz_small):
        a = from_wide_pandas(
            spark, xyz_small[:2],
            unitcell_lengths=np.full((2, 3), 6.8555),
            unitcell_angles=np.full((2, 3), 90.0),
        )
        b = from_wide_pandas(spark, xyz_small[:2])
        with pytest.raises(ValueError, match="unitcell"):
            a.join(b)

    def test_discard_overlapping(self, spark, xyz_small):
        # b starts with a's last frame → that boundary frame is dropped
        a = from_wide_pandas(spark, xyz_small[:10])
        b = from_wide_pandas(spark, xyz_small[9:20])
        j = a.join(b, discard_overlapping_frames=True)
        assert j.n_frames == 20
        np.testing.assert_array_equal(_xyz_of(j), xyz_small[:20])

    def test_no_overlap_keeps_all(self, spark, xyz_small):
        a = from_wide_pandas(spark, xyz_small[:10])
        b = from_wide_pandas(spark, xyz_small[20:30])
        j = a.join(b, discard_overlapping_frames=True)
        assert j.n_frames == 20


class TestHash:
    def test_equal_content_equal_hash(self, spark, xyz_small):
        a = from_wide_pandas(spark, xyz_small[:5])
        b = from_wide_pandas(spark, xyz_small[:5])
        assert a.content_hash() == b.content_hash()
        assert a == b

    def test_different_content_different_hash(self, spark, xyz_small):
        a = from_wide_pandas(spark, xyz_small[:5])
        b = from_wide_pandas(spark, xyz_small[1:6])
        assert a.content_hash() != b.content_hash()


class TestLoaders:
    def test_parquet_roundtrip(self, spark, traj_triclinic, tmp_path):
        out = str(tmp_path / "traj")
        save_tables(traj_triclinic, out)
        back = load_tables(spark, out)
        assert back.n_frames == traj_triclinic.n_frames
        assert back.n_atoms == traj_triclinic.n_atoms
        assert back.content_hash() == traj_triclinic.content_hash()

    def test_unknown_format_raises(self, spark):
        with pytest.raises(NotImplementedError):
            load(spark, "/tmp/some.gsd")
        with pytest.raises(NotImplementedError):
            load(spark, "/tmp/some.whatever")

    def test_xyz_loader(self, spark, tmp_path):
        # mirrors reference test.xyz: tiny 2-atom frames, Å → nm
        p = tmp_path / "t.xyz"
        frames = []
        for f in range(3):
            frames.append(f"2\nframe {f}\nC 1.0 2.0 {3.0 + f}\nO 4.0 5.0 {6.0 + f}\n")
        p.write_text("".join(frames))
        t = load(spark, str(p))
        assert t.n_frames == 3
        assert t.n_atoms == 2
        xyz, time = t.to_numpy()
        np.testing.assert_allclose(xyz[0, 0], [0.1, 0.2, 0.3], atol=1e-6)
        np.testing.assert_allclose(xyz[2, 1], [0.4, 0.5, 0.8], atol=1e-6)
        # synthetic time fallback (S8)
        np.testing.assert_array_equal(time, [0.0, 1.0, 2.0])

    def test_time_roundtrip(self, spark, traj_triclinic):
        pdf = traj_triclinic.time.toPandas().sort_values("frame_id")
        np.testing.assert_allclose(pdf["time"].to_numpy(), np.arange(101) * 1000.0)


def test_unitcell_lazy_derivation(spark, traj_triclinic):
    # §3.4: vectors present → lengths/angles derived lazily and match
    uc = traj_triclinic.unitcell.select(
        "frame_id", "ax", "ay", "az", "bx", "by", "bz", "cx", "cy", "cz"
    )
    from dask_traj_spark.trajectory import Trajectory

    t = Trajectory(traj_triclinic.coords, unitcell=uc)
    la = t.unitcell_lengths_angles.toPandas().sort_values("frame_id").iloc[0]
    np.testing.assert_allclose(
        la[["a", "b", "c", "alpha", "beta", "gamma"]].to_numpy(dtype=float),
        [6.8555, 6.8555, 6.8555, 60.0, 60.0, 90.0],
        atol=1e-3,
    )


def test_load_multi_concatenates_files(spark, tmp_path):
    """A glob of segment files loads as one trajectory with frames
    renumbered across the boundary (the multi-file form of U1)."""
    import numpy as np

    import dask_traj_spark as dts
    from dask_traj_spark.sources.loaders import from_wide_pandas
    from dask_traj_spark.sources.trr import write_trr

    rng = np.random.default_rng(3)
    seg = [rng.uniform(0, 3, (n, 12, 3)).astype(np.float32) for n in (4, 3, 5)]
    for i, xyz in enumerate(seg):
        write_trr(
            from_wide_pandas(spark, xyz, time=np.arange(len(xyz)) * 1.0),
            str(tmp_path / f"seg{i}.trr"),
        )
    traj = dts.load_multi(spark, str(tmp_path / "seg*.trr"), chunks=2)
    assert traj.n_frames == 12 and traj.n_atoms == 12
    got, _ = traj.to_numpy()
    np.testing.assert_array_equal(got, np.concatenate(seg, axis=0))
