"""DCD binary format: write → read round-trip, chunked DataSource
partitions, unit-cell records, loader dispatch."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def small_traj(spark):
    from dask_traj_spark.sources.loaders import from_wide_pandas

    rng = np.random.default_rng(9)
    xyz = rng.uniform(0, 4, size=(12, 25, 3)).astype(np.float32)
    return (
        from_wide_pandas(
            spark,
            xyz,
            time=np.arange(12) * 2.0,
            unitcell_lengths=np.full((12, 3), 4.0),
            unitcell_angles=np.tile([90.0, 90.0, 90.0], (12, 1)),
        ),
        xyz,
    )


def test_dcd_round_trip(spark, small_traj, tmp_path):
    from dask_traj_spark.sources.dcd import load_dcd, read_info, write_dcd

    traj, xyz = small_traj
    path = str(tmp_path / "t.dcd")
    write_dcd(traj, path)

    info = read_info(path)
    assert (info.n_frames, info.n_atoms, info.has_cell) == (12, 25, True)

    back = load_dcd(spark, path, chunks=5)
    assert back.n_frames == 12 and back.n_atoms == 25
    got, _ = back.to_numpy()
    # Å round-trip in float32: ~1e-6 relative
    np.testing.assert_allclose(got, xyz, atol=1e-5)

    uc = back.unitcell_lengths_angles.orderBy("frame_id").toPandas()
    np.testing.assert_allclose(uc["a"], 4.0, atol=1e-6)
    np.testing.assert_allclose(uc["alpha"], 90.0, atol=1e-4)


def test_dcd_partitions_are_chunked(spark, small_traj, tmp_path):
    from dask_traj_spark.sources.dcd import (
        HAVE_DATASOURCE_API,
        DCDDataSourceReader,
        write_dcd,
    )

    if not HAVE_DATASOURCE_API:
        pytest.skip("no datasource API")
    traj, _ = small_traj
    path = str(tmp_path / "t.dcd")
    write_dcd(traj, path)
    reader = DCDDataSourceReader(None, {"path": path, "chunks": "5"})
    parts = reader.partitions()
    assert len(parts) == 3  # 12 frames / 5 per chunk
    assert [p.start for p in parts] == [0, 5, 10]


def test_load_dispatch_dcd(spark, small_traj, tmp_path):
    import dask_traj_spark as dts

    traj, xyz = small_traj
    path = str(tmp_path / "t2.dcd")
    from dask_traj_spark.sources.dcd import write_dcd

    write_dcd(traj, path)
    back = dts.load(spark, path)
    row = (
        back.coords.where((F.col("frame_id") == 3) & (F.col("atom_id") == 4))
        .first()
    )
    np.testing.assert_allclose(
        [row["x"], row["y"], row["z"]], xyz[3, 4], atol=1e-5
    )


def test_dcd_rejects_garbage(tmp_path):
    from dask_traj_spark.sources.dcd import read_info

    p = tmp_path / "bad.dcd"
    p.write_bytes(b"\x00" * 100)
    with pytest.raises(ValueError):
        read_info(str(p))


def test_dcd_parts_sink_and_merge(spark, tmp_path):
    """Distributed parts sink → driver merge → single-file re-load
    matches the original trajectory."""
    import numpy as np

    import dask_traj_spark as dts
    from dask_traj_spark.sources.dcd import merge_dcd_parts, write_dcd_parts
    from dask_traj_spark.sources.loaders import from_wide_pandas

    rng = np.random.default_rng(23)
    xyz = rng.uniform(-1, 4, (11, 40, 3)).astype(np.float32)
    traj = from_wide_pandas(
        spark,
        xyz,
        unitcell_lengths=np.full((11, 3), 5.0),
        unitcell_angles=np.tile([90.0, 90.0, 90.0], (11, 1)),
    )
    d = str(tmp_path / "parts")
    manifest = write_dcd_parts(traj, d, frames_per_part=4)
    assert [m[0] for m in manifest] == [0, 1, 2]
    assert [m[2] for m in manifest] == [4, 4, 3]

    out = str(tmp_path / "merged.dcd")
    merge_dcd_parts(d, out)
    back = dts.load(spark, out, chunks=5)
    assert back.n_frames == 11 and back.n_atoms == 40
    got, _ = back.to_numpy()
    np.testing.assert_allclose(got, xyz, atol=2e-6)
