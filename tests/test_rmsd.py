"""Frame-RMSD similarity search tests (operators/rmsd.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def rmsd_traj(spark):
    from dask_traj_spark.sources.loaders import from_wide_pandas

    rng = np.random.default_rng(21)
    base = rng.uniform(0, 3, (1, 40, 3)).astype(np.float32)
    frames = [base[0]]
    for _ in range(9):
        frames.append(frames[-1] + rng.normal(0, 0.05, (40, 3)).astype(np.float32))
    xyz = np.stack(frames)
    return from_wide_pandas(spark, xyz), xyz


def _golden_centered_rmsd(xyz, q):
    p = xyz - xyz.mean(axis=1, keepdims=True)
    qq = q - q.mean(axis=0, keepdims=True)
    return np.sqrt(((p - qq) ** 2).sum(-1).mean(-1))


def test_frame_rmsd_matches_golden(rmsd_traj):
    from dask_traj_spark.operators.rmsd import frame_rmsd

    traj, xyz = rmsd_traj
    got = (
        frame_rmsd(traj, 0).toPandas().set_index("frame_id").sort_index()["rmsd"]
    )
    want = _golden_centered_rmsd(
        xyz.astype(np.float64), xyz[0].astype(np.float64)
    )
    # engine quantizes coords to 2^-12 → atol reflects the grid
    np.testing.assert_allclose(got.to_numpy(), want, atol=2e-3)
    assert got[0] < 1e-9  # self-RMSD exactly 0


def test_rmsd_topk_orders_by_drift(rmsd_traj):
    from dask_traj_spark.operators.rmsd import rmsd_topk

    traj, _ = rmsd_traj
    pdf = rmsd_topk(traj, 0, k=3).toPandas().sort_values("rank")
    # random walk: nearest frames to frame 0 are the earliest ones
    assert pdf["frame_id"].iloc[0] == 1
    assert (pdf["rmsd"].diff().dropna() >= 0).all()


def test_aligned_rmsd_invariant_to_rotation(spark):
    """Kabsch RMSD must be ~0 for a rigidly rotated frame where the
    centered (unaligned) RMSD is clearly nonzero."""
    from dask_traj_spark.operators.rmsd import frame_rmsd, frame_rmsd_aligned
    from dask_traj_spark.sources.loaders import from_wide_pandas

    rng = np.random.default_rng(4)
    a = rng.uniform(-1, 1, (30, 3))
    th = 0.7
    rot = np.array(
        [
            [np.cos(th), -np.sin(th), 0.0],
            [np.sin(th), np.cos(th), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    xyz = np.stack([a, a @ rot.T]).astype(np.float32)
    traj = from_wide_pandas(spark, xyz)

    unaligned = (
        frame_rmsd(traj, 0).toPandas().set_index("frame_id").sort_index()["rmsd"]
    )
    aligned = (
        frame_rmsd_aligned(traj, 0)
        .toPandas()
        .set_index("frame_id")
        .sort_index()["rmsd"]
    )
    assert unaligned[1] > 0.1
    assert aligned[1] < 1e-3
    assert aligned[0] < 1e-6


def test_superpose_realizes_aligned_rmsd(spark):
    """The emitted coordinates must realize the optimal rotation:
    plain RMSD of superposed frames vs the superposed query equals
    frame_rmsd_aligned of the original; and superpose is invariant
    to a rigid rotation of the input."""
    import numpy as np
    from pyspark.sql import functions as F

    from dask_traj_spark.operators.rmsd import frame_rmsd_aligned, superpose
    from dask_traj_spark.trajectory import Trajectory

    rng = np.random.default_rng(41)
    n_f, n_a = 6, 30
    xyz = rng.uniform(0, 2, (n_f, n_a, 3))

    def mk(x):
        rows = [
            (f, a, float(x[f, a, 0]), float(x[f, a, 1]), float(x[f, a, 2]))
            for f in range(n_f)
            for a in range(n_a)
        ]
        return Trajectory(
            spark.createDataFrame(
                rows, "frame_id long, atom_id int, x float, y float, z float"
            )
        )

    traj = mk(xyz)
    sup = superpose(traj, 0).toPandas()
    qp = sup[sup["frame_id"] == 0].sort_values("atom_id")[["x", "y", "z"]].to_numpy()
    aligned = (
        frame_rmsd_aligned(traj, 0)
        .toPandas().set_index("frame_id").sort_index()["rmsd"].to_numpy()
    )
    got = []
    for f in range(n_f):
        p = sup[sup["frame_id"] == f].sort_values("atom_id")[["x", "y", "z"]].to_numpy()
        got.append(np.sqrt(((p - qp) ** 2).sum(axis=1).mean()))
    np.testing.assert_allclose(got, aligned, atol=1e-5)

    # rigid-rotation EQUIVARIANCE: the output lives in the query
    # frame's coordinate system, so rotating the whole input rotates
    # the output identically: superpose(X·Rᵀ) == superpose(X)·Rᵀ
    th = 0.7
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    sup2 = superpose(mk(xyz @ R.T), 0).toPandas().sort_values(["frame_id", "atom_id"])
    sup1 = sup.sort_values(["frame_id", "atom_id"])
    np.testing.assert_allclose(
        sup1[["x", "y", "z"]].to_numpy() @ R.T,
        sup2[["x", "y", "z"]].to_numpy(),
        atol=1e-5,
    )


def test_rmsf_matches_numpy_and_zero_for_static(rmsd_traj, spark):
    from dask_traj_spark.operators.rmsd import compute_rmsf
    from dask_traj_spark.sources.loaders import from_wide_pandas

    traj, xyz = rmsd_traj
    out = {r["atom_id"]: r["rmsf"] for r in compute_rmsf(traj).collect()}
    # golden: quantize to the 2^-12 grid the operator snaps to
    q = np.round(xyz.astype(np.float64) * 4096.0) / 4096.0
    mean = q.mean(axis=0, keepdims=True)
    golden = np.sqrt(((q - mean) ** 2).sum(-1).mean(0))
    got = np.array([out[i] for i in range(xyz.shape[1])])
    np.testing.assert_allclose(got, golden, rtol=1e-9, atol=1e-12)

    # a static trajectory has zero fluctuation everywhere
    static = np.repeat(xyz[:1], 5, axis=0)
    rows = compute_rmsf(from_wide_pandas(spark, static)).collect()
    assert all(r["rmsf"] == 0.0 for r in rows)


def test_pairwise_rmsd_consistent_with_frame_rmsd(spark):
    """Row (q, j) of the all-pairs matrix must equal frame_rmsd(q)'s
    entry for j bit-for-bit (same dyadic sufficient statistics), and
    a duplicated frame must sit at exactly zero."""
    import numpy as np

    from dask_traj_spark.operators.rmsd import frame_rmsd, pairwise_rmsd
    from dask_traj_spark.trajectory import Trajectory

    rng = np.random.default_rng(53)
    nf, na = 8, 30
    # snap to the 2^-12 grid first so the dyadic translation commutes
    # exactly with the operators' internal quantization
    xyz = np.round(rng.uniform(0, 2, (nf, na, 3)) * 4096) / 4096
    xyz[6] = xyz[2] + np.array([0.5, -0.25, 0.125])  # translated copy
    rows = [
        (f, a, float(xyz[f, a, 0]), float(xyz[f, a, 1]), float(xyz[f, a, 2]))
        for f in range(nf) for a in range(na)
    ]
    traj = Trajectory(spark.createDataFrame(
        rows, "frame_id long, atom_id int, x double, y double, z double"
    ))
    mat = {
        (r["frame_i"], r["frame_j"]): r["rmsd"]
        for r in pairwise_rmsd(traj).collect()
    }
    assert len(mat) == nf * (nf - 1) // 2
    base = {r["frame_id"]: r["rmsd"] for r in frame_rmsd(traj, 0).collect()}
    for j in range(1, nf):
        # 1-ulp tolerance: the two operators sum the same exact
        # sufficient statistics but in (i,j)-swapped order, and the
        # final combination of ROUNDED averages is order-sensitive at
        # the last bit (the x16 oracle mirrors pairwise's order
        # exactly, so the driver gate stays bitwise)
        np.testing.assert_allclose(mat[(0, j)], base[j], rtol=1e-12)
    # centered RMSD is translation-invariant; the avg-division by
    # n_atoms is the one non-dyadic step, so the duplicate lands at
    # the sqrt-of-epsilon cancellation floor (~1e-8), not exact zero
    # — still engine-identical, which is what the gate checks
    assert mat[(2, 6)] < 1e-7



def test_rmsd_blocked_matches_sql(spark):
    """The blocked-gram matmul path must reproduce the SQL
    sufficient-statistics form BIT-FOR-BIT: its matmul sums are
    exact dyadic values and the post-division expression mirrors the
    SQL operation order, so any deviation is a real plumbing bug
    (lost tile, frame double-shipped, wrong i<j mask), not noise.
    block=3 on 10 frames exercises interior, diagonal and ragged
    edge tiles."""
    import numpy as np

    from dask_traj_spark.operators.rmsd import (
        pairwise_rmsd,
        pairwise_rmsd_blocked,
    )
    from dask_traj_spark.trajectory import Trajectory

    rng = np.random.default_rng(59)
    nf, na = 10, 30
    xyz = np.round(rng.uniform(0, 2, (nf, na, 3)) * 4096) / 4096
    rows = [
        (f, a, float(xyz[f, a, 0]), float(xyz[f, a, 1]), float(xyz[f, a, 2]))
        for f in range(nf) for a in range(na)
    ]
    traj = Trajectory(spark.createDataFrame(
        rows, "frame_id long, atom_id int, x double, y double, z double"
    ))
    want = {
        (r["frame_i"], r["frame_j"]): r["rmsd"]
        for r in pairwise_rmsd(traj).collect()
    }
    got = {
        (r["frame_i"], r["frame_j"]): r["rmsd"]
        for r in pairwise_rmsd_blocked(traj, block=3).collect()
    }
    assert set(got) == set(want) and len(got) == nf * (nf - 1) // 2
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])
    # one-tile degenerate case (block > n_frames) must also agree
    got1 = {
        (r["frame_i"], r["frame_j"]): r["rmsd"]
        for r in pairwise_rmsd_blocked(traj, block=64).collect()
    }
    assert got1 == want


def test_rmsd_blocked_rejects_ragged_frames(spark):
    """Review finding: a frame with a missing atom must fail loudly
    (uniform atom count is what lets rows pivot into a dense
    matrix), never silently misalign."""
    import numpy as np
    import pytest

    from dask_traj_spark.operators.rmsd import pairwise_rmsd_blocked
    from dask_traj_spark.trajectory import Trajectory

    rows = [
        (f, a, float(f + a), 0.0, 0.0)
        for f in range(4) for a in range(6)
        if not (f == 2 and a == 5)  # frame 2 is short one atom
    ]
    traj = Trajectory(spark.createDataFrame(
        rows, "frame_id long, atom_id int, x double, y double, z double"
    ))
    with pytest.raises(Exception, match="uniform atom count"):
        pairwise_rmsd_blocked(traj, block=2).collect()


def test_pairwise_rmsd_auto_dispatch(spark):
    """pairwise_rmsd_auto must pick the SQL self-join below the
    measured crossover and the blocked-gram applyInPandas at/above
    it — pinned via the physical plan (the blocked form is the only
    one with a FlatMapGroupsInPandas node), plus the default
    threshold sitting inside the measured 1k<SQL-wins, 4k<blocked-
    wins band (bench_detail.json: SQL 15.7 s vs blocked 18.3 s at
    1k; blocked 20.6 s vs SQL 230.9 s at 4k)."""
    import numpy as np

    from dask_traj_spark.operators.rmsd import (
        PAIRWISE_RMSD_CROSSOVER,
        pairwise_rmsd_auto,
    )
    from dask_traj_spark.trajectory import Trajectory

    assert 1000 < PAIRWISE_RMSD_CROSSOVER <= 4000

    rng = np.random.default_rng(61)
    nf, na = 8, 12
    xyz = np.round(rng.uniform(0, 2, (nf, na, 3)) * 4096) / 4096
    rows = [
        (f, a, float(xyz[f, a, 0]), float(xyz[f, a, 1]), float(xyz[f, a, 2]))
        for f in range(nf) for a in range(na)
    ]
    traj = Trajectory(spark.createDataFrame(
        rows, "frame_id long, atom_id int, x double, y double, z double"
    ))

    # n_frames=8 < crossover=9 → SQL form (no Pandas-group node)
    sql_df = pairwise_rmsd_auto(traj, crossover=9)
    assert "FlatMapGroupsInPandas" not in sql_df._jdf.queryExecution().toString()
    # n_frames=8 ≥ crossover=8 → blocked form
    blk_df = pairwise_rmsd_auto(traj, block=3, crossover=8)
    assert "FlatMapGroupsInPandas" in blk_df._jdf.queryExecution().toString()

    # both dispatch targets agree bit-for-bit (the auto form adds no
    # arithmetic of its own)
    want = {(r["frame_i"], r["frame_j"]): r["rmsd"] for r in sql_df.collect()}
    got = {(r["frame_i"], r["frame_j"]): r["rmsd"] for r in blk_df.collect()}
    assert want.keys() == got.keys() and len(want) == nf * (nf - 1) // 2
    for k in want:
        assert want[k] == got[k], k


def test_frame_count_hint_cheap_paths(spark):
    """_frame_count_hint must (a) reuse a cached n_frames, (b) count
    the tiny frames dimension when present and seed the cache, and
    (c) fall back to the min/max span — an upper bound on sparse ids
    that biases dispatch toward the blocked (scale-safe) branch,
    never a distinct-count scan of coords."""
    import numpy as np

    from dask_traj_spark.operators.rmsd import (
        _frame_count_hint,
        pairwise_rmsd_auto,
    )
    from dask_traj_spark.trajectory import Trajectory

    rng = np.random.default_rng(62)
    # sparse frame ids: 4 actual frames spanning [0, 40]
    fids = [0, 7, 21, 40]
    rows = [
        (f, a, *(float(v) for v in np.round(rng.uniform(0, 2, 3) * 4096) / 4096))
        for f in fids for a in range(5)
    ]
    traj = Trajectory(spark.createDataFrame(
        rows, "frame_id long, atom_id int, x double, y double, z double"
    ))
    # span fallback: upper bound 41, not the exact 4
    assert _frame_count_hint(traj) == 41
    # the over-estimate routes to blocked at crossover=10 even though
    # the exact count (4) would have picked SQL — documented bias
    blk = pairwise_rmsd_auto(traj, block=16, crossover=10)
    assert "FlatMapGroupsInPandas" in blk._jdf.queryExecution().toString()
    # blocked output is still exact: 4 frames -> 6 pairs
    assert blk.count() == 6

    # cached n_frames wins over everything
    traj.__dict__["n_frames"] = 4
    assert _frame_count_hint(traj) == 4

    # frames dimension table: counted and seeded into the cache
    frames_df = spark.createDataFrame(
        [(f, float(f), f) for f in fids],
        "frame_id long, time double, step long",
    )
    traj2 = Trajectory(traj.coords, frames=frames_df)
    assert _frame_count_hint(traj2) == 4
    assert traj2.__dict__["n_frames"] == 4
