"""Migration walkthrough: the reference's example workflow, Spark-first.

The reference's ``examples/dask-traj_example.ipynb`` loads an XTC
trajectory lazily, computes distances over many atom pairs, and drops
to mdtraj for anything else.  This script runs the same workflow on
this engine — same inputs (the reference's GROMACS-written test
fixture, read-only), same results, plus the operators the reference
never had.  Run: ``python examples/migration.py``
"""

import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import dask_traj_spark as dts

XTC = "/root/reference/dask_traj/tests/test.xtc"
PDB = "/root/reference/dask_traj/tests/test.pdb"


def main() -> None:
    spark = dts.get_spark(app_name="migration-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. lazy chunked load — the reference's dask_traj.load(filename,
    #    chunks=...) becomes the same call here; nothing reads until
    #    an action runs
    traj = dts.load(spark, XTC, chunks=25, top=PDB)
    print(f"loaded: {traj.n_frames} frames x {traj.n_atoms} atoms")

    # 2. the canonical distance workload (reference notebook cell:
    #    compute_distances over combinations of atoms with MIC)
    pairs = list(itertools.combinations(range(50), 2))
    d = dts.compute_distances(traj, pairs, periodic=True)
    head = d.orderBy("frame_id", "pair_id").limit(3).collect()
    print("distances head:", [(r["frame_id"], r["pair_id"], round(r["dist"], 4)) for r in head])

    # 3. frame slicing / atom selection — the reference's traj[::10]
    #    and mdtraj atom_slice / topology.select
    every10 = traj.slice_frames(step=10)
    ca = traj.select_atoms_mdtraj("name CA")
    print(f"strided: {every10.n_frames} frames; CA atoms: {ca.n_atoms}")

    # 4. analysis the reference escapes to mdtraj for — native here:
    rg = dts.compute_radius_of_gyration(traj).orderBy("frame_id").limit(3).collect()
    print("Rg head:", [round(r["rg"], 4) for r in rg])
    rmsd = dts.frame_rmsd(traj, query_frame=0).orderBy("frame_id").limit(3).collect()
    print("RMSD-to-frame-0 head:", [round(r["rmsd"], 5) for r in rmsd])
    contacts = dts.neighbor_pairs(traj, cutoff=0.35)
    print("contact pairs (frame 0):",
          contacts.where("frame_id = 0").count())

    # 5. the reference's to_mdtraj() escape hatch → to_numpy here
    xyz, time = traj.to_numpy()
    assert xyz.shape == (traj.n_frames, traj.n_atoms, 3)
    print("materialized:", xyz.shape, "time range", (time[0], time[-1]))

    # 6. and back out to any format the reference could only READ:
    out = "/tmp/migration_out.dcd"
    from dask_traj_spark.sources.dcd import write_dcd

    write_dcd(traj.slice_frames(stop=10), out)
    back = dts.load(spark, out)
    got, _ = back.to_numpy()
    assert np.allclose(got, xyz[:10], atol=1e-3)
    print(f"round-tripped 10 frames through {out}")

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
