"""The Trajectory facade — a thin Python object over 3-4 DataFrames.

Mirrors the surface of the reference's ``Trajectory`` class
(``/root/reference/dask_traj/core/dask_traj.py:364-669``, itself a
subclass of ``mdtraj.Trajectory``) without any of its array
machinery: every property is a lazy DataFrame (logical plan), every
method builds a new plan; nothing executes until the caller runs an
action. Lazy derived unit-cell representations (vectors ⇄
lengths/angles, reference ``:445-560``) are plain projections
computed on access.

Scale notes (100 TB posture):
- ``coords`` is the only big table; everything else is per-frame or
  per-atom dimensions.
- ``wide()`` converts to one-row-per-frame arrays. This is the ONE
  shuffle most geometry pipelines pay (a single ``GROUP BY
  frame_id`` over the fact table); every downstream geometry op is
  then narrow/partition-local. Cache it when running >1 op.
- slicing/striding are pure frame_id predicates → partition pruning
  against a frame-range-partitioned Parquet layout.
"""

from __future__ import annotations

from functools import cached_property

from pyspark.sql import DataFrame, functions as F

from dask_traj_spark.operators.unitcell import (
    with_box_vectors,
    with_lengths_and_angles,
)


class Trajectory:
    """Topology (static) + per-frame tables (dynamic), all lazy.

    Parameters
    ----------
    coords : DataFrame(frame_id, atom_id, x, y, z)
    frames : DataFrame(frame_id, time, step) or None
    unitcell : DataFrame(frame_id, a..gamma and/or ax..cz) or None
    topology : DataFrame(atom_id, name, element, mass, ...) or None
    """

    def __init__(
        self,
        coords: DataFrame,
        frames: DataFrame | None = None,
        unitcell: DataFrame | None = None,
        topology: DataFrame | None = None,
        packed: bool = False,
    ):
        self.coords = coords
        self._frames = frames
        self.unitcell = unitcell
        self.topology = topology
        self.spark = coords.sparkSession
        #: packed=True asserts the coords layout contract: every
        #: partition holds only WHOLE frames, rows sorted by
        #: (frame_id, atom_id) — e.g. read from frame-bucketed
        #: parquet or generated per-frame. Lets the vectorized
        #: geometry path skip its one shuffle. Violations surface as
        #: a clear error in the kernel's frame-block check.
        self.packed = packed

    # ---- dimensions -------------------------------------------------

    @cached_property
    def n_frames(self) -> int:
        return self.coords.select("frame_id").distinct().count()

    @cached_property
    def n_atoms(self) -> int:
        # cheap: one frame's worth of rows
        row = self.coords.agg(F.countDistinct("atom_id").alias("n")).first()
        return int(row["n"])

    @property
    def have_unitcell(self) -> bool:
        # reference: _have_unitcell (core/dask_traj.py:439-443)
        return self.unitcell is not None

    # ---- frame/time table -------------------------------------------

    @property
    def frames(self) -> DataFrame:
        """Per-frame dimension; synthesizes time=frame_id when the
        source had no time column (reference arange fallback,
        core/dask_traj.py:267-273)."""
        if self._frames is not None:
            return self._frames
        return self.coords.select("frame_id").distinct().select(
            "frame_id",
            F.col("frame_id").cast("double").alias("time"),
            F.col("frame_id").alias("step"),
        )

    @property
    def time(self) -> DataFrame:
        return self.frames.select("frame_id", "time")

    # ---- unitcell dual representation -------------------------------

    @property
    def unitcell_vectors(self) -> DataFrame | None:
        """(frame_id, ax..cz); derives from lengths/angles lazily if
        the vector columns are absent (reference
        core/dask_traj.py:519-560)."""
        if self.unitcell is None:
            return None
        uc = self.unitcell
        if "ax" not in uc.columns:
            uc = with_box_vectors(uc)
        return uc.select("frame_id", "ax", "ay", "az", "bx", "by", "bz", "cx", "cy", "cz")

    @property
    def unitcell_lengths_angles(self) -> DataFrame | None:
        """(frame_id, a, b, c, alpha, beta, gamma); derives from
        vectors lazily when absent (reference :445-517)."""
        if self.unitcell is None:
            return None
        uc = self.unitcell
        if "a" not in uc.columns:
            uc = with_lengths_and_angles(uc)
        return uc.select("frame_id", "a", "b", "c", "alpha", "beta", "gamma")

    def unitcell_full(self) -> DataFrame | None:
        """Both representations materialized as columns."""
        if self.unitcell is None:
            return None
        uc = self.unitcell
        if "ax" not in uc.columns:
            uc = with_box_vectors(uc)
        if "a" not in uc.columns:
            uc = with_lengths_and_angles(uc)
        return uc

    # ---- packed long view (the vectorized hot path) -----------------

    def frame_packed(self) -> DataFrame:
        """Long coords arranged so every partition holds whole frames,
        rows sorted by (frame_id, atom_id). This — NOT ``wide()`` —
        is the input layout of the Arrow-vectorized geometry path:
        primitive columns cross the JVM→Arrow boundary on the fast
        (zero-boxing) path, and the Python side reshapes to
        (frames, atoms, 3) numpy blocks for the kernels.

        Costs one range-shuffle + in-partition sort, unless the
        trajectory was constructed with ``packed=True`` (frame-sorted
        parquet / ordered generation), in which case it is free.
        Memoized; ``traj.frame_packed().cache()`` before running
        several geometry ops.

        At 100 TB this is the layout the storage should already have:
        parquet bucketed/sorted by frame ranges makes every geometry
        op a narrow scan.
        """
        if getattr(self, "_packed_df", None) is not None:
            return self._packed_df
        if self.packed:
            self._packed_df = self.coords
        else:
            self._packed_df = self.coords.repartitionByRange(
                "frame_id"
            ).sortWithinPartitions("frame_id", "atom_id")
        return self._packed_df

    # ---- wide (per-frame arrays) view -------------------------------

    def wide(self) -> DataFrame:
        """One row per frame: (frame_id, xs, ys, zs) with arrays
        indexed by atom_id. The single shuffle that buys
        partition-local geometry for every downstream op.

        ``array_sort`` on (atom_id, value) structs guarantees
        positional order without a sort-based aggregate.

        The result DataFrame is memoized on the instance so callers
        can ``traj.wide().cache()`` once and every downstream
        geometry op reuses the same (possibly cached) plan.
        """
        if getattr(self, "_wide", None) is not None:
            return self._wide
        pack = lambda c: F.transform(  # noqa: E731
            F.array_sort(F.collect_list(F.struct(F.col("atom_id"), F.col(c).alias("v")))),
            lambda s: s["v"],
        )
        self._wide = self.coords.groupBy("frame_id").agg(
            pack("x").alias("xs"), pack("y").alias("ys"), pack("z").alias("zs")
        )
        return self._wide

    # ---- slicing (P1/P2) --------------------------------------------

    def slice_frames(self, start=None, stop=None, step=None) -> "Trajectory":
        """``traj[start:stop:step]`` with frame renumbering.

        Pure frame_id predicates (partition-prunable); renumbering
        via dense_rank keeps downstream ops working (the reference
        gets renumbering free from array semantics —
        tests/test_geometry.py:30, test_dask_traj.py:143).
        Negative step reverses order (``traj[::-1]``).
        """
        n = self.n_frames
        start_, stop_, step_ = slice(start, stop, step).indices(n)
        ids = list(range(start_, stop_, step_))
        return self.select_frames(ids)

    def select_frames(self, frame_ids: list[int]) -> "Trajectory":
        """Keep exactly these frames, renumbered to 0..len-1 in the
        given order (supports reversal)."""
        spark = self.spark
        mapping = spark.createDataFrame(
            [(int(f), i) for i, f in enumerate(frame_ids)],
            "frame_id long, new_frame_id long",
        )
        b = F.broadcast(mapping)

        def remap(df: DataFrame | None) -> DataFrame | None:
            if df is None:
                return None
            return (
                df.join(b, "frame_id")
                .drop("frame_id")
                .withColumnRenamed("new_frame_id", "frame_id")
            )

        return Trajectory(
            remap(self.coords),
            remap(self._frames),
            remap(self.unitcell),
            self.topology,
        )

    def atom_slice(self, atom_ids: list[int]) -> "Trajectory":
        """Restrict to a subset of atoms, renumbered densely; rebuilds
        the topology dimension (reference inherits mdtraj's eager
        atom_slice — exercised at tests/test_dask_traj.py:129)."""
        spark = self.spark
        mapping = spark.createDataFrame(
            [(int(a), i) for i, a in enumerate(sorted(atom_ids))],
            "atom_id int, new_atom_id int",
        )
        b = F.broadcast(mapping)
        coords = (
            self.coords.join(b, "atom_id")
            .drop("atom_id")
            .withColumnRenamed("new_atom_id", "atom_id")
            .select("frame_id", "atom_id", "x", "y", "z")
        )
        topology = None
        if self.topology is not None:
            topology = (
                self.topology.join(b, "atom_id")
                .drop("atom_id")
                .withColumnRenamed("new_atom_id", "atom_id")
            )
        return Trajectory(coords, self._frames, self.unitcell, topology)

    def select_atoms(self, predicate: str) -> "Trajectory":
        """``atom_slice`` by a SQL predicate over the topology
        dimension — e.g. ``"element = 'C'"`` or
        ``"residue_name = 'ALA' AND name LIKE 'C%'"``. The selection
        language of the reference stack is mdtraj's
        ``topology.select``; here the topology is a table, so the
        selection language is SQL. The matching atom ids are
        collected driver-side (topology is a broadcast-scale
        dimension, ~n_atoms rows) and fed to :meth:`atom_slice`."""
        if self.topology is None:
            raise ValueError("select_atoms requires a topology")
        ids = [
            r.atom_id
            for r in self.topology.where(predicate).select("atom_id").collect()
        ]
        if not ids:
            raise ValueError(f"selection {predicate!r} matched no atoms")
        return self.atom_slice(ids)

    def select_atoms_mdtraj(self, selection: str) -> "Trajectory":
        """``select_atoms`` with mdtraj's selection mini-language —
        the grammar reference users already write (``"name CA and
        resid 1 to 10"``), compiled to a SQL predicate over the
        topology table by
        :func:`dask_traj_spark.functions.selection.mdtraj_selection_to_sql`
        (see that module for the supported subset)."""
        from dask_traj_spark.functions.selection import mdtraj_selection_to_sql

        return self.select_atoms(mdtraj_selection_to_sql(selection))

    # ---- concatenation (U1) -----------------------------------------

    def join(
        self,
        other: "Trajectory",
        check_topology: bool = True,
        discard_overlapping_frames: bool = False,
        overlap_atol: float = 2e-3,
    ) -> "Trajectory":
        """Concatenate trajectories along the frame axis (UNION ALL
        with renumbered frame_id) — the reference's ``join`` is
        concatenation, not a relational join
        (core/dask_traj.py:591-659).

        Validation mirrors the reference (:608-627): same n_atoms,
        same topology, matching have-unitcell. Optional boundary
        dedup drops this trajectory's last frame when all its coords
        agree with the other's first frame within ``overlap_atol``
        nm (:630-640).
        """
        if self.n_atoms != other.n_atoms:
            raise ValueError(
                f"Number of atoms differ: {self.n_atoms} vs {other.n_atoms}"
            )
        if check_topology and self.topology is not None and other.topology is not None:
            # one driver action, not two: either direction's surplus
            # rows prove inequality (symmetric difference is empty iff
            # the multisets match); unionByName keeps it a single job
            diff = self.topology.exceptAll(other.topology).unionByName(
                other.topology.exceptAll(self.topology)
            )
            if not diff.isEmpty():
                raise ValueError("Topologies are not identical")
        if self.have_unitcell != other.have_unitcell:
            raise ValueError(
                "Cannot join trajectories where only one has a unitcell"
            )

        n_left = self.n_frames
        left = self
        if discard_overlapping_frames:
            last = self.coords.filter(F.col("frame_id") == n_left - 1)
            first = other.coords.filter(F.col("frame_id") == 0)
            mismatch = (
                last.alias("l")
                .join(first.alias("r"), "atom_id")
                .where(
                    (F.abs(F.col("l.x") - F.col("r.x")) > overlap_atol)
                    | (F.abs(F.col("l.y") - F.col("r.y")) > overlap_atol)
                    | (F.abs(F.col("l.z") - F.col("r.z")) > overlap_atol)
                )
                .limit(1)
                .count()
            )
            if mismatch == 0:
                left = self.slice_frames(0, n_left - 1)
                n_left -= 1

        off = F.lit(n_left).cast("long")

        def shift(df: DataFrame | None) -> DataFrame | None:
            if df is None:
                return None
            return df.withColumn("frame_id", F.col("frame_id") + off)

        def cat(a: DataFrame | None, b: DataFrame | None) -> DataFrame | None:
            if a is None or b is None:
                return None
            return a.unionByName(shift(b), allowMissingColumns=True)

        return Trajectory(
            cat(left.coords, other.coords),
            cat(left._frames, other._frames),
            cat(left.unitcell, other.unitcell),
            self.topology,
        )

    # ---- equality / content hash (U2) -------------------------------

    def content_hash(self) -> int:
        """Order-insensitive content hash over coords (+ time,
        + unitcell when present): xxhash64 per row, bit_xor across
        rows. Replaces the reference's dask-token/array-hash equality
        (core/dask_traj.py:661-669) with actual content hashing —
        distributed, one pass, no collect."""
        parts = [
            self.coords.select(
                F.xxhash64("frame_id", "atom_id", "x", "y", "z").alias("h")
            )
        ]
        if self._frames is not None:
            parts.append(self._frames.select(F.xxhash64(*self._frames.columns).alias("h")))
        if self.unitcell is not None:
            parts.append(
                self.unitcell.select(F.xxhash64(*self.unitcell.columns).alias("h"))
            )
        allh = parts[0]
        for p in parts[1:]:
            allh = allh.unionAll(p)
        row = allh.agg(F.expr("bit_xor(h)").alias("h")).first()
        return int(row["h"]) if row["h"] is not None else 0

    def __eq__(self, other) -> bool:  # noqa: D105
        if not isinstance(other, Trajectory):
            return NotImplemented
        return self.content_hash() == other.content_hash()

    def __hash__(self) -> int:  # noqa: D105
        return self.content_hash()

    # ---- materialization (S10) --------------------------------------

    def to_numpy(self):
        """Collect to driver-side numpy arrays ``(xyz, time)`` with
        xyz shaped (n_frames, n_atoms, 3) float32 — the analog of the
        reference's ``to_mdtraj`` (core/dask_traj.py:390-404). Only
        for small trajectories, by definition."""
        import numpy as np

        n_frames, n_atoms = self.n_frames, self.n_atoms
        pdf = self.coords.toPandas()
        xyz = np.zeros((n_frames, n_atoms, 3), dtype=np.float32)
        fi = pdf["frame_id"].to_numpy()
        ai = pdf["atom_id"].to_numpy()
        xyz[fi, ai, 0] = pdf["x"].to_numpy()
        xyz[fi, ai, 1] = pdf["y"].to_numpy()
        xyz[fi, ai, 2] = pdf["z"].to_numpy()
        tpdf = self.frames.orderBy("frame_id").toPandas()
        return xyz, tpdf["time"].to_numpy()

    def to_mdtraj(self):
        """Materialize to an ``mdtraj.Trajectory`` when mdtraj is
        installed (reference S10, core/dask_traj.py:390-404) — the
        escape hatch to the wider MDTraj analysis surface. This
        container has no mdtraj; the import guard raises with a
        clear message while ``to_numpy`` remains always available."""
        try:
            import mdtraj  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "to_mdtraj requires the optional mdtraj dependency; "
                "use to_numpy() for raw arrays"
            ) from e
        import mdtraj as md
        import numpy as np

        xyz, time = self.to_numpy()
        topo = md.Topology()
        chain = topo.add_chain()
        res = topo.add_residue("UNK", chain)
        for i in range(xyz.shape[1]):
            topo.add_atom(f"A{i}", md.element.carbon, res)
        t = md.Trajectory(xyz, topo, time=np.asarray(time))
        return t

    def cache(self) -> "Trajectory":
        self.coords.cache()
        return self
