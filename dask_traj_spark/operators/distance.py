"""Distances, displacements, closest contact, centers (G1/G2/G5/G6/G7).

Each operator has two equivalent physical strategies (SURVEY.md §7.1):

- ``form="sql"`` — a declarative plan: broadcast the (tiny) pair
  table, semi-filter the coords fact table to the atoms referenced,
  self-join per frame, compute the displacement with codegen'd
  column expressions (MIC included — see ``mic.py``). Catalyst gets
  full pushdown/pruning visibility; used as the auditable
  cross-check and for small pair sets.
- ``form="vectorized"`` — the throughput path: pivot to wide
  per-frame rows (ONE shuffle), then ``mapInPandas`` runs the numpy
  kernels in ``kernels.py`` over Arrow batches; zero further
  shuffles; output is already long-format.

``form="auto"`` picks vectorized for ≥512 pairs.

The reference's equivalents: driver loops over frame-chunks wrapping
delayed numpy/C kernels (``geometry/distance.py:69-145`` distances,
``:202-279`` displacements, ``:299-337`` COM, ``:355-390`` COG,
``:393-464`` closest contact — single frame only there; ours does
all frames with a ``min_by`` aggregation, strictly more capable).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from dask_traj_spark import schemas
from dask_traj_spark.operators import kernels
from dask_traj_spark.operators.mic import (
    add_mic_displacement,
    add_mic_distance,
    orthogonality_expr,
)

_BOX_COLS = ["ax", "ay", "az", "bx", "by", "bz", "cx", "cy", "cz"]
_VECTORIZED_THRESHOLD = 512


# ---------------------------------------------------------------- helpers


def _normalize_indices(
    pairs, n_cols: int, n_atoms: int | None, name: str
) -> np.ndarray:
    """Validate an index set eagerly (P3: reference raises ValueError
    on out-of-range — distance.py:105-106, angle.py:95-96)."""
    arr = np.asarray(list(pairs) if not isinstance(pairs, np.ndarray) else pairs)
    if arr.size == 0:
        return arr.reshape(0, n_cols).astype(np.int32)
    if arr.ndim != 2 or arr.shape[1] != n_cols:
        raise ValueError(f"{name} must have shape (n, {n_cols}), got {arr.shape}")
    if not np.issubdtype(arr.dtype, np.integer):
        raise ValueError(f"{name} must be integers")
    if arr.min() < 0 or (n_atoms is not None and arr.max() >= n_atoms):
        raise ValueError(
            f"{name} contains atom indices outside [0, {n_atoms})"
        )
    return arr.astype(np.int32)


def _pairs_df(spark, arr: np.ndarray, cols: Sequence[str]) -> DataFrame:
    rows = [(int(i),) + tuple(int(v) for v in r) for i, r in enumerate(arr)]
    schema = ", ".join([f"{cols[0]} int"] + [f"{c} int" for c in cols[1:]])
    return spark.createDataFrame(rows, schema)


def _with_box(traj, df: DataFrame) -> DataFrame:
    """Join per-frame box vectors + the orthogonality predicate onto a
    frame-keyed DataFrame. The unitcell dimension has one row per
    frame — tiny relative to the fact table; an equi-join on
    frame_id that AQE turns into broadcast when it fits."""
    uc = traj.unitcell_full()
    sel = uc.select(
        "frame_id",
        *[F.col(c).cast("double").alias(c) for c in _BOX_COLS],
        orthogonality_expr(
            F.col("alpha").cast("double"),
            F.col("beta").cast("double"),
            F.col("gamma").cast("double"),
        ).alias("_ortho"),
    )
    return df.join(sel, "frame_id")


def _add_displacement(traj, df: DataFrame, use_box: bool) -> DataFrame:
    """Append MIC-aware displacement columns (_dx,_dy,_dz) to a df
    with x1..z2 (and join the box when periodic)."""
    df = df.withColumns(
        {
            "_dx": F.col("x2") - F.col("x1"),
            "_dy": F.col("y2") - F.col("y1"),
            "_dz": F.col("z2") - F.col("z1"),
        }
    )
    if not use_box:
        return df
    df = _with_box(traj, df)
    df = add_mic_displacement(df, "_dx", "_dy", "_dz", out=("_mx", "_my", "_mz"))
    return (
        df.drop("_dx", "_dy", "_dz", "_ortho", *_BOX_COLS)
        .withColumnsRenamed({"_mx": "_dx", "_my": "_dy", "_mz": "_dz"})
    )


# ------------------------------------------------------------ SQL forms


#: atom selections up to this many distinct ids become LITERAL scan
#: filters (between + isin) instead of a broadcast semi-join. A
#: literal predicate pushes below projections/generators all the way
#: to the source (parquet row-group stats via the between; derived
#: sources like the oracle's embeddings→explode prune BEFORE the
#: explode multiplies rows) — a semi-join can never be pushed into
#: the scan. Larger selections keep the broadcast semi-join.
_LITERAL_ATOM_FILTER_MAX = 4096


def _atom_selection(c: DataFrame, ids) -> DataFrame:
    ids = sorted({int(i) for i in ids})
    pred = F.col("atom_id").between(ids[0], ids[-1])
    if len(ids) < ids[-1] - ids[0] + 1:  # non-contiguous
        pred = pred & F.col("atom_id").isin(ids)
    return c.where(pred)


def _atom_role_restrict(c: DataFrame, ids) -> DataFrame:
    """Restrict coords to a driver-known atom id set: literal pushdown
    filter for small sets (see ``_LITERAL_ATOM_FILTER_MAX``), broadcast
    semi-join beyond."""
    uniq = np.unique(np.asarray(list(ids), dtype=np.int64))
    if len(uniq) <= _LITERAL_ATOM_FILTER_MAX:
        return _atom_selection(c, uniq)
    sel = F.broadcast(
        c.sparkSession.createDataFrame(
            [(int(i),) for i in uniq], "atom_id int"
        )
    )
    return c.join(sel, "atom_id", "left_semi")


def _pair_coords_sql(
    traj,
    pairs_df: DataFrame,
    a_col: str,
    b_col: str,
    id_col: str,
    ids_a=None,
    ids_b=None,
) -> DataFrame:
    """(frame_id, <id_col>, x1..z1, x2..z2) for every (frame, pair).

    Plan shape: coords ⋈ broadcast(pairs twice). The two joins key on
    atom_id (broadcast hash, no shuffle of the fact table), then the
    1↔2 sides meet on (frame_id, pair) — both sides restricted to
    referenced atoms first (literal scan filter when the selection is
    small — see ``_LITERAL_ATOM_FILTER_MAX`` — else broadcast
    semi-join) so the shuffle moves only the atoms the query touches,
    not the full fact table.
    """
    p = F.broadcast(pairs_df)
    c = traj.coords

    def restrict(col_name, ids):
        if ids is not None and len(set(map(int, ids))) <= _LITERAL_ATOM_FILTER_MAX:
            return _atom_selection(c, ids)
        sel = F.broadcast(pairs_df.select(F.col(col_name).alias("atom_id")).distinct())
        return c.join(sel, "atom_id", "left_semi")

    c1 = (
        restrict(a_col, ids_a)
        .join(p, F.col("atom_id") == F.col(a_col))
        .select(
            "frame_id",
            F.col(id_col),
            F.col(b_col).alias("_other"),
            F.col("x").cast("double").alias("x1"),
            F.col("y").cast("double").alias("y1"),
            F.col("z").cast("double").alias("z1"),
        )
    )
    c2 = restrict(b_col, ids_b).select(
        "frame_id",
        F.col("atom_id").alias("_other"),
        F.col("x").cast("double").alias("x2"),
        F.col("y").cast("double").alias("y2"),
        F.col("z").cast("double").alias("z2"),
    )
    return c1.join(c2, ["frame_id", "_other"]).drop("_other")


def _displacements_sql(
    traj, pairs_df: DataFrame, periodic: bool, arr=None
) -> DataFrame:
    use_box = periodic and traj.have_unitcell
    ids_a = arr[:, 0] if arr is not None else None
    ids_b = arr[:, 1] if arr is not None else None
    df = _pair_coords_sql(
        traj, pairs_df, "i", "j", "pair_id", ids_a=ids_a, ids_b=ids_b
    )
    df = _add_displacement(traj, df, use_box)
    return df.select(
        "frame_id",
        "pair_id",
        F.col("_dx").cast("float").alias("dx"),
        F.col("_dy").cast("float").alias("dy"),
        F.col("_dz").cast("float").alias("dz"),
    )


# ----------------------------------------------------- vectorized forms
#
# Input layout: traj.frame_packed() — long-format PRIMITIVE columns,
# frame-contiguous and (frame_id, atom_id)-sorted per partition.
# Primitive columns take Arrow's zero-boxing fast path across the
# JVM→Python boundary; ARRAY<FLOAT> columns do not (measured ~10×
# slower end-to-end — per-element boxing on the JVM side). The numpy
# reshape to (frames, atoms, 3) happens Python-side, where it's a
# single memcpy-shaped operation. The per-frame unitcell is tiny and
# rides along as a broadcast numpy lookup, not as joined columns on
# 10^8 rows.


#: frame count above which the vectorized feed JOINS box columns
#: onto the packed coords (broadcast hash join — preserves the
#: frame-contiguous partition layout the kernels require) instead of
#: collecting a per-frame lookup to the driver.  10^7 frames ≈
#: 600 MB of unitcell rows: fine to broadcast, NOT fine to
#: `toPandas()` through the driver on every operator call.
BOX_JOIN_FRAMES = 10_000_000


def _frame_count_hint(traj) -> int:
    """Frame count for dispatch decisions, as cheaply as possible.

    Order: the Trajectory's already-cached ``n_frames`` (free) → the
    per-frame dimension table's count (tiny, and exact — seeds the
    cache) → the (max-min+1) frame-id span over coords.  The span is
    a partial min/max aggregate — no shuffle, one scan, vs the exact
    distinct-count's hash-aggregate exchange — and is an UPPER bound
    when frame ids are sparse, which only biases dispatch toward the
    branch that scales (blocked gram / box-column join): the safe
    side to err on at scale."""
    nf = traj.__dict__.get("n_frames")
    if nf is not None:
        return nf
    if traj._frames is not None:
        nf = traj._frames.count()
        traj.__dict__["n_frames"] = nf  # exact: one row per frame
        return nf
    # the span is cached under its OWN key (never as n_frames — it is
    # an upper bound, not the exact count): without the cache every
    # periodic geometry call on a frames-less Trajectory would re-scan
    # the whole coords table for this one dispatch decision
    hint = traj.__dict__.get("_nf_span_hint")
    if hint is not None:
        return hint
    row = traj.coords.agg(
        F.min("frame_id").alias("lo"), F.max("frame_id").alias("hi")
    ).first()
    hint = 0 if row["hi"] is None else int(row["hi"]) - int(row["lo"]) + 1
    traj.__dict__["_nf_span_hint"] = hint
    return hint


class _BoxLookup:
    """Driver-collected per-frame box: frame_id → (3,3) vectors +
    orthogonality flag, queried with searchsorted inside kernels.

    Scale note: one row per frame (n_frames ≪ n_rows), used below
    ``BOX_JOIN_FRAMES``; past that, :func:`_packed_input`
    automatically joins the box columns onto the feed instead."""

    def __init__(self, ids, vecs, ortho):
        self.ids = ids
        self.vecs = vecs
        self.ortho = ortho

    @classmethod
    def from_traj(cls, traj):
        pdf = (
            traj.unitcell_full()
            .select("frame_id", *_BOX_COLS, "alpha", "beta", "gamma")
            .toPandas()
            .sort_values("frame_id")
        )
        ids = pdf["frame_id"].to_numpy()
        vecs = pdf[_BOX_COLS].to_numpy(dtype=np.float32).reshape(-1, 3, 3)
        ang = pdf[["alpha", "beta", "gamma"]].to_numpy(dtype=np.float32)
        return cls(ids, vecs, kernels.is_orthogonal_np(ang))

    def get(self, frame_ids):
        idx = np.searchsorted(self.ids, frame_ids)
        return self.vecs[idx], self.ortho[idx]


def _iter_frame_blocks(batches):
    """Regroup an Arrow-batch iterator into complete-frame pandas
    blocks: a frame straddling two batches is carried forward until
    its last row has arrived (input is frame-contiguous + sorted)."""
    import pandas as pd

    carry = None
    for pdf in batches:
        if len(pdf) == 0:
            continue
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        fids = pdf["frame_id"].to_numpy()
        cut = int(np.searchsorted(fids, fids[-1]))
        if cut > 0:
            yield pdf.iloc[:cut]
            carry = pdf.iloc[cut:].reset_index(drop=True)
        else:
            carry = pdf
    if carry is not None and len(carry):
        yield carry


def _block_arrays(block, box_lookup):
    """Complete-frame block → (frame_ids (B,), xyz (B, n_atoms, 3),
    box (B,3,3)|None, ortho (B,)|None).  The box comes from the
    driver-collected ``box_lookup`` when given, else from joined box
    COLUMNS riding on the block (the >``BOX_JOIN_FRAMES`` path —
    rows within a frame share their box, so the first row per frame
    is read), else no box (non-periodic)."""
    fids_all = block["frame_id"].to_numpy()
    fids, counts = np.unique(fids_all, return_counts=True)
    n_at = int(counts[0])
    if not (counts == n_at).all():
        raise ValueError(
            "frame blocks have unequal atom counts — the trajectory is "
            "not frame-packed (a packed=True Trajectory must have whole "
            f"frames per partition); counts={dict(zip(fids, counts))}"
        )
    xyz = np.stack(
        [
            block["x"].to_numpy(dtype=np.float32).reshape(-1, n_at),
            block["y"].to_numpy(dtype=np.float32).reshape(-1, n_at),
            block["z"].to_numpy(dtype=np.float32).reshape(-1, n_at),
        ],
        axis=-1,
    )
    if box_lookup is not None:
        box, ortho = box_lookup.get(fids)
        return fids, xyz, box, ortho
    if "ax" in block.columns:
        # box-column path: first row index of each (sorted) frame
        first = np.searchsorted(fids_all, fids)
        box = np.stack(
            [block[c].to_numpy(dtype=np.float32)[first] for c in _BOX_COLS],
            axis=-1,
        ).reshape(-1, 3, 3)
        ang = np.stack(
            [
                block[c].to_numpy(dtype=np.float32)[first]
                for c in ("alpha", "beta", "gamma")
            ],
            axis=-1,
        )
        return fids, xyz, box, kernels.is_orthogonal_np(ang)
    return fids, xyz, None, None


def _packed_input(
    traj,
    periodic: bool,
    atoms: np.ndarray | None = None,
):
    """The vectorized feed: frame-packed coords, optionally
    semi-filtered to the atoms the index set actually references
    (pushdown-friendly JVM-side predicate — with 500 of 22k atoms
    selected this cuts the Arrow feed ~45×), projected to the 4
    columns the kernel reads.

    Returns (feed_df, box_lookup).  The box rides as a driver-
    collected per-frame lookup below ``BOX_JOIN_FRAMES`` frames;
    past that the lookup's `toPandas()` would materialize n_frames
    rows through the driver on every call, so the unitcell columns
    are instead BROADCAST-joined onto the feed (a map-side hash
    join — the frame-contiguous partition layout the kernels
    require survives; a shuffle join would not preserve it, which
    is why the join is pinned broadcast) and ``box_lookup`` comes
    back None with :func:`_block_arrays` reading the columns.

    When ``atoms`` is given the caller must remap its indices to
    positions in the sorted unique atom list (np.searchsorted) —
    frames in the feed then contain exactly those atoms in sorted
    order.
    """
    use_box = periodic and traj.have_unitcell
    box_join = use_box and _frame_count_hint(traj) > BOX_JOIN_FRAMES
    lookup = _BoxLookup.from_traj(traj) if use_box and not box_join else None
    feed = traj.frame_packed()
    if atoms is not None:
        lo, hi = int(atoms[0]), int(atoms[-1])
        # np.array_equal against the full arange, not just a span-size
        # check: an unsorted or duplicated input whose span happens to
        # equal its length (e.g. [1, 2, 2, 4]) must NOT take the
        # BETWEEN path — it would feed extra atoms into the packed
        # frames and positional reshaping downstream would
        # misattribute them (ADVICE r4).
        if np.array_equal(atoms, np.arange(lo, hi + 1)):
            # contiguous selection → a BETWEEN range predicate instead
            # of an N-element IN list: ranges prune parquet row groups
            # AND in-memory-cache batches via min/max stats (an IN list
            # is evaluated row-at-a-time on every cached batch), and
            # the common selections (leading protein atoms, residue
            # blocks) are contiguous
            feed = feed.filter(F.col("atom_id").between(lo, hi))
        else:
            feed = feed.filter(F.col("atom_id").isin([int(a) for a in atoms]))
    if box_join:
        uc = traj.unitcell_full().select(
            "frame_id",
            *[F.col(c).cast("float").alias(c) for c in _BOX_COLS],
            *[
                F.col(c).cast("float").alias(c)
                for c in ("alpha", "beta", "gamma")
            ],
        )
        feed = feed.join(F.broadcast(uc), "frame_id").select(
            "frame_id", "x", "y", "z", *_BOX_COLS, "alpha", "beta", "gamma"
        )
        return feed, None
    return feed.select("frame_id", "x", "y", "z"), lookup


def _vectorized_pair_op(
    traj, arr: np.ndarray, periodic: bool, want_vectors: bool, wide_output: bool = False
) -> DataFrame:
    import pandas as pd

    sel = np.unique(arr)
    packed, lookup = _packed_input(traj, periodic, atoms=sel)
    remapped = np.searchsorted(sel, arr).astype(np.int32)
    sc = traj.spark.sparkContext
    b_pairs = sc.broadcast(remapped)
    b_lookup = sc.broadcast(lookup)
    n_pairs = len(arr)

    def gen(batches):
        pi = b_pairs.value[:, 0]
        pj = b_pairs.value[:, 1]
        for block in _iter_frame_blocks(batches):
            fids, xyz, box, ortho = _block_arrays(block, b_lookup.value)
            if wide_output and not want_vectors:
                d = kernels.distances_np(xyz, pi, pj, box, ortho)
                yield pd.DataFrame({"frame_id": fids, "dists": list(d)})
                continue
            frames = np.repeat(fids, n_pairs)
            pids = np.tile(np.arange(n_pairs, dtype=np.int32), len(fids))
            if want_vectors:
                d = kernels.displacements_np(xyz, pi, pj, box, ortho)
                yield pd.DataFrame(
                    {
                        "frame_id": frames,
                        "pair_id": pids,
                        "dx": d[..., 0].ravel(),
                        "dy": d[..., 1].ravel(),
                        "dz": d[..., 2].ravel(),
                    }
                )
            else:
                d = kernels.distances_np(xyz, pi, pj, box, ortho)
                yield pd.DataFrame(
                    {"frame_id": frames, "pair_id": pids, "dist": d.ravel()}
                )

    if wide_output and not want_vectors:
        schema = schemas.DISTANCES_WIDE_SCHEMA
    else:
        schema = schemas.DISPLACEMENTS_SCHEMA if want_vectors else schemas.DISTANCES_SCHEMA
    return packed.mapInPandas(gen, schema=schema)


# ------------------------------------------------------------ public API


def compute_distances(
    traj,
    atom_pairs: Iterable,
    periodic: bool = True,
    form: str = "auto",
    n_atoms: int | None = None,
    wide_output: bool = False,
) -> DataFrame:
    """Euclidean distance per (frame, atom-pair), optional MIC.

    Returns DataFrame(frame_id, pair_id, dist FLOAT); pair_id is the
    position in ``atom_pairs``. With ``wide_output=True`` (vectorized
    form only) returns (frame_id, dists ARRAY<FLOAT>) — one row per
    frame, the reference's native result shape. Reference:
    compute_distances, geometry/distance.py:69-145.
    """
    arr = _normalize_indices(atom_pairs, 2, n_atoms or traj.n_atoms, "atom_pairs")
    if len(arr) == 0:  # P4 empty short-circuit (distance.py:107-108)
        return traj.spark.createDataFrame([], schemas.DISTANCES_SCHEMA)
    if form == "auto":
        form = "vectorized" if len(arr) >= _VECTORIZED_THRESHOLD else "sql"
    if form == "vectorized":
        return _vectorized_pair_op(
            traj, arr, periodic, want_vectors=False, wide_output=wide_output
        )
    pairs_df = _pairs_df(traj.spark, arr, ["pair_id", "i", "j"])
    if periodic and traj.have_unitcell:
        # distance-only MIC fast path: min(d2) via codegen'd least()
        # instead of the interpreted 27-image argmin HOF
        df = _pair_coords_sql(
            traj, pairs_df, "i", "j", "pair_id",
            ids_a=arr[:, 0], ids_b=arr[:, 1],
        ).withColumns(
            {
                "_dx": F.col("x2") - F.col("x1"),
                "_dy": F.col("y2") - F.col("y1"),
                "_dz": F.col("z2") - F.col("z1"),
            }
        )
        df = add_mic_distance(
            _with_box(traj, df), "_dx", "_dy", "_dz", out="_dist"
        )
        return df.select("frame_id", "pair_id", F.col("_dist").alias("dist"))
    d = _displacements_sql(traj, pairs_df, periodic, arr=arr)
    # x*x, not pow(x,2) — exact-rounded, bit-reproducible vs the oracle
    sq = lambda c: F.col(c).cast("double") * F.col(c).cast("double")  # noqa: E731
    dist = F.sqrt(sq("dx") + sq("dy") + sq("dz"))
    return d.select("frame_id", "pair_id", dist.cast("float").alias("dist"))


def compute_displacements(
    traj,
    atom_pairs: Iterable,
    periodic: bool = True,
    form: str = "auto",
    n_atoms: int | None = None,
) -> DataFrame:
    """Displacement vector r_j − r_i per (frame, pair), optional MIC.

    Returns DataFrame(frame_id, pair_id, dx, dy, dz FLOAT).
    Reference: compute_displacements, geometry/distance.py:202-279.
    """
    arr = _normalize_indices(atom_pairs, 2, n_atoms or traj.n_atoms, "atom_pairs")
    if len(arr) == 0:
        return traj.spark.createDataFrame([], schemas.DISPLACEMENTS_SCHEMA)
    if form == "auto":
        form = "vectorized" if len(arr) >= _VECTORIZED_THRESHOLD else "sql"
    if form == "vectorized":
        return _vectorized_pair_op(traj, arr, periodic, want_vectors=True)
    pairs_df = _pairs_df(traj.spark, arr, ["pair_id", "i", "j"])
    return _displacements_sql(traj, pairs_df, periodic, arr=arr)


def compute_center_of_mass(traj, topology: DataFrame | None = None) -> DataFrame:
    """Mass-weighted mean position per frame → (frame_id, x, y, z
    DOUBLE). A pure partial+final aggregation: the map-side combine
    collapses n_atoms rows to one per frame before any exchange.
    Reference: geometry/distance.py:282-337 (float64 accumulation,
    masses normalized to sum 1 — :319-320)."""
    top = topology if topology is not None else traj.topology
    if top is None:
        raise ValueError("compute_center_of_mass requires a topology with masses")
    m = F.broadcast(top.select("atom_id", F.col("mass").cast("double").alias("mass")))
    j = traj.coords.join(m, "atom_id")
    return (
        j.groupBy("frame_id")
        .agg(
            (F.sum(F.col("x").cast("double") * F.col("mass")) / F.sum("mass")).alias("x"),
            (F.sum(F.col("y").cast("double") * F.col("mass")) / F.sum("mass")).alias("y"),
            (F.sum(F.col("z").cast("double") * F.col("mass")) / F.sum("mass")).alias("z"),
        )
    )


def compute_center_of_geometry(traj) -> DataFrame:
    """Unweighted mean position per frame → (frame_id, x, y, z
    DOUBLE). Reference: geometry/distance.py:340-390."""
    return traj.coords.groupBy("frame_id").agg(
        F.avg(F.col("x").cast("double")).alias("x"),
        F.avg(F.col("y").cast("double")).alias("y"),
        F.avg(F.col("z").cast("double")).alias("z"),
    )


def find_closest_contact(
    traj,
    group1: Iterable[int],
    group2: Iterable[int],
    frame: int | None = None,
    periodic: bool = True,
) -> DataFrame:
    """Closest atom pair between two groups → (frame_id, i, j, dist).

    The reference computes a single frame only and calls this shape
    its worst case (geometry/distance.py:393-464, note :452-454);
    relationally it is a per-frame cross join of two tiny filtered
    sets followed by a ``min_by`` — we generalize to all frames
    (``frame=None``) and the aggregation is partial+final, so it
    scales with n_frames, not with driver round-trips.
    Ties break deterministically on (dist, i, j).
    """
    g1 = sorted({int(a) for a in group1})
    g2 = sorted({int(a) for a in group2})
    if not g1 or not g2:
        raise ValueError("find_closest_contact requires non-empty groups")
    c = traj.coords
    if frame is not None:
        c = c.filter(F.col("frame_id") == frame)
    c1 = c.filter(F.col("atom_id").isin(g1)).select(
        "frame_id",
        F.col("atom_id").alias("i"),
        F.col("x").cast("double").alias("x1"),
        F.col("y").cast("double").alias("y1"),
        F.col("z").cast("double").alias("z1"),
    )
    c2 = c.filter(F.col("atom_id").isin(g2)).select(
        "frame_id",
        F.col("atom_id").alias("j"),
        F.col("x").cast("double").alias("x2"),
        F.col("y").cast("double").alias("y2"),
        F.col("z").cast("double").alias("z2"),
    )
    df = c1.join(c2, "frame_id")
    use_box = periodic and traj.have_unitcell
    df = _add_displacement(traj, df, use_box)
    dist = F.sqrt(
        F.col("_dx") * F.col("_dx")
        + F.col("_dy") * F.col("_dy")
        + F.col("_dz") * F.col("_dz")
    )
    scored = df.select("frame_id", "i", "j", dist.alias("dist"))
    best = (
        scored.groupBy("frame_id")
        .agg(F.min(F.struct("dist", "i", "j")).alias("best"))
        .select(
            "frame_id",
            F.col("best.i").alias("i"),
            F.col("best.j").alias("j"),
            F.col("best.dist").cast("float").alias("dist"),
        )
    )
    return best


def compute_radius_of_gyration(traj, topology: DataFrame | None = None) -> DataFrame:
    """Mass-weighted radius of gyration per frame → (frame_id, rg
    DOUBLE): Rg² = Σmᵢ|rᵢ−com|²/Σm, computed from sufficient
    statistics (Σm·r², Σm·r, Σm) so it is ONE partial+final
    aggregation — no com join-back, no second pass over coords.
    Beyond-reference (the reference has no Rg; mdtraj's
    ``compute_rg`` is the public API shape being matched)."""
    top = topology if topology is not None else traj.topology
    if top is None:
        raise ValueError("compute_radius_of_gyration requires a topology with masses")
    m = F.broadcast(top.select("atom_id", F.col("mass").cast("double").alias("mass")))
    x, y, z = (F.col(c).cast("double") for c in ("x", "y", "z"))
    j = traj.coords.join(m, "atom_id")
    agg = j.groupBy("frame_id").agg(
        F.sum(F.col("mass") * (x * x + y * y + z * z)).alias("srr"),
        F.sum(F.col("mass") * x).alias("sx"),
        F.sum(F.col("mass") * y).alias("sy"),
        F.sum(F.col("mass") * z).alias("sz"),
        F.sum("mass").alias("sm"),
    )
    cx, cy, cz = (F.col(c) / F.col("sm") for c in ("sx", "sy", "sz"))
    rg2 = F.col("srr") / F.col("sm") - (cx * cx + cy * cy + cz * cz)
    return agg.select("frame_id", F.sqrt(F.greatest(rg2, F.lit(0.0))).alias("rg"))


def rdf_histogram(
    traj,
    atom_pairs: Iterable,
    bin_width: float = 1.0 / 64.0,
    periodic: bool = False,
    n_atoms: int | None = None,
) -> DataFrame:
    """Radial distribution histogram: pair distances bucketed into
    ``bin_width`` shells → (bin BIGINT, r_lo DOUBLE, n_pairs BIGINT),
    summed over all frames.  The classic MD structure analysis — one
    distances plan (same operator as G1) plus one partial+final
    aggregate on the bin id; with a dyadic ``bin_width`` the floor
    is engine-exact.  Beyond-reference (mdtraj ``compute_rdf`` shape,
    un-normalized counts — normalization constants are a driver-side
    multiply)."""
    d = compute_distances(traj, atom_pairs, periodic=periodic, n_atoms=n_atoms)
    inv = 1.0 / float(bin_width)
    b = F.floor(F.col("dist").cast("double") * F.lit(inv)).cast("long")
    return (
        d.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "bin",
            (F.col("bin").cast("double") * F.lit(float(bin_width))).alias("r_lo"),
            "n_pairs",
        )
    )


def neighbor_pairs(traj, cutoff: float, n_atoms: int | None = None) -> DataFrame:
    """All atom pairs within ``cutoff`` per frame WITHOUT enumerating
    the O(n²) pair list — the cell-list spatial self-join every
    neighbor-search / contact-map workload needs at scale.

    Atoms are binned into cubic cells of edge ``cutoff``; a pair can
    only be within range if its cells differ by ≤1 in every axis, so
    one side explodes to its 27 neighboring cells and the join is a
    plain equi-join on (frame_id, cell).  Each candidate pair matches
    EXACTLY once (the unique offset = cell_i − cell_j), so no
    dedup pass is needed; the exact distance filter then trims the
    shell corners.  Cost is O(n · local density), one shuffle on
    (frame, cell) — vs the O(n²) broadcast-pairs join of
    ``compute_distances``, which is the right tool only for a
    driver-enumerated pair list.

    Returns (frame_id, i, j, dist FLOAT) with i < j, non-periodic
    (minimum-image neighbor lists additionally shift the 27 offsets
    by the box vectors; same plan shape).  Value path matches G1:
    float32 components, float32 final sqrt.
    """
    c = traj.coords
    inv = 1.0 / float(cutoff)
    cell = lambda col: F.floor(F.col(col).cast("double") * F.lit(inv)).cast("long")  # noqa: E731
    base = c.select(
        "frame_id",
        F.col("atom_id"),
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
        F.col("z").cast("double").alias("z"),
        cell("x").alias("cx"),
        cell("y").alias("cy"),
        cell("z").alias("cz"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"), F.lit(dz).alias("oz"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)
        ]
    )
    left = base.select(
        "frame_id",
        F.col("atom_id").alias("i"),
        F.col("x").alias("x1"),
        F.col("y").alias("y1"),
        F.col("z").alias("z1"),
        "cx", "cy", "cz",
    )
    right = (
        base.select(
            "frame_id",
            F.col("atom_id").alias("j"),
            F.col("x").alias("x2"),
            F.col("y").alias("y2"),
            F.col("z").alias("z2"),
            F.explode(offsets).alias("o"),
            "cx", "cy", "cz",
        )
        .select(
            "frame_id", "j", "x2", "y2", "z2",
            (F.col("cx") + F.col("o.ox")).alias("cx"),
            (F.col("cy") + F.col("o.oy")).alias("cy"),
            (F.col("cz") + F.col("o.oz")).alias("cz"),
        )
    )
    cand = left.join(right, ["frame_id", "cx", "cy", "cz"]).where(
        F.col("i") < F.col("j")
    )
    fx = (F.col("x2") - F.col("x1")).cast("float").cast("double")
    fy = (F.col("y2") - F.col("y1")).cast("float").cast("double")
    fz = (F.col("z2") - F.col("z1")).cast("float").cast("double")
    dist = F.sqrt(fx * fx + fy * fy + fz * fz).cast("float")
    return (
        cand.select("frame_id", "i", "j", dist.alias("dist"))
        .where(F.col("dist") <= F.lit(float(cutoff)).cast("float"))
    )


def mean_squared_displacement(traj, max_lag: int) -> DataFrame:
    """MSD(τ) = ⟨|r(t+τ) − r(t)|²⟩ over atoms and start frames, for
    τ = 1..max_lag → (lag BIGINT, n_samples BIGINT, msd DOUBLE) —
    the diffusion analysis every MD workflow runs.

    Plan shape: a BANDED time-lag self-join — one side explodes its
    ``max_lag`` target frames (O(rows·L), L small), the other joins
    on the (atom_id, frame_id) equi-key; partial+final average per
    lag.  No per-lag rescan of the trajectory and no all-(t,t')
    quadratic join — the explode bounds the band exactly like the
    binned range join in rangejoin.py."""
    c = traj.coords.select(
        "atom_id",
        "frame_id",
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
        F.col("z").cast("double").alias("z"),
    )
    lags = F.sequence(F.lit(1), F.lit(int(max_lag)))
    origin = c.select(
        "atom_id",
        "x", "y", "z",
        F.explode(lags).alias("lag"),
        (F.col("frame_id") + F.col("lag")).alias("tf"),
    )
    target = c.select(
        F.col("atom_id").alias("t_atom"),
        F.col("frame_id").alias("t_frame"),
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
        F.col("z").alias("z2"),
    )
    dx = F.col("x2") - F.col("x")
    dy = F.col("y2") - F.col("y")
    dz = F.col("z2") - F.col("z")
    return (
        origin.join(
            target,
            (F.col("atom_id") == F.col("t_atom")) & (F.col("tf") == F.col("t_frame")),
        )
        .groupBy(F.col("lag").cast("long").alias("lag"))
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.avg(dx * dx + dy * dy + dz * dz).alias("msd"),
        )
    )


def velocity_autocorrelation(traj, max_lag: int) -> DataFrame:
    """VACF(τ) = ⟨v(t)·v(t+τ)⟩ over atoms and start frames for
    τ = 0..max_lag → (lag BIGINT, n_samples BIGINT, vacf DOUBLE),
    with v(t) = r(t+1) − r(t) (forward finite difference — the
    standard estimator when the source stores only positions).

    Plan shape: ONE window (partition atom_id, order frame_id) builds
    the velocity series with ``lead`` — a single shuffle keyed on
    atom_id, each partition a bounded per-atom time series — then the
    same banded time-lag self-join as ``mean_squared_displacement``
    (explode ≤max_lag+1 target frames, equi-join, partial+final
    average).  Velocity components are exact dyadic differences, so
    their dot products aggregate order-independently (oracle-gate
    requirement)."""
    from pyspark.sql import Window

    c = traj.coords.select(
        "atom_id",
        "frame_id",
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
        F.col("z").cast("double").alias("z"),
    )
    w = Window.partitionBy("atom_id").orderBy("frame_id")
    v = c.select(
        "atom_id",
        "frame_id",
        (F.lead("x").over(w) - F.col("x")).alias("vx"),
        (F.lead("y").over(w) - F.col("y")).alias("vy"),
        (F.lead("z").over(w) - F.col("z")).alias("vz"),
    ).where(F.col("vx").isNotNull())
    lags = F.sequence(F.lit(0), F.lit(int(max_lag)))
    origin = v.select(
        "atom_id",
        "vx", "vy", "vz",
        F.explode(lags).alias("lag"),
        (F.col("frame_id") + F.col("lag")).alias("tf"),
    )
    target = v.select(
        F.col("atom_id").alias("t_atom"),
        F.col("frame_id").alias("t_frame"),
        F.col("vx").alias("wx"),
        F.col("vy").alias("wy"),
        F.col("vz").alias("wz"),
    )
    dot = (
        F.col("vx") * F.col("wx")
        + F.col("vy") * F.col("wy")
        + F.col("vz") * F.col("wz")
    )
    return (
        origin.join(
            target,
            (F.col("atom_id") == F.col("t_atom")) & (F.col("tf") == F.col("t_frame")),
        )
        .groupBy(F.col("lag").cast("long").alias("lag"))
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.avg(dot).alias("vacf"),
        )
    )


_TWO_PI_3 = 2.0943951023931953  # 2*pi/3, exact double literal both engines


def gyration_tensor(traj, topology: DataFrame | None = None,
                    _round6_double: bool = False) -> DataFrame:
    """Per-frame gyration-tensor shape analysis → (frame_id, rg2,
    lambda1, lambda2, lambda3, asphericity, acylindricity):
    S = (1/M)·Σ mᵢ(rᵢ−com)(rᵢ−com)ᵀ assembled from ONE
    partial+final aggregation of the 6 second moments + 3 first
    moments + mass, eigenvalues by the closed-form symmetric-3×3
    (Cardano) solution — λ₁ ≥ λ₂ ≥ λ₃, asphericity b = λ₁−(λ₂+λ₃)/2,
    acylindricity c = λ₂−λ₃ (the polymer-physics shape descriptors;
    mdtraj computes the same tensor in ``compute_gyration_tensor``).

    Everything up to the Cardano angle is exact-or-correctly-rounded
    arithmetic on dyadic-grid inputs (bit-identical across engines);
    acos/cos are transcendental, so gated callers pass
    ``_round6_double`` to round λ₁/λ₃ at 1e-6 (policy item 3) — λ₂
    is recovered as trace−λ₁−λ₃ so the triple still sums exactly to
    rg².  Degenerate frames (p = 0: single atom, perfect isotropy)
    short-circuit to λ = trace/3.

    100-TB posture: one agg keyed on frame_id; the eigen math is 21
    scalar expressions per frame row, fused in codegen."""
    top = topology if topology is not None else traj.topology
    if top is None:
        raise ValueError("gyration_tensor requires a topology with masses")
    m = F.broadcast(top.select("atom_id", F.col("mass").cast("double").alias("mass")))
    x, y, z = (F.col(c).cast("double") for c in ("x", "y", "z"))
    w = F.col("mass")
    agg = traj.coords.join(m, "atom_id").groupBy("frame_id").agg(
        F.sum(w * x * x).alias("sxx"), F.sum(w * y * y).alias("syy"),
        F.sum(w * z * z).alias("szz"), F.sum(w * x * y).alias("sxy"),
        F.sum(w * x * z).alias("sxz"), F.sum(w * y * z).alias("syz"),
        F.sum(w * x).alias("sx"), F.sum(w * y).alias("sy"),
        F.sum(w * z).alias("sz"), F.sum(w).alias("sm"),
    )
    cx, cy, cz = (F.col(c) / F.col("sm") for c in ("sx", "sy", "sz"))
    df = agg.withColumns(
        {
            "s11": F.col("sxx") / F.col("sm") - cx * cx,
            "s22": F.col("syy") / F.col("sm") - cy * cy,
            "s33": F.col("szz") / F.col("sm") - cz * cz,
            "s12": F.col("sxy") / F.col("sm") - cx * cy,
            "s13": F.col("sxz") / F.col("sm") - cx * cz,
            "s23": F.col("syz") / F.col("sm") - cy * cz,
        }
    )
    tr = F.col("s11") + F.col("s22") + F.col("s33")
    mean = tr / 3.0
    df = df.withColumns(
        {
            "b11": F.col("s11") - mean, "b22": F.col("s22") - mean,
            "b33": F.col("s33") - mean, "tr": tr,
        }
    )
    sq = lambda c: F.col(c) * F.col(c)  # noqa: E731
    p2 = (
        sq("b11") + sq("b22") + sq("b33")
        + 2.0 * (sq("s12") + sq("s13") + sq("s23"))
    ) / 6.0
    det_b = (
        F.col("b11") * (F.col("b22") * F.col("b33") - sq("s23"))
        - F.col("s12") * (F.col("s12") * F.col("b33") - F.col("s23") * F.col("s13"))
        + F.col("s13") * (F.col("s12") * F.col("s23") - F.col("b22") * F.col("s13"))
    )
    df = df.withColumns({"p2": p2, "detb": det_b})
    p = F.sqrt(F.col("p2"))
    q = F.greatest(
        F.lit(-1.0),
        F.least(F.lit(1.0), F.col("detb") / (2.0 * F.col("p2") * p)),
    )
    phi = F.acos(q) / 3.0
    rnd = (lambda c: F.round(c, 6)) if _round6_double else (lambda c: c)
    m3 = F.col("tr") / 3.0
    l1_raw = m3 + 2.0 * p * F.cos(phi)
    l3_raw = m3 + 2.0 * p * F.cos(phi + F.lit(_TWO_PI_3))
    degenerate = F.col("p2") <= F.lit(0.0)
    l1 = F.when(degenerate, m3).otherwise(rnd(l1_raw))
    l3 = F.when(degenerate, m3).otherwise(rnd(l3_raw))
    df = df.withColumns({"l1": l1, "l3": l3})
    l2 = F.col("tr") - F.col("l1") - F.col("l3")
    return df.select(
        "frame_id",
        F.col("tr").alias("rg2"),
        F.col("l1").alias("lambda1"),
        l2.alias("lambda2"),
        F.col("l3").alias("lambda3"),
        (F.col("l1") - (l2 + F.col("l3")) / 2.0).alias("asphericity"),
        (l2 - F.col("l3")).alias("acylindricity"),
    )


def native_contact_fraction(
    traj,
    atom_pairs: Iterable,
    r_cut: float = 0.5,
    lam: float = 1.25,
    ref_frame: int = 0,
    periodic: bool = False,
    n_atoms: int | None = None,
) -> DataFrame:
    """Fraction of native contacts Q(t) per frame → (frame_id,
    n_native, n_formed, q): the reference contact set is every pair
    closer than ``r_cut`` in ``ref_frame``; a contact counts as
    formed at frame t when its distance is below ``lam·r_cut``
    (the simplified Best-Hummer Q — the folding/order-parameter
    analysis; reference users run it through ``to_mdtraj``).

    Pass dyadic ``r_cut``/``lam·r_cut`` (0.5 and 0.625 by default)
    so threshold comparisons on float32 distances cannot straddle
    engine rounding.

    Plan shape: ONE distance computation over all (pair, frame)
    rows; the reference set is a self-filter of that result
    broadcast back onto it (pair_id equi-join, no shuffle of the
    distance stream); one partial+final agg per frame."""
    d = compute_distances(
        traj, atom_pairs, periodic=periodic, form="sql", n_atoms=n_atoms
    )
    ref = F.broadcast(
        d.where(
            (F.col("frame_id") == int(ref_frame))
            & (F.col("dist") < float(r_cut))
        ).select("pair_id")
    )
    formed = (F.col("dist") < float(lam) * float(r_cut)).cast("long")
    return (
        d.join(ref, "pair_id")
        .groupBy("frame_id")
        .agg(
            F.count(F.lit(1)).alias("n_native"),
            F.sum(formed).alias("n_formed"),
        )
        .select(
            "frame_id",
            "n_native",
            "n_formed",
            (
                F.col("n_formed").cast("double")
                / F.col("n_native").cast("double")
            ).alias("q"),
        )
    )


ACF_GRID = 1048576.0  # 2^-20 snap — products exact, sums order-free


def scalar_autocorrelation(
    series: DataFrame,
    value_col: str,
    max_lag: int,
    key_col: str = "frame_id",
) -> DataFrame:
    """Time-autocorrelation SUFFICIENT STATISTICS of a per-frame
    scalar → (lag, n, sum_ab, sum_a, sum_b) for lag 0..max_lag:
    the banded lag self-join pattern (x9/x12) applied to a derived
    series.  Values are snapped to the 2^-20 dyadic grid FIRST, so
    every product and sum is exact and partial-agg order cannot
    perturb the result (the t9 trick); the centered ACF
    (sum_ab − sum_a·sum_b/n) / n follows from the emitted columns.

    100-TB posture: the series is one row per frame (≪ the fact
    table); the banded join and agg are over n_frames·L rows."""
    q = (
        F.round(F.col(value_col).cast("double") * ACF_GRID, 0) / ACF_GRID
    ).alias("v")
    s = series.select(F.col(key_col).alias("t"), q)
    lags = F.sequence(F.lit(0), F.lit(int(max_lag)))
    origin = s.select(
        "t", F.col("v").alias("va"),
        F.explode(lags).alias("lag"),
        (F.col("t") + F.col("lag")).alias("tt"),
    )
    target = s.select(F.col("t").alias("t2"), F.col("v").alias("vb"))
    return (
        origin.join(target, F.col("tt") == F.col("t2"))
        .groupBy(F.col("lag").cast("long").alias("lag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("va") * F.col("vb")).alias("sum_ab"),
            F.sum("va").alias("sum_a"),
            F.sum("vb").alias("sum_b"),
        )
    )


def rg_autocorrelation(traj, max_lag: int) -> DataFrame:
    """Autocorrelation statistics of the radius-of-gyration time
    series — the order-parameter relaxation analysis (how long a
    conformational size fluctuation persists): x4's one-agg Rg per
    frame feeds ``scalar_autocorrelation``."""
    rg = compute_radius_of_gyration(traj)
    return scalar_autocorrelation(rg, "rg", max_lag)


def block_average_stats(
    series: DataFrame,
    value_col: str,
    block_sizes: "list[int]",
    key_col: str = "frame_id",
) -> DataFrame:
    """Block-averaging sufficient statistics (Flyvbjerg & Petersen's
    error-analysis scheme, public J. Chem. Phys. 1989) →
    (block_size, n_blocks, sum_m, sum_m2): the 2^-20-snapped series
    is cut into consecutive blocks of each POWER-OF-TWO size, each
    complete block contributes its mean m; SEM(B) and the statistical
    inefficiency follow from the emitted sums driver-side.

    Exactness: block sizes must be powers of two so the block-mean
    division (sum/2^k) is exact on the dyadic grid — then every
    emitted aggregate is an exact sum, partial-agg-order independent
    (the t9/x15 discipline).  Incomplete trailing blocks are
    dropped, matching the textbook estimator.

    100-TB posture: one explode of the per-frame series (rows =
    n_frames × |block_sizes|) and two keyed aggs — the series is
    already ≪ the fact table."""
    for b in block_sizes:
        if b < 1 or (b & (b - 1)):
            raise ValueError(f"block sizes must be powers of two, got {b}")
    q = (
        F.round(F.col(value_col).cast("double") * ACF_GRID, 0) / ACF_GRID
    ).alias("v")
    s = series.select(F.col(key_col).alias("t"), q)
    expanded = s.select(
        "t", "v",
        F.explode(F.array(*[F.lit(int(b)) for b in block_sizes])).alias("bsz"),
    )
    blocks = (
        expanded.groupBy("bsz", F.floor(F.col("t") / F.col("bsz")).alias("blk"))
        .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") == F.col("bsz"))  # complete blocks only
        .select("bsz", (F.col("sv") / F.col("bsz")).alias("m"))
    )
    return blocks.groupBy(F.col("bsz").cast("long").alias("block_size")).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("m").alias("sum_m"),
        F.sum(F.col("m") * F.col("m")).alias("sum_m2"),
    )


def _sasa_sphere_offsets(radius: float, n_points: int):
    """Deterministic golden-spiral unit-sphere points scaled by
    ``radius`` and snapped to the 2^-12 grid — dyadic constants, so
    point positions (atom + offset) and all occlusion distances stay
    exact in both engines."""
    import math

    pts = []
    phi = math.pi * (3.0 - math.sqrt(5.0))
    for k in range(n_points):
        y = 1.0 - 2.0 * (k + 0.5) / n_points
        r = math.sqrt(max(0.0, 1.0 - y * y))
        th = phi * k
        pts.append((math.cos(th) * r, y, math.sin(th) * r))
    q = lambda v: round(v * float(radius) * 4096.0) / 4096.0  # noqa: E731
    return [(i, q(x), q(y), q(z)) for i, (x, y, z) in enumerate(pts)]


def sasa_exposure(
    traj, radius: float = 0.03125, n_points: int = 32
) -> DataFrame:
    """Shrake–Rupley-style solvent-exposure counting (public
    Shrake & Rupley, J. Mol. Biol. 1973 — mdtraj's
    ``shrake_rupley``) → (frame_id, atom_id, n_points, n_exposed):
    place ``n_points`` sphere points at ``radius`` around every
    atom; a point is EXPOSED iff no other atom's center lies
    strictly within ``radius`` of it.  Exposed fraction × sphere
    area is the per-atom SASA; emitting integer COUNTS keeps the
    gate exact (π never enters the compared values).

    Exactness: sphere offsets are 2^-12-grid constants, so point
    positions and every occlusion d² are exact dyadic values —
    the strict `<` comparison is engine-identical.

    Scale posture: occluders are pruned with the cell-list
    ``neighbor_pairs`` at cutoff 2·radius (triangle inequality: a
    center ≥ 2r away can never reach a point strictly within r), so
    cost is O(n_atoms · n_points · local density) — never the
    O(n²·points) brute force the oracle runs at gate scale."""
    rr = float(radius)
    pts = _sasa_sphere_offsets(rr, n_points)
    spark = traj.coords.sparkSession
    pdf = F.broadcast(
        spark.createDataFrame(pts, "pt int, ox double, oy double, oz double")
    )
    q = lambda c: F.round(F.col(c).cast("double") * 4096, 0) / 4096  # noqa: E731
    atoms = traj.coords.select(
        "frame_id", "atom_id", q("x").alias("x"), q("y").alias("y"),
        q("z").alias("z"),
    )
    # padded prune cutoff (ADVICE r5): the grid-snapped offsets can
    # reach |offset| ≤ r + √3/8192, so the triangle-inequality bound
    # is 2r + √3/8192, not 2r — an occluder in that band (or one
    # nudged across the cutoff by float32 rounding in the cell-list
    # distance) would be wrongly pruned and overcount n_exposed.
    # √3/4096 doubles the band: inclusion is always safe, the exact
    # dyadic d² < r² test below decides.
    nb = neighbor_pairs(traj, cutoff=2.0 * rr + 3.0 ** 0.5 / 4096.0)
    # symmetric neighbor list (i sees j AND j sees i) via ONE explode
    # pass — a self-union here would evaluate the whole cell-list
    # neighbor join once per branch
    nbs = nb.select(
        "frame_id",
        F.explode(
            F.array(
                F.struct(F.col("i").alias("atom_id"), F.col("j").alias("nbid")),
                F.struct(F.col("j").alias("atom_id"), F.col("i").alias("nbid")),
            )
        ).alias("e"),
    ).select("frame_id", "e.atom_id", "e.nbid")
    nb_coords = nbs.join(
        atoms.select(
            "frame_id", F.col("atom_id").alias("nbid"),
            F.col("x").alias("nx"), F.col("y").alias("ny"), F.col("z").alias("nz"),
        ),
        ["frame_id", "nbid"],
    )
    ap = atoms.join(pdf).select(
        "frame_id", "atom_id", "pt",
        (F.col("x") + F.col("ox")).alias("px"),
        (F.col("y") + F.col("oy")).alias("py"),
        (F.col("z") + F.col("oz")).alias("pz"),
    )
    r2 = rr * rr
    d2 = (
        (F.col("px") - F.col("nx")) * (F.col("px") - F.col("nx"))
        + (F.col("py") - F.col("ny")) * (F.col("py") - F.col("ny"))
        + (F.col("pz") - F.col("nz")) * (F.col("pz") - F.col("nz"))
    )
    occluded = (
        ap.join(nb_coords, ["frame_id", "atom_id"])
        .where(d2 < F.lit(r2))
        .select("frame_id", "atom_id", "pt")
        .distinct()
    )
    per_point = ap.select("frame_id", "atom_id", "pt").join(
        occluded.withColumn("_occ", F.lit(1)), ["frame_id", "atom_id", "pt"],
        "left",
    )
    return per_point.groupBy("frame_id", "atom_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum(
            F.when(F.col("_occ").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_exposed"),
    )


def compute_neighbors(
    traj, cutoff: float, query_indices, haystack_indices=None
) -> DataFrame:
    """Per-frame atoms within ``cutoff`` of ANY query atom → DISTINCT
    (frame_id, atom_id) — mdtraj ``compute_neighbors`` parity
    (geometry/neighbors, public API; the geometric "within X of
    selection" every solvation/binding-site analysis starts with).
    The query atoms themselves are excluded; ``haystack_indices``
    restricts the searched side (default: all atoms).

    Plan: the ``neighbor_pairs`` cell-list shape, asymmetric — the
    (tiny) query side explodes its 27 neighbor cells and the
    haystack joins on (frame_id, cell); cost O((|query|·27 +
    n_haystack) · local density), never the O(n·|query|) brute
    force the oracle runs at gate scale."""
    qset = sorted({int(i) for i in query_indices})
    if not qset:
        raise ValueError("query_indices must be non-empty")
    c = traj.coords
    inv = 1.0 / float(cutoff)
    cell = lambda col: F.floor(F.col(col).cast("double") * F.lit(inv)).cast("long")  # noqa: E731
    base = c.select(
        "frame_id",
        "atom_id",
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
        F.col("z").cast("double").alias("z"),
        cell("x").alias("cx"), cell("y").alias("cy"), cell("z").alias("cz"),
    )
    hay = base
    if haystack_indices is not None:
        hay = _atom_role_restrict(base, haystack_indices)
    q = _atom_role_restrict(base, qset)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"),
                     F.lit(dz).alias("oz"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)
        ]
    )
    qx = q.select(
        "frame_id",
        F.col("atom_id").alias("qid"),
        F.col("x").alias("qx"), F.col("y").alias("qy"), F.col("z").alias("qz"),
        F.explode(offsets).alias("o"),
        "cx", "cy", "cz",
    ).select(
        "frame_id", "qid", "qx", "qy", "qz",
        (F.col("cx") + F.col("o.ox")).alias("cx"),
        (F.col("cy") + F.col("o.oy")).alias("cy"),
        (F.col("cz") + F.col("o.oz")).alias("cz"),
    )
    d2 = (
        (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
        + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy"))
        + (F.col("z") - F.col("qz")) * (F.col("z") - F.col("qz"))
    )
    r2 = float(cutoff) * float(cutoff)
    return (
        hay.join(qx, ["frame_id", "cx", "cy", "cz"])
        .where((F.col("atom_id") != F.col("qid")) & (d2 <= F.lit(r2)))
        .select("frame_id", "atom_id")
        .distinct()
    )


def transition_counts(
    series: DataFrame,
    value_col: str,
    bin_width: float,
    lag: int = 1,
    key_col: str = "frame_id",
) -> DataFrame:
    """Markov-state-model transition counting over a binned order
    parameter → (from_state, to_state, n): frames are assigned to
    states by flooring the (2^-20-snapped) scalar into
    ``bin_width``-wide bins, and every (t, t+lag) pair increments its
    state-pair count — the count matrix row-normalized downstream is
    the MSM transition matrix (Prinz et al. 2011, public JCP).

    Exactness: dyadic ``bin_width`` makes the state assignment an
    exact integer floor on grid values — engine-identical; counts are
    integers.  One lag equi-join on the per-frame series + one
    bounded groupBy (states², not frames)."""
    bw = float(bin_width)
    q = F.round(F.col(value_col).cast("double") * ACF_GRID, 0) / ACF_GRID
    st = series.select(
        F.col(key_col).alias("t"),
        F.floor(q / F.lit(bw)).cast("long").alias("state"),
    )
    a = st.select((F.col("t") + int(lag)).alias("tt"),
                  F.col("state").alias("from_state"))
    b = st.select(F.col("t").alias("tt"), F.col("state").alias("to_state"))
    return (
        a.join(b, "tt")
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
