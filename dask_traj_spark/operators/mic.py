"""Minimum-image-convention displacement expressions (shared by
distances, displacements, angles — G1/G2/G3, G8).

The reference delegates MIC to MDTraj's C/SSE kernels
(``/root/reference/dask_traj/geometry/distance.py:53-54``) with a
runtime branch on box orthogonality (``:49-58``, the lazy
``orthogonal`` flag built at ``:128``). Here both paths are pure
SQL column expressions so they stay inside whole-stage codegen:

- **orthorhombic** fast path: per-axis ``d -= L * bround(d/L)``;
- **triclinic** general path: deskew against the reduced
  (lower-triangular) box vectors, then take the minimum over the 27
  neighbor images with a single ``F.aggregate`` (higher-order
  function) over a constant offsets array (no explode, no UDF).

IMPORTANT plan-shape discipline, learned the hard way:

1. The deskew is built as *staged projections* (``withColumns``
   layers) so every subexpression is a named column evaluated once.
   One nested Column tree duplicates the deskew subtree 27×4 times
   and sends Catalyst optimization time through the roof (measured:
   minutes vs milliseconds).
2. The image search is ONE ``aggregate`` lambda, not 27 copies of
   the candidate expression inside ``F.array(struct, ...)``. Besides
   keeping the plan tiny, this dodges a whole-stage-codegen
   miscompilation observed on Spark 4.1.2: a 27-element array of
   structs of compound arithmetic (after a join, with
   constant-foldable box columns) silently produced wrong struct
   fields for a subset of elements (and NPE'd in generated code in
   other select combinations). Higher-order functions evaluate via
   the interpreted path per element — 27 iterations over a constant
   array is negligible — and the single lambda body cannot be
   cross-contaminated by codegen CSE.

The same math, vectorized in numpy, lives in ``kernels.py`` for the
pandas-UDF fast path; both implementations agree to float32
tolerance (tested differentially). Rounding convention: HALF-TO-EVEN
everywhere (``F.bround`` here, ``np.rint`` in the kernels,
``round_even`` in the DuckDB oracles) so the SQL and vectorized
forms agree bit-for-bit even at exact half-box ties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BOX_COLS = ["ax", "ay", "az", "bx", "by", "bz", "cx", "cy", "cz"]

IMAGE_OFFSETS = [
    (si, sj, sk) for si in (-1, 0, 1) for sj in (-1, 0, 1) for sk in (-1, 0, 1)
]


def orthogonality_expr(alpha: Column, beta: Column, gamma: Column, tol: float = 1e-5) -> Column:
    """allclose(angles, 90) as a row predicate (degrees) — G8."""
    return (
        (F.abs(alpha - 90.0) < tol)
        & (F.abs(beta - 90.0) < tol)
        & (F.abs(gamma - 90.0) < tol)
    )


def _stage_deskew(df: DataFrame, dx: str, dy: str, dz: str) -> DataFrame:
    """Stage the triclinic deskew as named columns (_t1*, _t2*, _rx)
    so every subexpression is evaluated once — see module docstring
    item 1. Output reduced displacement is (_rx, _t2y, _t1z)."""
    b = {c: F.col(c) for c in BOX_COLS}
    s3 = F.bround(F.col(dz) / b["cz"], 0)
    df = df.withColumns(
        {
            "_t1x": F.col(dx) - s3 * b["cx"],
            "_t1y": F.col(dy) - s3 * b["cy"],
            "_t1z": F.col(dz) - s3 * b["cz"],
        }
    )
    s2 = F.bround(F.col("_t1y") / b["by"], 0)
    df = df.withColumns(
        {
            "_t2x": F.col("_t1x") - s2 * b["bx"],
            "_t2y": F.col("_t1y") - s2 * b["by"],
        }
    )
    s1 = F.bround(F.col("_t2x") / b["ax"], 0)
    return df.withColumn("_rx", F.col("_t2x") - s1 * b["ax"])


_DESKEW_COLS = ["_t1x", "_t1y", "_t1z", "_t2x", "_t2y", "_rx"]


def add_mic_displacement(
    df: DataFrame,
    dx: str = "dx",
    dy: str = "dy",
    dz: str = "dz",
    out: tuple[str, str, str] = ("mdx", "mdy", "mdz"),
) -> DataFrame:
    """Append MIC'd displacement columns ``out`` to a DataFrame that
    has raw displacement columns (dx,dy,dz), box-vector columns
    (ax..cz) and the ``_ortho`` predicate column.

    Intermediate columns are dropped before returning.
    """
    b = {c: F.col(c) for c in BOX_COLS}
    df = _stage_deskew(df, dx, dy, dz)

    # --- 27-image min via ONE aggregate() lambda (see docstring) ---
    # running min by full struct comparison (d2, dx, dy, dz) — the
    # same lexicographic order array_min/min_by would use, and the
    # deterministic tie-break the duckdb oracle specifies.
    rx, ry, rz = F.col("_rx"), F.col("_t2y"), F.col("_t1z")
    offsets = F.array(
        *[
            F.struct(
                F.lit(float(si)).alias("i"),
                F.lit(float(sj)).alias("j"),
                F.lit(float(sk)).alias("k"),
            )
            for si, sj, sk in IMAGE_OFFSETS
        ]
    )

    def _step(acc, o):
        cdx = rx - o["i"] * b["ax"] - o["j"] * b["bx"] - o["k"] * b["cx"]
        cdy = ry - o["i"] * b["ay"] - o["j"] * b["by"] - o["k"] * b["cy"]
        cdz = rz - o["i"] * b["az"] - o["j"] * b["bz"] - o["k"] * b["cz"]
        d2 = cdx * cdx + cdy * cdy + cdz * cdz
        cand = F.struct(
            d2.alias("d2"), cdx.alias("dx"), cdy.alias("dy"), cdz.alias("dz")
        )
        return F.when(cand < acc, cand).otherwise(acc)

    init = F.struct(
        F.lit(float("inf")).alias("d2"),
        F.lit(0.0).alias("dx"),
        F.lit(0.0).alias("dy"),
        F.lit(0.0).alias("dz"),
    )
    df = df.withColumn("_best", F.aggregate(offsets, init, _step))

    # --- orthorhombic fast path + per-row branch (G8) ---
    odx = F.col(dx) - b["ax"] * F.bround(F.col(dx) / b["ax"], 0)
    ody = F.col(dy) - b["by"] * F.bround(F.col(dy) / b["by"], 0)
    odz = F.col(dz) - b["cz"] * F.bround(F.col(dz) / b["cz"], 0)
    df = df.withColumns(
        {
            out[0]: F.when(F.col("_ortho"), odx).otherwise(F.col("_best.dx")),
            out[1]: F.when(F.col("_ortho"), ody).otherwise(F.col("_best.dy")),
            out[2]: F.when(F.col("_ortho"), odz).otherwise(F.col("_best.dz")),
        }
    )
    return df.drop(*_DESKEW_COLS, "_best")


def add_mic_distance(
    df: DataFrame,
    dx: str = "dx",
    dy: str = "dy",
    dz: str = "dz",
    out: str = "_micdist",
) -> DataFrame:
    """Append the MIC *distance* (FLOAT) directly — the G1 fast path
    for callers that don't need displacement components.

    The 27-image argmin in ``add_mic_displacement`` must carry the
    winning components, which forces per-element struct construction
    and struct comparison in its ``aggregate`` lambda. A distance
    only needs ``min(d2)``, so this path runs
    ``array_min(transform(offsets, d2))`` — still a higher-order
    function (HOFs evaluate interpreted, which keeps it outside the
    documented 4.1.2 whole-stage-codegen miscompilation; a flat
    ``F.least`` over 27 inline scalar expressions was measured to
    TRIGGER that bug — wrong results on ~1% of rows whenever
    subexpression elimination and method splitting are both active —
    and was slower than the struct HOF besides), but with ~3× less
    per-element work than the struct compare. Measured at sf0.1:
    1.14 s vs 1.40 s (argmin HOF) vs 0.89 s (no MIC at all) on the
    gated triclinic query. Differentially tested against the HOF
    path and the numpy kernel.

    Value contract (mirrored in the DuckDB oracles):
    - orthorhombic rows: per-axis reduction, components rounded to
      f32, then f32(sqrt(sum of double squares)) — bit-identical to
      the component path feeding the same formula.
    - triclinic rows: f32(sqrt(min_i d2_i)) with d2 in double — no
      intermediate f32 rounding (there are no winning components to
      round), no tie-break needed (equal d2 ⇒ equal dist).
    """
    b = {c: F.col(c) for c in BOX_COLS}
    df = _stage_deskew(df, dx, dy, dz)
    rx, ry, rz = F.col("_rx"), F.col("_t2y"), F.col("_t1z")
    offsets = F.array(
        *[
            F.struct(
                F.lit(float(si)).alias("i"),
                F.lit(float(sj)).alias("j"),
                F.lit(float(sk)).alias("k"),
            )
            for si, sj, sk in IMAGE_OFFSETS
        ]
    )

    def _d2(o):
        # left-to-right, same associativity as the oracle SQL
        cdx = rx - o["i"] * b["ax"] - o["j"] * b["bx"] - o["k"] * b["cx"]
        cdy = ry - o["i"] * b["ay"] - o["j"] * b["by"] - o["k"] * b["cy"]
        cdz = rz - o["i"] * b["az"] - o["j"] * b["bz"] - o["k"] * b["cz"]
        return cdx * cdx + cdy * cdy + cdz * cdz

    tri_dist = F.sqrt(F.array_min(F.transform(offsets, _d2))).cast("float")

    f32sq = lambda c: c.cast("float").cast("double")  # noqa: E731
    odx = f32sq(F.col(dx) - b["ax"] * F.bround(F.col(dx) / b["ax"], 0))
    ody = f32sq(F.col(dy) - b["by"] * F.bround(F.col(dy) / b["by"], 0))
    odz = f32sq(F.col(dz) - b["cz"] * F.bround(F.col(dz) / b["cz"], 0))
    ortho_dist = F.sqrt(odx * odx + ody * ody + odz * odz).cast("float")

    df = df.withColumn(
        out, F.when(F.col("_ortho"), ortho_dist).otherwise(tri_dist)
    )
    return df.drop(*_DESKEW_COLS)
