"""Graph analytics over derived document/event graphs.

Beyond-reference capability block: a curation pipeline that builds
pair graphs (near-dup candidates d2/d4/d17, components d7) also
needs to RANK them — PageRank centrality over the duplicate graph
surfaces template/boilerplate hubs (the pages thousands of others
near-duplicate), the documents whose excision pays the most.

Determinism rules (the DuckDB oracles hash-compare values):

- damping is 0.875 = 7/8 — an exact dyadic rational, unlike the
  textbook 0.85 (17/20, not representable), so ``d·p`` is one
  correctly-rounded multiply in both engines;
- each edge contribution ``(d·p)/deg`` is snapped to the 2^-20 grid
  BEFORE the in-neighbor sum (the t9 convention), so per-vertex
  sums are exact sums of dyadics — independent of partial-agg order
  and bit-identical across engines;
- the teleport term ``(1−d)/N`` is one correctly-rounded division
  added once per vertex — identical bits.

Scale posture: per iteration ONE src-keyed join (rank × out-degree
attach) and ONE dst-keyed aggregation — the standard distributed
PageRank shape; ``localCheckpoint`` every round bounds lineage
(the d7/BPE loop discipline).  The iteration count is fixed (the
driver loop is inherent to power iteration, everything per-round is
distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dask_traj_spark.functions.text import LP_GRID

#: dyadic damping factor (7/8) — see module docstring.
DAMPING = 0.875


def pagerank(
    edges: DataFrame,
    n_iter: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """Power-iteration PageRank over a DIRECTED edge list, damping
    7/8, ``n_iter`` fixed rounds from the uniform start 1/N.

    Returns (vertex, pagerank).

    Variant note: vertices without out-edges LEAK their mass (no
    dangling redistribution) — symmetrize the edge list first for
    undirected semantics (every vertex then has out-edges, no leak),
    as the duplicate-graph gate does.  Citing the classic
    formulation: p_{t+1}(v) = (1−d)/N + Σ_{u→v} snap(d·p_t(u)/deg(u)).
    """
    n_iter = int(n_iter)
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    # edges, vertices, degrees and the 1-row count all feed EVERY
    # iteration — pin each once so no round re-runs the upstream
    # pipeline that produced the edge list (the c11 exchange-reuse
    # lesson: reuse is an optimization, not a guarantee; without the
    # checkpoint an 8-round run re-executes the pair-generation
    # subtree 8 times)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_row = verts.agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    g = F.lit(LP_GRID)
    base = F.lit(1.0 - DAMPING) / F.col("n").cast("double")
    p = verts.crossJoin(F.broadcast(n_row)).select(
        "v", (F.lit(1.0) / F.col("n").cast("double")).alias("p")
    )
    for it in range(n_iter):
        contrib = (
            e.join(p, e.src == p.v)
            .join(deg, "src")
            .select(
                "dst",
                (
                    F.round(
                        (F.lit(DAMPING) * F.col("p"))
                        / F.col("deg").cast("double")
                        * g,
                        0,
                    )
                    / g
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("acc"))
        )
        p = (
            verts.crossJoin(F.broadcast(n_row))
            .join(contrib, verts.v == contrib.dst, "left")
            .select(
                "v",
                (base + F.coalesce(F.col("acc"), F.lit(0.0))).alias("p"),
            )
        )
        if checkpoint_every and (it + 1) % int(checkpoint_every) == 0:
            p = p.localCheckpoint(eager=True)
    return p.select(F.col("v").alias("vertex"), F.col("p").alias("pagerank"))
