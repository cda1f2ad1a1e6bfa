"""Range (interval) join — point-in-interval matching at scale.

Spark expresses ``p BETWEEN lo AND hi`` joins without an equi-key as
a broadcast-nested-loop or cartesian product — O(|L|·|R|) and a
cluster-killer at 100 TB. The standard scale pattern (used by
Databricks' range-join optimization and every geospatial engine) is
**binning**: quantize the domain into fixed-width bins, explode each
interval into the bins it covers, equi-join points to bins, then
apply the exact range predicate.

Cost: one shuffle of |L| + |R|·(avg interval width / bin width)
rows hash-partitioned on the bin id — a plain equi-join Catalyst
can plan (broadcast if one side is small, sort-merge otherwise,
AQE-skew-splittable). Bin width is the knob: wide bins → fewer
replicated interval rows, more false candidates filtered after the
join; narrow bins → the reverse. Choose roughly the median interval
width.

The reference has no joins at all (SURVEY.md §2.5); this is a
beyond-parity operator for the event-analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    equi_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= p <= hi`` (inclusive both ends), optionally also matching
    on ``equi_keys``. Numeric (long-valued) domain — timestamps
    should be passed as epoch micros.

    Returns points columns + intervals columns (names must not
    collide apart from ``equi_keys``). ``how``: "inner" or
    "left" (left = points without any interval keep nulls).
    """
    keys = equi_keys or []
    p_bin = (F.col(point_col) / F.lit(bin_width)).cast("long")
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col(lo_col) / F.lit(bin_width)).cast("long"),
                (F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    pts = points.withColumn("__bin", p_bin)
    cond = [pts["__bin"] == iv["__bin"]] + [pts[k] == iv[k] for k in keys]
    joined = pts.join(iv, cond, "inner").where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    out_cols = [pts[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in keys
    ]
    matched = joined.select(*out_cols)
    if how == "inner":
        return matched
    if how == "left":
        # anti-join the matched points back, append null-extended rows
        null_iv = [
            F.lit(None).cast(intervals.schema[c].dataType).alias(c)
            for c in intervals.columns
            if c not in keys
        ]
        unmatched = points.join(
            matched.select(*[F.col(c) for c in points.columns]).distinct(),
            points.columns,
            "left_anti",
        ).select(*[F.col(c) for c in points.columns], *null_iv)
        return matched.unionByName(unmatched)
    raise ValueError(f"how={how!r}: expected 'inner' or 'left'")


def overlap_count(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    group_cols: list[str],
) -> DataFrame:
    """Count, per point, how many intervals contain it (e.g. how
    many sessions were concurrently open at each event). A range
    join followed by a partial+final count keyed by the point's
    identity columns."""
    rj = range_join(points, intervals, point_col, lo_col, hi_col, bin_width)
    return rj.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_overlap"))
