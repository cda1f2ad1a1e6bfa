"""As-of (point-in-time) join — a keyed temporal join Spark lacks
as a built-in.

For every left row, attach the single most recent right row whose
timestamp is at-or-before the left row's timestamp, within the same
key group (pandas ``merge_asof`` / kdb ``aj`` / Flink temporal-join
semantics, direction="backward").

The reference engine has no relational joins at all (SURVEY.md §2.5
— its ``join`` is concatenation, core/dask_traj.py:591); this is a
beyond-parity operator for the event-analytics surface.

Physical strategy — **union + running last**, the shuffle-minimal
form:

1. tag both sides and UNION ALL (no join node at all),
2. one shuffle: window partitioned by key, ordered by
   ``(ts, side, tie)`` with right rows sorting before left rows at
   equal ts (inclusive <= semantics) and a total-order tie column,
3. ``last(payload, ignoreNulls)`` propagates the latest right
   payload onto each left row; filter back to left rows.

Cost: ONE exchange of (|L| + |R|) rows hash-partitioned on the key
— the same class as a single sort-merge join, with no
per-key subquery or range-join blowup. At 100 TB both sides stream
through sorted partitions; skewed keys are split by AQE. An
equivalent ``merge_asof``-style cogrouped-pandas variant is
``asof_join_pandas`` (Arrow path, useful when the payload is wide).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_SIDE, _TS, _TIE, _PAY = "__asof_side", "__asof_ts", "__asof_tie", "__asof_pay"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    payload: list[str] | None = None,
    tie: str | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """Left-outer as-of join (direction: backward, inclusive).

    ``payload``: right columns to attach (default: all but the on/by
    columns). ``tie``: right column giving a total order among right
    rows sharing a timestamp (required for deterministic output when
    duplicates exist). ``tolerance``: optional max staleness — a
    Column interpreted in the ``on`` column's units; matches older
    than it are nulled out.
    """
    if payload is None:
        payload = [c for c in right.columns if c not in (right_on, right_by)]
    order_tie = F.col(tie).cast("long") if tie else F.lit(0)
    carry = [c for c in left.columns if c != left_by]  # key kept once

    r = right.select(
        F.col(right_by).alias(left_by),
        F.col(right_on).alias(_TS),
        F.lit(0).alias(_SIDE),
        order_tie.alias(_TIE),
        F.struct(
            F.col(right_on).alias("__on"), *[F.col(c) for c in payload]
        ).alias(_PAY),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carry],
    )
    l = left.select(  # noqa: E741
        F.col(left_by),
        F.col(left_on).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(0).cast("long").alias(_TIE),
        F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY),
        *[F.col(c) for c in carry],
    )
    w = (
        Window.partitionBy(left_by)
        .orderBy(_TS, _SIDE, _TIE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        r.unionByName(l)
        .withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
        .where(F.col(_SIDE) == 1)
    )
    if tolerance is not None:
        filled = filled.withColumn(
            _PAY,
            F.when(
                F.col(_TS).cast("long") - F.col(f"{_PAY}.__on").cast("long")
                <= tolerance,
                F.col(_PAY),
            ),
        )
    matched_on = F.col(f"{_PAY}.__on").alias(f"{right_on}_matched")
    return filled.select(
        *[F.col(c) for c in left.columns],
        matched_on,
        *[F.col(f"{_PAY}.{c}").alias(c) for c in payload],
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    payload: list[str] | None = None,
) -> DataFrame:
    """Cogrouped-pandas as-of join: both sides shuffle once on the
    key, then ``pandas.merge_asof`` runs per cogroup (Arrow-batched).
    Same semantics as ``asof_join`` minus the tie/tolerance knobs;
    preferable when the right payload is very wide (struct packing
    in the window form costs per-column)."""
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    if payload is None:
        payload = [c for c in right.columns if c not in (right_on, right_by)]

    # NB: StructType.add mutates in place — never call it on a
    # DataFrame's schema object; build a fresh StructType.
    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(f"{right_on}_matched", right.schema[right_on].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in payload]
    )

    lcols, ron = list(left.columns), right_on

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf):
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        lpdf = lpdf.sort_values(left_on)
        rsel = rpdf[[ron] + payload].rename(columns={ron: f"{ron}_matched"})
        rsel = rsel.sort_values(f"{ron}_matched")
        m = pd.merge_asof(
            lpdf,
            rsel,
            left_on=left_on,
            right_on=f"{ron}_matched",
            direction="backward",
        )
        return m[[*lcols, f"{ron}_matched", *payload]]

    return (
        left.groupBy(left_by)
        .cogroup(right.withColumnRenamed(right_by, left_by).groupBy(left_by))
        .applyInPandas(merge, out_schema)
    )
