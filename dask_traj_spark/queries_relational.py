"""Relational operator coverage on the TPC-H-ish tables: joins
(broadcast/semi/anti), partial+final aggregation, rollup, window
functions, top-k, set operations.

The reference has none of these (SURVEY.md §2.5) — this block shows
the same engine covering the relational surface a 100 TB pipeline
needs, with the usual determinism discipline: money quantized to
integer cents (``round(x*100)`` BIGINT) before any aggregation, so
sums are order-independent and hash-identical to the DuckDB oracle;
dates exported as strings.

Plan shapes: nation/region/customer dimensions broadcast; lineitem
is the only shuffled table and always aggregates partial-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dask_traj_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100, 0).cast("long")


# ---------------------------------------------------------------- r1

_R1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_cp,
       count(*) AS count_order,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg_qty_c
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("r1_pricing_summary", _R1_ORACLE)
def q_r1(spark, sf_dir):
    """TPC-H Q1-style pricing summary: one partial+final agg."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    qty_c = _cents("l_quantity")
    ep_c = _cents("l_extendedprice")
    disc_pct = _cents("l_discount")  # 0.05 → 5
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty_c).alias("sum_qty_c"),
        F.sum(ep_c).alias("sum_base_c"),
        F.sum(ep_c * (100 - disc_pct)).alias("sum_disc_cp"),
        F.count(F.lit(1)).alias("count_order"),
        (F.sum(qty_c).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_qty_c"
        ),
    )


# ---------------------------------------------------------------- r2

_R2_ORACLE = """
WITH rev AS (
    SELECT l.l_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_cp
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1, 2, 3
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY revenue_cp DESC, l_orderkey) AS rk
    FROM rev
)
SELECT l_orderkey, o_orderdate, o_orderpriority, revenue_cp, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 10
"""


@register("r2_topk_revenue", _R2_ORACLE)
def q_r2(spark, sf_dir):
    """Q3-style top-k: broadcast customer dim, join, agg, window
    top-10 with deterministic tie-break."""
    c = F.broadcast(
        _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    )
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
                "revenue_cp"
            )
        )
    )
    # Distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heaps, no global sort); the row_number window then
    # runs over only the <=10 surviving rows. A bare Window.orderBy
    # here would instead funnel EVERY aggregated group through one task.
    order = [F.col("revenue_cp").desc(), F.col("l_orderkey")]
    top = rev.orderBy(*order).limit(10)
    return top.withColumn(
        "rk", F.row_number().over(Window.orderBy(*order)).cast("int")
    )


# ---------------------------------------------------------------- r3

_R3_ORACLE = """
SELECT coalesce(r.r_name, 'ALL') AS region,
       coalesce(n.n_name, 'ALL') AS nation,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_c,
       count(*) AS n_customers
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
"""


@register("r3_rollup_acctbal", _R3_ORACLE)
def q_r3(spark, sf_dir):
    """Hierarchical ROLLUP aggregate over broadcast dims."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    j = c.join(n, c["c_nationkey"] == n["n_nationkey"]).join(
        r, n["n_regionkey"] == r["r_regionkey"]
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.sum(_cents("c_acctbal")).alias("acctbal_c"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "acctbal_c",
            "n_customers",
        )
    )


# ---------------------------------------------------------------- r4

_R4_ORACLE = """
SELECT o_custkey,
       o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS running_total_c
FROM orders
"""


@register("r4_running_revenue_window", _R4_ORACLE)
def q_r4(spark, sf_dir):
    """Per-customer running revenue — window function surface."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        F.sum(_cents("o_totalprice")).over(w).alias("running_total_c"),
    )


# ---------------------------------------------------------------- r5

_R5_ORACLE = """
SELECT c_custkey FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


@register("r5_semi_anti_join", _R5_ORACLE)
def q_r5(spark, sf_dir):
    """Semi + anti join: customers with open orders but no filled
    ones."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    open_o = o.where(F.col("o_orderstatus") == "O")
    filled = o.where(F.col("o_orderstatus") == "F")
    return (
        c.join(open_o, c["c_custkey"] == open_o["o_custkey"], "left_semi")
        .join(filled, c["c_custkey"] == filled["o_custkey"], "left_anti")
        .select("c_custkey")
    )


# ---------------------------------------------------------------- r6

_R7_ORACLE = """
SELECT n.n_name AS nation,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_cp,
       count(*) AS n_items
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
                AND n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@register("r7_regional_revenue", _R7_ORACLE)
def q_r7(spark, sf_dir):
    """TPC-H Q5-style 6-table join (local-supplier revenue by
    nation): dims broadcast, lineitem the only shuffled side, one
    partial+final agg — exactly the plan a 100 TB run needs."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            n,
            (F.col("n_nationkey") == F.col("c_nationkey"))
            & (F.col("n_nationkey") == F.col("s_nationkey")),
        )
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .where(F.col("r_name") == "ASIA")
    )
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
            "revenue_cp"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


_R8_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       count(*) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


@register("r8_cube_quantities", _R8_ORACLE)
def q_r8(spark, sf_dir):
    """CUBE over (returnflag, linestatus) — grouping-sets surface."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents("l_quantity")).alias("sum_qty_c"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty_c",
            "n",
        )
    )


_R9_ORACLE = """
WITH avg_bal AS (
    SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT)) AS ab
    FROM customer WHERE c_acctbal > 0.0
)
SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
       count(*) AS numcust,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_c
FROM customer c, avg_bal
WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > ab
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c.c_nationkey
"""


@register("r9_rich_inactive_customers", _R9_ORACLE)
def q_r9(spark, sf_dir):
    """TPC-H Q22 shape: scalar subquery (global average balance,
    broadcast single-row) + anti join against orders (customers with
    no orders) + aggregate. The anti join shuffles on custkey;
    everything else is broadcast."""
    c = _t(spark, sf_dir, "customer").withColumn("bal_c", _cents("c_acctbal"))
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("bal_c").alias("ab"))
    )
    cand = c.crossJoin(F.broadcast(avg_bal)).where(F.col("bal_c") > F.col("ab"))
    recent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    inactive = cand.join(recent, "c_custkey", "left_anti")
    return inactive.groupBy(
        F.col("c_nationkey").cast("long").alias("nationkey")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("bal_c").alias("totacctbal_c"),
    )


_R10_ORACLE = """
WITH q AS (
    SELECT l_partkey,
           CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
    FROM lineitem
),
a AS (SELECT l_partkey, avg(qty_c) AS avg_qty_c FROM q GROUP BY l_partkey)
SELECT q.l_partkey AS partkey, CAST(sum(q.price_c) AS BIGINT) AS revenue_c, count(*) AS n
FROM q JOIN a USING (l_partkey)
WHERE CAST(q.qty_c AS DOUBLE) < a.avg_qty_c / 5
GROUP BY q.l_partkey
"""


@register("r10_small_qty_revenue", _R10_ORACLE)
def q_r10(spark, sf_dir):
    """TPC-H Q17 shape (rows below 20% of their part's average
    quantity). The oracle writes it as agg + self-join; the Spark
    form is a window average over the SAME partitioning — one
    shuffle on l_partkey, no join node at all."""
    q = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        _cents("l_quantity").alias("qty_c"),
        _cents("l_extendedprice").alias("price_c"),
    )
    w = Window.partitionBy("l_partkey")
    return (
        q.withColumn("avg_qty_c", F.avg("qty_c").over(w))
        .where(F.col("qty_c").cast("double") < F.col("avg_qty_c") / 5)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum("price_c").alias("revenue_c"), F.count(F.lit(1)).alias("n"))
    )


_R11_ORACLE = """
SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m') AS ship_month,
       CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                ELSE 0 END) AS BIGINT) AS promo_cp,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS total_cp
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1
"""


@register("r11_promo_share_by_month", _R11_ORACLE)
def q_r11(spark, sf_dir):
    """TPC-H Q14 shape: lineitem ⋈ broadcast part, conditional
    aggregation by ship month (integer-cents revenue, exact)."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    disc_cp = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
                "ship_month"
            )
        )
        .agg(
            F.sum(
                F.when(F.col("p_type").startswith("PROMO"), disc_cp).otherwise(0)
            ).alias("promo_cp"),
            F.sum(disc_cp).alias("total_cp"),
        )
    )


_R6_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@register("r6_intersect_status", _R6_ORACLE)
def q_r6(spark, sf_dir):
    """INTERSECT: customers with both open and filled orders."""
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)
