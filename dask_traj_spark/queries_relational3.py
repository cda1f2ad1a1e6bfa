"""Third relational block: the remaining classic TPC-H query shapes
(Q4, Q6, Q8, Q9, Q10, Q11, Q12, Q13, Q15, Q20, Q21), adapted to the
driver's reduced star schema (no ``partsupp``, no
``l_commitdate``/``l_receiptdate``/``l_shipmode``/``p_container`` —
see TESTDATA.md).  Where a predicate used a missing column, the shape
is preserved with the closest available column and the adaptation is
documented on the query.  With this block every one of the 22 TPC-H
query *plan shapes* has a gated counterpart:

  Q1 r1, Q2 r21, Q3 r12, Q4 r23, Q5 r7, Q6 r24, Q7 r13, Q8 r25,
  Q9 r26, Q10 r27, Q11 r28, Q12 r29, Q13 r30, Q14 r11, Q15 r31,
  Q16 r14, Q17 r10, Q18 r15, Q19 r16, Q20 r32, Q21 r33, Q22 r9.

Determinism discipline (see ``queries.py`` docstring): money →
integer cents before any aggregation, ratios as a single exact
BIGINT/BIGINT division rounded to 6 (correctly-rounded double
division on identical inputs agrees across engines), dates exported
as strings, every LIMIT under a total order.

100-TB plan shapes: ``customer``/``supplier``/``nation``/``part``
and every scalar aggregate broadcast; ``lineitem`` and ``orders``
are the only shuffled tables; EXISTS/NOT EXISTS run as broadcast or
shuffled semi/anti joins, never correlated per-row subqueries.
The reference has no relational surface (SURVEY.md §2.5) — this
block is extension coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dask_traj_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100, 0).cast("long")


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


# revenue in cents·percent: extprice_c * (100 - disc_c), exact BIGINT
def _rev_cp() -> F.Column:
    return _cents("l_extendedprice") * (100 - _cents("l_discount"))


_REV_CP_SQL = (
    "CAST(round(l.l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l.l_discount * 100) AS BIGINT))"
)

# ---------------------------------------------------------------- r23

_R23_ORACLE = """
SELECT o.o_orderpriority AS orderpriority,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
GROUP BY o.o_orderpriority
ORDER BY orderpriority
"""


@register("r23_priority_exists", _R23_ORACLE)
def q_r23(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS-decorrelated left-semi join from orders
    into lineitem, then a grouped count.  Adaptation: the "late line"
    predicate uses ``l_shipdate > o_orderdate + 60 days`` (the schema
    has no commitdate/receiptdate).  The semi join carries the range
    predicate alongside the key equality — one shuffle on orderkey."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-07-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("orderpriority")
    )


# ---------------------------------------------------------------- r24

_R24_ORACLE = """
SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * CAST(round(l.l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cp
FROM lineitem l
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND round(l.l_discount * 100) BETWEEN 5 AND 7
  AND l.l_quantity < 24
"""


@register("r24_forecast_revenue", _R24_ORACLE)
def q_r24(spark, sf_dir):
    """TPC-H Q6 verbatim shape: single-table scan with three pushable
    predicates and one global sum — the pure filter-pushdown probe.
    All predicates reach the parquet scan (PushedFilters asserts in
    test_plans); partial+final agg, no join, no wide shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    disc_c = _cents("l_discount")
    return (
        li.where(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
            & disc_c.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_cents("l_extendedprice") * disc_c).alias("revenue_cp"))
    )


# ---------------------------------------------------------------- r25

_R25_ORACLE = f"""
WITH vol AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
         CASE WHEN n1.n_name = 'NATION_2' THEN {_REV_CP_SQL} ELSE 0 END AS nation_cp,
         {_REV_CP_SQL} AS total_cp
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  JOIN region r   ON n2.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN part p     ON l.l_partkey = p.p_partkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
SELECT order_year,
       CAST(sum(nation_cp) AS BIGINT) AS nation_cp,
       CAST(sum(total_cp) AS BIGINT) AS total_cp,
       round(CAST(sum(nation_cp) AS DOUBLE) / CAST(sum(total_cp) AS DOUBLE), 6) AS mkt_share
FROM vol
GROUP BY order_year
ORDER BY order_year
"""


@register("r25_market_share", _R25_ORACLE)
def q_r25(spark, sf_dir):
    """TPC-H Q8 shape: national market share — 8-way join where every
    dimension broadcasts and only lineitem/orders shuffle, then a
    conditional aggregate.  Adaptation: p_type='PROMO' stands in for
    the spec's part filter.  The share is one exact BIGINT/BIGINT
    double division (correctly rounded, engine-independent)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust = F.broadcast(
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    rev = _rev_cp()
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(F.lit(0))).alias("nation_cp"),
            F.sum(rev).alias("total_cp"),
        )
        .select(
            "order_year",
            "nation_cp",
            "total_cp",
            F.round(F.col("nation_cp").cast("double") / F.col("total_cp").cast("double"), 6).alias("mkt_share"),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------- r26

_R26_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
       CAST(sum({_REV_CP_SQL}) AS BIGINT) AS profit_cp
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation, order_year
"""


@register("r26_profit_by_nation_year", _R26_ORACLE)
def q_r26(spark, sf_dir):
    """TPC-H Q9 shape: product-type profit by supplier nation and
    order year.  Adaptation: the schema has no ``partsupp``, so
    profit is discounted revenue (no supplycost term); the part
    filter keeps Q9's ``p_name LIKE`` contains-predicate."""
    p = F.broadcast(
        _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select("p_partkey")
    )
    supp = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(_t(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(F.sum(_rev_cp()).alias("profit_cp"))
        .orderBy("nation", "order_year")
    )


# ---------------------------------------------------------------- r27

_R27_ORACLE = f"""
SELECT c.c_custkey AS custkey,
       c.c_name AS name,
       CAST(sum({_REV_CP_SQL}) AS BIGINT) AS revenue_cp,
       CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c,
       n.n_name AS nation
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue_cp DESC, custkey
LIMIT 20
"""


@register("r27_returned_items", _R27_ORACLE)
def q_r27(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer in one
    quarter, top 20 — lineitem shuffles once on orderkey; customer
    and nation broadcast; TakeOrdered(20) under a total order."""
    cust = F.broadcast(
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(_t(spark, sf_dir, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
    )
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-04-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("acctbal_c"),
            "nation",
        )
        .agg(F.sum(_rev_cp()).alias("revenue_cp"))
        .select("custkey", "name", "revenue_cp", "acctbal_c", "nation")
        .orderBy(F.col("revenue_cp").desc(), "custkey")
        .limit(20)
    )


# ---------------------------------------------------------------- r28

_R28_ORACLE = """
SELECT n.n_name AS nation,
       CAST(sum(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT) AS balance_c
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_acctbal > 0
GROUP BY n.n_name
HAVING sum(CAST(round(s.s_acctbal * 100) AS BIGINT))
     > (SELECT sum(CAST(round(s2.s_acctbal * 100) AS BIGINT)) / 25
        FROM supplier s2 WHERE s2.s_acctbal > 0)
ORDER BY balance_c DESC, nation
"""


@register("r28_important_balances", _R28_ORACLE)
def q_r28(spark, sf_dir):
    """TPC-H Q11 shape: grouped sum filtered against a scalar
    aggregate of the same table (HAVING sum > global_sum / k).
    Adaptation: supplier account balances stand in for partsupp
    value (no partsupp table).  The scalar aggregate joins back as a
    broadcast single-row cross join — the Q22/Q11 plan shape; the
    threshold division is integer-exact in both engines."""
    s = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 0)
    bal = F.round(F.col("s_acctbal") * 100, 0).cast("long")
    per_nation = (
        s.join(F.broadcast(_t(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(bal).alias("balance_c"))
    )
    total = s.agg((F.sum(bal) / F.lit(25)).cast("long").alias("threshold_c"))
    return (
        per_nation.join(F.broadcast(total))
        .where(F.col("balance_c") > F.col("threshold_c"))
        .select("nation", "balance_c")
        .orderBy(F.col("balance_c").desc(), "nation")
    )


# ---------------------------------------------------------------- r29

_R29_ORACLE = """
SELECT l.l_linestatus AS linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
ORDER BY linestatus
"""


@register("r29_priority_lineshare", _R29_ORACLE)
def q_r29(spark, sf_dir):
    """TPC-H Q12 shape: orders–lineitem join with per-group
    conditional counts of high/low priority.  Adaptation: grouped by
    ``l_linestatus`` (the schema has no ``l_shipmode``) with a
    shipdate-year window standing in for the receiptdate window."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("linestatus")
    )


# ---------------------------------------------------------------- r30

_R30_ORACLE = """
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("r30_customer_distribution", _R30_ORACLE)
def q_r30(spark, sf_dir):
    """TPC-H Q13 shape: customer order-count distribution — LEFT
    OUTER join with an extra non-key predicate *in the join
    condition* (so zero-order customers survive), double
    aggregation.  Adaptation: priority<>'5-LOW' stands in for the
    spec's comment NOT LIKE filter."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------- r31

_R31_ORACLE = f"""
WITH revenue AS (
  SELECT l.l_suppkey AS suppkey,
         CAST(sum({_REV_CP_SQL}) AS BIGINT) AS total_cp
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_cp AS total_cp
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.suppkey
WHERE r.total_cp = (SELECT max(total_cp) FROM revenue)
ORDER BY suppkey
"""


@register("r31_top_supplier", _R31_ORACLE)
def q_r31(spark, sf_dir):
    """TPC-H Q15 shape: revenue view reused twice — once grouped,
    once reduced to a scalar max — joined back (ties kept).  The
    revenue view is computed once and the max side is a broadcast
    single-row join, not a window over a global sort."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_rev_cp()).alias("total_cp"))
    )
    best = revenue.agg(F.max("total_cp").alias("best_cp"))
    s = F.broadcast(
        _t(spark, sf_dir, "supplier").select(F.col("s_suppkey"), F.col("s_name").alias("name"))
    )
    return (
        revenue.join(F.broadcast(best))
        .where(F.col("total_cp") == F.col("best_cp"))
        .join(s, F.col("suppkey") == F.col("s_suppkey"))
        .select("suppkey", "name", "total_cp")
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------- r32

_R32_ORACLE = """
SELECT s.s_suppkey AS suppkey, s.s_name AS name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'red%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING sum(l.l_quantity) > 40
)
ORDER BY suppkey
"""


@register("r32_promo_part_suppliers", _R32_ORACLE)
def q_r32(spark, sf_dir):
    """TPC-H Q20 shape: semi-join chain — parts filtered by prefix
    LIKE (broadcast), per-(supplier, part) shipped-quantity
    aggregate with a HAVING threshold, then a semi join into
    supplier.  Adaptation: threshold on shipped quantity directly
    (no partsupp availqty to compare against)."""
    p = F.broadcast(
        _t(spark, sf_dir, "part").where(F.col("p_name").like("red%")).select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    qualifying = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 40)
        .select("l_suppkey")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("name"))
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------- r33

_R33_ORACLE = """
SELECT s.s_name AS name,
       CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
GROUP BY s.s_name
ORDER BY numwait DESC, name
LIMIT 10
"""


@register("r33_waiting_suppliers", _R33_ORACLE)
def q_r33(spark, sf_dir):
    """TPC-H Q21 shape: the EXISTS + NOT EXISTS double correlated
    subquery — suppliers who were the *last* to ship in
    multi-supplier 'F' orders.  Adaptation: lateness is
    ``l_shipdate`` (no receiptdate/commitdate).

    Decorrelated Spark plan: a line `l1` of supplier `s` waits iff
    the order has another supplier (EXISTS) and no *other* supplier
    shipped strictly later (NOT EXISTS) — i.e.
    ``l1.shipdate >= max(shipdate | suppkey != s)``.  That per-
    (order, supplier) "max over the others" comes from the top-2
    rewrite: per-supplier max `supp_max`, then per-order `m1` (max),
    `cnt_m1` (suppliers tying m1) and `m2` (max below m1):
    ``max_other = m1 if (supp_max < m1 or cnt_m1 > 1) else m2``.
    Three aggregates keyed on orderkey replace both correlated
    EXISTS probes — no lineitem rescan per subquery, every shuffle
    on the same orderkey family."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select("o_orderkey")
    li_f = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).drop("o_orderkey")

    per_os = li_f.groupBy(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).agg(F.max("l_shipdate").alias("supp_max"))
    ord1 = per_os.groupBy(F.col("ok").alias("ok1")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.max("supp_max").alias("m1")
    )
    with_m1 = per_os.join(ord1, F.col("ok") == F.col("ok1")).drop("ok1")
    ord2 = with_m1.groupBy(F.col("ok").alias("ok2")).agg(
        F.sum(F.when(F.col("supp_max") == F.col("m1"), 1).otherwise(0)).alias("cnt_m1"),
        F.max(F.when(F.col("supp_max") < F.col("m1"), F.col("supp_max"))).alias("m2"),
    )
    dim = (
        with_m1.join(ord2, F.col("ok") == F.col("ok2"))
        .where(F.col("n_supp") > 1)
        .select(
            "ok",
            "sk",
            F.when(
                (F.col("supp_max") < F.col("m1")) | (F.col("cnt_m1") > 1), F.col("m1")
            ).otherwise(F.col("m2")).alias("max_other"),
        )
    )
    waiting = (
        li_f.join(dim, (F.col("l_orderkey") == F.col("ok")) & (F.col("l_suppkey") == F.col("sk")))
        .where(F.col("l_shipdate") >= F.col("max_other"))
        .select("l_orderkey", "l_suppkey")
    )
    s = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", F.col("s_name").alias("name")))
    return (
        waiting.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "name")
        .limit(10)
    )


# ---------------------------------------------------------------- r34

_R34_ORACLE = """
SELECT 'p25' AS p, CAST(1 AS BIGINT) AS ok
UNION ALL SELECT 'p50', CAST(1 AS BIGINT)
UNION ALL SELECT 'p75', CAST(1 AS BIGINT)
ORDER BY p
"""


@register("r34_approx_quantiles", _R34_ORACLE)
def q_r34(spark, sf_dir):
    """Approximate-quantile sketch with a bounded-error CONTRACT gate
    (the r22-HLL pattern): ``percentile_approx(accuracy=1000)``
    guarantees rank error ≤ n/accuracy, so each approximate quantile
    must lie between the EXACT quantiles at p ± 1/accuracy.  The
    query computes both sides and emits the per-percentile ok flag;
    the oracle pins the contract (all-true).  Flags — not sketch
    values — are compared because a mergeable sketch's value may
    legally vary with partition merge order; the guarantee may not.
    """
    li = _t(spark, sf_dir, "lineitem")
    cents = _cents("l_extendedprice")
    acc = 1000
    eps = 1.0 / acc
    rows = []
    for label, p in [("p25", 0.25), ("p50", 0.50), ("p75", 0.75)]:
        lo_p, hi_p = max(0.0, p - eps), min(1.0, p + eps)
        rows.append(
            F.struct(
                F.lit(label).alias("p"),
                (
                    (F.percentile_approx(cents, F.lit(p), F.lit(acc))
                     >= F.percentile(cents, F.lit(lo_p)))
                    & (F.percentile_approx(cents, F.lit(p), F.lit(acc))
                       <= F.percentile(cents, F.lit(hi_p)))
                ).cast("long").alias("ok"),
            )
        )
    return (
        li.agg(F.array(*rows).alias("a"))
        .select(F.explode("a").alias("s"))
        .select("s.p", "s.ok")
        .orderBy("p")
    )
