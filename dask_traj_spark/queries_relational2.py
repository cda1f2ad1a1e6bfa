"""Second relational block: the multi-join / subquery / window /
quantile TPC-H shapes missing from ``queries_relational.py``.

Same determinism discipline (see ``queries.py`` docstring): money →
integer cents before aggregation; dates exported as strings; every
top-k ordered by a total order. Quantiles are safe to compare
bit-exactly because the inputs are BIGINT cents and the requested
percentiles are dyadic (0.25/0.5/0.75): the rank position
``h = (n-1)*p`` and the linear interpolation between two integers
are both exact in IEEE double, so Spark's ``percentile`` and
DuckDB's ``quantile_cont`` agree bit-for-bit.

Plan shapes: customer/supplier/nation/part broadcast; lineitem and
orders are the only shuffled tables; semi/anti joins stay
broadcast-hash. The reference has no relational surface at all
(SURVEY.md §2.5) — this block is pure extension coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dask_traj_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100, 0).cast("long")

# ---------------------------------------------------------------- r12

_R12_ORACLE = """
SELECT l.l_orderkey AS orderkey,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_cp,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cp DESC, orderkey
LIMIT 10
"""


@register("r12_shipping_priority", _R12_ORACLE)
def q_r12(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join (two broadcast dims), agg, top-10
    with a deterministic tie-break (revenue desc, orderkey)."""
    c = F.broadcast(
        _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    )
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(rev).alias("revenue_cp"))
        .select("orderkey", "revenue_cp", "orderdate", "orderpriority")
        .orderBy(F.col("revenue_cp").desc(), "orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------- r13

_R13_ORACLE = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS volume_cp
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
"""


@register("r13_nation_volume", _R13_ORACLE)
def q_r13(spark, sf_dir):
    """TPC-H Q7 shape: 6-way join with a disjunctive cross-nation
    predicate; everything but lineitem/orders broadcasts."""
    n = _t(spark, sf_dir, "nation")
    s = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = F.broadcast(
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.sum(rev).alias("volume_cp"))
    )


# ---------------------------------------------------------------- r14

_R14_ORACLE = """
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'MEDIUM'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("r14_supplier_part_variety", _R14_ORACLE)
def q_r14(spark, sf_dir):
    """TPC-H Q16 shape: distinct-count aggregation behind a
    broadcast anti-join (NOT IN suppliers with negative balance)."""
    p = F.broadcast(
        _t(spark, sf_dir, "part").where(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
    )
    bad = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------- r15

_R15_ORACLE = """
SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_c,
       CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 35000)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@register("r15_large_volume_orders", _R15_ORACLE)
def q_r15(spark, sf_dir):
    """TPC-H Q18 shape: group-by-HAVING subquery feeding a semi
    join, then re-aggregation with the customer dimension."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("s"))
        .where(F.col("s") > 35000)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders").join(
        F.broadcast(big),
        F.col("o_orderkey") == big["l_orderkey"],
        "left_semi",
    )
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _cents("o_totalprice").alias("total_c"),
        )
        .agg(F.sum(_cents("l_quantity")).alias("sum_qty_c"))
    )


# ---------------------------------------------------------------- r16

_R16_ORACLE = """
SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_cp,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("r16_disjunctive_revenue", _R16_ORACLE)
def q_r16(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive range predicates
    spanning both join sides (no single pushable filter)."""
    p = F.broadcast(_t(spark, sf_dir, "part"))
    li = _t(spark, sf_dir, "lineitem")
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(F.sum(rev).alias("revenue_cp"), F.count("*").alias("n_lines"))
    )


# ---------------------------------------------------------------- r17

_R17_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("r17_grouping_sets", _R17_ORACLE)
def q_r17(spark, sf_dir):
    """GROUPING SETS (finer than the r3 rollup / r8 cube pair):
    explicit set list with COALESCE sentinels for the super-rows."""
    return spark.sql(
        f"""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_c,
               count(*) AS n
        FROM parquet.`{sf_dir}/lineitem.parquet`
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------- r18

_R18_ORACLE = """
SELECT c_custkey AS custkey, c_nationkey AS nationkey, bal_c,
       lag(bal_c) OVER w AS prev_bal_c,
       lead(bal_c) OVER w AS next_bal_c,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       row_number() OVER w AS rn
FROM (SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer)
WINDOW w AS (PARTITION BY c_nationkey ORDER BY bal_c DESC, c_custkey)
"""


@register("r18_window_functions", _R18_ORACLE)
def q_r18(spark, sf_dir):
    """Window-function breadth: lag/lead/ntile/percent_rank/
    row_number over a per-nation total order. percent_rank is
    (rank-1)/(n-1) on integers — bit-exact across engines."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_nationkey").alias("nationkey"),
        _cents("c_acctbal").alias("bal_c"),
    )
    w = Window.partitionBy("nationkey").orderBy(F.col("bal_c").desc(), "custkey")
    return c.select(
        "custkey",
        "nationkey",
        "bal_c",
        F.lag("bal_c").over(w).alias("prev_bal_c"),
        F.lead("bal_c").over(w).alias("next_bal_c"),
        # long casts: Spark ntile/row_number are INT, DuckDB's are
        # BIGINT — the driver hashes dtype-sensitively
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.row_number().over(w).cast("long").alias("rn"),
    )


# ---------------------------------------------------------------- r19

_R19_ORACLE = """
SELECT o_orderpriority AS priority,
       count(*) AS n,
       quantile_cont(total_c, 0.25) AS q25,
       quantile_cont(total_c, 0.5) AS q50,
       quantile_cont(total_c, 0.75) AS q75
FROM (SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
      FROM orders)
GROUP BY o_orderpriority
"""


@register("r19_exact_quantiles", _R19_ORACLE)
def q_r19(spark, sf_dir):
    """Exact linear-interpolation quantiles of integer cents at
    dyadic percentiles — Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` bit-for-bit (see module docstring)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        _cents("o_totalprice").alias("total_c"),
    )
    return o.groupBy("priority").agg(
        F.count("*").alias("n"),
        F.percentile("total_c", F.lit(0.25)).alias("q25"),
        F.percentile("total_c", F.lit(0.5)).alias("q50"),
        F.percentile("total_c", F.lit(0.75)).alias("q75"),
    )


# ---------------------------------------------------------------- r20

_R20_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@register("r20_except_status", _R20_ORACLE)
def q_r20(spark, sf_dir):
    """EXCEPT (set difference, the complement of r6's INTERSECT):
    customers with open orders and no filled ones."""
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    # distinct first: exceptAll on raw feeds keeps *surplus
    # multiplicity* (a customer with 5 open / 2 filled orders would
    # survive 3×), which is not EXCEPT's set semantics
    return a.distinct().exceptAll(b.distinct())


# ---------------------------------------------------------------- r21

_R21_ORACLE = """
WITH px AS (
    SELECT l_partkey,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
           l_suppkey
    FROM lineitem),
m AS (
    SELECT l_partkey, min(price_c) AS min_price_c
    FROM px GROUP BY l_partkey)
SELECT px.l_partkey AS partkey,
       m.min_price_c,
       min(px.l_suppkey) AS suppkey
FROM px
JOIN m ON px.l_partkey = m.l_partkey AND px.price_c = m.min_price_c
GROUP BY px.l_partkey, m.min_price_c
"""


@register("r21_min_cost_supplier", _R21_ORACLE)
def q_r21(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier per part) as ONE ``min_by``
    aggregation over a lexicographic struct order — no self-join.
    The oracle spells the same thing the classic way (min subquery +
    join back + tie-break re-aggregation); ``min_by`` on
    ``struct(price, suppkey)`` is deterministic because the struct
    order is total."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"),
        _cents("l_extendedprice").alias("price_c"),
        F.col("l_suppkey").alias("suppkey"),
    )
    return li.groupBy("partkey").agg(
        F.min("price_c").alias("min_price_c"),
        F.min_by("suppkey", F.struct("price_c", "suppkey")).alias("suppkey"),
    )


# ---------------------------------------------------------------- r22

_R22_ORACLE = """
SELECT l_returnflag AS returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
           <= count(DISTINCT l_partkey) / 20 AS approx_within_5pct
FROM lineitem
GROUP BY l_returnflag
"""


@register("r22_sketch_distinct", _R22_ORACLE)
def q_r22(spark, sf_dir):
    """Sketch operator surface (HLL): the raw approximate counts are
    engine-specific (Spark HLL++ vs DuckDB HLL — never
    hash-comparable), so the gate checks the *contract* both
    sketches guarantee: the estimate lands within 5% of the exact
    distinct count (observed error ~0.5% at this cardinality — the
    boolean is deterministically true on both engines). Exact counts
    ride along and gate fully."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey")
                - F.count_distinct("l_partkey")
            )
            <= F.count_distinct("l_partkey") / 20
        ).alias("approx_within_5pct"),
    )
