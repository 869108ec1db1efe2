"""TPC-H-shaped relational benchmark queries (q01-q22).

Mechanically split out of the original single-module catalog
(plans/queries.py, round-4 judge ask #5); segment text is verbatim.
All entries register into the shared REGISTRY in plans._base.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from nyc_taxi_data_pipeline_spark.plans._base import (
    _register,
    _t,
)

__all__: list[str] = []

# ===========================================================================
# Core relational surface (SURVEY.md §2.2-2.8)
# ===========================================================================

_Q01_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                            AS sum_qty,
  round(sum(l_extendedprice), 2)                                       AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                    AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)      AS sum_charge,
  round(avg(l_quantity), 4)                                            AS avg_qty,
  round(avg(l_extendedprice), 4)                                       AS avg_price,
  round(avg(l_discount), 6)                                            AS avg_disc,
  count(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@_register("q01_pricing_summary", _Q01_ORACLE)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2-class multi-measure hash aggregation (SURVEY.md §2.4) in its
    canonical OLAP form (TPC-H Q1 shape): scan-filter-project feeding a
    partial+final HashAggregate. The filter and the 7-column projection
    push into the parquet scan; no Python anywhere."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q03_ORACLE = """
SELECT
  o.o_orderkey                                                AS o_orderkey,
  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)       AS revenue,
  o.o_orderdate                                               AS o_orderdate,
  o.o_orderpriority                                           AS o_orderpriority
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@_register("q03_top_revenue_orders", _Q03_ORACLE)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-aggregate-topk (J2-class star join + O1/O2 sort-limit). The
    customer dimension filter broadcasts; the orders↔lineitem join shuffles
    on orderkey; TakeOrderedAndProject caps the sort at k rows."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


_Q05_ORACLE = """
SELECT
  n.n_name                                               AS nation,
  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)  AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


@_register("q05_region_revenue", _Q05_ORACLE)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join (J1/J2 writ large): small dims broadcast, the
    fact-fact join shuffles once on orderkey. The local-supplier condition
    makes supplier a join with a compound key."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


# ===========================================================================
# Wave 10: TPC-H-shaped relational depth (Q7/Q12/Q14/Q19 patterns)
# ===========================================================================

_Q7_ORACLE = """
SELECT n1.n_name AS cust_nation,
       CAST(year(o.o_orderdate) AS INT) AS order_year,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, year(o.o_orderdate)
ORDER BY cust_nation, order_year
"""


@_register("q07_cross_nation_volume", _Q7_ORACLE)
def q07_cross_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: five-way join (two roles for nation), theta filter
    on the joined dims, revenue by customer nation x year. The two nation
    sides and supplier/customer broadcast; only lineitem⋈orders shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return (
        joined.groupBy(
            "cust_nation", F.year("o_orderdate").cast("int").alias("order_year")
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("cust_nation", "order_year")
    )


_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@_register("q12_priority_casesum", _Q12_ORACLE)
def q12_priority_casesum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: range-filtered join with conditional CASE sums (the
    pivot-style aggregation pattern); the shipdate filter pushes into the
    lineitem scan before the join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q14_ORACLE = """
SELECT CAST(round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
                  ELSE CAST(0 AS DECIMAL(38,6)) END)
       / sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 6)
       AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


@_register("q14_promo_share", _Q14_ORACLE)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate RATIO in one pass (promo
    revenue share). part broadcasts onto lineitem; decimal sums keep the
    ratio bit-stable across partitionings."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 6)
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


_Q19_ORACLE = """
SELECT count(*) AS n_matches,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


@_register("q19_bracket_disjunction", _Q19_ORACLE)
def q19_bracket_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-bracket predicate spanning both
    join sides — Catalyst extracts the common l_partkey=p_partkey equi-key
    so this stays a hash join with a residual OR filter, not a nested loop."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    return j.filter(bracket).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
    )


_Q04_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@_register("q04_exists_priority", _Q04_ORACLE)
def q04_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join — the probe
    side (filtered lineitem) is deduplicated by the semi-join itself, no
    distinct needed, and the orderdate filter pushes into the orders scan.
    (Adapted: l_quantity > 45 stands in for the snapshot's missing
    commitdate/receiptdate columns.)"""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q13_ORACLE = """
SELECT order_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS order_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) per_cust
GROUP BY order_count
ORDER BY custdist DESC, order_count DESC
"""


@_register("q13_order_count_distribution", _Q13_ORACLE)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with the filter INSIDE the join
    condition (a WHERE would silently drop zero-order customers), then a
    two-level aggregation — count(col) null-skipping semantics give the
    0-bucket for free."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return (
        per_cust.groupBy("order_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("order_count").desc())
    )


_Q17_ORACLE = """
WITH part_avg AS (
  SELECT l_partkey, avg(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,6))) / 7, 2)
            AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN part_avg ON part_avg.l_partkey = lineitem.l_partkey
WHERE p_brand = 'Brand#2' AND l_quantity < 0.5 * avg_qty
"""


@_register("q17_small_quantity_revenue", _Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into a groupBy + equi-join — the aggregate runs
    once over lineitem instead of per outer row. l_quantity is
    integer-valued so the double avg is exactly reproducible cross-engine
    (integer partial sums are exact in float64 regardless of add order)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(part_avg, li["l_partkey"] == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")) / 7, 2
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 270) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@_register("q18_large_volume_customers", _Q18_ORACLE)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery-with-HAVING decorrelated to an inner
    join against the filtered aggregate (the aggregate output is tiny after
    HAVING, so it broadcasts onto orders); top-100 by price with an
    orderkey tiebreak for determinism."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 270)
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS ab
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-08-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@_register("q22_idle_rich_customers", _Q22_ORACLE)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery (average positive balance)
    + NOT EXISTS anti-join. The scalar becomes a 1-row broadcast cross
    join, NOT EXISTS a LEFT ANTI join on custkey. The threshold is derived
    from an exact decimal sum cast to double — bit-identical in Spark and
    DuckDB, so the > comparison can't flip on summation order.
    (c_nationkey stands in for the snapshot's missing phone country code;
    "no orders" is "no orders since 2000-08-01" because the dense synthetic
    lake gives every customer at least one lifetime order, which would make
    the pure anti-join vacuously empty. The correlated predicate pushes into
    the anti-join's build side as a plain filter before the shuffle.)"""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-08-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ===========================================================================
# TPC-H completion wave: the 10 remaining query shapes (Q2/6/8/9/10/11/15/
# 16/20/21), adapted to the snapshot's lake (no partsupp table, no
# commit/receipt dates — the supply relation is derived from lineitem and
# "late" maps to l_returnflag='R'; every subquery/join SHAPE is preserved).
# ===========================================================================

_Q02_ORACLE = """
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eligible AS (
  SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
         sp.unit_cost
  FROM part p
  JOIN supply sp ON sp.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = sp.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE p.p_size = 25 AND r.r_name = 'EUROPE'
),
min_cost AS (
  SELECT p_partkey AS mc_partkey, min(unit_cost) AS mc
  FROM eligible GROUP BY p_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       round(unit_cost, 6) AS unit_cost
FROM eligible JOIN min_cost ON p_partkey = mc_partkey AND unit_cost = mc
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@_register("q02_min_cost_supplier", _Q02_ORACLE)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery ("the supplier offering the
    minimum cost for this part in this region") decorrelated into an
    aggregate + self-equi-join on (partkey, min_cost). The snapshot has no
    partsupp table, so the supply relation is derived as the distinct
    (part, supplier) pairs observed in lineitem with unit_cost =
    min(extendedprice/quantity) — same join topology, same decorrelation.
    Both min() reductions are order-independent over identical float64
    values, so the double-equality join key is cross-engine safe."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 25)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eligible = (
        supply.join(p, F.col("l_partkey") == p["p_partkey"])
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        # consumed twice (rows + per-part min); AQE won't reuse a derived
        # frame's stages across a self-join — materialize once
        .localCheckpoint(eager=False)
    )
    min_cost = eligible.groupBy(F.col("p_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("mc")
    )
    return (
        eligible.join(
            min_cost,
            (F.col("p_partkey") == F.col("mc_partkey"))
            & (F.col("unit_cost") == F.col("mc")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_Q06_ORACLE = """
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@_register("q06_forecast_revenue", _Q06_ORACLE)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, the canonical pushdown
    probe. All four predicates (two timestamp range, one double range, one
    double bound) reach the parquet scan as PushedFilters; the single global
    sum is a 2-phase partial+final agg with a 1-row result. Product computed
    in float64 (deterministic), then cast to decimal for order-independent
    summation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(38,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


_Q08_ORACLE = """
WITH all_vol AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)) AS vol,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o    ON l.l_orderkey = o.o_orderkey
  JOIN customer c  ON o.o_custkey = c.c_custkey
  JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
  JOIN region r    ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s  ON l.l_suppkey = s.s_suppkey
  JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
  JOIN part p      ON l.l_partkey = p.p_partkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol
                           ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
             / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
FROM all_vol
GROUP BY o_year
ORDER BY o_year
"""


@_register("q08_market_share", _Q08_ORACLE)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — an 8-table join feeding a
    conditional-aggregate ratio per year. nation joins twice under different
    roles (customer's vs supplier's). All dims broadcast; the only shuffles
    are lineitem↔orders on orderkey and the final 7-group agg. Numerator
    and denominator are exact decimal sums cast to double before the
    divide, so the ratio is bit-identical cross-engine."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cn = _t(spark, sf_dir, "nation").alias("cn")
    sn = _t(spark, sf_dir, "nation").alias("sn")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    all_vol = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn.n_nationkey"))
        .join(F.broadcast(r), F.col("cn.n_regionkey") == r["r_regionkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn.n_nationkey"))
        .join(p, li["l_partkey"] == p["p_partkey"])
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(38,6)")
    return (
        all_vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", F.col("vol"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("vol").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q09_ORACLE = """
SELECT sn.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(round(sum(CAST(
           l.l_extendedprice * (1 - l.l_discount)
           - 0.05 * p.p_retailprice * l.l_quantity AS DECIMAL(38,6))), 2)
            AS DOUBLE) AS profit
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN part p     ON l.l_partkey = p.p_partkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@_register("q09_product_profit", _Q09_ORACLE)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by supplier nation and year.
    The snapshot lacks partsupp.ps_supplycost, so cost is proxied as
    5% of p_retailprice per unit — same expression tree (revenue minus
    cost over a LIKE-filtered part join), same group-by. The LIKE '%red%'
    is a Contains filter pushed to the part scan; part and supplier
    broadcast, lineitem↔orders shuffles once."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    sn = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.05 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(38,6)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == sn["n_nationkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(
            sn["n_name"].alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
       round(c.c_acctbal, 2) AS c_acctbal,
       n.n_name AS n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@_register("q10_returned_items", _Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking — join-agg-topk with
    a quarter date window on orders and a returnflag filter on lineitem,
    both pushed to their scans before the orderkey shuffle join. Top-20 by
    revenue runs as TakeOrderedAndProject (no global sort)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"), "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_Q11_ORACLE = """
WITH nation_value AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS value_dec
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
),
total AS (SELECT sum(value_dec) AS tot FROM nation_value)
SELECT l_partkey AS p_partkey,
       CAST(round(value_dec, 2) AS DOUBLE) AS part_value
FROM nation_value, total
WHERE value_dec > 0.002 * tot
ORDER BY part_value DESC, p_partkey
"""


@_register("q11_important_stock", _Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value within one nation, kept only when it
    exceeds a fraction of the nation's total — a HAVING against a global
    scalar subquery. The scalar re-aggregates the grouped frame (tiny) and
    cross-joins back as a 1-row broadcast. The threshold comparison happens
    in exact decimal on both engines, so no summation-order flip. The
    snapshot lacks partsupp, so value = shipped extendedprice (same
    topology: supply relation × supplier × nation)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nation_value = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias(
                "value_dec"
            )
        )
        # consumed twice (rows + global total) — materialize once
        .localCheckpoint(eager=False)
    )
    total = nation_value.agg(F.sum("value_dec").alias("tot"))
    return (
        nation_value.join(F.broadcast(total))
        .filter(F.col("value_dec") > F.lit(0.002) * F.col("tot"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value_dec", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("p_partkey"))
    )


_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@_register("q15_top_supplier", _Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue "view" (quarterly per-supplier agg) is
    consumed twice — once joined to supplier, once reduced to its max — and
    the filter equates them. The view is computed once and reused; its max
    is a 1-row broadcast. Comparing the already-rounded decimal-derived
    doubles makes the double-equality deterministic cross-engine."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("total_revenue")
        )
        # consumed twice (join side + its own max) — materialize once
        .localCheckpoint(eager=False)
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        s
        .join(revenue, s["s_suppkey"] == revenue["supplier_no"])
        .join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 17, 25, 33, 41, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@_register("q16_supplier_part_variety", _Q16_ORACLE)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute bucket
    with negated predicates (<>, NOT LIKE→<>, IN-list) and a NOT IN
    exclusion subquery (suppliers with negative balance stand in for the
    reference's complaint filter). NOT IN on a non-nullable key lowers to
    LEFT ANTI; distinct-count shuffles once on the group keys after an
    expand-free partial distinct."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 17, 25, 33, 41, 49))
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(
            bad_supp,
            li["l_suppkey"] == bad_supp["s_suppkey"],
            "left_anti",
        )
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


_Q20_ORACLE = """
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
)
SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND EXISTS (
    SELECT 1 FROM shipped sh
    JOIN part p ON p.p_partkey = sh.l_partkey
    WHERE sh.l_suppkey = s.s_suppkey
      AND p.p_name LIKE '%bolt%'
      AND sh.qty > 40
  )
ORDER BY s.s_name
"""


@_register("q20_excess_stock_suppliers", _Q20_ORACLE)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain — suppliers (in a region)
    having EXISTS a part (name LIKE) whose correlated aggregate (year's
    shipped quantity) clears a threshold. The correlated agg decorrelates
    to a groupBy over (suppkey, partkey); the EXISTS lowers to LEFT SEMI
    against the thresholded aggregate. partsupp.ps_availqty is absent, so
    the threshold is on shipped quantity itself — identical shape."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
    )
    qualifying = shipped.join(
        p, shipped["l_partkey"] == p["p_partkey"]
    ).select("l_suppkey")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(
            qualifying, s["s_suppkey"] == qualifying["l_suppkey"], "left_semi"
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


_Q21_ORACLE = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@_register("q21_waiting_suppliers", _Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: doubly-correlated EXISTS + NOT EXISTS self-joins on
    lineitem — "the only supplier who returned goods in a multi-supplier
    failed order" (returnflag='R' stands in for the missing receipt>commit
    late test). Both correlations keep l_orderkey as the equi key with the
    supplier inequality as residual, so they lower to shuffled LEFT SEMI /
    LEFT ANTI hash joins, not nested loops."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    waiting = (
        l1.join(o, F.col("l1.l_orderkey") == o["o_orderkey"])
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(s, F.col("l1.l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )
