"""The engine's analytic query catalog.

Each entry is one operator/query from SURVEY.md §2 (or a §7 LLM-pipeline
extension), expressed Spark-first, paired with the ANSI-SQL oracle the
driver runs through DuckDB. Naming contract: every computed column is
aliased identically in the Spark plan and the oracle SQL; double-valued
aggregates are rounded on BOTH sides so value-hashes are float-stable.

Queries run against the driver's synthetic lake (TESTDATA.md): TPC-H-ish
star schema (region nation customer supplier part orders lineitem), an
`events` stream table, and `documents`/`embeddings` for the LLM operators.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from nyc_taxi_data_pipeline_spark.functions import scalar, text, vector
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table


@dataclass(frozen=True)
class Query:
    """A catalog entry: Spark plan builder + optional DuckDB oracle SQL."""

    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def _register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


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
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
            F.broadcast(s),
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


_DIM_DISTINCT_ORACLE = """
SELECT DISTINCT
  o_orderstatus   AS order_status,
  o_orderpriority AS order_priority
FROM orders
WHERE o_orderstatus IS NOT NULL
ORDER BY order_status, order_priority
"""


@_register("dim_distinct_extraction", _DIM_DISTINCT_ORACLE)
def dim_distinct_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 + P7 + O1: dimension extraction exactly as the reference's dbt dim
    models do it — SELECT DISTINCT keys WHERE key IS NOT NULL ORDER BY key
    (reference: dim_vendor.sql:3-23 et al.)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isNotNull())
        .select(
            F.col("o_orderstatus").alias("order_status"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .distinct()
        .orderBy("order_status", "order_priority")
    )


_SURROGATE_ORACLE = """
SELECT
  md5(concat_ws('-',
      coalesce(CAST(n_nationkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      coalesce(CAST(n_name AS VARCHAR),      '_dbt_utils_surrogate_key_null_')))
                    AS nation_key,
  n_nationkey       AS n_nationkey,
  n_name            AS n_name
FROM nation
ORDER BY n_nationkey
"""


@_register("dim_surrogate_key", _SURROGATE_ORACLE)
def dim_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: dbt_utils-0.8.0-parity surrogate key (md5 of '-'-joined,
    null-coalesced casts; reference: dim_vendor.sql:13, fact_trip.sql:6)."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        scalar.surrogate_key("n_nationkey", "n_name").alias("nation_key"),
        "n_nationkey",
        "n_name",
    ).orderBy("n_nationkey")


_DECODE_ORACLE = """
SELECT
  l_returnflag AS l_returnflag,
  CASE l_returnflag
    WHEN 'A' THEN 'Accepted' WHEN 'N' THEN 'None' WHEN 'R' THEN 'Returned'
    ELSE 'Unknown' END       AS return_desc,
  CASE l_linestatus
    WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Finalized'
    ELSE 'Unknown' END       AS status_desc,
  count(*)                   AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, status_desc
"""


@_register("decode_dimensions", _DECODE_ORACLE)
def decode_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: small-domain CASE decode (the reference's dbt description macros,
    reconstructed as engine-owned decode tables — SURVEY.md F10)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            scalar.decode(
                "l_returnflag",
                {"A": "Accepted", "N": "None", "R": "Returned"},
            ).alias("return_desc"),
            scalar.decode(
                "l_linestatus", {"O": "Open", "F": "Finalized"}
            ).alias("status_desc"),
        )
        .groupBy("l_returnflag", "return_desc", "status_desc")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("l_returnflag", "return_desc", "status_desc", "n")
        .orderBy("l_returnflag", "status_desc")
    )


_TIME_DIMS_ORACLE = """
SELECT
  CAST(year(o_orderdate) AS INT)  AS order_year,
  monthname(o_orderdate)          AS order_month,
  dayname(o_orderdate)            AS order_dow,
  count(*)                        AS n_orders,
  round(sum(o_totalprice), 2)     AS total_price
FROM orders
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@_register("time_dimension_derivation", _TIME_DIMS_ORACLE)
def time_dimension_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F3: year / month-name / day-name derivation + groupBy, the
    reference's time-dimension recipe (datalake_to_dw.py:100-102) with
    locale-stable name lookup instead of date_format('MMMM'/'EEEE')."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            scalar.year_of("o_orderdate").alias("order_year"),
            scalar.month_name("o_orderdate").alias("order_month"),
            scalar.day_name("o_orderdate").alias("order_dow"),
            "o_totalprice",
        )
        .groupBy("order_year", "order_month", "order_dow")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("order_year", "order_month", "order_dow")
    )


_FILTER_CAST_ORACLE = """
SELECT
  event_id                                        AS event_id,
  user_id                                         AS user_id,
  event_type                                      AS event_type,
  CAST(round(value, 0) AS BIGINT)                 AS value_int,
  coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS prop_k
FROM events
WHERE value IS NOT NULL AND value BETWEEN 10 AND 500 AND event_type IS NOT NULL
ORDER BY event_id
"""


@_register("filter_cast_project", _FILTER_CAST_ORACLE)
def filter_cast_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P5/P7/P8 + F7-lite: predicate filters (not-null, between), numeric
    cast with null-coercion default (the DAG's to_numeric().fillna(0) contract,
    elt_pipeline_optimized_dag.py:116-118), JSON field extraction."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(
            F.col("value").isNotNull()
            & F.col("value").between(10, 500)
            & F.col("event_type").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round(F.col("value"), 0).cast("long").alias("value_int"),
            F.coalesce(
                F.get_json_object("props", "$.k").cast("long"), F.lit(0)
            ).alias("prop_k"),
        )
        .orderBy("event_id")
    )


_WINDOW_TOPK_ORACLE = """
SELECT * FROM (
  SELECT
    o_custkey    AS o_custkey,
    o_orderkey   AS o_orderkey,
    o_totalprice AS o_totalprice,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
ORDER BY o_custkey, rk
"""


@_register("window_topk_per_group", _WINDOW_TOPK_ORACLE)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 window ranking (engine extension — reference has no windows):
    top-3 orders per customer via row_number with a deterministic tiebreak.
    At scale this is one shuffle on the partition key; AQE handles skew."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    )


_DEDUP_LATEST_ORACLE = """
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT
    user_id, event_type, event_id, ts, value,
    row_number() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id, event_type
"""


@_register("dedup_keep_latest", _DEDUP_LATEST_ORACLE)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row_number dedup — the idiomatic replacement for the reference's
    group-by-every-column trick (SURVEY.md §2.5): keep the latest event per
    (user, type) with a deterministic tiebreak."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.select("user_id", "event_type", "event_id", "ts", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id", "event_type")
    )


_SEMI_ANTI_ORACLE = """
SELECT c_custkey, c_name, 'has_orders' AS cohort
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT c_custkey, c_name, 'no_orders' AS cohort
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY cohort, c_custkey
"""


@_register("semi_anti_join", _SEMI_ANTI_ORACLE)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins (SURVEY.md §2.3 note: the reference's dim
    filtering is semantically a semi-join; we expose both directly)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    has = c.join(o, c.c_custkey == o.o_custkey, "left_semi").withColumn(
        "cohort", F.lit("has_orders")
    )
    not_has = c.join(o, c.c_custkey == o.o_custkey, "left_anti").withColumn(
        "cohort", F.lit("no_orders")
    )
    return has.unionByName(not_has).orderBy("cohort", "c_custkey")


_SET_OPS_ORACLE = """
WITH building AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     auto     AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
SELECT c_nationkey, 'both' AS op FROM (SELECT * FROM building INTERSECT SELECT * FROM auto)
UNION ALL
SELECT c_nationkey, 'building_only' AS op FROM (SELECT * FROM building EXCEPT SELECT * FROM auto)
ORDER BY op, c_nationkey
"""


@_register("set_operations", _SET_OPS_ORACLE)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 + engine extensions: UNION ALL / INTERSECT / EXCEPT over
    projections (reference only has the dbt-starter UNION ALL)."""
    c = _t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    both = building.intersect(auto).withColumn("op", F.lit("both"))
    only = building.subtract(auto).withColumn("op", F.lit("building_only"))
    return both.unionByName(only).orderBy("op", "c_nationkey")


_ROLLUP_ORACLE = """
SELECT
  o_orderstatus               AS order_status,
  o_orderpriority             AS order_priority,
  count(*)                    AS n_orders,
  round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY order_status NULLS FIRST, order_priority NULLS FIRST
"""


@_register("rollup_aggregation", _ROLLUP_ORACLE)
def rollup_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 extension: hierarchical ROLLUP totals (status → priority →
    grand total) — native Catalyst expand+aggregate."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup(
            F.col("o_orderstatus").alias("order_status"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy(
            F.col("order_status").asc_nulls_first(),
            F.col("order_priority").asc_nulls_first(),
        )
    )


_PIVOT_ORACLE = """
SELECT
  user_id AS user_id,
  round(coalesce(sum(CASE WHEN event_type = 'click'    THEN value END), 0), 2) AS click,
  round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0), 2) AS purchase,
  round(coalesce(sum(CASE WHEN event_type = 'view'     THEN value END), 0), 2) AS view
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@_register("pivot_event_values", _PIVOT_ORACLE)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (engine extension): event_type → columns with summed values.
    Pivot values are declared explicitly so the plan is single-pass (no
    distinct-values pre-scan) — the scalable form."""
    e = _t(spark, sf_dir, "events")
    piv = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.sum("value"))
    )
    return piv.select(
        "user_id",
        *[
            F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c)
            for c in ("click", "purchase", "view")
        ],
    ).orderBy("user_id")


_QUALITY_ORACLE = """
SELECT rule, violations FROM (
  SELECT 'l_quantity_not_null' AS rule,
         count(*) FILTER (WHERE l_quantity IS NULL) AS violations FROM lineitem
  UNION ALL
  SELECT 'l_discount_between_0_1',
         count(*) FILTER (WHERE l_discount IS NOT NULL
                            AND l_discount NOT BETWEEN 0 AND 1) FROM lineitem
  UNION ALL
  SELECT 'l_quantity_between_0_100',
         count(*) FILTER (WHERE l_quantity IS NOT NULL
                            AND l_quantity NOT BETWEEN 0 AND 100) FROM lineitem
  UNION ALL
  SELECT 'l_shipdate_not_null',
         count(*) FILTER (WHERE l_shipdate IS NULL) FROM lineitem
) ORDER BY rule
"""


@_register("quality_expectations", _QUALITY_ORACLE)
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11: the Great-Expectations surface (not-null ×N + between ×M,
    validate_trip_data.json:5-92) as one single-pass conditional aggregation
    — one scan computes every rule's violation count, vs GX's
    one-query-per-expectation."""
    from nyc_taxi_data_pipeline_spark.operators.quality import (
        between_rule,
        not_null_rule,
        violations,
    )

    li = _t(spark, sf_dir, "lineitem")
    return violations(
        li,
        [
            not_null_rule("l_quantity"),
            between_rule("l_discount", 0, 1),
            between_rule("l_quantity", 0, 100),
            not_null_rule("l_shipdate"),
        ],
    ).orderBy("rule")
