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
        if name in REGISTRY:
            raise ValueError(f"duplicate catalog entry name: {name!r}")
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


# ===========================================================================
# Taxi-parity pipeline (SURVEY.md §3.1) — the reference's raw→staging→star
# lifecycle exercised end-to-end on the synthetic lake. `lineitem` rows are
# deterministically mapped into raw trip-record shape (mixed-case yellow
# variant), then flow through the REAL operator modules:
# normalize (P1-P6) → derive_time_dims (F1-F3) → staging_aggregate (A1/A2)
# → star dims/fact (A3/J2/F9/F10).
# ===========================================================================

def _raw_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → raw yellow-trip records (mixed-case columns exercise P2;
    RatecodeID spans 1..8 so the dim's <7 domain filter bites; quantities
    >45 become null passenger_count so dropna (P5) has work to do)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        ((F.col("l_suppkey") % 2) + 1).alias("VendorID"),
        F.col("l_shipdate").alias("tpep_pickup_datetime"),
        F.expr(
            "timestampadd(MINUTE, cast(l_quantity as int) * 3, l_shipdate)"
        ).alias("tpep_dropoff_datetime"),
        ((F.col("l_linenumber") % 8) + 1).cast("double").alias("RatecodeID"),
        ((F.col("l_partkey") % 25) + 1).alias("PULocationID"),
        ((F.col("l_suppkey") % 25) + 1).alias("DOLocationID"),
        ((F.col("l_orderkey") % 6) + 1).alias("payment_type"),
        F.when(F.col("l_quantity") > 45, F.lit(None).cast("double"))
        .otherwise(F.col("l_quantity"))
        .alias("passenger_count"),
        (F.col("l_quantity") * F.lit(2.0)).alias("trip_distance"),
        F.col("l_extendedprice").alias("fare_amount"),
        F.col("l_discount").alias("extra"),
        F.col("l_tax").alias("mta_tax"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("tip_amount"),
        F.lit(0.0).alias("tolls_amount"),
        F.lit(0.3).alias("improvement_surcharge"),
        (F.col("l_extendedprice") * (F.lit(1.0) + F.col("l_tax"))).alias("total_amount"),
        F.lit(2.5).alias("congestion_surcharge"),
        F.lit("N").alias("store_and_fwd_flag"),
    )


# The same mapping as ANSI SQL (post-normalize names/types), shared by the
# pipeline oracles. dropna(passenger_count) ≡ WHERE l_quantity <= 45.
_TRIPS_CTE = """
trips AS (
  SELECT
    CAST((l_suppkey % 2) + 1 AS INTEGER)        AS vendor_id,
    l_shipdate                                  AS pickup_datetime,
    l_shipdate + CAST(l_quantity AS INT) * 3 * INTERVAL '1 minute'
                                                AS dropoff_datetime,
    CAST((l_linenumber % 8) + 1 AS INTEGER)     AS rate_code_id,
    CAST((l_partkey % 25) + 1 AS INTEGER)       AS pickup_location_id,
    CAST((l_suppkey % 25) + 1 AS INTEGER)       AS dropoff_location_id,
    CAST((l_orderkey % 6) + 1 AS INTEGER)       AS payment_type_id,
    l_quantity                                  AS passenger_count,
    l_quantity * CAST(2.0 AS DOUBLE)            AS trip_distance,
    l_extendedprice                             AS fare_amount,
    l_discount                                  AS extra,
    l_tax                                       AS mta_tax,
    l_extendedprice * l_discount                AS tip_amount,
    CAST(0.0 AS DOUBLE)                         AS tolls_amount,
    CAST(0.3 AS DOUBLE)                         AS improvement_surcharge,
    l_extendedprice * (CAST(1.0 AS DOUBLE) + l_tax) AS total_amount,
    CAST(2.5 AS DOUBLE)                         AS congestion_surcharge
  FROM lineitem
  WHERE l_quantity <= 45
)
"""

_STAGING_CTE = _TRIPS_CTE + """,
staging AS (
  SELECT
    CAST(year(pickup_datetime) AS VARCHAR) AS year,
    monthname(pickup_datetime)             AS month,
    dayname(pickup_datetime)               AS dow,
    vendor_id, rate_code_id, pickup_location_id, dropoff_location_id,
    payment_type_id, pickup_datetime, dropoff_datetime,
    sum(passenger_count) AS passenger_count,
    sum(trip_distance)   AS trip_distance,
    sum(extra)           AS extra,
    sum(mta_tax)         AS mta_tax,
    sum(fare_amount)     AS fare_amount,
    sum(tip_amount)      AS tip_amount,
    sum(tolls_amount)    AS tolls_amount,
    sum(total_amount)    AS total_amount,
    sum(improvement_surcharge) AS improvement_surcharge,
    sum(congestion_surcharge)  AS congestion_surcharge,
    1 AS service_type
  FROM trips
  GROUP BY ALL
)
"""


def _staging_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raw → normalize (P1-P6) → time dims (F1-F3) → staging agg (A1/A2)."""
    from nyc_taxi_data_pipeline_spark.operators.aggregate import (
        derive_time_dims,
        staging_aggregate,
    )
    from nyc_taxi_data_pipeline_spark.operators.normalize import normalize

    trips = normalize(_raw_trips(spark, sf_dir))
    return staging_aggregate(derive_time_dims(trips, "pickup_datetime"))


_NORMALIZE_ORACLE = (
    "WITH " + _TRIPS_CTE + """
SELECT
  congestion_surcharge, dropoff_datetime, dropoff_location_id, extra,
  fare_amount, improvement_surcharge, mta_tax, passenger_count,
  payment_type_id, pickup_datetime, pickup_location_id, rate_code_id,
  tip_amount, tolls_amount, total_amount, trip_distance, vendor_id
FROM trips
"""
)


@_register("normalize_trip_schema", _NORMALIZE_ORACLE)
def normalize_trip_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P6 end-to-end: mixed-case yellow-variant columns → lowercased,
    variant-renamed, operational columns dropped, ids int-cast, null rows
    dropped, columns alphabetized (reference contract:
    scripts/transform_data.py:76-118)."""
    from nyc_taxi_data_pipeline_spark.operators.normalize import normalize

    return normalize(_raw_trips(spark, sf_dir))


_STAGING_AGG_ORACLE = (
    "WITH " + _STAGING_CTE + """
SELECT
  year, month, dow, vendor_id, rate_code_id, payment_type_id, service_type,
  count(*) AS n_rows,
  CAST(round(sum(CAST(passenger_count AS DECIMAL(38,6))), 2) AS DOUBLE)
    AS passenger_count,
  CAST(round(sum(CAST(trip_distance AS DECIMAL(38,6))), 2) AS DOUBLE)
    AS trip_distance,
  CAST(round(sum(CAST(fare_amount AS DECIMAL(38,6))), 2) AS DOUBLE)
    AS fare_amount,
  CAST(round(sum(CAST(tip_amount AS DECIMAL(38,6))), 2) AS DOUBLE)
    AS tip_amount,
  CAST(round(sum(CAST(total_amount AS DECIMAL(38,6))), 2) AS DOUBLE)
    AS total_amount,
  CAST(round(sum(CAST(congestion_surcharge AS DECIMAL(38,6))), 2) AS DOUBLE)
    AS congestion_surcharge
FROM staging
GROUP BY ALL
ORDER BY year, month, dow, vendor_id, rate_code_id, payment_type_id
"""
)


@_register("staging_pipeline_aggregate", _STAGING_AGG_ORACLE)
def staging_pipeline_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's batch core end-to-end (§3.1): normalize → derive
    year/month/dow → A1/A2 staging aggregation, rolled up to reporting
    grain for comparison."""
    staging = _staging_trips(spark, sf_dir)
    return (
        staging.groupBy(
            "year", "month", "dow", "vendor_id", "rate_code_id",
            "payment_type_id", "service_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # decimal-sum: order-independent addition so the rolled-up totals
            # are bit-identical across engines/partitionings
            *[
                F.round(F.sum(F.col(c).cast("decimal(38,6)")), 2)
                .cast("double")
                .alias(c)
                for c in (
                    "passenger_count",
                    "trip_distance",
                    "fare_amount",
                    "tip_amount",
                    "total_amount",
                    "congestion_surcharge",
                )
            ],
        )
        .orderBy("year", "month", "dow", "vendor_id", "rate_code_id", "payment_type_id")
    )


_DIM_RATE_ORACLE = (
    "WITH " + _STAGING_CTE + """
SELECT
  md5(concat_ws('-', coalesce(CAST(rate_code_id AS VARCHAR),
                              '_dbt_utils_surrogate_key_null_')))  AS rate_code_key,
  rate_code_id AS rate_code_id,
  CASE rate_code_id
    WHEN 1 THEN 'Standard rate' WHEN 2 THEN 'JFK' WHEN 3 THEN 'Newark'
    WHEN 4 THEN 'Nassau or Westchester' WHEN 5 THEN 'Negotiated fare'
    WHEN 6 THEN 'Group ride' ELSE 'Unknown' END AS rate_code_description
FROM (SELECT DISTINCT rate_code_id FROM staging
      WHERE rate_code_id IS NOT NULL AND CAST(rate_code_id AS INTEGER) < 7)
ORDER BY rate_code_id
"""
)


@_register("star_dim_rate_code", _DIM_RATE_ORACLE)
def star_dim_rate_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+F9+F10+P8+O1: the dbt dim model shape (dim_rate_code.sql:3-23) —
    distinct, not-null + domain (<7) filters, dbt-parity surrogate key,
    TLC decode, ordered output."""
    from nyc_taxi_data_pipeline_spark.operators.warehouse import dim_rate_code

    return dim_rate_code(_staging_trips(spark, sf_dir))


_FACT_ORACLE = (
    "WITH " + _STAGING_CTE + """,
dim_vendor AS (
  SELECT md5(concat_ws('-', coalesce(CAST(vendor_id AS VARCHAR),
             '_dbt_utils_surrogate_key_null_'))) AS vendor_key, vendor_id
  FROM (SELECT DISTINCT vendor_id FROM staging
        WHERE vendor_id IS NOT NULL AND CAST(vendor_id AS INTEGER) < 3)),
dim_rate AS (
  SELECT md5(concat_ws('-', coalesce(CAST(rate_code_id AS VARCHAR),
             '_dbt_utils_surrogate_key_null_'))) AS rate_code_key, rate_code_id
  FROM (SELECT DISTINCT rate_code_id FROM staging
        WHERE rate_code_id IS NOT NULL AND CAST(rate_code_id AS INTEGER) < 7)),
dim_payment AS (
  SELECT md5(concat_ws('-', coalesce(CAST(payment_type_id AS VARCHAR),
             '_dbt_utils_surrogate_key_null_'))) AS payment_type_key, payment_type_id
  FROM (SELECT DISTINCT payment_type_id FROM staging
        WHERE payment_type_id IS NOT NULL)),
fact AS (
  SELECT
    md5(concat_ws('-',
      coalesce(CAST(s.vendor_id AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      coalesce(CAST(s.rate_code_id AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      coalesce(CAST(s.pickup_location_id AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      coalesce(CAST(s.dropoff_location_id AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      coalesce(CAST(s.payment_type_id AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      coalesce(CAST(s.service_type AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      coalesce(CAST(s.pickup_datetime AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      coalesce(CAST(s.dropoff_datetime AS VARCHAR), '_dbt_utils_surrogate_key_null_')
    )) AS trip_id,
    dv.vendor_key, dr.rate_code_key, dp.payment_type_key, s.fare_amount
  FROM staging s
  JOIN dim_vendor dv ON s.vendor_id = dv.vendor_id
  JOIN dim_rate dr   ON s.rate_code_id = dr.rate_code_id
  JOIN dim_payment dp ON s.payment_type_id = dp.payment_type_id)
SELECT
  vendor_key, rate_code_key, payment_type_key,
  count(*)                 AS n_trips,
  count(DISTINCT trip_id)  AS n_trip_ids,
  round(sum(fare_amount), 2) AS fare_amount
FROM fact
GROUP BY ALL
ORDER BY vendor_key, rate_code_key, payment_type_key
"""
)


@_register("star_fact_summary", _FACT_ORACLE)
def star_fact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+F9: fact_trip (fact_trip.sql:6-39) — 8-column surrogate trip_id,
    three broadcast dim joins whose domain filters act as semi-joins —
    summarized per dim-key triple."""
    from nyc_taxi_data_pipeline_spark.operators.warehouse import (
        dim_payment,
        dim_rate_code,
        dim_vendor,
        fact_trip,
    )

    # staging feeds 3 dims + the fact — materialize it once, exactly as the
    # reference materializes staging.nyc_taxi before dbt builds the star
    staging = _staging_trips(spark, sf_dir).localCheckpoint(eager=False)
    fact = fact_trip(
        staging, dim_vendor(staging), dim_rate_code(staging), dim_payment(staging)
    )
    return (
        fact.groupBy("vendor_key", "rate_code_key", "payment_type_key")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.countDistinct("trip_id").alias("n_trip_ids"),
            F.round(F.sum("fare_amount"), 2).alias("fare_amount"),
        )
        .orderBy("vendor_key", "rate_code_key", "payment_type_key")
    )


_ZONE_ORACLE = """
WITH lookup AS (
  SELECT n_nationkey + 1                               AS LocationID,
         round(n_nationkey * CAST(1.7 AS DOUBLE) - 12.0, 4) AS latitude,
         round(n_regionkey * CAST(15.5 AS DOUBLE) - 30.0, 4) AS longitude
  FROM nation WHERE n_nationkey + 1 <= 20
),
trips AS (
  SELECT c_custkey, (c_custkey % 25) + 1 AS pickup_location_id,
         c_nationkey + 1 AS dropoff_location_id
  FROM customer
)
SELECT
  t.c_custkey             AS c_custkey,
  pu.latitude             AS pickup_latitude,
  pu.longitude            AS pickup_longitude,
  dof.latitude            AS dropoff_latitude,
  dof.longitude           AS dropoff_longitude
FROM trips t
JOIN lookup pu  ON t.pickup_location_id  = pu.LocationID
JOIN lookup dof ON t.dropoff_location_id = dof.LocationID
ORDER BY c_custkey
"""


@_register("zone_enrichment_join", _ZONE_ORACLE)
def zone_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: double broadcast lookup-enrichment with the reference's
    inner-drop contract (transform_data.py:39-64) — rows whose pickup OR
    dropoff id misses the (truncated) lookup vanish."""
    from nyc_taxi_data_pipeline_spark.operators.enrich import enrich_pickup_dropoff

    n = _t(spark, sf_dir, "nation")
    lookup = n.select(
        (F.col("n_nationkey") + 1).alias("LocationID"),
        F.round(F.col("n_nationkey") * F.lit(1.7) - F.lit(12.0), 4).alias("latitude"),
        F.round(F.col("n_regionkey") * F.lit(15.5) - F.lit(30.0), 4).alias("longitude"),
    ).filter(F.col("LocationID") <= 20)
    trips = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") % 25) + 1).alias("pickup_location_id"),
        (F.col("c_nationkey") + 1).alias("dropoff_location_id"),
    )
    return (
        enrich_pickup_dropoff(trips, lookup)
        .select(
            "c_custkey",
            "pickup_latitude",
            "pickup_longitude",
            "dropoff_latitude",
            "dropoff_longitude",
        )
        .orderBy("c_custkey")
    )


# ===========================================================================
# Temporal & streaming surface (operators/temporal.py, streaming/)
# ===========================================================================

_ASOF_ORACLE = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
p0 AS (
  SELECT user_id, ts AS purchase_ts, value AS purchase_value,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
),
purchases AS (SELECT user_id, purchase_ts, purchase_value FROM p0 WHERE rn = 1)
SELECT c.event_id AS event_id, c.user_id AS user_id, c.ts AS ts,
       p.purchase_ts AS purchase_ts,
       round(p.purchase_value, 2) AS purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
ORDER BY c.event_id
"""


@_register("asof_join_attribution", _ASOF_ORACLE)
def asof_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (an operator Spark lacks natively): each click is
    attributed to the user's most recent purchase at or before it.
    Implemented as tag-union + last(ignorenulls) over one key-partitioned
    window — single shuffle, linear, no pandas (operators/temporal.py)."""
    from nyc_taxi_data_pipeline_spark.operators.temporal import as_of_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    w = W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    out = as_of_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="purchase_ts",
        right_cols=["purchase_ts", "purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_ts",
        F.round("purchase_value", 2).alias("purchase_value"),
    ).orderBy("event_id")


_SESSION_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
tagged AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         min(ts) AS session_start, max(ts) AS session_end
  FROM tagged GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       round(avg(CAST(floor(epoch(session_end)) AS BIGINT)
                 - CAST(floor(epoch(session_start)) AS BIGINT)), 4)
         AS avg_session_seconds
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""


@_register("sessionization_stats", _SESSION_ORACLE)
def sessionization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) via lag + running sum —
    one shuffle on the key (operators/temporal.py)."""
    from nyc_taxi_data_pipeline_spark.operators.temporal import session_stats

    e = _t(spark, sf_dir, "events")
    return session_stats(e, key="user_id", ts_col="ts", gap_minutes=30).orderBy(
        "user_id"
    )


_STREAM_WINDOW_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `events` table as a Structured Streaming file source (the CI
    stand-in for Kafka, SURVEY.md §2.1 S6 note). Adapts to the table's
    physical timestamp encoding the same way sources/catalog.py does:
    TIMESTAMP(NANOS) arrives as long (legacy conf) and truncates to
    micros; plain micros arrives as TIMESTAMP_NTZ and casts to an instant
    (value-preserving under the UTC session tz pinned here)."""
    from pyspark.sql import types as T

    from nyc_taxi_data_pipeline_spark.sources.catalog import table_path

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    # file-stream sources want a directory; glob-filter down to the table
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if isinstance(schema["ts"].dataType, T.LongType):
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


@_register("streaming_window_counts", _STREAM_WINDOW_ORACLE)
def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming end-to-end (ST1-ST7 + the event-time windowed
    aggregation the reference never built): file-source stream → watermark →
    tumbling 1h window → memory sink, drained deterministically with
    processAllAvailable. The returned frame is the materialized sink."""
    import uuid

    from nyc_taxi_data_pipeline_spark.streaming.sinks import (
        run_stream_to_memory,
        windowed_counts,
    )

    stream = _events_stream(spark, sf_dir)
    agg = windowed_counts(stream, ts_col="ts", key_col="event_type", window="1 hour")
    sink = run_stream_to_memory(agg, f"win_{uuid.uuid4().hex[:8]}")
    return sink.orderBy("window_start", "event_type")


_CDC_ORACLE = """
SELECT CAST(user_id % 3 AS INTEGER) AS vendorid,
       ts                           AS tpep_pickup_datetime,
       value                        AS passenger_count,
       CAST(event_id % 100000 AS INTEGER) AS pulocationid
FROM events
ORDER BY pulocationid
"""


@_register("cdc_envelope_roundtrip", _CDC_ORACLE)
def cdc_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8/ST8: events are wrapped into Debezium envelopes (JSON
    payload.after with epoch-micros timestamps) then decoded with the
    engine's parse_debezium — proving the CDC path bit-exact without Kafka."""
    from pyspark.sql import types as T

    from nyc_taxi_data_pipeline_spark.streaming.cdc import parse_debezium

    e = _t(spark, sf_dir, "events")
    wire = e.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.struct(
                        (F.col("user_id") % 3).cast("int").alias("vendorid"),
                        # load_table already normalizes ts to TimestampType;
                        # the cast is a defensive no-op kept for loaders that
                        # bypass catalog normalization (raw spark.read paths)
                        F.unix_micros(F.col("ts").cast("timestamp")).alias(
                            "tpep_pickup_datetime"
                        ),
                        F.col("value").alias("passenger_count"),
                        (F.col("event_id") % 100000).cast("int").alias("pulocationid"),
                    ).alias("after")
                ).alias("payload")
            )
        ).alias("value")
    )
    fields = {
        "vendorid": T.IntegerType(),
        "tpep_pickup_datetime": T.LongType(),
        "passenger_count": T.DoubleType(),
        "pulocationid": T.IntegerType(),
    }
    decoded = parse_debezium(
        wire, fields=fields, epoch_micros_cols=("tpep_pickup_datetime",)
    )
    return decoded.orderBy("pulocationid")


# ===========================================================================
# LLM-data-pipeline operators (BASELINE.json north star): dedup, similarity
# search, text analysis, multimodal plumbing — on documents/embeddings.
# ===========================================================================

_DEDUP_EXACT_ORACLE = """
SELECT doc_id, lang, source, n_chars FROM (
  SELECT doc_id, lang, source, n_chars,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
ORDER BY doc_id
"""


@_register("dedup_exact_documents", _DEDUP_EXACT_ORACLE)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest-id document per identical text —
    one hash shuffle on the text (operators/dedup.exact_dedup)."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d, ["text"], "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    ).orderBy("doc_id")


_DEDUP_NORM_ORACLE = r"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
              '[!-/:-@\[-`{-~]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT min(doc_id) AS doc_id, count(*) AS n_dups
FROM n GROUP BY norm
ORDER BY doc_id
"""


@_register("dedup_normalized_documents", _DEDUP_NORM_ORACLE)
def dedup_normalized_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-style dedup at the semantic level the engine's
    fingerprint hashes (lowercase, punctuation stripped, whitespace
    collapsed): keep min doc_id per normalized text + duplicate count."""
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[!-/:-@\[-`{-~]", " "),
            r"\s+",
            " ",
        )
    )
    return (
        d.groupBy(norm.alias("__norm"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("doc_id", "n_dups")
        .orderBy("doc_id")
    )


_FP_PORTABLE_ORACLE = r"""
WITH n AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[!-/:-@\[-`{-~]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
  FROM documents
)
SELECT min(doc_id) AS doc_id FROM n GROUP BY fp ORDER BY doc_id
"""


@_register("dedup_fingerprint_portable", _FP_PORTABLE_ORACLE)
def dedup_fingerprint_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint dedup on the PORTABLE md5 lane (operators/dedup.
    fingerprint_dedup_portable): dedup key is the md5 of the normalized
    text, reproducible bit-identically in any engine — so the oracle runs
    the ACTUAL hash-key algorithm instead of a rows-only check. The
    8-byte xxhash64 production lane (fingerprint_dedup) keeps the same
    single-shuffle shape and is pinned equal-output-to-this-lane in
    tests/test_operators.py."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import fingerprint_dedup_portable

    d = _t(spark, sf_dir, "documents")
    return (
        fingerprint_dedup_portable(d, "text", "doc_id")
        .select("doc_id")
        .orderBy("doc_id")
    )


_CORPUS_HEALTH_ORACLE = r"""
WITH base AS (
  SELECT source, lang,
         md5(trim(regexp_replace(
             regexp_replace(lower(text), '[!-/:-@\[-`{-~]', ' ', 'g'),
             '\s+', ' ', 'g'))) AS fp,
         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
per_source AS (
  SELECT source,
         count(*)                         AS n_docs,
         count(DISTINCT fp)               AS n_unique,
         CAST(sum(n_tokens) AS BIGINT)    AS total_tokens
  FROM base GROUP BY source
),
langs AS (
  SELECT source, lang, count(*) AS c,
         row_number() OVER (PARTITION BY source
                            ORDER BY count(*) DESC, lang) AS rn
  FROM base GROUP BY source, lang
)
SELECT p.source,
       p.n_docs,
       p.total_tokens,
       (1000000 * (p.n_docs - p.n_unique)) // p.n_docs AS dup_ppm,
       (1000000 * p.total_tokens) // p.n_docs          AS tokens_per_doc_ppm,
       l.lang                                          AS top_lang,
       (1000000 * l.c) // p.n_docs                     AS top_lang_ppm
FROM per_source p
JOIN langs l ON l.source = p.source AND l.rn = 1
ORDER BY p.source
"""


@_register("corpus_health_by_source", _CORPUS_HEALTH_ORACLE)
def corpus_health_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus HEALTH REPORT — the one-screen summary a
    curation run emits per ingest: document count, token volume,
    normalized-fingerprint duplicate rate, mean document length, and the
    dominant language with its share (all shares in exact integer ppm).
    This is the table that decides per-source mixing weights and flags a
    domain gone bad (dup_ppm spike = a crawler loop; tokens_per_doc
    collapse = truncation upstream; top_lang flip = routing bug).
    Fingerprints reuse the engine's ONE normalization recipe
    (functions/text._fingerprint_normalized — same regex classes on
    both sides) so the dup rate here equals what fingerprint dedup will
    remove. Scale shape: one scan; count(DISTINCT fp) shuffles on
    (source, fp) with partial dedup map-side; the language argmax is a
    bounded two-level aggregate + a tiny window — per-source rows, not
    corpus rows. Deterministic top-lang tie-break (count desc, lang)."""
    from nyc_taxi_data_pipeline_spark.functions.text import (
        _fingerprint_normalized,
    )

    d = _t(spark, sf_dir, "documents")
    base = d.filter(F.col("text").isNotNull()).select(
        "source",
        "lang",
        F.md5(_fingerprint_normalized("text")).alias("fp"),
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "n_tokens"
        ),
    )
    per_source = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    langs = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.col("c").desc(), "lang")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        per_source.join(langs.select("source", "lang", "c"), "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.expr("(1000000 * (n_docs - n_unique)) div n_docs").alias(
                "dup_ppm"
            ),
            F.expr("(1000000 * total_tokens) div n_docs").alias(
                "tokens_per_doc_ppm"
            ),
            F.col("lang").alias("top_lang"),
            F.expr("(1000000 * c) div n_docs").alias("top_lang_ppm"),
        )
        .orderBy("source")
    )


# Shared per-dimension moment expressions: the mean/variance are ROUNDED
# IN EXACT INTEGER/DECIMAL ARITHMETIC ((2a+b) intdiv (2b) = round-half-up
# of a/b for a >= 0, mirrored for negative a) and only the final exact
# integer is cast to double — round() over doubles ties at terminating
# decimal boundaries (sv/2e9 terminates within 10 digits) and the two
# engines break such ties differently, which the sf0.1 sweep caught.
# The only dialect difference is the integer-division spelling, threaded
# through as {d} ("div" in Spark, "//" in DuckDB).


def _dim_mean_e8(d: str) -> str:
    return (
        f"CAST(CASE WHEN sv >= 0 THEN (200 * sv + n) {d} (2 * n) "
        f"ELSE -((200 * (-sv) + n) {d} (2 * n)) END AS BIGINT)"
    )


def _dim_var_e8(d: str) -> str:
    # varnum = n*sq - sv^2 >= 0 (Cauchy-Schwarz), widths ride DECIMAL(38,0).
    # DuckDB's // on DECIMAL operands is NOT integer division (it returns
    # the fractional quotient, and a later CAST would round, not floor), so
    # the DuckDB lane spells floor(a/b) explicitly; Spark's div truncates,
    # identical for the non-negative operands here.
    num = (
        "2 * (CAST(n AS DECIMAL(38,0)) * sq "
        "- CAST(sv AS DECIMAL(38,0)) * CAST(sv AS DECIMAL(38,0))) "
        "+ CAST(10000 AS DECIMAL(38,0)) * n * n"
    )
    den = "2 * CAST(10000 AS DECIMAL(38,0)) * n * n"
    if d == "div":
        return f"CAST(({num}) div ({den}) AS BIGINT)"
    return f"CAST(floor(({num}) / ({den})) AS BIGINT)"


_EMB_DIM_ORACLE = f"""
WITH ex AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS vi
  FROM embeddings
),
s AS (
  SELECT dim,
         count(*) AS n,
         CAST(sum(vi) AS BIGINT) AS sv,
         CAST(sum(CAST(vi * vi AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq,
         min(vi) AS min_vi,
         max(vi) AS max_vi
  FROM ex GROUP BY dim
)
SELECT dim, n, min_vi, max_vi,
       CAST({_dim_mean_e8('//')} AS DOUBLE) / 100000000.0 AS mean_val,
       CAST({_dim_var_e8('//')} AS DOUBLE) / 100000000.0  AS var_val,
       (max_vi - min_vi) < 10000 AS collapsed
FROM s
ORDER BY dim
"""


@_register("embedding_dimension_audit", _EMB_DIM_ORACLE)
def embedding_dimension_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-zone QUALITY audit, per dimension: n, min/max, mean,
    variance, and a collapsed-dimension flag (range < 0.01) — the check
    that catches dead dims (a projection bug zeroing a lane), scale
    blow-ups, and normalization drift before a corpus of vectors is
    indexed or trained on. Values are scaled to exact micro-units
    (round(v·10⁶) — round() is identical cross-engine) so every moment
    sum is exact integer/decimal arithmetic, and the mean/variance are
    rounded to 8 dp IN INTEGER ARITHMETIC ((2a+b) intdiv (2b), shared
    expression builders _dim_mean_e8/_dim_var_e8) before the one cast
    to double — double-side round() ties at terminating-decimal
    boundaries and the engines break ties differently (found by the
    sf0.1 parity sweep; sf0.01 never hit a boundary).
    Scale shape: posexplode is a narrow map; one hash aggregate on the
    dimension index (bounded: 64 groups) with map-side combine — a
    full-corpus audit that costs one scan, mergeable across batches."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode("embedding").alias("dim0", "v")
    ).select(
        (F.col("dim0") + 1).alias("dim"),  # 1-based like generate_subscripts
        F.expr(
            "CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)"
        ).alias("vi"),
    )
    s = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vi").cast("bigint").alias("sv"),
        F.sum(F.expr("CAST(vi * vi AS DECIMAL(38,0))")).cast(
            "decimal(38,0)"
        ).alias("sq"),
        F.min("vi").alias("min_vi"),
        F.max("vi").alias("max_vi"),
    )
    return s.select(
        "dim",
        "n",
        "min_vi",
        "max_vi",
        F.expr(
            f"CAST({_dim_mean_e8('div')} AS DOUBLE) / 100000000.0"
        ).alias("mean_val"),
        F.expr(
            f"CAST({_dim_var_e8('div')} AS DOUBLE) / 100000000.0"
        ).alias("var_val"),
        ((F.col("max_vi") - F.col("min_vi")) < 10000).alias("collapsed"),
    ).orderBy("dim")


# The portable minhash pipeline's lane count/band count — ONE definition
# feeds the Spark operators (num_hashes/bands arguments), every generated
# oracle, and the in-entry arithmetic, so the sides cannot drift.
_MINHASH_LANES = 16
_MINHASH_BANDS = 4


def _minhash_cte_prefix(
    num_hashes: int = _MINHASH_LANES, bands: int = _MINHASH_BANDS
) -> str:
    """The shared WITH-clause prefix of every portable-minhash oracle:
    toks → shl (distinct 3-shingles) → ex → sig (md5 lanes) → banded
    (md5 band buckets). One definition — the dedup oracle, the
    estimate-error oracle, and the bucket-balance oracle all validate
    the SAME recipe the Spark operators run."""
    rpb = num_hashes // bands
    lanes = ",\n         ".join(
        f"min(md5('{seed}:' || s)) AS m{seed}" for seed in range(num_hashes)
    )
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, md5({concat}) AS bucket FROM sig".format(
            b=b,
            concat=" || ',' || ".join(f"m{b * rpb + i}" for i in range(rpb)),
        )
        for b in range(bands)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
shl AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' '))) AS sh
  FROM toks
),
ex AS (SELECT doc_id, unnest(sh) AS s FROM shl),
sig AS (
  SELECT doc_id,
         {lanes}
  FROM ex GROUP BY doc_id
),
banded AS (
{band_rows}
)"""


def _minhash_portable_oracle(
    num_hashes: int = _MINHASH_LANES,
    bands: int = _MINHASH_BANDS,
    cols: str = "doc_id, lang, source",
) -> str:
    """Build the DuckDB oracle for the PORTABLE minhash pipeline — md5
    string lanes make every stage SQL-reproducible, so the oracle runs the
    actual LSH algorithm, not a stand-in."""
    return _minhash_cte_prefix(num_hashes, bands) + f""",
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY id_a, id_b
),
verified AS (
  SELECT id_a, id_b
  FROM cand
  JOIN shl sa ON sa.doc_id = cand.id_a
  JOIN shl sb ON sb.doc_id = cand.id_b
  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
        CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))
             AS DOUBLE) >= 0.8
)
SELECT {cols}
FROM documents
WHERE doc_id NOT IN (SELECT id_b FROM verified)
ORDER BY doc_id
"""


def _minhash_oph_oracle(
    num_bins: int = 16, bands: int = 4, cols: str = "doc_id, lang, source"
) -> str:
    """DuckDB oracle for the one-permutation-hashing minhash pipeline —
    like `_minhash_portable_oracle` the SQL runs the ACTUAL algorithm
    (1 md5/shingle, hex-prefix binning, conditional-min lanes, circular
    rotation densification, md5 band buckets, exact-Jaccard verify)."""
    rpb = num_bins // bands
    raw_lanes = ",\n         ".join(
        f"min(CASE WHEN b = {i} THEN h END) AS r{i}" for i in range(num_bins)
    )
    dense_lanes = ",\n         ".join(
        "coalesce({ring}) AS m{i}".format(
            i=i,
            ring=", ".join(f"r{(i + j) % num_bins}" for j in range(num_bins)),
        )
        for i in range(num_bins)
    )
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, md5({concat}) AS bucket FROM dense".format(
            b=b,
            concat=" || ',' || ".join(f"m{b * rpb + i}" for i in range(rpb)),
        )
        for b in range(bands)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
shl AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' '))) AS sh
  FROM toks
),
ex AS (SELECT doc_id, unnest(sh) AS s FROM shl),
hashed AS (
  SELECT doc_id, md5(s) AS h,
         CAST('0x' || substr(md5(s), 1, 2) AS INT) % {num_bins} AS b
  FROM ex
),
sig AS (
  SELECT doc_id,
         {raw_lanes}
  FROM hashed GROUP BY doc_id
),
dense AS (
  SELECT doc_id,
         {dense_lanes}
  FROM sig
),
banded AS (
{band_rows}
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY id_a, id_b
),
verified AS (
  SELECT id_a, id_b
  FROM cand
  JOIN shl sa ON sa.doc_id = cand.id_a
  JOIN shl sb ON sb.doc_id = cand.id_b
  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
        CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))
             AS DOUBLE) >= 0.8
)
SELECT {cols}
FROM documents
WHERE doc_id NOT IN (SELECT id_b FROM verified)
ORDER BY doc_id
"""


@_register(
    "dedup_minhash_lsh",
    _minhash_oph_oracle(num_bins=24, bands=6, cols="doc_id, lang"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup removal at a WIDER operating point than the
    16-lane entries: 24 signature lanes in 6 bands of 4 rows (vs 16/4) —
    higher recall at the same verify threshold, the knob a production
    pipeline turns when banding misses matter. Lanes come from
    ONE-PERMUTATION HASHING (1 md5 per distinct shingle, hex-prefix
    binning + rotation densification — the 100 TB signature-pass shape,
    see dedup_minhash_oph), so widening the signature costs no extra
    hash work; the generated oracle runs the ACTUAL signature→band→
    verify→anti-join algorithm cross-engine (the seeded xxhash64 fast
    path, operators/dedup.minhash_dedup, keeps the same pipeline on
    8-byte long lanes and stays pytest-covered)."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import minhash_dedup_oph

    d = _t(spark, sf_dir, "documents")
    return (
        minhash_dedup_oph(d, "text", "doc_id", num_bins=24, bands=6)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _simhash_portable_oracle(
    bits: int = 60, band_bits: int = 15, max_hamming: int = 12
) -> str:
    """DuckDB oracle for the portable simhash pipeline — like
    `_minhash_portable_oracle` the SQL runs the ACTUAL algorithm (60-bit
    md5 token hashes, per-bit vote sums, sign fingerprint, 15-bit band
    buckets, Hamming filter), not a stand-in."""
    sum_lanes = ",\n         ".join(
        f"sum(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(bits)
    )
    sig_terms = "\n             + ".join(
        f"CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(bits)
    )
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, sig, {b} AS band,"
        f" (sig >> {b * band_bits}) & {mask} AS bucket FROM s"
        for b in range(n_bands)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
h AS (
  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks
),
v AS (
  SELECT doc_id,
         {sum_lanes}
  FROM h GROUP BY doc_id
),
s AS (
  SELECT doc_id,
         ({sig_terms}) AS sig
  FROM v
),
banded AS (
{band_rows}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM pairs
WHERE bit_count(xor(sa, sb)) <= {max_hamming}
ORDER BY id_a, id_b
"""


@_register("simhash_hamming_pairs", _simhash_portable_oracle())
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates on the PORTABLE 60-bit md5 token lane:
    per-bit vote fingerprints, 15-bit-band LSH (4 bands tile the 60 bits),
    Hamming distance ≤ 12 — the generated oracle runs the identical
    hash→vote→sign→band→Hamming algorithm in DuckDB, so the probabilistic
    pipeline is value-verified cross-engine. The seeded 64-bit xxhash64
    production lane (operators/dedup.simhash) keeps the same shuffle shape
    and stays pytest-covered."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import (
        simhash_candidate_pairs,
        simhash_portable,
    )

    d = _t(spark, sf_dir, "documents")
    sims = simhash_portable(d, "text", "doc_id")
    return (
        simhash_candidate_pairs(sims, band_bits=15)
        .filter(F.col("hamming") <= 12)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("id_a", "id_b")
    )


_JACCARD_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE doc_id < 100)
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS i,
         CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS u
  FROM d a JOIN d b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, round(i / u, 6) AS jaccard
FROM p
ORDER BY jaccard DESC, id_a, id_b
LIMIT 20
"""


@_register("ngram_jaccard_topk", _JACCARD_ORACLE)
def ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram (3-shingle) Jaccard similarity, top-20 most-similar pairs in
    the doc_id<100 slice — pins the exact-Jaccard math that verifies
    MinHash candidates (operators/dedup.verify_jaccard)."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import verify_jaccard

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    ids = d.select(F.col("doc_id").alias("id_a"))
    pairs = ids.crossJoin(d.select(F.col("doc_id").alias("id_b"))).filter(
        F.col("id_a") < F.col("id_b")
    )
    jac = verify_jaccard(d, pairs, "text", "doc_id")
    return (
        jac.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), "id_a", "id_b")
        .limit(20)
    )


_TEXT_STATS_ORACLE = r"""
WITH s AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS n_punct,
         len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|that|with)\b')) AS n_stop
  FROM documents
)
SELECT doc_id,
       n_tokens,
       n_bpe_tokens,
       n_chars,
       round(CASE WHEN n_chars = 0 THEN 0.0
                  ELSE CAST(n_punct AS DOUBLE) / n_chars END, 6) AS punct_ratio,
       round(CASE WHEN n_tokens = 0 THEN 0.0
                  ELSE CAST(n_stop AS DOUBLE) / n_tokens END, 6) AS stopword_ratio,
       round(CAST(0.4 AS DOUBLE) * least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0
           + CAST(0.3 AS DOUBLE) * (1.0 - (CASE WHEN n_chars = 0 THEN 0.0
                  ELSE CAST(n_punct AS DOUBLE) / n_chars END))
           + CAST(0.3 AS DOUBLE) * least((CASE WHEN n_tokens = 0 THEN 0.0
                  ELSE CAST(n_stop AS DOUBLE) / n_tokens END) * 4.0, 1.0), 6)
         AS quality_score
FROM s
ORDER BY doc_id
"""


@_register("text_stats_documents", _TEXT_STATS_ORACLE)
def text_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analysis: token counts (whitespace + BPE-ish),
    char count, punctuation/stopword ratios, composite quality score —
    all codegen'd expressions, zero shuffles (operators/textstats)."""
    from nyc_taxi_data_pipeline_spark.operators.textstats import text_stats

    d = _t(spark, sf_dir, "documents")
    return text_stats(d).orderBy("doc_id")


_LANG_ID_ORACLE = r"""
WITH s AS (
  SELECT lang,
    len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|that|with)\b'))   AS s_en,
    len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|mit)\b')) AS s_de,
    len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|que|pour)\b'))     AS s_fr,
    len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|para|como)\b'))   AS s_es
  FROM documents
),
pred AS (
  SELECT lang,
         CASE WHEN s_en >= greatest(s_de, s_fr, s_es, 1) THEN 'en'
              WHEN s_de >= greatest(s_fr, s_es, 1) THEN 'de'
              WHEN s_fr >= greatest(s_es, 1) THEN 'fr'
              WHEN s_es >= 1 THEN 'es'
              ELSE 'und' END AS lang_pred
  FROM s
)
SELECT lang, lang_pred, count(*) AS n_docs
FROM pred GROUP BY lang, lang_pred
ORDER BY lang, lang_pred
"""


@_register("lang_id_documents", _LANG_ID_ORACLE)
def lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-marker argmax, ties by precedence
    en>de>fr>es, 'und' when nothing matches) — confusion counts against
    the labeled lang column (functions/text.lang_id)."""
    from nyc_taxi_data_pipeline_spark.operators.textstats import with_lang_id

    d = _t(spark, sf_dir, "documents")
    return (
        with_lang_id(d)
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "lang_pred")
    )


_TOKEN_BUDGET_ORACLE = r"""
WITH s AS (
  SELECT source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
  FROM documents
)
SELECT source,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       count(*) AS n_docs,
       round(avg(CAST(n_tokens AS DOUBLE)), 4) AS avg_tokens
FROM s GROUP BY source
ORDER BY source
"""


@_register("token_budget_by_source", _TOKEN_BUDGET_ORACLE)
def token_budget_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token budgeting per source (operators/textstats.token_budget_by)."""
    from nyc_taxi_data_pipeline_spark.operators.textstats import token_budget_by

    d = _t(spark, sf_dir, "documents")
    return token_budget_by(d, "source")


_SEQ_PACKING_ORACLE = r"""
WITH t AS (
  SELECT source, doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tok
  FROM documents
),
s AS (
  -- CAST the window cumsum back to BIGINT: DuckDB widens sum(BIGINT) to
  -- HUGEINT, and the int128 width survives into pack_id and the hash
  -- canonicalization even though every value fits in 64 bits (the only
  -- red driver row in round 2 was exactly this width mismatch).
  SELECT source, tok,
         CAST((CAST(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             - tok) // 512 AS BIGINT)
           AS pack_id
  FROM t
)
SELECT source, pack_id, count(*) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS pack_tokens
FROM s GROUP BY source, pack_id
ORDER BY source, pack_id
"""


@_register("sequence_packing", _SEQ_PACKING_ORACLE)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget sequence packing (512 tokens) per source shard —
    the pretraining step between chunking and dataset mixing: short docs
    fill fixed-length training sequences by deterministic sequential fill
    (start-position assignment via ONE window cumsum + floor division,
    all integer JVM expressions). Shards pack in parallel — no global
    order bottleneck — and the assignment is engine-reproducible, so the
    oracle runs the identical algorithm
    (operators/textstats.sequence_packing)."""
    from nyc_taxi_data_pipeline_spark.operators.textstats import sequence_packing

    d = _t(spark, sf_dir, "documents")
    return sequence_packing(d, budget_tokens=512)


_ANN_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(qv, cv), 6) AS cosine
  FROM q CROSS JOIN c
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


@_register("ann_cosine_topk", _ANN_ORACLE)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k over the embedding column: broadcast query set,
    JVM-side zip_with/aggregate dot products, per-query window rank.
    Ranks computed on 6-decimal-rounded cosine so Spark and DuckDB agree
    bit-for-bit (operators/similarity.brute_force_topk)."""
    from nyc_taxi_data_pipeline_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = brute_force_topk(emb, queries, k=5)
    return out.withColumn("rank", F.col("rank").cast("int")).orderBy(
        "query_id", "rank"
    )


def _lsh_oracle(n_planes: int = 4, dim: int = 64) -> str:
    """Generated oracle for hyperplane LSH: the planes are deterministic
    driver-side constants, so they inline as SQL array literals and the
    oracle computes the SAME sign-bit buckets (float64 dot products are
    bit-identical across engines for identical operand order)."""
    from nyc_taxi_data_pipeline_spark.operators.similarity import (
        _deterministic_planes,
    )

    planes = _deterministic_planes(dim, n_planes)

    def bucket_expr(v: str) -> str:
        parts = []
        for i, p in enumerate(planes):
            lit = "[" + ", ".join(repr(x) for x in p) + "]"
            parts.append(
                f"(CASE WHEN list_dot_product({v}, {lit}) > 0"
                f" THEN {1 << i} ELSE 0 END)"
            )
        return " + ".join(parts)

    return f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
cb AS (SELECT vec_id AS neighbor_id, v AS cv, {bucket_expr('v')} AS bucket FROM c),
qb AS (SELECT vec_id AS query_id, v AS qv, {bucket_expr('v')} AS bucket
       FROM c WHERE vec_id % 50 = 0),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(qv, cv), 6) AS cosine
  FROM cb JOIN qb USING (bucket)
),
ranked AS (SELECT query_id, neighbor_id, cosine,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rank
           FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


@_register("ann_lsh_topk", _lsh_oracle())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing — the scale
    path (bucketed candidates instead of full scan). The planes are
    deterministic literals, so the oracle reproduces the exact bucketing
    and this is a full value-hash check (operators/similarity.lsh_topk)."""
    from nyc_taxi_data_pipeline_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = lsh_topk(emb, queries, k=5, n_planes=4)
    return out.withColumn("rank", F.col("rank").cast("int")).orderBy(
        "query_id", "rank"
    )


@_register("ann_lsh_multiprobe_exact", _ANN_ORACLE)
def ann_lsh_multiprobe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe LSH at full Hamming radius (multiprobe = n_planes probes
    every bucket) — the correctness anchor of the approximate family: the
    probe-expansion + bucket-join machinery must degrade EXACTLY to brute
    force, so it shares the exact top-k oracle. Operating points between
    (multiprobe 1..n-1) trade that recall for candidate count
    (operators/similarity.lsh_topk)."""
    from nyc_taxi_data_pipeline_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = lsh_topk(emb, queries, k=5, n_planes=4, multiprobe=4)
    return out.withColumn("rank", F.col("rank").cast("int")).orderBy(
        "query_id", "rank"
    )


_NEARDUP_EMB_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 300)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
ORDER BY id_a, id_b
"""


@_register("embedding_neardup_pairs", _NEARDUP_EMB_ORACLE)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact quadratic baseline on a
    bounded slice (the LSH-pruned variant is the scale path; this pins the
    math) — operators/dedup.embedding_neardup_pairs."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return embedding_neardup_pairs(
        emb, "embedding", "vec_id", threshold=0.35, use_lsh=False
    ).orderBy("id_a", "id_b")


_BINARY_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text)                  AS content_md5
FROM documents
ORDER BY doc_id
"""


@_register("multimodal_binary_stats", _BINARY_ORACLE)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payloads (utf-8 bytes here;
    image/audio bytes in production) flow through byte-length and
    content-hash metadata extraction (operators/multimodal)."""
    d = _t(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    ).orderBy("doc_id")


# ===========================================================================
# Relational surface, wave 2: range join, outer join, cube, percentiles,
# JSON, explode/top-k, EXISTS, HAVING (all oracle-backed)
# ===========================================================================

_RANGE_JOIN_ORACLE = """
WITH intervals AS (
  SELECT o_orderkey,
         o_orderdate                          AS interval_start,
         o_orderdate + INTERVAL 7 DAY         AS interval_end
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT i.o_orderkey AS o_orderkey,
       count(*) AS n_points,
       CAST(round(sum(CAST(l.l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS sum_qty
FROM intervals i
JOIN lineitem l
  ON l.l_shipdate >= i.interval_start AND l.l_shipdate < i.interval_end
GROUP BY i.o_orderkey
ORDER BY o_orderkey
"""


@_register("range_join_interval_agg", _RANGE_JOIN_ORACLE)
def range_join_interval_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (an operator Spark has no native plan for): each
    sampled order spans [orderdate, orderdate+7d); count lineitem shipments
    inside the span. Implemented by time-bucketing both sides so the theta
    join becomes equi-on-bucket + residual filter — hash shuffle, not the
    broadcast-nested-loop O(n*m) plan a naive range predicate produces
    (operators/temporal.interval_join)."""
    from nyc_taxi_data_pipeline_spark.operators.temporal import interval_join

    intervals = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("interval_start"),
            F.expr("timestampadd(DAY, 7, o_orderdate)").alias("interval_end"),
        )
    )
    points = _t(spark, sf_dir, "lineitem").select("l_shipdate", "l_quantity")
    joined = interval_join(
        points, intervals, "l_shipdate", "interval_start", "interval_end",
        bucket_seconds=7 * 24 * 3600,
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("o_orderkey")
    )


_OUTER_JOIN_ORACLE = """
SELECT c.c_custkey AS c_custkey,
       count(o.o_orderkey) AS n_big_orders,
       CAST(round(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(38,6))), 0), 2)
            AS DOUBLE) AS total_spent
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
  ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
ORDER BY c_custkey
"""


@_register("outer_join_null_handling", _OUTER_JOIN_ORACLE)
def outer_join_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-group semantics: every customer appears,
    customers with no qualifying orders get count 0 / total 0.0. The filter
    on the right side is applied BEFORE the join (pushdown under outer joins
    only happens on the preserved side — pre-filtering is the contract)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(38,6)")),
                    F.lit(0).cast("decimal(38,6)"),
                ),
                2,
            )
            .cast("double")
            .alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status,
       count(*) AS n_rows,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


@_register("cube_aggregation", _CUBE_ORACLE)
def cube_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (available natively per SURVEY.md §2.4 closing
    note): all 4 grouping combinations in one pass, per-combination GROUPING
    flags distinguish real nulls from rollup nulls."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


_PERCENTILE_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@_register("percentile_stats", _PERCENTILE_ORACLE)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation). The approx_percentile
    sketch is the 100 TB path; the exact form is the correctness pin."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            *[
                F.round(F.expr(f"percentile(l_extendedprice, {q})"), 4).alias(name)
                for q, name in ((0.5, "p50_price"), (0.9, "p90_price"), (0.99, "p99_price"))
            ]
        )
        .orderBy("l_returnflag")
    )


_JSON_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS total_value
FROM events
GROUP BY k
ORDER BY k
"""


@_register("json_extract_events", _JSON_ORACLE)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7-class JSON decode on a batch column: get_json_object path
    extraction (JVM-side, no UDF), aggregated per extracted key."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("int").alias("k"), "value"
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("k")
    )


_TOKEN_TOP_ORACLE = r"""
WITH tok AS (
  SELECT lang,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
  FROM documents WHERE trim(text) <> ''
),
counts AS (
  SELECT lang, token, count(*) AS n FROM tok WHERE token <> ''
  GROUP BY lang, token
),
ranked AS (
  SELECT lang, token, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk
  FROM counts
)
SELECT lang, token, n, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 10
ORDER BY lang, rnk
"""


@_register("token_explode_top", _TOKEN_TOP_ORACLE)
def token_explode_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode/unnest + per-group top-k: tokenize every document, count
    tokens per language, rank with a window, keep the top 10 per language
    (deterministic tie-break on the token)."""
    d = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    tokens = d.select(
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    counts = tokens.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .orderBy("lang", "rnk")
    )


_EXISTS_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@_register("exists_semijoin_priority", _EXISTS_ORACLE)
def exists_semijoin_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelates to a left-semi join (the
    idiomatic-Spark form SURVEY.md §2.3 notes the reference gets for free);
    each order counted once no matter how many lineitems qualify."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 48)
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


_HAVING_ORACLE = """
WITH big AS (
  SELECT l_orderkey,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE)
           AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 150
)
SELECT o.o_orderkey AS o_orderkey, o.o_custkey AS o_custkey,
       o.o_totalprice AS o_totalprice, b.sum_qty AS sum_qty
FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@_register("having_top_orders", _HAVING_ORACLE)
def having_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate → HAVING filter → join back to orders →
    global top-10 (Spark plans orderBy+limit as TakeOrderedAndProject — a
    per-partition top-k plus a driver merge, never a full sort at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("__sq"))
        .filter(F.col("__sq") > 150)
        .select(
            "l_orderkey", F.round("__sq", 2).cast("double").alias("sum_qty")
        )
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .select("o_orderkey", "o_custkey", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ===========================================================================
# Streaming, wave 2: production sink shape + stateful dedup
# ===========================================================================

_STREAM_SINK_ORACLE = """
SELECT strftime(ts, '%Y-%m-%d') AS date_partition,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS total_value
FROM events
GROUP BY 1
ORDER BY 1
"""


@_register("streaming_partitioned_sink", _STREAM_SINK_ORACLE)
def streaming_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's production streaming sink end-to-end (S10/ST3/ST6/ST7:
    partitioned parquet + checkpoint + read-back verify), with event-time
    date partitions instead of the reference's nondeterministic
    processing-time ones. The sink directory is re-read as a batch frame and
    aggregated per partition — proving partition layout AND content."""
    import tempfile

    from nyc_taxi_data_pipeline_spark.streaming.sinks import run_stream_to_parquet

    stream = _events_stream(spark, sf_dir).withColumn(
        "date_partition", F.date_format("ts", "yyyy-MM-dd")
    )
    base = tempfile.mkdtemp(prefix="stream_sink_")
    out = run_stream_to_parquet(
        stream,
        f"{base}/data",
        f"{base}/checkpoint",
        partition_by=("date_partition",),
    )
    return (
        out.groupBy(F.col("date_partition").cast("string").alias("date_partition"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("date_partition")
    )


_STREAM_DEDUP_ORACLE = """
SELECT event_type, count(DISTINCT event_id) AS n_unique_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@_register("streaming_dedup_state", _STREAM_DEDUP_ORACLE)
def streaming_dedup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: dropDuplicates on event_id keyed state
    across micro-batches, then a streaming aggregation — two stateful
    operators stacked, drained deterministically to a memory sink."""
    import uuid

    from nyc_taxi_data_pipeline_spark.streaming.sinks import run_stream_to_memory

    stream = _events_stream(spark, sf_dir)
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique_events")
    )
    sink = run_stream_to_memory(agg, f"dedup_{uuid.uuid4().hex[:8]}")
    return sink.orderBy("event_type")


# ===========================================================================
# Multimodal, wave 2: frame-sample plan (oracle) + Arrow-batched decode
# ===========================================================================

_FRAME_SAMPLE_ORACLE = """
SELECT doc_id AS media_id,
       len(generate_series(0, greatest(n_chars * 7 - 1, 0), 1000)) AS n_frames
FROM documents
ORDER BY media_id
"""


@_register("multimodal_frame_sample", _FRAME_SAMPLE_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: one row per (media, frame timestamp)
    generated JVM-side (sequence+explode) without touching payload bytes;
    counted back per media to prove the sampling arithmetic
    (operators/multimodal.frame_sample_plan)."""
    from nyc_taxi_data_pipeline_spark.operators.multimodal import frame_sample_plan

    media = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") * 7).cast("long").alias("duration_ms"),
    )
    frames = frame_sample_plan(media, every_ms=1000)
    return (
        frames.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
        .orderBy("media_id")
    )


# the fake decoder's lane-0 feature is SQL-derivable: payload bytes are the
# UTF-8 text (ASCII in this corpus, so ascii(char) == byte), reshaped into
# 16-wide rows with row weight r+1; f0 = (sum_r (r+1)*byte[16r]) % 100003
# / 100003 cast to float32 — expressed below with a list_transform over row
# indices, REAL cast matching numpy's float32 rounding
_MM_DECODE_ORACLE = """
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image/fake' ELSE 'audio/fake' END
           AS mime_type,
         text,
         octet_length(encode(text)) AS n_bytes
  FROM documents
),
f AS (
  SELECT doc_id, mime_type, n_bytes,
         CAST(coalesce(list_sum(list_transform(
                range(0, CAST(ceil(n_bytes / 16.0) AS INT)),
                r -> (r + 1) * ascii(substr(text, 16 * r + 1, 1))
              )), 0) % 100003 / 100003.0 AS REAL) AS f0
  FROM p
)
SELECT mime_type,
       count(*) AS n_media,
       round(avg(n_bytes), 4) AS avg_bytes,
       round(avg(f0), 6) AS avg_f0
FROM f
GROUP BY mime_type
ORDER BY mime_type
"""


@_register("multimodal_decode_features", _MM_DECODE_ORACLE)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media decode plumbing (mapInPandas): documents stand in
    as binary payloads, the deterministic fake decoder emits fixed-dim float
    features, aggregated per mime class. The fake decoder's byte-fold is a
    pure function of the payload bytes, so the oracle derives lane-0 of the
    feature vector in SQL — the mapInPandas Python lane is value-verified
    against a cross-engine recomputation, not just rows-only
    (operators/multimodal.decode_features)."""
    from nyc_taxi_data_pipeline_spark.operators.multimodal import decode_features

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/fake"))
        .otherwise(F.lit("audio/fake"))
        .alias("mime_type"),
        F.col("text").cast("binary").alias("payload"),
    )
    feats = decode_features(media, fake=True)
    return (
        feats.groupBy("mime_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
            F.round(F.avg(F.element_at("feature", 1)), 6).alias("avg_f0"),
        )
        .orderBy("mime_type")
    )


_APPROX_DISTINCT_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@_register("approx_distinct_sketch", _APPROX_DISTINCT_ORACLE)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (the 100 TB path for COUNT DISTINCT): HLL++
    approx_count_distinct (rsd 2%) per event_type, VALUE-CHECKED against
    the exact count — the entry emits `approx_within_5pct`, true iff the
    sketch estimate lands within rtol 0.05 of exact, and the oracle
    asserts exact counts plus literal TRUE. Sketch internals stay
    engine-specific, but the accuracy contract is now driver-verified
    (measured HLL error ≤0.4% at sf0.1, so 5% is a hard-fail bound, not
    a tautology)."""
    e = _t(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.countDistinct("user_id")
    return (
        e.groupBy("event_type")
        .agg(
            exact.alias("exact_users"),
            (
                F.abs(approx - exact) <= F.lit(0.05) * exact
            ).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# Wave 3: window-function breadth, scalar-function matrix, coercion casts,
# custom stateful streaming, IVF similarity
# ===========================================================================

_WINDOW_BREADTH_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(lag(o_totalprice)  OVER wt, 2) AS prev_price,
       round(lead(o_totalprice) OVER wt, 2) AS next_price,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
            AS DOUBLE) AS running_spend,
       CAST(rank()       OVER wp AS INT) AS price_rank,
       CAST(dense_rank() OVER wp AS INT) AS price_dense_rank,
       CAST(ntile(4)     OVER wn AS INT) AS price_quartile,
       round(cume_dist() OVER wp, 6) AS price_cume_dist
FROM orders
WINDOW wt AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
       wn AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


@_register("window_function_breadth", _WINDOW_BREADTH_ORACLE)
def window_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window surface beyond SURVEY.md §2.5 (the reference has
    none): lag/lead, running frame sum, rank/dense_rank (value-ties safe),
    ntile (total order for determinism), cume_dist — all in one pass,
    sharing shuffles where partitioning allows."""
    o = _t(spark, sf_dir, "orders")
    wt = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    wn = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(wt), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(wt), 2).alias("next_price"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(
                wt.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
            2,
        )
        .cast("double")
        .alias("running_spend"),
        F.rank().over(wp).alias("price_rank"),
        F.dense_rank().over(wp).alias("price_dense_rank"),
        F.ntile(4).over(wn).alias("price_quartile"),
        F.round(F.cume_dist().over(wp), 6).alias("price_cume_dist"),
    ).orderBy("o_custkey", "o_orderkey")


_SCALAR_MATRIX_ORACLE = """
SELECT p_partkey,
       upper(p_brand)                              AS brand_upper,
       substring(p_name, 1, 8)                     AS name_prefix,
       length(p_name)                              AS name_len,
       replace(p_type, ' ', '_')                   AS type_slug,
       concat(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
       round(abs(p_retailprice - 1000.0), 2)       AS price_dist_1000,
       round(sqrt(CAST(p_size AS DOUBLE)), 6)      AS size_sqrt,
       round(ln(p_retailprice), 6)                 AS price_ln,
       CAST(floor(p_retailprice / 100) AS BIGINT)  AS price_bucket,
       regexp_extract(p_type, '([a-z]+)$', 1)      AS type_last_word
FROM part
ORDER BY p_partkey
"""


@_register("scalar_function_matrix", _SCALAR_MATRIX_ORACLE)
def scalar_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math breadth beyond the reference's F1-F11 (SURVEY.md
    §2.8 notes it has almost none): case mapping, substring, length,
    replace, concat, abs/sqrt/ln/floor, regexp_extract — every one a
    codegen'd JVM expression, zero shuffles, zero UDFs."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.concat(
            F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")
        ).alias("brand_size"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 2).alias("price_dist_1000"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("size_sqrt"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("price_ln"),
        F.floor(F.col("p_retailprice") / 100).cast("long").alias("price_bucket"),
        F.regexp_extract("p_type", r"([a-z]+)$", 1).alias("type_last_word"),
    ).orderBy("p_partkey")


_COERCE_ORACLE = """
SELECT props,
       coalesce(try_cast(json_extract_string(props, '$.k') AS INTEGER), 0)
         AS k_coerced,
       try_cast(props AS INTEGER) AS whole_cast,
       count(*) AS n
FROM events
GROUP BY props
ORDER BY props
LIMIT 50
"""


@_register("coerce_cast_defaults", _COERCE_ORACLE)
def coerce_cast_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4's coerce variant (pd.to_numeric(errors='coerce').fillna(0),
    elt_pipeline_optimized_dag.py:116-118): try_cast → null on failure →
    coalesce default. ANSI mode makes plain cast throw; try_cast is the
    engine's pinned coerce contract."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "props",
            F.coalesce(
                F.try_to_number(
                    F.get_json_object("props", "$.k"), F.lit("999999999")
                ).cast("int"),
                F.lit(0),
            ).alias("k_coerced"),
            F.expr("try_cast(props AS INT)").alias("whole_cast"),
        )
        .groupBy("props", "k_coerced", "whole_cast")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("props")
        .limit(50)
    )


_STATEFUL_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS total_value,
       round(max(value), 2) AS max_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@_register("streaming_stateful_running_stats", _STATEFUL_ORACLE)
def streaming_stateful_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running (count, sum, max) held in the state store across micro-batches.
    The update-mode sink's last emission per key IS the final total —
    recovered by argmax-over-n_events (the count strictly increases every
    time a key is touched, so it orders emissions correctly even if values
    were negative; a plain max() over each column would silently assume
    monotone sums). Oracle = the equivalent batch aggregation."""
    import uuid

    from nyc_taxi_data_pipeline_spark.streaming.stateful import running_user_stats

    stream = _events_stream(spark, sf_dir)
    stats = running_user_stats(stream)
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        stats.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sink = spark.table(name)
    last = F.max(F.struct("n_events", "total_value", "max_value")).alias("s")
    return (
        sink.groupBy("user_id")
        .agg(last)
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.round(F.col("s.total_value"), 2).alias("total_value"),
            F.round(F.col("s.max_value"), 2).alias("max_value"),
        )
        .orderBy("user_id")
    )


_IVF_ORACLE = """
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
cents AS (SELECT vec_id AS cent_id, v AS cv FROM c WHERE vec_id % 40 = 0),
assigned AS (
  SELECT vec_id AS neighbor_id, v AS cv2, cell FROM (
    SELECT c.vec_id, c.v, cents.cent_id AS cell,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY list_distance(c.v, cents.cv), cents.cent_id) AS rn
    FROM c CROSS JOIN cents) t WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id % 50 = 0),
probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, cents.cent_id AS cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_distance(q.qv, cents.cv), cents.cent_id) AS pr
    FROM q CROSS JOIN cents) t WHERE pr <= 3
),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(qv, cv2), 6) AS cosine
  FROM assigned JOIN probes USING (cell)
),
ranked AS (SELECT query_id, neighbor_id, cosine,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rank
           FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


@_register("ann_ivf_topk", _IVF_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: sampled-centroid coarse quantizer (vec_id %
    stride — deterministic, so the WHOLE index is SQL-expressible and this
    is a full value-hash oracle, not a rows-only check), corpus assigned
    to cells by argmin L2 once, queries probe 3 nearest cells.
    Cross-engine stability: L2 distances of the same float32-upcast
    doubles are bit-identical (elementwise sequential sums in both
    engines), ties break on centroid id, cosines round to 6dp before
    ranking. Recall@5 floor vs brute force pinned in
    tests/test_scale_ops.py (operators/similarity.ivf_topk)."""
    from nyc_taxi_data_pipeline_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_topk(emb, queries, k=5, centroid_stride=40, n_probe=3)
    return out.withColumn("rank", F.col("rank").cast("int")).orderBy(
        "query_id", "rank"
    )


# ===========================================================================
# Wave 4: dataset-level quality, SQL entry point, per-file identity,
# max-per-group, systematic dataset split
# ===========================================================================

_RI_ORACLE = """
SELECT 'lineitem_orderkey_fk' AS rule, count(*) AS violations
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
UNION ALL
SELECT 'orders_custkey_fk', count(*)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'orders_orderkey_unique', count(*)
FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
ORDER BY rule
"""


@_register("quality_referential_integrity", _RI_ORACLE)
def quality_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-level quality checks beyond the reference's row-level GX
    suite: orphan-FK counts via left_anti joins and dbt-style uniqueness —
    the relationship/unique tests its production schema.yml left empty
    (SURVEY.md §5.2)."""
    from nyc_taxi_data_pipeline_spark.operators.quality import (
        referential_violations,
        uniqueness_violations,
    )

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    checks = (
        referential_violations(li, o, "l_orderkey", "o_orderkey", "lineitem_orderkey_fk")
        .unionByName(
            referential_violations(o, c, "o_custkey", "c_custkey", "orders_custkey_fk")
        )
        .unionByName(uniqueness_violations(o, "o_orderkey", "orders_orderkey_unique"))
    )
    return checks.orderBy("rule")


_SQL_VIEW_ORACLE = """
SELECT r.r_name AS region_name,
       CAST(year(o.o_orderdate) AS INT) AS order_year,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS total_revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, year(o.o_orderdate)
ORDER BY region_name, order_year
"""


@_register("sql_view_entrypoint", _SQL_VIEW_ORACLE)
def sql_view_entrypoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10, the SQL entry point: tables registered as temp views, the query
    expressed as SQL TEXT through spark.sql — same Catalyst plan as the
    DataFrame form (the engine's replacement for the reference's
    Trino/dbt ad-hoc SQL layer, SURVEY.md §3.3)."""
    for name in ("orders", "customer", "nation", "region"):
        _t(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        """
        SELECT r.r_name AS region_name,
               CAST(year(o.o_orderdate) AS INT) AS order_year,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE)
                 AS total_revenue
        FROM v_orders o
        JOIN v_customer c ON o.o_custkey = c.c_custkey
        JOIN v_nation n   ON c.c_nationkey = n.n_nationkey
        JOIN v_region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, year(o.o_orderdate)
        ORDER BY region_name, order_year
        """
    )


_FILE_IDENTITY_ORACLE = """
SELECT 'lineitem.parquet' AS file_name, count(*) AS n_rows
FROM lineitem
"""


@_register("input_file_identity", _FILE_IDENTITY_ORACLE)
def input_file_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: per-file provenance via input_file_name() — the engine's answer
    to the reference's object-store listing loop (minio_utils.py:30-38);
    at scale this powers file-grain idempotency and audit."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file_name")
        )
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


_MAX_PER_GROUP_ORACLE = """
WITH ranked AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         max(c_acctbal) OVER (PARTITION BY c_nationkey) AS mx
  FROM customer
)
SELECT n.n_name AS nation_name, r.c_custkey AS c_custkey,
       round(r.c_acctbal, 2) AS c_acctbal
FROM ranked r JOIN nation n ON r.c_nationkey = n.n_nationkey
WHERE r.c_acctbal = r.mx
ORDER BY nation_name, c_custkey
"""


@_register("max_per_group_filter", _MAX_PER_GROUP_ORACLE)
def max_per_group_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated max subquery), decorrelated the Spark way:
    a windowed max instead of a re-scanning self-join — one shuffle on the
    group key, keeps ties (all max-acctbal customers per nation)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    w = W.partitionBy("c_nationkey")
    ranked = c.select(
        "c_custkey", "c_nationkey", "c_acctbal", F.max("c_acctbal").over(w).alias("mx")
    ).filter(F.col("c_acctbal") == F.col("mx"))
    return (
        ranked.join(n, ranked["c_nationkey"] == n["n_nationkey"])
        .select(
            F.col("n_name").alias("nation_name"),
            "c_custkey",
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
        .orderBy("nation_name", "c_custkey")
    )


_SPLIT_ORACLE = """
SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
            WHEN doc_id % 10 = 8 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
ORDER BY split, lang
"""


@_register("dataset_split_systematic", _SPLIT_ORACLE)
def dataset_split_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data export: deterministic systematic train/val/test split
    (id mod 10 → 80/10/10) with per-split-per-language balance counts —
    reproducible across engines and runs, unlike seeded random sampling."""
    d = _t(spark, sf_dir, "documents")
    split = (
        F.when(F.col("doc_id") % 10 < 8, F.lit("train"))
        .when(F.col("doc_id") % 10 == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.groupBy(split.alias("split"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


# ===========================================================================
# Wave 5: green-variant normalize (coerce contract), null-safe equality,
# datetime matrix, unpivot
# ===========================================================================

_GREEN_ORACLE = """
WITH green AS (
  SELECT
    CAST((l_suppkey % 2) + 1 AS INTEGER)    AS vendor_id,
    l_shipdate                              AS pickup_datetime,
    CASE WHEN l_linenumber % 7 = 0 THEN 0
         ELSE CAST((l_linenumber % 6) + 1 AS INTEGER) END AS rate_code_id,
    CAST((l_partkey % 25) + 1 AS INTEGER)   AS pickup_location_id,
    CAST((l_suppkey % 25) + 1 AS INTEGER)   AS dropoff_location_id,
    CAST((l_orderkey % 6) + 1 AS INTEGER)   AS payment_type_id,
    l_quantity                              AS passenger_count,
    l_extendedprice                         AS fare_amount
  FROM lineitem
)
SELECT dropoff_location_id, fare_amount, passenger_count, payment_type_id,
       pickup_datetime, pickup_location_id, rate_code_id, vendor_id
FROM green
"""


@_register("normalize_green_variant", _GREEN_ORACLE)
def normalize_green_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1's GREEN branch + P4's coerce contract: lpep_* prefixes rename,
    green-only columns (trip_type, ehail_fee) drop, null RatecodeID coerces
    to 0 instead of dropping the row (the DAG variant's
    to_numeric(errors='coerce').fillna(0) semantics,
    elt_pipeline_optimized_dag.py:116-118)."""
    from nyc_taxi_data_pipeline_spark.operators.normalize import (
        detect_service_type,
        normalize,
    )

    li = _t(spark, sf_dir, "lineitem")
    raw_green = li.select(
        ((F.col("l_suppkey") % 2) + 1).alias("VendorID"),
        F.col("l_shipdate").alias("lpep_pickup_datetime"),
        F.when(F.col("l_linenumber") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(((F.col("l_linenumber") % 6) + 1).cast("double"))
        .alias("RatecodeID"),
        ((F.col("l_partkey") % 25) + 1).alias("PULocationID"),
        ((F.col("l_suppkey") % 25) + 1).alias("DOLocationID"),
        ((F.col("l_orderkey") % 6) + 1).alias("payment_type"),
        F.col("l_quantity").alias("passenger_count"),
        F.col("l_extendedprice").alias("fare_amount"),
        F.lit(1.0).alias("trip_type"),
        F.lit(0.0).alias("ehail_fee"),
    )
    assert detect_service_type(raw_green.columns) == 2  # green detected
    return normalize(raw_green, coerce_null_to_zero=True)


_NULLSAFE_ORACLE = """
WITH a AS (
  SELECT event_id,
         CASE WHEN event_id % 5 = 0 THEN NULL
              ELSE CAST(user_id % 10 AS INTEGER) END AS grp
  FROM events WHERE event_id % 2 = 0
),
b AS (
  SELECT CASE WHEN g % 3 = 0 THEN NULL ELSE g END AS grp,
         g AS label
  FROM (SELECT CAST(unnest(range(0, 10)) AS INTEGER) AS g)
)
SELECT a.grp AS grp, b.label AS label, count(*) AS n
FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
GROUP BY a.grp, b.label
ORDER BY grp NULLS FIRST, label
"""


@_register("null_safe_equality_join", _NULLSAFE_ORACLE)
def null_safe_equality_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): null keys MATCH
    null keys — the semantics plain equality silently drops. Still a hash
    join (null-safe equality is a valid hash key), not a nested loop."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 2 == 0)
    a = e.select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("int"))
        .otherwise((F.col("user_id") % 10).cast("int"))
        .alias("grp"),
    )
    b = spark.range(0, 10).select(
        F.when(F.col("id") % 3 == 0, F.lit(None).cast("int"))
        .otherwise(F.col("id").cast("int"))
        .alias("grp"),
        F.col("id").cast("int").alias("label"),
    )
    return (
        a.join(b, a["grp"].eqNullSafe(b["grp"]))
        .groupBy(a["grp"].alias("grp"), "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("grp").asc_nulls_first(), "label")
    )


_DATETIME_ORACLE = """
SELECT event_id,
       CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
       date_trunc('hour', ts)                   AS hour_start,
       CAST(datediff('day', CAST(ts AS DATE), DATE '2024-03-01') AS INT)
                                                AS days_to_march,
       ts + INTERVAL 2 MONTH                    AS plus_two_months,
       last_day(CAST(ts AS DATE))               AS month_end,
       CAST(hour(ts) AS INT)                    AS hr,
       CAST(minute(ts) AS INT)                  AS mn,
       CAST(isodow(ts) AS INT)                  AS iso_dow,
       CAST(week(ts) AS INT)                    AS iso_week
FROM events
ORDER BY event_id
"""


@_register("datetime_function_matrix", _DATETIME_ORACLE)
def datetime_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime breadth beyond the reference's F1-F3: truncation, day
    arithmetic, month arithmetic, month boundaries, field extraction, ISO
    day-of-week/week-of-year — engine-pinned to ISO semantics (Spark's
    1=Sunday dayofweek is remapped; locale-dependent names stay out)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_trunc("month", "ts").alias("month_start"),
        F.date_trunc("hour", "ts").alias("hour_start"),
        F.datediff(F.lit("2024-03-01").cast("date"), F.col("ts").cast("date"))
        .cast("int")
        .alias("days_to_march"),
        F.expr("timestampadd(MONTH, 2, ts)").alias("plus_two_months"),
        F.last_day(F.col("ts").cast("date")).alias("month_end"),
        F.hour("ts").cast("int").alias("hr"),
        F.minute("ts").cast("int").alias("mn"),
        (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
        F.weekofyear("ts").cast("int").alias("iso_week"),
    ).orderBy("event_id")


_UNPIVOT_ORACLE = """
SELECT l_returnflag, measure,
       CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total
FROM (
  SELECT l_returnflag, 'quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'tax', l_tax FROM lineitem
)
GROUP BY l_returnflag, measure
ORDER BY l_returnflag, measure
"""


@_register("unpivot_measures", _UNPIVOT_ORACLE)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the inverse of pivot_event_values): wide measures to
    (measure, value) rows via the native unpivot node — no UNION re-scan;
    one pass, measure names become data."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "l_quantity", "quantity")
        .when(F.col("measure") == "l_extendedprice", "extendedprice")
        .otherwise("tax"),
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("total")
        )
        .orderBy("l_returnflag", "measure")
    )


# ===========================================================================
# Wave 6: training-data text ops — chunking, PII scrubbing, TF-IDF, vocab
# ===========================================================================

_CHUNK_ORACLE = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE trim(text) <> ''
),
c AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, greatest(len(toks) - 10, 1), 40)) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) / 40 AS INT) AS chunk_id,
       CAST(least(start + 49, len(toks)) - start + 1 AS INT) AS n_tokens,
       array_to_string(toks[start:least(start + 49, len(toks))], ' ') AS chunk_text
FROM c
ORDER BY doc_id, chunk_id
"""


@_register("document_chunking", _CHUNK_ORACLE)
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (50-token windows, stride 40): the
    context-length-bounded training export. Tokens split once per doc,
    chunk starts via sequence(), slices JVM-side — scan-speed, one explode
    (operators/textstats.chunk_documents)."""
    from nyc_taxi_data_pipeline_spark.operators.textstats import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=50, stride=40).orderBy(
        "doc_id", "chunk_id"
    )


_PII_ORACLE = r"""
WITH seeded AS (
  SELECT doc_id,
         concat('contact ', source, '@example.com or +1-555-',
                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' re: ',
                substring(text, 1, 40)) AS raw
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                        '[EMAIL]', 'g'),
         '\+?[0-9][0-9()\-\s]{6,}[0-9]', '[PHONE]', 'g') AS scrubbed
FROM seeded
ORDER BY doc_id
"""


@_register("pii_scrub_documents", _PII_ORACLE)
def pii_scrub_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: email/phone patterns redacted
    with chained regexp_replace (codegen'd, zero Python). Inputs are
    deterministic synthetic PII seeded from the documents table (the corpus
    itself contains none)."""
    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("contact "),
        F.col("source"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" re: "),
        F.substring("text", 1, 40),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            raw, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"
        ),
        r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
        "[PHONE]",
    )
    return d.select("doc_id", scrubbed.alias("scrubbed")).orderBy("doc_id")


_TFIDF_ORACLE = r"""
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents WHERE doc_id < 50 AND trim(text) <> ''
),
tf AS (
  SELECT doc_id, unnest(toks) AS term FROM docs
),
tf_counts AS (
  SELECT doc_id, term, count(*) AS tf FROM tf WHERE term <> ''
  GROUP BY doc_id, term
),
df_counts AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf_counts GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM docs),
scored AS (
  SELECT t.doc_id, t.term,
         round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS tfidf
  FROM tf_counts t JOIN df_counts d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
ORDER BY doc_id, rnk
"""


@_register("tfidf_top_terms", _TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction (doc_id<50 slice): term frequency per doc,
    document frequency per term (two aggregations sharing the exploded
    token frame), idf = ln(N/df), top-3 per doc. The df side is tiny after
    aggregation → broadcast back onto tf."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 50) & (F.trim(F.col("text")) != ""))
    )
    docs = d.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks")
    ).localCheckpoint(eager=False)  # shared by tf, df, and N
    n_docs = docs.count()
    terms = docs.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term") != ""
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df_counts), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("doc_id", "rnk")
    )


_VOCAB_ORACLE = r"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
  FROM documents WHERE trim(text) <> ''
),
counts AS (
  SELECT token, count(*) AS freq FROM tok WHERE token <> '' GROUP BY token
)
SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) AS INT) AS vocab_id,
       token, freq
FROM counts
ORDER BY vocab_id
LIMIT 100
"""


@_register("vocabulary_build", _VOCAB_ORACLE)
def vocabulary_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by frequency with dense contiguous
    ids (the tokenizer-training precursor). Global rank over the aggregated
    term counts — the sort runs on the tiny post-agg frame, never the
    corpus."""
    d = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    counts = (
        d.select(F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = W.orderBy(F.col("freq").desc(), "token")
    return (
        counts.withColumn("vocab_id", F.row_number().over(w).cast("int"))
        .select("vocab_id", "token", "freq")
        .orderBy("vocab_id")
        .limit(100)
    )


# ===========================================================================
# Wave 7: statistical aggregates, session windows
# ===========================================================================

_STATS_AGG_ORACLE = """
SELECT event_type,
       round(stddev_samp(value), 6)        AS sd_value,
       round(var_samp(value), 6)           AS var_value,
       round(corr(value, user_id), 6)      AS corr_value_user,
       round(covar_samp(value, user_id), 6) AS covar_value_user,
       round(regr_slope(value, user_id), 6) AS slope,
       round(regr_intercept(value, user_id), 6) AS intercept
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@_register("stats_aggregates", _STATS_AGG_ORACLE)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate breadth: sample stddev/variance, correlation,
    covariance, and least-squares regression (slope/intercept) per group —
    all single-pass JVM aggregates (regr_* = the per-group trend extraction
    that would otherwise tempt an applyInPandas)."""
    e = _t(spark, sf_dir, "events")
    uid = F.col("user_id").cast("double")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("value"), 6).alias("sd_value"),
            F.round(F.var_samp("value"), 6).alias("var_value"),
            F.round(F.corr("value", uid), 6).alias("corr_value_user"),
            F.round(F.covar_samp("value", uid), 6).alias("covar_value_user"),
            F.round(F.regr_slope("value", uid), 6).alias("slope"),
            F.round(F.regr_intercept("value", uid), 6).alias("intercept"),
        )
        .orderBy("event_type")
    )


_SESSION_WINDOW_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
tagged AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM (SELECT user_id, session_id, count(*) AS n_events
      FROM tagged GROUP BY user_id, session_id)
GROUP BY user_id
ORDER BY user_id
"""


@_register("session_window_agg", _SESSION_WINDOW_ORACLE)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (30-min gap merge) pinned against an
    INDEPENDENT derivation (lag + running-sum gap sessionization in the
    oracle) — two different algorithms, same sessions. Works identically on
    a stream with withWatermark; the batch form keeps the check exact."""
    e = _t(spark, sf_dir, "events")
    per_session = e.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("win")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .orderBy("user_id")
    )


_UPSERT_ORACLE = """
WITH latest AS (
  SELECT user_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type AS last_event_type,
       round(value, 2) AS last_value, ts AS last_ts
FROM latest WHERE rn = 1
ORDER BY user_id
"""


@_register("streaming_upsert_latest", _UPSERT_ORACLE)
def streaming_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MERGE into a keyed zone: per-user latest state upserted
    micro-batch by micro-batch (keep-newest by event time, so the final
    zone is deterministic under any batch split) — the CDC-compaction the
    reference's append-only sink never does. The returned frame is the
    final committed version (streaming/sinks.run_stream_upsert_parquet)."""
    import tempfile

    from nyc_taxi_data_pipeline_spark.streaming.sinks import run_stream_upsert_parquet

    stream = _events_stream(spark, sf_dir)
    zone = tempfile.mkdtemp(prefix="upsert_zone_")
    final = run_stream_upsert_parquet(
        stream, zone, key_cols=["user_id"], order_col="ts", tiebreak_col="event_id"
    )
    return final.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("value", 2).alias("last_value"),
        F.col("ts").alias("last_ts"),
    ).orderBy("user_id")


_APPROX_PCTL_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 2)  AS exact_p50,
       round(quantile_cont(l_extendedprice, 0.9), 2)  AS exact_p90,
       round(quantile_cont(l_extendedprice, 0.99), 2) AS exact_p99,
       TRUE AS approx_within_1pct
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@_register("approx_percentile_sketch", _APPROX_PCTL_ORACLE)
def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile sketches (the 100 TB path for percentile_stats):
    approx_percentile (accuracy 10000) per return flag, VALUE-CHECKED
    against the exact interpolated percentiles — the entry emits
    `approx_within_1pct`, true iff all three sketch quantiles land within
    rtol 0.01 of exact, and the oracle asserts the exact values plus
    literal TRUE. Sketch internals stay engine-specific; the accuracy
    contract is driver-verified (measured error ≤0.1% at sf0.1, so 1% is
    a hard-fail bound)."""
    li = _t(spark, sf_dir, "lineitem")
    approx = F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000)
    exact = F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(exact[0], 2).alias("exact_p50"),
            F.round(exact[1], 2).alias("exact_p90"),
            F.round(exact[2], 2).alias("exact_p99"),
            (
                (F.abs(approx[0] - exact[0]) <= F.lit(0.01) * F.abs(exact[0]))
                & (F.abs(approx[1] - exact[1]) <= F.lit(0.01) * F.abs(exact[1]))
                & (F.abs(approx[2] - exact[2]) <= F.lit(0.01) * F.abs(exact[2]))
            ).alias("approx_within_1pct"),
        )
        .orderBy("l_returnflag")
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
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
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
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
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
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
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
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
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


_CC_ORACLE = r"""
WITH RECURSIVE
d AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE doc_id < 500)
),
e AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        >= 0.5
),
sym AS (
  SELECT id_a AS srcn, id_b AS dstn FROM e
  UNION ALL
  SELECT id_b, id_a FROM e
),
walk(node, label) AS (
  SELECT DISTINCT srcn, srcn FROM sym
  UNION
  SELECT s.srcn, w.label FROM sym s JOIN walk w ON w.node = s.dstn
),
comp AS (SELECT node, min(label) AS component FROM walk GROUP BY node)
SELECT c.component AS component, c.node AS doc_id, s.n_members AS n_members
FROM comp c
JOIN (SELECT component, count(*) AS n_members FROM comp GROUP BY component) s
  USING (component)
ORDER BY component, doc_id
"""


@_register("dedup_connected_components", _CC_ORACLE)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE duplicate clusters: exact-Jaccard edges (>= 0.5, doc_id < 500
    slice) closed transitively by iterative min-label propagation — the
    iterative-algorithm class nothing else in the catalog exercises. The
    oracle recomputes the same components with a recursive CTE: two
    independent algorithms, identical clusters
    (operators/graph.connected_components)."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import all_pairs_jaccard
    from nyc_taxi_data_pipeline_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    edges = all_pairs_jaccard(d, "text", "doc_id", min_jaccard=0.5)
    comp = connected_components(edges, src="id_a", dst="id_b")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        comp.join(sizes, "component")
        .select("component", F.col("node").alias("doc_id"), "n_members")
        .orderBy("component", "doc_id")
    )


# one shared Morton definition for the audit entry, its oracle, AND the
# write_zorder_zone layout writer (functions/scalar.py)
_z_interleave_sql = scalar.z_interleave_sql


_ZORDER_ORACLE = f"""
WITH pts AS (
  SELECT CAST(user_id % 128 AS BIGINT)        AS x,
         CAST(event_id % 128 AS BIGINT)       AS y
  FROM events
),
z AS (
  SELECT x, y, {_z_interleave_sql('x', 'y', 7)} AS zval FROM pts
),
files AS (
  SELECT 'linear' AS layout, x // 8 AS file_id,
         min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
  FROM z GROUP BY x // 8
  UNION ALL
  SELECT 'zorder' AS layout, zval // 1024 AS file_id,
         min(x), max(x), min(y), max(y)
  FROM z GROUP BY zval // 1024
)
SELECT layout,
       count(*) AS n_files,
       CAST(sum(CASE WHEN min_x <= 15 AND max_x >= 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS x_band_files,
       CAST(sum(CASE WHEN min_y <= 15 AND max_y >= 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS y_band_files
FROM files
GROUP BY layout
ORDER BY layout
"""


@_register("zorder_layout_audit", _ZORDER_ORACLE)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER data layout audit — the multi-dimensional clustering idea
    behind Delta/Iceberg OPTIMIZE ZORDER, reduced to its measurable
    essence: cut the same events into equal-count "files" two ways —
    along one column (linear) and along the interleaved-bit Morton
    curve — and count how many files' min-max ranges a 16-wide band
    predicate on EACH dimension must touch. That touch-count IS parquet
    row-group / file skipping: the linear layout prunes perfectly on
    its sort column and not at all on the other (every file spans the
    full y range), the z-order layout prunes on BOTH. The interleave is
    exact integer shift/mask arithmetic shared textually with the
    oracle. Scale shape: one projection + two value-range-bounded
    aggregates; writing the layout for real is repartitionByRange /
    sortWithinPartitions on zval at ingest — this entry is the audit
    that justifies that write."""
    e = _t(spark, sf_dir, "events")
    pts = e.select(
        (F.col("user_id") % 128).cast("bigint").alias("x"),
        (F.col("event_id") % 128).cast("bigint").alias("y"),
    )
    z = pts.select(
        "x", "y", F.expr(_z_interleave_sql("x", "y", 7)).alias("zval")
    )
    box = [
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    ]
    linear = (
        z.groupBy(F.expr("x div 8").alias("file_id"))
        .agg(*box)
        .select(F.lit("linear").alias("layout"), "*")
    )
    zord = (
        z.groupBy(F.expr("zval div 1024").alias("file_id"))
        .agg(*box)
        .select(F.lit("zorder").alias("layout"), "*")
    )
    hit_x = F.when((F.col("min_x") <= 15) & (F.col("max_x") >= 0), 1).otherwise(0)
    hit_y = F.when((F.col("min_y") <= 15) & (F.col("max_y") >= 0), 1).otherwise(0)
    return (
        linear.unionByName(zord)
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(hit_x).cast("bigint").alias("x_band_files"),
            F.sum(hit_y).cast("bigint").alias("y_band_files"),
        )
        .orderBy("layout")
    )


_KEEP_BEST_ORACLE = r"""
WITH RECURSIVE
d AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents WHERE doc_id < 500)
),
e AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        >= 0.5
),
sym AS (
  SELECT id_a AS srcn, id_b AS dstn FROM e
  UNION ALL
  SELECT id_b, id_a FROM e
),
walk(node, label) AS (
  SELECT DISTINCT srcn, srcn FROM sym
  UNION
  SELECT s.srcn, w.label FROM sym s JOIN walk w ON w.node = s.dstn
),
comp AS (SELECT node, min(label) AS component FROM walk GROUP BY node),
scored AS (
  SELECT c.component, c.node AS doc_id, doc.n_chars,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY doc.n_chars DESC, c.node) AS rn
  FROM comp c JOIN documents doc ON doc.doc_id = c.node
),
sizes AS (SELECT component, count(*) AS n_members FROM scored GROUP BY component)
SELECT s.component, z.n_members,
       s.doc_id  AS kept_doc_id,
       s.n_chars AS kept_n_chars,
       z.n_members - 1 AS n_dropped
FROM scored s JOIN sizes z USING (component)
WHERE s.rn = 1
ORDER BY s.component
"""


@_register("dedup_cluster_keep_best", _KEEP_BEST_ORACLE)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware CANONICAL SELECTION — what production curation does
    after clustering near-duplicates: within each transitive duplicate
    cluster keep the highest-quality member (here: longest, tie → lowest
    id) and drop the rest, instead of the min-id convention the simpler
    dedup entries use (keeping the best member measurably beats keeping
    an arbitrary one when duplicates differ in truncation/boilerplate).
    Reuses all_pairs_jaccard edges (≥ 0.5, doc_id < 500 slice) and
    iterative min-label components; the oracle recomputes both with a
    recursive CTE plus the same argmax window. Scale shape: component
    labels join the doc metadata on id, the argmax window partitions by
    component (clusters are small by construction), sizes are a rollup
    on the label — all candidate-proportional past the shingle pass."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import all_pairs_jaccard
    from nyc_taxi_data_pipeline_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    edges = all_pairs_jaccard(d, "text", "doc_id", min_jaccard=0.5)
    comp = connected_components(edges, src="id_a", dst="id_b")
    scored = comp.join(
        d.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    ).select(
        "component",
        F.col("node").alias("doc_id"),
        "n_chars",
        F.row_number()
        .over(
            W.partitionBy("component").orderBy(
                F.col("n_chars").desc(), F.col("node")
            )
        )
        .alias("rn"),
    )
    sizes = scored.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        scored.filter(F.col("rn") == 1)
        .join(sizes, "component")
        .select(
            "component",
            "n_members",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("n_chars").alias("kept_n_chars"),
            (F.col("n_members") - 1).alias("n_dropped"),
        )
        .orderBy("component")
    )


_EXACT_NEARDUP_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents)
),
e AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        >= 0.8
)
SELECT doc_id, lang, source
FROM documents
WHERE doc_id NOT IN (SELECT id_b FROM e)
ORDER BY doc_id
"""


@_register("dedup_exact_jaccard", _EXACT_NEARDUP_ORACLE)
def dedup_exact_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup dedup (J >= 0.8, keep the smaller id): the
    deterministic ground truth the probabilistic minhash path
    (dedup_minhash_lsh) approximates — possible at full precision because
    the inverted-index all-pairs Jaccard finds every above-threshold pair
    without an O(n²) scan (operators/dedup.all_pairs_jaccard)."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import all_pairs_jaccard

    d = _t(spark, sf_dir, "documents")
    dups = (
        all_pairs_jaccard(d, "text", "doc_id", min_jaccard=0.8)
        .select(F.col("id_b").alias("__dup"))
        .distinct()
    )
    return (
        d.join(dups, d["doc_id"] == dups["__dup"], "left_anti")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
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
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
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
        o.join(F.broadcast(big), o["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
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


_WINNOW_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                        i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS h
  FROM toks
),
fp AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(h) - 3, 0) + 1),
                        j -> list_min(h[j:j+3]))) AS fps
  FROM sh
),
ex AS (SELECT doc_id, unnest(fps) AS fingerprint FROM fp WHERE len(fps) > 0)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       count(*) AS shared_fingerprints
FROM ex a JOIN ex b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
GROUP BY id_a, id_b
HAVING count(*) >= 2
ORDER BY id_a, id_b
"""


@_register("winnowing_overlap_pairs", _WINNOW_ORACLE)
def winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window document fingerprinting (winnowing, SIGMOD'03): hash
    every 3-token shingle, keep each 4-window's min hash, pair docs sharing
    ≥2 fingerprints — position-robust partial-overlap detection the
    whole-doc Jaccard family can't express. Hashes are md5 strings min'd
    lexicographically, so Spark and DuckDB select identical fingerprints
    (operators/dedup.winnowing_overlap_pairs)."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import winnowing_overlap_pairs

    d = _t(spark, sf_dir, "documents")
    return winnowing_overlap_pairs(d, "text", "doc_id").orderBy("id_a", "id_b")


_CDC_CHUNK_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS pos
  FROM documents WHERE trim(text) <> ''
),
flag AS (
  SELECT doc_id, pos, tok,
         CASE WHEN substr(md5(tok), 1, 1) IN ('0', '1') THEN 1 ELSE 0 END
           AS is_cut
  FROM toks
),
fires AS (
  SELECT doc_id, pos, tok,
         CASE WHEN is_cut = 1 AND coalesce(sum(is_cut) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 0) = 0
              THEN 1 ELSE 0 END AS fires
  FROM flag
),
chunks AS (
  SELECT doc_id, pos, tok,
         coalesce(sum(fires) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS chunk_id
  FROM fires
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       CAST(count(*) AS INT) AS n_tokens,
       string_agg(tok, ' ' ORDER BY pos) AS chunk_text
FROM chunks
GROUP BY doc_id, chunk_id
ORDER BY doc_id, chunk_id
"""


@_register("content_defined_chunking", _CDC_CHUNK_ORACLE)
def content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (rsync/LBFS boundaries on token md5
    prefixes, min-size clamp): edit-robust chunks whose boundaries are pure
    functions of local content, so chunk-level dedup/caching survives
    document edits — unlike fixed-stride chunking where one inserted token
    shifts every later chunk (operators/textstats.content_defined_chunks;
    edit-locality pinned in tests/test_operators.py)."""
    from nyc_taxi_data_pipeline_spark.operators.textstats import content_defined_chunks

    d = _t(spark, sf_dir, "documents")
    return content_defined_chunks(d, min_tokens=4).orderBy("doc_id", "chunk_id")


def _minhash_error_oracle(
    num_hashes: int = _MINHASH_LANES, bands: int = _MINHASH_BANDS
) -> str:
    """Oracle for the minhash estimate-error audit: the shared portable
    signature + banding CTE prefix, then per-candidate-pair lane-match
    counts next to exact shingle Jaccard, both in exact integer ppm."""
    matches = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    return _minhash_cte_prefix(num_hashes, bands) + f""",
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY id_a, id_b
),
m AS (
  SELECT c.id_a, c.id_b,
         ({matches}) AS matching_lanes,
         len(list_intersect(ha.sh, hb.sh)) AS inter,
         len(ha.sh) + len(hb.sh) - len(list_intersect(ha.sh, hb.sh)) AS un
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b
  JOIN shl ha ON ha.doc_id = c.id_a
  JOIN shl hb ON hb.doc_id = c.id_b
)
SELECT id_a, id_b,
       CAST(matching_lanes AS BIGINT)                    AS matching_lanes,
       CAST((matching_lanes * 1000000) // {num_hashes} AS BIGINT)
                                                         AS est_ppm,
       CAST((1000000 * inter) // un AS BIGINT)           AS exact_ppm,
       CAST(abs((matching_lanes * 1000000) // {num_hashes}
                - (1000000 * inter) // un) AS BIGINT)    AS err_ppm
FROM m
ORDER BY id_a, id_b
"""


@_register("minhash_estimate_error", _minhash_error_oracle())
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality AUDIT for the minhash family — the dedup analog
    of ann_recall_eval: for every candidate pair the portable LSH
    actually surfaces, put the 16-lane minhash estimate (matching lanes
    / 16) next to the EXACT shingle Jaccard, both in integer ppm, and
    report the absolute error. This is the number that justifies the
    probabilistic path: E[matching lanes]/16 = J, and the audit shows
    the realized spread at the operating point (16 lanes ⇒ σ ≈
    √(J(1-J)/16) ≈ 115,000 ppm at J=0.5). Every stage is the portable
    md5-lane recipe, so lane counts — not just shapes — carry a full
    value oracle. Scale shape: candidates come from the banded join
    (never all pairs); the exact-Jaccard verify joins shingle arrays
    only for candidate ids, i.e. cost is candidate-proportional, which
    is exactly why the audit can run continuously in production."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs_portable,
        minhash_signatures_portable,
    )
    from nyc_taxi_data_pipeline_spark.functions import text as textfn

    d = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures_portable(
        d, "text", "doc_id", num_hashes=_MINHASH_LANES
    ).localCheckpoint(eager=False)
    cand = lsh_candidate_pairs_portable(sigs, bands=_MINHASH_BANDS)
    cand = cand.localCheckpoint(eager=False)  # feeds the id-prune + joins
    # candidate-proportional verify (the verify_jaccard shape): build
    # shingle arrays ONLY for ids that appear in some candidate pair —
    # a broadcast semi-join prune BEFORE the shingle projection, so the
    # exact-Jaccard side never materializes corpus-wide arrays
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = (
        d.select(F.col("doc_id").alias("id"), F.col("text").alias("__t"))
        .join(F.broadcast(cand_ids), "id", "left_semi")
        .select(
            "id",
            F.array_distinct(textfn.shingles("__t", 3)).alias("sh"),
        )
        .localCheckpoint(eager=False)  # feeds both verify sides
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b"))
    ha = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    hb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    m = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr(
                "aggregate(zip_with(sig_a, sig_b,"
                " (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
                " 0, (acc, v) -> acc + v)"
            ).alias("matching_lanes"),
            # bigint BEFORE the *1e6 products: size() is int32 and ANSI
            # mode faults the overflow at ~2148 distinct shingles
            F.size(F.array_intersect("sh_a", "sh_b"))
            .cast("bigint")
            .alias("inter"),
            (
                F.size("sh_a") + F.size("sh_b")
                - F.size(F.array_intersect("sh_a", "sh_b"))
            )
            .cast("bigint")
            .alias("un"),
        )
    )
    return m.select(
        "id_a",
        "id_b",
        F.col("matching_lanes").cast("bigint").alias("matching_lanes"),
        F.expr(
            f"CAST((CAST(matching_lanes AS BIGINT) * 1000000)"
            f" div {_MINHASH_LANES} AS BIGINT)"
        ).alias("est_ppm"),
        F.expr("CAST((1000000 * inter) div un AS BIGINT)").alias("exact_ppm"),
        F.expr(
            f"CAST(abs((CAST(matching_lanes AS BIGINT) * 1000000)"
            f" div {_MINHASH_LANES}"
            " - (1000000 * inter) div un) AS BIGINT)"
        ).alias("err_ppm"),
    ).orderBy("id_a", "id_b")


def _lsh_balance_oracle(
    num_hashes: int = _MINHASH_LANES, bands: int = _MINHASH_BANDS
) -> str:
    """Oracle for the LSH bucket-balance audit: the shared signature +
    banding CTE prefix, then per-band bucket-size statistics in exact
    integers."""
    return _minhash_cte_prefix(num_hashes, bands) + """,
bucketsz AS (
  SELECT band, bucket, count(*) AS c FROM banded GROUP BY band, bucket
)
SELECT band,
       count(*)                                          AS n_buckets,
       CAST(sum(c) AS BIGINT)                            AS n_docs,
       CAST(max(c) AS BIGINT)                            AS max_bucket,
       CAST(sum(c * (c - 1) // 2) AS BIGINT)             AS pair_work,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                         AS n_singletons
FROM bucketsz
GROUP BY band
ORDER BY band
"""


@_register("lsh_bucket_balance_audit", _lsh_balance_oracle())
def lsh_bucket_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-balance AUDIT — the cost model of the banded candidate
    join, per band: bucket count, hottest bucket, singleton count, and
    pair_work = Σ c·(c−1)/2, which IS the number of candidate rows the
    band's self-join will emit. At 100 TB this is the number that says
    whether the banding parameters hold up: a hot bucket turns the
    candidate join quadratic in that bucket (the banded analog of key
    skew — same diagnostic role as partition_skew_audit plays for plain
    shuffles), and the fix is more bands / wider bands / salting the
    bucket key. Runs on the same signature pass the dedup itself uses,
    one extra bounded aggregate — audit cost is amortized into the
    pipeline. Exact integer arithmetic, full value oracle down to the
    per-band pair-work counts."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import (
        lsh_banded_buckets,
        minhash_signatures_portable,
    )

    d = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures_portable(
        d, "text", "doc_id", num_hashes=_MINHASH_LANES
    )
    # the SAME banding projection the candidate join uses — pair_work
    # counts exactly the rows lsh_candidate_pairs_portable would emit
    banded = lsh_banded_buckets(sigs, bands=_MINHASH_BANDS)
    bucketsz = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        bucketsz.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("c").cast("bigint").alias("n_docs"),
            F.max("c").cast("bigint").alias("max_bucket"),
            F.expr("CAST(sum(c * (c - 1) div 2) AS BIGINT)").alias(
                "pair_work"
            ),
            F.expr(
                "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_singletons"),
        )
        .orderBy("band")
    )


@_register("dedup_minhash_portable", _minhash_portable_oracle())
def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup removal on PORTABLE md5 lanes (lexicographic
    string minima): the same shingle→signature→band→verify→anti-join
    pipeline as dedup_minhash_lsh, but every stage is bit-reproducible in
    any engine with md5 — so the ORACLE RUNS THE ACTUAL LSH ALGORITHM
    (generated SQL: 16 min-lanes, 4 md5 band buckets, exact-Jaccard
    verify ≥ 0.8) instead of a rows-only check. The xxhash64 fast path
    stays the production default; this pins its logic cross-engine
    (operators/dedup.minhash_dedup_portable)."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import minhash_dedup_portable

    d = _t(spark, sf_dir, "documents")
    return (
        minhash_dedup_portable(d, "text", "doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@_register("dedup_minhash_oph", _minhash_oph_oracle())
def dedup_minhash_oph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-permutation-hashing MinHash+LSH near-dup removal: one md5 per
    distinct shingle (vs 16 in dedup_minhash_portable), hex-prefix binning
    into 16 lanes, circular-rotation densification of empty bins, then the
    same band→candidate→exact-Jaccard-verify→anti-join tail. The signature
    pass — the corpus-wide cost that dominates at 100 TB — does ~16x less
    hash work for the same banding width; the oracle SQL runs the identical
    algorithm, so the probabilistic pipeline stays cross-engine-verified
    (operators/dedup.minhash_dedup_oph; Li/Owen/Zhang NIPS'12 one-
    permutation hashing with Shrivastava/Li rotation densification)."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import minhash_dedup_oph

    d = _t(spark, sf_dir, "documents")
    return (
        minhash_dedup_oph(d, "text", "doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


_FUNNEL_ORACLE = r"""
WITH stats AS (
  SELECT doc_id, lang, source, text,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))
           AS n_punct,
         len(regexp_extract_all(lower(text),
             '\b(the|and|of|to|is|that|with)\b')) AS n_stop
  FROM documents
),
scored AS (
  SELECT doc_id, lang, source, text, n_tokens,
         round(CAST(0.4 AS DOUBLE) * least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0
             + CAST(0.3 AS DOUBLE) * (1.0 - (CASE WHEN n_chars = 0 THEN 0.0
                    ELSE CAST(n_punct AS DOUBLE) / n_chars END))
             + CAST(0.3 AS DOUBLE) * least((CASE WHEN n_tokens = 0 THEN 0.0
                    ELSE CAST(n_stop AS DOUBLE) / n_tokens END) * 4.0, 1.0), 6)
           AS quality_score
  FROM stats
),
kept AS (
  SELECT * FROM scored
  WHERE lang = 'en' AND quality_score >= 0.5 AND n_tokens BETWEEN 5 AND 10000
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY trim(regexp_replace(regexp_replace(lower(text),
                   '[!-/:-@\[-`{-~]', ' ', 'g'), '\s+', ' ', 'g'))
      ORDER BY doc_id) AS rn
    FROM kept) t
  WHERE rn = 1
)
SELECT source,
       count(*) AS n_docs,
       sum(n_tokens) AS total_tokens,
       round(CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS avg_quality
FROM deduped
GROUP BY source
ORDER BY source
"""


@_register("curation_funnel", _FUNNEL_ORACLE)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data curation funnel, composed from the
    engine's own operators: per-doc text stats → quality + language +
    length gates → exact dedup on normalized text (window, min-id wins) →
    per-source token budget of the surviving corpus. One declarative plan:
    the stats projection fuses into the scan, the dedup is the only wide
    shuffle, the final rollup is a tiny aggregate — the whole pipeline a
    100 TB curation run would execute, verified end-to-end against the
    oracle."""
    from nyc_taxi_data_pipeline_spark.functions import text as textfn

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        "text",
        textfn.token_count("text").alias("n_tokens"),
        textfn.quality_score("text").alias("quality_score"),
    )
    kept = scored.filter(
        (F.col("lang") == "en")
        & (F.col("quality_score") >= 0.5)
        & F.col("n_tokens").between(5, 10000)
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[!-/:-@\[-`{-~]", " "),
            r"\s+",
            " ",
        )
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy(norm).orderBy(F.col("doc_id")))
    deduped = kept.withColumn("__rn", rn).filter(F.col("__rn") == 1)
    return (
        deduped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            # decimal sum -> one double division: order-independent, so the
            # 6-dp rounding cannot flip with partitioning (quality_score is
            # itself a 6-dp grid value — a float avg ties on that grid)
            F.round(
                F.sum(F.col("quality_score").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_quality"),
        )
        .orderBy("source")
    )


_MIX_ORACLE = r"""
WITH rates AS (
  SELECT * FROM (VALUES
    ('src0', 100), ('src1', 100), ('src2', 100), ('src3', 100), ('src4', 100),
    ('src5', 50), ('src6', 50), ('src7', 50), ('src8', 50), ('src9', 50)
  ) AS t(source, rate_pct)
),
kept AS (
  SELECT d.doc_id, d.source,
         CASE WHEN trim(d.text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(d.text), '\s+')) END AS n_tokens
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE d.doc_id % 100 < r.rate_pct
)
SELECT source, count(*) AS n_docs, sum(n_tokens) AS total_tokens
FROM kept
GROUP BY source
ORDER BY source
"""


@_register("dataset_mix_weighted", _MIX_ORACLE)
def dataset_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible weighted corpus mixing: per-source sampling rates
    applied by id-stride (doc_id % 100 < rate) — the deterministic analog
    of Bernoulli sampling, so the same mix ships on every rerun and on any
    partitioning (sampleBy's RNG can't promise either). Rates live in a
    broadcast dim; unlisted sources drop out via the inner join. The
    pattern that turns '50% of source X, all of source Y' training recipes
    into one scan + one tiny aggregate at 100 TB
    (functions.text.token_count for the budget)."""
    from nyc_taxi_data_pipeline_spark.functions import text as textfn

    d = _t(spark, sf_dir, "documents")
    rates = F.broadcast(
        spark.createDataFrame(
            [(f"src{i}", 100) for i in range(5)]
            + [(f"src{i}", 50) for i in range(5, 10)],
            "source string, rate_pct int",
        )
    )
    return (
        d.join(rates, "source")
        .filter(F.col("doc_id") % 100 < F.col("rate_pct"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(textfn.token_count("text")).alias("total_tokens"),
        )
        .orderBy("source")
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
        supply.join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
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
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn.n_nationkey"))
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
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
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == sn["n_nationkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
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
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
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
        F.broadcast(s)
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
            F.broadcast(bad_supp),
            li["l_suppkey"] == bad_supp["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
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
        F.broadcast(p), shipped["l_partkey"] == p["p_partkey"]
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
        waiting.join(F.broadcast(s), F.col("l1.l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


# ===========================================================================
# Time-series + curation wave: gap-fill/LOCF, stream-stream join, canonical
# dedup mapping, hash-stratified sampling.
# ===========================================================================

_GAPFILL_ORACLE = """
WITH span AS (
  SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi
  FROM events
),
spine AS (
  SELECT u.user_id, g.bucket_ts
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN span
  CROSS JOIN LATERAL unnest(generate_series(span.lo, span.hi,
                                            INTERVAL 1 DAY)) AS g(bucket_ts)
),
obs AS (
  SELECT user_id, date_trunc('day', ts) AS bucket_ts,
         sum(CAST(value AS DECIMAL(38,6))) AS observed_dec
  FROM events GROUP BY 1, 2
)
SELECT sp.user_id,
       sp.bucket_ts,
       CAST(round(o.observed_dec, 2) AS DOUBLE) AS observed,
       CAST(round(last_value(o.observed_dec IGNORE NULLS) OVER (
           PARTITION BY sp.user_id ORDER BY sp.bucket_ts
           ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS filled,
       o.observed_dec IS NULL AS is_gap
FROM spine sp LEFT JOIN obs o
  ON o.user_id = sp.user_id AND o.bucket_ts = sp.bucket_ts
ORDER BY sp.user_id, sp.bucket_ts
"""


@_register("timeseries_gapfill_locf", _GAPFILL_ORACLE)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap-fill + LOCF (time_bucket_gapfill/locf semantics):
    every user × day in the global span materialized, missing days carry
    the last observed daily total forward. Spine via sequence()+explode
    (narrow codegen, no driver loop); fill via one last(ignorenulls)
    window — the join and the window share the user partitioning
    (operators/temporal.gap_fill_forward)."""
    from nyc_taxi_data_pipeline_spark.operators.temporal import gap_fill_forward

    e = _t(spark, sf_dir, "events")
    return gap_fill_forward(
        e, key="user_id", ts_col="ts", value_col="value", bucket="1 day"
    ).orderBy("user_id", "bucket_ts")


_SS_JOIN_ORACLE = """
SELECT c.event_id  AS click_id,
       p.event_id  AS purchase_id,
       c.user_id   AS user_id,
       c.ts        AS click_ts,
       p.ts        AS purchase_ts
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
ORDER BY click_id, purchase_id
"""


@_register("stream_stream_join_attribution", _SS_JOIN_ORACLE)
def stream_stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream event-time interval join (the Structured Streaming
    capability the reference's append-only CDC path never used): a click
    stream joined to a purchase stream on user within [click, click+1h).
    Both sides are real file-source streams with watermarks bounding the
    join state (streaming/sinks.stream_stream_interval_join); the drained
    memory sink must equal the batch interval join the oracle runs —
    exactness of stream-stream inner join under complete drain."""
    import uuid

    from nyc_taxi_data_pipeline_spark.streaming.sinks import (
        run_stream_to_memory,
        stream_stream_interval_join,
    )

    stream = _events_stream(spark, sf_dir)
    clicks = stream.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    lw = clicks.withWatermark("click_ts", "2 hours")
    rw = purchases.withWatermark("purchase_ts", "2 hours")
    joined = lw.join(
        rw,
        (lw["c_user"] == rw["p_user"])
        & (rw["purchase_ts"] >= lw["click_ts"])
        & (rw["purchase_ts"] < lw["click_ts"] + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        "click_id", "purchase_id",
        F.col("c_user").alias("user_id"),
        "click_ts", "purchase_ts",
    )
    sink = run_stream_to_memory(joined, f"ssj_{uuid.uuid4().hex[:8]}")
    return sink.orderBy("click_id", "purchase_id")


_CANONICAL_ORACLE = r"""
WITH n AS (
  SELECT doc_id, n_chars,
         trim(regexp_replace(regexp_replace(lower(text),
              '[!-/:-@\[-`{-~]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
  FROM documents
),
clustered AS (
  SELECT doc_id, n_chars,
         array_to_string((regexp_split_to_array(norm, ' '))[1:3], ' ')
           AS cluster_key
  FROM n
),
ranked AS (
  SELECT doc_id,
         first_value(doc_id) OVER (
           PARTITION BY cluster_key
           ORDER BY n_chars DESC, doc_id) AS canonical_id,
         count(*) OVER (PARTITION BY cluster_key) AS group_size
  FROM clustered
)
SELECT doc_id, canonical_id, CAST(group_size AS BIGINT) AS group_size
FROM ranked
WHERE doc_id <> canonical_id
ORDER BY doc_id
"""


@_register("dedup_canonical_mapping", _CANONICAL_ORACLE)
def dedup_canonical_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster canonical selection: cluster documents by a
    prefix fingerprint (first 3 normalized tokens — the boilerplate-header
    clustering a curation pipeline uses), elect the longest (then
    lowest-id) member as canonical, and emit the redirect mapping
    duplicate → canonical so downstream joins can rewrite references to
    dropped docs. One window over the cluster key; no self-join."""
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[!-/:-@\[-`{-~]", " "),
            r"\s+",
            " ",
        )
    )
    cluster_key = F.array_join(F.slice(F.split(norm, " "), 1, 3), " ")
    w = W.partitionBy("__ck").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        d.select("doc_id", "n_chars", cluster_key.alias("__ck"))
        .select(
            "doc_id",
            F.first("doc_id").over(w).alias("canonical_id"),
            F.count(F.lit(1)).over(W.partitionBy("__ck")).alias("group_size"),
        )
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", "canonical_id", "group_size")
        .orderBy("doc_id")
    )


_STRATIFIED_ORACLE = r"""
WITH sampled AS (
  SELECT lang,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
  FROM documents
  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        < CASE WHEN lang = 'en' THEN '80000000' ELSE '40000000' END
)
SELECT lang, count(*) AS n_docs, sum(n_tokens) AS total_tokens
FROM sampled
GROUP BY lang
ORDER BY lang
"""


@_register("stratified_sample_hash", _STRATIFIED_ORACLE)
def stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by content-independent hash:
    keep ~50% of English and ~25% of every other language by comparing a
    uniform md5 lane of the doc id against a per-stratum threshold. Unlike
    rng-based sampleBy this is reproducible across engines, restarts, and
    partitionings (the property a training-data pipeline needs for
    resumable runs); unlike id-stride sampling it is uncorrelated with
    generation order. Narrow map-side filter — no shuffle until the
    per-stratum summary agg."""
    from nyc_taxi_data_pipeline_spark.functions import text as textfn

    d = _t(spark, sf_dir, "documents")
    lane = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    thr = F.when(F.col("lang") == "en", F.lit("80000000")).otherwise(
        F.lit("40000000")
    )
    return (
        d.filter(lane < thr)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(textfn.token_count("text")).alias("total_tokens"),
        )
        .orderBy("lang")
    )


_ANN_QUANT_ORACLE = """
WITH scale AS (
  SELECT max(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> abs(x)))) AS q_scale
  FROM embeddings
),
qz AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 127.0 / q_scale) AS BIGINT)) AS qv
  FROM embeddings, scale
),
probes AS (SELECT vec_id AS query_id, qv AS pq FROM qz WHERE vec_id % 50 = 0),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(p.pq, c.qv) AS BIGINT) AS qdot
  FROM probes p CROSS JOIN qz c
),
ranked AS (
  SELECT query_id, neighbor_id, qdot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY qdot DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, qdot
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


@_register("ann_quantized_topk", _ANN_QUANT_ORACLE)
def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantized ANN: 4× narrower scan than float32 and an
    INTEGER dot-product ranking that is exact — no float rounding pact
    between engines needed, the scores themselves are reproducible
    (operators/similarity.quantized_topk). The scale factor is a corpus
    scalar (1-row broadcast), quantization a narrow map pass."""
    from nyc_taxi_data_pipeline_spark.operators.similarity import quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = quantized_topk(emb, queries, k=5)
    return out.withColumn("rank", F.col("rank").cast("int")).orderBy(
        "query_id", "rank"
    )


_RECON_ORACLE = """
WITH a AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0),
b AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 <> 0)
SELECT CASE WHEN a.o_orderkey IS NULL THEN 'right_only'
            WHEN b.o_orderkey IS NULL THEN 'left_only'
            ELSE 'both' END AS presence,
       count(*) AS n_keys,
       CAST(round(coalesce(sum(CAST(coalesce(a.o_totalprice, 0)
                                    - coalesce(b.o_totalprice, 0)
                                    AS DECIMAL(38,6))), 0), 2) AS DOUBLE)
         AS price_delta
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
GROUP BY presence
ORDER BY presence
"""


@_register("full_outer_reconciliation", _RECON_ORACLE)
def full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-source reconciliation via FULL OUTER join — the lake-vs-warehouse
    diff report every ELT pipeline needs (and the one outer-join flavor the
    rest of the catalog didn't pin): keys classified both/left-only/
    right-only with an exact decimal delta of the common measure. Full
    outer forces a shuffle join on the key (broadcast is illegal for it);
    one shuffle, then a tiny classify-agg."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("a_key"), F.col("o_totalprice").alias("a_price")
    )
    b = o.filter(F.col("o_orderkey") % 2 != 0).select(
        F.col("o_orderkey").alias("b_key"), F.col("o_totalprice").alias("b_price")
    )
    presence = (
        F.when(F.col("a_key").isNull(), "right_only")
        .when(F.col("b_key").isNull(), "left_only")
        .otherwise("both")
    )
    delta = (
        F.coalesce(F.col("a_price"), F.lit(0.0))
        - F.coalesce(F.col("b_price"), F.lit(0.0))
    ).cast("decimal(38,6)")
    return (
        a.join(b, a["a_key"] == b["b_key"], "full_outer")
        .groupBy(presence.alias("presence"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.round(
                F.coalesce(F.sum(delta), F.lit(0).cast("decimal(38,6)")), 2
            )
            .cast("double")
            .alias("price_delta"),
        )
        .orderBy("presence")
    )


_KPG_ORACLE = """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 3
ORDER BY source, rk
"""


@_register("sample_k_per_group", _KPG_ORACLE)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling (fixed eval/holdout sets): rank
    by a uniform md5 lane of the id within each source and keep the first
    k. Unlike orderBy(rand()) the choice is stable across runs, engines,
    and partitionings — resumable-pipeline property. One window shuffle on
    the group key; at 100 TB per-group state is O(1) (rank counter), and
    the md5 ordering spreads the picks uniformly regardless of id
    clustering."""
    d = _t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .withColumn("rk", F.col("rk").cast("int"))
        .orderBy("source", "rk")
    )


_SCD2_ORACLE = """
WITH log AS (
  SELECT user_id, event_type, ts, event_id
  FROM events WHERE user_id % 25 = 0
),
compacted AS (
  SELECT user_id, event_type, ts, event_id
  FROM (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM log
  ) WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM compacted
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, valid_from
"""


@_register("scd2_dimension_build", _SCD2_ORACLE)
def scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension versioning from a change log: consecutive
    duplicate states compacted (lag), then [valid_from, valid_to) validity
    intervals and is_current flags (lead) — both windows share one
    (key, ts) shuffle+sort (operators/warehouse.scd2_from_changelog)."""
    from nyc_taxi_data_pipeline_spark.operators.warehouse import scd2_from_changelog

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    return scd2_from_changelog(
        e, key="user_id", ts_col="ts", attr_col="event_type",
        tiebreak_col="event_id",
    ).orderBy("user_id", "valid_from")


_ZSCORE_ORACLE = """
WITH stats AS (
  SELECT l_returnflag,
         count(*)                                                    AS n,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice * l_extendedprice
                       AS DECIMAL(38,6))) AS DOUBLE)                 AS sxx
  FROM lineitem GROUP BY l_returnflag
),
bounds AS (
  SELECT l_returnflag,
         sx / n AS mu,
         sqrt((sxx - sx * sx / n) / (n - 1)) AS sigma
  FROM stats
)
SELECT l.l_returnflag,
       count(*) AS n_outliers,
       round(min(l.l_extendedprice), 2) AS min_outlier_price
FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
WHERE abs(l.l_extendedprice - b.mu) > 1.5 * b.sigma
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@_register("outlier_zscore_by_group", _ZSCORE_ORACLE)
def outlier_zscore_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection — the data-quality screen that
    catches corrupted measures before they poison training aggregates.
    Group stats are a tiny aggregate broadcast back onto the fact scan
    (two passes over lineitem, NOT a window: a window would sort every
    partition; the broadcast join keeps the second pass a pure map
    filter). μ and σ are derived from EXACT decimal sums then identical
    double arithmetic on both engines, so the boundary comparison cannot
    flip on summation order — rows at the threshold land the same way
    everywhere (the per-row x² products are deterministic doubles)."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    stats = li.groupBy(F.col("l_returnflag").alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(38,6)")).cast("double").alias("sx"),
        F.sum((x * x).cast("decimal(38,6)")).cast("double").alias("sxx"),
    )
    bounds = stats.select(
        "g",
        (F.col("sx") / F.col("n")).alias("mu"),
        F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sigma"),
    )
    return (
        li.join(F.broadcast(bounds), li["l_returnflag"] == F.col("g"))
        .filter(F.abs(x - F.col("mu")) > 1.5 * F.col("sigma"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.round(F.min("l_extendedprice"), 2).alias("min_outlier_price"),
        )
        .orderBy("l_returnflag")
    )


_GROUPING_SETS_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT)                              AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT)                              AS g_status,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_qty,
       count(*)                                                         AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


@_register("grouping_sets_aggregation", _GROUPING_SETS_ORACLE)
def grouping_sets_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity aggregation in ONE pass via GROUP BY GROUPING SETS
    (the general form of the cube/rollup family SURVEY.md §2.4 flags as
    natively exposable): detail, per-flag subtotal, and grand total share a
    single scan + Expand + partial/final HashAggregate instead of three
    scans unioned. GROUPING() markers disambiguate "NULL because
    subtotal" from data nulls. Output is sorted by the markers first so
    every sort key that can be NULL is constant within its tie-group —
    null-ordering defaults (Spark NULLS FIRST vs DuckDB NULLS LAST) can
    never reorder rows. At 100 TB the Expand tripling happens before the
    map-side combine, so the shuffle carries only one group-row per
    (set, key) per task — the same width as running the three aggregates
    separately, for a third of the scan cost."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double"), 2
            ).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


_ROLLING_RANGE_ORACLE = """
SELECT o_orderkey,
       o_custkey,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w
                  AS DOUBLE), 2)                                 AS rolling_7d_revenue,
       count(*) OVER w                                           AS rolling_7d_orders
FROM orders
WHERE o_custkey % 10 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


@_register("rolling_window_range_frame", _ROLLING_RANGE_ORACLE)
def rolling_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based rolling aggregate via a RANGE frame — the window-function
    shape SURVEY.md §2.5 notes the reference lacks but an analytics engine
    must expose (7-day trailing revenue per customer). The frame is
    value-based (epoch seconds), not row-based, so same-timestamp peers
    enter together and gaps in the series shrink the frame — semantics a
    rows-frame cannot express. One shuffle on the partition key, then a
    sorted single-pass sliding sum per partition (Spark keeps a running
    frame, O(1) amortized per row). Both engines order by the same integral
    epoch values and sum exact decimals, so the rolling totals are
    bit-stable cross-engine. At 100 TB: state is one frame per open
    customer — bounded by the 7-day span, not partition size."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-518400, W.currentRow)
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double"),
            2,
        ).alias("rolling_7d_revenue"),
        F.count(F.lit(1)).over(w).alias("rolling_7d_orders"),
    ).orderBy("o_custkey", "o_orderkey")


_UDTF_CHUNKS_ORACLE = r"""
SELECT doc_id,
       generate_subscripts(wins, 1) - 1 AS win_idx,
       unnest(wins)                     AS window_text
FROM (
  SELECT doc_id,
         [array_to_string(words[i+1:i+32], ' ')
          for i in range(0, greatest(length(words) - 32, 0) + 16, 16)] AS wins
  FROM (SELECT doc_id, string_split(text, ' ') AS words
        FROM documents WHERE doc_id % 5 = 0)
)
ORDER BY doc_id, win_idx
"""


@_register("udtf_sliding_chunks", _UDTF_CHUNKS_ORACLE)
def udtf_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunker as a Python UDTF in a LATERAL
    join — the table-function surface SURVEY.md §2.10 lists (the reference
    exposes row-multiplying transforms only through pandas `explode`,
    utils/transform.py). Emits 32-word windows every 16 words (RAG-style
    50% overlap, unlike the non-overlapping `document_chunking` entry);
    window starts run to `max(len-32,0)+16` exclusive so the final window
    always reaches the last word and every start past the first adds new
    words. One UDTF row-batch per input row, no shuffle at all until the
    final presentation sort — at 100 TB this is an embarrassingly parallel
    map whose output is ~2× input tokens, the expected overlap cost.
    The UDTF class is defined inside this function so cloudpickle ships it
    by value (executors can't import this package under a foreign-cwd
    driver)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="win_idx int, window_text string")
    class SlidingChunks:
        def eval(self, text):
            if text is None:
                return
            words = text.split(" ")
            n, w, s = len(words), 32, 16
            for k, start in enumerate(range(0, max(n - w, 0) + s, s)):
                yield k, " ".join(words[start : start + w])

    spark.udtf.register("sliding_chunks", SlidingChunks)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.win_idx, c.window_text
        FROM _udtf_docs d, LATERAL sliding_chunks(d.text) c
        ORDER BY d.doc_id, c.win_idx
        """
    )


_UDAF_MAD_ORACLE = """
SELECT o_orderpriority,
       round(mad(o_totalprice), 2) AS mad_totalprice,
       count(*)                    AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@_register("udaf_pandas_mad", _UDAF_MAD_ORACLE)
def udaf_pandas_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as an Arrow-batched grouped-agg pandas UDF — the
    UDAF surface of SURVEY.md §2.10 (the reference's only custom aggregates
    are pandas groupby lambdas, utils/transform.py). Median absolute
    deviation is a robust spread measure no built-in exposes; both engines
    compute median(|x - median(x)|) by selection over the same doubles
    (pandas averages the two middles exactly like DuckDB's median), so the
    rounded values agree bit-for-bit. The UDAF runs once per group AFTER a
    hash shuffle on the group key; each group must fit one worker's memory
    — fine for low-cardinality keys like priority (5 groups), and the
    docstring contract says so: for high-cardinality keys use the
    approx_percentile sketch entry instead."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit eval type: PEP-563 stringified hints can't be resolved here
    # (pandas is function-local), so type-hint inference is unavailable
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def _mad(v):
        med = v.median()
        return float((v - med).abs().median())

    # Spark disallows mixing pandas and JVM aggregates in one agg()
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a UDAF too
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def _n(v):
        return len(v)

    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(_mad("o_totalprice"), 2).alias("mad_totalprice"),
            _n("o_orderkey").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


_FUZZY_LEV_ORACLE = """
SELECT a.p_name                       AS name_a,
       b.p_name                       AS name_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM (SELECT DISTINCT p_name FROM part) a
JOIN (SELECT DISTINCT p_name FROM part) b
  ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
 AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
ORDER BY name_a, name_b
"""


@_register("fuzzy_join_blocked_levenshtein", _FUZZY_LEV_ORACLE)
def fuzzy_join_blocked_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity self-join with BLOCKING — the scale-correct shape for
    fuzzy matching (entity resolution over product/vendor names; the
    reference's location-name matching joins only on exact keys,
    models/staging). A naive all-pairs edit-distance join is O(n²); the
    blocking key (first token) turns it into an equi-join whose quadratic
    cost is confined within each block, then the JVM-side `levenshtein`
    prunes to true near-matches. Distances are small integers — exact in
    both engines. The distinct name list is consumed by both join sides, so
    it is localCheckpointed once (AQE stage reuse does not fire for
    self-joins of a derived frame). At 100 TB: block sizes are the skew
    knob — add a second blocking key (name length bucket) before any block
    outgrows a task."""
    names = (
        _t(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block", F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)))
        .localCheckpoint(eager=False)
    )
    a = names.select(F.col("p_name").alias("name_a"), "block")
    b = names.select(F.col("p_name").alias("name_b"), "block")
    return (
        a.join(b, ["block"])
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 3)
        .select("name_a", "name_b", "edit_dist")
        .orderBy("name_a", "name_b")
    )


_HISTOGRAM_ORACLE = """
SELECT CAST(floor((l_quantity - 1) / 5) AS INT)      AS bin_id,
       1 + 5 * CAST(floor((l_quantity - 1) / 5) AS INT) AS bin_lo,
       5 + 5 * CAST(floor((l_quantity - 1) / 5) AS INT) AS bin_hi,
       count(*)                                      AS n_rows,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 2)
                                                     AS revenue
FROM lineitem
GROUP BY 1, 2, 3
ORDER BY bin_id
"""


@_register("histogram_equiwidth", _HISTOGRAM_ORACLE)
def histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram as a binning aggregation — the profiling
    primitive behind the reference's Great Expectations value-distribution
    checks (SURVEY.md §2.11) done as ONE scan + tiny hash agg instead of a
    per-bucket filter loop. The bin id is floor arithmetic on integral
    quantities (1..50 → ten 5-wide bins): every division is exact at
    multiples of the width, so bin edges cannot flip between engines.
    Output is one row per non-empty bin — cardinality bounded by the bin
    count, not data size, so the final shuffle is negligible at any scale;
    the heavy lifting is the map-side partial aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    bin_id = F.floor((F.col("l_quantity") - 1) / 5).cast("int")
    return (
        li.select(
            bin_id.alias("bin_id"),
            (1 + 5 * bin_id).alias("bin_lo"),
            (5 + 5 * bin_id).alias("bin_hi"),
            "l_extendedprice",
        )
        .groupBy("bin_id", "bin_lo", "bin_hi")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double"), 2
            ).alias("revenue"),
        )
        .orderBy("bin_id")
    )


_FUNNEL_ORACLE = """
WITH t1 AS (
  SELECT user_id, min(ts) AS ts1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS ts2 FROM events e
  JOIN t1 ON e.user_id = t1.user_id
         AND e.ts > t1.ts1 AND e.ts <= t1.ts1 + INTERVAL 24 HOUR
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS ts3 FROM events e
  JOIN t2 ON e.user_id = t2.user_id
         AND e.ts > t2.ts2 AND e.ts <= t2.ts2 + INTERVAL 24 HOUR
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
stages AS (
  SELECT u.user_id,
         CASE WHEN t3.user_id IS NOT NULL THEN 3
              WHEN t2.user_id IS NOT NULL THEN 2
              WHEN t1.user_id IS NOT NULL THEN 1
              ELSE 0 END AS funnel_stage
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN t1 USING (user_id)
  LEFT JOIN t2 USING (user_id)
  LEFT JOIN t3 USING (user_id)
)
SELECT funnel_stage, count(*) AS n_users
FROM stages GROUP BY funnel_stage ORDER BY funnel_stage
"""


@_register("funnel_windowed_steps", _FUNNEL_ORACLE)
def funnel_windowed_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event funnel (view → click → purchase, each step within 24h
    of the previous, anchored at the user's FIRST view) — the product-
    analytics sequence operator (ClickHouse windowFunnel's anchored
    variant) the reference's event pipeline stops short of (SURVEY.md
    §2.9 computes only per-window counts). Spark-first shape: ONE shuffle
    to group by user, then a JVM-side higher-order F.aggregate walks the
    sorted in-group event list carrying (stage, last_ts) — no Python, no
    second pass per step. The oracle reaches the same stages via three
    progressive min() CTEs; greedy earliest-match equals nested-min
    because both anchor on the first view. At 100 TB the per-user event
    list bounds memory (collect_list per user), so pre-filter to the
    funnel's event types — here that's 3 of 5 types; for wide event
    streams add a date window too."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts", "event_type")
    )
    # walked over sort_array(collect_list(...)): (ts, event_type) ordering
    # makes same-ts ties deterministic and identical to the oracle's
    # strict-inequality chain
    step = F.expr("INTERVAL 24 HOURS")

    def _nxt(stage: int, x):
        return F.struct(
            F.lit(stage).alias("stage"), x["ts"].alias("t")
        )

    def _walk(acc, x):
        in_win = (x["ts"] > acc["t"]) & (x["ts"] <= acc["t"] + step)
        return (
            F.when((acc["stage"] == 0) & (x["event_type"] == "view"), _nxt(1, x))
            .when(
                (acc["stage"] == 1) & (x["event_type"] == "click") & in_win,
                _nxt(2, x),
            )
            .when(
                (acc["stage"] == 2) & (x["event_type"] == "purchase") & in_win,
                _nxt(3, x),
            )
            .otherwise(acc)
        )

    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("t")
    )
    per_user = ev.groupBy("user_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("ts", "event_type"))),
            init,
            _walk,
        )["stage"].alias("funnel_stage")
    )
    return (
        per_user.groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("funnel_stage")
    )


_CHECKSUM_ORACLE = """
SELECT count(*) AS n_rows,
       CAST(sum(CAST(CAST('0x' || substr(md5(concat_ws('|',
             l_orderkey, l_linenumber, l_partkey, l_suppkey,
             l_returnflag, l_linestatus,
             CAST(CAST(l_quantity AS INT) AS VARCHAR),
             strftime(l_shipdate, '%Y-%m-%d'))), 1, 15) AS BIGINT)
           AS DECIMAL(38,0))) AS VARCHAR) AS checksum
FROM lineitem
"""


@_register("table_checksum_orderfree", _CHECKSUM_ORACLE)
def table_checksum_orderfree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum: md5 each row's canonical key
    string, reinterpret the first 60 bits as an integer, SUM — the
    replication/migration validation primitive (engines expose it as
    CHECKSUM TABLE; the reference has no equivalent, it trusts row counts,
    SURVEY.md §2.11). Addition is commutative so partition order, shuffle
    order, and parallelism can't change the result, and the value is
    portable: md5 is byte-identical everywhere and the hex→int cast is
    exact. Sum in DECIMAL(38,0) — 60-bit addends would overflow BIGINT's
    headroom after ~8k rows; the sum ships as a STRING because 38-digit
    decimals silently degrade to float64 in Arrow/pandas bridges.
    Timestamps and floats enter via explicit deterministic formatting
    (date_format / integral cast), never via engine-default string casts.
    At 100 TB this is a pure map + one-row aggregate: no shuffle wider
    than one partial sum per task."""
    li = _t(spark, sf_dir, "lineitem")
    canonical = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("int").cast("string"),
        F.date_format("l_shipdate", "yyyy-MM-dd"),
    )
    row_val = F.conv(F.substring(F.md5(canonical), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_val).cast("string").alias("checksum"),
    )


_CENTROID_ORACLE = """
WITH scale AS (
  SELECT max(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> abs(x)))) AS q_scale
  FROM embeddings
),
qz AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 127.0 / q_scale) AS BIGINT)) AS qv
  FROM embeddings, scale
),
cents AS (SELECT vec_id AS centroid_id, qv AS cv FROM qz WHERE vec_id % 64 = 0),
dists AS (
  SELECT v.vec_id, c.centroid_id,
         list_sum([ (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i])
                    for i in range(1, len(v.qv) + 1) ]) AS d2
  FROM qz v CROSS JOIN cents c
),
best AS (
  SELECT vec_id, centroid_id, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
  FROM dists
)
SELECT centroid_id,
       count(*)               AS n_assigned,
       CAST(sum(d2) AS BIGINT) AS total_d2
FROM best WHERE rn = 1
GROUP BY centroid_id ORDER BY centroid_id
"""


@_register("centroid_assign_quantized", _CENTROID_ORACLE)
def centroid_assign_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means assignment step over int8-quantized embeddings — the
    clustering building block for IVF index construction and corpus
    dedup-by-cluster, done with EXACT integer L2² so the argmin is
    bit-stable cross-engine (float dot products would tie-break
    differently under reassociation). Every embedding scores against 8
    data-derived centroids via broadcast — no shuffle in the scoring pass;
    the only exchange is the final 8-row rollup. The quantized frame feeds
    both the centroid pick and the scoring side, so it is localCheckpointed
    once (AQE stage reuse does not fire on self-joins of a derived frame).
    At 100 TB: centroids are always broadcast-size (k × dim), scoring is
    embarrassingly parallel, and the integer arithmetic stays inside
    whole-stage codegen."""
    emb = _t(spark, sf_dir, "embeddings")
    dbl = F.col("embedding").cast("array<double>")
    scale = emb.agg(
        F.max(F.array_max(F.transform(dbl, lambda x: F.abs(x)))).alias("q_scale")
    )
    qz = (
        emb.crossJoin(F.broadcast(scale))
        .select(
            "vec_id",
            F.transform(
                dbl, lambda x: F.round(x * 127.0 / F.col("q_scale")).cast("long")
            ).alias("qv"),
        )
        .localCheckpoint(eager=False)
    )
    cents = qz.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("qv").alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = W.partitionBy("vec_id").orderBy("d2", "centroid_id")
    return (
        qz.crossJoin(F.broadcast(cents))
        .select("vec_id", "centroid_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            F.sum("d2").cast("bigint").alias("total_d2"),
        )
        .orderBy("centroid_id")
    )


_IQR_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
),
q AS (
  SELECT quantile_cont(n_orders, 0.25) AS q1,
         quantile_cont(n_orders, 0.75) AS q3
  FROM per_cust
)
SELECT o_custkey,
       n_orders,
       q1 - 1.5 * (q3 - q1) AS fence_lo,
       q3 + 1.5 * (q3 - q1) AS fence_hi
FROM per_cust, q
WHERE n_orders < q1 - 1.5 * (q3 - q1) OR n_orders > q3 + 1.5 * (q3 - q1)
ORDER BY o_custkey
"""


@_register("outlier_iqr_robust", _IQR_ORACLE)
def outlier_iqr_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (IQR) outlier screen — the robust complement to
    `outlier_zscore_by_group` (quartiles don't move when the outliers do;
    z-scores famously mask their own outliers). Runs on per-customer order
    COUNTS, where the synthetic lake actually has tail mass. Exactness:
    counts are integers and Spark's exact `percentile` uses the same
    pos = f·(n-1) linear interpolation as DuckDB's quantile_cont, so with
    dyadic f (0.25/0.75) every quartile, IQR, and 1.5×-fence is a finite
    binary fraction — the < comparisons cannot flip cross-engine. Scale
    shape: one count agg, a 1-row broadcast of the quartiles, and a scan-
    side filter; the counts frame feeds both and is materialized once.
    (Exact percentile needs a per-group sort at scale — swap
    approx_percentile in when rank-error tolerance is acceptable.)"""
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .localCheckpoint(eager=False)  # feeds the quartiles AND the filter
    )
    q = per_cust.agg(
        F.expr("percentile(n_orders, 0.25)").alias("q1"),
        F.expr("percentile(n_orders, 0.75)").alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        per_cust.crossJoin(F.broadcast(q))
        .filter((F.col("n_orders") < lo) | (F.col("n_orders") > hi))
        .select(
            "o_custkey",
            "n_orders",
            lo.alias("fence_lo"),
            hi.alias("fence_hi"),
        )
        .orderBy("o_custkey")
    )


_COHORT_ORACLE = """
WITH first_signup AS (
  SELECT user_id,
         min(ts)                                   AS signup_ts,
         CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id,
         CAST(date_trunc('week', e.ts) AS DATE) AS active_week
  FROM events e JOIN first_signup f USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= f.signup_ts
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INT)
         AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN first_signup f USING (user_id)
GROUP BY f.cohort_week, week_offset
ORDER BY f.cohort_week, week_offset
"""


@_register("cohort_retention", _COHORT_ORACLE)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the canonical product-analytics rollup
    (users grouped by signup week × weeks-since-signup in which they
    purchased). Weeks are ISO date_trunc on BOTH engines (Monday-aligned,
    so the day-diff is always a multiple of 7 and the integer division is
    exact); users without a signup never enter (inner join), pre-signup
    purchases are excluded on the raw timestamp. Scale shape: the cohort
    dim is one row per user — broadcast — so the event scan shuffles only
    for the per-(user, week) distinct; the final matrix is
    cohorts × offsets, tiny at any corpus size."""
    ev = _t(spark, sf_dir, "events")
    first = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
        .withColumn("cohort_week", F.date_trunc("week", F.col("signup_ts")).cast("date"))
        .localCheckpoint(eager=False)  # joined twice: activity filter + rollup
    )
    activity = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(first), "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts")).cast("date").alias("active_week"),
        )
        .distinct()
    )
    return (
        activity.join(F.broadcast(first), "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


_SLIDING_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) - INTERVAL 30 MINUTE AS t0,
         max(ts)                                          AS t1
  FROM events
),
starts AS (
  SELECT unnest(generate_series(t0, t1, INTERVAL 30 MINUTE)) AS ws FROM bounds
)
SELECT s.ws                                                  AS window_start,
       s.ws + INTERVAL 1 HOUR                                AS window_end,
       count(*)                                              AS n_events,
       round(CAST(sum(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE), 2)
                                                             AS total_value
FROM events e
JOIN starts s ON e.ts >= s.ws AND e.ts < s.ws + INTERVAL 1 HOUR
GROUP BY s.ws
ORDER BY window_start
"""


@_register("sliding_window_counts", _SLIDING_ORACLE)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (sliding) time windows in BATCH: 1-hour windows every
    30 minutes, each event counted in exactly two — the trend-smoothing
    companion to the tumbling `streaming_window_counts`. Spark's window()
    replicates each row once per containing window BEFORE the shuffle (an
    Expand, ×2 here), then it's a plain hash aggregate — no self-join, no
    range join. The oracle builds the same epoch-aligned window starts
    explicitly (series from the covering half-hour boundary) and range-
    joins; empty windows appear in neither engine. At 100 TB the cost is
    the overlap factor (window/slide), paid in the map stage where it
    combines — never a per-window scan."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 2
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


_TF_COSINE_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE doc_id % 4 = 0
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
),
norms AS (
  SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS nrm FROM tf GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
  FROM tf a JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
scored AS (
  SELECT d.doc_a, d.doc_b,
         round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_a
  JOIN norms nb ON nb.doc_id = d.doc_b
),
ranked AS (
  SELECT doc_a, doc_b, cosine,
         row_number() OVER (PARTITION BY doc_a
                            ORDER BY cosine DESC, doc_b) AS rnk
  FROM scored
)
SELECT doc_a, doc_b, CAST(rnk AS INT) AS rnk, cosine
FROM ranked WHERE rnk <= 3
ORDER BY doc_a, rnk
"""


@_register("doc_similarity_tf_cosine", _TF_COSINE_ORACLE)
def doc_similarity_tf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse document-to-document cosine top-k over TERM-FREQUENCY vectors
    via an inverted index — the relational complement to the dense
    embedding ANN family: no vectors stored, the dot product is
    sum(tf_a·tf_b) grouped on an equi-join over shared terms, so work is
    Σ postings² per term, never |docs|². Exactness: tf values are
    integers (exact dot), sqrt is IEEE-correctly-rounded in both engines,
    and the final division happens in one identical expression — ties in
    cosine break on doc id. The tf frame feeds the join twice plus the
    norms, so it is materialized once. At 100 TB: cap ultra-frequent
    terms (they dominate postings²) exactly like the all-pairs-Jaccard
    docstring prescribes; IDF weighting (log) is deliberately absent —
    transcendental functions aren't bit-reproducible across engines, and
    the portable contract is part of this catalog's spec."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    tf = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # feeds both join sides + norms
    )
    norms = tf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf")).cast("double")).alias("nrm")
    )
    a = tf.select(F.col("doc_id").alias("doc_a"), "term", F.col("tf").alias("tf_a"))
    b = tf.select(F.col("doc_id").alias("doc_b"), "term", F.col("tf").alias("tf_b"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    w = W.partitionBy("doc_a").orderBy(F.col("cosine").desc(), "doc_b")
    return (
        dots.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_a", "doc_b", "rnk", "cosine")
        .orderBy("doc_a", "rnk")
    )


_CADENCE_ORACLE = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
)
SELECT o_custkey,
       count(*) + 1                          AS n_orders,
       CAST(max(gap_days) AS INT)            AS max_gap_days,
       CAST(min(gap_days) AS INT)            AS min_gap_days,
       CAST(sum(gap_days) AS BIGINT)         AS total_span_days
FROM gaps
WHERE gap_days IS NOT NULL AND o_custkey % 25 = 0
GROUP BY o_custkey
ORDER BY o_custkey
"""


@_register("order_cadence_gaps", _CADENCE_ORACLE)
def order_cadence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence analysis: per-customer gaps between CONSECUTIVE
    orders via lag() over (custkey, orderdate, orderkey) — the
    deterministic total order makes same-day orders tie-break identically
    in both engines, so every gap is the same integer day count. One
    shuffle on the partition key; the lag is a single pass over each
    sorted partition; sum(gaps) telescopes to last-minus-first (asserted
    by the oracle's BIGINT sum). The churn-risk signal (max gap) and
    subscription-likeness (min gap) drop out of the same window."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    )
    return (
        gaps.filter(F.col("gap_days").isNotNull() & (F.col("o_custkey") % 25 == 0))
        .groupBy("o_custkey")
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_orders"),
            F.max("gap_days").cast("int").alias("max_gap_days"),
            F.min("gap_days").cast("int").alias("min_gap_days"),
            F.sum("gap_days").cast("bigint").alias("total_span_days"),
        )
        .orderBy("o_custkey")
    )


_SHARE_ORACLE = """
WITH nat AS (
  SELECT n.n_regionkey, n.n_name,
         sum(CAST(o.o_totalprice AS DECIMAL(38,6))) AS nat_rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_regionkey, n.n_name
)
SELECT r.r_name                                        AS region,
       nat.n_name                                      AS nation,
       round(CAST(nat.nat_rev AS DOUBLE), 2)           AS nation_revenue,
       round(CAST(nat.nat_rev AS DOUBLE)
             / CAST(sum(nat.nat_rev) OVER (PARTITION BY nat.n_regionkey)
                    AS DOUBLE) * 100, 4)               AS pct_of_region
FROM nat JOIN region r ON nat.n_regionkey = r.r_regionkey
ORDER BY region, pct_of_region DESC, nation
"""


@_register("revenue_share_of_region", _SHARE_ORACLE)
def revenue_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent decomposition (nation revenue as % of its
    region): aggregate once at the CHILD grain, then a window sum over
    the parent key supplies the denominator — one detail shuffle plus a
    25-row window, where the naive two-aggregations-and-a-join shape scans
    the fact twice. Both engines window over the SAME decimal sums, so
    the shares divide identical doubles. At 100 TB the fact joins only
    broadcast dims and aggregates straight to nation grain — the window
    runs on 25 rows regardless of fact size."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    nat = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("nat_rev"))
    )
    wreg = W.partitionBy("n_regionkey")
    return (
        nat.join(F.broadcast(r), nat["n_regionkey"] == r["r_regionkey"])
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.round(F.col("nat_rev").cast("double"), 2).alias("nation_revenue"),
            F.round(
                F.col("nat_rev").cast("double")
                / F.sum("nat_rev").over(wreg).cast("double")
                * 100,
                4,
            ).alias("pct_of_region"),
        )
        .orderBy("region", F.col("pct_of_region").desc(), "nation")
    )


_BASKET_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
part_support AS (
  SELECT l_partkey, count(*) AS n_orders FROM items GROUP BY l_partkey
),
pair_support AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS together
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
),
n_orders_total AS (SELECT count(DISTINCT l_orderkey) AS n FROM items)
SELECT p.part_a, p.part_b, p.together,
       round(CAST(p.together AS DOUBLE) * t.n
             / (sa.n_orders * sb.n_orders), 6) AS lift
FROM pair_support p
JOIN part_support sa ON sa.l_partkey = p.part_a
JOIN part_support sb ON sb.l_partkey = p.part_b
CROSS JOIN n_orders_total t
WHERE p.together >= 3
ORDER BY p.together DESC, lift DESC, part_a, part_b
LIMIT 50
"""


@_register("basket_pair_affinity", _BASKET_ORACLE)
def basket_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same order,
    with LIFT (observed co-rate over independence) — association mining as
    one inverted-index self-join on the basket key, the same Σ postings²
    shape as the Jaccard/TF-cosine family (baskets are small, so the
    quadratic blowup is per-order, never per-catalog). Counts are exact;
    lift divides exact integers in one identical expression. The distinct
    item list feeds the pair join twice plus both support lookups — one
    materialization. Top-50 by support with full deterministic
    tie-breaking, so LIMIT is stable cross-engine."""
    items = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    support = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    total = items.agg(F.countDistinct("l_orderkey").alias("n"))
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("together"))
        .filter(F.col("together") >= 3)
    )
    sa = support.select(F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("na"))
    sb = support.select(F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            "together",
            F.round(
                F.col("together").cast("double") * F.col("n")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(
            F.col("together").desc(), F.col("lift").desc(), "part_a", "part_b"
        )
        .limit(50)
    )


_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
counts AS (
  SELECT event_type, next_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type, n,
       round(CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 6)
         AS p_next
FROM counts
ORDER BY event_type, next_type
"""


@_register("event_transition_matrix", _TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    (P(next event type | current)): lead() over a fully deterministic
    order (ts, event_id), count transitions, normalize per source state
    with a window over the 5×5 count matrix — sequence analytics as two
    windows and a hash agg, no Python state machine. Row probabilities
    divide exact integer counts, so they're bit-identical cross-engine.
    At 100 TB the only wide op is the shuffle on user_id; the matrix
    itself is |event types|² regardless of volume."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    counts = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wsrc = W.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wsrc).cast("double"), 6
        ).alias("p_next"),
    ).orderBy("event_type", "next_type")


_PROFILE_ORACLE = """
SELECT 'o_orderkey' AS col, count(*) - count(o_orderkey) AS n_nulls,
       count(DISTINCT o_orderkey) AS n_distinct,
       CAST(min(o_orderkey) AS VARCHAR) AS min_val,
       CAST(max(o_orderkey) AS VARCHAR) AS max_val
FROM orders
UNION ALL
SELECT 'o_custkey', count(*) - count(o_custkey), count(DISTINCT o_custkey),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_totalprice', count(*) - count(o_totalprice),
       count(DISTINCT o_totalprice),
       CAST(CAST(round(min(o_totalprice), 2) AS DECIMAL(38,2)) AS VARCHAR),
       CAST(CAST(round(max(o_totalprice), 2) AS DECIMAL(38,2)) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderdate', count(*) - count(o_orderdate),
       count(DISTINCT o_orderdate),
       strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority), min(o_orderpriority), max(o_orderpriority)
FROM orders
ORDER BY col
"""


@_register("profile_table_onepass", _PROFILE_ORACLE)
def profile_table_onepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (nulls / distincts / min / max per column, long
    format) in ONE scan: all 24 aggregates run in a single HashAggregate
    and `stack` unpivots the 1-row result — the engine-side DESCRIBE the
    reference's notebook-based validation re-queries column by column
    (SURVEY §2.11), and the oracle deliberately writes as 6 UNION'd scans
    to prove the fused pass agrees. Values ship as strings with
    type-aware canonical casts (decimals for doubles — Spark and DuckDB
    disagree on scientific notation for big doubles; explicit strftime
    for timestamps). At 100 TB: one scan versus one per column; the
    distinct counts are the only wide aggregates, and they share the
    scan."""
    o = _t(spark, sf_dir, "orders")
    n = F.count(F.lit(1))

    def prof(col, minmax):
        return [
            (n - F.count(col)).alias(f"__nn_{col}"),
            F.countDistinct(col).alias(f"__nd_{col}"),
            minmax(F.min(F.col(col))).alias(f"__mn_{col}"),
            minmax(F.max(F.col(col))).alias(f"__mx_{col}"),
        ]

    as_str = lambda c: c.cast("string")
    as_dec = lambda c: F.round(c, 2).cast("decimal(38,2)").cast("string")
    as_ts = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    plan = {
        "o_orderkey": as_str,
        "o_custkey": as_str,
        "o_orderstatus": as_str,
        "o_totalprice": as_dec,
        "o_orderdate": as_ts,
        "o_orderpriority": as_str,
    }
    wide = o.agg(*[a for c, f_ in plan.items() for a in prof(c, f_)])
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in plan
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(plan)}, {stack_args}) AS "
                "(col, n_nulls, n_distinct, min_val, max_val)"
            )
        )
        .orderBy("col")
    )


_ROLLING_DISTINCT_ORACLE = """
WITH pd AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
  FROM events WHERE event_type = 'purchase'
),
days AS (SELECT d, count(DISTINCT user_id) AS dau FROM pd GROUP BY d)
SELECT days.d                                     AS day,
       days.dau,
       (SELECT count(DISTINCT pd.user_id) FROM pd
        WHERE pd.d BETWEEN days.d - 6 AND days.d) AS wau
FROM days ORDER BY day
"""


@_register("rolling_distinct_users", _ROLLING_DISTINCT_ORACLE)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct purchasers (the WAU curve): COUNT DISTINCT
    over a sliding frame, which no engine's window aggregate does exactly
    — so the scalable shape is pre-aggregation to DAY grain
    (collect_set per day, one shuffle over the raw events), then a
    7-day array-union window over the bounded day series. The final
    window runs over one row per day — at 100 TB that is 365 rows/year
    regardless of event volume, so the single-partition WindowExec is
    fine BY CONSTRUCTION (the wide data never enters it); per-day user
    sets are the memory bound, swap in HLL sketch-merge when cardinality
    outgrows them. The oracle computes each day's window by correlated
    rescan — the dumb-but-obviously-right form."""
    pd_ = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
        )
    )
    daily = pd_.groupBy("day").agg(
        F.collect_set("user_id").alias("users"),
        F.countDistinct("user_id").alias("dau"),
    )
    w = (
        W.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    return (
        daily.select(
            "day",
            "dau",
            F.size(
                F.array_distinct(F.flatten(F.collect_list("users").over(w)))
            ).alias("wau"),
        )
        .orderBy("day")
    )


_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         dayofweek(ts)                       AS dow,
         count(*)                            AS n_events
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT dow, CAST(sum(n_events) AS DOUBLE) / count(*) AS dow_mean
  FROM daily GROUP BY dow
)
SELECT d.day, d.n_events,
       round(d.dow_mean, 4)              AS dow_mean,
       round(d.n_events / d.dow_mean, 4) AS ratio
FROM (SELECT daily.*, base.dow_mean FROM daily JOIN base USING (dow)) d
ORDER BY abs(d.n_events / d.dow_mean - 1) DESC, d.day
LIMIT 5
"""


@_register("seasonal_anomaly_days", _ANOMALY_ORACLE)
def seasonal_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware volume anomaly screen: each day's event count
    against the mean of ITS weekday (Mondays compare to Mondays —
    a plain daily mean would flag every weekend), top deviants first.
    The weekday key never leaves the plan, which matters because Spark
    numbers weekdays 1-7 from Sunday and DuckDB 0-6 — the PARTITION is
    identical, the labels aren't. Ratios divide exact integer counts by
    a sum/count double, computed in one identical expression on both
    engines; the |ratio-1| ordering ties break on the date. Scale shape:
    day-grain pre-aggregation again — after one shuffle the baseline and
    the ranking run on 365 rows/year."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.dayofweek(F.col("ts")).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    base = daily.groupBy("dow").agg(
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias("dow_mean")
    )
    joined = daily.join(F.broadcast(base), "dow")
    ratio = F.col("n_events") / F.col("dow_mean")
    # rank on the UNROUNDED ratio (matching the oracle's ORDER BY), then
    # round only the shipped columns — ordering against the rounded value
    # could flip the top-5 SET at the cutoff
    return (
        joined.orderBy(F.abs(ratio - 1).desc(), "day")
        .limit(5)
        .select(
            "day",
            "n_events",
            F.round("dow_mean", 4).alias("dow_mean"),
            F.round(ratio, 4).alias("ratio"),
        )
    )


_MULTIGRAIN_DISTINCT_ORACLE = """
SELECT CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       CAST(GROUPING(o_orderstatus) AS INT)   AS g_status,
       o_orderpriority,
       o_orderstatus,
       count(DISTINCT o_custkey)              AS n_customers,
       count(*)                               AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus
"""


@_register("distinct_counts_multigrain", _MULTIGRAIN_DISTINCT_ORACLE)
def distinct_counts_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT DISTINCT at three granularities (per priority, per status,
    global) in ONE logical pass: GROUPING SETS expands each row once per
    set, and Spark plans the distinct via an Expand + two-phase aggregate
    keyed on (set, group, custkey) — no separate job per grain, which is
    how the naive dashboard computes it. GROUPING() markers lead the sort
    so nullable keys are constant within tie groups (same null-ordering
    armor as grouping_sets_aggregation). Distinct counts are exact
    integers — at 100 TB swap approx_count_distinct in when the rollup
    dashboard tolerates ~2% (the sketch entry shows that lane)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "g_priority", "g_status", "o_orderpriority", "o_orderstatus",
            "n_customers", "n_orders",
        )
        .orderBy("g_priority", "g_status", "o_orderpriority", "o_orderstatus")
    )


_SET_BAG_ORACLE = """
WITH r AS (
  SELECT CAST(l_quantity AS INT) AS qty FROM lineitem
  WHERE l_returnflag = 'R' AND l_orderkey % 50 = 0
),
a AS (
  SELECT CAST(l_quantity AS INT) AS qty FROM lineitem
  WHERE l_returnflag = 'A' AND l_orderkey % 50 = 0
),
surplus AS (SELECT qty FROM r EXCEPT ALL SELECT qty FROM a),
common  AS (SELECT qty FROM r INTERSECT ALL SELECT qty FROM a)
SELECT 'r_surplus' AS op, qty, count(*) AS n FROM surplus GROUP BY qty
UNION ALL
SELECT 'common' AS op, qty, count(*) AS n FROM common GROUP BY qty
ORDER BY op, qty
"""


@_register("set_operations_bag", _SET_BAG_ORACLE)
def set_operations_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — BAG semantics, where multiplicity is
    data (how many MORE 'R' lineitems carry each quantity than 'A' ones):
    the distinct-set `set_operations` entry can't answer that. Spark
    plans both as a single aggregate computing per-row multiplicity
    deltas then a generate — one shuffle each, no join. Everything is
    exact integers. At 100 TB bag ops shuffle the full multiset — prefer
    pre-aggregated count comparison (the checksum/diff family) when only
    the delta summary is needed; this entry IS that delta summary, which
    is why it groups at the end."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_quantity").cast("int").alias("qty")
    )
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_quantity").cast("int").alias("qty")
    )
    surplus = (
        r.exceptAll(a)
        .groupBy("qty")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("r_surplus").alias("op"), "qty", "n")
    )
    common = (
        r.intersectAll(a)
        .groupBy("qty")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("common").alias("op"), "qty", "n")
    )
    return surplus.unionByName(common).orderBy("op", "qty")


# ===========================================================================
# Later additions: LLM data-curation screens (repetition, decontamination),
# an oracle-backed iterative algorithm (PageRank), and skyline analytics.
# ===========================================================================

_REPETITION_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(t) - 1, 1) + 1),
                        i -> array_to_string(t[i:i+1], ' ')) AS g2,
         list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                        i -> array_to_string(t[i:i+2], ' ')) AS g3
  FROM toks
),
fracs AS (
  SELECT doc_id,
         round(CASE WHEN len(g2) = 0 THEN 0.0
               ELSE 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) END, 6)
           AS dup_2gram_frac,
         round(CASE WHEN len(g3) = 0 THEN 0.0
               ELSE 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) END, 6)
           AS dup_3gram_frac
  FROM grams
)
SELECT doc_id, dup_2gram_frac, dup_3gram_frac,
       (dup_2gram_frac <= 0.3 AND dup_3gram_frac <= 0.3) AS keep
FROM fracs
ORDER BY doc_id
"""


@_register("repetition_filter_gopher", _REPETITION_ORACLE)
def repetition_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition screen: per-doc duplicate
    2-gram/3-gram fractions (1 - distinct/total) with a keep flag at the
    0.3 threshold — catches boilerplate/template spam/decoding loops that
    cross-document dedup never sees. Zero shuffles: one projection of
    array arithmetic over the token split, scan-speed at 100 TB
    (operators/textstats.repetition_stats)."""
    from nyc_taxi_data_pipeline_spark.operators.textstats import repetition_stats

    d = _t(spark, sf_dir, "documents")
    return repetition_stats(d, "text", "doc_id").orderBy("doc_id")


_DECONTAM_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
),
shl AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' '))) AS sh
  FROM toks
),
ev AS (SELECT doc_id AS eval_id, unnest(sh) AS s FROM shl WHERE doc_id % 5 = 0),
tr AS (SELECT doc_id AS train_id, unnest(sh) AS s FROM shl WHERE doc_id % 5 <> 0),
sizes AS (SELECT eval_id, count(*) AS n_shingles FROM ev GROUP BY eval_id),
pair_shared AS (
  SELECT ev.eval_id, tr.train_id, count(*) AS c
  FROM ev JOIN tr ON ev.s = tr.s
  GROUP BY ev.eval_id, tr.train_id
),
shared AS (SELECT eval_id, max(c) AS mx FROM pair_shared GROUP BY eval_id)
SELECT s.eval_id,
       s.n_shingles,
       round(CAST(coalesce(h.mx, 0) AS DOUBLE) / s.n_shingles, 6)
         AS max_overlap_frac,
       (CAST(coalesce(h.mx, 0) AS DOUBLE) / s.n_shingles) >= 0.5
         AS contaminated
FROM sizes s LEFT JOIN shared h ON h.eval_id = s.eval_id
ORDER BY s.eval_id
"""


@_register("decontamination_ngram_overlap", _DECONTAM_ORACLE)
def decontamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3/PaLM n-gram collision test): eval
    docs (hash split doc_id % 5 = 0) are flagged when any train doc shares
    >= 50% of their 3-gram set — eval examples leaked into training data
    invalidate the benchmark. Inverted-index equi-join on the shingle:
    work scales with postings-list products, never |train| x |eval|
    (operators/textstats.decontaminate_overlap)."""
    from nyc_taxi_data_pipeline_spark.operators.textstats import (
        decontaminate_overlap,
    )

    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 5 != 0)
    ev = d.filter(F.col("doc_id") % 5 == 0)
    return decontaminate_overlap(train, ev, "text", "doc_id").orderBy("eval_id")


def _pagerank_oracle(iterations: int = 3) -> str:
    """Unrolled-CTE PageRank oracle — possible because the operator's
    arithmetic is scaled-integer (bigint ranks, floor division), so every
    engine reproduces it bit-exactly; float power iteration would drift
    with summation order."""
    its = []
    prev = "pr0"
    for i in range(1, iterations + 1):
        its.append(f"""
it{i} AS (
  SELECT n2.node,
         (15 * CAST(1000000000000 AS BIGINT)) // (100 * nn.n)
         + (85 * coalesce(s.s, 0)) // 100 AS pr
  FROM nodes n2 CROSS JOIN nn
  LEFT JOIN (SELECT e.dst AS node, sum(p.pr // d.deg) AS s
             FROM edges e
             JOIN {prev} p ON p.node = e.src
             JOIN deg d ON d.src = e.src
             GROUP BY e.dst) s ON s.node = n2.node
)""")
        prev = f"it{i}"
    its_sql = ",".join(its)
    return f"""
WITH e0 AS (
  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT src, dst FROM e0
  UNION
  SELECT dst AS src, src AS dst FROM e0
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
pr0 AS (
  SELECT node, CAST(1000000000000 AS BIGINT) // nn.n AS pr
  FROM nodes CROSS JOIN nn
),{its_sql}
SELECT node, pr FROM {prev}
ORDER BY pr DESC, node
LIMIT 20
"""


@_register("pagerank_supplier_graph", _pagerank_oracle())
def pagerank_supplier_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, damping 0.85) over the symmetrized
    customer<->supplier trade graph derived from orders x lineitem — the
    canonical ITERATIVE join-aggregate workload, and thanks to the
    scaled-integer formulation it carries a full value oracle (unrolled
    CTEs) rather than the rows-only check iterative ops usually get.
    Each iteration shuffles once on the join key and once on the
    aggregation key; rank-frame lineage is checkpoint-truncated per round
    (operators/graph.pagerank_fixed_iterations)."""
    from nyc_taxi_data_pipeline_spark.operators.graph import (
        pagerank_fixed_iterations,
    )

    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    e0 = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # the symmetrized graph has no dangling sources (every node appears as
    # a src), so the leak shortcut is exact here — explicit opt-in; the
    # operator's default redistributes dangling mass for arbitrary graphs
    pr = pagerank_fixed_iterations(edges, dangling="leak")
    return pr.orderBy(F.col("pr").desc(), F.col("node")).limit(20)


_PARETO_ORACLE = """
WITH agg AS (
  SELECT o_custkey,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / count(*), 2) AS avg_order,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
pts AS (SELECT DISTINCT avg_order, n_orders FROM agg),
fr AS (
  SELECT avg_order, n_orders,
         max(n_orders) OVER (ORDER BY avg_order DESC, n_orders DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
  FROM pts
),
fpts AS (SELECT avg_order, n_orders FROM fr WHERE mx IS NULL OR n_orders > mx)
SELECT a.o_custkey,
       a.avg_order,
       a.n_orders
FROM agg a
JOIN fpts ON a.avg_order = fpts.avg_order AND a.n_orders = fpts.n_orders
ORDER BY a.avg_order DESC, a.o_custkey
"""


@_register("pareto_frontier_customers", _PARETO_ORACLE)
def pareto_frontier_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline/Pareto-frontier query: customers not dominated on
    (avg_order_value, n_orders) — no other customer is >= on both and >
    on one (the two objectives anti-correlate, so the frontier is a real
    curve, not a single max point). Computed without the naive quadratic
    NOT-EXISTS self-join: sort the DISTINCT point set by avg desc and
    keep points whose n_orders exceeds every preceding point's (running
    max window), then semi-join customers back — O(n log n), and the
    single-partition window runs on the post-aggregation point set,
    orders of magnitude smaller than the base table. The avg is derived
    from a decimal-exact sum and rounded BEFORE domination so both
    engines compare identical doubles."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            2,
        ).alias("avg_order"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    pts = agg.select("avg_order", "n_orders").distinct()
    w = W.orderBy(F.col("avg_order").desc(), F.col("n_orders").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    fpts = (
        pts.withColumn("__mx", F.max("n_orders").over(w))
        .filter(F.col("__mx").isNull() | (F.col("n_orders") > F.col("__mx")))
        .select("avg_order", "n_orders")
    )
    return (
        agg.join(fpts, ["avg_order", "n_orders"], "left_semi")
        .select("o_custkey", "avg_order", "n_orders")
        .orderBy(F.col("avg_order").desc(), F.col("o_custkey"))
    )


_SPINE_ORACLE = """
WITH RECURSIVE sparse AS (
  SELECT CAST(ts AS DATE) AS day, value FROM events WHERE event_id % 1000 = 0
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM sparse),
weeks(wk) AS (
  SELECT lo FROM bounds
  UNION ALL
  SELECT CAST(wk + INTERVAL 7 DAY AS DATE) FROM weeks, bounds
  WHERE CAST(wk + INTERVAL 7 DAY AS DATE) <= hi
),
days AS (
  SELECT CAST(unnest(generate_series(
           wk, least(CAST(wk + INTERVAL 6 DAY AS DATE), hi),
           INTERVAL 1 DAY)) AS DATE) AS day
  FROM weeks, bounds
),
daily AS (
  SELECT day, count(*) AS n_events,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
           AS total_value
  FROM sparse GROUP BY day
)
SELECT d.day,
       coalesce(a.n_events, 0) AS n_events,
       coalesce(a.total_value, 0.0) AS total_value
FROM days d LEFT JOIN daily a ON a.day = d.day
ORDER BY d.day
"""


@_register("recursive_calendar_spine", _SPINE_ORACLE)
def recursive_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE surface (WITH RECURSIVE, new in Spark 4): a dense
    daily calendar spine generated by recursion between min/max event
    dates, left-joined against (deliberately sparsified) daily aggregates
    so days with NO events appear as explicit zero rows — the dense-axis
    contract dashboards and window functions need, which gapfill-LOCF
    (timeseries_gapfill_locf) deliberately does not provide.

    The recursion is BATCHED one week per level (the recursive step
    advances a week anchor; sequence()+explode densifies each anchor to
    its ≤7 days): each UnionLoop level costs a fixed scheduling round
    regardless of rows, so day-per-level recursion made depth — hence
    wall time — equal to the calendar span in days (round-2's worst
    bench entry, 22 s for 30 rows in-suite). Weekly batching cuts depth
    7× while the emitted spine is row-identical; the level limit is
    raised to 1000 (≈19 years of span) rather than silently relying on
    the testdata span staying under Spark's 100-level default. The
    scale-out production spine for very long spans remains the pure
    sequence()+explode in operators/temporal.py (used by
    timeseries_gapfill_locf); this entry exists to exercise the
    WITH RECURSIVE surface itself."""
    from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

    # session conf must hold at EXECUTION time (the frame is lazy), so it
    # is set without restore — 1000 is harmless for every other query
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "1000")
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql("""
      WITH RECURSIVE sparse AS (
        SELECT CAST(ts AS DATE) AS day, value FROM events
        WHERE event_id % 1000 = 0
      ),
      bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM sparse),
      weeks(wk) AS (
        SELECT lo FROM bounds
        UNION ALL
        SELECT date_add(wk, 7) FROM weeks, bounds WHERE date_add(wk, 7) <= hi
      ),
      days AS (
        SELECT explode(sequence(wk, least(date_add(wk, 6), hi))) AS day
        FROM weeks, bounds
      ),
      daily AS (
        SELECT day, count(*) AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
                 AS total_value
        FROM sparse GROUP BY day
      )
      SELECT d.day,
             coalesce(a.n_events, 0L) AS n_events,
             coalesce(a.total_value, 0.0D) AS total_value
      FROM days d LEFT JOIN daily a ON a.day = d.day
      ORDER BY d.day
    """)


_REACH_ORACLE = """
WITH RECURSIVE e0 AS (
  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey % 10 = 0
),
edges AS (
  SELECT src, dst FROM e0
  UNION
  SELECT dst AS src, src AS dst FROM e0
),
seed AS (SELECT min(src) AS s FROM edges),
walk(node, d) AS (
  SELECT s, 0 FROM seed
  UNION ALL
  SELECT e.dst, w.d + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.d < 3
)
SELECT node, min(d) AS dist
FROM walk GROUP BY node
ORDER BY dist, node
"""


@_register("recursive_graph_reachability", _REACH_ORACLE)
def recursive_graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS over the (thinned) customer<->supplier graph as a
    RECURSIVE CTE: hop distance from the lexicographic-min node, min(d)
    per reached node. Each recursion level is one distributed join of the
    frontier against the edge list — the declarative twin of
    graph.connected_components' imperative loop. Depth is capped at 3 so
    UNION ALL path enumeration stays bounded (bipartite fan-out keeps
    level sizes polynomial; the min-aggregate collapses paths at the
    end); production unbounded closures belong to the imperative loop
    with its per-iteration checkpoint, not recursion."""
    from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
      WITH RECURSIVE e0 AS (
        SELECT DISTINCT 'c' || CAST(o.o_custkey AS STRING) AS src,
                        's' || CAST(l.l_suppkey AS STRING) AS dst
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey % 10 = 0
      ),
      edges AS (
        SELECT src, dst FROM e0
        UNION
        SELECT dst AS src, src AS dst FROM e0
      ),
      seed AS (SELECT min(src) AS s FROM edges),
      walk(node, d) AS (
        SELECT s, 0 FROM seed
        UNION ALL
        SELECT e.dst, w.d + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.d < 3
      )
      SELECT node, min(d) AS dist
      FROM walk GROUP BY node
      ORDER BY dist, node
    """)


_EQUIDEPTH_ORACLE = """
WITH agg AS (
  SELECT o_custkey,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey, spend,
         ntile(8) OVER (ORDER BY spend, o_custkey) AS bucket
  FROM agg
)
SELECT bucket,
       count(*) AS n_customers,
       round(CAST(min(spend) AS DOUBLE), 2) AS lo_spend,
       round(CAST(max(spend) AS DOUBLE), 2) AS hi_spend,
       round(CAST(sum(spend) AS DOUBLE), 2) AS bucket_spend
FROM tiled GROUP BY bucket
ORDER BY bucket
"""


@_register("histogram_equidepth", _EQUIDEPTH_ORACLE)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (quantile binning) of per-customer spend via
    ntile(8) — equal-population buckets with their value ranges, the
    complement of histogram_equiwidth's equal-range buckets. The window
    orders by (spend, custkey) so tile assignment is total-order
    deterministic; it runs single-partition but on the post-aggregation
    customer frame, not the fact table. Decimal-exact spend; doubles
    only at output."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend")
    )
    w = W.orderBy("spend", "o_custkey")
    tiled = agg.withColumn("bucket", F.ntile(8).over(w))
    return (
        tiled.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("spend").cast("double"), 2).alias("lo_spend"),
            F.round(F.max("spend").cast("double"), 2).alias("hi_spend"),
            F.round(F.sum("spend").cast("double"), 2).alias("bucket_spend"),
        )
        .orderBy("bucket")
    )


_PYDS_ORACLE = """
SELECT (i * 31) % 265 + 1 AS zone,
       count(*) AS n_trips,
       sum((i * 7919) % 10000) AS fare_cents
FROM range(0, 10000) t(i)
GROUP BY 1
ORDER BY zone
"""


@_register("python_datasource_scan", _PYDS_ORACLE)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector through the Python DataSource API (Spark 4): the
    `synthetic_trips` source plans one task per InputPartition (8 here),
    generates rows executor-side from seeded integer arithmetic, and the
    result aggregates like any scan. Replaces the reference's driver-side
    feeder loops (utils/streaming_data_db.py:48-58) with a partition-
    parallel source; determinism gives the entry a full value oracle
    (sources/pydatasource.py)."""
    from nyc_taxi_data_pipeline_spark.sources.pydatasource import (
        register_synthetic_trips,
    )

    register_synthetic_trips(spark)
    trips = (
        spark.read.format("synthetic_trips")
        .option("n_rows", 10_000)
        .option("partitions", 8)
        .load()
    )
    return (
        trips.groupBy("zone")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.sum("fare_cents").alias("fare_cents"),
        )
        .orderBy("zone")
    )


_VARIANT_ORACLE = """
SELECT event_type,
       CAST(ts AS DATE) AS day,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2)
         AS total_value
FROM events
WHERE event_id % 7 = 0
GROUP BY event_type, day
ORDER BY event_type, day
"""


@_register("variant_shredding", _VARIANT_ORACLE)
def variant_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT type surface (Spark 4): events are serialized into nested
    JSON envelopes, parsed with parse_json into VARIANT, and shredded
    back out with typed variant_get paths ($.meta.etype, $.meta.day,
    $.val) — the schema-on-read shape for semi-structured columns where
    from_json's fixed StructType (cdc_envelope_roundtrip) can't be
    declared up front. Typed doubles round-trip bit-exactly through
    Spark's JSON shortest-repr serialization, so the decimal-sum oracle
    holds; the whole path is JVM expressions, no Python."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    wire = e.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.col("event_type").alias("etype"),
                    F.date_format("ts", "yyyy-MM-dd").alias("day"),
                ).alias("meta"),
                F.col("value").alias("val"),
            )
        ).alias("j")
    )
    shredded = wire.select(F.parse_json(F.col("j")).alias("v")).select(
        F.variant_get("v", "$.meta.etype", "string").alias("event_type"),
        F.variant_get("v", "$.meta.day", "string").cast("date").alias("day"),
        F.variant_get("v", "$.val", "double").alias("val"),
    )
    return (
        shredded.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("val").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type", "day")
    )


_XML_ORACLE = """
SELECT CAST(user_id % 5 AS INTEGER) AS vendorid,
       value                        AS passenger_count,
       CAST(event_id % 100000 AS INTEGER) AS pulocationid
FROM events
WHERE event_id % 11 = 0
ORDER BY pulocationid
"""


@_register("xml_envelope_roundtrip", _XML_ORACLE)
def xml_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML format surface (natively built into Spark 4, no spark-xml jar):
    rows serialize through to_xml and decode back with a typed from_xml
    schema — the third wire format next to the JSON Debezium envelope
    (cdc_envelope_roundtrip) and the VARIANT path (variant_shredding).
    Pure JVM expressions; the oracle reads the source columns directly, so
    the roundtrip must be value-exact to pass."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    wire = e.select(
        F.to_xml(
            F.struct(
                (F.col("user_id") % 5).cast("int").alias("vendorid"),
                F.col("value").alias("passenger_count"),
                (F.col("event_id") % 100000).cast("int").alias("pulocationid"),
            )
        ).alias("x")
    )
    decoded = wire.select(
        F.from_xml(
            "x", "vendorid INT, passenger_count DOUBLE, pulocationid INT"
        ).alias("s")
    ).select("s.*")
    return decoded.orderBy("pulocationid")


_CSVEXPR_ORACLE = """
SELECT CAST(user_id % 5 AS INTEGER) AS vendorid,
       value                        AS passenger_count,
       CAST(event_id % 100000 AS INTEGER) AS pulocationid
FROM events
WHERE event_id % 13 = 0
ORDER BY pulocationid
"""


@_register("csv_envelope_roundtrip", _CSVEXPR_ORACLE)
def csv_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV expression surface (S3-class text format at the row level):
    to_csv serializes each row, from_csv parses it back under a typed
    schema — the degenerate-but-ubiquitous wire format, covered with the
    same value-exact roundtrip contract as the JSON/XML/VARIANT
    envelopes. Doubles survive because Spark writes shortest-round-trip
    representations."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 13 == 0)
    wire = e.select(
        F.to_csv(
            F.struct(
                (F.col("user_id") % 5).cast("int").alias("vendorid"),
                F.col("value").alias("passenger_count"),
                (F.col("event_id") % 100000).cast("int").alias("pulocationid"),
            )
        ).alias("c")
    )
    decoded = wire.select(
        F.from_csv(
            "c", "vendorid INT, passenger_count DOUBLE, pulocationid INT"
        ).alias("s")
    ).select("s.*")
    return decoded.orderBy("pulocationid")


_ARROW_QUANT_ORACLE = """
WITH s AS (
  SELECT max(list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE))))) AS scale
  FROM embeddings
),
q AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / scale) AS BIGINT))
           AS qv
  FROM embeddings, s
)
SELECT vec_id,
       CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS self_qdot,
       CAST(list_sum(list_transform(qv, v -> abs(v))) AS BIGINT) AS l1_norm
FROM q
ORDER BY vec_id
"""


@_register("arrow_quantized_norms", _ARROW_QUANT_ORACLE)
def arrow_quantized_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow surface (§2.10's Arrow-level lane, below pandas UDFs):
    embeddings are int8-quantized by vectorized pyarrow.compute kernels
    on zero-copy Arrow batches, then JVM array aggregates compute exact
    integer self-dot and L1 norms per vector. The Arrow rounding mode
    (half_towards_infinity) is pinned to Spark/DuckDB round semantics,
    so even though Python touches every lane the result carries a full
    value oracle (operators/similarity.quantize_embeddings_arrow). The
    quantization scale rides in as a broadcast column
    (crossJoin(broadcast(int8_scale))) read batch-side by the Arrow
    kernel — the whole entry is ONE Spark action with no driver-side
    collect."""
    from nyc_taxi_data_pipeline_spark.operators.similarity import (
        int8_scale,
        quantize_embeddings_arrow,
    )

    emb = _t(spark, sf_dir, "embeddings")
    with_scale = emb.crossJoin(F.broadcast(int8_scale(emb)))
    q = quantize_embeddings_arrow(with_scale, scale_col="q_scale")
    return (
        q.select(
            "vec_id",
            F.aggregate(
                F.transform(F.col("qvec"), lambda v: v * v),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("self_qdot"),
            F.aggregate(
                F.transform(F.col("qvec"), F.abs),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("l1_norm"),
        )
        .orderBy("vec_id")
    )


_LATERAL_ORACLE = """
SELECT n.n_name, l.c_name, l.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 2) l
ORDER BY n.n_name, l.c_acctbal DESC, l.c_name
"""


@_register("lateral_topn_per_nation", _LATERAL_ORACLE)
def lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY ... LIMIT — per-nation
    top-2 customers by balance, written the way an analyst writes it.
    Catalyst de-correlates it into row_number + WindowGroupLimit (the
    group-limit pushes down BEFORE the shuffle, so each map task emits at
    most 2 rows per key) + a broadcast equi-join back to nation — i.e.
    the same physical plan as the hand-written window formulation
    (window_topk_per_group), proving the declarative surface costs
    nothing at scale."""
    from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

    for t in ("nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
      SELECT n.n_name, l.c_name, l.c_acctbal
      FROM nation n,
      LATERAL (SELECT c_name, c_acctbal FROM customer c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_name LIMIT 2) l
      ORDER BY n.n_name, l.c_acctbal DESC, l.c_name
    """)


_NOTIN_ORACLE = """
SELECT 'no_null' AS variant, count(*) AS n_customers
FROM customer
WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 5)
UNION ALL
SELECT 'with_null' AS variant, count(*) AS n_customers
FROM customer
WHERE c_nationkey NOT IN
      (SELECT nullif(n_nationkey, 3) FROM nation WHERE n_nationkey < 5)
ORDER BY variant
"""


@_register("not_in_null_semantics", _NOTIN_ORACLE)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic NOT IN (the classic SQL trap, distinct from the
    <=> null-safe join in null_safe_equality_join): the same anti-
    membership predicate is evaluated against a subquery without NULLs
    (a plain anti-join count) and with an injected NULL — where NOT IN
    must return UNKNOWN for EVERY row, so the count is exactly 0. Spark
    plans the null-aware variant as a null-aware anti join rather than
    silently treating NULL as a non-match; the oracle pins both counts."""
    from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

    for t in ("nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
      SELECT 'no_null' AS variant, count(*) AS n_customers
      FROM customer
      WHERE c_nationkey NOT IN
            (SELECT n_nationkey FROM nation WHERE n_nationkey < 5)
      UNION ALL
      SELECT 'with_null' AS variant, count(*) AS n_customers
      FROM customer
      WHERE c_nationkey NOT IN
            (SELECT nullif(n_nationkey, 3) FROM nation WHERE n_nationkey < 5)
      ORDER BY variant
    """)


_ARRAY_HOF_ORACLE = r"""
WITH t AS (
  SELECT lang,
         regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
),
per_doc AS (
  SELECT lang,
         CASE WHEN len(list_filter(toks, x -> length(x) > 7)) > 0
              THEN 1 ELSE 0 END AS has_long,
         CASE WHEN len(list_filter(toks, x -> x = '')) = 0
              THEN 1 ELSE 0 END AS all_nonempty,
         len(list_filter(toks, x -> x LIKE 'a%')) AS n_a_tokens,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
           AS n_chars
  FROM t
)
SELECT lang,
       count(*)          AS n_docs,
       sum(has_long)     AS docs_with_long_token,
       sum(all_nonempty) AS docs_all_nonempty,
       sum(n_a_tokens)   AS total_a_tokens,
       sum(n_chars)      AS total_token_chars
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


@_register("array_hof_matrix", _ARRAY_HOF_ORACLE)
def array_hof_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array predicate/fold breadth: exists, forall, filter,
    and aggregate lambdas over the token array — the remaining §2.8-class
    function surface (transform/zip_with are exercised by the vector
    ops). One projection + one hash aggregate; lambdas evaluate per row
    JVM-side with no explode, so token arrays never hit a shuffle."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    per_doc = d.select(
        "lang",
        F.exists(toks, lambda t: F.length(t) > 7).cast("int").alias("has_long"),
        F.forall(toks, lambda t: t != "").cast("int").alias("all_nonempty"),
        F.size(F.filter(toks, lambda t: t.startswith("a"))).alias("n_a_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("n_chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("has_long").alias("docs_with_long_token"),
            F.sum("all_nonempty").alias("docs_all_nonempty"),
            F.sum("n_a_tokens").alias("total_a_tokens"),
            F.sum("n_chars").alias("total_token_chars"),
        )
        .orderBy("lang")
    )


_MAP_FN_ORACLE = """
WITH counts AS (
  SELECT user_id % 50 AS user_bucket, event_type, count(*) AS n
  FROM events
  GROUP BY 1, 2
)
SELECT user_bucket, event_type, n * 2 AS boosted
FROM counts
WHERE n >= 3
ORDER BY user_bucket, event_type
"""


@_register("map_function_matrix", _MAP_FN_ORACLE)
def map_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per-user event-type counts are packed into a MAP
    (map_from_entries over collected structs), transformed value-wise
    (transform_values), pruned entry-wise (map_filter), then unpacked
    with explode(map_entries) — the round trip every map function in the
    §2.8 family. Maps never appear in the OUTPUT schema (Arrow/oracle
    bridges disagree on map encodings); the oracle computes the same
    result relationally, so the map pipeline must be value-exact."""
    e = _t(spark, sf_dir, "events")
    counts = (
        e.groupBy((F.col("user_id") % 50).alias("user_bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    packed = counts.groupBy("user_bucket").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    boosted = packed.select(
        "user_bucket",
        F.map_filter(
            F.transform_values(F.col("m"), lambda _, v: v * 2),
            lambda _, v: v >= 6,
        ).alias("m"),
    )
    return (
        boosted.select(
            "user_bucket", F.explode(F.map_entries("m")).alias("ent")
        )
        .select(
            "user_bucket",
            F.col("ent.key").alias("event_type"),
            F.col("ent.value").alias("boosted"),
        )
        .orderBy("user_bucket", "event_type")
    )


_SESSION_VAR_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders
FROM orders
WHERE o_totalprice > 250000.0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@_register("session_variable_parameterized", _SESSION_VAR_ORACLE)
def session_variable_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL surface (Spark 4 SQL scripting family): a session
    variable (DECLARE OR REPLACE ... / SET VAR) carries the analyst's
    threshold into the query text-free, and EXECUTE IMMEDIATE ... USING
    binds a positional parameter — the two idioms that replace f-string
    SQL generation (the reference builds SQL by interpolation,
    utils/trinp_db.py:12-27, the injection-prone shape). The plan is
    identical to the constant-folded static query; the oracle IS that
    static query."""
    from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 200000.0"
    )
    spark.sql("SET VAR price_floor = 250000.0")
    return spark.sql("""
      EXECUTE IMMEDIATE
        'SELECT o_orderpriority, count(*) AS n_orders
         FROM orders WHERE o_totalprice > ?
         GROUP BY o_orderpriority ORDER BY o_orderpriority'
      USING price_floor
    """)


_STREAM_STATIC_ORACLE = """
WITH dim(event_type, category, weight) AS (
  VALUES ('click', 'engagement', 1),
         ('view', 'engagement', 1),
         ('purchase', 'revenue', 3),
         ('signup', 'growth', 2)
)
SELECT d.category,
       count(*) AS n_events,
       round(CAST(sum(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) , 2)
         AS total_value,
       sum(d.weight) AS total_weight
FROM events e JOIN dim d ON d.event_type = e.event_type
GROUP BY d.category
ORDER BY d.category
"""


@_register("stream_static_enrichment", _STREAM_STATIC_ORACLE)
def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join (the everyday streaming enrichment shape,
    distinct from the watermark-bounded stream-stream join): each
    micro-batch of the event stream joins a small static dimension —
    Spark broadcasts the static side, no state store is involved (only
    the downstream aggregation is stateful), and dimension updates take
    effect by restarting the query, the standard trade-off. Inner join
    doubles as the semi-filter (unmapped event types drop). Oracle: the
    same join run as batch SQL over a VALUES dim."""
    import uuid

    from nyc_taxi_data_pipeline_spark.streaming.sinks import run_stream_to_memory

    dim = F.broadcast(
        spark.createDataFrame(
            [
                ("click", "engagement", 1),
                ("view", "engagement", 1),
                ("purchase", "revenue", 3),
                ("signup", "growth", 2),
            ],
            "event_type string, category string, weight int",
        )
    )
    stream = _events_stream(spark, sf_dir)
    enriched = stream.join(dim, "event_type")
    agg = enriched.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
        .cast("double")
        .alias("total_value"),
        F.sum("weight").alias("total_weight"),
    )
    sink = run_stream_to_memory(agg, f"ss_{uuid.uuid4().hex[:8]}")
    return sink.orderBy("category")


_COLLATION_ORACLE = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS t
  FROM documents WHERE trim(text) <> ''
),
cased AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN upper(t) ELSE t END AS tc
  FROM tok
)
SELECT min(tc) AS token_key,
       count(*) AS n,
       count(DISTINCT tc) AS n_case_variants
FROM cased
GROUP BY lower(tc)
ORDER BY n DESC, token_key
LIMIT 20
"""


@_register("collated_group_by", _COLLATION_ORACLE)
def collated_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation surface (Spark 4): tokens are re-cased deterministically
    (upper on even doc ids) and grouped under UTF8_LCASE collation — the
    hash aggregate itself merges case variants, no lower() projection in
    the grouping key. Collation-aware grouping beats normalize-then-group
    when the ORIGINAL strings must survive (here: min + variant count per
    group prove both casings reached the same group). Output keys are
    binary min over the group, so the result is deterministic; the
    oracle groups by lower() which is semantically identical for ASCII."""
    d = _t(spark, sf_dir, "documents")
    tok = d.filter(F.trim("text") != "").select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
    )
    cased = tok.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("t")).otherwise(F.col("t")).alias(
            "tc"
        )
    )
    return (
        cased.groupBy(F.collate(F.col("tc"), "UTF8_LCASE").alias("__k"))
        .agg(
            F.min(F.collate(F.col("tc"), "UTF8_BINARY")).alias("token_key"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.collate(F.col("tc"), "UTF8_BINARY")).alias(
                "n_case_variants"
            ),
        )
        .drop("__k")
        .orderBy(F.col("n").desc(), "token_key")
        .limit(20)
    )


_SEMANTIC_DEDUP_ORACLE = """
WITH scale AS (
  SELECT max(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> abs(x)))) AS q_scale
  FROM embeddings
),
qz AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 127.0 / q_scale) AS BIGINT)) AS qv
  FROM embeddings, scale
),
cents AS (SELECT vec_id AS centroid_id, qv AS cv FROM qz WHERE vec_id % 64 = 0),
dists AS (
  SELECT v.vec_id, v.qv, c.centroid_id,
         list_sum([ (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i])
                    for i in range(1, len(v.qv) + 1) ]) AS d2
  FROM qz v CROSS JOIN cents c
),
best AS (
  SELECT vec_id, qv, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, centroid_id) AS rn
    FROM dists) WHERE rn = 1
),
pairs AS (
  SELECT b.vec_id AS dup_id,
         list_sum([ a.qv[i] * b.qv[i] for i in range(1, len(a.qv) + 1) ]) AS dot,
         list_sum([ a.qv[i] * a.qv[i] for i in range(1, len(a.qv) + 1) ]) AS na,
         list_sum([ b.qv[i] * b.qv[i] for i in range(1, len(b.qv) + 1) ]) AS nb
  FROM best a JOIN best b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
),
dropped AS (
  SELECT DISTINCT dup_id FROM pairs
  WHERE dot > 0 AND 400 * dot * dot >= 49 * na * nb
)
SELECT b.centroid_id,
       count(*)                                AS n_members,
       count(d.dup_id)                         AS n_dropped,
       count(*) - count(d.dup_id)              AS n_kept
FROM best b LEFT JOIN dropped d ON d.dup_id = b.vec_id
GROUP BY b.centroid_id
ORDER BY b.centroid_id
"""


@_register("semantic_dedup_clusters", _SEMANTIC_DEDUP_ORACLE)
def semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal by
    clustering embeddings and comparing pairs only WITHIN a cluster —
    the composition that turns the exact-quadratic
    `embedding_neardup_pairs` baseline into the 100 TB shape. Cluster
    assignment reuses the `centroid_assign_quantized` integer recipe
    (data-derived centroids, stride 64, so k grows with the corpus and
    per-cluster pair work stays bounded); the cosine ≥ 0.35 test runs in
    exact int64 arithmetic (400·dot² ≥ 49·‖a‖²·‖b‖², dot > 0), so every
    stage — and therefore this whole entry — carries a full value oracle.
    A vector drops when a smaller-id cluster-mate clears the threshold
    (operators/dedup.semantic_dedup_stats)."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import semantic_dedup_stats

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_stats(
        emb, "embedding", "vec_id", centroid_stride=64, tau_num=7, tau_den=20
    ).orderBy("centroid_id")


_CHARLM_ORACLE = """
WITH docs AS (
  SELECT doc_id, lower(text) AS t FROM documents
  WHERE text IS NOT NULL AND length(text) >= 3
),
tri AS (
  SELECT doc_id, unnest([ substr(t, i, 3) for i in range(1, length(t) - 1) ]) AS g
  FROM docs
),
model AS (SELECT g, count(*) AS cnt FROM tri GROUP BY g),
total AS (SELECT sum(cnt) AS tot FROM model),
scored AS (
  SELECT tri.doc_id,
         count(*)      AS n_trigrams,
         sum(m.cnt)    AS cnt_sum
  FROM tri JOIN model m USING (g)
  GROUP BY tri.doc_id
)
SELECT s.doc_id,
       s.n_trigrams,
       (1000000 * s.cnt_sum) // (s.n_trigrams * t.tot) AS score_ppm
FROM scored s, total t
ORDER BY s.doc_id
"""


@_register("charlm_freq_score", _CHARLM_ORACLE)
def charlm_freq_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-LM quality scoring, the CCNet/Gopher perplexity-filter
    analog an LLM curation pipeline runs before training: train a unigram
    char-3-gram model ON the corpus itself (one hash aggregate), then score
    each document by its mean trigram corpus-frequency — garbage text
    (mojibake, base64 blobs, typo storms) is built from RARE trigrams and
    scores low exactly where a real LM assigns high perplexity. The score
    is kept in scaled-integer arithmetic (ppm, bigint floor-div) so the
    entry carries a full cross-engine value oracle; a production variant
    at 100 TB corpus totals would hold the same ratio in DECIMAL(38,0) or
    DOUBLE. Scale shape: trigram explode is a narrow map; the model is a
    bounded-vocabulary aggregate (≤ |charset|³ rows) that BROADCASTS onto
    the scoring join — no shuffle of the corpus by trigram; the per-doc
    rollup shuffles on doc_id once."""
    d = _t(spark, sf_dir, "documents")
    docs = d.filter(
        F.col("text").isNotNull() & (F.length("text") >= 3)
    ).select("doc_id", F.lower(F.col("text")).alias("t"))
    tri = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("t") - 2)).alias("i"),
        F.col("t"),
    ).select("doc_id", F.expr("substring(t, i, 3)").alias("g"))
    tri = tri.localCheckpoint(eager=False)
    model = tri.groupBy("g").agg(F.count(F.lit(1)).alias("cnt"))
    total = model.agg(F.sum("cnt").alias("tot"))
    scored = (
        tri.join(F.broadcast(model), "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("cnt").alias("cnt_sum"),
        )
    )
    return (
        scored.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_trigrams",
            F.expr("(1000000 * cnt_sum) div (n_trigrams * tot)").alias(
                "score_ppm"
            ),
        )
        .orderBy("doc_id")
    )


_HLL_ROLLUP_ORACLE = """
WITH e AS (
  SELECT user_id,
         date_trunc('day', ts)                                AS day,
         date_diff('day', DATE '2024-01-01', ts) // 7         AS week_idx
  FROM events
)
SELECT week_idx,
       count(DISTINCT day)      AS n_days,
       count(DISTINCT user_id)  AS exact_users,
       TRUE                     AS union_within_5pct
FROM e
GROUP BY week_idx
ORDER BY week_idx
"""


@_register("hll_sketch_rollup", _HLL_ROLLUP_ORACLE)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL via
    hll_sketch_agg / hll_union_agg) — the pattern that makes COUNT
    DISTINCT incremental at 100 TB: exact distincts don't add across
    partitions, but sketches UNION. Daily per-partition sketches are
    built once (in production: persisted with the daily zone), then any
    coarser grain — here ISO-agnostic 7-day buckets — is answered by
    unioning the daily sketches WITHOUT re-scanning events. The entry
    value-checks the rolled-up estimate against the exact weekly distinct
    (rtol 5%; lgConfigK=12 measures ≲2%), so the accuracy contract is
    driver-verified while the sketch bytes stay engine-internal —
    same pattern as approx_distinct_sketch."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.expr("datediff(ts, DATE '2024-01-01') div 7").alias("week_idx"),
    )
    daily = e.groupBy("week_idx", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    weekly_sketch = daily.groupBy("week_idx").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("est_users"),
    )
    weekly_exact = e.groupBy("week_idx").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        weekly_sketch.join(weekly_exact, "week_idx")
        .select(
            "week_idx",
            "n_days",
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= F.lit(0.05) * F.col("exact_users")
            ).alias("union_within_5pct"),
        )
        .orderBy("week_idx")
    )


_OFFSET_LOG_ORACLE = """
WITH parts AS (SELECT unnest(range(0, 4)) AS p),
offs  AS (SELECT unnest(range(0, 150)) AS o),
recs AS (
  SELECT CAST((p * 1000003 + o * 7919) % 97 AS BIGINT) AS user_id,
         CAST((p * 31 + o * 17) % 1000 AS BIGINT)      AS amount_cents
  FROM parts, offs
)
SELECT user_id,
       count(*)          AS n_events,
       sum(amount_cents) AS total_cents
FROM recs
GROUP BY user_id
ORDER BY user_id
"""


@_register("streaming_offset_log_source", _OFFSET_LOG_ORACLE)
def streaming_offset_log_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 in spirit: a custom STREAMING source with Kafka's execution
    contract — partitioned append-only log, per-partition monotone
    offsets, batches planned as [start, end) offset ranges, executor-side
    range reads, commit acknowledgment — implemented through the Python
    DataSourceStreamReader API and drained over multiple paced
    micro-batches (150 offsets × 4 topic-partitions at 50 offsets/batch
    = 3 batches) into a streaming aggregation. The record stream is
    seeded integer arithmetic, so the drained result carries a full
    value oracle (the SQL regenerates the identical log). The broker
    wire protocol is the only piece this proves nothing about — no
    Kafka jar/broker exists in this image (sources/pydatasource.py,
    reference: streaming_processing/streaming_to_minio_fixed.py:46-53)."""
    import uuid

    from nyc_taxi_data_pipeline_spark.sources.pydatasource import (
        register_offset_log,
    )
    from nyc_taxi_data_pipeline_spark.streaming.sinks import run_stream_to_memory

    register_offset_log(spark)
    stream = (
        spark.readStream.format("offset_log")
        .option("partitions", 4)
        .option("n_rows", 150)
        .option("rows_per_batch", 50)
        .load()
    )
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("amount_cents").alias("total_cents"),
    )
    sink = run_stream_to_memory(agg, f"ol_{uuid.uuid4().hex[:8]}")
    return sink.orderBy("user_id")


_RATE_LIMIT_ORACLE = """
SELECT CAST(b AS BIGINT) AS batch_id,
       CAST(120 AS BIGINT) AS n_rows,
       CAST(4 AS BIGINT)   AS n_partitions,
       TRUE AS within_cap
FROM (SELECT unnest(range(0, 5)) AS b)
ORDER BY batch_id
"""


@_register("streaming_rate_limited_drain", _RATE_LIMIT_ORACLE)
def streaming_rate_limited_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 backpressure: the reference caps ingest at
    maxOffsetsPerTrigger=100 (streaming_to_minio_fixed.py:52); the
    offset_log source implements the same admission control — a TOTAL
    per-trigger offset ceiling split across partitions proportionally to
    available lag, exactly the Kafka source's planning rule. This entry
    drains 4 partitions x 150 offsets wanting 50/batch under a 120-offset
    ceiling and emits the REAL per-micro-batch row counts observed by a
    foreachBatch sink: the allocator's schedule is deterministic (30 per
    partition per trigger -> five 120-row batches), so the oracle states
    the exact expected batch sizes and the within-cap invariant is a
    hard value check, not a tautology (sources/pydatasource.py
    OffsetLogStreamReader.latestOffset)."""
    from nyc_taxi_data_pipeline_spark.sources.pydatasource import (
        register_offset_log,
    )

    register_offset_log(spark)
    stream = (
        spark.readStream.format("offset_log")
        .option("partitions", 4)
        .option("n_rows", 150)
        .option("rows_per_batch", 50)
        .option("max_offsets_per_trigger", 120)
        .load()
    )
    batches: list[tuple[int, int, int]] = []

    def observe(batch_df: DataFrame, batch_id: int) -> None:
        agg = batch_df.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("partition").alias("p"),
        ).collect()[0]
        if agg["n"] > 0:
            batches.append((batch_id, agg["n"], agg["p"]))

    q = stream.writeStream.foreachBatch(observe).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # re-number by drain order: foreachBatch ids are already sequential
    # from 0 for a fresh (checkpoint-less) query, but sort defensively
    rows = [
        (int(i), int(n), int(p), bool(n <= 120))
        for i, (bid, n, p) in enumerate(sorted(batches))
    ]
    return spark.createDataFrame(
        rows, "batch_id long, n_rows long, n_partitions long, within_cap boolean"
    ).orderBy("batch_id")


def _bpe_cte_prefix(n_merges: int = 3) -> str:
    """Shared unrolled-BPE CTE chain: word-frequency dictionary, sentinel
    symbol strings, then n (pair-count → argmax → merge) rounds. Each
    merge applies via sentinel-delimited string replace — replace() is
    greedy left-to-right non-overlapping in both engines, which IS the
    BPE merge rule. The word column rides along so downstream oracles can
    map encoded sequences back to words."""
    parts = [
        r"""
WITH words AS (
  SELECT w AS word, count(*) AS freq FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents WHERE text IS NOT NULL
  ) GROUP BY w
),
v0 AS (SELECT word, regexp_replace(word, '(.)', '|\1|', 'g') AS seq, freq
       FROM words)"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f""",
p{k} AS (
  SELECT pr['l'] AS l, pr['r'] AS r, sum(freq) AS cnt FROM (
    SELECT unnest([ {{'l': t[i], 'r': t[i+1]}} for i in range(1, len(t)) ]) AS pr,
           freq
    FROM (SELECT string_split(trim(seq, '|'), '||') AS t, freq FROM v{k - 1})
  ) GROUP BY 1, 2
),
best{k} AS (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1),
v{k} AS (
  SELECT word,
         replace(seq, '|' || l || '||' || r || '|', '|' || l || r || '|') AS seq,
         freq
  FROM v{k - 1}, best{k}
)"""
        )
    return "".join(parts)


def _bpe_oracle(n_merges: int = 3) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_rank, l AS merge_left, r AS merge_right, cnt AS pair_count FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        _bpe_cte_prefix(n_merges)
        + f"\nSELECT * FROM (\n{unions}\n) ORDER BY merge_rank"
    )


def _bpe_learn(spark: SparkSession, sf_dir: str, n_merges: int = 3):
    """Spark side of the shared BPE pipeline: returns (vocab, merges)
    where vocab is (word, seq, freq) after n merge rounds and merges is
    the list of 1-row (l, r, cnt) argmax frames in rank order. The
    data-dependent merge pattern rides in as a broadcast COLUMN (1-row
    argmax frame) — no driver-side collect anywhere in the loop."""
    d = _t(spark, sf_dir, "documents")
    words = (
        d.filter(F.col("text").isNotNull())
        .select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = words.select(
        "word", F.regexp_replace("word", "(.)", r"|$1|").alias("seq"), "freq"
    ).localCheckpoint(eager=False)

    merges = []
    for _ in range(n_merges):
        toks = F.split(F.btrim(F.col("seq"), F.lit("|")), r"\|\|")
        n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
        pair = F.zip_with(
            F.slice(toks, 1, n_pairs),
            F.slice(toks, 2, n_pairs),
            lambda l, r: F.struct(l.alias("l"), r.alias("r")),
        )
        pcnt = (
            vocab.select("freq", F.explode(pair).alias("pr"))
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            pcnt.orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .localCheckpoint(eager=False)
        )
        merges.append(best)
        vocab = (
            vocab.crossJoin(F.broadcast(best.select("l", "r")))
            .select(
                "word",
                F.replace(
                    F.col("seq"),
                    F.concat(F.lit("|"), "l", F.lit("||"), "r", F.lit("|")),
                    F.concat(F.lit("|"), "l", "r", F.lit("|")),
                ).alias("seq"),
                "freq",
            )
            .localCheckpoint(eager=False)
        )
    return vocab, merges


@_register("bpe_merge_iterations", _bpe_oracle(3))
def bpe_merge_iterations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016), the step upstream of
    every token-counting operator in this catalog: 3 merge iterations over
    the corpus word-frequency dictionary. Each iteration (1) counts
    adjacent symbol pairs weighted by word frequency, (2) takes the argmax
    pair (ties broken lexicographically), (3) merges it everywhere. The
    merge uses sentinel-delimited symbol strings ('|a||b|'), so the greedy
    left-to-right non-overlapping BPE merge rule is EXACTLY string
    replace() in every engine, and the data-dependent pattern rides in as
    a broadcast COLUMN (1-row argmax frame) — no driver-side collect
    anywhere in the loop. Integer counts make the whole merge table
    value-oracle-exact. Scale shape per iteration: one explode+hash-agg
    (shuffle on pair), a LIMIT-1 TakeOrdered, and a broadcast map pass
    over the vocab; the vocab frame is localCheckpointed each round so
    the unrolled plan doesn't recompute round k-1 for every consumer."""
    _, merges = _bpe_learn(spark, sf_dir, n_merges=3)
    merges = [
        m.withColumn("merge_rank", F.lit(rank))
        for rank, m in enumerate(merges, start=1)
    ]
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.select(
        "merge_rank",
        F.col("l").alias("merge_left"),
        F.col("r").alias("merge_right"),
        F.col("cnt").alias("pair_count"),
    ).orderBy("merge_rank")


_CMS_ORACLE = """
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
  FROM documents WHERE text IS NOT NULL
),
truth AS (SELECT t, count(*) AS true_cnt FROM tok GROUP BY t),
lanes AS (SELECT unnest(range(0, 4)) AS j),
cells AS (
  SELECT j,
         CAST('0x' || substr(md5(j || ':' || t), 1, 8) AS BIGINT) % 512 AS bucket,
         count(*) AS cell_cnt
  FROM tok, lanes
  GROUP BY 1, 2
),
top_tokens AS (
  SELECT t, true_cnt FROM truth ORDER BY true_cnt DESC, t LIMIT 20
),
probes AS (
  SELECT tt.t, tt.true_cnt, c.cell_cnt
  FROM top_tokens tt
  JOIN lanes l ON TRUE
  JOIN cells c
    ON c.j = l.j
   AND c.bucket = CAST('0x' || substr(md5(l.j || ':' || tt.t), 1, 8) AS BIGINT) % 512
)
SELECT t AS token,
       true_cnt,
       min(cell_cnt)             AS cms_est,
       min(cell_cnt) >= true_cnt AS never_underestimates
FROM probes
GROUP BY t, true_cnt
ORDER BY true_cnt DESC, token
"""


@_register("countmin_sketch_tokens", _CMS_ORACLE)
def countmin_sketch_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) for heavy-hitter
    token counts — the fixed-memory answer to "frequencies of anything"
    at 100 TB, where an exact token groupBy's key space is unbounded but
    the sketch is 4×512 cells FOREVER, and cells are mergeable across
    partitions/days by plain addition (same algebra as hll_sketch_rollup,
    but for frequencies). Hash lanes are md5-derived, so unlike
    engine-internal sketches the ENTIRE structure is portable and this
    entry carries a full value oracle — estimate values included, not just
    a tolerance flag. The probe side checks the CMS guarantee
    (estimate ≥ truth, one-sided error) for the top-20 true heavy
    hitters. Scale shape: one explode+hash-agg into ≤2048 cells (map-side
    combine collapses almost everything), truth only for the probe set,
    sketch and probes broadcast-sized."""
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.filter(F.col("text").isNotNull())
        .select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("t")
        )
        .localCheckpoint(eager=False)
    )
    bucket_of = lambda j, t: (  # noqa: E731
        F.conv(F.substring(F.md5(F.concat_ws(":", j, t)), 1, 8), 16, 10)
        .cast("long")
        % 512
    )
    lanes = F.explode(F.array([F.lit(j) for j in range(4)])).alias("j")
    cells = (
        tok.select("t", lanes)
        .groupBy("j", bucket_of(F.col("j"), F.col("t")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell_cnt"))
    )
    truth = tok.groupBy("t").agg(F.count(F.lit(1)).alias("true_cnt"))
    top_tokens = truth.orderBy(F.col("true_cnt").desc(), "t").limit(20)
    probes = (
        top_tokens.select("t", "true_cnt", lanes)
        .withColumn("bucket", bucket_of(F.col("j"), F.col("t")))
        .join(F.broadcast(cells), ["j", "bucket"])
    )
    return (
        probes.groupBy(F.col("t").alias("token"), "true_cnt")
        .agg(
            F.min("cell_cnt").alias("cms_est"),
            (F.min("cell_cnt") >= F.first("true_cnt")).alias(
                "never_underestimates"
            ),
        )
        .orderBy(F.col("true_cnt").desc(), "token")
    )


_ANN_RECALL_ORACLE = f"""
WITH brute AS (SELECT query_id, neighbor_id FROM ({_ANN_ORACLE})),
lsh AS (SELECT query_id, neighbor_id FROM ({_lsh_oracle()}))
SELECT b.query_id,
       count(*)                  AS n_brute,
       count(l.neighbor_id)      AS n_hits,
       count(l.neighbor_id) * 20 AS recall_pct
FROM brute b
LEFT JOIN lsh l ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id
"""


@_register("ann_recall_eval", _ANN_RECALL_ORACLE)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality EVALUATION as a query: recall@5 of the
    approximate LSH index against exact brute force, computed inside the
    engine — the eval harness an ANN deployment runs after every index
    build/re-bucket, promoted to a catalog entry so the recall contract
    is itself driver-verified (recall_pct is exact integer arithmetic:
    hits × 20). Both sides are deterministic (fixed planes, rounded-tie
    ranking), so the per-query recall numbers — not just their shape —
    carry a full value oracle. Scale shape: the eval set is a sample
    (|queries| rows), so both topk passes and the hit-join stay
    eval-set-bounded no matter the corpus size."""
    from nyc_taxi_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    lsh = lsh_topk(emb, queries, k=5, n_planes=4).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        brute.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_brute"),
            F.count("hit").alias("n_hits"),
            (F.count("hit") * 20).alias("recall_pct"),
        )
        .orderBy("query_id")
    )


_BPE_ENCODE_ORACLE = _bpe_cte_prefix(3) + """,
wmap AS (
  SELECT word,
         len(string_split(trim(seq, '|'), '||')) AS n_sym
  FROM v3
),
docw AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents WHERE text IS NOT NULL
)
SELECT d.doc_id,
       count(*)                           AS n_words,
       sum(w.n_sym)                       AS n_bpe_tokens,
       min(w.n_sym)                       AS min_word_tokens
FROM docw d JOIN wmap w ON w.word = d.word
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


@_register("bpe_encode_documents", _BPE_ENCODE_ORACLE)
def bpe_encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the other half of bpe_merge_iterations:
    encode every document with the 3 learned merges and report per-doc
    BPE token counts (the number a trainer actually budgets by, vs the
    whitespace/regex proxies in text_stats_documents). The scale-critical
    trick: encoding is a pure function of the WORD, so the merges apply
    once per DISTINCT vocabulary word (bounded), not once per corpus
    token occurrence — the encoded-word map then broadcasts onto the
    corpus stream, making document encoding a broadcast-join map pass
    with zero extra shuffles of the corpus. Shares _bpe_learn (and its
    no-driver-collect merge loop) with the training entry."""
    vocab, _ = _bpe_learn(spark, sf_dir, n_merges=3)
    wmap = vocab.select(
        "word",
        F.size(F.split(F.btrim(F.col("seq"), F.lit("|")), r"\|\|")).alias(
            "n_sym"
        ),
    )
    d = _t(spark, sf_dir, "documents")
    docw = d.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    return (
        docw.join(F.broadcast(wmap), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
            F.min("n_sym").alias("min_word_tokens"),
        )
        .orderBy("doc_id")
    )


_FERTILITY_ORACLE = _bpe_cte_prefix(3) + """,
wmap AS (
  SELECT word,
         len(string_split(trim(seq, '|'), '||')) AS n_sym
  FROM v3
),
docw AS (
  SELECT lang,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents WHERE text IS NOT NULL
)
SELECT d.lang,
       count(*)                                     AS n_words,
       CAST(sum(w.n_sym) AS BIGINT)                 AS n_bpe_tokens,
       (1000000 * CAST(sum(w.n_sym) AS BIGINT)) // count(*)
                                                    AS fertility_ppm
FROM docw d JOIN wmap w ON w.word = d.word
GROUP BY d.lang
ORDER BY d.lang
"""


@_register("tokenizer_fertility_eval", _FERTILITY_ORACLE)
def tokenizer_fertility_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY evaluation — BPE tokens emitted per word, by
    language: THE standard tokenizer-quality metric (a tokenizer trained
    on English-heavy data fragments other languages into more symbols,
    inflating their effective sequence length and training cost — the
    multilingual-fairness number every tokenizer paper reports). Reuses
    the trained merges from bpe_merge_iterations via the same
    encoded-word map: fertility is Σ symbols / Σ words in exact ppm, so
    the whole eval — training included — carries a full value oracle.
    Scale shape identical to bpe_encode_documents: bounded vocabulary
    map broadcast onto the corpus word stream, one rollup on lang."""
    vocab, _ = _bpe_learn(spark, sf_dir, n_merges=3)
    wmap = vocab.select(
        "word",
        F.size(F.split(F.btrim(F.col("seq"), F.lit("|")), r"\|\|")).alias(
            "n_sym"
        ),
    )
    d = _t(spark, sf_dir, "documents")
    docw = d.filter(F.col("text").isNotNull()).select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    return (
        docw.join(F.broadcast(wmap), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
            F.expr("(1000000 * CAST(sum(n_sym) AS BIGINT)) div count(*)").alias(
                "fertility_ppm"
            ),
        )
        .orderBy("lang")
    )


_INCR_ROLLUP_ORACLE = """
WITH full_agg AS (
  SELECT event_type,
         count(*) AS n_events,
         sum(CAST(value AS DECIMAL(38,6))) AS total_dec
  FROM events
  GROUP BY event_type
)
SELECT event_type,
       n_events,
       round(CAST(total_dec AS DOUBLE), 2)                     AS total_value,
       round(CAST(total_dec AS DOUBLE) / n_events, 4)          AS avg_value,
       TRUE                                                    AS merge_matches_full
FROM full_agg
ORDER BY event_type
"""


@_register("incremental_rollup_merge", _INCR_ROLLUP_ORACLE)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-aggregate MERGEABILITY, the algebra every incremental /
    streaming / cube pipeline rests on at 100 TB: yesterday's rollup plus
    today's delta must equal a full recompute, without rescanning
    yesterday. The entry splits events at a cutoff (day 20), aggregates
    each side to (count, decimal sum) partials, merges the partials by
    addition, and derives the non-mergeable measure (avg) from merged
    components — then VERIFIES in-query that the merged result equals the
    direct full aggregation on exact decimals (merge_matches_full). The
    oracle computes only the direct form plus literal TRUE, so a
    mergeability violation fails the value hash. Decimal sums make the
    equality exact (float partials would differ by summation order —
    precisely the bug this algebra exists to avoid)."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("decimal(38,6)").alias("v"),
        (F.dayofmonth("ts") <= 20).alias("is_base"),
    )

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )

    base = partial(e.filter(F.col("is_base")))
    delta = partial(e.filter(~F.col("is_base")))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n_events"), F.sum("s").alias("total_dec"))
    )
    direct = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d_n"), F.sum("v").alias("d_s")
    )
    return (
        merged.join(direct, "event_type")
        .select(
            "event_type",
            "n_events",
            F.round(F.col("total_dec").cast("double"), 2).alias("total_value"),
            F.round(
                F.col("total_dec").cast("double") / F.col("n_events"), 4
            ).alias("avg_value"),
            (
                (F.col("n_events") == F.col("d_n"))
                & (F.col("total_dec") == F.col("d_s"))
            ).alias("merge_matches_full"),
        )
        .orderBy("event_type")
    )


_QUALITY_ENSEMBLE_ORACLE = f"""
WITH lm AS (SELECT doc_id, score_ppm FROM ({_CHARLM_ORACLE})),
rep AS (
  SELECT doc_id,
         len(t) - 1 AS total,
         len(list_distinct([ t[i] || ' ' || t[i+1]
                             for i in range(1, len(t)) ])) AS dis
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents WHERE text IS NOT NULL)
),
gates AS (
  SELECT d.source,
         (d.n_chars >= 50 AND d.n_chars <= 5000)            AS len_ok,
         (r.total IS NULL OR r.total < 1
          OR (r.total - r.dis) * 10 <= r.total)             AS rep_ok,
         coalesce(l.score_ppm >= 5700, FALSE)               AS lm_ok
  FROM documents d
  LEFT JOIN rep r USING (doc_id)
  LEFT JOIN lm l USING (doc_id)
  WHERE d.text IS NOT NULL
)
SELECT source,
       count(*)                                             AS n_docs,
       sum(CASE WHEN NOT len_ok THEN 1 ELSE 0 END)          AS n_fail_len,
       sum(CASE WHEN NOT rep_ok THEN 1 ELSE 0 END)          AS n_fail_rep,
       sum(CASE WHEN NOT lm_ok THEN 1 ELSE 0 END)           AS n_fail_lm,
       sum(CASE WHEN len_ok AND rep_ok AND lm_ok
                THEN 1 ELSE 0 END)                          AS n_pass,
       (sum(CASE WHEN len_ok AND rep_ok AND lm_ok
                 THEN 1 ELSE 0 END) * 100) // count(*)      AS retention_pct
FROM gates
GROUP BY source
ORDER BY source
"""


@_register("quality_gate_ensemble", _QUALITY_ENSEMBLE_ORACLE)
def quality_gate_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-based quality GATE ensemble a curation pipeline runs
    before training (the reason-coded funnel report data teams actually
    read): three independent signals — length bounds, Gopher-style
    duplicate-bigram repetition (>10%), and the char-LM corpus-frequency
    score (ppm < 5700, reusing charlm_freq_score's pipeline) — each
    failure counted per source, plus the all-gates retention rate. Every
    gate compares in exact integer arithmetic, so unlike real fastText /
    KenLM ensembles the whole report is value-oracle-checked. Scale
    shape: the two heavier signals are one corpus pass each (bounded
    broadcast model for the LM, per-row array ops for repetition); the
    funnel itself is a single hash aggregate on source."""
    lm = charlm_freq_score(spark, sf_dir).select("doc_id", "score_ppm")
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    total = F.size(t) - 1
    n_pairs = F.greatest(total, F.lit(0))
    bigr = F.zip_with(
        F.slice(t, 1, n_pairs),
        F.slice(t, 2, n_pairs),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    rep = d.select(
        "doc_id",
        total.alias("total"),
        F.size(F.array_distinct(bigr)).alias("dis"),
    )
    gates = (
        d.select("doc_id", "source", "n_chars")
        .join(rep, "doc_id", "left")
        .join(lm, "doc_id", "left")
        .select(
            "source",
            ((F.col("n_chars") >= 50) & (F.col("n_chars") <= 5000)).alias(
                "len_ok"
            ),
            (
                F.col("total").isNull()
                | (F.col("total") < 1)
                | ((F.col("total") - F.col("dis")) * 10 <= F.col("total"))
            ).alias("rep_ok"),
            F.coalesce(F.col("score_ppm") >= 5700, F.lit(False)).alias("lm_ok"),
        )
    )
    passed = F.col("len_ok") & F.col("rep_ok") & F.col("lm_ok")
    return (
        gates.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((~F.col("len_ok")).cast("long")).alias("n_fail_len"),
            F.sum((~F.col("rep_ok")).cast("long")).alias("n_fail_rep"),
            F.sum((~F.col("lm_ok")).cast("long")).alias("n_fail_lm"),
            F.sum(passed.cast("long")).alias("n_pass"),
            F.expr(
                "(sum(CASE WHEN len_ok AND rep_ok AND lm_ok THEN 1 ELSE 0 END)"
                " * 100) div count(*)"
            ).alias("retention_pct"),
        )
        .orderBy("source")
    )


_SQL_SCRIPTING_ORACLE = """
WITH ks AS (SELECT unnest(range(0, 20)) AS i),
c AS (SELECT i, 20000 * (CAST(1 AS BIGINT) << i) AS thr FROM ks),
counted AS (
  SELECT i, thr,
         (SELECT count(*) FROM orders o WHERE o.o_totalprice > c.thr) AS n_above
  FROM c
)
SELECT thr AS threshold, n_above
FROM counted WHERE n_above < 100
ORDER BY i LIMIT 1
"""


@_register("sql_scripting_adaptive_threshold", _SQL_SCRIPTING_ORACLE)
def sql_scripting_adaptive_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING surface (Spark 4 compound statements): a BEGIN…END
    block with DECLAREd state and a WHILE loop whose condition is itself
    a query — the procedural-SQL layer the reference delegates to
    Airflow-orchestrated Python (dags/elt_pipeline_optimized_dag.py runs
    this kind of find-the-threshold scan imperatively). The loop doubles
    a price threshold until fewer than 100 orders exceed it — the
    adaptive-cutoff search every ops runbook has — entirely inside the
    engine: no driver round-trips besides the final result, and each
    iteration's count is one pushed-down scan-aggregate. The oracle
    re-derives the fixpoint declaratively (smallest 20000·2^k with
    count < 100), so the imperative and declarative forms must agree
    exactly."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_scr_orders")
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE thr BIGINT DEFAULT 20000;
              WHILE (SELECT count(*) FROM v_scr_orders
                     WHERE o_totalprice > thr) >= 100 DO
                SET thr = thr * 2;
              END WHILE;
              SELECT thr AS threshold,
                     (SELECT count(*) FROM v_scr_orders
                      WHERE o_totalprice > thr) AS n_above;
            END
            """
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.scripting.enabled", prev)


_OFFSET_LOG_WINDOW_ORACLE = """
WITH parts AS (SELECT unnest(range(0, 4)) AS p),
offs  AS (SELECT unnest(range(0, 150)) AS o),
recs AS (
  SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (o // 60) HOUR AS window_start,
         CAST((p * 31 + o * 17) % 1000 AS BIGINT)                  AS amount_cents
  FROM parts, offs
)
SELECT window_start,
       count(*)          AS n_events,
       sum(amount_cents) AS total_cents
FROM recs
GROUP BY window_start
ORDER BY window_start
"""


@_register("streaming_offset_log_windowed", _OFFSET_LOG_WINDOW_ORACLE)
def streaming_offset_log_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical Kafka pipeline shape — partitioned-log source →
    event-time watermark → tumbling window aggregation — run end-to-end
    over the engine's own offset_log source: event time rides IN the
    record (like a Kafka message timestamp), arrives out of order across
    topic-partitions within each paced micro-batch, and the 1-hour
    windows still land exactly because event-time windowing keys on the
    data, not arrival. The watermark bounds window state exactly as it
    would against a real broker. Record stream is seeded integer
    arithmetic (offset → minute), so the drained windows carry a full
    value oracle."""
    import uuid

    from nyc_taxi_data_pipeline_spark.sources.pydatasource import (
        register_offset_log,
    )
    from nyc_taxi_data_pipeline_spark.streaming.sinks import run_stream_to_memory

    register_offset_log(spark)
    stream = (
        spark.readStream.format("offset_log")
        .option("partitions", 4)
        .option("n_rows", 150)
        .option("rows_per_batch", 50)
        .load()
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("amount_cents").alias("total_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_cents")
    )
    sink = run_stream_to_memory(agg, f"olw_{uuid.uuid4().hex[:8]}")
    return sink.orderBy("window_start")


_CORRUPT_AUDIT_ORACLE = """
WITH classified AS (
  SELECT CASE WHEN event_id % 10 = 0 THEN NULL ELSE event_type END AS event_type,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE CAST(value AS DECIMAL(38,6)) END               AS v,
         (event_id % 10 = 0)                                      AS is_corrupt
  FROM events
)
SELECT event_type,
       count(*)                                     AS n_rows,
       sum(CASE WHEN is_corrupt THEN 1 ELSE 0 END)  AS n_corrupt,
       round(CAST(coalesce(sum(v), 0) AS DOUBLE), 2) AS total_value
FROM classified
GROUP BY event_type
ORDER BY event_type NULLS FIRST
"""


@_register("json_corrupt_records_audit", _CORRUPT_AUDIT_ORACLE)
def json_corrupt_records_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record accounting on the BATCH path (the streaming
    PERMISSIVE/FAILFAST contract's batch sibling): events are serialized
    to JSON envelopes, a deterministic tenth of them truncated mid-string
    (the partial-write/split-record corruption object stores actually
    produce), then parsed with from_json in PERMISSIVE mode with a
    columnNameOfCorruptRecord — bad payloads yield NULL fields plus the
    raw record in the corrupt column instead of failing the job, and the
    audit rolls up row/corrupt counts per parsed type. The oracle knows
    exactly which rows were corrupted by construction, so the value hash
    verifies the PARSER classified every record correctly — a dropped or
    wrongly-parsed record shifts a bucket. At 100 TB this is the
    dead-letter accounting pass every ingest edge runs; one scan, one
    hash aggregate."""
    e = _t(spark, sf_dir, "events")
    payload = F.to_json(F.struct("event_type", "value"))
    corrupted = F.when(
        F.col("event_id") % 10 == 0,
        F.substring(payload, 1, F.length(payload) - 5),
    ).otherwise(payload)
    parsed = e.select(
        F.from_json(
            corrupted,
            "event_type string, value double, _corrupt_record string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("rec")
    )
    return (
        parsed.groupBy(F.col("rec.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.col("rec._corrupt_record").isNotNull().cast("long")
            ).alias("n_corrupt"),
            F.round(
                F.coalesce(
                    F.sum(F.col("rec.value").cast("decimal(38,6)")), F.lit(0)
                ).cast("double"),
                2,
            ).alias("total_value"),
        )
        .orderBy(F.col("event_type").asc_nulls_first())
    )


_CURRICULUM_ORACLE = """
WITH tiers AS (
  SELECT doc_id,
         CASE WHEN n_chars < 150 THEN 0
              WHEN n_chars < 250 THEN 1
              WHEN n_chars < 350 THEN 2
              ELSE 3 END AS tier,
         md5(CAST(doc_id AS VARCHAR)) AS lane
  FROM documents
),
ranked AS (
  SELECT tier,
         row_number() OVER (PARTITION BY tier ORDER BY lane, doc_id) AS r
  FROM tiers
),
sizes AS (SELECT tier, count(*) AS n FROM tiers GROUP BY tier),
offsets AS (
  SELECT tier, n,
         coalesce(sum(n) OVER (ORDER BY tier
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS off
  FROM sizes
),
pos AS (
  SELECT r.tier, o.off + r.r AS position
  FROM ranked r JOIN offsets o ON o.tier = r.tier
)
SELECT tier,
       count(*)                               AS n_docs,
       min(position)                          AS first_pos,
       max(position)                          AS last_pos,
       (max(position) - min(position) + 1 = count(*)) AS contiguous
FROM pos
GROUP BY tier
ORDER BY tier
"""


@_register("curriculum_order_positions", _CURRICULUM_ORACLE)
def curriculum_order_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering for training: every document gets a
    deterministic GLOBAL position — easy tiers first, pseudo-random (md5
    lane) order within a tier — without the global sort that would
    serialize 100 TB through one task. The trick (same as sequence
    packing's shard offsets): rank within each tier in parallel, then add
    per-tier offsets from a tiny cumulative-sum frame; the result is
    provably a permutation, which the entry verifies in-query (per-tier
    position ranges must be contiguous and sized exactly n). Scale shape:
    one shuffle on tier for the rank, a ≤4-row window for offsets, a
    broadcast join to combine."""
    d = _t(spark, sf_dir, "documents")
    tiers = d.select(
        "doc_id",
        F.when(F.col("n_chars") < 150, 0)
        .when(F.col("n_chars") < 250, 1)
        .when(F.col("n_chars") < 350, 2)
        .otherwise(3)
        .alias("tier"),
        F.md5(F.col("doc_id").cast("string")).alias("lane"),
    )
    ranked = tiers.select(
        "tier",
        F.row_number()
        .over(W.partitionBy("tier").orderBy("lane", "doc_id"))
        .alias("r"),
    )
    sizes = tiers.groupBy("tier").agg(F.count(F.lit(1)).alias("n"))
    offsets = sizes.select(
        "tier",
        F.coalesce(
            F.sum("n").over(
                W.orderBy("tier").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )
    pos = ranked.join(F.broadcast(offsets), "tier").select(
        "tier", (F.col("off") + F.col("r")).alias("position")
    )
    return (
        pos.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("position").alias("first_pos"),
            F.max("position").alias("last_pos"),
            (
                F.max("position") - F.min("position") + 1 == F.count(F.lit(1))
            ).alias("contiguous"),
        )
        .orderBy("tier")
    )


_HINTS_ORACLE = """
SELECT n.n_name,
       count(*)  AS n_suppliers,
       round(CAST(sum(CAST(s.s_acctbal AS DECIMAL(38,6))) AS DOUBLE), 2)
         AS total_balance
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@_register("join_strategy_hints", _HINTS_ORACLE)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy CONTROL surface: the same logical join executed under
    three explicit strategy hints — BROADCAST, SHUFFLE_MERGE, and
    SHUFFLE_HASH — then unioned and re-aggregated; identical results
    under every physical strategy is the correctness half (the three
    branches must agree exactly, or the divided-back-out aggregate drifts
    off the single-join oracle and the value hash fails), and
    tests/test_plans.py asserts each hint actually produced its operator
    (BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin). Hints matter at 100 TB when the
    optimizer's size estimates are wrong — a misestimated 10 GB build
    side picked for broadcast is an OOM; these are the manual overrides.
    The entry divides the tripled counts back out, so the output equals
    the plain single-join aggregate and shares its oracle."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")

    def agg_with(hint: str) -> DataFrame:
        return (
            s.join(n.hint(hint), s["s_nationkey"] == n["n_nationkey"])
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.sum(F.col("s_acctbal").cast("decimal(38,6)")).alias("b"),
            )
        )

    branches = (
        agg_with("broadcast")
        .unionByName(agg_with("shuffle_merge"))
        .unionByName(agg_with("shuffle_hash"))
    )
    return (
        branches.groupBy("n_name")
        .agg(
            (F.sum("c") / 3).cast("long").alias("n_suppliers"),
            F.round((F.sum("b") / 3).cast("double"), 2).alias("total_balance"),
        )
        .orderBy("n_name")
    )


_TRIANGLE_ORACLE = """
WITH cos AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS w
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
),
e AS (
  SELECT s1 AS a, s2 AS b FROM cos
  WHERE w >= 2 AND (s1 * 31 + s2 * 17) % 20 = 0
),
wedges AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e e1 JOIN e e2 ON e2.a = e1.b
),
tri AS (
  SELECT w.a, w.b, w.c
  FROM wedges w JOIN e ON e.a = w.a AND e.b = w.c
)
SELECT (SELECT count(*) FROM e)      AS n_edges,
       (SELECT count(*) FROM wedges) AS n_wedges,
       (SELECT count(*) FROM tri)    AS n_triangles,
       (SELECT CASE WHEN count(*) = 0 THEN 0
               ELSE (3 * (SELECT count(*) FROM tri) * 1000000) // count(*)
               END
        FROM wedges)                 AS closure_ppm
"""


@_register("triangle_count_oriented", _TRIANGLE_ORACLE)
def triangle_count_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting by edge ORIENTATION (the algorithm behind
    clustering-coefficient / community metrics on co-occurrence graphs):
    orient every edge low→high so each triangle {x<y<z} is counted
    exactly once as the closed wedge (x,y),(y,z),(x,z) — two equi-joins,
    no cycle-symmetric triple join. Graph: suppliers co-supplying an
    order (weight ≥ 2, then deterministically hash-thinned to keep the
    toy-scale entry bounded — the co-supply projection is near-complete
    at small SF; production would skip the thinning and instead orient by
    DEGREE, which bounds every node's out-degree near sqrt(|E|) and is
    the standard skew fix for power-law graphs; the join pattern is
    identical). closure_ppm = 3·triangles/wedges in exact integer ppm —
    the global clustering coefficient. Scale shape: two shuffle joins on
    single keys plus count aggregates; the wedge frame is the watershed
    and degree orientation is precisely what keeps it subquadratic."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a, b = li.alias("x"), li.alias("y")
    cos = (
        a.join(
            b,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("s1"), F.col("y.l_suppkey").alias("s2")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    e = (
        cos.filter(
            (F.col("w") >= 2)
            & ((F.col("s1") * 31 + F.col("s2") * 17) % 20 == 0)
        )
        .select(F.col("s1").alias("a"), F.col("s2").alias("b"))
        .localCheckpoint(eager=False)
    )
    e2 = e.select(F.col("a").alias("m"), F.col("b").alias("c"))
    wedges = e.join(e2, e["b"] == e2["m"]).select("a", "b", "c").localCheckpoint(
        eager=False
    )
    e3 = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = wedges.join(
        e3, (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc"))
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("v")).select("v")
    n_wedges = wedges.agg(F.count(F.lit(1)).alias("v")).select("v")
    n_tri = tri.agg(F.count(F.lit(1)).alias("v")).select("v")
    return (
        n_edges.select(F.col("v").alias("n_edges"))
        .crossJoin(n_wedges.select(F.col("v").alias("n_wedges")))
        .crossJoin(n_tri.select(F.col("v").alias("n_triangles")))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(F.col("n_wedges") == 0, F.lit(0))
            .otherwise(
                F.expr("(3 * n_triangles * 1000000) div n_wedges")
            )
            .alias("closure_ppm"),
        )
    )


_BIGRAM_LM_ORACLE = """
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '[a-z]+') AS t
  FROM documents WHERE text IS NOT NULL
),
bi AS (
  SELECT pr['c'] AS cur, pr['n'] AS nxt FROM (
    SELECT unnest([ {'c': t[i], 'n': t[i+1]} for i in range(1, len(t)) ]) AS pr
    FROM toks
  )
),
cnt AS (SELECT cur, nxt, count(*) AS c FROM bi GROUP BY 1, 2),
tot AS (SELECT cur, sum(c) AS n_obs FROM cnt GROUP BY 1),
best AS (
  SELECT cur, nxt, c,
         row_number() OVER (PARTITION BY cur ORDER BY c DESC, nxt) AS rn
  FROM cnt
)
SELECT b.cur                          AS cur_token,
       t.n_obs,
       b.nxt                          AS next_token,
       b.c                            AS next_cnt,
       (b.c * 1000000) // t.n_obs     AS p_ppm
FROM best b JOIN tot t ON t.cur = b.cur
WHERE b.rn = 1
ORDER BY t.n_obs DESC, cur_token
LIMIT 20
"""


@_register("bigram_next_word_model", _BIGRAM_LM_ORACLE)
def bigram_next_word_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language model estimation — the n-gram LM table (Markov over
    TOKENS; event_transition_matrix is the same algebra over event types)
    that underlies classic perplexity filters and autocomplete: count
    (current, next) token transitions corpus-wide, keep each token's
    argmax continuation with its probability in exact integer ppm, report
    the 20 best-attested contexts. Transitions come from the zip-shifted
    token array (one explode, no positional self-join); counting is two
    hash aggregates sharing the bigram shuffle; the argmax is a window
    over (cur) — all JVM-side, fully value-oracle-checked."""
    d = _t(spark, sf_dir, "documents")
    t = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    n_pairs = F.greatest(F.size(t) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(t, 1, n_pairs),
        F.slice(t, 2, n_pairs),
        lambda c, n: F.struct(c.alias("cur"), n.alias("nxt")),
    )
    bi = d.filter(F.col("text").isNotNull()).select(
        F.explode(pairs).alias("pr")
    ).select("pr.cur", "pr.nxt")
    cnt = bi.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    cnt = cnt.localCheckpoint(eager=False)
    tot = cnt.groupBy("cur").agg(F.sum("c").alias("n_obs"))
    w = W.partitionBy("cur").orderBy(F.col("c").desc(), "nxt")
    best = cnt.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(tot, "cur")
        .select(
            F.col("cur").alias("cur_token"),
            "n_obs",
            F.col("nxt").alias("next_token"),
            F.col("c").alias("next_cnt"),
            F.expr("(c * 1000000) div n_obs").alias("p_ppm"),
        )
        .orderBy(F.col("n_obs").desc(), "cur_token")
        .limit(20)
    )


_IDENTIFIER_ORACLE = """
SELECT o_orderpriority AS group_key,
       count(*) AS n_rows,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2)
         AS total_measure
FROM orders
GROUP BY o_orderpriority
ORDER BY group_key
"""


@_register("identifier_parameterized_query", _IDENTIFIER_ORACLE)
def identifier_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized IDENTIFIERS (Spark 4's IDENTIFIER() clause +
    spark.sql named args): table and column names arrive as bound
    PARAMETERS, not string concatenation — the injection-safe form of
    the dynamic SQL the reference's DAG builds by f-string
    (dags/elt_pipeline_optimized_dag.py templates table names straight
    into query text). Same Catalyst plan as the static query, so the
    static oracle checks it; the surface under test is the binding."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_idp_orders")
    return spark.sql(
        """
        SELECT IDENTIFIER(:keycol) AS group_key,
               count(*) AS n_rows,
               round(CAST(sum(CAST(IDENTIFIER(:valcol) AS DECIMAL(38,6)))
                          AS DOUBLE), 2) AS total_measure
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:keycol)
        ORDER BY group_key
        """,
        args={
            "tbl": "v_idp_orders",
            "keycol": "o_orderpriority",
            "valcol": "o_totalprice",
        },
    )


_PPM_DECODE_ORACLE = """
WITH media AS (SELECT doc_id AS media_id FROM documents),
px AS (
  SELECT m.media_id, b, (m.media_id * 7 + b * 13) % 256 AS val
  FROM media m, (SELECT unnest(range(0, 144)) AS b)
  WHERE m.media_id % 25 <> 0
),
sums AS (
  SELECT media_id,
         sum(CASE WHEN b % 3 = 0 THEN val END) AS sum_r,
         sum(CASE WHEN b % 3 = 1 THEN val END) AS sum_g,
         sum(CASE WHEN b % 3 = 2 THEN val END) AS sum_b
  FROM px GROUP BY media_id
)
SELECT m.media_id,
       CASE WHEN m.media_id % 25 = 0 THEN NULL ELSE 8 END AS width,
       CASE WHEN m.media_id % 25 = 0 THEN NULL ELSE 6 END AS height,
       s.sum_r, s.sum_g, s.sum_b,
       (m.media_id % 25 <> 0) AS decoded
FROM media m LEFT JOIN sums s ON s.media_id = m.media_id
ORDER BY m.media_id
"""


@_register("multimodal_ppm_decode", _PPM_DECODE_ORACLE)
def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end — the honest upgrade over the
    multimodal_decode_features stub: PPM P6 containers (magic + dims +
    maxval header, raw RGB24 block) are BUILT JVM-side per media id (hex
    lanes: transform/lpad(hex(..)) over a byte-index sequence, unhex to
    binary — payload synthesis never touches Python), every 25th payload
    truncated to exercise the malformed-record path, then decoded by an
    actual numpy container parser in one mapInPandas pass
    (operators/multimodal.decode_ppm_features). Features are exact
    integer channel sums, so the whole decode — header parse, channel
    de-interleave, dead-lettered nulls — is value-oracle-checked. At
    100 TB the shape is unchanged: payloads stay binary in parquet and
    cross to Python one Arrow batch at a time."""
    from nyc_taxi_data_pipeline_spark.operators.multimodal import (
        decode_ppm_features,
    )

    d = _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("media_id"))
    pixhex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(143)),
            lambda b: F.lpad(
                F.hex((F.col("media_id") * 7 + b * 13) % 256), 2, "0"
            ),
        ),
        "",
    )
    full = F.concat(
        F.lit("P6\n8 6\n255\n").cast("binary"), F.unhex(pixhex)
    )
    payload = F.when(
        F.col("media_id") % 25 == 0, F.substring(full, 1, 10)
    ).otherwise(full)
    media = d.select("media_id", payload.alias("payload"))
    return (
        decode_ppm_features(media)
        .withColumn("decoded", F.col("width").isNotNull())
        .orderBy("media_id")
    )


def _wav_header_hex(rate: int = 8000, n_frames: int = 64) -> str:
    """Constant RIFF/WAV PCM16-mono header as a hex string (little-endian
    fields), computed at plan-build time — deterministic, not
    data-dependent."""
    import struct

    data_size = n_frames * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", data_size)
    )
    return hdr.hex().upper()


_WAV_DECODE_ORACLE = """
WITH media AS (SELECT doc_id AS media_id FROM documents),
samp AS (
  SELECT m.media_id, ((m.media_id * 31 + t * 17) % 2048) - 1024 AS v
  FROM media m, (SELECT unnest(range(0, 64)) AS t)
)
SELECT media_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(64 AS BIGINT) AS n_samples,
       CAST(8 AS BIGINT) AS duration_ms,
       sum(v * v) AS energy
FROM samp
GROUP BY media_id
ORDER BY media_id
"""


@_register("multimodal_wav_decode", _WAV_DECODE_ORACLE)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: RIFF/WAV PCM16-mono containers built
    JVM-side (constant RIFF header hex + little-endian sample lanes from
    an integer recipe, unhex to binary) and decoded by the stdlib `wave`
    chunk parser + numpy in one mapInPandas pass
    (operators/multimodal.decode_wav_features) — proving the multimodal
    plumbing carries an actual codec, not just the stub's byte folds.
    Features are audio-curation primitives: sample rate, frame count,
    duration, and exact integer signal energy Σv² (what silence and
    clipping screens threshold on). Fully value-oracle-checked since the
    signal is an integer recipe."""
    from nyc_taxi_data_pipeline_spark.operators.multimodal import (
        decode_wav_features,
    )

    d = _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("media_id"))
    u16 = lambda v: (v + 65536) % 65536  # noqa: E731
    sample_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda t: F.concat(
                F.substring(
                    F.lpad(
                        F.hex(u16(((F.col("media_id") * 31 + t * 17) % 2048) - 1024)),
                        4,
                        "0",
                    ),
                    3,
                    2,
                ),
                F.substring(
                    F.lpad(
                        F.hex(u16(((F.col("media_id") * 31 + t * 17) % 2048) - 1024)),
                        4,
                        "0",
                    ),
                    1,
                    2,
                ),
            ),
        ),
        "",
    )
    payload = F.unhex(F.concat(F.lit(_wav_header_hex()), sample_hex))
    media = d.select("media_id", payload.alias("payload"))
    return decode_wav_features(media).orderBy("media_id")


_OBSERVE_ORACLE = """
SELECT count(*)                                        AS n_rows,
       sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS n_big,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2)
         AS total_price
FROM orders
"""


@_register("observed_metrics_audit", _OBSERVE_ORACLE)
def observed_metrics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline OBSERVABILITY surface (df.observe + Observation): metrics
    ride on the frame and are computed BY THE ACTION ITSELF — one pass,
    no second audit scan of the input, which at 100 TB is the difference
    between monitored and double-cost pipelines (the reference logs
    row counts by re-counting, scripts/transform_data.py). The observed
    aggregates are deterministic, so re-emitting them as the entry's
    result frame gives them a full value oracle: if observe() dropped or
    miscounted anything the hash fails. The deliberate driver-side step
    (Observation.get after the action) is the API's contract — metrics
    are a handful of scalars, never data."""
    from pyspark.sql import Observation

    o = _t(spark, sf_dir, "orders")
    obs = Observation("audit")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("o_totalprice") > 300000).cast("long")).alias("n_big"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"), 2
        ).alias("total_price"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_big"], m["total_price"])],
        "n_rows bigint, n_big bigint, total_price double",
    )


_TRY_ARITH_ORACLE = """
WITH rows_in AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 1000) AS BIGINT) AS pm
  FROM lineitem WHERE l_orderkey < 100
)
SELECT l_orderkey, l_linenumber,
       CASE WHEN qty = 0 THEN NULL
            ELSE CAST((20 * pm + qty) // (2 * qty) AS DOUBLE) / 10000.0
       END                                                    AS unit_price,
       CASE WHEN l_linenumber = 1 OR qty = 0 THEN NULL
            ELSE pm END                                       AS guarded_price_mills,
       TRY_CAST('not a number' AS DOUBLE)                     AS bad_number,
       CASE WHEN qty - 3 BETWEEN 1 AND 7
            THEN CAST(qty - 3 AS VARCHAR) ELSE NULL END       AS elem_at,
       9223372036854775807 + CASE WHEN qty > 100 THEN 1 ELSE 0 END
                                                              AS near_overflow
FROM rows_in
ORDER BY l_orderkey, l_linenumber
"""


@_register("try_arithmetic_matrix", _TRY_ARITH_ORACLE)
def try_arithmetic_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode SAFETY surface: this engine runs with ANSI semantics ON
    (strict casts, failing overflow — the correctness-first default), so
    the try_* family is the per-expression escape hatch a pipeline uses
    where nulls-on-error beat job failure: try_divide (÷0 → null,
    exercised with a denominator that REALLY hits zero on every first
    line), try_cast (bad parse → null), try_element_at (out-of-bounds →
    null), try_add at the int64 edge (overflow → null — the oracle
    proves no row actually overflows, so the value is always the exact
    sum). The oracle expresses each as its explicit CASE equivalent;
    matching hashes prove the try_* forms implement exactly those
    semantics. unit_price rounds IN INTEGER ARITHMETIC ((2a+b) intdiv
    (2b) over exact price-mills) before one cast to double — round()
    over the raw double quotient ties at terminating decimals (3-dp
    price ÷ 4 ends in ...5) and the engines break the tie differently
    (found by the sf0.1 parity sweep)."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.col("l_quantity").cast("bigint").alias("qty"),
            F.expr("CAST(round(l_extendedprice * 1000) AS BIGINT)").alias("pm"),
        )
    )
    arr = F.array([F.lit(str(i)).cast("string") for i in range(1, 8)])
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.col("qty") == 0, F.lit(None).cast("double")
        ).otherwise(
            F.expr("CAST((20 * pm + qty) div (2 * qty) AS DOUBLE)")
            / F.lit(10000.0)
        ).alias("unit_price"),
        F.when(
            F.try_divide(
                F.col("l_extendedprice"),
                F.when(F.col("l_linenumber") == 1, 0).otherwise(F.col("qty")),
            ).isNull(),
            F.lit(None).cast("bigint"),
        )
        .otherwise(F.col("pm"))
        .alias("guarded_price_mills"),
        F.try_to_number(F.lit("not a number"), F.lit("999")).cast(
            "double"
        ).alias("bad_number"),
        # index 0 THROWS even under try_element_at (INVALID_INDEX_OF_ZERO
        # is not an out-of-bounds) and negative indexes count from the
        # end — gate to >= 1 so the surface exercised is the positive
        # out-of-bounds -> null contract
        F.try_element_at(
            arr,
            F.when(F.col("qty") - 3 >= 1, F.col("qty") - 3).cast("int"),
        ).alias("elem_at"),
        F.try_add(
            F.lit(9223372036854775807),
            (F.col("qty") > 100).cast("long"),
        ).alias("near_overflow"),
    ).orderBy("l_orderkey", "l_linenumber")


_FILTER_CLAUSE_ORACLE = """
SELECT o_orderpriority,
       count(*)                                              AS n_all,
       count(*) FILTER (WHERE o_totalprice > 200000)         AS n_big,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                  FILTER (WHERE o_orderdate >= DATE '1995-01-01')
             AS DOUBLE), 2)                                  AS recent_total,
       count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000)
                                                             AS big_customers
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@_register("agg_filter_clause", _FILTER_CLAUSE_ORACLE)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER (WHERE …) aggregate modifiers — the standard-SQL form of
    conditional aggregation (the CASE-WHEN-sum idiom elsewhere in this
    catalog, e.g. q12/q14, written declaratively): several differently-
    filtered aggregates, including a filtered DISTINCT, share ONE scan
    and one hash aggregate. Catalyst plans filtered aggregates with
    per-aggregate predicates inside the same operator, so adding a
    metric never adds a pass — the property that keeps 100 TB audit
    queries single-scan."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_fc_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*)                                      AS n_all,
               count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                          FILTER (WHERE o_orderdate >= DATE '1995-01-01')
                     AS DOUBLE), 2)                          AS recent_total,
               count(DISTINCT o_custkey)
                 FILTER (WHERE o_totalprice > 200000)        AS big_customers
        FROM v_fc_orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


_SKEW_AUDIT_ORACLE = """
WITH per_key AS (
  SELECT l_suppkey, count(*) AS c FROM lineitem GROUP BY l_suppkey
)
SELECT count(*)                                   AS n_keys,
       sum(c)                                     AS total_rows,
       max(c)                                     AS max_key_rows,
       (max(c) * 1000000) // sum(c)               AS top1_share_ppm,
       (max(c) * 1000000 * count(*)) // sum(c)    AS skew_ratio_ppm
FROM per_key
"""


@_register("partition_skew_audit", _SKEW_AUDIT_ORACLE)
def partition_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew DIAGNOSTIC — the measurement that decides between a plain
    shuffle join, AQE skew splitting, and salting (operators/skew.py):
    per-key row counts reduced to the two dimensionless numbers that
    matter — the hottest key's share of all rows and its ratio to the
    mean key (1,000,000 ppm = perfectly uniform). Exact integer
    arithmetic throughout (max·10⁶·n_keys div total), so the audit is
    value-oracle-checked. Scale shape: one hash aggregate on the key,
    then a 1-row rollup — the audit costs one shuffle, which is why it
    runs BEFORE committing a 100 TB join to the wrong strategy."""
    li = _t(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("total_rows"),
        F.max("c").alias("max_key_rows"),
        F.expr("(max(c) * 1000000) div sum(c)").alias("top1_share_ppm"),
        F.expr("(max(c) * 1000000 * count(*)) div sum(c)").alias(
            "skew_ratio_ppm"
        ),
    )


_SPAN_SCREEN_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents WHERE text IS NOT NULL
),
spans AS (
  SELECT doc_id,
         unnest([array_to_string(t[i:i+4], ' ')
                 for i in range(1, len(t) - 3)]) AS s
  FROM toks WHERE len(t) >= 5
),
flagged AS (
  SELECT doc_id,
         (min(doc_id) OVER (PARTITION BY s)
          <> max(doc_id) OVER (PARTITION BY s)) AS cross_doc
  FROM spans
),
per_doc AS (
  SELECT doc_id,
         count(*) AS n_spans,
         CAST(sum(CASE WHEN cross_doc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_spans
  FROM flagged GROUP BY doc_id
)
SELECT doc_id, n_spans, n_dup_spans,
       (1000000 * n_dup_spans) // n_spans           AS dup_ppm,
       (1000000 * n_dup_spans) // n_spans >= 200000 AS flagged_doc
FROM per_doc
ORDER BY doc_id
"""


@_register("repeated_span_screen", _SPAN_SCREEN_ORACLE)
def repeated_span_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring screening (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): a document is flagged
    when a large fraction of its 5-token spans also occur verbatim in a
    DIFFERENT document — the span-level signal that catches boilerplate
    and templated text whole-document dedup misses. The suffix-array of
    the paper is replaced by the shape that distributes: every span
    position is a row, and one window over the span string computes the
    cross-doc indicator as min(doc_id) != max(doc_id) — a single shuffle
    on the span key, no self-join, no distinct-count state. At 100 TB the
    span rows explode ~|tokens| wide but stay narrow (two columns) and
    the window degenerates to a hash-partition scan; the per-doc rollup
    is the only other shuffle. Integer ppm arithmetic end-to-end, so the
    entry carries a full value oracle."""
    d = _t(spark, sf_dir, "documents")
    toks = (
        d.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"),
        )
        .filter(F.size("t") >= 5)
    )
    spans = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("t") - 4)).alias("i"),
        "t",
    ).select("doc_id", F.expr("concat_ws(' ', slice(t, i, 5))").alias("s"))
    w = W.partitionBy("s")
    flagged = spans.select(
        "doc_id",
        (F.min("doc_id").over(w) != F.max("doc_id").over(w)).alias("cross_doc"),
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("cross_doc").cast("long")).alias("n_dup_spans"),
    )
    return per_doc.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        F.expr("(1000000 * n_dup_spans) div n_spans").alias("dup_ppm"),
        (F.expr("(1000000 * n_dup_spans) div n_spans") >= 200000).alias(
            "flagged_doc"
        ),
    ).orderBy("doc_id")


_DSIR_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, lang,
         regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents WHERE text IS NOT NULL
),
feats AS (
  SELECT doc_id, lang,
         unnest([CAST('0x' || substr(md5(array_to_string(t[i:i+1], ' ')), 1, 6)
                      AS BIGINT) % 1024
                 for i in range(1, len(t))]) AS b
  FROM toks WHERE len(t) >= 2
),
tgt AS (SELECT b, count(*) AS ct FROM feats WHERE lang = 'en' GROUP BY b),
raw AS (SELECT b, count(*) AS cr FROM feats GROUP BY b),
model AS (
  SELECT r.b, coalesce(tg.ct, 0) AS ct, r.cr
  FROM raw r LEFT JOIN tgt tg USING (b)
)
SELECT f.doc_id,
       count(*) AS n_features,
       CAST(sum((1000000 * (m.ct + 1)) // (m.cr + 1)) // count(*) AS BIGINT)
         AS score_ppm
FROM feats f JOIN model m USING (b)
GROUP BY f.doc_id
ORDER BY f.doc_id
"""


@_register("dsir_importance_ratio", _DSIR_ORACLE)
def dsir_importance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, hashed n-gram importance
    resampling): score every raw document by how target-like its hashed
    bigram features are, where the target distribution is estimated from
    the in-domain slice (lang = 'en') and the raw distribution from the
    whole corpus. The paper's log-likelihood-ratio sum is replaced by the
    mean per-feature frequency ratio in scaled-integer ppm (add-one
    smoothed) — same ordering signal, but exact bigint arithmetic, so the
    entry carries a full cross-engine value oracle; a production variant
    would keep float log-ratios. Scale shape: features hash into 1024
    buckets, so BOTH models are bounded aggregates that broadcast onto
    the scoring join — the corpus is never shuffled by feature; the
    per-doc rollup shuffles on doc_id once. Portable md5 bucket hash
    (hex-prefix → bigint), identical on both engines."""
    d = _t(spark, sf_dir, "documents")
    toks = (
        d.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "lang",
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"),
        )
        .filter(F.size("t") >= 2)
    )
    feats = toks.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"),
        "t",
    ).select(
        "doc_id",
        "lang",
        F.expr(
            "CAST(conv(substring(md5(concat_ws(' ', slice(t, i, 2))), 1, 6),"
            " 16, 10) AS BIGINT) % 1024"
        ).alias("b"),
    )
    feats = feats.localCheckpoint(eager=False)
    tgt = (
        feats.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    raw = feats.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    model = raw.join(tgt, "b", "left").select(
        "b", F.coalesce("ct", F.lit(0)).alias("ct"), "cr"
    )
    return (
        feats.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.expr(
                "CAST(sum((1000000 * (ct + 1)) div (cr + 1)) div count(*)"
                " AS BIGINT)"
            ).alias("score_ppm"),
        )
        .orderBy("doc_id")
    )


# Shared OLS expression text: interpolated into BOTH the Spark plan and the
# DuckDB oracle so the double-precision expression trees are textually
# identical — every input is an exactly-agreed decimal/bigint sum cast to
# double, and every subsequent op is a single correctly-rounded IEEE op, so
# the rounded outputs hash-match without any float tolerance.
_OLS_SLOPE = "(nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)"
_OLS_R2 = (
    "((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))"
    " / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))"
)

_REGR_ORACLE = f"""
WITH base AS (
  SELECT o_orderpriority,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
         CAST(o_totalprice AS DECIMAL(19,4)) AS y
  FROM orders
),
s AS (
  SELECT o_orderpriority,
         count(*)   AS n,
         sum(x)     AS sx,
         sum(x * x) AS sxx,
         sum(y)     AS sy,
         sum(x * y) AS sxy,
         sum(y * y) AS syy
  FROM base GROUP BY o_orderpriority
),
d AS (
  SELECT o_orderpriority, n,
         CAST(n AS DOUBLE)   AS nd,
         CAST(sx AS DOUBLE)  AS sxd,
         CAST(sxx AS DOUBLE) AS sxxd,
         CAST(sy AS DOUBLE)  AS syd,
         CAST(sxy AS DOUBLE) AS sxyd,
         CAST(syy AS DOUBLE) AS syyd
  FROM s
)
SELECT o_orderpriority, n,
       round({_OLS_SLOPE}, 6) AS slope_per_day,
       round((syd - ({_OLS_SLOPE}) * sxd) / nd, 4) AS intercept,
       round({_OLS_R2}, 6) AS r2
FROM d
ORDER BY o_orderpriority
"""


@_register("regression_trend_aggregates", _REGR_ORACLE)
def regression_trend_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend (slope / intercept / R²) as a SINGLE-PASS
    distributed aggregate: the five moment sums (Σx, Σx², Σy, Σxy, Σy²)
    are partial-aggregate-mergeable, so the whole regression costs one
    hash aggregate over the fact table — the shape regr_slope/regr_r2
    use internally, built here from exact bigint/decimal sums instead of
    engine-ordered float accumulation so the entry carries a full value
    oracle (the builtins sum doubles in partition order and drift in the
    last ulps across engines). The final slope/R² divisions happen once
    per group on exactly-agreed operands via a shared expression string
    (_OLS_SLOPE/_OLS_R2), making the doubles bit-identical cross-engine.
    At 100 TB this is the canonical "trend per key" telemetry query: one
    shuffle on the group key, no window, no second scan. y is
    DECIMAL(19,4): width 19 forces DuckDB onto its int128 multiply path
    (width ≤ 18 multiplies in int64 and overflows), and since the data
    has 2 real decimals every product has ≤ 4 — exact under BOTH
    engines' product-scale rules (Spark reduces 39→38 by rounding scale
    8→7, which loses nothing here)."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("x"),
        F.col("o_totalprice").cast("decimal(19,4)").alias("y"),
    )
    s = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = s.select(
        "o_orderpriority",
        "n",
        F.col("n").cast("double").alias("nd"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sxx").cast("double").alias("sxxd"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sxy").cast("double").alias("sxyd"),
        F.col("syy").cast("double").alias("syyd"),
    )
    return d.select(
        "o_orderpriority",
        "n",
        F.expr(f"round({_OLS_SLOPE}, 6)").alias("slope_per_day"),
        F.expr(f"round((syd - ({_OLS_SLOPE}) * sxd) / nd, 4)").alias(
            "intercept"
        ),
        F.expr(f"round({_OLS_R2}, 6)").alias("r2"),
    ).orderBy("o_orderpriority")


_BITMAP_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST(date_trunc('week', ts) AS DATE) AS wk,
         CAST(date_trunc('day', ts) AS DATE)  AS d,
         user_id
  FROM events
),
daily AS (
  SELECT event_type, wk, d, count(DISTINCT user_id) AS day_distinct
  FROM e GROUP BY event_type, wk, d
),
daily_roll AS (
  SELECT event_type, wk,
         count(*) AS n_days,
         CAST(sum(day_distinct) AS BIGINT) AS daily_sum
  FROM daily GROUP BY event_type, wk
),
weekly AS (
  SELECT event_type, wk, count(DISTINCT user_id) AS exact_distinct
  FROM e GROUP BY event_type, wk
)
SELECT dr.event_type, dr.wk, dr.n_days, dr.daily_sum, w.exact_distinct
FROM daily_roll dr
JOIN weekly w ON w.event_type = dr.event_type AND w.wk = dr.wk
ORDER BY dr.event_type, dr.wk
"""


@_register("bitmap_exact_distinct", _BITMAP_ORACLE)
def bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via segment bitmaps (the
    bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
    bitmap_or_agg / bitmap_count family) — the lakehouse answer to "HLL
    merges but is approximate; count(DISTINCT) is exact but re-scans":
    daily per-bucket bitmaps are built ONCE from the fact table, and any
    coarser grain (here weekly) comes from OR-merging the stored daily
    bitmaps — no second pass over raw events, and the counts stay exact.
    Each 32768-bit bucket bounds segment size, so skewed id spaces spread
    across buckets instead of hot-keying one row. The entry emits the
    daily-sum (double-counting rebounders) next to the merged weekly
    exact distinct, the pair a retention dashboard actually plots; the
    oracle recomputes both grains with plain count(DISTINCT). user_id is
    shifted +1 because the bitmap position contract is 1-based."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        (F.col("user_id") + 1).alias("uid"),
    )
    daily_seg = e.groupBy(
        "event_type",
        "wk",
        "d",
        F.bitmap_bucket_number(F.col("uid")).alias("bkt"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("uid"))).alias("bm")
    )
    daily_seg = daily_seg.localCheckpoint(eager=False)
    daily_roll = (
        daily_seg.groupBy("event_type", "wk", "d")
        .agg(F.sum(F.bitmap_count("bm")).alias("day_distinct"))
        .groupBy("event_type", "wk")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("day_distinct").alias("daily_sum"),
        )
    )
    weekly = (
        daily_seg.groupBy("event_type", "wk", "bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("event_type", "wk")
        .agg(F.sum(F.bitmap_count("bm")).alias("exact_distinct"))
    )
    return (
        daily_roll.join(weekly, ["event_type", "wk"])
        .select("event_type", "wk", "n_days", "daily_sum", "exact_distinct")
        .orderBy("event_type", "wk")
    )


_PREFIX_FILTER_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
                  AS DOUBLE), 6) AS jaccard
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE 5 * len(list_intersect(a.sh, b.sh))
      >= 4 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
ORDER BY id_a, id_b
"""


@_register("jaccard_prefix_filter_pairs", _PREFIX_FILTER_ORACLE)
def jaccard_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filtered similarity join (Bayardo WWW'07 /
    Xiao WWW'08): the third — and most scalable — exact path to "all
    pairs with Jaccard ≥ 0.8", next to the bounded crossJoin baseline
    (ngram_jaccard_topk) and the full inverted index (dedup_exact_jaccard).
    Docs index only their |x| - ⌈τ|x|⌉ + 1 globally-RAREST shingles, so
    hot shingles never enter the candidate join and postings shrink by
    ~τ; an exact intersect verifies candidates with an integer
    cross-multiplied threshold (5·∩ ≥ 4·∪). The oracle recomputes the
    answer quadratically — two independent algorithms, identical pairs
    (operators/dedup.prefix_filter_jaccard)."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import (
        prefix_filter_jaccard,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = prefix_filter_jaccard(
        d, "text", "doc_id", shingle_k=3, tau_num=4, tau_den=5
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


_LENGTH_BUCKET_ORACLE = r"""
WITH lens AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
bucketed AS (
  SELECT n_tokens,
         ntile(8) OVER (ORDER BY n_tokens, doc_id) AS bucket
  FROM lens
)
SELECT bucket,
       count(*)                                   AS n_docs,
       min(n_tokens)                              AS min_tokens,
       max(n_tokens)                              AS max_tokens,
       CAST(sum(n_tokens) AS BIGINT)              AS total_tokens,
       (1000000 * CAST(sum(n_tokens) AS BIGINT))
         // (count(*) * max(n_tokens))            AS padding_eff_ppm
FROM bucketed
GROUP BY bucket
ORDER BY bucket
"""


@_register("length_bucket_padding", _LENGTH_BUCKET_ORACLE)
def length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LENGTH-BUCKETED BATCHING audit — the fix for padding waste when
    batches pad to their longest member: rank documents by token count
    into 8 equal-size (ntile) buckets and measure each bucket's padding
    efficiency Σlen / (n·max_len) in exact ppm — uniform-length buckets
    push this toward 1,000,000 while random batching strands it at the
    corpus mean/max ratio. Complements sequence_packing (concat-packing)
    with the sort-bucketing strategy trainers use when documents must
    stay unsplit. The oracle is a literal global ntile; the Spark side
    computes the IDENTICAL assignment without the single-partition sort
    a global ntile plans: rank in parallel within contiguous length
    tiers, add per-tier offsets from a tiny broadcast cumsum (the
    curriculum_order_positions trick) to get the exact global rank, then
    apply ntile's size arithmetic (first n%k tiles hold ⌈n/k⌉ rows)
    arithmetically. Integer end-to-end, full value oracle."""
    d = _t(spark, sf_dir, "documents")
    lens = d.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "n_tokens"
        ),
    )
    # contiguous n_tokens ranges = tiers: every tier-i row globally sorts
    # before every tier-(i+1) row, so per-tier ranks + offsets ARE the
    # global (n_tokens, doc_id) rank — no single-partition window
    tiers = lens.select(
        "doc_id",
        "n_tokens",
        # tier = contiguous 4-token-wide length band: monotone by
        # construction with NO tuned cut points, so parallelism tracks
        # the corpus's length diversity instead of constants fitted to
        # one distribution (a single-length corpus still degenerates to
        # one tier — the irreducible case for any length-keyed rank)
        F.expr("n_tokens div 4").alias("tier"),
    )
    ranked = tiers.select(
        "tier",
        "n_tokens",
        F.row_number()
        .over(W.partitionBy("tier").orderBy("n_tokens", "doc_id"))
        .alias("r"),
    )
    sizes = tiers.groupBy("tier").agg(F.count(F.lit(1)).alias("n"))
    offsets = sizes.select(
        "tier",
        F.coalesce(
            F.sum("n").over(
                W.orderBy("tier").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )
    tot = sizes.agg(F.sum("n").alias("n_total"))
    pos = (
        ranked.join(F.broadcast(offsets), "tier")
        .select("n_tokens", (F.col("off") + F.col("r")).alias("rn"))
        .crossJoin(F.broadcast(tot))
    )
    # ntile(k): q = n div k, r = n mod k; tiles 1..r hold q+1 rows
    bucket = F.expr(
        "CASE WHEN rn <= (n_total % 8) * ((n_total div 8) + 1)"
        " THEN (rn - 1) div ((n_total div 8) + 1) + 1"
        " ELSE (n_total % 8)"
        "      + ((rn - (n_total % 8) * ((n_total div 8) + 1) - 1)"
        "         div (n_total div 8)) + 1 END"
    )
    return (
        pos.select("n_tokens", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("total_tokens"),
            F.expr(
                "(1000000 * sum(n_tokens)) div (count(*) * max(n_tokens))"
            ).alias("padding_eff_ppm"),
        )
        .orderBy("bucket")
    )


_WEIGHTED_MEDIAN_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS flag,
         l_extendedprice AS price,
         CAST(l_quantity AS BIGINT) AS wt
  FROM lineitem
),
cum AS (
  SELECT flag, price, wt,
         sum(wt) OVER (PARTITION BY flag ORDER BY price
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumw,
         sum(wt) OVER (PARTITION BY flag) AS tot
  FROM base
)
SELECT flag,
       count(*)                                        AS n_rows,
       CAST(max(tot) AS BIGINT)                        AS total_weight,
       min(CASE WHEN 2 * cumw >= tot THEN price END)   AS weighted_median
FROM cum
GROUP BY flag
ORDER BY flag
"""


@_register("weighted_median_window", _WEIGHTED_MEDIAN_ORACLE)
def weighted_median_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median per group (quantity-weighted price) without a
    UDAF: one cumulative-weight window ordered by the value, then the
    smallest value whose cumulative weight reaches half the group total —
    the lower weighted median. Integer weights make every cumulative sum
    exact, and the selected value is read straight off the scan (no
    arithmetic), so the entry is hash-exact with no rounding anywhere.
    Tie runs are safe: rows with equal price permute only within their
    run, so the run-boundary partial sums — and therefore the crossing
    PRICE — are order-independent. Scale shape: one hash-partition window
    on the group key plus the per-group rollup; contrast with
    percentile_stats (exact interpolated, collect-based percentile()) and
    approx_percentile_sketch (the 100 TB sketch path)."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    wcum = (
        W.partitionBy("flag")
        .orderBy("price")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("flag")
    cum = base.select(
        "flag",
        "price",
        F.sum("wt").over(wcum).alias("cumw"),
        F.sum("wt").over(wall).alias("tot"),
    )
    return (
        cum.groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("tot").cast("bigint").alias("total_weight"),
            F.min(
                F.when(2 * F.col("cumw") >= F.col("tot"), F.col("price"))
            ).alias("weighted_median"),
        )
        .orderBy("flag")
    )


_BM25_ORACLE = r"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS arr
  FROM documents WHERE text IS NOT NULL
),
lens AS (SELECT doc_id, len(arr) AS dl FROM d),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM lens
),
toks AS (SELECT doc_id, unnest(arr) AS term FROM d),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE term IN ('join', 'vector', 'stream')
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
             * tf * 2.2
             / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS s
  FROM tf
  JOIN dfreq USING (term)
  JOIN lens ON lens.doc_id = tf.doc_id, stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS bm25
FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT 15
"""


@_register("bm25_ranked_retrieval", _BM25_ORACLE)
def bm25_ranked_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval (k1=1.2, b=0.75, Lucene's ln(1+x) idf)
    over the documents table for a fixed query — the keyword half of a
    retrieval stack next to doc_similarity_tf_cosine (dense half). Scale
    shape: postings filtered to the QUERY terms before the tf shuffle
    (the selection reaches the explode, so the aggregate sees |q| terms
    per doc, not the corpus vocabulary); document-frequency and
    length-norm stats are one tiny broadcast each; top-15 is
    TakeOrderedAndProject, never a global sort. All inputs to the double
    math are exact integers (tf, df, dl, N), so both engines evaluate
    identical IEEE expressions and the 4-decimal rounding is stable."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias("arr"),
    )
    d = d.localCheckpoint(eager=False)  # consumed by lens, stats, and toks
    lens = d.select("doc_id", F.size("arr").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    query_terms = ["join", "vector", "stream"]
    tf = (
        d.select("doc_id", F.explode("arr").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = tf.localCheckpoint(eager=False)  # feeds dfreq AND the score join
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score",
            F.log(
                F.lit(1)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            * F.col("tf")
            * F.lit(2.2)
            / (
                F.col("tf")
                + F.lit(1.2)
                * (
                    F.lit(1)
                    - F.lit(0.75)
                    + F.lit(0.75) * F.col("dl") / F.col("avgdl")
                )
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(15)


_SHARD_ORACLE = r"""
WITH keyed AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 15))
              AS BIGINT) AS shuffle_key,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
  FROM documents
),
assigned AS (
  SELECT doc_id, n_tokens,
         shuffle_key % 8 AS shard_id,
         row_number() OVER (PARTITION BY shuffle_key % 8
                            ORDER BY shuffle_key, doc_id) AS position
  FROM keyed
)
SELECT shard_id, CAST(position AS BIGINT) AS position, doc_id, n_tokens
FROM assigned
ORDER BY shard_id, position
"""


@_register("training_shard_shuffle", _SHARD_ORACLE)
def training_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-data shuffle: every document gets a
    pseudo-random-but-reproducible shuffle key (md5 of id + seed — the
    portable lane; production swaps xxhash64 exactly like the dedup
    fingerprints), the key's modulus picks the output shard, and the
    within-shard ORDER is the key order — so the 'random' permutation is
    a pure function of (id, seed) and any rerun, resume, or engine swap
    reproduces it bit-for-bit. This is the step that breaks source/time
    locality before sequence packing; correlated batches are a real
    training regression. Scale shape: ONE hash shuffle on shard_id with
    per-shard (not global) sort — shards are independent, so 100 TB
    shuffles as width-many parallel sorts, never a total order; shard
    count governs downstream file sizes (operators/textstats.py is the
    token side of the same contract)."""
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("doc_id"), F.lit("42"))), 1, 15),
            16,
            10,
        )
        .cast("bigint")
        .alias("shuffle_key"),
        F.when(F.trim(F.col("text")) == "", 0)
        .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = W.partitionBy("shard_id").orderBy("shuffle_key", "doc_id")
    return (
        keyed.withColumn("shard_id", F.col("shuffle_key") % 8)
        .withColumn("position", F.row_number().over(w).cast("bigint"))
        .select("shard_id", "position", "doc_id", "n_tokens")
        .orderBy("shard_id", "position")
    )


_TF_COSINE_CAPPED_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE doc_id % 4 = 0
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
),
norms AS (
  SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS nrm FROM tf GROUP BY doc_id
),
kept AS (
  SELECT term, doc_id FROM (
    SELECT term, doc_id,
           row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
    FROM tf
  ) WHERE rn <= 16
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
),
dots AS (
  SELECT c.doc_a, c.doc_b, CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
  FROM cand c
  JOIN tf a ON a.doc_id = c.doc_a
  JOIN tf b ON b.doc_id = c.doc_b AND b.term = a.term
  GROUP BY c.doc_a, c.doc_b
),
scored AS (
  SELECT d.doc_a, d.doc_b, round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_a
  JOIN norms nb ON nb.doc_id = d.doc_b
),
ranked AS (
  SELECT doc_a, doc_b, cosine,
         row_number() OVER (PARTITION BY doc_a
                            ORDER BY cosine DESC, doc_b) AS rnk
  FROM scored
)
SELECT doc_a, doc_b, CAST(rnk AS INT) AS rnk, cosine
FROM ranked WHERE rnk <= 3
ORDER BY doc_a, rnk
"""


@_register("doc_similarity_capped_postings", _TF_COSINE_CAPPED_ORACLE)
def doc_similarity_capped_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION shape of doc_similarity_tf_cosine. The round-3
    scaling sweep MEASURED the exact sibling at 26x time for 5x data
    (SCALING_LOCAL.json): its inverted-index join does Σ postings² work,
    and on a bounded vocabulary postings grow with the corpus, so pair
    work is effectively |docs|² — correct math, 100 TB death. This entry
    implements the mitigation its docstring prescribed: impact-ordered
    POSTING-LIST TRUNCATION (candidate generation keeps only each term's
    top-16 postings by tf — the classic impact-ordered index move), then
    EXACT cosine verification of the candidates over the FULL tf vectors.
    Candidate work is Σ min(postings,16)² ≤ 256·|vocab| — linear in
    vocabulary, independent of corpus size; verification is |candidates|
    × doc length, not |docs|². Trade-off: top-k recall < 1 for docs whose
    neighbors share only ultra-common terms (deterministically — both
    engines run the identical truncation, so the entry stays a full
    value oracle). Shares the scan/tf/norms plan with the exact sibling."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    tf = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # feeds kept + both verify sides + norms
    )
    norms = tf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf")).cast("double")).alias("nrm")
    )
    wterm = W.partitionBy("term").orderBy(F.col("tf").desc(), "doc_id")
    kept = (
        tf.withColumn("rn", F.row_number().over(wterm))
        .filter(F.col("rn") <= 16)
        .select("term", "doc_id")
    )
    cand = (
        kept.alias("a")
        .join(kept.alias("b"), "term")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .localCheckpoint(eager=False)  # candidate set feeds the verify join
    )
    a = tf.select(F.col("doc_id").alias("doc_a"), "term", F.col("tf").alias("tf_a"))
    b = tf.select(F.col("doc_id").alias("doc_b"), "term", F.col("tf").alias("tf_b"))
    dots = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    w = W.partitionBy("doc_a").orderBy(F.col("cosine").desc(), "doc_b")
    return (
        dots.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_a", "doc_b", "rnk", "cosine")
        .orderBy("doc_a", "rnk")
    )


_DELTA_READ_ORACLE = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE doc_id < 400 AND doc_id >= 100
GROUP BY lang
ORDER BY lang
"""


@_register("delta_read_snapshot_agg", _DELTA_READ_ORACLE)
def delta_read_snapshot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 READ path, driver-verified end to end: build a Delta table by
    writing protocol-conformant artifacts (parquet data files +
    line-JSON _delta_log commits per delta-io PROTOCOL.md — the jarless
    equivalent of the reference's convert_to_delta.py:85-88 output),
    with a history that exercises the log replay: v0 adds docs
    [0,200), v1 adds [200,400), v2 REMOVES the first file and adds
    [100,200) back as a new file. The latest snapshot therefore holds
    exactly docs [100,400), and the aggregation over
    read_delta_snapshot must match DuckDB aggregating the same id range
    straight off the source table — proving adds, removes, and
    last-action-wins replay against an independent engine
    (sources/io.read_delta_snapshot)."""
    import glob
    import json
    import os
    import shutil
    import tempfile
    import uuid

    from nyc_taxi_data_pipeline_spark.sources.io import read_delta_snapshot

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    root = os.path.join(
        tempfile.gettempdir(), f"delta_entry_{uuid.uuid4().hex[:12]}"
    )
    try:
        def one_file(df, sub):
            tmp = f"{root}/__tmp"
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            src = glob.glob(f"{tmp}/part-*.parquet")[0]
            os.replace(src, f"{root}/{sub}")
            return sub

        os.makedirs(root, exist_ok=True)
        f0 = one_file(docs.filter("doc_id < 200"), "f0.parquet")
        f1 = one_file(
            docs.filter("doc_id >= 200 AND doc_id < 400"), "f1.parquet"
        )
        f2 = one_file(
            docs.filter("doc_id >= 100 AND doc_id < 200"), "f2.parquet"
        )
        log = f"{root}/_delta_log"
        os.makedirs(log, exist_ok=True)

        def commit(v, actions):
            with open(f"{log}/{v:020d}.json", "w") as fh:
                for a in actions:
                    fh.write(json.dumps(a) + "\n")

        add = lambda p: {  # noqa: E731
            "add": {"path": p, "partitionValues": {}, "size": 1,
                    "modificationTime": 0, "dataChange": True}
        }
        commit(0, [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "d-1",
                          "format": {"provider": "parquet", "options": {}},
                          "schemaString": "{}", "partitionColumns": [],
                          "configuration": {}}},
            add(f0),
        ])
        commit(1, [add(f1)])
        commit(2, [{"remove": {"path": f0, "deletionTimestamp": 0,
                               "dataChange": True}}, add(f2)])
        snap = read_delta_snapshot(spark, root)
        out = (
            snap.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
            )
            .orderBy("lang")
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


_ZONE_OCC_ORACLE = """
SELECT source,
       count(*) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM documents
WHERE (source <> 'src1' AND source <> 'src2' AND doc_id < 300)
   OR (source = 'src1' AND doc_id >= 300 AND doc_id < 350)
   OR (source = 'src2' AND doc_id >= 350 AND doc_id < 420)
GROUP BY source
ORDER BY source
"""


@_register("zone_occ_protocol", _ZONE_OCC_ORACLE)
def zone_occ_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The optimistic-concurrency zone protocol under the driver's value
    gate: a base snapshot (docs < 300, partitioned by source) is
    published, then TWO partition-scoped writers both derive updates
    from version 0 — writer A replaces partition src1 with docs
    [300,350), writer B replaces src2 with [350,420). A commits first;
    B's commit detects the interleaved log entry, proves disjointness,
    REBASES onto v1 and lands as v2. The final snapshot must therefore
    carry A's src1, B's src2, and the untouched base partitions — which
    the oracle states as a pure predicate over the source table. Loser/
    winner ordering is forced (sequential calls with stale
    expected_version), so the result is deterministic
    (sources/io.publish_zone_partitions_cas)."""
    import os
    import shutil
    import tempfile
    import uuid

    from nyc_taxi_data_pipeline_spark.sources.io import (
        publish_zone_partitions_cas,
        read_zone_snapshot,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    zone = os.path.join(
        tempfile.gettempdir(), f"occ_entry_{uuid.uuid4().hex[:12]}"
    )
    try:
        base = docs.filter("doc_id < 300")
        publish_zone_partitions_cas(spark, zone, base, "source", -1)
        upd_a = docs.filter(
            "source = 'src1' AND doc_id >= 300 AND doc_id < 350"
        )
        upd_b = docs.filter(
            "source = 'src2' AND doc_id >= 350 AND doc_id < 420"
        )
        va = publish_zone_partitions_cas(
            spark, zone, upd_a, "source", expected_version=0
        )
        vb = publish_zone_partitions_cas(
            spark, zone, upd_b, "source", expected_version=0  # stale: rebases
        )
        assert (va, vb) == (1, 2), (va, vb)
        final = (
            read_zone_snapshot(spark, zone)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min("doc_id").cast("bigint").alias("min_doc"),
                F.max("doc_id").cast("bigint").alias("max_doc"),
            )
            .orderBy("source")
        )
        out = spark.createDataFrame(final.collect(), final.schema)
    finally:
        shutil.rmtree(zone, ignore_errors=True)
    return out


_SPLIT_ORACLE = """
WITH assigned AS (
  SELECT source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         CASE
           WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':split:42'), 1, 15))
                AS BIGINT) % 100 < 80 THEN 'train'
           WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':split:42'), 1, 15))
                AS BIGINT) % 100 < 90 THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT source, split,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM assigned
GROUP BY source, split
ORDER BY source, split
"""


@_register("train_val_test_split", _SPLIT_ORACLE)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment: split membership
    is a pure function of md5(doc_id, salt) mod 100 — NEVER random() —
    so any rerun, any engine, any partitioning reproduces the identical
    split, new documents land in splits without moving old ones (the
    property per-epoch reshuffles and sampleBy both lack), and
    decontamination can verify val/test membership from the id alone.
    Zero shuffles until the audit rollup (one hash agg on
    (source, split)); the portable md5 lane mirrors the dedup
    fingerprints — production swaps xxhash64."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.lit("split"), F.lit("42"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    assigned = docs.select(
        "source",
        F.when(F.trim(F.col("text")) == "", 0)
        .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint")
        .alias("n_tokens"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    return (
        assigned.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source", "split")
    )


_KNN_EVAL_ORACLE = """
WITH q AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 2000),
c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS true_label, c.label AS cand_label,
         round(list_cosine_similarity(q.v, c.v), 6) AS cosine, c.vec_id AS cid
  FROM q JOIN c ON q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, true_label, cand_label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, cid) AS rnk
  FROM scored
),
votes AS (
  SELECT query_id, true_label, cand_label, count(*) AS n_votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY count(*) DESC, cand_label) AS vote_rank
  FROM ranked WHERE rnk <= 5
  GROUP BY query_id, true_label, cand_label
),
pred AS (
  SELECT query_id, true_label, cand_label AS pred_label
  FROM votes WHERE vote_rank = 1
)
SELECT true_label, pred_label, count(*) AS n_queries
FROM pred
GROUP BY true_label, pred_label
ORDER BY true_label, pred_label
"""


@_register("knn_label_eval", _KNN_EVAL_ORACLE)
def knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label quality audit: 5-NN majority-vote
    classification of a query sample against the full corpus (leave-own-
    vector-out), reported as a confusion matrix — the standard check
    that an embedding column actually separates its labels before
    trusting it for semantic dedup or clustering. Exact-on-a-sample by
    design (audits run on samples; the ANN entries are the production
    retrieval path): the query panel is a FIXED id set (vec_id % 25 == 0
    AND vec_id < 2000) so cost stays O(corpus · |panel|) as the corpus
    grows; broadcast query block, JVM zip_with dot products,
    two windows (rank, then vote) on rounded cosine so both engines
    rank identically. Ties in votes break on label id."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(
        (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 2000)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("cand_label"),
        F.col("embedding").alias("cv"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    nrm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(col, lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cid"))
        .select(
            "query_id",
            "true_label",
            "cand_label",
            "cid",
            F.round(dot / (nrm(F.col("qv")) * nrm(F.col("cv"))), 6).alias(
                "cosine"
            ),
        )
    )
    wrank = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "cid")
    top5 = scored.withColumn("rnk", F.row_number().over(wrank)).filter(
        F.col("rnk") <= 5
    )
    wvote = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), "cand_label"
    )
    pred = (
        top5.groupBy("query_id", "true_label", "cand_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
        .withColumn("vote_rank", F.row_number().over(wvote))
        .filter(F.col("vote_rank") == 1)
    )
    return (
        pred.groupBy("true_label", F.col("cand_label").alias("pred_label"))
        .agg(F.count(F.lit(1)).alias("n_queries"))
        .orderBy("true_label", "pred_label")
    )


_PSI_ORACLE = """
WITH b AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi, max(value) AS maxv
  FROM events
),
bucketed AS (
  SELECT CASE WHEN epoch_us(ts) * 2 <= lo + hi THEN 'p1' ELSE 'p2' END AS period,
         CAST(least(floor(value * 10 / maxv), 9) AS BIGINT) AS bucket
  FROM events, b
),
counts AS (
  SELECT bucket,
         CAST(sum(CASE WHEN period = 'p1' THEN 1 ELSE 0 END) AS BIGINT) AS n_p1,
         CAST(sum(CASE WHEN period = 'p2' THEN 1 ELSE 0 END) AS BIGINT) AS n_p2
  FROM bucketed GROUP BY bucket
),
tot AS (SELECT sum(n_p1) AS t1, sum(n_p2) AS t2 FROM counts)
SELECT bucket, n_p1, n_p2,
       round(((n_p1 + 1.0) / (t1 + 10.0) - (n_p2 + 1.0) / (t2 + 10.0))
             * ln(((n_p1 + 1.0) / (t1 + 10.0)) / ((n_p2 + 1.0) / (t2 + 10.0))),
             6) AS psi_term
FROM counts, tot
ORDER BY bucket
"""


@_register("distribution_drift_psi", _PSI_ORACLE)
def distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift audit between the first and second
    half of the event stream's time range — the standard pre-retraining
    check that a feature's distribution hasn't shifted between data
    vintages (PSI > 0.2 per convention = investigate). Decile buckets on
    the value range, +1/+10 Laplace smoothing so empty buckets stay
    finite, one scan + one tiny broadcast of the (min, max, maxv) bounds
    + one hash agg on (bucket): mergeable and linear, the audit you can
    afford on every ingest. The midpoint split uses integer micros
    arithmetic (epoch_us * 2 <= lo + hi) so both engines cut the stream
    identically; psi terms round at 6dp on identical double
    expressions."""
    e = _t(spark, sf_dir, "events")
    b = F.broadcast(
        e.agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
            F.max("value").alias("maxv"),
        )
    )
    bucketed = e.crossJoin(b).select(
        F.when(
            F.unix_micros("ts") * 2 <= F.col("lo") + F.col("hi"), "p1"
        )
        .otherwise("p2")
        .alias("period"),
        F.least(F.floor(F.col("value") * 10 / F.col("maxv")), F.lit(9))
        .cast("bigint")
        .alias("bucket"),
    )
    counts = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("period") == "p1", 1).otherwise(0))
        .cast("bigint")
        .alias("n_p1"),
        F.sum(F.when(F.col("period") == "p2", 1).otherwise(0))
        .cast("bigint")
        .alias("n_p2"),
    )
    tot = F.broadcast(
        counts.agg(
            F.sum("n_p1").alias("t1"), F.sum("n_p2").alias("t2")
        )
    )
    p = (F.col("n_p1") + F.lit(1.0)) / (F.col("t1") + F.lit(10.0))
    q = (F.col("n_p2") + F.lit(1.0)) / (F.col("t2") + F.lit(10.0))
    return (
        counts.crossJoin(tot)
        .select(
            "bucket",
            "n_p1",
            "n_p2",
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'click'
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
)
SELECT 'step1_view' AS step, count(*) AS n_users FROM s1
UNION ALL
SELECT 'step2_click', count(*) FROM s2
UNION ALL
SELECT 'step3_purchase', count(*) FROM s3
ORDER BY step
"""


@_register("event_funnel_conversion", _FUNNEL_ORACLE)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user counts
    at step k only if the step-k event happens STRICTLY AFTER their
    step-(k-1) entry time — the sequencing constraint that separates a
    funnel from three independent counts (a user who purchased before
    ever viewing does not convert). Shape: one filtered min-agg per step
    joined back on user_id — k hash shuffles on the user key for a
    k-step funnel, no window over the whole stream, no per-user event
    sorting; at 100 TB each step's input is the events of the PREVIOUS
    step's survivors (semi-join-pruned scan), so the work shrinks down
    the funnel."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("step1_view").alias("step"), "n_users"
        ),
        s2.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("step2_click").alias("step"), "n_users"
        ),
        s3.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("step3_purchase").alias("step"), "n_users"
        ),
    ]
    out = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return out.orderBy("step")


_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_trunc('week', e.ts) AS DATE) AS activity_week
  FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT cohort_week,
       CAST(date_diff('week', cohort_week, activity_week) AS BIGINT)
         AS weeks_since,
       count(*) AS n_active_users
FROM activity
GROUP BY cohort_week, weeks_since
ORDER BY cohort_week, weeks_since
"""


@_register("cohort_retention_matrix", _COHORT_ORACLE)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    once per (cohort, weeks-since) cell they were active in — the
    retention triangle every growth dashboard plots. Shape: one min-agg
    on user (cohort assignment), one distinct on (user, week) — both
    hash shuffles on the user key, mergeable, no windows; the cohort
    frame joins back by user so at 100 TB it rides the same
    partitioning as the distinct. date_trunc('week') is Monday-anchored
    in both engines, and week arithmetic is exact integer date math."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    firsts = e.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = (
        e.join(firsts, "user_id")
        .select("user_id", "cohort_week", F.col("wk").alias("activity_week"))
        .distinct()
    )
    return (
        activity.groupBy(
            "cohort_week",
            (
                F.datediff(F.col("activity_week"), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_week", "weeks_since")
    )



_ISLANDS_ORACLE = """
WITH iv AS (
  SELECT o_custkey, o_orderkey,
         CAST(o_orderdate AS DATE) AS start_d,
         CAST(o_orderdate AS DATE) + 7 AS end_d
  FROM orders
),
m AS (
  SELECT o_custkey, o_orderkey, start_d, end_d,
         max(end_d) OVER (PARTITION BY o_custkey
                          ORDER BY start_d, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_end
  FROM iv
),
f AS (
  SELECT o_custkey, o_orderkey, start_d, end_d,
         CASE WHEN prev_max_end IS NULL OR start_d > prev_max_end
              THEN 1 ELSE 0 END AS brk
  FROM m
),
g AS (
  SELECT o_custkey, start_d, end_d,
         sum(brk) OVER (PARTITION BY o_custkey
                        ORDER BY start_d, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island_id
  FROM f
),
islands AS (
  SELECT o_custkey, island_id,
         min(start_d) AS island_start, max(end_d) AS island_end,
         count(*) AS n_orders
  FROM g GROUP BY o_custkey, island_id
)
SELECT o_custkey,
       count(*) AS n_islands,
       CAST(sum(date_diff('day', island_start, island_end)) AS BIGINT)
         AS covered_days,
       max(n_orders) AS max_orders_in_island
FROM islands
GROUP BY o_custkey
ORDER BY o_custkey
"""


@_register("interval_islands_merge", _ISLANDS_ORACLE)
def interval_islands_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merging: each order opens a 7-day
    activity span [orderdate, orderdate+7); overlapping or touching
    spans per customer coalesce into islands via the classic running-max
    break test (start > max of all previous ends starts a new island),
    then a cumulative sum of break flags numbers the islands. This is
    the canonical 'merge overlapping intervals' operator (maintenance
    windows, coverage gaps, contiguous-availability SLAs) done with two
    windows over ONE (custkey, start, orderkey) shuffle+sort — Catalyst
    plans a single Exchange for both window passes and the first
    aggregation, because they share the partitioning key. No self-join,
    no island loop; per-key memory is O(1) streaming through the sorted
    partition, so a 100 TB fact costs exactly one shuffle and skewed
    customers degrade to a long sorted run, not a blowup. All math is
    integer date arithmetic, so cross-engine values are exact."""
    iv = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("start_d"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("end_d"),
    )
    w_order = W.partitionBy("o_custkey").orderBy("start_d", "o_orderkey")
    m = iv.withColumn(
        "prev_max_end",
        F.max("end_d").over(w_order.rowsBetween(W.unboundedPreceding, -1)),
    )
    f = m.withColumn(
        "brk",
        F.when(
            F.col("prev_max_end").isNull()
            | (F.col("start_d") > F.col("prev_max_end")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    g = f.withColumn(
        "island_id",
        F.sum("brk").over(w_order.rowsBetween(W.unboundedPreceding, 0)),
    )
    islands = g.groupBy("o_custkey", "island_id").agg(
        F.min("start_d").alias("island_start"),
        F.max("end_d").alias("island_end"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        islands.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.datediff("island_end", "island_start"))
            .cast("bigint")
            .alias("covered_days"),
            F.max("n_orders").alias("max_orders_in_island"),
        )
        .orderBy("o_custkey")
    )


_SCD2_PIT_ORACLE = """
WITH chg AS (
  SELECT user_id, event_type AS state, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type <> 'purchase'
),
scd AS (
  SELECT user_id, state, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS valid_to
  FROM chg WHERE prev IS NULL OR state <> prev
),
fact AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT coalesce(s.state, '(none)') AS state,
       count(*) AS n_purchases,
       CAST(round(sum(CAST(f.value AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS total_value
FROM fact f
LEFT JOIN scd s
  ON f.user_id = s.user_id
 AND f.ts >= s.valid_from
 AND (s.valid_to IS NULL OR f.ts < s.valid_to)
GROUP BY 1
ORDER BY 1
"""


@_register("scd2_point_in_time_join", _SCD2_PIT_ORACLE)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) fact lookup against an SCD2 dimension — the
    read side of slowly-changing-dimension versioning (the build side is
    `scd2_dimension_build`): each purchase event joins the ONE state row
    whose [valid_from, valid_to) validity interval contains its
    timestamp, purchases before the user's first recorded state fall out
    to '(none)' via the left join. The temporal predicate rides as a
    residual filter on an equi hash join keyed on user_id, so at 100 TB
    this is one shuffle co-partitioning facts with their key's handful
    of dimension versions — never a broadcast-nested-loop over the range
    condition. Monetary totals sum in DECIMAL(38,6) (order-independent)
    before the final round, so values are bit-stable cross-engine."""
    from nyc_taxi_data_pipeline_spark.operators.warehouse import (
        scd2_from_changelog,
    )

    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    dim = scd2_from_changelog(
        e.filter(F.col("event_type") != "purchase"),
        key="user_id",
        ts_col="ts",
        attr_col="event_type",
        tiebreak_col="event_id",
    ).select(
        F.col("user_id").alias("d_user_id"),
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )
    fact = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = fact.join(
        dim,
        (fact["user_id"] == dim["d_user_id"])
        & (fact["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (fact["ts"] < dim["valid_to"])),
        "left",
    )
    return (
        joined.groupBy(F.coalesce("state", F.lit("(none)")).alias("state"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("state")
    )


_QUOTA_ORACLE = r"""
WITH tok AS (
  SELECT source,
         CAST(sum(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END)
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM tok),
shares AS (
  SELECT source, n_tokens,
         CAST((1000000 * n_tokens) // total AS BIGINT) AS floor_quota,
         CAST((1000000 * n_tokens) % total AS BIGINT) AS rem
  FROM tok, tot
),
ranked AS (
  SELECT source, n_tokens, floor_quota,
         row_number() OVER (ORDER BY rem DESC, source) AS rk,
         CAST(1000000 - sum(floor_quota) OVER () AS BIGINT) AS leftover
  FROM shares
)
SELECT source, n_tokens,
       CAST(floor_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM ranked
ORDER BY source
"""


@_register("quota_allocation_largest_remainder", _QUOTA_ORACLE)
def quota_allocation_largest_remainder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a fixed training-token
    budget across corpus sources: floor of the exact proportional share,
    then the leftover units go one-by-one to the largest fractional
    remainders (source-name tiebreak), so quotas always sum EXACTLY to
    the budget — the integer-exact way to turn sampling weights into
    per-source document quotas for a dataset mix (the rate-based sibling
    is `dataset_mix_weighted`). The 100 TB corpus collapses to one
    mergeable token-count aggregate (|sources| rows); all remaining
    arithmetic — products, floor division, modulo, the remainder ranking
    — runs on that tiny frame in exact BIGINT, so cross-engine values
    are bit-identical. Wider-than-bigint budgets (budget × tokens >
    2^63) would ride the same plan with DECIMAL(38,0) lanes."""
    from nyc_taxi_data_pipeline_spark.operators.textstats import (
        token_budget_by,
    )

    budget = F.lit(1_000_000).cast("bigint")
    # The token-count rollup scans+tokenizes every document; it feeds three
    # consumers (total, spent, ranked) and AQE stage reuse does not fire for
    # derived frames — checkpoint the tiny |sources|-row result once.
    tok = (
        token_budget_by(_t(spark, sf_dir, "documents"), "source")
        .select("source", F.col("total_tokens").alias("n_tokens"))
        .localCheckpoint(eager=False)
    )
    tot = tok.agg(F.sum("n_tokens").cast("bigint").alias("total"))
    shares = tok.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        (budget * F.col("n_tokens")).cast("bigint").alias("bn"),
        "total",
    ).select(
        "source",
        "n_tokens",
        F.floor(F.col("bn") / F.col("total")).cast("bigint").alias(
            "floor_quota"
        ),
        (F.col("bn") % F.col("total")).cast("bigint").alias("rem"),
    )
    spent = shares.agg(
        F.sum("floor_quota").cast("bigint").alias("spent")
    )
    ranked = shares.crossJoin(F.broadcast(spent)).select(
        "source",
        "n_tokens",
        "floor_quota",
        F.row_number()
        .over(W.partitionBy(F.lit(1)).orderBy(F.col("rem").desc(), "source"))
        .alias("rk"),
        (budget - F.col("spent")).cast("bigint").alias("leftover"),
    )
    return ranked.select(
        "source",
        "n_tokens",
        (
            F.col("floor_quota")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("quota"),
    ).orderBy("source")


_YOY_ORACLE = """
WITH yearly AS (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS order_year,
         CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(38,6))), 2)
              AS DOUBLE) AS revenue
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY nation, order_year
)
SELECT nation, order_year, revenue,
       round(
         (revenue - lag(revenue) OVER (PARTITION BY nation
                                       ORDER BY order_year))
         / lag(revenue) OVER (PARTITION BY nation ORDER BY order_year),
         6) AS yoy_growth
FROM yearly
ORDER BY nation, order_year
"""


@_register("yoy_revenue_growth", _YOY_ORACLE)
def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per nation: yearly revenue (decimal-exact
    sums) then lag() over the per-nation year series — the standard
    'percent change vs prior period' report as agg + window. The heavy
    input reduces to |nations|×|years| rows before the window, so the
    lag costs nothing at any scale; growth divides two doubles derived
    from identical exact decimals, making the rounded ratio bit-stable
    cross-engine. First year per nation is NULL growth by definition."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.year("o_orderdate").alias("order_year")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yearly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), "order_year")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("revenue")
        )
    )
    w = W.partitionBy("nation").orderBy("order_year")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "nation",
        "order_year",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("yoy_growth"),
    ).orderBy("nation", "order_year")


_CHISQ_ORACLE = """
WITH cells AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         count(*) AS n_obs
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
marg AS (
  SELECT segment, priority, n_obs,
         sum(n_obs) OVER (PARTITION BY segment) AS row_tot,
         sum(n_obs) OVER (PARTITION BY priority) AS col_tot,
         sum(n_obs) OVER () AS grand_tot
  FROM cells
)
SELECT segment, priority, n_obs,
       round(CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
             / CAST(grand_tot AS DOUBLE), 6) AS expected,
       round(
         (CAST(n_obs AS DOUBLE)
          - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
            / CAST(grand_tot AS DOUBLE))
         * (CAST(n_obs AS DOUBLE)
            - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
              / CAST(grand_tot AS DOUBLE))
         / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
            / CAST(grand_tot AS DOUBLE)),
         6) AS chi2_contrib
FROM marg
ORDER BY segment, priority
"""


@_register("chisq_independence_screen", _CHISQ_ORACLE)
def chisq_independence_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen between two categorical columns
    (market segment × order priority) — the drift/association test next
    to `distribution_drift_psi`: observed cell counts vs the
    independence expectation (row_total × col_total / N), with each
    cell's chi² contribution so the hot cells are readable directly.
    The fact table collapses to a |segments|×|priorities| contingency in
    ONE hash aggregate; the three marginal sums are windows over that
    tiny frame, so the statistic costs nothing beyond the count. All
    inputs to the double arithmetic are exact integers, making the
    rounded expectations bit-stable cross-engine."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    row_tot = F.sum("n_obs").over(W.partitionBy("segment"))
    col_tot = F.sum("n_obs").over(W.partitionBy("priority"))
    grand_tot = F.sum("n_obs").over(W.partitionBy())
    expected = (
        row_tot.cast("double") * col_tot.cast("double") / grand_tot.cast("double")
    )
    dev = F.col("n_obs").cast("double") - expected
    return (
        cells.select(
            "segment",
            "priority",
            "n_obs",
            F.round(expected, 6).alias("expected"),
            F.round(dev * dev / expected, 6).alias("chi2_contrib"),
        )
        .orderBy("segment", "priority")
    )


_INTERP_ORACLE = """
WITH obs AS (
  SELECT l_suppkey,
         CAST(date_trunc('week', l_shipdate) AS DATE) AS wk,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE)
           AS qty
  FROM lineitem
  WHERE l_suppkey % 10 = 0
  GROUP BY 1, 2
),
bounds AS (
  SELECT l_suppkey, min(wk) AS wk_min, max(wk) AS wk_max FROM obs
  GROUP BY 1
),
spine AS (
  SELECT b.l_suppkey, CAST(unnest(generate_series(b.wk_min, b.wk_max,
                                  INTERVAL 7 DAY)) AS DATE) AS wk
  FROM bounds b
),
j AS (
  SELECT s.l_suppkey, s.wk, o.qty FROM spine s
  LEFT JOIN obs o ON o.l_suppkey = s.l_suppkey AND o.wk = s.wk
),
ctx AS (
  SELECT l_suppkey, wk, qty,
         last_value(qty IGNORE NULLS) OVER (
           PARTITION BY l_suppkey ORDER BY wk
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_q,
         last_value(CASE WHEN qty IS NOT NULL THEN wk END IGNORE NULLS) OVER (
           PARTITION BY l_suppkey ORDER BY wk
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_wk,
         first_value(qty IGNORE NULLS) OVER (
           PARTITION BY l_suppkey ORDER BY wk
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_q,
         first_value(CASE WHEN qty IS NOT NULL THEN wk END IGNORE NULLS) OVER (
           PARTITION BY l_suppkey ORDER BY wk
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_wk
  FROM j
)
SELECT l_suppkey, wk,
       CASE WHEN qty IS NOT NULL THEN 'observed' ELSE 'interpolated' END
         AS fill_kind,
       round(CASE
         WHEN qty IS NOT NULL THEN qty
         ELSE prev_q + (next_q - prev_q)
              * (CAST(wk - prev_wk AS DOUBLE)
                 / CAST(next_wk - prev_wk AS DOUBLE))
       END, 4) AS qty_filled
FROM ctx
ORDER BY l_suppkey, wk
"""


@_register("timeseries_linear_interpolation", _INTERP_ORACLE)
def timeseries_linear_interpolation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear interpolation over a densified time series — the step past
    `timeseries_gapfill_locf`: per-supplier weekly shipped quantity on a
    sequence()+explode spine (the scale-safe spine, never a recursive
    walk), missing weeks filled by the straight line between the nearest
    observed neighbors. Both neighbor lookups are last/first_value
    IGNORE NULLS windows sharing ONE (suppkey, week) shuffle+sort with
    the spine join — no self-join, no per-gap loop; interior gaps get
    the interpolation, edge weeks (before the first / after the last
    observation, absent here since the spine spans min..max) would
    degrade to LOCF/BOCF. The interpolation fraction divides exact
    integer day counts and the endpoint quantities come from exact
    decimal sums, so the rounded fill values are bit-identical
    cross-engine. Spine cardinality is |series|×span — generated, never
    shuffled wide."""
    obs = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") % 10 == 0)
        .groupBy(
            "l_suppkey",
            F.date_trunc("week", "l_shipdate").cast("date").alias("wk"),
        )
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("qty")
        )
        # consumed twice (bounds + spine join) — checkpoint so the lineitem
        # scan + aggregate run once (AQE stage reuse misses derived frames)
        .localCheckpoint(eager=False)
    )
    bounds = obs.groupBy("l_suppkey").agg(
        F.min("wk").alias("wk_min"), F.max("wk").alias("wk_max")
    )
    spine = bounds.select(
        "l_suppkey",
        F.explode(
            F.sequence("wk_min", "wk_max", F.expr("INTERVAL 7 DAY"))
        ).alias("wk"),
    )
    j = spine.join(obs, ["l_suppkey", "wk"], "left")
    w_prev = (
        W.partitionBy("l_suppkey")
        .orderBy("wk")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("l_suppkey")
        .orderBy("wk")
        .rowsBetween(0, W.unboundedFollowing)
    )
    wk_if_obs = F.when(F.col("qty").isNotNull(), F.col("wk"))
    ctx = j.select(
        "l_suppkey",
        "wk",
        "qty",
        F.last("qty", ignorenulls=True).over(w_prev).alias("prev_q"),
        F.last(wk_if_obs, ignorenulls=True).over(w_prev).alias("prev_wk"),
        F.first("qty", ignorenulls=True).over(w_next).alias("next_q"),
        F.first(wk_if_obs, ignorenulls=True).over(w_next).alias("next_wk"),
    )
    frac = F.datediff("wk", "prev_wk").cast("double") / F.datediff(
        "next_wk", "prev_wk"
    ).cast("double")
    filled = F.when(F.col("qty").isNotNull(), F.col("qty")).otherwise(
        F.col("prev_q") + (F.col("next_q") - F.col("prev_q")) * frac
    )
    return ctx.select(
        "l_suppkey",
        "wk",
        F.when(F.col("qty").isNotNull(), F.lit("observed"))
        .otherwise(F.lit("interpolated"))
        .alias("fill_kind"),
        F.round(filled, 4).alias("qty_filled"),
    ).orderBy("l_suppkey", "wk")


_WILSON_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         count(*) AS n_trials,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returns
  FROM lineitem
  GROUP BY 1
  HAVING count(*) >= 5
),
scored AS (
  SELECT l_partkey, n_trials, n_returns,
         CAST(n_returns AS DOUBLE) / CAST(n_trials AS DOUBLE) AS p,
         CAST(n_trials AS DOUBLE) AS n
  FROM per_part
)
SELECT l_partkey, n_trials, n_returns,
       round((p + 1.9208 / n
              - 1.96 * sqrt((p * (1.0 - p) + 0.9604 / n) / n))
             / (1.0 + 3.8416 / n), 6) AS wilson_lower
FROM scored
ORDER BY wilson_lower DESC, l_partkey
LIMIT 50
"""


@_register("wilson_score_ranking", _WILSON_ORACLE)
def wilson_score_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score lower-bound ranking of return rates per part — the
    statistically honest way to rank proportions with unequal sample
    sizes (a 3/3 part must NOT outrank a 95/100 part; the raw ratio says
    it does, the Wilson lower bound says otherwise). One mergeable
    count/sum aggregate per part, then pure scalar math and a top-k —
    nothing wide after the aggregate at any scale. z=1.96 constants are
    pre-squared literals (1.9208 = z²/2, 0.9604 = z²/4, 3.8416 = z²);
    sqrt is correctly-rounded IEEE in both engines and every input
    derives from exact integer counts, so the rounded bound is
    bit-identical cross-engine. Deterministic ordering via the partkey
    tiebreak."""
    per_part = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_trials"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("n_returns"),
        )
        .filter(F.col("n_trials") >= 5)
    )
    p = F.col("n_returns").cast("double") / F.col("n_trials").cast("double")
    n = F.col("n_trials").cast("double")
    lower = (
        p
        + F.lit(1.9208) / n
        - F.lit(1.96) * F.sqrt((p * (F.lit(1.0) - p) + F.lit(0.9604) / n) / n)
    ) / (F.lit(1.0) + F.lit(3.8416) / n)
    return (
        per_part.select(
            "l_partkey",
            "n_trials",
            "n_returns",
            F.round(lower, 6).alias("wilson_lower"),
        )
        .orderBy(F.col("wilson_lower").desc(), "l_partkey")
        .limit(50)
    )


_ATTRIB_ORACLE = """
WITH purchases AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
),
matched AS (
  SELECT p.event_id, p.value, c.click_ts,
         count(c.click_ts) OVER (PARTITION BY p.event_id) AS n_clicks
  FROM purchases p
  LEFT JOIN clicks c
    ON c.user_id = p.user_id
   AND c.click_ts < p.ts
   AND c.click_ts >= p.ts - INTERVAL 7 DAY
),
credits AS (
  SELECT CASE WHEN click_ts IS NULL THEN 'direct'
              ELSE 'day_' || CAST(EXTRACT(isodow FROM click_ts) AS VARCHAR)
         END AS channel,
         CASE WHEN click_ts IS NULL THEN round(value, 6)
              ELSE round(value / n_clicks, 6) END AS credit
  FROM matched
)
SELECT channel,
       count(*) AS n_credits,
       CAST(round(sum(CAST(credit AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS credited_value
FROM credits
GROUP BY channel
ORDER BY channel
"""


@_register("attribution_linear_credit", _ATTRIB_ORACLE)
def attribution_linear_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) marketing attribution: each purchase's value
    is divided evenly across the user's clicks in the preceding 7 days;
    purchases with no qualifying click credit a 'direct' channel —
    the multi-touch sibling of `asof_join_attribution` (last-touch).
    The click↔purchase match is an equi hash join on user_id with the
    time window as a residual filter (never a time-cross-product), and
    the per-purchase click count is a window over the join output keyed
    by purchase id — one extra shuffle, no driver loop. Per-row credit
    rounds BEFORE the decimal re-sum so the rollup is order-independent
    and bit-stable cross-engine. Channels here are click weekdays
    (ISO), standing in for the campaign dimension a real pipeline
    would join."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts")
    )
    matched = purchases.join(
        clicks,
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("click_ts") < F.col("ts"))
        & (F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY")),
        "left",
    ).select(
        "event_id",
        "value",
        "click_ts",
        F.count("click_ts").over(W.partitionBy("event_id")).alias("n_clicks"),
    )
    # ISO weekday: Spark's dayofweek() is 1=Sunday; derive ISO (1=Monday)
    # portably as ((dayofweek + 5) % 7) + 1 on both engines' shared data.
    iso_dow = ((F.dayofweek("click_ts") + F.lit(5)) % F.lit(7)) + F.lit(1)
    channel = F.when(F.col("click_ts").isNull(), F.lit("direct")).otherwise(
        F.concat(F.lit("day_"), iso_dow.cast("string"))
    )
    credit = F.when(
        F.col("click_ts").isNull(), F.round(F.col("value"), 6)
    ).otherwise(F.round(F.col("value") / F.col("n_clicks"), 6))
    return (
        matched.select(channel.alias("channel"), credit.alias("credit"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.round(F.sum(F.col("credit").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("credited_value"),
        )
        .orderBy("channel")
    )


_MOMENTS_ORACLE = """
WITH p AS (
  SELECT l_returnflag,
         CAST(l_quantity AS DECIMAL(9,2)) AS x
  FROM lineitem
),
sums AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS s1,
         CAST(sum(CAST(x * x AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS s2,
         CAST(sum(CAST(x * x * x AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS s3,
         CAST(sum(CAST(x * x * x * x AS DECIMAL(38,8))) AS DECIMAL(38,8))
           AS s4
  FROM p GROUP BY 1
),
mom AS (
  SELECT l_returnflag, n,
         CAST(s1 AS DOUBLE) / n AS m1,
         CAST(s2 AS DOUBLE) / n AS r2,
         CAST(s3 AS DOUBLE) / n AS r3,
         CAST(s4 AS DOUBLE) / n AS r4
  FROM sums
)
SELECT l_returnflag, n,
       round(m1, 6) AS mean_qty,
       round(r2 - m1 * m1, 6) AS var_pop,
       round((r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1)
             / power(r2 - m1 * m1, 1.5), 6) AS skewness,
       round((r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
              - 3.0 * m1 * m1 * m1 * m1)
             / ((r2 - m1 * m1) * (r2 - m1 * m1)) - 3.0, 6)
         AS excess_kurtosis
FROM mom
ORDER BY l_returnflag
"""


@_register("distribution_moments_skew_kurt", _MOMENTS_ORACLE)
def distribution_moments_skew_kurt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Skewness and excess kurtosis per group from EXACT raw power sums —
    the mergeable-moments shape: one hash aggregate collects Σx, Σx²,
    Σx³, Σx⁴ in decimal (order-independent, partial-merge-safe), then
    pure scalar double math derives the central moments. This is how a
    100 TB profiler ships higher moments — four extra decimal sums
    riding the aggregate it already runs, not a second variance pass and
    never engine-ordered float accumulation (Spark's skewness()/
    kurtosis() builtins drift with partitioning; this formulation is
    bit-stable cross-engine because every division starts from identical
    exact decimals). Quantity is 2-dp bounded so x⁴ fits DECIMAL(36,8)
    without overflow on either engine's int128 path."""
    x = F.col("l_quantity").cast("decimal(9,2)")
    sums = (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", x.alias("x"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast("decimal(38,8)")).cast("decimal(38,8)").alias("s1"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,8)"))
            .cast("decimal(38,8)")
            .alias("s2"),
            F.sum((F.col("x") * F.col("x") * F.col("x")).cast("decimal(38,8)"))
            .cast("decimal(38,8)")
            .alias("s3"),
            F.sum(
                (F.col("x") * F.col("x") * F.col("x") * F.col("x")).cast(
                    "decimal(38,8)"
                )
            )
            .cast("decimal(38,8)")
            .alias("s4"),
        )
    )
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    var_pop = r2 - m1 * m1
    skew = (r3 - F.lit(3.0) * m1 * r2 + F.lit(2.0) * m1 * m1 * m1) / F.pow(
        var_pop, F.lit(1.5)
    )
    kurt = (
        r4
        - F.lit(4.0) * m1 * r3
        + F.lit(6.0) * m1 * m1 * r2
        - F.lit(3.0) * m1 * m1 * m1 * m1
    ) / (var_pop * var_pop) - F.lit(3.0)
    return sums.select(
        "l_returnflag",
        "n",
        F.round(m1, 6).alias("mean_qty"),
        F.round(var_pop, 6).alias("var_pop"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
    ).orderBy("l_returnflag")


_FEATSCALE_ORACLE = """
WITH base AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(CAST(c_acctbal AS DECIMAL(19,4)), 2) AS DOUBLE) AS bal
  FROM customer
),
stats AS (
  SELECT c_custkey, c_mktsegment, bal,
         min(bal) OVER (PARTITION BY c_mktsegment) AS mn,
         max(bal) OVER (PARTITION BY c_mktsegment) AS mx,
         rank() OVER (PARTITION BY c_mktsegment ORDER BY bal) AS rk,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM base
)
SELECT c_custkey, c_mktsegment, bal,
       round(CASE WHEN mx = mn THEN 0.5
                  ELSE (bal - mn) / (mx - mn) END, 6) AS minmax_scaled,
       round(CASE WHEN n = 1 THEN 0.5
                  ELSE CAST(rk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END, 6)
         AS pct_rank
FROM stats
ORDER BY c_custkey
"""


@_register("feature_scaling_matrix", _FEATSCALE_ORACLE)
def feature_scaling_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature scaling for ML feature prep: min-max scaling and
    rank-based quantile transform (percent-rank with min-rank ties) per
    market segment, side by
    side with the raw value. All four window aggregates (min, max, rank,
    count) share ONE (segment) shuffle — Catalyst stacks them in a
    single Window operator pair, so the transform costs one exchange at
    any scale; the z-score sibling lives in `outlier_zscore_by_group`.
    Balances are 2-dp, so (bal-mn) is exact and the scaled ratios divide
    identical doubles cross-engine; degenerate groups (constant value or
    a single row) pin to 0.5 instead of dividing by zero."""
    base = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal").cast("decimal(19,4)"), 2)
        .cast("double")
        .alias("bal"),
    )
    wseg = W.partitionBy("c_mktsegment")
    worder = wseg.orderBy("bal")
    stats = base.select(
        "c_custkey",
        "c_mktsegment",
        "bal",
        F.min("bal").over(wseg).alias("mn"),
        F.max("bal").over(wseg).alias("mx"),
        F.rank().over(worder).alias("rk"),
        F.count(F.lit(1)).over(wseg).alias("n"),
    )
    minmax = F.when(F.col("mx") == F.col("mn"), F.lit(0.5)).otherwise(
        (F.col("bal") - F.col("mn")) / (F.col("mx") - F.col("mn"))
    )
    pct = F.when(F.col("n") == 1, F.lit(0.5)).otherwise(
        (F.col("rk") - 1).cast("double") / (F.col("n") - 1).cast("double")
    )
    return stats.select(
        "c_custkey",
        "c_mktsegment",
        "bal",
        F.round(minmax, 6).alias("minmax_scaled"),
        F.round(pct, 6).alias("pct_rank"),
    ).orderBy("c_custkey")


_FIFO_ORACLE = """
WITH ship AS (
  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_end
  FROM lineitem
  WHERE l_returnflag <> 'R' AND l_partkey % 5 = 0
),
ret AS (
  SELECT l_partkey, l_orderkey, l_linenumber,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_end
  FROM lineitem
  WHERE l_returnflag = 'R' AND l_partkey % 5 = 0
),
matched AS (
  SELECT r.l_partkey, r.l_orderkey AS ret_orderkey,
         r.l_linenumber AS ret_linenumber, r.qty AS ret_qty,
         s.l_shipdate,
         least(s.cum_end, r.cum_end)
           - greatest(s.cum_end - s.qty, r.cum_end - r.qty) AS matched_units
  FROM ret r
  JOIN ship s
    ON s.l_partkey = r.l_partkey
   AND s.cum_end - s.qty < r.cum_end
   AND r.cum_end - r.qty < s.cum_end
)
SELECT l_partkey, ret_orderkey, ret_linenumber, ret_qty,
       count(*) AS n_src_shipments,
       CAST(sum(matched_units) AS BIGINT) AS matched_units,
       min(l_shipdate) AS first_src_ship,
       max(l_shipdate) AS last_src_ship
FROM matched
GROUP BY l_partkey, ret_orderkey, ret_linenumber, ret_qty
ORDER BY l_partkey, ret_orderkey, ret_linenumber
"""


@_register("fifo_unit_range_matching", _FIFO_ORACLE)
def fifo_unit_range_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO allocation as an interval-overlap join — the inventory /
    cost-basis matching operator (match each return's units against the
    oldest unmatched shipped units of the same part) with NO loop and NO
    UDF: a window cumsum turns each side's FIFO queue into half-open
    unit ranges [cum−qty, cum) on a shared per-part number line, and
    FIFO matching becomes range intersection — an equi hash join on
    partkey with the overlap test as a residual filter, matched units =
    exact integer overlap length. Each side costs ONE (part) shuffle for
    its cumsum; the join re-uses that partitioning, so a 100 TB ledger
    pays two window passes and one co-partitioned join. Per-key blowup
    is bounded: a return overlaps at most (its span ÷ min shipment size)
    shipments, the same locality a streaming FIFO matcher would have.
    Quantities are integral by data contract (cast asserted by the ANSI
    bigint cast), so every output is exact. Provenance per return row:
    how many source shipments it drew from and their date span."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 5 == 0)
    order = ["l_shipdate", "l_orderkey", "l_linenumber"]

    def ranged(df: DataFrame) -> DataFrame:
        w = (
            W.partitionBy("l_partkey")
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        qty = F.col("l_quantity").cast("bigint")
        return df.select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            qty.alias("qty"),
            F.sum(qty).over(w).cast("bigint").alias("cum_end"),
        )

    ship = ranged(li.filter(F.col("l_returnflag") != "R")).select(
        F.col("l_partkey").alias("s_partkey"),
        F.col("l_shipdate").alias("s_shipdate"),
        F.col("qty").alias("s_qty"),
        F.col("cum_end").alias("s_end"),
    )
    ret = ranged(li.filter(F.col("l_returnflag") == "R")).select(
        "l_partkey",
        F.col("l_orderkey").alias("ret_orderkey"),
        F.col("l_linenumber").alias("ret_linenumber"),
        F.col("qty").alias("ret_qty"),
        F.col("cum_end").alias("r_end"),
    )
    matched = ret.join(
        ship,
        (F.col("s_partkey") == F.col("l_partkey"))
        & (F.col("s_end") - F.col("s_qty") < F.col("r_end"))
        & (F.col("r_end") - F.col("ret_qty") < F.col("s_end")),
    ).select(
        "l_partkey",
        "ret_orderkey",
        "ret_linenumber",
        "ret_qty",
        "s_shipdate",
        (
            F.least("s_end", "r_end")
            - F.greatest(
                F.col("s_end") - F.col("s_qty"),
                F.col("r_end") - F.col("ret_qty"),
            )
        ).alias("matched_units"),
    )
    return (
        matched.groupBy(
            "l_partkey", "ret_orderkey", "ret_linenumber", "ret_qty"
        )
        .agg(
            F.count(F.lit(1)).alias("n_src_shipments"),
            F.sum("matched_units").cast("bigint").alias("matched_units"),
            F.min("s_shipdate").alias("first_src_ship"),
            F.max("s_shipdate").alias("last_src_ship"),
        )
        .orderBy("l_partkey", "ret_orderkey", "ret_linenumber")
    )


_TWAP_ORACLE = """
WITH seg AS (
  SELECT user_id, value,
         CAST(date_diff('second', ts,
              lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           AS BIGINT) AS dt_s
  FROM events
),
held AS (
  SELECT user_id, value, dt_s FROM seg WHERE dt_s IS NOT NULL
)
SELECT user_id,
       count(*) AS n_segments,
       CAST(sum(dt_s) AS BIGINT) AS held_seconds,
       CAST(round(
         sum(CAST(round(value, 6) AS DECIMAL(38,6)) * dt_s)
         / sum(dt_s), 6) AS DOUBLE) AS twap
FROM held
GROUP BY user_id
ORDER BY user_id
"""


@_register("time_weighted_average", _TWAP_ORACLE)
def time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation's value is held
    until the user's next event, so the mean weights every value by its
    holding duration — the correct average for irregularly-sampled
    series (sensor readings, prices, account balances), where the plain
    mean over-counts burst periods. ONE lead() window turns events into
    (value, duration) segments — a single shuffle on the key — and the
    rest is a mergeable hash aggregate; the final open-ended segment is
    excluded by contract. Durations are exact integer seconds and values
    quantize to DECIMAL(38,6) before the value×time products, so the
    weighted sums are order-independent and the rounded quotient is
    bit-stable cross-engine. At 100 TB nothing here is wider than the
    per-key sort the lag family already pays."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seg = _t(spark, sf_dir, "events").select(
        "user_id",
        "value",
        (
            F.unix_timestamp(F.lead("ts").over(w))
            - F.unix_timestamp("ts")
        )
        .cast("bigint")
        .alias("dt_s"),
    )
    held = seg.filter(F.col("dt_s").isNotNull())
    vdec = F.round("value", 6).cast("decimal(38,6)")
    return (
        held.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dt_s").cast("bigint").alias("held_seconds"),
            F.round(
                F.sum(vdec * F.col("dt_s")) / F.sum("dt_s"), 6
            )
            .cast("double")
            .alias("twap"),
        )
        .orderBy("user_id")
    )


_JOURNEY_ORACLE = """
WITH paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS journey
  FROM events
  GROUP BY user_id
)
SELECT journey, count(*) AS n_users
FROM paths
GROUP BY journey
ORDER BY n_users DESC, journey
LIMIT 25
"""


@_register("journey_path_signatures", _JOURNEY_ORACLE)
def journey_path_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral journey mining: each user's full event sequence is
    compressed to an ordered path signature ('view>click>purchase>...')
    and identical journeys are counted — the input to funnel discovery
    and Markov-chain UX models (`event_funnel_conversion` checks ONE
    path; this surfaces which paths exist). The ordered concat is
    collect_list of (ts, event_id, type) structs + array_sort +
    transform + array_join — all JVM codegen, the struct sort giving the
    same deterministic (ts, event_id) order DuckDB's ORDER BY string_agg
    uses. One shuffle on user_id; per-key memory is the user's own event
    count (the per-key bound every sessionizer already accepts), and the
    signature rollup is a tiny second aggregate over distinct paths."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    paths = (
        e.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("journey")
        )
    )
    return (
        paths.groupBy("journey")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "journey")
        .limit(25)
    )


_AUTOCORR_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS x
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, x,
         lag(x) OVER (PARTITION BY event_type ORDER BY d) AS x1,
         lag(x, 7) OVER (PARTITION BY event_type ORDER BY d) AS x7
  FROM daily
)
SELECT event_type,
       count(*) AS n_days,
       round((count(x1) * sum(x * x1) - sum(CASE WHEN x1 IS NOT NULL THEN x END) * sum(x1))
             / (sqrt(count(x1) * sum(CASE WHEN x1 IS NOT NULL THEN x * x END)
                     - sum(CASE WHEN x1 IS NOT NULL THEN x END)
                       * sum(CASE WHEN x1 IS NOT NULL THEN x END))
                * sqrt(count(x1) * sum(x1 * x1) - sum(x1) * sum(x1))),
             6) AS acf_lag1,
       round((count(x7) * sum(x * x7) - sum(CASE WHEN x7 IS NOT NULL THEN x END) * sum(x7))
             / (sqrt(count(x7) * sum(CASE WHEN x7 IS NOT NULL THEN x * x END)
                     - sum(CASE WHEN x7 IS NOT NULL THEN x END)
                       * sum(CASE WHEN x7 IS NOT NULL THEN x END))
                * sqrt(count(x7) * sum(x7 * x7) - sum(x7) * sum(x7))),
             6) AS acf_lag7
FROM lagged
GROUP BY event_type
ORDER BY event_type
"""


@_register("autocorrelation_lag_k", _AUTOCORR_ORACLE)
def autocorrelation_lag_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of daily event volume per type —
    the seasonality diagnostic that decides whether `seasonal_anomaly_
    days`'s weekday partitioning is warranted (high lag-7 ACF = weekly
    cycle). No self-join: lag() pairs each day with its k-back neighbor
    in the SAME window pass, then Pearson r comes from six exact integer
    sums per lag (the paired-moments formulation over the non-null
    pairs) — one shuffle on the tiny per-type daily rollup, scalar math
    after. Counts are exact integers so both engines' doubles agree
    bit-for-bit; sqrt is IEEE correctly-rounded in both."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = W.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    )

    def acf(xl: str):
        xlc = F.col(xl)
        present = xlc.isNotNull()
        n = F.count(xl)
        sx = F.sum(F.when(present, F.col("x")))
        sxx = F.sum(F.when(present, F.col("x") * F.col("x")))
        sl = F.sum(xlc)
        sll = F.sum(xlc * xlc)
        sxl = F.sum(F.col("x") * xlc)
        num = n * sxl - sx * sl
        den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * sll - sl * sl)
        return F.round(num / den, 6)

    return (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            acf("x1").alias("acf_lag1"),
            acf("x7").alias("acf_lag7"),
        )
        .orderBy("event_type")
    )


_FUNNEL_LATENCY_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'click'
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
),
lat AS (
  SELECT s1.user_id,
         CAST(date_diff('second', s1.t1, s2.t2) AS BIGINT) AS view_to_click_s,
         CAST(date_diff('second', s2.t2, s3.t3) AS BIGINT) AS click_to_buy_s
  FROM s1 JOIN s2 ON s2.user_id = s1.user_id
          JOIN s3 ON s3.user_id = s1.user_id
)
SELECT 'view_to_click' AS step, count(*) AS n_users,
       CAST(min(view_to_click_s) AS BIGINT) AS min_s,
       round(quantile_cont(view_to_click_s, 0.5), 4) AS p50_s,
       round(quantile_cont(view_to_click_s, 0.9), 4) AS p90_s,
       CAST(max(view_to_click_s) AS BIGINT) AS max_s
FROM lat
UNION ALL
SELECT 'click_to_buy', count(*),
       CAST(min(click_to_buy_s) AS BIGINT),
       round(quantile_cont(click_to_buy_s, 0.5), 4),
       round(quantile_cont(click_to_buy_s, 0.9), 4),
       CAST(max(click_to_buy_s) AS BIGINT)
FROM lat
ORDER BY step
"""


@_register("funnel_conversion_latency", _FUNNEL_LATENCY_ORACLE)
def funnel_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the ordered funnel: among users
    who completed view→click→purchase (same sequencing constraint as
    `event_funnel_conversion`), the per-hop latency percentiles — the
    metric that turns a funnel COUNT into a funnel SLA ('median user
    clicks within N minutes of first view'). Step times come from the
    funnel's own semi-join-pruned min-aggregates (each step scans only
    the previous step's survivors); latencies are exact integer seconds
    and `percentile` == DuckDB `quantile_cont` (both linear
    interpolation on exact ints), so the rounded quantiles are
    bit-stable. The full-converter frame is |users| rows — the
    percentile runs on a key-less aggregate of a tiny frame, not on the
    raw stream."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    lat = (
        s1.join(s2, "user_id")
        .join(s3, "user_id")
        .select(
            (F.unix_timestamp("t2") - F.unix_timestamp("t1"))
            .cast("bigint")
            .alias("view_to_click_s"),
            (F.unix_timestamp("t3") - F.unix_timestamp("t2"))
            .cast("bigint")
            .alias("click_to_buy_s"),
        )
        .localCheckpoint(eager=False)
    )

    def stats(col: str, label: str) -> DataFrame:
        return lat.agg(
            F.lit(label).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
            F.min(col).cast("bigint").alias("min_s"),
            F.round(F.expr(f"percentile({col}, 0.5)"), 4).alias("p50_s"),
            F.round(F.expr(f"percentile({col}, 0.9)"), 4).alias("p90_s"),
            F.max(col).cast("bigint").alias("max_s"),
        )

    return (
        stats("view_to_click_s", "view_to_click")
        .unionAll(stats("click_to_buy_s", "click_to_buy"))
        .orderBy("step")
    )


_BITEMPORAL_ORACLE = """
WITH chg AS (
  SELECT user_id, event_type AS state, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type <> 'purchase'
),
scd_v0 AS (
  SELECT user_id, state, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS valid_to
  FROM chg WHERE prev IS NULL OR state <> prev
),
chg1 AS (
  SELECT user_id, event_type AS state, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type NOT IN ('purchase', 'error')
),
scd_v1 AS (
  SELECT user_id, state, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS valid_to
  FROM chg1 WHERE prev IS NULL OR state <> prev
),
asof0 AS (
  SELECT state, count(*) AS n_users FROM scd_v0
  WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
    AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
  GROUP BY state
),
asof1 AS (
  SELECT state, count(*) AS n_users FROM scd_v1
  WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
    AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
  GROUP BY state
)
SELECT coalesce(a0.state, a1.state) AS state,
       CAST(coalesce(a0.n_users, 0) AS BIGINT) AS n_users_tx0,
       CAST(coalesce(a1.n_users, 0) AS BIGINT) AS n_users_tx1
FROM asof0 a0 FULL OUTER JOIN asof1 a1 ON a1.state = a0.state
ORDER BY state
"""


@_register("bitemporal_zone_query", _BITEMPORAL_ORACLE)
def bitemporal_zone_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bi-temporal query: VALID time (the SCD2 dimension's [valid_from,
    valid_to) intervals) crossed with TRANSACTION time (the versioned
    zone's immutable snapshots). The SCD2 user-state dimension is
    published as zone v0; a retroactive data-quality correction (drop
    'error' state transitions and recompute validity) republishes as
    v1; then ONE valid-time instant is asked of BOTH transaction
    versions — 'what did we believe on publish 0 vs publish 1 about who
    was in state S at T?' — the audit/backtest query a versioned
    lakehouse exists to answer, impossible without snapshot-isolated
    versions. Each snapshot read is a plain pruned parquet scan of its
    immutable v-dir; the valid-time filter is a scan predicate; the
    final reconciliation is a tiny full-outer join on state
    (sources/io.publish_zone_version, read_zone_snapshot; reference
    lakehouse intent: scripts/convert_to_delta.py)."""
    import os
    import shutil
    import tempfile
    import uuid

    from nyc_taxi_data_pipeline_spark.operators.warehouse import (
        scd2_from_changelog,
    )
    from nyc_taxi_data_pipeline_spark.sources.io import (
        publish_zone_version,
        read_zone_snapshot,
    )

    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )

    def scd(changes: DataFrame) -> DataFrame:
        return scd2_from_changelog(
            changes,
            key="user_id",
            ts_col="ts",
            attr_col="event_type",
            tiebreak_col="event_id",
        ).select(
            "user_id",
            F.col("event_type").alias("state"),
            "valid_from",
            "valid_to",
        )

    zone = os.path.join(
        tempfile.gettempdir(), f"bitemporal_{uuid.uuid4().hex[:12]}"
    )
    try:
        v0 = publish_zone_version(
            scd(e.filter(F.col("event_type") != "purchase")), zone
        )
        v1 = publish_zone_version(
            scd(e.filter(~F.col("event_type").isin("purchase", "error"))),
            zone,
        )
        t = F.lit("2024-01-15 00:00:00").cast("timestamp")

        def asof(version: int, out: str) -> DataFrame:
            snap = read_zone_snapshot(spark, zone, version)
            return (
                snap.filter(
                    (F.col("valid_from") <= t)
                    & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
                )
                .groupBy("state")
                .agg(F.count(F.lit(1)).cast("bigint").alias(out))
            )

        merged = (
            asof(v0, "n_users_tx0")
            .join(asof(v1, "n_users_tx1"), "state", "full_outer")
            .select(
                "state",
                F.coalesce("n_users_tx0", F.lit(0)).cast("bigint").alias("n_users_tx0"),
                F.coalesce("n_users_tx1", F.lit(0)).cast("bigint").alias("n_users_tx1"),
            )
            .orderBy("state")
        )
        out = spark.createDataFrame(merged.collect(), merged.schema)
    finally:
        shutil.rmtree(zone, ignore_errors=True)
    return out


_CORRMAT_ORACLE = """
WITH v AS (
  SELECT CAST(l_quantity AS DECIMAL(19,4)) AS q,
         CAST(l_extendedprice AS DECIMAL(19,4)) AS p,
         CAST(l_discount AS DECIMAL(19,4)) AS d,
         CAST(l_tax AS DECIMAL(19,4)) AS t
  FROM lineitem
),
sums AS (
  SELECT count(*) AS n,
         CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(p) AS DOUBLE) AS sp,
         CAST(sum(d) AS DOUBLE) AS sd, CAST(sum(t) AS DOUBLE) AS st,
         CAST(sum(q*q) AS DOUBLE) AS sqq, CAST(sum(p*p) AS DOUBLE) AS spp,
         CAST(sum(d*d) AS DOUBLE) AS sdd, CAST(sum(t*t) AS DOUBLE) AS stt,
         CAST(sum(q*p) AS DOUBLE) AS sqp, CAST(sum(q*d) AS DOUBLE) AS sqd,
         CAST(sum(q*t) AS DOUBLE) AS sqt, CAST(sum(p*d) AS DOUBLE) AS spd,
         CAST(sum(p*t) AS DOUBLE) AS spt, CAST(sum(d*t) AS DOUBLE) AS sdt
  FROM v
)
SELECT col_a, col_b,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
         AS pearson_r
FROM sums, LATERAL (VALUES
  ('quantity', 'extendedprice', sqp, sq, sp, sqq, spp),
  ('quantity', 'discount',      sqd, sq, sd, sqq, sdd),
  ('quantity', 'tax',           sqt, sq, st, sqq, stt),
  ('extendedprice', 'discount', spd, sp, sd, spp, sdd),
  ('extendedprice', 'tax',      spt, sp, st, spp, stt),
  ('discount', 'tax',           sdt, sd, st, sdd, stt)
) AS pairs(col_a, col_b, sxy, sx, sy, sxx, syy)
ORDER BY col_a, col_b
"""


@_register("correlation_matrix_onepass", _CORRMAT_ORACLE)
def correlation_matrix_onepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise Pearson correlation matrix of four measures in ONE
    aggregate pass: the 14 exact decimal sums (4 first moments, 4
    squares, 6 cross-products) are all partial-merge-safe, so the whole
    4×4 matrix costs a single scan + one tiny reduce at any scale —
    never 6 separate corr() passes, and bit-stable where float corr()
    drifts with partition order (same recipe as
    `distribution_moments_skew_kurt`). The unpivot to (col_a, col_b, r)
    rows happens on the 1-row sums frame. Measures are 2-dp bounded so
    DECIMAL(19,4) products ride DuckDB's int128 path exactly."""
    li = _t(spark, sf_dir, "lineitem")
    cols = {
        "q": "l_quantity",
        "p": "l_extendedprice",
        "d": "l_discount",
        "t": "l_tax",
    }
    v = li.select(
        *[F.col(src).cast("decimal(19,4)").alias(k) for k, src in cols.items()]
    )
    pairs = [("q", "p"), ("q", "d"), ("q", "t"), ("p", "d"), ("p", "t"), ("d", "t")]
    aggs = [F.count(F.lit(1)).alias("n")]
    for k in cols:
        aggs.append(F.sum(F.col(k)).cast("double").alias(f"s_{k}"))
        aggs.append(F.sum(F.col(k) * F.col(k)).cast("double").alias(f"s_{k}{k}"))
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).cast("double").alias(f"s_{a}{b}"))
    sums = v.agg(*aggs)
    label = {
        "q": "quantity",
        "p": "extendedprice",
        "d": "discount",
        "t": "tax",
    }
    n = F.col("n")
    rows = []
    for a, b in pairs:
        sx, sy = F.col(f"s_{a}"), F.col(f"s_{b}")
        sxx, syy = F.col(f"s_{a}{a}"), F.col(f"s_{b}{b}")
        sxy = F.col(f"s_{a}{b}")
        r = (n * sxy - sx * sy) / (
            F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
        )
        rows.append(
            F.struct(
                F.lit(label[a]).alias("col_a"),
                F.lit(label[b]).alias("col_b"),
                F.round(r, 6).alias("pearson_r"),
            )
        )
    return (
        sums.select(F.explode(F.array(*rows)).alias("cell"))
        .select("cell.col_a", "cell.col_b", "cell.pearson_r")
        .orderBy("col_a", "col_b")
    )


_BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS first_digit
  FROM orders
  WHERE o_totalprice >= 1
),
obs AS (
  SELECT first_digit, count(*) AS n_obs FROM digits GROUP BY first_digit
),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
expected(first_digit, p_benford) AS (VALUES
  (1, 0.301030), (2, 0.176091), (3, 0.124939), (4, 0.096910),
  (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
  (9, 0.045757))
SELECT e.first_digit,
       CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs,
       round(CAST(coalesce(o.n_obs, 0) AS DOUBLE) / n, 6) AS p_obs,
       CAST(e.p_benford AS DOUBLE) AS p_benford,
       round(abs(CAST(coalesce(o.n_obs, 0) AS DOUBLE) / n
                 - CAST(e.p_benford AS DOUBLE)), 6) AS abs_dev
FROM expected e
LEFT JOIN obs o ON o.first_digit = e.first_digit
CROSS JOIN tot
ORDER BY e.first_digit
"""


@_register("benford_digit_audit", _BENFORD_ORACLE)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data / unit-mixup screen for financial columns: observed
    leading-digit shares against the log10(1+1/d) expectation, per-digit
    absolute deviation. The Benford constants are pre-rounded LITERALS
    (identical on both engines — no runtime log10, whose last-ulp libm
    differences could straddle a rounding boundary), the digit extract
    is pure integer/string math, and the whole audit is one 9-row
    aggregate joined to a 9-row constant frame — scan-bound at any
    scale. Synthetic uniform prices FAIL Benford loudly (real invoice
    data approximates it), which is exactly what the audit should say
    about uniform data."""
    digits = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("first_digit")
        )
    )
    obs = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n_obs"))
    benford = [
        (1, 0.301030), (2, 0.176091), (3, 0.124939), (4, 0.096910),
        (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
        (9, 0.045757),
    ]
    expected = spark.createDataFrame(benford, ["first_digit", "p_benford"])
    tot = obs.agg(F.sum("n_obs").cast("bigint").alias("n"))
    p_obs = F.coalesce("n_obs", F.lit(0)).cast("double") / F.col("n")
    return (
        expected.join(F.broadcast(obs), "first_digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "first_digit",
            F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
            F.round(p_obs, 6).alias("p_obs"),
            "p_benford",
            F.round(F.abs(p_obs - F.col("p_benford")), 6).alias("abs_dev"),
        )
        .orderBy("first_digit")
    )


_WINSOR_ORACLE = """
WITH base AS (
  SELECT c_mktsegment,
         CAST(round(CAST(c_acctbal AS DECIMAL(19,4)), 2) AS DOUBLE) AS bal
  FROM customer
),
cuts AS (
  SELECT c_mktsegment,
         round(quantile_cont(bal, 0.05), 6) AS p05,
         round(quantile_cont(bal, 0.95), 6) AS p95
  FROM base GROUP BY c_mktsegment
),
clipped AS (
  SELECT b.c_mktsegment,
         CASE WHEN b.bal < c.p05 THEN c.p05
              WHEN b.bal > c.p95 THEN c.p95
              ELSE b.bal END AS wbal,
         CASE WHEN b.bal < c.p05 OR b.bal > c.p95 THEN 1 ELSE 0 END
           AS is_clipped
  FROM base b JOIN cuts c ON c.c_mktsegment = b.c_mktsegment
)
SELECT c_mktsegment,
       count(*) AS n,
       CAST(sum(is_clipped) AS BIGINT) AS n_clipped,
       CAST(round(sum(CAST(round(wbal, 6) AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS winsorized_sum,
       round(min(wbal), 6) AS floor_val,
       round(max(wbal), 6) AS cap_val
FROM clipped
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@_register("winsorize_by_group", _WINSOR_ORACLE)
def winsorize_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization per group — the robust-aggregate prep
    that CLIPS tails instead of dropping them (the outlier entries
    flag; this one repairs): per-segment p05/p95 cut points (exact
    interpolated percentile, Spark `percentile` == DuckDB
    `quantile_cont`) broadcast back onto the rows, values clamped, and
    the winsorized aggregate re-computed with the decimal re-sum recipe
    so totals stay order-independent. Two aggregates + one broadcast
    join — no window over the raw rows, so the clamp costs one scan at
    any scale. Clip counts, cut points, and winsorized totals per
    segment make the entry self-auditing."""
    base = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal").cast("decimal(19,4)"), 2)
        .cast("double")
        .alias("bal"),
    )
    cuts = base.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(bal, 0.05)"), 6).alias("p05"),
        F.round(F.expr("percentile(bal, 0.95)"), 6).alias("p95"),
    )
    clipped = base.join(F.broadcast(cuts), "c_mktsegment").select(
        "c_mktsegment",
        F.when(F.col("bal") < F.col("p05"), F.col("p05"))
        .when(F.col("bal") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("bal"))
        .alias("wbal"),
        F.when(
            (F.col("bal") < F.col("p05")) | (F.col("bal") > F.col("p95")), 1
        )
        .otherwise(0)
        .alias("is_clipped"),
    )
    return (
        clipped.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_clipped").cast("bigint").alias("n_clipped"),
            F.round(F.sum(F.round("wbal", 6).cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("winsorized_sum"),
            F.round(F.min("wbal"), 6).alias("floor_val"),
            F.round(F.max("wbal"), 6).alias("cap_val"),
        )
        .orderBy("c_mktsegment")
    )


_GINI_ORACLE = """
WITH rev AS (
  SELECT c.c_mktsegment, o.o_custkey,
         CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(19,4))), 2)
              AS DOUBLE) AS r
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT c_mktsegment, r,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY r, o_custkey) AS i,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM rev
)
SELECT c_mktsegment,
       CAST(max(n) AS BIGINT) AS n_customers,
       CAST(round(sum(CAST(round(r, 6) AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS total_revenue,
       round(2.0 * sum(i * r) / (max(n) * sum(r))
             - (max(n) + 1.0) / max(n), 6) AS gini
FROM ranked
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@_register("gini_concentration_by_segment", _GINI_ORACLE)
def gini_concentration_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gini concentration of customer revenue per market segment — the
    Lorenz-curve inequality readout ('do 10% of customers carry 90% of
    revenue?'), the same statistic a curation pipeline uses to audit
    source-contribution balance before fixing a dataset mix. Shape: one
    join+agg to per-customer revenue, then ONE partitioned window pass
    (rank within segment by revenue, custkey tiebreak) feeding the
    closed-form rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n — no
    pairwise |xᵢ−xⱼ| join, which is the O(n²) trap. The window
    partitions by segment so no single-partition sort exists; a global
    Gini would reuse `length_bucket_padding`'s tiered-rank trick.
    Ranks are exact integers and revenues exact decimals, so the
    rounded coefficient is bit-stable cross-engine."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(19,4)")), 2)
            .cast("double")
            .alias("r")
        )
    )
    w = W.partitionBy("c_mktsegment").orderBy("r", "o_custkey")
    ranked = rev.select(
        "c_mktsegment",
        "r",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(W.partitionBy("c_mktsegment")).alias("n"),
    )
    n = F.max("n")
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            n.cast("bigint").alias("n_customers"),
            F.round(F.sum(F.round("r", 6).cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("total_revenue"),
            F.round(
                F.lit(2.0) * F.sum(F.col("i") * F.col("r")) / (n * F.sum("r"))
                - (n + F.lit(1.0)) / n,
                6,
            ).alias("gini"),
        )
        .orderBy("c_mktsegment")
    )


_SRM_ORACLE = """
WITH users AS (SELECT DISTINCT user_id FROM events),
assigned AS (
  SELECT user_id,
         CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':exp1'),
                                       1, 15) AS BIGINT) % 100 < 50
              THEN 'control' ELSE 'treatment' END AS variant
  FROM users
),
obs AS (SELECT variant, count(*) AS n_users FROM assigned GROUP BY variant),
tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS n FROM obs)
SELECT variant, CAST(n_users AS BIGINT) AS n_users,
       round(CAST(n_users AS DOUBLE) / n, 6) AS p_obs,
       CAST(0.5 AS DOUBLE) AS p_expected,
       round((n_users - n * 0.5) * (n_users - n * 0.5) / (n * 0.5), 6)
         AS chi2_contrib
FROM obs CROSS JOIN tot
ORDER BY variant
"""


@_register("ab_assignment_srm_check", _SRM_ORACLE)
def ab_assignment_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation surface: deterministic 50/50 variant assignment by
    salted md5 bucket (the same portable hash lane the split/sampling
    entries use — rerun- and engine-stable, no RNG) plus the
    sample-ratio-mismatch health check every A/B platform runs before
    trusting a readout: observed variant shares and per-variant chi²
    contribution against the designed split. Assignment is a pure
    per-row expression (scan-bound; at 100 TB it rides whatever scan
    already touches the users), and the SRM test reduces to a 2-row
    aggregate. Exact integer counts feed the chi² doubles, so values
    are bit-stable cross-engine."""
    users = _t(spark, sf_dir, "events").select("user_id").distinct()
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":exp1"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    assigned = users.select(
        F.when(bucket < 50, "control").otherwise("treatment").alias("variant")
    )
    obs = assigned.groupBy("variant").agg(F.count(F.lit(1)).alias("n_users"))
    tot = obs.agg(F.sum("n_users").cast("bigint").alias("n"))
    dev = F.col("n_users") - F.col("n") * 0.5
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "variant",
            F.col("n_users").cast("bigint").alias("n_users"),
            F.round(F.col("n_users").cast("double") / F.col("n"), 6).alias(
                "p_obs"
            ),
            F.lit(0.5).alias("p_expected"),
            F.round(dev * dev / (F.col("n") * 0.5), 6).alias("chi2_contrib"),
        )
        .orderBy("variant")
    )


_AUDIENCE_OVERLAP_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_both
  FROM ut a JOIN ut b ON b.user_id = a.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
sizes AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1)
SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       round(CAST(p.n_both AS DOUBLE) / (sa.n + sb.n - p.n_both), 6)
         AS jaccard
FROM pairs p JOIN sizes sa ON sa.event_type = p.type_a
             JOIN sizes sb ON sb.event_type = p.type_b
ORDER BY type_a, type_b
"""


@_register("audience_overlap_matrix", _AUDIENCE_OVERLAP_ORACLE)
def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between behaviors: for every pair of event types,
    how many users do BOTH, with the Jaccard affinity — the
    segment-overlap matrix marketing/feature teams read before merging
    audiences (and the exact-set ground truth the minhash estimators
    approximate). Shape: dedup to (user, type) once (checkpointed —
    consumed by the pair join and the size rollup), self-join keyed on
    user_id with the triangular filter, two tiny broadcast joins for the
    set sizes. Pair cardinality per user is C(types,2) ≤ 10 here and
    |types|² regardless of volume, so the only wide cost is the one
    distinct shuffle any audience system already pays."""
    ut = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ===========================================================================
# Round-3 additions: portable pruning/sketch structures + quantized ANN.
# Each is a scale pattern the catalog lacked: a build/probe bloom filter
# (the runtime-filter semi-join prune), a KMV distinct sketch (the
# mergeable-and-PORTABLE alternative to HLL whose estimate itself value-
# checks), and product quantization with ADC scoring (the IVF+PQ memory
# shape real 100 TB vector indexes use).
# ===========================================================================

_BLOOM_ORACLE = """
WITH build AS (
  SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
),
probe AS (SELECT DISTINCT o_custkey AS key FROM orders),
lanes AS (SELECT unnest(range(0, 3)) AS j),
build_bits AS (
  SELECT DISTINCT
         CAST('0x' || substr(md5(j || ':' || key), 1, 8) AS BIGINT)
           % 16384 AS pos
  FROM build, lanes
),
words AS (
  SELECT pos // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS word
  FROM build_bits GROUP BY 1
),
probe_bits AS (
  SELECT p.key, l.j,
         CAST('0x' || substr(md5(l.j || ':' || p.key), 1, 8) AS BIGINT)
           % 16384 AS pos
  FROM probe p, lanes l
),
probe_hits AS (
  SELECT b.key,
         bool_and(COALESCE((w.word >> CAST(b.pos % 32 AS INTEGER)) & 1, 0) = 1)
           AS bloom_pass
  FROM probe_bits b
  LEFT JOIN words w ON w.word_idx = b.pos // 32
  GROUP BY b.key
),
labeled AS (
  SELECT h.key, h.bloom_pass,
         (bl.key IS NOT NULL) AS is_member
  FROM probe_hits h LEFT JOIN build bl ON bl.key = h.key
)
SELECT bloom_pass, is_member,
       count(*) AS n_keys,
       bool_and(bloom_pass OR NOT is_member) AS no_false_negatives
FROM labeled
GROUP BY bloom_pass, is_member
ORDER BY bloom_pass, is_member
"""


@_register("bloom_filter_prune_join", _BLOOM_ORACLE)
def bloom_filter_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable build/probe bloom filter — the runtime-filter semi-join
    prune (Spark's own InjectRuntimeFilter / bloom_filter_agg, rebuilt
    from public md5 arithmetic so the WHOLE structure value-checks
    cross-engine): the build side (one customer segment) hashes each key
    into k=3 positions of an m=16384-bit filter packed 32 bits per
    BIGINT word (≤512 words — broadcast-size forever, independent of
    fact volume); the probe side (distinct order custkeys) tests all k
    bits via a BROADCAST join on word index, never shuffling the fact
    side on the join key — the point of a bloom prune is that fact rows
    that fail are dropped BEFORE the expensive shuffle join. The output
    is the 2×2 (bloom_pass × is_member) confusion table with the bloom
    contract asserted per row: false positives allowed (tunable via m/k;
    ~(1-e^(-kn/m))^k), false negatives IMPOSSIBLE. Scale shape: build =
    one hash-agg into ≤512 words (map-side combine collapses the k·n
    bit stream), probe = broadcast join + bool_and per key; both stay in
    whole-stage codegen."""
    from nyc_taxi_data_pipeline_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    cust = _t(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("key")
    ).localCheckpoint(eager=False)
    probe = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    words = bloom_build(build, "key", m_bits=16384, k=3)
    probe_hits = bloom_probe(probe, words, "key", m_bits=16384, k=3)
    labeled = probe_hits.join(
        F.broadcast(build.withColumn("is_member", F.lit(True))), "key", "left"
    ).withColumn("is_member", F.coalesce(F.col("is_member"), F.lit(False)))
    return (
        labeled.groupBy("bloom_pass", "is_member")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.bool_and(
                F.col("bloom_pass") | ~F.col("is_member")
            ).alias("no_false_negatives"),
        )
        .orderBy("bloom_pass", "is_member")
    )


_KMV_ORACLE = """
WITH h AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT)
           AS hv
  FROM events
),
ranked AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
),
sk AS (
  SELECT event_type, count(*) AS n_kept, max(hv) AS h_k
  FROM ranked WHERE rn <= 64 GROUP BY event_type
),
daily AS (
  SELECT DISTINCT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT)
           AS hv
  FROM events
),
daily_ranked AS (
  SELECT event_type, d, hv,
         row_number() OVER (PARTITION BY event_type, d ORDER BY hv) AS rn
  FROM daily
),
merged AS (
  SELECT DISTINCT event_type, hv FROM daily_ranked WHERE rn <= 64
),
merged_ranked AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM merged
),
msk AS (
  SELECT event_type, max(hv) AS h_k_merged
  FROM merged_ranked WHERE rn <= 64 GROUP BY event_type
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT s.event_type,
       e.exact_distinct,
       CASE WHEN s.n_kept < 64 THEN s.n_kept
            ELSE (63 * 281474976710656) // s.h_k END AS kmv_est,
       CASE WHEN s.n_kept < 64 THEN s.n_kept
            ELSE (63 * 281474976710656) // s.h_k END - e.exact_distinct
         AS est_delta,
       abs(CASE WHEN s.n_kept < 64 THEN s.n_kept
                ELSE (63 * 281474976710656) // s.h_k END
           - e.exact_distinct) * 2 <= e.exact_distinct AS within_50pct,
       m.h_k_merged = s.h_k AS merged_equals_direct
FROM sk s
JOIN msk m ON m.event_type = s.event_type
JOIN exact e ON e.event_type = s.event_type
ORDER BY s.event_type
"""


@_register("kmv_distinct_sketch", _KMV_ORACLE)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, k=64 — the fully
    PORTABLE mergeable distinct estimator (Bar-Yossef et al. 2002;
    Beyer et al. 2007 est = (k-1)·M/h_k): unlike engine-internal HLL
    registers, the sketch is just the k smallest 48-bit md5 values, so
    the ESTIMATE itself carries a value oracle, not merely a tolerance
    flag (companion to `hll_sketch_rollup`/`approx_distinct_sketch`).
    Mergeability is executed, not asserted: daily per-type sketches are
    unioned and re-minned, and `merged_equals_direct` proves the merged
    h_k is IDENTICAL to the single-pass sketch (min-k of a union of
    per-day min-ks == global min-k — the lattice property that makes
    KMV an incremental-rollup citizen). Scale shape: the top-k per
    group is two-level — a salted (group, h%32) rank prunes to ≤64·32
    rows per group BEFORE the per-group rank, so no single task ever
    sorts a whole group's hash stream; everything else is broadcast-
    size. within_50pct is a hard sanity bound (k=64 ⇒ rsd ≈ 12.7%)."""
    from nyc_taxi_data_pipeline_spark.operators.sketch import kmv_topk

    ev = _t(spark, sf_dir, "events")
    sk = kmv_topk(ev, ["event_type"], "user_id", k=64).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("h_k")
    )
    with_day = ev.withColumn(
        "d", F.date_trunc("day", F.col("ts")).cast("date")
    )
    daily_sk = kmv_topk(with_day, ["event_type", "d"], "user_id", k=64).select(
        "event_type", "hv"
    )
    msk = (
        kmv_topk(daily_sk, ["event_type"], "hv", k=64, prehashed=True)
        .groupBy("event_type")
        .agg(F.max("hv").alias("h_k_merged"))
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    est = F.when(F.col("n_kept") < 64, F.col("n_kept")).otherwise(
        F.expr("(63 * 281474976710656) div h_k")
    )
    return (
        sk.join(msk, "event_type")
        .join(exact, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            est.alias("kmv_est"),
            (est - F.col("exact_distinct")).alias("est_delta"),
            (
                F.abs(est - F.col("exact_distinct")) * 2
                <= F.col("exact_distinct")
            ).alias("within_50pct"),
            (F.col("h_k_merged") == F.col("h_k")).alias("merged_equals_direct"),
        )
        .orderBy("event_type")
    )


_PQ_ORACLE = """
WITH qz AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 1000000) AS BIGINT)) AS qv
  FROM embeddings
),
subs AS (SELECT unnest(range(0, 8)) AS sub_id),
cb AS (
  SELECT s.sub_id, q.vec_id AS code_id,
         q.qv[s.sub_id * 8 + 1 : s.sub_id * 8 + 8] AS cv
  FROM qz q, subs s WHERE q.vec_id < 16
),
corpus AS (
  SELECT q.vec_id, s.sub_id,
         q.qv[s.sub_id * 8 + 1 : s.sub_id * 8 + 8] AS sv
  FROM qz q, subs s
),
enc_d AS (
  SELECT c.vec_id, c.sub_id, b.code_id,
         list_sum([ (c.sv[i] - b.cv[i]) * (c.sv[i] - b.cv[i])
                    for i in range(1, 9) ]) AS d2
  FROM corpus c JOIN cb b ON b.sub_id = c.sub_id
),
enc AS (
  SELECT vec_id, sub_id, code_id
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
                                     ORDER BY d2, code_id) AS rn
        FROM enc_d)
  WHERE rn = 1
),
qsubs AS (
  SELECT q.vec_id AS query_id, s.sub_id,
         q.qv[s.sub_id * 8 + 1 : s.sub_id * 8 + 8] AS qsv
  FROM qz q, subs s WHERE q.vec_id % 100 = 0 AND q.vec_id < 2000
),
adc AS (
  SELECT qs.query_id, qs.sub_id, b.code_id,
         list_sum([ (qs.qsv[i] - b.cv[i]) * (qs.qsv[i] - b.cv[i])
                    for i in range(1, 9) ]) AS pdist
  FROM qsubs qs JOIN cb b ON b.sub_id = qs.sub_id
),
scored AS (
  SELECT a.query_id, e.vec_id AS neighbor_id,
         CAST(sum(a.pdist) AS BIGINT) AS adc_d2
  FROM enc e
  JOIN adc a ON a.sub_id = e.sub_id AND a.code_id = e.code_id
  GROUP BY 1, 2
),
top5 AS (
  SELECT query_id, neighbor_id, adc_d2,
         CAST(rn AS INTEGER) AS rank
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_d2, neighbor_id) AS rn
        FROM scored)
  WHERE rn <= 5
)
SELECT t.query_id, t.rank, t.neighbor_id, t.adc_d2,
       CAST(list_sum([ (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])
                       for i in range(1, 65) ]) AS BIGINT) AS exact_d2
FROM top5 t
JOIN qz a ON a.vec_id = t.query_id
JOIN qz b ON b.vec_id = t.neighbor_id
ORDER BY t.query_id, t.rank
"""


@_register("pq_adc_topk", _PQ_ORACLE)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization with asymmetric distance computation (ADC)
    — Jégou et al. 2011, the memory layout real billion-vector indexes
    (FAISS IVF-PQ) use: each 64-dim vector is encoded as m=8 one-byte
    codes (one per 8-dim subspace, nearest of 16 codebook entries), a
    64× compression that lets the candidate set live in RAM at 100 TB;
    queries score candidates by summing m precomputed query-to-centroid
    table entries instead of touching raw vectors. All arithmetic is
    exact micro-unit integer L2², so encode argmins and ADC rankings
    are bit-stable and the entry carries a full value oracle (the
    demo codebook is the first 16 vectors per subspace — production
    trains it with the k-means step in `centroid_assign_quantized`).
    Scale shape: codebooks pack to 8 rows (broadcast); corpus ENCODE is
    a broadcast join + higher-order-function argmin — ZERO shuffles over
    the corpus; the query panel is a FIXED id set (vec_id % 100 == 0
    AND vec_id < 2000) so scoring stays linear in the corpus; ADC
    tables are |Q|·m·16 rows (broadcast); the only wide
    stage is the per-(query, candidate) partial-distance rollup, linear
    in candidates·m. exact_d2 for the surfaced top-5 quantifies the
    quantization error ADC trades for memory."""
    emb = _t(spark, sf_dir, "embeddings")
    qemb = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * 1000000).cast("long"),
        ).alias("qv"),
    ).localCheckpoint(eager=False)
    sub_ids = F.explode(F.array([F.lit(s) for s in range(8)])).alias("sub_id")

    def _d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    cb = (
        qemb.filter(F.col("vec_id") < 16)
        .select(F.col("vec_id").alias("code_id"), "qv", sub_ids)
        .select("code_id", "sub_id", F.expr("slice(qv, sub_id*8+1, 8)").alias("cv"))
    )
    cb_packed = (
        cb.groupBy("sub_id")
        .agg(F.sort_array(F.collect_list(F.struct("code_id", "cv"))).alias("codes"))
        .localCheckpoint(eager=False)
    )
    corpus = qemb.select("vec_id", "qv", sub_ids).select(
        "vec_id", "sub_id", F.expr("slice(qv, sub_id*8+1, 8)").alias("sv")
    )
    enc = (
        corpus.join(F.broadcast(cb_packed), "sub_id")
        .select(
            "vec_id",
            "sub_id",
            F.array_min(
                F.transform(
                    F.col("codes"),
                    lambda c: F.struct(
                        _d2(F.col("sv"), c["cv"]).alias("d2"),
                        c["code_id"].alias("code_id"),
                    ),
                )
            )["code_id"].alias("code_id"),
        )
    )
    qsubs = (
        qemb.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
        .select(F.col("vec_id").alias("query_id"), "qv", sub_ids)
        .select("query_id", "sub_id", F.expr("slice(qv, sub_id*8+1, 8)").alias("qsv"))
    )
    adc = (
        qsubs.join(F.broadcast(cb_packed), "sub_id")
        .select("query_id", "sub_id", "qsv", F.explode("codes").alias("c"))
        .select(
            "query_id",
            "sub_id",
            F.col("c.code_id").alias("code_id"),
            _d2(F.col("qsv"), F.col("c.cv")).alias("pdist"),
        )
    )
    w = W.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    top5 = (
        enc.join(F.broadcast(adc), ["sub_id", "code_id"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pdist").cast("long").alias("adc_d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    qa = qemb.select(F.col("vec_id").alias("query_id"), F.col("qv").alias("a_qv"))
    qb = qemb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("b_qv")
    )
    return (
        top5.join(qa, "query_id")
        .join(qb, "neighbor_id")
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            "adc_d2",
            _d2(F.col("a_qv"), F.col("b_qv")).cast("long").alias("exact_d2"),
        )
        .orderBy("query_id", "rank")
    )


_JL_ORACLE = """
WITH qz AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 1000000) AS BIGINT)) AS qv
  FROM embeddings
),
dims AS (SELECT unnest(range(0, 64)) AS d),
outdims AS (SELECT unnest(range(0, 16)) AS p),
r AS (
  SELECT d, p,
         CASE CAST('0x' || substr(md5(d || ':' || p), 1, 8) AS BIGINT) % 6
              WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS rv
  FROM dims, outdims
),
proj AS (
  SELECT q.vec_id, r.p,
         CAST(sum(q.qv[r.d + 1] * r.rv) AS BIGINT) AS y
  FROM qz q JOIN r ON r.rv <> 0
  GROUP BY q.vec_id, r.p
),
pvec AS (
  SELECT vec_id, list(y ORDER BY p) AS pv FROM proj GROUP BY vec_id
),
queries AS (SELECT vec_id AS query_id, pv AS qpv FROM pvec
            WHERE vec_id % 100 = 0 AND vec_id < 2000),
proj_top AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_sum([ (q.qpv[i] - c.pv[i]) * (q.qpv[i] - c.pv[i])
                                 for i in range(1, 17) ]), c.vec_id) AS rn
    FROM queries q CROSS JOIN pvec c
  ) WHERE rn <= 5
),
exact_top AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_sum([ (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])
                                 for i in range(1, 65) ]), b.vec_id) AS rn
    FROM qz a CROSS JOIN qz b
    WHERE a.vec_id % 100 = 0 AND a.vec_id < 2000
  ) WHERE rn <= 5
)
SELECT e.query_id,
       count(*)                       AS n_exact,
       count(p.neighbor_id)           AS n_hits,
       count(p.neighbor_id) * 20      AS recall_pct
FROM exact_top e
LEFT JOIN proj_top p ON p.query_id = e.query_id
                    AND p.neighbor_id = e.neighbor_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


@_register("jl_projection_recall", _JL_ORACLE)
def jl_projection_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64→16 dims with the
    Achlioptas (2003) sparse matrix — entries {+1, −1, 0} with
    P(±1)=1/6, md5-derived so BOTH engines build the identical matrix —
    then top-5 neighbor recall of the projected space against exact
    full-dimension L2. The LLM-pipeline use: 4× cheaper distance math
    and 4× smaller vectors for the candidate-generation tier of
    embedding dedup/ANN (a denser-math alternative to the hyperplane
    LSH family already in `operators/similarity`), with quality
    REPORTED as measured recall instead of asserted. Integer micro-unit
    arithmetic end-to-end makes ranks bit-stable (ties broken by id) so
    even the recall percentages carry a full value oracle. Scale shape:
    the projection matrix is 1024 literal-derived rows (broadcast,
    ~2/3 pruned as zero); projecting is one narrow join + a
    (vec, out-dim) rollup — linear in corpus size; the demo scoring
    tier is brute-force over the projected vectors (queries broadcast),
    standing in for the LSH/IVF candidate tiers benchmarked in their
    own entries. The query panel is a FIXED id set (vec_id % 100 == 0
    AND vec_id < 2000): recall estimation needs a constant-size sample,
    not a panel that grows with the corpus, so scoring stays
    O(corpus · |panel|) — linear at 5× volume instead of quadratic."""
    emb = _t(spark, sf_dir, "embeddings")
    qemb = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * 1000000).cast("long"),
        ).alias("qv"),
    ).localCheckpoint(eager=False)
    r = (
        spark.range(64)
        .select(F.col("id").cast("int").alias("d"))
        .crossJoin(spark.range(16).select(F.col("id").cast("int").alias("p")))
        .select(
            "d",
            "p",
            F.expr(
                "CASE CAST(conv(substr(md5(d || ':' || p), 1, 8), 16, 10)"
                " AS BIGINT) % 6 WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END"
            ).alias("rv"),
        )
        .filter(F.col("rv") != 0)
    )
    proj = (
        qemb.select("vec_id", F.posexplode("qv").alias("d", "x"))
        .join(F.broadcast(r), "d")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("x") * F.col("rv")).cast("long").alias("y"))
    )
    pvec = (
        proj.groupBy("vec_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("p", "y"))), lambda s: s["y"]
            ).alias("pv")
        )
        .localCheckpoint(eager=False)
    )

    def _d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    queries = pvec.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("pv").alias("qpv")
    )
    wq = W.partitionBy("query_id").orderBy("pd2", "neighbor_id")
    proj_top = (
        pvec.crossJoin(F.broadcast(queries))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _d2(F.col("qpv"), F.col("pv")).alias("pd2"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    exact_q = qemb.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("a_qv")
    )
    we = W.partitionBy("query_id").orderBy("ed2", "neighbor_id")
    exact_top = (
        qemb.crossJoin(F.broadcast(exact_q))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _d2(F.col("a_qv"), F.col("qv")).alias("ed2"),
        )
        .withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    hits = proj_top.select(
        F.col("query_id").alias("p_query"),
        F.col("neighbor_id").alias("p_neighbor"),
    )
    return (
        exact_top.join(
            hits,
            (F.col("query_id") == F.col("p_query"))
            & (F.col("neighbor_id") == F.col("p_neighbor")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("p_neighbor").alias("n_hits"),
            (F.count("p_neighbor") * 20).alias("recall_pct"),
        )
        .orderBy("query_id")
    )


_THETA_ORACLE = """
WITH aud AS (
  SELECT DISTINCT o_orderpriority AS aud, o_custkey AS uid FROM orders
),
h AS (
  SELECT aud,
         CAST('0x' || substr(md5(CAST(uid AS VARCHAR)), 1, 12) AS BIGINT) AS hv
  FROM aud
),
ranked AS (
  SELECT aud, hv, row_number() OVER (PARTITION BY aud ORDER BY hv) AS rn
  FROM h
),
sk AS (SELECT aud, hv FROM ranked WHERE rn <= 64),
hk AS (SELECT aud, max(hv) AS h_k FROM sk GROUP BY aud),
pairs AS (
  SELECT a.aud AS aud_a, b.aud AS aud_b,
         least(ha.h_k, hb.h_k) AS theta,
         count(*) FILTER (WHERE a.hv < least(ha.h_k, hb.h_k)) AS n_common
  FROM sk a
  JOIN sk b ON b.hv = a.hv AND a.aud < b.aud
  JOIN hk ha ON ha.aud = a.aud
  JOIN hk hb ON hb.aud = b.aud
  GROUP BY 1, 2, 3
),
exact AS (
  SELECT a.aud AS aud_a, b.aud AS aud_b, count(*) AS exact_both
  FROM aud a JOIN aud b ON b.uid = a.uid AND a.aud < b.aud
  GROUP BY 1, 2
)
SELECT e.aud_a, e.aud_b, e.exact_both,
       COALESCE(p.n_common * 281474976710656 // p.theta, 0) AS theta_est,
       COALESCE(p.n_common * 281474976710656 // p.theta, 0) - e.exact_both
         AS est_delta,
       abs(COALESCE(p.n_common * 281474976710656 // p.theta, 0)
           - e.exact_both) * 2 <= e.exact_both AS within_50pct
FROM exact e
LEFT JOIN pairs p ON p.aud_a = e.aud_a AND p.aud_b = e.aud_b
ORDER BY e.aud_a, e.aud_b
"""


@_register("theta_sketch_intersection", _THETA_ORACLE)
def theta_sketch_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set INTERSECTION estimate (Dasgupta et al. 2016 —
    the DataSketches theta family): audiences (customers per order
    priority) are sketched as their k=64 minimum 48-bit md5 values;
    |A∩B| is estimated as |{h ∈ sk(A)∩sk(B), h < θ}| · M/θ with
    θ = min(h_k(A), h_k(B)) — the set-algebra capability KMV/HLL
    distinct counts alone don't give (no raw-data re-scan per pair:
    P audiences → P sketches → P² pairwise overlap estimates from
    64-row structures). Exact-integer arithmetic end-to-end, so the
    estimates themselves carry a full value oracle next to the exact
    ground truth (`audience_overlap_matrix`'s pattern at sketch cost).
    Scale shape: one distinct shuffle over the membership fact, the
    salted two-level per-audience top-k from `kmv_distinct_sketch`,
    then ALL pair algebra runs on ≤ P·64-row broadcast frames; the
    exact side (for the oracle's ground truth) is the one keyed
    self-join any exact overlap already costs. within_50pct is the
    hard sanity band (measured relerr ≤ ±0.33 at both SFs)."""
    aud = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("aud"), F.col("o_custkey").alias("uid"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    from nyc_taxi_data_pipeline_spark.operators.sketch import kmv_topk

    sk = kmv_topk(aud, ["aud"], "uid", k=64).localCheckpoint(eager=False)
    hk = sk.groupBy("aud").agg(F.max("hv").alias("h_k"))
    sa = sk.select(F.col("aud").alias("aud_a"), "hv")
    sb = sk.select(F.col("aud").alias("aud_b"), F.col("hv").alias("hv_b"))
    ha = hk.select(F.col("aud").alias("aud_a"), F.col("h_k").alias("h_k_a"))
    hb = hk.select(F.col("aud").alias("aud_b"), F.col("h_k").alias("h_k_b"))
    pairs = (
        sa.join(F.broadcast(sb), (F.col("hv") == F.col("hv_b")) & (F.col("aud_a") < F.col("aud_b")))
        .join(F.broadcast(ha), "aud_a")
        .join(F.broadcast(hb), "aud_b")
        .withColumn("theta", F.least("h_k_a", "h_k_b"))
        .groupBy("aud_a", "aud_b", "theta")
        .agg(
            F.count(F.when(F.col("hv") < F.col("theta"), 1)).alias("n_common")
        )
    )
    ea = aud.select(F.col("aud").alias("aud_a"), "uid")
    eb = aud.select(F.col("aud").alias("aud_b"), F.col("uid").alias("uid_b"))
    exact = (
        ea.join(eb, (F.col("uid") == F.col("uid_b")) & (F.col("aud_a") < F.col("aud_b")))
        .groupBy("aud_a", "aud_b")
        .agg(F.count(F.lit(1)).alias("exact_both"))
    )
    est = F.coalesce(
        F.expr("n_common * 281474976710656 div theta"), F.lit(0).cast("long")
    )
    return (
        exact.join(F.broadcast(pairs), ["aud_a", "aud_b"], "left")
        .select(
            "aud_a",
            "aud_b",
            "exact_both",
            est.alias("theta_est"),
            (est - F.col("exact_both")).alias("est_delta"),
            (
                F.abs(est - F.col("exact_both")) * 2 <= F.col("exact_both")
            ).alias("within_50pct"),
        )
        .orderBy("aud_a", "aud_b")
    )


_STREAM_KMV_ORACLE = """
WITH parts AS (SELECT unnest(range(0, 4)) AS p),
offs AS (SELECT unnest(range(0, 150)) AS o),
recs AS (
  SELECT CAST((p * 1000003 + o * 7919) % 97 AS BIGINT) AS user_id
  FROM parts, offs
),
h AS (
  SELECT DISTINCT
      CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS hv
  FROM recs
),
ranked AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM h),
sk AS (SELECT count(*) AS n_kept, max(hv) AS h_k FROM ranked WHERE rn <= 64),
exact AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM recs)
SELECT CAST(3 AS BIGINT) AS n_batches,
       CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
       CASE WHEN s.n_kept < 64 THEN s.n_kept
            ELSE (63 * 281474976710656) // s.h_k END AS kmv_est,
       TRUE AS merged_equals_direct
FROM sk s, exact e
"""


@_register("streaming_kmv_sketch_merge", _STREAM_KMV_ORACLE)
def streaming_kmv_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch mergeability under the STREAMING execution model — the
    incremental-distinct shape that makes sketches the 100 TB answer:
    each micro-batch of the offset_log drain (4 partitions × 150
    offsets at 50/batch = 3 batches) materializes its own 64-row KMV
    sketch (the per-batch state a production job would persist to a
    sketch zone), and after the drain the batch sketches are UNION-and-
    re-minned and proven IDENTICAL to the sketch computed over the
    whole log in one batch pass (`kmv_distinct_sketch`'s lattice
    property, here executed across real micro-batch boundaries — no
    unbounded distinct state held in the stream). The log is seeded
    integer arithmetic, so exact count, estimate, and the equality all
    carry a full value oracle. The per-batch collect is 64 rows — the
    sketch itself, which IS the materialization a sketch store writes."""
    import uuid as _uuid

    from nyc_taxi_data_pipeline_spark.sources.pydatasource import (
        register_offset_log,
    )

    from nyc_taxi_data_pipeline_spark.operators.sketch import kmv_hash

    register_offset_log(spark)
    stream = (
        spark.readStream.format("offset_log")
        .option("partitions", 4)
        .option("n_rows", 150)
        .option("rows_per_batch", 50)
        .load()
    )
    hv_of = lambda c: kmv_hash(c).alias("hv")  # noqa: E731
    batch_sketches: list[tuple[int, int]] = []

    def sketch_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df.select(hv_of(F.col("user_id")))
            .distinct()
            .orderBy("hv")
            .limit(64)
            .collect()
        )
        for r in rows:
            batch_sketches.append((int(batch_id), int(r.hv)))

    q = stream.writeStream.foreachBatch(sketch_batch).queryName(
        f"kmv_{_uuid.uuid4().hex[:8]}"
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_batches = len({b for b, _ in batch_sketches})
    merged_df = spark.createDataFrame(batch_sketches, "batch_id long, hv long")
    merged = (
        merged_df.select("hv")
        .distinct()
        .orderBy("hv")
        .limit(64)
        .agg(F.count(F.lit(1)).alias("m_kept"), F.max("hv").alias("h_k_merged"))
    )
    recs = (
        spark.range(4)
        .select(F.col("id").alias("p"))
        .crossJoin(spark.range(150).select(F.col("id").alias("o")))
        .select(((F.col("p") * 1000003 + F.col("o") * 7919) % 97).alias("user_id"))
        .localCheckpoint(eager=False)
    )
    direct = (
        recs.select(hv_of(F.col("user_id")))
        .distinct()
        .orderBy("hv")
        .limit(64)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("h_k"))
    )
    exact = recs.agg(F.countDistinct("user_id").alias("exact_distinct"))
    est = F.when(F.col("n_kept") < 64, F.col("n_kept")).otherwise(
        F.expr("(63 * 281474976710656) div h_k")
    )
    return (
        direct.crossJoin(F.broadcast(merged))
        .crossJoin(F.broadcast(exact))
        .select(
            F.lit(n_batches).cast("long").alias("n_batches"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            est.alias("kmv_est"),
            (
                (F.col("h_k_merged") == F.col("h_k"))
                & (F.col("m_kept") == F.col("n_kept"))
            ).alias("merged_equals_direct"),
        )
    )


_DECONTAM_BLOOM_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
),
shl AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' '))) AS sh
  FROM toks
),
ev AS (SELECT doc_id AS eval_id, unnest(sh) AS s FROM shl WHERE doc_id % 5 = 0),
ev_keys AS (
  SELECT s, CAST('0x' || substr(md5(s), 1, 12) AS BIGINT) AS h
  FROM (SELECT DISTINCT s FROM ev)
),
bits AS (
  SELECT h % 262144 AS pos FROM ev_keys
  UNION ALL
  SELECT (h // 262144) % 262144 AS pos FROM ev_keys
),
words AS (
  SELECT pos // 32 AS w,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS word
  FROM bits GROUP BY 1
),
trh AS (
  SELECT train_id, s, CAST('0x' || substr(md5(s), 1, 12) AS BIGINT) AS h
  FROM (SELECT doc_id AS train_id, unnest(sh) AS s
        FROM shl WHERE doc_id % 5 <> 0)
),
trpass AS (
  SELECT t.train_id, t.s
  FROM trh t
  JOIN words w0
    ON w0.w = (t.h % 262144) // 32
   AND ((w0.word >> CAST((t.h % 262144) % 32 AS INTEGER)) & 1) = 1
  JOIN words w1
    ON w1.w = ((t.h // 262144) % 262144) // 32
   AND ((w1.word >> CAST(((t.h // 262144) % 262144) % 32 AS INTEGER)) & 1) = 1
),
stats AS (
  SELECT (SELECT count(*) FROM trh)    AS n_train_postings,
         (SELECT count(*) FROM trpass) AS n_train_pass
),
sizes AS (SELECT eval_id, count(*) AS n_shingles FROM ev GROUP BY eval_id),
pair_shared AS (
  SELECT e.eval_id, p.train_id, count(*) AS c
  FROM ev e JOIN trpass p ON p.s = e.s
  GROUP BY 1, 2
),
shared AS (SELECT eval_id, max(c) AS mx FROM pair_shared GROUP BY eval_id)
SELECT s.eval_id,
       s.n_shingles,
       round(CAST(coalesce(h.mx, 0) AS DOUBLE) / s.n_shingles, 6)
         AS max_overlap_frac,
       (CAST(coalesce(h.mx, 0) AS DOUBLE) / s.n_shingles) >= 0.5
         AS contaminated,
       CAST(st.n_train_postings AS BIGINT) AS n_train_postings,
       CAST(st.n_train_pass AS BIGINT)     AS n_train_pass
FROM sizes s
LEFT JOIN shared h ON h.eval_id = s.eval_id, stats st
ORDER BY s.eval_id
"""


@_register("decontamination_bloom_prefilter", _DECONTAM_BLOOM_ORACLE)
def decontamination_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`decontamination_ngram_overlap` composed with the bloom prune —
    the shape that survives a 100 TB training corpus: the eval shingle
    set (always the small side) builds a 2¹⁸-bit bloom filter with k=2
    positions derived from ONE 48-bit md5 per shingle (double-hashing:
    the giant train side pays a single hash per posting), and train
    postings that miss the filter never enter the inverted-index
    shuffle. The bloom has no false negatives, so the per-eval flag
    columns are PROVABLY IDENTICAL to the exact entry's (false
    positives only add candidates the equality join discards); the
    measured probe stats (n_train_postings vs n_train_pass) ride along
    to show the prune is real, and the oracle replicates the filter
    bit-for-bit. Scale shape: filter build is one agg over the small
    side into ≤8192 words (broadcast); the probe is two broadcast
    word-lookups per posting, all JVM expressions; the expensive
    shingle shuffle then carries only surviving postings."""
    from nyc_taxi_data_pipeline_spark.operators.textstats import (
        decontaminate_overlap_bloom,
    )

    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 5 != 0)
    ev = d.filter(F.col("doc_id") % 5 == 0)
    return decontaminate_overlap_bloom(train, ev, "text", "doc_id").orderBy(
        "eval_id"
    )


_WEIGHTED_SAMPLE_ORACLE = """
WITH w AS (
  SELECT doc_id, CAST(1 + n_chars % 8 AS BIGINT) AS weight
  FROM documents
),
keyed AS (
  SELECT doc_id, weight,
         list_min([md5(doc_id || ':' || r)
                   for r in range(1, weight + 1)]) AS sel_key
  FROM w
)
SELECT CAST(row_number() OVER (ORDER BY sel_key, doc_id) AS INTEGER) AS rank,
       doc_id, weight, sel_key
FROM keyed
ORDER BY sel_key, doc_id
LIMIT 20
"""


@_register("weighted_sample_race", _WEIGHTED_SAMPLE_ORACLE)
def weighted_sample_race(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted sampling without replacement via a deterministic
    hash race — the integer-arithmetic form of Efraimidis & Spirakis
    (2006) weighted reservoir sampling: each document with integer
    weight w races w independent md5 tickets and keeps its MINIMUM; the
    global top-k by ascending race key is a weighted sample without
    replacement (the item whose minimum ticket wins carries probability
    w_i / Σw — min of w iid uniforms is an exponential race with rate
    w). Every float-free step (md5 hex compares bytewise identically in
    both engines) makes the SAMPLE ITSELF value-oracle-checkable — the
    usual weighted-sampling implementations (rand()^(1/w)) are neither
    reproducible across engines nor mergeable. LLM-pipeline use:
    quality-weighted corpus subsampling where reruns, engine swaps, and
    shard-parallel merges must pick the IDENTICAL sample. Scale shape:
    per-row work is ≤8 md5 calls inside one codegen'd projection (no
    UDF), and the global top-k is TakeOrderedAndProject — no shuffle,
    no window over the corpus; the race key is mergeable (min), so
    per-shard top-k then re-min composes at 100 TB."""
    d = _t(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        (F.lit(1) + F.col("n_chars") % 8).cast("long").alias("weight"),
    ).withColumn(
        "sel_key",
        F.expr(
            "array_min(transform(sequence(1L, weight),"
            " r -> md5(concat(CAST(doc_id AS STRING), ':',"
            " CAST(r AS STRING)))))"
        ),
    )
    top = keyed.orderBy("sel_key", "doc_id").limit(20)
    wr = W.orderBy("sel_key", "doc_id")
    return top.select(
        F.row_number().over(wr).alias("rank"), "doc_id", "weight", "sel_key"
    ).orderBy("rank")


_SPATIAL_GRID_ORACLE = """
WITH pts AS (
  SELECT event_id,
         CAST('0x' || substr(md5('x:' || event_id), 1, 6) AS BIGINT)
           % 1000000 AS px,
         CAST('0x' || substr(md5('y:' || event_id), 1, 6) AS BIGINT)
           % 1000000 AS py
  FROM events
),
rects AS (
  SELECT n_nationkey AS zone_key,
         ((n_nationkey * 37) % 20) * 45000 AS x0,
         ((n_nationkey * 53) % 20) * 45000 AS y0,
         ((n_nationkey * 37) % 20) * 45000
           + 30000 + (n_nationkey % 7) * 15000 AS x1,
         ((n_nationkey * 53) % 20) * 45000
           + 30000 + (n_nationkey % 5) * 20000 AS y1
  FROM nation
)
SELECT r.zone_key,
       count(p.event_id)                      AS n_points,
       CAST(coalesce(sum(p.px), 0) AS BIGINT) AS sum_px,
       CAST(coalesce(sum(p.py), 0) AS BIGINT) AS sum_py
FROM rects r
LEFT JOIN pts p
  ON p.px BETWEEN r.x0 AND r.x1 AND p.py BETWEEN r.y0 AND r.y1
GROUP BY r.zone_key
ORDER BY r.zone_key
"""


@_register("spatial_grid_join", _SPATIAL_GRID_ORACLE)
def spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial point-in-rectangle join via GRID BUCKETING — the shape
    that replaces the reference's single zone-lookup CSV when the
    geometry is real (taxi pickup coordinates → zone polygons): each
    rectangle is exploded to the fixed-size grid cells it overlaps
    (≤12 cells at this cell size), points key to their cell in O(1),
    and candidates meet in an EQUI-join on cell id — never a
    theta-join/BNLJ over points × zones — with exact containment as a
    cheap residual filter. Coordinates are md5-derived micro-degree
    integers and zones are literal-arithmetic rectangles, so the
    whole join carries a full value oracle (which states the NAIVE
    containment join — the grid path must reproduce it exactly;
    double-count hazard: a rect spanning k cells meets each point
    once because a point lives in exactly ONE cell). Scale shape:
    zones×cells is tiny (broadcast); the point side never shuffles
    (broadcast hash join on cell, then partial agg); zero-match zones
    come back via a broadcast left join of the 25-row zone frame
    against the aggregate."""
    cell = 50000
    k = F.col("n_nationkey").cast("long")
    rects = (
        _t(spark, sf_dir, "nation")
        .select(
            k.alias("zone_key"),
            (((k * 37) % 20) * 45000).alias("x0"),
            (((k * 53) % 20) * 45000).alias("y0"),
            (((k * 37) % 20) * 45000 + 30000 + (k % 7) * 15000).alias("x1"),
            (((k * 53) % 20) * 45000 + 30000 + (k % 5) * 20000).alias("y1"),
        )
        .localCheckpoint(eager=False)
    )
    rect_cells = rects.select(
        "zone_key",
        "x0",
        "x1",
        "y0",
        "y1",
        F.explode(F.expr(f"sequence(x0 div {cell}, x1 div {cell})")).alias(
            "cx"
        ),
    ).select(
        "*",
        F.explode(F.expr(f"sequence(y0 div {cell}, y1 div {cell})")).alias(
            "cy"
        ),
    )
    pts = _t(spark, sf_dir, "events").select(
        "event_id",
        F.expr(
            "CAST(conv(substr(md5(concat('x:', CAST(event_id AS STRING))),"
            " 1, 6), 16, 10) AS BIGINT) % 1000000"
        ).alias("px"),
        F.expr(
            "CAST(conv(substr(md5(concat('y:', CAST(event_id AS STRING))),"
            " 1, 6), 16, 10) AS BIGINT) % 1000000"
        ).alias("py"),
    )
    hits = (
        pts.withColumn("cx", F.expr(f"px div {cell}"))
        .withColumn("cy", F.expr(f"py div {cell}"))
        .join(F.broadcast(rect_cells), ["cx", "cy"])
        .filter(
            F.col("px").between(F.col("x0"), F.col("x1"))
            & F.col("py").between(F.col("y0"), F.col("y1"))
        )
        .groupBy("zone_key")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("px").alias("sum_px"),
            F.sum("py").alias("sum_py"),
        )
    )
    return (
        rects.select("zone_key")
        .join(F.broadcast(hits), "zone_key", "left")
        .select(
            "zone_key",
            F.coalesce(F.col("n_points"), F.lit(0)).alias("n_points"),
            F.coalesce(F.col("sum_px"), F.lit(0)).cast("long").alias("sum_px"),
            F.coalesce(F.col("sum_py"), F.lit(0)).cast("long").alias("sum_py"),
        )
        .orderBy("zone_key")
    )


_STREAM_OUTER_JOIN_ORACLE = """
WITH offs AS (SELECT unnest(range(0, 90)) AS o),
l AS (SELECT CAST(o AS BIGINT) AS l_off FROM offs),
r AS (SELECT CAST(CASE WHEN o % 3 = 0 AND o < 60 THEN -1 ELSE o END
              AS BIGINT) AS k,
             CAST(o AS BIGINT) AS r_off
      FROM offs)
SELECT l.l_off, r.r_off, r.r_off IS NOT NULL AS matched
FROM l LEFT JOIN r ON r.k = l.l_off
ORDER BY l.l_off
"""


@_register("streaming_interval_join_outer", _STREAM_OUTER_JOIN_ORACLE)
def streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the semantics the inner
    interval join (tests/test_streaming.py) cannot express: a left row
    with NO match within the time bound must still be emitted, with
    nulls, and that emission can only happen once the WATERMARK proves
    no matching right row can still arrive. Two paced `offset_log`
    drains stand in for two Kafka topics (left = partition 0, right =
    partition 1 with every third key under offset 60 diverted so it
    never matches); the join is keyed + bounded to ±5 minutes of event
    time with a 10-minute watermark. All unmatched left rows sit ≥30
    minutes below the final watermark, so the drained sink is exactly
    the BATCH left-outer join over the full log — which the oracle
    states in plain SQL, making null emission itself value-checked.
    Scale shape: state is bounded by the interval condition (eviction
    proven in tests/test_streaming.py); each no-match row costs one
    state-store entry until its watermark expiry, never unbounded."""
    import uuid

    from nyc_taxi_data_pipeline_spark.sources.pydatasource import (
        register_offset_log,
    )
    from nyc_taxi_data_pipeline_spark.streaming.sinks import run_stream_to_memory

    register_offset_log(spark)

    def load() -> DataFrame:
        return (
            spark.readStream.format("offset_log")
            .option("partitions", 2)
            .option("n_rows", 90)
            .option("rows_per_batch", 30)
            .load()
        )

    left = (
        load()
        .filter(F.col("partition") == 0)
        .select(
            F.col("offset").alias("l_off"),
            F.col("ts").cast("timestamp").alias("lts"),
        )
        .withWatermark("lts", "10 minutes")
    )
    right = (
        load()
        .filter(F.col("partition") == 1)
        .select(
            F.when(
                (F.col("offset") % 3 == 0) & (F.col("offset") < 60), F.lit(-1)
            )
            .otherwise(F.col("offset"))
            .cast("long")
            .alias("k"),
            F.col("offset").alias("r_off"),
            F.col("ts").cast("timestamp").alias("rts"),
        )
        .withWatermark("rts", "10 minutes")
    )
    joined = left.join(
        right,
        (F.col("l_off") == F.col("k"))
        & (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 5 MINUTES")),
        "leftOuter",
    ).select("l_off", "r_off", F.col("r_off").isNotNull().alias("matched"))
    sink = run_stream_to_memory(joined, f"soj_{uuid.uuid4().hex[:8]}")
    return sink.orderBy("l_off")


_RENDEZVOUS_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
a AS (
  SELECT doc_id,
         struct_extract(list_max([{'h': md5(doc_id || '|' || s), 's': s}
                                  for s in range(0, 8)]), 's') AS old_shard,
         struct_extract(list_max([{'h': md5(doc_id || '|' || s), 's': s}
                                  for s in range(0, 9)]), 's') AS new_shard
  FROM d
)
SELECT CAST(old_shard AS BIGINT) AS old_shard,
       CAST(new_shard AS BIGINT) AS new_shard,
       count(*)                  AS n_docs,
       (old_shard = new_shard OR new_shard = 8) AS only_moves_to_new
FROM a
GROUP BY old_shard, new_shard
ORDER BY old_shard, new_shard
"""


@_register("rendezvous_shard_rebalance", _RENDEZVOUS_ORACLE)
def rendezvous_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing — Thaler & Ravishankar
    1996, the shard-assignment scheme whose REBALANCE cost is minimal:
    each key scores every shard with md5(key|shard) and lives on the
    argmax, so growing 8 → 9 shards moves ONLY the keys whose new
    shard-8 ticket wins (~1/9 of keys, in expectation) and NEVER
    shuffles a key between surviving shards — `pmod(hash, k)` resharding
    would move ~8/9 of 100 TB instead. The entry emits the full
    (old_shard, new_shard) transition matrix with the only-moves-to-new
    invariant as a per-row value check; md5 argmax (ties impossible in
    practice, broken by shard id via struct compare) makes the matrix
    bit-identical cross-engine. Scale shape: one codegen'd projection
    (k md5 calls per key, no UDF, no shuffle) + one tiny aggregate —
    assignment is embarrassingly parallel, which is exactly why HRW is
    the right scheme for routing documents to index/dedup shards."""
    d = _t(spark, sf_dir, "documents")

    def shard(k: int) -> F.Column:
        return F.expr(
            f"array_max(transform(sequence(0, {k - 1}),"
            " s -> struct(md5(concat(CAST(doc_id AS STRING), '|',"
            " CAST(s AS STRING))) AS h, s AS s))).s"
        ).cast("long")

    a = d.select(shard(8).alias("old_shard"), shard(9).alias("new_shard"))
    return (
        a.groupBy("old_shard", "new_shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "old_shard",
            "new_shard",
            "n_docs",
            (
                (F.col("old_shard") == F.col("new_shard"))
                | (F.col("new_shard") == 8)
            ).alias("only_moves_to_new"),
        )
        .orderBy("old_shard", "new_shard")
    )


_STRATIFIED_ORACLE = """
WITH c AS (
  SELECT source, count(*) AS n_docs, (count(*) + 9) // 10 AS quota
  FROM documents GROUP BY source
),
h AS (
  SELECT doc_id, source,
         CAST('0x' || substr(md5(doc_id || ':strat'), 1, 12) AS BIGINT) AS hv
  FROM documents
),
r AS (
  SELECT h.*, row_number() OVER (PARTITION BY source
                                 ORDER BY hv, doc_id) AS rn
  FROM h
),
s AS (
  SELECT r.source, count(*) AS n_sampled, sum(r.doc_id) AS sum_ids
  FROM r JOIN c USING (source)
  WHERE r.rn <= c.quota
  GROUP BY r.source
)
SELECT c.source, c.n_docs, CAST(c.quota AS BIGINT) AS quota,
       s.n_sampled, CAST(s.sum_ids AS BIGINT) AS sum_sampled_ids
FROM c JOIN s USING (source)
ORDER BY c.source
"""


@_register("stratified_sample_exact", _STRATIFIED_ORACLE)
def stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-size stratified sampling — per-stratum sample counts hit
    their quota exactly (here ceil(10%) per source), where
    `df.sampleBy` is Bernoulli and only approximates its fractions.
    Selection is rank-by-md5 within the stratum, so the sample is a
    pure function of (doc_id, source): rerun-deterministic,
    engine-portable (full value oracle down to the sampled-id
    checksum), and decontamination-auditable. Scale shape: quotas come
    from one tiny rollup (broadcast back); selection is the SALTED
    two-level rank from `operators/sketch.kmv_topk` — a (source,
    hv%16) pre-rank bounds every task's sort before the per-source
    rank, so no task ever sorts a whole stratum of a 100 TB corpus —
    one logical shuffle on the stratum key."""
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("(count(1) + 9) div 10").alias("quota"),
    )
    h = d.select(
        "doc_id",
        "source",
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':strat')),"
            " 1, 12), 16, 10) AS BIGINT)"
        ).alias("hv"),
    ).join(F.broadcast(counts), "source")
    w_salt = W.partitionBy("source", F.pmod(F.col("hv"), F.lit(16))).orderBy(
        "hv", "doc_id"
    )
    w_grp = W.partitionBy("source").orderBy("hv", "doc_id")
    sampled = (
        h.withColumn("__srn", F.row_number().over(w_salt))
        .filter(F.col("__srn") <= F.col("quota"))
        .withColumn("rn", F.row_number().over(w_grp))
        .filter(F.col("rn") <= F.col("quota"))
    )
    agg = sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").cast("long").alias("sum_sampled_ids"),
    )
    return (
        counts.join(agg, "source")
        .select(
            "source",
            "n_docs",
            F.col("quota").cast("long").alias("quota"),
            "n_sampled",
            "sum_sampled_ids",
        )
        .orderBy("source")
    )


_SCD2_BUILD_ORACLE = """
WITH c AS (
  SELECT user_id, ts, event_type, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
ch AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type),
v AS (
  SELECT user_id, event_type AS state,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT)
           AS version_n,
         epoch_us(ts) AS valid_from_us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS valid_to_us
  FROM ch
)
SELECT user_id, version_n, state, valid_from_us, valid_to_us,
       valid_to_us IS NULL AS is_current
FROM v
ORDER BY user_id, version_n
"""


@_register("scd2_build_from_changes", _SCD2_BUILD_ORACLE)
def scd2_build_from_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE side of SCD2 — building the versioned dimension history
    that `scd2_point_in_time_join` reads: a change log (events as the
    CDC stand-in: user_id, ts, event_type-as-tracked-attribute)
    becomes validity-interval rows by (1) collapsing consecutive
    no-op changes (lag() equality — real CDC feeds re-emit unchanged
    rows), (2) numbering surviving versions, and (3) closing each
    interval at the NEXT change's timestamp (lead(); null = current
    row). Validity bounds ride as epoch microseconds (unix_micros /
    epoch_us — the cross-engine-stable timestamp lane). Scale shape:
    ONE shuffle on the dimension key serves all three windows (same
    partitioning + ordering ⇒ one sort); per-key history is the only
    ordering unit, so 100 TB of change log parallelizes across keys.
    Reference parity: this is the dbt snapshot / MERGE pattern the
    reference's star schema would need for dimension history."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    wk = W.partitionBy("user_id").orderBy("ts", "event_id")
    ch = (
        e.withColumn("prev", F.lag("event_type").over(wk))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .drop("prev")
    )
    v = ch.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.row_number().over(wk).cast("long").alias("version_n"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.lead(F.unix_micros("ts")).over(wk).alias("valid_to_us"),
    )
    return v.select(
        "user_id",
        "version_n",
        "state",
        "valid_from_us",
        "valid_to_us",
        F.col("valid_to_us").isNull().alias("is_current"),
    ).orderBy("user_id", "version_n")


_FS_LINKAGE_ORACLE = """
WITH a AS (
  SELECT c_custkey AS akey, c_nationkey AS nation,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
         c_mktsegment AS seg
  FROM customer
),
b AS (
  SELECT akey + 1000000 AS bkey,
         CASE WHEN CAST('0x' || substr(md5(akey || ':n'), 1, 6) AS BIGINT)
                   % 10 = 0
              THEN (nation + 1) % 25 ELSE nation END AS nation,
         bal_cents
           + CAST('0x' || substr(md5(akey || ':b'), 1, 6) AS BIGINT) % 61
           - 30 AS bal_cents,
         CASE WHEN CAST('0x' || substr(md5(akey || ':s'), 1, 6) AS BIGINT)
                   % 20 = 0
              THEN 'PERTURBED' ELSE seg END AS seg
  FROM a
),
cand AS (
  SELECT a.akey, b.bkey, a.bal_cents AS abal, b.bal_cents AS bbal,
         a.seg AS aseg, b.seg AS bseg
  FROM a JOIN b
    ON a.nation = b.nation
   AND (a.bal_cents + 1000000) // 10000 = (b.bal_cents + 1000000) // 10000
),
scored AS (
  SELECT akey, bkey, (bkey - 1000000 = akey) AS is_true,
         (CASE WHEN abs(abal - bbal) <= 30 THEN 220 ELSE -160 END
        + CASE WHEN aseg = bseg THEN 120 ELSE -90 END) AS score
  FROM cand
),
cls AS (
  SELECT *,
         CASE WHEN score >= 300 THEN 'match'
              WHEN score <= -200 THEN 'non_match'
              ELSE 'possible' END AS decision
  FROM scored
),
truth AS (SELECT count(*) AS n_true_total FROM a)
SELECT d.decision,
       d.n_pairs,
       d.n_true_pairs,
       t.n_true_total
FROM (
  SELECT decision, count(*) AS n_pairs,
         CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
           AS n_true_pairs
  FROM cls GROUP BY decision
  UNION ALL
  SELECT 'candidate_pairs', count(*),
         CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
  FROM scored
) d, truth t
ORDER BY d.decision
"""


@_register("record_linkage_fs_scoring", _FS_LINKAGE_ORACLE)
def record_linkage_fs_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (1969) with KNOWN
    ground truth: a deterministically-dirtied copy of the customer
    table (md5-derived perturbations — 10% nation typos, ±30-cent
    balance noise, 5% segment corruption) is re-linked to the
    original, so precision/recall of every decision class is an exact
    measured number, not an assertion. Pipeline: (1) BLOCKING on
    (nation, $100 balance band) — the step that turns O(|A|·|B|) into
    bounded per-block candidate sets; true pairs lost to blocking
    (nation typo or band-edge noise) show up as
    n_true_total − candidate n_true_pairs, the classic
    blocking-recall tradeoff, measured; (2) field-agreement scoring
    with integer log-likelihood-ratio weights (literal scaled
    log(m/u) constants, so scores are exact ints); (3) three-way
    decision (match / possible / non-match) by score thresholds.
    Scale shape: the candidate join is equi on the block key (never a
    cross join), per-block size is bounded by the band width, scoring
    is one codegen'd projection, and the confusion rollup is a tiny
    aggregate."""
    a = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("akey"),
        F.col("c_nationkey").cast("long").alias("nation"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        F.col("c_mktsegment").alias("seg"),
    )

    def h6(suffix: str) -> F.Column:
        return F.expr(
            "CAST(conv(substr(md5(concat(CAST(akey AS STRING),"
            f" '{suffix}')), 1, 6), 16, 10) AS BIGINT)"
        )

    b = a.select(
        (F.col("akey") + 1000000).alias("bkey"),
        F.when((h6(":n") % 10) == 0, (F.col("nation") + 1) % 25)
        .otherwise(F.col("nation"))
        .alias("nation"),
        (F.col("bal_cents") + h6(":b") % 61 - 30).alias("bal_cents"),
        F.when((h6(":s") % 20) == 0, F.lit("PERTURBED"))
        .otherwise(F.col("seg"))
        .alias("seg"),
    )
    cand = a.alias("a").join(
        b.alias("b"),
        (F.col("a.nation") == F.col("b.nation"))
        & (
            F.expr("(a.bal_cents + 1000000) div 10000")
            == F.expr("(b.bal_cents + 1000000) div 10000")
        ),
    )
    scored = cand.select(
        F.col("a.akey").alias("akey"),
        F.col("b.bkey").alias("bkey"),
        (F.col("b.bkey") - 1000000 == F.col("a.akey")).alias("is_true"),
        (
            F.when(
                F.abs(F.col("a.bal_cents") - F.col("b.bal_cents")) <= 30,
                F.lit(220),
            ).otherwise(F.lit(-160))
            + F.when(F.col("a.seg") == F.col("b.seg"), F.lit(120)).otherwise(
                F.lit(-90)
            )
        ).alias("score"),
    ).localCheckpoint(eager=False)
    cls = scored.withColumn(
        "decision",
        F.when(F.col("score") >= 300, "match")
        .when(F.col("score") <= -200, "non_match")
        .otherwise("possible"),
    )
    by_class = cls.groupBy("decision").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("is_true").cast("long")).alias("n_true_pairs"),
    )
    cand_row = scored.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("is_true").cast("long")).alias("n_true_pairs"),
    ).select(
        F.lit("candidate_pairs").alias("decision"), "n_pairs", "n_true_pairs"
    )
    truth = a.agg(F.count(F.lit(1)).alias("n_true_total"))
    return (
        by_class.unionByName(cand_row)
        .crossJoin(F.broadcast(truth))
        .orderBy("decision")
    )


_DP_BOUNDED_ORACLE = """
WITH ranked AS (
  SELECT event_type,
         least(greatest(CAST(round(value * 100) AS BIGINT), 0), 2000)
           AS clamped_cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
bounded AS (SELECT * FROM ranked WHERE rn <= 5),
agg AS (
  SELECT event_type,
         count(*) AS n_contributions,
         sum(clamped_cents) AS clamped_sum
  FROM bounded GROUP BY event_type
)
SELECT event_type,
       n_contributions,
       CAST(clamped_sum AS BIGINT) AS clamped_sum,
       CAST('0x' || substr(md5('noise:' || event_type), 1, 8) AS BIGINT)
         % 201 - 100 AS noise,
       CAST(clamped_sum AS BIGINT)
         + CAST('0x' || substr(md5('noise:' || event_type), 1, 8) AS BIGINT)
           % 201 - 100 AS released_sum,
       CAST(10000 AS BIGINT) AS sensitivity
FROM agg
ORDER BY event_type
"""


@_register("dp_bounded_contribution_agg", _DP_BOUNDED_ORACLE)
def dp_bounded_contribution_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The differential-privacy AGGREGATION MECHANICS (the shape of
    BigQuery/Tumult DP-SQL): before any noise can carry an ε
    guarantee, the query must bound each user's influence — (1)
    VALUE CLIPPING (per-event value clamped to [0, 2000] cents) and
    (2) CONTRIBUTION BOUNDING (each user's first 5 events by event
    time; a per-user rank, NOT a global sample) — giving a provable
    L1 sensitivity of 5 × 2000 = 10000 per user, emitted as a
    column. The noise term here is a DETERMINISTIC md5-derived
    stand-in (real ε-DP requires cryptographic randomness drawn at
    release time — a driver-side concern, deliberately outside the
    plan) so the whole release pipeline value-checks cross-engine;
    swapping the stand-in for discrete-Laplace noise changes one
    expression. Scale shape: the rank is one window on user_id, the
    rollup is mergeable, nothing touches the driver."""
    e = _t(spark, sf_dir, "events")
    wk = W.partitionBy("user_id").orderBy("ts", "event_id")
    bounded = (
        e.select(
            "event_type",
            "user_id",
            "ts",
            "event_id",
            F.least(
                F.greatest(F.round(F.col("value") * 100).cast("long"), F.lit(0)),
                F.lit(2000),
            ).alias("clamped_cents"),
        )
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= 5)
    )
    agg = bounded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_contributions"),
        F.sum("clamped_cents").cast("long").alias("clamped_sum"),
    )
    noise = (
        F.expr(
            "CAST(conv(substr(md5(concat('noise:', event_type)), 1, 8),"
            " 16, 10) AS BIGINT)"
        )
        % 201
        - 100
    )
    return agg.select(
        "event_type",
        "n_contributions",
        "clamped_sum",
        noise.alias("noise"),
        (F.col("clamped_sum") + noise).alias("released_sum"),
        F.lit(10000).cast("long").alias("sensitivity"),
    ).orderBy("event_type")


_LATE_DATA_ORACLE = """
WITH offs AS (SELECT unnest(range(0, 120)) AS o),
r AS (
  SELECT o, o // 30 AS k,
         CASE WHEN o % 7 = 0 AND o >= 75 THEN o - 70 ELSE o END AS t_eff
  FROM offs
),
m AS (SELECT k, max(t_eff) AS mx FROM r GROUP BY k),
fw AS (
  SELECT ks.k, max(m.mx) - 10 AS fwm
  FROM (SELECT DISTINCT k FROM r) ks
  LEFT JOIN m ON m.k <= ks.k - 2
  GROUP BY ks.k
),
j AS (
  SELECT r.o, r.t_eff, ((r.t_eff // 10) + 1) * 10 AS w_end, fw.fwm
  FROM r JOIN fw ON fw.k = r.k
),
kept AS (SELECT * FROM j WHERE fwm IS NULL OR w_end > fwm),
final_wm AS (SELECT max(mx) - 10 AS fin FROM m)
SELECT CAST(w_end - 10 AS BIGINT) AS window_start_min,
       count(*)                   AS n_rows
FROM kept, final_wm
WHERE w_end <= fin
GROUP BY w_end
ORDER BY w_end
"""


@_register("streaming_late_data_accounting", _LATE_DATA_ORACLE)
def streaming_late_data_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-ROW DROP semantics made value-checkable: a paced
    offset_log drain where every 7th offset (from 75 up) arrives with
    its event time shifted 70 minutes into the past — late against a
    10-minute watermark — feeds a 10-minute tumbling windowed count in
    APPEND mode. The rule this entry pins down EMPIRICALLY (probed on
    Spark 4.1 and encoded in the oracle, because the docs don't state
    it): Spark runs TWO watermarks one batch apart — the late filter
    in micro-batch k drops a row iff its window end ≤ the watermark
    computed from data through batch k−2, while state EVICTION /
    append emission at the end of batch k uses the one through batch
    k−1 (a row later than the filter boundary still MERGES into its
    window if that window hasn't been evicted — 3 of the 7 late rows
    here do exactly that; the other 4 drop). All boundaries land ≡9
    mod 10 against window ends ≡0 mod 10, so the simulation has no
    tie-sensitivity. ST5 quantified: which rows a 100 TB pipeline
    silently loses to lateness is an exact function of batch pacing
    and the delay — this entry makes that function an oracle-checked
    spec instead of an accident."""
    import uuid

    from nyc_taxi_data_pipeline_spark.sources.pydatasource import (
        register_offset_log,
    )
    from nyc_taxi_data_pipeline_spark.streaming.sinks import run_stream_to_memory

    register_offset_log(spark)
    stream = (
        spark.readStream.format("offset_log")
        .option("partitions", 1)
        .option("n_rows", 120)
        .option("rows_per_batch", 30)
        .load()
    )
    ev = stream.select(
        F.when(
            (F.col("offset") % 7 == 0) & (F.col("offset") >= 75),
            F.col("ts") - F.expr("INTERVAL 70 MINUTES"),
        )
        .otherwise(F.col("ts"))
        .cast("timestamp")
        .alias("t_eff")
    ).withWatermark("t_eff", "10 minutes")
    agg = ev.groupBy(F.window("t_eff", "10 minutes")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    sink = run_stream_to_memory(
        agg, f"late_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    return sink.select(
        (
            (F.unix_timestamp(F.col("window.start")) - F.unix_timestamp(base))
            / 60
        )
        .cast("long")
        .alias("window_start_min"),
        "n_rows",
    ).orderBy("window_start_min")


_JOIN_SIZE_ORACLE = """
WITH lanes AS (SELECT unnest(range(0, 4)) AS lane),
a AS (
  SELECT l.lane,
         CAST('0x' || substr(md5(l.lane || ':' || e.user_id), 1, 8)
              AS BIGINT) % 256 AS bucket,
         count(*) AS c
  FROM events e, lanes l
  WHERE e.event_type = 'view'
  GROUP BY 1, 2
),
b AS (
  SELECT l.lane,
         CAST('0x' || substr(md5(l.lane || ':' || e.user_id), 1, 8)
              AS BIGINT) % 256 AS bucket,
         count(*) AS c
  FROM events e, lanes l
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
),
est AS (
  SELECT a.lane, CAST(sum(a.c * b.c) AS BIGINT) AS lane_estimate
  FROM a JOIN b ON a.lane = b.lane AND a.bucket = b.bucket
  GROUP BY a.lane
),
exact AS (
  SELECT CAST(sum(av.c * bv.c) AS BIGINT) AS exact_size
  FROM (SELECT user_id, count(*) AS c FROM events
        WHERE event_type = 'view' GROUP BY user_id) av
  JOIN (SELECT user_id, count(*) AS c FROM events
        WHERE event_type = 'purchase' GROUP BY user_id) bv
    ON av.user_id = bv.user_id
),
best AS (SELECT min(lane_estimate) AS cms_estimate FROM est)
SELECT e.lane, e.lane_estimate, x.exact_size, bst.cms_estimate,
       e.lane_estimate >= x.exact_size AS never_underestimates
FROM est e, exact x, best bst
ORDER BY e.lane
"""


@_register("join_size_sketch_estimate", _JOIN_SIZE_ORACLE)
def join_size_sketch_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-SIZE (cardinality) estimation from mergeable count sketches
    — the query optimizer's core problem, answered WITHOUT running the
    join: each side's per-key counts collapse into a 4-lane × 256-bucket
    count-min row (md5 lanes, so the sketch is engine-portable), and
    |A ⋈ B| on the key is estimated by the bucketwise inner product per
    lane, taking the min lane (Cormode-Muthukrishnan 2005 §4.2). The
    inner-product estimate can only OVERCOUNT (hash collisions add
    cross-terms, never remove true ones) — that no-underestimate
    contract is emitted as a per-lane value-checked column next to the
    exact join size (here view-events ⋈ purchase-events on user_id,
    Σ_u views·purchases). Scale shape: each side reduces to ≤1024
    mergeable counters in one partial-aggregated pass — the sketches
    union across shards/days, so a 100 TB planner can keep running
    join-size estimates without ever touching two tables at once; the
    inner product and the exact-side audit rollups are tiny."""
    e = _t(spark, sf_dir, "events")
    lanes = F.explode(F.array([F.lit(i) for i in range(4)])).alias("lane")

    def side(event_type: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == event_type)
            .select("user_id", lanes)
            .select(
                "lane",
                F.expr(
                    "CAST(conv(substr(md5(concat(CAST(lane AS STRING), ':',"
                    " CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
                    " % 256"
                ).alias("bucket"),
            )
            .groupBy("lane", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    a, b = side("view"), side("purchase")
    est = (
        a.alias("a")
        .join(b.alias("b"), ["lane", "bucket"])
        .groupBy("lane")
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("lane_estimate"))
        .localCheckpoint(eager=False)
    )

    def keyed(event_type: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == event_type)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    exact = (
        keyed("view")
        .alias("av")
        .join(keyed("purchase").alias("bv"), "user_id")
        .agg(
            F.sum(F.col("av.c") * F.col("bv.c")).cast("long").alias("exact_size")
        )
    )
    best = est.agg(F.min("lane_estimate").alias("cms_estimate"))
    return (
        est.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(best))
        .select(
            "lane",
            "lane_estimate",
            "exact_size",
            "cms_estimate",
            (F.col("lane_estimate") >= F.col("exact_size")).alias(
                "never_underestimates"
            ),
        )
        .orderBy("lane")
    )


_SEASONAL_NAIVE_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
  FROM events
  GROUP BY 1, 2
),
bounds AS (SELECT max(d) AS dmax FROM daily),
lagged AS (
  SELECT event_type, d, c,
         lag(c, 7) OVER (PARTITION BY event_type ORDER BY d) AS forecast,
         lag(c, 1) OVER (PARTITION BY event_type ORDER BY d) AS prev
  FROM daily
),
test AS (
  SELECT l.* FROM lagged l, bounds b WHERE l.d > b.dmax - 7
),
train AS (
  SELECT l.* FROM lagged l, bounds b
  WHERE l.d <= b.dmax - 7 AND l.prev IS NOT NULL
),
err AS (
  SELECT event_type,
         count(*) AS n_test_days,
         CAST(sum(abs(c - forecast)) AS BIGINT) AS sum_abs_err
  FROM test GROUP BY event_type
),
denom AS (
  SELECT event_type,
         count(*) AS n_train_steps,
         CAST(sum(abs(c - prev)) AS BIGINT) AS sum_abs_naive
  FROM train GROUP BY event_type
)
SELECT e.event_type, e.n_test_days, e.sum_abs_err,
       d.n_train_steps, d.sum_abs_naive,
       (e.sum_abs_err * d.n_train_steps * 1000000)
         // (d.sum_abs_naive * e.n_test_days) AS mase_ppm
FROM err e JOIN denom d USING (event_type)
ORDER BY e.event_type
"""


@_register("seasonal_naive_forecast_eval", _SEASONAL_NAIVE_ORACLE)
def seasonal_naive_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality evaluation with the SEASONAL-NAIVE baseline —
    the benchmark every production forecast must beat (Hyndman's MASE,
    2006): forecast each of the last 7 days' per-type event counts with
    the value from 7 days earlier, and scale the test-window mean
    absolute error by the training-window mean absolute one-step-naive
    error. MASE < 1e6 ppm means weekly seasonality carries real signal
    over a random-walk guess. All error sums are exact integers and the
    ratio is one floor division in ppm, so the evaluation metric itself
    carries a full value oracle — float MAE/MAPE pipelines can't be
    cross-checked this tightly. Scale shape: the daily rollup is one
    partial-aggregated pass; both lag() windows share one (event_type)
    shuffle over a frame that is |types|×|days| — per-series state
    never leaves its partition, the shape that holds for millions of
    series at 100 TB."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    wk = W.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "d",
        "c",
        F.lag("c", 7).over(wk).alias("forecast"),
        F.lag("c", 1).over(wk).alias("prev"),
    ).crossJoin(F.broadcast(daily.agg(F.max("d").alias("dmax"))))
    test = lagged.filter(F.col("d") > F.date_sub(F.col("dmax"), 7))
    train = lagged.filter(
        (F.col("d") <= F.date_sub(F.col("dmax"), 7))
        & F.col("prev").isNotNull()
    )
    err = test.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_test_days"),
        F.sum(F.abs(F.col("c") - F.col("forecast"))).cast("long").alias(
            "sum_abs_err"
        ),
    )
    denom = train.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_train_steps"),
        F.sum(F.abs(F.col("c") - F.col("prev"))).cast("long").alias(
            "sum_abs_naive"
        ),
    )
    return (
        err.join(denom, "event_type")
        .select(
            "event_type",
            "n_test_days",
            "sum_abs_err",
            "n_train_steps",
            "sum_abs_naive",
            F.expr(
                "(sum_abs_err * n_train_steps * 1000000)"
                " div (sum_abs_naive * n_test_days)"
            ).alias("mase_ppm"),
        )
        .orderBy("event_type")
    )


_SSSP_ORACLE = """
WITH RECURSIVE e0 AS (
  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey % 20 = 0
),
edges AS (
  SELECT src, dst,
         1 + CAST('0x' || substr(md5(src || '>' || dst), 1, 4) AS BIGINT)
             % 9 AS w
  FROM (SELECT src, dst FROM e0
        UNION
        SELECT dst AS src, src AS dst FROM e0)
),
seed AS (SELECT min(src) AS s FROM edges),
walk(node, d, steps) AS (
  SELECT s, CAST(0 AS BIGINT), 0 FROM seed
  UNION ALL
  SELECT e.dst, w.d + e.w, w.steps + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.steps < 3
)
SELECT node, min(d) AS dist
FROM walk GROUP BY node
ORDER BY dist, node
"""


@_register("sssp_weighted_frontier", _SSSP_ORACLE)
def sssp_weighted_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source SHORTEST PATH with integer edge weights — bounded
    Bellman-Ford as the IMPERATIVE frontier loop (the production shape:
    per-round relax join + min-aggregate + localCheckpoint, exactly the
    PageRank iteration skeleton), value-checked against a recursive-CTE
    oracle that enumerates ≤3-edge paths and min-aggregates. Both sides
    run EXACTLY k=3 relaxation rounds, so dist(v) = min weight over
    paths of ≤3 edges is identical even where the graph hasn't
    converged — the bounded-k trick that gives iterative graph
    algorithms full value oracles (same as the scaled-integer
    PageRank). Edge weights are md5-derived integers 1..9, so weighted
    relaxation genuinely reorders paths vs hop-count BFS
    (recursive_graph_reachability). Scale shape: each round is one
    frontier⋈edges equi-join + one min-agg — the frontier frame is
    checkpointed per round to cut lineage; rounds are sequential but
    each is fully distributed; unbounded closures belong to the
    imperative CC loop with convergence detection."""
    from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        o.filter(F.col("o_orderkey") % 20 == 0)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    edges = (
        e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .withColumn(
            "w",
            1
            + F.expr(
                "CAST(conv(substr(md5(concat(src, '>', dst)), 1, 4),"
                " 16, 10) AS BIGINT)"
            )
            % 9,
        )
        .localCheckpoint(eager=False)
    )
    dist = (
        edges.agg(F.min("src").alias("node"))
        .select("node", F.lit(0).cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    for _ in range(3):
        relaxed = (
            dist.join(edges, dist["node"] == edges["src"])
            .select(
                edges["dst"].alias("node"),
                (dist["d"] + edges["w"]).alias("d"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=False)
        )
    return dist.select("node", F.col("d").alias("dist")).orderBy(
        "dist", "node"
    )


_STREAM_SESSION_ORACLE = """
WITH offs AS (SELECT unnest(range(0, 120)) AS o),
r AS (
  SELECT o % 3 AS user_id,
         o + (o // 12) * 30 AS t_min,
         o // 12 AS block
  FROM offs
),
sess AS (
  SELECT user_id, block,
         CAST(min(t_min) AS BIGINT) AS session_start_min,
         max(t_min) + 10 AS session_end_min,
         count(*) AS n_events
  FROM r GROUP BY user_id, block
),
wm AS (SELECT max(t_min) - 10 AS fin FROM r)
SELECT CAST(s.user_id AS BIGINT) AS user_id,
       s.session_start_min,
       s.n_events
FROM sess s, wm
WHERE s.session_end_min <= wm.fin
ORDER BY user_id, session_start_min
"""


@_register("streaming_session_windows", _STREAM_SESSION_ORACLE)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time SESSION WINDOWS on a real stream with a full value
    oracle: a paced offset_log drain (40-offset micro-batches) whose
    event times jump 30 minutes every 12 offsets, sessionized per user
    with a 10-minute gap in APPEND mode. Two semantics are exercised
    and value-checked: (1) sessions that SPAN micro-batch boundaries
    (the 12-offset activity blocks are misaligned with the 40-offset
    batches) must MERGE in the state store before emission — the
    operation fixed windows never need; (2) append emits exactly the
    sessions the final watermark has closed (end = last event + gap ≤
    max event time − delay), so the last activity block stays open and
    out of the sink. The construction puts every session boundary ≥22
    minutes from the watermark cut, far from any tie. The batch
    equivalent is `sessionization_stats`; this entry proves the
    STREAMING state machine produces the batch answer."""
    import uuid

    from nyc_taxi_data_pipeline_spark.sources.pydatasource import (
        register_offset_log,
    )
    from nyc_taxi_data_pipeline_spark.streaming.sinks import run_stream_to_memory

    register_offset_log(spark)
    stream = (
        spark.readStream.format("offset_log")
        .option("partitions", 1)
        .option("n_rows", 120)
        .option("rows_per_batch", 40)
        .load()
    )
    ev = stream.select(
        (F.col("offset") % 3).alias("user_id"),
        (
            F.col("ts")
            + F.expr("(offset div 12) * INTERVAL '30' MINUTE")
        )
        .cast("timestamp")
        .alias("t_eff"),
    ).withWatermark("t_eff", "10 minutes")
    agg = ev.groupBy(
        "user_id", F.session_window("t_eff", "10 minutes")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    sink = run_stream_to_memory(
        agg, f"sess_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    return sink.select(
        "user_id",
        (
            (
                F.unix_timestamp(F.col("session_window.start"))
                - F.unix_timestamp(base)
            )
            / 60
        )
        .cast("long")
        .alias("session_start_min"),
        "n_events",
    ).orderBy("user_id", "session_start_min")


_DECAYED_TOPK_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS c
  FROM events GROUP BY 1, 2
),
anchor AS (SELECT max(d) AS dmax FROM daily),
scored AS (
  SELECT user_id,
         CAST(sum(c * (CAST(1 AS BIGINT)
                       << (30 - datediff('day', d, a.dmax)))) AS BIGINT)
           AS decayed_score,
         CAST(sum(c) AS BIGINT) AS raw_events,
         count(*) AS active_days
  FROM daily, anchor a
  GROUP BY user_id
)
SELECT CAST(row_number() OVER (ORDER BY decayed_score DESC, user_id)
            AS INTEGER) AS rank,
       user_id, decayed_score, raw_events, active_days
FROM scored
ORDER BY decayed_score DESC, user_id
LIMIT 10
"""


@_register("decayed_topk_trending", _DECAYED_TOPK_ORACLE)
def decayed_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRENDING top-k with exponential time decay — the
    recency-weighted leaderboard (feed ranking, trending hashtags,
    hot-partition detection) done in EXACT integer arithmetic: a
    1-day half-life weight 2^(−age_days) is applied as the integer
    shift c·2^(30−age), so the decayed scores are bit-identical
    cross-engine and the ranking itself carries a full value oracle —
    float exp() decay pipelines can't be cross-checked and their sums
    drift with partitioning. Raw totals ride along to show the decay
    genuinely reorders users vs lifetime counts. Scale shape: one
    (user, day) partial-aggregated rollup, the anchor date broadcast,
    one mergeable weighted sum per user, TakeOrderedAndProject for the
    top-10 — no global sort, no window over the corpus; the decayed
    sum is mergeable across shards/days because the weight depends
    only on (day, anchor)."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    anchor = daily.agg(F.max("d").alias("dmax"))
    scored = (
        daily.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.col("c")
                * F.expr(
                    "shiftleft(CAST(1 AS BIGINT), 30 - datediff(dmax, d))"
                )
            )
            .cast("long")
            .alias("decayed_score"),
            F.sum("c").cast("long").alias("raw_events"),
            F.count(F.lit(1)).alias("active_days"),
        )
    )
    top = scored.orderBy(F.col("decayed_score").desc(), "user_id").limit(10)
    wr = W.orderBy(F.col("decayed_score").desc(), "user_id")
    return top.select(
        F.row_number().over(wr).alias("rank"),
        "user_id",
        "decayed_score",
        "raw_events",
        "active_days",
    ).orderBy("rank")


_SIMPSON_ORACLE = """
WITH c AS (
  SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(sum(n * n) AS BIGINT) AS sum_sq,
         count(*) AS n_langs
  FROM c GROUP BY source
)
SELECT source, n_docs, n_langs,
       (n_docs * n_docs - sum_sq) * 1000000 // (n_docs * n_docs)
         AS simpson_diversity_ppm
FROM tot
ORDER BY source
"""


@_register("diversity_simpson_by_source", _SIMPSON_ORACLE)
def diversity_simpson_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-Simpson diversity index per corpus source — 1 − Σp² (the
    probability two random docs differ in language), the standard
    corpus-composition diversity report next to
    `corpus_health_by_source`'s top-lang share. Computed as the exact
    integer (n² − Σc²)·10⁶ div n², so the index needs no logarithms
    (unlike Shannon entropy) and carries a full value oracle. Scale
    shape: one (source, lang) partial-aggregated count, one tiny
    per-source rollup — both mergeable; nothing touches the driver."""
    c = (
        _t(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_sq"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    return tot.select(
        "source",
        "n_docs",
        "n_langs",
        F.expr(
            "(n_docs * n_docs - sum_sq) * 1000000 div (n_docs * n_docs)"
        ).alias("simpson_diversity_ppm"),
    ).orderBy("source")


# ===========================================================================
# Wave: exact-integer monitoring / nonparametric stats / graph rounds / ML
# eval — change-point screen, rank-sum AUC, label propagation, k-core,
# one-rule classifier, temperature dataset mixing.
# ===========================================================================

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
ref AS (
  SELECT event_type,
         CAST(sum(c) // count(*) AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1
),
dev AS (
  SELECT d.event_type, d.d, r.k, r.n_days,
         CAST(sum(d.c - r.k)
              OVER (PARTITION BY d.event_type ORDER BY d.d) AS BIGINT) AS ct
  FROM daily d JOIN ref r ON r.event_type = d.event_type
),
s AS (
  SELECT event_type, d, k, n_days,
         CAST(ct - least(CAST(0 AS BIGINT),
                         min(ct) OVER (PARTITION BY event_type ORDER BY d))
              AS BIGINT) AS st
  FROM dev
)
SELECT event_type, n_days, k AS ref_daily,
       st AS cusum_peak, d AS peak_day,
       CASE WHEN st >= 3 * k THEN 1 ELSE 0 END AS alarm
FROM s
QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY st DESC, d) = 1
ORDER BY event_type
"""


@_register("cusum_changepoint_screen", _CUSUM_ORACLE)
def cusum_changepoint_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point screen over per-event-type daily
    volumes — the drift detector that catches a sustained upward shift
    a plain threshold misses. The recursion S_t = max(0, S_{t-1} +
    (x_t − k)) is rewritten into its closed window form S_t = C_t −
    min(0, min_{j≤t} C_j) (C = running cumsum of deviations from the
    integer reference rate k = floor(mean daily count)), so the whole
    screen is TWO window passes sharing one (event_type) shuffle —
    no recursion, no UDF, and every value is exact BIGINT arithmetic,
    giving the detector itself a full value oracle. Emits per stream
    the peak CUSUM statistic, the day it peaks (earliest on ties), and
    an alarm flag at the 3k threshold. Scale shape: the corpus
    collapses to one (event_type, day) partial-aggregated rollup;
    windows run per event_type over |days| rows — bounded frames, no
    global sort."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    ref = daily.groupBy("event_type").agg(
        F.expr("sum(c) div count(*)").cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    dev = daily.join(ref, "event_type").select(
        "event_type",
        "d",
        "k",
        "n_days",
        F.sum(F.col("c") - F.col("k")).over(wcum).cast("long").alias("ct"),
    )
    s = dev.select(
        "event_type",
        "d",
        "k",
        "n_days",
        (
            F.col("ct")
            - F.least(F.lit(0).cast("long"), F.min("ct").over(wcum))
        )
        .cast("long")
        .alias("st"),
    )
    wpk = W.partitionBy("event_type").orderBy(F.col("st").desc(), "d")
    return (
        s.withColumn("rk", F.row_number().over(wpk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "n_days",
            F.col("k").alias("ref_daily"),
            F.col("st").alias("cusum_peak"),
            F.col("d").alias("peak_day"),
            F.when(F.col("st") >= 3 * F.col("k"), 1).otherwise(0).alias(
                "alarm"
            ),
        )
        .orderBy("event_type")
    )


_RANKSUM_ORACLE = """
WITH binned AS (
  SELECT event_type, CAST(floor(value) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS n_ev
  FROM events GROUP BY 1, 2
),
vals AS (
  SELECT v, CAST(sum(n_ev) AS BIGINT) AS n_v FROM binned GROUP BY v
),
ranked AS (
  SELECT v, n_v,
         CAST(sum(n_v) OVER (ORDER BY v) - n_v AS BIGINT) AS cum_before
  FROM vals
),
per_group AS (
  SELECT b.event_type,
         CAST(sum(b.n_ev) AS BIGINT) AS n_self,
         CAST(sum(b.n_ev * (2 * r.cum_before + r.n_v + 1)) AS BIGINT) AS r2
  FROM binned b JOIN ranked r ON r.v = b.v
  GROUP BY b.event_type
),
tot AS (SELECT CAST(sum(n_self) AS BIGINT) AS n_all FROM per_group)
SELECT event_type, n_self,
       CAST(n_all - n_self AS BIGINT) AS n_rest,
       CAST(r2 - n_self * (n_self + 1) AS BIGINT) AS u2,
       CAST((r2 - n_self * (n_self + 1)) * 500000
            // (n_self * (n_all - n_self)) AS BIGINT) AS auc_ppm
FROM per_group, tot
ORDER BY event_type
"""


@_register("rank_sum_auc_by_event_type", _RANKSUM_ORACLE)
def rank_sum_auc_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney rank-sum test, one-vs-rest per event stream, with
    the common-language effect size (= AUC: the probability a random
    value from this stream exceeds a random value from the rest).
    Exact to the bit: tie-averaged ranks are carried DOUBLED (rank2 =
    2·cum_before + n_ties + 1, always integer), so U-statistics and
    the AUC in ppm are pure BIGINT — the nonparametric drift test next
    to `chisq_independence_screen`'s categorical one. Values are
    binned to integer units first, which is what makes the scale
    shape: the corpus collapses to a (event_type, bin) mergeable
    rollup (bounded bins), the rank window runs over the tiny distinct-
    bin frame only, and the U aggregation is one more mergeable pass —
    the global sort a naive rank() over raw doubles would need never
    happens. u2·10⁶ stays in BIGINT up to ~sf1; beyond that the same
    plan rides DECIMAL(38,0) lanes."""
    binned = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.floor("value").cast("long").alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ev"))
        .localCheckpoint(eager=False)
    )
    vals = binned.groupBy("v").agg(F.sum("n_ev").cast("long").alias("n_v"))
    # the distinct-bin frame is bounded (integer units of `value`), so a
    # single-partition cumulative window over it is deliberate and tiny
    wv = (
        W.partitionBy(F.lit(1))
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = vals.select(
        "v",
        "n_v",
        (F.sum("n_v").over(wv) - F.col("n_v")).cast("long").alias(
            "cum_before"
        ),
    )
    per_group = (
        binned.join(ranked, "v")
        .groupBy("event_type")
        .agg(
            F.sum("n_ev").cast("long").alias("n_self"),
            F.sum(
                F.col("n_ev")
                * (2 * F.col("cum_before") + F.col("n_v") + 1)
            )
            .cast("long")
            .alias("r2"),
        )
    )
    tot = per_group.agg(F.sum("n_self").cast("long").alias("n_all"))
    u2 = F.col("r2") - F.col("n_self") * (F.col("n_self") + 1)
    return (
        per_group.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_self",
            (F.col("n_all") - F.col("n_self")).cast("long").alias("n_rest"),
            u2.cast("long").alias("u2"),
            F.expr(
                "CAST((r2 - n_self * (n_self + 1)) * 500000"
                " div (n_self * (n_all - n_self)) AS BIGINT)"
            ).alias("auc_ppm"),
        )
        .orderBy("event_type")
    )


_LPA_ORACLE = """
WITH e0 AS (
  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey % 20 = 0
),
edges AS (
  SELECT src, dst FROM e0
  UNION
  SELECT dst AS src, src AS dst FROM e0
),
lab0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
v1 AS (
  SELECT e.dst AS node, l.lbl, count(*) AS c
  FROM edges e JOIN lab0 l ON l.node = e.src
  GROUP BY 1, 2
),
lab1 AS (
  SELECT node, lbl FROM v1
  QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) = 1
),
v2 AS (
  SELECT e.dst AS node, l.lbl, count(*) AS c
  FROM edges e JOIN lab1 l ON l.node = e.src
  GROUP BY 1, 2
),
lab2 AS (
  SELECT node, lbl FROM v2
  QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) = 1
),
v3 AS (
  SELECT e.dst AS node, l.lbl, count(*) AS c
  FROM edges e JOIN lab2 l ON l.node = e.src
  GROUP BY 1, 2
),
lab3 AS (
  SELECT node, lbl FROM v3
  QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) = 1
)
SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members,
       min(node) AS first_member
FROM lab3 GROUP BY lbl
ORDER BY n_members DESC, community
LIMIT 25
"""


@_register("label_propagation_communities", _LPA_ORACLE)
def label_propagation_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Synchronous label propagation (community detection) on the
    customer-supplier co-purchase graph: every node starts as its own
    label; each round a node adopts the label most frequent among its
    neighbors (smallest label on ties — the determinism rule that
    makes LPA oracle-able; textbook LPA random-ties cannot be
    cross-checked). Both engines run EXACTLY 3 synchronous rounds —
    the bounded-k trick (same as `sssp_weighted_frontier` /
    `pagerank_supplier_graph`) that turns an iterative algorithm into
    a full value oracle even where it has not converged. Spark side is
    the production shape: per-round neighbor-label count (one
    equi-join + one partial-agg) and a per-node argmax window, frames
    localCheckpoint'ed per round to cut lineage; rounds are sequential
    but each is fully distributed. The oracle unrolls the identical 3
    rounds as CTEs. Top communities by size; hub suppliers absorb
    their customer neighborhoods within 2 rounds."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e0 = (
        o.filter(F.col("o_orderkey") % 20 == 0)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    edges = (
        e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    wmaj = W.partitionBy("node").orderBy(F.col("c").desc(), "lbl")
    for _ in range(3):
        votes = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(edges["dst"].alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rk", F.row_number().over(wmaj))
            .filter(F.col("rk") == 1)
            .select("node", "lbl")
            .localCheckpoint(eager=False)
        )
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("node").alias("first_member"),
        )
        .orderBy(F.col("n_members").desc(), "community")
        .limit(25)
    )


_KCORE_ORACLE = """
WITH e0 AS (
  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey % 20 = 0
),
edges0 AS (
  SELECT src, dst FROM e0
  UNION
  SELECT dst AS src, src AS dst FROM e0
),
deg0 AS (SELECT src AS node, count(*) AS deg FROM edges0 GROUP BY 1),
surv1 AS (SELECT node FROM deg0 WHERE deg >= 2),
edges1 AS (
  SELECT e.src, e.dst FROM edges0 e
  WHERE e.src IN (SELECT node FROM surv1)
    AND e.dst IN (SELECT node FROM surv1)
),
deg1 AS (SELECT src AS node, count(*) AS deg FROM edges1 GROUP BY 1),
surv2 AS (SELECT node FROM deg1 WHERE deg >= 2),
edges2 AS (
  SELECT e.src, e.dst FROM edges1 e
  WHERE e.src IN (SELECT node FROM surv2)
    AND e.dst IN (SELECT node FROM surv2)
),
deg2 AS (SELECT src AS node, count(*) AS deg FROM edges2 GROUP BY 1),
surv3 AS (SELECT node FROM deg2 WHERE deg >= 2),
edges3 AS (
  SELECT e.src, e.dst FROM edges2 e
  WHERE e.src IN (SELECT node FROM surv3)
    AND e.dst IN (SELECT node FROM surv3)
),
deg3 AS (SELECT src AS node, count(*) AS deg FROM edges3 GROUP BY 1)
SELECT CAST(deg AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_nodes,
       min(node) AS first_node
FROM deg3 GROUP BY deg
ORDER BY degree
"""


@_register("kcore_decomposition", _KCORE_ORACLE)
def kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core peeling on the co-purchase graph: iteratively delete
    nodes of degree < 2 (with their edges) — the standard prune before
    any community/cycle analysis, and the graph analog of dead-code
    elimination. Both engines run EXACTLY 3 peel rounds (bounded-k, so
    the intermediate state is value-oracle-checkable even if the peel
    has not reached fixpoint); each round is one degree partial-agg +
    two LEFT SEMI joins restricting the edge list to surviving
    endpoints — no row ever leaves the JVM, the edge frame is
    localCheckpoint'ed per round. Output is the degree histogram of
    the surviving core (min node per degree as a witness). At 100 TB
    the peel is the same join loop per round; convergence detection
    (count unchanged) bounds total rounds by the graph's degeneracy
    ordering depth."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e0 = (
        o.filter(F.col("o_orderkey") % 20 == 0)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    edges = (
        e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(3):
        surv = (
            edges.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= 2)
            .select("node")
            # consumed by BOTH semi joins below; AQE stage reuse does not
            # fire for derived frames, so pin it once
            .localCheckpoint(eager=False)
        )
        edges = (
            edges.join(
                surv, edges["src"] == surv["node"], "left_semi"
            )
            .join(
                surv.select(F.col("node").alias("node2")),
                F.col("dst") == F.col("node2"),
                "left_semi",
            )
            .localCheckpoint(eager=False)
        )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    return (
        deg.groupBy(F.col("deg").cast("long").alias("degree"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").alias("first_node"),
        )
        .orderBy("degree")
    )


_ONE_RULE_ORACLE = """
WITH feats AS (
  SELECT doc_id, lang, 'source' AS feature, source AS fval FROM documents
  UNION ALL
  SELECT doc_id, lang, 'len_bucket' AS feature,
         CAST(n_chars // 200 AS VARCHAR) AS fval
  FROM documents
),
train AS (SELECT * FROM feats WHERE (doc_id // 20) % 2 = 0),
test  AS (SELECT * FROM feats WHERE (doc_id // 20) % 2 = 1),
maj AS (
  SELECT feature, fval, lang AS pred, count(*) AS c
  FROM train GROUP BY 1, 2, 3
  QUALIFY row_number()
          OVER (PARTITION BY feature, fval ORDER BY c DESC, lang) = 1
),
gmaj AS (
  SELECT feature, lang AS gpred, count(*) AS c
  FROM train GROUP BY 1, 2
  QUALIFY row_number() OVER (PARTITION BY feature ORDER BY c DESC, lang) = 1
),
scored AS (
  SELECT t.feature,
         CASE WHEN coalesce(m.pred, g.gpred) = t.lang THEN 1 ELSE 0 END AS ok
  FROM test t
  LEFT JOIN maj m ON m.feature = t.feature AND m.fval = t.fval
  JOIN gmaj g ON g.feature = t.feature
)
SELECT feature, CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(ok) AS BIGINT) AS n_correct,
       CAST(sum(ok) * 1000000 // count(*) AS BIGINT) AS accuracy_ppm
FROM scored GROUP BY feature
ORDER BY feature
"""


@_register("one_rule_classifier_eval", _ONE_RULE_ORACLE)
def one_rule_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holte's 1R classifier with a real train/test protocol, entirely
    in exact counting arithmetic: split documents by the source-decorrelated key (doc_id div 20) % 2
    (plain doc_id parity would alias the split with source = doc_id % 20,
    leaving every test-side source value unseen),
    learn the majority language per feature value on train (smallest
    language on ties — the determinism rule), back off to the train-
    global majority for unseen values, score held-out accuracy per
    candidate feature in ppm. This is the baseline every learned
    quality/language classifier must beat, and because training IS a
    grouped count + argmax, the whole train-predict-evaluate loop has
    a full value oracle — the same protocol `knn_label_eval` applies
    to embeddings, here for categorical/bucketed features. Scale
    shape: train collapses to a (feature, value, lang) mergeable count
    rollup; the learned rule tables are tiny and broadcast into the
    test-side join; one final mergeable accuracy aggregate. No Python,
    no global sort."""
    docs = _t(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        "lang",
        F.lit("source").alias("feature"),
        F.col("source").alias("fval"),
    ).unionByName(
        docs.select(
            "doc_id",
            "lang",
            F.lit("len_bucket").alias("feature"),
            F.expr("CAST(n_chars div 200 AS STRING)").alias("fval"),
        )
    ).localCheckpoint(eager=False)
    train = feats.filter(F.expr("(doc_id div 20) % 2") == 0)
    test = feats.filter(F.expr("(doc_id div 20) % 2") == 1)
    wv = W.partitionBy("feature", "fval").orderBy(F.col("c").desc(), "lang")
    maj = (
        train.groupBy("feature", "fval", F.col("lang").alias("pred"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rk", F.row_number().over(
            W.partitionBy("feature", "fval").orderBy(
                F.col("c").desc(), "pred"
            )
        ))
        .filter(F.col("rk") == 1)
        .select("feature", "fval", "pred")
    )
    gmaj = (
        train.groupBy("feature", F.col("lang").alias("gpred"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rk", F.row_number().over(
            W.partitionBy("feature").orderBy(F.col("c").desc(), "gpred")
        ))
        .filter(F.col("rk") == 1)
        .select("feature", "gpred")
    )
    scored = (
        test.join(F.broadcast(maj), ["feature", "fval"], "left")
        .join(F.broadcast(gmaj), "feature")
        .select(
            "feature",
            F.when(
                F.coalesce(F.col("pred"), F.col("gpred")) == F.col("lang"),
                1,
            )
            .otherwise(0)
            .alias("ok"),
        )
    )
    return (
        scored.groupBy("feature")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum("ok").cast("long").alias("n_correct"),
            F.expr(
                "CAST(sum(ok) * 1000000 div count(*) AS BIGINT)"
            ).alias("accuracy_ppm"),
        )
        .orderBy("feature")
    )


_MIX_TEMP_ORACLE = """
WITH src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
),
w AS (
  SELECT source, n_docs,
         CASE
           WHEN (s0 + 1) * (s0 + 1) <= n_docs THEN s0 + 1
           WHEN s0 * s0 > n_docs THEN s0 - 1
           ELSE s0
         END AS wt
  FROM (
    SELECT source, n_docs,
           CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS s0
    FROM src
  )
),
tot AS (
  SELECT CAST(sum(wt) AS BIGINT) AS tot_w,
         CAST(sum(n_docs) AS BIGINT) AS tot_docs
  FROM w
),
shares AS (
  SELECT source, n_docs, wt,
         CAST((100000 * wt) // tot_w AS BIGINT) AS floor_quota,
         CAST((100000 * wt) % tot_w AS BIGINT) AS rem,
         tot_docs
  FROM w, tot
),
ranked AS (
  SELECT source, n_docs, wt, floor_quota, tot_docs,
         row_number() OVER (ORDER BY rem DESC, source) AS rk,
         CAST(100000 - sum(floor_quota) OVER () AS BIGINT) AS leftover
  FROM shares
)
SELECT source, n_docs, CAST(wt AS BIGINT) AS weight_isqrt,
       CAST(floor_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS quota,
       CAST(n_docs * 1000000 // tot_docs AS BIGINT) AS prop_share_ppm,
       CAST((floor_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
            * 10 AS BIGINT) AS mix_share_ppm
FROM ranked
ORDER BY source
"""


@_register("dataset_mix_temperature", _MIX_TEMP_ORACLE)
def dataset_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened dataset mixing (τ = 2): per-source
    sampling weights ∝ n^(1/τ) = isqrt(n), apportioned to a fixed
    100k-sample budget by largest remainder — the multilingual-
    pretraining recipe (upsample the tail, downsample the head)
    made exact: the integer square root is floor(sqrt(n)) CORRECTED
    by neighbor-square checks, so a last-ulp libm sqrt can never skew
    a weight, and quotas sum exactly to budget (Hamilton, as in
    `quota_allocation_largest_remainder` — that entry is τ = 1, this
    is the τ = 2 flattening next to it; compare prop_share_ppm vs
    mix_share_ppm to see head sources shed share to tail sources).
    Scale shape: one mergeable per-source count, all remaining
    arithmetic on the |sources|-row frame."""
    budget = F.lit(100_000).cast("long")
    src = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = (
        src.withColumn(
            "s0",
            F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("long"),
        )
        .select(
            "source",
            "n_docs",
            F.expr(
                "CASE WHEN (s0 + 1) * (s0 + 1) <= n_docs THEN s0 + 1 "
                "WHEN s0 * s0 > n_docs THEN s0 - 1 ELSE s0 END"
            )
            .cast("long")
            .alias("wt"),
        )
        # tiny |sources|-row frame consumed by tot, shares, and ranked —
        # pin it once (AQE stage reuse does not fire for derived frames)
        .localCheckpoint(eager=False)
    )
    tot = w.agg(
        F.sum("wt").cast("long").alias("tot_w"),
        F.sum("n_docs").cast("long").alias("tot_docs"),
    )
    shares = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "wt",
        F.expr("CAST((100000 * wt) div tot_w AS BIGINT)").alias(
            "floor_quota"
        ),
        F.expr("CAST((100000 * wt) % tot_w AS BIGINT)").alias("rem"),
        "tot_docs",
    )
    spent = shares.agg(F.sum("floor_quota").cast("long").alias("spent"))
    ranked = shares.crossJoin(F.broadcast(spent)).select(
        "source",
        "n_docs",
        "wt",
        "floor_quota",
        "tot_docs",
        F.row_number()
        .over(W.partitionBy(F.lit(1)).orderBy(F.col("rem").desc(), "source"))
        .alias("rk"),
        (budget - F.col("spent")).cast("long").alias("leftover"),
    )
    quota = (
        F.col("floor_quota")
        + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
    ).cast("long")
    return ranked.select(
        "source",
        "n_docs",
        F.col("wt").cast("long").alias("weight_isqrt"),
        quota.alias("quota"),
        F.expr("CAST(n_docs * 1000000 div tot_docs AS BIGINT)").alias(
            "prop_share_ppm"
        ),
        (quota * 10).cast("long").alias("mix_share_ppm"),
    ).orderBy("source")


# ===========================================================================
# Wave: exact-integer ML evaluation + survival + market-basket + link
# analysis — Naive Bayes eval, Nelson-Aalen hazard, Apriori triples, HITS,
# calibration bins, Gini-gain feature ranking.
# ===========================================================================

_NB_ORACLE = """
WITH docs AS (
  SELECT doc_id, lang, source,
         CAST(n_chars // 300 AS BIGINT) AS lb
  FROM documents
),
train AS (SELECT * FROM docs WHERE (doc_id // 20) % 2 = 0),
test  AS (SELECT * FROM docs WHERE (doc_id // 20) % 2 = 1),
nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM train GROUP BY 1),
ntr AS (SELECT CAST(count(*) AS BIGINT) AS n_train FROM train),
v1 AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS nv1 FROM train),
v2 AS (SELECT CAST(count(DISTINCT lb) AS BIGINT) AS nv2 FROM train),
c1 AS (
  SELECT lang AS cl1, source AS s1, CAST(count(*) AS BIGINT) AS cs
  FROM train GROUP BY 1, 2
),
c2 AS (
  SELECT lang AS cl2, lb AS b2, CAST(count(*) AS BIGINT) AS cb
  FROM train GROUP BY 1, 2
),
langs AS (
  SELECT lang AS cand, n_lang,
         CAST(n_lang * 1000000 // n_train AS BIGINT) AS prior_e6,
         nv1, nv2
  FROM nl, ntr, v1, v2
),
scored AS (
  SELECT t.doc_id, t.lang AS true_lang, g.cand,
         CAST(g.prior_e6
              * ((coalesce(c1.cs, 0) + 1) * 1000000 // (g.n_lang + g.nv1))
              * ((coalesce(c2.cb, 0) + 1) * 1000000 // (g.n_lang + g.nv2))
              AS BIGINT) AS score
  FROM test t
  CROSS JOIN langs g
  LEFT JOIN c1 ON c1.cl1 = g.cand AND c1.s1 = t.source
  LEFT JOIN c2 ON c2.cl2 = g.cand AND c2.b2 = t.lb
),
pred AS (
  SELECT doc_id, true_lang, cand AS pred_lang FROM scored
  QUALIFY row_number()
          OVER (PARTITION BY doc_id ORDER BY score DESC, cand) = 1
)
SELECT true_lang AS lang,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       CAST(sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS accuracy_ppm
FROM pred GROUP BY 1
ORDER BY lang
"""


@_register("naive_bayes_lang_eval", _NB_ORACLE)
def naive_bayes_lang_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier with a real
    train/predict/evaluate protocol, entirely in BIGINT arithmetic:
    split documents by the source-decorrelated key (doc_id div 20) % 2
    (plain doc_id parity would alias the split with source = doc_id % 20,
    leaving every test-side source value unseen), learn Laplace-smoothed
    conditional probabilities p(feature|lang) for two features
    (source, 300-char length bucket) plus the class prior on train —
    every probability carried as an exact ppm integer
    ((c+1)·10⁶ div (n_lang+V)) — and score held-out docs by the
    3-factor product prior·p₁·p₂ (≤ 10¹⁸, inside BIGINT), argmax
    with smallest-language tie-break. Per-language held-out accuracy
    in ppm. The probabilistic sibling of `one_rule_classifier_eval`
    (same split, same backoff discipline — unseen values get the
    pure-smoothing mass 1·10⁶ div (n_lang+V) via the LEFT JOIN
    coalesce). Scale shape: training collapses to (lang, value)
    mergeable count rollups; the learned model (|langs|·|values| rows)
    is broadcast into the test-side scoring join; the 5-way
    cross-join-with-candidates is a broadcast nested loop over a
    5-row frame, then one window argmax per doc and one mergeable
    accuracy aggregate. No Python, no global sort."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.expr("n_chars div 300").cast("long").alias("lb"),
    )
    train = docs.filter(F.expr("(doc_id div 20) % 2") == 0).localCheckpoint(eager=False)
    test = docs.filter(F.expr("(doc_id div 20) % 2") == 1)
    nl = train.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_lang"))
    ntr = train.agg(F.count(F.lit(1)).cast("long").alias("n_train"))
    v1 = train.agg(F.countDistinct("source").cast("long").alias("nv1"))
    v2 = train.agg(F.countDistinct("lb").cast("long").alias("nv2"))
    langs = (
        nl.crossJoin(F.broadcast(ntr))
        .crossJoin(F.broadcast(v1))
        .crossJoin(F.broadcast(v2))
        .select(
            F.col("lang").alias("cand"),
            "n_lang",
            F.expr("CAST(n_lang * 1000000 div n_train AS BIGINT)").alias(
                "prior_e6"
            ),
            "nv1",
            "nv2",
        )
    )
    c1 = train.groupBy(
        F.col("lang").alias("cl1"), F.col("source").alias("s1")
    ).agg(F.count(F.lit(1)).cast("long").alias("cs"))
    c2 = train.groupBy(
        F.col("lang").alias("cl2"), F.col("lb").alias("b2")
    ).agg(F.count(F.lit(1)).cast("long").alias("cb"))
    scored = (
        test.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(c1),
            (F.col("cl1") == F.col("cand")) & (F.col("s1") == F.col("source")),
            "left",
        )
        .join(
            F.broadcast(c2),
            (F.col("cl2") == F.col("cand")) & (F.col("b2") == F.col("lb")),
            "left",
        )
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            "cand",
            F.expr(
                "CAST(prior_e6"
                " * ((coalesce(cs, 0) + 1) * 1000000 div (n_lang + nv1))"
                " * ((coalesce(cb, 0) + 1) * 1000000 div (n_lang + nv2))"
                " AS BIGINT)"
            ).alias("score"),
        )
    )
    wdoc = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand")
    pred = (
        scored.withColumn("rk", F.row_number().over(wdoc))
        .filter(F.col("rk") == 1)
        .select("doc_id", "true_lang", F.col("cand").alias("pred_lang"))
    )
    ok = F.when(F.col("pred_lang") == F.col("true_lang"), 1).otherwise(0)
    return (
        pred.groupBy(F.col("true_lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(ok).cast("long").alias("n_correct"),
            F.expr(
                "CAST(sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)"
                " * 1000000 div count(*) AS BIGINT)"
            ).alias("accuracy_ppm"),
        )
        .orderBy("lang")
    )


_NA_HAZARD_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(min(o_orderdate) AS DATE),
                        CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS span,
         CAST(max(o_orderdate) AS DATE) AS last_d
  FROM orders GROUP BY 1
),
mx AS (SELECT max(last_d) AS mxd, CAST(count(*) AS BIGINT) AS n_total FROM cust),
lab AS (
  SELECT c.span,
         CASE WHEN c.last_d < m.mxd - INTERVAL 30 DAY THEN 1 ELSE 0 END AS ev,
         m.n_total
  FROM cust c, mx m
),
byt AS (
  SELECT span, n_total,
         CAST(sum(ev) AS BIGINT) AS d_events,
         CAST(count(*) AS BIGINT) AS m_at
  FROM lab GROUP BY span, n_total
),
risk AS (
  SELECT span, d_events,
         CAST(n_total - (sum(m_at) OVER (ORDER BY span) - m_at)
              AS BIGINT) AS n_at_risk
  FROM byt
),
haz AS (
  SELECT span, d_events, n_at_risk,
         CAST(CASE WHEN d_events > 0
                   THEN d_events * 1000000 // n_at_risk ELSE 0 END
              AS BIGINT) AS inc_ppm
  FROM risk
)
, cum AS (
  SELECT span, d_events, n_at_risk, inc_ppm,
         CAST(sum(inc_ppm) OVER (ORDER BY span) AS BIGINT) AS cum_ppm
  FROM haz
)
SELECT span AS span_days, n_at_risk, d_events,
       inc_ppm AS hazard_inc_ppm, cum_ppm AS cum_hazard_ppm
FROM cum
WHERE d_events > 0
ORDER BY span_days
"""


@_register("nelson_aalen_hazard", _NA_HAZARD_ORACLE)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over customer order-
    activity lifetimes — the survival curve behind churn/retention
    analysis, chosen over Kaplan-Meier because its estimator is a SUM
    of per-event-time rationals (Σ d_i/n_i), not a product, so carried
    as exact floor-div ppm integers it gets a full value oracle.
    Lifetime = days between a customer's first and last order; a
    customer whose last order predates the global max by >30 days is
    an observed churn event, the rest are right-censored (the standard
    censoring construction when observation simply ends). Risk set
    n_i (customers with lifetime ≥ t_i) falls out of ONE descending
    cumulative count — no per-time self-join. Scale shape: the corpus
    collapses to a per-customer mergeable min/max aggregate, then a
    (distinct lifetime)-row frame — bounded by the calendar span in
    days — on which the two cumulative windows run single-partition by
    construction (documented tiny-frame exception, same class as
    `rank_sum_auc_by_event_type`'s rank window)."""
    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            )
            .cast("long")
            .alias("span"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        )
    )
    mx = cust.agg(
        F.max("last_d").alias("mxd"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )
    lab = cust.crossJoin(F.broadcast(mx)).select(
        "span",
        F.when(F.col("last_d") < F.date_sub(F.col("mxd"), 30), 1)
        .otherwise(0)
        .alias("ev"),
        "n_total",
    )
    byt = lab.groupBy("span", "n_total").agg(
        F.sum("ev").cast("long").alias("d_events"),
        F.count(F.lit(1)).cast("long").alias("m_at"),
    )
    # tiny distinct-lifetime frame (bounded by calendar days): the
    # single-partition cumulative windows below are deliberate
    wasc = (
        W.partitionBy(F.lit(1))
        .orderBy("span")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    risk = byt.select(
        "span",
        "d_events",
        (F.col("n_total") - (F.sum("m_at").over(wasc) - F.col("m_at")))
        .cast("long")
        .alias("n_at_risk"),
    )
    haz = risk.select(
        "span",
        "d_events",
        "n_at_risk",
        F.expr(
            "CAST(CASE WHEN d_events > 0"
            " THEN d_events * 1000000 div n_at_risk ELSE 0 END AS BIGINT)"
        ).alias("inc_ppm"),
    )
    return (
        haz.select(
            F.col("span").alias("span_days"),
            "n_at_risk",
            "d_events",
            F.col("inc_ppm").alias("hazard_inc_ppm"),
            F.sum("inc_ppm").over(wasc).cast("long").alias(
                "cum_hazard_ppm"
            ),
        )
        .filter(F.col("d_events") > 0)
        .orderBy("span_days")
    )


_APRIORI_ORACLE = """
WITH b AS (
  SELECT DISTINCT l_orderkey AS o, CAST(l_partkey % 50 AS BIGINT) AS cat
  FROM lineitem
),
nb AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_baskets FROM b),
ms AS (SELECT greatest(CAST(1 AS BIGINT), n_baskets // 1500) AS minsup,
              n_baskets
       FROM nb),
t AS (
  SELECT b1.cat AS item_a, b2.cat AS item_b, b3.cat AS item_c,
         CAST(count(*) AS BIGINT) AS support
  FROM b b1
  JOIN b b2 ON b2.o = b1.o AND b2.cat > b1.cat
  JOIN b b3 ON b3.o = b1.o AND b3.cat > b2.cat
  GROUP BY 1, 2, 3
)
SELECT t.item_a, t.item_b, t.item_c, t.support,
       CAST(t.support * 1000000 // m.n_baskets AS BIGINT) AS support_ppm
FROM t, ms m
WHERE t.support >= m.minsup
ORDER BY t.support DESC, t.item_a, t.item_b, t.item_c
LIMIT 25
"""


@_register("apriori_frequent_triples", _APRIORI_ORACLE)
def apriori_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-wise Apriori over order baskets (items = part-category
    l_partkey % 50): frequent 1-itemsets → frequent pairs → candidate
    triples generated by prefix-joining frequent pairs and PRUNED by
    the downward-closure property (every 2-subset must be frequent)
    BEFORE any counting touches the data — the candidate set, not the
    data, bounds the expensive final count. The relative support
    threshold (n_baskets div 1500, threaded in as a broadcast column,
    never a driver collect) keeps the entry scale-invariant. The
    ORACLE deliberately states the naive all-triples enumeration +
    filter: Apriori's pruning provably returns the identical set, and
    the cross-engine match executes that proof. Scale shape: L1/L2 are
    mergeable count rollups; candidate generation and subset pruning
    run on the tiny frequent-pair frame (broadcast); the triple count
    is the in-basket 3-way self-equi-join on order id restricted by a
    broadcast semi-join to surviving candidates — per-basket work is
    C(|basket|,3) bounded, no cross join anywhere."""
    b = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"),
            (F.col("l_partkey") % 50).cast("long").alias("cat"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nb = b.agg(F.countDistinct("o").cast("long").alias("n_baskets"))
    ms = nb.select(
        F.greatest(F.lit(1).cast("long"), F.expr("n_baskets div 1500")).alias(
            "minsup"
        ),
        "n_baskets",
    )
    l1 = (
        b.groupBy("cat")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        .crossJoin(F.broadcast(ms))
        .filter(F.col("sup") >= F.col("minsup"))
        .select("cat")
    )
    bf = b.join(F.broadcast(l1), "cat", "left_semi").localCheckpoint(
        eager=False
    )
    b1 = bf.select("o", F.col("cat").alias("ca"))
    b2 = bf.select("o", F.col("cat").alias("cb"))
    l2 = (
        b1.join(b2, "o")
        .filter(F.col("cb") > F.col("ca"))
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        .crossJoin(F.broadcast(ms))
        .filter(F.col("sup") >= F.col("minsup"))
        .select("ca", "cb")
        .localCheckpoint(eager=False)
    )
    # candidate triples: prefix join (a,b)+(a,c) with b<c, then the
    # downward-closure prune — (b,c) must itself be a frequent pair
    cand = (
        l2.select(F.col("ca").alias("item_a"), F.col("cb").alias("item_b"))
        .join(
            l2.select(
                F.col("ca").alias("item_a"), F.col("cb").alias("item_c")
            ),
            "item_a",
        )
        .filter(F.col("item_c") > F.col("item_b"))
        .join(
            F.broadcast(
                l2.select(
                    F.col("ca").alias("item_b"), F.col("cb").alias("item_c")
                )
            ),
            ["item_b", "item_c"],
            "left_semi",
        )
    )
    t3 = (
        bf.select("o", F.col("cat").alias("item_a"))
        .join(bf.select("o", F.col("cat").alias("item_b")), "o")
        .filter(F.col("item_b") > F.col("item_a"))
        .join(bf.select("o", F.col("cat").alias("item_c")), "o")
        .filter(F.col("item_c") > F.col("item_b"))
        .join(F.broadcast(cand), ["item_a", "item_b", "item_c"], "left_semi")
        .groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    return (
        t3.crossJoin(F.broadcast(ms))
        .filter(F.col("support") >= F.col("minsup"))
        .select(
            "item_a",
            "item_b",
            "item_c",
            "support",
            F.expr("CAST(support * 1000000 div n_baskets AS BIGINT)").alias(
                "support_ppm"
            ),
        )
        .orderBy(F.col("support").desc(), "item_a", "item_b", "item_c")
        .limit(25)
    )


_HITS_ORACLE = """
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey % 10 = 0
),
a1 AS (
  SELECT s, CAST(count(*) * 1000000 AS BIGINT) AS a FROM e GROUP BY s
),
a1n AS (
  SELECT s, CAST(a * 1000000 // (SELECT max(a) FROM a1) AS BIGINT) AS an
  FROM a1
),
h1 AS (
  SELECT e.c, CAST(sum(n.an) AS BIGINT) AS h
  FROM e JOIN a1n n ON n.s = e.s GROUP BY e.c
),
h1n AS (
  SELECT c, CAST(h * 1000000 // (SELECT max(h) FROM h1) AS BIGINT) AS hn
  FROM h1
),
a2 AS (
  SELECT e.s, CAST(sum(n.hn) AS BIGINT) AS a,
         CAST(count(*) AS BIGINT) AS indeg
  FROM e JOIN h1n n ON n.c = e.c GROUP BY e.s
)
SELECT s AS suppkey, indeg,
       CAST(a * 1000000 // (SELECT max(a) FROM a2) AS BIGINT) AS authority_e6
FROM a2
ORDER BY authority_e6 DESC, suppkey
LIMIT 15
"""


@_register("hits_hub_authority", _HITS_ORACLE)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg's HITS on the customer→supplier purchase graph: two
    mutual-reinforcement rounds (authority = Σ hub scores of pointing
    customers, hub = Σ authority of pointed-to suppliers), each round
    max-normalized to the 10⁶ grid by BIGINT floor division — the
    scaled-integer discipline that makes an iterative eigenvector-ish
    algorithm bit-exact cross-engine (same trick as
    `pagerank_supplier_graph`; HITS differs in being bipartite-dual,
    so hubs and authorities are distinct score vectors). Top
    authorities with in-degree alongside — degree and authority
    DISAGREE where a supplier's customers are themselves
    low-hub-score, which is the point of the algorithm. Scale shape:
    each half-round is one equi-join + one mergeable partial-agg; the
    normalizing max is a 1-row broadcast aggregate; rounds are
    sequential, each fully distributed; the edge frame is
    localCheckpoint'ed once and reused by all four half-rounds."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    a1 = e.groupBy("s").agg(
        (F.count(F.lit(1)) * 1_000_000).cast("long").alias("a")
    )
    a1 = a1.localCheckpoint(eager=False)
    a1n = a1.crossJoin(F.broadcast(a1.agg(F.max("a").alias("mxa")))).select(
        "s", F.expr("CAST(a * 1000000 div mxa AS BIGINT)").alias("an")
    )
    h1 = (
        e.join(a1n, "s")
        .groupBy("c")
        .agg(F.sum("an").cast("long").alias("h"))
        .localCheckpoint(eager=False)
    )
    h1n = h1.crossJoin(F.broadcast(h1.agg(F.max("h").alias("mxh")))).select(
        "c", F.expr("CAST(h * 1000000 div mxh AS BIGINT)").alias("hn")
    )
    a2 = (
        e.join(h1n, "c")
        .groupBy("s")
        .agg(
            F.sum("hn").cast("long").alias("a"),
            F.count(F.lit(1)).cast("long").alias("indeg"),
        )
        .localCheckpoint(eager=False)
    )
    return (
        a2.crossJoin(F.broadcast(a2.agg(F.max("a").alias("mxa2"))))
        .select(
            F.col("s").alias("suppkey"),
            "indeg",
            F.expr("CAST(a * 1000000 div mxa2 AS BIGINT)").alias(
                "authority_e6"
            ),
        )
        .orderBy(F.col("authority_e6").desc(), "suppkey")
        .limit(15)
    )


_CALIBRATION_ORACLE = """
WITH docs AS (
  SELECT doc_id, source, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
train AS (SELECT * FROM docs WHERE (doc_id // 20) % 2 = 0),
test  AS (SELECT * FROM docs WHERE (doc_id // 20) % 2 = 1),
rate AS (
  SELECT source,
         CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS p_ppm
  FROM train GROUP BY 1
),
grate AS (
  SELECT CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS g_ppm FROM train
),
scored AS (
  SELECT t.y, coalesce(r.p_ppm, g.g_ppm) AS pred_ppm
  FROM test t LEFT JOIN rate r ON r.source = t.source CROSS JOIN grate g
)
SELECT least(pred_ppm // 100000, CAST(9 AS BIGINT)) AS bin,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(pred_ppm) // count(*) AS BIGINT) AS mean_pred_ppm,
       CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS obs_pos_ppm,
       CAST(abs(sum(pred_ppm) // count(*)
                - sum(y) * 1000000 // count(*)) AS BIGINT) AS abs_gap_ppm
FROM scored
GROUP BY 1
ORDER BY bin
"""


@_register("calibration_reliability_bins", _CALIBRATION_ORACLE)
def calibration_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (calibration curve) for a probabilistic
    classifier, in exact counting arithmetic: train an empirical
    per-source P(lang='en') on the (doc_id div 20) % 2 == 0 half
    (source-decorrelated split; ppm integers), score the
    held-out half, bucket predictions into deciles, and compare mean
    predicted probability against the observed positive rate per bin —
    |gap| is each bin's expected-calibration-error contribution. A
    well-calibrated scorer puts obs≈pred in every bin; this empirical-
    rate scorer is calibrated BY construction on train, so the gaps
    measure pure train/test drift — the quality-score-audit pattern
    (is the model's '0.9' actually 90%?) every LLM data-filtering
    pipeline needs before thresholding on a learned score. Unseen
    sources back off to the train-global rate (LEFT JOIN + coalesce,
    same discipline as `one_rule_classifier_eval`). Scale shape: the
    rate table is a mergeable per-source rollup broadcast into the
    test scan; binning + the final rollup is one mergeable aggregate;
    integer floor-div everywhere — the curve itself value-checks."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    train = docs.filter(F.expr("(doc_id div 20) % 2") == 0).localCheckpoint(eager=False)
    test = docs.filter(F.expr("(doc_id div 20) % 2") == 1)
    rate = train.groupBy("source").agg(
        F.expr("CAST(sum(y) * 1000000 div count(*) AS BIGINT)").alias("p_ppm")
    )
    grate = train.agg(
        F.expr("CAST(sum(y) * 1000000 div count(*) AS BIGINT)").alias("g_ppm")
    )
    scored = (
        test.join(F.broadcast(rate), "source", "left")
        .crossJoin(F.broadcast(grate))
        .select(
            "y", F.coalesce(F.col("p_ppm"), F.col("g_ppm")).alias("pred_ppm")
        )
    )
    return (
        scored.groupBy(
            F.least(
                F.expr("pred_ppm div 100000"), F.lit(9).cast("long")
            ).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.expr("CAST(sum(pred_ppm) div count(*) AS BIGINT)").alias(
                "mean_pred_ppm"
            ),
            F.expr("CAST(sum(y) * 1000000 div count(*) AS BIGINT)").alias(
                "obs_pos_ppm"
            ),
            F.expr(
                "CAST(abs(sum(pred_ppm) div count(*)"
                " - sum(y) * 1000000 div count(*)) AS BIGINT)"
            ).alias("abs_gap_ppm"),
        )
        .orderBy("bin")
    )


_GINI_GAIN_ORACLE = """
WITH feats AS (
  SELECT 'source' AS feature, source AS fval, lang FROM documents
  UNION ALL
  SELECT 'len_bucket', CAST(n_chars // 200 AS VARCHAR), lang FROM documents
  UNION ALL
  SELECT 'id_noise', CAST(doc_id % 7 AS VARCHAR), lang FROM documents
),
parent AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * c) AS BIGINT) AS sq
  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY lang)
),
pg AS (
  SELECT n, CAST((n * n - sq) * 1000000 // (n * n) AS BIGINT) AS parent_ppm
  FROM parent
),
cell AS (
  SELECT feature, fval, CAST(count(*) AS BIGINT) AS c
  FROM feats GROUP BY feature, fval, lang
),
pv AS (
  SELECT feature, fval,
         CAST(sum(c) AS BIGINT) AS n_v,
         CAST(sum(c * c) AS BIGINT) AS sq_v
  FROM cell GROUP BY 1, 2
),
child AS (
  SELECT p.feature,
         CAST(count(*) AS BIGINT) AS n_values,
         CAST(sum((p.n_v * p.n_v - p.sq_v) * 1000000
                  // (g.n * p.n_v)) AS BIGINT) AS child_gini_ppm
  FROM pv p, pg g
  GROUP BY p.feature, g.n
)
SELECT c.feature, c.n_values, g.parent_ppm AS parent_gini_ppm,
       c.child_gini_ppm,
       CAST(g.parent_ppm - c.child_gini_ppm AS BIGINT) AS gain_ppm,
       CAST(row_number()
            OVER (ORDER BY g.parent_ppm - c.child_gini_ppm DESC, c.feature)
            AS BIGINT) AS rank
FROM child c, pg g
ORDER BY rank
"""


@_register("gini_gain_feature_ranking", _GINI_GAIN_ORACLE)
def gini_gain_feature_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-tree-style feature ranking by exact Gini impurity
    reduction for predicting document language — the split-quality
    measure that needs NO logarithms (Gini = (n²−Σc²)/n² is pure
    integer rational, unlike entropy/information-gain, so the ranking
    itself carries a full value oracle; `chisq_independence_screen` is
    the hypothesis-test cousin). Candidate features: source,
    200-char length bucket, and doc_id % 7 as a deliberate NOISE
    CONTROL establishing the overfitting floor: any feature whose gain
    sits at that floor carries no real signal. In this corpus `source`
    clears the floor by >3×, while `len_bucket` lands AT it (length is
    independent of language) — and the floor itself is NONZERO and
    grows with feature cardinality (Gini gain's classic
    more-values-more-gain bias: 7-value hash noise out-gains the
    3-value signal-free bucket), which is exactly what the control
    column makes visible.
    Weighted child impurity is Σ_v (n_v²−Σ_l c_vl²)·10⁶ div (n·n_v):
    per-value floor-div terms summed in BIGINT, deterministic on both
    engines. Scale shape: one long-format featurization scan, a
    (feature, value, lang) mergeable count rollup, then all arithmetic
    on the tiny distinct-value frame; the parent impurity is a 1-row
    broadcast. BIGINT holds to ~sf10 (n²·10⁶ ≤ 2.5·10¹⁷); beyond that
    the identical plan rides DECIMAL(38,0) lanes."""
    docs = _t(spark, sf_dir, "documents")
    feats = (
        docs.select(
            F.lit("source").alias("feature"),
            F.col("source").alias("fval"),
            "lang",
        )
        .unionByName(
            docs.select(
                F.lit("len_bucket").alias("feature"),
                F.expr("CAST(n_chars div 200 AS STRING)").alias("fval"),
                "lang",
            )
        )
        .unionByName(
            docs.select(
                F.lit("id_noise").alias("feature"),
                F.expr("CAST(doc_id % 7 AS STRING)").alias("fval"),
                "lang",
            )
        )
    )
    parent = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sq"),
        )
        .select(
            "n",
            F.expr(
                "CAST((n * n - sq) * 1000000 div (n * n) AS BIGINT)"
            ).alias("parent_ppm"),
        )
    )
    cell = feats.groupBy("feature", "fval", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pv = cell.groupBy("feature", "fval").agg(
        F.sum("c").cast("long").alias("n_v"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq_v"),
    )
    child = (
        pv.crossJoin(F.broadcast(parent))
        .groupBy("feature", "parent_ppm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.sum(
                F.expr("(n_v * n_v - sq_v) * 1000000 div (n * n_v)")
            )
            .cast("long")
            .alias("child_gini_ppm"),
        )
    )
    wrank = W.partitionBy(F.lit(1)).orderBy(
        (F.col("parent_ppm") - F.col("child_gini_ppm")).desc(), "feature"
    )
    return child.select(
        "feature",
        "n_values",
        F.col("parent_ppm").alias("parent_gini_ppm"),
        "child_gini_ppm",
        (F.col("parent_ppm") - F.col("child_gini_ppm")).cast("long").alias(
            "gain_ppm"
        ),
        F.row_number().over(wrank).cast("long").alias("rank"),
    ).orderBy("rank")


# ===========================================================================
# Wave: drift testing, rule mining, distributed bootstrap, storage cost
# modelling, causal estimators — KS two-sample, association rules, Poisson
# bootstrap CI, Elias-gamma delta audit, DiD, stratified ATE.
# ===========================================================================

_KS_ORACLE = """
WITH e AS (
  SELECT event_type, CAST(floor(value) AS BIGINT) AS v,
         CASE WHEN epoch_us(ts) <
                   (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                    FROM events)
              THEN 1 ELSE 0 END AS early
  FROM events
),
binned AS (
  SELECT event_type, v,
         CAST(sum(early) AS BIGINT) AS c1,
         CAST(sum(1 - early) AS BIGINT) AS c2
  FROM e GROUP BY 1, 2
),
tot AS (
  SELECT event_type,
         CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2
  FROM binned GROUP BY 1
),
cum AS (
  SELECT b.event_type, b.v, t.n1, t.n2,
         CAST(sum(b.c1) OVER (PARTITION BY b.event_type ORDER BY b.v)
              AS BIGINT) AS c1cum,
         CAST(sum(b.c2) OVER (PARTITION BY b.event_type ORDER BY b.v)
              AS BIGINT) AS c2cum
  FROM binned b JOIN tot t ON t.event_type = b.event_type
),
dstat AS (
  SELECT event_type, n1, n2, v,
         CAST(abs(c1cum * n2 - c2cum * n1) AS BIGINT) AS dn
  FROM cum
),
best AS (
  SELECT event_type, n1, n2, dn AS d_num, v AS d_at_value
  FROM dstat
  QUALIFY row_number()
          OVER (PARTITION BY event_type ORDER BY dn DESC, v) = 1
)
SELECT event_type,
       n1 AS n_early, n2 AS n_late, d_num,
       CAST(d_num * 1000000 // (n1 * n2) AS BIGINT) AS d_ppm,
       d_at_value,
       CASE WHEN CAST(d_num AS DECIMAL(19,0)) * CAST(d_num AS DECIMAL(19,0))
                 * 10000
               > CAST(18496 AS DECIMAL(19,0)) * CAST(n1 + n2 AS DECIMAL(19,0))
                 * CAST(n1 AS DECIMAL(19,0)) * CAST(n2 AS DECIMAL(19,0))
            THEN 1 ELSE 0 END AS alarm_05
FROM best
ORDER BY event_type
"""


@_register("ks_test_two_sample", _KS_ORACLE)
def ks_test_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test per event stream,
    early half vs late half of the time range (split at the epoch-
    microsecond midpoint — identical integers on both engines):
    D = max_v |F̂₁(v) − F̂₂(v)| over integer-binned values, carried as
    the EXACT cross-multiplied numerator max|c1cum·n2 − c2cum·n1| so
    no rational ever becomes a float — the distribution-shape
    companion to `rank_sum_auc_by_event_type` (location shift) and
    `distribution_drift_psi` (binned divergence). The α=0.05 alarm
    avoids the sqrt in D > 1.36·√((n1+n2)/(n1·n2)) by comparing
    SQUARES in DECIMAL(19,0)→(38,0) lanes: D_num²·10⁴ >
    18496·(n1+n2)·n1·n2 — exact on both engines. Scale shape: the
    corpus collapses to a (event_type, integer-bin) mergeable rollup;
    cumulative windows run per stream over the bounded distinct-bin
    frame; one argmax window picks the D-attaining value (earliest on
    ties)."""
    ev = _t(spark, sf_dir, "events")
    mid = ev.agg(
        (
            (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
            / F.lit(2)
        )
        .cast("long")
        .alias("mid_us")
    )
    e = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.floor("value").cast("long").alias("v"),
        F.when(F.unix_micros("ts") < F.col("mid_us"), 1)
        .otherwise(0)
        .alias("early"),
    )
    binned = e.groupBy("event_type", "v").agg(
        F.sum("early").cast("long").alias("c1"),
        F.sum(1 - F.col("early")).cast("long").alias("c2"),
    ).localCheckpoint(eager=False)
    tot = binned.groupBy("event_type").agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = binned.join(tot, "event_type").select(
        "event_type",
        "v",
        "n1",
        "n2",
        F.sum("c1").over(wcum).cast("long").alias("c1cum"),
        F.sum("c2").over(wcum).cast("long").alias("c2cum"),
    )
    dstat = cum.select(
        "event_type",
        "n1",
        "n2",
        "v",
        F.abs(F.col("c1cum") * F.col("n2") - F.col("c2cum") * F.col("n1"))
        .cast("long")
        .alias("dn"),
    )
    wbest = W.partitionBy("event_type").orderBy(F.col("dn").desc(), "v")
    best = (
        dstat.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "n1",
            "n2",
            F.col("dn").alias("d_num"),
            F.col("v").alias("d_at_value"),
        )
    )
    return best.select(
        "event_type",
        F.col("n1").alias("n_early"),
        F.col("n2").alias("n_late"),
        "d_num",
        F.expr("CAST(d_num * 1000000 div (n1 * n2) AS BIGINT)").alias(
            "d_ppm"
        ),
        "d_at_value",
        F.expr(
            "CASE WHEN CAST(d_num AS DECIMAL(19,0))"
            " * CAST(d_num AS DECIMAL(19,0)) * 10000"
            " > CAST(18496 AS DECIMAL(19,0)) * CAST(n1 + n2 AS DECIMAL(19,0))"
            " * CAST(n1 AS DECIMAL(19,0)) * CAST(n2 AS DECIMAL(19,0))"
            " THEN 1 ELSE 0 END"
        ).alias("alarm_05"),
    ).orderBy("event_type")


_ASSOC_RULES_ORACLE = """
WITH b AS (
  SELECT DISTINCT l_orderkey AS o, CAST(l_partkey % 50 AS BIGINT) AS cat
  FROM lineitem
),
nb AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_baskets FROM b),
ms AS (SELECT greatest(CAST(1 AS BIGINT), n_baskets // 1500) AS minsup,
              n_baskets
       FROM nb),
i1 AS (SELECT cat, CAST(count(*) AS BIGINT) AS sup FROM b GROUP BY 1),
p2 AS (
  SELECT b1.cat AS pa, b2.cat AS pb, CAST(count(*) AS BIGINT) AS sup
  FROM b b1 JOIN b b2 ON b2.o = b1.o AND b2.cat > b1.cat
  GROUP BY 1, 2
),
t3 AS (
  SELECT b1.cat AS a, b2.cat AS bb, b3.cat AS c,
         CAST(count(*) AS BIGINT) AS sup3
  FROM b b1
  JOIN b b2 ON b2.o = b1.o AND b2.cat > b1.cat
  JOIN b b3 ON b3.o = b1.o AND b3.cat > b2.cat
  GROUP BY 1, 2, 3
),
ft AS (SELECT t.* FROM t3 t, ms m WHERE t.sup3 >= m.minsup),
rules AS (
  SELECT a AS ante_a, bb AS ante_b, c AS conseq, sup3 FROM ft
  UNION ALL
  SELECT a, c, bb, sup3 FROM ft
  UNION ALL
  SELECT bb, c, a, sup3 FROM ft
),
scored AS (
  SELECT r.ante_a, r.ante_b, r.conseq, r.sup3,
         p.sup AS sup_ante, i.sup AS sup_conseq,
         CAST(r.sup3 * 1000000 // p.sup AS BIGINT) AS confidence_ppm,
         CAST((r.sup3 * 1000000 // p.sup) * m.n_baskets // i.sup
              AS BIGINT) AS lift_ppm
  FROM rules r
  JOIN p2 p ON p.pa = least(r.ante_a, r.ante_b)
           AND p.pb = greatest(r.ante_a, r.ante_b)
  JOIN i1 i ON i.cat = r.conseq
  CROSS JOIN ms m
)
SELECT ante_a, ante_b, conseq, sup3 AS support,
       confidence_ppm, lift_ppm
FROM scored
ORDER BY confidence_ppm DESC, ante_a, ante_b, conseq
LIMIT 20
"""


@_register("association_rules_from_triples", _ASSOC_RULES_ORACLE)
def association_rules_from_triples(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Association rules {a,b}→c mined from the frequent triples of
    `apriori_frequent_triples` (same baskets, same relative support
    threshold): every frequent triple unpivots into its three
    2-antecedent rules, scored by exact integer confidence
    (sup(abc)·10⁶ div sup(ab) — downward closure guarantees the
    antecedent pair exists in the pair-support table) and lift
    (confidence·n_baskets div sup(c), i.e. how much the consequent's
    probability is raised over its base rate; 10⁶ = independence).
    Top 20 rules by confidence. Scale shape: pair/triple supports are
    the same bounded in-basket self-equi-joins as the Apriori entry;
    the unpivot runs on the tiny frequent-triple frame; rule scoring
    joins two broadcast support tables; TakeOrderedAndProject caps the
    output. The recommendation/bundling surface on top of the
    frequent-itemset machinery."""
    b = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"),
            (F.col("l_partkey") % 50).cast("long").alias("cat"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nb = b.agg(F.countDistinct("o").cast("long").alias("n_baskets"))
    ms = nb.select(
        F.greatest(F.lit(1).cast("long"), F.expr("n_baskets div 1500")).alias(
            "minsup"
        ),
        "n_baskets",
    )
    i1 = b.groupBy("cat").agg(F.count(F.lit(1)).cast("long").alias("sup"))
    p2 = (
        b.select("o", F.col("cat").alias("pa"))
        .join(b.select("o", F.col("cat").alias("pb")), "o")
        .filter(F.col("pb") > F.col("pa"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
    )
    t3 = (
        b.select("o", F.col("cat").alias("a"))
        .join(b.select("o", F.col("cat").alias("bb")), "o")
        .filter(F.col("bb") > F.col("a"))
        .join(b.select("o", F.col("cat").alias("c")), "o")
        .filter(F.col("c") > F.col("bb"))
        .groupBy("a", "bb", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("sup3"))
    )
    ft = (
        t3.crossJoin(F.broadcast(ms))
        .filter(F.col("sup3") >= F.col("minsup"))
        .select("a", "bb", "c", "sup3", "n_baskets")
        .localCheckpoint(eager=False)
    )
    rules = (
        ft.select(
            F.col("a").alias("ante_a"),
            F.col("bb").alias("ante_b"),
            F.col("c").alias("conseq"),
            "sup3",
            "n_baskets",
        )
        .unionByName(
            ft.select(
                F.col("a").alias("ante_a"),
                F.col("c").alias("ante_b"),
                F.col("bb").alias("conseq"),
                "sup3",
                "n_baskets",
            )
        )
        .unionByName(
            ft.select(
                F.col("bb").alias("ante_a"),
                F.col("c").alias("ante_b"),
                F.col("a").alias("conseq"),
                "sup3",
                "n_baskets",
            )
        )
    )
    scored = (
        rules.join(
            F.broadcast(p2),
            (F.col("pa") == F.least("ante_a", "ante_b"))
            & (F.col("pb") == F.greatest("ante_a", "ante_b")),
        )
        .join(
            F.broadcast(i1.withColumnRenamed("sup", "sup_conseq")),
            F.col("cat") == F.col("conseq"),
        )
        .select(
            "ante_a",
            "ante_b",
            "conseq",
            F.col("sup3").alias("support"),
            F.expr("CAST(sup3 * 1000000 div sup AS BIGINT)").alias(
                "confidence_ppm"
            ),
            F.expr(
                "CAST((sup3 * 1000000 div sup) * n_baskets div sup_conseq"
                " AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    return scored.orderBy(
        F.col("confidence_ppm").desc(), "ante_a", "ante_b", "conseq"
    ).limit(20)


_BOOTSTRAP_ORACLE = """
WITH base AS (
  SELECT o_orderpriority AS priority, o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
rep AS (
  SELECT b.priority, b.cents, r.b AS rep_id,
         CAST('0x' || substr(md5(CAST(b.k AS VARCHAR) || ':'
                                 || CAST(r.b AS VARCHAR)), 1, 12)
              AS BIGINT) % 10000 AS m
  FROM base b CROSS JOIN (SELECT unnest(range(0, 64)) AS b) r
),
w AS (
  SELECT priority, cents, rep_id,
         CASE WHEN m < 3679 THEN 0 WHEN m < 7358 THEN 1
              WHEN m < 9197 THEN 2 WHEN m < 9810 THEN 3
              WHEN m < 9963 THEN 4 WHEN m < 9994 THEN 5
              WHEN m < 9999 THEN 6 ELSE 7 END AS wt
  FROM rep
),
means AS (
  SELECT priority, rep_id,
         CAST(sum(wt * cents) // sum(wt) AS BIGINT) AS mean_b
  FROM w GROUP BY 1, 2
),
ranked AS (
  SELECT priority, mean_b,
         row_number() OVER (PARTITION BY priority
                            ORDER BY mean_b, rep_id) AS rk
  FROM means
),
ci AS (
  SELECT priority,
         max(CASE WHEN rk = 2 THEN mean_b END) AS ci_lo_cents,
         max(CASE WHEN rk = 63 THEN mean_b END) AS ci_hi_cents
  FROM ranked GROUP BY 1
),
pt AS (
  SELECT priority, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
  FROM base GROUP BY 1
)
SELECT p.priority, p.n_orders, p.mean_cents,
       CAST(c.ci_lo_cents AS BIGINT) AS ci_lo_cents,
       CAST(c.ci_hi_cents AS BIGINT) AS ci_hi_cents,
       CAST(c.ci_hi_cents - c.ci_lo_cents AS BIGINT) AS ci_width_cents
FROM pt p JOIN ci c ON c.priority = p.priority
ORDER BY p.priority
"""


@_register("poisson_bootstrap_ci", _BOOTSTRAP_ORACLE)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE distributed bootstrap: 64 Poisson(1) resampling replicates
    of the mean order value per priority class, with a 2nd/63rd
    order-statistic ~95% confidence interval. Classic bootstrap
    resampling needs the global n per draw (undistributable);
    Poisson bootstrap replaces each row's multinomial count with an
    independent Poisson(1) weight, so a replicate is ONE weighted
    aggregate — embarrassingly parallel and streaming-mergeable. The
    weights are DETERMINISTIC here: md5(orderkey:replicate) mod 10⁴
    inverted through the literal Poisson(1) CDF (3679, 7358, 9197,
    9810, 9963, 9994, 9999 — capped at 7), which is what gives a
    Monte-Carlo method a full cross-engine value oracle; replicate
    means are exact integer cents (weighted sum floor-div weighted
    count). Scale shape: the 64× row expansion is a JVM-side explode
    feeding ONE partial-aggregated shuffle to (priority, replicate) —
    64·|priorities| groups; the CI rank window runs on the 64-row
    per-priority frame; point estimates ride a separate tiny rollup,
    broadcast-joined."""
    base = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    rep = base.select(
        "priority",
        "cents",
        "k",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("rep_id"),
    ).select(
        "priority",
        "cents",
        "rep_id",
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(k AS STRING), ':',"
            " CAST(rep_id AS STRING))), 1, 12), 16, 10) AS BIGINT) % 10000"
        ).alias("m"),
    )
    w = rep.select(
        "priority",
        "cents",
        "rep_id",
        F.expr(
            "CASE WHEN m < 3679 THEN 0 WHEN m < 7358 THEN 1"
            " WHEN m < 9197 THEN 2 WHEN m < 9810 THEN 3"
            " WHEN m < 9963 THEN 4 WHEN m < 9994 THEN 5"
            " WHEN m < 9999 THEN 6 ELSE 7 END"
        )
        .cast("long")
        .alias("wt"),
    )
    means = w.groupBy("priority", "rep_id").agg(
        F.expr("CAST(sum(wt * cents) div sum(wt) AS BIGINT)").alias("mean_b")
    )
    wrk = W.partitionBy("priority").orderBy("mean_b", "rep_id")
    ranked = means.withColumn("rk", F.row_number().over(wrk))
    ci = ranked.groupBy("priority").agg(
        F.max(F.when(F.col("rk") == 2, F.col("mean_b"))).alias(
            "ci_lo_cents"
        ),
        F.max(F.when(F.col("rk") == 63, F.col("mean_b"))).alias(
            "ci_hi_cents"
        ),
    )
    pt = base.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr("CAST(sum(cents) div count(*) AS BIGINT)").alias(
            "mean_cents"
        ),
    )
    return (
        pt.join(F.broadcast(ci), "priority")
        .select(
            "priority",
            "n_orders",
            "mean_cents",
            F.col("ci_lo_cents").cast("long").alias("ci_lo_cents"),
            F.col("ci_hi_cents").cast("long").alias("ci_hi_cents"),
            (F.col("ci_hi_cents") - F.col("ci_lo_cents"))
            .cast("long")
            .alias("ci_width_cents"),
        )
        .orderBy("priority")
    )


_DELTA_ENC_ORACLE = """
WITH ids AS (
  SELECT event_type, event_id,
         event_id - lag(event_id)
             OVER (PARTITION BY event_type ORDER BY event_id) AS delta
  FROM events
),
costs AS (
  SELECT event_type, delta,
         CAST(2 * (length(bin(delta)) - 1) + 1 AS BIGINT) AS gamma_bits
  FROM ids WHERE delta IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_deltas,
       CAST(sum(gamma_bits) AS BIGINT) AS gamma_total_bits,
       CAST(count(*) * (length(bin(max(delta))) - 1 + 1)
            AS BIGINT) AS fixed_width_bits,
       CAST(count(*) * 64 AS BIGINT) AS raw_bits,
       CAST(sum(gamma_bits) * 1000000 // (count(*) * 64)
            AS BIGINT) AS gamma_ratio_ppm
FROM costs
GROUP BY event_type
ORDER BY event_type
"""


@_register("delta_encoding_compression_audit", _DELTA_ENC_ORACLE)
def delta_encoding_compression_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Storage-layout cost model for sorted-id columns: per event
    stream, delta-encode the sorted event ids and price each gap with
    the Elias-γ code (2·⌊log₂ d⌋ + 1 bits — the prefix-free code
    behind posting-list and parquet DELTA_BINARY_PACKED-style
    compression), against the fixed-width alternative (every delta at
    ⌊log₂ max_delta⌋+1 bits) and raw 64-bit storage. ⌊log₂⌋ is
    computed EXACTLY as length(bin(d))−1 — a string length, not libm —
    so the cost model itself carries a full value oracle. This is the
    audit that says whether sorting by id before writing a zone buys
    compression (interleaved streams → large gaps → γ loses to
    fixed-width; dense runs → γ wins). Scale shape: one lag window
    per stream (a single keyed shuffle), then a mergeable per-stream
    rollup; no data leaves the JVM."""
    ids = _t(spark, sf_dir, "events").select(
        "event_type",
        (
            F.col("event_id")
            - F.lag("event_id").over(
                W.partitionBy("event_type").orderBy("event_id")
            )
        ).alias("delta"),
    )
    costs = ids.filter(F.col("delta").isNotNull()).select(
        "event_type",
        "delta",
        F.expr("CAST(2 * (length(bin(delta)) - 1) + 1 AS BIGINT)").alias(
            "gamma_bits"
        ),
    )
    return (
        costs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_deltas"),
            F.sum("gamma_bits").cast("long").alias("gamma_total_bits"),
            F.expr(
                "CAST(count(*) * (length(bin(max(delta))) - 1 + 1)"
                " AS BIGINT)"
            ).alias("fixed_width_bits"),
            (F.count(F.lit(1)) * 64).cast("long").alias("raw_bits"),
            F.expr(
                "CAST(sum(gamma_bits) * 1000000 div (count(*) * 64)"
                " AS BIGINT)"
            ).alias("gamma_ratio_ppm"),
        )
        .orderBy("event_type")
    )


_DID_ORACLE = """
WITH mid AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid_us FROM events
),
e AS (
  SELECT event_type,
         CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END AS treated,
         CASE WHEN epoch_us(ts) >= m.mid_us THEN 1 ELSE 0 END AS post,
         CAST(round(value * 1000000) AS BIGINT) AS y
  FROM events, mid m
),
cells AS (
  SELECT event_type, treated, post,
         CAST(sum(y) // count(*) AS BIGINT) AS mean_micro
  FROM e GROUP BY 1, 2, 3
),
wide AS (
  SELECT event_type,
         max(CASE WHEN treated = 1 AND post = 0 THEN mean_micro END) AS t_pre,
         max(CASE WHEN treated = 1 AND post = 1 THEN mean_micro END) AS t_post,
         max(CASE WHEN treated = 0 AND post = 0 THEN mean_micro END) AS c_pre,
         max(CASE WHEN treated = 0 AND post = 1 THEN mean_micro END) AS c_post
  FROM cells GROUP BY 1
)
SELECT event_type,
       CAST(t_pre AS BIGINT) AS treated_pre_micro,
       CAST(t_post AS BIGINT) AS treated_post_micro,
       CAST(c_pre AS BIGINT) AS control_pre_micro,
       CAST(c_post AS BIGINT) AS control_post_micro,
       CAST((t_post - t_pre) - (c_post - c_pre) AS BIGINT) AS did_micro
FROM wide
ORDER BY event_type
"""


@_register("difference_in_differences", _DID_ORACLE)
def difference_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences causal estimator per event stream:
    treated cohort = user_id % 5 == 0 (a deterministic synthetic
    assignment), intervention at the epoch-microsecond midpoint of the
    stream, outcome = event value in exact micro-units
    (round(value·10⁶) — both engines round half away from zero).
    DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) removes both the
    time-invariant cohort gap and the cohort-invariant time trend; on
    this synthetic assignment the true effect is 0, so the reported
    did_micro is the estimator's finite-sample noise floor — the A/A
    test every experimentation pipeline should run before trusting a
    real readout. Cell means are floor-div integers (bias identical
    on both engines, bounded by 1 micro-unit). Scale shape: one
    mergeable (stream, treated, post) rollup — 4 cells per stream —
    then a 4-way conditional pivot on the tiny frame; the midpoint is
    a 1-row broadcast."""
    ev = _t(spark, sf_dir, "events")
    mid = ev.agg(
        (
            (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
            / F.lit(2)
        )
        .cast("long")
        .alias("mid_us")
    )
    e = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.when(F.col("user_id") % 5 == 0, 1).otherwise(0).alias("treated"),
        F.when(F.unix_micros("ts") >= F.col("mid_us"), 1)
        .otherwise(0)
        .alias("post"),
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("y"),
    )
    cells = e.groupBy("event_type", "treated", "post").agg(
        F.expr("CAST(sum(y) div count(*) AS BIGINT)").alias("mean_micro")
    )
    wide = cells.groupBy("event_type").agg(
        F.max(
            F.when((F.col("treated") == 1) & (F.col("post") == 0),
                   F.col("mean_micro"))
        ).alias("t_pre"),
        F.max(
            F.when((F.col("treated") == 1) & (F.col("post") == 1),
                   F.col("mean_micro"))
        ).alias("t_post"),
        F.max(
            F.when((F.col("treated") == 0) & (F.col("post") == 0),
                   F.col("mean_micro"))
        ).alias("c_pre"),
        F.max(
            F.when((F.col("treated") == 0) & (F.col("post") == 1),
                   F.col("mean_micro"))
        ).alias("c_post"),
    )
    return wide.select(
        "event_type",
        F.col("t_pre").cast("long").alias("treated_pre_micro"),
        F.col("t_post").cast("long").alias("treated_post_micro"),
        F.col("c_pre").cast("long").alias("control_pre_micro"),
        F.col("c_post").cast("long").alias("control_post_micro"),
        (
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre"))
        )
        .cast("long")
        .alias("did_micro"),
    ).orderBy("event_type")


_STRAT_ATE_ORACLE = """
WITH li AS (
  SELECT CAST(l_partkey % 50 AS BIGINT) AS stratum,
         CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS treated,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
cells AS (
  SELECT stratum, treated,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) // count(*) AS BIGINT) AS mean_cents
  FROM li GROUP BY 1, 2
),
wide AS (
  SELECT stratum,
         max(CASE WHEN treated = 1 THEN mean_cents END) AS mt,
         max(CASE WHEN treated = 0 THEN mean_cents END) AS mc,
         CAST(sum(n) AS BIGINT) AS n_s
  FROM cells GROUP BY 1
),
ok AS (SELECT * FROM wide WHERE mt IS NOT NULL AND mc IS NOT NULL),
g_all AS (
  SELECT CAST(sum(CASE WHEN treated = 1 THEN y END)
              // sum(CASE WHEN treated = 1 THEN 1 END) AS BIGINT) AS mt_all,
         CAST(sum(CASE WHEN treated = 0 THEN y END)
              // sum(CASE WHEN treated = 0 THEN 1 END) AS BIGINT) AS mc_all
  FROM li
)
SELECT CAST((SELECT count(*) FROM wide) AS BIGINT) AS n_strata,
       CAST((SELECT count(*) FROM wide) - count(*) AS BIGINT)
         AS n_dropped_strata,
       CAST(g.mt_all AS BIGINT) AS mean_treated_cents,
       CAST(g.mc_all AS BIGINT) AS mean_control_cents,
       CAST(g.mt_all - g.mc_all AS BIGINT) AS naive_diff_cents,
       CAST(sum(o.n_s * (o.mt - o.mc)) // sum(o.n_s) AS BIGINT)
         AS adjusted_diff_cents
FROM ok o, g_all g
GROUP BY g.mt_all, g.mc_all
"""


@_register("stratified_ate_adjustment", _STRAT_ATE_ORACLE)
def stratified_ate_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (exact-matching) average-treatment-effect estimator:
    treatment = deep discount (l_discount > 0.05), outcome = line
    revenue in exact cents, confounder = part category (l_partkey %
    50). The naive treated-vs-control mean gap is confounded by
    category mix; the adjusted estimate reweights the WITHIN-stratum
    gaps by stratum size (Σ n_s·(ȳ_Ts − ȳ_Cs) div Σ n_s) — the
    nonparametric backbone that propensity/IPW methods approximate,
    made exact here because every quantity is a count or a floor-div
    integer mean. Strata missing either arm are dropped (the
    positivity requirement) and COUNTED — silently ignoring them is
    the classic estimator bug. Scale shape: one mergeable (stratum,
    arm) rollup — 100 cells — then all estimator algebra on the tiny
    frame; the naive global means ride the same scan via conditional
    aggregates."""
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 50).cast("long").alias("stratum"),
        F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("treated"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("y"),
    ).localCheckpoint(eager=False)
    cells = li.groupBy("stratum", "treated").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(y) div count(*) AS BIGINT)").alias("mean_cents"),
    )
    wide = cells.groupBy("stratum").agg(
        F.max(F.when(F.col("treated") == 1, F.col("mean_cents"))).alias(
            "mt"
        ),
        F.max(F.when(F.col("treated") == 0, F.col("mean_cents"))).alias(
            "mc"
        ),
        F.sum("n").cast("long").alias("n_s"),
    ).localCheckpoint(eager=False)
    ok = wide.filter(F.col("mt").isNotNull() & F.col("mc").isNotNull())
    glob = li.agg(
        F.expr(
            "CAST(sum(CASE WHEN treated = 1 THEN y END)"
            " div sum(CASE WHEN treated = 1 THEN 1 END) AS BIGINT)"
        ).alias("mt_all"),
        F.expr(
            "CAST(sum(CASE WHEN treated = 0 THEN y END)"
            " div sum(CASE WHEN treated = 0 THEN 1 END) AS BIGINT)"
        ).alias("mc_all"),
    )
    n_strata = wide.agg(F.count(F.lit(1)).cast("long").alias("n_strata"))
    return (
        ok.agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.expr(
                "CAST(sum(n_s * (mt - mc)) div sum(n_s) AS BIGINT)"
            ).alias("adjusted_diff_cents"),
        )
        .crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(n_strata))
        .select(
            "n_strata",
            (F.col("n_strata") - F.col("n_kept")).cast("long").alias(
                "n_dropped_strata"
            ),
            F.col("mt_all").cast("long").alias("mean_treated_cents"),
            F.col("mc_all").cast("long").alias("mean_control_cents"),
            (F.col("mt_all") - F.col("mc_all")).cast("long").alias(
                "naive_diff_cents"
            ),
            "adjusted_diff_cents",
        )
    )


# ===========================================================================
# Wave: trend testing, categorical association, privacy risk, hybrid
# retrieval fusion, cooperative-game attribution — Mann-Kendall/Theil-Sen,
# Cramér's V², k-anonymity, RRF, Shapley channels.
# ===========================================================================

_MK_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn,
         CAST((b.c - a.c) * 1000000
              // date_diff('day', a.d, b.d) AS BIGINT) AS slope_e6,
         a.d AS d1, b.d AS d2
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.d > a.d
),
stat AS (
  SELECT event_type,
         CAST(sum(sgn) AS BIGINT) AS s_stat,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY 1
),
nd AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
),
ties AS (
  SELECT event_type,
         CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS corr
  FROM (
    SELECT event_type, CAST(count(*) AS BIGINT) AS t
    FROM daily GROUP BY event_type, c
  )
  WHERE t > 1
  GROUP BY event_type
),
sen AS (
  SELECT event_type, slope_e6 AS sen_slope_e6
  FROM (
    SELECT event_type, slope_e6,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY slope_e6, d1, d2) AS rk,
           count(*) OVER (PARTITION BY event_type) AS m
    FROM pairs
  )
  WHERE rk = (m + 1) // 2
)
SELECT s.event_type, n.n_days, s.n_pairs, s.s_stat,
       CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
            - coalesce(t.corr, 0) AS BIGINT) AS var18,
       CASE WHEN s.s_stat * s.s_stat * 180000
               > 38416 * (n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                          - coalesce(t.corr, 0))
            THEN 1 ELSE 0 END AS alarm_05,
       se.sen_slope_e6
FROM stat s
JOIN nd n ON n.event_type = s.event_type
LEFT JOIN ties t ON t.event_type = s.event_type
JOIN sen se ON se.event_type = s.event_type
ORDER BY s.event_type
"""


@_register("mann_kendall_theil_sen", _MK_ORACLE)
def mann_kendall_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test + Theil-Sen robust slope per
    event stream's daily volumes — the trend sibling of
    `cusum_changepoint_screen` (level shift) and
    `seasonal_naive_forecast_eval` (cyclic structure). S = Σ sign
    over all day pairs and the tie-corrected variance
    var18 = n(n−1)(2n+5) − Σ t(t−1)(2t+5) are pure integers; the
    α=0.05 alarm compares squares (S²·18·10⁴ > 1.96²·10⁴·var18) so
    no sqrt is evaluated. Theil-Sen is the LOWER MEDIAN of all
    pairwise slopes carried as (Δc·10⁶ div Δdays) integers (both
    engines truncate negative quotients toward zero identically).
    Scale shape: the corpus collapses to the (stream, day) rollup
    first; the O(days²) pair join runs on that bounded frame
    (60 days → 1770 pairs per stream), keyed by stream — never on
    raw events; this is the documented tiny-frame-quadratic class
    (same as `audience_overlap_matrix`)."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    a = daily.select("event_type", F.col("d").alias("d1"), F.col("c").alias("c1"))
    b = daily.select("event_type", F.col("d").alias("d2"), F.col("c").alias("c2"))
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("d2") > F.col("d1"))
        .select(
            "event_type",
            F.when(F.col("c2") > F.col("c1"), 1)
            .when(F.col("c2") < F.col("c1"), -1)
            .otherwise(0)
            .alias("sgn"),
            F.expr(
                "CAST((c2 - c1) * 1000000 div datediff(d2, d1) AS BIGINT)"
            ).alias("slope_e6"),
            "d1",
            "d2",
        )
        .localCheckpoint(eager=False)
    )
    stat = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("long").alias("s_stat"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("corr")
        )
    )
    wsen = W.partitionBy("event_type").orderBy("slope_e6", "d1", "d2")
    wcnt = W.partitionBy("event_type")
    sen = (
        pairs.select(
            "event_type",
            "slope_e6",
            F.row_number().over(wsen).alias("rk"),
            F.count(F.lit(1)).over(wcnt).alias("m"),
        )
        .filter(F.col("rk") == (F.col("m") + 1) / 2)
        .select("event_type", F.col("slope_e6").alias("sen_slope_e6"))
    )
    var18 = (
        F.col("n_days")
        * (F.col("n_days") - 1)
        * (2 * F.col("n_days") + 5)
        - F.coalesce(F.col("corr"), F.lit(0).cast("long"))
    ).cast("long")
    return (
        stat.join(nd, "event_type")
        .join(ties, "event_type", "left")
        .join(sen, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            "s_stat",
            var18.alias("var18"),
            F.when(
                F.col("s_stat") * F.col("s_stat") * 180000 > 38416 * var18,
                1,
            )
            .otherwise(0)
            .alias("alarm_05"),
            "sen_slope_e6",
        )
        .orderBy("event_type")
    )


_CRAMERS_ORACLE = """
WITH feats AS (
  SELECT doc_id, 'lang' AS f, lang AS v FROM documents
  UNION ALL
  SELECT doc_id, 'len_bucket', CAST(n_chars // 200 AS VARCHAR) FROM documents
  UNION ALL
  SELECT doc_id, 'source', source FROM documents
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
obs AS (
  SELECT f1.f AS fx, f2.f AS fy, f1.v AS vx, f2.v AS vy,
         CAST(count(*) AS BIGINT) AS o
  FROM feats f1 JOIN feats f2 ON f2.doc_id = f1.doc_id AND f2.f > f1.f
  GROUP BY 1, 2, 3, 4
),
rowm AS (
  SELECT fx, fy, vx, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1, 2, 3
),
colm AS (
  SELECT fx, fy, vy, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1, 2, 3
),
grid AS (
  SELECT r.fx, r.fy, r.vx, cm.vy, r.r, cm.c,
         CAST(coalesce(o.o, 0) AS BIGINT) AS o
  FROM rowm r
  JOIN colm cm ON cm.fx = r.fx AND cm.fy = r.fy
  LEFT JOIN obs o ON o.fx = r.fx AND o.fy = r.fy
                 AND o.vx = r.vx AND o.vy = cm.vy
),
terms AS (
  SELECT g.fx, g.fy,
         CAST((g.o * 1000 - greatest(g.r * g.c * 1000 // nn.n, 1))
              * (g.o * 1000 - greatest(g.r * g.c * 1000 // nn.n, 1))
              // greatest(g.r * g.c * 1000 // nn.n, 1) AS BIGINT) AS term
  FROM grid g, n nn
),
chi AS (
  SELECT fx, fy, CAST(sum(term) AS BIGINT) AS chi2_micro
  FROM terms GROUP BY 1, 2
),
lv AS (
  SELECT fx, fy,
         CAST(count(DISTINCT vx) AS BIGINT) AS r_levels,
         CAST(count(DISTINCT vy) AS BIGINT) AS c_levels
  FROM grid GROUP BY 1, 2
)
SELECT c.fx AS feature_x, c.fy AS feature_y, nn.n AS n_rows,
       l.r_levels, l.c_levels, c.chi2_micro,
       CAST(c.chi2_micro * 1000
            // (nn.n * least(l.r_levels - 1, l.c_levels - 1))
            AS BIGINT) AS v2_ppm
FROM chi c JOIN lv l ON l.fx = c.fx AND l.fy = c.fy, n nn
ORDER BY feature_x, feature_y
"""


@_register("cramers_v2_matrix", _CRAMERS_ORACLE)
def cramers_v2_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Cramér's V² association matrix over the document
    metadata features (lang, length bucket, source) — the
    bounded-[0,1] normalization of chi-square that makes association
    strengths COMPARABLE across tables of different shapes (reported
    squared: V² avoids the sqrt, keeping the full value oracle; V² =
    χ²/(n·min(r−1,c−1))). The contingency grid is the FULL cross
    product of observed marginals — zero cells contribute (0−E)²/E =
    E, the term naive observed-cells-only implementations drop.
    Expected counts ride a milli-scaled integer lane (E_milli =
    max(R·C·1000 div n, 1)) so every term is a BIGINT floor-div —
    NOTE: Spark `div` on DECIMAL(38) silently wraps through bigint,
    so the arithmetic is deliberately kept inside int64 (holds to
    ~sf10; diff_milli² ≤ (n·10³)²). Scale shape: one long-format
    featurization scan, a (pair, vx, vy) mergeable rollup, then all
    grid algebra on tiny marginal frames."""
    docs = _t(spark, sf_dir, "documents")
    feats = (
        docs.select("doc_id", F.lit("lang").alias("f"), F.col("lang").alias("v"))
        .unionByName(
            docs.select(
                "doc_id",
                F.lit("len_bucket").alias("f"),
                F.expr("CAST(n_chars div 200 AS STRING)").alias("v"),
            )
        )
        .unionByName(
            docs.select(
                "doc_id", F.lit("source").alias("f"), F.col("source").alias("v")
            )
        )
        .localCheckpoint(eager=False)
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    f1 = feats.select("doc_id", F.col("f").alias("fx"), F.col("v").alias("vx"))
    f2 = feats.select("doc_id", F.col("f").alias("fy"), F.col("v").alias("vy"))
    obs = (
        f1.join(f2, "doc_id")
        .filter(F.col("fy") > F.col("fx"))
        .groupBy("fx", "fy", "vx", "vy")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    rowm = obs.groupBy("fx", "fy", "vx").agg(F.sum("o").cast("long").alias("r"))
    colm = obs.groupBy("fx", "fy", "vy").agg(F.sum("o").cast("long").alias("c"))
    grid = (
        rowm.join(colm, ["fx", "fy"])
        .join(obs, ["fx", "fy", "vx", "vy"], "left")
        .select(
            "fx",
            "fy",
            "vx",
            "vy",
            "r",
            "c",
            F.coalesce(F.col("o"), F.lit(0).cast("long")).alias("o"),
        )
        .crossJoin(F.broadcast(n))
        .localCheckpoint(eager=False)
    )
    terms = grid.select(
        "fx",
        "fy",
        F.expr(
            "CAST((o * 1000 - greatest(r * c * 1000 div n, 1))"
            " * (o * 1000 - greatest(r * c * 1000 div n, 1))"
            " div greatest(r * c * 1000 div n, 1) AS BIGINT)"
        ).alias("term"),
    )
    chi = terms.groupBy("fx", "fy").agg(
        F.sum("term").cast("long").alias("chi2_micro")
    )
    lv = grid.groupBy("fx", "fy").agg(
        F.countDistinct("vx").cast("long").alias("r_levels"),
        F.countDistinct("vy").cast("long").alias("c_levels"),
    )
    return (
        chi.join(lv, ["fx", "fy"])
        .crossJoin(F.broadcast(n))
        .select(
            F.col("fx").alias("feature_x"),
            F.col("fy").alias("feature_y"),
            F.col("n").alias("n_rows"),
            "r_levels",
            "c_levels",
            "chi2_micro",
            F.expr(
                "CAST(chi2_micro * 1000"
                " div (n * least(r_levels - 1, c_levels - 1)) AS BIGINT)"
            ).alias("v2_ppm"),
        )
        .orderBy("feature_x", "feature_y")
    )


_KANON_ORACLE = """
WITH q AS (
  SELECT c_nationkey AS nation, c_mktsegment AS seg,
         CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band,
         CAST(round(c_acctbal * 100) AS BIGINT) AS sens
  FROM customer
),
cls AS (
  SELECT nation, seg, bal_band,
         CAST(count(*) AS BIGINT) AS k,
         CAST(count(DISTINCT sens) AS BIGINT) AS l_div
  FROM q GROUP BY 1, 2, 3
),
tot AS (SELECT CAST(sum(k) AS BIGINT) AS n_rows_total FROM cls),
bucketed AS (
  SELECT CASE WHEN k = 1 THEN 1 WHEN k < 5 THEN 2
              WHEN k < 10 THEN 3 ELSE 4 END AS bucket_order,
         CASE WHEN k = 1 THEN 'k=1 re-identified'
              WHEN k < 5 THEN 'k in 2-4 high risk'
              WHEN k < 10 THEN 'k in 5-9 medium'
              ELSE 'k>=10 low' END AS k_bucket,
         k, l_div
  FROM cls
)
SELECT bucket_order, k_bucket,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(k) AS BIGINT) AS n_rows,
       CAST(sum(k) * 1000000 // t.n_rows_total AS BIGINT) AS rows_share_ppm,
       CAST(min(l_div) AS BIGINT) AS min_l_diversity
FROM bucketed, tot t
GROUP BY bucket_order, k_bucket, t.n_rows_total
ORDER BY bucket_order
"""


@_register("kanonymity_risk_audit", _KANON_ORACLE)
def kanonymity_risk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity re-identification risk audit over the
    customer table: quasi-identifier = (nation, market segment,
    $1000 balance band), sensitive attribute = exact balance.
    Equivalence classes whose QI combination is unique (k=1) are
    re-identifiable by linkage; the report buckets classes by k
    (1 / 2-4 / 5-9 / ≥10), shares of rows at risk in exact ppm, and
    the MINIMUM l-diversity per bucket — a k-anonymous class where
    every member shares one sensitive value (l=1) still leaks via the
    homogeneity attack, which is why k alone is not the metric. The
    privacy-audit complement to `dp_bounded_contribution_agg` (that
    entry protects a release; this one measures raw linkage risk
    before any release). Scale shape: ONE mergeable rollup to QI
    classes (count + distinct-sensitive), then bucketing on the class
    frame; the total is a 1-row broadcast."""
    q = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
        F.expr(
            "CAST(round(c_acctbal * 100) AS BIGINT) div 100000"
        ).alias("bal_band"),
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("sens"),
    )
    cls = q.groupBy("nation", "seg", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.countDistinct("sens").cast("long").alias("l_div"),
    )
    tot = cls.agg(F.sum("k").cast("long").alias("n_rows_total"))
    bucketed = cls.select(
        F.when(F.col("k") == 1, 1)
        .when(F.col("k") < 5, 2)
        .when(F.col("k") < 10, 3)
        .otherwise(4)
        .alias("bucket_order"),
        F.when(F.col("k") == 1, "k=1 re-identified")
        .when(F.col("k") < 5, "k in 2-4 high risk")
        .when(F.col("k") < 10, "k in 5-9 medium")
        .otherwise("k>=10 low")
        .alias("k_bucket"),
        "k",
        "l_div",
    )
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .groupBy("bucket_order", "k_bucket", "n_rows_total")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("k").cast("long").alias("n_rows"),
            F.expr(
                "CAST(sum(k) * 1000000 div n_rows_total AS BIGINT)"
            ).alias("rows_share_ppm"),
            F.min("l_div").cast("long").alias("min_l_diversity"),
        )
        .select(
            "bucket_order",
            "k_bucket",
            "n_classes",
            "n_rows",
            "rows_share_ppm",
            "min_l_diversity",
        )
        .orderBy("bucket_order")
    )


_RRF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS term,
         len(regexp_extract_all(lower(text), '[a-z]+', 0)) AS dl
  FROM documents WHERE text IS NOT NULL
),
matched AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS tot_tf,
         CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
         CAST(max(dl) AS BIGINT) AS dl
  FROM toks WHERE term IN ('join', 'vector', 'stream')
  GROUP BY doc_id
),
a AS (
  SELECT doc_id, row_number() OVER (ORDER BY tot_tf DESC, doc_id) AS rank_tf
  FROM matched
  QUALIFY rank_tf <= 50
),
b AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY n_terms DESC, dl, doc_id)
           AS rank_coverage
  FROM matched
  QUALIFY rank_coverage <= 50
),
fused AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         a.rank_tf, b.rank_coverage,
         CAST(coalesce(1000000 // (60 + a.rank_tf), 0)
              + coalesce(1000000 // (60 + b.rank_coverage), 0)
              AS BIGINT) AS rrf_score_e6
  FROM a FULL OUTER JOIN b ON b.doc_id = a.doc_id
)
SELECT doc_id, CAST(rank_tf AS BIGINT) AS rank_tf,
       CAST(rank_coverage AS BIGINT) AS rank_coverage, rrf_score_e6
FROM fused
ORDER BY rrf_score_e6 DESC, doc_id
LIMIT 15
"""


@_register("reciprocal_rank_fusion", _RRF_ORACLE)
def reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (RRF, the hybrid-search standard for
    merging keyword and semantic result lists): two retrieval rankings
    for the same query — by total term frequency, and by query-term
    coverage with shorter-doc preference — are fused purely on RANKS:
    score = Σ 1/(60+rank), carried as exact 10⁶ div (60+rank)
    integers, so the fusion itself value-checks (RRF's defining
    property: it needs no score calibration between engines, exactly
    why it wins in production hybrid stacks; k=60 per the original
    Cormack et al. constant). Documents present in only one list get
    only that list's contribution (the other rank stays NULL). Scale
    shape: the per-doc match stats are one mergeable rollup over
    postings pre-filtered to the query terms; each ranking is a
    top-50 TakeOrderedAndProject followed by a row_number over the
    50-row frame (never a global sort); the fusion is a full outer
    join of two 50-row frames."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias("arr"),
    )
    matched = (
        d.select(
            "doc_id",
            F.size("arr").cast("long").alias("dl"),
            F.explode("arr").alias("term"),
        )
        .filter(F.col("term").isin(["join", "vector", "stream"]))
        .groupBy("doc_id", "dl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tot_tf"),
            F.countDistinct("term").cast("long").alias("n_terms"),
        )
        .localCheckpoint(eager=False)
    )
    a50 = (
        matched.orderBy(F.col("tot_tf").desc(), "doc_id")
        .limit(50)
        .localCheckpoint(eager=False)
        .select(
            "doc_id",
            F.row_number()
            .over(
                W.partitionBy(F.lit(1)).orderBy(
                    F.col("tot_tf").desc(), "doc_id"
                )
            )
            .alias("rank_tf"),
        )
    )
    b50 = (
        matched.orderBy(F.col("n_terms").desc(), "dl", "doc_id")
        .limit(50)
        .localCheckpoint(eager=False)
        .select(
            "doc_id",
            F.row_number()
            .over(
                W.partitionBy(F.lit(1)).orderBy(
                    F.col("n_terms").desc(), "dl", "doc_id"
                )
            )
            .alias("rank_coverage"),
        )
    )
    fused = (
        a50.join(b50, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.col("rank_tf").cast("long").alias("rank_tf"),
            F.col("rank_coverage").cast("long").alias("rank_coverage"),
            (
                F.coalesce(
                    F.expr("1000000 div (60 + rank_tf)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr("1000000 div (60 + rank_coverage)"), F.lit(0)
                )
            )
            .cast("long")
            .alias("rrf_score_e6"),
        )
    )
    return fused.orderBy(F.col("rrf_score_e6").desc(), "doc_id").limit(15)


_SHAPLEY_ORACLE = """
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS b,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
),
cls AS (
  SELECT CAST(a + 2 * b + 4 * c AS BIGINT) AS mask,
         CAST(sum(conv) AS BIGINT) AS n_conv,
         CAST(count(*) AS BIGINT) AS n_users
  FROM u GROUP BY 1
),
coal AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS s),
v AS (
  SELECT co.s, CAST(coalesce(sum(cl.n_conv), 0) AS BIGINT) AS vs
  FROM coal co LEFT JOIN cls cl ON (cl.mask & (7 - co.s)) = 0
  GROUP BY co.s
),
ch AS (
  SELECT * FROM (VALUES ('click', CAST(1 AS BIGINT)),
                        ('view', CAST(2 AS BIGINT)),
                        ('signup', CAST(4 AS BIGINT))) AS t(channel, bit)
),
terms AS (
  SELECT ch.channel, ch.bit,
         (CASE WHEN v0.s = 0 THEN 2
               WHEN v0.s IN (3, 5, 6) THEN 2 ELSE 1 END)
           * (v1.vs - v0.vs) AS wterm
  FROM ch
  JOIN v v0 ON (v0.s & ch.bit) = 0
  JOIN v v1 ON v1.s = v0.s + ch.bit
),
touched AS (
  SELECT ch.channel, CAST(sum(cl.n_users) AS BIGINT) AS users_touched
  FROM ch JOIN cls cl ON (cl.mask & ch.bit) <> 0
  GROUP BY ch.channel
),
vfull AS (SELECT vs AS total_conversions FROM v WHERE s = 7)
SELECT t.channel, tu.users_touched, vf.total_conversions,
       CAST(sum(t.wterm) * 1000000 // 6 AS BIGINT) AS shapley_e6
FROM terms t
JOIN touched tu ON tu.channel = t.channel
CROSS JOIN vfull vf
GROUP BY t.channel, tu.users_touched, vf.total_conversions
ORDER BY t.channel
"""


@_register("shapley_channel_attribution", _SHAPLEY_ORACLE)
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value marketing attribution over three touch channels
    (click/view/signup; conversion = any purchase): the coalition
    value v(S) counts conversions of users whose touched-channel set
    is CONTAINED in S, and each channel's credit is the exact Shapley
    average of its marginal contributions — for 3 players the
    permutation weights are sixths (2,1,1,2 over |S|=0..2 scaled by
    6), so shapley_e6 = Σ w·(v(S∪i)−v(S))·10⁶ div 6 is pure BIGINT
    and the game-theoretic attribution itself carries a full value
    oracle (the principled alternative to `attribution_linear_credit`'s
    equal split; satisfies efficiency: credits sum to v(N)−v(∅)).
    Scale shape: the corpus collapses to per-user channel bitmasks
    (one mergeable rollup), then to the 8-row mask-class frame; ALL
    coalition algebra (subset sums via mask & complement, the 3×4
    marginal terms) runs on broadcast-tiny frames."""
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("a"),
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("b"),
            F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("c"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
    )
    cls = (
        u.groupBy(
            (F.col("a") + 2 * F.col("b") + 4 * F.col("c"))
            .cast("long")
            .alias("mask")
        )
        .agg(
            F.sum("conv").cast("long").alias("n_conv"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
        .localCheckpoint(eager=False)
    )
    coal = spark.range(8).select(F.col("id").cast("long").alias("s"))
    v = (
        coal.join(
            cls,
            (F.col("mask").bitwiseAND(F.lit(7) - F.col("s"))) == 0,
            "left",
        )
        .groupBy("s")
        .agg(
            F.coalesce(F.sum("n_conv"), F.lit(0)).cast("long").alias("vs")
        )
        .localCheckpoint(eager=False)
    )
    ch = spark.range(1).select(
        F.explode(
            F.expr(
                "array(named_struct('channel', 'click', 'bit', CAST(1 AS BIGINT)),"
                " named_struct('channel', 'view', 'bit', CAST(2 AS BIGINT)),"
                " named_struct('channel', 'signup', 'bit', CAST(4 AS BIGINT)))"
            )
        ).alias("x")
    ).select("x.channel", "x.bit")
    v0 = v.select(F.col("s").alias("s0"), F.col("vs").alias("vs0"))
    v1 = v.select(F.col("s").alias("s1"), F.col("vs").alias("vs1"))
    terms = (
        ch.join(v0, F.col("s0").bitwiseAND(F.col("bit")) == 0)
        .join(v1, F.col("s1") == F.col("s0") + F.col("bit"))
        .select(
            "channel",
            (
                F.when(F.col("s0") == 0, 2)
                .when(F.col("s0").isin([3, 5, 6]), 2)
                .otherwise(1)
                * (F.col("vs1") - F.col("vs0"))
            ).alias("wterm"),
        )
    )
    touched = (
        ch.join(cls, F.col("mask").bitwiseAND(F.col("bit")) != 0)
        .groupBy("channel")
        .agg(F.sum("n_users").cast("long").alias("users_touched"))
    )
    vfull = v.filter(F.col("s") == 7).select(
        F.col("vs").alias("total_conversions")
    )
    return (
        terms.groupBy("channel")
        .agg(
            F.expr("CAST(sum(wterm) * 1000000 div 6 AS BIGINT)").alias(
                "shapley_e6"
            )
        )
        .join(F.broadcast(touched), "channel")
        .crossJoin(F.broadcast(vfull))
        .select(
            "channel", "users_touched", "total_conversions", "shapley_e6"
        )
        .orderBy("channel")
    )


# ===========================================================================
# Wave: experimentation significance, survey design, shuffle diagnostics,
# influence propagation — two-proportion z-test, Neyman allocation,
# partition skew audit, deterministic independent cascade.
# ===========================================================================

_AB_TEST_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab7'), 1, 6)
              AS BIGINT) % 2 AS variant,
         max(CASE WHEN event_type = 'purchase' AND value > 450
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
agg AS (
  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT)
           AS conv_a,
         CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT)
           AS conv_b
  FROM u
),
rates AS (
  SELECT n_a, n_b, conv_a, conv_b,
         CAST(conv_a * 1000000 // n_a AS BIGINT) AS p_a_ppm,
         CAST(conv_b * 1000000 // n_b AS BIGINT) AS p_b_ppm,
         CAST((conv_a + conv_b) * 1000000 // (n_a + n_b) AS BIGINT)
           AS p_pool_ppm
  FROM agg
)
SELECT n_a, n_b, conv_a, conv_b, p_a_ppm, p_b_ppm,
       CAST(p_a_ppm - p_b_ppm AS BIGINT) AS diff_ppm,
       CAST(((p_a_ppm - p_b_ppm) * (p_a_ppm - p_b_ppm) // 10000)
            * n_a * n_b
            // (greatest(p_pool_ppm * (1000000 - p_pool_ppm) // 1000000, 1)
               * (n_a + n_b)) AS BIGINT) AS z2_centi,
       CASE WHEN ((p_a_ppm - p_b_ppm) * (p_a_ppm - p_b_ppm) // 10000)
                 * n_a * n_b
                 // (greatest(p_pool_ppm * (1000000 - p_pool_ppm)
                              // 1000000, 1)
                    * (n_a + n_b)) > 384
            THEN 1 ELSE 0 END AS significant_05
FROM rates
"""


@_register("two_proportion_ab_test", _AB_TEST_ORACLE)
def two_proportion_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment readout — the
    significance gate behind every conversion experiment, next to
    `ab_assignment_srm_check` (which validates the assignment itself).
    Variant = deterministic salted md5 of the user id; outcome = any
    high-value purchase (value > 450 — away from the 0/1 saturation a
    plain any-purchase outcome hits, where pooled variance collapses
    to 0; the denominator is additionally greatest(...,1)-guarded). The z statistic is never evaluated as a float:
    z² = diff²·n_a·n_b / (p̄(1−p̄)·N) is carried as a floor-div chain
    on ppm-scaled integers (z2_centi = 100·z², compared against 384 ≈
    1.96²·100), so significance itself value-checks. On a hash-split
    A/A population the expected readout is NOT significant — the
    entry doubles as the assignment's independence audit. BIGINT
    holds to ~sf1 (diff_ppm²·n_a·n_b ≤ 10¹⁰·n²); DECIMAL lanes
    beyond. Scale shape: one per-user mergeable rollup, then a single
    4-counter global aggregate; all test algebra on a 1-row frame."""
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 450),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .select(
            F.expr(
                "CAST(conv(substr(md5(concat(CAST(user_id AS STRING),"
                " ':ab7')), 1, 6), 16, 10) AS BIGINT) % 2"
            ).alias("variant"),
            "conv",
        )
    )
    agg = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    rates = agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.expr("CAST(conv_a * 1000000 div n_a AS BIGINT)").alias("p_a_ppm"),
        F.expr("CAST(conv_b * 1000000 div n_b AS BIGINT)").alias("p_b_ppm"),
        F.expr(
            "CAST((conv_a + conv_b) * 1000000 div (n_a + n_b) AS BIGINT)"
        ).alias("p_pool_ppm"),
    )
    z2 = (
        "((p_a_ppm - p_b_ppm) * (p_a_ppm - p_b_ppm) div 10000)"
        " * n_a * n_b"
        " div (greatest(p_pool_ppm * (1000000 - p_pool_ppm) div 1000000, 1)"
        " * (n_a + n_b))"
    )
    return rates.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        "p_a_ppm",
        "p_b_ppm",
        (F.col("p_a_ppm") - F.col("p_b_ppm")).cast("long").alias("diff_ppm"),
        F.expr(f"CAST({z2} AS BIGINT)").alias("z2_centi"),
        F.expr(f"CASE WHEN {z2} > 384 THEN 1 ELSE 0 END").alias(
            "significant_05"
        ),
    )


_NEYMAN_ORACLE = """
WITH s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_s,
         CAST(sum(n_chars) AS BIGINT) AS sy,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS syy
  FROM documents GROUP BY 1
),
w AS (
  SELECT source, n_s,
         CASE
           WHEN (s0 + 1) * (s0 + 1) <= ss THEN s0 + 1
           WHEN s0 * s0 > ss THEN s0 - 1
           ELSE s0
         END AS w_s
  FROM (
    SELECT source, n_s, n_s * syy - sy * sy AS ss,
           CAST(floor(sqrt(CAST(n_s * syy - sy * sy AS DOUBLE)))
                AS BIGINT) AS s0
    FROM s
  )
),
tot AS (
  SELECT CAST(sum(w_s) AS BIGINT) AS tot_w,
         CAST(sum(n_s) AS BIGINT) AS tot_n
  FROM w
),
shares AS (
  SELECT source, n_s, w_s,
         CAST(10000 * w_s // tot_w AS BIGINT) AS floor_quota,
         CAST((10000 * w_s) % tot_w AS BIGINT) AS rem,
         tot_n
  FROM w, tot
),
ranked AS (
  SELECT source, n_s, w_s, floor_quota, tot_n,
         row_number() OVER (ORDER BY rem DESC, source) AS rk,
         CAST(10000 - sum(floor_quota) OVER () AS BIGINT) AS leftover
  FROM shares
)
SELECT source, n_s, w_s AS neyman_weight,
       CAST(floor_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS n_sample,
       CAST(n_s * 10000 // tot_n AS BIGINT) AS proportional_n
FROM ranked
ORDER BY source
"""


@_register("neyman_allocation_plan", _NEYMAN_ORACLE)
def neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation: split a 10,000-
    row sampling budget across sources proportionally to N_s·σ_s —
    the allocation that minimizes the stratified mean's variance
    (variable strata get more budget than proportional allocation;
    compare n_sample vs proportional_n). The weight avoids floats
    entirely: N_s·σ_s = √(N_s·Σy² − (Σy)²) exactly, via the neighbor-
    corrected integer square root (isqrt trick shared with
    `dataset_mix_temperature` — a last-ulp libm sqrt can never skew a
    weight), and quotas are Hamilton largest-remainder apportioned so
    they sum EXACTLY to budget. The survey-design upgrade of
    `stratified_sample_exact` (which executes quotas this entry
    plans). Scale shape: one mergeable moments rollup per source
    (count/Σy/Σy²), then all allocation algebra on the |sources|-row
    frame."""
    s = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_s"),
            F.sum("n_chars").cast("long").alias("sy"),
            F.sum(F.col("n_chars") * F.col("n_chars"))
            .cast("long")
            .alias("syy"),
        )
    )
    w = (
        s.withColumn("ss", F.col("n_s") * F.col("syy") - F.col("sy") * F.col("sy"))
        .withColumn(
            "s0", F.floor(F.sqrt(F.col("ss").cast("double"))).cast("long")
        )
        .select(
            "source",
            "n_s",
            F.expr(
                "CASE WHEN (s0 + 1) * (s0 + 1) <= ss THEN s0 + 1"
                " WHEN s0 * s0 > ss THEN s0 - 1 ELSE s0 END"
            )
            .cast("long")
            .alias("w_s"),
        )
        .localCheckpoint(eager=False)
    )
    tot = w.agg(
        F.sum("w_s").cast("long").alias("tot_w"),
        F.sum("n_s").cast("long").alias("tot_n"),
    )
    shares = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        "w_s",
        F.expr("CAST(10000 * w_s div tot_w AS BIGINT)").alias("floor_quota"),
        F.expr("CAST((10000 * w_s) % tot_w AS BIGINT)").alias("rem"),
        "tot_n",
    )
    spent = shares.agg(F.sum("floor_quota").cast("long").alias("spent"))
    ranked = shares.crossJoin(F.broadcast(spent)).select(
        "source",
        "n_s",
        "w_s",
        "floor_quota",
        "tot_n",
        F.row_number()
        .over(W.partitionBy(F.lit(1)).orderBy(F.col("rem").desc(), "source"))
        .alias("rk"),
        (F.lit(10000).cast("long") - F.col("spent")).alias("leftover"),
    )
    return ranked.select(
        "source",
        "n_s",
        F.col("w_s").alias("neyman_weight"),
        (
            F.col("floor_quota")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_sample"),
        F.expr("CAST(n_s * 10000 div tot_n AS BIGINT)").alias(
            "proportional_n"
        ),
    ).orderBy("source")


_PARTITIONER_BALANCE_ORACLE = """
WITH k AS (SELECT l_suppkey AS key FROM lineitem),
lanes AS (
  SELECT 'key_mod' AS partitioner, key % 32 AS bucket FROM k
  UNION ALL
  SELECT 'hash_md5',
         CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 6) AS BIGINT) % 32
  FROM k
),
bc AS (
  SELECT partitioner, bucket, CAST(count(*) AS BIGINT) AS c
  FROM lanes GROUP BY 1, 2
)
SELECT partitioner,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(max(c) AS BIGINT) AS max_bucket,
       CAST(min(c) AS BIGINT) AS min_bucket,
       CAST(max(c) * 32 * 1000000 // sum(c) AS BIGINT) AS max_over_ideal_ppm
FROM bc
GROUP BY partitioner
ORDER BY partitioner
"""


@_register("partitioner_balance_audit", _PARTITIONER_BALANCE_ORACLE)
def partitioner_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-partition skew diagnostic: assign every lineitem row to
    32 buckets under two partitioners — naive key mod 32 (inherits any
    stride/pattern in the key domain) and an md5 hash lane (the
    behavior a proper hash partitioner should deliver) — and report
    per-partitioner max/min bucket occupancy and max-over-ideal in
    ppm (10⁶ = perfectly balanced). This is the audit you run BEFORE
    blaming AQE for a straggler: a hot bucket under key_mod that
    disappears under hash_md5 is a key-pattern problem, one that
    persists under both is true value skew (a heavy hitter) that
    needs salting — the partitioner-level companion to
    `partition_skew_audit` (per-key heavy-hitter shares) and the
    skew-salting / AQE-skew-join entries. Scale shape: one mergeable (partitioner,
    bucket) rollup — 64 groups — then a 2-row report; the md5 lane
    is portable so the audit itself value-checks cross-engine."""
    k = _t(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("key"))
    lanes = k.select(
        F.lit("key_mod").alias("partitioner"),
        (F.col("key") % 32).cast("long").alias("bucket"),
    ).unionByName(
        k.select(
            F.lit("hash_md5").alias("partitioner"),
            F.expr(
                "CAST(conv(substr(md5(CAST(key AS STRING)), 1, 6), 16, 10)"
                " AS BIGINT) % 32"
            ).alias("bucket"),
        )
    )
    bc = lanes.groupBy("partitioner", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        bc.groupBy("partitioner")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("c").cast("long").alias("n_rows"),
            F.max("c").cast("long").alias("max_bucket"),
            F.min("c").cast("long").alias("min_bucket"),
            F.expr(
                "CAST(max(c) * 32 * 1000000 div sum(c) AS BIGINT)"
            ).alias("max_over_ideal_ppm"),
        )
        .orderBy("partitioner")
    )


_CASCADE_ORACLE = """
WITH e0 AS (
  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey % 20 = 0
),
edges AS (
  SELECT src, dst FROM e0
  UNION
  SELECT dst, src FROM e0
),
deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS d
  FROM edges GROUP BY 1
),
seeds AS (
  SELECT node FROM deg
  QUALIFY row_number() OVER (ORDER BY d DESC, node) <= 2
),
a0 AS (SELECT node, 0 AS round FROM seeds),
f1 AS (
  SELECT DISTINCT e.dst AS node, 1 AS round
  FROM edges e
  JOIN a0 ON a0.node = e.src
  WHERE CAST('0x' || substr(md5(e.src || '>' || e.dst || ':r1'), 1, 6)
             AS BIGINT) % 10 < 3
    AND e.dst NOT IN (SELECT node FROM a0)
),
s1 AS (SELECT * FROM a0 UNION ALL SELECT * FROM f1),
f2 AS (
  SELECT DISTINCT e.dst AS node, 2 AS round
  FROM edges e
  JOIN f1 ON f1.node = e.src
  WHERE CAST('0x' || substr(md5(e.src || '>' || e.dst || ':r2'), 1, 6)
             AS BIGINT) % 10 < 3
    AND e.dst NOT IN (SELECT node FROM s1)
),
s2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM f2),
f3 AS (
  SELECT DISTINCT e.dst AS node, 3 AS round
  FROM edges e
  JOIN f2 ON f2.node = e.src
  WHERE CAST('0x' || substr(md5(e.src || '>' || e.dst || ':r3'), 1, 6)
             AS BIGINT) % 10 < 3
    AND e.dst NOT IN (SELECT node FROM s2)
),
s3 AS (SELECT * FROM s2 UNION ALL SELECT * FROM f3)
SELECT CAST(round AS BIGINT) AS round,
       CAST(count(*) AS BIGINT) AS newly_activated,
       min(node) AS first_node
FROM s3 GROUP BY round
ORDER BY round
"""


@_register("influence_cascade_rounds", _CASCADE_ORACLE)
def influence_cascade_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independent-cascade influence propagation on the co-purchase
    graph, made fully deterministic: seeds are the 2 highest-degree
    nodes, and an edge (u→v) 'fires' in round r iff
    md5(u>v:r) mod 10 < 3 — the 0.3 activation probability drawn from
    a portable hash instead of an RNG, which is what lets a
    Monte-Carlo diffusion model carry a full cross-engine value oracle
    (same determinism discipline as `poisson_bootstrap_ci`). Exactly
    3 synchronous rounds (bounded-k like `sssp_weighted_frontier`);
    newly-activated counts per round with a witness node. A node
    activates once — each frontier is anti-joined against the
    activated set. Scale shape: per round one equi-join (frontier ×
    edges), the hash gate as a codegen'd projection predicate, and a
    left-anti join against the activated set; frames
    localCheckpoint'ed per round. Influence-maximization's inner loop,
    replayable bit-for-bit."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e0 = (
        o.filter(F.col("o_orderkey") % 20 == 0)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = (
        e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    seeds = (
        deg.orderBy(F.col("d").desc(), "node")
        .limit(2)
        .select("node", F.lit(0).alias("round"))
        .localCheckpoint(eager=False)
    )
    activated = seeds
    frontier = seeds
    for r in (1, 2, 3):
        gate = (
            F.expr(
                "CAST(conv(substr(md5(concat(src, '>', dst,"
                f" ':r{r}')), 1, 6), 16, 10) AS BIGINT) % 10"
            )
            < 3
        )
        new = (
            edges.join(
                frontier.select(F.col("node").alias("src")), "src"
            )
            .filter(gate)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(activated.select("node"), "node", "left_anti")
            .select("node", F.lit(r).alias("round"))
            .localCheckpoint(eager=False)
        )
        activated = activated.unionByName(new).localCheckpoint(eager=False)
        frontier = new
    return (
        activated.groupBy(F.col("round").cast("long").alias("round"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("newly_activated"),
            F.min("node").alias("first_node"),
        )
        .orderBy("round")
    )


# ===========================================================================
# Wave: absorbing-chain funnels, RFM segmentation, readability proxies,
# item-item collaborative filtering.
# ===========================================================================

_MARKOV_ABSORB_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
trans AS (
  SELECT event_type AS s, nxt AS t, CAST(count(*) AS BIGINT) AS c
  FROM seq
  WHERE nxt IS NOT NULL AND event_type <> 'purchase'
  GROUP BY 1, 2
),
p AS (
  SELECT s, t,
         CAST(c * 1000000 // sum(c) OVER (PARTITION BY s) AS BIGINT) AS p_ppm
  FROM trans
),
h1 AS (
  SELECT s, CAST(coalesce(max(CASE WHEN t = 'purchase' THEN p_ppm END), 0)
                 AS BIGINT) AS h
  FROM p GROUP BY s
),
h2 AS (
  SELECT p.s,
         CAST(h1s.h + coalesce(sum(p.p_ppm * h1t.h // 1000000), 0)
              AS BIGINT) AS h
  FROM p
  JOIN h1 h1s ON h1s.s = p.s
  LEFT JOIN h1 h1t ON h1t.s = p.t AND p.t <> 'purchase'
  GROUP BY p.s, h1s.h
),
h3 AS (
  SELECT p.s,
         CAST(h1s.h + coalesce(sum(p.p_ppm * h2t.h // 1000000), 0)
              AS BIGINT) AS h
  FROM p
  JOIN h1 h1s ON h1s.s = p.s
  LEFT JOIN h2 h2t ON h2t.s = p.t AND p.t <> 'purchase'
  GROUP BY p.s, h1s.h
)
SELECT h1.s AS state, h1.h AS p_1step_ppm,
       h2.h AS p_2step_ppm, h3.h AS p_3step_ppm
FROM h1 JOIN h2 ON h2.s = h1.s JOIN h3 ON h3.s = h1.s
ORDER BY state
"""


@_register("markov_absorption_3step", _MARKOV_ABSORB_ORACLE)
def markov_absorption_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-Markov-chain conversion probability: from each
    non-purchase state, the probability of hitting 'purchase' within
    1, 2 and 3 transitions — the bounded-horizon form of the
    fundamental-matrix absorption probability (which needs a matrix
    inverse; the k-step recursion h_k(s) = p(s→P) + Σ p(s→s')·
    h_{k-1}(s') needs only joins, and two unrolled iterations on the
    tiny state×state matrix give a full value oracle — the
    probability-space upgrade of `event_transition_matrix`'s one-step
    counts). Transition probabilities are exact ppm integers; each
    chain product is p_ppm·h_ppm div 10⁶, an identical floor chain on
    both engines. Scale shape: ONE lead() window per user (a single
    keyed shuffle) builds transitions, the corpus collapses to the
    |states|² matrix, and all recursion algebra runs on that
    broadcast-tiny frame."""
    seq = _t(spark, sf_dir, "events").select(
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    trans = (
        seq.filter(
            F.col("nxt").isNotNull() & (F.col("event_type") != "purchase")
        )
        .groupBy(F.col("event_type").alias("s"), F.col("nxt").alias("t"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    p = trans.select(
        "s",
        "t",
        F.expr(
            "CAST(c * 1000000 div sum(c) OVER (PARTITION BY s) AS BIGINT)"
        ).alias("p_ppm"),
    ).localCheckpoint(eager=False)
    h1 = (
        p.groupBy("s")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("t") == "purchase", F.col("p_ppm"))),
                F.lit(0),
            )
            .cast("long")
            .alias("h")
        )
        .localCheckpoint(eager=False)
    )

    def step(prev):
        h1s = h1.select(F.col("s").alias("js"), F.col("h").alias("h_self"))
        ht = prev.select(F.col("s").alias("jt"), F.col("h").alias("h_next"))
        return (
            p.join(F.broadcast(h1s), F.col("js") == F.col("s"))
            .join(
                F.broadcast(ht),
                (F.col("jt") == F.col("t")) & (F.col("t") != "purchase"),
                "left",
            )
            .groupBy("s", "h_self")
            .agg(
                (
                    F.col("h_self")
                    + F.coalesce(
                        F.sum(
                            F.expr("p_ppm * h_next div 1000000")
                        ),
                        F.lit(0),
                    )
                )
                .cast("long")
                .alias("h")
            )
            .select("s", "h")
            .localCheckpoint(eager=False)
        )

    h2 = step(h1)
    h3 = step(h2)
    return (
        h1.select(F.col("s").alias("state"), F.col("h").alias("p_1step_ppm"))
        .join(
            h2.select(F.col("s").alias("state"), F.col("h").alias("p_2step_ppm")),
            "state",
        )
        .join(
            h3.select(F.col("s").alias("state"), F.col("h").alias("p_3step_ppm")),
            "state",
        )
        .orderBy("state")
    )


_RFM_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
           AS recency,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 10000
              AS BIGINT) AS monetary_band
  FROM orders GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cust),
rd AS (
  SELECT recency AS v, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(count(*)) OVER (ORDER BY recency) - count(*) AS BIGINT)
           AS cum_before
  FROM cust GROUP BY recency
),
fd AS (
  SELECT frequency AS v, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(count(*)) OVER (ORDER BY frequency DESC) - count(*)
              AS BIGINT) AS cum_before
  FROM cust GROUP BY frequency
),
md AS (
  SELECT monetary_band AS v, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(count(*)) OVER (ORDER BY monetary_band DESC) - count(*)
              AS BIGINT) AS cum_before
  FROM cust GROUP BY monetary_band
),
scored AS (
  SELECT c.o_custkey,
         CAST(1 + r.cum_before * 5 // nn.n AS BIGINT) AS r_score,
         CAST(1 + f.cum_before * 5 // nn.n AS BIGINT) AS f_score,
         CAST(1 + m.cum_before * 5 // nn.n AS BIGINT) AS m_score,
         c.monetary_band
  FROM cust c
  JOIN rd r ON r.v = c.recency
  JOIN fd f ON f.v = c.frequency
  JOIN md m ON m.v = c.monetary_band
  CROSS JOIN n nn
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(monetary_band) // count(*) AS BIGINT) AS avg_monetary_band
FROM scored
GROUP BY 1, 2, 3
ORDER BY r_score, f_score, m_score
"""


@_register("rfm_segmentation", _RFM_ORACLE)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation with
    EXACT rank-quintile scores and no global sort: each dimension's
    score is 1 + cum_before·5 div n where cum_before comes from a
    cumulative window over the DISTINCT-VALUE frame (bounded: recency
    by calendar days, frequency by max order count, monetary by the
    $100 band), so tied customers always share a score and no task
    ever sorts the customer table (the same distinct-value-cumulative
    trick as `rank_sum_auc_by_event_type`; best customers score 1 on
    every axis — recency ascending, frequency/monetary descending).
    Output is the segment lattice with sizes and average monetary
    band — the input table for lifecycle campaigns and the customer
    analog of `corpus_health_by_source`. Scale shape: one mergeable
    per-customer rollup, three tiny distinct-value frames broadcast
    back onto it, one final lattice rollup."""
    orders = _t(spark, sf_dir, "orders")
    mx = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("mxd")
    )
    cust = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.max("mxd"), F.max(F.col("o_orderdate").cast("date"))
            )
            .cast("long")
            .alias("recency"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
                " div 10000 AS BIGINT)"
            ).alias("monetary_band"),
        )
        .localCheckpoint(eager=False)
    )
    n = cust.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def dist_cum(col: str, desc: bool):
        order = F.col("v").desc() if desc else F.col("v")
        wc = (
            W.partitionBy(F.lit(1))
            .orderBy(order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return (
            cust.groupBy(F.col(col).alias("v"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .select(
                "v",
                (F.sum("c").over(wc) - F.col("c"))
                .cast("long")
                .alias("cum_before"),
            )
        )

    rd = dist_cum("recency", desc=False)
    fd = dist_cum("frequency", desc=True)
    md = dist_cum("monetary_band", desc=True)
    scored = (
        cust.join(
            F.broadcast(rd.withColumnRenamed("cum_before", "rcb")),
            F.col("v") == F.col("recency"),
        )
        .drop("v")
        .join(
            F.broadcast(fd.withColumnRenamed("cum_before", "fcb")),
            F.col("v") == F.col("frequency"),
        )
        .drop("v")
        .join(
            F.broadcast(md.withColumnRenamed("cum_before", "mcb")),
            F.col("v") == F.col("monetary_band"),
        )
        .drop("v")
        .crossJoin(F.broadcast(n))
        .select(
            F.expr("CAST(1 + rcb * 5 div n AS BIGINT)").alias("r_score"),
            F.expr("CAST(1 + fcb * 5 div n AS BIGINT)").alias("f_score"),
            F.expr("CAST(1 + mcb * 5 div n AS BIGINT)").alias("m_score"),
            "monetary_band",
        )
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.expr(
                "CAST(sum(monetary_band) div count(*) AS BIGINT)"
            ).alias("avg_monetary_band"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


_READABILITY_ORACLE = """
WITH d AS (
  SELECT source,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+', 0)) AS BIGINT)
           AS words,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS BIGINT)
           AS syll,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+', 0)), 1)
              AS BIGINT) AS sents
  FROM documents WHERE text IS NOT NULL
),
f AS (
  SELECT source,
         CAST(11800 * syll // greatest(words, 1)
              + 390 * words // sents - 15590 AS BIGINT) AS fk_milli
  FROM d
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(fk_milli) // count(*) AS BIGINT) AS avg_fk_milli,
       CAST(min(fk_milli) AS BIGINT) AS min_fk_milli,
       CAST(max(fk_milli) AS BIGINT) AS max_fk_milli
FROM f GROUP BY source
ORDER BY source
"""


@_register("readability_proxy_scores", _READABILITY_ORACLE)
def readability_proxy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid-style readability grading as an exact-integer
    text-quality signal: syllables approximated by vowel groups
    ([aeiouy]+ runs — the standard cheap proxy), sentences by
    [.!?]+ runs (floored at 1), and the FK grade carried in
    milli-units as 11800·syll div words + 390·words div sents − 15590
    — every factor a regexp count, so the score is bit-identical
    cross-engine (unlike float FK, whose two divisions drift). The
    readability member of the quality-signal family
    (`text_stats_documents` length/punct ratios, `charlm_freq_score`
    fluency, `gopher_repetition` degeneracy) — grade-level screens
    are a standard pretraining-corpus filter axis. Scale shape: all
    three counts are codegen'd regexp projections in one scan; one
    mergeable per-source rollup. No Python, no explode — the arrays
    are counted, never expanded into rows."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "source",
            F.expr(
                "CAST(size(regexp_extract_all(lower(text), '[a-z]+', 0))"
                " AS BIGINT)"
            ).alias("words"),
            F.expr(
                "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
                " AS BIGINT)"
            ).alias("syll"),
            F.expr(
                "CAST(greatest(size(regexp_extract_all(text, '[.!?]+', 0)),"
                " 1) AS BIGINT)"
            ).alias("sents"),
        )
    )
    f = d.select(
        "source",
        F.expr(
            "CAST(11800 * syll div greatest(words, 1)"
            " + 390 * words div sents - 15590 AS BIGINT)"
        ).alias("fk_milli"),
    )
    return (
        f.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("CAST(sum(fk_milli) div count(*) AS BIGINT)").alias(
                "avg_fk_milli"
            ),
            F.min("fk_milli").cast("long").alias("min_fk_milli"),
            F.max("fk_milli").cast("long").alias("max_fk_milli"),
        )
        .orderBy("source")
    )


_ITEMITEM_ORACLE = """
WITH ui AS (
  SELECT DISTINCT o.o_custkey AS u, CAST(l.l_partkey % 50 AS BIGINT) AS i
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
pop AS (SELECT i, CAST(count(*) AS BIGINT) AS n_u FROM ui GROUP BY i),
co AS (
  SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS dot
  FROM ui a JOIN ui b ON b.u = a.u AND b.i > a.i
  GROUP BY 1, 2
)
SELECT c.item_a, c.item_b, c.dot,
       pa.n_u AS n_a, pb.n_u AS n_b,
       CAST(c.dot * c.dot * 1000000 // (pa.n_u * pb.n_u) AS BIGINT)
         AS cos2_ppm
FROM co c
JOIN pop pa ON pa.i = c.item_a
JOIN pop pb ON pb.i = c.item_b
ORDER BY cos2_ppm DESC, c.item_a, c.item_b
LIMIT 20
"""


@_register("itemitem_collaborative_topk", _ITEMITEM_ORACLE)
def itemitem_collaborative_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over binary purchase vectors:
    similarity between part categories = cosine over the customer
    dimension, carried EXACTLY as cos² in ppm (dot²·10⁶ div
    (n_a·n_b) — dot and both norms are counts, so the squared cosine
    needs no sqrt and the recommender's similarity table itself
    value-checks; ordering by cos² equals ordering by cosine). The
    'customers who bought X also bought Y' backbone — cosine
    normalization, unlike `basket_pair_affinity`'s lift, does not
    over-reward rare coincidences between unpopular items. Scale
    shape: the user×item frame is deduplicated once; co-occurrence is
    the per-user pair self-equi-join (C(items-per-user, 2) bounded);
    popularity is a broadcast; top-20 is TakeOrderedAndProject.
    BIGINT holds to ~sf1 (dot²·10⁶ ≤ n_users²·10⁶); DECIMAL lanes
    beyond."""
    ui = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("u"),
            (F.col("l_partkey") % 50).cast("long").alias("i"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    pop = ui.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("n_u"))
    co = (
        ui.select("u", F.col("i").alias("item_a"))
        .join(ui.select("u", F.col("i").alias("item_b")), "u")
        .filter(F.col("item_b") > F.col("item_a"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("dot"))
    )
    return (
        co.join(
            F.broadcast(pop.select(F.col("i").alias("item_a"),
                                   F.col("n_u").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(pop.select(F.col("i").alias("item_b"),
                                   F.col("n_u").alias("n_b"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "dot",
            "n_a",
            "n_b",
            F.expr(
                "CAST(dot * dot * 1000000 div (n_a * n_b) AS BIGINT)"
            ).alias("cos2_ppm"),
        )
        .orderBy(F.col("cos2_ppm").desc(), "item_a", "item_b")
        .limit(20)
    )


# ===========================================================================
# Wave: ranked-model gains, retrieval evaluation, density clustering,
# financial bridge decomposition.
# ===========================================================================

_GAINS_ORACLE = """
WITH docs AS (
  SELECT doc_id, source, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
train AS (SELECT * FROM docs WHERE (doc_id // 20) % 2 = 0),
test  AS (SELECT * FROM docs WHERE (doc_id // 20) % 2 = 1),
rate AS (
  SELECT source, CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS p_ppm
  FROM train GROUP BY 1
),
grate AS (
  SELECT CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS g_ppm FROM train
),
scored AS (
  SELECT t.y, coalesce(r.p_ppm, g.g_ppm) AS score
  FROM test t LEFT JOIN rate r ON r.source = t.source CROSS JOIN grate g
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos
  FROM scored
),
byscore AS (
  SELECT score, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS pos
  FROM scored GROUP BY score
),
cum AS (
  SELECT score, c, pos,
         CAST(sum(c) OVER (ORDER BY score DESC) AS BIGINT) AS cum_n,
         CAST(sum(pos) OVER (ORDER BY score DESC) AS BIGINT) AS cum_pos
  FROM byscore
)
SELECT cu.score AS score_ppm, cu.c AS n_docs, cu.pos AS n_pos,
       cu.cum_n, cu.cum_pos,
       CAST(cu.cum_n * 1000000 // t.n AS BIGINT) AS population_share_ppm,
       CAST(cu.cum_pos * 1000000 // t.n_pos AS BIGINT) AS captured_share_ppm,
       CAST(cu.cum_pos * t.n * 1000000 // (t.n_pos * cu.cum_n) AS BIGINT)
         AS lift_ppm
FROM cum cu, tot t
ORDER BY score_ppm DESC
"""


@_register("cumulative_gains_deciles", _GAINS_ORACLE)
def cumulative_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift curve for a ranked classifier — the
    DISCRIMINATION readout next to `calibration_reliability_bins`'
    calibration readout (a model can be well-calibrated and useless
    for targeting, or sharp but miscalibrated; you need both curves).
    Test docs are ranked by the train-learned per-source P(en) score;
    at each distinct score threshold the curve reports the cumulative
    population share vs the cumulative captured-positives share and
    their ratio (lift, 10⁶ = random targeting). Everything is exact:
    counts, ppm shares, and lift = cum_pos·n·10⁶ div (n_pos·cum_n).
    Scale shape: scoring is a broadcast join; the curve collapses to
    the DISTINCT-SCORE frame (bounded by |sources|) whose cumulative
    windows are tiny by construction; the totals are a 1-row
    broadcast."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    train = docs.filter(F.expr("(doc_id div 20) % 2") == 0).localCheckpoint(
        eager=False
    )
    test = docs.filter(F.expr("(doc_id div 20) % 2") == 1)
    rate = train.groupBy("source").agg(
        F.expr("CAST(sum(y) * 1000000 div count(*) AS BIGINT)").alias("p_ppm")
    )
    grate = train.agg(
        F.expr("CAST(sum(y) * 1000000 div count(*) AS BIGINT)").alias("g_ppm")
    )
    scored = (
        test.join(F.broadcast(rate), "source", "left")
        .crossJoin(F.broadcast(grate))
        .select(
            "y", F.coalesce(F.col("p_ppm"), F.col("g_ppm")).alias("score")
        )
    )
    scored = scored.localCheckpoint(eager=False)
    tot = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    byscore = scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("y").cast("long").alias("pos"),
    )
    wdesc = (
        W.partitionBy(F.lit(1))
        .orderBy(F.col("score").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = byscore.select(
        "score",
        "c",
        "pos",
        F.sum("c").over(wdesc).cast("long").alias("cum_n"),
        F.sum("pos").over(wdesc).cast("long").alias("cum_pos"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("score").alias("score_ppm"),
            F.col("c").alias("n_docs"),
            F.col("pos").alias("n_pos"),
            "cum_n",
            "cum_pos",
            F.expr("CAST(cum_n * 1000000 div n AS BIGINT)").alias(
                "population_share_ppm"
            ),
            F.expr("CAST(cum_pos * 1000000 div n_pos AS BIGINT)").alias(
                "captured_share_ppm"
            ),
            F.expr(
                "CAST(cum_pos * n * 1000000 div (n_pos * cum_n) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("score_ppm").desc())
    )


_PREC_AT_K_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS term,
         len(regexp_extract_all(lower(text), '[a-z]+', 0)) AS dl
  FROM documents WHERE text IS NOT NULL
),
matched AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS tot_tf,
         CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
         CAST(max(dl) AS BIGINT) AS dl
  FROM toks WHERE term IN ('join', 'vector', 'stream')
  GROUP BY doc_id
),
rel AS (SELECT doc_id FROM matched WHERE n_terms >= 2),
nrel AS (SELECT CAST(count(*) AS BIGINT) AS n_relevant FROM rel),
a AS (
  SELECT doc_id, row_number() OVER (ORDER BY tot_tf DESC, doc_id) AS rk
  FROM matched QUALIFY rk <= 50
),
b AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_terms DESC, dl, doc_id) AS rk
  FROM matched QUALIFY rk <= 50
),
fused AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         CAST(coalesce(1000000 // (60 + a.rk), 0)
              + coalesce(1000000 // (60 + b.rk), 0) AS BIGINT) AS s
  FROM a FULL OUTER JOIN b ON b.doc_id = a.doc_id
),
f AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rk
  FROM fused QUALIFY rk <= 50
),
tops AS (
  SELECT 'tf' AS ranking, doc_id FROM a WHERE rk <= 10
  UNION ALL
  SELECT 'coverage', doc_id FROM b WHERE rk <= 10
  UNION ALL
  SELECT 'rrf_fused', doc_id FROM f WHERE rk <= 10
)
SELECT t.ranking,
       CAST(10 AS BIGINT) AS k,
       n.n_relevant,
       CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS hits,
       CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            * 1000000 // 10 AS BIGINT) AS p_at_k_ppm,
       CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            * 1000000 // n.n_relevant AS BIGINT) AS r_at_k_ppm
FROM tops t
LEFT JOIN rel r ON r.doc_id = t.doc_id
CROSS JOIN nrel n
GROUP BY t.ranking, n.n_relevant
ORDER BY t.ranking
"""


@_register("retrieval_precision_at_k", _PREC_AT_K_ORACLE)
def retrieval_precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@10 / Recall@10 for the three retrieval strategies of
    `reciprocal_rank_fusion` (term-frequency ranking, coverage
    ranking, and their RRF fusion) against a declared relevance set
    (docs matching ≥2 distinct query terms) — the evaluation harness
    that justifies WHY one fuses: the fused list's P@k should not be
    worse than the better single ranking. All ranks, hits and ppm
    metrics are exact integers, so the IR evaluation itself
    value-checks (the lexical analog of `ann_recall_eval`). Scale
    shape: the match stats are one term-filtered mergeable rollup;
    every ranking is a top-50 TakeOrderedAndProject + a tiny-frame
    row_number; the eval is a semi-join of 30 ranked rows against the
    relevance set."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    matched = (
        docs.select(
            "doc_id",
            F.expr(
                "regexp_extract_all(lower(text), '[a-z]+', 0)"
            ).alias("arr"),
        )
        .select(
            "doc_id",
            F.size("arr").cast("long").alias("dl"),
            F.explode("arr").alias("term"),
        )
        .filter(F.col("term").isin(["join", "vector", "stream"]))
        .groupBy("doc_id", "dl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tot_tf"),
            F.countDistinct("term").cast("long").alias("n_terms"),
        )
        .localCheckpoint(eager=False)
    )
    rel = matched.filter(F.col("n_terms") >= 2).select("doc_id")
    rel = rel.localCheckpoint(eager=False)
    nrel = rel.agg(F.count(F.lit(1)).cast("long").alias("n_relevant"))

    def ranked(df, order_cols, name):
        return (
            df.orderBy(*order_cols)
            .limit(50)
            .localCheckpoint(eager=False)
            .select(
                "doc_id",
                F.row_number()
                .over(W.partitionBy(F.lit(1)).orderBy(*order_cols))
                .alias("rk"),
            )
        )

    a = ranked(matched, [F.col("tot_tf").desc(), F.col("doc_id")], "tf")
    b = ranked(
        matched,
        [F.col("n_terms").desc(), F.col("dl"), F.col("doc_id")],
        "coverage",
    )
    fused = (
        a.select("doc_id", F.col("rk").alias("ra"))
        .join(
            b.select("doc_id", F.col("rk").alias("rb")), "doc_id", "full_outer"
        )
        .select(
            "doc_id",
            (
                F.coalesce(F.expr("1000000 div (60 + ra)"), F.lit(0))
                + F.coalesce(F.expr("1000000 div (60 + rb)"), F.lit(0))
            )
            .cast("long")
            .alias("s"),
        )
    )
    f = ranked(fused, [F.col("s").desc(), F.col("doc_id")], "rrf")
    tops = (
        a.filter(F.col("rk") <= 10)
        .select(F.lit("tf").alias("ranking"), "doc_id")
        .unionByName(
            b.filter(F.col("rk") <= 10).select(
                F.lit("coverage").alias("ranking"), "doc_id"
            )
        )
        .unionByName(
            f.filter(F.col("rk") <= 10).select(
                F.lit("rrf_fused").alias("ranking"), "doc_id"
            )
        )
    )
    hit = rel.select("doc_id", F.lit(1).alias("is_rel"))
    return (
        tops.join(F.broadcast(hit), "doc_id", "left")
        .crossJoin(F.broadcast(nrel))
        .groupBy("ranking", "n_relevant")
        .agg(
            F.sum(F.coalesce(F.col("is_rel"), F.lit(0)))
            .cast("long")
            .alias("hits")
        )
        .select(
            "ranking",
            F.lit(10).cast("long").alias("k"),
            "n_relevant",
            "hits",
            F.expr("CAST(hits * 1000000 div 10 AS BIGINT)").alias(
                "p_at_k_ppm"
            ),
            F.expr("CAST(hits * 1000000 div n_relevant AS BIGINT)").alias(
                "r_at_k_ppm"
            ),
        )
        .orderBy("ranking")
    )


_GRID_DBSCAN_ORACLE = """
WITH pts AS (
  SELECT vec_id,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 20) AS BIGINT) AS gx,
         CAST(floor(CAST(embedding[2] AS DOUBLE) * 20) AS BIGINT) AS gy
  FROM embeddings
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts),
cells AS (
  SELECT gx, gy, CAST(count(*) AS BIGINT) AS c FROM pts GROUP BY 1, 2
),
core AS (
  SELECT gx, gy, c,
         (gx + 100) * 1000 + (gy + 100) AS cell_id
  FROM cells, n WHERE c >= greatest(n // 100, 2)
),
adj AS (
  SELECT a.cell_id AS u, b.cell_id AS v
  FROM core a JOIN core b
    ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
),
l0 AS (SELECT cell_id AS node, cell_id AS lbl FROM core),
l1 AS (
  SELECT e.v AS node, CAST(min(l.lbl) AS BIGINT) AS lbl
  FROM adj e JOIN l0 l ON l.node = e.u GROUP BY e.v
),
l2 AS (
  SELECT e.v AS node, CAST(min(l.lbl) AS BIGINT) AS lbl
  FROM adj e JOIN l1 l ON l.node = e.u GROUP BY e.v
),
l3 AS (
  SELECT e.v AS node, CAST(min(l.lbl) AS BIGINT) AS lbl
  FROM adj e JOIN l2 l ON l.node = e.u GROUP BY e.v
)
SELECT l3.lbl AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(core.c) AS BIGINT) AS n_points
FROM l3 JOIN core ON core.cell_id = l3.node
GROUP BY l3.lbl
ORDER BY n_points DESC, cluster_id
LIMIT 15
"""


@_register("grid_density_clusters", _GRID_DBSCAN_ORACLE)
def grid_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-based density clustering (the DBSCAN-family shape that
    scales: GRIDCLUS/STING-style): embed points onto an integer lattice
    (floor of the first two embedding coordinates ×20 — float→grid is
    a single IEEE multiply+floor, identical cross-engine), keep CORE
    cells with at least max(n div 100, 2) points (density threshold
    scale-relative, threaded as a broadcast column), and merge
    8-neighbor-adjacent core cells into clusters by 3 rounds of
    synchronous min-label propagation (bounded-k, same oracle
    discipline as `label_propagation_communities`; the cell graph is
    tiny so 3 rounds is its diameter here). Noise points — cells under
    the threshold — are excluded, which is DBSCAN's defining
    difference from k-means (`semantic_dedup_clusters`). Scale shape:
    the corpus collapses to the cell rollup (one mergeable agg); the
    adjacency self-join and CC rounds run on the bounded core-cell
    frame only."""
    pts = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) * 20)"
            " AS BIGINT)"
        ).alias("gx"),
        F.expr(
            "CAST(floor(CAST(element_at(embedding, 2) AS DOUBLE) * 20)"
            " AS BIGINT)"
        ).alias("gy"),
    )
    n = pts.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cells = pts.groupBy("gx", "gy").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    core = (
        cells.crossJoin(F.broadcast(n))
        .filter(
            F.col("c")
            >= F.greatest(F.expr("n div 100"), F.lit(2).cast("long"))
        )
        .select(
            "gx",
            "gy",
            "c",
            ((F.col("gx") + 100) * 1000 + (F.col("gy") + 100)).alias(
                "cell_id"
            ),
        )
        .localCheckpoint(eager=False)
    )
    a = core.select(
        F.col("gx").alias("ax"), F.col("gy").alias("ay"),
        F.col("cell_id").alias("u"),
    )
    b = core.select(
        F.col("gx").alias("bx"), F.col("gy").alias("by"),
        F.col("cell_id").alias("v"),
    )
    adj = (
        a.join(
            b,
            (F.abs(F.col("ax") - F.col("bx")) <= 1)
            & (F.abs(F.col("ay") - F.col("by")) <= 1),
        )
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    labels = core.select(
        F.col("cell_id").alias("node"), F.col("cell_id").alias("lbl")
    )
    for _ in range(3):
        labels = (
            adj.join(labels, adj["u"] == labels["node"])
            .groupBy(adj["v"].alias("node"))
            .agg(F.min("lbl").cast("long").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return (
        labels.join(
            core.select(F.col("cell_id").alias("node"), "c"), "node"
        )
        .groupBy(F.col("lbl").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("c").cast("long").alias("n_points"),
        )
        .orderBy(F.col("n_points").desc(), "cluster_id")
        .limit(15)
    )


_REV_BRIDGE_ORACLE = """
WITH mid AS (
  SELECT (min(epoch_us(o_orderdate)) + max(epoch_us(o_orderdate))) // 2
           AS mid_us
  FROM orders
),
li AS (
  SELECT CAST(l.l_partkey % 50 AS BIGINT) AS category,
         CASE WHEN epoch_us(o.o_orderdate) < m.mid_us THEN 1 ELSE 2 END
           AS period,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey, mid m
),
per AS (
  SELECT category,
         CAST(sum(CASE WHEN period = 1 THEN qty END) AS BIGINT) AS q1,
         CAST(sum(CASE WHEN period = 2 THEN qty END) AS BIGINT) AS q2,
         CAST(sum(CASE WHEN period = 1 THEN cents END) AS BIGINT) AS r1,
         CAST(sum(CASE WHEN period = 2 THEN cents END) AS BIGINT) AS r2
  FROM li GROUP BY category
),
ok AS (
  SELECT * FROM per
  WHERE q1 IS NOT NULL AND q2 IS NOT NULL AND q1 > 0
)
SELECT category, q1, q2, r1, r2,
       CAST(r2 - r1 AS BIGINT) AS delta_rev_cents,
       CAST((q2 - q1) * (r1 * 1000 // q1) // 1000 AS BIGINT)
         AS volume_effect_cents,
       CAST((r2 - r1) - ((q2 - q1) * (r1 * 1000 // q1) // 1000) AS BIGINT)
         AS price_mix_effect_cents
FROM ok
ORDER BY category
"""


@_register("revenue_bridge_decomposition", _REV_BRIDGE_ORACLE)
def revenue_bridge_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge (waterfall) decomposition per part category
    between the first and second half of the order timeline: the
    revenue delta splits into a VOLUME effect (quantity change at the
    old average unit price, the price carried as an exact milli-cent
    integer r1·1000 div q1) and a PRICE/MIX effect defined as the
    residual — the standard FP&A convention that makes the bridge
    ADDITIVE BY CONSTRUCTION (volume + price/mix = Δrevenue exactly,
    floor-divs and all), which is the property finance reviewers
    actually check. The why-did-the-metric-move companion to
    `yoy_revenue_growth` (which only says THAT it moved). Scale shape:
    one broadcast midpoint, one mergeable (category, period)
    conditional rollup, all bridge algebra on the 50-row category
    frame."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # o_orderdate may read as TIMESTAMP_NTZ; unix_micros rejects NTZ.
    # The cast's session-tz offset shifts min/max/mid and every row
    # equally, so the period comparison is offset-invariant.
    od_us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    mid = o.agg(
        ((F.min(od_us) + F.max(od_us)) / F.lit(2))
        .cast("long")
        .alias("mid_us")
    )
    rows = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .crossJoin(F.broadcast(mid))
        .select(
            (F.col("l_partkey") % 50).cast("long").alias("category"),
            F.when(
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                < F.col("mid_us"),
                1,
            )
            .otherwise(2)
            .alias("period"),
            F.expr("CAST(round(l_quantity) AS BIGINT)").alias("qty"),
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    per = rows.groupBy("category").agg(
        F.sum(F.when(F.col("period") == 1, F.col("qty"))).cast("long").alias("q1"),
        F.sum(F.when(F.col("period") == 2, F.col("qty"))).cast("long").alias("q2"),
        F.sum(F.when(F.col("period") == 1, F.col("cents"))).cast("long").alias("r1"),
        F.sum(F.when(F.col("period") == 2, F.col("cents"))).cast("long").alias("r2"),
    )
    ok = per.filter(
        F.col("q1").isNotNull() & F.col("q2").isNotNull() & (F.col("q1") > 0)
    )
    vol = "(q2 - q1) * (r1 * 1000 div q1) div 1000"
    return ok.select(
        "category",
        "q1",
        "q2",
        "r1",
        "r2",
        (F.col("r2") - F.col("r1")).cast("long").alias("delta_rev_cents"),
        F.expr(f"CAST({vol} AS BIGINT)").alias("volume_effect_cents"),
        F.expr(f"CAST((r2 - r1) - ({vol}) AS BIGINT)").alias(
            "price_mix_effect_cents"
        ),
    ).orderBy("category")


# ===========================================================================
# Wave: cohort LTV, SRE burn-rate alerting, ABC inventory classes.
# ===========================================================================

_LTV_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS idx,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
first_m AS (
  SELECT o_custkey, CAST(min(idx) AS BIGINT) AS cohort_idx FROM o GROUP BY 1
),
sized AS (
  SELECT cohort_idx, CAST(count(*) AS BIGINT) AS n_customers
  FROM first_m GROUP BY 1
),
aged AS (
  SELECT f.cohort_idx, CAST(o.idx - f.cohort_idx AS BIGINT) AS age,
         CAST(sum(o.cents) AS BIGINT) AS revenue_cents
  FROM o JOIN first_m f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort_idx, age, revenue_cents,
         CAST(sum(revenue_cents)
              OVER (PARTITION BY cohort_idx ORDER BY age) AS BIGINT)
           AS cum_revenue_cents
  FROM aged
)
SELECT c.cohort_idx, c.age, s.n_customers, c.revenue_cents,
       c.cum_revenue_cents,
       CAST(c.cum_revenue_cents // s.n_customers AS BIGINT)
         AS ltv_cents_per_customer
FROM cum c JOIN sized s ON s.cohort_idx = c.cohort_idx
ORDER BY c.cohort_idx, c.age
"""


@_register("cohort_ltv_curves", _LTV_ORACLE)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value accumulation curves: customers grouped by
    first-order month (cohort key = year·12+month, a pure integer so
    both engines agree without any months_between semantics), revenue
    accumulated by months-since-first-order, and per-customer LTV as
    exact cents floor-div cohort size. The MONETARY counterpart of the
    cohort retention matrix (that entry counts who comes back; this
    one sums what they spend — the curve whose asymptote sets
    acquisition budgets). Scale shape: one per-customer min rollup,
    one (cohort, age) mergeable revenue rollup, a cumulative window
    per cohort over the bounded age frame, cohort sizes broadcast."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("idx"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    ).localCheckpoint(eager=False)
    first_m = o.groupBy("o_custkey").agg(
        F.min("idx").cast("long").alias("cohort_idx")
    )
    first_m = first_m.localCheckpoint(eager=False)
    sized = first_m.groupBy("cohort_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    aged = (
        o.join(first_m, "o_custkey")
        .groupBy(
            "cohort_idx",
            (F.col("idx") - F.col("cohort_idx")).cast("long").alias("age"),
        )
        .agg(F.sum("cents").cast("long").alias("revenue_cents"))
    )
    wcum = (
        W.partitionBy("cohort_idx")
        .orderBy("age")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = aged.select(
        "cohort_idx",
        "age",
        "revenue_cents",
        F.sum("revenue_cents").over(wcum).cast("long").alias(
            "cum_revenue_cents"
        ),
    )
    return (
        cum.join(F.broadcast(sized), "cohort_idx")
        .select(
            "cohort_idx",
            "age",
            "n_customers",
            "revenue_cents",
            "cum_revenue_cents",
            F.expr(
                "CAST(cum_revenue_cents div n_customers AS BIGINT)"
            ).alias("ltv_cents_per_customer"),
        )
        .orderBy("cohort_idx", "age")
    )


_SLO_BURN_ORACLE = """
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hour_idx,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY 1
),
rates AS (
  SELECT hour_idx, n_events, n_errors,
         CAST(n_errors * 1000000 // n_events AS BIGINT) AS rate_1h_ppm,
         CAST(sum(n_errors) OVER w6 * 1000000 // sum(n_events) OVER w6
              AS BIGINT) AS rate_6h_ppm
  FROM h
  WINDOW w6 AS (ORDER BY hour_idx RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
),
burn AS (
  SELECT hour_idx, n_events, n_errors, rate_1h_ppm, rate_6h_ppm,
         CAST(rate_1h_ppm * 100 // 20000 AS BIGINT) AS burn_1h_centi,
         CAST(rate_6h_ppm * 100 // 20000 AS BIGINT) AS burn_6h_centi
  FROM rates
)
SELECT hour_idx, n_events, n_errors, rate_1h_ppm, rate_6h_ppm,
       burn_1h_centi, burn_6h_centi,
       CASE WHEN burn_1h_centi >= 1440 AND burn_6h_centi >= 600
            THEN 1 ELSE 0 END AS page_alert,
       CASE WHEN burn_1h_centi >= 600 AND burn_6h_centi >= 300
            THEN 1 ELSE 0 END AS ticket_alert
FROM burn
ORDER BY burn_1h_centi DESC, hour_idx
LIMIT 20
"""


@_register("slo_burn_rate_alerts", _SLO_BURN_ORACLE)
def slo_burn_rate_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO error-budget burn-rate alerting (the SRE
    workbook rule): hourly error ratios against a 2% error budget,
    with the 6-hour trailing window computed by a RANGE frame over the
    integer hour index — a gap-correct time window (missing hours
    shrink the frame; a rows-frame would silently look further back).
    Burn = rate/budget carried as exact centi-multiples
    (rate_ppm·100 div 20000); the page rule fires only when BOTH the
    fast (14.4×) and slow (6×) windows burn — the two-window AND is
    what kills flappy paging, and here the whole alert decision
    value-checks cross-engine. Top-20 hours by fast burn, flags
    alongside. Scale shape: the stream collapses to one per-hour
    mergeable rollup; windows run over the bounded hour frame;
    TakeOrderedAndProject caps output."""
    h = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.expr("unix_micros(ts) div 3600000000").alias("hour_idx")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_errors"),
        )
    )
    w6 = (
        W.partitionBy(F.lit(1))
        .orderBy("hour_idx")
        .rangeBetween(-5, 0)
    )
    # the 6h rate needs integer div of two window sums — compute both
    # sums first, then divide in a projection
    rates = h.select(
        "hour_idx",
        "n_events",
        "n_errors",
        F.expr("CAST(n_errors * 1000000 div n_events AS BIGINT)").alias(
            "rate_1h_ppm"
        ),
        F.sum("n_errors").over(w6).cast("long").alias("e6"),
        F.sum("n_events").over(w6).cast("long").alias("n6"),
    ).select(
        "hour_idx",
        "n_events",
        "n_errors",
        "rate_1h_ppm",
        F.expr("CAST(e6 * 1000000 div n6 AS BIGINT)").alias("rate_6h_ppm"),
    )
    burn = rates.select(
        "hour_idx",
        "n_events",
        "n_errors",
        "rate_1h_ppm",
        "rate_6h_ppm",
        F.expr("CAST(rate_1h_ppm * 100 div 20000 AS BIGINT)").alias(
            "burn_1h_centi"
        ),
        F.expr("CAST(rate_6h_ppm * 100 div 20000 AS BIGINT)").alias(
            "burn_6h_centi"
        ),
    )
    return (
        burn.select(
            "*",
            F.when(
                (F.col("burn_1h_centi") >= 1440)
                & (F.col("burn_6h_centi") >= 600),
                1,
            )
            .otherwise(0)
            .alias("page_alert"),
            F.when(
                (F.col("burn_1h_centi") >= 600)
                & (F.col("burn_6h_centi") >= 300),
                1,
            )
            .otherwise(0)
            .alias("ticket_alert"),
        )
        .orderBy(F.col("burn_1h_centi").desc(), "hour_idx")
        .limit(20)
    )


_ABC_ORACLE = """
WITH per_part AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                         AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(sum(rev) AS BIGINT) AS total FROM per_part),
ranked AS (
  SELECT l_partkey, rev,
         CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS BIGINT)
           AS cum_rev,
         row_number() OVER (ORDER BY rev DESC, l_partkey) AS rk
  FROM per_part
),
classed AS (
  SELECT r.*,
         CASE WHEN (r.cum_rev - r.rev) * 100 < t.total * 80 THEN 'A'
              WHEN (r.cum_rev - r.rev) * 100 < t.total * 95 THEN 'B'
              ELSE 'C' END AS abc_class,
         t.total
  FROM ranked r, tot t
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS BIGINT) AS revenue_cents,
       CAST(sum(rev) * 1000000 // total AS BIGINT) AS revenue_share_ppm,
       CAST(min(rk) AS BIGINT) AS first_rank,
       CAST(max(rk) AS BIGINT) AS last_rank
FROM classed
GROUP BY abc_class, total
ORDER BY abc_class
"""


@_register("abc_pareto_classification", _ABC_ORACLE)
def abc_pareto_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification of parts by revenue: a
    part is class A while the revenue accumulated BEFORE it is under
    80% of total, B under 95%, else C — the boundary test is the
    cross-multiplied integer comparison (cum−own)·100 < total·k, so
    class assignment is exact (a ppm-rounded share would misclassify
    boundary parts). The classic skewness readout operationalized:
    `gini_concentration_by_segment` measures concentration,
    `partition_skew_audit` finds hot keys, this entry hands ops the
    actual A/B/C lists. Scale shape: one mergeable per-part rollup;
    the cumulative window runs over the part frame (bounded by the
    part-catalog size, not the fact table — documented tiny-frame
    single-partition class); total is a 1-row broadcast."""
    per_part = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("rev")
        )
        .localCheckpoint(eager=False)
    )
    tot = per_part.agg(F.sum("rev").cast("long").alias("total"))
    wr = W.partitionBy(F.lit(1)).orderBy(F.col("rev").desc(), "l_partkey")
    ranked = per_part.select(
        "l_partkey",
        "rev",
        F.sum("rev")
        .over(wr.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("cum_rev"),
        F.row_number().over(wr).alias("rk"),
    )
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "*",
        F.when((F.col("cum_rev") - F.col("rev")) * 100 < F.col("total") * 80, "A")
        .when((F.col("cum_rev") - F.col("rev")) * 100 < F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return (
        classed.groupBy("abc_class", "total")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev").cast("long").alias("revenue_cents"),
            F.expr("CAST(sum(rev) * 1000000 div total AS BIGINT)").alias(
                "revenue_share_ppm"
            ),
            F.min("rk").cast("long").alias("first_rank"),
            F.max("rk").cast("long").alias("last_rank"),
        )
        .select(
            "abc_class",
            "n_parts",
            "revenue_cents",
            "revenue_share_ppm",
            "first_rank",
            "last_rank",
        )
        .orderBy("abc_class")
    )


# ===========================================================================
# Wave: skip-gram co-occurrence, experiment design, permutation testing.
# ===========================================================================

_SKIPGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, t.term, CAST(t.pos AS BIGINT) AS pos
  FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS term,
           generate_subscripts(
             regexp_extract_all(lower(text), '[a-z]+', 0), 1) AS pos
    FROM documents WHERE text IS NOT NULL
  ) AS t(doc_id, term, pos)
),
freq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1
  QUALIFY row_number() OVER (ORDER BY c DESC, term) <= 200
),
ft AS (
  SELECT tk.doc_id, tk.term, tk.pos
  FROM toks tk JOIN freq f ON f.term = tk.term
),
pairs AS (
  SELECT a.term AS center, b.term AS context,
         CAST(count(*) AS BIGINT) AS n_cooc
  FROM ft a JOIN ft b
    ON b.doc_id = a.doc_id
   AND b.pos BETWEEN a.pos - 2 AND a.pos + 2
   AND b.pos <> a.pos
  GROUP BY 1, 2
)
SELECT center, context, n_cooc
FROM pairs
ORDER BY n_cooc DESC, center, context
LIMIT 30
"""


@_register("skipgram_pair_counts", _SKIPGRAM_ORACLE)
def skipgram_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) co-occurrence counts with a ±2 token
    window over the top-200 vocabulary — the sufficient statistics
    behind word2vec/GloVe-style embedding training (the co-occurrence
    matrix IS the training set; negative sampling draws against the
    same frequency table). Positions come from posexplode, the window
    is a position-range self-equi-join on doc_id (never a cross join
    — per-doc pair work is 4·doc_len, linear), and the vocabulary
    prune runs BEFORE the pair join so rare-token pairs never
    materialize. Top pairs by count. Scale shape: one tokenize scan,
    a broadcast vocabulary semi-join, the per-doc position join, one
    mergeable pair rollup, TakeOrderedAndProject."""
    toks = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.posexplode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("pos0", "term"),
        )
        .select(
            "doc_id", "term", (F.col("pos0") + 1).cast("long").alias("pos")
        )
        .localCheckpoint(eager=False)
    )
    freq = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(200)
        .select("term")
    )
    ft = toks.join(F.broadcast(freq), "term", "left_semi").localCheckpoint(
        eager=False
    )
    a = ft.select(
        "doc_id", F.col("term").alias("center"), F.col("pos").alias("pa")
    )
    b = ft.select(
        "doc_id", F.col("term").alias("context"), F.col("pos").alias("pb")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(
            (F.col("pb") >= F.col("pa") - 2)
            & (F.col("pb") <= F.col("pa") + 2)
            & (F.col("pb") != F.col("pa"))
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cooc"))
    )
    return pairs.orderBy(
        F.col("n_cooc").desc(), "center", "context"
    ).limit(30)


_SAMPLE_SIZE_ORACLE = """
WITH base AS (
  SELECT CAST(sum(CASE WHEN conv = 1 THEN 1 ELSE 0 END) * 1000000
              // count(*) AS BIGINT) AS p_ppm,
         CAST(count(*) AS BIGINT) AS n_now
  FROM (
    SELECT user_id,
           max(CASE WHEN event_type = 'purchase' AND value > 450
                    THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY user_id
  )
),
grid AS (SELECT CAST(unnest([10000, 20000, 30000, 40000, 50000]) AS BIGINT)
                AS mde_ppm)
SELECT g.mde_ppm, b.p_ppm AS baseline_ppm, b.n_now,
       CAST(2 * 78848 * (b.p_ppm * (1000000 - b.p_ppm) // 1000000)
            // (g.mde_ppm * g.mde_ppm // 10000) AS BIGINT)
         AS n_per_arm_required,
       CASE WHEN b.n_now / 2
               >= 2 * 78848 * (b.p_ppm * (1000000 - b.p_ppm) // 1000000)
                  // (g.mde_ppm * g.mde_ppm // 10000)
            THEN 1 ELSE 0 END AS powered_now
FROM grid g, base b
ORDER BY g.mde_ppm
"""


@_register("ab_sample_size_plan", _SAMPLE_SIZE_ORACLE)
def ab_sample_size_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment-design power analysis: required sample size per arm
    for the `two_proportion_ab_test` readout at α=0.05 / 80% power
    across a grid of minimum detectable effects (1-5 points) —
    n = 2(z_α/2+z_β)²·p̄(1−p̄)/δ², with (1.96+0.84)² = 7.8848 carried
    as the literal integer 78848/10⁴ so the whole plan is a floor-div
    chain on ppm integers (the planning table every experiment review
    asks for BEFORE launch; `powered_now` says whether the current
    population could even detect that MDE). Scale shape: one per-user
    mergeable rollup to the baseline rate, then the 5-row MDE grid —
    all algebra on broadcast-tiny frames."""
    base = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 450),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN conv = 1 THEN 1 ELSE 0 END) * 1000000"
                " div count(*) AS BIGINT)"
            ).alias("p_ppm"),
            F.count(F.lit(1)).cast("long").alias("n_now"),
        )
    )
    grid = spark.range(1, 6).select(
        (F.col("id") * 10000).cast("long").alias("mde_ppm")
    )
    need = (
        "2 * 78848 * (p_ppm * (1000000 - p_ppm) div 1000000)"
        " div (mde_ppm * mde_ppm div 10000)"
    )
    return (
        grid.crossJoin(F.broadcast(base))
        .select(
            "mde_ppm",
            F.col("p_ppm").alias("baseline_ppm"),
            "n_now",
            F.expr(f"CAST({need} AS BIGINT)").alias("n_per_arm_required"),
            F.expr(
                f"CASE WHEN n_now div 2 >= {need} THEN 1 ELSE 0 END"
            ).alias("powered_now"),
        )
        .orderBy("mde_ppm")
    )


_PERM_TEST_ORACLE = """
WITH u AS (
  SELECT user_id,
         CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END AS treated,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
obs AS (
  SELECT CAST(sum(CASE WHEN treated = 1 THEN y END)
              // sum(CASE WHEN treated = 1 THEN 1 END)
            - sum(CASE WHEN treated = 0 THEN y END)
              // sum(CASE WHEN treated = 0 THEN 1 END) AS BIGINT) AS d_obs
  FROM u
),
rep AS (
  SELECT r.b, u.y,
         CAST('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || ':perm:'
                                 || CAST(r.b AS VARCHAR)), 1, 6)
              AS BIGINT) % 5 AS slot
  FROM u CROSS JOIN (SELECT unnest(range(0, 64)) AS b) r
),
perm AS (
  SELECT b,
         CAST(sum(CASE WHEN slot = 0 THEN y END)
              // sum(CASE WHEN slot = 0 THEN 1 END)
            - sum(CASE WHEN slot <> 0 THEN y END)
              // sum(CASE WHEN slot <> 0 THEN 1 END) AS BIGINT) AS d_b
  FROM rep GROUP BY b
)
SELECT o.d_obs AS observed_diff_micro,
       CAST(count(*) AS BIGINT) AS n_permutations,
       CAST(sum(CASE WHEN abs(p.d_b) >= abs(o.d_obs) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_as_extreme,
       CAST((sum(CASE WHEN abs(p.d_b) >= abs(o.d_obs) THEN 1 ELSE 0 END)
             + 1) * 1000000 // (count(*) + 1) AS BIGINT) AS p_value_ppm
FROM perm p, obs o
GROUP BY o.d_obs
"""


@_register("permutation_test_diff_means", _PERM_TEST_ORACLE)
def permutation_test_diff_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation (re-randomization) test for the treated-vs-control
    difference in per-user total event value: 64 md5-deterministic
    re-assignments of the SAME 1-in-5 assignment mechanism
    (md5(user:perm:b) mod 5 == 0) build the exact null distribution of
    the difference, and the p-value is the add-one rank
    (n_extreme+1)·10⁶ div (B+1) — the distribution-free significance
    test that needs NO variance formula (the honest companion to
    `two_proportion_ab_test` when outcomes are skewed sums, and the
    inference-side sibling of `poisson_bootstrap_ci`'s estimation —
    both made value-oracle-able by drawing Monte-Carlo randomness from
    md5). Since the real 'treatment' (user_id % 5) is itself arbitrary,
    the expected readout is a UNIFORM p-value, i.e. rarely significant
    — an A/A validation of the test. A replicate whose md5 slot is
    empty on either side yields a NULL diff and never counts as
    extreme (only reachable at toy populations; the add-one p-value
    stays conservative). Scale shape: one per-user rollup,
    a 64× JVM-side explode feeding ONE partial-aggregated shuffle to
    (replicate), all test algebra on the 64-row frame."""
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST(sum(CAST(round(value * 1000000) AS BIGINT))"
                " AS BIGINT)"
            ).alias("y")
        )
        .select(
            "user_id",
            F.when(F.col("user_id") % 5 == 0, 1).otherwise(0).alias(
                "treated"
            ),
            "y",
        )
        .localCheckpoint(eager=False)
    )
    obs = u.agg(
        F.expr(
            "CAST(sum(CASE WHEN treated = 1 THEN y END)"
            " div sum(CASE WHEN treated = 1 THEN 1 END)"
            " - sum(CASE WHEN treated = 0 THEN y END)"
            " div sum(CASE WHEN treated = 0 THEN 1 END) AS BIGINT)"
        ).alias("d_obs")
    )
    rep = u.select(
        "y",
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"),
    ).select(
        "b",
        "y",
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(user_id AS STRING), ':perm:',"
            " CAST(b AS STRING))), 1, 6), 16, 10) AS BIGINT) % 5"
        ).alias("slot"),
    )
    perm = rep.groupBy("b").agg(
        F.expr(
            "CAST(sum(CASE WHEN slot = 0 THEN y END)"
            " div sum(CASE WHEN slot = 0 THEN 1 END)"
            " - sum(CASE WHEN slot <> 0 THEN y END)"
            " div sum(CASE WHEN slot <> 0 THEN 1 END) AS BIGINT)"
        ).alias("d_b")
    )
    return (
        perm.crossJoin(F.broadcast(obs))
        .groupBy("d_obs")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_permutations"),
            F.sum(
                F.when(
                    F.abs(F.col("d_b")) >= F.abs(F.col("d_obs")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_as_extreme"),
        )
        .select(
            F.col("d_obs").alias("observed_diff_micro"),
            "n_permutations",
            "n_as_extreme",
            F.expr(
                "CAST((n_as_extreme + 1) * 1000000"
                " div (n_permutations + 1) AS BIGINT)"
            ).alias("p_value_ppm"),
        )
    )


# ===========================================================================
# Interval / market-data / privacy analytics wave (round 3, session 6)
# ===========================================================================

_SWEEPLINE_ORACLE = """
WITH job AS (
  SELECT epoch_us(ts) AS s,
         epoch_us(ts) + CAST(round(value * 1000000) AS BIGINT) AS e
  FROM events
),
seg AS (
  SELECT d.d AS d,
         greatest(s, d.d * 86400000000)       AS cs,
         least(e, (d.d + 1) * 86400000000)    AS ce
  FROM job, LATERAL (
    SELECT unnest(generate_series(s // 86400000000,
                                  (e - 1) // 86400000000)) AS d
  ) d
),
bounds AS (
  SELECT d, b.t AS t, b.delta AS delta
  FROM seg, LATERAL (
    SELECT unnest([{'t': cs, 'delta': 1}, {'t': ce, 'delta': -1}],
                  recursive := true)
  ) b
),
run AS (
  SELECT d, t, delta,
         sum(delta) OVER (PARTITION BY d ORDER BY t, delta) AS running,
         lead(t) OVER (PARTITION BY d ORDER BY t, delta) - t AS gap
  FROM bounds
)
SELECT CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS DATE) AS day,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_jobs,
       CAST(sum(-delta * t) AS BIGINT)                 AS sum_clipped_us,
       CAST(sum(running * coalesce(gap, 0)) AS BIGINT) AS concurrency_integral_us,
       CAST(CASE WHEN sum(running * coalesce(gap, 0)) = sum(-delta * t)
                 THEN 1 ELSE 0 END AS BIGINT)          AS littles_identity_holds,
       CAST(max(running) AS BIGINT)                    AS peak_concurrency,
       CAST(sum(running * coalesce(gap, 0)) // 86400 AS BIGINT)
                                                       AS avg_concurrency_ppm
FROM run
GROUP BY d
ORDER BY day
"""


@_register("concurrency_sweepline_daily", _SWEEPLINE_ORACLE)
def concurrency_sweepline_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency profile: each event is a job occupying
    [ts, ts + value seconds); jobs are clipped to UTC day boundaries and
    each day's boundary events (+1 at clipped start, -1 at clipped end)
    are swept in (t, delta) order — the RANGE-frame running sum makes
    same-instant ends process before starts (half-open intervals never
    overlap at a shared endpoint) and renders tie order irrelevant, so
    the profile is deterministic cross-engine. Emits the day's
    time-integral of concurrency (exact µs), peak concurrency, and
    average concurrency in ppm of the day — and EXECUTES Little's law
    (∫L dt == Σ clipped durations, an identity the lanes must reproduce
    bit-for-bit; `sum(-delta·t)` telescopes to Σ(ce−cs) so the check
    needs no second pass over `seg`). Scale shape: ≤2 boundary rows per
    event via one JVM-side explode, ONE hash shuffle to (day) for both
    the window and the final aggregate; days sweep in parallel — no
    global sort (the classic single-sort sweep-line, partitioned by the
    clipping key)."""
    d_us = F.lit(86_400_000_000)
    job = (
        _t(spark, sf_dir, "events")
        .select(
            F.unix_micros("ts").alias("s"),
            (
                F.unix_micros("ts")
                + F.expr("CAST(round(value * 1000000) AS BIGINT)")
            ).alias("e"),
        )
    )
    seg = job.select(
        F.explode(
            F.sequence(
                F.expr("s div 86400000000"), F.expr("(e - 1) div 86400000000")
            )
        ).alias("d"),
        "s",
        "e",
    ).select(
        "d",
        F.greatest("s", F.col("d") * d_us).alias("cs"),
        F.least("e", (F.col("d") + 1) * d_us).alias("ce"),
    )
    bounds = seg.select(
        "d",
        F.explode(
            F.array(
                F.struct(F.col("cs").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("ce").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("b"),
    ).select("d", F.col("b.t").alias("t"), F.col("b.delta").alias("delta"))
    w = W.partitionBy("d").orderBy("t", "delta")
    run = bounds.select(
        "d",
        "t",
        "delta",
        F.sum("delta").over(w).alias("running"),
        (F.lead("t").over(w) - F.col("t")).alias("gap"),
    )
    return (
        run.groupBy("d")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_jobs"),
            F.sum(-F.col("delta") * F.col("t")).cast("long").alias(
                "sum_clipped_us"
            ),
            F.sum(F.col("running") * F.coalesce(F.col("gap"), F.lit(0)))
            .cast("long")
            .alias("concurrency_integral_us"),
            F.max("running").cast("long").alias("peak_concurrency"),
        )
        .select(
            F.expr("date_add(DATE '1970-01-01', CAST(d AS INT))").alias("day"),
            "n_jobs",
            "sum_clipped_us",
            "concurrency_integral_us",
            F.when(
                F.col("concurrency_integral_us") == F.col("sum_clipped_us"), 1
            )
            .otherwise(0)
            .cast("long")
            .alias("littles_identity_holds"),
            "peak_concurrency",
            F.expr("CAST(concurrency_integral_us div 86400 AS BIGINT)").alias(
                "avg_concurrency_ppm"
            ),
        )
        .orderBy("day")
    )


_DRAWDOWN_ORACLE = """
WITH m AS (
  SELECT c.c_nationkey AS nk,
         date_trunc('month', o.o_orderdate) AS mo,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
dd AS (
  SELECT nk, mo, rev,
         max(rev) OVER (PARTITION BY nk ORDER BY mo) AS peak
  FROM m
)
SELECT n.n_name AS n_name,
       CAST(count(*) AS BIGINT)    AS n_months,
       CAST(max(rev) AS BIGINT)    AS best_month_cents,
       CAST(max(peak - rev) AS BIGINT) AS max_drawdown_cents,
       CAST(max((peak - rev) * 1000000 // peak) AS BIGINT)
                                   AS max_drawdown_ppm
FROM dd JOIN nation n ON dd.nk = n.n_nationkey
GROUP BY n.n_name
ORDER BY n_name
"""


@_register("max_drawdown_monthly_revenue", _DRAWDOWN_ORACLE)
def max_drawdown_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each nation's monthly revenue series: the
    running peak (max-so-far window) minus the current month, reported
    both in exact cents and in ppm of the peak at the time — the
    risk/volatility readout finance and capacity dashboards both use
    (how far below its best month has this series fallen, at worst).
    All arithmetic in integer cents so the statistic value-checks;
    drawdown is over OBSERVED months (calendar gaps neither extend nor
    reset the peak — pair with `recursive_calendar_spine`-style
    densification when gap semantics matter). Scale shape: one
    partial-aggregated shuffle to (nation, month), then windows + final
    rollup on the bounded monthly frame; nation names broadcast."""
    m = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.date_trunc("month", "o_orderdate").alias("mo"),
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            ).alias("rev")
        )
    )
    dd = m.select(
        "nk",
        "rev",
        F.max("rev").over(W.partitionBy("nk").orderBy("mo")).alias("peak"),
    )
    return (
        dd.join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("nk") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_months"),
            F.max("rev").cast("long").alias("best_month_cents"),
            F.max(F.col("peak") - F.col("rev")).cast("long").alias(
                "max_drawdown_cents"
            ),
            F.max(F.expr("(peak - rev) * 1000000 div peak"))
            .cast("long")
            .alias("max_drawdown_ppm"),
        )
        .orderBy("n_name")
    )


_OHLC_ORACLE = """
WITH v AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(round(value * 1000000) AS BIGINT) AS vm,
         row_number() OVER (PARTITION BY CAST(ts AS DATE), event_type
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY CAST(ts AS DATE), event_type
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT day, event_type,
       CAST(count(*) AS BIGINT)                          AS n_events,
       CAST(max(CASE WHEN rn_a = 1 THEN vm END) AS BIGINT) AS open_micro,
       CAST(max(vm) AS BIGINT)                           AS high_micro,
       CAST(min(vm) AS BIGINT)                           AS low_micro,
       CAST(max(CASE WHEN rn_d = 1 THEN vm END) AS BIGINT) AS close_micro,
       CAST(sum(vm) AS BIGINT)                           AS total_micro
FROM v
GROUP BY day, event_type
ORDER BY day, event_type
"""


@_register("ohlc_bars_daily", _OHLC_ORACLE)
def ohlc_bars_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars: per (day, event_type), the first (open),
    highest, lowest, and last (close) observed value in exact micro
    units plus volume — the time-series downsampling shape every
    market-data / metrics store exposes (`first`/`last` made
    deterministic by the (ts, event_id) total order, so ties at the
    same microsecond can't flip the bar cross-engine). Scale shape: ONE
    hash exchange to (day, type) serves both row_number windows (same
    partitioning, two sort orders) and the final aggregate — bars for
    different days/types build in parallel; no global sort."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vm"),
        "ts",
        "event_id",
    )
    pw = W.partitionBy("day", "event_type")
    v = ev.select(
        "day",
        "event_type",
        "vm",
        F.row_number().over(pw.orderBy("ts", "event_id")).alias("rn_a"),
        F.row_number()
        .over(pw.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
    )
    return (
        v.groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max(F.when(F.col("rn_a") == 1, F.col("vm")))
            .cast("long")
            .alias("open_micro"),
            F.max("vm").cast("long").alias("high_micro"),
            F.min("vm").cast("long").alias("low_micro"),
            F.max(F.when(F.col("rn_d") == 1, F.col("vm")))
            .cast("long")
            .alias("close_micro"),
            F.sum("vm").cast("long").alias("total_micro"),
        )
        .orderBy("day", "event_type")
    )


_EWMA_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, day, x,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k
  FROM daily
)
SELECT a.day AS day, a.event_type AS event_type,
       CAST(a.x AS BIGINT) AS n_events,
       CAST(1000 * sum((1 << (15 - (a.k - b.k))) * b.x)
            // sum(1 << (15 - (a.k - b.k))) AS BIGINT) AS ewma_milli
FROM r a JOIN r b
  ON a.event_type = b.event_type AND b.k BETWEEN a.k - 15 AND a.k
GROUP BY a.day, a.event_type, a.x
ORDER BY day, event_type
"""


@_register("ewma_daily_event_counts", _EWMA_ORACLE)
def ewma_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α=1/2, pandas
    `ewm(adjust=True)` semantics) of daily event counts per type, in
    EXACT integer arithmetic: weights (1−α)^k become power-of-two
    integers 2^(15−k) over a 16-day horizon (tail weight < 2⁻¹⁵ of the
    head — below the milli output grid), and partial leading windows
    divide by the PARTIAL weight sum exactly as adjust=True does. The
    recursive EWMA definition is thus rewritten to its closed windowed
    form — same move as `cusum_changepoint_screen` — so the smoother
    itself carries a full value oracle. Scale shape: the raw stream
    collapses via one partial-aggregated rollup to (type, day) — a
    frame bounded by calendar × type cardinality, NOT event volume —
    then a 16-wide banded self-join (localCheckpoint'ed: AQE never
    reuses self-join stages) and one aggregate on that bounded frame."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    r = daily.select(
        "event_type",
        "day",
        "x",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("day"))
        .alias("k"),
    ).localCheckpoint(eager=False)
    a = r.alias("a")
    b = r.alias("b")
    j = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.k") >= F.col("a.k") - 15)
        & (F.col("b.k") <= F.col("a.k")),
    )
    return (
        j.groupBy(
            F.col("a.day").alias("day"),
            F.col("a.event_type").alias("event_type"),
            F.col("a.x").alias("n_events"),
        )
        .agg(
            F.expr(
                "CAST(1000 * sum(shiftleft(1, 15 - (a.k - b.k)) * b.x)"
                " div sum(shiftleft(1, 15 - (a.k - b.k))) AS BIGINT)"
            ).alias("ewma_milli")
        )
        .orderBy("day", "event_type")
    )


_TCLOSENESS_ORACLE = """
WITH cust AS (
  SELECT c_nationkey, c_mktsegment,
         least(9, greatest(0,
           (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 120000))
           AS bin
  FROM customer
),
cnt AS (
  SELECT c_nationkey, c_mktsegment, bin, CAST(count(*) AS BIGINT) AS c
  FROM cust GROUP BY 1, 2, 3
),
grp AS (
  SELECT c_nationkey, c_mktsegment, CAST(sum(c) AS BIGINT) AS n_g
  FROM cnt GROUP BY 1, 2
),
gbin AS (
  SELECT b.b AS bin, coalesce(sum(c), 0) AS gc
  FROM (SELECT unnest(generate_series(0, 9)) AS b) b
  LEFT JOIN cnt ON cnt.bin = b.b
  GROUP BY b.b
),
gcum AS (
  SELECT bin, sum(gc) OVER (ORDER BY bin) AS cum_gc,
         (SELECT sum(gc) FROM gbin) AS n_total
  FROM gbin
),
dense AS (
  SELECT g.c_nationkey, g.c_mktsegment, g.n_g, b.b AS bin,
         coalesce(c.c, 0) AS c
  FROM grp g
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS b) b
  LEFT JOIN cnt c ON c.c_nationkey = g.c_nationkey
                 AND c.c_mktsegment = g.c_mktsegment AND c.bin = b.b
),
cum AS (
  SELECT c_nationkey, c_mktsegment, n_g, bin,
         sum(c) OVER (PARTITION BY c_nationkey, c_mktsegment
                      ORDER BY bin) AS cum_c
  FROM dense
)
SELECT m.c_nationkey AS c_nationkey, m.c_mktsegment AS c_mktsegment,
       CAST(m.n_g AS BIGINT) AS k_size,
       CAST(1000000 * sum(abs(m.cum_c * g.n_total - g.cum_gc * m.n_g))
            // (9 * m.n_g * (SELECT n_total FROM gcum LIMIT 1)) AS BIGINT)
         AS t_emd_ppm,
       CAST(CASE WHEN 1000000 * sum(abs(m.cum_c * g.n_total - g.cum_gc * m.n_g))
                      // (9 * m.n_g * (SELECT n_total FROM gcum LIMIT 1))
                      > 150000
                 THEN 1 ELSE 0 END AS BIGINT) AS tcloseness_violation
FROM cum m JOIN gcum g ON m.bin = g.bin
WHERE m.bin < 9
GROUP BY m.c_nationkey, m.c_mktsegment, m.n_g
ORDER BY c_nationkey, c_mktsegment
"""


@_register("tcloseness_emd_audit", _TCLOSENESS_ORACLE)
def tcloseness_emd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the step past `kanonymity_risk_audit`'s
    k/l-diversity: for each quasi-identifier class (nation, market
    segment), the Earth Mover's Distance between the class's SENSITIVE
    distribution (account balance in ten fixed $1,200 bands) and the
    global one, under the ordinal ground metric — EMD reduces to the
    mean |ΔCDF| over interior bin boundaries. Computed as exact
    integer rationals on the common denominator n_g·N (cum_c·N −
    cum_C·n_g per boundary), so the privacy statistic itself
    value-checks; classes with t > 0.15 are flagged (an attacker
    learns their members' balances deviate that far from background
    knowledge even when k is large). Scale shape: one rollup shuffle
    to (QI, bin); the dense 10-bin grid, global CDF (10 rows,
    broadcast) and per-class windows all live on the bounded
    class-cardinality frame."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "least(9, greatest(0, (CAST(round(c_acctbal * 100) AS BIGINT)"
            " + 100000) div 120000))"
        ).alias("bin"),
    )
    cnt = (
        cust.groupBy("c_nationkey", "c_mktsegment", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    grp = cnt.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("c").cast("long").alias("n_g")
    )
    bins = spark.range(0, 10).select(F.col("id").cast("long").alias("bin"))
    gbin = (
        bins.join(
            cnt.groupBy("bin").agg(F.sum("c").alias("gc")), "bin", "left"
        )
        .select("bin", F.coalesce("gc", F.lit(0)).alias("gc"))
    )
    gcum = gbin.select(
        "bin",
        F.sum("gc").over(W.orderBy("bin")).alias("cum_gc"),
        F.sum("gc").over(
            W.orderBy("bin").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n_total"),
    )
    dense = (
        grp.crossJoin(F.broadcast(bins))
        .join(cnt, ["c_nationkey", "c_mktsegment", "bin"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_g",
            "bin",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    cum = dense.select(
        "c_nationkey",
        "c_mktsegment",
        "n_g",
        "bin",
        F.sum("c")
        .over(W.partitionBy("c_nationkey", "c_mktsegment").orderBy("bin"))
        .alias("cum_c"),
    )
    t_num = "1000000 * sum(abs(cum_c * n_total - cum_gc * n_g))"
    return (
        cum.filter(F.col("bin") < 9)
        .join(F.broadcast(gcum), "bin")
        .groupBy("c_nationkey", "c_mktsegment", "n_g")
        .agg(
            F.expr(
                f"CAST({t_num} div (9 * n_g * max(n_total)) AS BIGINT)"
            ).alias("t_emd_ppm")
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("n_g").cast("long").alias("k_size"),
            "t_emd_ppm",
            F.when(F.col("t_emd_ppm") > 150000, 1)
            .otherwise(0)
            .cast("long")
            .alias("tcloseness_violation"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ===========================================================================
# Retrieval / information-theory / dispersion / paired-test wave
# ===========================================================================

_PHRASE_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS arr
  FROM documents WHERE text IS NOT NULL
),
pos AS (
  SELECT doc_id, g.i AS pos, arr[g.i] AS tok
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) g
),
pairs AS (
  SELECT arr[g.i] AS w1, arr[g.i + 1] AS w2
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i) g
  WHERE len(arr) >= 2
),
top1 AS (
  SELECT w1, w2 FROM pairs GROUP BY w1, w2
  ORDER BY count(*) DESC, w1, w2 LIMIT 1
)
SELECT p1.doc_id AS doc_id,
       (SELECT w1 || ' ' || w2 FROM top1) AS phrase,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM pos p1
JOIN top1 ON p1.tok = top1.w1
JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
           AND p2.tok = top1.w2
GROUP BY p1.doc_id
ORDER BY n_occurrences DESC, doc_id
LIMIT 20
"""


@_register("phrase_match_positional", _PHRASE_ORACLE)
def phrase_match_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-inverted-index phrase search: the corpus's most
    frequent bigram (count desc, then lexicographic — fully
    deterministic) becomes the query phrase, and matching is the
    classic positional-index join — postings for word1 equi-joined to
    postings for word2 on (doc, pos+1). This is how every full-text
    engine executes quoted phrases; the adjacency test lives in the
    JOIN KEY, not a post-filter, so only true phrase hits flow.
    Scale shape: the 1-row phrase frame broadcasts to PRUNE both
    posting streams before their equi-join (each side collapses to the
    phrase word's postings); top-20 via TakeOrderedAndProject. The
    bigram-count pass is one rollup over a JVM-side transform/explode
    (token array bound once as a column — no per-element re-split)."""
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("arr"))
    )
    toks = docs.select(
        "doc_id", F.posexplode("arr").alias("pos", "tok")
    ).localCheckpoint(eager=False)
    pairs = (
        docs.filter(F.size("arr") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(arr) - 2),"
                    " i -> struct(arr[i] AS w1, arr[i + 1] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    top1 = (
        pairs.groupBy("w1", "w2")
        .count()
        .orderBy(F.col("count").desc(), "w1", "w2")
        .limit(1)
        .select("w1", "w2")
    )
    t1 = toks.join(F.broadcast(top1), F.col("tok") == F.col("w1")).select(
        F.col("doc_id").alias("d1"),
        "pos",
        F.concat_ws(" ", "w1", "w2").alias("phrase"),
    )
    t2 = toks.join(
        F.broadcast(top1.select(F.col("w2").alias("q2"))),
        F.col("tok") == F.col("q2"),
    ).select(F.col("doc_id").alias("d2"), F.col("pos").alias("pos2"))
    return (
        t1.join(
            t2,
            (F.col("d1") == F.col("d2"))
            & (F.col("pos2") == F.col("pos") + 1),
        )
        .groupBy(F.col("d1").alias("doc_id"), "phrase")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "doc_id")
        .limit(20)
    )


_SHANNON_ORACLE = """
WITH st AS (
  SELECT source, tok.t AS tok, CAST(count(*) AS BIGINT) AS c
  FROM documents, LATERAL (
    SELECT unnest(string_split(text, ' ')) AS t
  ) tok
  WHERE text IS NOT NULL
  GROUP BY source, tok.t
),
code AS (
  SELECT tok,
         CAST(length(bin(sum(sum(c)) OVER () // sum(c))) AS BIGINT) AS bits,
         CAST(length(bin(count(*) OVER () - 1)) AS BIGINT) AS unif_bits
  FROM st GROUP BY tok
)
SELECT st.source AS source,
       CAST(sum(st.c) AS BIGINT)                AS n_tokens,
       CAST(sum(st.c * code.bits) AS BIGINT)    AS total_bits,
       CAST(1000 * sum(st.c * code.bits) // sum(st.c) AS BIGINT)
                                                AS bits_per_token_milli,
       CAST(sum(st.c) * max(code.unif_bits) AS BIGINT) AS uniform_bits,
       CAST((sum(st.c) * max(code.unif_bits) - sum(st.c * code.bits))
            * 1000000 // (sum(st.c) * max(code.unif_bits)) AS BIGINT)
                                                AS savings_ppm
FROM st JOIN code USING (tok)
GROUP BY st.source
ORDER BY source
"""


@_register("shannon_fano_code_length", _SHANNON_ORACLE)
def shannon_fano_code_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-theoretic compression audit WITHOUT libm: assign
    each token the Shannon-Fano-style code length
    ⌊log2(N div c_t)⌋+1 = length(bin(N div c_t)) bits — a STRING
    length, not a float log, so the whole audit is exact integers —
    and price each source's token stream under that global code vs the
    fixed-width ⌈log2 V⌉ uniform code. The per-source bits/token and
    savings expose which sources are low-entropy (repetitive — cheap
    to compress, low information density): the corpus-quality signal
    entropy screens give, with a value oracle entropy itself can't
    carry. Scale shape: one partial-aggregated rollup to
    (source, token); the code table is vocabulary-sized (broadcast),
    N and V ride window aggregates on that tiny frame."""
    st = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    code = (
        st.groupBy("tok")
        .agg(F.sum("c").alias("ct"))
        .select(
            "tok",
            F.expr(
                "CAST(length(bin(sum(ct) OVER (ROWS BETWEEN UNBOUNDED"
                " PRECEDING AND UNBOUNDED FOLLOWING) div ct)) AS BIGINT)"
            ).alias("bits"),
            F.expr(
                "CAST(length(bin(count(*) OVER (ROWS BETWEEN UNBOUNDED"
                " PRECEDING AND UNBOUNDED FOLLOWING) - 1)) AS BIGINT)"
            ).alias("unif_bits"),
        )
    )
    return (
        st.join(F.broadcast(code), "tok")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("bits")).cast("long").alias("total_bits"),
            F.expr(
                "CAST(1000 * sum(c * bits) div sum(c) AS BIGINT)"
            ).alias("bits_per_token_milli"),
            F.expr("CAST(sum(c) * max(unif_bits) AS BIGINT)").alias(
                "uniform_bits"
            ),
            F.expr(
                "CAST((sum(c) * max(unif_bits) - sum(c * bits)) * 1000000"
                " div (sum(c) * max(unif_bits)) AS BIGINT)"
            ).alias("savings_ppm"),
        )
        .orderBy("source")
    )


_OOV_ORACLE = """
WITH st AS (
  SELECT source, tok.t AS tok, CAST(count(*) AS BIGINT) AS c
  FROM documents, LATERAL (
    SELECT unnest(string_split(text, ' ')) AS t
  ) tok
  WHERE text IS NOT NULL
  GROUP BY source, tok.t
),
vocab AS (
  SELECT tok, row_number() OVER (ORDER BY sum(c) DESC, tok) AS rk
  FROM st GROUP BY tok
)
SELECT st.source AS source,
       CAST(sum(st.c) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.rk > 20 THEN st.c ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(sum(CASE WHEN v.rk > 20 THEN st.c ELSE 0 END) * 1000000
            // sum(st.c) AS BIGINT) AS oov_ppm,
       CAST(sum(CASE WHEN v.rk > 20 THEN 1 ELSE 0 END) AS BIGINT)
         AS oov_types
FROM st JOIN vocab v USING (tok)
GROUP BY st.source
ORDER BY source
"""


@_register("vocab_oov_audit", _OOV_ORACLE)
def vocab_oov_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary coverage audit: freeze a top-20 vocabulary
    (global frequency desc, token asc — deterministic tie-break) and
    measure every source's OOV token rate against it in exact ppm —
    the tokenizer/embedding-table coverage question asked before any
    fixed-vocab model trains on a new source (high OOV = the source is
    out-of-distribution for the vocab). Scale shape: one
    partial-aggregated rollup to (source, token); the vocabulary rank
    is a window on the vocabulary-sized frame, broadcast back — raw
    token volume is touched exactly once."""
    st = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    vocab = (
        st.groupBy("tok")
        .agg(F.sum("c").alias("ct"))
        .select(
            "tok",
            F.row_number()
            .over(W.orderBy(F.col("ct").desc(), "tok"))
            .alias("rk"),
        )
    )
    return (
        st.join(F.broadcast(vocab), "tok")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("rk") > 20, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.expr(
                "CAST(sum(CASE WHEN rk > 20 THEN c ELSE 0 END) * 1000000"
                " div sum(c) AS BIGINT)"
            ).alias("oov_ppm"),
            F.sum(F.when(F.col("rk") > 20, 1).otherwise(0))
            .cast("long")
            .alias("oov_types"),
        )
        .orderBy("source")
    )


_FANO_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM daily GROUP BY 1
),
q AS (
  SELECT event_type, n, sx, n * sxx - sx * sx AS var_num,
         CAST(floor(sqrt(CAST((n * sxx - sx * sx) * n * 1000000 // (n - 1)
                              AS DOUBLE))) AS BIGINT) AS s0,
         (n * sxx - sx * sx) * n * 1000000 // (n - 1) AS a
  FROM s
),
r AS (
  SELECT event_type, n, sx, var_num,
         CASE WHEN (s0 + 1) * (s0 + 1) <= a THEN s0 + 1
              WHEN s0 * s0 > a THEN s0 - 1
              ELSE s0 END AS sig_n_milli
  FROM q
)
SELECT event_type,
       CAST(n AS BIGINT)                              AS n_days,
       CAST(1000 * sx // n AS BIGINT)                 AS mean_milli,
       CAST(1000 * var_num // ((n - 1) * sx) AS BIGINT) AS fano_milli,
       CAST(sig_n_milli AS BIGINT)                    AS sigma_n_milli,
       CAST(1000 * (sig_n_milli - 1000 * sx)
            // (sig_n_milli + 1000 * sx) AS BIGINT)   AS burstiness_milli,
       CAST(CASE WHEN 1000 * var_num // ((n - 1) * sx) > 1000
                 THEN 1 ELSE 0 END AS BIGINT)         AS overdispersed
FROM r
ORDER BY event_type
"""


@_register("overdispersion_fano_burstiness", _FANO_ORACLE)
def overdispersion_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion screen on daily arrival counts per event type:
    the Fano factor (sample variance / mean — 1.0 for a Poisson
    process, >1 means bursty arrivals that will overflow
    Poisson-sized capacity) and the Goh-Barabási burstiness
    B = (σ−μ)/(σ+μ), both in exact integer milli-units: variance
    rides the n·Σx²−(Σx)² integer form and σ·n·1000 comes from the
    floor-sqrt with ±1 integer-square correction (the same exact-isqrt
    recipe as `neyman_allocation_plan`), so a statistic built on a
    square root still value-checks bit-for-bit. Scale shape: the raw
    stream collapses via one partial-aggregated rollup to (type, day);
    every moment and root lives on the type-cardinality frame."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    q = s.select(
        "event_type",
        "n",
        "sx",
        F.expr("n * sxx - sx * sx").alias("var_num"),
        F.expr(
            "CAST(floor(sqrt(CAST((n * sxx - sx * sx) * n * 1000000"
            " div (n - 1) AS DOUBLE))) AS BIGINT)"
        ).alias("s0"),
        F.expr("(n * sxx - sx * sx) * n * 1000000 div (n - 1)").alias("a"),
    )
    r = q.select(
        "event_type",
        "n",
        "sx",
        "var_num",
        F.expr(
            "CASE WHEN (s0 + 1) * (s0 + 1) <= a THEN s0 + 1"
            " WHEN s0 * s0 > a THEN s0 - 1 ELSE s0 END"
        ).alias("sig_n_milli"),
    )
    return r.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.expr("CAST(1000 * sx div n AS BIGINT)").alias("mean_milli"),
        F.expr("CAST(1000 * var_num div ((n - 1) * sx) AS BIGINT)").alias(
            "fano_milli"
        ),
        F.col("sig_n_milli").cast("long").alias("sigma_n_milli"),
        F.expr(
            "CAST(1000 * (sig_n_milli - 1000 * sx)"
            " div (sig_n_milli + 1000 * sx) AS BIGINT)"
        ).alias("burstiness_milli"),
        F.expr(
            "CAST(CASE WHEN 1000 * var_num div ((n - 1) * sx) > 1000"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("overdispersed"),
    ).orderBy("event_type")


_MCNEMAR_ORACLE = """
WITH u AS (
  SELECT user_id, event_type,
         max(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS h1,
         max(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END) AS h2
  FROM events GROUP BY 1, 2
),
pop AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
c AS (
  SELECT event_type,
         CAST(sum(h1 * h2) AS BIGINT)           AS n11,
         CAST(sum(h1 * (1 - h2)) AS BIGINT)     AS n10,
         CAST(sum((1 - h1) * h2) AS BIGINT)     AS n01,
         CAST(count(*) AS BIGINT)               AS n_obs
  FROM u GROUP BY 1
)
SELECT event_type, n11, n10, n01,
       CAST(pop.n_users - n_obs AS BIGINT) AS n00,
       CAST(1000 * (n10 - n01) * (n10 - n01)
            // greatest(n10 + n01, 1) AS BIGINT) AS chi2_milli,
       CAST(CASE WHEN 1000 * (n10 - n01) * (n10 - n01)
                      // greatest(n10 + n01, 1) > 3841
                 THEN 1 ELSE 0 END AS BIGINT) AS significant_05
FROM c, pop
ORDER BY event_type
"""


@_register("mcnemar_paired_conversion", _MCNEMAR_ORACLE)
def mcnemar_paired_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test per event type: did the population's
    propensity to emit this event CHANGE between the month's first and
    second half? Each user is their own control (the paired design
    that removes between-user variance), and only the DISCORDANT
    users matter: χ² = (n10−n01)²/(n10+n01), exact in integer
    milli-units since the statistic is a ratio of integers — no
    variance estimate, no libm. n00 (users never emitting the type)
    comes from the population count minus observed pairs, so the full
    2×2 concordance table rides along. Expected readout on synthetic
    uniform traffic: discordant counts near-balanced, rarely
    significant — an A/A validation like `permutation_test_diff_means`.
    Scale shape: one rollup shuffle to (user, type); the test algebra
    lives on the type-cardinality frame with the 1-row population
    count broadcast."""
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.max(
                F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0)
            ).alias("h1"),
            F.max(
                F.when(F.dayofmonth("ts") > 15, 1).otherwise(0)
            ).alias("h2"),
        )
    )
    pop = _t(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    c = u.groupBy("event_type").agg(
        F.sum(F.col("h1") * F.col("h2")).cast("long").alias("n11"),
        F.sum(F.col("h1") * (1 - F.col("h2"))).cast("long").alias("n10"),
        F.sum((1 - F.col("h1")) * F.col("h2")).cast("long").alias("n01"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )
    chi2 = "1000 * (n10 - n01) * (n10 - n01) div greatest(n10 + n01, 1)"
    return (
        c.crossJoin(F.broadcast(pop))
        .select(
            "event_type",
            "n11",
            "n10",
            "n01",
            (F.col("n_users") - F.col("n_obs")).cast("long").alias("n00"),
            F.expr(f"CAST({chi2} AS BIGINT)").alias("chi2_milli"),
            F.expr(
                f"CAST(CASE WHEN {chi2} > 3841 THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("significant_05"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# Graph link prediction / supply-chain / operational-percentile wave
# ===========================================================================

_LINKPRED_ORACLE = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
  GROUP BY node
),
top50 AS (
  SELECT node FROM deg ORDER BY d DESC, node LIMIT 50
),
ind AS (
  SELECT u, v FROM edges
  WHERE u IN (SELECT node FROM top50) AND v IN (SELECT node FROM top50)
),
und AS (
  SELECT u AS s, v AS t FROM ind UNION ALL SELECT v, u FROM ind
),
ideg AS (
  SELECT s AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY s
),
cand AS (
  SELECT e1.s AS u, e2.t AS v,
         CAST(count(*) AS BIGINT) AS common_neighbors,
         CAST(sum(1000000 // ideg.d) AS BIGINT) AS ra_index_ppm
  FROM und e1
  JOIN und e2 ON e1.t = e2.s AND e1.s < e2.t
  JOIN ideg ON ideg.node = e1.t
  GROUP BY e1.s, e2.t
)
SELECT c.u AS u, c.v AS v, c.common_neighbors, c.ra_index_ppm
FROM cand c
WHERE NOT EXISTS (SELECT 1 FROM ind WHERE ind.u = c.u AND ind.v = c.v)
ORDER BY common_neighbors DESC, ra_index_ppm DESC, u, v
LIMIT 20
"""


@_register("link_prediction_common_neighbors", _LINKPRED_ORACLE)
def link_prediction_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the part co-purchase graph: parts are linked
    when they appear in the same order; the top-20 UNLINKED pairs are
    ranked by common-neighbor count with the resource-allocation index
    (Σ 1/deg(z) over shared neighbors z, exact ppm since degrees are
    integers) as tie-breaker — the classic 'customers also bought'
    / recommendation-candidate shape. The scored panel is the
    degree-top-50 induced subgraph: 2-hop enumeration is quadratic in
    degree, so production runs bound it to head entities exactly as
    `jl_projection_recall` pins its query panel — the bound is the
    design, not a shortcut. Scale shape: co-purchase pairs expand
    JVM-side from each order's sorted part set (one collect_set
    shuffle + a higher-order-function pair explode — no self-join of
    the fact table), then one distinct; degree/top-50/induced-subgraph
    all collapse to broadcast-tiny frames before the 2-hop self-join;
    existence filter is an anti join, never NOT-IN-over-cross."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("arr"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(arr, (x, i) ->"
                    " transform(slice(arr, i + 2, size(arr) - i - 1),"
                    " y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    top50 = deg.orderBy(F.col("d").desc(), "node").limit(50).select("node")
    ind = (
        edges.join(
            F.broadcast(top50.withColumnRenamed("node", "u")), "u", "semi"
        )
        .join(F.broadcast(top50.withColumnRenamed("node", "v")), "v", "semi")
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    und = ind.select(F.col("u").alias("s"), F.col("v").alias("t")).unionAll(
        ind.select(F.col("v").alias("s"), F.col("u").alias("t"))
    ).localCheckpoint(eager=False)
    ideg = und.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    cand = (
        e1.join(
            e2,
            (F.col("e1.t") == F.col("e2.s"))
            & (F.col("e1.s") < F.col("e2.t")),
        )
        .join(F.broadcast(ideg), F.col("node") == F.col("e1.t"))
        .groupBy(F.col("e1.s").alias("u"), F.col("e2.t").alias("v"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum(F.expr("1000000 div d")).cast("long").alias("ra_index_ppm"),
        )
    )
    return (
        cand.join(ind, ["u", "v"], "anti")
        .orderBy(
            F.col("common_neighbors").desc(),
            F.col("ra_index_ppm").desc(),
            "u",
            "v",
        )
        .limit(20)
    )


_INTERMITTENCY_ORACLE = """
WITH d AS (
  SELECT l.l_partkey AS pk, p.p_brand AS p_brand,
         date_trunc('month', o.o_orderdate) AS m,
         CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3
),
per AS (SELECT CAST(count(DISTINCT m) AS BIGINT) AS n_periods FROM d),
s AS (
  SELECT pk, p_brand, CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(q) AS BIGINT) AS sq, CAST(sum(q * q) AS BIGINT) AS sqq
  FROM d GROUP BY 1, 2
),
cls AS (
  SELECT p_brand,
         1000 * per.n_periods // nd AS adi_milli,
         CASE WHEN nd >= 2
              THEN 1000 * nd * (nd * sqq - sq * sq) // ((nd - 1) * sq * sq)
              ELSE 0 END AS cv2_milli
  FROM s, per
)
SELECT p_brand,
       CASE WHEN adi_milli < 1320 AND cv2_milli < 490 THEN 'smooth'
            WHEN adi_milli >= 1320 AND cv2_milli < 490 THEN 'intermittent'
            WHEN adi_milli < 1320 THEN 'erratic'
            ELSE 'lumpy' END AS demand_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(adi_milli) // count(*) AS BIGINT) AS avg_adi_milli,
       CAST(sum(cv2_milli) // count(*) AS BIGINT) AS avg_cv2_milli
FROM cls
GROUP BY p_brand, demand_class
ORDER BY p_brand, demand_class
"""


@_register("part_demand_intermittency", _INTERMITTENCY_ORACLE)
def part_demand_intermittency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos-Boylan demand classification per part — the
    supply-chain screen deciding which forecasting family a SKU gets:
    ADI (average demand interval = observed periods / periods with
    demand) × CV² of nonzero demand sizes, quadrant-split at the
    literature's 1.32 / 0.49 cutoffs (milli-integers 1320/490), rolled
    up to (brand, class) counts. Both statistics are exact integer
    ratios (CV² via the n·Σq²−(Σq)² form over integer-valued
    quantities; single-demand-month parts define CV²=0). Scale shape:
    the order month rides in on a broadcast projection so the fact
    table shuffles ONCE, to (part, month); per-part stats are a second
    partial-aggregated pass, brand joins broadcast on the
    part-cardinality frame, and the global period count broadcasts as
    a 1-row frame."""
    d = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "orders").select(
                    "o_orderkey",
                    F.date_trunc("month", "o_orderdate").alias("m"),
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_partkey").alias("pk"), "m")
        .agg(
            F.expr(
                "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)"
            ).alias("q")
        )
        .localCheckpoint(eager=False)
    )
    per = d.agg(F.countDistinct("m").cast("long").alias("n_periods"))
    s = (
        d.groupBy("pk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nd"),
            F.sum("q").cast("long").alias("sq"),
            F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "part").select(
                    F.col("p_partkey").alias("pk"), "p_brand"
                )
            ),
            "pk",
        )
    )
    cls = s.crossJoin(F.broadcast(per)).select(
        "p_brand",
        F.expr("1000 * n_periods div nd").alias("adi_milli"),
        F.expr(
            "CASE WHEN nd >= 2 THEN 1000 * nd * (nd * sqq - sq * sq)"
            " div ((nd - 1) * sq * sq) ELSE 0 END"
        ).alias("cv2_milli"),
    )
    return (
        cls.select(
            "p_brand",
            F.expr(
                "CASE WHEN adi_milli < 1320 AND cv2_milli < 490 THEN 'smooth'"
                " WHEN adi_milli >= 1320 AND cv2_milli < 490"
                " THEN 'intermittent'"
                " WHEN adi_milli < 1320 THEN 'erratic'"
                " ELSE 'lumpy' END"
            ).alias("demand_class"),
            "adi_milli",
            "cv2_milli",
        )
        .groupBy("p_brand", "demand_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.expr("CAST(sum(adi_milli) div count(*) AS BIGINT)").alias(
                "avg_adi_milli"
            ),
            F.expr("CAST(sum(cv2_milli) div count(*) AS BIGINT)").alias(
                "avg_cv2_milli"
            ),
        )
        .orderBy("p_brand", "demand_class")
    )


_PCTL_BANDS_ORACLE = """
WITH v AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(round(value * 1000000) AS BIGINT) AS vm,
         row_number() OVER (PARTITION BY CAST(ts AS DATE)
                            ORDER BY round(value * 1000000), event_id) AS rn,
         count(*) OVER (PARTITION BY CAST(ts AS DATE)) AS n
  FROM events
)
SELECT day,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN vm END) AS BIGINT)
         AS p50_micro,
       CAST(max(CASE WHEN rn = (n * 90 + 99) // 100 THEN vm END) AS BIGINT)
         AS p90_micro,
       CAST(max(CASE WHEN rn = (n * 99 + 99) // 100 THEN vm END) AS BIGINT)
         AS p99_micro,
       CAST(max(vm) AS BIGINT) AS max_micro
FROM v
GROUP BY day
ORDER BY day
"""


@_register("daily_percentile_bands", _PCTL_BANDS_ORACLE)
def daily_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational latency dashboard: exact nearest-rank
    p50/p90/p99 bands per day (rank ⌈q·n⌉ under the (value, event_id)
    total order — EXACT order statistics in integer micro units, where
    `percentile_approx` would need an rtol lane). Scale shape: one
    hash exchange to (day) serves the rank window, the count window
    and the final aggregate; days sort in parallel and no task ever
    sees more than one day — the percentile-per-time-bucket pattern
    that replaces a global sort with a partitioned one."""
    pw = W.partitionBy("day")
    v = (
        _t(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vm"),
            "event_id",
        )
        .select(
            "day",
            "vm",
            F.row_number().over(pw.orderBy("vm", "event_id")).alias("rn"),
            F.count(F.lit(1))
            .over(
                pw.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
            )
            .alias("n"),
        )
    )
    def band(q: int, alias: str):
        return (
            F.max(
                F.when(
                    F.col("rn") == F.expr(f"(n * {q} + 99) div 100"),
                    F.col("vm"),
                )
            )
            .cast("long")
            .alias(alias)
        )

    return (
        v.groupBy("day")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            band(50, "p50_micro"),
            band(90, "p90_micro"),
            band(99, "p99_micro"),
            F.max("vm").cast("long").alias("max_micro"),
        )
        .orderBy("day")
    )


_SEQPAT_ORACLE = """
WITH ut AS (
  SELECT user_id, event_type,
         min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
  FROM events GROUP BY 1, 2
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_both,
       CAST(sum(CASE WHEN a.mn < b.mx THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ordered,
       CAST(sum(CASE WHEN a.mn < b.mx THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS ordered_ppm
FROM ut a JOIN ut b
  ON a.user_id = b.user_id AND a.event_type <> b.event_type
GROUP BY a.event_type, b.event_type
ORDER BY type_a, type_b
"""


@_register("sequential_pattern_support", _SEQPAT_ORACLE)
def sequential_pattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support (SPADE-style length-2 sequences):
    for every ordered event-type pair ⟨a → b⟩, how many users emit
    some `a` strictly before some `b` (first-a < last-b on epoch
    micros — the anywhere-in-history ordering that the ADJACENT-pair
    `event_transition_matrix` cannot see), as exact counts and ppm of
    users having both types. Asymmetry between ⟨a→b⟩ and ⟨b→a⟩ is the
    behavioral signal (funnels read it as direction). Scale shape: the
    raw stream collapses via one rollup to (user, type) — 5 rows per
    user — then a user-keyed self-join fans out at most |types|² rows
    per user before the final partial-aggregated rollup; no window, no
    global sort."""
    ut = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.min(F.unix_micros("ts")).alias("mn"),
            F.max(F.unix_micros("ts")).alias("mx"),
        )
        .localCheckpoint(eager=False)
    )
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_both"),
            F.sum(F.when(F.col("a.mn") < F.col("b.mx"), 1).otherwise(0))
            .cast("long")
            .alias("n_ordered"),
        )
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_ordered",
            F.expr("CAST(n_ordered * 1000000 div n_both AS BIGINT)").alias(
                "ordered_ppm"
            ),
        )
        .orderBy("type_a", "type_b")
    )


_MOM_ORACLE = """
WITH b AS (
  SELECT event_type,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':mom'), 1, 6)
              AS BIGINT) % 17 AS bucket,
         CAST(round(value * 1000000) AS BIGINT) AS vm
  FROM events
),
bs AS (
  SELECT event_type, bucket,
         CAST(sum(vm) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
  FROM b GROUP BY 1, 2
),
r AS (
  SELECT event_type, s // c AS mean_b,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY s // c, bucket) AS rn,
         count(*) OVER (PARTITION BY event_type) AS nb,
         s, c
  FROM bs
)
SELECT event_type,
       CAST(sum(c) AS BIGINT) AS n_events,
       CAST(max(nb) AS BIGINT) AS n_buckets,
       CAST(sum(s) // sum(c) AS BIGINT) AS mean_micro,
       CAST(max(CASE WHEN rn = (nb + 1) // 2 THEN mean_b END) AS BIGINT)
         AS mom_micro,
       CAST(max(CASE WHEN rn = (nb + 1) // 2 THEN mean_b END) - sum(s) // sum(c)
            AS BIGINT) AS mom_minus_mean_micro
FROM r
GROUP BY event_type
ORDER BY event_type
"""


@_register("median_of_means_estimate", _MOM_ORACLE)
def median_of_means_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means robust location estimator per event type: rows
    are md5-assigned to 17 deterministic buckets, bucket means (floor,
    exact micro ints) are computed as mergeable partials, and the
    estimate is the MEDIAN bucket mean — the sub-Gaussian-deviation
    estimator that survives heavy tails and a few corrupted buckets
    where the plain mean does not, and THE robust-mean shape that
    scales (each bucket mean is one partial aggregate; only 17 numbers
    meet the median). On uniform synthetic values MoM ≈ mean — the
    deviation column is the A/A readout. Scale shape: one
    partial-aggregated shuffle to (type, bucket); the median is an
    order statistic on the 17-row-per-type frame."""
    bs = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(
                "CAST(conv(substr(md5(concat(CAST(event_id AS STRING),"
                " ':mom')), 1, 6), 16, 10) AS BIGINT) % 17"
            ).alias("bucket"),
            F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vm"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum("vm").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
    )
    pw = W.partitionBy("event_type")
    r = bs.select(
        "event_type",
        "s",
        "c",
        F.expr("s div c").alias("mean_b"),
        F.row_number()
        .over(pw.orderBy(F.expr("s div c"), "bucket"))
        .alias("rn"),
        F.count(F.lit(1))
        .over(pw.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("nb"),
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.max("nb").cast("long").alias("n_buckets"),
            F.expr("CAST(sum(s) div sum(c) AS BIGINT)").alias("mean_micro"),
            F.max(
                F.when(F.col("rn") == F.expr("(nb + 1) div 2"), F.col("mean_b"))
            )
            .cast("long")
            .alias("mom_micro"),
        )
        .select(
            "event_type",
            "n_events",
            "n_buckets",
            "mean_micro",
            "mom_micro",
            (F.col("mom_micro") - F.col("mean_micro"))
            .cast("long")
            .alias("mom_minus_mean_micro"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# Chained-stateful streaming / calibration / feature-engineering wave
# ===========================================================================

_CHAINED_DEDUP_WINDOW_ORACLE = """
WITH parts AS (SELECT unnest(range(0, 4)) AS p),
ks AS (SELECT unnest(range(0, 75)) AS k),
recs AS (
  SELECT TIMESTAMP '2024-01-01 00:00:00'
           + INTERVAL ((2 * k) // 60) HOUR              AS window_start,
         (p * 31 + 2 * k * 17) % 1000                   AS amt
  FROM parts, ks
)
SELECT window_start,
       CAST(count(*) AS BIGINT)  AS n_keys,
       CAST(sum(amt) AS BIGINT)  AS total_cents
FROM recs
WHERE window_start + INTERVAL 1 HOUR
      <= TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 138 MINUTE
GROUP BY window_start
ORDER BY window_start
"""


@_register("streaming_chained_dedup_window", _CHAINED_DEDUP_WINDOW_ORACLE)
def streaming_chained_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO stateful operators chained in ONE streaming query —
    dropDuplicatesWithinWatermark feeding a tumbling-window aggregate —
    the at-least-once-upstream → exactly-once-analytics pipeline
    (Kafka producers retry, so every real stream carries duplicates;
    deduping in the same query as the window avoids a second topic).
    The offset_log source emits every logical key TWICE (offsets 2k
    and 2k+1 collapse to key k with identical event time and payload,
    so whichever copy the dedup state keeps, downstream is
    bit-identical); the watermark propagates through the dedup into
    the window operator, and append mode emits exactly the
    watermark-closed windows: max event time 2:28 − 10 min delay
    ⇒ windows [0,1h) and [1h,2h) flush, the 2-hour window stays open
    and is withheld — the oracle encodes that closure rule. Scale
    shape: both operators shard state by key/window across shuffle
    partitions; dedup state is bounded BY the watermark (the only
    dedup that survives an unbounded stream)."""
    import uuid

    from nyc_taxi_data_pipeline_spark.sources.pydatasource import (
        register_offset_log,
    )
    from nyc_taxi_data_pipeline_spark.streaming.sinks import run_stream_to_memory

    register_offset_log(spark)
    stream = (
        spark.readStream.format("offset_log")
        .option("partitions", 4)
        .option("n_rows", 150)
        .option("rows_per_batch", 75)
        .load()
    )
    keyed = stream.select(
        F.expr(
            "concat(CAST(partition AS STRING), ':',"
            " CAST(offset div 2 AS STRING))"
        ).alias("rec_key"),
        F.expr(
            "ts - make_interval(0, 0, 0, 0, 0, CAST(offset % 2 AS INT), 0)"
        ).alias("ev_ts"),
        F.expr("pmod(amount_cents - 17 * (offset % 2), 1000)").alias("amt"),
    )
    deduped = keyed.withWatermark("ev_ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["rec_key"]
    )
    agg = (
        deduped.groupBy(F.window("ev_ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("amt").cast("long").alias("total_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "n_keys", "total_cents")
    )
    sink = run_stream_to_memory(
        agg, f"cdw_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    return sink.orderBy("window_start")


_ISOTONIC_ORACLE = """
WITH scored AS (
  SELECT least(9, greatest(0,
           (CAST(round(value * 100) AS BIGINT) * 4
            + CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':iso'),
                                  1, 6) AS BIGINT) % 100000) // 30000))
           AS bin,
         CASE WHEN value > 350 THEN 1 ELSE 0 END AS y
  FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
  FROM scored GROUP BY bin
),
pre AS (
  SELECT bin, n, s,
         sum(n) OVER (ORDER BY bin) AS cn,
         sum(s) OVER (ORDER BY bin) AS cs
  FROM b
),
trip AS (
  SELECT i.bin AS bin, i.n AS n, i.s AS s, j.bin AS j, k.bin AS k,
         (k.cs - j.cs + j.s) * 1000000 // (k.cn - j.cn + j.n) AS avg_ppm
  FROM pre i
  JOIN pre j ON j.bin <= i.bin
  JOIN pre k ON k.bin >= i.bin
),
mn AS (
  SELECT bin, n, s, j, min(avg_ppm) AS m FROM trip GROUP BY bin, n, s, j
)
SELECT bin,
       n AS n_events,
       CAST(s * 1000000 // n AS BIGINT) AS raw_rate_ppm,
       CAST(max(m) AS BIGINT)           AS iso_rate_ppm
FROM mn
GROUP BY bin, n, s
ORDER BY bin
"""


@_register("isotonic_calibration_pava", _ISOTONIC_ORACLE)
def isotonic_calibration_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression (PAVA) calibration of a noisy score: a
    10-bin score (value plus deterministic md5 noise, so raw bin
    positive-rates are NON-monotone) is fit to the best monotone
    nondecreasing rates via the minimax closed form
    iso(i) = max_{j≤i} min_{k≥i} rate(j..k) — pool-adjacent-violators
    without the sequential pooling loop, so the fit distributes AND
    carries a full value oracle (rates on the exact ppm lattice;
    max-min of ANY values is monotone in i by the nesting of the j/k
    sets, so monotonicity is structural, not asserted). This is THE
    post-hoc calibrator applied to quality/classifier scores before
    thresholding — `calibration_reliability_bins` measures the
    miscalibration, this entry repairs it. Scale shape: one rollup
    shuffle to the 10-bin frame; prefix sums and the j×i×k triple
    join live entirely on that bounded frame."""
    scored = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.expr(
                "least(9, greatest(0, (CAST(round(value * 100) AS BIGINT) * 4"
                " + CAST(conv(substr(md5(concat(CAST(event_id AS STRING),"
                " ':iso')), 1, 6), 16, 10) AS BIGINT) % 100000)"
                " div 30000))"
            ).alias("bin"),
            F.when(F.col("value") > 350, 1).otherwise(0).alias("y"),
        )
    )
    b = scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    pre = b.select(
        "bin",
        "n",
        "s",
        F.sum("n").over(W.orderBy("bin")).alias("cn"),
        F.sum("s").over(W.orderBy("bin")).alias("cs"),
    ).localCheckpoint(eager=False)
    i = pre.alias("i")
    j = pre.alias("j")
    k = pre.alias("k")
    trip = (
        i.join(j, F.col("j.bin") <= F.col("i.bin"))
        .join(k, F.col("k.bin") >= F.col("i.bin"))
        .select(
            F.col("i.bin").alias("bin"),
            F.col("i.n").alias("n"),
            F.col("i.s").alias("s"),
            F.col("j.bin").alias("jb"),
            F.expr(
                "(k.cs - j.cs + j.s) * 1000000 div (k.cn - j.cn + j.n)"
            ).alias("avg_ppm"),
        )
    )
    mn = trip.groupBy("bin", "n", "s", "jb").agg(F.min("avg_ppm").alias("m"))
    return (
        mn.groupBy("bin", "n", "s")
        .agg(F.max("m").cast("long").alias("iso_rate_ppm"))
        .select(
            "bin",
            F.col("n").alias("n_events"),
            F.expr("CAST(s * 1000000 div n AS BIGINT)").alias("raw_rate_ppm"),
            "iso_rate_ppm",
        )
        .orderBy("bin")
    )


_TARGET_ENC_ORACLE = """
WITH f AS (
  SELECT event_type,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':fold'), 1, 6)
              AS BIGINT) % 5 AS fold,
         CAST(round(value * 1000000) AS BIGINT) AS vm
  FROM events
),
cf AS (
  SELECT event_type, fold,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(vm) AS BIGINT) AS s
  FROM f GROUP BY 1, 2
),
w AS (
  SELECT event_type, fold, n, s,
         sum(n) OVER (PARTITION BY event_type) AS cat_n,
         sum(s) OVER (PARTITION BY event_type) AS cat_s,
         sum(n) OVER () AS tot_n,
         sum(s) OVER () AS tot_s
  FROM cf
)
SELECT event_type, fold,
       CAST(n AS BIGINT) AS n_rows,
       CAST((cat_s - s) // (cat_n - n) AS BIGINT) AS enc_loo_micro,
       CAST((cat_s - s + 100 * (tot_s // tot_n))
            // (cat_n - n + 100) AS BIGINT)       AS enc_smoothed_micro,
       CAST(cat_s // cat_n AS BIGINT)             AS enc_full_micro
FROM w
ORDER BY event_type, fold
"""


@_register("target_encoding_loo_folds", _TARGET_ENC_ORACLE)
def target_encoding_loo_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-controlled target encoding — the feature-engineering
    staple for high-cardinality categoricals: each (category, fold)
    cell is encoded with the category's mean target computed WITHOUT
    that fold's rows ((Σcat − Σfold)/(Ncat − Nfold), exact micro
    ints), so no row ever sees its own target — plus the
    m-estimate-smoothed variant (m=100 pseudo-observations of the
    global prior) that tames rare categories. The full-data encoding
    rides along to expose the leakage gap. Folds are md5-deterministic
    (rerun- and engine-stable, same discipline as
    `train_val_test_split`). Scale shape: one partial-aggregated
    shuffle to (category, fold); all encodings are window algebra on
    that bounded frame — the raw table is never re-scanned per fold."""
    f = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(event_id AS STRING),"
            " ':fold')), 1, 6), 16, 10) AS BIGINT) % 5"
        ).alias("fold"),
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vm"),
    )
    cf = f.groupBy("event_type", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vm").cast("long").alias("s"),
    )
    cat = W.partitionBy("event_type")
    alln = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w = cf.select(
        "event_type",
        "fold",
        "n",
        "s",
        F.sum("n").over(cat).alias("cat_n"),
        F.sum("s").over(cat).alias("cat_s"),
        F.sum("n").over(alln).alias("tot_n"),
        F.sum("s").over(alln).alias("tot_s"),
    )
    return w.select(
        "event_type",
        "fold",
        F.col("n").cast("long").alias("n_rows"),
        F.expr("CAST((cat_s - s) div (cat_n - n) AS BIGINT)").alias(
            "enc_loo_micro"
        ),
        F.expr(
            "CAST((cat_s - s + 100 * (tot_s div tot_n))"
            " div (cat_n - n + 100) AS BIGINT)"
        ).alias("enc_smoothed_micro"),
        F.expr("CAST(cat_s div cat_n AS BIGINT)").alias("enc_full_micro"),
    ).orderBy("event_type", "fold")


_BROWN_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, day, x,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k
  FROM daily
),
s1 AS (
  SELECT a.event_type, a.day, a.k, a.x,
         CAST(1000 * sum((1 << (15 - (a.k - b.k))) * b.x)
              // sum(1 << (15 - (a.k - b.k))) AS BIGINT) AS s1_milli
  FROM r a JOIN r b
    ON a.event_type = b.event_type AND b.k BETWEEN a.k - 15 AND a.k
  GROUP BY a.event_type, a.day, a.k, a.x
),
s2 AS (
  SELECT a.event_type, a.day, a.k, a.x, a.s1_milli,
         CAST(sum((1 << (15 - (a.k - b.k))) * b.s1_milli)
              // sum(1 << (15 - (a.k - b.k))) AS BIGINT) AS s2_milli
  FROM s1 a JOIN s1 b
    ON a.event_type = b.event_type AND b.k BETWEEN a.k - 15 AND a.k
  GROUP BY a.event_type, a.day, a.k, a.x, a.s1_milli
)
SELECT a.event_type AS event_type, a.day AS day,
       CAST(a.x AS BIGINT) AS n_events,
       a.s1_milli, a.s2_milli,
       CAST(3 * a.s1_milli - 2 * a.s2_milli AS BIGINT) AS forecast_next_milli,
       CAST(n.x AS BIGINT) AS actual_next,
       CAST(abs(3 * a.s1_milli - 2 * a.s2_milli - 1000 * n.x) AS BIGINT)
         AS abs_err_milli
FROM s2 a JOIN r n
  ON n.event_type = a.event_type AND n.k = a.k + 1
ORDER BY event_type, day
"""


@_register("brown_double_smoothing_forecast", _BROWN_ORACLE)
def brown_double_smoothing_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing (Holt-equivalent at α=1/2):
    S'' = EWMA(S') composes the integer EWMA of
    `ewma_daily_event_counts` with itself on the milli lattice, giving
    level 2S'−S'' and trend S'−S'', hence the one-step-ahead forecast
    3S'−2S'' — the trend-aware step past the seasonal-naive baseline
    that `seasonal_naive_forecast_eval` scores, still in EXACT integer
    arithmetic (no smoothing-state recursion: both passes use the
    closed 2^(15−k) windowed form). Each day's forecast is joined to
    the NEXT day's actual, so the per-day absolute error — the
    backtest — value-checks too. Scale shape: the stream collapses
    once to (type, day); both smoothing passes are 16-wide banded
    self-joins on that calendar-bounded frame."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    r = daily.select(
        "event_type",
        "day",
        "x",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("day"))
        .alias("k"),
    ).localCheckpoint(eager=False)
    s1 = (
        r.alias("a")
        .join(
            r.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.k") >= F.col("a.k") - 15)
            & (F.col("b.k") <= F.col("a.k")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("day"),
            F.col("a.k").alias("k"),
            F.col("a.x").alias("x"),
        )
        .agg(
            F.expr(
                "CAST(1000 * sum(shiftleft(1, 15 - (a.k - b.k)) * b.x)"
                " div sum(shiftleft(1, 15 - (a.k - b.k))) AS BIGINT)"
            ).alias("s1_milli")
        )
        .localCheckpoint(eager=False)
    )
    s2 = (
        s1.alias("a")
        .join(
            s1.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.k") >= F.col("a.k") - 15)
            & (F.col("b.k") <= F.col("a.k")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("day"),
            F.col("a.k").alias("k"),
            F.col("a.x").alias("x"),
            F.col("a.s1_milli").alias("s1_milli"),
        )
        .agg(
            F.expr(
                "CAST(sum(shiftleft(1, 15 - (a.k - b.k)) * b.s1_milli)"
                " div sum(shiftleft(1, 15 - (a.k - b.k))) AS BIGINT)"
            ).alias("s2_milli")
        )
    )
    nxt = r.select(
        F.col("event_type").alias("n_et"),
        F.col("k").alias("n_k"),
        F.col("x").alias("actual_next"),
    )
    return (
        s2.join(
            nxt,
            (F.col("event_type") == F.col("n_et"))
            & (F.col("n_k") == F.col("k") + 1),
        )
        .select(
            "event_type",
            "day",
            F.col("x").cast("long").alias("n_events"),
            "s1_milli",
            "s2_milli",
            F.expr("CAST(3 * s1_milli - 2 * s2_milli AS BIGINT)").alias(
                "forecast_next_milli"
            ),
            F.col("actual_next").cast("long").alias("actual_next"),
            F.expr(
                "CAST(abs(3 * s1_milli - 2 * s2_milli - 1000 * actual_next)"
                " AS BIGINT)"
            ).alias("abs_err_milli"),
        )
        .orderBy("event_type", "day")
    )


_REBALANCE_ORACLE = """
WITH d AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':rebal'), doc_id
         ) AS rk
  FROM documents
),
mn AS (SELECT min(c) AS n_min FROM (SELECT count(*) AS c FROM d GROUP BY lang))
SELECT lang,
       CAST(count(*) AS BIGINT)                            AS n_before,
       CAST(sum(CASE WHEN rk <= mn.n_min THEN 1 ELSE 0 END) AS BIGINT)
                                                           AS n_after,
       CAST(sum(CASE WHEN rk <= mn.n_min THEN doc_id ELSE 0 END) AS BIGINT)
                                                           AS kept_id_sum
FROM d, mn
GROUP BY lang
ORDER BY lang
"""


@_register("class_rebalance_undersample", _REBALANCE_ORACLE)
def class_rebalance_undersample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic majority-class undersampling: every language
    class is cut to the MINORITY class's size by keeping each class's
    top-n_min rows under the md5(doc_id) order — a pure function of
    the data, so the rebalanced training set is rerun- and
    engine-reproducible (the class-imbalance preprocessing step before
    classifier training, with the same determinism discipline as
    `train_val_test_split`). The kept-row doc_id sum fingerprints the
    EXACT selection, not just its size. Scale shape: one hash shuffle
    to (class) for the per-class rank window — classes rank in
    parallel — and the 1-row minority count broadcasts."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.row_number()
        .over(
            W.partitionBy("lang").orderBy(
                F.md5(F.expr("concat(CAST(doc_id AS STRING), ':rebal')")),
                "doc_id",
            )
        )
        .alias("rk"),
    )
    mn = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .agg(F.min("count").alias("n_min"))
    )
    return (
        d.crossJoin(F.broadcast(mn))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_before"),
            F.sum(F.when(F.col("rk") <= F.col("n_min"), 1).otherwise(0))
            .cast("long")
            .alias("n_after"),
            F.sum(
                F.when(F.col("rk") <= F.col("n_min"), F.col("doc_id")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("kept_id_sum"),
        )
        .orderBy("lang")
    )


# ===========================================================================
# Data-contract / corpus-stats / encoding / off-policy-eval wave
# ===========================================================================

_FD_AUDIT_ORACLE = """
WITH fd1 AS (
  SELECT 'lineitem: (orderkey,linenumber) -> suppkey' AS fd,
         CAST(count(*) AS BIGINT) AS n_lhs,
         CAST(sum(CASE WHEN cd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
  FROM (SELECT count(DISTINCT l_suppkey) AS cd
        FROM lineitem GROUP BY l_orderkey, l_linenumber)
),
fd2 AS (
  SELECT 'lineitem: partkey -> suppkey' AS fd,
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN cd > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT count(DISTINCT l_suppkey) AS cd
        FROM lineitem GROUP BY l_partkey)
),
fd3 AS (
  SELECT 'orders: custkey -> orderpriority' AS fd,
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN cd > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT count(DISTINCT o_orderpriority) AS cd
        FROM orders GROUP BY o_custkey)
),
fd4 AS (
  SELECT 'events: user -> event_type' AS fd,
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN cd > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT count(DISTINCT event_type) AS cd
        FROM events GROUP BY user_id)
),
fd5 AS (
  SELECT 'customer: (nation,segment) -> mktsegment band' AS fd,
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN cd > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT count(DISTINCT c_mktsegment) AS cd
        FROM customer GROUP BY c_nationkey, c_mktsegment)
),
fd6 AS (
  SELECT 'orders: orderkey -> custkey' AS fd,
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN cd > 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT count(DISTINCT o_custkey) AS cd
        FROM orders GROUP BY o_orderkey)
),
u AS (
  SELECT * FROM fd1 UNION ALL SELECT * FROM fd2 UNION ALL
  SELECT * FROM fd3 UNION ALL SELECT * FROM fd4 UNION ALL
  SELECT * FROM fd5 UNION ALL SELECT * FROM fd6
)
SELECT fd, n_lhs, n_violating,
       CAST(n_violating * 1000000 // n_lhs AS BIGINT) AS violation_ppm,
       CAST(CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
FROM u
ORDER BY fd
"""


@_register("functional_dependency_audit", _FD_AUDIT_ORACLE)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery/validation — the data-contract
    audit behind key inference, normalization checks, and dedup-key
    selection: for each candidate FD `LHS → RHS`, count LHS groups
    whose RHS is not single-valued. The panel mixes FDs that HOLD
    (orders' primary key determines its customer; a tautological
    reflexive check as the control) with many-to-many VIOLATIONS —
    and it caught a real one: the synthetic lake does NOT honor
    TPC-H's (orderkey, linenumber) composite key (23% of pairs carry
    multiple suppliers at every sf), exactly the silent contract break
    this audit exists to surface before someone dedups or MERGEs on
    the assumed key. Scale shape: each FD is one partial-aggregated
    groupBy(LHS) + countDistinct(RHS) collapsing to a 1-row frame; the
    union is six tiny frames — no FD ever joins the base tables."""

    def fd(name: str, df: DataFrame, lhs: list, rhs: str) -> DataFrame:
        return (
            df.groupBy(*lhs)
            .agg(F.countDistinct(rhs).alias("cd"))
            .agg(
                F.lit(name).alias("fd"),
                F.count(F.lit(1)).cast("long").alias("n_lhs"),
                F.sum(F.when(F.col("cd") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
            )
        )

    li = _t(spark, sf_dir, "lineitem")
    u = (
        fd(
            "lineitem: (orderkey,linenumber) -> suppkey",
            li,
            ["l_orderkey", "l_linenumber"],
            "l_suppkey",
        )
        .unionAll(
            fd("lineitem: partkey -> suppkey", li, ["l_partkey"], "l_suppkey")
        )
        .unionAll(
            fd(
                "orders: custkey -> orderpriority",
                _t(spark, sf_dir, "orders"),
                ["o_custkey"],
                "o_orderpriority",
            )
        )
        .unionAll(
            fd(
                "events: user -> event_type",
                _t(spark, sf_dir, "events"),
                ["user_id"],
                "event_type",
            )
        )
        .unionAll(
            fd(
                "customer: (nation,segment) -> mktsegment band",
                _t(spark, sf_dir, "customer"),
                ["c_nationkey", "c_mktsegment"],
                "c_mktsegment",
            )
        )
        .unionAll(
            fd(
                "orders: orderkey -> custkey",
                _t(spark, sf_dir, "orders"),
                ["o_orderkey"],
                "o_custkey",
            )
        )
    )
    return u.select(
        "fd",
        "n_lhs",
        "n_violating",
        F.expr("CAST(n_violating * 1000000 div n_lhs AS BIGINT)").alias(
            "violation_ppm"
        ),
        F.expr(
            "CAST(CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("holds"),
    ).orderBy("fd")


_LEXRICH_ORACLE = """
WITH st AS (
  SELECT source, tok.t AS tok, CAST(count(*) AS BIGINT) AS c
  FROM documents, LATERAL (
    SELECT unnest(string_split(text, ' ')) AS t
  ) tok
  WHERE text IS NOT NULL
  GROUP BY source, tok.t
)
SELECT source,
       CAST(sum(c) AS BIGINT)   AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(count(*) * 1000000 // sum(c) AS BIGINT) AS ttr_ppm,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_types,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS hapax_ppm
FROM st
GROUP BY source
ORDER BY source
"""


@_register("lexical_richness_audit", _LEXRICH_ORACLE)
def lexical_richness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical richness per source: type-token ratio and hapax-legomena
    share (types seen exactly once WITHIN the source) in exact ppm —
    the corpus screens that catch template-generated or looping text
    (TTR collapses) and OCR/noise contamination (hapax share spikes)
    before either poisons a training mix; complements
    `shannon_fano_code_length`'s redundancy angle with a type-level
    one. Scale shape: one partial-aggregated rollup to (source, token);
    both statistics are a second aggregate on that vocabulary-bounded
    frame."""
    st = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        st.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.expr(
                "CAST(count(*) * 1000000 div sum(c) AS BIGINT)"
            ).alias("ttr_ppm"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax_types"),
            F.expr(
                "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000"
                " div count(*) AS BIGINT)"
            ).alias("hapax_ppm"),
        )
        .orderBy("source")
    )


_RLE_ORACLE = """
WITH v AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CASE WHEN lag(event_type) OVER (PARTITION BY CAST(ts AS DATE)
                                         ORDER BY ts, event_id)
                   IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS run_start
  FROM events
)
SELECT day,
       CAST(count(*) AS BIGINT)                 AS n_values,
       CAST(sum(run_start) AS BIGINT)           AS n_runs_ts_order,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_runs_if_sorted,
       CAST(1000 * count(*) // sum(run_start) AS BIGINT)
                                                AS avg_run_len_milli,
       CAST(sum(run_start) * 1000000 // count(*) AS BIGINT)
                                                AS rle_ratio_ppm
FROM v
GROUP BY day
ORDER BY day
"""


@_register("rle_compression_audit", _RLE_ORACLE)
def rle_compression_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length-encoding layout audit — the encoding-choice question
    columnar writers (parquet RLE_DICTIONARY) answer per column chunk:
    within each day partition, how many runs does `event_type` form
    under the natural (ts, event_id) write order vs the n_distinct
    floor a sort-by-value rewrite would reach? Arrival-ordered
    categorical columns RLE terribly (runs ≈ rows — this corpus's
    readout) and that measured gap is the case for
    `zorder_layout_audit`/sort-on-write data layout; ratios in exact
    ppm/milli. Scale shape: ONE hash exchange to (day) serves the lag
    window and the final aggregate; days audit in parallel — the
    per-file locality question never needs a global sort."""
    pw = W.partitionBy("day").orderBy("ts", "event_id")
    v = (
        _t(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"), "event_type", "ts", "event_id"
        )
        .select(
            "day",
            "event_type",
            F.when(
                ~F.lag("event_type").over(pw).eqNullSafe(F.col("event_type")),
                1,
            )
            .otherwise(0)
            .alias("run_start"),
        )
    )
    return (
        v.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.sum("run_start").cast("long").alias("n_runs_ts_order"),
            F.countDistinct("event_type").cast("long").alias(
                "n_runs_if_sorted"
            ),
            F.expr(
                "CAST(1000 * count(*) div sum(run_start) AS BIGINT)"
            ).alias("avg_run_len_milli"),
            F.expr(
                "CAST(sum(run_start) * 1000000 div count(*) AS BIGINT)"
            ).alias("rle_ratio_ppm"),
        )
        .orderBy("day")
    )


_REPLAY_ORACLE = """
WITH h1 AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events WHERE day(ts) <= 15 GROUP BY 1, 2
),
pol AS (
  SELECT user_id, event_type AS arm
  FROM (SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY c DESC, event_type) AS rn
        FROM h1)
  WHERE rn = 1
),
gtop AS (
  SELECT event_type AS garm
  FROM h1 GROUP BY event_type
  ORDER BY sum(c) DESC, event_type LIMIT 1
),
h2 AS (
  SELECT e.user_id, e.event_type,
         CAST(round(e.value * 1000000) AS BIGINT) AS vm,
         coalesce(p.arm, (SELECT garm FROM gtop)) AS arm
  FROM events e LEFT JOIN pol p ON e.user_id = p.user_id
  WHERE day(e.ts) > 15
),
base AS (
  SELECT CAST(sum(vm) // count(*) AS BIGINT) AS overall_avg_micro FROM h2
)
SELECT h2.arm AS arm,
       CAST(count(*) AS BIGINT) AS n_logged,
       CAST(sum(CASE WHEN event_type = arm THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched,
       CAST(sum(CASE WHEN event_type = arm THEN vm END)
            // greatest(sum(CASE WHEN event_type = arm THEN 1 ELSE 0 END), 1)
            AS BIGINT) AS matched_avg_micro,
       base.overall_avg_micro,
       CAST(sum(CASE WHEN event_type = arm THEN vm END)
            // greatest(sum(CASE WHEN event_type = arm THEN 1 ELSE 0 END), 1)
            - base.overall_avg_micro AS BIGINT) AS lift_micro
FROM h2, base
GROUP BY h2.arm, base.overall_avg_micro
ORDER BY arm
"""


@_register("bandit_replay_evaluation", _REPLAY_ORACLE)
def bandit_replay_evaluation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy REPLAY evaluation (Li et al.'s unbiased estimator for
    uniformly-logged bandit data): a per-user policy is trained on the
    first half-month (each user's modal event type, deterministic
    tie-break; cold-start users back off to the global top arm), then
    evaluated WITHOUT deployment by replaying second-half logs —
    only logged events whose action matches the policy's choice count,
    and their mean reward (exact micro ints) against the
    all-traffic baseline is the estimated lift. This answers
    'would this recommender beat what we do now?' from logs alone —
    the evaluation step between `itemitem_collaborative_topk` and an
    A/B test. Scale shape: train is one rollup + per-user argmax
    window; scoring joins policy to logs on user hash keys; the final
    readout is one partial-aggregated rollup per arm with the 1-row
    baseline broadcast."""
    ev = _t(spark, sf_dir, "events")
    h1 = (
        ev.filter(F.dayofmonth("ts") <= 15)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    pol = (
        h1.select(
            "user_id",
            "event_type",
            F.row_number()
            .over(
                W.partitionBy("user_id").orderBy(
                    F.col("c").desc(), "event_type"
                )
            )
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("arm"))
    )
    gtop = (
        h1.groupBy("event_type")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.col("tc").desc(), "event_type")
        .limit(1)
        .select(F.col("event_type").alias("garm"))
    )
    h2 = (
        ev.filter(F.dayofmonth("ts") > 15)
        .select(
            "user_id",
            "event_type",
            F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vm"),
        )
        .join(pol, "user_id", "left")
        .crossJoin(F.broadcast(gtop))
        .select(
            "event_type",
            "vm",
            F.coalesce("arm", "garm").alias("arm"),
        )
        .localCheckpoint(eager=False)
    )
    base = h2.agg(
        F.expr("CAST(sum(vm) div count(*) AS BIGINT)").alias(
            "overall_avg_micro"
        )
    )
    m_avg = (
        "sum(CASE WHEN event_type = arm THEN vm END)"
        " div greatest(sum(CASE WHEN event_type = arm THEN 1 ELSE 0 END), 1)"
    )
    return (
        h2.crossJoin(F.broadcast(base))
        .groupBy("arm", "overall_avg_micro")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_logged"),
            F.sum(F.when(F.col("event_type") == F.col("arm"), 1).otherwise(0))
            .cast("long")
            .alias("n_matched"),
            F.expr(f"CAST({m_avg} AS BIGINT)").alias("matched_avg_micro"),
            F.expr(
                f"CAST({m_avg} - max(overall_avg_micro) AS BIGINT)"
            ).alias("lift_micro"),
        )
        .select(
            "arm",
            "n_logged",
            "n_matched",
            "matched_avg_micro",
            "overall_avg_micro",
            "lift_micro",
        )
        .orderBy("arm")
    )


_DOW_ORACLE = """
WITH d AS (
  SELECT event_type, dayname(ts) AS dow, CAST(ts AS DATE) AS day
  FROM events
),
cal AS (
  SELECT dow, CAST(count(DISTINCT day) AS BIGINT) AS n_days
  FROM (SELECT DISTINCT dayname(ts) AS dow, CAST(ts AS DATE) AS day
        FROM events)
  GROUP BY dow
),
c AS (
  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n
  FROM d GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS t FROM c GROUP BY 1
),
ndays AS (SELECT CAST(sum(n_days) AS BIGINT) AS total_days FROM cal)
SELECT c.event_type AS event_type, c.dow AS dow, c.n AS n_events,
       CAST(c.n * nd.total_days * 1000000 // (cal.n_days * t.t) AS BIGINT)
         AS seasonality_index_ppm
FROM c JOIN cal ON c.dow = cal.dow
JOIN tot t ON c.event_type = t.event_type
CROSS JOIN ndays nd
ORDER BY event_type, dow
"""


@_register("dow_seasonality_profile", _DOW_ORACLE)
def dow_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: (mean events on
    this weekday) / (mean events per day overall) in exact ppm —
    computed as n·total_days·10⁶ div (days_of_this_dow·total), which
    correctly handles months where weekdays occur 4 vs 5 times (a raw
    day-of-week share would bias toward the 5-occurrence days). The
    index is the input to weekday-aware staffing/alert baselines and
    the seasonal-naive forecaster's period choice. Weekday KEYS are
    locale-stable day NAMES (Spark date_format 'EEEE' == DuckDB
    dayname — the 1-7-Sunday vs 0-6 numbering trap from the verify
    notes never surfaces). Scale shape: one rollup shuffle to
    (type, dow); the weekday calendar and per-type totals are
    broadcast-tiny."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "EEEE").alias("dow"),
        F.to_date("ts").alias("day"),
    ).localCheckpoint(eager=False)
    cal = (
        ev.select("dow", "day")
        .distinct()
        .groupBy("dow")
        .agg(F.countDistinct("day").cast("long").alias("n_days"))
    )
    c = ev.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = c.groupBy("event_type").agg(F.sum("n").cast("long").alias("t"))
    ndays = cal.agg(F.sum("n_days").cast("long").alias("total_days"))
    return (
        c.join(F.broadcast(cal), "dow")
        .join(F.broadcast(tot), "event_type")
        .crossJoin(F.broadcast(ndays))
        .select(
            "event_type",
            "dow",
            F.col("n").alias("n_events"),
            F.expr(
                "CAST(n * total_days * 1000000 div (n_days * t) AS BIGINT)"
            ).alias("seasonality_index_ppm"),
        )
        .orderBy("event_type", "dow")
    )


# ===========================================================================
# Experimentation-variance / training-pairs / graph-mixing / growth wave
# ===========================================================================

_CUPED_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN day(ts) <= 15 THEN round(value) ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN day(ts) > 15 THEN round(value) ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM u
),
d AS (
  SELECT n, sx, sy,
         n * sxy - sx * sy AS cov_n,
         n * sxx - sx * sx AS vx_n,
         n * syy - sy * sy AS vy_n
  FROM m
)
SELECT n AS n_users,
       CAST(sx // n AS BIGINT) AS pre_mean_dollars,
       CAST(sy // n AS BIGINT) AS post_mean_dollars,
       CAST(1000 * cov_n // vx_n AS BIGINT) AS theta_milli,
       CAST(CAST(cov_n AS HUGEINT) * cov_n * 1000000
            // (CAST(vx_n AS HUGEINT) * vy_n) AS BIGINT)
         AS variance_reduction_ppm
FROM d
"""


@_register("cuped_variance_reduction", _CUPED_ORACLE)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment variance reduction using
    pre-experiment data) — the technique every large A/B platform runs
    to shrink confidence intervals without more traffic: regress each
    user's post-period metric on their pre-period metric,
    θ = cov(x,y)/var(x), and the achievable variance reduction at the
    optimal θ is exactly ρ² — reported here in EXACT ppm.
    ρ²·10⁶ = cov²·10⁶/(varx·vary) needs int128 products, and Spark's
    DECIMAL `div` wraps — so the quotient comes from a double-seeded
    floor with ±1 exact-DECIMAL-compare correction (the division
    analog of `neyman_allocation_plan`'s isqrt correction): the double
    gets within 1 of truth, the integer comparison lands it exactly,
    and the DuckDB oracle runs plain HUGEINT division against it.
    Scale shape: one rollup to (user), one mergeable 6-moment
    aggregate; everything else is 1-row algebra."""
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN day(ts) <= 15 THEN round(value)"
                " ELSE 0 END) AS BIGINT)"
            ).alias("x"),
            F.expr(
                "CAST(sum(CASE WHEN day(ts) > 15 THEN round(value)"
                " ELSE 0 END) AS BIGINT)"
            ).alias("y"),
        )
    )
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    d = m.select(
        "n",
        "sx",
        "sy",
        F.expr("n * sxy - sx * sy").alias("cov_n"),
        F.expr("n * sxx - sx * sx").alias("vx_n"),
        F.expr("n * syy - sy * sy").alias("vy_n"),
    )
    # Exact floor of (cov_n^2 * 1e6) / (vx_n * vy_n) in int128 territory:
    # DECIMAL(38,0) products (multiply is exact; only DECIMAL div wraps),
    # double-seeded quotient, then +/-1 correction by exact comparison.
    q = d.select(
        "n",
        "sx",
        "sy",
        "cov_n",
        "vx_n",
        F.expr(
            "CAST(cov_n AS DECIMAL(38,0)) * CAST(cov_n AS DECIMAL(38,0))"
            " * 1000000"
        ).alias("num"),
        F.expr(
            "CAST(vx_n AS DECIMAL(38,0)) * CAST(vy_n AS DECIMAL(38,0))"
        ).alias("den"),
    ).select(
        "n",
        "sx",
        "sy",
        "cov_n",
        "vx_n",
        "num",
        "den",
        F.expr(
            "CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"
            " AS DECIMAL(38,0))"
        ).alias("q0"),
    )
    return q.select(
        F.col("n").alias("n_users"),
        F.expr("CAST(sx div n AS BIGINT)").alias("pre_mean_dollars"),
        F.expr("CAST(sy div n AS BIGINT)").alias("post_mean_dollars"),
        F.expr("CAST(1000 * cov_n div vx_n AS BIGINT)").alias("theta_milli"),
        F.expr(
            "CAST(CASE WHEN (q0 + 1) * den <= num THEN q0 + 1"
            " WHEN q0 * den > num THEN q0 - 1"
            " ELSE q0 END AS BIGINT)"
        ).alias("variance_reduction_ppm"),
    )


_NEGSAMPLE_ORACLE = """
WITH pos AS (
  SELECT DISTINCT user_id, event_type FROM events
),
types AS (SELECT DISTINCT event_type FROM events),
users AS (SELECT DISTINCT user_id FROM events),
grid AS (
  SELECT u.user_id, t.event_type FROM users u CROSS JOIN types t
),
neg AS (
  SELECT g.user_id, g.event_type,
         row_number() OVER (
           PARTITION BY g.user_id
           ORDER BY md5(CAST(g.user_id AS VARCHAR) || ':'
                        || g.event_type || ':neg'), g.event_type
         ) AS rk
  FROM grid g
  WHERE NOT EXISTS (SELECT 1 FROM pos p
                    WHERE p.user_id = g.user_id
                      AND p.event_type = g.event_type)
),
agg_pos AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_pos_users FROM pos GROUP BY 1
),
agg_neg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_neg_sampled,
         CAST(sum(user_id) AS BIGINT) AS neg_user_id_sum
  FROM neg WHERE rk <= 2 GROUP BY 1
)
SELECT p.event_type AS event_type, p.n_pos_users,
       coalesce(n.n_neg_sampled, 0)  AS n_neg_sampled,
       coalesce(n.neg_user_id_sum, 0) AS neg_user_id_sum
FROM agg_pos p LEFT JOIN agg_neg n ON p.event_type = n.event_type
ORDER BY event_type
"""


@_register("negative_sampling_pairs", _NEGSAMPLE_ORACLE)
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for two-tower/embedding
    training: each user contributes up to 2 NEGATIVE (user, type)
    pairs — types the user never interacted with, chosen by md5 order
    so the training set is rerun- and engine-reproducible — with the
    anti-join guaranteeing no false negatives (a sampled negative that
    is secretly positive poisons contrastive training; here it is
    structurally impossible and the per-type user-id-sum fingerprints
    the exact selection). Scale shape: positives collapse to one
    distinct; the candidate grid is users × |type vocabulary| (bounded
    fanout, broadcast types), negatives are one anti join + per-user
    rank window — users sample in parallel."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    pos = ev.distinct().localCheckpoint(eager=False)
    types = pos.select("event_type").distinct()
    users = pos.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(types))
    neg = (
        grid.join(pos, ["user_id", "event_type"], "anti")
        .select(
            "user_id",
            "event_type",
            F.row_number()
            .over(
                W.partitionBy("user_id").orderBy(
                    F.md5(
                        F.expr(
                            "concat(CAST(user_id AS STRING), ':',"
                            " event_type, ':neg')"
                        )
                    ),
                    "event_type",
                )
            )
            .alias("rk"),
        )
        .filter(F.col("rk") <= 2)
    )
    agg_pos = pos.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pos_users")
    )
    agg_neg = neg.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_neg_sampled"),
        F.sum("user_id").cast("long").alias("neg_user_id_sum"),
    )
    return (
        agg_pos.join(agg_neg, "event_type", "left")
        .select(
            "event_type",
            "n_pos_users",
            F.coalesce("n_neg_sampled", F.lit(0)).cast("long").alias(
                "n_neg_sampled"
            ),
            F.coalesce("neg_user_id_sum", F.lit(0)).cast("long").alias(
                "neg_user_id_sum"
            ),
        )
        .orderBy("event_type")
    )


_ASSORT_ORACLE = """
WITH pairs AS (
  SELECT arr[g.i] AS u, arr[g.j] AS v
  FROM (SELECT list_sort(list(DISTINCT l_partkey)) AS arr
        FROM lineitem GROUP BY l_orderkey),
  LATERAL (
    SELECT a.i AS i, b.j AS j
    FROM (SELECT unnest(generate_series(1, len(arr))) AS i) a,
         (SELECT unnest(generate_series(1, len(arr))) AS j) b
    WHERE a.i < b.j
  ) g
),
und AS (SELECT u AS s, v AS t FROM pairs UNION ALL SELECT v, u FROM pairs),
deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY s),
ed AS (
  SELECT d1.d AS dx, d2.d AS dy
  FROM und JOIN deg d1 ON und.s = d1.node JOIN deg d2 ON und.t = d2.node
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS s1,
         CAST(sum(dx) AS BIGINT) AS sx,
         CAST(sum(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sxx,
         CAST(sum(CAST(dx AS HUGEINT) * dy) AS HUGEINT) AS sxy
  FROM ed
)
SELECT s1 AS n_directed_edges,
       CAST(sx // s1 AS BIGINT) AS mean_degree,
       CAST(1000 * (s1 * sxy - CAST(sx AS HUGEINT) * sx)
            // (s1 * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT)
         AS assortativity_milli
FROM m
"""


@_register("degree_assortativity", _ASSORT_ORACLE)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-purchase graph — Newman's r,
    the do-hubs-link-to-hubs mixing coefficient that predicts
    robustness and spreading behavior. Over the symmetric directed
    edge list the x/y marginals coincide, so r needs NO square root:
    r = (S1·Σxy − Sx²)/(S1·Σxx − Sx²) — and the int128-wide products
    ride DECIMAL(38,0) multiplies with the quotient recovered by the
    same double-seed + ±1 exact-compare floor as
    `cuped_variance_reduction` (sign-split so truncation matches both
    engines on negative r; multi-edges weight the mixing like repeated
    co-purchases should). Scale shape: pair expansion is the
    `link_prediction_common_neighbors` HOF explode (no fact self-join),
    degrees are one aggregate BROADCAST back onto both endpoints, and
    the moments are one mergeable pass — no sort anywhere."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("arr"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(arr, (x, i) ->"
                    " transform(slice(arr, i + 2, size(arr) - i - 1),"
                    " y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
    )
    und = pairs.select(F.col("u").alias("s"), F.col("v").alias("t")).unionAll(
        pairs.select(F.col("v").alias("s"), F.col("u").alias("t"))
    ).localCheckpoint(eager=False)
    deg = und.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    ).localCheckpoint(eager=False)
    ed = (
        und.join(
            F.broadcast(deg.select(F.col("node").alias("s"), F.col("d").alias("dx"))),
            "s",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("t"), F.col("d").alias("dy"))),
            "t",
        )
        .select("dx", "dy")
    )
    m = ed.agg(
        F.count(F.lit(1)).cast("long").alias("s1"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum(F.expr("CAST(dx AS DECIMAL(19,0)) * dx")).alias("sxx"),
        F.sum(F.expr("CAST(dx AS DECIMAL(19,0)) * dy")).alias("sxy"),
    )
    q = m.select(
        "s1",
        "sx",
        F.expr(
            "1000 * (CAST(s1 AS DECIMAL(38,0)) * sxy"
            " - CAST(sx AS DECIMAL(38,0)) * sx)"
        ).alias("num"),
        F.expr(
            "CAST(s1 AS DECIMAL(38,0)) * sxx"
            " - CAST(sx AS DECIMAL(38,0)) * sx"
        ).alias("den"),
    ).select(
        "s1",
        "sx",
        "num",
        "den",
        F.expr(
            "CAST(floor(abs(CAST(num AS DOUBLE)) / CAST(den AS DOUBLE))"
            " AS DECIMAL(38,0))"
        ).alias("q0"),
    )
    trunc = (
        "CASE WHEN (q0 + 1) * den <= abs(num) THEN q0 + 1"
        " WHEN q0 * den > abs(num) THEN q0 - 1 ELSE q0 END"
    )
    return q.select(
        F.col("s1").alias("n_directed_edges"),
        F.expr("CAST(sx div s1 AS BIGINT)").alias("mean_degree"),
        F.expr(
            f"CAST(CASE WHEN num >= 0 THEN ({trunc})"
            f" ELSE -({trunc}) END AS BIGINT)"
        ).alias("assortativity_milli"),
    )


_GROWTH_ORACLE = """
WITH ua AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // (7 * 86400000000) AS w
  FROM events
),
fw AS (SELECT user_id, min(w) AS first_w FROM ua GROUP BY 1),
cur AS (SELECT user_id, w FROM ua),
prv AS (SELECT user_id, w + 1 AS w FROM ua),
j AS (
  SELECT coalesce(c.user_id, p.user_id) AS user_id,
         coalesce(c.w, p.w) AS w,
         (c.user_id IS NOT NULL) AS is_cur,
         (p.user_id IS NOT NULL) AS is_prv
  FROM cur c FULL OUTER JOIN prv p
    ON c.user_id = p.user_id AND c.w = p.w
)
SELECT CAST(DATE '1970-01-01' + CAST(j.w * 7 AS INTEGER) AS DATE)
         AS week_start,
       CAST(sum(CASE WHEN is_cur AND f.first_w = j.w THEN 1 ELSE 0 END)
            AS BIGINT) AS new_users,
       CAST(sum(CASE WHEN is_cur AND is_prv AND f.first_w < j.w
                     THEN 1 ELSE 0 END) AS BIGINT) AS retained_users,
       CAST(sum(CASE WHEN is_cur AND NOT is_prv AND f.first_w < j.w
                     THEN 1 ELSE 0 END) AS BIGINT) AS resurrected_users,
       CAST(sum(CASE WHEN NOT is_cur THEN 1 ELSE 0 END) AS BIGINT)
         AS churned_users,
       CAST(sum(CASE WHEN is_cur THEN 1 ELSE 0 END) AS BIGINT)
         AS active_users
FROM j JOIN fw f ON j.user_id = f.user_id
GROUP BY j.w
ORDER BY week_start
"""


@_register("growth_accounting_weekly", _GROWTH_ORACLE)
def growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — the new/retained/resurrected/churned
    decomposition every product dashboard leads with (active(w) ≡
    new + retained + resurrected, and churned(w) counts users active
    in w−1 who went silent): per-user weekly activity is one distinct,
    the week-over-week transition is a FULL OUTER self-join of the
    activity set against itself shifted one week (presence flags on
    both sides classify all four states in one pass — no per-user
    window walk), and first-activity weeks broadcast in from a
    mergeable min. Epoch-week arithmetic on integer micros keeps week
    keys engine-stable. Scale shape: the raw stream collapses to
    (user, week) once; the shifted self-join and the fw join are
    user-keyed hash joins on that bounded frame; the readout is one
    rollup per week."""
    ua = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("unix_micros(ts) div (7 * 86400000000)").alias("w"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    fw = ua.groupBy("user_id").agg(F.min("w").alias("first_w"))
    cur = ua.select("user_id", "w")
    prv = ua.select("user_id", (F.col("w") + 1).alias("w"))
    j = (
        cur.withColumn("c_flag", F.lit(1))
        .join(
            prv.withColumn("p_flag", F.lit(1)),
            ["user_id", "w"],
            "full_outer",
        )
        .select(
            "user_id",
            "w",
            F.col("c_flag").isNotNull().alias("is_cur"),
            F.col("p_flag").isNotNull().alias("is_prv"),
        )
    )
    return (
        j.join(fw, "user_id")
        .groupBy("w")
        .agg(
            F.sum(
                F.when(F.col("is_cur") & (F.col("first_w") == F.col("w")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("new_users"),
            F.sum(
                F.when(
                    F.col("is_cur")
                    & F.col("is_prv")
                    & (F.col("first_w") < F.col("w")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("retained_users"),
            F.sum(
                F.when(
                    F.col("is_cur")
                    & ~F.col("is_prv")
                    & (F.col("first_w") < F.col("w")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("resurrected_users"),
            F.sum(F.when(~F.col("is_cur"), 1).otherwise(0))
            .cast("long")
            .alias("churned_users"),
            F.sum(F.when(F.col("is_cur"), 1).otherwise(0))
            .cast("long")
            .alias("active_users"),
        )
        .select(
            F.expr("date_add(DATE '1970-01-01', CAST(w * 7 AS INT))").alias(
                "week_start"
            ),
            "new_users",
            "retained_users",
            "resurrected_users",
            "churned_users",
            "active_users",
        )
        .orderBy("week_start")
    )


# ===========================================================================
# Lead-lag / clustering-eval / master-data-survivorship wave
# ===========================================================================

_LEADLAG_ORACLE = """
WITH a AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS xa
  FROM events WHERE event_type = 'error' GROUP BY 1
),
b AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS xb
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
m AS (
  SELECT l.lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a.xa) AS BIGINT) AS sa, CAST(sum(b.xb) AS BIGINT) AS sb,
         CAST(sum(a.xa * a.xa) AS BIGINT) AS saa,
         CAST(sum(b.xb * b.xb) AS BIGINT) AS sbb,
         CAST(sum(a.xa * b.xb) AS BIGINT) AS sab
  FROM lags l
  JOIN a ON true
  JOIN b ON b.day = a.day + CAST(l.lag AS INTEGER)
  GROUP BY l.lag
),
r0 AS (
  SELECT lag, n,
         n * sab - sa * sb AS cov_n,
         CAST(n * saa - sa * sa AS HUGEINT) * (n * sbb - sb * sb) AS vv,
         CAST(floor(sqrt(CAST(CAST(n * saa - sa * sa AS HUGEINT)
                              * (n * sbb - sb * sb) AS DOUBLE)))
              AS HUGEINT) AS s0
  FROM m
),
r AS (
  SELECT lag, n, cov_n,
         CAST(CASE WHEN (s0 + 1) * (s0 + 1) <= vv THEN s0 + 1
                   WHEN s0 * s0 > vv THEN s0 - 1
                   ELSE s0 END AS BIGINT) AS sd
  FROM r0
),
cc AS (
  SELECT lag, n,
         CAST(CASE WHEN cov_n >= 0
                   THEN 1000 * cov_n // sd
                   ELSE -(1000 * (-cov_n) // sd) END AS BIGINT) AS ccf_milli
  FROM r
)
SELECT lag, n AS n_days, ccf_milli,
       CAST(CASE WHEN row_number() OVER (ORDER BY abs(ccf_milli) DESC, lag)
                      = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best_lag
FROM cc
ORDER BY lag
"""


@_register("lead_lag_cross_correlation", _LEADLAG_ORACLE)
def lead_lag_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation function between the daily error and
    purchase series at lags −3..+3 — the does-one-metric-predict-the-
    other screen run before any causal claim (a peak off lag 0 says
    which series LEADS). Pearson r needs √(varA·varB): the int128-wide
    variance product rides a DECIMAL multiply and its square root
    comes from the double-seeded isqrt with ±1 exact-compare
    correction (`neyman_allocation_plan`'s recipe lifted to DECIMAL
    width), then one int64 division — the CCF itself value-checks in
    exact milli. Scale shape: both series collapse to day grain first;
    the 7-lag shifted join and all moments live on the calendar-
    bounded frame (lags broadcast)."""
    ev = _t(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("xa"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("dayb"))
        .agg(F.count(F.lit(1)).cast("long").alias("xb"))
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    m = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("dayb") == F.expr("date_add(day, lag)"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("xa").cast("long").alias("sa"),
            F.sum("xb").cast("long").alias("sb"),
            F.sum(F.col("xa") * F.col("xa")).cast("long").alias("saa"),
            F.sum(F.col("xb") * F.col("xb")).cast("long").alias("sbb"),
            F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sab"),
        )
    )
    r = m.select(
        "lag",
        "n",
        F.expr("n * sab - sa * sb").alias("cov_n"),
        F.expr(
            "CAST((n * saa - sa * sa) AS DECIMAL(38,0))"
            " * (n * sbb - sb * sb)"
        ).alias("vv"),
    ).select(
        "lag",
        "n",
        "cov_n",
        "vv",
        F.expr(
            "CAST(floor(sqrt(CAST(vv AS DOUBLE))) AS DECIMAL(38,0))"
        ).alias("s0"),
    ).select(
        "lag",
        "n",
        "cov_n",
        F.expr(
            "CAST(CASE WHEN (s0 + 1) * (s0 + 1) <= vv THEN s0 + 1"
            " WHEN s0 * s0 > vv THEN s0 - 1 ELSE s0 END AS BIGINT)"
        ).alias("sd"),
    )
    cc = r.select(
        "lag",
        "n",
        F.expr(
            "CAST(CASE WHEN cov_n >= 0 THEN 1000 * cov_n div sd"
            " ELSE -(1000 * (-cov_n) div sd) END AS BIGINT)"
        ).alias("ccf_milli"),
    )
    return cc.select(
        "lag",
        F.col("n").alias("n_days"),
        "ccf_milli",
        F.expr(
            "CAST(CASE WHEN row_number() OVER"
            " (ORDER BY abs(ccf_milli) DESC, lag) = 1"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("is_best_lag"),
    ).orderBy("lag")


_RAND_INDEX_ORACLE = """
WITH pts AS (
  SELECT label,
         (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END
        + CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END
        + CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END) AS cluster
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) >= 4
),
ct AS (
  SELECT cluster, label, CAST(count(*) AS BIGINT) AS nij
  FROM pts GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(nij) AS BIGINT) AS n,
         CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS sum_comb_ij,
         CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
         CAST(count(DISTINCT label) AS BIGINT) AS n_labels
  FROM ct
),
rows_ AS (
  SELECT CAST(sum(ni * (ni - 1) // 2) AS BIGINT) AS sum_comb_i
  FROM (SELECT sum(nij) AS ni FROM ct GROUP BY cluster)
),
cols_ AS (
  SELECT CAST(sum(nj * (nj - 1) // 2) AS BIGINT) AS sum_comb_j
  FROM (SELECT sum(nij) AS nj FROM ct GROUP BY label)
),
pur AS (
  SELECT CAST(sum(mx) AS BIGINT) AS purity_num
  FROM (SELECT max(nij) AS mx FROM ct GROUP BY cluster)
)
SELECT t.n AS n_points, t.n_clusters, t.n_labels,
       CAST(p.purity_num * 1000000 // t.n AS BIGINT) AS purity_ppm,
       CAST((t.n * (t.n - 1) // 2 + 2 * t.sum_comb_ij
             - r.sum_comb_i - c.sum_comb_j) * 1000000
            // (t.n * (t.n - 1) // 2) AS BIGINT) AS rand_index_ppm
FROM tot t, rows_ r, cols_ c, pur p
"""


@_register("clustering_rand_index", _RAND_INDEX_ORACLE)
def clustering_rand_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering evaluation WITHOUT enumerating pairs: a
    4-bit sign-signature clustering of the embedding space (first four
    dimensions' signs — a 16-cell LSH-style partition) is scored
    against the ground-truth labels by PURITY and the RAND INDEX,
    where all O(N²) pair agreements collapse to the contingency-table
    identity RI = [C(N,2) + 2ΣC(nij,2) − ΣC(ni·,2) − ΣC(n·j,2)] /
    C(N,2) — exact integers end to end, the evaluation every
    `semantic_dedup_clusters`-style pipeline needs before trusting
    cluster-level dedup decisions. Scale shape: one rollup shuffle to
    the (cluster, label) contingency table; every score is algebra on
    that bounded frame — N² never materializes."""
    pts = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull() & (F.size("embedding") >= 4))
        .select(
            "label",
            F.expr(
                "(CASE WHEN embedding[0] > 0 THEN 8 ELSE 0 END"
                " + CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END"
                " + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END"
                " + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END)"
            ).alias("cluster"),
        )
    )
    ct = pts.groupBy("cluster", "label").agg(
        F.count(F.lit(1)).cast("long").alias("nij")
    ).localCheckpoint(eager=False)
    tot = ct.agg(
        F.sum("nij").cast("long").alias("n"),
        F.sum(F.expr("nij * (nij - 1) div 2")).cast("long").alias(
            "sum_comb_ij"
        ),
        F.countDistinct("cluster").cast("long").alias("n_clusters"),
        F.countDistinct("label").cast("long").alias("n_labels"),
    )
    rows_ = (
        ct.groupBy("cluster")
        .agg(F.sum("nij").alias("ni"))
        .agg(
            F.sum(F.expr("ni * (ni - 1) div 2")).cast("long").alias(
                "sum_comb_i"
            )
        )
    )
    cols_ = (
        ct.groupBy("label")
        .agg(F.sum("nij").alias("nj"))
        .agg(
            F.sum(F.expr("nj * (nj - 1) div 2")).cast("long").alias(
                "sum_comb_j"
            )
        )
    )
    pur = (
        ct.groupBy("cluster")
        .agg(F.max("nij").alias("mx"))
        .agg(F.sum("mx").cast("long").alias("purity_num"))
    )
    return (
        tot.crossJoin(F.broadcast(rows_))
        .crossJoin(F.broadcast(cols_))
        .crossJoin(F.broadcast(pur))
        .select(
            F.col("n").alias("n_points"),
            "n_clusters",
            "n_labels",
            F.expr("CAST(purity_num * 1000000 div n AS BIGINT)").alias(
                "purity_ppm"
            ),
            F.expr(
                "CAST((n * (n - 1) div 2 + 2 * sum_comb_ij"
                " - sum_comb_i - sum_comb_j) * 1000000"
                " div (n * (n - 1) div 2) AS BIGINT)"
            ).alias("rand_index_ppm"),
        )
    )


_SURVIVORSHIP_ORACLE = """
WITH c AS (
  SELECT c_custkey // 3 AS cl, c_mktsegment, c_name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer
),
seg_cnt AS (
  SELECT cl, c_mktsegment, count(*) AS cnt FROM c GROUP BY 1, 2
),
seg_pick AS (
  SELECT cl, c_mktsegment AS chosen, n_vals
  FROM (SELECT cl, c_mktsegment,
               row_number() OVER (PARTITION BY cl
                                  ORDER BY cnt DESC, c_mktsegment) AS rn,
               count(*) OVER (PARTITION BY cl) AS n_vals
        FROM seg_cnt)
  WHERE rn = 1
),
seg AS (
  SELECT 'mktsegment: mode' AS rule,
         CAST(count(*) AS BIGINT) AS n_clusters,
         CAST(sum(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_conflicted,
         CAST(sum(CAST('0x' || substr(md5(chosen), 1, 12) AS BIGINT))
              AS BIGINT) AS chosen_fingerprint
  FROM seg_pick
),
bal AS (
  SELECT 'acctbal: max' AS rule,
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(sum(CAST('0x' || substr(md5(CAST(mx AS VARCHAR)), 1, 12)
                       AS BIGINT)) AS BIGINT)
  FROM (SELECT cl, max(bal) AS mx, count(DISTINCT bal) AS nd
        FROM c GROUP BY cl)
),
nm AS (
  SELECT 'name: longest' AS rule,
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(sum(CAST('0x' || substr(md5(chosen), 1, 12) AS BIGINT))
              AS BIGINT)
  FROM (
    SELECT cl, c_name AS chosen,
           count(*) OVER (PARTITION BY cl) AS nd
    FROM (SELECT cl, c_name,
                 row_number() OVER (PARTITION BY cl
                                    ORDER BY length(c_name) DESC, c_name)
                   AS rn
          FROM (SELECT DISTINCT cl, c_name FROM c))
    QUALIFY rn = 1
  )
),
u AS (SELECT * FROM seg UNION ALL SELECT * FROM bal UNION ALL SELECT * FROM nm)
SELECT rule, n_clusters, n_conflicted,
       CAST(n_conflicted * 1000000 // n_clusters AS BIGINT) AS conflict_ppm,
       chosen_fingerprint
FROM u
ORDER BY rule
"""


@_register("golden_record_survivorship", _SURVIVORSHIP_ORACLE)
def golden_record_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Master-data survivorship: collapse each 3-record customer
    cluster (custkey div 3 — the post-`record_linkage_fs_scoring`
    stage where matched records must become ONE golden record) under
    three field-level rules — most-frequent value for segment
    (deterministic tie-break), greatest for balance, longest-then-
    lexicographic for name — reporting per rule how many clusters
    actually CONFLICTED plus an order-free additive md5 fingerprint of
    every chosen value, so the exact survivor set value-checks, not
    just its size. Scale shape: each rule is one rollup + one rank
    window partitioned by cluster (clusters resolve in parallel); the
    readout is three 1-row frames unioned."""
    c = _t(spark, sf_dir, "customer").select(
        F.expr("c_custkey div 3").alias("cl"),
        "c_mktsegment",
        "c_name",
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("bal"),
    ).localCheckpoint(eager=False)
    fp = lambda col: F.sum(
        F.expr(f"CAST(conv(substr(md5({col}), 1, 12), 16, 10) AS BIGINT)")
    ).cast("long")
    seg_pick = (
        c.groupBy("cl", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "cl",
            "c_mktsegment",
            F.row_number()
            .over(
                W.partitionBy("cl").orderBy(
                    F.col("cnt").desc(), "c_mktsegment"
                )
            )
            .alias("rn"),
            F.count(F.lit(1))
            .over(
                W.partitionBy("cl").rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            )
            .alias("n_vals"),
        )
        .filter(F.col("rn") == 1)
    )
    seg = seg_pick.agg(
        F.lit("mktsegment: mode").alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum(F.when(F.col("n_vals") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_conflicted"),
        fp("c_mktsegment").alias("chosen_fingerprint"),
    )
    bal = (
        c.groupBy("cl")
        .agg(
            F.max("bal").alias("mx"),
            F.countDistinct("bal").alias("nd"),
        )
        .agg(
            F.lit("acctbal: max").alias("rule"),
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_conflicted"),
            fp("CAST(mx AS STRING)").alias("chosen_fingerprint"),
        )
    )
    nm = (
        c.select("cl", "c_name")
        .distinct()
        .select(
            "cl",
            "c_name",
            F.row_number()
            .over(
                W.partitionBy("cl").orderBy(
                    F.length("c_name").desc(), "c_name"
                )
            )
            .alias("rn"),
            F.count(F.lit(1))
            .over(
                W.partitionBy("cl").rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            )
            .alias("nd"),
        )
        .filter(F.col("rn") == 1)
        .agg(
            F.lit("name: longest").alias("rule"),
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_conflicted"),
            fp("c_name").alias("chosen_fingerprint"),
        )
    )
    return (
        seg.unionAll(bal)
        .unionAll(nm)
        .select(
            "rule",
            "n_clusters",
            "n_conflicted",
            F.expr(
                "CAST(n_conflicted * 1000000 div n_clusters AS BIGINT)"
            ).alias("conflict_ppm"),
            "chosen_fingerprint",
        )
        .orderBy("rule")
    )


_ALLEN_ORACLE = """
WITH iv AS (
  SELECT o_custkey AS cust, o_orderkey AS k,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS s,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           + 1 + (o_orderkey % 14) AS e
  FROM orders
),
pairs AS (
  SELECT cust, k AS k1, s AS s1, e AS e1,
         lead(k) OVER w AS k2,
         lead(s) OVER w AS s2,
         lead(e) OVER w AS e2
  FROM iv
  WINDOW w AS (PARTITION BY cust ORDER BY s, k)
  QUALIFY k2 IS NOT NULL
),
labeled AS (
  SELECT CASE
           WHEN s1 = s2 AND e1 = e2 THEN 'equals'
           WHEN s1 = s2 AND e1 < e2 THEN 'starts'
           WHEN s1 = s2 THEN 'started_by'
           WHEN e1 < s2 THEN 'before'
           WHEN e1 = s2 THEN 'meets'
           WHEN e1 < e2 THEN 'overlaps'
           WHEN e1 = e2 THEN 'finished_by'
           ELSE 'contains'
         END AS relation,
         CAST('0x' || substr(md5(CAST(k1 AS VARCHAR) || '_'
                                 || CAST(k2 AS VARCHAR)), 1, 10) AS BIGINT)
           AS fp
  FROM pairs
)
SELECT relation,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(*) * 1000000
            // (SELECT count(*) FROM labeled) AS BIGINT) AS share_ppm,
       CAST(sum(fp) AS BIGINT) AS pair_fingerprint
FROM labeled
GROUP BY relation
ORDER BY relation
"""


@_register("interval_allen_algebra", _ALLEN_ORACLE)
def interval_allen_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen interval-algebra classification of consecutive order
    validity intervals per customer (start = order epoch-day, length
    1 + orderkey mod 14): each adjacent pair is labeled with its Allen
    relation — under the canonical (start, key) ordering exactly the 8
    left-to-right relations (before/meets/overlaps/finished_by/
    contains/starts/equals/started_by) can occur — the temporal-logic
    primitive under overlap joins, conflict detection and timeline
    validation that engines with native PERIOD types ship built-in.
    The per-pair assignment itself value-checks through an additive
    md5 fingerprint of the ordered key pairs, not just the relation
    counts. Scale shape: ONE window shuffle partitioned by customer
    (lead over the per-customer timeline), then a mergeable rollup;
    the share denominator is a broadcast 1-row aggregate."""
    iv = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("k"),
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
        ).alias("s"),
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
            " + 1 + (o_orderkey % 14)"
        ).alias("e"),
    )
    w = W.partitionBy("cust").orderBy("s", "k")
    pairs = (
        iv.select(
            F.col("k").alias("k1"),
            F.col("s").alias("s1"),
            F.col("e").alias("e1"),
            F.lead("k").over(w).alias("k2"),
            F.lead("s").over(w).alias("s2"),
            F.lead("e").over(w).alias("e2"),
        )
        .filter(F.col("k2").isNotNull())
        .select(
            F.expr(
                "CASE WHEN s1 = s2 AND e1 = e2 THEN 'equals'"
                " WHEN s1 = s2 AND e1 < e2 THEN 'starts'"
                " WHEN s1 = s2 THEN 'started_by'"
                " WHEN e1 < s2 THEN 'before'"
                " WHEN e1 = s2 THEN 'meets'"
                " WHEN e1 < e2 THEN 'overlaps'"
                " WHEN e1 = e2 THEN 'finished_by'"
                " ELSE 'contains' END"
            ).alias("relation"),
            F.expr(
                "CAST(conv(substr(md5(CAST(k1 AS STRING) || '_'"
                " || CAST(k2 AS STRING)), 1, 10), 16, 10) AS BIGINT)"
            ).alias("fp"),
        )
        .localCheckpoint(eager=False)
    )
    tot = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        pairs.groupBy("relation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("fp").cast("long").alias("pair_fingerprint"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "relation",
            "n_pairs",
            F.expr("CAST(n_pairs * 1000000 div n_total AS BIGINT)").alias(
                "share_ppm"
            ),
            "pair_fingerprint",
        )
        .orderBy("relation")
    )


_AVG_PREC_ORACLE = """
WITH d AS (
  SELECT doc_id, lower(text) AS lt, substr(lower(text), 1, 100) AS head
  FROM documents WHERE text IS NOT NULL
),
cand AS (
  SELECT q.term, t.doc_id,
         CAST(count(*) AS BIGINT) AS tf,
         max(CASE WHEN strpos(t.head, q.term) > 0
                  THEN 1 ELSE 0 END) AS rel
  FROM (SELECT doc_id, head,
               unnest(regexp_extract_all(lt, '[a-z]+', 0)) AS tok
        FROM d) t
  JOIN (SELECT unnest(['data','join','query','stream','vector']) AS term) q
    ON t.tok = q.term
  GROUP BY q.term, t.doc_id
),
ranked AS (
  SELECT term, doc_id, tf, rel,
         row_number() OVER (PARTITION BY term
                            ORDER BY tf DESC, doc_id) AS rk,
         CAST(sum(rel) OVER (PARTITION BY term) AS BIGINT) AS n_relevant,
         CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS n_candidates
  FROM cand
),
top10 AS (
  SELECT term, n_relevant, n_candidates, rel, rk,
         CAST(sum(rel) OVER (PARTITION BY term ORDER BY rk) AS BIGINT)
           AS hits_k
  FROM ranked WHERE rk <= 10
),
perq AS (
  SELECT term,
         any_value(n_candidates) AS n_candidates,
         any_value(n_relevant) AS n_relevant,
         CAST(max(hits_k) AS BIGINT) AS hits_at_10,
         CAST(sum(rel * hits_k * (2520 // rk)) AS BIGINT) AS ap_scaled
  FROM top10
  GROUP BY term
),
scored AS (
  SELECT term, n_candidates, n_relevant, hits_at_10,
         CAST(CASE WHEN least(n_relevant, 10) > 0
              THEN ap_scaled * 1000000
                   // (2520 * least(n_relevant, 10))
              ELSE 0 END AS BIGINT) AS ap_ppm
  FROM perq
)
SELECT term, n_candidates, n_relevant, hits_at_10, ap_ppm,
       CAST((SELECT sum(ap_ppm) // count(*) FROM scored) AS BIGINT)
         AS map_ppm
FROM scored
ORDER BY term
"""


@_register("average_precision_eval", _AVG_PREC_ORACLE)
def average_precision_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-Precision@10 and MAP over five single-term retrieval
    queries: candidates are docs containing the term, ranked by term
    frequency; relevance is declared independently (the term appears
    in the first 100 chars — a title proxy), so precision genuinely
    varies down the ranking. AP is EXACT rational arithmetic with no
    logs or floats: P@k summands share lcm(1..10)=2520, so
    ap_scaled = Σ rel_k·hits_k·(2520 div k) is an integer and
    AP = ap_scaled/(2520·min(R,10)) floors once to ppm; MAP floors the
    per-query ppm mean — the rank-quality eval (nDCG's log-free
    sibling) that grades any of the catalog's retrieval rankers.
    Scale shape: one token-explode rollup keyed by (term, doc); each
    query's ranking is an independent window partition; per-query AP
    is one ordered cumulative window on ≤10 rows; queries evaluate in
    parallel."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    cand = (
        d.select(
            "doc_id",
            F.expr("substr(lower(text), 1, 100)").alias("head"),
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("term"),
        )
        .filter(
            F.col("term").isin(["data", "join", "query", "stream", "vector"])
        )
        .groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max(
                F.expr("CASE WHEN instr(head, term) > 0 THEN 1 ELSE 0 END")
            ).alias("rel"),
        )
    )
    wq = W.partitionBy("term")
    ranked = cand.select(
        "term",
        "doc_id",
        "tf",
        "rel",
        F.row_number()
        .over(wq.orderBy(F.col("tf").desc(), "doc_id"))
        .alias("rk"),
        F.sum("rel")
        .over(wq.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("long")
        .alias("n_relevant"),
        F.count(F.lit(1))
        .over(wq.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("long")
        .alias("n_candidates"),
    ).filter(F.col("rk") <= 10)
    top10 = ranked.select(
        "term",
        "n_relevant",
        "n_candidates",
        "rel",
        "rk",
        F.sum("rel").over(wq.orderBy("rk")).cast("long").alias("hits_k"),
    )
    perq = top10.groupBy("term").agg(
        F.first("n_candidates").alias("n_candidates"),
        F.first("n_relevant").alias("n_relevant"),
        F.max("hits_k").cast("long").alias("hits_at_10"),
        F.sum(F.expr("rel * hits_k * (2520 div rk)"))
        .cast("long")
        .alias("ap_scaled"),
    )
    scored = perq.select(
        "term",
        "n_candidates",
        "n_relevant",
        "hits_at_10",
        F.expr(
            "CAST(CASE WHEN least(n_relevant, 10) > 0"
            " THEN ap_scaled * 1000000 div (2520 * least(n_relevant, 10))"
            " ELSE 0 END AS BIGINT)"
        ).alias("ap_ppm"),
    ).localCheckpoint(eager=False)
    mp = scored.agg(
        F.expr("CAST(sum(ap_ppm) div count(*) AS BIGINT)").alias("map_ppm")
    )
    return (
        scored.crossJoin(F.broadcast(mp))
        .select(
            "term",
            "n_candidates",
            "n_relevant",
            "hits_at_10",
            "ap_ppm",
            "map_ppm",
        )
        .orderBy("term")
    )


_IVM_ORACLE = """
WITH li AS (
  SELECT l_orderkey AS k,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         (l_shipdate >= TIMESTAMP '2001-01-01') AS is_delta
  FROM lineitem
),
od AS (
  SELECT o_orderkey AS k, o_orderpriority,
         (o_orderdate >= TIMESTAMP '2001-01-01') AS is_delta
  FROM orders
),
lanes AS (
  SELECT od.o_orderpriority,
         CASE WHEN NOT li.is_delta AND NOT od.is_delta
              THEN 'snapshot' ELSE 'delta' END AS lane,
         CAST(count(*) AS BIGINT) AS c,
         CAST(sum(li.cents) AS BIGINT) AS r
  FROM li JOIN od ON od.k = li.k
  GROUP BY 1, 2
)
SELECT o_orderpriority,
       CAST(sum(CASE WHEN lane = 'snapshot' THEN c ELSE 0 END) AS BIGINT)
         AS snap_cnt,
       CAST(sum(CASE WHEN lane = 'delta' THEN c ELSE 0 END) AS BIGINT)
         AS delta_cnt,
       CAST(sum(c) AS BIGINT) AS cnt,
       CAST(sum(r) AS BIGINT) AS rev_cents
FROM lanes
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@_register("incremental_join_maintenance", _IVM_ORACLE)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a join rollup: with base
    snapshots A0 (lineitem shipped before 2001-01-01) and B0 (orders
    placed before it) plus deltas dA/dB, the maintained aggregate is
    the snapshot rollup MERGED with the delta decomposition
    d(A ⋈ B) = dA⋈B0 ∪ A0⋈dB ∪ dA⋈dB — the Spark side EXECUTES the
    three delta joins and merges mergeable partials (count/sum), while
    the oracle recomputes the full join once and classifies rows by
    their delta flags, so the cross-engine hash match IS the proof of
    the IVM algebra. At 100 TB the snapshot lane is a stored rollup
    and only the delta joins run per refresh — the economics of every
    materialized-view engine. Scale shape: the three delta joins union
    BEFORE one partial aggregate (one shuffle on the group key); the
    final merge is a tiny 5-row agg."""
    t0 = "TIMESTAMP '2001-01-01'"
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("k"),
            F.expr(
                "CAST(round(l_extendedprice * 100) AS BIGINT)"
            ).alias("cents"),
            F.expr(f"l_shipdate >= {t0}").alias("is_delta"),
        )
        .localCheckpoint(eager=False)
    )
    od = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            "o_orderpriority",
            F.expr(f"o_orderdate >= {t0}").alias("is_delta"),
        )
        .localCheckpoint(eager=False)
    )
    a0 = li.filter(~F.col("is_delta")).drop("is_delta")
    da = li.filter(F.col("is_delta")).drop("is_delta")
    b0 = od.filter(~F.col("is_delta")).drop("is_delta")
    db = od.filter(F.col("is_delta")).drop("is_delta")

    def tagged(left, right, lane):
        return left.join(right, "k").select(
            "o_orderpriority", "cents", F.lit(lane).alias("lane")
        )

    parts = (
        tagged(a0, b0, "snapshot")
        .unionByName(tagged(da, b0, "delta"))
        .unionByName(tagged(a0, db, "delta"))
        .unionByName(tagged(da, db, "delta"))
        .groupBy("o_orderpriority", "lane")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("cents").cast("long").alias("r"),
        )
    )
    return (
        parts.groupBy("o_orderpriority")
        .agg(
            F.sum(F.expr("CASE WHEN lane = 'snapshot' THEN c ELSE 0 END"))
            .cast("long")
            .alias("snap_cnt"),
            F.sum(F.expr("CASE WHEN lane = 'delta' THEN c ELSE 0 END"))
            .cast("long")
            .alias("delta_cnt"),
            F.sum("c").cast("long").alias("cnt"),
            F.sum("r").cast("long").alias("rev_cents"),
        )
        .orderBy("o_orderpriority")
    )


_PHONETIC_ORACLE = """
WITH vocab AS (
  SELECT DISTINCT w AS word FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]{3,}', 0)) AS w
    FROM documents WHERE text IS NOT NULL
    UNION ALL
    SELECT unnest(regexp_extract_all(lower(p_name), '[a-z]{3,}', 0)) FROM part
  )
),
sides AS (
  SELECT word, word AS src, 'clean' AS side FROM vocab
  UNION ALL
  SELECT substr(word, 1, 1) || substr(word, 3) AS word, word AS src,
         'dirty' AS side
  FROM vocab
),
coded0 AS (
  SELECT word, src, side, upper(word) AS uw,
         substr(upper(word), 1, 1) AS fl,
         regexp_extract_all(
           translate(upper(word), 'AEIOUYBFPVCGJKQSXZDTLMNRHW',
                                  '000000111122222222334556'), '.') AS chars
  FROM sides
),
coded AS (
  SELECT word, src, side,
         substr(
           fl || substr(
             replace(
               substr(
                 list_aggregate(
                   list_filter(chars, (x, i) -> i = 1 OR x != chars[i-1]),
                   'string_agg', ''),
                 CASE WHEN fl IN ('H', 'W') THEN 1 ELSE 2 END),
               '0', '') || '000',
             1, 3),
           1, 4) AS code
  FROM coded0
),
cl AS (SELECT DISTINCT code, word FROM coded WHERE side = 'clean'),
dt AS (SELECT DISTINCT code, word, src FROM coded WHERE side = 'dirty'),
cand AS (
  SELECT cl.code, cl.word AS clean_word, dt.word AS dirty_word,
         CASE WHEN dt.src = cl.word THEN 1 ELSE 0 END AS is_true,
         CAST('0x' || substr(md5(cl.word || '>' || dt.word), 1, 10)
              AS BIGINT) AS fp
  FROM cl JOIN dt ON dt.code = cl.code
),
tot AS (
  SELECT CAST(sum(is_true) AS BIGINT) AS found_true,
         (SELECT CAST(count(*) AS BIGINT) FROM dt) AS n_dirty
  FROM cand
)
SELECT c.code,
       CAST(count(DISTINCT c.clean_word) AS BIGINT) AS n_clean,
       CAST(count(DISTINCT c.dirty_word) AS BIGINT) AS n_dirty_words,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(c.is_true) AS BIGINT) AS n_true,
       CAST(sum(c.fp) AS BIGINT) AS pair_fingerprint,
       CAST(t.found_true * 1000000 // t.n_dirty AS BIGINT)
         AS blocking_recall_ppm
FROM cand c CROSS JOIN tot t
GROUP BY c.code, t.found_true, t.n_dirty
ORDER BY c.code
"""


@_register("phonetic_blocking_join", _PHONETIC_ORACLE)
def phonetic_blocking_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic (Soundex) blocking for fuzzy record linkage: the corpus
    vocabulary plus a deterministically-dirtied copy (a deletion typo —
    2nd char dropped) are blocked by Soundex code and candidate pairs
    form ONLY within blocks — the classic sub-quadratic alternative to
    `fuzzy_join_blocked_levenshtein`'s length blocking, measuring per
    block the candidate volume, the true matches captured, and the
    overall blocking recall. The Spark lane uses the BUILT-IN
    `soundex()`; the oracle re-derives the full algorithm (vowel
    zeroing, H/W-bridged collapse, first-letter code drop, zero strip,
    pad-to-4) from first principles in portable SQL — the cross-engine
    hash match is therefore an executable proof of the builtin's
    semantics. Scale shape: vocabulary extraction is one distinct
    rollup; the block join is an equi-join on the 4-char code (never
    all-pairs); block-size skew is the visible n_candidates column."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    vocab = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]{3,}', 0)")
            ).alias("word")
        )
        .unionByName(
            _t(spark, sf_dir, "part").select(
                F.explode(
                    F.expr(
                        "regexp_extract_all(lower(p_name), '[a-z]{3,}', 0)"
                    )
                ).alias("word")
            )
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    clean = vocab.select(
        F.soundex("word").alias("code"), "word"
    ).distinct()
    dirty = (
        vocab.select(
            F.expr("substr(word, 1, 1) || substr(word, 3)").alias("word"),
            F.col("word").alias("src"),
        )
        .select(F.soundex("word").alias("code"), "word", "src")
        .distinct()
        .localCheckpoint(eager=False)
    )
    cand = (
        clean.withColumnRenamed("word", "clean_word")
        .join(
            dirty.select(
                "code", F.col("word").alias("dirty_word"), "src"
            ),
            "code",
        )
        .select(
            "code",
            "clean_word",
            "dirty_word",
            F.expr(
                "CASE WHEN src = clean_word THEN 1 ELSE 0 END"
            ).alias("is_true"),
            F.expr(
                "CAST(conv(substr(md5(clean_word || '>' || dirty_word),"
                " 1, 10), 16, 10) AS BIGINT)"
            ).alias("fp"),
        )
        .localCheckpoint(eager=False)
    )
    tot = cand.agg(
        F.sum("is_true").cast("long").alias("found_true")
    ).crossJoin(
        F.broadcast(
            dirty.agg(F.count(F.lit(1)).cast("long").alias("n_dirty"))
        )
    )
    return (
        cand.groupBy("code")
        .agg(
            F.countDistinct("clean_word").cast("long").alias("n_clean"),
            F.countDistinct("dirty_word")
            .cast("long")
            .alias("n_dirty_words"),
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum("is_true").cast("long").alias("n_true"),
            F.sum("fp").cast("long").alias("pair_fingerprint"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "code",
            "n_clean",
            "n_dirty_words",
            "n_candidates",
            "n_true",
            "pair_fingerprint",
            F.expr(
                "CAST(found_true * 1000000 div n_dirty AS BIGINT)"
            ).alias("blocking_recall_ppm"),
        )
        .orderBy("code")
    )


_MATCH_RECOGNIZE_ORACLE = """
WITH daily AS (
  SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
         CAST(sum(round(o.o_totalprice * 100)) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
steps AS (
  SELECT n_name, day, cents,
         lag(cents) OVER (PARTITION BY n_name ORDER BY day) AS prev
  FROM daily
),
chars AS (
  SELECT n_name, day,
         CASE WHEN prev IS NULL THEN ''
              WHEN cents > prev THEN 'U'
              WHEN cents < prev THEN 'D'
              ELSE 'F' END AS ch
  FROM steps
),
strs AS (
  SELECT n_name, string_agg(ch, '' ORDER BY day) AS s,
         CAST(count(*) AS BIGINT) AS n_days
  FROM chars GROUP BY n_name
),
pat AS (
  SELECT n_name, n_days, regexp_extract_all(s, 'D+U+') AS valleys
  FROM strs
)
SELECT n_name, n_days,
       CAST(len(valleys) AS BIGINT) AS n_valleys,
       CAST(coalesce(list_sum(list_transform(valleys, v -> length(v))), 0)
            AS BIGINT) AS valley_days,
       CAST(coalesce(list_max(list_transform(valleys, v -> length(v))), 0)
            AS BIGINT) AS longest_valley
FROM pat
ORDER BY n_name
"""


@_register("match_recognize_emulation", _MATCH_RECOGNIZE_ORACLE)
def match_recognize_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 MATCH_RECOGNIZE emulation — PATTERN (D+ U+) over each
    nation's daily order-revenue series: every day is classified
    Up/Down/Flat against the previous day (one lag window), the
    per-nation timeline collapses to an ordered state string, and
    maximal D+U+ runs (V-shaped drawdown-recovery episodes) are
    counted/measured with a regex — the row-pattern-recognition
    surface Trino/Flink/Oracle ship natively and Spark lacks,
    re-expressed as window + ordered string aggregation + regexp (all
    JVM codegen, no Python). Scale shape: one rollup to (nation, day),
    one lag window and one ordered collect per nation partition —
    state strings are bounded by the calendar, not the fact table;
    nations process in parallel."""
    daily = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.expr("CAST(o_orderdate AS DATE)").alias("day"))
        .agg(
            F.expr("CAST(sum(round(o_totalprice * 100)) AS BIGINT)").alias(
                "cents"
            )
        )
    )
    chars = daily.select(
        "n_name",
        "day",
        F.expr(
            "CASE WHEN lag(cents) OVER"
            " (PARTITION BY n_name ORDER BY day) IS NULL THEN ''"
            " WHEN cents > lag(cents) OVER"
            " (PARTITION BY n_name ORDER BY day) THEN 'U'"
            " WHEN cents < lag(cents) OVER"
            " (PARTITION BY n_name ORDER BY day) THEN 'D'"
            " ELSE 'F' END"
        ).alias("ch"),
    )
    strs = chars.groupBy("n_name").agg(
        F.expr(
            "array_join(transform(array_sort("
            "collect_list(struct(day, ch))), x -> x.ch), '')"
        ).alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    return (
        strs.select(
            "n_name",
            "n_days",
            F.expr("regexp_extract_all(s, 'D+U+', 0)").alias("valleys"),
        )
        .select(
            "n_name",
            "n_days",
            F.expr("CAST(size(valleys) AS BIGINT)").alias("n_valleys"),
            F.expr(
                "CAST(coalesce(aggregate(valleys, 0,"
                " (acc, v) -> acc + length(v)), 0) AS BIGINT)"
            ).alias("valley_days"),
            F.expr(
                "CAST(coalesce(array_max(transform(valleys,"
                " v -> length(v))), 0) AS BIGINT)"
            ).alias("longest_valley"),
        )
        .orderBy("n_name")
    )


_NEWSVENDOR_ORACLE = """
WITH demand AS (
  SELECT p.p_brand, CAST(l.l_shipdate AS DATE) AS day,
         CAST(sum(l.l_quantity) AS BIGINT) AS d
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
dist AS (
  SELECT p_brand, d, CAST(count(*) AS BIGINT) AS c
  FROM demand GROUP BY 1, 2
),
cum AS (
  SELECT p_brand, d, c,
         CAST(sum(c) OVER (PARTITION BY p_brand ORDER BY d) AS BIGINT)
           AS cum_c,
         CAST(sum(c) OVER (PARTITION BY p_brand) AS BIGINT) AS n_days
  FROM dist
),
qstar AS (
  SELECT p_brand, min(d) AS q_star, any_value(n_days) AS n_days
  FROM cum WHERE cum_c * 10 >= n_days * 9
  GROUP BY p_brand
),
costs AS (
  SELECT q.p_brand, q.q_star, q.n_days,
         CAST(sum(CASE WHEN q.q_star >= m.d THEN q.q_star - m.d
                       ELSE 9 * (m.d - q.q_star) END) AS BIGINT)
           AS cost_at_q,
         CAST(sum(CASE WHEN q.q_star - 1 >= m.d THEN q.q_star - 1 - m.d
                       ELSE 9 * (m.d - q.q_star + 1) END) AS BIGINT)
           AS cost_minus,
         CAST(sum(CASE WHEN q.q_star + 1 >= m.d THEN q.q_star + 1 - m.d
                       ELSE 9 * (m.d - q.q_star - 1) END) AS BIGINT)
           AS cost_plus
  FROM qstar q JOIN demand m ON m.p_brand = q.p_brand
  GROUP BY 1, 2, 3
)
SELECT p_brand, n_days, q_star, cost_at_q, cost_minus, cost_plus,
       CAST(CASE WHEN cost_at_q <= cost_minus AND cost_at_q <= cost_plus
                 THEN 1 ELSE 0 END AS BIGINT) AS is_optimal
FROM costs
ORDER BY p_brand
"""


@_register("newsvendor_quantile_stock", _NEWSVENDOR_ORACLE)
def newsvendor_quantile_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor inventory optimization: per brand, the optimal stock
    level is the critical fractile cu/(cu+co) = 9/10 of the empirical
    daily-demand distribution (q* = smallest demand with
    cum_days·10 ≥ n_days·9 — an integer quantile inversion, no
    percentile_approx), and the entry then EXECUTES the optimality
    proof by evaluating the realized overage/underage cost at q*−1,
    q*, q*+1 (co=1, cu=9) — is_optimal value-checks that the fractile
    minimizes cost on the data, the decision-theoretic use of the
    warehouse's own demand history. Scale shape: one rollup to
    (brand, day), cumulative windows per brand on the distinct-value
    frame (never a global sort), and the cost sweep is one join back
    to the daily rollup with a 3-point CASE."""
    demand = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", F.expr("CAST(l_shipdate AS DATE)").alias("day"))
        .agg(F.expr("CAST(sum(l_quantity) AS BIGINT)").alias("d"))
        .localCheckpoint(eager=False)
    )
    dist = demand.groupBy("p_brand", "d").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wb = W.partitionBy("p_brand")
    cum = dist.select(
        "p_brand",
        "d",
        F.sum("c").over(wb.orderBy("d")).cast("long").alias("cum_c"),
        F.sum("c")
        .over(wb.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("long")
        .alias("n_days"),
    )
    qstar = (
        cum.filter(F.expr("cum_c * 10 >= n_days * 9"))
        .groupBy("p_brand")
        .agg(
            F.min("d").alias("q_star"),
            F.first("n_days").alias("n_days"),
        )
    )
    costs = (
        qstar.join(demand.select("p_brand", "d"), "p_brand")
        .groupBy("p_brand", "q_star", "n_days")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN q_star >= d THEN q_star - d"
                    " ELSE 9 * (d - q_star) END"
                )
            )
            .cast("long")
            .alias("cost_at_q"),
            F.sum(
                F.expr(
                    "CASE WHEN q_star - 1 >= d THEN q_star - 1 - d"
                    " ELSE 9 * (d - q_star + 1) END"
                )
            )
            .cast("long")
            .alias("cost_minus"),
            F.sum(
                F.expr(
                    "CASE WHEN q_star + 1 >= d THEN q_star + 1 - d"
                    " ELSE 9 * (d - q_star - 1) END"
                )
            )
            .cast("long")
            .alias("cost_plus"),
        )
    )
    return costs.select(
        "p_brand",
        F.col("n_days").cast("long"),
        "q_star",
        "cost_at_q",
        "cost_minus",
        "cost_plus",
        F.expr(
            "CAST(CASE WHEN cost_at_q <= cost_minus"
            " AND cost_at_q <= cost_plus THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("is_optimal"),
    ).orderBy("p_brand")


_KENDALL_TAU_ORACLE = """
WITH daily AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x,
         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
),
pairs AS (
  SELECT a.yr,
         CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS dx,
         CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS dy
  FROM daily a JOIN daily b ON b.yr = a.yr AND b.day > a.day
),
agg AS (
  SELECT yr,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN dx * dy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_pairs,
         CAST(sum(CASE WHEN dx * dy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS d_pairs,
         CAST(sum(CASE WHEN dx = 0 AND dy != 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(sum(CASE WHEN dy = 0 AND dx != 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM pairs GROUP BY yr
),
n AS (
  SELECT yr, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY yr
)
SELECT a.yr, n.n_days, a.n_pairs, a.c_pairs, a.d_pairs, a.tx, a.ty,
       CAST(a.c_pairs - a.d_pairs AS BIGINT) AS s_stat,
       CAST(CASE WHEN a.c_pairs - a.d_pairs > 0 THEN 1
                 WHEN a.c_pairs - a.d_pairs < 0 THEN -1 ELSE 0 END AS BIGINT)
         AS tau_sign,
       CAST(CASE WHEN (a.c_pairs + a.d_pairs + a.tx) * (a.c_pairs + a.d_pairs + a.ty) = 0
                 THEN 0
                 ELSE (a.c_pairs - a.d_pairs) * (a.c_pairs - a.d_pairs) * 1000000
                      // ((a.c_pairs + a.d_pairs + a.tx) * (a.c_pairs + a.d_pairs + a.ty))
            END AS BIGINT) AS tau_b_sq_ppm
FROM agg a JOIN n ON n.yr = a.yr
ORDER BY a.yr
"""


@_register("kendall_tau_by_year", _KENDALL_TAU_ORACLE)
def kendall_tau_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily order count and
    daily revenue, per order-year: concordant/discordant/tied pair
    counts are exact integers, S = C-D carries the sign, and tau_b**2
    rides a ppm floor-div lane ((C-D)^2*1e6 // ((C+D+Tx)(C+D+Ty))) so
    the tie-corrected correlation itself value-checks with no sqrt.
    Scale shape: the pair enumeration is an EQUI-join on year with a
    day-inequality residual over the calendar-bounded daily rollup --
    O(365^2) pairs per year INDEPENDENT of data volume (the daily
    grain is fixed by the calendar, so 100 TB changes the rollup
    cost, never the pair count)."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("yr"),
            F.expr("CAST(o_orderdate AS DATE)").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.expr("CAST(sum(round(o_totalprice * 100)) AS BIGINT)").alias(
                "y"
            ),
        )
        .localCheckpoint(eager=False)
    )
    a = daily.select(
        "yr",
        F.col("day").alias("day_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = daily.select(
        "yr",
        F.col("day").alias("day_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    pairs = a.join(b, ["yr"]).filter(F.col("day_b") > F.col("day_a")).select(
        "yr",
        F.expr(
            "CASE WHEN xb > xa THEN 1 WHEN xb < xa THEN -1 ELSE 0 END"
        ).alias("dx"),
        F.expr(
            "CASE WHEN yb > ya THEN 1 WHEN yb < ya THEN -1 ELSE 0 END"
        ).alias("dy"),
    )
    agg = pairs.groupBy("yr").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.expr("CASE WHEN dx * dy = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("c_pairs"),
        F.sum(F.expr("CASE WHEN dx * dy = -1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("d_pairs"),
        F.sum(F.expr("CASE WHEN dx = 0 AND dy != 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("tx"),
        F.sum(F.expr("CASE WHEN dy = 0 AND dx != 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("ty"),
    )
    n = daily.groupBy("yr").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        agg.join(n, "yr")
        .select(
            "yr",
            "n_days",
            "n_pairs",
            "c_pairs",
            "d_pairs",
            "tx",
            "ty",
            F.expr("CAST(c_pairs - d_pairs AS BIGINT)").alias("s_stat"),
            F.expr(
                "CAST(CASE WHEN c_pairs - d_pairs > 0 THEN 1"
                " WHEN c_pairs - d_pairs < 0 THEN -1 ELSE 0 END AS BIGINT)"
            ).alias("tau_sign"),
            F.expr(
                "CAST(CASE WHEN (c_pairs + d_pairs + tx)"
                " * (c_pairs + d_pairs + ty) = 0 THEN 0"
                " ELSE (c_pairs - d_pairs) * (c_pairs - d_pairs) * 1000000"
                " div ((c_pairs + d_pairs + tx) * (c_pairs + d_pairs + ty))"
                " END AS BIGINT)"
            ).alias("tau_b_sq_ppm"),
        )
        .orderBy("yr")
    )


_PETTITT_ORACLE = """
WITH daily AS (
  SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
         CAST(sum(round(o.o_totalprice * 100)) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
v AS (
  SELECT n_name, day,
         CAST(2 * (rank() OVER (PARTITION BY n_name ORDER BY cents) - 1)
              + count(*) OVER (PARTITION BY n_name, cents)
              - count(*) OVER (PARTITION BY n_name) AS BIGINT) AS vt,
         CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n_days
  FROM daily
),
u AS (
  SELECT n_name, day, n_days,
         CAST(sum(vt) OVER (PARTITION BY n_name ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS ut,
         row_number() OVER (PARTITION BY n_name ORDER BY day) AS t
  FROM v
),
k AS (
  SELECT n_name, any_value(n_days) AS n_days,
         CAST(max(abs(ut)) AS BIGINT) AS k_stat
  FROM u WHERE t < n_days GROUP BY n_name
)
SELECT k.n_name, k.n_days, k.k_stat,
       CAST(min(u.day) AS DATE) AS cp_day,
       CAST(min_by(u.ut, u.day) AS BIGINT) AS u_at_cp,
       CAST(CASE WHEN 6000 * k.k_stat * k.k_stat
                      >= 3689 * (k.n_days * k.n_days * k.n_days
                                 + k.n_days * k.n_days)
                 THEN 1 ELSE 0 END AS BIGINT) AS pettitt_alarm
FROM k JOIN u ON u.n_name = k.n_name AND abs(u.ut) = k.k_stat
               AND u.t < k.n_days
GROUP BY k.n_name, k.n_days, k.k_stat
ORDER BY k.n_name
"""


@_register("pettitt_changepoint_daily", _PETTITT_ORACLE)
def pettitt_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank-based change-point test on per-nation daily revenue
    -- the nonparametric complement to `cusum_changepoint_screen`
    (level, parametric) / `ks_test_two_sample` (shape) /
    `mann_kendall_theil_sen` (trend): K = max_t |U_t| where
    U_t = sum_{i<=t, j>t} sgn(x_i - x_j), located WITHOUT the naive
    O(n^2) double sum via the rank identity V_t = 2(rank_t - 1) +
    ties_t - n and U_t = cumsum(V_t) in day order -- two windows per
    nation, all exact integers. The 5% alarm compares 6000*K^2 against
    3689*(n^3 + n^2) (milli-scaled ln(40) from p = 2*exp(-6K^2/(n^3+n^2)),
    integer-exact on both engines). Scale shape: one rollup to
    (nation, day), then rank/count/cumsum windows all partitioned by
    nation -- a single hash shuffle, no pair join anywhere."""
    daily = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.expr("CAST(o_orderdate AS DATE)").alias("day"))
        .agg(
            F.expr("CAST(sum(round(o_totalprice * 100)) AS BIGINT)").alias(
                "cents"
            )
        )
    )
    wn = W.partitionBy("n_name")
    v = daily.select(
        "n_name",
        "day",
        (
            F.lit(2) * (F.rank().over(wn.orderBy("cents")) - F.lit(1))
            + F.count(F.lit(1)).over(W.partitionBy("n_name", "cents"))
            - F.count(F.lit(1)).over(wn)
        )
        .cast("long")
        .alias("vt"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n_days"),
    )
    u = v.select(
        "n_name",
        "day",
        "n_days",
        F.sum("vt")
        .over(wn.orderBy("day").rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("ut"),
        F.row_number().over(wn.orderBy("day")).alias("t"),
    ).localCheckpoint(eager=False)
    k = (
        u.filter(F.col("t") < F.col("n_days"))
        .groupBy("n_name")
        .agg(
            F.first("n_days").alias("n_days"),
            F.max(F.abs(F.col("ut"))).cast("long").alias("k_stat"),
        )
    )
    return (
        k.join(u.select("n_name", "day", "ut", "t"), ["n_name"])
        .filter(
            (F.abs(F.col("ut")) == F.col("k_stat"))
            & (F.col("t") < F.col("n_days"))
        )
        .groupBy("n_name", "n_days", "k_stat")
        .agg(
            F.min("day").cast("date").alias("cp_day"),
            F.expr("CAST(min_by(ut, day) AS BIGINT)").alias("u_at_cp"),
        )
        .select(
            "n_name",
            "n_days",
            "k_stat",
            "cp_day",
            "u_at_cp",
            F.expr(
                "CAST(CASE WHEN 6000 * k_stat * k_stat"
                " >= 3689 * (n_days * n_days * n_days + n_days * n_days)"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("pettitt_alarm"),
        )
        .orderBy("n_name")
    )


_NDCG_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS term,
         len(regexp_extract_all(lower(text), '[a-z]+', 0)) AS dl
  FROM documents WHERE text IS NOT NULL
),
cand AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
         CAST(max(dl) AS BIGINT) AS dl
  FROM toks WHERE term IN ('join', 'vector', 'stream', 'table')
  GROUP BY 1, 2
),
graded AS (
  SELECT term, doc_id, dl,
         CAST(CASE WHEN tf >= 3 THEN 7 WHEN tf = 2 THEN 3 ELSE 1 END
              AS BIGINT) AS gain,
         CAST(tf * 1000000 // dl AS BIGINT) AS score
  FROM cand
),
ranked AS (
  SELECT term, gain,
         row_number() OVER (PARTITION BY term
                            ORDER BY score DESC, doc_id) AS pos
  FROM graded QUALIFY pos <= 10
),
ideal AS (
  SELECT term, gain,
         row_number() OVER (PARTITION BY term
                            ORDER BY gain DESC, doc_id) AS pos
  FROM graded QUALIFY pos <= 10
),
dcg AS (
  SELECT term,
         CAST(sum(gain * ([1000,630,500,430,386,356,333,315,301,289])[pos])
              AS BIGINT) AS dcg_milli
  FROM ranked GROUP BY term
),
idcg AS (
  SELECT term,
         CAST(sum(gain * ([1000,630,500,430,386,356,333,315,301,289])[pos])
              AS BIGINT) AS idcg_milli
  FROM ideal GROUP BY term
),
nc AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n_candidates FROM graded
  GROUP BY term
)
SELECT d.term, nc.n_candidates, d.dcg_milli, i.idcg_milli,
       CAST(d.dcg_milli * 1000000 // i.idcg_milli AS BIGINT) AS ndcg_ppm
FROM dcg d JOIN idcg i ON i.term = d.term JOIN nc ON nc.term = d.term
ORDER BY d.term
"""


@_register("ndcg_graded_retrieval", _NDCG_ORACLE)
def ndcg_graded_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 with graded relevance -- the ranking-quality eval that
    P@k (`retrieval_precision_at_k`) and AP (`average_precision_eval`)
    can't express: relevance grade = min(tf, 3) maps to exponential
    gains 2^g - 1 in {1,3,7}, the system ranking is length-normalized
    term frequency (tf/dl), and the position discounts 1/log2(pos+1)
    ride a SHARED milli-scaled literal table (floor(1000/log2(p+1))
    for p = 1..10) so the only transcendental in NDCG is a 10-element
    constant both engines read identically -- DCG, ideal DCG and the
    nDCG ppm ratio are all exact integers. Scale shape: one
    term-filtered mergeable rollup per (term, doc), two top-10
    windows partitioned by the 4-term query panel, and a 3-way join
    of 4-row frames."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    cand = (
        docs.select(
            "doc_id",
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias(
                "arr"
            ),
        )
        .select(
            "doc_id",
            F.size("arr").cast("long").alias("dl"),
            F.explode("arr").alias("term"),
        )
        .filter(F.col("term").isin(["join", "vector", "stream", "table"]))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    graded = cand.select(
        "term",
        "doc_id",
        F.expr(
            "CAST(CASE WHEN tf >= 3 THEN 7 WHEN tf = 2 THEN 3 ELSE 1 END"
            " AS BIGINT)"
        ).alias("gain"),
        F.expr("CAST(tf * 1000000 div dl AS BIGINT)").alias("score"),
    ).localCheckpoint(eager=False)
    disc = "array(1000,630,500,430,386,356,333,315,301,289)"
    wt = W.partitionBy("term")
    ranked = graded.select(
        "term",
        "gain",
        F.row_number()
        .over(wt.orderBy(F.col("score").desc(), F.col("doc_id")))
        .alias("pos"),
    ).filter(F.col("pos") <= 10)
    ideal = graded.select(
        "term",
        "gain",
        F.row_number()
        .over(wt.orderBy(F.col("gain").desc(), F.col("doc_id")))
        .alias("pos"),
    ).filter(F.col("pos") <= 10)
    dcg = ranked.groupBy("term").agg(
        F.expr(f"CAST(sum(gain * element_at({disc}, pos)) AS BIGINT)").alias(
            "dcg_milli"
        )
    )
    idcg = ideal.groupBy("term").agg(
        F.expr(f"CAST(sum(gain * element_at({disc}, pos)) AS BIGINT)").alias(
            "idcg_milli"
        )
    )
    nc = graded.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    return (
        dcg.join(idcg, "term")
        .join(nc, "term")
        .select(
            "term",
            "n_candidates",
            "dcg_milli",
            "idcg_milli",
            F.expr(
                "CAST(dcg_milli * 1000000 div idcg_milli AS BIGINT)"
            ).alias("ndcg_ppm"),
        )
        .orderBy("term")
    )


_DATA_VAULT_ORACLE = """
WITH hub_customer AS (
  SELECT md5(CAST(c_custkey AS VARCHAR)) AS hk FROM customer
),
hub_order AS (
  SELECT md5(CAST(o_orderkey AS VARCHAR)) AS hk FROM orders
),
link_customer_order AS (
  SELECT md5(CAST(o_custkey AS VARCHAR) || '|' || CAST(o_orderkey AS VARCHAR))
           AS hk
  FROM orders
),
sat_order AS (
  SELECT md5(CAST(o_orderkey AS VARCHAR)) AS hk,
         md5(o_orderstatus || '|' ||
             CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
             || '|' || strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
             || '|' || o_orderpriority) AS hashdiff
  FROM orders
),
rows_all AS (
  SELECT 'hub_customer' AS structure, hk, hk AS payload FROM hub_customer
  UNION ALL
  SELECT 'hub_order', hk, hk FROM hub_order
  UNION ALL
  SELECT 'link_customer_order', hk, hk FROM link_customer_order
  UNION ALL
  SELECT 'sat_order', hk, hashdiff FROM sat_order
)
SELECT structure,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT hk) AS BIGINT) AS n_keys,
       CAST(count(DISTINCT payload) AS BIGINT) AS n_payloads,
       CAST(sum(CAST('0x' || substr(payload, 1, 8) AS BIGINT)) AS BIGINT)
         AS checksum
FROM rows_all
GROUP BY structure
ORDER BY structure
"""


@_register("data_vault_model_build", _DATA_VAULT_ORACLE)
def data_vault_model_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Vault 2.0 raw-vault build over the order subject area: hubs
    (business keys + md5 hash keys), the customer-order link (md5 of
    the concatenated key pair), and the order satellite whose HASHDIFF
    fingerprints the descriptive payload (status|price-cents|date|
    priority) for delta detection -- the warehouse-modeling pattern
    the SCD2 family doesn't cover (insert-only structures, no update
    anywhere, loads parallelize per structure). The audit emits per
    structure the row count, distinct hash-key count (hub/link
    dedupe-ness; sat key multiplicity) and an ORDER-FREE checksum
    (sum of the first 8 md5 hex digits as BIGINT), so the hash
    construction itself value-checks cross-engine. Scale shape: each
    structure is one scan + one mergeable agg; no joins at all (the
    vault defers them to query time), checksum addends are < 2^32 so
    the sum stays far from BIGINT overflow at any SF."""
    orders = _t(spark, sf_dir, "orders")
    hub_c = _t(spark, sf_dir, "customer").select(
        F.lit("hub_customer").alias("structure"),
        F.expr("md5(CAST(c_custkey AS STRING))").alias("hk"),
    )
    hub_o = orders.select(
        F.lit("hub_order").alias("structure"),
        F.expr("md5(CAST(o_orderkey AS STRING))").alias("hk"),
    )
    link = orders.select(
        F.lit("link_customer_order").alias("structure"),
        F.expr(
            "md5(CAST(o_custkey AS STRING) || '|'"
            " || CAST(o_orderkey AS STRING))"
        ).alias("hk"),
    )
    sat = orders.select(
        F.lit("sat_order").alias("structure"),
        F.expr("md5(CAST(o_orderkey AS STRING))").alias("hk"),
        F.expr(
            "md5(o_orderstatus || '|'"
            " || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"
            " || '|' || date_format(CAST(o_orderdate AS DATE), 'yyyy-MM-dd')"
            " || '|' || o_orderpriority)"
        ).alias("payload"),
    )
    rows_all = (
        hub_c.withColumn("payload", F.col("hk"))
        .unionByName(hub_o.withColumn("payload", F.col("hk")))
        .unionByName(link.withColumn("payload", F.col("hk")))
        .unionByName(sat)
    )
    return (
        rows_all.groupBy("structure")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("hk").cast("long").alias("n_keys"),
            F.countDistinct("payload").cast("long").alias("n_payloads"),
            F.expr(
                "CAST(sum(CAST(conv(substr(payload, 1, 8), 16, 10)"
                " AS BIGINT)) AS BIGINT)"
            ).alias("checksum"),
        )
        .orderBy("structure")
    )


_KAPPA_ORACLE = """
WITH labeled AS (
  SELECT source,
         CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS r1,
         CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+', 0)) >= 90
              THEN 1 ELSE 0 END AS r2
  FROM documents WHERE text IS NOT NULL
),
cells AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN r1 = 1 AND r2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n11,
         CAST(sum(CASE WHEN r1 = 0 AND r2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n00,
         CAST(sum(r1) AS BIGINT) AS a1,
         CAST(sum(r2) AS BIGINT) AS b1
  FROM labeled GROUP BY source
),
ppm AS (
  SELECT source, n, n11, n00, a1, b1,
         CAST((n11 + n00) * 1000000 // n AS BIGINT) AS p_o_ppm,
         CAST((a1 * b1 + (n - a1) * (n - b1)) * 1000000 // (n * n)
              AS BIGINT) AS p_e_ppm
  FROM cells
)
SELECT source, n, n11, n00, a1, b1, p_o_ppm, p_e_ppm,
       CAST(CASE WHEN p_e_ppm = 1000000 THEN 1000000
                 ELSE (p_o_ppm - p_e_ppm) * 1000000
                      // (1000000 - p_e_ppm) END AS BIGINT) AS kappa_ppm
FROM ppm
ORDER BY source
"""


@_register("cohens_kappa_agreement", _KAPPA_ORACLE)
def cohens_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa inter-rater agreement between two independent
    document-quality raters (rater 1: character-length gate at 500;
    rater 2: token-count gate at 90), per source: observed agreement
    p_o and chance agreement p_e ride exact ppm lanes ((n11+n00)/n and
    the marginal product (a1*b1 + a0*b0)/n^2), and kappa =
    (p_o-p_e)/(1-p_e) is one integer division of the two -- the
    labeling-QA statistic that raw accuracy can't replace when both
    raters say 'good' for most docs by chance. Integer-exact on both
    engines (kappa here is nonnegative-lane: chance-beating raters;
    the /-division truncates identically in both engines for the
    positive values this data yields, asserted by the pytest
    reference). Scale shape: one scan, one mergeable per-source agg --
    no shuffle beyond the 20-source rollup."""
    labeled = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "source",
            F.expr("CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END").alias("r1"),
            F.expr(
                "CASE WHEN size(regexp_extract_all(lower(text),"
                " '[a-z]+', 0)) >= 90 THEN 1 ELSE 0 END"
            ).alias("r2"),
        )
    )
    cells = labeled.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CASE WHEN r1 = 1 AND r2 = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n11"),
        F.sum(F.expr("CASE WHEN r1 = 0 AND r2 = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n00"),
        F.sum("r1").cast("long").alias("a1"),
        F.sum("r2").cast("long").alias("b1"),
    )
    ppm = cells.select(
        "source",
        "n",
        "n11",
        "n00",
        "a1",
        "b1",
        F.expr("CAST((n11 + n00) * 1000000 div n AS BIGINT)").alias(
            "p_o_ppm"
        ),
        F.expr(
            "CAST((a1 * b1 + (n - a1) * (n - b1)) * 1000000 div (n * n)"
            " AS BIGINT)"
        ).alias("p_e_ppm"),
    )
    return ppm.select(
        "source",
        "n",
        "n11",
        "n00",
        "a1",
        "b1",
        "p_o_ppm",
        "p_e_ppm",
        F.expr(
            "CAST(CASE WHEN p_e_ppm = 1000000 THEN 1000000"
            " ELSE (p_o_ppm - p_e_ppm) * 1000000"
            " div (1000000 - p_e_ppm) END AS BIGINT)"
        ).alias("kappa_ppm"),
    ).orderBy("source")


_SPEARMAN_ORACLE = """
WITH daily AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x,
         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT yr,
         CAST(2 * rank() OVER (PARTITION BY yr ORDER BY x)
              + count(*) OVER (PARTITION BY yr, x) - 1 AS BIGINT) AS rx,
         CAST(2 * rank() OVER (PARTITION BY yr ORDER BY y)
              + count(*) OVER (PARTITION BY yr, y) - 1 AS BIGINT) AS ry
  FROM daily
),
moments AS (
  SELECT yr,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
         CAST(sum(rx * rx) AS BIGINT) AS sxx,
         CAST(sum(ry * ry) AS BIGINT) AS syy,
         CAST(sum(rx * ry) AS BIGINT) AS sxy
  FROM ranked GROUP BY yr
),
d AS (
  SELECT yr, n_days,
         CAST(n_days * sxy - sx * sy AS BIGINT) AS cov_num,
         CAST(n_days * sxx - sx * sx AS BIGINT) AS vx_n,
         CAST(n_days * syy - sy * sy AS BIGINT) AS vy_n
  FROM moments
)
SELECT yr, n_days, cov_num,
       CAST(CASE WHEN cov_num > 0 THEN 1
                 WHEN cov_num < 0 THEN -1 ELSE 0 END AS BIGINT) AS rho_sign,
       CAST(CASE WHEN CAST(vx_n AS HUGEINT) * vy_n = 0 THEN 0
                 ELSE CAST(cov_num AS HUGEINT) * cov_num * 1000000
                      // (CAST(vx_n AS HUGEINT) * vy_n)
            END AS BIGINT) AS rho_sq_ppm
FROM d
ORDER BY yr
"""


@_register("spearman_rho_by_year", _SPEARMAN_ORACLE)
def spearman_rho_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily order count and daily
    revenue per year, tie-exact: fractional ranks ride a DOUBLED
    integer lane (2*rank + ties - 1 = twice the average rank of a tied
    block), rho is Pearson on those doubled ranks, and rho^2 rides a
    ppm floor-div lane from the five integer moments (n*Sxy - Sx*Sy
    squared over the two variance numerators) -- no sqrt, no float,
    so the tie-corrected statistic itself value-checks. The monotone
    complement to `kendall_tau_by_year` (same frame, pair-free): at
    100 TB the Kendall pair join is O(days^2) per year while this is
    two rank windows + one mergeable moment agg, the shape to prefer
    when only the correlation (not the pair counts) is needed.
    cov_num^2 * 1e6 and vx*vy are int128-wide, so the ppm quotient
    uses the `cuped_variance_reduction` recipe: exact DECIMAL(38,0)
    products, a double-seeded floor, and a +/-1 correction by exact
    decimal compares (Spark DECIMAL `div` wraps; DuckDB runs plain
    HUGEINT floor division against it)."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("yr"),
            F.expr("CAST(o_orderdate AS DATE)").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.expr("CAST(sum(round(o_totalprice * 100)) AS BIGINT)").alias(
                "y"
            ),
        )
    )
    wy = W.partitionBy("yr")
    ranked = daily.select(
        "yr",
        (
            F.lit(2) * F.rank().over(wy.orderBy("x"))
            + F.count(F.lit(1)).over(W.partitionBy("yr", "x"))
            - F.lit(1)
        )
        .cast("long")
        .alias("rx"),
        (
            F.lit(2) * F.rank().over(wy.orderBy("y"))
            + F.count(F.lit(1)).over(W.partitionBy("yr", "y"))
            - F.lit(1)
        )
        .cast("long")
        .alias("ry"),
    )
    moments = ranked.groupBy("yr").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.expr("CAST(sum(rx * rx) AS BIGINT)").alias("sxx"),
        F.expr("CAST(sum(ry * ry) AS BIGINT)").alias("syy"),
        F.expr("CAST(sum(rx * ry) AS BIGINT)").alias("sxy"),
    )
    d = moments.select(
        "yr",
        "n_days",
        F.expr("CAST(n_days * sxy - sx * sy AS BIGINT)").alias("cov_num"),
        F.expr("CAST(n_days * sxx - sx * sx AS BIGINT)").alias("vx_n"),
        F.expr("CAST(n_days * syy - sy * sy AS BIGINT)").alias("vy_n"),
    )
    # cov_num^2 * 1e6 and vx_n*vy_n are int128-wide: DECIMAL(38,0)
    # products are exact, and the quotient is double-seeded then
    # corrected +/-1 by exact decimal compares (the
    # cuped_variance_reduction recipe; Spark DECIMAL `div` would wrap).
    q = d.select(
        "yr",
        "n_days",
        "cov_num",
        F.expr(
            "CAST(cov_num AS DECIMAL(38,0)) * CAST(cov_num AS DECIMAL(38,0))"
            " * 1000000"
        ).alias("num"),
        F.expr(
            "CAST(vx_n AS DECIMAL(38,0)) * CAST(vy_n AS DECIMAL(38,0))"
        ).alias("den"),
    ).select(
        "yr",
        "n_days",
        "cov_num",
        "num",
        "den",
        F.expr(
            "CAST(CASE WHEN den = 0 THEN 0"
            " ELSE floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"
            " END AS DECIMAL(38,0))"
        ).alias("q0"),
    )
    return q.select(
        "yr",
        "n_days",
        "cov_num",
        F.expr(
            "CAST(CASE WHEN cov_num > 0 THEN 1"
            " WHEN cov_num < 0 THEN -1 ELSE 0 END AS BIGINT)"
        ).alias("rho_sign"),
        F.expr(
            "CAST(CASE WHEN den = 0 THEN 0"
            " WHEN (q0 + 1) * den <= num THEN q0 + 1"
            " WHEN q0 * den > num THEN q0 - 1"
            " ELSE q0 END AS BIGINT)"
        ).alias("rho_sq_ppm"),
    ).orderBy("yr")


_RR_ORACLE = """
WITH users AS (SELECT DISTINCT user_id FROM events),
types AS (SELECT DISTINCT event_type FROM events),
truth AS (
  SELECT u.user_id, t.event_type,
         CASE WHEN (SELECT count(*) FROM events e
                    WHERE e.user_id = u.user_id
                      AND e.event_type = t.event_type) >= 2
              THEN 1 ELSE 0 END AS b
  FROM users u CROSS JOIN types t
),
resp AS (
  SELECT event_type, b,
         CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':'
                        || event_type || ':rr'), 1, 8) AS BIGINT) % 4 < 3
              THEN b ELSE 1 - b END AS y
  FROM truth
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(y) AS BIGINT) AS reported_yes,
       CAST(sum(b) AS BIGINT) AS true_yes,
       CAST(1099 AS BIGINT) AS epsilon_milli,
       CAST(2 * sum(y) * 1000000 // count(*) - 500000 AS BIGINT)
         AS pi_hat_ppm,
       CAST(sum(b) * 1000000 // count(*) AS BIGINT) AS pi_true_ppm,
       CAST(abs(2 * sum(y) * 1000000 // count(*) - 500000
                - sum(b) * 1000000 // count(*)) AS BIGINT) AS abs_err_ppm
FROM resp
GROUP BY event_type
ORDER BY event_type
"""


@_register("randomized_response_estimate", _RR_ORACLE)
def randomized_response_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized response -- the local-differential-privacy
    mechanism (per-user epsilon = ln 3, reported as the shared milli
    literal 1099): each user reports their true bit ('had >= 2 events
    of this type') with probability 3/4 and the flipped bit otherwise,
    the coin being a deterministic md5 lane so BOTH engines replay the
    identical randomization; the entry then executes the debiasing
    estimator pi_hat = 2*p_yes - 1/2 in exact ppm and scores it
    against the (privately invisible in production, available here)
    ground truth. The aggregator-side view of the `dp_bounded_
    contribution_agg` family: noise injected client-side, bias removed
    analytically. Scale shape: one per-(user,type) rollup, one
    mergeable per-type agg; the user-type grid is a broadcast cross of
    the 5-type frame."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    users = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    truth = (
        users.crossJoin(F.broadcast(types))
        .join(counts, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            F.expr(
                "CASE WHEN coalesce(c, 0) >= 2 THEN 1 ELSE 0 END"
            ).alias("b"),
        )
    )
    resp = truth.select(
        "event_type",
        "b",
        F.expr(
            "CASE WHEN CAST(conv(substr(md5(CAST(user_id AS STRING) || ':'"
            " || event_type || ':rr'), 1, 8), 16, 10) AS BIGINT) % 4 < 3"
            " THEN b ELSE 1 - b END"
        ).alias("y"),
    )
    return (
        resp.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("y").cast("long").alias("reported_yes"),
            F.sum("b").cast("long").alias("true_yes"),
        )
        .select(
            "event_type",
            "n_users",
            "reported_yes",
            "true_yes",
            F.lit(1099).cast("long").alias("epsilon_milli"),
            F.expr(
                "CAST(2 * reported_yes * 1000000 div n_users - 500000"
                " AS BIGINT)"
            ).alias("pi_hat_ppm"),
            F.expr(
                "CAST(true_yes * 1000000 div n_users AS BIGINT)"
            ).alias("pi_true_ppm"),
            F.expr(
                "CAST(abs(2 * reported_yes * 1000000 div n_users - 500000"
                " - true_yes * 1000000 div n_users) AS BIGINT)"
            ).alias("abs_err_ppm"),
        )
        .orderBy("event_type")
    )


_PINBALL_ORACLE = """
WITH daily AS (
  SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
         CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         CAST(count(*) AS BIGINT) AS d
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2, 3
),
train AS (SELECT n_name, d FROM daily WHERE yr <= 1996),
dist AS (
  SELECT n_name, d, CAST(count(*) AS BIGINT) AS c FROM train GROUP BY 1, 2
),
cum AS (
  SELECT n_name, d, c,
         CAST(sum(c) OVER (PARTITION BY n_name ORDER BY d) AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY n_name) AS BIGINT) AS nt
  FROM dist
),
q AS (
  SELECT n_name,
         min(CASE WHEN cc * 10 >= nt * 9 THEN d END) AS q90,
         min(CASE WHEN cc * 2 >= nt THEN d END) AS q50,
         any_value(nt) AS n_train
  FROM cum GROUP BY n_name
),
eval_days AS (SELECT n_name, d FROM daily WHERE yr >= 1997)
SELECT q.n_name, q.n_train, q.q50, q.q90,
       CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(CASE WHEN e.d >= q.q90 THEN 9 * (e.d - q.q90)
                     ELSE q.q90 - e.d END) AS BIGINT) AS loss90_x10,
       CAST(sum(CASE WHEN e.d >= q.q50 THEN 9 * (e.d - q.q50)
                     ELSE q.q50 - e.d END) AS BIGINT) AS loss50_x10,
       CAST(sum(CASE WHEN e.d >= q.q90 THEN 9 * (e.d - q.q90)
                     ELSE q.q90 - e.d END) * 1000
            // count(*) AS BIGINT) AS mean_loss90_milli_x10
FROM q JOIN eval_days e ON e.n_name = q.n_name
GROUP BY q.n_name, q.n_train, q.q50, q.q90
ORDER BY q.n_name
"""


@_register("pinball_loss_quantile_eval", _PINBALL_ORACLE)
def pinball_loss_quantile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss evaluation of a P90 demand forecast:
    train years (<= 1996) yield per-nation integer q50/q90 via exact
    quantile inversion on the distinct-value cumulative frame, eval
    years (>= 1997) score both candidates under the tau = 0.9 pinball
    loss in a x10 integer lane (9*(y-q) when under-forecast, (q-y)
    when over) -- the PROPER scoring rule for quantile forecasts: on
    data where demand is stable, loss90_x10 < loss50_x10 certifies
    empirically that the 0.9-fractile minimizes it, the eval-side
    counterpart of `newsvendor_quantile_stock`'s optimality sweep and
    the quantile analog of `seasonal_naive_forecast_eval`'s MASE.
    Scale shape: one (nation, day) rollup feeds both split halves;
    quantiles come from per-nation cumulative windows on the distinct
    frame (never a global sort); the eval is one equi-join of the
    25-row quantile frame back to eval days."""
    daily = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "n_name",
            F.expr("CAST(o_orderdate AS DATE)").alias("day"),
            F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("yr"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    train = daily.filter(F.col("yr") <= 1996).select("n_name", "d")
    dist = train.groupBy("n_name", "d").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wn = W.partitionBy("n_name")
    cum = dist.select(
        "n_name",
        "d",
        F.sum("c").over(wn.orderBy("d")).cast("long").alias("cc"),
        F.sum("c")
        .over(wn.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("long")
        .alias("nt"),
    )
    q = cum.groupBy("n_name").agg(
        F.min(F.expr("CASE WHEN cc * 10 >= nt * 9 THEN d END")).alias("q90"),
        F.min(F.expr("CASE WHEN cc * 2 >= nt THEN d END")).alias("q50"),
        F.first("nt").alias("n_train"),
    )
    ev = daily.filter(F.col("yr") >= 1997).select("n_name", "d")
    return (
        F.broadcast(q)
        .join(ev, "n_name")
        .groupBy("n_name", "n_train", "q50", "q90")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum(
                F.expr(
                    "CASE WHEN d >= q90 THEN 9 * (d - q90)"
                    " ELSE q90 - d END"
                )
            )
            .cast("long")
            .alias("loss90_x10"),
            F.sum(
                F.expr(
                    "CASE WHEN d >= q50 THEN 9 * (d - q50)"
                    " ELSE q50 - d END"
                )
            )
            .cast("long")
            .alias("loss50_x10"),
        )
        .select(
            "n_name",
            "n_train",
            "q50",
            "q90",
            "n_eval",
            "loss90_x10",
            "loss50_x10",
            F.expr(
                "CAST(loss90_x10 * 1000 div n_eval AS BIGINT)"
            ).alias("mean_loss90_milli_x10"),
        )
        .orderBy("n_name")
    )


_FDR_BH_ORACLE = """
WITH lab AS (
  SELECT n.n_name,
         CAST(count(*) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS y1
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n1) AS BIGINT) AS nn, CAST(sum(y1) AS BIGINT) AS yy
  FROM lab
),
z AS (
  SELECT l.n_name, l.n1, l.y1,
         CAST(CAST(l.y1 * (t.nn - l.n1) - (t.yy - l.y1) * l.n1 AS HUGEINT)
              * (l.y1 * (t.nn - l.n1) - (t.yy - l.y1) * l.n1)
              * t.nn * 1000
              // (CAST(l.n1 AS HUGEINT) * (t.nn - l.n1) * t.yy
                  * (t.nn - t.yy)) AS BIGINT) AS z2_milli
  FROM lab l CROSS JOIN tot t
),
rk AS (
  SELECT n_name, n1, y1, z2_milli,
         CAST(row_number() OVER (ORDER BY z2_milli DESC, n_name) AS BIGINT)
           AS rank
  FROM z
),
hit AS (
  SELECT *,
         ([9549,8283,7550,7033,6634,6310,6038,5802,5596,5411,5245,5094,
           4956,4828,4709,4598,4494,4397,4305,4217,4135,4056,3981,3909,
           3841])[rank] AS bh_critical_milli
  FROM rk
),
kmax AS (
  SELECT CAST(coalesce(max(CASE WHEN z2_milli >= bh_critical_milli
                                THEN rank END), 0) AS BIGINT) AS k
  FROM hit
)
SELECT h.n_name, h.n1, h.y1, h.z2_milli, h.rank, h.bh_critical_milli,
       CAST(CASE WHEN h.rank <= k.k THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM hit h CROSS JOIN kmax k
ORDER BY h.rank
"""


@_register("fdr_bh_screen", _FDR_BH_ORACLE)
def fdr_bh_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over 25 simultaneous two-
    proportion tests (each nation's urgent-order share vs the rest):
    the per-nation chi-square statistic z^2 = (y1*n2 - y2*n1)^2 * N /
    (n1*n2*Y*(N-Y)) rides an exact milli lane (int128 products via
    HUGEINT / the DECIMAL(38,0) seeded-division recipe), and the BH
    step-up compares the DESCENDING z^2 order statistics against a
    shared literal ladder of chi-square(1) critical values at
    alpha*i/m (alpha = 0.05, m = 25; the ladder plays the same role
    as `ndcg_graded_retrieval`'s discount table -- the only
    distribution lookup is 25 constants both engines read
    identically). rejected = rank <= max{i : z^2_(i) >= c_i} executes
    the step-up rule, the multiple-testing guard `two_proportion_
    ab_test` lacks when 25 hypotheses fire at once. Scale shape: one
    rollup to nation, 1-row totals broadcast, a 25-row window."""
    lab = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n1"),
            F.sum(
                F.expr(
                    "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("y1"),
        )
        .localCheckpoint(eager=False)
    )
    tot = lab.agg(
        F.sum("n1").cast("long").alias("nn"),
        F.sum("y1").cast("long").alias("yy"),
    )
    # z2_milli = diff^2 * N * 1000 // (n1*n2*Y*(N-Y)): int128-wide, so
    # DECIMAL(38,0) exact products + double-seeded floor + exact +/-1
    # correction (cuped_variance_reduction recipe).
    z = (
        lab.crossJoin(F.broadcast(tot))
        .select(
            "n_name",
            "n1",
            "y1",
            F.expr("y1 * (nn - n1) - (yy - y1) * n1").alias("diff"),
            F.expr(
                "CAST(n1 AS DECIMAL(38,0)) * (nn - n1) * yy * (nn - yy)"
            ).alias("den"),
            "nn",
        )
        .select(
            "n_name",
            "n1",
            "y1",
            F.expr(
                "CAST(diff AS DECIMAL(38,0)) * CAST(diff AS DECIMAL(38,0))"
                " * nn * 1000"
            ).alias("num"),
            "den",
        )
        .select(
            "n_name",
            "n1",
            "y1",
            "num",
            "den",
            F.expr(
                "CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"
                " AS DECIMAL(38,0))"
            ).alias("q0"),
        )
        .select(
            "n_name",
            "n1",
            "y1",
            F.expr(
                "CAST(CASE WHEN (q0 + 1) * den <= num THEN q0 + 1"
                " WHEN q0 * den > num THEN q0 - 1 ELSE q0 END AS BIGINT)"
            ).alias("z2_milli"),
        )
    )
    ladder = (
        "array(9549,8283,7550,7033,6634,6310,6038,5802,5596,5411,5245,5094,"
        "4956,4828,4709,4598,4494,4397,4305,4217,4135,4056,3981,3909,3841)"
    )
    rk = z.select(
        "n_name",
        "n1",
        "y1",
        "z2_milli",
        F.row_number()
        .over(
            W.partitionBy(F.lit(1)).orderBy(
                F.col("z2_milli").desc(), F.col("n_name")
            )
        )
        .cast("long")
        .alias("rank"),
    )
    hit = rk.select(
        "n_name",
        "n1",
        "y1",
        "z2_milli",
        "rank",
        F.expr(f"element_at({ladder}, CAST(rank AS INT))").cast("long").alias(
            "bh_critical_milli"
        ),
    ).localCheckpoint(eager=False)
    kmax = hit.agg(
        F.expr(
            "CAST(coalesce(max(CASE WHEN z2_milli >= bh_critical_milli"
            " THEN rank END), 0) AS BIGINT)"
        ).alias("k")
    )
    return (
        hit.crossJoin(F.broadcast(kmax))
        .select(
            "n_name",
            "n1",
            "y1",
            "z2_milli",
            "rank",
            "bh_critical_milli",
            F.expr(
                "CAST(CASE WHEN rank <= k THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("rejected"),
        )
        .orderBy("rank")
    )


_HEAPS_ORACLE = """
WITH bounds AS (
  SELECT CAST(min(doc_id) AS BIGINT) AS lo, CAST(max(doc_id) AS BIGINT) AS hi
  FROM documents WHERE text IS NOT NULL
),
toks AS (
  SELECT CAST(least(9, (d.doc_id - b.lo) * 10 // (b.hi - b.lo + 1))
              AS BIGINT) AS bucket,
         d.doc_id,
         unnest(regexp_extract_all(lower(d.text), '[a-z]+', 0)) AS term
  FROM documents d CROSS JOIN bounds b
  WHERE d.text IS NOT NULL
),
per_bucket AS (
  SELECT bucket,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM toks GROUP BY bucket
),
first_seen AS (
  SELECT term, CAST(min(bucket) AS BIGINT) AS first_bucket FROM toks
  GROUP BY term
),
new_terms AS (
  SELECT first_bucket AS bucket, CAST(count(*) AS BIGINT) AS new_terms
  FROM first_seen GROUP BY 1
),
curve AS (
  SELECT p.bucket, p.n_docs, p.n_tokens,
         coalesce(n.new_terms, 0) AS new_terms,
         CAST(sum(p.n_tokens) OVER (ORDER BY p.bucket) AS BIGINT)
           AS tokens_cum,
         CAST(sum(coalesce(n.new_terms, 0)) OVER (ORDER BY p.bucket)
              AS BIGINT) AS vocab_cum
  FROM per_bucket p LEFT JOIN new_terms n ON n.bucket = p.bucket
)
SELECT bucket, n_docs, n_tokens, new_terms, tokens_cum, vocab_cum,
       CAST(vocab_cum * 1000000 // tokens_cum AS BIGINT) AS ttr_ppm
FROM curve
ORDER BY bucket
"""


@_register("heaps_vocab_growth_curve", _HEAPS_ORACLE)
def heaps_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: the corpus is split into 10
    doc-id range buckets and the cumulative vocabulary after each
    prefix is computed WITHOUT any cumulative-distinct scan -- each
    term contributes exactly once at its FIRST bucket (min(bucket) per
    term), so vocab_cum is a cumsum of per-bucket first-appearance
    counts. The decaying type-token ratio (ttr_ppm) down the curve is
    the Heaps sublinearity the `vocabulary_build` sizing decisions
    rest on, and the per-bucket new_terms column is the marginal
    vocabulary yield of more data -- the curve that answers 'will 10x
    data 10x my vocab?' (no: the curve says how much less). Scale
    shape: one token explode, one (term -> min bucket) mergeable agg,
    then windows over a 10-row frame; nothing holds per-doc state."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    bounds = docs.agg(
        F.min("doc_id").cast("long").alias("lo"),
        F.max("doc_id").cast("long").alias("hi"),
    )
    toks = (
        docs.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(
                "CAST(least(9, (doc_id - lo) * 10 div (hi - lo + 1))"
                " AS BIGINT)"
            ).alias("bucket"),
            "doc_id",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("term"),
        )
        .localCheckpoint(eager=False)
    )
    per_bucket = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    new_terms = (
        toks.groupBy("term")
        .agg(F.min("bucket").cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_terms"))
    )
    w = W.partitionBy(F.lit(1)).orderBy("bucket")
    curve = (
        per_bucket.join(new_terms, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            "n_tokens",
            F.coalesce("new_terms", F.lit(0)).cast("long").alias("new_terms"),
        )
        .select(
            "bucket",
            "n_docs",
            "n_tokens",
            "new_terms",
            F.sum("n_tokens").over(w).cast("long").alias("tokens_cum"),
            F.sum("new_terms").over(w).cast("long").alias("vocab_cum"),
        )
    )
    return curve.select(
        "bucket",
        "n_docs",
        "n_tokens",
        "new_terms",
        "tokens_cum",
        "vocab_cum",
        F.expr("CAST(vocab_cum * 1000000 div tokens_cum AS BIGINT)").alias(
            "ttr_ppm"
        ),
    ).orderBy("bucket")


_ZIPF_ORACLE = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS term
  FROM documents WHERE text IS NOT NULL
),
freq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY term
),
top100 AS (
  SELECT term, f,
         CAST(row_number() OVER (ORDER BY f DESC, term) AS BIGINT) AS r
  FROM freq QUALIFY r <= 100
)
SELECT CAST((r - 1) // 10 AS BIGINT) AS rank_band,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(min(f) AS BIGINT) AS min_freq,
       CAST(max(f) AS BIGINT) AS max_freq,
       CAST(sum(r * f) AS BIGINT) AS sum_rf,
       CAST(min(r * f) AS BIGINT) AS min_rf,
       CAST(max(r * f) AS BIGINT) AS max_rf,
       CAST((max(r * f) - min(r * f)) * 1000000 // sum(r * f) AS BIGINT)
         AS rf_spread_ppm
FROM top100
GROUP BY 1
ORDER BY rank_band
"""


@_register("zipf_rank_frequency_audit", _ZIPF_ORACLE)
def zipf_rank_frequency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law audit over the top-100 corpus terms: under Zipf,
    rank x frequency is roughly constant, so the entry bands the
    ranked terms into 10 deciles and reports the r*f product's range
    and normalized spread per band -- all exact integers (the law
    check needs no log-log regression: constancy of r*f IS the
    s ~ 1 Zipf statement). Feeds stopword-list sizing and the
    `shannon_fano_code_length` / `delta_encoding_compression_audit`
    cost models, whose optimality hinges on how Zipfian the term
    distribution actually is. Scale shape: one token explode + one
    mergeable term-frequency agg; the top-100 is a
    TakeOrderedAndProject and the banding a 100-row group-by."""
    toks = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("term")
        )
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("f"))
    top100 = (
        freq.orderBy(F.col("f").desc(), F.col("term"))
        .limit(100)
        .localCheckpoint(eager=False)
        .select(
            "term",
            "f",
            F.row_number()
            .over(
                W.partitionBy(F.lit(1)).orderBy(
                    F.col("f").desc(), F.col("term")
                )
            )
            .cast("long")
            .alias("r"),
        )
    )
    return (
        top100.groupBy(F.expr("CAST((r - 1) div 10 AS BIGINT)").alias(
            "rank_band"
        ))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.min("f").cast("long").alias("min_freq"),
            F.max("f").cast("long").alias("max_freq"),
            F.expr("CAST(sum(r * f) AS BIGINT)").alias("sum_rf"),
            F.expr("CAST(min(r * f) AS BIGINT)").alias("min_rf"),
            F.expr("CAST(max(r * f) AS BIGINT)").alias("max_rf"),
        )
        .select(
            "rank_band",
            "n_terms",
            "min_freq",
            "max_freq",
            "sum_rf",
            "min_rf",
            "max_rf",
            F.expr(
                "CAST((max_rf - min_rf) * 1000000 div sum_rf AS BIGINT)"
            ).alias("rf_spread_ppm"),
        )
        .orderBy("rank_band")
    )


_QINI_ORACLE = """
WITH users AS (
  SELECT user_id,
         CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':qini'),
                                  1, 8) AS BIGINT) % 2 AS BIGINT) AS treated,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS score,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 1 THEN 1 ELSE 0 END AS y
  FROM events GROUP BY user_id
),
byscore AS (
  SELECT score,
         CAST(sum(treated) AS BIGINT) AS n_t,
         CAST(sum(1 - treated) AS BIGINT) AS n_c,
         CAST(sum(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT) AS y_t,
         CAST(sum(CASE WHEN treated = 0 THEN y ELSE 0 END) AS BIGINT) AS y_c
  FROM users GROUP BY score
),
cum AS (
  SELECT score, n_t, n_c, y_t, y_c,
         CAST(sum(n_t) OVER (ORDER BY score DESC) AS BIGINT) AS cum_nt,
         CAST(sum(n_c) OVER (ORDER BY score DESC) AS BIGINT) AS cum_nc,
         CAST(sum(y_t) OVER (ORDER BY score DESC) AS BIGINT) AS cum_yt,
         CAST(sum(y_c) OVER (ORDER BY score DESC) AS BIGINT) AS cum_yc
  FROM byscore
)
SELECT score, n_t, n_c, y_t, y_c, cum_nt, cum_nc, cum_yt, cum_yc,
       CAST(cum_yt * cum_nc - cum_yc * cum_nt AS BIGINT) AS qini_num,
       CAST(CASE WHEN cum_nt = 0 OR cum_nc = 0 THEN 0
                 ELSE cum_yt * 1000000 // cum_nt
                      - cum_yc * 1000000 // cum_nc END AS BIGINT)
         AS cum_uplift_ppm
FROM cum
ORDER BY score DESC
"""


@_register("qini_uplift_deciles", _QINI_ORACLE)
def qini_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini / uplift curve -- the evaluation for TARGETING policies
    that `cumulative_gains_deciles` (outcome-only) can't provide: a
    deterministic md5 coin assigns treatment, users rank by a
    behavioral score (click count), and each prefix of the ranking
    reports cumulative treated/control conversions, the exact-integer
    Qini numerator y_t*n_c - y_c*n_t (sign = whether targeting this
    prefix beats not targeting), and the incremental-uplift estimate
    in ppm. Monotone-decreasing uplift down the curve certifies the
    score actually ranks persuadables first. Scale shape: one rollup
    to user, one to distinct score values, cumulative windows on the
    tiny distinct-score frame (the `cumulative_gains_deciles`
    pattern: never a global per-user sort)."""
    users = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("score"),
            F.expr(
                "CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1"
                " ELSE 0 END) >= 1 THEN 1 ELSE 0 END"
            ).alias("y"),
        )
        .select(
            "score",
            "y",
            F.expr(
                "CAST(CAST(conv(substr(md5(CAST(user_id AS STRING)"
                " || ':qini'), 1, 8), 16, 10) AS BIGINT) % 2 AS BIGINT)"
            ).alias("treated"),
        )
    )
    byscore = users.groupBy("score").agg(
        F.sum("treated").cast("long").alias("n_t"),
        F.sum(F.expr("1 - treated")).cast("long").alias("n_c"),
        F.sum(F.expr("CASE WHEN treated = 1 THEN y ELSE 0 END"))
        .cast("long")
        .alias("y_t"),
        F.sum(F.expr("CASE WHEN treated = 0 THEN y ELSE 0 END"))
        .cast("long")
        .alias("y_c"),
    )
    w = W.partitionBy(F.lit(1)).orderBy(F.col("score").desc())
    cum = byscore.select(
        "score",
        "n_t",
        "n_c",
        "y_t",
        "y_c",
        F.sum("n_t").over(w).cast("long").alias("cum_nt"),
        F.sum("n_c").over(w).cast("long").alias("cum_nc"),
        F.sum("y_t").over(w).cast("long").alias("cum_yt"),
        F.sum("y_c").over(w).cast("long").alias("cum_yc"),
    )
    return cum.select(
        "score",
        "n_t",
        "n_c",
        "y_t",
        "y_c",
        "cum_nt",
        "cum_nc",
        "cum_yt",
        "cum_yc",
        F.expr("CAST(cum_yt * cum_nc - cum_yc * cum_nt AS BIGINT)").alias(
            "qini_num"
        ),
        F.expr(
            "CAST(CASE WHEN cum_nt = 0 OR cum_nc = 0 THEN 0"
            " ELSE cum_yt * 1000000 div cum_nt"
            " - cum_yc * 1000000 div cum_nc END AS BIGINT)"
        ).alias("cum_uplift_ppm"),
    ).orderBy(F.col("score").desc())


def _geohash_sql(latq: str, lonq: str) -> str:
    """Geohash-8 from 20-bit quantized lat/lon as shared SQL text: the
    standard interleave (longitude takes the MSB and every odd bit,
    latitude the even bits) is z_interleave_sql(lat, lon, 20), and the
    base32 alphabet indexes 5-bit groups MSB-first. Equivalent to the
    textbook bisection algorithm at 40 bits (property-tested against
    it in tests/test_analytics_ml22.py)."""
    z = scalar.z_interleave_sql(latq, lonq, bits=20)
    parts = []
    for j in range(8):
        parts.append(
            f"substr('0123456789bcdefghjkmnpqrstuvwxyz',"
            f" CAST((({z}) >> {35 - 5 * j}) & 31 AS INT) + 1, 1)"
        )
    return " || ".join(parts)


_GEOHASH_ORACLE_TMPL = """
WITH pts AS (
  SELECT c_custkey,
         CAST((c_custkey * 7919) % 180000 - 90000 AS BIGINT) AS lat_milli,
         CAST((c_custkey * 104729) % 360000 - 180000 AS BIGINT) AS lon_milli
  FROM customer
),
q AS (
  SELECT c_custkey,
         CAST((lat_milli + 90000) * 1048576 // 180000 AS BIGINT) AS latq,
         CAST((lon_milli + 180000) * 1048576 // 360000 AS BIGINT) AS lonq
  FROM pts
),
gh AS (
  SELECT c_custkey, {gh_expr} AS geohash8 FROM q
),
pref AS (
  SELECT substr(geohash8, 1, 3) AS prefix,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(count(DISTINCT geohash8) AS BIGINT) AS n_cells,
         CAST(sum(CAST('0x' || substr(md5(geohash8), 1, 8) AS BIGINT))
              AS BIGINT) AS checksum
  FROM gh GROUP BY 1
)
SELECT prefix, n_customers, n_cells, checksum
FROM pref
ORDER BY n_customers DESC, prefix
LIMIT 20
"""


@_register(
    "geohash_prefix_rollup",
    _GEOHASH_ORACLE_TMPL.format(
        gh_expr="__GH__"  # placeholder replaced below
    ),
)
def geohash_prefix_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-8 encoding as pure integer SQL (no geo library): synthetic
    customer coordinates quantize to 20 bits per axis, interleave
    through the SHARED Morton helper (`functions.scalar.
    z_interleave_sql` -- the same expression text the z-order layout
    writer uses), and the base32 alphabet maps each 5-bit group; the
    rollup groups customers by 3-char geohash prefix (the ~156 km
    cell), counting members and distinct full-resolution cells with an
    order-free md5 checksum over the encoded strings so the encoding
    itself value-checks character-for-character. The prefix-join
    property (shared prefix <=> spatial proximity) is what makes
    geohash the PARTITION KEY of choice for geo joins at 100 TB --
    `spatial_grid_join` buckets by integer cell; this entry provides
    the interoperable string encoding. Scale shape: embarrassingly
    parallel scan + one rollup on prefix; top-20 is a
    TakeOrderedAndProject."""
    pts = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(
            "CAST((c_custkey * 7919) % 180000 - 90000 AS BIGINT)"
        ).alias("lat_milli"),
        F.expr(
            "CAST((c_custkey * 104729) % 360000 - 180000 AS BIGINT)"
        ).alias("lon_milli"),
    )
    q = pts.select(
        "c_custkey",
        F.expr(
            "CAST((lat_milli + 90000) * 1048576 div 180000 AS BIGINT)"
        ).alias("latq"),
        F.expr(
            "CAST((lon_milli + 180000) * 1048576 div 360000 AS BIGINT)"
        ).alias("lonq"),
    )
    gh = q.select(
        "c_custkey", F.expr(_geohash_sql("latq", "lonq")).alias("geohash8")
    )
    return (
        gh.groupBy(F.expr("substr(geohash8, 1, 3)").alias("prefix"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.countDistinct("geohash8").cast("long").alias("n_cells"),
            F.expr(
                "CAST(sum(CAST(conv(substr(md5(geohash8), 1, 8), 16, 10)"
                " AS BIGINT)) AS BIGINT)"
            ).alias("checksum"),
        )
        .orderBy(F.col("n_customers").desc(), "prefix")
        .limit(20)
    )


# the oracle needs the same generated interleave expression; patch it in
# (DuckDB shares Spark's >>, &, %, || and substr semantics on BIGINT)
REGISTRY["geohash_prefix_rollup"] = Query(
    name="geohash_prefix_rollup",
    spark=REGISTRY["geohash_prefix_rollup"].spark,
    oracle=_GEOHASH_ORACLE_TMPL.format(gh_expr=_geohash_sql("latq", "lonq")),
    doc=REGISTRY["geohash_prefix_rollup"].doc,
)


_ADABOOST_ORACLE = """
WITH feats AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS f_len500,
         CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+', 0)) >= 90
              THEN 1 ELSE 0 END AS f_tok90,
         CASE WHEN regexp_matches(text, '[0-9]') THEN 1 ELSE 0 END
           AS f_digit,
         CASE WHEN n_chars >= 6 * len(regexp_extract_all(lower(text),
                                       '[a-z]+', 0))
              THEN 1 ELSE 0 END AS f_avg6
  FROM documents WHERE text IS NOT NULL
),
melt1 AS (
  SELECT 'len500' AS feature, CASE WHEN f_len500 != y THEN 1 ELSE 0 END
           AS mis FROM feats
  UNION ALL
  SELECT 'tok90', CASE WHEN f_tok90 != y THEN 1 ELSE 0 END FROM feats
  UNION ALL
  SELECT 'digit', CASE WHEN f_digit != y THEN 1 ELSE 0 END FROM feats
  UNION ALL
  SELECT 'avg6', CASE WHEN f_avg6 != y THEN 1 ELSE 0 END FROM feats
),
r1 AS (
  SELECT feature, CAST(sum(mis) AS BIGINT) AS err,
         CAST(count(*) AS BIGINT) AS n
  FROM melt1 GROUP BY feature
),
best1 AS (SELECT * FROM r1 ORDER BY err, feature LIMIT 1),
wts AS (
  SELECT f.*,
         CASE WHEN (CASE b.feature WHEN 'len500' THEN f.f_len500
                                   WHEN 'tok90' THEN f.f_tok90
                                   WHEN 'digit' THEN f.f_digit
                                   ELSE f.f_avg6 END) != f.y
              THEN 1 ELSE 0 END AS mis1,
         CASE WHEN (CASE b.feature WHEN 'len500' THEN f.f_len500
                                   WHEN 'tok90' THEN f.f_tok90
                                   WHEN 'digit' THEN f.f_digit
                                   ELSE f.f_avg6 END) != f.y
              THEN b.n - b.err ELSE b.err END AS w
  FROM feats f CROSS JOIN best1 b
),
melt2 AS (
  SELECT 'len500' AS feature, w,
         w * (CASE WHEN f_len500 != y THEN 1 ELSE 0 END) AS wmis FROM wts
  UNION ALL
  SELECT 'tok90', w, w * (CASE WHEN f_tok90 != y THEN 1 ELSE 0 END) FROM wts
  UNION ALL
  SELECT 'digit', w, w * (CASE WHEN f_digit != y THEN 1 ELSE 0 END) FROM wts
  UNION ALL
  SELECT 'avg6', w, w * (CASE WHEN f_avg6 != y THEN 1 ELSE 0 END) FROM wts
),
r2 AS (
  SELECT feature, CAST(sum(wmis) AS BIGINT) AS werr,
         CAST(sum(w) AS BIGINT) AS mass
  FROM melt2 GROUP BY feature
),
best2 AS (SELECT * FROM r2 ORDER BY werr, feature LIMIT 1),
halfmass AS (
  SELECT CAST(sum(CASE WHEN mis1 = 1 THEN w ELSE 0 END) AS BIGINT) AS mm,
         CAST(sum(w) AS BIGINT) AS tw
  FROM wts
)
SELECT CAST(1 AS BIGINT) AS round, b.feature,
       b.err AS err_raw, b.n AS mass_total,
       CAST(b.err * 1000000 // b.n AS BIGINT) AS err_ppm,
       CAST(CASE WHEN h.tw = 0 THEN 0
                 ELSE h.mm * 1000000 // h.tw END AS BIGINT)
         AS post_update_mis_mass_ppm
FROM best1 b CROSS JOIN halfmass h
UNION ALL
SELECT CAST(2 AS BIGINT), b2.feature, b2.werr, b2.mass,
       CAST(CASE WHEN b2.mass = 0 THEN 0
                 ELSE b2.werr * 1000000 // b2.mass END AS BIGINT),
       CAST(NULL AS BIGINT)
FROM best2 b2
ORDER BY round
"""


@_register("adaboost_two_round_stumps", _ADABOOST_ORACLE)
def adaboost_two_round_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of discrete AdaBoost over decision stumps with EXACT
    integer sample weights -- the boosting trick that makes it value-
    oracle-able: after round 1 picks the minimum-error stump (error
    e = err/n), the multiplicative update w <- w*(1-e)/e for
    misclassified rows reduces, for uniform initial weights, to the
    INTEGER assignment w = n-err (misclassified) / w = err (correct),
    under which the defining invariant of boosting -- the reweighted
    distribution puts EXACTLY half its mass on round 1's mistakes --
    value-checks as post_update_mis_mass_ppm = 500000 with no floats
    anywhere (mis mass = err*(n-err) of total 2*err*(n-err)). Round 2
    then re-scores all 4 stumps under the reweighted mass and reports
    the weighted-error order statistic that alpha_2 would be built
    from. The sequential-ensemble complement to the parallel
    `one_rule_classifier_eval` / `naive_bayes_lang_eval` family.
    Scale shape: two melt+agg passes (4 features each) over one scan,
    the argmin stump frames broadcast; weights never materialize as a
    shuffle key."""
    feats = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END").alias("y"),
            F.expr("CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END").alias(
                "f_len500"
            ),
            F.expr(
                "CASE WHEN size(regexp_extract_all(lower(text),"
                " '[a-z]+', 0)) >= 90 THEN 1 ELSE 0 END"
            ).alias("f_tok90"),
            F.expr(
                "CASE WHEN text RLIKE '[0-9]' THEN 1 ELSE 0 END"
            ).alias("f_digit"),
            F.expr(
                "CASE WHEN n_chars >= 6 * size(regexp_extract_all("
                "lower(text), '[a-z]+', 0)) THEN 1 ELSE 0 END"
            ).alias("f_avg6"),
        )
        .localCheckpoint(eager=False)
    )
    melt1 = feats.select(
        F.expr(
            "stack(4,"
            " 'len500', CASE WHEN f_len500 != y THEN 1 ELSE 0 END,"
            " 'tok90', CASE WHEN f_tok90 != y THEN 1 ELSE 0 END,"
            " 'digit', CASE WHEN f_digit != y THEN 1 ELSE 0 END,"
            " 'avg6', CASE WHEN f_avg6 != y THEN 1 ELSE 0 END)"
            " AS (feature, mis)"
        )
    )
    r1 = melt1.groupBy("feature").agg(
        F.sum("mis").cast("long").alias("err"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    best1 = r1.orderBy("err", "feature").limit(1)
    pick = (
        "CASE feature WHEN 'len500' THEN f_len500"
        " WHEN 'tok90' THEN f_tok90 WHEN 'digit' THEN f_digit"
        " ELSE f_avg6 END"
    )
    wts = (
        feats.crossJoin(F.broadcast(best1))
        .select(
            "y",
            "f_len500",
            "f_tok90",
            "f_digit",
            "f_avg6",
            F.expr(
                f"CASE WHEN ({pick}) != y THEN 1 ELSE 0 END"
            ).alias("mis1"),
            F.expr(
                f"CASE WHEN ({pick}) != y THEN n - err ELSE err END"
            ).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    melt2 = wts.select(
        F.expr(
            "stack(4,"
            " 'len500', w * (CASE WHEN f_len500 != y THEN 1 ELSE 0 END),"
            " 'tok90', w * (CASE WHEN f_tok90 != y THEN 1 ELSE 0 END),"
            " 'digit', w * (CASE WHEN f_digit != y THEN 1 ELSE 0 END),"
            " 'avg6', w * (CASE WHEN f_avg6 != y THEN 1 ELSE 0 END))"
            " AS (feature, wmis)"
        ),
        "w",
    )
    r2 = melt2.groupBy("feature").agg(
        F.sum("wmis").cast("long").alias("werr"),
        F.sum("w").cast("long").alias("mass"),
    )
    best2 = r2.orderBy("werr", "feature").limit(1)
    halfmass = wts.agg(
        F.sum(F.expr("CASE WHEN mis1 = 1 THEN w ELSE 0 END"))
        .cast("long")
        .alias("mm"),
        F.sum("w").cast("long").alias("tw"),
    )
    row1 = (
        best1.crossJoin(F.broadcast(halfmass))
        .select(
            F.lit(1).cast("long").alias("round"),
            "feature",
            F.col("err").alias("err_raw"),
            F.col("n").alias("mass_total"),
            F.expr("CAST(err * 1000000 div n AS BIGINT)").alias("err_ppm"),
            F.expr(
                "CAST(CASE WHEN tw = 0 THEN 0"
                " ELSE mm * 1000000 div tw END AS BIGINT)"
            ).alias("post_update_mis_mass_ppm"),
        )
    )
    row2 = best2.select(
        F.lit(2).cast("long").alias("round"),
        "feature",
        F.col("werr").alias("err_raw"),
        F.col("mass").alias("mass_total"),
        F.expr(
            "CAST(CASE WHEN mass = 0 THEN 0"
            " ELSE werr * 1000000 div mass END AS BIGINT)"
        ).alias("err_ppm"),
        F.lit(None).cast("long").alias("post_update_mis_mass_ppm"),
    )
    return row1.unionByName(row2).orderBy("round")


_FEATHASH_ORACLE = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS term
  FROM documents WHERE text IS NOT NULL
),
freq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY term
),
hashed AS (
  SELECT term, f,
         CAST(CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % 4096
              AS BIGINT) AS bucket
  FROM freq
),
per_bucket AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS k, CAST(sum(f) AS BIGINT) AS m
  FROM hashed GROUP BY bucket
),
tot AS (
  SELECT CAST(sum(f) AS BIGINT) AS total_mass,
         CAST(count(*) AS BIGINT) AS n_terms
  FROM freq
),
hist AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(m) AS BIGINT) AS token_mass
  FROM per_bucket GROUP BY k
  UNION ALL
  SELECT 0, CAST(4096 - (SELECT count(*) FROM per_bucket) AS BIGINT),
         CAST(0 AS BIGINT)
)
SELECT h.k AS terms_per_bucket, h.n_buckets,
       CAST(h.k * h.n_buckets AS BIGINT) AS n_terms,
       h.token_mass,
       CAST(h.token_mass * 1000000 // t.total_mass AS BIGINT) AS mass_ppm,
       CAST(CASE WHEN h.k >= 2 THEN h.token_mass ELSE 0 END * 1000000
            // t.total_mass AS BIGINT) AS collided_mass_ppm
FROM hist h CROSS JOIN tot t
ORDER BY terms_per_bucket
"""


@_register("feature_hashing_collision_audit", _FEATHASH_ORACLE)
def feature_hashing_collision_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The hashing-trick audit: vocabulary terms hash into 4096 feature
    buckets through a portable md5 lane, and the entry reports the
    bucket-occupancy histogram (how many buckets hold exactly k
    distinct terms) together with the TOKEN MASS riding collided
    buckets in exact ppm -- the quantity that decides whether
    hash-featurization is safe at this dimensionality, since a
    collision only corrupts a model in proportion to the frequency
    mass it merges (Zipf implies most mass sits in the rare-collision
    head; `zipf_rank_frequency_audit` quantifies that skew). The k=0
    row closes the histogram (sum of n_buckets = 4096), making the
    occupancy distribution itself the birthday-problem observable.
    Scale shape: one token explode + term rollup (the vocabulary
    frame), one 4096-key rollup, one broadcast total; the audit never
    touches per-document state."""
    freq = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .localCheckpoint(eager=False)
    )
    per_bucket = (
        freq.select(
            "f",
            F.expr(
                "CAST(CAST(conv(substr(md5(term), 1, 8), 16, 10) AS BIGINT)"
                " % 4096 AS BIGINT)"
            ).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("f").cast("long").alias("m"),
        )
    ).localCheckpoint(eager=False)
    tot = freq.agg(
        F.sum("f").cast("long").alias("total_mass"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    used = per_bucket.agg(F.count(F.lit(1)).cast("long").alias("used"))
    hist = (
        per_bucket.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("m").cast("long").alias("token_mass"),
        )
        .unionByName(
            used.select(
                F.lit(0).cast("long").alias("k"),
                F.expr("CAST(4096 - used AS BIGINT)").alias("n_buckets"),
                F.lit(0).cast("long").alias("token_mass"),
            )
        )
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").alias("terms_per_bucket"),
            "n_buckets",
            F.expr("CAST(k * n_buckets AS BIGINT)").alias("n_terms"),
            "token_mass",
            F.expr(
                "CAST(token_mass * 1000000 div total_mass AS BIGINT)"
            ).alias("mass_ppm"),
            F.expr(
                "CAST((CASE WHEN k >= 2 THEN token_mass ELSE 0 END)"
                " * 1000000 div total_mass AS BIGINT)"
            ).alias("collided_mass_ppm"),
        )
        .orderBy("terms_per_bucket")
    )


_HUFFMAN_ORACLE = """
WITH freq AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS w FROM events GROUP BY 1
),
nodes AS (
  SELECT list_sort(list({'w': w, 's': '|' || event_type || '|'})) AS a,
         CAST(sum(w) AS BIGINT) AS total_mass,
         CAST(count(*) AS BIGINT) AS n_symbols
  FROM freq
),
m1 AS (
  SELECT total_mass, n_symbols,
         list_sort(list_concat(a[3:],
           [{'w': a[1].w + a[2].w, 's': a[1].s || a[2].s}])) AS a,
         [a[1].s || a[2].s] AS log
  FROM nodes
),
m2 AS (
  SELECT total_mass, n_symbols,
         list_sort(list_concat(a[3:],
           [{'w': a[1].w + a[2].w, 's': a[1].s || a[2].s}])) AS a,
         list_concat(log, [a[1].s || a[2].s]) AS log
  FROM m1
),
m3 AS (
  SELECT total_mass, n_symbols,
         list_sort(list_concat(a[3:],
           [{'w': a[1].w + a[2].w, 's': a[1].s || a[2].s}])) AS a,
         list_concat(log, [a[1].s || a[2].s]) AS log
  FROM m2
),
m4 AS (
  SELECT total_mass, n_symbols,
         list_concat(log, [a[1].s || a[2].s]) AS log
  FROM m3
)
SELECT f.event_type, f.w,
       CAST(len(list_filter(m.log,
            s -> contains(s, '|' || f.event_type || '|'))) AS BIGINT)
         AS code_len,
       CAST(f.w * len(list_filter(m.log,
            s -> contains(s, '|' || f.event_type || '|'))) AS BIGINT)
         AS weighted_bits,
       m.total_mass,
       CAST(3 * m.total_mass AS BIGINT) AS fixed_cost_bits
FROM freq f CROSS JOIN m4 m
ORDER BY f.event_type
"""


@_register("huffman_code_audit", _HUFFMAN_ORACLE)
def huffman_code_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huffman coding executed INSIDE the query plan: the 5-symbol
    event-type alphabet collapses through 4 greedy min-merge rounds
    simulated on a sorted array-of-structs (each round pops the two
    lightest nodes, pushes their merge, and logs the merged member
    set; per-symbol code length = how many merges its sentinel
    '|type|' participates in) -- deterministic across engines because
    ties break on the (weight, members) struct order both array sorts
    share. The per-symbol lengths satisfy sum(w * len) = sum of merge
    weights (the Huffman cost identity) and undercut the 3-bit fixed
    code (fixed_cost_bits column), giving `shannon_fano_code_length`
    its optimal baseline: SF is within 1 bit/symbol of this, Huffman
    IS the optimum, and both are value-oracled. Scale shape: one
    mergeable frequency agg; the tree simulation runs on a 1-row
    5-element array -- alphabet-sized, data-volume-free."""
    freq = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint(eager=False)
    )
    merge = (
        "array_sort(concat(slice(a, 3, size(a) - 2),"
        " array(named_struct('w', a[0].w + a[1].w,"
        " 's', a[0].s || a[1].s))))"
    )
    logstep = "array(a[0].s || a[1].s)"
    nodes = freq.agg(
        F.expr(
            "array_sort(collect_list(named_struct('w', w,"
            " 's', '|' || event_type || '|')))"
        ).alias("a"),
        F.sum("w").cast("long").alias("total_mass"),
        F.count(F.lit(1)).cast("long").alias("n_symbols"),
    )
    m1 = nodes.select(
        "total_mass",
        "n_symbols",
        F.expr(merge).alias("a"),
        F.expr(logstep).alias("log"),
    )
    m2 = m1.select(
        "total_mass",
        "n_symbols",
        F.expr(merge).alias("a"),
        F.expr(f"concat(log, {logstep})").alias("log"),
    )
    m3 = m2.select(
        "total_mass",
        "n_symbols",
        F.expr(merge).alias("a"),
        F.expr(f"concat(log, {logstep})").alias("log"),
    )
    m4 = m3.select(
        "total_mass",
        "n_symbols",
        F.expr(f"concat(log, {logstep})").alias("log"),
    )
    return (
        freq.crossJoin(F.broadcast(m4))
        .select(
            "event_type",
            "w",
            F.expr(
                "CAST(size(filter(log,"
                " s -> contains(s, '|' || event_type || '|'))) AS BIGINT)"
            ).alias("code_len"),
            F.expr(
                "CAST(w * size(filter(log,"
                " s -> contains(s, '|' || event_type || '|'))) AS BIGINT)"
            ).alias("weighted_bits"),
            "total_mass",
            F.expr("CAST(3 * total_mass AS BIGINT)").alias(
                "fixed_cost_bits"
            ),
        )
        .orderBy("event_type")
    )


_RING_ORACLE = """
WITH ring AS (
  SELECT [{'h': CAST('0x' || substr(md5('vnode-' || CAST(j AS VARCHAR)),
                                    1, 8) AS BIGINT),
           'node': CAST(j % 8 AS BIGINT)}
          FOR j IN range(64)] AS arr
),
keys AS (
  SELECT c_custkey,
         CAST('0x' || substr(md5('ring:' || CAST(c_custkey AS VARCHAR)),
                             1, 8) AS BIGINT) AS kh
  FROM customer
),
assigned AS (
  SELECT k.c_custkey,
         CASE WHEN len([x FOR x IN r.arr IF x.h >= k.kh]) > 0
              THEN list_sort([x FOR x IN r.arr IF x.h >= k.kh])[1].node
              ELSE list_sort(r.arr)[1].node END AS before_node,
         CASE WHEN len([x FOR x IN r.arr
                        IF x.node != 7 AND x.h >= k.kh]) > 0
              THEN list_sort([x FOR x IN r.arr
                              IF x.node != 7 AND x.h >= k.kh])[1].node
              ELSE list_sort([x FOR x IN r.arr IF x.node != 7])[1].node
         END AS after_node
  FROM keys k CROSS JOIN ring r
)
SELECT before_node AS node,
       CAST(count(*) AS BIGINT) AS n_before,
       CAST(sum(CASE WHEN after_node = before_node THEN 1 ELSE 0 END)
            AS BIGINT) AS n_stayed,
       CAST(sum(CASE WHEN after_node != before_node THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved_out,
       CAST((SELECT count(*) FROM assigned a2
             WHERE a2.after_node = assigned.before_node
               AND a2.before_node != a2.after_node) AS BIGINT) AS n_gained
FROM assigned
GROUP BY before_node
ORDER BY node
"""


@_register("consistent_hash_ring_rebalance", _RING_ORACLE)
def consistent_hash_ring_rebalance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Consistent-hash ring with 64 virtual nodes over 8 physical
    nodes, executing the MINIMAL-MOVEMENT proof when node 7 is
    decommissioned: each key binds to its clockwise-successor vnode
    (first ring hash >= key hash, wrapping to the ring minimum), and
    the entry recomputes assignments on the 56-vnode survivor ring --
    value-checking that ONLY keys resident on node 7 move
    (n_moved_out = n_before for node 7, 0 for everyone else) and that
    its keys scatter across survivors rather than dogpiling one
    (n_gained per node), the property that makes ring hashing the
    shard-topology change protocol (the successor-scan counterpart of
    `rendezvous_shard_rebalance`'s HRW argmax). The ring is built
    once as a 64-struct array and broadcast; successor lookup is an
    array filter+sort on that constant, exact under the shared md5
    lane. Scale shape: embarrassingly parallel per-key expressions +
    one 8-key rollup; no shuffle touches the ring itself."""
    ring = spark.range(1).select(
        F.expr(
            "transform(sequence(0, 63), j -> named_struct("
            "'h', CAST(conv(substr(md5('vnode-' || CAST(j AS STRING)),"
            " 1, 8), 16, 10) AS BIGINT),"
            " 'node', CAST(j % 8 AS BIGINT)))"
        ).alias("arr")
    )
    keys = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(
            "CAST(conv(substr(md5('ring:' || CAST(c_custkey AS STRING)),"
            " 1, 8), 16, 10) AS BIGINT)"
        ).alias("kh"),
    )
    succ_all = (
        "CASE WHEN size(filter(arr, x -> x.h >= kh)) > 0"
        " THEN array_sort(filter(arr, x -> x.h >= kh))[0].node"
        " ELSE array_sort(arr)[0].node END"
    )
    succ_drop = (
        "CASE WHEN size(filter(arr, x -> x.node != 7 AND x.h >= kh)) > 0"
        " THEN array_sort(filter(arr,"
        " x -> x.node != 7 AND x.h >= kh))[0].node"
        " ELSE array_sort(filter(arr, x -> x.node != 7))[0].node END"
    )
    assigned = (
        keys.crossJoin(F.broadcast(ring))
        .select(
            F.expr(succ_all).alias("before_node"),
            F.expr(succ_drop).alias("after_node"),
        )
        .localCheckpoint(eager=False)
    )
    gained = (
        assigned.filter(F.col("before_node") != F.col("after_node"))
        .groupBy(F.col("after_node").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_gained"))
    )
    return (
        assigned.groupBy(F.col("before_node").alias("node"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_before"),
            F.sum(
                F.expr(
                    "CASE WHEN after_node = before_node THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_stayed"),
            F.sum(
                F.expr(
                    "CASE WHEN after_node != before_node THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_moved_out"),
        )
        .join(F.broadcast(gained), "node", "left")
        .select(
            "node",
            "n_before",
            "n_stayed",
            "n_moved_out",
            F.coalesce("n_gained", F.lit(0)).cast("long").alias("n_gained"),
        )
        .orderBy("node")
    )


_CROSTON_ORACLE = """
WITH demand AS (
  SELECT p.p_brand, CAST(l.l_shipdate AS DATE) AS day,
         CAST(sum(l.l_quantity) AS BIGINT) AS z
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
seq AS (
  SELECT p_brand, day, z,
         CAST(date_diff('day',
              lag(day) OVER (PARTITION BY p_brand ORDER BY day), day)
              AS BIGINT) AS gap,
         row_number() OVER (PARTITION BY p_brand ORDER BY day DESC) AS rn,
         CAST(count(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n_obs,
         max(day) OVER (PARTITION BY p_brand) AS last_day
  FROM demand
),
win AS (SELECT * FROM seq WHERE rn <= 8),
sm AS (
  SELECT p_brand, any_value(n_obs) AS n_obs, any_value(last_day) AS last_day,
         CAST(sum(([250,188,141,105,79,59,45,33])[rn] * z) AS BIGINT) AS wz,
         CAST(sum(([250,188,141,105,79,59,45,33])[rn]) AS BIGINT) AS wzs,
         CAST(sum(CASE WHEN gap IS NOT NULL
                       THEN ([250,188,141,105,79,59,45,33])[rn] * gap
                       ELSE 0 END) AS BIGINT) AS wq,
         CAST(sum(CASE WHEN gap IS NOT NULL
                       THEN ([250,188,141,105,79,59,45,33])[rn]
                       ELSE 0 END) AS BIGINT) AS wqs
  FROM win GROUP BY p_brand
)
SELECT p_brand, n_obs, last_day,
       CAST(wz * 1000 // wzs AS BIGINT) AS z_hat_milli,
       CAST(CASE WHEN wqs = 0 THEN 0 ELSE wq * 1000 // wqs END AS BIGINT)
         AS q_hat_milli,
       CAST(CASE WHEN wqs = 0 OR wq = 0 THEN 0
                 ELSE (wz * 1000 // wzs) * 1000 // (wq * 1000 // wqs)
            END AS BIGINT) AS croston_rate_milli
FROM sm
ORDER BY p_brand
"""


@_register("croston_intermittent_forecast", _CROSTON_ORACLE)
def croston_intermittent_forecast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Croston's method for intermittent demand -- the forecaster the
    `part_demand_intermittency` classifier routes lumpy series to,
    where plain EWMA biases toward zero: smooth the NONZERO demand
    sizes and the INTER-DEMAND gaps separately, forecast rate =
    size/gap. Both smoothers are the truncated-EWMA integer lane
    (alpha = 1/4 over the 8 most recent observations; weights are the
    shared milli literal [250,188,...] = 250*(3/4)^k), so z_hat,
    q_hat and the per-day demand rate are exact integers at the
    forecast origin. Scale shape: one (brand, day) rollup, one
    recency-window pass per brand (all windows share the brand
    partitioning), one mergeable weighted agg -- no recursion, no
    state, the closed-form truncation that makes EWMA
    distributable."""
    demand = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", F.expr("CAST(l_shipdate AS DATE)").alias("day"))
        .agg(F.expr("CAST(sum(l_quantity) AS BIGINT)").alias("z"))
    )
    wb = W.partitionBy("p_brand")
    seq = demand.select(
        "p_brand",
        "day",
        "z",
        F.expr(
            "CAST(datediff(day, lag(day) OVER"
            " (PARTITION BY p_brand ORDER BY day)) AS BIGINT)"
        ).alias("gap"),
        F.row_number().over(wb.orderBy(F.col("day").desc())).alias("rn"),
        F.count(F.lit(1)).over(wb).cast("long").alias("n_obs"),
        F.max("day").over(wb).alias("last_day"),
    )
    warr = "array(250,188,141,105,79,59,45,33)"
    sm = (
        seq.filter(F.col("rn") <= 8)
        .groupBy("p_brand")
        .agg(
            F.first("n_obs").alias("n_obs"),
            F.first("last_day").alias("last_day"),
            F.expr(
                f"CAST(sum(element_at({warr}, rn) * z) AS BIGINT)"
            ).alias("wz"),
            F.expr(f"CAST(sum(element_at({warr}, rn)) AS BIGINT)").alias(
                "wzs"
            ),
            F.expr(
                f"CAST(sum(CASE WHEN gap IS NOT NULL THEN"
                f" element_at({warr}, rn) * gap ELSE 0 END) AS BIGINT)"
            ).alias("wq"),
            F.expr(
                f"CAST(sum(CASE WHEN gap IS NOT NULL THEN"
                f" element_at({warr}, rn) ELSE 0 END) AS BIGINT)"
            ).alias("wqs"),
        )
    )
    return sm.select(
        "p_brand",
        "n_obs",
        "last_day",
        F.expr("CAST(wz * 1000 div wzs AS BIGINT)").alias("z_hat_milli"),
        F.expr(
            "CAST(CASE WHEN wqs = 0 THEN 0 ELSE wq * 1000 div wqs END"
            " AS BIGINT)"
        ).alias("q_hat_milli"),
        F.expr(
            "CAST(CASE WHEN wqs = 0 OR wq = 0 THEN 0"
            " ELSE (wz * 1000 div wzs) * 1000 div (wq * 1000 div wqs)"
            " END AS BIGINT)"
        ).alias("croston_rate_milli"),
    ).orderBy("p_brand")
