"""Star-schema builders (SURVEY.md §2.3 J2, §2.4 A3, §2.8 F9/F10, §2.6 O1).

Replaces the reference's dbt-on-Postgres layer (nyc_taxi/models/production/
*.sql — 6 dims + 1 fact) with Spark SQL/DataFrame builders. Surrogate keys
keep dbt_utils-0.8.0 byte parity (functions.scalar.surrogate_key); the
missing dbt decode macros are reconstructed from the public TLC dictionary
(functions.scalar.*_DESCRIPTIONS).

Scale design: every dim is tiny (≤few hundred rows) → the fact-dim joins
are all broadcast hash joins, zero shuffle on the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.functions import scalar


def build_dim(
    staging: DataFrame,
    key_cols: list[str],
    surrogate_name: str,
    decode_col: str | None = None,
    decode_map: dict | None = None,
    decode_name: str | None = None,
    domain_filter=None,
    order_by: str | None = None,
) -> DataFrame:
    """Generic dim model: SELECT DISTINCT keys WHERE key IS NOT NULL
    [AND domain] + surrogate key + optional decode + ORDER BY
    (reference: dim_vendor.sql / dim_rate_code.sql / dim_payment.sql shape).
    """
    cond = F.col(key_cols[0]).isNotNull()
    for c in key_cols[1:]:
        cond = cond & F.col(c).isNotNull()
    if domain_filter is not None:
        cond = cond & domain_filter
    out = staging.filter(cond).select(*key_cols).distinct()
    out = out.select(
        scalar.surrogate_key(*key_cols).alias(surrogate_name), *key_cols
    )
    if decode_col is not None and decode_map is not None:
        out = out.withColumn(
            decode_name or f"{decode_col}_description",
            scalar.decode(decode_col, decode_map),
        )
    return out.orderBy(order_by or key_cols[0])


def dim_vendor(staging: DataFrame) -> DataFrame:
    """dim_vendor.sql:3-23 — domain filter vendor_id < 3."""
    return build_dim(
        staging,
        ["vendor_id"],
        "vendor_key",
        decode_col="vendor_id",
        decode_map=scalar.VENDOR_DESCRIPTIONS,
        decode_name="vendor_description",
        domain_filter=F.col("vendor_id").cast("int") < 3,
    )


def dim_rate_code(staging: DataFrame) -> DataFrame:
    """dim_rate_code.sql:3-23 — domain filter rate_code_id < 7."""
    return build_dim(
        staging,
        ["rate_code_id"],
        "rate_code_key",
        decode_col="rate_code_id",
        decode_map=scalar.RATE_CODE_DESCRIPTIONS,
        decode_name="rate_code_description",
        domain_filter=F.col("rate_code_id").cast("int") < 7,
    )


def dim_payment(staging: DataFrame) -> DataFrame:
    """dim_payment.sql:3-21."""
    return build_dim(
        staging,
        ["payment_type_id"],
        "payment_type_key",
        decode_col="payment_type_id",
        decode_map=scalar.PAYMENT_DESCRIPTIONS,
        decode_name="payment_description",
    )


def dim_service_type(staging: DataFrame) -> DataFrame:
    """dim_service_type.sql:3-20."""
    return build_dim(
        staging,
        ["service_type"],
        "service_type_key",
        decode_col="service_type",
        decode_map=scalar.SERVICE_DESCRIPTIONS,
        decode_name="service_name",
    )


def dim_location(staging: DataFrame, prefix: str) -> DataFrame:
    """dim_pickup_location.sql / dim_dropoff_location.sql:3-21 — id +
    lat/long when staging carries coordinates.

    Reference null semantics are asymmetric and preserved exactly: the CTE
    filters `vendor_id IS NOT NULL` BEFORE the distinct, the outer query
    filters `{prefix}_location_id IS NOT NULL` — but null lat/long rows
    are KEPT (dim_pickup_location.sql:10-11,18-19). build_dim's
    all-columns-not-null contract would silently drop them, so the filter
    is built here instead."""
    cols = [f"{prefix}_location_id", f"{prefix}_latitude", f"{prefix}_longitude"]
    present = [c for c in cols if c in staging.columns]
    id_col = f"{prefix}_location_id"
    cond = F.col(id_col).isNotNull()
    if "vendor_id" in staging.columns:
        cond = F.col("vendor_id").isNotNull() & cond
    distinct = staging.filter(cond).select(*present).distinct()
    return distinct.select(
        scalar.surrogate_key(*present).alias(f"{prefix}_location_key"), *present
    ).orderBy(id_col)


def fact_trip(
    staging: DataFrame,
    vendor: DataFrame,
    rate_code: DataFrame,
    payment: DataFrame,
    measures: tuple[str, ...] = (
        "passenger_count",
        "trip_distance",
        "fare_amount",
        "extra",
        "mta_tax",
        "tip_amount",
        "tolls_amount",
        "improvement_surcharge",
        "total_amount",
        "congestion_surcharge",
    ),
) -> DataFrame:
    """fact_trip.sql:6-39 — 8-column surrogate trip_id, inner joins to the
    three filtered dims (inner = the dims' domain filters act as semi-joins,
    SURVEY.md J2). All three dim joins broadcast."""
    trip_id = scalar.surrogate_key(
        "vendor_id",
        "rate_code_id",
        "pickup_location_id",
        "dropoff_location_id",
        "payment_type_id",
        "service_type",
        "pickup_datetime",
        "dropoff_datetime",
    ).alias("trip_id")
    joined = (
        staging.join(F.broadcast(vendor.select("vendor_key", "vendor_id")), "vendor_id")
        .join(
            F.broadcast(rate_code.select("rate_code_key", "rate_code_id")),
            "rate_code_id",
        )
        .join(
            F.broadcast(payment.select("payment_type_key", "payment_type_id")),
            "payment_type_id",
        )
    )
    present_measures = [m for m in measures if m in staging.columns]
    return joined.select(
        trip_id,
        "vendor_key",
        "rate_code_key",
        "payment_type_key",
        "pickup_datetime",
        "dropoff_datetime",
        *present_measures,
    )


def build_star(staging: DataFrame) -> dict[str, DataFrame]:
    """Materialize the full star: 6 dims + fact, dbt-DAG order
    (dims before fact — SURVEY.md §3.3)."""
    dims = {
        "dim_vendor": dim_vendor(staging),
        "dim_rate_code": dim_rate_code(staging),
        "dim_payment": dim_payment(staging),
        "dim_service_type": dim_service_type(staging),
        "dim_pickup_location": dim_location(staging, "pickup"),
        "dim_dropoff_location": dim_location(staging, "dropoff"),
    }
    fact = fact_trip(
        staging, dims["dim_vendor"], dims["dim_rate_code"], dims["dim_payment"]
    )
    return {**dims, "fact_trip": fact}


def scd2_from_changelog(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 slowly-changing dimension from a change log: one row per
    (key, attribute-run) with [valid_from, valid_to) validity and an
    is_current flag — the dimension-versioning layer the reference's dbt
    star schema implies but never materializes.

    Two window passes over the same (key, ts) partitioning — Catalyst
    plans ONE shuffle + one sort for both (consecutive-duplicate
    compaction via lag, then validity bounds via lead). No self-join, no
    driver state; per-key memory is O(1), so skewed keys degrade
    gracefully. Late-arriving changes are handled by re-running over the
    affected keys (the output is a pure function of the log)."""
    from pyspark.sql import Window as W

    order = [F.col(ts_col), F.col(tiebreak_col)]
    w = W.partitionBy(key).orderBy(*order)
    changes = (
        df.withColumn("__prev", F.lag(attr_col).over(w))
        .filter(
            F.col("__prev").isNull() | (F.col(attr_col) != F.col("__prev"))
        )
        .drop("__prev")
    )
    w2 = W.partitionBy(key).orderBy(*order)
    return changes.select(
        F.col(key),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
