"""Staging aggregation (SURVEY.md §2.4, A1/A2).

The reference's batch core: a 14-key groupBy with 10 SUM measures
(batch_processing/datalake_to_dw.py:104-130), made schema-adaptive in the
optimized job (batch_processing_optimized.py:136-171 — lat/long keys only
when present, missing measures defaulted to lit(0)).

Scale note: grouping on near-unique keys (the reference includes both
timestamps) makes this effectively a dedup-sum — partial aggregation barely
reduces data, so the shuffle carries ~full input. We keep the contract but
expose `group_keys` so callers can aggregate at coarser grain when they
don't need row-level identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.functions import scalar

# A1 canonical grouping keys (datalake_to_dw.py:104-130).
BASE_GROUP_KEYS: tuple[str, ...] = (
    "year",
    "month",
    "dow",
    "vendor_id",
    "rate_code_id",
    "pickup_location_id",
    "dropoff_location_id",
    "payment_type_id",
    "pickup_datetime",
    "dropoff_datetime",
)
OPTIONAL_GROUP_KEYS: tuple[str, ...] = (
    "pickup_latitude",
    "pickup_longitude",
    "dropoff_latitude",
    "dropoff_longitude",
)
MEASURES: tuple[str, ...] = (
    "passenger_count",
    "trip_distance",
    "extra",
    "mta_tax",
    "fare_amount",
    "tip_amount",
    "tolls_amount",
    "total_amount",
    "improvement_surcharge",
    "congestion_surcharge",
)


def derive_time_dims(df: DataFrame, ts_col: str = "pickup_datetime") -> DataFrame:
    """F1-F3: year/month/dow derivation (datalake_to_dw.py:100-102),
    locale-stable (SURVEY.md §7.4 risk 7)."""
    return (
        df.withColumn("year", scalar.year_of(ts_col).cast("string"))
        .withColumn("month", scalar.month_name(ts_col))
        .withColumn("dow", scalar.day_name(ts_col))
    )


def staging_aggregate(
    df: DataFrame,
    service_type: int = 1,
    group_keys: tuple[str, ...] | None = None,
) -> DataFrame:
    """A2 schema-adaptive aggregation: group on whichever canonical keys are
    present, SUM each measure (absent measures default to lit(0), matching
    batch_processing_optimized.py:156-169), stamp service_type (F6).

    One shuffle on the grouping keys; Catalyst plans partial+final
    HashAggregate automatically.
    """
    present = set(df.columns)
    if group_keys is None:
        group_keys = tuple(
            k for k in BASE_GROUP_KEYS + OPTIONAL_GROUP_KEYS if k in present
        )
    aggs = []
    for m in MEASURES:
        src = F.col(m) if m in present else F.lit(0.0)
        aggs.append(F.sum(src).alias(m))
    out = df.groupBy(*group_keys).agg(*aggs)
    return out.withColumn("service_type", F.lit(service_type))
