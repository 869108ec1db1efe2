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

from pyspark.sql import DataFrame, SparkSession
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


def write_partial_agg_zone(
    df: DataFrame,
    zone: str,
    keys: list[str],
    measures: list[str],
    batch_id: int,
) -> None:
    """Persist a batch's PARTIAL aggregate state (per-key decimal sums +
    counts) under `zone/batch=<id>` — the incremental-rollup pattern: each
    ingest aggregates only its own rows; history is never rescanned.

    The state is algebraic (sum/count), so partials merge by re-summing —
    avg and other derived measures are computed only at read time. Decimal
    accumulators make the merge order-independent, so any sequence of
    batch arrivals yields bit-identical totals."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.col(m).cast("decimal(38,6)")).alias(f"__sum_{m}") for m in measures
    ]
    df.groupBy(*keys).agg(*aggs).write.mode("overwrite").parquet(
        f"{zone}/batch={batch_id}"
    )


def read_merged_aggs(
    spark: SparkSession,
    zone: str,
    keys: list[str],
    measures: list[str],
) -> DataFrame:
    """Merge all persisted partials into final per-key totals + averages:
    (keys..., n_rows, sum_<m>, avg_<m>). Reading the partials shuffles
    |keys| rows per batch — at 100 TB that is orders of magnitude smaller
    than the raw data the naive full recompute would rescan."""
    parts = spark.read.parquet(f"{zone}/batch=*")
    merged = parts.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        *[F.sum(f"__sum_{m}").alias(f"__tot_{m}") for m in measures],
    )
    out_cols = [*keys, F.col("n_rows")]
    for m in measures:
        out_cols.append(
            F.round(F.col(f"__tot_{m}"), 2).cast("double").alias(f"sum_{m}")
        )
        out_cols.append(
            F.round(
                F.col(f"__tot_{m}").cast("double") / F.col("n_rows"), 6
            ).alias(f"avg_{m}")
        )
    return merged.select(*out_cols)
