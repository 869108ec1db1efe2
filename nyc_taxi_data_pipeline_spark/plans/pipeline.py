"""The reference's batch ELT lifecycle (SURVEY.md §3.1) as ONE composed job
with real zone writes:

    raw trips → processed zone (normalize, partitioned parquet)
              → staging zone  (time dims + A1/A2 aggregate)
              → warehouse zone (6 dims + fact, dbt-DAG order)
              → quality gate on staging

The reference runs this as four processes (python → pandas → Spark → dbt)
with Postgres round-trips between them; here each zone transition is one
lazy Catalyst plan ending in a distributed parquet write. Airflow's task
ordering (elt_pipeline_optimized_dag.py:167-207) becomes plain function
composition — the DAG is the data dependency.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.operators.aggregate import (
    derive_time_dims,
    staging_aggregate,
)
from nyc_taxi_data_pipeline_spark.operators.normalize import normalize
from nyc_taxi_data_pipeline_spark.operators.quality import (
    Rule,
    between_rule,
    check,
    not_null_rule,
)
from nyc_taxi_data_pipeline_spark.operators.warehouse import build_star
from nyc_taxi_data_pipeline_spark.sources.io import (
    write_parquet,
    write_parquet_idempotent,
)

def staging_rules() -> list[Rule]:
    """The GX suite's shape (validate_trip_data.json:5-92), applied to
    staging. Built lazily — Column construction needs an active session."""
    return [
        not_null_rule("vendor_id"),
        not_null_rule("rate_code_id"),
        not_null_rule("pickup_location_id"),
        not_null_rule("dropoff_location_id"),
        not_null_rule("payment_type_id"),
        not_null_rule("service_type"),
        between_rule("trip_distance", 0, 100),
    ]


def run_batch_pipeline(
    spark: SparkSession,
    raw_trips: DataFrame,
    lake_dir: str,
    coerce_null_to_zero: bool = False,
) -> dict:
    """Execute the full raw→star lifecycle into `lake_dir`; returns zone
    paths, row counts, and the quality report.

    Writes are idempotent: processed/staging use dynamic partition
    overwrite (rerunning a month replaces that month, nothing else);
    warehouse tables are small rollups and overwrite atomically."""
    zones = {z: os.path.join(lake_dir, z) for z in ("processed", "staging", "warehouse")}
    counts: dict[str, int] = {}

    # raw → processed (P1-P6) — month-grain partitions: coarse enough to
    # avoid small-file explosion, fine enough for pruning; repartition on
    # the partition key so each partition lands as one file instead of one
    # per task (at cluster scale: repartition(n, key) for n files each)
    processed = normalize(raw_trips, coerce_null_to_zero=coerce_null_to_zero)
    processed = processed.withColumn(
        "pickup_month", F.date_format("pickup_datetime", "yyyy-MM")
    ).repartition("pickup_month")
    write_parquet_idempotent(processed, zones["processed"], ["pickup_month"])
    processed_back = spark.read.parquet(zones["processed"]).drop("pickup_month")
    counts["processed"] = processed_back.count()

    # processed → staging (F1-F3 + A1/A2) — partitioned by year
    staging = staging_aggregate(
        derive_time_dims(processed_back, "pickup_datetime")
    ).repartition("year")
    write_parquet_idempotent(staging, zones["staging"], ["year"])
    staging_back = spark.read.parquet(zones["staging"]).withColumn(
        "year", F.col("year").cast("string")
    )
    counts["staging"] = staging_back.count()

    # staging → star (dims before fact, like the dbt DAG)
    star = build_star(staging_back)
    for name, table in star.items():
        write_parquet(table, os.path.join(zones["warehouse"], name))
        counts[name] = spark.read.parquet(os.path.join(zones["warehouse"], name)).count()

    # quality gate (the GX checkpoint, §2.11) — evaluated on the zone we wrote
    quality = check(staging_back, staging_rules())

    return {"zones": zones, "counts": counts, "quality": quality}
