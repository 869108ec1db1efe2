"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query on /root/testdata/sf0.001 (smoke check).
queries()     — name → (spark, sf_dir) → DataFrame, one per implemented
                operator/query from SURVEY.md §2 (+ LLM-pipeline extensions).
oracle_sql()  — name → equivalent DuckDB SQL over the same parquet tables.

The real catalog lives in nyc_taxi_data_pipeline_spark.plans.queries; this
module is the thin adapter the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shape pricing summary) on sf0.001."""
    return REGISTRY["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
