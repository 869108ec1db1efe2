"""PySpark-native analytics engine with the query/data-processing
capabilities of the Giang2003/NYC_taxi_data_pipeline reference.

Brand-new, idiomatic-Spark design (DataFrame/SQL + Catalyst + Structured
Streaming) — not a port. See SURVEY.md for the operator inventory this
package re-expresses (§2) and the build plan (§7).

Layout:
    session      SparkSession factory tuned for scale (AQE, Arrow, pruning).
    sources      readers/writers for the lake zones (parquet/csv/json/jdbc/delta).
    functions    scalar expression recipes (surrogate keys, decodes, text, vectors).
    operators    relational + LLM-data-pipeline operators (normalize, enrich,
                 aggregate, warehouse, quality, dedup, similarity, textstats).
    plans        the analytic query catalog exposed via __spark_entry__.
    streaming    CDC decode + streaming sources/sinks.
"""

from nyc_taxi_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
