from nyc_taxi_data_pipeline_spark.sources.catalog import TABLES, load_table, register_views
from nyc_taxi_data_pipeline_spark.sources import io

__all__ = ["TABLES", "load_table", "register_views", "io"]
