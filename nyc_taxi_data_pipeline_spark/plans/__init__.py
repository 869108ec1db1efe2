from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY, Query

__all__ = ["REGISTRY", "Query"]
