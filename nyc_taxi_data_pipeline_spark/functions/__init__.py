from nyc_taxi_data_pipeline_spark.functions import scalar, text, vector

__all__ = ["scalar", "text", "vector"]
