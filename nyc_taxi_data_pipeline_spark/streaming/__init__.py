from nyc_taxi_data_pipeline_spark.streaming import cdc, sinks

__all__ = ["cdc", "sinks"]
