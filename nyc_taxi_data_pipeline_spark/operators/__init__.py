from nyc_taxi_data_pipeline_spark.operators import (  # noqa: F401
    aggregate,
    dedup,
    enrich,
    normalize,
    quality,
    similarity,
    textstats,
    warehouse,
)

__all__ = [
    "aggregate",
    "dedup",
    "enrich",
    "normalize",
    "quality",
    "similarity",
    "textstats",
    "warehouse",
]
