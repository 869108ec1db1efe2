from nyc_taxi_data_pipeline_spark.operators import (  # noqa: F401
    aggregate,
    dedup,
    enrich,
    graph,
    multimodal,
    normalize,
    quality,
    similarity,
    skew,
    temporal,
    textstats,
    warehouse,
)

__all__ = [
    "aggregate",
    "dedup",
    "enrich",
    "graph",
    "multimodal",
    "normalize",
    "quality",
    "similarity",
    "skew",
    "temporal",
    "textstats",
    "warehouse",
]
