"""Lookup-dimension enrichment join (SURVEY.md §2.3, J1).

The reference enriches trips with the taxi-zone lookup twice — pickup and
dropoff — via pandas inner merges (scripts/transform_data.py:39-64), which
silently drop trips whose location id is missing from the lookup. Here it is
an explicit broadcast hash join: the lookup is ~265 rows, so at 100 TB of
trips the join is a map-side operation with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_lookup(
    trips: DataFrame,
    lookup: DataFrame,
    key: str,
    lookup_key: str,
    carry: dict[str, str],
    how: str = "inner",
) -> DataFrame:
    """Join `trips.key == lookup.lookup_key`, carry renamed lookup columns,
    drop the join key and everything else from the lookup side.

    `carry` maps lookup column → output name (e.g. {"latitude":
    "pickup_latitude"}). Inner default preserves the reference's
    drop-unmatched contract (J1); pass how='left' for the safer variant.
    """
    carried = [F.col(src).alias(dst) for src, dst in carry.items()]
    slim = lookup.select(F.col(lookup_key).alias("__lk"), *carried)
    out = trips.join(F.broadcast(slim), trips[key] == F.col("__lk"), how)
    return out.drop("__lk")


def enrich_pickup_dropoff(
    trips: DataFrame,
    zone_lookup: DataFrame,
    pickup_key: str = "pickup_location_id",
    dropoff_key: str = "dropoff_location_id",
) -> DataFrame:
    """The reference's double enrichment (merge_and_rename applied for PU
    then DO, transform_data.py:54-58): carry lat/long under pickup_*/
    dropoff_* names. Two broadcast joins — still zero shuffles."""
    out = enrich_with_lookup(
        trips,
        zone_lookup,
        key=pickup_key,
        lookup_key="LocationID",
        carry={"latitude": "pickup_latitude", "longitude": "pickup_longitude"},
    )
    return enrich_with_lookup(
        out,
        zone_lookup,
        key=dropoff_key,
        lookup_key="LocationID",
        carry={"latitude": "dropoff_latitude", "longitude": "dropoff_longitude"},
    )
