"""Custom connector via the Python DataSource API (new in Spark 4).

The reference's ingestion edge is a Python feeder loop pushing rows at the
lake/broker (utils/streaming_data_db.py:48-58, utils/streaming_data_json.py:
46-74). Spark-first, that edge is a *partition-aware source*: implement
`DataSource`/`DataSourceReader`, and the engine plans one task per
`InputPartition` — the generator parallelizes across executors like any
scan, instead of a single driver-side loop. This module's synthetic trip
feed is the deterministic stand-in for such a connector (seeded integer
arithmetic, no wall clock), so its output is exactly reproducible in any
engine and the catalog entry carries a full value oracle.

Scale note: `partitions()` is the contract that matters at 100 TB — a
custom source that returns one partition serializes the whole read through
one task. Row generation happens executor-side inside `read()`; the driver
ships only (start, end) bounds per partition.
"""

from __future__ import annotations

# Deterministic row recipe shared with the oracle SQL (plans/queries.py):
#   zone       = (i * 31) % 265 + 1
#   fare_cents = (i * 7919) % 10000
ZONE_MULT = 31
N_ZONES = 265
FARE_MULT = 7919
FARE_MOD = 10000

SYNTHETIC_TRIPS_SCHEMA = "trip_id bigint, zone int, fare_cents bigint"


def make_synthetic_trips_source():
    """Build (and return) the DataSource class.

    Defined INSIDE a function so cloudpickle serializes the classes BY
    VALUE: executor workers deserialize them without importing this
    package, which fails whenever the driver runs from a cwd where the
    package isn't on the worker's import path (the bare-driver-session
    deployment shape; same rule as every Python closure in this repo)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    zone_mult, n_zones = ZONE_MULT, N_ZONES
    fare_mult, fare_mod = FARE_MULT, FARE_MOD

    class SyntheticTripsReader(DataSourceReader):
        def __init__(self, options):
            self.n_rows = int(options.get("n_rows", 10_000))
            self.n_parts = max(1, int(options.get("partitions", 8)))

        def partitions(self):
            # contiguous row-id ranges; one Spark task each. step >= 1
            # keeps range() legal when n_rows == 0 (empty source -> one
            # empty partition, since Spark requires at least one).
            step = max(1, -(-self.n_rows // self.n_parts))
            return [
                InputPartition((lo, min(lo + step, self.n_rows)))
                for lo in range(0, self.n_rows, step)
            ] or [InputPartition((0, 0))]

        def read(self, partition):
            lo, hi = partition.value
            for i in range(lo, hi):
                yield (
                    i,
                    (i * zone_mult) % n_zones + 1,
                    (i * fare_mult) % fare_mod,
                )

    class SyntheticTripsDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_trips"

        def schema(self):
            return SYNTHETIC_TRIPS_SCHEMA

        def reader(self, schema):
            return SyntheticTripsReader(self.options)

    return SyntheticTripsDataSource


def register_synthetic_trips(spark) -> None:
    """Idempotent registration of the `synthetic_trips` format."""
    spark.dataSource.register(make_synthetic_trips_source())
