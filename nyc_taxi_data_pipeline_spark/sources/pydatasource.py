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


# ---------------------------------------------------------------------------
# Kafka-shaped replayable streaming source
# ---------------------------------------------------------------------------

# Deterministic record recipe shared with the oracle SQL (plans/queries.py):
#   user_id      = (p * 1000003 + o * 7919) % 97
#   amount_cents = (p * 31 + o * 17) % 1000
#   ts           = 2024-01-01T00:00:00Z + offset minutes  (event time rides
#                  IN the record like a Kafka message timestamp, so the
#                  watermark/window entry can prove event-time semantics
#                  over this source)
OFFSET_LOG_SCHEMA = (
    "partition int, offset bigint, user_id bigint, amount_cents bigint,"
    " ts timestamp"
)
USER_MULT_P = 1000003
USER_MULT_O = 7919
USER_MOD = 97
AMT_MULT_P = 31
AMT_MULT_O = 17
AMT_MOD = 1000


def make_offset_log_source():
    """Streaming DataSource with KAFKA'S execution contract, in pure Python.

    The reference's streaming edge is a real Kafka topic
    (streaming_processing/streaming_to_minio_fixed.py:46-53); this image
    ships no Kafka broker or connector jar, so that scan cannot even be
    constructed here. What CAN be proven is the contract that makes Kafka
    work as a Spark source, which is not the wire protocol but the offset
    algebra: a partitioned append-only log, monotone per-partition offsets,
    batches planned as half-open offset ranges [start, end), executor-side
    range reads, replayability of any planned range, and commit()
    acknowledgment. This source implements exactly that contract through
    the Python DataSourceStreamReader API (new in Spark 4):

      - the log has `partitions` topic-partitions × `n_rows` records each,
        generated from seeded integer arithmetic (no wall clock), so every
        batch — and any REPLAY of it after failure — yields bit-identical
        rows, and the catalog entry carries a full value oracle;
      - `latestOffset` paces availability by `rows_per_batch` per call,
        giving a deterministic multi-micro-batch drain;
      - a RESTART from a checkpoint hands `partitions(start, end)` a start
        beyond the paced cursor; the reader fast-forwards (never re-serves
        committed ranges) and clamps end <= start to an empty plan, the
        same no-regress rule the Kafka source enforces;
      - `read(partition)` runs executor-side per topic-partition — the
        1:1 task-per-partition parallelism of the real connector.

    Classes are built inside the factory so cloudpickle ships them by
    value (same rule as every closure in this repo)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    ump, umo, um = USER_MULT_P, USER_MULT_O, USER_MOD
    amp, amo, am = AMT_MULT_P, AMT_MULT_O, AMT_MOD

    class OffsetRange(InputPartition):
        def __init__(self, pid, lo, hi):
            self.pid, self.lo, self.hi = pid, lo, hi

    class OffsetLogStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.n_parts = max(1, int(options.get("partitions", 4)))
            self.n_rows = int(options.get("n_rows", 150))
            self.rows_per_batch = max(1, int(options.get("rows_per_batch", 50)))
            # ST4 backpressure parity (maxOffsetsPerTrigger=100 in the
            # reference, streaming_to_minio_fixed.py:52): a ceiling on the
            # TOTAL offsets one micro-batch may admit across all
            # partitions. Like the Kafka source, the budget is split
            # proportionally to each partition's available lag (remainder
            # to the lowest partition ids), so per-partition cursors can
            # advance unevenly and the planned batch never exceeds the cap.
            mot = options.get("max_offsets_per_trigger")
            self.max_offsets = int(mot) if mot is not None else None
            # The paced high-watermark is BROKER state, not consumer state:
            # a latestOffset that restarts from zero while the checkpoint
            # holds a higher committed offset would hand Spark a regressed
            # offset to WAL, and the next batch would re-serve committed
            # ranges (duplicates in an append sink). `hwm_file` persists
            # the watermark across reader instances exactly like a broker
            # outlives consumers; without it the in-memory cursors are only
            # safe for single-run (no-restart) drains.
            self.hwm_file = options.get("hwm_file")
            self.cursors = self._load_hwm()

        def _load_hwm(self):
            zero = {p: 0 for p in range(self.n_parts)}
            if self.hwm_file:
                try:
                    with open(self.hwm_file) as fh:
                        raw = fh.read().strip()
                    if not raw:
                        return zero
                    if raw.isdigit():  # legacy single-cursor format
                        return {p: int(raw) for p in range(self.n_parts)}
                    import json

                    return {
                        p: int(json.loads(raw).get(str(p), 0))
                        for p in range(self.n_parts)
                    }
                except (OSError, ValueError):
                    return zero
            return zero

        def _store_hwm(self):
            if self.hwm_file:
                import json

                with open(self.hwm_file, "w") as fh:
                    json.dump({str(p): c for p, c in self.cursors.items()}, fh)

        def initialOffset(self):
            return {str(p): 0 for p in range(self.n_parts)}

        def latestOffset(self):
            # per-partition desired advance: broker pacing bounded by lag
            desired = {
                p: min(self.rows_per_batch, self.n_rows - self.cursors[p])
                for p in range(self.n_parts)
            }
            total = sum(desired.values())
            if self.max_offsets is not None and total > self.max_offsets:
                budget = self.max_offsets
                take = {
                    p: desired[p] * budget // total for p in desired
                }
                # distribute the rounding remainder to the lowest pids
                # that still have headroom — deterministic, like the
                # connector's stable partition ordering
                rem = budget - sum(take.values())
                for p in sorted(desired):
                    if rem == 0:
                        break
                    if take[p] < desired[p]:
                        take[p] += 1
                        rem -= 1
            else:
                take = desired
            for p in take:
                self.cursors[p] += take[p]
            self._store_hwm()
            return {str(p): self.cursors[p] for p in range(self.n_parts)}

        def partitions(self, start, end):
            # Restart resume: the checkpointed start can be ahead of the
            # paced cursors — fast-forward so no committed range re-plans,
            # and clamp so a behind `end` yields an empty batch instead of
            # a negative range.
            out = []
            moved = False
            for p in range(self.n_parts):
                lo = int(start.get(str(p), 0))
                hi = max(int(end.get(str(p), 0)), lo)
                if lo > self.cursors[p]:
                    self.cursors[p] = lo
                    moved = True
                out.append(OffsetRange(p, lo, hi))
            if moved:
                self._store_hwm()
            return out

        def read(self, partition):
            from datetime import datetime, timedelta, timezone

            epoch = datetime(2024, 1, 1, tzinfo=timezone.utc)
            p = partition.pid
            for o in range(partition.lo, partition.hi):
                yield (
                    p,
                    o,
                    (p * ump + o * umo) % um,
                    (p * amp + o * amo) % am,
                    epoch + timedelta(minutes=o),
                )

        def commit(self, end):
            # acknowledgment hook: a real broker-backed source would
            # commit consumer-group offsets here; the log itself is
            # immutable so there is nothing to reclaim.
            pass

    class OffsetLogDataSource(DataSource):
        @classmethod
        def name(cls):
            return "offset_log"

        def schema(self):
            return OFFSET_LOG_SCHEMA

        def streamReader(self, schema):
            return OffsetLogStreamReader(self.options)

    return OffsetLogDataSource


def register_offset_log(spark) -> None:
    """Idempotent registration of the `offset_log` streaming format."""
    spark.dataSource.register(make_offset_log_source())
