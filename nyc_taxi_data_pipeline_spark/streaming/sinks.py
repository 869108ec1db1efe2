"""Streaming sources/sinks and run harnesses (SURVEY.md §2.9 ST1-ST7).

The reference's streaming jobs are Kafka → parquet with processing-time
partitioning, append mode, checkpointing, and a rate cap
(streaming_to_minio_fixed.py:46-77). Those translate 1:1; what we add is
the watermark/window surface the reference never used and a deterministic
test harness (processAllAvailable instead of wall-clock awaitTermination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def read_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """S6: Kafka source with the reference's exact option surface
    (streaming_to_minio_fixed.py:46-53). Requires the kafka connector jar."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def read_stream_parquet(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-based stream source — the test/CI stand-in for Kafka (schema is
    mandatory for streaming file sources)."""
    return spark.readStream.schema(schema).parquet(path)


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] | None = ("date_partition",),
    trigger_seconds: int | None = 10,
    output_mode: str = "append",
) -> StreamingQuery:
    """S10/ST1-ST3/ST6: partitioned parquet sink with checkpointing
    (streaming_to_minio_fixed.py:70-77)."""
    writer = (
        df.writeStream.format("parquet")
        .outputMode(output_mode)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window aggregation with late-data watermark —
    the stateful-streaming surface the reference lacks (SURVEY.md §2.9
    closing note). Works on a stream (incremental state) or batch frame
    (plain group-by) with the same code."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window).alias("win"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def run_stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] | None = None,
) -> DataFrame:
    """Bounded run of the reference's production sink shape (S10/ST6/ST7):
    partitioned parquet + checkpoint, drained with processAllAvailable,
    then the sink is re-read as a batch frame (the reference's write-then-
    read-back verify, streaming_to_minio_fixed.py:86-104, made
    deterministic)."""
    q = write_stream_parquet(
        df, path, checkpoint, partition_by=partition_by, trigger_seconds=None
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.read.parquet(path)


def run_stream_upsert_parquet(
    stream: DataFrame,
    zone: str,
    key_cols: list[str],
    order_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """foreachBatch upsert: every micro-batch MERGEs into a keyed parquet
    zone, keeping the newest row per key by (order_col, tiebreak_col).

    Plain parquet can't transactionally overwrite a path it is reading, so
    each merge writes a new immutable version directory (v=<batch_id>) —
    a minimal commit-log, the shape Delta's MERGE provides natively (swap
    this body for `DeltaTable.merge` when delta-spark is on the classpath).
    Keep-latest is by EVENT TIME, not batch arrival, so the final state is
    deterministic under any micro-batch split. Returns the final version
    as a batch frame."""
    import os

    from pyspark.sql import Window as W

    def merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        merged = batch
        versions = sorted(
            int(d.split("=")[1])
            for d in (os.listdir(zone) if os.path.isdir(zone) else [])
            if d.startswith("v=")
        )
        if versions:
            merged = spark.read.parquet(f"{zone}/v={versions[-1]}").unionByName(batch)
        w = W.partitionBy(*key_cols).orderBy(
            F.col(order_col).desc(), F.col(tiebreak_col).desc()
        )
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        latest.write.mode("overwrite").parquet(f"{zone}/v={batch_id}")

    q = stream.writeStream.foreachBatch(merge).outputMode("update").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = stream.sparkSession
    import os

    versions = sorted(
        int(d.split("=")[1]) for d in os.listdir(zone) if d.startswith("v=")
    )
    return spark.read.parquet(f"{zone}/v={versions[-1]}")


def run_stream_to_memory(
    df: DataFrame,
    name: str,
    state_partitions: int | None = 2,
    output_mode: str | None = None,
) -> DataFrame:
    """ST7 harness, determinism-fixed: drain all available input
    (processAllAvailable), stop, return the materialized sink as a batch
    frame — replaces the reference's wall-clock awaitTermination(60) +
    read-back pattern.

    `state_partitions` pins `spark.sql.shuffle.partitions` for the stream's
    lifetime (restored after): a stateful query instantiates one state
    store per shuffle partition PER stateful operator (a stream-stream
    join runs four), so state width must be sized to key cardinality and
    throughput — inheriting a batch session's wide shuffle default just
    multiplies state-store open/commit overhead. Results are identical at
    any width; pass None to keep the session setting. The pin is read once
    at query START, so it cannot leak into the query after restore.

    The default of 2 matches this catalog's drains: every offset_log
    proof is a bounded log (1-4 topic-partitions, <= ~120 keys of
    state), so two stores per stateful op already over-provision the
    key space, and the r8 measurement showed the real cost of width is
    not the per-batch commits alone but the executor-side provider
    cache — loadedProviders retains partitions x ops stores per QUERY,
    and the 60 s maintenance sweep walks all of them, so a 16-entry
    suite at width 8 accumulates hundreds of providers (family sum of
    warm mins 76 s at 8 vs 43 s at 2, values identical). A production
    stream sizes width from key cardinality x throughput and passes it
    explicitly; width never affects results, only state layout.

    `output_mode` overrides the default (complete for aggregations,
    append otherwise) — pass "append" for a watermarked aggregation whose
    point IS append semantics (closed-window emission, late-row drop)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(
                output_mode
                or ("complete" if _has_aggregation(df) else "append")
            )
            .start()
        )
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.table(name)


def _has_aggregation(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    return "Aggregate" in plan


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition:
    right rows within [left_ts, left_ts + max_delay) for the same key —
    the click→purchase attribution shape. Both sides carry watermarks so
    Spark can bound the join state: left rows are dropped from state once
    the right watermark passes left_ts + max_delay, right rows once the
    left watermark passes right_ts (the time-range condition gives the
    planner both eviction bounds — without it state grows forever, the
    100 TB failure mode). Works identically on batch frames (plain
    interval equi-join) for oracle parity."""
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] < lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner")
