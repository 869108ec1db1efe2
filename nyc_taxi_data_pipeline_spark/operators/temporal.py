"""Temporal operators Spark lacks as builtins: as-of join, sessionization.

Both are pure compositions of window functions + union — single-shuffle,
no Python, no driver loops (the scalable forms per the guide's
'common OLAP patterns').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts for the same key (trade/quote-style as-of join).

    Strategy: tag and union both sides, sort within key by (ts, side) with
    right rows first at equal ts, then carry right values forward with
    last(ignorenulls) — ONE shuffle on the key, linear in |left|+|right|.
    A range-join + per-group max would re-shuffle and blow up on dense
    right sides; merge_asof-in-pandas would leave the JVM. This stays
    codegen'd end-to-end.
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l_tagged.schema["__l"].dataType
        ).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (side=0) sort before left rows at the same ts → "at or before"
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__rv_{c}").alias(c) for c in right_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 7 * 24 * 3600,
    how: str = "inner",
) -> DataFrame:
    """Range join: each point row pairs with every interval row whose
    [start, end) contains its timestamp.

    Naive formulation (`ts >= start AND ts < end` with no equi-key) gives
    Spark a broadcast-nested-loop join — O(|points| * |intervals|), dead at
    scale. Instead both sides are mapped onto fixed-width time buckets:
    intervals explode to the buckets they cover (cheap: intervals are the
    small side and spans are bounded), points compute one bucket, and the
    join becomes equi on bucket + residual range filter — hash-partitioned,
    AQE-skew-splittable, linear shuffle.

    Pick bucket_seconds near the typical interval span: much smaller
    multiplies the interval explode; much larger inflates candidate pairs.
    """
    p_b = points.withColumn(
        "__bucket", (F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
    )
    i_b = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("long"),
                # end is exclusive, but a point in the end-boundary bucket can
                # still precede it — include that bucket and let the filter cut
                (F.unix_timestamp(F.col(end_col)) / bucket_seconds).cast("long"),
            )
        ),
    )
    joined = p_b.join(
        i_b,
        (p_b["__bucket"] == i_b["__bucket"])
        & (p_b[ts_col] >= i_b[start_col])
        & (p_b[ts_col] < i_b[end_col]),
        how,
    )
    return joined.drop("__bucket")


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the inter-event
    gap exceeds `gap_minutes`. Returns the input plus a per-key
    `session_id` (1-based). Classic lag + cumulative-sum over one window —
    one shuffle on the key."""
    w = W.partitionBy(key).orderBy(ts_col)
    gap_sec = gap_minutes * 60
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_sec),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Sessions rolled up per key: count, span, event count per session →
    aggregated per-key session metrics."""
    sess = sessionize(df, key, ts_col, gap_minutes)
    per_session = sess.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
    return per_session.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.round(
            F.avg(
                F.unix_timestamp("session_end") - F.unix_timestamp("session_start")
            ),
            4,
        ).alias("avg_session_seconds"),
    )


def gap_fill_forward(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Hypertable-style gap-fill + forward-fill (time_bucket_gapfill +
    locf): bucket per-key observations, then materialize EVERY bucket in
    the global [min, max] span for every key and carry the last observed
    value across gaps.

    Scale shape: the spine is generated with sequence()+explode — pure
    narrow codegen, no driver loop, ~spine_len rows per key. The global
    span is a 1-row aggregate broadcast onto the key list (tiny cross
    join), the observations join is a shuffle on (key, bucket), and the
    forward fill is one window pass per key ordered by bucket using
    last(ignorenulls) — a single sort-based window, no self-join. At
    100 TB the only wide ops are the equi-join and the window, both
    partitioned by the same key, so AQE coalesces them into one exchange.

    Returns (key, bucket_ts, observed, filled, is_gap)."""
    unit = bucket.split()[-1].rstrip("s")  # "1 day" -> date_trunc unit "day"
    bucketed = (
        df.select(
            F.col(key).alias("k"),
            F.date_trunc(unit, F.col(ts_col)).alias("bucket_ts"),
            F.col(value_col).alias("v"),
        )
        .groupBy("k", "bucket_ts")
        .agg(F.sum(F.col("v").cast("decimal(38,6)")).alias("observed_dec"))
    )
    span = df.agg(
        F.date_trunc(unit, F.min(ts_col)).alias("lo"),
        F.date_trunc(unit, F.max(ts_col)).alias("hi"),
    )
    keys = df.select(F.col(key).alias("k")).distinct()
    spine = (
        keys.join(F.broadcast(span))
        .select(
            "k",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {bucket}"))
            ).alias("bucket_ts"),
        )
    )
    w = (
        W.partitionBy("k")
        .orderBy("bucket_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(bucketed, ["k", "bucket_ts"], "left")
        .select(
            F.col("k").alias(key),
            "bucket_ts",
            F.round(F.col("observed_dec"), 2).cast("double").alias("observed"),
            F.round(
                F.last(F.col("observed_dec"), ignorenulls=True).over(w), 2
            )
            .cast("double")
            .alias("filled"),
            F.col("observed_dec").isNull().alias("is_gap"),
        )
    )


def cogrouped_asof_merge(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """`as_of_join` on the COGROUP surface: both sides shuffle once on the
    key, then each key's pair of Arrow batches meets one pandas
    `merge_asof` (backward, exact matches allowed — the same "at or
    before" semantics as the JVM path; `right_cols` must not collide with
    left column names).

    Exists for two reasons: (a) it covers
    `groupBy().cogroup().applyInPandas` — the API every two-sided custom
    per-key algorithm (per-entity model scoring, custom reconciliation)
    needs, which no other operator in this engine exercises; (b) it is the
    escape hatch when the per-key merge logic outgrows what window
    functions express. For plain as-of attribution PREFER `as_of_join`:
    it stays in whole-stage codegen, while this path pays one
    Python/Arrow round-trip per key group. Per-key state must fit one
    worker (same contract as every applyInPandas)."""
    from pyspark.sql.types import StructType

    schema = StructType(
        list(left.schema.fields) + [right.schema[c] for c in right_cols]
    )
    lcols = list(left.columns)

    def merge(lpdf, rpdf):
        import pandas as pd

        out_cols = lcols + right_cols
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        if lpdf.empty or rpdf.empty:
            out = lpdf.copy()
            for c in right_cols:
                out[c] = None
            return out[out_cols]
        rsub = (
            rpdf[[right_ts] + right_cols]
            .rename(columns={right_ts: "__rts"})
            .sort_values("__rts", kind="mergesort")
        )
        m = pd.merge_asof(
            lpdf, rsub, left_on=left_ts, right_on="__rts", direction="backward"
        )
        return m[out_cols]

    return (
        left.groupBy(key).cogroup(right.groupBy(key)).applyInPandas(merge, schema)
    )
