"""Custom stateful streaming operators (applyInPandasWithState).

The reference's streaming path is stateless pass-through ETL (SURVEY.md
§2.9: no watermarks, no state). This module adds the custom-stateful
surface Structured Streaming offers beyond built-in windowed aggs: an
arbitrary per-key accumulator that survives across micro-batches.

Scale shape: state is partitioned by key (one shuffle), held in the state
store per partition, and each micro-batch exchanges one Arrow batch per
key group — the same contract as a built-in stateful agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("max_value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), True),
        T.StructField("total", T.DoubleType(), True),
        T.StructField("mx", T.DoubleType(), True),
    ]
)


def running_user_stats(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum, max) maintained in the state store and
    re-emitted on every micro-batch that touches the key — the custom
    analog of `groupBy(key).agg(...)` in update mode, but with explicit,
    arbitrarily-extensible state.

    The closure is self-contained (no module references): executors can't
    necessarily import this package (see operators/multimodal.py note).
    """

    def op(key, batches, state: GroupState):
        # locals only — pickled by value into the worker
        import pandas as pd

        n, total, mx = state.get if state.exists else (0, 0.0, None)
        for pdf in batches:
            vals = pdf[value_col].dropna()
            n += int(len(pdf))
            total += float(vals.sum()) if len(vals) else 0.0
            batch_max = float(vals.max()) if len(vals) else None
            if batch_max is not None:
                mx = batch_max if mx is None else max(mx, batch_max)
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        op,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TWS_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("min_value", T.DoubleType(), True),
        T.StructField("max_value", T.DoubleType(), True),
    ]
)


def transform_running_stats(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Same running per-key stats as `running_user_stats`, but on the
    Spark 4 state-v2 API (`transformWithStateInPandas` + StatefulProcessor
    + ValueState). Differences that matter at scale:

    - state lives in the RocksDB state store (required by this API), so
      per-key state is spilled off-heap and changelog-checkpointed rather
      than held in executor memory like the HDFS-backed default;
    - the handle supports multiple named state variables with per-variable
      TTL — the shape a real session/feature accumulator needs.

    Emits (count, sum, min, max) per touched key every micro-batch. The
    count is monotone even when values are negative, so downstream can
    recover final state with argmax-by-count (no monotone-value
    assumption).

    The processor class is defined inside this function so cloudpickle
    serializes it by value — executors cannot import this package when the
    driver runs from a foreign cwd.

    Env gate: execution needs (a) the RocksDB state store provider
    (`spark.sql.streaming.stateStoreProviderClass`) and (b) the `protobuf`
    package in the Python workers (the state API's wire protocol). Plan
    construction works without either; the test skips when protobuf is
    absent.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _Stats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n BIGINT, total DOUBLE, mn DOUBLE, mx DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total, mn, mx = (
                self._state.get() if self._state.exists() else (0, 0.0, None, None)
            )
            for pdf in rows:
                vals = pdf[value_col].dropna()
                n += int(len(pdf))
                if len(vals):
                    total += float(vals.sum())
                    bmn, bmx = float(vals.min()), float(vals.max())
                    mn = bmn if mn is None else min(mn, bmn)
                    mx = bmx if mx is None else max(mx, bmx)
            self._state.update((n, total, mn, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "min_value": [mn],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_Stats(),
        outputStructType=TWS_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
