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
