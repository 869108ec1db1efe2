"""Benchmark harness: run every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "suite_wall_seconds", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced with a full count() (materializes every operator in
the plan); per-query seconds include Catalyst planning + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
    from nyc_taxi_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # warm the JVM + parquet footers so per-query numbers measure the
    # queries, not first-touch session setup
    spark.range(1).count()

    timings: dict[str, float] = {}
    t_suite = time.perf_counter()
    for i, (name, query) in enumerate(REGISTRY.items()):
        t0 = time.perf_counter()
        query.spark(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        # storage blocks from lazy localCheckpoints are only unpersisted
        # after the driver GCs the frame refs (ContextCleaner); over a
        # 140-query run the accumulation causes multi-x eviction spikes
        # in later heavy queries — nudge reclamation periodically
        if i % 10 == 9:
            spark._jvm.System.gc()
    total = round(time.perf_counter() - t_suite, 3)

    print(
        json.dumps(
            {
                "metric": "suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
