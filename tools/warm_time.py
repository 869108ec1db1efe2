"""Warm steady-state timing of named catalog entries, for optimization
work: one session, lake warm-up (same as bench.py), then each entry runs
`--reps` times (default 3) and the MIN is reported — the steady-state
execution cost with compile/first-touch amortized away (guide §1:
measure first; the single-pass number mixes planning + codegen +
contention).

Usage: python tools/warm_time.py name1 name2 ... [--reps=3] [--sf-dir=...]
Prints one line per entry: min / all reps. Everything noisy goes to
stderr; the per-entry lines go to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]

    from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
    from nyc_taxi_data_pipeline_spark.session import get_spark

    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2

    extra = {}
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/spark-warmtime"
    spark = get_spark(app_name="warm_time", extra_conf=extra)
    # the FULL bench warm-up ladder (lake scan, codegen shapes, streaming
    # machinery, pandas worker pool) — shared with bench.py via
    # tools/warmup so the two cannot drift (ADVICE r8: this tool lacked
    # the pandas-lane warm-up, so warm timings of pandas-API entries
    # included first-touch worker spawn)
    from tools.warmup import warm_session

    warm_session(spark, sf_dir)

    def _reclaim() -> None:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    for name in names:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            REGISTRY[name].spark(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 2))
            _reclaim()
        print(f"{min(runs):7.2f}  {runs}  {name}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
