"""Dump `.explain("formatted")` for named catalog entries to files —
the r08 optimization-evidence capture (plans/r08/<name>_{before,after}.txt).

Usage:
    python tools/dump_entry_plan.py SUFFIX OUTDIR name1 name2 ...
        [--sf-dir=/root/testdata/sf0.1]

Writes OUTDIR/<name>_<SUFFIX>.txt per entry. The plan is captured AFTER
one executed count() so AQE has finalized (isFinalPlan=true) — the plan
shown is the plan that ran. For entries that drain a streaming query and
return a memory-sink batch frame, the file records the returned frame's
plan (the sink scan) plus a header note; the streaming evidence for
those lives in OPTIMIZATION_r08.md (micro-batch progress metrics).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
    suffix, outdir, names = args[0], args[1], args[2:]
    os.makedirs(outdir, exist_ok=True)

    from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
    from nyc_taxi_data_pipeline_spark.session import get_spark

    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2

    extra = {}
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/spark-dumpplan"
    spark = get_spark(app_name="dump_entry_plan", extra_conf=extra)
    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        df.count()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') after execution at {sf_dir}\n")
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
