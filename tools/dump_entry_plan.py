"""Dump executed plans for named catalog entries to files —
optimization-evidence capture (plans/r09/<name>_{before,after}.txt).

Usage:
    python tools/dump_entry_plan.py SUFFIX OUTDIR name1 name2 ...
        [--sf-dir=/root/testdata/sf0.1]

Writes OUTDIR/<name>_<SUFFIX>.txt per entry.

Batch entries: the plan is captured AFTER one executed count() so AQE
has finalized (isFinalPlan=true) — the plan shown is the plan that ran.
Captured via `df.explain("formatted")` stdout (public API; the r8 tool
used the private py4j PythonSQLUtils.explainString — ADVICE r8).

Streaming entries (r8 verdict ask #6): the r8 dumps recorded only the
post-drain memory-sink readback (a vacuous LocalTableScan). This tool
now intercepts every StreamingQuery the entry starts and captures, per
query and BEFORE it is stopped: `explainInternal(extended=True)` — the
stateful-op topology with state partition counts — plus the final
progress JSON (per-batch rows, state rows, watermark). Both are
appended to the file after the returned frame's batch plan.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _capture_batch_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class _StreamCapture:
    """Patch StreamingQuery.stop so every stream an entry starts records
    its streaming plan + last progress at stop time (the only moment the
    plan of the STREAMING query — not the sink readback — is both
    finalized and reachable)."""

    def __init__(self):
        self.captures: list[str] = []

    def __enter__(self):
        from pyspark.sql.streaming.query import StreamingQuery

        self._sq_cls = StreamingQuery
        self._orig_stop = StreamingQuery.stop
        cap = self.captures
        orig_stop = self._orig_stop

        def patched_stop(q):
            try:
                plan = q._jsq.explainInternal(True)  # noqa: SLF001
                prog = q.lastProgress
                cap.append(
                    f"=== streaming query name={q.name!r} id={q.id} ===\n"
                    f"{plan}\n--- lastProgress ---\n{prog}\n"
                )
            except Exception as e:  # noqa: BLE001 — capture is best-effort
                cap.append(f"=== streaming capture failed: {e} ===\n")
            finally:
                orig_stop(q)

        StreamingQuery.stop = patched_stop
        return self

    def __exit__(self, *exc):
        self._sq_cls.stop = self._orig_stop
        return False


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
        with _StreamCapture() as sc:
            df = REGISTRY[name].spark(spark, sf_dir)
            df.count()
            plan = _capture_batch_plan(df)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') after execution at {sf_dir}\n")
            f.write(plan)
            if sc.captures:
                f.write(
                    "\n# ------- streaming queries started by this entry "
                    "(plan captured before stop) -------\n"
                )
                for c in sc.captures:
                    f.write(c)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
