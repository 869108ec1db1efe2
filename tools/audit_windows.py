"""Audit every catalog entry for SINGLE-PARTITION windows over
data-sized frames — the one plan shape that dies at 100 TB (round-6
verdict lead finding).

A logical `Window` with an EMPTY partitionSpec requires AllTuples
distribution, so Spark moves the window's ENTIRE input through one
task. A partitionSpec made entirely of FOLDABLE expressions
(`partitionBy(F.lit(1))`) does exactly the same — every row hashes to
one partition — while evading an isEmpty() check, so the audit treats
both as suspects (round-8 extension; the r7 audit missed the literal
form). That is fine for provably bounded frames (calendar spines,
quantile grids, fixed panels) and fatal for anything proportional to
the data. This audit separates the two EMPIRICALLY, not by guessing
from plan text: it builds every entry's plan at TWO scale points and
counts each suspect window's actual input rows — a frame whose input
GROWS with the scale factor is data-sized; a bounded frame stays put.

Mechanics
---------
- `localCheckpoint(eager=False)` truncates the visible plan (verify
  skill gotcha), so windows behind a checkpoint are invisible from the
  final frame. The audit intercepts DataFrame.localCheckpoint while
  building each entry and records every pre-checkpoint frame: each
  plan SEGMENT is walked separately, so every window in the lineage is
  seen exactly once.
- Suspect window inputs are re-materialized with Dataset.ofRows on the
  logical child and counted at sf0.001 and sf0.01. Flag rule:
  rows(sf0.01) > max(GROWTH * rows(sf0.001), MIN_ROWS) — i.e. the
  input both grew superconstantly with the lake and is big enough to
  matter. Calendar/day frames are identical at both points (same
  synthetic time window); fixed panels are constant by construction.

Usage:  python tools/audit_windows.py [--json WINDOW_AUDIT.json]
Shared by tests/test_plans.py::test_no_single_partition_window_on_data_sized_frames.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.01"
GROWTH = 3.0  # input must grow >3x across a 10x lake to count as data-sized
MIN_ROWS = 512  # and exceed this at sf0.01 (filters out tiny jittery frames)

# Entries allowed to keep ONE unpartitioned window over a data-sized
# frame, each with the reason the serialization is inherent. Keep <= 3.
WHITELIST: dict[str, str] = {
    # The sequential-test walk IS a total order by definition, but the
    # plan still tiers the cumsum (see sprt_sequential_ab); nothing
    # whitelisted at present.
}


def _collect_segments(query, spark, sf_dir):
    """Build the entry's frame, intercepting localCheckpoint so every
    plan segment (pre-checkpoint frame) is walkable."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    segments: list = []
    orig = CDF.localCheckpoint

    def patched(self, eager: bool = True, storageLevel=None):
        segments.append(self)
        return orig(self, eager, storageLevel)

    CDF.localCheckpoint = patched
    try:
        final = query.spark(spark, sf_dir)
    finally:
        CDF.localCheckpoint = orig
    segments.append(final)
    return segments


def _empty_partition_windows(jplan):
    """Walk a logical plan (py4j), yield Window nodes whose
    partitionSpec provides NO distribution: empty, or made entirely of
    FOLDABLE expressions (round-8 extension — `partitionBy(F.lit(1))`
    hashes every row to the same partition exactly like an empty spec,
    but is invisible to the isEmpty() check the round-7 audit used)."""
    out = []
    stack = [jplan]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "Window":
            spec = node.partitionSpec()
            all_foldable = True
            for i in range(spec.size()):
                if not spec.apply(i).foldable():
                    all_foldable = False
                    break
            if all_foldable:
                out.append(node)
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
    return out


def _of_rows(spark, jplan):
    jvm = spark._jvm
    for path in (
        jvm.org.apache.spark.sql.classic.Dataset,
        jvm.org.apache.spark.sql.Dataset,
    ):
        try:
            return path.ofRows(spark._jsparkSession, jplan)
        except Exception:  # noqa: BLE001 — try the next namespace
            continue
    raise RuntimeError("Dataset.ofRows not reachable via py4j")


def _suspects_for_entry(query, spark, sf_dir):
    """[(window_desc, input_rowcount)] for every empty-partition window
    in the entry's full (checkpoint-spanning) lineage at sf_dir."""
    out = []
    for seg in _collect_segments(query, spark, sf_dir):
        analyzed = seg._jdf.queryExecution().analyzed()
        for win in _empty_partition_windows(analyzed):
            desc = win.windowExpressions().mkString("; ")[:160]
            n = _of_rows(spark, win.child()).count()
            out.append((desc, int(n)))
    return out


def audit_catalog(spark, names=None) -> dict:
    """Run the two-point audit; returns {entry: {...}} for every entry
    that has at least one empty-partition window, with `flagged: True`
    where the window input is data-sized."""
    from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY

    report: dict[str, dict] = {}
    items = [(n, q) for n, q in REGISTRY.items() if names is None or n in names]
    for name, query in items:
        try:
            small = _suspects_for_entry(query, spark, SF_SMALL)
        except Exception as e:  # noqa: BLE001 — record, don't abort the sweep
            report[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            continue
        if not small:
            continue
        big = _suspects_for_entry(query, spark, SF_BIG)
        # pair by position: segment/window discovery order is
        # deterministic for a deterministic plan builder — but ASSERT
        # that, don't assume it (ADVICE r7): if AQE/branching produced
        # different window counts at the two scale points, a silent zip
        # would truncate or mispair and a data-sized window could be
        # compared against the wrong baseline.
        if len(small) != len(big):
            report[name] = {
                "error": (
                    "suspect-window count mismatch across scale points: "
                    f"{len(small)} at sf0.001 vs {len(big)} at sf0.01"
                )
            }
            continue
        windows = []
        flagged = False
        for (desc, n_small), (_, n_big) in zip(small, big):
            is_data_sized = n_big > GROWTH * max(n_small, 1) and n_big > MIN_ROWS
            flagged = flagged or is_data_sized
            windows.append(
                {
                    "window": desc,
                    "rows_sf0001": n_small,
                    "rows_sf001": n_big,
                    "data_sized": is_data_sized,
                }
            )
        report[name] = {
            "flagged": flagged and name not in WHITELIST,
            "whitelisted": name in WHITELIST,
            "windows": windows,
        }
    return report


def main() -> int:
    from nyc_taxi_data_pipeline_spark.session import get_spark

    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    names = set(a for a in sys.argv[1:] if not a.startswith("--")) or None
    if names and out_path:
        names.discard(out_path)
        names = names or None

    spark = get_spark(app_name="audit-windows")
    report = audit_catalog(spark, names)
    spark.stop()

    flagged = {n: r for n, r in report.items() if r.get("flagged")}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "flagged": sorted(flagged),
                    "whitelist": WHITELIST,
                    "entries": report,
                },
                f,
                indent=1,
                sort_keys=True,
            )
    for n, r in sorted(report.items()):
        tag = "FLAG" if r.get("flagged") else ("WL" if r.get("whitelisted") else "ok")
        if "error" in r:
            print(f"ERR  {n}: {r['error']}")
            continue
        rows = ", ".join(
            f"{w['rows_sf0001']}->{w['rows_sf001']}{'*' if w['data_sized'] else ''}"
            for w in r["windows"]
        )
        print(f"{tag:4s} {n}: {rows}")
    print(f"\n{len(flagged)} flagged / {len(report)} with empty-partition windows")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
