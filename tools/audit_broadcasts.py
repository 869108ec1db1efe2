"""Audit every catalog entry for BROADCAST frames and driver
`collect()` results that GROW with the data — the last un-audited
single-point-of-failure shape at 100 TB (round-7 verdict lead ask).

A `broadcast()` hint forces Spark to materialize the whole frame on
the driver and ship it to every executor REGARDLESS of its size —
Catalyst's own size-based auto-broadcast adapts with real statistics
at scale, but an explicit hint does not. Likewise a `.collect()` at
plan-build time pulls its whole result through the driver's py4j
channel. Both are correct for provably BOUNDED frames (dims with a
fixed value domain, per-tier offset rollups whose tier count is
range/width-bounded, 1-row totals, calendar spines, fixed panels) and
fatal for anything proportional to the lake. This audit separates the
two EMPIRICALLY, exactly like tools/audit_windows.py did for
single-partition windows: build every entry's plan at TWO scale
points, count each broadcast hint's actual input rows (and each
build-time collect's actual result rows), and flag inputs that both
grew superconstantly across the 10x lake and are big enough to matter.

Mechanics
---------
- Broadcast hints survive analysis as `ResolvedHint(strategy=broadcast)`
  logical nodes (the optimizer folds them into JoinHint, so the
  ANALYZED plan is the one place every explicit hint is visible).
  Every plan segment is walked separately — `localCheckpoint` is
  intercepted during the build (shared gotcha with the window audit)
  so hints behind a truncated lineage are still seen.
- Hint inputs are re-materialized with Dataset.ofRows on the hint's
  logical child and counted at sf0.001 and sf0.01. Counts are memoized
  on the child's canonicalized semanticHash + schema, so the dozens of
  entries broadcasting the same dim/offsets frames pay for it once.
- Driver collects are audited by patching DataFrame.collect during the
  build: every collect an entry performs while constructing its plan
  (probe lists, MERGE materializations, panel picks — `take`/`head`
  route through collect too) records its actual row count at both
  scale points.
- Flag rule (same empirical definition of data-sized as the window
  audit): rows(sf0.01) > max(GROWTH * rows(sf0.001), MIN_ROWS).
  The two lists per entry are paired positionally WITH a length
  assertion — a mismatch (AQE/branching changing hint count across
  scale points) records an error instead of silently zipping.

Usage:  python tools/audit_broadcasts.py [--json BROADCAST_AUDIT.json] [entry ...]
Shared by tests/test_plans.py::test_no_data_sized_broadcast_or_collect.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.audit_windows import _of_rows  # noqa: E402  (shared py4j helper)

SF_SMALL = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.01"
GROWTH = 3.0  # input must grow >3x across the 10x lake to count as data-sized
MIN_ROWS_BROADCAST = 4096  # and exceed this at sf0.01 (dims with a fixed
# value domain sit far below; a driver-materialized frame past this that
# still tracks the lake is a real 100 TB OOM)
MIN_ROWS_COLLECT = 1024  # collect rides the py4j channel row-by-row — flag
# sooner than the JVM-side broadcast path

# Entries allowed to keep ONE data-sized broadcast/collect, each with the
# reason the driver materialization is inherent. Keep <= 3.
WHITELIST: dict[str, str] = {}


def _collect_segments_and_collects(query, spark, sf_dir):
    """Build the entry's frame with BOTH interceptions live:
    localCheckpoint (so every plan segment is walkable) and collect
    (so every build-time driver materialization is counted)."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    segments: list = []
    collects: list = []
    orig_ckpt = CDF.localCheckpoint
    orig_collect = CDF.collect

    def patched_ckpt(self, eager: bool = True, storageLevel=None):
        segments.append(self)
        return orig_ckpt(self, eager, storageLevel)

    def patched_collect(self):
        rows = orig_collect(self)
        collects.append(
            (self.schema.simpleString()[:120], len(rows))
        )
        return rows

    CDF.localCheckpoint = patched_ckpt
    CDF.collect = patched_collect
    try:
        final = query.spark(spark, sf_dir)
    finally:
        CDF.localCheckpoint = orig_ckpt
        CDF.collect = orig_collect
    segments.append(final)
    return segments, collects


def _broadcast_hints(jplan):
    """Walk a logical plan (py4j), yield ResolvedHint nodes whose
    strategy is broadcast."""
    out = []
    stack = [jplan]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "ResolvedHint" and "broadcast" in node.hints().toString().lower():
            out.append(node)
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
    return out


def _suspects_for_entry(query, spark, sf_dir, memo):
    """([(hint_desc, input_rows)], [(collect_desc, rows)]) for every
    broadcast hint / build-time collect in the entry's full
    (checkpoint-spanning) lineage at sf_dir."""
    segments, collects = _collect_segments_and_collects(query, spark, sf_dir)
    hints = []
    for seg in segments:
        analyzed = seg._jdf.queryExecution().analyzed()
        for h in _broadcast_hints(analyzed):
            child = h.child()
            key = (
                sf_dir,
                child.semanticHash(),
                child.schema().catalogString()[:200],
            )
            if key not in memo:
                memo[key] = int(_of_rows(spark, child).count())
            desc = child.schema().catalogString()[:120]
            hints.append((desc, memo[key]))
    return hints, collects


def _pair(small, big, min_rows):
    """Pair two scale-point lists positionally; raise on length
    mismatch (ADVICE r7: never zip silently)."""
    if len(small) != len(big):
        raise ValueError(
            f"suspect-count mismatch across scale points: "
            f"{len(small)} at sf0.001 vs {len(big)} at sf0.01"
        )
    out = []
    flagged = False
    for (desc, n_small), (_, n_big) in zip(small, big):
        is_data_sized = n_big > GROWTH * max(n_small, 1) and n_big > min_rows
        flagged = flagged or is_data_sized
        out.append(
            {
                "input": desc,
                "rows_sf0001": n_small,
                "rows_sf001": n_big,
                "data_sized": is_data_sized,
            }
        )
    return out, flagged


def audit_catalog(spark, names=None) -> dict:
    """Run the two-point audit; returns {entry: {...}} for every entry
    with at least one broadcast hint or build-time collect, with
    `flagged: True` where an input is data-sized."""
    from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY

    memo: dict = {}
    report: dict[str, dict] = {}
    items = [(n, q) for n, q in REGISTRY.items() if names is None or n in names]
    for name, query in items:
        try:
            h_small, c_small = _suspects_for_entry(query, spark, SF_SMALL, memo)
        except Exception as e:  # noqa: BLE001 — record, don't abort the sweep
            report[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            continue
        if not h_small and not c_small:
            continue
        try:
            h_big, c_big = _suspects_for_entry(query, spark, SF_BIG, memo)
            broadcasts, f1 = _pair(h_small, h_big, MIN_ROWS_BROADCAST)
            collects, f2 = _pair(c_small, c_big, MIN_ROWS_COLLECT)
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            continue
        flagged = f1 or f2
        report[name] = {
            "flagged": flagged and name not in WHITELIST,
            "whitelisted": name in WHITELIST,
            "broadcasts": broadcasts,
            "collects": collects,
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

    spark = get_spark(app_name="audit-broadcasts")
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
            f"b:{w['rows_sf0001']}->{w['rows_sf001']}{'*' if w['data_sized'] else ''}"
            for w in r["broadcasts"]
        ) + (" | " if r["collects"] else "") + ", ".join(
            f"c:{w['rows_sf0001']}->{w['rows_sf001']}{'*' if w['data_sized'] else ''}"
            for w in r["collects"]
        )
        print(f"{tag:4s} {n}: {rows}")
    print(
        f"\n{len(flagged)} flagged / {len(report)} with broadcast hints "
        "or build-time collects"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
