"""Diff two bench result files (BENCH_LOCAL.json format): per-query deltas,
sorted by regression, plus totals — the round-over-round view VERDICT asked
BENCH_r{N} to support.

Usage: python tools/compare_bench.py OLD.json NEW.json [min_delta_sec]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    min_delta = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    a, b = old["queries"], new["queries"]
    print(f"total: {old['value']} -> {new['value']} "
          f"({new['value'] - old['value']:+.1f}s, sf={new.get('sf')})")
    added = sorted(set(b) - set(a))
    removed = sorted(set(a) - set(b))
    if added:
        print("added:", ", ".join(f"{n} ({b[n]}s)" for n in added))
    if removed:
        print("removed:", ", ".join(f"{n} ({a[n]}s)" for n in removed))
    deltas = [(b[n] - a[n], n) for n in b if n in a]
    deltas.sort(reverse=True)
    shown = [(d, n) for d, n in deltas if abs(d) >= min_delta]
    for d, n in shown:
        print(f"{d:+7.2f}  {n}  ({a[n]} -> {b[n]})")
    if not shown:
        print(f"no per-query delta >= {min_delta}s")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piping into head is fine
        pass
