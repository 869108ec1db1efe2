"""Spot-check named catalog entries against their DuckDB oracles at one
or more scale points — the per-entry companion to tools/run_parity.py's
full sweep, for verifying NEW entries at add time without paying the
whole-catalog cost.

Usage:  python tools/check_entries.py name1 name2 ... [--sf 0.01,0.1]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfs = ["0.01", "0.1"]
    for a in sys.argv[1:]:
        if a.startswith("--sf"):
            sfs = a.split("=", 1)[1].split(",") if "=" in a else sfs
    from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
    from nyc_taxi_data_pipeline_spark.session import get_spark
    from tests.oracle_harness import compare_query, duck_connection

    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="check_entries")
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duck_connection(sf_dir)
        for n in names:
            try:
                rep = compare_query(spark, con, REGISTRY[n], sf_dir)
                ok = rep["values_match"]
                print(
                    f"{'PASS' if ok else 'FAIL'} sf{sf} {n} "
                    f"rows={rep['spark_rows']}/{rep['duck_rows']}"
                )
                if not ok:
                    bad += 1
                    print(f"  cols spark={rep['spark_cols']}")
                    print(f"  cols duck ={rep['duck_cols']}")
                    for m in rep.get("first_mismatches", []):
                        print(f"  mismatch[{m[0]}]\n   spark={m[1]}\n   duck ={m[2]}")
            except Exception as e:  # noqa: BLE001
                bad += 1
                print(f"ERR  sf{sf} {n}: {type(e).__name__}: {e}")
        con.close()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
