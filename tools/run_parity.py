"""Run the FULL catalog through the local replica of the driver's
CORRECTNESS gate (tests/oracle_harness.compare_query) and write
PARITY_LOCAL.json: one row per entry with rows/schema/values match flags.

Usage:  python tools/run_parity.py [sf_dir] [out_name]
        (defaults: /root/testdata/sf0.01, PARITY_LOCAL.json)

Run it at TWO scale points — sf0.01 (the driver's gate) and sf0.1
(`python tools/run_parity.py /root/testdata/sf0.1 PARITY_SF01_LOCAL.json`):
the larger point catches value bugs the small one can't reach — decimal
rounding TIES (round() over doubles at terminating-decimal boundaries
breaks differently per engine) and width overflows both first appeared
only at sf0.1.

This is the machine-readable companion to ORACLE_MANIFEST.json: the
manifest says every entry HAS a value oracle; this artifact records the
oracle actually PASSING for all entries in one executed sweep, so a
sampled driver run can be cross-checked against full-catalog parity.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
    from nyc_taxi_data_pipeline_spark.session import get_spark
    from tests.oracle_harness import compare_query, duck_connection

    spark = get_spark(app_name="parity")
    con = duck_connection(sf_dir)

    results: dict[str, dict] = {}
    t0 = time.time()
    for name, query in REGISTRY.items():
        try:
            rep = compare_query(spark, con, query, sf_dir)
            results[name] = {
                "rows_match": rep["spark_rows"] == rep["duck_rows"],
                "schema_match": rep["cols_match"],
                "types_match": rep["types_match"],
                "values_match": rep["values_match"],
                "spark_rows": rep["spark_rows"],
            }
            if not rep["types_match"]:
                results[name]["type_mismatches"] = rep["type_mismatches"]
        except Exception as e:  # noqa: BLE001 — record, don't abort the sweep
            results[name] = {
                "rows_match": False,
                "schema_match": False,
                "values_match": False,
                "error": f"{type(e).__name__}: {e}"[:300],
            }
        ok = results[name]["values_match"]
        print(f"{'PASS' if ok else 'FAIL'} {name}", file=sys.stderr)

    n_pass = sum(1 for r in results.values() if r["values_match"])
    payload = {
        "sf_dir": sf_dir,
        "n_entries": len(results),
        "n_values_match": n_pass,
        "wall_seconds": round(time.time() - t0, 1),
        "entries": results,
    }
    out_name = sys.argv[2] if len(sys.argv) > 2 else "PARITY_LOCAL.json"
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), out_name
    )
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_name}: {n_pass}/{len(results)} values_match")


if __name__ == "__main__":
    main()
