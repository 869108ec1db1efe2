"""Run one catalog query from the command line.

Usage:
    python tools/run_query.py <entry_name> [sf_dir] [--plan] [--oracle]

      <entry_name>  a key from the catalog registry (run with no args
                    for the full current list; see COVERAGE.md)
      [sf_dir]      parquet lake dir (default /root/testdata/sf0.01)
      --plan        also print the executed physical plan (after AQE)
      --oracle      also run the DuckDB oracle side-by-side and diff
                    row counts

With no arguments, lists every entry name.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}

    from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY

    if not args:
        for name, q in REGISTRY.items():
            print(f"{name:42s} {q.doc.splitlines()[0][:80] if q.doc else ''}")
        return 0

    name = args[0]
    if name not in REGISTRY:
        print(f"unknown entry {name!r}; run with no args to list", file=sys.stderr)
        return 2
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from nyc_taxi_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"run_query:{name}")
    df = REGISTRY[name].spark(spark, sf_dir)
    df.show(50, truncate=False)
    n = df.count()
    print(f"[{name}] {n} rows at {sf_dir}")

    if "--plan" in flags:
        print(df._jdf.queryExecution().executedPlan().toString())  # noqa: SLF001

    if "--oracle" in flags:
        oracle = REGISTRY[name].oracle
        if oracle is None:
            print("(no oracle for this entry)")
        else:
            import duckdb

            from nyc_taxi_data_pipeline_spark.sources.catalog import (
                TABLES,
                table_path,
            )

            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{table_path(sf_dir, t)}')"
                )
            rows = con.execute(oracle).fetchall()
            print(f"[oracle] {len(rows)} rows -> {'MATCH' if len(rows) == n else 'MISMATCH'} on row count")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
