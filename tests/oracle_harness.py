"""Local replica of the driver's correctness gate: run every REGISTRY query
through Spark AND its DuckDB oracle, compare row count, schema shape, and
order-insensitive values (columns sorted by name, rows sorted, doubles
compared exactly after the queries' own rounding).
"""

from __future__ import annotations

import math

import duckdb

from nyc_taxi_data_pipeline_spark.sources.catalog import TABLES, table_path

SF_DIR = "/root/testdata/sf0.01"


def duck_connection(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """Sort columns by name, then rows; canonicalize value types."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return float(v)
        if isinstance(v, int):
            return float(v) if abs(v) < 2**52 else v
        return v

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare_query(spark, con, query, sf_dir: str = SF_DIR) -> dict:
    sdf = query.spark(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    res = con.execute(query.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    report = {
        "name": query.name,
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "cols_match": sorted(c.lower() for c in spark_cols)
        == sorted(c.lower() for c in duck_cols),
        "spark_cols": spark_cols,
        "duck_cols": duck_cols,
    }
    if report["cols_match"] and len(spark_rows) == len(duck_rows):
        a = _normalize(spark_rows, [c.lower() for c in spark_cols])
        b = _normalize(duck_rows, [c.lower() for c in duck_cols])
        mismatches = [
            (i, ra, rb) for i, (ra, rb) in enumerate(zip(a, b)) if ra != rb
        ]
        report["values_match"] = not mismatches
        report["first_mismatches"] = mismatches[:3]
    else:
        report["values_match"] = False
        report["first_mismatches"] = []
    return report
