"""Sweep every REGISTRY oracle through DuckDB's type checker (DESCRIBE,
no execution) and flag output columns whose DuckDB type falls outside the
canonical cross-engine lattice — above all HUGEINT/INT128, the type class
that has now caused driver hash-misses in three separate rounds
(sequence_packing r2; charlm_freq_score + stratified_sample_hash r4):
DuckDB's sum() over integer columns and bigint // return HUGEINT, which
value-matches Spark's BIGINT row-for-row but hash-canonicalizes
differently in the driver (int128 does not survive Arrow as an integer).

Usage:  python tools/check_oracle_types.py [sf_dir]
Exit status 1 if any flagged column exists, so CI/close-out can gate on it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGGED_TYPES = ("HUGEINT", "UHUGEINT", "INT128", "UINT64", "UBIGINT")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
    from tests.oracle_harness import duck_connection

    con = duck_connection(sf_dir)
    flagged: dict[str, list[tuple[str, str]]] = {}
    errors: dict[str, str] = {}
    for name, query in REGISTRY.items():
        try:
            rows = con.execute(f"DESCRIBE ({query.oracle})").fetchall()
        except Exception as e:  # noqa: BLE001 — DESCRIBE of some statements
            # (e.g. scripting/multi-statement oracles) can't be wrapped;
            # fall back to executing with LIMIT 0 semantics via the cursor.
            try:
                cur = con.execute(query.oracle)
                rows = [(d[0], str(cur.fetch_arrow_table().schema.field(i).type))
                        for i, d in enumerate(cur.description)]
            except Exception as e2:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e2}"[:200]
                continue
        bad = [
            (cname, ctype)
            for cname, ctype, *_ in rows
            if any(t in str(ctype).upper() for t in FLAGGED_TYPES)
        ]
        if bad:
            flagged[name] = bad

    for name, cols in sorted(flagged.items()):
        print(f"FLAG {name}: " + ", ".join(f"{c} {t}" for c, t in cols))
    for name, err in sorted(errors.items()):
        print(f"ERR  {name}: {err}", file=sys.stderr)
    print(f"{len(flagged)} flagged / {len(REGISTRY)} entries ({len(errors)} describe-errors)")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
