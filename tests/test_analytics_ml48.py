"""Invariant tests for the matrix-balancing wave
(sinkhorn_ipf_balancing) — independent Python IPF replay.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_sinkhorn_matches_python_replay(spark):
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF, "customer").collect()
    }
    n2r = {
        r.n_nationkey: r.n_regionkey
        for r in load_table(spark, SF, "nation").collect()
    }
    rname = {
        r.r_regionkey: r.r_name
        for r in load_table(spark, SF, "region").collect()
    }
    cells = defaultdict(int)
    for r in (
        load_table(spark, SF, "orders")
        .select("o_custkey", "o_orderpriority")
        .collect()
    ):
        cells[(rname[n2r[cust[r.o_custkey]]], r.o_orderpriority)] += 1
    v = {k: c * 1_000_000 for k, c in cells.items()}
    for axis in (0, 1, 0, 1, 0, 1):
        sums = defaultdict(int)
        for k, x in v.items():
            sums[k[axis]] += x
        v = {k: x * 200_000 // sums[k[axis]] * 5 for k, x in v.items()}
    row_sums = defaultdict(int)
    col_sums = defaultdict(int)
    for (rn, pri), x in v.items():
        row_sums[rn] += x
        col_sums[pri] += x
    row_err = max(abs(s - 1_000_000) for s in row_sums.values())
    col_err = max(abs(s - 1_000_000) for s in col_sums.values())
    got = REGISTRY["sinkhorn_ipf_balancing"].spark(spark, SF).collect()
    assert len(got) == len(cells)
    for r in got:
        k = (r.r_name, r.priority)
        assert r.raw_count == cells[k]
        assert r.balanced_ppm == v[k], k
        assert r.row_err_ppm == row_err
        assert r.col_err_ppm == col_err
    # Sinkhorn convergence: after the final COLUMN pass, column margins
    # are (near-)exact; rows are close (geometric convergence)
    assert col_err <= 25  # floor residue: up to 5 ppm per cell, 5 cells
    assert row_err < 100_000  # far tighter than the raw table's skew
