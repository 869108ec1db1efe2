"""Invariant tests for the Erlang-B wave (erlang_b_blocking) —
independent Python recursion reference.
"""

from __future__ import annotations

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_erlang_b_matches_python_recursion(spark):
    rows = (
        load_table(spark, SF, "events")
        .selectExpr(
            "unix_micros(CAST(ts AS TIMESTAMP)) AS t",
            "CAST(round(value * 1000) AS BIGINT) AS s",
        )
        .collect()
    )
    pts = sorted((r.t, r.s) for r in rows)
    ga = sum(pts[i + 1][0] - pts[i][0] for i in range(len(pts) - 1))
    ss = sum(s for _, s in pts)
    rho = ss * 1000 * 1_000_000 // ga
    b = 1_000_000
    traj = []
    for k in range(1, 11):
        num = rho * b // 1_000_000
        b = num * 1_000_000 // (k * 1_000_000 + num)
        traj.append(b)
    got = REGISTRY["erlang_b_blocking"].spark(spark, SF).collect()
    assert len(got) == 10
    for r, (k, bk) in zip(got, enumerate(traj, 1)):
        assert r.n_servers == k
        assert r.offered_load_ppm == rho
        assert r.blocking_ppm == bk, k
        assert r.carried_load_ppm == rho * (1_000_000 - bk) // 1_000_000
    # Erlang-B is monotone decreasing in servers and bounded by 1
    bs = [r.blocking_ppm for r in got]
    assert all(a >= b2 for a, b2 in zip(bs, bs[1:]))
    assert bs[0] <= 1_000_000
