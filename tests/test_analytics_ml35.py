"""Invariant tests for the neighborhood-function wave
(neighborhood_function_bitmask) — independent Python BFS reference.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_anf_matches_python_bfs_reference(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    o2c = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, SF, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    by_u = defaultdict(set)
    for r in li:
        by_u[o2c[r.l_orderkey]].add(r.l_partkey % 50)
    adj = defaultdict(set)
    for items in by_u.values():
        for a in items:
            for b in items:
                if a != b:
                    adj[a].add(b)
    nodes = sorted(adj)
    n = len(nodes)
    balls = {v: {v} for v in nodes}
    per_radius = []
    for r in range(4):
        if r > 0:
            balls = {
                v: balls[v] | set().union(*(balls[u] for u in adj[v]))
                for v in nodes
            }
        per_radius.append(sum(len(b) for b in balls.values()))
    got = REGISTRY["neighborhood_function_bitmask"].spark(spark, SF).collect()
    assert [r.radius for r in got] == [0, 1, 2, 3]
    for row, pairs in zip(got, per_radius):
        assert row.pairs_reached == pairs, row.radius
        assert row.avg_ball_size_milli == pairs * 1000 // n
        assert row.reach_share_ppm == pairs * 1_000_000 // (n * n)
        assert row.covers_90pct == int(pairs * 10 >= n * n * 9)
    # monotone ball growth, and radius 0 is exactly the node count
    assert got[0].pairs_reached == n
    assert (
        got[0].pairs_reached
        <= got[1].pairs_reached
        <= got[2].pairs_reached
        <= got[3].pairs_reached
    )
