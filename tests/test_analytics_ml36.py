"""Invariant tests for the social-choice/percolation wave
(copeland_condorcet_ranking, percolation_threshold_scan) — independent
Python references. The percolation reference runs FULL union-find per
threshold; the entry's bounded 3-round labels must respect its bounds
(label count >= true components, giant lower bound <= true giant).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_copeland_matches_python_reference(spark):
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
    monthly = defaultdict(int)
    for r in (
        load_table(spark, SF, "orders")
        .selectExpr(
            "o_custkey",
            "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
            " AS mk",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .collect()
    ):
        monthly[(rname[n2r[cust[r.o_custkey]]], r.mk)] += r.cents
    regions = sorted({k[0] for k in monthly})
    months = sorted({k[1] for k in monthly})
    wins = defaultdict(int)
    shared = defaultdict(int)
    for x in regions:
        for y in regions:
            if x == y:
                continue
            for mk in months:
                if (x, mk) in monthly and (y, mk) in monthly:
                    shared[(x, y)] += 1
                    if monthly[(x, mk)] > monthly[(y, mk)]:
                        wins[(x, y)] += 1
    stats = {}
    for x in regions:
        w = l = t = 0
        for y in regions:
            if x == y:
                continue
            if wins[(x, y)] > wins[(y, x)]:
                w += 1
            elif wins[(x, y)] < wins[(y, x)]:
                l += 1
            else:
                t += 1
        stats[x] = (w, l, t)
    got = {r.r_name: r for r in
           REGISTRY["copeland_condorcet_ranking"].spark(spark, SF).collect()}
    assert set(got) == set(regions)
    order = sorted(regions, key=lambda x: (-(stats[x][0] - stats[x][1]), x))
    for x in regions:
        w, l, t = stats[x]
        r = got[x]
        assert (r.duel_wins, r.duel_losses, r.duel_ties) == (w, l, t)
        assert r.n_opponents == len(regions) - 1
        assert r.copeland_score == w - l
        assert r.condorcet_winner == int(w == len(regions) - 1)
        assert r.copeland_rank == order.index(x) + 1
    # at most one Condorcet winner can exist
    assert sum(r.condorcet_winner for r in got.values()) <= 1


def test_percolation_bounds_vs_exact_union_find(spark):
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
    edges = set()
    for items in by_u.values():
        for a in items:
            for b in items:
                if b < a:
                    edges.add((a, b))
    weighted = {
        (a, b): int(
            hashlib.md5(f"{b}-{a}".encode()).hexdigest()[:8], 16
        ) % 1000
        for a, b in edges
    }
    nodes = sorted({v for e in edges for v in e})
    got = {r.threshold_milli: r for r in
           REGISTRY["percolation_threshold_scan"].spark(spark, SF).collect()}
    assert set(got) == {100, 300, 500, 700, 900}
    prev_giant = 0
    for t in (100, 300, 500, 700, 900):
        kept = [e for e, w in weighted.items() if w < t]
        parent = {v: v for v in nodes}

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        for a, b in kept:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comps = defaultdict(int)
        for v in nodes:
            comps[find(v)] += 1
        true_n = len(comps)
        true_giant = max(comps.values())
        r = got[t]
        assert r.n_edges_kept == len(kept)
        # bounded rounds: label count upper-bounds nothing less than
        # the true component count; giant is a lower bound
        assert r.n_labels_bound >= true_n
        assert r.giant_lower_bound <= true_giant
        assert r.giant_share_milli == r.giant_lower_bound * 1000 // len(
            nodes
        )
        # percolation monotonicity: giant never shrinks as t grows
        assert r.giant_lower_bound >= prev_giant
        prev_giant = r.giant_lower_bound
