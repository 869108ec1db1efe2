"""Invariant tests for the modularity/BOM wave
(modularity_score_partition, bom_explosion_recursive) — independent
Python references.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_modularity_matches_python_reference(spark):
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
                if a < b:
                    edges.add((a, b))
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    m = len(edges)
    parts = {
        "half_split": lambda v: 0 if v < 25 else 1,
        "mod4_random": lambda v: v % 4,
    }
    got = {r.partition_name: r for r in
           REGISTRY["modularity_score_partition"].spark(spark, SF).collect()}
    assert set(got) == set(parts)
    for name, assign in parts.items():
        in_c = defaultdict(int)
        tot_c = defaultdict(int)
        for a, b in edges:
            if assign(a) == assign(b):
                in_c[assign(a)] += 1
        for v, k in deg.items():
            tot_c[assign(v)] += k
        q_num = sum(
            in_c.get(c, 0) * 4 * m - tot_c[c] * tot_c[c] for c in tot_c
        )
        r = got[name]
        assert r.n_communities == len(tot_c)
        assert r.m_edges == m
        assert r.intra_edges == sum(in_c.values())
        assert r.q_num == q_num, name
        # Spark div / DuckDB // truncate toward zero on negatives;
        # Python // floors — replicate truncation
        want_q = abs(q_num) * 1_000_000 // (4 * m * m)
        if q_num < 0:
            want_q = -want_q
        assert r.q_ppm == want_q
        # modularity is bounded: Q <= 1
        assert r.q_ppm <= 1_000_000


def test_bom_explosion_matches_python_reference(spark):
    keys = {
        r.p_partkey
        for r in load_table(spark, SF, "part").select("p_partkey").collect()
    }
    bom = defaultdict(list)  # parent -> [(child, qty)]
    children = set()
    for k in keys:
        for child, qty in ((k * 5 + 1, 2), (k * 5 + 2, 3)):
            if child in keys:
                bom[k].append((child, qty))
                children.add(child)
    roots = {p for p in bom if p not in children}
    levels = defaultdict(list)  # depth -> [(root, component, units)]
    frontier = [(r, r, 1) for r in sorted(roots)]
    levels[0] = list(frontier)
    for depth in range(1, 5):
        nxt = []
        for root, comp, units in frontier:
            for child, qty in bom.get(comp, []):
                nxt.append((root, child, units * qty))
        if not nxt:
            break
        levels[depth] = nxt
        frontier = nxt
    got = {r.depth: r for r in
           REGISTRY["bom_explosion_recursive"].spark(spark, SF).collect()}
    assert set(got) == {d for d, rows in levels.items() if rows}
    for depth, rows in levels.items():
        if not rows:
            continue
        r = got[depth]
        assert r.n_requirement_lines == len(rows)
        assert r.n_roots == len({x[0] for x in rows})
        assert r.n_components == len({x[1] for x in rows})
        assert r.total_units == sum(x[2] for x in rows)
        assert r.max_units == max(x[2] for x in rows)
    # multiplicative state: max units at depth d is a product of d
    # per-edge quantities, each <= 3
    for depth in levels:
        if levels[depth]:
            assert got[depth].max_units <= 3 ** depth
