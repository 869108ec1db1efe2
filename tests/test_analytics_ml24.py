"""Invariant tests for the paradox/bipartite/knapsack wave
(simpson_paradox_audit, bipartiteness_check_rounds,
knapsack_greedy_selection) — independent Python references.

The knapsack reference runs the PLAIN globally-sorted greedy; agreement
proves the entry's banded-prefix decomposition selects the identical
set. The bipartite reference runs the textbook BFS 2-coloring to the
same 3-round horizon.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_simpson_audit_matches_python_reference(spark):
    cells = defaultdict(lambda: [0, 0, 0, 0])  # n1, y1, n0, y0
    for r in (
        load_table(spark, SF, "orders")
        .selectExpr(
            "CAST(year(o_orderdate) AS BIGINT) AS yr",
            "o_orderpriority", "o_orderstatus",
        )
        .collect()
    ):
        t = 1 if r.o_orderpriority in ("1-URGENT", "2-HIGH") else 0
        s = 1 if r.o_orderstatus == "F" else 0
        c = cells[r.yr]
        if t:
            c[0] += 1
            c[1] += s
        else:
            c[2] += 1
            c[3] += s
    overall = [sum(c[i] for c in cells.values()) for i in range(4)]
    cells[-1] = overall

    def sign(c):
        d = c[1] * c[2] - c[3] * c[0]
        return (d > 0) - (d < 0)

    osign = sign(cells[-1])
    got = {r.stratum: r for r in
           REGISTRY["simpson_paradox_audit"].spark(spark, SF).collect()}
    assert set(got) == set(cells)
    for yr, c in cells.items():
        r = got[yr]
        assert (r.n1, r.y1, r.n0, r.y0) == tuple(c)
        assert r.rate1_ppm == c[1] * 1_000_000 // c[0]
        assert r.rate0_ppm == c[3] * 1_000_000 // c[2]
        assert r.diff_sign == sign(c)
        assert r.overall_sign == osign
        want_rev = int(
            yr != -1 and sign(c) != 0 and osign != 0 and sign(c) != osign
        )
        assert r.reverses == want_rev


def test_bipartiteness_matches_bfs_reference(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    o2c = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, SF, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    ui = {(o2c[r.l_orderkey], r.l_partkey % 50) for r in li}
    by_u = defaultdict(set)
    for u, i in ui:
        by_u[u].add(i)
    edges = set()
    for items in by_u.values():
        for a in items:
            for b in items:
                if a != b:
                    edges.add((a, b))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    seed = min(a for a, _ in edges)
    colors = {seed: {0}}   # node -> colors ever received
    resolved = {seed: 0}
    for _ in range(3):
        new = defaultdict(set)
        for n, c in resolved.items():
            for m in adj[n]:
                new[m].add(1 - c)
        allcols = defaultdict(set)
        for n, cs in colors.items():
            allcols[n] |= cs
        for n, cs in new.items():
            allcols[n] |= cs
        colors = allcols
        resolved = {n: min(cs) for n, cs in colors.items()}
    ambiguous = sum(1 for cs in colors.values() if len(cs) > 1)
    conflicts = sum(
        1
        for a, b in edges
        if a < b and a in resolved and b in resolved
        and resolved[a] == resolved[b]
    )
    r = REGISTRY["bipartiteness_check_rounds"].spark(spark, SF).collect()[0]
    assert r.n_undirected_edges == len(edges) // 2
    assert r.n_reached == len(resolved)
    assert r.n_ambiguous_nodes == ambiguous
    assert r.n_conflict_edges == conflicts
    assert r.bipartite_so_far == int(ambiguous == 0 and conflicts == 0)
    # the co-purchase projection of a dense bipartite graph has
    # triangles, so 3 rounds from any seed inside a component with >= 3
    # mutually linked items must certify NOT bipartite
    if any(
        b in adj[c]
        for a in adj
        for b in adj[a]
        for c in adj[a] & adj[b]
        if len({a, b, c}) == 3
    ):
        assert r.bipartite_so_far == 0


def test_knapsack_matches_global_greedy_reference(spark):
    items = [
        (r.s_suppkey, int(r.v), r.s_suppkey % 100 + 1)
        for r in load_table(spark, SF, "supplier")
        .filter("s_acctbal > 0")
        .selectExpr("s_suppkey", "round(s_acctbal * 100) AS v")
        .collect()
    ]
    total_w = sum(w for _, _, w in items)
    budget = total_w // 4
    order = sorted(
        items, key=lambda it: (-(it[1] * 1_000_000 // it[2]), it[0])
    )
    # the greedy prefix stops at the FIRST item that doesn't fit
    # (cumulative-window semantics: chosen = prefix with full cumsum
    # <= budget, matching both the entry and its oracle)
    cw = cv = nch = 0
    running = 0
    next_ratio = None
    for k, v, w in order:
        running += w
        if running <= budget:
            cw += w
            cv += v
            nch += 1
        elif next_ratio is None:
            next_ratio = v * 1_000_000 // w
    r = REGISTRY["knapsack_greedy_selection"].spark(spark, SF).collect()[0]
    assert r.n_items == len(items)
    assert r.total_weight == total_w
    assert r.budget == budget
    assert (r.n_chosen, r.chosen_weight, r.chosen_value) == (nch, cw, cv)
    assert r.next_ratio_ppm == next_ratio
    assert r.frac_bound_milli == cv * 1000 + (budget - cw) * next_ratio // 1000
    # approximation guarantee: greedy value never exceeds the bound
    assert cv * 1000 <= r.frac_bound_milli
