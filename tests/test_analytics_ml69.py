"""Invariant tests for round-5 wave 15: graph diameter via bitmasks and
Boruvka MST rounds — independent Python replays (BFS eccentricities;
2-round Boruvka + full Kruskal cross-check).
"""

from __future__ import annotations

from collections import defaultdict, deque

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_graph_diameter_python_replay(spark):
    orders = {o.o_orderkey: o.o_custkey
              for o in load_table(spark, SF, "orders").collect()}
    ui = {(orders[li.l_orderkey], li.l_partkey % 50)
          for li in load_table(spark, SF, "lineitem").collect()}
    by_u = defaultdict(set)
    for u, i in ui:
        by_u[u].add(i)
    adj = defaultdict(set)
    for items in by_u.values():
        for a in items:
            for b in items:
                if a != b:
                    adj[a].add(b)
    nodes = sorted(adj)

    def bfs_ecc(src):
        seen = {src: 0}
        dq = deque([src])
        while dq:
            v = dq.popleft()
            for w in adj[v]:
                if w not in seen:
                    seen[w] = seen[v] + 1
                    dq.append(w)
        # eccentricity WITHIN the reachable component (bitmask semantics:
        # the ball stops growing when the component is covered)
        return max(seen.values())

    eccs = {v: bfs_ecc(v) for v in nodes}
    r = REGISTRY["graph_diameter_bitmask"].spark(spark, SF).collect()[0]
    assert r.n_nodes == len(nodes)
    if r.converged == 1:
        diam, rad = max(eccs.values()), min(eccs.values())
        assert r.diameter == diam
        assert r.radius == rad
        assert r.n_peripheral == sum(1 for e in eccs.values() if e == diam)
        assert r.n_central == sum(1 for e in eccs.values() if e == rad)
    assert r.radius <= r.diameter <= 2 * r.radius  # metric-space bound
    assert r.converged == 1  # 4 rounds suffice on this graph


def test_boruvka_python_replay(spark):
    # sf0.01: the co-supplier graph is non-degenerate (100 nodes)
    by_order = defaultdict(list)
    for li in load_table(spark, SF01, "lineitem").collect():
        by_order[li.l_orderkey].append(li.l_suppkey)
    w = defaultdict(int)
    for sups in by_order.values():
        ss = sorted(sups)
        for i, s1 in enumerate(ss):
            for s2 in ss[i + 1:]:
                if s1 < s2:
                    w[(s1, s2)] += 1
    edges = {
        (s1, s2): 1000000 // c + (s1 * 31 + s2 * 17) % 997
        for (s1, s2), c in w.items()
        if c >= 2 and (s1 * 31 + s2 * 17) % 20 == 0
    }
    nodes = sorted({v for e in edges for v in e})
    lab = {v: v for v in nodes}
    selected = set()
    comp_counts = []
    for _ in range(2):
        # per-component cheapest outgoing edge, (cost, u, v) packed order
        best = {}
        for (s1, s2), cost in edges.items():
            for u, v in ((s1, s2), (s2, s1)):
                cu, cv = lab[u], lab[v]
                if cu != cv:
                    key = cost * 10**12 + u * 10**6 + v
                    if cu not in best or key < best[cu]:
                        best[cu] = key
        f = {}
        for cu, key in best.items():
            u = (key // 10**6) % 10**6
            v = key % 10**6
            selected.add((min(u, v), max(u, v)))
            f[cu] = lab[v]
        # merge to fixpoint (replay uses true convergence; the engine's
        # 6 pointer doublings must agree when its converged flag is 1)
        def resolve(c):
            seen = []
            while True:
                seen.append(c)
                nxt = f.get(c, c)
                if nxt == c or (f.get(nxt, nxt) == c):
                    root = min(c, nxt) if nxt != c else c
                    return root
                c = nxt

        newroot = {c: resolve(c) for c in set(lab.values())}
        lab = {v: newroot[lab[v]] for v in lab}
        comp_counts.append(len(set(lab.values())))
    r = REGISTRY["boruvka_mst_rounds"].spark(spark, SF01).collect()[0]
    assert r.converged == 1
    assert r.n_nodes == len(nodes)
    assert r.n_edges == len(edges)
    assert (r.n_components_r1, r.n_components_r2) == tuple(comp_counts)
    assert r.mst_edges == len(selected)
    assert r.mst_weight == sum(edges[e] for e in selected)
    # forest identity: picked edges form a spanning forest of the merges
    assert r.mst_edges == r.n_nodes - r.n_components_r2
    # Boruvka safety: with totally-ordered weights every picked edge is
    # in THE minimum spanning forest (Kruskal cross-check)
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    kruskal = set()
    for (s1, s2), cost in sorted(edges.items(),
                                 key=lambda kv: (kv[1], kv[0])):
        a, b = find(s1), find(s2)
        if a != b:
            parent[a] = b
            kruskal.add((s1, s2))
    assert selected <= kruskal
