"""Invariant tests for the seeding/link-prediction wave
(kcenter_greedy_seeding, resource_allocation_link_prediction) —
independent Python references.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_kcenter_matches_python_reference(spark):
    rows = (
        load_table(spark, SF, "embeddings")
        .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS emb")
        .collect()
    )
    scale = max(max(abs(x) for x in r.emb) for r in rows)

    def rnd(x):  # round half away from zero, like Spark/DuckDB round()
        import math
        v = x * 127.0 / scale
        return int(math.floor(v + 0.5)) if v >= 0 else -int(
            math.floor(-v + 0.5)
        )

    pts = {r.vec_id: [rnd(x) for x in r.emb] for r in rows}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    c1 = min(pts)
    centers = [(1, c1, 0)]
    md = {v: d2(q, pts[c1]) for v, q in pts.items()}
    for k in (2, 3, 4):
        ck = min(pts, key=lambda v: (-md[v], v))
        centers.append((k, ck, md[ck]))
        for v, q in pts.items():
            md[v] = min(md[v], d2(q, pts[ck]))
    radius = max(md.values())
    got = REGISTRY["kcenter_greedy_seeding"].spark(spark, SF).collect()
    assert len(got) == 4
    seps = []
    for r, (k, ck, sep) in zip(got, centers):
        assert (r.k, r.center_vec_id, r.sep_d2) == (k, ck, sep)
        assert r.coverage_radius2 == radius
        seps.append(sep)
    # Gonzalez certificate: separations are non-increasing and each
    # upper-bounds the final coverage radius
    assert seps[1] >= seps[2] >= seps[3] >= radius


def test_ra_link_prediction_matches_python_reference(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey % 200)
    n = len(baskets)
    cocount = defaultdict(int)
    for s in baskets.values():
        for a in s:
            for b in s:
                if a != b:
                    cocount[(a, b)] += 1
    edges = {p for p, c in cocount.items() if c * 2000 >= n}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    deg = {v: len(adj[v]) for v in adj}
    scores = defaultdict(lambda: [0, 0])
    for x in adj:
        for z in adj[x]:
            for y in adj[z]:
                if y <= x or (x, y) in edges:
                    continue
                s = scores[(x, y)]
                s[0] += 1
                s[1] += 1_000_000 // deg[z]
    want = sorted(
        ((v[1], -x, -y, x, y, v[0]) for (x, y), v in scores.items()),
        key=lambda t: (-t[0], t[3], t[4]),
    )[:20]
    got = REGISTRY["resource_allocation_link_prediction"].spark(
        spark, SF
    ).collect()
    assert len(got) == min(20, len(scores))
    for r, (ra, _nx, _ny, x, y, cn) in zip(got, want):
        assert (r.item_a, r.item_b) == (x, y)
        assert r.common_neighbors == cn
        assert r.ra_index_ppm == ra
    # a non-edge's RA score is bounded by its common-neighbor count
    for r in got:
        assert r.ra_index_ppm <= r.common_neighbors * 1_000_000
