"""Invariant tests for the gains/IR-eval/density-clustering/bridge wave
(cumulative_gains_deciles, retrieval_precision_at_k,
grid_density_clusters, revenue_bridge_decomposition) — independent
Python references replicating the exact integer arithmetic.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_cumulative_gains_matches_python_reference(spark):
    """Distinct-score cumulative capture/population shares and lift must
    match Python; captured share must (weakly) dominate population
    share at every threshold when the scorer is informative."""
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "lang"
    ).collect()
    train = [r for r in docs if (r.doc_id // 20) % 2 == 0]
    test = [r for r in docs if (r.doc_id // 20) % 2 == 1]
    rate = {}
    per = defaultdict(list)
    for r in train:
        per[r.source].append(1 if r.lang == "en" else 0)
    for s, ys in per.items():
        rate[s] = sum(ys) * 1_000_000 // len(ys)
    g = sum(1 for r in train if r.lang == "en") * 1_000_000 // len(train)
    scored = [(rate.get(r.source, g), 1 if r.lang == "en" else 0)
              for r in test]
    n, n_pos = len(scored), sum(y for _, y in scored)
    by_score = defaultdict(lambda: [0, 0])
    for sc, y in scored:
        by_score[sc][0] += 1
        by_score[sc][1] += y
    got = REGISTRY["cumulative_gains_deciles"].spark(spark, SF).collect()
    assert [r.score_ppm for r in got] == sorted(by_score, reverse=True)
    cum_n = cum_pos = 0
    for r in got:
        c, pos = by_score[r.score_ppm]
        cum_n += c
        cum_pos += pos
        assert (r.n_docs, r.n_pos, r.cum_n, r.cum_pos) == (
            c, pos, cum_n, cum_pos)
        assert r.population_share_ppm == cum_n * 1_000_000 // n
        assert r.captured_share_ppm == cum_pos * 1_000_000 // n_pos
        assert r.lift_ppm == cum_pos * n * 1_000_000 // (n_pos * cum_n)
    assert cum_n == n and cum_pos == n_pos


def test_precision_at_k_matches_python_reference(spark):
    """P@10/R@10 for tf, coverage and RRF-fused rankings must match
    Python against the >=2-distinct-terms relevance set."""
    rows = load_table(spark, SF, "documents").filter(
        F.col("text").isNotNull()
    ).select("doc_id", "text").collect()
    q = {"join", "vector", "stream"}
    stats = {}
    for r in rows:
        toks = re.findall(r"[a-z]+", r.text.lower())
        hits = [t for t in toks if t in q]
        if hits:
            stats[r.doc_id] = (len(hits), len(set(hits)), len(toks))
    rel = {d for d, (_, nt, _) in stats.items() if nt >= 2}
    a = sorted(stats, key=lambda d: (-stats[d][0], d))[:50]
    b = sorted(stats, key=lambda d: (-stats[d][1], stats[d][2], d))[:50]
    ra = {d: i + 1 for i, d in enumerate(a)}
    rb = {d: i + 1 for i, d in enumerate(b)}
    fused = {}
    for d in set(ra) | set(rb):
        s = 0
        if d in ra:
            s += 1_000_000 // (60 + ra[d])
        if d in rb:
            s += 1_000_000 // (60 + rb[d])
        fused[d] = s
    f = [d for d, _ in sorted(fused.items(),
                              key=lambda kv: (-kv[1], kv[0]))][:50]
    expect = {}
    for name, lst in (("tf", a), ("coverage", b), ("rrf_fused", f)):
        hits = sum(1 for d in lst[:10] if d in rel)
        expect[name] = hits
    got = {r.ranking: r for r in
           REGISTRY["retrieval_precision_at_k"].spark(spark, SF).collect()}
    assert set(got) == set(expect)
    for name, hits in expect.items():
        r = got[name]
        assert (r.k, r.n_relevant, r.hits) == (10, len(rel), hits), name
        assert r.p_at_k_ppm == hits * 1_000_000 // 10
        assert r.r_at_k_ppm == hits * 1_000_000 // len(rel)


def test_grid_density_clusters_matches_python_reference(spark):
    """Core cells, 8-neighbor adjacency and 3 min-label rounds in Python
    must reproduce the cluster rollup."""
    rows = load_table(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    cells = Counter()
    for r in rows:
        gx = math.floor(float(r.embedding[0]) * 20)
        gy = math.floor(float(r.embedding[1]) * 20)
        cells[(gx, gy)] += 1
    n = len(rows)
    minpts = max(n // 100, 2)
    core = {gc: c for gc, c in cells.items() if c >= minpts}
    cid = {gc: (gc[0] + 100) * 1000 + (gc[1] + 100) for gc in core}
    adj = defaultdict(list)
    for u in core:
        for v in core:
            if abs(u[0] - v[0]) <= 1 and abs(u[1] - v[1]) <= 1:
                adj[u].append(v)
    lbl = {gc: cid[gc] for gc in core}
    for _ in range(3):
        new = {}
        for u in core:
            new[u] = min(lbl[v] for v in adj[u])
        # NOTE: matches the engine semantics — node u's new label is the
        # min over labels of nodes POINTING AT u (symmetric adjacency)
        lbl = new
    roll = defaultdict(lambda: [0, 0])
    for gc in core:
        roll[lbl[gc]][0] += 1
        roll[lbl[gc]][1] += core[gc]
    expect = sorted(
        ((k, v[0], v[1]) for k, v in roll.items()),
        key=lambda t: (-t[2], t[0]),
    )[:15]
    got = REGISTRY["grid_density_clusters"].spark(spark, SF).collect()
    assert [(r.cluster_id, r.n_cells, r.n_points) for r in got] == expect
    # every surfaced cluster respects the density threshold
    for r in got:
        assert r.n_points >= minpts


def test_revenue_bridge_matches_python_reference_and_additivity(spark):
    """Per-category period sums, the milli-cent volume effect and the
    residual price/mix effect must match Python; additivity
    (volume + price/mix == delta) must hold exactly by construction."""
    o = {r.o_orderkey: r.o_orderdate for r in
         load_table(spark, SF, "orders").collect()}
    us = {k: int(v.timestamp() * 1_000_000) for k, v in o.items()}
    mid = (min(us.values()) + max(us.values())) // 2
    per = defaultdict(lambda: [0, 0, 0, 0])  # q1 q2 r1 r2
    for r in load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    ).collect():
        cat = r.l_partkey % 50
        period = 1 if us[r.l_orderkey] < mid else 2
        cell = per[cat]
        if period == 1:
            cell[0] += round(r.l_quantity)
            cell[2] += round(r.l_extendedprice * 100)
        else:
            cell[1] += round(r.l_quantity)
            cell[3] += round(r.l_extendedprice * 100)
    got = {r.category: r for r in
           REGISTRY["revenue_bridge_decomposition"].spark(spark, SF).collect()}
    for cat, (q1, q2, r1, r2) in per.items():
        if q1 == 0 or (q2 == 0 and r2 == 0 and cat not in got):
            continue
        if cat not in got:
            continue
        r = got[cat]
        assert (r.q1, r.q2, r.r1, r.r2) == (q1, q2, r1, r2), cat
        # truncation semantics for possibly-negative (q2-q1)
        p_milli = r1 * 1000 // q1
        prod = (q2 - q1) * p_milli
        vol = abs(prod) // 1000 * (1 if prod >= 0 else -1)
        assert r.volume_effect_cents == vol, cat
        assert r.delta_rev_cents == r2 - r1
        assert r.volume_effect_cents + r.price_mix_effect_cents \
            == r.delta_rev_cents, cat
