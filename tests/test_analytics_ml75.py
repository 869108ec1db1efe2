"""Invariant tests for round-6 wave 21 (part 2): Hurst R/S, LCS,
Schulze, synthetic control, TextRank, betweenness, greedy matching —
independent Python replays at sf0.001.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import pytest

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _cents(x: float) -> int:
    return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)


def test_hurst_python_replay(spark):
    per: dict = defaultdict(int)
    for e in load_table(spark, SF, "events").collect():
        if e.event_type == "purchase":
            per[e.ts.date()] += _cents(e.value)
    xs = [tdiv(v, 100) for _, v in sorted(per.items())]
    nd = len(xs)
    pts = []
    for s in (5, 10, 15):
        rsvals = []
        for b in range(nd // s):
            blk = xs[b * s:(b + 1) * s]
            sb, qb = sum(blk), sum(x * x for x in blk)
            cums, run = [], 0
            for k, x in enumerate(blk, start=1):
                run += x
                cums.append(s * run - k * sb)
            r_scaled = max(cums) - min(cums)
            rsvals.append(r_scaled / math.sqrt(s * qb - sb * sb))
        pts.append((s, len(rsvals),
                    sum(round(v, 8) for v in rsvals) / len(rsvals)))
    k = len(pts)
    sx = sum(round(math.log(s), 10) for s, _, _ in pts)
    sy = sum(round(math.log(m), 10) for _, _, m in pts)
    sxx = sum(round(math.log(s) ** 2, 10) for s, _, _ in pts)
    sxy = sum(round(math.log(s) * math.log(m), 10) for s, _, m in pts)
    hurst = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    rows = REGISTRY["rescaled_range_hurst"].spark(spark, SF).collect()
    assert [(r.block_size, r.n_blocks) for r in rows] == [
        (s, nb) for s, nb, _ in pts
    ]
    for r, (_, _, m) in zip(rows, pts):
        assert r.rs_mean == pytest.approx(m, abs=2e-4)
        assert r.hurst_exponent == pytest.approx(hurst, abs=2e-6)
    # a well-defined exponent in the open (0, 1) band
    assert 0.0 < rows[0].hurst_exponent < 1.0


def test_lcs_python_replay(spark):
    counts: dict = defaultdict(int)
    for e in load_table(spark, SF, "events").collect():
        counts[(e.user_id % 2, e.ts.date(), e.event_type)] += 1
    modal: dict = {}
    for (g, d, et), c in counts.items():
        cur = modal.get((g, d))
        if cur is None or (-c, et) < (-cur[0], cur[1]):
            modal[(g, d)] = (c, et)
    seqs = {0: [], 1: []}
    for (g, d) in sorted(modal):
        seqs[g].append(modal[(g, d)][1])
    a, b = seqs[0], seqs[1]
    n, m = len(a), len(b)
    # classic row DP, written differently from both engine lanes
    prev = [0] * (m + 1)
    for i in range(1, n + 1):
        cur = [0] * (m + 1)
        for j in range(1, m + 1):
            cur[j] = (prev[j - 1] + 1 if a[i - 1] == b[j - 1]
                      else max(prev[j], cur[j - 1]))
        prev = cur
    lcs = prev[m]
    r = REGISTRY["lcs_event_type_sequences"].spark(spark, SF).collect()[0]
    assert (r.n_a, r.n_b, r.lcs_len) == (n, m, lcs)
    assert r.similarity_milli == tdiv(2000 * lcs, n + m)
    # both cohorts sample the same generator: sequences mostly align
    assert lcs >= max(n, m) // 2


def _brand_spend(spark):
    part = {p.p_partkey: p.p_brand
            for p in load_table(spark, SF, "part").collect()}
    okey = {o.o_orderkey: o.o_custkey
            for o in load_table(spark, SF, "orders").collect()}
    rev: dict = defaultdict(int)
    spend: dict = defaultdict(int)
    for li in load_table(spark, SF, "lineitem").collect():
        b = part[li.l_partkey]
        c = _cents(li.l_extendedprice)
        rev[b] += c
        spend[(okey[li.l_orderkey], b)] += c
    return rev, spend


def test_schulze_python_replay(spark):
    rev, spend = _brand_spend(spark)
    cands = sorted(sorted(rev, key=lambda b: (-rev[b], b))[:5])
    voters = sorted({c for (c, b) in spend if b in cands})
    d: dict = defaultdict(int)
    for v in voters:
        s = {b: spend.get((v, b), 0) for b in cands}
        for x in cands:
            for y in cands:
                if x != y and s[x] > s[y]:
                    d[(x, y)] += 1
    p = {}
    for x in cands:
        for y in cands:
            if x != y:
                p[(x, y)] = d[(x, y)] if d[(x, y)] > d[(y, x)] else 0
    for k in cands:
        for x in cands:
            for y in cands:
                if x != y and x != k and y != k:
                    p[(x, y)] = max(p[(x, y)], min(p[(x, k)], p[(k, y)]))
    wins = {x: sum(1 for y in cands if x != y and p[(x, y)] > p[(y, x)])
            for x in cands}
    ranked = sorted(cands, key=lambda x: (-wins[x], x))
    rows = REGISTRY["schulze_beatpath_ranking"].spark(spark, SF).collect()
    assert [(r.candidate, r.wins, r.schulze_rank) for r in rows] == [
        (c, wins[c], i + 1) for i, c in enumerate(ranked)
    ]
    # a full Schulze order exists (no universal tie)
    assert rows[0].wins > rows[-1].wins


def test_synthetic_control_python_replay(spark):
    cnk = {c.c_custkey: c.c_nationkey
           for c in load_table(spark, SF, "customer").collect()}
    monthly: dict = defaultdict(int)
    for o in load_table(spark, SF, "orders").collect():
        mth = o.o_orderdate.date().replace(day=1)
        monthly[(cnk[o.o_custkey], mth)] += _cents(o.o_totalprice)
    monthly = {k: tdiv(v, 100000) for k, v in monthly.items()}
    months = sorted({m for (_, m) in monthly})
    mm = len(months)
    cut = (mm * 3) // 5
    pre, post = set(months[:cut]), months[cut:]
    treated = {m: monthly.get((0, m), 0) for m in months
               if (0, m) in monthly}
    ssd: dict = {}
    for (nk, m), v in monthly.items():
        if nk != 0 and m in pre and m in treated:
            ssd[nk] = ssd.get(nk, 0) + (treated[m] - v) ** 2
    inv = {nk: tdiv(10**12, 10**6 + s) for nk, s in ssd.items()}
    tiv = sum(inv.values())
    w = {nk: tdiv(10**6 * iv, tiv) for nk, iv in inv.items()}
    synth: dict = defaultdict(int)
    for (nk, m), v in monthly.items():
        if nk in w:
            synth[m] += w[nk] * v
    synth = {m: tdiv(v, 10**6) for m, v in synth.items()}
    rows = REGISTRY["synthetic_control_distance_weights"].spark(
        spark, SF
    ).collect()
    expect = [m for m in post if m in treated and m in synth]
    assert [r.month for r in rows] == expect
    for r in rows:
        assert r.treated_rev_k == treated[r.month]
        assert r.synth_rev_k == synth[r.month]
        assert r.gap_k == treated[r.month] - synth[r.month]


def test_textrank_python_replay(spark):
    edges = set()
    for doc in load_table(spark, SF, "documents").collect():
        if doc.text is None:
            continue
        toks = [t for t in re.split(r"[^a-z]+", doc.text.lower())
                if len(t) >= 3]
        for x, y in zip(toks, toks[1:]):
            if x != y:
                edges.add((x, y))
                edges.add((y, x))
    nodes = sorted({s for s, _ in edges})
    n = len(nodes)
    deg: dict = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    scale = 10**12
    pr = {v: scale // n for v in nodes}
    for _ in range(3):
        inc: dict = defaultdict(int)
        for s, t in edges:
            inc[t] += pr[s] // deg[s]
        pr = {v: (15 * scale) // (100 * n) + (85 * inc[v]) // 100
              for v in nodes}
    top = sorted(nodes, key=lambda v: (-pr[v], v))[:20]
    rows = REGISTRY["textrank_keyword_scores"].spark(spark, SF).collect()
    assert [(r.keyword, r.pr) for r in rows] == [(v, pr[v]) for v in top]


def _thinned_graph(spark):
    okey = {o.o_orderkey: o.o_custkey
            for o in load_table(spark, SF, "orders").collect()
            if o.o_orderkey % 10 == 0}
    e0 = set()
    for li in load_table(spark, SF, "lineitem").collect():
        if li.l_orderkey in okey:
            e0.add((f"c{okey[li.l_orderkey]}", f"s{li.l_suppkey}"))
    return e0


def test_betweenness_python_replay(spark):
    e0 = _thinned_graph(spark)
    adj: dict = defaultdict(set)
    for c, s in e0:
        adj[c].add(s)
        adj[s].add(c)
    seeds = sorted(v for v in adj if v.startswith("c"))[:3]
    bc: dict = defaultdict(int)
    for seed in seeds:
        dist = {seed: 0}
        sigma = {seed: 1}
        frontier = [seed]
        levels = {0: [seed]}
        for d in range(1, 5):
            nxt: dict = defaultdict(int)
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        nxt[w] += sigma[v]
            for w, sg in nxt.items():
                dist[w] = d
                sigma[w] = sg
            frontier = sorted(nxt)
            levels[d] = frontier
        delta: dict = defaultdict(int)
        for d in (3, 2, 1):
            for v in levels.get(d, []):
                acc = 0
                for w in adj[v]:
                    if dist.get(w) == d + 1:
                        acc += tdiv(sigma[v] * (1000 + delta[w]), sigma[w])
                if acc:
                    delta[v] = acc
            for v in levels.get(d, []):
                bc[v] += delta[v]
    top = sorted((v for v in bc if bc[v] > 0 or True),
                 key=lambda v: (-bc[v], v))[:15]
    rows = REGISTRY["betweenness_sampled_sources"].spark(spark, SF).collect()
    assert [(r.node, r.bc_milli) for r in rows] == [(v, bc[v]) for v in top]
    # suppliers bridge customer pairs in the bipartite graph: the top
    # broker is a supplier node
    assert rows[0].node.startswith("s")


def test_greedy_matching_python_replay(spark):
    e0 = _thinned_graph(spark)

    def prio(s, d):
        h = hashlib.md5(f"{s}|{d}".encode()).hexdigest()[:15]
        return int(h, 16)

    live = {(s, d): prio(s, d) for (s, d) in e0}
    results = []
    for _ in range(3):
        by_src: dict = defaultdict(list)
        by_dst: dict = defaultdict(list)
        for (s, d), h in live.items():
            by_src[s].append((h, s, d))
            by_dst[d].append((h, s, d))
        sel = []
        for (s, d), h in live.items():
            if min(by_src[s]) == (h, s, d) and min(by_dst[d]) == (h, s, d):
                sel.append((s, d))
        matched = {v for e in sel for v in e}
        results.append(len(sel))
        live = {e: h for e, h in live.items()
                if e[0] not in matched and e[1] not in matched}
    rows = REGISTRY["greedy_maximal_matching_rounds"].spark(spark, SF).collect()
    cum = 0
    for r, got in zip(rows, results):
        cum += got
        assert (r.round, r.matched_in_round, r.matched_cumulative) == (
            rows.index(r) + 1, got, cum
        )
        assert r.edges_left_after_all == len(live)
    # round sizes shrink as the graph thins
    assert results[0] >= results[-1]
