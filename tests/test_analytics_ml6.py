"""Invariant tests for the absorbing-chain/RFM/readability/item-CF wave
(markov_absorption_3step, rfm_segmentation, readability_proxy_scores,
itemitem_collaborative_topk) — independent Python references replicating
the exact integer arithmetic.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_markov_absorption_matches_python_reference(spark):
    """h1/h2/h3 from the ppm transition matrix (floor-div chain) must
    match Python; horizons must be monotone nondecreasing in k."""
    rows = (
        load_table(spark, SF, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, s), (_, _, t) in zip(evs, evs[1:]):
            if s != "purchase":
                trans[(s, t)] += 1
    out = Counter()
    for (s, _), c in trans.items():
        out[s] += c
    p = {(s, t): c * 1_000_000 // out[s] for (s, t), c in trans.items()}
    states = sorted(out)
    h1 = {s: p.get((s, "purchase"), 0) for s in states}

    def step(prev):
        nxt = {}
        for s in states:
            acc = h1[s]
            for t in states:  # non-purchase targets only
                if (s, t) in p and t != "purchase":
                    acc += p[(s, t)] * prev[t] // 1_000_000
            nxt[s] = acc
        return nxt

    h2 = step(h1)
    h3 = step(h2)
    got = {r.state: r for r in
           REGISTRY["markov_absorption_3step"].spark(spark, SF).collect()}
    assert set(got) == set(states)
    for s in states:
        r = got[s]
        assert (r.p_1step_ppm, r.p_2step_ppm, r.p_3step_ppm) == (
            h1[s], h2[s], h3[s]), s
        assert r.p_1step_ppm <= r.p_2step_ppm <= r.p_3step_ppm
        assert 0 <= r.p_3step_ppm <= 1_000_000


def test_rfm_segmentation_matches_python_reference(spark):
    """Distinct-value-cumulative quintile scores and the segment lattice
    rollup must match Python; scores stay in 1..5 and segment sizes sum
    to the customer count."""
    rows = load_table(spark, SF, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    per = defaultdict(list)
    for r in rows:
        per[r.o_custkey].append((r.o_orderdate, r.o_totalprice))
    mx = max(d for v in per.values() for d, _ in v).date()
    cust = {}
    for k, v in per.items():
        recency = (mx - max(d for d, _ in v).date()).days
        freq = len(v)
        mon = sum(round(p * 100) for _, p in v) // 10000
        cust[k] = (recency, freq, mon)
    n = len(cust)

    def scores(idx, desc):
        cnt = Counter(v[idx] for v in cust.values())
        order = sorted(cnt, reverse=desc)
        cum = {}
        seen = 0
        for val in order:
            cum[val] = seen
            seen += cnt[val]
        return {val: 1 + cb * 5 // n for val, cb in cum.items()}

    rs = scores(0, desc=False)
    fs = scores(1, desc=True)
    ms = scores(2, desc=True)
    lattice = defaultdict(lambda: [0, 0])
    for rec, fr, mon in cust.values():
        key = (rs[rec], fs[fr], ms[mon])
        lattice[key][0] += 1
        lattice[key][1] += mon
    got = REGISTRY["rfm_segmentation"].spark(spark, SF).collect()
    assert {(r.r_score, r.f_score, r.m_score) for r in got} == set(lattice)
    for r in got:
        nseg, msum = lattice[(r.r_score, r.f_score, r.m_score)]
        assert r.n_customers == nseg
        assert r.avg_monetary_band == msum // nseg
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5
        assert 1 <= r.m_score <= 5
    assert sum(r.n_customers for r in got) == n


def test_readability_matches_python_reference(spark):
    """Vowel-group syllables, [.!?]+ sentences and the milli-unit FK
    formula must match Python per source."""
    rows = load_table(spark, SF, "documents").filter(
        F.col("text").isNotNull()
    ).select("source", "text").collect()
    agg = defaultdict(list)
    for r in rows:
        words = len(re.findall(r"[a-z]+", r.text.lower()))
        syll = len(re.findall(r"[aeiouy]+", r.text.lower()))
        sents = max(len(re.findall(r"[.!?]+", r.text)), 1)
        fk = 11800 * syll // max(words, 1) + 390 * words // sents - 15590
        agg[r.source].append(fk)
    got = {r.source: r for r in
           REGISTRY["readability_proxy_scores"].spark(spark, SF).collect()}
    assert set(got) == set(agg)
    for src, fks in agg.items():
        r = got[src]
        assert r.n_docs == len(fks)
        assert r.avg_fk_milli == sum(fks) // len(fks)
        assert (r.min_fk_milli, r.max_fk_milli) == (min(fks), max(fks))


def test_itemitem_cf_matches_python_reference(spark):
    """Co-occurrence dots, popularity norms and cos^2 ppm ordering must
    match Python; cos^2 respects the Cauchy-Schwarz bound."""
    rows = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey", (F.col("l_partkey") % 50).alias("i"))
        .distinct()
        .collect()
    )
    items_by_user = defaultdict(set)
    for r in rows:
        items_by_user[r.o_custkey].add(r.i)
    pop = Counter()
    for its in items_by_user.values():
        pop.update(its)
    dot = Counter()
    for its in items_by_user.values():
        s = sorted(its)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                dot[(s[x], s[y])] += 1
    scored = [
        (a, b, d, pop[a], pop[b], d * d * 1_000_000 // (pop[a] * pop[b]))
        for (a, b), d in dot.items()
    ]
    expect = sorted(scored, key=lambda t: (-t[5], t[0], t[1]))[:20]
    got = REGISTRY["itemitem_collaborative_topk"].spark(spark, SF).collect()
    assert [
        (r.item_a, r.item_b, r.dot, r.n_a, r.n_b, r.cos2_ppm) for r in got
    ] == expect
    for r in got:
        assert r.cos2_ppm <= 1_000_000  # Cauchy-Schwarz
        assert r.dot <= min(r.n_a, r.n_b)
