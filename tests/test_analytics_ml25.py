"""Invariant tests for the attribution/LM-retrieval/inventory wave
(markov_removal_attribution, dirichlet_lm_retrieval,
eoq_order_quantity) — independent Python references.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

_CHANNELS = ["click", "view", "signup", "error"]


def _chains(spark):
    ev = sorted(
        load_table(spark, SF, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r.event_type)
    return by_user


def _conv_ppm(by_user, removed):
    trans = Counter()
    outc = Counter()
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            if a != "purchase":
                trans[(a, b)] += 1
                outc[a] += 1
    p = {}  # (s,t) -> ppm, over the FULL chain then filtered
    for (a, b), c in trans.items():
        p[(a, b)] = c * 1_000_000 // outc[a]
    states = {s for s, _ in p} | {t for _, t in p}
    if removed:
        p = {
            (a, b): v
            for (a, b), v in p.items()
            if a != removed and b != removed
        }
    h1 = defaultdict(int)
    for (a, b), v in p.items():
        if b == "purchase":
            h1[a] = max(h1[a], v)
    srcs = {a for a, _ in p}
    h = {s: h1.get(s, 0) for s in srcs}

    def step(prev):
        nxt = {}
        for s in srcs:
            acc = 0
            for (a, b), v in p.items():
                if a == s and b != "purchase" and b in prev:
                    acc += v * prev[b] // 1_000_000
            nxt[s] = h1.get(s, 0) + acc
        return nxt

    h3 = step(step(h))
    firsts = Counter(seq[0] for seq in by_user.values())
    n = sum(firsts.values())
    acc = firsts.get("purchase", 0) * 1_000_000
    for s, cnt in firsts.items():
        if s == "purchase" or s == removed:
            continue
        acc += cnt * h3.get(s, 0)
    return acc // n


def test_markov_removal_matches_python_reference(spark):
    by_user = _chains(spark)
    base = _conv_ppm(by_user, None)
    effects = {}
    convs = {"none": base}
    for c in _CHANNELS:
        convs[c] = _conv_ppm(by_user, c)
        effects[c] = (
            0 if base == 0 else (base - convs[c]) * 1_000_000 // base
        )
    te = sum(effects.values())
    got = {r.variant: r for r in
           REGISTRY["markov_removal_attribution"].spark(spark, SF).collect()}
    assert set(got) == set(convs)
    for v, r in got.items():
        assert r.conv_ppm == convs[v], v
        want_eff = 0 if v == "none" else effects[v]
        assert r.removal_effect_ppm == want_eff, v
        want_share = (
            0 if v == "none" or te == 0 else effects[v] * 1_000_000 // te
        )
        assert r.attribution_share_ppm == want_share, v
        # removal can only lose paths (no renormalization)
        assert r.conv_ppm <= base


_PANEL = ["join", "vector", "stream"]


def test_dirichlet_lm_matches_python_reference(spark):
    docs = (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("doc_id", "text")
        .collect()
    )
    total = 0
    cfreq = Counter()
    per_doc = {}
    for r in docs:
        toks = re.findall("[a-z]+", r.text.lower())
        total += len(toks)
        cnt = Counter(toks)
        per_doc[r.doc_id] = (len(toks), cnt)
        for q in _PANEL:
            cfreq[q] += cnt.get(q, 0)
    pc = {q: cfreq[q] * 1_000_000 // total for q in _PANEL}
    scored = []
    for doc_id, (dl, cnt) in per_doc.items():
        if not any(cnt.get(q, 0) for q in _PANEL):
            continue
        fs = [
            (cnt.get(q, 0) * 1_000_000 + 100 * pc[q]) // (dl + 100)
            for q in _PANEL
        ]
        score = (fs[0] * fs[1] // 1_000_000) * fs[2] // 1_000_000
        scored.append((doc_id, dl, score))
    top = sorted(scored, key=lambda s: (-s[2], s[0]))[:10]
    got = REGISTRY["dirichlet_lm_retrieval"].spark(spark, SF).collect()
    assert len(got) == len(top)
    for r, (doc_id, dl, score) in zip(got, top):
        assert (r.doc_id, r.dl, r.score_ppm) == (doc_id, dl, score)
    # smoothing property: every candidate got a nonzero score
    assert all(s > 0 for _, _, s in scored)


def test_eoq_matches_python_reference(spark):
    part_brand = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, SF, "part")
        .select("p_partkey", "p_brand")
        .collect()
    }
    demand = defaultdict(int)
    for r in (
        load_table(spark, SF, "lineitem")
        .selectExpr("l_partkey", "CAST(l_quantity AS BIGINT) AS q")
        .collect()
    ):
        demand[part_brand[r.l_partkey]] += r.q
    got = {r.p_brand: r for r in
           REGISTRY["eoq_order_quantity"].spark(spark, SF).collect()}
    assert set(got) == {b for b, d in demand.items() if math.isqrt(900 * d)}
    for brand, d in demand.items():
        r = got[brand]
        x = 900 * d
        iroot = math.isqrt(x)

        def cost(q):
            return x // q + q

        eoq = iroot + 1 if cost(iroot + 1) < cost(iroot) else iroot
        assert r.demand == d
        assert r.eoq == eoq, brand
        assert r.cost_at == cost(eoq)
        assert r.cost_minus == (cost(eoq - 1) if eoq > 1 else None)
        assert r.cost_plus == cost(eoq + 1)
        want_opt = int(
            (eoq == 1 or cost(eoq) <= cost(eoq - 1))
            and cost(eoq) <= cost(eoq + 1)
        )
        assert r.is_optimal == want_opt
        # EOQ is the true integer argmin of the convex cost curve
        assert want_opt == 1
