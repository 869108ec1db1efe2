"""Invariant tests for the capture-recapture/diversification wave
(lincoln_petersen_population, mmr_diversified_rerank) — independent
Python references.
"""

from __future__ import annotations

import re
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_lincoln_petersen_matches_python_reference(spark):
    rows = (
        load_table(spark, SF, "events")
        .selectExpr("user_id", "day(ts) AS d")
        .collect()
    )
    w1 = {r.user_id for r in rows if r.d <= 15}
    w2 = {r.user_id for r in rows if r.d > 15}
    n1, n2, m = len(w1), len(w2), len(w1 & w2)
    true_pop = len(w1 | w2)
    chapman = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    r = REGISTRY["lincoln_petersen_population"].spark(spark, SF).collect()[0]
    assert (r.n1, r.n2, r.m, r.true_pop) == (n1, n2, m, true_pop)
    assert r.chapman_estimate == chapman
    assert r.est_vs_true_ppm == chapman * 1_000_000 // true_pop
    # Chapman is bounded below by the larger single sample
    assert r.chapman_estimate >= max(n1, n2)


def test_mmr_matches_python_reference(spark):
    docs = (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("doc_id", "text")
        .collect()
    )
    tokens = {}
    stats = {}
    for r in docs:
        toks = re.findall("[a-z]+", r.text.lower())
        tf = toks.count("join")
        if tf:
            tokens[r.doc_id] = set(toks)
            stats[r.doc_id] = (tf, len(toks))
    cand = sorted(stats, key=lambda d: (-stats[d][0], d))[:20]
    rel = {d: stats[d][0] * 1_000_000 // stats[d][1] for d in cand}

    def jac(a, b):
        ix = len(tokens[a] & tokens[b])
        return ix * 1_000_000 // (len(tokens[a]) + len(tokens[b]) - ix)

    def tdiv(a, b):  # engines truncate toward zero on negatives
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    picks = []
    selected = []
    for k in range(3):
        if not selected:
            best = min(cand, key=lambda d: (-rel[d], d))
            picks.append((1, best, rel[best], 0, tdiv(700 * rel[best], 1000)))
        else:
            scored = []
            for d in cand:
                if d in selected:
                    continue
                ms = max(jac(d, s) for s in selected)
                scored.append(
                    (d, rel[d], ms, tdiv(700 * rel[d] - 300 * ms, 1000))
                )
            best_row = min(scored, key=lambda s: (-s[3], s[0]))
            picks.append((k + 1,) + best_row[:1] + best_row[1:])
        selected.append(picks[-1][1])
    got = REGISTRY["mmr_diversified_rerank"].spark(spark, SF).collect()
    assert len(got) == 3
    for r, (pk, doc, relv, ms, mmr) in zip(got, picks):
        assert (r.pick, r.doc_id) == (pk, doc)
        assert r.rel_ppm == relv
        assert r.max_sim_ppm == ms
        assert r.mmr_score == mmr
    # diversification: pick 1 is the pure-relevance argmax
    assert got[0].rel_ppm == max(rel.values())
