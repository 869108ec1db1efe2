"""Invariant tests for round-5 wave 18: successive halving, RAKE
keyphrases, V-optimal histogram DP — independent Python replays at
sf0.001.
"""

from __future__ import annotations

import math
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

STOPS = {"a", "the", "is", "of", "and", "to", "in"}


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _cents(x: float) -> int:
    return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)


def test_successive_halving_python_replay(spark):
    cust = {c.c_custkey: c.c_nationkey
            for c in load_table(spark, SF, "customer").collect()}
    nat = {n.n_nationkey: n.n_name
           for n in load_table(spark, SF, "nation").collect()}
    arms = defaultdict(list)
    for o in load_table(spark, SF, "orders").collect():
        arms[nat[cust[o.o_custkey]]].append(
            (o.o_orderdate, o.o_orderkey, _cents(o.o_totalprice))
        )
    for v in arms.values():
        v.sort()

    def rank(names, budget):
        sums = {nm: sum(v for _, _, v in arms[nm][:budget]) for nm in names}
        return sorted(sums.items(), key=lambda kv: (-kv[1], kv[0]))

    k0 = rank(arms, 16)
    k1 = rank([nm for nm, _ in k0[:12]], 32)
    k2 = rank([nm for nm, _ in k1[:6]], 48)
    got = defaultdict(dict)
    for r in REGISTRY["successive_halving_arms"].spark(spark, SF).collect():
        got[r.rung][r.rank_in_rung] = r
    for rung, (ranked, budget, keep) in enumerate(
        ((k0, 16, 12), (k1, 32, 6), (k2, 48, 3))
    ):
        assert sorted(got[rung]) == list(range(1, len(ranked) + 1))
        for i, (nm, s) in enumerate(ranked, start=1):
            r = got[rung][i]
            assert (r.n_name, r.sum_cents, r.budget) == (nm, s, budget)
            assert r.kept == (1 if i <= keep else 0)
    # survivors are nested: each rung's arms come from the prior keeps
    assert {r.n_name for r in got[1].values()} <= {
        r.n_name for r in got[0].values() if r.kept
    }
    assert {r.n_name for r in got[2].values()} <= {
        r.n_name for r in got[1].values() if r.kept
    }


def test_rake_python_replay(spark):
    docs = [(d.doc_id, d.text)
            for d in load_table(spark, SF, "documents").collect()
            if d.text is not None]
    members = []  # (doc, grp, word)
    phrases = {}  # (doc, grp) -> (phrase, plen)
    for doc_id, text in docs:
        grp = 0
        run = []
        words = [w for w in text.lower().split(" ") if w != ""]
        for w in words:
            if w in STOPS:
                grp += 1
                run = []
            else:
                members.append((doc_id, grp, w))
        runs = defaultdict(list)
        for d2, g, w in members:
            if d2 == doc_id:
                runs[g].append(w)
        for g, ws in runs.items():
            phrases[(doc_id, g)] = (" ".join(ws), len(ws))
    freq = defaultdict(int)
    deg = defaultdict(int)
    for d2, g, w in members:
        freq[w] += 1
        deg[w] += phrases[(d2, g)][1]
    best = {}
    for (d2, g), (ph, plen) in phrases.items():
        sc = sum(tdiv(1000 * deg[w], freq[w])
                 for dd, gg, w in members if (dd, gg) == (d2, g))
        best[ph] = (plen, sc)
    top = sorted(best.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    rows = REGISTRY["rake_keyphrase_scores"].spark(spark, SF).collect()
    assert len(rows) == min(20, len(best))
    for r, (ph, (plen, sc)) in zip(rows, top):
        assert (r.phrase, r.n_words, r.score_milli) == (ph, plen, sc)
    # RAKE favors long stopword-free runs: top phrase is multi-word
    assert rows[0].n_words >= 2


def test_voptimal_python_replay(spark):
    per = defaultdict(int)
    for r in load_table(spark, SF, "events").collect():
        if r.event_type == "purchase":
            per[r.ts.date()] += _cents(r.value)
    xs = sorted(per.values())
    n = len(xs)
    S = [0] * (n + 1)
    Q = [0] * (n + 1)
    for i, x in enumerate(xs, start=1):
        S[i] = S[i - 1] + x
        Q[i] = Q[i - 1] + x * x

    def sse(j, t):
        ln = t - j + 1
        return tdiv(ln * (Q[t] - Q[j - 1]) - (S[t] - S[j - 1]) ** 2, ln)

    BIG = 1 << 60
    c = [sse(1, t) for t in range(1, n + 1)]
    totals = {1: c[n - 1]}
    for b in range(2, 6):
        c2 = []
        for t in range(1, n + 1):
            if t < b:
                c2.append(BIG)
            else:
                c2.append(min(c[j - 2] + sse(j, t) for j in range(2, t + 1)))
        c = c2
        totals[b] = c[n - 1]
    got = {r.n_buckets: r for r in
           REGISTRY["voptimal_histogram_dp"].spark(spark, SF).collect()}
    assert sorted(got) == [1, 2, 3, 4, 5]
    for b in range(1, 6):
        r = got[b]
        assert r.sse_total == totals[b]
        assert r.reduction_ppm == tdiv(
            1000000 * (totals[1] - totals[b]), totals[1]
        )
    # more buckets never hurt: SSE is nonincreasing in B and reaches 0
    # only if B >= number of distinct values
    sses = [got[b].sse_total for b in range(1, 6)]
    assert sses == sorted(sses, reverse=True)
    assert all(v >= 0 for v in sses)
