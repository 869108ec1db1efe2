"""Invariant tests for the round-4 causal/finance/text wave: independent
Python replays of IPW, RDD, IV-Wald, Sharpe, Bollinger, SAX, AMS-F2,
Kneser-Ney, and inclusion dependencies.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def md5coin(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16) % 2


def test_ipw_ate_python_replay(spark):
    orders = load_table(spark, SF, "orders").collect()
    strata = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, nt, nc, syt, syc
    for r in orders:
        t = md5coin(f"{r.o_orderkey}:ipw")
        y = round(r.o_totalprice * 100)
        s = strata[r.o_orderpriority]
        s[0] += 1
        if t:
            s[1] += 1
            s[3] += y
        else:
            s[2] += 1
            s[4] += y
    n = sum(s[0] for s in strata.values())
    got = {r.stratum: r for r in REGISTRY["ipw_ate_estimate"].spark(spark, SF).collect()}
    ate = 0
    for st, (ns, nt, nc, syt, syc) in strata.items():
        tr = tdiv(1000 * syt * ns, n * nt)
        co = tdiv(1000 * syc * ns, n * nc)
        ate += tr - co
        assert got[st].treated_milli == tr
        assert got[st].control_milli == co
        assert got[st].naive_diff_milli == tdiv(1000 * syt, nt) - tdiv(1000 * syc, nc)
    for r in got.values():
        assert r.ate_ipw_milli == ate
    # A/A coin: |ATE| is sampling noise around 0. sigma(o_totalprice) is
    # ~14.4M cents; se(diff) at n~1.5k is ~745k cents, so 3 se in
    # milli-cents is ~2.2e9 (observed ~0.3e9 = 0.4 se)
    assert abs(ate) < 2_300_000_000


def test_rdd_python_replay(spark):
    li = Counter()
    for r in load_table(spark, SF, "lineitem").collect():
        li[r.l_orderkey] += 1
    sides = defaultdict(lambda: [0, 0, 0, 0, 0])  # n sx sy sxx sxy
    for r in load_table(spark, SF, "orders").collect():
        cents = round(r.o_totalprice * 100)
        if not (15000000 <= cents <= 34999999) or r.o_orderkey not in li:
            continue
        x = cents - 25000000
        y = li[r.o_orderkey]
        s = sides["right" if x >= 0 else "left"]
        s[0] += 1
        s[1] += x
        s[2] += y
        s[3] += x * x
        s[4] += x * y
    got = {r.side: r for r in
           REGISTRY["regression_discontinuity_cutoff"].spark(spark, SF).collect()}
    mus = {}
    for side, (n, sx, sy, sxx, sxy) in sides.items():
        den = n * sxx - sx * sx
        assert got[side].n == n
        assert got[side].slope_nano == tdiv(1000000000 * (n * sxy - sx * sy), den)
        mus[side] = tdiv(1000 * (sy * sxx - sx * sxy), den)
        assert got[side].mu_at_cutoff_milli == mus[side]
    for r in got.values():
        assert r.rdd_effect_milli == mus["right"] - mus["left"]
    # placebo cutoff in synthetic data: effect well under one line item
    assert abs(mus["right"] - mus["left"]) < 1000


def test_iv_wald_python_replay(spark):
    cust = {r.c_custkey: md5coin(f"{r.c_custkey}:iv")
            for r in load_table(spark, SF, "customer").collect()}
    per = defaultdict(lambda: [0, 0])  # custkey -> [x, y]
    for r in load_table(spark, SF, "orders").collect():
        per[r.o_custkey][0] += r.o_orderpriority == "1-URGENT"
        per[r.o_custkey][1] += round(r.o_totalprice * 100)
    arms = [0, 0, 0, 0, 0, 0]  # n1 n0 sx1 sx0 sy1 sy0
    for ck, z in cust.items():
        x, y = per.get(ck, (0, 0))
        if z:
            arms[0] += 1
            arms[2] += x
            arms[4] += y
        else:
            arms[1] += 1
            arms[3] += x
            arms[5] += y
    n1, n0, sx1, sx0, sy1, sy0 = arms
    got = REGISTRY["iv_wald_estimate"].spark(spark, SF).collect()[0]
    assert (got.n1, got.n0) == (n1, n0)
    assert got.y1_mean_milli == tdiv(1000 * sy1, n1)
    assert got.x0_mean_milli == tdiv(1000 * sx0, n0)
    assert got.wald_milli == tdiv(1000 * (sy1 * n0 - sy0 * n1),
                                  sx1 * n0 - sx0 * n1)


def test_sharpe_python_replay(spark):
    monthly = defaultdict(int)
    for r in load_table(spark, SF, "orders").collect():
        monthly[(r.o_orderdate.year, r.o_orderdate.month)] += round(
            r.o_totalprice * 100
        )
    rev = [monthly[k] for k in sorted(monthly)]
    diffs = [b - a for a, b in zip(rev, rev[1:])]
    n, s = len(diffs), sum(diffs)
    rad = n * sum(d * d for d in diffs) - s * s
    got = REGISTRY["sharpe_ratio_monthly_revenue"].spark(spark, SF).collect()[0]
    assert got.n == n
    assert got.sum_diff_cents == s
    assert got.radicand == float(rad)
    assert got.sharpe_6dp == round(s / math.sqrt(rad), 6)


def test_bollinger_python_replay(spark):
    daily = defaultdict(int)
    for r in load_table(spark, SF, "events").collect():
        if r.event_type == "purchase":
            daily[r.ts.date()] += round(r.value * 100)
    days = sorted(daily)
    got = {r.day: r for r in
           REGISTRY["bollinger_breakout_days"].spark(spark, SF).collect()}
    assert len(got) == len(days)
    for i, d in enumerate(days):
        win = [daily[days[j]] for j in range(max(0, i - 6), i + 1)]
        n, s = len(win), sum(win)
        q = sum(x * x for x in win)
        x = daily[d]
        breach = (n * x - s) ** 2 > 4 * (n * q - s * s)
        expect = 1 if breach and n * x > s else -1 if breach and n * x < s else 0
        assert got[d].n_win == n
        assert got[d].breakout == expect
        assert got[d].band_halfwidth_4dp == round(
            2.0 * math.sqrt(n * q - s * s) / n, 4
        )


def test_sax_motifs_python_replay(spark):
    import datetime

    hourly = defaultdict(lambda: defaultdict(int))
    for r in load_table(spark, SF, "events").collect():
        h = (r.ts.date() - datetime.date(2024, 1, 1)).days * 24 + r.ts.hour
        hourly[r.event_type][h] += 1
    got = defaultdict(list)
    for r in REGISTRY["sax_symbolic_motifs"].spark(spark, SF).collect():
        got[r.event_type].append((r.rnk, r.motif, r.occurrences))
    for et, hrs in hourly.items():
        paa = {seg: sum(hrs.get(seg * 6 + k, 0) for k in range(6))
               for seg in range(120)}
        order = sorted(paa, key=lambda sg: (paa[sg], sg))
        letter = {}
        for rnk, sg in enumerate(order):
            letter[sg] = "abcd"[(rnk * 4) // 120]
        words = Counter(
            "".join(letter[sg + k] for k in range(4)) for sg in range(117)
        )
        top = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
        expect = [(i + 1, wd, c) for i, (wd, c) in enumerate(top)]
        assert sorted(got[et]) == expect, et


def test_ams_f2_python_replay(spark):
    toks = []
    for r in load_table(spark, SF, "documents").collect():
        if r.text is not None:
            toks.extend(re.findall(r"[a-z]+", r.text.lower()))
    truth = sum(c * c for c in Counter(toks).values())
    lanes = []
    for lane in range(8):
        s = sum(
            1 if int(hashlib.md5(f"{lane}:{t}".encode()).hexdigest()[:6], 16) % 2
            else -1
            for t in toks
        )
        lanes.append(s)
    ests = sorted(s * s for s in lanes)
    med2 = ests[3] + ests[4]
    got = {r.lane: r for r in
           REGISTRY["ams_f2_moment_sketch"].spark(spark, SF).collect()}
    for lane, s in enumerate(lanes):
        assert got[lane].signed_sum == s
        assert got[lane].est_f2 == s * s
        assert got[lane].true_f2 == truth
        assert got[lane].med2_est == med2
        assert got[lane].err_ppm == tdiv((med2 - 2 * truth) * 1000000, 2 * truth)
    # the median-of-8 estimate should be within ~3x of truth (AMS bound is
    # loose at 8 lanes; this asserts sanity, not the variance theorem)
    assert 0 < med2 < 2 * truth * 10


def test_kneser_ney_python_replay(spark):
    bigrams = Counter()
    for r in load_table(spark, SF, "documents").collect():
        if r.text is None:
            continue
        a = re.findall(r"[a-z]+", r.text.lower())
        bigrams.update(zip(a, a[1:]))
    c1 = Counter()
    ncont = Counter()
    nleft = Counter()
    for (w1, w2), c in bigrams.items():
        c1[w1] += c
        ncont[w1] += 1
        nleft[w2] += 1
    dt = len(bigrams)
    top = sorted(bigrams.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got = REGISTRY["kneser_ney_bigram_model"].spark(spark, SF).collect()
    assert len(got) == 30
    for row, ((w1, w2), c) in zip(got, top):
        assert (row.w1, row.w2, row.bigram_count) == (w1, w2, c)
        assert row.w1_count == c1[w1]
        expect = tdiv(
            ((4 * c - 3) * dt + 3 * ncont[w1] * nleft[w2]) * 1000000,
            4 * c1[w1] * dt,
        )
        assert row.pkn_ppm == expect
        assert 0 < row.pkn_ppm <= 1_000_000
    # probabilities over each w1 sum to <= 1 (discount mass withheld)
    for w1 in {w1 for (w1, _), _ in top}:
        tot = sum(
            ((4 * c - 3) * dt + 3 * ncont[w1] * nleft[w2])
            / (4 * c1[w1] * dt)
            for (u, w2), c in bigrams.items()
            if u == w1
        )
        assert tot <= 1.0 + 1e-9


def test_inclusion_dependency_python_replay(spark):
    orders = {r.o_custkey for r in load_table(spark, SF, "orders").collect()}
    cust = {r.c_custkey for r in load_table(spark, SF, "customer").collect()}
    users = {r.user_id for r in load_table(spark, SF, "events").collect()}
    got = {r.candidate: r for r in
           REGISTRY["inclusion_dependency_audit"].spark(spark, SF).collect()}
    fwd = got["orders.o_custkey -> customer.c_custkey"]
    assert fwd.n_lhs == len(orders)
    assert fwd.n_contained == len(orders & cust)
    assert fwd.is_fk_candidate == (1 if orders <= cust else 0)
    rev = got["customer.c_custkey -> orders.o_custkey"]
    assert rev.n_contained == len(cust & orders)
    ev = got["events.user_id -> customer.c_custkey"]
    assert ev.n_lhs == len(users)
    assert ev.containment_ppm == len(users & cust) * 1000000 // len(users)
