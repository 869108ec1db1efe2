"""Invariant tests for the round-5 wave 3: tail risk, resampling,
sequential testing, median test, isotonic fit — independent Python
replays at sf0.001.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _daily(spark):
    rows = load_table(spark, SF, "events").collect()
    by_day = defaultdict(int)
    for r in rows:
        if r.event_type == "purchase":
            by_day[r.ts.date()] += round(r.value * 100)
    return [x for _, x in sorted(by_day.items())]


def test_var_cvar_python_replay(spark):
    xs = _daily(spark)
    dx = sorted(xs[i] - xs[i - 1] for i in range(1, len(xs)))
    n = len(dx)
    k = max(1, (10 * n) // 100)
    row = REGISTRY["historical_var_cvar"].spark(spark, SF).collect()[0]
    assert (row.n_days, row.k_tail) == (n, k)
    assert row.var10_cents == dx[k - 1]
    assert row.cvar10_milli == tdiv(1000 * sum(dx[:k]), k)
    # CVaR is at least as bad as VaR (coherence on the loss tail)
    assert row.cvar10_milli <= 1000 * row.var10_cents


def test_permutation_test_python_replay(spark):
    rows = [r for r in load_table(spark, SF, "events").collect()
            if r.event_type in ("click", "view")]
    vals = [(r.event_id, round(r.value * 100),
             1 if r.event_type == "click" else 0) for r in rows]
    n1 = sum(g for _, _, g in vals)
    n2 = len(vals) - n1
    s1 = sum(v for _, v, g in vals if g == 1)
    s2 = sum(v for _, v, g in vals if g == 0)
    d_obs = abs(n2 * s1 - n1 * s2)
    ne = 0
    for seed in range(1, 65):
        ordered = sorted(
            vals,
            key=lambda t: (hashlib.md5(
                f"{t[0]}:perm{seed}".encode()).hexdigest(), t[0]),
        )
        sa = sum(v for _, v, _ in ordered[:n1])
        sb = sum(v for _, v, _ in ordered[n1:])
        if abs(n2 * sa - n1 * sb) >= d_obs:
            ne += 1
    row = REGISTRY["permutation_test_mean_diff"].spark(spark, SF).collect()[0]
    assert row.n_perms == 64
    assert row.obs_mean_diff_scaled == tdiv(d_obs, n1 * n2)
    assert row.n_extreme == ne
    assert row.p_value_milli == tdiv(1000 * (ne + 1), 65)
    # same-distribution groups: the test must NOT reject at 5%
    assert row.p_value_milli > 50


def test_sprt_python_replay(spark):
    rows = sorted(
        (r for r in load_table(spark, SF, "events").collect()
         if r.event_type in ("click", "view")),
        key=lambda r: (r.ts, r.event_id),
    )
    llr, step, decision, at = 0, 0, None, None
    for r in rows:
        step += 1
        llr += 182 if r.event_type == "click" else -223
        if llr >= 2944:
            decision, at = "accept_h1", (step, llr)
            break
        if llr <= -2944:
            decision, at = "accept_h0", (step, llr)
            break
    row = REGISTRY["sprt_sequential_ab"].spark(spark, SF).collect()[0]
    assert row.n_observations == len(rows)
    assert row.decision == decision
    if decision:
        assert (row.decision_step, row.llr_at_decision_milli) == at
        # sequential stopping is EARLY: far fewer samples than the stream
        assert row.decision_step < len(rows)


def test_mood_median_python_replay(spark):
    rows = load_table(spark, SF, "events").collect()
    vs = sorted(round(r.value * 100) for r in rows)
    n = len(vs)
    med2 = vs[(n + 1) // 2 - 1] + vs[n // 2]
    g = defaultdict(lambda: [0, 0])
    for r in rows:
        v = round(r.value * 100)
        g[r.event_type][0] += 1
        g[r.event_type][1] += 1 if 2 * v > med2 else 0
    ta = sum(v[1] for v in g.values())
    chi = tdiv(1000 * sum(tdiv((n * oa - ng * ta) ** 2, ng)
                          for ng, oa in g.values()),
               ta * (n - ta))
    got = {r.event_type: r for r in
           REGISTRY["mood_median_test"].spark(spark, SF).collect()}
    for grp, (ng, oa) in g.items():
        r = got[grp]
        assert (r.n_g, r.n_above) == (ng, oa)
        assert r.above_ppm == tdiv(1000000 * oa, ng)
        assert r.chi2_milli == chi
    # roughly half the mass is above the global median overall
    assert abs(ta * 2 - n) <= len(g) * 2 + 2


def _pava(xs):
    """Textbook pool-adjacent-violators on unit weights -> float means."""
    vals = [float(x) for x in xs]
    w = [1.0] * len(xs)
    blocks = []
    for v in vals:
        blocks.append([v, 1.0])
        while len(blocks) > 1 and blocks[-2][0] > blocks[-1][0]:
            s2, w2 = blocks.pop()
            s1, w1 = blocks.pop()
            blocks.append([(s1 * w1 + s2 * w2) / (w1 + w2), w1 + w2])
    out = []
    for mean, wt in blocks:
        out.extend([mean] * int(wt))
    return out


def test_isotonic_python_replay(spark):
    xs = _daily(spark)
    n = len(xs)
    pref = [0]
    for x in xs:
        pref.append(pref[-1] + x)
    mn = []
    for j in range(1, n + 1):
        mn.append(min(tdiv(900000 * (pref[k] - pref[j - 1]), k - j + 1)
                      for k in range(j, n + 1)))
    iso_keys = []
    cur = None
    for v in mn:
        cur = v if cur is None else max(cur, v)
        iso_keys.append(cur)
    rows = REGISTRY["isotonic_regression_minimax"].spark(spark, SF).collect()
    assert len(rows) == n
    got = [r.iso_milli for r in rows]
    assert got == [tdiv(k, 900) for k in iso_keys]
    # monotone nondecreasing by construction
    assert got == sorted(got)
    # within 1 milli of the textbook PAVA fit
    pava = _pava(xs)
    for g, p in zip(got, pava):
        assert abs(g / 1000.0 - p) < 0.002 + 1e-9
    # mean is preserved by isotonic regression (up to milli truncation)
    assert abs(sum(got) - 1000 * sum(xs)) <= 2 * n * 1000
