"""Invariant tests for round-5 wave 16: two-predictor OLS (Cramer),
Hodges-Lehmann shift, theta-method forecast, Kalman local-level filter —
independent Python replays at sf0.001.
"""

from __future__ import annotations

import math
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _cents(x: float) -> int:
    return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)


def _daily(spark, etype="purchase"):
    per = defaultdict(int)
    for r in load_table(spark, SF, "events").collect():
        if r.event_type == etype:
            per[r.ts.date()] += _cents(r.value)
    return [x for _, x in sorted(per.items())]


def test_ols_two_predictor_python_replay(spark):
    cust = {c.c_custkey: c.c_nationkey
            for c in load_table(spark, SF, "customer").collect()}
    nat = {n.n_nationkey: n.n_name
           for n in load_table(spark, SF, "nation").collect()}
    ordn = {o.o_orderkey: nat[cust[o.o_custkey]]
            for o in load_table(spark, SF, "orders").collect()}
    rows = defaultdict(list)
    for li in load_table(spark, SF, "lineitem").collect():
        rows[ordn[li.l_orderkey]].append(
            (int(li.l_quantity), _cents(li.l_discount), _cents(li.l_extendedprice))
        )
    got = {r.n_name: r for r in
           REGISTRY["ols_two_predictor_nation"].spark(spark, SF).collect()}
    assert set(got) == set(rows)
    for name, rs in rows.items():
        n = len(rs)
        s1 = sum(r[0] for r in rs)
        s2 = sum(r[1] for r in rs)
        sy = sum(r[2] for r in rs)
        s11 = n * sum(r[0] ** 2 for r in rs) - s1 * s1
        s22 = n * sum(r[1] ** 2 for r in rs) - s2 * s2
        s12 = n * sum(r[0] * r[1] for r in rs) - s1 * s2
        s1y = n * sum(r[0] * r[2] for r in rs) - s1 * sy
        s2y = n * sum(r[1] * r[2] for r in rs) - s2 * sy
        syy = n * sum(r[2] ** 2 for r in rs) - sy * sy
        det = s11 * s22 - s12 * s12
        b1 = tdiv(1000 * (s22 * s1y - s12 * s2y), det)
        b2 = tdiv(1000 * (s11 * s2y - s12 * s1y), det)
        r = got[name]
        assert r.n == n
        assert (r.b1_milli, r.b2_milli) == (b1, b2)
        assert r.intercept_cents == tdiv(
            1000 * sy - b1 * s1 - b2 * s2, 1000 * n
        )
        assert r.r2_ppm == tdiv(1000000 * (b1 * s1y + b2 * s2y), 1000 * syy)
        # synthetic prices are independent of qty/discount: R^2 is
        # near zero (the executed no-signal reading) and bounded
        assert 0 <= r.r2_ppm <= 1000000


def test_hodges_lehmann_python_replay(spark):
    xa = _daily(spark, "purchase")
    xb = _daily(spark, "click")
    diffs = sorted(a - b for a in xa for b in xb)
    np_ = len(diffs)
    ssum = diffs[np_ // 2 - 1] + diffs[np_ // 2]
    r = REGISTRY["hodges_lehmann_shift"].spark(spark, SF).collect()[0]
    assert r.n_pairs == np_
    assert r.hl_shift_cents == tdiv(ssum, 2)
    # HL sits inside the pairwise-difference range
    assert diffs[0] <= r.hl_shift_cents <= diffs[-1]


def test_theta_method_python_replay(spark):
    xs = _daily(spark)
    n, sy = len(xs), sum(xs)
    sty2 = sum((2 * (t + 1) - (n + 1)) * x for t, x in enumerate(xs))
    stt2 = sum((2 * (t + 1) - (n + 1)) ** 2 for t in range(n))
    b = tdiv(2000 * sty2, stt2)
    a = tdiv(1000 * sy - b * (n * (n + 1) // 2), n)
    z = [2000 * x - (a + b * (t + 1)) for t, x in enumerate(xs)]
    s = z[0]
    for v in z[1:]:
        s = tdiv(v + s, 2)
    r = REGISTRY["theta_method_forecast"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert r.b_milli == b
    assert r.ses_theta2_milli == s
    assert r.f1_milli == tdiv(s + a + b * (n + 1), 2)
    assert r.f7_milli == tdiv(s + a + b * (n + 7), 2)
    # drift: consecutive horizons differ by ~b/2
    assert abs((r.f7_milli - r.f1_milli) - 3 * b) <= 3


def test_kalman_python_replay(spark):
    xs = _daily(spark)
    n = len(xs)
    sx, qx = sum(xs), sum(x * x for x in xs)
    rv = tdiv(n * qx - sx * sx, n * (n - 1))
    q = tdiv(rv, 10)
    xf, p = 1000 * xs[0], rv
    for y in xs[1:]:
        pp = p + q
        k = tdiv(1000000 * pp, pp + rv)
        xf = xf + tdiv(k * (1000 * y - xf), 1000000)
        p = tdiv((1000000 - k) * pp, 1000000)
    r = REGISTRY["kalman_local_level"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert r.obs_var_cents2 == rv
    assert r.level_milli == xf
    assert r.p_final_cents2 == p
    assert r.gain_next_ppm == tdiv(1000000 * (p + q), p + q + rv)
    # the steady-state gain of a local-level model with Q = R/10 is
    # (sqrt(1.4...) analysis aside) strictly between Q/(Q+R) and 1
    assert 0 < r.gain_next_ppm < 1000000
    # posterior variance can't exceed prior-plus-process variance
    assert 0 < r.p_final_cents2 <= rv + q
