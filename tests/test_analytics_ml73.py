"""Invariant tests for round-5 wave 19: Dickey-Fuller unit root,
Ansari-Bradley scale test, arc price elasticity — independent Python
replays at sf0.001.
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


def test_dickey_fuller_python_replay(spark):
    per = defaultdict(int)
    for r in load_table(spark, SF, "events").collect():
        if r.event_type == "purchase":
            per[r.ts.date()] += _cents(r.value)
    xs = [x for _, x in sorted(per.items())]
    zs = xs[:-1]
    dys = [b - a for a, b in zip(xs, xs[1:])]
    m = len(zs)
    sz, sd = sum(zs), sum(dys)
    sxx = m * sum(z * z for z in zs) - sz * sz
    syy = m * sum(d * d for d in dys) - sd * sd
    sxy = m * sum(z * d for z, d in zip(zs, dys)) - sz * sd
    rxx, ryy, rxy = tdiv(sxx, 1000), tdiv(syy, 1000), tdiv(sxy, 1000)
    gamma = tdiv(1000 * sxy, sxx)
    t2 = tdiv(1000 * rxy * rxy * (m - 2), rxx * ryy - rxy * rxy)
    r = REGISTRY["dickey_fuller_unit_root"].spark(spark, SF).collect()[0]
    assert r.n_diffs == m
    assert (r.gamma_milli, r.t2_milli) == (gamma, t2)
    assert r.unit_root_rejected == (1 if gamma < 0 and t2 > 8180 else 0)
    # daily purchase revenue is mean-reverting noise, not a random walk:
    # gamma is strongly negative and the test rejects the unit root
    assert gamma < 0
    assert r.unit_root_rejected == 1


def test_ansari_bradley_python_replay(spark):
    rows = [(r.event_id, _cents(r.value), r.event_type)
            for r in load_table(spark, SF, "events").collect()
            if r.event_type in ("click", "view")]
    pooled = sorted((v, eid, et) for eid, v, et in rows)
    nn = len(pooled)
    na = sum(1 for _, _, et in pooled if et == "click")
    ab = sum(min(i, nn + 1 - i)
             for i, (_, _, et) in enumerate(pooled, start=1)
             if et == "click")
    # even N: E[AB] = na(N+2)/4, Var = na*nb*(N+2)(N-2)/(48(N-1)) so
    # z^2 = (4AB - na(N+2))^2 * 3(N-1) / (na*nb*(N+2)(N-2)) — the 16
    # from squaring the scaled numerator cancels into 48/16 = 3.
    if nn % 2 == 0:
        z2 = tdiv(1000 * (4 * ab - na * (nn + 2)) ** 2 * 3 * (nn - 1),
                  na * (nn - na) * (nn + 2) * (nn - 2))
    else:
        z2 = tdiv(1000 * (4 * nn * ab - na * (nn + 1) ** 2) ** 2 * 3,
                  na * (nn - na) * (nn + 1) * (3 + nn * nn))
    r = REGISTRY["ansari_bradley_scale_test"].spark(spark, SF).collect()[0]
    assert (r.n_a, r.n_b, r.ab_stat) == (na, nn - na, ab)
    assert r.z2_milli == z2
    assert r.scale_differs_5pct == (1 if z2 > 3841 else 0)
    # click and view values share the same generator: no scale signal
    assert r.scale_differs_5pct == 0


def test_arc_elasticity_python_replay(spark):
    parts = {p.p_partkey: p.p_brand
             for p in load_table(spark, SF, "part").collect()}
    rows = defaultdict(list)
    for li in load_table(spark, SF, "lineitem").collect():
        q = int(li.l_quantity)
        rev = _cents(li.l_extendedprice)
        pu = tdiv(rev * 1000, q)
        rows[parts[li.l_partkey]].append(
            (pu, li.l_orderkey, li.l_linenumber, q, rev)
        )
    got = {r.p_brand: r for r in
           REGISTRY["arc_price_elasticity"].spark(spark, SF).collect()}
    assert set(got) == set(rows)
    for brand, rs in rows.items():
        rs.sort()
        n = len(rs)
        lo = rs[: n // 2]
        hi = rs[n // 2:]
        q_lo = sum(x[3] for x in lo)
        q_hi = sum(x[3] for x in hi)
        p_lo = tdiv(sum(x[4] for x in lo), q_lo)
        p_hi = tdiv(sum(x[4] for x in hi), q_hi)
        r = got[brand]
        assert r.n == n
        assert (r.q_low_units, r.q_high_units) == (q_lo, q_hi)
        assert (r.p_low_cents, r.p_high_cents) == (p_lo, p_hi)
        den = (q_hi + q_lo) * (p_hi - p_lo)
        want = tdiv(1000 * (q_hi - q_lo) * (p_hi + p_lo), den) if den else None
        assert r.arc_elasticity_milli == want
        # price halves are genuinely separated
        assert p_hi > p_lo
