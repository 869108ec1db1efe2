"""Invariant tests for the round-5 wave 8: Wasserstein drift, trend test,
index numbers, shift-share — independent Python replays at sf0.001.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import date, datetime

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_wasserstein1_python_replay(spark):
    rows = [r for r in load_table(spark, SF, "events").collect()
            if r.event_type == "purchase"]
    vals = [(round(r.value * 100),
             0 if r.ts.date() < date(2024, 1, 16) else 1) for r in rows]
    lo = min(v for v, _ in vals)
    hi = max(v for v, _ in vals)
    n = [defaultdict(int), defaultdict(int)]
    for v, p in vals:
        n[p][min(20 * (v - lo) // (hi - lo + 1), 19)] += 1
    t0, t1 = sum(n[0].values()), sum(n[1].values())
    got = {r.bucket: r for r in
           REGISTRY["wasserstein1_binned_drift"].spark(spark, SF).collect()}
    assert set(got) == set(range(20))
    cum, w1 = 0, 0
    cds = []
    for b in range(20):
        p = tdiv(1000000 * n[0].get(b, 0), t0)
        q = tdiv(1000000 * n[1].get(b, 0), t1)
        cum += p - q
        cds.append(abs(cum))
        w1 += abs(cum)
        r = got[b]
        assert (r.p_ppm, r.q_ppm, r.cum_diff_ppm) == (p, q, abs(cum))
    assert all(r.w1_total_ppm_bins == w1 for r in got.values())
    # W1 >= TV-like max single-bucket CDF gap; both on the same grid
    assert w1 >= max(cds)


def test_cochran_armitage_python_replay(spark):
    orders = load_table(spark, SF, "orders").collect()
    g = defaultdict(lambda: [0, 0])
    for o in orders:
        dose = int(o.o_orderpriority[0])
        g[dose][0] += 1
        g[dose][1] += 1 if o.o_totalprice > 150000 else 0
    N = sum(v[0] for v in g.values())
    Y = sum(v[1] for v in g.values())
    swn = sum(d * v[0] for d, v in g.items())
    swy = sum(d * v[1] for d, v in g.items())
    sw2n = sum(d * d * v[0] for d, v in g.items())
    z2 = tdiv((N * swy - Y * swn) ** 2 * N * 1000,
              Y * (N - Y) * (N * sw2n - swn * swn))
    got = {r.dose: r for r in
           REGISTRY["cochran_armitage_trend"].spark(spark, SF).collect()}
    assert set(got) == set(g)
    for d, (ni, yi) in g.items():
        r = got[d]
        assert (r.n_i, r.n_high) == (ni, yi)
        assert r.high_rate_ppm == tdiv(1000000 * yi, ni)
        assert r.z2_milli == z2


def test_price_index_python_replay(spark):
    lines = load_table(spark, SF, "lineitem").collect()
    per = defaultdict(lambda: [0, 0])
    cut = datetime(1998, 1, 1)
    for l in lines:
        key = (l.l_partkey, 0 if l.l_shipdate < cut else 1)
        per[key][0] += round(l.l_extendedprice * 100)
        per[key][1] += int(l.l_quantity)
    parts = {pk for pk, p in per}
    matched = [pk for pk in parts if (pk, 0) in per and (pk, 1) in per]
    snum_l = sden_l = snum_p = sden_p = 0
    for pk in matched:
        c0, q0 = per[(pk, 0)]
        c1, q1 = per[(pk, 1)]
        u0 = tdiv(1000 * c0, q0)
        u1 = tdiv(1000 * c1, q1)
        snum_l += u1 * q0
        sden_l += u0 * q0
        snum_p += u1 * q1
        sden_p += u0 * q1
    lasp = tdiv(1000000 * snum_l, sden_l)
    paas = tdiv(1000000 * snum_p, sden_p)
    row = REGISTRY["price_index_fisher"].spark(spark, SF).collect()[0]
    assert row.n_matched_parts == len(matched)
    assert (row.laspeyres_ppm, row.paasche_ppm) == (lasp, paas)
    assert row.fisher_sq_ppm == tdiv(lasp * paas, 1000000)
    # Fisher lies between Laspeyres and Paasche (geometric mean)
    lo, hi = sorted((lasp, paas))
    assert lo * lo <= row.fisher_sq_ppm * 1000000 // 1 <= hi * hi + 1000000


def test_shift_share_python_replay(spark):
    orders = load_table(spark, SF, "orders").collect()
    cust = {c.c_custkey: c.c_nationkey
            for c in load_table(spark, SF, "customer").collect()}
    nname = {n.n_nationkey: n.n_name
             for n in load_table(spark, SF, "nation").collect()}
    per = defaultdict(lambda: [0, 0])
    cut = datetime(1998, 1, 1)
    for o in orders:
        nm = nname[cust[o.o_custkey]]
        per[nm][0 if o.o_orderdate < cut else 1] += round(
            o.o_totalprice * 100)
    t0 = sum(v[0] for v in per.values())
    t1 = sum(v[1] for v in per.values())
    got = {r.n_name: r for r in
           REGISTRY["shift_share_decomposition"].spark(spark, SF).collect()}
    assert set(got) == set(per)
    for nm, (r0, r1) in per.items():
        r = got[nm]
        nat = tdiv(r0 * (t1 - t0), t0)
        assert (r.r0_cents, r.delta_cents) == (r0, r1 - r0)
        assert r.national_effect_cents == nat
        assert r.competitive_effect_cents == (r1 - r0) - nat
        # the decomposition identity is EXACT by construction
        assert r.national_effect_cents + r.competitive_effect_cents == \
            r.delta_cents
        assert r.national_growth_milli == tdiv(1000 * (t1 - t0), t0)
    # decomposition conserves the aggregate change up to per-row
    # truncation of the national term (bounded by one cent per nation)
    assert abs(sum(r.national_effect_cents for r in got.values())
               - (t1 - t0)) <= len(per)
