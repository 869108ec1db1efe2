"""Invariant tests for round-5 wave 11: Welch's t, one-way ANOVA F,
Mantel-Haenszel pooled OR, James-Stein shrinkage, triangular-kernel KDE,
and the weekly DFT periodogram — independent Python replays at sf0.001.
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
    # half-away-from-zero, matching both engines' round()
    return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)


def test_welch_t_python_replay(spark):
    rows = [r for r in load_table(spark, SF, "events").collect()
            if r.event_type in ("click", "view")]
    a = [_cents(r.value) for r in rows if r.event_type == "click"]
    b = [_cents(r.value) for r in rows if r.event_type == "view"]
    na, nb = len(a), len(b)
    sa, sb = sum(a), sum(b)
    qa, qb = sum(v * v for v in a), sum(v * v for v in b)
    nva = tdiv(na * qa - sa * sa, na - 1)
    nvb = tdiv(nb * qb - sb * sb, nb - 1)
    diff = sa * nb - sb * na
    t2 = tdiv(1000 * diff * diff, nb * nb * nva + na * na * nvb)
    r = REGISTRY["welch_t_test"].spark(spark, SF).collect()[0]
    assert (r.n_a, r.n_b) == (na, nb)
    assert r.mean_a_milli == tdiv(1000 * sa, na)
    assert r.mean_b_milli == tdiv(1000 * sb, nb)
    assert r.mean_diff_milli == tdiv(1000 * diff, na * nb)
    assert r.t2_milli == t2
    # t^2 is nonnegative by construction, and click/view values are iid
    # in the synthetic lake so the test should not scream
    assert 0 <= r.t2_milli < 15000  # |t| < ~3.9
    # cross-check against the float Welch t^2 (recipe truncation is tiny)
    ma, mb = sa / na, sb / nb
    va = (qa - na * ma * ma) / (na - 1)
    vb = (qb - nb * mb * mb) / (nb - 1)
    t2f = (ma - mb) ** 2 / (va / na + vb / nb)
    assert abs(r.t2_milli - 1000 * t2f) <= max(2.0, 0.01 * abs(1000 * t2f))


def test_anova_f_python_replay(spark):
    rows = load_table(spark, SF, "events").collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r.event_type].append(_cents(r.value))
    k = len(groups)
    n = sum(len(g) for g in groups.values())
    stot = sum(sum(g) for g in groups.values())
    q = sum(v * v for g in groups.values() for v in g)
    between_raw = sum(tdiv(sum(g) ** 2, len(g)) for g in groups.values())
    ssb = between_raw - tdiv(stot * stot, n)
    ssw = q - between_raw
    r = REGISTRY["anova_oneway_f"].spark(spark, SF).collect()[0]
    assert (r.k_groups, r.n_total, r.df1, r.df2) == (k, n, k - 1, n - k)
    assert (r.ssb, r.ssw) == (ssb, ssw)
    assert r.f_milli == tdiv(1000 * ssb * (n - k), ssw * (k - 1))
    # exact decomposition identity: SSB + SSW = total SS (the between_raw
    # truncation cancels between the two terms)
    assert r.ssb + r.ssw == q - tdiv(stot * stot, n)
    assert r.f_milli >= 0


def test_mantel_haenszel_python_replay(spark):
    cust = {c.c_custkey: c for c in load_table(spark, SF, "customer").collect()}
    nat = {n.n_nationkey: n.n_name
           for n in load_table(spark, SF, "nation").collect()}
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for o in load_table(spark, SF, "orders").collect():
        c = cust[o.o_custkey]
        e = c.c_mktsegment == "BUILDING"
        y = o.o_orderpriority.startswith("1")
        cells[nat[c.c_nationkey]][(0 if e else 2) + (0 if y else 1)] += 1
    r_s = s_s = 0
    for a, b, cc, d in cells.values():
        nst = a + b + cc + d
        r_s += tdiv(1000000 * a * d, nst)
        s_s += tdiv(1000000 * b * cc, nst)
    r = REGISTRY["mantel_haenszel_pooled_or"].spark(spark, SF).collect()[0]
    assert r.n_strata == len(cells)
    assert (r.r_scaled, r.s_scaled) == (r_s, s_s)
    assert r.or_mh_milli == tdiv(1000 * r_s, s_s)
    # segment and priority are independent in the synthetic lake: the
    # pooled OR sits near 1
    assert 400 < r.or_mh_milli < 2500


def test_james_stein_python_replay(spark):
    nat = {n.n_nationkey: n.n_name
           for n in load_table(spark, SF, "nation").collect()}
    groups = defaultdict(list)
    for c in load_table(spark, SF, "customer").collect():
        groups[nat[c.c_nationkey]].append(_cents(c.c_acctbal))
    k = len(groups)
    n = sum(len(g) for g in groups.values())
    grand = tdiv(sum(sum(g) for g in groups.values()), n)
    ssw = sum(
        sum(v * v for v in g) - tdiv(sum(g) ** 2, len(g))
        for g in groups.values()
    )
    means = {name: tdiv(sum(g), len(g)) for name, g in groups.items()}
    ssdev = sum((m - grand) ** 2 for m in means.values())
    vbar = tdiv(tdiv(ssw, n - k), tdiv(n, k))
    factor = max(0, 1000000 - tdiv(1000000 * (k - 3) * vbar, ssdev))
    got = {r.n_name: r for r in
           REGISTRY["james_stein_shrinkage"].spark(spark, SF).collect()}
    assert set(got) == set(groups)
    for name, g in groups.items():
        r = got[name]
        assert r.n_g == len(g)
        assert r.mean_cents == means[name]
        assert r.factor_ppm == factor
        assert r.shrunk_cents == grand + tdiv(
            factor * (means[name] - grand), 1000000
        )
        # shrinkage: the estimate moves TOWARD the grand mean, never past
        assert abs(r.shrunk_cents - grand) <= abs(r.mean_cents - grand)
    assert 0 <= factor <= 1000000


def test_kde_python_replay(spark):
    vs = [_cents(r.value) for r in load_table(spark, SF, "events").collect()
          if r.event_type == "purchase"]
    n = len(vs)
    got = {r.g_cents: r for r in
           REGISTRY["kde_triangular_grid"].spark(spark, SF).collect()}
    assert sorted(got) == [2500 * i for i in range(21)]
    total_raw = 0
    for g, r in got.items():
        raw = sum(max(0, 2500 - abs(v - g)) for v in vs)
        assert r.kde_raw == raw
        assert r.n_obs == n
        assert r.density_ppb == tdiv(1000000000 * raw, n * 2500 * 2500)
        total_raw += raw
    # partition of unity: grid spacing == bandwidth, so every value
    # INSIDE the grid contributes exactly h; values beyond the last
    # gridpoint lose their tail mass
    inside = sum(1 for v in vs if v <= 50000)
    assert total_raw <= n * 2500
    assert total_raw >= inside * 2500 - n  # boundary values exact anyway


def test_dft_weekly_python_replay(spark):
    per_day = defaultdict(int)
    for r in load_table(spark, SF, "events").collect():
        if r.event_type == "purchase":
            per_day[r.ts.date()] += _cents(r.value)
    xs = [x for _, x in sorted(per_day.items())]
    n, s = len(xs), sum(xs)
    cos7 = [round(math.cos(2 * math.pi * k / 7) * 1e4) for k in range(7)]
    sin7 = [round(math.sin(2 * math.pi * k / 7) * 1e4) for k in range(7)]
    cr = sr = q = 0
    for t, x in enumerate(xs, start=1):
        xd = n * x - s
        cr += xd * cos7[(t - 1) % 7]
        sr += xd * sin7[(t - 1) % 7]
        q += xd * xd
    r = REGISTRY["dft_weekly_power"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert (r.dft_cos_scaled, r.dft_sin_scaled) == (cr, sr)
    assert r.weekly_power_ppm == tdiv(
        2000000 * (cr * cr + sr * sr), n * 100000000 * q
    )
    # Cauchy-Schwarz bounds the single-frequency share at 2 (ppm 2e6)
    assert 0 <= r.weekly_power_ppm <= 2000000
