"""Invariant tests for the round-5 wave 9: rolling beta, rich club,
Anderson-Darling — independent Python replays at sf0.001.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_rolling_beta_python_replay(spark):
    rows = load_table(spark, SF, "events").collect()
    by_day = defaultdict(lambda: [0, 0])
    for r in rows:
        if r.event_type == "purchase":
            by_day[r.ts.date()][0] += round(r.value * 100)
        elif r.event_type == "click":
            by_day[r.ts.date()][1] += round(r.value * 100)
    series = [v for _, v in sorted(by_day.items())]
    got = REGISTRY["rolling_beta_window"].spark(spark, SF).collect()
    assert len(got) == len(series) - 13
    for idx, r in enumerate(got):
        wnd = series[idx:idx + 14]
        n = 14
        sa = sum(a for a, _ in wnd)
        sb = sum(b for _, b in wnd)
        sab = sum(a * b for a, b in wnd)
        saa = sum(a * a for a, _ in wnd)
        sbb = sum(b * b for _, b in wnd)
        num = n * sab - sa * sb
        denb = n * sbb - sb * sb
        assert r.beta_milli == (tdiv(1000 * num, denb) if denb else None)
        dena = n * saa - sa * sa
        assert r.r2_milli == (
            tdiv(1000 * num * num, dena * denb) if dena * denb else None)
        # R^2 lives on [0, 1000] milli
        assert 0 <= r.r2_milli <= 1000


def test_rich_club_python_replay(spark):
    lines = load_table(spark, SF, "lineitem").collect()
    byo = defaultdict(set)
    for l in lines:
        byo[l.l_orderkey].add(l.l_suppkey)
    w = defaultdict(int)
    for sup in byo.values():
        ss = sorted(sup)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                w[(ss[i], ss[j])] += 1
    edges = [(a, b) for (a, b), c in w.items()
             if c >= 2 and (a * 31 + b * 17) % 20 == 0]
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = {r.k_degree: r for r in
           REGISTRY["rich_club_coefficient"].spark(spark, SF).collect()}
    phis = []
    for k in (2, 4, 8):
        rich = {u for u, d in deg.items() if d > k}
        if not rich:
            assert k not in got
            continue
        ew = sum(1 for a, b in edges if a in rich and b in rich)
        r = got[k]
        assert (r.n_rich_nodes, r.n_edges_within) == (len(rich), ew)
        exp = (tdiv(2000000 * ew, len(rich) * (len(rich) - 1))
               if len(rich) > 1 else None)
        assert r.phi_ppm == exp
        if exp is not None:
            phis.append(exp)
    # density inside a smaller, higher-degree club cannot vanish faster
    # than the club: phi stays within the ppm grid
    assert all(0 <= p <= 1000000 for p in phis)


def test_anderson_darling_python_replay(spark):
    rows = [r for r in load_table(spark, SF, "events").collect()
            if r.event_type in ("click", "view")]
    # engine ordering is (v, event_id) — g must NOT enter the tie-break
    pooled = sorted(
        ((round(r.value * 100), r.event_id,
          1 if r.event_type == "click" else 0) for r in rows),
        key=lambda t: (t[0], t[1]))
    pooled = [(v, g, eid) for v, eid, g in pooled]
    nn = len(pooled)
    na = sum(g for _, g, _ in pooled)
    m, tsum = 0, 0
    for i, (_, g, _) in enumerate(pooled, start=1):
        m += g
        if i < nn:
            tsum += tdiv((m * nn - na * i) ** 2, i * (nn - i))
    a2 = tdiv(1000 * tsum, na * (nn - na))
    row = REGISTRY["anderson_darling_two_sample"].spark(spark, SF).collect()[0]
    assert (row.n_a, row.n_b) == (na, nn - na)
    assert row.a2_milli == a2
    # click and view share a distribution: A^2 stays near its null
    # mean of 1 (far below the 5% critical ~2.49)
    assert row.a2_milli < 2490
