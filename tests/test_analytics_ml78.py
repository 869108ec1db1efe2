"""Invariant tests for round-6 wave 24: Chow break test, Granger
causality, Breusch-Pagan, Bartels RVN — independent Python replays at
sf0.001.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _cents(x: float) -> int:
    return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)


def _daily(spark):
    rev: dict = defaultdict(int)
    clk: dict = defaultdict(int)
    days = set()
    for e in load_table(spark, SF, "events").collect():
        d = e.ts.date()
        days.add(d)
        if e.event_type == "purchase":
            rev[d] += _cents(e.value)
        elif e.event_type == "click":
            clk[d] += 1
    days = sorted(days)
    return days, [tdiv(rev[d], 100) for d in days], [clk[d] for d in days]


def _sse(pts):
    n = len(pts)
    st = sum(t for t, _ in pts)
    sy = sum(y for _, y in pts)
    stt = sum(t * t for t, _ in pts)
    sty = sum(t * y for t, y in pts)
    syy = sum(y * y for _, y in pts)
    return (syy - sy * sy / n) - (sty - st * sy / n) ** 2 / (
        stt - st * st / n
    )


def test_chow_python_replay(spark):
    _, ys, _ = _daily(spark)
    pts = list(enumerate(ys, start=1))
    n = len(pts)
    half = n // 2
    sse_p = _sse(pts)
    sse_s = _sse(pts[:half]) + _sse(pts[half:])
    f = ((sse_p - sse_s) / 2) / (sse_s / (n - 4))
    r = REGISTRY["chow_test_structural_break"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert r.sse_pooled == pytest.approx(sse_p, rel=1e-6)
    assert r.sse_split == pytest.approx(sse_s, rel=1e-6)
    assert r.chow_f == pytest.approx(f, abs=2e-4)
    assert r.break_detected_5pct == (1 if f > 3.37 else 0)
    # split halves can only fit better than the pooled line
    assert r.sse_split <= r.sse_pooled + 1e-6


def test_granger_python_replay(spark):
    _, ys, xs = _daily(spark)
    rows = [(w, u, v) for w, u, v in zip(ys[1:], ys[:-1], xs[:-1])]
    n = len(rows)
    sw = sum(w for w, _, _ in rows)
    su = sum(u for _, u, _ in rows)
    sv = sum(v for _, _, v in rows)
    cuu = sum(u * u for _, u, _ in rows) - su * su / n
    cvv = sum(v * v for _, _, v in rows) - sv * sv / n
    cuv = sum(u * v for _, u, v in rows) - su * sv / n
    cuw = sum(u * w for w, u, _ in rows) - su * sw / n
    cvw = sum(v * w for w, _, v in rows) - sv * sw / n
    cww = sum(w * w for w, _, _ in rows) - sw * sw / n
    sse_r = cww - cuw * cuw / cuu
    det = cuu * cvv - cuv * cuv
    sse_u = cww - ((cuw * cvv - cvw * cuv) * cuw
                   + (cvw * cuu - cuw * cuv) * cvw) / det
    f = (sse_r - sse_u) / (sse_u / (n - 3))
    r = REGISTRY["granger_causality_onelag"].spark(spark, SF).collect()[0]
    assert r.n_obs == n
    assert r.sse_restricted == pytest.approx(sse_r, rel=1e-6)
    assert r.sse_unrestricted == pytest.approx(sse_u, rel=1e-6)
    assert r.granger_f == pytest.approx(f, abs=2e-4)
    assert r.r2_unrestricted == pytest.approx(1.0 - sse_u / cww, abs=2e-6)
    assert r.clicks_cause_revenue_5pct == (1 if f > 4.23 else 0)
    # adding a regressor can only reduce SSE
    assert r.sse_unrestricted <= r.sse_restricted + 1e-6


def test_breusch_pagan_python_replay(spark):
    pts = []
    for li in load_table(spark, SF, "lineitem").collect():
        pts.append((_cents(li.l_quantity),
                    tdiv(_cents(li.l_extendedprice), 100)))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    b = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    gs = []
    for x, y in pts:
        e = y - (sy / n + b * (x - sx / n))
        gs.append((x, round(e * e, 4)))
    sg = sum(g for _, g in gs)
    sgg = sum(round(g * g, 2) for _, g in gs)
    sxg = sum(round(x * g, 2) for x, g in gs)
    r2 = (sxg - sx * sg / n) ** 2 / ((sxx - sx * sx / n)
                                     * (sgg - sg * sg / n))
    r = REGISTRY["breusch_pagan_heteroscedasticity"].spark(
        spark, SF
    ).collect()[0]
    assert r.n_obs == n
    assert r.aux_r2 == pytest.approx(r2, abs=2e-6)
    assert r.bp_lm_stat == pytest.approx(n * r2, abs=2e-3)
    assert r.heteroscedastic_5pct == (1 if n * r2 > 3.841 else 0)
    # R^2 of the auxiliary regression is a proper fraction
    assert 0.0 <= r.aux_r2 <= 1.0 and r.bp_lm_stat >= 0.0


def test_bartels_python_replay(spark):
    days, ys, _ = _daily(spark)
    order = sorted(range(len(ys)), key=lambda i: (ys[i], days[i]))
    rank = [0] * len(ys)
    for pos, i in enumerate(order, start=1):
        rank[i] = pos
    n = len(ys)
    nm = sum((rank[i] - rank[i + 1]) ** 2 for i in range(n - 1))
    rvn = tdiv(12000 * nm, n * (n * n - 1))
    z2 = tdiv((rvn - 2000) ** 2 * n, 4000)
    r = REGISTRY["bartels_rank_von_neumann"].spark(spark, SF).collect()[0]
    assert (r.n_days, r.nm_stat) == (n, nm)
    assert r.rvn_milli == rvn
    assert r.z2_milli == z2
    assert r.nonrandom_5pct == (1 if z2 > 3841 else 0)
    # RVN of iid-ish noise stays in a sane band around 2
    assert 500 < r.rvn_milli < 3500
