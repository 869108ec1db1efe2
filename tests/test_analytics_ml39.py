"""Invariant tests for the time-series-decomposition wave
(classical_decomposition_additive, pacf_durbin_levinson) — independent
Python references.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _daily(spark):
    daily = defaultdict(int)
    dows = {}
    for r in (
        load_table(spark, SF, "orders")
        .selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            "date_format(CAST(o_orderdate AS DATE), 'EEEE') AS dow",
        )
        .collect()
    ):
        daily[r.day] += 1
        dows[r.day] = r.dow
    days = sorted(daily)
    return days, daily, dows


def test_classical_decomposition_matches_python_reference(spark):
    days, daily, dows = _daily(spark)
    detr = {}
    for i, d in enumerate(days):
        if i < 3 or i >= len(days) - 3:
            continue
        trend7 = sum(daily[days[j]] for j in range(i - 3, i + 4))
        detr[d] = 7 * daily[d] - trend7
    seas_groups = defaultdict(list)
    for d, v in detr.items():
        seas_groups[dows[d]].append(v)
    s_milli = {
        dow: _tdiv(sum(vs) * 1000, len(vs))
        for dow, vs in seas_groups.items()
    }
    r_m = [v * 1000 - s_milli[dows[d]] for d, v in detr.items()]
    d_m = [v * 1000 for v in detr.values()]
    n = len(r_m)
    vr = n * sum(x * x for x in r_m) - sum(r_m) ** 2
    vd = n * sum(x * x for x in d_m) - sum(d_m) ** 2
    strength = max(0, (vd - vr) * 1_000_000 // vd) if vd else 0
    got = {r.dow: r for r in
           REGISTRY["classical_decomposition_additive"]
           .spark(spark, SF).collect()}
    assert set(got) == set(s_milli)
    for dow, sm in s_milli.items():
        r = got[dow]
        assert r.n_days == len(seas_groups[dow])
        assert r.s_milli == sm, dow
        assert r.strength_ppm == strength
    # additive seasonal components average to ~0 over a full cycle
    total = sum(r.s_milli * r.n_days for r in got.values())
    assert abs(total) <= 1000 * sum(r.n_days for r in got.values())


def test_pacf_matches_python_reference(spark):
    days, daily, _dows = _daily(spark)
    ys = [daily[d] for d in days]
    n = len(ys)
    s = sum(ys)
    devs = [n * y - s for y in ys]
    c0 = sum(v * v for v in devs)
    cs = {}
    for k in (1, 2, 3):
        cs[k] = sum(devs[i] * devs[i + k] for i in range(n - k))
    r1, r2, r3 = (_tdiv(cs[k] * 1_000_000, c0) for k in (1, 2, 3))
    p11 = r1
    p22 = _tdiv(
        (r2 * 1_000_000 - r1 * r1) * 1_000_000,
        1_000_000_000_000 - r1 * r1,
    )
    p21 = p11 - _tdiv(p22 * p11, 1_000_000)
    p33 = _tdiv(
        (r3 * 1_000_000 - p21 * r2 - p22 * r1) * 1_000_000,
        1_000_000_000_000 - p21 * r1 - p22 * r2,
    )
    row = REGISTRY["pacf_durbin_levinson"].spark(spark, SF).collect()[0]
    assert row.n_days == n
    assert (row.r1_ppm, row.r2_ppm, row.r3_ppm) == (r1, r2, r3)
    assert row.pacf1_ppm == p11
    assert row.pacf2_ppm == p22
    assert row.pacf3_ppm == p33
    # pacf(1) IS r(1) by definition
    assert row.pacf1_ppm == row.r1_ppm
    assert abs(row.r1_ppm) <= 1_000_000
