"""Invariant tests for the Kaplan-Meier wave
(kaplan_meier_product_limit) — independent Python product-limit
reference with the same ppm floor chain.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_kaplan_meier_matches_python_reference(spark):
    o = {
        r.o_orderkey: (r.od, r.o_orderpriority)
        for r in load_table(spark, SF, "orders")
        .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS od",
                    "o_orderpriority")
        .collect()
    }
    per_group = defaultdict(list)
    for r in (
        load_table(spark, SF, "lineitem")
        .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS e")
        .collect()
    ):
        od, pri = o[r.l_orderkey]
        if r.e >= od:
            grp = "urgent" if pri in ("1-URGENT", "2-HIGH") else "normal"
            per_group[grp].append((r.e - od).days)
    curves = {}
    for grp, ts in per_group.items():
        at_t = defaultdict(int)
        for t in ts:
            at_t[t] += 1
        n_at = len(ts)
        s = 1_000_000
        curve = [(0, s)]
        for t in sorted(at_t):
            d = at_t[t]
            s = s * (n_at - d) // n_at
            curve.append((t, s))
            n_at -= d
        curves[grp] = curve
    got = {(r.milestone_days, r.grp): r.survival_ppm for r in
           REGISTRY["kaplan_meier_product_limit"].spark(spark, SF).collect()}
    for m in (7, 14, 30, 60, 90):
        for grp, curve in curves.items():
            # survival at milestone = value at the LAST event time <= m
            last = max((t for t, _ in curve if t <= m), default=0)
            want = dict(curve)[last]
            assert got[(m, grp)] == want, (m, grp)
    # survival curves are non-increasing and start at 1
    for grp, curve in curves.items():
        ss = [s for _, s in curve]
        assert ss[0] == 1_000_000
        assert all(a >= b for a, b in zip(ss, ss[1:]))
        # everything ships within 90 days in this data only if the
        # curve has fully decayed; either way the milestone value is
        # bounded by the previous one
        ms = [got[(m, grp)] for m in (7, 14, 30, 60, 90)]
        assert all(a >= b for a, b in zip(ms, ms[1:]))
