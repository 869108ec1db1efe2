"""Invariant tests for round-5 wave 13: Wagner-Whitin lot sizing, CPM
slack, Jarque-Bera normality, and TTL-cache simulation — independent
Python replays at sf0.001.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
K = 3000


def test_wagner_whitin_python_replay(spark):
    per = defaultdict(int)
    for r in load_table(spark, SF, "events").collect():
        if r.event_type == "purchase":
            per[r.ts.date()] += 1
    d = [v for _, v in sorted(per.items())]
    n = len(d)

    def hold(j, t):  # 1-based inclusive order period j covering j..t
        return sum((u - j) * d[u - 1] for u in range(j, t + 1))

    c = [0]
    for t in range(1, n + 1):
        c.append(min(c[j - 1] + K + hold(j, t) for j in range(1, t + 1)))
    r = REGISTRY["wagner_whitin_lotsizing"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert r.cost_optimal == c[n]
    assert r.cost_lot_for_lot == n * K
    assert r.cost_single_order == K + hold(1, n)
    # the DP optimum undercuts both naive envelope policies
    assert r.cost_optimal <= r.cost_lot_for_lot
    assert r.cost_optimal <= r.cost_single_order
    # and beats them strictly unless one envelope IS optimal
    assert r.cost_optimal >= K  # at least one setup


def test_critical_path_slack_python_replay(spark):
    parts = [p.p_partkey for p in load_table(spark, SF, "part").collect()]
    pset = set(parts)
    children = {
        p: [c for c in (p * 5 + 1, p * 5 + 2) if c in pset] for p in parts
    }
    has_parent = {c for cs in children.values() for c in cs}
    roots = sorted(
        {p for p in parts if children[p] and p not in has_parent}
    )
    dur = lambda v: v % 7 + 1  # noqa: E731

    slacks = []
    n_tasks = 0
    for root in roots:
        es, nodes = {}, []
        stack = [(root, dur(root), 0)]
        while stack:
            v, e, depth = stack.pop()
            es[v] = e
            nodes.append(v)
            if depth < 6:
                for c in children.get(v, []):
                    stack.append((c, e + dur(c), depth + 1))
        below = {}
        for v in sorted(nodes, reverse=True):  # children have larger keys
            kids = [c for c in children.get(v, []) if c in es]
            below[v] = dur(v) + (max(below[c] for c in kids) if kids else 0)
        t_days = max(es[v] + below[v] - dur(v) for v in nodes)
        for v in nodes:
            slacks.append(t_days - es[v] - (below[v] - dur(v)))
        n_tasks += len(nodes)
    r = REGISTRY["critical_path_slack"].spark(spark, SF).collect()[0]
    assert r.n_projects == len(roots)
    assert r.n_tasks == n_tasks
    assert r.n_critical_tasks == sum(1 for s in slacks if s == 0)
    assert r.total_slack_days == sum(slacks)
    assert r.max_slack_days == max(slacks)
    assert r.critical_ppm == 1000000 * r.n_critical_tasks // n_tasks
    # every project carries at least one zero-float chain
    assert r.n_critical_tasks >= r.n_projects
    assert min(slacks) == 0


def test_jarque_bera_python_replay(spark):
    groups = defaultdict(list)
    for li in load_table(spark, SF, "lineitem").collect():
        groups[li.l_returnflag].append(float(li.l_quantity))
    got = {r.l_returnflag: r for r in
           REGISTRY["jarque_bera_normality"].spark(spark, SF).collect()}
    assert set(got) == set(groups)
    for flag, xs in groups.items():
        n = len(xs)
        m1 = sum(xs) / n
        r2 = sum(x * x for x in xs) / n
        r3 = sum(x**3 for x in xs) / n
        r4 = sum(x**4 for x in xs) / n
        var = r2 - m1 * m1
        skew = (r3 - 3 * m1 * r2 + 2 * m1**3) / var**1.5
        kurt = (r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1**4) / var**2 - 3
        jb = n * (skew * skew + kurt * kurt / 4) / 6
        r = got[flag]
        assert r.n == n
        assert abs(r.skewness - skew) < 2e-6
        assert abs(r.excess_kurtosis - kurt) < 2e-6
        assert abs(r.jb_stat - jb) < max(2e-4, 1e-6 * abs(jb))
        # uniform quantities are platykurtic (kurt ~ -1.2): JB rejects
        assert r.excess_kurtosis < -0.9
        assert r.reject_normal_5pct == 1


def test_ttl_cache_python_replay(spark):
    acc = defaultdict(list)
    for r in load_table(spark, SF, "events").collect():
        acc[r.user_id].append((r.ts, r.event_id))
    import datetime as dt

    us = dt.timedelta(microseconds=1)
    gaps = []
    n = 0
    for rows in acc.values():
        rows.sort()
        n += len(rows)
        for (a, _), (b, _) in zip(rows, rows[1:]):
            gaps.append((b - a) // us)  # exact integer microseconds
    got = {r.ttl_seconds: r for r in
           REGISTRY["ttl_cache_hit_simulation"].spark(spark, SF).collect()}
    assert sorted(got) == [60, 600, 3600]
    prev = -1
    for ttl in (60, 600, 3600):
        hits = sum(1 for g in gaps if g <= ttl * 1000000)
        r = got[ttl]
        assert r.n_accesses == n
        assert r.n_hits == hits
        assert r.hit_ppm == 1000000 * hits // n
        # hit counts are monotone in the TTL budget
        assert r.n_hits >= prev
        prev = r.n_hits
