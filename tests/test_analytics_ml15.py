"""Invariant tests for the CUPED/negative-sampling/assortativity/growth
wave — independent Python references (int arithmetic, md5 ordering,
exact int128 division via Python bigints).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_cuped_matches_python_reference(spark):
    """theta and rho^2 ppm from exact integer moments — Python bigints
    are the int128 ground truth the correction lane must hit."""
    rows = load_table(spark, SF, "events").select(
        "user_id", F.dayofmonth("ts").alias("dom"),
        F.expr("CAST(round(value) AS BIGINT)").alias("vd"),
    ).collect()
    xs = defaultdict(int)
    ys = defaultdict(int)
    users = set()
    for r in rows:
        users.add(r.user_id)
        if r.dom <= 15:
            xs[r.user_id] += r.vd
        else:
            ys[r.user_id] += r.vd
    n = len(users)
    sx = sum(xs.values())
    sy = sum(ys.values())
    sxx = sum(xs[u] * xs[u] for u in users)
    sxy = sum(xs[u] * ys[u] for u in users)
    syy = sum(ys[u] * ys[u] for u in users)
    cov_n = n * sxy - sx * sy
    vx_n = n * sxx - sx * sx
    vy_n = n * syy - sy * sy
    r = REGISTRY["cuped_variance_reduction"].spark(spark, SF).collect()[0]
    assert r.n_users == n
    assert r.pre_mean_dollars == sx // n
    assert r.post_mean_dollars == sy // n
    assert r.theta_milli == _tdiv(1000 * cov_n, vx_n)
    assert r.variance_reduction_ppm == cov_n * cov_n * 1_000_000 // (vx_n * vy_n)
    assert 0 <= r.variance_reduction_ppm <= 1_000_000


def test_negative_sampling_matches_python_reference(spark):
    """<=2 md5-ordered negatives per user; no sampled negative is a
    positive; per-type fingerprints match."""
    rows = load_table(spark, SF, "events").select("user_id", "event_type").collect()
    pos = {(r.user_id, r.event_type) for r in rows}
    users = {u for u, _ in pos}
    types = sorted({t for _, t in pos})
    n_pos = defaultdict(int)
    for _, t in pos:
        n_pos[t] += 1
    n_neg = defaultdict(int)
    id_sum = defaultdict(int)
    for u in users:
        cands = [t for t in types if (u, t) not in pos]
        cands.sort(key=lambda t: (hashlib.md5(f"{u}:{t}:neg".encode()).hexdigest(), t))
        for t in cands[:2]:
            n_neg[t] += 1
            id_sum[t] += u
    got = {r.event_type: r for r in
           REGISTRY["negative_sampling_pairs"].spark(spark, SF).collect()}
    assert set(got) == set(types)
    for t in types:
        r = got[t]
        assert r.n_pos_users == n_pos[t]
        assert r.n_neg_sampled == n_neg[t]
        assert r.neg_user_id_sum == id_sum[t]


def test_assortativity_matches_python_reference(spark):
    """Newman's r (no-sqrt symmetric form) in exact milli over the
    multiset co-purchase edge list."""
    rows = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order = defaultdict(set)
    for r in rows:
        by_order[r.l_orderkey].add(r.l_partkey)
    und = []
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                und.append((ps[i], ps[j]))
                und.append((ps[j], ps[i]))
    deg = defaultdict(int)
    for s, _ in und:
        deg[s] += 1
    s1 = len(und)
    sx = sum(deg[s] for s, _ in und)
    sxx = sum(deg[s] * deg[s] for s, _ in und)
    sxy = sum(deg[s] * deg[t] for s, t in und)
    num = 1000 * (s1 * sxy - sx * sx)
    den = s1 * sxx - sx * sx
    r = REGISTRY["degree_assortativity"].spark(spark, SF).collect()[0]
    assert r.n_directed_edges == s1
    assert r.mean_degree == sx // s1
    assert r.assortativity_milli == _tdiv(num, den)
    assert -1000 <= r.assortativity_milli <= 1000


def test_growth_accounting_matches_python_reference(spark):
    """new+retained+resurrected == active; churned tracks w-1 actives
    gone silent; identities hold every week."""
    rows = load_table(spark, SF, "events").select(
        "user_id", F.expr("unix_micros(ts) div (7 * 86400000000)").alias("w")
    ).collect()
    active = defaultdict(set)
    for r in rows:
        active[r.w].add(r.user_id)
    first = {}
    for w in sorted(active):
        for u in active[w]:
            first.setdefault(u, w)
    weeks = sorted(set(active) | {w + 1 for w in active})
    got = {r.week_start.toordinal() - 719163: r for r in
           REGISTRY["growth_accounting_weekly"].spark(spark, SF).collect()}
    for w in weeks:
        cur = active.get(w, set())
        prv = active.get(w - 1, set())
        if not cur and not prv:
            continue
        new = {u for u in cur if first[u] == w}
        ret = {u for u in cur & prv if first[u] < w}
        res = {u for u in cur - prv if first[u] < w}
        chu = prv - cur
        r = got[w * 7]
        assert r.new_users == len(new)
        assert r.retained_users == len(ret)
        assert r.resurrected_users == len(res)
        assert r.churned_users == len(chu)
        assert r.active_users == len(cur)
        assert r.active_users == r.new_users + r.retained_users + r.resurrected_users
