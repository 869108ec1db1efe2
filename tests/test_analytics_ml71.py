"""Invariant tests for round-5 wave 17: split-conformal intervals,
beta-binomial shrinkage, Katz centrality, mediation product-of-paths —
independent Python replays at sf0.001.
"""

from __future__ import annotations

import hashlib
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


def _md5_bucket(key: str, mod: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % mod


def test_conformal_python_replay(spark):
    rows = load_table(spark, SF, "events").collect()
    cal, test = defaultdict(list), defaultdict(list)
    for r in rows:
        v = _cents(r.value)
        part = cal if _md5_bucket(f"{r.event_id}:conf:42", 2) == 0 else test
        part[r.event_type].append((v, r.event_id))
    got = {r.event_type: r for r in
           REGISTRY["conformal_interval_coverage"].spark(spark, SF).collect()}
    assert set(got) == set(cal)
    for et, cs in cal.items():
        cs.sort()
        nc = len(cs)
        pred = cs[(nc + 1) // 2 - 1][0]
        scores = sorted((abs(v - pred), eid) for v, eid in cs)
        q = scores[((nc + 1) * 9 + 9) // 10 - 1][0]
        ts = test[et]
        cov = sum(1 for v, _ in ts if abs(v - pred) <= q)
        r = got[et]
        assert (r.n_cal, r.n_test) == (nc, len(ts))
        assert (r.pred_cents, r.q_cents) == (pred, q)
        assert r.coverage_ppm == 1000000 * cov // len(ts)
        # the conformal guarantee: coverage concentrates near >= 90%
        assert r.coverage_ppm >= 850000


def test_beta_binomial_python_replay(spark):
    cust = {c.c_custkey: c.c_nationkey
            for c in load_table(spark, SF, "customer").collect()}
    nat = {n.n_nationkey: n.n_name
           for n in load_table(spark, SF, "nation").collect()}
    lab = defaultdict(lambda: [0, 0])
    for o in load_table(spark, SF, "orders").collect():
        g = lab[nat[cust[o.o_custkey]]]
        g[0] += 1
        g[1] += 1 if o.o_orderpriority in ("1-URGENT", "2-HIGH") else 0
    nn = sum(v[0] for v in lab.values())
    m1 = tdiv(1000000 * sum(v[1] for v in lab.values()), nn)
    s2 = tdiv(
        sum(n1 * (tdiv(1000000 * y1, n1) - m1) ** 2
            for n1, y1 in lab.values()),
        nn,
    )
    m = max(1, tdiv(m1 * (1000000 - m1), s2) - 1)
    got = {r.n_name: r for r in
           REGISTRY["beta_binomial_shrinkage"].spark(spark, SF).collect()}
    assert set(got) == set(lab)
    for name, (n1, y1) in lab.items():
        r = got[name]
        raw = tdiv(1000000 * y1, n1)
        shrunk = tdiv(1000000 * y1 + m * m1, n1 + m)
        assert (r.n1, r.y1) == (n1, y1)
        assert (r.raw_ppm, r.shrunk_ppm) == (raw, shrunk)
        assert (r.prior_strength, r.pooled_ppm) == (m, m1)
        # shrinkage moves toward the pool and never past it
        assert abs(r.shrunk_ppm - m1) <= abs(raw - m1) + 1


def test_katz_python_replay(spark):
    by_order = defaultdict(list)
    for li in load_table(spark, SF, "lineitem").collect():
        by_order[li.l_orderkey].append(li.l_suppkey)
    w = defaultdict(int)
    for sups in by_order.values():
        ss = sorted(sups)
        for i, s1 in enumerate(ss):
            for s2 in ss[i + 1:]:
                if s1 < s2:
                    w[(s1, s2)] += 1
    adj = defaultdict(list)
    for (s1, s2), c in w.items():
        if c >= 2 and (s1 * 31 + s2 * 17) % 20 == 0:
            adj[s1].append(s2)
            adj[s2].append(s1)
    w1 = {v: len(ns) for v, ns in adj.items()}
    w2 = {v: sum(w1[u] for u in ns) for v, ns in adj.items()}
    w3 = {v: sum(w2[u] for u in ns) for v, ns in adj.items()}
    katz = {v: 100 * w1[v] + 10 * w2[v] + w3[v] for v in adj}
    top = sorted(katz.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    rows = REGISTRY["katz_centrality_rounds"].spark(spark, SF).collect()
    assert len(rows) == min(15, len(adj))
    for r, (v, k) in zip(rows, top):
        assert (r.node, r.katz_scaled) == (v, k)
        assert (r.walks_1, r.walks_2, r.walks_3) == (w1[v], w2[v], w3[v])
        # walk counts grow with the damped sum; degree is the floor
        assert r.katz_scaled >= 100 * r.walks_1


def test_mediation_python_replay(spark):
    rows = [(_cents(li.l_discount), int(li.l_quantity),
             _cents(li.l_extendedprice))
            for li in load_table(spark, SF, "lineitem").collect()]
    n = len(rows)
    sx = sum(r[0] for r in rows)
    sm = sum(r[1] for r in rows)
    sy = sum(r[2] for r in rows)
    sxx = n * sum(r[0] ** 2 for r in rows) - sx * sx
    smm = n * sum(r[1] ** 2 for r in rows) - sm * sm
    sxm = n * sum(r[0] * r[1] for r in rows) - sx * sm
    sxy = n * sum(r[0] * r[2] for r in rows) - sx * sy
    smy = n * sum(r[1] * r[2] for r in rows) - sm * sy
    rxx, rmm, rxm = tdiv(sxx, 1000), tdiv(smm, 1000), tdiv(sxm, 1000)
    rxy, rmy = tdiv(sxy, 1000), tdiv(smy, 1000)
    det = rxx * rmm - rxm * rxm
    a = tdiv(1000 * sxm, sxx)
    b = tdiv(1000 * (rxx * rmy - rxm * rxy), det)
    direct = tdiv(1000 * (rmm * rxy - rxm * rmy), det)
    total = tdiv(1000 * sxy, sxx)
    r = REGISTRY["mediation_product_paths"].spark(spark, SF).collect()[0]
    assert r.n == n
    assert (r.a_path_milli, r.b_path_milli) == (a, b)
    assert (r.direct_milli, r.total_milli) == (direct, total)
    assert r.indirect_milli == tdiv(a * b, 1000)
    # the mediation identity c = c' + a*b holds up to truncation slack:
    # a is truncated to milli, so a*b carries up to ~|b|/2000 + reduction
    # slack from the div-1000 lanes
    slack = 3 + (abs(b) + abs(a)) // 1000
    assert abs(r.total_milli - (r.direct_milli + r.indirect_milli)) <= slack
    # quantity is (near-)independent of discount on this lake, so the
    # mediated pathway is a minor share of the total effect
    assert abs(r.indirect_milli) < abs(r.total_milli) // 10
