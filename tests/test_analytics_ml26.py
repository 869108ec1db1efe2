"""Invariant tests for the graph-normalization/finance/tree wave
(clustering_coefficient_global, discounted_ltv_npv, gini_tree_depth2)
— independent Python references (the tree reference runs full greedy
CART induction at depth 2 with the same exact integer impurity).
"""

from __future__ import annotations

import re
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_clustering_coefficient_matches_python_reference(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    o2c = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, SF, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    by_u = defaultdict(set)
    for r in li:
        by_u[o2c[r.l_orderkey]].add(r.l_partkey % 50)
    adj = defaultdict(set)
    for items in by_u.values():
        for a in items:
            for b in items:
                if a != b:
                    adj[a].add(b)
    tri_at = defaultdict(int)
    n_tri = 0
    nodes = sorted(adj)
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    n_tri += 1
                    tri_at[a] += 1
                    tri_at[b] += 1
                    tri_at[c] += 1
    loc = {
        v: (len(adj[v]), tri_at[v], len(adj[v]) * (len(adj[v]) - 1) // 2)
        for v in nodes
    }
    n_wedges = sum(w for _, _, w in loc.values())
    want = sorted(loc.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    got = REGISTRY["clustering_coefficient_global"].spark(spark, SF).collect()
    assert len(got) == len(want)
    for r, (node, (d, t, w)) in zip(got, want):
        assert (r.node, r.degree, r.triangles_at, r.wedges) == (node, d, t, w)
        assert r.local_cc_ppm == (0 if w == 0 else t * 1_000_000 // w)
        assert r.n_nodes == len(nodes)
        assert r.n_triangles == n_tri
        assert r.global_cc_ppm == (
            0 if n_wedges == 0 else 3 * n_tri * 1_000_000 // n_wedges
        )
        assert r.local_cc_ppm <= 1_000_000


_DISC = [1000, 900, 810, 729, 656, 590, 531, 478]


def test_discounted_ltv_matches_python_reference(spark):
    orders = (
        load_table(spark, SF, "orders")
        .selectExpr(
            "o_custkey",
            "CAST(year(o_orderdate) AS BIGINT) AS yr",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .collect()
    )
    first = {}
    for r in orders:
        first[r.o_custkey] = min(first.get(r.o_custkey, 9999), r.yr)
    cohort_n = defaultdict(int)
    for c in first.values():
        cohort_n[c] += 1
    nominal = defaultdict(int)
    npv = defaultdict(int)
    rev = defaultdict(int)
    for r in orders:
        rev[(first[r.o_custkey], r.yr - first[r.o_custkey])] += r.cents
    for (cohort, k), cents in rev.items():
        nominal[cohort] += cents
        npv[cohort] += cents * _DISC[k] // 1000
    got = {r.cohort: r for r in
           REGISTRY["discounted_ltv_npv"].spark(spark, SF).collect()}
    assert set(got) == set(cohort_n)
    for cohort in cohort_n:
        r = got[cohort]
        assert r.n_customers == cohort_n[cohort]
        assert r.nominal_cents == nominal[cohort]
        assert r.npv_cents == npv[cohort]
        assert r.npv_share_ppm == npv[cohort] * 1_000_000 // nominal[cohort]
        assert r.npv_per_customer_cents == npv[cohort] // cohort_n[cohort]
        assert r.npv_cents <= r.nominal_cents  # discounting only shrinks


_FEATS = ["avg6", "digit", "len500", "tok90"]


def _doc_rows(spark):
    out = []
    for r in (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("lang", "n_chars", "text")
        .collect()
    ):
        toks = len(re.findall("[a-z]+", r.text.lower()))
        out.append(
            {
                "y": 1 if r.lang == "en" else 0,
                "len500": 1 if r.n_chars >= 500 else 0,
                "tok90": 1 if toks >= 90 else 0,
                "digit": 1 if re.search("[0-9]", r.text) else 0,
                "avg6": 1 if r.n_chars >= 6 * toks else 0,
            }
        )
    return out


def _gini(n, p):
    return 0 if n == 0 else 2 * p * (n - p) * 1_000_000 // (n * n)


def _split(rows, feats):
    n = len(rows)
    p = sum(r["y"] for r in rows)
    gp = _gini(n, p)
    best = None
    for f in sorted(feats):
        n1 = sum(1 for r in rows if r[f] == 1)
        p1 = sum(r["y"] for r in rows if r[f] == 1)
        n0, p0 = n - n1, p - p1
        wa = (
            (0 if n0 == 0 else n0 * _gini(n0, p0))
            + (0 if n1 == 0 else n1 * _gini(n1, p1))
        ) // n
        gain = gp - wa
        if best is None or gain > best[1]:
            best = (f, gain, wa)
    return n, p, gp, best


def test_gini_tree_matches_python_reference(spark):
    rows = _doc_rows(spark)
    n, p, gp, (root_f, root_gain, root_wa) = _split(rows, _FEATS)
    got = {r.node: r for r in
           REGISTRY["gini_tree_depth2"].spark(spark, SF).collect()}
    r = got["root"]
    assert (r.feature, r.n, r.p) == (root_f, n, p)
    assert (r.gini_parent_ppm, r.weighted_after, r.gain_ppm) == (
        gp, root_wa, root_gain,
    )
    rest = [f for f in _FEATS if f != root_f]
    correct_total = 0
    for b in (0, 1):
        sub = [x for x in rows if x[root_f] == b]
        nb, pb, gb, (bf, bgain, bwa) = _split(sub, rest)
        rb = got[f"branch{b}"]
        assert (rb.feature, rb.n, rb.p) == (bf, nb, pb), b
        assert (rb.gini_parent_ppm, rb.weighted_after, rb.gain_ppm) == (
            gb, bwa, bgain,
        )
        for v in (0, 1):
            leaf = [x for x in sub if x[bf] == v]
            lp = sum(x["y"] for x in leaf)
            correct_total += max(lp, len(leaf) - lp)
    acc = correct_total * 1_000_000 // len(rows)
    assert all(r.accuracy_ppm == acc for r in got.values())
    # greedy induction can only improve on the majority-class baseline
    assert acc >= max(p, n - p) * 1_000_000 // n
