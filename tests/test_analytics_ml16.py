"""Invariant tests for the temporal-logic/IR-eval/IVM wave
(lead_lag_cross_correlation, clustering_rand_index,
golden_record_survivorship, interval_allen_algebra,
average_precision_eval, incremental_join_maintenance) — independent
Python references replicating the exact integer arithmetic.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _md5_lane(s: str, nhex: int = 12) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)


def _cents(v: float) -> int:
    # round-half-away-from-zero, matching Spark/DuckDB round()
    return int(math.copysign(math.floor(abs(v) * 100 + 0.5), v))


def test_lead_lag_cross_correlation_matches_python_reference(spark):
    rows = (
        load_table(spark, SF, "events")
        .select("ts", "event_type")
        .collect()
    )
    a = Counter()
    b = Counter()
    for r in rows:
        d = r.ts.date()
        if r.event_type == "error":
            a[d] += 1
        elif r.event_type == "purchase":
            b[d] += 1
    ref = {}
    for lag in range(-3, 4):
        n = sa = sb = saa = sbb = sab = 0
        for d, xa in a.items():
            xb = b.get(d + dt.timedelta(days=lag))
            if xb is None:
                continue
            n += 1
            sa += xa
            sb += xb
            saa += xa * xa
            sbb += xb * xb
            sab += xa * xb
        if n == 0:
            continue
        cov = n * sab - sa * sb
        vv = (n * saa - sa * sa) * (n * sbb - sb * sb)
        sd = math.isqrt(vv)
        cc = 1000 * cov // sd if cov >= 0 else -(1000 * (-cov) // sd)
        ref[lag] = (n, cc)
    best = min(ref, key=lambda lag: (-abs(ref[lag][1]), lag))
    got = REGISTRY["lead_lag_cross_correlation"].spark(spark, SF).collect()
    assert {r.lag for r in got} == set(ref)
    for r in got:
        n, cc = ref[r.lag]
        assert (r.n_days, r.ccf_milli) == (n, cc), r.lag
        assert r.is_best_lag == (1 if r.lag == best else 0)
        assert abs(r.ccf_milli) <= 1000


def test_clustering_rand_index_matches_python_reference(spark):
    rows = (
        load_table(spark, SF, "embeddings")
        .select("label", "embedding")
        .collect()
    )
    ct = Counter()
    for r in rows:
        e = r.embedding
        if e is None or len(e) < 4:
            continue
        sig = sum(1 << (3 - i) for i in range(4) if e[i] > 0)
        ct[(sig, r.label)] += 1
    n = sum(ct.values())
    comb = lambda k: k * (k - 1) // 2
    sum_ij = sum(comb(v) for v in ct.values())
    ni = Counter()
    nj = Counter()
    for (c, l), v in ct.items():
        ni[c] += v
        nj[l] += v
    sum_i = sum(comb(v) for v in ni.values())
    sum_j = sum(comb(v) for v in nj.values())
    purity = sum(
        max(v for (c2, _), v in ct.items() if c2 == c) for c in ni
    )
    ri_ppm = (comb(n) + 2 * sum_ij - sum_i - sum_j) * 1_000_000 // comb(n)
    [got] = REGISTRY["clustering_rand_index"].spark(spark, SF).collect()
    assert got.n_points == n
    assert got.n_clusters == len(ni)
    assert got.n_labels == len(nj)
    assert got.purity_ppm == purity * 1_000_000 // n
    assert got.rand_index_ppm == ri_ppm
    assert 0 <= got.rand_index_ppm <= 1_000_000


def test_golden_record_survivorship_matches_python_reference(spark):
    rows = (
        load_table(spark, SF, "customer")
        .select("c_custkey", "c_mktsegment", "c_name", "c_acctbal")
        .collect()
    )
    clusters = defaultdict(list)
    for r in rows:
        clusters[r.c_custkey // 3].append(r)
    seg_fp = bal_fp = nm_fp = 0
    seg_conf = bal_conf = nm_conf = 0
    for members in clusters.values():
        segs = Counter(m.c_mktsegment for m in members)
        chosen = min(segs, key=lambda s: (-segs[s], s))
        seg_fp += _md5_lane(chosen)
        seg_conf += len(segs) > 1
        bals = {_cents(m.c_acctbal) for m in members}
        bal_fp += _md5_lane(str(max(bals)))
        bal_conf += len(bals) > 1
        names = {m.c_name for m in members}
        longest = min(names, key=lambda s: (-len(s), s))
        nm_fp += _md5_lane(longest)
        nm_conf += len(names) > 1
    nc = len(clusters)
    ref = {
        "mktsegment: mode": (nc, seg_conf, seg_fp),
        "acctbal: max": (nc, bal_conf, bal_fp),
        "name: longest": (nc, nm_conf, nm_fp),
    }
    got = REGISTRY["golden_record_survivorship"].spark(spark, SF).collect()
    assert len(got) == 3
    for r in got:
        n, conf, fp = ref[r.rule]
        assert (r.n_clusters, r.n_conflicted, r.chosen_fingerprint) == (
            n,
            conf,
            fp,
        ), r.rule
        assert r.conflict_ppm == conf * 1_000_000 // n


ALLEN_RELATIONS = {
    "before",
    "meets",
    "overlaps",
    "finished_by",
    "contains",
    "starts",
    "equals",
    "started_by",
}


def test_interval_allen_algebra_matches_python_reference(spark):
    rows = (
        load_table(spark, SF, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .collect()
    )
    epoch = dt.date(1970, 1, 1)
    by_cust = defaultdict(list)
    for r in rows:
        s = (r.o_orderdate.date() - epoch).days
        by_cust[r.o_custkey].append(
            (s, r.o_orderkey, s + 1 + r.o_orderkey % 14)
        )
    cnt = Counter()
    fp = Counter()
    for iv in by_cust.values():
        iv.sort()
        for (s1, k1, e1), (s2, k2, e2) in zip(iv, iv[1:]):
            if s1 == s2 and e1 == e2:
                rel = "equals"
            elif s1 == s2 and e1 < e2:
                rel = "starts"
            elif s1 == s2:
                rel = "started_by"
            elif e1 < s2:
                rel = "before"
            elif e1 == s2:
                rel = "meets"
            elif e1 < e2:
                rel = "overlaps"
            elif e1 == e2:
                rel = "finished_by"
            else:
                rel = "contains"
            cnt[rel] += 1
            fp[rel] += _md5_lane(f"{k1}_{k2}", 10)
    total = sum(cnt.values())
    got = REGISTRY["interval_allen_algebra"].spark(spark, SF).collect()
    assert {r.relation for r in got} == set(cnt)
    assert set(cnt) <= ALLEN_RELATIONS
    for r in got:
        assert r.n_pairs == cnt[r.relation]
        assert r.pair_fingerprint == fp[r.relation]
        assert r.share_ppm == cnt[r.relation] * 1_000_000 // total


def test_average_precision_matches_python_reference(spark):
    terms = ["data", "join", "query", "stream", "vector"]
    rows = (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("doc_id", "text")
        .collect()
    )
    cand = defaultdict(dict)  # term -> doc_id -> (tf, rel)
    for r in rows:
        lt = r.text.lower()
        head = lt[:100]
        tf = Counter(re.findall("[a-z]+", lt))
        for t in terms:
            if tf[t]:
                cand[t][r.doc_id] = (tf[t], 1 if t in head else 0)
    ref = {}
    for t, docs in cand.items():
        ranked = sorted(docs.items(), key=lambda kv: (-kv[1][0], kv[0]))
        n_rel = sum(rel for _, (_, rel) in ranked)
        hits = 0
        ap_scaled = 0
        for k, (_, (_, rel)) in enumerate(ranked[:10], start=1):
            hits += rel
            if rel:
                ap_scaled += hits * (2520 // k)
        denom = min(n_rel, 10)
        ap_ppm = ap_scaled * 1_000_000 // (2520 * denom) if denom else 0
        ref[t] = (len(docs), n_rel, hits, ap_ppm)
    map_ppm = sum(v[3] for v in ref.values()) // len(ref)
    got = REGISTRY["average_precision_eval"].spark(spark, SF).collect()
    assert {r.term for r in got} == set(ref)
    for r in got:
        nc, nr, h10, ap = ref[r.term]
        assert (r.n_candidates, r.n_relevant, r.hits_at_10, r.ap_ppm) == (
            nc,
            nr,
            h10,
            ap,
        ), r.term
        assert 0 <= r.ap_ppm <= 1_000_000
        assert r.map_ppm == map_ppm


def test_incremental_join_maintenance_identity(spark):
    """The delta-decomposed rollup must equal a Python full-join
    recompute, and the snapshot/delta lanes must partition it."""
    cutoff = dt.datetime(2001, 1, 1)
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_shipdate")
        .collect()
    )
    od = (
        load_table(spark, SF, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .collect()
    )
    orders = {
        r.o_orderkey: (r.o_orderpriority, r.o_orderdate >= cutoff)
        for r in od
    }
    full = defaultdict(lambda: [0, 0, 0, 0])  # snap, delta, cnt, rev
    for r in li:
        o = orders.get(r.l_orderkey)
        if o is None:
            continue
        prio, odelta = o
        is_delta = odelta or r.l_shipdate >= cutoff
        acc = full[prio]
        acc[0] += not is_delta
        acc[1] += is_delta
        acc[2] += 1
        acc[3] += _cents(r.l_extendedprice)
    got = REGISTRY["incremental_join_maintenance"].spark(spark, SF).collect()
    assert {r.o_orderpriority for r in got} == set(full)
    for r in got:
        snap, delta, cnt, rev = full[r.o_orderpriority]
        assert (r.snap_cnt, r.delta_cnt, r.cnt, r.rev_cents) == (
            snap,
            delta,
            cnt,
            rev,
        ), r.o_orderpriority
        assert r.snap_cnt + r.delta_cnt == r.cnt
