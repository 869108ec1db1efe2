"""Invariant tests for the data-contract/corpus/encoding/off-policy wave
(functional_dependency_audit, lexical_richness_audit,
rle_compression_audit, bandit_replay_evaluation, dow_seasonality_profile)
— independent Python references.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_fd_audit_matches_python_reference(spark):
    """FD violation counts; orders' PK and the reflexive control HOLD,
    the many-to-many candidates do not — and the audit correctly
    exposes that the synthetic lake violates TPC-H's
    (orderkey, linenumber) composite key."""
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    ).collect()
    ev = load_table(spark, SF, "events").select("user_id", "event_type").collect()
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    ).collect()

    def violations(pairs):
        m = defaultdict(set)
        for lhs, rhs in pairs:
            m[lhs].add(rhs)
        return len(m), sum(1 for v in m.values() if len(v) > 1)

    expect = {
        "lineitem: (orderkey,linenumber) -> suppkey": violations(
            ((r.l_orderkey, r.l_linenumber), r.l_suppkey) for r in li
        ),
        "lineitem: partkey -> suppkey": violations(
            (r.l_partkey, r.l_suppkey) for r in li
        ),
        "orders: custkey -> orderpriority": violations(
            (r.o_custkey, r.o_orderpriority) for r in orders
        ),
        "events: user -> event_type": violations(
            (r.user_id, r.event_type) for r in ev
        ),
        "orders: orderkey -> custkey": violations(
            (r.o_orderkey, r.o_custkey) for r in orders
        ),
    }
    got = {r.fd: r for r in
           REGISTRY["functional_dependency_audit"].spark(spark, SF).collect()}
    for fd, (n_lhs, n_viol) in expect.items():
        r = got[fd]
        assert (r.n_lhs, r.n_violating) == (n_lhs, n_viol), fd
        assert r.violation_ppm == n_viol * 1_000_000 // n_lhs
        assert r.holds == (1 if n_viol == 0 else 0)
    assert got["orders: orderkey -> custkey"].holds == 1
    assert got["customer: (nation,segment) -> mktsegment band"].holds == 1
    # the synthetic lake breaks TPC-H's composite-key contract — the
    # audit's whole point is surfacing exactly this:
    assert got["lineitem: (orderkey,linenumber) -> suppkey"].holds == 0
    assert got["lineitem: partkey -> suppkey"].holds == 0
    assert got["events: user -> event_type"].holds == 0


def test_lexical_richness_matches_python_reference(spark):
    rows = (
        load_table(spark, SF, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", "text")
        .collect()
    )
    per_src = defaultdict(Counter)
    for r in rows:
        per_src[r.source].update(r.text.split(" "))
    got = {r.source: r for r in
           REGISTRY["lexical_richness_audit"].spark(spark, SF).collect()}
    assert set(got) == set(per_src)
    for src, cnts in per_src.items():
        n_tok, n_typ = sum(cnts.values()), len(cnts)
        hapax = sum(1 for c in cnts.values() if c == 1)
        r = got[src]
        assert r.n_tokens == n_tok
        assert r.n_types == n_typ
        assert r.ttr_ppm == n_typ * 1_000_000 // n_tok
        assert r.hapax_types == hapax
        assert r.hapax_ppm == hapax * 1_000_000 // n_typ


def test_rle_audit_matches_python_reference(spark):
    rows = load_table(spark, SF, "events").select(
        F.to_date("ts").alias("day"), "event_type", "ts", "event_id"
    ).collect()
    per_day = defaultdict(list)
    for r in rows:
        per_day[r.day].append((r.ts, r.event_id, r.event_type))
    got = {r.day: r for r in
           REGISTRY["rle_compression_audit"].spark(spark, SF).collect()}
    assert set(got) == set(per_day)
    for day, vs in per_day.items():
        vs.sort()
        runs = sum(
            1 for i, v in enumerate(vs) if i == 0 or v[2] != vs[i - 1][2]
        )
        r = got[day]
        assert r.n_values == len(vs)
        assert r.n_runs_ts_order == runs
        assert r.n_runs_if_sorted == len({v[2] for v in vs})
        assert r.avg_run_len_milli == 1000 * len(vs) // runs
        assert r.rle_ratio_ppm == runs * 1_000_000 // len(vs)
        assert r.n_runs_if_sorted <= r.n_runs_ts_order  # sort never worse


def test_bandit_replay_matches_python_reference(spark):
    rows = load_table(spark, SF, "events").select(
        "user_id", "event_type", F.dayofmonth("ts").alias("dom"),
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vm"),
    ).collect()
    h1 = Counter()
    for r in rows:
        if r.dom <= 15:
            h1[(r.user_id, r.event_type)] += 1
    users = {u for u, _ in h1}
    pol = {}
    for u in users:
        cands = sorted(
            ((t, c) for (uu, t), c in h1.items() if uu == u),
            key=lambda tc: (-tc[1], tc[0]),
        )
        pol[u] = cands[0][0]
    gtot = Counter()
    for (_, t), c in h1.items():
        gtot[t] += c
    garm = min(gtot, key=lambda t: (-gtot[t], t))
    h2 = [
        (r.event_type, r.vm, pol.get(r.user_id, garm))
        for r in rows if r.dom > 15
    ]
    overall = sum(v for _, v, _ in h2) // len(h2)
    got = {r.arm: r for r in
           REGISTRY["bandit_replay_evaluation"].spark(spark, SF).collect()}
    arms = {a for _, _, a in h2}
    assert set(got) == arms
    for arm in arms:
        logged = [(t, v) for t, v, a in h2 if a == arm]
        matched = [v for t, v in logged if t == arm]
        r = got[arm]
        assert r.n_logged == len(logged)
        assert r.n_matched == len(matched)
        m_avg = sum(matched) // max(len(matched), 1)
        assert r.matched_avg_micro == m_avg
        assert r.overall_avg_micro == overall
        assert r.lift_micro == m_avg - overall


def test_dow_seasonality_matches_python_reference(spark):
    rows = load_table(spark, SF, "events").select(
        "event_type",
        F.date_format("ts", "EEEE").alias("dow"),
        F.to_date("ts").alias("day"),
    ).collect()
    cal = defaultdict(set)
    cnt = Counter()
    tot = Counter()
    for r in rows:
        cal[r.dow].add(r.day)
        cnt[(r.event_type, r.dow)] += 1
        tot[r.event_type] += 1
    total_days = sum(len(v) for v in cal.values())
    got = {(r.event_type, r.dow): r for r in
           REGISTRY["dow_seasonality_profile"].spark(spark, SF).collect()}
    assert set(got) == set(cnt)
    for (et, dow), n in cnt.items():
        r = got[(et, dow)]
        assert r.n_events == n
        assert r.seasonality_index_ppm == n * total_days * 1_000_000 // (
            len(cal[dow]) * tot[et]
        )
