"""Invariant tests for the LTV/SLO/ABC wave (cohort_ltv_curves,
slo_burn_rate_alerts, abc_pareto_classification) — independent Python
references replicating the exact integer arithmetic.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_cohort_ltv_matches_python_reference(spark):
    """Cohort indices, age buckets, cumulative revenue and per-customer
    LTV must match Python; LTV must be nondecreasing in age."""
    rows = load_table(spark, SF, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    per = defaultdict(list)
    for r in rows:
        idx = r.o_orderdate.year * 12 + r.o_orderdate.month
        per[r.o_custkey].append((idx, round(r.o_totalprice * 100)))
    cohort = {k: min(i for i, _ in v) for k, v in per.items()}
    sizes = Counter(cohort.values())
    rev = defaultdict(int)
    for k, v in per.items():
        for idx, cents in v:
            rev[(cohort[k], idx - cohort[k])] += cents
    got = REGISTRY["cohort_ltv_curves"].spark(spark, SF).collect()
    assert {(r.cohort_idx, r.age) for r in got} == set(rev)
    cum = defaultdict(int)
    by_cohort = defaultdict(list)
    for r in got:
        by_cohort[r.cohort_idx].append(r)
    for c, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age)
        running = 0
        prev_ltv = -1
        for r in rs:
            assert r.revenue_cents == rev[(c, r.age)]
            running += r.revenue_cents
            assert r.cum_revenue_cents == running
            assert r.n_customers == sizes[c]
            assert r.ltv_cents_per_customer == running // sizes[c]
            assert r.ltv_cents_per_customer >= prev_ltv
            prev_ltv = r.ltv_cents_per_customer


def test_slo_burn_rate_matches_python_reference(spark):
    """Hourly rates, the gap-correct 6h RANGE window, centi burn factors
    and the two-window AND alert rules must match Python."""
    rows = (
        load_table(spark, SF, "events")
        .select(F.unix_micros("ts").alias("us"), "event_type")
        .collect()
    )
    hours = defaultdict(lambda: [0, 0])
    for r in rows:
        h = r.us // 3_600_000_000
        hours[h][0] += 1
        hours[h][1] += 1 if r.event_type == "error" else 0
    recs = []
    for h in sorted(hours):
        n, e = hours[h]
        n6 = sum(hours[g][0] for g in hours if h - 5 <= g <= h)
        e6 = sum(hours[g][1] for g in hours if h - 5 <= g <= h)
        r1 = e * 1_000_000 // n
        r6 = e6 * 1_000_000 // n6
        b1 = r1 * 100 // 20000
        b6 = r6 * 100 // 20000
        recs.append((h, n, e, r1, r6, b1, b6,
                     1 if b1 >= 1440 and b6 >= 600 else 0,
                     1 if b1 >= 600 and b6 >= 300 else 0))
    expect = sorted(recs, key=lambda t: (-t[5], t[0]))[:20]
    got = REGISTRY["slo_burn_rate_alerts"].spark(spark, SF).collect()
    assert [
        (r.hour_idx, r.n_events, r.n_errors, r.rate_1h_ppm, r.rate_6h_ppm,
         r.burn_1h_centi, r.burn_6h_centi, r.page_alert, r.ticket_alert)
        for r in got
    ] == expect
    # a page always implies a ticket (the thresholds nest)
    for r in got:
        assert not (r.page_alert and not r.ticket_alert)


def test_abc_classification_matches_python_reference(spark):
    """Per-part revenue ranks, the cross-multiplied class boundaries and
    the class rollup must match Python; classes partition all parts and
    shares are ordered A > B-per-part > C-per-part."""
    rows = load_table(spark, SF, "lineitem").select(
        "l_partkey", "l_extendedprice"
    ).collect()
    rev = defaultdict(int)
    for r in rows:
        rev[r.l_partkey] += round(r.l_extendedprice * 100)
    total = sum(rev.values())
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    classes = defaultdict(lambda: [0, 0, 10**9, -1])
    cum = 0
    for rk, (pk, rv) in enumerate(ranked, start=1):
        before = cum
        cum += rv
        cls = "A" if before * 100 < total * 80 else (
            "B" if before * 100 < total * 95 else "C")
        c = classes[cls]
        c[0] += 1
        c[1] += rv
        c[2] = min(c[2], rk)
        c[3] = max(c[3], rk)
    got = {r.abc_class: r for r in
           REGISTRY["abc_pareto_classification"].spark(spark, SF).collect()}
    assert set(got) == set(classes)
    for cls, (n_parts, rc, frk, lrk) in classes.items():
        r = got[cls]
        assert (r.n_parts, r.revenue_cents, r.first_rank, r.last_rank) == (
            n_parts, rc, frk, lrk), cls
        assert r.revenue_share_ppm == rc * 1_000_000 // total
    assert sum(r.n_parts for r in got.values()) == len(rev)
    # rank ranges are contiguous and ordered A < B < C
    order = sorted(got.values(), key=lambda r: r.first_rank)
    assert [r.abc_class for r in order] == sorted(got)
    for a, b in zip(order, order[1:]):
        assert b.first_rank == a.last_rank + 1
