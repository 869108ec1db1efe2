"""Invariant tests for the drift/rules/bootstrap/storage/causal wave
(ks_test_two_sample, association_rules_from_triples,
poisson_bootstrap_ci, delta_encoding_compression_audit,
difference_in_differences, stratified_ate_adjustment) — independent
Python references replicating the exact integer arithmetic.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from itertools import combinations

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _events(spark):
    return (
        load_table(spark, SF, "events")
        .select(
            "event_id",
            "event_type",
            "user_id",
            F.unix_micros("ts").alias("us"),
            "value",
        )
        .collect()
    )


def test_ks_two_sample_matches_python_reference(spark):
    """D numerator, attaining value and the squared-form alarm must match
    a direct Python computation of max |c1cum*n2 - c2cum*n1|."""
    rows = _events(spark)
    mid = (min(r.us for r in rows) + max(r.us for r in rows)) // 2
    by_type = defaultdict(lambda: (Counter(), Counter()))
    for r in rows:
        side = 0 if r.us < mid else 1
        by_type[r.event_type][side][int(r.value // 1)] += 1
    got = {r.event_type: r for r in
           REGISTRY["ks_test_two_sample"].spark(spark, SF).collect()}
    assert set(got) == set(by_type)
    for et, (c1, c2) in by_type.items():
        n1, n2 = sum(c1.values()), sum(c2.values())
        cum1 = cum2 = 0
        best = (-1, None)
        for v in sorted(set(c1) | set(c2)):
            cum1 += c1.get(v, 0)
            cum2 += c2.get(v, 0)
            dn = abs(cum1 * n2 - cum2 * n1)
            if dn > best[0]:
                best = (dn, v)
        r = got[et]
        assert (r.n_early, r.n_late, r.d_num, r.d_at_value) == (
            n1, n2, best[0], best[1]), et
        assert r.d_ppm == best[0] * 1_000_000 // (n1 * n2)
        alarm = 1 if best[0] ** 2 * 10000 > 18496 * (n1 + n2) * n1 * n2 else 0
        assert r.alarm_05 == alarm, et


def _baskets(spark):
    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % 50).alias("cat"))
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r.l_orderkey].add(r.cat)
    return baskets


def test_association_rules_match_python_reference(spark):
    """Rule confidence/lift from pair+triple+item supports in Python must
    reproduce the top-20 board; lift must exceed 1e6 exactly when the
    consequent is overrepresented among antecedent baskets."""
    baskets = _baskets(spark)
    nb = len(baskets)
    minsup = max(1, nb // 1500)
    i1, p2, t3 = Counter(), Counter(), Counter()
    for items in baskets.values():
        s = sorted(items)
        i1.update(s)
        p2.update(combinations(s, 2))
        t3.update(combinations(s, 3))
    rules = []
    for (a, b, c), s3 in t3.items():
        if s3 < minsup:
            continue
        for ante, cons in (((a, b), c), ((a, c), b), ((b, c), a)):
            conf = s3 * 1_000_000 // p2[ante]
            lift = conf * nb // i1[cons]
            rules.append((ante[0], ante[1], cons, s3, conf, lift))
    expect = sorted(rules, key=lambda t: (-t[4], t[0], t[1], t[2]))[:20]
    got = REGISTRY["association_rules_from_triples"].spark(spark, SF).collect()
    assert [
        (r.ante_a, r.ante_b, r.conseq, r.support, r.confidence_ppm,
         r.lift_ppm)
        for r in got
    ] == expect


def _poisson_w(key: str) -> int:
    m = int(hashlib.md5(key.encode()).hexdigest()[:12], 16) % 10000
    for k, thr in enumerate((3679, 7358, 9197, 9810, 9963, 9994, 9999)):
        if m < thr:
            return k
    return 7


def test_poisson_bootstrap_matches_python_reference(spark):
    """The deterministic md5 Poisson weights, per-replicate integer means
    and 2nd/63rd order-statistic CI must match Python exactly."""
    rows = (
        load_table(spark, SF, "orders")
        .select(
            F.col("o_orderpriority").alias("p"),
            F.col("o_orderkey").alias("k"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
                "cents"
            ),
        )
        .collect()
    )
    by_p = defaultdict(list)
    for r in rows:
        by_p[r.p].append((r.k, r.cents))
    got = {r.priority: r for r in
           REGISTRY["poisson_bootstrap_ci"].spark(spark, SF).collect()}
    assert set(got) == set(by_p)
    for p, items in by_p.items():
        means = []
        for b in range(64):
            sw = swc = 0
            for k, cents in items:
                w = _poisson_w(f"{k}:{b}")
                sw += w
                swc += w * cents
            means.append((swc // sw, b))
        means.sort()
        lo, hi = means[1][0], means[62][0]
        r = got[p]
        assert r.n_orders == len(items)
        assert r.mean_cents == sum(c for _, c in items) // len(items)
        assert (r.ci_lo_cents, r.ci_hi_cents) == (lo, hi), p
        assert r.ci_width_cents == hi - lo
        assert r.ci_lo_cents <= r.ci_hi_cents


def test_delta_encoding_matches_python_reference(spark):
    """Elias-gamma totals (2*floor(log2 d)+1 via int.bit_length) and the
    fixed-width alternative must match; gamma must never beat the
    entropy floor of 1 bit/delta."""
    rows = (
        load_table(spark, SF, "events")
        .select("event_type", "event_id")
        .collect()
    )
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r.event_id)
    got = {r.event_type: r for r in
           REGISTRY["delta_encoding_compression_audit"]
           .spark(spark, SF).collect()}
    assert set(got) == set(by_type)
    for et, ids in by_type.items():
        ids.sort()
        deltas = [b - a for a, b in zip(ids, ids[1:])]
        gamma = sum(2 * (d.bit_length() - 1) + 1 for d in deltas)
        fixed = len(deltas) * max(d.bit_length() for d in deltas)
        r = got[et]
        assert (r.n_deltas, r.gamma_total_bits, r.fixed_width_bits) == (
            len(deltas), gamma, fixed), et
        assert r.raw_bits == len(deltas) * 64
        assert r.gamma_ratio_ppm == gamma * 1_000_000 // (len(deltas) * 64)
        assert r.gamma_total_bits >= len(deltas)


def test_did_matches_python_reference(spark):
    """All four cell means (floor-div micro-units) and the DiD estimate
    must match a direct Python computation."""
    rows = _events(spark)
    mid = (min(r.us for r in rows) + max(r.us for r in rows)) // 2
    cells = defaultdict(lambda: [0, 0])
    for r in rows:
        t = 1 if r.user_id % 5 == 0 else 0
        post = 1 if r.us >= mid else 0
        y = round(r.value * 1_000_000)
        cells[(r.event_type, t, post)][0] += y
        cells[(r.event_type, t, post)][1] += 1
    got = {r.event_type: r for r in
           REGISTRY["difference_in_differences"].spark(spark, SF).collect()}
    for et in {k[0] for k in cells}:
        def m(t, post):
            s, n = cells[(et, t, post)]
            return s // n
        r = got[et]
        assert (r.treated_pre_micro, r.treated_post_micro,
                r.control_pre_micro, r.control_post_micro) == (
            m(1, 0), m(1, 1), m(0, 0), m(0, 1)), et
        assert r.did_micro == (m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0))


def test_stratified_ate_matches_python_reference(spark):
    """Naive and stratum-weighted adjusted effects (exact cents) must
    match Python, with dropped one-armed strata counted."""
    rows = (
        load_table(spark, SF, "lineitem")
        .select(
            (F.col("l_partkey") % 50).alias("s"),
            F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("t"),
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias(
                "y"
            ),
        )
        .collect()
    )
    per = defaultdict(lambda: [0, 0, 0, 0])  # st, nt, sc, nc
    gt = [0, 0]
    gc = [0, 0]
    for r in rows:
        cell = per[r.s]
        if r.t:
            cell[0] += r.y
            cell[1] += 1
            gt[0] += r.y
            gt[1] += 1
        else:
            cell[2] += r.y
            cell[3] += 1
            gc[0] += r.y
            gc[1] += 1
    kept_num = kept_den = dropped = 0
    for st, nt, sc, nc in per.values():
        if nt == 0 or nc == 0:
            dropped += 1
            continue
        n_s = nt + nc
        kept_num += n_s * (st // nt - sc // nc)
        kept_den += n_s
    r = REGISTRY["stratified_ate_adjustment"].spark(spark, SF).collect()[0]
    assert r.n_strata == len(per)
    assert r.n_dropped_strata == dropped
    assert r.mean_treated_cents == gt[0] // gt[1]
    assert r.mean_control_cents == gc[0] // gc[1]
    assert r.naive_diff_cents == gt[0] // gt[1] - gc[0] // gc[1]
    # floor-div of a possibly-negative numerator: Spark's `div` truncates
    # toward zero while Python floors, so compare via the same div rule
    num, den = kept_num, kept_den
    expect_adj = abs(num) // den * (1 if num >= 0 else -1)
    assert r.adjusted_diff_cents == expect_adj
