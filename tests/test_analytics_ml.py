"""Invariant tests for the monitoring/nonparametric/graph-rounds/ML-eval
wave (cusum_changepoint_screen, rank_sum_auc_by_event_type,
label_propagation_communities, kcore_decomposition,
one_rule_classifier_eval, dataset_mix_temperature) — independent Python
references and the structural guarantees beyond cross-engine parity
(test_queries_oracle.py already checks every entry against DuckDB).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _daily_counts(spark):
    rows = (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_type: dict[str, list[tuple]] = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append((r.d, r.c))
    for v in by_type.values():
        v.sort()
    return by_type


def test_cusum_matches_recursive_python_reference(spark):
    """The window closed form S_t = C_t - min(0, min prefix C) must equal
    the textbook recursion S_t = max(0, S_{t-1} + (x_t - k)) — run the
    recursion in Python per event_type and compare peak + peak day."""
    by_type = _daily_counts(spark)
    expect = {}
    for et, series in by_type.items():
        k = sum(c for _, c in series) // len(series)
        s, peak, peak_day = 0, -1, None
        for d, c in series:
            s = max(0, s + (c - k))
            if s > peak:
                peak, peak_day = s, d
        expect[et] = (len(series), k, peak, peak_day, 1 if peak >= 3 * k else 0)
    got = REGISTRY["cusum_changepoint_screen"].spark(spark, SF).collect()
    assert len(got) == len(expect)
    for r in got:
        n_days, k, peak, peak_day, alarm = expect[r.event_type]
        assert (r.n_days, r.ref_daily, r.cusum_peak, r.alarm) == (
            n_days,
            k,
            peak,
            alarm,
        ), r.event_type
        assert r.peak_day == peak_day, r.event_type


def test_rank_sum_u_matches_python_reference(spark):
    """U2 (doubled Mann-Whitney U, one-vs-rest on integer-binned values)
    must equal a direct pair count: 2*#(a>b) + #(a==b)."""
    rows = (
        load_table(spark, SF, "events")
        .select("event_type", F.floor("value").cast("long").alias("v"))
        .collect()
    )
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r.v)
    all_vals = sorted(v for vs in by_type.values() for v in vs)
    got = {r.event_type: r for r in
           REGISTRY["rank_sum_auc_by_event_type"].spark(spark, SF).collect()}
    assert set(got) == set(by_type)
    import bisect

    for et, vals in by_type.items():
        n_self, n_rest = len(vals), len(all_vals) - len(vals)
        # count vs all (incl. self), then remove the self-vs-self pairs
        u2_all = sum(
            2 * bisect.bisect_left(all_vals, v)
            + (bisect.bisect_right(all_vals, v) - bisect.bisect_left(all_vals, v))
            for v in vals
        )
        svals = sorted(vals)
        u2_self = sum(
            2 * bisect.bisect_left(svals, v)
            + (bisect.bisect_right(svals, v) - bisect.bisect_left(svals, v))
            for v in vals
        )
        u2 = u2_all - u2_self
        r = got[et]
        assert (r.n_self, r.n_rest, r.u2) == (n_self, n_rest, u2), et
        assert r.auc_ppm == u2 * 500_000 // (n_self * n_rest)
        assert 0 <= r.auc_ppm <= 1_000_000


def _sampled_edges(spark):
    o = load_table(spark, SF, "orders").filter(F.col("o_orderkey") % 20 == 0)
    li = load_table(spark, SF, "lineitem")
    rows = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    )
    edges = set()
    for r in rows:
        a, b = f"c{r.o_custkey}", f"s{r.l_suppkey}"
        edges.add((a, b))
        edges.add((b, a))
    return edges


def test_label_propagation_matches_python_reference(spark):
    """3 synchronous min-tie-break majority rounds in pure Python must
    yield the identical community rollup."""
    edges = _sampled_edges(spark)
    nbrs = defaultdict(list)
    for s, d in edges:
        nbrs[d].append(s)
    labels = {n: n for n in nbrs}
    for _ in range(3):
        new = {}
        for node, ns in nbrs.items():
            cnt = Counter(labels[x] for x in ns)
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[node] = best
        labels = new
    rollup = Counter(labels.values())
    expect = sorted(
        (
            (lbl, c, min(n for n, l2 in labels.items() if l2 == lbl))
            for lbl, c in rollup.items()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:25]
    got = REGISTRY["label_propagation_communities"].spark(spark, SF).collect()
    assert [(r.community, r.n_members, r.first_member) for r in got] == expect


def test_kcore_matches_python_reference(spark):
    """3 peel rounds (drop degree<2 nodes, restrict edges) in Python must
    yield the identical surviving-degree histogram."""
    edges = _sampled_edges(spark)
    for _ in range(3):
        deg = Counter(s for s, _ in edges)
        surv = {n for n, d in deg.items() if d >= 2}
        edges = {(s, d) for s, d in edges if s in surv and d in surv}
    deg = Counter(s for s, _ in edges)
    hist = defaultdict(list)
    for n, d in deg.items():
        hist[d].append(n)
    expect = sorted((d, len(ns), min(ns)) for d, ns in hist.items())
    got = REGISTRY["kcore_decomposition"].spark(spark, SF).collect()
    assert [(r.degree, r.n_nodes, r.first_node) for r in got] == expect
    assert all(r.degree >= 1 for r in got)


def test_one_rule_accuracy_matches_python_reference(spark):
    """Train majority-per-feature-value on the (doc_id div 20) % 2 == 0
    half (source-decorrelated split), score the other half with
    global-majority backoff — accuracy must match exactly."""
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    ).collect()
    feats = {
        "source": lambda r: r.source,
        "len_bucket": lambda r: str(r.n_chars // 200),
    }
    got = {r.feature: r for r in
           REGISTRY["one_rule_classifier_eval"].spark(spark, SF).collect()}
    for fname, fv in feats.items():
        train = [r for r in docs if (r.doc_id // 20) % 2 == 0]
        test = [r for r in docs if (r.doc_id // 20) % 2 == 1]
        per_val = defaultdict(Counter)
        gcnt = Counter()
        for r in train:
            per_val[fv(r)][r.lang] += 1
            gcnt[r.lang] += 1
        rule = {
            v: min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            for v, c in per_val.items()
        }
        gpred = min(gcnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        n_ok = sum(1 for r in test if rule.get(fv(r), gpred) == r.lang)
        r = got[fname]
        assert (r.n_test, r.n_correct) == (len(test), n_ok), fname
        assert r.accuracy_ppm == n_ok * 1_000_000 // len(test)


def test_mix_temperature_quota_and_isqrt_invariants(spark):
    """Quotas must sum EXACTLY to the 100k budget; the integer sqrt must
    satisfy wt² <= n < (wt+1)²; flattening must move share from the
    largest source toward the smallest (τ=2 tempering direction)."""
    rows = REGISTRY["dataset_mix_temperature"].spark(spark, SF).collect()
    assert sum(r.quota for r in rows) == 100_000
    for r in rows:
        assert r.weight_isqrt == math.isqrt(r.n_docs), r.source
        assert r.mix_share_ppm == r.quota * 10
    big = max(rows, key=lambda r: r.n_docs)
    small = min(rows, key=lambda r: r.n_docs)
    if big.n_docs > small.n_docs:
        assert big.mix_share_ppm <= big.prop_share_ppm
        assert small.mix_share_ppm >= small.prop_share_ppm
    # weights are monotone in corpus size
    by_n = sorted(rows, key=lambda r: r.n_docs)
    for a, b in zip(by_n, by_n[1:]):
        assert a.weight_isqrt <= b.weight_isqrt
