"""Invariant tests for the trend/association/privacy/fusion/attribution
wave (mann_kendall_theil_sen, cramers_v2_matrix, kanonymity_risk_audit,
reciprocal_rank_fusion, shapley_channel_attribution) — independent
Python references replicating the exact integer arithmetic.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from itertools import combinations

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero division (Spark div / DuckDB // semantics)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_mann_kendall_theil_sen_matches_python_reference(spark):
    """S, tie-corrected var18, the squared-compare alarm and the lower
    median of truncated pairwise slopes must match Python exactly."""
    rows = (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append((r.d, r.c))
    got = {r.event_type: r for r in
           REGISTRY["mann_kendall_theil_sen"].spark(spark, SF).collect()}
    assert set(got) == set(by_type)
    for et, series in by_type.items():
        series.sort()
        n = len(series)
        s_stat = 0
        slopes = []
        for (d1, c1), (d2, c2) in combinations(series, 2):
            s_stat += (c2 > c1) - (c2 < c1)
            slopes.append(
                (_tdiv((c2 - c1) * 1_000_000, (d2 - d1).days), d1, d2)
            )
        ties = Counter(c for _, c in series)
        corr = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
        var18 = n * (n - 1) * (2 * n + 5) - corr
        slopes.sort()
        sen = slopes[(len(slopes) + 1) // 2 - 1][0]
        r = got[et]
        assert (r.n_days, r.n_pairs, r.s_stat, r.var18) == (
            n, len(slopes), s_stat, var18), et
        assert r.alarm_05 == (
            1 if s_stat * s_stat * 180000 > 38416 * var18 else 0
        )
        assert r.sen_slope_e6 == sen, et


def test_cramers_v2_matches_python_reference(spark):
    """Full-grid chi2 with milli-scaled integer expected counts and the
    V^2 normalization must match Python; V^2 must sit in [0, 1e6]."""
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    ).collect()
    n = len(docs)
    feats = {
        "lang": lambda r: r.lang,
        "len_bucket": lambda r: str(r.n_chars // 200),
        "source": lambda r: r.source,
    }
    names = sorted(feats)
    got = {(r.feature_x, r.feature_y): r for r in
           REGISTRY["cramers_v2_matrix"].spark(spark, SF).collect()}
    assert set(got) == set(combinations(names, 2))
    for fx, fy in combinations(names, 2):
        obs = Counter((feats[fx](r), feats[fy](r)) for r in docs)
        rowm = Counter()
        colm = Counter()
        for (vx, vy), o in obs.items():
            rowm[vx] += o
            colm[vy] += o
        chi2 = 0
        for vx, rr in rowm.items():
            for vy, cc in colm.items():
                o = obs.get((vx, vy), 0)
                e = max(rr * cc * 1000 // n, 1)
                chi2 += (o * 1000 - e) ** 2 // e
        m = min(len(rowm) - 1, len(colm) - 1)
        r = got[(fx, fy)]
        assert (r.n_rows, r.r_levels, r.c_levels, r.chi2_micro) == (
            n, len(rowm), len(colm), chi2), (fx, fy)
        assert r.v2_ppm == chi2 * 1000 // (n * m)
        assert 0 <= r.v2_ppm <= 1_100_000  # small slack for E flooring


def test_kanonymity_matches_python_reference(spark):
    """Class sizes, bucket rollups and minimum l-diversity must match a
    direct Python computation; row shares must sum to ~1e6."""
    rows = load_table(spark, SF, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    ).collect()
    cls = defaultdict(list)
    for r in rows:
        cents = round(r.c_acctbal * 100)
        cls[(r.c_nationkey, r.c_mktsegment, _tdiv(cents, 100000))].append(cents)
    buckets = defaultdict(lambda: [0, 0, 10**9])
    total = len(rows)
    for members in cls.values():
        k = len(members)
        order = 1 if k == 1 else 2 if k < 5 else 3 if k < 10 else 4
        b = buckets[order]
        b[0] += 1
        b[1] += k
        b[2] = min(b[2], len(set(members)))
    got = {r.bucket_order: r for r in
           REGISTRY["kanonymity_risk_audit"].spark(spark, SF).collect()}
    assert set(got) == set(buckets)
    for order, (n_classes, n_rows, min_l) in buckets.items():
        r = got[order]
        assert (r.n_classes, r.n_rows, r.min_l_diversity) == (
            n_classes, n_rows, min_l), order
        assert r.rows_share_ppm == n_rows * 1_000_000 // total
    assert sum(r.n_rows for r in got.values()) == total


def test_rrf_matches_python_reference(spark):
    """Both rankings, the 1e6//(60+rank) contributions and the fused
    top-15 must match Python exactly."""
    rows = load_table(spark, SF, "documents").filter(
        F.col("text").isNotNull()
    ).select("doc_id", "text").collect()
    q = {"join", "vector", "stream"}
    stats = {}
    for r in rows:
        toks = re.findall(r"[a-z]+", r.text.lower())
        hits = [t for t in toks if t in q]
        if hits:
            stats[r.doc_id] = (len(hits), len(set(hits)), len(toks))
    a = sorted(stats, key=lambda d: (-stats[d][0], d))[:50]
    b = sorted(stats, key=lambda d: (-stats[d][1], stats[d][2], d))[:50]
    ra = {d: i + 1 for i, d in enumerate(a)}
    rb = {d: i + 1 for i, d in enumerate(b)}
    fused = {}
    for d in set(ra) | set(rb):
        s = 0
        if d in ra:
            s += 1_000_000 // (60 + ra[d])
        if d in rb:
            s += 1_000_000 // (60 + rb[d])
        fused[d] = s
    expect = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = REGISTRY["reciprocal_rank_fusion"].spark(spark, SF).collect()
    assert [(r.doc_id, r.rrf_score_e6) for r in got] == expect
    for r in got:
        assert r.rank_tf == ra.get(r.doc_id), r.doc_id
        assert r.rank_coverage == rb.get(r.doc_id), r.doc_id


def test_shapley_matches_python_reference_and_efficiency(spark):
    """Coalition values v(S) (subset-contained conversions), the sixth-
    weighted marginals and the efficiency property (credits sum to
    v(N) - v(empty)) must hold exactly."""
    rows = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("a"),
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("b"),
            F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("c"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("cv"),
        )
        .collect()
    )
    conv_by_mask = Counter()
    users_by_mask = Counter()
    for r in rows:
        mask = r.a + 2 * r.b + 4 * r.c
        conv_by_mask[mask] += r.cv
        users_by_mask[mask] += 1
    v = {
        s: sum(cv for m, cv in conv_by_mask.items() if m & (7 - s) == 0)
        for s in range(8)
    }
    weights = {0: 2, 1: 1, 2: 1, 3: 2, 4: 1, 5: 2, 6: 2}
    expect = {}
    for channel, bit in (("click", 1), ("view", 2), ("signup", 4)):
        wsum = sum(
            weights[s] * (v[s + bit] - v[s])
            for s in range(8)
            if s & bit == 0
        )
        expect[channel] = wsum * 1_000_000 // 6
    got = {r.channel: r for r in
           REGISTRY["shapley_channel_attribution"].spark(spark, SF).collect()}
    assert set(got) == set(expect)
    for channel, r in got.items():
        assert r.shapley_e6 == expect[channel], channel
        assert r.total_conversions == v[7]
        bit = {"click": 1, "view": 2, "signup": 4}[channel]
        assert r.users_touched == sum(
            nu for m, nu in users_by_mask.items() if m & bit
        )
    # efficiency up to the three independent floor divisions
    total = sum(r.shapley_e6 for r in got.values())
    target = (v[7] - v[0]) * 1_000_000
    assert target - 3 <= total <= target
