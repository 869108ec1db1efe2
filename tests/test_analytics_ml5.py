"""Invariant tests for the experimentation/survey-design/diagnostics/
propagation wave (two_proportion_ab_test, neyman_allocation_plan,
partitioner_balance_audit, influence_cascade_rounds) — independent
Python references replicating the exact integer arithmetic.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _md5mod(key: str, hexlen: int, mod: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:hexlen], 16) % mod


def test_two_proportion_ab_matches_python_reference(spark):
    """Counts, ppm rates and the floor-div z2_centi chain must match a
    Python replication; the A/A hash split should not read significant."""
    rows = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 450),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .collect()
    )
    n = [0, 0]
    c = [0, 0]
    for r in rows:
        v = _md5mod(f"{r.user_id}:ab7", 6, 2)
        n[v] += 1
        c[v] += r.conv
    p_a = c[0] * 1_000_000 // n[0]
    p_b = c[1] * 1_000_000 // n[1]
    pool = (c[0] + c[1]) * 1_000_000 // (n[0] + n[1])
    z2 = (
        ((p_a - p_b) * (p_a - p_b) // 10000)
        * n[0]
        * n[1]
        // (max(pool * (1_000_000 - pool) // 1_000_000, 1) * (n[0] + n[1]))
    )
    r = REGISTRY["two_proportion_ab_test"].spark(spark, SF).collect()[0]
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (n[0], n[1], c[0], c[1])
    assert (r.p_a_ppm, r.p_b_ppm, r.diff_ppm) == (p_a, p_b, p_a - p_b)
    assert r.z2_centi == z2
    assert r.significant_05 == (1 if z2 > 384 else 0)
    # the split is A/A by construction: both arms sample one population
    assert r.significant_05 == 0


def test_neyman_allocation_matches_python_reference(spark):
    """isqrt(N_s*Syy - Sy^2) weights, Hamilton quotas summing exactly to
    budget, and the variable-strata-get-more property must hold."""
    rows = load_table(spark, SF, "documents").select(
        "source", "n_chars"
    ).collect()
    per = defaultdict(list)
    for r in rows:
        per[r.source].append(r.n_chars)
    w = {}
    for src, ys in per.items():
        ss = len(ys) * sum(y * y for y in ys) - sum(ys) ** 2
        w[src] = math.isqrt(ss)
    tot_w = sum(w.values())
    tot_n = sum(len(v) for v in per.values())
    shares = {
        src: (10000 * ws // tot_w, (10000 * ws) % tot_w)
        for src, ws in w.items()
    }
    leftover = 10000 - sum(q for q, _ in shares.values())
    order = sorted(shares, key=lambda s: (-shares[s][1], s))
    quota = {
        src: shares[src][0] + (1 if order.index(src) < leftover else 0)
        for src in shares
    }
    got = {r.source: r for r in
           REGISTRY["neyman_allocation_plan"].spark(spark, SF).collect()}
    assert set(got) == set(per)
    for src, r in got.items():
        assert r.n_s == len(per[src])
        assert r.neyman_weight == w[src], src
        assert r.n_sample == quota[src], src
        assert r.proportional_n == len(per[src]) * 10000 // tot_n
    assert sum(r.n_sample for r in got.values()) == 10000


def test_partitioner_balance_matches_python_reference(spark):
    """Bucket occupancy under key-mod and md5 partitioners must match; a
    strided key domain must look at least as skewed under key_mod."""
    rows = load_table(spark, SF, "lineitem").select("l_suppkey").collect()
    keys = [r.l_suppkey for r in rows]
    mod_c = Counter(k % 32 for k in keys)
    md5_c = Counter(_md5mod(str(k), 6, 32) for k in keys)
    got = {r.partitioner: r for r in
           REGISTRY["partitioner_balance_audit"].spark(spark, SF).collect()}
    for name, cnt in (("key_mod", mod_c), ("hash_md5", md5_c)):
        r = got[name]
        assert r.n_buckets == len(cnt)
        assert r.n_rows == len(keys)
        assert r.max_bucket == max(cnt.values())
        assert r.min_bucket == min(cnt.values())
        assert r.max_over_ideal_ppm == max(cnt.values()) * 32 * 1_000_000 // len(keys)
        assert r.max_over_ideal_ppm >= 1_000_000


def test_influence_cascade_matches_python_reference(spark):
    """3 deterministic IC rounds (md5 edge gates, anti-joined frontiers)
    in Python must reproduce per-round activation counts; activations
    must be disjoint across rounds."""
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
    deg = Counter(s for s, _ in edges)
    seeds = sorted(deg, key=lambda n: (-deg[n], n))[:2]
    activated = {n: 0 for n in seeds}
    frontier = set(seeds)
    for rnd in (1, 2, 3):
        new = set()
        for s, d in edges:
            if s in frontier and d not in activated:
                if _md5mod(f"{s}>{d}:r{rnd}", 6, 10) < 3:
                    new.add(d)
        for nd in new:
            activated[nd] = rnd
        frontier = new
    expect = defaultdict(list)
    for node, rnd in activated.items():
        expect[rnd].append(node)
    got = REGISTRY["influence_cascade_rounds"].spark(spark, SF).collect()
    assert [(r.round, r.newly_activated, r.first_node) for r in got] == [
        (rnd, len(ns), min(ns)) for rnd, ns in sorted(expect.items())
    ]
    assert got[0].newly_activated == 2  # the two seeds
