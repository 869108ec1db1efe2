"""Invariant tests for the coding/ring/intermittent-forecast wave
(huffman_code_audit, consistent_hash_ring_rebalance,
croston_intermittent_forecast) — independent Python references.

The Huffman reference rebuilds the tree with the SAME deterministic
tie-break (weight, then sentinel-member-string) and additionally
checks the cost identity and optimality vs the fixed 3-bit code.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_huffman_matches_python_reference(spark):
    freq = Counter(
        r.event_type
        for r in load_table(spark, SF, "events").select("event_type").collect()
    )
    nodes = sorted((w, f"|{t}|") for t, w in freq.items())
    log = []
    while len(nodes) > 1:
        (w1, s1), (w2, s2) = nodes[0], nodes[1]
        merged = (w1 + w2, s1 + s2)
        log.append(merged[1])
        nodes = sorted(nodes[2:] + [merged])
    lens = {
        t: sum(1 for s in log if f"|{t}|" in s) for t in freq
    }
    total = sum(freq.values())
    got = {r.event_type: r for r in
           REGISTRY["huffman_code_audit"].spark(spark, SF).collect()}
    assert set(got) == set(freq)
    for t in freq:
        r = got[t]
        assert r.w == freq[t]
        assert r.code_len == lens[t], t
        assert r.weighted_bits == freq[t] * lens[t]
        assert r.total_mass == total
        assert r.fixed_cost_bits == 3 * total
    # Huffman cost identity: sum of merge weights == sum w*len
    merge_cost = 0
    nodes2 = sorted((w, f"|{t}|") for t, w in freq.items())
    while len(nodes2) > 1:
        m = (nodes2[0][0] + nodes2[1][0], nodes2[0][1] + nodes2[1][1])
        merge_cost += m[0]
        nodes2 = sorted(nodes2[2:] + [m])
    assert sum(r.weighted_bits for r in got.values()) == merge_cost
    # optimality vs fixed-length 3-bit code for a 5-symbol alphabet
    assert merge_cost <= 3 * total
    # Kraft equality for a full (every-internal-node-binary) code tree
    max_len = max(lens.values())
    assert sum(2 ** (max_len - lens[t]) for t in freq) == 2 ** max_len


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_ring_rebalance_matches_python_reference(spark):
    ring = sorted(
        (_h8(f"vnode-{j}"), j % 8) for j in range(64)
    )
    surv = [x for x in ring if x[1] != 7]

    def assign(kh, arr):
        for h, node in arr:
            if h >= kh:
                return node
        return arr[0][1]

    keys = [
        r.c_custkey
        for r in load_table(spark, SF, "customer").select("c_custkey").collect()
    ]
    before = defaultdict(int)
    stayed = defaultdict(int)
    moved_out = defaultdict(int)
    gained = defaultdict(int)
    for k in keys:
        kh = _h8(f"ring:{k}")
        b = assign(kh, ring)
        a = assign(kh, surv)
        before[b] += 1
        if a == b:
            stayed[b] += 1
        else:
            moved_out[b] += 1
            gained[a] += 1
    got = {r.node: r for r in
           REGISTRY["consistent_hash_ring_rebalance"].spark(spark, SF)
           .collect()}
    assert set(got) == set(before)
    for node, r in got.items():
        assert (r.n_before, r.n_stayed, r.n_moved_out, r.n_gained) == (
            before[node], stayed[node], moved_out[node], gained[node],
        ), node
        # minimal movement: only the removed node loses keys
        if node != 7:
            assert r.n_moved_out == 0
        else:
            assert r.n_moved_out == r.n_before and r.n_gained == 0


_W = [250, 188, 141, 105, 79, 59, 45, 33]


def test_croston_matches_python_reference(spark):
    part_brand = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, SF, "part")
        .select("p_partkey", "p_brand")
        .collect()
    }
    daily = defaultdict(int)
    for r in (
        load_table(spark, SF, "lineitem")
        .selectExpr("l_partkey", "CAST(l_shipdate AS DATE) AS day",
                    "CAST(l_quantity AS BIGINT) AS q")
        .collect()
    ):
        daily[(part_brand[r.l_partkey], r.day)] += r.q
    series = defaultdict(list)
    for (brand, day), z in daily.items():
        series[brand].append((day, z))
    got = {r.p_brand: r for r in
           REGISTRY["croston_intermittent_forecast"].spark(spark, SF)
           .collect()}
    assert set(got) == set(series)
    for brand, pts in series.items():
        pts.sort()
        gaps = [None] + [
            (pts[i][0] - pts[i - 1][0]).days for i in range(1, len(pts))
        ]
        recent = list(range(len(pts) - 1, -1, -1))[:8]  # indices, newest 1st
        wz = sum(_W[k] * pts[i][1] for k, i in enumerate(recent))
        wzs = sum(_W[k] for k in range(len(recent)))
        wq = sum(
            _W[k] * gaps[i]
            for k, i in enumerate(recent)
            if gaps[i] is not None
        )
        wqs = sum(
            _W[k] for k, i in enumerate(recent) if gaps[i] is not None
        )
        r = got[brand]
        assert r.n_obs == len(pts)
        assert r.last_day == pts[-1][0]
        z_hat = wz * 1000 // wzs
        q_hat = 0 if wqs == 0 else wq * 1000 // wqs
        assert r.z_hat_milli == z_hat, brand
        assert r.q_hat_milli == q_hat, brand
        want_rate = 0 if wqs == 0 or wq == 0 else z_hat * 1000 // q_hat
        assert r.croston_rate_milli == want_rate, brand
        # a demand rate can't exceed the smoothed size per single day
        if q_hat >= 1000:
            assert r.croston_rate_milli <= z_hat + 1000
