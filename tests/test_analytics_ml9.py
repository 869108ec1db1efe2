"""Invariant tests for the skip-gram/power-analysis/permutation wave
(skipgram_pair_counts, ab_sample_size_plan, permutation_test_diff_means)
— independent Python references replicating the exact integer
arithmetic.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _md5mod(key: str, hexlen: int, mod: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:hexlen], 16) % mod


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_skipgram_matches_python_reference(spark):
    """Top-200 vocab prune, +/-2 position window and pair counts must
    match Python; co-occurrence is symmetric by construction."""
    rows = load_table(spark, SF, "documents").filter(
        F.col("text").isNotNull()
    ).select("doc_id", "text").collect()
    toks = {r.doc_id: re.findall(r"[a-z]+", r.text.lower()) for r in rows}
    freq = Counter(t for ts in toks.values() for t in ts)
    vocab = set(
        sorted(freq, key=lambda t: (-freq[t], t))[:200]
    )
    pairs = Counter()
    for ts in toks.values():
        idx = [(i + 1, t) for i, t in enumerate(ts) if t in vocab]
        for ai in range(len(idx)):
            pa, ta = idx[ai]
            for bi in range(len(idx)):
                pb, tb = idx[bi]
                if pa != pb and pa - 2 <= pb <= pa + 2:
                    pairs[(ta, tb)] += 1
    expect = sorted(
        ((a, b, c) for (a, b), c in pairs.items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:30]
    got = REGISTRY["skipgram_pair_counts"].spark(spark, SF).collect()
    assert [(r.center, r.context, r.n_cooc) for r in got] == expect
    full = dict(pairs)
    for r in got:
        assert full.get((r.context, r.center)) == r.n_cooc  # symmetry


def test_sample_size_plan_matches_python_reference(spark):
    """The ppm floor-div power formula must match Python; required n must
    be decreasing in MDE; powered_now consistent with n_now/2."""
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
    n_now = len(rows)
    p = sum(r.conv for r in rows) * 1_000_000 // n_now
    got = REGISTRY["ab_sample_size_plan"].spark(spark, SF).collect()
    assert [r.mde_ppm for r in got] == [10000, 20000, 30000, 40000, 50000]
    prev = None
    for r in got:
        need = (
            2 * 78848 * (p * (1_000_000 - p) // 1_000_000)
            // (r.mde_ppm * r.mde_ppm // 10000)
        )
        assert (r.baseline_ppm, r.n_now) == (p, n_now)
        assert r.n_per_arm_required == need, r.mde_ppm
        assert r.powered_now == (1 if n_now // 2 >= need else 0)
        if prev is not None:
            assert r.n_per_arm_required <= prev
        prev = r.n_per_arm_required


def test_permutation_test_matches_python_reference(spark):
    """Observed diff, 64 md5 re-randomized null diffs and the add-one
    p-value must match Python exactly."""
    rows = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)"
            ).alias("y")
        )
        .collect()
    )
    ys = {r.user_id: r.y for r in rows}

    def diff(assign):
        t = [y for u, y in ys.items() if assign(u)]
        c = [y for u, y in ys.items() if not assign(u)]
        if not t or not c:
            return None  # engine lanes yield NULL: never counts as extreme
        return _tdiv(sum(t), len(t)) - _tdiv(sum(c), len(c))

    d_obs = diff(lambda u: u % 5 == 0)
    extreme = 0
    for b in range(64):
        d_b = diff(lambda u, b=b: _md5mod(f"{u}:perm:{b}", 6, 5) == 0)
        if d_b is not None and abs(d_b) >= abs(d_obs):
            extreme += 1
    r = REGISTRY["permutation_test_diff_means"].spark(spark, SF).collect()[0]
    assert r.observed_diff_micro == d_obs
    assert r.n_permutations == 64
    assert r.n_as_extreme == extreme
    assert r.p_value_ppm == (extreme + 1) * 1_000_000 // 65
    assert 0 < r.p_value_ppm <= 1_000_000
