"""Invariant tests for the weighted hash-race sampler, the grid-bucketed
spatial join, and the stream-stream left-outer interval join — the
structural guarantees beyond cross-engine parity (which
test_queries_oracle.py already checks).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _race_key(doc_id: int, weight: int) -> str:
    return min(
        hashlib.md5(f"{doc_id}:{r}".encode()).hexdigest()
        for r in range(1, weight + 1)
    )


def test_weighted_sample_matches_python_reference(spark):
    """The Spark top-20 must equal an independent Python md5 race over the
    same corpus — the sample is a pure function of (doc_id, n_chars)."""
    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    ref = sorted(
        (_race_key(r.doc_id, 1 + r.n_chars % 8), r.doc_id) for r in docs
    )[:20]
    got = REGISTRY["weighted_sample_race"].spark(spark, SF).collect()
    assert [(r.sel_key, r.doc_id) for r in got] == ref
    assert [r.rank for r in got] == list(range(1, 21))


def test_weighted_race_probability_is_proportional():
    """The math the entry rests on: P(item with weight w wins the race)
    = w / Σw. Pure-Python check over 400 salted repetitions of a 2-item
    race with weights 1 and 7 — the weight-7 item must win ~7/8 of the
    time (binomial σ ≈ 0.0165; allow 4σ)."""
    wins = 0
    n = 400
    for salt in range(n):
        k_heavy = min(
            hashlib.md5(f"h{salt}:{r}".encode()).hexdigest() for r in range(7)
        )
        k_light = hashlib.md5(f"l{salt}:0".encode()).hexdigest()
        wins += k_heavy < k_light
    assert abs(wins / n - 7 / 8) < 4 * 0.0165, wins / n


def test_spatial_grid_equals_naive_containment(spark):
    """The grid-bucketed path must reproduce the naive containment join
    exactly: a point lives in exactly one cell, so a rect spanning k
    cells still meets each point once (no double counting), and the
    cell cover is complete (no missed boundary points)."""
    k = F.col("n_nationkey").cast("long")
    rects = load_table(spark, SF, "nation").select(
        k.alias("zone_key"),
        (((k * 37) % 20) * 45000).alias("x0"),
        (((k * 53) % 20) * 45000).alias("y0"),
        (((k * 37) % 20) * 45000 + 30000 + (k % 7) * 15000).alias("x1"),
        (((k * 53) % 20) * 45000 + 30000 + (k % 5) * 20000).alias("y1"),
    )
    pts = load_table(spark, SF, "events").select(
        "event_id",
        F.expr(
            "CAST(conv(substr(md5(concat('x:', CAST(event_id AS STRING))),"
            " 1, 6), 16, 10) AS BIGINT) % 1000000"
        ).alias("px"),
        F.expr(
            "CAST(conv(substr(md5(concat('y:', CAST(event_id AS STRING))),"
            " 1, 6), 16, 10) AS BIGINT) % 1000000"
        ).alias("py"),
    )
    naive = {
        (r.zone_key, r.n_points, r.sum_px, r.sum_py)
        for r in rects.join(
            pts,
            F.col("px").between(F.col("x0"), F.col("x1"))
            & F.col("py").between(F.col("y0"), F.col("y1")),
            "left",
        )
        .groupBy("zone_key")
        .agg(
            F.count("event_id").alias("n_points"),
            F.coalesce(F.sum("px"), F.lit(0)).cast("long").alias("sum_px"),
            F.coalesce(F.sum("py"), F.lit(0)).cast("long").alias("sum_py"),
        )
        .collect()
    }
    grid = {
        (r.zone_key, r.n_points, r.sum_px, r.sum_py)
        for r in REGISTRY["spatial_grid_join"].spark(spark, SF).collect()
    }
    assert grid == naive
    assert any(n > 0 for (_, n, _, _) in grid), "no rect contains any point"


def test_spatial_grid_join_is_equi_not_bnlj(spark):
    """The candidate join must be an equi hash join on the grid cell —
    BroadcastNestedLoopJoin over points × zones is the 100 TB failure
    the grid exists to prevent."""
    df = REGISTRY["spatial_grid_join"].spark(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rendezvous_rebalance_moves_only_to_new_shard(spark):
    """HRW's minimal-movement property on data: growing 8 → 9 shards,
    every moved key lands on the NEW shard (never between survivors),
    and the moved fraction is near the 1/9 expectation."""
    rows = REGISTRY["rendezvous_shard_rebalance"].spark(spark, SF).collect()
    total = sum(r.n_docs for r in rows)
    moved = sum(r.n_docs for r in rows if r.old_shard != r.new_shard)
    assert all(r.only_moves_to_new for r in rows)
    for r in rows:
        if r.old_shard != r.new_shard:
            assert r.new_shard == 8, r
    # 500 docs, E[moved] = 500/9 ≈ 56; allow a wide band (binomial 4σ ≈ 28)
    assert total == 500
    assert 25 <= moved <= 90, moved


def _strat_hv(doc_id: int) -> int:
    return int(hashlib.md5(f"{doc_id}:strat".encode()).hexdigest()[:12], 16)


def test_stratified_sample_hits_quota_exactly(spark):
    """Per-stratum sample size equals its ceil-10% quota EXACTLY (the
    contract Bernoulli sampleBy cannot make), and the sampled-id
    checksum matches an independent Python md5-rank selection."""
    docs = load_table(spark, SF, "documents").select("doc_id", "source").collect()
    by_src: dict[str, list[int]] = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r.doc_id)
    want = {}
    for src, ids in by_src.items():
        quota = (len(ids) + 9) // 10
        picked = sorted(ids, key=lambda i: (_strat_hv(i), i))[:quota]
        want[src] = (len(ids), quota, quota, sum(picked))
    got = {
        r.source: (r.n_docs, r.quota, r.n_sampled, r.sum_sampled_ids)
        for r in REGISTRY["stratified_sample_exact"].spark(spark, SF).collect()
    }
    assert got == want


def test_scd2_build_intervals_are_contiguous(spark):
    """SCD2 integrity: per key, versions number 1..n, each interval
    closes exactly where the next opens, exactly one current row, and
    no two consecutive versions carry the same state (no-op changes
    collapsed)."""
    rows = REGISTRY["scd2_build_from_changes"].spark(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r.version_n)
        assert [v.version_n for v in vs] == list(range(1, len(vs) + 1))
        assert sum(v.is_current for v in vs) == 1
        assert vs[-1].is_current and vs[-1].valid_to_us is None
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to_us == b.valid_from_us, (user, a, b)
            assert a.state != b.state, (user, a, b)


def test_fs_linkage_confusion_is_sane(spark):
    """Ground truth is known (bkey − 1M == akey), so the confusion
    matrix must be coherent: every true pair lands in exactly one
    decision class, non_match contains no true pairs, match is
    high-precision, and blocking loses some true pairs (the measured
    tradeoff — candidates < truth)."""
    rows = {
        r.decision: r
        for r in REGISTRY["record_linkage_fs_scoring"].spark(spark, SF).collect()
    }
    cand = rows["candidate_pairs"]
    assert cand.n_true_pairs < cand.n_true_total  # blocking loses some
    assert cand.n_true_pairs > cand.n_true_total * 7 // 10  # but not most
    decision_true = sum(
        r.n_true_pairs for d, r in rows.items() if d != "candidate_pairs"
    )
    assert decision_true == cand.n_true_pairs
    if "non_match" in rows:
        assert rows["non_match"].n_true_pairs == 0
    m = rows["match"]
    assert m.n_true_pairs >= m.n_pairs * 9 // 10  # precision >= 90%


def test_dp_bounded_contribution_caps_users(spark):
    """Contribution bounding on data: no user contributes more than 5
    events to the release, values are clamped to [0, 2000], and the
    released sum differs from the clamped sum by exactly the stated
    noise (|noise| <= 100 = the stand-in scale)."""
    rows = REGISTRY["dp_bounded_contribution_agg"].spark(spark, SF).collect()
    assert rows
    ev = load_table(spark, SF, "events")
    n_users = ev.select("user_id").distinct().count()
    for r in rows:
        assert r.n_contributions <= 5 * n_users
        assert r.released_sum - r.clamped_sum == r.noise
        assert abs(r.noise) <= 100
        assert r.sensitivity == 10000
        assert 0 <= r.clamped_sum <= r.n_contributions * 2000


def test_late_data_accounting_drops_exactly_four(spark):
    """The two-watermark rule on data: of the 7 late rows, the 4 whose
    window end falls at or below the lagged filter watermark are
    dropped; the 3 others merge into already-open windows. Total kept
    rows across emitted windows reflects exactly that."""
    rows = REGISTRY["streaming_late_data_accounting"].spark(spark, SF).collect()
    counts = {r.window_start_min: r.n_rows for r in rows}
    # late rows: o in {77,84,91,98,105,112,119} -> t_eff {7,14,21,28,35,42,49}
    # dropped: 77 (w_end 10 <= 19), 91/98/105 (w_end 30/30/40 <= 49)
    # kept-late: 84 -> window 10; 112 -> window 40; 119 -> window 40
    assert counts[10] == 11  # 10 on-time + o=84
    assert counts[40] == 12  # 10 on-time + o=112 + o=119
    assert counts[0] == 10 and counts[20] == 10 and counts[30] == 10
    assert counts[50] == 10 and counts[60] == 10
    # source windows lose their every-7th member to the time shift:
    # 70 loses o=77, 80 loses o=84, 90 loses BOTH o=91 and o=98
    assert counts[70] == 9 and counts[80] == 9 and counts[90] == 8
    assert 100 not in counts and 110 not in counts  # past final watermark
    # 120 offsets − 4 dropped − 17 rows still in open windows (t_eff>=100
    # on-time rows minus shifted-out members) = 99 emitted
    assert sum(counts.values()) == 99


def test_join_size_sketch_never_underestimates(spark):
    """The CMS inner-product contract: collisions only ADD cross-terms,
    so every lane's estimate >= the exact join size, and the released
    estimate is the min lane."""
    rows = REGISTRY["join_size_sketch_estimate"].spark(spark, SF).collect()
    assert len(rows) == 4
    exact = rows[0].exact_size
    assert exact > 0
    for r in rows:
        assert r.never_underestimates and r.lane_estimate >= exact
    assert all(r.cms_estimate == min(x.lane_estimate for x in rows) for r in rows)
    # 256 buckets vs ~100 keys: the min-lane estimate should be tight
    assert rows[0].cms_estimate <= exact * 3


def test_seasonal_naive_eval_is_self_consistent(spark):
    """MASE ppm is exactly the floor-division of the emitted exact sums,
    and the test window is the full trailing week."""
    rows = REGISTRY["seasonal_naive_forecast_eval"].spark(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_test_days == 7
        assert r.sum_abs_naive > 0 and r.n_train_steps > 0
        want = (r.sum_abs_err * r.n_train_steps * 1000000) // (
            r.sum_abs_naive * r.n_test_days
        )
        assert r.mase_ppm == want


def test_sssp_matches_python_bellman_ford(spark):
    """The 3-round frontier loop equals an independent Python
    Bellman-Ford over the same md5-weighted edge list."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM"
        f" read_parquet('{SF}/orders.parquet')"
    )
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM"
        f" read_parquet('{SF}/lineitem.parquet')"
    )
    raw = con.sql("""
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                      's' || CAST(l.l_suppkey AS VARCHAR) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey % 20 = 0
    """).fetchall()
    edges = {}
    for s, d in raw:
        for a, b in ((s, d), (d, s)):
            w = 1 + int(hashlib.md5(f"{a}>{b}".encode()).hexdigest()[:4], 16) % 9
            edges[(a, b)] = w
    seed = min(a for a, _ in edges)
    dist = {seed: 0}
    for _ in range(3):
        nxt = dict(dist)
        for (a, b), w in edges.items():
            if a in dist and dist[a] + w < nxt.get(b, 1 << 60):
                nxt[b] = dist[a] + w
        dist = nxt
    got = {
        r.node: r.dist
        for r in REGISTRY["sssp_weighted_frontier"].spark(spark, SF).collect()
    }
    assert got == dist
    assert got[seed] == 0 and len(got) > 1


def test_streaming_session_windows_merge_across_batches(spark):
    """27 closed sessions (9 activity blocks x 3 users; the last block
    stays open), each with exactly 4 events, at the arithmetic start
    positions — including sessions whose events arrived in different
    micro-batches (blocks misaligned with the 40-offset pacing), which
    only a merging session-state machine can produce."""
    rows = REGISTRY["streaming_session_windows"].spark(spark, SF).collect()
    assert len(rows) == 27
    got = {(r.user_id, r.session_start_min) for r in rows}
    want = {(u, 42 * b + u) for b in range(9) for u in range(3)}
    assert got == want
    assert all(r.n_events == 4 for r in rows)


def test_decayed_trending_matches_python(spark):
    """The shift-weighted decayed scores equal an independent Python
    computation over (user, day) counts, and ranks are strictly
    score-descending."""
    from collections import defaultdict

    ev = load_table(spark, SF, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r.user_id, r.d)] += 1
    dmax = max(d for _, d in daily)
    score = defaultdict(int)
    for (u, d), c in daily.items():
        score[u] += c * (1 << (30 - (dmax - d).days))
    want = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = REGISTRY["decayed_topk_trending"].spark(spark, SF).collect()
    assert [(r.user_id, r.decayed_score) for r in got] == want
    scores = [r.decayed_score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_simpson_diversity_bounds_and_python(spark):
    """0 <= index < 1e6 ppm, and each value equals the closed form over
    the per-(source, lang) counts."""
    from collections import defaultdict

    docs = load_table(spark, SF, "documents").select("source", "lang").collect()
    counts = defaultdict(lambda: defaultdict(int))
    for r in docs:
        counts[r.source][r.lang] += 1
    got = {
        r.source: (r.n_docs, r.n_langs, r.simpson_diversity_ppm)
        for r in REGISTRY["diversity_simpson_by_source"].spark(spark, SF).collect()
    }
    for src, langs in counts.items():
        n = sum(langs.values())
        want = (n * n - sum(c * c for c in langs.values())) * 1000000 // (n * n)
        assert got[src] == (n, len(langs), want)
        assert 0 <= want < 1000000


def test_streaming_outer_join_emits_unmatched_exactly(spark):
    """Null emission is exact: the diverted keys (offset % 3 == 0 under
    60) come back unmatched after the watermark passes; every other left
    row carries its equal-offset match."""
    rows = (
        REGISTRY["streaming_interval_join_outer"].spark(spark, SF).collect()
    )
    assert len(rows) == 90
    for r in rows:
        want_unmatched = r.l_off % 3 == 0 and r.l_off < 60
        assert r.matched != want_unmatched, r
        if r.matched:
            assert r.r_off == r.l_off, r
        else:
            assert r.r_off is None, r
