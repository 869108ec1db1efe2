"""Invariant tests for the round-3 sketch/pruning + quantized-ANN entries
(`bloom_filter_prune_join`, `kmv_distinct_sketch`, `pq_adc_topk`,
`jl_projection_recall`) — the structural guarantees each algorithm makes
beyond cross-engine parity (which test_queries_oracle.py already checks).
"""

from __future__ import annotations

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.01"


def test_bloom_filter_never_false_negative(spark):
    """The bloom contract: every true member passes the filter. A row with
    is_member=True and bloom_pass=False must not exist, and the per-row
    assertion column must hold everywhere."""
    rows = REGISTRY["bloom_filter_prune_join"].spark(spark, SF).collect()
    assert rows, "confusion table is empty"
    for r in rows:
        assert r.no_false_negatives
        assert not (r.is_member and not r.bloom_pass), (
            f"false negative bucket is non-empty: {r}"
        )
    # every member key lands in the pass row(s)
    n_members = sum(r.n_keys for r in rows if r.is_member)
    n_member_pass = sum(r.n_keys for r in rows if r.is_member and r.bloom_pass)
    assert n_members == n_member_pass


def test_bloom_filter_prunes_most_nonmembers(spark):
    """At sf0.01 (n=302 keys in m=16384 bits, k=3) the false-positive rate
    is ~1e-4 — the filter must reject the overwhelming majority of the
    1198 non-member keys or it prunes nothing."""
    rows = REGISTRY["bloom_filter_prune_join"].spark(spark, SF).collect()
    n_nonmember = sum(r.n_keys for r in rows if not r.is_member)
    n_rejected = sum(
        r.n_keys for r in rows if not r.is_member and not r.bloom_pass
    )
    assert n_rejected >= n_nonmember * 9 // 10


def test_kmv_merge_is_lossless_and_bounded(spark):
    """Daily-sketch union re-minned must equal the single-pass sketch
    (min-k lattice property), and the k=64 estimate must sit within the
    hard 50% sanity band (rsd is ~12.7%)."""
    rows = REGISTRY["kmv_distinct_sketch"].spark(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.merged_equals_direct, r
        assert r.within_50pct, r
        assert r.kmv_est > 0


def test_pq_adc_ranks_are_wellformed(spark):
    """Per query: exactly 5 distinct neighbors, ranks 1..5, ADC distance
    nondecreasing with rank, both distances nonnegative."""
    rows = REGISTRY["pq_adc_topk"].spark(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert by_q
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        assert len({r.neighbor_id for r in rs}) == 5
        assert all(r.adc_d2 >= 0 and r.exact_d2 >= 0 for r in rs)
        assert all(a.adc_d2 <= b.adc_d2 for a, b in zip(rs, rs[1:]))


def test_pq_adc_finds_self_first(spark):
    """The query vector is in the corpus; its own PQ code is the argmin of
    every subspace distance table, so rank 1 must be the query itself with
    exact_d2 == 0 (ADC d2 of self is the quantization residual, > 0 in
    general but still the minimum here)."""
    rows = REGISTRY["pq_adc_topk"].spark(spark, SF).collect()
    top1 = {r.query_id: r for r in rows if r.rank == 1}
    for q, r in top1.items():
        assert r.neighbor_id == q, f"query {q} rank-1 is {r.neighbor_id}"
        assert r.exact_d2 == 0


def test_jl_recall_is_meaningful(spark):
    """Projected-space recall@5 must be a valid percentage per query, the
    self-match must always survive (recall never 0), and at least one
    non-self exact neighbor must survive the projection somewhere —
    strictly above the random-chance baseline (~4·4/N per query). The
    synthetic corpus is isotropic (exact neighbors are weakly separated
    to begin with), so a HIGH absolute recall is not a valid assertion;
    the entry's contract is to REPORT measured recall, bit-stably."""
    rows = REGISTRY["jl_projection_recall"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_exact == 5
        assert 0 <= r.n_hits <= 5
        assert r.recall_pct == r.n_hits * 20
        assert r.n_hits >= 1  # self-match survives any projection
    assert any(r.n_hits > 1 for r in rows), "no non-self neighbor survived"


def test_theta_intersection_is_bounded_and_complete(spark):
    """All C(5,2)=10 priority pairs must appear, estimates within the
    hard 50% band, and the estimate must be symmetric-by-construction
    (each unordered pair appears exactly once, aud_a < aud_b)."""
    rows = REGISTRY["theta_sketch_intersection"].spark(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.aud_a < r.aud_b
        assert r.exact_both > 0
        assert r.theta_est >= 0
        assert r.within_50pct, r
        assert r.est_delta == r.theta_est - r.exact_both


def test_decontamination_bloom_prefilter_matches_exact(spark):
    """The bloom prune must be invisible in the results (no false
    negatives ⇒ identical flags/fractions to the exact entry) and
    visible in the probe stats (it must actually drop postings)."""
    exact = {
        r.eval_id: (r.n_shingles, r.max_overlap_frac, r.contaminated)
        for r in REGISTRY["decontamination_ngram_overlap"].spark(spark, SF).collect()
    }
    rows = REGISTRY["decontamination_bloom_prefilter"].spark(spark, SF).collect()
    assert len(rows) == len(exact)
    for r in rows:
        assert exact[r.eval_id] == (r.n_shingles, r.max_overlap_frac, r.contaminated)
    st = rows[0]
    assert st.n_train_pass < st.n_train_postings, (
        f"bloom pruned nothing: {st.n_train_pass}/{st.n_train_postings}"
    )
