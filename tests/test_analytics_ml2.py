"""Invariant tests for the ML-eval/survival/basket/link-analysis wave
(naive_bayes_lang_eval, nelson_aalen_hazard, apriori_frequent_triples,
hits_hub_authority, calibration_reliability_bins,
gini_gain_feature_ranking) — independent Python references replicating
the exact integer arithmetic, plus structural guarantees beyond the
cross-engine parity that test_queries_oracle.py already runs.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    ).collect()


def test_naive_bayes_matches_python_reference(spark):
    """Laplace-smoothed integer-ppm NB (prior * p(source|lang) *
    p(len_bucket|lang), argmax with smallest-lang tie-break) in pure
    Python must reproduce the per-language held-out accuracy exactly."""
    docs = _docs(spark)
    train = [r for r in docs if (r.doc_id // 20) % 2 == 0]
    test = [r for r in docs if (r.doc_id // 20) % 2 == 1]
    n_train = len(train)
    nl = Counter(r.lang for r in train)
    c1 = Counter((r.lang, r.source) for r in train)
    c2 = Counter((r.lang, r.n_chars // 300) for r in train)
    v1 = len({r.source for r in train})
    v2 = len({r.n_chars // 300 for r in train})
    langs = sorted(nl)
    ok = Counter()
    tot = Counter()
    for r in test:
        best = None
        for g in langs:
            prior = nl[g] * 1_000_000 // n_train
            p1 = (c1[(g, r.source)] + 1) * 1_000_000 // (nl[g] + v1)
            p2 = (c2[(g, r.n_chars // 300)] + 1) * 1_000_000 // (nl[g] + v2)
            score = prior * p1 * p2
            assert score < 2**63
            if best is None or score > best[0] or (
                score == best[0] and g < best[1]
            ):
                best = (score, g)
        tot[r.lang] += 1
        if best[1] == r.lang:
            ok[r.lang] += 1
    got = {r.lang: r for r in
           REGISTRY["naive_bayes_lang_eval"].spark(spark, SF).collect()}
    assert set(got) == set(tot)
    for g, r in got.items():
        assert (r.n_test, r.n_correct) == (tot[g], ok[g]), g
        assert r.accuracy_ppm == ok[g] * 1_000_000 // tot[g]


def test_nelson_aalen_matches_python_reference(spark):
    """Risk sets, per-time hazard increments (d*1e6 // n_at_risk) and the
    cumulative sum must match a direct Python computation; the cumulative
    hazard must be nondecreasing and n_at_risk strictly decreasing."""
    rows = (
        load_table(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            ).alias("span"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        )
        .collect()
    )
    mx = max(r.last_d for r in rows)
    from datetime import timedelta

    cutoff = mx - timedelta(days=30)
    spans = sorted({r.span for r in rows})
    n_total = len(rows)
    expect = []
    cum = 0
    seen = 0
    for t in spans:
        m_at = sum(1 for r in rows if r.span == t)
        d = sum(1 for r in rows if r.span == t and r.last_d < cutoff)
        n_risk = n_total - seen
        seen += m_at
        if d > 0:
            inc = d * 1_000_000 // n_risk
            cum += inc
            expect.append((t, n_risk, d, inc, cum))
        # censored-only times contribute no increment
    got = REGISTRY["nelson_aalen_hazard"].spark(spark, SF).collect()
    assert [
        (r.span_days, r.n_at_risk, r.d_events, r.hazard_inc_ppm,
         r.cum_hazard_ppm)
        for r in got
    ] == expect
    risks = [r.n_at_risk for r in got]
    assert risks == sorted(risks, reverse=True)
    cums = [r.cum_hazard_ppm for r in got]
    assert cums == sorted(cums)


def test_apriori_matches_naive_python_enumeration(spark):
    """Level-wise candidate pruning must return exactly the naive
    all-triples enumeration above the same relative support threshold
    (downward closure makes them provably equal)."""
    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % 50).alias("cat"))
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r.l_orderkey].add(r.cat)
    nb = len(baskets)
    minsup = max(1, nb // 1500)
    sup = Counter()
    for items in baskets.values():
        for t in combinations(sorted(items), 3):
            sup[t] += 1
    expect = sorted(
        ((a, b, c, s) for (a, b, c), s in sup.items() if s >= minsup),
        key=lambda t: (-t[3], t[0], t[1], t[2]),
    )[:25]
    got = REGISTRY["apriori_frequent_triples"].spark(spark, SF).collect()
    assert [(r.item_a, r.item_b, r.item_c, r.support) for r in got] == expect
    for r in got:
        assert r.support_ppm == r.support * 1_000_000 // nb


def test_hits_matches_python_reference(spark):
    """Two max-normalized integer HITS rounds in Python must reproduce
    the top-15 authority board; scores must be in (0, 1e6] with the max
    exactly 1e6 (normalization pins the leader to the grid top)."""
    rows = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .join(
            load_table(spark, SF, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    )
    edges = {(r.o_custkey, r.l_suppkey) for r in rows}
    a1 = Counter()
    for _, s in edges:
        a1[s] += 1_000_000
    mxa = max(a1.values())
    a1n = {s: v * 1_000_000 // mxa for s, v in a1.items()}
    h1 = Counter()
    for c, s in edges:
        h1[c] += a1n[s]
    mxh = max(h1.values())
    h1n = {c: v * 1_000_000 // mxh for c, v in h1.items()}
    a2 = Counter()
    indeg = Counter()
    for c, s in edges:
        a2[s] += h1n[c]
        indeg[s] += 1
    mxa2 = max(a2.values())
    board = sorted(
        ((s, indeg[s], v * 1_000_000 // mxa2) for s, v in a2.items()),
        key=lambda t: (-t[2], t[0]),
    )[:15]
    got = REGISTRY["hits_hub_authority"].spark(spark, SF).collect()
    assert [(r.suppkey, r.indeg, r.authority_e6) for r in got] == board
    assert got[0].authority_e6 == 1_000_000
    assert all(0 < r.authority_e6 <= 1_000_000 for r in got)


def test_calibration_bins_match_python_reference(spark):
    """Per-bin counts, mean predicted ppm, observed rate and |gap| must
    match a direct Python computation; bin populations must sum to the
    test-half size."""
    docs = _docs(spark)
    train = [r for r in docs if (r.doc_id // 20) % 2 == 0]
    test = [r for r in docs if (r.doc_id // 20) % 2 == 1]
    rate = {}
    by_src = defaultdict(list)
    for r in train:
        by_src[r.source].append(1 if r.lang == "en" else 0)
    for s, ys in by_src.items():
        rate[s] = sum(ys) * 1_000_000 // len(ys)
    g = sum(1 for r in train if r.lang == "en") * 1_000_000 // len(train)
    bins = defaultdict(lambda: [0, 0, 0])  # n, sum_pred, pos
    for r in test:
        p = rate.get(r.source, g)
        b = min(p // 100_000, 9)
        bins[b][0] += 1
        bins[b][1] += p
        bins[b][2] += 1 if r.lang == "en" else 0
    got = REGISTRY["calibration_reliability_bins"].spark(spark, SF).collect()
    assert {r.bin for r in got} == set(bins)
    for r in got:
        n, sp, pos = bins[r.bin]
        assert r.n_test == n
        assert r.mean_pred_ppm == sp // n
        assert r.obs_pos_ppm == pos * 1_000_000 // n
        assert r.abs_gap_ppm == abs(sp // n - pos * 1_000_000 // n)
    assert sum(r.n_test for r in got) == len(test)


def test_gini_gain_matches_python_reference_and_noise_ranks_last(spark):
    """Parent/child impurities and gains must match a direct Python
    computation; the real signal (source) must rank first and clear
    the noise-control floor by a wide margin."""
    docs = _docs(spark)
    n = len(docs)
    parent_cnt = Counter(r.lang for r in docs)
    parent_ppm = (n * n - sum(c * c for c in parent_cnt.values())) \
        * 1_000_000 // (n * n)
    feats = {
        "source": lambda r: r.source,
        "len_bucket": lambda r: str(r.n_chars // 200),
        "id_noise": lambda r: str(r.doc_id % 7),
    }
    expect = {}
    for fname, fv in feats.items():
        per_val = defaultdict(Counter)
        for r in docs:
            per_val[fv(r)][r.lang] += 1
        child = 0
        for cnts in per_val.values():
            n_v = sum(cnts.values())
            sq_v = sum(c * c for c in cnts.values())
            child += (n_v * n_v - sq_v) * 1_000_000 // (n * n_v)
        expect[fname] = (len(per_val), child, parent_ppm - child)
    got = REGISTRY["gini_gain_feature_ranking"].spark(spark, SF).collect()
    assert len(got) == 3
    for r in got:
        n_values, child, gain = expect[r.feature]
        assert (r.n_values, r.parent_gini_ppm, r.child_gini_ppm,
                r.gain_ppm) == (n_values, parent_ppm, child, gain), r.feature
    ranked = sorted(got, key=lambda r: r.rank)
    assert [r.rank for r in ranked] == [1, 2, 3]
    # source is the only real signal in the synthetic corpus: it must
    # rank first and clear the noise-control floor by >= 3x
    assert ranked[0].feature == "source"
    floor = next(r.gain_ppm for r in got if r.feature == "id_noise")
    assert ranked[0].gain_ppm >= 3 * floor
    assert all(r.gain_ppm >= 0 for r in got)
