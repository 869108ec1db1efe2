"""Invariant tests for the corpus-law/uplift wave
(heaps_vocab_growth_curve, zipf_rank_frequency_audit,
qini_uplift_deciles) — independent Python references.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("doc_id", "text")
        .collect()
    )


def test_heaps_curve_matches_python_reference(spark):
    docs = _docs(spark)
    lo = min(r.doc_id for r in docs)
    hi = max(r.doc_id for r in docs)
    per_bucket_tokens = defaultdict(int)
    per_bucket_docs = defaultdict(set)
    first_seen = {}
    for r in sorted(docs, key=lambda d: d.doc_id):
        b = min(9, (r.doc_id - lo) * 10 // (hi - lo + 1))
        toks = re.findall("[a-z]+", r.text.lower())
        per_bucket_tokens[b] += len(toks)
        per_bucket_docs[b].add(r.doc_id)
        for t in toks:
            if t not in first_seen or first_seen[t] > b:
                first_seen[t] = b
    new_terms = Counter(first_seen.values())
    got = REGISTRY["heaps_vocab_growth_curve"].spark(spark, SF).collect()
    assert [r.bucket for r in got] == sorted(per_bucket_tokens)
    tokens_cum = vocab_cum = 0
    for r in got:
        b = r.bucket
        tokens_cum += per_bucket_tokens[b]
        vocab_cum += new_terms.get(b, 0)
        assert r.n_docs == len(per_bucket_docs[b])
        assert r.n_tokens == per_bucket_tokens[b]
        assert r.new_terms == new_terms.get(b, 0)
        assert r.tokens_cum == tokens_cum
        assert r.vocab_cum == vocab_cum
        assert r.ttr_ppm == vocab_cum * 1_000_000 // tokens_cum
    # Heaps sublinearity: TTR is non-increasing down the curve on any
    # natural-ish corpus; new vocabulary per token decays
    ttrs = [r.ttr_ppm for r in got]
    assert ttrs[-1] <= ttrs[0]


def test_zipf_audit_matches_python_reference(spark):
    freq = Counter()
    for r in _docs(spark):
        freq.update(re.findall("[a-z]+", r.text.lower()))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    bands = defaultdict(list)  # band -> [(r, f)]
    for i, (_t, f) in enumerate(ranked, 1):
        bands[(i - 1) // 10].append((i, f))
    got = {r.rank_band: r for r in
           REGISTRY["zipf_rank_frequency_audit"].spark(spark, SF).collect()}
    assert set(got) == set(bands)
    for band, pairs in bands.items():
        rfs = [r * f for r, f in pairs]
        g = got[band]
        assert g.n_terms == len(pairs)
        assert g.min_freq == min(f for _, f in pairs)
        assert g.max_freq == max(f for _, f in pairs)
        assert (g.sum_rf, g.min_rf, g.max_rf) == (
            sum(rfs), min(rfs), max(rfs),
        )
        assert g.rf_spread_ppm == (max(rfs) - min(rfs)) * 1_000_000 // sum(
            rfs
        )


def test_qini_matches_python_reference(spark):
    ev = load_table(spark, SF, "events").select(
        "user_id", "event_type"
    ).collect()
    clicks = defaultdict(int)
    purch = defaultdict(int)
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "click":
            clicks[r.user_id] += 1
        elif r.event_type == "purchase":
            purch[r.user_id] += 1
    byscore = defaultdict(lambda: [0, 0, 0, 0])  # n_t, n_c, y_t, y_c
    for u in users:
        t = int(
            hashlib.md5(f"{u}:qini".encode()).hexdigest()[:8], 16
        ) % 2
        y = 1 if purch.get(u, 0) >= 1 else 0
        s = byscore[clicks.get(u, 0)]
        if t:
            s[0] += 1
            s[2] += y
        else:
            s[1] += 1
            s[3] += y
    got = REGISTRY["qini_uplift_deciles"].spark(spark, SF).collect()
    assert [r.score for r in got] == sorted(byscore, reverse=True)
    cnt, cnc, cyt, cyc = 0, 0, 0, 0
    for r in got:
        n_t, n_c, y_t, y_c = byscore[r.score]
        cnt += n_t
        cnc += n_c
        cyt += y_t
        cyc += y_c
        assert (r.n_t, r.n_c, r.y_t, r.y_c) == (n_t, n_c, y_t, y_c)
        assert (r.cum_nt, r.cum_nc, r.cum_yt, r.cum_yc) == (
            cnt, cnc, cyt, cyc,
        )
        assert r.qini_num == cyt * cnc - cyc * cnt
        want = (
            0
            if cnt == 0 or cnc == 0
            else cyt * 1_000_000 // cnt - cyc * 1_000_000 // cnc
        )
        assert r.cum_uplift_ppm == want
    # the full-population prefix: uplift estimate equals the overall
    # treatment-control conversion gap (randomized treatment => ~0 in
    # expectation, but here we just pin internal consistency)
    assert got[-1].cum_nt + got[-1].cum_nc == len(users)
