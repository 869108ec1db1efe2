"""Invariant tests for the round-4 wave 5: Holm step-down, language
profiles, BPE compression ratio, bigram held-out coverage, dedup
cluster census — independent Python replays at sf0.001.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_holm_python_replay(spark):
    rows = REGISTRY["holm_bonferroni_screen"].spark(spark, SF).collect()
    assert len(rows) == 25
    # step-down contract: rejections are a PREFIX of the significance
    # order, and every rejected row clears its own critical value
    rejected = [r.rejected for r in sorted(rows, key=lambda r: r.rank)]
    assert rejected == sorted(rejected, reverse=True)
    for r in rows:
        if r.rejected:
            assert r.z2_milli >= r.holm_critical_milli
    # first non-rejected rank (if any) must have failed its own bar OR
    # follow a failure
    fails = [r.rank for r in rows if r.z2_milli < r.holm_critical_milli]
    stop = min(fails) if fails else 26
    for r in rows:
        assert r.rejected == (1 if r.rank < stop else 0)
    # Holm is stricter than BH: its rejection set is a subset
    bh = {r.n_name for r in
          REGISTRY["fdr_bh_screen"].spark(spark, SF).collect() if r.rejected}
    holm = {r.n_name for r in rows if r.rejected}
    assert holm <= bh


def test_language_profiles_python_replay(spark):
    tri = defaultdict(Counter)
    for r in load_table(spark, SF, "documents").collect():
        if r.text is None:
            continue
        for w in re.findall(r"[a-z]+", r.text.lower()):
            for i in range(len(w) - 2):
                tri[r.lang][w[i:i + 3]] += 1
    prof = {}
    for lang, c in tri.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        prof[lang] = {g for g, _ in top}
    got = {(r.lang_a, r.lang_b): r for r in
           REGISTRY["language_profile_similarity"].spark(spark, SF).collect()}
    langs = sorted(prof)
    assert len(got) == len(langs) * (len(langs) - 1) // 2
    for i, a in enumerate(langs):
        for b in langs[i + 1:]:
            inter = len(prof[a] & prof[b])
            r = got[(a, b)]
            assert r.n_shared == inter
            assert r.n_union == 40 - inter
            assert r.jaccard_ppm == inter * 1000000 // (40 - inter)


def test_bpe_compression_python_replay(spark):
    words = Counter()
    for r in load_table(spark, SF, "documents").collect():
        if r.text is not None:
            words.update(re.findall(r"[a-z]+", r.text.lower()))
    seqs = {w: list(w) for w in words}
    for _ in range(3):
        pairs = Counter()
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += words[w]
        (l, r), _c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    before = sum(c * len(w) for w, c in words.items())
    after = sum(c * len(seqs[w]) for w, c in words.items())
    row = REGISTRY["bpe_compression_ratio"].spark(spark, SF).collect()[0]
    assert row.vocab_size == len(words)
    assert row.symbols_before == before
    assert row.symbols_after == after
    assert row.compression_milli == after * 1000 // before
    assert row.symbols_after < row.symbols_before  # merges always compress


def test_bigram_coverage_python_replay(spark):
    train = set()
    test = []
    for r in load_table(spark, SF, "documents").collect():
        if r.text is None:
            continue
        a = re.findall(r"[a-z]+", r.text.lower())
        bgs = list(zip(a, a[1:]))
        if (r.doc_id // 20) % 2 == 0:
            train.update(bgs)
        else:
            test.extend(bgs)
    occ_seen = sum(1 for b in test if b in train)
    dist = set(test)
    dist_seen = sum(1 for b in dist if b in train)
    row = REGISTRY["bigram_model_coverage"].spark(spark, SF).collect()[0]
    assert row.train_bigrams == len(train)
    assert row.test_occurrences == len(test)
    assert row.occurrence_coverage_ppm == occ_seen * 1000000 // len(test)
    assert row.test_distinct == len(dist)
    assert row.distinct_coverage_ppm == dist_seen * 1000000 // len(dist)
    # frequent bigrams are learned first: occurrence coverage dominates
    assert row.occurrence_coverage_ppm >= row.distinct_coverage_ppm


def test_dedup_census_python_replay(spark):
    clusters = Counter()
    for r in load_table(spark, SF, "documents").collect():
        if r.text is not None:
            clusters[hashlib.md5(r.text.lower()[:40].encode()).hexdigest()] += 1
    sizes = Counter(clusters.values())
    n_clusters = len(clusters)
    n_docs = sum(clusters.values())
    singles = sizes.get(1, 0)
    got = {r.cluster_size: r for r in
           REGISTRY["dedup_cluster_census"].spark(spark, SF).collect()}
    assert set(got) == set(sizes)
    for sz, nc in sizes.items():
        assert got[sz].n_clusters == nc
        assert got[sz].n_docs == nc * sz
        assert got[sz].singleton_cluster_ppm == singles * 1000000 // n_clusters
        assert got[sz].duplicate_doc_ppm == (
            (n_docs - n_clusters) * 1000000 // n_docs
        )
