"""Invariant tests for the unseen-estimation wave
(good_turing_missing_mass, chao1_vocabulary_estimate) — independent
Python references from the frequency spectrum.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _spectra(spark):
    per_source = defaultdict(Counter)
    for r in (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("source", "text")
        .collect()
    ):
        per_source[r.source].update(re.findall("[a-z]+", r.text.lower()))
    return per_source


def test_good_turing_matches_python_reference(spark):
    per_source = _spectra(spark)
    got = {r.source: r for r in
           REGISTRY["good_turing_missing_mass"].spark(spark, SF).collect()}
    assert set(got) == set(per_source)
    for src, freq in per_source.items():
        spec = Counter(freq.values())
        n = sum(freq.values())
        v1, v2, v3 = spec.get(1, 0), spec.get(2, 0), spec.get(3, 0)
        r = got[src]
        assert (r.n_tokens, r.v_types) == (n, len(freq))
        assert (r.v1, r.v2, r.v3) == (v1, v2, v3)
        assert r.missing_mass_ppm == v1 * 1_000_000 // n
        assert r.r_star_1_milli == (0 if v1 == 0 else 2 * v2 * 1000 // v1)
        assert r.r_star_2_milli == (0 if v2 == 0 else 3 * v3 * 1000 // v2)
        # Good-Turing discount: the adjusted count for singletons is
        # below 1 on any Zipf-ish spectrum (V2 < V1)
        if v2 < v1:
            assert r.r_star_1_milli < 1000


def test_chao1_matches_python_reference(spark):
    per_source = _spectra(spark)
    v_global = len(set().union(*per_source.values()))
    got = {r.source: r for r in
           REGISTRY["chao1_vocabulary_estimate"].spark(spark, SF).collect()}
    assert set(got) == set(per_source)
    for src, freq in per_source.items():
        spec = Counter(freq.values())
        v_obs = len(freq)
        v1, v2 = spec.get(1, 0), spec.get(2, 0)
        chao1 = v_obs + (
            v1 * v1 // (2 * v2) if v2 > 0 else v1 * (v1 - 1) // 2
        )
        r = got[src]
        assert (r.v_obs, r.v1, r.v2) == (v_obs, v1, v2)
        assert r.chao1_estimate == chao1, src
        assert r.v_global == v_global
        assert r.est_vs_global_ppm == chao1 * 1_000_000 // v_global
        assert r.obs_vs_global_ppm == v_obs * 1_000_000 // v_global
        # Chao1 never estimates below what was observed
        assert r.chao1_estimate >= r.v_obs
        # and moves the estimate TOWARD the shared global vocabulary
        assert r.est_vs_global_ppm >= r.obs_vs_global_ppm
