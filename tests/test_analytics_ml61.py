"""Invariant tests for the round-5 wave 7: Haar wavelets, matrix profile,
MATCH_RECOGNIZE-style V patterns, histogram join estimation — independent
Python replays at sf0.001.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _daily(spark, etype="purchase"):
    rows = load_table(spark, SF, "events").collect()
    by_day = defaultdict(int)
    for r in rows:
        if r.event_type == etype:
            by_day[r.ts.date()] += round(r.value * 100)
    return [x for _, x in sorted(by_day.items())]


def test_haar_python_replay(spark):
    xs = _daily(spark)
    a = xs + [xs[-1]] * (32 - len(xs))
    sx2 = sum(v * v for v in a)
    energies = []
    cur = a
    for _ in range(5):
        nxt = [cur[2 * i] + cur[2 * i + 1] for i in range(len(cur) // 2)]
        energies.append(sum((cur[2 * i] - cur[2 * i + 1]) ** 2
                            for i in range(len(cur) // 2)))
        cur = nxt
    approx = cur[0]
    we = sum((1 << (5 - (l + 1))) * e for l, e in enumerate(energies))
    got = REGISTRY["haar_wavelet_energy"].spark(spark, SF).collect()
    assert len(got) == 5
    for r, (l, e) in zip(got, enumerate(energies, start=1)):
        assert (r.level, r.detail_energy) == (l, e)
        assert r.n_coeffs == 32 >> l
        assert r.energy_share_ppm == tdiv(1000000 * (1 << (5 - l)) * e, we)
        # Parseval: the identity must hold EXACTLY
        assert r.parseval_exact is True
    assert we + approx * approx == 32 * sx2


def test_matrix_profile_python_replay(spark):
    xs = _daily(spark)
    n = len(xs)
    wins = {t: xs[t - 1:t + 6] for t in range(1, n - 5)}
    prof = {}
    for t, wt in wins.items():
        best = None
        for u, wu in wins.items():
            if abs(t - u) < 7:
                continue
            d2 = sum((p - q) ** 2 for p, q in zip(wt, wu))
            if best is None or (d2, u) < best:
                best = (d2, u)
        prof[t] = best
    motif = min(prof, key=lambda t: (prof[t][0], t))
    discord = max(prof, key=lambda t: (prof[t][0], -t))
    got = {r.window_start_pos: r for r in
           REGISTRY["matrix_profile_motif"].spark(spark, SF).collect()}
    assert set(got) == set(prof)
    for t, (d2, u) in prof.items():
        r = got[t]
        assert (r.profile_d2, r.nn_pos) == (d2, u)
        assert r.is_motif == (t == motif)
        assert r.is_discord == (t == discord)
    # the nearest-neighbor relation respects the exclusion zone
    assert all(abs(t - r.nn_pos) >= 7 for t, r in got.items())


def test_vshape_python_replay(spark):
    xs = _daily(spark)
    days = None  # day labels not needed for the numeric replay
    sg = []
    for i in range(1, len(xs)):
        dx = xs[i] - xs[i - 1]
        sg.append(1 if dx > 0 else (-1 if dx < 0 else 0))
    # runs over the sign sequence
    runs = []
    for i, s in enumerate(sg):
        if runs and runs[-1][0] == s:
            runs[-1][1] += 1
            runs[-1][3] = i
        else:
            runs.append([s, 1, i, i])
    vs = []
    for a, b in zip(runs, runs[1:]):
        if a[0] == -1 and b[0] == 1:
            # x index of run end: sign i corresponds to day i+1 in xs
            vs.append((a[1], b[1], xs[b[3] + 1] - xs[a[3] + 1],
                       a[1] >= 2 and b[1] >= 2))
    got = REGISTRY["vshape_pattern_detect"].spark(spark, SF).collect()
    assert len(got) == len(vs)
    for r, (dl, ul, rec, strict) in zip(got, vs):
        assert (r.down_len, r.up_len) == (dl, ul)
        assert r.recovery_cents == rec
        assert r.is_strict_v == strict
        # a recovery after a bottom is strictly positive
        assert r.recovery_cents > 0
    assert len(vs) > 0  # the pattern detector is not vacuous


def test_join_size_histogram_python_replay(spark):
    lines = load_table(spark, SF, "lineitem").collect()
    cnt = defaultdict(int)
    for l in lines:
        cnt[l.l_suppkey] += 1
    lo, hi = min(cnt), max(cnt)
    per = defaultdict(lambda: [0, 0, 0])
    for k, c in cnt.items():
        b = min(16 * (k - lo) // (hi - lo + 1), 15)
        per[b][0] += 1
        per[b][1] += c
        per[b][2] += c * c
    got = {r.bucket: r for r in
           REGISTRY["join_size_histogram_estimate"].spark(spark, SF).collect()}
    assert set(got) == set(per)
    for b, (nk, nr, exact) in per.items():
        r = got[b]
        est = tdiv(nr * nr, nk)
        assert (r.n_keys, r.n_rows) == (nk, nr)
        assert (r.est_join_rows, r.exact_join_rows) == (est, exact)
        assert r.underest_ppm == tdiv(1000000 * (exact - est), exact)
        # Jensen: the uniform-assumption estimate never overshoots
        assert est <= exact
