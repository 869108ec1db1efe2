"""Invariant tests for the privacy/forecast-eval/multiple-testing wave
(randomized_response_estimate, pinball_loss_quantile_eval,
fdr_bh_screen) — independent Python references.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_randomized_response_matches_python_reference(spark):
    ev = load_table(spark, SF, "events").select("user_id", "event_type")
    counts = defaultdict(int)
    users, types = set(), set()
    for r in ev.collect():
        counts[(r.user_id, r.event_type)] += 1
        users.add(r.user_id)
        types.add(r.event_type)
    ref = {}
    for t in types:
        n = len(users)
        yes = true_yes = 0
        for u in users:
            b = 1 if counts.get((u, t), 0) >= 2 else 0
            coin = int(
                hashlib.md5(f"{u}:{t}:rr".encode()).hexdigest()[:8], 16
            ) % 4
            y = b if coin < 3 else 1 - b
            yes += y
            true_yes += b
        pi_hat = 2 * yes * 1_000_000 // n - 500_000
        pi_true = true_yes * 1_000_000 // n
        ref[t] = (n, yes, true_yes, pi_hat, pi_true, abs(pi_hat - pi_true))
    got = {r.event_type: r for r in
           REGISTRY["randomized_response_estimate"].spark(spark, SF).collect()}
    assert set(got) == types
    for t, (n, yes, ty, ph, pt, err) in ref.items():
        r = got[t]
        assert (r.n_users, r.reported_yes, r.true_yes) == (n, yes, ty)
        assert r.pi_hat_ppm == ph and r.pi_true_ppm == pt
        assert r.abs_err_ppm == err
        assert r.epsilon_milli == 1099


def _nation_daily_counts(spark):
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF, "customer").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, SF, "nation").collect()
    }
    daily = defaultdict(int)
    for r in (
        load_table(spark, SF, "orders")
        .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS day",
                    "CAST(year(o_orderdate) AS BIGINT) AS yr")
        .collect()
    ):
        daily[(nat[cust[r.o_custkey]], r.day, r.yr)] += 1
    return daily


def _quantile(vals, num, den):
    """Smallest v with cum_count*den >= n*num over the sorted distincts."""
    s = sorted(vals)
    n = len(s)
    seen = 0
    dist = sorted(set(s))
    cum = {}
    for v in dist:
        seen += sum(1 for x in s if x == v)
        cum[v] = seen
    for v in dist:
        if cum[v] * den >= n * num:
            return v
    return dist[-1]


def test_pinball_loss_matches_python_reference(spark):
    daily = _nation_daily_counts(spark)
    train, ev = defaultdict(list), defaultdict(list)
    for (n_name, _day, yr), d in daily.items():
        (train if yr <= 1996 else ev)[n_name].append(d)
    got = {r.n_name: r for r in
           REGISTRY["pinball_loss_quantile_eval"].spark(spark, SF).collect()}
    assert set(got) == {n for n in train if ev.get(n)}
    for n_name, tr in train.items():
        if not ev.get(n_name):
            continue
        q90 = _quantile(tr, 9, 10)
        q50 = _quantile(tr, 1, 2)

        def pinball(q):
            return sum(
                9 * (y - q) if y >= q else q - y for y in ev[n_name]
            )

        r = got[n_name]
        assert (r.n_train, r.q50, r.q90) == (len(tr), q50, q90), n_name
        assert r.n_eval == len(ev[n_name])
        assert r.loss90_x10 == pinball(q90)
        assert r.loss50_x10 == pinball(q50)
        assert r.mean_loss90_milli_x10 == pinball(q90) * 1000 // len(
            ev[n_name]
        )


_LADDER = [9549, 8283, 7550, 7033, 6634, 6310, 6038, 5802, 5596, 5411,
           5245, 5094, 4956, 4828, 4709, 4598, 4494, 4397, 4305, 4217,
           4135, 4056, 3981, 3909, 3841]


def test_fdr_bh_matches_python_reference(spark):
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF, "customer").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, SF, "nation").collect()
    }
    n1 = defaultdict(int)
    y1 = defaultdict(int)
    for r in (
        load_table(spark, SF, "orders")
        .select("o_custkey", "o_orderpriority")
        .collect()
    ):
        name = nat[cust[r.o_custkey]]
        n1[name] += 1
        y1[name] += r.o_orderpriority in ("1-URGENT", "2-HIGH")
    nn, yy = sum(n1.values()), sum(y1.values())
    stats = []
    for name in n1:
        diff = y1[name] * (nn - n1[name]) - (yy - y1[name]) * n1[name]
        den = n1[name] * (nn - n1[name]) * yy * (nn - yy)
        z2 = diff * diff * nn * 1000 // den  # exact python bigint floor
        stats.append((name, z2))
    stats.sort(key=lambda s: (-s[1], s[0]))
    k = 0
    for i, (_, z2) in enumerate(stats, 1):
        if z2 >= _LADDER[i - 1]:
            k = i
    got = REGISTRY["fdr_bh_screen"].spark(spark, SF).collect()
    assert [r.n_name for r in got] == [s[0] for s in stats]
    for i, r in enumerate(got, 1):
        name, z2 = stats[i - 1]
        assert r.rank == i and r.z2_milli == z2, name
        assert r.bh_critical_milli == _LADDER[i - 1]
        assert r.rejected == int(i <= k)
        assert (r.n1, r.y1) == (n1[name], y1[name])
    # step-up contract: the rejection set is a prefix of the rank order
    rej = [r.rank for r in got if r.rejected]
    assert rej == list(range(1, len(rej) + 1))
