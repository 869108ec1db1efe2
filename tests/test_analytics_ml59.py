"""Invariant tests for the round-5 wave 5: token lift, personalized
PageRank, compaction planning, position deletes, streaming SPRT —
independent Python replays at sf0.001.
"""

from __future__ import annotations

import re
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_token_lift_python_replay(spark):
    docs = [(r.doc_id, r.text.lower()) for r in
            load_table(spark, SF, "documents").collect()
            if r.text is not None]
    post = {(d, t) for d, txt in docs for t in re.findall(r"[a-z]+", txt)}
    df = defaultdict(int)
    for _, t in post:
        df[t] += 1
    vocab = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    vset = dict(vocab)
    nd = len(docs)
    bydoc = defaultdict(set)
    for d, t in post:
        if t in vset:
            bydoc[d].add(t)
    nab = defaultdict(int)
    for toks in bydoc.values():
        ss = sorted(toks)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                nab[(ss[i], ss[j])] += 1
    exp = sorted(
        ((tdiv(1000 * c * nd, vset[a] * vset[b]), a, b, c)
         for (a, b), c in nab.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = REGISTRY["token_cooccurrence_lift"].spark(spark, SF).collect()
    assert len(got) == min(20, len(exp))
    for r, (lift, a, b, c) in zip(got, exp):
        assert (r.tok_a, r.tok_b, r.n_ab, r.lift_milli) == (a, b, c, lift)
        assert (r.n_a, r.n_b) == (vset[a], vset[b])


def test_personalized_pagerank_python_replay(spark):
    orders = load_table(spark, SF, "orders").collect()
    lines = load_table(spark, SF, "lineitem").collect()
    cust = {o.o_orderkey: o.o_custkey for o in orders}
    e0 = {("c%d" % cust[l.l_orderkey], "s%d" % l.l_suppkey) for l in lines}
    edges = e0 | {(b, a) for a, b in e0}
    nodes = sorted({a for a, _ in edges})
    seed = min(nodes)
    deg = defaultdict(int)
    adj = defaultdict(list)
    for a, b in edges:
        deg[a] += 1
        adj[a].append(b)
    pr = {v: (10**12 if v == seed else 0) for v in nodes}
    for _ in range(3):
        s2 = defaultdict(int)
        for u in nodes:
            c = tdiv(pr[u], deg[u])
            for v in adj[u]:
                s2[v] += c
        pr = {v: (15 * 10**12 // 100 if v == seed else 0)
              + 85 * s2.get(v, 0) // 100 for v in nodes}
    exp = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = REGISTRY["personalized_pagerank_restart"].spark(spark, SF).collect()
    assert [(r.node, r.pr) for r in got] == exp
    # restart concentrates mass at/near the seed
    assert got[0].node == seed
    # and the seed's 1-hop neighbors outrank distant nodes on average
    one_hop = set(adj[seed])
    in_top = sum(1 for r in got[1:] if r.node in one_hop)
    assert in_top > 0


def test_compaction_plan_python_replay(spark):
    lines = load_table(spark, SF, "lineitem").collect()
    sizes = defaultdict(int)
    for l in lines:
        sizes[l.l_suppkey % 64] += 1
    total = sum(sizes.values())
    cap = 2 * (total // 64)
    ordered = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))
    fill = 0
    bins = defaultdict(lambda: [0, 0])
    for fid, sz in ordered:
        bins[fill // cap][0] += 1
        bins[fill // cap][1] += sz
        fill += sz
    lb = (total + cap - 1) // cap
    got = {r.bin_id: r for r in
           REGISTRY["small_file_compaction_plan"].spark(spark, SF).collect()}
    assert set(got) == set(bins)
    for b, (nf, rows) in bins.items():
        r = got[b]
        assert (r.n_files, r.rows_total) == (nf, rows)
        assert r.fill_ppm == tdiv(1000000 * rows, cap)
        assert r.bins_lower_bound == lb
    # sorted-fill packing is within one bin of the lower bound
    assert len(bins) <= lb + 1
    # conservation: every file landed exactly once
    assert sum(v[1] for v in bins.values()) == total


def test_position_delete_python_replay(spark):
    orders = sorted(load_table(spark, SF, "orders").collect(),
                    key=lambda o: o.o_orderkey)
    stats = defaultdict(lambda: [0, 0, 0])  # pri -> [before, after, cents]
    for pos, o in enumerate(orders, start=1):
        s = stats[o.o_orderpriority]
        s[0] += 1
        if (pos * 2654435761) % 100 >= 7:
            s[1] += 1
            s[2] += round(o.o_totalprice * 100)
    got = {r.o_orderpriority: r for r in
           REGISTRY["position_delete_read"].spark(spark, SF).collect()}
    assert set(got) == set(stats)
    deleted_total = 0
    for pri, (before, after, cents) in stats.items():
        r = got[pri]
        assert (r.rows_before, r.rows_after) == (before, after)
        assert r.rows_deleted == before - after
        assert r.sum_cents_after == cents
        deleted_total += before - after
    assert deleted_total > 0  # the delete vector actually deleted rows


def test_streaming_sprt_matches_batch_semantics(spark):
    # the seeded log: partitions 0..3, offsets 0..149, batch b = o // 50
    per = defaultdict(lambda: [0, 0])
    for p in range(4):
        for o in range(150):
            inc = 182 if ((p * 31 + o * 17) % 1000) % 2 == 1 else -223
            b = o // 50
            per[b][0] += 1
            per[b][1] += inc
    got = REGISTRY["streaming_sprt_monitor"].spark(spark, SF).collect()
    assert len(got) == 3
    cum, crossed = 0, False
    for r in got:
        n, llr = per[r.batch_id]
        cum += llr
        assert (r.n_obs, r.batch_llr_milli, r.cum_llr_milli) == (n, llr, cum)
        if not crossed and abs(cum) >= 2944:
            assert r.decision in ("accept_h0", "accept_h1")
            crossed = True
        else:
            assert r.decision is None
