"""Invariant tests for the round-4 wave 3: critical path over the BOM
DAG, zone-map pruning audit, MERGE INTO emulation, vocabulary coverage.
"""

from __future__ import annotations

import datetime
import hashlib
import re
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_critical_path_python_replay(spark):
    parts = {r.p_partkey for r in load_table(spark, SF, "part").collect()}
    bom = defaultdict(list)
    children = set()
    for p in parts:
        for child in (p * 5 + 1, p * 5 + 2):
            if child in parts:
                bom[p].append(child)
                children.add(child)
    roots = {p for p in bom if p not in children}

    def walk(node, days, depth):
        if node not in bom or depth >= 6:
            # terminal either by leaf or by depth bound: the oracle's
            # leaf filter only keeps TRUE leaves, so mirror that
            return [(node, days, depth)] if node not in bom else []
        out = []
        for ch in bom[node]:
            out.extend(walk(ch, days + ch % 7 + 1, depth + 1))
        return out

    crit = {}
    n_paths = 0
    max_depth = 0
    for r in roots:
        leaves = walk(r, r % 7 + 1, 0)
        assert leaves, r
        crit[r] = max(d for _, d, _ in leaves)
        n_paths += len(leaves)
        max_depth = max(max_depth, max(dep for _, _, dep in leaves))
    row = REGISTRY["critical_path_longest"].spark(spark, SF).collect()[0]
    assert row.n_projects == len(roots)
    assert row.longest_critical_days == max(crit.values())
    assert row.sum_critical_days == sum(crit.values())
    assert row.max_depth == max_depth
    assert row.n_terminal_paths == n_paths


def test_zonemap_python_replay(spark):
    li = load_table(spark, SF, "lineitem").collect()
    keys = [r.l_orderkey for r in li]
    lo, hi = min(keys), max(keys)
    files = defaultdict(list)
    for r in li:
        files[(r.l_orderkey - lo) * 32 // (hi - lo + 1)].append(r.l_shipdate)
    p_lo = datetime.datetime(1996, 1, 1)
    p_hi = datetime.datetime(1996, 7, 1)
    n_pruned = scanned = matching = 0
    for dates in files.values():
        zmin, zmax = min(dates), max(dates)
        m = sum(1 for d in dates if p_lo <= d < p_hi)
        matching += m
        if zmax < p_lo or zmin >= p_hi:
            n_pruned += 1
            assert m == 0  # pruning must be SOUND
        else:
            scanned += len(dates)
    row = REGISTRY["zonemap_pruning_audit"].spark(spark, SF).collect()[0]
    assert row.n_files == len(files)
    assert row.n_pruned == n_pruned
    assert row.total_rows == len(li)
    assert row.rows_scanned == scanned
    assert row.rows_matching == matching
    # soundness is the invariant; read amplification >= selectivity
    assert row.scan_fraction_ppm >= row.selectivity_ppm


def test_merge_into_python_replay(spark):
    orders = load_table(spark, SF, "orders").collect()
    cutoff = datetime.datetime(1998, 1, 1)
    target = {}
    for r in orders:
        if r.o_orderdate < cutoff:
            target[r.o_orderkey] = round(r.o_totalprice * 100)
    source = {}
    for r in orders:
        h = int(hashlib.md5(f"{r.o_orderkey}:merge".encode()).hexdigest()[:6], 16)
        if r.o_orderdate >= cutoff or h % 4 == 0:
            source[r.o_orderkey] = (
                "D" if h % 10 == 0 else "U",
                round(r.o_totalprice * 100) + 500,
            )
    actions = defaultdict(lambda: [0, 0, 0])
    for k in set(target) | set(source):
        in_t, in_s = k in target, k in source
        if in_s and source[k][0] == "D":
            continue
        if in_t and in_s:
            act, price = "updated", source[k][1]
        elif in_s:
            act, price = "inserted", source[k][1]
        else:
            act, price = "unchanged", target[k]
        a = actions[act]
        a[0] += 1
        a[1] += price
        a[2] += k
    got = {r.action: r for r in
           REGISTRY["merge_into_emulation"].spark(spark, SF).collect()}
    assert set(got) == set(actions)
    for act, (n, sp, ck) in actions.items():
        assert got[act].n_rows == n, act
        assert got[act].sum_price_cents == sp
        assert got[act].key_checksum == ck


def test_vocab_coverage_python_replay(spark):
    toks = []
    for r in load_table(spark, SF, "documents").collect():
        if r.text is not None:
            toks.extend(re.findall(r"[a-z]+", r.text.lower()))
    counts = Counter(toks)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = len(toks)
    got = {r.vocab_size: r for r in
           REGISTRY["vocab_coverage_curve"].spark(spark, SF).collect()}
    prev = 0
    for v in (100, 1000, 10000):
        cov = sum(c for _, c in ranked[:v])
        assert got[v].full_vocab == len(counts)
        assert got[v].covered_occurrences == cov
        assert got[v].total_occurrences == total
        assert got[v].coverage_ppm == cov * 1000000 // total
        assert got[v].coverage_ppm >= prev  # monotone in V
        prev = got[v].coverage_ppm
