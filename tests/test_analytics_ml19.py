"""Invariant tests for the vault/agreement/rank-correlation wave
(data_vault_model_build, cohens_kappa_agreement, spearman_rho_by_year)
— independent Python references.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero division (Spark div / DuckDB // semantics)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_data_vault_matches_python_reference(spark):
    orders = load_table(spark, SF, "orders").selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        "date_format(CAST(o_orderdate AS DATE), 'yyyy-MM-dd') AS d",
        "o_orderpriority",
    ).collect()
    custkeys = [
        r.c_custkey
        for r in load_table(spark, SF, "customer").select("c_custkey").collect()
    ]
    ref = {}

    def stats(payloads, hks):
        cks = sum(int(p[:8], 16) for p in payloads)
        return (len(payloads), len(set(hks)), len(set(payloads)), cks)

    hub_c = [_md5(str(k)) for k in custkeys]
    ref["hub_customer"] = stats(hub_c, hub_c)
    hub_o = [_md5(str(r.o_orderkey)) for r in orders]
    ref["hub_order"] = stats(hub_o, hub_o)
    link = [_md5(f"{r.o_custkey}|{r.o_orderkey}") for r in orders]
    ref["link_customer_order"] = stats(link, link)
    sat_hk = [_md5(str(r.o_orderkey)) for r in orders]
    sat_pl = [
        _md5(f"{r.o_orderstatus}|{r.cents}|{r.d}|{r.o_orderpriority}")
        for r in orders
    ]
    ref["sat_order"] = stats(sat_pl, sat_hk)
    # fix n_keys for sat (distinct hub keys, payload counts from hashdiff)
    ref["sat_order"] = (
        len(sat_pl),
        len(set(sat_hk)),
        len(set(sat_pl)),
        sum(int(p[:8], 16) for p in sat_pl),
    )

    got = REGISTRY["data_vault_model_build"].spark(spark, SF).collect()
    assert {r.structure for r in got} == set(ref)
    for r in got:
        assert (r.n_rows, r.n_keys, r.n_payloads, r.checksum) == ref[
            r.structure
        ], r.structure
    by = {r.structure: r for r in got}
    # vault contracts: hubs/links are key-unique after the distinct-free
    # raw load only if the source is; sat hashdiff count <= rows
    assert by["hub_customer"].n_keys == by["hub_customer"].n_rows
    assert by["sat_order"].n_payloads <= by["sat_order"].n_rows


def test_cohens_kappa_matches_python_reference(spark):
    docs = (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("source", "n_chars", "text")
        .collect()
    )
    cells = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, n11, n00, a1, b1
    for r in docs:
        r1 = 1 if r.n_chars >= 500 else 0
        r2 = 1 if len(re.findall("[a-z]+", r.text.lower())) >= 90 else 0
        c = cells[r.source]
        c[0] += 1
        c[1] += r1 and r2
        c[2] += (1 - r1) and (1 - r2)
        c[3] += r1
        c[4] += r2
    got = {r.source: r for r in
           REGISTRY["cohens_kappa_agreement"].spark(spark, SF).collect()}
    assert set(got) == set(cells)
    for src, (n, n11, n00, a1, b1) in cells.items():
        po = (n11 + n00) * 1_000_000 // n
        pe = (a1 * b1 + (n - a1) * (n - b1)) * 1_000_000 // (n * n)
        kappa = (
            1_000_000
            if pe == 1_000_000
            else _tdiv((po - pe) * 1_000_000, 1_000_000 - pe)
        )
        r = got[src]
        assert (r.n, r.n11, r.n00, r.a1, r.b1) == (n, n11, n00, a1, b1)
        assert r.p_o_ppm == po and r.p_e_ppm == pe
        assert r.kappa_ppm == kappa, src
        assert r.kappa_ppm <= 1_000_000


def test_spearman_matches_python_reference(spark):
    rows = (
        load_table(spark, SF, "orders")
        .selectExpr(
            "CAST(year(o_orderdate) AS BIGINT) AS yr",
            "CAST(o_orderdate AS DATE) AS day",
            "round(o_totalprice * 100) AS cents",
        )
        .collect()
    )
    daily = defaultdict(lambda: [0, 0])
    for r in rows:
        d = daily[(r.yr, r.day)]
        d[0] += 1
        d[1] += int(r.cents)
    by_year = defaultdict(list)
    for (yr, _day), (x, y) in daily.items():
        by_year[yr].append((x, y))
    got = {r.yr: r for r in
           REGISTRY["spearman_rho_by_year"].spark(spark, SF).collect()}
    assert set(got) == set(by_year)
    for yr, pts in by_year.items():
        def doubled_ranks(vals):
            # 2*rank + ties - 1 == twice the average rank of a tied block
            s = sorted(vals)
            first = {}
            cnt = defaultdict(int)
            for i, v in enumerate(s):
                cnt[v] += 1
                if v not in first:
                    first[v] = i + 1
            return [2 * first[v] + cnt[v] - 1 for v in vals]

        rx = doubled_ranks([p[0] for p in pts])
        ry = doubled_ranks([p[1] for p in pts])
        n = len(pts)
        sx, sy = sum(rx), sum(ry)
        sxx = sum(v * v for v in rx)
        syy = sum(v * v for v in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        cov = n * sxy - sx * sy
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        r = got[yr]
        assert r.n_days == n
        assert r.cov_num == cov
        assert r.rho_sign == (cov > 0) - (cov < 0)
        want = 0 if vx * vy == 0 else cov * cov * 1_000_000 // (vx * vy)
        assert r.rho_sq_ppm == want, yr
        assert 0 <= r.rho_sq_ppm <= 1_000_000
