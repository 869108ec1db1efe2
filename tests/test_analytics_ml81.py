"""Invariant tests for round-8 wave 27 (skew-salted shuffles +
adaptively-banded order statistics) — independent Python replays at
sf0.001, plus the salting-is-transparent invariant (salted plan ==
unsalted values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _hot(k: int) -> int:
    return 0 if k % 10 < 3 else k


def test_salted_hot_key_join_python_replay(spark):
    li = [
        (_hot(r.l_partkey), int(r.l_quantity))
        for r in load_table(spark, SF, "lineitem")
        .select("l_partkey", "l_quantity")
        .collect()
    ]
    dim: dict[int, list] = {}
    for r in load_table(spark, SF, "part").select("p_partkey", "p_brand").collect():
        k = _hot(r.p_partkey)
        if k not in dim:
            dim[k] = [0, r.p_brand]
        dim[k][0] += 1
        dim[k][1] = min(dim[k][1], r.p_brand)
    agg: dict[str, list] = {}
    for k, q in li:
        cls = "hot" if k == 0 else "uniform"
        n_parts, brand = dim[k]
        a = agg.setdefault(cls, [0, 0, 0, set(), None])
        a[0] += 1
        a[1] += q
        a[2] += n_parts
        a[3].add(k)
        a[4] = brand if a[4] is None else min(a[4], brand)
    got = {
        r.key_class: r
        for r in REGISTRY["salted_hot_key_join"].spark(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for cls, (n, tq, pw, keys, mb) in agg.items():
        g = got[cls]
        assert (g.n_rows, g.total_qty, g.part_weight, g.n_keys, g.min_brand) == (
            n, tq, pw, len(keys), mb,
        )
    # the hot key must actually be hot: ~30% of fact rows on ONE key
    assert got["hot"].n_keys == 1
    assert got["hot"].n_rows * 10 >= (got["hot"].n_rows + got["uniform"].n_rows) * 2


def test_salted_skew_aggregate_matches_unsalted(spark):
    """Salting is value-transparent: the salted two-phase rollup must
    equal the direct one-phase aggregation computed by plain Spark."""
    fact = load_table(spark, SF, "lineitem").select(
        F.expr("CAST(CASE WHEN l_partkey % 10 < 3 THEN 0 ELSE l_partkey END"
               " AS BIGINT)").alias("key"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    direct = {
        r.key: r
        for r in fact.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("qty").alias("total_qty"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .collect()
    }
    got = {
        r.key_class: r
        for r in REGISTRY["salted_skew_aggregate"].spark(spark, SF).collect()
    }
    classes = {"hot": [v for k, v in direct.items() if k == 0],
               "uniform": [v for k, v in direct.items() if k != 0]}
    for cls, rows in classes.items():
        g = got[cls]
        assert g.n_keys == len(rows)
        assert g.n_rows == sum(r.n_rows for r in rows)
        assert g.max_key_rows == max(r.n_rows for r in rows)
        assert g.total_qty == sum(r.total_qty for r in rows)
        assert g.min_cents == min(r.min_cents for r in rows)
        assert g.max_cents == max(r.max_cents for r in rows)


def test_global_median_adaptive_bands_python_replay(spark):
    import math

    cents = sorted(
        int(math.floor(abs(r.o_totalprice) * 100 + 0.5))
        for r in load_table(spark, SF, "orders").select("o_totalprice").collect()
    )
    n = len(cents)
    lo = cents[(n + 1) // 2 - 1]
    hi = cents[(n + 2) // 2 - 1]
    got = REGISTRY["global_median_adaptive_bands"].spark(spark, SF).collect()[0]
    assert (got.n_rows, got.med_lo_cents, got.med_hi_cents, got.med_x2_cents) == (
        n, lo, hi, lo + hi,
    )
