"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting (on in session.py) handles most skew at runtime;
salting is the explicit fallback for pathological keys (one key >> a whole
executor's memory) and for aggregations, where AQE doesn't re-split.

Semantics are identical to the unsalted ops — proven by unit test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join where the big side's hot keys are split across `salt`
    shuffle partitions and the small side is replicated `salt` times.

    big rows get __salt = hash(salt_source) % salt (default: a hash of the
    whole row — deterministic for a deterministic input, which matters for
    task retries; pass an explicit stable column when one exists).
    small explodes one copy per salt value, so every (key, salt) pair
    finds its match. Shuffle volume: |big| unchanged, |small| × salt —
    the right trade whenever |small| << |big|, which is the only situation
    that calls for salting."""
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in big.columns])
    big_s = big.withColumn("__salt", F.pmod(salt_source, F.lit(salt)).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_s.join(small_s, [*on, "__salt"], how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt: int = 8,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys, for aggregates that
    re-aggregate losslessly (sum/count/min/max): phase 1 groups on
    (keys, salt) spreading a hot key over `salt` reducers, phase 2 merges
    partials on the true keys — each phase's groups fit an executor.

    `aggs` maps output column name → phase-1 aggregate expression; phase 2
    applies the merge: count → sum, sum → sum, min → min, max → max. Pass
    the merge explicitly via tuples when it differs from the partial."""
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in df.columns])
    salted = df.withColumn("__salt", F.pmod(salt_source, F.lit(salt)).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )
    merged = {}
    for name, expr in aggs.items():
        fn = expr._jc.toString().split("(")[0].lower()  # noqa: SLF001
        partial = F.col(f"__p_{name}")
        if fn.startswith("count") or fn.startswith("sum"):
            merged[name] = F.sum(partial)
        elif fn.startswith("min"):
            merged[name] = F.min(partial)
        elif fn.startswith("max"):
            merged[name] = F.max(partial)
        else:
            raise ValueError(f"non-decomposable aggregate for salting: {fn}")
    return phase1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merged.items()]
    )
