"""Scalar expression recipes (SURVEY.md §2.8, F1-F11).

Everything here returns a Column built from pyspark.sql.functions — JVM-side,
whole-stage-codegen'd. No Python UDFs: the reference itself defines zero UDFs
(SURVEY.md §2.10) and we keep that posture.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Sentinel dbt_utils 0.8.0 uses when hashing a NULL component; byte-parity
# with the reference's surrogate keys requires the same recipe
# (reference: fact_trip.sql:6, dim_*.sql:13 via dbt_utils.surrogate_key).
_DBT_NULL_SENTINEL = "_dbt_utils_surrogate_key_null_"


def surrogate_key(*cols: str | Column) -> Column:
    """F9: md5 of '-'-joined, null-coalesced stringified columns —
    dbt_utils 0.8.0 `surrogate_key` parity."""
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit(_DBT_NULL_SENTINEL),
        )
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def year_of(ts: str | Column) -> Column:
    """F1."""
    return F.year(ts)


def month_name(ts: str | Column) -> Column:
    """F2: full month name ('January'). Locale-stable: built from the month
    number via a CASE table, not date_format('MMMM'), so results don't depend
    on JVM default locale (SURVEY.md §7.4 risk 7)."""
    return _name_lookup(F.month(ts), _MONTHS)


def day_name(ts: str | Column) -> Column:
    """F3: full day-of-week name ('Monday'), locale-stable.
    dayofweek() is 1=Sunday..7=Saturday in Spark."""
    return _name_lookup(F.dayofweek(ts), _DAYS_SUNDAY_FIRST)


_MONTHS = (
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
)
_DAYS_SUNDAY_FIRST = (
    "Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday",
)


def _name_lookup(index_col: Column, names: tuple[str, ...]) -> Column:
    expr = F.lit(None).cast("string")
    for i, name in enumerate(names, start=1):
        expr = F.when(index_col == i, F.lit(name)).otherwise(expr)
    return expr


def epoch_micros_to_ts(col: str | Column) -> Column:
    """F8: CDC wire format → timestamp (reference divides by 1e6 and casts,
    streaming_to_datalake.py:134-136; timestamp_micros is the exact builtin)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(c.cast("long"))


def decode(col: str | Column, mapping: dict, default: str | None = "Unknown") -> Column:
    """F10: small-domain decode as a CASE chain. The reference's dbt decode
    macros are absent from its snapshot (nyc_taxi/macros/ empty); values
    reconstructed from the public TLC data dictionary (SURVEY.md F10)."""
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for k, v in mapping.items():
        cond = c == k
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    assert expr is not None
    return expr.otherwise(F.lit(default))


# Public TLC data-dictionary decode tables (engine-owned, SURVEY.md F10).
PAYMENT_DESCRIPTIONS = {
    1: "Credit card",
    2: "Cash",
    3: "No charge",
    4: "Dispute",
    5: "Unknown",
    6: "Voided trip",
}
RATE_CODE_DESCRIPTIONS = {
    1: "Standard rate",
    2: "JFK",
    3: "Newark",
    4: "Nassau or Westchester",
    5: "Negotiated fare",
    6: "Group ride",
}
VENDOR_DESCRIPTIONS = {
    1: "Creative Mobile Technologies",
    2: "VeriFone",
}
SERVICE_DESCRIPTIONS = {
    1: "Yellow",
    2: "Green",
}


def z_interleave_sql(
    xcol: str, ycol: str, bits: int = 8, cast_bigint: bool = False
) -> str:
    """Morton (Z-order) bit-interleave as shared SQL expression TEXT:
    z = Σ_i ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1), written as a sum of
    shift/mask terms so Spark, DuckDB, and any ANSI engine evaluate
    identical integer arithmetic. One definition feeds BOTH the
    zorder_layout_audit catalog entry (and its oracle) and the
    write_zorder_zone layout writer — the audit measures exactly the
    curve the writer lays down. `cast_bigint` wraps the inputs for
    callers whose columns aren't already BIGINT.

    Inputs are masked to the declared bit width BEFORE the per-bit
    shifts: arithmetic >> on a negative BIGINT keeps the sign bit, so an
    unmasked negative would read 1 at every position and collapse all
    negative rows onto the max Morton key (one hot partition, useless
    footer stats). With the mask, a signed id interleaves its low `bits`
    bits like any other value — degraded locality, never degenerate."""
    mask = (1 << bits) - 1
    if cast_bigint:
        wrap = lambda c: f"(CAST({c} AS BIGINT) & {mask})"  # noqa: E731
    else:
        wrap = lambda c: f"({c} & {mask})"  # noqa: E731
    terms = []
    for i in range(bits):
        terms.append(f"((({wrap(xcol)} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({wrap(ycol)} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return " + ".join(terms)
