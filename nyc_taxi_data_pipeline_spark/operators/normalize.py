"""Schema normalization (SURVEY.md §2.2, P1-P6).

The reference normalizes trip-record schema drift in pandas
(scripts/transform_data.py:76-118) and again in Spark
(batch_processing_optimized.py:105-133). Here it is one declarative,
variant-driven transform: a rename table detects yellow (tpep_*), green
(lpep_*) and legacy prefixes, then lowercase → drop → cast → dropna →
reorder compose lazily into a single Catalyst plan (column pruning means
dropped columns never leave the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# P1 variant-detection table (reference: batch_processing_optimized.py:105-125,
# transform_data.py:76-100). Applied case-insensitively after P2 lowercasing.
RENAME_VARIANTS: dict[str, str] = {
    "tpep_pickup_datetime": "pickup_datetime",
    "tpep_dropoff_datetime": "dropoff_datetime",
    "lpep_pickup_datetime": "pickup_datetime",
    "lpep_dropoff_datetime": "dropoff_datetime",
    "ehail_fee": "fee",
    "airport_fee": "fee",
    "vendorid": "vendor_id",
    "ratecodeid": "rate_code_id",
    "pulocationid": "pickup_location_id",
    "dolocationid": "dropoff_location_id",
    "payment_type": "payment_type_id",
}

# P3 drop list (reference: transform_data.py:26-36, 88-89, 112-114).
DEFAULT_DROP: tuple[str, ...] = ("store_and_fwd_flag", "trip_type", "fee")

# P4 integer-cast targets (reference: transform_data.py:103-110).
INT_CAST_COLS: tuple[str, ...] = (
    "vendor_id",
    "rate_code_id",
    "pickup_location_id",
    "dropoff_location_id",
    "payment_type_id",
)


def lowercase_columns(df: DataFrame) -> DataFrame:
    """P2 (reference: transform_data.py:162; batch_processing_optimized.py:133)."""
    return df.toDF(*[c.lower() for c in df.columns])


def rename_variants(df: DataFrame, table: dict[str, str] | None = None) -> DataFrame:
    """P1: schema-variant rename driven by the detection table. Uses a single
    select-with-alias (one projection node) instead of chained
    withColumnRenamed calls."""
    table = table if table is not None else RENAME_VARIANTS
    return df.select(
        *[F.col(c).alias(table.get(c.lower(), c)) for c in df.columns]
    )


def drop_columns(df: DataFrame, cols: tuple[str, ...] = DEFAULT_DROP) -> DataFrame:
    """P3: drop operational/unused columns (no-op for absent names, matching
    pandas errors='ignore' usage)."""
    present = [c for c in cols if c in df.columns]
    return df.drop(*present) if present else df


def cast_ints(
    df: DataFrame,
    cols: tuple[str, ...] = INT_CAST_COLS,
    coerce_null_to_zero: bool = False,
) -> DataFrame:
    """P4: integer casts. Two reference contracts exist (SURVEY.md §7.4 risk 2):
    `astype(int)` (strict; transform_data.py:103-110) vs
    `to_numeric(errors='coerce').fillna(0)` (elt_pipeline_optimized_dag.py:116-118).
    The flag selects the coercing contract."""
    out = df
    for c in cols:
        if c not in df.columns:
            continue
        casted = F.col(c).cast("int")
        if coerce_null_to_zero:
            casted = F.coalesce(casted, F.lit(0))
        out = out.withColumn(c, casted)
    return out


def drop_nulls(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """P5: pandas-dropna() contract — drop a row if ANY column is null
    (reference: transform_data.py:60,117)."""
    return df.na.drop("any", subset=subset)


def reorder_columns(df: DataFrame) -> DataFrame:
    """P6: alphabetical column order (reference: transform_data.py:118)."""
    return df.select(*sorted(df.columns))


def normalize(
    df: DataFrame,
    drop: tuple[str, ...] = DEFAULT_DROP,
    coerce_null_to_zero: bool = False,
) -> DataFrame:
    """The full P1-P6 pipeline in reference order: lowercase → rename →
    drop → cast → dropna → reorder. One lazy plan; Catalyst collapses the
    projections and prunes dropped columns out of the scan."""
    out = lowercase_columns(df)
    out = rename_variants(out)
    out = drop_columns(out, drop)
    out = cast_ints(out, coerce_null_to_zero=coerce_null_to_zero)
    out = drop_nulls(out)
    return reorder_columns(out)


def detect_service_type(columns: list[str], source_name: str = "") -> int:
    """F6: service_type assignment — yellow=1, green=2 (reference keys this
    off the filename, datalake_to_dw.py:132-136; we also detect from the
    pre-normalization column prefix)."""
    lowered = {c.lower() for c in columns}
    if any(c.startswith("lpep_") for c in lowered) or "green" in source_name.lower():
        return 2
    return 1
