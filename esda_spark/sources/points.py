"""Deterministic geocoding: table keys -> spatial units (points).

The engine's input is web-scale rows keyed by a unique id (urls in
the Common-Crawl shape, integer keys in the driver testdata).  The
geocode is a *pure integer-arithmetic* function of the key so that it
is bit-identical between Spark and any ANSI-SQL oracle (DuckDB): all
operations stay in exact int64 until a single final division.

10%% of rows are concentrated into 3 hot centers (FIXTURES.md §1) to
exercise skew handling in the weights builder / salted aggregation.

Every statistic downstream consumes this canonical shape::

    points(id long, x double, y double, y_cont double, y_bin double,
           e double, b double)

with ``id`` dense in [0, n) — the positional-alignment trap of the
reference (SURVEY.md §1.2) is converted into an explicit join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Hot-spot centers (x, y): roughly NYC, Paris, Tokyo.
HOT = [(-74.0, 40.7), (2.35, 48.85), (139.7, 35.7)]

TABLE_KEYS = {
    "customer": ("c_custkey", "c_acctbal"),
    "orders": ("o_orderkey", "o_totalprice"),
    "documents": ("doc_id", "n_chars"),
    "events": ("event_id", "value"),
    "supplier": ("s_suppkey", "s_acctbal"),
}


def geocode_cols(key):
    """(x, y) Columns from an int64 key column — portable arithmetic."""
    ux = (key * F.lit(48271)) % F.lit(65536)
    uy = (key * F.lit(16807)) % F.lit(65536)
    base_x = ux.cast("double") / F.lit(65536.0) * F.lit(360.0) - F.lit(180.0)
    base_y = uy.cast("double") / F.lit(65536.0) * F.lit(170.0) - F.lit(85.0)
    jx = ((key * F.lit(69621)) % F.lit(1000)).cast("double") / F.lit(1000.0) - F.lit(0.5)
    jy = ((key * F.lit(10007)) % F.lit(1000)).cast("double") / F.lit(1000.0) - F.lit(0.5)
    hot_idx = key % F.lit(3)
    hot_x = (
        F.when(hot_idx == 0, F.lit(HOT[0][0]))
        .when(hot_idx == 1, F.lit(HOT[1][0]))
        .otherwise(F.lit(HOT[2][0]))
    )
    hot_y = (
        F.when(hot_idx == 0, F.lit(HOT[0][1]))
        .when(hot_idx == 1, F.lit(HOT[1][1]))
        .otherwise(F.lit(HOT[2][1]))
    )
    is_hot = (key % F.lit(10)) == 0
    x = F.when(is_hot, hot_x + jx * F.lit(0.2)).otherwise(base_x)
    y = F.when(is_hot, hot_y + jy * F.lit(0.2)).otherwise(base_y)
    return x, y


def points_from_table(
    spark: SparkSession, sf_dir: str, table: str = "customer"
) -> DataFrame:
    """Load a testdata table and geocode it into the canonical points shape."""
    key_col, val_col = TABLE_KEYS[table]
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    key = F.col(key_col).cast("long")
    x, y = geocode_cols(key)
    return df.select(
        key.alias("id"),
        x.alias("x"),
        y.alias("y"),
        F.col(val_col).cast("double").alias("y_cont"),
        ((key * F.lit(7919)) % F.lit(2)).cast("double").alias("y_bin"),
        ((key * F.lit(13)) % F.lit(97) + F.lit(1)).cast("double").alias("e"),
        ((key * F.lit(31)) % F.lit(997) + F.lit(50)).cast("double").alias("b"),
    )


def points_sql(table: str = "customer") -> str:
    """DuckDB CTE body producing the identical points relation.

    Same integer arithmetic, same final divisions — bit-identical to
    :func:`points_from_table` (verified in tests/test_points.py).
    """
    key_col, val_col = TABLE_KEYS[table]
    k = f"CAST({key_col} AS BIGINT)"
    hx = (
        f"CASE ({k}) % 3 WHEN 0 THEN {HOT[0][0]} WHEN 1 THEN {HOT[1][0]} "
        f"ELSE {HOT[2][0]} END"
    )
    hy = (
        f"CASE ({k}) % 3 WHEN 0 THEN {HOT[0][1]} WHEN 1 THEN {HOT[1][1]} "
        f"ELSE {HOT[2][1]} END"
    )
    return f"""
SELECT
  {k} AS id,
  CASE WHEN ({k}) % 10 = 0
       THEN ({hx}) + (CAST(({k} * 69621) % 1000 AS DOUBLE) / 1000.0 - 0.5) * 0.2
       ELSE CAST(({k} * 48271) % 65536 AS DOUBLE) / 65536.0 * 360.0 - 180.0
  END AS x,
  CASE WHEN ({k}) % 10 = 0
       THEN ({hy}) + (CAST(({k} * 10007) % 1000 AS DOUBLE) / 1000.0 - 0.5) * 0.2
       ELSE CAST(({k} * 16807) % 65536 AS DOUBLE) / 65536.0 * 170.0 - 85.0
  END AS y,
  CAST({val_col} AS DOUBLE) AS y_cont,
  CAST(({k} * 7919) % 2 AS DOUBLE) AS y_bin,
  CAST(({k} * 13) % 97 + 1 AS DOUBLE) AS e,
  CAST(({k} * 31) % 997 + 50 AS DOUBLE) AS b
FROM {table}
"""


def synthetic_points(spark: SparkSession, n: int) -> DataFrame:
    """Canonical points table of arbitrary size from ``spark.range`` —
    the same pure-integer geocode as :func:`points_from_table`, for
    scale tests beyond the driver testdata (hot-spot skew included)."""
    key = F.col("id")
    x, y = geocode_cols(key)
    return spark.range(n).select(
        key.alias("id"),
        x.alias("x"),
        y.alias("y"),
        ((key * F.lit(25214903917)) % F.lit(100000)).cast("double")
        .alias("y_cont"),
        ((key * F.lit(7919)) % F.lit(2)).cast("double").alias("y_bin"),
        ((key * F.lit(13)) % F.lit(97) + F.lit(1)).cast("double").alias("e"),
        ((key * F.lit(31)) % F.lit(997) + F.lit(50)).cast("double").alias("b"),
    )
