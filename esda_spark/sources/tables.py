"""Format-neutral table source (the Iceberg posture).

The north rule targets Iceberg tables; this container ships no
Iceberg runtime jar, so the engine reads Parquet through the same
DataSource V2 scan interface Iceberg implements.  Every operator takes
DataFrames, so switching storage is this function plus a catalog
config (`spark.sql.catalog.*` + `format="iceberg"`), with partition
pruning / column pruning / predicate pushdown identical in kind
(verified for parquet in PLANS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load_table(
    spark: SparkSession,
    name: str,
    sf_dir: str | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Read a testdata table (parquet) or a catalog table (iceberg)."""
    if fmt == "parquet":
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if fmt == "iceberg":
        # requires an Iceberg catalog configured on the session
        return spark.read.table(name)
    return spark.read.format(fmt).load(f"{sf_dir}/{name}")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TPCH_TABLES}
