"""Spatial lag — the P1 primitive every statistic composes.

Reference: ``_slag(w, y)`` = sparse CSR matvec (``moran.py:42-47``).
Spark form: hash join of the edge DataFrame against the values table
on ``neighbor == id``, then hash aggregate per focal::

    lag_i = sum_j w_ij * z_j

The values side is broadcast when small (the common case: values are
(id, double) pairs), so the only shuffle is the final per-focal
aggregate — and Catalyst turns that into a partial (map-side) agg
followed by a final agg on the focal key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spatial_lag(
    edges: DataFrame,
    values: DataFrame,
    value_col: str = "z",
    out_col: str = "lag",
    broadcast_values: bool = True,
) -> DataFrame:
    """Return (id, <out_col>) with lag_i = sum_j w_ij * values[j].

    Focals with no edges are absent from the result (islands — callers
    left-join and fill 0.0/NaN per-statistic, matching the reference's
    island semantics).
    """
    vals = values.select(F.col("id").alias("neighbor"), F.col(value_col).alias("_v"))
    if broadcast_values:
        vals = F.broadcast(vals)
    return (
        edges.join(vals, "neighbor")
        .groupBy("focal")
        .agg(F.sum(F.col("weight") * F.col("_v")).alias(out_col))
        .withColumnRenamed("focal", "id")
    )
