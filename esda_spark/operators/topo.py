"""Topological isolation (reference ``topo.py:84-167``).

``isolation``: for every point, the distance to the nearest point with
a strictly higher value.  The reference builds an incremental rtree
over descending values; here it is the same doubling-ring candidate
join as the kNN builder with the ``higher-value`` predicate pushed
into the candidate filter — peaks (no higher value anywhere) get NULL,
matching the reference's NaN for the global maximum.

``prominence`` (reference ``topo.py:170-377``) is inherently a
sequential union-find over the descending-value order and is NOT
implemented distributed; small-n driver-side use can call the numpy
oracle in tests. Documented deviation (SURVEY.md §2.4-C5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from esda_spark.plans.cells import expand_ring, with_cell


def isolation(
    points: DataFrame,
    value_col: str = "y_cont",
    cell_size: float = 1.0,
    max_rounds: int = 12,
) -> DataFrame:
    """(id, isolation, nearest_higher): distance to nearest strictly
    higher-valued point; NULLs for the global maximum."""
    pts = with_cell(points.select("id", "x", "y", value_col), cell_size)
    targets = with_cell(points.select("id", "x", "y", value_col), cell_size).select(
        F.col("id").alias("nid"), F.col("x").alias("nx"),
        F.col("y").alias("ny"), F.col(value_col).alias("nv"), F.col("cell"),
    )
    unsettled = pts
    results = []
    radius = 1
    for _ in range(max_rounds):
        guard = float(radius * cell_size)
        world = radius * cell_size > 400.0
        if world:
            cand = F.broadcast(unsettled.drop("cell")).crossJoin(
                targets.drop("cell")
            )
        else:
            cand = expand_ring(
                unsettled.withColumnRenamed("cell", "cell0"), radius
            ).join(targets, "cell")
        dx = F.col("x") - F.col("nx")
        dy = F.col("y") - F.col("ny")
        cand = (
            cand.where(F.col("nv") > F.col(value_col))
            .select("id", "nid", F.sqrt(dx * dx + dy * dy).alias("dist"))
        )
        win = Window.partitionBy("id").orderBy("dist", "nid")
        best = (
            cand.withColumn("rk", F.row_number().over(win))
            .where(F.col("rk") == 1)
            .withColumn("_settled", F.lit(world) | (F.col("dist") < guard))
            .localCheckpoint(eager=True)
        )
        results.append(
            best.where(F.col("_settled")).select(
                "id", F.col("dist").alias("isolation"),
                F.col("nid").alias("nearest_higher"),
            )
        )
        settled_ids = best.where(F.col("_settled")).select("id")
        unsettled = unsettled.join(settled_ids, "id", "left_anti")
        if world:
            break
        if unsettled.isEmpty():
            break
        radius *= 4
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return points.select("id").join(out, "id", "left")
