"""A-DBSCAN: ensemble DBSCAN with sampled draws + 1-NN label extension
(reference ``adbscan.py:22-444``, SURVEY.md §2.4-C1).

Spark-first re-architecture — the reference thins the data, runs
sklearn DBSCAN per draw in joblib, extends labels with a 1-NN
classifier, re-maps labels by centroid proximity and majority-votes.
Here every step is a distributed dataflow:

1. draw r samples `pct_exact` of points by seeded hash;
2. DBSCAN on the sample is expressed as: distance-band edges at eps
   (cell-candidate join) -> core points (>= min_samples-1 neighbors)
   -> connected components over core-core edges by iterative min-label
   propagation (Pregel-style join+min-agg rounds) -> border points
   attach to their minimum-label core neighbor;
3. labels extend to all points via an exact 1-NN join;
4. labels re-map across draws by nearest cluster centroid to draw 0
   (tiny driver-side table, as in reference ``remap_lbls``), then
   majority vote with agreement fraction (reference ``ensemble``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esda_spark.operators.spatial_join import knn_join
from esda_spark.operators.weights import distance_band_edges

NOISE = -1


def dbscan(
    points: DataFrame,
    eps: float,
    min_samples: int,
    cell_size: float | None = None,
    max_iterations: int = 25,
) -> DataFrame:
    """(id, cluster): distributed DBSCAN; cluster = min point id in the
    component, NOISE (-1) for noise points."""
    edges = distance_band_edges(
        points, threshold=eps, cell_size=cell_size or eps
    ).cache()
    degree = edges.groupBy("focal").count()
    core = degree.where(F.col("count") >= min_samples - 1).select(
        F.col("focal").alias("id")
    ).cache()
    cc_edges = (
        edges.join(core.withColumnRenamed("id", "focal"), "focal", "left_semi")
        .join(core.withColumnRenamed("id", "neighbor"), "neighbor", "left_semi")
        .select("focal", "neighbor")
        .cache()
    )
    labels = core.withColumn("cluster", F.col("id"))
    for _ in range(max_iterations):
        nbr_min = (
            cc_edges.join(
                labels.withColumnRenamed("id", "neighbor")
                .withColumnRenamed("cluster", "ncl"),
                "neighbor",
            )
            .groupBy("focal")
            .agg(F.min("ncl").alias("nbr_cluster"))
            .withColumnRenamed("focal", "id")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"), F.coalesce("nbr_cluster", F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint(eager=True)  # truncate per-iteration lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    border = (
        edges.join(labels.withColumnRenamed("id", "neighbor")
                   .withColumnRenamed("cluster", "ncl"), "neighbor")
        .groupBy("focal").agg(F.min("ncl").alias("cluster"))
        .withColumnRenamed("focal", "id")
        .join(labels.select("id"), "id", "left_anti")
    )
    assigned = labels.unionByName(border)
    return (
        points.select("id")
        .join(assigned, "id", "left")
        .withColumn("cluster", F.coalesce("cluster", F.lit(NOISE)))
    )


def adbscan(
    points: DataFrame,
    eps: float,
    min_samples: int,
    pct_exact: float = 0.1,
    reps: int = 10,
    seed: int = 42,
    pct_thr: float = 0.9,
    cell_size: float | None = None,
) -> DataFrame:
    """(id, lbls, pct): majority-vote cluster labels + agreement share.

    Points whose winning label wins less than ``pct_thr`` of draws are
    set to noise, mirroring the reference's `pct_thr` gate.
    """
    spark = points.sparkSession
    draws: list[DataFrame] = []
    for r in range(reps):
        thin = points.where(
            F.pmod(F.xxhash64("id", F.lit(r), F.lit(seed)), 1000)
            < int(pct_exact * 1000)
        )
        ms = max(int(np.floor(min_samples * pct_exact)), 1)
        lab = dbscan(thin, eps, ms, cell_size=cell_size).withColumnRenamed(
            "cluster", "lbl"
        )
        labeled = thin.join(lab, "id").cache()
        # 1-NN extension to every point
        ext = knn_join(
            points, labeled.select("id", "x", "y"), k=1,
            cell_size=cell_size or eps,
        ).select(
            F.col("left_id").alias("id"), F.col("right_id").alias("src")
        ).join(
            lab.withColumnRenamed("id", "src"), "src"
        ).select("id", F.col("lbl").alias(f"rep{r}"))
        draws.append(ext)

    votes = draws[0]
    for d in draws[1:]:
        votes = votes.join(d, "id")

    # centroid-based label remap to draw 0 (driver-side tiny table)
    cents = {}
    base_pts = points.select("id", "x", "y")
    for r in range(reps):
        c = (
            votes.select("id", f"rep{r}").join(base_pts, "id")
            .where(F.col(f"rep{r}") != NOISE)
            .groupBy(f"rep{r}")
            .agg(F.avg("x").alias("cx"), F.avg("y").alias("cy"))
            .collect()
        )
        cents[r] = {row[f"rep{r}"]: (row.cx, row.cy) for row in c}
    remap: dict[int, dict[int, int]] = {0: {k: k for k in cents[0]}}
    base = cents[0]
    for r in range(1, reps):
        m = {}
        for lbl, (cx, cy) in cents[r].items():
            if base:
                m[lbl] = min(
                    base, key=lambda b: (base[b][0] - cx) ** 2 + (base[b][1] - cy) ** 2
                )
            else:
                m[lbl] = lbl
        remap[r] = m

    mapped_cols = []
    for r in range(reps):
        col = F.col(f"rep{r}")
        expr = F.lit(NOISE)
        items = list(remap[r].items())
        for src, dst in reversed(items):
            expr = F.when(col == src, F.lit(dst)).otherwise(expr)
        mapped_cols.append(expr.alias(f"m{r}"))
    mapped = votes.select("id", *mapped_cols)
    arr = F.array(*[F.col(f"m{r}") for r in range(reps)])
    counted = mapped.select(
        "id",
        F.explode(arr).alias("lbl"),
    ).groupBy("id", "lbl").count()
    from pyspark.sql import Window

    win = Window.partitionBy("id").orderBy(F.desc("count"), F.asc("lbl"))
    winner = (
        counted.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") == 1)
        .select(
            "id",
            F.col("lbl").alias("lbls"),
            (F.col("count") / F.lit(float(reps))).alias("pct"),
        )
    )
    return winner.withColumn(
        "lbls",
        F.when(F.col("pct") < pct_thr, F.lit(NOISE)).otherwise(F.col("lbls")),
    )
