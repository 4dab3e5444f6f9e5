"""Geosilhouettes (reference ``silhouettes.py``, SURVEY.md §2.4-C4).

- :func:`silhouette_alist` — per-edge pseudo-silhouette
  (``silhouettes.py:397-502``): for edge (i, j) with different labels,
  (d(i, C_j) - d(i, C_i)) / max(...), where d(i, C) is the mean
  pairwise distance from i to the members of C (self included for the
  own cluster, exactly as the reference's ``full_distances[i, mask]``).
  Spark form: only (focal, label) pairs that actually appear on edges
  are evaluated — a join against cluster members + one grouped mean,
  no full distance matrix.
- :func:`nearest_label` — nearest alternative cluster in feature space
  (``silhouettes.py:503-589``), including the reference's
  ``sum / max(n_C - 1, 1)`` divisor quirk.  This one is inherently
  all-pairs across clusters (quadratic); fine at clustering scales,
  documented for what it is.

``path_silhouette`` (graph-shortest-path dissimilarity) is not
implemented — it needs all-pairs shortest paths; a Pregel-style
relaxation exists in this codebase's toolbox but the statistic is
marked low-priority in SURVEY §2.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist_expr(fcols: list[str]) -> "F.Column":
    d = None
    for c in fcols:
        t = F.col(f"l_{c}") - F.col(f"r_{c}")
        d = t * t if d is None else d + t * t
    return F.sqrt(d)


def silhouette_alist(
    points: DataFrame,
    labels: DataFrame,
    edges: DataFrame,
    feature_cols: list[str],
) -> DataFrame:
    """(focal, neighbor, label_focal, label_neighbor, silhouette)."""
    lab = labels.select("id", "label")
    e = (
        edges.select("focal", "neighbor")
        .join(lab.withColumnRenamed("id", "focal")
              .withColumnRenamed("label", "label_focal"), "focal")
        .join(lab.withColumnRenamed("id", "neighbor")
              .withColumnRenamed("label", "label_neighbor"), "neighbor")
    )
    need = (
        e.select(F.col("focal").alias("id"), F.col("label_focal").alias("lab"))
        .unionByName(
            e.select(F.col("focal").alias("id"),
                     F.col("label_neighbor").alias("lab"))
        )
        .distinct()
    )
    left = points.select(
        "id", *[F.col(c).alias(f"l_{c}") for c in feature_cols]
    )
    members = points.join(lab, "id").select(
        F.col("label").alias("lab"), F.col("id").alias("mid"),
        *[F.col(c).alias(f"r_{c}") for c in feature_cols],
    )
    dmeans = (
        need.join(left, "id")
        .join(members, "lab")
        .groupBy("id", "lab")
        .agg(F.avg(_dist_expr(feature_cols)).alias("dmean"))
    )
    own = dmeans.select(
        F.col("id").alias("focal"), F.col("lab").alias("label_focal"),
        F.col("dmean").alias("d_own"),
    )
    other = dmeans.select(
        F.col("id").alias("focal"), F.col("lab").alias("label_neighbor"),
        F.col("dmean").alias("d_other"),
    )
    return (
        e.join(own, ["focal", "label_focal"], "left")
        .join(other, ["focal", "label_neighbor"], "left")
        .withColumn(
            "silhouette",
            F.when(F.col("label_focal") == F.col("label_neighbor"), F.lit(0.0))
            .otherwise(
                (F.col("d_other") - F.col("d_own"))
                / F.greatest(F.col("d_other"), F.col("d_own"))
            ),
        )
        .select("focal", "neighbor", "label_focal", "label_neighbor",
                "silhouette")
    )


def nearest_label(
    points: DataFrame,
    labels: DataFrame,
    feature_cols: list[str],
    keep_self: bool = False,
) -> DataFrame:
    """(id, nearest_label, dissim): nearest (alternative) cluster by
    mean pairwise feature distance, divisor max(n_C - 1, 1)."""
    from pyspark.sql import Window

    lab = labels.select("id", "label")
    sizes = lab.groupBy("label").count().withColumnRenamed("count", "n_c")
    left = points.join(lab, "id").select(
        "id", F.col("label").alias("own"),
        *[F.col(c).alias(f"l_{c}") for c in feature_cols],
    )
    members = points.join(lab, "id").select(
        F.col("label").alias("cand"), F.col("id").alias("mid"),
        *[F.col(c).alias(f"r_{c}") for c in feature_cols],
    )
    pairs = left.crossJoin(members)
    if not keep_self:
        pairs = pairs.where(F.col("own") != F.col("cand"))
    agg = (
        pairs.groupBy("id", "own", "cand")
        .agg(F.sum(_dist_expr(feature_cols)).alias("dsum"))
        .join(sizes.withColumnRenamed("label", "cand"), "cand")
        .withColumn(
            "dmean",
            F.col("dsum") / F.greatest(F.col("n_c") - 1, F.lit(1)),
        )
    )
    win = Window.partitionBy("id").orderBy("dmean", "cand")
    return (
        agg.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") == 1)
        .select("id", F.col("cand").alias("nearest_label"),
                F.col("dmean").alias("dissim"))
    )
