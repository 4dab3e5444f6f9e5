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

- :func:`boundary_silhouette` — silhouette restricted to spatially
  adjacent clusters (``silhouettes.py:253-396``): b(i) is the minimum
  mean dissimilarity to a cluster i *borders*; zero for interior
  observations and singleton own-clusters.
- :func:`path_silhouette` — silhouette over graph-shortest-path
  dissimilarity (``silhouettes.py:41-252``).  All-pairs shortest paths
  are inherently quadratic in component size (the reference densifies
  the full matrix); here components are the parallel unit: a Pregel
  min-label propagation finds components, then each component solves
  locally (vectorized Floyd-Warshall) inside one
  ``cogroup().applyInPandas`` task.  Components larger than
  ``max_component`` raise rather than silently OOM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    mean pairwise feature distance, divisor max(n_C - 1, 1).

    Exact centroid-bound pruning replaces the former point x member
    crossJoin: with f_C = n_C / max(n_C - 1, 1), Jensen gives
    dmean(i, C) >= ||i - mu_C|| * f_C (LB) and the triangle inequality
    dmean(i, C) <= (||i - mu_C|| + spread_C) * f_C (UB, spread_C = mean
    member distance to centroid).  Clusters with LB > min-over-C UB can
    never attain the argmin (strict: exact >= LB > minUB >= exact of
    the UB-minimizer), so only the surviving candidate clusters are
    exactly evaluated against their members.  The bounds come from a
    broadcast L-row centroid table — O(n*L) cheap column math, and the
    heavy member join touches only candidate clusters.
    """
    from pyspark.sql import Window

    lab = labels.select("id", "label")
    feats = points.join(lab, "id")
    cent = feats.groupBy("label").agg(
        F.count("*").alias("n_c"),
        *[F.avg(c).alias(f"m_{c}") for c in feature_cols],
    )
    spread = (
        feats.join(
            F.broadcast(cent.select(
                "label", *[F.col(f"m_{c}").alias(f"r_{c}")
                           for c in feature_cols])),
            "label",
        )
        .select("label", F.sqrt(sum(
            (F.col(c) - F.col(f"r_{c}")) * (F.col(c) - F.col(f"r_{c}"))
            for c in feature_cols)).alias("dc"))
        .groupBy("label").agg(F.avg("dc").alias("spread"))
    )
    cinfo = cent.join(spread, "label").withColumn(
        "f_c",
        F.col("n_c").cast("double")
        / F.greatest(F.col("n_c") - 1, F.lit(1)).cast("double"),
    )
    left = feats.select(
        "id", F.col("label").alias("own"),
        *[F.col(c).alias(f"l_{c}") for c in feature_cols],
    )
    bounds = left.crossJoin(
        F.broadcast(cinfo.select(
            F.col("label").alias("cand"), "n_c", "f_c", "spread",
            *[F.col(f"m_{c}").alias(f"r_{c}") for c in feature_cols]))
    )
    if not keep_self:
        bounds = bounds.where(F.col("own") != F.col("cand"))
    bounds = bounds.withColumn("dcent", _dist_expr(feature_cols)).select(
        "id", "own", "cand", "n_c",
        (F.col("dcent") * F.col("f_c")).alias("lb"),
        ((F.col("dcent") + F.col("spread")) * F.col("f_c")).alias("ub"),
    )
    min_ub = bounds.groupBy("id").agg(F.min("ub").alias("min_ub"))
    cand = bounds.join(min_ub, "id").where(
        F.col("lb") <= F.col("min_ub")
    ).select("id", "cand", "n_c")
    members = feats.select(
        F.col("label").alias("cand"), F.col("id").alias("mid"),
        *[F.col(c).alias(f"r_{c}") for c in feature_cols],
    )
    agg = (
        cand.join(left.drop("own"), "id")
        .join(members, "cand")
        .groupBy("id", "cand", "n_c")
        .agg(F.sum(_dist_expr(feature_cols)).alias("dsum"))
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


def boundary_silhouette(
    points: DataFrame,
    labels: DataFrame,
    edges: DataFrame,
    feature_cols: list[str],
) -> DataFrame:
    """(id, boundary_silhouette): silhouette restricted to bordering
    clusters (reference ``silhouettes.py:253-396``).

    b(i) = min over clusters c that i borders (some neighbor of i holds
    label c != own) of mean d(i, members of c); a(i) = sum d(i, members
    of own incl. self) / (n_own - 1).  Zero for interior observations
    and for singleton own-clusters.  Distributed form mirrors
    :func:`silhouette_alist`: only (focal, bordering-label) pairs are
    evaluated — one join against cluster members + grouped mean, no
    full distance matrix.
    """
    lab = labels.select("id", "label")
    e = (
        edges.select("focal", "neighbor")
        .join(lab.withColumnRenamed("id", "focal")
              .withColumnRenamed("label", "own"), "focal")
        .join(lab.withColumnRenamed("id", "neighbor")
              .withColumnRenamed("label", "nlab"), "neighbor")
    )
    border_cands = (
        e.where(F.col("own") != F.col("nlab"))
        .select("focal", "own", F.col("nlab").alias("cand"))
        .distinct()
    )
    feats = points.join(lab, "id")
    left = feats.select(
        F.col("id").alias("focal"),
        *[F.col(c).alias(f"l_{c}") for c in feature_cols],
    )
    members = feats.select(
        F.col("label").alias("mlab"), F.col("id").alias("mid"),
        *[F.col(c).alias(f"r_{c}") for c in feature_cols],
    )
    # a(i): own-cluster mean with the reference's sum/(n_own-1) divisor
    # (self term contributes d=0 to the sum), only for boundary focals
    boundary_ids = border_cands.select("focal", "own").distinct()
    own_mean = (
        boundary_ids.join(left, "focal")
        .join(members, F.col("own") == F.col("mlab"))
        .groupBy("focal", "own")
        .agg(F.sum(_dist_expr(feature_cols)).alias("dsum"),
             F.count("*").alias("n_own"))
        .withColumn("a", F.col("dsum") / (F.col("n_own") - 1))
    )
    nbr_mean = (
        border_cands.join(left, "focal")
        .join(members, F.col("cand") == F.col("mlab"))
        .groupBy("focal", "own", "cand")
        .agg(F.avg(_dist_expr(feature_cols)).alias("dmean"))
        .groupBy("focal", "own")
        .agg(F.min("dmean").alias("b"))
    )
    scored = (
        own_mean.join(nbr_mean, ["focal", "own"])
        .withColumn(
            "bs",
            F.when(F.col("n_own") <= 1, F.lit(0.0)).otherwise(
                (F.col("b") - F.col("a"))
                / F.greatest(F.col("b"), F.col("a"))
            ),
        )
        .select(F.col("focal").alias("id"), "bs")
    )
    return (
        points.select("id")
        .join(scored, "id", "left")
        .select("id", F.coalesce("bs", F.lit(0.0))
                .alias("boundary_silhouette"))
    )


def _connected_components(
    edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """(id, comp): undirected connected components by iterative
    min-label propagation (same Pregel pattern as ``adbscan.dbscan``);
    comp = minimum node id in the component."""
    und = (
        edges.select("focal", "neighbor")
        .unionByName(edges.select(
            F.col("neighbor").alias("focal"),
            F.col("focal").alias("neighbor")))
        .distinct()
        .cache()
    )
    labels = (
        und.select(F.col("focal").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        nbr_min = (
            und.join(labels.withColumnRenamed("id", "neighbor")
                     .withColumnRenamed("comp", "ncomp"), "neighbor")
            .groupBy("focal").agg(F.min("ncomp").alias("mn"))
            .withColumnRenamed("focal", "id")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select("id", F.least(
                F.col("comp"), F.coalesce("mn", F.col("comp"))).alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp")).limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    return labels


def path_silhouette(
    points: DataFrame,
    labels: DataFrame,
    edges: DataFrame,
    feature_cols: list[str],
    closest: bool = False,
    max_component: int = 4000,
) -> DataFrame:
    """(id, path_silhouette, nbfc_label, nbfc_score): silhouette over
    graph-shortest-path dissimilarity (reference ``silhouettes.py:
    41-252``).

    Edge weights are euclidean feature distances; per connected
    component, all-pairs shortest paths solve locally with a vectorized
    Floyd-Warshall inside ``cogroup().applyInPandas`` (components are
    the parallel unit, exactly the reference's per-component
    recursion).  ``closest=False`` is the Rousseeuw silhouette on the
    path matrix (a = sum_own-excl-self/(n-1), b = min other-cluster
    mean); ``closest=True`` scores against the single nearest
    out-of-cluster node with a = own-cluster mean incl. self.

    Reference parity: with >1 component, a component only scores when
    2 < (#labels in component) < (component size - 1); otherwise
    psil = 0, nbfc_label = null, nbfc_score = +inf.  Components larger
    than ``max_component`` raise (the statistic is inherently
    all-pairs; at web scale, pre-cluster or coarsen first).
    """
    lab = labels.select("id", "label")
    l = points.select(F.col("id").alias("focal"),
                      *[F.col(c).alias(f"l_{c}") for c in feature_cols])
    r = points.select(F.col("id").alias("neighbor"),
                      *[F.col(c).alias(f"r_{c}") for c in feature_cols])
    e = (
        edges.select("focal", "neighbor").join(l, "focal").join(r, "neighbor")
        .select("focal", "neighbor", _dist_expr(feature_cols).alias("d"))
    )
    # localCheckpoint both materializes the iterative CC result and cuts
    # the shared lineage (nodes and e_comp both join against comp, which
    # otherwise trips Spark's ambiguous-self-join analysis).  Isolated
    # points (no edges) never appear in the edge-derived node set, so
    # left-join every labeled id and coalesce to a singleton component —
    # the reference emits a row for every observation (size-1 components
    # fail the 2 < L < n-1 gate: psil=0, nbfc=nan, score=inf).
    comp = (
        lab.select("id")
        .join(_connected_components(e), "id", "left")
        .select("id", F.coalesce("comp", F.col("id")).alias("comp"))
        .localCheckpoint(eager=True)
    )
    n_components = comp.select("comp").distinct().count()
    nodes = comp.join(lab, "id").select("comp", "id", "label")
    # alias comp's columns to fresh exprIds: nodes and e_comp both read
    # from comp, and cogroup on the same attribute trips the ambiguous
    # self-join analyzer
    e_comp = (
        e.join(comp.select(F.col("id").alias("focal"),
                           F.col("comp").alias("_ec")), "focal")
        .select(F.col("_ec").alias("comp"), "focal", "neighbor", "d")
    )

    check_labels = n_components > 1

    def solve(key, nodes_pdf, edges_pdf):
        ids = nodes_pdf["id"].to_numpy()
        labs = nodes_pdf["label"].to_numpy()
        n = len(ids)
        if n > max_component:
            raise ValueError(
                f"path_silhouette component of size {n} exceeds "
                f"max_component={max_component}; coarsen the graph first"
            )
        uniq = np.unique(labs)
        if check_labels and not (2 < len(uniq) < (n - 1)):
            return pd.DataFrame({
                "id": ids, "path_silhouette": np.zeros(n),
                "nbfc_label": np.full(n, np.nan),
                "nbfc_score": np.full(n, np.inf),
            })
        idx = {v: i for i, v in enumerate(ids)}
        D = np.full((n, n), np.inf)
        np.fill_diagonal(D, 0.0)
        fi = edges_pdf["focal"].map(idx).to_numpy()
        ni = edges_pdf["neighbor"].map(idx).to_numpy()
        dd = edges_pdf["d"].to_numpy()
        np.minimum.at(D, (fi, ni), dd)
        np.minimum.at(D, (ni, fi), dd)
        for k in range(n):
            np.minimum(D, D[:, k, None] + D[None, k, :], out=D)
        sils = np.zeros(n)
        nbfc = np.full(n, np.nan)
        nbfc_score = np.full(n, np.inf)
        for i in range(n):
            own = labs == labs[i]
            other = ~own
            if not other.any():
                continue
            masked = D[i].copy()
            masked[own] = np.inf
            j = int(np.argmin(masked))
            nbfc[i] = labs[j]
            nbfc_score[i] = masked[j]
            if closest:
                a = D[i, own].mean()          # incl self (reference quirk)
                b = masked[j]
                sils[i] = (b - a) / max(b, a) if max(b, a) > 0 else 0.0
            else:
                if own.sum() <= 1:
                    sils[i] = 0.0
                    continue
                a = D[i, own].sum() / (own.sum() - 1)
                b = np.inf
                for c in uniq:
                    if c == labs[i]:
                        continue
                    b = min(b, D[i, labs == c].mean())
                sils[i] = (b - a) / max(b, a) if max(b, a) > 0 else 0.0
        return pd.DataFrame({
            "id": ids, "path_silhouette": sils,
            "nbfc_label": nbfc, "nbfc_score": nbfc_score,
        })

    out = (
        nodes.groupBy("comp")
        .cogroup(e_comp.groupBy("comp"))
        .applyInPandas(
            solve,
            "id long, path_silhouette double, nbfc_label double, "
            "nbfc_score double",
        )
    )
    return out
