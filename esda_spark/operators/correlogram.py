"""Distance correlogram: a global statistic at increasing distance-band
supports (reference ``correlogram.py:52-212``).

The physical trick: ONE cell-candidate distance join at the maximum
support, cached, then each band filters `d2 <= support^2` — the
reference rebuilds a weights object per support (its joblib fan-out,
``correlogram.py:197-199``); here the expensive candidate generation
is shared and each band is a cheap filtered aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esda_spark.operators.global_stats import geary, getis_g, moran
from esda_spark.plans.cells import expand_ring, with_cell

_STATS = {"moran": moran, "geary": geary, "getis_g": getis_g}


def correlogram(
    points: DataFrame,
    value_col: str,
    supports: list[float],
    statistic: str = "moran",
    transformation: str = "r",
    cell_size: float | None = None,
    distance_type: str = "band",
) -> list[dict]:
    """One result dict per support (ascending), each tagged 'support'.

    ``distance_type='band'``: supports are distance thresholds
    (libpysal ``DistanceBand``, binary).  ``'knn'``: supports are
    neighbor counts k (libpysal ``KNN``, binary directed graph,
    reference ``correlogram.py:164-175``) — ONE exact kNN build at
    max(k) (quadtree skew handling included) is ranked per focal and
    each k filters ``rank <= k``; the reference rebuilds a KNN weights
    object per support.
    """
    if distance_type == "knn":
        return _correlogram_knn(points, value_col, supports, statistic,
                                transformation)
    if distance_type != "band":
        raise ValueError("distance_type must be 'band' or 'knn'")
    supports = sorted(float(s) for s in supports)
    d_max = supports[-1]
    if cell_size is None:
        cell_size = d_max
    radius = max(int(math.ceil(d_max / cell_size)), 1)

    pts = with_cell(points.select("id", "x", "y"), cell_size)
    targets = pts.select(
        F.col("id").alias("neighbor"), F.col("x").alias("nx"),
        F.col("y").alias("ny"), F.col("cell"),
    )
    dx = F.col("x") - F.col("nx")
    dy = F.col("y") - F.col("ny")
    cand = (
        expand_ring(pts, radius)
        .join(targets, "cell")
        .where(F.col("id") != F.col("neighbor"))
        .select(
            F.col("id").alias("focal"), "neighbor",
            (dx * dx + dy * dy).alias("d2"),
        )
        .where(F.col("d2") <= F.lit(d_max**2))
        .cache()
    )
    cand.count()

    stat_fn = _STATS[statistic]
    out = []
    for s in supports:
        edges = cand.where(F.col("d2") <= F.lit(s * s)).select(
            "focal", "neighbor", F.lit(1.0).alias("weight")
        )
        kwargs = {} if statistic == "getis_g" else {
            "transformation": transformation
        }
        res = stat_fn(points, edges, value_col, **kwargs)
        res["support"] = s
        out.append(res)
    cand.unpersist()
    return out


def _correlogram_knn(
    points: DataFrame,
    value_col: str,
    supports: list[float],
    statistic: str,
    transformation: str,
) -> list[dict]:
    """KNN-supports correlogram: one exact kNN(max k) build; neighbors
    ranked per focal by (distance, neighbor id) — the same tie-break
    the kNN builder settles with — so each smaller k is a filter, not
    a rebuild."""
    from pyspark.sql import Window

    from esda_spark.operators.weights import knn_edges

    ks = sorted(int(s) for s in supports)
    # keep_d2 + (d2 asc, neighbor) is EXACTLY the builder's settlement
    # order; ranking on weight = 1/sqrt(d2) descending was wrong for
    # coincident points (d2 = 0 -> NULL weight -> NULLS LAST under
    # desc(), demoting the nearest neighbor to last)
    cand = knn_edges(points, k=ks[-1], binary=True, keep_d2=True)
    win = Window.partitionBy("focal").orderBy(
        F.col("d2").asc(), F.col("neighbor")
    )
    ranked = cand.withColumn("rk", F.row_number().over(win)).cache()
    ranked.count()

    stat_fn = _STATS[statistic]
    out = []
    for k in ks:
        edges = ranked.where(F.col("rk") <= k).select(
            "focal", "neighbor", F.lit(1.0).alias("weight")
        )
        kwargs = {} if statistic == "getis_g" else {
            "transformation": transformation
        }
        res = stat_fn(points, edges, value_col, **kwargs)
        res["support"] = k
        out.append(res)
    ranked.unpersist()
    return out


def lowess_correlogram(
    points: DataFrame,
    value_col: str,
    xvals: list[float],
    cell_size: float | None = None,
    frac: float | None = None,
) -> list[dict]:
    """Nonparametric correlogram (reference ``correlogram.py:215-306``):
    lowess-smooth the spatial-covariation model z_i z_j = f(d_ij) on
    pair distances, evaluated at ``xvals``.

    Distributed deviation from the reference (documented): the
    reference densifies the full n^2 distance matrix and calls
    statsmodels' lowess (robustifying iterations included).  Here the
    pair set is a single cell-candidate join bounded by the largest
    xval plus one bin width (only local pairs influence local fits),
    the span fraction defaults to the reference's ``bin_frac`` rule,
    each x0's bandwidth is the frac-quantile of |d - x0|
    (approxQuantile), and the local fit is tricube-weighted LINEAR
    regression in closed form from five aggregates — numerically
    equivalent smoothing, not bit-identical to statsmodels (no robust
    iterations).
    """
    xvals = sorted(float(x) for x in xvals)
    if len(xvals) >= 2:
        lo_w = xvals[1] - xvals[0]
        hi_w = xvals[-1] - xvals[-2]
    else:
        lo_w = hi_w = max(xvals[0], 1.0)
    lo = max(xvals[0] - lo_w / 2, 0.0)
    hi = xvals[-1] + hi_w / 2
    d_max = hi + max(lo_w, hi_w)
    if cell_size is None:
        cell_size = d_max
    radius = max(int(math.ceil(d_max / cell_size)), 1)

    agg = points.agg(
        F.count("*").alias("n"), F.avg(value_col).alias("mu"),
        F.stddev_pop(value_col).alias("sd"),
    ).collect()[0]
    n, mu, sd = int(agg.n), float(agg.mu), float(agg.sd)
    z = points.select(
        "id", "x", "y",
        ((F.col(value_col) - F.lit(mu)) / F.lit(sd)).alias("z"),
    )
    pts = with_cell(z, cell_size)
    targets = pts.select(
        F.col("id").alias("neighbor"), F.col("x").alias("nx"),
        F.col("y").alias("ny"), F.col("z").alias("zn"), F.col("cell"),
    )
    dx = F.col("x") - F.col("nx")
    dy = F.col("y") - F.col("ny")
    pairs = (
        expand_ring(pts, radius)
        .join(targets, "cell")
        .where(F.col("id") < F.col("neighbor"))  # upper triangle
        .select(
            F.sqrt(dx * dx + dy * dy).alias("d"),
            (F.col("z") * F.col("zn")).alias("zz"),
        )
        .where(F.col("d") <= F.lit(d_max))
        .cache()
    )
    n_window = pairs.count()
    total_pairs = n * (n - 1) / 2.0
    if frac is None:
        in_range = pairs.where(
            (F.col("d") >= lo) & (F.col("d") <= hi)
        ).count()
        frac = max(in_range / total_pairs / max(len(xvals), 1), 1e-6)
    k = max(int(round(frac * total_pairs)), 2)

    out = []
    for x0 in xvals:
        if n_window == 0:  # no pairs within d_max (sparse data / far xvals)
            out.append({"support": x0, "lowess": float("nan")})
            continue
        dd = pairs.withColumn("ad", F.abs(F.col("d") - F.lit(x0)))
        q = min(max(k / max(n_window, 1), 1e-6), 1.0)
        h0 = dd.approxQuantile("ad", [q], 0.001)[0] or 1e-12
        w = (1 - (F.col("ad") / F.lit(h0)) ** 3) ** 3
        local = dd.where(F.col("ad") <= h0).withColumn(
            "w", F.greatest(w, F.lit(0.0))
        )
        row = local.agg(
            F.sum("w").alias("sw"),
            F.sum(F.col("w") * F.col("d")).alias("swd"),
            F.sum(F.col("w") * F.col("d") * F.col("d")).alias("swd2"),
            F.sum(F.col("w") * F.col("zz")).alias("swy"),
            F.sum(F.col("w") * F.col("d") * F.col("zz")).alias("swdy"),
        ).collect()[0]
        if row.sw is None:  # every pair outside the tricube window
            out.append({"support": x0, "lowess": float("nan")})
            continue
        sw, swd, swd2 = float(row.sw), float(row.swd), float(row.swd2)
        swy, swdy = float(row.swy), float(row.swdy)
        det = sw * swd2 - swd * swd
        if abs(det) > 1e-300 * max(1.0, sw):
            b = (sw * swdy - swd * swy) / det
            a = (swy - b * swd) / sw
            pred = a + b * x0
        else:  # degenerate: all pairs at one distance -> weighted mean
            pred = swy / sw if sw else float("nan")
        out.append({"support": x0, "lowess": pred})
    pairs.unpersist()
    return out
