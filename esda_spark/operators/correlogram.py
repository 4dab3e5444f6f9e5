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
) -> list[dict]:
    """One result dict per support (ascending), each tagged 'support'."""
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
