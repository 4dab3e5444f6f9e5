"""Synthetic polygon layers for the spatial-join engine (FIXTURES.md §5).

Two deterministic partitions of the same bbox:

- :func:`grid_tiling` — axis-aligned m x m tiles.
- :func:`rotated_tiling` — the same tiling rotated by theta around the
  bbox center (covers the bbox with margin so every point stays inside
  exactly one tile).

Both admit a *closed-form* point->tile assignment (inverse-rotate +
floor), giving an exact ANSI-SQL oracle for the generic ray-casting
PIP join.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def grid_tiling(
    spark: SparkSession, m: int,
    bbox: tuple[float, float, float, float],
) -> DataFrame:
    """(poly_id, xs, ys): m x m axis-aligned tiles over bbox."""
    x0, y0, x1, y1 = (float(v) for v in bbox)
    sx = (x1 - x0) / m
    sy = (y1 - y0) / m
    return spark.range(m * m).select(
        F.col("id").alias("poly_id"),
        F.expr(
            f"array(({x0}D + (id % {m}) * {sx}D),"
            f" ({x0}D + (id % {m} + 1) * {sx}D),"
            f" ({x0}D + (id % {m} + 1) * {sx}D),"
            f" ({x0}D + (id % {m}) * {sx}D))"
        ).alias("xs"),
        F.expr(
            f"array(({y0}D + CAST(id / {m} AS BIGINT) * {sy}D),"
            f" ({y0}D + CAST(id / {m} AS BIGINT) * {sy}D),"
            f" ({y0}D + (CAST(id / {m} AS BIGINT) + 1) * {sy}D),"
            f" ({y0}D + (CAST(id / {m} AS BIGINT) + 1) * {sy}D))"
        ).alias("ys"),
    )


def rotated_tiling(
    spark: SparkSession, m: int,
    bbox: tuple[float, float, float, float],
    theta: float = 0.3,
    margin: float = 1.5,
) -> DataFrame:
    """(poly_id, xs, ys): rotated tiling covering bbox with margin.

    Tiles are laid out in rotated coordinates (u, v) = R(-theta)·(p-c)
    over an expanded square, then mapped back; a point p lies in tile
    (i, j) iff floor((u - u0)/s) == i etc. — the SQL oracle.
    """
    x0, y0, x1, y1 = (float(v) for v in bbox)
    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    half = max(x1 - x0, y1 - y0) * margin / 2.0
    s = 2.0 * half / m
    cos_t, sin_t = math.cos(theta), math.sin(theta)
    rows = []
    for j in range(m):
        for i in range(m):
            u0, v0 = -half + i * s, -half + j * s
            corners = [(u0, v0), (u0 + s, v0), (u0 + s, v0 + s), (u0, v0 + s)]
            xs = [cx + u * cos_t - v * sin_t for u, v in corners]
            ys = [cy + u * sin_t + v * cos_t for u, v in corners]
            rows.append((j * m + i, xs, ys))
    return spark.createDataFrame(
        rows, "poly_id long, xs array<double>, ys array<double>"
    )


def rotated_assignment_params(
    m: int, bbox: tuple[float, float, float, float],
    theta: float = 0.3, margin: float = 1.5,
) -> dict:
    """Constants for the closed-form point->tile oracle."""
    x0, y0, x1, y1 = (float(v) for v in bbox)
    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    half = max(x1 - x0, y1 - y0) * margin / 2.0
    s = 2.0 * half / m
    return {
        "cx": cx, "cy": cy, "half": half, "s": s, "m": m,
        "cos_t": math.cos(theta), "sin_t": math.sin(theta),
    }


def rotated_assignment_sql(px: str, py: str, p: dict) -> str:
    """SQL expression: tile id containing point (px, py)."""
    u = f"(({px} - {p['cx']}) * {p['cos_t']} + ({py} - {p['cy']}) * {p['sin_t']})"
    v = f"(-({px} - {p['cx']}) * {p['sin_t']} + ({py} - {p['cy']}) * {p['cos_t']})"
    i = f"CAST(floor(({u} + {p['half']}) / {p['s']}) AS BIGINT)"
    j = f"CAST(floor(({v} + {p['half']}) / {p['s']}) AS BIGINT)"
    return f"({j} * {p['m']} + {i})"
