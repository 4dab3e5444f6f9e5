"""Per-polygon shape/compactness statistics (reference ``shape.py``,
SURVEY.md §2.4-C2).

Embarrassingly parallel per geometry -> one Arrow-batched kernel over
the coordinate-array polygon representation (no shapely in the image:
convex hull = Andrew monotone chain, minimum bounding circle = Welzl,
minimum rotated rectangle = rotating calipers over hull edges — all
textbook computational-geometry algorithms in numpy).

Implemented measures (formula parity with the reference, file:line):
area, perimeter, isoperimetric_quotient (shape.py:177),
isoareal_quotient (:215), minimum_bounding_circle_ratio (:265),
radii_ratio (:279), diameter_ratio (:291, rotated), length_width_diff
(:312), boundary_amplitude (:330), convex_hull_ratio (:346),
fractal_dimension (:356, square support), rectangularity (:411),
shape_index (:433), equivalent_rectangular_index (:452),
form_factor (:479), squareness (:381), moment_of_inertia (:505,
Godwin-1980 shoelace second moments about the centroid),
second_areal_moment (:623, alias of the unnormalized moment),
nmi (:961, A^2 / (2 pi J)), moa_ratio (:948, circle-of-same-perimeter
polar moment over J), reflexive_angle_ratio (:1168; ring canonicalized
CCW so reflex vertices are exactly those with positive vertex cross
product — the reference's sign test depends on stored orientation).

Collection-level :func:`moment_of_inertia_global` (:974) is a Spark
aggregation of per-ring origin moments (sum A, A*cx, A*cy, Ixx0, Iyy0,
then one parallel-axis shift on the driver) — no per-geometry collect.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ring_area(xs: np.ndarray, ys: np.ndarray) -> float:
    return 0.5 * abs(float(np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1))))


def ring_perimeter(xs: np.ndarray, ys: np.ndarray) -> float:
    dx = np.roll(xs, -1) - xs
    dy = np.roll(ys, -1) - ys
    return float(np.sqrt(dx * dx + dy * dy).sum())


def ring_moments(xs: np.ndarray, ys: np.ndarray) -> tuple:
    """(A, cx, cy, Ixx0, Iyy0): signed shoelace area, centroid, and
    second moments of area about the ORIGIN (reference
    ``shape.py:1114-1166``, Godwin 1980).  Caller applies the parallel
    axis theorem; all terms flip sign together under ring reversal."""
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    cross = xs * y2 - x2 * ys
    a = cross.sum() / 2.0
    cx = float(((xs + x2) * cross).sum() / (6.0 * a)) if a else 0.0
    cy = float(((ys + y2) * cross).sum() / (6.0 * a)) if a else 0.0
    ixx0 = float(((ys * ys + ys * y2 + y2 * y2) * cross).sum() / 12.0)
    iyy0 = float(((xs * xs + xs * x2 + x2 * x2) * cross).sum() / 12.0)
    return float(a), cx, cy, ixx0, iyy0


def polar_moment(xs: np.ndarray, ys: np.ndarray) -> float:
    """J = Ixx + Iyy about the ring centroid, orientation-normalized."""
    a, cx, cy, ixx0, iyy0 = ring_moments(xs, ys)
    if a < 0:  # canonicalize CCW (reference orients before computing)
        a, ixx0, iyy0 = -a, -ixx0, -iyy0
    return (ixx0 - a * cy * cy) + (iyy0 - a * cx * cx)


def reflex_ratio(xs: np.ndarray, ys: np.ndarray) -> float:
    """Fraction of reflex interior angles (reference ``shape.py:
    1168-1181`` returns mean(is_reflex)).  Ring is canonicalized CCW;
    a vertex is reflex iff cross(prev-cur, next-cur) > 0."""
    a, *_ = ring_moments(xs, ys)
    if a < 0:
        xs, ys = xs[::-1], ys[::-1]
    px, py = np.roll(xs, 1) - xs, np.roll(ys, 1) - ys
    nx, ny = np.roll(xs, -1) - xs, np.roll(ys, -1) - ys
    cross = px * ny - py * nx
    return float((cross > 0).mean())


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; pts (n,2) -> hull (m,2) CCW."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_bounding_circle_radius(pts: np.ndarray) -> float:
    """Welzl's algorithm (iterative move-to-front) on the hull points."""
    hull = convex_hull(pts)
    P = [tuple(p) for p in hull]

    def circle_two(a, b):
        cx, cy = (a[0] + b[0]) / 2, (a[1] + b[1]) / 2
        r = math.dist(a, b) / 2
        return cx, cy, r

    def circle_three(a, b, c):
        ax, ay = a
        bx, by = b
        cx, cy = c
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if abs(d) < 1e-24:
            return None
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay)
              + (cx**2 + cy**2) * (ay - by)) / d
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx)
              + (cx**2 + cy**2) * (bx - ax)) / d
        return ux, uy, math.dist((ux, uy), a)

    def inside(c, p, eps=1e-9):
        return c is not None and math.dist((c[0], c[1]), p) <= c[2] * (1 + eps)

    c = None
    for i, p in enumerate(P):
        if inside(c, p):
            continue
        c = (p[0], p[1], 0.0)
        for j, q in enumerate(P[: i + 1]):
            if inside(c, q):
                continue
            c = circle_two(p, q)
            for r_ in P[: j + 1]:
                if inside(c, r_):
                    continue
                c3 = circle_three(p, q, r_)
                if c3 is not None:
                    c = c3
    return float(c[2]) if c else 0.0


def min_rotated_rect(pts: np.ndarray) -> tuple[float, float]:
    """(width, height) of the minimum-area rotated rectangle
    (rotating calipers over hull edge directions)."""
    hull = convex_hull(pts)
    if len(hull) == 1:
        return 0.0, 0.0
    if len(hull) == 2:
        return float(np.linalg.norm(hull[1] - hull[0])), 0.0
    best = (math.inf, 0.0, 0.0)
    m = len(hull)
    for i in range(m):
        e = hull[(i + 1) % m] - hull[i]
        norm = np.linalg.norm(e)
        if norm == 0:
            continue
        ux, uy = e / norm
        R = np.array([[ux, uy], [-uy, ux]])
        proj = hull @ R.T
        w = proj[:, 0].max() - proj[:, 0].min()
        h = proj[:, 1].max() - proj[:, 1].min()
        if w * h < best[0]:
            best = (w * h, float(w), float(h))
    return best[1], best[2]


def _one_polygon_stats(xs: np.ndarray, ys: np.ndarray, height: float) -> dict:
    A = ring_area(xs, ys)
    P = ring_perimeter(xs, ys)
    pts = np.column_stack([xs, ys])
    hull = convex_hull(pts)
    hull_A = ring_area(hull[:, 0], hull[:, 1]) if len(hull) >= 3 else 0.0
    hull_P = ring_perimeter(hull[:, 0], hull[:, 1]) if len(hull) >= 2 else 0.0
    r_mbc = min_bounding_circle_radius(pts)
    w_mrr, h_mrr = min_rotated_rect(pts)
    mrr_A = w_mrr * h_mrr
    mrr_P = 2 * (w_mrr + h_mrr)
    bw = xs.max() - xs.min()
    bh = ys.max() - ys.min()
    V = A * height
    J = polar_moment(xs, ys)
    return {
        "area": A,
        "perimeter": P,
        "isoperimetric_quotient": 4 * math.pi * A / (P * P) if P else np.nan,
        "isoareal_quotient": 2 * math.sqrt(math.pi * A) / P if P else np.nan,
        "minimum_bounding_circle_ratio": A / (math.pi * r_mbc**2) if r_mbc else np.nan,
        "radii_ratio": math.sqrt(A / math.pi) / r_mbc if r_mbc else np.nan,
        "diameter_ratio": (min(w_mrr, h_mrr) / max(w_mrr, h_mrr)
                           if max(w_mrr, h_mrr) else np.nan),
        "length_width_diff": bh - bw,
        "boundary_amplitude": hull_P / P if P else np.nan,
        "convex_hull_ratio": A / hull_A if hull_A else np.nan,
        "fractal_dimension": (2 * math.log(P / 4) / math.log(A)
                              if A > 0 and A != 1 and P > 0 else np.nan),
        "rectangularity": A / mrr_A if mrr_A else np.nan,
        "shape_index": math.sqrt(A / math.pi) / r_mbc if r_mbc else np.nan,
        "equivalent_rectangular_index": (
            math.sqrt(A / mrr_A) * (mrr_P / P) if mrr_A and P else np.nan
        ),
        "form_factor": A / V ** (2 / 3) if V > 0 else 0.0,
        "squareness": (4 * math.sqrt(A) / P) ** 2 if P else np.nan,
        "moment_of_inertia": J,
        "second_areal_moment": J,
        "nmi": A * A / (2 * math.pi * J) if J else np.nan,
        "moa_ratio": (math.pi * 0.5 * (P / (2 * math.pi)) ** 4 / J
                      if J else np.nan),
        "reflexive_angle_ratio": reflex_ratio(xs, ys),
    }


_STAT_COLS = list(_one_polygon_stats(
    np.array([0.0, 1, 1, 0]), np.array([0.0, 0, 1, 1]), 1.0
).keys())


def shape_stats(polygons: DataFrame, height: float = 1.0) -> DataFrame:
    """(poly_id, <15 shape measures>): vectorized per-geometry kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for row in pdf.itertuples(index=False):
                xs = np.asarray(row.xs, dtype=np.float64)
                ys = np.asarray(row.ys, dtype=np.float64)
                rows.append(_one_polygon_stats(xs, ys, height))
            out = pd.DataFrame(rows)
            out.insert(0, "poly_id", pdf["poly_id"].to_numpy())
            yield out

    schema = "poly_id long, " + ", ".join(f"{c} double" for c in _STAT_COLS)
    return polygons.select("poly_id", "xs", "ys").mapInPandas(kernel, schema=schema)


def moment_of_inertia_global(
    polygons: DataFrame, normalize: bool = False,
    ref_pt: tuple[float, float] | None = None,
) -> float:
    """Polar second moment of area of the ENTIRE collection about its
    combined centroid (reference ``shape.py:974-1060``).

    Distributed: each polygon contributes its CCW-normalized origin
    moments (A, A*cx, A*cy, Ixx0, Iyy0) from one Arrow kernel pass;
    a single global aggregate sums them and the parallel-axis shift is
    scalar driver math — no geometry ever leaves the executors.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for row in pdf.itertuples(index=False):
                xs = np.asarray(row.xs, dtype=np.float64)
                ys = np.asarray(row.ys, dtype=np.float64)
                a, cx, cy, ixx0, iyy0 = ring_moments(xs, ys)
                if a < 0:
                    a, ixx0, iyy0 = -a, -ixx0, -iyy0
                rows.append((a, a * cx, a * cy, ixx0, iyy0))
            yield pd.DataFrame(
                rows, columns=["a", "mx", "my", "ixx0", "iyy0"]
            )

    import pyspark.sql.functions as F

    agg = (
        polygons.select("xs", "ys")
        .mapInPandas(kernel,
                     "a double, mx double, my double, "
                     "ixx0 double, iyy0 double")
        .agg(F.sum("a").alias("a"), F.sum("mx").alias("mx"),
             F.sum("my").alias("my"), F.sum("ixx0").alias("ixx0"),
             F.sum("iyy0").alias("iyy0"))
        .collect()[0]
    )
    a_tot = agg["a"]
    cx, cy = agg["mx"] / a_tot, agg["my"] / a_tot
    j = (agg["ixx0"] - a_tot * cy * cy) + (agg["iyy0"] - a_tot * cx * cx)
    if ref_pt is not None:
        dx, dy = cx - ref_pt[0], cy - ref_pt[1]
        j += a_tot * (dx * dx + dy * dy)
    if normalize:
        j = a_tot * a_tot / (2 * math.pi * j)
    return float(j)


def moment_of_inertia_regions(
    polygons: DataFrame,
    region_col: str = "region",
    weight_col: str | None = None,
    normalize: bool = False,
    ref_pts: DataFrame | tuple[float, float] | None = None,
) -> DataFrame:
    """(region, J): mass moment of inertia per region (reference
    ``shape.py:637-946``), where each input geometry is a subarea of
    its region with mass ``weight_col`` (or its area when omitted —
    the second-moment-of-area case).

    Reference math, re-expressed as ONE map pass + ONE aggregate: per
    geometry the Arrow kernel emits sufficient statistics
    (a, m, m*cx, m*cy, m*|c|^2, (m/a)*Jc) with Jc the polar moment
    about the geometry's own centroid; the reference's parallel-axis
    sum J = sum((m/a)*Jc + m*d^2) about the mass centroid
    C = sum(m*c)/M folds into the aggregate because
    sum(m*d^2) = sum(m|c|^2) - |sum(m*c)|^2 / M — no second pass over
    the geometries, no per-region collect.  With a reference point r
    (global tuple or a per-region (region, rx, ry) frame, broadcast),
    sum(m*d^2) = sum(m|c|^2) - 2 r.sum(m*c) + M|r|^2 instead.
    ``normalize`` applies the reference's C_NMMI = M*A/(2*pi*J), which
    reduces to A^2/(2*pi*J) in the unweighted case — identical to the
    reference's branch split, but needing no branch here since m = a.
    """
    w_expr = F.col(weight_col) if weight_col else F.lit(None)
    src = polygons.select(
        F.col(region_col).alias("region"), w_expr.alias("_w"), "xs", "ys"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            # name=None: pandas would mangle the "_w" column in named tuples
            for region, wv, xs_l, ys_l in pdf.itertuples(index=False,
                                                         name=None):
                xs = np.asarray(xs_l, dtype=np.float64)
                ys = np.asarray(ys_l, dtype=np.float64)
                a, cx, cy, ixx0, iyy0 = ring_moments(xs, ys)
                if a < 0:
                    a, ixx0, iyy0 = -a, -ixx0, -iyy0
                jc = (ixx0 - a * cy * cy) + (iyy0 - a * cx * cx)
                m = a if wv is None or pd.isna(wv) else float(wv)
                rows.append((region, a, m, cx, cy, jc))
            yield pd.DataFrame(
                rows, columns=["region", "a", "m", "cx", "cy", "jc"]
            )

    parts = src.mapInPandas(
        kernel,
        "region long, a double, m double, cx double, cy double, jc double",
    )
    agg = parts.groupBy("region").agg(
        F.sum("a").alias("A"),
        F.sum("m").alias("M"),
        F.sum(F.col("m") * F.col("cx")).alias("sx"),
        F.sum(F.col("m") * F.col("cy")).alias("sy"),
        F.sum(F.col("m") * (F.col("cx") ** 2 + F.col("cy") ** 2)).alias("s2"),
        F.sum(F.col("m") / F.col("a") * F.col("jc")).alias("jw"),
    )
    if ref_pts is None:
        d2sum = F.col("s2") - (F.col("sx") ** 2 + F.col("sy") ** 2) / F.col("M")
    else:
        if isinstance(ref_pts, tuple):
            rx, ry = F.lit(float(ref_pts[0])), F.lit(float(ref_pts[1]))
        else:
            agg = agg.join(
                F.broadcast(ref_pts.select("region", "rx", "ry")), "region"
            )
            rx, ry = F.col("rx"), F.col("ry")
        d2sum = (
            F.col("s2") - 2.0 * rx * F.col("sx") - 2.0 * ry * F.col("sy")
            + F.col("M") * (rx ** 2 + ry ** 2)
        )
    j = F.col("jw") + d2sum
    if normalize:
        j = F.col("M") * F.col("A") / (2.0 * math.pi * j)
    return agg.select("region", j.alias("J"))
