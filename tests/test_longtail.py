import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from esda_spark.operators.shape import (
    convex_hull,
    min_bounding_circle_radius,
    min_rotated_rect,
    shape_stats,
)
from esda_spark.operators.smaup import smaup
from tests import oracle_numpy as onp


def test_smaup_reference_golden():
    # doctest golden values (reference smaup.py:60-84): stl example
    s = smaup(78, 39, 0.24365582621771659)
    assert round(s["smaup"], 6) == 0.152213
    assert round(s["critical_01"], 6) == 0.389706
    assert round(s["critical_05"], 6) == 0.355722
    assert round(s["critical_1"], 6) == 0.315795
    assert s["summary"] == "Pseudo p-value > 0.10 (H0 is not rejected)"


def test_convex_hull_and_mbc():
    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 10, size=(200, 2))
    hull = convex_hull(pts)
    # all points inside hull bbox, hull area >= any triangle area
    assert len(hull) >= 3
    r = min_bounding_circle_radius(pts)
    # every point within r of some center: check via pairwise diameter/2 bound
    from itertools import combinations

    diam = max(np.linalg.norm(a - b) for a, b in combinations(hull, 2))
    assert diam / 2 <= r + 1e-9 <= diam  # r in [diam/2, diam)
    w, h = min_rotated_rect(pts)
    assert w * h > 0
    # MRR area bounds hull area from above
    hull_area = 0.5 * abs(
        np.dot(hull[:, 0], np.roll(hull[:, 1], -1))
        - np.dot(hull[:, 1], np.roll(hull[:, 0], -1))
    )
    assert w * h >= hull_area - 1e-9


def test_shape_stats_square_and_circle(spark):
    # unit square: IPQ = pi/4, rectangularity 1, convex_hull_ratio 1
    sq = spark.createDataFrame(
        [(0, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0])],
        "poly_id long, xs array<double>, ys array<double>",
    )
    r = shape_stats(sq).collect()[0]
    assert r.area == pytest.approx(1.0)
    assert r.perimeter == pytest.approx(4.0)
    assert r.isoperimetric_quotient == pytest.approx(math.pi / 4)
    assert r.rectangularity == pytest.approx(1.0)
    assert r.convex_hull_ratio == pytest.approx(1.0)
    assert r.diameter_ratio == pytest.approx(1.0)
    assert r.minimum_bounding_circle_ratio == pytest.approx(2 / math.pi)
    # near-circle: IPQ -> 1
    t = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    circ = spark.createDataFrame(
        [(1, (np.cos(t)).tolist(), (np.sin(t)).tolist())],
        "poly_id long, xs array<double>, ys array<double>",
    )
    rc = shape_stats(circ).collect()[0]
    assert rc.isoperimetric_quotient == pytest.approx(1.0, abs=0.01)
    assert rc.minimum_bounding_circle_ratio == pytest.approx(1.0, abs=0.01)


def test_correlogram_shared_join(spark):
    from esda_spark.operators.correlogram import correlogram

    rng = np.random.default_rng(9)
    n = 100
    xy = rng.uniform(0, 50, size=(n, 2))
    y = xy[:, 0] + rng.normal(0, 5, n)  # spatially structured
    pts = spark.createDataFrame(
        [(int(i), float(x), float(yy), float(v))
         for i, ((x, yy), v) in enumerate(zip(xy, y))],
        "id long, x double, y double, y_cont double",
    )
    res = correlogram(pts, "y_cont", [5.0, 10.0, 20.0], "moran")
    assert [r["support"] for r in res] == [5.0, 10.0, 20.0]
    # autocorrelation should decay with distance band width here
    assert res[0]["I"] > res[2]["I"] > 0
    # oracle check at one support
    edges_np = onp.brute_distance_band(xy, 10.0)
    w = onp.row_standardize(edges_np, np.ones(len(edges_np)))
    want = onp.moran(y, edges_np, w)
    assert res[1]["I"] == pytest.approx(want["I"], rel=1e-10)


def test_dbscan_two_blobs(spark):
    from esda_spark.operators.adbscan import dbscan

    rng = np.random.default_rng(0)
    a = rng.normal((0, 0), 0.5, size=(60, 2))
    b = rng.normal((20, 20), 0.5, size=(60, 2))
    noise = np.array([[10.0, 10.0]])
    xy = np.vstack([a, b, noise])
    pts = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(xy)],
        "id long, x double, y double",
    )
    res = {r.id: r.cluster for r in dbscan(pts, eps=2.0, min_samples=5).collect()}
    ca = {res[i] for i in range(60)}
    cb = {res[i] for i in range(60, 120)}
    assert len(ca) == 1 and len(cb) == 1 and ca != cb
    assert res[120] == -1  # isolated noise point


def test_adbscan_ensemble(spark):
    from esda_spark.operators.adbscan import adbscan

    rng = np.random.default_rng(1)
    a = rng.normal((0, 0), 0.5, size=(150, 2))
    b = rng.normal((30, 30), 0.5, size=(150, 2))
    xy = np.vstack([a, b])
    pts = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(xy)],
        "id long, x double, y double",
    )
    res = adbscan(pts, eps=2.5, min_samples=5, pct_exact=0.5, reps=4,
                  seed=3, pct_thr=0.7).collect()
    labels = {r.id: r.lbls for r in res}
    la = {labels[i] for i in range(150)} - {-1}
    lb = {labels[i] for i in range(150, 300)} - {-1}
    assert len(la) == 1 and len(lb) == 1 and la != lb
    # strong agreement on unambiguous blobs
    assert np.mean([r.pct for r in res]) > 0.8


def test_geary_local_mv(spark):
    from esda_spark.operators.local_stats import geary_local_mv
    from esda_spark.operators.weights import lattice_edges, transform_weights

    rng = np.random.default_rng(5)
    n = 36
    y1, y2 = rng.normal(size=n), rng.normal(size=n)
    pts = spark.createDataFrame(
        [(i, float(y1[i]), float(y2[i])) for i in range(n)],
        "id long, a double, b double",
    )
    edges = transform_weights(lattice_edges(spark, 6, 6, rook=True), "R")
    res = geary_local_mv(pts, edges, ["a", "b"], permutations=49, seed=2)
    got = np.array([r.localG for r in res.orderBy("id").collect()])
    # numpy oracle
    edges_np = np.array([(r.focal, r.neighbor) for r in
                         lattice_edges(spark, 6, 6, rook=True).collect()])
    w = onp.row_standardize(edges_np, np.ones(len(edges_np)))
    z1 = (y1 - y1.mean()) / y1.std()
    z2 = (y2 - y2.mean()) / y2.std()
    want = np.zeros(n)
    for (f, nb), wi in zip(edges_np, w):
        want[f] += wi * ((z1[f] - z1[nb]) ** 2 + (z2[f] - z2[nb]) ** 2) / 2
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_moran_local_conditional(spark):
    from esda_spark.operators.local_stats import moran_local_conditional
    from esda_spark.operators.weights import lattice_edges

    rng = np.random.default_rng(8)
    n = 49
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    y = 2 * x1 - x2 + rng.normal(size=n)
    pts = spark.createDataFrame(
        [(i, float(y[i]), float(x1[i]), float(x2[i])) for i in range(n)],
        "id long, y double, x1 double, x2 double",
    )
    edges = lattice_edges(spark, 7, 7, rook=True)
    res = moran_local_conditional(pts, edges, "y", ["x1", "x2"],
                                  permutations=49, seed=4)
    rows = res.orderBy("id").collect()
    # numpy oracle: OLS residual then LISA
    yc = (y - y.mean()) / y.std()
    X = np.column_stack([x1, x2])
    X = (X - X.mean(axis=0)) / X.std(axis=0)
    D = np.column_stack([np.ones(n), X])
    beta = np.linalg.solve(D.T @ D, D.T @ yc)
    yf = yc - D @ beta
    edges_np = np.array([(r.focal, r.neighbor) for r in edges.collect()])
    w = onp.row_standardize(edges_np, np.ones(len(edges_np)))
    lag = onp.lag(n, edges_np, w, yf)
    want = (n - 1) * yf * lag / (yf @ yf)
    got = np.array([r.assoc for r in rows])
    np.testing.assert_allclose(got, want, rtol=1e-9)
    assert all(r.labels in (1, 2, 3, 4) for r in rows)
    p = np.array([r.p_sim for r in rows])
    assert ((p > 0) & (p <= 1)).all()


def test_shape_inertial_measures(spark):
    from esda_spark.operators.shape import moment_of_inertia_global

    # w x h rectangle: J = w*h*(w^2 + h^2)/12 about the centroid
    w, h = 3.0, 2.0
    rect = spark.createDataFrame(
        [(0, [0.0, w, w, 0.0], [0.0, 0.0, h, h])],
        "poly_id long, xs array<double>, ys array<double>",
    )
    r = shape_stats(rect).collect()[0]
    J = w * h * (w * w + h * h) / 12
    A, P = w * h, 2 * (w + h)
    assert r.moment_of_inertia == pytest.approx(J)
    assert r.second_areal_moment == pytest.approx(J)
    assert r.nmi == pytest.approx(A * A / (2 * math.pi * J))
    assert r.moa_ratio == pytest.approx(
        math.pi * 0.5 * (P / (2 * math.pi)) ** 4 / J)
    assert r.squareness == pytest.approx((4 * math.sqrt(A) / P) ** 2)
    assert r.reflexive_angle_ratio == 0.0

    # rotation + translation invariance of J (and CW ring gives same J)
    th = 0.7
    c, s = math.cos(th), math.sin(th)
    xs = [0.0, w, w, 0.0]
    ys = [0.0, 0.0, h, h]
    rx = [5 + c * x - s * y for x, y in zip(xs, ys)]
    ry = [9 + s * x + c * y for x, y in zip(xs, ys)]
    rot = spark.createDataFrame(
        [(0, rx, ry), (1, rx[::-1], ry[::-1])],
        "poly_id long, xs array<double>, ys array<double>",
    )
    for rr in shape_stats(rot).collect():
        assert rr.moment_of_inertia == pytest.approx(J)

    # reflex notch: CCW pentagon with one reflex vertex -> ratio 1/5
    notch = spark.createDataFrame(
        [(0, [0.0, 2.0, 2.0, 1.0, 0.0], [0.0, 0.0, 2.0, 1.0, 2.0])],
        "poly_id long, xs array<double>, ys array<double>",
    )
    rn = shape_stats(notch).collect()[0]
    assert rn.reflexive_angle_ratio == pytest.approx(0.2)

    # global moment: two unit squares side by side == one 2x1 rectangle
    two = spark.createDataFrame(
        [(0, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]),
         (1, [1.0, 2.0, 2.0, 1.0], [0.0, 0.0, 1.0, 1.0])],
        "poly_id long, xs array<double>, ys array<double>",
    )
    want = 2.0 * 1.0 * (4.0 + 1.0) / 12
    assert moment_of_inertia_global(two) == pytest.approx(want)
    # about the origin via ref_pt, parallel-axis shift: J + A*(dx^2+dy^2)
    assert moment_of_inertia_global(two, ref_pt=(0.0, 0.0)) == pytest.approx(
        want + 2.0 * (1.0 + 0.25))
    assert moment_of_inertia_global(two, normalize=True) == pytest.approx(
        4.0 / (2 * math.pi * want))


def test_lowess_correlogram(spark):
    from esda_spark.operators.correlogram import lowess_correlogram

    rng = np.random.default_rng(23)
    n = 300
    xy = rng.uniform(0, 50, size=(n, 2))
    # strong short-range spatial covariance: shared smooth field
    y = np.sin(xy[:, 0] / 8.0) + np.sin(xy[:, 1] / 8.0) \
        + rng.normal(0, 0.3, n)
    pts = spark.createDataFrame(
        [(int(i), float(x), float(yy), float(v))
         for i, ((x, yy), v) in enumerate(zip(xy, y))],
        "id long, x double, y double, y_cont double",
    )
    res = lowess_correlogram(pts, "y_cont", [3.0, 10.0, 20.0],
                             cell_size=10.0)
    vals = {r["support"]: r["lowess"] for r in res}
    # short-range covariance positive and decaying with distance
    assert vals[3.0] > 0.2
    assert vals[3.0] > vals[10.0] > vals[20.0]
    # numpy cross-check of the same estimator definition at x0=3
    z = (y - y.mean()) / y.std()
    d = np.hypot(xy[:, 0][:, None] - xy[:, 0], xy[:, 1][:, None] - xy[:, 1])
    iu = np.triu_indices(n, 1)
    dd, zz = d[iu], np.multiply.outer(z, z)[iu]
    lo, hi = 3.0 - 3.5, 20.0 + 5.0
    in_range = ((dd >= max(lo, 0)) & (dd <= hi)).sum()
    frac = in_range / len(dd) / 3
    k = max(int(round(frac * len(dd))), 2)
    ad = np.abs(dd - 3.0)
    h0 = np.sort(ad)[min(k - 1, len(ad) - 1)]
    m = ad <= h0
    w = np.clip((1 - (ad[m] / h0) ** 3) ** 3, 0, None)
    A = np.vstack([np.ones(m.sum()), dd[m]]).T
    W = np.diag(w)
    beta = np.linalg.solve(A.T @ W @ A, A.T @ W @ zz[m])
    want = beta[0] + beta[1] * 3.0
    assert vals[3.0] == pytest.approx(want, rel=0.05)


def test_moment_of_inertia_regions(spark):
    from esda_spark.operators.shape import (
        moment_of_inertia_global,
        moment_of_inertia_regions,
        ring_moments,
    )

    # two regions of rectangles (region 0: two 1x1 squares apart;
    # region 1: a 3x2 and a 1x4 rectangle), population weights
    def rect(x0, y0, w, h):
        return ([float(v) for v in (x0, x0 + w, x0 + w, x0)],
                [float(v) for v in (y0, y0, y0 + h, y0 + h)])

    geoms = [rect(0, 0, 1, 1), rect(4, 0, 1, 1),
             rect(0, 5, 3, 2), rect(6, 5, 1, 4)]
    regions = [0, 0, 1, 1]
    weights = [10.0, 30.0, 5.0, 7.0]
    rows = [(i, regions[i], weights[i], geoms[i][0], geoms[i][1])
            for i in range(4)]
    df = spark.createDataFrame(
        rows,
        "poly_id long, region long, w double, "
        "xs array<double>, ys array<double>",
    )

    def ref_oracle(normalize=False, use_w=True, ref=None):
        # reference shape.py:886-944 loop, verbatim math in numpy
        import numpy as np
        out = {}
        for reg in (0, 1):
            idx = [i for i in range(4) if regions[i] == reg]
            a = []; c = []; jc = []
            for i in idx:
                xs = np.array(geoms[i][0]); ys = np.array(geoms[i][1])
                A_, cx, cy, ixx0, iyy0 = ring_moments(xs, ys)
                if A_ < 0:
                    A_, ixx0, iyy0 = -A_, -ixx0, -iyy0
                a.append(A_); c.append([cx, cy])
                jc.append((ixx0 - A_ * cy * cy) + (iyy0 - A_ * cx * cx))
            a = np.array(a); c = np.array(c); jc = np.array(jc)
            m = np.array([weights[i] for i in idx]) if use_w else a
            A = a.sum()
            pt = np.asarray(ref) if ref is not None else (
                (m[:, None] * c).sum(0) / m.sum())
            d2 = ((c - pt) ** 2).sum(1)
            J = ((m / a) * jc + m * d2).sum()
            if normalize:
                J = m.sum() * A / (2 * math.pi * J)
            out[reg] = J
        return out

    for normalize in (False, True):
        got = {r.region: r.J for r in moment_of_inertia_regions(
            df, "region", "w", normalize=normalize).collect()}
        want = ref_oracle(normalize)
        for reg in (0, 1):
            assert got[reg] == pytest.approx(want[reg]), (normalize, reg)

    # unweighted == per-region second moment of area (global kernel)
    got_u = {r.region: r.J for r in
             moment_of_inertia_regions(df, "region").collect()}
    for reg in (0, 1):
        sub = df.where(df.region == reg)
        assert got_u[reg] == pytest.approx(moment_of_inertia_global(sub))

    # global reference point (tuple) and per-region ref frame
    got_r = {r.region: r.J for r in moment_of_inertia_regions(
        df, "region", "w", ref_pts=(1.0, 2.0)).collect()}
    want_r = ref_oracle(ref=(1.0, 2.0))
    for reg in (0, 1):
        assert got_r[reg] == pytest.approx(want_r[reg])
    refs = spark.createDataFrame(
        [(0, 1.0, 2.0), (1, 1.0, 2.0)], "region long, rx double, ry double")
    got_rf = {r.region: r.J for r in moment_of_inertia_regions(
        df, "region", "w", ref_pts=refs).collect()}
    for reg in (0, 1):
        assert got_rf[reg] == pytest.approx(want_r[reg])


def test_correlogram_knn_supports(spark):
    from esda_spark.operators.correlogram import correlogram

    rng = np.random.default_rng(11)
    n = 90
    xy = rng.uniform(0, 50, size=(n, 2))
    y = xy[:, 1] + rng.normal(0, 5, n)
    pts = spark.createDataFrame(
        [(int(i), float(x), float(yy), float(v))
         for i, ((x, yy), v) in enumerate(zip(xy, y))],
        "id long, x double, y double, y_cont double",
    )
    res = correlogram(pts, "y_cont", [3, 8], "moran", distance_type="knn")
    assert [r["support"] for r in res] == [3, 8]
    for k, r in zip((3, 8), res):
        edges_np = onp.brute_knn_edges(xy, k)
        w = onp.row_standardize(edges_np, np.ones(len(edges_np)))
        want = onp.moran(y, edges_np, w)
        assert r["I"] == pytest.approx(want["I"], rel=1e-10), k
