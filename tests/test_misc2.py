import numpy as np
import pytest
from pyspark.sql import functions as F

from esda_spark.operators.rates import spatial_filtering
from esda_spark.operators.topo import isolation
from tests import oracle_numpy as onp


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(21)
    xy = rng.uniform(0, 40, size=(120, 2))
    v = rng.normal(10, 3, 120)
    e = rng.integers(1, 30, 120).astype(float)
    b = rng.integers(40, 200, 120).astype(float)
    df = spark.createDataFrame(
        [(int(i), float(x), float(y), float(v[i]), float(e[i]), float(b[i]))
         for i, (x, y) in enumerate(xy)],
        "id long, x double, y double, y_cont double, e double, b double",
    )
    return xy, v, e, b, df


def test_isolation_vs_brute(spark, pts):
    xy, v, _, _, df = pts
    res = {r.id: (r.isolation, r.nearest_higher)
           for r in isolation(df, "y_cont", cell_size=5.0).collect()}
    n = len(xy)
    for i in range(n):
        higher = [j for j in range(n) if v[j] > v[i]]
        if not higher:
            assert res[i][0] is None, i
            continue
        d = {j: np.hypot(*(xy[j] - xy[i])) for j in higher}
        want_j = min(d, key=lambda j: (d[j], j))
        assert res[i][1] == want_j, i
        assert res[i][0] == pytest.approx(d[want_j])


def test_spatial_filtering_fixed_radius(spark, pts):
    xy, _, e, b, df = pts
    bbox = (0.0, 0.0, 40.0, 40.0)
    res = spatial_filtering(df, bbox, 5, 5, radius=8.0).collect()
    assert len(res) == 25
    for r in res:
        mask = np.hypot(xy[:, 0] - r.x, xy[:, 1] - r.y) <= 8.0
        if mask.any():
            assert r.r == pytest.approx(e[mask].sum() / b[mask].sum())
        else:
            assert r.r is None


def test_spatial_filtering_pop(spark, pts):
    xy, _, e, b, df = pts
    bbox = (0.0, 0.0, 40.0, 40.0)
    res = spatial_filtering(df, bbox, 3, 3, pop=500.0).collect()
    assert len(res) == 9
    for r in res:
        d = np.hypot(xy[:, 0] - r.x, xy[:, 1] - r.y)
        order = np.argsort(d, kind="stable")
        ce, cb = e[order].cumsum(), b[order].cumsum()
        keep = cb <= 500.0
        if not keep.any():
            want = ce[0] / cb[0]
        else:
            last = np.nonzero(keep)[0].max()
            want = ce[last] / cb[last]
        assert r.r == pytest.approx(want), (r.gid,)


def test_moran_local_partial(spark, pts):
    from esda_spark.operators.local_stats import moran_local_partial
    from esda_spark.operators.weights import lattice_edges

    rng = np.random.default_rng(17)
    n = 36
    x1 = rng.normal(size=n)
    y = 1.5 * x1 + rng.normal(size=n)
    df = spark.createDataFrame(
        [(i, float(y[i]), float(x1[i])) for i in range(n)],
        "id long, y double, x1 double",
    )
    edges = lattice_edges(spark, 6, 6, rook=True)
    res = moran_local_partial(df, edges, "y", ["x1"], permutations=49, seed=3)
    rows = res.orderBy("id").collect()
    # numpy oracle for component values
    yc = (y - y.mean()) / y.std()
    xc = (x1 - x1.mean()) / x1.std()
    D = np.column_stack([np.ones(n), yc, xc])
    DtDi = np.linalg.inv(D.T @ D)
    edges_np = np.array([(r.focal, r.neighbor) for r in edges.collect()])
    w = onp.row_standardize(edges_np, np.ones(len(edges_np)))
    Wy = onp.lag(n, edges_np, w, yc)
    left = D @ DtDi
    for j in range(3):
        want = left[:, j] * Wy * (n - 1)
        got = np.array([getattr(r, f"lmo_{j}") for r in rows])
        np.testing.assert_allclose(got, want, rtol=1e-9)
        p = np.array([getattr(r, f"p_sim_{j}") for r in rows])
        assert ((p > 0) & (p <= 1)).all()


def test_by_col(spark, pts):
    from esda_spark.operators.local_stats import by_col, moran_local
    from esda_spark.operators.weights import knn_edges

    _, _, _, _, df = pts
    edges = knn_edges(df.select("id", "x", "y"), k=4, cell_size=8.0)
    out = by_col(df, edges, moran_local, ["y_cont", "e"], permutations=0)
    cols = set(out.columns)
    assert "y_cont_moran_local_Is" in cols and "e_moran_local_Is" in cols
    assert out.count() == df.count()


def test_silhouette_alist_and_nearest_label(spark):
    from esda_spark.operators.silhouettes import nearest_label, silhouette_alist
    from esda_spark.operators.weights import knn_edges

    rng = np.random.default_rng(13)
    a = rng.normal((0, 0), 1.0, size=(30, 2))
    b = rng.normal((10, 0), 1.0, size=(30, 2))
    xy = np.vstack([a, b])
    labels_np = np.array([0] * 30 + [1] * 30)
    pts = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(xy)],
        "id long, x double, y double",
    )
    labs = spark.createDataFrame(
        [(int(i), int(l)) for i, l in enumerate(labels_np)],
        "id long, label int",
    )
    edges = knn_edges(pts, k=5, cell_size=3.0)
    sil = silhouette_alist(pts, labs, edges, ["x", "y"]).collect()
    # numpy oracle per edge
    for r in sil[:50]:
        i = r.focal
        if r.label_focal == r.label_neighbor:
            assert r.silhouette == 0.0
            continue
        d = np.hypot(xy[:, 0] - xy[i, 0], xy[:, 1] - xy[i, 1])
        own = d[labels_np == r.label_focal].mean()
        other = d[labels_np == r.label_neighbor].mean()
        want = (other - own) / max(other, own)
        assert r.silhouette == pytest.approx(want, rel=1e-9)
    nl = {r.id: (r.nearest_label, r.dissim)
          for r in nearest_label(pts, labs, ["x", "y"]).collect()}
    # with 2 well-separated clusters, nearest alternative is the other one
    for i in range(60):
        assert nl[i][0] == (1 - labels_np[i])
        d = np.hypot(xy[:, 0] - xy[i, 0], xy[:, 1] - xy[i, 1])
        other_mask = labels_np == (1 - labels_np[i])
        want = d[other_mask].sum() / max(other_mask.sum() - 1, 1)
        assert nl[i][1] == pytest.approx(want, rel=1e-9)


def test_np_mixture_smoother(spark):
    from esda_spark.operators.mixture import np_mixture_smoother

    rng = np.random.default_rng(7)
    n = 200
    # two latent rate groups
    theta = np.where(rng.random(n) < 0.5, 0.02, 0.10)
    b = rng.integers(200, 1000, n).astype(float)
    e = rng.poisson(b * theta).astype(float)
    pts = spark.createDataFrame(
        [(int(i), float(e[i]), float(b[i])) for i in range(n)],
        "id long, e double, b double",
    )
    res = np_mixture_smoother(pts, k=30).orderBy("id").collect()
    r = np.array([row.r for row in res])
    assert np.isfinite(r).all()
    # smoothing: posterior rates closer to the true rates than raw ones
    raw = e / b
    assert np.abs(r - theta).mean() <= np.abs(raw - theta).mean() + 1e-9
    # shrinks toward the two modes
    lo = r[theta == 0.02].mean()
    hi = r[theta == 0.10].mean()
    assert 0.01 < lo < 0.05 < hi < 0.15
