import numpy as np
import pytest
from pyspark.sql import functions as F

from esda_spark.operators import local_stats as ls
from esda_spark.operators.weights import lattice_edges
from tests import oracle_numpy as onp


@pytest.fixture(scope="module")
def fx(spark):
    rng = np.random.default_rng(7)
    n = 64
    y = rng.normal(5, 2, n)
    x2 = rng.normal(0, 1, n)
    ybin = (rng.random(n) < 0.4).astype(float)
    zbin = (rng.random(n) < 0.4).astype(float)
    rows = [
        (int(i), float(y[i]), float(x2[i]), float(ybin[i]), float(zbin[i]))
        for i in range(n)
    ]
    pts = spark.createDataFrame(
        rows, "id long, y_cont double, x2 double, y_bin double, z_bin double"
    )
    edges = lattice_edges(spark, 8, 8, rook=True)
    edges_np = np.array([(r.focal, r.neighbor) for r in edges.collect()])
    return {"y": y, "x2": x2, "ybin": ybin, "zbin": zbin, "pts": pts,
            "edges": edges, "edges_np": edges_np, "n": n}


def _collect_by_id(df, col):
    rows = df.orderBy("id").collect()
    return np.array([getattr(r, col) for r in rows], dtype=float)


def test_moran_local_observed_and_quads(fx):
    res = ls.moran_local(fx["pts"], fx["edges"], "y_cont",
                         permutations=99, seed=3).cache()
    w = onp.row_standardize(fx["edges_np"], np.ones(len(fx["edges_np"])))
    want = onp.moran_local(fx["y"], fx["edges_np"], w)
    np.testing.assert_allclose(_collect_by_id(res, "Is"), want["Is"], rtol=1e-10)
    np.testing.assert_array_equal(
        _collect_by_id(res, "q").astype(int), want["q"]
    )
    p = _collect_by_id(res, "p_sim")
    assert ((p > 0) & (p <= 1)).all()


def test_moran_local_moments(fx):
    # Sokal 1998 conditional/total moments vs direct numpy evaluation
    res = ls.moran_local(fx["pts"], fx["edges"], "y_cont", permutations=0)
    w = onp.row_standardize(fx["edges_np"], np.ones(len(fx["edges_np"])))
    n = fx["n"]
    y = fx["y"]
    z = (y - y.mean()) / y.std()
    m2 = (z * z).sum() / n
    wi = np.zeros(n)
    wi2 = np.zeros(n)
    for (f, _), wgt in zip(fx["edges_np"], w):
        wi[f] += wgt
        wi2[f] += wgt * wgt
    EIc = -(z**2 * wi) / ((n - 1) * m2)
    VIc = (z / m2) ** 2 * (n / (n - 2.0)) * (wi2 - wi**2 / (n - 1.0)) * (
        m2 - z**2 / (n - 1.0)
    )
    EI = -wi / (n - 1)
    np.testing.assert_allclose(_collect_by_id(res, "EIc"), EIc, rtol=1e-10)
    np.testing.assert_allclose(_collect_by_id(res, "VIc"), VIc, rtol=1e-10)
    np.testing.assert_allclose(_collect_by_id(res, "EI"), EI, rtol=1e-10)


def test_moran_local_deterministic(fx):
    a = ls.moran_local(fx["pts"], fx["edges"], "y_cont", permutations=99, seed=3)
    b = ls.moran_local(
        fx["pts"].repartition(7), fx["edges"].repartition(5), "y_cont",
        permutations=99, seed=3,
    )
    np.testing.assert_array_equal(
        _collect_by_id(a, "p_sim"), _collect_by_id(b, "p_sim")
    )


def test_geary_local_observed(fx):
    # reference Geary_Local uses the connectivity as given; row-standardize
    # first (the documented usage, geary_local.py docstring)
    from esda_spark.operators.weights import transform_weights

    res = ls.geary_local(
        fx["pts"], transform_weights(fx["edges"], "R"),
        "y_cont", permutations=49, seed=5,
    )
    w = onp.row_standardize(fx["edges_np"], np.ones(len(fx["edges_np"])))
    want = onp.geary_local(fx["y"], fx["edges_np"], w)
    np.testing.assert_allclose(_collect_by_id(res, "localG"), want, rtol=1e-10)


def test_g_local_observed_and_moments(fx):
    res = ls.g_local(fx["pts"], fx["edges"], "y_cont", star=False,
                     transform="B", permutations=49, seed=5)
    want = onp.g_local(fx["y"], fx["edges_np"], np.ones(len(fx["edges_np"])),
                       star=False)
    np.testing.assert_allclose(_collect_by_id(res, "Gs"), want["Gs"], rtol=1e-10)
    np.testing.assert_allclose(_collect_by_id(res, "Zs"), want["Zs"], rtol=1e-10)


def test_g_local_star(fx):
    res = ls.g_local(fx["pts"], fx["edges"], "y_cont", star=True,
                     transform="B", permutations=0)
    # star: self-edge weight 1; oracle with explicit self edges
    edges_star = np.vstack(
        [fx["edges_np"], np.array([(i, i) for i in range(fx["n"])])]
    )
    want = onp.g_local(fx["y"], edges_star, np.ones(len(edges_star)), star=True)
    np.testing.assert_allclose(_collect_by_id(res, "Gs"), want["Gs"], rtol=1e-10)
    np.testing.assert_allclose(_collect_by_id(res, "Zs"), want["Zs"], rtol=1e-10)


def test_ljc_lattice_golden(spark):
    # Golden array from reference tests/test_ljc.py:22-31: lat2W(4,4),
    # y=[0]*8+[1]*8 -> [0,0,0,0,0,0,0,0,2,3,3,2,2,3,3,2]; p NaN where LJC=0.
    y = [0.0] * 8 + [1.0] * 8
    pts = spark.createDataFrame(
        [(i, v) for i, v in enumerate(y)], "id long, y_bin double"
    )
    edges = lattice_edges(spark, 4, 4, rook=True)
    res = ls.join_counts_local(pts, edges, "y_bin", permutations=99, seed=1)
    got = _collect_by_id(res, "LJC")
    np.testing.assert_array_equal(
        got, [0, 0, 0, 0, 0, 0, 0, 0, 2, 3, 3, 2, 2, 3, 3, 2]
    )
    rows = res.orderBy("id").collect()
    assert all(r.p_sim is None for r in rows[:8])
    assert all(r.p_sim is not None for r in rows[8:])


def test_ljc_bv_and_mv(fx):
    bjc = ls.join_counts_local_bv(fx["pts"], fx["edges"], "y_bin", "z_bin",
                                  case="BJC", permutations=49, seed=2)
    clc = ls.join_counts_local_bv(fx["pts"], fx["edges"], "y_bin", "z_bin",
                                  case="CLC", permutations=49, seed=2)
    x, z = fx["ybin"], fx["zbin"]
    bjc_want = np.zeros(fx["n"])
    clc_want = np.zeros(fx["n"])
    for f, nb in fx["edges_np"]:
        bjc_want[f] += (x[f] == 1) & (z[f] == 0) & (x[nb] == 0) & (z[nb] == 1)
        clc_want[f] += (x[f] == 1) & (z[f] == 1) & (x[nb] == 1) & (z[nb] == 1)
    np.testing.assert_array_equal(_collect_by_id(bjc, "LJC"), bjc_want)
    np.testing.assert_array_equal(_collect_by_id(clc, "LJC"), clc_want)
    mv = ls.join_counts_local_mv(fx["pts"], fx["edges"], ["y_bin", "z_bin"],
                                 permutations=0)
    mv_want = np.zeros(fx["n"])
    prod = x * z
    for f, nb in fx["edges_np"]:
        mv_want[f] += (prod[f] == 1) & (prod[nb] == 1)
    np.testing.assert_array_equal(_collect_by_id(mv, "MCLC"), mv_want)


def test_lee_local_observed(fx):
    res = ls.lee_local(fx["pts"], fx["edges"], "y_cont", "x2", permutations=49,
                       seed=9)
    n = fx["n"]
    w = onp.row_standardize(fx["edges_np"], np.ones(len(fx["edges_np"])))
    zx = (fx["y"] - fx["y"].mean()) / fx["y"].std()
    zy = (fx["x2"] - fx["x2"].mean()) / fx["x2"].std()
    want = onp.lag(n, fx["edges_np"], w, zx) * onp.lag(n, fx["edges_np"], w, zy)
    np.testing.assert_allclose(_collect_by_id(res, "L"), want, rtol=1e-10)


def test_losh(fx):
    res = ls.losh(fx["pts"], fx["edges"], "y_cont")
    w = onp.row_standardize(fx["edges_np"], np.ones(len(fx["edges_np"])))
    want = onp.losh(fx["y"], fx["edges_np"], w)
    np.testing.assert_allclose(_collect_by_id(res, "Hi"), want["Hi"], rtol=1e-10)
    np.testing.assert_allclose(_collect_by_id(res, "VarHi"), want["VarHi"],
                               rtol=1e-10)
    p = _collect_by_id(res, "pval")
    assert ((p >= 0) & (p <= 1)).all()


def test_crand_alternatives_invariants(fx):
    # significance invariants (reference tests/test_significance.py:18-54)
    from esda_spark.operators.crand import conditional_randomization
    from esda_spark.operators.weights import transform_weights

    pts, edges = fx["pts"], fx["edges"]
    agg = pts.agg(F.avg("y_cont"), F.stddev_pop("y_cont")).collect()[0]
    z = pts.select(
        "id", ((F.col("y_cont") - agg[0]) / agg[1]).alias("z")
    )
    w = transform_weights(edges, "R")
    obs = ls.moran_local(pts, edges, "y_cont", permutations=0).select(
        "id", F.col("Is").alias("observed")
    )
    ps = {}
    for alt in ["two-sided", "lesser", "greater", "directed", "folded"]:
        ps[alt] = _collect_by_id(
            conditional_randomization(z, w, obs, "moran_local",
                                      permutations=99, seed=42, alternative=alt),
            "p_sim",
        )
    k = 99
    for alt, p in ps.items():
        assert ((p > 0) & (p <= 1)).all(), alt
    assert (ps["directed"] <= ps["two-sided"] + 1e-12).all()
    np.testing.assert_allclose(
        ps["lesser"] + ps["greater"], 1.0 + 1.0 / (k + 1), rtol=1e-12
    )
    assert (
        (np.abs(ps["directed"] - ps["lesser"]) < 1e-12)
        | (np.abs(ps["directed"] - ps["greater"]) < 1e-12)
    ).all()


def test_crand_moment_columns(fx):
    # z_sim/p_z_sim parity: E/V from keep=True sims rows must equal the
    # streaming accumulators' E_sim/V_sim (reference moran.py:1386-1399)
    res = ls.moran_local(
        fx["pts"], fx["edges"], "y_cont", permutations=199, seed=5,
        keep_simulations=True, moments=True,
    ).orderBy("id").collect()
    from esda_spark.functions.mathx import norm_sf

    for r in res[::5]:
        sims = np.array(r.sims)
        assert r.E_sim == pytest.approx(sims.mean(), rel=1e-9)
        assert r.V_sim == pytest.approx(sims.var(), rel=1e-9, abs=1e-15)
        if sims.std() > 0:
            want_z = (r.Is - sims.mean()) / sims.std()
            assert r.z_sim == pytest.approx(want_z, rel=1e-9)
            assert r.p_z_sim == pytest.approx(float(norm_sf(abs(want_z))),
                                              rel=1e-9)


def test_crand_streaming_moments_match_keep(fx):
    # streaming path (keep=False) computes E/V via accumulators; compare
    from esda_spark.operators.crand import conditional_randomization
    from esda_spark.operators.weights import transform_weights

    pts, edges = fx["pts"], fx["edges"]
    agg = pts.agg(F.avg("y_cont"), F.stddev_pop("y_cont")).collect()[0]
    z = pts.select("id", ((F.col("y_cont") - agg[0]) / agg[1]).alias("z"))
    w = transform_weights(edges, "R")
    obs = ls.moran_local(pts, edges, "y_cont", permutations=0).select(
        "id", F.col("Is").alias("observed"))
    a = conditional_randomization(z, w, obs, "moran_local", permutations=99,
                                  seed=42, moments=True)
    b = conditional_randomization(z, w, obs, "moran_local", permutations=99,
                                  seed=42, moments=True, keep=True,
                                  alternative="two-sided")
    ea = _collect_by_id(a, "E_sim"); eb = _collect_by_id(b, "E_sim")
    va = _collect_by_id(a, "V_sim"); vb = _collect_by_id(b, "V_sim")
    np.testing.assert_allclose(ea, eb, rtol=1e-9)
    np.testing.assert_allclose(va, vb, rtol=1e-9, atol=1e-15)


def test_crand_tiled_mode_parity(spark):
    # tiled tile-conditional nulls should be statistically equivalent to
    # full conditional permutation: per-site p-values highly correlated,
    # and significant/insignificant calls mostly agree
    from esda_spark.operators.crand import conditional_randomization
    from esda_spark.operators.weights import knn_edges, transform_weights

    rng = np.random.default_rng(11)
    n = 400
    xy = rng.uniform(0, 100, size=(n, 2))
    # spatially autocorrelated field: smooth ramp + noise
    y = xy[:, 0] / 20.0 + rng.normal(0, 1, n)
    pts = spark.createDataFrame(
        [(int(i), float(x), float(yy), float(v))
         for i, ((x, yy), v) in enumerate(zip(xy, y))],
        "id long, x double, y double, y_cont double",
    )
    edges = knn_edges(pts, k=6, cell_size=20.0)
    w = transform_weights(edges, "R")
    mu, sd = float(y.mean()), float(y.std())
    z = pts.select("id", ((F.col("y_cont") - mu) / sd).alias("z"))
    obs = ls.moran_local(pts, edges, "y_cont", permutations=0).select(
        "id", F.col("Is").alias("observed"))
    full = _collect_by_id(
        conditional_randomization(z, w, obs, "moran_local",
                                  permutations=499, seed=9), "p_sim")
    tiled = _collect_by_id(
        conditional_randomization(z, w, obs, "moran_local",
                                  permutations=499, seed=9,
                                  mode="tiled", tiles=4), "p_sim")
    assert len(tiled) == n
    assert ((tiled > 0) & (tiled <= 1)).all()
    r = np.corrcoef(full, tiled)[0, 1]
    assert r > 0.9, r
    agree = ((full <= 0.05) == (tiled <= 0.05)).mean()
    assert agree > 0.9, agree


def test_crand_tiled_moments_and_keep(spark):
    from esda_spark.operators.crand import conditional_randomization
    from esda_spark.operators.weights import knn_edges, transform_weights

    rng = np.random.default_rng(19)
    n = 200
    xy = rng.uniform(0, 60, size=(n, 2))
    y = rng.normal(0, 1, n)
    pts = spark.createDataFrame(
        [(int(i), float(x), float(yy), float(v))
         for i, ((x, yy), v) in enumerate(zip(xy, y))],
        "id long, x double, y double, y_cont double",
    )
    edges = knn_edges(pts, k=5, cell_size=15.0)
    w = transform_weights(edges, "R")
    z = pts.select("id", (F.col("y_cont") / float(y.std())).alias("z"))
    obs = ls.moran_local(pts, edges, "y_cont", permutations=0).select(
        "id", F.col("Is").alias("observed"))
    res = conditional_randomization(
        z, w, obs, "moran_local", permutations=99, seed=3,
        mode="tiled", tiles=3, moments=True, keep=True,
        alternative="two-sided",
    ).orderBy("id").collect()
    assert len(res) == n
    for r in res[::11]:
        sims = np.array(r.sims)
        assert len(sims) == 99
        assert r.E_sim == pytest.approx(sims.mean(), rel=1e-9)
        assert r.V_sim == pytest.approx(sims.var(), rel=1e-9, abs=1e-15)
        assert 0 < r.p_sim <= 1

def test_crand_tiled_gathered_exact_parity(spark):
    # the precomputed-gather tiled path must be BIT-identical to the
    # in-call gather: same tiling + same per-tile permutation stream
    # (this is what lets multi-call fits reuse one gather at scale)
    from esda_spark.operators.crand import (
        conditional_randomization,
        gather_neighborhoods,
    )
    from esda_spark.operators.weights import knn_edges, transform_weights

    rng = np.random.default_rng(23)
    n = 300
    xy = rng.uniform(0, 80, size=(n, 2))
    y = rng.normal(0, 1, n)
    pts = spark.createDataFrame(
        [(int(i), float(x), float(yy), float(v))
         for i, ((x, yy), v) in enumerate(zip(xy, y))],
        "id long, x double, y double, y_cont double",
    )
    edges = knn_edges(pts, k=5, cell_size=20.0)
    # drop one site's edges entirely -> island exercises the
    # empty-wlist lookup in the gathered kernel
    island = 7
    edges = edges.where(
        (F.col("focal") != island) & (F.col("neighbor") != island)
    )
    w = transform_weights(edges, "R")
    z = pts.select("id", (F.col("y_cont") / float(y.std())).alias("z"))
    obs = ls.moran_local(pts, edges, "y_cont", permutations=0).select(
        "id", F.col("Is").alias("observed"))

    def run(**kw):
        res = conditional_randomization(
            z, w, obs, "moran_local", permutations=99, seed=5,
            mode="tiled", tiles=3, moments=True, **kw,
        ).orderBy("id").toPandas()
        return res

    plain = run()
    # persist = the recommended reuse pattern (keeps tile partitioning);
    # the tile-less localCheckpoint covers the re-tile projection path
    tiled_gather = gather_neighborhoods(w, tiles=3, seed=5).persist()
    tiled_gather.count()
    flat_gather = gather_neighborhoods(w).localCheckpoint(eager=True)
    for g in (tiled_gather, flat_gather):
        got = run(gathered=g)
        assert list(got["id"]) == list(plain["id"])
        for col in ("p_sim", "E_sim", "V_sim"):
            np.testing.assert_array_equal(
                got[col].to_numpy(), plain[col].to_numpy(), err_msg=col
            )
