"""Round-6 fast paths: broadcast-kernel kNN, in-core dedup closures.

Every gated fast path must agree EXACTLY with the distributed path it
replaces (the oracle only ever sees whichever side of the gate the
driver data lands on, so the cross-gate parity lives here)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from esda_spark.operators import knn_incore as KI
from esda_spark.operators import weights as W
from tests import oracle_numpy as onp


def _skewed_points(spark, seed=11, n_hot=400, n_sparse=200, dups=True):
    """One hot cluster + sparse field + exact coordinate duplicates
    (the orders-table regime that broke the first fine-halving)."""
    rng = np.random.default_rng(seed)
    hot = rng.normal(loc=(5.0, 5.0), scale=0.05, size=(n_hot, 2))
    sparse = rng.uniform(0, 100, size=(n_sparse, 2))
    xy = np.vstack([hot, sparse])
    if dups:
        # 50 points stacked on one coordinate + 3 stacked pairs
        xy[:50] = xy[0]
        xy[100:106] = np.repeat(xy[100:103], 2, axis=0)
    rows = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(xy)]
    return xy, spark.createDataFrame(rows, "id long, x double, y double")


def _edge_set(df, keep_d2=False):
    cols = ("focal", "neighbor", "d2") if keep_d2 else ("focal", "neighbor")
    return {tuple(getattr(r, c) for c in cols) for r in df.collect()}


def test_incore_vs_distributed_knn_edges(spark, monkeypatch):
    xy, pts = _skewed_points(spark)
    fast = W.knn_edges(pts, k=8, keep_d2=True)
    monkeypatch.setattr(KI, "INCORE_MAX_TARGETS", 0)
    dist = W.knn_edges(pts, k=8, keep_d2=True)
    assert _edge_set(fast, keep_d2=True) == _edge_set(dist, keep_d2=True)
    # and both equal the brute-force reference
    want = {tuple(e) for e in onp.brute_knn_edges(xy, 8)}
    assert {(f, n) for f, n, _ in _edge_set(fast, keep_d2=True)} == want


def test_incore_knn_nonbinary_weights(spark):
    xy, pts = _skewed_points(spark, n_hot=80, n_sparse=60, dups=False)
    got = {(r.focal, r.neighbor): r.weight
           for r in W.knn_edges(pts, k=4, binary=False).collect()}
    for (f, n), w in got.items():
        d = np.sqrt(((xy[f] - xy[n]) ** 2).sum())
        assert w == pytest.approx(1.0 / d, rel=1e-12)


def test_incore_vs_distributed_knn_join(spark, monkeypatch):
    from esda_spark.operators.spatial_join import knn_join

    rng = np.random.default_rng(3)
    lxy = rng.uniform(0, 50, size=(150, 2))
    rxy = rng.uniform(0, 50, size=(60, 2))
    left = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(lxy)],
        "id long, x double, y double")
    right = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(rxy)],
        "id long, x double, y double")
    fast = knn_join(left, right, k=3).select(
        "left_id", "right_id", "rank").collect()
    monkeypatch.setattr(KI, "INCORE_MAX_TARGETS", 0)
    dist = knn_join(left, right, k=3).select(
        "left_id", "right_id", "rank").collect()
    assert {tuple(r) for r in fast} == {tuple(r) for r in dist}


def test_incore_knn_join_group_div(spark, monkeypatch):
    """Same-group constraint: composite ids g*base+id, matches must
    never cross groups even when the other group's points are nearer
    — in BOTH the fast and the distributed path."""
    from esda_spark.operators.spatial_join import knn_join

    rng = np.random.default_rng(5)
    base = 1000
    rows_l, rows_r = [], []
    for g in range(3):
        pts = rng.uniform(0, 10, size=(40, 2))
        tgt = rng.uniform(0, 10, size=(8, 2)) + g * 0.001
        rows_l += [(g * base + i, float(x), float(y))
                   for i, (x, y) in enumerate(pts)]
        rows_r += [(g * base + i, float(x), float(y))
                   for i, (x, y) in enumerate(tgt)]
    left = spark.createDataFrame(rows_l, "id long, x double, y double")
    right = spark.createDataFrame(rows_r, "id long, x double, y double")

    def run():
        out = knn_join(left, right, k=1, group_div=base).collect()
        assert all(r.left_id // base == r.right_id // base for r in out)
        assert len(out) == len(rows_l)
        return {(r.left_id, r.right_id) for r in out}

    fast = run()
    monkeypatch.setattr(KI, "INCORE_MAX_TARGETS", 0)
    assert fast == run()


def test_incore_knn_tiny_and_degenerate(spark):
    # fewer targets than k: emit what exists; identical coordinates tie
    # on (d2, neighbor id)
    rows = [(0, 1.0, 1.0), (1, 1.0, 1.0), (2, 1.0, 1.0), (3, 5.0, 5.0)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    got = sorted((r.focal, r.neighbor)
                 for r in W.knn_edges(pts, k=8).collect())
    # every point gets the 3 others, ordered ties by id
    assert len(got) == 12
    assert (0, 1) in got and (0, 2) in got and (0, 3) in got


def test_minhash_dedup_groups_incore_vs_distributed(spark, monkeypatch):
    from esda_spark.operators.text import minhash_dedup_groups

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i % 7} eta theta "
             f"iota kappa lambda mu nu xi omicron pi rho")
         for i in range(80)],
        "doc_id long, text string",
    )
    fast = minhash_dedup_groups(docs, threshold=0.8).collect()
    monkeypatch.setenv("ESDA_SPARK_DEDUP_INCORE_PAIRS", "0")
    dist = minhash_dedup_groups(docs, threshold=0.8).collect()
    assert {tuple(r) for r in fast} == {tuple(r) for r in dist}


def test_near_dup_groups_incore_vs_distributed(spark, monkeypatch):
    from esda_spark.operators.similarity import near_dup_groups

    rng = np.random.default_rng(9)
    base = rng.normal(size=(30, 16))
    vecs = np.vstack([base, base + 0.001 * rng.normal(size=(30, 16))])
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    fast = near_dup_groups(emb, threshold=0.99, mode="lsh",
                           num_planes=4, num_tables=4).collect()
    monkeypatch.setenv("ESDA_SPARK_DEDUP_INCORE_PAIRS", "0")
    dist = near_dup_groups(emb, threshold=0.99, mode="lsh",
                           num_planes=4, num_tables=4).collect()
    assert {tuple(r) for r in fast} == {tuple(r) for r in dist}


def _emb_fixture(spark, n=400, dim=16, seed=4):
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(n, dim))
    return spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(V)],
        "vec_id long, embedding array<double>",
    )


def _q_of(emb, nq=10):
    return emb.where(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), "embedding")


def test_lsh_topk_incore_vs_distributed(spark, monkeypatch):
    import esda_spark.operators.similarity as S

    emb = _emb_fixture(spark)
    q = _q_of(emb)
    fast = {(r.query_id, r.vec_id, r.rank, r.sim)
            for r in S.lsh_topk(emb, q, dim=16, k=5, num_planes=5,
                                num_tables=4).collect()}
    monkeypatch.setattr(S, "_ANN_INCORE_ROWS", 0)
    dist = {(r.query_id, r.vec_id, r.rank, r.sim)
            for r in S.lsh_topk(emb, q, dim=16, k=5, num_planes=5,
                                num_tables=4).collect()}
    # bitwise parity incl. sims: the in-core scorer reproduces the
    # Catalyst sequential fold exactly (cumsum)
    assert fast == dist


def test_cosine_topk_incore_vs_distributed(spark, monkeypatch):
    import esda_spark.operators.similarity as S

    emb = _emb_fixture(spark, seed=6)
    q = _q_of(emb)
    fast = {(r.query_id, r.vec_id, r.rank)
            for r in S.cosine_topk(emb, q, k=5).collect()}
    monkeypatch.setattr(S, "_ANN_INCORE_ROWS", 0)
    dist = {(r.query_id, r.vec_id, r.rank)
            for r in S.cosine_topk(emb, q, k=5).collect()}
    # rank-level parity: both paths score with BLAS, whose LSBs are
    # shape-dependent — the operator's contract (and the ann_topk
    # oracle) is the id/rank projection
    assert fast == dist


def test_ivf_topk_incore_vs_distributed(spark, monkeypatch):
    import esda_spark.operators.similarity as S

    emb = _emb_fixture(spark, seed=8)
    q = _q_of(emb)
    centers = S.kmeans_fit(emb, k=8, max_iters=4, seed=3)
    fast = {(r.query_id, r.vec_id, r.rank, r.sim)
            for r in S.ivf_topk(emb, q, centers, k=5,
                                nprobe=2).collect()}
    monkeypatch.setattr(S, "_ANN_INCORE_ROWS", 0)
    dist = {(r.query_id, r.vec_id, r.rank, r.sim)
            for r in S.ivf_topk(emb, q, centers, k=5,
                                nprobe=2).collect()}
    assert fast == dist


def test_gather_tiles_seed_mismatch_raises(spark):
    from esda_spark.operators.crand import (
        conditional_randomization,
        gather_neighborhoods,
    )

    n = 40
    pts = spark.range(n).select(
        F.col("id"), (F.rand(1) * 10).alias("z"))
    edges = spark.createDataFrame(
        [(i, (i + 1) % n, 1.0) for i in range(n)],
        "focal long, neighbor long, weight double",
    )
    gathered = gather_neighborhoods(edges, tiles=4, seed=111)
    obs = pts.select("id", F.col("z").alias("observed"))
    with pytest.raises(ValueError, match="tiles/seed"):
        conditional_randomization(
            pts, edges, obs, "moran_local", permutations=9, seed=222,
            mode="tiled", tiles=4, gathered=gathered,
        )
