"""Conditional-randomization engine — the one custom physical operator.

Re-expression of the reference engine (``crand.py:59-243`` driver,
``compute_chunk`` ``crand.py:246-351``, ``vec_permutations``
``crand.py:29-56``) in Spark's execution model:

1. One shared (permutations, max_cardinality) table of ids sampled
   from [0, n-1) is generated on the driver from ``seed`` and
   broadcast — identical tactic to the reference's shared permutation
   table, preserving its "one table reused for every site" semantics.
2. The full standardized value vector ``z`` (n doubles, or (n,2) for
   bivariate statistics) is broadcast.  This caps the operator at
   ~1e8-1e9 sites per executor-heap; beyond that the documented
   deviation is tile-conditional permutation (permute within salted
   spatial tiles).  At 1e8 sites the broadcast is 800 MB — fine for
   cluster executors.
3. The per-site neighborhood (sorted neighbor weights) is gathered
   with ``groupBy(focal).agg(sort_array(collect_list(...)))`` — the
   shuffle plays the role of the reference's joblib chunking
   (``crand.py:360-459``); one Arrow batch ≈ one chunk.
4. A ``mapInPandas`` kernel evaluates all k simulations for a site
   batch with NO per-site 3-D gather: the reference's masked draw
   ``z_no_i[P] = z[P + (P >= i)]`` (``_prepare_univariate``,
   ``crand.py:584-592``) decomposes into a site-independent part plus
   a boolean correction,

       lag_i = w_i @ z[P].T  +  einsum(P >= i, z[P+1]-z[P], w_i)

   so each chunk is one BLAS matmul + one einsum over an (m,k,c)
   boolean — the hot path never materializes an (m,k,c) float gather.

The RNG stream is ``numpy.random.default_rng(seed)`` rather than the
reference's numba ``np.random.choice`` — draws are statistically
equivalent but not bit-identical (SURVEY.md §7 hard part #1); seeds
are pinned and outputs deterministic across runs and partitionings.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esda_spark.operators.significance import permutation_significance

# Element budget for the (m, k, c) boolean block per vectorized chunk.
_CHUNK_ELEMS = 8_000_000


class _LagFactory:
    """Per-chunk helper: masked-draw lag matrices for any value vector.

    For sites ``i`` (m,), shared draw table ``P`` (k, c), padded weights
    ``w`` (m, c):  lag(v)[i, k] = sum_c w[i,c] * v_no_i[P[k,c]].
    """

    def __init__(self, P: np.ndarray, i_sel: np.ndarray, w: np.ndarray):
        self.P = P
        self.w = w
        self.b = P[None, :, :] >= i_sel[:, None, None]
        self.rowsum = w.sum(axis=1)

    def lag(self, v: np.ndarray) -> np.ndarray:
        vlo = v[self.P]
        dv = v[self.P + 1] - vlo
        return self.w @ vlo.T + np.einsum(
            "mkc,kc,mc->mk", self.b, dv, self.w
        )


# --- stat kernels -----------------------------------------------------------
# Each kernel: (i, z, lf, self_w, scaling) -> (m, k) simulated statistics
#   i: (m,) site ids    z: (n,) or (n, v) broadcast values
#   lf: _LagFactory     self_w: (m,)


def _k_moran_local(i, z, lf, self_w, scaling):
    # reference _moran_local_crand (moran.py:3073-3078)
    zi = z[i]
    return zi[:, None] * (lf.lag(z) + (self_w * zi)[:, None]) * scaling


def _k_moran_local_bv(i, z, lf, self_w, scaling):
    # reference _moran_local_bv_crand (moran.py:3063-3070); permutes zy only
    zx, zy = z[:, 0], z[:, 1]
    return zx[i][:, None] * (lf.lag(zy) + (self_w * zy[i])[:, None]) * scaling


def _k_geary_local(i, z, lf, self_w, scaling):
    # reference _local_geary (geary_local.py:221-225):
    # (zi - zr)^2 @ w = zi^2*rowsum - 2*zi*lag(z) + lag(z^2)
    zi = z[i]
    return (
        (zi * zi * lf.rowsum)[:, None]
        - 2.0 * zi[:, None] * lf.lag(z)
        + lf.lag(z * z)
    )


def _k_g_local(i, z, lf, self_w, scaling):
    # reference _g_local_crand (getisord.py:570-574); scaling = y.sum()
    return lf.lag(z) / (scaling - z[i])[:, None]


def _k_g_local_star(i, z, lf, self_w, scaling):
    # reference _g_local_star_crand (getisord.py:577-582)
    return (lf.lag(z) + (self_w * z[i])[:, None]) / scaling


def _k_ljc_uni(i, z, lf, self_w, scaling):
    # reference _ljc_uni (join_counts_local.py:214-219)
    return z[i][:, None] * lf.lag(z)


def _k_ljc_bv_case1(i, z, lf, self_w, scaling):
    # reference _ljc_bv_case1 (join_counts_local_bv.py:294-300):
    # x_i * (z_rand @ w), permuting only the second (z) column
    return z[:, 0][i][:, None] * lf.lag(z[:, 1])


def _k_ljc_bv_case2(i, z, lf, self_w, scaling):
    # reference _ljc_bv_case2 (join_counts_local_bv.py:303-306):
    # z_i * ((x_rand * z_rand) @ w) — joint draws share indices, so the
    # product column permutes as one vector
    return z[:, 1][i][:, None] * lf.lag(z[:, 0] * z[:, 1])


def _k_lee_local(i, z, lf, self_w, scaling):
    # reference Spatial_Pearson_Local.fit loop (lee.py:213-231)
    return lf.lag(z[:, 0]) * lf.lag(z[:, 1]) * (scaling if scaling else 1.0)


def _k_geary_local_mv(i, z, lf, self_w, scaling):
    # reference geary_local_mv.py:199-211: joint draws of all variables
    nv = z.shape[1]
    out = None
    for v in range(nv):
        zv = z[:, v]
        zi = zv[i]
        term = (
            (zi * zi * lf.rowsum)[:, None]
            - 2.0 * zi[:, None] * lf.lag(zv)
            + lf.lag(zv * zv)
        )
        out = term if out is None else out + term
    return out / nv


KERNELS = {
    "moran_local": _k_moran_local,
    "moran_local_bv": _k_moran_local_bv,
    "geary_local": _k_geary_local,
    "g_local": _k_g_local,
    "g_local_star": _k_g_local_star,
    "ljc_uni": _k_ljc_uni,
    "ljc_bv_case1": _k_ljc_bv_case1,
    "ljc_bv_case2": _k_ljc_bv_case2,
    "lee_local": _k_lee_local,
    "geary_local_mv": _k_geary_local_mv,
}


def vec_permutations(max_card: int, n: int, k: int, seed: int) -> np.ndarray:
    """Shared (k, max_card) permutation-id table, ids in [0, n-1)
    (reference ``vec_permutations``, crand.py:29-56)."""
    rng = np.random.default_rng(seed)
    out = np.empty((k, max_card), dtype=np.int64)
    for r in range(k):
        out[r] = rng.choice(n - 1, size=max_card, replace=False)
    return out


def conditional_randomization(
    values: DataFrame,
    edges: DataFrame,
    observed: DataFrame,
    stat_func: str,
    permutations: int = 999,
    seed: int = 12345,
    scaling: float | None = None,
    island_weight: float = 0.0,
    alternative: str = "directed",
    keep: bool = False,
) -> DataFrame:
    """Per-site pseudo p-values under conditional permutation.

    values:   (id, z) or (id, zx, zy, ...) with dense ids 0..n-1
    edges:    transformed weight edges; self-loops become self-weights
    observed: (id, observed) — the statistic being tested
    Returns (id, p_sim [, sims array<double>]).
    """
    kernel = KERNELS[stat_func]
    spark = values.sparkSession
    sc = spark.sparkContext

    zcols = [c for c in values.columns if c != "id"]
    pdf = values.orderBy("id").toPandas()
    n = len(pdf)
    if not (pdf["id"].values == np.arange(n)).all():
        raise ValueError("conditional_randomization requires dense ids 0..n-1")
    z_np = pdf[zcols].to_numpy(dtype=np.float64)
    if z_np.shape[1] == 1:
        z_np = z_np[:, 0]

    if scaling is None:
        if z_np.ndim == 1:
            scaling = (n - 1) / float((z_np * z_np).sum())
        else:
            scaling = (n - 1) / float((z_np[:, 0] ** 2).sum())

    others = edges.where(F.col("focal") != F.col("neighbor"))
    selfw = (
        edges.where(F.col("focal") == F.col("neighbor"))
        .select(F.col("focal").alias("id"), F.col("weight").alias("self_weight"))
    )
    max_card = (
        others.groupBy("focal").count().agg(F.max("count")).collect()[0][0] or 1
    )
    perm_table = vec_permutations(int(max_card), n, permutations, seed)

    z_bc = sc.broadcast(z_np)
    perm_bc = sc.broadcast(perm_table)

    gathered = (
        others.groupBy("focal")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(neighbor, weight))),"
                " s -> s.weight)"
            ).alias("wlist")
        )
        .withColumnRenamed("focal", "id")
    )
    parallelism = max(sc.defaultParallelism, 8)
    base = (
        observed.join(gathered, "id", "left")
        .join(selfw, "id", "left")
        .select(
            "id", "observed",
            F.coalesce("wlist", F.array()).alias("wlist"),
            F.coalesce("self_weight", F.lit(0.0)).alias("self_weight"),
        )
        .repartition(parallelism)  # the kernel is CPU-bound: spread it
    )

    out_schema = "id long, p_sim double" + (", sims array<double>" if keep else "")
    kw = dict(
        scaling=float(scaling), island_weight=float(island_weight),
        alternative=alternative, keep=keep, permutations=permutations,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        z = z_bc.value
        P = perm_bc.value
        k = kw["permutations"]
        for pdf_b in batches:
            m_all = len(pdf_b)
            if m_all == 0:
                continue
            ids = pdf_b["id"].to_numpy(np.int64)
            obs = pdf_b["observed"].to_numpy(np.float64)
            selfws = pdf_b["self_weight"].to_numpy(np.float64)
            wl = pdf_b["wlist"].tolist()
            cards = np.array([len(wi) for wi in wl], dtype=np.int64)
            # islands: single fake neighbor at island_weight (crand.py:333-339)
            wl = [
                np.asarray(wi, dtype=np.float64)
                if len(wi) else np.array([kw["island_weight"]])
                for wi in wl
            ]
            cards = np.maximum(cards, 1)
            p_out = np.empty(m_all, dtype=np.float64)
            sims_out = [None] * m_all if kw["keep"] else None
            order = np.argsort(cards, kind="stable")
            pos = 0
            while pos < m_all:
                c_max = int(cards[order[min(pos, m_all - 1)]])
                m_chunk = max(1, _CHUNK_ELEMS // max(k * c_max, 1))
                sel = order[pos:pos + m_chunk]
                c_max = int(cards[sel].max())
                pos += len(sel)
                i_sel = ids[sel]
                wpad = np.zeros((len(sel), c_max))
                for r, s in enumerate(sel):
                    wpad[r, : cards[s]] = wl[s][:c_max]
                lf = _LagFactory(P[:, :c_max], i_sel, wpad)
                sims = kernel(i_sel, z, lf, selfws[sel], kw["scaling"])
                p_out[sel] = permutation_significance(
                    obs[sel], sims, kw["alternative"]
                )
                if kw["keep"]:
                    for r, s in enumerate(sel):
                        sims_out[s] = sims[r].tolist()
            res = {"id": ids, "p_sim": p_out}
            if kw["keep"]:
                res["sims"] = sims_out
            yield pd.DataFrame(res)

    return base.mapInPandas(run, schema=out_schema)
