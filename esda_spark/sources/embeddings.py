"""Synthetic embedding fixtures for ANN validation.

Random uniform/gaussian embeddings are hyperplane LSH's worst case
(no cluster structure: every neighbor angle is ~uniform, so recall
follows the (1 - theta/pi)^p collision law at theta ~ pi/2).  Real
retrieval corpora are clustered — near neighbors subtend small angles
— which is the regime LSH is built for.  This module plants that
structure deterministically so recall can be reported for both
regimes (BENCH ``ann_lsh_recall_at_10`` vs
``ann_lsh_recall_at_10_clustered``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def synthetic_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    clusters: int | None = None,
    noise: float = 0.25,
    seed: int = 7,
) -> DataFrame:
    """(vec_id, embedding array<double>): ``n`` unit-norm vectors in
    ``clusters`` gaussian clusters (centers ~ N(0, I) normalized;
    member = normalize(center + (noise / sqrt(dim)) * N(0, I)) so the
    TOTAL perturbation norm is ~``noise`` regardless of ``dim`` —
    same-cluster cosine ~ 1/(1 + noise^2)), vec_id round-robin over
    clusters so planted near-neighbors are known by construction.

    Generated driver-side (n * dim * 8 bytes; fine through ~1e6 x 64).
    At corpus scale, generate executor-side with a counter-based
    Philox stream keyed by vec_id instead — the fixture's role here is
    validation, not ingestion.
    """
    if clusters is None:
        clusters = max(n // 100, 1)
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    members = centers[np.arange(n) % clusters] + (
        noise / np.sqrt(dim)
    ) * rng.normal(size=(n, dim))
    members /= np.linalg.norm(members, axis=1, keepdims=True)
    rows = [(int(i), members[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")
