"""Checkpoint-resumable flagship pipelines (north rule: a killed run
resumes from the last completed stage via the per-stage manifest).

Thin compositions of the operators with :func:`esda_spark.plans.
checkpoint.stage` threaded between the expensive phases.  Each stage's
fingerprint chains the caller's input fingerprint with the stage
parameters, so changing k / permutations / seed (or the input data's
fingerprint) invalidates exactly the stages downstream of the change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from esda_spark.plans.checkpoint import stage


def lisa_pipeline(
    points: DataFrame,
    value_col: str,
    k: int,
    permutations: int,
    seed: int,
    checkpoint_dir: str,
    fingerprint: str,
) -> DataFrame:
    """points -> exact kNN(k) edges -> Local Moran with conditional
    permutation, both stages parquet-materialized with manifests.

    Re-invoking after a kill skips every stage whose manifest
    fingerprint matches: a run killed during the LISA phase reuses the
    finished kNN stage instead of rebuilding the graph.
    """
    from esda_spark.operators.local_stats import moran_local
    from esda_spark.operators.weights import knn_edges

    spark = points.sparkSession
    fp_edges = f"{fingerprint}|knn k={k}"
    edges = stage(
        spark, f"{checkpoint_dir}/edges", fp_edges,
        lambda: knn_edges(points, k=k),
    )
    fp_lisa = f"{fp_edges}|moran_local {value_col} p={permutations} s={seed}"
    return stage(
        spark, f"{checkpoint_dir}/lisa", fp_lisa,
        lambda: moran_local(points, edges, value_col,
                            permutations=permutations, seed=seed),
    )


def dedup_pipeline(
    docs: DataFrame,
    num_hashes: int,
    bands: int,
    checkpoint_dir: str,
    fingerprint: str,
) -> DataFrame:
    """documents -> MinHash signatures -> LSH candidate pairs ->
    exact n-gram Jaccard on candidates, each stage resumable."""
    from esda_spark.operators.text import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    spark = docs.sparkSession
    fp_sig = f"{fingerprint}|minhash h={num_hashes}"
    sigs = stage(
        spark, f"{checkpoint_dir}/minhash", fp_sig,
        lambda: minhash_signatures(docs, num_hashes=num_hashes),
    )
    fp_pairs = f"{fp_sig}|lsh b={bands}"
    pairs = stage(
        spark, f"{checkpoint_dir}/pairs", fp_pairs,
        lambda: lsh_candidate_pairs(sigs, num_hashes, bands),
    )
    fp_jac = f"{fp_pairs}|ngram_jaccard"
    return stage(
        spark, f"{checkpoint_dir}/jaccard", fp_jac,
        lambda: ngram_jaccard_pairs(docs, pairs),
    )
