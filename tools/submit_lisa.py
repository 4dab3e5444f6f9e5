#!/usr/bin/env python
"""spark-submit entry point for the flagship LISA pipeline.

    spark-submit [--master ...] --py-files esda_spark.zip \
        tools/submit_lisa.py --sf-dir /path/to/sf0.1 --table customer \
        --k 8 --permutations 999 --checkpoint-dir /tmp/ck --out /tmp/out

Runs points -> exact kNN(k) -> Local Moran (conditional permutation)
through the checkpoint-resumable pipeline and writes the result as
parquet; per-stage manifests (row counts per partition, fingerprint,
wall time) land next to each stage.  Uses the session spark-submit
provides — master/executors/memory come from the submit command, which
is how the same job runs at N and 4N executors on a cluster.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--table", default="customer")
    ap.add_argument("--value-col", default="y_cont")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--permutations", type=int, default=999)
    ap.add_argument("--seed", type=int, default=12345)
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("esda-lisa").getOrCreate()
    # executors import from the --py-files zip; nothing else to ship

    from esda_spark.plans.pipeline import lisa_pipeline
    from esda_spark.sources.points import points_from_table

    t0 = time.perf_counter()
    pts = points_from_table(spark, args.sf_dir, args.table).cache()
    n = pts.count()
    fp = f"{args.sf_dir}/{args.table}/{args.value_col}"
    out = lisa_pipeline(
        pts, args.value_col, k=args.k, permutations=args.permutations,
        seed=args.seed, checkpoint_dir=args.checkpoint_dir, fingerprint=fp,
    )
    out.write.mode("overwrite").parquet(args.out)
    rows = spark.read.parquet(args.out).count()
    print(json.dumps({
        "n_points": n, "result_rows": rows,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "parallelism": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
