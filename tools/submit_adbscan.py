#!/usr/bin/env python
"""spark-submit entry point for the checkpoint-resumable fused ADBSCAN.

    spark-submit [--master ...] --py-files esda_spark.zip \
        tools/submit_adbscan.py --sf-dir /path/to/sf0.1 --table orders \
        --eps 0.5 --min-samples 20 --reps 8 \
        --checkpoint-dir /tmp/adb_ck --out /tmp/adb_out

Runs the fused-ensemble ADBSCAN (all draws in one job chain) with its
two expensive phases (fused DBSCAN labels, 1-NN extension) staged
through parquet manifests — a killed run re-submitted with the same
arguments resumes from the last completed phase.  Master / executor
sizing comes from the submit command (the N vs 4N cluster story).

``--table synthetic:N`` draws N deterministic synthetic points instead
of reading a parquet table (arbitrary-scale runs with no input files).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--table", default="orders")
    ap.add_argument("--eps", type=float, required=True)
    ap.add_argument("--min-samples", type=int, default=20)
    ap.add_argument("--pct-exact", type=float, default=0.1)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--pct-thr", type=float, default=0.9)
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("esda-adbscan").getOrCreate()

    from esda_spark.operators.adbscan import adbscan

    t0 = time.perf_counter()
    if args.table.startswith("synthetic:"):
        from esda_spark.sources.points import synthetic_points

        pts = synthetic_points(spark, int(args.table.split(":")[1])).cache()
    else:
        from esda_spark.sources.points import points_from_table

        pts = points_from_table(spark, args.sf_dir, args.table).cache()
    n = pts.count()
    fp = f"{args.sf_dir}/{args.table}"
    out = adbscan(
        pts, eps=args.eps, min_samples=args.min_samples,
        pct_exact=args.pct_exact, reps=args.reps, seed=args.seed,
        pct_thr=args.pct_thr, checkpoint_dir=args.checkpoint_dir,
        fingerprint=fp,
    )
    out.write.mode("overwrite").parquet(args.out)
    res = spark.read.parquet(args.out)
    rows = res.count()
    clusters = res.where(res.lbls != -1).select("lbls").distinct().count()
    print(json.dumps({
        "n_points": n, "result_rows": rows, "clusters": clusters,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "parallelism": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
