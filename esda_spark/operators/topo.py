"""Topological isolation (reference ``topo.py:84-167``).

``isolation``: for every point, the distance to the nearest point with
a strictly higher value.  The reference builds an incremental rtree
over descending values; here it is the same doubling-ring candidate
join as the kNN builder with the ``higher-value`` predicate pushed
into the candidate filter — peaks (no higher value anywhere) get NULL,
matching the reference's NaN for the global maximum.

``prominence`` (reference ``topo.py:170-377``): the reference's own
algorithm is a sequential sweep over the descending-elevation order
maintaining peak/saddle state — inherently order-dependent.  The Spark
form mirrors :func:`path_silhouette`'s framing: connected components
(Pregel min-label propagation) are the parallel unit and each
component's sweep runs inside one ``cogroup().applyInPandas`` task;
``to_elevation`` (``topo.py:378-427``) is pure column math with one
global aggregate.  A single world-spanning component degrades to one
task — documented; pre-partition (e.g. drop ocean-crossing edges)
for continental-scale graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from esda_spark.plans.cells import expand_ring, with_cell


def isolation(
    points: DataFrame,
    value_col: str = "y_cont",
    cell_size: float = 1.0,
    max_rounds: int = 12,
) -> DataFrame:
    """(id, isolation, nearest_higher): distance to nearest strictly
    higher-valued point; NULLs for the global maximum."""
    pts = with_cell(points.select("id", "x", "y", value_col), cell_size)
    targets = with_cell(points.select("id", "x", "y", value_col), cell_size).select(
        F.col("id").alias("nid"), F.col("x").alias("nx"),
        F.col("y").alias("ny"), F.col(value_col).alias("nv"), F.col("cell"),
    )
    unsettled = pts
    results = []
    radius = 1
    for _ in range(max_rounds):
        guard = float(radius * cell_size)
        world = radius * cell_size > 400.0
        if world:
            cand = F.broadcast(unsettled.drop("cell")).crossJoin(
                targets.drop("cell")
            )
        else:
            cand = expand_ring(
                unsettled.withColumnRenamed("cell", "cell0"), radius
            ).join(targets, "cell")
        dx = F.col("x") - F.col("nx")
        dy = F.col("y") - F.col("ny")
        cand = (
            cand.where(F.col("nv") > F.col(value_col))
            .select("id", "nid", F.sqrt(dx * dx + dy * dy).alias("dist"))
        )
        win = Window.partitionBy("id").orderBy("dist", "nid")
        best = (
            cand.withColumn("rk", F.row_number().over(win))
            .where(F.col("rk") == 1)
            .withColumn("_settled", F.lit(world) | (F.col("dist") < guard))
            .localCheckpoint(eager=True)
        )
        results.append(
            best.where(F.col("_settled")).select(
                "id", F.col("dist").alias("isolation"),
                F.col("nid").alias("nearest_higher"),
            )
        )
        settled_ids = best.where(F.col("_settled")).select("id")
        unsettled = unsettled.join(settled_ids, "id", "left_anti")
        if world:
            break
        if unsettled.isEmpty():
            break
        radius *= 4
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return points.select("id").join(out, "id", "left")


def to_elevation(
    points: DataFrame, value_cols: list[str], out_col: str = "elev",
    middle: str = "mean",
) -> DataFrame:
    """Elevation per reference ``topo.py:378-427``: 1 column -> value
    minus global min; p columns -> euclidean distance from the center
    of mass (``middle`` = mean/median), minus its min."""
    if len(value_cols) == 1:
        mn = points.agg(F.min(value_cols[0])).collect()[0][0]
        return points.withColumn(
            out_col, F.col(value_cols[0]) - F.lit(float(mn))
        )
    if middle == "mean":
        center = points.agg(
            *[F.avg(c).alias(c) for c in value_cols]
        ).collect()[0]
    elif middle == "median":
        center = points.agg(
            *[F.median(c).alias(c) for c in value_cols]
        ).collect()[0]
    else:
        raise ValueError(f"unsupported middle: {middle}")
    d = sum(
        (F.col(c) - F.lit(float(center[c]))) ** 2 for c in value_cols
    )
    with_d = points.withColumn("_d", F.sqrt(d))
    mn = with_d.agg(F.min("_d")).collect()[0][0]
    return with_d.withColumn(out_col, F.col("_d") - F.lit(float(mn))).drop("_d")


def prominence(
    points: DataFrame,
    edges: DataFrame,
    value_col: str = "y_cont",
    max_component: int = 200_000,
) -> DataFrame:
    """(id, prominence, classification, predecessor, keycol,
    dominating_peak): topographic prominence (reference
    ``topo.py:170-377``).

    Elevation = value - global min (reference ``to_elevation`` on 1-D
    input).  Per connected component, the reference's descending sweep
    runs sequentially inside one task: a node is a *peak* if no
    already-processed neighbor exists, a *key col* (saddle, prominence
    0) if it joins >= 2 peak subtrees not all previously merged, else a
    *slope* (prominence null).  A peak's prominence is its elevation
    minus its key col's elevation; the component's highest peak keeps
    its full elevation.  Tie-break: descending elevation, then id
    (deterministic; the reference's unstable argsort is seed-dependent
    on exact ties).  Reference quirks preserved: candidate peak lists
    keep peak-discovery order, a multi-peak slope attaches to the
    smallest candidate peak id (scipy ``mode`` over a unique list), a
    key col's dominating peak is the LAST-discovered joined peak.
    """
    import numpy as np
    import pandas as pd

    from esda_spark.operators.silhouettes import _connected_components

    mn = points.agg(F.min(value_col)).collect()[0][0]
    elev = points.select(
        "id", (F.col(value_col) - F.lit(float(mn))).alias("elev")
    )
    und = edges.select("focal", "neighbor").unionByName(
        edges.select(F.col("neighbor").alias("focal"),
                     F.col("focal").alias("neighbor"))
    ).distinct()
    comp = _connected_components(und).localCheckpoint(eager=True)
    nodes = (
        elev.join(comp, "id", "left")
        .withColumn("comp", F.coalesce("comp", F.col("id")))  # islands
    )
    e_comp = (
        und.join(comp.select(F.col("id").alias("focal"),
                             F.col("comp").alias("_ec")), "focal")
        .select(F.col("_ec").alias("comp"), "focal", "neighbor")
    )

    def sweep(key, nodes_pdf, edges_pdf):
        n = len(nodes_pdf)
        if n == 0:
            return pd.DataFrame({
                "id": [], "prominence": [], "classification": [],
                "predecessor": [], "keycol": [], "dominating_peak": [],
            })
        if n > max_component:
            raise ValueError(
                f"prominence component of size {n} exceeds "
                f"max_component={max_component}; pre-partition the graph"
            )
        ids = nodes_pdf["id"].to_numpy(np.int64)
        X = nodes_pdf["elev"].to_numpy(np.float64)
        idx = {v: i for i, v in enumerate(ids)}
        adj: list[list[int]] = [[] for _ in range(n)]
        for f, nb in zip(edges_pdf["focal"].to_numpy(),
                         edges_pdf["neighbor"].to_numpy()):
            adj[idx[f]].append(idx[nb])
        order = sorted(range(n), key=lambda i: (-X[i], ids[i]))
        peaks: list[int] = []
        assessed: set[int] = set()
        prom = np.full(n, np.nan)
        dominating = np.full(n, -1, dtype=np.int64)
        preds = np.full(n, -1, dtype=np.int64)
        keycols = np.full(n, -1, dtype=np.int64)
        classes = [None] * n
        key_cols: dict[tuple, int] = {}
        for i in order:
            value = X[i]
            nbr_preds = {preds[j] for j in adj[i]}
            cand = [p for p in peaks if p in nbr_preds and p >= 0]
            joins_new = not set(cand).issubset(assessed)
            if tuple(cand) in key_cols:
                cls = "slope"
            elif len(cand) == 0:
                cls = "peak"
            elif len(cand) >= 2 and joins_new:
                cls = "keycol"
            else:
                cls = "slope"
            classes[i] = cls
            if cls == "keycol":
                key_cols[tuple(cand)] = i
                dominating[i] = cand[-1]
                preds[i] = cand[-1]
                prom[i] = 0.0
                for pk in cand:
                    if pk in assessed:
                        continue
                    keycols[pk] = i
                    prom[pk] -= value
                    assessed.add(pk)
            elif cls == "peak":
                previous = peaks[-1] if peaks else i
                peaks.append(i)
                dominating[i] = previous
                preds[i] = i
                prom[i] = X[i]
            else:
                best = cand[0] if len(cand) == 1 else min(cand)
                dominating[i] = best
                preds[i] = best
        def back(arr):
            return np.where(arr >= 0, ids[np.maximum(arr, 0)], -1)
        return pd.DataFrame({
            "id": ids,
            "prominence": prom,
            "classification": classes,
            "predecessor": back(preds),
            "keycol": back(keycols),
            "dominating_peak": back(dominating),
        })

    return (
        nodes.groupBy("comp")
        .cogroup(e_comp.groupBy("comp"))
        .applyInPandas(
            sweep,
            "id long, prominence double, classification string, "
            "predecessor long, keycol long, dominating_peak long",
        )
    )
