"""Rate smoothing operators (reference ``smoothing.py``, SURVEY.md §2.3).

All are column expressions plus a handful of global aggregates and/or
one spatial lag; none needs a UDF.  Event/population columns follow the
reference's (e, b) convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from esda_spark.operators.lag import spatial_lag
from esda_spark.operators.weights import cardinalities, transform_weights


def assuncao_rate(
    points: DataFrame, e_col: str = "e", b_col: str = "b", out_col: str = "rate"
) -> DataFrame:
    """Assunção-Reis EB-standardized rate (reference ``smoothing.py:529-578``).

    Three global aggregates + pure column math.
    """
    e, b = F.col(e_col), F.col(b_col)
    agg = points.agg(
        F.sum(e_col).alias("es"), F.sum(b_col).alias("bs"),
        F.count("*").alias("n"),
    ).collect()[0]
    e_sum, b_sum, n = float(agg.es), float(agg.bs), int(agg.n)
    ebi_b = e_sum / b_sum
    s2 = (
        points.select(
            (b * (e / b - F.lit(ebi_b)) * (e / b - F.lit(ebi_b))).alias("t")
        )
        .agg(F.sum("t"))
        .collect()[0][0]
    ) / b_sum
    ebi_a = float(s2) - ebi_b / (b_sum / n)
    v_raw = F.lit(ebi_a) + F.lit(ebi_b) / b
    v = F.when(v_raw < 0, F.lit(ebi_b) / b).otherwise(v_raw)
    return points.withColumn(out_col, (e / b - F.lit(ebi_b)) / F.sqrt(v))


def excess_risk(
    points: DataFrame, e_col: str = "e", b_col: str = "b", out_col: str = "r"
) -> DataFrame:
    """r_i = (e_i/b_i) / (sum e / sum b)  (``smoothing.py:580-633``)."""
    agg = points.agg(F.sum(e_col).alias("es"), F.sum(b_col).alias("bs")).collect()[0]
    r_mean = float(agg.es) / float(agg.bs)
    return points.withColumn(
        out_col, F.col(e_col) / (F.col(b_col) * F.lit(r_mean))
    )


def empirical_bayes(
    points: DataFrame, e_col: str = "e", b_col: str = "b", out_col: str = "r"
) -> DataFrame:
    """Aspatial EB shrinkage toward the global rate (``smoothing.py:635-695``)."""
    e, b = F.col(e_col), F.col(b_col)
    agg = points.agg(
        F.sum(e_col).alias("es"), F.sum(b_col).alias("bs"),
        F.avg(b_col).alias("bm"), F.count("*").alias("n"),
    ).collect()[0]
    r_mean = float(agg.es) / float(agg.bs)
    var_left = (
        points.select(
            (b * (e / b - F.lit(r_mean)) * (e / b - F.lit(r_mean))).alias("t")
        ).agg(F.sum("t")).collect()[0][0]
    ) / float(agg.bs)
    r_var = float(var_left) - r_mean / float(agg.bm)
    rate = e / b
    weight = F.lit(r_var) / (F.lit(r_var) + F.lit(r_mean) / b)
    return points.withColumn(
        out_col, weight * rate + (1.0 - weight) * F.lit(r_mean)
    )


def spatial_rate(
    points: DataFrame, edges: DataFrame,
    e_col: str = "e", b_col: str = "b", out_col: str = "r",
) -> DataFrame:
    """r_i = (e_i + sum_j e_j)/(b_i + sum_j b_j), binary W
    (``smoothing.py:785-857``)."""
    w = transform_weights(edges, "B")
    le = spatial_lag(w, points.select("id", F.col(e_col).alias("v")), "v", "we")
    lb = spatial_lag(w, points.select("id", F.col(b_col).alias("v")), "v", "wb")
    return (
        points.join(le, "id", "left").join(lb, "id", "left")
        .withColumn(
            out_col,
            (F.col(e_col) + F.coalesce("we", F.lit(0.0)))
            / (F.col(b_col) + F.coalesce("wb", F.lit(0.0))),
        )
        .drop("we", "wb")
    )


def spatial_empirical_bayes(
    points: DataFrame, edges: DataFrame,
    e_col: str = "e", b_col: str = "b", out_col: str = "r",
) -> DataFrame:
    """EB shrinkage toward the neighborhood rate (``smoothing.py:698-782``).

    Neighborhood terms include self; the variance numerator sums
    b_j (r_j - rbar_i)^2 over the *closed* neighborhood (unweighted set
    membership), while `bi` uses the original (possibly non-binary) W.
    """
    e, b = F.col(e_col), F.col(b_col)
    rm = spatial_rate(points, edges, e_col, b_col, "r_mean").select("id", "r_mean")
    lb = spatial_lag(edges, points.select("id", F.col(b_col).alias("v")), "v", "wb")
    card = cardinalities(edges).withColumnRenamed("focal", "id")
    base = (
        points.join(rm, "id", "left")
        .join(lb, "id", "left")
        .join(card, "id", "left")
        .withColumn("bi", b + F.coalesce("wb", F.lit(0.0)))
        .withColumn("ngh_num", F.coalesce("cardinality", F.lit(0)) + F.lit(1))
    )
    # closed-neighborhood sum of b_j (r_j - rbar_i)^2 : edge-wise join
    nb = points.select(
        F.col("id").alias("neighbor"),
        (F.col(e_col) / F.col(b_col)).alias("rn"),
        F.col(b_col).alias("bn"),
    )
    focal_terms = base.select(
        F.col("id").alias("focal"), F.col("r_mean").alias("rm_f")
    )
    nbr_sum = (
        edges.join(F.broadcast(nb), "neighbor")
        .join(F.broadcast(focal_terms), "focal")
        .groupBy("focal")
        .agg(
            F.sum(
                F.col("bn") * (F.col("rn") - F.col("rm_f")) * (F.col("rn") - F.col("rm_f"))
            ).alias("vsum_n")
        )
        .withColumnRenamed("focal", "id")
    )
    out = (
        base.join(nbr_sum, "id", "left")
        .withColumn(
            "vsum",
            F.coalesce("vsum_n", F.lit(0.0))
            + b * (e / b - F.col("r_mean")) * (e / b - F.col("r_mean")),
        )
        .withColumn("r_var_left", F.col("vsum") / F.col("bi"))
        .withColumn(
            "r_var_right", F.col("r_mean") / (F.col("bi") / F.col("ngh_num"))
        )
        .withColumn(
            "r_var",
            F.greatest(F.col("r_var_left") - F.col("r_var_right"), F.lit(0.0)),
        )
        .withColumn(
            out_col,
            F.col("r_mean")
            + (e / b - F.col("r_mean"))
            * (F.col("r_var") / (F.col("r_var") + F.col("r_mean") / b)),
        )
    )
    return out.drop(
        "r_mean", "wb", "cardinality", "bi", "ngh_num", "vsum_n", "vsum",
        "r_var_left", "r_var_right", "r_var",
    )


def disk_smoother(
    points: DataFrame, edges: DataFrame,
    e_col: str = "e", b_col: str = "b", out_col: str = "r",
) -> DataFrame:
    """r_i = W(e/b)_i / sum_j w_ij  (``smoothing.py:1011-1083``)."""
    rates = points.select("id", (F.col(e_col) / F.col(b_col)).alias("v"))
    num = spatial_lag(edges, rates, "v", "num")
    den = edges.groupBy("focal").agg(F.sum("weight").alias("den")).withColumnRenamed(
        "focal", "id"
    )
    return (
        points.join(num, "id", "left").join(den, "id", "left")
        .withColumn(out_col, F.col("num") / F.col("den"))
        .drop("num", "den")
    )


def spatial_median_rate(
    points: DataFrame, edges: DataFrame,
    e_col: str = "e", b_col: str = "b", out_col: str = "r",
    iterations: int = 1,
) -> DataFrame:
    """Iterated median of the rate over the closed neighborhood
    (``smoothing.py:1086-1211``, unweighted variant).

    Each iteration: union self-edges, gather neighborhood rates, take
    the exact median per focal (numpy-convention: mean of the two
    middle order statistics for even counts).
    """
    rates = points.select("id", (F.col(e_col) / F.col(b_col)).alias("r"))
    closed = edges.select("focal", "neighbor").unionByName(
        points.select(F.col("id").alias("focal"), F.col("id").alias("neighbor"))
    )
    for _ in range(iterations):
        nb = rates.select(F.col("id").alias("neighbor"), F.col("r").alias("rn"))
        win = Window.partitionBy("focal").orderBy("rn")
        ranked = (
            closed.join(nb, "neighbor")
            .withColumn("rk", F.row_number().over(win))
            .withColumn("cnt", F.count("*").over(Window.partitionBy("focal")))
        )
        med = (
            ranked.where(
                (F.col("rk") == (F.col("cnt") + 1) / 2)
                | (F.col("rk") == F.col("cnt") / 2 + 1)
                | (F.col("rk") == F.col("cnt") / 2)
            )
            .where(
                ((F.col("cnt") % 2 == 1) & (F.col("rk") == (F.col("cnt") + 1) / 2))
                | ((F.col("cnt") % 2 == 0)
                   & ((F.col("rk") == F.col("cnt") / 2)
                      | (F.col("rk") == F.col("cnt") / 2 + 1)))
            )
            .groupBy("focal")
            .agg(F.avg("rn").alias("r"))
            .withColumnRenamed("focal", "id")
        )
        rates = points.select("id").join(med, "id", "left").select(
            "id", F.col("r")
        )
    return points.join(rates.withColumnRenamed("r", out_col), "id", "left")


def kernel_smoother(
    points: DataFrame, kernel_edges: DataFrame,
    e_col: str = "e", b_col: str = "b", out_col: str = "r",
) -> DataFrame:
    """r_i = (W_k e)_i / (W_k b)_i with kernel weights incl. self
    (``smoothing.py:859-926``; build weights with
    ``weights.kernel_edges``)."""
    le = spatial_lag(kernel_edges, points.select("id", F.col(e_col).alias("v")),
                     "v", "we")
    lb = spatial_lag(kernel_edges, points.select("id", F.col(b_col).alias("v")),
                     "v", "wb")
    return (
        points.join(le, "id", "left").join(lb, "id", "left")
        .withColumn(out_col, F.col("we") / F.col("wb"))
        .drop("we", "wb")
    )


# --- age standardization (smoothing.py:176-430) -----------------------------
# Long-format input: (id, age, e, b [, s_e, s_b, s]).  Interval estimates
# (gamma/poisson CIs) are omitted — they need inverse-gamma quantiles;
# point estimates match the reference formulas exactly.


def crude_age_standardization(
    df: DataFrame, e_col: str = "e", b_col: str = "b", unit_col: str = "id"
) -> DataFrame:
    """(id, rate): sum_age (e/b)*(b/B) = E/B per unit
    (``smoothing.py:176-226``)."""
    return df.groupBy(unit_col).agg(
        (F.sum(e_col) / F.sum(b_col)).alias("rate")
    )


def direct_age_standardization(
    df: DataFrame, e_col: str = "e", b_col: str = "b", s_col: str = "s",
    unit_col: str = "id",
) -> DataFrame:
    """(id, rate): sum_age (e/b) * (s / S) with standard population s
    (``smoothing.py:228-300``, point estimate)."""
    stot = (
        df.groupBy(unit_col).agg(F.sum(s_col).alias("S"))
    )
    return (
        df.join(stot, unit_col)
        .groupBy(unit_col)
        .agg(
            F.sum(
                (F.col(e_col) / F.col(b_col)) * (F.col(s_col) / F.col("S"))
            ).alias("rate")
        )
    )


def standardized_mortality_ratio(
    df: DataFrame, e_col: str = "e", b_col: str = "b",
    se_col: str = "s_e", sb_col: str = "s_b", unit_col: str = "id",
) -> DataFrame:
    """(id, smr): observed events / expected events, expected from the
    standard population's age-specific rates (``smoothing.py:397-430``)."""
    return df.groupBy(unit_col).agg(
        (
            F.sum(e_col)
            / F.sum(F.col(b_col) * (F.col(se_col) / F.col(sb_col)))
        ).alias("smr")
    )


def indirect_age_standardization(
    df: DataFrame, e_col: str = "e", b_col: str = "b",
    se_col: str = "s_e", sb_col: str = "s_b", unit_col: str = "id",
) -> DataFrame:
    """(id, rate): SMR * overall standard rate
    (``smoothing.py:313-396``, point estimate)."""
    tot = df.agg(
        (F.sum(se_col) / F.sum(sb_col)).alias("s_r_all")
    ).collect()[0]
    smr = standardized_mortality_ratio(df, e_col, b_col, se_col, sb_col, unit_col)
    return smr.select(
        unit_col, (F.col("smr") * F.lit(float(tot.s_r_all))).alias("rate")
    )


def spatial_filtering(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    x_grid: int,
    y_grid: int,
    radius: float | None = None,
    pop: float | None = None,
    e_col: str = "e",
    b_col: str = "b",
    max_radius: float | None = None,
) -> DataFrame:
    """Grid-sampled rate in a moving window (``smoothing.py:1212-1336``).

    Fixed-radius: rate = sum(e)/sum(b) over points within ``radius`` of
    each grid vertex (cell-candidate join, one aggregate).  Adaptive
    (``pop``): cumulative e/b over distance-sorted points until the
    population threshold, windowed per grid vertex; candidates bounded
    by ``max_radius`` (the bbox diagonal by default) — the documented
    deviation from the reference's full KDTree sort.
    """
    from esda_spark.plans.cells import expand_ring, with_cell

    if radius is None and pop is None:
        raise ValueError("Either radius or pop must be given.")
    x0, y0, x1, y1 = (float(v) for v in bbox)
    spark = points.sparkSession
    sx = (x1 - x0) / x_grid
    sy = (y1 - y0) / y_grid
    grid = spark.range(x_grid * y_grid).select(
        F.col("id").alias("gid"),
        (x0 + (F.col("id") / y_grid).cast("long") * sx).alias("x"),
        (y0 + (F.col("id") % y_grid) * sy).alias("y"),
    )
    reach = radius if radius is not None else (
        max_radius if max_radius is not None
        else ((x1 - x0) ** 2 + (y1 - y0) ** 2) ** 0.5
    )
    cell = max(reach, 1e-9)
    g = with_cell(grid, cell).withColumnRenamed("id", "gid") \
        if "id" in grid.columns else with_cell(grid, cell)
    p = with_cell(points.select("id", "x", "y", e_col, b_col), cell).select(
        F.col("x").alias("px"), F.col("y").alias("py"),
        F.col(e_col).alias("pe"), F.col(b_col).alias("pb"), F.col("cell"),
    )
    dx = F.col("x") - F.col("px")
    dy = F.col("y") - F.col("py")
    cand = (
        expand_ring(g, 1)
        .join(p, "cell")
        .select("gid", "x", "y", "pe", "pb",
                F.sqrt(dx * dx + dy * dy).alias("dist"))
        .where(F.col("dist") <= F.lit(float(reach)))
    )
    if radius is not None:
        return (
            grid.join(
                cand.groupBy("gid").agg(
                    (F.sum("pe") / F.sum("pb")).alias("r")
                ),
                "gid", "left",
            )
            .select("gid", "x", "y", "r")
        )
    win = Window.partitionBy("gid").orderBy("dist")
    cum = (
        cand.withColumn("ce", F.sum("pe").over(win))
        .withColumn("cb", F.sum("pb").over(win))
        .withColumn("rn", F.row_number().over(win))
    )
    # last cumulative row with cb <= pop; fall back to the nearest point
    keep = cum.where((F.col("cb") <= F.lit(float(pop))) | (F.col("rn") == 1))
    wlast = Window.partitionBy("gid").orderBy(F.desc("rn"))
    last = (
        keep.withColumn("rk", F.row_number().over(wlast))
        .where(F.col("rk") == 1)
        .select("gid", (F.col("ce") / F.col("cb")).alias("r"))
    )
    return grid.join(last, "gid", "left").select("gid", "x", "y", "r")
