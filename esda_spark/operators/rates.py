"""Rate smoothing operators (reference ``smoothing.py``, SURVEY.md §2.3).

All are column expressions plus a handful of global aggregates and/or
one spatial lag; none needs a UDF.  Event/population columns follow the
reference's (e, b) convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    iterations: int = 1, aw_col: str | None = None,
) -> DataFrame:
    """Iterated (weighted) median of the rate over the closed
    neighborhood (``smoothing.py:1086-1211``).

    Unweighted: exact median per focal (numpy-convention: mean of the
    two middle order statistics for even counts).  With ``aw_col``
    (auxiliary weights, e.g. the population base): the reference's
    ``weighted_median`` (``smoothing.py:83-130``) — sort neighborhood
    rates, first value whose cumulative weight reaches half the total;
    exact-half boundary averages with the next order statistic.  One
    window over (focal) per iteration either way.
    """
    rates = points.select("id", (F.col(e_col) / F.col(b_col)).alias("r"))
    if aw_col is not None:
        aws = points.select(F.col("id").alias("neighbor"),
                            F.col(aw_col).alias("awn"))
    closed = edges.select("focal", "neighbor").unionByName(
        points.select(F.col("id").alias("focal"), F.col("id").alias("neighbor"))
    )
    for _ in range(iterations):
        nb = rates.select(F.col("id").alias("neighbor"), F.col("r").alias("rn"))
        win = Window.partitionBy("focal").orderBy("rn", "neighbor")
        if aw_col is None:
            ranked = (
                closed.join(nb, "neighbor")
                .withColumn("rk", F.row_number().over(win))
                .withColumn("cnt",
                            F.count("*").over(Window.partitionBy("focal")))
            )
            med = (
                ranked.where(
                    ((F.col("cnt") % 2 == 1)
                     & (F.col("rk") == (F.col("cnt") + 1) / 2))
                    | ((F.col("cnt") % 2 == 0)
                       & ((F.col("rk") == F.col("cnt") / 2)
                          | (F.col("rk") == F.col("cnt") / 2 + 1)))
                )
                .groupBy("focal")
                .agg(F.avg("rn").alias("r"))
                .withColumnRenamed("focal", "id")
            )
        else:
            cum = F.sum("awn").over(
                win.rowsBetween(Window.unboundedPreceding, 0)
            )
            tot = F.sum("awn").over(Window.partitionBy("focal"))
            ranked = (
                closed.join(nb, "neighbor").join(aws, "neighbor")
                .withColumn("cum", cum)
                .withColumn("tot", tot)
                .withColumn("nxt", F.lead("rn").over(win))
                .withColumn("prevcum", F.lag("cum").over(win))
            )
            med = (
                ranked.where(
                    (F.col("cum") >= F.col("tot") / 2)
                    & (F.col("prevcum").isNull()
                       | (F.col("prevcum") < F.col("tot") / 2))
                )
                .select(
                    F.col("focal").alias("id"),
                    F.when(
                        (F.col("cum") == F.col("tot") / 2)
                        & F.col("nxt").isNotNull(),
                        (F.col("rn") + F.col("nxt")) / 2.0,
                    ).otherwise(F.col("rn")).alias("r"),
                )
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


def choynowski(
    df: DataFrame, e_col: str = "e", b_col: str = "b",
    unit_col: str = "id", threshold: float | None = None,
) -> DataFrame:
    """(id, p): Choynowski (1959) map probabilities
    (``smoothing.py:470-527``).

    expected_i = (sum E / sum B) * b_i; p_i = Pois.cdf(e_i, expected_i)
    when e_i <= expected_i else 1 - Pois.cdf(e_i - 1, expected_i);
    values >= ``threshold`` zeroed if given.  The Poisson CDF is the
    regularized upper incomplete gamma (mathx) inside an Arrow batch.
    """
    per = df.groupBy(unit_col).agg(
        F.sum(e_col).alias("_e"), F.sum(b_col).alias("_b")
    )
    tot = per.agg(F.sum("_e").alias("te"), F.sum("_b").alias("tb")).collect()[0]
    r_all = float(tot.te) / float(tot.tb)

    from esda_spark.functions.mathx import poisson_cdf

    @F.pandas_udf(T.DoubleType())
    def _choy(e: pd.Series, exp: pd.Series) -> pd.Series:
        ev = e.to_numpy(np.float64)
        xv = exp.to_numpy(np.float64)
        low = poisson_cdf(ev, xv)
        high = 1.0 - poisson_cdf(ev - 1.0, xv)
        return pd.Series(np.where(ev <= xv, low, high))

    out = per.select(
        unit_col,
        _choy(F.col("_e"), F.lit(r_all) * F.col("_b")).alias("p"),
    )
    if threshold:
        out = out.withColumn(
            "p", F.when(F.col("p") < threshold, F.col("p")).otherwise(0.0)
        )
    return out


def direct_age_standardization_ci(
    df: DataFrame, e_col: str = "e", b_col: str = "b", s_col: str = "s",
    unit_col: str = "id", alpha: float = 0.05,
) -> DataFrame:
    """(id, rate, lower, upper): direct standardization with the
    reference's gamma interval estimates (``smoothing.py:292-311``).

    Per unit: aw = (1/b)(s/S); rate = sum e*aw; var = sum e*aw^2;
    lower ~ Gamma(rate^2/var, var/rate); upper shifts both by
    k = max(aw) (Fay-Feuer).  rate = 0 -> (0, chi2.ppf(1-a/2, 2)/2)
    (the reference calls ``chi2.ppf`` without a df - a latent bug on
    this branch; df=2 is the standard exact-Poisson zero-count limit).
    """
    stot = df.groupBy(unit_col).agg(F.sum(s_col).alias("_stot"))
    aw = (F.lit(1.0) / F.col(b_col)) * (F.col(s_col) / F.col("_stot"))
    agg = (
        df.join(stot, unit_col)
        .groupBy(unit_col)
        .agg(
            F.sum(F.col(e_col) * aw).alias("rate"),
            F.sum(F.col(e_col) * aw * aw).alias("var"),
            F.max(aw).alias("k"),
        )
    )

    from esda_spark.functions.mathx import chi2_ppf, gamma_ppf

    @F.pandas_udf(T.DoubleType())
    def _lower(r: pd.Series, v: pd.Series) -> pd.Series:
        rv, vv = r.to_numpy(np.float64), v.to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = gamma_ppf(alpha / 2.0, rv * rv / vv, vv / rv)
        return pd.Series(np.where(rv == 0, 0.0, out))

    @F.pandas_udf(T.DoubleType())
    def _upper(r: pd.Series, v: pd.Series, kk: pd.Series) -> pd.Series:
        rv = r.to_numpy(np.float64)
        vv = v.to_numpy(np.float64)
        kv = kk.to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = gamma_ppf(
                1.0 - alpha / 2.0,
                (rv + kv) ** 2 / (vv + kv * kv),
                (vv + kv * kv) / (rv + kv),
            )
        zero_up = 0.5 * float(chi2_ppf(1.0 - 0.5 * alpha, 2.0))
        return pd.Series(np.where(rv == 0, zero_up, out))

    return agg.select(
        unit_col, "rate",
        _lower(F.col("rate"), F.col("var")).alias("lower"),
        _upper(F.col("rate"), F.col("var"), F.col("k")).alias("upper"),
    )


def indirect_age_standardization_ci(
    df: DataFrame, e_col: str = "e", b_col: str = "b",
    se_col: str = "s_e", sb_col: str = "s_b", unit_col: str = "id",
    alpha: float = 0.05,
) -> DataFrame:
    """(id, rate, lower, upper): indirect standardization with the
    reference's log-normal SMR interval (``smoothing.py:381-394``):
    sd(log SMR) = 1/sqrt(E_i); bounds = exp(log SMR -+ z*sd) * R."""
    from esda_spark.functions.mathx import norm_ppf

    tot = df.agg((F.sum(se_col) / F.sum(sb_col)).alias("sr")).collect()[0]
    s_r_all = float(tot.sr)
    z = float(norm_ppf(1.0 - 0.5 * alpha))
    agg = df.groupBy(unit_col).agg(
        F.sum(e_col).alias("_e"),
        F.sum(F.col(b_col) * (F.col(se_col) / F.col(sb_col))).alias("_exp"),
    )
    smr = F.col("_e") / F.col("_exp")
    sd = F.lit(1.0) / F.sqrt(F.col("_e"))
    return agg.select(
        unit_col,
        (smr * F.lit(s_r_all)).alias("rate"),
        (F.exp(F.log(smr) - F.lit(z) * sd) * F.lit(s_r_all)).alias("lower"),
        (F.exp(F.log(smr) + F.lit(z) * sd) * F.lit(s_r_all)).alias("upper"),
    )


def age_adjusted_smoother(
    df: DataFrame, edges: DataFrame,
    e_col: str = "e", b_col: str = "b", s_col: str = "s",
    unit_col: str = "id", age_col: str = "age",
) -> DataFrame:
    """(id, rate): Age_Adjusted_Smoother (``smoothing.py:928-1008``).

    Per age group, events and populations are binary-lagged over the
    weights (one edge join + grouped sum keyed on (focal, age)), then
    direct age standardization runs on the smoothed values with the
    unit's own standard population.  If the weights carry no self
    edges, add them first to mirror kernel weights' diagonal.
    """
    long = df.select(
        F.col(unit_col).alias("id"), F.col(age_col).alias("age"),
        F.col(e_col).alias("_e"), F.col(b_col).alias("_b"),
        F.col(s_col).alias("_s"),
    )
    nb = long.select(
        F.col("id").alias("neighbor"), F.col("age").alias("age"),
        F.col("_e").alias("_en"), F.col("_b").alias("_bn"),
    )
    lagged = (
        edges.select("focal", "neighbor").join(nb, "neighbor")
        .groupBy("focal", "age")
        .agg(F.sum("_en").alias("_el"), F.sum("_bn").alias("_bl"))
        .withColumnRenamed("focal", "id")
    )
    smoothed = long.select("id", "age", "_s").join(lagged, ["id", "age"])
    return direct_age_standardization(
        smoothed, e_col="_el", b_col="_bl", s_col="_s", unit_col="id"
    )
