"""Changepoint and control-chart operators over keyed series.

Reference parity: the reference's anomaly surface is a fixed EWMA
z-score (sensor_data_etl.py:95-104 quantile clip + resample); these
operators extend it with the standard distribution-free changepoint
(Pettitt), control-chart (Western Electric), and band (Bollinger,
drawdown) screens, all as DataFrame window algebra — no UDFs, no
driver loops, engine-portable arithmetic (integer moments, sqrt and
a fixed number of final divisions).

Scale notes (100 TB): every operator here reduces the fact table to a
per-(key, bucket) aggregate FIRST — windows and pair joins run over
the tiny aggregated frame (days x keys), never the raw fact. Pettitt's
pair join is O(n^2) per series on that frame; bound the bucket count
(e.g. daily grain over a quarter = 90 rows/series) or pre-resample.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pettitt(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Pettitt changepoint test per series: U_t = sum_{i<=t} sum_{j>t}
    sign(x_j - x_i); the change point maximizes |U_t| (rank-based, no
    distribution assumption, PURE INTEGER throughout).

    Uses the identity U_t = -cumsum(r)_t with r_i = sum_j
    sign(x_i - x_j) over the whole series (the antisymmetric square
    cancels), so the cost is ONE within-series pair join plus a window
    cumsum — O(n^2) pairs per series on the aggregated frame.
    Tiebreak: worst |U|, then earliest order value. The final point is
    excluded (U_n == 0 by construction, not a candidate split).

    Output: key_cols..., change_point (order_col value), k_stat,
    n_candidates.
    """
    keys = list(key_cols)
    a = df.select(
        *keys, F.col(order_col).alias("__ti"), F.col(value_col).alias("__xi")
    )
    b = df.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col(order_col).alias("__tj"),
        F.col(value_col).alias("__xj"),
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (a[k] == b[f"__k_{k}"])
    r = (
        a.join(b, cond & (F.col("__ti") != F.col("__tj")))
        .groupBy(*keys, "__ti")
        .agg(
            F.sum(
                F.signum(
                    (F.col("__xi") - F.col("__xj")).cast("double")
                ).cast("bigint")
            ).alias("__r")
        )
    )
    wcum = (
        Window.partitionBy(*keys)
        .orderBy("__ti")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wpart = Window.partitionBy(*keys)
    u = (
        r.select(*keys, "__ti", (-F.sum("__r").over(wcum)).alias("__u"))
        .withColumn("__maxt", F.max("__ti").over(wpart))
        .where(F.col("__ti") != F.col("__maxt"))
    )
    wbest = Window.partitionBy(*keys).orderBy(
        F.abs(F.col("__u")).desc(), F.col("__ti")
    )
    return (
        u.withColumn("__rk", F.row_number().over(wbest))
        .withColumn("n_candidates", F.count(F.lit(1)).over(wpart).cast("bigint"))
        .where(F.col("__rk") == 1)
        .select(
            *keys,
            F.col("__ti").alias("change_point"),
            F.abs(F.col("__u")).alias("k_stat"),
            "n_candidates",
        )
    )


def _series_moments(
    value: Column, over: Window
) -> tuple[Column, Column, Column]:
    """(mean, std, var_num) from exact integer-safe moments over a
    window: mean = S1/k, std = sqrt(k*S2 - S1^2)/k."""
    k = F.count(F.lit(1)).over(over)
    s1 = F.sum(value).over(over)
    s2 = F.sum(value * value).over(over)
    var_num = (k * s2 - s1 * s1).cast("double")
    mean = s1.cast("double") / k.cast("double")
    std = F.sqrt(var_num) / k.cast("double")
    return mean, std, var_num


def spc_rules(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Western Electric control-chart rules per series: rule 1
    (|z| > 3 sigma), rule 2 (>= 2 of 3 consecutive beyond 2 sigma on
    one side), rule 4 (8 consecutive on one side of the center line).
    Center/sigma from exact whole-series moments; returns EVERY point
    with its z and rule flags (callers filter).
    """
    keys = list(key_cols)
    wall = Window.partitionBy(*keys)
    mean, std, _ = _series_moments(F.col(value_col), wall)
    z = (F.col(value_col).cast("double") - mean) / std
    base = df.select(*keys, order_col, value_col, z.alias("z"))
    wt = Window.partitionBy(*keys).orderBy(order_col)
    w3 = wt.rowsBetween(-2, 0)
    w8 = wt.rowsBetween(-7, 0)
    hi2 = F.when(F.col("z") > 2.0, 1).otherwise(0)
    lo2 = F.when(F.col("z") < -2.0, 1).otherwise(0)
    above = F.when(F.col("z") > 0.0, 1).otherwise(0)
    below = F.when(F.col("z") < 0.0, 1).otherwise(0)
    return base.select(
        *keys,
        order_col,
        value_col,
        "z",
        F.when(F.abs(F.col("z")) > 3.0, 1).otherwise(0).alias("rule1"),
        F.when(
            (F.sum(hi2).over(w3) >= 2) | (F.sum(lo2).over(w3) >= 2), 1
        ).otherwise(0).alias("rule2"),
        F.when(
            (F.sum(above).over(w8) == 8) | (F.sum(below).over(w8) == 8), 1
        ).otherwise(0).alias("rule4"),
    )


def bollinger(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    lookback: int = 7,
    n_sigma: float = 2.0,
    min_points: int = 3,
) -> DataFrame:
    """Bollinger bands per series: trailing self-exclusive mean +/-
    n_sigma from exact integer moments, with break-above/below flags.
    Bands are NULL until min_points trailing points exist."""
    keys = list(key_cols)
    wt = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-lookback, -1)
    )
    mean, std, _ = _series_moments(F.col(value_col), wt)
    k = F.count(F.lit(1)).over(wt)
    base = df.select(
        *keys,
        order_col,
        value_col,
        F.when(k >= min_points, mean).alias("mid"),
        F.when(k >= min_points, mean + F.lit(float(n_sigma)) * std).alias("hi"),
        F.when(k >= min_points, mean - F.lit(float(n_sigma)) * std).alias("lo"),
    )
    v = F.col(value_col).cast("double")
    return base.select(
        *keys,
        order_col,
        value_col,
        "mid",
        "hi",
        "lo",
        F.when(F.col("hi").isNotNull() & (v > F.col("hi")), 1)
        .otherwise(0)
        .alias("break_up"),
        F.when(F.col("lo").isNotNull() & (v < F.col("lo")), 1)
        .otherwise(0)
        .alias("break_dn"),
    )


def max_drawdown(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Maximum drawdown per series: running peak, per-point drawdown
    (peak - x)/peak, worst point with a deterministic
    worst-dd/earliest tiebreak. Running max is pure integer when the
    value is integral; ONE division per point.

    Output: key_cols..., worst_point (order_col value), trough, peak,
    max_drawdown.
    """
    keys = list(key_cols)
    wrun = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = df.select(
        *keys,
        order_col,
        F.col(value_col).alias("__v"),
        F.max(value_col).over(wrun).alias("peak"),
    ).select(
        *keys,
        order_col,
        "__v",
        "peak",
        (
            (F.col("peak") - F.col("__v")).cast("double")
            / F.col("peak").cast("double")
        ).alias("__dd"),
    )
    wbest = Window.partitionBy(*keys).orderBy(
        F.col("__dd").desc(), F.col(order_col)
    )
    return (
        dd.withColumn("__rk", F.row_number().over(wbest))
        .where(F.col("__rk") == 1)
        .select(
            *keys,
            F.col(order_col).alias("worst_point"),
            F.col("__v").alias("trough"),
            "peak",
            F.col("__dd").alias("max_drawdown"),
        )
    )
