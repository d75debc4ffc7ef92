"""Distribution-drift and sequential-change diagnostics over series —
the monitoring layer of a training-data pipeline (did this source's
value distribution move since the reference snapshot? where exactly did
a series' level shift?).

The reference's closest surface is its global approxQuantile profiling
(/root/reference/sensor_data_etl.py:95-98); these operators are the
grouped, engine-portable, two-sample generalizations. All three follow
the repo's exact-moment discipline (operators/profile.py:exact_corr):
aggregate in decimals/integers (order-independent, map-side partials),
convert to double once, finish with a fixed IEEE epilogue — so results
hash-match across engines and runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def _int_scaled(col: str, decimals: int) -> Column:
    """value → exact integer (10^decimals scale) via decimal cast."""
    return (
        F.col(col).cast(f"decimal(18,{decimals})") * (10 ** decimals)
    ).cast("decimal(19,0)")


def tvd_drift(
    df: DataFrame,
    value_col: str,
    is_reference: Column,
    by: Sequence[str] | None = None,
    n_bins: int = 10,
) -> DataFrame:
    """Total-variation distance between the reference and current value
    distributions, per group: ``TVD = ½ Σ_bins |p_i − q_i|`` over an
    equi-width binning fit on the REFERENCE rows.

    TVD instead of PSI/KL: with counts a_i (ref) and b_i (cur),
    ``TVD = Σ|a_i·n_cur − b_i·n_ref| / (2·n_ref·n_cur)`` — the numerator
    is exact integer arithmetic and the single final division is one
    correctly-rounded double op, so the statistic is bit-reproducible
    across engines and partitionings. PSI's per-bin ln() is only
    ~1-ulp-accurate in any engine and its sum is order-sensitive.
    TVD ∈ [0, 1]: 0 = identical binned distributions, 1 = disjoint.

    Current-period values outside the reference range clamp into the
    edge bins (standard drift-monitoring practice — mass beyond the
    reference support is itself drift signal, and an open-ended bin
    keeps it counted).

    Plan shape: one scan computes per-group reference bounds (tiny
    frame, broadcast back); one scan bins every row map-side and
    aggregates (group, bin, side) counts; the per-bin |·| sum is over
    the small binned frame. Two full scans, no row-level shuffle of the
    fact table beyond the final small aggregations.

    Output: [*by], n_ref, n_cur, tvd (NULL when either side is empty).
    """
    keys = list(by) if by else []
    v = F.col(value_col).cast("double")
    ref_flag = is_reference
    base = df.where(F.col(value_col).isNotNull()).select(
        *keys, v.alias("__v"), ref_flag.cast("boolean").alias("__ref")
    )
    bounds = (
        base.where(F.col("__ref"))
        .groupBy(*keys)
        .agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    )
    joined = (
        base.join(F.broadcast(bounds), keys)
        if keys
        else base.crossJoin(F.broadcast(bounds))
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    bin_ = (
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.greatest(
                F.least(
                    F.floor((F.col("__v") - F.col("__lo")) / width),
                    F.lit(n_bins - 1),
                ),
                F.lit(0),
            )
        )
        .cast("int")
    )
    binned = joined.groupBy(*keys, bin_.alias("__bin")).agg(
        F.sum(F.when(F.col("__ref"), 1).otherwise(0)).cast(_D38).alias("__a"),
        F.sum(F.when(~F.col("__ref"), 1).otherwise(0)).cast(_D38).alias("__b"),
    )
    # Σ|a_i·n_cur − b_i·n_ref| needs the group totals on every bin row.
    # A self-join of `binned` against its own groupBy would recompute
    # the whole fact-table scan on the second branch (no plan reuse
    # across differing projections); a window over the TINY binned
    # frame (groups × bins rows) keeps the fact table at exactly two
    # scans total.
    from pyspark.sql.window import Window

    wg = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    with_tot = binned.select(
        *keys,
        "__a",
        "__b",
        F.sum("__a").over(wg).cast("long").alias("n_ref"),
        F.sum("__b").over(wg).cast("long").alias("n_cur"),
    )
    agg_num = with_tot.groupBy(*keys).agg(
        F.sum(
            F.abs(
                F.col("__a") * F.col("n_cur").cast(_D38)
                - F.col("__b") * F.col("n_ref").cast(_D38)
            )
        ).alias("__num"),
        F.first("n_ref").alias("n_ref"),
        F.first("n_cur").alias("n_cur"),
    )
    tvd = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        F.col("__num").cast("double")
        / (
            F.lit(2.0)
            * F.col("n_ref").cast("double")
            * F.col("n_cur").cast("double")
        ),
    )
    return agg_num.select(*keys, "n_ref", "n_cur", tvd.alias("tvd"))


def acf(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    max_lag: int = 5,
    order_cols: Sequence[str] | None = None,
    decimals: int = 2,
) -> DataFrame:
    """Per-series autocorrelation function: Pearson corr(x_t, x_{t+k})
    for k = 1..max_lag.

    One window pass computes ALL lags (lead(v, 1..K) share the same
    sort), a stack() unpivots to (series, lag, x, y) pairs, and the
    exact-moment corr epilogue (operators/profile.py:exact_corr)
    finishes per (series, lag) — order-independent decimal sums, one
    double conversion after the n·Sxy − Sx·Sy cancellation.

    The window orders by (ts, *order_cols) — pass a tiebreaker column
    when timestamps can repeat within a series, otherwise lead() picks
    an arbitrary (non-reproducible) ordering among ties.

    Output: [*key_cols], lag, n, acf — n is the pair count (series
    length − lag); acf NULL when a side is constant or n < 2.
    """
    from pyspark.sql.window import Window

    keys = list(key_cols)
    order = [ts_col, *(order_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    leads = df.select(
        *keys,
        F.col(value_col).alias("__x"),
        *[
            F.lead(value_col, k).over(w).alias(f"__y{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    stack_expr = ", ".join(f"{k}, __x, __y{k}" for k in range(1, max_lag + 1))
    pairs = leads.selectExpr(
        *keys, f"stack({max_lag}, {stack_expr}) as (lag, __x, __y)"
    ).where(F.col("__y").isNotNull() & F.col("__x").isNotNull())
    xi = _int_scaled("__x", decimals)
    yi = _int_scaled("__y", decimals)
    sums = pairs.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast(_D38)).alias("__sx"),
        F.sum(yi.cast(_D38)).alias("__sy"),
        F.sum((xi * xi).cast(_D38)).alias("__sxx"),
        F.sum((yi * yi).cast(_D38)).alias("__syy"),
        F.sum((xi * yi).cast(_D38)).alias("__sxy"),
    )
    nd = F.col("n").cast("decimal(12,0)")
    cov_n = (nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    var_x = (nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    var_y = (nd * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    denom = F.sqrt(var_x) * F.sqrt(var_y)
    return sums.select(
        *keys, "lag", "n", F.when(denom > 0, cov_n / denom).alias("acf")
    )


def cusum(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    threshold: float = 3.0,
    order_cols: Sequence[str] | None = None,
    decimals: int = 2,
) -> DataFrame:
    """Standardized CUSUM level-shift detection per series:
    ``S_k = Σ_{i≤k} (x_i − μ) / σ`` with μ, σ the series' own mean and
    population std; rows where ``|S_k| > threshold·√n`` are flagged
    (the √n scaling keeps the threshold comparable across series
    lengths — under H₀, S_k at k≈n has std ≈ √n·fraction).

    Bit-reproducible without summing doubles in window order:
    ``S_k = (n·P_k − k·Sx) / √(n·Sxx − Sx²)`` where P_k is the RUNNING
    exact-decimal prefix sum and (n, Sx, Sxx) are whole-series decimal
    moments — every subtraction happens in exact integer arithmetic
    and only the final quotient touches IEEE doubles. (A running
    double sum would be order-deterministic too, but engines disagree
    on the last bits of repeated addition; the exact form removes the
    question.)

    One window pass (running sum + row index share one sort) + one
    broadcast-joined per-series aggregate. Output: [*key_cols], ts, k
    (1-based position), value, cusum, breach.
    """
    from pyspark.sql.window import Window

    keys = list(key_cols)
    xi = _int_scaled(value_col, decimals)
    base = df.where(F.col(value_col).isNotNull()).select(
        *keys,
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
        xi.alias("__xi"),
        *[F.col(c) for c in (order_cols or []) if c not in key_cols],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in ["ts", *(order_cols or [])]])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixed = base.select(
        *keys,
        "ts",
        "value",
        F.sum(F.col("__xi").cast(_D38)).over(w).alias("__pk"),
        F.count(F.lit(1)).over(w).alias("__k"),
    )
    moments = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__xi").cast(_D38)).alias("__sx"),
        F.sum((F.col("__xi") * F.col("__xi")).cast(_D38)).alias("__sxx"),
    )
    joined = prefixed.join(F.broadcast(moments), keys)
    nd = F.col("__n").cast("decimal(12,0)")
    num = (
        nd * F.col("__pk") - F.col("__k").cast("decimal(12,0)") * F.col("__sx")
    ).cast("double")
    var_n = (nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    s_k = F.when(var_n > 0, num / F.sqrt(var_n))
    return joined.select(
        *keys,
        "ts",
        F.col("__k").alias("k"),
        "value",
        s_k.alias("cusum"),
        (F.abs(s_k) > F.lit(threshold) * F.sqrt(F.col("__n").cast("double")))
        .alias("breach"),
    )


def lag_corr(
    a: DataFrame,
    b: DataFrame,
    ts_col: str,
    value_col: str,
    max_lag: int,
    step_seconds: int,
    decimals: int = 0,
) -> DataFrame:
    """Cross-correlation scan between two regular time series: Pearson
    corr(a_t, b_{t+k·step}) for k = 0..max_lag — the lead/lag detector
    ("purchases follow clicks by ~2 hours") and the sensor-pair
    transport-delay estimator.

    ``a`` and ``b`` are (ts, value) frames on the SAME regular grid
    (resample first). Lags materialize map-side: b is fanned out once
    through a posexplode over the 0..max_lag lag array with its
    timestamp shifted back k·step — ONE equi-join on the shifted
    timestamp then aligns all lags simultaneously (no per-lag join, no
    window sort). The corr epilogue is the exact-moment form
    (profile.exact_corr): integer-scaled decimal sums, one double
    conversion after cancellation — engine-portable.

    Output: lag, n, corr — rows where a lag has < 2 aligned points or
    a constant side give NULL corr.
    """
    if max_lag < 0 or step_seconds <= 0:
        raise ValueError("max_lag must be >= 0 and step_seconds > 0")
    lags = F.sequence(F.lit(0), F.lit(max_lag))
    bx = b.select(
        F.col(ts_col).alias("__bts"), F.col(value_col).alias("__y")
    ).select(
        "__y",
        F.explode(lags).alias("lag"),
        (F.unix_timestamp("__bts") - F.col("lag") * step_seconds).alias("__ats"),
    )
    ax = a.select(
        F.unix_timestamp(F.col(ts_col)).alias("__ats"),
        F.col(value_col).alias("__x"),
    )
    pairs = ax.join(bx, "__ats").where(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    xi = _int_scaled("__x", decimals)
    yi = _int_scaled("__y", decimals)
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast(_D38)).alias("__sx"),
        F.sum(yi.cast(_D38)).alias("__sy"),
        F.sum((xi * xi).cast(_D38)).alias("__sxx"),
        F.sum((yi * yi).cast(_D38)).alias("__syy"),
        F.sum((xi * yi).cast(_D38)).alias("__sxy"),
    )
    nd = F.col("n").cast("decimal(12,0)")
    cov_n = (nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    var_x = (nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    var_y = (nd * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    denom = F.sqrt(var_x) * F.sqrt(var_y)
    return sums.select(
        "lag", "n", F.when(denom > 0, cov_n / denom).alias("corr")
    )
