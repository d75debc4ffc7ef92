"""Window-function operators: supervised-learning targets (lead),
rolling statistics, forward-fill, and linear interpolation — all pure
column algebra over ``Window`` frames. No UDFs.

Reference coverage: W1 (lead-as-label, sensor_data_regression.py:42-43),
T2 ffill / T3 interpolate (pandas_timeseries_forecast.py:65,
spark_pandas_timeseries_forecast.py:34-35) re-expressed natively.

Scale note: every window here REQUIRES a partition key. The reference's
``Window.partitionBy()`` (empty — sensor_data_regression.py:42) funnels
the whole dataset through one task; these APIs make the entity key a
mandatory argument instead (SURVEY.md §8 bug 8).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lead_target(
    df: DataFrame,
    order_col: str,
    target_col: str,
    partition_by: Sequence[str],
    offset: int = 1,
    out_col: str | None = None,
    drop_tail: bool = True,
) -> DataFrame:
    """Next-period value as a label column (the reference's
    "tomorrow's max H2S" target). ``drop_tail`` removes rows whose
    lead is NULL (reference P11, scoped to just this column rather
    than a blanket dropna)."""
    out = out_col or f"{target_col}_lead{offset}"
    w = Window.partitionBy(*partition_by).orderBy(order_col)
    res = df.withColumn(out, F.lead(target_col, offset).over(w))
    return res.na.drop(subset=[out]) if drop_tail else res


def rolling_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    partition_by: Sequence[str],
    window_seconds: int,
    out_col: str = "rolling_avg",
    exact: bool = False,
) -> DataFrame:
    """Time-based trailing mean over a rangeBetween frame keyed on
    epoch seconds (handles irregular sampling, unlike rowsBetween).

    ``exact=True`` computes decimal-sum / count instead of double avg:
    sliding-frame double accumulation is engine-implementation-defined
    in its low bits (running sums vs segment trees), so cross-engine
    comparisons need the exact form."""
    # rangeBetween takes integral offsets — order on epoch LONGs
    # (a double order key would demand float offsets, which the API
    # rejects; second granularity is the contract here)
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-int(window_seconds), 0)
    )
    if exact:
        mean = (
            F.sum(F.col(value_col).cast("decimal(38,6)")).over(w).cast("double")
            / F.count(value_col).over(w)
        )
    else:
        mean = F.avg(value_col).over(w)
    return df.withColumn(out_col, mean)


def rate_of_change(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    partition_by: Sequence[str],
    out_col: str = "rate",
) -> DataFrame:
    """Per-series discrete derivative: (value - lag(value)) / Δt
    seconds. The sensor-domain primitive behind drift/ramp alarms
    (e.g. H2S rising faster than X ppm/min) that the reference's wide
    table feeds into manual pandas work. NULL for each series' first
    row and for zero Δt (duplicate timestamps) rather than ±inf.

    One window sort per series partition — same shuffle shape as
    ffill/lead_target, composes with resample upstream."""
    w = Window.partitionBy(*partition_by).orderBy(ts_col)
    dv = F.col(value_col) - F.lag(value_col).over(w)
    dt = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    return df.withColumn(
        out_col, F.when(dt > 0, dv / dt)
    )


def ffill(
    df: DataFrame,
    cols: Sequence[str],
    order_col: str,
    partition_by: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Forward-fill NULLs per series: last non-null over an unbounded
    preceding frame (native equivalent of pandas ``.ffill()``).

    ``tiebreak_col`` (a unique id) makes the sort a total order when
    ``order_col`` can repeat within a partition — without it, which of
    two equal-keyed rows fills first is engine-/run-dependent."""
    order = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def bfill(
    df: DataFrame,
    cols: Sequence[str],
    order_col: str,
    partition_by: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Backward-fill NULLs per series: next non-null over an unbounded
    following frame (native equivalent of pandas ``.bfill()``) — the
    ffill mirror, for gaps at the START of a series or lookahead-safe
    label propagation. Same single-sort shape: one window per series,
    no shuffle beyond the partition key.

    Evaluated as ``last(ignorenulls)`` over a DESC-ordered RUNNING
    frame, not ``first`` over ``(0, unboundedFollowing)``: Spark's
    UnboundedFollowing frame re-scans the remainder of the partition
    for EVERY row — O(n²) per partition, a wedge on skewed keys (a
    1M-row hot series = 10¹² ops) — while the running frame
    accumulates incrementally in O(n). Identical results whenever the
    sort is a total order per partition: either ``order_col`` is unique
    (the reversed sort is then the exact mirror) or ``tiebreak_col`` (a
    unique id, reversed together with the order key) is supplied —
    otherwise which duplicate-keyed row wins is run-dependent."""
    order = [F.col(order_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    w_rev = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w_rev))
    return out


def interpolate_linear(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    partition_by: Sequence[str],
    out_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Linear interpolation of NULL gaps per series — pure column
    algebra, no UDF (native equivalent of pandas
    ``.interpolate(method='linear')``, reference T3).

    Two frames per series: last non-null (value, ts) looking back,
    first non-null looking forward; blend on the epoch-time fraction.
    Leading/trailing gaps degrade to nearest-value fill; all-null
    series stay NULL.

    The forward lookup is ``last(ignorenulls)`` over a DESC-ordered
    RUNNING frame rather than ``first`` over ``(0,
    unboundedFollowing)``: the latter re-scans the partition tail for
    every row (O(n²) — a 1M-row hot series wedges for hours; measured
    on the round-7 zipf fixture), the former is one incremental O(n)
    pass. Results are identical whenever the sort is a total order per
    series: ``ts_col`` unique (reversed sort = exact mirror) or
    ``tiebreak_col`` (a unique id) supplied and reversed with it.
    """
    out = out_col or value_col
    t = F.col(ts_col).cast("double")
    v = F.col(value_col)
    tb_asc = [F.col(tiebreak_col)] if tiebreak_col else []
    tb_desc = [F.col(tiebreak_col).desc()] if tiebreak_col else []
    back = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(ts_col), *tb_asc)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd_rev = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(ts_col).desc(), *tb_desc)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(back)
    next_v = F.last(v, ignorenulls=True).over(fwd_rev)
    next_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(fwd_rev)

    frac = (t - prev_t) / (next_t - prev_t)
    blended = prev_v + (next_v - prev_v) * frac
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .when(next_t == prev_t, prev_v)
        .otherwise(blended)
    )
    return df.withColumn(out, filled)


def rolling_median(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    partition_by: Sequence[str],
    n_rows: int = 7,
    out_col: str = "rolling_median",
) -> DataFrame:
    """Exact trailing median over the last ``n_rows`` samples per
    series — the robust twin of ``rolling_avg`` (one outlier moves a
    7-point mean by 1/7 of its magnitude; it moves the median not at
    all, which is why sensor-cleaning pipelines prefer it).

    Uses the exact ``percentile`` aggregate over a rowsBetween frame:
    linear interpolation at rank 0.5·(n−1), identical to DuckDB's
    ``quantile_cont`` — for even frames both average the two middle
    values with one IEEE add + multiply, so results are
    engine-portable. Cost is O(frame log frame) per row inside the
    window operator, JVM-side; frames are small constants (7 here), so
    at 100 TB the one sort per series partition dominates — same
    shuffle shape as every other window op in this module.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(ts_col))
        .rowsBetween(-(n_rows - 1), 0)
    )
    return df.withColumn(
        out_col, F.percentile(F.col(value_col), F.lit(0.5)).over(w)
    )


def rolling_corr(
    df: DataFrame,
    by: Sequence[str],
    order_cols: Sequence[str],
    x_col: str,
    y_col: str,
    n_rows: int = 20,
    x_decimals: int = 2,
    y_decimals: int = 0,
    out_col: str = "r_corr",
) -> DataFrame:
    """Rolling Pearson correlation over the trailing ``n_rows`` rows per
    key — engine-portable via EXACT integer moments (the windowed twin
    of operators/profile.py:exact_corr; see its docstring for why the
    n*Sxy - Sx*Sy cancellation must happen BEFORE any double cast).

    x, y are scaled to integers by 10^decimals (corr is scale/shift
    invariant). All five windowed sums accumulate as decimal(38,0) —
    exact and order-independent — then one double conversion + a fixed
    IEEE epilogue. Rows with NULL in either column must be filtered by
    the caller (frame counts include them otherwise).

    ``order_cols`` must be a total order (add a unique id as tiebreak)
    or the frame contents are nondeterministic. NULL when the window is
    degenerate (constant x or y, or a single row).
    """
    xi = (
        (F.col(x_col).cast(f"decimal(18,{x_decimals})") * (10 ** x_decimals))
        .cast("decimal(19,0)")
    )
    yi = (
        (F.col(y_col).cast(f"decimal(18,{y_decimals})") * (10 ** y_decimals))
        .cast("decimal(19,0)")
    )
    d38 = "decimal(38,0)"
    w = (
        Window.partitionBy(*[F.col(k) for k in by])
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(n_rows - 1), 0)
    )
    tmp = (
        df.withColumn("__n", F.count(F.lit(1)).over(w))
        .withColumn("__sx", F.sum(xi.cast(d38)).over(w))
        .withColumn("__sy", F.sum(yi.cast(d38)).over(w))
        .withColumn("__sxx", F.sum((xi * xi).cast(d38)).over(w))
        .withColumn("__syy", F.sum((yi * yi).cast(d38)).over(w))
        .withColumn("__sxy", F.sum((xi * yi).cast(d38)).over(w))
    )
    nd = F.col("__n").cast("decimal(12,0)")
    cov_n = (nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    var_x = (nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    var_y = (nd * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    denom = F.sqrt(var_x) * F.sqrt(var_y)
    return tmp.withColumn(
        out_col, F.when(denom > 0, cov_n / denom)
    ).drop("__n", "__sx", "__sy", "__sxx", "__syy", "__sxy")


def capped_running_sum(
    df: DataFrame,
    by: Sequence[str],
    order_cols: Sequence[str],
    delta_col: str,
    out_col: str = "balance",
    decimals: int = 2,
) -> DataFrame:
    """Running sum floored at zero — inventory / stock-ledger balance
    where withdrawals cannot take the level negative:

        b_i = max(b_{i-1} + x_i, 0),  b_0 = 0.

    The recursion LOOKS sequential, but has a closed form over plain
    prefix aggregates (the reflection identity used for reservoir /
    queue-depth problems):

        b_i = S_i − min(0, min_{j≤i} S_j)

    so ONE window partition computes it: prefix sum + prefix min, both
    in the same sorted pass — no recursion, no UDF, no iteration, and
    the whole thing is exact decimal arithmetic (oracle-gated).
    """
    keys = [F.col(k) for k in by]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    xd = F.col(delta_col).cast(f"decimal(18,{decimals})")
    base = df.withColumn("__s", F.sum(xd).over(w))
    zero = F.lit(0).cast(f"decimal(18,{decimals})")
    bal = (F.col("__s") - F.least(zero, F.min(F.col("__s")).over(w))).cast(
        "double"
    )
    return base.withColumn(out_col, bal).drop("__s")
