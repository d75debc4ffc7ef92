"""Single-pass dataset profiling — the first thing you run against an
unfamiliar 100 TB table, and the recurring health check on a curated
training set.

One aggregation job computes every column's metrics simultaneously
(count / nulls / HLL++ distinct / min / max): profiling column-by-
column re-scans the table once per column, which is exactly the
reference's recompute anti-pattern (approxQuantile x4 over the same
uncached DAG, /root/reference/sensor_data_etl.py:95-98). The single
result row is reshaped driver-side (one row, not a collect of data).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, approx_distinct,
    min, max) — min/max stringified so mixed types share one schema.

    Complex-typed columns (array/map/struct) get null min/max (not
    orderable) but still count nulls and distincts via their hash.
    """
    names = list(cols) if cols else list(df.columns)
    schema = {f.name: f.dataType for f in df.schema.fields}
    orderable = lambda dt: dt.typeName() not in ("array", "map", "struct", "binary")  # noqa: E731
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        if orderable(schema[c]):
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"{c}__d"))
            aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
        else:
            aggs.append(
                F.approx_count_distinct(F.xxhash64(F.to_json(F.col(c)))).alias(
                    f"{c}__d"
                )
            )
            aggs.append(F.lit(None).cast("string").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__max"))
    row = df.agg(*aggs).collect()[0]
    out = [
        (
            c,
            row["__n"],
            row["__n"] - row[f"{c}__nn"],
            row[f"{c}__d"],
            row[f"{c}__min"],
            row[f"{c}__max"],
        )
        for c in names
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, n_rows long, n_null long, approx_distinct long, "
        "min string, max string",
    )


def histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-width histogram with data-driven bounds, two aggregation
    passes and zero collect: pass 1 computes per-group [min, max]
    (a tiny frame — one row per group), which broadcast-joins back so
    pass 2 buckets every row map-side. The classic profiling shape the
    reference approximates with 4 independent approxQuantile jobs
    (/root/reference/sensor_data_etl.py:95-98) — here the fact table is
    scanned exactly twice regardless of group count, and at 100 TB both
    scans are full-parallel with only the one-row-per-group bounds frame
    shuffled.

    Values exactly at the upper bound clamp into the last bin (standard
    right-closed last bucket). Degenerate groups (min == max) put all
    rows in bin 0. NULL values are excluded.

    Output: [*by], bin, bin_lo, bin_hi, n — bin bounds are exact double
    arithmetic (lo + bin*width), reproducible across engines.
    """
    keys = list(by) if by else []
    v = F.col(value_col)
    bounds = (df.groupBy(*keys) if keys else df.groupBy()).agg(
        F.min(v).cast("double").alias("__lo"),
        F.max(v).cast("double").alias("__hi"),
    )
    base = df.where(v.isNotNull())
    joined = (
        base.join(F.broadcast(bounds), keys)
        if keys
        else base.crossJoin(F.broadcast(bounds))
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    bin_ = (
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((v.cast("double") - F.col("__lo")) / width),
                F.lit(n_bins - 1),
            )
        )
        .cast("int")
    )
    return (
        joined.select(*keys, "__lo", "__hi", bin_.alias("bin"), v.alias("__v"))
        .groupBy(*keys, "__lo", "__hi", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            "bin",
            (
                F.col("__lo")
                + F.col("bin").cast("double")
                * (F.col("__hi") - F.col("__lo"))
                / F.lit(float(n_bins))
            ).alias("bin_lo"),
            (
                F.col("__lo")
                + (F.col("bin").cast("double") + F.lit(1.0))
                * (F.col("__hi") - F.col("__lo"))
                / F.lit(float(n_bins))
            ).alias("bin_hi"),
            "n",
        )
    )


def exact_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: Sequence[str] | None = None,
    x_decimals: int = 2,
    y_decimals: int = 2,
) -> DataFrame:
    """Pearson correlation from EXACT integer moments — the
    engine-portable twin of F.corr.

    F.corr accumulates doubles in partition order, so the low bits
    differ run-to-run and engine-to-engine; and even exact decimal
    moments lose bit-parity if they are converted to double BEFORE the
    n*Sxx - Sx² cancellation (a 1-ulp conversion difference gets
    amplified by the subtraction of near-equal magnitudes — observed
    1e-13 relative drift vs DuckDB). So everything up to and including
    the covariance/variance numerators stays exact:

    1. scale x, y to integers (10^decimals via an exact decimal cast —
       corr is scale-invariant, so the result is unchanged);
    2. one aggregate computes n and the five sums as scale-0 decimals
       (exact, order-independent, map-side partials apply);
    3. cov_n = n*Sxy - Sx*Sy, var = n*Sxx - Sx² in scale-0 decimal
       arithmetic (still exact);
    4. only THEN cast the three exact integers to double — a single
       correctly-rounded conversion — and finish with a fixed IEEE
       epilogue cov / (sqrt(var_x) * sqrt(var_y)).

    Rows where either value is NULL are excluded (SQL corr semantics).
    Output: [*by], n, corr (NULL for degenerate/singleton groups).
    """
    keys = list(by) if by else []
    xi = (
        (F.col(x_col).cast(f"decimal(18,{x_decimals})") * (10 ** x_decimals))
        .cast("decimal(19,0)")
    )
    yi = (
        (F.col(y_col).cast(f"decimal(18,{y_decimals})") * (10 ** y_decimals))
        .cast("decimal(19,0)")
    )
    both = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    d38 = "decimal(38,0)"
    sums = (both.groupBy(*keys) if keys else both.groupBy()).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast(d38)).alias("__sx"),
        F.sum(yi.cast(d38)).alias("__sy"),
        F.sum((xi * xi).cast(d38)).alias("__sxx"),
        F.sum((yi * yi).cast(d38)).alias("__syy"),
        F.sum((xi * yi).cast(d38)).alias("__sxy"),
    )
    nd = F.col("n").cast("decimal(12,0)")
    cov_n = (nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    var_x = (nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    var_y = (nd * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    denom = F.sqrt(var_x) * F.sqrt(var_y)
    return sums.select(
        *keys,
        "n",
        F.when(denom > 0, cov_n / denom).alias("corr"),
    )


def top_categories(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    k: int = 5,
) -> DataFrame:
    """Per-group top-k most frequent values with counts and exact share
    — the heavy-hitters profile of a categorical column (label skew,
    source imbalance, vocabulary head).

    One hash aggregate computes (group, value) counts; the group total
    rides a window over THAT small aggregated frame (no second scan of
    the fact table), and rank ties break deterministically on the value
    itself. Share = count/total is one double division of two exact
    longs — engine-portable.

    Output: [*by], value, n, share, rank (1-based, rank ≤ k).
    """
    from pyspark.sql.window import Window

    keys = list(by) if by else []
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wg = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    wr = wg.orderBy(F.col("n").desc(), F.col("value"))
    return (
        counts.select(
            *keys,
            "value",
            "n",
            (F.col("n").cast("double") / F.sum("n").over(wg).cast("double")).alias(
                "share"
            ),
            F.row_number().over(wr).alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def category_concentration(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Per-group categorical concentration: Herfindahl index
    ``H = Σ pᵢ²`` and Gini impurity ``1 − H`` over the value
    distribution — the diversity/imbalance check on labels, sources,
    and languages before a training mix is finalized.

    Rational to the last step: with counts cᵢ and total n,
    ``H = Σcᵢ² / n²`` — both exact integers (decimal sums), one double
    division, so the statistic hash-matches across engines. (Shannon
    entropy needs per-category ln(), which no engine guarantees
    correctly rounded — H ranks the same distributions without it.)

    Two chained aggregates, both on shrinking frames: fact →
    (group, value) counts → group row. Output: [*by], n, n_categories,
    herfindahl, gini.
    """
    keys = list(by) if by else []
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).cast("decimal(19,0)").alias("__c"))
    )
    d38 = "decimal(38,0)"
    per_group = (counts.groupBy(*keys) if keys else counts.groupBy()).agg(
        F.sum(F.col("__c").cast(d38)).alias("__n"),
        F.sum((F.col("__c") * F.col("__c")).cast(d38)).alias("__ss"),
        F.count(F.lit(1)).alias("n_categories"),
    )
    h = F.col("__ss").cast("double") / (
        F.col("__n") * F.col("__n")
    ).cast("double")
    return per_group.select(
        *keys,
        F.col("__n").cast("long").alias("n"),
        "n_categories",
        h.alias("herfindahl"),
        (F.lit(1.0) - h).alias("gini"),
    )


def trend_slope(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: Sequence[str] | None = None,
    x_decimals: int = 0,
    y_decimals: int = 6,
) -> DataFrame:
    """Per-group OLS trend line (slope + intercept) from EXACT decimal
    moments — the engine-portable twin of regr_slope/regr_intercept.

    Same discipline as exact_corr: scale x and y to integers, aggregate
    n/Sx/Sy/Sxx/Sxy as scale-0 decimals (order-independent, map-side
    partials), form the cancellation-prone numerators n*Sxy - Sx*Sy and
    n*Sxx - Sx² while still exact, and only then cast to double for a
    fixed two-division IEEE epilogue:

        slope_scaled = cov_n / var_n
        intercept    = (Sy - slope_scaled*Sx) / n   (in scaled units)

    then unscale by the power-of-ten factors (exact in binary? no —
    but identical literals and op order on both engines, so the values
    hash-match; the oracle must use the same formula, not regr_slope).

    Output: [*by], n, slope, intercept — slope in y-units per x-unit.
    """
    keys = list(by) if by else []
    xi = (
        (F.col(x_col).cast(f"decimal(18,{x_decimals})") * (10 ** x_decimals))
        .cast("decimal(19,0)")
    )
    yi = (
        (F.col(y_col).cast(f"decimal(18,{y_decimals})") * (10 ** y_decimals))
        .cast("decimal(19,0)")
    )
    both = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    d38 = "decimal(38,0)"
    sums = (both.groupBy(*keys) if keys else both.groupBy()).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast(d38)).alias("__sx"),
        F.sum(yi.cast(d38)).alias("__sy"),
        F.sum((xi * xi).cast(d38)).alias("__sxx"),
        F.sum((xi * yi).cast(d38)).alias("__sxy"),
    )
    nd = F.col("n").cast("decimal(12,0)")
    cov_n = (nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    var_n = (nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    # slope in scaled units: (y*10^dy) per (x*10^dx) → multiply by
    # 10^(dx-dy) to get y per x. Keep the factor a single literal so
    # the epilogue is one multiply on both engines.
    unscale = float(10 ** (x_decimals - y_decimals))
    slope_scaled = F.when(var_n > 0, cov_n / var_n)
    intercept_scaled = (
        F.col("__sy").cast("double") - slope_scaled * F.col("__sx").cast("double")
    ) / F.col("n").cast("double")
    return sums.select(
        *keys,
        "n",
        (slope_scaled * F.lit(unscale)).alias("slope"),
        (intercept_scaled / F.lit(float(10 ** y_decimals))).alias("intercept"),
    )


def group_zscore(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    decimals: int = 6,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-row z-score within its group, engine-portable.

    The naive (x - avg) / stddev chains double aggregates whose low
    bits depend on partition order. Here the group moments are exact
    decimals (one aggregate, broadcast back), and the epilogue is a
    fixed IEEE sequence of correctly-rounded ops — identical bits on
    any engine that evaluates the same expression:

        num = n*x - Sx                  (exact decimal → double)
        a   = n*Sxx - Sx²               (exact decimal → double)
        den = sqrt(a * (n/(n-1)))       (two correctly-rounded ops)
        z   = num / den                 (scale factors cancel exactly)

    Sample stddev (n-1); singleton groups get NULL. The join back is a
    broadcast of one row per group — no second shuffle of the fact.
    """
    keys = list(by) if by else []
    xi = (
        (F.col(value_col).cast(f"decimal(18,{decimals})") * (10 ** decimals))
        .cast("decimal(19,0)")
    )
    d38 = "decimal(38,0)"
    base = df.withColumn("__xi", xi)
    moments = (base.groupBy(*keys) if keys else base.groupBy()).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__xi").cast(d38)).alias("__sx"),
        F.sum((F.col("__xi") * F.col("__xi")).cast(d38)).alias("__sxx"),
    )
    joined = (
        base.join(F.broadcast(moments), keys, "left")
        if keys
        else base.crossJoin(F.broadcast(moments))
    )
    nd = F.col("__n").cast("decimal(12,0)")
    num = (nd * F.col("__xi") - F.col("__sx")).cast("double")
    a = (nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    ratio = F.col("__n").cast("double") / (F.col("__n") - F.lit(1)).cast("double")
    den = F.sqrt(a * ratio)
    z = F.when((F.col("__n") > 1) & (den > 0), num / den)
    return joined.withColumn(out_col, z).drop("__xi", "__n", "__sx", "__sxx")


def minmax_scale(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    decimals: int = 6,
    out_col: str = "scaled",
) -> DataFrame:
    """Per-group min-max normalization to [0, 1] — the feature-scaling
    twin of group_zscore, same portable shape: one tiny bounds
    aggregate broadcast back (the fact table never shuffles), exact
    decimal differences, ONE double division.

    Degenerate groups (min == max) yield NULL. NULL values pass
    through as NULL.
    """
    keys = list(by) if by else []
    xi = F.col(value_col).cast(f"decimal(18,{decimals})")
    base = df.withColumn("__xi", xi)
    bounds = (base.groupBy(*keys) if keys else base.groupBy()).agg(
        F.min("__xi").alias("__mn"), F.max("__xi").alias("__mx")
    )
    joined = (
        base.join(F.broadcast(bounds), keys, "left")
        if keys
        else base.crossJoin(F.broadcast(bounds))
    )
    num = (F.col("__xi") - F.col("__mn")).cast("double")
    den = (F.col("__mx") - F.col("__mn")).cast("double")
    return joined.withColumn(
        out_col, F.when(den > 0, num / den)
    ).drop("__xi", "__mn", "__mx")


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Spearman rank correlation, engine-portable — Pearson over
    average ranks, with the tie-handling trick that keeps EVERYTHING
    integer until the final epilogue:

        2 * avg_rank = 2*rank + tie_count - 1

    (the average rank of a tie group of consecutive integers is a
    half-integer, so DOUBLING it is an integer — computed from one
    rank() and one count() window). Pearson is scale-invariant, so
    correlating the doubled ranks equals correlating the ranks, and
    exact_corr's decimal-moment machinery applies unchanged.

    Shape: one exchange on the group key, two sorts (x order, y order)
    + one tiny aggregate — no collect, no sampling. Output: [*by], n,
    spearman.
    """
    keys = list(by) if by else []
    both = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    wx = Window.partitionBy(*keys).orderBy(x_col)
    wy = Window.partitionBy(*keys).orderBy(y_col)
    tx = Window.partitionBy(*(keys + [x_col]))
    ty = Window.partitionBy(*(keys + [y_col]))
    r2x = 2 * F.rank().over(wx) + F.count(F.lit(1)).over(tx) - 1
    r2y = 2 * F.rank().over(wy) + F.count(F.lit(1)).over(ty) - 1
    ranked = both.select(
        *keys, r2x.alias("__r2x"), r2y.alias("__r2y")
    )
    out = exact_corr(
        ranked, "__r2x", "__r2y", by=keys, x_decimals=0, y_decimals=0
    )
    return out.select(*keys, "n", F.col("corr").alias("spearman"))


def chisq_cells(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Contingency-table chi-square, reported PER CELL — observed
    count, expected count under independence, and the cell's chi²
    contribution (N·O − R·C)² / (N·R·C).

    The total statistic is deliberately NOT summed here: per-cell
    values are single fixed-order IEEE expressions over exact decimal
    products (portable), while a float SUM over cells would reintroduce
    summation-order drift — callers that want the scalar can sum the
    tiny cell frame themselves. Decimal(38) intermediates keep N·R·C
    exact to ~10^38 (count up to ~10^12 rows before overflow).

    Shape: one count aggregate on (a, b); row/column totals come from
    window sums over the AGGREGATED cell frame (no second fact scan).
    """
    cells = df.where(
        F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
    ).groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count(F.lit(1)).alias("observed"))
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wall = Window.partitionBy()
    d19 = "decimal(19,0)"
    r = F.sum("observed").over(wa).cast(d19)
    c = F.sum("observed").over(wb).cast(d19)
    n = F.sum("observed").over(wall).cast(d19)
    o = F.col("observed").cast(d19)
    num = (n * o - r * c).cast("double")
    den = (n * r * c).cast("double")
    expected = (r * c).cast("double") / n.cast("double")
    return cells.select(
        "a",
        "b",
        "observed",
        expected.alias("expected"),
        ((num * num) / den).alias("chi2_contrib"),
    )


_BENFORD_EXPECTED = [
    0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]


def benford_digits(
    df: DataFrame,
    value_col: str,
    decimals: int = 2,
) -> DataFrame:
    """Leading-digit distribution vs Benford's law — the classic
    fabricated-data / instrumentation-fault screen for financial and
    sensor magnitudes.

    The leading digit is extracted WITHOUT logarithms (log10's libm
    rounding varies by engine) and WITHOUT rounding: the first nonzero
    character of the value's string form IS the leading significant
    digit in every numeric notation ("123.45", "0.0072", "7.2E-4",
    "1e+20" all agree), so the extraction is invariant to how the
    engine prints the number and never shifts across decade boundaries
    the way a rounding decimal cast would (9.997 stays digit 9, not 1).
    Benford expectations are the nine literal doubles (log10(1+1/d)
    precomputed), so no transcendental function runs in either engine.
    Non-positive values are excluded; a defensive BETWEEN 1 AND 9
    filter keeps element_at's 1-based index legal no matter what.

    `decimals` is retained for API compatibility but unused — the
    regexp extraction needs no integer scaling.

    Output: digit, n, share, expected.
    """
    base = df.where(F.col(value_col) > 0).select(
        F.regexp_extract(F.col(value_col).cast("string"), "[1-9]", 0)
        .cast("int")
        .alias("digit")
    ).where(F.col("digit").between(1, 9))
    counts = base.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    wall = Window.partitionBy()
    exp = F.element_at(
        F.array(*[F.lit(v) for v in _BENFORD_EXPECTED]), F.col("digit")
    )
    return counts.select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wall).cast("double")).alias(
            "share"
        ),
        exp.alias("expected"),
    )


def mann_kendall(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Mann-Kendall trend statistic per series: S = Σ_{i<j}
    sign(x_j − x_i) and Kendall's tau-a = 2S/(n(n−1)) — the standard
    nonparametric monotone-trend screen for sensor series (no
    normality assumption, robust to outliers; hydrology/air-quality
    standard).

    S is a PURE INTEGER aggregate over the within-series pair frame
    (one self-join on the series key with t1 < t2) — engine-portable
    with no float concerns; tau does ONE double division at the end.
    The O(n²/2) pair fan-out is per series: resample to a bounded grid
    first (operators/resample.py) so n stays in the hundreds — then
    the join is a per-key hash join whose output still fits in one
    task per series. Ties in x contribute 0 to S (tau-a; tie-corrected
    tau-b documented out of scope).

    Output: [*key_cols], n, s, tau (NULL when n < 2).
    """
    keys = list(key_cols)
    a = df.select(
        *keys, F.col(ts_col).alias("__t1"), F.col(value_col).alias("__v1")
    )
    b = df.select(
        *keys, F.col(ts_col).alias("__t2"), F.col(value_col).alias("__v2")
    )
    pairs = a.join(b, keys).where(F.col("__t1") < F.col("__t2"))
    sgn = (
        F.when(F.col("__v2") > F.col("__v1"), 1)
        .when(F.col("__v2") < F.col("__v1"), -1)
        .otherwise(0)
    )
    s = pairs.groupBy(*keys).agg(
        F.sum(sgn).cast("bigint").alias("s")
    )
    n = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    out = n.join(s, keys, "left").na.fill({"s": 0})
    tau = (F.lit(2.0) * F.col("s").cast("double")) / (
        F.col("n") * (F.col("n") - 1)
    ).cast("double")
    return out.select(
        *keys, "n", "s", F.when(F.col("n") >= 2, tau).alias("tau")
    )


def theil_sen(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Theil-Sen robust trend slope per series: the MEDIAN of all
    pairwise slopes (x_j − x_i)/(t_j − t_i), i<j — up to ~29%
    contamination tolerance where OLS (profile.trend_slope) breaks on
    one bad sensor spike.

    Pair fan-out is the same bounded per-series self-join as
    mann_kendall (resample first). Each slope is ONE double division
    of exactly-represented deltas; the median uses an EXPLICIT
    index-selection rule on the sorted slope array (odd n → middle
    element; even n → mean of the two middles) rather than an engine
    median() — so any engine reproduces it bit-for-bit. The per-series
    collect is bounded by the pair count, which the resample contract
    already bounds.

    Output: [*key_cols], n_pairs, slope (NULL when no pairs).
    """
    keys = list(key_cols)
    a = df.select(
        *keys, F.col(ts_col).alias("__t1"), F.col(value_col).alias("__v1")
    )
    b = df.select(
        *keys, F.col(ts_col).alias("__t2"), F.col(value_col).alias("__v2")
    )
    slope = (
        (F.col("__v2") - F.col("__v1")).cast("double")
        / (
            F.unix_timestamp("__t2") - F.unix_timestamp("__t1")
        ).cast("double")
    )
    pairs = (
        a.join(b, keys)
        .where(F.col("__t1") < F.col("__t2"))
        .select(*keys, slope.alias("__s"))
    )
    agg = pairs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.array_sort(F.collect_list("__s")).alias("__sorted"),
    )
    n = F.col("n_pairs")
    mid = F.element_at("__sorted", ((n + 1) / 2).cast("int"))
    lo = F.element_at("__sorted", (n / 2).cast("int"))
    hi = F.element_at("__sorted", (n / 2 + 1).cast("int"))
    median = F.when(n % 2 == 1, mid).otherwise((lo + hi) / F.lit(2.0))
    return agg.select(*keys, "n_pairs", median.alias("slope"))


def group_skewness(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    decimals: int = 2,
) -> DataFrame:
    """Per-group skewness (population g1) from EXACT integer power
    sums — the engine-portable twin of F.skewness, same mechanism as
    exact_corr: scale to integers, aggregate Σx/Σx²/Σx³ as scale-0
    decimals (order-independent), cancel while still exact, and only
    then convert.

        M2 = n·Σx² − (Σx)²        (n² × central 2nd moment)
        M3 = n²·Σx³ − 3n·Σx·Σx² + 2(Σx)³   (n³ × central 3rd moment)
        g1 = M3 / (M2 · sqrt(M2))

    The epilogue avoids pow(x, 1.5) (libm, engine-varying): M2^{3/2} is
    one multiply and one sqrt, both correctly-rounded IEEE ops. g1 is
    scale-invariant, so the integer scaling changes nothing. Bounds:
    values to ~1e6 at 2 decimals keep n²Σx³ inside decimal(38) up to
    ~1e6 rows/group; larger groups lower ``decimals``.

    Output: [*by], n, skewness (NULL for n<2 or zero variance).
    """
    keys = list(by) if by else []
    xi = (
        (F.col(value_col).cast(f"decimal(18,{decimals})") * (10 ** decimals))
        .cast("decimal(19,0)")
    )
    d38 = "decimal(38,0)"
    base = df.where(F.col(value_col).isNotNull())
    sums = (base.groupBy(*keys) if keys else base.groupBy()).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast(d38)).alias("__s1"),
        F.sum((xi * xi).cast(d38)).alias("__s2"),
        F.sum((xi * xi * xi).cast(d38)).alias("__s3"),
    )
    nd = F.col("n").cast("decimal(12,0)")
    m2 = (nd * F.col("__s2") - F.col("__s1") * F.col("__s1")).cast("double")
    m3 = (
        nd * nd * F.col("__s3")
        - F.lit(3) * nd * F.col("__s1") * F.col("__s2")
        + F.lit(2) * F.col("__s1") * F.col("__s1") * F.col("__s1")
    ).cast("double")
    return sums.select(
        *keys,
        "n",
        F.when(m2 > 0, m3 / (m2 * F.sqrt(m2))).alias("skewness"),
    )


def moment_partials(
    df: DataFrame,
    by: Sequence[str],
    value_col: str,
    decimals: int = 2,
) -> DataFrame:
    """Exact mergeable moment partials — the EXACT counterpart of the
    sketch-partials pattern (operators/sketches.py): persist
    (n, Σx, Σx²) per fine group (e.g. per day) once, and ANY coarser
    mean/variance/stddev question merges partials without rescanning
    the fact table. Sums are integer-scaled decimals, so merging is
    associative and bit-exact in any engine and any order.

    Output: [*by], n, s1, s2 (decimal(38,0) scaled by 10^decimals).
    """
    keys = list(by)
    xi = (
        (F.col(value_col).cast(f"decimal(18,{decimals})") * (10 ** decimals))
        .cast("decimal(19,0)")
    )
    d38 = "decimal(38,0)"
    return df.where(F.col(value_col).isNotNull()).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast(d38)).alias("s1"),
        F.sum((xi * xi).cast(d38)).alias("s2"),
    )


def moment_rollup(
    partials: DataFrame,
    by: Sequence[str],
    decimals: int = 2,
) -> DataFrame:
    """Merge moment partials to a coarser grouping and finish mean /
    population variance / stddev with the exact-cancellation epilogue
    (n·Σx² − (Σx)² while still integer, ONE conversion, fixed IEEE
    ops) — identical to computing from the raw facts, which is the
    differential gate.

    Output: [*by], n, mean, variance, stddev.
    """
    keys = list(by)
    m = partials.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("__s1"),
        F.sum("s2").alias("__s2"),
    )
    scale = float(10 ** decimals)
    nd = F.col("n").cast("decimal(12,0)")
    var_num = (nd * F.col("__s2") - F.col("__s1") * F.col("__s1")).cast("double")
    nn = F.col("n").cast("double")
    mean = F.col("__s1").cast("double") / nn / F.lit(scale)
    variance = var_num / (nn * nn) / F.lit(scale * scale)
    return m.select(
        *keys,
        "n",
        mean.alias("mean"),
        variance.alias("variance"),
        F.sqrt(variance).alias("stddev"),
    )


def ks_statistic(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic D = sup|F_a − F_b|
    computed EXACTLY in integers: per distinct value, prefix counts
    c_a, c_b ride one ordered window over the (distinct-value)
    aggregated frame, and D's numerator is max|c_a·N_b − c_b·N_a| —
    pure integers until ONE final division by N_a·N_b. No ECDF floats,
    no tie ambiguity (the prefix is evaluated after each full tie
    group by construction).

    The window runs over the DISTINCT-VALUE frame (bounded by value
    cardinality, not row count); the fact is touched by one hash
    aggregate. Output: one row — n_a, n_b, d.
    """
    from pyspark.sql.window import Window

    base = df.where(
        F.col(group_col).isin([group_a, group_b]) & F.col(value_col).isNotNull()
    ).select(
        F.col(value_col).alias("v"),
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("__a"),
    )
    per_v = base.groupBy("v").agg(
        F.sum("__a").alias("ca"),
        F.sum(F.lit(1) - F.col("__a")).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    pref = per_v.select(
        F.sum("ca").over(w).alias("pa"),
        F.sum("cb").over(w).alias("pb"),
    )
    # the two sample sizes are the final prefix values; broadcast the
    # 1-row totals back for the exact numerator
    totals = pref.agg(F.max("pa").alias("n_a"), F.max("pb").alias("n_b"))
    num = (
        pref.crossJoin(F.broadcast(totals))
        .select(
            "n_a",
            "n_b",
            F.abs(
                F.col("pa") * F.col("n_b") - F.col("pb") * F.col("n_a")
            ).alias("__d"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("__d").alias("d_num"))
    )
    return num.select(
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.col("d_num").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
        ).alias("d"),
    )


def auc_score(
    df: DataFrame,
    label_col: str,
    score_col: str,
) -> DataFrame:
    """ROC AUC from the rank-sum (Mann-Whitney U) identity, exact in
    integers with proper tie handling: aggregate to distinct scores
    (n_pos, n_tot per score), one ordered window gives the rank offset,
    and 2·Σranks_pos = Σ n_pos·(2·prev_total + n_tot + 1) stays integer
    through the tie-averaging. AUC = (2·Σranks_pos − n_pos(n_pos+1)) /
    (2·n_pos·n_neg) — ONE double division.

    The window runs over the distinct-score frame (score cardinality,
    not row count); the fact is one hash aggregate. This is the
    engine-portable, tie-correct twin of
    BinaryClassificationEvaluator's areaUnderROC.

    Output: one row — n_pos, n_neg, auc (NULL if a class is absent).
    """
    from pyspark.sql.window import Window

    per_s = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).groupBy(F.col(score_col).alias("s")).agg(
        F.sum(F.col(label_col).cast("int")).alias("np"),
        F.count(F.lit(1)).alias("nt"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_s.select(
        "np",
        "nt",
        F.coalesce(F.sum("nt").over(w), F.lit(0)).alias("prev"),
    )
    agg = ranked.agg(
        F.sum("np").cast("bigint").alias("n_pos"),
        (F.sum("nt") - F.sum("np")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("np") * (F.lit(2) * F.col("prev") + F.col("nt") + 1)
        ).cast("bigint").alias("r2"),
    )
    auc = (
        (
            F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1)
        ).cast("double")
        / (F.lit(2.0) * (F.col("n_pos") * F.col("n_neg")).cast("double"))
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc).alias("auc"),
    )


def oov_rate(
    df: DataFrame,
    group_col: str,
    text_col: str,
    vocab_k: int = 16,
    persist_counts: bool = False,
) -> DataFrame:
    """Per-group out-of-vocabulary audit against a frequency-built
    top-``vocab_k`` corpus vocabulary (q589's engine — extracted in
    round 10 to host the persist seam, VERDICT r9 #3).

    Plan shape: ONE shuffle to (group, token) counts; that counts
    frame then feeds TWO consumers — the tiny vocab aggregate and the
    coverage join — so without help the scan+explode+aggregate
    pipeline runs twice (exchange reuse does not fire across the
    differing projections). ``persist_counts=True`` materializes the
    counts frame once (MEMORY_AND_DISK); it is the AGGREGATED frame —
    (groups x distinct tokens) rows, far smaller than the exploded
    fact — so the persist barrier is cheap relative to re-tokenizing
    the corpus. Default OFF at query scale (the recompute is one
    map-side pass); turn ON when the upstream is expensive —
    measured at 10x in SCALING.md ("Round 10: q589 persist seam").

    Output: group, n_tokens, oov_tokens, oov_types, oov_rate.
    """
    from ..functions.text import tokens

    st = (
        df.select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(text_col)).alias("tok"),
        )
        .groupBy("__g", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    if persist_counts:
        from pyspark import StorageLevel

        st = st.persist(StorageLevel.MEMORY_AND_DISK)
    vocab = (
        st.groupBy("tok")
        .agg(F.sum("n").alias("nt"))
        .orderBy(F.col("nt").desc(), F.col("tok").asc())
        .limit(vocab_k)
        .select("tok", F.lit(1).alias("__in"))
    )
    j = st.join(F.broadcast(vocab), "tok", "left")
    oov = F.col("__in").isNull()
    return j.groupBy("__g").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.sum(F.when(oov, F.col("n")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("oov_tokens"),
        F.count_distinct(F.when(oov, F.col("tok")))
        .cast("bigint")
        .alias("oov_types"),
        (
            F.sum(F.when(oov, F.col("n")).otherwise(F.lit(0))).cast("double")
            / F.sum("n").cast("double")
        ).alias("oov_rate"),
    ).withColumnRenamed("__g", group_col)
