"""Newest queries (q439+). Append here; start a new module
past ~2.4k lines.

Split out of the former monolithic __spark_entry__.py; function
sources are verbatim. See queries/common.py for shared helpers and
queries/registry.py for the duplicate-raising registration."""

from __future__ import annotations

from sensor_time_series_pyspark_spark.queries.common import *  # noqa: F401,F403

def _q_lorenz_points(spark: SparkSession, sf: str) -> DataFrame:
    """Lorenz-curve decile points of customer revenue concentration:
    customers sorted by spend into 10 equal-count bins, each row the
    cumulative share of customers vs cumulative share of revenue —
    the CURVE q150's Gini integrates (the "bottom 50% hold X%"
    readout). Revenue is exact integer cents; the decile cut is the
    q423 (rn−1)·10 div N rule with custkey tiebreak; shares are ONE
    division per decile row on the 10-row frame."""
    o = read_table(spark, sf, "orders").select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("cents").cast("bigint").alias("rev")
    )
    wall = Window.partitionBy(F.lit(1))
    cut = per_cust.select(
        "rev",
        F.expr(
            "(cast(row_number() over (order by rev asc, o_custkey asc)"
            " as bigint) - 1) * 10"
        ).alias("rn10"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("ntot"),
        F.sum("rev").over(wall).cast("bigint").alias("rtot"),
    ).select(
        "rev",
        "ntot",
        "rtot",
        F.expr("rn10 div ntot").cast("int").alias("decile"),
    )
    per = cut.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("rev").cast("bigint").alias("rev_cents"),
        F.max("ntot").alias("ntot"),
        F.max("rtot").alias("rtot"),
    )
    wd = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "decile",
        "n_customers",
        "rev_cents",
        F.sum("n_customers").over(wd).cast("bigint").alias("cum_n"),
        F.sum("rev_cents").over(wd).cast("bigint").alias("cum_rev"),
        "ntot",
        "rtot",
    )
    return cum.select(
        "decile",
        "n_customers",
        "rev_cents",
        (
            F.col("cum_n").cast("double") / F.col("ntot").cast("double")
        ).alias("cum_pop_share"),
        (
            F.col("cum_rev").cast("double") / F.col("rtot").cast("double")
        ).alias("cum_rev_share"),
    )


def _q_peak_hour(spark: SparkSession, sf: str) -> DataFrame:
    """Peak hour per event type with its prominence over the median
    hour — "when does this signal spike, and is the spike real or is
    the day flat" (q142 shows the whole profile; this is its two-
    number summary for alert routing). The argmax is a deterministic
    (count DESC, hour ASC) top-1 on the 24-cell frame, the median
    hour is a percentile_disc table value, and prominence is ONE
    integer ratio."""
    ev = read_table(spark, sf, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hod")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wr = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("hod").asc()
    )
    peak = cells.withColumn("rk", F.row_number().over(wr)).where(
        F.col("rk") == 1
    ).select(
        "event_type",
        F.col("hod").alias("peak_hour"),
        F.col("n").alias("peak_count"),
    )
    med = cells.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)")
        .cast("bigint")
        .alias("median_count")
    )
    return peak.join(F.broadcast(med), "event_type").select(
        "event_type",
        "peak_hour",
        "peak_count",
        "median_count",
        (
            F.col("peak_count").cast("double")
            / F.col("median_count").cast("double")
        ).alias("prominence"),
    )


def _q_repeat_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """Repeat-purchase funnel: of users who purchased at all, what
    share came back on a second (and a fifth) distinct day — the
    retention headline (q72's cohort grid collapsed to the numbers a
    weekly report quotes). Distinct purchase-day counts are integers;
    two divisions."""
    ev = read_table(spark, sf, "events")
    days = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("pd"),
        )
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pdays"))
    )
    agg = days.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
        F.sum(F.when(F.col("pdays") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_repeat"),
        F.sum(F.when(F.col("pdays") >= 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_loyal"),
    )
    return agg.select(
        "n_buyers",
        "n_repeat",
        "n_loyal",
        (
            F.col("n_repeat").cast("double") / F.col("n_buyers").cast("double")
        ).alias("repeat_rate"),
        (
            F.col("n_loyal").cast("double") / F.col("n_buyers").cast("double")
        ).alias("loyal_rate"),
    )


def _q_gap_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Power-of-two histogram of inter-arrival gaps per event type —
    the HdrHistogram-style latency readout every ingestion dashboard
    draws (log₂ buckets: one row per factor-of-two band, exact
    counts). The bucket id is the BINARY-DIGIT COUNT of the integer
    µs gap (⌊log₂⌋+1 for gap ≥ 1, computed by string length — no
    float log whose last bit could disagree at exact powers of two;
    a 0-µs gap, where ⌊log₂⌋ is undefined, lands in bucket 1 with
    gap=1 because "0" is one binary digit). Pure integers
    end-to-end."""
    ev = read_table(spark, sf, "events")
    base = ev.select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts")).alias("t"),
    )
    w = Window.partitionBy("event_type").orderBy("t", "event_id")
    gaps = base.select(
        "event_type",
        (F.col("t") - F.lag("t").over(w)).alias("gap"),
    ).where(F.col("gap").isNotNull())
    bucket = F.length(
        F.conv(F.col("gap").cast("string"), 10, 2)
    ).cast("int")
    return gaps.select("event_type", bucket.alias("log2_bucket")).groupBy(
        "event_type", "log2_bucket"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"))


def _q_eval_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Hash-gated evaluator arithmetic (reference M8,
    sensor_data_regression.py:80-86 + sensor_data_classification.py:
    62-64): rmse/r2 and precision/recall/f1 computed over a FIXED
    deterministic predictor — the persistence forecast (ŷ = today's
    day-max) for regression, and "above the train-period median" for
    classification — so the metric FORMULAS are oracle-checkable
    separately from whether a model trains (q43 keeps that half,
    rows-only). Same temporal split as q43 (test = day ≥ 2024-01-25;
    the classification threshold is fit on train only). All sums are
    exact integer cents (decimal(38,0)); rmse/r2/precision/recall/f1
    each end in fixed double epilogues (one division + sqrt for rmse;
    f1 via the one-division identity 2tp/(2tp+fp+fn))."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max("value").alias("day_max")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    labeled = daily.withColumn("label", F.lead("day_max").over(w)).where(
        F.col("label").isNotNull()
    )
    split = F.lit("2024-01-25").cast("date")
    # train-period median day_max: a TABLE VALUE (percentile_disc),
    # collected as a scalar and inlined as a literal (the PSI q395
    # pattern) — no scalar crossJoin in the plan
    thr = (
        labeled.where(F.col("day") < split)
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY day_max)"
            ).alias("thr")
        )
        .collect()[0]["thr"]
    )
    cents = lambda c: (F.col(c).cast("decimal(12,2)") * 100).cast("bigint")
    test = labeled.where(F.col("day") >= split).select(
        cents("label").alias("yc"),
        cents("day_max").alias("pc"),
        (F.col("day_max") > F.lit(thr)).alias("pos_pred"),
        (F.col("label") > F.lit(thr)).alias("pos_label"),
    )
    agg = test.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(((F.col("yc") - F.col("pc")) * (F.col("yc") - F.col("pc"))).cast("decimal(38,0)")).alias("ss_res"),
        F.sum(F.col("yc").cast("decimal(38,0)")).alias("t1"),
        F.sum((F.col("yc") * F.col("yc")).cast("decimal(38,0)")).alias("t2"),
        F.sum(F.when(F.col("pos_pred") & F.col("pos_label"), 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(F.col("pos_pred") & ~F.col("pos_label"), 1).otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when(~F.col("pos_pred") & F.col("pos_label"), 1).otherwise(0)).cast("bigint").alias("fn"),
    )
    n = F.col("n_test")
    return agg.select(
        "n_test",
        F.sqrt(
            F.col("ss_res").cast("double") / (n * 10000).cast("double")
        ).alias("rmse"),
        (
            F.lit(1.0)
            - (n.cast("decimal(38,0)") * F.col("ss_res")).cast("double")
            / (
                n.cast("decimal(38,0)") * F.col("t2")
                - F.col("t1") * F.col("t1")
            ).cast("double")
        ).alias("r2"),
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double")
        ).alias("precision_hi"),
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fn")).cast("double")
        ).alias("recall_hi"),
        (
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double")
        ).alias("f1_hi"),
    )


def _q_ar1_walkforward(spark: SparkSession, sf: str) -> DataFrame:
    """Hash-gated walk-forward validation (reference T9,
    pandas_timeseries_forecast.py:26-34) for the AR(1)+intercept model:
    the closed form of ml/models.py's AR-OLS at p=1,d=0,q=0. Instead
    of refitting per step in Python, EVERY expanding-window fit comes
    from exact-integer PREFIX moments of the (lag, value) pairs —
    phi_i = (m·Σxy − Σx·Σy)/(m·Σxx − Σx²) over pairs strictly before
    step i via one window frame (UNBOUNDED PRECEDING TO 1 PRECEDING) —
    so the whole walk-forward is a single window pass, no
    applyInPandas, no recursion. Series = per-user daily max in exact
    integer cents; per-step epilogue is a fixed double op chain (one
    division for phi, one for the intercept, forecast, squared error);
    the per-user MSE folds squared errors in day order (== DuckDB's
    ordered list_reduce). Test span = last max(1, n//4) days, series
    kept only when n − n_test ≥ 3 (walk_forward_mse's guard). q25
    keeps the full (p,d,q) grid rows-only."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        (F.max("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("x")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    wp = Window.partitionBy("user_id")
    base = daily.select(
        "user_id",
        "day",
        "x",
        F.lag("x").over(w).alias("px"),
        (F.row_number().over(w) - 1).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    has_pair = F.col("px").isNotNull()
    pm = base.select(
        "user_id",
        "day",
        "x",
        "px",
        "rn",
        "n",
        F.when(has_pair, 1).otherwise(0).cast("bigint").alias("pm_m"),
        F.when(has_pair, F.col("px")).otherwise(0).alias("pm_x"),
        F.when(has_pair, F.col("x")).otherwise(0).alias("pm_y"),
        F.when(has_pair, F.col("px") * F.col("px")).otherwise(0).alias("pm_xx"),
        F.when(has_pair, F.col("px") * F.col("x")).otherwise(0).alias("pm_xy"),
    )
    prefix = w.rowsBetween(Window.unboundedPreceding, -1)
    mom = pm.select(
        "user_id",
        "day",
        "x",
        "px",
        "rn",
        "n",
        F.sum("pm_m").over(prefix).alias("m"),
        F.sum("pm_x").over(prefix).alias("sx"),
        F.sum("pm_y").over(prefix).alias("sy"),
        F.sum("pm_xx").over(prefix).alias("sxx"),
        F.sum("pm_xy").over(prefix).alias("sxy"),
    )
    n_test = F.greatest(F.lit(1).cast("bigint"), (F.col("n") / 4).cast("bigint"))
    d38 = "decimal(38,0)"
    a_num = (
        F.col("m").cast(d38) * F.col("sxy").cast(d38)
        - F.col("sx").cast(d38) * F.col("sy").cast(d38)
    )
    b_den = (
        F.col("m").cast(d38) * F.col("sxx").cast(d38)
        - F.col("sx").cast(d38) * F.col("sx").cast(d38)
    )
    phi = a_num.cast("double") / b_den.cast("double")
    steps = (
        mom.where(
            (F.col("n") - n_test >= 3) & (F.col("rn") >= F.col("n") - n_test)
        )
        .withColumn("phi", phi)
        .withColumn(
            "c",
            (
                F.col("sy").cast("double")
                - F.col("phi") * F.col("sx").cast("double")
            )
            / F.col("m").cast("double"),
        )
        .withColumn(
            "fc", F.col("c") + F.col("phi") * F.col("px").cast("double")
        )
        .withColumn("err", F.col("x").cast("double") - F.col("fc"))
        .withColumn("se", F.col("err") * F.col("err"))
    )
    return (
        steps.groupBy("user_id")
        .agg(
            F.max("n").alias("n_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("day", "se"))),
                    lambda s: s["se"],
                ),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            ).alias("sse"),
        )
        .select(
            "user_id",
            "n_days",
            "n_test",
            (F.col("sse") / F.col("n_test").cast("double")).alias("mse_c2"),
        )
    )


register_many(
    {
        'q439_lorenz_points': _q_lorenz_points,
        'q440_peak_hour': _q_peak_hour,
        'q441_repeat_purchase': _q_repeat_purchase,
        'q442_gap_histogram': _q_gap_histogram,
        'q443_eval_metrics': _q_eval_metrics,
        'q444_ar1_walkforward': _q_ar1_walkforward,
    },
    {
        'q439_lorenz_points': """
            WITH o AS (
              SELECT o_custkey,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS cents
              FROM orders
            ),
            per_cust AS (
              SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS rev
              FROM o GROUP BY o_custkey
            ),
            cut AS (
              SELECT rev, ntot, rtot,
                CAST(rn10 // ntot AS INT) AS decile
              FROM (
                SELECT rev,
                  (CAST(row_number() OVER (
                    ORDER BY rev ASC, o_custkey ASC) AS BIGINT) - 1)
                    * 10 AS rn10,
                  CAST(count(*) OVER () AS BIGINT) AS ntot,
                  CAST(sum(rev) OVER () AS BIGINT) AS rtot
                FROM per_cust
              )
            ),
            per AS (
              SELECT decile,
                CAST(count(*) AS BIGINT) AS n_customers,
                CAST(sum(rev) AS BIGINT) AS rev_cents,
                CAST(max(ntot) AS BIGINT) AS ntot,
                CAST(max(rtot) AS BIGINT) AS rtot
              FROM cut GROUP BY decile
            ),
            cum AS (
              SELECT decile, n_customers, rev_cents, ntot, rtot,
                CAST(sum(n_customers) OVER (ORDER BY decile
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
                CAST(sum(rev_cents) OVER (ORDER BY decile
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev
              FROM per
            )
            SELECT decile, n_customers, rev_cents,
              CAST(cum_n AS DOUBLE) / CAST(ntot AS DOUBLE)
                AS cum_pop_share,
              CAST(cum_rev AS DOUBLE) / CAST(rtot AS DOUBLE)
                AS cum_rev_share
            FROM cum
        """,
        'q440_peak_hour': """
            WITH cells AS (
              SELECT event_type, CAST(hour(ts) AS INT) AS hod,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            peak AS (
              SELECT event_type, hod AS peak_hour,
                n AS peak_count
              FROM (
                SELECT *, row_number() OVER (PARTITION BY event_type
                  ORDER BY n DESC, hod ASC) AS rk
                FROM cells
              ) WHERE rk = 1
            ),
            med AS (
              SELECT event_type,
                CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n)
                  AS BIGINT) AS median_count
              FROM cells GROUP BY event_type
            )
            SELECT p.event_type, p.peak_hour, p.peak_count,
              m.median_count,
              CAST(p.peak_count AS DOUBLE)
                / CAST(m.median_count AS DOUBLE) AS prominence
            FROM peak p JOIN med m ON m.event_type = p.event_type
        """,
        'q441_repeat_purchase': """
            WITH days AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS pdays
              FROM (
                SELECT DISTINCT user_id,
                  CAST(date_trunc('day', ts) AS DATE) AS pd
                FROM events WHERE event_type = 'purchase'
              ) GROUP BY user_id
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n_buyers,
                CAST(sum(CASE WHEN pdays >= 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_repeat,
                CAST(sum(CASE WHEN pdays >= 5 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_loyal
              FROM days
            )
            SELECT n_buyers, n_repeat, n_loyal,
              CAST(n_repeat AS DOUBLE) / CAST(n_buyers AS DOUBLE)
                AS repeat_rate,
              CAST(n_loyal AS DOUBLE) / CAST(n_buyers AS DOUBLE)
                AS loyal_rate
            FROM agg
        """,
        'q442_gap_histogram': """
            WITH base AS (
              SELECT event_type, event_id, epoch_us(ts) AS t
              FROM events
            ),
            gaps AS (
              SELECT event_type,
                t - lag(t) OVER (
                  PARTITION BY event_type ORDER BY t, event_id)
                  AS gap
              FROM base
            )
            SELECT event_type,
              CAST(length(bin(gap)) AS INT) AS log2_bucket,
              CAST(count(*) AS BIGINT) AS n_gaps
            FROM gaps WHERE gap IS NOT NULL
            GROUP BY 1, 2
        """,
        'q443_eval_metrics': """
            WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day,
                max(value) AS day_max
              FROM events GROUP BY 1, 2
            ),
            labeled AS (
              SELECT user_id, day, day_max,
                lead(day_max) OVER (PARTITION BY user_id ORDER BY day)
                  AS label
              FROM daily
            ),
            lab AS (SELECT * FROM labeled WHERE label IS NOT NULL),
            thr AS (
              SELECT quantile_disc(day_max, 0.5) AS t
              FROM lab WHERE day < DATE '2024-01-25'
            ),
            test AS (
              SELECT
                CAST(CAST(label AS DECIMAL(12,2)) * 100 AS BIGINT) AS yc,
                CAST(CAST(day_max AS DECIMAL(12,2)) * 100 AS BIGINT)
                  AS pc,
                day_max > (SELECT t FROM thr) AS pos_pred,
                label > (SELECT t FROM thr) AS pos_label
              FROM lab WHERE day >= DATE '2024-01-25'
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n_test,
                sum((yc - pc) * (yc - pc)) AS ss_res,
                sum(yc) AS t1,
                sum(yc * yc) AS t2,
                CAST(sum(CASE WHEN pos_pred AND pos_label
                              THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(sum(CASE WHEN pos_pred AND NOT pos_label
                              THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                CAST(sum(CASE WHEN NOT pos_pred AND pos_label
                              THEN 1 ELSE 0 END) AS BIGINT) AS fn
              FROM test
            )
            SELECT n_test,
              sqrt(CAST(ss_res AS DOUBLE)
                   / CAST(n_test * 10000 AS DOUBLE)) AS rmse,
              1.0 - CAST(n_test * ss_res AS DOUBLE)
                  / CAST(n_test * t2 - t1 * t1 AS DOUBLE) AS r2,
              CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                AS precision_hi,
              CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall_hi,
              CAST(2 * tp AS DOUBLE)
                / CAST(2 * tp + fp + fn AS DOUBLE) AS f1_hi
            FROM agg
        """,
        'q444_ar1_walkforward': """
            WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day,
                CAST(CAST(max(value) AS DECIMAL(12,2)) * 100 AS BIGINT)
                  AS x
              FROM events GROUP BY 1, 2
            ),
            base AS (
              SELECT user_id, day, x,
                lag(x) OVER win AS px,
                row_number() OVER win - 1 AS rn,
                CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
                  AS n
              FROM daily
              WINDOW win AS (PARTITION BY user_id ORDER BY day)
            ),
            pm AS (
              SELECT *,
                CASE WHEN px IS NOT NULL THEN 1 ELSE 0 END AS pm_m,
                CASE WHEN px IS NOT NULL THEN px ELSE 0 END AS pm_x,
                CASE WHEN px IS NOT NULL THEN x ELSE 0 END AS pm_y,
                CASE WHEN px IS NOT NULL THEN px * px ELSE 0 END
                  AS pm_xx,
                CASE WHEN px IS NOT NULL THEN px * x ELSE 0 END
                  AS pm_xy
              FROM base
            ),
            mom AS (
              SELECT user_id, day, x, px, rn, n,
                sum(pm_m) OVER pre AS m,
                sum(pm_x) OVER pre AS sx,
                sum(pm_y) OVER pre AS sy,
                sum(pm_xx) OVER pre AS sxx,
                sum(pm_xy) OVER pre AS sxy
              FROM pm
              WINDOW pre AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            ),
            steps AS (
              SELECT user_id, day, x, px, n, m, sx, sy,
                CAST(m * sxy - sx * sy AS DOUBLE)
                  / CAST(m * sxx - sx * sx AS DOUBLE) AS phi
              FROM mom
              WHERE n - greatest(1, n // 4) >= 3
                AND rn >= n - greatest(1, n // 4)
            ),
            ep AS (
              SELECT user_id, day, x, px, n, phi,
                (CAST(sy AS DOUBLE) - phi * CAST(sx AS DOUBLE))
                  / CAST(m AS DOUBLE) AS c
              FROM steps
            ),
            se AS (
              SELECT user_id, day, n,
                (CAST(x AS DOUBLE) - (c + phi * CAST(px AS DOUBLE)))
                  * (CAST(x AS DOUBLE) - (c + phi * CAST(px AS DOUBLE)))
                  AS se
              FROM ep
            )
            SELECT user_id, max(n) AS n_days,
              CAST(count(*) AS BIGINT) AS n_test,
              list_reduce(list(se ORDER BY day), (a, b) -> a + b)
                / CAST(count(*) AS DOUBLE) AS mse_c2
            FROM se GROUP BY user_id
        """,
    },
)
