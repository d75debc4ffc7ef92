"""Hash-gated forecasting backtests (round 6): closes VERDICT r5 #6 —
extend the q444 prefix-moment template so more of q25's ARIMA grid is
differentially verified instead of rows-only.

q508 gates the ARI(1,1) combo — AR(1)+intercept on FIRST DIFFERENCES,
integrated back — which by ml/models.py's MA-absorption (arima():
p := p+q) also covers the grid's (0,1,1) row. Together with q444
(1,0,0), every d<=1, p+q<=1 grid row is now hash-gated; q25 keeps the
full grid (p=2 etc.) rows-only.

Template (see q444, queries/inference.py): every expanding-window
refit is closed-form off EXACT integer prefix moments, so the whole
walk-forward is one window pass — no applyInPandas, no per-step refit,
no recursion. The reference refits statsmodels per step per combo
(pandas_timeseries_forecast.py:26-55); at 100 TB that is m refits per
series — here it is a single shuffle on the series key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.queries.common import read_table
from sensor_time_series_pyspark_spark.queries.registry import register_many


def _q_ari11_walkforward(spark: SparkSession, sf: str) -> DataFrame:
    """Walk-forward one-step MSE for ARI(1,1): per step i, fit
    d_t = c + phi*d_{t-1} by OLS on the history's consecutive-diff
    pairs (exact integer prefix moments, strictly-before window),
    forecast x_i = x_{i-1} + c + phi*d_{i-1}, square the error, fold
    per-user in day order. Fallback when the differenced history has
    <= 2 points (ml/models.py:_fit_ar_ols n <= p+1 guard): drift-only,
    fc_diff = mean(history diffs). Same series, guards, and test span
    as q444: per-user daily max in integer cents, test = last
    max(1, n//4) days, series kept when n - n_test >= 3."""
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
        (F.col("x") - F.lag("x").over(w)).alias("d"),
        (F.row_number().over(w) - 1).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    ).withColumn("pd", F.lag("d").over(w))
    has_d = F.col("d").isNotNull()
    has_pair = F.col("pd").isNotNull()
    pm = base.select(
        "user_id",
        "day",
        "x",
        "px",
        "d",
        "pd",
        "rn",
        "n",
        F.when(has_d, 1).otherwise(0).cast("bigint").alias("dm_m"),
        F.when(has_d, F.col("d")).otherwise(0).alias("dm_s"),
        F.when(has_pair, 1).otherwise(0).cast("bigint").alias("pm_m"),
        F.when(has_pair, F.col("pd")).otherwise(0).alias("pm_x"),
        F.when(has_pair, F.col("d")).otherwise(0).alias("pm_y"),
        F.when(has_pair, F.col("pd") * F.col("pd")).otherwise(0).alias("pm_xx"),
        F.when(has_pair, F.col("pd") * F.col("d")).otherwise(0).alias("pm_xy"),
    )
    prefix = w.rowsBetween(Window.unboundedPreceding, -1)
    mom = pm.select(
        "user_id",
        "day",
        "x",
        "px",
        "pd",
        "rn",
        "n",
        F.sum("dm_m").over(prefix).alias("md"),
        F.sum("dm_s").over(prefix).alias("sd"),
        F.sum("pm_m").over(prefix).alias("mp"),
        F.sum("pm_x").over(prefix).alias("spx"),
        F.sum("pm_y").over(prefix).alias("spy"),
        F.sum("pm_xx").over(prefix).alias("spxx"),
        F.sum("pm_xy").over(prefix).alias("spxy"),
    )
    n_test = F.greatest(F.lit(1).cast("bigint"), (F.col("n") / 4).cast("bigint"))
    d38 = "decimal(38,0)"
    num = (
        F.col("mp").cast(d38) * F.col("spxy").cast(d38)
        - F.col("spx").cast(d38) * F.col("spy").cast(d38)
    )
    den = (
        F.col("mp").cast(d38) * F.col("spxx").cast(d38)
        - F.col("spx").cast(d38) * F.col("spx").cast(d38)
    )
    phi = num.cast("double") / den.cast("double")
    steps = (
        mom.where(
            (F.col("n") - n_test >= 3) & (F.col("rn") >= F.col("n") - n_test)
        )
        .withColumn("phi", F.when(F.col("md") <= 2, F.lit(0.0)).otherwise(phi))
        .withColumn(
            "c",
            F.when(
                F.col("md") <= 2,
                F.col("sd").cast("double") / F.col("md").cast("double"),
            ).otherwise(
                (
                    F.col("spy").cast("double")
                    - F.col("phi") * F.col("spx").cast("double")
                )
                / F.col("mp").cast("double")
            ),
        )
        .withColumn(
            "fc",
            F.col("px").cast("double")
            + F.col("c")
            + F.col("phi") * F.col("pd").cast("double"),
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
        "q508_ari11_walkforward": _q_ari11_walkforward,
    },
    {
        # Same prefix-moment template as the q444 oracle, on first
        # differences; md<=2 branch replicates the drift-only fallback.
        "q508_ari11_walkforward": """
            WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day,
                CAST(CAST(max(value) AS DECIMAL(12,2)) * 100 AS BIGINT)
                  AS x
              FROM events GROUP BY 1, 2
            ),
            base0 AS (
              SELECT user_id, day, x,
                lag(x) OVER win AS px,
                x - lag(x) OVER win AS d,
                row_number() OVER win - 1 AS rn,
                CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
                  AS n
              FROM daily
              WINDOW win AS (PARTITION BY user_id ORDER BY day)
            ),
            base AS (
              SELECT *, lag(d) OVER win AS pd
              FROM base0
              WINDOW win AS (PARTITION BY user_id ORDER BY day)
            ),
            pm AS (
              SELECT *,
                CASE WHEN d IS NOT NULL THEN 1 ELSE 0 END AS dm_m,
                CASE WHEN d IS NOT NULL THEN d ELSE 0 END AS dm_s,
                CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS pm_m,
                CASE WHEN pd IS NOT NULL THEN pd ELSE 0 END AS pm_x,
                CASE WHEN pd IS NOT NULL THEN d ELSE 0 END AS pm_y,
                CASE WHEN pd IS NOT NULL THEN pd * pd ELSE 0 END
                  AS pm_xx,
                CASE WHEN pd IS NOT NULL THEN pd * d ELSE 0 END
                  AS pm_xy
              FROM base
            ),
            mom AS (
              SELECT user_id, day, x, px, pd, rn, n,
                sum(dm_m) OVER pre AS md,
                sum(dm_s) OVER pre AS sd,
                sum(pm_m) OVER pre AS mp,
                sum(pm_x) OVER pre AS spx,
                sum(pm_y) OVER pre AS spy,
                sum(pm_xx) OVER pre AS spxx,
                sum(pm_xy) OVER pre AS spxy
              FROM pm
              WINDOW pre AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            ),
            steps AS (
              SELECT user_id, day, x, px, pd, n, md, sd, mp, spx, spy,
                CASE WHEN md <= 2 THEN 0.0
                  ELSE CAST(mp * spxy - spx * spy AS DOUBLE)
                    / CAST(mp * spxx - spx * spx AS DOUBLE)
                END AS phi
              FROM mom
              WHERE n - greatest(1, n // 4) >= 3
                AND rn >= n - greatest(1, n // 4)
            ),
            ep AS (
              SELECT user_id, day, x, px, pd, n, phi,
                CASE WHEN md <= 2
                  THEN CAST(sd AS DOUBLE) / CAST(md AS DOUBLE)
                  ELSE (CAST(spy AS DOUBLE) - phi * CAST(spx AS DOUBLE))
                    / CAST(mp AS DOUBLE)
                END AS c
              FROM steps
            ),
            se AS (
              SELECT user_id, day, n,
                (CAST(x AS DOUBLE)
                  - (CAST(px AS DOUBLE) + c + phi * CAST(pd AS DOUBLE)))
                * (CAST(x AS DOUBLE)
                  - (CAST(px AS DOUBLE) + c + phi * CAST(pd AS DOUBLE)))
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
