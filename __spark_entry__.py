"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship sensor-ETL analog on sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (+ north-star extensions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each SQL-expressible query.

Conventions (keep these or the value-hash comparison breaks):
- every computed/aggregate column is aliased identically on both sides;
- SUMs/AVGs over double columns are computed EXACTLY: operands are cast
  to decimal, summed (exact, order-independent), cast back to double,
  and averages do one final double division. Plain double sums differ
  in low bits between engines (summation order), and rounding can't fix
  half-boundary cases — decimal arithmetic makes both engines
  bit-identical with no rounding at all;
- DuckDB ``count(*)``/``sum(int)``/``row_number`` are cast to Spark's types;
- timestamps: Spark session TZ is UTC; DuckDB buckets are built with
  ``make_timestamp`` (naive) to match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.functions.text import (
    stopword_ratio,
    token_count,
    tokens,
    STOPWORDS,
)
from sensor_time_series_pyspark_spark.operators import (
    lead_target,
    pivot_wide,
    resample,
    sessionize,
)
from sensor_time_series_pyspark_spark.ml import (
    classification_pipeline,
    decode_predictions,
    decompose,
    fit_forecast,
    grid_search_forecast,
    regression_pipeline,
    temporal_split,
)
from sensor_time_series_pyspark_spark.plans import sensor_etl
from sensor_time_series_pyspark_spark.sources.readers import read_table

SF0001 = "/root/testdata/sf0.001"

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

# Deterministic aggregate helpers (see module docstring). DEC is wide
# enough for any testdata sum; 6 fractional digits covers 2-decimal
# money columns and their 3-factor products.
DEC = "decimal(38,6)"


def _dsum(col: F.Column) -> F.Column:
    """Exact, order-independent sum of a double column → double."""
    return F.sum(col.cast(DEC)).cast("double")


def _davg(col: F.Column) -> F.Column:
    """Deterministic mean: exact decimal sum, one double division."""
    return _dsum(col) / F.count(col)


def _dec(name: str) -> F.Column:
    """Column cast to decimal(12,2) for exact product arithmetic."""
    return F.col(name).cast("decimal(12,2)")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return sensor_etl(spark, SF0001)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_flagship(spark: SparkSession, sf: str) -> DataFrame:
    df = sensor_etl(spark, sf)
    return df.select(
        "bucket", "c_nationkey", *EVENT_TYPES, "severity", "n_events", "n_name"
    )


def _q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: the reference's A1-style multi-agg groupBy at
    fact scale (hash aggregate, map-side partials, one shuffle)."""
    li = read_table(spark, sf, "lineitem")
    one = F.lit(1).cast("decimal(12,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount"))
    charge = disc_price * (one + _dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            _davg(F.col("l_quantity")).alias("avg_qty"),
            _davg(F.col("l_extendedprice")).alias("avg_price"),
            _davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_segment_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two fact joins → agg
    (reference J1/J4 composition). Catalyst broadcast-joins the filtered
    customer side under AQE."""
    c = read_table(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = read_table(spark, sf, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


def _q_region_supplier_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Snowflake dim chain with broadcast joins (reference J3)."""
    s = read_table(spark, sf, "supplier")
    n = read_table(spark, sf, "nation")
    r = read_table(spark, sf, "region")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            _davg(F.col("s_acctbal")).alias("avg_acctbal"),
        )
    )


def _q_event_type_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Long→wide pivot via one-shuffle conditional aggregation
    (reference A2+A6, operators/pivot.py)."""
    ev = read_table(spark, sf, "events")
    wide = pivot_wide(
        ev,
        keys=["user_id"],
        pivot_col="event_type",
        pivot_values=EVENT_TYPES,
        value_col="value",
        agg="avg_decimal",
        extra_aggs=[F.count(F.lit(1)).alias("n_events")],
    ).na.fill({t: 0.0 for t in EVENT_TYPES})
    return wide.select("user_id", *EVENT_TYPES, "n_events")


def _q_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Anti join (SURVEY.md §2.3: absent from the reference — part of a
    complete relational surface)."""
    c = read_table(spark, sf, "customer")
    o = read_table(spark, sf, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


def _q_top_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Top-K per group via row_number (deterministic tiebreak on key)."""
    o = read_table(spark, sf, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def _q_next_day_max(spark: SparkSession, sf: str) -> DataFrame:
    """Daily max + lead-as-label (reference A3+W1+J4 collapsed: the
    self-join at sensor_data_regression.py:46 is unnecessary — the lead
    window runs directly on the daily aggregate, partitioned by entity)."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.max("value").alias("day_max"))
    return lead_target(
        daily, order_col="day", target_col="day_max",
        partition_by=["user_id"], out_col="next_day_max",
    )


def _q_resample_30min(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 30-minute resample (reference T1, native)."""
    ev = read_table(spark, sf, "events")
    return resample(
        ev,
        ts_col="ts",
        width="30 minutes",
        keys=["event_type"],
        aggs=[
            _davg(F.col("value")).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        ],
    )


def _q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap)."""
    ev = read_table(spark, sf, "events")
    sess = sessionize(ev, ts_col="ts", partition_by=["user_id"], gap_seconds=1800)
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def _q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup via content hash (north-star; md5 matches DuckDB)."""
    docs = read_table(spark, sf, "documents")
    return docs.groupBy(F.md5("text").alias("fp")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_doc_id"),
    )


def _q_doc_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Text-quality features, all JVM-side expressions (north-star)."""
    docs = read_table(spark, sf, "documents")
    toks = tokens("text")
    total_chars = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
    n = token_count("text")
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        (total_chars / n).alias("avg_token_len"),
        stopword_ratio("text").alias("stop_ratio"),
    )


def _daily_series(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user daily mean value — the bounded per-series frame every
    forecasting query starts from (resample NATIVELY before any
    applyInPandas so Python groups stay small; ml/forecast.py)."""
    ev = read_table(spark, sf, "events")
    return ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        _davg(F.col("value")).alias("value")
    )


def _q_holt_forecast(spark: SparkSession, sf: str) -> DataFrame:
    """7-step Holt forecast per user (reference T5/T7 done per-series;
    no SQL oracle — invariants tested in tests/test_forecast.py)."""
    daily = _daily_series(spark, sf)
    return fit_forecast(
        daily, series_keys=["user_id"], ts_col="day", value_col="value",
        horizon=7, model="holt",
    )


def _q_arima_grid(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed (p,d,q) grid search (reference T6: the nested loop at
    pandas_timeseries_forecast.py:22-55 re-shaped as a parameter
    DataFrame → per-combo Arrow groups → min_by)."""
    daily = _daily_series(spark, sf)
    grid = [
        {"p": 1, "d": 0, "q": 0},
        {"p": 1, "d": 1, "q": 0},
        {"p": 2, "d": 0, "q": 0},
        {"p": 0, "d": 1, "q": 1},
    ]
    return grid_search_forecast(
        daily, series_keys=["user_id"], ts_col="day", value_col="value",
        grid=grid, model="arima",
    )


def _q_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly additive decomposition per user (reference T8)."""
    daily = _daily_series(spark, sf)
    return decompose(
        daily, series_keys=["user_id"], ts_col="day", value_col="value", period=7
    )


def _q_mlp_classification(spark: SparkSession, sf: str) -> DataFrame:
    """MLP event-profile → nation classifier (reference 3a re-shaped:
    4 gas readings → label becomes 5 event-type averages → n_name).
    Temporal split, seeded; returns per-class prediction counts."""
    wide = sensor_etl(spark, sf)
    train, test = temporal_split(wide, "bucket", "2024-01-25")
    n_classes = 25
    pipe = classification_pipeline(
        EVENT_TYPES, "n_name", hidden=20, n_classes=n_classes, seed=42, max_iter=20
    )
    model = pipe.fit(train)
    preds = decode_predictions(model, model.transform(test))
    return preds.groupBy("predicted_label").agg(F.count(F.lit(1)).alias("n"))


def _q_gbt_regression(spark: SparkSession, sf: str) -> DataFrame:
    """GBT next-day-max regression (reference 3b: daily max + epoch
    features → lead-1 label, sensor_data_regression.py). Seeded."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max("value").alias("day_max")
    )
    labeled = lead_target(
        daily, order_col="day", target_col="day_max",
        partition_by=["user_id"], out_col="next_day_max",
    ).withColumn("epoch_day", F.unix_date("day").cast("double"))
    train, test = temporal_split(labeled, "day", "2024-01-25")
    pipe = regression_pipeline(
        ["day_max", "epoch_day", "user_id"], "next_day_max", seed=42, max_iter=10
    )
    model = pipe.fit(train)
    return model.transform(test).select("user_id", "day", "next_day_max", "prediction")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship_hourly_wide": _q_flagship,
        "q01_pricing_summary": _q_pricing_summary,
        "q03_segment_revenue": _q_segment_revenue,
        "q04_region_supplier_stats": _q_region_supplier_stats,
        "q05_event_type_pivot": _q_event_type_pivot,
        "q06_customers_without_orders": _q_customers_without_orders,
        "q09_top_orders_per_customer": _q_top_orders_per_customer,
        "q10_next_day_max": _q_next_day_max,
        "q11_resample_30min": _q_resample_30min,
        "q15_sessionize": _q_sessionize,
        "q17_dedup_exact": _q_dedup_exact,
        "q22_doc_stats": _q_doc_stats,
        "q24_holt_forecast": _q_holt_forecast,
        "q25_arima_grid": _q_arima_grid,
        "q26_seasonal_decompose": _q_seasonal_decompose,
        "q27_mlp_classification": _q_mlp_classification,
        "q28_gbt_regression": _q_gbt_regression,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect; tables pre-registered as views)
# ---------------------------------------------------------------------------

_STOPWORD_LIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def _davg_sql(col: str, filt: str | None = None) -> str:
    """DuckDB twin of _davg: exact decimal sum → double, one division."""
    f = f" FILTER (WHERE {filt})" if filt else ""
    return (
        f"CAST(sum(CAST({col} AS DECIMAL(38,6))){f} AS DOUBLE) / count({col}){f}"
    )


def _pivot_avg_sql(t: str) -> str:
    return "coalesce(" + _davg_sql("value", "event_type='" + t + "'") + ", 0)"


_FLAGSHIP_SQL = """
WITH filtered AS (
  SELECT * FROM events WHERE value IS NOT NULL AND value >= 0
),
joined AS (
  SELECT make_timestamp(CAST(floor(epoch(ts)/3600) AS BIGINT)*3600*1000000) AS bucket,
         c_nationkey, trim(event_type) AS event_type, value
  FROM filtered JOIN customer ON user_id = c_custkey
),
agg AS (
  SELECT bucket, c_nationkey,
    {click} AS click,
    {view} AS view,
    {purchase} AS purchase,
    {signup} AS signup,
    {error} AS error,
    max(value) AS severity,
    count(*) AS n_events
  FROM joined GROUP BY bucket, c_nationkey
)
SELECT agg.*, n_name FROM agg JOIN nation ON c_nationkey = n_nationkey
""".format(**{t: _pivot_avg_sql(t) for t in EVENT_TYPES})

_PIVOT_SQL = """
SELECT user_id,
  {click} AS click,
  {view} AS view,
  {purchase} AS purchase,
  {signup} AS signup,
  {error} AS error,
  count(*) AS n_events
FROM events GROUP BY user_id
""".format(**{t: _pivot_avg_sql(t) for t in EVENT_TYPES})

_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY user_id, session_seq
"""

_DOC_STATS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS tok,
    length(regexp_replace(trim(text), '\\s+', '', 'g')) AS total_chars
  FROM documents
)
SELECT doc_id,
  CAST(len(tok) AS INT) AS n_tokens,
  total_chars / len(tok) AS avg_token_len,
  CASE WHEN len(tok) > 0
       THEN len(list_filter(tok, t -> list_contains({_STOPWORD_LIST}, lower(t)))) / len(tok)
       ELSE 0 END AS stop_ratio
FROM toks
"""


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_hourly_wide": _FLAGSHIP_SQL,
        "q01_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                   * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
              {_davg_sql('l_quantity')} AS avg_qty,
              {_davg_sql('l_extendedprice')} AS avg_price,
              {_davg_sql('l_discount')} AS avg_disc,
              count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q03_segment_revenue": """
            SELECT o_orderkey, o_orderdate, o_orderpriority,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
        """,
        "q04_region_supplier_stats": """
            SELECT r_name, n_name, count(*) AS n_suppliers,
              {avg_acctbal} AS avg_acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """.format(avg_acctbal=_davg_sql("s_acctbal")),
        "q05_event_type_pivot": _PIVOT_SQL,
        "q06_customers_without_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "q09_top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
              FROM orders
            ) WHERE rn <= 3
        """,
        "q10_next_day_max": """
            WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day, max(value) AS day_max
              FROM events GROUP BY 1, 2
            ),
            led AS (
              SELECT user_id, day, day_max,
                lead(day_max) OVER (PARTITION BY user_id ORDER BY day) AS next_day_max
              FROM daily
            )
            SELECT * FROM led WHERE next_day_max IS NOT NULL
        """,
        "q11_resample_30min": f"""
            SELECT event_type,
              {_davg_sql('value')} AS avg_value,
              count(*) AS n,
              make_timestamp(CAST(floor(epoch(ts)/1800) AS BIGINT)*1800*1000000) AS bucket
            FROM events GROUP BY event_type, bucket
        """,
        "q15_sessionize": _SESSIONIZE_SQL,
        "q17_dedup_exact": """
            SELECT md5(text) AS fp, count(*) AS n_copies, min(doc_id) AS keep_doc_id
            FROM documents GROUP BY 1
        """,
        "q22_doc_stats": _DOC_STATS_SQL,
    }
