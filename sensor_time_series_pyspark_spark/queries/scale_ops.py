"""Scale-path twins of the headline skew-sensitive operators
(q570+, round 8): the split variants of sessionize and asof_join run
through the SAME DuckDB oracles as their unsplit queries (q15/q29),
so the driver's hash gate certifies the boundary-stitching algebra —
not just a self-comparison test. See SCALING.md "Hot-series
stragglers" for the measured 90%-hot-key wins (4.6x / 3.2x) and the
crossover analysis."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators import (
    asof_join_split,
    sessionize_split,
)
from sensor_time_series_pyspark_spark.queries.common import (
    _SESSIONIZE_SQL,
)
from sensor_time_series_pyspark_spark.queries.registry import register_many
from sensor_time_series_pyspark_spark.sources.readers import read_table


def _q_sessionize_split(spark: SparkSession, sf: str) -> DataFrame:
    """q15's 30-minute sessionization through sessionize_split
    (operators/sessionize.py): 6-hour range buckets, boundary
    sessions stitched on the bucket-grain summary. Hash-gated against
    the SAME oracle as q15 — the split must be indistinguishable from
    the single-window pass."""
    ev = read_table(spark, sf, "events")
    sess = sessionize_split(
        ev,
        ts_col="ts",
        partition_by=["user_id"],
        gap_seconds=1800,
        bucket_seconds=6 * 3600,
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def _q_asof_join_split(spark: SparkSession, sf: str) -> DataFrame:
    """q29's as-of join through asof_join_split (operators/asof.py):
    1-day buckets, carry-forward seeds rolled over the right-side
    bucket summary. Hash-gated against the SAME ASOF LEFT JOIN oracle
    as q29."""
    ev = read_table(spark, sf, "events")
    o = read_table(spark, sf, "orders")
    daily_orders = o.groupBy(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
    ).agg(F.max("o_totalprice").alias("last_order_price"))
    out = asof_join_split(
        ev,
        daily_orders,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["last_order_price"],
        bucket_seconds=86_400,
    )
    return out.select("event_id", "user_id", "ts", "last_order_price")


register_many(
    {
        "q570_sessionize_split": _q_sessionize_split,
        "q571_asof_join_split": _q_asof_join_split,
    },
    {
        "q570_sessionize_split": _SESSIONIZE_SQL,
        "q571_asof_join_split": """
            SELECT e.event_id, e.user_id, e.ts, d.last_order_price
            FROM events e
            ASOF LEFT JOIN (
              SELECT o_custkey AS user_id, o_orderdate,
                     max(o_totalprice) AS last_order_price
              FROM orders GROUP BY 1, 2
            ) d ON e.user_id = d.user_id AND e.ts >= d.o_orderdate
        """,
    },
)
