"""Skew-mitigation and bucketing operators: salted rewrites must be
EXACT (same rows as the plain plan), and bucketed joins must be
shuffle-free — the two properties that make them safe and worthwhile
at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators import (
    read_bucketed,
    salted_agg,
    salted_join,
    write_bucketed,
)
from sensor_time_series_pyspark_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    ev = read_table(spark, SF, "events").select("event_id", "user_id")
    c = read_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    plain = ev.join(c, "user_id")
    salted = salted_join(ev, c, ["user_id"], salt=4)
    cols = ["event_id", "user_id", "c_nationkey"]
    assert rows(salted, cols) == rows(plain, cols)


def test_salted_agg_equals_plain_agg(spark):
    ev = read_table(spark, SF, "events")
    plain = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.max("value").alias("mx"),
        F.min("value").alias("mn"),
    )
    salted = salted_agg(
        ev,
        ["event_type"],
        {"n": ("count", F.col("value")), "mx": ("max", F.col("value")), "mn": ("min", F.col("value"))},
        salt=4,
    )
    cols = ["event_type", "n", "mx", "mn"]
    assert rows(salted, cols) == rows(plain, cols)


def test_salted_agg_rejects_non_mergeable(spark):
    ev = read_table(spark, SF, "events")
    with pytest.raises(ValueError):
        salted_agg(ev, ["event_type"], {"a": ("avg", F.col("value"))})


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    o = read_table(spark, SF, "orders")
    li = read_table(spark, SF, "lineitem")
    write_bucketed(o, "b_orders", ["o_orderkey"], 4, path=str(tmp_path / "o"))
    write_bucketed(
        li, "b_lineitem", ["l_orderkey"], 4, path=str(tmp_path / "l")
    )
    bo = read_bucketed(spark, "b_orders")
    bl = read_bucketed(spark, "b_lineitem")
    # force sort-merge (broadcast would trivially avoid the exchange)
    joined = bo.hint("merge").join(bl, bo["o_orderkey"] == bl["l_orderkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    # and it returns the same rows as the plain join
    assert joined.count() == o.join(li, o["o_orderkey"] == li["l_orderkey"]).count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
