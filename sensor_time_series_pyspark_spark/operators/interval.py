"""Bucketed interval (range) join.

Absent from the reference (SURVEY.md §2.3 "not present" list) but a core
temporal-analytics operator. The naive plan for
``right_ts BETWEEN left_ts + lo AND left_ts + hi`` is a broadcast
nested-loop join — O(|L|·|R|) and a non-starter at 100 TB. Bucketing
makes it a hash equi-join: quantize both sides to width-(hi-lo) time
buckets, explode the left row into the (≤2) buckets its interval can
touch, equi-join on (keys, bucket), then apply the exact range filter.
Cost: one ≤2x row duplication on the left + a normal shuffle join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``right`` whose ``right_ts`` falls in
    ``[left_ts + lower_seconds, left_ts + upper_seconds]`` per left row,
    matched within the ``on`` equi-keys.

    ``how='inner'`` only (outer variants need unmatched-left recovery —
    compose with a left join on a marker if needed).
    """
    if how != "inner":
        raise NotImplementedError("interval_join supports how='inner'")
    span = float(upper_seconds - lower_seconds)
    if span <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")

    def _epoch(df: DataFrame, name: str):
        # TIMESTAMP_NTZ has no direct double cast; route it through
        # TIMESTAMP (session-TZ interpretation — UTC per session.py).
        c = F.col(name)
        if df.schema[name].dataType.simpleString() == "timestamp_ntz":
            c = c.cast("timestamp")
        return c.cast("double")

    lt = _epoch(left, left_ts)
    rt = _epoch(right, right_ts)

    lo_bucket = F.floor((lt + F.lit(lower_seconds)) / F.lit(span))
    hi_bucket = F.floor((lt + F.lit(upper_seconds)) / F.lit(span))
    l = left.withColumn(
        "__bucket", F.explode(F.array_distinct(F.array(lo_bucket, hi_bucket)))
    )
    r = right.withColumn("__bucket", F.floor(rt / F.lit(span)))

    joined = l.join(r, [*on, "__bucket"])
    in_range = (rt >= lt + F.lit(lower_seconds)) & (rt <= lt + F.lit(upper_seconds))
    return joined.where(in_range).drop("__bucket")
