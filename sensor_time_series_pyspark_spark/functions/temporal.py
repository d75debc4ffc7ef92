"""Temporal scalar expressions (reference P7/P8: casts and
unix_timestamp features, sensor_data_regression.py:37,47)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_day(ts: Column | str) -> Column:
    """timestamp → date (day bucketing for daily aggregates)."""
    return F.to_date(_c(ts))


def epoch_seconds(ts: Column | str) -> Column:
    """timestamp → epoch seconds (numeric feature; also the substrate
    for linear interpolation, operators/windows.py)."""
    return _c(ts).cast("double")


def time_bucket(ts: Column | str, width: str = "30 minutes") -> Column:
    """Tumbling-window start for a timestamp. Pure expression (no
    groupBy needed), so it composes with any aggregation and matches
    ANSI ``time_bucket`` semantics: floor(ts / width) * width from the
    1970-01-01 origin."""
    secs = F.unix_timestamp(_c(ts))
    width_secs = F.lit(_interval_seconds(width))
    # floor, not cast: double division truncates toward zero, which
    # would bucket pre-1970 timestamps upward instead of flooring
    # (F.window and operators/resample.py floor).
    return F.timestamp_seconds(
        F.floor(secs / width_secs).cast("long") * width_secs
    )


def _interval_seconds(width: str) -> int:
    qty, unit = width.split()
    mult = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
        "day": 86400,
        "days": 86400,
    }[unit]
    return int(qty) * mult
