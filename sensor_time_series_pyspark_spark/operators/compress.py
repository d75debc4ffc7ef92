"""Deadband (exception) compression for sensor streams.

Historians (PI, Wonderware) store a reading only when it moves more
than a deadband ε away from the LAST STORED value — typically 90%+
compression on slow-moving gas readings like the reference's O2 channel
(steady at 21% atmospheric, sensor_data_etl.py:84). The keep/drop
decision depends on the previous KEPT row, not the previous row, so it
is inherently sequential per series — no window-function rewrite exists.

Spark shape: ``applyInPandas`` per series key. Each series compresses
independently (embarrassingly parallel across series); within a series
the pass is a single O(n) numpy-backed loop over Arrow batches. At
100 TB the constraint is per-series memory — one series must fit in a
worker (same contract as the forecast harness, ml/forecast.py); bound
it by resampling first if a series is unboundedly long.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deadband_compress(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    epsilon: float,
) -> DataFrame:
    """Keep the first row per key, then every row whose value deviates
    from the last KEPT value by MORE than ``epsilon`` (strict —
    ``|v - last_kept| > ε``). Rows are ordered by (ts, value) within
    the key so duplicate timestamps compress deterministically.

    Output: key, ts, value — the kept rows only.
    """
    out_schema = df.select(
        F.col(key_col), F.col(ts_col), F.col(value_col)
    ).schema

    def compress(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
        vals = pdf[value_col].to_numpy()
        keep = [False] * len(vals)
        last = None
        for i, v in enumerate(vals):
            if last is None or abs(v - last) > epsilon:
                keep[i] = True
                last = v
        return pdf.loc[keep, [key_col, ts_col, value_col]]

    return (
        df.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandas(compress, schema=out_schema)
    )


def swinging_door_compress(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    epsilon: float,
) -> DataFrame:
    """Swinging-door trending (SDT) compression per series — the other
    classic historian rule (OSIsoft PI "compression deviation"): keep
    the minimal set of points such that linear interpolation between
    kept points stays within ±ε of every dropped original.

    Versus deadband (``deadband_compress``), SDT tracks SLOPES: a pivot
    door opens from the last kept point; while every new point fits
    inside the narrowing slope corridor [max lower, min upper] the
    segment extends; when the corridor inverts, the PREVIOUS point is
    kept and the corridor restarts from it. First and last points of a
    series are always kept, so reconstruction covers the full range.

    Sequential per series (corridor state) → ``applyInPandas`` per key,
    O(n) numpy loop per series — same scale contract as
    ``deadband_compress``.
    """
    out_schema = df.select(
        F.col(key_col), F.col(ts_col), F.col(value_col)
    ).schema

    def compress(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
        t = pdf[ts_col].astype("int64").to_numpy() / 1e9  # seconds
        v = pdf[value_col].to_numpy()
        n = len(v)
        if n == 0:
            return pdf.iloc[0:0][[key_col, ts_col, value_col]]
        keep = [False] * n
        keep[0] = True
        a = 0          # index of last archived point
        prev = 0       # previous point seen (candidate for archiving)
        lo, hi = float("-inf"), float("inf")
        for i in range(1, n):
            dt = t[i] - t[a]
            if dt <= 0:
                # duplicate timestamp: treat as immediate corridor test
                # on value distance only
                if abs(v[i] - v[a]) > epsilon:
                    keep[prev] = True
                    a = prev
                    lo, hi = float("-inf"), float("inf")
                prev = i
                continue
            s_hi = (v[i] + epsilon - v[a]) / dt
            s_lo = (v[i] - epsilon - v[a]) / dt
            hi = min(hi, s_hi)
            lo = max(lo, s_lo)
            if lo > hi:
                # corridor collapsed: archive the previous point, restart
                keep[prev] = True
                a = prev
                lo, hi = float("-inf"), float("inf")
                dt = t[i] - t[a]
                if dt > 0:
                    hi = (v[i] + epsilon - v[a]) / dt
                    lo = (v[i] - epsilon - v[a]) / dt
            prev = i
        keep[n - 1] = True
        return pdf.loc[keep, [key_col, ts_col, value_col]]

    return (
        df.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandas(compress, schema=out_schema)
    )


def delta_encode(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    decimals: int = 2,
) -> DataFrame:
    """Delta encoding for regular numeric series (the Gorilla/timescale
    compression front end): each reading becomes its integer-scaled
    difference from the predecessor — repeated and slowly-drifting
    sensor values collapse to long zero/near-zero runs that dictionary
    and RLE parquet encodings then store in a few bits.

    One lag over the per-series window (single shuffle on the series
    key); the first reading per series carries its full scaled value
    with ``is_first`` set. ``delta_decode`` reverses losslessly (the
    scaling is an exact decimal cast, property-tested round trip).

    Output: [*key_cols], ts, delta (bigint), is_first.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    xi = (
        (F.col(value_col).cast(f"decimal(18,{decimals})") * (10 ** decimals))
        .cast("long")
    )
    prev = F.lag(xi).over(w)
    return df.select(
        *key_cols,
        F.col(ts_col).alias("ts"),
        F.coalesce(xi - prev, xi).alias("delta"),
        prev.isNull().alias("is_first"),
    )


def delta_decode(
    encoded: DataFrame,
    key_cols: list[str],
    decimals: int = 2,
) -> DataFrame:
    """Reverse delta_encode: a running sum of deltas per series (one
    prefix-sum window over the same partitioning the encoder used —
    the shuffle is reused when chained).

    Output: [*key_cols], ts, value (double).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*key_cols)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return encoded.select(
        *key_cols,
        "ts",
        (
            F.sum("delta").over(w).cast("double") / F.lit(float(10 ** decimals))
        ).alias("value"),
    )
