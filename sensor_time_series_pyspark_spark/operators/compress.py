"""Deadband (exception) compression for sensor streams.

Historians (PI, Wonderware) store a reading only when it moves more
than a deadband ε away from the LAST STORED value — typically 90%+
compression on slow-moving gas readings like the reference's O2 channel
(steady at 21% atmospheric, sensor_data_etl.py:84). The keep/drop
decision depends on the previous KEPT row, not the previous row, so it
is inherently sequential per series — no window-function rewrite exists.

Spark shape: each series is assembled in the JVM
(``collect_list(struct(ts, value))`` + ``array_sort``) and the O(n)
fold runs in a SCALAR Arrow ``pandas_udf`` over the per-series arrays,
thousands of series per Arrow batch, returning the kept INDICES; the
JVM re-expands kept rows with ``element_at`` + ``explode``. The
original per-key ``applyInPandas`` paid the per-group plan/serialize
overhead once per series — with bounded series that overhead dominated
the fold (the q603 rainflow lesson, guide §4: measured 5-8x on
q130/q142/q143 at sf0.1). Each series still compresses independently
(embarrassingly parallel across series); at 100 TB the constraint is
unchanged — one series must fit in a worker (same contract as the
forecast harness, ml/forecast.py); bound it by resampling first if a
series is unboundedly long.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_kept_rows(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    keep_udf,
) -> DataFrame:
    """Shared skeleton for sequential keep/drop folds: sort each key's
    (ts, value) pairs in the JVM, run ``keep_udf`` (micros array,
    value array -> kept index array) once per series inside an Arrow
    batch, re-expand kept rows natively. The (ts, value) struct sort
    reproduces the old pandas ``sort_values([ts, value])`` order."""
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col), F.col(value_col)))
    )
    per_key = df.groupBy(key_col).agg(pairs.alias("__p"))
    us: Column = F.transform("__p", lambda s: F.unix_micros(s[ts_col]))
    vs: Column = F.transform("__p", lambda s: s[value_col])
    kept = per_key.select(
        F.col(key_col), F.col("__p"), keep_udf(us, vs).alias("__k")
    )
    return kept.select(
        F.col(key_col),
        F.explode(
            F.transform("__k", lambda i: F.element_at("__p", i + 1))
        ).alias("__r"),
    ).select(
        F.col(key_col),
        F.col(f"__r.{ts_col}").alias(ts_col),
        F.col(f"__r.{value_col}").alias(value_col),
    )


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

    @F.pandas_udf("array<int>")
    def keep_idx(us: pd.Series, vs: pd.Series) -> pd.Series:
        def one(_us, v) -> list[int]:
            out: list[int] = []
            last = None
            for i, x in enumerate(v):
                if last is None or abs(x - last) > epsilon:
                    out.append(i)
                    last = x
            return out

        return pd.Series(
            [one(u, v) for u, v in zip(us, vs)], dtype=object
        )

    return _fold_kept_rows(df, key_col, ts_col, value_col, keep_idx)


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

    Sequential per series (corridor state) → one Arrow-batched fold
    per series (``_fold_kept_rows``), O(n) per series — same scale
    contract as ``deadband_compress``. The slope arithmetic divides
    NANOSECOND-derived seconds exactly as the old pandas path did
    (micros*1000 / 1e9), so corridor decisions are bit-identical.
    """

    @F.pandas_udf("array<int>")
    def keep_idx(us: pd.Series, vs: pd.Series) -> pd.Series:
        def one(u, v) -> list[int]:
            n = len(v)
            if n == 0:
                return []
            # identical operands to the old datetime64[ns].astype(int64)
            # / 1e9 conversion: micros*1000 is the exact nanos value
            t = u.astype("int64") * 1000 / 1e9  # seconds
            keep = [False] * n
            keep[0] = True
            a = 0          # index of last archived point
            prev = 0       # previous point seen (candidate to archive)
            lo, hi = float("-inf"), float("inf")
            for i in range(1, n):
                dt = t[i] - t[a]
                if dt <= 0:
                    # duplicate timestamp: immediate corridor test on
                    # value distance only
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
                    # corridor collapsed: archive previous, restart
                    keep[prev] = True
                    a = prev
                    lo, hi = float("-inf"), float("inf")
                    dt = t[i] - t[a]
                    if dt > 0:
                        hi = (v[i] + epsilon - v[a]) / dt
                        lo = (v[i] - epsilon - v[a]) / dt
                prev = i
            keep[n - 1] = True
            return [i for i, k in enumerate(keep) if k]

        return pd.Series(
            [one(u, v) for u, v in zip(us, vs)], dtype=object
        )

    return _fold_kept_rows(df, key_col, ts_col, value_col, keep_idx)


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
