"""Dynamic Time Warping distance between series pairs — the standard
elastic similarity measure for sensor traces (alignment-tolerant, unlike
pointwise L2), used for fleet clustering and fault-signature matching.

Spark shape: each series collapses to ONE row (sort_array over
collect_list — the sort happens inside the aggregate buffer, no window
pass), the pair frame joins the series frame twice (series count ≪ row
count, so these are broadcast-sized joins), and the O(n·w) banded DP
runs in an Arrow-batched pandas UDF — Python is quarantined to exactly
the irreducibly-imperative kernel, with bounded inputs (two arrays per
call), never row-at-a-time.

At 100 TB the pattern holds: DTW is only ever run on RESAMPLED series
(a raw 1 Hz year is 3e7 points — nobody DTWs that; resample first, the
operators/resample.py pass), so arrays entering Python are thousands of
elements, and the quadratic kernel is bounded by the Sakoe-Chiba band.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dtw_kernel(a: np.ndarray, b: np.ndarray, band: int | None) -> float:
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("nan")
    w = max(band, abs(n - m)) if band is not None else max(n, m)
    prev = np.full(m + 1, np.inf)
    prev[0] = 0.0
    cur = np.empty(m + 1)
    for i in range(1, n + 1):
        cur[:] = np.inf
        lo, hi = max(1, i - w), min(m, i + w)
        if lo > hi:
            prev, cur = cur, prev
            continue
        d = np.abs(a[i - 1] - b[lo - 1 : hi])
        for j in range(lo, hi + 1):
            cur[j] = d[j - lo] + min(prev[j], cur[j - 1], prev[j - 1])
        prev, cur = cur, prev
    return float(prev[m])


def dtw_pairs(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    pairs: DataFrame,
    band: int | None = None,
) -> DataFrame:
    """DTW distance for every (key_a, key_b) row in ``pairs``.

    ``band`` is the Sakoe-Chiba window (None = unconstrained); cost is
    O(len_a · band) per pair. Output: key_a, key_b, n_a, n_b, dtw.
    """
    series = df.groupBy(F.col(key_col).alias("k")).agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col(order_col), F.col(value_col)))
            ),
            lambda s: s[value_col].cast("double"),
        ).alias("vs")
    )

    @pandas_udf("double")
    def dtw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _dtw_kernel(
                    np.asarray(x, dtype=np.float64),
                    np.asarray(y, dtype=np.float64),
                    band,
                )
                for x, y in zip(a, b)
            ]
        )

    joined = (
        pairs.join(
            F.broadcast(series.select(F.col("k").alias("key_a"), F.col("vs").alias("__va"))),
            "key_a",
        )
        .join(
            F.broadcast(series.select(F.col("k").alias("key_b"), F.col("vs").alias("__vb"))),
            "key_b",
        )
    )
    return joined.select(
        "key_a",
        "key_b",
        F.size("__va").alias("n_a"),
        F.size("__vb").alias("n_b"),
        dtw_udf("__va", "__vb").alias("dtw"),
    )
