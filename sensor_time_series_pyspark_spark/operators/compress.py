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
