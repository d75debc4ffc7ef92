"""Distributed per-series forecasting — the reference's U1 done right.

The reference's grouped-map UDF groups by ``('datetime','O2')`` so every
"series" is ~one row and the model fit is void
(spark_pandas_timeseries_forecast.py:63; SURVEY.md §8 bug 5). Here the
group key is the SERIES IDENTITY (sensor/terminal/user), the UDF is the
Spark-3 ``applyInPandas`` idiom (Arrow-batched), and data prep
(resample/ffill/trim) happens NATIVELY before the Python boundary so
each group entering a Python worker is already bounded:
one row per bucket — at most ``span/width`` rows per series, regardless
of raw-event cardinality. That bound is what keeps per-group pandas
memory flat at 100 TB.

Model-per-group is embarrassingly parallel: one shuffle by series key,
then zero cross-series communication.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .models import MODELS, seasonal_decompose_additive, walk_forward_mse


def fit_forecast(
    df: DataFrame,
    series_keys: Sequence[str],
    ts_col: str,
    value_col: str,
    horizon: int,
    model: str = "holt",
    params: dict | None = None,
    min_points: int = 3,
    model_fn: Callable[[np.ndarray, int], tuple[np.ndarray, np.ndarray]] | None = None,
) -> DataFrame:
    """horizon-step forecast per series with 95% CI.

    Output: series_keys…, step, forecast, lo, hi. ``model`` is one of
    models.MODELS ('ses' | 'holt' | 'arima'); ``model_fn`` overrides it
    with any callable (e.g. statsmodels when available).
    """
    params = params or {}
    fn = model_fn or MODELS[model]
    keys = list(series_keys)
    key_fields = df.select(*keys).schema.fields
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["step int", "forecast double", "lo double", "hi double"]
    )

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        x = pdf[value_col].to_numpy(dtype="float64")
        x = x[~np.isnan(x)]
        if len(x) < min_points:
            return pd.DataFrame(columns=[f.name for f in key_fields] + ["step", "forecast", "lo", "hi"])
        fc, se = fn(x, horizon, **params)
        out = pd.DataFrame(
            {
                "step": np.arange(1, horizon + 1, dtype="int32"),
                "forecast": fc,
                "lo": fc - 1.96 * se,
                "hi": fc + 1.96 * se,
            }
        )
        for f in key_fields:
            out[f.name] = pdf[f.name].iloc[0]
        return out[[f.name for f in key_fields] + ["step", "forecast", "lo", "hi"]]

    return df.groupBy(*keys).applyInPandas(per_series, out_schema)


def grid_search_forecast(
    df: DataFrame,
    series_keys: Sequence[str],
    ts_col: str,
    value_col: str,
    grid: Sequence[dict],
    model: str = "arima",
) -> DataFrame:
    """Distributed hyperparameter search (reference T6 re-shaped): the
    grid becomes a tiny DataFrame cross-joined onto the series data, so
    (series × combo) fits run as independent Arrow groups; ``min_by``
    picks the best combo per series in one final aggregate.

    Output: series_keys…, best_params (json string), mse.
    """
    spark = df.sparkSession
    keys = list(series_keys)
    import json

    grid_rows = [(i, json.dumps(g)) for i, g in enumerate(grid)]
    grid_df = spark.createDataFrame(grid_rows, "combo_id int, params string")
    # broadcast: the grid is tiny; the fact side shuffles once by
    # (series, combo)
    crossed = df.join(F.broadcast(grid_df))

    key_fields = df.select(*keys).schema.fields
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["combo_id int", "params string", "mse double"]
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        x = pdf[value_col].to_numpy(dtype="float64")
        x = x[~np.isnan(x)]
        params = json.loads(pdf["params"].iloc[0])
        mse = walk_forward_mse(x, model, params)
        row = {f.name: pdf[f.name].iloc[0] for f in key_fields}
        row.update(
            combo_id=pdf["combo_id"].iloc[0],
            params=pdf["params"].iloc[0],
            mse=mse,
        )
        return pd.DataFrame([row])

    scored = crossed.groupBy(*keys, "combo_id").applyInPandas(score, out_schema)
    best = scored.groupBy(*keys).agg(
        F.min_by(F.struct("params", "mse"), "mse").alias("best")
    )
    return best.select(
        *keys,
        F.col("best.params").alias("best_params"),
        F.col("best.mse").alias("mse"),
    )


def decompose(
    df: DataFrame,
    series_keys: Sequence[str],
    ts_col: str,
    value_col: str,
    period: int,
) -> DataFrame:
    """Additive seasonal decomposition per series (reference T8).
    Output: series_keys…, ts, value, trend, seasonal, resid."""
    keys = list(series_keys)
    key_fields = df.select(*keys).schema.fields
    ts_type = df.select(ts_col).schema.fields[0].dataType.simpleString()
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + [
            f"{ts_col} {ts_type}",
            f"{value_col} double",
            "trend double",
            "seasonal double",
            "resid double",
        ]
    )

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        x = pdf[value_col].to_numpy(dtype="float64")
        trend, seasonal, resid = seasonal_decompose_additive(x, period)
        out = pdf[[f.name for f in key_fields] + [ts_col]].copy()
        out[value_col] = x
        out["trend"] = trend
        out["seasonal"] = seasonal
        out["resid"] = resid
        return out

    return df.groupBy(*keys).applyInPandas(per_series, out_schema)
