"""pandas-API-on-Spark parity (SURVEY.md intro: "modernize to Spark
3.5+/pandas-API-on-Spark idioms").

The reference does its resampling in plain pandas on collected data
(pandas_timeseries_forecast.py:65 ``resample('30T').mean()``) — a
single-node bottleneck. Two distributed replacements must agree with
it: the native tumbling-window operator (operators/resample.py, the
100 TB path) and ``pyspark.pandas`` (the drop-in API for pandas-shaped
code). This test pins all three to the same numbers so either
migration path is safe.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators import resample
from sensor_time_series_pyspark_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def events_small(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 50)
        .select("ts", "value")
    )


def test_native_resample_matches_pandas(spark, events_small):
    # single-node pandas truth (the reference's method)
    pdf = events_small.toPandas().set_index("ts").sort_index()
    truth = pdf["value"].resample("30min").mean().dropna()

    native = resample(
        events_small,
        ts_col="ts",
        width="30 minutes",
        aggs=[F.avg("value").alias("avg_value")],
    )
    got = {
        pd.Timestamp(r["bucket"]): r["avg_value"] for r in native.collect()
    }
    assert len(got) == len(truth)
    for bucket, val in truth.items():
        assert got[bucket] == pytest.approx(val, rel=1e-9)


def test_pandas_on_spark_resample_matches_native(spark, events_small):
    ps = pytest.importorskip("pyspark.pandas")

    psdf = events_small.pandas_api()
    psdf = psdf.set_index("ts")
    ps_out = psdf["value"].resample("30min").mean().to_pandas().dropna()

    native = resample(
        events_small,
        ts_col="ts",
        width="30 minutes",
        aggs=[F.avg("value").alias("avg_value")],
    )
    got = {
        pd.Timestamp(r["bucket"]): r["avg_value"] for r in native.collect()
    }
    assert len(got) == len(ps_out)
    for bucket, val in ps_out.items():
        assert got[bucket] == pytest.approx(val, rel=1e-9)
