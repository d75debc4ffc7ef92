"""Pipeline observability without extra jobs (SURVEY.md §4 "observe()
metrics instead of mid-pipeline count()").

The reference probes cardinality with ``df.count()`` mid-pipeline
(sensor_data_etl.py:64,102) — each probe is a FULL extra job that
recomputes the upstream DAG. ``DataFrame.observe`` attaches accumulator
metrics to the one job that was going to run anyway; the numbers are
read after the action, for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_row_count(
    df: DataFrame, name: str = "metrics", *extra: Column
) -> tuple[DataFrame, Observation]:
    """Attach a row-count (plus any extra aggregate expressions) to the
    next action on ``df``. Returns (df, observation); read
    ``observation.get`` AFTER an action has materialized the frame.

    DISTINCT aggregates are rejected by Spark here — use
    ``approx_count_distinct`` (the mergeable sketch, which is what you
    want in an accumulator anyway). Example::

        df, obs = with_row_count(joined, "post_join",
                                 F.approx_count_distinct("user_id").alias("users"))
        df.write.parquet(path)
        log.info("joined rows=%s", obs.get["count"])
    """
    obs = Observation(name)
    observed = df.observe(obs, F.count(F.lit(1)).alias("count"), *extra)
    return observed, obs
