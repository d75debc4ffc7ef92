"""Slowly-changing-dimension (type 2) construction from an event/change
feed — the warehouse pattern the reference's dimension handling lacks
(its dims are point-in-time JDBC snapshots overwritten on each run,
/root/reference/read_sensor_configs.py:53,66: history is lost).

``scd2`` turns (key, ts, attrs…) change records into versioned rows
with [valid_from, valid_to) intervals and an is_current flag:

1. change detection — consecutive records with identical tracked
   attributes collapse (lag compare per key; a feed that re-sends the
   same state must not mint versions);
2. interval assignment — valid_to = next change's ts (lead), NULL for
   the open current version.

Both steps are windows over the same (key × ts) sort, so the whole
operator is ONE shuffle; at 100 TB the key is the natural partition
and no state is global. Joining facts to the dimension as-of event
time is then operators/asof.py, or an interval join on
[valid_from, valid_to).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2(
    df: DataFrame,
    key: Sequence[str],
    ts_col: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Output: (*key, *attrs, valid_from, valid_to, is_current), one
    row per distinct consecutive attribute state per key.

    Ties on (key, ts) must be pre-resolved upstream (e.g. keep the last
    record per (key, ts)) — version boundaries need a total order.
    """
    w = Window.partitionBy(*key).orderBy(ts_col)
    changed = F.lit(False)
    for a in attrs:
        prev = F.lag(a).over(w)
        # null-safe inequality: a change to/from NULL is a change
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.lag(ts_col).over(w).isNull()
    versions = df.withColumn("__new_version", first | changed).where(
        F.col("__new_version")
    )
    w2 = Window.partitionBy(*key).orderBy(ts_col)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*key, *attrs, "valid_from", "valid_to", "is_current")
    )
