"""Incremental view maintenance (IVM) for materialized JOINS —
the delta-join identity, Spark-first.

plans/rollup.py maintains AGGREGATE views incrementally (mergeable
partials). Joins need a different algebra: for insert-only deltas
dA, dB over base tables A, B, the new join rows are exactly

    d(A join B) = (dA join B_old) UNION (A_old join dB)
                  UNION (dA join dB)

so a refresh touches only delta-sized join work — never a recompute
of A_old join B_old (which at 100 TB is the whole point: the three
delta terms have one small side each, and Spark broadcasts it).

``delta_join_rows`` is the pure-DataFrame identity (testable against
a full recompute); ``refresh_join_view`` wraps it over a parquet
store: append-only view, deltas appended to the base snapshots
afterwards so repeated refreshes compose.

Reference parity: the reference rebuilds its joined feature frame
from scratch per run (sensor_data_etl.py:60-88); this is the
incremental path a production deployment of the same pipeline needs.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_join_rows(
    a_old: DataFrame,
    b_old: DataFrame,
    delta_a: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """New rows of the inner equi-join view after insert-only deltas:
    dA⋈B_old ∪ A_old⋈dB ∪ dA⋈dB. Each term broadcasts its delta side
    (deltas are batch-sized, bases are table-sized); the result has
    the same schema as ``a.join(b, on)``."""
    keys = list(on)
    t1 = F.broadcast(delta_a).join(b_old, keys)
    t2 = a_old.join(F.broadcast(delta_b), keys)
    t3 = F.broadcast(delta_a).join(delta_b, keys)
    return t1.unionByName(t2).unionByName(t3)


def _exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path).limit(1).collect()
        return True
    except Exception:
        return False


def refresh_join_view(
    spark: SparkSession,
    store_dir: str,
    delta_a: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
) -> dict[str, int]:
    """Admit one batch of inserts into a materialized-join store.

    Layout: ``store_dir/{a,b}`` hold the base snapshots,
    ``store_dir/view`` the materialized join. First call seeds all
    three; later calls append ONLY the delta-join rows and the deltas
    — refresh cost scales with the batch, not the view.

    Returns counters: new_view_rows, view_rows_total.
    """
    a_dir = os.path.join(store_dir, "a")
    b_dir = os.path.join(store_dir, "b")
    v_dir = os.path.join(store_dir, "view")
    keys = list(on)
    if not _exists(spark, v_dir):
        delta_a.write.mode("overwrite").parquet(a_dir)
        delta_b.write.mode("overwrite").parquet(b_dir)
        view = delta_a.join(delta_b, keys)
        view.write.mode("overwrite").parquet(v_dir)
        n = spark.read.parquet(v_dir).count()
        return {"new_view_rows": n, "view_rows_total": n}
    a_old = spark.read.parquet(a_dir)
    b_old = spark.read.parquet(b_dir)
    new_rows = delta_join_rows(a_old, b_old, delta_a, delta_b, keys)
    new_rows.write.mode("append").parquet(v_dir)
    # append deltas to the base snapshots so the next refresh composes
    delta_a.write.mode("append").parquet(a_dir)
    delta_b.write.mode("append").parquet(b_dir)
    total = spark.read.parquet(v_dir).count()
    new_n = new_rows.count()
    return {"new_view_rows": new_n, "view_rows_total": total}
