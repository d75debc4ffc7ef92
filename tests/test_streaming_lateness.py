"""Watermark-lateness accounting (round 10, VERDICT r9 #7): the one
streaming-semantics corner the recovery + equivalence suites left
untested — what happens to rows that arrive BEHIND the watermark.

The fixture replays a file-drop feed with one planted late event:
micro-batch ordering is pinned via file modification times
(FileStreamSource picks oldest-first), so the watermark provably
passes the late row's event time before it arrives. The audit closes
both sides of the accounting:

- `dropped_late_rows` (the engine's own numRowsDroppedByWatermark,
  summed from query progress) equals the planted late count, and
- the emitted windows equal the batch aggregate over the ON-TIME rows
  only — i.e. the drop is visible in the results exactly where the
  counter says it happened, and nowhere else.
"""

from __future__ import annotations

import os
import time
from datetime import datetime

from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.streaming import (
    dropped_late_rows,
    read_stream,
    run_to_memory,
    windowed_agg,
)


def _write_batch(spark, schema, path, rows, mtime):
    before = set(os.listdir(path)) if os.path.isdir(path) else set()
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    # stamp ONLY this batch's new files: FileStreamSource orders by
    # modification time, and re-stamping earlier parts would shuffle
    # the replay order (and with it the watermark trajectory)
    for name in set(os.listdir(path)) - before:
        full = os.path.join(path, name)
        os.utime(full, (mtime, mtime))


def test_late_rows_dropped_and_accounted(spark, tmp_path):
    src = str(tmp_path / "late_src")
    schema = "ts timestamp, user_id bigint, value double"
    t = lambda h, m: datetime(2024, 3, 1, h, m)  # noqa: E731

    base = time.time() - 3600
    batches = [
        # batch 0: two on-time events in the 10:00 window
        [(t(10, 0), 1, 1.0), (t(10, 5), 1, 1.0)],
        # batch 1: jump to 12:00 — watermark advances to 11:50
        [(t(12, 0), 1, 1.0)],
        # batch 2: spacer. The 10:00 window EVICTS during this batch
        # (watermark 11:50): a row arriving in the same micro-batch as
        # its window's eviction still merges (measured — eviction runs
        # at batch end), so the provably-late arrival must come one
        # batch later.
        [(t(12, 1), 9, 0.0)],
        # batch 3: ONE late event (10:07, window long evicted ->
        # dropped AND counted) plus an on-time one
        [(t(10, 7), 1, 1.0), (t(12, 5), 1, 1.0)],
        # batches 4-5: flush events far ahead so earlier windows close
        [(t(20, 0), 9, 0.0)],
        [(t(23, 0), 9, 0.0)],
    ]
    for i, rows in enumerate(batches):
        _write_batch(spark, schema, src, rows, base + i)

    stream = read_stream(
        spark, src, spark.read.parquet(src).schema, fmt="parquet",
        max_files_per_trigger=1,
    )
    agg = windowed_agg(
        stream,
        "ts",
        "30 minutes",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n")],
        watermark="10 minutes",
    )
    q = run_to_memory(agg, "late_audit")  # append: only closed windows

    # 1) the engine's own counter sees exactly the planted late row
    assert dropped_late_rows(q) == 1

    got = {
        (r["user_id"], r["bucket"]): r["n"]
        for r in spark.table("late_audit").collect()
    }
    # 2) emitted windows == batch aggregate over ON-TIME rows only:
    # the 10:00 window counts 2, NOT 3 — the late 10:07 row is gone
    # from the results exactly as the counter claims
    assert got[(1, t(10, 0))] == 2
    assert got[(1, t(12, 0))] == 2
    # and the late row resurrects nowhere (no extra user-1 windows
    # beyond the two closed ones and possibly the flushed tail)
    user1 = {b for (u, b) in got if u == 1}
    assert user1 <= {t(10, 0), t(12, 0)}

    # 3) batch twin over the on-time rows reproduces the emitted rows
    on_time = [r for i, rows in enumerate(batches) for r in rows
               if not (i == 3 and r[0] == t(10, 7))]
    batch = (
        spark.createDataFrame(on_time, schema)
        .groupBy(
            F.window("ts", "30 minutes").alias("__w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("user_id"), F.col("__w.start").alias("bucket"), "n")
    )
    want = {
        (r["user_id"], r["bucket"]): r["n"] for r in batch.collect()
    }
    for key, n in got.items():
        assert want.get(key) == n, (key, n, want.get(key))


def test_session_agg_drops_late_rows_and_accounts(spark, tmp_path):
    """The same accounting for SESSION windows (session_agg): a row
    arriving behind the watermark after its session closed must be
    dropped AND counted — never resurrect or extend the session."""
    from sensor_time_series_pyspark_spark.streaming import session_agg

    src = str(tmp_path / "late_sess_src")
    schema = "ts timestamp, user_id bigint, value double"
    t = lambda h, m: datetime(2024, 3, 1, h, m)  # noqa: E731

    base = time.time() - 3600
    batches = [
        # batch 0: a 2-event session for user 1 (gap 30min)
        [(t(10, 0), 1, 1.0), (t(10, 5), 1, 1.0)],
        # batch 1: far-future event — watermark jumps to 11:50
        [(t(12, 0), 9, 0.0)],
        # batch 2: spacer (state eviction commits, session emits)
        [(t(12, 1), 9, 0.0)],
        # batch 3: LATE event inside the closed session's span
        [(t(10, 6), 1, 1.0)],
        # batches 4-5: flush
        [(t(20, 0), 9, 0.0)],
        [(t(23, 0), 9, 0.0)],
    ]
    for i, rows in enumerate(batches):
        _write_batch(spark, schema, src, rows, base + i)

    stream = read_stream(
        spark, src, spark.read.parquet(src).schema, fmt="parquet",
        max_files_per_trigger=1,
    )
    sess = session_agg(
        stream, "ts", keys=["user_id"], gap="30 minutes",
        watermark="10 minutes",
    )
    q = run_to_memory(sess, "late_sess_audit")

    assert dropped_late_rows(q) == 1
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.table("late_sess_audit").collect()
    }
    # the closed session keeps its 2 events — the late 10:06 row
    # neither extends nor re-opens it
    assert got[(1, t(10, 0))] == 2
    assert all(u != 1 or s == t(10, 0) for (u, s) in got)
