"""Checkpoint kill/restart exactly-once tests (VERDICT r5 #1).

The streaming layer claims production shape; these tests prove the one
claim the stream==batch equivalence suite can't: RESTART semantics.
Each test runs a stream against a checkpoint, crashes it inside the
worst window — after the micro-batch's parquet files are on disk but
BEFORE the checkpoint offset commit (via the ``fault_injector`` seam
in ``write_parquet_stream``) — restarts from the same checkpoint, and
asserts the sink equals the batch twin EXACTLY: no duplicated rows
(the replayed batch must overwrite, not re-append) and no lost rows
(the restart must resume from the uncommitted batch, not skip it).

A non-idempotent sink (blind ``mode("append")``) fails these tests
with exactly one duplicated micro-batch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.errors import StreamingQueryException

from sensor_time_series_pyspark_spark.sources.readers import read_table
from sensor_time_series_pyspark_spark.streaming import (
    ewma_anomaly_batch,
    ewma_anomaly_stream,
    read_stream,
    stream_dedup,
    write_parquet_stream,
)

SF = "/root/testdata/sf0.001"
N_FILES = 4  # maxFilesPerTrigger=1 → 4 micro-batches per run


class _CrashOnce(Exception):
    pass


def _crash_on(batch_id: int):
    """Fault injector: raise the first time ``batch_id`` is reached.
    The raise happens AFTER the batch's parquet write (see the seam's
    placement in write_parquet_stream) — the exact window where a
    non-idempotent sink would leave orphan rows for the replay to
    duplicate."""
    fired = {"done": False}

    def inject(bid: int) -> None:
        if bid == batch_id and not fired["done"]:
            fired["done"] = True
            raise _CrashOnce(f"injected crash after batch {bid} write")

    return inject


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def drop_dir(spark, tmp_path_factory):
    """events split into N_FILES time-ordered files (a file-drop feed).
    Each file also contains its own rows a second time, so the dedup
    test always has in-batch duplicates to eliminate."""
    base = tmp_path_factory.mktemp("recovery_src")
    ev = read_table(spark, SF, "events").orderBy("ts").collect()
    schema = read_table(spark, SF, "events").schema
    chunk = (len(ev) + N_FILES - 1) // N_FILES
    plain = str(base / "plain")
    duped = str(base / "duped")
    for i in range(N_FILES):
        part = ev[i * chunk : (i + 1) * chunk]
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(plain)
        spark.createDataFrame(part + part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(duped)
    return plain, duped, schema


def _run(stream_df, sink, ckpt, injector=None):
    q = write_parquet_stream(
        stream_df, sink, ckpt, available_now=True, fault_injector=injector
    )
    q.awaitTermination()


def _run_expect_crash(stream_df, sink, ckpt, injector):
    with pytest.raises(StreamingQueryException):
        _run(stream_df, sink, ckpt, injector)


def test_ingest_restart_exactly_once(spark, drop_dir, tmp_path):
    """Plain ingest: crash after batch 1's files hit the sink, restart,
    assert sink == source with zero dup / zero loss."""
    plain, _, schema = drop_dir
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def stream():
        return read_stream(
            spark, plain, schema, fmt="parquet", max_files_per_trigger=1
        )

    _run_expect_crash(stream(), sink, ckpt, _crash_on(1))
    # batch 1's parquet is on disk but its offset was never committed:
    # the restart must replay it (overwrite) and then finish 2..3
    _run(stream(), sink, ckpt)

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    got = _rows(spark.read.parquet(sink).drop("_batch_id"), cols)
    want = _rows(read_table(spark, SF, "events"), cols)
    assert got == want  # no loss, and crucially no replayed-batch dups


def test_ingest_restart_mid_stream_no_skip(spark, drop_dir, tmp_path):
    """Crash on the LAST batch: the restart has nothing new to read,
    only the uncommitted replay — the pure-idempotence case."""
    plain, _, schema = drop_dir
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def stream():
        return read_stream(
            spark, plain, schema, fmt="parquet", max_files_per_trigger=1
        )

    _run_expect_crash(stream(), sink, ckpt, _crash_on(N_FILES - 1))
    _run(stream(), sink, ckpt)

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    got = _rows(spark.read.parquet(sink).drop("_batch_id"), cols)
    want = _rows(read_table(spark, SF, "events"), cols)
    assert got == want


def test_stream_dedup_restart_exactly_once(spark, drop_dir, tmp_path):
    """stream_dedup → sink: the dedup state store must roll back to the
    last committed version on restart (a replayed duplicate key must
    still be recognized), and the sink must not double the replayed
    batch. Source files each contain their rows twice."""
    _, duped, schema = drop_dir
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def stream():
        src = read_stream(
            spark, duped, schema, fmt="parquet", max_files_per_trigger=1
        )
        return stream_dedup(
            src, keys=["event_id"], ts_col="ts", watermark="24 hours"
        )

    _run_expect_crash(stream(), sink, ckpt, _crash_on(1))
    _run(stream(), sink, ckpt)

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    got = _rows(spark.read.parquet(sink).drop("_batch_id"), cols)
    # batch twin: every duplicate sits in the same file as its original,
    # so the watermark can never expire between copies — streaming dedup
    # must equal a plain batch distinct-by-key
    want = _rows(read_table(spark, SF, "events"), cols)
    assert got == want


def test_ewma_state_restart_exactly_once(spark, drop_dir, tmp_path):
    """applyInPandasWithState EWMA → sink: after the crash the state
    store must roll back to batch 0's committed state and re-fold batch
    1 ONCE (double-folding would shift every subsequent ewma/zscore),
    then the sink must dedupe the replay. Gate: stream == batch twin,
    float-exact (same fold, same arithmetic)."""
    plain, _, schema = drop_dir
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def stream():
        src = read_stream(
            spark, plain, schema, fmt="parquet", max_files_per_trigger=1
        )
        return ewma_anomaly_stream(
            src, key_col="event_type", ts_col="ts", value_col="value"
        )

    _run_expect_crash(stream(), sink, ckpt, _crash_on(1))
    _run(stream(), sink, ckpt)

    cols = ["event_type", "ts", "value", "ewma", "zscore", "n_seen"]
    got = _rows(spark.read.parquet(sink).drop("_batch_id"), cols)
    want = _rows(
        ewma_anomaly_batch(
            read_table(spark, SF, "events"),
            key_col="event_type",
            ts_col="ts",
            value_col="value",
        ),
        cols,
    )
    assert got == want


def test_append_sink_would_duplicate(spark, drop_dir, tmp_path):
    """Negative control: prove the test setup actually exercises the
    at-least-once window. A blind append sink (the pre-fix behavior)
    run through the same crash/restart sequence ends up with batch 1
    duplicated — so the green tests above are evidence of idempotence,
    not of a crash that never happened."""
    plain, _, schema = drop_dir
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    crash = _crash_on(1)

    def blind_append(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)
        crash(batch_id)

    def start():
        return (
            read_stream(
                spark, plain, schema, fmt="parquet", max_files_per_trigger=1
            )
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(blind_append)
            .trigger(availableNow=True)
            .start()
        )

    with pytest.raises(StreamingQueryException):
        start().awaitTermination()
    start().awaitTermination()

    n_src = read_table(spark, SF, "events").count()
    n_sink = spark.read.parquet(sink).count()
    assert n_sink > n_src  # batch 1 written twice: replay duplicated it


def test_page_hinkley_state_restart_exactly_once(spark, drop_dir, tmp_path):
    """page_hinkley_stream's (n, mean, m, m_min) state must roll back
    and re-fold the replayed batch once — the same contract as the
    EWMA test, on the drift detector's 4-tuple state."""
    from sensor_time_series_pyspark_spark.streaming import (
        page_hinkley_batch,
        page_hinkley_stream,
    )

    plain, _, schema = drop_dir
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def stream():
        src = read_stream(
            spark, plain, schema, fmt="parquet", max_files_per_trigger=1
        )
        return page_hinkley_stream(
            src, key_col="event_type", ts_col="ts", value_col="value"
        )

    _run_expect_crash(stream(), sink, ckpt, _crash_on(1))
    _run(stream(), sink, ckpt)

    cols = ["event_type", "ts", "value", "ph", "alarm", "n_seen"]
    got = _rows(spark.read.parquet(sink).drop("_batch_id"), cols)
    want = _rows(
        page_hinkley_batch(
            read_table(spark, SF, "events"),
            key_col="event_type",
            ts_col="ts",
            value_col="value",
        ),
        cols,
    )
    assert got == want


def test_heavy_hitters_state_restart_exactly_once(spark, drop_dir, tmp_path):
    """heavy_hitters_stream keeps ARRAY state (tracked items + counts);
    a replayed batch must not double-increment the space-saving
    counters after rollback."""
    from sensor_time_series_pyspark_spark.streaming import (
        heavy_hitters_batch,
        heavy_hitters_stream,
    )

    plain, _, schema = drop_dir
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def stream():
        src = read_stream(
            spark, plain, schema, fmt="parquet", max_files_per_trigger=1
        )
        return heavy_hitters_stream(
            src, key_col="event_type", ts_col="ts", item_col="user_id",
            capacity=8,
        )

    _run_expect_crash(stream(), sink, ckpt, _crash_on(2))
    _run(stream(), sink, ckpt)

    cols = ["event_type", "ts", "item", "est_count", "n_tracked"]
    got = _rows(spark.read.parquet(sink).drop("_batch_id"), cols)
    want = _rows(
        heavy_hitters_batch(
            read_table(spark, SF, "events"),
            key_col="event_type",
            ts_col="ts",
            item_col="user_id",
            capacity=8,
        ),
        cols,
    )
    assert got == want
