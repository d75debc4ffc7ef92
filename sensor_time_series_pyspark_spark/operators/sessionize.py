"""Gap-based sessionization (alarm-episode grouping, SURVEY.md §2.11
north star). Batch variant: lag + cumulative-sum over a per-entity
window. The streaming twin is ``F.session_window`` (streaming/ingest.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str,
    partition_by: Sequence[str],
    gap_seconds: int,
    session_col: str = "session_seq",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Add a per-entity session sequence number: a new session starts
    when the gap since the previous event exceeds ``gap_seconds``.

    One shuffle (by entity key); the cumulative sum runs inside the
    sorted partition. The session NUMBER is tie-invariant (coincident
    timestamps have gap 0 and always share a session), but pass a
    ``tiebreak_col`` unique per (entity, ts) when downstream consumers
    need a fully deterministic within-session row order.
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col is not None else [])
    w = Window.partitionBy(*partition_by).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.col(ts_col).cast("double") - prev_ts.cast("double")) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*partition_by).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("__new", is_new).withColumn(
        session_col, F.sum("__new").over(running)
    ).drop("__new")


def sessionize_split(
    df: DataFrame,
    ts_col: str,
    partition_by: Sequence[str],
    gap_seconds: int,
    bucket_seconds: int,
    session_col: str = "session_seq",
    broadcast_stitch: bool = True,
    tiebreak_col: str | None = None,
    persist_local: bool = False,
) -> DataFrame:
    """``sessionize`` for skewed entity keys: range-split each entity's
    timeline into ``bucket_seconds`` buckets, sessionize WITHIN
    (entity, bucket) — so a hot entity's events parallelize across
    buckets instead of serializing through one window task — then
    stitch sessions across bucket boundaries on a tiny per-(entity,
    bucket) summary frame.

    Exact for ANY ``bucket_seconds`` > 0: within a bucket the local
    pass sees every gap except the one crossing the boundary, and the
    stitch repairs exactly that one — bucket b's first session merges
    into the previous non-empty bucket's last session iff
    ``min_ts(b) - max_ts(prev) <= gap_seconds`` (the lag over the
    summary frame skips empty buckets, so no relation between bucket
    width and gap is required). Global numbering replays the local
    sequence with a per-bucket offset:

        offset_b = Σ_{b'<b} (n_sessions_{b'} - merge_{b'})
        seq(row) = offset_b + local_seq(row) - merge_b

    Cost: one exchange on (entity, bucket) for the local pass, one
    group-cardinality summary (buckets per entity ≈ span/bucket_
    seconds) stitched with a per-entity window, and one equi-join of
    the offsets back on (entity, bucket) — BROADCAST by default
    (``broadcast_stitch``), since the stitch frame is entity×bucket
    grain, not event grain; set False when entities×buckets outgrows
    the driver and the join falls back to a (balanced) shuffle on the
    composite key. The summary window IS single-task per entity, but
    over buckets, not events — the straggler shrinks from
    O(hot-entity events) to O(hot-entity buckets). Verified
    row-identical to ``sessionize`` on the round-7 zipf fixture
    (tests/test_skew_stress.py)."""
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    keys = list(partition_by)
    ep = F.col(ts_col).cast("double")
    bdf = df.withColumn(
        "__bucket", F.floor(ep / F.lit(float(bucket_seconds))).cast("bigint")
    )
    order = [ts_col] + ([tiebreak_col] if tiebreak_col is not None else [])
    w_local = Window.partitionBy(*keys, "__bucket").orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w_local)
    is_new = F.when(
        prev_ts.isNull()
        | ((ep - prev_ts.cast("double")) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    run_local = (
        Window.partitionBy(*keys, "__bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bdf.withColumn("__new", is_new).withColumn(
        "__lseq", F.sum("__new").over(run_local)
    )
    if persist_local:
        # `local` feeds both the stitch summary and the final join;
        # AQE's stage cache already reuses the (identical) exchange
        # below the two window copies, so by default recomputing the
        # in-partition sort+window twice beats paying a fact-grain
        # materialization barrier. Opt in when the upstream pipeline
        # is expensive to recompute.
        from pyspark import StorageLevel

        local = local.persist(StorageLevel.MEMORY_AND_DISK)

    summary = local.groupBy(*keys, "__bucket").agg(
        F.min(ts_col).alias("__bmin"),
        F.max(ts_col).alias("__bmax"),
        F.max("__lseq").cast("bigint").alias("__nsess"),
    )
    w_ent = Window.partitionBy(*keys).orderBy("__bucket")
    prev_max = F.lag(F.col("__bmax")).over(w_ent)
    merge = F.when(
        prev_max.isNotNull()
        & (
            (F.col("__bmin").cast("double") - prev_max.cast("double"))
            <= gap_seconds
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    w_prior = (
        Window.partitionBy(*keys)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stitched = summary.withColumn("__merge", merge).select(
        *keys,
        "__bucket",
        "__merge",
        F.coalesce(
            F.sum(F.col("__nsess") - F.col("__merge")).over(w_prior),
            F.lit(0),
        )
        .cast("bigint")
        .alias("__offset"),
    )

    if broadcast_stitch:
        stitched = F.broadcast(stitched)
    out = local.join(stitched, [*keys, "__bucket"]).withColumn(
        session_col,
        (F.col("__offset") + F.col("__lseq") - F.col("__merge")).cast(
            "bigint"
        ),
    )
    return out.drop("__bucket", "__new", "__lseq", "__merge", "__offset")
