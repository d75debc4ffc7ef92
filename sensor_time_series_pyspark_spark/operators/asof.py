"""Event-time as-of join — the operator the reference only simulates
(lead() at day granularity + equi-join, sensor_data_regression.py:42-46;
SURVEY.md §2.3 "north-star" note).

Spark has no native ASOF JOIN; this is the standard composition:
union both sides tagged, one sort within the entity partition, carry the
right side's latest values forward, keep only left rows. Exactly one
shuffle on the entity key — same cost as the sort-merge join Spark would
pick for an equi-join, so it scales to 100 TB the same way.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    matched_ts_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the nearest right row within the
    same ``on`` key — the most recent with ``right_ts <= left_ts``
    (``direction='backward'``, default) or the earliest with
    ``right_ts >= left_ts`` (``'forward'``).

    ``tolerance_seconds`` nulls the carried values when the matched row
    is further than the tolerance from ``left_ts`` (pandas
    ``merge_asof(tolerance=...)`` semantics — the row stays, the match
    is dropped). ``matched_ts_col`` optionally exposes the matched
    right timestamp (NULL when no match / out of tolerance).

    ``value_cols`` are the right-side columns to carry. If several right
    rows share the same key+timestamp, pass a right-side ``tiebreak_col``
    that is unique per (key, timestamp): the winner among coincident
    right rows is then the one with the LARGEST tiebreak going backward
    (smallest going forward) — deterministic regardless of partitioning.
    Without it, pre-aggregate ``right`` first.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    backward = direction == "backward"
    out_cols = [c + suffix for c in value_cols]
    # the matched right timestamp is only observable through
    # tolerance_seconds / matched_ts_col — when neither is requested,
    # don't carry it: that drops one last(ignorenulls) window pass and
    # 8+ bytes/row from the union's exchange and sort
    need_rts = tolerance_seconds is not None or matched_ts_col is not None
    carry = list(out_cols) + (["__rts"] if need_rts else [])
    tb = ["__tb"] if tiebreak_col is not None else []
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        # right rows sort before left at equal timestamps going
        # backward (and after, going forward), so an exactly-coincident
        # right row IS visible to the left row in both directions.
        F.lit(0 if backward else 1).alias("__side"),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_cols)],
        *([F.col(right_ts).alias("__rts")] if need_rts else []),
        *([F.col(tiebreak_col).alias("__tb")] if tb else []),
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1 if backward else 0)
    )
    for o in carry + tb:
        l = l.withColumn(o, F.lit(None).cast(r.schema[o].dataType))
    unioned = l.unionByName(r, allowMissingColumns=True)

    if backward:
        w = (
            Window.partitionBy(*on)
            .orderBy("__ts", "__side", *tb)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        # forward direction mirrors the backward running frame on the
        # DESC sort instead of using (0, unboundedFollowing): Spark
        # evaluates UnboundedFollowing frames by re-scanning the
        # partition tail per row — O(n²), a wedge on hot keys — while
        # the DESC running frame is one incremental O(n) pass over the
        # exact reverse of the (ts, side) total order.
        w = (
            Window.partitionBy(*on)
            .orderBy(
                F.col("__ts").desc(),
                F.col("__side").desc(),
                *[F.col(c).desc() for c in tb],
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    for o in carry:
        unioned = unioned.withColumn(o, pick(o))
    out = unioned.where(F.col("__side") == (1 if backward else 0)).drop("__tb")
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__ts").cast("timestamp").cast("double")
            - F.col("__rts").cast("timestamp").cast("double")
        )
        ok = gap <= F.lit(float(tolerance_seconds))
        for o in carry:
            out = out.withColumn(o, F.when(ok, F.col(o)))
    if matched_ts_col is not None:
        out = out.withColumnRenamed("__rts", matched_ts_col)
    else:
        out = out.drop("__rts")
    return out.drop("__ts", "__side")


def asof_join_split(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    bucket_seconds: int,
    suffix: str = "",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    matched_ts_col: str | None = None,
    tiebreak_col: str | None = None,
    broadcast_seeds: bool = True,
    persist_union: bool = False,
) -> DataFrame:
    """``asof_join`` for skewed entity keys: the union-window runs
    within (key, time-bucket) so a hot key's rows parallelize across
    buckets instead of serializing through one window task, and a
    carry-forward seed repairs the bucket boundaries.

    The seed pass: per (key, bucket) the carry-OUT is the per-column
    last-non-null among the RIGHT rows of the bucket (left rows carry
    nothing, so the summary aggregates only the right side — usually
    dims/quotes, orders of magnitude smaller than the left facts); a
    per-key window over the BUCKET-grain summary (tiny:
    span/bucket_seconds rows per key) rolls carry-outs forward
    (backward direction; the DESC mirror going forward) into each
    bucket's carry-IN, which patches exactly the rows whose match
    precedes their bucket. Per-column ``coalesce(local, seed)``
    mirrors the plain path's per-column ``last(ignorenulls)``
    semantics bit-for-bit. Exact for ANY bucket_seconds > 0; same
    right-side dedup caveat as ``asof_join`` (or pass the same
    ``tiebreak_col``, honored in both the local window and the
    carry-out summary). Cost: one exchange on (key, bucket), one
    bucket-grain summary + seeds join — BROADCAST by default
    (``broadcast_seeds``), since the seeds frame is key×bucket grain;
    set False when keys×buckets outgrows the driver and the join falls
    back to a (balanced) shuffle on the composite key. The straggler
    shrinks from O(hot-key rows) to O(hot-key buckets). Verified
    row-identical to ``asof_join`` on the round-7 zipf fixture
    (tests/test_skew_stress.py)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    backward = direction == "backward"
    out_cols = [c + suffix for c in value_cols]
    # same __rts elision as asof_join: unobservable without
    # tolerance/matched_ts_col, and here it saves a window carry, a
    # seed column, and a slot in the summary max_by aggregate too
    need_rts = tolerance_seconds is not None or matched_ts_col is not None
    carry = list(out_cols) + (["__rts"] if need_rts else [])
    tb = ["__tb"] if tiebreak_col is not None else []
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0 if backward else 1).alias("__side"),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_cols)],
        *([F.col(right_ts).alias("__rts")] if need_rts else []),
        *([F.col(tiebreak_col).alias("__tb")] if tb else []),
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1 if backward else 0)
    )
    for o in carry + tb:
        l = l.withColumn(o, F.lit(None).cast(r.schema[o].dataType))
    unioned = l.unionByName(r, allowMissingColumns=True).withColumn(
        "__bucket",
        F.floor(
            F.col("__ts").cast("timestamp").cast("double")
            / F.lit(float(bucket_seconds))
        ).cast("bigint"),
    )

    keys = list(on)
    if backward:
        w = (
            Window.partitionBy(*keys, "__bucket")
            .orderBy("__ts", "__side", *tb)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(*keys, "__bucket")
            .orderBy(
                F.col("__ts").desc(),
                F.col("__side").desc(),
                *[F.col(c).desc() for c in tb],
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    for o in carry:
        unioned = unioned.withColumn(o, F.last(o, ignorenulls=True).over(w))
    if persist_union:
        # `unioned` feeds both the bucket spine and the seed-patched
        # output; default off for the same reason as
        # sessionize_split(persist_local=False) — AQE stage reuse
        # already shares the exchange, and the spine branch's window
        # is pruned by Catalyst, so recompute is one in-partition
        # aggregate, cheaper than a fact-grain cache barrier.
        from pyspark import StorageLevel

        unioned = unioned.persist(StorageLevel.MEMORY_AND_DISK)

    # carry-out per (key, bucket) from the RIGHT side only: for each
    # carried column, its value on the latest right row where it is
    # non-null (earliest, going forward) — max_by/min_by ignore rows
    # whose ordering key is NULL, which implements the per-column
    # last-non-null exactly (same right-side tie caveat as the plain
    # path: pre-aggregate duplicates per key+ts)
    r_b = r.withColumn(
        "__bucket",
        F.floor(
            F.col("__ts").cast("timestamp").cast("double")
            / F.lit(float(bucket_seconds))
        ).cast("bigint"),
    )
    pick = F.max_by if backward else F.min_by
    # with a tiebreak the ordering key is struct(ts, tb) — lexicographic
    # struct comparison, so coincident right rows resolve the same way
    # the window path does (largest tb backward, smallest forward)
    okey = (
        (lambda: F.struct(F.col("__ts"), F.col("__tb")))
        if tb
        else (lambda: F.col("__ts"))
    )
    summary = r_b.groupBy(*keys, "__bucket").agg(
        *[
            pick(F.col(o), F.when(F.col(o).isNotNull(), okey())).alias(o)
            for o in carry
        ]
    )
    # the roll must visit every bucket the LEFT occupies too (a left
    # row in a right-empty bucket still needs the carry from earlier
    # buckets) — a distinct over (key, bucket) is map-side combined,
    # so its shuffle is bucket-grain, not fact-grain
    spine = unioned.select(*keys, "__bucket").distinct()
    summary = spine.join(summary, [*keys, "__bucket"], "left")
    if backward:
        w_seed = (
            Window.partitionBy(*keys)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
        w_seed = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__bucket").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    seeds = summary.select(
        *keys,
        "__bucket",
        *[
            F.last(F.col(o), ignorenulls=True)
            .over(w_seed)
            .alias(f"__seed_{o}")
            for o in carry
        ],
    )

    if broadcast_seeds:
        seeds = F.broadcast(seeds)
    patched = unioned.join(seeds, [*keys, "__bucket"], "left")
    for o in carry:
        patched = patched.withColumn(
            o, F.coalesce(F.col(o), F.col(f"__seed_{o}"))
        ).drop(f"__seed_{o}")

    out = patched.where(F.col("__side") == (1 if backward else 0)).drop("__tb")
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__ts").cast("timestamp").cast("double")
            - F.col("__rts").cast("timestamp").cast("double")
        )
        ok = gap <= F.lit(float(tolerance_seconds))
        for o in carry:
            out = out.withColumn(o, F.when(ok, F.col(o)))
    if matched_ts_col is not None:
        out = out.withColumnRenamed("__rts", matched_ts_col)
    else:
        out = out.drop("__rts")
    return out.drop("__ts", "__side", "__bucket")
