"""Snapshot diff: classify rows as added / removed / changed / unchanged
between two versions of a keyed table.

The data-versioning primitive behind CDC audits, regression-testing a
pipeline rewrite, and incremental-publish decisions ("did this partition
actually change?"). The reference has no analog; pairs with
sources/maintenance.py:upsert_partitioned (which APPLIES a change feed —
this DERIVES one).

Spark shape: ONE full outer join on the key columns (shuffle both sides
on the key — at 100 TB both sides hash-partition and stream; no
collect), comparing a 64-bit content hash of the non-key columns
computed map-side BEFORE the join, so the shuffle carries (key, hash)
plus whatever columns the caller wants echoed, not the full row twice.
Column order is pinned explicitly so the hash is stable across schema
re-orderings of either side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of ``new`` vs ``old`` on ``keys``.

    ``compare_cols`` defaults to all shared non-key columns, in sorted
    name order (stable under projection reordering). NULLs participate
    via a sentinel-free struct hash (xxhash64 over the struct, which is
    NULL-position-aware).

    Output: [*keys], change ('added' | 'removed' | 'changed' |
    'unchanged'). Filter + aggregate downstream as needed; the frame is
    one row per key in either version.
    """
    ks = list(keys)
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(c for c in shared if c not in ks)
    cmp_cols = list(compare_cols)

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *[F.col(k) for k in ks],
            F.xxhash64(F.struct(*[F.col(c) for c in cmp_cols])).alias(f"__h_{tag}"),
        )

    o = hashed(old, "o")
    n = hashed(new, "n")
    joined = o.join(n, ks, "full_outer")
    change = (
        F.when(F.col("__h_o").isNull(), F.lit("added"))
        .when(F.col("__h_n").isNull(), F.lit("removed"))
        .when(F.col("__h_o") == F.col("__h_n"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*ks, change.alias("change"))
