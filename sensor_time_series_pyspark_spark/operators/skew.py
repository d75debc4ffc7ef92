"""Skew mitigation (SURVEY.md §7 step 8 "salted-key fallback").

AQE's skew-join split (on by default, session.py) handles most skew by
splitting oversized partitions AFTER materialization. Salting attacks it
earlier — at shuffle time — which is the only option when one key is so
hot a single partition won't even materialize, or when the engine can't
split (aggregations). Both operators are exact rewrites: same result,
different physical distribution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the hot side salted: ``left`` rows get a random
    salt in [0, salt), ``right`` rows are replicated to every salt
    value, and the join key becomes (on…, salt) — splitting each hot
    key's partition into ``salt`` pieces. Cost: |right| × salt
    replication, so use with a right side much smaller than the skew
    relief is worth (classic fact⋈dim skew).

    Which salt a left row draws never changes the join result — only
    its placement — so F.rand is safe here despite being
    non-deterministic under retries.
    """
    if how not in ("inner", "left"):
        raise NotImplementedError("salted_join supports inner/left")
    l = left.withColumn("__salt", F.floor(F.rand(seed) * salt).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, [*on, "__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple],
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: aggregate on
    (keys…, salt) first (splits each hot group across ``salt``
    reducers), then merge the partials on keys alone.

    ``aggs`` maps output column → (kind, input column) with kind in
    {'sum', 'count', 'min', 'max'} — the re-aggregatable kinds
    (partial 'count' re-aggregates via sum).
    """
    mergeable = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    remerge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for name, (kind, _) in aggs.items():
        if kind not in mergeable:
            raise ValueError(f"{name}: kind {kind!r} is not re-aggregatable")
    salted = df.withColumn("__salt", F.floor(F.rand(seed) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[mergeable[kind](col).alias(name) for name, (kind, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[remerge[kind](name).alias(name) for name, (kind, _) in aggs.items()]
    )
