"""Bucketed tables — shuffle-free co-located joins (SURVEY.md §7
step 8 / the "Partitioning & shuffle" scale mandate).

A fact⋈fact equi-join shuffles BOTH sides every query. Writing both
tables bucketed by the join key (same bucket count) moves that shuffle
to write time, once: every subsequent join on the bucket key is a
zero-exchange sort-merge join. The win compounds — at 100 TB a saved
shuffle is the difference between minutes and hours per query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table. ``sort_cols`` adds
    within-bucket ordering (lets the join skip its sort too). ``path``
    pins the data location (tests point it at a tmp dir; production
    points at the warehouse)."""
    writer = df.write.mode(mode).format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table. Bucket metadata lives in the catalog, so
    the read MUST go through the table name — a raw parquet-path read
    loses the bucket spec and re-shuffles on join."""
    return spark.table(table)
