"""Parquet layout maintenance: small-file compaction and sorted writes
for row-group data skipping.

Why this belongs in the engine: streaming ingestion (streaming/
ingest.py:write_parquet_stream) and frequent incremental rollups
(plans/rollup.py) both accrete many small files per partition — at
100 TB that means scan tasks dominated by file-open overhead and a
NameNode/listing bottleneck. The reference never handles this (its
sinks are one-shot `df.write.parquet`,
/root/reference/sensor_data_etl.py:104).

Two levers, both pure Spark:

- ``compact_parquet``: rewrite a directory (or selected partitions) to
  ~target-sized files. File count is computed from actual input bytes,
  not guessed; AQE cannot do this for you because the *write* fan-out
  is fixed by the final stage's partitioning.
- sorted writes (``sort_cols``): ``sortWithinPartitions`` before the
  write so parquet row-group min/max stats become narrow and
  non-overlapping on the sort key — readers then skip row groups on
  point/range predicates (data skipping), the poor man's Z-order.
  Single-column sorts get perfect skipping; for multi-column predicate
  mixes, interleave (Z-order proper) is the upgrade path.
"""

from __future__ import annotations

import math
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(path: str) -> int:
    """Recursive on-disk size of a local directory (driver-side; on a
    real cluster use the FileSystem API via Hadoop conf instead)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 256,
    partition_by: Sequence[str] | None = None,
    sort_cols: Sequence[str] | None = None,
    files_per_partition: int = 1,
) -> dict[str, int]:
    """Rewrite ``src`` parquet into ``dst`` with ~``target_file_mb``
    files, optionally re-partitioned at rest and sorted within files.

    Writes to a NEW directory: rewrite-in-place cannot be atomic on a
    plain filesystem — callers swap directories (or partition pointers)
    after success, which also preserves reader isolation during the
    rewrite. Returns {'input_bytes', 'n_files'} for observability.

    n_files is computed from the *input* byte size; parquet re-encoding
    usually shrinks output slightly (bigger row groups → better
    dictionary/RLE), so files land just under target — the right side
    to miss on.

    With ``partition_by``, hash-partitioning on the partition columns
    puts each at-rest partition in ONE task → one output file per
    partition value. That is the right default for compaction, but a
    hot partition becomes one oversized file — set
    ``files_per_partition > 1`` to salt the shuffle key and split every
    at-rest partition across that many writers/files.
    """
    in_bytes = dir_bytes(src)
    n_files = max(1, math.ceil(in_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    if partition_by:
        if files_per_partition > 1:
            from pyspark.sql import functions as F

            salted = df.withColumn(
                "__salt", (F.rand(seed=0) * files_per_partition).cast("int")
            )
            df = salted.repartition(
                n_files, *partition_by, "__salt"
            ).drop("__salt")
        else:
            # one file per at-rest partition value
            df = df.repartition(n_files, *partition_by)
    else:
        df = df.repartition(n_files)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dst)
    return {"input_bytes": in_bytes, "n_files": n_files}


def z_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    rel_err: float = 0.01,
) -> DataFrame:
    """Append a ``__z`` Morton (Z-order) key interleaving the bit-
    reversed quantile-bucket ranks of ``cols``.

    Each column is bucketed into 2^bits quantile buckets (boundaries
    from one approxQuantile pass, folded into the plan as literals —
    quantile buckets, unlike min/max width buckets, survive skew), then
    the bucket indices' bits are interleaved. Sorting by ``__z`` gives
    every column locality ~ n^(1/k) of the sort's, which is the whole
    point: ONE layout serves point/range predicates on ANY of the k
    columns. Pure column algebra — comparisons against literal
    boundaries plus shifts — no UDF, no extra shuffle beyond the sort.
    """
    from pyspark.sql import functions as F

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.stat.approxQuantile(list(cols), probs, rel_err)
    ranks = []
    for col, bs in zip(cols, bounds):
        # bucket index = #boundaries strictly below the value
        r = F.lit(0)
        for b in bs:
            r = r + F.when(F.col(col) > F.lit(b), 1).otherwise(0)
        ranks.append(r.cast("long"))
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, r in enumerate(ranks):
            z = z + (
                F.shiftleft(
                    F.shiftright(r, bit).bitwiseAND(F.lit(1)),
                    bit * len(ranks) + i,
                )
            )
    return df.withColumn("__z", z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int,
    bits: int = 8,
) -> None:
    """Z-order clustered write: range-partition + sort on the Morton
    key of ``cols`` so per-file min/max stats are narrow on EVERY
    clustered column — multi-column data skipping from plain parquet,
    no table format required. (Single-column workloads should prefer
    write_sorted: perfect 1-D skipping beats shared 2-D locality.)"""
    from pyspark.sql import functions as F

    zdf = z_value(df, cols, bits=bits)
    (
        zdf.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    partition_by: Sequence[str] | None = None,
    n_files: int | None = None,
) -> None:
    """Write with per-file sort so row-group min/max stats support data
    skipping on ``sort_cols``. Repartition RANGE on the sort key first
    (when ``n_files`` given) so files cover disjoint key ranges —
    point lookups then touch exactly one file."""
    from pyspark.sql import functions as F

    out = df
    if n_files:
        out = out.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
    out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
