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


def upsert_partitioned(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
    delete_col: str | None = None,
) -> dict[str, int]:
    """MERGE (upsert + optional delete) into a date/shard-partitioned
    parquet table WITHOUT a table format: the Delta/Iceberg ``MERGE
    INTO`` access pattern on plain files, done safely by rewriting only
    the partitions the change-batch touches.

    Steps (all pruning-friendly):
    1. collect the distinct partition values in ``updates`` — CDC
       batches touch few partitions, so this driver-side list is small;
    2. read ONLY those partitions of the base table (the IN-filter on
       the partition column prunes at file listing — no full scan);
    3. anti-join base rows against update keys (updates win), union the
       updates, drop rows flagged by ``delete_col`` if given;
    4. dynamic partition overwrite: Spark replaces exactly the
       partitions present in the merged frame, leaving the rest of the
       table untouched (same mechanism as plans/rollup.py).

    Refresh cost scales with |touched partitions|, not |table| — the
    property that makes CDC ingestion feasible at 100 TB. Readers see
    old-or-new per partition (no table-level transaction on plain
    parquet; for multi-partition atomicity use a manifest/table
    format on top).

    Dynamic overwrite only replaces partitions PRESENT in the merged
    frame, so a delete batch that empties a partition entirely would
    leave its old files in place — those partitions are detected and
    their directories dropped through the Hadoop FileSystem API (works
    on HDFS/S3A/local alike). Partition values must be
    path-representable (the usual date/int/shard keys).

    Returns {'touched_partitions', 'upserted', 'deleted'} counts.
    """
    from pyspark.sql import functions as F

    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not parts:
        return {"touched_partitions": 0, "upserted": 0, "deleted": 0}
    base = spark.read.parquet(table_dir).where(
        F.col(partition_col).isin(parts)
    )
    keys = list(key_cols)
    survivors = base.join(updates.select(*keys).distinct(), keys, "left_anti")
    if delete_col is not None:
        deleted = updates.where(F.col(delete_col)).count()
        live_updates = updates.where(~F.col(delete_col)).drop(delete_col)
    else:
        deleted = 0
        live_updates = updates
    # Materialize BEFORE overwriting: the broadcast anti-join has no
    # shuffle barrier, so without this the write stage would re-read
    # the same files it is deleting (rollup.py survives self-overwrite
    # only because its aggregate forces a shuffle first). The
    # checkpoint is bounded by the touched partitions, and
    # MEMORY_AND_DISK spills rather than OOMs.
    merged = survivors.unionByName(live_updates).localCheckpoint(eager=True)
    still_present = {
        r[0] for r in merged.select(partition_col).distinct().collect()
    }
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_dir)
    )
    # compare canonical string forms: union coercion can retype the
    # partition column (e.g. string updates vs date-inferred base), and
    # '2024-01-01' != date(2024,1,1) would flag every touched partition
    # as emptied — deleting live data
    present_strs = {str(x) for x in still_present}
    emptied = [p for p in parts if str(p) not in present_strs]
    if emptied:
        sc = spark.sparkContext
        hconf = sc._jsc.hadoopConfiguration()
        jvm = sc._jvm
        for p in emptied:
            path = jvm.org.apache.hadoop.fs.Path(
                f"{table_dir}/{partition_col}={p}"
            )
            fs = path.getFileSystem(hconf)
            fs.delete(path, True)
    return {
        "touched_partitions": len(parts),
        "upserted": live_updates.count(),
        "deleted": deleted,
    }


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
