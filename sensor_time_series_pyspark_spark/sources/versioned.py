"""Versioned parquet tables on plain object storage — snapshot
publishing, time travel, and rollback without a table format.

The classic metadata-pointer pattern (the kernel of what Delta/Iceberg
do, reduced to its load-bearing minimum): every write lands in a fresh
immutable ``v=N`` directory, readers resolve the current snapshot
through a tiny ``_LATEST`` pointer file, and publishing is the ONE
atomic operation — an overwrite of that pointer. Writers never mutate a
published directory, so readers are never exposed to partial data
(write-audit-publish: the audit step runs on the staged ``v=N`` before
the pointer moves). Rollback is a pointer rewrite; old snapshots remain
readable for time travel until vacuumed.

At 100 TB the data copy is the same cost any snapshot write pays; the
consistency mechanism is O(1) metadata regardless of table size —
which is why the pointer file, not a directory listing, must be the
source of truth (listings race with concurrent writers; the pointer
read is a single atomic GET).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), jvm


def _read_pointer(spark: SparkSession, table_dir: str) -> int | None:
    fs, jvm = _fs(spark, table_dir)
    ptr = jvm.org.apache.hadoop.fs.Path(os.path.join(table_dir, "_LATEST"))
    if not fs.exists(ptr):
        return None
    stream = fs.open(ptr)
    try:
        data = bytes(stream.readAllBytes()).decode("utf-8").strip()
    finally:
        stream.close()
    return int(data) if data else None


def _write_pointer(spark: SparkSession, table_dir: str, version: int) -> None:
    fs, jvm = _fs(spark, table_dir)
    tmp = jvm.org.apache.hadoop.fs.Path(
        os.path.join(table_dir, f"_LATEST.tmp.{version}")
    )
    out = fs.create(tmp, True)
    try:
        out.write(str(version).encode("utf-8"))
    finally:
        out.close()
    ptr = jvm.org.apache.hadoop.fs.Path(os.path.join(table_dir, "_LATEST"))
    # FileContext.rename(OVERWRITE): atomic replace on HDFS/local — a
    # concurrent reader sees either the old pointer or the new one,
    # never a missing/partial file (a delete-then-rename would open a
    # no-pointer window). On S3 substitute a conditional PUT; the
    # pointer is one small object either way.
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    rename_opts = spark.sparkContext._gateway.new_array(
        jvm.org.apache.hadoop.fs.Options.Rename, 1
    )
    rename_opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    fc.rename(tmp, ptr, rename_opts)


def write_version(
    df: DataFrame,
    table_dir: str,
    validate=None,
) -> int:
    """Write a new immutable snapshot and publish it. Returns the new
    version number.

    ``validate`` (optional): a callable ``DataFrame -> None`` that
    raises to abort BEFORE the pointer moves — the 'audit' of
    write-audit-publish; a failed write leaves the staged directory
    unpublished and readers untouched.
    """
    spark = df.sparkSession
    # allocate past every EXISTING snapshot, not just the published one
    # — after a rollback the pointer is behind and pointer+1 would
    # collide with an immutable directory (errorifexists would save us,
    # but forward-only numbering keeps history linear and lets the
    # rolled-back branch remain time-travelable)
    fs, jvm = _fs(spark, table_dir)
    base = jvm.org.apache.hadoop.fs.Path(table_dir)
    existing = []
    if fs.exists(base):
        for st in fs.listStatus(base):
            name = st.getPath().getName()
            if name.startswith("v="):
                existing.append(int(name[2:]))
    cur = _read_pointer(spark, table_dir)
    new = max([cur or 0, *existing, 0]) + 1
    vdir = os.path.join(table_dir, f"v={new}")
    df.write.mode("errorifexists").parquet(vdir)
    if validate is not None:
        validate(spark.read.parquet(vdir))
    _write_pointer(spark, table_dir, new)
    return new


def read_latest(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the currently-published snapshot."""
    cur = _read_pointer(spark, table_dir)
    if cur is None:
        raise FileNotFoundError(f"no published version in {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v={cur}"))


def read_version(spark: SparkSession, table_dir: str, version: int) -> DataFrame:
    """Time travel: read a specific (still-retained) snapshot."""
    return spark.read.parquet(os.path.join(table_dir, f"v={version}"))


def current_version(spark: SparkSession, table_dir: str) -> int | None:
    return _read_pointer(spark, table_dir)


def rollback(spark: SparkSession, table_dir: str, version: int) -> None:
    """Point readers back at an older snapshot (O(1) metadata)."""
    fs, jvm = _fs(spark, table_dir)
    vdir = jvm.org.apache.hadoop.fs.Path(os.path.join(table_dir, f"v={version}"))
    if not fs.exists(vdir):
        raise FileNotFoundError(f"version {version} not found in {table_dir}")
    _write_pointer(spark, table_dir, version)


def vacuum(spark: SparkSession, table_dir: str, keep: int = 2) -> list[int]:
    """Delete snapshots older than the newest ``keep`` (never the
    published one). Returns the deleted version numbers."""
    fs, jvm = _fs(spark, table_dir)
    base = jvm.org.apache.hadoop.fs.Path(table_dir)
    if not fs.exists(base):
        return []
    versions = []
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if name.startswith("v="):
            versions.append(int(name[2:]))
    cur = _read_pointer(spark, table_dir)
    keep_set = set(sorted(versions)[-keep:]) | ({cur} if cur else set())
    deleted = []
    for v in sorted(versions):
        if v not in keep_set:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(os.path.join(table_dir, f"v={v}")),
                True,
            )
            deleted.append(v)
    return deleted
