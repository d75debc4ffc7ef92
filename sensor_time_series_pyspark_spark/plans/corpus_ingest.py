"""Incremental corpus ingestion with near-dup rejection — the
continuous training-data pipeline: documents arrive in batches (or as a
stream), and each batch is admitted only if it is neither an exact
duplicate, an already-ingested id, nor a MinHash-LSH near-duplicate of
the ACCEPTED corpus so far.

The store is two plain-parquet directories (no special table format):

    {store}/docs/   accepted documents (id, text, ...)
    {store}/bands/  their LSH band index (id, band_id, band_key)

Scale shape: a new batch joins the band store on (band_id, band_key) —
the store side is partitioned by band key hash, the batch side is tiny;
the accepted corpus is NEVER rescanned or re-signed (its bands were
persisted on admission — the same persisted-partials idea as the sketch
rollups). Batch-internal dedup runs first (exact, then in-batch LSH),
so a batch full of copies admits exactly one.

Replay-idempotent: already-stored ids are dropped before any decision,
so re-running a failed/duplicated batch converges to the same store —
the property the streaming face (foreachBatch) needs, since Structured
Streaming guarantees at-least-once delivery to the sink function.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import exact_dedup, minhash_bands


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def ingest_batch(
    spark: SparkSession,
    new_docs: DataFrame,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 2,
    n_hashes: int = 16,
    n_bands: int = 8,
) -> dict[str, int]:
    """Admit one batch into the corpus store. Returns counters:
    incoming, replayed (ids already stored), exact_dups (within batch),
    near_dups (LSH collision vs store or earlier in-batch doc),
    admitted."""
    docs_dir = os.path.join(store_dir, "docs")
    bands_dir = os.path.join(store_dir, "bands")
    incoming = new_docs.count()

    batch = new_docs
    # 0. replay guard: drop ids the store already ACCEPTED (docs/ holds
    #    admitted ids only — rejected ids are re-evaluated on replay;
    #    they collide with the stored bands again, so the admission
    #    outcome converges, but near_dups counters recount them)
    if _exists(spark, docs_dir):
        seen = spark.read.parquet(docs_dir).select(F.col(id_col).alias("__sid"))
        batch = batch.join(
            seen, batch[id_col] == F.col("__sid"), "left_anti"
        )
    after_replay = batch.count()

    # 1. exact dedup within the batch (lowest id survives)
    exact = exact_dedup(batch, text_col, id_col)
    after_exact = exact.count()
    exact = exact.localCheckpoint(eager=True)  # reused 3x below

    # 2. LSH bands for the deduped batch
    bands = minhash_bands(
        exact, id_col, text_col,
        shingle_k=shingle_k, n_hashes=n_hashes, n_bands=n_bands,
    ).localCheckpoint(eager=True)

    # 3a. near-dup vs the accepted corpus: any shared band key rejects
    if _exists(spark, bands_dir):
        store_bands = spark.read.parquet(bands_dir)
        vs_store = (
            bands.join(
                store_bands,
                ["band_id", "band_key"],
                "left_semi",
            )
            .select("id")
            .distinct()
        )
    else:
        vs_store = bands.select("id").where(F.lit(False))
    # 3b. near-dup within the batch: for each colliding band bucket the
    #     LOWEST id survives, later ids reject (deterministic)
    peer_min = bands.groupBy("band_id", "band_key").agg(
        F.min("id").alias("__min_id")
    )
    vs_batch = (
        bands.join(peer_min, ["band_id", "band_key"])
        .where(F.col("id") > F.col("__min_id"))
        .select("id")
        .distinct()
    )
    rejected = vs_store.unionByName(vs_batch).distinct()

    admitted = exact.join(
        rejected, exact[id_col] == rejected["id"], "left_anti"
    ).localCheckpoint(eager=True)
    admitted_bands = bands.join(
        rejected, bands["id"] == rejected["id"], "left_anti"
    ).select(F.col("id").alias(id_col) if id_col != "id" else "id",
             "band_id", "band_key")

    n_admitted = admitted.count()
    # bands BEFORE docs: the replay guard keys on docs/, so a crash
    # between the writes replays the id — duplicate band rows are
    # harmless (left_semi probe), a docs row without its bands is not.
    admitted_bands.write.mode("append").parquet(bands_dir)
    admitted.write.mode("append").parquet(docs_dir)
    return {
        "incoming": incoming,
        "replayed": incoming - after_replay,
        "exact_dups": after_replay - after_exact,
        "near_dups": after_exact - n_admitted,
        "admitted": n_admitted,
    }


def ingest_stream(
    sdf: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
):
    """Streaming face: foreachBatch over ``ingest_batch`` — exactly the
    batch semantics per micro-batch, and safe under replays because
    ingest_batch is idempotent on ids. Returns the StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch_df.sparkSession, batch_df, store_dir,
            id_col=id_col, text_col=text_col, **kwargs,
        )

    return (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
