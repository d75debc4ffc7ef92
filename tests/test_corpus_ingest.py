"""plans/corpus_ingest.py: incremental near-dup-rejecting ingestion —
admission decisions, replay idempotence, and the streaming face."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.plans.corpus_ingest import (
    ingest_batch,
    ingest_stream,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = BASE.replace("today", "tonight")          # one-token edit → near-dup
NOVEL = "completely different content about distributed query engines at scale"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ingest_admission_decisions(spark, tmp_path):
    store = str(tmp_path / "store")
    r1 = ingest_batch(spark, _df(spark, [(1, BASE), (2, NOVEL)]), store)
    assert r1["admitted"] == 2 and r1["near_dups"] == 0

    batch2 = [
        (1, BASE),         # replayed id → dropped before any decision
        (3, BASE),         # exact text of stored doc → LSH rejects
        (4, NEAR),         # near-dup of stored doc → LSH rejects
        (5, NOVEL + " plus brand new trailing words making it distinct"),
        (6, "entirely unrelated text about sensor calibration routines ok"),
    ]
    r2 = ingest_batch(spark, _df(spark, batch2), store)
    assert r2["replayed"] == 1
    assert r2["near_dups"] >= 2          # docs 3 and 4 at minimum
    assert r2["admitted"] >= 1           # doc 6 must survive
    stored = spark.read.parquet(store + "/docs")
    ids = {r["doc_id"] for r in stored.collect()}
    assert {1, 2, 6} <= ids and 3 not in ids and 4 not in ids


def test_ingest_batch_internal_dedup(spark, tmp_path):
    store = str(tmp_path / "store")
    rows = [(10, BASE), (11, BASE), (12, NEAR)]
    r = ingest_batch(spark, _df(spark, rows), store)
    # 11 is an exact in-batch dup; 12 is an in-batch near-dup of 10
    assert r["exact_dups"] == 1 and r["near_dups"] == 1 and r["admitted"] == 1
    ids = {x["doc_id"] for x in spark.read.parquet(store + "/docs").collect()}
    assert ids == {10}


def test_ingest_replay_idempotent(spark, tmp_path):
    store = str(tmp_path / "store")
    batch = _df(spark, [(1, BASE), (2, NOVEL)])
    ingest_batch(spark, batch, store)
    r2 = ingest_batch(spark, batch, store)   # full replay
    assert r2["admitted"] == 0 and r2["replayed"] == 2
    assert spark.read.parquet(store + "/docs").count() == 2


def test_ingest_stream_face(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _df(spark, [(1, BASE), (2, NOVEL), (3, NEAR)]).write.parquet(src)
    schema = spark.read.parquet(src).schema
    sdf = spark.readStream.schema(schema).parquet(src)
    q = ingest_stream(sdf, store, ckpt)
    q.awaitTermination(120)
    ids = {r["doc_id"] for r in spark.read.parquet(store + "/docs").collect()}
    assert 3 not in ids and {1, 2} == ids
