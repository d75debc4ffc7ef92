"""Multimodal column plumbing tests: the JVM-side metadata path is
exact; the decode seam is stubbed but its Spark contract (schema,
determinism, batch shape) is real and pinned here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators.multimodal import (
    blob_metadata,
    decode_features,
    frame_sample_plan,
    sniff_format,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 20
JPeg = b"\xff\xd8\xff\xe0" + b"\x01" * 20
WAV = b"RIFF$\x00\x00\x00WAVE" + b"\x02" * 20
RAW = b"not a media file at all"


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [(1, PNG), (2, JPeg), (3, WAV), (4, RAW)]
    return spark.createDataFrame(rows, "id: long, blob: binary")


def test_sniff_format(spark, blobs):
    got = {
        r["id"]: r["fmt"]
        for r in blobs.select("id", sniff_format("blob").alias("fmt")).collect()
    }
    assert got == {1: "png", 2: "jpeg", 3: "riff", 4: "unknown"}


def test_blob_metadata_struct(spark, blobs):
    meta = blob_metadata(blobs, "blob").select("id", "meta.*").collect()
    by_id = {r["id"]: r for r in meta}
    assert by_id[1]["format"] == "png"
    assert by_id[1]["n_bytes"] == len(PNG)
    assert by_id[4]["content_md5"] is not None
    # hash64 is the dedup key: identical content → identical hash
    dup = spark.createDataFrame([(9, PNG)], "id: long, blob: binary")
    h1 = blob_metadata(dup, "blob").select("meta.content_hash64").first()[0]
    assert h1 == by_id[1]["content_hash64"]


def test_decode_features_contract(spark, blobs):
    out = decode_features(blobs, "blob", id_cols=["id"], dim=8)
    rows = out.collect()
    assert out.schema["features"].dataType.simpleString() == "array<float>"
    assert {r["id"] for r in rows} == {1, 2, 3, 4}
    assert all(len(r["features"]) == 8 for r in rows)
    # deterministic: same blob → same features across runs
    again = {r["id"]: r["features"] for r in decode_features(blobs, "blob", ["id"], dim=8).collect()}
    assert all(again[r["id"]] == r["features"] for r in rows)


def test_decode_features_real_decoder_raises(spark, blobs):
    with pytest.raises(NotImplementedError):
        decode_features(blobs, "blob", id_cols=["id"], decoder="pillow")


def test_frame_sample_plan(spark, blobs):
    plan = frame_sample_plan(blobs, "blob", ["id"], every_n=30, max_frames=4)
    rows = plan.where(F.col("id") == 1).collect()
    assert [r["frame_number"] for r in rows] == [0, 30, 60, 90]
    assert plan.count() == 4 * 4
