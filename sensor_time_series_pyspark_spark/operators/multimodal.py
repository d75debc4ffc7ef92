"""Multimodal (image/audio/video) column handling for training-data
pipelines (north-star extension, BASELINE.json — the reference has no
binary data at all, SURVEY.md §1).

Design: media are opaque ``binary`` columns + a typed metadata struct.
Everything that CAN be done JVM-side is (magic-byte sniffing, sizes,
hashes — pure column expressions); the decode/feature step runs as
Arrow-batched ``mapInPandas`` with a REAL Spark contract (schema,
batching, partitioning) and a STUBBED decoder: the container has no
image/audio libs, so ``decoder="fake"`` produces deterministic
hash-seeded features, and ``decoder="pillow"``/``"librosa"`` raise
NotImplementedError at the exact seam where a real deployment plugs in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

# magic-byte prefixes → format tag (JVM-side sniffing; hex uppercase)
_MAGIC = {
    "89504E47": "png",
    "FFD8FF": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "664C6143": "flac",
    "494433": "mp3",
    "1A45DFA3": "mkv/webm",
    "0000001866747970": "mp4",
}


def sniff_format(blob: Column | str) -> Column:
    """Container format from magic bytes — pure column expression
    (no Python): hex the first 8 bytes and prefix-match."""
    b = F.col(blob) if isinstance(blob, str) else blob
    head = F.hex(F.substring(b, 1, 8))
    expr = F.lit("unknown")
    # each when() wraps the previous expr, so the LAST-built branch is
    # tested first — iterate shortest-first so the longest prefix ends
    # up outermost and mp4's 8-byte magic wins over shorter prefixes
    for magic, fmt in sorted(_MAGIC.items(), key=lambda kv: len(kv[0])):
        expr = F.when(head.startswith(magic), F.lit(fmt)).otherwise(expr)
    return expr


def blob_metadata(df: DataFrame, blob_col: str, out_col: str = "meta") -> DataFrame:
    """Typed metadata struct for a binary column: size, format tag,
    content hash (the exact-dedup key for media), all JVM-side."""
    b = F.col(blob_col)
    meta = F.struct(
        F.length(b).alias("n_bytes"),
        sniff_format(b).alias("format"),
        F.md5(b).alias("content_md5"),
        F.xxhash64(b).alias("content_hash64"),
    )
    return df.withColumn(out_col, meta)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real encoder: sha256-seeded uniform
    vector. Stable across runs/executors — safe for tests and oracles."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random(dim, dtype=np.float32)


def _bytestat_features(payload: bytes, dim: int) -> np.ndarray:
    """Integer byte-statistics feature vector (dim is fixed at 8):
    [n_bytes, byte_sum, byte_min, byte_max, n_bytes<33, n_bytes>127,
    first_byte, last_byte]. Every value is an exact small integer
    (byte_sum < 2^24 for documents under ~65 KB, so float32 carries it
    exactly), which makes the whole decode path — a real Arrow-batched
    mapInPandas — reproducible in ANSI SQL for differential testing
    (q37's oracle). Real encoders replace the function, not the seam."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = int(arr.size)
    return np.array(
        [
            n,
            int(arr.sum()) if n else 0,
            int(arr.min()) if n else 0,
            int(arr.max()) if n else 0,
            int((arr < 33).sum()),
            int((arr > 127).sum()),
            int(arr[0]) if n else 0,
            int(arr[-1]) if n else 0,
        ],
        dtype=np.float32,
    )


def decode_features(
    df: DataFrame,
    blob_col: str,
    id_cols: Sequence[str],
    dim: int = 16,
    decoder: str = "fake",
    batch_rows: int = 256,
) -> DataFrame:
    """blob → feature vector via Arrow-batched ``mapInPandas``.

    The Spark plumbing is real: explicit output schema, bounded pandas
    batches (``spark.sql.execution.arrow.maxRecordsPerBatch`` caps
    memory per Python worker), narrow projection before the Python
    boundary so only (ids, blob) cross Arrow. ``decoder='fake'`` is the
    deterministic stub; real decoders raise at this seam until their
    libs are installed.
    """
    decoders = {"fake": _fake_features, "bytestats": _bytestat_features}
    if decoder not in decoders:
        raise NotImplementedError(
            f"decoder={decoder!r}: media libraries are not available in "
            "this environment — plug Pillow/librosa/av in here."
        )
    decode_fn = decoders[decoder]
    schema = StructType(
        [df.schema[c] for c in id_cols]
        + [StructField("features", ArrayType(FloatType()), False)]
    )
    narrow = df.select(*id_cols, blob_col)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_fn(bytes(x), dim) for x in pdf[blob_col]
            ]
            out = pdf[list(id_cols)].copy()
            out["features"] = feats
            yield out

    return narrow.mapInPandas(_decode, schema=schema)


def frame_sample_plan(
    df: DataFrame,
    blob_col: str,
    id_cols: Sequence[str],
    every_n: int = 30,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (video, frame
    index) — the explode happens BEFORE decode so frame decoding
    parallelizes across the cluster instead of per-video. The actual
    frame extraction is the stubbed decode seam above.
    """
    idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    return (
        df.select(*id_cols, blob_col, F.explode(idx).alias("frame_seq"))
        .withColumn("frame_number", F.col("frame_seq") * every_n)
        .drop("frame_seq")
    )


def frame_byte_stats(
    df: DataFrame,
    blob_col: str,
    id_cols: Sequence[str],
    frame_len: int = 12,
    stride: int = 16,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling + per-frame feature extraction in ONE Arrow pass:
    frame k covers bytes [k*stride, k*stride+frame_len) of the blob
    (video GOP / audio window analog), frames starting past the end are
    skipped, the tail frame may be short. Per frame, integer byte
    statistics stand in for the decoder output — deterministic and
    ANSI-SQL-expressible, so the WHOLE seam (explode-like fan-out
    inside mapInPandas, Arrow batch shape, schema) is differentially
    testable against an oracle, like decode_features' bytestats.

    At scale the fan-out multiplies rows by ≤ max_frames BEFORE any
    shuffle — frames of one blob stay in the producing task, so frame
    extraction parallelizes with the scan and no blob crosses the wire
    twice. A real video pipeline swaps the byte-slice for av/ffmpeg
    decode at this exact seam.

    Output: id_cols + frame_number, f_bytes, byte_sum, first_byte.
    """
    schema = StructType(
        [df.schema[c] for c in id_cols]
        + [
            StructField("frame_number", LongType(), False),
            StructField("f_bytes", LongType(), False),
            StructField("byte_sum", LongType(), False),
            StructField("first_byte", LongType(), False),
        ]
    )
    narrow = df.select(*id_cols, blob_col)
    ids = list(id_cols)

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for rec in pdf.itertuples(index=False):
                rec = rec._asdict()
                b = bytes(rec[blob_col])
                for k in range(max_frames):
                    off = k * stride
                    if off >= len(b):
                        break
                    fr = b[off : off + frame_len]
                    rows.append(
                        tuple(rec[c] for c in ids)
                        + (off, len(fr), sum(fr), fr[0])
                    )
            yield pd.DataFrame(
                rows,
                columns=ids
                + ["frame_number", "f_bytes", "byte_sum", "first_byte"],
            )

    return narrow.mapInPandas(_frames, schema=schema)
