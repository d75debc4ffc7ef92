"""End-to-end training-data curation (north-star pipeline; no
reference analog — BASELINE.json's LLM-data-pipeline extension).

documents → exact dedup → near-dup clustering → canonical selection →
quality/language gating → token accounting. Every stage is a library
operator; the whole pipeline is one lazy DataFrame graph with exactly
two actions (the final write + its observe() metrics).

Scale shape: the expensive stage is near-dup pair generation — an
inverted-index join over hashed shingles (never a cross join), with
`max_token_df` pruning ubiquitous shingles (the skew valve). Cluster
assignment is iterative min-label propagation, O(diameter) rounds.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.functions.text import (
    lang_id,
    quality_score,
    token_count,
)
from sensor_time_series_pyspark_spark.operators import (
    dedup_clusters,
    exact_dedup,
    hash_split,
    jaccard_pairs,
    pack_offsets,
    spread,
)
from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.readers import read_table


def main(sf_dir: str, out: str, threshold: float = 0.2) -> int:
    spark = get_spark("example-train-data")
    docs = read_table(spark, sf_dir, "documents")

    # 1. exact dedup (lowest doc_id wins) — cheapest filter first;
    #    near-dup candidate space shrinks by the dup factor SQUARED
    reps = exact_dedup(docs, "text", "doc_id")

    # 2. near-dup clustering: pairs -> connected components;
    #    cluster_id == lowest member == the doc we keep
    pairs = jaccard_pairs(reps, "doc_id", "text", threshold=threshold, shingle_k=3)
    clusters = dedup_clusters(pairs)
    non_canonical = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    keep = reps.join(non_canonical, "doc_id", "left_anti")

    # 3. quality + language gate, token accounting (all JVM-side)
    curated = (
        spread(keep)
        .withColumn("lang_pred", lang_id("text"))
        .withColumn("quality", quality_score("text"))
        .withColumn("n_tokens", token_count("text"))
        .where((F.col("quality") >= 0.3) & (F.col("lang_pred") != "unknown"))
    )

    # 4. deterministic, leakage-free split (content-hash on doc_id —
    #    stable across runs/engines/partitionings) + training layout:
    #    concat-and-chunk token offsets per (split, lang) stream
    split_docs = hash_split(
        curated, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, salt="v1"
    )
    layout = pack_offsets(
        split_docs, "doc_id", "n_tokens", budget=2048,
        partition_by=["split", "lang_pred"],
    )
    final = split_docs.join(
        layout.select("id", "offset", "chunk_id"),
        split_docs["doc_id"] == layout["id"],
    ).drop("id")

    final.write.mode("overwrite").partitionBy("split").parquet(out)
    got = spark.read.parquet(out)
    total = got.count()
    by_split = {
        r["split"]: (r["n"], r["tok"])
        for r in got.groupBy("split").agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok")
        ).collect()
    }
    print(
        f"curated {total} docs (from {docs.count()} raw) -> {out}; "
        + "; ".join(
            f"{s}: {n} docs / {t} tokens" for s, (n, t) in sorted(by_split.items())
        )
    )
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", default="/tmp/train_data_out")
    p.add_argument("--threshold", type=float, default=0.2)
    a = p.parse_args()
    raise SystemExit(main(a.sf_dir, a.out, a.threshold))
