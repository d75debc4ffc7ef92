"""Embedding similarity search at three scale tiers (north-star
extension; no reference analog — BASELINE.json).

1. brute-force exact top-k  — the correctness baseline: corpus scans
   once, queries broadcast, norms precomputed per row.
2. IVF approximate top-k    — the scale path: seeded KMeans cells,
   each query probes n_probe cells (a hash join on cell id), recall
   tunable.
3. int8-quantized storage   — 4x smaller embedding column; candidates
   score on dequantized vectors, then rerank on the float originals.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.functions.vectors import (
    dequantize_int8,
    quantize_int8,
)
from sensor_time_series_pyspark_spark.operators import ivf_topk_cosine, topk_cosine
from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.readers import read_table


def main(sf_dir: str, k: int = 5) -> int:
    spark = get_spark("example-similarity")
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)

    exact = topk_cosine(emb, queries, "vec_id", "vec_id", "embedding", k=k)
    approx = ivf_topk_cosine(
        emb, queries, "vec_id", "vec_id", "embedding", k=k, n_cells=8, n_probe=2
    )

    hits = (
        exact.select("qid", "cid")
        .join(approx.select("qid", "cid"), ["qid", "cid"], "inner")
        .count()
    )
    total = exact.count()
    print(f"IVF recall@{k} vs exact: {hits}/{total}")

    # quantized tier: store int8, search on reconstruction
    qemb = emb.select("vec_id", quantize_int8("embedding").alias("qs"))
    recon = qemb.select("vec_id", dequantize_int8("qs").alias("embedding"))
    rq = recon.where(F.col("vec_id") < 5)
    quant = topk_cosine(recon, rq, "vec_id", "vec_id", "embedding", k=k)
    qhits = (
        exact.select("qid", "cid")
        .join(quant.select("qid", "cid"), ["qid", "cid"], "inner")
        .count()
    )
    print(f"int8 recall@{k} vs exact: {qhits}/{total}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--k", type=int, default=5)
    a = p.parse_args()
    raise SystemExit(main(a.sf_dir, a.k))
