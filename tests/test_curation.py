"""End-to-end curation pipeline (plans/curation.py)."""

from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.plans.curation import (
    CurationConfig,
    curate,
)
from sensor_time_series_pyspark_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def test_curate_end_to_end(spark):
    docs = read_table(spark, SF, "documents")
    cfg = CurationConfig(lang_from_column="lang", keep_langs=("en", "de"),
                         chunk_size=32)
    chunks, survivors, funnel, weights = curate(docs, cfg)
    f = {r["stage"]: r["n_docs"] for r in funnel.collect()}
    # funnel is monotonically non-increasing
    order = ["0_ingested", "1_lang", "2_quality", "3_exact_dedup", "4_near_dup"]
    vals = [f[s] for s in order]
    assert vals == sorted(vals, reverse=True)
    assert f["0_ingested"] == docs.count()
    assert f["4_near_dup"] == survivors.count() > 0
    # every chunk belongs to a survivor; token conservation per doc
    sv_ids = {r["id"] for r in survivors.select("id").collect()}
    ch = chunks.groupBy("id").agg(F.sum("n_tokens").alias("nt")).collect()
    assert {r["id"] for r in ch} == sv_ids
    # weights cover every surviving source and equalize shares
    w = weights.collect()
    assert abs(sum(r["token_share"] for r in w) - 1.0) < 1e-9


def test_curate_deterministic(spark):
    docs = read_table(spark, SF, "documents")
    cfg = CurationConfig(lang_from_column="lang", keep_langs=("en",))
    _, s1, f1, _ = curate(docs, cfg)
    _, s2, f2, _ = curate(docs, cfg)
    assert sorted(r["id"] for r in s1.collect()) == sorted(
        r["id"] for r in s2.collect()
    )
    assert f1.collect() == f2.collect()


def test_curate_rejects_planted_near_dup(spark):
    base = read_table(spark, SF, "documents").limit(20)
    cfg = CurationConfig(lang_from_column="lang",
                         keep_langs=("en", "de", "es", "fr", "zh"))
    # find a doc that survives the full pipeline, then plant a
    # near-copy of IT with a huge id (loses the min-id race)
    _, s0, _, _ = curate(base, cfg)
    donor = min(r["id"] for r in s0.collect())
    dx = base.where(F.col("doc_id") == donor).select(
        F.lit(10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang", "source", "n_chars",
    )
    docs = base.unionByName(dx)
    _, survivors, _, _ = curate(docs, cfg)
    ids = {r["id"] for r in survivors.collect()}
    assert 10_000_000 not in ids
    assert donor in ids


def test_curate_and_publish_example(spark, tmp_path):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import curate_and_publish

    out = str(tmp_path / "release")
    assert curate_and_publish.main(SF, out) == 0
    from sensor_time_series_pyspark_spark.sources.versioned import read_latest

    assert read_latest(spark, out).count() > 0
