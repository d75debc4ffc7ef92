"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship sensor-ETL analog on sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (+ north-star extensions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each SQL-expressible query.

Conventions (keep these or the value-hash comparison breaks):
- every computed/aggregate column is aliased identically on both sides;
- SUMs/AVGs over double columns are computed EXACTLY: operands are cast
  to decimal, summed (exact, order-independent), cast back to double,
  and averages do one final double division. Plain double sums differ
  in low bits between engines (summation order), and rounding can't fix
  half-boundary cases — decimal arithmetic makes both engines
  bit-identical with no rounding at all;
- DuckDB ``count(*)``/``sum(int)``/``row_number`` are cast to Spark's types;
- timestamps: Spark session TZ is UTC; DuckDB buckets are built with
  ``make_timestamp`` (naive) to match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint64,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    STOPWORDS,
)
from sensor_time_series_pyspark_spark.operators import (
    asof_join,
    dedup_clusters,
    exact_dedup,
    missing_buckets,
    ffill,
    interpolate_linear,
    jaccard_pairs,
    lead_target,
    minhash_lsh_pairs,
    minhash_pairs,
    pivot_wide,
    quantile_clip,
    resample,
    sessionize,
    simhash_pairs,
    spread,
    topk_cosine,
)
from sensor_time_series_pyspark_spark.ml import (
    classification_pipeline,
    decode_predictions,
    decompose,
    fit_forecast,
    grid_search_forecast,
    regression_pipeline,
    temporal_split,
)
from sensor_time_series_pyspark_spark.plans import sensor_etl
from sensor_time_series_pyspark_spark.sources.readers import read_table

SF0001 = "/root/testdata/sf0.001"

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

# Deterministic aggregate helpers (see module docstring). DEC is wide
# enough for any testdata sum; 6 fractional digits covers 2-decimal
# money columns and their 3-factor products.
DEC = "decimal(38,6)"


def _dsum(col: F.Column) -> F.Column:
    """Exact, order-independent sum of a double column → double."""
    return F.sum(col.cast(DEC)).cast("double")


def _davg(col: F.Column) -> F.Column:
    """Deterministic mean: exact decimal sum, one double division."""
    return _dsum(col) / F.count(col)


def _dec(name: str) -> F.Column:
    """Column cast to decimal(12,2) for exact product arithmetic."""
    return F.col(name).cast("decimal(12,2)")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return sensor_etl(spark, SF0001)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_flagship(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's full ETL pipeline (sensor_data_etl.py:24-104)
    re-expressed Spark-first: long events → repair → filter → dim join
    → ONE conditional pivot aggregate → impute → broadcast nation join
    (plans/sensor_etl.py; replaces the reference's two groupBys +
    3-key self-join + ≥6 DAG recomputations)."""
    df = sensor_etl(spark, sf)
    return df.select(
        "bucket", "c_nationkey", *EVENT_TYPES, "severity", "n_events", "n_name"
    )


def _q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: the reference's A1-style multi-agg groupBy at
    fact scale (hash aggregate, map-side partials, one shuffle)."""
    li = read_table(spark, sf, "lineitem")
    # Exact SCALED-LONG arithmetic: the three money columns carry <= 2
    # decimals and are non-negative, so (x*100 + 0.5)::long recovers
    # the exact cent integer with pure double ops — no per-row decimal
    # cast (the casts, not the sums, cost 3x: 0.885s -> 0.53s at
    # sf0.1). Products stay integers at scale 1e4/1e6; the largest
    # group sum (~6.6e16 at sf0.1) is far under 2^63, and ANSI mode
    # fails loudly (never wraps) at the ~8e7-rows-per-group point where
    # a 100 TB run must switch to the decimal form. Final values are
    # the same exact integers the decimal form produces, so the
    # cast-to-double + one division epilogue hash-matches the oracle's
    # decimal sums (verified at sf0.001/0.01/0.1).
    cents = lambda c: (F.col(c) * 100 + F.lit(0.5)).cast("long")  # noqa: E731
    qty, ext = cents("l_quantity"), cents("l_extendedprice")
    dis, tax = cents("l_discount"), cents("l_tax")
    disc_price = ext * (F.lit(100) - dis)           # scale 1e4
    charge = disc_price * (F.lit(100) + tax)        # scale 1e6
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty).cast("double") / F.lit(1e2)).alias("sum_qty"),
            (F.sum(ext).cast("double") / F.lit(1e2)).alias("sum_base_price"),
            (F.sum(disc_price).cast("double") / F.lit(1e4)).alias(
                "sum_disc_price"
            ),
            (F.sum(charge).cast("double") / F.lit(1e6)).alias("sum_charge"),
            (
                F.sum(qty).cast("double") / F.lit(1e2)
                / F.count(F.col("l_quantity"))
            ).alias("avg_qty"),
            (
                F.sum(ext).cast("double") / F.lit(1e2)
                / F.count(F.col("l_extendedprice"))
            ).alias("avg_price"),
            (
                F.sum(dis).cast("double") / F.lit(1e2)
                / F.count(F.col("l_discount"))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_segment_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two fact joins → agg
    (reference J1/J4 composition). Catalyst broadcast-joins the filtered
    customer side under AQE."""
    c = read_table(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = read_table(spark, sf, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


def _q_region_supplier_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Snowflake dim chain with broadcast joins (reference J3)."""
    s = read_table(spark, sf, "supplier")
    n = read_table(spark, sf, "nation")
    r = read_table(spark, sf, "region")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            _davg(F.col("s_acctbal")).alias("avg_acctbal"),
        )
    )


def _q_event_type_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Long→wide pivot via one-shuffle conditional aggregation
    (reference A2+A6, operators/pivot.py)."""
    ev = read_table(spark, sf, "events")
    wide = pivot_wide(
        ev,
        keys=["user_id"],
        pivot_col="event_type",
        pivot_values=EVENT_TYPES,
        value_col="value",
        agg="avg_decimal",
        extra_aggs=[F.count(F.lit(1)).alias("n_events")],
    ).na.fill({t: 0.0 for t in EVENT_TYPES})
    return wide.select("user_id", *EVENT_TYPES, "n_events")


def _q_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Anti join (SURVEY.md §2.3: absent from the reference — part of a
    complete relational surface): customers with no orders since 1997.
    The date filter pushes to the parquet scan before the join."""
    c = read_table(spark, sf, "customer")
    o = read_table(spark, sf, "orders").where(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


def _q_top_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Top-K per group via row_number (deterministic tiebreak on key)."""
    o = read_table(spark, sf, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def _q_next_day_max(spark: SparkSession, sf: str) -> DataFrame:
    """Daily max + lead-as-label (reference A3+W1+J4 collapsed: the
    self-join at sensor_data_regression.py:46 is unnecessary — the lead
    window runs directly on the daily aggregate, partitioned by entity)."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.max("value").alias("day_max"))
    return lead_target(
        daily, order_col="day", target_col="day_max",
        partition_by=["user_id"], out_col="next_day_max",
    )


def _q_resample_30min(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 30-minute resample (reference T1, native)."""
    ev = read_table(spark, sf, "events")
    return resample(
        ev,
        ts_col="ts",
        width="30 minutes",
        keys=["event_type"],
        aggs=[
            _davg(F.col("value")).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        ],
    )


def _q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap)."""
    ev = read_table(spark, sf, "events")
    sess = sessionize(ev, ts_col="ts", partition_by=["user_id"], gap_seconds=1800)
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def _q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup via content hash (north-star; md5 matches DuckDB)."""
    docs = read_table(spark, sf, "documents")
    return docs.groupBy(F.md5("text").alias("fp")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_doc_id"),
    )


def _q_doc_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Text-quality features, all JVM-side expressions (north-star)."""
    docs = spread(read_table(spark, sf, "documents"))
    total_chars = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
    n = token_count("text")
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        (total_chars / n).alias("avg_token_len"),
        stopword_ratio("text").alias("stop_ratio"),
    )


def _q_case_projection(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar-expression surface: CASE WHEN / cast / string fn
    (reference P6/P7, sensor_data_etl.py:31-33)."""
    p = read_table(spark, sf, "part")
    band = (
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
    )
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand"),
        band.alias("size_band"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
    )


def _q_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Set operations (SURVEY.md §2.6: absent from reference; needed by
    the dedup pipeline): customers placing URGENT but never LOW-priority
    orders."""
    o = read_table(spark, sf, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    low = o.where(F.col("o_orderpriority") == "5-LOW").select("o_custkey").distinct()
    return urgent.exceptAll(low)


def _q_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP grouping sets (SURVEY.md §2.4 'not present' list)."""
    o = read_table(spark, sf, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
    )


def _nulled_events(spark: SparkSession, sf: str) -> DataFrame:
    """events with value masked NULL on error rows — the gap-bearing
    series used by the ffill/interpolate queries."""
    ev = read_table(spark, sf, "events")
    return ev.withColumn(
        "value", F.when(F.col("event_type") != "error", F.col("value"))
    )


def _q_ffill(spark: SparkSession, sf: str) -> DataFrame:
    """Forward-fill per series (reference T2, native)."""
    out = ffill(_nulled_events(spark, sf), ["value"], order_col="ts", partition_by=["user_id"])
    return out.select("event_id", "user_id", "ts", "value")


def _q_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Linear interpolation per series (reference T3, pure column
    algebra — no UDF)."""
    out = interpolate_linear(_nulled_events(spark, sf), "ts", "value", ["user_id"])
    return out.select("event_id", "user_id", "ts", "value")


def _q_quantile_clip(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group [q20, q80] trim (reference T4) with exact interpolated
    percentile (matches DuckDB quantile_cont bit-for-bit)."""
    ev = read_table(spark, sf, "events")
    return quantile_clip(ev, "value", ["event_type"], 0.2, 0.8).select(
        "event_id", "event_type", "value"
    )


def _q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """Event-time as-of join (SURVEY.md §2.3 north star): each event
    picks up the customer's most recent order total at that instant."""
    ev = read_table(spark, sf, "events")
    o = read_table(spark, sf, "orders")
    # unique right rows per (key, ts) for determinism
    daily_orders = o.groupBy(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
    ).agg(F.max("o_totalprice").alias("last_order_price"))
    out = asof_join(
        ev, daily_orders, on=["user_id"], left_ts="ts", right_ts="o_orderdate",
        value_cols=["last_order_price"],
    )
    return out.select("event_id", "user_id", "ts", "last_order_price")


def _rep_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-dedup representatives (lowest doc_id per distinct text).
    Every near-dup query starts here: at 100 TB the duplicate groups
    are huge (sf0.1 already has ~100 copies per text), and running the
    pair-generation over raw rows squares that factor — dedup-first
    cuts the candidate space by dup_factor² with zero recall loss
    (identical texts are near-dups by definition)."""
    docs = read_table(spark, sf, "documents")
    return exact_dedup(docs, "text", "doc_id")


def _q_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index join
    (never a cross join; operators/dedup.py), over exact-dedup reps.
    persist_index: the exact-dedup window upstream makes recompute
    expensive — materializing the (small) inverted index halves the
    steady-state cost (measured 2.2s → 1.2s at sf0.1)."""
    return jaccard_pairs(
        _rep_docs(spark, sf), "doc_id", "text", threshold=0.2, shingle_k=3,
        persist_index=True,
    )


def _q_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash + banded LSH near-dup pairs over exact-dedup reps
    (operators/dedup.py:minhash_pairs): md5-derived portable shingle
    ids + affine permutations mod 2^31-1 make every stage — signature,
    banding, candidate join, exact-Jaccard verify — reproducible in
    ANSI SQL, so this is oracle-gated (upgraded from the round-1
    rows-only pyspark.ml variant, which remains as
    minhash_lsh_pairs for the VectorUDT surface)."""
    return minhash_pairs(
        _rep_docs(spark, sf), "doc_id", "text",
        threshold=0.35, shingle_k=2, n_hashes=16, n_bands=8,
    )


def _q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash banded near-dup pairs over exact-dedup reps
    (operators/dedup.py:simhash_pairs_portable): per-bit majority votes
    over 48-bit md5-derived shingle ids — signature, banding, and the
    hamming verify all reproduce in ANSI SQL, so this is oracle-gated
    (upgraded from round 1's rows-only xxhash64 variant, which remains
    as simhash_pairs for 64-bit production signatures)."""
    from sensor_time_series_pyspark_spark.operators import simhash_pairs_portable

    return simhash_pairs_portable(
        _rep_docs(spark, sf), "doc_id", "text", max_hamming=6, shingle_k=2
    )


def _q_topk_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-5 per query vector (rank output only:
    DuckDB's list_cosine_similarity computes in float32, so scores
    aren't hash-comparable — ranks are stable, gaps ≫ float error)."""
    emb = read_table(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return topk_cosine(emb, queries, "vec_id", "vec_id", "embedding", k=5).select(
        "qid", "cid", "rank"
    )


def _q_embedding_norm_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding L2-norm stats — JVM-side higher-order
    functions over array<float> (functions/vectors.py)."""
    from sensor_time_series_pyspark_spark.functions.vectors import l2_norm

    emb = read_table(spark, sf, "embeddings")
    norms = emb.select("label", l2_norm("embedding").alias("norm"))
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        _davg(F.col("norm")).alias("avg_norm"),
    )


def _q_text_features(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID + quality scoring + BPE-ish token estimate — all
    JVM-side column algebra (functions/text.py), no Python worker in
    the 100 TB path. spread(): the tiny test file is one split — fan
    the expression work across cores (no-op decision at real scale)."""
    docs = spread(read_table(spark, sf, "documents"))
    return docs.select(
        "doc_id",
        lang_id("text").alias("lang_pred"),
        bpe_ish_token_count("text").cast("long").alias("n_bpe"),
        punct_ratio("text").alias("punct_ratio"),
        quality_score("text").alias("quality"),
    )


def _q_fingerprint_cardinality(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprint distinct-count: xxhash64 of normalized text
    equals text-level distinct modulo hash collisions (≈0 at these
    cardinalities) — the cheap dedup cardinality probe."""
    docs = spread(read_table(spark, sf, "documents"))
    return docs.agg(
        F.count_distinct(fingerprint64("text")).alias("n_unique"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def _q_distinct_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct aggregation (SURVEY.md §2.4 'not present' list)."""
    o = read_table(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def _q_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets over two dims (SURVEY.md §2.4)."""
    ev = read_table(spark, sf, "events")
    return ev.cube("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("value")).alias("total_value"),
    )


def _q_approx_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """GK/KLL-sketch quantiles, all columns in ONE job (fixes reference
    bug #4: per-column approxQuantile re-ran the upstream DAG each call,
    sensor_data_etl.py:95-98). Rows-only: sketch output is
    implementation-defined, not ANSI-SQL-reproducible. Output is
    flattened to one scalar row per column (the driver's comparator
    requires hashable — non-array — cells)."""
    from sensor_time_series_pyspark_spark.operators import approx_quantiles

    li = read_table(spark, sf, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    one_row = approx_quantiles(li, cols, [0.25, 0.5, 0.75])
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}_q")[0].alias("p25"),
            F.col(f"{c}_q")[1].alias("p50"),
            F.col(f"{c}_q")[2].alias("p75"),
        )
        for c in cols
    ]
    return one_row.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")


def _q_dedup_keep_first(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-lowest-id exact dedup (operators/dedup.py:exact_dedup) —
    one shuffle on the 64-bit content hash, deterministic survivor."""
    docs = read_table(spark, sf, "documents")
    return exact_dedup(docs, "text", "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


def _q_blob_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal metadata path (operators/multimodal.py): binary
    column + JVM-side size/format/md5 — no Python worker. Blobs are
    synthesized from text (container has no media files); the plumbing
    is identical for real image/audio bytes."""
    from sensor_time_series_pyspark_spark.operators import blob_metadata

    docs = read_table(spark, sf, "documents")
    blobs = docs.select("doc_id", F.encode("text", "utf-8").alias("blob"))
    out = blob_metadata(blobs, "blob")
    return out.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.format").alias("format"),
        F.col("meta.content_md5").alias("content_md5"),
    )


def _q_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-batched decode seam (operators/multimodal.py:
    decode_features) with the ``bytestats`` stub: a REAL mapInPandas
    Python-worker pass whose integer byte-statistics output is also
    computable in ANSI SQL — so the full Arrow round trip (schema,
    batching, float32 transport) is oracle-gated (upgraded from round
    1's rows-only sha256-RNG stub, which remains as decoder='fake').
    Features flattened to exact longs for the comparator."""
    from sensor_time_series_pyspark_spark.operators import decode_features

    docs = read_table(spark, sf, "documents")
    blobs = docs.select("doc_id", F.encode("text", "utf-8").alias("blob"))
    feats = decode_features(blobs, "blob", ["doc_id"], dim=8, decoder="bytestats")
    names = [
        "n_bytes", "byte_sum", "byte_min", "byte_max",
        "n_ws", "n_hi", "first_byte", "last_byte",
    ]
    return feats.select(
        "doc_id",
        *[F.col("features")[i].cast("long").alias(n) for i, n in enumerate(names)],
    )


def _q_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-duplicate pairs, exact cosine ≥ 0.45
    (operators/dedup.py:embedding_near_dup_pairs — the brute-force
    verifier; the scale path generates candidates with SRP-LSH first)."""
    from sensor_time_series_pyspark_spark.operators import embedding_near_dup_pairs

    emb = read_table(spark, sf, "embeddings").where(F.col("vec_id") < 1000)
    return embedding_near_dup_pairs(emb, "vec_id", "embedding", cosine_threshold=0.45)


def _q_srp_signature(spark: SparkSession, sf: str) -> DataFrame:
    """Signed-random-projection cosine-LSH signatures, engine-portable
    variant (operators/similarity.py:srp_signature_portable): ±1
    hyperplanes over integer-scaled components make every bit exact and
    SQL-reproducible, so this is oracle-gated (upgraded from round 1's
    rows-only float-plane variant, which remains as
    signed_random_projection for 64-bit production signatures). Bands
    of the signature feed the same candidate equi-join as SimHash."""
    from sensor_time_series_pyspark_spark.operators import srp_signature_portable

    emb = read_table(spark, sf, "embeddings")
    out = srp_signature_portable(emb, "embedding", dim=64, n_bits=16, seed=42)
    return out.select("vec_id", "srp_sig")


def _q_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join (SURVEY.md §2.3 'not present' list): customers
    with at least one URGENT order, no row duplication."""
    c = read_table(spark, sf, "customer")
    o = read_table(spark, sf, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


def _q_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """Full outer join: per-user daily click volume vs purchase volume
    (either side may be absent)."""
    ev = read_table(spark, sf, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    buys = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return clicks.join(buys, ["user_id", "day"], "full_outer").select(
        "user_id", "day", "n_clicks", "n_purchases"
    )


def _q_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bucketed range join (operators/interval.py): clicks within ±1
    hour of each error event by the same user — an equi-join on time
    buckets instead of a nested-loop inequality join."""
    from sensor_time_series_pyspark_spark.operators import interval_join

    ev = read_table(spark, sf, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"),
    )
    out = interval_join(
        errors, clicks, on=["user_id"], left_ts="ts", right_ts="click_ts",
        lower_seconds=-3600, upper_seconds=3600,
    )
    return out.select("error_id", "user_id", "click_id")


def _daily_series(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user daily mean value — the bounded per-series frame every
    forecasting query starts from (resample NATIVELY before any
    applyInPandas so Python groups stay small; ml/forecast.py)."""
    ev = read_table(spark, sf, "events")
    return ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        _davg(F.col("value")).alias("value")
    )


def _q_holt_forecast(spark: SparkSession, sf: str) -> DataFrame:
    """7-step Holt forecast per user (reference T5/T7 done per-series).
    Oracle-gated: the smoothing recursion is replicated bit-for-bit by
    a recursive CTE (models.py uses sequential folds precisely so a
    SQL engine can reproduce it); invariants in tests/test_forecast.py."""
    daily = _daily_series(spark, sf)
    return fit_forecast(
        daily, series_keys=["user_id"], ts_col="day", value_col="value",
        horizon=7, model="holt",
    )


def _q_holt_winters(spark: SparkSession, sf: str) -> DataFrame:
    """7-step Holt-Winters additive (weekly seasonal) forecast per
    event type on the daily count series — the triple-smoothing
    extension of q24 (level + trend + period-7 seasonal states; ml/
    models.py:holt_winters). Oracle-gated: the triple-smoothing
    recursion (including the seasonal-slot splice and the sequential
    two-pass sigma) is replicated bit-for-bit by a recursive CTE;
    invariants in tests/test_forecast.py."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("value"))
    return fit_forecast(
        daily,
        series_keys=["event_type"],
        ts_col="day",
        value_col="value",
        horizon=7,
        model="holt_winters",
        min_points=14,
    )


def _q_arima_grid(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed (p,d,q) grid search (reference T6: the nested loop at
    pandas_timeseries_forecast.py:22-55 re-shaped as a parameter
    DataFrame → per-combo Arrow groups → min_by)."""
    daily = _daily_series(spark, sf)
    grid = [
        {"p": 1, "d": 0, "q": 0},
        {"p": 1, "d": 1, "q": 0},
        {"p": 2, "d": 0, "q": 0},
        {"p": 0, "d": 1, "q": 1},
    ]
    return grid_search_forecast(
        daily, series_keys=["user_id"], ts_col="day", value_col="value",
        grid=grid, model="arima",
    )


def _q_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly additive decomposition per user (reference T8)."""
    daily = _daily_series(spark, sf)
    return decompose(
        daily, series_keys=["user_id"], ts_col="day", value_col="value", period=7
    )


def _q_mlp_classification(spark: SparkSession, sf: str) -> DataFrame:
    """MLP event-profile → nation classifier (reference 3a re-shaped:
    4 gas readings → label becomes 5 event-type averages → n_name).
    Temporal split, seeded; returns per-class prediction counts."""
    wide = sensor_etl(spark, sf)
    train, test = temporal_split(wide, "bucket", "2024-01-25", cache=True)
    n_classes = 25
    pipe = classification_pipeline(
        EVENT_TYPES, "n_name", hidden=20, n_classes=n_classes, seed=42, max_iter=20
    )
    model = pipe.fit(train)
    preds = decode_predictions(model, model.transform(test))
    return preds.groupBy("predicted_label").agg(F.count(F.lit(1)).alias("n"))


def _q_gbt_regression(spark: SparkSession, sf: str) -> DataFrame:
    """GBT next-day-max regression (reference 3b: daily max + epoch
    features → lead-1 label, sensor_data_regression.py). Seeded."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max("value").alias("day_max")
    )
    labeled = lead_target(
        daily, order_col="day", target_col="day_max",
        partition_by=["user_id"], out_col="next_day_max",
    ).withColumn("epoch_day", F.unix_date("day").cast("double"))
    train, test = temporal_split(labeled, "day", "2024-01-25", cache=True)
    pipe = regression_pipeline(
        ["day_max", "epoch_day", "user_id"], "next_day_max", seed=42, max_iter=10
    )
    model = pipe.fit(train)
    return model.transform(test).select("user_id", "day", "next_day_max", "prediction")


def _q_sql_interface(spark: SparkSession, sf: str) -> DataFrame:
    """Full SQL surface (spark.sql over registered views) — TPC-H Q5
    shape: revenue by nation for one region/year, local-supplier
    constraint (c_nationkey = s_nationkey). Same Catalyst plan as the
    DataFrame API; proves the engine's SQL entry point."""
    for t in ["customer", "orders", "lineitem", "supplier", "nation", "region"]:
        read_table(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql("""
        SELECT n_name,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
            AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """)


def _q_char_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Character-5-gram Jaccard near-dups (tokenization-free variant,
    operators/dedup.py:jaccard_pairs unit='char')."""
    return jaccard_pairs(
        _rep_docs(spark, sf), "doc_id", "text",
        threshold=0.35, shingle_k=5, unit="char", persist_index=True,
    )


def _q_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-partitioned approximate top-k (rows-only: KMeans cell
    assignment isn't SQL-expressible; recall vs exact is pinned in
    tests/test_similarity.py)."""
    from sensor_time_series_pyspark_spark.operators import ivf_topk_cosine

    emb = read_table(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return ivf_topk_cosine(
        emb, queries, "vec_id", "vec_id", "embedding", k=5, n_cells=8, n_probe=3
    ).select("qid", "cid", "rank")


def _event_rules() -> dict[str, F.Column]:
    return {
        "value_in_range": (F.col("value") >= 0) & (F.col("value") <= 100),
        "ts_not_null": F.col("ts").isNotNull(),
        "known_event_type": F.col("event_type").isin(EVENT_TYPES),
    }


def _q_validation_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Single-pass data-quality audit (operators/validate.py): n_rows +
    per-rule violation counters in one aggregate."""
    ev = read_table(spark, sf, "events")
    from sensor_time_series_pyspark_spark.operators import violation_counts

    return violation_counts(ev, _event_rules())


def _q_quarantine(spark: SparkSession, sf: str) -> DataFrame:
    """Constraint routing: bad rows with the array of failed rule
    names, exploded to (event_id, rule) pairs for the oracle."""
    ev = read_table(spark, sf, "events")
    from sensor_time_series_pyspark_spark.operators import quarantine

    good, bad = quarantine(ev, _event_rules())
    return bad.select("event_id", F.explode("failed_rules").alias("rule"))


def _q_rolling_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing 1-hour mean per user over a rangeBetween frame keyed on
    epoch seconds (operators/windows.py:rolling_avg — handles irregular
    sampling, unlike row frames)."""
    from sensor_time_series_pyspark_spark.operators import rolling_avg

    ev = read_table(spark, sf, "events")
    out = rolling_avg(
        ev, ts_col="ts", value_col="value",
        partition_by=["user_id"], window_seconds=3600, exact=True,
    )
    return out.select("event_id", "user_id", "ts", "rolling_avg")


def _q_ewma_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Per-series EWMA + z-score (streaming/stateful.py batch twin;
    stream==batch equivalence is pinned in tests). Oracle-gated: the
    sequential fold is replicated in a DuckDB recursive CTE with the
    identical IEEE op order (math.sqrt both sides), so even this
    stateful operator hash-matches bit-for-bit."""
    from sensor_time_series_pyspark_spark.streaming import ewma_anomaly_batch

    ev = read_table(spark, sf, "events")
    out = ewma_anomaly_batch(ev, "user_id", "ts", "value", alpha=0.2)
    return out.where(F.abs(F.col("zscore")) > 2).select(
        "user_id", "ts", "value", "zscore"
    )


def _q_correlated_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery: lineitems whose
    quantity is below 20% of their part's average. Catalyst de-correlates
    to an aggregate + join; no per-row subquery execution."""
    li = read_table(spark, sf, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        (_davg(F.col("l_quantity")) * 0.2).alias("qty_threshold")
    )
    return (
        li.join(per_part, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_small_orders"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("small_revenue"),
        )
    )


def _q_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Wide→long melt (inverse of the pivot data model; narrow op, no
    shuffle beyond the upstream pivot's)."""
    from sensor_time_series_pyspark_spark.operators.pivot import unpivot

    wide = _q_event_type_pivot(spark, sf)
    long = unpivot(
        wide, ["user_id"], EVENT_TYPES, name_col="event_type", value_col="avg_value"
    )
    return long.where(F.col("avg_value") > 0)


def _q_model_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Evaluator + feature-importance surface (reference M8/M9,
    sensor_data_regression.py:80-88) as a one-row metrics frame.
    Rows-only: model internals aren't SQL-expressible."""
    from sensor_time_series_pyspark_spark.ml import (
        evaluate_regression,
        feature_importances,
    )

    ev = read_table(spark, sf, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max("value").alias("day_max")
    )
    labeled = lead_target(
        daily, order_col="day", target_col="day_max",
        partition_by=["user_id"], out_col="next_day_max",
    ).withColumn("epoch_day", F.unix_date("day").cast("double"))
    train, test = temporal_split(labeled, "day", "2024-01-25", cache=True)
    pipe = regression_pipeline(
        ["day_max", "epoch_day", "user_id"], "next_day_max", seed=42, max_iter=10
    )
    model = pipe.fit(train)
    preds = model.transform(test)
    rmse = evaluate_regression(preds, "next_day_max", "rmse")
    r2 = evaluate_regression(preds, "next_day_max", "r2")
    imps = feature_importances(model)
    return spark.createDataFrame(
        [(float(rmse), float(r2), *[float(i) for i in imps])],
        "rmse double, r2 double, imp_day_max double, imp_epoch_day double, imp_user_id double",
    )


def _q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup cluster assignment: jaccard pairs → connected components
    (operators/dedup.py:connected_components, iterative min-label
    propagation; cluster id = lowest doc id in the component, so it is
    also the canonical keeper). Oracle: recursive CTE computing min
    reachable id over the same pair list."""
    pairs = jaccard_pairs(
        _rep_docs(spark, sf), "doc_id", "text", threshold=0.2, shingle_k=3,
        persist_index=True,
    )
    return dedup_clusters(pairs)


def _q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond q12 ROLLUP / q34 CUBE): the
    (priority, status) + (priority) + () lattice via the Spark 4
    DataFrame API — one pass, no self-union."""
    o = read_table(spark, sf, "orders")
    return o.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
    )


def _q_window_rank_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking-window surface in one query: ntile / dense_rank /
    percent_rank / cume_dist per order-priority partition. ntile is
    row-order dependent, so its ORDER BY carries the unique key;
    the rank family is tie-stable and orders by price alone.

    Scale note: o_orderpriority has 5 distinct values, so each window
    partition is ~20% of the table in ONE task — exact global ranks
    within low-cardinality groups are inherently serial per group. At
    100 TB, either rank within a finer key, or use
    operators/quantiles.py:approx_ntile (percentile_approx cutpoints →
    broadcast bucket join), which restores full parallelism at bounded
    error."""
    o = read_table(spark, sf, "orders")
    w_det = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    w_ties = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w_det).alias("quartile"),
        F.dense_rank().over(w_ties).alias("drank"),
        F.percent_rank().over(w_ties).alias("prank"),
        F.cume_dist().over(w_ties).alias("cdist"),
    )


def _q_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """TF-IDF-style top-3 terms per document via explode → tf counts →
    document-frequency join → per-doc ranking. Scoring is the integer
    ``tf * 1_000_000 DIV df`` instead of float log-idf: both engines do
    exact integer arithmetic (libm log bits are not guaranteed to match
    across engines), and the score is monotone in tf/df so the ranking
    semantics are the same."""
    reps = _rep_docs(spark, sf)
    term_tf = (
        reps.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    term_df = term_tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = term_tf.join(term_df, "term").withColumn(
        "score", F.expr("tf * 1000000 DIV df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


def _q_missing_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Per-series gap detection (operators/gaps.py): 30-min buckets in
    the series span with no observation — sequence+explode expected
    grid, left-anti join observed. The monitoring complement of
    q11_resample_30min."""
    ev = read_table(spark, sf, "events")
    return missing_buckets(ev, "ts", ["event_type"], width_seconds=1800)


def _q_exact_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact percentile aggregation (complement of q35's sketch): median
    and p90 of integral-valued l_quantity per return flag. Both engines
    interpolate a + (b-a)*frac over the same sorted doubles, so values
    hash-match (quantity is integer-valued — order stats are exact)."""
    li = read_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def _q_scd2(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 dimension build (operators/scd.py): the event feed becomes
    a versioned per-user state dimension — consecutive identical states
    collapse, [valid_from, valid_to) intervals + is_current flag, one
    shuffle. The reference overwrites its dims losing history
    (read_sensor_configs.py:53,66)."""
    from sensor_time_series_pyspark_spark.operators import scd2

    ev = read_table(spark, sf, "events")
    return scd2(ev, ["user_id"], "ts", ["event_type"])


def _q_pca_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """PCA feature reduction over the embedding column (SURVEY.md §2.10
    M10 — the reference imports PCA but never runs it,
    sensor_data_regression.py:5,64; here it is a working operator).
    Output: per-label count and exact decimal-mean of the FIRST
    principal component's squared loading-projection (squares kill the
    eigenvector sign indeterminacy, so the values are stable). Rows-only
    gate + invariant tests: k components, orthonormality."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = read_table(spark, sf, "embeddings")
    vecs = emb.select(
        "vec_id", "label", array_to_vector(F.col("embedding")).alias("features")
    )
    pca = PCA(k=8, inputCol="features", outputCol="pc")
    model = pca.fit(vecs)
    out = model.transform(vecs).select(
        "label", vector_to_array("pc").alias("pc")
    )
    pc1_sq = F.col("pc")[0] * F.col("pc")[0]
    return out.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        _davg(pc1_sq).alias("mean_pc1_sq"),
    )


def _q_quantize_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Int8 embedding quantization (functions/vectors.py:quantize_int8,
    4x storage cut for the widest column at 100 TB). Output is
    integer-exact per vector (code sum / min / max) plus the scale —
    floor-based half-up rounding makes both engines produce identical
    codes."""
    from sensor_time_series_pyspark_spark.functions.vectors import quantize_int8

    emb = read_table(spark, sf, "embeddings")
    qz = emb.select("vec_id", quantize_int8("embedding").alias("qs"))
    q = F.col("qs")["q"]
    return qz.select(
        "vec_id",
        F.col("qs")["scale"].alias("scale"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ).alias("code_sum"),
        F.array_min(q).cast("int").alias("code_min"),
        F.array_max(q).cast("int").alias("code_max"),
    )


def _q_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py) over the 5-value
    event_type key — the skew-mitigation shape: partials on
    (key, salt) split every hot group across reducers, then merge on
    the key alone. Result is identical to the direct groupBy (salting
    is algebra-invariant for re-aggregatable kinds), so it hash-matches
    the plain-SQL oracle."""
    from sensor_time_series_pyspark_spark.operators import salted_agg

    ev = read_table(spark, sf, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", F.lit(1)),
            "total_value": ("sum", F.col("value").cast(DEC)),
            "max_value": ("max", F.col("value")),
        },
        salt=8,
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
        "max_value",
    )


def _q_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per group (rows-only gate:
    sketch estimates are engine-specific; tests/test_operators.py pins
    the estimate within 5% of exact)."""
    ev = read_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def _q_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic content-hash train/val/test assignment
    (operators/sampling.py): md5-bucket thresholds make the split
    stable across runs, engines, and partitionings, and key-consistent
    (every event of a user lands in the same split — no leakage).
    The portable alternative to randomSplit's partition-dependent RNG."""
    from sensor_time_series_pyspark_spark.operators import hash_split

    ev = read_table(spark, sf, "events")
    out = hash_split(
        ev, "user_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="v1"
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


def _q_rate_of_change(spark: SparkSession, sf: str) -> DataFrame:
    """Per-series discrete derivative (operators/windows.py:
    rate_of_change) — the drift/ramp-alarm primitive over the sensor
    stream; NULL-safe on series heads and duplicate timestamps."""
    from sensor_time_series_pyspark_spark.operators import rate_of_change

    ev = read_table(spark, sf, "events")
    out = rate_of_change(ev, "ts", "value", ["user_id"])
    return out.select("event_id", "user_id", "ts", "rate")


def _q_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust per-group outliers via median absolute deviation
    (operators/quantiles.py:mad_outliers, Hampel's rule — 50% breakdown
    point, immune to the masking that breaks mean/stddev z-scores)."""
    from sensor_time_series_pyspark_spark.operators import mad_outliers

    ev = read_table(spark, sf, "events")
    out = mad_outliers(ev, "value", ["event_type"], n_mads=5.0)
    return out.select("event_id", "event_type", "value", "med", "mad")


def _q_bm25_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document top-3 terms under BM25 weighting
    (operators/ranking.py:bm25_rank): rational-idf variant keeps every
    score a pure function of integers — engine-portable, no libm."""
    from sensor_time_series_pyspark_spark.operators import bm25_rank

    return bm25_rank(_rep_docs(spark, sf), "doc_id", "text", top_n=3)


def _q_pack_offsets(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/ranking.py:
    pack_offsets): per-language document streams cut into 2048-token
    training chunks; offsets/chunk ids are exact integer window
    algebra. The layout step between dedup/quality-filter and an LLM
    training run."""
    from sensor_time_series_pyspark_spark.operators import pack_offsets

    docs = read_table(spark, sf, "documents")
    return pack_offsets(
        docs, "doc_id", token_count("text"), budget=2048,
        partition_by=["lang"],
    )


def _q_ohlc_bars(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly OHLC bars per user (operators/resample.py:ohlc): the
    whole bar — open/close via min_by/max_by on ts, high/low, count —
    is ONE hash aggregate, no window sort. (user_id, ts) is unique in
    events, so the bars are deterministic."""
    from sensor_time_series_pyspark_spark.operators import ohlc

    ev = read_table(spark, sf, "events")
    return ohlc(ev, "ts", "value", "1 hour", keys=["user_id"])


def _q_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """LOCF time-weighted hourly mean per user (operators/resample.py:
    time_weighted_avg) — the honest average for irregular sampling;
    integer-second weights + decimal weighted sums keep it
    engine-portable."""
    from sensor_time_series_pyspark_spark.operators import time_weighted_avg

    ev = read_table(spark, sf, "events")
    return time_weighted_avg(ev, "ts", "value", 3600, keys=["user_id"])


def _q_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel view→click→purchase within 24h of the first view
    (operators/analytics.py:funnel — earliest-completion semantics, one
    conditional aggregate per step, no raw-stream window)."""
    from sensor_time_series_pyspark_spark.operators import funnel

    ev = read_table(spark, sf, "events")
    return funnel(
        ev, "user_id", "ts",
        steps=[
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
        within_seconds=86400,
    )


def _q_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """First-active-day cohorts with day-1/day-3/day-7 retention
    (operators/analytics.py:cohort_retention — two aggregates + one
    join, exact date arithmetic)."""
    from sensor_time_series_pyspark_spark.operators import cohort_retention

    ev = read_table(spark, sf, "events")
    return cohort_retention(ev, "user_id", "ts", offsets=[1, 3, 7])


def _q_levenshtein_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Edit-distance near-dup pairs over the distinct part-type
    vocabulary (operators/dedup.py:levenshtein_pairs — banded length
    join + threshold-bounded DP; the dedup tier for SHORT strings
    where shingle Jaccard is meaningless)."""
    from sensor_time_series_pyspark_spark.operators import levenshtein_pairs

    p = read_table(spark, sf, "part")
    types = p.select(F.col("p_type").alias("name")).distinct()
    return levenshtein_pairs(types, "name", "name", max_dist=6)


def _q_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured payload path: a JSON string column parsed with
    from_json + explicit schema (the Spark-idiomatic JSON surface; the
    payload is synthesized with exact integer/string pieces so both
    engines build byte-identical JSON before parsing)."""
    ev = read_table(spark, sf, "events")
    js = F.concat(
        F.lit('{"t":"'), F.col("event_type"),
        F.lit('","v":'), F.floor("value").cast("long").cast("string"),
        F.lit(',"u":'), F.col("user_id").cast("string"),
        F.lit("}"),
    )
    parsed = F.from_json(js, "t string, v long, u long")
    return (
        ev.select("event_id", parsed.alias("p"))
        .select(
            "event_id",
            F.col("p.t").alias("jtype"),
            F.col("p.v").alias("jval"),
            F.col("p.u").alias("juser"),
        )
        .where(F.col("jval") >= 50)
    )


def _q_exact_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson correlation from exact decimal moments
    (operators/profile.py:exact_corr) — the portable twin of F.corr:
    five order-independent decimal sums in ONE aggregate, then a fixed
    IEEE double epilogue, so the value hash-matches across engines."""
    from sensor_time_series_pyspark_spark.operators import exact_corr

    li = read_table(spark, sf, "lineitem")
    return exact_corr(li, "l_quantity", "l_extendedprice", by=["l_returnflag"])


def _q_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-width value histogram with data-driven bounds
    (operators/profile.py:histogram): two full-parallel scans, one
    one-row-per-group bounds broadcast — no approxQuantile recompute
    storm (reference bug #4)."""
    from sensor_time_series_pyspark_spark.operators import histogram

    ev = read_table(spark, sf, "events")
    return histogram(ev, "value", n_bins=10, by=["event_type"])


def _q_chunk_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping token-window chunking (operators/chunking.py) — the
    training-sequence / RAG-passage constructor. 32-token chunks every
    16 tokens; pure column algebra, zero shuffle."""
    from sensor_time_series_pyspark_spark.operators import chunk_tokens

    docs = read_table(spark, sf, "documents")
    return chunk_tokens(docs, "doc_id", "text", chunk_size=32, stride=16)


def _q_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Train/eval n-gram contamination (operators/contamination.py):
    every 5th document plays the eval set, the rest the training
    corpus; 3-gram overlap with portable md5 gram ids."""
    from sensor_time_series_pyspark_spark.operators import ngram_overlap

    docs = read_table(spark, sf, "documents")
    train = docs.where(F.col("doc_id") % 5 != 0)
    test = docs.where(F.col("doc_id") % 5 == 0)
    return ngram_overlap(train, test, "doc_id", "text", n=3, portable=True)


def _q_redact_pii(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction (functions/text.py:redact_pii) over synthesized
    contact lines — email/SSN/IP/phone built deterministically from
    customer columns so both engines scrub byte-identical input with
    the same RE2-compatible patterns."""
    from sensor_time_series_pyspark_spark.functions.text import redact_pii

    c = read_table(spark, sf, "customer")
    k = F.col("c_custkey")
    raw = F.concat(
        F.lit("reach "), F.col("c_name"),
        F.lit(" at user"), k.cast("string"), F.lit("@example.com"),
        F.lit(" or +1-555-"),
        F.lpad((k % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit(" ssn "),
        F.lpad((k % 900 + 100).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((k % 90 + 10).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((k % 9000 + 1000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."), (k % 256).cast("string"), F.lit(".1 tel "),
        (k % 9 + 1).cast("string"),
        F.lit("."),
        F.lpad((k % 1000).cast("string"), 3, "0"),
        F.lit("."),
        F.lpad((k * 3 % 1000).cast("string"), 3, "0"),
        F.lit("."),
        F.lpad((k % 10000).cast("string"), 4, "0"),
    )
    return c.select(
        "c_custkey",
        redact_pii(raw).alias("redacted"),
    )


def _q_repetition_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document bigram repetition (functions/text.py:
    repetition_stats) — the MassiveText-style repeated-phrase quality
    signal. Integer counts, one double division for the ratio."""
    from sensor_time_series_pyspark_spark.functions.text import repetition_stats

    docs = read_table(spark, sf, "documents")
    st = repetition_stats("text", n=2)
    return docs.select(
        "doc_id",
        st.getField("n_grams").alias("n_grams"),
        st.getField("n_distinct").alias("n_distinct"),
    ).select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.when(
            F.col("n_grams") > 0,
            F.lit(1.0)
            - F.col("n_distinct").cast("double") / F.col("n_grams").cast("double"),
        ).alias("rep_ratio"),
    )


def _q_tvd_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution drift per event type (operators/drift.py:
    tvd_drift): first half of the month is the reference snapshot,
    second half the current window; integer-exact total-variation
    distance over 10 reference-fit bins."""
    from sensor_time_series_pyspark_spark.operators import tvd_drift

    ev = read_table(spark, sf, "events")
    return tvd_drift(
        ev,
        "value",
        is_reference=F.col("ts") < F.lit("2024-01-16").cast("timestamp"),
        by=["event_type"],
        n_bins=10,
    )


def _q_acf(spark: SparkSession, sf: str) -> DataFrame:
    """Per-series autocorrelation, lags 1-5 (operators/drift.py:acf) —
    one window pass for all lags, exact-moment corr epilogue.
    (ts, event_type) is unique in events, so the lag ordering is
    deterministic without a tiebreaker."""
    from sensor_time_series_pyspark_spark.operators import acf

    ev = read_table(spark, sf, "events")
    return acf(ev, ["event_type"], "ts", "value", max_lag=5)


def _q_cusum(spark: SparkSession, sf: str) -> DataFrame:
    """Standardized CUSUM level-shift scan per event type
    (operators/drift.py:cusum) — exact decimal prefix sums, the whole
    trajectory bit-reproducible across engines."""
    from sensor_time_series_pyspark_spark.operators import cusum

    ev = read_table(spark, sf, "events")
    return cusum(ev, ["event_type"], "ts", "value", threshold=3.0)


def _q_hopping_window(spark: SparkSession, sf: str) -> DataFrame:
    """Hopping-window aggregate (operators/resample.py:
    hopping_resample): 2-hour windows sliding every 30 minutes —
    map-side Expand then partial aggregation, shuffle carries partials
    not replicated rows."""
    from sensor_time_series_pyspark_spark.operators import hopping_resample

    ev = read_table(spark, sf, "events")
    return hopping_resample(
        ev,
        ts_col="ts",
        width="2 hours",
        slide="30 minutes",
        keys=["event_type"],
        aggs=[
            _davg(F.col("value")).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        ],
    )


def _q_top_categories(spark: SparkSession, sf: str) -> DataFrame:
    """Per-brand heavy hitters of p_type (operators/profile.py:
    top_categories): one hash aggregate + a window over the aggregated
    frame; exact shares from two longs."""
    from sensor_time_series_pyspark_spark.operators import top_categories

    p = read_table(spark, sf, "part")
    return top_categories(p, "p_type", by=["p_brand"], k=3)


def _q_category_gini(spark: SparkSession, sf: str) -> DataFrame:
    """Language concentration per document source (operators/
    profile.py:category_concentration) — Herfindahl/Gini from exact
    integer count moments, one double division."""
    from sensor_time_series_pyspark_spark.operators import category_concentration

    docs = read_table(spark, sf, "documents")
    return category_concentration(docs, "lang", by=["source"])


def _q_rolling_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 7-sample trailing median per series (operators/windows.py:
    rolling_median) — the robust denoiser; percentile interpolation is
    IEEE-identical to DuckDB quantile_cont."""
    from sensor_time_series_pyspark_spark.operators import rolling_median

    ev = read_table(spark, sf, "events")
    return rolling_median(
        ev, "ts", "value", partition_by=["event_type"], n_rows=7
    ).select("event_id", "event_type", "ts", "value", "rolling_median")


def _q_merge_intervals(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands interval merge (operators/islands.py): each
    event opens a 30-minute activity window per user; overlapping
    windows collapse to disjoint activity episodes. One shuffle on the
    user key (window labeling + island agg share the partitioning)."""
    from sensor_time_series_pyspark_spark.operators import merge_intervals

    ev = read_table(spark, sf, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    return merge_intervals(iv, ["user_id"], "s", "e")


def _q_order_streaks(spark: SparkSession, sf: str) -> DataFrame:
    """Consecutive-calendar-day runs per customer (operators/
    islands.py:streaks, the date - row_number anchor trick): distinct
    order days per customer, maximal runs ≥ 2 days."""
    from sensor_time_series_pyspark_spark.operators import streaks

    o = read_table(spark, sf, "orders")
    return streaks(o, ["o_custkey"], "o_orderdate", min_length=2)


def _q_asof_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join with a match tolerance (operators/asof.py): each
    event picks up the latest purchase by the same user within the
    trailing 2 hours; older matches null out (pandas merge_asof
    tolerance semantics). Purchases at identical (user, ts) pre-
    aggregate to max(value) so the carried value is deterministic."""
    ev = read_table(spark, sf, "events")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_purchase_value"))
    )
    return asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        ["user_id"],
        "ts",
        "ts",
        ["last_purchase_value"],
        tolerance_seconds=7200,
        matched_ts_col="last_purchase_ts",
    )


def _q_pareto_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Pareto / cumulative-share analysis: customers ranked by revenue,
    running share of total, top-80% flag. The window runs over the
    AGGREGATED frame (one row per customer) — the global-order sort is
    a deliberate presentation-scale step, never applied to raw facts
    (SURVEY.md §2.6 ref bug #10). Sums are exact decimals; the share is
    one double division, identical in any engine."""
    o = read_table(spark, sf, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("__rev")
    )
    w = (
        Window.orderBy(F.col("__rev").desc(), F.col("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy()
    return (
        rev.withColumn("__cum", F.sum("__rev").over(w))
        .withColumn("__tot", F.sum("__rev").over(tot))
        .select(
            "o_custkey",
            F.col("__rev").cast("double").alias("revenue"),
            (F.col("__cum").cast("double") / F.col("__tot").cast("double")).alias(
                "cum_share"
            ),
            (
                F.col("__cum").cast("double") / F.col("__tot").cast("double")
                <= 0.8
            ).alias("is_top80"),
        )
    )


def _q_m4_downsample(spark: SparkSession, sf: str) -> DataFrame:
    """M4 visualization downsample (operators/viz.py, Jugel et al. VLDB
    2014): per (event_type, day) keep min/max/first/last — the exact
    pixel-rendering reduction, one hash aggregate, selection made
    deterministic by a (unix_micros ‖ event_id) order key."""
    from sensor_time_series_pyspark_spark.operators import m4_downsample

    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    return m4_downsample(
        ev, ["event_type"], "ts", "value", "event_id", bucket="1 day"
    )


def _q_deadband(spark: SparkSession, sf: str) -> DataFrame:
    """Deadband (exception) compression per series (operators/
    compress.py): keep first + every >ε excursion from the last KEPT
    value — the PI-historian storage rule. Inherently sequential per
    series → applyInPandas per user; oracle is a recursive CTE
    replaying the same fold."""
    from sensor_time_series_pyspark_spark.operators import deadband_compress

    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    return deadband_compress(ev, "user_id", "ts", "value", epsilon=25.0)


def _q_rolling_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling Pearson correlation of value vs time (trend strength)
    over the trailing 10 events per user — exact integer moments
    (operators/windows.py:rolling_corr), so the low bits match any
    engine. Seconds are exact integers via unix_micros div 10^6."""
    from sensor_time_series_pyspark_spark.operators import rolling_corr

    ev = (
        read_table(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .withColumn(
            "secs",
            # integer div, not /1e6: double quotients can truncate off
            # by one at second boundaries vs an exact-integer engine
            F.expr("unix_micros(ts) div 1000000")
            - F.lit(1704067200),  # epoch('2024-01-01'): keeps moments small
        )
    )
    out = rolling_corr(
        ev, ["user_id"], ["ts", "event_id"], "value", "secs",
        n_rows=10, x_decimals=2, y_decimals=0,
    )
    return out.select("event_id", "user_id", "ts", "r_corr")


def _q_bloom_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-pruned semi join (operators/bloomjoin.py): urgent orders
    build a 65536-bit bitmap; lineitem is pruned MAP-SIDE before the
    exact semi join — the explicit form of Spark's runtime bloom
    filtering, ~80% shuffle reduction here, far more on selective
    joins at 100 TB. Result is exact (join removes false positives)."""
    from sensor_time_series_pyspark_spark.operators import bloom_semi_join

    li = read_table(spark, sf, "lineitem")
    urgent = read_table(spark, sf, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    hits = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return hits.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        _dsum(F.col("l_extendedprice")).alias("revenue"),
    )


def _q_hll_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable distinct-count rollup (operators/sketches.py): one HLL
    sketch per (event_type, day) partial, merged to per-type totals
    WITHOUT rescanning the fact table — the continuous-aggregate
    pattern for COUNT(DISTINCT) at 100 TB. Rows-only: sketch estimates
    are DataSketches-specific; a test pins ≤5% error vs exact."""
    from sensor_time_series_pyspark_spark.operators import hll_partials, hll_rollup

    ev = read_table(spark, sf, "events").withColumn("day", F.to_date("ts"))
    partials = hll_partials(ev, ["event_type", "day"], "user_id")
    return hll_rollup(partials, ["event_type"])


def _q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Per-stratum deterministic sampling (operators/sampling.py:
    stratified_hash_sample): rebalance the language mix — downsample
    dominant en, keep all de, thin the rest — with md5-threshold
    decisions that are stable across runs, engines, partitionings."""
    from sensor_time_series_pyspark_spark.operators import stratified_hash_sample

    docs = read_table(spark, sf, "documents")
    return stratified_hash_sample(
        docs,
        "doc_id",
        "lang",
        {"en": 0.5, "de": 1.0, "fr": 0.25},
        default_fraction=0.1,
    ).select("doc_id", "lang", "source")


def _q_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank (operators/graph.py) over the supplier↔part supply
    graph (bipartite, both directions; node ids disambiguated by
    parity). Iterative: one join+agg per round, lineage cut by
    localCheckpoint. Rows-only: float mass diffusion has no SQL twin;
    tests pin mass conservation + symmetry."""
    from sensor_time_series_pyspark_spark.operators import pagerank

    li = read_table(spark, sf, "lineitem")
    sp = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = sp.unionByName(
        sp.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, n_iter=6, checkpoint_every=3)
    return ranks.where(F.col("node") % 2 == 0).select(
        (F.col("node") / 2).cast("long").alias("suppkey"), "rank"
    )


def _q_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact weighted median (operators/quantiles.py:weighted_median):
    quantity-weighted median unit price per return flag. Cumulative
    weights stay decimal; the half-total test is 2*cum >= total with
    no division — bit-portable across engines."""
    from sensor_time_series_pyspark_spark.operators import weighted_median

    li = read_table(spark, sf, "lineitem")
    return weighted_median(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        "l_quantity",
        tiebreak_cols=["l_orderkey", "l_linenumber"],
    )


def _q_late_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: orders with at least one
    lineitem shipped after the order date, counted per priority. The
    EXISTS is a left-semi join with a non-equi residual — Spark keeps
    the equi key (orderkey) for the hash join and applies the date
    comparison as a join residual, so no fallback to nested-loop."""
    o = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def _q_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Exact triangle count (operators/graph.py:triangle_count,
    degree-oriented compact-forward — two hash joins, hub fan-out
    bounded O(sqrt m)) over the co-supplier graph: suppliers sharing a
    part. The oracle counts the same triangles with id orientation —
    the count is orientation-invariant, so both paths must agree."""
    from sensor_time_series_pyspark_spark.operators import triangle_count

    # strongest-partner graph: every co-occurrence graph over this
    # synthetic data densifies toward complete as SF grows (few cells,
    # many entities), so the graph is SPARSIFIED BY CONSTRUCTION —
    # each user keeps edges to its top-3 co-activity partners (ranked
    # by shared (event_type, 30-min bucket) cells, deterministic id
    # tiebreak). Degree <= 6 after symmetrization → wedge count is
    # O(users), at every scale factor. Triangles then measure mutual-
    # affinity cliques, the standard social-graph cohesion signal.
    return triangle_count(_partner_graph(spark, sf), orient="degree")


def _partner_graph(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 strongest-partner user graph (shared by q100/q139):
    co-activity counts over (event_type, 30-min bucket) cells, each
    user keeping its 3 highest-count partners (deterministic id
    tiebreak). Degree <= 6 after symmetrization → graph algorithms on
    it stay O(users) at any scale factor."""
    ev = read_table(spark, sf, "events")
    cell = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 1800000000").alias("bucket"),
        "user_id",
    ).distinct()
    a, b = cell.alias("a"), cell.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .where(F.col("a.user_id") < F.col("b.user_id"))
        .groupBy(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sym = pair_counts.unionByName(
        pair_counts.select(
            F.col("v").alias("u"), F.col("u").alias("v"), "n"
        )
    )
    w = Window.partitionBy("u").orderBy(F.col("n").desc(), F.col("v").asc())
    return (
        sym.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= 3)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )


def _q_trend_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Per-series OLS trend (operators/profile.py:trend_slope): value
    drift per event type over epoch seconds. Exact decimal moments,
    fixed IEEE epilogue — the portable twin of regr_slope (the oracle
    uses the same explicit formula, never regr_slope's double sums)."""
    from sensor_time_series_pyspark_spark.operators import trend_slope

    ev = read_table(spark, sf, "events")
    base = ev.select(
        "event_type",
        F.col("ts").cast("long").alias("t"),
        "value",
    )
    return trend_slope(
        base, "t", "value", by=["event_type"], x_decimals=0, y_decimals=6
    )


def _q_group_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Per-row z-score within group (operators/profile.py:group_zscore):
    order value vs its priority class. One exact-moment aggregate
    broadcast back — the fact table shuffles zero times."""
    from sensor_time_series_pyspark_spark.operators import group_zscore

    o = read_table(spark, sf, "orders")
    out = group_zscore(
        o.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        "o_totalprice",
        by=["o_orderpriority"],
        decimals=2,
    )
    return out.select("o_orderkey", "o_orderpriority", "zscore")


def _q_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition counts + shares between event
    types per user stream (operators/analytics.py:transition_matrix).
    One lead window (single shuffle on user), integer counts, one
    division for the share."""
    from sensor_time_series_pyspark_spark.operators import transition_matrix

    ev = read_table(spark, sf, "events")
    return transition_matrix(
        ev, "user_id", "ts", "event_type", tiebreak_col="event_id"
    )


def _q_running_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative distinct users per day (operators/analytics.py:
    running_distinct): first-seen reduction instead of the quadratic
    distinct-per-day self-join; the only ordered window runs over the
    tiny per-day frame."""
    from sensor_time_series_pyspark_spark.operators import running_distinct

    ev = read_table(spark, sf, "events")
    return running_distinct(ev, "user_id", "ts")


def _q_dup_ngram_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicated-3-gram rate per document (operators/contamination.py:
    dup_ngram_rate) — the RefinedWeb-style cross-document repetition
    signal, via a gram-df aggregate (no doc×doc join). Portable gram
    ids (md5 mod 2^31-1), integer counts, one division."""
    from sensor_time_series_pyspark_spark.operators import dup_ngram_rate

    docs = read_table(spark, sf, "documents")
    return dup_ngram_rate(docs, "doc_id", "text", n=3, portable=True)


def _q_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Keyed snapshot diff (operators/diff.py:snapshot_diff): ONE full
    outer join on the key comparing map-side xxhash64 content hashes.
    The two versions are deterministic projections of orders (drop
    key%101 rows from new, drop key%97 / perturb key%89 prices in old),
    so every change class appears. The oracle classifies by direct
    column comparison — hash vs direct must agree."""
    from sensor_time_series_pyspark_spark.operators import snapshot_diff

    o = read_table(spark, sf, "orders")
    new = o.where(F.col("o_orderkey") % 101 != 0)
    old = o.where(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(old, new, ["o_orderkey"])


def _q_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus collocations by lift (operators/ranking.py:
    collocation_lift): adjacent-pair counts over unigram independence.
    Log-free PMI ranking — every score input is an exact integer, one
    division at the end."""
    from sensor_time_series_pyspark_spark.operators import collocation_lift

    docs = read_table(spark, sf, "documents")
    return collocation_lift(docs, "doc_id", "text", min_pair_count=3)


def _q_gopher_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-rule document quality gates (functions/text.py:
    gopher_flags): five integer-only filters + the conjunction, zero
    divisions (cross-multiplied thresholds) — bit-portable."""
    from sensor_time_series_pyspark_spark.functions.text import gopher_flags

    docs = read_table(spark, sf, "documents")
    return docs.select("doc_id", gopher_flags("text").alias("g")).select(
        "doc_id", "g.*"
    )


def _q_null_runs(spark: SparkSession, sf: str) -> DataFrame:
    """Longest missing-data stretch per series (operators/islands.py:
    null_runs): running non-null count anchors each null run; one
    shuffle on the series key."""
    from sensor_time_series_pyspark_spark.operators import null_runs

    return null_runs(
        _nulled_events(spark, sf), ["user_id"], ["ts", "event_id"], "value"
    )


def _q_trigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    """MLE trigram language-model table (operators/ranking.py:
    ngram_lm): c(w1w2w3)/c(w1w2·) with exact integer counts and one
    division; denominators come from a window over the AGGREGATED gram
    frame, never a second corpus scan."""
    from sensor_time_series_pyspark_spark.operators import ngram_lm

    docs = read_table(spark, sf, "documents")
    return ngram_lm(docs, "doc_id", "text", n=3, min_context_count=3)


def _q_posting_lists(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted-index posting summary (operators/ranking.py:
    posting_lists): per-term df/tf/id-range; the (doc, term) tf is
    pre-reduced so the term shuffle carries one row per posting."""
    from sensor_time_series_pyspark_spark.operators import posting_lists

    docs = read_table(spark, sf, "documents")
    return posting_lists(docs, "doc_id", "text")


def _q_time_in_state(spark: SparkSession, sf: str) -> DataFrame:
    """Per-state dwell time (operators/analytics.py:time_in_state):
    exact integer-microsecond durations from one lead window; mean is
    one division of two exact integers."""
    from sensor_time_series_pyspark_spark.operators import time_in_state

    ev = read_table(spark, sf, "events")
    return time_in_state(ev, "user_id", "ts", "event_type", tiebreak_col="event_id")


def _q_densify_grid(spark: SparkSession, sf: str) -> DataFrame:
    """Regular-grid densification with LOCF fill (operators/
    resample.py:densify_locf): per-user 30-min grid via integer epoch
    buckets + sequence(); ONE window pass fills — no per-gridpoint
    as-of join."""
    from sensor_time_series_pyspark_spark.operators import densify_locf

    ev = read_table(spark, sf, "events")
    return densify_locf(ev, ["user_id"], "ts", "value", step_seconds=1800)


def _q_session_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Session-level rollup on top of sessionize (q15's operator):
    per-user session count, events-per-session, and mean session
    duration — exact micros sums, two integer divisions at the end."""
    ev = read_table(spark, sf, "events")
    s = sessionize(ev, "ts", ["user_id"], gap_seconds=1800)
    per_session = s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (
            F.max(F.unix_micros(F.col("ts"))) - F.min(F.unix_micros(F.col("ts")))
        ).alias("dur_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_ev").alias("n_events"),
        (
            F.sum("n_ev").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("events_per_session"),
        (
            F.sum("dur_us").cast("double")
            / (F.count(F.lit(1)) * F.lit(1000000)).cast("double")
        ).alias("mean_session_seconds"),
    )


def _q_source_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source corpus health: doc count, total chars, language
    spread, and Gopher pass share (functions/text.py:gopher_flags) —
    the curation dashboard query; integer counts, one division."""
    from sensor_time_series_pyspark_spark.functions.text import gopher_flags

    docs = read_table(spark, sf, "documents")
    base = docs.select(
        "source",
        "lang",
        "n_chars",
        gopher_flags("text")["pass_all"].cast("int").alias("ok"),
    )
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("ok").alias("n_pass"),
        (F.sum("ok").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "pass_share"
        ),
    )


def _q_minmax_scale(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group min-max feature scaling (operators/profile.py:
    minmax_scale): broadcast bounds, exact decimal differences, one
    division — the fact table never shuffles."""
    from sensor_time_series_pyspark_spark.operators import minmax_scale

    ev = read_table(spark, sf, "events")
    out = minmax_scale(
        ev.select("event_id", "event_type", "value"),
        "value",
        by=["event_type"],
        decimals=6,
    )
    return out.select("event_id", "event_type", "scaled")


def _q_spearman(spark: SparkSession, sf: str) -> DataFrame:
    """Spearman rank correlation of value vs time per event type
    (operators/profile.py:spearman_corr) — the monotone-trend test.
    Doubled average ranks stay integer (2·rank + ties − 1), so the
    whole statistic rides exact_corr's decimal moments."""
    from sensor_time_series_pyspark_spark.operators import spearman_corr

    ev = read_table(spark, sf, "events")
    base = ev.select(
        "event_type", F.col("ts").cast("long").alias("t"), "value"
    )
    return spearman_corr(base, "t", "value", by=["event_type"])


def _q_chisq(spark: SparkSession, sf: str) -> DataFrame:
    """Per-cell chi-square contributions for priority × status
    (operators/profile.py:chisq_cells): exact decimal products, fixed
    IEEE epilogue per cell; totals come from windows over the
    aggregated cell frame — one fact scan."""
    from sensor_time_series_pyspark_spark.operators import chisq_cells

    o = read_table(spark, sf, "orders")
    return chisq_cells(o, "o_orderpriority", "o_orderstatus")


def _q_benford(spark: SparkSession, sf: str) -> DataFrame:
    """Leading-digit distribution of order values vs Benford's law
    (operators/profile.py:benford_digits) — log-free digit extraction
    via exact integer stringification; expectations are literal
    constants in both engines."""
    from sensor_time_series_pyspark_spark.operators import benford_digits

    o = read_table(spark, sf, "orders")
    return benford_digits(o, "o_totalprice", decimals=2)


def _q_dimension_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension embedding statistics (ml/stats.py:dimension_stats):
    posexplode → exact decimal moments keyed on the dimension (shuffle
    carries d rows per task); the normalization-constant pass before
    feature scaling."""
    from sensor_time_series_pyspark_spark.ml import dimension_stats

    emb = read_table(spark, sf, "embeddings")
    return dimension_stats(emb, "embedding", decimals=6)


def _q_mllib_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Feature correlation matrix via pyspark.ml.stat.Correlation
    (ml/stats.py:correlation_matrix), flattened to (i, j, corr) rows.
    Rows-only: BLAS double accumulation has no SQL twin; the test gate
    compares against numpy on a sample."""
    from sensor_time_series_pyspark_spark.ml import correlation_matrix

    emb = read_table(spark, sf, "embeddings")
    return correlation_matrix(emb, "embedding")


def _q_sax(spark: SparkSession, sf: str) -> DataFrame:
    """PAA + SAX symbolization (operators/sax.py:sax_symbols): 8
    segment means per user series, z-normalized against exact decimal
    series moments and discretized on literal Gaussian quartile
    breakpoints — the Lin/Keogh motif-mining compaction, one shuffle."""
    from sensor_time_series_pyspark_spark.operators import sax_symbols

    ev = read_table(spark, sf, "events")
    return sax_symbols(
        ev, ["user_id"], ["ts", "event_id"], "value", n_segments=8
    )


def _q_event_trigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide event-path trigrams: the order-3 extension of the
    transition matrix (two leads over one entity window), counting
    common 3-step journeys across all users."""
    ev = read_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = ev.select(
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    ).where(F.col("s3").isNotNull())
    return paths.groupBy("s1", "s2", "s3").agg(F.count(F.lit(1)).alias("n"))


def _q_dtw_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """DTW distance between every pair of per-event-type resampled
    series (operators/dtw.py): resample-first keeps the Python kernel
    bounded; the DP runs in one Arrow-batched pandas UDF over
    broadcast-joined series arrays. Oracle-gated: the banded DP is
    replicated cell-for-cell by a recursive CTE (one matrix row per
    recursive step; the within-row scan is a seeded list_reduce fold),
    so even the elastic alignment is hash-checked; reference-DP tests
    pin the kernel besides."""
    from sensor_time_series_pyspark_spark.operators import dtw_pairs

    ev = read_table(spark, sf, "events")
    series = ev.groupBy(
        "event_type", F.window("ts", "30 minutes").alias("w")
    ).agg(_davg(F.col("value")).alias("v")).select(
        "event_type", F.col("w.start").alias("bucket"), "v"
    )
    types = [r["event_type"] for r in series.select("event_type").distinct().collect()]
    pair_rows = [(a, b) for i, a in enumerate(sorted(types)) for b in sorted(types)[i + 1:]]
    pairs = spark.createDataFrame(pair_rows, "key_a string, key_b string")
    return dtw_pairs(series, "event_type", "bucket", "v", pairs, band=48)


def _q_ab_test(spark: SparkSession, sf: str) -> DataFrame:
    """Two-proportion z-test (operators/analytics.py:ab_proportion_test)
    over a deterministic hash-split experiment: arms from md5 buckets
    (engine-reproducible assignment, q64's machinery), conversion =
    any purchase. One conditional aggregate; fixed IEEE epilogue."""
    from sensor_time_series_pyspark_spark.operators import (
        ab_proportion_test,
        hash_split,
    )

    ev = read_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    assigned = hash_split(
        per_user, "user_id", {"a": 0.5, "b": 0.5}, salt="exp1", out_col="arm"
    )
    return ab_proportion_test(assigned, "user_id", "arm", "converted")


def _q_stock_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Floored running inventory balance (operators/windows.py:
    capped_running_sum): the sequential-looking max(b+x, 0) recursion
    solved with the reflection identity b = S − min(0, min S) — two
    prefix aggregates in ONE sorted window pass, exact decimals."""
    from sensor_time_series_pyspark_spark.operators import capped_running_sum

    li = read_table(spark, sf, "lineitem")
    d = li.withColumn(
        "delta",
        F.when(
            F.col("l_returnflag") == "R", -F.col("l_quantity")
        ).otherwise(F.col("l_quantity")),
    )
    out = capped_running_sum(
        d,
        ["l_partkey"],
        ["l_shipdate", "l_orderkey", "l_linenumber"],
        "delta",
    )
    return out.select("l_partkey", "l_orderkey", "l_linenumber", "balance")


def _q_market_basket(spark: SparkSession, sf: str) -> DataFrame:
    """Co-purchase association rules (operators/analytics.py:
    market_basket_pairs): part pairs within orders scored by
    support/confidence/lift — inverted self-join on the basket key,
    integer counts, one division per metric."""
    from sensor_time_series_pyspark_spark.operators import market_basket_pairs

    li = read_table(spark, sf, "lineitem")
    return market_basket_pairs(li, "l_orderkey", "l_partkey", min_pair_count=2)


def _q_rfm(spark: SparkSession, sf: str) -> DataFrame:
    """RFM quintile segmentation: recency/frequency/monetary per
    customer, each ntiled into 5 bands with a deterministic custkey
    tiebreak (total order → reproducible ntile), combined into the
    classic 3-digit code. Windows run over the aggregated customer
    frame only."""
    o = read_table(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__mon"),
    )
    anchor = Window.partitionBy()
    base = per_cust.withColumn(
        "recency_days",
        F.datediff(F.max("last_day").over(anchor), F.col("last_day")),
    )
    w_r = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey").asc())
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey").asc())
    w_m = Window.orderBy(F.col("__mon").desc(), F.col("o_custkey").asc())
    scored = base.select(
        "o_custkey",
        "recency_days",
        "frequency",
        F.col("__mon").cast("double").alias("monetary"),
        F.ntile(5).over(w_r).alias("r_score"),
        F.ntile(5).over(w_f).alias("f_score"),
        F.ntile(5).over(w_m).alias("m_score"),
    )
    return scored.withColumn(
        "rfm",
        F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"),
    )


def _q_mom_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Month-over-month revenue growth per order priority: exact
    decimal monthly sums, one lag window over the tiny month×priority
    frame, growth = (rev − prev)/prev in one fixed expression."""
    o = read_table(spark, sf, "orders")
    monthly = o.groupBy(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "o_orderpriority",
        "month",
        "n_orders",
        "revenue",
        ((F.col("revenue") - prev) / prev).alias("mom_growth"),
    )


def _q_debounce(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user debounce / alarm rate-limit (streaming/stateful.py:
    debounce_batch, with a stream twin asserted equal in tests): keep
    an event only if >= 30 min since the last KEPT event. Sequential
    by nature (emission depends on prior emissions) — oracle is the
    recursive-CTE replay of the same fold."""
    from sensor_time_series_pyspark_spark.streaming.stateful import debounce_batch

    ev = read_table(spark, sf, "events")
    return debounce_batch(ev, "user_id", "ts", cooldown_seconds=1800)


def _q_kll_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable KLL quantile rollup (operators/sketches.py): daily
    per-type sketch partials merged up to event_type — the persisted-
    partials pattern (like q96's HLL) for percentile dashboards that
    must never rescan the fact table. Rows-only: sketch outputs are
    implementation-defined; a tolerance test pins them to exact
    percentiles."""
    from sensor_time_series_pyspark_spark.operators import (
        kll_partials,
        kll_rollup,
    )

    ev = read_table(spark, sf, "events")
    daily = kll_partials(
        ev.withColumn("day", F.to_date("ts")), ["event_type", "day"], "value"
    )
    return kll_rollup(daily, ["event_type"], quantiles=(0.5, 0.95, 0.99))


def _q_theta_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Theta-sketch audience algebra (operators/sketches.py): distinct
    users who clicked vs purchased — union/intersection/difference from
    two kilobyte sketches. At this scale the sketches are in exact
    mode (distinct < 2^lg_k), so the oracle is the exact set algebra;
    beyond 2^lg_k the same query degrades gracefully to ±1.6%
    estimates."""
    from sensor_time_series_pyspark_spark.operators import (
        theta_overlap,
        theta_partials,
    )

    ev = read_table(spark, sf, "events")
    parts = theta_partials(ev, ["event_type"], "user_id", lg_k=12)
    return theta_overlap(parts, "event_type", "click", "purchase")


def _q_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the customer and the
    line's supplier share a nation, ASIA region, one order year. Five
    joins — the three small dims broadcast; the orders⋈lineitem spine
    shuffles on the order key once."""
    li = read_table(spark, sf, "lineitem")
    o = read_table(spark, sf, "orders")
    c = read_table(spark, sf, "customer")
    s = read_table(spark, sf, "supplier")
    n = read_table(spark, sf, "nation")
    r = read_table(spark, sf, "region")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - _dec("l_discount")
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .where(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
    )
    return j.groupBy("n_name").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def _q_revenue_delta(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: the what-if revenue from discounts in a band,
    one year, small quantities — a pure scan-side filter aggregate
    (every predicate pushes into the parquet scan)."""
    li = read_table(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").cast("decimal(12,2)") >= F.lit("0.05").cast("decimal(12,2)"))
            & (F.col("l_discount").cast("decimal(12,2)") <= F.lit("0.07").cast("decimal(12,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _q_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: customer revenue lost to returns in one
    quarter, with nation context — fact⋈fact on the order key, then a
    customer rollup and broadcast nation join."""
    li = read_table(spark, sf, "lineitem")
    o = read_table(spark, sf, "orders")
    c = read_table(spark, sf, "customer")
    n = read_table(spark, sf, "nation")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - _dec("l_discount")
    )
    j = (
        li.where(F.col("l_returnflag") == "R")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
    )
    return j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def _q_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold, with customer context — the big-lineitem HAVING rollup
    feeding a semi-filtered join."""
    li = read_table(spark, sf, "lineitem")
    o = read_table(spark, sf, "orders")
    c = read_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__q"))
        .where(F.col("__q") > F.lit(150).cast("decimal(12,2)"))
    )
    j = (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
    )
    return j.select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.col("__q").cast("double").alias("sum_qty"),
    )


def _q_normalized_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup AFTER canonical normalization (functions/text.py:
    normalize_text: casefold + accent fold + whitespace collapse) —
    catches the trivially-reformatted duplicates raw md5 dedup misses.
    Same group shape as q17: fingerprint, copies, survivor id."""
    from sensor_time_series_pyspark_spark.functions.text import normalize_text

    docs = read_table(spark, sf, "documents")
    return (
        docs.select("doc_id", F.md5(normalize_text("text")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def _q_funnel_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Conversion-latency distribution: seconds from a user's first
    view to their first subsequent purchase, summarized as exact
    median/p90 (integer-second order stats — both engines interpolate
    the same exact doubles, q60's parity mechanism)."""
    ev = read_table(spark, sf, "events")
    views = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts"))).alias("t_view")
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .join(views, "user_id")
        .where(F.unix_micros(F.col("ts")) > F.col("t_view"))
        .groupBy("user_id")
        .agg(
            F.min("t_view").alias("t_view"),
            F.min(F.unix_micros(F.col("ts"))).alias("t_purchase"),
        )
    )
    lat = purch.select(
        F.expr("(t_purchase - t_view) div 1000000").alias("latency_sec")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.median(F.col("latency_sec").cast("double")).alias("median_sec"),
        F.percentile(F.col("latency_sec").cast("double"), F.lit(0.9)).alias(
            "p90_sec"
        ),
    )


def _q_communities(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic label-propagation communities (operators/graph.py:
    label_propagation — most-frequent neighbor label, smallest on ties)
    over the strongest-partner user graph (degree-bounded, see
    _partner_graph). Rows-only: iterative fixed point has no SQL twin;
    determinism + clique-separation pinned by tests."""
    from sensor_time_series_pyspark_spark.operators import label_propagation

    labels = label_propagation(_partner_graph(spark, sf), n_iter=4)
    return labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))


def _q_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent view/click within the hour (operators/asof.py backward
    as-of with tolerance + matched-ts). Touches pre-aggregate per
    (user, ts) for deterministic tie handling, per the asof contract."""
    ev = read_table(spark, sf, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touch = (
        ev.where(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", "ts")
        .agg(
            F.expr("max_by(event_type, event_id)").alias("touch_type"),
            F.max("event_id").alias("touch_id"),
        )
    )
    return asof_join(
        purch,
        touch,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["touch_type", "touch_id"],
        direction="backward",
        tolerance_seconds=3600,
        matched_ts_col="touch_ts",
    ).select("event_id", "user_id", "ts", "touch_type", "touch_id", "touch_ts")


def _q_qq_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile-quantile drift: per event type, the D1..D9 deciles of
    value in the first vs second half of the time range, side by side —
    the distribution-shift view TVD (q81) summarizes to one number.
    percentile_disc (an actual data value, no interpolation) keeps the
    comparison engine-exact on continuous doubles."""
    ev = read_table(spark, sf, "events")
    mid = ev.agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cast(ts as double))")
    ).collect()[0][0]
    half = F.when(F.col("ts").cast("double") <= mid, "h1").otherwise("h2")
    deciles = [i / 10 for i in range(1, 10)]
    per_half = (
        ev.select("event_type", half.alias("half"), "value")
        .groupBy("event_type", "half")
        .agg(
            *[
                F.expr(
                    f"percentile_disc({d}) WITHIN GROUP (ORDER BY value)"
                ).alias(f"d{int(d * 10)}")
                for d in deciles
            ]
        )
    )
    h1 = per_half.where(F.col("half") == "h1").drop("half")
    h2 = per_half.where(F.col("half") == "h2").drop("half")
    cols = [f"d{i}" for i in range(1, 10)]
    return h1.alias("a").join(h2.alias("b"), "event_type").select(
        "event_type",
        *[F.col(f"a.{c}").alias(f"{c}_h1") for c in cols],
        *[F.col(f"b.{c}").alias(f"{c}_h2") for c in cols],
    )


def _q_seasonal_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar seasonality profile: mean value per (event type,
    day-of-week, hour) — the weekly heatmap behind load forecasting.
    Exact decimal means; Spark dayofweek (1=Sunday) mirrored as
    DuckDB dayofweek+1."""
    ev = read_table(spark, sf, "events")
    return ev.groupBy(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(
        _davg(F.col("value")).alias("avg_value"),
        F.count(F.lit(1)).alias("n"),
    )


def _q_swinging_door(spark: SparkSession, sf: str) -> DataFrame:
    """Swinging-door trending compression (operators/compress.py:
    swinging_door_compress) — the slope-tracking historian rule
    (PI compression deviation): minimal kept points with linear
    reconstruction within ±ε. Oracle-gated: the corridor recursion
    (slope bounds, collapse-and-restart, duplicate-timestamp branch)
    is replicated bit-for-bit by a recursive CTE; the reconstruction-
    error bound is additionally tested."""
    from sensor_time_series_pyspark_spark.operators import swinging_door_compress

    ev = read_table(spark, sf, "events")
    out = swinging_door_compress(ev, "user_id", "ts", "value", epsilon=10.0)
    return out.select("user_id", "ts", "value")


def _q_topk_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable frequent-items rollup (operators/sketches.py:
    topk_partials/topk_rollup): daily per-nation item sketches merged
    up to nation — q96's persisted-partials pattern for top-k. Rows-
    only: merged-estimate tie order is sketch-defined; exactness under
    the tracked-item bound is tested separately."""
    from sensor_time_series_pyspark_spark.operators import (
        topk_partials,
        topk_rollup,
    )

    ev = read_table(spark, sf, "events")
    cust = read_table(spark, sf, "customer")
    tagged = ev.join(
        F.broadcast(cust.select("c_custkey", "c_nationkey")),
        ev["user_id"] == F.col("c_custkey"),
    ).select("c_nationkey", F.to_date("ts").alias("day"), "event_type")
    daily = topk_partials(tagged, ["c_nationkey", "day"], "event_type")
    return topk_rollup(daily, ["c_nationkey"], k=3)


def _q_table_checksum(spark: SparkSession, sf: str) -> DataFrame:
    """Order-insensitive table fingerprint (operators/validate.py:
    table_checksum): one aggregate over portable md5 row hashes —
    the regression gate for pipeline rewrites. Columns are pre-cast to
    engine-stable string forms (ints/strings/epoch seconds/scaled
    decimals) per the operator contract."""
    from sensor_time_series_pyspark_spark.operators import table_checksum

    li = read_table(spark, sf, "lineitem")
    stable = li.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        F.col("l_shipdate").cast("long").alias("ship_epoch"),
        F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
    )
    return table_checksum(stable)


def _q_frequent_triples(spark: SparkSession, sf: str) -> DataFrame:
    """Apriori level-3: frequent item TRIPLES within orders, built on
    the frequent-pair lattice (q127's machinery) — candidate triples
    only form where both prefix pairs are frequent (the Apriori prune),
    then one membership join verifies the third co-occurrence. Never
    enumerates C(width,3) per basket blindly at scale."""
    li = read_table(spark, sf, "lineitem")
    bi = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    pairs = (
        bi.alias("a")
        .join(bi.alias("b"), F.col("a.basket") == F.col("b.basket"))
        .where(F.col("a.item") < F.col("b.item"))
        .groupBy(
            F.col("a.basket").alias("basket"),
            F.col("a.item").alias("i1"),
            F.col("b.item").alias("i2"),
        )
        .agg(F.lit(1).alias("__one"))
    )
    # support-2 pairs form the candidate lattice
    freq = (
        pairs.groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("i1", "i2")
    )
    cand = pairs.join(freq, ["i1", "i2"]).select("basket", "i1", "i2")
    triples = (
        cand.alias("p")
        .join(
            bi.alias("c"),
            (F.col("p.basket") == F.col("c.basket"))
            & (F.col("c.item") > F.col("p.i2")),
        )
        .groupBy(
            F.col("p.i1").alias("i1"),
            F.col("p.i2").alias("i2"),
            F.col("c.item").alias("i3"),
        )
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .where(F.col("n_baskets") >= 2)
    )
    return triples


def _q_sequential_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Sequential purchase patterns: customers buying part A in one
    order and part B in a strictly LATER order — the market-sequence
    mining step behind next-purchase recommendation. Customer-keyed
    self-join on the (customer, part, first-date) reduction, never on
    raw lineitems."""
    li = read_table(spark, sf, "lineitem")
    o = read_table(spark, sf, "orders")
    cp = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .agg(F.min("o_orderdate").alias("first_dt"))
    )
    a, b = cp.alias("a"), cp.alias("b")
    seq = (
        a.join(b, F.col("a.cust") == F.col("b.cust"))
        .where(F.col("a.first_dt") < F.col("b.first_dt"))
        .groupBy(
            F.col("a.part").alias("part_first"),
            F.col("b.part").alias("part_then"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .where(F.col("n_customers") >= 3)
    )
    return seq


def _q_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort lifetime-value curve: cumulative revenue per signup-month
    cohort by month age — exact decimal sums, with the running total a
    window over the tiny cohort×age frame."""
    o = read_table(spark, sf, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    j = o.join(firsts, "o_custkey").select(
        "cohort_month",
        (
            (F.year("o_orderdate") - F.year("cohort_month")) * 12
            + (F.month("o_orderdate") - F.month("cohort_month"))
        ).alias("age_months"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    per_age = j.groupBy("cohort_month", "age_months").agg(
        F.sum("rev").alias("__rev"), F.count(F.lit(1)).alias("n_orders")
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_age.select(
        "cohort_month",
        "age_months",
        "n_orders",
        F.col("__rev").cast("double").alias("revenue"),
        F.sum("__rev").over(w).cast("double").alias("cum_revenue"),
    )


def _q_life_table(spark: SparkSession, sf: str) -> DataFrame:
    """Survival life table over user lifespans (days from first to
    last activity): per age t, users still at risk and users ending
    exactly at t — the INTEGER inputs of the Kaplan-Meier estimator
    (the S(t) product itself is a client-side fold over this tiny
    frame; float cumulative products don't hash across engines).
    At-risk counts come from a reverse running sum over the aggregated
    lifespan frame — one scan of the fact table."""
    ev = read_table(spark, sf, "events")
    spans = ev.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))).alias(
            "lifespan"
        )
    )
    ends = spans.groupBy("lifespan").agg(F.count(F.lit(1)).alias("d"))
    w = (
        Window.orderBy(F.col("lifespan").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ends.select(
        F.col("lifespan").alias("age_days"),
        "d",
        F.sum("d").over(w).alias("n_at_risk"),
    )


def _q_revenue_gini(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of the customer revenue distribution (Lorenz
    form): G = 2·Σ(i·x_(i)) / (n·Σx) − (n+1)/n over revenue-sorted
    customers. Ranks are integers (deterministic custkey tiebreak),
    Σ(i·x) and Σx exact decimals, and the epilogue is two divisions +
    one subtraction in fixed order — engine-portable. The rank window
    runs over the aggregated customer frame, not the fact table."""
    o = read_table(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy(F.col("rev").asc(), F.col("o_custkey").asc())
    ranked = per_cust.select(
        F.row_number().over(w).cast("decimal(12,0)").alias("i"),
        F.col("rev"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("i") * F.col("rev")).cast("decimal(38,2)")).alias("__iwx"),
        F.sum(F.col("rev").cast("decimal(38,2)")).alias("__sx"),
    )
    nd = F.col("n").cast("double")
    gini = (
        F.lit(2.0) * F.col("__iwx").cast("double")
        / (nd * F.col("__sx").cast("double"))
        - (nd + F.lit(1.0)) / nd
    )
    return agg.select(
        "n",
        F.col("__sx").cast("double").alias("total_revenue"),
        gini.alias("gini"),
    )


def _q_bfs_hops(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-source BFS hop distance (operators/graph.py:bfs_hops) over
    the supplier↔part supply graph, seeded at every tenth supplier:
    level-synchronous frontier expansion, one equi-join + one anti-join
    per round, frontier shrinks as levels saturate. Oracle: bounded
    recursive CTE taking min(hops)."""
    from sensor_time_series_pyspark_spark.operators import bfs_hops

    li = read_table(spark, sf, "lineitem")
    su = read_table(spark, sf, "supplier")
    edges = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    seeds = su.where(F.col("s_suppkey") % 10 == 1).select(
        (F.col("s_suppkey") * 2).alias("node")
    )
    return bfs_hops(edges, seeds, max_hops=3)


def _q_filter_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus filter funnel — the survivor count after each pre-training
    filter stage (total → exact-dedup rep → English → Gopher pass), as
    ONE conditional aggregate over one scan: the standard 'how much
    data survives my pipeline' accounting, all integer counts."""
    from sensor_time_series_pyspark_spark.functions.text import gopher_flags, lang_id

    docs = read_table(spark, sf, "documents")
    w = Window.partitionBy("text")
    flags = docs.select(
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("r"),
        (lang_id("text") == F.lit("en")).alias("e"),
        gopher_flags("text")["pass_all"].alias("g"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("r").cast("bigint")).alias("n_unique"),
        F.sum((F.col("r") & F.col("e")).cast("bigint")).alias("n_english"),
        F.sum((F.col("r") & F.col("e") & F.col("g")).cast("bigint")).alias(
            "n_quality"
        ),
    )


def _q_cluster_canonical(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical-document selection per near-dup cluster — dedup keeps
    the BEST member, not the first: longest text wins, lowest doc_id on
    ties (min_by over struct(-n_chars, doc_id), the type-agnostic
    tiebreak). Clusters from q53's jaccard→connected-components path;
    the vote is one aggregate over the tiny cluster frame."""
    pairs = jaccard_pairs(
        _rep_docs(spark, sf), "doc_id", "text", threshold=0.2, shingle_k=3,
        persist_index=True,
    )
    clusters = dedup_clusters(pairs)
    docs = read_table(spark, sf, "documents").select("doc_id", "n_chars")
    m = clusters.join(docs, "doc_id")
    return m.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("n_chars").alias("total_chars"),
        F.expr("min_by(doc_id, struct(-n_chars, doc_id))").alias(
            "canonical_doc_id"
        ),
    )


def _q_bpe_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level adjacent character-pair frequencies — the first
    iteration of BPE tokenizer training (count all symbol pairs, merge
    the most frequent): lower-cased word-internal char bigrams, counts
    ≥ 50. Pure built-in explode/transform — the pair generation is
    map-side; ONE shuffle on the pair key with partial aggregation."""
    docs = read_table(spark, sf, "documents")
    words = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("w")
    ).where(F.length("w") >= 2)
    prs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        prs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 50)
    )


def _q_lm_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Train/eval language-model coverage: word trigrams of EVEN doc_ids
    form the LM vocabulary; each ODD doc is scored by the fraction of
    its trigrams the LM has seen — the cheap no-log perplexity proxy
    used for corpus-vs-model fit. Distinct gram set broadcast-joins the
    eval grams; integer counts, one division."""
    docs = read_table(spark, sf, "documents")
    tri = F.expr(
        "transform(sequence(0, size(__t) - 3), "
        "i -> concat_ws(' ', __t[i], __t[i+1], __t[i+2]))"
    )
    grams = (
        docs.withColumn("__t", tokens(F.lower(F.col("text"))))
        .where(F.size("__t") >= 3)
        .select("doc_id", F.explode(tri).alias("gram"))
    )
    train = (
        grams.where(F.col("doc_id") % 2 == 0).select("gram").distinct()
        .withColumn("__seen", F.lit(1))
    )
    ev = grams.where(F.col("doc_id") % 2 == 1)
    joined = ev.join(train, "gram", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__seen", F.lit(0))).alias("n_seen"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_seen",
            (F.col("n_seen").cast("double") / F.col("n_grams").cast("double")).alias(
                "coverage"
            ),
        )
    )


def _q_bfill(spark: SparkSession, sf: str) -> DataFrame:
    """Backward-fill per series (operators/windows.py:bfill — the ffill
    mirror over an unbounded FOLLOWING frame; fills leading gaps)."""
    from sensor_time_series_pyspark_spark.operators import bfill

    out = bfill(
        _nulled_events(spark, sf), ["value"], order_col="ts", partition_by=["user_id"]
    )
    return out.select("event_id", "user_id", "ts", "value")


def _q_centroid_sim(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding centroids
    (cluster-confusability screen). Centroid accumulation is ORDER-FREE
    exact decimal sums keyed on (label, dim) — cosine is scale-
    invariant, so the count division is skipped entirely; the dot
    products then run double-sequentially over the dim-sorted arrays
    (identical fold order in both engines, q38's epilogue). The 10×64
    centroid frame is broadcast-sized; the fact table is scanned once."""
    e = read_table(spark, sf, "embeddings")
    comp = e.select("label", F.posexplode("embedding").alias("dim", "v"))
    cent = comp.groupBy("label", "dim").agg(
        F.sum(F.col("v").cast("double").cast("decimal(20,8)")).alias("s")
    )
    vecs = (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("a"))
        .select(
            "label",
            F.expr("transform(a, x -> cast(x.s as double))").alias("vec"),
        )
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    dot = lambda x, y: F.expr(  # noqa: E731
        f"aggregate(zip_with({x}, {y}, (p, q) -> p * q), 0D, (acc, z) -> acc + z)"
    )
    return (
        a.join(b, F.col("a.label") < F.col("b.label"))
        .select(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
            (
                dot("a.vec", "b.vec")
                / (F.sqrt(dot("a.vec", "a.vec")) * F.sqrt(dot("b.vec", "b.vec")))
            ).alias("cosine"),
        )
    )


def _q_seasonal_mase(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal-naive forecast skill per order priority: MASE = MAE of
    the lag-7 (weekly) naive forecast over MAE of the lag-1 naive, on
    daily order counts — the standard 'is there weekly structure'
    screen before fitting anything. Counts are integers, |diff| sums
    exact; ONE division at the end."""
    o = read_table(spark, sf, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.col("o_orderdate").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    w = Window.partitionBy("o_orderpriority").orderBy("day")
    d = daily.select(
        "o_orderpriority",
        (F.col("x") - F.lag("x", 1).over(w)).alias("d1"),
        (F.col("x") - F.lag("x", 7).over(w)).alias("d7"),
    )
    agg = d.where(F.col("d7").isNotNull()).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(F.abs("d1")).alias("__s1"),
        F.sum(F.abs("d7")).alias("__s7"),
    )
    return agg.select(
        "o_orderpriority",
        "n_eval",
        F.col("__s7").alias("abs_err_seasonal"),
        F.col("__s1").alias("abs_err_naive"),
        (F.col("__s7").cast("double") / F.col("__s1").cast("double")).alias("mase"),
    )


def _q_frame_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Video-style frame sampling through the Arrow decode seam
    (operators/multimodal.py:frame_byte_stats): frames fan out INSIDE
    mapInPandas (≤8 per blob, stride 16, len 12), per-frame integer
    byte stats stand in for decoder output — the full row-multiplying
    Python boundary is oracle-gated, like q37."""
    from sensor_time_series_pyspark_spark.operators import frame_byte_stats

    docs = read_table(spark, sf, "documents")
    blobs = docs.select("doc_id", F.encode("text", "utf-8").alias("blob"))
    return frame_byte_stats(
        blobs, "blob", ["doc_id"], frame_len=12, stride=16, max_frames=8
    )


def _q_tfidf_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """TF-IDF-weighted cosine near-dup pairs (operators/dedup.py:
    tfidf_cosine_pairs): jaccard_pairs' inverted-index shape with
    rare-term weighting — log-free BM25-ratio idf rounded ONCE to
    decimal, all accumulation exact, one float epilogue."""
    from sensor_time_series_pyspark_spark.operators import tfidf_cosine_pairs

    return tfidf_cosine_pairs(
        _rep_docs(spark, sf), "doc_id", "text", threshold=0.9
    )


def _q_session_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Top session journey paths: first three event types per gap
    session (deterministic (ts, event_id) order inside ONE aggregate —
    no second window pass), then path frequency. The product-analytics
    'common journeys' query."""
    ev = read_table(spark, sf, "events")
    sess = sessionize(ev, ts_col="ts", partition_by=["user_id"], gap_seconds=1800)
    per = sess.groupBy("user_id", "session_seq").agg(
        F.expr(
            "array_join(transform(slice(array_sort("
            "collect_list(struct(ts, event_id, event_type))), 1, 3), "
            "x -> x.event_type), '>')"
        ).alias("path")
    )
    return (
        per.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .where(F.col("n_sessions") >= 5)
    )


def _q_length_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Length-bucketed training-batch packing: docs bucketed by BPE-ish
    token count (÷64), row-numbered inside each bucket, chunked into
    16-doc batches — the padding-minimizing batcher. All integer
    arithmetic; the only sort is per-bucket."""
    docs = read_table(spark, sf, "documents")
    base = docs.select(
        "doc_id", bpe_ish_token_count("text").alias("n_tok")
    ).withColumn("bucket", F.expr("n_tok div 64"))
    w = Window.partitionBy("bucket").orderBy("n_tok", "doc_id")
    r = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "batch_id", F.expr("(rn - 1) div 16")
    )
    return r.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
        F.max("n_tok").alias("max_tokens"),
    )


def _q_entity_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    """Entity co-occurrence edges (NER-lite shape): marker tokens per
    doc (long tokens stand in for capitalized named entities — the
    synthetic corpus is all-lowercase), distinct (doc, entity),
    doc-keyed self-join for pairs seen in ≥2 docs — the
    graph-construction step feeding pagerank/LPA/BFS."""
    docs = read_table(spark, sf, "documents")
    ents = (
        docs.select("doc_id", F.explode(tokens("text")).alias("w"))
        .where(F.length("w") >= 6)
        .select("doc_id", F.col("w").alias("ent"))
        .distinct()
    )
    a = ents.select("doc_id", F.col("ent").alias("ent_a"))
    b = ents.select("doc_id", F.col("ent").alias("ent_b"))
    return (
        a.join(b, "doc_id")
        .where(F.col("ent_a") < F.col("ent_b"))
        .groupBy("ent_a", "ent_b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
    )


def _q_hamming_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """Binary embedding quantization + Hamming near-dup pairs: the
    sign bit of each of the first 48 dimensions packs into ONE bigint
    (sequential integer fold — engine-exact), pairs with Hamming
    distance ≤ 16 via bit_count(xor). 64-bit words make the candidate
    scan a register-width operation — the classic cheap pre-filter in
    front of exact cosine (cf. SRP signatures, q39, which use random
    planes; this is the axis-aligned variant)."""
    e = read_table(spark, sf, "embeddings").where(F.col("vec_id") < 200)
    packed = e.select(
        "vec_id",
        F.expr(
            "aggregate(slice(embedding, 1, 48), 0L, "
            "(acc, x) -> acc * 2 + CASE WHEN x > 0 THEN 1L ELSE 0L END)"
        ).alias("bits"),
    )
    a, b = packed.alias("a"), packed.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.expr("cast(bit_count(a.bits ^ b.bits) as int)").alias("hamming"),
        )
        .where(F.col("hamming") <= 16)
    )


def _q_funnel_strict(spark: SparkSession, sf: str) -> DataFrame:
    """Per-step-deadline funnel (operators/analytics.py:funnel_strict):
    earliest view, then earliest click within 1h OF THE VIEW, then
    earliest purchase within 1h OF THE CLICK — greedy earliest-chain,
    one user-keyed join + min aggregate per step (contrast q71, which
    has a single overall deadline)."""
    from sensor_time_series_pyspark_spark.operators import funnel_strict

    ev = read_table(spark, sf, "events")
    return funnel_strict(
        ev, "user_id", "ts",
        steps=[
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
        step_within_seconds=3600,
    )


def _q_lsh_quality(spark: SparkSession, sf: str) -> DataFrame:
    """LSH tuning report: exact-Jaccard pair count vs MinHash-LSH
    verified pair count at the SAME threshold/shingling (q19/q20
    configs), plus recall — the measurement a pipeline owner uses to
    pick n_bands. Integer counts, one division; both sides rerun their
    full pipelines (the join is on broadcast-sized pair frames)."""
    reps = _rep_docs(spark, sf)
    ex = jaccard_pairs(reps, "doc_id", "text", threshold=0.35, shingle_k=2)
    mh = minhash_pairs(
        reps, "doc_id", "text", threshold=0.35, shingle_k=2,
        n_hashes=16, n_bands=8,
    )
    hit = ex.select("id_a", "id_b").join(
        mh.select("id_a", "id_b"), ["id_a", "id_b"]
    )
    return (
        ex.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(mh.agg(F.count(F.lit(1)).alias("n_lsh")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_exact",
            "n_lsh",
            "n_hit",
            (F.col("n_hit").cast("double") / F.col("n_exact").cast("double")).alias(
                "recall"
            ),
        )
    )


def _q_equi_depth(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-DEPTH histogram (deciles of order value) — the complement
    of q76's equi-width bins: ntile(10) with a deterministic tiebreak,
    per-bucket count and exact decimal bounds. The global window sort
    is the small-data path; operators/quantiles.py:approx_ntile is the
    sketch-bucketed scale path for fact-sized inputs (tested
    equivalent-shape)."""
    o = read_table(spark, sf, "orders")
    w = Window.orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
    d = o.select(
        F.ntile(10).over(w).alias("decile"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("p").cast("double").alias("lo"),
        F.max("p").cast("double").alias("hi"),
    )


def _q_seasonal_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal-residual anomaly screen: each event compared to its
    (type, day-of-week, hour) calendar-mean (q142's profile), flagged
    when value > 2×mean. The profile is a 5×7×24 frame broadcast back
    onto the fact — the fact table never re-shuffles (q102's
    broadcast-moments pattern at calendar granularity). Exact decimal
    means; integer flag counts; one division."""
    ev = read_table(spark, sf, "events")
    keyed = ev.select(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hod"),
        "value",
    )
    prof = keyed.groupBy("event_type", "dow", "hod").agg(
        _davg(F.col("value")).alias("mu")
    )
    j = keyed.join(F.broadcast(prof), ["event_type", "dow", "hod"])
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("value") > F.lit(2.0) * F.col("mu"), 1).otherwise(0)
        ).cast("bigint").alias("n_anom"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "n_anom",
        (F.col("n_anom").cast("double") / F.col("n_events").cast("double")).alias(
            "anom_share"
        ),
    )


def _revenue() -> F.Column:
    """Exact decimal l_extendedprice*(1-l_discount) (the TPC-H revenue
    term; decimal products are exact so Spark == DuckDB bitwise)."""
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))


def _q_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between nation pairs by
    ship year. The two nation-annotated key maps (supplier→nation,
    customer-order→nation) are tiny next to the fact and broadcast, so
    lineitem is scanned once and shuffles only for the final 3-key
    aggregate — no fact-fact shuffle join at any scale."""
    n = read_table(spark, sf, "nation")
    supp = (
        read_table(spark, sf, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        read_table(spark, sf, "customer")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = read_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.sum(_revenue()).cast("double").alias("revenue"))


def _q_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's import revenue
    by order year — conditional aggregate over a dim-star join, ONE
    division per year row. All dims broadcast; the fact shuffles once
    for the year aggregate."""
    n = read_table(spark, sf, "nation")
    r = read_table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    cust = (
        read_table(spark, sf, "customer")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        read_table(spark, sf, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = read_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = read_table(spark, sf, "lineitem")
    j = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    per_year = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", _revenue())).cast(
            "double"
        ).alias("nation_rev"),
        F.sum(_revenue()).cast("double").alias("total_rev"),
    )
    return per_year.select(
        "o_year",
        "nation_rev",
        "total_rev",
        (F.coalesce(F.col("nation_rev"), F.lit(0.0)) / F.col("total_rev")).alias(
            "mkt_share"
        ),
    )


def _q_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year for one
    part family. Profit = revenue − 60% retail cost × qty, all decimal
    products (exact in both engines). Part and supplier maps broadcast;
    lineitem scanned once."""
    p = read_table(spark, sf, "part").where(F.col("p_type") == "PROMO").select(
        "p_partkey", "p_retailprice"
    )
    n = read_table(spark, sf, "nation")
    supp = (
        read_table(spark, sf, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = read_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = read_table(spark, sf, "lineitem")
    cost = (
        _dec("p_retailprice")
        * _dec("l_quantity")
        * F.lit("0.60").cast("decimal(3,2)")
    )
    j = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return j.groupBy("nation", F.year("o_orderdate").alias("o_year")).agg(
        F.sum(_revenue().cast("decimal(30,6)") - cost.cast("decimal(30,6)"))
        .cast("double")
        .alias("profit")
    )


def _q_priority_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment counts split by order priority —
    conditional integer aggregate after one fact-fact join keyed on
    orderkey (sort-merge at scale; AQE may demote to broadcast when the
    filtered side is small)."""
    o = read_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = read_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).where(late)
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
    )


def _q_order_count_dist(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer including
    zero-order customers — left outer join + two stacked aggregates.
    The second aggregate runs on the already-customer-sized frame."""
    c = read_table(spark, sf, "customer").select("c_custkey")
    o = read_table(spark, sf, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def _q_promo_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: promo-type revenue share per ship month —
    conditional decimal sums, fixed (100*promo)/total double epilogue.
    The 200-row part dim broadcasts."""
    p = read_table(spark, sf, "part").select("p_partkey", "p_type")
    li = read_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    agg = j.groupBy(F.month("l_shipdate").alias("ship_month")).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(
            F.lit(0).cast("decimal(12,2)")
        )).cast("double").alias("promo_rev"),
        F.sum(_revenue()).cast("double").alias("total_rev"),
    )
    return agg.select(
        "ship_month",
        "promo_rev",
        "total_rev",
        ((F.lit(100.0) * F.col("promo_rev")) / F.col("total_rev")).alias(
            "promo_share"
        ),
    )


def _q_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum quarterly revenue —
    aggregate once, then an argmax via broadcast of the 1-row max (no
    re-aggregation, no window over the fact). Revenue doubles come from
    identical exact decimal sums, so the equality join is portable."""
    li = read_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_revenue()).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    s = read_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def _q_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, size bucket)
    excluding one brand — count-distinct over a broadcast part join
    (Spark plans the distinct as a two-phase partial aggregate)."""
    p = read_table(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 16, 25, 36)
    ).select("p_partkey", "p_brand", "p_size")
    li = read_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    return j.groupBy("p_brand", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


def _q_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-average-quantity lineitems
    of one brand — the correlated scalar subquery de-correlated into a
    per-part mean (exact-decimal _davg) broadcast back onto the fact;
    one final scalar row."""
    p = read_table(spark, sf, "part").where(F.col("p_brand") == "Brand#3").select(
        "p_partkey"
    )
    li = read_table(spark, sf, "lineitem")
    branded = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    means = branded.groupBy(F.col("l_partkey").alias("__pk")).agg(
        _davg(F.col("l_quantity")).alias("avg_qty")
    )
    j = branded.join(
        F.broadcast(means), F.col("l_partkey") == F.col("__pk")
    ).where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
    return j.agg(
        (F.coalesce(_dsum(F.col("l_extendedprice")), F.lit(0.0)) / F.lit(7.0)).alias(
            "avg_yearly"
        )
    )


def _q_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate over a part join — the
    disjunction stays a single scan-side filter (no union of three
    scans); Catalyst extracts the common l_partkey=p_partkey
    conjunct as the join key."""
    p = read_table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    li = read_table(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11)
         & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30)
           & F.col("p_size").between(1, 15))
    )
    return j.where(cond).agg(
        F.coalesce(F.sum(_revenue()).cast("double"), F.lit(0.0)).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def _q_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order. The EXISTS / NOT EXISTS pair collapses into
    ONE per-order aggregate (distinct suppliers, distinct late
    suppliers, the late supplier id) — no correlated self-joins over
    the fact, so lineitem is scanned and shuffled once."""
    li = read_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = read_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
    )
    sole = per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    s = read_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        sole.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


def _q_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no recent orders —
    scalar subquery (positive-balance mean, exact decimal) broadcast as
    a filter + anti join against recent orders, grouped by nation."""
    c = read_table(spark, sf, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        _davg(F.col("c_acctbal")).alias("__avg")
    )
    recent = read_table(spark, sf, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = c.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("__avg"))
    idle = rich.join(recent, rich["c_custkey"] == recent["o_custkey"], "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        _dsum(F.col("c_acctbal")).alias("totacctbal"),
    )


def _q_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped inventory value exceeds
    1.2x the mean part value — a HAVING over a scalar subquery, made
    scale-invariant (the classic FRACTION threshold shrinks with part
    cardinality). Both the per-part values and the global mean come
    from ONE aggregate pass: the mean is the broadcast average of the
    tiny per-part frame, never a second fact scan."""
    li = read_table(spark, sf, "lineitem").select("l_partkey", "l_quantity")
    p = read_table(spark, sf, "part").select("p_partkey", "p_retailprice")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    value = _dec("p_retailprice") * _dec("l_quantity")
    per_part = j.groupBy("l_partkey").agg(
        F.sum(value.cast(DEC)).alias("__v")
    )
    total = per_part.agg(
        (F.sum("__v").cast("double") / F.count(F.lit(1))).alias("__m")
    )
    out = per_part.join(F.broadcast(total)).where(
        F.col("__v").cast("double") > F.lit(1.2) * F.col("__m")
    )
    return out.select(
        F.col("l_partkey").alias("p_partkey"),
        F.col("__v").cast("double").alias("part_value"),
    )


def _q_winnowing(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint profile over the corpus —
    operators/dedup.py:winnow_fingerprints (k=3-token grams, w=4
    windows, md5-portable gram ids, per-document window minima)."""
    from sensor_time_series_pyspark_spark.operators.dedup import winnow_fingerprints

    docs = read_table(spark, sf, "documents")
    out = winnow_fingerprints(docs, "doc_id", "text", k=3, w=4)
    return out.select(
        F.col("id"),
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_fingerprints"),
    )


def _q_chunk_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Chunk-level exact duplication share (CCNet paragraph-dedup
    signal) — operators/contamination.py:chunk_dup_share."""
    from sensor_time_series_pyspark_spark.operators.contamination import (
        chunk_dup_share,
    )

    docs = read_table(spark, sf, "documents")
    return chunk_dup_share(docs, "doc_id", "text", chunk_size=8)


def _q_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-first token-budget curation —
    operators/sampling.py:token_budget_select (score = n_chars,
    deterministic (score DESC, id) order, 20k-token budget)."""
    from sensor_time_series_pyspark_spark.operators.sampling import (
        token_budget_select,
    )

    docs = read_table(spark, sf, "documents").select(
        "doc_id", "n_chars", token_count("text").alias("n_tokens")
    )
    return token_budget_select(
        docs, "doc_id", "n_tokens", "n_chars", budget=20_000
    ).select("id", "n_tokens", F.col("score").alias("n_chars"), "cum_tokens")


def _q_mixture_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-mixture reweighting table (per-language token shares and
    equalizing weights) — operators/sampling.py:mixture_weights."""
    from sensor_time_series_pyspark_spark.operators.sampling import mixture_weights

    docs = read_table(spark, sf, "documents").select(
        "lang", token_count("text").alias("n_tokens")
    )
    return mixture_weights(docs, ["lang"], "n_tokens")


def _q_burst_users(spark: SparkSession, sf: str) -> DataFrame:
    """Burst/bot-rate screen: users with >= 8 events inside any
    trailing 24h window — operators/analytics.py:burst_detect
    (rangeBetween on epoch seconds, per-user sort only)."""
    from sensor_time_series_pyspark_spark.operators.analytics import burst_detect

    ev = read_table(spark, sf, "events")
    out = burst_detect(ev, "user_id", "ts", window_seconds=86400, min_events=8)
    return out.select(
        F.col("entity").alias("user_id"), "n_events", "max_burst"
    )


def _q_event_peaks(spark: SparkSession, sf: str) -> DataFrame:
    """Local maxima of the hourly event-count series per type —
    operators/analytics.py:local_peaks (one lag + one lead per series;
    integer counts so the comparison is exact)."""
    from sensor_time_series_pyspark_spark.operators.analytics import local_peaks

    ev = read_table(spark, sf, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    out = local_peaks(hourly, ["event_type"], "bucket", "n")
    return out.select(
        "event_type",
        F.col("ts").alias("bucket"),
        F.col("value").alias("n"),
        F.col("prev").alias("prev_n"),
        F.col("next").alias("next_n"),
    )


def _q_lag_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-correlation lag scan between the hourly click and
    purchase count series — operators/drift.py:lag_corr (map-side lag
    fan-out, ONE equi-join, exact-moment corr epilogue)."""
    from sensor_time_series_pyspark_spark.operators.drift import lag_corr

    ev = read_table(spark, sf, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    clicks = hourly.where(F.col("event_type") == "click").select("bucket", "n")
    buys = hourly.where(F.col("event_type") == "purchase").select("bucket", "n")
    return lag_corr(
        clicks, buys, "bucket", "n", max_lag=6, step_seconds=3600, decimals=0
    )


def _q_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """k-core of the part co-purchase graph (parts co-occurring in an
    order are adjacent; k=8) — operators/graph.py:kcore, iterative
    peeling with early exit. Iterative (no SQL oracle): gated by
    tests/test_round3c_ops.py clique/chain/star invariants."""
    from sensor_time_series_pyspark_spark.operators.graph import kcore

    li = read_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    a = li.withColumnRenamed("l_partkey", "pa")
    b = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb")
    )
    edges = (
        a.join(b, (a["l_orderkey"] == b["ok2"]) & (a["pa"] < b["pb"]))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    return kcore(edges, k=8).orderBy("node")


def _q_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization approximate top-k with ADC scan + exact
    re-rank — operators/similarity.py:pq_topk_cosine (rows-only:
    KMeans codebooks aren't SQL-expressible; recall vs exact pinned in
    tests/test_similarity.py)."""
    from sensor_time_series_pyspark_spark.operators.similarity import (
        pq_topk_cosine,
    )

    emb = read_table(spark, sf, "embeddings")
    qs = emb.where(F.col("vec_id") < 10)
    return pq_topk_cosine(
        emb, qs, "vec_id", "vec_id", "embedding", k=5, m=16, ks=16, oversample=8
    ).select("qid", "cid", "rank")


def _q_mann_kendall(spark: SparkSession, sf: str) -> DataFrame:
    """Mann-Kendall monotone-trend screen on daily event counts per
    type — operators/profile.py:mann_kendall (integer S statistic,
    one double division for tau)."""
    from sensor_time_series_pyspark_spark.operators.profile import mann_kendall

    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return mann_kendall(daily, ["event_type"], "d", "n_events")


def _q_theil_sen(spark: SparkSession, sf: str) -> DataFrame:
    """Theil-Sen robust slope of daily event counts per type —
    operators/profile.py:theil_sen (median of pairwise slopes,
    explicit index-selection median)."""
    from sensor_time_series_pyspark_spark.operators.profile import theil_sen

    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return theil_sen(daily, ["event_type"], "d", "n_events")


def _q_pattern_match(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence detection without a dedicated
    operator: each (user, day) journey collapses to an ordered
    event-initial string INSIDE one aggregate (q161's sorted-struct
    mechanism — no window sort over the fact), and the pattern
    'view … purchase' is a single JVM-side regexp. Output: per user,
    days observed and days whose journey matches."""
    ev = read_table(spark, sf, "events")
    keyed = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.struct(
            F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("i")
        ).alias("s"),
    )
    days = keyed.groupBy("user_id", "d").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s["i"]), ""
        ).alias("journey")
    )
    return days.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            F.when(F.col("journey").rlike("v.*p"), 1).otherwise(0)
        ).cast("bigint").alias("n_matched"),
    )


def _q_group_skewness(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type skewness of event values from exact integer power sums
    — operators/profile.py:group_skewness (the F.skewness twin with a
    portable sqrt-based epilogue, no pow(x,1.5))."""
    from sensor_time_series_pyspark_spark.operators.profile import group_skewness

    ev = read_table(spark, sf, "events")
    return group_skewness(ev, "value", ["event_type"], decimals=2)


def _q_phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    """Exact phrase search ('data stream') with per-doc occurrence
    counts — pure array algebra over token positions (no explode, no
    join: the position scan runs map-side inside whole-stage codegen;
    the inverted-index scale path is q111's posting lists keyed by the
    phrase's rarest term)."""
    docs = read_table(spark, sf, "documents")
    t = tokens("text")
    base = docs.select(F.col("doc_id"), t.alias("__t"))
    n = F.size("__t")
    # guard keeps every element_at index in bounds under ANSI mode
    hits = F.when(
        n >= 2,
        F.size(
            F.filter(
                F.sequence(F.lit(1), n - 1),
                lambda i: (F.element_at("__t", i) == "data")
                & (F.element_at("__t", i + 1) == "stream"),
            )
        ),
    ).otherwise(0)
    return base.select("doc_id", hits.alias("n_occurrences")).where(
        F.col("n_occurrences") >= 1
    )


def _q_fpgrowth_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """MLlib FPGrowth frequent itemsets (brand baskets per order),
    size <= 2, minSupport 2% — ml/pipelines.py:fpgrowth_itemsets. The
    FP-tree counts are exact, so plain SQL basket counts ARE the
    oracle."""
    from sensor_time_series_pyspark_spark.ml.pipelines import fpgrowth_itemsets

    li = read_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    p = read_table(spark, sf, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("items"))
    )
    return fpgrowth_itemsets(baskets, "items", min_support=0.02, max_size=2)


def _q_als_recs(spark: SparkSession, sf: str) -> DataFrame:
    """ALS collaborative filtering (customer x brand purchase counts),
    top-3 recommendations per user — seeded MLlib ALS (rows-only:
    factorization isn't SQL-expressible; shape/metric invariants in
    tests/test_round3c_ops.py)."""
    from pyspark.ml.recommendation import ALS

    li = read_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    o = read_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    p = read_table(spark, sf, "part").select("p_partkey", "p_brand")
    ratings = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.abs(F.hash("p_brand")).alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
    )
    als = ALS(
        rank=8, maxIter=5, seed=42, userCol="user", itemCol="item",
        ratingCol="rating", implicitPrefs=True, coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    recs = model.recommendForAllUsers(3)
    return recs.select(
        "user", F.posexplode("recommendations").alias("rank0", "rec")
    ).select(
        F.col("user").alias("custkey"),
        (F.col("rank0") + 1).alias("rank"),
        F.col("rec.item").alias("item"),
    )


def _q_moment_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact mergeable moments: per-(type, day) partials rolled up to
    per-type mean/variance/stddev WITHOUT rescanning the fact —
    operators/profile.py:moment_partials/moment_rollup. The oracle
    computes straight from the facts; equality IS the merge proof."""
    from sensor_time_series_pyspark_spark.operators.profile import (
        moment_partials,
        moment_rollup,
    )

    ev = read_table(spark, sf, "events")
    parts = moment_partials(
        ev.withColumn("d", F.date_trunc("day", F.col("ts"))),
        ["event_type", "d"],
        "value",
        decimals=2,
    )
    return moment_rollup(parts, ["event_type"], decimals=2)


def _q_ks_test(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample KS statistic (click vs error value distributions) —
    operators/profile.py:ks_statistic (integer prefix-count numerator,
    one division)."""
    from sensor_time_series_pyspark_spark.operators.profile import ks_statistic

    ev = read_table(spark, sf, "events")
    return ks_statistic(ev, "event_type", "value", "click", "error")


def _q_auc(spark: SparkSession, sf: str) -> DataFrame:
    """ROC AUC of activity level predicting conversion (rank-sum
    identity, tie-correct, integer-exact) —
    operators/profile.py:auc_score."""
    from sensor_time_series_pyspark_spark.operators.profile import auc_score

    ev = read_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("activity"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return auc_score(per_user, "converted", "activity")


def _q_open_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Concurrent-interval counting (order backlog over time): +1 at
    order date, −1 the day after the last shipment, ONE running sum
    over the per-day delta frame — the interval-overlap counter
    without any point-in-interval join (which would be O(days×orders)).
    The window runs over the day-cardinality delta frame only."""
    o = read_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = read_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    closed = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_ts"))
    spans = o.join(closed, F.col("o_orderkey") == F.col("l_orderkey"))
    deltas = spans.select(
        F.date_trunc("day", F.col("o_orderdate")).alias("d"), F.lit(1).alias("delta")
    ).unionAll(
        spans.select(
            F.date_add(F.to_date("close_ts"), 1).cast("timestamp").alias("d"),
            F.lit(-1).alias("delta"),
        )
    )
    per_day = deltas.groupBy("d").agg(F.sum("delta").cast("bigint").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "d", "net", F.sum("net").over(w).alias("open_orders")
    )


def _q_new_vs_returning(spark: SparkSession, sf: str) -> DataFrame:
    """New-vs-returning split per month: the first-seen reduction
    (ONE min aggregate per customer) broadcast back onto the monthly
    order frame — no per-month distinct self-joins."""
    o = read_table(spark, sf, "orders").select("o_custkey", "o_orderdate")
    first_seen = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("first_month")
    )
    monthly = o.select(
        "o_custkey", F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).distinct()
    j = monthly.join(first_seen, "o_custkey")
    return j.groupBy("m").agg(
        F.sum(F.when(F.col("m") == F.col("first_month"), 1).otherwise(0))
        .cast("bigint")
        .alias("new_customers"),
        F.sum(F.when(F.col("m") == F.col("first_month"), 0).otherwise(1))
        .cast("bigint")
        .alias("returning_customers"),
    )


def _q_seasonal_strength(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal-strength diagnostic per event type: F_s = 1 −
    Var(residual)/Var(value), where the seasonal fit is the (dow, hour)
    calendar mean (q142's profile). Variances come from the SAME exact
    integer-moment mechanism as exact_corr; residual sums reuse the
    identity Σ(x−μ_g)² grouped via per-cell moments, so the fact is
    scanned ONCE and everything downstream is cell-cardinality."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    xi = (F.col("value").cast("decimal(18,2)") * 100).cast("decimal(19,0)")
    d38 = "decimal(38,0)"
    cells = ev.where(F.col("value") >= 0).select(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hod"),
        xi.alias("__xi"),
    ).groupBy("event_type", "dow", "hod").agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum(F.col("__xi").cast(d38)).alias("cs1"),
        F.sum((F.col("__xi") * F.col("__xi")).cast(d38)).alias("cs2"),
    )
    # Per-cell means are rounded ONCE to 6 extra digits by integer
    # floor-division (engine-portable for the non-negative values this
    # query filters to), and the residual sum of squares stays an
    # EXACT integer at scale 1e12: Σ(x−μ)² = Σx²·1e12 − 2μ·Σx·1e6 +
    # n·μ². Summing per-cell doubles would be order-dependent; this
    # accumulates decimals — the tfidf round-once pattern.
    def _rss(s1_col: str, s2_col: str, n_col: str) -> F.Column:
        # Σ(x−μ)² at scale 1e12, μ floor-divided once at scale 1e6:
        # s2·1e12 − 2·μ·s1·1e6 + n·μ² — every factor-pair stays inside
        # decimal(38) (bounds in SCALING.md)
        mu = F.expr(f"CAST({s1_col} AS BIGINT) * 1000000 div {n_col}")
        mud = mu.cast("decimal(19,0)")
        return (
            F.col(s2_col) * F.lit(10 ** 12).cast("decimal(13,0)")
            - F.lit(2).cast("decimal(2,0)") * mud
            * (F.col(s1_col) * F.lit(10 ** 6).cast("decimal(7,0)")).cast("decimal(27,0)")
            + F.col(n_col).cast("decimal(12,0)") * (mud * mud).cast("decimal(25,0)")
        )

    per_type = cells.groupBy("event_type").agg(
        F.sum("cn").alias("n"),
        F.sum("cs1").alias("s1"),
        F.sum("cs2").alias("s2"),
        F.sum(_rss("cs1", "cs2", "cn").cast(d38)).alias("ssr_s"),
    )
    sst_s = _rss("s1", "s2", "n")
    strength = F.greatest(
        F.lit(0.0),
        F.lit(1.0) - F.col("ssr_s").cast("double") / sst_s.cast("double"),
    )
    return per_type.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.when(sst_s.cast("double") > 0, strength).alias("seasonal_strength"),
    )


def _q_link_prediction(spark: SparkSession, sf: str) -> DataFrame:
    """Neighbor-set Jaccard link prediction on the brand co-purchase
    graph: common neighbors via ONE two-hop join through the shared
    endpoint, degrees from one aggregate, jaccard = c/(da+db−c) —
    integer counts, one division. Candidate pairs are generated only
    through shared neighbors (never all-pairs)."""
    li = read_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    p = read_table(spark, sf, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    # brand graph: brands co-occurring in an order
    e = (
        ob.alias("x")
        .join(ob.alias("y"), "o")
        .select(F.col("x.b").alias("a"), F.col("y.b").alias("b"))
        .where(F.col("a") < F.col("b"))
        .distinct()
    )
    both = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    # common neighbors: a–x and b–x
    common = (
        both.select(F.col("a").alias("u"), F.col("b").alias("x"))
        .join(both.select(F.col("a").alias("v"), F.col("b").alias("x2")),
              F.col("x") == F.col("x2"))
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(deg.select(F.col("a").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("a").alias("v"), F.col("d").alias("dv")), "v")
    )
    return out.select(
        "u",
        "v",
        "common",
        (
            F.col("common").cast("double")
            / (F.col("du") + F.col("dv") - F.col("common")).cast("double")
        ).alias("jaccard"),
    ).where(F.col("common") >= 3)


def _q_share_of_parent(spark: SparkSession, sf: str) -> DataFrame:
    """ratio_to_report OLAP shape: each nation's revenue share within
    its region — window totals over the AGGREGATED nation frame only
    (the fact contributes one hash aggregate; the share division is
    group-cardinality work)."""
    li = read_table(spark, sf, "lineitem")
    s = read_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = read_table(spark, sf, "nation")
    r = read_table(spark, sf, "region")
    dim = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "n_name", "r_name")
    )
    agg = (
        li.join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(_revenue()).alias("__rev"))
    )
    wreg = Window.partitionBy("r_name")
    return agg.select(
        "r_name",
        "n_name",
        F.col("__rev").cast("double").alias("revenue"),
        (
            F.col("__rev").cast("double")
            / F.sum("__rev").over(wreg).cast("double")
        ).alias("region_share"),
    )


def _q_pseudonymize(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic PII tokenization: customer keys replaced by
    salted sha256 tokens — referential integrity preserved (the same
    key always maps to the same token, so joins still work on the
    pseudonymized tables), irreversible without the salt. Map-side
    only; sha2 is standardized so any engine derives identical tokens
    (cross-system reproducibility is the point of deterministic
    tokenization)."""
    c = read_table(spark, sf, "customer")
    token = F.sha2(F.concat(F.lit("pepper-v1:"), F.col("c_custkey").cast("string")), 256)
    return c.select(
        token.alias("cust_token"),
        "c_mktsegment",
        F.col("c_nationkey"),
        (F.col("c_acctbal") >= 0).alias("in_good_standing"),
    )


def _q_record_linkage(spark: SparkSession, sf: str) -> DataFrame:
    """Record-linkage scoring (Fellegi-Sunter shape): a synthesized
    dirty registry (names with injected typos — built identically in
    both engines, the q79 convention) is matched against customers.
    Blocking on nation key bounds candidates (never all-pairs);
    per-pair agreement features (exact nation, levenshtein<=2 on name,
    |acctbal| within 10) combine into an integer match score —
    levenshtein is algorithmically fixed, so the score is portable."""
    c = read_table(spark, sf, "customer")
    # dirty twin: drop the 'Customer#' prefix's last zero-run digit and
    # append a checksum-ish suffix — a deterministic "typo"
    dirty = c.select(
        F.col("c_custkey").alias("d_key"),
        F.concat(
            F.lit("Custmer#"), F.lpad((F.col("c_custkey") % 100000).cast("string"), 9, "0")
        ).alias("d_name"),
        F.col("c_nationkey").alias("d_nation"),
        (F.col("c_acctbal") + ((F.col("c_custkey") % 21) - 10)).alias("d_bal"),
    )
    cand = c.join(dirty, c["c_nationkey"] == dirty["d_nation"])
    lev = F.levenshtein(F.col("c_name"), F.col("d_name"))
    score = (
        F.when(lev <= 2, 2).otherwise(0)
        + F.when(F.abs(F.col("c_acctbal") - F.col("d_bal")) <= 10.0, 1).otherwise(0)
    )
    pairs = cand.select(
        "c_custkey",
        "d_key",
        lev.alias("name_dist"),
        score.alias("match_score"),
    ).where(F.col("match_score") >= 3)
    return pairs


def _q_geo_binning(spark: SparkSession, sf: str) -> DataFrame:
    """Spatial grid binning (the reference's geo bounding filter P4
    generalized): synthetic lat/lon derived from md5 of the event id —
    engine-identical, the q79 synthesized-input convention — bucketed
    into 10-degree grid cells; per-cell event counts and exact mean
    value. The grid key is integer floor division (map-side); cells
    aggregate in one shuffle."""
    ev = read_table(spark, sf, "events")
    h1 = F.conv(F.substring(F.md5(F.concat(F.lit("lat:"), F.col("event_id").cast("string"))), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(F.concat(F.lit("lon:"), F.col("event_id").cast("string"))), 1, 8), 16, 10).cast("long")
    lat_cell = ((h1 % 180) - 90) / F.lit(10)
    lon_cell = ((h2 % 360) - 180) / F.lit(10)
    keyed = ev.select(
        F.floor(lat_cell).cast("int").alias("lat_cell"),
        F.floor(lon_cell).cast("int").alias("lon_cell"),
        "value",
    )
    return keyed.groupBy("lat_cell", "lon_cell").agg(
        F.count(F.lit(1)).alias("n"),
        _davg(F.col("value")).alias("avg_value"),
    )


def _q_daily_bands(spark: SparkSession, sf: str) -> DataFrame:
    """Daily p10/p50/p90 bands of the hourly event-count series per
    type — exact percentiles over integer counts (q60's interpolation
    parity), computed on the hour-cardinality aggregate, never the
    fact."""
    ev = read_table(spark, sf, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.date_trunc("hour", F.col("ts")).alias("h"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return hourly.groupBy("event_type", "d").agg(
        F.percentile("n", F.lit(0.1)).alias("p10"),
        F.median("n").alias("p50"),
        F.percentile("n", F.lit(0.9)).alias("p90"),
        F.count(F.lit(1)).alias("n_hours"),
    )


def _q_bounce_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Session bounce rate per day: share of 30-minute-gap sessions
    with exactly one event — composes sessionize's gap logic at the
    (user, session) grain, then a day-cardinality rollup."""
    ev = read_table(spark, sf, "events")
    sess = sessionize(ev, "ts", ["user_id"], 1800)
    per_session = sess.groupBy("user_id", "session_seq").agg(
        F.date_trunc("day", F.min("ts")).alias("d"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_session.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
    ).select(
        "d",
        "n_sessions",
        "n_bounces",
        (
            F.col("n_bounces").cast("double")
            / F.col("n_sessions").cast("double")
        ).alias("bounce_rate"),
    )


def _q_tokenizer_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer fertility per language: subword-proxy tokens per word
    and characters per subword token — integer sums, one division each
    (the multilingual tokenizer-efficiency diagnostic)."""
    docs = read_table(spark, sf, "documents")
    base = docs.select(
        "lang",
        token_count("text").alias("__w"),
        bpe_ish_token_count("text").alias("__bt"),
        F.length("text").alias("__c"),
    )
    agg = base.groupBy("lang").agg(
        F.sum("__w").cast("bigint").alias("words"),
        F.sum("__bt").cast("bigint").alias("subword_tokens"),
        F.sum("__c").cast("bigint").alias("chars"),
    )
    return agg.select(
        "lang",
        "words",
        "subword_tokens",
        "chars",
        (
            F.col("subword_tokens").cast("double") / F.col("words").cast("double")
        ).alias("fertility"),
        (
            F.col("chars").cast("double") / F.col("subword_tokens").cast("double")
        ).alias("chars_per_token"),
    )


def _q_repeat_share(spark: SparkSession, sf: str) -> DataFrame:
    """Compression sizing for delta/RLE encoding: per series (user),
    the share of zero-delta (repeated) and small-delta readings —
    operators/compress.py:delta_encode feeding one integer aggregate
    (the decision input for deadband/delta historian compression)."""
    from sensor_time_series_pyspark_spark.operators.compress import delta_encode

    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    enc = delta_encode(ev, ["user_id"], "ts", "value", decimals=2)
    body = enc.where(~F.col("is_first"))
    return body.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_deltas"),
        F.sum(F.when(F.col("delta") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_repeats"),
        F.sum(F.when(F.abs(F.col("delta")) <= 100, 1).otherwise(0))
        .cast("bigint")
        .alias("n_small"),
    ).select(
        "user_id",
        "n_deltas",
        "n_repeats",
        "n_small",
        (
            F.col("n_small").cast("double") / F.col("n_deltas").cast("double")
        ).alias("compressible_share"),
    )


def _q_hierarchy_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive-hierarchy subtree rollup WITHOUT recursion: the
    synthetic org tree parent(k)=k div 10 has closed-form ancestors
    (k div 10^i), so the transitive closure is a map-side fan-out of
    <= 8 (node, ancestor) rows per node — no iterative joins, no
    recursive CTE on the Spark side (the DuckDB oracle uses one; the
    equality shows the closure is complete). One aggregate sums each
    subtree. The general-graph path is bfs_hops/q151; this is the
    classic fixed-fanout hierarchy shortcut (BOM levels, org codes,
    geo cells)."""
    c = read_table(spark, sf, "customer")
    ancs = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.floor(
                F.col("c_custkey") / F.pow(F.lit(10.0), i.cast("double"))
            ).cast("bigint"),
        )
    )
    pairs = c.select(
        F.col("c_acctbal"), F.explode(ancs).alias("ancestor")
    )
    return pairs.groupBy("ancestor").agg(
        F.count(F.lit(1)).alias("n_desc"),
        _dsum(F.col("c_acctbal")).alias("subtree_bal"),
    ).where(F.col("n_desc") >= 2)


def _q_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit: quasi-identifier combinations (nation,
    segment, balance decile) re-identifying fewer than k=5 customers —
    the release-gate check for pseudonymized data (q206's complement:
    tokenization hides direct ids; this measures what the REMAINING
    columns leak). ntile over the customer frame with a deterministic
    tiebreak; one aggregate; violating combos only."""
    c = read_table(spark, sf, "customer")
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    binned = c.select(
        "c_nationkey", "c_mktsegment", F.ntile(10).over(w).alias("bal_decile")
    )
    groups = binned.groupBy("c_nationkey", "c_mktsegment", "bal_decile").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return groups.where(F.col("group_size") < 5)


def _q_segment_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """N-way audience overlap (the Venn-diagram rollup): each user
    collapses to ONE integer bitmask of behaviors (click=1, view=2,
    purchase=4) via conditional max — then one tiny aggregate counts
    every segment combination. The bitmask pattern replaces 2^N−1
    intersection queries (or N-way theta-sketch algebra, q132) with
    one pass over the fact."""
    ev = read_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
            + F.max(F.when(F.col("event_type") == "view", 2).otherwise(0))
            + F.max(F.when(F.col("event_type") == "purchase", 4).otherwise(0))
        ).alias("segment_mask")
    )
    return per_user.groupBy("segment_mask").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def _q_scd2_temporal_join(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal (point-in-interval) join against an SCD2 dimension:
    each purchase joined to the user-state version valid immediately
    BEFORE it — 'what state was the customer in when they converted'
    (the state valid AT a purchase is trivially the purchase's own
    version, since the dimension derives from the same stream). Probe:
    valid_from < ts <= valid_to; first-ever purchases have no prior
    version and drop out of the inner join (documented). At scale the
    equi-key (user) carries the join; the interval predicate is a
    residual filter, never a nested loop. Dimension is q63's SCD2
    build."""
    from sensor_time_series_pyspark_spark.operators import scd2

    ev = read_table(spark, sf, "events")
    dim = scd2(ev, ["user_id"], "ts", ["event_type"]).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    j = purchases.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts") > F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") <= F.col("valid_to"))),
    )
    return j.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _q_join_key_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Join-key skew diagnosis — the 'does this key need salting /
    AQE skew-join' advisor run before any big fact-fact join: per
    candidate key, distinct-key count, max single-key share, and the
    hot-key-to-median ratio. One aggregate to the key-frequency frame;
    every statistic after that is key-cardinality work (exact median
    via the q60 percentile mechanism over integer counts)."""
    li = read_table(spark, sf, "lineitem")
    freqs = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = freqs.agg(
        F.lit("l_partkey").alias("join_key"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.median("n").alias("median_key_rows"),
    )
    freqs2 = li.groupBy(F.col("l_suppkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats2 = freqs2.agg(
        F.lit("l_suppkey").alias("join_key"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.median("n").alias("median_key_rows"),
    )
    both = stats.unionByName(stats2)
    return both.select(
        "join_key",
        "n_keys",
        "n_rows",
        "max_key_rows",
        "median_key_rows",
        (
            F.col("max_key_rows").cast("double") / F.col("n_rows").cast("double")
        ).alias("max_share"),
        (
            F.col("max_key_rows").cast("double") / F.col("median_key_rows")
        ).alias("skew_ratio"),
    )


def _q_orphan_check(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity audit across every fact foreign key —
    orphaned row counts via conditional aggregates over broadcast
    left joins (the valid-key sets are dim-sized; the fact scans
    once per fact table, never per key). The standard pipeline gate
    before publishing a star schema."""
    li = read_table(spark, sf, "lineitem")
    o = read_table(spark, sf, "orders")
    c = read_table(spark, sf, "customer").select("c_custkey")
    p = read_table(spark, sf, "part").select("p_partkey")
    s = read_table(spark, sf, "supplier").select("s_suppkey")
    ok = o.select("o_orderkey")
    li_j = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(F.broadcast(ok), F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"), "left")
    )
    li_stats = li_j.agg(
        F.lit("lineitem").alias("fact"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("orphan_orderkey"),
        F.sum(F.when(F.col("p_partkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("orphan_partkey"),
        F.sum(F.when(F.col("s_suppkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("orphan_suppkey"),
    )
    o_j = o.select("o_custkey").join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"), "left"
    )
    o_stats = o_j.agg(
        F.lit("orders").alias("fact"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("orphan_orderkey"),
        F.lit(0).cast("bigint").alias("orphan_partkey"),
        F.lit(0).cast("bigint").alias("orphan_suppkey"),
    )
    return li_stats.unionByName(o_stats)


def _q_class_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    """Exact minority-class upsampling by integer replication: each
    label's rows replicate floor(max_class/n_class) times (explode of a
    sequence — map-side row fan-out, no RNG, rerun-stable). The
    output label histogram shows near-parity. The classic imbalanced-
    training-set fix expressed as pure column algebra; fractional
    remainders are left to hash_sample (documented), keeping this step
    deterministic."""
    emb = read_table(spark, sf, "embeddings")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    mx = counts.agg(F.max("n").alias("mx"))
    factors = counts.join(F.broadcast(mx)).select(
        "label", F.floor(F.col("mx") / F.col("n")).cast("int").alias("factor")
    )
    rebalanced = (
        emb.join(F.broadcast(factors), "label")
        .select(
            "label",
            "vec_id",
            F.explode(F.sequence(F.lit(1), F.col("factor"))).alias("copy_no"),
        )
    )
    return rebalanced.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_after"),
        F.countDistinct("vec_id").alias("n_unique"),
    )


def _q_negative_samples(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor draws 3 pseudo-random partners via md5(anchor||j) mod N —
    no RNG state, identical on every engine and every rerun (the
    hash-sampling convention), self-pairs skipped by a +1 shift. The
    partner ids join back to the corpus to prove existence; at scale
    this is a map-side id computation + one equi-join on the id (ids
    here are dense 0..N-1; for sparse ids route through a row_number
    rank frame first — documented)."""
    emb = read_table(spark, sf, "embeddings").select("vec_id", "label")
    n = emb.count()
    js = F.explode(F.sequence(F.lit(1), F.lit(3))).alias("j")
    base = emb.select("vec_id", js)
    raw = F.conv(
        F.substring(
            F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":"), F.col("j"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") % F.lit(n - 1)
    # shift past the anchor so neg != anchor, staying in [0, n)
    neg = F.when(raw >= F.col("vec_id"), raw + 1).otherwise(raw)
    pairs = base.select("vec_id", "j", neg.alias("neg_id"))
    other = emb.select(
        F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label")
    )
    anchor = emb.select(F.col("vec_id"), F.col("label").alias("anchor_label"))
    j1 = pairs.join(anchor, "vec_id").join(other, "neg_id")
    return j1.groupBy("anchor_label").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.when(F.col("anchor_label") == F.col("neg_label"), 1).otherwise(0)
        ).cast("bigint").alias("n_same_label"),
    )


def _q_boolean_search(spark: SparkSession, sf: str) -> DataFrame:
    """Boolean search over the inverted index: docs containing ALL of
    {'data','stream'} and NONE of {'slow'} — posting-list intersection
    as one (doc, matched-term) aggregate HAVING count = n_terms, the
    negation as an anti join against the excluded term's postings.
    The fan-out is bounded by the query terms' document frequencies
    (q111's posting lists are the persisted form at scale), never a
    corpus scan per term."""
    docs = read_table(spark, sf, "documents")
    postings = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("term")
    )
    must = postings.where(F.col("term").isin("data", "stream"))
    hit_all = (
        must.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("n_hit"))
        .where(F.col("n_hit") == 2)
        .select("doc_id")
    )
    excluded = postings.where(F.col("term") == "slow").select("doc_id").distinct()
    matched = hit_all.join(excluded, "doc_id", "left_anti")
    return matched.join(
        docs.select("doc_id", "lang", "source"), "doc_id"
    ).select("doc_id", "lang", "source")


def _q_did(spark: SparkSession, sf: str) -> DataFrame:
    """Difference-in-differences: treatment arms from the md5
    hash_split convention (reproducible assignment), pre/post split at
    mid-window, DiD = (T_post−T_pre) − (C_post−C_pre) on exact decimal
    means — ONE conditional aggregate over the fact, four divisions in
    a fixed epilogue. The standard quasi-experimental readout."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    arm = F.when(
        F.substring(F.md5(F.concat(F.lit("exp2"), F.col("user_id").cast("string"))), 1, 8)
        < "80000000",
        "t",
    ).otherwise("c")
    post = F.col("ts") >= F.lit("2024-01-16").cast("timestamp")
    keyed = ev.select(arm.alias("arm"), post.alias("post"), "value")

    def cell(a: str, p: bool) -> F.Column:
        cond = (F.col("arm") == a) & (F.col("post") == F.lit(p))
        return (
            F.sum(F.when(cond, F.col("value").cast(DEC))).cast("double")
            / F.sum(F.when(cond, 1).otherwise(0))
        )

    agg = keyed.agg(
        F.count(F.lit(1)).alias("n_events"),
        cell("t", False).alias("t_pre"),
        cell("t", True).alias("t_post"),
        cell("c", False).alias("c_pre"),
        cell("c", True).alias("c_post"),
    )
    return agg.select(
        "n_events",
        "t_pre",
        "t_post",
        "c_pre",
        "c_post",
        (
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre"))
        ).alias("did"),
    )


def _q_kpi_decomposition(spark: SparkSession, sf: str) -> DataFrame:
    """KPI driver decomposition: month-over-month revenue change split
    into an order-count effect and an order-value (AOV) effect via the
    exact identity ΔR = ΔN·AOV₀ + N₁·ΔAOV (N₁ form makes the two
    terms sum to ΔR exactly in IEEE — verified by construction since
    ΔR−term1−term2 algebraically cancels with these operand choices).
    All sums exact decimals; divisions and products in one fixed
    epilogue on the two-row month frame."""
    o = read_table(spark, sf, "orders")
    monthly = o.where(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    ).where(F.col("o_orderdate") < F.lit("1997-03-01").cast("timestamp")).groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("revenue"),
    )
    w = Window.orderBy("m")
    cur = monthly.select(
        "m",
        "n_orders",
        "revenue",
        F.lag("n_orders").over(w).alias("n0"),
        F.lag("revenue").over(w).alias("r0"),
    ).where(F.col("n0").isNotNull())
    aov0 = F.col("r0") / F.col("n0")
    aov1 = F.col("revenue") / F.col("n_orders")
    return cur.select(
        "m",
        "n_orders",
        "revenue",
        (F.col("revenue") - F.col("r0")).alias("delta_revenue"),
        ((F.col("n_orders") - F.col("n0")).cast("double") * aov0).alias(
            "volume_effect"
        ),
        (F.col("n_orders").cast("double") * (aov1 - aov0)).alias("value_effect"),
    )


def _q_availability(spark: SparkSession, sf: str) -> DataFrame:
    """Heartbeat availability SLA per entity: downtime = sum of
    inter-event gaps exceeding the 2-hour heartbeat tolerance (minus
    the tolerance itself — the sensor was only provably down past it);
    availability = 1 − downtime/span. One lag pass, integer-second
    arithmetic, one division — the fleet-health readout for the
    reference's field terminals."""
    ev = read_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    tol = 7200
    gaps = ev.select(
        "user_id",
        "ts",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap"),
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))
        ).alias("span_s"),
        F.sum(
            F.when(F.col("gap") > tol, F.col("gap") - tol).otherwise(0)
        ).cast("bigint").alias("downtime_s"),
    )
    return agg.where(F.col("span_s") > 0).select(
        "user_id",
        "n_events",
        "span_s",
        "downtime_s",
        (
            F.lit(1.0)
            - F.col("downtime_s").cast("double") / F.col("span_s").cast("double")
        ).alias("availability"),
    )


def _q_stemmed_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """Light suffix-strip stemming as pure column algebra (regexp
    chain: ing→'', ed→'', trailing s→'' with 3+-char stems) and its
    vocabulary-compression effect per language — the normalization
    step before vocabulary statistics, kept deliberately rule-based so
    any engine reproduces it (no locale/snowball dependence)."""
    docs = read_table(spark, sf, "documents")
    toks = docs.select(
        "lang", F.explode(tokens("text")).alias("w")
    )
    stem = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("w"), "^([a-z]{3,})ing$", "$1"),
            "^([a-z]{3,})ed$",
            "$1",
        ),
        "^([a-z]{2,})s$",
        "$1",
    )
    both = toks.select("lang", "w", stem.alias("stem"))
    return both.groupBy("lang").agg(
        F.countDistinct("w").alias("vocab_raw"),
        F.countDistinct("stem").alias("vocab_stemmed"),
        F.count(F.lit(1)).alias("n_tokens"),
    ).select(
        "lang",
        "vocab_raw",
        "vocab_stemmed",
        "n_tokens",
        (
            F.col("vocab_stemmed").cast("double")
            / F.col("vocab_raw").cast("double")
        ).alias("compression"),
    )


def _q_burn_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Multiwindow SLO burn rate (the SRE alerting rule): error-event
    share over the trailing 1h and 6h windows (anchored at the
    dataset's max ts — deterministic), each divided by a 5% error
    budget. Alert when BOTH windows burn >1× — the standard
    fast+slow-window combination that filters blips without missing
    sustained burns. One conditional aggregate; the anchor is a 1-row
    broadcast scalar."""
    ev = read_table(spark, sf, "events")
    anchor = ev.agg(F.max("ts").alias("__a"))
    j = ev.crossJoin(F.broadcast(anchor))
    in1h = F.col("ts") >= F.col("__a") - F.expr("INTERVAL 1 HOUR")
    in6h = F.col("ts") >= F.col("__a") - F.expr("INTERVAL 6 HOURS")
    err = F.col("event_type") == "error"
    agg = j.agg(
        F.sum(F.when(in1h, 1).otherwise(0)).cast("bigint").alias("n_1h"),
        F.sum(F.when(in1h & err, 1).otherwise(0)).cast("bigint").alias("err_1h"),
        F.sum(F.when(in6h, 1).otherwise(0)).cast("bigint").alias("n_6h"),
        F.sum(F.when(in6h & err, 1).otherwise(0)).cast("bigint").alias("err_6h"),
    )
    burn1 = (F.col("err_1h").cast("double") / F.col("n_1h").cast("double")) / F.lit(0.05)
    burn6 = (F.col("err_6h").cast("double") / F.col("n_6h").cast("double")) / F.lit(0.05)
    return agg.select(
        "n_1h",
        "err_1h",
        "n_6h",
        "err_6h",
        burn1.alias("burn_1h"),
        burn6.alias("burn_6h"),
        ((burn1 > 1.0) & (burn6 > 1.0)).alias("alert"),
    )


def _q_simpsons(spark: SparkSession, sf: str) -> DataFrame:
    """Simpson's-paradox screen on the discount→quantity relationship:
    per-brand Pearson correlations vs the pooled correlation, counting
    brands whose sign disagrees with the aggregate — the classic
    confounding diagnostic. ONE fact scan produces per-brand integer
    moments (exact_corr's mechanism); the pooled moments are the SUM
    of the brand moments (order-free decimals), so the comparison
    costs nothing extra. Output: one row."""
    li = read_table(spark, sf, "lineitem")
    p = read_table(spark, sf, "part").select("p_partkey", "p_brand")
    xi = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("decimal(19,0)")
    yi = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("decimal(19,0)")
    d38 = "decimal(38,0)"
    g = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("p_brand").alias("b"), xi.alias("x"), yi.alias("y"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast(d38)).alias("sx"),
            F.sum(F.col("y").cast(d38)).alias("sy"),
            F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast(d38)).alias("syy"),
            F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
        )
    )

    def corr_of(prefix: F.Column | None = None):
        nd = F.col("n").cast("decimal(12,0)")
        cov = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        vx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        vy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
        den = F.sqrt(vx) * F.sqrt(vy)
        return F.when(den > 0, cov / den)

    per_brand = g.select("b", corr_of().alias("corr"))
    pooled = g.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("syy").alias("syy"),
        F.sum("sxy").alias("sxy"),
    ).select(corr_of().alias("overall_corr"))
    counts = per_brand.crossJoin(F.broadcast(pooled)).agg(
        F.first("overall_corr").alias("overall_corr"),
        F.count("corr").alias("n_brands"),
        F.sum(
            F.when(
                F.col("corr").isNotNull()
                & (
                    F.signum("corr") != F.signum("overall_corr")
                ),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_opposite_sign"),
    )
    return counts.select(
        "overall_corr",
        "n_brands",
        "n_opposite_sign",
        (
            F.col("n_opposite_sign").cast("double")
            / F.col("n_brands").cast("double")
        ).alias("opposite_share"),
    )


def _q_feature_table(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time feature-table build (the feature-store batch
    job): per (user, day) — activity count, lag-1 and lag-7 counts,
    7-day rolling mean, day-of-week — ONE aggregate to the entity-day
    grain then ONE window pass computing every lag/rolling feature
    (shared sort; no per-feature scans). All features at day d use
    only data ≤ d (leakage-free by construction: lags and a trailing
    frame)."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("user_id").orderBy("d")
    wroll = w.rowsBetween(-6, 0)
    return daily.select(
        "user_id",
        "d",
        "n_events",
        F.lag("n_events", 1).over(w).alias("lag1"),
        F.lag("n_events", 7).over(w).alias("lag7"),
        (
            F.sum("n_events").over(wroll).cast("double")
            / F.count(F.lit(1)).over(wroll)
        ).alias("rolling7_mean"),
        F.dayofweek("d").alias("dow"),
    )


def _q_calendar_spine(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-spine reporting: every (day × event type) cell emitted
    even when empty (zero-filled) — the dashboard contract that a
    groupBy alone can't honor. The spine is sequence()-generated from
    the data's own min/max day (two scalar aggregates broadcast; the
    spine frame is days×types — report-cardinality, never fact-sized)
    and the fact joins it ONCE. Complements q113's per-entity LOCF
    densify (zeros here, carry-forward there)."""
    ev = read_table(spark, sf, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    days = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("d")
    )
    types = ev.select(F.col("event_type").alias("et")).distinct()
    spine = days.crossJoin(types)
    counts = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.col("event_type").alias("et"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return spine.join(counts, ["d", "et"], "left").select(
        "d",
        F.col("et").alias("event_type"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
    )


def _q_dup_rate_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source duplication diagnostics: exact-duplicate share and
    the duplicate factor (rows per distinct text) — the first corpus
    health number a curation run reports, sliced by provenance. One
    aggregate on (source, text-hash), rollup on the group frame."""
    docs = read_table(spark, sf, "documents")
    groups = docs.groupBy("source", F.md5("text").alias("fp")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return groups.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("n") - 1).cast("bigint").alias("n_dup_rows"),
    ).select(
        "source",
        "n_docs",
        "n_distinct",
        "n_dup_rows",
        (F.col("n_docs").cast("double") / F.col("n_distinct").cast("double")).alias(
            "dup_factor"
        ),
    )


def _q_shipping_aging(spark: SparkSession, sf: str) -> DataFrame:
    """Order-to-ship aging percentiles by priority: exact integer day
    diffs, median/p90 via the q60 interpolation-parity mechanism over
    the per-priority frames — the fulfillment-SLA readout."""
    o = read_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = read_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship")
    )
    j = o.join(first_ship, F.col("o_orderkey") == F.col("l_orderkey"))
    days = F.datediff(F.col("first_ship"), F.col("o_orderdate"))
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.median(days).alias("median_days"),
        F.percentile(days, F.lit(0.9)).alias("p90_days"),
        F.max(days).alias("max_days"),
    )


def _q_dau_wau(spark: SparkSession, sf: str) -> DataFrame:
    """DAU/WAU stickiness per week: distinct daily actives averaged
    over the week divided by weekly distinct actives — the growth
    metric. Both distincts aggregate the (user, day) reduction, never
    the raw fact twice; one division per week row."""
    ev = read_table(spark, sf, "events")
    user_days = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.date_trunc("week", F.col("ts")).alias("w"),
    ).distinct()
    dau = user_days.groupBy("w", "d").agg(
        F.countDistinct("user_id").alias("dau")
    )
    weekly = dau.groupBy("w").agg(
        F.sum("dau").cast("bigint").alias("sum_dau"),
        F.count(F.lit(1)).alias("n_days"),
    )
    wau = user_days.groupBy("w").agg(F.countDistinct("user_id").alias("wau"))
    j = weekly.join(wau, "w")
    avg_dau = F.col("sum_dau").cast("double") / F.col("n_days").cast("double")
    return j.select(
        "w",
        "sum_dau",
        "n_days",
        "wau",
        (avg_dau / F.col("wau").cast("double")).alias("stickiness"),
    )


def _q_inter_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """Repeat-purchase cadence: per customer with >= 3 orders, the
    median days between consecutive orders (one lag pass, integer day
    gaps, exact median) — the replenishment-cycle input to CRM timing
    models."""
    o = read_table(spark, sf, "orders").select("o_custkey", "o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o2 = read_table(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    gaps = o2.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    agg = gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.median("gap_days").alias("median_gap_days"),
        F.min("gap_days").alias("min_gap_days"),
    )
    return agg.where(F.col("n_gaps") >= 2)


def _q_precision_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Numeric-contract audit: rows whose money/measure columns carry
    more precision than the declared 2 decimals (|x·100 − round(x·100)|
    beyond float tolerance) — the schema-contract check that catches
    an upstream feed silently switching units or precision. Pure
    map-side arithmetic + one conditional aggregate per table."""
    li = read_table(spark, sf, "lineitem")
    ev = read_table(spark, sf, "events")

    def bad(c: str) -> F.Column:
        scaled = F.col(c) * 100
        return F.sum(
            F.when(F.abs(scaled - F.round(scaled, 0)) > 1e-6, 1).otherwise(0)
        ).cast("bigint")

    a = li.agg(
        F.lit("lineitem").alias("tbl"),
        F.count(F.lit(1)).alias("n_rows"),
        bad("l_extendedprice").alias("bad_price"),
        bad("l_discount").alias("bad_discount"),
    )
    b = ev.where(F.col("value").isNotNull()).agg(
        F.lit("events").alias("tbl"),
        F.count(F.lit(1)).alias("n_rows"),
        bad("value").alias("bad_price"),
        F.lit(0).cast("bigint").alias("bad_discount"),
    )
    return a.unionByName(b)


def _q_wilson_bound(spark: SparkSession, sf: str) -> DataFrame:
    """Conversion ranking by Wilson lower confidence bound (z=1.96):
    per event type treated as a channel, conversions = purchases by
    users who touched the channel. Small channels with lucky rates
    rank below large channels with solid rates — the
    confidence-ranking classic. Integer counts; the bound is one fixed
    IEEE expression (sqrt/±/÷ in a pinned order), identical in the
    oracle."""
    ev = read_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        ),
        F.collect_set("event_type").alias("types"),
    )
    touched = per_user.select(
        F.explode("types").alias("channel"), "converted"
    )
    agg = touched.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("bigint").alias("k"),
    )
    z = F.lit(1.96)
    nn = F.col("n").cast("double")
    p = F.col("k").cast("double") / nn
    z2n = (z * z) / nn
    wilson = (
        (p + z2n / 2 - z * F.sqrt((p * (1 - p) + z2n / 4) / nn))
        / (1 + z2n)
    )
    return agg.select("channel", "n", "k", p.alias("rate"), wilson.alias("wilson_lb"))


def _brand_graph(spark: SparkSession, sf: str) -> DataFrame:
    """Undirected brand co-purchase edge list (a < b, distinct) —
    shared by the graph-diagnostic queries."""
    li = read_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    p = read_table(spark, sf, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    return (
        ob.alias("x")
        .join(ob.alias("y"), "o")
        .select(F.col("x.b").alias("a"), F.col("y.b").alias("b"))
        .where(F.col("a") < F.col("b"))
        .distinct()
    )


def _q_degree_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Graph degree distribution (nodes per degree) of the brand
    co-purchase graph — the first structural diagnostic before any
    graph algorithm (hub detection, power-law eyeballing). Degrees
    from one aggregate over the symmetrized edge list; the histogram
    is an aggregate of the node-cardinality degree frame."""
    e = _brand_graph(spark, sf)
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def _q_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """Degree assortativity (Newman r): Pearson correlation of the
    endpoint degrees over every edge (both orientations) — do hubs
    link to hubs? Degrees are integers, so the exact-moment corr
    mechanism applies verbatim; the edge frame joins the broadcast
    degree map twice. One scalar row."""
    e = _brand_graph(spark, sf)
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("a").alias("u"), F.col("d").alias("dx"))
    db = deg.select(F.col("a").alias("v"), F.col("d").alias("dy"))
    pairs = (
        sym.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .join(F.broadcast(da), "u")
        .join(F.broadcast(db), "v")
    )
    d38 = "decimal(38,0)"
    xi = F.col("dx").cast("decimal(19,0)")
    yi = F.col("dy").cast("decimal(19,0)")
    sums = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast(d38)).alias("sx"),
        F.sum(yi.cast(d38)).alias("sy"),
        F.sum((xi * xi).cast(d38)).alias("sxx"),
        F.sum((yi * yi).cast(d38)).alias("syy"),
        F.sum((xi * yi).cast(d38)).alias("sxy"),
    )
    nd = F.col("n").cast("decimal(12,0)")
    cov = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    den = F.sqrt(vx) * F.sqrt(vy)
    return sums.select(
        F.col("n").alias("n_directed_edges"),
        F.when(den > 0, cov / den).alias("assortativity"),
    )


def _q_containment_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """ASYMMETRIC containment C(A→B) = |A∩B| / |A| over 2-gram shingle
    sets — the quote/partial-copy detector symmetric Jaccard misses (a
    short doc fully embedded in a long one has low Jaccard but
    containment ≈ 1). Same inverted-index candidate generation as q19
    (exact-dedup reps first, shared-shingle join), different epilogue:
    one division by the SOURCE size, emitted for the max-containment
    direction."""
    docs = read_table(spark, sf, "documents")
    reps = exact_dedup(docs, "text", "doc_id").select(
        F.col("doc_id").alias("id"), F.col("text")
    )
    toks = reps.select(
        "id",
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size(tokens("text")) - 1, F.lit(0)),
                ),
                lambda i: F.array_join(F.slice(tokens("text"), i, 2), " "),
            )
        ).alias("tok"),
    ).where(F.size("tok") > 0)
    inv = toks.select(
        "id", F.size("tok").alias("n_tok"), F.explode("tok").alias("token")
    )
    a = inv.select(
        F.col("id").alias("id_a"), F.col("n_tok").alias("n_a"), "token"
    )
    b = inv.select(
        F.col("id").alias("id_b"), F.col("n_tok").alias("n_b"), "token"
    )
    pairs = (
        a.join(b, "token")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    cont = (
        F.col("inter").cast("double")
        / F.least("n_a", "n_b").cast("double")
    )
    return pairs.select(
        "id_a", "id_b", "inter", cont.alias("containment")
    ).where(F.col("containment") >= 0.5)


def _q_null_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Per-column null profile of the events table as ROWS (the
    operators/profile.py:profile shape, query-form): one aggregate
    computes every column's null count simultaneously (never one scan
    per column — the reference's recompute anti-pattern), stacked to
    (column, n_null, null_share)."""
    ev = read_table(spark, sf, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    agg = ev.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__{c}")
            for c in cols
        ],
    )
    stacked = agg.selectExpr(
        "__n",
        "stack(6, "
        + ", ".join(f"'{c}', __{c}" for c in cols)
        + ") as (column_name, n_null)",
    )
    return stacked.select(
        "column_name",
        F.col("__n").alias("n_rows"),
        "n_null",
        (F.col("n_null").cast("double") / F.col("__n").cast("double")).alias(
            "null_share"
        ),
    )


def _q_spike_days(spark: SparkSession, sf: str) -> DataFrame:
    """Day-grain spike detection: days whose event count exceeds 1.05×
    the trailing 7-day average (excluding the day itself — a genuine
    forecast residual, not self-referential) — one window over the
    day-cardinality frame."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("d").rowsBetween(-7, -1)
    scored = daily.select(
        "d",
        "n",
        (F.sum("n").over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "trailing_avg"
        ),
    )
    return scored.where(
        F.col("trailing_avg").isNotNull()
        & (F.col("n").cast("double") > F.lit(1.05) * F.col("trailing_avg"))
    )


def _q_donchian(spark: SparkSession, sf: str) -> DataFrame:
    """Donchian channel + breakout flags on the daily count series per
    type: rolling 7-day min/max (self-exclusive trailing frame) and a
    flag when today breaks above/below the channel — the rolling
    min/max complement to the rolling avg/median/corr family. One
    window over the day-cardinality frame."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
    scored = daily.select(
        "event_type",
        "d",
        "n",
        F.min("n").over(w).alias("chan_lo"),
        F.max("n").over(w).alias("chan_hi"),
    ).where(F.col("chan_lo").isNotNull())
    return scored.select(
        "event_type",
        "d",
        "n",
        "chan_lo",
        "chan_hi",
        (F.col("n") > F.col("chan_hi")).alias("break_up"),
        (F.col("n") < F.col("chan_lo")).alias("break_down"),
    )


def _q_cross_sectional_z(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-sectional standardization: each type's daily count scored
    against THAT DAY's across-type mean/std (the finance-style
    normalization, orthogonal to q102's within-group z) — exact
    integer moments per day over the tiny day×type frame, fixed
    epilogue."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    wd = Window.partitionBy("d")
    k = F.count(F.lit(1)).over(wd)
    s1 = F.sum("n").over(wd)
    s2 = F.sum(F.col("n") * F.col("n")).over(wd)
    var_num = (k * s2 - s1 * s1).cast("double")
    mean = s1.cast("double") / k.cast("double")
    std = F.sqrt(var_num) / k.cast("double")
    return daily.select(
        "d",
        "event_type",
        "n",
        mean.alias("day_mean"),
        F.when(
            var_num > 0, (F.col("n").cast("double") - mean) / std
        ).alias("cs_z"),
    )


def _q_vwap(spark: SparkSession, sf: str) -> DataFrame:
    """Quantity-weighted average price per brand × month (the VWAP
    shape): exact decimal Σ(qty·price) and Σqty, ONE division — the
    weighted mean every pricing report needs, decimal-exact where a
    double accumulation would drift."""
    li = read_table(spark, sf, "lineitem")
    p = read_table(spark, sf, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    wsum = F.sum(
        (_dec("l_quantity") * _dec("l_extendedprice")).cast(DEC)
    )
    qsum = F.sum(_dec("l_quantity").cast(DEC))
    agg = j.groupBy(
        "p_brand", F.date_trunc("month", F.col("l_shipdate")).alias("m")
    ).agg(
        wsum.alias("__ws"),
        qsum.alias("__qs"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return agg.select(
        "p_brand",
        "m",
        "n_lines",
        (F.col("__ws").cast("double") / F.col("__qs").cast("double")).alias(
            "vwap"
        ),
    )


def _q_abc_classification(spark: SparkSession, sf: str) -> DataFrame:
    """ABC inventory classification: parts bucketed A/B/C at 80%/95%
    of cumulative revenue share (q91's Pareto mechanics with the
    classification epilogue) — the window runs over the aggregated
    part frame only; deterministic (revenue DESC, partkey) order."""
    li = read_table(spark, sf, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_revenue()).alias("__rev")
    )
    w = Window.orderBy(F.col("__rev").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    share = (
        F.sum("__rev").over(w).cast("double")
        / F.sum("__rev").over(wall).cast("double")
    )
    classified = per_part.select(
        "l_partkey",
        F.col("__rev").cast("double").alias("revenue"),
        share.alias("cum_share"),
    ).select(
        "l_partkey",
        "revenue",
        "cum_share",
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return classified.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_parts"),
        _dsum(F.col("revenue")).alias("class_revenue"),
    )


def _q_vocab_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Source-level vocabulary overlap matrix: Jaccard between the
    distinct-token sets of every source pair — corpus-level similarity
    (are two crawls near-mirrors?) as opposed to document-level q19.
    The inverted (token, source) frame drives ONE self-join on token;
    set sizes come from one aggregate; integer counts, one division."""
    docs = read_table(spark, sf, "documents")
    st = docs.select(
        "source", F.explode(F.array_distinct(tokens("text"))).alias("t")
    ).distinct()
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("n_vocab"))
    a = st.select(F.col("source").alias("sa"), "t")
    b = st.select(F.col("source").alias("sb"), "t")
    inter = (
        a.join(b, "t")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("source").alias("sa"), F.col("n_vocab").alias("na"))
    nb = sizes.select(F.col("source").alias("sb"), F.col("n_vocab").alias("nb"))
    j = inter.join(F.broadcast(na), "sa").join(F.broadcast(nb), "sb")
    return j.select(
        "sa",
        "sb",
        "inter",
        (
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
        ).alias("vocab_jaccard"),
    )


def _q_growth_accounting(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly growth accounting — new / retained / resurrected /
    churned users per week, the canonical activity ledger (every
    week's actives partition into new+retained+resurrected; churned
    counts last week's actives who went silent). The weekly-actives
    reduction feeds ONE self-join on (user, week−1) plus the
    first-seen frame; identity new+retained+resurrected = WAU holds by
    construction."""
    ev = read_table(spark, sf, "events")
    wk = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    first = wk.groupBy("user_id").agg(F.min("w").alias("first_w"))
    prev = wk.select(
        F.col("user_id").alias("pu"),
        (F.col("w") + F.expr("INTERVAL 7 DAYS")).alias("nw"),
    )
    cur = (
        wk.join(first, "user_id")
        .join(
            prev,
            (F.col("user_id") == F.col("pu")) & (F.col("w") == F.col("nw")),
            "left",
        )
        .select(
            "w",
            (F.col("w") == F.col("first_w")).alias("is_new"),
            F.col("pu").isNotNull().alias("was_active"),
        )
    )
    per_week = cur.groupBy("w").agg(
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).cast("bigint").alias("new_users"),
        F.sum(F.when(~F.col("is_new") & F.col("was_active"), 1).otherwise(0))
        .cast("bigint")
        .alias("retained"),
        F.sum(F.when(~F.col("is_new") & ~F.col("was_active"), 1).otherwise(0))
        .cast("bigint")
        .alias("resurrected"),
    )
    # churned for week w+1: users active in w with no activity in w+1
    nxt = wk.select(
        F.col("user_id").alias("cu"),
        (F.col("w") + F.expr("INTERVAL 7 DAYS")).alias("cw"),
    )
    churn = (
        nxt.join(
            wk,
            (F.col("cu") == F.col("user_id")) & (F.col("cw") == F.col("w")),
            "left_anti",
        )
        .groupBy(F.col("cw").alias("w"))
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    return per_week.join(churn, "w", "left").na.fill({"churned": 0})


def _q_anomaly_ensemble(spark: SparkSession, sf: str) -> DataFrame:
    """Ensemble anomaly vote at the (type, day) grain — three
    independent detectors (trailing-average spike q240, Donchian
    break-up q241, cross-sectional |z|>1.5 q242) computed from ONE
    shared daily aggregate and combined by majority (≥2 votes). The
    composability capstone: every detector is a window over the same
    tiny day×type frame, so the ensemble costs one fact scan total."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
    wd = Window.partitionBy("d")
    trailing = F.sum("n").over(wt).cast("double") / F.count(F.lit(1)).over(wt)
    chan_hi = F.max("n").over(wt)
    k = F.count(F.lit(1)).over(wd)
    s1 = F.sum("n").over(wd)
    s2 = F.sum(F.col("n") * F.col("n")).over(wd)
    var_num = (k * s2 - s1 * s1).cast("double")
    mean = s1.cast("double") / k.cast("double")
    std = F.sqrt(var_num) / k.cast("double")
    scored = daily.select(
        "event_type",
        "d",
        "n",
        F.when(
            trailing.isNotNull()
            & (F.col("n").cast("double") > F.lit(1.05) * trailing),
            1,
        ).otherwise(0).alias("v_spike"),
        F.when(chan_hi.isNotNull() & (F.col("n") > chan_hi), 1)
        .otherwise(0)
        .alias("v_break"),
        F.when(
            (var_num > 0)
            & (F.abs((F.col("n").cast("double") - mean) / std) > 1.5),
            1,
        ).otherwise(0).alias("v_z"),
    )
    return scored.select(
        "event_type",
        "d",
        "n",
        "v_spike",
        "v_break",
        "v_z",
        (F.col("v_spike") + F.col("v_break") + F.col("v_z")).alias("votes"),
    ).where(F.col("v_spike") + F.col("v_break") + F.col("v_z") >= 2)


def _q_bollinger(spark: SparkSession, sf: str) -> DataFrame:
    """Bollinger bands on the daily event-count series per type:
    trailing-7-day (self-exclusive) mean +/- 2 sigma from EXACT integer
    moments (k*S2 - S1^2), flags for breaks above/below the band. The
    named-indicator companion to q241's Donchian channel — variance
    band instead of min/max channel, same one-scan day*type frame."""
    from sensor_time_series_pyspark_spark.operators import bollinger

    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    return bollinger(
        daily, ["event_type"], "d", "n", lookback=7, n_sigma=2.0, min_points=3
    )


def _q_simpson_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Simpson diversity index of event types per user:
    D = 1 - sum(n_i^2)/N^2 — the log-free diversity measure (Shannon
    entropy needs libm log whose low bits differ across engines;
    Simpson is exact-integer moments + ONE double division, same
    screen: 0 = monoculture bot, ~1 = uniform organic mix)."""
    ev = read_table(spark, sf, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_type.groupBy("user_id").agg(
        F.sum("n").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        (
            F.lit(1.0)
            - F.sum(F.col("n") * F.col("n")).cast("double")
            / (F.sum("n") * F.sum("n")).cast("double")
        ).alias("simpson"),
    )


def _q_ttr_hapax(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source lexical-richness profile: token total, vocabulary
    size, type-token ratio, and corpus-hapax share (fraction of the
    source's vocabulary whose CORPUS-wide frequency is 1 — high hapax
    share flags OCR noise / gibberish; low flags templated text).
    One explode feeds both the corpus frequency table and the
    per-source term frame; integer counts, two final divisions."""
    docs = read_table(spark, sf, "documents")
    tok = docs.select("source", F.explode(tokens("text")).alias("t"))
    src_tok = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    corpus = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cn"))
    j = src_tok.join(corpus, "t")
    return j.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.when(F.col("cn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax"),
        (F.count(F.lit(1)).cast("double") / F.sum("n").cast("double")).alias(
            "ttr"
        ),
        (
            F.sum(F.when(F.col("cn") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("hapax_share"),
    )


def _q_temperature_sampling(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based mixture sampling weights (alpha = 0.5): each
    source's sampling weight proportional to n_tokens^0.5 — the
    standard multilingual/domain rebalancing step (upsamples the tail
    without letting the head dominate). Reported RELATIVE to the
    largest source (sqrt(T_s)/sqrt(T_max)): sqrt is IEEE
    correctly-rounded in both engines and the ratio avoids a
    cross-row sum of irrational doubles whose order would differ.
    Complements q185's equalizing mixture_weights (alpha = 0)."""
    docs = read_table(spark, sf, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("n_tokens"),
    )
    wall = Window.partitionBy()
    tmax = F.max("n_tokens").over(wall)
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        (
            F.sqrt(F.col("n_tokens").cast("double"))
            / F.sqrt(tmax.cast("double"))
        ).alias("rel_weight"),
    )


def _q_lexical_complexity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language lexical complexity: chars per word and vowel-group
    ("syllable"-ish) count per word, totalled across the corpus with
    EXACT integer counts and two final divisions — the log-free
    readability screen (Flesch-style inputs without sentence
    segmentation, which this corpus's unpunctuated text cannot
    support). Vowel groups via one regexp_extract_all per doc."""
    docs = read_table(spark, sf, "documents")
    per_doc = docs.select(
        "lang",
        token_count("text").alias("words"),
        F.length(F.regexp_replace(F.col("text"), r"\s+", "")).alias("chars"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("([aeiou]+)"), 1)
        ).alias("vgroups"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").alias("n_words"),
        (F.sum("chars").cast("double") / F.sum("words").cast("double")).alias(
            "chars_per_word"
        ),
        (F.sum("vgroups").cast("double") / F.sum("words").cast("double")).alias(
            "syllables_per_word"
        ),
    )


def _q_daily_mode(spark: SparkSession, sf: str) -> DataFrame:
    """Modal event type per day — the windowed-mode operator (most
    frequent value with a deterministic tiebreak: highest count, then
    lexicographically smallest type). One aggregate to (day, type)
    counts, one row_number over the tiny aggregated frame."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("d").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        daily.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("d", F.col("event_type").alias("mode_type"), "n")
    )


def _q_hour_weekday_heatmap(spark: SparkSession, sf: str) -> DataFrame:
    """Hour-of-day x day-of-week activity heatmap with share-of-weekday
    — the seasonality fingerprint grid (bot traffic is flat; organic
    traffic has a work-hours ridge). One aggregate to the 7x24 cell
    frame; the share divides by a weekday-partition window sum.
    Spark dayofweek is 1=Sunday..7=Saturday; the oracle shifts
    DuckDB's 0-based convention to match."""
    ev = read_table(spark, sf, "events")
    cells = ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
    ).agg(F.count(F.lit(1)).alias("n"))
    wd = Window.partitionBy("dow")
    return cells.select(
        "dow",
        "hod",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wd).cast("double")).alias(
            "dow_share"
        ),
    )


def _q_pettitt(spark: SparkSession, sf: str) -> DataFrame:
    """Pettitt changepoint test per event type on the daily-count
    series: U_t = sum_{i<=t} sum_{j>t} sign(x_j - x_i); the change
    point maximizes |U_t|. Rank-based (no distribution assumption) and
    PURE INTEGER throughout — the engine-portable changepoint screen.

    Uses the identity U_t = -cumsum(r)_t where r_i = sum_j
    sign(x_i - x_j) over the whole series (the antisymmetric square
    cancels), so the cost is ONE within-series pair join for the net
    rank scores plus a window cumsum over the day frame — O(n^2)
    pairs per series on the tiny daily aggregate, never on the fact."""
    from sensor_time_series_pyspark_spark.operators import pettitt

    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    return pettitt(daily, ["event_type"], "d", "n").select(
        "event_type",
        F.col("change_point").alias("change_day"),
        "k_stat",
        "n_candidates",
    )


def _q_lang_purity(spark: SparkSession, sf: str) -> DataFrame:
    """Language purity per source: the dominant language (mode with a
    deterministic count-desc/lang-asc tiebreak), its share, and the
    off-dominant doc count — the crawl-hygiene screen for mislabelled
    or mixed-language sources. Two aggregates over the tiny
    (source, lang) frame."""
    docs = read_table(spark, sf, "documents")
    sl = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("lang"))
    ws = Window.partitionBy("source")
    return (
        sl.withColumn("rk", F.row_number().over(w))
        .withColumn("total", F.sum("n").over(ws))
        .where(F.col("rk") == 1)
        .select(
            "source",
            F.col("lang").alias("dominant_lang"),
            F.col("total").alias("n_docs"),
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "purity"
            ),
            (F.col("total") - F.col("n")).alias("n_off_dominant"),
        )
    )


def _q_knn_label_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Label-noise screen via k-NN agreement: for each probe vector,
    the share of its top-3 cosine neighbors (excluding self) that carry
    the same label — low agreement flags probable mislabels (the
    classic Confident-Learning-style triage, done with the existing
    brute-force cosine machinery). Probe set bounded (vec_id < 50) as
    in q23; at scale the probe side is the small/broadcast side and the
    candidate side streams. Integer votes, one final division."""
    emb = read_table(spark, sf, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    q = v.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("e").alias("qe"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("e"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.zip_with(c, c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        F.broadcast(q)
        .join(v, F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            "qlabel",
            "vec_id",
            "label",
            (dot / (norm(F.col("qe")) * norm(F.col("e")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    top = scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3)
    return top.groupBy("qid", "qlabel").agg(
        F.sum(F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
        (
            F.sum(F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("agreement"),
    )


def _q_prefix_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Prefix-duplicate groups: documents sharing an identical
    first-8-token prefix — the cheap templated-boilerplate /
    truncated-mirror detector that shingle Jaccard over-pays for
    (one slice + one hash aggregate, no pair join). Returns groups
    with >= 2 members: prefix key, member count, representative
    (smallest) doc_id."""
    docs = read_table(spark, sf, "documents")
    pre = docs.select(
        "doc_id",
        F.array_join(F.slice(tokens("text"), 1, 8), " ").alias("prefix"),
    )
    return (
        pre.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("rep_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


def _q_peak_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """Peak concurrent sessions per day — the sweep-line operator:
    sessionized (30-min gap) user activity becomes +1/-1 boundary
    events, a global ordered running sum gives instantaneous
    concurrency, and a day-grain max reduces it. Capacity-planning's
    canonical query. The running sum orders by (ts, delta) so an end
    at time T releases before a start at T acquires (half-open
    sessions never double-count at the boundary). The global window
    runs over the tiny boundary frame (2 rows per session), not the
    fact; at 100 TB the same sweep shards by day first (sessions
    don't cross the 30-min-gap day boundary in practice)."""
    ev = read_table(spark, sf, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(wlag)
    marked = ev.select("user_id", "ts").withColumn(
        "new_s",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    sid = marked.withColumn(
        "sid",
        F.sum("new_s").over(
            wlag.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sess = sid.groupBy("user_id", "sid").agg(
        F.min("ts").alias("t_start"), F.max("ts").alias("t_end")
    )
    bounds = sess.select(
        F.col("t_start").alias("t"), F.lit(1).alias("delta")
    ).unionByName(sess.select(F.col("t_end").alias("t"), F.lit(-1).alias("delta")))
    wsweep = Window.orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    conc = bounds.select(
        "t", F.sum("delta").over(wsweep).cast("bigint").alias("conc")
    )
    return conc.groupBy(F.date_trunc("day", F.col("t")).alias("d")).agg(
        F.max("conc").alias("peak_concurrency")
    )


def _q_weekend_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Weekend lift per event type: average daily event count on
    weekend days over the weekday average — the one-number seasonality
    summary behind q254's full heatmap. Exact integer totals, day
    counts from the calendar (distinct days present), three final
    divisions in a fixed order."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    flagged = daily.withColumn(
        "is_we", F.dayofweek("d").isin(1, 7)
    )
    agg = flagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("is_we"), F.col("n")).otherwise(0)).alias("we_n"),
        F.sum(F.when(F.col("is_we"), 1).otherwise(0)).alias("we_days"),
        F.sum(F.when(~F.col("is_we"), F.col("n")).otherwise(0)).alias("wd_n"),
        F.sum(F.when(~F.col("is_we"), 1).otherwise(0)).alias("wd_days"),
    )
    we_avg = F.col("we_n").cast("double") / F.col("we_days").cast("double")
    wd_avg = F.col("wd_n").cast("double") / F.col("wd_days").cast("double")
    return agg.select(
        "event_type",
        we_avg.alias("weekend_avg"),
        wd_avg.alias("weekday_avg"),
        (we_avg / wd_avg).alias("weekend_lift"),
    )


def _q_spc_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Western Electric SPC rules on the daily event-count series per
    type: rule 1 (|z| > 3), rule 2 (>= 2 of 3 consecutive points
    beyond 2 sigma on the same side), rule 4 (8 consecutive points on
    the same side of the mean) — the industrial control-chart screen,
    as window algebra over the day x type frame. Center line and sigma
    from EXACT whole-series integer moments; z is sqrt + one division
    (identical op order in the oracle). Returns every scored day with
    its rule flags (callers filter on the flags; returning the full
    chart keeps the oracle gate strong even when no rule fires)."""
    from sensor_time_series_pyspark_spark.operators import spc_rules

    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    return spc_rules(daily, ["event_type"], "d", "n")


def _q_wow_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Week-over-week audience overlap: Jaccard between consecutive
    weeks' active-user sets — the stability companion to q246's growth
    ledger (one number per week pair instead of a four-way split).
    The weekly-actives reduction feeds ONE self-join on (user, week+7d);
    set sizes come from the same reduction; integer counts, one
    division."""
    ev = read_table(spark, sf, "events")
    wk = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    sizes = wk.groupBy("w").agg(F.count(F.lit(1)).alias("n_users"))
    nxt = wk.select(
        F.col("user_id").alias("u2"),
        (F.col("w") - F.expr("INTERVAL 7 DAYS")).alias("pw"),
    )
    inter = (
        wk.join(
            nxt, (F.col("user_id") == F.col("u2")) & (F.col("w") == F.col("pw"))
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    a = sizes.select(F.col("w").alias("w"), F.col("n_users").alias("na"))
    b = sizes.select(
        (F.col("w") - F.expr("INTERVAL 7 DAYS")).alias("w"),
        F.col("n_users").alias("nb"),
    )
    j = a.join(b, "w").join(inter, "w", "left").na.fill({"inter": 0})
    return j.select(
        F.col("w").alias("week"),
        F.col("na").alias("users_this"),
        F.col("nb").alias("users_next"),
        F.col("inter").alias("retained"),
        (
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
        ).alias("wow_jaccard"),
    )


def _q_drawdown(spark: SparkSession, sf: str) -> DataFrame:
    """Maximum drawdown of the daily event-count series per type:
    running peak, per-day drawdown (peak - n)/peak, and the worst
    day (deterministic worst-dd/earliest-day tiebreak) — the quant
    risk metric repurposed as a traffic-collapse detector. Running max
    is pure integer; ONE division per day in identical order."""
    from sensor_time_series_pyspark_spark.operators import max_drawdown

    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    return max_drawdown(daily, ["event_type"], "d", "n").select(
        "event_type",
        F.col("worst_point").alias("worst_day"),
        "trough",
        "peak",
        "max_drawdown",
    )


def _q_kfold_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified k-fold assignment audit: deterministic md5-bucket
    fold ids (k=5, the content-hash construction of q64 — stable
    across runs, engines, partitionings, and key-consistent per user)
    crossed with event_type, so fold x stratum counts expose any
    imbalance. The leakage-free CV-split primitive plus its balance
    check in one pass."""
    ev = read_table(spark, sf, "events")
    hexpfx = F.substring(
        F.md5(F.concat(F.lit("cv1"), F.col("user_id").cast("string"))), 1, 8
    )
    fold = (
        F.when(hexpfx < "33333333", 0)
        .when(hexpfx < "66666666", 1)
        .when(hexpfx < "99999999", 2)
        .when(hexpfx < "cccccccc", 3)
        .otherwise(4)
    )
    return (
        ev.withColumn("fold", fold)
        .groupBy("fold", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def _q_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Interarrival burstiness per user (Goh-Barabasi B =
    (sigma - mu)/(sigma + mu) over interarrival gaps): -1 = metronome,
    0 = Poisson, ->1 = bursty — the behavioral bot/human separator.
    Gaps are INTEGER seconds via lag; moments stay integer
    (n*S2 - S1^2); sigma is one sqrt, B two fixed-order divisions.
    Users with < 3 events (< 2 gaps) are excluded."""
    ev = read_table(spark, sf, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            (
                F.col("ts").cast("long")
                - F.lag(F.col("ts").cast("long")).over(wlag)
            ).alias("g"),
        )
        .where(F.col("g").isNotNull())
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("g").alias("s1"),
        F.sum(F.col("g") * F.col("g")).alias("s2"),
    ).where(F.col("k") >= 2)
    mu = F.col("s1").cast("double") / F.col("k").cast("double")
    sigma = F.sqrt(
        (F.col("k") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    ) / F.col("k").cast("double")
    return agg.select(
        "user_id",
        F.col("k").alias("n_gaps"),
        mu.alias("mean_gap_s"),
        sigma.alias("std_gap_s"),
        ((sigma - mu) / (sigma + mu)).alias("burstiness"),
    )


def _q_tukey_fences(spark: SparkSession, sf: str) -> DataFrame:
    """Tukey boxplot fences per event type: exact Q1/Q3 (both engines
    interpolate a + (b-a)*frac over the same sorted doubles, the q60
    guarantee), 1.5xIQR fences, and the count of values outside — the
    distribution-free outlier census that complements q66's
    MAD-z-score per-row flags with a per-group summary."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
        F.count(F.lit(1)).alias("n"),
    )
    fenced = q.select(
        "event_type",
        "q1",
        "q3",
        "n",
        (F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    out = (
        ev.join(F.broadcast(fenced), "event_type")
        .where((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return (
        fenced.join(out, "event_type", "left")
        .na.fill({"n_outliers": 0})
        .select("event_type", "n", "q1", "q3", "lo", "hi", "n_outliers")
    )


def _q_page_hinkley(spark: SparkSession, sf: str) -> DataFrame:
    """Page-Hinkley drift detector (offline form) on the daily count
    series per type: m_t = cumsum(n - mean), PH_t = m_t - min(m_1..t),
    alarm when PH_t > lambda = 0.5 * mean — the sequential
    mean-increase detector behind most stream-drift libraries, as two
    stacked window passes over the day x type frame (cumsum, then
    running min). Mean from exact integer moments; cumsum order is
    the window order, identical in both engines."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    wall = Window.partitionBy("event_type")
    mean = F.sum("n").over(wall).cast("double") / F.count(F.lit(1)).over(
        wall
    ).cast("double")
    base = daily.select(
        "event_type", "d", "n", mean.alias("mean_n")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = F.sum(F.col("n").cast("double") - F.col("mean_n")).over(wcum)
    stepped = base.withColumn("m", m)
    ph = F.col("m") - F.min("m").over(wcum)
    return stepped.select(
        "event_type",
        "d",
        "n",
        ph.alias("ph"),
        F.when(ph > F.lit(0.5) * F.col("mean_n"), 1).otherwise(0).alias(
            "alarm"
        ),
    )


def _q_capture_recapture(spark: SparkSession, sf: str) -> DataFrame:
    """Chapman capture-recapture estimate of the true active-user
    population from consecutive weekly sightings: N = (n1+1)(n2+1)/
    (m+1) - 1 with m = users seen in both weeks — the coverage
    estimator ecology lends to dataset-completeness audits ("how many
    users exist that we never see?"). Pure integer counts, ONE
    division; coverage = observed-union / N."""
    ev = read_table(spark, sf, "events")
    wk = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    sizes = wk.groupBy("w").agg(F.count(F.lit(1)).alias("n1"))
    nxt = wk.select(
        F.col("user_id").alias("u2"),
        (F.col("w") - F.expr("INTERVAL 7 DAYS")).alias("pw"),
    )
    m = (
        wk.join(
            nxt, (F.col("user_id") == F.col("u2")) & (F.col("w") == F.col("pw"))
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    n2 = sizes.select(
        (F.col("w") - F.expr("INTERVAL 7 DAYS")).alias("w"),
        F.col("n1").alias("n2"),
    )
    j = sizes.join(n2, "w").join(m, "w", "left").na.fill({"m": 0})
    nhat = (
        ((F.col("n1") + 1) * (F.col("n2") + 1)).cast("double")
        / (F.col("m") + 1).cast("double")
    ) - F.lit(1.0)
    union = (F.col("n1") + F.col("n2") - F.col("m")).cast("double")
    return j.select(
        F.col("w").alias("week"),
        "n1",
        "n2",
        "m",
        nhat.alias("n_hat"),
        (union / nhat).alias("coverage"),
    )


def _q_odds_ratio_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Distinctive vocabulary per language by Haldane-smoothed odds
    ratio: OR = (a+.5)(B-b+.5) / ((b+.5)(A-a+.5)) for token count a of
    A in-language tokens vs b of B out-of-language — the log-free
    enrichment score (log-odds is monotone in OR, so rankings agree)
    behind "what words characterize this slice" analyses. One explode,
    one (lang, token) aggregate, token totals by broadcast-sized
    joins; top-5 per lang by (OR desc, token asc). Tokens with a < 5
    are pruned before ranking (hapax OR noise)."""
    docs = read_table(spark, sf, "documents")
    tok = docs.select("lang", F.explode(tokens("text")).alias("t"))
    lt = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("a"))
    tot_l = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("la"))
    tot_t = tok.groupBy("t").agg(F.count(F.lit(1)).alias("ct"))
    tot = tok.agg(F.count(F.lit(1)).alias("gn"))
    j = (
        lt.join(F.broadcast(tot_l), "lang")
        .join(tot_t, "t")
        .crossJoin(F.broadcast(tot))
        .where(F.col("a") >= 5)
    )
    b = F.col("ct") - F.col("a")
    bigB = F.col("gn") - F.col("la")
    orr = (
        (F.col("a").cast("double") + 0.5)
        * ((bigB - b).cast("double") + 0.5)
    ) / (
        (b.cast("double") + 0.5)
        * ((F.col("la") - F.col("a")).cast("double") + 0.5)
    )
    return (
        j.select(
            "lang",
            F.col("t").alias("token"),
            "a",
            orr.alias("odds_ratio"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(
                    F.col("odds_ratio").desc(), F.col("token")
                )
            ),
        )
        .where(F.col("rk") <= 5)
        .select("lang", "token", "a", "odds_ratio", F.col("rk").cast("int").alias("rk"))
    )


def _q_emd_drift(spark: SparkSession, sf: str) -> DataFrame:
    """1-D earth mover's distance (Wasserstein-1) between each event
    type's first-half and second-half value distributions — the drift
    metric that sees HOW FAR mass moved where TVD (q81) only sees how
    much. Values bin to width-5 integer bins (the 100 TB contract:
    EMD over a bounded histogram, never raw points); EMD = sum over
    the bin grid of |cumsum(p_a - p_b)| * width. Bin counts are
    integers; shares and the cumsum are fixed-order doubles."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    mid = F.lit("2024-01-16")
    binned = ev.select(
        "event_type",
        F.when(F.col("ts") < mid, "a").otherwise("b").alias("half"),
        F.floor(F.col("value") / F.lit(5.0)).cast("bigint").alias("bin"),
    )
    counts = binned.groupBy("event_type", "half", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    wtot = Window.partitionBy("event_type", "half")
    shares = counts.select(
        "event_type",
        "half",
        "bin",
        (F.col("n").cast("double") / F.sum("n").over(wtot).cast("double")).alias(
            "p"
        ),
    )
    grid = (
        shares.groupBy("event_type", "bin")
        .pivot("half", ["a", "b"])
        .agg(F.first("p"))
        .na.fill({"a": 0.0, "b": 0.0})
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    diffs = grid.select(
        "event_type",
        "bin",
        F.sum(F.col("a") - F.col("b")).over(wcum).alias("cdf_gap"),
    )
    return diffs.groupBy("event_type").agg(
        (_dsum(F.abs(F.col("cdf_gap"))) * F.lit(5.0)).alias("emd"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )


def _q_bow_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Token-set duplicate groups: documents sharing an identical
    DISTINCT token set (md5 of the sorted distinct tokens) — the
    permutation- and multiplicity-invariant dedup layer that catches
    shuffled/reordered/repeated-template copies exact-hash dedup (q17)
    misses and shingle methods only partially score. One map-side
    fingerprint + one hash aggregate, no pair join. Returns groups
    >= 2 with member/source counts."""
    docs = read_table(spark, sf, "documents")
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(tokens("text"))), " "))
    return (
        docs.select("doc_id", "source", fp.alias("bow_fp"))
        .groupBy("bow_fp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").alias("rep_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


def _q_stride_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Systematic (every k-th) per-user event sample, k=10 — the
    deterministic longitudinal thinning that preserves per-user
    temporal spread where uniform row sampling does not. One window
    rank per user (ts, event_id tiebreak), modulo filter; emits the
    kept rows so the oracle verifies exact membership, not just
    counts."""
    ev = read_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") % 10) == 1)
        .select("user_id", "event_id", F.col("rn").cast("int").alias("rn"))
    )


def _q_churn_risk(spark: SparkSession, sf: str) -> DataFrame:
    """Recency-vs-cadence churn screen: idle time since a user's last
    event (to the corpus horizon) over their own median interarrival
    gap — at_risk when idle > 3x median cadence. The per-user median
    personalizes the threshold (a daily user 4 days silent is at risk;
    a weekly user is not). Integer-second gaps, exact median, one
    ratio; users with < 2 gaps excluded."""
    ev = read_table(spark, sf, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = (
        F.col("ts").cast("long")
        - F.lag(F.col("ts").cast("long")).over(wlag)
    )
    base = ev.select(
        "user_id", F.col("ts").cast("long").alias("tsec"), g.alias("g")
    )
    horizon = base.agg(F.max("tsec").alias("h"))
    per_user = base.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("tsec").alias("last_t"),
        F.median("g").alias("median_gap_s"),
        F.count("g").alias("n_gaps"),
    ).where(F.col("n_gaps") >= 2)
    j = per_user.crossJoin(F.broadcast(horizon))
    ratio = (F.col("h") - F.col("last_t")).cast("double") / F.col(
        "median_gap_s"
    )
    return j.select(
        "user_id",
        "n_events",
        (F.col("h") - F.col("last_t")).alias("idle_s"),
        "median_gap_s",
        ratio.alias("risk_ratio"),
        F.when(ratio > 3.0, 1).otherwise(0).alias("at_risk"),
    )


def _q_discount_elasticity(spark: SparkSession, sf: str) -> DataFrame:
    """Discount-quantity elasticity proxy per part brand: exact-moment
    Pearson correlation between l_discount and l_quantity
    (operators/profile.py:exact_corr — decimal moments, fixed IEEE
    epilogue) after a broadcast join to the part dimension. Positive
    corr = discounts move volume for that brand."""
    from sensor_time_series_pyspark_spark.operators import exact_corr

    li = read_table(spark, sf, "lineitem")
    p = read_table(spark, sf, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    return exact_corr(j, "l_discount", "l_quantity", by=["p_brand"])


def _q_centroid_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space drift per label: cosine between the centroid of
    the first half of the corpus (vec_id < 250) and the second half —
    the embedding-health monitor (re-embedding or upstream featurizer
    changes show up as off-1.0 cosines before any model degrades).
    Same order-free decimal centroid accumulation as q157; cosine is
    scale-invariant so SUM vectors stand in for means (no division)."""
    e = read_table(spark, sf, "embeddings")
    comp = e.select(
        "label",
        F.when(F.col("vec_id") < 250, "a").otherwise("b").alias("half"),
        F.posexplode("embedding").alias("dim", "v"),
    )
    cent = comp.groupBy("label", "half", "dim").agg(
        F.sum(F.col("v").cast("double").cast("decimal(20,8)")).alias("s")
    )
    vecs = (
        cent.groupBy("label", "half")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("arr"))
        .select(
            "label",
            "half",
            F.expr("transform(arr, x -> cast(x.s as double))").alias("vec"),
        )
    )
    a = vecs.where(F.col("half") == "a").select(
        "label", F.col("vec").alias("va")
    )
    b = vecs.where(F.col("half") == "b").select(
        F.col("label").alias("lb"), F.col("vec").alias("vb")
    )
    dot = lambda x, y: F.expr(  # noqa: E731
        f"aggregate(zip_with({x}, {y}, (p, q) -> p * q), 0D, (acc, z) -> acc + z)"
    )
    return (
        a.join(b, F.col("label") == F.col("lb"))
        .select(
            "label",
            (
                dot("va", "vb")
                / (F.sqrt(dot("va", "va")) * F.sqrt(dot("vb", "vb")))
            ).alias("drift_cosine"),
        )
    )


def _q_matrix_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Matrix-profile discord and motif per event type (length-7
    windows over the daily count series): every window's distance to
    its nearest OTHER window; the DISCORD is the window farthest from
    all others (the anomalous week), the MOTIF the closest pair (the
    repeated week). Distances are unnormalized squared Euclidean on
    INTEGER counts — exact end to end, no z-norm float drift. The
    window-element frame joins on (type, position offset), so the
    O(w^2 * m) pair work runs over the tiny day x type frame, never
    the fact. Output: one row per type with both extrema."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    widx = Window.partitionBy("event_type").orderBy("d")
    idx = daily.withColumn("idx", F.row_number().over(widx))
    wcnt = Window.partitionBy("event_type")
    idx = idx.withColumn("cnt", F.count(F.lit(1)).over(wcnt))
    m = 7
    # window elements: (type, start s, pos p, val) for s in 1..cnt-m+1
    el = (
        idx.alias("a")
        .join(
            idx.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.idx") >= F.col("a.idx"))
            & (F.col("b.idx") < F.col("a.idx") + m),
        )
        .where(F.col("a.idx") <= F.col("a.cnt") - m + 1)
        .select(
            F.col("a.event_type").alias("et"),
            F.col("a.idx").alias("s"),
            (F.col("b.idx") - F.col("a.idx")).alias("p"),
            F.col("b.n").alias("v"),
        )
    )
    e1 = el.select(
        F.col("et"), F.col("s").alias("s1"), "p", F.col("v").alias("v1")
    )
    e2 = el.select(
        F.col("et").alias("et2"),
        F.col("s").alias("s2"),
        F.col("p").alias("p2"),
        F.col("v").alias("v2"),
    )
    d2 = (
        e1.join(
            e2,
            (F.col("et") == F.col("et2"))
            & (F.col("p") == F.col("p2"))
            & (F.col("s1") != F.col("s2")),
        )
        .groupBy("et", "s1", "s2")
        .agg(
            F.sum(
                (F.col("v1") - F.col("v2")) * (F.col("v1") - F.col("v2"))
            ).alias("dist2")
        )
    )
    nn = d2.groupBy("et", "s1").agg(F.min("dist2").alias("nn_dist2"))
    wdis = Window.partitionBy("et").orderBy(
        F.col("nn_dist2").desc(), F.col("s1")
    )
    wmot = Window.partitionBy("et").orderBy(
        F.col("nn_dist2").asc(), F.col("s1")
    )
    ranked = nn.select(
        "et",
        "s1",
        "nn_dist2",
        F.row_number().over(wdis).alias("rd"),
        F.row_number().over(wmot).alias("rm"),
    )
    days = idx.select(
        F.col("event_type").alias("et"), F.col("idx").alias("s1"), "d"
    )
    dis = (
        ranked.where(F.col("rd") == 1)
        .join(days, ["et", "s1"])
        .select(
            "et",
            F.col("d").alias("discord_start"),
            F.col("nn_dist2").alias("discord_dist2"),
        )
    )
    mot = (
        ranked.where(F.col("rm") == 1)
        .join(days, ["et", "s1"])
        .select(
            F.col("et").alias("et_m"),
            F.col("d").alias("motif_start"),
            F.col("nn_dist2").alias("motif_dist2"),
        )
    )
    return dis.join(mot, F.col("et") == F.col("et_m")).select(
        F.col("et").alias("event_type"),
        "discord_start",
        "discord_dist2",
        "motif_start",
        "motif_dist2",
    )


def _q_rolling_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-7-day OLS slope of the daily count per type — the
    windowed trend gauge (q101's whole-series slope, localized).
    Day index and counts are integers, so the four window moments
    (k, St, Sx, Stx, Stt) stay exact; slope = (k*Stx - St*Sx) /
    (k*Stt - St^2), ONE division when the denominator is positive
    (needs >= 2 points)."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    widx = Window.partitionBy("event_type").orderBy("d")
    base = daily.withColumn("t", F.row_number().over(widx).cast("bigint"))
    wt = Window.partitionBy("event_type").orderBy("t").rowsBetween(-6, 0)
    k = F.count(F.lit(1)).over(wt)
    st = F.sum("t").over(wt)
    sx = F.sum("n").over(wt)
    stx = F.sum(F.col("t") * F.col("n")).over(wt)
    stt = F.sum(F.col("t") * F.col("t")).over(wt)
    den = k * stt - st * st
    slope = F.when(
        den > 0,
        (k * stx - st * sx).cast("double") / den.cast("double"),
    )
    return base.select("event_type", "d", "n", slope.alias("slope7"))


def _q_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-design coverage curve: share of the total corpus
    token mass covered by the top-k vocabulary entries for k in
    (5, 10, 20, 50) — the Zipf-coverage table that sizes vocab
    budgets. One explode + one vocab aggregate; rank and cumulative
    sums run over the tiny vocab frame (freq desc, token asc
    deterministic order); integer masses, one division per k."""
    docs = read_table(spark, sf, "documents")
    vocab = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wrank = Window.orderBy(F.col("c").desc(), F.col("t"))
    wall = Window.partitionBy()
    ranked = vocab.select(
        "t",
        "c",
        F.row_number().over(wrank).alias("rk"),
        F.sum("c").over(
            wrank.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("c").over(wall).alias("total"),
    )
    ks = spark.createDataFrame([(5,), (10,), (20,), (50,)], ["k"])
    hit = ranked.join(F.broadcast(ks), F.col("rk") == F.col("k"))
    return hit.select(
        F.col("k").cast("int").alias("k"),
        F.col("cum").alias("covered_tokens"),
        F.col("total").alias("total_tokens"),
        (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
            "coverage"
        ),
    )


def _q_mann_whitney(spark: SparkSession, sf: str) -> DataFrame:
    """Mann-Whitney U between every event-type pair's value
    distributions — the nonparametric two-sample location test (the
    rank-based companion to q199's KS). Kept EXACTLY INTEGER via the
    distinct-value formulation: for each distinct value v,
    2U += cntA(v) * (2 * cntLessB(v) + cntB(v)), where cntLessB is a
    cumulative sum over the value-sorted per-pair support frame — no
    average-rank halves, no floats until the final standardized z
    (one sqrt + one division). At 100 TB the same shape holds: the
    support frame is the per-(type, value) reduction, never raw rows."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    vc = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("c")
    )
    a = vc.select(
        F.col("event_type").alias("ta"), F.col("value").alias("v"), F.col("c").alias("ca")
    )
    b = vc.select(
        F.col("event_type").alias("tb"), F.col("value").alias("vb"), F.col("c").alias("cb")
    )
    # cntLessB via join on vb < v aggregated — expressed as a window
    # over the union support per pair would need densification; the
    # direct conditional join stays on the reduced support frame
    less = (
        a.join(b, (F.col("ta") < F.col("tb")) & (F.col("vb") < F.col("v")))
        .groupBy("ta", "tb", "v", "ca")
        .agg(F.sum("cb").alias("less_b"))
    )
    eq = (
        a.join(b, F.col("ta") < F.col("tb"))
        .where(F.col("v") == F.col("vb"))
        .select("ta", "tb", "v", "cb")
    )
    contrib = (
        a.join(b, F.col("ta") < F.col("tb"))
        .where(F.col("v") == F.col("vb"))
        .select("ta", "tb", "v", "ca", F.col("cb").alias("eq_b"))
        .join(less.select("ta", "tb", "v", "less_b"), ["ta", "tb", "v"], "left")
        .na.fill({"less_b": 0})
    )
    # rows of A with no equal B value still contribute via less_b only
    only_less = (
        less.join(eq, ["ta", "tb", "v"], "left_anti")
        .select("ta", "tb", "v", "ca", F.lit(0).alias("eq_b"), "less_b")
    )
    allc = contrib.select(
        "ta", "tb", "ca", "eq_b", "less_b"
    ).unionByName(only_less.select("ta", "tb", "ca", "eq_b", "less_b"))
    u2 = allc.groupBy("ta", "tb").agg(
        F.sum(
            F.col("ca") * (F.lit(2) * F.col("less_b") + F.col("eq_b"))
        ).alias("u2")
    )
    sizes = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    na = sizes.select(F.col("event_type").alias("ta"), F.col("n").alias("na"))
    nb = sizes.select(F.col("event_type").alias("tb"), F.col("n").alias("nb"))
    j = u2.join(F.broadcast(na), "ta").join(F.broadcast(nb), "tb")
    mu2 = F.col("na") * F.col("nb")  # 2 * mean of U
    # z from the no-ties normal approximation (reported as a summary
    # statistic; exact inputs, fixed op order)
    z = (F.col("u2").cast("double") - mu2.cast("double")) / F.sqrt(
        (F.col("na") * F.col("nb") * (F.col("na") + F.col("nb") + 1)).cast(
            "double"
        )
        / F.lit(3.0)
    )
    return j.select(
        "ta",
        "tb",
        "na",
        "nb",
        F.col("u2").alias("u_doubled"),
        z.alias("z"),
    )


def _q_effect_size(spark: SparkSession, sf: str) -> DataFrame:
    """Cohen's d (pooled-SD standardized mean difference) for every
    event-type pair — the effect-size companion to q125's proportion
    test: integer-scaled decimal moments per group (value has 2
    decimals), variance numerators exact, then a fixed IEEE epilogue
    d = (mA - mB) / sqrt(((nA-1)sA2 + (nB-1)sB2) / (nA+nB-2))."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    xi = (F.col("value").cast("decimal(18,2)") * 100).cast("decimal(19,0)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast("decimal(38,0)")).alias("sx"),
        F.sum((xi * xi).cast("decimal(38,0)")).alias("sxx"),
    )
    nd = F.col("n").cast("decimal(12,0)")
    var_num = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    mean = F.col("sx").cast("double") / F.col("n").cast("double")
    # sample variance * (n-1) = var_num / n  (in scaled units)
    s2n1 = var_num / F.col("n").cast("double")
    stats = s.select(
        "event_type", "n", mean.alias("m"), s2n1.alias("ssq")
    )
    a = stats.select(
        F.col("event_type").alias("ta"),
        F.col("n").alias("na"),
        F.col("m").alias("ma"),
        F.col("ssq").alias("ssa"),
    )
    b = stats.select(
        F.col("event_type").alias("tb"),
        F.col("n").alias("nb"),
        F.col("m").alias("mb"),
        F.col("ssq").alias("ssb"),
    )
    pooled = F.sqrt(
        (F.col("ssa") + F.col("ssb"))
        / (F.col("na") + F.col("nb") - 2).cast("double")
    )
    # d is scale-invariant: mean diff and pooled SD are both in the
    # x100 scaled units, so the ratio needs no rescale
    d = F.when(pooled > 0, (F.col("ma") - F.col("mb")) / pooled)
    return (
        a.join(b, F.col("ta") < F.col("tb"))
        .select("ta", "tb", "na", "nb", d.alias("cohens_d"))
    )


def _q_cm_frequency(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min sketch frequency estimation
    (operators/sketches.py:cm_partials/cm_estimate): per-day CM
    partials over user ids (the persist-once pattern), merged across
    days by plain SUM, then probed for every user — answers "how often
    did THIS key occur" from kilobyte-scale cells without rescanning
    the fact. Rows-only gate (no DuckDB xxhash64 twin); the
    no-undercount / additivity / exactness-when-sparse invariants are
    pinned in tests/test_round4_ops.py."""
    from sensor_time_series_pyspark_spark.operators import (
        cm_estimate,
        cm_merge,
        cm_partials,
    )

    ev = read_table(spark, sf, "events")
    daily = ev.select(
        F.date_trunc("day", F.col("ts")).alias("d"), "user_id"
    )
    parts = cm_partials(daily, ["d"], "user_id", depth=4, width=1024)
    merged = cm_merge(parts, by=[])
    probes = ev.select("user_id").distinct()
    est = cm_estimate(merged, probes, "user_id", by=[], depth=4, width=1024)
    return est.select(
        F.col("item").alias("user_id"), "estimate"
    ).orderBy("user_id")


def _q_horvitz_thompson(spark: SparkSession, sf: str) -> DataFrame:
    """Horvitz-Thompson estimation from the deterministic md5 sample:
    a ~10% hash sample of lineitem (same key -> same decision on every
    engine) estimates the full-population revenue total as
    sum(x_i / p_i) = sum(x_i) / 0.1 — the survey-sampling estimator
    behind every "query the sample, report the population" dashboard.
    Reports estimate, exact truth, and relative error per return flag,
    so the query itself audits the estimator. Decimal sums; two fixed
    final divisions."""
    li = read_table(spark, sf, "lineitem")
    keep = (
        F.substring(
            F.md5(F.concat(F.lit("ht1"), F.col("l_orderkey").cast("string"),
                           F.lit("-"), F.col("l_linenumber").cast("string"))),
            1,
            8,
        )
        < _thr(0.1)
    )
    rev = _revenue().cast(DEC)
    agg = li.groupBy("l_returnflag").agg(
        F.sum(F.when(keep, rev).otherwise(F.lit(0).cast(DEC))).alias("__s"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
        F.sum(rev).alias("__t"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    est = F.col("__s").cast("double") / F.lit(0.1)
    truth = F.col("__t").cast("double")
    return agg.select(
        "l_returnflag",
        "n_sampled",
        "n_rows",
        est.alias("ht_estimate"),
        truth.alias("exact_total"),
        ((est - truth) / truth).alias("rel_error"),
    )


def _q_half_sample_ci(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic half-sample bootstrap CI for mean daily revenue:
    B = 50 replicates, each keeping orders whose md5(replicate || key)
    falls below 0.5 (doubling the kept mass) — the hash-seeded,
    engine-portable stand-in for the Poisson bootstrap (the standard
    at-scale resampling scheme; RNG-free so runs reproduce anywhere).
    The replicate frame is B x days rows; p5/p50/p95 of the replicate
    means give the interval. Decimal sums, exact percentiles over the
    50-value replicate frame."""
    o = read_table(spark, sf, "orders")
    reps = spark.range(50).select(F.col("id").cast("int").alias("rep"))
    j = o.crossJoin(F.broadcast(reps))
    keep = (
        F.substring(
            F.md5(
                F.concat(
                    F.lit("hs"),
                    F.col("rep").cast("string"),
                    F.lit("-"),
                    F.col("o_orderkey").cast("string"),
                )
            ),
            1,
            8,
        )
        < _thr(0.5)
    )
    kept = j.where(keep)
    per_rep = kept.groupBy("rep").agg(
        (
            F.lit(2.0)
            * F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
            / F.count_distinct(F.to_date("o_orderdate")).cast("double")
        ).alias("mean_daily_rev")
    )
    return per_rep.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reps"),
        F.percentile("mean_daily_rev", F.lit(0.05)).alias("ci_lo"),
        F.median("mean_daily_rev").alias("ci_mid"),
        F.percentile("mean_daily_rev", F.lit(0.95)).alias("ci_hi"),
    )


def _q_mutual_knn(spark: SparkSession, sf: str) -> DataFrame:
    """Mutual k-NN rate over the probe set (vec_id < 50, k = 3): the
    share of directed nearest-neighbor edges that are reciprocated —
    the embedding-space health gauge (hubness/anisotropy collapse
    shows up as low mutuality long before downstream metrics move).
    Reuses the brute-force cosine ranking of q23/q257; the mutual
    check is one self-join of the top-k edge list on reversed ids."""
    emb = read_table(spark, sf, "embeddings")
    v = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    ).where(F.col("vec_id") < 50)
    q = v.select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"))
    dot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("e"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(c, c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        F.broadcast(q)
        .join(v, F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            "vec_id",
            (dot / (norm(F.col("qe")) * norm(F.col("e")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    edges = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("qid", "vec_id")
    )
    rev = edges.select(
        F.col("vec_id").alias("qid"), F.col("qid").alias("vec_id")
    )
    mutual = edges.join(rev, ["qid", "vec_id"], "left_semi")
    tot = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    mut = mutual.agg(F.count(F.lit(1)).alias("n_mutual"))
    return tot.crossJoin(mut).select(
        "n_edges",
        "n_mutual",
        (
            F.col("n_mutual").cast("double") / F.col("n_edges").cast("double")
        ).alias("mutual_rate"),
    )


def _q_centroid_silhouette(spark: SparkSession, sf: str) -> DataFrame:
    """Centroid silhouette per label: mean over the label's vectors of
    (cosine to OWN centroid - best cosine to any OTHER centroid) —
    positive = separable cluster, <= 0 = label bleeds into another
    (the medoid-free silhouette that runs in one centroid pass + one
    broadcast join instead of O(n^2) pair distances). Centroids are
    order-free decimal sums (q157); per-vector cosines are sequential
    array folds; the final per-label mean uses the exact decimal-sum
    convention."""
    emb = read_table(spark, sf, "embeddings")
    comp = emb.select("label", F.posexplode("embedding").alias("dim", "v"))
    cent = comp.groupBy("label", "dim").agg(
        F.sum(F.col("v").cast("double").cast("decimal(20,8)")).alias("s")
    )
    cvecs = (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("a"))
        .select(
            F.col("label").alias("clabel"),
            F.expr("transform(a, x -> cast(x.s as double))").alias("cvec"),
        )
    )
    pts = emb.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("e"), F.col("cvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(c, c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cos = pts.crossJoin(F.broadcast(cvecs)).select(
        "vec_id",
        "label",
        "clabel",
        (dot / (norm(F.col("e")) * norm(F.col("cvec")))).alias("cos"),
    )
    own = cos.where(F.col("label") == F.col("clabel")).select(
        "vec_id", "label", F.col("cos").alias("own_cos")
    )
    other = (
        cos.where(F.col("label") != F.col("clabel"))
        .groupBy("vec_id")
        .agg(F.max("cos").alias("other_cos"))
    )
    per_vec = own.join(other, "vec_id")
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        _davg(F.col("own_cos") - F.col("other_cos")).alias("silhouette"),
    )


def _q_decayed_popularity(spark: SparkSession, sf: str) -> DataFrame:
    """Half-life-decayed popularity ranking per part: each sale
    contributes 2^(-floor(age_weeks)) — week-old sales count half.
    The decay weights are EXACT powers of two (integer exponent, so
    the double is exact and engine-identical; no pow/exp libm call),
    terms accumulate through the decimal-sum convention, and the
    integer age comes from date arithmetic. The freshness-aware
    leaderboard that plain lifetime counts (q85) cannot express."""
    li = read_table(spark, sf, "lineitem")
    horizon = li.agg(F.max("l_shipdate").alias("h"))
    j = li.crossJoin(F.broadcast(horizon))
    weeks = F.floor(
        F.datediff(F.col("h"), F.col("l_shipdate")) / F.lit(7)
    ).cast("int")
    w = F.pow(F.lit(2.0), (-weeks).cast("double"))
    scored = j.select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(18,2)").alias("q"),
        w.alias("w"),
    )
    per_part = scored.groupBy("l_partkey").agg(
        _dsum(F.col("q").cast("double") * F.col("w")).alias("decayed_qty"),
        F.count(F.lit(1)).cast("bigint").alias("n_sales"),
    )
    wtop = Window.orderBy(F.col("decayed_qty").desc(), F.col("l_partkey"))
    return (
        per_part.withColumn("rk", F.row_number().over(wtop))
        .where(F.col("rk") <= 20)
        .select(
            F.col("rk").cast("int").alias("rk"),
            "l_partkey",
            "decayed_qty",
            "n_sales",
        )
    )


def _q_anova_f(spark: SparkSession, sf: str) -> DataFrame:
    """One-way ANOVA F statistic for value across event types:
    SSB/(k-1) over SSW/(N-k), with the sums of squares built from
    per-group EXACT decimal moments (SSW = sum(x^2) - sum_g(S_g^2 /
    n_g), SSB = sum_g(S_g^2 / n_g) - S^2/N) — the between/within
    variance decomposition behind every "does the group matter"
    screen. Group moments stay decimal-exact; the epilogue divides in
    a fixed order. One aggregate over the fact, one over the 5-row
    group frame."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    xi = (F.col("value").cast("decimal(18,2)") * 100).cast("decimal(19,0)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast("decimal(38,0)")).alias("s"),
        F.sum((xi * xi).cast("decimal(38,0)")).alias("ss"),
    )
    # per-group S^2/n as double (fixed order), then exact-decimal-free
    # epilogue over the tiny k-row frame
    per = g.select(
        "event_type",
        "n",
        (
            F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n").cast("double")
        ).alias("s2n"),
        F.col("s").cast("double").alias("sd"),
        F.col("ss").cast("double").alias("ssd"),
    )
    tot = per.agg(
        F.sum("n").alias("N"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        _dsum(F.col("s2n")).alias("sum_s2n"),
        _dsum(F.col("sd")).alias("S"),
        _dsum(F.col("ssd")).alias("SS"),
    )
    ssb = F.col("sum_s2n") - F.col("S") * F.col("S") / F.col("N").cast(
        "double"
    )
    ssw = F.col("SS") - F.col("sum_s2n")
    fstat = (ssb / (F.col("k") - 1).cast("double")) / (
        ssw / (F.col("N") - F.col("k")).cast("double")
    )
    return tot.select(
        F.col("N").cast("bigint").alias("n_rows"),
        F.col("k").alias("n_groups"),
        ssb.alias("ssb"),
        ssw.alias("ssw"),
        fstat.alias("f_stat"),
    )


def _q_retrieval_scoring(spark: SparkSession, sf: str) -> DataFrame:
    """Log-free BM25-style retrieval: top-10 documents for the query
    {spark, table, join} ranked by sum over query terms of
    odds-idf * saturated-tf, where odds-idf = (N - df + 0.5)/(df +
    0.5) (the argument of BM25's log — monotone per term, libm-free)
    and saturated-tf = tf*(k1+1) / (tf + k1*(1 - b + b*len/avglen)),
    k1 = 1.2, b = 0.75. Exact integer tf/df/len; the per-term epilogue
    is a fixed IEEE sequence and the 3-term sum accumulates through
    decimal. One explode + two broadcast-sized joins; the corpus is
    scanned once."""
    docs = read_table(spark, sf, "documents")
    qterms = spark.createDataFrame(
        [("spark",), ("table",), ("join",)], ["qt"]
    )
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("t"))
    lens = docs.select(
        "doc_id", token_count("text").cast("bigint").alias("len")
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("N"), F.sum("len").alias("total_len")
    )
    tf = (
        tok.join(F.broadcast(qterms), tok["t"] == qterms["qt"])
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    j = (
        tf.join(F.broadcast(df_), "t")
        .join(F.broadcast(lens), "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    avglen = F.col("total_len").cast("double") / F.col("N").cast("double")
    idf = (F.col("N").cast("double") - F.col("df").cast("double") + 0.5) / (
        F.col("df").cast("double") + 0.5
    )
    sat = (F.col("tf").cast("double") * F.lit(2.2)) / (
        F.col("tf").cast("double")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * F.col("len").cast("double") / avglen)
    )
    terms = j.select("doc_id", (idf * sat).alias("term_score"))
    scored = terms.groupBy("doc_id").agg(
        _dsum(F.col("term_score")).alias("score"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
    )
    wtop = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(wtop))
        .where(F.col("rk") <= 10)
        .select(
            F.col("rk").cast("int").alias("rk"),
            "doc_id",
            "score",
            "n_terms_hit",
        )
    )


def _q_hoover_index(spark: SparkSession, sf: str) -> DataFrame:
    """Hoover (Robin Hood) index of revenue concentration across
    customers: half the sum of |share_i - 1/n| — "what fraction of
    revenue would have to move to equalize everyone", the log-free
    inequality measure that complements q150's Gini (Gini weights by
    rank, Hoover by absolute displacement). Revenue sums stay decimal-
    exact; each |share - 1/n| is a fixed 3-op double epilogue and the
    final sum accumulates through decimal."""
    o = read_table(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev")
    )
    tot = per_cust.agg(
        F.sum("rev").alias("T"), F.count(F.lit(1)).alias("n")
    )
    j = per_cust.crossJoin(F.broadcast(tot))
    dev = F.abs(
        F.col("rev").cast("double") / F.col("T").cast("double")
        - F.lit(1.0) / F.col("n").cast("double")
    )
    return j.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        (_dsum(dev) / F.lit(2.0)).alias("hoover"),
    )


def _q_freshness_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-table freshness/staleness dashboard: per fact table, the
    newest event-time watermark, row count, and days of history — the
    one-glance "is ingestion alive" audit every warehouse runs. One
    tiny aggregate per table unioned (each scan prunes to its time
    column only)."""
    ev = read_table(spark, sf, "events").agg(
        F.lit("events").alias("table_name"),
        F.max(F.col("ts").cast("date")).alias("max_day"),
        F.min(F.col("ts").cast("date")).alias("min_day"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    o = read_table(spark, sf, "orders").agg(
        F.lit("orders").alias("table_name"),
        F.max(F.col("o_orderdate").cast("date")).alias("max_day"),
        F.min(F.col("o_orderdate").cast("date")).alias("min_day"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    li = read_table(spark, sf, "lineitem").agg(
        F.lit("lineitem").alias("table_name"),
        F.max(F.col("l_shipdate").cast("date")).alias("max_day"),
        F.min(F.col("l_shipdate").cast("date")).alias("min_day"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    u = ev.unionByName(o).unionByName(li)
    return u.select(
        "table_name",
        "max_day",
        "min_day",
        (F.datediff(F.col("max_day"), F.col("min_day")) + 1)
        .cast("int")
        .alias("span_days"),
        "n_rows",
    )


def _q_skyline_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Skyline (Pareto-optimal) parts on (retail price LOW, size
    HIGH): parts no other part dominates on both dimensions — the
    classic multi-objective shortlist operator (SQL:2023's
    conceptual SKYLINE). Implemented as the O(n log n) SWEEP, not a
    pair join: per-price max size, running max over strictly cheaper
    prices (a lag of the cumulative max over the price-sorted
    aggregate), then a row is dominated iff a strictly cheaper price
    reached >= its size, or its own price group holds a strictly
    larger size. One aggregate + one tiny-frame window — no
    nested-loop join at any scale. The DuckDB oracle keeps the
    NOT-EXISTS definition, so the sweep is verified against the
    textbook semantics."""
    p = read_table(spark, sf, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    grp = p.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))
    wprice = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grp.select(
        "p_retailprice", "gmax", F.max("gmax").over(wprice).alias("cummax")
    )
    runmax = cum.select(
        "p_retailprice",
        "gmax",
        F.lag("cummax").over(Window.orderBy("p_retailprice")).alias(
            "strict_max"
        ),
    )
    j = p.join(F.broadcast(runmax), "p_retailprice")
    sky = j.where(
        (
            F.col("strict_max").isNull()
            | (F.col("strict_max") < F.col("p_size"))
        )
        & (F.col("gmax") <= F.col("p_size"))
    )
    return sky.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("price"),
        F.col("p_size").cast("int").alias("size"),
    )


def _q_seasonal_index(spark: SparkSession, sf: str) -> DataFrame:
    """Classical multiplicative seasonal indices (ratio-to-moving-
    average, the X-11 first step): daily count over its centered 7-day
    moving average, averaged per day-of-week — the SQL-native
    counterpart of q26's additive applyInPandas decomposition.
    Centered MA requires a full +/-3-day window (edges excluded);
    integer sums, ratio and the per-dow mean via the decimal-sum
    convention."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    wc = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    k = F.count(F.lit(1)).over(wc)
    ma = F.sum("n").over(wc).cast("double") / k.cast("double")
    ratios = daily.select(
        "event_type",
        F.dayofweek("d").alias("dow"),
        F.when(k == 7, F.col("n").cast("double") / ma).alias("ratio"),
    ).where(F.col("ratio").isNotNull())
    return ratios.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        _davg(F.col("ratio")).alias("seasonal_index"),
    )


def _q_abc_xyz(spark: SparkSession, sf: str) -> DataFrame:
    """ABC-XYZ inventory segmentation: q244's revenue-Pareto ABC
    classes crossed with demand-variability XYZ classes (coefficient
    of variation of weekly quantity: X < 0.5 steady, Y < 1.0, Z
    erratic) — the 9-cell planning matrix. CV from exact integer
    weekly moments (n*S2 - S1^2); the class-cell aggregate rides the
    same per-part frame as the Pareto window."""
    li = read_table(spark, sf, "lineitem")
    rev = li.groupBy("l_partkey").agg(F.sum(_revenue()).alias("__rev"))
    wcum = Window.orderBy(F.col("__rev").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    share = (
        F.sum("__rev").over(wcum).cast("double")
        / F.sum("__rev").over(wall).cast("double")
    )
    abc = rev.select(
        "l_partkey",
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc"
        ),
    )
    weekly = li.groupBy(
        "l_partkey", F.date_trunc("week", F.col("l_shipdate")).alias("w")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(18,2)") * 100).cast(
        "decimal(38,0)"
    ).alias("q"))
    mom = weekly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("q").alias("s1"),
        F.sum(
            (F.col("q") * F.col("q")).cast("decimal(38,0)")
        ).alias("s2"),
    )
    nd = F.col("k").cast("decimal(12,0)")
    var_num = (nd * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    cv = (F.sqrt(var_num) / F.col("k").cast("double")) / (
        F.col("s1").cast("double") / F.col("k").cast("double")
    )
    xyz = mom.select(
        "l_partkey",
        F.when(F.col("k") < 2, "Z")
        .when(cv < 0.5, "X")
        .when(cv < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    cells = abc.join(xyz, "l_partkey").groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    return cells


def _q_term_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Church-Gale term burstiness: collection frequency over document
    frequency per term — cf/df = 1 means a term never repeats within
    a doc (function-word behavior), high values flag topical/bursty
    terms (content words, spam runs). One explode feeds both counts;
    integer ratio, top-20 by (burstiness desc, term) with cf >= 10."""
    docs = read_table(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("t"))
    stats = tok.groupBy("t").agg(
        F.count(F.lit(1)).alias("cf"),
        F.count_distinct("doc_id").alias("df"),
    ).where(F.col("cf") >= 10)
    burst = stats.select(
        F.col("t").alias("term"),
        "cf",
        "df",
        (F.col("cf").cast("double") / F.col("df").cast("double")).alias(
            "burstiness"
        ),
    )
    wtop = Window.orderBy(F.col("burstiness").desc(), F.col("term"))
    return (
        burst.withColumn("rk", F.row_number().over(wtop))
        .where(F.col("rk") <= 20)
        .select(F.col("rk").cast("int").alias("rk"), "term", "cf", "df", "burstiness")
    )


def _q_join_size_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """Join-cardinality estimation BEFORE the join: |A join B on k| =
    sum over keys of cA(k)*cB(k), computed from the two key-frequency
    frames — the explosion audit that decides salting/broadcast
    strategy (q217's skew advisor generalized to output size). The
    query also runs the real join count so the estimate's exactness
    is verified in-row (they must be equal for an equi-join — the
    'estimate' is exact; the point is it costs two aggregates instead
    of the join)."""
    o = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    ca = o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("cnt_a"))
    cb = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cnt_b"))
    est = (
        ca.join(cb, ca["o_orderkey"] == cb["l_orderkey"])
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("est_rows"))
    )
    actual = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    return est.crossJoin(actual).select(
        "est_rows",
        "actual_rows",
        (F.col("est_rows") == F.col("actual_rows")).alias("exact"),
    )


def _q_rare_collapse(spark: SparkSession, sf: str) -> DataFrame:
    """Rare-category collapse: (event_type, json k-prop) crossed
    categories with support < 25 fold into '__other__' — the
    cardinality-control encoder every feature table applies before
    one-hot/target encoding (unbounded tails blow up model width and
    leak singletons). Two hash aggregates; the support map is
    broadcast-sized."""
    ev = read_table(spark, sf, "events")
    cat = F.concat_ws(
        "|", F.col("event_type"), F.get_json_object(F.col("props"), "$.k")
    )
    counts = ev.select(cat.alias("cat")).groupBy("cat").agg(
        F.count(F.lit(1)).alias("n")
    )
    folded = counts.select(
        F.when(F.col("n") >= 25, F.col("cat"))
        .otherwise("__other__")
        .alias("category"),
        "n",
    )
    return folded.groupBy("category").agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_source_cats"),
    )


def _q_loo_target_encoding(spark: SparkSession, sf: str) -> DataFrame:
    """Leave-one-out target encoding: each event's type encoded as the
    mean target (value) of its OWN group excluding the row itself —
    (S_g - x_i)/(n_g - 1), the leakage-safe categorical encoder.
    Group sums stay decimal-exact (one aggregate, broadcast back);
    the per-row epilogue is one subtraction and one division.
    Emitted per-row (event_id) so the oracle verifies every encoding,
    not just aggregates."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    xi = F.col("value").cast("decimal(18,2)")
    g = ev.groupBy("event_type").agg(
        F.sum(xi.cast(DEC)).alias("sg"),
        F.count(F.lit(1)).alias("ng"),
    )
    j = ev.join(F.broadcast(g), "event_type")
    enc = (F.col("sg") - xi.cast(DEC)).cast("double") / (
        F.col("ng") - 1
    ).cast("double")
    return j.select(
        "event_id",
        "event_type",
        enc.alias("loo_encoding"),
    )


def _q_feature_hashing(spark: SparkSession, sf: str) -> DataFrame:
    """Hashing-trick feature encoder with collision audit: the crossed
    feature (event_type x day-of-week) maps to one of 256 buckets via
    its md5 2-hex-char prefix (engine-portable, no numeric hex
    conversion) — the fixed-width encoder for unbounded crosses.
    Output one row per occupied bucket: row mass and how many distinct
    source crosses collided into it (the audit that picks the hash
    width)."""
    ev = read_table(spark, sf, "events")
    crossed = F.concat_ws(
        "|", F.col("event_type"), F.dayofweek("ts").cast("string")
    )
    b = ev.select(
        crossed.alias("crossed"),
        F.substring(F.md5(F.concat(F.lit("fh1"), crossed)), 1, 2).alias(
            "bucket"
        ),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("crossed").cast("bigint").alias("n_crosses"),
    )


def _q_m_estimate_encoding(spark: SparkSession, sf: str) -> DataFrame:
    """m-estimate (shrinkage) target encoding per event type:
    (S_g + m * mu) / (n_g + m) with m = 20 — the empirical-Bayes
    smoother that pulls small categories toward the global mean
    (the companion to q297's leave-one-out; this one is the
    per-CATEGORY table). Group and global sums decimal-exact; mu and
    the encoding are fixed-order double epilogues."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    xi = F.col("value").cast("decimal(18,2)")
    g = ev.groupBy("event_type").agg(
        F.sum(xi.cast(DEC)).alias("sg"),
        F.count(F.lit(1)).alias("ng"),
    )
    tot = ev.agg(
        F.sum(xi.cast(DEC)).alias("st"), F.count(F.lit(1)).alias("nt")
    )
    j = g.crossJoin(F.broadcast(tot))
    mu = F.col("st").cast("double") / F.col("nt").cast("double")
    enc = (F.col("sg").cast("double") + F.lit(20.0) * mu) / (
        F.col("ng").cast("double") + F.lit(20.0)
    )
    raw = F.col("sg").cast("double") / F.col("ng").cast("double")
    return j.select(
        "event_type",
        F.col("ng").cast("bigint").alias("n"),
        raw.alias("raw_mean"),
        enc.alias("m_encoding"),
    )


def _q_window_dataset(spark: SparkSession, sf: str) -> DataFrame:
    """Supervised window-dataset builder: per series, the trailing-7
    daily counts as the feature vector and the NEXT day as the label —
    the (X, y) constructor every sequence model trains on (q10's
    lead-as-label generalized to a window of features). collect_list
    over an ORDERED row frame is deterministic; features serialize to
    a CSV string so the differential hash covers every element. Rows
    without a full window or a label are excluded — no padded
    leakage."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d")
    wf = wt.rowsBetween(-6, 0)
    feat = F.collect_list(F.col("n").cast("string")).over(wf)
    built = daily.select(
        "event_type",
        "d",
        F.when(F.count(F.lit(1)).over(wf) == 7, F.array_join(feat, ",")).alias(
            "features_csv"
        ),
        F.lead("n").over(wt).alias("label"),
    )
    return built.where(
        F.col("features_csv").isNotNull() & F.col("label").isNotNull()
    )


def _q_multihot_encoding(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-hot behavioral encoding: each user's event-type SET packed
    into one integer bitmask via bit_or(1 << type_index) — the
    fixed-width set encoder (feeds GBDTs, joins cheaply, and the
    bitmask aggregate is a map-side-combining one-pass reduction
    where collect_set is not). Also reports popcount (n_types) and
    the decoded membership flags so the mask is auditable."""
    ev = read_table(spark, sf, "events")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .when(F.col("event_type") == "view", 16)
        .otherwise(32)
    )
    masked = ev.select("user_id", bit.cast("bigint").alias("bit"))
    per_user = masked.groupBy("user_id").agg(
        F.expr("bit_or(bit)").alias("mask")
    )
    return per_user.select(
        "user_id",
        "mask",
        F.bit_count("mask").cast("int").alias("n_types"),
        (F.col("mask").bitwiseAND(4) > 0).alias("has_purchase"),
        (F.col("mask").bitwiseAND(2) > 0).alias("has_error"),
    )


def _q_clustering_coeff(spark: SparkSession, sf: str) -> DataFrame:
    """Global clustering coefficient of the user co-engagement graph
    (users linked when active on the same event_type x day): C =
    3 * triangles / open_triads, with triads = sum over nodes of
    deg*(deg-1)/2 — the one-number transitivity summary on top of
    q100's triangle count. Triangle counting uses the same
    degree-oriented compact-forward shape (each triangle counted
    once); everything is integer until the final division."""
    ev = read_table(spark, sf, "events")
    grp = ev.select(
        "user_id",
        F.concat_ws(
            "|", "event_type", F.date_trunc("day", F.col("ts")).cast("string")
        ).alias("g"),
    ).distinct()
    a = grp.select(F.col("g"), F.col("user_id").alias("u"))
    b = grp.select(F.col("g").alias("g2"), F.col("user_id").alias("v"))
    edges = (
        a.join(b, (F.col("g") == F.col("g2")) & (F.col("u") < F.col("v")))
        .select("u", "v")
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionByName(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    triads = deg.agg(
        F.expr("sum((d * (d - 1)) div 2)").cast("bigint").alias("triads")
    )
    # compact-forward: orient edges low->high, join wedges u<v<w
    e1 = edges.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = edges.select(F.col("u").alias("y2"), F.col("v").alias("z"))
    wedges = e1.join(e2, F.col("y") == F.col("y2")).select("x", "y", "z")
    closed = wedges.join(
        edges.select(F.col("u").alias("x"), F.col("v").alias("z")),
        ["x", "z"],
        "left_semi",
    )
    tri = closed.agg(F.count(F.lit(1)).alias("triangles"))
    j = tri.crossJoin(triads)
    return j.select(
        "triangles",
        "triads",
        (
            F.lit(3.0) * F.col("triangles").cast("double")
            / F.col("triads").cast("double")
        ).alias("clustering_coeff"),
    )


def _q_value_at_risk(spark: SparkSession, sf: str) -> DataFrame:
    """Historical one-day Value-at-Risk of daily revenue: the p5/p1
    exact percentiles of day-over-day revenue CHANGES — "how bad is a
    normal bad day", the finance risk summary repurposed for any KPI.
    Daily revenue stays decimal-exact; deltas are one double
    subtraction per day (ordered lag); percentiles interpolate over
    the tiny day frame identically in both engines."""
    o = read_table(spark, sf, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev")
    )
    wt = Window.orderBy("d")
    deltas = daily.select(
        (F.col("rev") - F.lag("rev").over(wt)).alias("chg")
    ).where(F.col("chg").isNotNull())
    return deltas.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.percentile("chg", F.lit(0.05)).alias("var_95"),
        F.percentile("chg", F.lit(0.01)).alias("var_99"),
        F.min("chg").alias("worst_day"),
    )


def _q_partition_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Write-layout skew audit: rows per (ship-date day) partition with
    the max/mean ratio and coefficient of variation — the pre-write
    diagnostic that decides whether a date-partitioned sink needs
    salting or coarser grain (q217's join-key advisor pointed at
    physical layout). Integer moments, fixed epilogue."""
    li = read_table(spark, sf, "lineitem")
    per = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.max("n").alias("mx"),
    )
    mean = F.col("s1").cast("double") / F.col("k").cast("double")
    std = F.sqrt(
        (F.col("k") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    ) / F.col("k").cast("double")
    return agg.select(
        F.col("k").cast("bigint").alias("n_partitions"),
        F.col("mx").alias("max_rows"),
        mean.alias("mean_rows"),
        (F.col("mx").cast("double") / mean).alias("max_over_mean"),
        (std / mean).alias("cv"),
    )


def _q_lang_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID confusion matrix: labeled lang x heuristic lang_id
    prediction counts with per-truth-row recall — the classifier
    evaluation grid that turns q31's per-doc predictions into the
    audit a curation pipeline actually reviews. One aggregate over
    the prediction frame; recall is one division against a window
    sum."""
    docs = read_table(spark, sf, "documents")
    pred = docs.select("lang", lang_id("text").alias("pred"))
    cells = pred.groupBy("lang", "pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    wl = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "pred",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wl).cast("double")).alias(
            "row_share"
        ),
    )


def _q_detector_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Self-validating detector benchmark: deterministically inject
    anomalies (md5-chosen ~20% of (type, day) cells get a +60% count
    boost), run the trailing-average spike detector on the MODIFIED
    series, and score it against the known injection set — precision /
    recall / F1 per event type, the evaluation harness that turns
    "we have detectors" into "we know their operating point". The
    injection is hash-seeded so both engines agree on ground truth."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    injected = (
        F.substring(
            F.md5(
                F.concat(
                    F.lit("inj"),
                    F.col("event_type"),
                    F.col("d").cast("date").cast("string"),
                )
            ),
            1,
            8,
        )
        < _thr(0.2)
    )
    boosted = daily.select(
        "event_type",
        "d",
        injected.alias("is_injected"),
        F.when(injected, (F.col("n") * 16) / 10)
        .otherwise(F.col("n").cast("double"))
        .alias("nb"),
    )
    wt = Window.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
    trailing = F.sum("nb").over(wt) / F.count(F.lit(1)).over(wt)
    scored = boosted.withColumn(
        "flagged",
        F.when(
            trailing.isNotNull() & (F.col("nb") > F.lit(1.3) * trailing), 1
        ).otherwise(0),
    )
    per_type = scored.groupBy("event_type").agg(
        F.sum(F.when(F.col("is_injected") & (F.col("flagged") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(~F.col("is_injected") & (F.col("flagged") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(F.col("is_injected") & (F.col("flagged") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
    )
    return per_type.select(
        "event_type",
        "tp",
        "fp",
        "fn",
        prec.alias("precision"),
        rec.alias("recall"),
    )


def _q_srm_check(spark: SparkSession, sf: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the hash split: observed
    train/val/test user counts vs the designed 80/10/10, scored by the
    chi-square statistic Σ(obs-exp)²/exp — the first thing any
    experimentation platform checks before trusting a split (a biased
    hash or filtered population shows up here, not in the metrics).
    Counts integer; expectations and the statistic are a fixed double
    epilogue; the 3-row split frame carries the report."""
    from sensor_time_series_pyspark_spark.operators import hash_split

    ev = read_table(spark, sf, "events")
    users = ev.select("user_id").distinct()
    out = hash_split(
        users, "user_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="v1"
    )
    counts = out.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("nt"))
    j = counts.crossJoin(F.broadcast(tot))
    expected = (
        F.when(F.col("split") == "train", 0.8)
        .otherwise(0.1)
        * F.col("nt").cast("double")
    )
    chi = (F.col("n").cast("double") - expected) * (
        F.col("n").cast("double") - expected
    ) / expected
    per_split = j.select("split", "n", expected.alias("expected"), chi.alias("chi2_term"))
    return per_split.select(
        "split",
        "n",
        "expected",
        "chi2_term",
    )


def _q_temporal_integrity(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal referential-integrity audit across the order lifecycle:
    lineitems shipped BEFORE their order date (causality violation)
    and shipped more than 90 days after (SLA/staleness anomaly) —
    the cross-table temporal checks a validation suite runs beyond
    single-column ranges (q51) and key orphans (q218). One
    broadcast-joined scan, one conditional aggregate."""
    li = read_table(spark, sf, "lineitem")
    o = read_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    gap = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    viol = F.sum(F.when(gap < 0, 1).otherwise(0)).cast("bigint")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        viol.alias("ship_before_order"),
        F.sum(F.when(gap > 90, 1).otherwise(0)).cast("bigint").alias(
            "ship_after_90d"
        ),
        F.max(gap).cast("int").alias("max_gap_days"),
        F.min(gap).cast("int").alias("min_gap_days"),
    )


def _q_mix_shift(spark: SparkSession, sf: str) -> DataFrame:
    """Composition mix-shift monitor: each month's order-priority
    share vs the all-time share, summarized per month by total
    variation distance (half the L1 gap) — the "did the traffic mix
    change" screen that catches silent upstream re-weighting before
    any volume alarm fires. Integer counts; shares and the TVD sum
    accumulate through the decimal convention."""
    o = read_table(spark, sf, "orders")
    mp = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n"))
    wm = Window.partitionBy("m")
    overall = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("no")
    )
    wall = Window.partitionBy()
    ref = overall.select(
        "o_orderpriority",
        (
            F.col("no").cast("double") / F.sum("no").over(wall).cast("double")
        ).alias("ref_share"),
    )
    cells = mp.select(
        "m",
        "o_orderpriority",
        (F.col("n").cast("double") / F.sum("n").over(wm).cast("double")).alias(
            "share"
        ),
    ).join(F.broadcast(ref), "o_orderpriority")
    return cells.groupBy("m").agg(
        (_dsum(F.abs(F.col("share") - F.col("ref_share"))) / F.lit(2.0)).alias(
            "tvd"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_priorities"),
    )


def _q_ljung_box(spark: SparkSession, sf: str) -> DataFrame:
    """Ljung-Box portmanteau statistic per event type: Q = N(N+2)
    sum_k r_k^2/(N-k) over lags 1-5 — "is there ANY autocorrelation
    left", the residual-whiteness gate after a forecast fit. Reuses
    the exact-moment ACF (q82's operator, decimal moments, fixed
    epilogue); the final sum over the 5-lag frame accumulates through
    decimal; N is the series length."""
    from sensor_time_series_pyspark_spark.operators import acf

    ev = read_table(spark, sf, "events")
    r = acf(ev, ["event_type"], "ts", "value", max_lag=5)
    ns = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("len"))
    j = r.join(F.broadcast(ns), "event_type").where(F.col("acf").isNotNull())
    term = (F.col("acf") * F.col("acf")) / (
        F.col("len") - F.col("lag")
    ).cast("double")
    per = j.groupBy("event_type").agg(
        F.max("len").alias("len"),
        _dsum(term).alias("ssum"),
        F.count(F.lit(1)).cast("bigint").alias("n_lags"),
    )
    q = (
        F.col("len").cast("double")
        * (F.col("len") + 2).cast("double")
        * F.col("ssum")
    )
    return per.select(
        "event_type",
        F.col("len").cast("bigint").alias("n_obs"),
        "n_lags",
        q.alias("ljung_box_q"),
    )


def _q_fd_discovery(spark: SparkSession, sf: str) -> DataFrame:
    """Functional-dependency discovery over candidate column pairs of
    orders: A -> B holds iff countDistinct(A) == countDistinct(A, B)
    — the schema-inference primitive behind normalization advice and
    join-key validation (profiling family, one distinct-aggregate per
    pair over the same scan). Reports both counts and the verdict per
    candidate pair."""
    o = read_table(spark, sf, "orders")
    pairs = [
        ("o_orderkey", "o_custkey"),
        ("o_orderkey", "o_orderstatus"),
        ("o_custkey", "o_orderpriority"),
        ("o_orderdate", "o_orderstatus"),
    ]
    aggs = []
    for a, b in pairs:
        aggs.append(F.count_distinct(F.col(a)).alias(f"__l_{a}_{b}"))
        aggs.append(
            F.count_distinct(F.col(a), F.col(b)).alias(f"__p_{a}_{b}")
        )
    wide = o.agg(*aggs)
    rows = []
    for a, b in pairs:
        rows.append(
            F.struct(
                F.lit(a).alias("lhs"),
                F.lit(b).alias("rhs"),
                F.col(f"__l_{a}_{b}").alias("n_lhs"),
                F.col(f"__p_{a}_{b}").alias("n_pair"),
                (F.col(f"__l_{a}_{b}") == F.col(f"__p_{a}_{b}")).alias(
                    "is_fd"
                ),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("s")).select(
        "s.lhs", "s.rhs", "s.n_lhs", "s.n_pair", "s.is_fd"
    )


def _q_order_inversions(spark: SparkSession, sf: str) -> DataFrame:
    """Clock-skew detector: per user, the count of event pairs whose
    event_id order disagrees with their timestamp order (Kendall-tau
    distance between the two orderings) — nonzero inversions flag
    out-of-order ingestion or device clock drift. The pair join is
    per-user over the (id, ts) projection; PURE INTEGER counts. At
    scale the same check runs per (user, day) shard — the pair frame
    stays bounded by the shard size."""
    ev = read_table(spark, sf, "events")
    a = ev.select(
        "user_id", F.col("event_id").alias("ia"), F.col("ts").alias("ta")
    )
    b = ev.select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("ib"),
        F.col("ts").alias("tb"),
    )
    pairs = a.join(
        b, (F.col("user_id") == F.col("u2")) & (F.col("ia") < F.col("ib"))
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("ta") > F.col("tb"), 1).otherwise(0))
        .cast("bigint")
        .alias("inversions"),
        (
            F.sum(F.when(F.col("ta") > F.col("tb"), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("inversion_rate"),
    )


def _q_dataset_card(spark: SparkSession, sf: str) -> DataFrame:
    """One-row corpus datasheet: the dataset-card numbers every
    release ships — doc/token/char totals, vocabulary size, language
    count, exact-duplicate rate, and mean doc length — assembled from
    ONE token explode plus one doc-level aggregate (the same
    reductions q17/q22/q250 use, composed into the release artifact).
    Integer counts; two fixed final divisions."""
    docs = read_table(spark, sf, "documents")
    per_doc = docs.select(
        "doc_id",
        "lang",
        token_count("text").alias("nt"),
        F.length("text").alias("nc"),
        F.md5(F.col("text")).alias("h"),
    )
    tok = docs.select(F.explode(tokens("text")).alias("t"))
    vocab = tok.agg(F.count_distinct("t").alias("vocab"))
    agg = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
        F.sum("nc").cast("bigint").alias("n_chars"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.count_distinct("h").alias("n_unique_texts"),
    )
    j = agg.crossJoin(F.broadcast(vocab))
    return j.select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_langs",
        "vocab",
        (
            (F.col("n_docs") - F.col("n_unique_texts")).cast("double")
            / F.col("n_docs").cast("double")
        ).alias("exact_dup_rate"),
        (F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")).alias(
            "mean_doc_tokens"
        ),
    )


def _q_zonemap_skipping(spark: SparkSession, sf: str) -> DataFrame:
    """Zone-map (min-max statistics) skipping audit: per ship-day
    partition, the min/max of l_extendedprice, and for a
    price > 45000 predicate the count/fraction of partitions whose
    max proves them skippable — the data-skipping effectiveness
    report that decides whether a sort/Z-order rewrite pays for
    itself (sources/maintenance.py:write_zordered is the rewrite;
    this measures the win). One aggregate builds the zone maps; the
    verdict is a map-side flag over the tiny partition frame."""
    li = read_table(spark, sf, "lineitem")
    zones = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.min("l_extendedprice").alias("zmin"),
        F.max("l_extendedprice").alias("zmax"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    skippable = F.when(F.col("zmax") <= 45000.0, 1).otherwise(0)
    return zones.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
        F.sum(skippable).cast("bigint").alias("n_skippable"),
        (
            F.sum(skippable).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("skip_fraction"),
        F.sum(F.when(skippable == 1, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_skipped"),
    )


def _q_gains_table(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative gains / decile lift table for the activity-predicts-
    conversion score of q200: users ranked by activity (desc,
    user_id tiebreak) into 10 equal-count bins; per decile the
    conversion count, cumulative capture rate, and lift over the base
    rate — the campaign-targeting companion to AUC (one number) that
    shows WHERE the ranking earns its keep. ntile over the bounded
    user frame; integer counts, fixed-order divisions."""
    ev = read_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("activity"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    wrank = Window.orderBy(F.col("activity").desc(), F.col("user_id"))
    binned = per_user.withColumn("decile", F.ntile(10).over(wrank))
    per_dec = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_conv"),
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot_conv = F.sum("n_conv").over(wall)
    tot_users = F.sum("n_users").over(wall)
    base_rate = tot_conv.cast("double") / tot_users.cast("double")
    return per_dec.select(
        F.col("decile").cast("int").alias("decile"),
        "n_users",
        F.col("n_conv").cast("bigint").alias("n_conv"),
        (F.sum("n_conv").over(wcum).cast("double") / tot_conv.cast("double")).alias(
            "cum_capture"
        ),
        (
            (F.col("n_conv").cast("double") / F.col("n_users").cast("double"))
            / base_rate
        ).alias("lift"),
    )


def _q_delta_method(spark: SparkSession, sf: str) -> DataFrame:
    """Delta-method standard error for the ratio metric value-per-
    event, computed per event type over user-level (X_u = value sum,
    Y_u = event count) pairs: var(X/Y) ~ (mx/my)^2 (vx/mx^2 + vy/my^2
    - 2 cxy/(mx my)) / n — the experimentation-platform machinery for
    ratio KPIs, where naive per-row variance is simply wrong. All
    five moments (and the cross term) accumulate as exact decimals;
    the epilogue is one fixed IEEE sequence."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    xi = (F.col("x") * 100).cast("decimal(19,0)")
    yi = F.col("y").cast("decimal(19,0)")
    d38 = "decimal(38,0)"
    s = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast(d38)).alias("sx"),
        F.sum(yi.cast(d38)).alias("sy"),
        F.sum((xi * xi).cast(d38)).alias("sxx"),
        F.sum((yi * yi).cast(d38)).alias("syy"),
        F.sum((xi * yi).cast(d38)).alias("sxy"),
    )
    nd = F.col("n").cast("decimal(12,0)")
    nD = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / nD
    my = F.col("sy").cast("double") / nD
    vx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double") / (
        nD * nD
    )
    vy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double") / (
        nD * nD
    )
    cxy = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        nD * nD
    )
    ratio = mx / my
    rel_var = vx / (mx * mx) + vy / (my * my) - F.lit(2.0) * cxy / (mx * my)
    se = F.sqrt((ratio * ratio) * rel_var / nD)
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_users"),
        # scaled x100: ratio reported in original units by one division
        (ratio / F.lit(100.0)).alias("ratio"),
        (se / F.lit(100.0)).alias("se_delta"),
    )


def _q_winsorized_mean(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorized mean of value per event type: observations clamped
    to the exact [p5, p95] percentiles before averaging — the robust
    location estimate that keeps every row (unlike trimming) while
    bounding tail influence. Percentiles interpolate over the same
    sorted doubles in both engines (q60 guarantee); the clamped mean
    uses the decimal-sum convention."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("p5"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    clamped = F.least(F.greatest(F.col("value"), F.col("p5")), F.col("p95"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _davg(F.col("value")).alias("raw_mean"),
        _davg(clamped).alias("winsorized_mean"),
    )


def _q_tail_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Tail attribution: which event types drive the global p99 of
    value — rows above the exact 99th percentile counted and
    mass-weighted per type, with each type's share of the tail vs its
    share of the body — the "who owns the tail latency" question
    asked of any SLO. One exact percentile over the fact, one
    broadcast threshold, one conditional aggregate."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    thr = ev.agg(F.percentile("value", F.lit(0.99)).alias("p99"))
    j = ev.crossJoin(F.broadcast(thr))
    tail = F.when(F.col("value") > F.col("p99"), 1).otherwise(0)
    per_type = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(tail).cast("bigint").alias("n_tail"),
        F.max("p99").alias("p99"),
    )
    wall = Window.partitionBy()
    return per_type.select(
        "event_type",
        "n",
        "n_tail",
        "p99",
        (
            F.col("n_tail").cast("double")
            / F.sum("n_tail").over(wall).cast("double")
        ).alias("tail_share"),
        (F.col("n").cast("double") / F.sum("n").over(wall).cast("double")).alias(
            "body_share"
        ),
    )


def _q_log2_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """HDR-style log2 histogram of interarrival gaps per event type:
    bucket = floor(log2(gap_seconds)), computed EXACTLY as the length
    of the integer's binary representation minus one (no libm log2 —
    boundary values like 4096 land in the right bucket on every
    engine). The constant-relative-error latency histogram that
    fixed-width bins (q76) can't provide across 6 decades. Gaps of 0
    land in bucket 0; one window lag + one hash aggregate."""
    ev = read_table(spark, sf, "events")
    wlag = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    g = (
        F.col("ts").cast("long")
        - F.lag(F.col("ts").cast("long")).over(wlag)
    )
    gaps = ev.select("event_type", g.alias("g")).where(
        F.col("g").isNotNull()
    )
    bucket = F.when(F.col("g") <= 0, 0).otherwise(
        F.length(F.bin(F.col("g"))) - 1
    )
    return gaps.groupBy(
        "event_type", bucket.cast("int").alias("log2_bucket")
    ).agg(F.count(F.lit(1)).alias("n"))


def _q_periodicity_detector(spark: SparkSession, sf: str) -> DataFrame:
    """Scheduled-job / cron-bot detector: each user's MODAL
    interarrival gap (rounded to the minute) and the share of gaps
    hitting it — humans spread across gaps, schedulers concentrate
    (share near 1 at a fixed period). Integer minute gaps, one
    aggregate to (user, gap) counts, one deterministic-tiebreak
    row_number over that tiny frame. Users with < 5 gaps excluded."""
    ev = read_table(spark, sf, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = (
        F.col("ts").cast("long")
        - F.lag(F.col("ts").cast("long")).over(wlag)
    )
    gaps = ev.select(
        "user_id", F.floor(g / 60).cast("bigint").alias("gap_min")
    ).where(F.col("gap_min").isNotNull())
    per_gap = gaps.groupBy("user_id", "gap_min").agg(
        F.count(F.lit(1)).alias("n")
    )
    wtot = Window.partitionBy("user_id")
    wrk = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("gap_min")
    )
    ranked = per_gap.withColumn("total", F.sum("n").over(wtot)).withColumn(
        "rk", F.row_number().over(wrk)
    )
    return (
        ranked.where((F.col("rk") == 1) & (F.col("total") >= 5))
        .select(
            "user_id",
            F.col("gap_min").alias("modal_gap_min"),
            F.col("n").cast("bigint").alias("n_at_mode"),
            F.col("total").cast("bigint").alias("n_gaps"),
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "mode_share"
            ),
        )
    )


def _q_rle_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """Run-length-encoding compressibility estimate per column of the
    sorted event stream: rows over value-change runs (lag != current)
    for event_type and user_id under (ts, event_id) order — the
    layout witness that predicts parquet RLE/dictionary win and
    whether a sort-before-write pays (sources/maintenance.py:
    write_sorted is the rewrite; this measures the prize). One window
    pass computes both columns' run starts."""
    ev = read_table(spark, sf, "events")
    w = Window.orderBy("ts", "event_id")
    runs = ev.select(
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0).alias("rt"),
        F.when(
            F.lag("user_id").over(w).isNull()
            | (F.lag("user_id").over(w) != F.col("user_id")),
            1,
        ).otherwise(0).alias("ru"),
    )
    agg = runs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("rt").cast("bigint").alias("runs_event_type"),
        F.sum("ru").cast("bigint").alias("runs_user_id"),
    )
    return agg.select(
        "n_rows",
        "runs_event_type",
        "runs_user_id",
        (
            F.col("n_rows").cast("double")
            / F.col("runs_event_type").cast("double")
        ).alias("rle_ratio_event_type"),
        (
            F.col("n_rows").cast("double")
            / F.col("runs_user_id").cast("double")
        ).alias("rle_ratio_user_id"),
    )


def _q_hellinger_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Hellinger distance between the first- and second-half event-
    type distributions: H^2 = 1 - sum sqrt(p_i * q_i) — the bounded
    [0,1] distribution distance that needs only sqrt (IEEE correctly
    rounded; no log, unlike KL/PSI). Counts integer; each
    sqrt(p*q) term is a fixed double sequence; the 5-term sum
    accumulates through decimal. Complements TVD (q81: overlap mass)
    and EMD (q270: transport cost) with the geometric view."""
    ev = read_table(spark, sf, "events")
    half = F.when(F.col("ts") < F.lit("2024-01-16"), "a").otherwise("b")
    counts = ev.groupBy("event_type", half.alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wtot = Window.partitionBy("h")
    shares = counts.select(
        "event_type",
        "h",
        (F.col("n").cast("double") / F.sum("n").over(wtot).cast("double")).alias(
            "p"
        ),
    )
    grid = (
        shares.groupBy("event_type")
        .pivot("h", ["a", "b"])
        .agg(F.first("p"))
        .na.fill({"a": 0.0, "b": 0.0})
    )
    term = F.sqrt(F.col("a") * F.col("b"))
    return grid.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
        (F.lit(1.0) - _dsum(term)).alias("hellinger_sq"),
    )


def _q_grubbs(spark: SparkSession, sf: str) -> DataFrame:
    """Grubbs' test statistic per event type: G = max|x - mean| / sd
    with the offending day identified (worst |z|, earliest-day
    tiebreak) — the single-outlier screen on the daily count series
    that reports WHICH point to investigate, where q261's charts
    report which rule fired. Mean/sd from exact integer whole-series
    moments; one sqrt, one division, one argmax window."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    wall = Window.partitionBy("event_type")
    k = F.count(F.lit(1)).over(wall)
    s1 = F.sum("n").over(wall)
    s2 = F.sum(F.col("n") * F.col("n")).over(wall)
    mean = s1.cast("double") / k.cast("double")
    sd = F.sqrt((k * s2 - s1 * s1).cast("double")) / k.cast("double")
    scored = daily.select(
        "event_type",
        "d",
        "n",
        (F.abs(F.col("n").cast("double") - mean) / sd).alias("g"),
        k.cast("bigint").alias("n_days"),
    )
    wbest = Window.partitionBy("event_type").orderBy(
        F.col("g").desc(), F.col("d")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wbest))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            "n_days",
            F.col("d").alias("outlier_day"),
            F.col("n").alias("outlier_n"),
            F.col("g").alias("grubbs_g"),
        )
    )


def _q_runs_test(spark: SparkSession, sf: str) -> DataFrame:
    """Wald-Wolfowitz runs test per event type on the daily count
    series: the count of runs above/below the series MEDIAN vs the
    expectation 1 + 2*n1*n2/(n1+n2) — too few runs = trend/clumping,
    too many = oscillation; the classic randomness screen. Median is
    the exact percentile; signs, run starts (lag), and n1/n2 are pure
    integers; the expectation and z use a fixed sqrt epilogue.
    Median-equal days are excluded (standard convention)."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    wmed = Window.partitionBy("event_type")
    med = F.median("n").over(wmed)
    signed = daily.select(
        "event_type",
        "d",
        F.when(F.col("n").cast("double") > med, 1)
        .when(F.col("n").cast("double") < med, -1)
        .otherwise(0)
        .alias("s"),
    ).where(F.col("s") != 0)
    wt = Window.partitionBy("event_type").orderBy("d")
    runs = signed.select(
        "event_type",
        "s",
        F.when(
            F.lag("s").over(wt).isNull() | (F.lag("s").over(wt) != F.col("s")),
            1,
        ).otherwise(0).alias("new_run"),
    )
    agg = runs.groupBy("event_type").agg(
        F.sum("new_run").cast("bigint").alias("n_runs"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).alias("n2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    tot = n1d + n2d
    exp_runs = F.lit(1.0) + F.lit(2.0) * n1d * n2d / tot
    var_runs = (
        F.lit(2.0) * n1d * n2d * (F.lit(2.0) * n1d * n2d - tot)
    ) / (tot * tot * (tot - F.lit(1.0)))
    z = (F.col("n_runs").cast("double") - exp_runs) / F.sqrt(var_runs)
    return agg.select(
        "event_type",
        "n_runs",
        F.col("n1").cast("bigint").alias("n_above"),
        F.col("n2").cast("bigint").alias("n_below"),
        exp_runs.alias("expected_runs"),
        z.alias("z"),
    )


def _q_kendall_tau(spark: SparkSession, sf: str) -> DataFrame:
    """Kendall tau-b between per-user activity (event count) and
    engagement value (value sum, scaled integer) — the third
    correlation family next to Pearson (q75) and Spearman (q117):
    concordant/discordant PAIR COUNTS with full tie correction, all
    integers until the final sqrt epilogue
    tau_b = (C - D) / sqrt((n0 - tx)(n0 - ty)). The pair join runs
    over the per-user reduction (150 rows at sf0.01), never raw
    events; at scale the O(n^2) pair frame is replaced by the
    merge-sort inversion count per stratum (documented contract)."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x"),
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("decimal(38,0)"))
        .alias("y"),
    )
    a = per_user.select(
        F.col("user_id").alias("ua"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = per_user.select(
        F.col("user_id").alias("ub"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(b, F.col("ua") < F.col("ub"))
    sgn = lambda p, q: F.when(p > q, 1).when(p < q, -1).otherwise(0)  # noqa: E731
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(
            F.when(
                sgn(F.col("xa"), F.col("xb")) * sgn(F.col("ya"), F.col("yb"))
                == 1,
                1,
            ).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when(
                sgn(F.col("xa"), F.col("xb")) * sgn(F.col("ya"), F.col("yb"))
                == -1,
                1,
            ).otherwise(0)
        ).alias("dd"),
        F.sum(F.when(F.col("xa") == F.col("xb"), 1).otherwise(0)).alias("tx"),
        F.sum(F.when(F.col("ya") == F.col("yb"), 1).otherwise(0)).alias("ty"),
    )
    tau = (F.col("c") - F.col("dd")).cast("double") / F.sqrt(
        (F.col("n0") - F.col("tx")).cast("double")
        * (F.col("n0") - F.col("ty")).cast("double")
    )
    return agg.select(
        F.col("n0").cast("bigint").alias("n_pairs"),
        F.col("c").cast("bigint").alias("concordant"),
        F.col("dd").cast("bigint").alias("discordant"),
        F.col("tx").cast("bigint").alias("ties_x"),
        F.col("ty").cast("bigint").alias("ties_y"),
        tau.alias("tau_b"),
    )


def _q_cramers_v(spark: SparkSession, sf: str) -> DataFrame:
    """Cramer's V association between event type and the json k-prop
    parity (a 5x2 contingency): V = sqrt(chi2 / (N * min(r-1, c-1)))
    — the bounded [0,1] summary q118's per-cell chi-square
    contributions roll up to. Observed/expected from pure integer
    counts; each cell term and the final sqrt are fixed double
    sequences accumulated through decimal."""
    ev = read_table(spark, sf, "events")
    parity = (
        F.get_json_object(F.col("props"), "$.k").cast("int") % 2
    ).alias("kp")
    cells = ev.select("event_type", parity).groupBy("event_type", "kp").agg(
        F.count(F.lit(1)).alias("o")
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("kp")
    wall = Window.partitionBy()
    r = F.sum("o").over(wr)
    c = F.sum("o").over(wc)
    n = F.sum("o").over(wall)
    # exact-integer chi2 numerator per cell: (n*o - r*c)^2 / (n*r*c)
    num = (n * F.col("o") - r * c).cast("double")
    den = (n * r * c).cast("double")
    terms = cells.select(
        (num * num / den).alias("t"),
        n.cast("bigint").alias("nn"),
        F.col("event_type"),
        F.col("kp"),
    )
    agg = terms.agg(
        _dsum(F.col("t")).alias("chi2"),
        F.max("nn").alias("nn"),
        F.count_distinct("event_type").alias("r"),
        F.count_distinct("kp").alias("c"),
    )
    v = F.sqrt(
        F.col("chi2")
        / (
            F.col("nn").cast("double")
            * F.least(F.col("r") - 1, F.col("c") - 1).cast("double")
        )
    )
    return agg.select(
        F.col("nn").cast("bigint").alias("n_rows"),
        F.col("r").cast("bigint").alias("n_rows_dim"),
        F.col("c").cast("bigint").alias("n_cols_dim"),
        F.col("chi2").alias("chi2"),
        v.alias("cramers_v"),
    )


def _q_mcnemar(spark: SparkSession, sf: str) -> DataFrame:
    """McNemar's paired test between two anomaly detectors on the SAME
    days: the trailing-average spike rule (q240) vs the Donchian
    break-up rule (q241), both computed from one shared daily
    aggregate; the statistic (b - c)^2 / (b + c) uses only the
    DISCORDANT counts (b = spike-only, c = break-only) — the correct
    way to compare two classifiers on paired data (accuracy deltas
    ignore pairing). Pure integers, one division."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
    trailing = F.sum("n").over(wt).cast("double") / F.count(F.lit(1)).over(wt)
    chan_hi = F.max("n").over(wt)
    flags = daily.select(
        F.when(
            trailing.isNotNull()
            & (F.col("n").cast("double") > F.lit(1.05) * trailing),
            1,
        ).otherwise(0).alias("f_spike"),
        F.when(chan_hi.isNotNull() & (F.col("n") > chan_hi), 1)
        .otherwise(0)
        .alias("f_break"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            F.when((F.col("f_spike") == 1) & (F.col("f_break") == 0), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("f_spike") == 0) & (F.col("f_break") == 1), 1).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("f_spike") == 1) & (F.col("f_break") == 1), 1).otherwise(0)
        ).alias("both"),
    )
    stat = F.when(
        F.col("b") + F.col("c") > 0,
        ((F.col("b") - F.col("c")) * (F.col("b") - F.col("c"))).cast("double")
        / (F.col("b") + F.col("c")).cast("double"),
    )
    return agg.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("b").cast("bigint").alias("spike_only"),
        F.col("c").cast("bigint").alias("break_only"),
        F.col("both").cast("bigint").alias("both_flag"),
        stat.alias("mcnemar_stat"),
    )


def _q_leaderboard_churn(spark: SparkSession, sf: str) -> DataFrame:
    """Leaderboard stability: Jaccard overlap of the top-20
    revenue-ranked parts between the first and second half of the
    shipping window — near 1 means the ranking is signal, near 0
    means noise churn (the metric that decides whether weekly "top
    sellers" reports mean anything). Exact decimal revenue, two
    deterministic rankings, one integer set comparison."""
    li = read_table(spark, sf, "lineitem")
    mid = li.agg(
        F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi")
    ).select(
        F.date_add(
            F.col("lo"),
            F.floor(F.datediff(F.col("hi"), F.col("lo")) / 2).cast("int"),
        ).alias("mid")
    )
    j = li.crossJoin(F.broadcast(mid))
    half = F.when(F.col("l_shipdate") < F.col("mid"), "a").otherwise("b")
    rev = j.groupBy(half.alias("h"), "l_partkey").agg(
        F.sum(_revenue().cast(DEC)).alias("r")
    )
    wr = Window.partitionBy("h").orderBy(F.col("r").desc(), F.col("l_partkey"))
    top = rev.withColumn("rk", F.row_number().over(wr)).where(F.col("rk") <= 20)
    ta = top.where(F.col("h") == "a").select(F.col("l_partkey").alias("p"))
    tb = top.where(F.col("h") == "b").select(F.col("l_partkey").alias("p"))
    inter = ta.join(tb, "p").agg(F.count(F.lit(1)).alias("inter"))
    return inter.select(
        F.col("inter").cast("bigint").alias("n_common"),
        (
            F.col("inter").cast("double")
            / (F.lit(40) - F.col("inter")).cast("double")
        ).alias("topk_jaccard"),
    )


def _q_fold_metric_stability(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-fold metric stability: the per-user conversion rate
    evaluated in each of q264's 5 deterministic md5 folds, with the
    across-fold spread (max - min) and CV — if the metric swings
    across folds, no single-split result is trustworthy. Fold
    assignment is a map-side hash predicate; one aggregate per fold
    frame, exact integer counts, fixed epilogue on the 5-row frame."""
    ev = read_table(spark, sf, "events")
    hexpfx = F.substring(
        F.md5(F.concat(F.lit("cv1"), F.col("user_id").cast("string"))), 1, 8
    )
    fold = (
        F.when(hexpfx < "33333333", 0)
        .when(hexpfx < "66666666", 1)
        .when(hexpfx < "99999999", 2)
        .when(hexpfx < "cccccccc", 3)
        .otherwise(4)
    )
    per_user = ev.select("user_id", fold.alias("fold"), "event_type").groupBy(
        "fold", "user_id"
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    per_fold = per_user.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("conv").alias("n_conv"),
    )
    rate = F.col("n_conv").cast("double") / F.col("n_users").cast("double")
    rated = per_fold.select(
        F.col("fold").cast("int").alias("fold"),
        F.col("n_users").cast("bigint").alias("n_users"),
        rate.alias("conv_rate"),
    )
    wall = Window.partitionBy()
    return rated.select(
        "fold",
        "n_users",
        "conv_rate",
        (F.max("conv_rate").over(wall) - F.min("conv_rate").over(wall)).alias(
            "spread"
        ),
    )


def _q_effective_sample_size(spark: SparkSession, sf: str) -> DataFrame:
    """Kish effective sample size of the temperature-weighted corpus
    (q251's alpha = 0.5 weights): ESS = (sum w)^2 / sum w^2 over
    per-doc weights w = sqrt(source token total) — how many
    equal-weight documents the weighted mixture is worth (the survey-
    statistics number that prices a reweighting scheme's variance
    cost). sqrt is correctly rounded; both sums accumulate through
    decimal; one final division."""
    docs = read_table(spark, sf, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(token_count("text")).alias("tok")
    )
    j = docs.select("doc_id", "source").join(
        F.broadcast(per_src), "source"
    )
    w = F.sqrt(F.col("tok").cast("double"))
    agg = j.agg(
        F.count(F.lit(1)).alias("n_docs"),
        _dsum(w).alias("sw"),
        _dsum(w * w).alias("sww"),
    )
    return agg.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        (F.col("sw") * F.col("sw") / F.col("sww")).alias("ess"),
        (
            F.col("sw") * F.col("sw") / F.col("sww")
            / F.col("n_docs").cast("double")
        ).alias("ess_ratio"),
    )


def _q_series_staleness(spark: SparkSession, sf: str) -> DataFrame:
    """Per-series staleness: each event type's last-seen day vs the
    global watermark, in days behind — the series-level ingestion
    alarm q290's table-level freshness board cannot see (one dead
    series hides inside a healthy table total). One aggregate + one
    broadcast watermark."""
    ev = read_table(spark, sf, "events")
    per = ev.groupBy("event_type").agg(
        F.max(F.col("ts").cast("date")).alias("last_day"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    wm = ev.agg(F.max(F.col("ts").cast("date")).alias("horizon"))
    j = per.crossJoin(F.broadcast(wm))
    return j.select(
        "event_type",
        "last_day",
        "horizon",
        F.datediff(F.col("horizon"), F.col("last_day"))
        .cast("int")
        .alias("days_behind"),
        "n_rows",
    )


def _q_calibration_ece(spark: SparkSession, sf: str) -> DataFrame:
    """Expected calibration error of the activity-predicts-conversion
    score: pseudo-probability = activity / max activity, decile bins
    (ntile over the deterministic ranking), per-bin |accuracy -
    confidence| weighted by bin mass, plus the per-bin reliability
    rows — the calibration diagnostic that AUC (q200) and gains
    (q316) ignore (a perfectly-ranked score can still be wildly
    miscalibrated). Confidence sums are exact rationals over the max;
    ECE accumulates through decimal."""
    ev = read_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("activity"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    wall = Window.partitionBy()
    scored = per_user.select(
        "user_id",
        "conv",
        (
            F.col("activity").cast("double")
            / F.max("activity").over(wall).cast("double")
        ).alias("score"),
    )
    wrank = Window.orderBy(F.col("score").desc(), F.col("user_id"))
    binned = scored.withColumn("bin", F.ntile(10).over(wrank))
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conv").alias("n_conv"),
        _dsum(F.col("score")).alias("sum_score"),
    )
    acc = F.col("n_conv").cast("double") / F.col("n").cast("double")
    conf = F.col("sum_score") / F.col("n").cast("double")
    return per_bin.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("n").cast("bigint").alias("n"),
        acc.alias("accuracy"),
        conf.alias("confidence"),
        F.abs(acc - conf).alias("gap"),
    )


def _q_dispersion_index(spark: SparkSession, sf: str) -> DataFrame:
    """Poisson dispersion (variance-to-mean) index of daily counts per
    event type: D = s^2 / mean — D near 1 is Poisson-compatible
    arrivals, D >> 1 overdispersion (bursts/contagion), D << 1
    regularity (rate limiting) — the first-look arrival-process
    diagnostic. Sample variance from exact integer moments
    (n*S2 - S1^2)/(n(n-1)); two fixed divisions."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    kd = F.col("k").cast("double")
    mean = F.col("s1").cast("double") / kd
    svar = (F.col("k") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "double"
    ) / (kd * (kd - F.lit(1.0)))
    return agg.select(
        "event_type",
        F.col("k").cast("bigint").alias("n_days"),
        mean.alias("mean_daily"),
        svar.alias("var_daily"),
        (svar / mean).alias("dispersion"),
    )


def _q_its_segments(spark: SparkSession, sf: str) -> DataFrame:
    """Interrupted time-series (segmented) regression per event type
    around the known mid-month breakpoint: separate OLS level and
    slope for the before/after segments from exact integer moments,
    plus the level and slope CHANGES — the classic
    policy/deploy-impact readout (did the intervention shift the
    level, bend the trend, or neither). One aggregate per segment on
    the daily frame; fixed-order epilogues."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    widx = Window.partitionBy("event_type").orderBy("d")
    base = daily.withColumn("t", F.row_number().over(widx).cast("bigint"))
    seg = base.withColumn(
        "seg", F.when(F.col("d") < F.lit("2024-01-16"), "pre").otherwise("post")
    )
    mom = seg.groupBy("event_type", "seg").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("t").alias("st"),
        F.sum("n").alias("sx"),
        F.sum(F.col("t") * F.col("n")).alias("stx"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
    )
    den = F.col("k") * F.col("stt") - F.col("st") * F.col("st")
    slope = F.when(
        den > 0,
        (F.col("k") * F.col("stx") - F.col("st") * F.col("sx")).cast("double")
        / den.cast("double"),
    )
    mean_t = F.col("st").cast("double") / F.col("k").cast("double")
    mean_x = F.col("sx").cast("double") / F.col("k").cast("double")
    fitted = mom.select(
        "event_type",
        "seg",
        F.col("k").cast("bigint").alias("n_days"),
        slope.alias("slope"),
        (mean_x - slope * mean_t).alias("intercept"),
        mean_x.alias("level"),
    )
    pre = fitted.where(F.col("seg") == "pre").select(
        "event_type",
        F.col("slope").alias("slope_pre"),
        F.col("level").alias("level_pre"),
    )
    post = fitted.where(F.col("seg") == "post").select(
        F.col("event_type").alias("et2"),
        F.col("slope").alias("slope_post"),
        F.col("level").alias("level_post"),
    )
    return pre.join(post, F.col("event_type") == F.col("et2")).select(
        "event_type",
        "slope_pre",
        "slope_post",
        (F.col("slope_post") - F.col("slope_pre")).alias("slope_change"),
        "level_pre",
        "level_post",
        (F.col("level_post") - F.col("level_pre")).alias("level_change"),
    )


def _q_split_half(spark: SparkSession, sf: str) -> DataFrame:
    """Split-half reliability of per-user engagement with the
    Spearman-Brown correction: correlate each user's ODD-indexed vs
    EVEN-indexed event counts (deterministic row_number parity
    split), then r_full = 2r/(1+r) — the psychometrics-standard
    answer to "is this per-user metric stable or noise". The halves
    are integers; the correlation is the exact-moment epilogue
    (operators/profile.py:exact_corr shape); Spearman-Brown is two
    more fixed ops."""
    ev = read_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id", (F.row_number().over(w) % 2).alias("par")
    )
    halves = marked.groupBy("user_id").agg(
        F.sum(F.when(F.col("par") == 1, 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("par") == 0, 1).otherwise(0)).alias("y"),
    )
    xi = F.col("x").cast("decimal(19,0)")
    yi = F.col("y").cast("decimal(19,0)")
    d38 = "decimal(38,0)"
    s = halves.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast(d38)).alias("sx"),
        F.sum(yi.cast(d38)).alias("sy"),
        F.sum((xi * xi).cast(d38)).alias("sxx"),
        F.sum((yi * yi).cast(d38)).alias("syy"),
        F.sum((xi * yi).cast(d38)).alias("sxy"),
    )
    nd = F.col("n").cast("decimal(12,0)")
    cov_n = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    var_x = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var_y = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    r = cov_n / (F.sqrt(var_x) * F.sqrt(var_y))
    sb = F.lit(2.0) * r / (F.lit(1.0) + r)
    return s.select(
        F.col("n").cast("bigint").alias("n_users"),
        r.alias("half_corr"),
        sb.alias("spearman_brown"),
    )


def _q_variance_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Differencing-order advisor per event type: the variance of the
    daily series vs the variance of its first differences — ratio > 1
    means differencing reduces variance (difference before fitting,
    the d >= 1 signal q25's ARIMA grid searches for); ratio < 1 means
    the series is already stationary-ish and differencing would
    overdifference. Both variances from exact integer moments; the
    diff frame is one ordered lag."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    lvl = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    wt = Window.partitionBy("event_type").orderBy("d")
    diffs = daily.select(
        "event_type", (F.col("n") - F.lag("n").over(wt)).alias("dx")
    ).where(F.col("dx").isNotNull())
    dif = diffs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("kd"),
        F.sum("dx").alias("sd1"),
        F.sum(F.col("dx") * F.col("dx")).alias("sd2"),
    )
    j = lvl.join(dif, "event_type")
    var_lvl = (F.col("k") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "double"
    ) / (F.col("k").cast("double") * F.col("k").cast("double"))
    var_dif = (
        F.col("kd") * F.col("sd2") - F.col("sd1") * F.col("sd1")
    ).cast("double") / (F.col("kd").cast("double") * F.col("kd").cast("double"))
    return j.select(
        "event_type",
        F.col("k").cast("bigint").alias("n_days"),
        var_lvl.alias("var_level"),
        var_dif.alias("var_diff"),
        (var_lvl / var_dif).alias("variance_ratio"),
        (var_lvl > var_dif).alias("difference_first"),
    )


def _q_dedup_savings(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-dedup storage savings per source: bytes (chars) held by
    non-canonical duplicate copies — the number that justifies
    running the dedup pipeline at all (q230 reports the dup FACTOR;
    this prices it). One hash aggregate per (source, text-hash), keep
    the min doc_id's bytes, sum the rest."""
    docs = read_table(spark, sf, "documents")
    groups = docs.select(
        "source",
        F.md5(F.col("text")).alias("h"),
        F.col("n_chars").cast("bigint").alias("nc"),
    ).groupBy("source", "h").agg(
        F.count(F.lit(1)).alias("copies"),
        F.sum("nc").alias("total_bytes"),
        F.min("nc").alias("keep_bytes"),
    )
    return groups.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        F.sum("copies").cast("bigint").alias("n_docs"),
        F.sum(F.col("total_bytes") - F.col("keep_bytes"))
        .cast("bigint")
        .alias("bytes_saved"),
        (
            F.sum(F.col("total_bytes") - F.col("keep_bytes")).cast("double")
            / F.sum("total_bytes").cast("double")
        ).alias("savings_share"),
    )


# NDCG@10 rank discounts 1/log2(r+1), precomputed once and rounded to
# 12 decimals, so NO transcendental function runs in either engine —
# sums over these decimal literals are exact and order-independent
# (the benford-expectations pattern applied to ranking metrics).
_NDCG_DISC = [
    "1.0", "0.630929753571", "0.5", "0.430676558073", "0.386852807235",
    "0.356207187108", "0.333333333333", "0.315464876786",
    "0.301029995664", "0.289064826318",
]
# exact cumulative sums of the rounded literals (ideal DCG for m hits)
_NDCG_CUM = [
    "1.0", "1.630929753571", "2.130929753571", "2.561606311644",
    "2.948459118879", "3.304666305987", "3.637999639320",
    "3.953464516106", "4.254494511770", "4.543559338088",
]


def _q_retrieval_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Per-customer retrieval/recommendation ranking metrics — MRR,
    precision@10, recall@10, NDCG@10 — the evaluation harness every
    retrieval or recsys pipeline needs (q307 scores point detectors;
    this scores RANKED lists). Ranking = parts by pre-cutoff spend
    (deterministic spend-desc/partkey-asc order); ground truth = parts
    actually purchased after the cutoff. DCG uses the literal decimal
    discount table (_NDCG_DISC) so per-customer DCG sums are exact
    decimals, not order-dependent double sums; every metric ends in at
    most one double division. Scale shape: one fact scan split by
    date, two hash aggregates keyed on (cust, part), one top-10 window
    over the aggregated spend frame (never the fact), and joins on the
    already-aggregated frames."""
    orders = read_table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = read_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    fact = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "o_custkey", "l_partkey", "o_orderdate", _revenue().alias("rev")
    )
    cutoff = F.lit("2000-01-01").cast("timestamp")
    spend = (
        fact.where(F.col("o_orderdate") < cutoff)
        .groupBy("o_custkey", "l_partkey")
        .agg(F.sum(F.col("rev").cast(DEC)).alias("spend"))
    )
    wr = Window.partitionBy("o_custkey").orderBy(
        F.col("spend").desc(), F.col("l_partkey").asc()
    )
    ranked = spend.select(
        "o_custkey", "l_partkey", F.row_number().over(wr).alias("rk")
    ).where(F.col("rk") <= 10)
    rel = (
        fact.where(F.col("o_orderdate") >= cutoff)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    relc = rel.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("int").alias("n_rel")
    )
    disc = F.element_at(
        F.array(*[F.lit(d).cast("decimal(14,12)") for d in _NDCG_DISC]),
        F.col("rk"),
    )
    hagg = (
        ranked.join(rel, ["o_custkey", "l_partkey"])
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("int").alias("hits"),
            F.min("rk").alias("first_hit"),
            F.sum(disc).alias("dcg"),
        )
    )
    rankedc = ranked.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("int").alias("n_ranked")
    )
    base = rankedc.join(relc, "o_custkey").join(hagg, "o_custkey", "left")
    icum = F.element_at(
        F.array(*[F.lit(c).cast("decimal(16,12)") for c in _NDCG_CUM]),
        F.least(F.col("n_rel"), F.lit(10)),
    )
    hitsn = F.coalesce(F.col("hits"), F.lit(0))
    return base.select(
        F.col("o_custkey").alias("custkey"),
        "n_ranked",
        "n_rel",
        hitsn.cast("int").alias("hits"),
        F.when(
            F.col("first_hit").isNotNull(),
            F.lit(1.0) / F.col("first_hit").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("mrr"),
        (hitsn.cast("double") / F.col("n_ranked").cast("double")).alias(
            "precision_at_10"
        ),
        (hitsn.cast("double") / F.col("n_rel").cast("double")).alias(
            "recall_at_10"
        ),
        (
            F.coalesce(F.col("dcg").cast("double"), F.lit(0.0))
            / icum.cast("double")
        ).alias("ndcg_at_10"),
    )


def _q_skipgram_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Skip-gram (center, context) training-pair extraction, window
    ±2 — the word2vec / embedding-pretraining data step. Pairs are
    generated MAP-SIDE by zipping each token array against its own
    1- and 2-shifted slices (no posexplode self-join: the fact never
    joins itself), so the only shuffle is the hash aggregate on the
    pair key. The symmetric backward direction is recovered AFTER
    aggregation by a self-join on the tiny vocab² gram frame with
    swapped keys — count(center,context) = fwd(center,context) +
    fwd(context,center) — never by doubling the shuffle input."""
    docs = read_table(spark, sf, "documents")
    t = docs.select(tokens(F.col("text")).alias("t"))

    def shifted(d: int) -> F.Column:
        n = F.greatest(F.size("t") - d, F.lit(0))
        return F.zip_with(
            F.slice(F.col("t"), 1, n),
            F.slice(F.col("t"), 1 + d, n),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )

    fwd = (
        t.select(F.explode(F.concat(shifted(1), shifted(2))).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("nf"))
    )
    sw = fwd.select(
        F.col("w2").alias("w1"), F.col("w1").alias("w2"), F.col("nf").alias("nb")
    )
    joined = fwd.join(sw, ["w1", "w2"], "full_outer")
    n_pairs = F.coalesce(F.col("nf"), F.lit(0)) + F.coalesce(F.col("nb"), F.lit(0))
    return joined.select(
        F.col("w1").alias("center"),
        F.col("w2").alias("context"),
        n_pairs.cast("bigint").alias("n_pairs"),
    ).where(F.col("n_pairs") >= 5)


def _q_stutter_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """Consecutive-duplicate-token ("stutter") audit per source — the
    boilerplate/degenerate-generation scrub signal used before LLM
    training (q80 measures distinct-gram repetition; this measures the
    ADJACENT-repeat form that repetition loops and copy-paste
    boilerplate produce). The repeat count is pure map-side array
    algebra (token array zipped against its own 1-shift, equality
    filter) — integer counts, ONE hash aggregate on source, one
    division for the share."""
    docs = read_table(spark, sf, "documents")
    t = docs.select("source", tokens(F.col("text")).alias("t"))
    n = F.size("t")
    shift_n = F.greatest(n - 1, F.lit(0))
    reps = F.size(
        F.filter(
            F.zip_with(
                F.slice(F.col("t"), 1, shift_n),
                F.slice(F.col("t"), 2, shift_n),
                lambda a, b: a == b,
            ),
            lambda x: x,
        )
    )
    per_doc = t.select("source", n.alias("nt"), reps.alias("nr"))
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("total_tokens"),
        F.sum("nr").cast("bigint").alias("stutter_tokens"),
        (F.sum("nr").cast("double") / F.sum("nt").cast("double")).alias(
            "stutter_share"
        ),
        F.sum(F.when(F.col("nr") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_stutter"),
    )


def _q_linear_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Linear multi-touch attribution: every touch (view/click/signup)
    preceding a purchase shares that purchase's value equally — the
    multi-touch generalization of q140's last-touch rule. Touches are
    assigned to their NEXT conversion with the forward as-of join
    (operators/asof.py — one shuffle on user), conversions are
    pre-aggregated per (user, ts) per the asof tie contract, and the
    output groups by (event_type, touches-per-conversion) so the
    attributed value is Σ(conv_value·m)/n with the division done ONCE
    per output row on an exact decimal sum — no per-row double credits
    ever get summed, so no float-order hazard."""
    ev = read_table(spark, sf, "events")
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.min("event_id").alias("conv_id"),
            F.sum(F.col("value").cast(DEC)).alias("conv_value"),
        )
    )
    touch = ev.where(
        F.col("event_type").isin("view", "click", "signup")
    ).select("event_id", "user_id", "ts", "event_type")
    asg = asof_join(
        touch,
        purch,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["conv_id", "conv_value"],
        direction="forward",
    ).where(F.col("conv_id").isNotNull())
    convn = asg.groupBy("user_id", "conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    pt = asg.groupBy("user_id", "conv_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.max("conv_value").alias("cv"),
    )
    j = pt.join(convn, ["user_id", "conv_id"])
    agg = j.groupBy("event_type", "n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_convs"),
        F.sum((F.col("cv") * F.col("m")).cast(DEC)).alias("s"),
    )
    return agg.select(
        "event_type",
        "n",
        "n_convs",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias(
            "attributed_value"
        ),
    )


def _q_qte(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile treatment effects: deciles of per-user total event
    value in the treatment vs control arm (deterministic md5
    assignment, the q125 A/B harness), reported side by side with
    their differences — the distributional view of an experiment that
    a single mean lift (q125) hides. percentile_disc keeps every
    decile an actual data value (q141's engine-exact selection rule);
    per-user totals are exact decimal sums cast once to double."""
    ev = read_table(spark, sf, "events")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("qte"), F.col("user_id").cast("string"))),
            1,
            8,
        )
        < _thr(0.5),
        "treat",
    ).otherwise("control")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total")
    ).select(arm.alias("arm"), "total")
    deciles = [i / 10 for i in range(1, 10)]
    per_arm = per_user.groupBy("arm").agg(
        *[
            F.expr(
                f"percentile_disc({d}) WITHIN GROUP (ORDER BY total)"
            ).alias(f"d{int(d * 10)}")
            for d in deciles
        ]
    )
    cols = [f"d{i}" for i in range(1, 10)]
    t = per_arm.where(F.col("arm") == "treat").drop("arm")
    c = per_arm.where(F.col("arm") == "control").drop("arm")
    return t.alias("t").join(c.alias("c")).select(
        *[F.col(f"c.{x}").alias(f"{x}_control") for x in cols],
        *[F.col(f"t.{x}").alias(f"{x}_treat") for x in cols],
        *[
            (F.col(f"t.{x}") - F.col(f"c.{x}")).alias(f"{x}_qte")
            for x in cols
        ],
    )


def _q_bh_fdr(spark: SparkSession, sf: str) -> DataFrame:
    """Benjamini-Hochberg false-discovery-rate screen over per-(type,
    day) volume cells: Chebyshev-bound p-values (p = min(1, var/dev²) —
    a RATIONAL tail bound from exact integer moments, no normal CDF /
    erf portability trap), then the BH step-up rule at q=0.1 — reject
    the k smallest p-values where p_(k) ≤ k/(10m). The multiple-testing
    control every fleet-wide anomaly sweep needs: q307 scores ONE
    detector; this bounds the expected false-alarm share when
    thousands of cells are tested at once. All ranking/threshold work
    happens on the tiny aggregated cell frame (one window sort);
    double divisions are in a fixed order mirrored in the oracle."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    j = daily.join(mom, "event_type")
    kd = F.col("k").cast("double")
    mu = F.col("s1").cast("double") / kd
    var = (F.col("k") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "double"
    ) / (kd * kd)
    dev = F.col("n").cast("double") - mu
    p = F.when(dev == 0.0, F.lit(1.0)).otherwise(
        F.least(F.lit(1.0), var / (dev * dev))
    )
    cells = j.select("event_type", "d", "n", p.alias("p"))
    w = Window.orderBy("p", "event_type", "d")
    wall = Window.partitionBy()
    ranked = cells.select(
        "event_type",
        "d",
        "n",
        "p",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    thr = F.col("rk").cast("double") / (F.lit(10.0) * F.col("m").cast("double"))
    flagged = ranked.withColumn(
        "pass_k", F.when(F.col("p") <= thr, F.col("rk")).otherwise(F.lit(0))
    )
    kmax = F.max("pass_k").over(wall)
    return flagged.select(
        "event_type",
        "d",
        F.col("n").cast("bigint").alias("n"),
        "p",
        F.col("rk").cast("int").alias("rk"),
        (F.col("rk") <= kmax).alias("discovery"),
    )


def _q_shard_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic training-shard assignment: documents ranked by
    token count (longest first, doc_id tiebreak) dealt round-robin
    into 8 shards — the RNG-free longest-processing-time heuristic
    that keeps per-shard token budgets near-equal for data-parallel
    training. Output is the per-shard balance audit (docs, tokens,
    share of corpus). One window sort over (tokens, doc_id); at 100 TB
    the same rank comes from approx_ntile-style bucketing so no single
    task sorts the corpus (documented scale path, q55's mechanism)."""
    docs = read_table(spark, sf, "documents")
    per_doc = docs.select(
        "doc_id", token_count(F.col("text")).alias("nt")
    )
    w = Window.orderBy(F.col("nt").desc(), F.col("doc_id").asc())
    assigned = per_doc.select(
        "nt", ((F.row_number().over(w) - 1) % 8).alias("shard")
    )
    agg = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("shard_tokens"),
    )
    wall = Window.partitionBy()
    return agg.select(
        F.col("shard").cast("int").alias("shard"),
        "n_docs",
        "shard_tokens",
        (
            F.col("shard_tokens").cast("double")
            / F.sum("shard_tokens").over(wall).cast("double")
        ).alias("token_share"),
    )


# Powers of the 0.9 annual discount factor scaled by 10^7 — exact
# INTEGERS (0.9^7 = 0.4782969 terminates at 7 decimals), so the NPV
# accumulates as price_cents × factor_int pure-integer products.
# High-scale decimal→double casts are NOT correctly rounded in every
# engine (DuckDB's DECIMAL(38,14)→DOUBLE is off by 1 ulp on some
# values); scale-0 decimals convert exactly-rounded in both, so the
# float enters ONCE, at the final fixed /1e9 epilogue.
_NPV_DISC_SCALED = [
    10000000, 9000000, 8100000, 7290000,
    6561000, 5904900, 5314410, 4782969,
]


def _q_revenue_npv(spark: SparkSession, sf: str) -> DataFrame:
    """Discounted customer revenue (NPV at 10%/year, anchored at the
    1995 window start) rolled up per market segment — the
    LTV-with-time-value number behind acquisition-spend decisions
    (q148 reports the undiscounted LTV curve). Order totals in cents ×
    integer-scaled discount factors (_NPV_DISC_SCALED) keep the whole
    aggregation in exact integer arithmetic; the only doubles are the
    fixed ÷1e9 de-scaling and the per-customer average at the end."""
    orders = read_table(spark, sf, "orders")
    cust = read_table(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    disc = F.element_at(
        F.array(*[F.lit(d) for d in _NPV_DISC_SCALED]),
        (F.year("o_orderdate") - F.lit(1994)).cast("int"),
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum((cents * disc).cast("decimal(38,0)")).alias("npv")
    )
    j = per_cust.join(cust, per_cust["o_custkey"] == cust["c_custkey"])
    agg = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.col("npv")).alias("s"),
    )
    seg_npv = F.col("s").cast("double") / F.lit(1.0e9)
    return agg.select(
        "c_mktsegment",
        "n_customers",
        seg_npv.alias("segment_npv"),
        (seg_npv / F.col("n_customers").cast("double")).alias(
            "avg_customer_npv"
        ),
    )


def _q_rake_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """RAKE-style keyword scoring: split each document into candidate
    phrases at stopword boundaries, then score every content word by
    degree/frequency — degree counts co-occurrence weight inside
    phrases (words living in longer phrases rank higher), frequency is
    plain occurrence count. The classic unsupervised keyword extractor
    (Rose et al.), all integers until ONE division per word. Shape:
    positional explode → running stopword count as the phrase id (one
    per-doc window) → phrase-length join → word aggregate; shuffles
    are keyed on (doc, phrase) then word, both reduce-side small."""
    docs = read_table(spark, sf, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "w")
    )
    st = F.when(F.col("w").isin(*sorted(STOPWORDS)), 1).otherwise(0)
    wp = Window.partitionBy("doc_id").orderBy("pos")
    marked = pos.select(
        "doc_id", "pos", "w", st.alias("st")
    ).withColumn("phrase_id", F.sum("st").over(wp))
    words = marked.where(F.col("st") == 0).select(
        "doc_id", "phrase_id", "w"
    )
    plen = words.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("plen")
    )
    scored = (
        words.join(plen, ["doc_id", "phrase_id"])
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
        .where(F.col("freq") >= 5)
    )
    return scored.select(
        F.col("w").alias("word"),
        "freq",
        "deg",
        (F.col("deg").cast("double") / F.col("freq").cast("double")).alias(
            "rake_score"
        ),
    )


def _q_wilcoxon_signed(spark: SparkSession, sf: str) -> DataFrame:
    """Wilcoxon signed-rank test per event type on week-over-week
    paired daily volumes (day d of week w vs day d of week w+1) — the
    paired nonparametric "did volume shift?" test that q279's
    Mann-Whitney (unpaired) can't answer. Tie-averaged ranks stay
    integer via the doubled-rank trick (2·avgrank = 2·count_less +
    ties + 1, the q200 AUC mechanism); E[2W⁺] = n(n+1)/2 and
    Var[2W⁺] = n(n+1)(2n+1)/6 are exact integers, so z is one double
    division over one sqrt. Zero diffs are dropped (standard Wilcoxon
    practice); tie variance correction is documented out of scope."""
    ev = read_table(spark, sf, "events")
    idx = F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.floor(idx / 7).cast("int").alias("wk"),
            (idx % 7).cast("int").alias("dow"),
            "n",
        )
    )
    nxt = daily.select(
        "event_type",
        (F.col("wk") - 1).alias("wk"),
        "dow",
        F.col("n").alias("n2"),
    )
    pairs = (
        daily.join(nxt, ["event_type", "wk", "dow"])
        .select("event_type", (F.col("n2") - F.col("n")).alias("diff"))
        .where(F.col("diff") != 0)
        .select("event_type", "diff", F.abs("diff").alias("ad"))
    )
    byval = pairs.groupBy("event_type", "ad").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).alias("tpos"),
    )
    wv = Window.partitionBy("event_type").orderBy("ad").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = byval.withColumn("cum", F.sum("t").over(wv)).select(
        "event_type",
        "t",
        "tpos",
        (2 * (F.col("cum") - F.col("t")) + F.col("t") + 1).alias("two_avg"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum("t").alias("n"),
        F.sum(F.col("tpos") * F.col("two_avg")).alias("two_w_plus"),
    )
    nn = F.col("n")
    exp2 = (nn * (nn + 1) / 2).cast("bigint")
    var2 = (nn * (nn + 1) * (2 * nn + 1) / 6).cast("bigint")
    return agg.select(
        "event_type",
        nn.cast("bigint").alias("n_pairs"),
        F.col("two_w_plus").cast("bigint").alias("two_w_plus"),
        (
            (F.col("two_w_plus") - exp2).cast("double")
            / F.sqrt(var2.cast("double"))
        ).alias("z"),
    )


def _q_l_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """l-diversity audit: within each quasi-identifier group (customer
    nation × market segment × order year) count DISTINCT values of the
    sensitive attribute (order priority) — a released table is
    l-diverse when every group carries ≥ l distinct sensitive values,
    the stronger guarantee k-anonymity (q214) misses when a small
    group is homogeneous. Pure integer aggregate over the joined
    release frame; the customer dim broadcasts."""
    orders = read_table(spark, sf, "orders")
    cust = read_table(spark, sf, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    rel = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select(
        "c_nationkey",
        "c_mktsegment",
        F.year("o_orderdate").alias("yr"),
        "o_orderpriority",
    )
    g = rel.groupBy("c_nationkey", "c_mktsegment", "yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_size"),
        F.countDistinct("o_orderpriority").cast("bigint").alias("l_distinct"),
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "yr",
        "group_size",
        "l_distinct",
        (F.col("l_distinct") >= 3).alias("diverse"),
    )


def _q_covariate_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Covariate balance check for the deterministic md5 A/B arms
    (q125/q344's assignment): standardized mean difference (SMD) of
    pre-experiment covariates — account balance and order count —
    between arms. SMD = (μ_t − μ_c)/√((v_t + v_c)/2); |SMD| < 0.1 is
    the conventional "arms are comparable" bar, the check that runs
    BEFORE any lift metric is trusted (q308's SRM catches broken
    ASSIGNMENT counts; this catches broken covariate mix). One scan
    over the customer frame with arm-conditional exact moments; two
    output rows stacked from the same 1-row aggregate."""
    cust = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    oc = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    base = cust.join(
        oc, cust["c_custkey"] == oc["o_custkey"], "left"
    ).select(
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("qte"), F.col("c_custkey").cast("string"))),
                1,
                8,
            )
            < _thr(0.5),
            "treat",
        )
        .otherwise("control")
        .alias("arm"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("decimal(18,0)").alias("no"),
    )
    is_t = (F.col("arm") == "treat").cast("int")
    is_c = (F.col("arm") == "control").cast("int")
    d38 = "decimal(38,4)"
    s = base.agg(
        F.sum(is_t).alias("nt"),
        F.sum(is_c).alias("nc"),
        F.sum((F.col("bal") * is_t).cast(d38)).alias("bt"),
        F.sum((F.col("bal") * is_c).cast(d38)).alias("bc"),
        F.sum((F.col("bal") * F.col("bal") * is_t).cast(d38)).alias("btt"),
        F.sum((F.col("bal") * F.col("bal") * is_c).cast(d38)).alias("bcc"),
        F.sum((F.col("no") * is_t).cast(d38)).alias("ot"),
        F.sum((F.col("no") * is_c).cast(d38)).alias("oc"),
        F.sum((F.col("no") * F.col("no") * is_t).cast(d38)).alias("ott"),
        F.sum((F.col("no") * F.col("no") * is_c).cast(d38)).alias("occ"),
    )

    def row(name: str, st, sc, stt, scc) -> DataFrame:
        ntd = F.col("nt").cast("double")
        ncd = F.col("nc").cast("double")
        mt = st.cast("double") / ntd
        mc = sc.cast("double") / ncd
        vt = stt.cast("double") / ntd - mt * mt
        vc = scc.cast("double") / ncd - mc * mc
        smd = (mt - mc) / F.sqrt((vt + vc) / F.lit(2.0))
        return s.select(
            F.lit(name).alias("covariate"),
            F.col("nt").cast("bigint").alias("n_treat"),
            F.col("nc").cast("bigint").alias("n_control"),
            mt.alias("mean_treat"),
            mc.alias("mean_control"),
            smd.alias("smd"),
        )

    return row("acctbal", F.col("bt"), F.col("bc"), F.col("btt"), F.col("bcc")).unionByName(
        row("n_orders", F.col("ot"), F.col("oc"), F.col("ott"), F.col("occ"))
    )


def _q_pinball_loss(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile-forecast evaluation with pinball (quantile) loss: the
    seasonal-naive forecaster (ŷ_d = value 7 days earlier, q158's
    baseline) scored as a p50 and a p90 quantile forecast per event
    type. Pinball loss at τ is τ·(y−ŷ) when y ≥ ŷ else (1−τ)·(ŷ−y) —
    RATIONAL weights on integer count diffs, so both totals accumulate
    as exact scaled integers (×10) and each mean does ONE division;
    the metric that CRPS/quantile-service-level dashboards need and
    plain MAE (q158) can't express."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d")
    scored = daily.select(
        "event_type",
        "d",
        "n",
        F.lag("n", 7).over(wt).alias("yhat"),
    ).where(F.col("yhat").isNotNull())
    err = F.col("n") - F.col("yhat")
    # pinball x10: tau=0.5 -> 5*|err|; tau=0.9 -> 9*err if err>=0 else 1*(-err)
    p50x10 = 5 * F.abs(err)
    p90x10 = F.when(err >= 0, 9 * err).otherwise(-err)
    agg = scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(p50x10).alias("s50"),
        F.sum(p90x10).alias("s90"),
    )
    return agg.select(
        "event_type",
        F.col("n_days").cast("bigint").alias("n_days"),
        (
            F.col("s50").cast("double")
            / (F.lit(10.0) * F.col("n_days").cast("double"))
        ).alias("pinball_p50"),
        (
            F.col("s90").cast("double")
            / (F.lit(10.0) * F.col("n_days").cast("double"))
        ).alias("pinball_p90"),
    )


def _q_transition_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Behavioral drift as total-variation distance between the
    per-user event-type transition matrices of the first vs second
    half of the window (q103 builds ONE matrix; this compares two).
    For each from-state: TVD = Σ_to |p₁−p₂|/2 where pᵢ = mᵢ/nᵢ — the
    common-denominator trick keeps everything integer: Σ|m₁·n₂−m₂·n₁|
    is exact, then ONE division by 2·n₁·n₂ per from-state. The "did
    user behavior change shape, not just volume" monitor."""
    ev = read_table(spark, sf, "events")
    half = F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1).otherwise(2)
    wt = Window.partitionBy("user_id", "h").orderBy("ts", "event_id")
    steps = (
        ev.select("user_id", "ts", "event_id", "event_type", half.alias("h"))
        .withColumn("nxt", F.lead("event_type").over(wt))
        .where(F.col("nxt").isNotNull())
    )
    cells = steps.groupBy("h", F.col("event_type").alias("f"), F.col("nxt").alias("t")).agg(
        F.count(F.lit(1)).alias("m")
    )
    c1 = cells.where(F.col("h") == 1).select("f", "t", F.col("m").alias("m1"))
    c2 = cells.where(F.col("h") == 2).select("f", "t", F.col("m").alias("m2"))
    grid = c1.join(c2, ["f", "t"], "full_outer").select(
        "f",
        "t",
        F.coalesce("m1", F.lit(0)).alias("m1"),
        F.coalesce("m2", F.lit(0)).alias("m2"),
    )
    per_from = grid.groupBy("f").agg(
        F.sum("m1").alias("n1"),
        F.sum("m2").alias("n2"),
    )
    j = grid.join(per_from, "f")
    num = F.abs(F.col("m1") * F.col("n2") - F.col("m2") * F.col("n1"))
    agg = j.groupBy("f").agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum(num.cast("decimal(38,0)")).alias("s"),
    )
    return agg.select(
        F.col("f").alias("from_state"),
        F.col("n1").cast("bigint").alias("n_steps_h1"),
        F.col("n2").cast("bigint").alias("n_steps_h2"),
        (
            F.col("s").cast("double")
            / (
                F.lit(2.0)
                * F.col("n1").cast("double")
                * F.col("n2").cast("double")
            )
        ).alias("tvd"),
    )


def _q_cuped(spark: SparkSession, sf: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): the experiment
    metric Y (per-user second-half event count) adjusted by the
    pre-period covariate X (first-half count), Y_adj = Y − θ·(X − X̄)
    with θ = cov(X,Y)/var(X) estimated POOLED across arms — the
    standard pre-experiment-data trick that cuts A/B variance by
    corr² without biasing the lift. Arms are the deterministic md5
    split (q125/q344 harness). All moments (n, Σx, Σy, Σxy, Σx²) are
    EXACT INTEGERS — counts of events — so θ and the adjusted means
    are a fixed double epilogue both engines evaluate identically; at
    100 TB the per-user frame is one hash aggregate on user_id and
    the moment reduction is a single-row combine."""
    ev = read_table(spark, sf, "events")
    pre = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(pre, 1).otherwise(0)).cast("bigint").alias("x"),
        F.sum(F.when(pre, 0).otherwise(1)).cast("bigint").alias("y"),
    )
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("cuped"), F.col("user_id").cast("string"))),
            1,
            8,
        )
        < _thr(0.5),
        "treat",
    ).otherwise("control")
    per_user = per_user.select(arm.alias("arm"), "x", "y")
    mom = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    per_arm = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("sxa"),
        F.sum("y").cast("bigint").alias("sya"),
    )
    j = per_arm.crossJoin(F.broadcast(mom))
    theta = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    mean_y = F.col("sya").cast("double") / F.col("n_users").cast("double")
    mean_x_arm = F.col("sxa").cast("double") / F.col("n_users").cast("double")
    mean_x_all = F.col("sx").cast("double") / F.col("n").cast("double")
    return j.select(
        "arm",
        "n_users",
        mean_y.alias("mean_y"),
        (mean_y - theta * (mean_x_arm - mean_x_all)).alias("mean_y_adj"),
        theta.alias("theta"),
    )


def _q_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two customer
    rankings — total order value and order frequency — the standard
    zero-tuning way to merge heterogeneous retrieval/ranking signals:
    RRF(c) = Σ_r 1/(60 + rank_r(c)), top 20. Ranks are row_numbers
    with a custkey tiebreak (total order; both engines agree), the
    two 1/(60+r) terms are single divisions of exact integers, and
    their sum is one double add — deterministic. At scale the ranking
    frame is the per-customer aggregate (small next to orders), and
    each ranking is one window over it; the fact table is touched
    once."""
    o = read_table(spark, sf, "orders")
    per_c = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    w_rev = Window.orderBy(F.col("rev").desc(), F.col("o_custkey").asc())
    w_frq = Window.orderBy(F.col("n_orders").desc(), F.col("o_custkey").asc())
    ranked = per_c.select(
        "o_custkey",
        F.row_number().over(w_rev).cast("bigint").alias("r_rev"),
        F.row_number().over(w_frq).cast("bigint").alias("r_freq"),
    )
    rrf = (
        F.lit(1.0) / (F.lit(60.0) + F.col("r_rev").cast("double"))
        + F.lit(1.0) / (F.lit(60.0) + F.col("r_freq").cast("double"))
    )
    return (
        ranked.select("o_custkey", "r_rev", "r_freq", rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("o_custkey").asc())
        .limit(20)
    )


def _q_peak_days(spark: SparkSession, sf: str) -> DataFrame:
    """Peak detection on the daily event-count series per type: a day
    is a peak when it is a STRICT local maximum (beats both
    neighbors) AND sits above the series mean — the mean test uses
    the common-denominator trick (k·n > Σn, pure integers) so no
    per-row division ever runs. The burst-census primitive behind
    alert digests and capacity post-mortems. One hash aggregate to
    the (type, day) grain, one window pass for the neighbors, one
    aggregate for the census — the fact table is scanned once."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d")
    wall = Window.partitionBy("event_type")
    flagged = daily.select(
        "event_type",
        "d",
        "n",
        F.lag("n").over(wt).alias("prv"),
        F.lead("n").over(wt).alias("nxt"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("k"),
        F.sum("n").over(wall).cast("bigint").alias("s"),
    )
    peaks = flagged.where(
        F.col("prv").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("n") > F.col("prv"))
        & (F.col("n") > F.col("nxt"))
        & (F.col("k") * F.col("n") > F.col("s"))
    )
    return peaks.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_peaks"),
        F.max("n").cast("bigint").alias("max_peak"),
        F.min("d").alias("first_peak_d"),
    )


def _q_savgol(spark: SparkSession, sf: str) -> DataFrame:
    """Savitzky–Golay smoothing (window 5, quadratic) of the daily
    event-count series per type: ŷ_d = (−3·n_{d−2} + 12·n_{d−1} +
    17·n_d + 12·n_{d+1} − 3·n_{d+2}) / 35 — the least-squares
    polynomial filter that preserves peak height/width where a moving
    average flattens it (the instrument-signal smoother). The
    convolution is INTEGER (literal coefficients on exact counts);
    ONE division by 35 per row is the entire float surface. Interior
    rows only (full window). Lag/lead windows over the tiny (type,
    day) grain — no self-join, single pass."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d")
    conv = daily.select(
        "event_type",
        "d",
        "n",
        F.lag("n", 2).over(wt).alias("m2"),
        F.lag("n", 1).over(wt).alias("m1"),
        F.lead("n", 1).over(wt).alias("p1"),
        F.lead("n", 2).over(wt).alias("p2"),
    ).where(
        F.col("m2").isNotNull()
        & F.col("m1").isNotNull()
        & F.col("p1").isNotNull()
        & F.col("p2").isNotNull()
    )
    num = (
        F.lit(-3) * F.col("m2")
        + F.lit(12) * F.col("m1")
        + F.lit(17) * F.col("n")
        + F.lit(12) * F.col("p1")
        + F.lit(-3) * F.col("p2")
    )
    return conv.select(
        "event_type",
        "d",
        "n",
        (num.cast("double") / F.lit(35.0)).alias("sg"),
    )


def _q_zero_crossings(spark: SparkSession, sf: str) -> DataFrame:
    """Zero-crossing rate of the mean-centered daily count series per
    type — the oscillation-vs-trend gauge (white noise crosses its
    mean ~half the steps; a trending or strongly autocorrelated
    series barely does). Centering never divides: sign(n_d − mean) ==
    sign(k·n_d − Σn) on pure integers, and a crossing is a strict
    sign flip between consecutive days (zeros break the run). ONE
    division at the end for the rate."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wall = Window.partitionBy("event_type")
    wt = Window.partitionBy("event_type").orderBy("d")
    signed = daily.select(
        "event_type",
        "d",
        F.signum(
            (
                F.count(F.lit(1)).over(wall) * F.col("n")
                - F.sum("n").over(wall)
            ).cast("double")
        ).cast("int").alias("sgn"),
    )
    steps = signed.select(
        "event_type",
        "sgn",
        F.lag("sgn").over(wt).alias("prv"),
    )
    agg = steps.groupBy("event_type").agg(
        (F.count(F.lit(1))).cast("bigint").alias("n_days"),
        F.sum(
            F.when(F.col("sgn") * F.col("prv") == -1, 1).otherwise(0)
        ).cast("bigint").alias("n_crossings"),
    )
    return agg.select(
        "event_type",
        "n_days",
        "n_crossings",
        (
            F.col("n_crossings").cast("double")
            / (F.col("n_days") - F.lit(1)).cast("double")
        ).alias("crossing_rate"),
    )


def _q_rdd_cutoff(spark: SparkSession, sf: str) -> DataFrame:
    """Sharp regression discontinuity at the 2024-01-16 cutoff on the
    daily total event count: separate OLS lines on each side (x =
    day index, integer), and the causal read-out is the JUMP at the
    cutoff — pred_post(15) − pred_pre(15) — plus the slope change.
    Both fits come from exact integer moments (n, Σx, Σy, Σxy, Σx²)
    via the closed form slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²), intercept
    = (Σy − slope·Σx)/n — a FIXED double epilogue both engines
    evaluate identically (the q335 interrupted-time-series shape, with
    the at-cutoff prediction gap as the headline). One aggregate to
    the day grain, one 2-row moment reduce."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    x = F.datediff(F.col("d"), F.lit("2024-01-01").cast("date")).cast("bigint")
    side = F.when(x < 15, F.lit("pre")).otherwise(F.lit("post"))
    base = daily.select(side.alias("side"), x.alias("x"), F.col("n").alias("y"))
    mom = base.groupBy("side").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    icept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    lines = mom.select(
        "side",
        F.col("n").alias("n_days"),
        slope.alias("slope"),
        icept.alias("icept"),
    )
    pre = lines.where(F.col("side") == "pre").select(
        F.col("n_days").alias("n_pre"),
        F.col("slope").alias("slope_pre"),
        (F.col("icept") + F.col("slope") * F.lit(15.0)).alias("pred_pre_at_cut"),
    )
    post = lines.where(F.col("side") == "post").select(
        F.col("n_days").alias("n_post"),
        F.col("slope").alias("slope_post"),
        (F.col("icept") + F.col("slope") * F.lit(15.0)).alias("pred_post_at_cut"),
    )
    return pre.crossJoin(post).select(
        "n_pre",
        "n_post",
        "slope_pre",
        "slope_post",
        (F.col("slope_post") - F.col("slope_pre")).alias("slope_change"),
        (F.col("pred_post_at_cut") - F.col("pred_pre_at_cut")).alias("jump"),
    )


# SPRT literal log-likelihood weights: H0 p0=0.20 vs H1 p1=0.25 for
# the purchase share, alpha=0.05 / beta=0.20 Wald boundaries. Computed
# ONCE here in Python and embedded as the same double literals in both
# engines — no libm call ever runs engine-side (the repo-wide rule
# that keeps log-based stats hash-stable).
import math as _math  # noqa: E402

_SPRT_P0, _SPRT_P1 = 0.20, 0.25
_SPRT_L1 = _math.log(_SPRT_P1 / _SPRT_P0)
_SPRT_L0 = _math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))
_SPRT_UP = _math.log((1.0 - 0.20) / 0.05)    # accept H1
_SPRT_LO = _math.log(0.20 / (1.0 - 0.05))    # accept H0


def _q_sprt(spark: SparkSession, sf: str) -> DataFrame:
    """Wald's sequential probability ratio test on the daily purchase
    share: is the conversion rate p1=0.25 (H1) or p0=0.20 (H0)?  The
    log-likelihood ratio after day d is s_d·ln(p1/p0) +
    (n_d−s_d)·ln(q1/q0) where s_d/n_d are CUMULATIVE integer counts —
    so each row's LLR is two multiplies and one add of exact integers
    against PRECOMPUTED literal weights (no engine-side log), and the
    Wald boundaries ln((1−β)/α), ln(β/(1−α)) are literals too. The
    early-stopping experiment monitor: decision is the first boundary
    crossing. Cumulative counts come from one running-sum window over
    the day grain."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("bigint").alias("s"),
    )
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        F.sum("n").over(wc).cast("bigint").alias("cum_n"),
        F.sum("s").over(wc).cast("bigint").alias("cum_s"),
    )
    llr = (
        F.col("cum_s").cast("double") * F.lit(_SPRT_L1)
        + (F.col("cum_n") - F.col("cum_s")).cast("double") * F.lit(_SPRT_L0)
    )
    return cum.select(
        "d",
        "cum_n",
        "cum_s",
        llr.alias("llr"),
        F.when(llr >= F.lit(_SPRT_UP), "accept_h1")
        .when(llr <= F.lit(_SPRT_LO), "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


def _q_conformal(spark: SparkSession, sf: str) -> DataFrame:
    """Split-conformal prediction interval for the seasonal-naive
    daily-count forecaster (ŷ_d = n_{d−7}, q158/q353's baseline): the
    calibration half (days 8–15) yields q̂ = the 0.9 empirical
    quantile of |y−ŷ| via percentile_disc (an ACTUAL integer residual
    — engine-exact selection, q141's rule), and the test half (day 16
    on) reports achieved coverage of ŷ ± q̂ — the
    distribution-free-guarantee check that calibrated forecast bands
    need. Residuals are pure integer count diffs; coverage is ONE
    division."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d")
    scored = daily.select(
        "event_type",
        "d",
        "n",
        F.lag("n", 7).over(wt).alias("yhat"),
        F.row_number().over(wt).cast("bigint").alias("i"),
    ).where(F.col("yhat").isNotNull())
    scored = scored.withColumn("abs_err", F.abs(F.col("n") - F.col("yhat")))
    cal = scored.where(F.col("i") <= 15)
    test = scored.where(F.col("i") > 15)
    qhat = cal.groupBy("event_type").agg(
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY abs_err)"
        ).cast("bigint").alias("qhat"),
        F.count(F.lit(1)).cast("bigint").alias("n_cal"),
    )
    j = test.join(qhat, "event_type")
    return j.groupBy("event_type").agg(
        F.max("qhat").cast("bigint").alias("qhat"),
        F.max("n_cal").cast("bigint").alias("n_cal"),
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        (
            F.sum(
                F.when(F.col("abs_err") <= F.col("qhat"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("coverage"),
    )


def _q_isotonic(spark: SparkSession, sf: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression of the daily
    event-count series per type via the minimax characterization of
    PAV: fit_i = max_{j≤i} min_{k≥i} mean(y_j..y_k) — the pool-
    adjacent-violators solution in closed form, no iteration. Each
    range mean is (P_k − P_{j−1})/(k−j+1): exact integer prefix-sum
    diffs with ONE division — and min/max of those doubles is
    order-independent, so both engines agree bit-for-bit. The pair
    frame is (j,k) per type — O(m²) on the ~30-row day grain (the
    documented contract: resample to a bounded grid first, the fact
    table itself is touched once by the grain aggregate)."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d")
    idx = daily.select(
        "event_type",
        "d",
        "n",
        F.row_number().over(wt).cast("bigint").alias("i"),
        F.sum("n").over(
            Window.partitionBy("event_type").orderBy("d").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ).cast("bigint").alias("p"),
    )
    a = idx.select(
        "event_type", F.col("i").alias("j"), (F.col("p") - F.col("n")).alias("pj")
    )
    b = idx.select("event_type", F.col("i").alias("k"), F.col("p").alias("pk"))
    pairs = a.join(b, "event_type").where(F.col("j") <= F.col("k")).select(
        "event_type",
        "j",
        "k",
        (
            (F.col("pk") - F.col("pj")).cast("double")
            / (F.col("k") - F.col("j") + 1).cast("double")
        ).alias("m"),
    )
    # inner: for each (j, i): min over k >= i of m(j,k) — a suffix
    # cumulative min along k within each (type, j) group.
    w_suf = (
        Window.partitionBy("event_type", "j")
        .orderBy(F.col("k").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    inner = pairs.select(
        "event_type",
        "j",
        F.col("k").alias("i"),
        F.min("m").over(w_suf).alias("inner_min"),
    )
    # outer: for each i: max over j <= i — a prefix cumulative max
    # along j within each (type, i) group.
    w_pre = (
        Window.partitionBy("event_type", "i")
        .orderBy(F.col("j").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    iso = inner.select(
        "event_type",
        "i",
        "j",
        F.max("inner_min").over(w_pre).alias("fit"),
    ).where(F.col("j") == F.col("i"))
    return (
        idx.select("event_type", "d", "n", "i")
        .join(iso.select("event_type", "i", "fit"), ["event_type", "i"])
        .select("event_type", "d", "n", "fit")
    )


def _q_ips_offpolicy(spark: SparkSession, sf: str) -> DataFrame:
    """Off-policy evaluation with inverse propensity scoring: events
    were 'logged' under a uniform md5 coin (propensity 1/2 per arm),
    and the IPS estimator values a DETERMINISTIC target policy
    (arm A for even users, B for odd) without ever running it:
    V̂(π) = mean(reward · 1[π(u)=a] / 0.5) = 2·Σ(matched rewards)/N.
    The counterfactual-dashboard primitive behind every bandit/reco
    launch review. Rewards are purchase values summed as exact
    decimals; the estimate is ONE multiply-by-2 and ONE division, so
    both engines agree. Reported next to the on-policy (logged) mean
    so the query audits the reweighting itself."""
    ev = read_table(spark, sf, "events")
    logged = F.when(
        F.substring(
            F.md5(F.concat(F.lit("ips"), F.col("event_id").cast("string"))),
            1,
            8,
        )
        < _thr(0.5),
        "A",
    ).otherwise("B")
    target = F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
    reward = F.when(
        F.col("event_type") == "purchase", F.col("value")
    ).otherwise(F.lit(0.0))
    base = ev.select(
        logged.alias("a"),
        target.alias("pi"),
        reward.cast(DEC).alias("r"),
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").alias("s_all"),
        F.sum(F.when(F.col("pi") == F.col("a"), F.col("r")).otherwise(
            F.lit(0).cast(DEC)
        )).alias("s_match"),
        F.sum(F.when(F.col("pi") == F.col("a"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_match"),
    )
    return agg.select(
        "n",
        "n_match",
        (F.col("s_all").cast("double") / F.col("n").cast("double")).alias(
            "v_logged"
        ),
        (
            F.lit(2.0)
            * F.col("s_match").cast("double")
            / F.col("n").cast("double")
        ).alias("v_target_ips"),
    )


def _q_negbin_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Negative-binomial method-of-moments fit to the daily count
    series per type: r = m²/(v−m), p = m/v — the parametric upgrade of
    the q334 dispersion index that turns "overdispersed" into an
    actual (r, p) model for burst simulation and tail SLOs. Moments
    are exact integers (k, Σn, Σn²); m, v and the two parameters are a
    fixed double epilogue. Equi/under-dispersed series (v ≤ m) report
    NULL parameters — the Poisson-is-enough signal."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("q"),
    )
    m = F.col("s").cast("double") / F.col("k").cast("double")
    v = (F.col("k") * F.col("q") - F.col("s") * F.col("s")).cast("double") / (
        F.col("k") * (F.col("k") - 1)
    ).cast("double")
    return mom.select(
        "event_type",
        F.col("k").alias("n_days"),
        m.alias("mean"),
        v.alias("var"),
        F.when(v > m, (m * m) / (v - m)).alias("nb_r"),
        F.when(v > m, m / v).alias("nb_p"),
    )


def _q_unit_value_index(spark: SparkSession, sf: str) -> DataFrame:
    """Unit-value price index per brand and ship-month: (Σext_t/Σqty_t)
    ÷ (Σext_0/Σqty_0) against the brand's FIRST observed month —
    the trade-statistics price deflator computed without per-row unit
    prices. Both numerator pairs are exact decimal sums; the index is
    the cross-multiplied form (ext_t·qty_0)/(qty_t·ext_0) evaluated as
    four exact-sum-to-double casts and a fixed multiply/divide — no
    float ever accumulates. One fact aggregate to the (brand, month)
    grain + one broadcast-sized base-month join."""
    li = read_table(spark, sf, "lineitem")
    p = read_table(spark, sf, "part")
    month = F.date_trunc("month", F.col("l_shipdate")).alias("mon")
    uv = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", month)
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("ext"),
            F.sum(F.col("l_quantity").cast(DEC)).alias("qty"),
        )
    )
    w0 = Window.partitionBy("p_brand").orderBy("mon")
    base = uv.select(
        "p_brand",
        "mon",
        "ext",
        "qty",
        F.row_number().over(w0).alias("rk"),
    ).where(F.col("rk") == 1).select(
        "p_brand", F.col("ext").alias("ext0"), F.col("qty").alias("qty0")
    )
    j = uv.join(base, "p_brand")
    idx = (
        F.col("ext").cast("double") * F.col("qty0").cast("double")
    ) / (F.col("qty").cast("double") * F.col("ext0").cast("double"))
    return j.select(
        "p_brand",
        "mon",
        F.col("ext").cast("double").alias("ext_sum"),
        F.col("qty").cast("double").alias("qty_sum"),
        idx.alias("uv_index"),
    )


def _q_record_days(spark: SparkSession, sf: str) -> DataFrame:
    """Record-breaking census per type: how many days set a NEW
    all-time daily-count high (strict running-maximum records), and
    when the last record fell — stationarity in one number (an i.i.d.
    series expects ~H_m ≈ ln m records; a trending one keeps breaking
    them). Pure integer window comparison (n > max of all prior days);
    the first day is not a record (no prior)."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = daily.select(
        "event_type",
        "d",
        "n",
        F.max("n").over(w_prev).alias("prior_max"),
    )
    rec = flagged.where(
        F.col("prior_max").isNotNull() & (F.col("n") > F.col("prior_max"))
    )
    return rec.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
        F.max("d").alias("last_record_d"),
        F.max("n").cast("bigint").alias("record_high"),
    )


def _q_turning_points(spark: SparkSession, sf: str) -> DataFrame:
    """Turning-points randomness test per type: count strict local
    extrema T in the daily series and compare to the i.i.d.
    expectation E[T] = 2(m−2)/3, Var[T] = (16m−29)/90 — the classic
    companion to the runs test (q325) that sees OVER-smoothing (too
    few turns, trending) and oscillation (too many). T and m are pure
    integers; z is a fixed rational-then-sqrt epilogue."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d")
    lagd = daily.select(
        "event_type",
        "n",
        F.lag("n").over(wt).alias("prv"),
        F.lead("n").over(wt).alias("nxt"),
    )
    is_turn = (
        F.col("prv").isNotNull()
        & F.col("nxt").isNotNull()
        & (
            ((F.col("n") > F.col("prv")) & (F.col("n") > F.col("nxt")))
            | ((F.col("n") < F.col("prv")) & (F.col("n") < F.col("nxt")))
        )
    )
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    ).join(
        lagd.groupBy("event_type").agg(
            F.sum(F.when(is_turn, 1).otherwise(0)).cast("bigint").alias("t")
        ),
        "event_type",
    )
    z = (
        (3 * F.col("t") - 2 * (F.col("m") - 2)).cast("double") / F.lit(3.0)
    ) / F.sqrt(
        (16 * F.col("m") - 29).cast("double") / F.lit(90.0)
    )
    return agg.select("event_type", "m", "t", z.alias("z"))


def _q_stylometric_z(spark: SparkSession, sf: str) -> DataFrame:
    """Burrows-delta-style stylometry inputs: for the corpus's top-10
    tokens, each source's counts-per-million rate and its scaled
    z-score against the across-source distribution — the author/
    pipeline fingerprint table (a machine-generated or template-heavy
    source shows extreme function-word z's). CPM is INTEGER floor
    division (c·10⁶ div N — no float rate), the z numerator S·cpm − Σcpm
    and the variance radicand S·Σcpm² − (Σcpm)² are exact integers,
    and ONE sqrt + ONE division finish (z here is √S × the classic
    z — a fixed monotone scaling, documented). Absent (source, token)
    cells are REAL zero rows via the source×token grid (20×10 —
    broadcast-sized)."""
    docs = read_table(spark, sf, "documents")
    tok = docs.select(
        "source", F.explode(tokens("text")).alias("t")
    )
    top = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            "t",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), F.col("t").asc()))
            .alias("rk"),
        )
        .where(F.col("rk") <= 10)
        .select("t")
    )
    per_src = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("ntok")
    )
    cnt = tok.join(F.broadcast(top), "t").groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    grid = per_src.crossJoin(F.broadcast(top))
    cells = grid.join(cnt, ["source", "t"], "left").select(
        "source",
        "t",
        # integer floor division — no float rate ever exists
        F.expr("(coalesce(c, 0) * 1000000) div ntok")
        .cast("bigint")
        .alias("cpm"),
    )
    wt = Window.partitionBy("t")
    stats = cells.select(
        "source",
        "t",
        "cpm",
        F.count(F.lit(1)).over(wt).cast("bigint").alias("s"),
        F.sum("cpm").over(wt).cast("bigint").alias("tot"),
        F.sum(F.col("cpm") * F.col("cpm")).over(wt).cast("bigint").alias("qq"),
    )
    rad = (F.col("s") * F.col("qq") - F.col("tot") * F.col("tot")).cast(
        "double"
    )
    return stats.select(
        "source",
        F.col("t").alias("token"),
        "cpm",
        F.when(
            rad > 0,
            (F.col("s") * F.col("cpm") - F.col("tot")).cast("double")
            / F.sqrt(rad),
        ).alias("z_scaled"),
    )


def _q_int8_quant(spark: SparkSession, sf: str) -> DataFrame:
    """Int8 embedding-quantization audit: quantize each dim with the
    FIXED grid q = clamp(⌊x·64 + 0.5⌋, −127, 127) (scale 64 = exact
    power of two, so dequantization q/64 is EXACT in binary doubles
    and ⌊·+0.5⌋ sidesteps the HALF_UP-vs-banker's round() divergence),
    then report per-vector MSE and max-abs error — the storage-savings
    vs recall-risk table a vector-index rollout needs. The squared-
    error reduction is a SEQUENTIAL left fold in both engines
    (F.aggregate here, list_dot_product in the oracle — same
    element order, same doubles), and max() is order-free; output is
    per-vector so no cross-row float sum ever happens."""
    emb = read_table(spark, sf, "embeddings")
    err = F.transform(
        F.col("embedding"),
        lambda x: x.cast("double")
        - F.least(
            F.greatest(
                F.floor(x.cast("double") * F.lit(64.0) + F.lit(0.5)),
                F.lit(-127.0),
            ),
            F.lit(127.0),
        )
        / F.lit(64.0),
    )
    base = emb.select("vec_id", "label", err.alias("e"))
    sq = F.aggregate(
        F.col("e"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return base.select(
        "vec_id",
        "label",
        (sq / F.lit(64.0)).alias("mse"),
        F.array_max(F.transform(F.col("e"), F.abs)).alias("max_abs_err"),
    )


def _q_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998)
    of vector 0's top-20 cosine candidates: greedily pick 5 results
    maximizing 0.5·rel(c) − 0.5·max_{s∈selected} sim(c, s) — the
    diversity-aware final stage every retrieval pipeline bolts onto
    brute-force/IVF top-k (q23/q47). All cosines are computed in
    DOUBLE with one fixed expression (sequential-fold dot product ÷
    norm product) so scores are engine-identical; selection ties
    break on vec_id. The candidate set is top-k-SMALL by construction
    (that is what a rerank stage is), so the k·|C| greedy loop is 5
    bounded DataFrame iterations, never a corpus scan — the corpus is
    touched once to produce the 20 candidates."""
    emb = read_table(spark, sf, "embeddings")
    vecd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", vecd.alias("v"))
    q = base.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))

    def cos(a: F.Column, b: F.Column) -> F.Column:
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        n1 = F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        n2 = F.aggregate(
            F.transform(b, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return dot / (F.sqrt(n1) * F.sqrt(n2))

    cand = (
        base.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "v", cos(F.col("v"), F.col("qv")).alias("rel"))
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(20)
        .localCheckpoint(eager=True)  # 20 rows; reused 5x below
    )
    sims = (
        cand.alias("a")
        .crossJoin(cand.alias("b"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            cos(F.col("a.v"), F.col("b.v")).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    chosen: list[tuple[int, int, float]] = []
    remaining = cand.select("vec_id", "rel")
    for step in range(1, 6):
        if step == 1:
            pick = remaining.orderBy(
                F.col("rel").desc(), F.col("vec_id").asc()
            ).limit(1)
            row = pick.collect()[0]
            score = float(row["rel"])
        else:
            sel_ids = [c[1] for c in chosen]
            ms = (
                sims.where(F.col("ib").isin(sel_ids))
                .groupBy("ia")
                .agg(F.max("s").alias("maxsim"))
            )
            scored = remaining.join(
                ms, remaining["vec_id"] == ms["ia"]
            ).select(
                "vec_id",
                (F.lit(0.5) * F.col("rel") - F.lit(0.5) * F.col("maxsim")).alias(
                    "score"
                ),
            )
            row = (
                scored.orderBy(F.col("score").desc(), F.col("vec_id").asc())
                .limit(1)
                .collect()[0]
            )
            score = float(row["score"])
        chosen.append((step, int(row["vec_id"]), score))
        remaining = remaining.where(F.col("vec_id") != int(row["vec_id"]))
    return spark.createDataFrame(
        chosen, "step int, vec_id bigint, mmr_score double"
    )


def _q_welch_ttest(spark: SparkSession, sf: str) -> DataFrame:
    """Welch's unequal-variance t-test on per-user total event value
    between the md5 A/B arms (q125/q344 harness): t = (m̄₁−m̄₂) /
    √(s₁²/n₁ + s₂²/n₂) with the Welch–Satterthwaite df — the test
    that stays valid when arms have different variances (the default
    recommendation over Student's t). Per-user totals are exact
    decimal sums; each arm's (n, Σx, Σx²) moments are exact decimals;
    t and df are a fixed double epilogue. One fact aggregate + one
    2-row reduce."""
    ev = read_table(spark, sf, "events")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("welch"), F.col("user_id").cast("string"))),
            1,
            8,
        )
        < _thr(0.5),
        "treat",
    ).otherwise("control")
    per_user = ev.groupBy("user_id").agg(
        # value carries exactly 2 decimals, so scale 2 is lossless and
        # keeps the squared-sum mantissa < 2^53 (decimal->double stays
        # exactly representable): (18,2)^2 -> (37,4), summed at (38,4)
        F.sum(F.col("value").cast(DEC)).cast("decimal(18,2)").alias("total")
    ).select(arm.alias("arm"), "total")
    # A user whose events are all NULL-valued sums to a NULL total;
    # counting them in n while sum() skips them would skew mean and
    # variance, so drop them from the arm moments entirely.
    per_user = per_user.where(F.col("total").isNotNull())
    mom = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("total").alias("s1"),
        F.sum(F.col("total") * F.col("total")).alias("s2"),
    )
    t = mom.where(F.col("arm") == "treat").select(
        F.col("n").alias("n1"), F.col("s1").alias("a1"), F.col("s2").alias("a2")
    )
    c = mom.where(F.col("arm") == "control").select(
        F.col("n").alias("n2"), F.col("s1").alias("b1"), F.col("s2").alias("b2")
    )
    j = t.crossJoin(c)
    m1 = F.col("a1").cast("double") / F.col("n1").cast("double")
    m2 = F.col("b1").cast("double") / F.col("n2").cast("double")
    # unbiased sample variance from exact moments: (n*S2 - S1^2)/(n*(n-1))
    v1 = (
        F.col("n1").cast("double") * F.col("a2").cast("double")
        - F.col("a1").cast("double") * F.col("a1").cast("double")
    ) / (F.col("n1") * (F.col("n1") - 1)).cast("double")
    v2 = (
        F.col("n2").cast("double") * F.col("b2").cast("double")
        - F.col("b1").cast("double") * F.col("b1").cast("double")
    ) / (F.col("n2") * (F.col("n2") - 1)).cast("double")
    se1 = v1 / F.col("n1").cast("double")
    se2 = v2 / F.col("n2").cast("double")
    tstat = (m1 - m2) / F.sqrt(se1 + se2)
    df = ((se1 + se2) * (se1 + se2)) / (
        (se1 * se1) / (F.col("n1") - 1).cast("double")
        + (se2 * se2) / (F.col("n2") - 1).cast("double")
    )
    return j.select(
        F.col("n1").alias("n_treat"),
        F.col("n2").alias("n_control"),
        m1.alias("mean_treat"),
        m2.alias("mean_control"),
        tstat.alias("t_stat"),
        df.alias("welch_df"),
    )


def _q_two_prop_z(spark: SparkSession, sf: str) -> DataFrame:
    """Two-proportion z-test on the purchase conversion rate between
    the md5 arms: z = (p̂₁−p̂₂) / √(p̂(1−p̂)(1/n₁+1/n₂)) with the
    pooled p̂ — the textbook launch-gate readout for binary metrics
    (the parametric sibling of q308's SRM χ²). Successes and trials
    are pure integers; the z epilogue is a fixed sequence of four
    divisions and one sqrt. One fact scan, one 2-row reduce."""
    ev = read_table(spark, sf, "events")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("zprop"), F.col("event_id").cast("string"))),
            1,
            8,
        )
        < _thr(0.5),
        "treat",
    ).otherwise("control")
    base = ev.select(
        arm.alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("c"),
    )
    mom = base.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
    )
    t = mom.where(F.col("arm") == "treat").select(
        F.col("n").alias("n1"), F.col("s").alias("s1")
    )
    c = mom.where(F.col("arm") == "control").select(
        F.col("n").alias("n2"), F.col("s").alias("s2")
    )
    j = t.crossJoin(c)
    p1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    p2 = F.col("s2").cast("double") / F.col("n2").cast("double")
    pp = (F.col("s1") + F.col("s2")).cast("double") / (
        F.col("n1") + F.col("n2")
    ).cast("double")
    z = (p1 - p2) / F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n1").cast("double")
            + F.lit(1.0) / F.col("n2").cast("double")
        )
    )
    return j.select(
        "n1",
        "n2",
        p1.alias("p_treat"),
        p2.alias("p_control"),
        z.alias("z_stat"),
    )


def _q_bland_altman(spark: SparkSession, sf: str) -> DataFrame:
    """Bland–Altman agreement between the two independent measurements
    of each order's value — the `o_totalprice` header field vs the
    recomputed Σ extprice·(1−disc)·(1+tax) over its line items — the
    measurement-comparison method (mean bias ± 1.96σ limits of
    agreement) doubling as a cross-table reconciliation audit. Every
    per-order diff is an exact decimal; the bias/LoA epilogue is a
    fixed double sequence from exact decimal moments. The join is the
    orders⋈lineitem spine on the natural key; moments reduce to one
    row."""
    o = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    charge = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
        * (F.lit(1).cast("decimal(12,2)") + _dec("l_tax"))
    )
    recomputed = li.groupBy("l_orderkey").agg(
        F.sum(charge.cast(DEC)).alias("li_total")
    )
    j = o.select("o_orderkey", _dec("o_totalprice").alias("hdr")).join(
        recomputed, o["o_orderkey"] == recomputed["l_orderkey"]
    )
    d = (F.col("hdr").cast(DEC) - F.col("li_total")).cast("decimal(18,6)")
    mom = j.select(d.alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("d").cast(DEC)).alias("sd"),
        # (18,6)^2 -> (37,12) exact; summed at (38,12) — no rounding cast
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
    )
    bias = F.col("sd").cast("double") / F.col("n").cast("double")
    var = (
        F.col("n").cast("double") * F.col("sdd").cast("double")
        - F.col("sd").cast("double") * F.col("sd").cast("double")
    ) / (F.col("n") * (F.col("n") - 1)).cast("double")
    sd = F.sqrt(var)
    return mom.select(
        "n",
        bias.alias("bias"),
        sd.alias("sd_diff"),
        (bias - F.lit(1.96) * sd).alias("loa_low"),
        (bias + F.lit(1.96) * sd).alias("loa_high"),
    )


def _q_tanimoto_users(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted-Jaccard (Tanimoto) similarity between the 10 most
    active users' event-type COUNT vectors: Σ min(cA,cB) / Σ max(cA,cB)
    — the multiset upgrade of set Jaccard (q19) that sees *how much*
    behavior overlaps, not just *whether*. The five event types are a
    FIXED vocabulary, so each user pivots to a 5-slot integer vector
    in one conditional aggregate and every pair score is a ratio of
    two small integer sums — engine-exact with ONE division. The pair
    frame is top-k² (bounded by construction, like every rerank)."""
    ev = read_table(spark, sf, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c_{t}")
            for t in EVENT_TYPES
        ],
    )
    top = counts.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("n_events").desc(), F.col("user_id").asc()))
        .alias("rk"),
    ).where(F.col("rk") <= 10)
    a = top.select(
        F.col("user_id").alias("user_a"),
        *[F.col(f"c_{t}").alias(f"a_{t}") for t in EVENT_TYPES],
    )
    b = top.select(
        F.col("user_id").alias("user_b"),
        *[F.col(f"c_{t}").alias(f"b_{t}") for t in EVENT_TYPES],
    )
    pairs = a.join(b, a["user_a"] < b["user_b"])
    num = sum(
        (F.least(F.col(f"a_{t}"), F.col(f"b_{t}")) for t in EVENT_TYPES),
        F.lit(0),
    )
    den = sum(
        (F.greatest(F.col(f"a_{t}"), F.col(f"b_{t}")) for t in EVENT_TYPES),
        F.lit(0),
    )
    return pairs.select(
        "user_a",
        "user_b",
        num.cast("bigint").alias("overlap"),
        den.cast("bigint").alias("union_size"),
        (num.cast("double") / den.cast("double")).alias("tanimoto"),
    )


def _q_cold_start(spark: SparkSession, sf: str) -> DataFrame:
    """Cold-start audit for a temporally-split recommender dataset:
    what share of test-period (second half) users — and (user, type)
    interaction pairs — never appear in the train period? The number
    that decides whether offline metrics mean anything. Two anti-join
    cardinalities over the distinct-key frames; pure integers with two
    final divisions. At scale both distinct frames are key-partitioned
    aggregates, and the anti joins are broadcast (train key sets are
    the smaller, bounded side after dedup)."""
    ev = read_table(spark, sf, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    train_u = ev.where(F.col("ts") < cut).select("user_id").distinct()
    test_u = ev.where(F.col("ts") >= cut).select("user_id").distinct()
    cold_u = test_u.join(train_u, "user_id", "left_anti")
    train_p = (
        ev.where(F.col("ts") < cut).select("user_id", "event_type").distinct()
    )
    test_p = (
        ev.where(F.col("ts") >= cut).select("user_id", "event_type").distinct()
    )
    cold_p = test_p.join(train_p, ["user_id", "event_type"], "left_anti")
    r = (
        test_u.agg(F.count(F.lit(1)).cast("bigint").alias("n_test_users"))
        .crossJoin(
            cold_u.agg(F.count(F.lit(1)).cast("bigint").alias("n_cold_users"))
        )
        .crossJoin(
            test_p.agg(F.count(F.lit(1)).cast("bigint").alias("n_test_pairs"))
        )
        .crossJoin(
            cold_p.agg(F.count(F.lit(1)).cast("bigint").alias("n_cold_pairs"))
        )
    )
    return r.select(
        "n_test_users",
        "n_cold_users",
        (
            F.col("n_cold_users").cast("double")
            / F.col("n_test_users").cast("double")
        ).alias("user_cold_share"),
        "n_test_pairs",
        "n_cold_pairs",
        (
            F.col("n_cold_pairs").cast("double")
            / F.col("n_test_pairs").cast("double")
        ).alias("pair_cold_share"),
    )


def _q_stump_split(spark: SparkSession, sf: str) -> DataFrame:
    """Decision-stump split finder in pure relational algebra: for
    each decile of `value` as a candidate threshold, the weighted
    Gini impurity of the (value ≤ c) split against the is-purchase
    label — the CART first-split computation, exact. The per-side
    impurity uses the rational identity n·g = 2k(n−k)/n, so each
    candidate's score is TWO divisions of exact integers added in a
    fixed order; the winner is flagged with a window min (double
    comparisons of identical values agree everywhere). One pass
    computes all candidates: the 9-row decile frame broadcast-joins
    the fact and a conditional aggregate scores every split at once."""
    ev = read_table(spark, sf, "events")
    cand = ev.agg(
        *[
            F.expr(
                f"percentile_disc({i / 10}) WITHIN GROUP (ORDER BY value)"
            ).alias(f"d{i}")
            for i in range(1, 10)
        ]
    ).select(
        F.explode(
            F.array(*[F.col(f"d{i}") for i in range(1, 10)])
        ).alias("threshold")
    )
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    j = ev.select(F.col("value"), y.alias("y")).crossJoin(F.broadcast(cand))
    per_c = j.groupBy("threshold").agg(
        F.sum(F.when(F.col("value") <= F.col("threshold"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_l"),
        F.sum(
            F.when(F.col("value") <= F.col("threshold"), F.col("y")).otherwise(0)
        )
        .cast("bigint")
        .alias("k_l"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("k"),
    )
    n_r = F.col("n") - F.col("n_l")
    k_r = F.col("k") - F.col("k_l")
    g = (
        (2 * F.col("k_l") * (F.col("n_l") - F.col("k_l"))).cast("double")
        / F.col("n_l").cast("double")
        + (2 * k_r * (n_r - k_r)).cast("double") / n_r.cast("double")
    )
    scored = per_c.select(
        "threshold",
        "n_l",
        n_r.cast("bigint").alias("n_r"),
        g.alias("gini_weighted"),
    )
    wbest = Window.partitionBy()
    return scored.select(
        "*",
        (
            F.col("gini_weighted") == F.min("gini_weighted").over(wbest)
        ).alias("is_best"),
    )


def _q_quantile_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile normalization of the 10 most active users' daily
    count series (the microarray/feature-scaling classic): rank days
    within each user, average the counts AT EACH RANK across users,
    and replace every user's value with the reference profile at its
    rank — afterwards every user has an identical distribution. Ranks
    are total-ordered (count, then day); the reference profile is an
    exact-integer sum with ONE division per rank. Shape: day-grain
    aggregate → one rank window per user → tiny per-rank aggregate
    joined back (broadcast)."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = daily.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("tot")
    )
    top = tot.select(
        "user_id",
        F.row_number()
        .over(Window.orderBy(F.col("tot").desc(), F.col("user_id").asc()))
        .alias("rk"),
    ).where(F.col("rk") <= 10).select("user_id")
    base = daily.join(F.broadcast(top), "user_id")
    wr = Window.partitionBy("user_id").orderBy(
        F.col("n").asc(), F.col("d").asc()
    )
    ranked = base.select(
        "user_id", "d", "n", F.row_number().over(wr).cast("bigint").alias("r")
    )
    ref = ranked.groupBy("r").agg(
        (
            F.sum("n").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("ref_value")
    )
    return ranked.join(F.broadcast(ref), "r").select(
        "user_id", "d", "n", "r", "ref_value"
    )


def _q_price_endings(spark: SparkSession, sf: str) -> DataFrame:
    """Price-ending histogram: the cents digit-pair of every part's
    retail price (p mod 1.00), with share — the pricing-psychology /
    data-provenance screen (human-set catalogs pile up on .99/.95/.00;
    a uniform spread says generated or converted-from-another-currency
    data). Cents are recovered EXACTLY via the scaled-long trick (q01)
    so the bucket is a pure integer mod; one division for the share."""
    p = read_table(spark, sf, "part")
    cents = (
        (F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long") % 100
    ).alias("cents")
    counts = p.select(cents).groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wall = Window.partitionBy()
    return counts.select(
        "cents",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wall).cast("double"))
        .alias("share"),
    )


def _q_item_cf(spark: SparkSession, sf: str) -> DataFrame:
    """Item-based collaborative filtering similarities: cosine between
    the top-20 parts' customer-interaction vectors (who bought what,
    from the orders⋈lineitem spine) — the classic "customers who
    bought X also bought Y" precompute. Co-occurrence counts and
    per-item degrees are pure integers off ONE two-hop self-join
    through the shared customer (q-graph shape: never all-pairs over
    the catalog — the top-k frame bounds the pair space); cosine =
    co/(√dA·√dB) is a fixed three-op epilogue. Output keeps pairs with
    co-support ≥ 2 (the noise floor every CF system applies)."""
    li = read_table(spark, sf, "lineitem")
    o = read_table(spark, sf, "orders")
    ui = (
        li.join(o.select("o_orderkey", "o_custkey"),
                li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    deg = ui.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    top = deg.select(
        "item",
        "d",
        F.row_number()
        .over(Window.orderBy(F.col("d").desc(), F.col("item").asc()))
        .alias("rk"),
    ).where(F.col("rk") <= 20).select("item", "d")
    fact = ui.join(F.broadcast(top.select("item")), "item")
    a = fact.select(F.col("cust"), F.col("item").alias("ia"))
    b = fact.select(F.col("cust").alias("cust2"), F.col("item").alias("ib"))
    co = (
        a.join(b, (a["cust"] == b["cust2"]) & (a["ia"] < b["ib"]))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
        .where(F.col("co") >= 2)
    )
    j = (
        co.join(F.broadcast(top.select(F.col("item").alias("ia"),
                                       F.col("d").alias("da"))), "ia")
        .join(F.broadcast(top.select(F.col("item").alias("ib"),
                                     F.col("d").alias("db"))), "ib")
    )
    return j.select(
        "ia",
        "ib",
        "co",
        "da",
        "db",
        (
            F.col("co").cast("double")
            / (F.sqrt(F.col("da").cast("double"))
               * F.sqrt(F.col("db").cast("double")))
        ).alias("cosine"),
    )


def _q_nrr(spark: SparkSession, sf: str) -> DataFrame:
    """Net revenue retention by month: revenue this month FROM
    customers who also bought last month, over last month's total —
    the SaaS-board expansion/contraction metric, cohort-free. Both
    numerator and denominator are exact decimal sums; the customer
    month-over-month membership is one self-join of the (customer,
    month) aggregate with a month-arithmetic key (no window, no
    fact-to-fact join). One division per month row."""
    o = read_table(spark, sf, "orders")
    cm = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
    ).agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"))
    prev = cm.select(
        F.col("cust").alias("p_cust"),
        F.add_months(F.col("mon"), 1).alias("p_next"),
        F.col("rev").alias("prev_rev"),
    )
    retained = cm.join(
        prev,
        (cm["cust"] == prev["p_cust"]) & (cm["mon"] == prev["p_next"]),
    )
    num = retained.groupBy("mon").agg(
        F.sum("rev").alias("retained_rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_retained_cust"),
    )
    den = cm.groupBy(F.add_months(F.col("mon"), 1).alias("mon")).agg(
        F.sum("rev").alias("prev_total"),
    )
    j = num.join(den, "mon")
    return j.select(
        "mon",
        "n_retained_cust",
        F.col("retained_rev").cast("double").alias("retained_rev"),
        F.col("prev_total").cast("double").alias("prev_total"),
        (
            F.col("retained_rev").cast("double")
            / F.col("prev_total").cast("double")
        ).alias("nrr"),
    )


def _q_pvm_bridge(spark: SparkSession, sf: str) -> DataFrame:
    """Price-volume-mix bridge per brand between the first and last
    full ship-month: ΔRevenue decomposed into price effect
    (Δp̄·q₀), volume effect (p̄₀·Δq) and the joint term (Δp̄·Δq) —
    the FP&A waterfall that explains WHY revenue moved. Unit prices
    are revenue/quantity ratios of exact decimal sums (one division
    each); the three effects are fixed multiply/subtract sequences of
    those doubles, and they reconcile: price + volume + joint =
    ΔRev exactly in the same doubles the report shows."""
    li = read_table(spark, sf, "lineitem")
    p = read_table(spark, sf, "part")
    base = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li["l_partkey"] == p["p_partkey"])
        .select(
            "p_brand",
            F.date_trunc("month", F.col("l_shipdate")).alias("mon"),
            F.col("l_extendedprice").cast(DEC).alias("ext"),
            F.col("l_quantity").cast(DEC).alias("qty"),
        )
    )
    months = base.agg(
        F.min("mon").alias("m0"), F.max("mon").alias("m1")
    )
    agg = (
        base.join(F.broadcast(months),
                  (F.col("mon") == F.col("m0")) | (F.col("mon") == F.col("m1")))
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("mon") == F.col("m0"), F.col("ext"))
                  .otherwise(F.lit(0).cast(DEC))).alias("e0"),
            F.sum(F.when(F.col("mon") == F.col("m0"), F.col("qty"))
                  .otherwise(F.lit(0).cast(DEC))).alias("q0"),
            F.sum(F.when(F.col("mon") == F.col("m1"), F.col("ext"))
                  .otherwise(F.lit(0).cast(DEC))).alias("e1"),
            F.sum(F.when(F.col("mon") == F.col("m1"), F.col("qty"))
                  .otherwise(F.lit(0).cast(DEC))).alias("q1"),
        )
        .where((F.col("q0") > 0) & (F.col("q1") > 0))
    )
    p0 = F.col("e0").cast("double") / F.col("q0").cast("double")
    p1 = F.col("e1").cast("double") / F.col("q1").cast("double")
    q0d = F.col("q0").cast("double")
    q1d = F.col("q1").cast("double")
    price_eff = (p1 - p0) * q0d
    vol_eff = p0 * (q1d - q0d)
    joint = (p1 - p0) * (q1d - q0d)
    return agg.select(
        "p_brand",
        (F.col("e1").cast("double") - F.col("e0").cast("double")).alias(
            "delta_rev"
        ),
        price_eff.alias("price_effect"),
        vol_eff.alias("volume_effect"),
        joint.alias("joint_effect"),
    )


def _q_knee_point(spark: SparkSession, sf: str) -> DataFrame:
    """Knee/elbow detection on the ranked user-activity curve (the
    Kneedle idea reduced to its geometric core): the rank whose point
    lies farthest from the chord joining the curve's endpoints — the
    principled "how many heavy users are there really" cutoff that
    eyeballing a scree plot approximates. The distance ARGMAX needs no
    sqrt or division: the unnormalized |(yₙ−y₁)(r−1) − (n−1)(yᵣ−y₁)|
    is a PURE INTEGER per rank (constant chord normalization can't
    change the argmax), so the winner is engine-exact with a rank
    tiebreak. One aggregate + one window + one 1-row reduce."""
    ev = read_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    ranked = per_user.select(
        "n_events",
        F.row_number()
        .over(Window.orderBy(F.col("n_events").desc(), F.col("user_id").asc()))
        .cast("bigint")
        .alias("r"),
    )
    wall = Window.partitionBy()
    pts = ranked.select(
        "r",
        "n_events",
        F.max(F.when(F.col("r") == 1, F.col("n_events"))).over(wall).alias("y1"),
        F.max("r").over(wall).alias("n"),
    )
    pts = pts.select(
        "r",
        "n_events",
        "y1",
        "n",
        F.max(F.when(F.col("r") == F.col("n"), F.col("n_events")))
        .over(wall)
        .alias("yn"),
    )
    dist = F.abs(
        (F.col("yn") - F.col("y1")) * (F.col("r") - 1)
        - (F.col("n") - 1) * (F.col("n_events") - F.col("y1"))
    )
    scored = pts.select("r", "n_events", dist.alias("chord_dist"))
    return scored.agg(
        F.expr(
            "min_by(struct(r, n_events, chord_dist), struct(-chord_dist, r))"
        ).alias("k")
    ).select(
        F.col("k.r").alias("knee_rank"),
        F.col("k.n_events").alias("knee_value"),
        F.col("k.chord_dist").cast("bigint").alias("chord_dist"),
    )


def _q_icc(spark: SparkSession, sf: str) -> DataFrame:
    """Intraclass correlation ICC(1) of daily counts within event
    types: (MSB − MSW) / (MSB + (k̄−1)·MSW) from the one-way ANOVA
    decomposition (q287's sums of squares, pushed one step further to
    the reliability coefficient raters/sensors are judged by). All
    sums of squares come from exact integer moments per group; the
    mean group size and the final ratio are a fixed double epilogue.
    One day-grain aggregate, one group-moment reduce, one row out."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("q"),
    )
    # Σ s²/m has per-group denominators, so its addition ORDER matters
    # in floats and a plain 5-row sum() leaves that order to the
    # engine. The group vocabulary is FIXED (5 event types), so pivot
    # the moments wide and add the five rational terms in literal
    # EVENT_TYPES order — hash-exact on any engine.
    wide = g.groupBy().pivot("event_type", EVENT_TYPES).agg(
        F.max(F.struct("s", "m", "q"))
    )
    terms = [
        F.col(f"{t}.s").cast("double")
        * F.col(f"{t}.s").cast("double")
        / F.col(f"{t}.m").cast("double")
        for t in EVENT_TYPES
    ]
    ssb_fixed = terms[0]
    for term in terms[1:]:
        ssb_fixed = ssb_fixed + term
    m_sum = sum(
        (F.col(f"{t}.m") for t in EVENT_TYPES), F.lit(0)
    ).cast("bigint")
    s_sum = sum(
        (F.col(f"{t}.s") for t in EVENT_TYPES), F.lit(0)
    ).cast("bigint")
    q_sum = sum(
        (F.col(f"{t}.q") for t in EVENT_TYPES), F.lit(0)
    ).cast("bigint")
    k = F.lit(len(EVENT_TYPES)).cast("bigint")
    grand_corr = (
        s_sum.cast("double") * s_sum.cast("double") / m_sum.cast("double")
    )
    ssb = ssb_fixed - grand_corr
    ssw = q_sum.cast("double") - ssb_fixed
    msb = ssb / (k - 1).cast("double")
    msw = ssw / (m_sum - k).cast("double")
    # Unbalanced one-way ICC group-size constant n0 = (N − Σm_j²/N)
    # / (k−1) — reduces to the common group size when balanced; kbar
    # (= N/k) is only correct for balanced designs.
    m2_sum = sum(
        (F.col(f"{t}.m") * F.col(f"{t}.m") for t in EVENT_TYPES),
        F.lit(0),
    ).cast("bigint")
    n0 = (
        m_sum.cast("double")
        - m2_sum.cast("double") / m_sum.cast("double")
    ) / (k - 1).cast("double")
    icc = (msb - msw) / (msb + (n0 - F.lit(1.0)) * msw)
    return wide.select(
        k.alias("k_groups"),
        m_sum.alias("n_days"),
        msb.alias("msb"),
        msw.alias("msw"),
        icc.alias("icc1"),
    )


def _q_seasonal_strength_dow(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal strength per event type (Hyndman's F_s = max(0,
    1 − var(remainder)/var(series)) with the day-of-week mean as the
    seasonal fit): how much of the daily variance the weekly cycle
    explains — the one-number "should I model seasonality" gate that
    picks between q24 (holt) and q300 (holt-winters). var(remainder)
    = SSW of the dow grouping and var(series) = SST, both from exact
    integer moments; ONE subtraction and ONE division of doubles at
    the end (the Σs²/m rational term is summed over the FIXED 7-slot
    dow vocabulary in literal order, same discipline as q384's ICC)."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dowed = daily.select(
        "event_type", F.dayofweek("d").alias("dow"), "n"
    )
    g = dowed.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("q"),
    )
    wide = g.groupBy("event_type").pivot("dow", list(range(1, 8))).agg(
        F.max(F.struct("s", "m", "q"))
    )
    terms = [
        F.when(
            F.col(f"{i}.m").isNotNull(),
            F.col(f"{i}.s").cast("double")
            * F.col(f"{i}.s").cast("double")
            / F.col(f"{i}.m").cast("double"),
        ).otherwise(F.lit(0.0))
        for i in range(1, 8)
    ]
    ssg = terms[0]
    for term in terms[1:]:
        ssg = ssg + term
    m_sum = sum(
        (F.coalesce(F.col(f"{i}.m"), F.lit(0)) for i in range(1, 8)),
        F.lit(0),
    ).cast("bigint")
    s_sum = sum(
        (F.coalesce(F.col(f"{i}.s"), F.lit(0)) for i in range(1, 8)),
        F.lit(0),
    ).cast("bigint")
    q_sum = sum(
        (F.coalesce(F.col(f"{i}.q"), F.lit(0)) for i in range(1, 8)),
        F.lit(0),
    ).cast("bigint")
    sst = q_sum.cast("double") - (
        s_sum.cast("double") * s_sum.cast("double") / m_sum.cast("double")
    )
    ssw = q_sum.cast("double") - ssg
    fs = F.greatest(F.lit(0.0), F.lit(1.0) - ssw / sst)
    return wide.select(
        "event_type",
        m_sum.alias("n_days"),
        sst.alias("sst"),
        ssw.alias("ss_remainder"),
        fs.alias("seasonal_strength"),
    )


def _q_median_polish(spark: SparkSession, sf: str) -> DataFrame:
    """One-sweep Tukey median polish of the (day-of-week × week)
    daily-count table: subtract row (dow) medians, then column (week)
    medians of the residuals — the robust two-way decomposition that
    separates weekly rhythm from week-level shifts without letting one
    burst day poison the means (the outlier-proof sibling of q292's
    ratio-to-MA). Counts are integers and percentile_disc medians ARE
    table values, so every residual stays a PURE INTEGER end to end —
    no float enters at any step. Grain: ≤35 cells per pass."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cells = daily.select(
        F.dayofweek("d").cast("int").alias("dow"),
        F.floor(
            F.datediff(F.col("d"), F.lit("2024-01-01").cast("date")) / 7
        ).cast("int").alias("wk"),
        "n",
    )
    row_med = cells.groupBy("dow").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)")
        .cast("bigint")
        .alias("row_eff")
    )
    r1 = cells.join(F.broadcast(row_med), "dow").select(
        "dow", "wk", "n", "row_eff", (F.col("n") - F.col("row_eff")).alias("r1")
    )
    col_med = r1.groupBy("wk").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY r1)")
        .cast("bigint")
        .alias("col_eff")
    )
    return r1.join(F.broadcast(col_med), "wk").select(
        "dow",
        "wk",
        "n",
        "row_eff",
        "col_eff",
        (F.col("r1") - F.col("col_eff")).cast("bigint").alias("resid"),
    )


def _q_cochran_q(spark: SparkSession, sf: str) -> DataFrame:
    """Cochran's Q over THREE binary burst detectors evaluated on the
    same days (day-over-day rise, week-over-week rise, above-median):
    do the detectors have the same marginal fire rate, or is one
    systematically hotter? The k-treatment extension of McNemar
    (q328). Q = (k−1)·[k·ΣG² − (ΣG)²] / (k·ΣL − ΣL²) where G = per-
    detector totals and L = per-day agreement counts — EVERY term is
    an exact integer off one day-grain frame; ONE division at the
    end."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wt = Window.orderBy("d")
    med = daily.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)")
        .cast("bigint")
        .alias("med")
    )
    flags = daily.select(
        "d",
        "n",
        F.lag("n", 1).over(wt).alias("p1"),
        F.lag("n", 7).over(wt).alias("p7"),
    ).where(
        F.col("p1").isNotNull() & F.col("p7").isNotNull()
    ).crossJoin(F.broadcast(med))
    scored = flags.select(
        F.when(F.col("n") > F.col("p1"), 1).otherwise(0).alias("a"),
        F.when(F.col("n") > F.col("p7"), 1).otherwise(0).alias("b"),
        F.when(F.col("n") > F.col("med"), 1).otherwise(0).alias("c"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("a").cast("bigint").alias("ga"),
        F.sum("b").cast("bigint").alias("gb"),
        F.sum("c").cast("bigint").alias("gc"),
        F.sum(F.col("a") + F.col("b") + F.col("c")).cast("bigint").alias("sl"),
        F.sum(
            (F.col("a") + F.col("b") + F.col("c"))
            * (F.col("a") + F.col("b") + F.col("c"))
        ).cast("bigint").alias("sl2"),
    )
    k = F.lit(3).cast("bigint")
    num = (k - 1) * (
        k * (F.col("ga") * F.col("ga") + F.col("gb") * F.col("gb")
             + F.col("gc") * F.col("gc"))
        - F.col("sl") * F.col("sl")
    )
    den = k * F.col("sl") - F.col("sl2")
    return agg.select(
        "n_days",
        "ga",
        "gb",
        "gc",
        (num.cast("double") / den.cast("double")).alias("cochran_q"),
    )


def _q_friedman(spark: SparkSession, sf: str) -> DataFrame:
    """Friedman rank test: within each day, rank the five event types
    by volume (ties get average ranks), then test whether the rank
    sums differ — the nonparametric repeated-measures ANOVA (does one
    type SYSTEMATICALLY run hotter day after day?). Average ranks are
    kept as DOUBLED integers (2·rank is always whole), so rank sums
    and their squares are exact integers and χ²_F is a fixed
    two-term double epilogue: 3·ΣR₂²/(N·k·(k+1)) − 3·N·(k+1)."""
    ev = read_table(spark, sf, "events")
    daily0 = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # Friedman needs COMPLETE blocks: a day missing a treatment would
    # rank over fewer than k cells and silently bias the chi-square.
    # Keep only days covering every event type present anywhere. Both
    # counts ride WINDOWS on the already-cell-grain frame (≤ 150
    # rows) — no scalar crossJoin, no extra job.
    daily = (
        daily0.withColumn(
            "d_cnt",
            F.count(F.lit(1)).over(Window.partitionBy("d")).cast("bigint"),
        )
        .withColumn(
            "k_all",
            F.size(
                F.collect_set("event_type").over(
                    Window.partitionBy(F.lit(1))
                )
            ).cast("bigint"),
        )
        .where(F.col("d_cnt") == F.col("k_all"))
        .select("d", "event_type", "n")
    )
    wd = Window.partitionBy("d").orderBy("n")
    wties = Window.partitionBy("d", "n")
    ranked = daily.select(
        "d",
        "event_type",
        # doubled average rank: 2*min_rank + (ties - 1) — integer
        (
            2 * F.rank().over(wd)
            + F.count(F.lit(1)).over(wties)
            - 1
        ).cast("bigint").alias("r2"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.sum("r2").cast("bigint").alias("rsum2"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    tot = sums.agg(
        F.max("n_days").cast("bigint").alias("nn"),
        F.sum(F.col("rsum2") * F.col("rsum2")).cast("bigint").alias("sr2"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    chi = (
        F.lit(3.0) * F.col("sr2").cast("double")
        / (F.col("nn") * F.col("k") * (F.col("k") + 1)).cast("double")
        - F.lit(3.0) * (F.col("nn") * (F.col("k") + 1)).cast("double")
    )
    return tot.select(
        F.col("nn").alias("n_days"),
        F.col("k").alias("k_treatments"),
        chi.alias("friedman_chi2"),
    )


def _q_cvm_two_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Cramér–von Mises statistic per event type (first-
    half vs second-half daily counts): T = U/(n·m·N) − (4mn−1)/(6N)
    with U = n·Σ_A(r_i−i)² + m·Σ_B(s_j−j)² over pooled ranks — the
    whole-distribution drift test that weighs the body where KS (q199)
    only sees the single worst gap. Ranks use the deterministic total
    order (count, day) so ties resolve identically everywhere
    (documented tiebreak, the q141 discipline); U is then a PURE
    INTEGER and T is two divisions. One day-grain aggregate, two rank
    windows, one reduce per type."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    half = F.when(
        F.col("d") < F.lit("2024-01-16").cast("timestamp"), "a"
    ).otherwise("b")
    base = daily.select("event_type", "d", "n", half.alias("h"))
    wp = Window.partitionBy("event_type").orderBy("n", "d")
    ws = Window.partitionBy("event_type", "h").orderBy("n", "d")
    ranked = base.select(
        "event_type",
        "h",
        F.row_number().over(wp).cast("bigint").alias("r"),
        F.row_number().over(ws).cast("bigint").alias("i"),
    )
    diff2 = (F.col("r") - F.col("i")) * (F.col("r") - F.col("i"))
    agg = ranked.groupBy("event_type").agg(
        F.sum(F.when(F.col("h") == "a", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("h") == "b", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("h") == "a", diff2).otherwise(0))
        .cast("bigint")
        .alias("ua"),
        F.sum(F.when(F.col("h") == "b", diff2).otherwise(0))
        .cast("bigint")
        .alias("ub"),
    )
    nn = F.col("n_a") + F.col("n_b")
    u = F.col("n_a") * F.col("ua") + F.col("n_b") * F.col("ub")
    t = u.cast("double") / (
        F.col("n_a") * F.col("n_b") * nn
    ).cast("double") - (
        4 * F.col("n_a") * F.col("n_b") - 1
    ).cast("double") / (6 * nn).cast("double")
    return agg.select(
        "event_type", "n_a", "n_b", u.cast("bigint").alias("u"),
        t.alias("cvm_t"),
    )


def _q_pacf(spark: SparkSession, sf: str) -> DataFrame:
    """Partial autocorrelation (lags 1-7) per event type via the
    Durbin–Levinson recursion — THE ARIMA order-identification plot
    (q311's ACF says "correlated"; PACF says "AR(p) with THIS p").
    The ACF inputs are exact: mean-centering uses the common-
    denominator trick ((m·x−S) products are pure integers), so each
    r_k is ONE division. The DL recursion itself runs driver-side on
    the collected 5×7 ACF table (35 doubles — a rerank-sized
    epilogue, never data-scale) with plain sequential Python floats;
    the oracle replays the identical recursion in a recursive CTE, so
    even this iterative solve is hash-gated."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("n").cast("bigint").alias("s"),
    )
    wt = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.join(mom, "event_type").select(
        "event_type",
        "m",
        (F.col("m") * F.col("n") - F.col("s")).alias("c0"),
        *[
            (
                F.col("m") * F.lag("n", k).over(wt) - F.col("s")
            ).alias(f"c{k}")
            for k in range(1, 8)
        ],
    )
    acf = lagged.groupBy("event_type").agg(
        F.sum(F.col("c0") * F.col("c0")).cast("decimal(38,0)").alias("den"),
        *[
            F.sum(F.col("c0") * F.col(f"c{k}")).cast("decimal(38,0)").alias(f"num{k}")
            for k in range(1, 8)
        ],
    )
    rows = acf.collect()
    out = []
    for row in sorted(rows, key=lambda r: r["event_type"]):
        den = float(row["den"])
        r = [float(row[f"num{k}"]) / den for k in range(1, 8)]
        # Durbin–Levinson: phi[k][k] from phi[k-1][*]
        phi_prev: list[float] = []
        for k in range(1, 8):
            num = r[k - 1]
            den_k = 1.0
            for j in range(1, k):
                num -= phi_prev[j - 1] * r[k - j - 1]
                den_k -= phi_prev[j - 1] * r[j - 1]
            pkk = num / den_k
            phi_new = [
                phi_prev[j - 1] - pkk * phi_prev[k - j - 1]
                for j in range(1, k)
            ] + [pkk]
            out.append((row["event_type"], k, pkk))
            phi_prev = phi_new
    return spark.createDataFrame(
        out, "event_type string, lag int, pacf double"
    )


def _q_kruskal_wallis(spark: SparkSession, sf: str) -> DataFrame:
    """Kruskal–Wallis H across event types on daily counts — the
    k-sample extension of q279's Mann–Whitney (rank ANOVA: do the
    five types draw from the same daily-volume distribution?). Ranks
    use the doubled-average-rank trick (2·rank + ties − 1 is always a
    whole number), so every rank sum R2_j and the tie term are PURE
    INTEGERS: with R_j = R2_j/2, H = 12/(N(N+1))·ΣR_j²/n_j − 3(N+1)
    collapses to 3·(ΣR2_j²/n_j)/(N(N+1)) − 3(N+1). The per-group
    rational Σ is folded over the FIXED 5-type vocabulary in literal
    order (q384's discipline); the tie correction Σ(t³−t) rides the
    SAME rank scan via the per-row identity Σ_rows(t²−1) — no second
    aggregate, no crossJoin. Cell-grain (≤ 150 rows) after ONE fact
    scan."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wall = Window.orderBy("n")
    wtie = Window.partitionBy("n")
    t_sz = F.count(F.lit(1)).over(wtie).cast("bigint")
    ranked = daily.select(
        "event_type",
        (2 * F.rank().over(wall) + t_sz - 1).cast("bigint").alias("r2"),
        (t_sz * t_sz - 1).alias("tpart"),
    )
    g = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("r2").cast("bigint").alias("s"),
        F.sum("tpart").cast("bigint").alias("tp"),
    )
    wide = g.groupBy().pivot("event_type", EVENT_TYPES).agg(
        F.max(F.struct("s", "m", "tp"))
    )
    terms = [
        F.col(f"{t}.s").cast("double")
        * F.col(f"{t}.s").cast("double")
        / F.col(f"{t}.m").cast("double")
        for t in EVENT_TYPES
    ]
    srr = terms[0]
    for term in terms[1:]:
        srr = srr + term
    nn = sum(
        (F.col(f"{t}.m") for t in EVENT_TYPES), F.lit(0)
    ).cast("bigint")
    tie_sum = sum(
        (F.col(f"{t}.tp") for t in EVENT_TYPES), F.lit(0)
    ).cast("bigint")
    h = (
        F.lit(3.0) * srr / (nn * (nn + 1)).cast("double")
        - F.lit(3.0) * (nn + 1).cast("double")
    )
    corr = F.lit(1.0) - tie_sum.cast("double") / (
        nn * nn * nn - nn
    ).cast("double")
    return wide.select(
        nn.alias("n_cells"),
        h.alias("h_stat"),
        (h / corr).alias("h_corrected"),
    )


def _q_brown_forsythe(spark: SparkSession, sf: str) -> DataFrame:
    """Brown–Forsythe (median-centered Levene) homogeneity-of-variance
    test across event types: one-way ANOVA F on z = |n − median_type|
    — the gate q372's equal-variance cousin would need, robustified by
    the median. Medians are percentile_disc TABLE VALUES and counts
    are integers, so every z is a PURE INTEGER and all sums of squares
    come from exact integer moments; Σs²/m folds over the fixed 5-type
    vocabulary in literal order (q384). One fact scan, one broadcast
    median join, one reduce."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    meds = daily.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)").alias(
            "med"
        )
    )
    z = daily.join(F.broadcast(meds), "event_type").select(
        "event_type",
        F.abs(F.col("n") - F.col("med")).cast("bigint").alias("z"),
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("z").cast("bigint").alias("s"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("q"),
    )
    wide = g.groupBy().pivot("event_type", EVENT_TYPES).agg(
        F.max(F.struct("s", "m", "q"))
    )
    terms = [
        F.col(f"{t}.s").cast("double")
        * F.col(f"{t}.s").cast("double")
        / F.col(f"{t}.m").cast("double")
        for t in EVENT_TYPES
    ]
    ssg = terms[0]
    for term in terms[1:]:
        ssg = ssg + term
    nn = sum(
        (F.col(f"{t}.m") for t in EVENT_TYPES), F.lit(0)
    ).cast("bigint")
    s_sum = sum(
        (F.col(f"{t}.s") for t in EVENT_TYPES), F.lit(0)
    ).cast("bigint")
    q_sum = sum(
        (F.col(f"{t}.q") for t in EVENT_TYPES), F.lit(0)
    ).cast("bigint")
    k = F.lit(len(EVENT_TYPES)).cast("bigint")
    ssb = ssg - s_sum.cast("double") * s_sum.cast("double") / nn.cast(
        "double"
    )
    ssw = q_sum.cast("double") - ssg
    f_bf = (ssb / (k - 1).cast("double")) / (
        ssw / (nn - k).cast("double")
    )
    return wide.select(
        k.alias("k_groups"),
        nn.alias("n_days"),
        (k - 1).cast("bigint").alias("df1"),
        (nn - k).cast("bigint").alias("df2"),
        f_bf.alias("f_stat"),
    )


def _q_allan_variance(spark: SparkSession, sf: str) -> DataFrame:
    """Non-overlapping Allan variance of the daily event-count series
    per event type at τ ∈ {1,2,3} days — THE sensor-stability metric
    (oscillator/IMU drift is specified in Allan deviation, the natural
    headline stat for a sensor time-series engine). With bin sums S_b
    over complete τ-day bins, σ²(τ) = Σ(S_{b+1}−S_b)² / (2(M−1)τ²):
    the numerator is an exact integer (common-denominator trick — bin
    MEANS never materialize), one double division per (type, τ) row.
    One fact scan feeds all three τ frames."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d")
    idx = daily.select(
        "event_type", "n", F.row_number().over(wt).cast("bigint").alias("i")
    )
    outs = []
    for tau in (1, 2, 3):
        bins = (
            idx.withColumn("b", F.expr(f"(i - 1) div {tau}"))
            .groupBy("event_type", "b")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.sum("n").cast("bigint").alias("sb"),
            )
            .where(F.col("cnt") == tau)
        )
        wb = Window.partitionBy("event_type").orderBy("b")
        diffed = bins.select(
            "event_type",
            "sb",
            (F.lead("sb").over(wb) - F.col("sb")).alias("diff"),
        )
        agg = diffed.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("m_bins"),
            F.sum(F.col("diff") * F.col("diff")).cast("bigint").alias("sd2"),
        )
        outs.append(
            agg.select(
                "event_type",
                F.lit(tau).cast("int").alias("tau"),
                "m_bins",
                (
                    F.col("sd2").cast("double")
                    / (
                        2 * (F.col("m_bins") - 1) * tau * tau
                    ).cast("double")
                ).alias("allan_var"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _q_hurst_rs(spark: SparkSession, sf: str) -> DataFrame:
    """Rescaled-range (R/S) blocks for Hurst-exponent estimation: for
    window sizes w ∈ {8,16}, split each type's day-indexed count
    series into complete w-day blocks and emit each block's R/S — the
    long-memory diagnostic (H≈0.5 random walk, H→1 trending). The
    cumulative deviations are kept at common denominator w (w·cum −
    t·S is a PURE INTEGER), so R_scaled = max−min is exact and
    R/S = R_scaled/√(w·Σx²−S²) is ONE integer-ratio sqrt + ONE
    division (sqrt is IEEE-exact on every engine). Per-block rows are
    emitted rather than float-averaged — the log-log slope epilogue is
    the consumer's (no cross-block float sums to order)."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d")
    idx = daily.select(
        "event_type", "d", "n",
        F.row_number().over(wt).cast("bigint").alias("i"),
    )
    outs = []
    for w in (8, 16):
        rows = idx.withColumn("blk", F.expr(f"(i - 1) div {w}")).withColumn(
            "t_in", F.col("i") - F.col("blk") * w
        )
        blocks = rows.groupBy("event_type", "blk").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum("n").cast("bigint").alias("s"),
            F.sum(F.col("n") * F.col("n")).cast("bigint").alias("q"),
        ).where(F.col("cnt") == w)
        wcum = (
            Window.partitionBy("event_type", "blk")
            .orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        dev = rows.join(blocks, ["event_type", "blk"]).select(
            "event_type",
            "blk",
            "s",
            "q",
            (
                w * F.sum("n").over(wcum) - F.col("t_in") * F.col("s")
            ).cast("bigint").alias("dev"),
        )
        per_block = dev.groupBy("event_type", "blk", "s", "q").agg(
            (F.max("dev") - F.min("dev")).cast("bigint").alias("r_scaled")
        )
        outs.append(
            per_block.select(
                "event_type",
                F.lit(w).cast("int").alias("w"),
                F.col("blk").cast("bigint").alias("block"),
                (
                    F.col("r_scaled").cast("double")
                    / F.sqrt(
                        (
                            w * F.col("q") - F.col("s") * F.col("s")
                        ).cast("double")
                    )
                ).alias("rs"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _q_psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Population stability index between first-half and second-half
    event values over train-decile bins — the standard model-monitoring
    drift gate (PSI < 0.1 stable, > 0.25 shifted). Bin edges are
    percentile_disc TABLE VALUES from the train half (collected
    driver-side — 9 decimals, never data-scale — and inlined as
    literals so the fact scan bins with pure comparisons, no
    crossJoin); Laplace +1 smoothing keeps every bin finite. The
    20-cell count table is collected and the ln-epilogue runs in
    PYTHON (libm), because Spark's JVM ln differs from libm in the
    last bit on ~7% of arguments while DuckDB's ln IS libm — the same
    driver-side-epilogue discipline as q390's Durbin–Levinson. Terms
    are summed in bin order 0..9, left-associated, exactly as the
    oracle writes them."""
    import math

    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    base = ev.select(
        F.col("value").cast("decimal(18,2)").alias("v"),
        (
            F.col("ts") < F.lit("2024-01-16").cast("timestamp")
        ).alias("is_train"),
    )
    edges_row = base.where("is_train").agg(
        *[
            F.expr(
                f"percentile_disc(0.{k}) WITHIN GROUP (ORDER BY v)"
            ).alias(f"e{k}")
            for k in range(1, 10)
        ]
    ).collect()[0]
    bin_col = sum(
        (
            F.when(
                F.col("v")
                > F.lit(str(edges_row[f"e{k}"])).cast("decimal(18,2)"),
                1,
            ).otherwise(0)
            for k in range(1, 10)
        ),
        F.lit(0),
    ).alias("bin")
    counts = (
        base.select("is_train", bin_col)
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("is_train"), 1).otherwise(0))
            .cast("bigint")
            .alias("c_train"),
            F.sum(F.when(F.col("is_train"), 0).otherwise(1))
            .cast("bigint")
            .alias("c_test"),
        )
        .collect()
    )
    by_bin = {r["bin"]: (r["c_train"], r["c_test"]) for r in counts}
    n_train = sum(v[0] for v in by_bin.values())
    n_test = sum(v[1] for v in by_bin.values())
    psi = None
    for b in range(10):
        ctr, cte = by_bin.get(b, (0, 0))
        p = (ctr + 1) / (n_train + 10)
        q = (cte + 1) / (n_test + 10)
        term = (p - q) * math.log(p / q)
        psi = term if psi is None else psi + term
    return spark.createDataFrame(
        [(n_train, n_test, psi)],
        "n_train bigint, n_test bigint, psi double",
    )


def _q_xcorr_lag(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-correlation of click vs purchase daily counts at lags
    −3..+3 days — which way does the lead run, and by how many days
    (q188's single-lag corr widened to the full CCF the analyst
    actually reads)? Each lag is an equi-join on shifted DATE keys
    (integer day arithmetic — no interval types), the Pearson r comes
    from exact integer moments, and the epilogue is num/(√a·√b) —
    sqrt is IEEE-exact, so both engines agree bit-for-bit. Seven
    broadcast-sized joins over ONE day-grain frame."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    c = daily.where(F.col("event_type") == "click").select(
        F.col("d").alias("cd"), F.col("n").alias("x")
    )
    p = daily.where(F.col("event_type") == "purchase").select(
        F.col("d").alias("pd"), F.col("n").alias("y")
    )
    outs = []
    for lag in range(-3, 4):
        j = c.join(p, F.date_add(F.col("cd"), lag) == F.col("pd"))
        agg = j.agg(
            F.count(F.lit(1)).cast("bigint").alias("m"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sx2"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sy2"),
        )
        num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        va = (F.col("m") * F.col("sx2") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        vb = (F.col("m") * F.col("sy2") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
        outs.append(
            agg.select(
                F.lit(lag).cast("int").alias("lag_days"),
                F.col("m").alias("n_days"),
                (num / (F.sqrt(va) * F.sqrt(vb))).alias("xcorr"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _q_granger(spark: SparkSession, sf: str) -> DataFrame:
    """Lag-1 Granger causality: does yesterday's click count improve
    the AR(1) prediction of today's purchase count? F-test of the
    restricted (y_t ~ y_{t−1}) vs unrestricted (y_t ~ y_{t−1} +
    x_{t−1}) OLS, both solved in CLOSED FORM from centered moments
    kept at common denominator n (Ĥab = n·Σab − Σa·Σb is a pure
    integer). The whole F statistic reduces to ONE ratio of exact
    decimal products: F = (n−3)·(numU·Ĥzz − Ĥzy²·D) /
    (Ĥzz·(Ĥyy·D − numU)) with numU = ĤwwĤzy² − 2ĤzwĤzyĤwy + ĤzzĤwy²
    and D = ĤzzĤww − Ĥzw² — all decimal(38)-exact through sf≈0.3
    (triple products ~1e34; bounds tracked in SCALING.md style), then
    one double division. Day-grain: two tiny series, one window lag,
    one reduce."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    y = daily.where(F.col("event_type") == "purchase").select(
        "d", F.col("n").alias("y")
    )
    x = daily.where(F.col("event_type") == "click").select(
        "d", F.col("n").alias("x")
    )
    j = y.join(x, "d")
    wo = Window.orderBy("d")
    lagged = j.select(
        F.col("y"),
        F.lag("y").over(wo).alias("z"),
        F.lag("x").over(wo).alias("w"),
    ).where(F.col("z").isNotNull() & F.col("w").isNotNull())
    agg = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("sww"),
        F.sum(F.col("z") * F.col("y")).cast("bigint").alias("szy"),
        F.sum(F.col("w") * F.col("y")).cast("bigint").alias("swy"),
        F.sum(F.col("z") * F.col("w")).cast("bigint").alias("szw"),
    )
    d19 = "decimal(19,0)"
    hat = agg.select(
        "m",
        (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast(d19)
        .alias("hyy"),
        (F.col("m") * F.col("szz") - F.col("sz") * F.col("sz"))
        .cast(d19)
        .alias("hzz"),
        (F.col("m") * F.col("sww") - F.col("sw") * F.col("sw"))
        .cast(d19)
        .alias("hww"),
        (F.col("m") * F.col("szy") - F.col("sz") * F.col("sy"))
        .cast(d19)
        .alias("hzy"),
        (F.col("m") * F.col("swy") - F.col("sw") * F.col("sy"))
        .cast(d19)
        .alias("hwy"),
        (F.col("m") * F.col("szw") - F.col("sz") * F.col("sw"))
        .cast(d19)
        .alias("hzw"),
    )
    num_u = (
        F.col("hww") * F.col("hzy") * F.col("hzy")
        - F.lit(2).cast("decimal(2,0)")
        * F.col("hzw")
        * F.col("hzy")
        * F.col("hwy")
        + F.col("hzz") * F.col("hwy") * F.col("hwy")
    )
    dd = F.col("hzz") * F.col("hww") - F.col("hzw") * F.col("hzw")
    a = (num_u * F.col("hzz")).cast("decimal(38,0)") - (
        F.col("hzy") * F.col("hzy") * dd
    ).cast("decimal(38,0)")
    b = (
        F.col("hzz") * ((F.col("hyy") * dd).cast("decimal(38,0)") - num_u.cast("decimal(38,0)"))
    ).cast("decimal(38,0)")
    return hat.select(
        F.col("m").alias("n_obs"),
        (
            (F.col("m") - 3).cast("double")
            * (a.cast("double") / b.cast("double"))
        ).alias("f_granger"),
    )


def _q_james_stein(spark: SparkSession, sf: str) -> DataFrame:
    """James–Stein (empirical-Bayes) shrinkage of per-type daily-mean
    counts toward the grand mean: shrunk_j = ḡ + c·(x̄_j − ḡ) with
    c = max(0, 1 − (k−3)·(MSW/m̄)/Σ(x̄_j−ḡ)²) — the estimator that
    dominates the raw per-group means for k ≥ 4 (balanced-variance
    form; the equal-m̄ simplification is documented). All inputs are
    exact integer moments; x̄_j, ḡ and both Σ folds are fixed double
    epilogues in literal EVENT_TYPES order (q384's discipline). Five
    output rows from ONE wide row — no second scan."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("q"),
    )
    wide = g.groupBy().pivot("event_type", EVENT_TYPES).agg(
        F.max(F.struct("s", "m", "q"))
    )
    nn = sum(
        (F.col(f"{t}.m") for t in EVENT_TYPES), F.lit(0)
    ).cast("bigint")
    s_sum = sum(
        (F.col(f"{t}.s") for t in EVENT_TYPES), F.lit(0)
    ).cast("bigint")
    q_sum = sum(
        (F.col(f"{t}.q") for t in EVENT_TYPES), F.lit(0)
    ).cast("bigint")
    k = len(EVENT_TYPES)
    gbar = s_sum.cast("double") / nn.cast("double")
    xbar = {
        t: F.col(f"{t}.s").cast("double") / F.col(f"{t}.m").cast("double")
        for t in EVENT_TYPES
    }
    ssg_terms = [
        F.col(f"{t}.s").cast("double")
        * F.col(f"{t}.s").cast("double")
        / F.col(f"{t}.m").cast("double")
        for t in EVENT_TYPES
    ]
    ssg = ssg_terms[0]
    for term in ssg_terms[1:]:
        ssg = ssg + term
    ssw = q_sum.cast("double") - ssg
    msw = ssw / (nn - k).cast("double")
    mbar = nn.cast("double") / F.lit(float(k))
    dev_terms = [
        (xbar[t] - gbar) * (xbar[t] - gbar) for t in EVENT_TYPES
    ]
    ssb_means = dev_terms[0]
    for term in dev_terms[1:]:
        ssb_means = ssb_means + term
    c = F.greatest(
        F.lit(0.0),
        F.lit(1.0)
        - (F.lit(float(k - 3)) * (msw / mbar)) / ssb_means,
    )
    rows = [
        F.struct(
            F.lit(t).alias("event_type"),
            xbar[t].alias("raw_mean"),
            (gbar + c * (xbar[t] - gbar)).alias("shrunk_mean"),
        )
        for t in EVENT_TYPES
    ]
    return wide.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.*")


def _q_good_turing(spark: SparkSession, sf: str) -> DataFrame:
    """Good–Turing unseen-mass estimate per source: N₁/N (hapax share
    of tokens) — the classic answer to "how much of this source's
    vocabulary have we NOT seen yet", the coverage gate a corpus
    curator reads before declaring a crawl converged. Whitespace
    tokens (the repo-wide convention), integer counts end-to-end, ONE
    division per source."""
    docs = read_table(spark, sf, "documents")
    tc = docs.select(
        "source", F.explode(tokens("text")).alias("t")
    ).groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per = tc.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
    )
    return per.select(
        "source",
        "n_tokens",
        "n_types",
        "n_hapax",
        (
            F.col("n_hapax").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("unseen_mass"),
    )


def _q_kaplan_meier(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan–Meier survival of inter-purchase gaps: time-to-next-
    purchase in days per user, with the tail after each user's LAST
    purchase right-censored at the corpus horizon (2024-01-30) — the
    estimator behind every retention curve that must not pretend
    silent users converted. The distinct-duration life table (≤ 30
    rows — group-cardinality, never data-scale) is collected and the
    sequential product Π(1 − dᵢ/nᵢ) folds driver-side in Python; the
    oracle replays the identical IEEE op order in a recursive CTE
    (q390's discipline). One fact scan, one lead window, one
    day-grain reduce."""
    ev = read_table(spark, sf, "events")
    pur = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("pd"),
        )
        .distinct()
    )
    wu = Window.partitionBy("user_id").orderBy("pd")
    nxt = F.lead("pd").over(wu)
    spans = pur.select(
        F.when(
            nxt.isNotNull(), F.datediff(nxt, F.col("pd"))
        ).otherwise(
            F.datediff(F.lit("2024-01-30").cast("date"), F.col("pd"))
        ).cast("int").alias("dur"),
        F.when(nxt.isNotNull(), 1).otherwise(0).alias("obs"),
    )
    steps = spans.groupBy("dur").agg(
        F.sum("obs").cast("bigint").alias("d"),
        F.sum(1 - F.col("obs")).cast("bigint").alias("c"),
    ).collect()
    steps = sorted(steps, key=lambda r: r["dur"])
    n_risk = sum(r["d"] + r["c"] for r in steps)
    s = 1.0
    out = []
    for r in steps:
        s = s * (1.0 - r["d"] / n_risk)
        out.append((r["dur"], n_risk, r["d"], r["c"], s))
        n_risk -= r["d"] + r["c"]
    return spark.createDataFrame(
        out,
        "duration int, n_risk bigint, d_events bigint, "
        "c_censored bigint, survival double",
    )


def _q_binseg_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    """Single best changepoint in the grand daily-count series by
    binary segmentation: the split maximizing the between-segment sum
    of squares — CUSUM's (q83) offline sibling and the first split of
    any binseg/PELT tree. Gain = S_L²/n_L + S_R²/n_R − T²/N is
    computed from exact integer cumulatives (identical double ops on
    both engines — no accumulated float state), and the argmax is a
    deterministic (gain DESC, day ASC) top-1. Day-grain windows, one
    reduce."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wo = Window.orderBy("d")
    wall = Window.partitionBy(F.lit(1))
    cum = daily.select(
        "d",
        F.row_number().over(wo).cast("bigint").alias("i"),
        F.sum("n")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cs"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("nn"),
        F.sum("n").over(wall).cast("bigint").alias("tt"),
    )
    cand = cum.where(F.col("i") < F.col("nn"))
    gain = (
        (F.col("cs") * F.col("cs")).cast("double") / F.col("i").cast("double")
        + (
            (F.col("tt") - F.col("cs")) * (F.col("tt") - F.col("cs"))
        ).cast("double")
        / (F.col("nn") - F.col("i")).cast("double")
        - (F.col("tt") * F.col("tt")).cast("double") / F.col("nn").cast("double")
    )
    return (
        cand.select(
            F.col("d").alias("split_day"),
            F.col("i").alias("n_left"),
            (F.col("nn") - F.col("i")).alias("n_right"),
            gain.alias("gain"),
        )
        .orderBy(F.col("gain").desc(), F.col("split_day").asc())
        .limit(1)
    )


def _q_entropy_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Language-mix concentration per source: Shannon entropy (nats),
    Herfindahl index, and exp(H) effective-language count over each
    source's lang distribution — the monolingual-vs-mixed fingerprint
    a corpus router needs. Counts reduce distributed; the (source,
    lang) cell table (≤ a few dozen rows) is collected and the
    −Σp·ln p fold runs in PYTHON (libm — Spark's JVM ln differs from
    libm in the last bit; q395's discipline) in ascending-lang order,
    exactly as the oracle's ordered list_reduce replays it. Herfindahl
    stays an exact integer ratio."""
    import math

    docs = read_table(spark, sf, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).collect()
    by_src: dict[str, list] = {}
    for r in cells:
        by_src.setdefault(r["source"], []).append((r["lang"], r["c"]))
    out = []
    for src in sorted(by_src):
        langs = sorted(by_src[src])
        n = sum(c for _, c in langs)
        c2 = sum(c * c for _, c in langs)
        h = None
        for _, c in langs:
            p = c / n
            term = -(p * math.log(p))
            h = term if h is None else h + term
        out.append(
            (
                src,
                n,
                len(langs),
                h,
                float(c2) / float(n * n),
                math.exp(h),
            )
        )
    return spark.createDataFrame(
        out,
        "source string, n_docs bigint, n_langs bigint, entropy double, "
        "herfindahl double, effective_langs double",
    )


def _q_bartlett(spark: SparkSession, sf: str) -> DataFrame:
    """Bartlett's test for equal variances of daily counts across the
    five event types — the parametric (ln-based) sharp-toothed sibling
    of q392's Brown–Forsythe: χ² = [(N−k)·ln(S²_p) − Σ(m_j−1)·ln(S²_j)]
    / C with the standard correction C. Group variances are exact
    integer-moment rationals; the 5-row moment table is collected and
    the ln epilogue runs in PYTHON (libm, q395's discipline), folding
    every Σ in literal EVENT_TYPES order exactly as the oracle writes
    its terms. One fact scan, one 5-row reduce, one output row."""
    import math

    ev = read_table(spark, sf, "events")
    g = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("q"),
    )
    rows = {r["event_type"]: r for r in g.collect()}
    k = len(EVENT_TYPES)
    nn = sum(rows[t]["m"] for t in EVENT_TYPES)
    pooled_num = None
    lnsum = None
    invsum = None
    for t in EVENT_TYPES:
        m, s, q = rows[t]["m"], rows[t]["s"], rows[t]["q"]
        var = (m * q - s * s) / (m * (m - 1))
        tp = (m - 1) * var
        tl = (m - 1) * math.log(var)
        ti = 1.0 / (m - 1)
        pooled_num = tp if pooled_num is None else pooled_num + tp
        lnsum = tl if lnsum is None else lnsum + tl
        invsum = ti if invsum is None else invsum + ti
    pooled = pooled_num / (nn - k)
    cc = 1.0 + (invsum - 1.0 / (nn - k)) / (3.0 * (k - 1))
    chi2 = ((nn - k) * math.log(pooled) - lnsum) / cc
    return spark.createDataFrame(
        [(k, nn, pooled, chi2)],
        "k_groups int, n_days bigint, pooled_var double, "
        "bartlett_chi2 double",
    )


def _q_stl_lite(spark: SparkSession, sf: str) -> DataFrame:
    """Additive seasonal decomposition (STL-lite) of each type's daily
    counts: trend = centered 7-day moving average, seasonal = same-dow
    mean of the detrended series, remainder = the rest — the classic
    decomposition-101 view (q385 scores seasonality; this SHOWS it).
    Exactness: detrended values are kept at common denominator 7
    (D = 7n − S₇ is a pure integer), so the per-dow seasonal mean is
    ΣD/(7·m) — ONE division — and trend is S₇/7 — ONE division; the
    remainder is two fixed-order double subtractions. Only complete
    7-day windows emit rows. One fact scan, one window, one dow-grain
    join back."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    ma = daily.select(
        "event_type",
        "d",
        "n",
        F.sum("n").over(w7).cast("bigint").alias("s7"),
        F.count(F.lit(1)).over(w7).cast("bigint").alias("c7"),
    ).where(F.col("c7") == 7)
    det = ma.select(
        "event_type",
        "d",
        "n",
        "s7",
        (7 * F.col("n") - F.col("s7")).cast("bigint").alias("dnum"),
        F.dayofweek("d").cast("int").alias("dow"),
    )
    seas = det.groupBy("event_type", "dow").agg(
        F.sum("dnum").cast("bigint").alias("sd_num"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    trend = F.col("s7").cast("double") / F.lit(7.0)
    seasonal = F.col("sd_num").cast("double") / (
        7 * F.col("m")
    ).cast("double")
    return det.join(seas, ["event_type", "dow"]).select(
        "event_type",
        "d",
        "n",
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        (
            (F.col("n").cast("double") - trend) - seasonal
        ).alias("remainder"),
    )


def _q_streak_days(spark: SparkSession, sf: str) -> DataFrame:
    """Longest strictly-above-median streak per event type (gaps-and-
    islands on the daily count series): how long does a hot spell
    RUN, not just how often days run hot (q325's runs test counts
    flips; this finds the worst sustained burst a capacity planner
    sizes for). Median is a percentile_disc TABLE VALUE, the island
    id i − rank is pure integer arithmetic, and the (length DESC,
    start ASC) top-1 per type is a deterministic window argmax.
    Integers end-to-end — no epilogue at all."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    meds = daily.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)").alias(
            "med"
        )
    )
    wt = Window.partitionBy("event_type").orderBy("d")
    idx = daily.join(F.broadcast(meds), "event_type").select(
        "event_type",
        "d",
        "n",
        F.row_number().over(wt).cast("bigint").alias("i"),
        (F.col("n") > F.col("med")).alias("hot"),
    )
    wf = Window.partitionBy("event_type").orderBy("d")
    isl = idx.where("hot").select(
        "event_type",
        "d",
        (F.col("i") - F.row_number().over(wf)).alias("grp"),
    )
    runs = isl.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak_len"),
        F.min("d").alias("streak_start"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("streak_len").desc(), F.col("streak_start").asc()
    )
    return (
        runs.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") == 1)
        .select("event_type", "streak_len", "streak_start")
    )


def _q_ar1_fit(spark: SparkSession, sf: str) -> DataFrame:
    """AR(1) fit of each type's daily counts: φ, intercept and R² of
    n_t ~ n_{t−1} — mean reversion in one number (φ→0 noise, φ→1
    random walk; the model q24's Holt implicitly fights). All three
    come from the integer hat-moments Ĥab = m·Σab − Σa·Σb (exact
    bigints at day grain), with φ = Ĥxy/Ĥxx and R² = Ĥxy²/(ĤxxĤyy)
    as single divisions and the intercept a two-op double epilogue.
    One window lag, one reduce, five rows."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        F.col("n").alias("y"),
        F.lag("n").over(wt).alias("x"),
    ).where(F.col("x").isNotNull())
    agg = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sy2"),
    )
    hxx = (F.col("m") * F.col("sx2") - F.col("sx") * F.col("sx")).cast(
        "decimal(38,0)"
    )
    hyy = (F.col("m") * F.col("sy2") - F.col("sy") * F.col("sy")).cast(
        "decimal(38,0)"
    )
    hxy = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "decimal(38,0)"
    )
    phi = hxy.cast("double") / hxx.cast("double")
    return agg.select(
        "event_type",
        F.col("m").alias("n_obs"),
        phi.alias("phi"),
        (
            (F.col("sy").cast("double") - phi * F.col("sx").cast("double"))
            / F.col("m").cast("double")
        ).alias("intercept"),
        (
            (hxy * hxy).cast("double")
            / (hxx * hyy).cast("double")
        ).alias("r2"),
    )


def _q_mase(spark: SparkSession, sf: str) -> DataFrame:
    """MASE-style seasonal-naive skill score per event type: MAE of
    the naive-7 (same weekday last week) forecast over MAE of the
    naive-1 (yesterday) forecast — below 1 means the weekly cycle
    genuinely forecasts better than persistence, THE model-selection
    gate before fitting anything fancier. Absolute errors of integer
    counts are integers, so both MAEs are single divisions and the
    ratio is a third — no accumulated float state anywhere."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wt = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "n",
        F.lag("n", 1).over(wt).alias("l1"),
        F.lag("n", 7).over(wt).alias("l7"),
    )
    agg = lagged.groupBy("event_type").agg(
        F.sum(
            F.when(
                F.col("l1").isNotNull(), F.abs(F.col("n") - F.col("l1"))
            )
        ).cast("bigint").alias("a1"),
        F.sum(F.when(F.col("l1").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("m1"),
        F.sum(
            F.when(
                F.col("l7").isNotNull(), F.abs(F.col("n") - F.col("l7"))
            )
        ).cast("bigint").alias("a7"),
        F.sum(F.when(F.col("l7").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("m7"),
    )
    mae1 = F.col("a1").cast("double") / F.col("m1").cast("double")
    mae7 = F.col("a7").cast("double") / F.col("m7").cast("double")
    return agg.select(
        "event_type",
        F.col("m7").alias("n_seasonal_errors"),
        mae1.alias("mae_naive1"),
        mae7.alias("mae_naive7"),
        (mae7 / mae1).alias("mase"),
    )


def _q_winsorized_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorized (p10/p90-clipped) and trimmed means of daily counts
    per event type — the robust center estimates that survive one
    crawler burst day (the mean q398 shrinks is still outlier-
    fragile; these are the outlier-PROOF companions). Clip bounds are
    percentile_disc TABLE VALUES, so clipped counts stay pure
    integers and both means are ONE division each. One fact scan, one
    broadcast bound join, one reduce."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    bounds = daily.groupBy("event_type").agg(
        F.expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY n)").alias(
            "p10"
        ),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n)").alias(
            "p90"
        ),
    )
    j = daily.join(F.broadcast(bounds), "event_type")
    clipped = F.greatest(
        F.col("p10"), F.least(F.col("p90"), F.col("n"))
    )
    inside = (F.col("n") >= F.col("p10")) & (F.col("n") <= F.col("p90"))
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("p10").alias("p10"),
        F.max("p90").alias("p90"),
        F.sum(clipped).cast("bigint").alias("wsum"),
        F.sum(F.when(inside, F.col("n"))).cast("bigint").alias("tsum"),
        F.sum(F.when(inside, 1).otherwise(0)).cast("bigint").alias("tm"),
    )
    return agg.select(
        "event_type",
        "n_days",
        "p10",
        "p90",
        (
            F.col("wsum").cast("double") / F.col("n_days").cast("double")
        ).alias("winsorized_mean"),
        (
            F.col("tsum").cast("double") / F.col("tm").cast("double")
        ).alias("trimmed_mean"),
        F.col("tm").alias("n_kept"),
    )


def _q_wilson_interval(spark: SparkSession, sf: str) -> DataFrame:
    """Wilson 95% score interval for each event type's non-null-value
    rate — the binomial CI that behaves at the extremes where the
    Wald interval collapses (the right way to read q373's proportions
    when n is modest). Successes/trials are pure integers; the
    interval is a FIXED double expression (z = 1.96 literal, sqrt is
    IEEE-exact), written in the identical op order on both engines.
    One fact scan, one 5-row reduce."""
    ev = read_table(spark, sf, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("value").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("s"),
    )
    z = F.lit(1.96)
    z2 = z * z
    nd = F.col("n").cast("double")
    p = F.col("s").cast("double") / nd
    denom = F.lit(1.0) + z2 / nd
    center = (p + z2 / (2 * nd)) / denom
    half = (
        z
        * F.sqrt(p * (F.lit(1.0) - p) / nd + z2 / (4 * nd * nd))
        / denom
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_events"),
        p.alias("p_hat"),
        (center - half).alias("wilson_lo"),
        (center + half).alias("wilson_hi"),
    )


def _q_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Flesch-flavored readability per source: words/sentence,
    vowel-group "syllables"/word, and the 206.835 − 1.015·wps −
    84.6·spw score — the classic text-quality screen a curation
    pipeline runs next to q108's Gopher rules. Sentence and syllable
    proxies are regexp_count with engine-portable character classes;
    all per-doc counts are integers summed exactly, with THREE double
    divisions and one literal-coefficient epilogue per source."""
    docs = read_table(spark, sf, "documents")
    per_doc = docs.select(
        "source",
        token_count("text").cast("bigint").alias("w"),
        F.regexp_count(F.col("text"), F.lit(r"[.!?]"))
        .cast("bigint")
        .alias("sent"),
        F.regexp_count(F.col("text"), F.lit(r"[aeiouAEIOU]+"))
        .cast("bigint")
        .alias("vg"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("words"),
        F.sum("sent").cast("bigint").alias("sentences"),
        F.sum("vg").cast("bigint").alias("vowel_groups"),
    )
    # a source whose docs carry no terminal punctuation (or no
    # tokens) gets NULL rather than a division error — ANSI-safe on
    # both engines
    wps = F.when(
        F.col("sentences") > 0,
        F.col("words").cast("double") / F.col("sentences").cast("double"),
    )
    spw = F.when(
        F.col("words") > 0,
        F.col("vowel_groups").cast("double") / F.col("words").cast("double"),
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        wps.alias("words_per_sentence"),
        spw.alias("syllables_per_word"),
        (
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
        ).alias("flesch_score"),
    )


def _q_source_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source 5-gram contamination screen: for every source
    pair, how many DISTINCT 5-token shingles they share — the
    benchmark-leakage audit run before any eval split is trusted
    (a train source sharing long n-grams with an eval source is
    contamination, not coincidence). The inverted shingle index joins
    only within shingle buckets (never all-pairs), sources are
    deduped per shingle first, and the top-20 pairs use the
    deterministic (count DESC, pair ASC) order. Pure integers."""
    docs = read_table(spark, sf, "documents")
    # size >= 5 guard: Spark's sequence(1, 0) DESCENDS instead of
    # returning empty, so short docs must be filtered, not clamped
    sh = (
        docs.withColumn("__toks", tokens("text"))
        .where(F.size("__toks") >= 5)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__toks) - 4),"
                    " i -> concat_ws(' ', slice(__toks, i, 5)))"
                )
            ).alias("shingle"),
        )
    )
    src_sh = sh.distinct()
    pairs = (
        src_sh.alias("a")
        .join(
            src_sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_shingles"))
    )
    return (
        pairs.orderBy(
            F.col("shared_shingles").desc(),
            F.col("source_a").asc(),
            F.col("source_b").asc(),
        )
        .limit(20)
    )


def _q_heaps_law(spark: SparkSession, sf: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct-token vocabulary
    and cumulative token count after ingesting the first 10%, 20%, …
    100% of docs (by doc_id) — the convergence read a crawl operator
    uses to decide "is new data still adding vocabulary". The trick
    that keeps it ONE pass: vocabulary at threshold k is the count of
    tokens whose FIRST-occurrence doc_id ≤ k, so a token-grain
    min(doc_id) frame and a doc-grain token-count frame are unioned
    and 10 conditional sums read the whole curve off one reduce —
    no per-threshold rescans, no crossJoin. Integers end-to-end."""
    docs = read_table(spark, sf, "documents")
    occ = docs.select(
        F.col("doc_id").cast("bigint").alias("did"),
        token_count("text").cast("bigint").alias("wt"),
        F.lit("occ").alias("kind"),
    )
    voc = (
        docs.select(
            F.col("doc_id").cast("bigint").alias("did"),
            F.explode(tokens("text")).alias("t"),
        )
        .groupBy("t")
        .agg(F.min("did").alias("did"))
        .select("did", F.lit(1).cast("bigint").alias("wt"),
                F.lit("voc").alias("kind"))
    )
    u = occ.unionByName(voc)
    # max(doc_id) is ONE scalar: collect it (tiny pushed-down agg on
    # the doc-grain frame) and inline as a literal, instead of a
    # global window that would single-partition the token-vocab-scale
    # union frame at 100 TB
    maxd = docs.agg(F.max(F.col("doc_id").cast("bigint"))).collect()[0][0]
    wide = u.groupBy().agg(
        F.lit(maxd).cast("bigint").alias("maxd"),
        *[
            F.sum(
                F.when(
                    (F.col("kind") == k)
                    & (10 * F.col("did") <= p * maxd),
                    F.col("wt"),
                ).otherwise(0)
            ).cast("bigint").alias(f"{k[0]}{p}")
            for p in range(1, 11)
            for k in ("voc", "occ")
        ],
    )
    rows = [
        F.struct(
            F.lit(p * 10).cast("int").alias("pct_docs"),
            F.col(f"o{p}").alias("tokens_seen"),
            F.col(f"v{p}").alias("vocab_size"),
        )
        for p in range(1, 11)
    ]
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def _q_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level 3-gram novelty per source: the share of each
    source's shingle OCCURRENCES whose shingle appears exactly once
    in the whole corpus — high novelty = original text, low =
    boilerplate/templates (the n-gram flavor of q399's Good–Turing
    hapax mass, but cross-source so copy-paste between sources is
    penalized). Occurrence counts and the global-hapax flag are pure
    integers; ONE division per source."""
    docs = read_table(spark, sf, "documents")
    sh = (
        docs.withColumn("__toks", tokens("text"))
        .where(F.size("__toks") >= 3)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__toks) - 2),"
                    " i -> concat_ws(' ', slice(__toks, i, 3)))"
                )
            ).alias("shingle"),
        )
    )
    per_cell = sh.groupBy("source", "shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wsh = Window.partitionBy("shingle")
    flagged = per_cell.withColumn(
        "g", F.sum("c").over(wsh).cast("bigint")
    )
    agg = flagged.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_shingles"),
        F.sum(F.when(F.col("g") == 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
    )
    return agg.select(
        "source",
        "n_shingles",
        "n_hapax",
        (
            F.col("n_hapax").cast("double")
            / F.col("n_shingles").cast("double")
        ).alias("novelty"),
    )


def _q_hour_chisq(spark: SparkSession, sf: str) -> DataFrame:
    """Hour-of-day χ² decomposition per event type: each (type, hour)
    cell's contribution to the independence χ² against the global
    hourly profile — WHICH hours make a type's daily rhythm deviate
    (q142 shows the profile; this scores it). The numerator
    (o·G − n_t·g_h)² and denominator G·n_t·g_h are exact integers via
    the common-denominator trick (expected counts never materialize
    as floats), one division per cell, and per-cell rows mean NO
    cross-cell float accumulation at all. Margins ride three windows
    on the 120-row cell frame."""
    ev = read_table(spark, sf, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hod")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    wt = Window.partitionBy("event_type")
    wh = Window.partitionBy("hod")
    wg = Window.partitionBy(F.lit(1))
    m = cells.select(
        "event_type",
        "hod",
        "o",
        F.sum("o").over(wt).cast("bigint").alias("nt"),
        F.sum("o").over(wh).cast("bigint").alias("gh"),
        F.sum("o").over(wg).cast("bigint").alias("gg"),
    )
    num = (
        F.col("o") * F.col("gg") - F.col("nt") * F.col("gh")
    ).cast("decimal(19,0)")
    den = (
        F.col("gg").cast("decimal(19,0)")
        * (F.col("nt") * F.col("gh")).cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    return m.select(
        "event_type",
        "hod",
        F.col("o").alias("observed"),
        (
            (F.col("nt") * F.col("gh")).cast("double")
            / F.col("gg").cast("double")
        ).alias("expected"),
        ((num * num).cast("double") / den.cast("double")).alias(
            "chi2_contrib"
        ),
    )


def _q_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf-law fit over the corpus's top-50 token frequencies:
    log-log OLS slope and intercept of count ~ rank — the one-number
    "is this corpus natural-language-shaped" screen (natural text
    slopes ≈ −1; templated or synthetic text flattens). The top-50
    rank table is deterministic ((count DESC, token ASC) ties), the
    four OLS moments fold over ln(rank)/ln(count) DRIVER-SIDE in
    Python libm in rank order (q395's ln discipline — 50 rows, never
    data-scale), and the oracle replays the identical ordered folds
    with DuckDB's list_reduce."""
    import math

    docs = read_table(spark, sf, "documents")
    top = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            "c",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), F.col("t").asc()))
            .cast("bigint")
            .alias("rk"),
        )
        .where(F.col("rk") <= 50)
        .collect()
    )
    rows = sorted(top, key=lambda r: r["rk"])
    n = len(rows)
    sx = sy = sxy = sx2 = None
    for r in rows:
        x = math.log(float(r["rk"]))
        y = math.log(float(r["c"]))
        sx = x if sx is None else sx + x
        sy = y if sy is None else sy + y
        sxy = x * y if sxy is None else sxy + x * y
        sx2 = x * x if sx2 is None else sx2 + x * x
    nd = float(n)
    slope = (nd * sxy - sx * sy) / (nd * sx2 - sx * sx)
    intercept = (sy - slope * sx) / nd
    return spark.createDataFrame(
        [(n, slope, intercept)],
        "n_ranks bigint, zipf_slope double, zipf_intercept double",
    )


def _q_audience_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Audience-overlap matrix: user-set Jaccard for every event-type
    pair — do clickers also purchase, or are the populations disjoint
    (the segmentation read behind every cross-sell plan; q375's
    Tanimoto scores per-USER similarity, this scores per-SEGMENT
    overlap)? Distinct (user, type) pairs self-join only on the user
    key (never all-pairs), degrees ride one aggregate, and jaccard =
    c/(da+db−c) is integer counts + ONE division."""
    ev = read_table(spark, sf, "events")
    ut = ev.select("event_type", "user_id").distinct()
    deg = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    pairs = (
        ut.alias("a")
        .join(
            ut.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_users"))
    )
    da = deg.select(
        F.col("event_type").alias("type_a"), F.col("d").alias("da")
    )
    db = deg.select(
        F.col("event_type").alias("type_b"), F.col("d").alias("db")
    )
    return (
        pairs.join(F.broadcast(da), "type_a")
        .join(F.broadcast(db), "type_b")
        .select(
            "type_a",
            "type_b",
            "common_users",
            (
                F.col("common_users").cast("double")
                / (
                    F.col("da") + F.col("db") - F.col("common_users")
                ).cast("double")
            ).alias("jaccard"),
        )
    )


def _q_slew_alarm(spark: SparkSession, sf: str) -> DataFrame:
    """Slew-rate (rate-of-change) alarm census per event type: the
    share of consecutive same-user readings whose |Δvalue|/Δt exceeds
    50.00 units/second — the instrumentation-health check a sensor
    fleet runs for spikes the absolute-value limits (q51) never see.
    The comparison is CROSS-MULTIPLIED (|Δ¢|·10⁶ > 5000·Δt_µs), so no
    rate ever materializes as a float: pure integer arithmetic, with
    Δt = 0 pairs flagged iff Δv ≠ 0 (infinite slew, documented). One
    fact scan, one user-partitioned lag, one reduce."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("t"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
    )
    w = Window.partitionBy("event_type", "user_id").orderBy(
        "t", "event_id"
    )
    lagged = base.select(
        "event_type",
        (F.col("v") - F.lag("v").over(w)).alias("dv"),
        (F.col("t") - F.lag("t").over(w)).alias("dt"),
    ).where(F.col("dv").isNotNull())
    viol = F.when(
        F.abs(F.col("dv")) * 1000000 > 5000 * F.col("dt"), 1
    ).otherwise(0)
    agg = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(viol).cast("bigint").alias("n_violations"),
    )
    return agg.select(
        "event_type",
        "n_pairs",
        "n_violations",
        (
            F.col("n_violations").cast("double")
            / F.col("n_pairs").cast("double")
        ).alias("violation_rate"),
    )


def _q_twa(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average value per event type (trapezoidal
    integration over irregular sample times) — THE correct "average
    reading" for unevenly-sampled sensors, where the arithmetic mean
    over-weights bursts (the reference's resample-then-mean
    approximates this; the trapezoid is exact). Each term
    (v_i+v_{i+1})·Δt_µs is a pure integer in cent-microseconds,
    summed exactly in decimal(38,0); ONE double division by
    (2·span·100) converts back to value units. Order ties break on
    event_id (the q141 documented-tiebreak discipline)."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts")).alias("t"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
    )
    w = Window.partitionBy("event_type").orderBy("t", "event_id")
    paired = base.select(
        "event_type",
        "t",
        "v",
        F.lead("v").over(w).alias("vn"),
        F.lead("t").over(w).alias("tn"),
    )
    term = (F.col("v") + F.col("vn")) * (F.col("tn") - F.col("t"))
    agg = paired.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum(term.cast("decimal(38,0)")).alias("num"),
        (F.max("t") - F.min("t")).cast("bigint").alias("span"),
    )
    return agg.select(
        "event_type",
        "n_points",
        (
            F.col("num").cast("double")
            / (2 * F.col("span") * 100).cast("double")
        ).alias("twa_value"),
    )


def _q_gap_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Feed-outage audit per event type: inter-arrival gaps vs the
    median cadence — how many gaps ran longer than 2× the typical
    spacing, and how much total time sat inside them (the "was the
    pipeline down" readout next to q109's NULL runs). Gaps are exact
    integer microseconds, the median is a percentile_disc TABLE
    VALUE, and the 2× threshold stays integer — counts and downtime
    are pure integers; no epilogue."""
    ev = read_table(spark, sf, "events")
    base = ev.select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts")).alias("t"),
    )
    w = Window.partitionBy("event_type").orderBy("t", "event_id")
    gaps = base.select(
        "event_type",
        (F.col("t") - F.lag("t").over(w)).alias("gap"),
    ).where(F.col("gap").isNotNull())
    meds = gaps.groupBy("event_type").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY gap)"
        ).cast("bigint").alias("med")
    )
    j = gaps.join(F.broadcast(meds), "event_type")
    is_long = F.col("gap") > 2 * F.col("med")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.max("med").alias("med_gap_us"),
        F.sum(F.when(is_long, 1).otherwise(0))
        .cast("bigint")
        .alias("n_long"),
        F.sum(F.when(is_long, F.col("gap")).otherwise(0))
        .cast("bigint")
        .alias("downtime_us"),
    )


def _q_bucket_availability(spark: SparkSession, sf: str) -> DataFrame:
    """30-minute-bucket availability per event type: the share of the
    calendar's 1440 half-hour slots (30 days × 48) with at least one
    reading — the uptime SLO number (q420's gap audit measures HOW
    LONG outages ran; this scores coverage against the fixed
    calendar). Bucketing reuses q11's unix_micros div 1.8e9
    convention; distinct buckets are integers and the rate is ONE
    division by the literal 1440."""
    ev = read_table(spark, sf, "events")
    b = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 1800000000").alias("bucket"),
    ).distinct()
    agg = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets")
    )
    return agg.select(
        "event_type",
        "n_buckets",
        (F.col("n_buckets").cast("double") / F.lit(1440.0)).alias(
            "availability"
        ),
    )


def _q_calibration_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Reliability-diagram bins for a hash-scored purchase model: the
    md5 'score' is uniform by construction, so a CALIBRATED readout
    must show every decile's observed purchase rate ≈ the base rate —
    the harness that catches a miscalibrated scorer the moment one
    bin drifts (same md5-threshold machinery as q125's A/B arms,
    widened to 10 bins). Bin membership is 9 string comparisons
    against literal hex thresholds; counts are integers and the
    observed rate is ONE division per bin."""
    ev = read_table(spark, sf, "events")
    sc = F.substring(
        F.md5(F.concat(F.lit("cal"), F.col("event_id").cast("string"))),
        1,
        8,
    )
    bin_col = sum(
        (
            F.when(sc > _thr(k / 10), 1).otherwise(0)
            for k in range(1, 10)
        ),
        F.lit(0),
    ).alias("bin")
    base = ev.select(
        bin_col,
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    agg = base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    return agg.select(
        F.col("bin").cast("int").alias("bin"),
        "n_events",
        "n_pos",
        ((F.col("bin").cast("double") + 0.5) / F.lit(10.0)).alias(
            "bin_mid"
        ),
        (
            F.col("n_pos").cast("double") / F.col("n_events").cast("double")
        ).alias("obs_rate"),
    )


def _q_value_auc(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-sum (Mann–Whitney) ROC-AUC of `value` as a purchase
    classifier: P(score_pos > score_neg) with exact midrank tie
    handling — the model-eval primitive every offline scorer reports.
    Doubled average ranks (q391's trick) keep the rank sum a PURE
    INTEGER even under heavy ties, so AUC = (ΣR₂⁺ − n₊(n₊+1)) /
    (2·n₊·n₋) is integer arithmetic with ONE division. The fact
    reduces to the VALUE-GRAIN frame first (never a row-grain global
    rank window): with C_v = rows below v, every tied row's doubled
    midrank is 2·C_v + n_v + 1, so ΣR₂⁺ = Σ pos_v·(2C_v + n_v + 1)
    comes off one bounded cumulative window + one reduce."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    base = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    grains = base.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("nv"),
        F.sum("y").cast("bigint").alias("posv"),
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_c = grains.select(
        "nv",
        "posv",
        (F.sum("nv").over(wcum) - F.col("nv")).cast("bigint").alias("cv"),
    )
    agg = with_c.agg(
        F.sum("posv").cast("bigint").alias("np"),
        F.sum(F.col("nv") - F.col("posv")).cast("bigint").alias("nn"),
        F.sum(
            F.col("posv") * (2 * F.col("cv") + F.col("nv") + 1)
        ).cast("bigint").alias("sr2p"),
    )
    return agg.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        (
            (F.col("sr2p") - F.col("np") * (F.col("np") + 1)).cast("double")
            / (2 * F.col("np") * F.col("nn")).cast("double")
        ).alias("auc"),
    )


def _q_event_gains_table(spark: SparkSession, sf: str) -> DataFrame:
    """Decile gains table (cumulative lift) for `value` as a purchase
    score: events sorted score-DESC, cut into 10 equal-count bins,
    with each prefix's purchase concentration over the base rate —
    the campaign-targeting readout ("top 20% of scores captures X%
    of buyers"). The decile cut ((rn−1)·10 div N) and all counts are
    integers; lift = cum_pos·N/(cum_n·P) is ONE division of integer
    products. Ties break on event_id so the cut is deterministic on
    every engine."""
    ev = read_table(spark, sf, "events").where(F.col("value").isNotNull())
    base = ev.select(
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    wall = Window.partitionBy(F.lit(1))
    cut = base.select(
        "y",
        F.expr(
            "(cast(row_number() over (order by v desc, event_id asc)"
            " as bigint) - 1) * 10"
        ).alias("rn10"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("ntot"),
    ).select(
        "y",
        "ntot",
        F.expr("rn10 div ntot").cast("int").alias("decile"),
    )
    per = cut.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.max("ntot").alias("ntot"),
    )
    wd = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wp = Window.partitionBy(F.lit(1))
    cum = per.select(
        "decile",
        "n_events",
        "n_pos",
        "ntot",
        F.sum("n_events").over(wd).cast("bigint").alias("cum_n"),
        F.sum("n_pos").over(wd).cast("bigint").alias("cum_pos"),
        F.sum("n_pos").over(wp).cast("bigint").alias("ptot"),
    )
    return cum.select(
        "decile",
        "n_events",
        "n_pos",
        "cum_pos",
        (
            (F.col("cum_pos") * F.col("ntot")).cast("double")
            / (F.col("cum_n") * F.col("ptot")).cast("double")
        ).alias("cum_lift"),
    )


def _q_seasonal_mk(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal Mann–Kendall trend test per event type: the MK
    statistic computed WITHIN each day-of-week stratum and summed —
    the monotone-trend test that a weekly cycle cannot fool (plain MK,
    q191, reads the weekend dip as trend noise; Hirsch–Slack strata
    remove it). S is a pure integer pairwise sign sum over ≤⌈days/7⌉-
    row strata (the self-join is stratum-bounded, never cross-day at
    scale), the tie-corrected variance keeps its /18 as an exact
    integer numerator, and Z = (S∓1)/√(num/18) is a fixed two-op
    double epilogue."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    strat = daily.select(
        "event_type",
        F.dayofweek("d").cast("int").alias("dow"),
        "d",
        "n",
    )
    a = strat.alias("a")
    b = strat.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.dow") == F.col("b.dow"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.signum(
            (F.col("b.n") - F.col("a.n")).cast("double")
        ).cast("bigint").alias("sgn"),
    )
    s_stat = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("bigint").alias("s")
    )
    # variance: sum over strata of [m(m-1)(2m+5) - sum_t t(t-1)(2t+5)]
    # where t are tie-group sizes within the stratum
    ties = strat.groupBy("event_type", "dow", "n").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    var_num = ties.groupBy("event_type", "dow").agg(
        F.sum("t").cast("bigint").alias("m"),
        F.sum(
            F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
        ).cast("bigint").alias("tie_term"),
    ).select(
        "event_type",
        (
            F.col("m") * (F.col("m") - 1) * (2 * F.col("m") + 5)
            - F.col("tie_term")
        ).alias("vn"),
    ).groupBy("event_type").agg(
        F.sum("vn").cast("bigint").alias("var_num")
    )
    j = s_stat.join(var_num, "event_type")
    cont = F.when(F.col("s") > 0, F.col("s") - 1).when(
        F.col("s") < 0, F.col("s") + 1
    ).otherwise(F.lit(0))
    return j.select(
        "event_type",
        F.col("s").alias("s_stat"),
        "var_num",
        F.when(
            F.col("var_num") > 0,
            cont.cast("double")
            / F.sqrt(F.col("var_num").cast("double") / F.lit(18.0)),
        ).alias("z_stat"),
    )


def _q_partial_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Partial correlation of click vs purchase daily counts
    CONTROLLING for view volume: r_xy·z = (r_xy − r_xz·r_yz) /
    (√(1−r_xz²)·√(1−r_yz²)) — does the click→purchase link survive
    once overall traffic is held fixed, or was q188's raw correlation
    just both series riding the same tide? Every pairwise r comes
    from exact integer hat-moments (m·Σab − ΣaΣb); the epilogue is a
    fixed sequence of double products/sqrts written identically on
    both engines. One day-grain pivot, one reduce, one row."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wide = daily.groupBy("d").pivot(
        "event_type", ["click", "purchase", "view"]
    ).agg(F.max("n")).select(
        F.col("click").alias("x"),
        F.col("purchase").alias("y"),
        F.col("view").alias("z"),
    ).where(
        F.col("x").isNotNull()
        & F.col("y").isNotNull()
        & F.col("z").isNotNull()
    )
    agg = wide.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("bigint").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("bigint").alias("syz"),
    )
    def _hat(ab: str, a: str, b: str) -> F.Column:
        return (
            F.col("m") * F.col(ab) - F.col(a) * F.col(b)
        ).cast("decimal(38,0)")

    hxy = _hat("sxy", "sx", "sy")
    hxz = _hat("sxz", "sx", "sz")
    hyz = _hat("syz", "sy", "sz")
    hxx = _hat("sxx", "sx", "sx")
    hyy = _hat("syy", "sy", "sy")
    hzz = _hat("szz", "sz", "sz")
    rxy = hxy.cast("double") / (
        F.sqrt(hxx.cast("double")) * F.sqrt(hyy.cast("double"))
    )
    rxz = hxz.cast("double") / (
        F.sqrt(hxx.cast("double")) * F.sqrt(hzz.cast("double"))
    )
    ryz = hyz.cast("double") / (
        F.sqrt(hyy.cast("double")) * F.sqrt(hzz.cast("double"))
    )
    return agg.select(
        F.col("m").alias("n_days"),
        rxy.alias("r_xy"),
        (
            (rxy - rxz * ryz)
            / (
                F.sqrt(F.lit(1.0) - rxz * rxz)
                * F.sqrt(F.lit(1.0) - ryz * ryz)
            )
        ).alias("r_xy_given_z"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship_hourly_wide": _q_flagship,
        "q01_pricing_summary": _q_pricing_summary,
        "q03_segment_revenue": _q_segment_revenue,
        "q04_region_supplier_stats": _q_region_supplier_stats,
        "q05_event_type_pivot": _q_event_type_pivot,
        "q06_customers_without_orders": _q_customers_without_orders,
        "q07_case_projection": _q_case_projection,
        "q08_set_ops": _q_set_ops,
        "q09_top_orders_per_customer": _q_top_orders_per_customer,
        "q10_next_day_max": _q_next_day_max,
        "q11_resample_30min": _q_resample_30min,
        "q12_rollup": _q_rollup,
        "q13_ffill": _q_ffill,
        "q14_interpolate": _q_interpolate,
        "q15_sessionize": _q_sessionize,
        "q16_quantile_clip": _q_quantile_clip,
        "q17_dedup_exact": _q_dedup_exact,
        "q18_dedup_keep_first": _q_dedup_keep_first,
        "q19_jaccard_pairs": _q_jaccard_pairs,
        "q20_minhash_lsh": _q_minhash_lsh,
        "q21_simhash": _q_simhash,
        "q22_doc_stats": _q_doc_stats,
        "q23_topk_cosine": _q_topk_cosine,
        "q29_asof_join": _q_asof_join,
        "q30_embedding_norm_stats": _q_embedding_norm_stats,
        "q31_text_features": _q_text_features,
        "q32_fingerprint_cardinality": _q_fingerprint_cardinality,
        "q33_distinct_agg": _q_distinct_agg,
        "q34_cube": _q_cube,
        "q35_approx_quantiles": _q_approx_quantiles,
        "q36_blob_metadata": _q_blob_metadata,
        "q37_decode_features": _q_decode_features,
        "q38_embedding_near_dup": _q_embedding_near_dup,
        "q39_srp_signature": _q_srp_signature,
        "q40_semi_join": _q_semi_join,
        "q41_outer_join": _q_outer_join,
        "q42_interval_join": _q_interval_join,
        "q24_holt_forecast": _q_holt_forecast,
        "q25_arima_grid": _q_arima_grid,
        "q26_seasonal_decompose": _q_seasonal_decompose,
        "q27_mlp_classification": _q_mlp_classification,
        "q28_gbt_regression": _q_gbt_regression,
        "q43_model_metrics": _q_model_metrics,
        "q44_sql_interface": _q_sql_interface,
        "q45_char_ngram_jaccard": _q_char_ngram_jaccard,
        "q46_unpivot": _q_unpivot,
        "q47_ivf_topk": _q_ivf_topk,
        "q48_correlated_subquery": _q_correlated_subquery,
        "q49_rolling_avg": _q_rolling_avg,
        "q50_ewma_anomaly": _q_ewma_anomaly,
        "q51_validation_counts": _q_validation_counts,
        "q52_quarantine": _q_quarantine,
        "q53_dedup_clusters": _q_dedup_clusters,
        "q54_grouping_sets": _q_grouping_sets,
        "q55_window_rank_suite": _q_window_rank_suite,
        "q56_top_terms": _q_top_terms,
        "q57_approx_distinct": _q_approx_distinct,
        "q58_missing_buckets": _q_missing_buckets,
        "q59_salted_agg": _q_salted_agg,
        "q60_exact_percentiles": _q_exact_percentiles,
        "q61_quantize_embeddings": _q_quantize_embeddings,
        "q62_pca_embeddings": _q_pca_embeddings,
        "q63_scd2_dimension": _q_scd2,
        "q64_hash_split": _q_hash_split,
        "q65_rate_of_change": _q_rate_of_change,
        "q66_mad_outliers": _q_mad_outliers,
        "q67_bm25_terms": _q_bm25_terms,
        "q68_pack_offsets": _q_pack_offsets,
        "q69_ohlc_bars": _q_ohlc_bars,
        "q70_time_weighted_avg": _q_time_weighted_avg,
        "q71_funnel": _q_funnel,
        "q72_cohort_retention": _q_cohort_retention,
        "q73_levenshtein_pairs": _q_levenshtein_pairs,
        "q74_json_extract": _q_json_extract,
        "q75_exact_corr": _q_exact_corr,
        "q76_histogram": _q_histogram,
        "q77_chunk_tokens": _q_chunk_tokens,
        "q78_contamination": _q_contamination,
        "q79_redact_pii": _q_redact_pii,
        "q80_repetition_ratio": _q_repetition_ratio,
        "q81_tvd_drift": _q_tvd_drift,
        "q82_acf": _q_acf,
        "q83_cusum": _q_cusum,
        "q84_hopping_window": _q_hopping_window,
        "q85_top_categories": _q_top_categories,
        "q86_category_gini": _q_category_gini,
        "q87_rolling_median": _q_rolling_median,
        "q88_merge_intervals": _q_merge_intervals,
        "q89_order_streaks": _q_order_streaks,
        "q90_asof_tolerance": _q_asof_tolerance,
        "q91_pareto_customers": _q_pareto_customers,
        "q92_m4_downsample": _q_m4_downsample,
        "q93_deadband": _q_deadband,
        "q94_rolling_corr": _q_rolling_corr,
        "q95_bloom_semi_join": _q_bloom_semi_join,
        "q96_hll_rollup": _q_hll_rollup,
        "q97_stratified_sample": _q_stratified_sample,
        "q98_pagerank": _q_pagerank,
        "q99_weighted_median": _q_weighted_median,
        "q02_late_orders": _q_late_orders,
        "q100_triangle_count": _q_triangle_count,
        "q101_trend_slope": _q_trend_slope,
        "q102_group_zscore": _q_group_zscore,
        "q103_transition_matrix": _q_transition_matrix,
        "q104_running_distinct": _q_running_distinct,
        "q105_dup_ngram_rate": _q_dup_ngram_rate,
        "q106_snapshot_diff": _q_snapshot_diff,
        "q107_collocations": _q_collocations,
        "q108_gopher_quality": _q_gopher_quality,
        "q109_null_runs": _q_null_runs,
        "q110_trigram_lm": _q_trigram_lm,
        "q111_posting_lists": _q_posting_lists,
        "q112_time_in_state": _q_time_in_state,
        "q113_densify_grid": _q_densify_grid,
        "q114_session_stats": _q_session_stats,
        "q115_source_rollup": _q_source_rollup,
        "q116_minmax_scale": _q_minmax_scale,
        "q117_spearman": _q_spearman,
        "q118_chisq_cells": _q_chisq,
        "q119_benford": _q_benford,
        "q120_dimension_stats": _q_dimension_stats,
        "q121_mllib_corr": _q_mllib_corr,
        "q122_sax_symbols": _q_sax,
        "q123_event_trigrams": _q_event_trigrams,
        "q124_dtw_pairs": _q_dtw_pairs,
        "q125_ab_test": _q_ab_test,
        "q126_stock_balance": _q_stock_balance,
        "q127_market_basket": _q_market_basket,
        "q128_rfm": _q_rfm,
        "q129_mom_growth": _q_mom_growth,
        "q130_debounce": _q_debounce,
        "q131_kll_quantiles": _q_kll_quantiles,
        "q132_theta_overlap": _q_theta_overlap,
        "q133_local_supplier_volume": _q_local_supplier_volume,
        "q134_revenue_delta": _q_revenue_delta,
        "q135_returned_items": _q_returned_items,
        "q136_large_orders": _q_large_orders,
        "q137_normalized_dedup": _q_normalized_dedup,
        "q138_funnel_latency": _q_funnel_latency,
        "q139_communities": _q_communities,
        "q140_attribution": _q_attribution,
        "q141_qq_drift": _q_qq_drift,
        "q142_seasonal_profile": _q_seasonal_profile,
        "q143_swinging_door": _q_swinging_door,
        "q144_topk_sketch": _q_topk_sketch,
        "q145_table_checksum": _q_table_checksum,
        "q146_frequent_triples": _q_frequent_triples,
        "q147_sequential_pairs": _q_sequential_pairs,
        "q148_cohort_ltv": _q_cohort_ltv,
        "q149_life_table": _q_life_table,
        "q150_revenue_gini": _q_revenue_gini,
        "q151_bfs_hops": _q_bfs_hops,
        "q152_filter_funnel": _q_filter_funnel,
        "q153_cluster_canonical": _q_cluster_canonical,
        "q154_bpe_pairs": _q_bpe_pairs,
        "q155_lm_coverage": _q_lm_coverage,
        "q156_bfill": _q_bfill,
        "q157_centroid_sim": _q_centroid_sim,
        "q158_seasonal_mase": _q_seasonal_mase,
        "q159_frame_stats": _q_frame_stats,
        "q160_tfidf_pairs": _q_tfidf_pairs,
        "q161_session_paths": _q_session_paths,
        "q162_length_packing": _q_length_packing,
        "q163_entity_cooccurrence": _q_entity_cooccurrence,
        "q164_hamming_embedding": _q_hamming_embedding,
        "q165_funnel_strict": _q_funnel_strict,
        "q166_lsh_quality": _q_lsh_quality,
        "q167_equi_depth": _q_equi_depth,
        "q168_seasonal_anomaly": _q_seasonal_anomaly,
        "q169_volume_shipping": _q_volume_shipping,
        "q170_market_share": _q_market_share,
        "q171_product_profit": _q_product_profit,
        "q172_priority_shipping": _q_priority_shipping,
        "q173_order_count_dist": _q_order_count_dist,
        "q174_promo_share": _q_promo_share,
        "q175_top_supplier": _q_top_supplier,
        "q176_supplier_part_counts": _q_supplier_part_counts,
        "q177_small_qty_revenue": _q_small_qty_revenue,
        "q178_disjunctive_revenue": _q_disjunctive_revenue,
        "q179_waiting_suppliers": _q_waiting_suppliers,
        "q180_idle_customers": _q_idle_customers,
        "q181_important_parts": _q_important_parts,
        "q182_winnowing": _q_winnowing,
        "q183_chunk_dup": _q_chunk_dup,
        "q184_token_budget": _q_token_budget,
        "q185_mixture_weights": _q_mixture_weights,
        "q186_burst_users": _q_burst_users,
        "q187_event_peaks": _q_event_peaks,
        "q188_lag_corr": _q_lag_corr,
        "q189_kcore": _q_kcore,
        "q190_pq_topk": _q_pq_topk,
        "q191_mann_kendall": _q_mann_kendall,
        "q192_theil_sen": _q_theil_sen,
        "q193_pattern_match": _q_pattern_match,
        "q194_group_skewness": _q_group_skewness,
        "q195_phrase_search": _q_phrase_search,
        "q196_fpgrowth_pairs": _q_fpgrowth_pairs,
        "q197_als_recs": _q_als_recs,
        "q198_moment_rollup": _q_moment_rollup,
        "q199_ks_test": _q_ks_test,
        "q200_auc": _q_auc,
        "q201_open_orders": _q_open_orders,
        "q202_new_vs_returning": _q_new_vs_returning,
        "q203_seasonal_strength": _q_seasonal_strength,
        "q204_link_prediction": _q_link_prediction,
        "q205_share_of_parent": _q_share_of_parent,
        "q206_pseudonymize": _q_pseudonymize,
        "q207_record_linkage": _q_record_linkage,
        "q208_geo_binning": _q_geo_binning,
        "q209_daily_bands": _q_daily_bands,
        "q210_bounce_rate": _q_bounce_rate,
        "q211_tokenizer_fertility": _q_tokenizer_fertility,
        "q212_repeat_share": _q_repeat_share,
        "q213_hierarchy_rollup": _q_hierarchy_rollup,
        "q214_k_anonymity": _q_k_anonymity,
        "q215_segment_overlap": _q_segment_overlap,
        "q216_scd2_temporal_join": _q_scd2_temporal_join,
        "q217_join_key_skew": _q_join_key_skew,
        "q218_orphan_check": _q_orphan_check,
        "q219_class_rebalance": _q_class_rebalance,
        "q220_negative_samples": _q_negative_samples,
        "q221_boolean_search": _q_boolean_search,
        "q222_did": _q_did,
        "q223_kpi_decomposition": _q_kpi_decomposition,
        "q224_availability": _q_availability,
        "q225_stemmed_vocab": _q_stemmed_vocab,
        "q226_burn_rate": _q_burn_rate,
        "q227_simpsons": _q_simpsons,
        "q228_feature_table": _q_feature_table,
        "q229_calendar_spine": _q_calendar_spine,
        "q230_dup_rate_by_source": _q_dup_rate_by_source,
        "q231_shipping_aging": _q_shipping_aging,
        "q232_dau_wau": _q_dau_wau,
        "q233_inter_purchase": _q_inter_purchase,
        "q234_precision_audit": _q_precision_audit,
        "q235_wilson_bound": _q_wilson_bound,
        "q236_degree_distribution": _q_degree_distribution,
        "q237_assortativity": _q_assortativity,
        "q238_containment_pairs": _q_containment_pairs,
        "q239_null_profile": _q_null_profile,
        "q240_spike_days": _q_spike_days,
        "q241_donchian": _q_donchian,
        "q242_cross_sectional_z": _q_cross_sectional_z,
        "q243_vwap": _q_vwap,
        "q244_abc_classification": _q_abc_classification,
        "q245_vocab_overlap": _q_vocab_overlap,
        "q246_growth_accounting": _q_growth_accounting,
        "q247_anomaly_ensemble": _q_anomaly_ensemble,
        "q248_bollinger": _q_bollinger,
        "q249_simpson_diversity": _q_simpson_diversity,
        "q250_ttr_hapax": _q_ttr_hapax,
        "q251_temperature_sampling": _q_temperature_sampling,
        "q252_lexical_complexity": _q_lexical_complexity,
        "q253_daily_mode": _q_daily_mode,
        "q254_hour_weekday_heatmap": _q_hour_weekday_heatmap,
        "q255_pettitt": _q_pettitt,
        "q256_lang_purity": _q_lang_purity,
        "q257_knn_label_agreement": _q_knn_label_agreement,
        "q258_prefix_dup": _q_prefix_dup,
        "q259_peak_concurrency": _q_peak_concurrency,
        "q260_weekend_lift": _q_weekend_lift,
        "q261_spc_rules": _q_spc_rules,
        "q262_wow_overlap": _q_wow_overlap,
        "q263_drawdown": _q_drawdown,
        "q264_kfold_balance": _q_kfold_balance,
        "q265_burstiness": _q_burstiness,
        "q266_tukey_fences": _q_tukey_fences,
        "q267_page_hinkley": _q_page_hinkley,
        "q268_capture_recapture": _q_capture_recapture,
        "q269_odds_ratio_terms": _q_odds_ratio_terms,
        "q270_emd_drift": _q_emd_drift,
        "q271_bow_dup": _q_bow_dup,
        "q272_stride_sample": _q_stride_sample,
        "q273_churn_risk": _q_churn_risk,
        "q274_discount_elasticity": _q_discount_elasticity,
        "q275_centroid_drift": _q_centroid_drift,
        "q276_matrix_profile": _q_matrix_profile,
        "q277_rolling_slope": _q_rolling_slope,
        "q278_vocab_coverage": _q_vocab_coverage,
        "q279_mann_whitney": _q_mann_whitney,
        "q280_effect_size": _q_effect_size,
        "q281_cm_frequency": _q_cm_frequency,
        "q282_horvitz_thompson": _q_horvitz_thompson,
        "q283_half_sample_ci": _q_half_sample_ci,
        "q284_mutual_knn": _q_mutual_knn,
        "q285_centroid_silhouette": _q_centroid_silhouette,
        "q286_decayed_popularity": _q_decayed_popularity,
        "q287_anova_f": _q_anova_f,
        "q288_retrieval_scoring": _q_retrieval_scoring,
        "q289_hoover_index": _q_hoover_index,
        "q290_freshness_audit": _q_freshness_audit,
        "q291_skyline_parts": _q_skyline_parts,
        "q292_seasonal_index": _q_seasonal_index,
        "q293_abc_xyz": _q_abc_xyz,
        "q294_term_burstiness": _q_term_burstiness,
        "q295_join_size_estimate": _q_join_size_estimate,
        "q296_rare_collapse": _q_rare_collapse,
        "q297_loo_target_encoding": _q_loo_target_encoding,
        "q298_feature_hashing": _q_feature_hashing,
        "q299_m_estimate_encoding": _q_m_estimate_encoding,
        "q300_holt_winters": _q_holt_winters,
        "q301_window_dataset": _q_window_dataset,
        "q302_multihot_encoding": _q_multihot_encoding,
        "q303_clustering_coeff": _q_clustering_coeff,
        "q304_value_at_risk": _q_value_at_risk,
        "q305_partition_skew": _q_partition_skew,
        "q306_lang_confusion": _q_lang_confusion,
        "q307_detector_eval": _q_detector_eval,
        "q308_srm_check": _q_srm_check,
        "q309_temporal_integrity": _q_temporal_integrity,
        "q310_mix_shift": _q_mix_shift,
        "q311_ljung_box": _q_ljung_box,
        "q312_fd_discovery": _q_fd_discovery,
        "q313_order_inversions": _q_order_inversions,
        "q314_dataset_card": _q_dataset_card,
        "q315_zonemap_skipping": _q_zonemap_skipping,
        "q316_gains_table": _q_gains_table,
        "q317_delta_method": _q_delta_method,
        "q318_winsorized_mean": _q_winsorized_mean,
        "q319_tail_attribution": _q_tail_attribution,
        "q320_log2_histogram": _q_log2_histogram,
        "q321_periodicity_detector": _q_periodicity_detector,
        "q322_rle_estimate": _q_rle_estimate,
        "q323_hellinger_drift": _q_hellinger_drift,
        "q324_grubbs": _q_grubbs,
        "q325_runs_test": _q_runs_test,
        "q326_kendall_tau": _q_kendall_tau,
        "q327_cramers_v": _q_cramers_v,
        "q328_mcnemar": _q_mcnemar,
        "q329_leaderboard_churn": _q_leaderboard_churn,
        "q330_fold_metric_stability": _q_fold_metric_stability,
        "q331_effective_sample_size": _q_effective_sample_size,
        "q332_series_staleness": _q_series_staleness,
        "q333_calibration_ece": _q_calibration_ece,
        "q334_dispersion_index": _q_dispersion_index,
        "q335_its_segments": _q_its_segments,
        "q336_split_half": _q_split_half,
        "q337_variance_ratio": _q_variance_ratio,
        "q338_dedup_savings": _q_dedup_savings,
        "q339_retrieval_eval": _q_retrieval_eval,
        "q340_skipgram_pairs": _q_skipgram_pairs,
        "q341_stutter_scrub": _q_stutter_scrub,
        "q342_linear_attribution": _q_linear_attribution,
        "q344_qte": _q_qte,
        "q345_bh_fdr": _q_bh_fdr,
        "q346_shard_balance": _q_shard_balance,
        "q347_revenue_npv": _q_revenue_npv,
        "q348_rake_keywords": _q_rake_keywords,
        "q349_wilcoxon_signed": _q_wilcoxon_signed,
        "q350_l_diversity": _q_l_diversity,
        "q351_covariate_balance": _q_covariate_balance,
        "q353_pinball_loss": _q_pinball_loss,
        "q354_transition_drift": _q_transition_drift,
        "q355_cuped": _q_cuped,
        "q356_rrf_fusion": _q_rrf_fusion,
        "q357_peak_days": _q_peak_days,
        "q358_savgol_smooth": _q_savgol,
        "q359_zero_crossings": _q_zero_crossings,
        "q360_rdd_cutoff": _q_rdd_cutoff,
        "q361_sprt": _q_sprt,
        "q362_conformal_interval": _q_conformal,
        "q363_isotonic_fit": _q_isotonic,
        "q364_ips_offpolicy": _q_ips_offpolicy,
        "q365_negbin_fit": _q_negbin_fit,
        "q370_int8_quant": _q_int8_quant,
        "q371_mmr_rerank": _q_mmr_rerank,
        "q372_welch_ttest": _q_welch_ttest,
        "q373_two_prop_z": _q_two_prop_z,
        "q374_bland_altman": _q_bland_altman,
        "q375_tanimoto_users": _q_tanimoto_users,
        "q376_cold_start": _q_cold_start,
        "q377_stump_split": _q_stump_split,
        "q378_quantile_normalize": _q_quantile_normalize,
        "q379_price_endings": _q_price_endings,
        "q380_item_cf": _q_item_cf,
        "q381_nrr": _q_nrr,
        "q382_pvm_bridge": _q_pvm_bridge,
        "q383_knee_point": _q_knee_point,
        "q384_icc": _q_icc,
        "q385_seasonal_strength": _q_seasonal_strength_dow,
        "q386_median_polish": _q_median_polish,
        "q387_cochran_q": _q_cochran_q,
        "q388_friedman": _q_friedman,
        "q389_cvm_two_sample": _q_cvm_two_sample,
        "q390_pacf": _q_pacf,
        "q391_kruskal_wallis": _q_kruskal_wallis,
        "q392_brown_forsythe": _q_brown_forsythe,
        "q393_allan_variance": _q_allan_variance,
        "q394_hurst_rs": _q_hurst_rs,
        "q395_psi_drift": _q_psi_drift,
        "q396_xcorr_lag": _q_xcorr_lag,
        "q397_granger": _q_granger,
        "q398_james_stein": _q_james_stein,
        "q399_good_turing": _q_good_turing,
        "q400_kaplan_meier": _q_kaplan_meier,
        "q401_binseg_changepoint": _q_binseg_changepoint,
        "q402_entropy_mix": _q_entropy_mix,
        "q403_bartlett": _q_bartlett,
        "q404_stl_lite": _q_stl_lite,
        "q405_streak_days": _q_streak_days,
        "q406_ar1_fit": _q_ar1_fit,
        "q407_mase": _q_mase,
        "q408_winsorized_mean": _q_winsorized_daily,
        "q409_wilson_interval": _q_wilson_interval,
        "q410_readability": _q_readability,
        "q411_contamination": _q_source_contamination,
        "q412_heaps_law": _q_heaps_law,
        "q413_ngram_novelty": _q_ngram_novelty,
        "q414_hour_chisq": _q_hour_chisq,
        "q415_zipf_fit": _q_zipf_fit,
        "q416_audience_overlap": _q_audience_overlap,
        "q417_slew_alarm": _q_slew_alarm,
        "q418_twa": _q_twa,
        "q419_gap_audit": _q_gap_audit,
        "q420_availability": _q_bucket_availability,
        "q421_calibration_bins": _q_calibration_bins,
        "q422_auc": _q_value_auc,
        "q423_gains_table": _q_event_gains_table,
        "q424_seasonal_mk": _q_seasonal_mk,
        "q425_partial_corr": _q_partial_corr,
        "q366_unit_value_index": _q_unit_value_index,
        "q367_record_days": _q_record_days,
        "q368_turning_points": _q_turning_points,
        "q369_stylometric_z": _q_stylometric_z,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect; tables pre-registered as views)
# ---------------------------------------------------------------------------

_STOPWORD_LIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

from sensor_time_series_pyspark_spark.operators.sampling import (  # noqa: E402
    _threshold_hex as _thr,
)


# DuckDB twin of _revenue(): exact decimal discounted price.
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"
)


def _davg_sql(col: str, filt: str | None = None) -> str:
    """DuckDB twin of _davg: exact decimal sum → double, one division."""
    f = f" FILTER (WHERE {filt})" if filt else ""
    return (
        f"CAST(sum(CAST({col} AS DECIMAL(38,6))){f} AS DOUBLE) / count({col}){f}"
    )


def _pivot_avg_sql(t: str) -> str:
    return "coalesce(" + _davg_sql("value", "event_type='" + t + "'") + ", 0)"


_FLAGSHIP_SQL = """
WITH filtered AS (
  SELECT * FROM events WHERE value IS NOT NULL AND value >= 0
),
joined AS (
  SELECT make_timestamp(CAST(floor(epoch(ts)/3600) AS BIGINT)*3600*1000000) AS bucket,
         c_nationkey, trim(event_type) AS event_type, value
  FROM filtered JOIN customer ON user_id = c_custkey
),
agg AS (
  SELECT bucket, c_nationkey,
    {click} AS click,
    {view} AS view,
    {purchase} AS purchase,
    {signup} AS signup,
    {error} AS error,
    max(value) AS severity,
    count(*) AS n_events
  FROM joined GROUP BY bucket, c_nationkey
)
SELECT agg.*, n_name FROM agg JOIN nation ON c_nationkey = n_nationkey
""".format(**{t: _pivot_avg_sql(t) for t in EVENT_TYPES})

_PIVOT_SQL = """
SELECT user_id,
  {click} AS click,
  {view} AS view,
  {purchase} AS purchase,
  {signup} AS signup,
  {error} AS error,
  count(*) AS n_events
FROM events GROUP BY user_id
""".format(**{t: _pivot_avg_sql(t) for t in EVENT_TYPES})

_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY user_id, session_seq
"""

_DOC_STATS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS tok,
    length(regexp_replace(trim(text), '\\s+', '', 'g')) AS total_chars
  FROM documents
)
SELECT doc_id,
  CAST(len(tok) AS INT) AS n_tokens,
  total_chars / len(tok) AS avg_token_len,
  CASE WHEN len(tok) > 0
       THEN len(list_filter(tok, t -> list_contains({_STOPWORD_LIST}, lower(t)))) / len(tok)
       ELSE 0 END AS stop_ratio
FROM toks
"""


def _minhash_sql(threshold: float = 0.35, n_hashes: int = 16, n_bands: int = 8) -> str:
    """DuckDB twin of operators/dedup.py:minhash_pairs — same seeded
    (a,b) coefficients baked in as literals, same md5-derived shingle
    ids, same banding, same exact-Jaccard verify."""
    from sensor_time_series_pyspark_spark.operators import minhash_coeffs

    P = 2147483647
    r = n_hashes // n_bands
    a, b = minhash_coeffs(n_hashes)
    mins = ",\n    ".join(
        f"min(({a[i]}*sid + {b[i]}) % {P}) AS h{i}" for i in range(n_hashes)
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT id, {band} AS band_id, concat_ws('|', "
        + ", ".join(f"h{band * r + j}" for j in range(r))
        + ") AS band_key FROM sig"
        for band in range(n_bands)
    )
    return rf"""
WITH reps AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
),
toks AS (
  SELECT id, tok, len(tok) AS n_tok FROM (
    SELECT doc_id AS id,
      list_distinct(
        list_transform(
          generate_series(1, greatest(len(t) - 1, 0)),
          i -> array_to_string(t[i:i+1], ' ')
        )
      ) AS tok
    FROM (
      SELECT doc_id,
        list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      FROM reps
    )
  ) WHERE len(tok) > 0
),
ids AS (
  SELECT id, n_tok,
    (('0x' || substr(md5(sh), 1, 12))::BIGINT % {P}) AS sid
  FROM (SELECT id, n_tok, unnest(tok) AS sh FROM toks)
),
sig AS (
  SELECT id, min(n_tok) AS n_tok,
    {mins}
  FROM ids GROUP BY id
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.id < b.id
),
verified AS (
  SELECT c.id_a, c.id_b,
    len(list_intersect(ta.tok, tb.tok)) AS inter,
    ta.n_tok AS n_a, tb.n_tok AS n_b
  FROM cand c
  JOIN toks ta ON c.id_a = ta.id
  JOIN toks tb ON c.id_b = tb.id
)
SELECT id_a, id_b, inter / (n_a + n_b - inter) AS jaccard
FROM verified
WHERE inter / (n_a + n_b - inter) >= {threshold}
"""


def _srp_sql(dim: int = 64, n_bits: int = 16, scale_bits: int = 20) -> str:
    """DuckDB twin of srp_signature_portable: same seeded ±1 planes as
    literals; integer-scaled dots are exact doubles (< 2^33), so the
    sign — and therefore every signature bit — matches Spark exactly."""
    from sensor_time_series_pyspark_spark.operators import srp_planes_rademacher

    planes = srp_planes_rademacher(dim, n_bits)
    scale = float(1 << scale_bits)
    bit_terms = " + ".join(
        f"(CASE WHEN list_dot_product(s, {planes[b]}::DOUBLE[]) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(n_bits)
    )
    return f"""
WITH scaled AS (
  SELECT vec_id,
    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * {scale})) AS s
  FROM embeddings
)
SELECT vec_id, CAST({bit_terms} AS BIGINT) AS srp_sig FROM scaled
"""


def _simhash_sql(
    max_hamming: int = 6, n_bits: int = 48, n_bands: int = 8
) -> str:
    """DuckDB twin of simhash_pairs_portable: same md5-derived 48-bit
    shingle ids, same per-bit majority votes, same banding and
    bit_count(xor) verify."""
    width = n_bits // n_bands
    votes = ",\n    ".join(
        f"sum(CASE WHEN (sid >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(n_bits)
    )
    sig_terms = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(n_bits)
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT id, {i} AS band_id, (sig >> {i * width}) & {(1 << width) - 1} "
        "AS band_val FROM sigs"
        for i in range(n_bands)
    )
    return rf"""
WITH reps AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
),
toks AS (
  SELECT id, tok FROM (
    SELECT doc_id AS id,
      list_distinct(
        list_transform(
          generate_series(1, greatest(len(t) - 1, 0)),
          i -> array_to_string(t[i:i+1], ' ')
        )
      ) AS tok
    FROM (
      SELECT doc_id,
        list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      FROM reps
    )
  ) WHERE len(tok) > 0
),
ids AS (
  SELECT id, ('0x' || substr(md5(sh), 1, 12))::BIGINT AS sid
  FROM (SELECT id, unnest(tok) AS sh FROM toks)
),
votes AS (
  SELECT id,
    {votes}
  FROM ids GROUP BY id
),
sigs AS (
  SELECT id, CAST({sig_terms} AS BIGINT) AS sig FROM votes
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.id < b.id
)
SELECT c.id_a, c.id_b,
  CAST(bit_count(xor(sa.sig, sb.sig)) AS INT) AS hamming
FROM cand c
JOIN sigs sa ON c.id_a = sa.id
JOIN sigs sb ON c.id_b = sb.id
WHERE bit_count(xor(sa.sig, sb.sig)) <= {max_hamming}
"""


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_hourly_wide": _FLAGSHIP_SQL,
        "q01_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                   * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
              {_davg_sql('l_quantity')} AS avg_qty,
              {_davg_sql('l_extendedprice')} AS avg_price,
              {_davg_sql('l_discount')} AS avg_disc,
              count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q03_segment_revenue": """
            SELECT o_orderkey, o_orderdate, o_orderpriority,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
        """,
        "q04_region_supplier_stats": """
            SELECT r_name, n_name, count(*) AS n_suppliers,
              {avg_acctbal} AS avg_acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """.format(avg_acctbal=_davg_sql("s_acctbal")),
        "q05_event_type_pivot": _PIVOT_SQL,
        "q06_customers_without_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1997-01-01'
            )
        """,
        "q09_top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
              FROM orders
            ) WHERE rn <= 3
        """,
        "q10_next_day_max": """
            WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day, max(value) AS day_max
              FROM events GROUP BY 1, 2
            ),
            led AS (
              SELECT user_id, day, day_max,
                lead(day_max) OVER (PARTITION BY user_id ORDER BY day) AS next_day_max
              FROM daily
            )
            SELECT * FROM led WHERE next_day_max IS NOT NULL
        """,
        "q11_resample_30min": f"""
            SELECT event_type,
              {_davg_sql('value')} AS avg_value,
              count(*) AS n,
              make_timestamp(CAST(floor(epoch(ts)/1800) AS BIGINT)*1800*1000000) AS bucket
            FROM events GROUP BY event_type, bucket
        """,
        "q15_sessionize": _SESSIONIZE_SQL,
        "q17_dedup_exact": """
            SELECT md5(text) AS fp, count(*) AS n_copies, min(doc_id) AS keep_doc_id
            FROM documents GROUP BY 1
        """,
        "q20_minhash_lsh": _minhash_sql(),
        "q21_simhash": _simhash_sql(),
        "q22_doc_stats": _DOC_STATS_SQL,
        "q07_case_projection": """
            SELECT p_partkey, upper(p_brand) AS brand,
              CASE WHEN p_size < 10 THEN 'small'
                   WHEN p_size < 30 THEN 'medium'
                   ELSE 'large' END AS size_band,
              CAST(floor(p_retailprice) AS BIGINT) AS price_floor
            FROM part
        """,
        "q08_set_ops": """
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            EXCEPT
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        """,
        "q12_rollup": """
            SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue
            FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        """,
        "q13_ffill": """
            SELECT event_id, user_id, ts,
              last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
            FROM events
        """,
        "q14_interpolate": """
            WITH base AS (
              SELECT event_id, user_id, ts, epoch(ts) AS t,
                     CASE WHEN event_type <> 'error' THEN value END AS v
              FROM events
            ),
            w AS (
              SELECT event_id, user_id, ts, t, v,
                last_value(v IGNORE NULLS) OVER back AS prev_v,
                last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER back AS prev_t,
                first_value(v IGNORE NULLS) OVER fwd AS next_v,
                first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER fwd AS next_t
              FROM base
              WINDOW back AS (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     fwd AS (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
            )
            SELECT event_id, user_id, ts,
              CASE WHEN v IS NOT NULL THEN v
                   WHEN prev_v IS NULL THEN next_v
                   WHEN next_v IS NULL THEN prev_v
                   WHEN next_t = prev_t THEN prev_v
                   ELSE prev_v + (next_v - prev_v) * ((t - prev_t) / (next_t - prev_t))
              END AS value
            FROM w
        """,
        "q16_quantile_clip": """
            WITH bounds AS (
              SELECT event_type, quantile_cont(value, 0.2) AS lo,
                     quantile_cont(value, 0.8) AS hi
              FROM events GROUP BY event_type
            )
            SELECT event_id, e.event_type, value
            FROM events e JOIN bounds b ON e.event_type = b.event_type
            WHERE value >= lo AND value <= hi
        """,
        "q18_dedup_keep_first": """
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
        """,
        "q19_jaccard_pairs": r"""
            WITH reps AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
            ),
            toks AS (
              SELECT doc_id AS id,
                list_distinct(
                  list_transform(
                    generate_series(1, greatest(len(t) - 2, 0)),
                    i -> array_to_string(t[i:i+2], ' ')
                  )
                ) AS tok
              FROM (
                SELECT doc_id,
                  list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
                FROM reps
              )
            ),
            inv AS (SELECT id, len(tok) AS n_tok, unnest(tok) AS token FROM toks),
            pairs AS (
              SELECT a.id AS id_a, b.id AS id_b, a.n_tok AS n_a, b.n_tok AS n_b,
                     count(*) AS inter
              FROM inv a JOIN inv b ON a.token = b.token AND a.id < b.id
              GROUP BY 1, 2, 3, 4
            )
            SELECT id_a, id_b, inter / (n_a + n_b - inter) AS jaccard
            FROM pairs WHERE inter / (n_a + n_b - inter) >= 0.2
        """,
        "q23_topk_cosine": """
            WITH v AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings
            ),
            scored AS (
              SELECT q.vec_id AS qid, c.vec_id AS cid,
                list_dot_product(q.e, c.e)
                  / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS cosine
              FROM v q JOIN v c ON q.vec_id <> c.vec_id
              WHERE q.vec_id < 10
            )
            SELECT qid, cid, rank FROM (
              SELECT qid, cid,
                CAST(row_number() OVER (PARTITION BY qid
                     ORDER BY cosine DESC, cid) AS INT) AS rank
              FROM scored
            ) WHERE rank <= 5
        """,
        "q29_asof_join": """
            SELECT e.event_id, e.user_id, e.ts, d.last_order_price
            FROM events e
            ASOF LEFT JOIN (
              SELECT o_custkey AS user_id, o_orderdate,
                     max(o_totalprice) AS last_order_price
              FROM orders GROUP BY 1, 2
            ) d ON e.user_id = d.user_id AND e.ts >= d.o_orderdate
        """,
        "q31_text_features": rf"""
            WITH toks AS (
              SELECT doc_id, text,
                list_transform(
                  list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''),
                  t -> lower(t)
                ) AS tok
              FROM documents
            ),
            feat AS (
              SELECT doc_id, text, tok,
                list_aggregate([
                  {{'score': len(list_filter(tok, t -> list_contains(['the','and','of','is','to'], t))), 'lang': 'en'}},
                  {{'score': len(list_filter(tok, t -> list_contains(['el','la','los','es','una'], t))), 'lang': 'es'}},
                  {{'score': len(list_filter(tok, t -> list_contains(['der','die','und','ist','ein'], t))), 'lang': 'de'}},
                  {{'score': len(list_filter(tok, t -> list_contains(['le','les','est','une','dans'], t))), 'lang': 'fr'}}
                ], 'max') AS best,
                CASE WHEN len(text) > 0
                     THEN (len(text) - len(regexp_replace(text, '[!-/:-@\[-`{{-~]', '', 'g'))) / len(text)
                     ELSE 0 END AS pr,
                CASE WHEN len(tok) > 0
                     THEN len(list_filter(tok, t -> list_contains({_STOPWORD_LIST}, t))) / len(tok)
                     ELSE 0 END AS sw
              FROM toks
            )
            SELECT doc_id,
              CASE WHEN best.score > 0 THEN best.lang ELSE 'unknown' END AS lang_pred,
              CAST(coalesce(list_aggregate(
                list_transform(tok, w -> CAST(ceil(len(w)/4.0) AS INT)), 'sum'), 0) AS BIGINT) AS n_bpe,
              pr AS punct_ratio,
              (least(len(tok)/20.0, 1.0) + (1.0 - least(pr*5, 1.0)) + least(sw*4, 1.0)) / 3 AS quality
            FROM feat
        """,
        "q32_fingerprint_cardinality": r"""
            SELECT count(DISTINCT lower(array_to_string(
                     list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''), ' '
                   ))) AS n_unique,
                   count(*) AS n_docs
            FROM documents
        """,
        "q33_distinct_agg": """
            SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
                   count(*) AS n_orders
            FROM orders GROUP BY o_orderstatus
        """,
        "q34_cube": """
            SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
            FROM events GROUP BY CUBE (event_type, CAST(ts AS DATE))
        """,
        "q36_blob_metadata": """
            SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                   'unknown' AS format, md5(text) AS content_md5
            FROM documents
        """,
        "q37_decode_features": """
            WITH codes AS (
              SELECT doc_id,
                list_transform(generate_series(1, len(text)), i -> ord(text[i])) AS c,
                len(text) AS n
              FROM documents
            )
            SELECT doc_id,
              CAST(n AS BIGINT) AS n_bytes,
              CAST(coalesce(list_sum(c), 0) AS BIGINT) AS byte_sum,
              CAST(coalesce(list_min(c), 0) AS BIGINT) AS byte_min,
              CAST(coalesce(list_max(c), 0) AS BIGINT) AS byte_max,
              CAST(len(list_filter(c, x -> x < 33)) AS BIGINT) AS n_ws,
              CAST(len(list_filter(c, x -> x > 127)) AS BIGINT) AS n_hi,
              CAST(coalesce(c[1], 0) AS BIGINT) AS first_byte,
              CAST(coalesce(c[n], 0) AS BIGINT) AS last_byte
            FROM codes
        """,
        "q38_embedding_near_dup": """
            WITH v AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings WHERE vec_id < 1000
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              list_dot_product(a.e, b.e)
                / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cosine
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.e, b.e)
                / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.45
        """,
        "q39_srp_signature": _srp_sql(),
        "q40_semi_join": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
            )
        """,
        "q41_outer_join": """
            WITH clicks AS (
              SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_clicks
              FROM events WHERE event_type = 'click' GROUP BY 1, 2
            ),
            buys AS (
              SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_purchases
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
            )
            SELECT coalesce(c.user_id, b.user_id) AS user_id,
                   coalesce(c.day, b.day) AS day,
                   n_clicks, n_purchases
            FROM clicks c FULL OUTER JOIN buys b
              ON c.user_id = b.user_id AND c.day = b.day
        """,
        "q42_interval_join": """
            SELECT e.event_id AS error_id, e.user_id, c.event_id AS click_id
            FROM events e JOIN events c
              ON e.user_id = c.user_id
             AND e.event_type = 'error' AND c.event_type = 'click'
             AND epoch(c.ts) >= epoch(e.ts) - 3600
             AND epoch(c.ts) <= epoch(e.ts) + 3600
        """,
        "q44_sql_interface": """
            SELECT n_name,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "q45_char_ngram_jaccard": """
            WITH reps AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
            ),
            toks AS (
              SELECT doc_id AS id,
                list_distinct(
                  list_transform(
                    generate_series(1, greatest(len(text) - 4, 0)),
                    i -> text[i:i+4]
                  )
                ) AS tok
              FROM reps
            ),
            inv AS (SELECT id, len(tok) AS n_tok, unnest(tok) AS token FROM toks),
            pairs AS (
              SELECT a.id AS id_a, b.id AS id_b, a.n_tok AS n_a, b.n_tok AS n_b,
                     count(*) AS inter
              FROM inv a JOIN inv b ON a.token = b.token AND a.id < b.id
              GROUP BY 1, 2, 3, 4
            )
            SELECT id_a, id_b, inter / (n_a + n_b - inter) AS jaccard
            FROM pairs WHERE inter / (n_a + n_b - inter) >= 0.35
        """,
        "q50_ewma_anomaly": """
            WITH RECURSIVE base AS (
              SELECT user_id, ts, value,
                CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts)
                     AS BIGINT) AS rn
              FROM events
            ),
            -- replicates streaming/stateful.py's fold with the SAME
            -- IEEE op order: delta = v - ewma; ewma += a*delta;
            -- var = (1-a)*(var + a*delta*delta); z uses the PRIOR state
            rec AS (
              SELECT user_id, ts, value, rn,
                CAST(NULL AS DOUBLE) AS zscore,
                value AS ewma,
                CAST(0 AS DOUBLE) AS ewm_var
              FROM base WHERE rn = 1
              UNION ALL
              SELECT b.user_id, b.ts, b.value, b.rn,
                CASE WHEN sqrt(r.ewm_var) > 0
                     THEN (b.value - r.ewma) / sqrt(r.ewm_var) END AS zscore,
                r.ewma + 0.2::DOUBLE * (b.value - r.ewma) AS ewma,
                (1 - 0.2::DOUBLE)
                  * (r.ewm_var
                     + 0.2::DOUBLE * (b.value - r.ewma) * (b.value - r.ewma))
                  AS ewm_var
              FROM rec r JOIN base b
                ON b.user_id = r.user_id AND b.rn = r.rn + 1
            )
            SELECT user_id, ts, value, zscore
            FROM rec WHERE abs(zscore) > 2
        """,
        "q51_validation_counts": """
            SELECT count(*) AS n_rows,
              CAST(sum(CASE WHEN coalesce(value >= 0 AND value <= 100, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS value_in_range,
              CAST(sum(CASE WHEN ts IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS ts_not_null,
              CAST(sum(CASE WHEN coalesce(event_type IN ('click','view','purchase','signup','error'), FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS known_event_type
            FROM events
        """,
        "q52_quarantine": """
            WITH checks AS (
              SELECT event_id,
                coalesce(value >= 0 AND value <= 100, FALSE) AS c1,
                ts IS NOT NULL AS c2,
                coalesce(event_type IN ('click','view','purchase','signup','error'), FALSE) AS c3
              FROM events
            )
            SELECT event_id, rule FROM (
              SELECT event_id, 'value_in_range' AS rule FROM checks WHERE NOT c1
              UNION ALL
              SELECT event_id, 'ts_not_null' FROM checks WHERE NOT c2
              UNION ALL
              SELECT event_id, 'known_event_type' FROM checks WHERE NOT c3
            )
        """,
        "q49_rolling_avg": """
            SELECT event_id, user_id, ts,
              CAST(sum(CAST(value AS DECIMAL(38,6)))
                     OVER w AS DOUBLE)
                / count(value) OVER w AS rolling_avg
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        """,
        "q48_correlated_subquery": f"""
            WITH per_part AS (
              SELECT l_partkey, {_davg_sql('l_quantity')} * 0.2 AS qty_threshold
              FROM lineitem GROUP BY l_partkey
            )
            SELECT l.l_partkey, count(*) AS n_small_orders,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_revenue
            FROM lineitem l JOIN per_part p ON l.l_partkey = p.l_partkey
            WHERE l.l_quantity < p.qty_threshold
            GROUP BY l.l_partkey
        """,
        "q46_unpivot": f"""
            SELECT user_id, event_type, avg_value
            FROM ({_PIVOT_SQL})
            UNPIVOT (avg_value FOR event_type IN (click, view, purchase, signup, error))
            WHERE avg_value > 0
        """,
        "q30_embedding_norm_stats": f"""
            WITH norms AS (
              SELECT label,
                sqrt(list_dot_product(
                  list_transform(embedding, x -> CAST(x AS DOUBLE)),
                  list_transform(embedding, x -> CAST(x AS DOUBLE))
                )) AS norm
              FROM embeddings
            )
            SELECT label, count(*) AS n, {_davg_sql('norm')} AS avg_norm
            FROM norms GROUP BY label
        """,
        "q53_dedup_clusters": r"""
            WITH RECURSIVE reps AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
            ),
            tk AS (
              SELECT doc_id AS id,
                list_distinct(
                  list_transform(
                    generate_series(1, greatest(len(t) - 2, 0)),
                    i -> array_to_string(t[i:i+2], ' ')
                  )
                ) AS tok
              FROM (
                SELECT doc_id,
                  list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
                FROM reps
              )
            ),
            inv AS (SELECT id, len(tok) AS n_tok, unnest(tok) AS token FROM tk),
            cand AS (
              SELECT a.id AS id_a, b.id AS id_b, a.n_tok AS n_a, b.n_tok AS n_b,
                     count(*) AS inter
              FROM inv a JOIN inv b ON a.token = b.token AND a.id < b.id
              GROUP BY 1, 2, 3, 4
            ),
            sim AS (
              SELECT id_a, id_b FROM cand
              WHERE inter / (n_a + n_b - inter) >= 0.2
            ),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM sim
              UNION ALL
              SELECT id_b, id_a FROM sim
            ),
            reach(u, lbl) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM edges)
              UNION
              SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.u
            )
            SELECT u AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY u
        """,
        "q54_grouping_sets": """
            SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue
            FROM orders
            GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                    (o_orderpriority), ())
        """,
        "q55_window_rank_suite": """
            SELECT o_orderkey, o_orderpriority,
              CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile,
              CAST(dense_rank() OVER w AS INT) AS drank,
              percent_rank() OVER w AS prank,
              cume_dist() OVER w AS cdist
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
        """,
        "q56_top_terms": r"""
            WITH reps AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
            ),
            term_tf AS (
              SELECT doc_id, term, count(*) AS tf
              FROM (
                SELECT doc_id,
                  unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                     x -> x <> '')) AS term
                FROM reps
              )
              GROUP BY doc_id, term
            ),
            term_df AS (
              SELECT term, count(*) AS df FROM term_tf GROUP BY term
            ),
            scored AS (
              SELECT t.doc_id, t.term, t.tf, d.df, (t.tf * 1000000) // d.df AS score
              FROM term_tf t JOIN term_df d ON t.term = d.term
            )
            SELECT doc_id, term, tf, df, score, rank FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS INT) AS rank
              FROM scored
            ) WHERE rank <= 3
        """,
        "q58_missing_buckets": """
            WITH b AS (
              SELECT DISTINCT event_type,
                CAST(floor(epoch(ts)/1800) AS BIGINT)*1800 AS bk
              FROM events
            ),
            spans AS (
              SELECT event_type, min(bk) AS lo, max(bk) AS hi
              FROM b GROUP BY event_type
            ),
            expected AS (
              SELECT event_type, unnest(generate_series(lo, hi, 1800)) AS bk
              FROM spans
            )
            SELECT e.event_type, make_timestamp(e.bk*1000000) AS bucket
            FROM expected e
            ANTI JOIN b ON e.event_type = b.event_type AND e.bk = b.bk
        """,
        "q59_salted_agg": """
            SELECT event_type, count(*) AS n_events,
              CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
              max(value) AS max_value
            FROM events GROUP BY event_type
        """,
        "q60_exact_percentiles": """
            SELECT l_returnflag,
              median(l_quantity) AS median_qty,
              quantile_cont(l_quantity, 0.9) AS p90_qty,
              count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag
        """,
        "q61_quantize_embeddings": """
            WITH v AS (
              SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings
            ),
            s AS (
              SELECT vec_id, e,
                list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
              FROM v
            ),
            qz AS (
              SELECT vec_id, scale,
                CASE WHEN scale > 0
                  THEN list_transform(e, x -> CAST(floor(x/scale + 0.5) AS BIGINT))
                  ELSE list_transform(e, x -> CAST(0 AS BIGINT))
                END AS q
              FROM s
            )
            SELECT vec_id, scale,
              list_sum(q) AS code_sum,
              CAST(list_min(q) AS INT) AS code_min,
              CAST(list_max(q) AS INT) AS code_max
            FROM qz
        """,
        "q64_hash_split": """
            WITH assigned AS (
              SELECT user_id,
                CASE WHEN substr(md5('v1' || CAST(user_id AS VARCHAR)), 1, 8) < 'cccccccc'
                       THEN 'train'
                     WHEN substr(md5('v1' || CAST(user_id AS VARCHAR)), 1, 8) < 'e6666666'
                       THEN 'val'
                     ELSE 'test' END AS split
              FROM events
            )
            SELECT split, count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users
            FROM assigned GROUP BY split
        """,
        "q65_rate_of_change": """
            SELECT event_id, user_id, ts,
              CASE WHEN (CAST(floor(epoch(ts)) AS BIGINT)
                         - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)) > 0
                   THEN (value - lag(value) OVER w)
                        / (CAST(floor(epoch(ts)) AS BIGINT)
                           - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT))
              END AS rate
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "q66_mad_outliers": """
            WITH med AS (
              SELECT event_type, quantile_cont(value, 0.5) AS med
              FROM events GROUP BY event_type
            ),
            dev AS (
              SELECT e.event_id, e.event_type, e.value, m.med
              FROM events e JOIN med m ON e.event_type = m.event_type
            ),
            mad AS (
              SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
              FROM dev GROUP BY event_type
            )
            SELECT d.event_id, d.event_type, d.value, d.med, m2.mad
            FROM dev d JOIN mad m2 ON d.event_type = m2.event_type
            WHERE abs(d.value - d.med) > CAST(5.0 AS DOUBLE) * m2.mad
        """,
        "q67_bm25_terms": r"""
            WITH reps AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
            ),
            base AS (
              SELECT doc_id AS id,
                list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tok
              FROM reps
            ),
            term_tf AS (
              SELECT id, dl, term, count(*) AS tf FROM (
                SELECT id, CAST(len(tok) AS INT) AS dl, unnest(tok) AS term FROM base
              ) GROUP BY id, dl, term
            ),
            stats AS (
              SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(len(tok)) AS BIGINT) AS total_dl
              FROM base
            ),
            term_df AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM term_tf GROUP BY term
            ),
            scored AS (
              SELECT t.id, t.term, t.tf, d.df,
                (((s.n_docs - d.df) + CAST(0.5 AS DOUBLE)) / (d.df + CAST(0.5 AS DOUBLE)))
                * (t.tf * CAST(2.2 AS DOUBLE))
                / (t.tf + CAST(1.2 AS DOUBLE)
                   * (CAST(0.25 AS DOUBLE)
                      + (CAST(0.75 AS DOUBLE) * t.dl)
                        / (CAST(s.total_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))
                  AS score
              FROM term_tf t JOIN term_df d ON t.term = d.term CROSS JOIN stats s
            )
            SELECT id, term, CAST(tf AS BIGINT) AS tf, df, score, rank FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY id
                               ORDER BY score DESC, term ASC) AS INT) AS rank
              FROM scored
            ) WHERE rank <= 3
        """,
        "q68_pack_offsets": r"""
            WITH base AS (
              SELECT doc_id AS id, lang,
                CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                     x -> x <> '')) AS BIGINT) AS n_tokens
              FROM documents
            ),
            c AS (
              SELECT id, lang, n_tokens,
                CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              FROM base
            )
            SELECT id, lang, n_tokens,
              (cum - n_tokens) AS "offset",
              CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS chunk_id
            FROM c
        """,
        "q69_ohlc_bars": """
            SELECT user_id,
              make_timestamp(CAST(floor(epoch(ts)/3600) AS BIGINT)*3600*1000000) AS bucket,
              arg_min(value, ts) AS open,
              max(value) AS high,
              min(value) AS low,
              arg_max(value, ts) AS close,
              count(*) AS n_samples
            FROM events GROUP BY user_id, bucket
        """,
        "q70_time_weighted_avg": """
            WITH base AS (
              SELECT user_id, value,
                CAST(floor(epoch(ts)) AS BIGINT) AS t,
                CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) AS BIGINT)*3600 AS bs
              FROM events
            ),
            weighted AS (
              SELECT user_id, value, bs,
                least(coalesce(lead(t) OVER (PARTITION BY user_id ORDER BY t),
                               bs + 3600),
                      bs + 3600) - t AS w
              FROM base
            )
            SELECT user_id, make_timestamp(bs*1000000) AS bucket,
              CAST(sum(CAST(value * w AS DECIMAL(38,6))) AS DOUBLE)
                / CAST(sum(w) AS BIGINT) AS twa,
              CAST(sum(w) AS BIGINT) AS covered_seconds,
              count(*) AS n_samples
            FROM weighted GROUP BY user_id, bs
        """,
        "q71_funnel": """
            WITH s1 AS (
              SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
              SELECT e.user_id, min(s1.t1) AS t1, min(e.ts) AS t2
              FROM events e JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = 'click' AND e.ts > s1.t1
                AND CAST(floor(epoch(e.ts)) AS BIGINT)
                    <= CAST(floor(epoch(s1.t1)) AS BIGINT) + 86400
              GROUP BY e.user_id
            ),
            s3 AS (
              SELECT e.user_id, min(s2.t1) AS t1, min(e.ts) AS t3
              FROM events e JOIN s2 ON e.user_id = s2.user_id
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                AND CAST(floor(epoch(e.ts)) AS BIGINT)
                    <= CAST(floor(epoch(s2.t1)) AS BIGINT) + 86400
              GROUP BY e.user_id
            )
            SELECT 0 AS step_idx, 'view' AS step_name, count(*) AS n_users FROM s1
            UNION ALL
            SELECT 1, 'click', count(*) FROM s2
            UNION ALL
            SELECT 2, 'purchase', count(*) FROM s3
        """,
        "q72_cohort_retention": """
            WITH firsts AS (
              SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
              FROM events GROUP BY user_id
            ),
            sizes AS (
              SELECT cohort_day, count(*) AS n_cohort
              FROM firsts GROUP BY cohort_day
            ),
            activity AS (
              SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
            ),
            ret AS (
              SELECT f.cohort_day,
                     CAST(datediff('day', f.cohort_day, a.day) AS INT) AS day_offset,
                     count(*) AS n_active
              FROM activity a JOIN firsts f ON a.user_id = f.user_id
              WHERE datediff('day', f.cohort_day, a.day) IN (1, 3, 7)
              GROUP BY 1, 2
            )
            SELECT r.cohort_day, r.day_offset, r.n_active, s.n_cohort
            FROM ret r JOIN sizes s ON r.cohort_day = s.cohort_day
        """,
        "q63_scd2_dimension": """
            WITH ordered AS (
              SELECT user_id, ts, event_type,
                lag(event_type) OVER w AS prev_et,
                lag(ts) OVER w AS prev_ts
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            versions AS (
              SELECT user_id, ts, event_type FROM ordered
              WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_et
            )
            SELECT user_id, event_type, ts AS valid_from,
              lead(ts) OVER w2 AS valid_to,
              (lead(ts) OVER w2) IS NULL AS is_current
            FROM versions
            WINDOW w2 AS (PARTITION BY user_id ORDER BY ts)
        """,
        "q73_levenshtein_pairs": """
            WITH t AS (SELECT DISTINCT p_type AS name FROM part)
            SELECT a.name AS id_a, b.name AS id_b,
              CAST(levenshtein(a.name, b.name) AS INT) AS dist
            FROM t a JOIN t b
              ON a.name < b.name
             AND abs(length(a.name) - length(b.name)) <= 6
            WHERE levenshtein(a.name, b.name) <= 6
        """,
        "q74_json_extract": """
            WITH j AS (
              SELECT event_id,
                '{"t":"' || event_type || '","v":'
                  || CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
                  || ',"u":' || CAST(user_id AS VARCHAR) || '}' AS js
              FROM events
            )
            SELECT event_id,
              json_extract_string(js, '$.t') AS jtype,
              CAST(json_extract(js, '$.v') AS BIGINT) AS jval,
              CAST(json_extract(js, '$.u') AS BIGINT) AS juser
            FROM j
            WHERE CAST(json_extract(js, '$.v') AS BIGINT) >= 50
        """,
        "q75_exact_corr": """
            WITH ints AS (
              SELECT l_returnflag,
                CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS xi,
                CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS yi
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
            ),
            s AS (
              SELECT l_returnflag, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(yi AS DECIMAL(38,0))) AS sy,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx,
                sum(CAST(yi * yi AS DECIMAL(38,0))) AS syy,
                sum(CAST(xi * yi AS DECIMAL(38,0))) AS sxy
              FROM ints GROUP BY l_returnflag
            ),
            e AS (
              SELECT l_returnflag, n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxy AS DECIMAL(24,0)) AS DECIMAL(32,0))
                     - CAST(CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(32,0)) AS DOUBLE) AS cov_n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(24,0)) AS DECIMAL(32,0))
                     - CAST(CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS DECIMAL(32,0)) AS DOUBLE) AS var_x,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(syy AS DECIMAL(24,0)) AS DECIMAL(32,0))
                     - CAST(CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(32,0)) AS DOUBLE) AS var_y
              FROM s
            )
            SELECT l_returnflag, n,
              CASE WHEN sqrt(var_x) * sqrt(var_y) > 0
                   THEN cov_n / (sqrt(var_x) * sqrt(var_y)) END AS corr
            FROM e
        """,
        "q85_top_categories": """
            WITH c AS (
              SELECT p_brand, p_type AS value, count(*) AS n
              FROM part WHERE p_type IS NOT NULL
              GROUP BY 1, 2
            ),
            r AS (
              SELECT p_brand, value, n,
                CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY p_brand) AS DOUBLE)
                  AS share,
                CAST(row_number() OVER (PARTITION BY p_brand
                     ORDER BY n DESC, value) AS INT) AS rank
              FROM c
            )
            SELECT p_brand, value, n, share, rank FROM r WHERE rank <= 3
        """,
        "q86_category_gini": """
            WITH c AS (
              SELECT source, lang, CAST(count(*) AS DECIMAL(19,0)) AS cnt
              FROM documents WHERE lang IS NOT NULL
              GROUP BY 1, 2
            ),
            g AS (
              SELECT source,
                sum(CAST(cnt AS DECIMAL(38,0))) AS n,
                sum(CAST(cnt * cnt AS DECIMAL(38,0))) AS ss,
                count(*) AS n_categories
              FROM c GROUP BY 1
            )
            SELECT source, CAST(n AS BIGINT) AS n, n_categories,
              CAST(ss AS DOUBLE)
                / CAST(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)) AS DOUBLE)
                AS herfindahl,
              1.0 - CAST(ss AS DOUBLE)
                / CAST(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)) AS DOUBLE)
                AS gini
            FROM g
        """,
        "q87_rolling_median": """
            SELECT event_id, event_type, ts, value,
              quantile_cont(value, 0.5) OVER (
                PARTITION BY event_type ORDER BY ts
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
              ) AS rolling_median
            FROM events
        """,
        "q77_chunk_tokens": r"""
            WITH t AS (
              SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
              FROM documents
            ),
            s AS (
              SELECT doc_id, toks,
                unnest(generate_series(0, len(toks) - 1, 16)) AS start
              FROM t WHERE len(toks) > 0
            )
            SELECT doc_id AS id,
              CAST(start // 16 AS INT) AS chunk_id,
              array_to_string(toks[start + 1 : least(start + 32, len(toks))], ' ')
                AS chunk_text,
              CAST(least(start + 32, len(toks)) - start AS INT) AS n_tokens
            FROM s
        """,
        "q78_contamination": r"""
            WITH toks AS (
              SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id,
                list_distinct(
                  list_transform(
                    generate_series(1, greatest(len(t) - 2, 0)),
                    i -> CAST(('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 12)) AS BIGINT)
                         % 2147483647
                  )
                ) AS g
              FROM toks
            ),
            tr AS (SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 5 <> 0),
            te AS (SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 5 = 0)
            SELECT te.doc_id AS id,
              count(DISTINCT te.gram) AS n_grams,
              count(DISTINCT CASE WHEN tr.doc_id IS NOT NULL THEN te.gram END)
                AS n_shared,
              count(DISTINCT tr.doc_id) AS n_train_docs
            FROM te LEFT JOIN tr USING (gram)
            GROUP BY te.doc_id
        """,
        "q79_redact_pii": r"""
            WITH raw AS (
              SELECT c_custkey,
                'reach ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
                || '@example.com or +1-555-'
                || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                || ' ssn '
                || lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST(c_custkey % 90 + 10 AS VARCHAR), 2, '0') || '-'
                || lpad(CAST(c_custkey % 9000 + 1000 AS VARCHAR), 4, '0')
                || ' ip 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.1 tel '
                || CAST(c_custkey % 9 + 1 AS VARCHAR) || '.'
                || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '.'
                || lpad(CAST(c_custkey * 3 % 1000 AS VARCHAR), 3, '0') || '.'
                || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS t
              FROM customer
            )
            SELECT c_custkey,
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(t,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
                  '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g'),
                '\+?[0-9]{1,3}[- .]?\(?[0-9]{3}\)?[- .]?[0-9]{3}[- .]?[0-9]{4}',
                '[PHONE]', 'g') AS redacted
            FROM raw
        """,
        "q80_repetition_ratio": r"""
            WITH t AS (
              SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                CASE WHEN len(toks) >= 2
                  THEN list_transform(
                         generate_series(1, len(toks) - 1),
                         i -> array_to_string(toks[i:i+1], ' '))
                  ELSE CAST([] AS VARCHAR[]) END AS grams
              FROM t
            )
            SELECT doc_id,
              CAST(len(grams) AS INT) AS n_grams,
              CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
              CASE WHEN len(grams) > 0
                THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                           / CAST(len(grams) AS DOUBLE)
              END AS rep_ratio
            FROM g
        """,
        "q81_tvd_drift": """
            WITH base AS (
              SELECT event_type, CAST(value AS DOUBLE) AS v,
                (ts < TIMESTAMP '2024-01-16') AS is_ref
              FROM events WHERE value IS NOT NULL
            ),
            bounds AS (
              SELECT event_type, min(v) AS lo, max(v) AS hi
              FROM base WHERE is_ref GROUP BY 1
            ),
            binned AS (
              SELECT b.event_type,
                CASE WHEN hi = lo THEN 0
                     ELSE CAST(greatest(least(floor((v - lo) / ((hi - lo) / 10.0)), 9), 0) AS INT)
                END AS bin,
                sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS a,
                sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS bb
              FROM base b JOIN bounds USING (event_type)
              GROUP BY 1, 2
            ),
            tot AS (
              SELECT event_type,
                CAST(sum(a) AS BIGINT) AS n_ref, CAST(sum(bb) AS BIGINT) AS n_cur
              FROM binned GROUP BY 1
            )
            SELECT t.event_type, n_ref, n_cur,
              CASE WHEN n_ref > 0 AND n_cur > 0 THEN
                CAST(sum(abs(a * n_cur - bb * n_ref)) AS DOUBLE)
                / ((2.0 * CAST(n_ref AS DOUBLE)) * CAST(n_cur AS DOUBLE))
              END AS tvd
            FROM binned b JOIN tot t USING (event_type)
            GROUP BY 1, 2, 3
        """,
        "q82_acf": """
            WITH lagged AS (
              SELECT event_type, value AS x,
                lead(value, 1) OVER w AS y1,
                lead(value, 2) OVER w AS y2,
                lead(value, 3) OVER w AS y3,
                lead(value, 4) OVER w AS y4,
                lead(value, 5) OVER w AS y5
              FROM events
              WINDOW w AS (PARTITION BY event_type ORDER BY ts)
            ),
            pairs AS (
              SELECT event_type, 1 AS lag, x, y1 AS y FROM lagged
              UNION ALL SELECT event_type, 2, x, y2 FROM lagged
              UNION ALL SELECT event_type, 3, x, y3 FROM lagged
              UNION ALL SELECT event_type, 4, x, y4 FROM lagged
              UNION ALL SELECT event_type, 5, x, y5 FROM lagged
            ),
            ints AS (
              SELECT event_type, lag,
                CAST(CAST(x AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS xi,
                CAST(CAST(y AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS yi
              FROM pairs WHERE x IS NOT NULL AND y IS NOT NULL
            ),
            s AS (
              SELECT event_type, lag, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(yi AS DECIMAL(38,0))) AS sy,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx,
                sum(CAST(yi * yi AS DECIMAL(38,0))) AS syy,
                sum(CAST(xi * yi AS DECIMAL(38,0))) AS sxy
              FROM ints GROUP BY 1, 2
            ),
            e AS (
              SELECT event_type, lag, n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxy AS DECIMAL(24,0)) AS DECIMAL(36,0))
                     - CAST(CAST(sx AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0)) AS DECIMAL(36,0)) AS DOUBLE) AS cov_n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(24,0)) AS DECIMAL(36,0))
                     - CAST(CAST(sx AS DECIMAL(18,0)) * CAST(sx AS DECIMAL(18,0)) AS DECIMAL(36,0)) AS DOUBLE) AS var_x,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(syy AS DECIMAL(24,0)) AS DECIMAL(36,0))
                     - CAST(CAST(sy AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0)) AS DECIMAL(36,0)) AS DOUBLE) AS var_y
              FROM s
            )
            SELECT event_type, lag, n,
              CASE WHEN sqrt(var_x) * sqrt(var_y) > 0
                   THEN cov_n / (sqrt(var_x) * sqrt(var_y)) END AS acf
            FROM e
        """,
        "q83_cusum": """
            WITH base AS (
              SELECT event_type, ts, value,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS xi
              FROM events WHERE value IS NOT NULL
            ),
            pref AS (
              SELECT event_type, ts, value, xi,
                sum(CAST(xi AS DECIMAL(38,0))) OVER w AS pk,
                CAST(row_number() OVER w AS BIGINT) AS k
              FROM base
              WINDOW w AS (PARTITION BY event_type ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ),
            mom AS (
              SELECT event_type, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx
              FROM base GROUP BY 1
            ),
            j AS (
              SELECT p.event_type, p.ts, p.k, p.value, m.n,
                CAST(CAST(CAST(m.n AS DECIMAL(12,0)) * CAST(p.pk AS DECIMAL(24,0)) AS DECIMAL(36,0))
                     - CAST(CAST(p.k AS DECIMAL(12,0)) * CAST(m.sx AS DECIMAL(24,0)) AS DECIMAL(36,0)) AS DOUBLE) AS num,
                CAST(CAST(CAST(m.n AS DECIMAL(12,0)) * CAST(m.sxx AS DECIMAL(24,0)) AS DECIMAL(36,0))
                     - CAST(CAST(m.sx AS DECIMAL(18,0)) * CAST(m.sx AS DECIMAL(18,0)) AS DECIMAL(36,0)) AS DOUBLE) AS var_n
              FROM pref p JOIN mom m USING (event_type)
            )
            SELECT event_type, ts, k, value,
              CASE WHEN var_n > 0 THEN num / sqrt(var_n) END AS cusum,
              (abs(CASE WHEN var_n > 0 THEN num / sqrt(var_n) END)
               > 3.0 * sqrt(CAST(n AS DOUBLE))) AS breach
            FROM j
        """,
        "q84_hopping_window": f"""
            WITH x AS (
              SELECT event_type, value, ts, unnest([0, 1, 2, 3]) AS off
              FROM events
            ),
            w AS (
              SELECT event_type, value,
                make_timestamp(
                  (CAST(floor(epoch(ts) / 1800) AS BIGINT) - off) * 1800 * 1000000
                ) AS bucket
              FROM x
            )
            SELECT event_type,
              {_davg_sql('value')} AS avg_value,
              count(*) AS n,
              bucket
            FROM w GROUP BY event_type, bucket
        """,
        "q76_histogram": """
            WITH b AS (
              SELECT event_type,
                CAST(min(value) AS DOUBLE) AS lo,
                CAST(max(value) AS DOUBLE) AS hi
              FROM events WHERE value IS NOT NULL GROUP BY event_type
            ),
            k AS (
              SELECT e.event_type, lo, hi,
                CASE WHEN hi = lo THEN 0
                     ELSE CAST(least(floor((CAST(value AS DOUBLE) - lo)
                                           / ((hi - lo) / 10.0)), 9) AS INT)
                END AS bin
              FROM events e JOIN b USING (event_type)
              WHERE value IS NOT NULL
            )
            SELECT event_type, bin,
              lo + CAST(bin AS DOUBLE) * (hi - lo) / 10.0 AS bin_lo,
              lo + (CAST(bin AS DOUBLE) + 1) * (hi - lo) / 10.0 AS bin_hi,
              count(*) AS n
            FROM k GROUP BY event_type, bin, lo, hi
        """,
        "q88_merge_intervals": """
            WITH iv AS (
              SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
              FROM events
            ),
            flagged AS (
              SELECT user_id, s, e,
                CASE WHEN s > max(e) OVER (
                       PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     THEN 1 ELSE 0 END AS new_island
              FROM iv
            ),
            labeled AS (
              SELECT user_id, s, e,
                sum(new_island) OVER (
                  PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
              FROM flagged
            )
            SELECT user_id, min(s) AS island_start, max(e) AS island_end,
                   count(*) AS n_intervals
            FROM labeled GROUP BY user_id, island
        """,
        "q89_order_streaks": """
            WITH d AS (
              SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d
              FROM orders
            ),
            a AS (
              SELECT o_custkey, d,
                d - CAST(row_number() OVER (
                      PARTITION BY o_custkey ORDER BY d) AS INT) AS anchor
              FROM d
            )
            SELECT o_custkey, min(d) AS streak_start, max(d) AS streak_end,
                   count(*) AS n_days
            FROM a GROUP BY o_custkey, anchor
            HAVING count(*) >= 2
        """,
        "q90_asof_tolerance": """
            WITH p AS (
              SELECT user_id, ts, max(value) AS v
              FROM events WHERE event_type = 'purchase'
              GROUP BY user_id, ts
            ),
            m AS (
              SELECT e.event_id, e.user_id, e.ts,
                (SELECT max(p.ts) FROM p
                 WHERE p.user_id = e.user_id AND p.ts <= e.ts
                   AND p.ts >= e.ts - INTERVAL 2 HOUR) AS last_purchase_ts
              FROM events e
            )
            SELECT m.event_id, m.user_id, m.ts, m.last_purchase_ts,
                   p.v AS last_purchase_value
            FROM m LEFT JOIN p
              ON p.user_id = m.user_id AND p.ts = m.last_purchase_ts
        """,
        "q91_pareto_customers": """
            WITH rev AS (
              SELECT o_custkey,
                sum(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
              FROM orders GROUP BY o_custkey
            ),
            c AS (
              SELECT o_custkey, rev,
                sum(rev) OVER (ORDER BY rev DESC, o_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                sum(rev) OVER () AS tot
              FROM rev
            )
            SELECT o_custkey, CAST(rev AS DOUBLE) AS revenue,
              CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share,
              CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.8 AS is_top80
            FROM c
        """,
        "q92_m4_downsample": """
            SELECT event_type, date_trunc('day', ts) AS bucket_start,
              min(value) AS v_min, max(value) AS v_max,
              min_by(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 18, '0')
                         || lpad(CAST(event_id AS VARCHAR), 13, '0')) AS v_first,
              max_by(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 18, '0')
                         || lpad(CAST(event_id AS VARCHAR), 13, '0')) AS v_last,
              count(*) AS n
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type, date_trunc('day', ts)
        """,
        "q93_deadband": """
            WITH RECURSIVE base AS (
              SELECT user_id, ts, value,
                CAST(row_number() OVER (
                  PARTITION BY user_id ORDER BY ts, value) AS BIGINT) AS rn
              FROM events WHERE value IS NOT NULL
            ),
            -- replays operators/compress.py's fold: keep first, then
            -- keep iff |v - last_kept| > eps (strict), carrying last_kept
            rec AS (
              SELECT user_id, ts, value, rn, value AS last_kept, TRUE AS kept
              FROM base WHERE rn = 1
              UNION ALL
              SELECT b.user_id, b.ts, b.value, b.rn,
                CASE WHEN abs(b.value - r.last_kept) > 25.0
                     THEN b.value ELSE r.last_kept END,
                abs(b.value - r.last_kept) > 25.0
              FROM rec r JOIN base b
                ON b.user_id = r.user_id AND b.rn = r.rn + 1
            )
            SELECT user_id, ts, value FROM rec WHERE kept
        """,
        "q94_rolling_corr": """
            WITH e AS (
              SELECT event_id, user_id, ts,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS xi,
                CAST(epoch_us(ts) // 1000000 - 1704067200 AS DECIMAL(19,0)) AS yi
              FROM events WHERE value IS NOT NULL
            ),
            s AS (
              SELECT event_id, user_id, ts,
                count(*) OVER w AS n,
                sum(CAST(xi AS DECIMAL(38,0))) OVER w AS sx,
                sum(CAST(yi AS DECIMAL(38,0))) OVER w AS sy,
                sum(CAST(xi * xi AS DECIMAL(38,0))) OVER w AS sxx,
                sum(CAST(yi * yi AS DECIMAL(38,0))) OVER w AS syy,
                sum(CAST(xi * yi AS DECIMAL(38,0))) OVER w AS sxy
              FROM e
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
            )
            SELECT event_id, user_id, ts,
              CASE WHEN sqrt(CAST(CAST(n AS DECIMAL(12,0)) * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(CAST(n AS DECIMAL(12,0)) * syy - sy * sy AS DOUBLE)) > 0
                   THEN CAST(CAST(n AS DECIMAL(12,0)) * sxy - sx * sy AS DOUBLE)
                      / (sqrt(CAST(CAST(n AS DECIMAL(12,0)) * sxx - sx * sx AS DOUBLE))
                         * sqrt(CAST(CAST(n AS DECIMAL(12,0)) * syy - sy * sy AS DOUBLE)))
              END AS r_corr
            FROM s
        """,
        "q95_bloom_semi_join": """
            SELECT l_returnflag, count(*) AS n_items,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_orderkey IN (
              SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
            )
            GROUP BY l_returnflag
        """,
        "q97_stratified_sample": f"""
            SELECT doc_id, lang, source FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
              CASE lang
                WHEN 'en' THEN '{_thr(0.5)}'
                WHEN 'de' THEN '{_thr(1.0)}'
                WHEN 'fr' THEN '{_thr(0.25)}'
                ELSE '{_thr(0.1)}'
              END
        """,
        "q99_weighted_median": """
            WITH c AS (
              SELECT l_returnflag, l_extendedprice,
                sum(CAST(l_quantity AS DECIMAL(28,6))) OVER (
                  PARTITION BY l_returnflag
                  ORDER BY l_extendedprice, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
                sum(CAST(l_quantity AS DECIMAL(28,6))) OVER (
                  PARTITION BY l_returnflag) AS totw
              FROM lineitem
            )
            SELECT l_returnflag, min(l_extendedprice) AS w_median
            FROM c WHERE cumw * 2 >= totw GROUP BY l_returnflag
        """,
        "q02_late_orders": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
            GROUP BY o_orderpriority
        """,
        "q100_triangle_count": """
            WITH cell AS (
              SELECT DISTINCT event_type,
                epoch_us(ts) // 1800000000 AS bucket, user_id
              FROM events
            ),
            pc AS (
              SELECT a.user_id AS u, b.user_id AS v, count(*) AS n
              FROM cell a JOIN cell b
                ON a.event_type = b.event_type AND a.bucket = b.bucket
              WHERE a.user_id < b.user_id
              GROUP BY a.user_id, b.user_id
            ),
            sym AS (
              SELECT u, v, n FROM pc
              UNION ALL SELECT v AS u, u AS v, n FROM pc
            ),
            topk AS (
              SELECT u, v FROM (
                SELECT u, v,
                  row_number() OVER (
                    PARTITION BY u ORDER BY n DESC, v ASC) AS rk
                FROM sym
              ) WHERE rk <= 3
            ),
            e AS (
              SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
              FROM topk
            )
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM e e1
            JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        """,
        "q101_trend_slope": """
            WITH ints AS (
              SELECT event_type,
                CAST(CAST(epoch_us(ts) // 1000000 AS DECIMAL(18,0)) * 1
                     AS DECIMAL(19,0)) AS xi,
                CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                     AS DECIMAL(19,0)) AS yi
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
            ),
            s AS (
              SELECT event_type, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(yi AS DECIMAL(38,0))) AS sy,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx,
                sum(CAST(xi * yi AS DECIMAL(38,0))) AS sxy
              FROM ints GROUP BY event_type
            ),
            e AS (
              SELECT event_type, n, sx, sy,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxy AS DECIMAL(26,0)) AS DECIMAL(38,0))
                     - CAST(CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS DOUBLE) AS cov_n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(26,0)) AS DECIMAL(38,0))
                     - CAST(CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS DOUBLE) AS var_n
              FROM s
            )
            SELECT event_type, n,
              (CASE WHEN var_n > 0 THEN cov_n / var_n END) * 1e-06 AS slope,
              ((CAST(sy AS DOUBLE)
                - (CASE WHEN var_n > 0 THEN cov_n / var_n END) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE)) / 1000000.0 AS intercept
            FROM e
        """,
        "q102_group_zscore": """
            WITH ints AS (
              SELECT o_orderkey, o_orderpriority,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS DECIMAL(19,0)) AS xi
              FROM orders
            ),
            m AS (
              SELECT o_orderpriority, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx
              FROM ints GROUP BY o_orderpriority
            ),
            j AS (
              SELECT i.o_orderkey, i.o_orderpriority, m.n,
                CAST(CAST(CAST(m.n AS DECIMAL(12,0)) * i.xi AS DECIMAL(34,0))
                     - CAST(m.sx AS DECIMAL(34,0)) AS DOUBLE) AS num,
                sqrt(
                  CAST(CAST(CAST(m.n AS DECIMAL(12,0)) * CAST(m.sxx AS DECIMAL(26,0)) AS DECIMAL(37,0))
                       - CAST(CAST(m.sx AS DECIMAL(19,0)) * CAST(m.sx AS DECIMAL(19,0)) AS DECIMAL(37,0)) AS DOUBLE)
                  * (CAST(m.n AS DOUBLE) / CAST(m.n - 1 AS DOUBLE))
                ) AS den
              FROM ints i JOIN m USING (o_orderpriority)
            )
            SELECT o_orderkey, o_orderpriority,
              CASE WHEN n > 1 AND den > 0 THEN num / den END AS zscore
            FROM j
        """,
        "q103_transition_matrix": """
            WITH p AS (
              SELECT event_type AS from_state,
                lead(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS to_state
              FROM events
            ),
            c AS (
              SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
              FROM p WHERE to_state IS NOT NULL GROUP BY from_state, to_state
            )
            SELECT from_state, to_state, n,
              CAST(n AS DOUBLE)
                / CAST(sum(n) OVER (PARTITION BY from_state) AS DOUBLE) AS share
            FROM c
        """,
        "q104_running_distinct": """
            WITH fs AS (
              SELECT user_id, min(CAST(ts AS DATE)) AS day
              FROM events GROUP BY user_id
            ),
            d AS (
              SELECT day, CAST(count(*) AS BIGINT) AS new_entities
              FROM fs GROUP BY day
            )
            SELECT day, new_entities,
              CAST(sum(new_entities) OVER (
                ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS cum_entities
            FROM d
        """,
        "q105_dup_ngram_rate": r"""
            WITH toks AS (
              SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id, unnest(
                list_distinct(
                  list_transform(
                    generate_series(1, greatest(len(t) - 2, 0)),
                    i -> CAST(('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 12)) AS BIGINT)
                         % 2147483647
                  )
                )) AS gram
              FROM toks
            ),
            gdf AS (SELECT gram, count(*) AS df FROM grams GROUP BY gram)
            SELECT g.doc_id AS id,
              CAST(count(*) AS BIGINT) AS n_grams,
              CAST(sum(CASE WHEN gdf.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
              CAST(CAST(sum(CASE WHEN gdf.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
                / CAST(count(*) AS DOUBLE) AS dup_rate
            FROM grams g JOIN gdf USING (gram)
            GROUP BY g.doc_id
        """,
        "q106_snapshot_diff": """
            WITH newv AS (
              SELECT * FROM orders WHERE o_orderkey % 101 <> 0
            ),
            oldv AS (
              SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
                     ELSE o_totalprice END AS o_totalprice,
                o_orderdate, o_orderpriority
              FROM orders WHERE o_orderkey % 97 <> 0
            )
            SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
              CASE WHEN o.o_orderkey IS NULL THEN 'added'
                   WHEN n.o_orderkey IS NULL THEN 'removed'
                   WHEN (o.o_custkey IS DISTINCT FROM n.o_custkey)
                     OR (o.o_orderdate IS DISTINCT FROM n.o_orderdate)
                     OR (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
                     OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                     OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
                   THEN 'changed'
                   ELSE 'unchanged' END AS change
            FROM oldv o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey
        """,
        "q107_collocations": r"""
            WITH toks AS (
              SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
              FROM documents
            ),
            uni AS (
              SELECT w, CAST(count(*) AS BIGINT) AS n_w
              FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
            ),
            pairs AS (
              SELECT unnest(list_transform(
                generate_series(1, greatest(len(t) - 1, 0)),
                i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS p
              FROM toks
            ),
            bi AS (
              SELECT p.w1 AS w1, p.w2 AS w2, CAST(count(*) AS BIGINT) AS n_pair
              FROM pairs GROUP BY p.w1, p.w2
              HAVING count(*) >= 3
            ),
            tot AS (SELECT CAST(sum(len(t)) AS BIGINT) AS n FROM toks)
            SELECT b.w1, b.w2, b.n_pair,
              u1.n_w AS n_w1, u2.n_w AS n_w2,
              CAST(tot.n * b.n_pair AS DOUBLE)
                / CAST(u1.n_w * u2.n_w AS DOUBLE) AS lift
            FROM bi b
            JOIN uni u1 ON b.w1 = u1.w
            JOIN uni u2 ON b.w2 = u2.w, tot
        """,
        "q108_gopher_quality": r"""
            WITH toks AS (
              SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
              FROM documents
            ),
            m AS (
              SELECT doc_id,
                CAST(len(t) AS INT) AS n_words,
                CAST(COALESCE(list_sum(list_transform(t, w -> length(w))), 0) AS INT) AS n_chars,
                CAST(len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]'))) AS INT) AS alpha_words,
                CAST(len(list_filter(t, w -> contains(w, '#')))
                     + len(list_filter(t, w -> contains(w, '...'))) AS INT) AS n_symbols,
                CAST(len(list_intersect(list_distinct(t), """
        + _STOPWORD_LIST
        + """)) AS INT) AS n_stop
              FROM toks
            )
            SELECT doc_id, n_words,
              (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
              (n_chars >= 3 * n_words AND n_chars <= 10 * n_words) AS ok_mean_word_len,
              (5 * alpha_words >= 4 * n_words) AS ok_alpha_ratio,
              (10 * n_symbols <= n_words) AS ok_symbol_ratio,
              (n_stop >= 2) AS ok_stopwords,
              ((n_words >= 50 AND n_words <= 100000)
               AND (n_chars >= 3 * n_words AND n_chars <= 10 * n_words)
               AND (5 * alpha_words >= 4 * n_words)
               AND (10 * n_symbols <= n_words)
               AND (n_stop >= 2)) AS pass_all
            FROM m
        """,
        "q109_null_runs": """
            WITH base AS (
              SELECT user_id, event_id, ts,
                CASE WHEN event_type <> 'error' THEN value END AS v
              FROM events
            ),
            a AS (
              SELECT user_id, v,
                count(v) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS anchor
              FROM base
            ),
            runs AS (
              SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS len
              FROM a WHERE v IS NULL GROUP BY user_id, anchor
            )
            SELECT user_id,
              CAST(count(*) AS BIGINT) AS n_runs,
              max(len) AS longest_run,
              CAST(sum(len) AS BIGINT) AS total_nulls
            FROM runs GROUP BY user_id
        """,
        "q110_trigram_lm": r"""
            WITH toks AS (
              SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
              FROM documents
            ),
            grams AS (
              SELECT unnest(list_transform(
                generate_series(1, greatest(len(t) - 2, 0)),
                i -> struct_pack(
                  context := array_to_string(t[i:i+1], ' '),
                  next_word := t[i+2]))) AS g
              FROM toks
            ),
            full_c AS (
              SELECT g.context AS context, g.next_word AS next_word,
                CAST(count(*) AS BIGINT) AS c_full
              FROM grams GROUP BY g.context, g.next_word
            ),
            win AS (
              SELECT context, next_word, c_full,
                CAST(sum(c_full) OVER (PARTITION BY context) AS BIGINT) AS c_context
              FROM full_c
            )
            SELECT context, next_word, c_full, c_context,
              CAST(c_full AS DOUBLE) / CAST(c_context AS DOUBLE) AS prob
            FROM win WHERE c_context >= 3
        """,
        "q111_posting_lists": r"""
            WITH toks AS (
              SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
              FROM documents
            ),
            occ AS (SELECT doc_id, unnest(t) AS term FROM toks),
            per_doc AS (
              SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
              FROM occ GROUP BY term, doc_id
            )
            SELECT term,
              CAST(count(*) AS BIGINT) AS df,
              CAST(sum(tf) AS BIGINT) AS tf,
              min(doc_id) AS min_doc_id,
              max(doc_id) AS max_doc_id
            FROM per_doc GROUP BY term
        """,
        "q112_time_in_state": """
            WITH s AS (
              SELECT event_type AS state,
                lead(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts) AS us
              FROM events
            )
            SELECT state,
              CAST(count(*) AS BIGINT) AS n_intervals,
              CAST(sum(us) // 1000000 AS BIGINT) AS total_seconds,
              CAST(sum(us) AS DOUBLE)
                / CAST(count(*) * 1000000 AS DOUBLE) AS mean_seconds
            FROM s WHERE us IS NOT NULL GROUP BY state
        """,
        "q113_densify_grid": """
            WITH obs AS (
              SELECT user_id, epoch_us(ts) AS us, 0 AS is_grid, value AS v
              FROM events
            ),
            spans AS (
              SELECT user_id,
                min(epoch_us(ts)) // 1800000000 AS b0,
                max(epoch_us(ts)) // 1800000000 AS b1
              FROM events GROUP BY user_id
            ),
            grid AS (
              SELECT user_id, CAST(b * 1800000000 AS BIGINT) AS us,
                1 AS is_grid, CAST(NULL AS DOUBLE) AS v
              FROM spans, unnest(generate_series(b0, b1)) AS t(b)
            ),
            u AS (
              SELECT * FROM obs UNION ALL SELECT * FROM grid
            ),
            f AS (
              SELECT user_id, us, is_grid,
                last_value(v IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY us, is_grid
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
              FROM u
            )
            SELECT user_id, make_timestamp(us) AS bucket_ts, value
            FROM f WHERE is_grid = 1
        """,
        "q114_session_stats": """
            WITH flagged AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                     THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            sess AS (
              SELECT user_id, ts,
                CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS session_seq
              FROM flagged
            ),
            per_session AS (
              SELECT user_id, session_seq,
                CAST(count(*) AS BIGINT) AS n_ev,
                max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
              FROM sess GROUP BY user_id, session_seq
            )
            SELECT user_id,
              CAST(count(*) AS BIGINT) AS n_sessions,
              CAST(sum(n_ev) AS BIGINT) AS n_events,
              CAST(sum(n_ev) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                AS events_per_session,
              CAST(sum(dur_us) AS DOUBLE)
                / CAST(count(*) * 1000000 AS DOUBLE) AS mean_session_seconds
            FROM per_session GROUP BY user_id
        """,
        "q115_source_rollup": r"""
            WITH toks AS (
              SELECT source, lang, n_chars,
                list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
              FROM documents
            ),
            m AS (
              SELECT source, lang, n_chars,
                CAST(len(t) AS INT) AS n_words,
                CAST(COALESCE(list_sum(list_transform(t, w -> length(w))), 0) AS INT) AS n_tchars,
                CAST(len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]'))) AS INT) AS alpha_words,
                CAST(len(list_filter(t, w -> contains(w, '#')))
                     + len(list_filter(t, w -> contains(w, '...'))) AS INT) AS n_symbols,
                CAST(len(list_intersect(list_distinct(t), """
        + _STOPWORD_LIST
        + """)) AS INT) AS n_stop
              FROM toks
            ),
            flags AS (
              SELECT source, lang, n_chars,
                CASE WHEN (n_words >= 50 AND n_words <= 100000)
                      AND (n_tchars >= 3 * n_words AND n_tchars <= 10 * n_words)
                      AND (5 * alpha_words >= 4 * n_words)
                      AND (10 * n_symbols <= n_words)
                      AND (n_stop >= 2) THEN 1 ELSE 0 END AS ok
              FROM m
            )
            SELECT source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars,
              CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
              CAST(sum(ok) AS BIGINT) AS n_pass,
              CAST(sum(ok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pass_share
            FROM flags GROUP BY source
        """,
        "q116_minmax_scale": """
            WITH b AS (
              SELECT event_type,
                min(CAST(value AS DECIMAL(18,6))) AS mn,
                max(CAST(value AS DECIMAL(18,6))) AS mx
              FROM events GROUP BY event_type
            )
            SELECT event_id, event_type,
              CASE WHEN CAST(mx - mn AS DOUBLE) > 0
                   THEN CAST(CAST(value AS DECIMAL(18,6)) - mn AS DOUBLE)
                        / CAST(mx - mn AS DOUBLE)
              END AS scaled
            FROM events JOIN b USING (event_type)
        """,
        "q117_spearman": """
            WITH xy AS (
              SELECT event_type, epoch_us(ts) // 1000000 AS x, value AS y
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
            ),
            r AS (
              SELECT event_type,
                2 * rank() OVER (PARTITION BY event_type ORDER BY x)
                  + count(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
                2 * rank() OVER (PARTITION BY event_type ORDER BY y)
                  + count(*) OVER (PARTITION BY event_type, y) - 1 AS ry
              FROM xy
            ),
            ints AS (
              SELECT event_type,
                CAST(CAST(rx AS DECIMAL(18,0)) * 1 AS DECIMAL(19,0)) AS xi,
                CAST(CAST(ry AS DECIMAL(18,0)) * 1 AS DECIMAL(19,0)) AS yi
              FROM r
            ),
            s AS (
              SELECT event_type, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(yi AS DECIMAL(38,0))) AS sy,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx,
                sum(CAST(yi * yi AS DECIMAL(38,0))) AS syy,
                sum(CAST(xi * yi AS DECIMAL(38,0))) AS sxy
              FROM ints GROUP BY event_type
            ),
            e AS (
              SELECT event_type, n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxy AS DECIMAL(26,0)) AS DECIMAL(38,0))
                     - CAST(CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS DOUBLE) AS cov_n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(26,0)) AS DECIMAL(38,0))
                     - CAST(CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS DOUBLE) AS var_x,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(syy AS DECIMAL(26,0)) AS DECIMAL(38,0))
                     - CAST(CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS DOUBLE) AS var_y
              FROM s
            )
            SELECT event_type, n,
              CASE WHEN sqrt(var_x) * sqrt(var_y) > 0
                   THEN cov_n / (sqrt(var_x) * sqrt(var_y)) END AS spearman
            FROM e
        """,
        "q118_chisq_cells": """
            WITH cells AS (
              SELECT o_orderpriority AS a, o_orderstatus AS b,
                CAST(count(*) AS BIGINT) AS observed
              FROM orders
              WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
              GROUP BY o_orderpriority, o_orderstatus
            ),
            w AS (
              SELECT a, b, observed,
                CAST(observed AS DECIMAL(19,0)) AS o,
                CAST(sum(observed) OVER (PARTITION BY a) AS DECIMAL(19,0)) AS r,
                CAST(sum(observed) OVER (PARTITION BY b) AS DECIMAL(19,0)) AS c,
                CAST(sum(observed) OVER () AS DECIMAL(19,0)) AS n
              FROM cells
            ),
            f AS (
              SELECT a, b, observed,
                CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
                CAST(CAST(n * o AS DECIMAL(37,0))
                     - CAST(r * c AS DECIMAL(37,0)) AS DOUBLE) AS num,
                CAST(n * CAST(r * c AS DECIMAL(19,0)) AS DOUBLE) AS den
              FROM w
            )
            SELECT a, b, observed, expected,
              (num * num) / den AS chi2_contrib
            FROM f
        """,
        "q119_benford": """
            WITH d AS (
              SELECT CAST(regexp_extract(CAST(o_totalprice AS VARCHAR),
                                         '[1-9]') AS INT) AS digit
              FROM orders WHERE o_totalprice > 0
            ),
            c AS (
              SELECT digit, CAST(count(*) AS BIGINT) AS n
              FROM d WHERE digit BETWEEN 1 AND 9
              GROUP BY 1
            )
            SELECT digit, n,
              CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share,
              CASE digit
                WHEN 1 THEN 0.3010299956639812E0
                WHEN 2 THEN 0.17609125905568124E0
                WHEN 3 THEN 0.12493873660829993E0
                WHEN 4 THEN 0.09691001300805642E0
                WHEN 5 THEN 0.07918124604762482E0
                WHEN 6 THEN 0.06694678963061322E0
                WHEN 7 THEN 0.05799194697768673E0
                WHEN 8 THEN 0.05115252244738129E0
                WHEN 9 THEN 0.04575749056067514E0
              END AS expected
            FROM c
        """,
        "q120_dimension_stats": """
            WITH e AS (
              SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS comp
              FROM embeddings,
                unnest(generate_series(1, len(embedding))) AS t(i)
            ),
            ints AS (
              SELECT dim, comp,
                CAST(CAST(comp AS DECIMAL(18,6)) * 1000000
                     AS DECIMAL(19,0)) AS xi
              FROM e
            ),
            s AS (
              SELECT dim, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx,
                min(comp) AS mn, max(comp) AS mx
              FROM ints GROUP BY dim
            )
            SELECT CAST(dim AS INT) AS dim, n,
              CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS mean,
              CASE WHEN n > 1 THEN
                sqrt(
                  CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(26,0)) AS DECIMAL(38,0))
                       - CAST(CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS DOUBLE)
                  * (1.0 / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                ) / 1000000.0
              END AS std,
              mn AS min_val, mx AS max_val
            FROM s
        """,
        "q122_sax_symbols": """
            WITH base AS (
              SELECT user_id,
                CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                     AS DECIMAL(19,0)) AS xi,
                row_number() OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) - 1 AS idx,
                count(*) OVER (PARTITION BY user_id) AS n
              FROM events
            ),
            seg AS (
              SELECT user_id, xi, CAST((idx * 8) // n AS INT) AS segment
              FROM base
            ),
            per_seg AS (
              SELECT user_id, segment,
                CAST(count(*) AS BIGINT) AS n_points,
                sum(CAST(xi AS DECIMAL(38,0))) AS seg_sx
              FROM seg GROUP BY user_id, segment
            ),
            per_series AS (
              SELECT user_id, count(*) AS sn,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx
              FROM seg GROUP BY user_id
            ),
            calc AS (
              SELECT p.user_id, p.segment, p.n_points, s.sn,
                CAST(p.seg_sx AS DOUBLE) / CAST(p.n_points AS DOUBLE)
                  / 1000000.0 AS paa,
                CAST(s.sx AS DOUBLE) / CAST(s.sn AS DOUBLE)
                  / 1000000.0 AS mean,
                sqrt(
                  CAST(CAST(CAST(s.sn AS DECIMAL(12,0)) * CAST(s.sxx AS DECIMAL(26,0)) AS DECIMAL(38,0))
                       - CAST(CAST(s.sx AS DECIMAL(19,0)) * CAST(s.sx AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS DOUBLE)
                  * (1.0 / (CAST(s.sn AS DOUBLE) * CAST(s.sn - 1 AS DOUBLE)))
                ) / 1000000.0 AS std
              FROM per_seg p JOIN per_series s USING (user_id)
            ),
            zc AS (
              SELECT user_id, segment, n_points, paa,
                CASE WHEN sn > 1 AND std > 0 THEN (paa - mean) / std END AS z
              FROM calc
            )
            SELECT user_id, segment, n_points, paa,
              CASE WHEN z IS NOT NULL THEN
                CAST(CAST(z >= -0.6744897501960817E0 AS INT)
                     + CAST(z >= 0.0E0 AS INT)
                     + CAST(z >= 0.6744897501960817E0 AS INT) AS INT)
              END AS symbol
            FROM zc
        """,
        "q123_event_trigrams": """
            WITH p AS (
              SELECT event_type AS s1,
                lead(event_type, 1) OVER w AS s2,
                lead(event_type, 2) OVER w AS s3
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
            FROM p WHERE s3 IS NOT NULL GROUP BY s1, s2, s3
        """,
        "q145_table_checksum": """
            WITH stable AS (
              SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
                l_returnflag, l_linestatus,
                epoch_us(l_shipdate) // 1000000 AS ship_epoch,
                CAST(l_quantity AS DECIMAL(12,2)) AS qty,
                CAST(l_extendedprice AS DECIMAL(12,2)) AS price
              FROM lineitem
            ),
            h AS (
              SELECT CAST(('0x' || substr(md5(concat_ws(chr(31),
                  COALESCE(CAST(l_orderkey AS VARCHAR), chr(0) || 'null'),
                  COALESCE(CAST(l_partkey AS VARCHAR), chr(0) || 'null'),
                  COALESCE(CAST(l_suppkey AS VARCHAR), chr(0) || 'null'),
                  COALESCE(CAST(l_linenumber AS VARCHAR), chr(0) || 'null'),
                  COALESCE(l_returnflag, chr(0) || 'null'),
                  COALESCE(l_linestatus, chr(0) || 'null'),
                  COALESCE(CAST(ship_epoch AS VARCHAR), chr(0) || 'null'),
                  COALESCE(CAST(qty AS VARCHAR), chr(0) || 'null'),
                  COALESCE(CAST(price AS VARCHAR), chr(0) || 'null')
                )), 1, 12)) AS BIGINT) % 1000000007 AS rh
              FROM stable
            )
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(rh) % 1000000007 AS BIGINT) AS checksum
            FROM h
        """,
        "q146_frequent_triples": """
            WITH bi AS (
              SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
              FROM lineitem
            ),
            pairs AS (
              SELECT a.basket, a.item AS i1, b.item AS i2
              FROM bi a JOIN bi b ON a.basket = b.basket
              WHERE a.item < b.item
            ),
            freq AS (
              SELECT i1, i2 FROM pairs GROUP BY i1, i2 HAVING count(*) >= 2
            ),
            cand AS (
              SELECT p.basket, p.i1, p.i2 FROM pairs p JOIN freq USING (i1, i2)
            )
            SELECT p.i1, p.i2, c.item AS i3,
              CAST(count(*) AS BIGINT) AS n_baskets
            FROM cand p JOIN bi c
              ON p.basket = c.basket AND c.item > p.i2
            GROUP BY p.i1, p.i2, c.item
            HAVING count(*) >= 2
        """,
        "q147_sequential_pairs": """
            WITH cp AS (
              SELECT o_custkey AS cust, l_partkey AS part,
                min(o_orderdate) AS first_dt
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_custkey, l_partkey
            )
            SELECT a.part AS part_first, b.part AS part_then,
              CAST(count(*) AS BIGINT) AS n_customers
            FROM cp a JOIN cp b
              ON a.cust = b.cust AND a.first_dt < b.first_dt
            GROUP BY a.part, b.part
            HAVING count(*) >= 3
        """,
        "q148_cohort_ltv": """
            WITH firsts AS (
              SELECT o_custkey,
                date_trunc('month', min(o_orderdate)) AS cohort_month
              FROM orders GROUP BY o_custkey
            ),
            j AS (
              SELECT f.cohort_month,
                (year(o.o_orderdate) - year(f.cohort_month)) * 12
                  + (month(o.o_orderdate) - month(f.cohort_month))
                  AS age_months,
                CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
              FROM orders o JOIN firsts f USING (o_custkey)
            ),
            pa AS (
              SELECT cohort_month, age_months, sum(rev) AS r,
                CAST(count(*) AS BIGINT) AS n_orders
              FROM j GROUP BY cohort_month, age_months
            )
            SELECT cohort_month, CAST(age_months AS INT) AS age_months,
              n_orders,
              CAST(r AS DOUBLE) AS revenue,
              CAST(sum(r) OVER (
                PARTITION BY cohort_month ORDER BY age_months
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                AS cum_revenue
            FROM pa
        """,
        "q149_life_table": """
            WITH spans AS (
              SELECT user_id,
                date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
                  AS lifespan
              FROM events GROUP BY user_id
            ),
            ends AS (
              SELECT lifespan, CAST(count(*) AS BIGINT) AS d
              FROM spans GROUP BY lifespan
            )
            SELECT CAST(lifespan AS INT) AS age_days, d,
              CAST(sum(d) OVER (
                ORDER BY lifespan DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS n_at_risk
            FROM ends
        """,
        "q150_revenue_gini": """
            WITH per_cust AS (
              SELECT o_custkey,
                sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
              FROM orders GROUP BY o_custkey
            ),
            ranked AS (
              SELECT CAST(row_number() OVER (
                  ORDER BY rev ASC, o_custkey ASC) AS DECIMAL(12,0)) AS i,
                rev
              FROM per_cust
            ),
            agg AS (
              SELECT count(*) AS n,
                sum(CAST(i * CAST(rev AS DECIMAL(24,2)) AS DECIMAL(38,2)))
                  AS iwx,
                sum(CAST(rev AS DECIMAL(38,2))) AS sx
              FROM ranked
            )
            SELECT CAST(n AS BIGINT) AS n,
              CAST(sx AS DOUBLE) AS total_revenue,
              2.0 * CAST(iwx AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
              - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
            FROM agg
        """,
        "q151_bfs_hops": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT l_suppkey * 2 AS a, l_partkey * 2 + 1 AS b
              FROM lineitem
            ),
            ed AS (
              SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e
            ),
            seeds AS (
              SELECT s_suppkey * 2 AS node FROM supplier WHERE s_suppkey % 10 = 1
            ),
            walk(node, hops) AS (
              SELECT node, 0 AS hops FROM seeds
              UNION
              SELECT ed.b AS node, w.hops + 1 AS hops
              FROM walk w JOIN ed ON ed.a = w.node
              WHERE w.hops < 3
            )
            SELECT node, CAST(min(hops) AS INT) AS hops
            FROM walk GROUP BY node
        """,
        "q152_filter_funnel": r"""
            WITH base AS (
              SELECT doc_id, text,
                list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t,
                (doc_id = min(doc_id) OVER (PARTITION BY text)) AS r
              FROM documents
            ),
            m AS (
              SELECT r,
                list_transform(t, w -> lower(w)) AS tok,
                CAST(len(t) AS INT) AS n_words,
                CAST(COALESCE(list_sum(list_transform(t, w -> length(w))), 0) AS INT) AS n_chars,
                CAST(len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]'))) AS INT) AS alpha_words,
                CAST(len(list_filter(t, w -> contains(w, '#')))
                     + len(list_filter(t, w -> contains(w, '...'))) AS INT) AS n_symbols,
                CAST(len(list_intersect(list_distinct(t), """
        + _STOPWORD_LIST
        + """)) AS INT) AS n_stop
              FROM base
            ),
            f AS (
              SELECT r,
                list_aggregate([
                  {'score': len(list_filter(tok, t -> list_contains(['the','and','of','is','to'], t))), 'lang': 'en'},
                  {'score': len(list_filter(tok, t -> list_contains(['el','la','los','es','una'], t))), 'lang': 'es'},
                  {'score': len(list_filter(tok, t -> list_contains(['der','die','und','ist','ein'], t))), 'lang': 'de'},
                  {'score': len(list_filter(tok, t -> list_contains(['le','les','est','une','dans'], t))), 'lang': 'fr'}
                ], 'max') AS best,
                ((n_words >= 50 AND n_words <= 100000)
                 AND (n_chars >= 3 * n_words AND n_chars <= 10 * n_words)
                 AND (5 * alpha_words >= 4 * n_words)
                 AND (10 * n_symbols <= n_words)
                 AND (n_stop >= 2)) AS g
              FROM m
            )
            SELECT CAST(count(*) AS BIGINT) AS n_total,
              CAST(sum(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
              CAST(sum(CASE WHEN r AND best.score > 0 AND best.lang = 'en'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_english,
              CAST(sum(CASE WHEN r AND best.score > 0 AND best.lang = 'en' AND g
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
            FROM f
        """,
        "q153_cluster_canonical": r"""
            WITH RECURSIVE reps AS (
              SELECT doc_id, text, n_chars FROM documents
              WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
            ),
            tk AS (
              SELECT doc_id AS id,
                list_distinct(
                  list_transform(
                    generate_series(1, greatest(len(t) - 2, 0)),
                    i -> array_to_string(t[i:i+2], ' ')
                  )
                ) AS tok
              FROM (
                SELECT doc_id,
                  list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
                FROM reps
              )
            ),
            inv AS (SELECT id, len(tok) AS n_tok, unnest(tok) AS token FROM tk),
            cand AS (
              SELECT a.id AS id_a, b.id AS id_b, a.n_tok AS n_a, b.n_tok AS n_b,
                     count(*) AS inter
              FROM inv a JOIN inv b ON a.token = b.token AND a.id < b.id
              GROUP BY 1, 2, 3, 4
            ),
            sim AS (
              SELECT id_a, id_b FROM cand
              WHERE inter / (n_a + n_b - inter) >= 0.2
            ),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM sim
              UNION ALL
              SELECT id_b, id_a FROM sim
            ),
            reach(u, lbl) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM edges)
              UNION
              SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.u
            ),
            clus AS (
              SELECT u AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY u
            ),
            m AS (
              SELECT c.cluster_id, c.doc_id, d.n_chars
              FROM clus c JOIN reps d ON c.doc_id = d.doc_id
            ),
            agg AS (
              SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
                CAST(sum(n_chars) AS BIGINT) AS total_chars,
                max(n_chars) AS ml
              FROM m GROUP BY cluster_id
            ),
            can AS (
              SELECT m.cluster_id, min(m.doc_id) AS canonical_doc_id
              FROM m JOIN agg a
                ON m.cluster_id = a.cluster_id AND m.n_chars = a.ml
              GROUP BY m.cluster_id
            )
            SELECT a.cluster_id, a.n_members, a.total_chars, c.canonical_doc_id
            FROM agg a JOIN can c ON a.cluster_id = c.cluster_id
        """,
        "q154_bpe_pairs": r"""
            WITH w AS (
              SELECT unnest(list_filter(
                string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS w
              FROM documents
            ),
            p AS (
              SELECT substr(w, i, 2) AS pair
              FROM w, unnest(generate_series(1, length(w) - 1)) AS t(i)
              WHERE length(w) >= 2
            )
            SELECT pair, CAST(count(*) AS BIGINT) AS n
            FROM p GROUP BY pair HAVING count(*) >= 50
        """,
        "q155_lm_coverage": r"""
            WITH toks AS (
              SELECT doc_id,
                list_filter(string_split_regex(trim(lower(text)), '\s+'),
                            x -> x <> '') AS t
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                list_transform(generate_series(1, len(t) - 2),
                  i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])) AS grams
              FROM toks WHERE len(t) >= 3
            ),
            eg AS (
              SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 2 = 1
            ),
            tr AS (
              SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 2 = 0
            )
            SELECT e.doc_id,
              CAST(count(*) AS BIGINT) AS n_grams,
              CAST(sum(CASE WHEN t.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_seen,
              CAST(sum(CASE WHEN t.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(count(*) AS DOUBLE) AS coverage
            FROM eg e LEFT JOIN tr t ON e.gram = t.gram
            GROUP BY e.doc_id
        """,
        "q156_bfill": """
            SELECT event_id, user_id, ts,
              first_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS value
            FROM events
        """,
        "q157_centroid_sim": """
            WITH c AS (
              SELECT label, i AS dim,
                sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,8))) AS s
              FROM embeddings,
                unnest(generate_series(1, len(embedding))) AS t(i)
              GROUP BY label, i
            ),
            v AS (
              SELECT label, list(CAST(s AS DOUBLE) ORDER BY dim) AS vec
              FROM c GROUP BY label
            )
            SELECT a.label AS label_a, b.label AS label_b,
              list_dot_product(a.vec, b.vec)
                / (sqrt(list_dot_product(a.vec, a.vec))
                   * sqrt(list_dot_product(b.vec, b.vec))) AS cosine
            FROM v a JOIN v b ON a.label < b.label
        """,
        "q158_seasonal_mase": """
            WITH daily AS (
              SELECT o_orderpriority, o_orderdate AS day,
                CAST(count(*) AS BIGINT) AS x
              FROM orders GROUP BY 1, 2
            ),
            d AS (
              SELECT o_orderpriority,
                x - lag(x, 1) OVER w AS d1,
                x - lag(x, 7) OVER w AS d7
              FROM daily
              WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day)
            ),
            a AS (
              SELECT o_orderpriority,
                CAST(count(*) AS BIGINT) AS n_eval,
                CAST(sum(abs(d1)) AS BIGINT) AS abs_err_naive,
                CAST(sum(abs(d7)) AS BIGINT) AS abs_err_seasonal
              FROM d WHERE d7 IS NOT NULL GROUP BY 1
            )
            SELECT o_orderpriority, n_eval, abs_err_seasonal, abs_err_naive,
              CAST(abs_err_seasonal AS DOUBLE) / CAST(abs_err_naive AS DOUBLE)
                AS mase
            FROM a
        """,
        "q159_frame_stats": """
            WITH f AS (
              SELECT doc_id, text, k
              FROM documents,
                unnest(generate_series(0, 7)) AS t(k)
              WHERE k * 16 < len(text)
            ),
            s AS (
              SELECT doc_id, CAST(k * 16 AS BIGINT) AS frame_number,
                substr(text, k * 16 + 1, 12) AS fr
              FROM f
            )
            SELECT doc_id, frame_number,
              CAST(length(fr) AS BIGINT) AS f_bytes,
              CAST(coalesce(list_sum(list_transform(
                generate_series(1, length(fr)), i -> ord(fr[i]))), 0) AS BIGINT)
                AS byte_sum,
              CAST(ord(fr[1]) AS BIGINT) AS first_byte
            FROM s
        """,
        "q160_tfidf_pairs": r"""
            WITH reps AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
            ),
            toks AS (
              SELECT doc_id AS id,
                unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                   x -> x <> '')) AS term
              FROM reps
            ),
            tf AS (
              SELECT id, term, CAST(count(*) AS BIGINT) AS tf
              FROM toks GROUP BY 1, 2
            ),
            dfreq AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df,
                CAST(((SELECT CAST(count(*) AS DOUBLE) FROM reps)
                      - CAST(count(*) AS DOUBLE) + 0.5E0)
                     / (CAST(count(*) AS DOUBLE) + 0.5E0)
                     AS DECIMAL(15,6)) AS idf
              FROM tf GROUP BY term
            ),
            weighted AS (
              SELECT t.id, t.term,
                CAST(CAST(t.tf AS DECIMAL(9,0)) * d.idf AS DECIMAL(18,6)) AS w
              FROM tf t JOIN dfreq d ON t.term = d.term
            ),
            norms AS (
              SELECT id, sum(CAST(w * w AS DECIMAL(38,12))) AS n2
              FROM weighted GROUP BY id
            ),
            dots AS (
              SELECT a.id AS id_a, b.id AS id_b,
                sum(CAST(a.w * b.w AS DECIMAL(38,12))) AS dot
              FROM weighted a JOIN weighted b
                ON a.term = b.term AND a.id < b.id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
              CAST(dot AS DOUBLE)
                / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
                AS cosine
            FROM dots
            JOIN norms na ON dots.id_a = na.id
            JOIN norms nb ON dots.id_b = nb.id
            WHERE CAST(dot AS DOUBLE)
                / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
                >= 0.9
        """,
        "q161_session_paths": """
            WITH flagged AS (
              SELECT user_id, ts, event_id, event_type,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                     THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            sess AS (
              SELECT user_id, ts, event_id, event_type,
                CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS session_seq
              FROM flagged
            ),
            per AS (
              SELECT user_id, session_seq,
                array_to_string(
                  list_transform(
                    list_sort(list(struct_pack(ts := ts, event_id := event_id,
                                               event_type := event_type)))[1:3],
                    x -> x.event_type), '>') AS path
              FROM sess GROUP BY user_id, session_seq
            )
            SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
            FROM per GROUP BY path HAVING count(*) >= 5
        """,
        "q162_length_packing": r"""
            WITH base AS (
              SELECT doc_id,
                CAST(coalesce(list_aggregate(
                  list_transform(
                    list_filter(string_split_regex(trim(text), '\s+'),
                                x -> x <> ''),
                    w -> CAST(ceil(len(w) / 4.0) AS INT)), 'sum'), 0) AS BIGINT)
                  AS n_tok
              FROM documents
            ),
            r AS (
              SELECT doc_id, n_tok, n_tok // 64 AS bucket,
                row_number() OVER (PARTITION BY n_tok // 64
                                   ORDER BY n_tok, doc_id) AS rn
              FROM base
            )
            SELECT CAST(bucket AS BIGINT) AS bucket,
              CAST((rn - 1) // 16 AS BIGINT) AS batch_id,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
              max(n_tok) AS max_tokens
            FROM r GROUP BY 1, 2
        """,
        "q163_entity_cooccurrence": r"""
            WITH ents AS (
              SELECT DISTINCT doc_id, w AS ent
              FROM (
                SELECT doc_id,
                  unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                     x -> x <> '')) AS w
                FROM documents
              )
              WHERE length(w) >= 6
            )
            SELECT a.ent AS ent_a, b.ent AS ent_b,
              CAST(count(*) AS BIGINT) AS n_docs
            FROM ents a JOIN ents b
              ON a.doc_id = b.doc_id AND a.ent < b.ent
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "q164_hamming_embedding": """
            WITH p AS (
              SELECT vec_id,
                CAST(coalesce(list_sum(list_transform(generate_series(1, 48),
                  i -> CASE WHEN embedding[i] > 0
                            THEN (CAST(1 AS BIGINT) << (48 - i))
                            ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS bits
              FROM embeddings WHERE vec_id < 200
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              CAST(bit_count(xor(a.bits, b.bits)) AS INT) AS hamming
            FROM p a JOIN p b ON a.vec_id < b.vec_id
            WHERE bit_count(xor(a.bits, b.bits)) <= 16
        """,
        "q165_funnel_strict": """
            WITH s1 AS (
              SELECT user_id, min(ts) AS t_view
              FROM events WHERE event_type = 'view' GROUP BY 1
            ),
            s2 AS (
              SELECT s1.user_id, s1.t_view, min(e.ts) AS t_click
              FROM s1 LEFT JOIN events e
                ON e.user_id = s1.user_id AND e.event_type = 'click'
                AND epoch(e.ts) > epoch(s1.t_view)
                AND epoch(e.ts) <= epoch(s1.t_view) + 3600.0
              GROUP BY 1, 2
            ),
            s3 AS (
              SELECT s2.user_id, s2.t_view, s2.t_click, min(e.ts) AS t_purchase
              FROM s2 LEFT JOIN events e
                ON e.user_id = s2.user_id AND e.event_type = 'purchase'
                AND epoch(e.ts) > epoch(s2.t_click)
                AND epoch(e.ts) <= epoch(s2.t_click) + 3600.0
              GROUP BY 1, 2, 3
            )
            SELECT user_id AS "user", t_view, t_click, t_purchase FROM s3
        """,
        "q166_lsh_quality": (
            "WITH mh AS (" + _minhash_sql() + r"""),
            ex AS (
              WITH reps2 AS (
                SELECT doc_id, text FROM documents
                WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
              ),
              toks2 AS (
                SELECT doc_id AS id,
                  list_distinct(
                    list_transform(
                      generate_series(1, greatest(len(t) - 1, 0)),
                      i -> array_to_string(t[i:i+1], ' ')
                    )
                  ) AS tok
                FROM (
                  SELECT doc_id,
                    list_filter(string_split_regex(trim(text), '\s+'),
                                x -> x <> '') AS t
                  FROM reps2
                )
              ),
              inv2 AS (
                SELECT id, len(tok) AS n_tok, unnest(tok) AS token FROM toks2
              ),
              pairs2 AS (
                SELECT a.id AS id_a, b.id AS id_b, a.n_tok AS n_a,
                       b.n_tok AS n_b, count(*) AS inter
                FROM inv2 a JOIN inv2 b
                  ON a.token = b.token AND a.id < b.id
                GROUP BY 1, 2, 3, 4
              )
              SELECT id_a, id_b FROM pairs2
              WHERE inter / (n_a + n_b - inter) >= 0.35
            ),
            hits AS (
              SELECT ex.id_a FROM ex
              JOIN mh ON ex.id_a = mh.id_a AND ex.id_b = mh.id_b
            )
            SELECT
              (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_exact,
              (SELECT CAST(count(*) AS BIGINT) FROM mh) AS n_lsh,
              (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hit,
              (SELECT CAST(count(*) AS DOUBLE) FROM hits)
                / (SELECT CAST(count(*) AS DOUBLE) FROM ex) AS recall
        """
        ),
        "q167_equi_depth": """
            WITH d AS (
              SELECT CAST(ntile(10) OVER (
                  ORDER BY o_totalprice, o_orderkey) AS INT) AS decile,
                CAST(o_totalprice AS DECIMAL(18,2)) AS p
              FROM orders
            )
            SELECT decile, CAST(count(*) AS BIGINT) AS n,
              CAST(min(p) AS DOUBLE) AS lo,
              CAST(max(p) AS DOUBLE) AS hi
            FROM d GROUP BY decile
        """,
        "q168_seasonal_anomaly": f"""
            WITH keyed AS (
              SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow,
                CAST(hour(ts) AS INT) AS hod, value
              FROM events
            ),
            prof AS (
              SELECT event_type, dow, hod, {_davg_sql('value')} AS mu
              FROM keyed GROUP BY 1, 2, 3
            ),
            j AS (
              SELECT k.event_type, k.value, p.mu
              FROM keyed k JOIN prof p
                USING (event_type, dow, hod)
            )
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(CASE WHEN value > 2.0E0 * mu THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_anom,
              CAST(sum(CASE WHEN value > 2.0E0 * mu THEN 1 ELSE 0 END)
                   AS DOUBLE) / CAST(count(*) AS DOUBLE) AS anom_share
            FROM j GROUP BY event_type
        """,
        "q125_ab_test": """
            WITH per_user AS (
              SELECT user_id,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS converted,
                CASE WHEN substr(md5('exp1' || CAST(user_id AS VARCHAR)), 1, 8)
                          < '80000000'
                     THEN 'a' ELSE 'b' END AS arm
              FROM events GROUP BY user_id
            ),
            agg AS (
              SELECT
                CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                CAST(sum(CASE WHEN arm = 'a' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
                CAST(sum(CASE WHEN arm = 'b' THEN converted ELSE 0 END) AS BIGINT) AS conv_b
              FROM per_user
            ),
            calc AS (
              SELECT n_a, n_b, conv_a, conv_b,
                CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
                CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
                sqrt(
                  (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
                ) AS se
              FROM agg
            )
            SELECT n_a, n_b, conv_a, conv_b,
              CASE WHEN n_a > 0 THEN pa END AS p_a,
              CASE WHEN n_b > 0 THEN pb END AS p_b,
              CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
                   THEN (pa - pb) / se END AS z
            FROM calc
        """,
        "q126_stock_balance": """
            WITH d AS (
              SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
                CAST(CASE WHEN l_returnflag = 'R' THEN -l_quantity
                          ELSE l_quantity END AS DECIMAL(18,2)) AS x
              FROM lineitem
            ),
            s AS (
              SELECT l_partkey, l_orderkey, l_linenumber,
                sum(x) OVER (
                  PARTITION BY l_partkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sx,
                l_shipdate
              FROM d
            ),
            m AS (
              SELECT l_partkey, l_orderkey, l_linenumber, sx,
                min(sx) OVER (
                  PARTITION BY l_partkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
              FROM s
            )
            SELECT l_partkey, l_orderkey, l_linenumber,
              CAST(sx - least(CAST(0 AS DECIMAL(18,2)), mn) AS DOUBLE)
                AS balance
            FROM m
        """,
        "q127_market_basket": """
            WITH bi AS (
              SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
              FROM lineitem
            ),
            nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n FROM bi),
            pairs AS (
              SELECT a.item AS item_a, b.item AS item_b,
                CAST(count(*) AS BIGINT) AS n_pair
              FROM bi a JOIN bi b
                ON a.basket = b.basket AND a.item < b.item
              GROUP BY a.item, b.item
              HAVING count(*) >= 2
            ),
            items AS (
              SELECT item, CAST(count(*) AS BIGINT) AS n_i FROM bi GROUP BY item
            )
            SELECT p.item_a, p.item_b, p.n_pair,
              ia.n_i AS n_a, ib.n_i AS n_b,
              CAST(p.n_pair AS DOUBLE) / CAST(nb.n AS DOUBLE) AS support,
              CAST(p.n_pair AS DOUBLE) / CAST(ia.n_i AS DOUBLE) AS confidence,
              CAST(nb.n * p.n_pair AS DOUBLE)
                / CAST(ia.n_i * ib.n_i AS DOUBLE) AS lift
            FROM pairs p
            JOIN items ia ON p.item_a = ia.item
            JOIN items ib ON p.item_b = ib.item, nb
        """,
        "q128_rfm": """
            WITH per_cust AS (
              SELECT o_custkey,
                max(CAST(o_orderdate AS DATE)) AS last_day,
                CAST(count(*) AS BIGINT) AS frequency,
                sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
              FROM orders GROUP BY o_custkey
            ),
            r AS (
              SELECT o_custkey, frequency, mon,
                CAST(date_diff('day', last_day, max(last_day) OVER ()) AS INT)
                  AS recency_days
              FROM per_cust
            ),
            scored AS (
              SELECT o_custkey, recency_days, frequency,
                CAST(mon AS DOUBLE) AS monetary,
                CAST(ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC)
                     AS INT) AS r_score,
                CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC)
                     AS INT) AS f_score,
                CAST(ntile(5) OVER (ORDER BY mon DESC, o_custkey ASC)
                     AS INT) AS m_score
              FROM r
            )
            SELECT o_custkey, recency_days, frequency, monetary,
              r_score, f_score, m_score,
              CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm
            FROM scored
        """,
        "q129_mom_growth": """
            WITH monthly AS (
              SELECT o_orderpriority,
                date_trunc('month', o_orderdate) AS month,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue,
                CAST(count(*) AS BIGINT) AS n_orders
              FROM orders GROUP BY o_orderpriority, date_trunc('month', o_orderdate)
            )
            SELECT o_orderpriority, month, n_orders, revenue,
              (revenue - lag(revenue) OVER w) / lag(revenue) OVER w
                AS mom_growth
            FROM monthly
            WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
        """,
        "q130_debounce": """
            WITH RECURSIVE base AS (
              SELECT user_id, ts,
                CAST(row_number() OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
                epoch_us(ts) AS us
              FROM events
            ),
            -- replays debounce_batch's fold: keep first, then keep iff
            -- >= cooldown since the last KEPT event, carrying last_us
            rec AS (
              SELECT user_id, ts, rn, us, us AS last_us, TRUE AS kept
              FROM base WHERE rn = 1
              UNION ALL
              SELECT b.user_id, b.ts, b.rn, b.us,
                CASE WHEN b.us - r.last_us >= 1800000000
                     THEN b.us ELSE r.last_us END,
                b.us - r.last_us >= 1800000000
              FROM rec r JOIN base b
                ON b.user_id = r.user_id AND b.rn = r.rn + 1
            )
            SELECT user_id, ts FROM rec WHERE kept
        """,
        "q132_theta_overlap": """
            WITH a AS (
              SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            ),
            b AS (
              SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
            )
            SELECT
              CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
              CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b,
              CAST((SELECT count(*) FROM (
                SELECT user_id FROM a UNION SELECT user_id FROM b)) AS BIGINT)
                AS n_union,
              CAST((SELECT count(*) FROM (
                SELECT user_id FROM a INTERSECT SELECT user_id FROM b)) AS BIGINT)
                AS n_intersect,
              CAST((SELECT count(*) FROM (
                SELECT user_id FROM a EXCEPT SELECT user_id FROM b)) AS BIGINT)
                AS n_a_only
        """,
        "q133_local_supplier_volume": """
            SELECT n_name,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                   AS DOUBLE) AS revenue,
              CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "q134_revenue_delta": """
            SELECT
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
                AS revenue_delta,
              CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND CAST(l_discount AS DECIMAL(12,2)) >= CAST('0.05' AS DECIMAL(12,2))
              AND CAST(l_discount AS DECIMAL(12,2)) <= CAST('0.07' AS DECIMAL(12,2))
              AND l_quantity < 24
        """,
        "q135_returned_items": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                   AS DOUBLE) AS revenue,
              CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
        """,
        "q136_large_orders": """
            WITH big AS (
              SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS q
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > CAST(150 AS DECIMAL(12,2))
            )
            SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
              CAST(q AS DOUBLE) AS sum_qty
            FROM orders
            JOIN big ON o_orderkey = big.l_orderkey
            JOIN customer ON o_custkey = c_custkey
        """,
        "q137_normalized_dedup": r"""
            SELECT md5(
                trim(regexp_replace(
                  translate(lower(text),
                    'àáâãäåèéêëìíîïòóôõöùúûüçñýÿ',
                    'aaaaaaeeeeiiiiooooouuuucnyy'),
                  '\s+', ' ', 'g'))
              ) AS fp,
              CAST(count(*) AS BIGINT) AS n_copies,
              min(doc_id) AS keep_doc_id
            FROM documents GROUP BY fp
        """,
        "q138_funnel_latency": """
            WITH views AS (
              SELECT user_id, min(epoch_us(ts)) AS t_view
              FROM events WHERE event_type = 'view' GROUP BY user_id
            ),
            purch AS (
              SELECT e.user_id, min(v.t_view) AS t_view,
                min(epoch_us(e.ts)) AS t_purchase
              FROM events e JOIN views v USING (user_id)
              WHERE e.event_type = 'purchase'
                AND epoch_us(e.ts) > v.t_view
              GROUP BY e.user_id
            ),
            lat AS (
              SELECT (t_purchase - t_view) // 1000000 AS latency_sec
              FROM purch
            )
            SELECT CAST(count(*) AS BIGINT) AS n_converted,
              median(CAST(latency_sec AS DOUBLE)) AS median_sec,
              quantile_cont(CAST(latency_sec AS DOUBLE), 0.9) AS p90_sec
            FROM lat
        """,
        "q140_attribution": """
            WITH purch AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ),
            touch AS (
              SELECT user_id, ts,
                max_by(event_type, event_id) AS touch_type,
                max(event_id) AS touch_id
              FROM events WHERE event_type IN ('view', 'click')
              GROUP BY user_id, ts
            ),
            j AS (
              SELECT p.event_id, p.user_id, p.ts,
                t.touch_type, t.touch_id, t.ts AS touch_ts,
                row_number() OVER (
                  PARTITION BY p.event_id ORDER BY t.ts DESC) AS rn
              FROM purch p LEFT JOIN touch t
                ON p.user_id = t.user_id
               AND t.ts <= p.ts
               AND t.ts >= p.ts - INTERVAL 1 HOUR
            )
            SELECT event_id, user_id, ts, touch_type, touch_id, touch_ts
            FROM j WHERE rn = 1
        """,
        "q141_qq_drift": """
            WITH mid AS (SELECT quantile_cont(epoch(ts), 0.5) AS m FROM events),
            h AS (
              SELECT event_type,
                CASE WHEN epoch(ts) <= mid.m THEN 'h1' ELSE 'h2' END AS half,
                value
              FROM events, mid
            ),
            p AS (
              SELECT event_type, half,
                quantile_disc(value, 0.1) AS d1,
                quantile_disc(value, 0.2) AS d2,
                quantile_disc(value, 0.3) AS d3,
                quantile_disc(value, 0.4) AS d4,
                quantile_disc(value, 0.5) AS d5,
                quantile_disc(value, 0.6) AS d6,
                quantile_disc(value, 0.7) AS d7,
                quantile_disc(value, 0.8) AS d8,
                quantile_disc(value, 0.9) AS d9
              FROM h GROUP BY event_type, half
            )
            SELECT a.event_type,
              a.d1 AS d1_h1, a.d2 AS d2_h1, a.d3 AS d3_h1, a.d4 AS d4_h1,
              a.d5 AS d5_h1, a.d6 AS d6_h1, a.d7 AS d7_h1, a.d8 AS d8_h1,
              a.d9 AS d9_h1,
              b.d1 AS d1_h2, b.d2 AS d2_h2, b.d3 AS d3_h2, b.d4 AS d4_h2,
              b.d5 AS d5_h2, b.d6 AS d6_h2, b.d7 AS d7_h2, b.d8 AS d8_h2,
              b.d9 AS d9_h2
            FROM p a JOIN p b
              ON a.event_type = b.event_type
             AND a.half = 'h1' AND b.half = 'h2'
        """,
        "q142_seasonal_profile": f"""
            SELECT event_type,
              CAST(dayofweek(ts) + 1 AS INT) AS dow,
              CAST(hour(ts) AS INT) AS hod,
              {_davg_sql('value')} AS avg_value,
              CAST(count(*) AS BIGINT) AS n
            FROM events
            GROUP BY event_type, dayofweek(ts), hour(ts)
        """,
        "q169_volume_shipping": f"""
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              CAST(year(l_shipdate) AS INT) AS l_year,
              CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND sn.n_name <> cn.n_name
            GROUP BY 1, 2, 3
        """,
        "q170_market_share": f"""
            WITH j AS (
              SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                sn.n_name AS supp_nation,
                {_REV_SQL} AS rev
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation sn ON s_nationkey = sn.n_nationkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation cn ON c_nationkey = cn.n_nationkey
              JOIN region ON cn.n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'
            ),
            per_year AS (
              SELECT o_year,
                CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev END)
                     AS DOUBLE) AS nation_rev,
                CAST(sum(rev) AS DOUBLE) AS total_rev
              FROM j GROUP BY o_year
            )
            SELECT o_year, nation_rev, total_rev,
              coalesce(nation_rev, 0.0E0) / total_rev AS mkt_share
            FROM per_year
        """,
        "q171_product_profit": f"""
            SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
              CAST(sum(CAST({_REV_SQL} AS DECIMAL(30,6))
                - CAST(CAST(p_retailprice AS DECIMAL(12,2))
                       * CAST(l_quantity AS DECIMAL(12,2))
                       * CAST(0.60 AS DECIMAL(3,2)) AS DECIMAL(30,6)))
                AS DOUBLE) AS profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            WHERE p_type = 'PROMO'
            GROUP BY 1, 2
        """,
        "q172_priority_shipping": """
            SELECT l_linestatus,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
            GROUP BY l_linestatus
        """,
        "q173_order_count_dist": """
            WITH per_cust AS (
              SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey
                AND o_orderpriority <> '4-NOT SPECIFIED'
              GROUP BY c_custkey
            )
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM per_cust GROUP BY c_count
        """,
        "q174_promo_share": f"""
            WITH agg AS (
              SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
                CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                  AS promo_rev,
                CAST(sum({_REV_SQL}) AS DOUBLE) AS total_rev
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY 1
            )
            SELECT ship_month, promo_rev, total_rev,
              (100.0E0 * promo_rev) / total_rev AS promo_share
            FROM agg
        """,
        "q175_top_supplier": f"""
            WITH rev AS (
              SELECT l_suppkey,
                CAST(sum({_REV_SQL}) AS DOUBLE) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1997-04-01'
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "q176_supplier_part_counts": """
            SELECT p_brand, p_size,
              CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36)
            GROUP BY p_brand, p_size
        """,
        "q177_small_qty_revenue": f"""
            WITH branded AS (
              SELECT l_partkey, l_quantity, l_extendedprice
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#3'
            ),
            means AS (
              SELECT l_partkey AS pk, {_davg_sql('l_quantity')} AS avg_qty
              FROM branded GROUP BY l_partkey
            )
            SELECT coalesce(
              CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE),
              0.0E0) / 7.0E0 AS avg_yearly
            FROM branded JOIN means ON l_partkey = pk
            WHERE l_quantity < 0.5E0 * avg_qty
        """,
        "q178_disjunctive_revenue": f"""
            SELECT coalesce(CAST(sum({_REV_SQL}) AS DOUBLE), 0.0E0) AS revenue,
              CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
                   AND p_size BETWEEN 1 AND 5)
               OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
                   AND p_size BETWEEN 1 AND 10)
               OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
                   AND p_size BETWEEN 1 AND 15)
        """,
        "q179_waiting_suppliers": """
            WITH per_order AS (
              SELECT l_orderkey,
                count(DISTINCT l_suppkey) AS n_supp,
                count(DISTINCT CASE WHEN l_shipdate >
                      o_orderdate + INTERVAL 60 DAY
                      THEN l_suppkey END) AS n_late,
                max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN l_suppkey END) AS late_supp
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY l_orderkey
            )
            SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM per_order JOIN supplier ON late_supp = s_suppkey
            WHERE n_supp > 1 AND n_late = 1
            GROUP BY s_suppkey, s_name
        """,
        "q180_idle_customers": f"""
            WITH avg_bal AS (
              SELECT {_davg_sql('c_acctbal')} AS a
              FROM customer WHERE c_acctbal > 0
            )
            SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
              CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                AS totacctbal
            FROM customer
            WHERE c_acctbal > (SELECT a FROM avg_bal)
              AND NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01'
              )
            GROUP BY c_nationkey
        """,
        "q181_important_parts": """
            WITH per_part AS (
              SELECT l_partkey,
                sum(CAST(CAST(p_retailprice AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(38,6)))
                  AS v
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY l_partkey
            )
            SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
            FROM per_part
            WHERE CAST(v AS DOUBLE)
              > 1.2E0 * (SELECT CAST(sum(v) AS DOUBLE) / count(*)
                         FROM per_part)
        """,
        "q182_winnowing": r"""
            WITH toks AS (
              SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'),
                            x -> x <> '') AS t
              FROM documents
            ),
            pos AS (
              SELECT doc_id, t, greatest(len(t) - 2, 0) AS n_grams,
                unnest(generate_series(0, greatest(len(t) - 2, 0) - 1)) AS p
              FROM toks
            ),
            g AS (
              SELECT doc_id, n_grams, p,
                CAST(('0x' || substr(md5(
                    array_to_string(t[p+1:p+3], ' ')), 1, 12)) AS BIGINT)
                  % 2147483647 AS gid
              FROM pos
            ),
            win AS (
              SELECT doc_id, n_grams, p,
                min(gid) OVER (PARTITION BY doc_id ORDER BY p
                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
              FROM g
            ),
            sel AS (
              SELECT * FROM win WHERE p <= n_grams - 4 OR p = 0
            ),
            agg AS (
              SELECT doc_id, max(n_grams) AS n_grams,
                CAST(count(DISTINCT fp) AS BIGINT) AS nf
              FROM sel GROUP BY doc_id
            )
            SELECT tk.doc_id AS id,
              CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
              coalesce(a.nf, 0) AS n_fingerprints
            FROM toks tk LEFT JOIN agg a ON tk.doc_id = a.doc_id
        """,
        "q183_chunk_dup": r"""
            WITH toks AS (
              SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'),
                            x -> x <> '') AS t
              FROM documents
            ),
            pos AS (
              SELECT doc_id, t,
                unnest(generate_series(0, len(t) - 1, 8)) AS s
              FROM toks WHERE len(t) > 0
            ),
            chunks AS (
              SELECT doc_id,
                CAST(('0x' || substr(md5(
                    array_to_string(t[s+1:s+8], ' ')), 1, 12)) AS BIGINT)
                  % 2147483647 AS gram
              FROM pos
            ),
            docfreq AS (
              SELECT gram, count(DISTINCT doc_id) AS df
              FROM (SELECT DISTINCT doc_id, gram FROM chunks)
              GROUP BY gram
            )
            SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_chunks,
              CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_dup_chunks,
              CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(count(*) AS DOUBLE) AS dup_share
            FROM chunks JOIN docfreq USING (gram)
            GROUP BY doc_id
        """,
        "q184_token_budget": r"""
            WITH base AS (
              SELECT doc_id AS id,
                CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '')) AS BIGINT) AS n_tokens,
                n_chars
              FROM documents
            ),
            run AS (
              SELECT id, n_tokens, n_chars,
                sum(n_tokens) OVER (ORDER BY n_chars DESC, id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cum_tokens
              FROM base
            )
            SELECT id, n_tokens, n_chars, cum_tokens
            FROM run WHERE cum_tokens <= 20000
        """,
        "q185_mixture_weights": r"""
            WITH g AS (
              SELECT lang,
                sum(CAST(len(list_filter(
                    string_split_regex(trim(text), '\s+'),
                    x -> x <> '')) AS BIGINT)) AS tokens
              FROM documents GROUP BY lang
            ),
            tot AS (
              SELECT CAST(sum(tokens) AS BIGINT) AS total,
                CAST(count(*) AS BIGINT) AS n_groups
              FROM g
            )
            SELECT lang, CAST(tokens AS BIGINT) AS tokens,
              CAST(tokens AS DOUBLE) / CAST(total AS DOUBLE) AS token_share,
              CAST(total AS DOUBLE) / CAST(n_groups * tokens AS DOUBLE)
                AS weight
            FROM g, tot
        """,
        "q186_burst_users": """
            WITH e AS (
              SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep
              FROM events
            ),
            c AS (
              SELECT user_id,
                count(*) OVER (PARTITION BY user_id ORDER BY ep
                  RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW) AS burst
              FROM e
            )
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
              CAST(max(burst) AS BIGINT) AS max_burst
            FROM c GROUP BY user_id
            HAVING max(burst) >= 8
        """,
        "q187_event_peaks": """
            WITH hourly AS (
              SELECT event_type, date_trunc('hour', ts) AS bucket,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            flagged AS (
              SELECT event_type, bucket, n,
                lag(n, 1) OVER w AS prev_n,
                lead(n, 1) OVER w AS next_n
              FROM hourly
              WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
            )
            SELECT event_type, bucket, n, prev_n, next_n
            FROM flagged
            WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
              AND n > prev_n AND n > next_n
        """,
        "q188_lag_corr": """
            WITH hourly AS (
              SELECT event_type,
                CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ep,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            bx AS (
              SELECT h.n AS y, l.lag, h.ep - l.lag * 3600 AS ats
              FROM hourly h,
                (SELECT unnest(generate_series(0, 6)) AS lag) l
              WHERE h.event_type = 'purchase'
            ),
            pairs AS (
              SELECT bx.lag, a.n AS x, bx.y
              FROM hourly a JOIN bx ON a.ep = bx.ats
              WHERE a.event_type = 'click'
            ),
            ints AS (
              SELECT lag, CAST(x AS DECIMAL(19,0)) AS xi,
                CAST(y AS DECIMAL(19,0)) AS yi
              FROM pairs
            ),
            s AS (
              SELECT lag, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(yi AS DECIMAL(38,0))) AS sy,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx,
                sum(CAST(yi * yi AS DECIMAL(38,0))) AS syy,
                sum(CAST(xi * yi AS DECIMAL(38,0))) AS sxy
              FROM ints GROUP BY lag
            ),
            e AS (
              SELECT lag, n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxy AS DECIMAL(24,0)) AS DECIMAL(36,0))
                     - CAST(CAST(sx AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0)) AS DECIMAL(36,0)) AS DOUBLE) AS cov_n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(24,0)) AS DECIMAL(36,0))
                     - CAST(CAST(sx AS DECIMAL(18,0)) * CAST(sx AS DECIMAL(18,0)) AS DECIMAL(36,0)) AS DOUBLE) AS var_x,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(syy AS DECIMAL(24,0)) AS DECIMAL(36,0))
                     - CAST(CAST(sy AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0)) AS DECIMAL(36,0)) AS DOUBLE) AS var_y
              FROM s
            )
            SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n,
              CASE WHEN sqrt(var_x) * sqrt(var_y) > 0
                   THEN cov_n / (sqrt(var_x) * sqrt(var_y)) END AS corr
            FROM e
        """,
        "q191_mann_kendall": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS v
              FROM events GROUP BY 1, 2
            ),
            pairs AS (
              SELECT a.event_type,
                CASE WHEN b.v > a.v THEN 1
                     WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn
              FROM daily a JOIN daily b
                ON a.event_type = b.event_type AND a.d < b.d
            ),
            s AS (
              SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s
              FROM pairs GROUP BY event_type
            ),
            n AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n
              FROM daily GROUP BY event_type
            )
            SELECT n.event_type, n, coalesce(s, 0) AS s,
              CASE WHEN n >= 2 THEN
                (2.0E0 * CAST(coalesce(s, 0) AS DOUBLE))
                  / CAST(n * (n - 1) AS DOUBLE)
              END AS tau
            FROM n LEFT JOIN s ON n.event_type = s.event_type
        """,
        "q192_theil_sen": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS v
              FROM events GROUP BY 1, 2
            ),
            pairs AS (
              SELECT a.event_type,
                CAST(b.v - a.v AS DOUBLE)
                  / CAST(CAST(floor(epoch(b.d)) AS BIGINT)
                         - CAST(floor(epoch(a.d)) AS BIGINT) AS DOUBLE)
                  AS s
              FROM daily a JOIN daily b
                ON a.event_type = b.event_type AND a.d < b.d
            ),
            agg AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
                list_sort(list(s)) AS sorted
              FROM pairs GROUP BY event_type
            )
            SELECT event_type, n_pairs,
              CASE WHEN n_pairs % 2 = 1
                THEN sorted[CAST(trunc((n_pairs + 1) / 2.0) AS INT)]
                ELSE (sorted[CAST(trunc(n_pairs / 2.0) AS INT)]
                      + sorted[CAST(trunc(n_pairs / 2.0) AS INT) + 1]) / 2.0E0
              END AS slope
            FROM agg
        """,
        "q193_pattern_match": """
            WITH days AS (
              SELECT user_id, date_trunc('day', ts) AS d,
                string_agg(substr(event_type, 1, 1), ''
                  ORDER BY ts, event_id) AS journey
              FROM events GROUP BY 1, 2
            )
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(CASE WHEN regexp_matches(journey, 'v.*p')
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
            FROM days GROUP BY user_id
        """,
        "q194_group_skewness": """
            WITH ints AS (
              SELECT event_type,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS xi
              FROM events WHERE value IS NOT NULL
            ),
            s AS (
              SELECT event_type, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS s1,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS s2,
                sum(CAST(CAST(xi AS DECIMAL(8,0)) * CAST(xi AS DECIMAL(8,0))
                    * CAST(xi AS DECIMAL(8,0)) AS DECIMAL(38,0))) AS s3
              FROM ints GROUP BY event_type
            ),
            e AS (
              -- every multiply keeps one operand width >= 19 so DuckDB
              -- takes the int128 path (two narrow operands can route a
              -- >int64 product through int64 and overflow)
              SELECT event_type, n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(s2 AS DECIMAL(25,0))
                       AS DECIMAL(37,0))
                  - CAST(CAST(s1 AS DECIMAL(19,0)) * CAST(s1 AS DECIMAL(19,0))
                       AS DECIMAL(37,0)) AS DOUBLE) AS m2,
                CAST(
                  CAST(
                    CAST(CAST(CAST(CAST(n AS DECIMAL(19,0))
                         * CAST(n AS DECIMAL(19,0)) AS DECIMAL(14,0))
                         AS DECIMAL(14,0)) * CAST(s3 AS DECIMAL(24,0))
                         AS DECIMAL(37,0))
                    - CAST(CAST(CAST(CAST(3 * n AS DECIMAL(19,0))
                           * CAST(s1 AS DECIMAL(19,0)) AS DECIMAL(18,0))
                           AS DECIMAL(18,0))
                           * CAST(s2 AS DECIMAL(19,0)) AS DECIMAL(37,0))
                    AS DECIMAL(37,0))
                  + CAST(CAST(2 AS DECIMAL(3,0))
                    * CAST(CAST(CAST(s1 AS DECIMAL(19,0))
                           * CAST(s1 AS DECIMAL(19,0)) AS DECIMAL(23,0))
                           * CAST(s1 AS DECIMAL(15,0)) AS DECIMAL(35,0))
                    AS DECIMAL(37,0))
                AS DOUBLE) AS m3
              FROM s
            )
            SELECT event_type, CAST(n AS BIGINT) AS n,
              CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) END AS skewness
            FROM e
        """,
        "q195_phrase_search": r"""
            WITH toks AS (
              SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'),
                            x -> x <> '') AS t
              FROM documents
            )
            SELECT doc_id, n_occurrences FROM (
              SELECT doc_id,
                CAST(len(list_filter(generate_series(1, len(t) - 1),
                  i -> t[i] = 'data' AND t[i+1] = 'stream')) AS INT)
                  AS n_occurrences
              FROM toks
              WHERE len(t) >= 2
            ) WHERE n_occurrences >= 1
        """,
        "q196_fpgrowth_pairs": """
            WITH baskets AS (
              SELECT DISTINCT l_orderkey, p_brand
              FROM lineitem JOIN part ON l_partkey = p_partkey
            ),
            minc AS (
              SELECT CAST(ceil(0.02E0 * count(DISTINCT l_orderkey)) AS BIGINT)
                AS m
              FROM baskets
            ),
            singles AS (
              SELECT p_brand AS itemset, 1 AS size,
                CAST(count(*) AS BIGINT) AS freq
              FROM baskets GROUP BY p_brand
            ),
            pairs AS (
              SELECT a.p_brand || '|' || b.p_brand AS itemset, 2 AS size,
                CAST(count(*) AS BIGINT) AS freq
              FROM baskets a JOIN baskets b
                ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
              GROUP BY 1
            )
            SELECT itemset, CAST(size AS INT) AS size, freq
            FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairs)
            WHERE freq >= (SELECT m FROM minc)
        """,
        "q198_moment_rollup": """
            WITH ints AS (
              SELECT event_type,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS xi
              FROM events WHERE value IS NOT NULL
            ),
            s AS (
              SELECT event_type, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS s1,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS s2
              FROM ints GROUP BY event_type
            ),
            e AS (
              SELECT event_type, n,
                CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0E0 AS mean,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(s2 AS DECIMAL(25,0))
                       AS DECIMAL(37,0))
                  - CAST(CAST(s1 AS DECIMAL(19,0)) * CAST(s1 AS DECIMAL(19,0))
                       AS DECIMAL(37,0)) AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 10000.0E0
                  AS variance
              FROM s
            )
            SELECT event_type, CAST(n AS BIGINT) AS n, mean, variance,
              sqrt(variance) AS stddev
            FROM e
        """,
        "q199_ks_test": """
            WITH base AS (
              SELECT value AS v,
                CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
              FROM events
              WHERE event_type IN ('click', 'error') AND value IS NOT NULL
            ),
            per_v AS (
              SELECT v, CAST(sum(a) AS BIGINT) AS ca,
                CAST(sum(1 - a) AS BIGINT) AS cb
              FROM base GROUP BY v
            ),
            pref AS (
              SELECT
                sum(ca) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pa,
                sum(cb) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb
              FROM per_v
            ),
            totals AS (
              SELECT CAST(max(pa) AS BIGINT) AS n_a,
                CAST(max(pb) AS BIGINT) AS n_b
              FROM pref
            )
            SELECT n_a, n_b,
              CAST(max(abs(pa * n_b - pb * n_a)) AS DOUBLE)
                / CAST(n_a * n_b AS DOUBLE) AS d
            FROM pref, totals
            GROUP BY n_a, n_b
        """,
        "q200_auc": """
            WITH per_user AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS s,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS label
              FROM events GROUP BY user_id
            ),
            per_s AS (
              SELECT s, CAST(sum(label) AS BIGINT) AS np,
                CAST(count(*) AS BIGINT) AS nt
              FROM per_user GROUP BY s
            ),
            ranked AS (
              SELECT np, nt,
                coalesce(sum(nt) OVER (ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS prev
              FROM per_s
            ),
            agg AS (
              SELECT CAST(sum(np) AS BIGINT) AS n_pos,
                CAST(sum(nt) - sum(np) AS BIGINT) AS n_neg,
                CAST(sum(np * (2 * prev + nt + 1)) AS BIGINT) AS r2
              FROM ranked
            )
            SELECT n_pos, n_neg,
              CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
                  / (2.0E0 * CAST(n_pos * n_neg AS DOUBLE))
              END AS auc
            FROM agg
        """,
        "q201_open_orders": """
            WITH closed AS (
              SELECT l_orderkey, max(l_shipdate) AS close_ts
              FROM lineitem GROUP BY l_orderkey
            ),
            spans AS (
              SELECT o_orderdate, close_ts
              FROM orders JOIN closed ON o_orderkey = l_orderkey
            ),
            deltas AS (
              SELECT date_trunc('day', o_orderdate) AS d, 1 AS delta
              FROM spans
              UNION ALL
              SELECT CAST(CAST(close_ts AS DATE) + INTERVAL 1 DAY
                     AS TIMESTAMP), -1
              FROM spans
            ),
            per_day AS (
              SELECT d, CAST(sum(delta) AS BIGINT) AS net
              FROM deltas GROUP BY d
            )
            SELECT d, net,
              CAST(sum(net) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS open_orders
            FROM per_day
        """,
        "q202_new_vs_returning": """
            WITH first_seen AS (
              SELECT o_custkey,
                date_trunc('month', min(o_orderdate)) AS first_month
              FROM orders GROUP BY o_custkey
            ),
            monthly AS (
              SELECT DISTINCT o_custkey,
                date_trunc('month', o_orderdate) AS m
              FROM orders
            )
            SELECT m,
              CAST(sum(CASE WHEN m = first_month THEN 1 ELSE 0 END)
                AS BIGINT) AS new_customers,
              CAST(sum(CASE WHEN m = first_month THEN 0 ELSE 1 END)
                AS BIGINT) AS returning_customers
            FROM monthly JOIN first_seen USING (o_custkey)
            GROUP BY m
        """,
        "q203_seasonal_strength": """
            WITH ints AS (
              SELECT event_type, dayofweek(ts) AS dow, hour(ts) AS hod,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS xi
              FROM events WHERE value IS NOT NULL AND value >= 0
            ),
            cells AS (
              SELECT event_type, dow, hod, count(*) AS cn,
                sum(CAST(xi AS DECIMAL(38,0))) AS cs1,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS cs2
              FROM ints GROUP BY 1, 2, 3
            ),
            cellr AS (
              SELECT event_type, cn, cs1, cs2,
                (CAST(cs1 AS BIGINT) * 1000000) // cn AS mu
              FROM cells
            ),
            per_type AS (
              SELECT event_type,
                CAST(sum(cn) AS BIGINT) AS n,
                sum(cs1) AS s1,
                sum(cs2) AS s2,
                sum(CAST(
                  CAST(cs2 * CAST(1000000000000 AS DECIMAL(13,0))
                       AS DECIMAL(38,0))
                  - CAST(CAST(2 AS DECIMAL(2,0)) * CAST(mu AS DECIMAL(19,0))
                      * CAST(CAST(cs1 AS DECIMAL(20,0))
                             * CAST(1000000 AS DECIMAL(7,0))
                             AS DECIMAL(27,0)) AS DECIMAL(38,0))
                  + CAST(CAST(cn AS DECIMAL(12,0))
                      * CAST(CAST(mu AS DECIMAL(19,0))
                             * CAST(mu AS DECIMAL(19,0)) AS DECIMAL(25,0))
                      AS DECIMAL(38,0))
                AS DECIMAL(38,0))) AS ssr_s
              FROM cellr GROUP BY event_type
            ),
            final AS (
              SELECT event_type, n, ssr_s,
                (CAST(s1 AS BIGINT) * 1000000) // n AS mug, s1, s2
              FROM per_type
            )
            SELECT event_type, n,
              CASE WHEN CAST(
                  CAST(s2 * CAST(1000000000000 AS DECIMAL(13,0))
                       AS DECIMAL(38,0))
                  - CAST(CAST(2 AS DECIMAL(2,0)) * CAST(mug AS DECIMAL(19,0))
                      * CAST(CAST(s1 AS DECIMAL(20,0))
                             * CAST(1000000 AS DECIMAL(7,0))
                             AS DECIMAL(27,0)) AS DECIMAL(38,0))
                  + CAST(CAST(n AS DECIMAL(12,0))
                      * CAST(CAST(mug AS DECIMAL(19,0))
                             * CAST(mug AS DECIMAL(19,0)) AS DECIMAL(25,0))
                      AS DECIMAL(38,0)) AS DOUBLE) > 0
              THEN greatest(0.0E0, 1.0E0 - CAST(ssr_s AS DOUBLE) / CAST(
                  CAST(s2 * CAST(1000000000000 AS DECIMAL(13,0))
                       AS DECIMAL(38,0))
                  - CAST(CAST(2 AS DECIMAL(2,0)) * CAST(mug AS DECIMAL(19,0))
                      * CAST(CAST(s1 AS DECIMAL(20,0))
                             * CAST(1000000 AS DECIMAL(7,0))
                             AS DECIMAL(27,0)) AS DECIMAL(38,0))
                  + CAST(CAST(n AS DECIMAL(12,0))
                      * CAST(CAST(mug AS DECIMAL(19,0))
                             * CAST(mug AS DECIMAL(19,0)) AS DECIMAL(25,0))
                      AS DECIMAL(38,0)) AS DOUBLE))
              END AS seasonal_strength
            FROM final
        """,
        "q204_link_prediction": """
            WITH ob AS (
              SELECT DISTINCT l_orderkey AS o, p_brand AS b
              FROM lineitem JOIN part ON l_partkey = p_partkey
            ),
            e AS (
              SELECT DISTINCT x.b AS a, y.b AS b
              FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b
            ),
            sym AS (
              SELECT a, b FROM e UNION ALL SELECT b, a FROM e
            ),
            deg AS (
              SELECT a, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY a
            ),
            common AS (
              SELECT x.a AS u, y.a AS v, CAST(count(*) AS BIGINT) AS common
              FROM sym x JOIN sym y ON x.b = y.b AND x.a < y.a
              GROUP BY 1, 2
            )
            SELECT u, v, common,
              CAST(common AS DOUBLE)
                / CAST(du.d + dv.d - common AS DOUBLE) AS jaccard
            FROM common
            JOIN deg du ON u = du.a
            JOIN deg dv ON v = dv.a
            WHERE common >= 3
        """,
        "q205_share_of_parent": f"""
            WITH agg AS (
              SELECT r_name, n_name, sum({_REV_SQL}) AS rev
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name
            )
            SELECT r_name, n_name, CAST(rev AS DOUBLE) AS revenue,
              CAST(rev AS DOUBLE)
                / CAST(sum(rev) OVER (PARTITION BY r_name) AS DOUBLE)
                AS region_share
            FROM agg
        """,
        "q206_pseudonymize": """
            SELECT
              sha256('pepper-v1:' || CAST(c_custkey AS VARCHAR))
                AS cust_token,
              c_mktsegment, c_nationkey,
              c_acctbal >= 0 AS in_good_standing
            FROM customer
        """,
        "q207_record_linkage": """
            WITH dirty AS (
              SELECT c_custkey AS d_key,
                'Custmer#' || lpad(CAST(c_custkey % 100000 AS VARCHAR), 9, '0')
                  AS d_name,
                c_nationkey AS d_nation,
                c_acctbal + ((c_custkey % 21) - 10) AS d_bal
              FROM customer
            )
            SELECT c_custkey, d_key,
              CAST(levenshtein(c_name, d_name) AS INT) AS name_dist,
              CAST(CASE WHEN levenshtein(c_name, d_name) <= 2 THEN 2 ELSE 0 END
                + CASE WHEN abs(c_acctbal - d_bal) <= 10.0E0 THEN 1 ELSE 0 END
                AS INT) AS match_score
            FROM customer JOIN dirty ON c_nationkey = d_nation
            WHERE CASE WHEN levenshtein(c_name, d_name) <= 2 THEN 2 ELSE 0 END
                + CASE WHEN abs(c_acctbal - d_bal) <= 10.0E0 THEN 1 ELSE 0 END
                >= 3
        """,
        "q208_geo_binning": f"""
            WITH keyed AS (
              SELECT
                CAST(floor(((CAST(('0x' || substr(md5('lat:'
                    || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 180)
                    - 90) / 10) AS INT) AS lat_cell,
                CAST(floor(((CAST(('0x' || substr(md5('lon:'
                    || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 360)
                    - 180) / 10) AS INT) AS lon_cell,
                value
              FROM events
            )
            SELECT lat_cell, lon_cell, CAST(count(*) AS BIGINT) AS n,
              {_davg_sql('value')} AS avg_value
            FROM keyed GROUP BY 1, 2
        """,
        "q209_daily_bands": """
            WITH hourly AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                date_trunc('hour', ts) AS h,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2, 3
            )
            SELECT event_type, d,
              quantile_cont(n, 0.1) AS p10,
              median(n) AS p50,
              quantile_cont(n, 0.9) AS p90,
              CAST(count(*) AS BIGINT) AS n_hours
            FROM hourly GROUP BY event_type, d
        """,
        "q210_bounce_rate": """
            WITH flagged AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                     THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            sess AS (
              SELECT user_id, ts,
                CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
              FROM flagged
            ),
            per_session AS (
              SELECT user_id, session_seq,
                date_trunc('day', min(ts)) AS d,
                CAST(count(*) AS BIGINT) AS n_events
              FROM sess GROUP BY user_id, session_seq
            )
            SELECT d, CAST(count(*) AS BIGINT) AS n_sessions,
              CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_bounces,
              CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(count(*) AS DOUBLE) AS bounce_rate
            FROM per_session GROUP BY d
        """,
        "q211_tokenizer_fertility": r"""
            WITH base AS (
              SELECT lang,
                CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x <> '')) AS BIGINT) AS w,
                CAST(coalesce(list_aggregate(
                  list_transform(
                    list_filter(string_split_regex(trim(text), '\s+'),
                                x -> x <> ''),
                    t -> CAST(ceil(len(t) / 4.0) AS INT)
                  ), 'sum'), 0) AS BIGINT) AS bt,
                CAST(length(text) AS BIGINT) AS c
              FROM documents
            )
            SELECT lang,
              CAST(sum(w) AS BIGINT) AS words,
              CAST(sum(bt) AS BIGINT) AS subword_tokens,
              CAST(sum(c) AS BIGINT) AS chars,
              CAST(sum(bt) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS fertility,
              CAST(sum(c) AS DOUBLE) / CAST(sum(bt) AS DOUBLE)
                AS chars_per_token
            FROM base GROUP BY lang
        """,
        "q212_repeat_share": """
            WITH ints AS (
              SELECT user_id, ts,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xi
              FROM events WHERE value IS NOT NULL
            ),
            enc AS (
              SELECT user_id,
                xi - lag(xi) OVER (PARTITION BY user_id ORDER BY ts)
                  AS delta,
                lag(xi) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  AS is_first
              FROM ints
            )
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_deltas,
              CAST(sum(CASE WHEN delta = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_repeats,
              CAST(sum(CASE WHEN abs(delta) <= 100 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_small,
              CAST(sum(CASE WHEN abs(delta) <= 100 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS compressible_share
            FROM enc WHERE NOT is_first
            GROUP BY user_id
        """,
        "q213_hierarchy_rollup": """
            WITH RECURSIVE anc AS (
              SELECT c_custkey AS node, c_custkey AS ancestor, c_acctbal
              FROM customer
              UNION ALL
              SELECT node, ancestor // 10, c_acctbal
              FROM anc WHERE ancestor > 0
            )
            SELECT ancestor, CAST(count(*) AS BIGINT) AS n_desc,
              CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                AS subtree_bal
            FROM anc
            GROUP BY ancestor
            HAVING count(*) >= 2
        """,
        "q214_k_anonymity": """
            WITH binned AS (
              SELECT c_nationkey, c_mktsegment,
                CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS INT)
                  AS bal_decile
              FROM customer
            )
            SELECT c_nationkey, c_mktsegment, bal_decile,
              CAST(count(*) AS BIGINT) AS group_size
            FROM binned
            GROUP BY 1, 2, 3
            HAVING count(*) < 5
        """,
        "q215_segment_overlap": """
            WITH per_user AS (
              SELECT user_id,
                max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                + max(CASE WHEN event_type = 'view' THEN 2 ELSE 0 END)
                + max(CASE WHEN event_type = 'purchase' THEN 4 ELSE 0 END)
                  AS segment_mask
              FROM events GROUP BY user_id
            )
            SELECT CAST(segment_mask AS INT) AS segment_mask,
              CAST(count(*) AS BIGINT) AS n_users
            FROM per_user GROUP BY segment_mask
        """,
        "q216_scd2_temporal_join": """
            WITH ordered AS (
              SELECT user_id, ts, event_type,
                lag(event_type) OVER w AS prev_et,
                lag(ts) OVER w AS prev_ts
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            versions AS (
              SELECT user_id, ts, event_type FROM ordered
              WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_et
            ),
            dim AS (
              SELECT user_id AS d_user, event_type AS state,
                ts AS valid_from, lead(ts) OVER w2 AS valid_to
              FROM versions
              WINDOW w2 AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT state, CAST(count(*) AS BIGINT) AS n_purchases,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events e JOIN dim
              ON e.user_id = dim.d_user
             AND e.ts > dim.valid_from
             AND (dim.valid_to IS NULL OR e.ts <= dim.valid_to)
            WHERE e.event_type = 'purchase'
            GROUP BY state
        """,
        "q217_join_key_skew": """
            WITH f1 AS (
              SELECT l_partkey AS k, count(*) AS n FROM lineitem GROUP BY 1
            ),
            f2 AS (
              SELECT l_suppkey AS k, count(*) AS n FROM lineitem GROUP BY 1
            ),
            s1 AS (
              SELECT 'l_partkey' AS join_key,
                CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(n) AS BIGINT) AS n_rows,
                CAST(max(n) AS BIGINT) AS max_key_rows,
                median(n) AS median_key_rows
              FROM f1
            ),
            s2 AS (
              SELECT 'l_suppkey' AS join_key,
                CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(n) AS BIGINT) AS n_rows,
                CAST(max(n) AS BIGINT) AS max_key_rows,
                median(n) AS median_key_rows
              FROM f2
            ),
            u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
            SELECT join_key, n_keys, n_rows, max_key_rows, median_key_rows,
              CAST(max_key_rows AS DOUBLE) / CAST(n_rows AS DOUBLE)
                AS max_share,
              CAST(max_key_rows AS DOUBLE) / median_key_rows AS skew_ratio
            FROM u
        """,
        "q218_orphan_check": """
            SELECT 'lineitem' AS fact, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS orphan_orderkey,
              CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS orphan_partkey,
              CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS orphan_suppkey
            FROM lineitem l
            LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            LEFT JOIN part p ON l.l_partkey = p.p_partkey
            LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
            UNION ALL
            SELECT 'orders', CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
              CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "q219_class_rebalance": """
            WITH counts AS (
              SELECT label, count(*) AS n FROM embeddings GROUP BY label
            ),
            factors AS (
              SELECT label,
                CAST(floor((SELECT max(n) FROM counts) / n) AS INT) AS factor
              FROM counts
            ),
            rebalanced AS (
              SELECT e.label, e.vec_id,
                unnest(generate_series(1, f.factor)) AS copy_no
              FROM embeddings e JOIN factors f USING (label)
            )
            SELECT label, CAST(count(*) AS BIGINT) AS n_after,
              CAST(count(DISTINCT vec_id) AS BIGINT) AS n_unique
            FROM rebalanced GROUP BY label
        """,
        "q220_negative_samples": """
            WITH n AS (SELECT count(*) AS n FROM embeddings),
            base AS (
              SELECT vec_id, label AS anchor_label,
                unnest(generate_series(1, 3)) AS j
              FROM embeddings
            ),
            drawn AS (
              SELECT vec_id, anchor_label, j,
                CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':'
                    || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
                  % (SELECT n - 1 FROM n) AS raw
              FROM base
            ),
            pairs AS (
              SELECT vec_id, anchor_label,
                CASE WHEN raw >= vec_id THEN raw + 1 ELSE raw END AS neg_id
              FROM drawn
            )
            SELECT anchor_label, CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(CASE WHEN anchor_label = o.label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same_label
            FROM pairs JOIN embeddings o ON pairs.neg_id = o.vec_id
            GROUP BY anchor_label
        """,
        "q221_boolean_search": r"""
            WITH postings AS (
              SELECT DISTINCT doc_id, unnest(list_distinct(
                list_filter(string_split_regex(trim(text), '\s+'),
                            x -> x <> ''))) AS term
              FROM documents
            ),
            hit_all AS (
              SELECT doc_id FROM postings
              WHERE term IN ('data', 'stream')
              GROUP BY doc_id HAVING count(DISTINCT term) = 2
            ),
            excluded AS (
              SELECT DISTINCT doc_id FROM postings WHERE term = 'slow'
            )
            SELECT d.doc_id, d.lang, d.source
            FROM hit_all h
            JOIN documents d ON h.doc_id = d.doc_id
            WHERE h.doc_id NOT IN (SELECT doc_id FROM excluded)
        """,
        "q222_did": """
            WITH keyed AS (
              SELECT CASE WHEN substr(md5('exp2'
                       || CAST(user_id AS VARCHAR)), 1, 8) < '80000000'
                     THEN 't' ELSE 'c' END AS arm,
                ts >= TIMESTAMP '2024-01-16' AS post, value
              FROM events WHERE value IS NOT NULL
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CASE WHEN arm = 't' AND NOT post
                     THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE)
                  / sum(CASE WHEN arm = 't' AND NOT post THEN 1 ELSE 0 END)
                  AS t_pre,
                CAST(sum(CASE WHEN arm = 't' AND post
                     THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE)
                  / sum(CASE WHEN arm = 't' AND post THEN 1 ELSE 0 END)
                  AS t_post,
                CAST(sum(CASE WHEN arm = 'c' AND NOT post
                     THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE)
                  / sum(CASE WHEN arm = 'c' AND NOT post THEN 1 ELSE 0 END)
                  AS c_pre,
                CAST(sum(CASE WHEN arm = 'c' AND post
                     THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE)
                  / sum(CASE WHEN arm = 'c' AND post THEN 1 ELSE 0 END)
                  AS c_post
              FROM keyed
            )
            SELECT n_events, t_pre, t_post, c_pre, c_post,
              (t_post - t_pre) - (c_post - c_pre) AS did
            FROM agg
        """,
        "q223_kpi_decomposition": """
            WITH monthly AS (
              SELECT date_trunc('month', o_orderdate) AS m,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                  AS revenue
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                AND o_orderdate < TIMESTAMP '1997-03-01'
              GROUP BY 1
            ),
            cur AS (
              SELECT m, n_orders, revenue,
                lag(n_orders) OVER (ORDER BY m) AS n0,
                lag(revenue) OVER (ORDER BY m) AS r0
              FROM monthly
            )
            SELECT m, n_orders, revenue,
              revenue - r0 AS delta_revenue,
              CAST(n_orders - n0 AS DOUBLE) * (r0 / n0) AS volume_effect,
              CAST(n_orders AS DOUBLE)
                * (revenue / n_orders - r0 / n0) AS value_effect
            FROM cur WHERE n0 IS NOT NULL
        """,
        "q224_availability": """
            WITH gaps AS (
              SELECT user_id, ts,
                CAST(floor(epoch(ts)) AS BIGINT)
                  - CAST(floor(epoch(lag(ts) OVER
                      (PARTITION BY user_id ORDER BY ts))) AS BIGINT) AS gap,
                CAST(floor(epoch(ts)) AS BIGINT) AS ep
              FROM events
            ),
            agg AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(max(ep) - min(ep) AS BIGINT) AS span_s,
                CAST(sum(CASE WHEN gap > 7200 THEN gap - 7200 ELSE 0 END)
                  AS BIGINT) AS downtime_s
              FROM gaps GROUP BY user_id
            )
            SELECT user_id, n_events, span_s, downtime_s,
              1.0E0 - CAST(downtime_s AS DOUBLE) / CAST(span_s AS DOUBLE)
                AS availability
            FROM agg WHERE span_s > 0
        """,
        "q225_stemmed_vocab": r"""
            WITH toks AS (
              SELECT lang, unnest(list_filter(
                string_split_regex(trim(text), '\s+'), x -> x <> '')) AS w
              FROM documents
            ),
            stemmed AS (
              SELECT lang, w,
                regexp_replace(regexp_replace(regexp_replace(w,
                  '^([a-z]{3,})ing$', ''),
                  '^([a-z]{3,})ed$', ''),
                  '^([a-z]{2,})s$', '') AS stem
              FROM toks
            )
            SELECT lang,
              CAST(count(DISTINCT w) AS BIGINT) AS vocab_raw,
              CAST(count(DISTINCT stem) AS BIGINT) AS vocab_stemmed,
              CAST(count(*) AS BIGINT) AS n_tokens,
              CAST(count(DISTINCT stem) AS DOUBLE)
                / CAST(count(DISTINCT w) AS DOUBLE) AS compression
            FROM stemmed GROUP BY lang
        """,
        "q226_burn_rate": """
            WITH anchor AS (SELECT max(ts) AS a FROM events),
            agg AS (
              SELECT
                CAST(sum(CASE WHEN ts >= a - INTERVAL 1 HOUR
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_1h,
                CAST(sum(CASE WHEN ts >= a - INTERVAL 1 HOUR
                     AND event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS err_1h,
                CAST(sum(CASE WHEN ts >= a - INTERVAL 6 HOUR
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_6h,
                CAST(sum(CASE WHEN ts >= a - INTERVAL 6 HOUR
                     AND event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS err_6h
              FROM events, anchor
            )
            SELECT n_1h, err_1h, n_6h, err_6h,
              (CAST(err_1h AS DOUBLE) / CAST(n_1h AS DOUBLE)) / 0.05E0
                AS burn_1h,
              (CAST(err_6h AS DOUBLE) / CAST(n_6h AS DOUBLE)) / 0.05E0
                AS burn_6h,
              ((CAST(err_1h AS DOUBLE) / CAST(n_1h AS DOUBLE)) / 0.05E0
                 > 1.0E0)
              AND ((CAST(err_6h AS DOUBLE) / CAST(n_6h AS DOUBLE)) / 0.05E0
                 > 1.0E0) AS alert
            FROM agg
        """,
        "q227_simpsons": """
            WITH ints AS (
              SELECT p_brand AS b,
                CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                  AS DECIMAL(19,0)) AS x,
                CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                  AS DECIMAL(19,0)) AS y
              FROM lineitem JOIN part ON l_partkey = p_partkey
            ),
            g AS (
              SELECT b, count(*) AS n,
                sum(CAST(x AS DECIMAL(38,0))) AS sx,
                sum(CAST(y AS DECIMAL(38,0))) AS sy,
                sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
                sum(CAST(y * y AS DECIMAL(38,0))) AS syy,
                sum(CAST(x * y AS DECIMAL(38,0))) AS sxy
              FROM ints GROUP BY b
            ),
            per_brand AS (
              SELECT b,
                CASE WHEN sqrt(CAST(CAST(CAST(n AS DECIMAL(12,0))
                        * CAST(sxx AS DECIMAL(25,0)) AS DECIMAL(37,0))
                      - CAST(CAST(sx AS DECIMAL(19,0))
                        * CAST(sx AS DECIMAL(19,0)) AS DECIMAL(37,0))
                      AS DOUBLE))
                    * sqrt(CAST(CAST(CAST(n AS DECIMAL(12,0))
                        * CAST(syy AS DECIMAL(25,0)) AS DECIMAL(37,0))
                      - CAST(CAST(sy AS DECIMAL(19,0))
                        * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(37,0))
                      AS DOUBLE)) > 0
                THEN CAST(CAST(CAST(n AS DECIMAL(12,0))
                        * CAST(sxy AS DECIMAL(25,0)) AS DECIMAL(37,0))
                      - CAST(CAST(sx AS DECIMAL(19,0))
                        * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(37,0))
                      AS DOUBLE)
                  / (sqrt(CAST(CAST(CAST(n AS DECIMAL(12,0))
                        * CAST(sxx AS DECIMAL(25,0)) AS DECIMAL(37,0))
                      - CAST(CAST(sx AS DECIMAL(19,0))
                        * CAST(sx AS DECIMAL(19,0)) AS DECIMAL(37,0))
                      AS DOUBLE))
                    * sqrt(CAST(CAST(CAST(n AS DECIMAL(12,0))
                        * CAST(syy AS DECIMAL(25,0)) AS DECIMAL(37,0))
                      - CAST(CAST(sy AS DECIMAL(19,0))
                        * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(37,0))
                      AS DOUBLE)))
                END AS corr
              FROM g
            ),
            pooledsums AS (
              SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
                sum(sxx) AS sxx, sum(syy) AS syy, sum(sxy) AS sxy
              FROM g
            ),
            pooled AS (
              SELECT
                CASE WHEN sqrt(CAST(CAST(CAST(n AS DECIMAL(12,0))
                        * CAST(sxx AS DECIMAL(25,0)) AS DECIMAL(37,0))
                      - CAST(CAST(sx AS DECIMAL(19,0))
                        * CAST(sx AS DECIMAL(19,0)) AS DECIMAL(37,0))
                      AS DOUBLE))
                    * sqrt(CAST(CAST(CAST(n AS DECIMAL(12,0))
                        * CAST(syy AS DECIMAL(25,0)) AS DECIMAL(37,0))
                      - CAST(CAST(sy AS DECIMAL(19,0))
                        * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(37,0))
                      AS DOUBLE)) > 0
                THEN CAST(CAST(CAST(n AS DECIMAL(12,0))
                        * CAST(sxy AS DECIMAL(25,0)) AS DECIMAL(37,0))
                      - CAST(CAST(sx AS DECIMAL(19,0))
                        * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(37,0))
                      AS DOUBLE)
                  / (sqrt(CAST(CAST(CAST(n AS DECIMAL(12,0))
                        * CAST(sxx AS DECIMAL(25,0)) AS DECIMAL(37,0))
                      - CAST(CAST(sx AS DECIMAL(19,0))
                        * CAST(sx AS DECIMAL(19,0)) AS DECIMAL(37,0))
                      AS DOUBLE))
                    * sqrt(CAST(CAST(CAST(n AS DECIMAL(12,0))
                        * CAST(syy AS DECIMAL(25,0)) AS DECIMAL(37,0))
                      - CAST(CAST(sy AS DECIMAL(19,0))
                        * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(37,0))
                      AS DOUBLE)))
                END AS overall_corr
              FROM pooledsums
            )
            SELECT overall_corr,
              CAST(count(corr) AS BIGINT) AS n_brands,
              CAST(sum(CASE WHEN corr IS NOT NULL
                   AND sign(corr) <> sign(overall_corr)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_opposite_sign,
              CAST(sum(CASE WHEN corr IS NOT NULL
                   AND sign(corr) <> sign(overall_corr)
                   THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(count(corr) AS DOUBLE) AS opposite_share
            FROM per_brand, pooled
            GROUP BY overall_corr
        """,
        "q228_feature_table": """
            WITH daily AS (
              SELECT user_id, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n_events
              FROM events GROUP BY 1, 2
            )
            SELECT user_id, d, n_events,
              lag(n_events, 1) OVER w AS lag1,
              lag(n_events, 7) OVER w AS lag7,
              CAST(sum(n_events) OVER (PARTITION BY user_id ORDER BY d
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                / count(*) OVER (PARTITION BY user_id ORDER BY d
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS rolling7_mean,
              CAST(dayofweek(d) + 1 AS INT) AS dow
            FROM daily
            WINDOW w AS (PARTITION BY user_id ORDER BY d)
        """,
        "q229_calendar_spine": """
            WITH bounds AS (
              SELECT date_trunc('day', min(ts)) AS lo,
                date_trunc('day', max(ts)) AS hi
              FROM events
            ),
            days AS (
              SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
              FROM bounds
            ),
            types AS (SELECT DISTINCT event_type AS et FROM events),
            counts AS (
              SELECT date_trunc('day', ts) AS d, event_type AS et,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            )
            SELECT days.d, types.et AS event_type,
              CAST(coalesce(n, 0) AS BIGINT) AS n_events
            FROM days CROSS JOIN types
            LEFT JOIN counts ON days.d = counts.d AND types.et = counts.et
        """,
        "q230_dup_rate_by_source": """
            WITH groups AS (
              SELECT source, md5(text) AS fp, count(*) AS n
              FROM documents GROUP BY 1, 2
            )
            SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
              CAST(count(*) AS BIGINT) AS n_distinct,
              CAST(sum(n - 1) AS BIGINT) AS n_dup_rows,
              CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_factor
            FROM groups GROUP BY source
        """,
        "q231_shipping_aging": """
            WITH first_ship AS (
              SELECT l_orderkey, min(l_shipdate) AS first_ship
              FROM lineitem GROUP BY l_orderkey
            ),
            j AS (
              SELECT o_orderpriority,
                date_diff('day', o_orderdate, first_ship) AS days
              FROM orders JOIN first_ship ON o_orderkey = l_orderkey
            )
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
              median(days) AS median_days,
              quantile_cont(days, 0.9) AS p90_days,
              CAST(max(days) AS INT) AS max_days
            FROM j GROUP BY o_orderpriority
        """,
        "q232_dau_wau": """
            WITH user_days AS (
              SELECT DISTINCT user_id, date_trunc('day', ts) AS d,
                date_trunc('week', ts) AS w
              FROM events
            ),
            dau AS (
              SELECT w, d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
              FROM user_days GROUP BY w, d
            ),
            weekly AS (
              SELECT w, CAST(sum(dau) AS BIGINT) AS sum_dau,
                CAST(count(*) AS BIGINT) AS n_days
              FROM dau GROUP BY w
            ),
            wau AS (
              SELECT w, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
              FROM user_days GROUP BY w
            )
            SELECT weekly.w, sum_dau, n_days, wau,
              (CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE))
                / CAST(wau AS DOUBLE) AS stickiness
            FROM weekly JOIN wau ON weekly.w = wau.w
        """,
        "q233_inter_purchase": """
            WITH gaps AS (
              SELECT o_custkey,
                date_diff('day',
                  lag(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS gap_days
              FROM orders
            ),
            nn AS (SELECT * FROM gaps WHERE gap_days IS NOT NULL)
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
              median(gap_days) AS median_gap_days,
              CAST(min(gap_days) AS INT) AS min_gap_days
            FROM nn GROUP BY o_custkey
            HAVING count(*) >= 2
        """,
        "q234_precision_audit": """
            SELECT 'lineitem' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN abs(l_extendedprice * 100
                   - round(l_extendedprice * 100, 0)) > 1.0E-6
                   THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
              CAST(sum(CASE WHEN abs(l_discount * 100
                   - round(l_discount * 100, 0)) > 1.0E-6
                   THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount
            FROM lineitem
            UNION ALL
            SELECT 'events', CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN abs(value * 100
                   - round(value * 100, 0)) > 1.0E-6
                   THEN 1 ELSE 0 END) AS BIGINT),
              CAST(0 AS BIGINT)
            FROM events WHERE value IS NOT NULL
        """,
        "q235_wilson_bound": """
            WITH per_user AS (
              SELECT user_id,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS converted
              FROM events GROUP BY user_id
            ),
            touched AS (
              SELECT DISTINCT e.event_type AS channel, e.user_id
              FROM events e
            ),
            agg AS (
              SELECT channel, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(converted) AS BIGINT) AS k
              FROM touched JOIN per_user USING (user_id)
              GROUP BY channel
            )
            SELECT channel, n, k,
              CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
              (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                 + (1.96E0 * 1.96E0) / CAST(n AS DOUBLE) / 2
                 - 1.96E0 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                     * (1 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                     + (1.96E0 * 1.96E0) / CAST(n AS DOUBLE) / 4)
                     / CAST(n AS DOUBLE)))
               / (1 + (1.96E0 * 1.96E0) / CAST(n AS DOUBLE)) AS wilson_lb
            FROM agg
        """,
        "q236_degree_distribution": """
            WITH ob AS (
              SELECT DISTINCT l_orderkey AS o, p_brand AS b
              FROM lineitem JOIN part ON l_partkey = p_partkey
            ),
            e AS (
              SELECT DISTINCT x.b AS a, y.b AS b
              FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b
            ),
            sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
            deg AS (
              SELECT a, CAST(count(*) AS BIGINT) AS degree
              FROM sym GROUP BY a
            )
            SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
            FROM deg GROUP BY degree
        """,
        "q237_assortativity": """
            WITH ob AS (
              SELECT DISTINCT l_orderkey AS o, p_brand AS b
              FROM lineitem JOIN part ON l_partkey = p_partkey
            ),
            e AS (
              SELECT DISTINCT x.b AS a, y.b AS b
              FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b
            ),
            sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
            deg AS (SELECT a, count(*) AS d FROM sym GROUP BY a),
            pairs AS (
              SELECT CAST(da.d AS DECIMAL(19,0)) AS xi,
                CAST(db.d AS DECIMAL(19,0)) AS yi
              FROM sym
              JOIN deg da ON sym.a = da.a
              JOIN deg db ON sym.b = db.a
            ),
            s AS (
              SELECT count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(yi AS DECIMAL(38,0))) AS sy,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx,
                sum(CAST(yi * yi AS DECIMAL(38,0))) AS syy,
                sum(CAST(xi * yi AS DECIMAL(38,0))) AS sxy
              FROM pairs
            )
            SELECT CAST(n AS BIGINT) AS n_directed_edges,
              CASE WHEN sqrt(CAST(CAST(CAST(n AS DECIMAL(12,0))
                      * CAST(sxx AS DECIMAL(25,0)) AS DECIMAL(37,0))
                    - CAST(CAST(sx AS DECIMAL(19,0))
                      * CAST(sx AS DECIMAL(19,0)) AS DECIMAL(37,0))
                    AS DOUBLE))
                  * sqrt(CAST(CAST(CAST(n AS DECIMAL(12,0))
                      * CAST(syy AS DECIMAL(25,0)) AS DECIMAL(37,0))
                    - CAST(CAST(sy AS DECIMAL(19,0))
                      * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(37,0))
                    AS DOUBLE)) > 0
              THEN CAST(CAST(CAST(n AS DECIMAL(12,0))
                      * CAST(sxy AS DECIMAL(25,0)) AS DECIMAL(37,0))
                    - CAST(CAST(sx AS DECIMAL(19,0))
                      * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(37,0))
                    AS DOUBLE)
                / (sqrt(CAST(CAST(CAST(n AS DECIMAL(12,0))
                      * CAST(sxx AS DECIMAL(25,0)) AS DECIMAL(37,0))
                    - CAST(CAST(sx AS DECIMAL(19,0))
                      * CAST(sx AS DECIMAL(19,0)) AS DECIMAL(37,0))
                    AS DOUBLE))
                  * sqrt(CAST(CAST(CAST(n AS DECIMAL(12,0))
                      * CAST(syy AS DECIMAL(25,0)) AS DECIMAL(37,0))
                    - CAST(CAST(sy AS DECIMAL(19,0))
                      * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(37,0))
                    AS DOUBLE)))
              END AS assortativity
            FROM s
        """,
        "q238_containment_pairs": r"""
            WITH reps AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id IN (SELECT min(doc_id) FROM documents
                               GROUP BY text)
            ),
            toks AS (
              SELECT doc_id AS id,
                list_distinct(
                  list_transform(
                    generate_series(1, greatest(len(t) - 1, 0)),
                    i -> array_to_string(t[i:i+1], ' ')
                  )
                ) AS tok
              FROM (
                SELECT doc_id,
                  list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> '') AS t
                FROM reps
              )
            ),
            inv AS (
              SELECT id, len(tok) AS n_tok, unnest(tok) AS token
              FROM toks WHERE len(tok) > 0
            ),
            pairs AS (
              SELECT a.id AS id_a, b.id AS id_b,
                a.n_tok AS n_a, b.n_tok AS n_b,
                CAST(count(*) AS BIGINT) AS inter
              FROM inv a JOIN inv b ON a.token = b.token AND a.id < b.id
              GROUP BY 1, 2, 3, 4
            )
            SELECT id_a, id_b, inter,
              CAST(inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)
                AS containment
            FROM pairs
            WHERE CAST(inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)
              >= 0.5E0
        """,
        "q239_null_profile": """
            WITH agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c3,
                CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c4,
                CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c5,
                CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c6
              FROM events
            ),
            stacked AS (
              SELECT n, 'event_id' AS column_name, c1 AS n_null FROM agg
              UNION ALL SELECT n, 'ts', c2 FROM agg
              UNION ALL SELECT n, 'user_id', c3 FROM agg
              UNION ALL SELECT n, 'event_type', c4 FROM agg
              UNION ALL SELECT n, 'value', c5 FROM agg
              UNION ALL SELECT n, 'props', c6 FROM agg
            )
            SELECT column_name, n AS n_rows, n_null,
              CAST(n_null AS DOUBLE) / CAST(n AS DOUBLE) AS null_share
            FROM stacked
        """,
        "q240_spike_days": """
            WITH daily AS (
              SELECT date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ),
            scored AS (
              SELECT d, n,
                CAST(sum(n) OVER (ORDER BY d
                  ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS DOUBLE)
                / count(*) OVER (ORDER BY d
                  ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trailing_avg
              FROM daily
            )
            SELECT d, n, trailing_avg
            FROM scored
            WHERE trailing_avg IS NOT NULL
              AND CAST(n AS DOUBLE) > 1.05E0 * trailing_avg
        """,
        "q241_donchian": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            scored AS (
              SELECT event_type, d, n,
                min(n) OVER w AS chan_lo,
                max(n) OVER w AS chan_hi
              FROM daily
              WINDOW w AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
            )
            SELECT event_type, d, n,
              CAST(chan_lo AS BIGINT) AS chan_lo,
              CAST(chan_hi AS BIGINT) AS chan_hi,
              n > chan_hi AS break_up,
              n < chan_lo AS break_down
            FROM scored WHERE chan_lo IS NOT NULL
        """,
        "q242_cross_sectional_z": """
            WITH daily AS (
              SELECT date_trunc('day', ts) AS d, event_type,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            scored AS (
              SELECT d, event_type, n,
                count(*) OVER wd AS k,
                sum(n) OVER wd AS s1,
                sum(n * n) OVER wd AS s2
              FROM daily
              WINDOW wd AS (PARTITION BY d)
            )
            SELECT d, event_type, n,
              CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS day_mean,
              CASE WHEN CAST(k * s2 - s1 * s1 AS DOUBLE) > 0 THEN
                (CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
                / (sqrt(CAST(k * s2 - s1 * s1 AS DOUBLE)) / CAST(k AS DOUBLE))
              END AS cs_z
            FROM scored
        """,
        "q243_vwap": """
            SELECT p_brand, date_trunc('month', l_shipdate) AS m,
              CAST(count(*) AS BIGINT) AS n_lines,
              CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2))
                   * CAST(l_extendedprice AS DECIMAL(12,2))
                   AS DECIMAL(38,6))) AS DOUBLE)
                / CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2))
                   AS DECIMAL(38,6))) AS DOUBLE) AS vwap
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2
        """,
        "q244_abc_classification": f"""
            WITH per_part AS (
              SELECT l_partkey, sum({_REV_SQL}) AS rev
              FROM lineitem GROUP BY l_partkey
            ),
            classified AS (
              SELECT l_partkey, CAST(rev AS DOUBLE) AS revenue,
                CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE)
                / CAST(sum(rev) OVER () AS DOUBLE) AS cum_share
              FROM per_part
            ),
            tagged AS (
              SELECT revenue,
                CASE WHEN cum_share <= 0.80E0 THEN 'A'
                     WHEN cum_share <= 0.95E0 THEN 'B'
                     ELSE 'C' END AS abc
              FROM classified
            )
            SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
              CAST(sum(CAST(revenue AS DECIMAL(38,6))) AS DOUBLE)
                AS class_revenue
            FROM tagged GROUP BY abc
        """,
        "q245_vocab_overlap": r"""
            WITH st AS (
              SELECT DISTINCT source,
                unnest(list_distinct(list_filter(
                  string_split_regex(trim(text), '\s+'), x -> x <> ''))) AS t
              FROM documents
            ),
            sizes AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_vocab
              FROM st GROUP BY source
            ),
            inter AS (
              SELECT a.source AS sa, b.source AS sb,
                CAST(count(*) AS BIGINT) AS inter
              FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
              GROUP BY 1, 2
            )
            SELECT sa, sb, inter,
              CAST(inter AS DOUBLE)
                / CAST(na.n_vocab + nb.n_vocab - inter AS DOUBLE)
                AS vocab_jaccard
            FROM inter
            JOIN sizes na ON sa = na.source
            JOIN sizes nb ON sb = nb.source
        """,
        "q246_growth_accounting": """
            WITH wk AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS w
              FROM events
            ),
            first_w AS (
              SELECT user_id, min(w) AS fw FROM wk GROUP BY user_id
            ),
            cur AS (
              SELECT wk.w,
                wk.w = fw AS is_new,
                p.user_id IS NOT NULL AS was_active
              FROM wk
              JOIN first_w USING (user_id)
              LEFT JOIN wk p ON p.user_id = wk.user_id
                AND p.w + INTERVAL 7 DAY = wk.w
            ),
            per_week AS (
              SELECT w,
                CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
                  AS new_users,
                CAST(sum(CASE WHEN NOT is_new AND was_active
                     THEN 1 ELSE 0 END) AS BIGINT) AS retained,
                CAST(sum(CASE WHEN NOT is_new AND NOT was_active
                     THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
              FROM cur GROUP BY w
            ),
            churn AS (
              SELECT a.w + INTERVAL 7 DAY AS w,
                CAST(count(*) AS BIGINT) AS churned
              FROM wk a
              WHERE NOT EXISTS (
                SELECT 1 FROM wk b
                WHERE b.user_id = a.user_id
                  AND b.w = a.w + INTERVAL 7 DAY
              )
              GROUP BY a.w + INTERVAL 7 DAY
            )
            SELECT per_week.w, new_users, retained, resurrected,
              coalesce(churned, 0) AS churned
            FROM per_week LEFT JOIN churn ON per_week.w = churn.w
        """,
        "q247_anomaly_ensemble": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            scored AS (
              SELECT event_type, d, n,
                CASE WHEN
                  CAST(sum(n) OVER wt AS DOUBLE) / count(*) OVER wt
                    IS NOT NULL
                  AND CAST(n AS DOUBLE) > 1.05E0
                    * (CAST(sum(n) OVER wt AS DOUBLE) / count(*) OVER wt)
                THEN 1 ELSE 0 END AS v_spike,
                CASE WHEN max(n) OVER wt IS NOT NULL
                  AND n > max(n) OVER wt THEN 1 ELSE 0 END AS v_break,
                CASE WHEN
                  CAST(count(*) OVER wd * sum(n * n) OVER wd
                    - sum(n) OVER wd * sum(n) OVER wd AS DOUBLE) > 0
                  AND abs((CAST(n AS DOUBLE)
                      - CAST(sum(n) OVER wd AS DOUBLE)
                        / CAST(count(*) OVER wd AS DOUBLE))
                    / (sqrt(CAST(count(*) OVER wd * sum(n * n) OVER wd
                        - sum(n) OVER wd * sum(n) OVER wd AS DOUBLE))
                      / CAST(count(*) OVER wd AS DOUBLE))) > 1.5E0
                THEN 1 ELSE 0 END AS v_z
              FROM daily
              WINDOW wt AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING),
              wd AS (PARTITION BY d)
            )
            SELECT event_type, d, n,
              CAST(v_spike AS INT) AS v_spike,
              CAST(v_break AS INT) AS v_break,
              CAST(v_z AS INT) AS v_z,
              CAST(v_spike + v_break + v_z AS INT) AS votes
            FROM scored
            WHERE v_spike + v_break + v_z >= 2
        """,
        "q248_bollinger": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            banded AS (
              SELECT event_type, d, n,
                count(*) OVER wt AS k,
                sum(n) OVER wt AS s1,
                sum(n * n) OVER wt AS s2
              FROM daily
              WINDOW wt AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
            ),
            calc AS (
              SELECT event_type, d, n,
                CASE WHEN k >= 3 THEN
                  CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) END AS mid,
                CASE WHEN k >= 3 THEN
                  CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)
                  + 2E0 * (sqrt(CAST(k * s2 - s1 * s1 AS DOUBLE))
                           / CAST(k AS DOUBLE)) END AS hi,
                CASE WHEN k >= 3 THEN
                  CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)
                  - 2E0 * (sqrt(CAST(k * s2 - s1 * s1 AS DOUBLE))
                           / CAST(k AS DOUBLE)) END AS lo
              FROM banded
            )
            SELECT event_type, d, n, mid, hi, lo,
              CAST(CASE WHEN hi IS NOT NULL AND CAST(n AS DOUBLE) > hi
                THEN 1 ELSE 0 END AS INT) AS break_up,
              CAST(CASE WHEN lo IS NOT NULL AND CAST(n AS DOUBLE) < lo
                THEN 1 ELSE 0 END AS INT) AS break_dn
            FROM calc
        """,
        "q249_simpson_diversity": """
            WITH per_type AS (
              SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            )
            SELECT user_id,
              CAST(sum(n) AS BIGINT) AS n_events,
              CAST(count(*) AS BIGINT) AS n_types,
              1E0 - CAST(sum(n * n) AS DOUBLE)
                / CAST(sum(n) * sum(n) AS DOUBLE) AS simpson
            FROM per_type GROUP BY user_id
        """,
        "q250_ttr_hapax": """
            WITH tok AS (
              SELECT source,
                unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                  x -> x <> '')) AS t
              FROM documents
            ),
            src_tok AS (
              SELECT source, t, CAST(count(*) AS BIGINT) AS n
              FROM tok GROUP BY 1, 2
            ),
            corpus AS (
              SELECT t, CAST(count(*) AS BIGINT) AS cn FROM tok GROUP BY t
            )
            SELECT source,
              CAST(sum(n) AS BIGINT) AS n_tokens,
              CAST(count(*) AS BIGINT) AS vocab,
              CAST(sum(CASE WHEN cn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS hapax,
              CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS ttr,
              CAST(sum(CASE WHEN cn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(count(*) AS DOUBLE) AS hapax_share
            FROM src_tok JOIN corpus USING (t)
            GROUP BY source
        """,
        "q251_temperature_sampling": """
            WITH per_src AS (
              SELECT source,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(length(list_filter(
                  string_split_regex(trim(text), '\\s+'), x -> x <> '')))
                  AS BIGINT) AS n_tokens
              FROM documents GROUP BY source
            )
            SELECT source, n_docs, n_tokens,
              sqrt(CAST(n_tokens AS DOUBLE))
                / sqrt(CAST(max(n_tokens) OVER () AS DOUBLE)) AS rel_weight
            FROM per_src
        """,
        "q252_lexical_complexity": """
            WITH per_doc AS (
              SELECT lang,
                CAST(length(list_filter(
                  string_split_regex(trim(text), '\\s+'), x -> x <> ''))
                  AS BIGINT) AS words,
                CAST(length(regexp_replace(text, '\\s+', '', 'g'))
                  AS BIGINT) AS chars,
                CAST(length(regexp_extract_all(text, '([aeiou]+)', 1))
                  AS BIGINT) AS vgroups
              FROM documents
            )
            SELECT lang,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(words) AS BIGINT) AS n_words,
              CAST(sum(chars) AS DOUBLE) / CAST(sum(words) AS DOUBLE)
                AS chars_per_word,
              CAST(sum(vgroups) AS DOUBLE) / CAST(sum(words) AS DOUBLE)
                AS syllables_per_word
            FROM per_doc GROUP BY lang
        """,
        "q253_daily_mode": """
            WITH daily AS (
              SELECT date_trunc('day', ts) AS d, event_type,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            )
            SELECT d, event_type AS mode_type, n FROM (
              SELECT d, event_type, n,
                row_number() OVER (PARTITION BY d
                  ORDER BY n DESC, event_type) AS rk
              FROM daily
            ) WHERE rk = 1
        """,
        "q254_hour_weekday_heatmap": """
            WITH cells AS (
              SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
                CAST(hour(ts) AS INT) AS hod,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            )
            SELECT dow, hod, n,
              CAST(n AS DOUBLE)
                / CAST(sum(n) OVER (PARTITION BY dow) AS DOUBLE) AS dow_share
            FROM cells
        """,
        "q255_pettitt": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            r AS (
              SELECT a.event_type, a.d AS di,
                CAST(sum(sign(a.n - b.n)) AS BIGINT) AS r
              FROM daily a JOIN daily b
                ON a.event_type = b.event_type AND a.d <> b.d
              GROUP BY 1, 2
            ),
            u AS (
              SELECT event_type, di,
                -sum(r) OVER (PARTITION BY event_type ORDER BY di
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u,
                max(di) OVER (PARTITION BY event_type) AS maxd
              FROM r
            ),
            cand AS (
              SELECT event_type, di, u,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY abs(u) DESC, di) AS rk,
                CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                  AS n_candidates
              FROM u WHERE di <> maxd
            )
            SELECT event_type, di AS change_day,
              CAST(abs(u) AS BIGINT) AS k_stat, n_candidates
            FROM cand WHERE rk = 1
        """,
        "q256_lang_purity": """
            WITH sl AS (
              SELECT source, lang, CAST(count(*) AS BIGINT) AS n
              FROM documents GROUP BY 1, 2
            ),
            ranked AS (
              SELECT source, lang, n,
                row_number() OVER (PARTITION BY source
                  ORDER BY n DESC, lang) AS rk,
                CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS total
              FROM sl
            )
            SELECT source, lang AS dominant_lang, total AS n_docs,
              CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS purity,
              CAST(total - n AS BIGINT) AS n_off_dominant
            FROM ranked WHERE rk = 1
        """,
        "q257_knn_label_agreement": """
            WITH v AS (
              SELECT vec_id, label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings
            ),
            scored AS (
              SELECT q.vec_id AS qid, q.label AS qlabel,
                c.vec_id AS vec_id, c.label AS label,
                list_dot_product(q.e, c.e)
                  / (sqrt(list_dot_product(q.e, q.e))
                     * sqrt(list_dot_product(c.e, c.e))) AS cosine
              FROM v q JOIN v c ON q.vec_id <> c.vec_id
              WHERE q.vec_id < 50
            ),
            top AS (
              SELECT qid, qlabel, label FROM (
                SELECT qid, qlabel, label,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY cosine DESC, vec_id) AS rk
                FROM scored
              ) WHERE rk <= 3
            )
            SELECT qid, qlabel,
              CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
              CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS agreement
            FROM top GROUP BY qid, qlabel
        """,
        "q258_prefix_dup": """
            WITH pre AS (
              SELECT doc_id,
                array_to_string(list_slice(list_filter(
                  string_split_regex(trim(text), '\\s+'), x -> x <> ''),
                  1, 8), ' ') AS prefix
              FROM documents
            )
            SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
              min(doc_id) AS rep_doc
            FROM pre GROUP BY prefix HAVING count(*) >= 2
        """,
        "q259_peak_concurrency": """
            WITH marked AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            sid AS (
              SELECT user_id, ts,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM marked
            ),
            sess AS (
              SELECT user_id, sid, min(ts) AS t_start, max(ts) AS t_end
              FROM sid GROUP BY 1, 2
            ),
            bounds AS (
              SELECT t_start AS t, 1 AS delta FROM sess
              UNION ALL
              SELECT t_end AS t, -1 AS delta FROM sess
            ),
            conc AS (
              SELECT t,
                CAST(sum(delta) OVER (ORDER BY t, delta
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS conc
              FROM bounds
            )
            SELECT date_trunc('day', t) AS d,
              max(conc) AS peak_concurrency
            FROM conc GROUP BY 1
        """,
        "q260_weekend_lift": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            agg AS (
              SELECT event_type,
                sum(CASE WHEN dayofweek(d) IN (0, 6) THEN n ELSE 0 END)
                  AS we_n,
                sum(CASE WHEN dayofweek(d) IN (0, 6) THEN 1 ELSE 0 END)
                  AS we_days,
                sum(CASE WHEN dayofweek(d) NOT IN (0, 6) THEN n ELSE 0 END)
                  AS wd_n,
                sum(CASE WHEN dayofweek(d) NOT IN (0, 6) THEN 1 ELSE 0 END)
                  AS wd_days
              FROM daily GROUP BY event_type
            )
            SELECT event_type,
              CAST(we_n AS DOUBLE) / CAST(we_days AS DOUBLE) AS weekend_avg,
              CAST(wd_n AS DOUBLE) / CAST(wd_days AS DOUBLE) AS weekday_avg,
              (CAST(we_n AS DOUBLE) / CAST(we_days AS DOUBLE))
                / (CAST(wd_n AS DOUBLE) / CAST(wd_days AS DOUBLE))
                AS weekend_lift
            FROM agg
        """,
        "q261_spc_rules": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            base AS (
              SELECT event_type, d, n,
                (CAST(n AS DOUBLE)
                  - CAST(sum(n) OVER wall AS DOUBLE)
                    / CAST(count(*) OVER wall AS DOUBLE))
                / (sqrt(CAST(count(*) OVER wall * sum(n * n) OVER wall
                    - sum(n) OVER wall * sum(n) OVER wall AS DOUBLE))
                  / CAST(count(*) OVER wall AS DOUBLE)) AS z
              FROM daily
              WINDOW wall AS (PARTITION BY event_type)
            ),
            scored AS (
              SELECT event_type, d, n, z,
                CASE WHEN abs(z) > 3E0 THEN 1 ELSE 0 END AS rule1,
                CASE WHEN
                  sum(CASE WHEN z > 2E0 THEN 1 ELSE 0 END) OVER w3 >= 2
                  OR sum(CASE WHEN z < -2E0 THEN 1 ELSE 0 END) OVER w3 >= 2
                THEN 1 ELSE 0 END AS rule2,
                CASE WHEN
                  sum(CASE WHEN z > 0E0 THEN 1 ELSE 0 END) OVER w8 = 8
                  OR sum(CASE WHEN z < 0E0 THEN 1 ELSE 0 END) OVER w8 = 8
                THEN 1 ELSE 0 END AS rule4
              FROM base
              WINDOW w3 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
              w8 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
            )
            SELECT event_type, d, n, z,
              CAST(rule1 AS INT) AS rule1,
              CAST(rule2 AS INT) AS rule2,
              CAST(rule4 AS INT) AS rule4
            FROM scored
        """,
        "q262_wow_overlap": """
            WITH wk AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS w
              FROM events
            ),
            sizes AS (
              SELECT w, CAST(count(*) AS BIGINT) AS n_users
              FROM wk GROUP BY w
            ),
            inter AS (
              SELECT a.w, CAST(count(*) AS BIGINT) AS inter
              FROM wk a JOIN wk b
                ON a.user_id = b.user_id AND b.w = a.w + INTERVAL 7 DAY
              GROUP BY a.w
            )
            SELECT a.w AS week,
              a.n_users AS users_this,
              b.n_users AS users_next,
              coalesce(inter, 0) AS retained,
              CAST(coalesce(inter, 0) AS DOUBLE)
                / CAST(a.n_users + b.n_users - coalesce(inter, 0) AS DOUBLE)
                AS wow_jaccard
            FROM sizes a
            JOIN sizes b ON b.w = a.w + INTERVAL 7 DAY
            LEFT JOIN inter ON inter.w = a.w
        """,
        "q263_drawdown": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            dd AS (
              SELECT event_type, d, n,
                max(n) OVER (PARTITION BY event_type ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
              FROM daily
            ),
            scored AS (
              SELECT event_type, d, n, peak,
                CAST(peak - n AS DOUBLE) / CAST(peak AS DOUBLE) AS dd,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY CAST(peak - n AS DOUBLE) / CAST(peak AS DOUBLE)
                    DESC, d) AS rk
              FROM dd
            )
            SELECT event_type, d AS worst_day, n AS trough, peak,
              dd AS max_drawdown
            FROM scored WHERE rk = 1
        """,
        "q264_kfold_balance": """
            WITH assigned AS (
              SELECT user_id, event_type,
                CASE WHEN substr(md5('cv1' || CAST(user_id AS VARCHAR)), 1, 8)
                       < '33333333' THEN 0
                     WHEN substr(md5('cv1' || CAST(user_id AS VARCHAR)), 1, 8)
                       < '66666666' THEN 1
                     WHEN substr(md5('cv1' || CAST(user_id AS VARCHAR)), 1, 8)
                       < '99999999' THEN 2
                     WHEN substr(md5('cv1' || CAST(user_id AS VARCHAR)), 1, 8)
                       < 'cccccccc' THEN 3
                     ELSE 4 END AS fold
              FROM events
            )
            SELECT CAST(fold AS INT) AS fold, event_type,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM assigned GROUP BY fold, event_type
        """,
        "q265_burstiness": """
            WITH gaps AS (
              SELECT user_id,
                CAST(floor(epoch(ts)) AS BIGINT)
                  - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id))) AS BIGINT) AS g
              FROM events
            ),
            agg AS (
              SELECT user_id,
                CAST(count(*) AS BIGINT) AS k,
                CAST(sum(g) AS BIGINT) AS s1,
                CAST(sum(g * g) AS BIGINT) AS s2
              FROM gaps WHERE g IS NOT NULL
              GROUP BY user_id HAVING count(*) >= 2
            )
            SELECT user_id, k AS n_gaps,
              CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS mean_gap_s,
              sqrt(CAST(k * s2 - s1 * s1 AS DOUBLE)) / CAST(k AS DOUBLE)
                AS std_gap_s,
              (sqrt(CAST(k * s2 - s1 * s1 AS DOUBLE)) / CAST(k AS DOUBLE)
                - CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
              / (sqrt(CAST(k * s2 - s1 * s1 AS DOUBLE)) / CAST(k AS DOUBLE)
                + CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)) AS burstiness
            FROM agg
        """,
        "q266_tukey_fences": """
            WITH q AS (
              SELECT event_type,
                quantile_cont(value, 0.25) AS q1,
                quantile_cont(value, 0.75) AS q3,
                CAST(count(*) AS BIGINT) AS n
              FROM events WHERE value IS NOT NULL
              GROUP BY event_type
            ),
            fenced AS (
              SELECT event_type, q1, q3, n,
                q1 - 1.5E0 * (q3 - q1) AS lo,
                q3 + 1.5E0 * (q3 - q1) AS hi
              FROM q
            ),
            outliers AS (
              SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_outliers
              FROM events e JOIN fenced f ON e.event_type = f.event_type
              WHERE e.value IS NOT NULL
                AND (e.value < f.lo OR e.value > f.hi)
              GROUP BY e.event_type
            )
            SELECT f.event_type, n, q1, q3, lo, hi,
              coalesce(n_outliers, 0) AS n_outliers
            FROM fenced f LEFT JOIN outliers o
              ON f.event_type = o.event_type
        """,
        "q267_page_hinkley": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            base AS (
              SELECT event_type, d, n,
                CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)
                  / CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE)
                  AS mean_n
              FROM daily
            ),
            stepped AS (
              SELECT event_type, d, n, mean_n,
                sum(CAST(n AS DOUBLE) - mean_n) OVER (
                  PARTITION BY event_type ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
              FROM base
            )
            SELECT event_type, d, n,
              m - min(m) OVER (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
              CAST(CASE WHEN
                m - min(m) OVER (PARTITION BY event_type ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                > 0.5E0 * mean_n
              THEN 1 ELSE 0 END AS INT) AS alarm
            FROM stepped
        """,
        "q268_capture_recapture": """
            WITH wk AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS w
              FROM events
            ),
            sizes AS (
              SELECT w, CAST(count(*) AS BIGINT) AS n1
              FROM wk GROUP BY w
            ),
            m AS (
              SELECT a.w, CAST(count(*) AS BIGINT) AS m
              FROM wk a JOIN wk b
                ON a.user_id = b.user_id AND b.w = a.w + INTERVAL 7 DAY
              GROUP BY a.w
            )
            SELECT a.w AS week, a.n1, b.n1 AS n2, coalesce(m, 0) AS m,
              CAST((a.n1 + 1) * (b.n1 + 1) AS DOUBLE)
                / CAST(coalesce(m, 0) + 1 AS DOUBLE) - 1E0 AS n_hat,
              CAST(a.n1 + b.n1 - coalesce(m, 0) AS DOUBLE)
                / (CAST((a.n1 + 1) * (b.n1 + 1) AS DOUBLE)
                   / CAST(coalesce(m, 0) + 1 AS DOUBLE) - 1E0) AS coverage
            FROM sizes a
            JOIN sizes b ON b.w = a.w + INTERVAL 7 DAY
            LEFT JOIN m ON m.w = a.w
        """,
        "q269_odds_ratio_terms": """
            WITH tok AS (
              SELECT lang,
                unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                  x -> x <> '')) AS t
              FROM documents
            ),
            lt AS (
              SELECT lang, t, CAST(count(*) AS BIGINT) AS a
              FROM tok GROUP BY 1, 2
            ),
            tot_l AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS la
              FROM tok GROUP BY lang
            ),
            tot_t AS (
              SELECT t, CAST(count(*) AS BIGINT) AS ct FROM tok GROUP BY t
            ),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS gn FROM tok),
            j AS (
              SELECT lt.lang, lt.t, lt.a,
                (CAST(lt.a AS DOUBLE) + 0.5E0)
                  * (CAST((gn - la) - (ct - a) AS DOUBLE) + 0.5E0)
                / ((CAST(ct - a AS DOUBLE) + 0.5E0)
                  * (CAST(la - a AS DOUBLE) + 0.5E0)) AS odds_ratio
              FROM lt
              JOIN tot_l USING (lang)
              JOIN tot_t USING (t)
              CROSS JOIN tot
              WHERE lt.a >= 5
            )
            SELECT lang, t AS token, a, odds_ratio, CAST(rk AS INT) AS rk
            FROM (
              SELECT lang, t, a, odds_ratio,
                row_number() OVER (PARTITION BY lang
                  ORDER BY odds_ratio DESC, t) AS rk
              FROM j
            ) WHERE rk <= 5
        """,
        "q270_emd_drift": """
            WITH binned AS (
              SELECT event_type,
                CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a'
                     ELSE 'b' END AS half,
                CAST(floor(value / 5.0E0) AS BIGINT) AS bin
              FROM events WHERE value IS NOT NULL
            ),
            counts AS (
              SELECT event_type, half, bin, CAST(count(*) AS BIGINT) AS n
              FROM binned GROUP BY 1, 2, 3
            ),
            shares AS (
              SELECT event_type, half, bin,
                CAST(n AS DOUBLE) / CAST(sum(n) OVER (
                  PARTITION BY event_type, half) AS DOUBLE) AS p
              FROM counts
            ),
            grid AS (
              SELECT event_type, bin,
                coalesce(sum(CASE WHEN half = 'a' THEN p END), 0E0) AS pa,
                coalesce(sum(CASE WHEN half = 'b' THEN p END), 0E0) AS pb
              FROM shares GROUP BY 1, 2
            ),
            diffs AS (
              SELECT event_type, bin,
                sum(pa - pb) OVER (PARTITION BY event_type ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cdf_gap
              FROM grid
            )
            SELECT event_type,
              CAST(sum(CAST(abs(cdf_gap) AS DECIMAL(38,6))) AS DOUBLE)
                * 5E0 AS emd,
              CAST(count(*) AS BIGINT) AS n_bins
            FROM diffs GROUP BY event_type
        """,
        "q271_bow_dup": """
            WITH fp AS (
              SELECT doc_id, source,
                md5(array_to_string(list_sort(list_distinct(list_filter(
                  string_split_regex(trim(text), '\\s+'), x -> x <> ''))),
                  ' ')) AS bow_fp
              FROM documents
            )
            SELECT bow_fp,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
              min(doc_id) AS rep_doc
            FROM fp GROUP BY bow_fp HAVING count(*) >= 2
        """,
        "q272_stride_sample": """
            SELECT user_id, event_id, CAST(rn AS INT) AS rn FROM (
              SELECT user_id, event_id,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS rn
              FROM events
            ) WHERE rn % 10 = 1
        """,
        "q273_churn_risk": """
            WITH base AS (
              SELECT user_id,
                CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
                CAST(floor(epoch(ts)) AS BIGINT)
                  - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id))) AS BIGINT) AS g
              FROM events
            ),
            horizon AS (SELECT max(tsec) AS h FROM base),
            per_user AS (
              SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_events,
                max(tsec) AS last_t,
                quantile_cont(g, 0.5) AS median_gap_s,
                count(g) AS n_gaps
              FROM base GROUP BY user_id HAVING count(g) >= 2
            )
            SELECT user_id, n_events,
              CAST(h - last_t AS BIGINT) AS idle_s,
              median_gap_s,
              CAST(h - last_t AS DOUBLE) / median_gap_s AS risk_ratio,
              CAST(CASE WHEN CAST(h - last_t AS DOUBLE) / median_gap_s
                > 3E0 THEN 1 ELSE 0 END AS INT) AS at_risk
            FROM per_user CROSS JOIN horizon
        """,
        "q274_discount_elasticity": """
            WITH ints AS (
              SELECT p_brand,
                CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                  AS DECIMAL(19,0)) AS xi,
                CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                  AS DECIMAL(19,0)) AS yi
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE l_discount IS NOT NULL AND l_quantity IS NOT NULL
            ),
            s AS (
              SELECT p_brand, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(yi AS DECIMAL(38,0))) AS sy,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx,
                sum(CAST(yi * yi AS DECIMAL(38,0))) AS syy,
                sum(CAST(xi * yi AS DECIMAL(38,0))) AS sxy
              FROM ints GROUP BY p_brand
            ),
            e AS (
              SELECT p_brand, n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxy AS DECIMAL(24,0)) AS DECIMAL(32,0))
                     - CAST(CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(32,0)) AS DOUBLE) AS cov_n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(24,0)) AS DECIMAL(32,0))
                     - CAST(CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS DECIMAL(32,0)) AS DOUBLE) AS var_x,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(syy AS DECIMAL(24,0)) AS DECIMAL(32,0))
                     - CAST(CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(32,0)) AS DOUBLE) AS var_y
              FROM s
            )
            SELECT p_brand, n,
              CASE WHEN sqrt(var_x) * sqrt(var_y) > 0
                   THEN cov_n / (sqrt(var_x) * sqrt(var_y)) END AS corr
            FROM e
        """,
        "q275_centroid_drift": """
            WITH c AS (
              SELECT label,
                CASE WHEN vec_id < 250 THEN 'a' ELSE 'b' END AS half,
                i AS dim,
                sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,8)))
                  AS s
              FROM embeddings,
                unnest(generate_series(1, len(embedding))) AS t(i)
              GROUP BY 1, 2, 3
            ),
            v AS (
              SELECT label, half, list(CAST(s AS DOUBLE) ORDER BY dim)
                AS vec
              FROM c GROUP BY label, half
            )
            SELECT a.label,
              list_dot_product(a.vec, b.vec)
                / (sqrt(list_dot_product(a.vec, a.vec))
                   * sqrt(list_dot_product(b.vec, b.vec))) AS drift_cosine
            FROM v a JOIN v b
              ON a.label = b.label AND a.half = 'a' AND b.half = 'b'
        """,
        "q276_matrix_profile": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            idx AS (
              SELECT event_type, d, n,
                CAST(row_number() OVER (PARTITION BY event_type
                  ORDER BY d) AS BIGINT) AS idx,
                CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                  AS cnt
              FROM daily
            ),
            el AS (
              SELECT a.event_type AS et, a.idx AS s,
                b.idx - a.idx AS p, b.n AS v
              FROM idx a JOIN idx b
                ON a.event_type = b.event_type
                AND b.idx >= a.idx AND b.idx < a.idx + 7
              WHERE a.idx <= a.cnt - 6
            ),
            d2 AS (
              SELECT e1.et, e1.s AS s1, e2.s AS s2,
                CAST(sum((e1.v - e2.v) * (e1.v - e2.v)) AS BIGINT)
                  AS dist2
              FROM el e1 JOIN el e2
                ON e1.et = e2.et AND e1.p = e2.p AND e1.s <> e2.s
              GROUP BY 1, 2, 3
            ),
            nn AS (
              SELECT et, s1, min(dist2) AS nn_dist2
              FROM d2 GROUP BY 1, 2
            ),
            ranked AS (
              SELECT et, s1, nn_dist2,
                row_number() OVER (PARTITION BY et
                  ORDER BY nn_dist2 DESC, s1) AS rd,
                row_number() OVER (PARTITION BY et
                  ORDER BY nn_dist2 ASC, s1) AS rm
              FROM nn
            )
            SELECT dis.et AS event_type,
              dd.d AS discord_start, dis.nn_dist2 AS discord_dist2,
              md.d AS motif_start, mot.nn_dist2 AS motif_dist2
            FROM ranked dis
            JOIN idx dd ON dis.et = dd.event_type AND dis.s1 = dd.idx
            JOIN ranked mot ON mot.et = dis.et AND mot.rm = 1
            JOIN idx md ON mot.et = md.event_type AND mot.s1 = md.idx
            WHERE dis.rd = 1
        """,
        "q277_rolling_slope": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            base AS (
              SELECT event_type, d, n,
                CAST(row_number() OVER (PARTITION BY event_type
                  ORDER BY d) AS BIGINT) AS t
              FROM daily
            )
            SELECT event_type, d, n,
              CASE WHEN count(*) OVER wt * sum(t * t) OVER wt
                     - sum(t) OVER wt * sum(t) OVER wt > 0
                THEN CAST(count(*) OVER wt * sum(t * n) OVER wt
                    - sum(t) OVER wt * sum(n) OVER wt AS DOUBLE)
                  / CAST(count(*) OVER wt * sum(t * t) OVER wt
                    - sum(t) OVER wt * sum(t) OVER wt AS DOUBLE)
              END AS slope7
            FROM base
            WINDOW wt AS (PARTITION BY event_type ORDER BY t
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        """,
        "q278_vocab_coverage": """
            WITH vocab AS (
              SELECT t, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT unnest(list_filter(
                  string_split_regex(trim(text), '\\s+'), x -> x <> ''))
                  AS t
                FROM documents
              ) GROUP BY t
            ),
            ranked AS (
              SELECT t, c,
                CAST(row_number() OVER (ORDER BY c DESC, t) AS BIGINT)
                  AS rk,
                CAST(sum(c) OVER (ORDER BY c DESC, t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
                CAST(sum(c) OVER () AS BIGINT) AS total
              FROM vocab
            )
            SELECT CAST(k AS INT) AS k,
              cum AS covered_tokens, total AS total_tokens,
              CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
            FROM ranked
            JOIN (VALUES (5), (10), (20), (50)) AS ks(k) ON rk = k
        """,
        "q279_mann_whitney": """
            WITH vc AS (
              SELECT event_type, value, CAST(count(*) AS BIGINT) AS c
              FROM events WHERE value IS NOT NULL
              GROUP BY 1, 2
            ),
            less AS (
              SELECT a.event_type AS ta, b.event_type AS tb,
                a.value AS v, a.c AS ca,
                CAST(sum(b.c) AS BIGINT) AS less_b
              FROM vc a JOIN vc b
                ON a.event_type < b.event_type AND b.value < a.value
              GROUP BY 1, 2, 3, 4
            ),
            eq AS (
              SELECT a.event_type AS ta, b.event_type AS tb,
                a.value AS v, b.c AS cb
              FROM vc a JOIN vc b
                ON a.event_type < b.event_type AND a.value = b.value
            ),
            contrib AS (
              SELECT e.ta, e.tb, a.c AS ca, e.cb AS eq_b,
                coalesce(l.less_b, 0) AS less_b
              FROM eq e
              JOIN vc a ON a.event_type = e.ta AND a.value = e.v
              LEFT JOIN less l
                ON l.ta = e.ta AND l.tb = e.tb AND l.v = e.v
              UNION ALL
              SELECT l.ta, l.tb, l.ca, 0 AS eq_b, l.less_b
              FROM less l
              WHERE NOT EXISTS (
                SELECT 1 FROM eq e
                WHERE e.ta = l.ta AND e.tb = l.tb AND e.v = l.v
              )
            ),
            u2 AS (
              SELECT ta, tb,
                CAST(sum(ca * (2 * less_b + eq_b)) AS BIGINT) AS u2
              FROM contrib GROUP BY 1, 2
            ),
            sizes AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n
              FROM events WHERE value IS NOT NULL GROUP BY 1
            )
            SELECT ta, tb, na.n AS na, nb.n AS nb,
              u2 AS u_doubled,
              (CAST(u2 AS DOUBLE) - CAST(na.n * nb.n AS DOUBLE))
                / sqrt(CAST(na.n * nb.n * (na.n + nb.n + 1) AS DOUBLE)
                       / 3E0) AS z
            FROM u2
            JOIN sizes na ON ta = na.event_type
            JOIN sizes nb ON tb = nb.event_type
        """,
        "q280_effect_size": """
            WITH s AS (
              SELECT event_type, count(*) AS n,
                sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                  AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS sx,
                sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                  AS DECIMAL(19,0))
                  * CAST(CAST(value AS DECIMAL(18,2)) * 100
                  AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS sxx
              FROM events WHERE value IS NOT NULL
              GROUP BY event_type
            ),
            stats AS (
              SELECT event_type, CAST(n AS BIGINT) AS n,
                CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m,
                CAST(CAST(n AS DECIMAL(12,0)) * sxx - sx * sx AS DOUBLE)
                  / CAST(n AS DOUBLE) AS ssq
              FROM s
            )
            SELECT a.event_type AS ta, b.event_type AS tb,
              a.n AS na, b.n AS nb,
              CASE WHEN sqrt((a.ssq + b.ssq)
                  / CAST(a.n + b.n - 2 AS DOUBLE)) > 0
                THEN (a.m - b.m)
                  / sqrt((a.ssq + b.ssq) / CAST(a.n + b.n - 2 AS DOUBLE))
              END AS cohens_d
            FROM stats a JOIN stats b ON a.event_type < b.event_type
        """,
        "q282_horvitz_thompson": """
            WITH flagged AS (
              SELECT l_returnflag,
                CAST({rev} AS DECIMAL(38,6)) AS rev,
                substr(md5('ht1' || CAST(l_orderkey AS VARCHAR) || '-'
                  || CAST(l_linenumber AS VARCHAR)), 1, 8)
                  < '19999999' AS keep
              FROM lineitem
            ),
            agg AS (
              SELECT l_returnflag,
                sum(CASE WHEN keep THEN rev
                    ELSE CAST(0 AS DECIMAL(38,6)) END) AS s,
                CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_sampled,
                sum(rev) AS t,
                CAST(count(*) AS BIGINT) AS n_rows
              FROM flagged GROUP BY l_returnflag
            )
            SELECT l_returnflag, n_sampled, n_rows,
              CAST(s AS DOUBLE) / 0.1E0 AS ht_estimate,
              CAST(t AS DOUBLE) AS exact_total,
              (CAST(s AS DOUBLE) / 0.1E0 - CAST(t AS DOUBLE))
                / CAST(t AS DOUBLE) AS rel_error
            FROM agg
        """.format(rev=_REV_SQL),
        "q283_half_sample_ci": """
            WITH reps AS (
              SELECT CAST(r AS INT) AS rep
              FROM generate_series(0, 49) AS t(r)
            ),
            kept AS (
              SELECT rep, o_totalprice, o_orderdate
              FROM orders CROSS JOIN reps
              WHERE substr(md5('hs' || CAST(rep AS VARCHAR) || '-'
                || CAST(o_orderkey AS VARCHAR)), 1, 8) < '80000000'
            ),
            per_rep AS (
              SELECT rep,
                2E0 * CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                  AS DOUBLE)
                / CAST(count(DISTINCT CAST(o_orderdate AS DATE))
                  AS DOUBLE) AS mean_daily_rev
              FROM kept GROUP BY rep
            )
            SELECT CAST(count(*) AS BIGINT) AS n_reps,
              quantile_cont(mean_daily_rev, 0.05) AS ci_lo,
              quantile_cont(mean_daily_rev, 0.5) AS ci_mid,
              quantile_cont(mean_daily_rev, 0.95) AS ci_hi
            FROM per_rep
        """,
        "q284_mutual_knn": """
            WITH v AS (
              SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings WHERE vec_id < 50
            ),
            scored AS (
              SELECT q.vec_id AS qid, c.vec_id AS cid,
                list_dot_product(q.e, c.e)
                  / (sqrt(list_dot_product(q.e, q.e))
                     * sqrt(list_dot_product(c.e, c.e))) AS cosine
              FROM v q JOIN v c ON q.vec_id <> c.vec_id
            ),
            edges AS (
              SELECT qid, cid FROM (
                SELECT qid, cid,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY cosine DESC, cid) AS rk
                FROM scored
              ) WHERE rk <= 3
            ),
            agg AS (
              SELECT
                (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
                (SELECT CAST(count(*) AS BIGINT) FROM edges e
                 WHERE EXISTS (SELECT 1 FROM edges r
                   WHERE r.qid = e.cid AND r.cid = e.qid)) AS n_mutual
            )
            SELECT n_edges, n_mutual,
              CAST(n_mutual AS DOUBLE) / CAST(n_edges AS DOUBLE)
                AS mutual_rate
            FROM agg
        """,
        "q285_centroid_silhouette": """
            WITH c AS (
              SELECT label, i AS dim,
                sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,8)))
                  AS s
              FROM embeddings,
                unnest(generate_series(1, len(embedding))) AS t(i)
              GROUP BY label, i
            ),
            cv AS (
              SELECT label AS clabel,
                list(CAST(s AS DOUBLE) ORDER BY dim) AS cvec
              FROM c GROUP BY label
            ),
            pts AS (
              SELECT vec_id, label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings
            ),
            cos AS (
              SELECT vec_id, label, clabel,
                list_dot_product(e, cvec)
                  / (sqrt(list_dot_product(e, e))
                     * sqrt(list_dot_product(cvec, cvec))) AS cos
              FROM pts CROSS JOIN cv
            ),
            own AS (
              SELECT vec_id, label, cos AS own_cos
              FROM cos WHERE label = clabel
            ),
            other AS (
              SELECT vec_id, max(cos) AS other_cos
              FROM cos WHERE label <> clabel GROUP BY vec_id
            )
            SELECT label,
              CAST(count(*) AS BIGINT) AS n_vecs,
              CAST(sum(CAST(own_cos - other_cos AS DECIMAL(38,6)))
                AS DOUBLE) / count(own_cos - other_cos) AS silhouette
            FROM own JOIN other USING (vec_id)
            GROUP BY label
        """,
        "q286_decayed_popularity": """
            WITH horizon AS (SELECT max(l_shipdate) AS h FROM lineitem),
            scored AS (
              SELECT l_partkey,
                CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE)
                  * pow(2.0E0, -CAST(floor(
                      date_diff('day', l_shipdate, h) / 7) AS DOUBLE))
                  AS term
              FROM lineitem CROSS JOIN horizon
            ),
            per_part AS (
              SELECT l_partkey,
                CAST(sum(CAST(term AS DECIMAL(38,6))) AS DOUBLE)
                  AS decayed_qty,
                CAST(count(*) AS BIGINT) AS n_sales
              FROM scored GROUP BY l_partkey
            )
            SELECT CAST(rk AS INT) AS rk, l_partkey, decayed_qty, n_sales
            FROM (
              SELECT l_partkey, decayed_qty, n_sales,
                row_number() OVER (ORDER BY decayed_qty DESC, l_partkey)
                  AS rk
              FROM per_part
            ) WHERE rk <= 20
        """,
        "q287_anova_f": """
            WITH g AS (
              SELECT event_type, count(*) AS n,
                sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                  AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS s,
                sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                  AS DECIMAL(19,0))
                  * CAST(CAST(value AS DECIMAL(18,2)) * 100
                  AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS ss
              FROM events WHERE value IS NOT NULL
              GROUP BY event_type
            ),
            per AS (
              SELECT event_type, n,
                CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                  AS s2n,
                CAST(s AS DOUBLE) AS sd,
                CAST(ss AS DOUBLE) AS ssd
              FROM g
            ),
            tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS N,
                CAST(count(*) AS BIGINT) AS k,
                CAST(sum(CAST(s2n AS DECIMAL(38,6))) AS DOUBLE)
                  AS sum_s2n,
                CAST(sum(CAST(sd AS DECIMAL(38,6))) AS DOUBLE) AS S,
                CAST(sum(CAST(ssd AS DECIMAL(38,6))) AS DOUBLE) AS SS
              FROM per
            )
            SELECT N AS n_rows, k AS n_groups,
              sum_s2n - S * S / CAST(N AS DOUBLE) AS ssb,
              SS - sum_s2n AS ssw,
              ((sum_s2n - S * S / CAST(N AS DOUBLE))
                / CAST(k - 1 AS DOUBLE))
              / ((SS - sum_s2n) / CAST(N - k AS DOUBLE)) AS f_stat
            FROM tot
        """,
        "q288_retrieval_scoring": """
            WITH tok AS (
              SELECT doc_id,
                unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                  x -> x <> '')) AS t
              FROM documents
            ),
            lens AS (
              SELECT doc_id,
                CAST(length(list_filter(
                  string_split_regex(trim(text), '\\s+'), x -> x <> ''))
                  AS BIGINT) AS len
              FROM documents
            ),
            stats AS (
              SELECT CAST(count(*) AS BIGINT) AS N,
                CAST(sum(len) AS BIGINT) AS total_len
              FROM lens
            ),
            tf AS (
              SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
              FROM tok WHERE t IN ('spark', 'table', 'join')
              GROUP BY 1, 2
            ),
            dfr AS (
              SELECT t, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY t
            ),
            terms AS (
              SELECT tf.doc_id,
                ((CAST(N AS DOUBLE) - CAST(df AS DOUBLE) + 0.5E0)
                  / (CAST(df AS DOUBLE) + 0.5E0))
                * ((CAST(tf AS DOUBLE) * 2.2E0)
                  / (CAST(tf AS DOUBLE)
                    + 1.2E0 * (0.25E0 + 0.75E0 * CAST(len AS DOUBLE)
                      / (CAST(total_len AS DOUBLE) / CAST(N AS DOUBLE)))))
                  AS term_score
              FROM tf
              JOIN dfr USING (t)
              JOIN lens ON tf.doc_id = lens.doc_id
              CROSS JOIN stats
            ),
            scored AS (
              SELECT doc_id,
                CAST(sum(CAST(term_score AS DECIMAL(38,6))) AS DOUBLE)
                  AS score,
                CAST(count(*) AS BIGINT) AS n_terms_hit
              FROM terms GROUP BY doc_id
            )
            SELECT CAST(rk AS INT) AS rk, doc_id, score, n_terms_hit
            FROM (
              SELECT doc_id, score, n_terms_hit,
                row_number() OVER (ORDER BY score DESC, doc_id) AS rk
              FROM scored
            ) WHERE rk <= 10
        """,
        "q289_hoover_index": """
            WITH per_cust AS (
              SELECT o_custkey,
                sum(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
              FROM orders GROUP BY o_custkey
            ),
            tot AS (
              SELECT sum(rev) AS T, count(*) AS n FROM per_cust
            ),
            dev AS (
              SELECT n,
                abs(CAST(rev AS DOUBLE) / CAST(T AS DOUBLE)
                  - 1E0 / CAST(n AS DOUBLE)) AS d
              FROM per_cust CROSS JOIN tot
            )
            SELECT CAST(max(n) AS BIGINT) AS n_customers,
              CAST(sum(CAST(d AS DECIMAL(38,6))) AS DOUBLE) / 2E0
                AS hoover
            FROM dev
        """,
        "q290_freshness_audit": """
            WITH u AS (
              SELECT 'events' AS table_name,
                CAST(max(ts) AS DATE) AS max_day,
                CAST(min(ts) AS DATE) AS min_day,
                CAST(count(*) AS BIGINT) AS n_rows
              FROM events
              UNION ALL
              SELECT 'orders',
                CAST(max(o_orderdate) AS DATE),
                CAST(min(o_orderdate) AS DATE),
                CAST(count(*) AS BIGINT)
              FROM orders
              UNION ALL
              SELECT 'lineitem',
                CAST(max(l_shipdate) AS DATE),
                CAST(min(l_shipdate) AS DATE),
                CAST(count(*) AS BIGINT)
              FROM lineitem
            )
            SELECT table_name, max_day, min_day,
              CAST(date_diff('day', min_day, max_day) + 1 AS INT)
                AS span_days,
              n_rows
            FROM u
        """,
        "q291_skyline_parts": """
            SELECT p_partkey,
              CAST(p_retailprice AS DOUBLE) AS price,
              CAST(p_size AS INT) AS size
            FROM part p
            WHERE NOT EXISTS (
              SELECT 1 FROM part d
              WHERE d.p_retailprice <= p.p_retailprice
                AND d.p_size >= p.p_size
                AND (d.p_retailprice < p.p_retailprice
                     OR d.p_size > p.p_size)
            )
        """,
        "q292_seasonal_index": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            r AS (
              SELECT event_type,
                CAST(dayofweek(d) + 1 AS INT) AS dow,
                CASE WHEN count(*) OVER wc = 7 THEN
                  CAST(n AS DOUBLE)
                  / (CAST(sum(n) OVER wc AS DOUBLE)
                     / CAST(count(*) OVER wc AS DOUBLE)) END AS ratio
              FROM daily
              WINDOW wc AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
            )
            SELECT event_type, dow,
              CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(CAST(ratio AS DECIMAL(38,6))) AS DOUBLE)
                / count(ratio) AS seasonal_index
            FROM r WHERE ratio IS NOT NULL
            GROUP BY event_type, dow
        """,
        "q293_abc_xyz": """
            WITH rev AS (
              SELECT l_partkey, sum({rev}) AS r
              FROM lineitem GROUP BY l_partkey
            ),
            abc AS (
              SELECT l_partkey,
                CASE WHEN CAST(sum(r) OVER (ORDER BY r DESC, l_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / CAST(sum(r) OVER () AS DOUBLE) <= 0.80E0
                  THEN 'A'
                  WHEN CAST(sum(r) OVER (ORDER BY r DESC, l_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / CAST(sum(r) OVER () AS DOUBLE) <= 0.95E0
                  THEN 'B' ELSE 'C' END AS abc
              FROM rev
            ),
            weekly AS (
              SELECT l_partkey, date_trunc('week', l_shipdate) AS w,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * 100)
                  AS DECIMAL(38,0)) AS q
              FROM lineitem GROUP BY 1, 2
            ),
            mom AS (
              SELECT l_partkey, count(*) AS k,
                sum(q) AS s1,
                sum(CAST(q * q AS DECIMAL(38,0))) AS s2
              FROM weekly GROUP BY l_partkey
            ),
            xyz AS (
              SELECT l_partkey,
                CASE WHEN k < 2 THEN 'Z'
                  WHEN (sqrt(CAST(CAST(k AS DECIMAL(12,0)) * s2
                        - s1 * s1 AS DOUBLE)) / CAST(k AS DOUBLE))
                    / (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)) < 0.5E0
                  THEN 'X'
                  WHEN (sqrt(CAST(CAST(k AS DECIMAL(12,0)) * s2
                        - s1 * s1 AS DOUBLE)) / CAST(k AS DOUBLE))
                    / (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)) < 1.0E0
                  THEN 'Y' ELSE 'Z' END AS xyz
              FROM mom
            )
            SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts
            FROM abc JOIN xyz USING (l_partkey)
            GROUP BY abc, xyz
        """.format(rev=_REV_SQL),
        "q294_term_burstiness": """
            WITH tok AS (
              SELECT doc_id,
                unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                  x -> x <> '')) AS t
              FROM documents
            ),
            stats AS (
              SELECT t AS term,
                CAST(count(*) AS BIGINT) AS cf,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM tok GROUP BY t HAVING count(*) >= 10
            )
            SELECT CAST(rk AS INT) AS rk, term, cf, df, burstiness
            FROM (
              SELECT term, cf, df,
                CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness,
                row_number() OVER (
                  ORDER BY CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) DESC,
                    term) AS rk
              FROM stats
            ) WHERE rk <= 20
        """,
        "q295_join_size_estimate": """
            WITH ca AS (
              SELECT o_orderkey, CAST(count(*) AS BIGINT) AS cnt_a
              FROM orders GROUP BY o_orderkey
            ),
            cb AS (
              SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt_b
              FROM lineitem GROUP BY l_orderkey
            ),
            est AS (
              SELECT CAST(sum(cnt_a * cnt_b) AS BIGINT) AS est_rows
              FROM ca JOIN cb ON o_orderkey = l_orderkey
            ),
            act AS (
              SELECT CAST(count(*) AS BIGINT) AS actual_rows
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            )
            SELECT est_rows, actual_rows,
              est_rows = actual_rows AS exact
            FROM est CROSS JOIN act
        """,
        "q296_rare_collapse": """
            WITH counts AS (
              SELECT concat_ws('|', event_type,
                CAST(json_extract_string(props, '$.k') AS VARCHAR))
                AS cat,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            )
            SELECT CASE WHEN n >= 25 THEN cat ELSE '__other__' END
                AS category,
              CAST(sum(n) AS BIGINT) AS n_rows,
              CAST(count(*) AS BIGINT) AS n_source_cats
            FROM counts GROUP BY 1
        """,
        "q297_loo_target_encoding": """
            WITH g AS (
              SELECT event_type,
                sum(CAST(CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,6)))
                  AS sg,
                count(*) AS ng
              FROM events WHERE value IS NOT NULL
              GROUP BY event_type
            )
            SELECT event_id, e.event_type,
              CAST(sg - CAST(CAST(value AS DECIMAL(18,2))
                AS DECIMAL(38,6)) AS DOUBLE)
                / CAST(ng - 1 AS DOUBLE) AS loo_encoding
            FROM events e JOIN g ON e.event_type = g.event_type
            WHERE value IS NOT NULL
        """,
        "q298_feature_hashing": """
            WITH b AS (
              SELECT
                concat_ws('|', event_type,
                  CAST(dayofweek(ts) + 1 AS VARCHAR)) AS crossed,
                substr(md5('fh1' || concat_ws('|', event_type,
                  CAST(dayofweek(ts) + 1 AS VARCHAR))), 1, 2) AS bucket
              FROM events
            )
            SELECT bucket,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(DISTINCT crossed) AS BIGINT) AS n_crosses
            FROM b GROUP BY bucket
        """,
        "q299_m_estimate_encoding": """
            WITH g AS (
              SELECT event_type,
                sum(CAST(CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,6)))
                  AS sg,
                count(*) AS ng
              FROM events WHERE value IS NOT NULL
              GROUP BY event_type
            ),
            tot AS (
              SELECT sum(CAST(CAST(value AS DECIMAL(18,2))
                AS DECIMAL(38,6))) AS st,
                count(*) AS nt
              FROM events WHERE value IS NOT NULL
            )
            SELECT event_type, CAST(ng AS BIGINT) AS n,
              CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS raw_mean,
              (CAST(sg AS DOUBLE)
                + 20E0 * (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)))
                / (CAST(ng AS DOUBLE) + 20E0) AS m_encoding
            FROM g CROSS JOIN tot
        """,
        "q301_window_dataset": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            built AS (
              SELECT event_type, d,
                CASE WHEN count(*) OVER wf = 7 THEN
                  array_to_string(list(CAST(n AS VARCHAR)) OVER wf, ',')
                END AS features_csv,
                lead(n) OVER wt AS label
              FROM daily
              WINDOW wt AS (PARTITION BY event_type ORDER BY d),
              wf AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            )
            SELECT event_type, d, features_csv, label
            FROM built
            WHERE features_csv IS NOT NULL AND label IS NOT NULL
        """,
        "q302_multihot_encoding": """
            WITH masked AS (
              SELECT user_id,
                CAST(1 << (CASE event_type
                  WHEN 'click' THEN 0 WHEN 'error' THEN 1
                  WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
                  WHEN 'view' THEN 4 ELSE 5 END) AS BIGINT) AS bit
              FROM events
            ),
            per_user AS (
              SELECT user_id, CAST(bit_or(bit) AS BIGINT) AS mask
              FROM masked GROUP BY user_id
            )
            SELECT user_id, mask,
              CAST(bit_count(mask) AS INT) AS n_types,
              (mask & 4) > 0 AS has_purchase,
              (mask & 2) > 0 AS has_error
            FROM per_user
        """,
        "q303_clustering_coeff": """
            WITH grp AS (
              SELECT DISTINCT user_id,
                concat_ws('|', event_type,
                  CAST(date_trunc('day', ts) AS VARCHAR)) AS g
              FROM events
            ),
            edges AS (
              SELECT DISTINCT a.user_id AS u, b.user_id AS v
              FROM grp a JOIN grp b
                ON a.g = b.g AND a.user_id < b.user_id
            ),
            deg AS (
              SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
                SELECT u AS n FROM edges
                UNION ALL SELECT v AS n FROM edges
              ) GROUP BY n
            ),
            triads AS (
              SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS triads
              FROM deg
            ),
            tri AS (
              SELECT CAST(count(*) AS BIGINT) AS triangles
              FROM edges e1
              JOIN edges e2 ON e1.v = e2.u
              JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
            )
            SELECT triangles, triads,
              3E0 * CAST(triangles AS DOUBLE) / CAST(triads AS DOUBLE)
                AS clustering_coeff
            FROM tri CROSS JOIN triads
        """,
        "q304_value_at_risk": """
            WITH daily AS (
              SELECT CAST(o_orderdate AS DATE) AS d,
                CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                  AS rev
              FROM orders GROUP BY 1
            ),
            deltas AS (
              SELECT rev - lag(rev) OVER (ORDER BY d) AS chg FROM daily
            )
            SELECT CAST(count(*) AS BIGINT) AS n_days,
              quantile_cont(chg, 0.05) AS var_95,
              quantile_cont(chg, 0.01) AS var_99,
              min(chg) AS worst_day
            FROM deltas WHERE chg IS NOT NULL
        """,
        "q305_partition_skew": """
            WITH per AS (
              SELECT CAST(l_shipdate AS DATE) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM lineitem GROUP BY 1
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS k,
                CAST(sum(n) AS BIGINT) AS s1,
                CAST(sum(n * n) AS BIGINT) AS s2,
                CAST(max(n) AS BIGINT) AS mx
              FROM per
            )
            SELECT k AS n_partitions, mx AS max_rows,
              CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS mean_rows,
              CAST(mx AS DOUBLE)
                / (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)) AS max_over_mean,
              (sqrt(CAST(k * s2 - s1 * s1 AS DOUBLE)) / CAST(k AS DOUBLE))
                / (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)) AS cv
            FROM agg
        """,
        "q306_lang_confusion": """
            WITH toks AS (
              SELECT lang,
                list_transform(
                  list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x <> ''),
                  t -> lower(t)
                ) AS tok
              FROM documents
            ),
            pred AS (
              SELECT lang,
                CASE WHEN best.score > 0 THEN best.lang
                     ELSE 'unknown' END AS pred
              FROM (
                SELECT lang,
                  list_aggregate([
                    {'score': len(list_filter(tok, t ->
                      list_contains(['the','and','of','is','to'], t))),
                     'lang': 'en'},
                    {'score': len(list_filter(tok, t ->
                      list_contains(['el','la','los','es','una'], t))),
                     'lang': 'es'},
                    {'score': len(list_filter(tok, t ->
                      list_contains(['der','die','und','ist','ein'], t))),
                     'lang': 'de'},
                    {'score': len(list_filter(tok, t ->
                      list_contains(['le','les','est','une','dans'], t))),
                     'lang': 'fr'}
                  ], 'max') AS best
                FROM toks
              )
            ),
            cells AS (
              SELECT lang, pred, CAST(count(*) AS BIGINT) AS n
              FROM pred GROUP BY 1, 2
            )
            SELECT lang, pred, n,
              CAST(n AS DOUBLE)
                / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE)
                AS row_share
            FROM cells
        """,
        "q307_detector_eval": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            boosted AS (
              SELECT event_type, d,
                substr(md5('inj' || event_type || CAST(CAST(d AS DATE) AS VARCHAR)),
                  1, 8) < '33333333' AS is_injected,
                CASE WHEN substr(md5('inj' || event_type
                    || CAST(CAST(d AS DATE) AS VARCHAR)), 1, 8) < '33333333'
                  THEN (n * 16) / 10
                  ELSE CAST(n AS DOUBLE) END AS nb
              FROM daily
            ),
            scored AS (
              SELECT event_type, d, is_injected,
                CASE WHEN sum(nb) OVER wt / count(*) OVER wt IS NOT NULL
                  AND nb > 1.3E0 * (sum(nb) OVER wt / count(*) OVER wt)
                THEN 1 ELSE 0 END AS flagged
              FROM boosted
              WINDOW wt AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
            ),
            per_type AS (
              SELECT event_type,
                CAST(sum(CASE WHEN is_injected AND flagged = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(sum(CASE WHEN NOT is_injected AND flagged = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                CAST(sum(CASE WHEN is_injected AND flagged = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS fn
              FROM scored GROUP BY event_type
            )
            SELECT event_type, tp, fp, fn,
              CASE WHEN tp + fp > 0 THEN
                CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END
                AS precision,
              CASE WHEN tp + fn > 0 THEN
                CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END
                AS recall
            FROM per_type
        """,
        "q308_srm_check": """
            WITH users AS (SELECT DISTINCT user_id FROM events),
            assigned AS (
              SELECT user_id,
                CASE WHEN substr(md5('v1' || CAST(user_id AS VARCHAR)),
                    1, 8) < 'cccccccc' THEN 'train'
                  WHEN substr(md5('v1' || CAST(user_id AS VARCHAR)),
                    1, 8) < 'e6666666' THEN 'val'
                  ELSE 'test' END AS split
              FROM users
            ),
            counts AS (
              SELECT split, CAST(count(*) AS BIGINT) AS n
              FROM assigned GROUP BY split
            ),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM counts)
            SELECT split, n,
              (CASE WHEN split = 'train' THEN 0.8E0 ELSE 0.1E0 END)
                * CAST(nt AS DOUBLE) AS expected,
              (CAST(n AS DOUBLE)
                - (CASE WHEN split = 'train' THEN 0.8E0 ELSE 0.1E0 END)
                  * CAST(nt AS DOUBLE))
              * (CAST(n AS DOUBLE)
                - (CASE WHEN split = 'train' THEN 0.8E0 ELSE 0.1E0 END)
                  * CAST(nt AS DOUBLE))
              / ((CASE WHEN split = 'train' THEN 0.8E0 ELSE 0.1E0 END)
                  * CAST(nt AS DOUBLE)) AS chi2_term
            FROM counts CROSS JOIN tot
        """,
        "q309_temporal_integrity": """
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                < 0 THEN 1 ELSE 0 END) AS BIGINT) AS ship_before_order,
              CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                > 90 THEN 1 ELSE 0 END) AS BIGINT) AS ship_after_90d,
              CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS INT)
                AS max_gap_days,
              CAST(min(date_diff('day', o_orderdate, l_shipdate)) AS INT)
                AS min_gap_days
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        """,
        "q310_mix_shift": """
            WITH mp AS (
              SELECT date_trunc('month', o_orderdate) AS m,
                o_orderpriority, CAST(count(*) AS BIGINT) AS n
              FROM orders GROUP BY 1, 2
            ),
            overall AS (
              SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS no
              FROM orders GROUP BY 1
            ),
            ref AS (
              SELECT o_orderpriority,
                CAST(no AS DOUBLE) / CAST(sum(no) OVER () AS DOUBLE)
                  AS ref_share
              FROM overall
            ),
            cells AS (
              SELECT m,
                CAST(n AS DOUBLE)
                  / CAST(sum(n) OVER (PARTITION BY m) AS DOUBLE) AS share,
                ref_share
              FROM mp JOIN ref USING (o_orderpriority)
            )
            SELECT m,
              CAST(sum(CAST(abs(share - ref_share) AS DECIMAL(38,6)))
                AS DOUBLE) / 2E0 AS tvd,
              CAST(count(*) AS BIGINT) AS n_priorities
            FROM cells GROUP BY m
        """,
        "q311_ljung_box": """
            WITH lagged AS (
              SELECT event_type, value AS x,
                lead(value, 1) OVER w AS y1,
                lead(value, 2) OVER w AS y2,
                lead(value, 3) OVER w AS y3,
                lead(value, 4) OVER w AS y4,
                lead(value, 5) OVER w AS y5
              FROM events
              WINDOW w AS (PARTITION BY event_type ORDER BY ts)
            ),
            pairs AS (
              SELECT event_type, 1 AS lag, x, y1 AS y FROM lagged
              UNION ALL SELECT event_type, 2, x, y2 FROM lagged
              UNION ALL SELECT event_type, 3, x, y3 FROM lagged
              UNION ALL SELECT event_type, 4, x, y4 FROM lagged
              UNION ALL SELECT event_type, 5, x, y5 FROM lagged
            ),
            ints AS (
              SELECT event_type, lag,
                CAST(CAST(x AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS xi,
                CAST(CAST(y AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS yi
              FROM pairs WHERE x IS NOT NULL AND y IS NOT NULL
            ),
            s AS (
              SELECT event_type, lag, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(yi AS DECIMAL(38,0))) AS sy,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx,
                sum(CAST(yi * yi AS DECIMAL(38,0))) AS syy,
                sum(CAST(xi * yi AS DECIMAL(38,0))) AS sxy
              FROM ints GROUP BY 1, 2
            ),
            e AS (
              SELECT event_type, lag, n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxy AS DECIMAL(24,0)) AS DECIMAL(36,0))
                     - CAST(CAST(sx AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0)) AS DECIMAL(36,0)) AS DOUBLE) AS cov_n,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(24,0)) AS DECIMAL(36,0))
                     - CAST(CAST(sx AS DECIMAL(18,0)) * CAST(sx AS DECIMAL(18,0)) AS DECIMAL(36,0)) AS DOUBLE) AS var_x,
                CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(syy AS DECIMAL(24,0)) AS DECIMAL(36,0))
                     - CAST(CAST(sy AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0)) AS DECIMAL(36,0)) AS DOUBLE) AS var_y
              FROM s
            ),
            r AS (
              SELECT event_type, lag,
                CASE WHEN sqrt(var_x) * sqrt(var_y) > 0
                     THEN cov_n / (sqrt(var_x) * sqrt(var_y)) END AS acf
              FROM e
            ),
            ns AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS len
              FROM events GROUP BY event_type
            ),
            per AS (
              SELECT r.event_type, max(len) AS len,
                CAST(sum(CAST((acf * acf) / CAST(len - lag AS DOUBLE)
                  AS DECIMAL(38,6))) AS DOUBLE) AS ssum,
                CAST(count(*) AS BIGINT) AS n_lags
              FROM r JOIN ns ON r.event_type = ns.event_type
              WHERE acf IS NOT NULL
              GROUP BY r.event_type
            )
            SELECT event_type, CAST(len AS BIGINT) AS n_obs, n_lags,
              CAST(len AS DOUBLE) * CAST(len + 2 AS DOUBLE) * ssum
                AS ljung_box_q
            FROM per
        """,
        "q312_fd_discovery": """
            WITH wide AS (
              SELECT
                CAST(count(DISTINCT o_orderkey) AS BIGINT) AS l1,
                CAST(count(DISTINCT (o_orderkey, o_custkey)) AS BIGINT)
                  AS p1,
                CAST(count(DISTINCT o_orderkey) AS BIGINT) AS l2,
                CAST(count(DISTINCT (o_orderkey, o_orderstatus))
                  AS BIGINT) AS p2,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS l3,
                CAST(count(DISTINCT (o_custkey, o_orderpriority))
                  AS BIGINT) AS p3,
                CAST(count(DISTINCT o_orderdate) AS BIGINT) AS l4,
                CAST(count(DISTINCT (o_orderdate, o_orderstatus))
                  AS BIGINT) AS p4
              FROM orders
            )
            SELECT 'o_orderkey' AS lhs, 'o_custkey' AS rhs,
              l1 AS n_lhs, p1 AS n_pair, l1 = p1 AS is_fd FROM wide
            UNION ALL
            SELECT 'o_orderkey', 'o_orderstatus', l2, p2, l2 = p2
            FROM wide
            UNION ALL
            SELECT 'o_custkey', 'o_orderpriority', l3, p3, l3 = p3
            FROM wide
            UNION ALL
            SELECT 'o_orderdate', 'o_orderstatus', l4, p4, l4 = p4
            FROM wide
        """,
        "q313_order_inversions": """
            SELECT a.user_id,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(CASE WHEN a.ts > b.ts THEN 1 ELSE 0 END)
                AS BIGINT) AS inversions,
              CAST(sum(CASE WHEN a.ts > b.ts THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS inversion_rate
            FROM events a JOIN events b
              ON a.user_id = b.user_id AND a.event_id < b.event_id
            GROUP BY a.user_id
        """,
        "q314_dataset_card": """
            WITH per_doc AS (
              SELECT doc_id, lang,
                CAST(length(list_filter(
                  string_split_regex(trim(text), '\\s+'), x -> x <> ''))
                  AS BIGINT) AS nt,
                CAST(length(text) AS BIGINT) AS nc,
                md5(text) AS h
              FROM documents
            ),
            vocab AS (
              SELECT CAST(count(DISTINCT t) AS BIGINT) AS vocab FROM (
                SELECT unnest(list_filter(
                  string_split_regex(trim(text), '\\s+'), x -> x <> ''))
                  AS t
                FROM documents
              )
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(nt) AS BIGINT) AS n_tokens,
                CAST(sum(nc) AS BIGINT) AS n_chars,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                CAST(count(DISTINCT h) AS BIGINT) AS n_unique_texts
              FROM per_doc
            )
            SELECT n_docs, n_tokens, n_chars, n_langs, vocab,
              CAST(n_docs - n_unique_texts AS DOUBLE)
                / CAST(n_docs AS DOUBLE) AS exact_dup_rate,
              CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
                AS mean_doc_tokens
            FROM agg CROSS JOIN vocab
        """,
        "q315_zonemap_skipping": """
            WITH zones AS (
              SELECT CAST(l_shipdate AS DATE) AS d,
                min(l_extendedprice) AS zmin,
                max(l_extendedprice) AS zmax,
                CAST(count(*) AS BIGINT) AS n_rows
              FROM lineitem GROUP BY 1
            )
            SELECT CAST(count(*) AS BIGINT) AS n_partitions,
              CAST(sum(CASE WHEN zmax <= 45000.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_skippable,
              CAST(sum(CASE WHEN zmax <= 45000.0 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS skip_fraction,
              CAST(sum(CASE WHEN zmax <= 45000.0 THEN n_rows ELSE 0 END)
                AS BIGINT) AS rows_skipped
            FROM zones
        """,
        "q316_gains_table": """
            WITH per_user AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS activity,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS converted
              FROM events GROUP BY user_id
            ),
            binned AS (
              SELECT user_id, converted,
                ntile(10) OVER (ORDER BY activity DESC, user_id)
                  AS decile
              FROM per_user
            ),
            per_dec AS (
              SELECT decile,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(converted) AS BIGINT) AS n_conv
              FROM binned GROUP BY decile
            )
            SELECT CAST(decile AS INT) AS decile, n_users, n_conv,
              CAST(sum(n_conv) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / CAST(sum(n_conv) OVER () AS DOUBLE)
                AS cum_capture,
              (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
                / (CAST(sum(n_conv) OVER () AS DOUBLE)
                  / CAST(sum(n_users) OVER () AS DOUBLE)) AS lift
            FROM per_dec
        """,
        "q317_delta_method": """
            WITH per_user AS (
              SELECT event_type, user_id,
                sum(CAST(value AS DECIMAL(18,2))) AS x,
                count(*) AS y
              FROM events WHERE value IS NOT NULL
              GROUP BY 1, 2
            ),
            ints AS (
              SELECT event_type,
                CAST(x * 100 AS DECIMAL(19,0)) AS xi,
                CAST(y AS DECIMAL(19,0)) AS yi
              FROM per_user
            ),
            s AS (
              SELECT event_type, count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(yi AS DECIMAL(38,0))) AS sy,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx,
                sum(CAST(yi * yi AS DECIMAL(38,0))) AS syy,
                sum(CAST(xi * yi AS DECIMAL(38,0))) AS sxy
              FROM ints GROUP BY event_type
            ),
            e AS (
              SELECT event_type, n,
                CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
                CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
                CAST(CAST(n AS DECIMAL(12,0)) * sxx - sx * sx AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS vx,
                CAST(CAST(n AS DECIMAL(12,0)) * syy - sy * sy AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS vy,
                CAST(CAST(n AS DECIMAL(12,0)) * sxy - sx * sy AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cxy
              FROM s
            )
            SELECT event_type, CAST(n AS BIGINT) AS n_users,
              (mx / my) / 100E0 AS ratio,
              sqrt(((mx / my) * (mx / my))
                * (vx / (mx * mx) + vy / (my * my)
                   - 2E0 * cxy / (mx * my))
                / CAST(n AS DOUBLE)) / 100E0 AS se_delta
            FROM e
        """,
        "q318_winsorized_mean": """
            WITH bounds AS (
              SELECT event_type,
                quantile_cont(value, 0.05) AS p5,
                quantile_cont(value, 0.95) AS p95
              FROM events WHERE value IS NOT NULL
              GROUP BY event_type
            )
            SELECT e.event_type,
              CAST(count(*) AS BIGINT) AS n,
              {raw} AS raw_mean,
              CAST(sum(CAST(least(greatest(value, p5), p95)
                AS DECIMAL(38,6))) AS DOUBLE)
                / count(least(greatest(value, p5), p95))
                AS winsorized_mean
            FROM events e JOIN bounds b ON e.event_type = b.event_type
            WHERE value IS NOT NULL
            GROUP BY e.event_type
        """.format(raw=_davg_sql("value")),
        "q319_tail_attribution": """
            WITH thr AS (
              SELECT quantile_cont(value, 0.99) AS p99
              FROM events WHERE value IS NOT NULL
            ),
            per_type AS (
              SELECT event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN value > p99 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_tail,
                max(p99) AS p99
              FROM events CROSS JOIN thr
              WHERE value IS NOT NULL
              GROUP BY event_type
            )
            SELECT event_type, n, n_tail, p99,
              CAST(n_tail AS DOUBLE)
                / CAST(sum(n_tail) OVER () AS DOUBLE) AS tail_share,
              CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE)
                AS body_share
            FROM per_type
        """,
        "q320_log2_histogram": """
            WITH gaps AS (
              SELECT event_type,
                CAST(floor(epoch(ts)) AS BIGINT)
                  - CAST(floor(epoch(lag(ts) OVER (
                      PARTITION BY event_type, user_id
                      ORDER BY ts, event_id))) AS BIGINT) AS g
              FROM events
            )
            SELECT event_type,
              CAST(CASE WHEN g <= 0 THEN 0
                ELSE length(printf('%b', g)) - 1 END AS INT)
                AS log2_bucket,
              CAST(count(*) AS BIGINT) AS n
            FROM gaps WHERE g IS NOT NULL
            GROUP BY 1, 2
        """,
        "q321_periodicity_detector": """
            WITH gaps AS (
              SELECT user_id,
                CAST(floor((CAST(floor(epoch(ts)) AS BIGINT)
                  - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id))) AS BIGINT)) / 60)
                  AS BIGINT) AS gap_min
              FROM events
            ),
            per_gap AS (
              SELECT user_id, gap_min, CAST(count(*) AS BIGINT) AS n
              FROM gaps WHERE gap_min IS NOT NULL
              GROUP BY 1, 2
            ),
            ranked AS (
              SELECT user_id, gap_min, n,
                CAST(sum(n) OVER (PARTITION BY user_id) AS BIGINT)
                  AS total,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY n DESC, gap_min) AS rk
              FROM per_gap
            )
            SELECT user_id, gap_min AS modal_gap_min, n AS n_at_mode,
              total AS n_gaps,
              CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS mode_share
            FROM ranked WHERE rk = 1 AND total >= 5
        """,
        "q322_rle_estimate": """
            WITH runs AS (
              SELECT
                CASE WHEN lag(event_type) OVER w IS NULL
                  OR lag(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS rt,
                CASE WHEN lag(user_id) OVER w IS NULL
                  OR lag(user_id) OVER w <> user_id
                THEN 1 ELSE 0 END AS ru
              FROM events
              WINDOW w AS (ORDER BY ts, event_id)
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(rt) AS BIGINT) AS runs_event_type,
                CAST(sum(ru) AS BIGINT) AS runs_user_id
              FROM runs
            )
            SELECT n_rows, runs_event_type, runs_user_id,
              CAST(n_rows AS DOUBLE) / CAST(runs_event_type AS DOUBLE)
                AS rle_ratio_event_type,
              CAST(n_rows AS DOUBLE) / CAST(runs_user_id AS DOUBLE)
                AS rle_ratio_user_id
            FROM agg
        """,
        "q323_hellinger_drift": """
            WITH counts AS (
              SELECT event_type,
                CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a'
                     ELSE 'b' END AS h,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            shares AS (
              SELECT event_type, h,
                CAST(n AS DOUBLE)
                  / CAST(sum(n) OVER (PARTITION BY h) AS DOUBLE) AS p
              FROM counts
            ),
            grid AS (
              SELECT event_type,
                coalesce(sum(CASE WHEN h = 'a' THEN p END), 0E0) AS pa,
                coalesce(sum(CASE WHEN h = 'b' THEN p END), 0E0) AS pb
              FROM shares GROUP BY event_type
            )
            SELECT CAST(count(*) AS BIGINT) AS n_categories,
              1E0 - CAST(sum(CAST(sqrt(pa * pb) AS DECIMAL(38,6)))
                AS DOUBLE) AS hellinger_sq
            FROM grid
        """,
        "q324_grubbs": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            scored AS (
              SELECT event_type, d, n,
                abs(CAST(n AS DOUBLE)
                  - CAST(sum(n) OVER wall AS DOUBLE)
                    / CAST(count(*) OVER wall AS DOUBLE))
                / (sqrt(CAST(count(*) OVER wall * sum(n * n) OVER wall
                    - sum(n) OVER wall * sum(n) OVER wall AS DOUBLE))
                  / CAST(count(*) OVER wall AS DOUBLE)) AS g,
                CAST(count(*) OVER wall AS BIGINT) AS n_days
              FROM daily
              WINDOW wall AS (PARTITION BY event_type)
            )
            SELECT event_type, n_days, d AS outlier_day,
              n AS outlier_n, g AS grubbs_g
            FROM (
              SELECT event_type, n_days, d, n, g,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY g DESC, d) AS rk
              FROM scored
            ) WHERE rk = 1
        """,
        "q325_runs_test": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            signed AS (
              SELECT event_type, d,
                CASE WHEN CAST(n AS DOUBLE) > quantile_cont(n, 0.5)
                    OVER (PARTITION BY event_type) THEN 1
                  WHEN CAST(n AS DOUBLE) < quantile_cont(n, 0.5)
                    OVER (PARTITION BY event_type) THEN -1
                  ELSE 0 END AS s
              FROM daily
            ),
            runs AS (
              SELECT event_type, s,
                CASE WHEN lag(s) OVER wt IS NULL
                  OR lag(s) OVER wt <> s THEN 1 ELSE 0 END AS new_run
              FROM signed WHERE s <> 0
              WINDOW wt AS (PARTITION BY event_type ORDER BY d)
            ),
            agg AS (
              SELECT event_type,
                CAST(sum(new_run) AS BIGINT) AS n_runs,
                CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n1,
                CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n2
              FROM runs GROUP BY event_type
            )
            SELECT event_type, n_runs,
              n1 AS n_above, n2 AS n_below,
              1E0 + 2E0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                AS expected_runs,
              (CAST(n_runs AS DOUBLE)
                - (1E0 + 2E0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
              / sqrt((2E0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  * (2E0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
                / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                  * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                  * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1E0)))
                AS z
            FROM agg
        """,
        "q326_kendall_tau": """
            WITH per_user AS (
              SELECT user_id,
                CAST(count(*) AS BIGINT) AS x,
                CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                  AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS y
              FROM events WHERE value IS NOT NULL
              GROUP BY user_id
            ),
            pairs AS (
              SELECT
                CASE WHEN a.x > b.x THEN 1 WHEN a.x < b.x THEN -1
                  ELSE 0 END
                * CASE WHEN a.y > b.y THEN 1 WHEN a.y < b.y THEN -1
                  ELSE 0 END AS sg,
                CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tiex,
                CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS tiey
              FROM per_user a JOIN per_user b ON a.user_id < b.user_id
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n0,
                CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS c,
                CAST(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS dd,
                CAST(sum(tiex) AS BIGINT) AS tx,
                CAST(sum(tiey) AS BIGINT) AS ty
              FROM pairs
            )
            SELECT n0 AS n_pairs, c AS concordant, dd AS discordant,
              tx AS ties_x, ty AS ties_y,
              CAST(c - dd AS DOUBLE)
                / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))
                AS tau_b
            FROM agg
        """,
        "q327_cramers_v": """
            WITH cells AS (
              SELECT event_type,
                CAST(json_extract_string(props, '$.k') AS INT) % 2 AS kp,
                CAST(count(*) AS BIGINT) AS o
              FROM events GROUP BY 1, 2
            ),
            terms AS (
              SELECT event_type, kp,
                CAST(sum(o) OVER () * o
                  - sum(o) OVER (PARTITION BY event_type)
                    * sum(o) OVER (PARTITION BY kp) AS DOUBLE)
                * CAST(sum(o) OVER () * o
                  - sum(o) OVER (PARTITION BY event_type)
                    * sum(o) OVER (PARTITION BY kp) AS DOUBLE)
                / CAST(sum(o) OVER ()
                  * sum(o) OVER (PARTITION BY event_type)
                  * sum(o) OVER (PARTITION BY kp) AS DOUBLE) AS t,
                CAST(sum(o) OVER () AS BIGINT) AS nn
              FROM cells
            ),
            agg AS (
              SELECT
                CAST(sum(CAST(t AS DECIMAL(38,6))) AS DOUBLE) AS chi2,
                CAST(max(nn) AS BIGINT) AS nn,
                CAST(count(DISTINCT event_type) AS BIGINT) AS r,
                CAST(count(DISTINCT kp) AS BIGINT) AS c
              FROM terms
            )
            SELECT nn AS n_rows, r AS n_rows_dim, c AS n_cols_dim, chi2,
              sqrt(chi2 / (CAST(nn AS DOUBLE)
                * CAST(least(r - 1, c - 1) AS DOUBLE))) AS cramers_v
            FROM agg
        """,
        "q328_mcnemar": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            flags AS (
              SELECT
                CASE WHEN sum(n) OVER wt / count(*) OVER wt IS NOT NULL
                  AND CAST(n AS DOUBLE) > 1.05E0
                    * (CAST(sum(n) OVER wt AS DOUBLE)
                      / count(*) OVER wt)
                THEN 1 ELSE 0 END AS f_spike,
                CASE WHEN max(n) OVER wt IS NOT NULL
                  AND n > max(n) OVER wt THEN 1 ELSE 0 END AS f_break
              FROM daily
              WINDOW wt AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(CASE WHEN f_spike = 1 AND f_break = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS b,
                CAST(sum(CASE WHEN f_spike = 0 AND f_break = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS c,
                CAST(sum(CASE WHEN f_spike = 1 AND f_break = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS bb
              FROM flags
            )
            SELECT n_days, b AS spike_only, c AS break_only,
              bb AS both_flag,
              CASE WHEN b + c > 0 THEN
                CAST((b - c) * (b - c) AS DOUBLE)
                  / CAST(b + c AS DOUBLE) END AS mcnemar_stat
            FROM agg
        """,
        "q329_leaderboard_churn": """
            WITH mid AS (
              SELECT CAST(min(l_shipdate) AS DATE)
                + CAST(date_diff('day', CAST(min(l_shipdate) AS DATE),
                  CAST(max(l_shipdate) AS DATE)) // 2 AS INT) AS mid
              FROM lineitem
            ),
            rev AS (
              SELECT CASE WHEN CAST(l_shipdate AS DATE) < mid
                  THEN 'a' ELSE 'b' END AS h,
                l_partkey,
                sum(CAST({rev} AS DECIMAL(38,6))) AS r
              FROM lineitem CROSS JOIN mid
              GROUP BY 1, 2
            ),
            top AS (
              SELECT h, l_partkey FROM (
                SELECT h, l_partkey,
                  row_number() OVER (PARTITION BY h
                    ORDER BY r DESC, l_partkey) AS rk
                FROM rev
              ) WHERE rk <= 20
            ),
            inter AS (
              SELECT CAST(count(*) AS BIGINT) AS inter
              FROM top a JOIN top b
                ON a.l_partkey = b.l_partkey
                AND a.h = 'a' AND b.h = 'b'
            )
            SELECT inter AS n_common,
              CAST(inter AS DOUBLE) / CAST(40 - inter AS DOUBLE)
                AS topk_jaccard
            FROM inter
        """.format(rev=_REV_SQL),
        "q330_fold_metric_stability": """
            WITH per_user AS (
              SELECT
                CASE WHEN substr(md5('cv1' || CAST(user_id AS VARCHAR)),
                    1, 8) < '33333333' THEN 0
                  WHEN substr(md5('cv1' || CAST(user_id AS VARCHAR)),
                    1, 8) < '66666666' THEN 1
                  WHEN substr(md5('cv1' || CAST(user_id AS VARCHAR)),
                    1, 8) < '99999999' THEN 2
                  WHEN substr(md5('cv1' || CAST(user_id AS VARCHAR)),
                    1, 8) < 'cccccccc' THEN 3
                  ELSE 4 END AS fold,
                user_id,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS conv
              FROM events GROUP BY 1, 2
            ),
            per_fold AS (
              SELECT fold,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(conv) AS BIGINT) AS n_conv
              FROM per_user GROUP BY fold
            ),
            rated AS (
              SELECT CAST(fold AS INT) AS fold, n_users,
                CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)
                  AS conv_rate
              FROM per_fold
            )
            SELECT fold, n_users, conv_rate,
              max(conv_rate) OVER () - min(conv_rate) OVER () AS spread
            FROM rated
        """,
        "q331_effective_sample_size": """
            WITH per_src AS (
              SELECT source,
                CAST(sum(length(list_filter(
                  string_split_regex(trim(text), '\\s+'), x -> x <> '')))
                  AS BIGINT) AS tok
              FROM documents GROUP BY source
            ),
            j AS (
              SELECT sqrt(CAST(tok AS DOUBLE)) AS w
              FROM documents JOIN per_src USING (source)
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CAST(w AS DECIMAL(38,6))) AS DOUBLE) AS sw,
                CAST(sum(CAST(w * w AS DECIMAL(38,6))) AS DOUBLE) AS sww
              FROM j
            )
            SELECT n_docs,
              sw * sw / sww AS ess,
              sw * sw / sww / CAST(n_docs AS DOUBLE) AS ess_ratio
            FROM agg
        """,
        "q332_series_staleness": """
            WITH per AS (
              SELECT event_type,
                CAST(max(ts) AS DATE) AS last_day,
                CAST(count(*) AS BIGINT) AS n_rows
              FROM events GROUP BY event_type
            ),
            wm AS (SELECT CAST(max(ts) AS DATE) AS horizon FROM events)
            SELECT event_type, last_day, horizon,
              CAST(date_diff('day', last_day, horizon) AS INT)
                AS days_behind,
              n_rows
            FROM per CROSS JOIN wm
        """,
        "q333_calibration_ece": """
            WITH per_user AS (
              SELECT user_id,
                CAST(count(*) AS BIGINT) AS activity,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS conv
              FROM events GROUP BY user_id
            ),
            scored AS (
              SELECT user_id, conv,
                CAST(activity AS DOUBLE)
                  / CAST(max(activity) OVER () AS DOUBLE) AS score
              FROM per_user
            ),
            binned AS (
              SELECT conv, score,
                ntile(10) OVER (ORDER BY score DESC, user_id) AS bin
              FROM scored
            ),
            per_bin AS (
              SELECT bin,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(conv) AS BIGINT) AS n_conv,
                CAST(sum(CAST(score AS DECIMAL(38,6))) AS DOUBLE)
                  AS sum_score
              FROM binned GROUP BY bin
            )
            SELECT CAST(bin AS INT) AS bin, n,
              CAST(n_conv AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy,
              sum_score / CAST(n AS DOUBLE) AS confidence,
              abs(CAST(n_conv AS DOUBLE) / CAST(n AS DOUBLE)
                - sum_score / CAST(n AS DOUBLE)) AS gap
            FROM per_bin
        """,
        "q334_dispersion_index": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            agg AS (
              SELECT event_type,
                CAST(count(*) AS BIGINT) AS k,
                CAST(sum(n) AS BIGINT) AS s1,
                CAST(sum(n * n) AS BIGINT) AS s2
              FROM daily GROUP BY event_type
            )
            SELECT event_type, k AS n_days,
              CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS mean_daily,
              CAST(k * s2 - s1 * s1 AS DOUBLE)
                / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1E0))
                AS var_daily,
              (CAST(k * s2 - s1 * s1 AS DOUBLE)
                / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1E0)))
              / (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)) AS dispersion
            FROM agg
        """,
        "q335_its_segments": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            base AS (
              SELECT event_type, d, n,
                CAST(row_number() OVER (PARTITION BY event_type
                  ORDER BY d) AS BIGINT) AS t
              FROM daily
            ),
            mom AS (
              SELECT event_type,
                CASE WHEN d < TIMESTAMP '2024-01-16' THEN 'pre'
                  ELSE 'post' END AS seg,
                count(*) AS k,
                sum(t) AS st, sum(n) AS sx,
                sum(t * n) AS stx, sum(t * t) AS stt
              FROM base GROUP BY 1, 2
            ),
            fitted AS (
              SELECT event_type, seg,
                CASE WHEN k * stt - st * st > 0 THEN
                  CAST(k * stx - st * sx AS DOUBLE)
                    / CAST(k * stt - st * st AS DOUBLE) END AS slope,
                CAST(sx AS DOUBLE) / CAST(k AS DOUBLE) AS level
              FROM mom
            )
            SELECT pre.event_type,
              pre.slope AS slope_pre, post.slope AS slope_post,
              post.slope - pre.slope AS slope_change,
              pre.level AS level_pre, post.level AS level_post,
              post.level - pre.level AS level_change
            FROM fitted pre JOIN fitted post
              ON pre.event_type = post.event_type
              AND pre.seg = 'pre' AND post.seg = 'post'
        """,
        "q336_split_half": """
            WITH marked AS (
              SELECT user_id,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) % 2 AS par
              FROM events
            ),
            halves AS (
              SELECT user_id,
                CAST(sum(CASE WHEN par = 1 THEN 1 ELSE 0 END)
                  AS DECIMAL(19,0)) AS xi,
                CAST(sum(CASE WHEN par = 0 THEN 1 ELSE 0 END)
                  AS DECIMAL(19,0)) AS yi
              FROM marked GROUP BY user_id
            ),
            s AS (
              SELECT count(*) AS n,
                sum(CAST(xi AS DECIMAL(38,0))) AS sx,
                sum(CAST(yi AS DECIMAL(38,0))) AS sy,
                sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx,
                sum(CAST(yi * yi AS DECIMAL(38,0))) AS syy,
                sum(CAST(xi * yi AS DECIMAL(38,0))) AS sxy
              FROM halves
            ),
            e AS (
              SELECT CAST(n AS BIGINT) AS n,
                CAST(CAST(n AS DECIMAL(12,0)) * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(CAST(n AS DECIMAL(12,0)) * sxx - sx * sx
                      AS DOUBLE))
                    * sqrt(CAST(CAST(n AS DECIMAL(12,0)) * syy - sy * sy
                      AS DOUBLE))) AS r
              FROM s
            )
            SELECT n AS n_users, r AS half_corr,
              2E0 * r / (1E0 + r) AS spearman_brown
            FROM e
        """,
        "q337_variance_ratio": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            lvl AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS k,
                CAST(sum(n) AS BIGINT) AS s1,
                CAST(sum(n * n) AS BIGINT) AS s2
              FROM daily GROUP BY event_type
            ),
            diffs AS (
              SELECT event_type, n - lag(n) OVER (
                PARTITION BY event_type ORDER BY d) AS dx
              FROM daily
            ),
            dif AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS kd,
                CAST(sum(dx) AS BIGINT) AS sd1,
                CAST(sum(dx * dx) AS BIGINT) AS sd2
              FROM diffs WHERE dx IS NOT NULL
              GROUP BY event_type
            )
            SELECT l.event_type, k AS n_days,
              CAST(k * s2 - s1 * s1 AS DOUBLE)
                / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)) AS var_level,
              CAST(kd * sd2 - sd1 * sd1 AS DOUBLE)
                / (CAST(kd AS DOUBLE) * CAST(kd AS DOUBLE)) AS var_diff,
              (CAST(k * s2 - s1 * s1 AS DOUBLE)
                / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)))
              / (CAST(kd * sd2 - sd1 * sd1 AS DOUBLE)
                / (CAST(kd AS DOUBLE) * CAST(kd AS DOUBLE)))
                AS variance_ratio,
              (CAST(k * s2 - s1 * s1 AS DOUBLE)
                / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)))
              > (CAST(kd * sd2 - sd1 * sd1 AS DOUBLE)
                / (CAST(kd AS DOUBLE) * CAST(kd AS DOUBLE)))
                AS difference_first
            FROM lvl l JOIN dif USING (event_type)
        """,
        "q338_dedup_savings": """
            WITH groups AS (
              SELECT source, md5(text) AS h,
                CAST(count(*) AS BIGINT) AS copies,
                CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT)
                  AS total_bytes,
                CAST(min(CAST(n_chars AS BIGINT)) AS BIGINT)
                  AS keep_bytes
              FROM documents GROUP BY 1, 2
            )
            SELECT source,
              CAST(count(*) AS BIGINT) AS n_unique,
              CAST(sum(copies) AS BIGINT) AS n_docs,
              CAST(sum(total_bytes - keep_bytes) AS BIGINT)
                AS bytes_saved,
              CAST(sum(total_bytes - keep_bytes) AS DOUBLE)
                / CAST(sum(total_bytes) AS DOUBLE) AS savings_share
            FROM groups GROUP BY source
        """,
        "q339_retrieval_eval": f"""
            WITH fact AS (
              SELECT o_custkey, l_partkey, o_orderdate,
                {_REV_SQL} AS rev
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            ),
            spend AS (
              SELECT o_custkey, l_partkey,
                sum(CAST(rev AS DECIMAL(38,6))) AS spend
              FROM fact WHERE o_orderdate < TIMESTAMP '2000-01-01'
              GROUP BY 1, 2
            ),
            ranked AS (
              SELECT * FROM (
                SELECT o_custkey, l_partkey,
                  CAST(row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY spend DESC, l_partkey ASC) AS INT) AS rk
                FROM spend)
              WHERE rk <= 10
            ),
            rel AS (
              SELECT DISTINCT o_custkey, l_partkey FROM fact
              WHERE o_orderdate >= TIMESTAMP '2000-01-01'
            ),
            relc AS (
              SELECT o_custkey, CAST(count(*) AS INT) AS n_rel
              FROM rel GROUP BY 1
            ),
            hagg AS (
              SELECT r.o_custkey,
                CAST(count(*) AS INT) AS hits,
                min(r.rk) AS first_hit,
                sum(list_extract([{", ".join(
                    f"CAST({d} AS DECIMAL(14,12))" for d in _NDCG_DISC)}],
                  r.rk)) AS dcg
              FROM ranked r JOIN rel USING (o_custkey, l_partkey)
              GROUP BY 1
            ),
            rankedc AS (
              SELECT o_custkey, CAST(count(*) AS INT) AS n_ranked
              FROM ranked GROUP BY 1
            )
            SELECT rc.o_custkey AS custkey, rc.n_ranked, relc.n_rel,
              CAST(COALESCE(h.hits, 0) AS INT) AS hits,
              CASE WHEN h.first_hit IS NOT NULL
                THEN 1.0 / CAST(h.first_hit AS DOUBLE) ELSE 0.0
              END AS mrr,
              CAST(COALESCE(h.hits, 0) AS DOUBLE)
                / CAST(rc.n_ranked AS DOUBLE) AS precision_at_10,
              CAST(COALESCE(h.hits, 0) AS DOUBLE)
                / CAST(relc.n_rel AS DOUBLE) AS recall_at_10,
              COALESCE(CAST(h.dcg AS DOUBLE), 0.0)
                / CAST(list_extract([{", ".join(
                    f"CAST({c} AS DECIMAL(16,12))" for c in _NDCG_CUM)}],
                  least(relc.n_rel, 10)) AS DOUBLE) AS ndcg_at_10
            FROM rankedc rc
            JOIN relc ON rc.o_custkey = relc.o_custkey
            LEFT JOIN hagg h ON rc.o_custkey = h.o_custkey
        """,
        "q340_skipgram_pairs": r"""
            WITH toks AS (
              SELECT list_filter(
                string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
              FROM documents
            ),
            p1 AS (
              SELECT unnest(list_transform(
                generate_series(1, greatest(len(t) - 1, 0)),
                i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS p
              FROM toks
              UNION ALL
              SELECT unnest(list_transform(
                generate_series(1, greatest(len(t) - 2, 0)),
                i -> struct_pack(w1 := t[i], w2 := t[i+2]))) AS p
              FROM toks
            ),
            fwd AS (
              SELECT p.w1 AS w1, p.w2 AS w2,
                CAST(count(*) AS BIGINT) AS nf
              FROM p1 GROUP BY 1, 2
            )
            SELECT COALESCE(a.w1, b.w2) AS center,
              COALESCE(a.w2, b.w1) AS context,
              CAST(COALESCE(a.nf, 0) + COALESCE(b.nf, 0) AS BIGINT)
                AS n_pairs
            FROM fwd a
            FULL OUTER JOIN fwd b ON a.w1 = b.w2 AND a.w2 = b.w1
            WHERE COALESCE(a.nf, 0) + COALESCE(b.nf, 0) >= 5
        """,
        "q341_stutter_scrub": r"""
            WITH t AS (
              SELECT source, list_filter(
                string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
              FROM documents
            ),
            per_doc AS (
              SELECT source, len(t) AS nt,
                len(list_filter(list_transform(
                  generate_series(1, greatest(len(t) - 1, 0)),
                  i -> t[i] = t[i+1]), x -> x)) AS nr
              FROM t
            )
            SELECT source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(nt) AS BIGINT) AS total_tokens,
              CAST(sum(nr) AS BIGINT) AS stutter_tokens,
              CAST(sum(nr) AS DOUBLE) / CAST(sum(nt) AS DOUBLE)
                AS stutter_share,
              CAST(sum(CASE WHEN nr > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS docs_with_stutter
            FROM per_doc GROUP BY source
        """,
        "q342_linear_attribution": """
            WITH purch AS (
              SELECT user_id, ts, min(event_id) AS conv_id,
                sum(CAST(value AS DECIMAL(38,6))) AS conv_value
              FROM events WHERE event_type = 'purchase'
              GROUP BY 1, 2
            ),
            touch AS (
              SELECT event_id, user_id, ts, event_type FROM events
              WHERE event_type IN ('view', 'click', 'signup')
            ),
            asg0 AS (
              SELECT t.event_id, t.user_id, t.event_type,
                min(p.ts) AS conv_ts
              FROM touch t JOIN purch p
                ON t.user_id = p.user_id AND p.ts >= t.ts
              GROUP BY 1, 2, 3
            ),
            asg AS (
              SELECT a.user_id, a.event_type, p.conv_id, p.conv_value
              FROM asg0 a JOIN purch p
                ON a.user_id = p.user_id AND a.conv_ts = p.ts
            ),
            convn AS (
              SELECT user_id, conv_id, CAST(count(*) AS BIGINT) AS n
              FROM asg GROUP BY 1, 2
            ),
            pt AS (
              SELECT user_id, conv_id, event_type,
                CAST(count(*) AS BIGINT) AS m,
                max(conv_value) AS cv
              FROM asg GROUP BY 1, 2, 3
            )
            SELECT event_type, n,
              CAST(count(*) AS BIGINT) AS n_convs,
              CAST(sum(CAST(cv * m AS DECIMAL(38,6))) AS DOUBLE)
                / CAST(n AS DOUBLE) AS attributed_value
            FROM pt JOIN convn USING (user_id, conv_id)
            GROUP BY event_type, n
        """,
        "q344_qte": f"""
            WITH per_user AS (
              SELECT
                CASE WHEN substring(
                    md5('qte' || CAST(user_id AS VARCHAR)), 1, 8)
                  < '{_thr(0.5)}' THEN 'treat' ELSE 'control' END AS arm,
                CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                  AS total
              FROM events GROUP BY user_id
            ),
            per_arm AS (
              SELECT arm,
                {", ".join(
                    f"quantile_disc(total, {i / 10}) AS d{i}"
                    for i in range(1, 10))}
              FROM per_user GROUP BY arm
            )
            SELECT
              {", ".join(f"c.d{i} AS d{i}_control" for i in range(1, 10))},
              {", ".join(f"t.d{i} AS d{i}_treat" for i in range(1, 10))},
              {", ".join(
                  f"t.d{i} - c.d{i} AS d{i}_qte" for i in range(1, 10))}
            FROM (SELECT * FROM per_arm WHERE arm = 'treat') t,
                 (SELECT * FROM per_arm WHERE arm = 'control') c
        """,
        "q345_bh_fdr": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            mom AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS k,
                CAST(sum(n) AS BIGINT) AS s1,
                CAST(sum(n * n) AS BIGINT) AS s2
              FROM daily GROUP BY event_type
            ),
            cells AS (
              SELECT d.event_type, d.d, d.n,
                CASE WHEN CAST(d.n AS DOUBLE)
                        - CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) = 0
                  THEN 1.0
                  ELSE least(1.0,
                    (CAST(k * s2 - s1 * s1 AS DOUBLE)
                      / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)))
                    / ((CAST(d.n AS DOUBLE)
                        - CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
                       * (CAST(d.n AS DOUBLE)
                        - CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))))
                END AS p
              FROM daily d JOIN mom USING (event_type)
            ),
            ranked AS (
              SELECT event_type, d, n, p,
                CAST(row_number() OVER (
                  ORDER BY p, event_type, d) AS INT) AS rk,
                CAST(count(*) OVER () AS BIGINT) AS m
              FROM cells
            ),
            flagged AS (
              SELECT *,
                CASE WHEN p <= CAST(rk AS DOUBLE)
                    / (10.0 * CAST(m AS DOUBLE))
                  THEN rk ELSE 0 END AS pass_k
              FROM ranked
            )
            SELECT event_type, d, n, p, rk,
              rk <= max(pass_k) OVER () AS discovery
            FROM flagged
        """,
        "q346_shard_balance": r"""
            WITH per_doc AS (
              SELECT doc_id,
                CAST(len(list_filter(
                  string_split_regex(trim(text), '\s+'),
                  x -> x <> '')) AS INT) AS nt
              FROM documents
            ),
            assigned AS (
              SELECT nt,
                CAST((row_number() OVER (
                  ORDER BY nt DESC, doc_id ASC) - 1) % 8 AS INT)
                  AS shard
              FROM per_doc
            ),
            agg AS (
              SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(nt) AS BIGINT) AS shard_tokens
              FROM assigned GROUP BY shard
            )
            SELECT shard, n_docs, shard_tokens,
              CAST(shard_tokens AS DOUBLE)
                / CAST(sum(shard_tokens) OVER () AS DOUBLE)
                AS token_share
            FROM agg
        """,
        "q347_revenue_npv": f"""
            WITH per_cust AS (
              SELECT o_custkey,
                sum(CAST(
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)
                  * list_extract(
                      [{", ".join(str(d) for d in _NPV_DISC_SCALED)}],
                      CAST(year(o_orderdate) - 1994 AS INT))
                  AS DECIMAL(38,0))) AS npv
              FROM orders GROUP BY o_custkey
            )
            SELECT c_mktsegment,
              CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(npv) AS DOUBLE) / 1.0e9 AS segment_npv,
              CAST(sum(npv) AS DOUBLE) / 1.0e9
                / CAST(count(*) AS DOUBLE) AS avg_customer_npv
            FROM per_cust JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "q348_rake_keywords": r"""
            WITH toks AS (
              SELECT doc_id, list_filter(
                string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
              FROM documents
            ),
            pos AS (
              SELECT doc_id, u.pos AS pos, u.w AS w FROM (
                SELECT doc_id, unnest(list_transform(
                  generate_series(1, len(t)),
                  i -> struct_pack(pos := i, w := t[i]))) AS u
                FROM toks)
            ),
            marked AS (
              SELECT doc_id, pos, w,
                CASE WHEN list_contains("""
        + _STOPWORD_LIST
        + """, w) THEN 1 ELSE 0 END AS st
              FROM pos
            ),
            ph AS (
              SELECT doc_id, pos, w, st,
                sum(st) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS UNBOUNDED PRECEDING) AS phrase_id
              FROM marked
            ),
            words AS (
              SELECT doc_id, phrase_id, w FROM ph WHERE st = 0
            ),
            plen AS (
              SELECT doc_id, phrase_id,
                CAST(count(*) AS BIGINT) AS plen
              FROM words GROUP BY 1, 2
            ),
            scored AS (
              SELECT w, CAST(count(*) AS BIGINT) AS freq,
                CAST(sum(plen) AS BIGINT) AS deg
              FROM words JOIN plen USING (doc_id, phrase_id)
              GROUP BY w HAVING count(*) >= 5
            )
            SELECT w AS word, freq, deg,
              CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS rake_score
            FROM scored
        """,
        "q349_wilcoxon_signed": """
            WITH daily AS (
              SELECT event_type,
                datediff('day', DATE '2024-01-01',
                  CAST(date_trunc('day', ts) AS DATE)) AS idx,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            keyed AS (
              SELECT event_type,
                CAST(floor(idx / 7) AS INT) AS wk,
                CAST(idx % 7 AS INT) AS dow, n
              FROM daily
            ),
            pairs AS (
              SELECT a.event_type, b.n - a.n AS diff,
                abs(b.n - a.n) AS ad
              FROM keyed a JOIN keyed b
                ON a.event_type = b.event_type
                AND a.wk + 1 = b.wk AND a.dow = b.dow
              WHERE b.n - a.n <> 0
            ),
            byval AS (
              SELECT event_type, ad,
                CAST(count(*) AS BIGINT) AS t,
                CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS tpos
              FROM pairs GROUP BY 1, 2
            ),
            ranked AS (
              SELECT event_type, t, tpos,
                2 * (sum(t) OVER (PARTITION BY event_type ORDER BY ad
                    ROWS UNBOUNDED PRECEDING) - t) + t + 1 AS two_avg
              FROM byval
            ),
            agg AS (
              SELECT event_type,
                CAST(sum(t) AS BIGINT) AS n,
                CAST(sum(tpos * two_avg) AS BIGINT) AS two_w_plus
              FROM ranked GROUP BY event_type
            )
            SELECT event_type,
              n AS n_pairs, two_w_plus,
              CAST(two_w_plus - CAST(n * (n + 1) / 2 AS BIGINT)
                AS DOUBLE)
              / sqrt(CAST(CAST(n * (n + 1) * (2 * n + 1) / 6 AS BIGINT)
                  AS DOUBLE)) AS z
            FROM agg
        """,
        "q350_l_diversity": """
            WITH rel AS (
              SELECT c_nationkey, c_mktsegment,
                CAST(year(o_orderdate) AS INT) AS yr,
                o_orderpriority
              FROM orders JOIN customer ON o_custkey = c_custkey
            )
            SELECT c_nationkey, c_mktsegment, yr,
              CAST(count(*) AS BIGINT) AS group_size,
              CAST(count(DISTINCT o_orderpriority) AS BIGINT)
                AS l_distinct,
              count(DISTINCT o_orderpriority) >= 3 AS diverse
            FROM rel GROUP BY 1, 2, 3
        """,
        "q351_covariate_balance": f"""
            WITH oc AS (
              SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
              FROM orders GROUP BY 1
            ),
            base AS (
              SELECT
                CASE WHEN substring(
                    md5('qte' || CAST(c_custkey AS VARCHAR)), 1, 8)
                  < '{_thr(0.5)}' THEN 'treat' ELSE 'control' END AS arm,
                CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
                CAST(COALESCE(n_orders, 0) AS DECIMAL(18,0)) AS no
              FROM customer LEFT JOIN oc ON c_custkey = o_custkey
            ),
            s AS (
              SELECT
                CAST(sum(CASE WHEN arm = 'treat' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nt,
                CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nc,
                sum(CAST(bal * (CASE WHEN arm = 'treat' THEN 1 ELSE 0 END)
                  AS DECIMAL(38,4))) AS bt,
                sum(CAST(bal * (CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                  AS DECIMAL(38,4))) AS bc,
                sum(CAST(bal * bal * (CASE WHEN arm = 'treat' THEN 1 ELSE 0 END)
                  AS DECIMAL(38,4))) AS btt,
                sum(CAST(bal * bal * (CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                  AS DECIMAL(38,4))) AS bcc,
                sum(CAST(no * (CASE WHEN arm = 'treat' THEN 1 ELSE 0 END)
                  AS DECIMAL(38,4))) AS ot,
                sum(CAST(no * (CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                  AS DECIMAL(38,4))) AS oc,
                sum(CAST(no * no * (CASE WHEN arm = 'treat' THEN 1 ELSE 0 END)
                  AS DECIMAL(38,4))) AS ott,
                sum(CAST(no * no * (CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                  AS DECIMAL(38,4))) AS occ
              FROM base
            )
            SELECT 'acctbal' AS covariate, nt AS n_treat, nc AS n_control,
              CAST(bt AS DOUBLE) / CAST(nt AS DOUBLE) AS mean_treat,
              CAST(bc AS DOUBLE) / CAST(nc AS DOUBLE) AS mean_control,
              (CAST(bt AS DOUBLE) / CAST(nt AS DOUBLE)
                - CAST(bc AS DOUBLE) / CAST(nc AS DOUBLE))
              / sqrt(((CAST(btt AS DOUBLE) / CAST(nt AS DOUBLE)
                  - (CAST(bt AS DOUBLE) / CAST(nt AS DOUBLE))
                    * (CAST(bt AS DOUBLE) / CAST(nt AS DOUBLE)))
                + (CAST(bcc AS DOUBLE) / CAST(nc AS DOUBLE)
                  - (CAST(bc AS DOUBLE) / CAST(nc AS DOUBLE))
                    * (CAST(bc AS DOUBLE) / CAST(nc AS DOUBLE)))) / 2.0)
                AS smd
            FROM s
            UNION ALL
            SELECT 'n_orders', nt, nc,
              CAST(ot AS DOUBLE) / CAST(nt AS DOUBLE),
              CAST(oc AS DOUBLE) / CAST(nc AS DOUBLE),
              (CAST(ot AS DOUBLE) / CAST(nt AS DOUBLE)
                - CAST(oc AS DOUBLE) / CAST(nc AS DOUBLE))
              / sqrt(((CAST(ott AS DOUBLE) / CAST(nt AS DOUBLE)
                  - (CAST(ot AS DOUBLE) / CAST(nt AS DOUBLE))
                    * (CAST(ot AS DOUBLE) / CAST(nt AS DOUBLE)))
                + (CAST(occ AS DOUBLE) / CAST(nc AS DOUBLE)
                  - (CAST(oc AS DOUBLE) / CAST(nc AS DOUBLE))
                    * (CAST(oc AS DOUBLE) / CAST(nc AS DOUBLE)))) / 2.0)
            FROM s
        """,
        "q353_pinball_loss": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            scored AS (
              SELECT event_type, n,
                lag(n, 7) OVER (PARTITION BY event_type ORDER BY d)
                  AS yhat
              FROM daily
            ),
            agg AS (
              SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(5 * abs(n - yhat)) AS BIGINT) AS s50,
                CAST(sum(CASE WHEN n - yhat >= 0 THEN 9 * (n - yhat)
                         ELSE -(n - yhat) END) AS BIGINT) AS s90
              FROM scored WHERE yhat IS NOT NULL
              GROUP BY event_type
            )
            SELECT event_type, n_days,
              CAST(s50 AS DOUBLE) / (10.0 * CAST(n_days AS DOUBLE))
                AS pinball_p50,
              CAST(s90 AS DOUBLE) / (10.0 * CAST(n_days AS DOUBLE))
                AS pinball_p90
            FROM agg
        """,
        "q354_transition_drift": """
            WITH steps AS (
              SELECT h, event_type AS f, nxt AS t FROM (
                SELECT
                  CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 2
                    END AS h,
                  user_id, ts, event_id, event_type,
                  lead(event_type) OVER (
                    PARTITION BY user_id,
                      CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1
                        ELSE 2 END
                    ORDER BY ts, event_id) AS nxt
                FROM events)
              WHERE nxt IS NOT NULL
            ),
            cells AS (
              SELECT h, f, t, CAST(count(*) AS BIGINT) AS m
              FROM steps GROUP BY 1, 2, 3
            ),
            grid AS (
              SELECT COALESCE(a.f, b.f) AS f, COALESCE(a.t, b.t) AS t,
                COALESCE(a.m, 0) AS m1, COALESCE(b.m, 0) AS m2
              FROM (SELECT f, t, m FROM cells WHERE h = 1) a
              FULL OUTER JOIN (SELECT f, t, m FROM cells WHERE h = 2) b
                ON a.f = b.f AND a.t = b.t
            ),
            per_from AS (
              SELECT f, CAST(sum(m1) AS BIGINT) AS n1,
                CAST(sum(m2) AS BIGINT) AS n2
              FROM grid GROUP BY f
            ),
            agg AS (
              SELECT g.f, max(n1) AS n1, max(n2) AS n2,
                sum(CAST(abs(g.m1 * p.n2 - g.m2 * p.n1)
                  AS DECIMAL(38,0))) AS s
              FROM grid g JOIN per_from p ON g.f = p.f
              GROUP BY g.f
            )
            SELECT f AS from_state,
              CAST(n1 AS BIGINT) AS n_steps_h1,
              CAST(n2 AS BIGINT) AS n_steps_h2,
              CAST(s AS DOUBLE)
                / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS tvd
            FROM agg
        """,
        "q355_cuped": f"""
            WITH per_user AS (
              SELECT
                CASE WHEN substring(
                    md5('cuped' || CAST(user_id AS VARCHAR)), 1, 8)
                  < '{_thr(0.5)}' THEN 'treat' ELSE 'control' END AS arm,
                CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN 1 ELSE 0 END) AS BIGINT) AS x,
                CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN 0 ELSE 1 END) AS BIGINT) AS y
              FROM events GROUP BY user_id
            ),
            mom AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx
              FROM per_user
            ),
            per_arm AS (
              SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(x) AS BIGINT) AS sxa,
                CAST(sum(y) AS BIGINT) AS sya
              FROM per_user GROUP BY arm
            )
            SELECT arm, n_users,
              CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_y,
              CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE)
                - (CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE))
                  * (CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE)
                     - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                AS mean_y_adj,
              CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) AS theta
            FROM per_arm, mom
        """,
        "q356_rrf_fusion": """
            WITH per_c AS (
              SELECT o_custkey,
                sum(CAST(o_totalprice AS DECIMAL(38,6))) AS rev,
                CAST(count(*) AS BIGINT) AS n_orders
              FROM orders GROUP BY o_custkey
            ),
            ranked AS (
              SELECT o_custkey,
                CAST(row_number() OVER (
                  ORDER BY rev DESC, o_custkey ASC) AS BIGINT) AS r_rev,
                CAST(row_number() OVER (
                  ORDER BY n_orders DESC, o_custkey ASC) AS BIGINT)
                  AS r_freq
              FROM per_c
            )
            SELECT o_custkey, r_rev, r_freq,
              1.0 / (60.0 + CAST(r_rev AS DOUBLE))
                + 1.0 / (60.0 + CAST(r_freq AS DOUBLE)) AS rrf
            FROM ranked
            ORDER BY rrf DESC, o_custkey ASC
            LIMIT 20
        """,
        "q357_peak_days": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            flagged AS (
              SELECT event_type, d, n,
                lag(n) OVER (PARTITION BY event_type ORDER BY d) AS prv,
                lead(n) OVER (PARTITION BY event_type ORDER BY d) AS nxt,
                CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                  AS k,
                CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
                  AS s
              FROM daily
            )
            SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_peaks,
              CAST(max(n) AS BIGINT) AS max_peak,
              min(d) AS first_peak_d
            FROM flagged
            WHERE prv IS NOT NULL AND nxt IS NOT NULL
              AND n > prv AND n > nxt AND k * n > s
            GROUP BY event_type
        """,
        "q358_savgol_smooth": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            conv AS (
              SELECT event_type, d, n,
                lag(n, 2) OVER w AS m2, lag(n, 1) OVER w AS m1,
                lead(n, 1) OVER w AS p1, lead(n, 2) OVER w AS p2
              FROM daily
              WINDOW w AS (PARTITION BY event_type ORDER BY d)
            )
            SELECT event_type, d, n,
              CAST(-3 * m2 + 12 * m1 + 17 * n + 12 * p1 - 3 * p2
                AS DOUBLE) / 35.0 AS sg
            FROM conv
            WHERE m2 IS NOT NULL AND m1 IS NOT NULL
              AND p1 IS NOT NULL AND p2 IS NOT NULL
        """,
        "q359_zero_crossings": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            signed AS (
              SELECT event_type, d,
                CAST(sign(CAST(
                  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                    * n
                  - CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
                  AS DOUBLE)) AS INTEGER) AS sgn
              FROM daily
            ),
            steps AS (
              SELECT event_type, sgn,
                lag(sgn) OVER (PARTITION BY event_type ORDER BY d) AS prv
              FROM signed
            )
            SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(CASE WHEN sgn * prv = -1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_crossings,
              CAST(sum(CASE WHEN sgn * prv = -1 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) - 1 AS DOUBLE)
                AS crossing_rate
            FROM steps GROUP BY event_type
        """,
        "q360_rdd_cutoff": """
            WITH daily AS (
              SELECT date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ),
            base AS (
              SELECT CASE WHEN datediff('day', DATE '2024-01-01',
                  CAST(d AS DATE)) < 15 THEN 'pre' ELSE 'post' END
                  AS side,
                CAST(datediff('day', DATE '2024-01-01', CAST(d AS DATE))
                  AS BIGINT) AS x,
                n AS y
              FROM daily
            ),
            mom AS (
              SELECT side, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx
              FROM base GROUP BY side
            ),
            lines AS (
              SELECT side, n AS n_days,
                CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
                (CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                  / CAST(n AS DOUBLE) AS icept
              FROM mom
            )
            SELECT
              pre.n_days AS n_pre,
              post.n_days AS n_post,
              pre.slope AS slope_pre,
              post.slope AS slope_post,
              post.slope - pre.slope AS slope_change,
              (post.icept + post.slope * 15.0)
                - (pre.icept + pre.slope * 15.0) AS jump
            FROM (SELECT * FROM lines WHERE side = 'pre') pre,
                 (SELECT * FROM lines WHERE side = 'post') post
        """,
        "q361_sprt": f"""
            WITH daily AS (
              SELECT date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                  ELSE 0 END) AS BIGINT) AS s
              FROM events GROUP BY 1
            ),
            cum AS (
              SELECT d,
                CAST(sum(n) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
                CAST(sum(s) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s
              FROM daily
            )
            SELECT d, cum_n, cum_s,
              CAST(cum_s AS DOUBLE) * {_SPRT_L1!r}
                + CAST(cum_n - cum_s AS DOUBLE) * {_SPRT_L0!r} AS llr,
              CASE
                WHEN CAST(cum_s AS DOUBLE) * {_SPRT_L1!r}
                  + CAST(cum_n - cum_s AS DOUBLE) * {_SPRT_L0!r}
                  >= {_SPRT_UP!r} THEN 'accept_h1'
                WHEN CAST(cum_s AS DOUBLE) * {_SPRT_L1!r}
                  + CAST(cum_n - cum_s AS DOUBLE) * {_SPRT_L0!r}
                  <= {_SPRT_LO!r} THEN 'accept_h0'
                ELSE 'continue'
              END AS decision
            FROM cum
        """,
        "q362_conformal_interval": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            scored AS (
              SELECT event_type, d, n,
                lag(n, 7) OVER w AS yhat,
                CAST(row_number() OVER w AS BIGINT) AS i
              FROM daily
              WINDOW w AS (PARTITION BY event_type ORDER BY d)
            ),
            resid AS (
              SELECT event_type, i, abs(n - yhat) AS abs_err
              FROM scored WHERE yhat IS NOT NULL
            ),
            qhat AS (
              SELECT event_type,
                CAST(quantile_disc(abs_err, 0.9) AS BIGINT) AS qhat,
                CAST(count(*) AS BIGINT) AS n_cal
              FROM resid WHERE i <= 15 GROUP BY event_type
            )
            SELECT r.event_type,
              CAST(max(qhat) AS BIGINT) AS qhat,
              CAST(max(n_cal) AS BIGINT) AS n_cal,
              CAST(count(*) AS BIGINT) AS n_test,
              CAST(sum(CASE WHEN abs_err <= qhat THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS coverage
            FROM resid r JOIN qhat q ON r.event_type = q.event_type
            WHERE r.i > 15
            GROUP BY r.event_type
        """,
        "q363_isotonic_fit": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            idx AS (
              SELECT event_type, d, n,
                CAST(row_number() OVER w AS BIGINT) AS i,
                CAST(sum(n) OVER (PARTITION BY event_type ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS p
              FROM daily
              WINDOW w AS (PARTITION BY event_type ORDER BY d)
            ),
            pairs AS (
              SELECT a.event_type, a.j, b.k,
                CAST(b.pk - a.pj AS DOUBLE)
                  / CAST(b.k - a.j + 1 AS DOUBLE) AS m
              FROM (SELECT event_type, i AS j, p - n AS pj FROM idx) a
              JOIN (SELECT event_type, i AS k, p AS pk FROM idx) b
                ON a.event_type = b.event_type AND a.j <= b.k
            ),
            inner_min AS (
              SELECT event_type, j, k AS i,
                min(m) OVER (PARTITION BY event_type, j
                  ORDER BY k DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS inner_min
              FROM pairs
            ),
            iso AS (
              SELECT event_type, i, j,
                max(inner_min) OVER (PARTITION BY event_type, i
                  ORDER BY j ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS fit
              FROM inner_min
            )
            SELECT x.event_type, x.d, x.n, s.fit
            FROM idx x
            JOIN (SELECT event_type, i, fit FROM iso WHERE j = i) s
              ON x.event_type = s.event_type AND x.i = s.i
        """,
        "q364_ips_offpolicy": f"""
            WITH base AS (
              SELECT
                CASE WHEN substring(
                    md5('ips' || CAST(event_id AS VARCHAR)), 1, 8)
                  < '{_thr(0.5)}' THEN 'A' ELSE 'B' END AS a,
                CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS pi,
                CAST(CASE WHEN event_type = 'purchase' THEN value
                  ELSE 0.0 END AS DECIMAL(38,6)) AS r
              FROM events
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                sum(r) AS s_all,
                sum(CASE WHEN pi = a THEN r
                    ELSE CAST(0 AS DECIMAL(38,6)) END) AS s_match,
                CAST(sum(CASE WHEN pi = a THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_match
              FROM base
            )
            SELECT n, n_match,
              CAST(s_all AS DOUBLE) / CAST(n AS DOUBLE) AS v_logged,
              2.0 * CAST(s_match AS DOUBLE) / CAST(n AS DOUBLE)
                AS v_target_ips
            FROM agg
        """,
        "q365_negbin_fit": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            mom AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS k,
                CAST(sum(n) AS BIGINT) AS s,
                CAST(sum(n * n) AS BIGINT) AS q
              FROM daily GROUP BY event_type
            )
            SELECT event_type, k AS n_days,
              CAST(s AS DOUBLE) / CAST(k AS DOUBLE) AS mean,
              CAST(k * q - s * s AS DOUBLE)
                / CAST(k * (k - 1) AS DOUBLE) AS var,
              CASE WHEN CAST(k * q - s * s AS DOUBLE)
                  / CAST(k * (k - 1) AS DOUBLE)
                  > CAST(s AS DOUBLE) / CAST(k AS DOUBLE)
                THEN (CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
                  * (CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
                  / (CAST(k * q - s * s AS DOUBLE)
                     / CAST(k * (k - 1) AS DOUBLE)
                     - CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
              END AS nb_r,
              CASE WHEN CAST(k * q - s * s AS DOUBLE)
                  / CAST(k * (k - 1) AS DOUBLE)
                  > CAST(s AS DOUBLE) / CAST(k AS DOUBLE)
                THEN (CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
                  / (CAST(k * q - s * s AS DOUBLE)
                     / CAST(k * (k - 1) AS DOUBLE))
              END AS nb_p
            FROM mom
        """,
        "q366_unit_value_index": """
            WITH uv AS (
              SELECT p_brand, date_trunc('month', l_shipdate) AS mon,
                sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS ext,
                sum(CAST(l_quantity AS DECIMAL(38,6))) AS qty
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY 1, 2
            ),
            base AS (
              SELECT p_brand, ext AS ext0, qty AS qty0
              FROM (
                SELECT p_brand, ext, qty,
                  row_number() OVER (PARTITION BY p_brand
                    ORDER BY mon) AS rk
                FROM uv
              ) WHERE rk = 1
            )
            SELECT u.p_brand, u.mon,
              CAST(u.ext AS DOUBLE) AS ext_sum,
              CAST(u.qty AS DOUBLE) AS qty_sum,
              (CAST(u.ext AS DOUBLE) * CAST(b.qty0 AS DOUBLE))
                / (CAST(u.qty AS DOUBLE) * CAST(b.ext0 AS DOUBLE))
                AS uv_index
            FROM uv u JOIN base b ON u.p_brand = b.p_brand
        """,
        "q367_record_days": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            flagged AS (
              SELECT event_type, d, n,
                max(n) OVER (PARTITION BY event_type ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS prior_max
              FROM daily
            )
            SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_records,
              max(d) AS last_record_d,
              CAST(max(n) AS BIGINT) AS record_high
            FROM flagged
            WHERE prior_max IS NOT NULL AND n > prior_max
            GROUP BY event_type
        """,
        "q368_turning_points": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            lagd AS (
              SELECT event_type, n,
                lag(n) OVER w AS prv, lead(n) OVER w AS nxt
              FROM daily
              WINDOW w AS (PARTITION BY event_type ORDER BY d)
            ),
            agg AS (
              SELECT m.event_type, m.m, t.t
              FROM (
                SELECT event_type, CAST(count(*) AS BIGINT) AS m
                FROM daily GROUP BY event_type
              ) m
              JOIN (
                SELECT event_type,
                  CAST(sum(CASE WHEN prv IS NOT NULL AND nxt IS NOT NULL
                    AND ((n > prv AND n > nxt) OR (n < prv AND n < nxt))
                    THEN 1 ELSE 0 END) AS BIGINT) AS t
                FROM lagd GROUP BY event_type
              ) t ON m.event_type = t.event_type
            )
            SELECT event_type, m, t,
              (CAST(3 * t - 2 * (m - 2) AS DOUBLE) / 3.0)
                / sqrt(CAST(16 * m - 29 AS DOUBLE) / 90.0) AS z
            FROM agg
        """,
        "q369_stylometric_z": r"""
            WITH tok AS (
              SELECT source,
                unnest(list_filter(string_split_regex(trim(text), '\s+'),
                  x -> x <> '')) AS t
              FROM documents
            ),
            top AS (
              SELECT t FROM (
                SELECT t, row_number() OVER (
                  ORDER BY count(*) DESC, t ASC) AS rk
                FROM tok GROUP BY t
              ) WHERE rk <= 10
            ),
            per_src AS (
              SELECT source, CAST(count(*) AS BIGINT) AS ntok
              FROM tok GROUP BY source
            ),
            cnt AS (
              SELECT source, t, CAST(count(*) AS BIGINT) AS c
              FROM tok JOIN top USING (t) GROUP BY source, t
            ),
            cells AS (
              SELECT p.source, g.t,
                CAST((COALESCE(c.c, 0) * 1000000) // p.ntok AS BIGINT)
                  AS cpm
              FROM per_src p CROSS JOIN top g
              LEFT JOIN cnt c ON c.source = p.source AND c.t = g.t
            ),
            stats AS (
              SELECT source, t, cpm,
                CAST(count(*) OVER w AS BIGINT) AS s,
                CAST(sum(cpm) OVER w AS BIGINT) AS tot,
                CAST(sum(cpm * cpm) OVER w AS BIGINT) AS qq
              FROM cells
              WINDOW w AS (PARTITION BY t)
            )
            SELECT source, t AS token, cpm,
              CASE WHEN CAST(s * qq - tot * tot AS DOUBLE) > 0
                THEN CAST(s * cpm - tot AS DOUBLE)
                  / sqrt(CAST(s * qq - tot * tot AS DOUBLE))
              END AS z_scaled
            FROM stats
        """,
        "q370_int8_quant": """
            WITH errs AS (
              SELECT vec_id, label,
                list_transform(embedding, x ->
                  CAST(x AS DOUBLE)
                  - least(greatest(
                      floor(CAST(x AS DOUBLE) * 64.0 + 0.5), -127.0),
                      127.0) / 64.0) AS e
              FROM embeddings
            )
            SELECT vec_id, label,
              list_dot_product(e, e) / 64.0 AS mse,
              list_max(list_transform(e, x -> abs(x))) AS max_abs_err
            FROM errs
        """,
        "q371_mmr_rerank": """
            WITH RECURSIVE
            qv AS (
              SELECT list_transform(embedding, x -> CAST(x AS DOUBLE))
                AS v
              FROM embeddings WHERE vec_id = 0
            ),
            cand AS (
              SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                list_dot_product(
                  list_transform(embedding, x -> CAST(x AS DOUBLE)),
                  qv.v)
                / (sqrt(list_dot_product(
                      list_transform(embedding, x -> CAST(x AS DOUBLE)),
                      list_transform(embedding, x -> CAST(x AS DOUBLE))))
                   * sqrt(list_dot_product(qv.v, qv.v))) AS rel
              FROM embeddings, qv
              WHERE vec_id <> 0
              ORDER BY rel DESC, vec_id ASC
              LIMIT 20
            ),
            sims AS (
              SELECT a.vec_id AS ia, b.vec_id AS ib,
                list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))) AS s
              FROM cand a, cand b
            ),
            sel AS (
              (SELECT 1 AS step, vec_id, rel AS mmr_score,
                 [vec_id] AS chosen
               FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1)
              UNION ALL
              (SELECT step + 1, c.vec_id,
                 0.5 * c.rel - 0.5 * m.maxsim AS mmr_score,
                 list_append(sel.chosen, c.vec_id)
               FROM sel
               JOIN cand c ON NOT list_contains(sel.chosen, c.vec_id),
               LATERAL (SELECT max(s) AS maxsim FROM sims
                        WHERE sims.ia = c.vec_id
                          AND list_contains(sel.chosen, sims.ib)) m
               WHERE step < 5
               ORDER BY 0.5 * c.rel - 0.5 * m.maxsim DESC, c.vec_id ASC
               LIMIT 1)
            )
            SELECT CAST(step AS INT) AS step,
              CAST(vec_id AS BIGINT) AS vec_id, mmr_score
            FROM sel
        """,
        "q372_welch_ttest": f"""
            WITH per_user AS (
              SELECT
                CASE WHEN substring(
                    md5('welch' || CAST(user_id AS VARCHAR)), 1, 8)
                  < '{_thr(0.5)}' THEN 'treat' ELSE 'control' END AS arm,
                CAST(sum(CAST(value AS DECIMAL(38,6)))
                  AS DECIMAL(19,2)) AS total
              FROM events GROUP BY user_id
            ),
            mom AS (
              SELECT arm, CAST(count(*) AS BIGINT) AS n,
                sum(total) AS s1, sum(total * total) AS s2
              FROM per_user WHERE total IS NOT NULL GROUP BY arm
            ),
            j AS (
              SELECT t.n AS n1, t.s1 AS a1, t.s2 AS a2,
                     c.n AS n2, c.s1 AS b1, c.s2 AS b2
              FROM (SELECT * FROM mom WHERE arm = 'treat') t,
                   (SELECT * FROM mom WHERE arm = 'control') c
            ),
            e AS (
              SELECT n1, n2,
                CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                CAST(b1 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
                (CAST(n1 AS DOUBLE) * CAST(a2 AS DOUBLE)
                  - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE))
                  / CAST(n1 * (n1 - 1) AS DOUBLE)
                  / CAST(n1 AS DOUBLE) AS se1,
                (CAST(n2 AS DOUBLE) * CAST(b2 AS DOUBLE)
                  - CAST(b1 AS DOUBLE) * CAST(b1 AS DOUBLE))
                  / CAST(n2 * (n2 - 1) AS DOUBLE)
                  / CAST(n2 AS DOUBLE) AS se2
              FROM j
            )
            SELECT n1 AS n_treat, n2 AS n_control,
              m1 AS mean_treat, m2 AS mean_control,
              (m1 - m2) / sqrt(se1 + se2) AS t_stat,
              ((se1 + se2) * (se1 + se2))
                / ((se1 * se1) / CAST(n1 - 1 AS DOUBLE)
                   + (se2 * se2) / CAST(n2 - 1 AS DOUBLE)) AS welch_df
            FROM e
        """,
        "q373_two_prop_z": f"""
            WITH base AS (
              SELECT
                CASE WHEN substring(
                    md5('zprop' || CAST(event_id AS VARCHAR)), 1, 8)
                  < '{_thr(0.5)}' THEN 'treat' ELSE 'control' END AS arm,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS c
              FROM events
            ),
            mom AS (
              SELECT arm, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(c) AS BIGINT) AS s
              FROM base GROUP BY arm
            ),
            j AS (
              SELECT t.n AS n1, t.s AS s1, c.n AS n2, c.s AS s2
              FROM (SELECT * FROM mom WHERE arm = 'treat') t,
                   (SELECT * FROM mom WHERE arm = 'control') c
            )
            SELECT n1, n2,
              CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p_treat,
              CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p_control,
              (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
              / sqrt(
                  (CAST(s1 + s2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                  * (1.0 - CAST(s1 + s2 AS DOUBLE)
                      / CAST(n1 + n2 AS DOUBLE))
                  * (1.0 / CAST(n1 AS DOUBLE)
                     + 1.0 / CAST(n2 AS DOUBLE))) AS z_stat
            FROM j
        """,
        "q374_bland_altman": """
            WITH recomputed AS (
              SELECT l_orderkey,
                sum(CAST(
                  CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(12,2))
                     - CAST(l_discount AS DECIMAL(12,2)))
                  * (CAST(1 AS DECIMAL(12,2))
                     + CAST(l_tax AS DECIMAL(12,2)))
                  AS DECIMAL(38,6))) AS li_total
              FROM lineitem GROUP BY l_orderkey
            ),
            diffs AS (
              SELECT CAST(
                CAST(CAST(o_totalprice AS DECIMAL(12,2))
                  AS DECIMAL(38,6)) - li_total
                AS DECIMAL(19,6)) AS d
              FROM orders JOIN recomputed ON o_orderkey = l_orderkey
            ),
            mom AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                sum(CAST(d AS DECIMAL(38,6))) AS sd,
                sum(d * d) AS sdd
              FROM diffs
            )
            SELECT n,
              CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS bias,
              sqrt((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                / CAST(n * (n - 1) AS DOUBLE)) AS sd_diff,
              CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)
                - 1.96 * sqrt((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                  - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                  / CAST(n * (n - 1) AS DOUBLE)) AS loa_low,
              CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)
                + 1.96 * sqrt((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                  - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                  / CAST(n * (n - 1) AS DOUBLE)) AS loa_high
            FROM mom
        """,
        "q375_tanimoto_users": """
            WITH counts AS (
              SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                  END) AS BIGINT) AS c_click,
                CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                  END) AS BIGINT) AS c_view,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                  ELSE 0 END) AS BIGINT) AS c_purchase,
                CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0
                  END) AS BIGINT) AS c_signup,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                  END) AS BIGINT) AS c_error
              FROM events GROUP BY user_id
            ),
            top AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (
                  ORDER BY n_events DESC, user_id ASC) AS rk
                FROM counts
              ) WHERE rk <= 10
            )
            SELECT a.user_id AS user_a, b.user_id AS user_b,
              CAST(least(a.c_click, b.c_click)
                + least(a.c_view, b.c_view)
                + least(a.c_purchase, b.c_purchase)
                + least(a.c_signup, b.c_signup)
                + least(a.c_error, b.c_error) AS BIGINT) AS overlap,
              CAST(greatest(a.c_click, b.c_click)
                + greatest(a.c_view, b.c_view)
                + greatest(a.c_purchase, b.c_purchase)
                + greatest(a.c_signup, b.c_signup)
                + greatest(a.c_error, b.c_error) AS BIGINT)
                AS union_size,
              CAST(least(a.c_click, b.c_click)
                + least(a.c_view, b.c_view)
                + least(a.c_purchase, b.c_purchase)
                + least(a.c_signup, b.c_signup)
                + least(a.c_error, b.c_error) AS DOUBLE)
              / CAST(greatest(a.c_click, b.c_click)
                + greatest(a.c_view, b.c_view)
                + greatest(a.c_purchase, b.c_purchase)
                + greatest(a.c_signup, b.c_signup)
                + greatest(a.c_error, b.c_error) AS DOUBLE)
                AS tanimoto
            FROM top a JOIN top b ON a.user_id < b.user_id
        """,
        "q376_cold_start": """
            WITH train_u AS (
              SELECT DISTINCT user_id FROM events
              WHERE ts < TIMESTAMP '2024-01-16'
            ),
            test_u AS (
              SELECT DISTINCT user_id FROM events
              WHERE ts >= TIMESTAMP '2024-01-16'
            ),
            train_p AS (
              SELECT DISTINCT user_id, event_type FROM events
              WHERE ts < TIMESTAMP '2024-01-16'
            ),
            test_p AS (
              SELECT DISTINCT user_id, event_type FROM events
              WHERE ts >= TIMESTAMP '2024-01-16'
            ),
            agg AS (
              SELECT
                (SELECT CAST(count(*) AS BIGINT) FROM test_u)
                  AS n_test_users,
                (SELECT CAST(count(*) AS BIGINT) FROM test_u t
                 WHERE NOT EXISTS (SELECT 1 FROM train_u r
                   WHERE r.user_id = t.user_id)) AS n_cold_users,
                (SELECT CAST(count(*) AS BIGINT) FROM test_p)
                  AS n_test_pairs,
                (SELECT CAST(count(*) AS BIGINT) FROM test_p t
                 WHERE NOT EXISTS (SELECT 1 FROM train_p r
                   WHERE r.user_id = t.user_id
                     AND r.event_type = t.event_type)) AS n_cold_pairs
            )
            SELECT n_test_users, n_cold_users,
              CAST(n_cold_users AS DOUBLE) / CAST(n_test_users AS DOUBLE)
                AS user_cold_share,
              n_test_pairs, n_cold_pairs,
              CAST(n_cold_pairs AS DOUBLE) / CAST(n_test_pairs AS DOUBLE)
                AS pair_cold_share
            FROM agg
        """,
        "q377_stump_split": """
            WITH cand AS (
              SELECT unnest([
                quantile_disc(value, 0.1), quantile_disc(value, 0.2),
                quantile_disc(value, 0.3), quantile_disc(value, 0.4),
                quantile_disc(value, 0.5), quantile_disc(value, 0.6),
                quantile_disc(value, 0.7), quantile_disc(value, 0.8),
                quantile_disc(value, 0.9)]) AS threshold
              FROM events
            ),
            per_c AS (
              SELECT threshold,
                CAST(sum(CASE WHEN value <= threshold THEN 1 ELSE 0
                  END) AS BIGINT) AS n_l,
                CAST(sum(CASE WHEN value <= threshold
                  AND event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k_l,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                  ELSE 0 END) AS BIGINT) AS k
              FROM events, cand
              GROUP BY threshold
            ),
            scored AS (
              SELECT threshold, n_l,
                CAST(n - n_l AS BIGINT) AS n_r,
                CAST(2 * k_l * (n_l - k_l) AS DOUBLE)
                  / CAST(n_l AS DOUBLE)
                + CAST(2 * (k - k_l) * ((n - n_l) - (k - k_l))
                    AS DOUBLE) / CAST(n - n_l AS DOUBLE)
                  AS gini_weighted
              FROM per_c
            )
            SELECT threshold, n_l, n_r, gini_weighted,
              gini_weighted = min(gini_weighted) OVER () AS is_best
            FROM scored
        """,
        "q378_quantile_normalize": """
            WITH daily AS (
              SELECT user_id, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            top AS (
              SELECT user_id FROM (
                SELECT user_id,
                  row_number() OVER (
                    ORDER BY sum(n) DESC, user_id ASC) AS rk
                FROM daily GROUP BY user_id
              ) WHERE rk <= 10
            ),
            ranked AS (
              SELECT d.user_id, d.d, d.n,
                CAST(row_number() OVER (PARTITION BY d.user_id
                  ORDER BY d.n ASC, d.d ASC) AS BIGINT) AS r
              FROM daily d JOIN top USING (user_id)
            ),
            ref AS (
              SELECT r,
                CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  AS ref_value
              FROM ranked GROUP BY r
            )
            SELECT ranked.user_id, ranked.d, ranked.n, ranked.r,
              ref.ref_value
            FROM ranked JOIN ref USING (r)
        """,
        "q379_price_endings": """
            WITH counts AS (
              SELECT CAST(CAST(p_retailprice * 100 + 0.5 AS BIGINT)
                % 100 AS BIGINT) AS cents,
                CAST(count(*) AS BIGINT) AS n
              FROM part GROUP BY 1
            )
            SELECT cents, n,
              CAST(n AS DOUBLE)
                / CAST(sum(n) OVER () AS DOUBLE) AS share
            FROM counts
        """,
        "q380_item_cf": """
            WITH ui AS (
              SELECT DISTINCT o_custkey AS cust, l_partkey AS item
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            ),
            deg AS (
              SELECT item, CAST(count(*) AS BIGINT) AS d
              FROM ui GROUP BY item
            ),
            top AS (
              SELECT item, d FROM (
                SELECT item, d,
                  row_number() OVER (ORDER BY d DESC, item ASC) AS rk
                FROM deg
              ) WHERE rk <= 20
            ),
            fact AS (
              SELECT cust, item FROM ui
              WHERE item IN (SELECT item FROM top)
            ),
            co AS (
              SELECT a.item AS ia, b.item AS ib,
                CAST(count(*) AS BIGINT) AS co
              FROM fact a JOIN fact b
                ON a.cust = b.cust AND a.item < b.item
              GROUP BY 1, 2
              HAVING count(*) >= 2
            )
            SELECT co.ia, co.ib, co.co,
              ta.d AS da, tb.d AS db,
              CAST(co.co AS DOUBLE)
                / (sqrt(CAST(ta.d AS DOUBLE))
                   * sqrt(CAST(tb.d AS DOUBLE))) AS cosine
            FROM co
            JOIN top ta ON co.ia = ta.item
            JOIN top tb ON co.ib = tb.item
        """,
        "q381_nrr": """
            WITH cm AS (
              SELECT o_custkey AS cust,
                date_trunc('month', o_orderdate) AS mon,
                sum(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
              FROM orders GROUP BY 1, 2
            ),
            retained AS (
              SELECT c.mon,
                CAST(count(*) AS BIGINT) AS n_retained_cust,
                sum(c.rev) AS retained_rev
              FROM cm c JOIN cm p
                ON c.cust = p.cust
                AND c.mon = p.mon + INTERVAL 1 MONTH
              GROUP BY c.mon
            ),
            den AS (
              SELECT mon + INTERVAL 1 MONTH AS mon,
                sum(rev) AS prev_total
              FROM cm GROUP BY 1
            )
            SELECT r.mon, r.n_retained_cust,
              CAST(r.retained_rev AS DOUBLE) AS retained_rev,
              CAST(d.prev_total AS DOUBLE) AS prev_total,
              CAST(r.retained_rev AS DOUBLE)
                / CAST(d.prev_total AS DOUBLE) AS nrr
            FROM retained r JOIN den d ON r.mon = d.mon
        """,
        "q382_pvm_bridge": """
            WITH base AS (
              SELECT p_brand,
                date_trunc('month', l_shipdate) AS mon,
                CAST(l_extendedprice AS DECIMAL(38,6)) AS ext,
                CAST(l_quantity AS DECIMAL(38,6)) AS qty
              FROM lineitem JOIN part ON l_partkey = p_partkey
            ),
            months AS (
              SELECT min(mon) AS m0, max(mon) AS m1 FROM base
            ),
            agg AS (
              SELECT p_brand,
                sum(CASE WHEN mon = m0 THEN ext
                    ELSE CAST(0 AS DECIMAL(38,6)) END) AS e0,
                sum(CASE WHEN mon = m0 THEN qty
                    ELSE CAST(0 AS DECIMAL(38,6)) END) AS q0,
                sum(CASE WHEN mon = m1 THEN ext
                    ELSE CAST(0 AS DECIMAL(38,6)) END) AS e1,
                sum(CASE WHEN mon = m1 THEN qty
                    ELSE CAST(0 AS DECIMAL(38,6)) END) AS q1
              FROM base, months
              WHERE mon = m0 OR mon = m1
              GROUP BY p_brand
              HAVING sum(CASE WHEN mon = m0 THEN qty
                    ELSE CAST(0 AS DECIMAL(38,6)) END) > 0
                AND sum(CASE WHEN mon = m1 THEN qty
                    ELSE CAST(0 AS DECIMAL(38,6)) END) > 0
            )
            SELECT p_brand,
              CAST(e1 AS DOUBLE) - CAST(e0 AS DOUBLE) AS delta_rev,
              (CAST(e1 AS DOUBLE) / CAST(q1 AS DOUBLE)
                - CAST(e0 AS DOUBLE) / CAST(q0 AS DOUBLE))
                * CAST(q0 AS DOUBLE) AS price_effect,
              (CAST(e0 AS DOUBLE) / CAST(q0 AS DOUBLE))
                * (CAST(q1 AS DOUBLE) - CAST(q0 AS DOUBLE))
                AS volume_effect,
              (CAST(e1 AS DOUBLE) / CAST(q1 AS DOUBLE)
                - CAST(e0 AS DOUBLE) / CAST(q0 AS DOUBLE))
                * (CAST(q1 AS DOUBLE) - CAST(q0 AS DOUBLE))
                AS joint_effect
            FROM agg
        """,
        "q383_knee_point": """
            WITH per_user AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
              FROM events GROUP BY user_id
            ),
            ranked AS (
              SELECT n_events,
                CAST(row_number() OVER (
                  ORDER BY n_events DESC, user_id ASC) AS BIGINT) AS r
              FROM per_user
            ),
            pts AS (
              SELECT r, n_events,
                max(CASE WHEN r = 1 THEN n_events END) OVER () AS y1,
                max(r) OVER () AS n
              FROM ranked
            ),
            pts2 AS (
              SELECT r, n_events, y1, n,
                max(CASE WHEN r = n THEN n_events END) OVER () AS yn
              FROM pts
            )
            SELECT r AS knee_rank, n_events AS knee_value,
              CAST(abs((yn - y1) * (r - 1)
                - (n - 1) * (n_events - y1)) AS BIGINT) AS chord_dist
            FROM pts2
            ORDER BY abs((yn - y1) * (r - 1)
              - (n - 1) * (n_events - y1)) DESC, r ASC
            LIMIT 1
        """,
        "q384_icc": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            wide AS (
              SELECT
                CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                  END) AS BIGINT) AS m_click,
                CAST(sum(CASE WHEN event_type = 'click' THEN n ELSE 0
                  END) AS BIGINT) AS s_click,
                CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                  END) AS BIGINT) AS m_view,
                CAST(sum(CASE WHEN event_type = 'view' THEN n ELSE 0
                  END) AS BIGINT) AS s_view,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                  ELSE 0 END) AS BIGINT) AS m_purchase,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN n
                  ELSE 0 END) AS BIGINT) AS s_purchase,
                CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0
                  END) AS BIGINT) AS m_signup,
                CAST(sum(CASE WHEN event_type = 'signup' THEN n ELSE 0
                  END) AS BIGINT) AS s_signup,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                  END) AS BIGINT) AS m_error,
                CAST(sum(CASE WHEN event_type = 'error' THEN n ELSE 0
                  END) AS BIGINT) AS s_error,
                CAST(sum(n * n) AS BIGINT) AS q_sum
              FROM daily
            ),
            e AS (
              SELECT
                CAST(5 AS BIGINT) AS k,
                m_click + m_view + m_purchase + m_signup + m_error
                  AS nn,
                CAST(m_click * m_click + m_view * m_view
                  + m_purchase * m_purchase + m_signup * m_signup
                  + m_error * m_error AS BIGINT) AS m2_sum,
                s_click + s_view + s_purchase + s_signup + s_error
                  AS s_sum,
                q_sum,
                CAST(s_click AS DOUBLE) * CAST(s_click AS DOUBLE)
                  / CAST(m_click AS DOUBLE)
                + CAST(s_view AS DOUBLE) * CAST(s_view AS DOUBLE)
                  / CAST(m_view AS DOUBLE)
                + CAST(s_purchase AS DOUBLE)
                  * CAST(s_purchase AS DOUBLE)
                  / CAST(m_purchase AS DOUBLE)
                + CAST(s_signup AS DOUBLE) * CAST(s_signup AS DOUBLE)
                  / CAST(m_signup AS DOUBLE)
                + CAST(s_error AS DOUBLE) * CAST(s_error AS DOUBLE)
                  / CAST(m_error AS DOUBLE) AS ssb_fixed
              FROM wide
            ),
            f AS (
              SELECT k, nn, m2_sum,
                (ssb_fixed - CAST(s_sum AS DOUBLE)
                  * CAST(s_sum AS DOUBLE) / CAST(nn AS DOUBLE))
                  / CAST(k - 1 AS DOUBLE) AS msb,
                (CAST(q_sum AS DOUBLE) - ssb_fixed)
                  / CAST(nn - k AS DOUBLE) AS msw
              FROM e
            )
            SELECT k AS k_groups, nn AS n_days, msb, msw,
              (msb - msw) / (msb + ((CAST(nn AS DOUBLE)
                - CAST(m2_sum AS DOUBLE) / CAST(nn AS DOUBLE))
                / CAST(k - 1 AS DOUBLE) - 1.0) * msw) AS icc1
            FROM f
        """,
        "q385_seasonal_strength": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            dowed AS (
              SELECT event_type,
                CAST(dayofweek(d) + 1 AS INT) AS dow, n
              FROM daily
            ),
            wide AS (
              SELECT event_type,
                CAST(sum(CASE WHEN dow = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS m1,
                CAST(sum(CASE WHEN dow = 1 THEN n ELSE 0 END)
                  AS BIGINT) AS s1,
                CAST(sum(CASE WHEN dow = 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS m2,
                CAST(sum(CASE WHEN dow = 2 THEN n ELSE 0 END)
                  AS BIGINT) AS s2,
                CAST(sum(CASE WHEN dow = 3 THEN 1 ELSE 0 END)
                  AS BIGINT) AS m3,
                CAST(sum(CASE WHEN dow = 3 THEN n ELSE 0 END)
                  AS BIGINT) AS s3,
                CAST(sum(CASE WHEN dow = 4 THEN 1 ELSE 0 END)
                  AS BIGINT) AS m4,
                CAST(sum(CASE WHEN dow = 4 THEN n ELSE 0 END)
                  AS BIGINT) AS s4,
                CAST(sum(CASE WHEN dow = 5 THEN 1 ELSE 0 END)
                  AS BIGINT) AS m5,
                CAST(sum(CASE WHEN dow = 5 THEN n ELSE 0 END)
                  AS BIGINT) AS s5,
                CAST(sum(CASE WHEN dow = 6 THEN 1 ELSE 0 END)
                  AS BIGINT) AS m6,
                CAST(sum(CASE WHEN dow = 6 THEN n ELSE 0 END)
                  AS BIGINT) AS s6,
                CAST(sum(CASE WHEN dow = 7 THEN 1 ELSE 0 END)
                  AS BIGINT) AS m7,
                CAST(sum(CASE WHEN dow = 7 THEN n ELSE 0 END)
                  AS BIGINT) AS s7,
                CAST(sum(n) AS BIGINT) AS s_sum,
                CAST(sum(n * n) AS BIGINT) AS q_sum,
                CAST(count(*) AS BIGINT) AS m_sum
              FROM dowed GROUP BY event_type
            ),
            e AS (
              SELECT event_type, m_sum, s_sum, q_sum,
                (CASE WHEN m1 = 0 THEN 0.0 ELSE CAST(s1 AS DOUBLE)
                  * CAST(s1 AS DOUBLE) / CAST(m1 AS DOUBLE) END)
                + (CASE WHEN m2 = 0 THEN 0.0 ELSE CAST(s2 AS DOUBLE)
                  * CAST(s2 AS DOUBLE) / CAST(m2 AS DOUBLE) END)
                + (CASE WHEN m3 = 0 THEN 0.0 ELSE CAST(s3 AS DOUBLE)
                  * CAST(s3 AS DOUBLE) / CAST(m3 AS DOUBLE) END)
                + (CASE WHEN m4 = 0 THEN 0.0 ELSE CAST(s4 AS DOUBLE)
                  * CAST(s4 AS DOUBLE) / CAST(m4 AS DOUBLE) END)
                + (CASE WHEN m5 = 0 THEN 0.0 ELSE CAST(s5 AS DOUBLE)
                  * CAST(s5 AS DOUBLE) / CAST(m5 AS DOUBLE) END)
                + (CASE WHEN m6 = 0 THEN 0.0 ELSE CAST(s6 AS DOUBLE)
                  * CAST(s6 AS DOUBLE) / CAST(m6 AS DOUBLE) END)
                + (CASE WHEN m7 = 0 THEN 0.0 ELSE CAST(s7 AS DOUBLE)
                  * CAST(s7 AS DOUBLE) / CAST(m7 AS DOUBLE) END)
                AS ssg
              FROM wide
            )
            SELECT event_type, m_sum AS n_days,
              CAST(q_sum AS DOUBLE) - CAST(s_sum AS DOUBLE)
                * CAST(s_sum AS DOUBLE) / CAST(m_sum AS DOUBLE)
                AS sst,
              CAST(q_sum AS DOUBLE) - ssg AS ss_remainder,
              greatest(0.0, 1.0 - (CAST(q_sum AS DOUBLE) - ssg)
                / (CAST(q_sum AS DOUBLE) - CAST(s_sum AS DOUBLE)
                   * CAST(s_sum AS DOUBLE) / CAST(m_sum AS DOUBLE)))
                AS seasonal_strength
            FROM e
        """,
        "q386_median_polish": """
            WITH daily AS (
              SELECT date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ),
            cells AS (
              SELECT CAST(dayofweek(d) + 1 AS INT) AS dow,
                CAST(floor(datediff('day', DATE '2024-01-01',
                  CAST(d AS DATE)) / 7) AS INT) AS wk,
                n
              FROM daily
            ),
            row_med AS (
              SELECT dow, CAST(quantile_disc(n, 0.5) AS BIGINT)
                AS row_eff
              FROM cells GROUP BY dow
            ),
            r1 AS (
              SELECT c.dow, c.wk, c.n, r.row_eff,
                c.n - r.row_eff AS r1
              FROM cells c JOIN row_med r ON c.dow = r.dow
            ),
            col_med AS (
              SELECT wk, CAST(quantile_disc(r1, 0.5) AS BIGINT)
                AS col_eff
              FROM r1 GROUP BY wk
            )
            SELECT r1.dow, r1.wk, r1.n, r1.row_eff, c.col_eff,
              CAST(r1.r1 - c.col_eff AS BIGINT) AS resid
            FROM r1 JOIN col_med c ON r1.wk = c.wk
        """,
        "q387_cochran_q": """
            WITH daily AS (
              SELECT date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ),
            med AS (
              SELECT CAST(quantile_disc(n, 0.5) AS BIGINT) AS med
              FROM daily
            ),
            flags AS (
              SELECT d, n,
                lag(n, 1) OVER (ORDER BY d) AS p1,
                lag(n, 7) OVER (ORDER BY d) AS p7
              FROM daily
            ),
            scored AS (
              SELECT
                CASE WHEN n > p1 THEN 1 ELSE 0 END AS a,
                CASE WHEN n > p7 THEN 1 ELSE 0 END AS b,
                CASE WHEN n > med THEN 1 ELSE 0 END AS c
              FROM flags, med
              WHERE p1 IS NOT NULL AND p7 IS NOT NULL
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(a) AS BIGINT) AS ga,
                CAST(sum(b) AS BIGINT) AS gb,
                CAST(sum(c) AS BIGINT) AS gc,
                CAST(sum(a + b + c) AS BIGINT) AS sl,
                CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS sl2
              FROM scored
            )
            SELECT n_days, ga, gb, gc,
              CAST(2 * (3 * (ga * ga + gb * gb + gc * gc) - sl * sl)
                AS DOUBLE) / CAST(3 * sl - sl2 AS DOUBLE) AS cochran_q
            FROM agg
        """,
        "q388_friedman": """
            WITH daily0 AS (
              SELECT date_trunc('day', ts) AS d, event_type,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            kall AS (
              SELECT CAST(count(DISTINCT event_type) AS BIGINT)
                AS k_all
              FROM daily0
            ),
            daily AS (
              SELECT d, event_type, n FROM (
                SELECT d, event_type, n,
                  count(*) OVER (PARTITION BY d) AS d_cnt,
                  (SELECT k_all FROM kall) AS k_all
                FROM daily0
              ) WHERE d_cnt = k_all
            ),
            ranked AS (
              SELECT d, event_type,
                CAST(2 * rank() OVER (PARTITION BY d ORDER BY n)
                  + count(*) OVER (PARTITION BY d, n) - 1 AS BIGINT)
                  AS r2
              FROM daily
            ),
            sums AS (
              SELECT event_type,
                CAST(sum(r2) AS BIGINT) AS rsum2,
                CAST(count(*) AS BIGINT) AS n_days
              FROM ranked GROUP BY event_type
            ),
            tot AS (
              SELECT CAST(max(n_days) AS BIGINT) AS nn,
                CAST(sum(rsum2 * rsum2) AS BIGINT) AS sr2,
                CAST(count(*) AS BIGINT) AS k
              FROM sums
            )
            SELECT nn AS n_days, k AS k_treatments,
              3.0 * CAST(sr2 AS DOUBLE)
                / CAST(nn * k * (k + 1) AS DOUBLE)
              - 3.0 * CAST(nn * (k + 1) AS DOUBLE) AS friedman_chi2
            FROM tot
        """,
        "q389_cvm_two_sample": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            base AS (
              SELECT event_type, d, n,
                CASE WHEN d < TIMESTAMP '2024-01-16' THEN 'a'
                  ELSE 'b' END AS h
              FROM daily
            ),
            ranked AS (
              SELECT event_type, h,
                CAST(row_number() OVER (PARTITION BY event_type
                  ORDER BY n, d) AS BIGINT) AS r,
                CAST(row_number() OVER (PARTITION BY event_type, h
                  ORDER BY n, d) AS BIGINT) AS i
              FROM base
            ),
            agg AS (
              SELECT event_type,
                CAST(sum(CASE WHEN h = 'a' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN h = 'b' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_b,
                CAST(sum(CASE WHEN h = 'a' THEN (r - i) * (r - i)
                  ELSE 0 END) AS BIGINT) AS ua,
                CAST(sum(CASE WHEN h = 'b' THEN (r - i) * (r - i)
                  ELSE 0 END) AS BIGINT) AS ub
              FROM ranked GROUP BY event_type
            )
            SELECT event_type, n_a, n_b,
              CAST(n_a * ua + n_b * ub AS BIGINT) AS u,
              CAST(n_a * ua + n_b * ub AS DOUBLE)
                / CAST(n_a * n_b * (n_a + n_b) AS DOUBLE)
              - CAST(4 * n_a * n_b - 1 AS DOUBLE)
                / CAST(6 * (n_a + n_b) AS DOUBLE) AS cvm_t
            FROM agg
        """,
        # Mirrors _q_pacf's Durbin–Levinson recursion: the ACF inputs
        # are the same integer common-denominator ratios, and each
        # recursive step applies the identical sequential
        # subtract-then-divide order the Python loop uses.
        "q390_pacf": """
            WITH RECURSIVE daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            mom AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS m,
                CAST(sum(n) AS BIGINT) AS s
              FROM daily GROUP BY event_type
            ),
            lagged AS (
              SELECT d.event_type,
                mom.m * d.n - mom.s AS c0,
                mom.m * lag(d.n, 1) OVER w - mom.s AS c1,
                mom.m * lag(d.n, 2) OVER w - mom.s AS c2,
                mom.m * lag(d.n, 3) OVER w - mom.s AS c3,
                mom.m * lag(d.n, 4) OVER w - mom.s AS c4,
                mom.m * lag(d.n, 5) OVER w - mom.s AS c5,
                mom.m * lag(d.n, 6) OVER w - mom.s AS c6,
                mom.m * lag(d.n, 7) OVER w - mom.s AS c7
              FROM daily d JOIN mom USING (event_type)
              WINDOW w AS (PARTITION BY d.event_type ORDER BY d.d)
            ),
            acf AS (
              SELECT event_type,
                [CAST(CAST(sum(c0 * c1) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(sum(c0 * c0) AS BIGINT) AS DOUBLE),
                 CAST(CAST(sum(c0 * c2) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(sum(c0 * c0) AS BIGINT) AS DOUBLE),
                 CAST(CAST(sum(c0 * c3) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(sum(c0 * c0) AS BIGINT) AS DOUBLE),
                 CAST(CAST(sum(c0 * c4) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(sum(c0 * c0) AS BIGINT) AS DOUBLE),
                 CAST(CAST(sum(c0 * c5) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(sum(c0 * c0) AS BIGINT) AS DOUBLE),
                 CAST(CAST(sum(c0 * c6) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(sum(c0 * c0) AS BIGINT) AS DOUBLE),
                 CAST(CAST(sum(c0 * c7) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(sum(c0 * c0) AS BIGINT) AS DOUBLE)]
                  AS r
              FROM lagged GROUP BY event_type
            ),
            dl AS (
              SELECT event_type, r, CAST(0 AS BIGINT) AS k,
                CAST([] AS DOUBLE[]) AS phi,
                CAST(NULL AS DOUBLE) AS pkk
              FROM acf
              UNION ALL
              SELECT d.event_type, d.r, d.k + 1,
                list_append(
                  list_transform(
                    range(1, CAST(d.k AS INT) + 1),
                    j -> d.phi[j] - t.pkk
                      * d.phi[CAST(d.k AS INT) + 1 - j]),
                  t.pkk),
                t.pkk
              FROM dl d,
              LATERAL (
                SELECT
                  list_reduce(
                    list_concat([d.r[CAST(d.k AS INT) + 1]],
                      list_transform(range(1, CAST(d.k AS INT) + 1),
                        j -> d.phi[j]
                          * d.r[CAST(d.k AS INT) + 1 - j])),
                    (a, b) -> a - b)
                  / list_reduce(
                    list_concat([CAST(1.0 AS DOUBLE)],
                      list_transform(range(1, CAST(d.k AS INT) + 1),
                        j -> d.phi[j] * d.r[j])),
                    (a, b) -> a - b) AS pkk
              ) t
              WHERE d.k < 7
            )
            SELECT event_type, CAST(k AS INT) AS lag, pkk AS pacf
            FROM dl WHERE k >= 1
        """,
        "q391_kruskal_wallis": f"""
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            ranked AS (
              SELECT event_type,
                CAST(2 * rank() OVER (ORDER BY n)
                  + count(*) OVER (PARTITION BY n) - 1 AS BIGINT) AS r2,
                CAST(count(*) OVER (PARTITION BY n) AS BIGINT) AS tsz
              FROM daily
            ),
            g AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS m,
                CAST(sum(r2) AS BIGINT) AS s,
                CAST(sum(tsz * tsz - 1) AS BIGINT) AS tp
              FROM ranked GROUP BY event_type
            ),
            wide AS (
              SELECT
                {", ".join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN s END) AS BIGINT) AS s_{t}, CAST(sum(CASE WHEN event_type = '{t}' THEN m END) AS BIGINT) AS m_{t}" for t in EVENT_TYPES)},
                CAST(sum(m) AS BIGINT) AS nn,
                CAST(sum(tp) AS BIGINT) AS tie_sum
              FROM g
            ),
            e AS (
              SELECT nn, tie_sum,
                {" + ".join(f"CAST(s_{t} AS DOUBLE) * CAST(s_{t} AS DOUBLE) / CAST(m_{t} AS DOUBLE)" for t in EVENT_TYPES)} AS srr
              FROM wide
            )
            SELECT nn AS n_cells,
              3.0 * srr / CAST(nn * (nn + 1) AS DOUBLE)
                - 3.0 * CAST(nn + 1 AS DOUBLE) AS h_stat,
              (3.0 * srr / CAST(nn * (nn + 1) AS DOUBLE)
                - 3.0 * CAST(nn + 1 AS DOUBLE))
                / (1.0 - CAST(tie_sum AS DOUBLE)
                    / CAST(nn * nn * nn - nn AS DOUBLE)) AS h_corrected
            FROM e
        """,
        "q392_brown_forsythe": f"""
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            meds AS (
              SELECT event_type,
                percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS med
              FROM daily GROUP BY event_type
            ),
            z AS (
              SELECT d.event_type,
                CAST(abs(d.n - m.med) AS BIGINT) AS z
              FROM daily d JOIN meds m USING (event_type)
            ),
            g AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS m,
                CAST(sum(z) AS BIGINT) AS s,
                CAST(sum(z * z) AS BIGINT) AS q
              FROM z GROUP BY event_type
            ),
            wide AS (
              SELECT
                {", ".join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN s END) AS BIGINT) AS s_{t}, CAST(sum(CASE WHEN event_type = '{t}' THEN m END) AS BIGINT) AS m_{t}" for t in EVENT_TYPES)},
                CAST(sum(m) AS BIGINT) AS nn,
                CAST(sum(s) AS BIGINT) AS s_sum,
                CAST(sum(q) AS BIGINT) AS q_sum
              FROM g
            ),
            e AS (
              SELECT nn, s_sum, q_sum,
                {" + ".join(f"CAST(s_{t} AS DOUBLE) * CAST(s_{t} AS DOUBLE) / CAST(m_{t} AS DOUBLE)" for t in EVENT_TYPES)} AS ssg
              FROM wide
            )
            SELECT CAST(5 AS BIGINT) AS k_groups, nn AS n_days,
              CAST(4 AS BIGINT) AS df1, nn - 5 AS df2,
              ((ssg - CAST(s_sum AS DOUBLE) * CAST(s_sum AS DOUBLE)
                  / CAST(nn AS DOUBLE)) / CAST(4 AS DOUBLE))
                / ((CAST(q_sum AS DOUBLE) - ssg)
                  / CAST(nn - 5 AS DOUBLE)) AS f_stat
            FROM e
        """,
        "q393_allan_variance": f"""
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            idx AS (
              SELECT event_type, n,
                CAST(row_number() OVER (
                  PARTITION BY event_type ORDER BY d) AS BIGINT) AS i
              FROM daily
            )
            {" UNION ALL ".join(f'''
            SELECT event_type, CAST({tau} AS INT) AS tau, m_bins,
              CAST(sd2 AS DOUBLE)
                / CAST(2 * (m_bins - 1) * {tau} * {tau} AS DOUBLE)
                AS allan_var
            FROM (
              SELECT event_type, CAST(count(*) AS BIGINT) AS m_bins,
                CAST(sum(diff * diff) AS BIGINT) AS sd2
              FROM (
                SELECT event_type,
                  lead(sb) OVER (PARTITION BY event_type ORDER BY b)
                    - sb AS diff
                FROM (
                  SELECT event_type, b, count(*) AS cnt,
                    CAST(sum(n) AS BIGINT) AS sb
                  FROM (
                    SELECT event_type, n, (i - 1) // {tau} AS b
                    FROM idx
                  ) GROUP BY event_type, b HAVING count(*) = {tau}
                )
              ) GROUP BY event_type
            )''' for tau in (1, 2, 3))}
        """,
        "q394_hurst_rs": f"""
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            idx AS (
              SELECT event_type, d, n,
                CAST(row_number() OVER (
                  PARTITION BY event_type ORDER BY d) AS BIGINT) AS i
              FROM daily
            )
            {" UNION ALL ".join(f'''
            SELECT event_type, CAST({w} AS INT) AS w,
              CAST(blk AS BIGINT) AS block,
              CAST(r_scaled AS DOUBLE)
                / sqrt(CAST({w} * q - s * s AS DOUBLE)) AS rs
            FROM (
              SELECT event_type, blk, s, q,
                CAST(max(dev) - min(dev) AS BIGINT) AS r_scaled
              FROM (
                SELECT r.event_type, r.blk, b.s, b.q,
                  CAST({w} * sum(r.n) OVER (
                      PARTITION BY r.event_type, r.blk ORDER BY r.d
                      ROWS UNBOUNDED PRECEDING)
                    - r.t_in * b.s AS BIGINT) AS dev
                FROM (
                  SELECT event_type, d, n,
                    (i - 1) // {w} AS blk,
                    i - ((i - 1) // {w}) * {w} AS t_in
                  FROM idx
                ) r JOIN (
                  SELECT event_type, blk, count(*) AS cnt,
                    CAST(sum(n) AS BIGINT) AS s,
                    CAST(sum(n * n) AS BIGINT) AS q
                  FROM (
                    SELECT event_type, n, (i - 1) // {w} AS blk
                    FROM idx
                  ) GROUP BY event_type, blk HAVING count(*) = {w}
                ) b USING (event_type, blk)
              ) GROUP BY event_type, blk, s, q
            )''' for w in (8, 16))}
        """,
        "q395_psi_drift": f"""
            WITH base AS (
              SELECT CAST(value AS DECIMAL(18,2)) AS v,
                ts < TIMESTAMP '2024-01-16' AS is_train
              FROM events WHERE value IS NOT NULL
            ),
            ed AS (
              SELECT
                {", ".join(f"percentile_disc(0.{k}) WITHIN GROUP (ORDER BY v) AS e{k}" for k in range(1, 10))}
              FROM base WHERE is_train
            ),
            b AS (
              SELECT is_train,
                {" + ".join(f"(CASE WHEN v > (SELECT e{k} FROM ed) THEN 1 ELSE 0 END)" for k in range(1, 10))} AS bin
              FROM base
            ),
            counts AS (
              SELECT bin,
                CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_train,
                CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END)
                  AS BIGINT) AS c_test
              FROM b GROUP BY bin
            ),
            wide AS (
              SELECT
                {", ".join(f"coalesce(max(CASE WHEN bin = {k} THEN c_train END), 0) AS tr{k}, coalesce(max(CASE WHEN bin = {k} THEN c_test END), 0) AS te{k}" for k in range(10))},
                CAST(sum(c_train) AS BIGINT) AS n_train,
                CAST(sum(c_test) AS BIGINT) AS n_test
              FROM counts
            ),
            pq AS (
              SELECT n_train, n_test,
                {", ".join(f"CAST(tr{k} + 1 AS DOUBLE) / CAST(n_train + 10 AS DOUBLE) AS p{k}, CAST(te{k} + 1 AS DOUBLE) / CAST(n_test + 10 AS DOUBLE) AS q{k}" for k in range(10))}
              FROM wide
            )
            SELECT n_train, n_test,
              {" + ".join(f"(p{k} - q{k}) * ln(p{k} / q{k})" for k in range(10))} AS psi
            FROM pq
        """,
        "q396_xcorr_lag": f"""
            WITH daily AS (
              SELECT event_type,
                CAST(date_trunc('day', ts) AS DATE) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            c AS (
              SELECT d AS cd, n AS x FROM daily
              WHERE event_type = 'click'
            ),
            p AS (
              SELECT d AS pd, n AS y FROM daily
              WHERE event_type = 'purchase'
            )
            {" UNION ALL ".join(f'''
            SELECT CAST({lag} AS INT) AS lag_days, m AS n_days,
              CAST(m * sxy - sx * sy AS DOUBLE)
                / (sqrt(CAST(m * sx2 - sx * sx AS DOUBLE))
                   * sqrt(CAST(m * sy2 - sy * sy AS DOUBLE))) AS xcorr
            FROM (
              SELECT CAST(count(*) AS BIGINT) AS m,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sx2,
                CAST(sum(y * y) AS BIGINT) AS sy2
              FROM c JOIN p ON cd + ({lag}) = pd
            )''' for lag in range(-3, 4))}
        """,
        "q397_granger": """
            WITH daily AS (
              SELECT event_type,
                CAST(date_trunc('day', ts) AS DATE) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            yy AS (
              SELECT d, n AS y FROM daily WHERE event_type = 'purchase'
            ),
            xx AS (
              SELECT d, n AS x FROM daily WHERE event_type = 'click'
            ),
            j AS (
              SELECT yy.d, yy.y, xx.x FROM yy JOIN xx USING (d)
            ),
            lagged AS (
              SELECT y,
                lag(y) OVER (ORDER BY d) AS z,
                lag(x) OVER (ORDER BY d) AS w
              FROM j
            ),
            fl AS (
              SELECT * FROM lagged
              WHERE z IS NOT NULL AND w IS NOT NULL
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS m,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(z) AS BIGINT) AS sz,
                CAST(sum(w) AS BIGINT) AS sw,
                CAST(sum(y * y) AS BIGINT) AS syy,
                CAST(sum(z * z) AS BIGINT) AS szz,
                CAST(sum(w * w) AS BIGINT) AS sww,
                CAST(sum(z * y) AS BIGINT) AS szy,
                CAST(sum(w * y) AS BIGINT) AS swy,
                CAST(sum(z * w) AS BIGINT) AS szw
              FROM fl
            ),
            hat AS (
              SELECT m,
                CAST(m * syy - sy * sy AS HUGEINT) AS hyy,
                CAST(m * szz - sz * sz AS HUGEINT) AS hzz,
                CAST(m * sww - sw * sw AS HUGEINT) AS hww,
                CAST(m * szy - sz * sy AS HUGEINT) AS hzy,
                CAST(m * swy - sw * sy AS HUGEINT) AS hwy,
                CAST(m * szw - sz * sw AS HUGEINT) AS hzw
              FROM agg
            ),
            e AS (
              SELECT m, hyy, hzz, hzy,
                hww * hzy * hzy - 2 * hzw * hzy * hwy
                  + hzz * hwy * hwy AS num_u,
                hzz * hww - hzw * hzw AS dd
              FROM hat
            ),
            f2 AS (
              SELECT m,
                num_u * hzz - hzy * hzy * dd AS a,
                hzz * (hyy * dd - num_u) AS b
              FROM e
            )
            SELECT m AS n_obs,
              CAST(m - 3 AS DOUBLE)
                * (CAST(a AS DOUBLE) / CAST(b AS DOUBLE)) AS f_granger
            FROM f2
        """,
        "q398_james_stein": f"""
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            g AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS m,
                CAST(sum(n) AS BIGINT) AS s,
                CAST(sum(n * n) AS BIGINT) AS q
              FROM daily GROUP BY event_type
            ),
            wide AS (
              SELECT
                {", ".join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN s END) AS BIGINT) AS s_{t}, CAST(sum(CASE WHEN event_type = '{t}' THEN m END) AS BIGINT) AS m_{t}" for t in EVENT_TYPES)},
                CAST(sum(m) AS BIGINT) AS nn,
                CAST(sum(s) AS BIGINT) AS s_sum,
                CAST(sum(q) AS BIGINT) AS q_sum
              FROM g
            ),
            e AS (
              SELECT *,
                CAST(s_sum AS DOUBLE) / CAST(nn AS DOUBLE) AS gbar,
                {" + ".join(f"CAST(s_{t} AS DOUBLE) * CAST(s_{t} AS DOUBLE) / CAST(m_{t} AS DOUBLE)" for t in EVENT_TYPES)} AS ssg
              FROM wide
            ),
            f AS (
              SELECT *,
                (CAST(q_sum AS DOUBLE) - ssg)
                  / CAST(nn - 5 AS DOUBLE) AS msw,
                CAST(nn AS DOUBLE) / 5.0 AS mbar,
                {" + ".join(f"(CAST(s_{t} AS DOUBLE) / CAST(m_{t} AS DOUBLE) - gbar) * (CAST(s_{t} AS DOUBLE) / CAST(m_{t} AS DOUBLE) - gbar)" for t in EVENT_TYPES)} AS ssb
              FROM e
            ),
            g2 AS (
              SELECT *,
                greatest(0.0, 1.0 - (2.0 * (msw / mbar)) / ssb) AS c
              FROM f
            )
            {" UNION ALL ".join(f'''
            SELECT '{t}' AS event_type,
              CAST(s_{t} AS DOUBLE) / CAST(m_{t} AS DOUBLE) AS raw_mean,
              gbar + c * (CAST(s_{t} AS DOUBLE) / CAST(m_{t} AS DOUBLE)
                - gbar) AS shrunk_mean
            FROM g2''' for t in EVENT_TYPES)}
        """,
        "q399_good_turing": r"""
            WITH tok AS (
              SELECT source,
                unnest(list_filter(string_split_regex(trim(text), '\s+'),
                  x -> x <> '')) AS t
              FROM documents
            ),
            tc AS (
              SELECT source, t, CAST(count(*) AS BIGINT) AS c
              FROM tok GROUP BY 1, 2
            )
            SELECT source,
              CAST(sum(c) AS BIGINT) AS n_tokens,
              CAST(count(*) AS BIGINT) AS n_types,
              CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hapax,
              CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(sum(c) AS DOUBLE) AS unseen_mass
            FROM tc GROUP BY source
        """,
        "q400_kaplan_meier": """
            WITH RECURSIVE pur AS (
              SELECT DISTINCT user_id,
                CAST(date_trunc('day', ts) AS DATE) AS pd
              FROM events WHERE event_type = 'purchase'
            ),
            sp AS (
              SELECT
                CASE WHEN nxt IS NULL
                  THEN datediff('day', pd, DATE '2024-01-30')
                  ELSE datediff('day', pd, nxt) END AS dur,
                CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS obs
              FROM (
                SELECT pd, lead(pd) OVER (
                  PARTITION BY user_id ORDER BY pd) AS nxt
                FROM pur
              )
            ),
            steps AS (
              SELECT CAST(dur AS INT) AS dur,
                CAST(sum(obs) AS BIGINT) AS d,
                CAST(sum(1 - obs) AS BIGINT) AS c
              FROM sp GROUP BY 1
            ),
            ord AS (
              SELECT dur, d, c,
                CAST(row_number() OVER (ORDER BY dur) AS BIGINT) AS rn
              FROM steps
            ),
            rec AS (
              SELECT CAST(0 AS BIGINT) AS rn,
                CAST((SELECT sum(d + c) FROM steps) AS BIGINT)
                  AS n_next,
                CAST(1.0 AS DOUBLE) AS s
              UNION ALL
              SELECT o.rn, r.n_next - (o.d + o.c),
                r.s * (1.0 - CAST(o.d AS DOUBLE)
                  / CAST(r.n_next AS DOUBLE))
              FROM rec r JOIN ord o ON o.rn = r.rn + 1
            )
            SELECT o.dur AS duration, r0.n_next AS n_risk,
              o.d AS d_events, o.c AS c_censored, r.s AS survival
            FROM ord o
            JOIN rec r ON r.rn = o.rn
            JOIN rec r0 ON r0.rn = o.rn - 1
        """,
        "q401_binseg_changepoint": """
            WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ),
            cum AS (
              SELECT d,
                CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
                CAST(sum(n) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cs,
                CAST(count(*) OVER () AS BIGINT) AS nn,
                CAST(sum(n) OVER () AS BIGINT) AS tt
              FROM daily
            )
            SELECT d AS split_day, i AS n_left, nn - i AS n_right,
              CAST(cs * cs AS DOUBLE) / CAST(i AS DOUBLE)
                + CAST((tt - cs) * (tt - cs) AS DOUBLE)
                  / CAST(nn - i AS DOUBLE)
                - CAST(tt * tt AS DOUBLE) / CAST(nn AS DOUBLE) AS gain
            FROM cum WHERE i < nn
            ORDER BY gain DESC, split_day ASC LIMIT 1
        """,
        "q402_entropy_mix": """
            WITH c AS (
              SELECT source, lang, CAST(count(*) AS BIGINT) AS c
              FROM documents GROUP BY 1, 2
            ),
            tot AS (
              SELECT source, CAST(sum(c) AS BIGINT) AS n,
                CAST(sum(c * c) AS BIGINT) AS c2,
                CAST(count(*) AS BIGINT) AS nl
              FROM c GROUP BY source
            ),
            ent AS (
              SELECT c.source,
                list_reduce(
                  list(-(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE)
                    * ln(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE)))
                    ORDER BY c.lang),
                  (a, b) -> a + b) AS h
              FROM c JOIN tot t USING (source) GROUP BY c.source
            )
            SELECT t.source, t.n AS n_docs, t.nl AS n_langs,
              e.h AS entropy,
              CAST(t.c2 AS DOUBLE)
                / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE))
                AS herfindahl,
              exp(e.h) AS effective_langs
            FROM tot t JOIN ent e ON e.source = t.source
        """,
        "q403_bartlett": f"""
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            g AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS m,
                CAST(sum(n) AS BIGINT) AS s,
                CAST(sum(n * n) AS BIGINT) AS q
              FROM daily GROUP BY event_type
            ),
            wide AS (
              SELECT
                {", ".join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN m END) AS BIGINT) AS m_{t}, CAST(sum(CASE WHEN event_type = '{t}' THEN s END) AS BIGINT) AS s_{t}, CAST(sum(CASE WHEN event_type = '{t}' THEN q END) AS BIGINT) AS q_{t}" for t in EVENT_TYPES)},
                CAST(sum(m) AS BIGINT) AS nn
              FROM g
            ),
            v AS (
              SELECT *,
                {", ".join(f"CAST(m_{t} * q_{t} - s_{t} * s_{t} AS DOUBLE) / CAST(m_{t} * (m_{t} - 1) AS DOUBLE) AS var_{t}" for t in EVENT_TYPES)}
              FROM wide
            ),
            e AS (
              SELECT *,
                {" + ".join(f"CAST(m_{t} - 1 AS DOUBLE) * var_{t}" for t in EVENT_TYPES)} AS pooled_num,
                {" + ".join(f"CAST(m_{t} - 1 AS DOUBLE) * ln(var_{t})" for t in EVENT_TYPES)} AS lnsum,
                {" + ".join(f"1.0 / CAST(m_{t} - 1 AS DOUBLE)" for t in EVENT_TYPES)} AS invsum
              FROM v
            )
            SELECT CAST(5 AS INT) AS k_groups, nn AS n_days,
              pooled_num / CAST(nn - 5 AS DOUBLE) AS pooled_var,
              (CAST(nn - 5 AS DOUBLE)
                  * ln(pooled_num / CAST(nn - 5 AS DOUBLE)) - lnsum)
                / (1.0 + (invsum - 1.0 / CAST(nn - 5 AS DOUBLE))
                    / 12.0) AS bartlett_chi2
            FROM e
        """,
        "q404_stl_lite": """
            WITH daily AS (
              SELECT event_type,
                CAST(date_trunc('day', ts) AS DATE) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            ma AS (
              SELECT event_type, d, n,
                CAST(sum(n) OVER (PARTITION BY event_type ORDER BY d
                  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                  AS BIGINT) AS s7,
                CAST(count(*) OVER (PARTITION BY event_type ORDER BY d
                  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                  AS BIGINT) AS c7
              FROM daily
            ),
            det AS (
              SELECT event_type, d, n, s7,
                CAST(7 * n - s7 AS BIGINT) AS dnum,
                CAST(dayofweek(d) + 1 AS INT) AS dow
              FROM ma WHERE c7 = 7
            ),
            seas AS (
              SELECT event_type, dow,
                CAST(sum(dnum) AS BIGINT) AS sd_num,
                CAST(count(*) AS BIGINT) AS m
              FROM det GROUP BY 1, 2
            )
            SELECT det.event_type, det.d, det.n,
              CAST(s7 AS DOUBLE) / 7.0 AS trend,
              CAST(sd_num AS DOUBLE) / CAST(7 * m AS DOUBLE)
                AS seasonal,
              (CAST(n AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0)
                - CAST(sd_num AS DOUBLE) / CAST(7 * m AS DOUBLE)
                AS remainder
            FROM det JOIN seas USING (event_type, dow)
        """,
        "q405_streak_days": """
            WITH daily AS (
              SELECT event_type,
                CAST(date_trunc('day', ts) AS DATE) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            meds AS (
              SELECT event_type,
                percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS med
              FROM daily GROUP BY event_type
            ),
            idx AS (
              SELECT d.event_type, d.d, d.n,
                CAST(row_number() OVER (
                  PARTITION BY d.event_type ORDER BY d.d)
                  AS BIGINT) AS i,
                d.n > m.med AS hot
              FROM daily d JOIN meds m USING (event_type)
            ),
            isl AS (
              SELECT event_type, d,
                i - CAST(row_number() OVER (
                  PARTITION BY event_type ORDER BY d) AS BIGINT)
                  AS grp
              FROM idx WHERE hot
            ),
            runs AS (
              SELECT event_type, grp,
                CAST(count(*) AS BIGINT) AS streak_len,
                min(d) AS streak_start
              FROM isl GROUP BY 1, 2
            )
            SELECT event_type, streak_len, streak_start FROM (
              SELECT *, row_number() OVER (
                PARTITION BY event_type
                ORDER BY streak_len DESC, streak_start ASC) AS rk
              FROM runs
            ) WHERE rk = 1
        """,
        "q406_ar1_fit": """
            WITH daily AS (
              SELECT event_type,
                CAST(date_trunc('day', ts) AS DATE) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            lagged AS (
              SELECT event_type, n AS y,
                lag(n) OVER (PARTITION BY event_type ORDER BY d) AS x
              FROM daily
            ),
            agg AS (
              SELECT event_type,
                CAST(count(*) AS BIGINT) AS m,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sx2,
                CAST(sum(y * y) AS BIGINT) AS sy2
              FROM lagged WHERE x IS NOT NULL GROUP BY event_type
            ),
            hat AS (
              SELECT event_type, m, sx, sy,
                CAST(m * sx2 - sx * sx AS HUGEINT) AS hxx,
                CAST(m * sy2 - sy * sy AS HUGEINT) AS hyy,
                CAST(m * sxy - sx * sy AS HUGEINT) AS hxy
              FROM agg
            )
            SELECT event_type, m AS n_obs,
              CAST(hxy AS DOUBLE) / CAST(hxx AS DOUBLE) AS phi,
              (CAST(sy AS DOUBLE)
                - CAST(hxy AS DOUBLE) / CAST(hxx AS DOUBLE)
                  * CAST(sx AS DOUBLE)) / CAST(m AS DOUBLE)
                AS intercept,
              CAST(hxy * hxy AS DOUBLE)
                / CAST(hxx * hyy AS DOUBLE) AS r2
            FROM hat
        """,
        "q407_mase": """
            WITH daily AS (
              SELECT event_type,
                CAST(date_trunc('day', ts) AS DATE) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            lagged AS (
              SELECT event_type, n,
                lag(n, 1) OVER (PARTITION BY event_type ORDER BY d)
                  AS l1,
                lag(n, 7) OVER (PARTITION BY event_type ORDER BY d)
                  AS l7
              FROM daily
            ),
            agg AS (
              SELECT event_type,
                CAST(sum(CASE WHEN l1 IS NOT NULL
                  THEN abs(n - l1) END) AS BIGINT) AS a1,
                CAST(sum(CASE WHEN l1 IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS m1,
                CAST(sum(CASE WHEN l7 IS NOT NULL
                  THEN abs(n - l7) END) AS BIGINT) AS a7,
                CAST(sum(CASE WHEN l7 IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS m7
              FROM lagged GROUP BY event_type
            )
            SELECT event_type, m7 AS n_seasonal_errors,
              CAST(a1 AS DOUBLE) / CAST(m1 AS DOUBLE) AS mae_naive1,
              CAST(a7 AS DOUBLE) / CAST(m7 AS DOUBLE) AS mae_naive7,
              (CAST(a7 AS DOUBLE) / CAST(m7 AS DOUBLE))
                / (CAST(a1 AS DOUBLE) / CAST(m1 AS DOUBLE)) AS mase
            FROM agg
        """,
        "q408_winsorized_mean": """
            WITH daily AS (
              SELECT event_type,
                CAST(date_trunc('day', ts) AS DATE) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            bounds AS (
              SELECT event_type,
                percentile_disc(0.1) WITHIN GROUP (ORDER BY n) AS p10,
                percentile_disc(0.9) WITHIN GROUP (ORDER BY n) AS p90
              FROM daily GROUP BY event_type
            ),
            j AS (
              SELECT d.event_type, d.n, b.p10, b.p90,
                greatest(b.p10, least(b.p90, d.n)) AS clipped,
                d.n >= b.p10 AND d.n <= b.p90 AS inside
              FROM daily d JOIN bounds b USING (event_type)
            ),
            agg AS (
              SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_days,
                CAST(max(p10) AS BIGINT) AS p10,
                CAST(max(p90) AS BIGINT) AS p90,
                CAST(sum(clipped) AS BIGINT) AS wsum,
                CAST(sum(CASE WHEN inside THEN n END) AS BIGINT)
                  AS tsum,
                CAST(sum(CASE WHEN inside THEN 1 ELSE 0 END)
                  AS BIGINT) AS tm
              FROM j GROUP BY event_type
            )
            SELECT event_type, n_days, p10, p90,
              CAST(wsum AS DOUBLE) / CAST(n_days AS DOUBLE)
                AS winsorized_mean,
              CAST(tsum AS DOUBLE) / CAST(tm AS DOUBLE)
                AS trimmed_mean,
              tm AS n_kept
            FROM agg
        """,
        "q409_wilson_interval": """
            WITH agg AS (
              SELECT event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN value IS NOT NULL THEN 1 ELSE 0
                  END) AS BIGINT) AS s
              FROM events GROUP BY event_type
            ),
            e AS (
              SELECT event_type, n,
                CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE) AS denom,
                CAST(n AS DOUBLE) AS nd
              FROM agg
            ),
            f AS (
              SELECT event_type, n, p,
                (p + (1.96 * 1.96) / (2 * nd)) / denom AS center,
                1.96 * sqrt(p * (1.0 - p) / nd
                  + (1.96 * 1.96) / (4 * nd * nd)) / denom AS half
              FROM e
            )
            SELECT event_type, n AS n_events, p AS p_hat,
              center - half AS wilson_lo,
              center + half AS wilson_hi
            FROM f
        """,
        "q410_readability": r"""
            WITH per_doc AS (
              SELECT source,
                CAST(len(list_filter(
                  string_split_regex(trim(text), '\s+'),
                  x -> x <> '')) AS BIGINT) AS w,
                CAST(len(regexp_extract_all(text, '[.!?]'))
                  AS BIGINT) AS sent,
                CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+'))
                  AS BIGINT) AS vg
              FROM documents
            ),
            agg AS (
              SELECT source,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(w) AS BIGINT) AS words,
                CAST(sum(sent) AS BIGINT) AS sentences,
                CAST(sum(vg) AS BIGINT) AS vowel_groups
              FROM per_doc GROUP BY source
            )
            SELECT source, n_docs, words, sentences,
              CASE WHEN sentences > 0 THEN
                CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE)
              END AS words_per_sentence,
              CASE WHEN words > 0 THEN
                CAST(vowel_groups AS DOUBLE) / CAST(words AS DOUBLE)
              END AS syllables_per_word,
              206.835
                - 1.015 * (CASE WHEN sentences > 0 THEN
                    CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE)
                  END)
                - 84.6 * (CASE WHEN words > 0 THEN
                    CAST(vowel_groups AS DOUBLE) / CAST(words AS DOUBLE)
                  END) AS flesch_score
            FROM agg
        """,
        "q411_contamination": r"""
            WITH toks AS (
              SELECT source,
                list_filter(string_split_regex(trim(text), '\s+'),
                  x -> x <> '') AS tk
              FROM documents
            ),
            sh AS (
              SELECT source,
                unnest(list_transform(range(1, len(tk) - 3),
                  i -> array_to_string(list_slice(tk, i, i + 4), ' ')))
                  AS shingle
              FROM toks WHERE len(tk) >= 5
            ),
            ss AS (SELECT DISTINCT source, shingle FROM sh),
            pairs AS (
              SELECT a.source AS source_a, b.source AS source_b,
                CAST(count(*) AS BIGINT) AS shared_shingles
              FROM ss a JOIN ss b
                ON a.shingle = b.shingle AND a.source < b.source
              GROUP BY 1, 2
            )
            SELECT source_a, source_b, shared_shingles FROM pairs
            ORDER BY shared_shingles DESC, source_a ASC, source_b ASC
            LIMIT 20
        """,
        "q412_heaps_law": r"""
            WITH toks AS (
              SELECT CAST(doc_id AS BIGINT) AS did,
                list_filter(string_split_regex(trim(text), '\s+'),
                  x -> x <> '') AS tk
              FROM documents
            ),
            occ AS (
              SELECT did, CAST(len(tk) AS BIGINT) AS wt,
                'occ' AS kind
              FROM toks
            ),
            voc AS (
              SELECT CAST(min(did) AS BIGINT) AS did,
                CAST(1 AS BIGINT) AS wt, 'voc' AS kind
              FROM (SELECT did, unnest(tk) AS t FROM toks)
              GROUP BY t
            ),
            u AS (
              SELECT * FROM occ UNION ALL SELECT * FROM voc
            ),
            w AS (
              SELECT kind, wt, did, max(did) OVER () AS md FROM u
            ),
            wide AS (
              SELECT CAST(max(md) AS BIGINT) AS maxd,
                """ + ", ".join(
                    f"CAST(sum(CASE WHEN kind = '{k}' AND 10 * did <= {p} * md THEN wt ELSE 0 END) AS BIGINT) AS {k[0]}{p}"
                    for p in range(1, 11)
                    for k in ("voc", "occ")
                ) + """
              FROM w
            )
            """ + " UNION ALL ".join(
                f"SELECT CAST({p * 10} AS INT) AS pct_docs, o{p} AS tokens_seen, v{p} AS vocab_size FROM wide"
                for p in range(1, 11)
            ) + """
        """,
        "q413_ngram_novelty": r"""
            WITH toks AS (
              SELECT source,
                list_filter(string_split_regex(trim(text), '\s+'),
                  x -> x <> '') AS tk
              FROM documents
            ),
            sh AS (
              SELECT source,
                unnest(list_transform(range(1, len(tk) - 1),
                  i -> array_to_string(list_slice(tk, i, i + 2), ' ')))
                  AS shingle
              FROM toks WHERE len(tk) >= 3
            ),
            pc AS (
              SELECT source, shingle, CAST(count(*) AS BIGINT) AS c
              FROM sh GROUP BY 1, 2
            ),
            fl AS (
              SELECT source, c,
                CAST(sum(c) OVER (PARTITION BY shingle) AS BIGINT)
                  AS g
              FROM pc
            ),
            agg AS (
              SELECT source,
                CAST(sum(c) AS BIGINT) AS n_shingles,
                CAST(sum(CASE WHEN g = 1 THEN c ELSE 0 END)
                  AS BIGINT) AS n_hapax
              FROM fl GROUP BY source
            )
            SELECT source, n_shingles, n_hapax,
              CAST(n_hapax AS DOUBLE) / CAST(n_shingles AS DOUBLE)
                AS novelty
            FROM agg
        """,
        "q414_hour_chisq": """
            WITH cells AS (
              SELECT event_type, CAST(hour(ts) AS INT) AS hod,
                CAST(count(*) AS BIGINT) AS o
              FROM events GROUP BY 1, 2
            ),
            m AS (
              SELECT event_type, hod, o,
                CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT)
                  AS nt,
                CAST(sum(o) OVER (PARTITION BY hod) AS BIGINT) AS gh,
                CAST(sum(o) OVER () AS BIGINT) AS gg
              FROM cells
            )
            SELECT event_type, hod, o AS observed,
              CAST(nt * gh AS DOUBLE) / CAST(gg AS DOUBLE)
                AS expected,
              CAST(CAST(o * gg - nt * gh AS HUGEINT)
                  * CAST(o * gg - nt * gh AS HUGEINT) AS DOUBLE)
                / CAST(CAST(gg AS HUGEINT)
                  * CAST(nt * gh AS HUGEINT) AS DOUBLE)
                AS chi2_contrib
            FROM m
        """,
        "q415_zipf_fit": r"""
            WITH tok AS (
              SELECT unnest(list_filter(
                string_split_regex(trim(text), '\s+'),
                x -> x <> '')) AS t
              FROM documents
            ),
            tc AS (
              SELECT t, CAST(count(*) AS BIGINT) AS c
              FROM tok GROUP BY t
            ),
            top AS (
              SELECT c, rk FROM (
                SELECT c, CAST(row_number() OVER (
                  ORDER BY c DESC, t ASC) AS BIGINT) AS rk
                FROM tc
              ) WHERE rk <= 50
            ),
            mom AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                list_reduce(list(ln(CAST(rk AS DOUBLE))
                  ORDER BY rk), (a, b) -> a + b) AS sx,
                list_reduce(list(ln(CAST(c AS DOUBLE))
                  ORDER BY rk), (a, b) -> a + b) AS sy,
                list_reduce(list(ln(CAST(rk AS DOUBLE))
                  * ln(CAST(c AS DOUBLE))
                  ORDER BY rk), (a, b) -> a + b) AS sxy,
                list_reduce(list(ln(CAST(rk AS DOUBLE))
                  * ln(CAST(rk AS DOUBLE))
                  ORDER BY rk), (a, b) -> a + b) AS sx2
              FROM top
            )
            SELECT n AS n_ranks,
              (CAST(n AS DOUBLE) * sxy - sx * sy)
                / (CAST(n AS DOUBLE) * sx2 - sx * sx) AS zipf_slope,
              (sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                  / (CAST(n AS DOUBLE) * sx2 - sx * sx) * sx)
                / CAST(n AS DOUBLE) AS zipf_intercept
            FROM mom
        """,
        "q416_audience_overlap": """
            WITH ut AS (
              SELECT DISTINCT event_type, user_id FROM events
            ),
            deg AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS d
              FROM ut GROUP BY 1
            ),
            pairs AS (
              SELECT a.event_type AS type_a, b.event_type AS type_b,
                CAST(count(*) AS BIGINT) AS common_users
              FROM ut a JOIN ut b
                ON a.user_id = b.user_id
                AND a.event_type < b.event_type
              GROUP BY 1, 2
            )
            SELECT p.type_a, p.type_b, p.common_users,
              CAST(p.common_users AS DOUBLE)
                / CAST(da.d + db.d - p.common_users AS DOUBLE)
                AS jaccard
            FROM pairs p
            JOIN deg da ON da.event_type = p.type_a
            JOIN deg db ON db.event_type = p.type_b
        """,
        "q417_slew_alarm": """
            WITH base AS (
              SELECT event_type, user_id, event_id,
                epoch_us(ts) AS t,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS v
              FROM events WHERE value IS NOT NULL
            ),
            lagged AS (
              SELECT event_type,
                v - lag(v) OVER w AS dv,
                t - lag(t) OVER w AS dt
              FROM base
              WINDOW w AS (
                PARTITION BY event_type, user_id
                ORDER BY t, event_id)
            ),
            agg AS (
              SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(CASE WHEN abs(dv) * 1000000 > 5000 * dt
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
              FROM lagged WHERE dv IS NOT NULL GROUP BY event_type
            )
            SELECT event_type, n_pairs, n_violations,
              CAST(n_violations AS DOUBLE) / CAST(n_pairs AS DOUBLE)
                AS violation_rate
            FROM agg
        """,
        "q418_twa": """
            WITH base AS (
              SELECT event_type, event_id, epoch_us(ts) AS t,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS v
              FROM events WHERE value IS NOT NULL
            ),
            paired AS (
              SELECT event_type, t, v,
                lead(v) OVER w AS vn,
                lead(t) OVER w AS tn
              FROM base
              WINDOW w AS (PARTITION BY event_type ORDER BY t, event_id)
            ),
            agg AS (
              SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_points,
                sum(CAST((v + vn) * (tn - t) AS HUGEINT)) AS num,
                CAST(max(t) - min(t) AS BIGINT) AS span
              FROM paired GROUP BY event_type
            )
            SELECT event_type, n_points,
              CAST(num AS DOUBLE) / CAST(2 * span * 100 AS DOUBLE)
                AS twa_value
            FROM agg
        """,
        "q419_gap_audit": """
            WITH base AS (
              SELECT event_type, event_id, epoch_us(ts) AS t
              FROM events
            ),
            gaps AS (
              SELECT event_type,
                t - lag(t) OVER (
                  PARTITION BY event_type ORDER BY t, event_id)
                  AS gap
              FROM base
            ),
            g2 AS (SELECT * FROM gaps WHERE gap IS NOT NULL),
            meds AS (
              SELECT event_type,
                CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap)
                  AS BIGINT) AS med
              FROM g2 GROUP BY event_type
            )
            SELECT g.event_type,
              CAST(count(*) AS BIGINT) AS n_gaps,
              CAST(max(m.med) AS BIGINT) AS med_gap_us,
              CAST(sum(CASE WHEN g.gap > 2 * m.med THEN 1 ELSE 0 END)
                AS BIGINT) AS n_long,
              CAST(sum(CASE WHEN g.gap > 2 * m.med THEN g.gap
                ELSE 0 END) AS BIGINT) AS downtime_us
            FROM g2 g JOIN meds m USING (event_type)
            GROUP BY g.event_type
        """,
        "q420_availability": """
            WITH b AS (
              SELECT DISTINCT event_type,
                epoch_us(ts) // 1800000000 AS bucket
              FROM events
            ),
            agg AS (
              SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_buckets
              FROM b GROUP BY event_type
            )
            SELECT event_type, n_buckets,
              CAST(n_buckets AS DOUBLE) / 1440.0 AS availability
            FROM agg
        """,
        "q421_calibration_bins": f"""
            WITH base AS (
              SELECT
                {" + ".join(f"(CASE WHEN substring(md5('cal' || CAST(event_id AS VARCHAR)), 1, 8) > '{_thr(k / 10)}' THEN 1 ELSE 0 END)" for k in range(1, 10))}
                  AS bin,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                  AS y
              FROM events
            ),
            agg AS (
              SELECT bin, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(y) AS BIGINT) AS n_pos
              FROM base GROUP BY bin
            )
            SELECT CAST(bin AS INT) AS bin, n_events, n_pos,
              (CAST(bin AS DOUBLE) + 0.5) / 10.0 AS bin_mid,
              CAST(n_pos AS DOUBLE) / CAST(n_events AS DOUBLE)
                AS obs_rate
            FROM agg
        """,
        "q422_auc": """
            WITH base AS (
              SELECT
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS v,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                  AS y
              FROM events WHERE value IS NOT NULL
            ),
            ranked AS (
              SELECT y,
                CAST(2 * rank() OVER (ORDER BY v)
                  + count(*) OVER (PARTITION BY v) - 1 AS BIGINT)
                  AS r2
              FROM base
            ),
            agg AS (
              SELECT CAST(sum(y) AS BIGINT) AS np,
                CAST(sum(1 - y) AS BIGINT) AS nn,
                CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END)
                  AS BIGINT) AS sr2p
              FROM ranked
            )
            SELECT np AS n_pos, nn AS n_neg,
              CAST(sr2p - np * (np + 1) AS DOUBLE)
                / CAST(2 * np * nn AS DOUBLE) AS auc
            FROM agg
        """,
        "q423_gains_table": """
            WITH base AS (
              SELECT event_id,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS v,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                  AS y
              FROM events WHERE value IS NOT NULL
            ),
            cut AS (
              SELECT y, ntot,
                CAST(rn10 // ntot AS INT) AS decile
              FROM (
                SELECT y,
                  (CAST(row_number() OVER (
                    ORDER BY v DESC, event_id ASC) AS BIGINT) - 1)
                    * 10 AS rn10,
                  CAST(count(*) OVER () AS BIGINT) AS ntot
                FROM base
              )
            ),
            per AS (
              SELECT decile,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(y) AS BIGINT) AS n_pos,
                CAST(max(ntot) AS BIGINT) AS ntot
              FROM cut GROUP BY decile
            ),
            cum AS (
              SELECT decile, n_events, n_pos, ntot,
                CAST(sum(n_events) OVER (ORDER BY decile
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
                CAST(sum(n_pos) OVER (ORDER BY decile
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
                CAST(sum(n_pos) OVER () AS BIGINT) AS ptot
              FROM per
            )
            SELECT decile, n_events, n_pos, cum_pos,
              CAST(cum_pos * ntot AS DOUBLE)
                / CAST(cum_n * ptot AS DOUBLE) AS cum_lift
            FROM cum
        """,
        "q424_seasonal_mk": """
            WITH daily AS (
              SELECT event_type,
                CAST(date_trunc('day', ts) AS DATE) AS d,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            strat AS (
              SELECT event_type,
                CAST(dayofweek(d) + 1 AS INT) AS dow, d, n
              FROM daily
            ),
            pairs AS (
              SELECT a.event_type AS event_type,
                CAST(sign(CAST(b.n - a.n AS DOUBLE)) AS BIGINT)
                  AS sgn
              FROM strat a JOIN strat b
                ON a.event_type = b.event_type
                AND a.dow = b.dow AND a.d < b.d
            ),
            s_stat AS (
              SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s
              FROM pairs GROUP BY event_type
            ),
            ties AS (
              SELECT event_type, dow, n,
                CAST(count(*) AS BIGINT) AS t
              FROM strat GROUP BY 1, 2, 3
            ),
            per_stratum AS (
              SELECT event_type, dow,
                CAST(sum(t) AS BIGINT) AS m,
                CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                  AS tie_term
              FROM ties GROUP BY 1, 2
            ),
            var_num AS (
              SELECT event_type,
                CAST(sum(m * (m - 1) * (2 * m + 5) - tie_term)
                  AS BIGINT) AS var_num
              FROM per_stratum GROUP BY event_type
            )
            SELECT s.event_type, s.s AS s_stat, v.var_num,
              CASE WHEN v.var_num > 0 THEN
                CAST(CASE WHEN s.s > 0 THEN s.s - 1
                          WHEN s.s < 0 THEN s.s + 1
                          ELSE 0 END AS DOUBLE)
                  / sqrt(CAST(v.var_num AS DOUBLE) / 18.0)
              END AS z_stat
            FROM s_stat s JOIN var_num v USING (event_type)
        """,
        "q425_partial_corr": """
            WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                event_type, CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            wide AS (
              SELECT d,
                max(CASE WHEN event_type = 'click' THEN n END) AS x,
                max(CASE WHEN event_type = 'purchase' THEN n END)
                  AS y,
                max(CASE WHEN event_type = 'view' THEN n END) AS z
              FROM daily GROUP BY d
            ),
            f AS (
              SELECT * FROM wide
              WHERE x IS NOT NULL AND y IS NOT NULL
                AND z IS NOT NULL
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS m,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(z) AS BIGINT) AS sz,
                CAST(sum(x * x) AS BIGINT) AS sxx,
                CAST(sum(y * y) AS BIGINT) AS syy,
                CAST(sum(z * z) AS BIGINT) AS szz,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * z) AS BIGINT) AS sxz,
                CAST(sum(y * z) AS BIGINT) AS syz
              FROM f
            ),
            hat AS (
              SELECT m,
                CAST(m * sxy - sx * sy AS HUGEINT) AS hxy,
                CAST(m * sxz - sx * sz AS HUGEINT) AS hxz,
                CAST(m * syz - sy * sz AS HUGEINT) AS hyz,
                CAST(m * sxx - sx * sx AS HUGEINT) AS hxx,
                CAST(m * syy - sy * sy AS HUGEINT) AS hyy,
                CAST(m * szz - sz * sz AS HUGEINT) AS hzz
              FROM agg
            ),
            r AS (
              SELECT m,
                CAST(hxy AS DOUBLE) / (sqrt(CAST(hxx AS DOUBLE))
                  * sqrt(CAST(hyy AS DOUBLE))) AS rxy,
                CAST(hxz AS DOUBLE) / (sqrt(CAST(hxx AS DOUBLE))
                  * sqrt(CAST(hzz AS DOUBLE))) AS rxz,
                CAST(hyz AS DOUBLE) / (sqrt(CAST(hyy AS DOUBLE))
                  * sqrt(CAST(hzz AS DOUBLE))) AS ryz
              FROM hat
            )
            SELECT m AS n_days, rxy AS r_xy,
              (rxy - rxz * ryz)
                / (sqrt(1.0 - rxz * rxz)
                  * sqrt(1.0 - ryz * ryz)) AS r_xy_given_z
            FROM r
        """,
        "q143_swinging_door": """
            WITH RECURSIVE base AS (
              SELECT user_id,
                list(ts ORDER BY ts, value) AS tsl,
                list(CAST(epoch_ns(ts) AS DOUBLE) / 1e9 ORDER BY ts, value) AS tl,
                list(value ORDER BY ts, value) AS vl,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY user_id
            ),
            rec AS (
              SELECT user_id, tsl, tl, vl, n,
                CAST(1 AS BIGINT) AS i, CAST(1 AS BIGINT) AS a,
                CAST(1 AS BIGINT) AS prev,
                CAST('-infinity' AS DOUBLE) AS lo,
                CAST('infinity' AS DOUBLE) AS hi,
                [CAST(1 AS BIGINT)] AS kept
              FROM base WHERE n > 0
              UNION ALL
              SELECT r.user_id, r.tsl, r.tl, r.vl, r.n,
                r.i + 1,
                CASE WHEN t.dt <= 0 THEN
                       CASE WHEN abs(t.v - t.va) > 10.0 THEN r.prev ELSE r.a END
                     WHEN t.lo1 > t.hi1 THEN r.prev
                     ELSE r.a END,
                r.i + 1,
                CASE WHEN t.dt <= 0 THEN
                       CASE WHEN abs(t.v - t.va) > 10.0
                            THEN CAST('-infinity' AS DOUBLE) ELSE r.lo END
                     WHEN t.lo1 > t.hi1 THEN
                       CASE WHEN t.dt2 > 0
                            THEN (t.v - 10.0 - t.vprev) / t.dt2
                            ELSE CAST('-infinity' AS DOUBLE) END
                     ELSE t.lo1 END,
                CASE WHEN t.dt <= 0 THEN
                       CASE WHEN abs(t.v - t.va) > 10.0
                            THEN CAST('infinity' AS DOUBLE) ELSE r.hi END
                     WHEN t.lo1 > t.hi1 THEN
                       CASE WHEN t.dt2 > 0
                            THEN (t.v + 10.0 - t.vprev) / t.dt2
                            ELSE CAST('infinity' AS DOUBLE) END
                     ELSE t.hi1 END,
                CASE WHEN (t.dt <= 0 AND abs(t.v - t.va) > 10.0)
                       OR (t.dt > 0 AND t.lo1 > t.hi1)
                     THEN list_append(r.kept, r.prev) ELSE r.kept END
              FROM rec r,
              LATERAL (
                SELECT
                  r.vl[CAST(r.i AS INT) + 1] AS v,
                  r.vl[CAST(r.a AS INT)] AS va,
                  r.vl[CAST(r.prev AS INT)] AS vprev,
                  r.tl[CAST(r.i AS INT) + 1] - r.tl[CAST(r.a AS INT)] AS dt,
                  r.tl[CAST(r.i AS INT) + 1] - r.tl[CAST(r.prev AS INT)] AS dt2,
                  greatest(r.lo, (r.vl[CAST(r.i AS INT) + 1] - 10.0
                                  - r.vl[CAST(r.a AS INT)])
                    / (r.tl[CAST(r.i AS INT) + 1] - r.tl[CAST(r.a AS INT)])) AS lo1,
                  least(r.hi, (r.vl[CAST(r.i AS INT) + 1] + 10.0
                               - r.vl[CAST(r.a AS INT)])
                    / (r.tl[CAST(r.i AS INT) + 1] - r.tl[CAST(r.a AS INT)])) AS hi1
              ) t
              WHERE r.i < r.n
            ),
            fin AS (
              SELECT user_id, tsl, vl,
                list_distinct(list_append(kept, n)) AS kept
              FROM rec WHERE i = n
            )
            SELECT user_id, tsl[CAST(k AS INT)] AS ts, vl[CAST(k AS INT)] AS value
            FROM fin, unnest(kept) AS u(k)
        """,
        "q124_dtw_pairs": """
            WITH RECURSIVE series AS (
              SELECT event_type AS k,
                list(v ORDER BY bucket) AS vs,
                CAST(len(list(v ORDER BY bucket)) AS BIGINT) AS n
              FROM (
                SELECT event_type,
                  time_bucket(INTERVAL 30 MINUTE, ts) AS bucket,
                  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                    / count(value) AS v
                FROM events GROUP BY 1, 2
              ) GROUP BY event_type
            ),
            pairs AS (
              SELECT a.k AS key_a, b.k AS key_b,
                a.vs AS va, b.vs AS vb, a.n AS na, b.n AS nb,
                greatest(48, abs(a.n - b.n)) AS w
              FROM series a JOIN series b ON a.k < b.k
            ),
            -- the banded DP advances ONE row of the cost matrix per
            -- recursive step; the within-row left-to-right dependency
            -- (cur[j-1]) is a list_reduce fold seeded with an empty
            -- DOUBLE[] — the same cell-evaluation order as the numpy
            -- kernel in operators/dtw.py:_dtw_kernel
            dp AS (
              SELECT key_a, key_b, va, vb, na, nb, w,
                CAST(0 AS BIGINT) AS i,
                list_concat([CAST(0 AS DOUBLE)],
                  list_transform(range(CAST(nb AS INT)),
                    x -> CAST('infinity' AS DOUBLE))) AS prev
              FROM pairs
              UNION ALL
              SELECT d.key_a, d.key_b, d.va, d.vb, d.na, d.nb, d.w,
                d.i + 1,
                CASE WHEN t.lo > t.hi THEN d.prev
                ELSE
                  list_concat(list_concat(
                    list_transform(range(CAST(t.lo AS INT)),
                      x -> CAST('infinity' AS DOUBLE)),
                    list_reduce(
                      list_concat(
                        [CAST([] AS DOUBLE[])],
                        list_transform(
                          range(CAST(t.lo AS INT),
                                CAST(t.hi AS INT) + 1),
                          j -> [CAST(j AS DOUBLE)])),
                      (acc, jl) -> list_append(acc,
                        abs(t.ai - d.vb[CAST(jl[1] AS INT)])
                        + least(
                            d.prev[CAST(jl[1] AS INT) + 1],
                            CASE WHEN len(acc) = 0
                                 THEN CAST('infinity' AS DOUBLE)
                                 ELSE acc[len(acc)] END,
                            d.prev[CAST(jl[1] AS INT)])))),
                    list_transform(range(CAST(d.nb - t.hi AS INT)),
                      x -> CAST('infinity' AS DOUBLE)))
                END
              FROM dp d,
              LATERAL (
                SELECT greatest(1, d.i + 1 - d.w) AS lo,
                  least(d.nb, d.i + 1 + d.w) AS hi,
                  d.va[CAST(d.i AS INT) + 1] AS ai
              ) t
              WHERE d.i < d.na
            )
            SELECT key_a, key_b, CAST(na AS INT) AS n_a,
              CAST(nb AS INT) AS n_b,
              prev[CAST(nb AS INT) + 1] AS dtw
            FROM dp WHERE i = na
        """,
        # Replicates ml/models.py:holt bit-for-bit: the smoothing
        # recursion advances one observation per recursive step with
        # the SAME IEEE op order as the Python loop, and sigma is the
        # same sequential two-pass fold (models.py deliberately avoids
        # np.std's private pairwise accumulation for exactly this).
        "q24_holt_forecast": """
            WITH RECURSIVE daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day,
                CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                  / count(value) AS v
              FROM events GROUP BY 1, 2
            ),
            series AS (
              SELECT user_id, list(v ORDER BY day) AS xs,
                CAST(len(list(v ORDER BY day)) AS BIGINT) AS n
              FROM daily GROUP BY user_id
            ),
            init AS (
              SELECT user_id, xs, n, CAST(1 AS BIGINT) AS i,
                xs[1] AS level, xs[2] - xs[1] AS trend,
                CAST([] AS DOUBLE[]) AS resid
              FROM series WHERE n >= 3
            ),
            rec AS (
              SELECT * FROM init
              UNION ALL
              SELECT r.user_id, r.xs, r.n, r.i + 1,
                t.nl,
                0.1 * (t.nl - r.level) + 0.9 * r.trend,
                list_append(r.resid, t.v - (r.level + r.trend))
              FROM rec r,
              LATERAL (
                SELECT r.xs[CAST(r.i AS INT) + 1] AS v,
                  0.3 * r.xs[CAST(r.i AS INT) + 1]
                    + 0.7 * (r.level + r.trend) AS nl
              ) t
              WHERE r.i < r.n
            ),
            fin AS (
              SELECT user_id, level, trend, resid,
                list_reduce(resid, (a, b) -> a + b) / len(resid) AS m
              FROM rec WHERE i = n
            ),
            sig AS (
              SELECT user_id, level, trend,
                sqrt(list_reduce(
                  list_transform(resid, r -> (r - m) * (r - m)),
                  (a, b) -> a + b) / len(resid)) AS sigma
              FROM fin
            ),
            steps AS (SELECT unnest(range(1, 8)) AS k)
            SELECT user_id, CAST(k AS INT) AS step,
              level + CAST(k AS DOUBLE) * trend AS forecast,
              (level + CAST(k AS DOUBLE) * trend)
                - 1.96 * (sigma * sqrt(CAST(k AS DOUBLE))) AS lo,
              (level + CAST(k AS DOUBLE) * trend)
                + 1.96 * (sigma * sqrt(CAST(k AS DOUBLE))) AS hi
            FROM sig, steps
        """,
        # Replicates ml/models.py:holt_winters bit-for-bit (level +
        # trend + 7-day additive seasonal): init means are the same
        # 7-element sequential sums, each recursive step applies the
        # identical update order (resid uses the PRIOR state), and the
        # seasonal slot update is a list splice. Verified exact at
        # sf0.001/0.01.
        "q300_holt_winters": """
            WITH RECURSIVE daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                CAST(count(*) AS DOUBLE) AS v
              FROM events GROUP BY 1, 2
            ),
            series AS (
              SELECT event_type, list(v ORDER BY d) AS xs,
                CAST(len(list(v ORDER BY d)) AS BIGINT) AS n
              FROM daily GROUP BY event_type
            ),
            init AS (
              SELECT event_type, xs, n,
                ((((((xs[1]+xs[2])+xs[3])+xs[4])+xs[5])+xs[6])+xs[7])
                  / 7.0 AS level0
              FROM series WHERE n >= 14
            ),
            init2 AS (
              SELECT event_type, xs, n, level0,
                (((((((xs[8]+xs[9])+xs[10])+xs[11])+xs[12])+xs[13])
                   +xs[14]) / 7.0 - level0) / 7.0 AS trend0,
                list_transform(xs[1:7], v -> v - level0) AS season0
              FROM init
            ),
            rec AS (
              SELECT event_type, xs, n, CAST(7 AS BIGINT) AS i,
                level0 AS level, trend0 AS trend, season0 AS season,
                CAST([] AS DOUBLE[]) AS resid
              FROM init2
              UNION ALL
              SELECT r.event_type, r.xs, r.n, r.i + 1,
                t.nl,
                0.1 * (t.nl - r.level) + 0.9 * r.trend,
                list_concat(list_concat(
                  r.season[1:CAST(r.i % 7 AS INT)],
                  [0.2 * (t.v - t.nl) + 0.8 * t.s]),
                  r.season[CAST(r.i % 7 AS INT) + 2:7]),
                list_append(r.resid,
                  t.v - ((r.level + r.trend) + t.s))
              FROM rec r,
              LATERAL (
                SELECT r.xs[CAST(r.i AS INT) + 1] AS v,
                  r.season[CAST(r.i % 7 AS INT) + 1] AS s,
                  0.3 * (r.xs[CAST(r.i AS INT) + 1]
                         - r.season[CAST(r.i % 7 AS INT) + 1])
                    + 0.7 * (r.level + r.trend) AS nl
              ) t
              WHERE r.i < r.n
            ),
            fin AS (
              SELECT event_type, n, level, trend, season, resid,
                list_reduce(resid, (a, b) -> a + b) / len(resid) AS m
              FROM rec WHERE i = n
            ),
            sig AS (
              SELECT event_type, n, level, trend, season,
                sqrt(list_reduce(
                  list_transform(resid, r -> (r - m) * (r - m)),
                  (a, b) -> a + b) / len(resid)) AS sigma
              FROM fin
            ),
            steps AS (SELECT unnest(range(1, 8)) AS k)
            SELECT s.event_type, CAST(k AS INT) AS step,
              (s.level + CAST(k AS DOUBLE) * s.trend)
                + s.season[CAST((s.n + k - 1) % 7 AS INT) + 1]
                AS forecast,
              ((s.level + CAST(k AS DOUBLE) * s.trend)
                + s.season[CAST((s.n + k - 1) % 7 AS INT) + 1])
                - 1.96 * (s.sigma * sqrt(CAST(k AS DOUBLE))) AS lo,
              ((s.level + CAST(k AS DOUBLE) * s.trend)
                + s.season[CAST((s.n + k - 1) % 7 AS INT) + 1])
                + 1.96 * (s.sigma * sqrt(CAST(k AS DOUBLE))) AS hi
            FROM sig s, steps
        """,
    }
