"""Generate the builder-owned scaling fixtures under /tmp
(VERDICT r6 next-round #6). Never touches /root/testdata.

Two artifacts:

1. ``/tmp/scale10/`` — a faithful 10x of the sf0.1 star schema:
   every fact/dim table is 10 key-shifted copies of its sf0.1 self
   (join consistency preserved: the same shift is applied to a key
   everywhere it appears), so every headline query does 10x the work
   with the same per-copy statistics. Two details make the 10x honest
   for the corpus/ANN queries:
   - documents: copy i > 0 rewrites every word token with an ``x{i}``
     suffix, giving each copy a DISJOINT vocabulary — the inverted
     shingle index then only pairs docs within a copy, which is how a
     real 10x corpus behaves (new content, same internal dup rate).
     Without this, q19 would compare copies of the same text across
     copies and the PAIR OUTPUT itself would grow 100x by fixture
     construction, not by plan regression.
   - embeddings: copy i adds i/1000 to every component (distinct
     vectors, unchanged scale); bench queries stay vec_id < 10, i.e.
     copy-0 — the corpus side grows 10x, the broadcast side doesn't.
   Written multi-file (32 partitions per table) so scans parallelize
   and AQE sees real file splits.

2. ``/tmp/scale_events/{uniform,zipf}/`` — ~5M-row events variants
   (50 key-shifted copies of sf0.1 events = 5,000,000 rows):
   - uniform: user_id shifted by (i % 10) * SHIFT so every user
     exists in scale10's customer table (10 copies) and the per-user
     row count stays uniform;
   - zipf: the same 5M rows with user_id remapped by a deterministic
     md5-driven zipf(s=1.2) over the copy-0 user domain — the hot
     head holds a large share of all events. Other tables are
     symlinked from scale10 so the full headline queries run as-is.

Usage: python scripts/gen_scale_fixture.py [--force]
Idempotent: skips existing outputs unless --force.
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.readers import read_table

SRC = "/root/testdata/sf0.1"
DST10 = "/tmp/scale10"
DST_EV = "/tmp/scale_events"

N_COPIES = 10
EV_COPIES = 50  # 50 x 100k = 5M events

# key shifts, larger than any key's domain at sf0.1
SHIFT = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "event_id": 100_000_000,
    "doc_id": 10_000_000,
    "vec_id": 1_000_000,
}


def _copies(df, n):
    return df.withColumn(
        "__i", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )


def _shift(col, unit):
    return (F.col(col) + F.col("__i").cast("bigint") * unit).alias(col)


def _write(df, path, parts=32):
    df.drop("__i").repartition(parts).write.mode("overwrite").parquet(path)
    print("wrote", path)


def build_scale10(spark, force):
    os.makedirs(DST10, exist_ok=True)
    done = lambda t: os.path.exists(f"{DST10}/{t}.parquet") and not force

    if not done("customer"):
        c = _copies(read_table(spark, SRC, "customer"), N_COPIES)
        _write(
            c.select(
                _shift("c_custkey", SHIFT["custkey"]),
                "c_name", "c_nationkey", "c_acctbal", "c_mktsegment", "__i",
            ),
            f"{DST10}/customer.parquet",
        )
    if not done("supplier"):
        s = _copies(read_table(spark, SRC, "supplier"), N_COPIES)
        _write(
            s.select(
                _shift("s_suppkey", SHIFT["suppkey"]),
                "s_name", "s_nationkey", "s_acctbal", "__i",
            ),
            f"{DST10}/supplier.parquet",
        )
    if not done("part"):
        p = _copies(read_table(spark, SRC, "part"), N_COPIES)
        _write(
            p.select(
                _shift("p_partkey", SHIFT["partkey"]),
                "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
                "__i",
            ),
            f"{DST10}/part.parquet",
        )
    if not done("orders"):
        o = _copies(read_table(spark, SRC, "orders"), N_COPIES)
        _write(
            o.select(
                _shift("o_orderkey", SHIFT["orderkey"]),
                _shift("o_custkey", SHIFT["custkey"]),
                "o_orderstatus", "o_totalprice", "o_orderdate",
                "o_orderpriority", "__i",
            ),
            f"{DST10}/orders.parquet",
        )
    if not done("lineitem"):
        li = _copies(read_table(spark, SRC, "lineitem"), N_COPIES)
        _write(
            li.select(
                _shift("l_orderkey", SHIFT["orderkey"]),
                _shift("l_partkey", SHIFT["partkey"]),
                _shift("l_suppkey", SHIFT["suppkey"]),
                "l_linenumber", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax", "l_returnflag", "l_linestatus",
                "l_shipdate", "__i",
            ),
            f"{DST10}/lineitem.parquet",
        )
    if not done("events"):
        ev = _copies(read_table(spark, SRC, "events"), N_COPIES)
        _write(
            ev.select(
                _shift("event_id", SHIFT["event_id"]),
                "ts",
                _shift("user_id", SHIFT["custkey"]),
                "event_type", "value", "props", "__i",
            ),
            f"{DST10}/events.parquet",
        )
    if not done("documents"):
        d = _copies(read_table(spark, SRC, "documents"), N_COPIES)
        # per-copy suffix needs the copy index in the replacement —
        # two passes: tag every word end with a control char, then
        # replace the tag with the per-row "x{i}" token (Column-typed
        # pattern+replacement overload).
        d2 = d.withColumn(
            "text2",
            F.when(F.col("__i") == 0, F.col("text")).otherwise(
                F.regexp_replace(F.col("text"), r"(\w+)", "$1\x01")
            ),
        ).withColumn(
            "text3",
            F.when(F.col("__i") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text2"),
                    F.lit("\x01"),
                    F.concat(F.lit("x"), F.col("__i").cast("string")),
                )
            ),
        )
        _write(
            d2.select(
                _shift("doc_id", SHIFT["doc_id"]),
                F.col("text3").alias("text"),
                "lang", "source",
                F.length("text3").cast("bigint").alias("n_chars"),
                "__i",
            ),
            f"{DST10}/documents.parquet",
        )
    if not done("embeddings"):
        e = _copies(read_table(spark, SRC, "embeddings"), N_COPIES)
        _write(
            e.select(
                _shift("vec_id", SHIFT["vec_id"]),
                F.transform(
                    "embedding",
                    lambda x: (
                        x + F.col("__i").cast("double") / F.lit(1000.0)
                    ).cast("float"),
                ).alias("embedding"),
                "label", "__i",
            ),
            f"{DST10}/embeddings.parquet",
        )
    for t in ("nation", "region"):
        dst = f"{DST10}/{t}.parquet"
        if not (os.path.exists(dst) and not force):
            if os.path.isdir(dst) or os.path.islink(dst):
                shutil.rmtree(dst, ignore_errors=True)
            elif os.path.exists(dst):
                os.remove(dst)
            shutil.copy(f"{SRC}/{t}.parquet", dst)
            print("copied", dst)


def build_events5m(spark, force):
    # uniform: 50 copies, user shift cycles the 10 scale10 copies so
    # every user joins customer; zipf: md5-quantile inverse-CDF over
    # the copy-0 user domain with s=1.2
    for variant in ("uniform", "zipf"):
        outdir = f"{DST_EV}/{variant}"
        os.makedirs(outdir, exist_ok=True)
        dst = f"{outdir}/events.parquet"
        if os.path.exists(dst) and not force:
            continue
        ev = _copies(read_table(spark, SRC, "events"), EV_COPIES)
        base = ev.select(
            _shift("event_id", SHIFT["event_id"]),
            "ts",
            (
                F.col("user_id")
                + (F.col("__i") % N_COPIES).cast("bigint") * SHIFT["custkey"]
            ).alias("user_id"),
            "event_type", "value", "props", "__i",
        )
        if variant == "zipf":
            # deterministic uniform u in (0,1] from the shifted id,
            # then inverse-CDF of a truncated zeta(s=1.2) over ranks
            # 1..1500 approximated by u^(-1/(s-1)) — heavy head, the
            # hottest user takes a few percent of ALL events. The rank
            # is then mapped onto the OBSERVED copy-0 customer domain
            # (min_custkey + (rank-1) % domain_size) rather than used
            # raw, so every zipf user joins customer regardless of
            # where custkeys start; on the dense 1..N sf0.1 domain
            # (N >= 1500) this is the identity map.
            ckeys = read_table(spark, SRC, "customer").agg(
                F.min("c_custkey").alias("lo"), F.max("c_custkey").alias("hi")
            ).collect()[0]
            dom_lo, dom_n = int(ckeys["lo"]), int(ckeys["hi"] - ckeys["lo"] + 1)
            u = (
                F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 12), 16, 10)
                .cast("double")
                / F.lit(float(16**12))
            )
            rank = F.least(
                F.lit(1500.0),
                F.greatest(
                    F.lit(1.0),
                    F.pow(F.greatest(u, F.lit(1e-12)), F.lit(-1.0 / 0.2)),
                ),
            ).cast("bigint")
            mapped = F.lit(dom_lo) + (rank - 1) % F.lit(dom_n)
            base = base.withColumn("user_id", mapped.cast("bigint"))
        base.drop("__i").repartition(64).write.mode("overwrite").parquet(dst)
        print("wrote", dst)
        # symlink the other tables from scale10 so headline queries
        # run against this directory unchanged
        for t in (
            "customer", "supplier", "part", "orders", "lineitem",
            "documents", "embeddings", "nation", "region",
        ):
            link = f"{outdir}/{t}.parquet"
            if not os.path.exists(link):
                os.symlink(f"{DST10}/{t}.parquet", link)


DST_BIG = "/tmp/scale_big"
DOC_COPIES_BIG = 100   # 100 x 5k  = 500k docs  (10x scale10 -> 2nd decade)
EV_COPIES_BIG = 500    # 500 x 100k = 50M events (50x scale10)


def build_second_decade(spark, force):
    """Second-decade leg (VERDICT r7 #6) for the three steepest
    first-decade queries: 500k documents (a clean 10x over scale10,
    same disjoint-vocabulary discipline) for q19/q22, and 50M events
    for q29. Other tables symlink to scale10."""
    os.makedirs(DST_BIG, exist_ok=True)
    done = lambda t: os.path.exists(f"{DST_BIG}/{t}.parquet") and not force

    if not done("documents"):
        d = _copies(read_table(spark, SRC, "documents"), DOC_COPIES_BIG)
        d2 = d.withColumn(
            "text2",
            F.when(F.col("__i") == 0, F.col("text")).otherwise(
                F.regexp_replace(F.col("text"), r"(\w+)", "$1\x01")
            ),
        ).withColumn(
            "text3",
            F.when(F.col("__i") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text2"),
                    F.lit("\x01"),
                    F.concat(F.lit("x"), F.col("__i").cast("string")),
                )
            ),
        )
        _write(
            d2.select(
                _shift("doc_id", SHIFT["doc_id"]),
                F.col("text3").alias("text"),
                "lang", "source",
                F.length("text3").cast("bigint").alias("n_chars"),
                "__i",
            ),
            f"{DST_BIG}/documents.parquet",
        )
    if not done("events"):
        ev = _copies(read_table(spark, SRC, "events"), EV_COPIES_BIG)
        _write(
            ev.select(
                _shift("event_id", SHIFT["event_id"]),
                "ts",
                (
                    F.col("user_id")
                    + (F.col("__i") % N_COPIES).cast("bigint")
                    * SHIFT["custkey"]
                ).alias("user_id"),
                "event_type", "value", "props", "__i",
            ),
            f"{DST_BIG}/events.parquet",
            parts=64,
        )
    for t in (
        "customer", "supplier", "part", "orders", "lineitem",
        "embeddings", "nation", "region",
    ):
        link = f"{DST_BIG}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{DST10}/{t}.parquet", link)


def main() -> None:
    force = "--force" in sys.argv
    spark = get_spark("gen_scale_fixture")
    build_scale10(spark, force)
    build_events5m(spark, force)
    build_second_decade(spark, force)
    for t in ("lineitem", "events", "documents", "embeddings"):
        n = spark.read.parquet(f"{DST10}/{t}.parquet").count()
        print(f"scale10 {t}: {n} rows")
    for v in ("uniform", "zipf"):
        n = spark.read.parquet(f"{DST_EV}/{v}/events.parquet").count()
        print(f"events5m {v}: {n} rows")


if __name__ == "__main__":
    main()
