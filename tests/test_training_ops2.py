"""Unit + invariant tests for the round-2 wave-2 training-pipeline
operators: token chunking, n-gram contamination, PII redaction,
repetition stats, TVD drift, ACF, CUSUM, hopping windows."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.functions.text import (
    redact_pii,
    repetition_stats,
)
from sensor_time_series_pyspark_spark.operators import (
    acf,
    chunk_tokens,
    cusum,
    hopping_resample,
    ngram_overlap,
    resample,
    tvd_drift,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# ---------------------------------------------------------------- chunking


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(100))),
        (2, "a b c"),
        (3, "solo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_disjoint_roundtrip(spark, docs):
    """stride == chunk_size: concatenating chunks in order rebuilds the
    tokenized document, and every token count is conserved."""
    out = chunk_tokens(docs, "doc_id", "text", chunk_size=32).toPandas()
    by_doc = out.sort_values(["id", "chunk_id"]).groupby("id")
    joined = by_doc["chunk_text"].apply(" ".join).to_dict()
    assert joined[1] == " ".join(f"w{i}" for i in range(100))
    assert joined[2] == "a b c"
    assert joined[3] == "solo"
    assert by_doc["n_tokens"].sum().to_dict() == {1: 100, 2: 3, 3: 1}


def test_chunk_overlap_counts(spark, docs):
    """stride < chunk_size: starts at 0, stride, ...; every chunk but
    trailing ones has exactly chunk_size tokens."""
    out = chunk_tokens(docs, "doc_id", "text", chunk_size=32, stride=16).toPandas()
    d1 = out[out["id"] == 1].sort_values("chunk_id")
    # 100 tokens, starts 0,16,...,96 -> 7 chunks
    assert list(d1["chunk_id"]) == list(range(7))
    assert list(d1["n_tokens"]) == [32, 32, 32, 32, 32, 20, 4]


# ---------------------------------------------------------- contamination


def test_contamination_planted(spark):
    train = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),
         (11, "totally unrelated words here nothing shared at all")],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(1, "the quick brown fox jumps somewhere else entirely"),
         (2, "fresh clean evaluation text with novel content only")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r.asDict()
        for r in ngram_overlap(train, test, "doc_id", "text", n=3).collect()
    }
    # doc 1 shares 'the quick brown', 'quick brown fox', 'brown fox jumps'
    assert out[1]["n_shared"] == 3
    assert out[1]["n_train_docs"] == 1
    assert out[1]["n_grams"] == 6
    # doc 2 is clean but still present
    assert out[2]["n_shared"] == 0
    assert out[2]["n_train_docs"] == 0


def test_contamination_df_valve(spark):
    """max_ngram_df drops boilerplate n-grams from the train index."""
    boiler = "same same same"
    train = spark.createDataFrame(
        [(i, boiler) for i in range(5)], "doc_id long, text string"
    )
    test = spark.createDataFrame([(1, boiler)], "doc_id long, text string")
    full = ngram_overlap(train, test, "doc_id", "text", n=3).collect()[0]
    capped = ngram_overlap(
        train, test, "doc_id", "text", n=3, max_ngram_df=3
    ).collect()[0]
    assert full["n_shared"] == 1 and full["n_train_docs"] == 5
    assert capped["n_shared"] == 0 and capped["n_grams"] == 1


# -------------------------------------------------------------- redaction


def test_redact_pii_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.co now"),
            (2, "ssn 123-45-6789 leaked"),
            (3, "host 192.168.001.12 up"),
            (4, "call +1-555-867-5309 or 1.415.867.5309"),
            (5, "clean text 12 with 345 digits 6789"),
        ],
        "id long, t string",
    )
    got = {r["id"]: r["r"] for r in df.select("id", redact_pii("t").alias("r")).collect()}
    assert got[1] == "mail [EMAIL] now"
    assert got[2] == "ssn [SSN] leaked"
    assert got[3] == "host [IP] up"
    assert got[4] == "call [PHONE] or [PHONE]"
    assert got[5] == "clean text 12 with 345 digits 6789"
    # subset selection leaves other kinds untouched
    only_email = df.where("id = 2").select(
        redact_pii("t", kinds=["email"]).alias("r")
    ).collect()[0]["r"]
    assert only_email == "ssn 123-45-6789 leaked"


# ------------------------------------------------------------- repetition


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [(1, "ha ha ha ha"), (2, "all words fully distinct"), (3, "x")],
        "id long, t string",
    )
    out = {
        r["id"]: (r["s"]["n_grams"], r["s"]["n_distinct"])
        for r in df.select("id", repetition_stats("t", n=2).alias("s")).collect()
    }
    assert out[1] == (3, 1)  # 'ha ha' x3
    assert out[2] == (3, 3)
    assert out[3] == (0, 0)  # too short for a bigram


# ------------------------------------------------------------------ drift


def test_tvd_identical_and_disjoint(spark):
    same = spark.createDataFrame(
        [(float(i % 10), p) for i in range(200) for p in (0, 1)],
        "v double, period int",
    )
    r = tvd_drift(same, "v", is_reference=F.col("period") == 0).collect()[0]
    assert r["tvd"] == 0.0 and r["n_ref"] == 200 and r["n_cur"] == 200
    # current mass entirely outside the reference's support clamps into
    # the edge bin -> distributions share no interior mass except that bin
    shifted = spark.createDataFrame(
        [(float(i % 10), 0) for i in range(100)]
        + [(1000.0, 1) for _ in range(100)],
        "v double, period int",
    )
    r2 = tvd_drift(shifted, "v", is_reference=F.col("period") == 0).collect()[0]
    # all current rows land in bin 9, which holds 1/10 of reference mass
    assert r2["tvd"] == pytest.approx(0.9)


def test_acf_linear_series(spark):
    rows = [("s", ts(f"2024-01-01 00:{m:02d}:00"), float(m)) for m in range(60)]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    out = {r["lag"]: r for r in acf(df, ["k"], "t", "v", max_lag=3).collect()}
    # a linear ramp is almost perfectly autocorrelated at small lags
    for lag in (1, 2, 3):
        assert out[lag]["n"] == 60 - lag
        assert out[lag]["acf"] > 0.99
    const = spark.createDataFrame(
        [("c", ts("2024-01-01 00:00:00"), 5.0), ("c", ts("2024-01-01 00:01:00"), 5.0)],
        "k string, t timestamp, v double",
    )
    assert acf(const, ["k"], "t", "v", max_lag=1).collect()[0]["acf"] is None


def test_cusum_level_shift(spark):
    # 50 points at 0, then 50 points at 10: the cumulative deviation
    # trough at the change point must breach; a pure noise-free flat
    # series must not.
    rows = [
        ("a", ts(f"2024-01-01 {h:02d}:{m:02d}:00"), 0.0 if h < 2 else 10.0)
        for h in range(4)
        for m in range(0, 60, 5)
    ]
    df = spark.createDataFrame(rows, "sid string, t timestamp, v double")
    out = cusum(df, ["sid"], "t", "v", threshold=0.5).toPandas()
    assert bool(out["breach"].any())
    # maximum |cusum| lands exactly at the change point (k = 24)
    peak = out.loc[out["cusum"].abs().idxmax()]
    assert peak["k"] == 24
    flat = spark.createDataFrame(
        [("f", ts(f"2024-01-01 00:{m:02d}:00"), 7.0) for m in range(30)],
        "sid string, t timestamp, v double",
    )
    fout = cusum(flat, ["sid"], "t", "v").toPandas()
    # zero variance -> cusum undefined, no breaches claimed
    assert fout["cusum"].isna().all()


# ---------------------------------------------------------------- hopping


def test_hopping_equals_tumbling_when_slide_is_width(spark):
    rows = [
        ("a", ts(f"2024-01-01 00:{m:02d}:00"), float(m)) for m in range(0, 60, 7)
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    hop = hopping_resample(
        df, "t", "30 minutes", "30 minutes", keys=["k"],
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    tum = resample(df, "t", "30 minutes", keys=["k"], aggs=[F.count(F.lit(1)).alias("n")])
    assert sorted(map(tuple, hop.collect())) == sorted(map(tuple, tum.collect()))


def test_hopping_multiplicity(spark):
    one = spark.createDataFrame(
        [("a", ts("2024-01-01 00:31:00"), 1.0)], "k string, t timestamp, v double"
    )
    out = hopping_resample(
        one, "t", "2 hours", "30 minutes", keys=["k"],
        aggs=[F.count(F.lit(1)).alias("n")],
    ).collect()
    # width/slide = 4 containing windows, each counting the single row
    assert len(out) == 4
    assert all(r["n"] == 1 for r in out)
    starts = sorted(r["bucket"] for r in out)
    assert starts[0] == ts("2023-12-31 23:00:00")
    assert starts[-1] == ts("2024-01-01 00:30:00")


# -------------------------------------------------------------- profiling


def test_top_categories_ranks_and_shares(spark):
    df = spark.createDataFrame(
        [("g", "a")] * 5 + [("g", "b")] * 3 + [("g", "c")] * 2,
        "grp string, v string",
    )
    from sensor_time_series_pyspark_spark.operators import top_categories

    out = {r["rank"]: r for r in top_categories(df, "v", by=["grp"], k=2).collect()}
    assert len(out) == 2
    assert (out[1]["value"], out[1]["n"]) == ("a", 5)
    assert out[1]["share"] == 0.5
    assert (out[2]["value"], out[2]["n"]) == ("b", 3)


def test_category_concentration_extremes(spark):
    from sensor_time_series_pyspark_spark.operators import category_concentration

    pure = spark.createDataFrame([("g", "x")] * 10, "grp string, v string")
    r = category_concentration(pure, "v", by=["grp"]).collect()[0]
    assert r["herfindahl"] == 1.0 and r["gini"] == 0.0
    uniform = spark.createDataFrame(
        [("g", str(i)) for i in range(10)], "grp string, v string"
    )
    r2 = category_concentration(uniform, "v", by=["grp"]).collect()[0]
    assert r2["herfindahl"] == pytest.approx(0.1)
    assert r2["n_categories"] == 10


def test_rolling_median_robustness(spark):
    from sensor_time_series_pyspark_spark.operators import rolling_median

    # constant series with one huge outlier: median shrugs it off as
    # soon as the frame holds a non-outlier majority
    rows = [
        ("s", ts(f"2024-01-01 00:{m:02d}:00"), 1000.0 if m == 5 else 3.0)
        for m in range(12)
    ]
    df = spark.createDataFrame(rows, "sid string, t timestamp, v double")
    out = (
        rolling_median(df, "t", "v", partition_by=["sid"], n_rows=7)
        .orderBy("t")
        .collect()
    )
    assert all(r["rolling_median"] == 3.0 for r in out)
    # even-count frame interpolates the two middle values
    two = spark.createDataFrame(
        [("s", ts("2024-01-01 00:00:00"), 1.0), ("s", ts("2024-01-01 00:01:00"), 2.0)],
        "sid string, t timestamp, v double",
    )
    got = rolling_median(two, "t", "v", partition_by=["sid"], n_rows=7).orderBy("t").collect()
    assert got[1]["rolling_median"] == 1.5
