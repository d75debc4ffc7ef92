"""Property tests (SURVEY.md §5 strategy #3) for operators with
algebraic laws. Hypothesis generates the series; example counts stay
small because each example is a Spark job."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators import ffill, interpolate_linear

SETTINGS = dict(max_examples=8, deadline=None)

series = st.lists(
    st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
    min_size=1,
    max_size=12,
)


def mk_df(spark, values):
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0 + timedelta(minutes=i), float(v) if v is not None else None)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "id int, ts timestamp, value double")


@settings(**SETTINGS)
@given(series)
def test_ffill_idempotent_and_preserves_observed(spark, values):
    df = mk_df(spark, values)
    once = ffill(df, ["value"], order_col="ts", partition_by=["id"])
    twice = ffill(once, ["value"], order_col="ts", partition_by=["id"])
    a = [r["value"] for r in once.orderBy("ts").collect()]
    b = [r["value"] for r in twice.orderBy("ts").collect()]
    assert a == b  # idempotent
    # observed (non-null) values pass through untouched
    for got, orig in zip(a, values):
        if orig is not None:
            assert got == orig


@settings(**SETTINGS)
@given(series)
def test_interpolate_endpoints_exact_and_bounded(spark, values):
    df = mk_df(spark, values)
    out = [
        r["value"]
        for r in interpolate_linear(df, "ts", "value", ["id"]).orderBy("ts").collect()
    ]
    observed = [v for v in values if v is not None]
    for got, orig in zip(out, values):
        if orig is not None:
            assert got == orig  # endpoints exact
        elif observed:
            # interior fills are bounded by the observed envelope
            assert min(observed) - 1e-9 <= got <= max(observed) + 1e-9
        else:
            assert got is None  # all-null series stays null


@settings(**SETTINGS)
@given(st.lists(st.floats(0, 100, allow_nan=False), min_size=1, max_size=12))
def test_resample_count_and_mass_preserved(spark, values):
    from sensor_time_series_pyspark_spark.operators import resample

    df = mk_df(spark, values)
    agg = resample(
        df, ts_col="ts", width="5 minutes", keys=[],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("s"),
        ],
    ).collect()
    assert sum(r["n"] for r in agg) == len(values)
    # decimal(38,6) quantizes each bucket sum to 1e-6
    assert sum(r["s"] for r in agg) == pytest.approx(
        sum(values), abs=1e-6 * (len(values) + 1)
    )


@settings(**SETTINGS)
@given(st.text(alphabet="ab c", min_size=0, max_size=40))
def test_quality_score_in_unit_interval(spark, text):
    from sensor_time_series_pyspark_spark.functions.text import quality_score

    df = spark.createDataFrame([(text,)], "t string")
    (score,) = df.select(quality_score("t").alias("q")).first()
    assert 0.0 <= score <= 1.0


@settings(**SETTINGS)
@given(st.text(alphabet="abc xyz", min_size=1, max_size=60))
def test_fingerprint_whitespace_invariant(spark, text):
    """fingerprint64 must be invariant to whitespace normalization —
    the property that makes it a usable dedup key."""
    from sensor_time_series_pyspark_spark.functions.text import fingerprint64

    df = spark.createDataFrame(
        [(text, "  " + text.replace(" ", "   ") + " ")], "a string, b string"
    )
    r = df.select(
        fingerprint64("a").alias("fa"), fingerprint64("b").alias("fb")
    ).first()
    assert r["fa"] == r["fb"]


@settings(max_examples=15, deadline=None)
@given(st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e"]), min_size=0, max_size=12),
       st.integers(1, 4))
def test_shingles_match_bruteforce(spark, toks, k):
    """zip_with shingle construction == brute-force python shingling
    for arbitrary token lists and k (guards the O(n^2)-fix rewrite)."""
    from pyspark.sql import functions as F

    from sensor_time_series_pyspark_spark.functions.text import (
        shingles_from_tokens,
    )

    df = spark.createDataFrame([(toks,)], "toks array<string>")
    got = sorted(
        df.select(shingles_from_tokens(F.col("toks"), k).alias("s"))
        .collect()[0]
        .s
    )
    want = sorted(
        {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    ) if len(toks) >= k else []
    assert got == want


@settings(max_examples=15, deadline=None)
@given(st.lists(st.floats(-1e3, 1e3, allow_nan=False, width=32),
                min_size=1, max_size=16))
def test_quantize_roundtrip_error_bound(spark, vec):
    """|dequantize(quantize(x)) - x| <= scale/2 element-wise, for any
    float vector including negatives and zeros."""
    from pyspark.sql import functions as F

    from sensor_time_series_pyspark_spark.functions.vectors import (
        dequantize_int8,
        quantize_int8,
    )

    df = spark.createDataFrame([(vec,)], "v array<float>")
    row = df.select(
        F.transform("v", lambda x: x.cast("double")).alias("orig"),
        quantize_int8("v").alias("qs"),
    ).withColumn("recon", dequantize_int8("qs")).collect()[0]
    bound = row.qs.scale / 2 + 1e-9
    for o, r in zip(row.orig, row.recon):
        assert abs(o - r) <= bound


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                min_size=1, max_size=20))
def test_connected_components_match_union_find(spark, edges):
    from sensor_time_series_pyspark_spark.operators import (
        connected_components,
    )

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    # canonical: min node per component
    comp_min = {}
    for n, r in want.items():
        comp_min.setdefault(find(r), []).append(n)
    want = {n: min(ns) for r, ns in comp_min.items() for n in ns}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=15))
def test_capped_running_sum_equals_recursion(spark, deltas):
    from sensor_time_series_pyspark_spark.operators import capped_running_sum

    rows = [("g", i, round(d, 2)) for i, d in enumerate(deltas)]
    df = spark.createDataFrame(rows, "g string, t long, x double")
    got = {r["t"]: r["balance"] for r in
           capped_running_sum(df, ["g"], ["t"], "x").collect()}
    b = 0.0
    for i, (_, _, d) in enumerate(rows):
        # mirror the operator's exact decimal arithmetic with cents
        b = max(round(b + d, 2), 0.0)
        assert abs(got[i] - b) < 1e-9


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=0,
        max_size=20,
    )
)
def test_triangle_count_matches_bruteforce(spark, edges):
    import itertools

    from sensor_time_series_pyspark_spark.operators import triangle_count

    und = {frozenset(e) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if {a, b} in und and {b, c} in und and {a, c} in und
    )
    if not und:
        return
    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "src long, dst long"
    )
    got = triangle_count(df, orient="degree").collect()[0]["n_triangles"]
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(st.integers(0, 5), min_size=2, max_size=15),
    st.lists(st.integers(0, 5), min_size=2, max_size=15),
)
def test_snapshot_diff_partitions_keyspace(spark, old_keys, new_keys):
    from sensor_time_series_pyspark_spark.operators import snapshot_diff

    old = spark.createDataFrame(
        [(k, f"v{k}") for k in set(old_keys)], "k long, v string"
    )
    new = spark.createDataFrame(
        [(k, f"v{k}") for k in set(new_keys)], "k long, v string"
    )
    out = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    o, n = set(old_keys), set(new_keys)
    assert set(out) == o | n
    for k, c in out.items():
        want = (
            "unchanged" if k in o and k in n
            else "removed" if k in o
            else "added"
        )
        assert c == want


# --- round-3 operators -----------------------------------------------------

texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40),
    min_size=1,
    max_size=6,
)


@settings(**SETTINGS)
@given(texts)
def test_winnowing_fingerprints_bounded_by_grams(spark, docs):
    from sensor_time_series_pyspark_spark.operators.dedup import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = winnow_fingerprints(df, "doc_id", "text", k=2, w=3).collect()
    assert len(out) == len(docs)  # every doc appears
    for r in out:
        # fingerprint count bounded by window-start count and >=1 iff
        # any gram exists
        assert 0 <= r["n_fingerprints"] <= max(r["n_grams"], 1)
        assert (r["n_fingerprints"] == 0) == (r["n_grams"] == 0)


@settings(**SETTINGS)
@given(
    st.lists(st.integers(1, 50), min_size=1, max_size=10),
    st.integers(1, 200),
)
def test_token_budget_boundary(spark, toks, budget):
    from sensor_time_series_pyspark_spark.operators.sampling import (
        token_budget_select,
    )

    df = spark.createDataFrame(
        [(i, t, i) for i, t in enumerate(toks)], ["id", "toks", "score"]
    )
    out = token_budget_select(df, "id", "toks", "score", budget=budget)
    rows = out.orderBy("cum_tokens").collect()
    if rows:
        assert rows[-1]["cum_tokens"] <= budget
    # greedy property: the next doc in score order would exceed budget
    taken = {r["id"] for r in rows}
    order = sorted(
        ((r[2], r[0], r[1]) for r in df.collect()),
        key=lambda x: (-x[0], x[1]),
    )
    cum = 0
    for score, ident, t in order:
        cum += t
        if cum <= budget:
            assert ident in taken
        else:
            break


@settings(**SETTINGS)
@given(st.lists(st.floats(0, 1000, allow_nan=False), min_size=2, max_size=15))
def test_delta_roundtrip_property(spark, vals):
    from sensor_time_series_pyspark_spark.operators.compress import (
        delta_decode,
        delta_encode,
    )

    t0 = datetime(2024, 1, 1)
    vals = [round(v, 2) for v in vals]
    df = spark.createDataFrame(
        [("s", t0 + timedelta(seconds=i), v) for i, v in enumerate(vals)],
        "k string, ts timestamp, v double",
    )
    dec = delta_decode(delta_encode(df, ["k"], "ts", "v"), ["k"])
    got = [r["value"] for r in dec.orderBy("ts").collect()]
    for g, v in zip(got, vals):
        assert abs(g - v) < 1e-9


@settings(**SETTINGS)
@given(st.lists(st.integers(0, 5), min_size=2, max_size=20))
def test_mann_kendall_antisymmetric(spark, vals):
    from sensor_time_series_pyspark_spark.operators.profile import mann_kendall

    t0 = datetime(2024, 1, 1)
    fwd = spark.createDataFrame(
        [("s", t0 + timedelta(days=i), float(v)) for i, v in enumerate(vals)],
        "k string, ts timestamp, v double",
    )
    rev = spark.createDataFrame(
        [("s", t0 + timedelta(days=i), float(v))
         for i, v in enumerate(reversed(vals))],
        "k string, ts timestamp, v double",
    )
    sf = mann_kendall(fwd, ["k"], "ts", "v").collect()[0]["s"]
    sr = mann_kendall(rev, ["k"], "ts", "v").collect()[0]["s"]
    assert sf == -sr  # reversing time negates S
