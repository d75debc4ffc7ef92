"""Round-9 additions: README/registry sync, tiebreak_col determinism
for sessionize/asof (+ their splits), the asof broadcast-seeds opt-out,
the mean_between NaN/count fix, and hypothesis property tests proving
split == unsplit on RANDOM timelines (duplicate timestamps, empty
buckets, widths straddling the gap) — the hand-picked fixture tests in
test_skew_stress.py generalized (VERDICT r8 #4)."""

from __future__ import annotations

import math
import re
from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators import (
    asof_join,
    asof_join_split,
    mean_between,
    run_expectations,
    sessionize,
    sessionize_split,
)


def test_readme_matches_registry():
    """README's oracle-count line must track the registry (VERDICT r8
    #7: the round-8 README went stale the moment q574/q575 landed)."""
    from sensor_time_series_pyspark_spark.queries.registry import (
        ORACLE_SQL,
        QUERIES,
    )

    text = open("README.md").read()
    m = re.search(r"(\d+) of the (\d+) driver queries", text)
    assert m, "README oracle-count line missing"
    assert (int(m.group(1)), int(m.group(2))) == (
        len(ORACLE_SQL),
        len(QUERIES),
    ), "README.md oracle-count line is stale — update it to match the registry"


T0 = datetime(2024, 1, 1)


def _ts(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


def _mk_left(spark, rows):
    return spark.createDataFrame(rows, "k int, ts timestamp, lid int")


def _mk_right(spark, rows):
    return spark.createDataFrame(rows, "k int, rts timestamp, val double, rid int")


def test_asof_tiebreak_picks_largest_backward_smallest_forward(spark):
    """Coincident right rows (same key+ts): the carried value must be
    the LARGEST tiebreak going backward, the SMALLEST going forward —
    deterministic regardless of partitioning (the docstring caveat of
    rounds 7/8 replaced by an actual contract)."""
    left = _mk_left(spark, [(1, _ts(10), 1), (1, _ts(30), 2)])
    right = _mk_right(
        spark,
        [
            (1, _ts(5), 100.0, 1),
            (1, _ts(5), 200.0, 2),  # same key+ts, larger rid
            (1, _ts(20), 300.0, 3),
            (1, _ts(20), 400.0, 4),
        ],
    )
    back = asof_join(
        left, right, ["k"], "ts", "rts", ["val"], tiebreak_col="rid"
    )
    got = {r["lid"]: r["val"] for r in back.collect()}
    assert got == {1: 200.0, 2: 400.0}
    fwd = asof_join(
        left,
        right,
        ["k"],
        "ts",
        "rts",
        ["val"],
        direction="forward",
        tiebreak_col="rid",
    )
    got_f = {r["lid"]: r["val"] for r in fwd.collect()}
    # forward from ts=10 matches the ts=20 pair -> smallest rid (300);
    # from ts=30 there is no later right row -> NULL
    assert got_f[1] == 300.0 and got_f[2] is None


def test_asof_split_tiebreak_matches_plain_all_widths(spark):
    """The split path honors tiebreak_col identically to the plain
    path — including when coincident rows land at a bucket boundary —
    for widths below / equal / above the timeline span."""
    left = _mk_left(spark, [(1, _ts(i), i) for i in range(0, 40, 7)])
    right = _mk_right(
        spark,
        [
            (1, _ts(5), 100.0, 1),
            (1, _ts(5), 200.0, 2),
            (1, _ts(12), None, 3),  # null value: carry must skip it
            (1, _ts(24), 300.0, 4),
            (1, _ts(24), 400.0, 5),
        ],
    )
    for direction in ("backward", "forward"):
        plain = asof_join(
            left,
            right,
            ["k"],
            "ts",
            "rts",
            ["val"],
            direction=direction,
            tiebreak_col="rid",
            matched_ts_col="mts",
        )
        want = sorted(
            (r["lid"], r["val"], r["mts"]) for r in plain.collect()
        )
        for bucket_s in (60, 300, 600, 86_400):
            split = asof_join_split(
                left,
                right,
                ["k"],
                "ts",
                "rts",
                ["val"],
                bucket_seconds=bucket_s,
                direction=direction,
                tiebreak_col="rid",
                matched_ts_col="mts",
            )
            got = sorted(
                (r["lid"], r["val"], r["mts"]) for r in split.collect()
            )
            assert got == want, (direction, bucket_s)


def test_asof_split_shuffled_seeds_identical(spark):
    """broadcast_seeds=False (ADVICE r8: the fallback for key×bucket
    frames that outgrow the driver) must produce identical rows via the
    shuffled equi-join."""
    left = _mk_left(spark, [(k, _ts(m), k * 100 + m) for k in (1, 2) for m in range(0, 50, 9)])
    right = _mk_right(
        spark,
        [(k, _ts(m), float(k * 1000 + m), k * 100 + m) for k in (1, 2) for m in (3, 17, 31)],
    )
    kw = dict(
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        value_cols=["val"],
        bucket_seconds=600,
    )
    a = sorted(map(tuple, asof_join_split(left, right, **kw).collect()))
    b = sorted(
        map(
            tuple,
            asof_join_split(
                left, right, broadcast_seeds=False, **kw
            ).collect(),
        )
    )
    assert a == b and len(a) == left.count()


def test_sessionize_tiebreak_param_preserves_sessions(spark):
    """tiebreak_col only fixes within-tie ORDER; session numbers are
    tie-invariant, so with and without must agree on unique-ts data and
    coincident rows must share a session either way."""
    rows = [(1, _ts(0), 1), (1, _ts(1), 2), (1, _ts(1), 3), (1, _ts(90), 4)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int")
    out = sessionize(df, "ts", ["k"], gap_seconds=1800, tiebreak_col="eid")
    got = {r["eid"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2}
    split = sessionize_split(
        df, "ts", ["k"], gap_seconds=1800, bucket_seconds=60, tiebreak_col="eid"
    )
    got_s = {r["eid"]: r["session_seq"] for r in split.collect()}
    assert got_s == got


def test_mean_between_nan_excluded_from_sum_and_count(spark):
    """ADVICE r8: NaN casts to NULL in the non-ANSI decimal sum but was
    still counted, silently deflating the observed mean. Now the count
    only sees values that survive the cast: mean([1,3,NaN]) == 2.0."""
    df = spark.createDataFrame(
        [(1.0,), (3.0,), (float("nan"),)], "x double"
    )
    rep = run_expectations(
        df, [mean_between("band", "x", 0.0, 10.0)]
    ).collect()[0]
    assert math.isclose(rep["observed"], 2.0, rel_tol=0, abs_tol=0)
    assert bool(rep["passed"])


# ---- hypothesis: split == unsplit on random timelines (VERDICT #4) ----

# minute offsets with duplicates likely; gap fixed at 30 min so widths
# in BUCKETS below/equal/above the gap all get exercised
timelines = st.lists(
    st.integers(min_value=0, max_value=600), min_size=1, max_size=25
)
BUCKETS = st.sampled_from([7 * 60, 30 * 60, 45 * 60, 86_400])


@settings(max_examples=12, deadline=None)
@given(mins=timelines, bucket_s=BUCKETS)
def test_sessionize_split_equals_plain_random(spark, mins, bucket_s):
    rows = [(1, _ts(m), i) for i, m in enumerate(sorted(mins))] + [
        (2, _ts(m + 1), 1000 + i) for i, m in enumerate(sorted(mins)[:5])
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int")
    plain = sessionize(df, "ts", ["k"], 1800, tiebreak_col="eid")
    split = sessionize_split(
        df, "ts", ["k"], 1800, bucket_seconds=bucket_s, tiebreak_col="eid"
    )
    a = sorted((r["eid"], r["session_seq"]) for r in plain.collect())
    b = sorted((r["eid"], r["session_seq"]) for r in split.collect())
    assert a == b


@settings(max_examples=12, deadline=None)
@given(
    lmins=timelines,
    rmins=st.lists(st.integers(0, 600), min_size=0, max_size=12),
    bucket_s=BUCKETS,
    direction=st.sampled_from(["backward", "forward"]),
)
def test_asof_split_equals_plain_random(spark, lmins, rmins, bucket_s, direction):
    left = _mk_left(spark, [(1, _ts(m), i) for i, m in enumerate(lmins)])
    right = _mk_right(
        spark,
        [
            (1, _ts(m), float(m) if i % 3 else None, i)
            for i, m in enumerate(rmins)
        ],
    )
    kw = dict(
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        value_cols=["val"],
        direction=direction,
        tiebreak_col="rid",
        matched_ts_col="mts",
    )
    plain = asof_join(left, right, **kw)
    split = asof_join_split(left, right, bucket_seconds=bucket_s, **kw)
    a = sorted((r["lid"], r["val"], r["mts"]) for r in plain.collect())
    b = sorted((r["lid"], r["val"], r["mts"]) for r in split.collect())
    assert a == b


# ---- skew-aware auto-dispatch (VERDICT r8 #3) ----

import os  # noqa: E402

import pytest  # noqa: E402

ZIPF_DIR = "/tmp/scale_events/zipf"
UNIFORM_DIR = "/tmp/scale_events/uniform"


@pytest.mark.skipif(
    not os.path.isdir(f"{ZIPF_DIR}/events.parquet")
    or not os.path.isdir(f"{UNIFORM_DIR}/events.parquet"),
    reason="scale_events fixture missing (scripts/gen_scale_fixture.py)",
)
def test_auto_dispatch_picks_split_on_hot_unsplit_on_uniform(spark):
    """The dispatcher samples the key histogram and must choose the
    split path at 90%-hot (est. hot rows ~4.5M >> 2M crossover) and
    the unsplit path on the uniform fixture (hottest user ~350 rows),
    with row-identical session numbers either way. The chosen path is
    pinned through the optimized plan: only the split carries the
    __bucket column."""
    from sensor_time_series_pyspark_spark.operators import (
        sessionize_auto,
        should_split,
    )

    hot = spark.read.parquet(f"{ZIPF_DIR}/events.parquet").withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 9, F.lit(7)).otherwise(
            F.col("user_id")
        ),
    )
    uni = spark.read.parquet(f"{UNIFORM_DIR}/events.parquet")
    assert should_split(hot, ["user_id"]) is True
    assert should_split(uni, ["user_id"]) is False

    plan_of = lambda df: df._jdf.queryExecution().optimizedPlan().toString()  # noqa: E731
    auto_hot = sessionize_auto(hot, "ts", ["user_id"], 1800, 6 * 3600)
    assert "__bucket" in plan_of(auto_hot)
    auto_uni = sessionize_auto(uni, "ts", ["user_id"], 1800, 6 * 3600)
    assert "__bucket" not in plan_of(auto_uni)

    # row-identity on the decisive (hot) side vs the plain operator,
    # asserted on the hot user's worst-case series
    want = sessionize(
        hot.where(F.col("user_id") == 7), "ts", ["user_id"], 1800
    ).groupBy("session_seq").count()
    got = auto_hot.where(F.col("user_id") == 7).groupBy(
        "session_seq"
    ).count()
    assert sorted(map(tuple, want.collect())) == sorted(
        map(tuple, got.collect())
    )


@pytest.mark.skipif(
    not os.path.isdir(f"{ZIPF_DIR}/events.parquet"),
    reason="scale_events fixture missing (scripts/gen_scale_fixture.py)",
)
def test_asof_auto_dispatch_row_identical(spark):
    """asof_join_auto on a hot left side must take the split path and
    match asof_join row-for-row (sampled key: the left facts)."""
    from sensor_time_series_pyspark_spark.operators import asof_join_auto
    from sensor_time_series_pyspark_spark.sources.readers import read_table

    hot = (
        spark.read.parquet(f"{ZIPF_DIR}/events.parquet")
        .withColumn(
            "user_id",
            F.when(F.col("event_id") % 10 < 9, F.lit(7)).otherwise(
                F.col("user_id")
            ),
        )
        # keep runtime bounded: the identity check needs shape, not 5M rows
        .where(F.col("event_id") % 97 == 0)
    )
    o = read_table(spark, ZIPF_DIR, "orders")
    daily = o.groupBy(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
    ).agg(F.max("o_totalprice").alias("p"))
    kw = dict(
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["p"],
    )
    # force the split branch regardless of the filtered size: the
    # crossover is a parameter, the decision logic is what's under test
    auto = asof_join_auto(
        hot, daily, bucket_seconds=86_400, hot_rows_crossover=10_000, **kw
    )
    assert "__bucket" in auto._jdf.queryExecution().optimizedPlan().toString()
    plain = asof_join(hot, daily, **kw)
    a = sorted((r["event_id"], r["p"]) for r in auto.collect())
    b = sorted((r["event_id"], r["p"]) for r in plain.collect())
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# q581/q582: exact duplicated-substring detection (Lee et al. 2022)
# ---------------------------------------------------------------------------


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_dup_span_pairs_finds_maximal_run(spark):
    """Two docs sharing a verbatim 9-token run (and nothing else
    shareable) must report max_span_tokens == 9 exactly: the island
    merge has to fuse the 5 consecutive positional 5-grams of the run,
    and must NOT extend past its ends."""
    from sensor_time_series_pyspark_spark.operators.dedup import (
        dup_span_pairs,
    )

    run = "r1 r2 r3 r4 r5 r6 r7 r8 r9"
    docs = _mk_docs(
        spark,
        [
            f"a1 a2 a3 {run} a4 a5",
            f"b1 b2 {run} b3 b4 b5 b6",
            "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
        ],
    )
    out = dup_span_pairs(
        docs, "doc_id", "text", k=5, min_span_tokens=5
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["doc_a"], row["doc_b"]) == (0, 1)
    assert row["max_span_tokens"] == 9
    assert row["shared_grams"] == 5  # 9 - 5 + 1 consecutive 5-grams


def test_dup_span_pairs_two_separate_runs_not_merged(spark):
    """Two shared runs at DIFFERENT offsets must stay separate islands:
    max span is the longer run, shared_grams the sum of both."""
    from sensor_time_series_pyspark_spark.operators.dedup import (
        dup_span_pairs,
    )

    r1 = "x1 x2 x3 x4 x5 x6"          # 6 tokens -> 2 grams
    r2 = "y1 y2 y3 y4 y5 y6 y7"       # 7 tokens -> 3 grams
    docs = _mk_docs(
        spark,
        [f"{r1} a1 a2 a3 a4 a5 {r2}", f"{r2} b1 b2 b3 b4 {r1}"],
    )
    out = dup_span_pairs(
        docs, "doc_id", "text", k=5, min_span_tokens=5
    ).collect()
    assert len(out) == 1
    assert out[0]["max_span_tokens"] == 7
    assert out[0]["shared_grams"] == 5


def test_dup_span_pairs_df_valve_drops_boilerplate(spark):
    """A gram present in MORE than max_token_df docs is boilerplate and
    must produce no pairs; at a higher valve the same corpus pairs."""
    from sensor_time_series_pyspark_spark.operators.dedup import (
        dup_span_pairs,
    )

    boiler = "t1 t2 t3 t4 t5"
    docs = _mk_docs(spark, [f"{boiler} u{i}" for i in range(4)])
    low = dup_span_pairs(
        docs, "doc_id", "text", k=5, max_token_df=3, min_span_tokens=5
    )
    assert low.count() == 0
    high = dup_span_pairs(
        docs, "doc_id", "text", k=5, max_token_df=10, min_span_tokens=5
    )
    assert high.count() == 6  # all 4-choose-2 pairs share the gram


def test_dup_token_coverage_union_of_overlapping_ranges(spark):
    """Coverage is the UNION of [pos, pos+k-1] ranges: a 9-token shared
    run = 5 overlapping 5-gram starts must count 9 tokens, not 25; a
    doc with no shared grams is absent."""
    from sensor_time_series_pyspark_spark.operators.dedup import (
        dup_token_coverage,
    )

    run = "r1 r2 r3 r4 r5 r6 r7 r8 r9"
    docs = _mk_docs(
        spark,
        [f"a1 a2 {run}", f"{run} b1 b2 b3", "c1 c2 c3 c4 c5 c6"],
    )
    rows = {
        r["id"]: r["dup_tokens"]
        for r in dup_token_coverage(docs, "doc_id", "text", k=5).collect()
    }
    assert rows == {0: 9, 1: 9}


def test_dup_span_pairs_min_span_below_k_rejected(spark):
    import pytest

    from sensor_time_series_pyspark_spark.operators.dedup import (
        dup_span_pairs,
    )

    docs = _mk_docs(spark, ["a b c d e"])
    with pytest.raises(ValueError):
        dup_span_pairs(docs, "doc_id", "text", k=5, min_span_tokens=4)


# ---------------------------------------------------------------------------
# q584: greedy k-center coreset
# ---------------------------------------------------------------------------


def _brute_kcenter(vecs, k):
    """Reference greedy k-center on exact quantized integers."""
    q = {
        i: [math.floor(x * 1048576.0) for x in v] for i, v in vecs.items()
    }
    d2 = lambda a, b: sum((x - y) * (x - y) for x, y in zip(a, b))  # noqa: E731
    sel = [min(q)]
    while len(sel) < k and len(sel) < len(q):
        best = None
        for i in q:
            if i in sel:
                continue
            dmin = min(d2(q[i], q[c]) for c in sel)
            key = (-dmin, i)
            if best is None or key < best[0]:
                best = (key, i)
        sel.append(best[1])
    radius = max(min(d2(q[i], q[c]) for c in sel) for i in q)
    return sel, radius


def test_kcenter_greedy_matches_bruteforce(spark):
    """Selection order, tie-breaks, and covering radius must equal the
    single-machine greedy reference on exact quantized integers."""
    import random

    from sensor_time_series_pyspark_spark.operators.similarity import (
        kcenter_greedy,
    )

    rng = random.Random(7)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(30)
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    # quantization happens on the FLOAT-cast values, mirror that
    import struct

    as_f32 = {
        i: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        for i, v in vecs.items()
    }
    exp_sel, exp_rad = _brute_kcenter(as_f32, 5)
    rows = (
        kcenter_greedy(df, "vec_id", "embedding", k=5)
        .orderBy("rank")
        .collect()
    )
    assert [r["vec_id"] for r in rows] == exp_sel
    assert all(r["coverage_radius2"] == exp_rad for r in rows)


def test_kcenter_greedy_k_exceeding_n_stops_early(spark):
    from sensor_time_series_pyspark_spark.operators.similarity import (
        kcenter_greedy,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = kcenter_greedy(df, "vec_id", "embedding", k=10).collect()
    assert len(out) == 3
    assert all(r["coverage_radius2"] == 0 for r in out)


def test_tokenizer_fertility_exact_small(spark, tmp_path):
    """Hand-computed fertility: 'aaaa bb' -> 2 words, ceil(4/4)+
    ceil(2/4) = 2 bpe tokens; 'cccccc' -> 1 word, 2 bpe tokens."""
    import os

    docs = spark.createDataFrame(
        [
            (1, "aaaa bb", "en", "s", 7),
            (2, "cccccc", "en", "s", 6),
            (3, "dd ee", "de", "s", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    import __spark_entry__ as entrymod

    out = {
        r["lang"]: r
        for r in entrymod.queries()["q583_tokenizer_fertility"](
            spark, sf
        ).collect()
    }
    en = out["en"]
    assert (en["total_words"], en["total_bpe_tokens"]) == (3, 4)
    assert en["fertility"] == 4 / 3
    assert en["total_chars"] == 13
    de = out["de"]
    assert (de["total_words"], de["total_bpe_tokens"]) == (2, 2)
    assert de["fertility"] == 1.0


def _lcs_tokens(a, b):
    """Longest common contiguous token run (classic DP)."""
    best = 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            if x == y:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=25
        ),
        min_size=2,
        max_size=5,
    )
)
@settings(max_examples=12, deadline=None)
def test_dup_span_pairs_matches_lcs_bruteforce(spark, docs):
    """Property: for every doc pair, the operator reports a pair with
    max_span_tokens == LCS length iff the longest common contiguous
    token run is >= min_span_tokens (k=3 over a 4-token vocabulary —
    dense repetition, the adversarial regime for the island merge)."""
    from sensor_time_series_pyspark_spark.operators.dedup import (
        dup_span_pairs,
    )

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["max_span_tokens"]
        for r in dup_span_pairs(
            df,
            "doc_id",
            "text",
            k=3,
            max_token_df=1000,
            min_span_tokens=3,
        ).collect()
    }
    exp = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            lcs = _lcs_tokens(docs[i], docs[j])
            if lcs >= 3:
                exp[(i, j)] = lcs
    assert got == exp


def test_self_repeat_spans_exact(spark):
    """'p q r s t u p q r s t u' repeats a 6-token run (max self span
    6, at offset 6); a doc with no repeated 5-gram is absent; the
    occurrence valve drops a gram repeated more than max_occurrences
    times."""
    from sensor_time_series_pyspark_spark.operators.dedup import (
        self_repeat_spans,
    )

    run = "p q r s t u"
    docs = _mk_docs(
        spark,
        [
            f"{run} {run}",
            "n1 n2 n3 n4 n5 n6 n7",
            " ".join(["z"] * 40),  # one gram repeated 36x > valve 20
        ],
    )
    rows = {
        r["id"]: r["max_self_span_tokens"]
        for r in self_repeat_spans(
            docs, "doc_id", "text", k=5, max_occurrences=20
        ).collect()
    }
    assert rows == {0: 6}
