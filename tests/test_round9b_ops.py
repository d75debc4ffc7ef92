"""Round-9 curation-planning operators: segment_dup_stats (the
CCNet/RefinedWeb line-dedup audit) on constructed input with a real
duplicated segment, and waterfill_allocation branch coverage — the
capped / uncapped / budget-exceeds-capacity cases the roughly-uniform
synthetic corpus never exercises (there the waterline clears every
capacity at k=1)."""

from __future__ import annotations

import math

from sensor_time_series_pyspark_spark.operators import (
    segment_dup_stats,
    waterfill_allocation,
)


def test_segment_dup_stats_marks_shared_segment(spark):
    # docs 1 and 2 share their first 4-token segment verbatim; doc 3 is
    # clean. seg_tokens=4 → doc1 has segments [a b c d], [e f] (6 toks),
    # doc2 has [a b c d], [x y] — the shared segment is marked in both.
    rows = [
        (1, "s1", "a b c d e f"),
        (2, "s1", "a b c d x y"),
        (3, "s2", "p q r s t u"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        r["id"]: r
        for r in segment_dup_stats(
            df, "doc_id", "text", carry_cols=["source"], seg_tokens=4
        ).collect()
    }
    assert out[1]["n_seg"] == 2 and out[1]["dup_seg"] == 1
    assert out[1]["dup_tok"] == 4 and out[1]["n_tok"] == 6
    assert out[2]["dup_seg"] == 1 and out[2]["dup_tok"] == 4
    assert out[3]["dup_seg"] == 0 and out[3]["dup_tok"] == 0
    assert out[3]["source"] == "s2"


def test_segment_dup_stats_short_tail_segment_counted(spark):
    # a 5-token doc at seg_tokens=4 yields a full segment + a 1-token
    # tail; the tail's seg_len must be 1, not 4 (token-mass accounting)
    rows = [(1, "z", "a b c d e"), (2, "z", "a b c d e")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = segment_dup_stats(
        df, "doc_id", "text", carry_cols=["source"], seg_tokens=4
    ).collect()
    for r in out:
        assert r["n_seg"] == 2 and r["dup_seg"] == 2
        assert r["dup_tok"] == 5  # 4 + 1, never 4 + 4


def _waterfill(spark, tokens_by_group, budget_frac, max_epochs):
    df = spark.createDataFrame(
        [(g, int(t)) for g, t in tokens_by_group.items()], ["g", "n"]
    )
    out = waterfill_allocation(
        df, ["g"], "n", budget_frac=budget_frac, max_epochs=max_epochs
    )
    return {r["g"]: r for r in out.collect()}


def test_waterfill_no_caps_uniform_split(spark):
    # capacities [50, 60, 70] with budget 90: first k is already
    # feasible (w=30 <= 50) → everyone gets 30, nobody capped. This is
    # the case a min-over-feasible-w_k rule gets WRONG (k=3 yields
    # w=-20, also "feasible"): the waterline must come from the FIRST
    # feasible rank.
    out = _waterfill(spark, {"a": 25, "b": 30, "c": 35}, 1.0, 2.0)
    for g in "abc":
        assert math.isclose(out[g]["allocation"], 30.0)
        assert not out[g]["capped"]
    assert math.isclose(out["a"]["waterline"], 30.0)


def test_waterfill_caps_small_source_and_redistributes(spark):
    # tokens {a:1, b:100}, budget 50.5, caps 2x: a is capped at 2.0,
    # the freed budget flows to b (48.5) — allocations sum to budget.
    out = _waterfill(spark, {"a": 1, "b": 100}, 0.5, 2.0)
    assert math.isclose(out["a"]["allocation"], 2.0)
    assert out["a"]["capped"] and math.isclose(out["a"]["epochs"], 2.0)
    assert math.isclose(out["b"]["allocation"], 48.5)
    assert not out["b"]["capped"]
    total = sum(r["allocation"] for r in out.values())
    assert math.isclose(total, 50.5)


def test_waterfill_budget_exceeds_total_capacity(spark):
    # budget_frac 5.0 with max_epochs 2.0: budget 505 > total capacity
    # 202 → no waterline, everyone capped at capacity.
    out = _waterfill(spark, {"a": 1, "b": 100}, 5.0, 2.0)
    assert out["a"]["waterline"] is None
    for g in "ab":
        assert out[g]["capped"]
        assert math.isclose(out[g]["epochs"], 2.0)


def test_waterfill_middle_cap_chain(spark):
    # three tiers where the first TWO get capped: tokens {a:1, b:5,
    # c:100}, budget 53, caps 2x → capacities [2, 10, 200].
    # k=1: w=53/3≈17.67 > 2; k=2: (53-2)/2=25.5 > 10; k=3: (53-12)=41
    # <= 200 → a and b capped, c gets 41.
    out = _waterfill(spark, {"a": 1, "b": 5, "c": 100}, 0.5, 2.0)
    assert math.isclose(out["a"]["allocation"], 2.0) and out["a"]["capped"]
    assert math.isclose(out["b"]["allocation"], 10.0) and out["b"]["capped"]
    assert math.isclose(out["c"]["allocation"], 41.0)
    assert not out["c"]["capped"]


def test_packing_fragments_boundary_math(spark):
    # Three docs of 4 tokens packed at ctx=4: every doc exactly fills
    # one context — zero crossings, zero waste. At ctx=8 the middle
    # doc straddles nothing (docs 1-2 fill ctx0, doc 3 half-fills
    # ctx1) — crossings stay 0 and waste is 4. At ctx=5 doc 2 (offset
    # 4) crosses the first boundary.
    from sensor_time_series_pyspark_spark.operators.ranking import (
        pack_offsets,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "l", 4), (2, "l", 4), (3, "l", 4)], ["doc_id", "lang", "n"]
    )
    off = pack_offsets(df, "doc_id", "n", budget=1, partition_by=["lang"])
    rows = {r["id"]: r["offset"] for r in off.collect()}
    assert rows == {1: 0, 2: 4, 3: 8}

    def frags(offset, n, ctx):
        return (offset + n - 1) // ctx - offset // ctx + 1

    assert [frags(rows[d], 4, 4) for d in (1, 2, 3)] == [1, 1, 1]
    assert [frags(rows[d], 4, 8) for d in (1, 2, 3)] == [1, 1, 1]
    assert [frags(rows[d], 4, 5) for d in (1, 2, 3)] == [1, 2, 2]


# ---- the q598/q599/q600 scale identities vs brute force ---------------
# The oracle gates certify Spark == DuckDB, but both sides use the SAME
# identity — these tests certify the identity itself against the O(n^2)
# definition on random integer vectors (exact arithmetic, no tolerance).

from hypothesis import given, settings, strategies as st  # noqa: E402

_vecs = st.lists(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=3,
             max_size=3),
    min_size=2,
    max_size=8,
)


@settings(max_examples=50, deadline=None)
@given(_vecs)
def test_sum_vector_identity_equals_pairwise_dots(vs):
    # sum over ordered pairs i != j of x_i . x_j == ||S||^2 - sum ||x||^2
    s = [sum(v[d] for v in vs) for d in range(3)]
    lhs = sum(
        sum(a * b for a, b in zip(vs[i], vs[j]))
        for i in range(len(vs))
        for j in range(len(vs))
        if i != j
    )
    rhs = sum(x * x for x in s) - sum(
        sum(x * x for x in v) for v in vs
    )
    assert lhs == rhs


@settings(max_examples=30, deadline=None)
@given(_vecs, _vecs)
def test_moment_matrix_identity_equals_pairwise_kernel(va, vb):
    # sum over (x in A, y in B) of (x.y)^2 == <M_A, M_B>_Frobenius
    def moments(vs):
        return [
            [sum(v[a] * v[b] for v in vs) for b in range(3)]
            for a in range(3)
        ]

    lhs = sum(
        sum(x * y for x, y in zip(a, b)) ** 2 for a in va for b in vb
    )
    ma, mb = moments(va), moments(vb)
    rhs = sum(ma[i][j] * mb[i][j] for i in range(3) for j in range(3))
    assert lhs == rhs


def test_waterfill_sql_twin_matches_on_capped_distribution(spark):
    """The q593 oracle gate runs on the roughly-uniform corpus, where
    nobody caps — this differential exercises the CAPPED branch of the
    SQL twin against the operator on a skewed token distribution
    (tiny sources hit 2 epochs, the freed budget waterfills up)."""
    import duckdb

    from sensor_time_series_pyspark_spark.queries.registry import ORACLE_SQL

    rows = [
        ("s_tiny", "w"),                      # 1 token  -> capped
        ("s_small", " ".join(["w"] * 5)),     # 5 tokens -> capped
        ("s_big", " ".join(["w"] * 100)),     # 100 tokens
        ("s_big2", " ".join(["w"] * 60)),     # 60 tokens
    ]
    sdf = spark.createDataFrame(rows, ["source", "text"])
    from sensor_time_series_pyspark_spark.functions.text import token_count
    from pyspark.sql import functions as F

    per = sdf.select(
        "source", token_count("text").cast("bigint").alias("n_tok")
    )
    got = {
        r["source"]: r
        for r in waterfill_allocation(
            per, ["source"], "n_tok", budget_frac=0.5, max_epochs=2.0
        ).collect()
    }

    con = duckdb.connect()
    import pandas as pd

    con.register(
        "documents", pd.DataFrame(rows, columns=["source", "text"])
    )
    exp = {
        r[0]: r
        for r in con.execute(
            ORACLE_SQL["q593_waterfill_mixture"]
        ).fetchall()
    }
    # oracle columns: source, tokens, capacity, waterline, allocation,
    # epochs, capped
    assert set(exp) == set(got)
    for s in exp:
        e, g = exp[s], got[s]
        assert g["tokens"] == e[1]
        assert g["capacity"] == e[2]
        assert (g["waterline"] is None) == (e[3] is None)
        if e[3] is not None:
            assert math.isclose(g["waterline"], e[3], rel_tol=0, abs_tol=0)
        assert math.isclose(g["allocation"], e[4], rel_tol=0, abs_tol=0)
        assert math.isclose(g["epochs"], e[5], rel_tol=0, abs_tol=0)
        assert g["capped"] == e[6]
    # and the interesting branch really fired:
    assert got["s_tiny"]["capped"] and got["s_small"]["capped"]
    assert not got["s_big"]["capped"]


# ---- segment_dup_stats vs brute force on random corpora ----------------

_corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=0, max_size=9
    ).map(" ".join),
    min_size=2,
    max_size=6,
)


@settings(max_examples=20, deadline=None)
@given(_corpus)
def _segment_dup_bruteforce_case(texts):
    # brute force: chop each doc into disjoint 3-token segments, a
    # segment is dup iff its text appears in >= 2 distinct docs
    from collections import defaultdict

    spark = _segment_dup_bruteforce_case._spark
    seg_docs = defaultdict(set)
    chopped = {}
    for i, t in enumerate(texts):
        toks = t.split()
        segs = [
            " ".join(toks[s : s + 3]) for s in range(0, len(toks), 3)
        ]
        chopped[i] = (toks, segs)
        for s in segs:
            seg_docs[s].add(i)
    want = {}
    for i in chopped:
        toks, segs = chopped[i]
        if not toks:
            # empty docs: zeroed row, never dropped (round-10 contract)
            want[i] = (0, 0, 0, 0)
            continue
        dup = [s for s in segs if len(seg_docs[s]) >= 2]
        want[i] = (
            len(toks),
            len(segs),
            len(dup),
            sum(len(s.split()) for s in dup),
        )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["id"]: (r["n_tok"], r["n_seg"], r["dup_seg"], r["dup_tok"])
        for r in segment_dup_stats(
            df, "doc_id", "text", seg_tokens=3
        ).collect()
    }
    assert got == want


def test_segment_dup_bruteforce_binding(spark):
    # hypothesis can't take the session fixture directly; bind it once
    _segment_dup_bruteforce_case._spark = spark
    _segment_dup_bruteforce_case()


def test_packing_sweep_oracle_ignores_empty_docs():
    """Round-9 review fix: zero-token docs made Spark's floor and
    DuckDB's integer division diverge on (offset + n - 1). Both sides
    now exclude them from the fragment accounting; pin the SQL twin —
    a corpus with interleaved empty docs must produce EXACTLY the
    table of the same corpus without them (empty docs shift no
    offsets)."""
    import duckdb
    import pandas as pd

    from sensor_time_series_pyspark_spark.queries.registry import ORACLE_SQL

    full = [
        (0, "en", " ".join(["w"] * 7)),
        (1, "en", ""),                      # empty — must not count
        (2, "en", " ".join(["w"] * 130)),
        (3, "de", "   "),                   # whitespace-only — ditto
        (4, "de", " ".join(["w"] * 512)),
    ]
    clean = [r for r in full if r[2].split()]
    out = []
    for rows in (full, clean):
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(rows, columns=["doc_id", "lang", "text"]),
        )
        out.append(
            sorted(
                map(tuple, con.execute(
                    ORACLE_SQL["q597_packing_ctx_sweep"]
                ).fetchall())
            )
        )
    assert out[0] == out[1]
    # and the non-empty docs are all accounted for
    per = {(r[0], r[1]): r for r in out[0]}
    assert per[("en", 128)][2] == 2  # n_docs counts only non-empty


# ---- round-10 ADVICE fixes ---------------------------------------------


def test_segment_dup_stats_keeps_empty_docs_with_zeros(spark):
    # a zero-token document must come back as a zeroed row, not vanish
    # (n_docs built on this frame has to reconcile with q591/q601)
    rows = [
        (1, "s1", "a b c d e f"),
        (2, "s1", "a b c d x y"),
        (3, "s1", ""),
        (4, "s2", "   "),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        r["id"]: r
        for r in segment_dup_stats(
            df, "doc_id", "text", carry_cols=["source"], seg_tokens=4
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    for empty_id, src in [(3, "s1"), (4, "s2")]:
        r = out[empty_id]
        assert r["source"] == src
        assert r["n_tok"] == 0 and r["n_seg"] == 0
        assert r["dup_seg"] == 0 and r["dup_tok"] == 0


def test_waterfill_zero_token_group_epochs_pinned(spark):
    # a 0-token group: capacity = allocation = 0 and epochs must be an
    # explicit 0.0, never the silent NULL of double 0/0; it sits at
    # capacity so capped=true, and it must not disturb the others'
    # waterline (a zero post never moves the line)
    out = _waterfill(spark, {"a": 0, "b": 25, "c": 30, "d": 35}, 1.0, 2.0)
    z = out["a"]
    assert z["capacity"] == 0.0 and z["allocation"] == 0.0
    assert z["epochs"] == 0.0 and z["epochs"] is not None
    assert z["capped"]
    for g in "bcd":
        assert math.isclose(out[g]["allocation"], 30.0)
        assert not out[g]["capped"]
