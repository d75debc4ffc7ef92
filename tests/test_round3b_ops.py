"""Round-3 batch-2 operators: BFS hops, bfill, frame sampling, and the
new query-level building blocks (funnel, BPE pairs, centroid cosine)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# ------------------------------------------------------------------ BFS hops
def test_bfs_hops_path_graph(spark):
    from sensor_time_series_pyspark_spark.operators import bfs_hops

    # path 1-2-3-4-5, seed at 1: hops = position - 1, capped by max_hops
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is beyond max_hops


def test_bfs_hops_multi_source_and_directed(spark):
    from sensor_time_series_pyspark_spark.operators import bfs_hops

    edges = spark.createDataFrame([(1, 2), (3, 2), (2, 4)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (3,)], "node long")
    # undirected: both seeds at 0, node 2 at 1, node 4 at 2
    und = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=4).collect()}
    assert und == {1: 0, 3: 0, 2: 1, 4: 2}
    # directed: same result here since edges point seed→2→4
    dr = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, seeds, max_hops=4, directed=True).collect()
    }
    assert dr == {1: 0, 3: 0, 2: 1, 4: 2}
    # directed from node 2: cannot reach 1 or 3 (edges point in)
    s2 = spark.createDataFrame([(2,)], "node long")
    d2 = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, s2, max_hops=4, directed=True).collect()
    }
    assert d2 == {2: 0, 4: 1}


def test_bfs_hops_takes_shortest(spark):
    from sensor_time_series_pyspark_spark.operators import bfs_hops

    # two routes to node 4: 1-2-4 (2 hops) and 1-3-5-4 (3 hops)
    edges = spark.createDataFrame(
        [(1, 2), (2, 4), (1, 3), (3, 5), (5, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=5).collect()}
    assert out[4] == 2


# -------------------------------------------------------------------- bfill
def test_bfill_mirrors_ffill(spark):
    from sensor_time_series_pyspark_spark.operators import bfill, ffill

    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 3, None), ("a", 4, 7.0), ("a", 5, None)],
        "g string, t long, v double",
    )
    b = {r["t"]: r["v"] for r in bfill(df, ["v"], "t", ["g"]).collect()}
    assert b == {1: 5.0, 2: 5.0, 3: 7.0, 4: 7.0, 5: None}
    f = {r["t"]: r["v"] for r in ffill(df, ["v"], "t", ["g"]).collect()}
    assert f == {1: None, 2: 5.0, 3: 5.0, 4: 7.0, 5: 7.0}


# ---------------------------------------------------------- frame byte stats
def test_frame_byte_stats_slicing(spark):
    from sensor_time_series_pyspark_spark.operators import frame_byte_stats

    payload = bytes(range(40))  # 40 bytes → frames at 0, 16, 32
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, blob binary")
    rows = {
        r["frame_number"]: r
        for r in frame_byte_stats(
            df, "blob", ["id"], frame_len=12, stride=16, max_frames=8
        ).collect()
    }
    assert set(rows) == {0, 16, 32}
    assert rows[0]["f_bytes"] == 12 and rows[0]["byte_sum"] == sum(range(12))
    assert rows[16]["first_byte"] == 16
    # tail frame is short: bytes 32..39
    assert rows[32]["f_bytes"] == 8 and rows[32]["byte_sum"] == sum(range(32, 40))


def test_frame_byte_stats_max_frames_cap(spark):
    from sensor_time_series_pyspark_spark.operators import frame_byte_stats

    df = spark.createDataFrame(
        [(1, bytearray(bytes(1000)))], "id long, blob binary"
    )
    out = frame_byte_stats(
        df, "blob", ["id"], frame_len=4, stride=8, max_frames=3
    ).collect()
    assert len(out) == 3 and {r["frame_number"] for r in out} == {0, 8, 16}


# ---------------------------------------------------------- tfidf cosine
def test_tfidf_cosine_pairs_reference(spark):
    """Exact-decimal TF-IDF cosine matches a numpy reference built with
    the same no-log idf, within float epilogue tolerance."""
    import numpy as np

    from sensor_time_series_pyspark_spark.operators import tfidf_cosine_pairs

    docs = [
        (1, "spark query engine"),
        (2, "spark query engine"),          # exact same bag → cosine 1
        (3, "spark streaming engine fast"),
        (4, "completely different words here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }
    # numpy reference
    from collections import Counter

    bags = {i: Counter(t.split()) for i, t in docs}
    vocab = sorted({w for b in bags.values() for w in b})
    dfreq = {w: sum(w in b for b in bags.values()) for w in vocab}
    n = len(bags)
    idf = {w: round((n - dfreq[w] + 0.5) / (dfreq[w] + 0.5), 6) for w in vocab}
    vecs = {
        i: np.array([b.get(w, 0) * idf[w] for w in vocab]) for i, b in bags.items()
    }
    for (a, b), c in got.items():
        va, vb = vecs[a], vecs[b]
        want = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert abs(c - want) < 1e-9, (a, b, c, want)
    assert abs(got[(1, 2)] - 1.0) < 1e-12
    # doc 4 shares no term with 1: pair absent (dot would be 0)
    assert (1, 4) not in got


def test_tfidf_cosine_pairs_df_valve(spark):
    from sensor_time_series_pyspark_spark.operators import tfidf_cosine_pairs

    # 'the' appears in all docs; with max_token_df=2 it is pruned, so
    # docs sharing ONLY 'the' produce no candidate pair at all
    docs = [
        (1, "the alpha beta"),
        (2, "the alpha beta"),
        (3, "the gamma delta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in tfidf_cosine_pairs(
            df, "doc_id", "text", threshold=0.0, max_token_df=2
        ).collect()
    }
    assert got == {(1, 2)}


# ---------------------------------------------------------- strict funnel
def test_funnel_strict_per_step_deadlines(spark):
    from datetime import datetime

    from sensor_time_series_pyspark_spark.operators import funnel_strict

    t = lambda m: datetime(2026, 1, 1, m // 60, m % 60)  # noqa: E731
    rows = [
        # u1: view@0 → click@30 (in window) → purchase@50 (in window of click)
        (1, t(0), "view"), (1, t(30), "click"), (1, t(50), "purchase"),
        # u2: view@0, click@90 — misses the 1h step window → no chain
        (2, t(0), "view"), (2, t(90), "click"),
        # u3: purchase BEFORE click never counts; earliest chain only
        (3, t(0), "view"), (3, t(10), "purchase"), (3, t(20), "click"),
        (3, t(40), "purchase"),
        # u4: no view at all → absent from output
        (4, t(5), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r["user"]: r
        for r in funnel_strict(
            df, "user_id", "ts",
            steps=[
                ("view", F.col("event_type") == "view"),
                ("click", F.col("event_type") == "click"),
                ("purchase", F.col("event_type") == "purchase"),
            ],
            step_within_seconds=3600,
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["t_purchase"] == t(50)
    assert out[2]["t_click"] is None and out[2]["t_purchase"] is None
    # u3: click@20, then earliest purchase after the click = @40
    assert out[3]["t_click"] == t(20) and out[3]["t_purchase"] == t(40)


def test_funnel_strict_deadline_is_per_step_not_overall(spark):
    from datetime import datetime

    from sensor_time_series_pyspark_spark.operators import funnel_strict

    # chain spans 100 min total but each step gap is < 60 min — strict
    # per-step windows accept it (an overall-60min funnel would not)
    t = lambda m: datetime(2026, 1, 1, 0, 0) if m == 0 else datetime(
        2026, 1, 1, m // 60, m % 60
    )  # noqa: E731
    rows = [(1, t(0), "view"), (1, t(55), "click"), (1, t(100), "purchase")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = funnel_strict(
        df, "user_id", "ts",
        steps=[
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
        step_within_seconds=3600,
    ).collect()[0]
    assert out["t_purchase"] == t(100)
