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
