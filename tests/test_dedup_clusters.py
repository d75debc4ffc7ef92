"""connected_components / dedup_clusters (operators/dedup.py) and the
approx_count_distinct sketch gate (q57)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators import (
    connected_components,
    dedup_clusters,
    jaccard_pairs,
)
from sensor_time_series_pyspark_spark.sources.readers import read_table


def _cc_map(df):
    return {r.node: r.component for r in df.collect()}


def test_cc_chain_and_island(spark):
    # chain 1-2-3 plus island 4-5: two components, min-id labels
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    got = _cc_map(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_cc_direction_and_duplicates_irrelevant(spark):
    # reversed edges and duplicate pairs change nothing
    edges = spark.createDataFrame(
        [(9, 4), (4, 9), (9, 4), (7, 9)], "id_a long, id_b long"
    )
    got = _cc_map(connected_components(edges))
    assert got == {4: 4, 7: 4, 9: 4}


def test_cc_long_chain_converges(spark):
    # a 12-node path needs ~diameter rounds — exercises the iteration loop
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "id_a long, id_b long"
    )
    got = _cc_map(connected_components(edges))
    assert set(got.values()) == {100}
    assert len(got) == 13


def test_cc_non_convergence_raises(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=0)


def test_dedup_clusters_matches_pair_transitivity(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", threshold=0.2, shingle_k=3)
    clusters = dedup_clusters(pairs)
    pair_rows = pairs.select("id_a", "id_b").collect()
    got = {r.doc_id: r.cluster_id for r in clusters.collect()}
    # every paired doc is clustered, pair members share a cluster,
    # and each cluster is named by its own lowest member
    for r in pair_rows:
        assert got[r.id_a] == got[r.id_b]
    assert set(got) == {x for r in pair_rows for x in (r.id_a, r.id_b)}
    for doc, cl in got.items():
        assert cl <= doc
        assert got[cl] == cl


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    both = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx"),
            F.count_distinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert both
    for r in both:
        assert abs(r.approx - r.exact) <= max(1, 0.05 * r.exact)


@pytest.mark.parametrize("threshold", [0.2, 0.5, 0.8])
def test_prefix_filter_equals_inverted_index(spark, sf_dir, threshold):
    """jaccard_pairs_prefix (PPJoin prefix filtering) is exact: same
    pairs and scores as the full inverted-index strategy."""
    from sensor_time_series_pyspark_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )

    docs = read_table(spark, sf_dir, "documents")
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(
            docs, "doc_id", "text", threshold=threshold, shingle_k=3
        ).collect()
    }
    pref = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs_prefix(
            docs, "doc_id", "text", threshold=threshold, shingle_k=3
        ).collect()
    }
    assert set(full) == set(pref)
    for k in full:
        assert abs(full[k] - pref[k]) < 1e-12


def test_prefix_filter_char_unit_parity(spark, sf_dir):
    """unit='char' (5-gram) prefix filtering matches the inverted-index
    strategy pair-for-pair — the q45 workload shape."""
    from sensor_time_series_pyspark_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )

    docs = read_table(spark, sf_dir, "documents")
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(
            docs, "doc_id", "text", threshold=0.35, shingle_k=5, unit="char"
        ).collect()
    }
    pref = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs_prefix(
            docs, "doc_id", "text", threshold=0.35, shingle_k=5, unit="char"
        ).collect()
    }
    assert set(full) == set(pref)
    for k in full:
        assert abs(full[k] - pref[k]) < 1e-12


def test_star_cc_equals_naive_on_random_graphs(spark):
    import random

    from sensor_time_series_pyspark_spark.operators import (
        connected_components,
        connected_components_star,
    )

    rnd = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rnd.randrange(n), rnd.randrange(n)) for _ in range(40 + trial * 20)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        naive = {
            (r["node"], r["component"])
            for r in connected_components(df).collect()
        }
        star = {
            (r["node"], r["component"])
            for r in connected_components_star(df).collect()
        }
        assert star == naive


def test_star_cc_handles_long_chain_fast(spark):
    """A 200-node chain has diameter 199 — min-label propagation needs
    ~200 rounds (our naive impl caps at 25 and would raise); star
    converges in O(log n)."""
    from sensor_time_series_pyspark_spark.operators import connected_components_star

    chain = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    out = connected_components_star(df, max_iter=15).collect()
    assert len(out) == 201
    assert {r["component"] for r in out} == {0}
