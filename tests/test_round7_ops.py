"""Invariant tests for the round-7 queries (q542-q559) beyond their
oracle hash gates: each pins the SEMANTIC property the query claims,
not just cross-engine equality."""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.01"


def _queries():
    import __spark_entry__ as m

    return m.queries()


def test_q542_kmv_within_theoretical_error(spark):
    """KMV relative standard error is ~1/sqrt(k-2) (k=64 -> 12.7%);
    assert every estimate within 3 sigma, and exactness below k."""
    rows = _queries()["q542_kmv_distinct"](spark, SF).collect()
    rse = 1.0 / math.sqrt(64 - 2)
    for r in rows:
        if r["n_exact"] < 64:
            assert r["est_kmv"] == float(r["n_exact"])
            assert r["kth_hash"] is None
        else:
            assert r["rel_err"] <= 3 * rse, (r["event_type"], r["rel_err"])


def test_q543_hrw_only_moves_to_new_shard(spark):
    """The rendezvous-hash guarantee: growing 12 -> 13 shards, a key
    either keeps its shard or moves to shard 12 — never between old
    shards. Moved mass should be ~1/13 of keys."""
    rows = _queries()["q543_rendezvous_shards"](spark, SF).collect()
    total = sum(r["n_keys"] for r in rows)
    moved = 0
    for r in rows:
        if r["shard_12"] != r["shard_13"]:
            assert r["shard_13"] == 12, r
            moved += r["n_keys"]
    assert 0 < moved / total < 2.5 / 13, (moved, total)


def test_q545_dsir_plan_realization_consistent(spark):
    """The hash realization must track the plan: kept <= population,
    full-keep buckets (p=1) keep everything, and the overall kept
    fraction lands near the planned mass."""
    rows = _queries()["q545_dsir_reweight"](spark, SF).collect()
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"], r
        if r["p_keep"] == 1.0:
            assert r["n_kept"] == r["n_docs"], r
    planned = sum(r["p_keep"] * r["n_docs"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    assert abs(kept - planned) / planned < 0.25, (kept, planned)


def test_q547_matryoshka_monotone_on_average(spark):
    """More dims -> no worse average top-5 overlap (per-query noise is
    allowed; the MEAN over the 10 queries must be monotone), and
    dim-32 must beat chance decisively (synthetic embeddings are NOT
    importance-ordered like real MRL vectors, so the absolute overlap
    is modest: measured 1.67/5 at sf0.01 vs ~0.05 expected under
    random top-5 selection from 500 candidates)."""
    rows = _queries()["q547_matryoshka_overlap"](spark, SF).collect()
    by_dim: dict[int, list[int]] = {8: [], 16: [], 32: []}
    for r in rows:
        by_dim[r["dim"]].append(r["n_overlap"])
    mean = {d: (sum(v) / max(len(v), 1)) for d, v in by_dim.items()}
    assert mean[8] <= mean[16] + 1e-9 and mean[16] <= mean[32] + 1e-9, mean
    assert mean[32] >= 1.0, mean


def test_q555_lsh_precision_is_exactly_one(spark):
    """minhash_pairs verifies candidates against exact Jaccard, so
    every LSH pair IS a truth pair: n_common == n_lsh, recall in
    (0, 1], and the 16/8 banding should catch most of the truth."""
    r = _queries()["q555_lsh_recall_audit"](spark, SF).collect()[0]
    assert r["n_common"] == r["n_lsh"], r
    assert 0.5 <= r["recall"] <= 1.0, r


def test_q556_obf_boundaries_decrease(spark):
    rows = sorted(
        _queries()["q556_group_sequential"](spark, SF).collect(),
        key=lambda r: r["look"],
    )
    assert [r["day_cut"] for r in rows] == [10, 20, 30]
    bounds = [r["boundary"] for r in rows]
    assert bounds == sorted(bounds, reverse=True)
    for r in rows:
        assert r["crossed"] == (abs(r["z"]) > r["boundary"])


def test_q557_retention_starts_at_one(spark):
    """Offset-0 retention is 1.0 by construction (every cohort member
    is active in their first week) and all cells are in (0, 1]."""
    rows = _queries()["q557_retention_triangle"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["retention"] <= 1.0, r
        if r["week_offset"] == 0:
            assert r["retention"] == 1.0, r


def test_q558_policy_is_prior_day_greedy(spark):
    """Replay discipline: the policy for day d must be computable from
    days < d only — recompute it in the test from the raw daily
    reduction and compare arm-for-arm."""
    from pyspark.sql import functions as F

    from sensor_time_series_pyspark_spark.sources.readers import read_table

    got = {
        r["day"]: r["policy_arm"]
        for r in _queries()["q558_bandit_replay"](spark, SF).collect()
    }
    daily = (
        read_table(spark, SF, "events")
        .groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
            ).alias("s"),
        )
        .collect()
    )
    days = sorted({r["d"] for r in daily})
    cum: dict[str, list[int]] = {}
    for d in days[1:]:
        hist: dict[str, tuple[int, int]] = {}
        for r in daily:
            if r["d"] < d:
                n, s = hist.get(r["event_type"], (0, 0))
                hist[r["event_type"]] = (n + r["n"], s + r["s"])
        best_mean = max(s / n for n, s in hist.values() if n > 0)
        # min arm among ties on the mean (the query's tie rule)
        want = min(
            a for a, (n, s) in hist.items() if n > 0 and s / n == best_mean
        )
        assert got[d] == want, (d, got[d], want)


def test_q559_shares_exceed_thresholds(spark):
    rows = _queries()["q559_hierarchical_heavy"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["share"] > 0.05 - 1e-12, r
        if r["level"] == "nation":
            assert r["key2"] is None
        else:
            assert r["key2"] is not None


def test_q553_bloom_no_false_negatives(spark):
    """Self-check of the audit's premise: every MEMBER key must hit
    all k positions (Bloom filters never false-negative) — rebuild
    the member probe in-test."""
    from pyspark.sql import functions as F

    from sensor_time_series_pyspark_spark.queries.corpus_sampling import _h48
    from sensor_time_series_pyspark_spark.sources.readers import read_table

    sup = read_table(spark, SF, "supplier").select(
        F.col("s_suppkey").alias("k")
    )
    pos = sup.withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.lit(2)))
    ).select(
        "k",
        "i",
        (
            _h48(
                F.concat(
                    F.lit("bf"),
                    F.col("i").cast("string"),
                    F.lit(":"),
                    F.col("k").cast("string"),
                ),
                "",
            )
            % 4096
        ).alias("pos"),
    )
    bloom = pos.select("pos").distinct()
    hits = (
        pos.join(bloom, "pos")
        .groupBy("k")
        .agg(F.count_distinct("i").alias("n_set"))
        .where(F.col("n_set") == 3)
        .count()
    )
    assert hits == sup.count()


def test_q567_shapley_efficiency_identity(spark):
    """Shapley values must satisfy efficiency: sum(phi) over channels
    equals v(all three) - v(none) — recomputed here from the raw
    8-cell bucket rates."""
    from pyspark.sql import functions as F

    from sensor_time_series_pyspark_spark.sources.readers import read_table

    phis = {
        r["channel"]: r["phi"]
        for r in _queries()["q567_shapley_attribution"](spark, SF).collect()
    }
    per_user = (
        read_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            *[
                F.max(
                    F.when(F.col("event_type") == t, 1).otherwise(0)
                ).alias(t)
                for t in ("view", "click", "signup", "purchase")
            ]
        )
    )
    cells = {
        (r["view"], r["click"], r["signup"]): (r["n"], r["k"])
        for r in per_user.groupBy("view", "click", "signup")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("purchase").alias("k")
        )
        .collect()
    }

    def v(cell):
        n, k = cells.get(cell, (0, 0))
        return (k / n) if n else 0.0

    want = v((1, 1, 1)) - v((0, 0, 0))
    got = phis["view"] + phis["click"] + phis["signup"]
    assert abs(got - want) < 1e-12, (got, want)


def test_q566_chain_ladder_factors_positive(spark):
    rows = _queries()["q566_chain_ladder"](spark, SF).collect()
    assert {r["age"] for r in rows} == {0, 1, 2}
    for r in rows:
        assert r["dev_factor"] > 1.0, r  # cumulative revenue grows


def test_q568_mediation_brackets(spark):
    r = _queries()["q568_mediation_effects"](spark, SF).collect()[0]
    # direct + mediated decompose the total: c = b_x + b_m * (Sxm/Sxx)
    # we only pin the coarse sanity here; exact algebra is oracle-gated
    assert r["c_total"] > 0
    assert 0.0 <= r["prop_mediated"] <= 1.5, r
