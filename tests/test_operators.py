"""Operator unit + property tests on tiny constructed frames
(SURVEY.md §5 strategy #2/#3: golden semantics + algebraic laws)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators import (
    asof_join,
    ffill,
    impute_defaults,
    interpolate_linear,
    lead_target,
    pivot_wide,
    sessionize,
    unpivot,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def long_df(spark):
    rows = [
        (1, ts("2020-01-01T00:00:00"), "H2S", 1.0),
        (1, ts("2020-01-01T00:00:00"), "O2", 20.9),
        (1, ts("2020-01-01T00:30:00"), "H2S", 2.0),
        (2, ts("2020-01-01T00:00:00"), "CO", 5.0),
        (2, ts("2020-01-01T00:00:00"), "H2S", None),
    ]
    return spark.createDataFrame(rows, "terminal int, dt timestamp, gas string, reading double")


def test_pivot_wide_first(spark, long_df):
    wide = pivot_wide(
        long_df, keys=["terminal", "dt"], pivot_col="gas",
        pivot_values=["H2S", "O2", "CO"], value_col="reading",
        extra_aggs=[F.count(F.lit(1)).alias("n")],
    )
    rows = {(r["terminal"], str(r["dt"])): r for r in wide.collect()}
    r1 = rows[(1, "2020-01-01 00:00:00")]
    assert r1["H2S"] == 1.0 and r1["O2"] == 20.9 and r1["CO"] is None and r1["n"] == 2
    # first(ignorenulls): the NULL H2S reading doesn't clobber
    r2 = rows[(2, "2020-01-01 00:00:00")]
    assert r2["H2S"] is None and r2["CO"] == 5.0


def test_impute_defaults(spark, long_df):
    wide = pivot_wide(long_df, ["terminal", "dt"], "gas", ["H2S", "O2", "CO"], "reading")
    filled = impute_defaults(wide, {"H2S": 0.0, "CO": 0.0, "O2": 21.0})
    assert filled.where(F.col("H2S").isNull() | F.col("O2").isNull()).count() == 0


def test_pivot_unpivot_roundtrip(spark, long_df):
    """pivot∘unpivot ≈ identity on non-null cells (SURVEY §5 law)."""
    wide = pivot_wide(long_df, ["terminal", "dt"], "gas", ["H2S", "O2", "CO"], "reading")
    back = unpivot(wide, ["terminal", "dt"], ["H2S", "O2", "CO"], "gas", "reading")
    orig = {(r[0], r[1], r[2]): r[3] for r in long_df.dropna().collect()}
    got = {(r[0], r[1], r[2]): r[3] for r in back.dropna().collect()}
    assert got == orig


def test_ffill(spark):
    rows = [(1, 1, None), (1, 2, 5.0), (1, 3, None), (1, 4, None), (2, 1, None)]
    df = spark.createDataFrame(rows, "id int, t int, v double")
    out = ffill(df, ["v"], order_col="t", partition_by=["id"])
    got = {(r["id"], r["t"]): r["v"] for r in out.collect()}
    assert got == {(1, 1): None, (1, 2): 5.0, (1, 3): 5.0, (1, 4): 5.0, (2, 1): None}
    # idempotence
    again = ffill(out, ["v"], order_col="t", partition_by=["id"])
    assert {(r["id"], r["t"]): r["v"] for r in again.collect()} == got


def test_interpolate_linear(spark):
    rows = [
        (1, 0, 0.0), (1, 10, None), (1, 40, 4.0),   # gap: 0 → 4 over 40s
        (1, 50, None),                               # trailing → nearest
        (2, 0, None), (2, 10, 7.0),                  # leading → nearest
    ]
    df = spark.createDataFrame(rows, "id int, t int, v double").withColumn(
        "dt", F.timestamp_seconds("t")
    )
    out = interpolate_linear(df, "dt", "v", ["id"])
    got = {(r["id"], r["t"]): r["v"] for r in out.collect()}
    assert got[(1, 10)] == pytest.approx(1.0)  # 0 + 4*(10/40)
    assert got[(1, 0)] == 0.0 and got[(1, 40)] == 4.0  # endpoints exact
    assert got[(1, 50)] == 4.0
    assert got[(2, 0)] == 7.0


def test_lead_target(spark):
    rows = [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0)]
    df = spark.createDataFrame(rows, "id int, day int, v double")
    out = lead_target(df, "day", "v", ["id"], out_col="nxt")
    got = {(r["id"], r["day"]): r["nxt"] for r in out.collect()}
    # tails dropped: (1,3) and (2,1) have no next day
    assert got == {(1, 1): 20.0, (1, 2): 30.0}


def test_sessionize(spark):
    rows = [
        (1, 0), (1, 100), (1, 5000),   # gap > 1800s at 5000? no: 4900s > 1800 → new session
        (2, 0),
    ]
    df = spark.createDataFrame(rows, "id int, t int").withColumn(
        "dt", F.timestamp_seconds("t")
    )
    out = sessionize(df, "dt", ["id"], gap_seconds=1800)
    got = {(r["id"], r["t"]): r["session_seq"] for r in out.collect()}
    assert got == {(1, 0): 1, (1, 100): 1, (1, 5000): 2, (2, 0): 1}


def test_asof_join(spark):
    quotes = [(1, 0, 100.0), (1, 50, 105.0), (2, 10, 7.0)]
    trades = [(1, 25), (1, 50), (1, 75), (2, 5)]
    q = spark.createDataFrame(quotes, "id int, t int, px double").withColumn(
        "qt", F.timestamp_seconds("t")
    ).drop("t")
    tr = spark.createDataFrame(trades, "id int, t int").withColumn(
        "tt", F.timestamp_seconds("t")
    )
    out = asof_join(tr, q, on=["id"], left_ts="tt", right_ts="qt", value_cols=["px"])
    got = {(r["id"], r["t"]): r["px"] for r in out.collect()}
    # exact-timestamp right row IS visible (t=50 → 105)
    assert got == {(1, 25): 100.0, (1, 50): 105.0, (1, 75): 105.0, (2, 5): None}


def test_observe_metrics_no_extra_job(spark):
    """with_row_count piggybacks on the action (reference ran a full
    extra count() job per probe, sensor_data_etl.py:64,102)."""
    from sensor_time_series_pyspark_spark.functions.metrics import with_row_count
    from sensor_time_series_pyspark_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    df, obs = with_row_count(
        ev.where(F.col("value") > 50), "filtered",
        F.approx_count_distinct("user_id").alias("users"),
    )
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["count"] == ev.where(F.col("value") > 50).count()
    assert got["users"] > 0


def test_interval_join_matches_naive(spark):
    """Bucketed interval join == naive inequality join on a sample."""
    from sensor_time_series_pyspark_spark.operators import interval_join
    from sensor_time_series_pyspark_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    a = ev.select(F.col("event_id").alias("ida"), "user_id", "ts")
    b = ev.select(F.col("event_id").alias("idb"), "user_id", F.col("ts").alias("ts_b"))
    got = interval_join(a, b, ["user_id"], "ts", "ts_b", -900, 900)
    naive = a.join(b, "user_id").where(
        (F.col("ts_b").cast("double") >= F.col("ts").cast("double") - 900)
        & (F.col("ts_b").cast("double") <= F.col("ts").cast("double") + 900)
    )
    key = lambda df: sorted((r["ida"], r["idb"]) for r in df.collect())
    assert key(got) == key(naive)


def test_rolling_avg_trailing_window(spark):
    """Hand-checked trailing 60s mean with irregular sampling."""
    from datetime import datetime, timedelta
    from sensor_time_series_pyspark_spark.operators.windows import rolling_avg

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 10.0),
        (1, t0 + timedelta(seconds=30), 20.0),   # frame: 10,20
        (1, t0 + timedelta(seconds=90), 30.0),   # frame: 20,30 (10 aged out)
        (1, t0 + timedelta(seconds=300), 40.0),  # frame: 40 alone
    ]
    df = spark.createDataFrame(rows, "id int, ts timestamp, value double")
    got = [
        r["rolling_avg"]
        for r in rolling_avg(df, "ts", "value", ["id"], 60).orderBy("ts").collect()
    ]
    assert got == [10.0, 15.0, 25.0, 40.0]


def test_quarantine_and_observe_violations(spark):
    """quarantine splits exactly; observe_violations counts ride the
    action; NULL rule evaluations count as violations."""
    from sensor_time_series_pyspark_spark.operators import (
        observe_violations,
        quarantine,
        violation_counts,
    )

    rows = [(1, 5.0, "a"), (2, -1.0, "a"), (3, None, "b"), (4, 50.0, "zz")]
    df = spark.createDataFrame(rows, "id int, v double, tag string")
    rules = {
        "v_nonneg": F.col("v") >= 0,            # row 2 fails, row 3 NULL→fails
        "tag_known": F.col("tag").isin("a", "b"),
    }
    good, bad = quarantine(df, rules)
    assert {r["id"] for r in good.collect()} == {1}
    failed = {r["id"]: set(r["failed_rules"]) for r in bad.collect()}
    assert failed == {2: {"v_nonneg"}, 3: {"v_nonneg"}, 4: {"tag_known"}}

    counts = violation_counts(df, rules).first()
    assert counts["n_rows"] == 4 and counts["v_nonneg"] == 2 and counts["tag_known"] == 1

    observed, obs = observe_violations(df, rules)
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["v_nonneg"] == 2 and obs.get["tag_known"] == 1


def test_missing_buckets_exact_gaps(spark):
    from datetime import datetime

    from sensor_time_series_pyspark_spark.operators import missing_buckets

    rows = [
        # series A: observations in buckets 00:00, 01:00 — gap at 00:30
        ("A", datetime(2024, 1, 1, 0, 5)),
        ("A", datetime(2024, 1, 1, 1, 10)),
        # series B: contiguous buckets, no gap
        ("B", datetime(2024, 1, 1, 0, 1)),
        ("B", datetime(2024, 1, 1, 0, 31)),
        # series C: single bucket — no interior, no rows
        ("C", datetime(2024, 1, 1, 5, 0)),
    ]
    df = spark.createDataFrame(rows, "sensor string, ts timestamp")
    got = {
        (r.sensor, r.bucket.isoformat())
        for r in missing_buckets(df, "ts", ["sensor"], 1800).collect()
    }
    assert got == {("A", "2024-01-01T00:30:00")}


def test_scd2_versions_and_collapse(spark):
    from datetime import datetime

    from sensor_time_series_pyspark_spark.operators import scd2

    rows = [
        # user 1: A, A (re-sent, must collapse), B, A
        (1, datetime(2024, 1, 1), "A"),
        (1, datetime(2024, 1, 2), "A"),
        (1, datetime(2024, 1, 3), "B"),
        (1, datetime(2024, 1, 4), "A"),
        # user 2: single state -> one open version
        (2, datetime(2024, 1, 1), "X"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, state string")
    got = sorted(
        (r.user_id, r.state, r.valid_from.day,
         r.valid_to.day if r.valid_to else None, r.is_current)
        for r in scd2(df, ["user_id"], "ts", ["state"]).collect()
    )
    assert got == [
        (1, "A", 1, 3, False),
        (1, "A", 4, None, True),
        (1, "B", 3, 4, False),
        (2, "X", 1, None, True),
    ]


def test_approx_ntile_near_equal_buckets(spark):
    """approx_ntile (the parallel q55-scale-note alternative): bucket
    sizes within 5% of n/k, ordering consistent with values."""
    from sensor_time_series_pyspark_spark.operators import approx_ntile
    from sensor_time_series_pyspark_spark.sources.readers import read_table

    ev = read_table(spark, "/root/testdata/sf0.01", "events")
    out = approx_ntile(ev, "value", 4, by=["event_type"])
    sizes = (
        out.groupBy("event_type", "bucket").count().collect()
    )
    from collections import defaultdict

    per_group = defaultdict(dict)
    for r in sizes:
        per_group[r.event_type][r.bucket] = r["count"]
    for et, buckets in per_group.items():
        assert set(buckets) == {1, 2, 3, 4}
        total = sum(buckets.values())
        for b, c in buckets.items():
            assert abs(c - total / 4) <= 0.05 * total + 1, (et, b, c, total)
    # ordering: max(value) in bucket i <= min(value) in bucket i+1 per group
    from pyspark.sql import functions as F

    stats = {
        (r.event_type, r.bucket): (r.lo, r.hi)
        for r in out.groupBy("event_type", "bucket")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for (et, b), (_, hi) in stats.items():
        nxt = stats.get((et, b + 1))
        if nxt:
            assert hi <= nxt[0] + 1e-9


def test_profile_single_pass_metrics(spark):
    from sensor_time_series_pyspark_spark.operators import profile
    from sensor_time_series_pyspark_spark.sources.readers import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    got = {r.column: r for r in profile(ev).collect()}
    assert set(got) == set(ev.columns)
    n = ev.count()
    assert all(r.n_rows == n for r in got.values())
    # event_type: 5 known values, no nulls
    et = got["event_type"]
    assert et.n_null == 0 and abs(et.approx_distinct - 5) <= 1
    assert et.min == "click" and et.max == "view"
    # profile of a complex column must not blow up
    from pyspark.sql import functions as F

    witharr = ev.withColumn("arr", F.array("value", "value"))
    prof = {r.column: r for r in profile(witharr, ["arr", "value"]).collect()}
    assert prof["arr"].min is None and prof["arr"].approx_distinct > 0


def test_histogram_partition_and_bounds(spark):
    """Equi-width histogram: bin counts sum to non-null rows, bounds
    tile [min, max], max value lands in the last bin."""
    from pyspark.sql import functions as F

    from sensor_time_series_pyspark_spark.operators import histogram
    from sensor_time_series_pyspark_spark.sources.readers import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    out = histogram(ev, "value", n_bins=8, by=["event_type"]).collect()
    base = {
        r.event_type: r
        for r in ev.where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    per_group: dict[str, int] = {}
    for r in out:
        assert 0 <= r.bin < 8
        per_group[r.event_type] = per_group.get(r.event_type, 0) + r.n
        b = base[r.event_type]
        assert b.lo - 1e-9 <= r.bin_lo <= r.bin_hi <= b.hi + 1e-9
    assert per_group == {k: v.n for k, v in base.items()}
    # global (no keys) variant partitions everything
    g = histogram(ev, "value", n_bins=4).collect()
    assert sum(r.n for r in g) == sum(v.n for v in base.values())


def test_exact_corr_matches_builtin(spark):
    """exact_corr tracks F.corr to float tolerance (the builtin is
    order-dependent in its low bits — that's WHY exact_corr exists)."""
    from pyspark.sql import functions as F

    from sensor_time_series_pyspark_spark.operators import exact_corr
    from sensor_time_series_pyspark_spark.sources.readers import read_table

    li = read_table(spark, "/root/testdata/sf0.001", "lineitem")
    got = {
        r.l_returnflag: r.corr
        for r in exact_corr(
            li, "l_quantity", "l_extendedprice", by=["l_returnflag"]
        ).collect()
    }
    ref = {
        r.l_returnflag: r.c
        for r in li.groupBy("l_returnflag")
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
        .collect()
    }
    assert set(got) == set(ref)
    for k in got:
        assert abs(got[k] - ref[k]) < 1e-9
    # degenerate group -> NULL corr, not a crash
    one = li.limit(1)
    row = exact_corr(one, "l_quantity", "l_extendedprice").collect()[0]
    assert row.corr is None


def test_levenshtein_pairs_equals_bruteforce(spark):
    """Banded candidate generation loses no pairs vs the O(n²) join."""
    from pyspark.sql import functions as F

    from sensor_time_series_pyspark_spark.operators import levenshtein_pairs
    from sensor_time_series_pyspark_spark.sources.readers import read_table

    p = read_table(spark, "/root/testdata/sf0.001", "part")
    types = p.select(F.col("p_type").alias("name")).distinct()
    got = {
        (r.id_a, r.id_b): r.dist
        for r in levenshtein_pairs(types, "name", "name", max_dist=6).collect()
    }
    a = types.select(F.col("name").alias("na"))
    b = types.select(F.col("name").alias("nb"))
    brute = {
        (r.na, r.nb): r.d
        for r in a.crossJoin(b)
        .where(F.col("na") < F.col("nb"))
        .withColumn("d", F.levenshtein("na", "nb"))
        .where(F.col("d") <= 6)
        .collect()
    }
    assert got == brute
    assert got  # non-empty on the part-type vocabulary


def test_run_expectations_single_pass_and_failures(spark):
    """operators/expectations.py: the audit must flag the failing
    checks (not just pass everything), and the whole suite must plan
    exactly ONE aggregate over the input (one conditional pass,
    however many expectations)."""
    from pyspark.sql import functions as F

    from sensor_time_series_pyspark_spark.operators import (
        accepted_values,
        between,
        monotonic_id,
        not_null,
        row_count_between,
        run_expectations,
        unique,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (2, "zz", 500.0)],
        "id int, cat string, x double",
    )
    suite = [
        row_count_between("rows", 1, 10),
        not_null("x_nn", "x", 0.0),
        unique("id_uniq", "id"),
        accepted_values("cat_dom", "cat", ("a", "b")),
        between("x_rng", "x", 0.0, 100.0, 0.0),
        monotonic_id("id_span", "id"),
    ]
    got = {r["name"]: r for r in run_expectations(df, suite).collect()}
    assert got["rows"]["passed"] is True
    assert got["x_nn"]["passed"] is False  # one null of three
    assert got["id_uniq"]["passed"] is False  # id=2 twice
    assert got["cat_dom"]["passed"] is False  # 'zz'
    assert got["x_rng"]["passed"] is False  # 500 > 100
    assert got["id_span"]["passed"] is False  # span 2 < 3 rows
    # one PASS over the input: the distinct-count expectation expands
    # to the standard two-phase distinct aggregate (4 HashAggregate
    # nodes), but the source is still scanned exactly once
    plan = run_expectations(df, suite)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1, plan[:2000]
    assert plan.count("HashAggregate") <= 4, plan[:2000]
