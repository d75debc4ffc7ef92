"""Behavioral analytics over event streams: ordered funnels and cohort
retention — the product-analytics layer a telemetry engine is expected
to serve (no reference analog; north-star surface).

Both are pure relational compositions: conditional aggregates + joins,
no windows over the whole table, no Python. Exact integer/timestamp
arithmetic end-to-end, so both queries are DuckDB-oracle-gated.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Sequence[tuple[str, Column]],
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel completion: for each step k, how many users
    performed step 1 → … → step k IN ORDER (each step strictly after
    the previous one's first qualifying event; optionally the whole
    journey within ``within_seconds`` of step 1).

    Semantics: t1 = first ts matching step 1; t_k = first ts matching
    step k with ts > t_{k-1} (the earliest-completion convention —
    deterministic, and monotone so later steps can only lose users).

    Plan shape: one conditional aggregate per step, each keyed on the
    user (k small — k shuffles on the same key; a co-partitioned
    exchange reuses the layout). Never a window over the raw stream.

    Output: one row per step — step_idx, step_name, n_users.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    user = F.col(user_col)
    ts = F.col(ts_col)

    name0, cond0 = steps[0]
    reached = df.where(cond0).groupBy(user_col).agg(F.min(ts_col).alias("t1"))
    counts = [(0, name0, reached)]
    prev = reached
    prev_t = "t1"
    for k, (name, cond) in enumerate(steps[1:], start=1):
        stepped = (
            df.where(cond)
            .join(prev, user_col)
            .where(ts > F.col(prev_t))
        )
        if within_seconds is not None:
            stepped = stepped.where(
                ts.cast("long") <= F.col("t1").cast("long") + within_seconds
            )
        cur_t = f"t{k + 1}"
        prev = stepped.groupBy(user_col).agg(
            F.min("t1").alias("t1"), F.min(ts_col).alias(cur_t)
        )
        counts.append((k, name, prev))
        prev_t = cur_t
    parts = [
        c.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step_idx"), F.lit(n).alias("step_name"), "n_users"
        )
        for i, n, c in counts
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    offsets: Sequence[int] = (1, 7),
) -> DataFrame:
    """Cohort retention: users are cohorted by their first active day;
    for each (cohort_day, offset) count how many were active again
    exactly ``offset`` days later, plus the cohort size.

    Two aggregates and one join: first-day per user (cohort), then
    distinct (user, day) activity joined back and bucketed by datediff.
    All integer/date arithmetic — oracle-exact.

    Output: cohort_day, day_offset, n_active, n_cohort.
    """
    day = F.to_date(ts_col)
    firsts = df.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    cohort_sizes = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    activity = df.select(user_col, day.alias("day")).distinct()
    offs = list(offsets)
    ret = (
        activity.join(firsts, user_col)
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
        .where(F.col("day_offset").isin(offs))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return ret.join(cohort_sizes, "cohort_day").select(
        "cohort_day", "day_offset", "n_active", "n_cohort"
    )


def transition_matrix(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order state-transition counts per entity stream — the
    Markov-chain view of an event log (session-flow analysis, UI-path
    mining, sensor-mode transitions).

    One window pass (lead over the entity partition — a single shuffle
    on the entity key) produces (state, next_state) bigrams; a hash
    aggregate counts them; the row-conditional share is integer counts
    with ONE division, so the output is engine-portable. Terminal
    events (no successor) are dropped, standard Markov estimation.

    Output: from_state, to_state, n, share (share of transitions out
    of from_state).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_from = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n",
        (
            F.col("n").cast("double") / F.sum("n").over(w_from).cast("double")
        ).alias("share"),
    )


def running_distinct(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
) -> DataFrame:
    """Cumulative distinct entities per day — the "unique users to
    date" growth curve, computed WITHOUT a quadratic distinct-per-day
    self-join: each entity contributes only its FIRST day (one hash
    aggregate on the entity key), daily first-seen counts are one more
    tiny aggregate, and the running sum is a window over the per-day
    frame (thousands of rows at most — the only single-partition step
    touches that small frame, never the fact table).

    Output: day, new_entities, cum_entities — days with no new
    entities are absent (join against a calendar grid to densify).
    """
    first_seen = df.groupBy(F.col(entity_col).alias("e")).agg(
        F.min(F.to_date(ts_col)).alias("day")
    )
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_entities")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_entities",
        F.sum("new_entities").over(w).alias("cum_entities"),
    )


def time_in_state(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Dwell-time per state — how long each entity stream spends in
    each state before the next transition (time-in-alarm, mode
    residency, page dwell). The sensor-fleet twin of
    transition_matrix: same single lead window (one shuffle on the
    entity key), but measuring elapsed time instead of counting hops.

    Durations are EXACT integer microseconds end-to-end (unix_micros
    diffs summed as longs); the mean is one double division of two
    exact integers, so the whole row is engine-portable. Terminal
    events (no successor) carry no duration, standard convention.

    Output: state, n_intervals, total_seconds (floor of the exact
    micros sum), mean_seconds.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    spans = (
        df.select(
            F.col(state_col).alias("state"),
            (
                F.lead(F.unix_micros(F.col(ts_col))).over(w)
                - F.unix_micros(F.col(ts_col))
            ).alias("__us"),
        )
        .where(F.col("__us").isNotNull())
    )
    agg = spans.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("__us").alias("__tot_us"),
    )
    return agg.select(
        "state",
        "n_intervals",
        # integer division: a double detour would lose exactness once the
        # micros sum passes 2^53 (≈104 days × 1000 series)
        F.expr("__tot_us div 1000000").alias("total_seconds"),
        (
            F.col("__tot_us").cast("double")
            / (F.col("n_intervals") * F.lit(1000000)).cast("double")
        ).alias("mean_seconds"),
    )


def ab_proportion_test(
    df: DataFrame,
    unit_col: str,
    arm_col: str,
    converted_col: str,
    arm_a: str = "a",
    arm_b: str = "b",
) -> DataFrame:
    """Two-proportion z-test over a per-unit frame (one row per
    experimental unit with its arm label and boolean outcome) — the
    experimentation readout every event platform ships.

    z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) with p̂ pooled.
    Every input is an exact integer count from ONE aggregate; the
    epilogue is a fixed sequence of correctly-rounded double ops, so
    the statistic is engine-portable (oracle-gated). No per-arm
    shuffle: a conditional aggregate computes both arms in one pass.

    Output: one row — n_a, n_b, conv_a, conv_b, p_a, p_b, z (NULL when
    either arm is empty or the pooled variance is zero).
    """
    is_a = F.col(arm_col) == arm_a
    is_b = F.col(arm_col) == arm_b
    conv = F.col(converted_col).cast("int")
    agg = df.agg(
        F.sum(is_a.cast("int")).alias("n_a"),
        F.sum(is_b.cast("int")).alias("n_b"),
        F.sum(F.when(is_a, conv).otherwise(0)).alias("conv_a"),
        F.sum(F.when(is_b, conv).otherwise(0)).alias("conv_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    p_a = F.col("conv_a").cast("double") / na
    p_b = F.col("conv_b").cast("double") / nb
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (se > 0), (p_a - p_b) / se
    )
    return agg.select(
        "n_a", "n_b", "conv_a", "conv_b",
        F.when(F.col("n_a") > 0, p_a).alias("p_a"),
        F.when(F.col("n_b") > 0, p_b).alias("p_b"),
        z.alias("z"),
    )


def market_basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Association-rule mining over item pairs: support, confidence,
    and lift for every unordered item pair co-occurring in at least
    ``min_pair_count`` baskets — the co-purchase / co-alarm screen.

    Shape: distinct (basket, item) → inverted self-join on the basket
    key with a < b (never a cross join; fan-out per basket is
    C(items, 2), bounded by basket width), one aggregate for pair
    counts, one for item counts, two broadcast-sized joins. All three
    metrics are exact integer counts with ONE division each —
    engine-portable.

    Output: item_a, item_b, n_pair, n_a, n_b, support, confidence
    (P(b|a)), lift.
    """
    bi = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    n_baskets = bi.select("basket").distinct().count()
    a, b = bi.alias("a"), bi.alias("b")
    pairs = (
        a.join(b, F.col("a.basket") == F.col("b.basket"))
        .where(F.col("a.item") < F.col("b.item"))
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_count)
    )
    items = bi.groupBy(F.col("item").alias("i")).agg(
        F.count(F.lit(1)).alias("n_i")
    )
    out = (
        pairs.join(
            items.select(F.col("i").alias("item_a"), F.col("n_i").alias("n_a")),
            "item_a",
        )
        .join(
            items.select(F.col("i").alias("item_b"), F.col("n_i").alias("n_b")),
            "item_b",
        )
    )
    nb = F.lit(int(n_baskets))
    return out.select(
        "item_a",
        "item_b",
        "n_pair",
        "n_a",
        "n_b",
        (F.col("n_pair").cast("double") / nb.cast("double")).alias("support"),
        (F.col("n_pair").cast("double") / F.col("n_a").cast("double")).alias(
            "confidence"
        ),
        (
            (nb * F.col("n_pair")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("lift"),
    )


def funnel_strict(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Sequence[tuple[str, Column]],
    step_within_seconds: int,
) -> DataFrame:
    """Windowed strict funnel: the user's EARLIEST step-1 event, then
    for each later step the earliest qualifying event STRICTLY after
    the previous step's time and within ``step_within_seconds`` of it —
    per-step deadlines, unlike ``funnel``'s single overall window.
    Greedy earliest-chain semantics (the deterministic standard).

    Shape: one filtered aggregate for step 1, then per step ONE
    user-keyed left join + min aggregate — the funnel state frame stays
    user-cardinality; the event stream is scanned once per step with
    the step predicate pushed into the scan. A user who misses step k
    carries NULLs for every later step (the join condition can never
    match against a NULL previous time).

    Output: user, t_<step1>, …, t_<stepN> (NULL = not reached).
    """
    name0, cond0 = steps[0]
    cur = (
        df.where(cond0)
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias(f"t_{name0}"))
    )
    prev = f"t_{name0}"
    for name, cond in steps[1:]:
        ev = df.where(cond).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        on = (
            (cur["user"] == ev["__u"])
            & (ev["__ts"].cast("double") > cur[prev].cast("double"))
            & (
                ev["__ts"].cast("double")
                <= cur[prev].cast("double") + F.lit(float(step_within_seconds))
            )
        )
        keep = [c for c in cur.columns]
        cur = (
            cur.join(ev, on, "left")
            .groupBy(*keep)
            .agg(F.min("__ts").alias(f"t_{name}"))
        )
        prev = f"t_{name}"
    return cur


def burst_detect(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    window_seconds: int = 60,
    min_events: int = 5,
) -> DataFrame:
    """Burst / bot-rate detection: entities whose event rate exceeds
    ``min_events`` within ANY trailing ``window_seconds`` window — the
    standard automated-traffic screen in clickstream curation (and the
    alarm-flood screen in sensor telemetry).

    The sliding count is a rangeBetween window on integer epoch
    seconds, partitioned by entity — per-entity sort, no global
    ordering, no self-join against the time grid. One aggregate
    collapses to (entity, peak rate); at 100 TB the state is one sort
    per entity partition, the frame never exceeds the window span.

    Output: (entity, n_events, max_burst) filtered to
    max_burst >= min_events.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("entity")
        .orderBy("epoch")
        .rangeBetween(-(window_seconds - 1), 0)
    )
    base = df.where(
        F.col(entity_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(entity_col).alias("entity"),
        F.unix_timestamp(F.col(ts_col)).alias("epoch"),
    )
    counted = base.select(
        "entity", F.count(F.lit(1)).over(w).alias("burst")
    )
    return (
        counted.groupBy("entity")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("burst").alias("max_burst"),
        )
        .where(F.col("max_burst") >= min_events)
    )


def local_peaks(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Local-maximum detection over an ordered series: points strictly
    greater than BOTH neighbors (series edges excluded — a peak needs
    two neighbors). Strict comparisons make plateaus peak-free, so the
    flag is deterministic with no tiebreak dependence.

    One lag + one lead over the per-series window; at scale this is a
    per-series sort with two row buffers — no self-joins on shifted
    timestamps.

    Output: [*series_cols], ts, value, prev, next (peaks only).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    flagged = df.select(
        *series_cols,
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
        F.lag(value_col, 1).over(w).alias("prev"),
        F.lead(value_col, 1).over(w).alias("next"),
    )
    return flagged.where(
        F.col("prev").isNotNull()
        & F.col("next").isNotNull()
        & (F.col("value") > F.col("prev"))
        & (F.col("value") > F.col("next"))
    )
