"""Telemetry analytics dashboard feed: the behavioral layer over the
events stream in one pass — funnels, retention, sessions, transitions,
dwell times, and an experiment readout.

Every stage is a DataFrame composition of the operators this engine
ships; nothing here collects the fact table, and at 100 TB the plan
shapes hold (entity-keyed windows, conditional aggregates, broadcast
moment joins — see COVERAGE.md for each operator's contract).
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from sensor_time_series_pyspark_spark.operators import (
    ab_proportion_test,
    cohort_retention,
    funnel,
    hash_split,
    sessionize,
    time_in_state,
    transition_matrix,
)
from sensor_time_series_pyspark_spark.session import get_spark
from sensor_time_series_pyspark_spark.sources.readers import read_table


def main(sf_dir: str) -> int:
    spark = get_spark("example-telemetry")
    ev = read_table(spark, sf_dir, "events")

    # 1. acquisition funnel: view → click → purchase, in order
    steps = [
        ("view", F.col("event_type") == "view"),
        ("click", F.col("event_type") == "click"),
        ("purchase", F.col("event_type") == "purchase"),
    ]
    fun = funnel(ev, "user_id", "ts", steps).orderBy("step_idx")
    rows = fun.collect()
    assert rows[0]["n_users"] >= rows[-1]["n_users"] >= 0, "funnel must shrink"
    print("funnel:", [(r["step_name"], r["n_users"]) for r in rows])

    # 2. D1/D7 retention by first-seen cohort
    ret = cohort_retention(ev, "user_id", "ts", offsets=(1, 7))
    print("retention rows:", ret.count())

    # 3. session shape: gap-based sessions, per-user depth
    sess = sessionize(ev, "ts", ["user_id"], gap_seconds=1800)
    depth = sess.groupBy("user_id", "session_seq").count()
    print("sessions:", depth.count())

    # 4. journey structure: where do users go next, and how long do
    # they linger per state
    trans = transition_matrix(ev, "user_id", "ts", "event_type", "event_id")
    dwell = time_in_state(ev, "user_id", "ts", "event_type", "event_id")
    print("transitions:", trans.count(), "dwell states:", dwell.count())

    # 5. experiment readout over a deterministic hash split
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    assigned = hash_split(
        per_user, "user_id", {"a": 0.5, "b": 0.5}, salt="exp1", out_col="arm"
    )
    z = ab_proportion_test(assigned, "user_id", "arm", "converted").collect()[0]
    print("A/B:", dict(n_a=z["n_a"], n_b=z["n_b"], z=z["z"]))
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    a = p.parse_args()
    raise SystemExit(main(a.sf_dir))
