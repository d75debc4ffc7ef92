"""Round-10 optimization probe: capture `.explain("formatted")` and
isolated noop-sink timings (bench.py methodology: best-of-N on a warm
JVM) for a set of queries.

Usage:
  python scripts/opt_probe.py plans  <tag> [names...]   # write plans/r10/<name>_<tag>.txt
  python scripts/opt_probe.py time   [names...]         # print per-query best-of-N secs
  python scripts/opt_probe.py both   <tag> [names...]

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1);
core count from $SPARK_GRAFT_CPUS — same contract as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sensor_time_series_pyspark_spark.cli import BENCH_QUERIES
from sensor_time_series_pyspark_spark.queries import QUERIES
from sensor_time_series_pyspark_spark.session import get_spark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS_DIR = os.path.join(ROOT, "plans", "r10")


def fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    mode = sys.argv[1]
    if mode in ("plans", "both"):
        tag = sys.argv[2]
        names = sys.argv[3:] or list(BENCH_QUERIES)
    else:
        tag = None
        names = sys.argv[2:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt_probe")
    qs = dict(QUERIES)
    names = [n for n in names if n in qs]

    if mode in ("plans", "both"):
        os.makedirs(PLANS_DIR, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            path = os.path.join(PLANS_DIR, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(fmt_plan(df))
            print(f"wrote {path}")

    if mode in ("time", "both"):
        load1 = round(os.getloadavg()[0], 2)
        # warm JVM once
        qs[names[0]](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        repeats = max(
            1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
        )
        timings = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"opt_probe:{name}")
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({"queries": timings, "load1": load1}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
