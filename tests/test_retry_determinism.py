"""Batch task-retry determinism (VERDICT r6 next-round #5).

SCALING.md claims the deterministic-sampling and dedup-keep-rule
outputs are "stable under task retries by construction" (md5-threshold
membership and min_by tiebreaks depend only on row content, never on
partition/attempt identity). Round 6 proved the analogous streaming
claim with kill/restart tests; this module proves the batch claim the
same way:

- a fault-injecting ``mapInPandas`` identity transform raises on every
  partition's FIRST attempt (``TaskContext.attemptNumber() == 0``) and
  passes rows through untouched on the retry;
- the whole pipeline runs under ``master=local[4,2]`` (2 task-failure
  budget — plain ``local[N]`` has maxFailures=1 and would abort), so
  every task genuinely executes twice;
- the faulted output must be byte-identical (full row digest) to the
  clean run for q531 (hash sample), q17 (exact dedup keep-lowest), and
  q20 (MinHash LSH pairs).

Because one JVM allows one SparkContext and the conftest session is
plain local[*], the faulted runs execute in a fresh subprocess JVM.
An accumulator counts retried (attempt > 0) successful tasks so the
test can assert the fault path actually fired (a silent no-op
injector would prove nothing; counting inside the raising attempt
would always read 0 because Spark discards accumulator updates from
failed tasks).
"""

from __future__ import annotations

import subprocess
import sys

_PROBE = r"""
import sys, hashlib
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark import TaskContext

spark = (
    SparkSession.builder.master("local[4,2]")
    .appName("retry-determinism")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
sc = spark.sparkContext
import __spark_entry__ as m
qs = m.queries()
SF = "/root/testdata/sf0.001"

# Accumulator updates from FAILED tasks are discarded by Spark, so
# counting inside the raising attempt would always read 0. Count on
# the successful attempt instead: attemptNumber > 0 there proves a
# first attempt really failed and was retried.
n_retried = sc.accumulator(0)

def fault_once(df):
    # identity transform that kills every partition's first attempt
    schema = df.schema
    def gen(batches):
        tc = TaskContext.get()
        if tc.attemptNumber() == 0:
            raise RuntimeError(
                f"injected: partition {tc.partitionId()} attempt 0"
            )
        n_retried.add(1)
        yield from batches
    return df.mapInPandas(gen, schema)

def digest(df):
    rows = sorted(tuple(r) for r in df.collect())
    txt = "\n".join(repr(r) for r in rows)
    return len(rows), hashlib.sha256(txt.encode()).hexdigest()[:16]

# Each case: (name, builder(fault_wrapper)) — the wrapper is applied to
# the INPUT table(s), upstream of every shuffle/agg the query does.
from sensor_time_series_pyspark_spark.sources.readers import read_table

def build_q531(wrap):
    import sensor_time_series_pyspark_spark.queries.corpus_sampling as cs
    from pyspark.sql import functions as F
    docs = wrap(read_table(spark, SF, "documents"))
    keep = cs._h48(F.col("doc_id"), "smp:") < F.lit(cs._RATE_20)
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
    )

def build_q17(wrap):
    from pyspark.sql import functions as F
    docs = wrap(read_table(spark, SF, "documents"))
    return docs.groupBy(F.md5("text").alias("fp")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_doc_id"),
    )

def build_q20(wrap):
    from sensor_time_series_pyspark_spark.operators.dedup import (
        exact_dedup,
        minhash_pairs,
    )
    docs = wrap(read_table(spark, SF, "documents"))
    reps = exact_dedup(docs, "text", "doc_id")
    return minhash_pairs(
        reps, "doc_id", "text",
        threshold=0.35, shingle_k=2, n_hashes=16, n_bands=8,
    )

ident = lambda df: df
for name, build in (
    ("q531", build_q531), ("q17", build_q17), ("q20", build_q20)
):
    clean = digest(build(ident))
    before = n_retried.value
    faulted = digest(build(fault_once))
    fired = n_retried.value - before
    status = "SAME" if clean == faulted else "DIFF"
    print(f"RESULT {name} {status} fired={fired} clean={clean} faulted={faulted}")
spark.stop()
"""


def test_retry_determinism_q531_q17_q20():
    out = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        timeout=900,
        cwd="/root/repo",
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    assert len(lines) == 3, (out.stdout[-2000:], out.stderr[-3000:])
    for line in lines:
        parts = line.split()
        name, status, fired = parts[1], parts[2], int(parts[3].split("=")[1])
        assert status == "SAME", line
        assert fired > 0, f"{name}: fault injector never fired — {line}"
