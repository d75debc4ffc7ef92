"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`): a
deterministic gas-sensor telemetry simulator in the reference's domain —
long/EAV rows (terminal, ts, sensor_type, reading) exactly like the
CSV feed at sensor_data_etl.py:35-51, but generated in-engine.

Why it exists: demonstrates the engine's source extension seam (the
DataSource V2 path the JDBC/Cassandra connectors use, reachable from
pure Python in Spark 4), gives tests/examples an unbounded data tap
with no files, and the partition layout is the scale story — each
input partition generates independently from (seed, partition_id), so
a 1000-executor cluster generates 1000 ways with zero coordination.

Usage::

    spark.dataSource.register(SensorSimDataSource)
    df = (spark.read.format("sensor_sim")
          .option("rows_per_partition", 1000)
          .option("num_partitions", 8)
          .option("seed", 42)
          .load())
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

GASES = ("CO", "LEL", "H2S", "O2")
# per-gas (base, amplitude) — O2 hovers at 20.9%, toxics near zero
_PROFILE = {"CO": (2.0, 5.0), "LEL": (1.0, 3.0), "H2S": (0.5, 2.0), "O2": (20.9, 0.7)}

SCHEMA = StructType(
    [
        StructField("terminal_id", IntegerType()),
        StructField("ts", TimestampType()),
        StructField("sensor_type", StringType()),
        StructField("reading", DoubleType()),
    ]
)


class SensorSimDataSource(DataSource):
    """format name: ``sensor_sim``. Options: rows_per_partition,
    num_partitions, num_terminals, seed, start (ISO date)."""

    @classmethod
    def name(cls) -> str:
        return "sensor_sim"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> "SensorSimReader":
        return SensorSimReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "SensorSimStreamReader":
        return SensorSimStreamReader(self.options)


class SensorSimReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows_per_partition", 1000))
        self.parts = int(options.get("num_partitions", 4))
        self.terminals = int(options.get("num_terminals", 10))
        self.seed = int(options.get("seed", 42))
        self.start = options.get("start", "2024-01-01")

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        # executor-side; numpy imported here so the plan is picklable
        import numpy as np

        pid = partition.value
        rng = np.random.default_rng((self.seed, pid))
        t0 = datetime.fromisoformat(self.start).replace(tzinfo=timezone.utc)
        for i in range(self.rows):
            terminal = int(rng.integers(0, self.terminals))
            gas = GASES[int(rng.integers(0, len(GASES)))]
            base, amp = _PROFILE[gas]
            # diurnal sine + noise; occasional spike = alarm analog
            minute = pid * self.rows + i
            ts = t0 + timedelta(minutes=minute)
            diurnal = np.sin(2 * np.pi * (minute % 1440) / 1440.0)
            reading = base + amp * 0.3 * diurnal + float(rng.normal(0, amp * 0.1))
            if rng.random() < 0.01:
                reading += amp  # spike
            yield (terminal, ts.replace(tzinfo=None), gas, float(max(reading, 0.0)))


def _gen_batch(batch: int, rows: int, terminals: int, seed: int, start: str):
    """Deterministic micro-batch ``batch``: rows derive only from
    (seed, batch), never from wall clock — the property that makes
    checkpoint replay produce byte-identical batches (exactly-once
    through the foreachBatch sink without sink-side dedup)."""
    import numpy as np

    rng = np.random.default_rng((seed, batch))
    t0 = datetime.fromisoformat(start).replace(tzinfo=timezone.utc)
    for i in range(rows):
        terminal = int(rng.integers(0, terminals))
        gas = GASES[int(rng.integers(0, len(GASES)))]
        base, amp = _PROFILE[gas]
        minute = batch * rows + i
        ts = t0 + timedelta(minutes=minute)
        diurnal = np.sin(2 * np.pi * (minute % 1440) / 1440.0)
        reading = base + amp * 0.3 * diurnal + float(rng.normal(0, amp * 0.1))
        if rng.random() < 0.01:
            reading += amp
        yield (terminal, ts.replace(tzinfo=None), gas, float(max(reading, 0.0)))


class SensorSimStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of ``sensor_sim`` (Spark 4
    SimpleDataSourceStreamReader): offset = micro-batch counter; each
    batch is regenerated deterministically from (seed, batch), so
    ``readBetweenOffsets`` (the recovery path) replays identical rows.

    Options: rows_per_batch, num_terminals, seed, start (ISO date).

    Usage::

        spark.dataSource.register(SensorSimDataSource)
        sdf = (spark.readStream.format("sensor_sim")
               .option("rows_per_batch", 500).load())
    """

    def __init__(self, options: dict):
        self.rows = int(options.get("rows_per_batch", 500))
        self.terminals = int(options.get("num_terminals", 10))
        self.seed = int(options.get("seed", 42))
        self.start = options.get("start", "2024-01-01")

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict):
        # materialized list, not a generator: the prefetch cache
        # copy.copy()s the returned iterator on the recovery path
        b = int(start["batch"])
        rows = list(_gen_batch(b, self.rows, self.terminals, self.seed, self.start))
        return rows, {"batch": b + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        out = []
        for b in range(int(start["batch"]), int(end["batch"])):
            out.extend(
                _gen_batch(b, self.rows, self.terminals, self.seed, self.start)
            )
        return out
