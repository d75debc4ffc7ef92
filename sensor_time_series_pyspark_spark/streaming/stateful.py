"""Custom stateful streaming operator: online per-series EWMA +
anomaly flagging via ``applyInPandasWithState`` (SURVEY.md §2.11 —
"no custom state store needed until per-series online forecasting
(applyInPandasWithState if wanted)": this is that operator).

Each series (e.g. one sensor/terminal) keeps (ewma, ewm_var, n) as
GroupState across micro-batches; every incoming event is scored against
the state BEFORE being folded in, so the output is identical whether
rows arrive in one batch or many (tested in test_streaming.py). State is
O(1) per series — safe for millions of series on a real cluster.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = "ewma double, ewm_var double, n long"


def _out_schema(key_fields: list[StructField]) -> StructType:
    return StructType(
        key_fields
        + [
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
            StructField("ewma", DoubleType()),
            StructField("zscore", DoubleType()),
            StructField("n_seen", LongType()),
        ]
    )


def ewma_anomaly_stream(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.2,
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Streaming per-series EWMA + z-score.

    Output row per input event: the running mean at arrival time and
    the event's deviation from it in EWM standard deviations (NULL for
    a series' first event). Rows within a batch are processed in
    ``ts`` order; state carries over between micro-batches.
    """
    key_field = sdf.schema[key_col]
    out_schema = _out_schema([key_field])

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle series past timeout_minutes: drop the state so the
            # store stays bounded (the docstring's contract); no output.
            state.remove()
            return
        if state.exists:
            ewma, ewm_var, n = state.get
        else:
            ewma, ewm_var, n = 0.0, 0.0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            out_rows = []
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                v = float(v)
                if n == 0:
                    z = None
                    ewma, ewm_var = v, 0.0
                else:
                    sd = math.sqrt(ewm_var)
                    z = (v - ewma) / sd if sd > 0 else None
                    delta = v - ewma
                    # Welford-style EWM update (West 1979): incremental,
                    # O(1) state, no window buffer
                    ewma = ewma + alpha * delta
                    ewm_var = (1 - alpha) * (ewm_var + alpha * delta * delta)
                n += 1
                out_rows.append((key[0], ts, v, ewma, z, n))
            yield pd.DataFrame(
                out_rows,
                columns=[key_col, "ts", "value", "ewma", "zscore", "n_seen"],
            )
        state.update((ewma, ewm_var, n))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes
        else GroupStateTimeout.NoTimeout
    )
    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def ewma_anomaly_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.2,
) -> DataFrame:
    """Batch twin of ``ewma_anomaly_stream`` (same math via
    ``applyInPandas``) — used to assert stream == batch."""
    key_field = df.schema[key_col]
    out_schema = _out_schema([key_field])

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        ewma, ewm_var, n = 0.0, 0.0, 0
        rows = []
        for ts, v in zip(pdf[ts_col], pdf[value_col]):
            v = float(v)
            if n == 0:
                z = None
                ewma, ewm_var = v, 0.0
            else:
                sd = math.sqrt(ewm_var)
                z = (v - ewma) / sd if sd > 0 else None
                delta = v - ewma
                ewma = ewma + alpha * delta
                ewm_var = (1 - alpha) * (ewm_var + alpha * delta * delta)
            n += 1
            rows.append((pdf[key_col].iloc[0], ts, v, ewma, z, n))
        return pd.DataFrame(
            rows, columns=[key_col, "ts", "value", "ewma", "zscore", "n_seen"]
        )

    return df.groupBy(key_col).applyInPandas(score, schema=out_schema)


def ewma_anomaly_stream_tws(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.2,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """``ewma_anomaly_stream`` on Spark 4's ``transformWithStateInPandas``
    — the successor API to ``applyInPandasWithState``: typed state
    variables through a ``StatefulProcessorHandle`` instead of one
    opaque tuple, declarative per-state TTL instead of hand-rolled
    timeout callbacks, and the RocksDB state store (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    RocksDBStateStoreProvider — required by this API, and the right
    store for millions of series anyway: state lives off-heap/on-disk
    with incremental checkpoints).

    Same math and output contract as ``ewma_anomaly_stream``; the
    stream==batch equivalence test covers both implementations.

    Dependency note: the API's driver worker speaks protobuf —
    ``google.protobuf`` must be installed (the test suite skips this
    path when it is absent).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    key_field = sdf.schema[key_col]
    out_schema = _out_schema([key_field])
    ttl_ms = ttl_minutes * 60 * 1000 if ttl_minutes else None

    class _EwmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "ewma_state", STATE_SCHEMA, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                ewma, ewm_var, n = self._state.get()
            else:
                ewma, ewm_var, n = 0.0, 0.0, 0
            for pdf in rows:
                pdf = pdf.sort_values(ts_col)
                out_rows = []
                for ts, v in zip(pdf[ts_col], pdf[value_col]):
                    v = float(v)
                    if n == 0:
                        z = None
                        ewma, ewm_var = v, 0.0
                    else:
                        sd = math.sqrt(ewm_var)
                        z = (v - ewma) / sd if sd > 0 else None
                        delta = v - ewma
                        ewma = ewma + alpha * delta
                        ewm_var = (1 - alpha) * (ewm_var + alpha * delta * delta)
                    n += 1
                    out_rows.append((key[0], ts, v, ewma, z, n))
                yield pd.DataFrame(
                    out_rows,
                    columns=[key_col, "ts", "value", "ewma", "zscore", "n_seen"],
                )
            self._state.update((ewma, ewm_var, n))

        def close(self) -> None:
            pass

    return sdf.groupBy(key_col).transformWithStateInPandas(
        _EwmaProcessor(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Page-Hinkley online drift detection
# ---------------------------------------------------------------------------

PH_STATE_SCHEMA = "n long, mean double, m double, m_min double"


def _ph_out_schema(key_field: StructField) -> StructType:
    return StructType(
        [
            key_field,
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
            StructField("ph", DoubleType()),
            StructField("alarm", LongType()),
            StructField("n_seen", LongType()),
        ]
    )


def _ph_step(
    x: float,
    n: int,
    mean: float,
    m: float,
    m_min: float,
    delta: float,
) -> tuple[int, float, float, float, float]:
    """One online Page-Hinkley update (the river/MOA recurrence):
    incremental mean, cumulative deviation m += x - mean_t - delta
    (with the UPDATED mean, matching the canonical streaming form),
    running minimum of m. Shared verbatim by the stream and the batch
    twin so stream == batch is exact."""
    n += 1
    mean = mean + (x - mean) / n
    m = m + (x - mean - delta)
    m_min = min(m_min, m)
    return n, mean, m, m_min, m - m_min


def page_hinkley_stream(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    delta: float = 0.0,
    threshold: float = 50.0,
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Streaming per-series Page-Hinkley mean-increase detector —
    O(1) state per series (n, running mean, cumulative deviation m,
    running min of m); alarm fires while ph = m - min(m) exceeds
    ``threshold``. The sequential counterpart of the offline q267
    query (which uses the whole-series mean; the online form uses the
    running mean, the standard stream variant). Rows within a batch
    process in ``ts`` order; state carries across micro-batches."""
    key_field = sdf.schema[key_col]
    out_schema = _ph_out_schema(key_field)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n, mean, m, m_min = state.get
        else:
            n, mean, m, m_min = 0, 0.0, 0.0, 0.0
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            rows = []
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                n, mean, m, m_min, ph = _ph_step(
                    float(v), n, mean, m, m_min, delta
                )
                rows.append(
                    (key[0], ts, float(v), ph, int(ph > threshold), n)
                )
            yield pd.DataFrame(
                rows,
                columns=[key_col, "ts", "value", "ph", "alarm", "n_seen"],
            )
        state.update((n, mean, m, m_min))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes
        else GroupStateTimeout.NoTimeout
    )
    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=PH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def page_hinkley_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    delta: float = 0.0,
    threshold: float = 50.0,
) -> DataFrame:
    """Batch twin of ``page_hinkley_stream`` (same ``_ph_step`` math
    via ``applyInPandas``) — used to assert stream == batch."""
    key_field = df.schema[key_col]
    out_schema = _ph_out_schema(key_field)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        n, mean, m, m_min = 0, 0.0, 0.0, 0.0
        rows = []
        key = pdf[key_col].iloc[0]
        for ts, v in zip(pdf[ts_col], pdf[value_col]):
            n, mean, m, m_min, ph = _ph_step(float(v), n, mean, m, m_min, delta)
            rows.append((key, ts, float(v), ph, int(ph > threshold), n))
        return pd.DataFrame(
            rows, columns=[key_col, "ts", "value", "ph", "alarm", "n_seen"]
        )

    return df.groupBy(key_col).applyInPandas(score, schema=out_schema)


# ---------------------------------------------------------------------------
# debounce / rate limit
# ---------------------------------------------------------------------------

def _debounce_out_schema(df: DataFrame, key_col: str, ts_col: str) -> StructType:
    return StructType([df.schema[key_col], df.schema[ts_col]])


def debounce_stream(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    cooldown_seconds: int,
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Streaming per-key debounce (alarm rate-limiter): emit an event
    only if at least ``cooldown_seconds`` have passed since the last
    EMITTED event of the same key — the historian/alerting primitive
    that turns a chattering sensor into actionable alarms.

    Genuinely sequential (whether an event emits depends on which
    earlier events emitted, a data-dependent recursion like deadband),
    so it is a stateful operator, not a window: GroupState holds one
    timestamp per key (O(1) state), rows process in ts order within a
    batch, and state carries across micro-batches so stream == batch
    (tested). Output: the surviving (key, ts) rows.
    """
    out_schema = _debounce_out_schema(sdf, key_col, ts_col)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_us = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            keep_rows = []
            for ts in pdf[ts_col]:
                us = int(pd.Timestamp(ts).value) // 1000
                if last_us is None or us - last_us >= cooldown_seconds * 1_000_000:
                    keep_rows.append((key[0], ts))
                    last_us = us
            if keep_rows:
                yield pd.DataFrame(keep_rows, columns=[key_col, ts_col])
        if last_us is not None:
            state.update((last_us,))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes
        else GroupStateTimeout.NoTimeout
    )
    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="last_us long",
        outputMode="append",
        timeoutConf=timeout,
    )


def debounce_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    cooldown_seconds: int,
) -> DataFrame:
    """Batch twin of ``debounce_stream`` (same sequential fold) —
    asserts stream == batch, and serves as the offline rate-limit pass
    over historical archives.

    Python-boundary shape (guide §4): the per-key timestamp array is
    assembled in the JVM (collect_list + array_sort), the fold runs in
    a scalar Arrow ``pandas_udf`` on integer micros — thousands of
    keys per Arrow batch instead of one pandas DataFrame per key
    (whose per-group overhead dominated the O(n) scan; the q603
    rainflow lesson) — and kept timestamps re-expand natively.

    NULL-timestamp contract (deliberate): rows with a NULL timestamp
    are dropped up front, so a key whose timestamps are ALL NULL is
    absent from the output. (collect_list already skipped NULLs; the
    explicit filter makes the behavior a documented contract rather
    than an aggregate side effect. The pre-round-10 applyInPandas
    path instead kept one NaT row per all-NULL key — undefined-order
    dirty-data behavior nothing depended on.)"""

    @F.pandas_udf("array<int>")
    def keep_idx(us: pd.Series) -> pd.Series:
        gap = cooldown_seconds * 1_000_000

        def one(u) -> list[int]:
            out: list[int] = []
            last = None
            for i, x in enumerate(u):
                if last is None or x - last >= gap:
                    out.append(i)
                    last = x
            return out

        return pd.Series([one(u) for u in us], dtype=object)

    per_key = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(key_col)
        .agg(F.array_sort(F.collect_list(F.col(ts_col))).alias("__t"))
    )
    kept = per_key.select(
        F.col(key_col),
        F.col("__t"),
        keep_idx(
            F.transform("__t", lambda t: F.unix_micros(t))
        ).alias("__k"),
    )
    return kept.select(
        F.col(key_col),
        F.explode(
            F.transform("__k", lambda i: F.element_at("__t", i + 1))
        ).alias(ts_col),
    )


# ---------------------------------------------------------------------------
# streaming heavy hitters (space-saving)
# ---------------------------------------------------------------------------

SS_STATE_SCHEMA = "items array<string>, counts array<long>"


def _ss_out_schema(key_field: StructField) -> StructType:
    return StructType(
        [
            key_field,
            StructField("ts", TimestampType()),
            StructField("item", StringType()),
            StructField("est_count", LongType()),
            StructField("n_tracked", LongType()),
        ]
    )


def _ss_step(
    item: str,
    items: list[str],
    counts: list[int],
    capacity: int,
) -> int:
    """One space-saving update (Metwally 2005): increment a tracked
    item, admit into spare capacity, or evict the minimum counter and
    inherit its count + 1 (the overestimate bound). Deterministic
    eviction: smallest count, then lexicographically smallest item.
    Returns the item's current estimate. Shared by stream and batch
    twin so stream == batch is exact."""
    if item in items:
        i = items.index(item)
        counts[i] += 1
        return counts[i]
    if len(items) < capacity:
        items.append(item)
        counts.append(1)
        return 1
    m = min(counts)
    # deterministic tiebreak among minimum counters
    cand = sorted(it for it, c in zip(items, counts) if c == m)[0]
    i = items.index(cand)
    items[i] = item
    counts[i] = m + 1
    return counts[i]


def heavy_hitters_stream(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    item_col: str,
    capacity: int = 8,
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Streaming space-saving heavy hitters per key: O(capacity) state
    regardless of item cardinality, guaranteed to track any item with
    true frequency > N/capacity (the classic bounded-state top-k; the
    batch top-k SKETCH in operators/sketches.py answers the same
    question offline — this is the live path). Emits each event's
    running estimate; rows within a batch process in ts order and
    state carries across micro-batches."""
    key_field = sdf.schema[key_col]
    out_schema = _ss_out_schema(key_field)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            items, counts = state.get
            items, counts = list(items), list(counts)
        else:
            items, counts = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            rows = []
            for ts, it in zip(pdf[ts_col], pdf[item_col]):
                est = _ss_step(str(it), items, counts, capacity)
                rows.append((key[0], ts, str(it), est, len(items)))
            yield pd.DataFrame(
                rows,
                columns=[key_col, "ts", "item", "est_count", "n_tracked"],
            )
        state.update((items, counts))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes
        else GroupStateTimeout.NoTimeout
    )
    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=SS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def heavy_hitters_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    item_col: str,
    capacity: int = 8,
) -> DataFrame:
    """Batch twin of ``heavy_hitters_stream`` (same ``_ss_step`` fold
    via ``applyInPandas``) — used to assert stream == batch."""
    key_field = df.schema[key_col]
    out_schema = _ss_out_schema(key_field)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        items: list[str] = []
        counts: list[int] = []
        rows = []
        key = pdf[key_col].iloc[0]
        for ts, it in zip(pdf[ts_col], pdf[item_col]):
            est = _ss_step(str(it), items, counts, capacity)
            rows.append((key, ts, str(it), est, len(items)))
        return pd.DataFrame(
            rows, columns=[key_col, "ts", "item", "est_count", "n_tracked"]
        )

    return df.groupBy(key_col).applyInPandas(score, schema=out_schema)
