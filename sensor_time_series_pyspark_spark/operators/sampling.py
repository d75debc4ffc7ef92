"""Deterministic content-hash sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(a) stable across runs and engines — re-running the pipeline, or
re-implementing it in another system, must assign every row the same
way; (b) key-consistent — all rows of one document/user land in the
same split (no leakage); (c) driver-free — no RNG state to broadcast.

``sample``/``randomSplit`` give none of that: Spark's RNG is
partition-dependent (a repartition reshuffles the sample) and
engine-private. The standard fix — used by every large ETL shop — is
hashing a stable key into [0,1) and thresholding. We use the first 8
hex chars of md5 (standardized, present in every engine, uniform to
2^-32) compared lexicographically: fixed-width lowercase hex compares
identically to its numeric value, so the predicate is a plain string
comparison that any engine — and any oracle — reproduces bit-for-bit.

At scale this is a narrow map-side filter: no shuffle, no RNG
coordination, pushes through joins, and the same row always hashes the
same way on every executor.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 1 << 32  # first 8 md5 hex chars


def _bucket_hex(key: Column, salt: str) -> Column:
    """First 8 md5 hex chars of salt||key — a uniform draw in [0, 2^32)
    encoded as fixed-width hex (lexicographic order == numeric order)."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)


def _threshold_hex(cum_fraction: float) -> str:
    return format(min(int(cum_fraction * _HEX_SPAN), _HEX_SPAN - 1), "08x")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by content hash of
    ``key_col``. Same key ⇒ same decision, on every run, engine, and
    partitioning. ``salt`` decorrelates independent samples over the
    same keys."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.where(_bucket_hex(F.col(key_col), salt) < _threshold_hex(fraction))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label (e.g. train/val/test) by content
    hash — key-consistent and leakage-free: every row with the same key
    gets the same label. ``weights`` must sum to 1 (within float eps).

    Implementation: cumulative hex thresholds + a CASE chain — a pure
    projection, no shuffle, no RNG.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    h = _bucket_hex(F.col(key_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = h < _threshold_hex(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its
    own keep-fraction (e.g. downsample dominant languages, keep all of
    rare ones — the standard training-mix rebalancing move).

    Same machinery as ``hash_sample`` — md5-hex threshold per row, CASE
    on the stratum — so it stays a narrow map-side filter: no shuffle,
    no RNG, stable across runs/engines/partitionings, and the threshold
    comparison is reproducible in any engine with md5 (oracle-testable).

    Strata not in ``fractions`` fall back to ``default_fraction``
    (0 = drop, 1 = keep all).
    """
    for s, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0,1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0,1]")
    h = _bucket_hex(F.col(key_col), salt)
    thr: Column | None = None
    for s, frac in fractions.items():
        cond = F.col(strata_col) == s
        lit = F.lit(_threshold_hex(frac))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = (
        F.lit(_threshold_hex(default_fraction))
        if thr is None
        else thr.otherwise(F.lit(_threshold_hex(default_fraction)))
    )
    return df.where(h < thr)


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of k rows, selected
    with probability proportional to ``weight_col`` — deterministic
    (A-ES / Efraimidis-Spirakis over a content-hash uniform instead of
    an RNG, so the draw is reproducible across runs, engines, and
    partitionings).

    Each row gets priority u^(1/w) for u ~ U(0,1] derived from md5 of
    salt||key; the k largest priorities win. Implemented as the
    equivalent argmin of -ln(u)/w (monotone transform — avoids
    pow's double-rounding pathologies near 1.0): exponential race with
    rate w, the classic weighted-reservoir formulation.

    Shape: map-side priority + a rank-k cutoff. The global top-k is a
    TakeOrderedAndProject (per-partition heap of size k, driver merge of
    tasks×k rows) — no full sort, no single-partition shuffle of data.

    Determinism requires ``key_col`` to uniquely identify rows: the
    priority derives from md5(salt||key), so rows sharing a key value
    get identical priorities AND an identical (priority, key) sort key,
    making the choice among such duplicates order-dependent. Distinct
    keys never tie (u is injective on distinct keys up to md5).

    Weights must be > 0 (rows with NULL/non-positive weight are
    excluded, standard convention). Returns the selected rows; the
    internal ``__pri`` priority column is dropped.
    """
    # u in (0, 1]: (h + 1) / 2^32 over the first 8 md5 hex chars
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(_HEX_SPAN))
    pri = -F.log(u) / F.col(weight_col).cast("double")
    base = df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    return (
        base.withColumn("__pri", pri)
        .orderBy(F.col("__pri").asc(), F.col(key_col).asc())
        .limit(k)
        .drop("__pri")
    )


def token_budget_select(
    df: DataFrame,
    id_col: str,
    token_col: str,
    score_col: str,
    budget: int,
) -> DataFrame:
    """Quality-first token-budget selection: order documents by
    (score DESC, id ASC — fully deterministic), take documents while
    the running token total stays within ``budget``. The standard
    "best N billion tokens" curation step after quality scoring.

    Small-data path: one global ordered window for the prefix sum.
    Scale path (documented contract): bucket scores first
    (quantiles.approx_ntile), prefix-sum the per-bucket token totals on
    the driver, take whole buckets and window-sort ONLY the single
    boundary bucket — the global sort never touches the fact at 100 TB.

    Output: (id, n_tokens, score, cum_tokens), cum_tokens <= budget.
    """
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.col("score").desc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(token_col).cast("bigint").alias("n_tokens"),
        F.col(score_col).alias("score"),
    )
    return base.select(
        "id",
        "n_tokens",
        "score",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    ).where(F.col("cum_tokens") <= budget)


def mixture_weights(
    df: DataFrame,
    group_cols: list[str],
    token_col: str,
) -> DataFrame:
    """Domain-mixture reweighting table: per-group token share and the
    multiplicative sampling weight that would equalize groups
    (weight = uniform_share / actual_share). The bookkeeping step
    behind DoReMi-style / hand-tuned domain mixtures: feed the weights
    to a sampler to hit a target mixture.

    One hash aggregate to group totals; shares and weights are computed
    on the tiny per-group frame (window over the aggregate, never a
    second fact scan). Integer token sums; each output ratio is one
    double division — engine-portable.

    Output: [*group_cols], tokens, token_share, weight.
    """
    from pyspark.sql import Window

    g = df.groupBy(*group_cols).agg(
        F.sum(F.col(token_col).cast("bigint")).alias("tokens")
    )
    wall = Window.partitionBy()
    total = F.sum("tokens").over(wall)
    n_groups = F.count(F.lit(1)).over(wall)
    return g.select(
        *group_cols,
        "tokens",
        (F.col("tokens").cast("double") / total.cast("double")).alias(
            "token_share"
        ),
        F.when(
            F.col("tokens") > 0,
            total.cast("double") / (n_groups * F.col("tokens")).cast("double"),
        ).alias("weight"),
    )


def waterfill_allocation(
    df: DataFrame,
    group_cols: list[str],
    token_col: str,
    budget_frac: float = 0.5,
    max_epochs: float = 2.0,
) -> DataFrame:
    """Capped-mixture waterfilling — the token-budget allocation step
    behind published pretraining mixtures (the Llama-1 table's
    "epochs" column; Hoffmann-style budget splits): aim each group at
    an equal share of a global token budget, but cap any group at
    ``max_epochs`` passes over its native tokens, and redistribute the
    freed budget across the uncapped groups (water rising over posts).

    Exact closed form, no iteration: with per-group capacity
    c_i = max_epochs * tokens_i sorted ascending, the waterline is
    w_k = (B - sum_{j<k} c_j) / (n - k + 1) for the FIRST k where
    w_k <= c_k (every group below the line is capped at capacity,
    every group above gets exactly w); if total capacity <= B no line
    exists and every group is capped. allocation_i = min(c_i, w),
    and sum(allocation) = min(B, sum(c)) by construction.

    Scale shape: ONE hash aggregate over the fact to per-group token
    totals; every window after that (global rank, exclusive prefix
    sum, scalar min) runs on the n-group frame — tens of rows at any
    corpus size, the same post-aggregate global-window class as
    mixture_weights above.

    Output: [*group_cols], tokens, capacity, allocation, epochs,
    capped, waterline (NULL when the budget exceeds total capacity).

    Zero-token groups: capacity = allocation = 0 and epochs is pinned
    to 0.0 explicitly (NOT the NULL that double 0/0 would yield —
    Spark and DuckDB agree on that NULL, but it surfaces silently);
    such a group sits at capacity, so ``capped`` reports true when a
    waterline exists. Callers who want them gone should filter before
    calling — the closed form is indifferent (a zero post never moves
    the waterline).
    """
    from pyspark.sql import Window

    g = df.groupBy(*group_cols).agg(
        F.sum(F.col(token_col).cast("bigint")).alias("tokens")
    )
    wall = Window.partitionBy()
    budget = (
        F.sum("tokens").over(wall).cast("double") * F.lit(float(budget_frac))
    )
    cap = F.col("tokens").cast("double") * F.lit(float(max_epochs))
    wsort = Window.orderBy(cap.asc(), *[F.col(c).asc() for c in group_cols])
    k = F.row_number().over(wsort)
    prefix = F.coalesce(
        F.sum(cap).over(
            wsort.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0.0),
    )
    n_g = F.count(F.lit(1)).over(wall)
    ranked = g.select(
        *group_cols,
        "tokens",
        cap.alias("capacity"),
        k.alias("__k"),
        ((budget - prefix) / (n_g - k + 1).cast("double")).alias("__wk"),
    )
    # FIRST feasible k (smallest — NOT min w_k: later w_k can dip below
    # the true line once the budget subtraction overshoots), then its w.
    feas = ranked.withColumn(
        "__fk",
        F.min(
            F.when(F.col("__wk") <= F.col("capacity"), F.col("__k"))
        ).over(Window.partitionBy()),
    )
    line = F.max(
        F.when(F.col("__k") == F.col("__fk"), F.col("__wk"))
    ).over(Window.partitionBy())
    return feas.select(
        *group_cols,
        "tokens",
        "capacity",
        line.alias("waterline"),
        F.least(F.col("capacity"), F.coalesce(line, F.col("capacity"))).alias(
            "allocation"
        ),
        F.when(
            F.col("tokens") > 0,
            F.least(F.col("capacity"), F.coalesce(line, F.col("capacity")))
            / F.col("tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("epochs"),
        (line.isNull() | (F.col("capacity") <= line)).alias("capped"),
    )
