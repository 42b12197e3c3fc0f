"""Skew mitigation: salted two-phase aggregation and salted broadcast
join — the manual tools for when AQE's runtime skew handling isn't
enough (e.g. a single part number holding 30% of a 100 TB fact table,
or any first-shuffle aggregation where AQE only sees skew after the
map side already hot-spotted).

Design rule: salting must never change semantics — a salted aggregate
is only valid for ALGEBRAIC aggregates (sum/count/min/max, and
avg/stddev via sum+count), where partial-of-partials equals the total.
``salted_agg`` therefore takes explicit (partial, merge) expression
pairs and composes them itself instead of accepting arbitrary
aggregate columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (partial_expr_builder, merge_expr_builder) pairs by algebraic kind.
_ALGEBRAIC = {
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "count": (lambda c: F.count(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt on the first
    shuffle: groupBy(keys + salt) partial-aggregates (so one hot key
    spreads over ``n_salts`` reducers), then groupBy(keys) merges the
    ≤ n_salts partials per key (tiny second shuffle).

    ``aggs`` maps output column name → (kind, input column), kind one
    of sum/count/min/max. Example::

        salted_agg(readings, ["part"], {"qty": ("sum", "delta"),
                                        "n": ("count", "delta")})

    Only needed when the SKEWED key is the grouping key of the FIRST
    aggregation; Spark's own partial aggregation already handles skew
    for final aggs, and AQE splits skewed JOIN partitions — use this
    for the residual case (hot-key groupBy with high-cardinality
    values per key, e.g. collect-free rollups over a mega-part).
    """
    for name, (kind, _) in aggs.items():
        if kind not in _ALGEBRAIC:
            raise ValueError(f"{name}: {kind!r} is not algebraic-salt-safe; use {sorted(_ALGEBRAIC)}")
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[_ALGEBRAIC[kind][0](F.col(src)).alias(f"__p_{name}") for name, (kind, src) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_ALGEBRAIC[kind][1](F.col(f"__p_{name}")).alias(name) for name, (kind, src) in aggs.items()]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Skew-proof dimension join: broadcast the small side so the big
    (possibly skewed) side never shuffles at all. This is the engine's
    default for every dimension join (SURVEY.md J1-J5, J10); exposed
    here as the named alternative to a shuffle join on a skewed key."""
    return big.join(F.broadcast(small), list(on), how)


def fanout_repartition(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` (default: the session's
    default parallelism) — but ONLY if its current physical plan
    produces fewer partitions than that.

    This is the inverse of AQE partition coalescing: a stats-based
    physical decision for compute-heavy fan-out stages (shingle
    explode, per-pair HOF folds, array arithmetic) fed by a small scan.
    A single-row-group parquet file scans as ONE task no matter what
    ``maxPartitionBytes`` says, so everything downstream until the
    first shuffle runs single-threaded; one cheap round-robin exchange
    of the *narrow* input buys full-core parallelism for the wide
    compute that follows. At cluster scale scans already yield ≥
    parallelism partitions and this is a no-op — the partition-count
    gate, not the caller, decides.
    """
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def explain_has_single_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains at most one Exchange — a
    cheap assertion hook for plan-shape tests."""
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange") <= 1
