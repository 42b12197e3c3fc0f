"""Bloom-filter build/probe as DataFrame operators — the runtime-filter
/ semi-join-pushdown primitive: a tiny broadcastable bitset stands in
for the build side of a membership test, so the (huge) probe side is
filtered map-side with zero shuffle and a bounded false-positive rate.

This is the operator Spark itself injects as `bloom_filter_agg` runtime
filters under AQE; building it explicitly makes the primitive available
to pipelines (e.g. "probe 100 TB of events against the known-part set
without shuffling events") and lets the gate audit the FP rate against
the exact anti-join.

Exact-integer construction so every engine agrees bit-for-bit: position
i of key = int(md5(f"{i}|{key}")[:8 hex], 16) mod m; the filter is m/32
32-bit words stored in BIGINTs (bit_or-aggregated — shifts stay < 2^31,
inside every engine's safe range).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: filter geometry: m bits, k hash functions. m=1024/k=3 gives ~1.7%
#: FP at 100 keys — small enough to audit, big enough to be honest.
DEFAULT_M = 1024
DEFAULT_K = 3

WORD_BITS = 32


def _bit_mask(bit: Column) -> Column:
    """1 << bit for a COLUMN bit index (shiftleft needs a literal):
    2^bit is exact in IEEE double for bit < 32, so the cast is safe."""
    return F.pow(F.lit(2.0), bit).cast("long")


def _position(key: Column, i: int, m: int) -> Column:
    """Hash position i of a key: md5 of the salted key, first 8 hex
    digits as an integer, mod m. Identical text → identical positions
    in any engine with md5 + hex parsing."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}|"), key)), 1, 8), 16, 10).cast(
        "long"
    ) % m


def bloom_build(
    keys: DataFrame, key_col: str, *, m: int = DEFAULT_M, k: int = DEFAULT_K
) -> DataFrame:
    """Aggregate a key set into a Bloom bitset: one row per non-empty
    32-bit word, ``(word_idx, word)``. The result is at most m/32 rows
    regardless of key count — always broadcastable.

    Shape: explode k positions per key (map-side), one partial-agg'd
    bit_or shuffle on word_idx (≤ m/32 groups). The build side is
    scanned once; nothing is collected to the driver."""
    pos = F.explode(F.array(*[_position(F.col(key_col), i, m) for i in range(k)]))
    bits = keys.select(pos.alias("__p")).select(
        (F.col("__p") / WORD_BITS).cast("long").alias("word_idx"),
        _bit_mask(F.col("__p") % WORD_BITS).alias("__m"),
    )
    return bits.groupBy("word_idx").agg(F.bit_or("__m").alias("word"))


def bloom_probe(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    *,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Test every probe row's ``key_col`` against a ``bloom_build``
    bitset: adds a ``bloom_hit`` boolean (true ⇔ all k bits set —
    i.e. "possibly in the set"; false is definite absence).

    Shape: the probe side explodes its k (word_idx, mask) pairs,
    broadcast-joins the ≤ m/32-row bitset, and reduces back to one
    row per probe key — zero shuffle of the probe data beyond the
    per-key reduce, which re-keys on the probe's own key column. At
    scale this is the map-side pre-filter that spares the real join."""
    k_pos = [
        (
            (_position(F.col(key_col), i, m) / WORD_BITS).cast("long"),
            _bit_mask(_position(F.col(key_col), i, m) % WORD_BITS),
        )
        for i in range(k)
    ]
    exploded = probe.select(
        "*",
        F.explode(
            F.array(*[F.struct(w.alias("word_idx"), msk.alias("__mask")) for w, msk in k_pos])
        ).alias("__pm"),
    ).select("*", F.col("__pm.word_idx").alias("word_idx"), F.col("__pm.__mask").alias("__mask"))
    joined = exploded.join(F.broadcast(bloom), "word_idx", "left")
    hit_bit = (
        F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("__mask")) == F.col("__mask")
    )
    return (
        joined.groupBy(*probe.columns)
        .agg(F.min(hit_bit).alias("bloom_hit"))
    )


def bloom_sql(build_sql: str, key_expr: str, *, m: int = DEFAULT_M, k: int = DEFAULT_K) -> str:
    """The DuckDB twin of ``bloom_build`` as a CTE body producing
    (word_idx, word) from ``build_sql``'s ``key_expr`` column."""
    pos = lambda i: f"(('0x' || substr(md5('{i}|' || {key_expr}), 1, 8))::BIGINT % {m})"  # noqa: E731
    arr = ", ".join(pos(i) for i in range(k))
    return f"""
        SELECT p // {WORD_BITS} AS word_idx, bit_or(1::BIGINT << CAST(p % {WORD_BITS} AS INT)) AS word
        FROM (SELECT unnest([{arr}]) AS p FROM ({build_sql}))
        GROUP BY p // {WORD_BITS}
    """
