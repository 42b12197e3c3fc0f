"""Z-order (Morton) interleaving — multi-column clustering for
parquet data skipping.

A table sorted by (a, b) skips row groups well only for predicates on
``a``; sorting by the Morton code of (a, b) interleaves both columns'
bits, so each row group covers a small RECTANGLE of the (a, b) space
and min/max pruning works for predicates on either column or both —
the lakehouse Z-ORDER BY technique, here as a plain Column expression
feeding ``sortWithinPartitions``/``orderBy`` before a write.

The reference has no storage layout concerns (it writes row-at-a-time
to SQL Server, Prensas.py:224); this belongs to the 100 TB extension
surface: at scale, the difference between scanning 1% and 100% of a
fact table IS the query plan.

Pure integer arithmetic (shifts, masks, adds) — no higher-order
functions, so expressions stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a single Z-order key: bit i of ``a`` lands at
    position 2i, bit i of ``b`` at 2i+1. Columns are masked to
    ``bits`` bits first (values beyond the mask fold into the top
    cells, which only weakens — never breaks — clustering)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31] (result must fit a long)")
    av = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    bv = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(av, i).bitwiseAND(F.lit(1)), 2 * i)
        out = out + F.shiftleft(F.shiftright(bv, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return out


def zorder_by(df, cols: tuple[str, str], bits: int = 16):
    """Return ``df`` globally sorted by the Morton code of two
    columns — the write-path layout step: range-partitioning on the
    code gives every output file a compact (a, b) rectangle, so
    min/max row-group stats prune scans for predicates on either
    column. (For >2 columns, fold pairwise or widen the interleave;
    2-column is the common hot case.)"""
    return df.orderBy(morton_code(F.col(cols[0]), F.col(cols[1]), bits))
