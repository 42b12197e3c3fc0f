"""Part-number cleaning and slash-alternative expansion (C2).

Reference semantics (``limpiar_cadena``, Prensas.py:442-448), verified
by execution against the snapshot:

  * strip NULs;
  * if the cleaned string contains ``/``: split on single spaces into
    tokens, split each token on ``/`` into alternatives, and return the
    CARTESIAN PRODUCT of alternatives joined WITHOUT separators —
    ``"12/34 X/Y" → ["12X", "12Y", "34X", "34Y"]`` (itertools.product
    order: later tokens vary fastest);
  * else: strip spaces and return the scalar.

We normalize the return shape to *always* an array (length 1 in the
no-slash case) so downstream ``explode`` is uniform. The cartesian
fold is a native ``aggregate`` over the token array — no Python UDF,
fully codegen-friendly, and general over any number of tokens and
alternatives (the reference's itertools.product generality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iotdatapipeline_spark.functions.decode import strip_nuls, strip_spaces


def expand_alternatives(col: Column) -> Column:
    """C2 cartesian expansion as a pure Column expression.

    ``aggregate(tokens, [""], (acc, tok) -> flatten(acc × split(tok, "/")))``
    reproduces ``[''.join(c) for c in product(*[t.split('/') for t in
    s.split(' ')])]`` including its ordering (each fold step appends the
    next token's alternatives varying fastest).
    """
    cleaned = strip_nuls(col)
    tokens = F.split(cleaned, " ")  # like str.split(' '): keeps empty tokens
    general = F.aggregate(
        tokens,
        F.array(F.lit("")),
        lambda acc, tok: F.flatten(
            F.transform(acc, lambda prefix: F.transform(F.split(tok, "/"), lambda alt: F.concat(prefix, alt)))
        ),
    )
    # Single-token fast path: with no spaces the fold degenerates to
    # split(cleaned, "/") exactly (acc=[""] × one token's alternatives).
    # split is codegen'd; the nested-HOF fold is interpreted per row
    # (~8 µs/row measured) — and spaceless part numbers are the
    # overwhelmingly common shape, so dispatch on it.
    expanded = F.when(~cleaned.contains(" "), F.split(cleaned, "/")).otherwise(general)
    no_slash = F.array(strip_spaces(cleaned))
    return F.when(col.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.when(cleaned.contains("/"), expanded).otherwise(no_slash)
    )


def clean_part_scalar(col: Column) -> Column:
    """The no-expansion normalization: NULs and spaces stripped."""
    return strip_spaces(strip_nuls(col))


def exploded_alternatives(df: DataFrame, col: Column, out: str = "part") -> DataFrame:
    """Plan-level dispatch of ``explode(expand_alternatives(col))``.

    Spark evaluates higher-order functions via CodegenFallback: ANY
    expression tree containing the cartesian fold — even behind a
    never-taken ``when`` branch — drops the whole projection out of
    whole-stage codegen and is evaluated interpreted per row (measured
    3.2× on the A1 gate query). So the dispatch happens at the PLAN
    level instead: spaceless strings (the overwhelmingly common shape)
    explode through a pure codegen ``split``, and only rows containing
    spaces run the general fold. Row-for-row equivalent to
    ``df.withColumn(out, explode(expand_alternatives(col)))``:
    NULL inputs drop in both branch filters exactly as ``explode`` of
    the NULL array drops them, and a spaceless string's expansion IS
    ``split(cleaned, '/')`` (slashless → the 1-element array).

    Cost: the source is scanned once per branch; at 100 TB prefer one
    scan + the interpreted projection only if the input is
    space-heavy — for part-number-shaped data the second (space-rows)
    scan prunes to near-zero after the filter."""
    cleaned = strip_nuls(col)
    has_space = cleaned.contains(" ")
    fast = df.filter(~has_space).withColumn(out, F.explode(F.split(cleaned, "/")))
    slow = df.filter(has_space).withColumn(out, F.explode(expand_alternatives(col)))
    return fast.unionByName(slow)
