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

from pyspark.sql import Column
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
