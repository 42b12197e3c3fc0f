"""Register-word decoding and address-block expansion (C1, C3, C9).

Native Column expressions only — everything here stays inside
whole-stage codegen; no Python executes per row.

Reference semantics (SURVEY.md §2.9; Prensas.py:450-471):
  * C1 ``decodificar_bloque``: each 16-bit word → two ASCII chars,
    LOW byte first (``chr(v & 0xFF) + chr((v >> 8) & 0xFF)``); chars
    concatenated across the block; NUL bytes stripped; a NULL block
    decodes to NULL.
  * C3 ``expand_block``: ``("D3100", 3) → ["D3100","D3101","D3102"]``
    — alpha prefix + arithmetic suffix sequence.
  * C9: NUL / space removal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_nuls(col: Column) -> Column:
    """C9: remove NUL characters (Prensas.py:443,462)."""
    return F.translate(col, "\x00", "")


def strip_spaces(col: Column) -> Column:
    """C9: remove space characters (Prensas.py:448)."""
    return F.translate(col, " ", "")


def word_to_chars(word: Column) -> Column:
    """One 16-bit register word → its two ASCII chars, low byte first
    (Prensas.py:458-461). Domain is 0..65535; masks guard wider input."""
    low = F.char(word.bitwiseAND(F.lit(0xFF)))
    high = F.char(F.shiftright(word, 8).bitwiseAND(F.lit(0xFF)))
    return F.concat(low, high)


def decode_block(words: Column) -> Column:
    """C1: array<int> of register words → decoded string with NULs
    stripped (the reference's ``cadena_original``, Prensas.py:458-462).
    NULL array → NULL string (Prensas.py:454-455)."""
    joined = F.array_join(F.transform(words, word_to_chars), "")
    return F.when(words.isNull(), F.lit(None).cast("string")).otherwise(strip_nuls(joined))


def expand_block(address: Column, length: Column) -> Column:
    """C3: ``("D3100", 3) → ["D3100","D3101","D3102"]``
    (Prensas.py:467-471). Prefix = leading non-digit run; suffix =
    trailing integer. Non-positive length → empty array."""
    prefix = F.regexp_extract(address, r"^(\D*)", 1)
    base = F.regexp_extract(address, r"(\d+)", 1).try_cast("long")
    seq = F.sequence(F.lit(0).cast("long"), length.cast("long") - F.lit(1).cast("long"))
    out = F.transform(seq, lambda i: F.concat(prefix, (base + i).cast("string")))
    return F.when(length >= 1, out).otherwise(F.array().cast("array<string>"))
