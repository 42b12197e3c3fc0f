"""Text analysis for training-data pipelines: tokenization stats,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions (JVM-side, codegen-friendly) — at 100 TB
these run inside the parquet scan stage with zero Python cost. Word
splitting assumes whitespace-tokenizable text; the BPE-ish token count
uses a regex class split (letters / digits / other) as a cheap proxy
for subword tokenizers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword sets for the n-gram/stopword language-ID
#: heuristic. Deterministic, auditable, and cheap — not a model.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "los"),
    "de": ("der", "die", "und", "das", "ist", "mit", "von"),
    "fr": ("le", "les", "et", "des", "un", "est", "une"),
}

#: A BPE-ish pre-tokenization: letter runs, digit runs, single other
#: non-space chars. A proxy for subword token counting.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def words(text: Column) -> Column:
    """Whitespace word split (single-space tokenization)."""
    return F.split(text, " ")


def n_words(text: Column) -> Column:
    return F.array_size(words(text)).cast("long")


def n_tokens(text: Column) -> Column:
    """BPE-ish token count via regexp extraction."""
    return F.array_size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0))).cast("long")


def word_shingles(text: Column, n: int) -> Column:
    """All ``n``-word shingles (space-joined). Documents shorter than
    ``n`` words yield one (short) shingle — the whole text."""
    ws = words(text)
    cnt = F.greatest(F.array_size(ws) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.array_join(F.slice(ws, i, n), " "),
    )


def stopword_hits(text: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of words that are in the stopword set."""
    return F.size(F.filter(words(text), lambda w: w.isin(*stopwords))).cast("long")


def fingerprint(text: Column, shingle_words: int = 5) -> Column:
    """Document fingerprint: minimum md5 over word shingles — a 1-hash
    MinHash, stable under small reorderings at the edges, usable as a
    near-dup bucket key (rolling-hash fingerprint family)."""
    grams = word_shingles(text, shingle_words)
    return F.array_min(F.transform(grams, lambda g: F.md5(g.cast("binary"))))


def simhash16(text: Column) -> Column:
    """16-bit SimHash over words: bit j is the sign of the sum over
    words of ±1 by the top bit of nibble j of md5(word). Returned as a
    16-char '0'/'1' string (portable across engines — no binary ops).
    """
    ws = words(text)

    def bit_sum(j: int):
        def merge(acc, w):
            nibble = F.substring(F.md5(w.cast("binary")), j + 1, 1)
            return acc + F.when(nibble.between("8", "f"), 1).otherwise(-1)

        return F.aggregate(ws, F.lit(0), merge)

    bits = [F.when(bit_sum(j) >= 0, F.lit("1")).otherwise(F.lit("0")) for j in range(16)]
    return F.concat(*bits)


def langid_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword hit counts (lowercased match)."""
    lowered = F.lower(text)
    return {lang: stopword_hits(lowered, sw) for lang, sw in LANG_STOPWORDS.items()}


def langid_pred(text: Column) -> Column:
    """Argmax language with deterministic tie order (dict order);
    'und' when no stopwords hit at all."""
    scores = langid_scores(text)
    langs = list(scores)
    best = scores[langs[0]]
    for lang in langs[1:]:
        best = F.greatest(best, scores[lang])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best <= 0, F.lit("und")).otherwise(pred)
