"""Word n-gram shingle construction shared by the dedup candidate
generators (MinHash/SimHash/Jaccard — operators/dedup.py) and the text
analysis operators (fingerprints, repetition — operators/textops.py).

One definition so the shingle/tokenization scheme cannot silently diverge
between the operators and the DuckDB oracles that grade them: tokens are
``split(lower(text), ' ')``, a shingle is ``n`` consecutive tokens joined
with a single space, duplicates kept (``size - n + 1`` shingles). Pure
array expressions — no explode, no shuffle; the shingle multiset never
leaves its row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_shingles(text_col, n: int, short_fallback: Column | None = None) -> Column:
    """Word n-gram shingles as an array column, duplicates kept.

    ``short_fallback`` is the array used when the text has fewer than
    ``n`` words: default the empty array (dedup set semantics); the text
    operators pass ``F.array(F.lower(text_col))`` to keep one whole-text
    shingle instead.
    """
    words = F.split(F.lower(text_col), " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + F.lit(j + 1)) for j in range(n)]
        ),
    )
    if short_fallback is None:
        short_fallback = F.array().cast("array<string>")
    return F.when(F.size(words) >= n, shingles).otherwise(short_fallback)
