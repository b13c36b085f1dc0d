"""Text preparation fragments: tokenization, shingling, fingerprints.

Used by the dedup / text-analysis operator family (BASELINE north-star set,
beyond the reference surface — SURVEY.md §2 end-note and §7.2 milestone 8).
All fragments are dual-dialect (see .dialect) and stay inside whole-stage
codegen on the Spark side.
"""

from __future__ import annotations

from streamprocessors_spark.functions import dialect as D

# Word n-gram size for shingle-based dedup; chosen to match the classic
# 3-shingle document-dedup setup (Broder '97 resemblance estimation).
SHINGLE_N = 3

# Winnowing (Schleimer et al., SIGMOD '03): hash word k-grams, slide a
# window of W consecutive hashes, keep each window's minimum.
WINNOW_K = 5
WINNOW_W = 4


def shingles(d: str, words_expr: str) -> str:
    """Distinct word-``SHINGLE_N``-grams of a token array (space-joined).

    Guarded so documents shorter than N words produce an empty array in
    both engines (Spark ANSI mode would otherwise fault on element_at).
    """
    n = SHINGLE_N
    idx = D.seq1(d, f"{D.size(d, words_expr)} - {n - 1}")
    parts = " || ' ' || ".join(
        D.element(d, words_expr, f"i + {j}") for j in range(n)
    )
    gram = D.transform(d, idx, f"i -> {parts}")
    empty = "array()" if d == D.SPARK else "[]::VARCHAR[]"
    return (
        f"case when {D.size(d, words_expr)} >= {n} "
        f"then {D.distinct(d, gram)} else {empty} end"
    )


def word_hashes(d: str, words_expr: str, distinct: bool = True) -> str:
    """60-bit hashes of a token array. ``distinct=False`` keeps repeats so a
    downstream majority vote is term-frequency weighted (SimHash needs this:
    on corpora sharing one vocabulary, unweighted signatures collapse)."""
    arr = D.distinct(d, words_expr) if distinct else words_expr
    return D.transform(d, arr, f"w -> {D.md5int(d, 'w')}")


def kgram_hashes(d: str, words_expr: str) -> str:
    """Hashes of *positional* word ``WINNOW_K``-grams (doc order kept)."""
    k = WINNOW_K
    idx = D.seq1(d, f"{D.size(d, words_expr)} - {k - 1}")
    parts = " || ' ' || ".join(
        D.element(d, words_expr, f"i + {j}") for j in range(k)
    )
    gram_hash = D.md5int(d, f"({parts})")
    empty = "array()" if d == D.SPARK else "[]::BIGINT[]"
    return (
        f"case when {D.size(d, words_expr)} >= {k} "
        f"then {D.transform(d, idx, f'i -> {gram_hash}')} "
        f"else {empty} end"
    )


def winnow_fingerprints(d: str, hashes_expr: str) -> str:
    """Sorted distinct window-minima of a hash sequence (the fingerprint set)."""
    w = WINNOW_W
    idx = D.seq1(d, f"{D.size(d, hashes_expr)} - {w - 1}")
    win_min = D.arr_min(d, D.slice_(d, hashes_expr, "j", w))
    mins = D.transform(d, idx, f"j -> {win_min}")
    empty = "array()" if d == D.SPARK else "[]::BIGINT[]"
    return (
        f"case when {D.size(d, hashes_expr)} >= {w} "
        f"then {D.arr_sort(d, D.distinct(d, mins))} else {empty} end"
    )
