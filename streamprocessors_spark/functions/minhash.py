"""MinHash + banded LSH and SimHash fragments (near-dup detection).

MinHash (Broder '97): per permutation i, sig_i = min over shingles s of
(a_i * h(s) + b_i) mod P, with h(s) the shared md5-derived hash reduced
mod P. P = 2^31 - 1 (Mersenne prime) keeps every intermediate product
< 2^62, i.e. exact in signed 64-bit arithmetic in BOTH engines (DuckDB
raises on int64 overflow; Spark wraps — neither can happen here).

Banding: K_PERMS signatures split into BANDS bands of ROWS_PER_BAND;
documents colliding on any (band_idx, band_hash) are candidate pairs,
then verified with *exact* shingle Jaccard (integer intersection/union,
no floats anywhere near the correctness gate).

SimHash (Charikar '02): SIMHASH_BITS-bit signature; bit b is set iff the
majority of distinct word hashes have bit b set. Pair distance =
popcount(xor). 48 bits so the signature stays a positive BIGINT in both
engines (bit 63 would need unsigned semantics).
"""

from __future__ import annotations

from streamprocessors_spark.functions import dialect as D

P = 2_147_483_647  # 2^31 - 1

# Fixed (a, b) permutation constants — arbitrary odd values < P, pinned so
# Spark plan and DuckDB oracle derive the identical signature.
PERMS: list[tuple[int, int]] = [
    (1_203_114_875, 613_028_467),
    (1_949_703_747, 102_487_621),
    (737_214_209, 1_821_554_443),
    (452_392_817, 928_716_289),
    (1_113_654_337, 306_459_137),
    (868_928_489, 1_651_073_027),
    (1_547_206_403, 48_302_219),
    (293_485_061, 1_402_958_393),
    (1_763_920_129, 771_604_481),
    (622_113_793, 1_215_887_261),
    (1_084_751_627, 493_026_899),
    (342_871_559, 1_909_234_577),
    (1_638_402_893, 211_748_843),
    (911_364_007, 1_087_420_691),
    (190_283_471, 1_562_974_151),
    (1_412_837_683, 85_416_257),
][:16]

K_PERMS = 16
BANDS = 4
ROWS_PER_BAND = 4
assert BANDS * ROWS_PER_BAND == K_PERMS

SIMHASH_BITS = 48


def hashes_mod_p(d: str, arr_expr: str) -> str:
    """Hash every element of a string array into [0, P).

    Oracle-side formulation (DuckDB vectorizes list lambdas). The Spark
    plan does NOT use this array form: HOF lambdas run interpreted there,
    so it explodes the grams and applies the identical md5int % P as a
    codegen scalar (plans/llm_ops.py:minhash_candidate_pairs)."""
    return D.transform(d, arr_expr, f"s -> ({D.md5int(d, 's')}) % {P}")


def _perms_array(d: str) -> str:
    """The (a, b) permutation constants as an array-of-struct literal."""
    if d == D.SPARK:
        items = ", ".join(f"named_struct('a', {a}L, 'b', {b}L)" for a, b in PERMS)
        return f"array({items})"
    items = ", ".join(f"{{'a': {a}::BIGINT, 'b': {b}::BIGINT}}" for a, b in PERMS)
    return f"[{items}]"


def minhash_signature(d: str, hashes_expr: str) -> str:
    """Array of K_PERMS minhash values over a pre-hashed array (see above).

    One nested lambda over the permutation-constant array rather than 16
    inlined min-expressions: identical arithmetic, ~16x less generated
    code (the inlined form took seconds of janino compilation and thrashed
    the codegen class cache between bench queries)."""
    if d == D.SPARK:
        return (
            f"transform({_perms_array(d)}, "
            f"p -> array_min(transform({hashes_expr}, h -> (p.a * h + p.b) % {P})))"
        )
    return (
        f"list_transform({_perms_array(d)}, "
        f"p -> list_min(list_transform({hashes_expr}, h -> (p['a'] * h + p['b']) % {P})))"
    )


def band_hash(d: str, sig_expr: str, band_idx: int) -> str:
    """Deterministic hash of one signature band (1-based slice)."""
    start = band_idx * ROWS_PER_BAND + 1
    sl = D.slice_(d, sig_expr, str(start), ROWS_PER_BAND)
    return D.md5int(d, D.join_csv(d, sl))


def simhash(d: str, word_hashes_expr: str) -> str:
    """SIMHASH_BITS-bit majority-vote signature over distinct word hashes."""
    n = D.size(d, word_hashes_expr)
    ones = D.size(
        d, D.filter_(d, word_hashes_expr, "h -> ((h >> b) & 1) = 1")
    )
    bit_term = (
        f"case when 2 * {ones} > {n} then {D.shiftleft1(d, 'b')} else 0 end"
    )
    return D.agg_sum_bigint(d, D.seq0(d, str(SIMHASH_BITS)), "b", bit_term)


def hamming(d: str, a: str, b: str) -> str:
    return f"bit_count({D.xor(d, a, b)})"
