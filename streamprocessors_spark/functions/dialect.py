"""Dual-dialect SQL fragment builders (Spark SQL <-> DuckDB SQL).

The driver's correctness gate runs each Spark plan against a DuckDB oracle
and hash-compares values, so any expression used in an LLM-pipeline query
must be *bit-identical* across engines. These builders emit the same
computation in either dialect from shared templates; parity is pinned by
tests/test_llm_ops.py.

Verified equivalences (empirically, DuckDB v1.0 / Spark 4.1):
- ``md5()`` hex output matches; 15 hex chars -> BIGINT is exact (< 2^60).
- Double-precision left-to-right accumulation over arrays matches once the
  DuckDB side casts FLOAT[] -> DOUBLE[] before the dot product.
- ``string_split_regex`` / ``split`` agree on ``\\s+`` tokenization.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"


def md5int(d: str, x: str) -> str:
    """Deterministic 60-bit integer hash of a string expression.

    Both engines agree on md5 hex; we take the first 15 hex digits so the
    value always fits a signed 64-bit integer exactly.
    """
    if d == SPARK:
        return f"cast(conv(substr(md5({x}),1,15),16,10) as bigint)"
    return f"('0x'||substr(md5({x}),1,15))::BIGINT"


def words(d: str, col: str = "text") -> str:
    """Lower-cased whitespace tokens with empties removed (doc order kept)."""
    if d == SPARK:
        return f"filter(split(lower({col}), '\\\\s+'), x -> x <> '')"
    return f"list_filter(string_split_regex(lower({col}), '\\s+'), x -> x <> '')"


def size(d: str, a: str) -> str:
    return f"size({a})" if d == SPARK else f"len({a})"


def distinct(d: str, a: str) -> str:
    return f"array_distinct({a})" if d == SPARK else f"list_distinct({a})"


def transform(d: str, a: str, lam: str) -> str:
    return (
        f"transform({a}, {lam})" if d == SPARK else f"list_transform({a}, {lam})"
    )


def filter_(d: str, a: str, lam: str) -> str:
    return f"filter({a}, {lam})" if d == SPARK else f"list_filter({a}, {lam})"


def arr_min(d: str, a: str) -> str:
    return f"array_min({a})" if d == SPARK else f"list_min({a})"


def arr_max(d: str, a: str) -> str:
    return f"array_max({a})" if d == SPARK else f"list_max({a})"


def arr_sort(d: str, a: str) -> str:
    return f"array_sort({a})" if d == SPARK else f"list_sort({a})"


def element(d: str, a: str, i: str) -> str:
    """1-based element access (in-bounds only; Spark runs ANSI mode)."""
    return f"element_at({a}, {i})" if d == SPARK else f"{a}[{i}]"


def seq1(d: str, n: str) -> str:
    """[1..n] inclusive as an array expression."""
    return f"sequence(1, {n})" if d == SPARK else f"range(1, ({n})+1)"


def seq0(d: str, n: str) -> str:
    """[0..n-1] as an array expression."""
    return f"sequence(0, ({n})-1)" if d == SPARK else f"range(0, {n})"


def slice_(d: str, a: str, start: str, length: int) -> str:
    """1-based slice of fixed length."""
    if d == SPARK:
        return f"slice({a}, {start}, {length})"
    return f"{a}[({start}):({start})+{length - 1}]"


def join_csv(d: str, a: str) -> str:
    """Array -> comma-joined string (elements cast to string)."""
    if d == SPARK:
        return f"concat_ws(',', transform({a}, v -> cast(v as string)))"
    return f"array_to_string({a}, ',')"


def contains(d: str, a: str, x: str) -> str:
    return f"array_contains({a}, {x})" if d == SPARK else f"list_contains({a}, {x})"


def intersect_size(d: str, a: str, b: str) -> str:
    """|distinct(a) ∩ distinct(b)| (both engines dedup in *_intersect)."""
    if d == SPARK:
        return f"size(array_intersect({a}, {b}))"
    return f"len(list_intersect({a}, {b}))"


def union_size(d: str, a: str, b: str) -> str:
    """|distinct(a) ∪ distinct(b)|."""
    if d == SPARK:
        return f"size(array_union({a}, {b}))"
    return f"len(list_distinct({a} || {b}))"


def str_array(d: str, items: list[str]) -> str:
    lit = ", ".join(f"'{w}'" for w in items)
    return f"array({lit})" if d == SPARK else f"[{lit}]"


def shiftleft1(d: str, b: str) -> str:
    """(1::BIGINT) << b."""
    return f"shiftleft(1L, {b})" if d == SPARK else f"(1::BIGINT << {b})"


def xor(d: str, a: str, b: str) -> str:
    return f"({a} ^ {b})" if d == SPARK else f"xor({a}, {b})"


def agg_sum_bigint(d: str, a: str, lam_var: str, body: str) -> str:
    """Sum of ``body(lam_var)`` over array ``a``, as BIGINT."""
    if d == SPARK:
        return f"aggregate({a}, 0L, (acc, {lam_var}) -> acc + ({body}))"
    return (
        f"list_sum(list_transform({a}, {lam_var} -> ({body})::BIGINT))::BIGINT"
    )


def dot_double(d: str, a: str, b: str) -> str:
    """Left-to-right double-precision dot product of two float arrays."""
    if d == SPARK:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
            f" 0D, (acc, v) -> acc + v)"
        )
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def floor_round(d: str, x: str, decimals: int) -> str:
    """Quantize a double to ``decimals`` places via floor — unlike round(),
    which Spark evaluates on the shortest decimal string (half-up) and DuckDB
    on the binary value, floor(x*10^n)/10^n is pure float arithmetic and
    therefore bit-identical across engines."""
    scale = 10**decimals
    return f"(floor(({x}) * {scale}) / cast({scale} as double))"


def cosine(d: str, a: str, b: str, decimals: int = 6) -> str:
    """Cosine similarity quantized to ``decimals`` (parity-safe output form)."""
    raw = (
        f"{dot_double(d, a, b)} / "
        f"sqrt({dot_double(d, a, a)} * {dot_double(d, b, b)})"
    )
    return floor_round(d, raw, decimals)


def cosine_ikey(d: str, a: str, b: str, decimals: int = 6) -> str:
    """The same quantized cosine as an exact BIGINT (floor(raw * 10^n)).

    Ordering by this integer is identical to ordering by cosine(); it
    exists so argmax-style selections can run as a single map-side
    ``max_by``/``arg_max`` aggregate over a scalar key (optionally packed
    with a tie-break term) instead of a row_number window over the
    expanded N x k cross-join."""
    raw = (
        f"{dot_double(d, a, b)} / "
        f"sqrt({dot_double(d, a, a)} * {dot_double(d, b, b)})"
    )
    return f"cast(floor(({raw}) * {10**decimals}) as bigint)"


def cosine_pre(d: str, a: str, b: str, na: str, nb: str, decimals: int = 6) -> str:
    """cosine() with the two self-dot-products factored into columns
    (``na`` = dot(a,a), ``nb`` = dot(b,b), typically computed once per
    vector upstream). Bit-identical to cosine(): the same IEEE operations
    on the same doubles, merely computed through a column — but each pair
    costs ONE interpreted-HOF dot product instead of three (Spark runs
    aggregate()/zip_with lambdas outside codegen, so the dot dominates
    pairwise cosine cost; measured ~2-3x on the ANN/dedup families)."""
    scale = 10**decimals
    return (
        f"(floor(({dot_double(d, a, b)} / sqrt({na} * {nb})) * {scale})"
        f" / cast({scale} as double))"
    )


def arg_max_by(d: str, value: str, key: str) -> str:
    """value at the row where key is maximal (key must be duplicate-free
    within the group for determinism — pack the tie-break into the key)."""
    return f"max_by({value}, {key})" if d == SPARK else f"arg_max({value}, {key})"


def regexp_all_count(d: str, col: str, pattern: str) -> str:
    """Number of non-overlapping regex matches in a string."""
    if d == SPARK:
        return f"size(regexp_extract_all({col}, '{pattern}', 0))"
    return f"len(regexp_extract_all({col}, '{pattern}'))"


def sql_regex_lit(d: str, pattern: str) -> str:
    """A raw regex as a SQL string literal: Spark's parser eats one level
    of backslash escaping inside string literals, DuckDB's does not."""
    return pattern.replace("\\", "\\\\") if d == SPARK else pattern


def regexp_replace_all(d: str, col: str, pattern: str, replacement: str) -> str:
    """Global regex replacement (Spark replaces all matches by default;
    DuckDB needs the 'g' flag). ``pattern`` is the RAW regex."""
    lit = sql_regex_lit(d, pattern)
    if d == SPARK:
        return f"regexp_replace({col}, '{lit}', '{replacement}')"
    return f"regexp_replace({col}, '{lit}', '{replacement}', 'g')"
