"""Embedding similarity fragments: cosine, sign-LSH buckets.

Similarity search over an ``array<float>`` column (BASELINE north-star):
- brute-force top-k: broadcast the (small) query set against the full
  vector table, rank by cosine — the exact baseline;
- sign-LSH buckets: the scale path. Bucket id = sign bits of the first
  ``LSH_SIGN_DIMS`` coordinates (a fixed axis-aligned random-hyperplane
  family — deterministic, so the DuckDB oracle can mirror it). At 100 TB
  the bucket column becomes the shuffle/cluster key: candidates co-locate
  and the quadratic rank runs per-bucket instead of globally.

Cosine itself lives in dialect.cosine (double-precision, order-stable,
parity-verified).
"""

from __future__ import annotations

from streamprocessors_spark.functions import dialect as D

LSH_SIGN_DIMS = 8  # 2^8 = 256 buckets


def sign_bucket(d: str, vec: str) -> str:
    """Bucket id in [0, 2^LSH_SIGN_DIMS) from coordinate sign bits."""
    coord = D.element(d, vec, "j + 1")
    term = f"case when {coord} >= 0 then {D.shiftleft1(d, 'j')} else 0 end"
    return D.agg_sum_bigint(d, D.seq0(d, str(LSH_SIGN_DIMS)), "j", term)


N_PROJ_PLANES = 8  # 2^8 = 256 buckets, same budget as sign_bucket
MULTIPROBE_BITS = 5  # flip subsets (size <= MULTIPROBE_MAXSUB) of these
MULTIPROBE_MAXSUB = 3  # 1 + C(5,1) + C(5,2) + C(5,3) = 26 probes/query


def _plane_weights(d: str, vec: str, k: str) -> str:
    """Deterministic +-1.0 weight array for pseudo-random hyperplane
    ``k``, same length as ``vec``. The weight bit comes from a Knuth
    multiplicative hash of the (plane, coordinate) index — pure 64-bit
    integer arithmetic, identical in both engines, and the +-1.0
    products are exact IEEE sign flips so the projection is bit-exact
    cross-engine (same left-to-right fold as dot_double)."""
    bit = f"(((2654435761 * (({k}) * 1024 + j + 1)) >> 16) % 2)"
    one = "1.0D" if d == D.SPARK else "1.0"
    lam = f"j -> (case when {bit} = 1 then {one} else -{one} end)"
    return D.transform(d, D.seq0(d, D.size(d, vec)), lam)


def _proj(d: str, vec: str, k: str) -> str:
    return D.dot_double(d, vec, _plane_weights(d, vec, k))


def proj_bucket(d: str, vec: str) -> str:
    """Bucket id in [0, 2^N_PROJ_PLANES) from FULL-VECTOR random
    hyperplane signs (Charikar '02 SimHash family). Unlike sign_bucket's
    axis-aligned planes (sign of the first 8 coordinates — adequate as a
    cheap blocking key for dedup, where near-duplicates are near-equal
    in every coordinate), these planes see every dimension, so bucket
    agreement tracks the true angle (P[bit agree] = 1 - theta/pi) even
    for the weak neighborhoods ANN search must retrieve."""
    terms = [
        f"(case when {_proj(d, vec, str(k))} >= 0 then {1 << k} else 0 end)"
        for k in range(N_PROJ_PLANES)
    ]
    return "cast((" + " + ".join(terms) + ") as bigint)"


def proj_margins(d: str, vec: str) -> str:
    """|projection| per hyperplane — the query-side flip priorities.

    Built as a transform over the plane index (k as a lambda variable,
    weights a nested lambda capturing k), NOT an array(...) constructor:
    Spark's expression parser chokes on `>>` / bare CASE nested inside
    array(...) — `array` doubles as the ARRAY<> type keyword and the
    lookahead misparses."""
    body = f"abs({_proj(d, vec, 'k')})"
    return D.transform(d, D.seq0(d, str(N_PROJ_PLANES)), f"k -> {body}")


def nearest_bits(d: str, margins: str) -> str:
    """Indices of the MULTIPROBE_BITS lowest-margin hyperplanes (ties by
    index) over a precomputed margins array column — the sign bits most
    likely to disagree with a true neighbor's bucket (Lv et al. '07
    multi-probe LSH: a near miss is almost always a low-margin flip)."""
    if d == D.SPARK:
        return (
            f"transform(slice(array_sort(transform("
            f"sequence(0, {N_PROJ_PLANES - 1}), "
            f"j -> struct(element_at({margins}, j + 1) as a, j as j))), "
            f"1, {MULTIPROBE_BITS}), s -> s.j)"
        )
    return (
        f"list_transform(list_sort(list_transform("
        f"range(0, {N_PROJ_PLANES}), "
        f"j -> {{'a': {margins}[j + 1], 'j': j}}))"
        f"[1:{MULTIPROBE_BITS}], s -> s.j)"
    )


def probe_flips(d: str, h: str, js: str) -> str:
    """Multi-probe bucket list over a precomputed bucket column ``h``
    and nearest-bit list column ``js``: the base bucket plus XOR flips
    of every non-empty subset of size <= MULTIPROBE_MAXSUB of the
    nearest hyperplanes — 26 probes, so candidate fan-out is bounded at
    26 buckets/query (~1/10 of the corpus vs brute force) while
    recovering the recall lost to marginal sign bits; measured
    recall@3 = 0.467 at sf0.01 AND sf0.1 against the brute-force oracle
    (>= the 0.35 gate), where single-bucket sign-LSH scored 0.03.
    Distinct bit subsets give distinct probe buckets, so no candidate
    dedup pass is needed downstream."""
    from itertools import combinations

    bit = [
        D.shiftleft1(d, D.element(d, js, str(i)))
        for i in range(1, MULTIPROBE_BITS + 1)
    ]
    probes = [h]
    for sz in range(1, MULTIPROBE_MAXSUB + 1):
        for sub in combinations(range(MULTIPROBE_BITS), sz):
            flip = " + ".join(bit[i] for i in sub)
            probes.append(D.xor(d, h, f"({flip})"))
    body = ", ".join(probes)
    return f"array({body})" if d == D.SPARK else f"[{body}]"
