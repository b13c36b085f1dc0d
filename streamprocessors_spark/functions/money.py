"""Exact-money SQL fragments, valid verbatim in Spark SQL AND DuckDB.

Double summation is order-dependent: ``floor(sum(double)*100)/100`` assumes
the input sum is bit-identical across engines, but a last-ulp difference
between Spark's and DuckDB's accumulation order can land exactly on a
quantization boundary and flip a full cent (the round-2 driver caught
exactly this on q22: 107357.17 vs 107357.16). The robust form quantizes
each ROW to integer units first — ``round``/``floor`` of a *single* double
is bit-identical in both engines because it depends only on the binary
value (ties at k+0.5 are exactly representable below 2^52 and both engines
round them away from zero) — then sums BIGINTs, which is exact and
order-independent. Every derived double (division, ratios, quantized
averages) is then computed from identical inputs with the identical
expression text, so it is bit-identical too.

Each helper returns ONE text fragment that parses the same way in Spark SQL
(via ``F.expr``) and DuckDB — the two sides share the literal string, so
they cannot drift. The outer ``cast(sum(..) as bigint)`` is a no-op in
Spark but collapses DuckDB's HUGEINT sum result (see tools/canon_audit.py:
HUGEINT breaks the driver's pandas hasher).
"""

from __future__ import annotations


def units(x: str, scale: int = 100) -> str:
    """Integer units of a money/ratio double: round((x) * scale) as BIGINT."""
    return f"cast(round(({x}) * {scale}) as bigint)"


def sum_units(x: str, scale: int = 100) -> str:
    """Exact BIGINT sum of per-row integer units (order-independent)."""
    return f"cast(sum({units(x, scale)}) as bigint)"


def _dbl(lit: object) -> str:
    """A double literal both dialects agree on. Bare decimal literals parse
    as DECIMAL in both Spark SQL and DuckDB, and decimal arithmetic widens/
    rounds differently (and Spark would emit DecimalType, which the
    driver's pandas hasher handles badly) — so every numeric literal in
    these fragments is cast explicitly."""
    return f"cast({lit} as double)"


def money_sum(x: str) -> str:
    """Exact-cents sum emitted as dollars (double; bit-identical both
    engines because it is BIGINT / double-100)."""
    return f"{sum_units(x)} / {_dbl(100)}"


def avg_quant(sum_frag: str, decimals: int, unit_scale: int = 100) -> str:
    """Quantized average of an exact integer-unit sum: floor to ``decimals``
    places. sum_frag must be a BIGINT aggregate fragment (e.g. sum_units);
    the division runs over identical bigints in both engines.
    """
    out = 10**decimals
    mult = out / unit_scale
    # The multiplier is a power-of-ten ratio — exact as a double literal.
    m = _dbl(int(mult)) if mult >= 1 else _dbl(repr(mult))
    return f"floor({sum_frag} * {m} / count(*)) / {_dbl(out)}"


def ratio_quant(num_frag: str, den_frag: str, decimals: int, pct: bool = False) -> str:
    """Quantized ratio of two exact BIGINT aggregates, optionally *100."""
    out = 10**decimals
    lead = f"{_dbl(100)} * " if pct else f"{_dbl(1)} * "
    return f"floor({lead}{num_frag} / {den_frag} * {out}) / {_dbl(out)}"
