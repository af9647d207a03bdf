"""Exact wide-integer arithmetic expressions (shared by the integer-
milli lift/score family).

The lift scores x78/x84 compute are ``1000 * a * b // (c * d)`` over
corpus-scale counts.  At the 100 TB design point the numerator exceeds
2^63 (corpus token counts ~1e13 x pair counts ~1e9), where the two
engines diverge: Spark raises ARITHMETIC_OVERFLOW under ANSI mode (the
session default here) or wraps silently without it, while DuckDB
raises — so the sf0.01 hash gate could never catch the production
failure (ADVICE r11).  The fix is to carry the product through a
128-bit-capable type: DECIMAL(38,0) on the Spark side, HUGEINT in the
DuckDB oracle.  Both are exact for products up to 1e38, far above any
reachable count product (1000 * 1e13 tokens * 1e13 tokens = 1e29).

Floor division is reconstructed as ``(n - n % d) / d`` because Spark's
``div`` operator requires integral operands and plain decimal division
rounds HALF_UP at result scale 6 — a true quotient within 5e-7 below an
integer would round across the floor boundary.  The mod form subtracts
the exact remainder first (decimal ``%`` is exact), so the division's
result is an integer and the scale-6 rounding is a no-op.  Verified
equal to Python's big-int ``//`` on both engines, including above-2^63
numerators.
"""

from __future__ import annotations

from typing import Sequence


def _product(terms: Sequence[object], cast: str) -> str:
    """``CAST(t0 AS <cast>) * t1 * ...`` — one cast is enough: the wide
    first operand promotes the whole chain in both engines."""
    terms = [str(t) for t in terms]
    return " * ".join([f"CAST({terms[0]} AS {cast})"] + terms[1:])


def spark_exact_floordiv(
    num_terms: Sequence[object], den_terms: Sequence[object]
) -> str:
    """Spark SQL expression: exact ``floor(prod(num) / prod(den))`` as
    BIGINT for POSITIVE integer operands, overflow-safe to 1e38."""
    n = _product(num_terms, "DECIMAL(38,0)")
    d = _product(den_terms, "DECIMAL(38,0)")
    return f"CAST((({n}) - ({n}) % ({d})) / ({d}) AS BIGINT)"


def duck_exact_floordiv(
    num_terms: Sequence[object], den_terms: Sequence[object]
) -> str:
    """DuckDB SQL expression: the same exact floor division via
    HUGEINT (native 128-bit integer ``//``)."""
    n = _product(num_terms, "HUGEINT")
    d = _product(den_terms, "HUGEINT")
    return f"CAST(({n}) // ({d}) AS BIGINT)"
