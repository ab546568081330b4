"""Determinism helpers (SURVEY.md §2 Part B preamble).

Floats that pass through aggregation or arithmetic are rounded to 6
decimal places in every query output so the order-insensitive value
hash is stable between Spark and the DuckDB oracle. Both engines round
half away from zero for doubles, and both produce bit-identical IEEE
doubles for the same rounded decimal, so ``round(x, 6)`` is a stable
canonical form as long as the pre-rounding values agree to well under
1e-6 (true for all declared aggregates at test scale; columns that ever
fail the hash get switched to an exact DECIMAL computation instead —
see ``dec6``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r6(col: Column | str) -> Column:
    """Round a double column to 6 decimal places (canonical output form)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 6)


def r6d(col: Column | str, alias: str) -> Column:
    """round-to-6 + alias in one step (every computed column is aliased)."""
    return r6(col).alias(alias)


def sum6(col: Column | str) -> Column:
    """Exact-decimal sum with double output — for money-scale sums where
    ``round(sum(double), 6)`` exceeds double precision (e.g. a 3e8 total
    needs 15+ significant digits at 6dp). Casting the *inputs* to
    decimal makes the aggregation exact and order-independent; the final
    cast back to double is correctly rounded on both engines, so values
    and schema match the oracle bit-for-bit.

    The input cast is DECIMAL(18,6), not wider: precision ≤ 18 keeps the
    per-row value on Spark's compact-long Decimal representation (an
    unscaled 64-bit long inside UnsafeRow) instead of a heap BigDecimal
    per row — measured ~5× faster at sf1 (0.5 s vs 2.5 s steady-state
    for a two-column grouped sum over 6M rows). Bounds: inputs must be
    < 1e12 in magnitude (money columns here are ≤ ~6e5); the sum itself
    widens to DECIMAL(28,6), overflowing only past 1e22 — at 100 TB
    (~7e11 lineitem rows × ~1e5 price) totals reach ~7e16, five orders
    of magnitude of headroom, and ANSI mode raises rather than wraps if
    a future column ever exceeds it.

    Oracle-side equivalent: ``CAST(sum(CAST(x AS DECIMAL(27,6))) AS DOUBLE)``
    (see ``SUM6`` format helper) — the oracle's wider precision is
    harmless: both casts quantize a double to the same 6-dp value, so
    the sums agree exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,6)")).cast("double")


# Oracle-side template matching sum6 (use .format(expr=...)).
SUM6 = "CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


_EPOCH_NTZ = "1970-01-01 00:00:00"


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since the epoch for a TIMESTAMP_NTZ column.

    ``unix_micros`` only accepts TIMESTAMP (LTZ) and raises on the NTZ
    columns Spark ≥4.1 produces for the nanos-precision events fixture.
    ``timestamp_diff`` is NTZ-exact and timezone-independent (no session
    zone enters the computation). If the input is LTZ, Spark coerces the
    epoch literal with the session zone — a uniform base shift, so
    differences and fixed-width bucketing stay correct; don't compare the
    absolute value against external epoch constants in that case.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND", F.lit(_EPOCH_NTZ).cast("timestamp_ntz"), c
    )


def micros_between(start: Column | str, end: Column | str) -> Column:
    """µs-exact ``end - start`` for timestamp columns of either flavor
    (both sides must be the same flavor; NTZ- and LTZ-safe)."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return F.timestamp_diff("MICROSECOND", s, e)
