"""Order-independent exact aggregates over fixed-point doubles.

THE PROBLEM (r12 oracle sweep): the driver's correctness gate
hash-compares Spark against DuckDB, but `ROUND(SUM(double), k)` is a
corpus lottery when the summand terminates at MORE than k decimals —
TPC-H revenue terms `l_extendedprice * (1 - l_discount)` terminate at 4
decimals, so rounding the sum at 2 leaves a structural ~1%-per-group
chance that the discarded digits are exactly "50", and at such a tie
the engines disagree (Spark rounds the double's shortest decimal repr
HALF_UP; DuckDB rounds in binary — the SAME double rounds differently).
Averages are worse: a 2dp sum over a 2,5-smooth group count terminates
just past the rounding scale (q73's sum/8 at 4dp was a live ~10% tie).

THE FIX: convert each ROW to exact integer units before aggregating —
`FLOOR(x * 10^scale + 0.5)` is pure IEEE arithmetic on an identical
double, and the per-row float noise it absorbs is bounded by the ulp of
one product (~1e-7 at 1e9 units) against a 0.5-unit boundary, so both
engines produce the SAME BIGINT. Integer sums are exact and
order-independent; the final division(s) run on identical operands and
are therefore bit-equal. Emit the result UNROUNDED — re-rounding the
quotient would reintroduce the tie.

The oracle twin of `exact_sum(col, s)` is
    SUM(CAST(FLOOR((col) * 10^s + 0.5) AS BIGINT)) / 10^s.0
and of `exact_avg(col, s)`
    SUM(CAST(FLOOR((col) * 10^s + 0.5) AS BIGINT)) / 10^s.0 / COUNT(col)
— mirror the operation ORDER exactly; each division must see the same
operands on both sides.

Bounds: the BIGINT unit sum holds ~9.2e18, i.e. ~9e14 dollars at
scale=4 — fine for any local oracle corpus (the driver compares at
sf <= 0.1) and for per-partition partial sums at cluster scale; a
100 TB GLOBAL total in 6dp units would need a DECIMAL(38) accumulator
instead (Spark's sum(long) overflows silently only past 9.2e18).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def unit_col(expr: Column, scale: int) -> Column:
    """expr as exact integer 10^-scale units (BIGINT), absorbing float
    noise up to half a unit. expr's true value must terminate within
    `scale` decimals for this to be lossless."""
    return F.floor(expr * (10**scale) + F.lit(0.5)).cast("long")


def exact_sum(expr: Column, scale: int) -> Column:
    """Deterministic SUM of a fixed-point column, emitted as DOUBLE."""
    return F.sum(unit_col(expr, scale)) / float(10**scale)


def exact_avg(expr: Column, scale: int) -> Column:
    """Deterministic AVG of a fixed-point column, emitted as DOUBLE
    (units / 10^scale / count — mirror this order in the oracle)."""
    return F.sum(unit_col(expr, scale)) / float(10**scale) / F.count(expr)
