"""Deterministic numeric aggregation helpers.

Floating-point sums are order-dependent, and Spark's parallel partial
aggregation visits rows in a nondeterministic order — so ``SUM(double)``
can differ in the low bits between runs and between engines. Every
money/measure aggregate in this engine therefore accumulates in exact
decimal and casts the final result back to double:

    Spark :  SUM(CAST(x AS DECIMAL(28,10)))::double
    DuckDB:  CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE)

Decimal addition is exact and associative, so any execution order (and
any engine) produces bit-identical results — which is what makes the
driver's order-insensitive value-hash comparison against the DuckDB
oracle reliable. The cast-to-double at the end keeps the public schema
engine-neutral (Spark and DuckDB decimal sum output types differ).

DEC_PRECISION/DEC_SCALE are sized for ~1e13 row sums of ~1e5 magnitude
values — comfortably beyond the 100 TB target — while keeping 10
fractional digits, far below double's own 1e-15 relative error.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC_PRECISION = 28
DEC_SCALE = 10
DECIMAL_T = f"decimal({DEC_PRECISION},{DEC_SCALE})"


def dec_sum(col: Column | str, alias: str) -> Column:
    """Exact decimal sum of a double expression, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DECIMAL_T)).cast("double").alias(alias)


def dec_avg(col: Column | str, alias: str) -> Column:
    """Deterministic average: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(DECIMAL_T)).cast("double") / F.count(c)
    ).alias(alias)


def dec_sum_rounded(col: Column | str, alias: str, nd: int = 2) -> Column:
    """:func:`dec_sum` ROUND-wrapped at ``nd`` decimals.

    The decimal cast itself is only per-row exact when the double's
    shortest decimal repr and its exact binary expansion round to the
    same DEC_SCALE grid point — for values above ~4e5 the double ulp
    crosses the 1e-10 grid and Spark (shortest-repr HALF_UP) and DuckDB
    (exact-binary round) can disagree by 1e-10 per row (observed: r5
    judge sweep, w2/r2). ROUND at the data's true decimal precision (2 for
    money) erases that tail on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DECIMAL_T)).cast("double"), nd).alias(alias)


def sql_dec_sum(expr: str, alias: str) -> str:
    """The DuckDB-side twin of :func:`dec_sum` (ANSI SQL string)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({DEC_PRECISION},{DEC_SCALE}))) AS DOUBLE) AS {alias}"


def sql_dec_sum_rounded(expr: str, alias: str, nd: int = 2) -> str:
    """The DuckDB-side twin of :func:`dec_sum_rounded`."""
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL({DEC_PRECISION},{DEC_SCALE})))"
        f" AS DOUBLE), {nd}) AS {alias}"
    )


def sql_dec_avg(expr: str, alias: str) -> str:
    """The DuckDB-side twin of :func:`dec_avg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({DEC_PRECISION},{DEC_SCALE}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
