"""Cross-engine (Spark <-> DuckDB) exact-arithmetic helpers.

Floating-point SUM/AVG are order-dependent, so a distributed Spark sum
and a DuckDB sum of the same doubles can differ in the last bits and
fail the driver's value-hash compare. Both engines implement exact
decimal arithmetic, and a per-row double->DECIMAL cast is a
deterministic function of the bits of the double in either engine; so
the pattern

    Spark : F.sum(expr.cast("decimal(27,6)")).cast("double")
    DuckDB: CAST(SUM(CAST(expr AS DECIMAL(27,6))) AS DOUBLE)

is order-independent and bit-identical across engines. AVG follows as
exact-sum / count with a single final double division.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"


def dsum(expr: Column) -> Column:
    """Order-independent, oracle-exact sum of a double expression."""
    return F.sum(expr.cast(DEC)).cast("double")


def davg(expr: Column) -> Column:
    """Exact-sum / count average (double), matching davg_sql."""
    return F.sum(expr.cast(DEC)).cast("double") / F.count(F.lit(1))


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)"


# MAGNITUDE BOUND for the decimal discipline: Spark's double->DECIMAL
# cast routes through the double's SHORTEST decimal representation
# (~17 significant digits, java BigDecimal.valueOf), while DuckDB
# converts the exact binary expansion. Below ~1e10 the 6 fractional
# digits sit inside 17 significant digits and both engines agree; a
# term above ~1e11 can differ in the last decimal and break a
# hash-match (observed in a month-index * revenue cross-moment at
# sf0.1). Keep per-term magnitudes under ~1e10 — center/shift
# indices, or split oversized sums — before applying dsum().
