"""Cross-engine (Spark <-> DuckDB) exact-arithmetic helpers.

Floating-point SUM/AVG are order-dependent, so a distributed Spark sum
and a DuckDB sum of the same doubles can differ in the last bits and
fail the driver's value-hash compare. Both engines implement exact
decimal arithmetic, and a per-row double->DECIMAL cast is a
deterministic function of the bits of the double in either engine; so
the pattern

    Spark : F.sum(expr.cast("decimal(27,6)")).cast("string").cast("double")
    DuckDB: CAST(CAST(SUM(CAST(expr AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)

is order-independent and bit-identical across engines. AVG follows as
exact-sum / count with a single final double division.

WHY THE STRING HOP (round-8 sf1.0 sweep finding): the final
DECIMAL->DOUBLE cast is NOT correctly rounded in either engine once
the sum needs >15-16 significant digits — DuckDB computes
int128->double THEN divides by 10^scale (two roundings; measured one
ulp high on the exact decimal 27864155010.941590), and Java
BigDecimal.doubleValue() takes magnitude-dependent shortcuts. Both
engines' STRING->DOUBLE parses ARE correctly rounded (fast_float /
Double.parseDouble), and DECIMAL->STRING is exact in both, so routing
the one output-row conversion through the decimal's string form makes
the resulting double the correctly-rounded value of the exact sum at
ANY magnitude — 100 TB sums included. Cost: one format+parse per
OUTPUT row, zero per-input-row work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"


def dsum(expr: Column) -> Column:
    """Order-independent, oracle-exact sum of a double expression:
    exact DECIMAL accumulation, correctly-rounded double via the
    string hop (see module docstring)."""
    return F.sum(expr.cast(DEC)).cast("string").cast("double")


def davg(expr: Column) -> Column:
    """Exact-sum / count average (double), matching davg_sql."""
    return (
        F.sum(expr.cast(DEC)).cast("string").cast("double")
        / F.count(F.lit(1))
    )


def dsum_sql(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS VARCHAR) "
        f"AS DOUBLE)"
    )


def davg_sql(expr: str) -> str:
    return f"{dsum_sql(expr)} / COUNT(*)"


# MAGNITUDE BOUND for the per-TERM side of the discipline: Spark's
# double->DECIMAL cast routes through the double's SHORTEST decimal
# representation (~17 significant digits, java BigDecimal.valueOf),
# while DuckDB converts the exact binary expansion. Below ~1e10 the 6
# fractional digits sit inside 17 significant digits and both engines
# agree; a term above ~1e11 can differ in the last decimal and break
# a hash-match (observed in a month-index * revenue cross-moment at
# sf0.1). Keep per-term magnitudes under ~1e10 — center/shift
# indices, or split oversized sums — before applying dsum(). (The
# string hop above fixes only the OUTPUT conversion; per-term casts
# at sane magnitudes were already exact.)
