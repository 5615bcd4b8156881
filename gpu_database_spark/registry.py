"""Central registry of declared queries + DuckDB oracle SQL.

Every operator the engine claims (SURVEY.md §2) registers here with
``@register("name", oracle="SELECT ...")``; ``__spark_entry__.py``
re-exports :func:`queries` / :func:`oracle_sql` for the verification
driver. Queries with no SQL-expressible oracle (custom stateful
streaming, iterative algorithms, approximate ops) register with
``oracle=None`` and get the driver's weaker rows-only check.

Oracle-compat rules used throughout (hash-match discipline):
* alias every computed column identically in Spark and SQL;
* double-typed aggregates go through exact DECIMAL(27,6) sums and a
  final cast to DOUBLE (order-independent, bit-identical across
  engines) — see ``functions/compat.py``;
* timestamps are emitted as epoch micro/seconds BIGINT or formatted
  strings, never raw (dodges ns-vs-us and tz representation drift);
* every ORDER BY / top-k has a total tiebreak so LIMIT is stable.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}
_LOADED = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: declare a query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for their registration side effects.
    from gpu_database_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        aria_queries,
        asof,
        extras,
        joins,
        relational,
        setops,
        skyline,
        sorts,
        tpch,
        windows,
    )
    from gpu_database_spark.functions import scalars  # noqa: F401
    from gpu_database_spark.llm import (  # noqa: F401
        dedup,
        multimodal,
        similarity,
        textstats,
    )
    from gpu_database_spark.streaming import batch_equiv  # noqa: F401

    _LOADED = True


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
