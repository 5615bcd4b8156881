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

import glob
import json
import os
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
        behavior,
        dataquality,
        extras,
        joins,
        maintenance,
        relational,
        setops,
        skyline,
        sorts,
        sql_surface,
        stattests,
        tpch,
        windows,
    )
    from gpu_database_spark.functions import scalars  # noqa: F401
    from gpu_database_spark.llm import (  # noqa: F401
        curation,
        dedup,
        features,
        filtering,
        graphrank,
        multimodal,
        sampling,
        similarity,
        textstats,
    )
    from gpu_database_spark.streaming import batch_equiv  # noqa: F401

    _LOADED = True


def _driver_history() -> dict[str, int]:
    """Name -> LATEST round with a GREEN driver row.

    The verification driver samples the FIRST 50 keys of ``queries()``
    and writes per-round evidence to ``CORRECTNESS_r{N}.json`` at the
    repo root. Reading those files back lets the registry rotate
    not-yet-driver-green queries to the front each round, so every
    declared query eventually earns a driver-green row with no manual
    bookkeeping. A row only counts if it actually passed (no error and
    rows matched) — a name whose last sample errored or mismatched
    rotates back to the front so the fix gets re-verified. The one
    non-failure "error": ``no_oracle`` is the TERMINAL state for a
    rows-only query (the driver can never say more), so it counts as
    checked — unless the query has since gained an oracle, in which
    case it rotates forward to earn a real oracled row.

    The round NUMBER feeds the staleness term (VERDICT r9 fix #1):
    once every name is checked at least once, the driver window
    re-cycles oldest-checked-first so no green row goes stale forever
    (the aria_* family sat on its r01 rows for eight rounds).
    """
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json")):
        base = os.path.basename(path)
        try:
            rnd = int(base[len("CORRECTNESS_r"):-len(".json")])
        except ValueError:
            rnd = 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                latest[name] = max(latest.get(name, 0), rnd)
                continue
            err = row.get("err")
            if err == "no_oracle":
                if name not in _ORACLES:
                    latest[name] = max(latest.get(name, 0), rnd)
                continue
            if err:
                continue
            if row.get("rows_match") is False or row.get("hash_match") is False:
                continue
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _driver_checked() -> set[str]:
    """Names already verified GREEN by the driver in any past round."""
    return set(_driver_history())


def _rotation_tier(name: str) -> int:
    """Priority tier among not-yet-checked queries (lower = sooner)."""
    if name.startswith("q") and name[1].isdigit() or name == "sql_interface":
        return 0  # TPC-H shapes
    if name.startswith("join_"):
        return 1
    if name.startswith("window_"):
        return 2
    if name.startswith("set_"):
        return 3
    if name.startswith("dedup_") or name == "data_mixing_plan":
        return 4
    return 5


def _prior_declared() -> set[str]:
    """Names snapshotted at the end of a PREVIOUS round.

    ``tools/declared_snapshot.json`` is written by
    ``tools/snapshot_declared.py`` at round end. Any snapshot name
    that still lacks a driver row is BACKLOG: it pins ahead of every
    query registered since, so new registrations can never front-run
    it out of the driver's 50-sample window (VERDICT r7 fix #1).
    """
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo_dir, "tools", "declared_snapshot.json")
    try:
        with open(path) as fh:
            names = json.load(fh)
    except (OSError, ValueError):
        return set()
    return set(names) if isinstance(names, list) else set()


def queries() -> dict[str, QueryFn]:
    """All registered queries, rotated for driver sampling.

    Order: (0) BACKLOG — unchecked queries already declared in a prior
    round's snapshot (oracled before rows-only), pinned ahead of
    everything so new registrations can never starve them; (1)
    unchecked oracled queries, by tier then registration order; (2)
    unchecked rows-only queries; (3) already-checked queries,
    OLDEST driver round first — the staleness term (VERDICT r9 #1):
    once the board is fully drained, leftover window slots re-verify
    the names whose last green row is oldest, so every oracled query
    gets a fresh driver row every ~(350-new)/(50-new) rounds. Dict
    contents are identical either way — only iteration order changes.
    """
    _load_all()
    history = _driver_history()
    checked = set(history)
    prior = _prior_declared()
    names = list(_QUERIES)

    def sort_key(pair: tuple[int, str]) -> tuple[int, int, int]:
        idx, name = pair
        if name not in checked and name in prior:
            return (-1, 0 if name in _ORACLES else 1, idx)
        if name not in checked and name in _ORACLES:
            return (0, _rotation_tier(name), idx)
        if name not in checked:
            return (1, 0, idx)
        return (2, history[name], idx)

    ordered = sorted(enumerate(names), key=sort_key)
    return {name: _QUERIES[name] for _, name in ordered}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
