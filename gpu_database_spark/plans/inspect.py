"""Physical-plan inspection helpers.

Used by tests (tests/test_plans.py) to keep plans honest at any scale:
filters must reach the parquet scan, column pruning must shrink
ReadSchema, small dimensions must broadcast, and hot expressions must
stay inside WholeStageCodegen. A query that silently regresses to a
full-scan or a shuffle join fails CI here long before it falls over at
100 TB.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def formatted_plan(df: DataFrame) -> str:
    return _explain(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return _explain(df, "simple")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the scan nodes."""
    out = []
    for line in formatted_plan(df).splitlines():
        if "PushedFilters" in line:
            out.append(line.strip())
    return "\n".join(out)


def read_schema(df: DataFrame) -> str:
    out = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            out.append(line.strip())
    return "\n".join(out)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastNestedLoopJoin" in simple_plan(df)


def has_shuffle_join(df: DataFrame) -> bool:
    p = simple_plan(df)
    return "SortMergeJoin" in p or "ShuffledHashJoin" in p


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages (formatted plan `[codegen id : N]`
    markers; present once AQE has finalized the plan, i.e. after an action)."""
    import re

    ids = set(re.findall(r"codegen id : (\d+)", formatted_plan(df)))
    return len(ids)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the (final) plan — lower = better.

    Counts every shuffle flavor (hash, range, AND single-partition —
    the single-reducer trap this helper exists to catch) but not
    BroadcastExchange, which is the cheap alternative to a shuffle.
    An executed AdaptiveSparkPlan prints the final plan followed by an
    '== Initial Plan ==' section; count only the final one.
    """
    p = simple_plan(df).split("== Initial Plan ==")[0]
    return p.count("Exchange ") - p.count("BroadcastExchange ")
