"""Replica of the driver's Spark-vs-DuckDB compare (order-insensitive).

Canonicalizes both result sets to sorted multisets of stringified
rows (columns sorted by name) and asserts equality — a stricter local
stand-in for the driver's row-count + schema + value-hash gate, so
mismatches show up in pytest before the driver sees them.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def assert_query_matches_oracle(df, con, sql: str, name: str = "") -> None:
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duck_result(con, sql)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    sc, dc = canon(s_cols, s_rows), canon(d_cols, d_rows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
