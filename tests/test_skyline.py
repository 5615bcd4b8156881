"""Skyline scan correctness: the O(n log n) sort-scan vs brute-force
dominance over randomized inputs (pure pandas, no Spark jobs)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from gpu_database_spark.operators.skyline import _skyline_scan

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),           # p_partkey
        st.integers(min_value=0, max_value=20).map(float),    # p_retailprice (coarse -> ties)
        st.integers(min_value=0, max_value=20),               # p_size
    ),
    min_size=0,
    max_size=60,
)


def brute_skyline(rows):
    keep = []
    for i, (_, pa, sa) in enumerate(rows):
        dominated = any(
            (pb <= pa and sb >= sa and (pb < pa or sb > sa))
            for j, (_, pb, sb) in enumerate(rows)
            if j != i
        )
        if not dominated:
            keep.append(rows[i])
    return sorted(keep)


@given(rows=rows_strategy)
@settings(max_examples=300, deadline=None)
def test_skyline_scan_matches_brute_force(rows):
    pdf = pd.DataFrame(rows, columns=["p_partkey", "p_retailprice", "p_size"])
    got = sorted(tuple(map(float, r)) for r in _skyline_scan(pdf).values.tolist())
    want = sorted(tuple(map(float, r)) for r in brute_skyline(rows))
    assert got == want
