"""Property-based test of asof_join against pandas.merge_asof — the
de-facto reference implementation of as-of semantics.

Strategy: hypothesis generates small keyed left/right series with
duplicate timestamps allowed on the left (ties on the right are
excluded: pandas resolves right-side timestamp ties by ROW ORDER,
which is partition-order-dependent — exactly the nondeterminism our
tiebreak_cols contract exists to remove, so it is tested separately in
the deterministic-tiebreak case below)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from gpu_database_spark.operators.asof import asof_join


def _series(draw, n_keys=2, max_rows=8, unique_ts=False):
    key = st.integers(min_value=0, max_value=n_keys - 1)
    ts = st.integers(min_value=0, max_value=50)
    rows = st.lists(st.tuples(key, ts), min_size=1, max_size=max_rows)
    out = draw(rows)
    if unique_ts:
        seen, dedup = set(), []
        for k, t in out:
            if (k, t) not in seen:
                seen.add((k, t))
                dedup.append((k, t))
        out = dedup
    return out


left_strategy = st.builds(lambda: None)  # placeholder, built in the test


@st.composite
def series_pair(draw):
    left = _series(draw, unique_ts=False)
    right = _series(draw, unique_ts=True)
    return left, right


@pytest.mark.usefixtures("spark")
@given(pair=series_pair())
@settings(max_examples=25, deadline=None)
def test_asof_join_matches_pandas_merge_asof(spark, pair):
    left_rows, right_rows = pair
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        "k long, t long, left_id long",
    )
    right = spark.createDataFrame(
        [(k, t, float(k * 1000 + t)) for (k, t) in right_rows],
        "k long, t long, v double",
    )
    got = {
        (r.left_id): r.v
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t", value_cols=["v"]
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        columns=["k", "t", "left_id"],
    ).sort_values(["t", "left_id"])
    rp = pd.DataFrame(
        [(k, t, float(k * 1000 + t)) for (k, t) in right_rows],
        columns=["k", "t", "v"],
    ).sort_values(["t", "k"])
    want_df = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    want = {
        int(r.left_id): (None if pd.isna(r.v) else float(r.v))
        for r in want_df.itertuples()
    }
    assert got == want


def test_asof_join_right_ties_resolved_by_tiebreak(spark):
    """Multiple right rows at one (key, ts): the winner must be the
    greatest tiebreak tuple, regardless of input order."""
    left = spark.createDataFrame([(1, 10, 0)], "k long, t long, left_id long")
    rows = [(1, 10, 5.0), (1, 10, 9.0), (1, 10, 7.0)]
    for perm in (rows, rows[::-1], [rows[1], rows[0], rows[2]]):
        right = spark.createDataFrame(perm, "k long, t long, v double")
        out = asof_join(
            left, right, on="k", left_ts="t", right_ts="t", value_cols=["v"]
        ).collect()
        assert [r.v for r in out] == [9.0], perm
