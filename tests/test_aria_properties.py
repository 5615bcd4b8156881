"""Property-based tests of the Aria epoch protocol (hypothesis).

Pure-driver checks of `aria._protocol_local` — the same algorithm the
distributed path implements (equivalence pinned in test_aria.py) —
against the independent serial-order oracle across randomized
workloads. Hundreds of cases in seconds, no Spark jobs.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from gpu_database_spark.operators.aria import _protocol_local
from tests.test_aria import serial_oracle


def md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


ops_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),   # txn_id
        st.integers(min_value=0, max_value=6),    # op_idx
        st.integers(min_value=1, max_value=8),    # key (hot -> conflicts)
        st.booleans(),                            # is_update
    ),
    min_size=0,
    max_size=60,
).map(
    # op_idx must be unique within a txn (it is a position); dedupe
    lambda rows: list({(t, o): (t, o, k, u) for t, o, k, u in rows}.values())
)


@given(ops=ops_strategy, reorder=st.booleans())
@settings(max_examples=300, deadline=None)
def test_protocol_matches_serial_oracle(ops, reorder):
    winner, commit_order, epochs = _protocol_local(ops, reorder, max_epochs=200)
    got = {k: md5(f"{t}:{op}:{k}") for k, (t, op) in winner.items()}
    want, epoch_commits = serial_oracle({}, ops, reorder, max_epochs=200)
    assert got == want
    assert len(commit_order) == sum(epoch_commits)
    assert epochs == len(epoch_commits)


@given(ops=ops_strategy)
@settings(max_examples=200, deadline=None)
def test_reorder_first_epoch_commits_superset(ops):
    """Reorder-mode first-epoch commits ⊇ plain-mode commits."""
    if not ops:
        return
    w_plain, c_plain, _ = _protocol_local(ops, False, max_epochs=1, strict=False)
    w_re, c_re, _ = _protocol_local(ops, True, max_epochs=1, strict=False)
    assert set(c_plain) <= set(c_re)


@given(ops=ops_strategy, reorder=st.booleans())
@settings(max_examples=200, deadline=None)
def test_terminates_and_commits_every_txn_once(ops, reorder):
    _, commit_order, epochs = _protocol_local(ops, reorder, max_epochs=200)
    n_txns = len({t for t, _, _, _ in ops})
    assert len(commit_order) == n_txns
    assert epochs <= max(n_txns, 1)  # ≥1 commit per epoch (min Tid wins)