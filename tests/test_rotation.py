"""Rotation-pin regression: backlog queries front-run new registrations.

Round 6 and 7 both lost driver rows for ``semdedup_pipeline`` /
``sim_maxsim_multivector`` because ``_rotation_tier`` let each round's
~50 new registrations outrank old unchecked tier-5 names, pushing them
past the driver's 50-sample cutoff (VERDICT r7 "What's wrong" #1).
The fix: ``tools/declared_snapshot.json`` (written at round end by
``tools/snapshot_declared.py``) pins any still-unchecked snapshot name
ahead of everything registered since. These tests enforce that
contract directly against the real registry state.
"""

from __future__ import annotations

import json
import os

from gpu_database_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _snapshot() -> set[str]:
    with open(os.path.join(REPO, "tools", "declared_snapshot.json")) as fh:
        return set(json.load(fh))


def test_snapshot_exists_and_covers_registry_subset():
    snap = _snapshot()
    declared = set(registry.queries())
    # Every snapshot name must still exist (no silent de-registration).
    missing = snap - declared
    assert not missing, f"snapshot names no longer registered: {sorted(missing)}"


def test_unchecked_snapshot_names_precede_all_new_registrations():
    snap = _snapshot()
    checked = registry._driver_checked()
    order = list(registry.queries())
    backlog = [n for n in order if n in snap and n not in checked]
    if not backlog:
        return  # board fully drained — nothing to pin
    last_backlog_pos = max(order.index(n) for n in backlog)
    new_names = [n for n in order if n not in snap]
    for n in new_names:
        assert order.index(n) > last_backlog_pos, (
            f"new registration {n!r} front-runs backlog query "
            f"{order[last_backlog_pos]!r} — the rotation pin is broken"
        )


def test_checked_names_cycle_oldest_round_first():
    """Staleness term (VERDICT r9 #1): among already-checked names,
    the rotation must order by the round of their latest green driver
    row ascending, so leftover window slots re-verify the stalest
    names (the aria_* family sat on r01 rows for eight rounds)."""
    history = registry._driver_history()
    order = list(registry.queries())
    checked_rounds = [history[n] for n in order if n in history]
    assert checked_rounds == sorted(checked_rounds), (
        "checked queries are not ordered oldest-driver-round-first"
    )


def test_stale_aria_family_fits_driver_sample_window():
    """The r01-checked aria_* family must sit inside the driver's
    50-sample window this round (VERDICT r9 #1 'done' criterion).
    If this fails after adding new queries: too many never-checked
    registrations are front-running the stale re-verification slots —
    defer some to next round."""
    history = registry._driver_history()
    order = list(registry.queries())
    oldest = min(history.values())
    stale = [n for n in order if history.get(n) == oldest]
    assert stale, "no checked queries at the oldest round?"
    late = [n for n in stale if order.index(n) >= 50]
    assert not late, f"stalest queries outside the window: {late}"


def test_backlog_fits_driver_sample_window():
    """Everything unchecked (backlog + new) must fit in the first 50."""
    checked = registry._driver_checked()
    order = list(registry.queries())
    unchecked_positions = [i for i, n in enumerate(order) if n not in checked]
    overflow = [order[i] for i in unchecked_positions if i >= 50]
    assert not overflow, (
        f"{len(overflow)} unchecked queries sit past the driver's "
        f"50-sample window and will get no row this round: {overflow}"
    )
