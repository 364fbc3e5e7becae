"""Fast-lane canary for the fresh-seed campaign runner.

Round-10 shipped a seed-runner env bug that silently dropped
SPARK_GRAFT_BATTERY_SEED_OFFSET from the child environment, voiding a
whole "fresh-seed" campaign (it re-ran the committed seeds).  The r10
verdict's order #4: keep the genuine fresh-seed drumbeat but make the
runner un-regressable — this test exercises the runner's own canary,
which spawns a real child process and asserts it derives its battery
seeds from the requested offset via the same ``tests.conftest.
battery_seed`` helper every battery imports.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from sweep_battery_seeds import canary, child_env  # noqa: E402


def test_child_env_carries_the_offset():
    env = child_env(987654)
    assert env["SPARK_GRAFT_BATTERY_SEED_OFFSET"] == "987654"


def test_canary_passes_when_child_receives_the_offset():
    canary(13579)  # raises on any discrepancy


def test_canary_detects_a_dropped_offset(monkeypatch):
    """If env construction regresses to dropping the offset, the canary
    must refuse the campaign rather than silently re-running committed
    seeds."""
    import sweep_battery_seeds as mod

    monkeypatch.setattr(
        mod, "child_env", lambda offset: dict(child_env(0))
    )
    with pytest.raises(RuntimeError, match="seed canary FAILED"):
        mod.canary(13579)
