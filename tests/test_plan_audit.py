"""Registry-wide physical-plan invariants (see tools/audit_plans.py).

test_scale_plans.py pins the exact plan shape of individual operators;
this file sweeps EVERY registered operator for the three red flags that
are never acceptable by accident at 100 TB: a keyless CartesianProduct,
an unbounded BroadcastNestedLoopJoin, and row-at-a-time Python outside
the two deliberate slow-path demos.  Plans are built and scanned, never
executed (only driver-side plan inputs — bounded collect()s such as
centroid sets — run).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

pytestmark = pytest.mark.full  # heavy lane (see pytest.ini)

from weather_etl_spark.plan_audit import (
    ALLOW_KEYLESS_WINDOW,
    AUDIT_SKIP,
    audit_plan,
    disallowed_flags,
    keyless_windows,
)
from weather_etl_spark.registry import load_all

SPECS = load_all()
NAMES = sorted(n for n in SPECS if n not in AUDIT_SKIP)

#: Committed per-query shuffle ledger (tools/emit_plan_snapshot.py):
#: the number of shuffle Exchanges in each plan at the test SF.  A
#: mismatch means an edit changed a plan's shuffle count — intended
#: changes regenerate the snapshot in the same commit.
SNAPSHOT: dict[str, int] = json.loads(
    (Path(__file__).parent / "plan_snapshot.json").read_text()
)


@pytest.mark.parametrize("name", NAMES)
def test_no_disallowed_plan_nodes(spark, sf_dir, name):
    df = SPECS[name].fn(spark, sf_dir)
    report = audit_plan(df)
    bad = disallowed_flags(name, report)
    assert not bad, (
        f"{name}: disallowed plan node(s) {bad}\n{report.text}"
    )
    # single-partition Window funnel: admissible only with a declared
    # bound (the r8 verdict's "window ledgers" radar item, mechanized)
    hits = keyless_windows(df)
    assert not hits or name in ALLOW_KEYLESS_WINDOW, (
        f"{name}: keyless Window without a declared bound:\n"
        + "\n".join(hits)
    )
    # shuffle-count regression net: the committed snapshot pins every
    # plan's Exchange count; a silently-gained shuffle fails here
    assert name in SNAPSHOT, (
        f"{name}: not in tests/plan_snapshot.json — regenerate with "
        "tools/emit_plan_snapshot.py"
    )
    assert report.exchanges == SNAPSHOT[name], (
        f"{name}: plan has {report.exchanges} shuffle Exchanges, "
        f"snapshot says {SNAPSHOT[name]} — if the plan change is "
        "intended, regenerate tests/plan_snapshot.json "
        "(tools/emit_plan_snapshot.py) in the same commit\n"
        f"{report.text}"
    )


def test_keyless_window_allowlist_is_tight():
    """Every ALLOW_KEYLESS_WINDOW entry names a registered query, so
    renames/deletions can't leave stale reasons behind."""
    stale = set(ALLOW_KEYLESS_WINDOW) - set(SPECS)
    assert not stale, f"allowlist entries for unregistered queries: {stale}"


def test_plan_snapshot_is_tight():
    """The snapshot covers exactly the audited registry — no stale
    rows after a rename/deletion, no missing rows after a
    registration."""
    assert set(SNAPSHOT) == set(NAMES), (
        f"stale: {sorted(set(SNAPSHOT) - set(NAMES))} "
        f"missing: {sorted(set(NAMES) - set(SNAPSHOT))}"
    )


def test_sf1_plan_snapshot_pins_heaviest_selection():
    """tests/plan_snapshot_sf1.json (r9 verdict order #7) must cover
    exactly the TOP_N shuffle-heaviest snapshot rows (TOP_N lives in
    the tool — 60 since the r10 widening) per the mechanical selection
    rule, inline the committed sf0.01 counts it claims to diff
    against, and carry the executed-join composition fields — so the
    10x ledger can't silently drift from the sf0.01 snapshot it
    annotates.  Regenerate with tools/emit_plan_snapshot_sf1.py when
    plan_snapshot.json moves a top-TOP_N row."""
    import sys

    root = str(Path(__file__).resolve().parent.parent)
    if root not in sys.path:
        sys.path.insert(0, root)
    from tools.emit_plan_snapshot_sf1 import TOP_N, heaviest

    path = Path(__file__).parent / "plan_snapshot_sf1.json"
    assert path.exists(), (
        "plan_snapshot_sf1.json missing — run "
        "tools/emit_plan_snapshot_sf1.py"
    )
    ledger = json.loads(path.read_text())
    want = set(heaviest(TOP_N))
    # The ledger must cover AT LEAST the mechanical top-TOP_N
    # selection; a SUPERSET is the r10 verdict's order #5 executed
    # (one full-width 379-row run, after which per-round cost drops
    # back to diffing) — extra rows never weaken the pin.
    assert want <= set(ledger), (
        f"sf1 ledger no longer covers the top-{TOP_N} selection — "
        f"missing: {sorted(want - set(ledger))}"
    )
    for name, row in ledger.items():
        if "error" in row:
            continue  # errored rows print separately in the tool
        assert name not in SNAPSHOT or (
            row["sf001_exchanges"] == SNAPSHOT[name]
        ), (
            f"{name}: ledger inlines sf0.01 count {row['sf001_exchanges']} "
            f"but the committed snapshot says {SNAPSHOT[name]} — "
            "regenerate the sf1 ledger"
        )
        for field in ("static_exchanges", "exec_bhj", "exec_smj",
                      "exec_shj", "seconds"):
            assert field in row, f"{name}: ledger row missing {field}"
    # errored rows must never hide a top-selection member
    errored = {n for n, r in ledger.items() if "error" in r}
    assert not (errored & want), (
        f"top-{TOP_N} rows errored in the sf1 ledger: "
        f"{sorted(errored & want)}"
    )
