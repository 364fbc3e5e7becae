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


def test_keyless_window_allowlist_is_tight():
    """Every ALLOW_KEYLESS_WINDOW entry names a registered query, so
    renames/deletions can't leave stale reasons behind."""
    stale = set(ALLOW_KEYLESS_WINDOW) - set(SPECS)
    assert not stale, f"allowlist entries for unregistered queries: {stale}"
