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
    AUDIT_SKIP,
    audit_plan,
    disallowed_flags,
)
from weather_etl_spark.registry import load_all

SPECS = load_all()
NAMES = sorted(n for n in SPECS if n not in AUDIT_SKIP)


@pytest.mark.parametrize("name", NAMES)
def test_no_disallowed_plan_nodes(spark, sf_dir, name):
    report = audit_plan(SPECS[name].fn(spark, sf_dir))
    bad = disallowed_flags(name, report)
    assert not bad, (
        f"{name}: disallowed plan node(s) {bad}\n{report.text}"
    )
