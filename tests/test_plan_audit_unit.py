"""Self-tests for the plan auditors (fast lane).

The registry-wide invariants in test_plan_audit.py are only as good
as their detectors: if a PySpark upgrade renamed a Catalyst node or
changed the py4j surface, ``keyless_windows()`` would return [] for
every plan and the allowlist check would pass vacuously.  These
tests prove each detector fires on a plan constructed to trip it and
stays silent on the clean twin, so a runtime flip breaks the suite
loudly instead of hollowing out the invariant.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from weather_etl_spark.plan_audit import audit_plan, keyless_windows

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def pair_df(spark):
    return spark.range(100).withColumn("k", F.col("id") % 5)


def test_keyless_window_detector_fires(pair_df):
    df = pair_df.withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    hits = keyless_windows(df)
    assert hits and "rn" in hits[0], hits


def test_keyless_window_detector_silent_when_partitioned(pair_df):
    df = pair_df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert keyless_windows(df) == []


def test_keyless_window_detector_sees_subquery_plans(spark, pair_df):
    pair_df.createOrReplaceTempView("pair_df_audit_unit")
    df = spark.sql(
        "SELECT * FROM pair_df_audit_unit WHERE id IN "
        "(SELECT id FROM (SELECT id, row_number() OVER (ORDER BY id) rn "
        " FROM pair_df_audit_unit) WHERE rn <= 3)"
    )
    hits = keyless_windows(df)
    assert hits, "keyless window inside a subquery must be visible"


def test_physical_flags_detector_fires(pair_df, spark):
    other = spark.range(10)
    report = audit_plan(pair_df.crossJoin(other))
    assert report.nodes & {
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
    }, report.text


def test_physical_flags_detector_silent_on_equi_join(pair_df, spark):
    other = spark.range(10).withColumnRenamed("id", "k2")
    report = audit_plan(pair_df.join(other, pair_df.k == other.k2))
    assert not report.nodes
