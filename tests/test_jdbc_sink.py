"""Semantic tests for the embedded-Derby JDBC MERGE sink
(snk_jdbc_idem and the weather_etl_spark.sinks JDBC helpers): the
reference's ``INSERT ... ON CONFLICT (date) DO NOTHING``
(lambda_function.py:176-188) exercised against a real database with
planted inputs — overlap handling, intra-batch duplicate keys,
timestamp round-trip fidelity, and the empty-batch no-op.  Oracle
parity for the registered row is separately enforced by
tests/test_oracle_parity.py."""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest

from weather_etl_spark.sinks import (
    derby_shutdown,
    derby_url,
    jdbc_create_keyed_table,
    jdbc_merge_append,
    jdbc_read_table,
)

UTC = datetime.timezone.utc


@pytest.fixture()
def derby_db(spark):
    tmp = tempfile.mkdtemp(prefix="test_jdbc_sink_")
    db = f"{tmp}/db"
    url = derby_url(db, create=True)
    jdbc_create_keyed_table(
        spark,
        url,
        "target",
        [("k", "BIGINT"), ("ts", "TIMESTAMP"), ("v", "DOUBLE")],
        ["k"],
    )
    yield url
    derby_shutdown(spark, db)
    shutil.rmtree(tmp, ignore_errors=True)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, ts timestamp, v double")


def _ts(minute, micro=0):
    return datetime.datetime(2026, 3, 1, 12, minute, 0, micro, tzinfo=UTC)


def test_overlapping_batches_insert_only_new_keys(spark, derby_db):
    """The reference's self-healing window: batch 2 re-sends batch 1's
    keys plus new ones; only the new keys insert, and the FIRST write
    of each key wins (DO NOTHING, not upsert)."""
    b1 = _batch(spark, [(1, _ts(1), 1.0), (2, _ts(2), 2.0), (3, _ts(3), 3.0)])
    b2 = _batch(
        spark,
        [(2, _ts(2), 99.0), (3, _ts(3), 99.0), (4, _ts(4), 4.0), (5, _ts(5), 5.0)],
    )
    assert jdbc_merge_append(spark, b1, derby_db, "target", ["k"]) == 3
    assert jdbc_merge_append(spark, b2, derby_db, "target", ["k"]) == 2
    back = {
        r["k"]: r["v"] for r in jdbc_read_table(spark, derby_db, "target").collect()
    }
    assert back == {1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0, 5: 5.0}


def test_replay_is_idempotent(spark, derby_db):
    """Exact replay of an already-applied batch inserts 0 and leaves
    the sink byte-identical (reference invariant #1: at-least-once
    delivery + keyed conflict skip = exactly-once effect)."""
    b = _batch(spark, [(10, _ts(10), 1.5), (11, _ts(11), 2.5)])
    assert jdbc_merge_append(spark, b, derby_db, "target", ["k"]) == 2
    before = sorted(jdbc_read_table(spark, derby_db, "target").collect())
    assert jdbc_merge_append(spark, b, derby_db, "target", ["k"]) == 0
    assert sorted(jdbc_read_table(spark, derby_db, "target").collect()) == before


def test_intra_batch_duplicate_keys_collapse(spark, derby_db):
    """ON CONFLICT DO NOTHING swallows key repeats WITHIN one batch;
    raw SQL MERGE would error on them, so the helper's key-dedup must
    restore the reference semantics (one row per key inserted)."""
    b = _batch(
        spark, [(7, _ts(7), 1.0), (7, _ts(7), 1.0), (8, _ts(8), 2.0)]
    )
    assert jdbc_merge_append(spark, b, derby_db, "target", ["k"]) == 2
    assert jdbc_read_table(spark, derby_db, "target").count() == 2


def test_empty_batch_is_a_noop(spark, derby_db):
    """An incremental run with no new data must insert 0 and not error
    (A12 short-circuit, through the JDBC lane)."""
    empty = _batch(spark, [])
    assert jdbc_merge_append(spark, empty, derby_db, "target", ["k"]) == 0
    assert jdbc_read_table(spark, derby_db, "target").count() == 0


def test_timestamp_microsecond_roundtrip(spark, derby_db):
    """Timestamps survive the JDBC round-trip to Spark's full
    microsecond precision (UTC session, A7; Derby TIMESTAMP carries
    nanoseconds, a superset)."""
    ts = datetime.datetime(2026, 3, 1, 12, 34, 56, 789123, tzinfo=UTC)
    b = _batch(spark, [(42, ts, 0.5)])
    assert jdbc_merge_append(spark, b, derby_db, "target", ["k"]) == 1
    [row] = jdbc_read_table(spark, derby_db, "target").collect()
    assert row["ts"].replace(tzinfo=UTC) == ts
