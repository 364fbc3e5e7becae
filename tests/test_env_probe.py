"""Runtime-environment probe: pin the assumptions the engine's greens
were earned on, so an interpreter/Spark swap fails ONE loud test here
instead of ten driver rows (round-4 lesson: the PySpark build changed
under the repo and parquet TIMESTAMP(NANOS) silently flipped from
bigint-nanos to TIMESTAMP_NTZ, rotting six stale-green queries).

These tests assert the POST-normalization contract (what every operator
may rely on), plus record which raw shape the current runtime delivers
so drift is visible in the failure message.
"""

from __future__ import annotations

import duckdb
import pyspark
import pytest
from pyspark.sql import functions as F

from weather_etl_spark.io import read_table, table_path
from tests.conftest import SMOKE_SF_DIR


def test_events_ts_is_tz_aware_timestamp_after_read(spark):
    """The engine contract: events.ts is always `timestamp` (tz-aware,
    µs, session tz UTC) after read_table, whatever the parquet reader
    delivered (reference invariant A7, lambda_function.py:107-108)."""
    ev = read_table(spark, SMOKE_SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp", (
        f"events.ts normalized to {dict(ev.dtypes)['ts']!r}, expected "
        "'timestamp' — io.read_table must handle this runtime's parquet "
        "NANOS mapping (known shapes: bigint via nanosAsLong, "
        "timestamp_ntz, timestamp)"
    )
    # TIMESTAMP-only functions must resolve — this is exactly what broke
    # in round 4 (unix_micros over TIMESTAMP_NTZ is an AnalysisException).
    row = ev.select(
        F.unix_micros(F.max("ts")).alias("max_us"),
        F.unix_micros(F.min("ts")).alias("min_us"),
    ).first()
    assert row["max_us"] is not None and row["min_us"] is not None


def test_events_ts_instant_matches_duckdb(spark):
    """The normalization must preserve the instant: Spark's µs epoch for
    MIN/MAX(ts) equals DuckDB's read of the same parquet column."""
    ev = read_table(spark, SMOKE_SF_DIR, "events")
    s = ev.select(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).first()
    path = table_path(SMOKE_SF_DIR, "events")
    lo, hi = duckdb.sql(
        f"SELECT epoch_us(min(ts)), epoch_us(max(ts)) FROM read_parquet('{path}')"
    ).fetchone()
    assert (s["lo"], s["hi"]) == (lo, hi)


def test_raw_parquet_nanos_shape_is_known(spark):
    """Document which raw shape this runtime delivers for parquet
    TIMESTAMP(NANOS) and fail loudly on a brand-new one.  (On builds
    where spark.sql.legacy.parquet.nanosAsLong works: 'bigint'.  On
    PySpark 4.1.2 as installed 2026-08: 'timestamp_ntz' — the conf is a
    no-op there.)"""
    raw = spark.read.parquet(table_path(SMOKE_SF_DIR, "events"))
    dtype = dict(raw.dtypes)["ts"]
    assert dtype in ("bigint", "timestamp_ntz", "timestamp"), (
        f"parquet TIMESTAMP(NANOS) arrived as unrecognized dtype {dtype!r} "
        f"on PySpark {pyspark.__version__} — extend io.read_table's "
        "normalization and this probe"
    )


def test_session_contract(spark):
    """The confs every oracle-parity green depends on."""
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_versions_pinned():
    """Record the verified-good runtime; bump ENVIRONMENT.md + these pins
    together after re-running the full parity sweep on a new runtime."""
    major_minor = ".".join(pyspark.__version__.split(".")[:2])
    assert major_minor == "4.1", (
        f"PySpark {pyspark.__version__}: greens were earned on 4.1.x — "
        "re-run tests/test_oracle_parity.py and update this pin"
    )
    assert duckdb.__version__ is not None


def test_freshly_written_nanos_parquet_normalizes_identically(spark, tmp_path):
    """Write-side probe (r5 verdict #6): the read-path pins above test
    the driver-generated fixtures, which could in principle be
    regenerated with a different physical type.  Write a brand-new
    TIMESTAMP(NANOS) parquet via DuckDB in-test and assert read_table
    normalizes the fresh file exactly like the fixtures — tz-aware
    `timestamp`, instant preserved — so the next runtime flip is caught
    even against regenerated testdata."""
    import os

    d = tmp_path / "nanos_probe"
    os.makedirs(d / "events.parquet", exist_ok=True)
    path = str(d / "events.parquet" / "part-0.parquet")
    duckdb.sql(
        "COPY (SELECT CAST(range AS BIGINT) AS event_id, "
        "CAST('2026-01-02 03:04:05.123456' AS TIMESTAMP_NS) "
        "  + INTERVAL (range) SECOND AS ts "
        "FROM range(5)) TO '" + path + "' (FORMAT PARQUET)"
    )
    # confirm the file really carries nanosecond TIMESTAMP physical type
    (logical,) = duckdb.sql(
        f"SELECT logical_type FROM parquet_schema('{path}') "
        "WHERE name = 'ts'"
    ).fetchone()
    assert "NANOS" in str(logical).upper(), (
        f"probe file wrote {logical!r}, not TIMESTAMP(NANOS) — "
        "DuckDB changed its TIMESTAMP_NS parquet mapping; fix the probe"
    )
    ev = read_table(spark, str(d), "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    got = ev.select(F.unix_micros(F.min("ts")).alias("lo")).first()["lo"]
    (want,) = duckdb.sql(
        f"SELECT epoch_us(min(ts)) FROM read_parquet('{path}')"
    ).fetchone()
    assert got == want, "normalization shifted the instant on a fresh file"
