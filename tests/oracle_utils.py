"""Local differential harness mirroring the driver's DuckDB-oracle check.

Stricter than the driver: besides row-count / column-name / multiset
value equality it *fails* on output types the driver may hash
differently across engines (raw timestamps, decimals) — forcing every
declared query to emit only hash-portable types (SURVEY.md §7.4).
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from weather_etl_spark.io import TABLES

#: Types we allow in declared-query output (portable across engines).
_PORTABLE = (int, float, str, bool, datetime.date, list, type(None))


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Normalize a cell to a hashable, cross-engine-comparable token."""
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, decimal.Decimal):
        raise AssertionError(
            f"decimal output {v!r} — cast to DOUBLE/BIGINT in the query (§7.4)"
        )
    if isinstance(v, datetime.datetime):
        raise AssertionError(
            f"raw timestamp output {v!r} — emit epoch-us bigint or date (§7.4)"
        )
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm(x) for x in v))
    raise AssertionError(f"non-portable output type {type(v).__name__}: {v!r}")


def _normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(row[i]) for i in order) for row in rows)


def compare_to_oracle(spark, spec, sf_dir: str) -> None:
    """Assert the Spark query and DuckDB oracle agree (driver-style)."""
    sdf = spec.fn(spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    con = duck_con(sf_dir)
    cur = con.execute(spec.oracle)
    ocols = [d[0].lower() for d in cur.description]
    orows = cur.fetchall()
    con.close()

    assert sorted(scols) == sorted(ocols), (
        f"{spec.name}: column mismatch spark={sorted(scols)} duck={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{spec.name}: row count spark={len(srows)} duck={len(orows)}"
    )
    s_norm = _normalize_rows(scols, srows)
    o_norm = _normalize_rows(ocols, orows)
    if s_norm != o_norm:
        diffs = [
            (s, o) for s, o in zip(s_norm, o_norm) if s != o
        ][:5]
        raise AssertionError(
            f"{spec.name}: value mismatch; first diffs (spark vs duck): {diffs}"
        )
