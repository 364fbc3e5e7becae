"""Empty-input robustness sweep — reference invariant A12 generalized.

The reference short-circuits on empty input (`if df.empty: return 0`,
lambda_function.py:150-152).  At 100 TB the empty case is not a corner:
it is every partition a pushed-down filter eliminates, every
incremental run with no new data, every stream trigger before the
first file lands.  An operator that throws on zero rows would take a
1000-executor job down on the one day a source is quiet.

This sweep runs EVERY registered operator — batch, sink, source,
streaming — against a zero-row copy of all ten tables (schemas
preserved byte-for-byte via pyarrow `slice(0, 0)`) and asserts it
executes and returns its declared schema.  Row counts are free to be
zero or non-zero (time-axis generators and source profiles legitimately
emit rows with no table input); the contract is "never raise, never
lose the schema".
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.full  # registry-wide sweep (see pytest.ini)

from weather_etl_spark.registry import load_all

from tests.conftest import SMOKE_SF_DIR

SPECS = load_all()
ALL_NAMES = sorted(SPECS)


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory) -> str:
    """Zero-row copies of every sf0.001 table, schemas preserved."""
    out = tmp_path_factory.mktemp("empty_sf")
    for fname in sorted(os.listdir(SMOKE_SF_DIR)):
        if not fname.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(SMOKE_SF_DIR, fname))
        pq.write_table(t.slice(0, 0), str(out / fname))
    return str(out)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_runs_on_empty_tables(spark, empty_sf_dir, name):
    df = SPECS[name].fn(spark, empty_sf_dir)
    assert df.columns, f"{name}: empty-input run lost its schema"
    assert df.count() >= 0
