"""Smoke: the driver contract module itself."""

from __future__ import annotations

import importlib


def test_entry_smoke(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    assert df.count() > 0


def test_every_query_has_callable(spark):
    mod = importlib.import_module("__spark_entry__")
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert qs, "no declared queries"
    assert set(oracles) <= set(qs)


def test_datasource_matches_driver_fetch(spark, sf_dir):
    """The Python DataSource path and the driver-side Arrow fetch path
    must produce bit-identical frames (NaN == NaN) — ingestion surface
    choice never changes data."""
    from weather_etl_spark.registry import load_all

    specs = load_all()
    a = sorted(map(tuple, specs["src_pyds"].fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, specs["src_fetch"].fn(spark, sf_dir).collect()))
    assert len(a) == len(b) == 192
    for x, y in zip(a, b):
        assert x[0] == y[0]
        for p, q in zip(x[1:], y[1:]):
            assert p == q or (p != p and q != q)  # NaN-aware equality
