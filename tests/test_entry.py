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
