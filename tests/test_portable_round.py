"""Pin the portable-ROUND idiom (SURVEY §7.4 rule 8).

Spark's ``round(x, 4)`` is half-up on the double's SHORTEST DECIMAL
REPR (Java ``BigDecimal.valueOf`` goes through ``Double.toString``);
DuckDB's ``ROUND`` computes ``x * 10^4`` in double. The two disagree
whenever the multiply crosses a half boundary the repr doesn't (or
vice versa) — routine on grid-valued data (measured in r7: holt's
trend/forecast). The portable oracle-side replacement is::

    CASE WHEN ABS(x) < 0.00005 THEN 0.0
         ELSE CAST(CAST(x AS VARCHAR) AS DECIMAL(30,4))::DOUBLE END

(the VARCHAR cast reproduces the shortest repr; the DECIMAL parse
rounds it half-up; the guard covers DuckDB's sci-notation mantissa
mis-parse below the half-ulp of scale 4). This test fuzzes the
equivalence against Spark's round() over grid-valued, uniform, and
half-boundary doubles in the idiom's valid range (|x| < 1e9 — at
~1e12 the 4th decimal exhausts double precision and the two engines'
shortest reprs legitimately differ).

Full lane (see pytest.ini).
"""

from __future__ import annotations

import random

import duckdb
import pytest

pytestmark = pytest.mark.full  # 12k-value fuzz (see pytest.ini)

IDIOM = (
    "CASE WHEN ABS(x) < 0.00005 THEN 0.0 "
    "ELSE CAST(CAST(x AS VARCHAR) AS DECIMAL(30,4))::DOUBLE END"
)

BOUNDARY_BATTERY = [
    3.4195499999999996, 485.45624999999995, 485.45625000000007,
    5.14385, 0.00004999999999999999, 2.5e-05, -0.00001, -5.14385,
    123456789.12345, 1e-9, -1e-9, 0.5, 1.5e-4, 2.5e-4, -2.5e-4,
    1234567.89012345, 6.5e-08, -6.5e-08, 5e-08, 5.5e-07,
]


def _fuzz_values():
    rng = random.Random(42)
    vals = list(BOUNDARY_BATTERY)
    for _ in range(6000):  # grid-valued (dyadic/decimal mixes)
        k = rng.randint(1, 10 ** rng.randint(1, 9))
        d = rng.choice([2, 4, 5, 8, 10, 16, 20, 100, 1000])
        vals.append(k / d * (1 if rng.random() < 0.5 else -1))
    for _ in range(4000):  # uniform across the valid magnitude range
        vals.append(rng.uniform(-1, 1) * 10 ** rng.randint(-9, 9))
    for e in range(-9, 10):  # half-boundary decade sweep
        for m in (1, 5, 15, 25, 45, 55, 95, 99, 101, 499, 501):
            vals.append(m * 10.0 ** e / 100)
            vals.append(-m * 10.0 ** e / 100)
    return vals


def test_portable_round_matches_spark(spark):
    vals = _fuzz_values()
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    srows = [r["r"] for r in df.selectExpr("round(x, 4) AS r").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    drows = [r[0] for r in con.execute(f"SELECT {IDIOM} FROM t").fetchall()]
    bad = [
        (v, s, d)
        for v, s, d in zip(vals, srows, drows)
        if repr(s) != repr(d)  # repr-compare: catches -0.0 too
    ]
    assert not bad, f"{len(bad)} mismatches; first: {bad[:5]}"
