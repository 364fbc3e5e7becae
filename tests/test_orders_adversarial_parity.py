"""Adversarial-orders oracle parity for the customer/orders backlog.

Fifth battery of the family: the customer-orders rows — the
outer-join custdist (Q13), the NOT-EXISTS anti shape (Q22), the
bloom-probed and mark-join lookups — depend on exactly the order-book
properties the clean fixture under-represents: customers with ZERO
orders, one customer with a huge order count, totalprice values
sitting EXACTLY on q_join_mark's 450000 boundary, duplicate
(custkey, orderdate) rows, and orderkeys dense enough that
q_snapshot_diff's mod-7/mod-5 snapshot split hits every class. A
fabricated orders table against the real sf0.001 customer re-runs
the registered DuckDB oracles with full value parity.

Full lane (see pytest.ini).
"""

from __future__ import annotations

import datetime
import random
import shutil

import pytest

from weather_etl_spark.io import TABLES
from weather_etl_spark.registry import load_all
from tests.conftest import battery_seed, SMOKE_SF_DIR
from tests.oracle_utils import compare_to_oracle

pytestmark = pytest.mark.full  # adversarial parity sweep (see pytest.ini)

SPECS = load_all()

#: Rows reading customer/orders without lineitem (the fabricated
#: orderkeys deliberately match no copied lineitem rows).
ORDERS_OPS = [
    "q_tpch_q13", "q_tpch_q22",
    "q_join_bloom", "q_join_mark", "q_snapshot_diff",
]


def _adversarial_orders(cust_keys):
    rng = random.Random(battery_seed(246802))
    rows = []
    ok = 1
    t0 = datetime.datetime(1995, 1, 1)

    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

    def add(ck, price, prio=None):
        nonlocal ok
        rows.append((
            ok, ck,
            rng.choice(["O", "F", "P"]),
            float(price),
            t0 + datetime.timedelta(days=rng.randint(0, 1400)),
            prio or rng.choice(prios),
        ))
        ok += 1

    ck_list = sorted(cust_keys)
    hub = ck_list[0]
    for _ in range(60):                    # one customer, many orders
        add(hub, rng.uniform(1000, 400000))
    # exactly-on-boundary totalprice rows: q_join_mark filters
    # o_totalprice > 450000, so 450000.0 itself must NOT match and
    # 450000.01 must — both engines' float comparison agrees or fails
    for ck in ck_list[1:6]:
        add(ck, 450000.0)
        add(ck, 450000.01)
        add(ck, 449999.99)
    # Q13's trap: customers whose ONLY orders are 5-LOW count as zero
    # VIA THE JOIN PREDICATE — a different path to c_count=0 than
    # having no orders at all, and the two must land in the same
    # histogram bucket
    for ck in ck_list[6:12]:
        add(ck, rng.uniform(900, 600000), prio="5-LOW")
    # half the remaining customers get zero orders (Q13's custdist
    # zero bucket, Q22's NOT EXISTS leg); the rest get 1-4 orders
    # with duplicate dates
    for ck in ck_list[12:]:
        if ck % 2 == 0:
            continue
        d = t0 + datetime.timedelta(days=rng.randint(0, 1400))
        for _ in range(rng.randint(1, 4)):
            rows.append((
                ok, ck, "O", float(rng.uniform(900, 600000)), d,
                rng.choice(prios),
            ))
            ok += 1
    return rows


def _write_orders(tmp_path):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "orders"
    d.mkdir()
    for t in TABLES:
        if t != "orders":
            shutil.copy(f"{SMOKE_SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    cks = [
        r[0]
        for r in duckdb.sql(
            f"SELECT c_custkey FROM read_parquet("
            f"'{SMOKE_SF_DIR}/customer.parquet')"
        ).fetchall()
    ]
    rows = _adversarial_orders(cks)
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "orders.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def orders_dir(tmp_path_factory):
    return _write_orders(tmp_path_factory.mktemp("advorders"))


@pytest.mark.parametrize("name", ORDERS_OPS)
def test_adversarial_orders_parity(spark, orders_dir, name):
    compare_to_oracle(spark, SPECS[name], orders_dir)


#: Lineitem-based battery residue (r7 verdict #3): the closed-form
#: 2-feature OLS, the deterministic-hash bootstrap CI, and the Z-order
#: clustering audit read lineitem shapes the fixture generator keeps
#: benign — constant-regressor groups (singular normal equations),
#: two-row groups (df edges), part/supp keys ON the mod-1024 axis
#: boundaries, and heavy price ties on ROUND's 4th-decimal boundary.
LINEITEM_OPS = ["q_agg_bootstrap_ci", "q_agg_ols2", "q_layout_zorder"]


def _adversarial_lineitem():
    rng = random.Random(battery_seed(135791))
    t0 = datetime.datetime(1995, 6, 1)
    rows = []

    def add(ok, ln, flag, qty, price, disc, pk, sk):
        rows.append((
            ok, pk, sk, ln, float(qty), float(price), float(disc), 0.04,
            flag, "O", t0 + datetime.timedelta(days=rng.randint(0, 900)),
        ))

    # flag A: healthy regression group but with massive value ties
    # (.25-step prices sit on the post-/100 ROUND boundary) and
    # duplicated (quantity, discount) design points
    for i in range(180):
        add(1 + i, 1 + (i % 4), "A",
            qty=rng.randint(1, 10),
            price=rng.randint(1, 4000) / 4.0,
            disc=rng.choice([0.0, 0.05, 0.1]),
            pk=rng.randint(0, 4095), sk=rng.randint(0, 4095))
    # flag B: CONSTANT discount — one regressor has zero variance, the
    # normal-equation determinant collapses toward the rank-2 case
    for i in range(60):
        add(200 + i, 1, "B",
            qty=rng.randint(1, 50), price=rng.randint(100, 99999) / 100.0,
            disc=0.07, pk=1024 * (i % 4), sk=1023 + (i % 2))
    # flag C: exactly two rows (df edge for n-2 style denominators)
    add(300, 1, "C", qty=3, price=100.25, disc=0.0, pk=0, sk=0)
    add(300, 2, "C", qty=5, price=200.75, disc=0.1, pk=4095, sk=4095)
    # Z-order boundary keys: multiples of 1024 (px == 0), 1023/1025
    # straddles, and a dense 16x16 cell that must compact to one
    # tight cluster box
    for i in range(64):
        add(400 + i, 1, "A", qty=1, price=50.0, disc=0.0,
            pk=3 * 1024 + (i % 16), sk=5 * 1024 + (i // 16))
    return rows


def _write_lineitem(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "lineitem"
    d.mkdir()
    for t in TABLES:
        if t != "lineitem":
            shutil.copy(f"{SMOKE_SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    rows = _adversarial_lineitem()
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
            "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
            "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
            "l_discount": pa.array([r[6] for r in rows], pa.float64()),
            "l_tax": pa.array([r[7] for r in rows], pa.float64()),
            "l_returnflag": pa.array([r[8] for r in rows], pa.string()),
            "l_linestatus": pa.array([r[9] for r in rows], pa.string()),
            "l_shipdate": pa.array([r[10] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, str(d / "lineitem.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def lineitem_dir(tmp_path_factory):
    return _write_lineitem(tmp_path_factory.mktemp("advlineitem"))


@pytest.mark.parametrize("name", LINEITEM_OPS)
def test_adversarial_lineitem_parity(spark, lineitem_dir, name):
    compare_to_oracle(spark, SPECS[name], lineitem_dir)
