"""Adversarial-graph oracle parity for the graph/SQL backlog.

Fourth battery of the family: the graph rows project part/supplier
co-occurrence graphs out of lineitem, and the fixture's generator
yields a benign degree distribution with no duplicate edges. This
corpus fabricates a lineitem with the shapes that break naive graph
code — duplicated (orderkey, partkey) rows (multi-edge dedup), an
order with a single part (isolated node), clique-forming wide orders,
hub parts appearing everywhere — against the sf0.001 orders (FK-
consistent), and re-runs the registered DuckDB oracles with full
value parity. The lineitem-based correlated-subquery SQL rows ride
the same corpus.

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

#: Never-driver-checked rows reading lineitem/orders graph shapes.
GRAPH_OPS = [
    "q_graph_triangles", "q_graph_adamic_adar", "q_graph_lpa_communities",
    "q_graph_kcore", "q_graph_assortativity",
    "q_sql_subqueries", "q_sql_params",
    # the never-driver-checked lineitem-reading TPC-H rows: duplicate
    # line rows, clique orders, and hub parts stress exactly the
    # aggregate/join shapes these queries reduce
    "q_tpch_q6", "q_tpch_q4", "q_tpch_q12", "q_tpch_q7", "q_tpch_q8",
    "q_tpch_q9", "q_tpch_q14", "q_tpch_q15", "q_tpch_q16", "q_tpch_q17",
    "q_tpch_q18", "q_tpch_q19", "q_tpch_q20", "q_tpch_q21",
    # q20 and q11 are empty-vs-empty at sf0.001 regardless of lineitem:
    # the 10-supplier smoke fixture has no NATION_4/NATION_5 suppliers
    # at all (their non-vacuous checks happen at the driver's sf0.01)
    "q_tpch_q10", "q_tpch_q2", "q_tpch_q11",
]


def _adversarial_lineitem(order_keys, part_keys, supp_keys):
    """Clique orders, hub parts, duplicate edge rows, isolated nodes.
    Part/supplier keys are drawn from the REAL dimension tables' full
    key domains so the nation- and brand-filtered TPC-H rows (q7, q20)
    find matches instead of going vacuously empty."""
    rng = random.Random(battery_seed(171717))
    rows = []
    parts = sorted(rng.sample(part_keys, min(len(part_keys), 160)))
    hubs = parts[:4]  # in almost every order
    base = datetime.datetime(1995, 6, 1)

    def supp():
        return rng.choice(supp_keys)

    def add(ok, pk, sk, ln):
        rows.append((
            ok, pk, sk, ln,
            float(rng.randint(1, 50)),
            round(rng.uniform(900.0, 90000.0), 2),
            rng.choice([0.0, 0.02, 0.05, 0.08, 0.1]),
            rng.choice([0.0, 0.04, 0.08]),
            rng.choice(["R", "A", "N"]),
            rng.choice(["O", "F"]),
            # wide enough that Q4's quarter window (1997-07..10, ship
            # > orderdate + 60d) is populated, not vacuously empty
            base + datetime.timedelta(days=rng.randint(-400, 1200)),
        ))

    oks = list(order_keys)
    rng.shuffle(oks)
    it = iter(oks)
    for _ in range(6):  # clique orders: 12 distinct parts each
        ok = next(it)
        chosen = rng.sample(parts, 12)
        for ln, pk in enumerate(chosen, 1):
            add(ok, pk, supp(), ln)
    for _ in range(10):  # duplicate-edge orders: same part twice
        ok = next(it)
        pk = rng.choice(parts)
        add(ok, pk, supp(), 1)
        add(ok, pk, supp(), 2)  # same (orderkey, partkey) again
        add(ok, rng.choice(parts), supp(), 3)
    for _ in range(15):  # single-part orders (isolated projection nodes)
        ok = next(it)
        add(ok, rng.choice(parts), supp(), 1)
    for ok in it:  # bulk: hub part + 2-5 random parts
        n = rng.randint(2, 5)
        add(ok, rng.choice(hubs), supp(), 1)
        for ln, pk in enumerate(rng.sample(parts, n), 2):
            add(ok, pk, supp(), ln)
    return rows


def _write_lineitem(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "graph"
    d.mkdir()
    for t in TABLES:
        if t != "lineitem":
            shutil.copy(f"{SMOKE_SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    import duckdb

    oks = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_orderkey FROM read_parquet("
            f"'{SMOKE_SF_DIR}/orders.parquet')"
        ).fetchall()
    ]
    pks = [
        r[0]
        for r in duckdb.sql(
            f"SELECT p_partkey FROM read_parquet("
            f"'{SMOKE_SF_DIR}/part.parquet')"
        ).fetchall()
    ]
    sks = [
        r[0]
        for r in duckdb.sql(
            f"SELECT s_suppkey FROM read_parquet("
            f"'{SMOKE_SF_DIR}/supplier.parquet')"
        ).fetchall()
    ]
    rows = _adversarial_lineitem(oks, pks, sks)
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
            "l_shipdate": pa.array(
                [r[10] for r in rows], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, str(d / "lineitem.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def graph_dir(tmp_path_factory):
    return _write_lineitem(tmp_path_factory.mktemp("advgraph"))


@pytest.mark.parametrize("name", GRAPH_OPS)
def test_adversarial_graph_parity(spark, graph_dir, name):
    compare_to_oracle(spark, SPECS[name], graph_dir)
