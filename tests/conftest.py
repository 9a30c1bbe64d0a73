from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from toymapreduce_go_spark.session import build_session  # noqa: E402
from toymapreduce_go_spark.sources.registry import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "local_cluster: spawns a real standalone Master/Worker with "
        "separate executor JVMs (local-cluster[...]); deselect with "
        "-m 'not local_cluster' on hosts without the launcher")


@pytest.fixture(scope="session")
def spark():
    s = build_session("toymapreduce-go-spark-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def normalize_cell(v):
    """Canonical form for cross-engine value comparison (mirror of the
    driver's order-insensitive value-hash: sort columns by name, stringify
    cells)."""
    import datetime
    import decimal
    import math
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, decimal.Decimal):
        return normalize_cell(float(v))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def df_to_canonical(cols, rows):
    """Sorted list of row-tuples with columns ordered by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def spark_canonical(df):
    return df_to_canonical(df.columns, df.collect())


def duck_canonical(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return df_to_canonical(cols, cur.fetchall())
