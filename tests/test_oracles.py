"""Run every registered query against its DuckDB oracle at sf0.001 —
the same comparison the driver performs (row count, column names,
order-insensitive values), so correctness regressions surface here
before the driver sees them."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("EK_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_normalize(x) for x in v)
    return v


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_normalize(r[i]) for i in idx) for r in rows)


ORACLED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs oracle {len(orows)}")
    sset = _rows_to_set(scols, srows)
    oset = _rows_to_set(ocols, orows)
    if sset != oset:
        diff_a = [r for r in sset if r not in set(oset)][:5]
        diff_b = [r for r in oset if r not in set(sset)][:5]
        raise AssertionError(
            f"{name}: value mismatch.\n spark-only: {diff_a}\n "
            f"oracle-only: {diff_b}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert "url" in df.columns


def test_all_queries_runnable(spark):
    """Every registry entry (oracled or not) must execute and return a
    stable schema with ≥0 rows."""
    for name, q in entry_mod.queries().items():
        df = q(spark, SF_DIR)
        assert df.count() >= 0, name
        assert df.columns, name
