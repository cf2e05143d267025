"""Every SQL-expressible registry query must match its DuckDB oracle at
sf0.001 (row count + column names + order-insensitive value hash) — the
in-repo twin of the driver's CORRECTNESS gate."""

import duckdb
import pytest

from film_crawler_spark.queries import REGISTRY
from tools.oracle_check import TABLES, value_hash

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF}/{name}.parquet'")
    return con


@pytest.mark.parametrize("name", [n for n, (_f, s) in REGISTRY.items() if s is not None])
def test_query_matches_oracle(spark, duck, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    dres = duck.sql(sql)
    dcols = [d[0] for d in dres.description]
    drows = dres.fetchall()
    assert len(srows) == len(drows)
    assert sorted(sdf.columns) == sorted(dcols)
    assert value_hash(srows, sdf.columns) == value_hash(drows, dcols)


@pytest.mark.parametrize("name", [n for n, (_f, s) in REGISTRY.items() if s is None])
def test_rows_only_query_runs(spark, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, SF)
    assert df.count() >= 0
