"""The local mirror of the driver's t2 correctness gate: every
registered query with an oracle is executed on Spark and DuckDB over
the same parquet fixtures and compared order-insensitively.
"""

from __future__ import annotations

import pytest

from causality_between_elements_based_on_time_series_data_spark.plans import REGISTRY

from ._compare import compare, duckdb_conn

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(q.oracle).df()
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.schema is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
