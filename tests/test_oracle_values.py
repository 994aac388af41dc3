"""Value-level oracle parity in CI: every oracle-checked query's full
result set must equal DuckDB's at sf0.001 (exact values, not just
rowcount/columns — the same gate the driver applies at sf0.01)."""

import os

import duckdb
import pytest

import duckdb_extension_kafquack_spark.operators  # noqa: F401
import duckdb_extension_kafquack_spark.streaming  # noqa: F401
import duckdb_extension_kafquack_spark.functions.udf  # noqa: F401
import duckdb_extension_kafquack_spark.tpch  # noqa: F401
from duckdb_extension_kafquack_spark.session import TABLES
from duckdb_extension_kafquack_spark.suite import REGISTRY
from tests.conftest import SF_DIR

import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from oracle_check import compare  # noqa: E402


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize(
    "name", sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
)
def test_values_match_oracle(spark, duck, name):
    q = REGISTRY[name]
    spdf = q.fn(spark, SF_DIR).toPandas()
    dpdf = duck.execute(q.oracle).fetchdf()
    problems = compare(name, spdf, dpdf)
    assert not problems, f"{name}: {problems[:3]}"
