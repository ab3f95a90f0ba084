"""Every declared query must hash-match its DuckDB oracle at sf0.01 —
the same comparison the driver runs (CORRECTNESS gate)."""

from __future__ import annotations

import pytest

from electrician_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_conn

_WITH_ORACLE = [n for n, q in REGISTRY.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def duck():
    con = duckdb_conn(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    qd = REGISTRY[name]
    oracle_pdf = duck.execute(qd.oracle).fetchdf()
    res = compare(name, qd.spark(spark, SF_ORACLE), oracle_pdf)
    assert res.ok, res.detail
