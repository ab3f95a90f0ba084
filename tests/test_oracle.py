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


def test_driver_window_rotation_invariant():
    """The external gate checks only the first 50 REGISTRY entries. The
    rotation rule: no declared query goes more than one round without a
    driver row. Data-driven from the recorded CORRECTNESS_r*.json files:
    every query must be inside the current window OR have a row in the
    most recent correctness record (⇒ at most one round stale); a query
    never driver-checked in ANY round must be inside the window."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    records = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    window = set(list(REGISTRY)[:50])

    def _names(path):
        with open(path) as fh:
            data = json.load(fh)
        inner = data.get("queries", data)
        return set(inner) if isinstance(inner, dict) else {r["name"] for r in inner}

    ever_checked = set().union(*map(_names, records)) if records else set()
    latest = _names(records[-1]) if records else set()

    never = [n for n in REGISTRY if n not in ever_checked and n not in window]
    assert not never, f"never driver-checked AND outside the window: {never}"
    stale = [n for n in REGISTRY if n not in window and n not in latest]
    assert not stale, f"would go >1 round without a driver row: {stale}"
