"""Mirror of the driver's correctness gate: every queries() entry with an
oracle must match DuckDB on row count, column names and value hash.

The full registry runs at sf0.001 here (the driver uses sf0.01 — covered
by running the harness manually; see tests/oracle_harness.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from oracle_harness import compare  # noqa: E402

SF = "/root/testdata/sf0.001"

_ORACLED = sorted(entrymod.oracle_sql())


def test_registry_consistency():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # the e2e gets a simulator-derived VALUES oracle (full hash gate)
    assert "crawl_e2e_gather" in q and "crawl_e2e_gather" in o


@pytest.mark.parametrize("name", _ORACLED)
def test_oracle_match(spark, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    r = compare(spark, name, fn, sql, SF)
    assert r["ok"], r


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["host", "enqueue_seq", "priority", "rk"]
