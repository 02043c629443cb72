"""The driver-contract gate, as pytest: every queries() entry must match
its DuckDB oracle exactly (row count, schema names, values)."""

import pytest

import __spark_entry__ as entry_mod
from oracle_util import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_runnable_callable():
    assert QUERIES, "no queries registered"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        compare(df, ORACLES[name], sf_dir)
    else:
        # rows-only contract for non-SQL-expressible ops
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == sorted(df.columns, key=lambda c: df.columns.index(c))  # stable order
