"""Every catalog query with an oracle must match DuckDB exactly at sf0.01 —
the same gate the driver runs (row count + schema + order-insensitive
values)."""

from __future__ import annotations

import pytest

from bag_parser_spark.plans.catalog import registry
from tests.oracle_harness import compare

_REG = registry()
_WITH_ORACLE = sorted(n for n, qd in _REG.items() if qd.sql)
_ROWS_ONLY = sorted(n for n, qd in _REG.items() if not qd.sql)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, name):
    qd = _REG[name]
    ok, msg = compare(spark, name, qd.fn, qd.sql)
    assert ok, msg


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    qd = _REG[name]
    df = qd.fn(spark, "/root/testdata/sf0.01")
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
