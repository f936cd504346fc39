"""Run every queries() entry against its DuckDB oracle at sf0.01 — the local
replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_MED
from tests.oracle_check import compare, duck_con

KEYS = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_MED)
    yield c
    c.close()


@pytest.mark.parametrize("key", KEYS)
def test_parity(spark, con, key):
    q = entrymod.queries()[key]
    oracles = entrymod.oracle_sql()
    sdf = q(spark, SF_MED)
    if key not in oracles:
        assert sdf.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    odf = con.sql(oracles[key]).df()
    errs = compare(sdf, odf)
    assert not errs, f"{key}: {errs[:5]}"
    assert len(odf) > 0, f"{key}: oracle returned 0 rows — entry proves nothing"
