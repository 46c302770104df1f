"""Every registered query must match its DuckDB oracle at sf0.001 —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.parity import run_parity


def _query_names():
    from duck_delta_share_spark.plans import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_query_parity(spark, name):
    failures = run_parity(spark, SF_DIR, names=[name])
    assert not failures, failures[name]


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
