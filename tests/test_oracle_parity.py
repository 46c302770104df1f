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


def test_oracle_types_pandas_safe():
    """No oracle may emit a type pandas widens lossily (HUGEINT→float64):
    the driver canonicalizer hashes int64 vs float64 differently even when
    every value matches (r3 driver red on simhash_signatures)."""
    from tests.parity import audit_oracle_types, duck_connection

    import __spark_entry__ as entrymod

    con = duck_connection(SF_DIR)
    errs: list[str] = []
    for name, sql in sorted(entrymod.oracle_sql().items()):
        errs.extend(audit_oracle_types(con, name, sql))
    assert not errs, errs


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
