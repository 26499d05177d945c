"""Driver-fidelity dtype sweep over EVERY driver oracle.

The driver compares Spark vs DuckDB through pandas, where the value
hash is byte-sensitive: an uncast DuckDB windowed SUM (HUGEINT) lands
as float64 while Spark emits int64, so rows_match/schema_match pass
but hash_match fails (round-2 raster_vector, round-5 sessionize). The
per-test harness (`assert_matches_duckdb`) now checks this on every
oracle test; this sweep additionally pins ALL `__spark_entry__`
oracles — including ones whose dedicated tests build fixtures instead
of calling the harness — so a new oracle can't ship with a dtype trap.

Cheap by construction: the Spark side only needs the SCHEMA (lazy, no
job); only DuckDB executes, at sf0.001.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR, assert_driver_dtypes, duck_connection

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_an_oracle():
    missing = sorted(set(QUERIES) - set(ORACLES))
    assert not missing, f"driver rows without oracle SQL: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_pandas_dtypes_align_with_spark_schema(spark, name):
    spark_df = QUERIES[name](spark, SF_DIR)
    con = duck_connection(SF_DIR)
    try:
        oracle_pdf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    assert_driver_dtypes(spark_df, oracle_pdf)
