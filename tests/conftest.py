"""Shared fixtures: one session-scoped SparkSession + DuckDB oracle diff."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from a_tree_spark.engine.session import get_spark

    spark = get_spark("a_tree_spark-tests", cpus=4, shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "8g"})
    yield spark
    spark.stop()


def duck_connection(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    """Mirror the driver's harness: every table pre-registered as a view."""
    con = duckdb.connect()
    for table in TABLES:
        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return round(value, 9)
    if hasattr(value, "tolist"):  # numpy arrays from duckdb
        return tuple(_normalize(v) for v in value.tolist())
    if isinstance(value, (list, tuple)):
        return tuple(_normalize(v) for v in value)
    import decimal

    if isinstance(value, decimal.Decimal):
        return str(value.normalize())
    return value


def rows_of(records) -> list[tuple]:
    # key=repr: total order even for rows mixing NULLs with values
    return sorted(
        (tuple(_normalize(v) for v in row) for row in records), key=repr
    )


def assert_matches_duckdb(spark_df, oracle_sql: str, sf_dir: str = SF_DIR):
    """Order-insensitive row diff of a Spark DataFrame vs DuckDB SQL,
    with columns aligned by name (the driver sorts columns by name)."""
    con = duck_connection(sf_dir)
    oracle = con.execute(oracle_sql)
    oracle_cols = [d[0] for d in oracle.description]
    oracle_rows = oracle.fetchall()
    con.close()

    spark_cols = spark_df.columns
    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    )
    order = sorted(spark_cols)
    spark_rows = [
        tuple(row[c] for c in order) for row in spark_df.collect()
    ]
    oracle_index = {c: i for i, c in enumerate(oracle_cols)}
    oracle_rows = [
        tuple(row[oracle_index[c]] for c in order) for row in oracle_rows
    ]
    got, want = rows_of(spark_rows), rows_of(oracle_rows)
    assert got == want, (
        f"row mismatch: spark={len(got)} oracle={len(want)}\n"
        f"first spark-only: {[r for r in got if r not in want][:3]}\n"
        f"first oracle-only: {[r for r in want if r not in got][:3]}"
    )
