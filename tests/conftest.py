"""Shared fixtures: one SparkSession per test run + a DuckDB oracle.

Local replica of the driver's correctness gate: every registered
query runs on Spark AND its oracle SQL runs on DuckDB over the same
parquet, and results must match exactly (row count, column names,
order-insensitive values) — the automated upgrade of the reference's
print-and-eyeball testing (/root/reference/tests/tpch.rs:38-44).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from datafusion_rdbms_ext_spark.catalog import TABLES
from datafusion_rdbms_ext_spark.session import get_spark

# sf0.01 is what the driver's t2 uses; override for quicker local runs.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("engine-tests")
    yield spark


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the fixture tables as views (the same
    pre-registration the driver does)."""
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "fullgate: differential-gate rows past the 50 recorded driver "
        "slots — excluded by the fast tier "
        '(pytest -m "not fullgate"); the full default run is the '
        "pre-close gate",
    )
