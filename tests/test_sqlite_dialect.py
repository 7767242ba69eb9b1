"""Dialect-two (SQLite) federation seam tests: catalog inference via
PRAGMA, equi-width partition predicates disjoint+covering, and the
lossy dynamic-type mapping."""

from __future__ import annotations

import sqlite3

from pyspark.sql import types as T

from datafusion_rdbms_ext_spark.sources.sqlite_fed import (
    _equi_width_predicates,
    load_catalog_sqlite,
    sqlite_db_path,
)

from .conftest import SF_DIR


def test_catalog_inference_types():
    cat = load_catalog_sqlite(SF_DIR)
    assert set(cat) >= {"region", "nation", "customer", "supplier"}
    cust = {f.name: f.dataType for f in cat["customer"].fields}
    assert isinstance(cust["c_custkey"], T.LongType)
    assert isinstance(cust["c_acctbal"], T.DoubleType)
    assert isinstance(cust["c_name"], T.StringType)


def test_equi_width_predicates_disjoint_and_covering():
    db = sqlite_db_path(SF_DIR)
    base = "SELECT c_custkey, c_acctbal FROM customer"
    preds = _equi_width_predicates(db, base, "c_custkey", 4)
    assert len(preds) == 4
    con = sqlite3.connect(db)
    try:
        total = con.execute(f"SELECT COUNT(*) FROM ({base})").fetchone()[0]
        slices = [
            con.execute(
                f"SELECT COUNT(*) FROM ({base}) _t WHERE {p}"
            ).fetchone()[0]
            for p in preds
        ]
    finally:
        con.close()
    # disjoint + covering: slice counts sum exactly to the total.
    assert sum(slices) == total
    assert all(s > 0 for s in slices)  # equi-width on a dense PK: balanced


def test_partition_sqls_are_sort_free():
    db = sqlite_db_path(SF_DIR)
    preds = _equi_width_predicates(
        db, "SELECT c_custkey FROM customer", "c_custkey", 3
    )
    assert all("ORDER BY" not in p.upper() for p in preds)
