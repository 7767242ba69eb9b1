"""Federated sink semantics: overwrite vs append through the Python
DataSource Arrow writer's two-phase commit."""

from __future__ import annotations

import os
import tempfile

import duckdb
from pyspark.sql import functions as F

from datafusion_rdbms_ext_spark.queries.base import ensure_tables
from datafusion_rdbms_ext_spark.sources.pyds import register_duckdb_sink

from .conftest import SF_DIR


def _write(spark, df, db, staging, mode):
    (
        df.write.format("duckdb_fed_sink")
        .mode(mode)
        .option("db_path", db)
        .option("table", "t")
        .option("staging_dir", staging)
        .save()
    )


def _count(db):
    con = duckdb.connect(db)
    try:
        return con.execute("SELECT COUNT(*) FROM t").fetchone()[0]
    finally:
        con.close()


def test_fed_sink_overwrite_then_append(spark):
    ensure_tables(spark, SF_DIR)
    register_duckdb_sink(spark)
    base = tempfile.mkdtemp(prefix="fed_sink_test_")
    db = os.path.join(base, "r.db")
    staging = os.path.join(base, "staging")
    os.makedirs(staging, exist_ok=True)

    docs = spark.table("documents").select("doc_id", "lang")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    na, nb = a.count(), b.count()

    _write(spark, a, db, staging, "overwrite")
    assert _count(db) == na
    # overwrite replaces, not accumulates
    _write(spark, a, db, staging, "overwrite")
    assert _count(db) == na
    # append adds the disjoint half exactly once
    _write(spark, b, db, staging, "append")
    assert _count(db) == na + nb
