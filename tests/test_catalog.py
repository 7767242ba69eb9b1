"""Catalog API + federation catalog-inference tests.

Covers the reference's catalog provider surface (table_names /
table_exist / register / deregister, src/catalog.rs:69-102) and the
information_schema inference path (src/sqldb/postgres/mod.rs:67-125)
that round-1 shipped but never exercised (VERDICT §2A).
"""

from __future__ import annotations

from pyspark.sql import types as T

from datafusion_rdbms_ext_spark.queries.base import ensure_tables  # noqa: E402
from datafusion_rdbms_ext_spark.catalog import (
    TABLES,
    deregister_table,
    register_tables,
    table_exist,
    table_names,
)
from datafusion_rdbms_ext_spark.sources.federation import (
    compile_scan,
    count_records,
    load_catalog,
)

from .conftest import SF_DIR


def test_register_list_exists_deregister(spark):
    register_tables(spark, SF_DIR)
    names = set(table_names(spark))
    assert set(TABLES) <= names
    assert table_exist(spark, "lineitem")
    assert not table_exist(spark, "no_such_table")

    # Deregister then re-register (catalog.rs:84-102 round trip).
    assert deregister_table(spark, "region")
    assert not table_exist(spark, "region")
    register_tables(spark, SF_DIR)
    assert table_exist(spark, "region")


def test_federated_catalog_matches_parquet_footers(spark):
    """information_schema inference must agree with the self-describing
    Parquet schemas Spark reads directly (SURVEY §1.2: infer once,
    fixed thereafter — two independent inference paths, one truth)."""
    register_tables(spark, SF_DIR)
    fed = load_catalog(SF_DIR)
    # events.ts is TIMESTAMP(NANOS): the engine rebases it to a long
    # then to microseconds, DuckDB truncates to TIMESTAMP — skip it.
    for table in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        spark_schema = spark.table(table).schema
        fed_schema = fed[table]
        assert [f.name for f in fed_schema.fields] == [f.name for f in spark_schema.fields]
        assert [f.dataType for f in fed_schema.fields] == [
            f.dataType for f in spark_schema.fields
        ], table
    emb = {f.name: f.dataType for f in fed["embeddings"].fields}
    assert emb["embedding"] == T.ArrayType(T.FloatType())


def test_compile_scan_and_count():
    sql = compile_scan(
        "customer", ["c_custkey"], ["c_acctbal > 0", "c_nationkey = 3"], limit=10
    )
    # Limited scans carry ORDER BY ALL: the base query re-executes per
    # partition task, so the limited row set must be deterministic.
    assert sql == (
        "SELECT c_custkey FROM customer "
        "WHERE (c_acctbal > 0) AND (c_nationkey = 3) ORDER BY ALL LIMIT 10"
    )
    assert count_records(SF_DIR, "SELECT * FROM region") == 5


def test_missing_fixture_fails_loudly(spark, tmp_path):
    """A missing table must raise, not silently leave a stale view
    (catalog.py's fail-loud contract)."""
    import pytest

    with pytest.raises(FileNotFoundError, match="region"):
        register_tables(spark, str(tmp_path))
    # Recover the session's registration for later tests.
    register_tables(spark, SF_DIR)


def test_pyds_filter_translation():
    """The pushFilters classifier must translate supported comparisons
    and decline the rest (the reference's Exact/Unsupported split,
    table_provider.rs:241-306)."""
    from pyspark.sql.datasource import EqualTo, IsNull, StringContains

    from datafusion_rdbms_ext_spark.sources.pyds import _filter_to_sql

    assert _filter_to_sql(EqualTo(("c_name",), "Bob's")) == "c_name = 'Bob''s'"
    assert _filter_to_sql(IsNull(("c_name",))) is None
    assert _filter_to_sql(StringContains(("c_name",), "x")) is None
    assert _filter_to_sql(EqualTo(("a", "b"), 1)) is None  # nested: declined


def test_streaming_datasource_replays_events(spark):
    """The custom streaming source must deliver exactly the remote
    table's rows across micro-batches (CDC-replay contract)."""
    from datafusion_rdbms_ext_spark.sources.pyds import register_duckdb_stream_source

    register_duckdb_stream_source(spark)
    stream = (
        spark.readStream.format("duckdb_fed_stream")
        .option("sf_dir", SF_DIR)
        .option("step", 3000)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("fed_stream_replay")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("fed_stream_replay")
    ensure_tables(spark, SF_DIR)
    import duckdb

    con = duckdb.connect()
    expected = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT event_id) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()
    con.close()
    assert got.count() == expected[0]
    assert got.select("event_id").distinct().count() == expected[1]
