"""Federated pushdown source — the reference's core, re-expressed.

The reference IS a query-federation extension: it infers a catalog
from ``information_schema`` (/root/reference/src/sqldb/postgres/
mod.rs:67-125), compiles projection+filters+limit into SQL executed
on the database (table_provider.rs:79-159), splits the result into 4
LIMIT/OFFSET partitions sized by ``count_records`` (mod.rs:170-189,
table_provider.rs:123-158), and decodes each partition's stream into
columnar batches (binary_reader.rs).

Here the "remote RDBMS" is DuckDB over the fixture parquet (playing
Postgres), and each partition's fetch runs ON AN EXECUTOR inside
``mapInPandas`` — N concurrent database cursors feeding Arrow
batches, exactly the reference's N concurrent COPY streams
(PostgresExec). Differences by design:

* Partition queries carry a deterministic ORDER BY before
  LIMIT/OFFSET — the reference's unordered LIMIT/OFFSET split can
  return overlapping/missing rows (SURVEY §3.2 hazard); ours cannot.
* Schema inference maps ``information_schema`` type names to Spark
  types (the ``PgDataType -> Field`` conversion, datatypes.rs:138-184).

Scale: the pattern is the JDBC-partitioned-read shape; partition
count is a parameter (the reference hardcodes 4). Pushdown means the
database does the filtering/projection, so only result rows cross
the wire — at 100 TB the win is identical to Parquet predicate
pushdown: move the query to the data.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..queries.base import register

#: information_schema data_type -> Spark type (datatypes.rs:141-176 parity).
_TYPE_MAP: dict[str, T.DataType] = {
    "BIGINT": T.LongType(),
    "INTEGER": T.IntegerType(),
    "SMALLINT": T.ShortType(),
    "TINYINT": T.ByteType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT": T.FloatType(),
    "REAL": T.FloatType(),
    "VARCHAR": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "DATE": T.DateType(),
    # DuckDB TIMESTAMP has no timezone — Spark's NTZ type, matching
    # what the Parquet reader infers for isAdjustedToUTC=false.
    "TIMESTAMP": T.TimestampNTZType(),
    "TIMESTAMP WITH TIME ZONE": T.TimestampType(),
    "BLOB": T.BinaryType(),
    "FLOAT[]": T.ArrayType(T.FloatType()),
    "DOUBLE[]": T.ArrayType(T.DoubleType()),
}


def _connect(sf_dir: str):
    """Open the 'remote database': DuckDB with one view per fixture
    table (the stand-in for a live Postgres `bench` database)."""
    import duckdb

    from ..catalog import TABLES

    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def load_catalog(sf_dir: str) -> dict[str, T.StructType]:
    """Catalog inference via information_schema (mod.rs:67-125 parity).

    Two metadata queries — tables, then columns per table — exactly
    the reference's bootstrap sequence, with the type-name mapping
    done by ``_TYPE_MAP`` instead of datatypes.rs."""
    con = _connect(sf_dir)
    tables = [
        r[0]
        for r in con.execute(
            "SELECT table_name FROM information_schema.tables "
            "WHERE table_schema = 'main' ORDER BY table_name"
        ).fetchall()
    ]
    out: dict[str, T.StructType] = {}
    for t in tables:
        cols = con.execute(
            "SELECT column_name, data_type, is_nullable "
            "FROM information_schema.columns WHERE table_name = ? "
            "ORDER BY ordinal_position",
            [t],
        ).fetchall()
        out[t] = T.StructType(
            [
                T.StructField(c, _TYPE_MAP.get(dt, T.StringType()), nullable == "YES")
                for c, dt, nullable in cols
            ]
        )
    con.close()
    return out


def count_records(sf_dir: str, query: str) -> int:
    """``SELECT COUNT(*) FROM (<q>) a`` — mod.rs:170-189 parity."""
    con = _connect(sf_dir)
    n = con.execute(f"SELECT COUNT(*) FROM ({query}) a").fetchone()[0]
    con.close()
    return int(n)


def compile_scan(
    table: str,
    columns: list[str] | None = None,
    predicates: list[str] | None = None,
    limit: int | None = None,
) -> str:
    """Compile a pushdown scan to SQL (table_provider.rs:87-121
    parity): projected column list, ANDed filter conjuncts, LIMIT."""
    cols = ", ".join(columns) if columns else "*"
    sql = f"SELECT {cols} FROM {table}"
    if predicates:
        sql += " WHERE " + " AND ".join(f"({p})" for p in predicates)
    if limit is not None:
        # A bare LIMIT is nondeterministic: the base query re-executes
        # on a fresh connection per partition task (and once in
        # count_records), so each execution must pick the SAME rows or
        # the partition slices overlap/miss. ORDER BY ALL pins the
        # selected row set across executions.
        sql += f" ORDER BY ALL LIMIT {limit}"
    return sql


def federated_scan(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    predicates: list[str] | None = None,
    limit: int | None = None,
    partitions: int = 4,
) -> DataFrame:
    """Partitioned pushdown scan (PostgresExec parity, executor-side).

    The driver plans N LIMIT/OFFSET partition queries (with a
    deterministic ORDER BY — fixing the reference's soundness gap);
    each Spark task opens its own database cursor and streams its
    partition as Arrow batches through ``mapInPandas``."""
    schema = load_catalog(sf_dir)[table]
    if columns:
        schema = T.StructType([f for f in schema.fields if f.name in set(columns)])
        order_cols = ", ".join(columns)
    else:
        order_cols = ", ".join(f.name for f in schema.fields)

    base_sql = compile_scan(table, columns, predicates, limit)
    total = count_records(sf_dir, base_sql)
    per_part = (total + partitions - 1) // partitions if total else 0

    spec = spark.createDataFrame(
        [(i, i * per_part, per_part) for i in range(partitions)],
        "pid int, off long, cnt long",
    ).repartition(partitions, "pid")

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                if row["cnt"] <= 0:
                    continue
                con = _connect(sf_dir)
                # Wrap the base query: its own LIMIT (if any) must
                # apply BEFORE the deterministic partition ordering,
                # and appending a second LIMIT directly would be
                # invalid SQL.
                part_sql = (
                    f"SELECT * FROM ({base_sql}) _t ORDER BY {order_cols} "
                    f"LIMIT {int(row['cnt'])} OFFSET {int(row['off'])}"
                )
                yield con.execute(part_sql).fetchdf()
                con.close()

    return spec.mapInPandas(fetch, schema)


# ---------------------------------------------------------------------------
# Registered queries.
# ---------------------------------------------------------------------------
@register(
    "fed_pushdown_scan",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_acctbal > 5000.0
    ORDER BY c_custkey
    """,
    doc="Federated pushdown scan (projection+filter compiled to "
    "remote SQL, 4 LIMIT/OFFSET partitions fetched executor-side) — "
    "the reference's PostgresExec path (table_provider.rs:79-159).",
    tags=("federation",),
)
def fed_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = federated_scan(
        spark,
        sf_dir,
        "customer",
        columns=["c_custkey", "c_name", "c_acctbal"],
        predicates=["c_acctbal > 5000.0"],
        partitions=4,
    )
    return df.orderBy("c_custkey")


@register(
    "fed_join_local",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_rich
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 5000.0
    GROUP BY n_name ORDER BY n_name
    """,
    doc="Federated scan joined with a locally-registered dim — the "
    "hybrid federation/local plan the reference targets (SURVEY §3.2).",
    tags=("federation",),
)
def fed_join_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    fed = federated_scan(
        spark,
        sf_dir,
        "customer",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
        predicates=["c_acctbal > 5000.0"],
        partitions=4,
    )
    return (
        fed.join(F.broadcast(spark.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_rich"))
        .orderBy("n_name")
    )
