"""Dialect four (MySQL — the reference's `todo!()` enum variant,
mod.rs:12-16,47-48) proven as CONFIGURATION on the Connector seam,
without a server: catalog bootstrap SQL, the unsigned-integer type
widening, equi-width partition planning, capability negotiation, the
full connector_scan pipeline, and the transparent-unparse rendering
pass all run against a canned-wire subclass; only fetch bytes are
faked. The Postgres dialect followed exactly this path one round
before its live server existed.

MySQL quirks encoded (each pinned below):
* backtick identifier quoting — Spark's spelling IS MySQL's; the
  ANSI double-quote rewrite the other dialects apply would turn
  identifiers into string literals here
* bare OFFSET needs LIMIT 18446744073709551615 (manual's spelling)
* no INTERSECT/EXCEPT at the conservative (< 8.0.31) floor
* LENGTH() is bytes, not characters → char_length
* LIKE under *_ci collations is case-insensitive → denied
* DATA_TYPE drops signedness; unsigned bigint only fits Decimal(20,0)
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from datafusion_rdbms_ext_spark.sources.connector import (
    MySqlConnector,
    connector_scan,
)


class CannedMySql(MySqlConnector):
    """The wire faked, the dialect real: serves canned frames for the
    exact SQL the dialect layer generates (mismatched SQL raises, so
    the test pins the generated text byte-for-byte)."""

    def __init__(self, canned: dict[str, pd.DataFrame]):
        super().__init__(dsn="host=fake", schema="fixture")
        self.canned = dict(canned)
        self.fetched: list[str] = []

    def fetch_pdf(self, sql: str) -> pd.DataFrame:
        self.fetched.append(sql)
        key = " ".join(sql.split())
        if key not in self.canned:
            raise AssertionError(f"unexpected wire SQL: {key!r}")
        return self.canned[key]


def _canned_catalog() -> dict[str, pd.DataFrame]:
    cols = pd.DataFrame(
        {
            "table_name": ["nation"] * 5,
            "column_name": [
                "n_nationkey", "n_name", "n_acctbal", "n_flags", "n_ts",
            ],
            "data_type": ["int", "varchar", "decimal", "bigint", "datetime"],
            "column_type": [
                "int(11)",
                "varchar(25)",
                "decimal(15,2)",
                "bigint(20) unsigned",
                "datetime",
            ],
            "is_nullable": ["NO", "YES", "YES", "YES", "YES"],
        }
    )
    probe = MySqlConnector("host=fake", schema="fixture")
    tables_sql, columns_sql = probe.catalog_sql()
    tables = pd.DataFrame({"table_name": ["nation"]})
    view_cols = pd.DataFrame(
        {
            "table_name": ["nation_view"],
            "column_name": ["n_name"],
            "data_type": ["varchar"],
            "column_type": ["varchar(25)"],
            "is_nullable": ["YES"],
        }
    )
    return {
        " ".join(tables_sql.split()): tables,
        " ".join(columns_sql.split()): pd.concat(
            [cols, view_cols], ignore_index=True
        ),
    }


def test_catalog_bootstrap_sql_and_type_map():
    conn = CannedMySql(_canned_catalog())
    cat = conn.catalog()
    assert list(cat) == ["nation"]  # the view is filtered out
    fields = {f.name: f for f in cat["nation"].fields}
    assert isinstance(fields["n_nationkey"].dataType, T.IntegerType)
    assert fields["n_nationkey"].nullable is False
    assert isinstance(fields["n_name"].dataType, T.StringType)
    assert fields["n_acctbal"].dataType == T.DecimalType(38, 4)
    # the signedness quirk: DATA_TYPE says 'bigint' but COLUMN_TYPE
    # says unsigned — int64 cannot hold 2^64-1, only Decimal(20,0)
    assert fields["n_flags"].dataType == T.DecimalType(20, 0)
    # DATETIME is the timezone-less type (TIMESTAMP is UTC storage)
    assert isinstance(fields["n_ts"].dataType, T.TimestampNTZType)
    # bootstrap text pinned: schema == DATABASE, COLUMN_TYPE rides
    tables_sql, columns_sql = conn.catalog_sql()
    assert "information_schema.tables" in tables_sql
    assert "table_schema = 'fixture'" in tables_sql
    assert "column_type" in columns_sql
    assert "ordinal_position" in columns_sql


def test_equiwidth_partition_planning():
    conn = CannedMySql({})
    msql = conn.minmax_sql("SELECT * FROM nation", "n_nationkey")
    assert msql == (
        "SELECT MIN(n_nationkey) AS lo, MAX(n_nationkey) AS hi "
        "FROM (SELECT * FROM nation) _t"
    )
    conn.canned[" ".join(msql.split())] = pd.DataFrame(
        {"lo": [0], "hi": [23]}
    )
    preds = conn.partition_predicates("SELECT * FROM nation", "n_nationkey", 4)
    assert preds == [
        "(n_nationkey < 6 OR n_nationkey IS NULL)",
        "(n_nationkey >= 6 AND n_nationkey < 12)",
        "(n_nationkey >= 12 AND n_nationkey < 18)",
        "(n_nationkey >= 18)",
    ]


def test_connector_scan_end_to_end_with_canned_wire(spark):
    """The SAME connector_scan pipeline that serves DuckDB, SQLite
    and Postgres executes against the MySQL dialect unchanged — the
    'fourth dialect is configuration' claim, executed."""
    canned = _canned_catalog()
    conn = CannedMySql(canned)
    base = "SELECT n_nationkey, n_name FROM nation WHERE (n_nationkey < 20)"
    msql = conn.minmax_sql(base, "n_nationkey")
    conn.canned[" ".join(msql.split())] = pd.DataFrame(
        {"lo": [1], "hi": [11]}
    )
    lo = pd.DataFrame({"n_nationkey": [1, 2], "n_name": ["a", "b"]})
    hi = pd.DataFrame({"n_nationkey": [10, 11], "n_name": ["j", "k"]})
    conn.canned[
        f"SELECT * FROM ({base}) _t WHERE (n_nationkey < 6 OR n_nationkey IS NULL)"
    ] = lo
    conn.canned[f"SELECT * FROM ({base}) _t WHERE (n_nationkey >= 6)"] = hi
    df = connector_scan(
        spark,
        conn,
        "nation",
        columns=["n_nationkey", "n_name"],
        predicates=["n_nationkey < 20"],
        partitions=2,
        partition_key="n_nationkey",
    )
    rows = sorted((r.n_nationkey, r.n_name) for r in df.collect())
    assert rows == [(1, "a"), (2, "b"), (10, "j"), (11, "k")]


def test_capability_negotiation_refuses_bare_limit(spark):
    conn = CannedMySql(_canned_catalog())
    with pytest.raises(ValueError, match="deterministic"):
        connector_scan(spark, conn, "nation", limit=5)


def test_driverless_fetch_fails_loudly():
    """No MySQL driver ships in this container: the live path must
    say so explicitly, never pretend."""
    conn = MySqlConnector("host=127.0.0.1 port=3306 user=x dbname=x")
    with pytest.raises(RuntimeError, match="canned-wire"):
        conn.fetch_pdf("SELECT 1")
    p = MySqlConnector(
        "host=10.0.0.9 port=3307 user=app password=pw dbname=warehouse"
    )._params()
    assert p == {
        "host": "10.0.0.9",
        "port": 3307,
        "user": "app",
        "password": "pw",
        "database": "warehouse",
    }


# ---------------------------------------------------------------------------
# Transparent-unparse rendering for dialect four: the same plan
# shapes the DuckDB/SQLite/Postgres batteries pin, rendered with the
# MySQL quirks. No server exists in this container, so validation
# deliberately stops at SQL generation — the Postgres precedent.
# ---------------------------------------------------------------------------
def _fed(spark, table):
    from datafusion_rdbms_ext_spark.queries.base import ensure_tables
    from datafusion_rdbms_ext_spark.sources.pushdown import _fed_table

    from .conftest import SF_DIR

    ensure_tables(spark, SF_DIR)
    return _fed_table(spark, SF_DIR, table)


def test_mysql_unparse_full_pin(spark):
    from pyspark.sql import functions as F

    from datafusion_rdbms_ext_spark.sources.pushdown import unparse_to_dialect

    df = (
        _fed(spark, "nation")
        .filter(F.col("n_regionkey") > 1)
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"))
    )
    assert unparse_to_dialect(df, "mysql") == (
        "SELECT n_regionkey, count(1) AS n FROM "
        "(SELECT * FROM (SELECT * FROM nation) _p1 WHERE (n_regionkey > 1)) _p2 "
        "GROUP BY n_regionkey"
    )


def test_mysql_unparse_quirk_battery(spark):
    from pyspark.sql import functions as F

    from datafusion_rdbms_ext_spark.sources.pushdown import unparse_to_dialect

    c = lambda: _fed(spark, "customer")  # noqa: E731
    cases = {
        # shape -> (df, fragments that MUST appear, that MUST NOT)
        "length_is_bytes": (
            c().select(F.length("c_name").alias("n")),
            ["SELECT char_length(c_name)"],
            [" length(c_name)"],
        ),
        # MySQL concat propagates NULL like Spark: NO '||' rewrite
        # (|| would be logical OR under the default sql_mode)
        "concat_stays": (
            c().select(F.concat("c_name", "c_mktsegment").alias("x")),
            ["concat(c_name, c_mktsegment)"],
            ["||"],
        ),
        # datediff/locate share Spark's spelling — pass through
        "datediff_stays": (
            c().select(
                F.datediff(
                    F.lit("1998-01-01").cast("date"),
                    F.lit("1998-01-01").cast("date"),
                ).alias("n")
            ),
            ["datediff("],
            [],
        ),
        "offset_needs_limit": (
            c().orderBy("c_custkey").offset(7),
            ["LIMIT 18446744073709551615 OFFSET 7"],
            [],
        ),
    }
    wrong = []
    for name, (df, must, must_not) in cases.items():
        sql = unparse_to_dialect(df, "mysql")
        if sql is None:
            wrong.append(f"{name}: no unparse")
            continue
        for frag in must:
            if frag not in sql:
                wrong.append(f"{name}: missing {frag!r} in {sql!r}")
        for frag in must_not:
            if frag in sql:
                wrong.append(f"{name}: still contains {frag!r} in {sql!r}")
    assert not wrong, wrong


def test_mysql_denials_and_gates(spark):
    """Divergent-semantics shapes must render to None (fall back to
    the local plan), never to silently-wrong SQL: LIKE (ci
    collations), regexp_replace (ICU flavor + ci), INTERSECT/EXCEPT
    (absent below 8.0.31) — while the SAME plans still render for
    dialects that support them."""
    from pyspark.sql import functions as F

    from datafusion_rdbms_ext_spark.sources.pushdown import unparse_to_dialect

    liked = _fed(spark, "customer").filter(F.col("c_name").like("%a%"))
    assert unparse_to_dialect(liked, "mysql") is None
    assert unparse_to_dialect(liked, "postgres") is not None

    rr = _fed(spark, "customer").select(
        F.regexp_replace("c_name", "a", "b").alias("s")
    )
    assert unparse_to_dialect(rr, "mysql") is None

    inter = (
        _fed(spark, "customer")
        .select("c_custkey")
        .intersect(_fed(spark, "orders").select("o_custkey"))
    )
    assert unparse_to_dialect(inter, "mysql") is None
    assert unparse_to_dialect(inter, "postgres") is not None


def test_mysql_backticks_survive(spark):
    """An identifier Spark must quote stays BACKTICK-quoted for
    MySQL (ANSI double quotes would make it a string literal under
    the default sql_mode), while the Postgres rendering of the same
    plan converts to double quotes."""
    from pyspark.sql import functions as F

    from datafusion_rdbms_ext_spark.sources.pushdown import unparse_to_dialect

    df = _fed(spark, "nation").select(
        F.col("n_name").alias("weird name")
    )
    my = unparse_to_dialect(df, "mysql")
    pg = unparse_to_dialect(df, "postgres")
    assert my is not None and "`weird name`" in my and '"' not in my
    assert pg is not None and '"weird name"' in pg and "`" not in pg
