"""Dialect five (SQL Server — the reference's other `todo!()` enum
variant, mod.rs:12-16,47-48; with MySQL this closes the ENTIRE
DatabaseConnector enum) proven as CONFIGURATION on the Connector
seam, without a server: catalog bootstrap SQL, the T-SQL window-form
quantile planning, capability negotiation, the connector_scan
pipeline, and the transparent-unparse rendering pass all run against
a canned-wire subclass; only fetch bytes are faked.

T-SQL quirks encoded (each pinned below):
* PERCENTILE_DISC is a WINDOW function (OVER ()), not an ordered-set
  aggregate — DISTINCT collapses it to one split-point row
* tinyint is UNSIGNED (0-255) → ShortType, never ByteType
* bit → Boolean; money/smallmoney → exact Decimal
* CONCAT swallows NULLs where Spark propagates → rewrite to `+`
* LEN() ignores trailing spaces → the (LEN(a + 'x') - 1) idiom
* locate → CHARINDEX; datediff → DATEDIFF(day, start, end) (unit
  first, arguments swapped)
* LIMIT/OFFSET denied (OFFSET/FETCH needs a total order); boolean
  literals denied (bit has none); LIKE denied (CI collations);
  INTERSECT/EXCEPT ALL gated (T-SQL has only the DISTINCT forms)
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from datafusion_rdbms_ext_spark.sources.connector import (
    MsSqlConnector,
    connector_scan,
)


class CannedMsSql(MsSqlConnector):
    def __init__(self, canned: dict[str, pd.DataFrame]):
        super().__init__(dsn="host=fake", schema="dbo")
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
            "table_name": ["nation"] * 6,
            "column_name": [
                "n_nationkey", "n_name", "n_flag", "n_tiny", "n_bal",
                "n_ts",
            ],
            "data_type": [
                "int", "nvarchar", "bit", "tinyint", "money", "datetime2",
            ],
            "is_nullable": ["NO", "YES", "YES", "YES", "YES", "YES"],
        }
    )
    probe = MsSqlConnector("host=fake", schema="dbo")
    tables_sql, columns_sql = probe.catalog_sql()
    tables = pd.DataFrame({"table_name": ["nation"]})
    view_cols = pd.DataFrame(
        {
            "table_name": ["nation_view"],
            "column_name": ["n_name"],
            "data_type": ["nvarchar"],
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
    conn = CannedMsSql(_canned_catalog())
    cat = conn.catalog()
    assert list(cat) == ["nation"]  # the view is filtered out
    fields = {f.name: f for f in cat["nation"].fields}
    assert isinstance(fields["n_nationkey"].dataType, T.IntegerType)
    assert fields["n_nationkey"].nullable is False
    assert isinstance(fields["n_flag"].dataType, T.BooleanType)
    # tinyint is UNSIGNED 0-255: ByteType's 127 ceiling would corrupt
    assert isinstance(fields["n_tiny"].dataType, T.ShortType)
    assert fields["n_bal"].dataType == T.DecimalType(19, 4)  # money
    assert isinstance(fields["n_ts"].dataType, T.TimestampNTZType)
    tables_sql, _ = conn.catalog_sql()
    assert "table_schema = 'dbo'" in tables_sql


def test_window_form_quantile_planning():
    conn = CannedMsSql({})
    qsql = conn.quantile_sql("SELECT * FROM nation", "n_nationkey", 4)
    assert "PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY n_nationkey) OVER ()" in qsql
    assert qsql.startswith("SELECT DISTINCT ")
    conn.canned[" ".join(qsql.split())] = pd.DataFrame(
        {"q1": [6], "q2": [12], "q3": [18]}
    )
    preds = conn.partition_predicates("SELECT * FROM nation", "n_nationkey", 4)
    assert preds == [
        "(n_nationkey < 6 OR n_nationkey IS NULL)",
        "(n_nationkey >= 6 AND n_nationkey < 12)",
        "(n_nationkey >= 12 AND n_nationkey < 18)",
        "(n_nationkey >= 18)",
    ]


def test_connector_scan_end_to_end_with_canned_wire(spark):
    canned = _canned_catalog()
    conn = CannedMsSql(canned)
    base = "SELECT n_nationkey, n_name FROM nation WHERE (n_nationkey < 20)"
    qsql = conn.quantile_sql(base, "n_nationkey", 2)
    conn.canned[" ".join(qsql.split())] = pd.DataFrame({"q1": [10]})
    lo = pd.DataFrame({"n_nationkey": [1, 2], "n_name": ["a", "b"]})
    hi = pd.DataFrame({"n_nationkey": [10, 11], "n_name": ["j", "k"]})
    conn.canned[
        f"SELECT * FROM ({base}) _t WHERE (n_nationkey < 10 OR n_nationkey IS NULL)"
    ] = lo
    conn.canned[f"SELECT * FROM ({base}) _t WHERE (n_nationkey >= 10)"] = hi
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
    conn = CannedMsSql(_canned_catalog())
    with pytest.raises(ValueError, match="deterministic"):
        connector_scan(spark, conn, "nation", limit=5)


def test_driverless_fetch_fails_loudly():
    conn = MsSqlConnector("host=127.0.0.1 port=1433 user=x dbname=x")
    with pytest.raises(RuntimeError, match="canned-wire"):
        conn.fetch_pdf("SELECT 1")
    p = MsSqlConnector(
        "host=10.0.0.9 port=1434 user=app password=pw dbname=warehouse"
    )._params()
    assert p == {
        "host": "10.0.0.9",
        "port": 1434,
        "user": "app",
        "password": "pw",
        "database": "warehouse",
    }


# ---------------------------------------------------------------------------
# Transparent-unparse rendering for dialect five.
# ---------------------------------------------------------------------------
def _fed(spark, table):
    from datafusion_rdbms_ext_spark.queries.base import ensure_tables
    from datafusion_rdbms_ext_spark.sources.pushdown import _fed_table

    from .conftest import SF_DIR

    ensure_tables(spark, SF_DIR)
    return _fed_table(spark, SF_DIR, table)


def test_mssql_unparse_full_pin(spark):
    from pyspark.sql import functions as F

    from datafusion_rdbms_ext_spark.sources.pushdown import unparse_to_dialect

    df = (
        _fed(spark, "nation")
        .filter(F.col("n_regionkey") > 1)
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"))
    )
    assert unparse_to_dialect(df, "mssql") == (
        "SELECT n_regionkey, count(1) AS n FROM "
        "(SELECT * FROM (SELECT * FROM nation) _p1 WHERE (n_regionkey > 1)) _p2 "
        "GROUP BY n_regionkey"
    )


def test_mssql_unparse_quirk_battery(spark):
    from pyspark.sql import functions as F

    from datafusion_rdbms_ext_spark.sources.pushdown import unparse_to_dialect

    c = lambda: _fed(spark, "customer")  # noqa: E731
    o = lambda: _fed(spark, "orders")  # noqa: E731
    cases = {
        "concat_nulls_propagate": (
            c().select(F.concat("c_name", "c_mktsegment").alias("x")),
            ["(c_name + c_mktsegment)"],
            ["concat"],
        ),
        "len_trailing_spaces": (
            c().select(F.length("c_name").alias("n")),
            ["(LEN(c_name + 'x') - 1)"],
            [],
        ),
        "charindex": (
            c().select(F.locate("a", F.col("c_name")).alias("p")),
            ["CHARINDEX('a', c_name, 1)"],
            ["locate"],
        ),
        "datediff_unit_and_swap": (
            o().select(
                F.datediff(
                    F.lit("1998-01-01").cast("date"), "o_orderdate"
                ).alias("n")
            ),
            [
                "DATEDIFF(day, CAST(CAST(o_orderdate AS DATE) AS DATE), "
                "CAST(CAST('1998-01-01' AS DATE) AS DATE))"
            ],
            [],
        ),
        "double_is_float": (
            c().select(F.col("c_acctbal").cast("double").alias("d")),
            ["AS FLOAT"],
            ["AS DOUBLE"],
        ),
    }
    wrong = []
    for name, (df, must, must_not) in cases.items():
        sql = unparse_to_dialect(df, "mssql")
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


def test_mssql_denials_and_gates(spark):
    """Divergent or inexpressible shapes render to None (fall back to
    the local plan): LIKE (CI collations), regexp_replace (no regex),
    OFFSET (needs a total order), boolean literals (bit has none),
    INTERSECT ALL (only DISTINCT set ops) — while plain INTERSECT
    renders and the SAME plans still render for dialects that support
    them."""
    from pyspark.sql import functions as F

    from datafusion_rdbms_ext_spark.sources.pushdown import unparse_to_dialect

    liked = _fed(spark, "customer").filter(F.col("c_name").like("%a%"))
    assert unparse_to_dialect(liked, "mssql") is None
    assert unparse_to_dialect(liked, "postgres") is not None

    off = _fed(spark, "customer").orderBy("c_custkey").offset(7)
    assert unparse_to_dialect(off, "mssql") is None
    assert unparse_to_dialect(off, "mysql") is not None

    boolean = _fed(spark, "customer").select(
        (F.col("c_custkey") > 5).alias("b")
    ).filter(F.col("b") == F.lit(True))
    assert unparse_to_dialect(boolean, "mssql") is None

    inter = (
        _fed(spark, "customer")
        .select("c_custkey")
        .intersect(_fed(spark, "orders").select("o_custkey"))
    )
    assert unparse_to_dialect(inter, "mssql") is not None  # DISTINCT form ok
    inter_all = (
        _fed(spark, "customer")
        .select("c_custkey")
        .intersectAll(_fed(spark, "orders").select("o_custkey"))
    )
    assert unparse_to_dialect(inter_all, "mssql") is None
    assert unparse_to_dialect(inter_all, "postgres") is not None
