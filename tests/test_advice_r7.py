"""Regression tests for the round-7 ADVICE findings.

Each test pins a corner the differential gate could not see (the
fixture never hits it): a string literal containing " OFFSET ", a
substr with literal start 0, a relation name that merely ends with
the MV base table, an INTERSECT ALL rendered for SQLite, and a
zero-byte multimodal asset.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_DIR


# ---------------------------------------------------------------------------
# ADVICE r7 #1 — the SQLite OFFSET splice must be quote-aware.
# ---------------------------------------------------------------------------
def test_replace_outside_strings_skips_literals():
    from datafusion_rdbms_ext_spark.sources.pushdown import (
        _replace_outside_strings,
    )

    sql = "SELECT c FROM t WHERE c = 'a OFFSET b' OFFSET 5"
    out = _replace_outside_strings(sql, " OFFSET ", " LIMIT -1 OFFSET ")
    assert out == "SELECT c FROM t WHERE c = 'a OFFSET b' LIMIT -1 OFFSET 5"
    # '' escapes count as two delimiters — parity stays correct.
    sql2 = "SELECT 'it''s OFFSET x' FROM t OFFSET 3"
    out2 = _replace_outside_strings(sql2, " OFFSET ", " LIMIT -1 OFFSET ")
    assert out2 == "SELECT 'it''s OFFSET x' FROM t LIMIT -1 OFFSET 3"


def test_sqlite_dialect_offset_literal_untouched():
    from datafusion_rdbms_ext_spark.sources.pushdown import _dialect_sqlite

    sql = "SELECT c FROM t WHERE c = 'x OFFSET y' OFFSET 2"
    out = _dialect_sqlite(sql)
    assert "'x OFFSET y'" in out, out
    assert "LIMIT -1 OFFSET 2" in out, out


# ---------------------------------------------------------------------------
# ADVICE r7 #2 — substr/substring with a non-positive literal start
# parses remotely but returns different values; must deny.
# ---------------------------------------------------------------------------
def test_sqlite_substr_nonpositive_start_denied():
    from datafusion_rdbms_ext_spark.sources.pushdown import (
        _SQLITE_CALL_RULES,
        _Unsupported,
        _rewrite_calls,
    )

    for bad in (
        "SELECT substr(c_name, 0, 3) FROM t",
        "SELECT substring(c_name, 0, 3) FROM t",
        "SELECT substr(c_name, -2, 3) FROM t",
        "SELECT substr(c_name, 0) FROM t",
        "SELECT substr(c_name, 2, -3) FROM t",  # the r6 negative-length deny
    ):
        with pytest.raises(_Unsupported):
            _rewrite_calls(bad, _SQLITE_CALL_RULES)
    # Positive literal and non-literal starts are exact — untouched.
    ok = "SELECT substr(c_name, 2, 3) FROM t"
    assert _rewrite_calls(ok, _SQLITE_CALL_RULES) == ok
    dyn = "SELECT substr(c_name, c_custkey, 3) FROM t"
    assert _rewrite_calls(dyn, _SQLITE_CALL_RULES) == dyn


# ---------------------------------------------------------------------------
# ADVICE r7 #3 — the MV qualifier strip / dim rewrite need a LEFT
# identifier boundary: names that merely END with the base table
# (my_events.x, db.events.x) are other relations.
# ---------------------------------------------------------------------------
def test_mv_strip_base_qualifier_left_boundary():
    from datafusion_rdbms_ext_spark.plans.mv import _strip_base_qualifier

    assert _strip_base_qualifier("(events.x > 1)", "events") == "(x > 1)"
    assert (
        _strip_base_qualifier("(my_events.x > 1)", "events")
        == "(my_events.x > 1)"
    )
    assert (
        _strip_base_qualifier("(db.events.x > 1)", "events")
        == "(db.events.x > 1)"
    )
    # inside a string literal: untouched
    assert (
        _strip_base_qualifier("(c = 'events.x' AND events.y > 1)", "events")
        == "(c = 'events.x' AND y > 1)"
    )


def test_mv_dim_rewrite_left_boundary():
    from datafusion_rdbms_ext_spark.plans.mv import _rewrite_dim_refs

    dims = {"events.event_type": "event_type"}
    assert (
        _rewrite_dim_refs("(events.event_type = 'a')", dims)
        == "(event_type = 'a')"
    )
    assert (
        _rewrite_dim_refs("(my_events.event_type = 'a')", dims)
        == "(my_events.event_type = 'a')"
    )
    assert (
        _rewrite_dim_refs("(db.events.event_type = 'a')", dims)
        == "(db.events.event_type = 'a')"
    )
    # right boundary still holds (the r6 behavior)
    assert (
        _rewrite_dim_refs("(events.event_type_extra = 'a')", dims)
        == "(events.event_type_extra = 'a')"
    )


def test_mv_rewrite_still_serves_having_after_boundary_fix(spark):
    """End-to-end guard: the tightened regex must not break the
    legitimate strip — the HAVING shape still serves from the MV with
    identical values."""
    from datafusion_rdbms_ext_spark.plans.mv import mv_rewrite
    from datafusion_rdbms_ext_spark.queries.base import ensure_tables
    from datafusion_rdbms_ext_spark.queries.olap import events_daily_mv

    ensure_tables(spark, SF_DIR)
    mv = events_daily_mv(spark)
    user = (
        spark.table("events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") > 100)
    )
    served = mv_rewrite(user, mv, strict=True)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, user.collect())
    )


# ---------------------------------------------------------------------------
# ADVICE r7 #5 — unparse_to_dialect must apply the same capability
# gate as try_unparse: SQLite has no INTERSECT/EXCEPT ALL.
# ---------------------------------------------------------------------------
def test_unparse_to_dialect_sqlite_gates_setop_all(spark):
    from datafusion_rdbms_ext_spark.queries.base import ensure_tables
    from datafusion_rdbms_ext_spark.sources.pushdown import (
        _fed_table,
        unparse_to_dialect,
    )

    ensure_tables(spark, SF_DIR)
    a = _fed_table(spark, SF_DIR, "nation").select("n_regionkey")
    b = _fed_table(spark, SF_DIR, "region").select("r_regionkey")
    df = a.withColumnRenamed("n_regionkey", "k").exceptAll(
        b.withColumnRenamed("r_regionkey", "k")
    )
    assert unparse_to_dialect(df, "sqlite") is None
    # DuckDB and Postgres both support the ALL set operators.
    assert "EXCEPT ALL" in (unparse_to_dialect(df, "duckdb") or ""), (
        unparse_to_dialect(df, "duckdb")
    )
    assert "EXCEPT ALL" in (unparse_to_dialect(df, "postgres") or "")
    # The distinct set op stays within SQLite's capability.
    d2 = a.withColumnRenamed("n_regionkey", "k").intersect(
        b.withColumnRenamed("r_regionkey", "k")
    )
    assert unparse_to_dialect(d2, "sqlite") is not None


# ---------------------------------------------------------------------------
# ADVICE r7 #4 — zero-byte assets must be absent from phash dedup on
# both the engine and oracle sides.
# ---------------------------------------------------------------------------
def test_phash_empty_asset_excluded(spark):
    from datafusion_rdbms_ext_spark.sources.multimodal import mm_dedup_phash

    probe = spark.createDataFrame(
        [
            (0, "", "en", "s", 0),  # empty image asset (doc_id % 3 == 0)
            (3, "aaaaaaaaaaaaaaaa", "en", "s", 16),  # uniform -> sig 0
            (6, "aaaaaaaaaaaaaaaa", "en", "s", 16),  # uniform -> sig 0
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    probe.createOrReplaceTempView("documents")
    try:
        rows = mm_dedup_phash(spark, SF_DIR).collect()
        pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
        # Pre-fix: doc 0 got sig 0 and paired with both uniform docs.
        assert all(0 not in p for p in pairs), pairs
        # The two identical non-empty docs still pair (hamming 0).
        assert (3, 6) in pairs, pairs
    finally:
        # restore the REAL fixture view — a bare dropTempView leaves
        # ensure_tables' memo claiming a complete catalog, and every
        # later documents-reading test in the session breaks
        from datafusion_rdbms_ext_spark.catalog import register_tables

        spark.catalog.dropTempView("documents")
        register_tables(spark, SF_DIR)
