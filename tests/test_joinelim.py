"""PK/FK join elimination: soundness conditions + plan rails.

The rewrite (plans/joinelim.py) may only fire when the declared
relationship holds on the data and the query references no dimension
column; these tests pin all three legs:

1. the declaration is TRUE on the fixtures (validate_fk: zero
   orphans, zero duplicate PKs) — the RELY constraint is earned;
2. the registered query's physical plan contains NO join operator
   (the rewrite actually fired) while the differential gate
   (tests/test_queries.py) proves it equal to the oracle's JOIN;
3. fall-through: asking for any dimension column brings the join
   back, and an UNDECLARED relationship never rewrites — the
   try-rewrite-else-fall-through contract (ref optimizer.rs:14-39).
"""

from __future__ import annotations

from datafusion_rdbms_ext_spark.plans import plan_string
from datafusion_rdbms_ext_spark.plans.joinelim import (
    declared_fk,
    fk_join,
    validate_fk,
)
from datafusion_rdbms_ext_spark.queries import REGISTRY
from datafusion_rdbms_ext_spark.queries.base import ensure_tables

from .conftest import SF_DIR


def test_declared_fk_holds_on_fixtures(spark):
    ensure_tables(spark, SF_DIR)
    v = validate_fk(spark, "lineitem", "l_orderkey", "orders", "o_orderkey")
    assert v.ok, v


def test_eliminated_plan_has_no_join(spark):
    df = REGISTRY["micro_join_elimination"].fn(spark, SF_DIR)
    plan = plan_string(df, "formatted")
    assert "Join" not in plan, plan


def test_dim_column_brings_the_join_back(spark):
    ensure_tables(spark, SF_DIR)
    df = fk_join(
        spark,
        "lineitem",
        "orders",
        "l_orderkey",
        "o_orderkey",
        needed=["l_returnflag", "o_orderpriority"],
    )
    assert "Join" in plan_string(df, "formatted")


def test_undeclared_relationship_falls_through(spark):
    ensure_tables(spark, SF_DIR)
    assert declared_fk("lineitem", "l_partkey") is None
    df = fk_join(
        spark,
        "lineitem",
        "part",
        "l_partkey",
        "p_partkey",
        needed=["l_returnflag"],
    )
    assert "Join" in plan_string(df, "formatted")


def test_eliminated_equals_forced_join(spark):
    """Belt-and-braces on top of the DuckDB differential: the
    join-free plan and the explicit join agree row-for-row inside
    Spark itself."""
    ensure_tables(spark, SF_DIR)
    from pyspark.sql import functions as F

    eliminated = REGISTRY["micro_join_elimination"].fn(spark, SF_DIR)
    forced = (
        spark.table("lineitem")
        .join(
            spark.table("orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("l_returnflag")
    )
    assert [r.asDict() for r in eliminated.collect()] == [
        r.asDict() for r in forced.collect()
    ]
