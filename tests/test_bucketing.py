"""Bucketed co-located join: the shuffle must disappear.

The plan assertion is the point — at 100 TB the orderkey shuffle is
the dominant cost of lineitem⋈orders, and bucketing both sides by
the key at write time removes it entirely.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from datafusion_rdbms_ext_spark.operators.bucketing import bucketed_join, write_bucketed
from datafusion_rdbms_ext_spark.plans import count_exchanges
from datafusion_rdbms_ext_spark.queries.base import ensure_tables

from .conftest import SMOKE_SF_DIR


@pytest.fixture()
def bucketed_tables(spark):
    ensure_tables(spark, SMOKE_SF_DIR)
    write_bucketed(spark, spark.table("lineitem"), "lineitem_b", "l_orderkey", 8)
    write_bucketed(spark, spark.table("orders"), "orders_b", "o_orderkey", 8)
    yield "lineitem_b", "orders_b"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("lineitem_b", "orders_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(Path(warehouse) / t, ignore_errors=True)


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # At toy SF the planner would just broadcast the small side and
    # mask the effect; disable auto-broadcast to see the layout win
    # the way a 100 TB fact-fact join would.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
        assert count_exchanges(joined) == 0

        # The same join on the unbucketed views shuffles both sides.
        plain = spark.table("lineitem").join(
            spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert count_exchanges(plain) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_results_match_plain(spark, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = (
        bucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        spark.table("lineitem")
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(bucketed.collect()) == sorted(plain.collect())


def test_bucketed_agg_reuses_partitioning(spark, bucketed_tables):
    lt, _ = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # groupBy on the bucket key needs no exchange either.
        agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        assert count_exchanges(agg) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
