"""Salted skew mitigation correctness + Parquet sink round trip.

The reference is read-only (no INSERT/CTAS, SetExpr::Insert todo!()
at parser.rs:218,280); `df.write` is free in Spark but still deserves
a round-trip proof. Salting must be result-invariant versus the
direct plan — that's its whole contract.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from datafusion_rdbms_ext_spark.operators.skew import salted_agg, salted_join
from datafusion_rdbms_ext_spark.queries.base import ensure_tables

from .conftest import SMOKE_SF_DIR


def test_salted_agg_matches_direct(spark):
    ensure_tables(spark, SMOKE_SF_DIR)
    li = spark.table("lineitem")
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": F.sum(F.col("l_quantity").cast("decimal(30,8)")),
            "n_rows": F.count(F.lit(1)),
        },
        buckets=16,
    ).select("l_returnflag", F.col("sum_qty").cast("double").alias("sum_qty"), "n_rows")
    direct = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(30,8)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    assert sorted(salted.collect()) == sorted(direct.collect())


def test_salted_join_matches_direct(spark):
    ensure_tables(spark, SMOKE_SF_DIR)
    orders = spark.table("orders").select("o_orderkey", "o_custkey")
    customer = spark.table("customer").select("c_custkey", "c_nationkey")
    salted = salted_join(orders, customer, "o_custkey", "c_custkey", buckets=4)
    direct = orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
    assert sorted(salted.collect()) == sorted(direct.collect())


def test_parquet_sink_round_trip(spark, tmp_path_factory):
    ensure_tables(spark, SMOKE_SF_DIR)
    out = Path("spark-warehouse") / "_sink_roundtrip"
    shutil.rmtree(out, ignore_errors=True)
    src = (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Partitioned write — the layout a downstream pipeline would prune.
    src.write.mode("overwrite").partitionBy("o_orderpriority").parquet(str(out))
    back = spark.read.parquet(str(out)).select("o_orderpriority", "n")
    assert sorted(back.collect()) == sorted(src.collect())
    shutil.rmtree(out, ignore_errors=True)


def test_csv_and_json_source_round_trip(spark):
    """CSV/JSON sources (the reference's only non-DB format is CSV
    test infra, testdata/tpch-postgres.sql:17): write the same frame
    to both formats, read back with explicit schemas, get identical
    relational content."""
    ensure_tables(spark, SMOKE_SF_DIR)
    src = spark.table("nation").select("n_nationkey", "n_name", "n_regionkey")
    base = Path("spark-warehouse") / "_fmt_roundtrip"
    shutil.rmtree(base, ignore_errors=True)
    src.write.mode("overwrite").option("header", True).csv(str(base / "csv"))
    src.write.mode("overwrite").json(str(base / "json"))
    schema = "n_nationkey long, n_name string, n_regionkey long"
    from_csv = spark.read.schema(schema).option("header", True).csv(str(base / "csv"))
    from_json = spark.read.schema(schema).json(str(base / "json"))
    expected = sorted(src.collect())
    assert sorted(from_csv.collect()) == expected
    assert sorted(from_json.collect()) == expected
    shutil.rmtree(base, ignore_errors=True)


def test_decimal_money_is_decimal_end_to_end(spark):
    """The money sink's read-back columns must be true
    DecimalType(38,4) (ref datatypes.rs:160-162), and the aggregate
    must run in decimal — the string cast is presentation only."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_rdbms_ext_spark.queries.base import ensure_tables
    from datafusion_rdbms_ext_spark.sources.sinks import decimal_money_path

    from .conftest import SF_DIR

    ensure_tables(spark, SF_DIR)
    money = spark.read.parquet(decimal_money_path(spark, SF_DIR))
    types = {f.name: f.dataType for f in money.schema.fields}
    assert types["price"] == T.DecimalType(38, 4)
    assert types["tax"] == T.DecimalType(38, 4)
    agg = money.groupBy("l_returnflag").agg(F.sum("price").alias("s"))
    assert isinstance(agg.schema["s"].dataType, T.DecimalType)
    assert agg.schema["s"].dataType.scale == 4
