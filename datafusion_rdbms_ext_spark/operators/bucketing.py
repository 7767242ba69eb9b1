"""Bucketed co-located joins — persistent partitioning for 100 TB.

The reference has no physical layout control at all (its partition
scheme is 4 LIMIT/OFFSET slices, table_provider.rs:123-158). At the
100 TB design point the single most expensive plan node is the
shuffle of two fact tables onto a shared join key; bucketing both
tables by that key at write time makes every subsequent join/agg on
the key SHUFFLE-FREE — the Spark-native analogue of co-located
storage in an MPP warehouse.

Usage shape (verified by tests/test_bucketing.py):

    write_bucketed(spark, df, "lineitem_b", "l_orderkey", buckets=8)
    write_bucketed(spark, df2, "orders_b", "o_orderkey", buckets=8)
    joined = bucketed_join(spark, "lineitem_b", "orders_b",
                           "l_orderkey", "o_orderkey")
    # plan contains zero Exchange nodes

Bucket-count guidance at scale: pick buckets so one bucket of the
BIGGER table fits an executor's working memory (~128-512 MB of rows);
both sides must use the same count for the co-location to hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
) -> None:
    """Persist ``df`` as a bucketed+sorted Parquet table.

    bucketBy assigns rows to files by hash(key) % buckets; sortBy
    orders within each bucket so merge-joins need no sort either."""
    import shutil
    from pathlib import Path

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A crashed earlier run can leave the managed location behind with
    # no catalog entry; Spark refuses to reuse it — clear it.
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(Path(warehouse) / table, ignore_errors=True)
    (
        df.write.format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys.

    With matching bucket specs Catalyst proves both sides already
    satisfy the join's required distribution and plans a
    SortMergeJoin with NO Exchange on either side."""
    lt, rt = spark.table(left_table), spark.table(right_table)
    # Keys resolved through the DataFrame handles so identical key
    # names on both sides (the natural bucketing case) don't raise
    # an ambiguous-reference error.
    return lt.join(rt, lt[left_key] == rt[right_key])
