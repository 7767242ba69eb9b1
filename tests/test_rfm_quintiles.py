"""The distributed RFM quintile must be BIT-IDENTICAL to NTILE(5).

VERDICT r8 #2: olap_rfm_segmentation's three unpartitioned NTILE
windows were the disclosed scale-killer; the rewrite ranks each
metric with the range-repartition + broadcast-offsets pattern and
derives the bucket in closed form. These tests pin (a) the closed
form against Spark's own NTILE on awkward n (n % 5 != 0, n < 5,
ties), (b) the full query against its former single-window form, and
(c) the plan: the only unpartitioned windows left are the three
bounded offset merges inside _global_rank.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_rdbms_ext_spark.plans import unpartitioned_windows
from datafusion_rdbms_ext_spark.queries import REGISTRY
from datafusion_rdbms_ext_spark.queries.base import ensure_tables
from datafusion_rdbms_ext_spark.queries.olap import _ntile5_distributed

from .conftest import SF_DIR


@pytest.mark.parametrize("n", [1, 2, 4, 5, 7, 23, 100, 101, 104])
def test_closed_form_matches_spark_ntile(spark, n):
    """Every row count shape: divisible, remainder 1..4, n < 5."""
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("user_id"),
            # duplicate metric values -> user_id tiebreak exercised
            (F.col("id") % 7).alias("metric"),
        )
    )
    ours = _ntile5_distributed(base, "metric", "b")
    ref = base.select(
        "user_id",
        F.ntile(5)
        .over(Window.orderBy("metric", "user_id"))
        .alias("b"),
    )
    assert sorted(map(tuple, ours.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_rfm_identical_to_single_window_form(spark):
    """End-to-end: the distributed query reproduces the r8 NTILE
    single-window form row-for-row on the fixture."""
    ensure_tables(spark, SF_DIR)
    new = REGISTRY["olap_rfm_segmentation"].fn(spark, SF_DIR)

    ev = spark.table("events").filter(F.col("event_type") == "purchase")
    anchor = ev.agg(F.max("ts").alias("mx"))
    base = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff(F.col("mx"), F.col("last_ts")).alias("rec_days"),
            "freq",
            "cents",
        )
    )
    scored = base.select(
        "user_id",
        "cents",
        F.ntile(5)
        .over(Window.orderBy(F.col("rec_days").desc(), "user_id"))
        .alias("r"),
        F.ntile(5).over(Window.orderBy("freq", "user_id")).alias("f"),
        F.ntile(5).over(Window.orderBy("cents", "user_id")).alias("m"),
    )
    old = (
        scored.groupBy(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
            .cast("long")
            .alias("segment")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("segment_cents"),
            F.min("user_id").cast("long").alias("example_user"),
        )
    )
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    )


def test_rfm_plan_has_only_bounded_unpartitioned_windows(spark):
    """The data-sized global NTILE sorts are gone: exactly the three
    _global_rank offset merges (<= 32-row inputs) remain, each over
    the _pid counts table."""
    ensure_tables(spark, SF_DIR)
    wins = unpartitioned_windows(REGISTRY["olap_rfm_segmentation"].fn(spark, SF_DIR))
    assert len(wins) == 3, wins
    assert all("_pc" in w and "_pid" in w for w in wins), wins
    assert not any("ntile" in w.lower() for w in wins), wins
