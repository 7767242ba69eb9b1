"""Property tests for the round-9 late operators.

Each pins an algebraic invariant the differential gate can't see
(the oracle would fail the same way if both engines shared a bug):
conservation laws and sequential-reference recomputation in plain
Python over the same fixture slice.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_rdbms_ext_spark.queries import REGISTRY
from datafusion_rdbms_ext_spark.queries.base import ensure_tables

from .conftest import SF_DIR


def _df(spark, name):
    return REGISTRY[name].fn(spark, SF_DIR)


def test_cohort_ltv_conserves_revenue_and_orders(spark):
    """Summing the per-(cohort, offset) rollup over everything must
    reproduce the order table's totals exactly — no order lost or
    double-counted by the cohort stamping."""
    ensure_tables(spark, SF_DIR)
    ltv = _df(spark, "ev_cohort_ltv")
    got = ltv.agg(
        F.sum("n_orders").alias("n"), F.sum("rev_cents").alias("c")
    ).first()
    exp = (
        spark.table("orders")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"),
        )
        .first()
    )
    assert (got["n"], got["c"]) == (exp["n"], exp["c"])
    # within each cohort the cumulative column is a prefix sum: its
    # final value equals the cohort's total
    per_cohort = ltv.groupBy("cohort_midx").agg(
        F.sum("rev_cents").alias("total"),
        F.max_by("cum_rev_cents", "months_since_first").alias("last_cum"),
    )
    assert per_cohort.filter(F.col("total") != F.col("last_cum")).count() == 0


def test_ab_test_partitions_every_customer_once(spark):
    """Variant assignment is a partition: user counts sum to the
    customer table, converter counts to the distinct order-placing
    customers, and the control row's lift is zero by definition."""
    ensure_tables(spark, SF_DIR)
    rows = {r["variant"]: r for r in _df(spark, "olap_ab_test").collect()}
    assert set(rows) == {0, 1}
    n_cust = spark.table("customer").count()
    assert rows[0]["n_users"] + rows[1]["n_users"] == n_cust
    n_conv = spark.table("orders").select("o_custkey").distinct().count()
    assert rows[0]["n_converted"] + rows[1]["n_converted"] == n_conv
    assert rows[0]["lift_vs_control_ppm"] == 0


def test_rolling_median_sequential_reference(spark):
    """Python recomputation of the type-2 rolling median over one
    user's purchase series, element-for-element."""
    ensure_tables(spark, SF_DIR)
    out = _df(spark, "op_rolling_median")
    uid = out.first()["user_id"]
    got = [
        (r["event_id"], r["cents"], r["med7_cents"])
        for r in out.filter(F.col("user_id") == uid).collect()
    ]
    src = (
        spark.table("events")
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") == uid))
        .select(
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "ts",
        )
        .orderBy("ts", "event_id")
        .collect()
    )
    cents = [r["cents"] for r in src]
    expect = {}
    for i, r in enumerate(src):
        frame = sorted(cents[max(0, i - 6) : i + 1])
        expect[r["event_id"]] = frame[(len(frame) + 1) // 2 - 1]
    assert len(got) == len(src) > 0
    for eid, c, med in got:
        assert med == expect[eid], (eid, c, med, expect[eid])


def test_scd2_asof_join_conserves_attributed_purchases(spark):
    """Every purchase with at least one prior-or-simultaneous state
    event is attributed to exactly one state — attributed counts sum
    to that census, never more, never less."""
    from datafusion_rdbms_ext_spark.functions.compat import ts_micros

    ensure_tables(spark, SF_DIR)
    got = (
        _df(spark, "op_scd2_asof_join")
        .agg(F.sum("n_purchases").alias("n"))
        .first()["n"]
    )
    ev = spark.table("events")
    st = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id")
        .agg(F.min(ts_micros(F.col("ts"))).alias("first_state_t"))
    )
    expected = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", ts_micros(F.col("ts")).alias("t"))
        .join(st, "user_id")
        .filter(F.col("t") >= F.col("first_state_t"))
        .count()
    )
    assert got == expected > 0
