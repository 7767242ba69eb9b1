"""Advanced OLAP operators beyond the reference surface.

Motivated by the retrieved OLAP corpus (PAPERS.md: "Integration of
Skyline Queries into Spark SQL" EDBT 2023; top-k similarity search
papers — the similarity side lives in queries/llm.py): skyline
(Pareto-optimal set), cohort retention, and funnel analysis — the
event-analytics operators a warehouse user reaches for right after
the TPC-H basics.

Differential strength note: the skyline's Spark side is a sort +
window formulation while the oracle is the textbook NOT EXISTS
dominance query — two genuinely independent algorithms that must
produce the same set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register


# ---------------------------------------------------------------------------
# Skyline (2-D Pareto frontier).
# ---------------------------------------------------------------------------
@register(
    "olap_skyline_2d",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
    )
    ORDER BY p.p_retailprice, p.p_size, p.p_partkey
    """,
    doc="Skyline operator (EDBT 2023 'Integration of Skyline Queries "
    "into Spark SQL' motivates it; absent from reference and Spark): "
    "parts Pareto-minimal in (price, size). Spark side is the "
    "sort+window algorithm, oracle is the O(n^2) dominance NOT EXISTS.",
    tags=("olap", "window"),
)
def olap_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier minimizing (p_retailprice, p_size).

    Algorithm: group by price -> per-price min size; a point is
    dominated iff some strictly-cheaper price achieved size <= its
    size, or its own price group has a strictly smaller size. One
    sort over distinct prices replaces the quadratic dominance join.

    Scale: the price-group rollup is a normal partial aggregate; the
    running-min window runs over DISTINCT prices (tiny relative to
    rows). A 2-D skyline needs a single global order — at extreme
    cardinality the standard trick is range-partition by price, take
    local skylines, then one cheap merge pass over partition minima
    (same operators, two rounds)."""
    p = spark.table("part")
    per_price = p.groupBy("p_retailprice").agg(F.min("p_size").alias("gmin"))
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    frontier = per_price.select(
        "p_retailprice",
        "gmin",
        F.min("gmin").over(w).alias("prev_min"),
    )
    joined = p.join(frontier, "p_retailprice")
    dominated = (
        (F.col("prev_min").isNotNull() & (F.col("prev_min") <= F.col("p_size")))
        | (F.col("p_size") > F.col("gmin"))
    )
    return (
        joined.filter(~dominated)
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_size", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Cohort retention.
# ---------------------------------------------------------------------------
@register(
    "olap_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM active a JOIN firsts f ON f.user_id = a.user_id
    GROUP BY f.cohort_week, week_offset
    ORDER BY f.cohort_week, week_offset
    """,
    doc="Cohort retention matrix: users grouped by first-activity "
    "week, counted in each subsequent active week — the canonical "
    "event-warehouse rollup (beyond reference surface).",
    tags=("olap", "events", "aggregate"),
)
def olap_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_week, week_offset) -> distinct active users.

    Scale: two aggregations on user_id (same key -> the shuffle
    partitioning is reused) and one user-keyed join; the output is
    cohorts x weeks, tiny regardless of event volume."""
    ev = spark.table("events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Funnel analysis (ordered stage progression within a time budget).
# ---------------------------------------------------------------------------
@register(
    "olap_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup,
           CAST((SELECT COUNT(*) FROM c JOIN s ON s.user_id = c.user_id
                 WHERE c.t2 <= s.t1 + INTERVAL '7 days') AS BIGINT) AS n_click_7d,
           CAST((SELECT COUNT(*) FROM p JOIN s ON s.user_id = p.user_id
                 WHERE p.t3 <= s.t1 + INTERVAL '7 days') AS BIGINT) AS n_purchase_7d
    """,
    doc="Funnel: signup -> click -> purchase in order within 7 days "
    "of signup; per-stage user counts (beyond reference surface).",
    tags=("olap", "events"),
)
def olap_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-stage conversion counts.

    Scale: three user-keyed aggregates chained by joins on the same
    key — one partitioning reused throughout; event volume only
    affects the scans."""
    ev = spark.table("events")
    s = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.first("t1").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t2"), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    week = F.expr("INTERVAL '7' DAY")
    # Assemble the three stage counts as one row (1-row cross joins).
    s_cnt = s.agg(F.count(F.lit(1)).alias("n_signup"))
    c_cnt = c.filter(F.col("t2") <= F.col("t1") + week).agg(
        F.count(F.lit(1)).alias("n_click_7d")
    )
    p_cnt = (
        p.join(s, "user_id")
        .filter(F.col("t3") <= F.col("t1") + week)
        .agg(F.count(F.lit(1)).alias("n_purchase_7d"))
    )
    return s_cnt.crossJoin(c_cnt).crossJoin(p_cnt)
