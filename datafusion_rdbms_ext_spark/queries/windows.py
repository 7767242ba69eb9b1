"""Window-function surface — the reference's most prominent gap.

The reference's unparser hits ``todo!()`` for both the Window plan
node (/root/reference/src/parser.rs:251) and window expressions
(src/parser.rs:893), so none of this executes there. In Spark every
item is a built-in: ``F.<fn>().over(Window.partitionBy(..).orderBy(..)
.rowsBetween/rangeBetween(..))``.

Exactness: every ORDER BY inside a window carries a unique tiebreak
column (o_orderkey) so frames are total-ordered and identical across
engines; running SUMs over doubles go through exact decimal casts
(functions/compat.py rationale) so frame sums are order-independent;
rank-family integers are cast to long to match DuckDB's BIGINT.

Scale: a window shuffles once on its partition keys and sorts within
partitions. Partition-by-customer keys are high-cardinality and
uniform — no skew; AQE coalesces small post-shuffle partitions. None
of these queries materialize a global sort (final ORDER BY is for the
deterministic oracle hash, over already-small outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register

_DEC = "decimal(30,8)"


# ---------------------------------------------------------------------------
# row_number / rank / dense_rank — top-N per group.
# ---------------------------------------------------------------------------
@register(
    "win_topn_per_group",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             RANK()       OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
             DENSE_RANK() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS drnk
      FROM orders WHERE o_custkey < 100
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk
    FROM ranked WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="Window ranking trio (reference todo!(): parser.rs:251,893): "
    "top-3 orders per customer.",
    tags=("window", "bench"),
)
def win_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer with all three rank flavors.

    Scale: one shuffle on o_custkey; the rn<=3 filter cuts each
    partition before anything else consumes it (Spark pushes the
    rank-limit into the sort via WindowGroupLimit)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        spark.table("orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# lag / lead — per-customer order deltas.
# ---------------------------------------------------------------------------
@register(
    "win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           o_totalprice - LAG(o_totalprice) OVER w AS delta_prev
    FROM orders WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    doc="lag/lead analytics (reference todo!(): parser.rs:893): "
    "consecutive-order price deltas per customer.",
    tags=("window",),
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next order price per customer timeline.

    Exactness: delta is a single IEEE subtraction of identical
    operands — deterministic without decimal routing."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        spark.table("orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_prev"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Running sum — rowsBetween(unboundedPreceding, currentRow).
# ---------------------------------------------------------------------------
@register(
    "win_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_orders_so_far
    FROM orders WHERE o_custkey < 50
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    doc="Cumulative frame aggregate (rowsBetween unbounded..current); "
    "decimal-routed so the running double sum is order-independent.",
    tags=("window", "bench"),
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative customer spend over their order timeline."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spark.table("orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("running_spend"),
            F.count(F.lit(1)).over(w).cast("long").alias("n_orders_so_far"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Sliding rows frame + rangeBetween numeric frame.
# ---------------------------------------------------------------------------
@register(
    "win_sliding_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS moving_sum_3,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_in_key_range
    FROM orders WHERE o_custkey < 50
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Sliding ROWS frame (2 preceding) and numeric RANGE frame "
    "(rangeBetween) — the frame-spec surface the reference never "
    "reached (parser.rs:893).",
    tags=("window",),
)
def win_sliding_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-order moving spend + count of orders within a 1000-wide key range."""
    w_rows = (
        Window.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(-2, Window.currentRow)
    )
    w_range = (
        Window.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-1000, Window.currentRow)
    )
    return (
        spark.table("orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast(_DEC)).over(w_rows).cast("double").alias("moving_sum_3"),
            F.count(F.lit(1)).over(w_range).cast("long").alias("n_in_key_range"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Distribution functions + ntile.
# ---------------------------------------------------------------------------
@register(
    "win_distribution",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM orders WHERE o_custkey < 20
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderpriority, o_totalprice, o_orderkey
    """,
    doc="percent_rank/cume_dist/ntile: distribution window functions "
    "(all absent from the reference).",
    tags=("window",),
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price distribution position of each order within its priority class.

    Exactness: percent_rank=(rank-1)/(n-1) and cume_dist=k/n are exact
    integer ratios — bit-identical IEEE divisions in both engines."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        spark.table("orders")
        .filter(F.col("o_custkey") < 20)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# first_value / last_value / nth_value with explicit full frame.
# ---------------------------------------------------------------------------
@register(
    "win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)  OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders WHERE o_custkey < 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="first/last/nth_value over an explicit unbounded frame "
    "(defaults differ between engines, so the frame is spelled out).",
    tags=("window",),
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last/second order price per customer timeline."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        spark.table("orders")
        .filter(F.col("o_custkey") < 30)
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# 7. Share-of-total (round 8): RATIO_TO_REPORT — each (day, type)
#    cell's share of its day's events in exact integer ppm, computed
#    as a window sum over the (day, type) rollup. The reporting
#    function behind every "% of total" column; kept integer-exact
#    by dividing counts, never floats.
# ---------------------------------------------------------------------------
@register(
    "win_share_of_total",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
      FROM events GROUP BY day, event_type
    )
    SELECT CAST(day AS VARCHAR) AS day, event_type,
           CAST(n AS BIGINT) AS n,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY day) AS BIGINT)
             AS share_ppm
    FROM d ORDER BY day, event_type
    """,
    doc="RATIO_TO_REPORT / share-of-total: each (day, type) cell's "
    "share of its day's events in exact integer ppm — one window "
    "sum over the already-aggregated rollup, the canonical "
    "'% of total' reporting column.",
    tags=("windows",),
)
def win_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day event-type shares in ppm.

    Scale: the window runs over the (day, type) ROLLUP — days x
    types rows, not events — partitioned by day; the event-volume
    work is one map-side-combined aggregation. This ordering
    (aggregate THEN window) is the scalable spelling; windowing the
    raw events first would shuffle the corpus."""
    d = (
        spark.table("events")
        .groupBy(
            F.col("ts").cast("date").cast("string").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("day")
    return (
        d.withColumn("day_n", F.sum("n").over(w))
        .select(
            "day",
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.expr("n * 1000000 div day_n").alias("share_ppm"),
        )
        .orderBy("day", "event_type")
    )


# ---------------------------------------------------------------------------
# Sequence-pattern matching (round 9) — the MATCH_RECOGNIZE /
# Flink-CEP capability re-expressed relationally: each user's event
# history becomes one deterministic journey string (one char per
# event type, (t, event_id)-ordered), and a funnel pattern is a
# regex counted per user. The reference parses none of this
# (parser.rs window/expr todo!()s); neither Spark nor DuckDB has
# MATCH_RECOGNIZE, but BOTH have leftmost-non-overlapping
# regexp_extract_all, so the differential check pins identical
# match semantics across two independent regex engines (Java
# regex vs RE2).
# ---------------------------------------------------------------------------
#: signup, then any clicks/views, then purchase — the conversion
#: journey. Greedy [cv]* is deterministic under leftmost scanning in
#: both engines.
_PATTERN = "s[cv]*p"


@register(
    "win_pattern_match",
    oracle=f"""
    WITH j AS (
      SELECT user_id,
             string_agg(CASE event_type
                          WHEN 'signup' THEN 's'
                          WHEN 'click' THEN 'c'
                          WHEN 'view' THEN 'v'
                          WHEN 'purchase' THEN 'p'
                          ELSE 'e' END, ''
                        ORDER BY epoch_us(ts), event_id) AS journey
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT user_id,
             CAST(length(regexp_extract_all(journey, '{_PATTERN}')) AS BIGINT)
               AS n_matches
      FROM j
    )
    SELECT n_matches,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(user_id) AS BIGINT) AS example_user
    FROM m GROUP BY n_matches ORDER BY n_matches
    """,
    doc="Sequence-pattern matching (MATCH_RECOGNIZE shape): per-user "
    "journeys as deterministic event-type strings, conversion "
    f"pattern '{_PATTERN}' counted with leftmost-non-overlapping "
    "regex on BOTH engines (Java regex vs RE2 — the differential "
    "check pins the semantics), rolled up to a match-count "
    "distribution.",
    tags=("windows", "events", "bench"),
)
def win_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users by conversion-pattern match count.

    Scale: ONE shuffle on user_id builds the journeys (array_sort
    of per-user (t, event_id, char) structs — per-user state only,
    the sessionization contract; journeys are bounded by per-user
    event counts, which a production deployment bounds with a
    retention window). The regex runs JVM-side per user row; the
    rollup output is |distinct match counts| rows."""
    from ..functions.compat import ts_micros

    ch = (
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("e")
    )
    j = (
        spark.table("events")
        .select(
            "user_id",
            F.struct(
                ts_micros(F.col("ts")).alias("t"),
                F.col("event_id").alias("event_id"),
                ch.alias("ch"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["ch"]
                ),
                "",
            ).alias("journey")
        )
    )
    m = j.select(
        "user_id",
        F.size(F.regexp_extract_all("journey", F.lit(_PATTERN), F.lit(0)))
        .cast("long")
        .alias("n_matches"),
    )
    return (
        m.groupBy("n_matches")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.min("user_id").cast("long").alias("example_user"),
        )
        .orderBy("n_matches")
    )
