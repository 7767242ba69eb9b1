"""Custom temporal operators: as-of join and range join.

Spark has no native ASOF JOIN (DuckDB and kdb-style engines do; the
reference has nothing temporal at all) — so the engine provides it as
a *composition of built-in operators*, per the design rule: (a)
DataFrame-op composition first, (b) pandas UDF only if semantics
can't be expressed, (c) mapPartitions last. Both operators here are
pure composition — zero Python in the execution path.

As-of join (union + last-over-window):
  tag right rows 0 and left rows 1, union, then one window pass per
  key ordered by (time, side) carrying the last non-null right
  payload forward. Each left row then holds the most recent right
  row with t_right <= t_left.
  Scale: ONE shuffle on the by-keys (the union is shuffle-free), one
  in-partition sort — strictly cheaper than the per-row subquery a
  naive formulation runs, and it never materializes candidate pairs.

Range join (bucketed band join):
  count right events in [t-W, t) by hashing both sides to W-sized
  time buckets; each right row is visible in its own bucket and the
  next, so every qualifying pair meets in exactly one (key, bucket)
  join cell. Scale: pair generation is bounded per bucket instead of
  per key — the standard guard against hot keys turning a plain
  user-equi join + residual into a quadratic blowup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.compat import ts_micros
from ..queries.base import register

_HOUR_US = 3_600_000_000


def _orderable(dt) -> bool:
    """True if a type can be a sort key (MapType cannot, anywhere in
    the nesting)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    right_alias: str = "matched",
) -> DataFrame:
    """Most-recent-prior join: for each left row, the latest right row
    with ``right.on <= left.on`` within the same ``by`` keys.

    Returns the left rows plus a struct column ``right_alias`` holding
    the matched right row (null when no prior right row exists —
    filter it for inner-asof semantics)."""
    r_struct = F.struct(*[F.col(c) for c in right.columns]).alias("_r")
    l_struct = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    r2 = right.select(
        *by, F.col(on).alias("_t"), F.lit(0).alias("_side"), r_struct
    )
    l2 = left.select(*by, F.col(on).alias("_t"), F.lit(1).alias("_side"), l_struct)
    r2 = r2.withColumn("_l", F.lit(None).cast(l2.schema["_l"].dataType))
    l2 = l2.withColumn("_r", F.lit(None).cast(r2.schema["_r"].dataType))
    # side 0 before side 1 at equal timestamps => ties match (<=).
    # `_r` as the final order key makes ties among right rows sharing
    # one timestamp deterministic: the greatest right-row struct (by
    # field-lexicographic struct ordering) wins under F.last. Structs
    # containing non-orderable types (MapType) can't be sort keys, so
    # those fall back to the documented arbitrary-tie contract rather
    # than failing analysis.
    order = ["_t", "_side"]
    if _orderable(r2.schema["_r"].dataType):
        order.append("_r")
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        r2.unionByName(l2.select(r2.columns))
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select("_l.*", F.col("_m").alias(right_alias))
    )


def range_count(
    left: DataFrame,
    right: DataFrame,
    window_us: int,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    out: str = "n_in_range",
) -> DataFrame:
    """Count right rows with ``t in [left.t - window, left.t)`` per
    left row, via the bucketed band join described in the module doc.

    Counting keys on an internal per-row id, not the left row's
    content — two fully-identical left rows must each keep their own
    count, not share a doubled one."""
    w = int(window_us)
    lid = left.withColumn("_lid", F.monotonically_increasing_id())
    # Bucket ids via integer `div` (the catalog's `div 1000` convention):
    # float division then cast("long") truncates toward zero AND loses
    # precision above 2^53 — epoch-µs values are nonnegative so div is
    # floor here, exactly.
    lb = lid.withColumn("_t", ts_micros(F.col(on))).withColumn(
        "_b", F.expr(f"_t div {w}")
    )
    rb = right.withColumn("_rt", ts_micros(F.col(on))).select(
        *by,
        "_rt",
        F.explode(
            F.array(
                F.expr(f"_rt div {w}"),
                F.expr(f"_rt div {w}") + 1,
            )
        ).alias("_b"),
    )
    lt = ts_micros(F.col(on))
    pairs = lb.join(rb, [*by, "_b"]).filter(
        (F.col("_rt") >= lt - window_us) & (F.col("_rt") < lt)
    )
    counts = pairs.groupBy("_lid").agg(F.count(F.lit(1)).alias(out))
    # Left semantics: rows with zero matches come back with count 0.
    return (
        lid.join(counts, "_lid", "left")
        .na.fill({out: 0})
        .drop("_lid")
    )


# ---------------------------------------------------------------------------
# Registered queries over the events fixture.
# ---------------------------------------------------------------------------
@register(
    "op_asof_purchase_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS click_ts,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id < 50) p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    doc="As-of join (operator Spark lacks; built as union+window "
    "composition) vs DuckDB's native ASOF JOIN — each purchase "
    "matched to the user's most recent prior click.",
    tags=("operator", "asof", "bench"),
)
def op_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.table("events")
    purchases = ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 50)).select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = asof_join(
        purchases,
        clicks.withColumnRenamed("c_user", "user_id").withColumnRenamed("c_ts", "ts"),
        on="ts",
        by=("user_id",),
        right_alias="m",
    )
    return (
        joined.filter(F.col("m").isNotNull())  # inner-asof, like the oracle
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("m.ts").alias("click_ts"),
            (ts_micros("ts") - ts_micros(F.col("m.ts"))).alias("gap_us"),
        )
        .orderBy("event_id")
    )


@register(
    "op_range_join_count",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase' AND user_id < 50),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts,
           CAST(COUNT(c.ts) AS BIGINT) AS n_in_range
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts < p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    ORDER BY p.event_id
    """,
    doc="Range (band) join via time-bucketed equi-join composition — "
    "clicks in the hour before each purchase; no unbounded "
    "inequality join.",
    tags=("operator", "range-join"),
)
def op_range_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.table("events")
    purchases = ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 50)).select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return range_count(
        purchases, clicks, _HOUR_US, on="ts", by=("user_id",), out="n_in_range"
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Interval-overlap join: both sides are INTERVALS (start, end), a pair
# matches iff the intervals intersect — distinct from the band join
# (point vs window) above. Same bucketing discipline: overlap pairs
# meet in exactly one canonical bucket, so no distinct pass is needed.
# ---------------------------------------------------------------------------
def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    bucket_us: int,
    by: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """All (a, b) pairs whose [_s, _e) intervals overlap, per ``by``
    keys. Inputs carry epoch-µs columns ``_s``/``_e`` with span
    ``<= bucket_us``; callers derive them via :func:`ts_micros`.

    Plan shape: each interval lands in the <=2 buckets it touches
    (span <= width ⇒ at most one boundary crossed); candidate pairs
    meet on (by, bucket) equi-keys; the residual keeps a pair only in
    the bucket holding max(starts) — the canonical-bucket trick, so
    every overlapping pair appears EXACTLY once with zero dedup
    shuffle. Scale: pair generation is bounded per (key, bucket) cell
    exactly like the band join; an unbounded inequality join (Spark
    would nested-loop it) never appears.

    Degenerate inputs: empty intervals (_s >= _e) overlap nothing by
    definition and are filtered out up front — without the filter the
    textbook predicate would emit spurious matches for them and the
    bucket sequence would run backwards. Payload column names must be
    disjoint across sides (checked loudly here; an overlap would
    otherwise surface as AMBIGUOUS_REFERENCE far downstream)."""
    a_payload = {c for c in a.columns if c not in (*by, "_s", "_e")}
    b_payload = {c for c in b.columns if c not in (*by, "_s", "_e")}
    clash = a_payload & b_payload
    if clash:
        raise ValueError(
            f"interval_overlap_join payload columns collide: {sorted(clash)};"
            " rename one side before joining"
        )
    a = a.filter(F.col("_s") < F.col("_e"))
    b = b.filter(F.col("_s") < F.col("_e"))

    def buckets(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            *by,
            F.col("_s").alias(f"_{side}s"),
            F.col("_e").alias(f"_{side}e"),
            *[c for c in df.columns if c not in (*by, "_s", "_e")],
            F.explode(
                F.sequence(
                    # Integer `div` (catalog convention): exact for the
                    # full long range, floor for these nonnegative µs.
                    F.expr(f"_s div {int(bucket_us)}"),
                    F.expr(f"(_e - 1) div {int(bucket_us)}"),
                )
            ).alias("_b"),
        )

    ab = buckets(a, "a").join(buckets(b, "b"), [*by, "_b"])
    canonical = F.expr(f"greatest(_as, _bs) div {int(bucket_us)}") == F.col("_b")
    overlap = (F.col("_as") < F.col("_be")) & (F.col("_bs") < F.col("_ae"))
    return ab.filter(overlap & canonical).drop("_b", "_as", "_ae", "_bs", "_be")


@register(
    "op_interval_overlap",
    oracle="""
    WITH p AS (SELECT event_id AS purchase_id, user_id,
                      epoch_us(ts) AS s, epoch_us(ts) + 7200000000 AS e
               FROM events WHERE event_type = 'purchase' AND user_id < 40),
         c AS (SELECT event_id AS click_id, user_id,
                      epoch_us(ts) AS s, epoch_us(ts) + 3600000000 AS e
               FROM events WHERE event_type = 'click' AND user_id < 40)
    SELECT p.purchase_id, c.click_id
    FROM p JOIN c ON c.user_id = p.user_id AND p.s < c.e AND c.s < p.e
    ORDER BY purchase_id, click_id
    """,
    doc="Interval-overlap join (attention-span vs session-interval "
    "shape): 2h purchase intervals x 1h click intervals, bucketed so "
    "every overlapping pair meets in exactly one canonical bucket — "
    "vs the oracle's unbounded inequality join.",
    tags=("operator", "interval-join", "bench"),
)
def op_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.table("events")
    two_h, one_h = 2 * _HOUR_US, _HOUR_US
    p = ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 40)).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        ts_micros(F.col("ts")).alias("_s"),
        (ts_micros(F.col("ts")) + two_h).alias("_e"),
    )
    c = ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 40)).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        ts_micros(F.col("ts")).alias("_s"),
        (ts_micros(F.col("ts")) + one_h).alias("_e"),
    )
    return (
        interval_overlap_join(p, c, bucket_us=two_h)
        .select("purchase_id", "click_id")
        .orderBy("purchase_id", "click_id")
    )


# ---------------------------------------------------------------------------
# Grouped custom aggregation via batch applyInPandas (the
# full-group pandas surface; the streaming variant lives in
# streaming/ as applyInPandasWithState).
# ---------------------------------------------------------------------------
def _gap_stats(pdf):
    """Per-user inter-event gap stats — pure integer arithmetic on
    microsecond timestamps, so Spark and the SQL oracle agree
    bit-for-bit (no float summation anywhere)."""
    import pandas as pd  # executor-side import

    ts = pdf["ts"].sort_values()
    us = ts.astype("int64") // 1000  # ns -> us, exact
    gaps = us.diff().dropna().astype("int64")
    if gaps.empty:  # singleton group: no gaps to report
        return pd.DataFrame(
            {"user_id": [], "n_events": [], "max_gap_us": [], "min_gap_us": []}
        )
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [len(pdf)],
            "max_gap_us": [int(gaps.max())],
            "min_gap_us": [int(gaps.min())],
        }
    )


@register(
    "op_gap_stats_pandas",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
      FROM events WHERE user_id < 40
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(gap) AS max_gap_us,
           MIN(gap) AS min_gap_us
    FROM g GROUP BY user_id HAVING COUNT(*) >= 2
    ORDER BY user_id
    """,
    doc="Batch groupBy().applyInPandas custom aggregate (per-user "
    "inter-event gap extremes): the full-group pandas API surface "
    "with EXACT integer parity against a SQL window oracle — "
    "microsecond arithmetic only, no floats to drift.",
    tags=("op", "udf"),
)
def op_gap_stats_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max/min inter-event gap per user through the pandas group API.

    Scale: applyInPandas shuffles once on user_id and streams each
    group through Arrow as a single pandas frame — right for
    bounded per-key group sizes (events-per-user grows with time
    span, not corpus width; a 100 TB deployment windows the input
    first). The deliberate contrast: the SAME semantics is also
    expressible as a pure window+agg (the oracle) — this entry
    exists to keep the pandas full-group path tested, per the UDF
    inventory row."""
    ev = spark.table("events").filter(F.col("user_id") < 40).select("user_id", "ts")
    out = ev.groupBy("user_id").applyInPandas(
        _gap_stats,
        "user_id long, n_events long, max_gap_us long, min_gap_us long",
    )
    return out.filter(F.col("n_events") >= 2).orderBy("user_id")


# ---------------------------------------------------------------------------
# Time-weighted average (the hypertable time_weight('LOCF') shape) and
# counter-delta with reset handling (counter_agg) — both as pure
# window compositions, exact via fixed-point integer arithmetic.
# ---------------------------------------------------------------------------
@register(
    "op_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(round(value * 1000) AS BIGINT) AS v_q,
             epoch_us(ts) AS t,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS t_next
      FROM events WHERE user_id < 30
    )
    SELECT user_id,
           CAST(SUM(v_q * ((t_next - t) // 1000)) AS BIGINT) AS weighted_sum_q,
           CAST(SUM((t_next - t) // 1000) AS BIGINT) AS span_ms,
           CAST(COUNT(*) AS BIGINT) AS n_segments
    FROM seq WHERE t_next IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
    doc="Time-weighted aggregation (LOCF): each observation holds "
    "until the next one, so its weight is the gap to the successor "
    "— the hypertable time_weight/average for irregular series, as "
    "one LEAD window + one rollup. Values quantized to integer "
    "milli-units and gaps truncated to whole milliseconds so every "
    "weighted product stays well inside long range and the sums are "
    "exact order-independent integer arithmetic in both engines.",
    tags=("op", "temporal"),
)
def op_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted value segments per user.

    Scale: ONE shuffle (window partition by user) + the rollup —
    versus the naive per-row interval self-join. The weighted mean
    itself is weighted_sum_q / span_us / 1e6 driver-side; returning
    the integer numerator and denominator keeps the differential
    gate on exact longs, never float summation order."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        spark.table("events")
        .filter(F.col("user_id") < 30)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.col("value") * 1000).cast("long").alias("v_q"),
            ts_micros(F.col("ts")).alias("t"),
        )
        .withColumn("t_next", F.lead(ts_micros(F.col("ts"))).over(w))
        .filter(F.col("t_next").isNotNull())
        .withColumn("gap_ms", F.expr("(t_next - t) div 1000"))
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.sum(F.col("v_q") * F.col("gap_ms")).alias("weighted_sum_q"),
            F.sum("gap_ms").alias("span_ms"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .orderBy("user_id")
    )


@register(
    "op_counter_delta",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(round(value * 1000000) AS BIGINT) AS v_q,
             LAG(CAST(round(value * 1000000) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_q
      FROM events WHERE user_id < 30
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN v_q >= prev_q THEN v_q - prev_q ELSE v_q END)
                AS BIGINT) AS counter_delta_q,
           CAST(COUNT(CASE WHEN v_q < prev_q THEN 1 END) AS BIGINT) AS n_resets
    FROM seq WHERE prev_q IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
    doc="Counter aggregation with reset detection (the hypertable "
    "counter_agg/delta): a monotonic counter's true increase is the "
    "sum of positive steps, and a drop means the counter reset (its "
    "post-reset reading counts in full). One LAG window + one "
    "rollup, quantized to exact longs.",
    tags=("op", "temporal"),
)
def op_counter_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-counter increase per user, reset-aware.

    Scale: same single-shuffle window shape as the time-weighted
    average; the alternative (self-join each reading to its
    predecessor) doubles the shuffle volume for nothing."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vq = F.round(F.col("value") * 1000000).cast("long")
    seq = (
        spark.table("events")
        .filter(F.col("user_id") < 30)
        .select("user_id", "event_id", "ts", vq.alias("v_q"))
        .withColumn("prev_q", F.lag("v_q").over(w))
        .filter(F.col("prev_q").isNotNull())
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("v_q") >= F.col("prev_q"), F.col("v_q") - F.col("prev_q"))
                .otherwise(F.col("v_q"))
            ).alias("counter_delta_q"),
            F.count(F.when(F.col("v_q") < F.col("prev_q"), 1)).alias("n_resets"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# pandas_udf GROUPED_AGG — the vectorized custom-aggregate surface
# (SURVEY §2C UDF row): a whole group's column arrives as one pandas
# Series and reduces to a scalar, Arrow-batched. Distinct from
# applyInPandas (full-frame transform) and SCALAR pandas_udf
# (row-parallel map) — with this, all three pandas execution shapes
# are under the differential gate.
# ---------------------------------------------------------------------------
@register(
    "op_grouped_agg_udf",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(CAST(round(value * 1000000) AS BIGINT))
             - MIN(CAST(round(value * 1000000) AS BIGINT)) AS spread_q
    FROM events WHERE user_id < 40
    GROUP BY user_id ORDER BY user_id
    """,
    doc="GROUPED_AGG pandas_udf custom aggregate (per-user quantized "
    "value spread): exact integer parity with the oracle's MAX-MIN — "
    "the vectorized-UDAF API surface, Arrow whole-group reduction.",
    tags=("op", "udf"),
)
def op_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value spread via a vectorized custom aggregate.

    Scale: GROUPED_AGG runs as a real aggregate — map-side the UDF
    sees per-partition group slices only when Spark can partial-agg
    (it cannot for opaque UDAFs, so the group's values shuffle to one
    reducer); group width here is per-user event count, bounded by
    time-windowing upstream in a 100 TB deployment. Quantization to
    exact longs keeps the spread bit-identical across engines."""
    # Return hint must be a recognized scalar type for the GROUPED_AGG
    # eval shape (plain ``int`` is rejected by the typehint mapper),
    # and np/pd must be MODULE-level: `from __future__ import
    # annotations` stringifies the hints, and the resolver evaluates
    # them in module globals — function-local imports are invisible.
    @F.pandas_udf("long")
    def spread_q(v: pd.Series) -> np.int64:
        return np.int64(v.max() - v.min())

    # Catalyst refuses to mix GROUPED_AGG UDFs with built-in
    # aggregates in one Aggregate (INVALID_PANDAS_UDF_PLACEMENT), so
    # the row count is a second tiny UDAF rather than F.count.
    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> np.int64:
        return np.int64(len(v))

    vq = F.round(F.col("value") * 1000000).cast("long")
    return (
        spark.table("events")
        .filter(F.col("user_id") < 40)
        .select("user_id", vq.alias("v_q"))
        .groupBy("user_id")
        .agg(
            n_rows(F.col("v_q")).alias("n_events"),
            spread_q(F.col("v_q")).alias("spread_q"),
        )
        .orderBy("user_id")
    )


@register(
    "op_asof_forward",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase' AND user_id < 50),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         m AS (
           SELECT p.event_id, p.user_id, p.ts,
                  MIN(c.ts) AS next_click_ts
           FROM p JOIN c ON c.user_id = p.user_id AND c.ts >= p.ts
           GROUP BY p.event_id, p.user_id, p.ts
         )
    SELECT event_id, user_id, ts, next_click_ts,
           epoch_us(next_click_ts) - epoch_us(ts) AS wait_us
    FROM m ORDER BY event_id
    """,
    doc="FORWARD as-of join (earliest following event; kdb aj's "
    "mirror): implemented as the backward as-of composition on "
    "NEGATED epoch time — no new operator code, the union+window "
    "pass reused as-is — vs a min-over-qualifying oracle.",
    tags=("operator", "asof"),
)
def op_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's EARLIEST following click.

    Forward-as-of is backward-as-of on reversed time: negate the
    epoch on both sides, run the same most-recent-prior composition
    (ties still match, since <= on negated time is >= on real time),
    then read the matched row's real timestamp back out of the
    payload struct. Scale identical to op_asof_purchase_click — one
    shuffle, one in-partition sort."""
    ev = spark.table("events")
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 50)
    ).select(
        "event_id",
        "user_id",
        ts_micros(F.col("ts")).alias("real_us"),
        (-ts_micros(F.col("ts"))).alias("neg_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        ts_micros(F.col("ts")).alias("c_real_us"),
        (-ts_micros(F.col("ts"))).alias("neg_us"),
    )
    joined = asof_join(
        purchases, clicks, on="neg_us", by=("user_id",), right_alias="m"
    )
    return (
        joined.filter(F.col("m").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.timestamp_micros(F.col("real_us")).alias("ts"),
            F.timestamp_micros(F.col("m.c_real_us")).alias("next_click_ts"),
            (F.col("m.c_real_us") - F.col("real_us")).alias("wait_us"),
        )
        .orderBy("event_id")
    )


@register(
    "op_percentile_exact",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(ROUND(value * 1000) AS BIGINT) AS vm FROM events
    ),
    hist AS (SELECT event_type, vm, COUNT(*) AS c FROM q GROUP BY event_type, vm),
    cum AS (
      SELECT event_type, vm, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY vm
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM hist
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN vm END) AS BIGINT) AS p50_milli,
           CAST(MIN(CASE WHEN cum * 20 >= n * 19 THEN vm END) AS BIGINT) AS p95_milli
    FROM cum
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Exact distributed percentiles (p50/p95) by histogram "
    "selection: per-group value histogram + cumulative rank pick — "
    "nearest-rank semantics on integer milli-values, identical in "
    "both engines, with no per-group sort of raw rows.",
    tags=("operator", "percentile", "bench"),
)
def op_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank p50/p95 of event value per type.

    Scale: the classic exact-selection plan — raw rows collapse to a
    per-group VALUE histogram first (map-side combine does most of
    it), so the windowed cumulative walk runs over distinct values
    per group, not rows. A sort-based percentile shuffles every raw
    row to its group and sorts; this shuffles one row per distinct
    (group, value). For continuous doubles the quantization IS the
    histogram bin — at 1e-3 precision here, coarser at 100 TB if the
    value domain is dense."""
    q = spark.table("events").select(
        "event_type", F.round(F.col("value") * 1000).cast("long").alias("vm")
    )
    hist = q.groupBy("event_type", "vm").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("vm")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "vm",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.min(
                F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("vm"))
            ).alias("p50_milli"),
            F.min(
                F.when(F.col("cum") * 20 >= F.col("n") * 19, F.col("vm"))
            ).alias("p95_milli"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Linear-interpolation resampling: per-series values re-gridded onto
# a regular interval, each grid point interpolated between its
# neighboring samples — the gap-filling mode LOCF (op_time_weighted
# _avg) does not cover. ONE union + ONE partitioned window pair per
# series: no per-grid-point join, no data-sized global sort.
# ---------------------------------------------------------------------------
_RESAMPLE_US = 6 * 3600 * 1_000_000  # 6h grid


@register(
    "op_resample_linear",
    oracle=f"""
    WITH samples AS (
      SELECT event_type, epoch_us(ts) AS t, MIN(value) AS v
      FROM events GROUP BY event_type, epoch_us(ts)
    ),
    bounds AS (
      SELECT event_type, MIN(t) AS t_lo, MAX(t) AS t_hi
      FROM samples GROUP BY event_type
    ),
    grid AS (
      SELECT event_type,
             CAST(unnest(range(t_lo, t_hi + 1, {_RESAMPLE_US})) AS BIGINT) AS t
      FROM bounds
    ),
    u AS (
      SELECT event_type, t, v, 0 AS is_grid FROM samples
      UNION ALL
      SELECT event_type, t, NULL, 1 FROM grid
    ),
    walked AS (
      SELECT event_type, t, is_grid,
             last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t, is_grid
                     ROWS UNBOUNDED PRECEDING) AS t0,
             last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t, is_grid
                     ROWS UNBOUNDED PRECEDING) AS v0,
             first_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t, is_grid
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t1,
             first_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t, is_grid
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1
      FROM u
    )
    SELECT event_type, t AS grid_us,
           CASE WHEN t0 = t THEN v0
                ELSE v0 + (v1 - v0) * (CAST(t - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
           END AS v_interp
    FROM walked
    WHERE is_grid = 1 AND t0 IS NOT NULL AND t1 IS NOT NULL
    ORDER BY event_type, grid_us
    """,
    doc="Linear-interpolation resampling to a 6h grid per event "
    "type: union samples with grid points, one backward and one "
    "forward partitioned window find the bracketing samples, the "
    "interpolation expression is pinned so the doubles are "
    "bit-identical across engines. Exact-hit grid points return the "
    "sample value; grid points outside the sampled span are dropped.",
    tags=("operator", "timeseries", "bench"),
)
def op_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type series resampled to a regular 6h grid.

    Scale: the union'd frame shuffles ONCE on the series key; both
    windows run inside that partition (parallelism = #series; a
    single hot series would range-partition on time with boundary
    sample exchange, the standard split). Grid generation is
    sequence() per series — no driver loop, no per-point join."""
    samples = (
        spark.table("events")
        .select("event_type", ts_micros(F.col("ts")).alias("t"), "value")
        .groupBy("event_type", "t")
        .agg(F.min("value").alias("v"))
    )
    bounds = samples.groupBy("event_type").agg(
        F.min("t").alias("t_lo"), F.max("t").alias("t_hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("t_lo"), F.col("t_hi"), F.lit(_RESAMPLE_US))
        ).alias("t"),
    )
    u = samples.withColumn("is_grid", F.lit(0)).unionByName(
        grid.select(
            "event_type", "t", F.lit(None).cast("double").alias("v")
        ).withColumn("is_grid", F.lit(1))
    )
    # BOTH neighbor lookups are RUNNING frames (UNBOUNDED PRECEDING ..
    # CURRENT ROW), which Spark's WindowExec evaluates incrementally in
    # O(n); the natural forward spelling — first_value over CURRENT
    # ROW .. UNBOUNDED FOLLOWING — re-scans the tail per row, O(n^2)
    # per partition (measured 112s at sf0.1 before this rewrite). The
    # forward neighbor is instead a running last-non-null over the
    # REVERSED order: (t DESC, is_grid DESC) puts the grid row before
    # its same-t sample, exactly mirroring the ascending frame that
    # started AT the grid row.
    wb = (
        Window.partitionBy("event_type")
        .orderBy("t", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy(F.col("t").desc(), F.col("is_grid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sample_t = F.when(F.col("is_grid") == 0, F.col("t"))
    sample_v = F.when(F.col("is_grid") == 0, F.col("v"))
    walked = u.select(
        "event_type",
        "t",
        "is_grid",
        F.last(sample_t, ignorenulls=True).over(wb).alias("t0"),
        F.last(sample_v, ignorenulls=True).over(wb).alias("v0"),
        F.last(sample_t, ignorenulls=True).over(wf).alias("t1"),
        F.last(sample_v, ignorenulls=True).over(wf).alias("v1"),
    )
    v_interp = F.when(F.col("t0") == F.col("t"), F.col("v0")).otherwise(
        F.col("v0")
        + (F.col("v1") - F.col("v0"))
        * (
            (F.col("t") - F.col("t0")).cast("double")
            / (F.col("t1") - F.col("t0")).cast("double")
        )
    )
    return (
        walked.filter(
            (F.col("is_grid") == 1)
            & F.col("t0").isNotNull()
            & F.col("t1").isNotNull()
        )
        .select(
            "event_type",
            F.col("t").alias("grid_us"),
            v_interp.alias("v_interp"),
        )
        .orderBy("event_type", "grid_us")
    )


# ---------------------------------------------------------------------------
# As-of join with TOLERANCE (pandas merge_asof's `tolerance`): a
# prior match older than the tolerance is as good as no match — the
# join stays LEFT, emitting NULLs. Pure composition: the backward
# as-of plus a null-out predicate; no new join machinery.
# ---------------------------------------------------------------------------
_ASOF_TOL_US = 30 * 60 * 1_000_000  # 30 minutes


@register(
    "op_asof_tolerance",
    oracle=f"""
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts IS NOT NULL
                     AND epoch_us(p.ts) - epoch_us(c.ts) <= {_ASOF_TOL_US}
                THEN c.ts END AS click_ts,
           CASE WHEN c.ts IS NOT NULL
                     AND epoch_us(p.ts) - epoch_us(c.ts) <= {_ASOF_TOL_US}
                THEN epoch_us(p.ts) - epoch_us(c.ts) END AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id < 50) p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    doc="As-of join with a 30-minute tolerance (pandas merge_asof "
    "semantics): the most recent prior click counts only if it is "
    "recent ENOUGH; stale matches null out but the purchase row "
    "survives (left join). Composition over the same union+window "
    "as-of — no new operator machinery.",
    tags=("operator", "asof", "bench"),
)
def op_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases with their within-tolerance prior click, or NULLs.

    Scale: identical to the plain as-of (one union + one partitioned
    window); the tolerance is a map-side predicate on the matched
    struct, so it adds zero shuffles."""
    ev = spark.table("events")
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 50)
    ).select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="ts", by=("user_id",), right_alias="m")
    gap = ts_micros(F.col("ts")) - ts_micros(F.col("m.ts"))
    ok = F.col("m").isNotNull() & (gap <= F.lit(_ASOF_TOL_US))
    return joined.select(
        "event_id",
        "user_id",
        F.when(ok, F.col("m.ts")).alias("click_ts"),
        F.when(ok, gap).alias("gap_us"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# M4 downsampling (Jugel et al., "M4: A Visualization-Oriented Time
# Series Data Aggregation", VLDB 2014): per (series, time bucket)
# keep min, max, first, last of the value — the four points that make
# a width-B pixel rendering of the full series EXACT. The canonical
# large-scale downsampling operator (ClickHouse/Influx dashboards);
# unlike LTTB it has no cross-bucket sequential dependency, so it is
# one partial-aggregatable groupBy — embarrassingly parallel at any
# scale.
# ---------------------------------------------------------------------------
_M4_BUCKETS = 12


@register(
    "op_downsample_m4",
    oracle=f"""
    WITH b AS (
      SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
    ),
    pts AS (
      SELECT event_type,
             CAST(LEAST({_M4_BUCKETS - 1},
                  ((epoch_us(ts) - b.mn) * {_M4_BUCKETS}) // (b.mx - b.mn + 1))
                  AS BIGINT) AS bucket,
             value,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
      FROM events CROSS JOIN b
    )
    SELECT event_type, bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS vmin,
           MAX(value) AS vmax,
           arg_min(value, ord) AS vfirst,
           arg_max(value, ord) AS vlast
    FROM pts GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
    doc=f"M4 downsampling (Jugel et al. VLDB 2014): {_M4_BUCKETS} "
    "equal-width time buckets per series, each reduced to "
    "min/max/first/last of the value — the exact four-point summary "
    "a pixel-width rendering needs. First/last resolve ties by "
    "(time, event_id) through a fixed-width string sort key so both "
    "engines pick the identical row.",
    tags=("timeseries", "events", "bench"),
)
def op_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series M4 bucket summaries.

    Scale: the global (min, max) anchor is a 1-row aggregate
    broadcast into a map-side bucket computation; the M4 reduction
    itself is min/max/min_by/max_by — all partial-aggregatable, so
    the shuffle carries 4 values per (series, bucket) regardless of
    row count. This is the shape that lets a dashboard render a
    billion-point series from a B-row scan result."""
    ev = spark.table("events")
    anchor_b = ev.agg(
        F.min(ts_micros(F.col("ts"))).alias("mn"),
        F.max(ts_micros(F.col("ts"))).alias("mx"),
    )
    t = ts_micros(F.col("ts"))
    bucket = F.least(
        F.lit(_M4_BUCKETS - 1),
        F.expr(f"((t - mn) * {_M4_BUCKETS}) div (mx - mn + 1)"),
    ).cast("long")
    ord_key = F.concat(
        F.lpad(t.cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.crossJoin(F.broadcast(anchor_b))
        .select(
            "event_type",
            t.alias("t"),
            "mn",
            "mx",
            "value",
            ord_key.alias("ord"),
        )
        .select("event_type", bucket.alias("bucket"), "value", "ord")
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.min_by("value", "ord").alias("vfirst"),
            F.max_by("value", "ord").alias("vlast"),
        )
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------------------------
# NEAREST as-of (round 7; pandas merge_asof direction='nearest'
# parity): each purchase matched to the temporally CLOSEST click in
# either direction within the tolerance, ties resolved toward the
# prior (backward) match — composed from the backward as-of and its
# negated-time forward mirror, then a map-side argmin. Still no new
# operator machinery and no pair join.
# ---------------------------------------------------------------------------
@register(
    "op_asof_nearest",
    oracle=f"""
    WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
               WHERE event_type = 'purchase' AND user_id < 50),
         c AS (SELECT user_id, epoch_us(ts) AS ct FROM events
               WHERE event_type = 'click'),
         cand AS (
           SELECT p.event_id, p.user_id, p.t, c.ct,
                  abs(p.t - c.ct) AS dist,
                  CASE WHEN c.ct <= p.t THEN 0 ELSE 1 END AS fwd
           FROM p JOIN c ON c.user_id = p.user_id
           WHERE abs(p.t - c.ct) <= {_ASOF_TOL_US}
         ),
         best AS (
           SELECT event_id, user_id,
                  arg_min(ct, lpad(CAST(dist AS VARCHAR), 20, '0') || fwd)
                    AS nearest_ct
           FROM cand GROUP BY event_id, user_id
         )
    SELECT p.event_id, p.user_id,
           CAST(best.nearest_ct AS BIGINT) AS nearest_click_us,
           CAST(p.t - best.nearest_ct AS BIGINT) AS signed_gap_us
    FROM p LEFT JOIN best USING (event_id, user_id)
    ORDER BY p.event_id
    """,
    doc="Nearest-direction as-of with a 30-minute tolerance (pandas "
    "merge_asof direction='nearest'): the closer of the most recent "
    "prior and earliest following click, ties toward the prior — "
    "composed from the two existing as-of passes plus a map-side "
    "argmin (the oracle may pair-join; the engine never does).",
    tags=("operator", "asof"),
)
def op_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases with their nearest click within tolerance, or NULLs.

    Scale: two as-of compositions (each one shuffle on user_id + one
    in-partition sort — the same keyed shuffle, so AQE can reuse the
    partitioning) and a per-row comparison; candidate pairs never
    materialize. The oracle's |purchases x clicks-in-window| join is
    exactly the plan this operator exists to avoid at 100 TB."""
    ev = spark.table("events")
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 50)
    ).select(
        "event_id",
        "user_id",
        ts_micros(F.col("ts")).alias("t"),
        (-ts_micros(F.col("ts"))).alias("neg_t"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        ts_micros(F.col("ts")).alias("ct"),
        (-ts_micros(F.col("ts"))).alias("neg_t"),
    )
    back = asof_join(
        purchases.drop("neg_t"),
        clicks.select("user_id", F.col("ct").alias("t"), "ct"),
        on="t",
        by=("user_id",),
        right_alias="mb",
    ).select("event_id", "user_id", "t", F.col("mb.ct").alias("back_ct"))
    fwd = asof_join(
        purchases.select("event_id", "user_id", "t", "neg_t").drop("t")
        .withColumnRenamed("neg_t", "t"),
        clicks.select("user_id", F.col("neg_t").alias("t"), "ct"),
        on="t",
        by=("user_id",),
        right_alias="mf",
    ).select("event_id", F.col("mf.ct").alias("fwd_ct"))
    j = back.join(fwd, "event_id")
    bdist = F.when(
        F.col("back_ct").isNotNull()
        & (F.col("t") - F.col("back_ct") <= _ASOF_TOL_US),
        F.col("t") - F.col("back_ct"),
    )
    fdist = F.when(
        F.col("fwd_ct").isNotNull()
        & (F.col("fwd_ct") - F.col("t") <= _ASOF_TOL_US),
        F.col("fwd_ct") - F.col("t"),
    )
    pick_back = bdist.isNotNull() & (
        fdist.isNull() | (bdist <= fdist)  # tie -> backward
    )
    nearest = (
        F.when(pick_back, F.col("back_ct"))
        .when(fdist.isNotNull(), F.col("fwd_ct"))
    )
    return j.select(
        "event_id",
        "user_id",
        nearest.alias("nearest_click_us"),
        (F.col("t") - nearest).alias("signed_gap_us"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Interval union / coverage (round 8): the gaps-and-islands classic —
# each event claims a fixed activity interval [ts, ts + 5 min]; per
# user, merge overlapping/touching intervals into islands and report
# the island count and total covered seconds (the union length, NOT
# the sum of interval lengths — overlaps counted once). One lag +
# one running-max window per user in exact epoch-microsecond
# arithmetic, then an island-id prefix sum: the textbook distributed
# formulation, no self-join, no interval explosion.
# ---------------------------------------------------------------------------
_COVER_SPAN_US = 5 * 60 * 1_000_000  # 5 minutes in microseconds


@register(
    "op_interval_coverage",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_COVER_SPAN_US} AS e
      FROM events WHERE user_id < 40
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s <= MAX(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 0 ELSE 1 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      FROM marked
    ),
    merged AS (
      SELECT user_id, isl, MIN(s) AS s0, MAX(e) AS e1
      FROM islands GROUP BY user_id, isl
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM((e1 - s0) // 1000000) AS BIGINT) AS covered_seconds,
           CAST(MAX((e1 - s0) // 1000000) AS BIGINT) AS longest_island_s
    FROM merged GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Interval union per user (gaps-and-islands): events claim "
    "[ts, ts+5min]; overlapping/touching intervals merge via a "
    "running-max-of-end window and an island-id prefix sum — union "
    "length counts overlaps once. Exact epoch-microsecond integers "
    "end-to-end; the canonical 'total active time' operator.",
    tags=("operators", "timeseries", "bench"),
)
def op_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user merged-interval count and union coverage.

    Scale: both windows partition by user_id (parallelism = users;
    no global sort) and carry 16 bytes per row; the island rollup
    and the final per-user aggregation are map-side-combinable.
    This is the O(n log n)-per-partition formulation — the naive
    alternative (self-join on overlap) is quadratic in events per
    user and never survives scale-up."""
    iv = (
        spark.table("events")
        .filter(F.col("user_id") < 40)
        .select(
            "user_id",
            ts_micros("ts").alias("s"),
            (ts_micros("ts") + F.lit(_COVER_SPAN_US)).alias("e"),
        )
    )
    w_order = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(F.col("s") <= prev_max_e, 0).otherwise(1),
    )
    islands = marked.withColumn(
        "isl",
        F.sum("new_island").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    merged = islands.groupBy("user_id", "isl").agg(
        F.min("s").alias("s0"), F.max("e").alias("e1")
    )
    span_s = F.expr("(e1 - s0) div 1000000")
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.sum(span_s).cast("long").alias("covered_seconds"),
            F.max(span_s).cast("long").alias("longest_island_s"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Weighted percentiles (round 8): the quantity-weighted median/p90 of
# unit price per return flag — each row counts with weight w, so the
# percentile is over SHIPPED UNITS, not line items (the difference
# matters whenever rows aggregate unequal volumes). Same exact
# histogram-selection discipline as op_percentile_exact, with the
# cumulative WEIGHT replacing the cumulative count: smallest value v
# with cumw(v) * 100 >= p * W. Prices quantize to exact integer
# millicents, weights to integer units — engine-exact end-to-end.
# ---------------------------------------------------------------------------
@register(
    "op_weighted_percentile",
    oracle="""
    WITH q AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 1000) AS BIGINT) AS vm,
             CAST(ROUND(l_quantity) AS BIGINT) AS w
      FROM lineitem
    ),
    hist AS (
      SELECT flag, vm, SUM(w) AS w FROM q GROUP BY flag, vm
    ),
    cum AS (
      SELECT flag, vm, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY vm
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumw,
             SUM(w) OVER (PARTITION BY flag) AS tot
      FROM hist
    )
    SELECT flag,
           CAST(MAX(tot) AS BIGINT) AS total_units,
           CAST(MIN(CASE WHEN cumw * 100 >= 50 * tot THEN vm END) AS BIGINT)
             AS wp50_millis,
           CAST(MIN(CASE WHEN cumw * 100 >= 90 * tot THEN vm END) AS BIGINT)
             AS wp90_millis
    FROM cum GROUP BY flag
    ORDER BY flag
    """,
    doc="Quantity-weighted exact percentiles of extended price per "
    "return flag: histogram selection with cumulative WEIGHT "
    "(smallest v with cumw*100 >= p*W) — the percentile over shipped "
    "units, not line items. Millicent quantization and integer "
    "weights keep selection engine-exact; the histogram, not the "
    "rows, feeds the cumulative window.",
    tags=("operators", "percentile"),
)
def op_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted p50/p90 of unit price per return flag.

    Scale: the per-(flag, value) weight histogram is the only
    data-volume aggregation (map-side combined); the cumulative
    window runs over histogram rows — bounded by distinct price
    points, not row count — partitioned by flag. The unweighted
    sibling is op_percentile_exact; the weighted form is what
    inventory/revenue distributions actually need."""
    q = spark.table("lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 1000).cast("long").alias("vm"),
        F.round(F.col("l_quantity")).cast("long").alias("w"),
    )
    hist = q.groupBy("flag", "vm").agg(F.sum("w").alias("w"))
    wc = Window.partitionBy("flag").orderBy("vm").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "flag",
        "vm",
        F.sum("w").over(wc).alias("cumw"),
        F.sum("w").over(Window.partitionBy("flag")).alias("tot"),
    )

    def pick(pct: int):
        return F.min(
            F.when(F.col("cumw") * 100 >= pct * F.col("tot"), F.col("vm"))
        ).cast("long")

    return (
        cum.groupBy("flag")
        .agg(
            F.max("tot").cast("long").alias("total_units"),
            pick(50).alias("wp50_millis"),
            pick(90).alias("wp90_millis"),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# Calendar-gap detection (round 9) — the time-series completeness
# check a monitoring pipeline runs before trusting any daily rollup:
# for each series, generate its expected calendar (min..max observed
# day) and anti-join the observed days; a gap is a day the series
# should have had but didn't. Both engines generate the calendar
# independently (Spark sequence() vs DuckDB generate_series), so
# the differential check pins the date arithmetic too.
# ---------------------------------------------------------------------------
@register(
    "op_calendar_gaps",
    oracle="""
    WITH obs AS (
      SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events
    ),
    bounds AS (
      SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
      FROM obs GROUP BY event_type
    ),
    expected AS (
      SELECT event_type,
             CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_expected,
           CAST(COUNT(o.day) AS BIGINT) AS n_observed,
           CAST(COUNT(*) - COUNT(o.day) AS BIGINT) AS n_missing,
           MIN(CASE WHEN o.day IS NULL
                    THEN CAST(e.day AS VARCHAR) END) AS first_missing
    FROM expected e LEFT JOIN obs o
      ON o.event_type = e.event_type AND o.day = e.day
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    doc="Calendar-gap detection: per-series expected calendar "
    "(min..max day, generated independently by each engine) "
    "anti-joined with observed days — expected/observed/missing "
    "counts and the first gap; the completeness gate for daily "
    "rollups, companion to ev_anomaly_mad's volume check.",
    tags=("operator", "temporal", "bench"),
)
def op_calendar_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series calendar completeness summary.

    Scale: events collapse to DISTINCT (type, day) in one map-side-
    combined pass; the expected calendar explodes |days| rows per
    SERIES (calendar-bounded, never event-bounded), and the gap join
    keys on (type, day) — cells, not events."""
    obs = (
        spark.table("events")
        .select("event_type", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    bounds = obs.groupBy("event_type").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    expected = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi")).alias("day"),
    )
    return (
        expected.join(
            obs.withColumnRenamed("day", "oday"),
            (obs["event_type"] == expected["event_type"])
            & (F.col("oday") == F.col("day")),
            "left",
        )
        .groupBy(expected["event_type"].alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_expected"),
            F.count("oday").cast("long").alias("n_observed"),
            (F.count(F.lit(1)) - F.count("oday"))
            .cast("long")
            .alias("n_missing"),
            F.min(
                F.when(F.col("oday").isNull(), F.col("day").cast("string"))
            ).alias("first_missing"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Rolling exact median (round 9): per-user 7-event discrete median of
# purchase values — the robust smoother dashboards use where a rolling
# mean would chase outliers. Discrete (type-2) median: the element at
# 1-based position (n+1) div 2 of the sorted frame, so the result is
# always an observed value and stays integer-exact in cents; DuckDB's
# quantile_disc(0.5) window is the same selector. The frame is ROWS
# BETWEEN 6 PRECEDING AND CURRENT ROW — bounded, so collect_list holds
# at most 7 elements per row regardless of data volume, and the window
# is partitioned by user: parallel across users, state O(frame).
# ---------------------------------------------------------------------------
@register(
    "op_rolling_median",
    oracle="""
    WITH pv AS (
      SELECT user_id, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS event_id,
           CAST(cents AS BIGINT) AS cents,
           CAST(quantile_disc(cents, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS med7_cents
    FROM pv ORDER BY user_id, event_id
    """,
    doc="Rolling 7-event exact discrete median of purchase value per "
    "user (type-2 / lower-middle selector, integer cents) — bounded "
    "ROWS frame so per-row state is 7 elements at any scale; the "
    "robust alternative to a rolling mean.",
    tags=("op", "window", "bench"),
)
def op_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    pv = (
        spark.table("events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "ts",
        )
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    sorted_frame = F.sort_array(F.collect_list("cents").over(frame))
    med = F.element_at(
        sorted_frame, ((F.size(sorted_frame) + 1) / 2).cast("int")
    )
    return (
        pv.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col("cents").cast("long").alias("cents"),
            med.cast("long").alias("med7_cents"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# Fact -> SCD2 dimension temporal join (round 9): every purchase is
# attributed to the user's state interval valid AT PURCHASE TIME —
# the canonical Kimball fact-to-type-2-dimension join
# ("WHERE fact.ts BETWEEN dim.valid_from AND dim.valid_to"). The
# dimension here is the per-user state history ev_scd2_intervals
# builds (non-purchase event-type changes); the engine never runs the
# interval/range join the textbook SQL implies — it uses the as-of
# carry composition (union the two sides, ONE user-partitioned window
# carries the last state forward), so cost is one shuffle + one
# in-partition sort, with no candidate-pair blowup on long histories.
# Equal-timestamp discipline matches the oracle exactly: state rows
# sort before fact rows at the same microsecond (side key), multiple
# same-instant state changes collapse to the highest event_id (the
# zero-length intervals the oracle's valid_to bound excludes).
# ---------------------------------------------------------------------------
@register(
    "op_scd2_asof_join",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev
      FROM events WHERE event_type <> 'purchase'
    ),
    dim AS (
      SELECT user_id, event_type AS state, t,
             LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
               AS valid_to
      FROM s WHERE prev IS NULL OR prev <> event_type
    ),
    f AS (
      SELECT user_id, epoch_us(ts) AS t,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    )
    SELECT dim.state,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(f.cents) AS BIGINT) AS rev_cents
    FROM f JOIN dim
      ON f.user_id = dim.user_id
     AND f.t >= dim.t
     AND (dim.valid_to IS NULL OR f.t < dim.valid_to)
    GROUP BY dim.state ORDER BY dim.state
    """,
    doc="Fact-to-SCD2 temporal join: purchases attributed to the "
    "user state interval valid at purchase time — the oracle runs "
    "the textbook point-in-interval join, the engine the as-of "
    "carry composition (one user shuffle, one window, no interval "
    "candidate pairs).",
    tags=("op", "temporal", "join", "bench"),
)
def op_scd2_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    s = (
        ev.filter(F.col("event_type") != "purchase")
        .select(
            "user_id",
            "event_type",
            ts_micros(F.col("ts")).alias("t"),
            "event_id",
        )
        .withColumn("prev", F.lag("event_type").over(w))
    )
    dim = s.filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    ).select(
        "user_id",
        "t",
        "event_id",
        F.lit(0).alias("side"),
        F.col("event_type").alias("state"),
        F.lit(None).cast("long").alias("cents"),
    )
    f = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        ts_micros(F.col("ts")).alias("t"),
        "event_id",
        F.lit(1).alias("side"),
        F.lit(None).cast("string").alias("state"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    carry = (
        Window.partitionBy("user_id")
        .orderBy("t", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        dim.unionByName(f)
        .withColumn("cur_state", F.last("state", ignorenulls=True).over(carry))
        .filter((F.col("side") == 1) & F.col("cur_state").isNotNull())
    )
    return (
        joined.groupBy(F.col("cur_state").alias("state"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
        .orderBy("state")
    )


@register(
    "op_sampled_quantile",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(ROUND(value * 1000) AS BIGINT) AS vm,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 4)
                       < '0ccd' THEN 1 ELSE 0 END AS s
      FROM events
    ),
    hist AS (
      SELECT event_type, vm, COUNT(*) AS c, SUM(s) AS cs
      FROM q GROUP BY event_type, vm
    ),
    cum AS (
      SELECT event_type, vm,
             SUM(c) OVER (PARTITION BY event_type ORDER BY vm
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n,
             SUM(cs) OVER (PARTITION BY event_type ORDER BY vm
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cums,
             SUM(cs) OVER (PARTITION BY event_type) AS ns
      FROM hist
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_full,
           CAST(MAX(ns) AS BIGINT) AS n_sample,
           CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN vm END)
                AS BIGINT) AS p50_full_milli,
           CAST(MIN(CASE WHEN ns > 0 AND cums >= (ns + 1) // 2
                         THEN vm END) AS BIGINT) AS p50_sample_milli,
           CAST(MIN(CASE WHEN ns > 0 AND cums >= (ns + 1) // 2
                         THEN vm END)
                - MIN(CASE WHEN cum >= (n + 1) // 2 THEN vm END)
                AS BIGINT) AS err_milli
    FROM cum GROUP BY event_type ORDER BY event_type
    """,
    doc="Quantile estimation by DETERMINISTIC uniform sampling with "
    "measured error: a ~5% md5-threshold sample (hash-stable, so "
    "both engines draw the IDENTICAL sample — no RNG portability "
    "surface) feeds the same histogram-selection median as the full "
    "data, and the signed sample-vs-exact error is part of the "
    "hash-checked output — the calibration discipline of "
    "llm_minhash_estimate_error applied to the quantile-sketch "
    "family.",
    tags=("operator", "percentile", "sketch", "bench"),
)
def op_sampled_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled vs exact median per event type, error measured.

    Scale: the sample is decided map-side by a hash threshold — no
    shuffle to draw it, no coordinator state, refreshable on any
    subset of data (hash-stability makes the sample consistent
    across partitions and reruns); both medians ride ONE histogram
    shuffle of (group, value) pairs. This is the cheap first answer
    at 100 TB — the exact pass is the audit, and the measured error
    column is what justifies serving the sampled one."""
    ev = spark.table("events").select(
        "event_type",
        F.round(F.col("value") * 1000).cast("long").alias("vm"),
        (
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 4)
            < "0ccd"
        )
        .cast("long")
        .alias("s"),
    )
    hist = ev.groupBy("event_type", "vm").agg(
        F.count(F.lit(1)).alias("c"), F.sum("s").alias("cs")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("vm")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "vm",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
        F.sum("cs").over(wcum).alias("cums"),
        F.sum("cs").over(wall).alias("ns"),
    )
    p50_full = F.min(
        F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("vm"))
    )
    p50_samp = F.min(
        F.when(
            (F.col("ns") > 0) & (F.col("cums") >= F.expr("(ns + 1) div 2")),
            F.col("vm"),
        )
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").alias("n_full"),
            F.max("ns").alias("n_sample"),
            p50_full.alias("p50_full_milli"),
            p50_samp.alias("p50_sample_milli"),
            (p50_samp - p50_full).alias("err_milli"),
        )
        .orderBy("event_type")
    )
