"""Event-time windowing over the ``events`` fixture (SURVEY §7 phase 4).

The reference has no streaming/time-series surface at all (SURVEY §2D:
"streaming operators ABSENT") — this module is the batch half of the
driver's events extension: tumbling/sliding windows via ``F.window``,
session windows via ``F.session_window``, and JSON property access via
``from_json`` (the ``getField`` path over semi-structured data). The
true Structured Streaming half (readStream + watermark) lives in
``datafusion_rdbms_ext_spark/streaming``; the window *semantics* are
identical in both modes, which is why batch differential testing of
the windowing is meaningful.

Oracle note: DuckDB ``time_bucket`` and Spark ``F.window`` agree on
bucket boundaries for midnight-aligned intervals (day/hour/minute)
because both align to midnight epochs; session windows are oracled
with the standard gaps-and-islands SQL.

Scale: every window aggregate shuffles once on (bucket-or-user,
keys); buckets are time-uniform so there is no skew; session windows
partition by user_id (high cardinality). ``events.ts`` arrives as
TIMESTAMP(NANOS) parquet and is rebased to microseconds at catalog
registration (catalog.py), mirroring the reference's epoch rebasing
(src/sqldb/postgres/binary_reader.rs:19-20,425-431).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.compat import dsum, sql_dsum
from .base import register


# ---------------------------------------------------------------------------
# Tumbling window.
# ---------------------------------------------------------------------------
@register(
    "ev_tumbling_daily",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 day', ts) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY bucket_start, event_type
    ORDER BY bucket_start, event_type
    """,
    doc="Tumbling event-time window (F.window 1 day) x event_type; "
    "streaming-identical semantics, batch-verified vs time_bucket.",
    tags=("events", "window", "bench"),
)
def ev_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts and value sums per type."""
    ev = spark.table("events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n_events", "sum_value")
        .orderBy("bucket_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Sliding window.
# ---------------------------------------------------------------------------
@register(
    "ev_sliding_6h_3h",
    oracle=f"""
    WITH expanded AS (
      SELECT unnest([time_bucket(INTERVAL '3 hours', ts),
                     time_bucket(INTERVAL '3 hours', ts) - INTERVAL '3 hours']) AS window_start,
             value
      FROM events
    )
    SELECT window_start,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM expanded
    GROUP BY window_start
    ORDER BY window_start
    """,
    doc="Sliding event-time window (6h window, 3h slide): each event "
    "lands in window/slide = 2 overlapping windows.",
    tags=("events", "window"),
)
def ev_sliding_6h_3h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 6-hour aggregates every 3 hours.

    Scale: F.window with a slide replicates each row window/slide
    times BEFORE the shuffle — the replication factor (2 here) is the
    thing to keep small at volume, which is why the slide is half the
    window, not a fine-grained fraction."""
    ev = spark.table("events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# Session window (gap-based).
# ---------------------------------------------------------------------------
@register(
    "ev_session_windows",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events WHERE user_id < 20
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL '6 hours' THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '6 hours' AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="Session windows (6h inactivity gap) via F.session_window; "
    "oracled with gaps-and-islands SQL. Spark session end = last "
    "event + gap, mirrored in the oracle.",
    tags=("events", "window", "bench"),
)
def ev_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity sessions separated by >6h of inactivity.

    Scale: session_window is the one window type that cannot
    pre-bucket map-side — rows shuffle on user_id and sessions merge
    in-state; high user cardinality keeps partitions balanced. The
    same expression works under readStream with a watermark (see
    streaming module)."""
    ev = spark.table("events").filter(F.col("user_id") < 20)
    return (
        ev.groupBy("user_id", F.session_window("ts", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# JSON property access (from_json / get_json_object).
# ---------------------------------------------------------------------------
@register(
    "ev_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
                           THEN 1 END) AS BIGINT) AS n_high_k,
           MIN(json_extract_string(props, '$.k')) AS min_k_str
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Semi-structured access: from_json -> typed struct getField + "
    "get_json_object string path (ref GetIndexedField todo!() "
    "parser.rs:698, extended to JSON).",
    tags=("events", "json"),
)
def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed and string-path JSON extraction over the props column.

    Scale: from_json is JVM-side (Jackson) and codegen-friendly; the
    projection prunes to (event_type, props) at the scan."""
    ev = spark.table("events")
    k_typed = F.from_json("props", "k INT").getField("k")
    k_str = F.get_json_object("props", "$.k")
    return (
        ev.select("event_type", k_typed.alias("k"), k_str.alias("ks"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_high_k"),
            F.min("ks").alias("min_k_str"),
        )
        .orderBy("event_type")
    )


@register(
    "ev_variant_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(COUNT(CASE WHEN json_extract(props, '$.missing') IS NULL
                           THEN 1 END) AS BIGINT) AS n_no_missing,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="VARIANT semi-structured type (Spark 4): parse_json -> open "
    "variant binary, typed path extraction via variant_get, safe "
    "extraction of absent paths via try_variant_get — the "
    "schema-on-read path for heterogeneous event payloads, vs "
    "ev_json_props's fixed-schema from_json. Beyond reference "
    "surface (no JSON at all there).",
    tags=("events", "json"),
)
def ev_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction through the VARIANT type, per event_type.

    Scale: VARIANT parses each payload ONCE into a binary form the
    executors navigate without re-parsing per path access — at many
    paths per row this beats repeated get_json_object scans; the
    binary stays columnar through the aggregate. try_variant_get
    returns null (not an error) for absent paths, so ingest of
    heterogeneous payloads cannot fail mid-shuffle."""
    ev = spark.table("events")
    v = F.parse_json("props")
    return (
        ev.select(
            "event_type",
            F.variant_get(v, "$.k", "long").alias("k"),
            F.try_variant_get(v, "$.missing", "long").alias("m"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
            F.count(F.when(F.col("m").isNull(), 1)).alias("n_no_missing"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Gap-filled continuous rollup (the hypertable/continuous-aggregate
# shape: every bucket in the span is present, empty ones as zeros).
# ---------------------------------------------------------------------------

#: The event-type enum — fixed by the schema, not SF-scaling (same
#: rationale as the explicit pivot value list below).
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "ev_rollup_gapfill",
    oracle=f"""
    WITH agg AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start, event_type,
             COUNT(*) AS n_events, {sql_dsum('value')} AS sum_value
      FROM events GROUP BY bucket_start, event_type
    ),
    span AS (
      SELECT unnest(generate_series(date_trunc('hour', MIN(ts)),
                                    date_trunc('hour', MAX(ts)),
                                    INTERVAL '1 hour')) AS bucket_start
      FROM events
    ),
    grid AS (
      SELECT s.bucket_start, t.event_type
      FROM span s, (SELECT unnest(list_value{_EVENT_TYPES}) AS event_type) t
    )
    SELECT g.bucket_start, g.event_type,
           CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
           COALESCE(a.sum_value, 0.0) AS sum_value
    FROM grid g LEFT JOIN agg a
      ON a.bucket_start = g.bucket_start AND a.event_type = g.event_type
    ORDER BY g.bucket_start, g.event_type
    """,
    doc="Gap-filled hourly rollup (the hypertable continuous-"
    "aggregate shape): a dense bucket x type grid generated from the "
    "observed span, left-joined with the hourly aggregate so silent "
    "hours surface as explicit zeros — what dashboards and "
    "downstream ML featurizers need.",
    tags=("events", "window"),
)
def ev_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type rollup with empty buckets filled as zeros.

    Scale: the grid's cardinality is hours-in-span x |type enum| —
    a function of TIME RANGE, not event volume, so it stays tiny
    while events grow 100x. It is built from one min/max scalar
    aggregate plus ``sequence`` + two explodes (no crossJoin node,
    no distinct pre-pass over the fact table); the fact-side rollup
    is the usual single partial-aggregate shuffle, and AQE broadcasts
    whichever join side is smaller at runtime."""
    ev = spark.table("events")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n_events", "sum_value")
    )
    grid = (
        ev.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("bucket_start")
        )
        .select(
            "bucket_start",
            F.explode(F.array(*[F.lit(t) for t in _EVENT_TYPES])).alias("event_type"),
        )
    )
    return (
        grid.join(agg, ["bucket_start", "event_type"], "left")
        .select(
            "bucket_start",
            "event_type",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("bucket_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation surface).
# ---------------------------------------------------------------------------
@register(
    "ev_pivot_daily_types",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS day,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
    FROM events
    GROUP BY day
    ORDER BY day
    """,
    doc="Pivot: event-type columns per day (DataFrame pivot with an "
    "explicit value list; oracle = conditional aggregation).",
    tags=("events", "aggregate"),
)
def ev_pivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily counts pivoted into one column per event type.

    Scale: the explicit pivot value list avoids the extra
    distinct-values job Spark otherwise runs before planning the
    pivot — at 100 TB that pre-pass is a full scan worth skipping."""
    ev = spark.table("events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            F.col("w.start").alias("day"),
            "click",
            "error",
            "purchase",
            "signup",
            "view",
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Corrupt-record JSON ingestion — the PERMISSIVE-mode surface every
# web-scale pipeline needs: malformed payloads must neither kill the
# job (FAILFAST) nor vanish silently (DROPMALFORMED), but land in a
# quarantine column for audit. Corruption is injected deterministically
# in-query (every 10th event's props gets a leading "<<"), so both
# engines see the identical mix of valid and malformed documents.
# ---------------------------------------------------------------------------
@register(
    "ev_json_corrupt_records",
    oracle="""
    WITH mangled AS (
      SELECT event_type,
             CASE WHEN event_id % 10 = 0 THEN '<<' || props ELSE props END AS p
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN NOT json_valid(p) THEN 1 END) AS BIGINT) AS n_corrupt,
           CAST(SUM(CASE WHEN json_valid(p)
                         THEN CAST(json_extract_string(p, '$.k') AS BIGINT) END)
                AS BIGINT) AS sum_k_valid
    FROM mangled
    GROUP BY event_type ORDER BY event_type
    """,
    doc="PERMISSIVE corrupt-record JSON parsing: from_json with a "
    "declared _corrupt quarantine column — malformed payloads are "
    "counted and audited per event type while valid rows keep "
    "flowing; the oracle agrees via json_valid. Only syntactic "
    "corruption is injected (both engines classify it identically).",
    tags=("events", "json"),
)
def ev_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type valid/corrupt census over a deterministically mangled feed.

    Scale: from_json is JVM-side Jackson inside codegen; the corrupt
    branch adds no shuffle — quarantine is just another column until
    the final per-type rollup. At 100 TB the same plan writes the
    quarantined rows to a badRecords sink instead of counting them."""
    mangled = spark.table("events").select(
        "event_type",
        F.when(F.col("event_id") % 10 == 0, F.concat(F.lit("<<"), F.col("props")))
        .otherwise(F.col("props"))
        .alias("p"),
    )
    parsed = mangled.select(
        "event_type",
        F.from_json(
            F.col("p"),
            "k LONG, _corrupt STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("j"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.col("j._corrupt")).alias("n_corrupt"),
            F.sum(F.when(F.col("j._corrupt").isNull(), F.col("j.k"))).alias(
                "sum_k_valid"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Half-life decayed trending score — the streaming-analytics ranking
# signal (recent activity counts more), made EXACTLY reproducible by
# using a power-of-two decay on integer-quantized values: an event
# aged d days contributes value_milli >> d (integer shift), so both
# engines compute identical integers where exp(-lambda*age) would
# drift in the last ulp.
# ---------------------------------------------------------------------------
@register(
    "ev_trending_decay",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS mx FROM events),
    aged AS (
      SELECT event_type,
             CAST(ROUND(value * 1000) AS BIGINT) AS vm,
             LEAST((epoch_us(mx) - epoch_us(ts)) // 86400000000, 62) AS age_d
      FROM events CROSS JOIN anchor
    )
    SELECT event_type,
           CAST(SUM(vm >> age_d) AS BIGINT) AS trend_score,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM aged
    GROUP BY event_type ORDER BY trend_score DESC, event_type
    """,
    doc="Half-life decayed trending score (1-day half-life): integer "
    "milli-value right-shifted by whole days of age from the corpus "
    "max timestamp — the exponential-decay ranking signal with "
    "bit-exact cross-engine arithmetic (shift, not exp).",
    tags=("events", "window", "bench"),
)
def ev_trending_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event types ranked by recency-decayed activity.

    Scale: one scan + a 1-row max-timestamp broadcast + a map-side
    shift and rollup — the decayed score is a plain aggregation, so
    it composes with windows/streaming exactly like count does. The
    62-day shift cap keeps the shift defined; older events contribute
    zero, which IS the decay semantics."""
    from ..functions.compat import ts_micros

    anchor = spark.table("events").agg(F.max("ts").alias("mx"))
    aged = (
        spark.table("events")
        .crossJoin(F.broadcast(anchor))
        .select(
            "event_type",
            F.round(F.col("value") * 1000).cast("long").alias("vm"),
            F.least(
                ((ts_micros(F.col("mx")) - ts_micros(F.col("ts"))) / F.lit(86_400_000_000)).cast("long"),
                F.lit(62),
            ).alias("age_d"),
        )
    )
    return (
        aged.groupBy("event_type")
        .agg(
            F.sum(F.expr("shiftright(vm, age_d)")).alias("trend_score"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.col("trend_score").cast("long").alias("trend_score"),
            "n_events",
        )
        .orderBy(F.desc("trend_score"), "event_type")
    )


# ---------------------------------------------------------------------------
# Behavioral Markov transitions — P(next event | event) per user
# journey: the product-analytics transition matrix behind path
# mining and next-action prediction. Same map-side consecutive-pair
# trick as the bigram LM, applied to per-user time-ordered journeys.
# ---------------------------------------------------------------------------
@register(
    "ev_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, list(event_type ORDER BY ts, event_id) AS evs
      FROM events GROUP BY user_id
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, len(evs)),
                    i -> struct_pack(src := evs[i], dst := evs[i+1]))) AS p
      FROM seq WHERE len(evs) >= 2
    ),
    counts AS (SELECT p.src AS src, p.dst AS dst, COUNT(*) AS c FROM pairs GROUP BY 1, 2),
    totals AS (SELECT src, SUM(c) AS t FROM counts GROUP BY src)
    SELECT counts.src AS from_event, dst AS to_event, CAST(c AS BIGINT) AS c,
           CAST(c * 1000000 // t AS BIGINT) AS cond_ppm
    FROM counts JOIN totals ON totals.src = counts.src
    ORDER BY from_event, to_event
    """,
    doc="Per-user Markov transition matrix (P(next event | event) in "
    "exact-integer ppm): journeys ordered by (ts, event_id), "
    "consecutive pairs formed map-side from the collected journey "
    "array — path-mining / next-action analytics.",
    tags=("events", "window", "bench"),
)
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 5x5 event-type transition matrix over all user journeys.

    Scale: one per-user aggregation builds the journey (journeys are
    user-session-sized, not corpus-sized), pairs explode map-side,
    and the transition table is |event_types|^2 — tiny forever. The
    window-function formulation (lag over user+ts) is the same cost;
    the array form keeps the pair construction inside codegen."""
    from ..functions.compat import ts_micros

    seq = (
        spark.table("events")
        .select(
            "user_id",
            F.struct(
                ts_micros(F.col("ts")).alias("t"),
                F.col("event_id").alias("e"),
                F.col("event_type").alias("ev"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("s")), lambda x: x.getField("ev")
            ).alias("evs")
        )
        .filter(F.size("evs") >= 2)
    )
    pairs = seq.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(evs) - 2),"
                " i -> struct(evs[i] AS src, evs[i+1] AS dst))"
            )
        ).alias("p")
    ).select("p.src", "p.dst")
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("src").agg(F.sum("c").alias("t"))
    return (
        counts.join(totals, "src")
        .select(
            F.col("src").alias("from_event"),
            F.col("dst").alias("to_event"),
            "c",
            F.expr("c * 1000000 div t").alias("cond_ppm"),
        )
        .orderBy("from_event", "to_event")
    )


# ---------------------------------------------------------------------------
# Robust anomaly detection — median absolute deviation (MAD) over
# daily activity: flag days whose event volume deviates from the
# per-type median by more than k * MAD. MAD is the robust scale
# estimator (outliers cannot inflate it the way they inflate a
# stddev), and on integer daily counts both the median and the MAD
# are exact in both engines.
# ---------------------------------------------------------------------------
@register(
    "ev_anomaly_mad",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    med AS (
      SELECT event_type, CAST(FLOOR(median(n)) AS BIGINT) AS med_n FROM daily
      GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.day, d.n, m.med_n, ABS(d.n - m.med_n) AS ad
      FROM daily d JOIN med m ON m.event_type = d.event_type
    ),
    mad AS (
      SELECT event_type, CAST(FLOOR(median(ad)) AS BIGINT) AS mad_n FROM dev
      GROUP BY event_type
    )
    SELECT dev.event_type, CAST(day AS VARCHAR) AS day, CAST(n AS BIGINT) AS n,
           med_n, mad.mad_n
    FROM dev JOIN mad ON mad.event_type = dev.event_type
    WHERE ABS(n - med_n) > 3 * mad.mad_n
    ORDER BY dev.event_type, day
    """,
    doc="Robust daily-volume anomaly detection: per-type median and "
    "MAD over daily counts (interpolated medians floored to exact "
    "integers so even day-counts cannot round differently across "
    "engines), days beyond "
    "3 x MAD flagged — the monitoring rollup that survives the very "
    "outliers it hunts.",
    tags=("events", "quality"),
)
def ev_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose event volume is a 3-MAD outlier for their type.

    Scale: two small aggregations over the (type, day) rollup —
    the daily table is |types| x |days|, so the median/MAD windows
    run over tiny groups regardless of event volume; all heavy
    lifting is the first map-side-combined daily count."""
    daily = (
        spark.table("events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    med = daily.groupBy("event_type").agg(
        F.floor(F.median("n")).cast("long").alias("med_n")
    )
    dev = daily.join(med, "event_type").withColumn(
        "ad", F.abs(F.col("n") - F.col("med_n"))
    )
    mad = dev.groupBy("event_type").agg(
        F.floor(F.median("ad")).cast("long").alias("mad_n")
    )
    return (
        dev.join(mad, "event_type")
        .filter(F.abs(F.col("n") - F.col("med_n")) > 3 * F.col("mad_n"))
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.col("n").cast("long").alias("n"),
            "med_n",
            "mad_n",
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# 17. EWMA smoothing: exponentially weighted moving average over each
#     type's daily-volume series. The recurrence s_t = (1-a)*s_{t-1}
#     + a*x_t is inherently sequential — the classic "SQL can't do
#     time-series" claim — but it IS a left fold, so a higher-order
#     aggregate over the day-ordered array computes it exactly:
#     Spark F.aggregate and DuckDB list_reduce execute the identical
#     operation sequence over identical doubles (integer daily counts
#     are exact), making the result BIT-identical across engines with
#     no rounding hedge.
# ---------------------------------------------------------------------------
_EWMA_ALPHA = 0.25  # exactly representable in binary (2^-2)


@register(
    "ev_ewma_smoothing",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    arr AS (
      SELECT event_type,
             list(CAST(n AS DOUBLE) ORDER BY day) AS vals,
             MIN(day) AS first_day, MAX(day) AS last_day
      FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(len(vals) AS BIGINT) AS n_days,
           CAST(vals[len(vals)] AS DOUBLE) AS last_n,
           list_reduce(vals, (acc, x) -> acc * {1 - _EWMA_ALPHA} + x * {_EWMA_ALPHA}) AS ewma,
           CAST(first_day AS VARCHAR) AS first_day,
           CAST(last_day AS VARCHAR) AS last_day
    FROM arr ORDER BY event_type
    """,
    doc="EWMA smoothing of per-type daily volumes via a higher-order "
    "left fold over the day-ordered series — sequential recurrences "
    "expressed declaratively; the fold order is pinned, so the "
    "doubles are bit-identical across engines.",
    tags=("events", "timeseries", "bench"),
)
def ev_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA level of each event type's daily count series.

    Scale: the heavy work is the map-side-combined daily count
    (|types| x |days| rows out); the fold runs over one per-type
    array of bounded length (days in retention), partitioned by
    type — never a data-sized window. At 100 TB the daily rollup is
    the standard incremental table and the fold re-runs only on the
    tail partition."""
    daily = (
        spark.table("events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    arr = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("day", F.col("n").cast("double").alias("n")))
        ).alias("s"),
        F.min("day").alias("first_day_d"),
        F.max("day").alias("last_day_d"),
    )
    vals = F.transform(F.col("s"), lambda r: r["n"])
    # list_reduce seeds with the first element; mirror that exactly.
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1 - _EWMA_ALPHA) + x * F.lit(_EWMA_ALPHA),
    )
    return arr.select(
        "event_type",
        F.size(vals).cast("long").alias("n_days"),
        F.element_at(vals, F.size(vals)).alias("last_n"),
        ewma.alias("ewma"),
        F.col("first_day_d").cast("string").alias("first_day"),
        F.col("last_day_d").cast("string").alias("last_day"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# 18. Rolling distinct users: exact 7-day sliding (1-day step) active
#     users per window. Sliding DISTINCT cannot reuse tumbling
#     partials (users span windows), so each event is assigned to
#     every window covering it map-side (explode of at most 7 window
#     starts) and the per-window distinct is one aggregation — the
#     standard exact formulation; the approximate path would swap the
#     distinct for an HLL sketch merge (micro_hll_sketch_merge).
# ---------------------------------------------------------------------------
_ROLL_DAYS = 7


@register(
    "ev_rolling_distinct_users",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    bounds AS (SELECT MIN(day) AS d0 FROM days),
    assigned AS (
      SELECT user_id,
             unnest(range(
               GREATEST(datediff('day', d0, day) - {_ROLL_DAYS - 1}, 0),
               datediff('day', d0, day) + 1)) AS w
      FROM days CROSS JOIN bounds
    )
    SELECT CAST(w AS BIGINT) AS window_start_off,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM assigned
    GROUP BY w ORDER BY w
    """,
    doc=f"Exact {_ROLL_DAYS}-day rolling distinct active users, "
    "1-day step: each (day, user) pair fans out map-side to the "
    f"<= {_ROLL_DAYS} windows covering it, then ONE distinct "
    "aggregation per window — no per-window scan, no self-join; "
    "window ids are day offsets from the corpus start.",
    tags=("events", "window", "bench"),
)
def ev_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per 7-day rolling window (window = offset of
    its LAST day from the first day in the data).

    Scale: the fan-out multiplies the (day, user) rollup — already
    tiny relative to events — by at most 7; the distinct aggregation
    shuffles (window, user) pairs once. The sketch variant (HLL
    merge) replaces exactness when user cardinality per window
    exceeds memory comfort."""
    days = (
        spark.table("events")
        .select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    d0 = days.agg(F.min("day").alias("d0"))
    off = F.datediff(F.col("day"), F.col("d0"))
    assigned = (
        days.crossJoin(F.broadcast(d0))
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.greatest(off - (_ROLL_DAYS - 1), F.lit(0)), off
                )
            ).alias("w"),
        )
    )
    return (
        assigned.groupBy("w")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.col("w").cast("long").alias("window_start_off"), "n_users"
        )
        .orderBy("window_start_off")
    )


# ---------------------------------------------------------------------------
# 19. DYNAMIC-gap session windows: the inactivity timeout varies per
#     event (a purchase closes its session after 2h; everything else
#     gets 6h) — F.session_window with a gap COLUMN. Unlike the
#     fixed-gap case, session ends are no longer monotone in ts, so
#     the oracle's islands pass needs a RUNNING MAX of (ts + gap)
#     rather than LAG: a new session starts iff the event begins at
#     or after every previous window's end (Spark merges overlapping
#     [ts, ts+gap) windows).
# ---------------------------------------------------------------------------
@register(
    "ev_session_dynamic_gap",
    oracle="""
    WITH e AS (
      SELECT user_id, ts,
             CASE WHEN event_type = 'purchase' THEN INTERVAL '2 hours'
                  ELSE INTERVAL '6 hours' END AS g
      FROM events WHERE user_id < 40
    ),
    o AS (
      SELECT user_id, ts, g,
             MAX(ts + g) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_end
      FROM e
    ),
    s AS (
      SELECT user_id, ts, g,
             CASE WHEN prev_end IS NULL OR ts >= prev_end THEN 1 ELSE 0 END AS is_new
      FROM o
    ),
    sid AS (
      SELECT user_id, ts, g,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS session_id
      FROM s
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts + g) AS session_end,
           COUNT(*) AS n_events
    FROM sid
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="Dynamic-gap session windows (F.session_window with a gap "
    "COLUMN: purchases time out after 2h, other events after 6h); "
    "the oracle's islands pass uses a running MAX of per-event ends "
    "because dynamic ends are not monotone — a new session starts "
    "only past every previous window's end.",
    tags=("events", "window", "bench"),
)
def ev_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions under event-dependent inactivity timeouts.

    Scale: identical execution shape to the fixed-gap session window
    (shuffle on user_id, in-state merge); the gap column is
    evaluated map-side. The same expression runs under readStream
    with a watermark."""
    ev = spark.table("events").filter(F.col("user_id") < 40)
    gap = F.when(F.col("event_type") == "purchase", "2 hours").otherwise(
        "6 hours"
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# 20. Seasonality profile: day-of-week volume shape per event type,
#     with an integer-exact deviation score (how far each weekday
#     strays from a uniform week: |7*n_dow - total| summed) — the
#     weekly-pattern diagnostic behind staffing/capacity rollups.
#     dayofweek numbering differs across engines (Spark: 1=Sunday;
#     DuckDB: 0=Sunday), so the key is ISO dayname, identical in
#     both.
# ---------------------------------------------------------------------------
@register(
    "ev_seasonality_profile",
    oracle="""
    WITH dow AS (
      SELECT event_type, dayname(CAST(ts AS DATE)) AS dow, COUNT(*) AS n
      FROM events GROUP BY event_type, dayname(CAST(ts AS DATE))
    ),
    tot AS (SELECT event_type, SUM(n) AS total FROM dow GROUP BY event_type)
    SELECT dow.event_type, dow.dow, CAST(dow.n AS BIGINT) AS n,
           CAST(ABS(7 * dow.n - tot.total) AS BIGINT) AS uniform_dev
    FROM dow JOIN tot ON tot.event_type = dow.event_type
    ORDER BY dow.event_type, dow.dow
    """,
    doc="Weekly seasonality profile: per-type day-of-week volumes "
    "plus the integer-exact deviation |7*n_dow - total| from a "
    "uniform week; keyed by day NAME because the engines disagree on "
    "weekday numbering (Spark 1=Sunday, DuckDB 0=Sunday) but not on "
    "names.",
    tags=("events", "timeseries"),
)
def ev_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week volume shape and uniformity deviation per type.

    Scale: one map-side-combined (type, dow) count — at most
    7 x |types| rows out of any event volume; the deviation join is
    against the |types|-row totals."""
    dow = (
        spark.table("events")
        .groupBy(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "EEEE").alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = dow.groupBy("event_type").agg(F.sum("n").alias("total"))
    return (
        dow.join(tot, "event_type")
        .select(
            "event_type",
            "dow",
            F.col("n").cast("long").alias("n"),
            F.abs(7 * F.col("n") - F.col("total")).cast("long").alias("uniform_dev"),
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------------
# 21. Rolling distinct via DAILY HLL SKETCHES: the production form of
#     ev_rolling_distinct_users. The exact op fans every (day, user)
#     pair into its 7 windows; this one builds ONE fixed-size sketch
#     per day and answers each window by unioning 7 sketch rows —
#     the incremental pattern that keeps a 100 TB rolling-MAU rollup
#     at |days| stored kilobytes. Sketch bytes are engine-specific,
#     so the oracle asserts the 5%-accuracy property against the
#     exact count, which rides along as real differential content
#     (the micro_hll_sketch_merge contract).
# ---------------------------------------------------------------------------
@register(
    "ev_rolling_users_hll",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    bounds AS (SELECT MIN(day) AS d0 FROM days),
    assigned AS (
      SELECT user_id,
             unnest(range(
               GREATEST(datediff('day', d0, day) - {_ROLL_DAYS - 1}, 0),
               datediff('day', d0, day) + 1)) AS w
      FROM days CROSS JOIN bounds
    )
    SELECT CAST(w AS BIGINT) AS window_start_off,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_within_5pct
    FROM assigned
    GROUP BY w ORDER BY w
    """,
    doc=f"Rolling {_ROLL_DAYS}-day distinct users from DAILY HLL "
    "sketches (hll_sketch_agg per day, hll_union_agg per window): "
    "windows read 7 kilobyte-sized sketch rows instead of fanning "
    "raw (day, user) pairs — the incremental rolling-MAU plan; the "
    "estimate is asserted within 5% of the exact count, which rides "
    "along as differential content.",
    tags=("events", "window", "sketch"),
)
def ev_rolling_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-estimated rolling distinct users with accuracy proof.

    Scale: the daily sketch table is |days| rows of ~KB sketches
    (built with one map-side-combined pass); every window unions at
    most 7 of them. The exact branch exists only to prove the
    estimate; production keeps the sketch path alone."""
    days = (
        spark.table("events")
        .select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    d0 = days.agg(F.min("day").alias("d0"))
    base = days.crossJoin(F.broadcast(d0)).withColumn(
        "off", F.datediff(F.col("day"), F.col("d0"))
    )
    daily_sk = base.groupBy("off").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    # Day `off` belongs to windows [off-6, off] (clamped at 0): the
    # same backward fan as the exact branch, so window w = days
    # [w, w+6] — "window_start_off" is literally the start day.
    assigned = daily_sk.select(
        F.explode(
            F.sequence(
                F.greatest(F.col("off") - (_ROLL_DAYS - 1), F.lit(0)),
                F.col("off"),
            )
        ).alias("w"),
        "sk",
    )
    est = assigned.groupBy("w").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = base.withColumn(
        "w",
        F.explode(
            F.sequence(
                F.greatest(F.col("off") - (_ROLL_DAYS - 1), F.lit(0)),
                F.col("off"),
            )
        ),
    ).groupBy("w").agg(F.countDistinct("user_id").alias("exact_users"))
    return (
        est.join(exact, "w")
        .select(
            F.col("w").cast("long").alias("window_start_off"),
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= F.col("exact_users") * 0.05
            ).alias("est_within_5pct"),
        )
        .orderBy("window_start_off")
    )


# ---------------------------------------------------------------------------
# Last-touch attribution (round 7): every purchase is credited to the
# user's most recent click/view at or before it (a same-instant touch
# sorts ahead of the conversion, so it qualifies) within the
# attribution window — the standard marketing-analytics operator,
# and a second consumer of the as-of composition (union + carry-last
# over one user-keyed window; operators/temporal.py documents the
# shape). Purchases with no qualifying touch land in the 'none'
# bucket so the rollup partitions conversions exactly.
# ---------------------------------------------------------------------------
_ATTR_WINDOW_US = 7 * 86_400 * 1_000_000  # 7 days


@register(
    "ev_attribution_last_touch",
    oracle=f"""
    WITH pts AS (
      SELECT user_id, epoch_us(ts) AS t, event_id, value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv,
             CASE WHEN event_type IN ('click', 'view') THEN event_type END AS touch
      FROM events
      WHERE event_type IN ('purchase', 'click', 'view')
    ),
    carried AS (
      SELECT user_id, t, event_id, value, is_conv,
             last_value(touch IGNORE NULLS) OVER w AS last_touch,
             last_value(CASE WHEN touch IS NOT NULL THEN t END IGNORE NULLS)
               OVER w AS last_touch_t
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY t, is_conv, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    conv AS (
      SELECT CASE WHEN last_touch IS NOT NULL
                   AND t - last_touch_t <= {_ATTR_WINDOW_US}
                  THEN last_touch ELSE 'none' END AS touch_type,
             value
      FROM carried WHERE is_conv = 1
    )
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           {sql_dsum("value")} AS sum_value
    FROM conv GROUP BY touch_type ORDER BY touch_type
    """,
    doc="Last-touch attribution: purchases credited to the user's "
    "most recent click/view at-or-before the purchase and within "
    "7 days; per-channel conversion counts and exact-decimal revenue, "
    "with unattributed purchases in the 'none' bucket. One user-keyed "
    "carry-last window — the as-of composition, no pair join.",
    tags=("events", "olap", "bench"),
)
def ev_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel attributed conversions.

    Scale: ONE shuffle on user_id and one in-partition sort (the
    as-of composition's contract, operators/temporal.py) — no
    touch x purchase candidate pairs ever materialize, which is what
    kills the naive correlated-subquery formulation at 100 TB. The
    strictly-before tie-break (touches sort ahead of a same-instant
    purchase; event_id last) is pinned in the window ordering so both
    engines pick the identical touch."""
    from pyspark.sql import Window

    from ..functions.compat import ts_micros

    pts = (
        spark.table("events")
        .filter(F.col("event_type").isin("purchase", "click", "view"))
        .select(
            "user_id",
            ts_micros(F.col("ts")).alias("t"),
            "event_id",
            "value",
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_conv"),
            F.when(
                F.col("event_type").isin("click", "view"), F.col("event_type")
            ).alias("touch"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_conv", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = pts.select(
        "t",
        "is_conv",
        "value",
        F.last("touch", ignorenulls=True).over(w).alias("last_touch"),
        F.last(
            F.when(F.col("touch").isNotNull(), F.col("t")), ignorenulls=True
        ).over(w).alias("last_touch_t"),
    )
    touch_type = F.when(
        F.col("last_touch").isNotNull()
        & (F.col("t") - F.col("last_touch_t") <= _ATTR_WINDOW_US),
        F.col("last_touch"),
    ).otherwise("none")
    return (
        carried.filter(F.col("is_conv") == 1)
        .select(touch_type.alias("touch_type"), "value")
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------------------
# Per-group OLS trend (round 8): closed-form least-squares slope and
# intercept of the daily event count against the day index, per event
# type — the "is this metric trending?" primitive every monitoring
# stack computes. All moments are exact BIGINT sums (counts and day
# indexes are integers), so the only floating-point work is ONE
# division per group at the very end — the same single-terminal-op
# discipline as the decimal-money aggregates, making the doubles
# bit-identical across engines.
# ---------------------------------------------------------------------------
@register(
    "ev_trend_ols",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(d * y) AS BIGINT) AS sxy,
             CAST(SUM(d * d) AS BIGINT) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT event_type, n AS n_days,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
           CAST(sy * sxx - sx * sxy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS intercept
    FROM m WHERE n * sxx - sx * sx <> 0
    ORDER BY event_type
    """,
    doc="Per-event-type OLS trend of daily counts: closed-form slope "
    "and intercept from exact integer moment sums (n, Sx, Sy, Sxy, "
    "Sxx), one double division per group at the end — bit-identical "
    "across engines by construction. Degenerate groups (a single "
    "day: zero variance) are excluded on both sides.",
    tags=("events", "timeseries", "bench"),
)
def ev_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count trend line per event type.

    Scale: one shuffle to (event_type, day) — partial-aggregated
    map-side — then a per-type rollup of five integer moments
    (map-side combine again; |types| rows). The regression itself is
    arithmetic on the tiny moment table. At 100 TB this is the
    pattern for ANY per-group linear fit: moments first, closed form
    after, never a per-group collect."""
    daily = (
        spark.table("events")
        .select(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("d") * F.col("y")).alias("sxy"),
        F.sum(F.col("d") * F.col("d")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        m.filter(den != 0)
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            (
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                / den.cast("double")
            ).alias("slope"),
            (
                (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast("double")
                / den.cast("double")
            ).alias("intercept"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Linear multi-touch attribution (round 8): the companion to
# ev_attribution_last_touch — every click/view in the 7-day window
# before a purchase shares the credit equally. Credit is EXACT
# integer basis points: each touch gets floor(1e4/n) and the
# remainder goes one-bp-each to the earliest touches (deterministic
# (t, event_id) order), so per-conversion credit always sums to
# exactly 1e4 and the differential check is integer-exact; revenue
# splits are decimal-exact with one terminal double division.
# ---------------------------------------------------------------------------
@register(
    "ev_attribution_linear",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS conv_id, user_id, epoch_us(ts) AS t, value
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS touch_id, user_id, epoch_us(ts) AS tt,
             event_type AS touch_type
      FROM events WHERE event_type IN ('click', 'view')
    ),
    pairs AS (
      SELECT p.conv_id, p.value, c.touch_type, c.tt, c.touch_id
      FROM p JOIN c ON c.user_id = p.user_id
        AND c.tt BETWEEN p.t - {_ATTR_WINDOW_US} AND p.t
    ),
    ranked AS (
      SELECT conv_id, value, touch_type,
             COUNT(*) OVER (PARTITION BY conv_id) AS n,
             ROW_NUMBER() OVER (PARTITION BY conv_id
                                ORDER BY tt, touch_id) AS r
      FROM pairs
    ),
    credits AS (
      SELECT touch_type, value,
             10000 // n
               + CASE WHEN r <= 10000 % n THEN 1 ELSE 0 END AS bp
      FROM ranked
      UNION ALL
      SELECT 'none', p.value, 10000
      FROM p WHERE NOT EXISTS (
        SELECT 1 FROM pairs WHERE pairs.conv_id = p.conv_id
      )
    )
    SELECT touch_type,
           CAST(SUM(bp) AS BIGINT) AS credit_bp,
           CAST(SUM(CAST(CAST(value AS DECIMAL(30,8)) * bp
                         AS DECIMAL(38,8))) AS DOUBLE) / 10000
             AS attributed_value
    FROM credits GROUP BY touch_type ORDER BY touch_type
    """,
    doc="Linear multi-touch attribution: every click/view in the "
    "7-day pre-purchase window shares the conversion credit equally "
    "— integer basis-point credit with the remainder to the "
    "earliest touches (per-conversion credit sums to exactly 1e4; "
    "bp rather than ppm keeps the scaled decimal revenue sum inside "
    "the magnitude envelope where decimal->double conversion is "
    "engine-consistent), revenue split decimal-exact. Pairs form in the bucketed interval join "
    "(canonical-bucket, no inequality nested loop); unattributed "
    "purchases land whole in the 'none' bucket.",
    tags=("events", "olap", "bench"),
)
def ev_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel linear-attributed credit and revenue.

    Scale: candidate pairs form in interval_overlap_join's bucketed
    equi-join (each conversion window spans <= 2 buckets; no
    unbounded inequality join reaches the planner); the per-
    conversion share needs one window over the pair set — pair-
    volume-sized, duplicate-bounded by touches-per-user-week, orders
    below the event count. Credit math is integer; the final rollup
    is |channels| rows."""
    from pyspark.sql import Window

    from ..functions.compat import ts_micros
    from ..operators.temporal import interval_overlap_join

    ev = spark.table("events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("conv_id"),
            ts_micros("ts").alias("conv_t"),
            F.col("value").alias("conv_value"),
        )
        .withColumn("_s", F.col("conv_t") - F.lit(_ATTR_WINDOW_US))
        .withColumn("_e", F.col("conv_t") + F.lit(1))
    )
    c = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .select(
            "user_id",
            F.col("event_id").alias("touch_id"),
            F.col("event_type").alias("touch_type"),
            ts_micros("ts").alias("touch_t"),
        )
        .withColumn("_s", F.col("touch_t"))
        .withColumn("_e", F.col("touch_t") + F.lit(1))
    )
    pairs = interval_overlap_join(
        p, c, bucket_us=_ATTR_WINDOW_US + 1_000_000
    ).select("conv_id", "conv_value", "touch_type", "touch_t", "touch_id")
    wn = Window.partitionBy("conv_id")
    wr = Window.partitionBy("conv_id").orderBy("touch_t", "touch_id")
    ranked = pairs.select(
        "conv_id",
        "conv_value",
        "touch_type",
        F.count(F.lit(1)).over(wn).alias("n"),
        F.row_number().over(wr).alias("r"),
    )
    credited = ranked.select(
        "touch_type",
        F.col("conv_value").alias("value"),
        (
            F.expr("10000 div n")
            + F.when(F.col("r") <= F.expr("10000 % n"), 1).otherwise(0)
        ).cast("long").alias("bp"),
    )
    unattributed = (
        p.join(pairs.select("conv_id").distinct(), "conv_id", "left_anti")
        .select(
            F.lit("none").alias("touch_type"),
            F.col("conv_value").alias("value"),
            F.lit(10_000).cast("long").alias("bp"),
        )
    )
    return (
        credited.unionByName(unattributed)
        .groupBy("touch_type")
        .agg(
            F.sum("bp").cast("long").alias("credit_bp"),
            (
                F.sum(
                    (F.col("value").cast("decimal(30,8)") * F.col("bp")).cast(
                        "decimal(38,8)"
                    )
                ).cast("double")
                / F.lit(10_000)
            ).alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------------------
# Position-based (U-shaped) attribution (round 8): the third member
# of the attribution family — 40% of the credit to the FIRST touch,
# 40% to the LAST, the remaining 20% split equally over the middle
# touches. Same exact-integer-basis-point discipline as linear:
# deterministic per-position credits that always sum to exactly 1e4
# per conversion (n=1 -> 1e4; n=2 -> 5000/5000; middle remainder to
# the earliest middles), so the comparison never touches a float
# until the single terminal revenue division.
# ---------------------------------------------------------------------------
def _ushape_bp_sql(n: str, r: str) -> str:
    """DuckDB CASE for the per-touch basis-point credit at rank r of n."""
    return f"""CASE
      WHEN {n} = 1 THEN 10000
      WHEN {n} = 2 THEN 5000
      WHEN {r} = 1 THEN 4000
      WHEN {r} = {n} THEN 4000
      ELSE 2000 // ({n} - 2)
           + CASE WHEN {r} - 1 <= 2000 % ({n} - 2) THEN 1 ELSE 0 END
    END"""


@register(
    "ev_attribution_ushape",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS conv_id, user_id, epoch_us(ts) AS t, value
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS touch_id, user_id, epoch_us(ts) AS tt,
             event_type AS touch_type
      FROM events WHERE event_type IN ('click', 'view')
    ),
    pairs AS (
      SELECT p.conv_id, p.value, c.touch_type, c.tt, c.touch_id
      FROM p JOIN c ON c.user_id = p.user_id
        AND c.tt BETWEEN p.t - {_ATTR_WINDOW_US} AND p.t
    ),
    ranked AS (
      SELECT conv_id, value, touch_type,
             COUNT(*) OVER (PARTITION BY conv_id) AS n,
             ROW_NUMBER() OVER (PARTITION BY conv_id
                                ORDER BY tt, touch_id) AS r
      FROM pairs
    ),
    credits AS (
      SELECT touch_type, value, {_ushape_bp_sql("n", "r")} AS bp
      FROM ranked
      UNION ALL
      SELECT 'none', p.value, 10000
      FROM p WHERE NOT EXISTS (
        SELECT 1 FROM pairs WHERE pairs.conv_id = p.conv_id
      )
    )
    SELECT touch_type,
           CAST(SUM(bp) AS BIGINT) AS credit_bp,
           CAST(SUM(CAST(CAST(value AS DECIMAL(30,8)) * bp
                         AS DECIMAL(38,8))) AS DOUBLE) / 10000
             AS attributed_value
    FROM credits GROUP BY touch_type ORDER BY touch_type
    """,
    doc="Position-based (U-shaped) attribution: 40% first touch, "
    "40% last, 20% equally over the middle touches — exact integer "
    "basis points with deterministic remainders (per-conversion "
    "credit is exactly 1e4 for every n), over the same "
    "bucketed-interval pair set as the linear model.",
    tags=("events", "olap", "bench"),
)
def ev_attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel U-shaped credit and revenue.

    Scale: identical plan shape to ev_attribution_linear (bucketed
    interval join, one pair-sized window, |channels| output rows);
    only the per-position credit CASE differs — which is the point:
    the attribution family shares one physical strategy."""
    from pyspark.sql import Window

    from ..functions.compat import ts_micros
    from ..operators.temporal import interval_overlap_join

    ev = spark.table("events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("conv_id"),
            ts_micros("ts").alias("conv_t"),
            F.col("value").alias("conv_value"),
        )
        .withColumn("_s", F.col("conv_t") - F.lit(_ATTR_WINDOW_US))
        .withColumn("_e", F.col("conv_t") + F.lit(1))
    )
    c = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .select(
            "user_id",
            F.col("event_id").alias("touch_id"),
            F.col("event_type").alias("touch_type"),
            ts_micros("ts").alias("touch_t"),
        )
        .withColumn("_s", F.col("touch_t"))
        .withColumn("_e", F.col("touch_t") + F.lit(1))
    )
    pairs = interval_overlap_join(
        p, c, bucket_us=_ATTR_WINDOW_US + 1_000_000
    ).select("conv_id", "conv_value", "touch_type", "touch_t", "touch_id")
    wn = Window.partitionBy("conv_id")
    wr = Window.partitionBy("conv_id").orderBy("touch_t", "touch_id")
    ranked = pairs.select(
        "conv_id",
        "conv_value",
        "touch_type",
        F.count(F.lit(1)).over(wn).alias("n"),
        F.row_number().over(wr).alias("r"),
    )
    bp = (
        F.when(F.col("n") == 1, 10_000)
        .when(F.col("n") == 2, 5_000)
        .when(F.col("r") == 1, 4_000)
        .when(F.col("r") == F.col("n"), 4_000)
        .otherwise(
            F.expr("2000 div (n - 2)")
            + F.when(F.col("r") - 1 <= F.expr("2000 % (n - 2)"), 1).otherwise(0)
        )
    )
    credited = ranked.select(
        "touch_type",
        F.col("conv_value").alias("value"),
        bp.cast("long").alias("bp"),
    )
    unattributed = (
        p.join(pairs.select("conv_id").distinct(), "conv_id", "left_anti")
        .select(
            F.lit("none").alias("touch_type"),
            F.col("conv_value").alias("value"),
            F.lit(10_000).cast("long").alias("bp"),
        )
    )
    return (
        credited.unionByName(unattributed)
        .groupBy("touch_type")
        .agg(
            F.sum("bp").cast("long").alias("credit_bp"),
            (
                F.sum(
                    (F.col("value").cast("decimal(30,8)") * F.col("bp")).cast(
                        "decimal(38,8)"
                    )
                ).cast("double")
                / F.lit(10_000)
            ).alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing (round 8): double exponential smoothing
# of the per-type daily count series — the EWMA operator's big
# sibling, carrying a trend term so it can FORECAST, not just smooth
# (Holt 1957; the standard recurrence from Hyndman & Athanasopoulos,
# "Forecasting: Principles and Practice" §8.2). The recurrence is
# inherently sequential per series, so the scale-safe formulation is
# the same one ev_ewma_smoothing pinned: fold over ONE bounded
# day-ordered array per group, never a data-sized window. Alpha/beta
# are dyadic (0.5 / 0.25) so every multiply is exact in binary
# floating point and the recursion stays bit-identical cross-engine.
# ---------------------------------------------------------------------------
_HOLT_ALPHA = 0.5  # level gain (dyadic: exact double)
_HOLT_BETA = 0.25  # trend gain (dyadic: exact double)
_HOLT_H = 7  # forecast horizon, days


@register(
    "ev_holt_linear",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    seq AS (
      SELECT event_type, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    rec AS (
      SELECT s1.event_type, 1 AS rn, s1.n, s1.y AS l, s2.y - s1.y AS b
      FROM seq s1 JOIN seq s2
        ON s2.event_type = s1.event_type AND s2.rn = 2
      WHERE s1.rn = 1
      UNION ALL
      SELECT r.event_type, r.rn + 1, r.n,
             {_HOLT_ALPHA} * s.y + {1 - _HOLT_ALPHA} * (r.l + r.b),
             {_HOLT_BETA} * (({_HOLT_ALPHA} * s.y
                              + {1 - _HOLT_ALPHA} * (r.l + r.b)) - r.l)
               + {1 - _HOLT_BETA} * r.b
      FROM rec r JOIN seq s
        ON s.event_type = r.event_type AND s.rn = r.rn + 1
      WHERE r.rn < r.n
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
           ROUND(l + {_HOLT_H} * b, 6) AS forecast_h
    FROM rec WHERE rn = n AND n >= 2
    ORDER BY event_type
    """,
    doc="Holt double exponential smoothing per event type: level and "
    f"trend recurrence (alpha={_HOLT_ALPHA}, beta={_HOLT_BETA}) over "
    "the day-ordered daily-count series as a declarative in-engine "
    f"fold, plus the {_HOLT_H}-day-ahead linear forecast l + h*b. "
    "Oracle runs the identical recurrence as a recursive CTE; dyadic "
    "gains keep the doubles bit-identical across engines.",
    tags=("events", "timeseries", "forecast", "bench"),
)
def ev_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend state + h-step forecast per event type.

    Scale: identical envelope to ev_ewma_smoothing — the heavy work
    is the map-side-combined (type, day) rollup; the sequential
    recurrence folds over ONE per-type array bounded by the retention
    window (|days| elements, not |events|), partitioned by type. At
    100 TB the daily rollup is the incremental table and the fold
    re-runs on the bounded tail only. The classic init (l1 = y1,
    b1 = y2 - y1) then fold over y2..yn matches the oracle's
    recursion base/step exactly."""
    a = F.lit(_HOLT_ALPHA)
    one_a = F.lit(1 - _HOLT_ALPHA)
    bt = F.lit(_HOLT_BETA)
    one_bt = F.lit(1 - _HOLT_BETA)
    daily = (
        spark.table("events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    arr = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("day", "y"))
        ).alias("s"),
    )
    vals = F.transform(F.col("s"), lambda r: r["y"])

    def step(acc, x):
        l_new = a * x + one_a * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (bt * (l_new - acc["l"]) + one_bt * acc["b"]).alias("b"),
        )

    init = F.struct(
        F.element_at(vals, 1).alias("l"),
        (F.element_at(vals, 2) - F.element_at(vals, 1)).alias("b"),
    )
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        init,
        step,
    )
    return (
        arr.filter(F.size(vals) >= 2)
        .select(
            "event_type",
            F.size(vals).cast("long").alias("n_days"),
            F.round(fold["l"], 6).alias("level"),
            F.round(fold["b"], 6).alias("trend"),
            F.round(fold["l"] + F.lit(float(_HOLT_H)) * fold["b"], 6).alias(
                "forecast_h"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# 25. OHLC bars (round 8): the candlestick downsampling every
#     monitoring/market pipeline runs — per (event_type, day): the
#     first value (open), max (high), min (low) and last value
#     (close), plus the event count as volume. Unlike M4
#     (op_downsample_m4, which keeps the 4 EXTREME points for pixel-
#     perfect line rendering), OHLC keeps the 4 SEMANTIC points of the
#     interval. min_by/max_by over a (ts, event_id) struct key make
#     open/close deterministic under timestamp ties AND fully
#     partial-aggregatable — each map task emits one candidate per
#     bar, the merge picks the winner, so the shuffle carries one row
#     per (type, day) regardless of corpus size. The reference's
#     aggregate surface stops at plain min/max (physical_plan.rs
#     aggregates); ordered-selection aggregates are an extension.
# ---------------------------------------------------------------------------
@register(
    "ev_ohlc_bars",
    oracle="""
    WITH r AS (
      SELECT event_type, CAST(ts AS DATE) AS day, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume
    FROM r GROUP BY event_type, day
    ORDER BY event_type, day
    """,
    doc="OHLC candlestick bars per (event_type, day): open/close via "
    "min_by/max_by over a (ts, event_id) struct key (deterministic "
    "under timestamp ties), high/low plain extremes, count as volume. "
    "All five are partial-aggregatable, so the bar table shuffles one "
    "row per bar. Values are picked raw doubles (never summed) — "
    "bit-identical cross-engine by construction.",
    tags=("events", "timeseries", "bench"),
)
def ev_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type.

    Scale: one map-side-combined aggregation — min_by/max_by carry a
    single (key, value) candidate through the partial/merge phases,
    so the shuffle is bar-count-sized (types x days), independent of
    event volume. No window over the raw stream, no sort: the
    ordered-selection is inside the aggregate. At 100 TB this is the
    canonical first rollup a metrics store materializes
    incrementally per closing day."""
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        spark.table("events")
        .groupBy(
            "event_type",
            F.col("ts").cast("date").cast("string").alias("day"),
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).cast("long").alias("volume"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# 26. CUSUM changepoint detection (round 8, Page 1954): the classic
#     sequential drift detector over the per-type daily-count series —
#     s_i = max(0, s_{i-1} + (y_i - mean - slack)) upward and the
#     mirrored downward sum, alarm when a sum crosses the threshold.
#     Everything runs in SCALED INTEGER space (residual n*y_i - S has
#     exact mean 0; slack = S div 4, threshold = S div 2 in the same
#     scale), so the recurrence is integer arithmetic end-to-end and
#     the oracle's recursive CTE reproduces it bit-for-bit — no
#     stddev, no float accumulation order to drift.
# ---------------------------------------------------------------------------
@register(
    "ev_changepoint_cusum",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    seq AS (
      SELECT event_type, day, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(y) OVER (PARTITION BY event_type) AS s_tot
      FROM daily
    ),
    rec AS (
      SELECT event_type, rn, n, s_tot,
             GREATEST(0, (n * y - s_tot) - s_tot // 4) AS s,
             GREATEST(0, -(n * y - s_tot) - s_tot // 4) AS t,
             CASE WHEN GREATEST(0, (n * y - s_tot) - s_tot // 4) > s_tot // 2
                  THEN 1 ELSE 0 END AS npos,
             CASE WHEN GREATEST(0, -(n * y - s_tot) - s_tot // 4) > s_tot // 2
                  THEN 1 ELSE 0 END AS nneg,
             GREATEST(0, (n * y - s_tot) - s_tot // 4) AS maxs,
             GREATEST(0, -(n * y - s_tot) - s_tot // 4) AS maxt,
             CASE WHEN GREATEST(0, (n * y - s_tot) - s_tot // 4) > s_tot // 2
                  THEN day END AS first_day
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT r.event_type, r.rn + 1, r.n, r.s_tot,
             GREATEST(0, r.s + (r.n * q.y - r.s_tot) - r.s_tot // 4),
             GREATEST(0, r.t - (r.n * q.y - r.s_tot) - r.s_tot // 4),
             r.npos + CASE WHEN GREATEST(0, r.s + (r.n * q.y - r.s_tot)
                                 - r.s_tot // 4) > r.s_tot // 2
                           THEN 1 ELSE 0 END,
             r.nneg + CASE WHEN GREATEST(0, r.t - (r.n * q.y - r.s_tot)
                                 - r.s_tot // 4) > r.s_tot // 2
                           THEN 1 ELSE 0 END,
             GREATEST(r.maxs, GREATEST(0, r.s + (r.n * q.y - r.s_tot)
                                        - r.s_tot // 4)),
             GREATEST(r.maxt, GREATEST(0, r.t - (r.n * q.y - r.s_tot)
                                        - r.s_tot // 4)),
             COALESCE(r.first_day,
                      CASE WHEN GREATEST(0, r.s + (r.n * q.y - r.s_tot)
                                         - r.s_tot // 4) > r.s_tot // 2
                           THEN q.day END)
      FROM rec r JOIN seq q
        ON q.event_type = r.event_type AND q.rn = r.rn + 1
      WHERE r.rn < r.n
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(npos AS BIGINT) AS pos_alarm_days,
           CAST(nneg AS BIGINT) AS neg_alarm_days,
           CAST(maxs AS BIGINT) AS max_cusum_up,
           CAST(maxt AS BIGINT) AS max_cusum_down,
           CAST(first_day AS VARCHAR) AS first_up_alarm_day
    FROM rec WHERE rn = n
    ORDER BY event_type
    """,
    doc="Page's CUSUM changepoint detector per event type over the "
    "daily-count series: upward and downward cumulative sums with "
    "slack 25% and threshold 50% of the (integer-scaled) per-type "
    "mean; reports alarm-day counts, the max excursions and the "
    "first upward-alarm day. Scaled-integer recurrence == recursive "
    "CTE oracle bit-for-bit.",
    tags=("events", "timeseries", "anomaly", "bench"),
)
def ev_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift alarms per event type (integer-exact).

    Scale: the ev_holt_linear envelope — a map-side-combined
    (type, day) rollup, then one fold over the day-ordered per-type
    array (|days| elements, bounded by retention; never |events|).
    The scaled-integer formulation (residual n*y - S) avoids both a
    second variance pass and any float accumulation: mean-centering
    is exact, the fold is pure BIGINT arithmetic. At 100 TB the
    daily rollup is the incrementally maintained table; the detector
    re-folds only the monitored tail."""
    daily = (
        spark.table("events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    arr = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("rows"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s_tot"),
    )
    slack = F.expr("s_tot div 4")
    thresh = F.expr("s_tot div 2")
    n = F.col("n")
    s_tot = F.col("s_tot")
    zero = F.lit(0).cast("long")

    def step(acc, r):
        resid = n * r["y"] - s_tot
        s_new = F.greatest(zero, acc["s"] + resid - slack)
        t_new = F.greatest(zero, acc["t"] - resid - slack)
        up = s_new > thresh
        dn = t_new > thresh
        return F.struct(
            s_new.alias("s"),
            t_new.alias("t"),
            (acc["npos"] + F.when(up, 1).otherwise(0)).alias("npos"),
            (acc["nneg"] + F.when(dn, 1).otherwise(0)).alias("nneg"),
            F.greatest(acc["maxs"], s_new).alias("maxs"),
            F.greatest(acc["maxt"], t_new).alias("maxt"),
            F.coalesce(
                acc["first_day"], F.when(up, r["day"])
            ).alias("first_day"),
        )

    init = F.struct(
        zero.alias("s"),
        zero.alias("t"),
        zero.alias("npos"),
        zero.alias("nneg"),
        zero.alias("maxs"),
        zero.alias("maxt"),
        F.lit(None).cast("date").alias("first_day"),
    )
    fold = F.aggregate(F.col("rows"), init, step)
    return arr.select(
        "event_type",
        F.col("n").alias("n_days"),
        fold["npos"].cast("long").alias("pos_alarm_days"),
        fold["nneg"].cast("long").alias("neg_alarm_days"),
        fold["maxs"].cast("long").alias("max_cusum_up"),
        fold["maxt"].cast("long").alias("max_cusum_down"),
        fold["first_day"].cast("string").alias("first_up_alarm_day"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# 27. DAU/MAU stickiness (round 8): the product-analytics ratio —
#     distinct daily actives over distinct trailing-28-day actives,
#     per day, in exact integer ppm. Reuses the rolling-distinct
#     fan-out discipline (ev_rolling_distinct_users): each (day,
#     user) pair fans out map-side to the <= 28 windows it belongs
#     to, ONE distinct aggregation per window — no per-window
#     rescan, no self-join.
# ---------------------------------------------------------------------------
_STICKY_WIN = 28


@register(
    "ev_stickiness_dau_mau",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    bounds AS (
      SELECT MIN(day) AS d0,
             datediff('day', MIN(day), MAX(day)) AS max_off
      FROM days
    ),
    dau AS (
      SELECT datediff('day', d0, day) AS off,
             COUNT(DISTINCT user_id) AS dau
      FROM days CROSS JOIN bounds GROUP BY off
    ),
    fanout AS (
      SELECT user_id,
             unnest(range(datediff('day', d0, day),
                          LEAST(datediff('day', d0, day) + {_STICKY_WIN - 1},
                                max_off) + 1)) AS w
      FROM days CROSS JOIN bounds
    ),
    mau AS (
      SELECT w AS off, COUNT(DISTINCT user_id) AS mau
      FROM fanout GROUP BY w
    )
    SELECT CAST(d.off AS BIGINT) AS day_off,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(m.mau AS BIGINT) AS mau,
           CAST(d.dau * 1000000 // m.mau AS BIGINT) AS stickiness_ppm
    FROM dau d JOIN mau m ON m.off = d.off
    ORDER BY day_off
    """,
    doc=f"DAU/MAU stickiness per day (window={_STICKY_WIN}d): daily "
    "distinct actives over trailing-window distinct actives as exact "
    "integer ppm. Map-side fan-out of the (day, user) rollup to its "
    "covering windows, one distinct aggregation per window — the "
    "rolling-distinct discipline applied to the canonical "
    "product-analytics ratio.",
    tags=("events", "window", "bench"),
)
def ev_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day DAU, trailing-28d MAU and their ppm ratio.

    Scale: both aggregations run over the (day, user) distinct
    rollup — already orders of magnitude smaller than events — and
    the fan-out multiplies it by at most 28 BEFORE a distinct that
    shuffles (window, user) pairs once. The DAU/MAU join is
    day-count-sized. At 100 TB the rollup is the incrementally
    maintained table and each new day appends 28 fan-out targets."""
    days = (
        spark.table("events")
        .select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    d0 = days.agg(
        F.min("day").alias("d0"),
        F.datediff(F.max("day"), F.min("day")).alias("max_off"),
    )
    with_b = days.crossJoin(F.broadcast(d0))
    off = F.datediff(F.col("day"), F.col("d0"))
    dau = with_b.groupBy(off.alias("off")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    fanout = with_b.select(
        "user_id",
        F.explode(
            F.sequence(
                off,
                F.least(off + F.lit(_STICKY_WIN - 1), F.col("max_off")),
            )
        ).alias("w"),
    )
    mau = fanout.groupBy(F.col("w").alias("off")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return (
        dau.join(mau, "off")
        .select(
            F.col("off").cast("long").alias("day_off"),
            F.col("dau").cast("long").alias("dau"),
            F.col("mau").cast("long").alias("mau"),
            F.expr("dau * 1000000 div mau").alias("stickiness_ppm"),
        )
        .orderBy("day_off")
    )


# ---------------------------------------------------------------------------
# 28. Holt forecast backtest (round 8): walk-forward evaluation of
#     ev_holt_linear — at every day i >= 2 the model's one-step-ahead
#     forecast (l_{i-1} + b_{i-1}) is compared to the actual count,
#     accumulating the absolute error INSIDE the same fold that
#     advances the state. Counts are integers and the gains are
#     dyadic, so every level/trend/error value is an exact binary
#     fraction — the fold and the recursive-CTE oracle agree
#     bit-for-bit, error sums included. This is the forecast-model
#     acceptance test a production rollout runs per series.
# ---------------------------------------------------------------------------
@register(
    "ev_holt_backtest",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    seq AS (
      SELECT event_type, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    rec AS (
      SELECT s1.event_type, 1 AS rn, s1.n, s1.y AS l, s2.y - s1.y AS b,
             CAST(0 AS DOUBLE) AS sae, 0 AS n_fc
      FROM seq s1 JOIN seq s2
        ON s2.event_type = s1.event_type AND s2.rn = 2
      WHERE s1.rn = 1
      UNION ALL
      SELECT r.event_type, r.rn + 1, r.n,
             {_HOLT_ALPHA} * s.y + {1 - _HOLT_ALPHA} * (r.l + r.b),
             {_HOLT_BETA} * (({_HOLT_ALPHA} * s.y
                              + {1 - _HOLT_ALPHA} * (r.l + r.b)) - r.l)
               + {1 - _HOLT_BETA} * r.b,
             r.sae + ABS(s.y - (r.l + r.b)),
             r.n_fc + 1
      FROM rec r JOIN seq s
        ON s.event_type = r.event_type AND s.rn = r.rn + 1
      WHERE r.rn < r.n
    )
    SELECT event_type,
           CAST(n_fc AS BIGINT) AS n_forecasts,
           ROUND(sae, 6) AS sum_abs_err,
           ROUND(sae / n_fc, 6) AS mae
    FROM rec WHERE rn = n AND n >= 2
    ORDER BY event_type
    """,
    doc="Walk-forward backtest of the Holt model: one-step-ahead "
    "forecast l+b vs the actual daily count at every step, absolute "
    "errors accumulated inside the same state-advancing fold. "
    "Dyadic gains + integer counts keep state AND error sums exact "
    "binary fractions, so even the MAE hash-checks bit-for-bit "
    "against the recursive-CTE oracle.",
    tags=("events", "timeseries", "forecast", "bench"),
)
def ev_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead MAE of the Holt model per event type.

    Scale: the ev_holt_linear envelope exactly — the error
    accumulation adds two struct fields to the same bounded
    per-type fold, zero extra passes. This is how a forecasting
    deployment scores candidate smoothing configs across millions
    of series in one job: the fold is per-series, the scoring is
    inside it."""
    a = F.lit(_HOLT_ALPHA)
    one_a = F.lit(1 - _HOLT_ALPHA)
    bt = F.lit(_HOLT_BETA)
    one_bt = F.lit(1 - _HOLT_BETA)
    daily = (
        spark.table("events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    arr = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("s"),
    )
    vals = F.transform(F.col("s"), lambda r: r["y"])

    def step(acc, x):
        fc = acc["l"] + acc["b"]
        l_new = a * x + one_a * fc
        return F.struct(
            l_new.alias("l"),
            (bt * (l_new - acc["l"]) + one_bt * acc["b"]).alias("b"),
            (acc["sae"] + F.abs(x - fc)).alias("sae"),
            (acc["n_fc"] + F.lit(1)).alias("n_fc"),
        )

    init = F.struct(
        F.element_at(vals, 1).alias("l"),
        (F.element_at(vals, 2) - F.element_at(vals, 1)).alias("b"),
        F.lit(0.0).alias("sae"),
        F.lit(0).alias("n_fc"),
    )
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        init,
        step,
    )
    return (
        arr.filter(F.size(vals) >= 2)
        .select(
            "event_type",
            fold["n_fc"].cast("long").alias("n_forecasts"),
            F.round(fold["sae"], 6).alias("sum_abs_err"),
            F.round(fold["sae"] / fold["n_fc"], 6).alias("mae"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# 29. Top user paths (round 8): clickstream path analysis — each
#     user's first-5-event-type journey (deterministic (ts,
#     event_id) order), rolled up to pattern frequencies. The rank
#     pre-cut keeps only 5 rows per user BEFORE any collection
#     (WindowGroupLimit pushes it map-side), so path assembly never
#     buffers a whale user's full history.
# ---------------------------------------------------------------------------
_PATH_LEN = 5
_PATH_TOPN = 20


@register(
    "ev_top_paths",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             array_to_string(list(event_type ORDER BY rn), '>') AS path
      FROM ranked WHERE rn <= {_PATH_LEN}
      GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT {_PATH_TOPN}
    """,
    doc=f"Top-{_PATH_TOPN} user journeys: each user's first-"
    f"{_PATH_LEN} event types in deterministic (ts, event_id) order "
    "joined with '>', rolled up to pattern frequencies. The rank "
    "pre-cut bounds per-user state to 5 rows before assembly "
    "(WindowGroupLimit fires map-side), so whale histories never "
    "buffer.",
    tags=("events", "funnel"),
)
def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common first-5-step event-type journeys.

    Scale: the per-user rank is the only event-volume window and it
    carries the WindowGroupLimit pre-cut (each map task emits at
    most 5 rows per user before the exchange); path assembly then
    runs on <= 5 rows per user, and the frequency rollup keys on
    the path string. The final top-N is a TakeOrdered, not a global
    sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = (
        spark.table("events")
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PATH_LEN)
    )
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(_PATH_TOPN)
    )


# ---------------------------------------------------------------------------
# 30. Growth accounting (round 8): the canonical WAU decomposition —
#     each week's active users split into NEW (first week ever),
#     RETAINED (active previous week) and RESURRECTED (active before,
#     not last week), with CHURNED = last week's actives who went
#     silent. The bookkeeping identity wau = new + retained +
#     resurrected and wau - prev_wau = new + resurrected - churned
#     holds exactly in integers — the conservation law the report is
#     trusted for.
# ---------------------------------------------------------------------------
@register(
    "ev_growth_accounting",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS week, user_id
      FROM events
    ),
    lagged AS (
      SELECT week, user_id,
             LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_wk
      FROM wk
    ),
    classified AS (
      SELECT week, user_id,
             CASE WHEN prev_wk IS NULL THEN 'new'
                  WHEN prev_wk = week - INTERVAL '7 days' THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM lagged
    ),
    churn AS (
      SELECT CAST(l.week + INTERVAL '7 days' AS DATE) AS week,
             COUNT(*) AS churned
      FROM lagged l
      WHERE NOT EXISTS (
        SELECT 1 FROM wk n
        WHERE n.user_id = l.user_id
          AND n.week = l.week + INTERVAL '7 days'
      )
      AND l.week < (SELECT MAX(week) FROM wk)
      GROUP BY 1
    )
    SELECT CAST(c.week AS VARCHAR) AS week,
           CAST(COUNT(*) AS BIGINT) AS wau,
           CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
                AS BIGINT) AS retained,
           CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
                AS BIGINT) AS resurrected,
           CAST(COALESCE(MAX(ch.churned), 0) AS BIGINT) AS churned
    FROM classified c LEFT JOIN churn ch ON ch.week = c.week
    GROUP BY c.week
    ORDER BY c.week
    """,
    doc="Growth accounting: weekly actives decomposed into new / "
    "retained / resurrected, with churn (prior week's actives gone "
    "silent) — the canonical product-growth report. Integer "
    "conservation holds exactly: wau = new + retained + resurrected "
    "and wau - prev_wau = new + resurrected - churned.",
    tags=("events", "window", "funnel"),
)
def ev_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly new/retained/resurrected/churned decomposition.

    Scale: everything runs on the (week, user) distinct rollup —
    orders of magnitude under event volume. Classification is one
    lag window partitioned by user; churn is an anti-join of last
    week's actives against this week's (here via the same lagged
    table, no second scan). At 100 TB the weekly rollup is the
    incrementally maintained table and each new week classifies
    against one window step."""
    wk = (
        spark.table("events")
        .select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
            "user_id",
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("week")
    lagged = wk.withColumn("prev_wk", F.lag("week").over(w))
    classified = lagged.select(
        "week",
        "user_id",
        F.when(F.col("prev_wk").isNull(), "new")
        .when(
            F.col("prev_wk") == F.date_sub(F.col("week"), 7), "retained"
        )
        .otherwise("resurrected")
        .alias("status"),
    )
    max_wk = wk.agg(F.max("week").alias("mx"))
    nxt = wk.select(
        F.date_sub(F.col("week"), 7).alias("week"),
        F.col("user_id").alias("n_user"),
    )
    churn = (
        wk.crossJoin(F.broadcast(max_wk))
        .filter(F.col("week") < F.col("mx"))
        .join(
            nxt,
            (wk["user_id"] == nxt["n_user"]) & (wk["week"] == nxt["week"]),
            "left_anti",
        )
        .groupBy(F.date_add(F.col("week"), 7).alias("week"))
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    return (
        classified.groupBy("week")
        .agg(
            F.count(F.lit(1)).cast("long").alias("wau"),
            F.sum(F.when(F.col("status") == "new", 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
            F.sum(F.when(F.col("status") == "retained", 1).otherwise(0))
            .cast("long")
            .alias("retained"),
            F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0))
            .cast("long")
            .alias("resurrected"),
        )
        .join(churn, "week", "left")
        .select(
            F.col("week").cast("string").alias("week"),
            "wau",
            "new_users",
            "retained",
            "resurrected",
            F.coalesce(F.col("churned"), F.lit(0))
            .cast("long")
            .alias("churned"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# 31. Inter-arrival profile (round 8): the distribution of per-user
#     gaps between consecutive events, per event type — the metric
#     that calibrates session-gap thresholds (ev_session_windows'
#     6h/dynamic gaps) and streaming watermark delays from DATA
#     instead of folklore. Exact p50/p90 via the histogram-selection
#     discipline over integer gap-seconds.
# ---------------------------------------------------------------------------
@register(
    "ev_interarrival_profile",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             (epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id)))
               // 1000000 AS gap_s
      FROM events
    ),
    g AS (SELECT event_type, gap_s FROM gaps WHERE gap_s IS NOT NULL),
    hist AS (
      SELECT event_type, gap_s, COUNT(*) AS c FROM g GROUP BY event_type, gap_s
    ),
    cum AS (
      SELECT event_type, gap_s, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY gap_s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM hist
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN gap_s END) AS BIGINT)
             AS p50_gap_s,
           CAST(MIN(CASE WHEN cum * 100 >= 90 * n THEN gap_s END) AS BIGINT)
             AS p90_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
    FROM cum GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Inter-arrival profile: per-user consecutive-event gaps per "
    "type, summarized as exact p50/p90/max gap seconds by histogram "
    "selection — the data-driven calibration for session-gap "
    "thresholds and streaming watermark delays. Integer "
    "gap-seconds; the cumulative window runs over the gap "
    "HISTOGRAM, never the raw gaps.",
    tags=("events", "timeseries", "window"),
)
def ev_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact gap percentiles per event type.

    Scale: the lag window partitions by (user, type) — the natural
    key, no global sort; gaps quantize to integer seconds map-side,
    and the percentile selection runs on the (type, gap_s)
    histogram, bounded by the gap range rather than event volume.
    Re-run per retention window to keep session/watermark knobs
    honest as traffic patterns drift."""
    from ..functions.compat import ts_micros

    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    gaps = (
        spark.table("events")
        .select(
            "event_type",
            (ts_micros("ts") - F.lag(ts_micros("ts")).over(w)).alias(
                "gap_us"
            ),
        )
        .filter(F.col("gap_us").isNotNull())
        .select("event_type", F.expr("gap_us div 1000000").alias("gap_s"))
    )
    hist = gaps.groupBy("event_type", "gap_s").agg(
        F.count(F.lit(1)).alias("c")
    )
    wc = Window.partitionBy("event_type").orderBy("gap_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "event_type",
        "gap_s",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )

    def pick(pct: int):
        return F.min(
            F.when(F.col("cum") * 100 >= pct * F.col("n"), F.col("gap_s"))
        ).cast("long")

    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            pick(50).alias("p50_gap_s"),
            pick(90).alias("p90_gap_s"),
            F.max("gap_s").cast("long").alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# SCD type-2 interval build (round 9) — the slowly-changing-dimension
# transform every warehouse runs to historize a mutable attribute:
# collapse each user's event stream into contiguous STATE intervals
# (a new interval starts when event_type changes), stamping
# valid_from / valid_to and flagging the open current row. Kimball's
# SCD2 (The Data Warehouse Toolkit) as one declarative plan; the
# reference has no temporal-dimension surface at all. All interval
# math is exact integer microseconds.
# ---------------------------------------------------------------------------
@register(
    "ev_scd2_intervals",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, t,
             LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
               AS valid_to
      FROM o WHERE prev IS NULL OR prev <> event_type
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_open,
           CAST(SUM(COALESCE(valid_to - t, 0)) AS BIGINT) AS dwell_us,
           CAST(MAX(COALESCE(valid_to - t, 0)) AS BIGINT) AS max_dwell_us
    FROM changes GROUP BY event_type ORDER BY event_type
    """,
    doc="SCD type-2 historization (Kimball): per-user event streams "
    "collapsed to contiguous state intervals with valid_from / "
    "valid_to stamps (change rows via lag, closure via lead — both "
    "user-partitioned), rolled up to per-state interval counts, "
    "open-row counts and exact integer-microsecond dwell totals.",
    tags=("events", "window", "bench"),
)
def ev_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state SCD2 interval summary.

    Scale: ONE shuffle on user_id; both windows (change detection,
    interval closure) are user-partitioned in-partition sorts — the
    sessionization contract, per-user state only. The dimension this
    builds is |state changes|-sized, orders of magnitude under the
    event volume; at 100 TB the same plan historizes any mutable
    attribute keyed by entity."""
    from ..functions.compat import ts_micros

    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    o = spark.table("events").select(
        "user_id",
        "event_type",
        ts_micros(F.col("ts")).alias("t"),
        "event_id",
    ).withColumn("prev", F.lag("event_type").over(w))
    changes = (
        o.filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .withColumn("valid_to", F.lead("t").over(w))
    )
    dwell = F.coalesce(F.col("valid_to") - F.col("t"), F.lit(0))
    return (
        changes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum(F.col("valid_to").isNull().cast("long"))
            .cast("long")
            .alias("n_open"),
            F.sum(dwell).cast("long").alias("dwell_us"),
            F.max(dwell).cast("long").alias("max_dwell_us"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Cohort LTV curves (round 9): customers grouped by first-order month,
# cumulative revenue tracked by months-since-first-order — the
# lifetime-value curve growth teams read next to cohort retention
# (olap_cohort_retention gives the WHO, this gives the HOW MUCH).
# Month index is pure integer arithmetic (year*12 + month) so the
# offset never touches calendar-function portability. Shapes: one
# shuffle on o_custkey (window stamps the cohort), a (cohort x offset)
# rollup — months^2-sized, data-independent — and the cumulative
# window runs over that rollup, partitioned by cohort.
# ---------------------------------------------------------------------------
@register(
    "ev_cohort_ltv",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS midx,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    stamped AS (
      SELECT midx, cents,
             MIN(midx) OVER (PARTITION BY o_custkey) AS cohort
      FROM o
    ),
    r AS (
      SELECT cohort, midx - cohort AS months_since_first,
             SUM(cents) AS rev_cents,
             COUNT(*) AS n_orders
      FROM stamped GROUP BY 1, 2
    )
    SELECT CAST(cohort AS BIGINT) AS cohort_midx,
           CAST(months_since_first AS BIGINT) AS months_since_first,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(SUM(rev_cents) OVER (
             PARTITION BY cohort ORDER BY months_since_first
           ) AS BIGINT) AS cum_rev_cents
    FROM r ORDER BY cohort_midx, months_since_first
    """,
    doc="Cohort LTV: cumulative order revenue per first-order-month "
    "cohort by months-since-first-order, integer cents and integer "
    "month indexes throughout; cumulative window runs over the "
    "(cohort x offset) rollup, never the order table.",
    tags=("events", "olap", "window", "bench"),
)
def ev_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("midx"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cohort = F.min("midx").over(Window.partitionBy("o_custkey"))
    rollup = (
        o.withColumn("cohort", cohort)
        .groupBy("cohort", (F.col("midx") - F.col("cohort")).alias("months_since_first"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )
    cum = Window.partitionBy("cohort").orderBy("months_since_first")
    return rollup.select(
        F.col("cohort").cast("long").alias("cohort_midx"),
        F.col("months_since_first").cast("long").alias("months_since_first"),
        "n_orders",
        "rev_cents",
        F.sum("rev_cents").over(cum).cast("long").alias("cum_rev_cents"),
    ).orderBy("cohort_midx", "months_since_first")


# ---------------------------------------------------------------------------
# L28 engagement histogram (round 9): how many users were active on
# exactly k of the trailing 28 days — the classic engagement-health
# curve (its U shape separates a habit product from a drive-by one);
# the per-user-resolution complement of ev_stickiness_dau_mau's
# DAU/MAU ratio. Shapes: one distinct on (user, day) within the
# window, a per-user count, and a <=28-row histogram rollup; the
# 1-row max-date anchor broadcasts.
# ---------------------------------------------------------------------------
@register(
    "ev_engagement_l28",
    oracle="""
    WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS d1 FROM events),
    ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events, anchor
      WHERE CAST(ts AS DATE) >= d1 - 27
    ),
    counts AS (
      SELECT user_id, COUNT(*) AS active_days FROM ud GROUP BY user_id
    )
    SELECT CAST(active_days AS BIGINT) AS active_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM counts GROUP BY active_days ORDER BY active_days
    """,
    doc="L28 engagement histogram: users by exact active-day count "
    "over the trailing 28 days — one (user, day) distinct, a "
    "per-user count, a <=28-row rollup; the engagement-health curve "
    "next to stickiness.",
    tags=("events", "olap", "bench"),
)
def ev_engagement_l28(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.table("events")
    # 1-row max-date anchor (the audited bounded-broadcast shape)
    anchor = ev.agg(F.max(F.to_date("ts")).alias("d1"))
    ud = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .crossJoin(F.broadcast(anchor))
        .filter(F.col("day") >= F.date_sub("d1", 27))
        .select("user_id", "day")
        .distinct()
    )
    counts = ud.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("active_days")
    )
    return (
        counts.groupBy("active_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(F.col("active_days").cast("long").alias("active_days"), "n_users")
        .orderBy("active_days")
    )
