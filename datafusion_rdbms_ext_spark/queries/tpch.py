"""TPC-H query surface, adapted to the driver fixture schemas.

The reference's correctness target is the 22 TPC-H queries
(/root/reference/testdata/queries/q1.sql…q22.sql, exercised by
tests/tpch.rs:54-206); it executed 5 of them and got accurate results
on 3 (README.md:44-87). This module re-expresses that whole surface
Spark-first over the driver fixtures (FIXTURES.md §B: no ``partsupp``,
trimmed columns, double money, timestamp dates), following the
adaptation notes in FIXTURES.md — queries needing missing
tables/columns are reworked into operator-equivalent forms that keep
the interesting plan shape (join graph, subquery class, aggregation
pattern).

Plan-shape notes (100 TB design intent) are on each query: which side
broadcasts, where the shuffles land, what AQE is expected to do.

All money aggregates use the exact-decimal helpers from
``functions.compat`` so results hash-match the DuckDB oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.compat import davg, dsum, sql_davg, sql_dsum
from .base import register


def ts(s: str):
    """Timestamp literal (fixture dates are timestamp[ms], FIXTURES.md)."""
    return F.lit(s).cast("timestamp")


# Reusable money expressions (TPC-H "revenue"/"charge").
def _disc_price():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _charge():
    return F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))


_SQL_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_SQL_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


# ---------------------------------------------------------------------------
# Q1 — pricing summary report. The reference's flagship accurate query
# (README.md:44-47). scan → filter → groupBy(2 keys) → 8 aggs → sort.
# Scale: partial aggregation map-side; only 2×~4 groups shuffle. The
# filter and the 7-column projection both push into the Parquet scan.
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum(_SQL_DISC_PRICE)} AS sum_disc_price,
           {sql_dsum(_SQL_CHARGE)} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="reference testdata/queries/q1.sql; README.md:44-47",
    tags=("tpch", "aggregate", "bench"),
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("lineitem")
        .filter(F.col("l_shipdate") <= ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(_disc_price()).alias("sum_disc_price"),
            dsum(_charge()).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q3 — shipping priority (customer ⋈ orders ⋈ lineitem, top-10 by
# revenue). o_shippriority is absent from fixtures → dropped.
# Scale: no broadcast hint — customer scales linearly with SF, so the
# choice is AQE's (runtime sizes decide broadcast vs shuffle; a forced
# hint OOMs the build side at 100×). orders⋈lineitem is the one real
# shuffle (both sides hashed on orderkey); top-10 via
# TakeOrderedAndProject — no global sort materializes. l_orderkey
# tie-breaks the cutoff so top-10 is deterministic across engines.
# ---------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum(_SQL_DISC_PRICE)} AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1997-06-15'
      AND l_shipdate > TIMESTAMP '1997-06-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="reference testdata/queries/q3.sql; README.md:50 (accurate)",
    tags=("tpch", "join", "bench"),
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = spark.table("orders").filter(F.col("o_orderdate") < ts("1997-06-15"))
    lineitem = spark.table("lineitem").filter(F.col("l_shipdate") > ts("1997-06-15"))
    return (
        lineitem.join(
            orders.join(customer, F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(_disc_price()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume: the reference's 6-way join target
# (README.md:53, accurate). region ⋈ nation ⋈ supplier ⋈ customer ⋈
# orders ⋈ lineitem with the c_nationkey = s_nationkey co-location
# constraint. Scale: region/nation broadcast (FIXED cardinality — 5
# and 25 rows at every SF, the only tables where a hint is safe);
# supplier scales with SF so its join is left to AQE;
# orders⋈lineitem shuffles on orderkey; the customer join hashes on
# custkey. AQE reorders/broadcasts at runtime from real sizes.
# ---------------------------------------------------------------------------
@register(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {sql_dsum(_SQL_DISC_PRICE)} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    doc="reference testdata/queries/q5.sql; README.md:53",
    tags=("tpch", "join", "bench"),
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = spark.table("region").filter(F.col("r_name") == "ASIA")
    nation = spark.table("nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supplier = spark.table("supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = spark.table("orders").filter(
        (F.col("o_orderdate") >= ts("1996-01-01")) & (F.col("o_orderdate") < ts("1998-01-01"))
    )
    return (
        spark.table("lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            spark.table("customer"),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(_disc_price()).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: pure scan-side predicate work
# (BETWEEN on double, timestamp range, <) feeding one global agg.
# The reference executed this but with inaccurate results
# (README.md:55-56). Scale: all three predicates push to Parquet
# (row-group pruning on l_shipdate); single-value shuffle.
# ---------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="reference testdata/queries/q6.sql; README.md:55-56",
    tags=("tpch", "filter", "bench"),
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= ts("1996-01-01"))
            & (F.col("l_shipdate") < ts("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (4-way join, wide group-by, top-20).
# c_address/c_phone/c_comment absent → dropped. Scale: nation
# broadcasts; orders⋈lineitem shuffle on orderkey, then one shuffle on
# custkey for the customer join + group-by; top-20 avoids global sort.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum(_SQL_DISC_PRICE)} AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="reference testdata/queries/q10.sql; README.md:62-64",
    tags=("tpch", "join", "bench"),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.table("orders").filter(
        (F.col("o_orderdate") >= ts("1996-07-01")) & (F.col("o_orderdate") < ts("1996-10-01"))
    )
    lineitem = spark.table("lineitem").filter(F.col("l_returnflag") == "R")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(spark.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(spark.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_disc_price()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect: CASE WHEN inside an aggregate, ratio of two
# sums. Fixture p_type has no 'PROMO%'-prefixed compound strings —
# exact 'PROMO' category used with LIKE to keep the operator (LIKE in
# aggregate position, reference parser.rs:675-682).
# Scale: part broadcasts under AQE (it is 1/30th of lineitem rows).
# ---------------------------------------------------------------------------
@register(
    "q14_promo_effect",
    oracle=f"""
    SELECT 100.00 * {sql_dsum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_SQL_DISC_PRICE} ELSE 0.0 END")}
           / {sql_dsum(_SQL_DISC_PRICE)} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    doc="reference testdata/queries/q14.sql; README.md:70",
    tags=("tpch", "case", "bench"),
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= ts("1997-09-01")) & (F.col("l_shipdate") < ts("1997-10-01"))
    )
    joined = lineitem.join(spark.table("part"), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.when(F.col("p_type").like("PROMO%"), _disc_price()).otherwise(F.lit(0.0))
    return joined.agg(
        (F.lit(100.00) * dsum(promo) / dsum(_disc_price())).alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# Q2-equivalent — correlated scalar MIN/MAX subquery. The original
# needs partsupp (absent); the operator row it covers — correlated
# scalar subquery in WHERE (reference parser.rs:936-939, which could
# build the AST but never execute it, README.md:49) — is kept: top
# account-balance customer(s) per nation. The oracle qualifies the
# correlation against the OUTER alias c1 (round-1 ADVICE: a bare
# c_nationkey resolved to the inner c2, computing the global max).
# Engine side is an independent DataFrame formulation: per-nation max
# aggregate joined back — exactly the decorrelated plan Catalyst
# produces for the subquery form, so the differential check compares
# two genuinely different implementations.
# Scale: the per-nation max is a tiny (≤25-row) aggregate — AQE
# broadcasts it into the equality join; one shuffle on nationkey.
# ---------------------------------------------------------------------------
@register(
    "q02_top_balance_per_nation",
    oracle="""
    SELECT c1.c_custkey, c1.c_name, c1.c_acctbal, n_name
    FROM customer c1, nation
    WHERE c1.c_nationkey = n_nationkey
      AND c1.c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
                          WHERE c2.c_nationkey = c1.c_nationkey)
    ORDER BY n_name, c1.c_custkey
    """,
    doc="reference testdata/queries/q2.sql (correlated scalar subquery); parser.rs:936-939",
    tags=("tpch", "subquery"),
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = spark.table("customer")
    max_bal = customer.groupBy(F.col("c_nationkey").alias("mb_nationkey")).agg(
        F.max("c_acctbal").alias("mb_acctbal")
    )
    return (
        customer.join(
            max_bal,
            (F.col("c_nationkey") == F.col("mb_nationkey"))
            & (F.col("c_acctbal") == F.col("mb_acctbal")),
        )
        .join(F.broadcast(spark.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
        .orderBy("n_name", "c_custkey")
    )


# ---------------------------------------------------------------------------
# Q4 — order-priority checking: EXISTS correlated subquery → Spark
# plans a left-semi join (free in Spark; reference rejects semi/anti,
# parser.rs:1180-1189). l_commitdate/l_receiptdate absent → the
# correlated predicate uses l_shipdate > o_orderdate.
# Scale: semi-join shuffles both sides on orderkey once.
# ---------------------------------------------------------------------------
@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="reference testdata/queries/q4.sql; README.md:51-52 (blocked on intervals)",
    tags=("tpch", "exists", "bench"),
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.table("orders").filter(
        (F.col("o_orderdate") >= ts("1996-01-01")) & (F.col("o_orderdate") < ts("1996-07-01"))
    )
    lineitem = spark.table("lineitem")
    matched = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping: nation self-join (n1 supplier-side, n2
# customer-side — reference q7 uses the same aliased self-join) +
# EXTRACT(year). Scale: nation broadcasts twice; one orderkey shuffle.
# ---------------------------------------------------------------------------
_Q07_SQL_BODY = """
SELECT supp_nation, cust_nation, l_year,
       {dsum} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""
_Q07_SQL = _Q07_SQL_BODY.format(dsum=sql_dsum("volume"))


@register(
    "q07_volume_shipping",
    oracle=_Q07_SQL,
    doc="reference testdata/queries/q7.sql (nation n1/n2 self-join); README.md:57",
    tags=("tpch", "self-join"),
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form (independent of the oracle SQL): the nation
    self-join materializes as two renamed copies of the 25-row dim,
    both broadcast; the only real shuffle is lineitem⋈orders on
    orderkey then the customer join on custkey."""
    n1 = spark.table("nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = spark.table("nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = spark.table("lineitem").filter(
        F.col("l_shipdate").between(ts("1996-01-01"), ts("1997-12-31"))
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(spark.table("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(spark.table("orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(spark.table("customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair_ok)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(dsum(_disc_price()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: the reference's widest join (8 factors,
# README.md:58-59). partsupp-free adaptation keeps all 8: part,
# supplier, lineitem, orders, customer, nation×2, region. CASE-in-agg
# ratio. Scale: dims broadcast; fact shuffles on orderkey then custkey.
# ---------------------------------------------------------------------------
_Q08_SQL_BODY = """
SELECT o_year,
       CAST({num} / {den} AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""
_Q08_SQL = _Q08_SQL_BODY.format(
    num=sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END"),
    den=sql_dsum("volume"),
)


@register(
    "q08_market_share",
    oracle=_Q08_SQL,
    doc="reference testdata/queries/q8.sql (8-way join); README.md:58-59",
    tags=("tpch", "join", "bench"),
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form: all 8 factors joined explicitly; region/nation
    broadcast (fixed cardinality), part/supplier/customer left to AQE
    since they scale with SF."""
    part = spark.table("part").filter(F.col("p_type") == "ECONOMY")
    n1 = spark.table("nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = spark.table("nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    region = spark.table("region").filter(F.col("r_name") == "AMERICA")
    orders = spark.table("orders").filter(
        F.col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31"))
    )
    volume = _disc_price()
    joined = (
        spark.table("lineitem")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(spark.table("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(spark.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    national = F.when(F.col("nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((dsum(national) / dsum(volume)).cast("double").alias("mkt_share"))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit: LIKE on p_name, EXTRACT(year), group by
# (nation, year). ps_supplycost absent → cost proxied from
# p_retailprice so the amount expression keeps its two-term shape.
# ---------------------------------------------------------------------------
_Q09_SQL_BODY = """
SELECT nation, o_year, {dsum} AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.01 AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%bolt%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""
_Q09_SQL = _Q09_SQL_BODY.format(dsum=sql_dsum("amount"))


@register(
    "q09_product_profit",
    oracle=_Q09_SQL,
    doc="reference testdata/queries/q9.sql; README.md:60-61",
    tags=("tpch", "join"),
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form: LIKE-filtered part drives the join; amount
    keeps the reference's two-term profit shape."""
    part = spark.table("part").filter(F.col("p_name").like("%bolt%"))
    amount = _disc_price() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.01)
    return (
        spark.table("lineitem")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(spark.table("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(spark.table("orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(spark.table("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11-equivalent — HAVING against a scalar subquery over the whole
# table (the reference notes "group by x having y is not parsed
# correctly", README.md:78; partsupp-free adaptation over lineitem).
# Scale: the scalar subquery is one extra full-scan aggregate —
# Catalyst runs it as an independent subquery stage and broadcasts
# the single-row result into the HAVING filter.
# ---------------------------------------------------------------------------
_Q11_SQL_BODY = """
SELECT l_partkey, {dsum} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING {dsum} > (SELECT {dsum_inner} * 0.0007 FROM lineitem)
ORDER BY part_value DESC
"""
_Q11_SQL = _Q11_SQL_BODY.format(
    dsum=sql_dsum("l_extendedprice * (1 - l_discount)"),
    dsum_inner=sql_dsum("l_extendedprice * (1 - l_discount)"),
)


@register(
    "q11_important_stock",
    oracle=_Q11_SQL,
    doc="reference testdata/queries/q11.sql (HAVING + scalar subquery); README.md:65,78",
    tags=("tpch", "having"),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form: the HAVING-vs-global-aggregate decorrelates
    into a 1-row threshold joined back — AQE broadcasts the single
    row without a hint."""
    li = spark.table("lineitem")
    per_part = li.groupBy("l_partkey").agg(dsum(_disc_price()).alias("part_value"))
    threshold = li.agg((dsum(_disc_price()) * F.lit(0.0007)).alias("thr"))
    return (
        per_part.crossJoin(threshold)
        .filter(F.col("part_value") > F.col("thr"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc())
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-mode CASE-in-aggregate. l_shipmode/l_commitdate
# absent → buckets over o_orderpriority, grouped by l_linestatus.
# SUM(CASE...1 ELSE 0) cast to BIGINT on both engines (DuckDB sums
# ints to HUGEINT, Spark to BIGINT — alignment matters for the hash).
# ---------------------------------------------------------------------------
@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="reference testdata/queries/q12.sql; README.md:66-67",
    tags=("tpch", "case"),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= ts("1996-01-01")) & (F.col("l_shipdate") < ts("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(spark.table("orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: LEFT OUTER JOIN (the one
# outer join in the reference suite, parser.rs:330-340) + derived
# table with aggregate-of-aggregate. o_comment absent → NOT LIKE
# conjunct dropped (FIXTURES.md). COUNT(o_orderkey) counts non-null
# only — exercised by customers with no orders surviving the outer
# join. Scale: two shuffles (custkey, then c_count) — both unavoidable.
# ---------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="reference testdata/queries/q13.sql; README.md:68-69",
    tags=("tpch", "outer-join", "bench"),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c_orders = (
        spark.table("customer")
        .join(spark.table("orders"), F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier via a VIEW + scalar MAX subquery (the reference's
# multi-statement session: CREATE VIEW / query / DROP VIEW,
# testdata/queries/q15.sql; CreateView is todo!() in parser.rs:544).
# Spark: CREATE OR REPLACE TEMP VIEW, then the query; oracle inlines
# the view as a CTE.
# ---------------------------------------------------------------------------
_Q15_REVENUE = sql_dsum("l_extendedprice * (1 - l_discount)")
_Q15_VIEW = f"""
SELECT l_suppkey AS supplier_no, {_Q15_REVENUE} AS total_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
GROUP BY l_suppkey
"""
_Q15_MAIN = """
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue0
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
"""


@register(
    "q15_top_supplier",
    oracle=f"WITH revenue0 AS ({_Q15_VIEW}) {_Q15_MAIN}",
    doc="reference testdata/queries/q15.sql (CREATE VIEW session); parser.rs:544",
    tags=("tpch", "view"),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(f"CREATE OR REPLACE TEMP VIEW revenue0 AS {_Q15_VIEW}")
    return spark.sql(_Q15_MAIN)


# ---------------------------------------------------------------------------
# Q16 — COUNT(DISTINCT) + excluded-supplier subquery + <> and NOT LIKE
# predicates (reference README.md:72-73: failed on `count(distinct)`).
# partsupp-free: supplier counts come from lineitem. The oracle uses
# NOT EXISTS (not NOT IN) to match left-anti-join semantics exactly —
# they diverge when the subquery yields NULL keys (round-1 ADVICE).
# Scale: part scales with SF → no broadcast hint, AQE decides; the
# distinct-aggregate shuffles on the (brand,type,size) grouping key.
# ---------------------------------------------------------------------------
@register(
    "q16_part_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 36)
      AND NOT EXISTS (SELECT 1 FROM supplier
                      WHERE s_suppkey = l_suppkey AND s_acctbal < 1000.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="reference testdata/queries/q16.sql; README.md:72-73",
    tags=("tpch", "count-distinct"),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = spark.table("part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 36)
    )
    excluded = spark.table("supplier").filter(F.col("s_acctbal") < 1000.0).select("s_suppkey")
    lineitem = spark.table("lineitem").join(
        excluded, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated AVG subquery per
# part (reference README.md:74-75 "Scalar subqueries not supported").
# AVG(l_quantity) is exact in double (integer-valued), so plain AVG is
# deterministic; the outer money sum uses the decimal path.
# Scale: Catalyst rewrites the correlation into an aggregate on
# l_partkey joined back — one shuffle on partkey each side.
# ---------------------------------------------------------------------------
_Q17_SQL = f"""
SELECT CAST({sql_dsum('l_extendedprice')} / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


@register(
    "q17_small_quantity",
    oracle=_Q17_SQL,
    doc="reference testdata/queries/q17.sql (correlated scalar subquery); README.md:74-75",
    tags=("tpch", "subquery", "bench"),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form: the correlated AVG decorrelates into a
    per-part aggregate joined back on partkey — exactly the plan
    Catalyst builds for the subquery SQL, here written explicitly."""
    li = spark.table("lineitem")
    part = spark.table("part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * F.lit(0.2)).alias("qty_cap")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("ap_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0)).cast("double").alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: IN over a grouped-HAVING subquery.
# Scale: the engine-side plan REUSES the HAVING subquery's aggregate
# as the output column — o_orderkey functionally determines every
# other group key (order -> customer), so the spec's re-join of
# lineitem + 5-column re-aggregate computes the SAME per-order sum a
# second time. One lineitem scan, one high-cardinality aggregate,
# then joins against the few qualifying orders (data-dependent size —
# no broadcast hint; AQE sees the post-HAVING size at runtime).
# o_orderkey tie-breaks the LIMIT cutoff. This halved the query's
# run-to-run tail (the former plan aggregated lineitem twice; the
# second pass's hash map was the bench straggler — r4 "q18 2.48x").
# ---------------------------------------------------------------------------
@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    doc="reference testdata/queries/q18.sql; README.md:76-78",
    tags=("tpch", "in-subquery", "bench"),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    big_orders = (
        spark.table("lineitem")
        .groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big_orders.join(
            spark.table("orders"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(spark.table("customer"), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: OR-of-AND predicate blocks over a join
# (the reference's hardest predicate shape, README.md:79-80).
# p_container/l_shipmode absent → blocks over brand/size/quantity.
# Scale: the equi-join key is extracted from all OR branches by
# Catalyst so this still plans as a hash join on partkey, with the
# OR residual as post-join filter — not a cartesian product. part
# scales with SF → no broadcast hint; AQE decides from runtime sizes.
# ---------------------------------------------------------------------------
@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {sql_dsum(_SQL_DISC_PRICE)} AS revenue
    FROM lineitem, part
    WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
           AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
           AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
           AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="reference testdata/queries/q19.sql; README.md:79-80",
    tags=("tpch", "predicate"),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, p = spark.table("lineitem"), spark.table("part")
    block = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(block("Brand#12", 15, 1, 11) | block("Brand#23", 25, 10, 20) | block("Brand#3", 35, 20, 30))
        .agg(dsum(_disc_price()).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20-equivalent — nested IN subqueries (IN inside IN, with a grouped
# HAVING): suppliers who shipped substantial volume of 'small %' parts.
# ---------------------------------------------------------------------------
_Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 2000
)
ORDER BY s_name
"""


@register(
    "q20_potential_promotion",
    oracle=_Q20_SQL,
    doc="reference testdata/queries/q20.sql (nested IN subqueries); README.md:81-83",
    tags=("tpch", "in-subquery"),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form: nested INs become two chained semi-joins —
    part-filter semi-join prunes lineitem BEFORE the per-supplier
    aggregate, so the heavy HAVING runs on the reduced set."""
    small_parts = spark.table("part").filter(F.col("p_name").like("small%")).select("p_partkey")
    qualifying = (
        spark.table("lineitem")
        .join(small_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 2000)
        .select("l_suppkey")
    )
    return (
        spark.table("supplier")
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21-equivalent — EXISTS + NOT EXISTS against self-joined lineitem
# (l1/l2/l3 aliases like the reference's q21). l_receiptdate/
# l_commitdate absent → "late" means l_shipdate > o_orderdate + the
# l3 condition compares shipdates across suppliers in the same order.
# Scale: three scans of lineitem, all shuffled on orderkey; Spark
# plans the NOT EXISTS as a left-anti join (no per-row subquery).
# ---------------------------------------------------------------------------
_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register(
    "q21_suppliers_who_kept_waiting",
    oracle=_Q21_SQL,
    doc="reference testdata/queries/q21.sql (EXISTS/NOT EXISTS self-joins); README.md:84-85",
    tags=("tpch", "exists", "bench"),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form: EXISTS -> left_semi, NOT EXISTS -> left_anti,
    both with non-equi residuals on the orderkey equi-join — the
    exact plan Catalyst derives from the subquery SQL."""
    l1 = (
        spark.table("lineitem")
        .join(
            spark.table("orders").filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
    )
    l2 = spark.table("lineitem").select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = spark.table("lineitem").select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    waited = l1.join(
        l2,
        (F.col("l2_orderkey") == F.col("l_orderkey"))
        & (F.col("l2_suppkey") != F.col("l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l3_orderkey") == F.col("l_orderkey"))
        & (F.col("l3_suppkey") != F.col("l_suppkey"))
        & (F.col("l3_shipdate") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        waited.join(spark.table("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


# ---------------------------------------------------------------------------
# Q22 — global-sales opportunity: SUBSTRING-derived key (reference
# parser.rs:796-800 is one of only two scalar functions it supports),
# uncorrelated scalar AVG subquery, NOT EXISTS anti-join. c_phone
# absent → country code proxied from the customer-number digits.
# The AVG over non-integer doubles goes through the exact-decimal
# path on BOTH sides to stay order-independent.
# ---------------------------------------------------------------------------
_Q22_SQL_BODY = """
SELECT cntrycode, COUNT(*) AS numcust, {dsum} AS totacctbal
FROM (
  SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_acctbal
  FROM customer
  WHERE SUBSTRING(c_name, 17, 2) IN ('13', '31', '23', '29', '30', '18', '17')
    AND c_acctbal > (SELECT {davg} FROM customer
                     WHERE c_acctbal > 0.0
                       AND SUBSTRING(c_name, 17, 2) IN ('13', '31', '23', '29', '30', '18', '17'))
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""
_Q22_SQL = _Q22_SQL_BODY.format(dsum=sql_dsum("c_acctbal"), davg=sql_davg("c_acctbal"))


@register(
    "q22_global_sales_opportunity",
    oracle=_Q22_SQL,
    doc="reference testdata/queries/q22.sql; README.md:86-87; substring parser.rs:796-800",
    tags=("tpch", "anti-join"),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form: the uncorrelated AVG threshold is a 1-row
    aggregate cross-joined back (AQE broadcasts it); NOT EXISTS is a
    left_anti against the big-spender orders."""
    code = F.substring("c_name", 17, 2)
    codes = ("13", "31", "23", "29", "30", "18", "17")
    cust = spark.table("customer").filter(code.isin(*codes))
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal")).alias("avg_bal")
    )
    big_orders = spark.table("orders").filter(F.col("o_totalprice") > 450000.0).select("o_custkey")
    return (
        cust.crossJoin(threshold)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(big_orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(code.alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"), dsum(F.col("c_acctbal")).alias("totacctbal"))
        .orderBy("cntrycode")
    )
