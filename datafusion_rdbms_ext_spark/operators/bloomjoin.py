"""Bloom semi-join reduction — filter the big side of a join by a
Bloom bitmap of the small side's keys BEFORE the shuffle.

The reference classifies which predicates its sources can evaluate
(table_provider.rs:241-306); Spark's analogue for a join is the
runtime row filter: when one side is small-but-not-broadcastable (or
the join must shuffle anyway), probing each big-side row against a
compact bitmap of the build side's keys drops non-matching rows at
the SCAN, so the shuffle carries only rows that can possibly join.
No false negatives by construction — the join result is bit-identical
(the registered query's oracle is the plain join) — and false
positives only cost bytes, never correctness.

Scale: the bitmap is ``m`` bits packed into ``m/64`` longs and
shipped as a literal array into whole-stage codegen (no Python, no
UDF); build cost is one distinct + one bounded collect of the build
side's probe positions (NDV x k ints — the same bounded-collect
contract as a broadcast hash join's build). At 100 TB with a 1%-
selective dimension filter this is the difference between shuffling
the full fact table and shuffling ~1% of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.base import register

_BLOOM_K = 3
_BLOOM_LOAD = 16
_MAX_BITS = 1 << 18  # 4096-long literal cap: still codegen-friendly


def _probe(col, i: int, m: int):
    """Probe i of ``col`` into [0, m): xxhash64 with a per-probe seed.

    Build and probe both run this Spark-side, so only internal
    consistency matters (unlike the FILE-skipping Bloom, whose
    md5-portable probes a non-Spark replayer must reproduce)."""
    return F.pmod(F.xxhash64(col.cast("string"), F.lit(i)), F.lit(m))


def bloom_semi_filter(
    big: DataFrame,
    small_keys: DataFrame,
    big_key: str,
) -> tuple[DataFrame, int]:
    """Filter ``big`` to rows whose ``big_key`` can possibly appear in
    ``small_keys`` (single-column frame). Returns (filtered, m)."""
    keys = small_keys.distinct()
    k_col = keys.columns[0]
    n = keys.count()
    if n * _BLOOM_LOAD > _MAX_BITS:
        # Saturation guard (ADVICE r8 #2): past _MAX_BITS the load
        # factor blows through _BLOOM_LOAD bits/key and the false-
        # positive rate approaches 1 — every big-side row would pay
        # 3 codegen hash probes for no pruning. Skip the pre-filter
        # entirely; the join itself is still exact, and m=0 tells
        # the caller the bitmap was never built.
        return big, 0
    # >= 64 so the packed-word array is never empty (an all-zero
    # single word correctly rejects everything when n == 0)
    m = max(
        64,
        min(_MAX_BITS, 1 << max(int(max(n, 1) * _BLOOM_LOAD) - 1, 1).bit_length()),
    )
    positions = (
        keys.select(
            F.explode(
                F.array(
                    *[_probe(F.col(k_col), i, m) for i in range(_BLOOM_K)]
                )
            ).alias("bit")
        )
        .distinct()
        .collect()  # <= NDV x k rows: the build side's bounded collect
    )
    words = [0] * (m // 64)
    for r in positions:
        b = int(r["bit"])
        words[b // 64] |= 1 << (b % 64)
    # two's-complement into int64 literals
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    words_lit = F.array(*[F.lit(w).cast("long") for w in words])
    big = big.withColumn("_bw", words_lit)
    cond = None
    for i in range(_BLOOM_K):
        # (word[h/64] >> (h%64)) & 1 == 1 — spelled via expr because
        # the shift amount is per-row (array index is 0-based in
        # Spark SQL's [] accessor)
        hit = F.expr(
            f"((_bw[CAST(pmod(xxhash64(CAST({big_key} AS STRING), {i}), {m}) / 64 "
            f"AS INT)] >> CAST(pmod(pmod(xxhash64(CAST({big_key} AS STRING), {i}), {m}), 64) AS INT)) & 1) = 1"
        )
        cond = hit if cond is None else (cond & hit)
    return big.filter(cond).drop("_bw"), m


@register(
    "op_bloom_semi_join",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE s.s_acctbal > 9000
    """,
    doc="Bloom semi-join reduction: lineitem is pre-filtered at the "
    "scan by a codegen-resident bitmap of the qualifying suppliers' "
    "keys before the join shuffle — result bit-identical to the "
    "plain join (no false negatives by construction); the shuffled "
    "row count drops with the dimension filter's selectivity "
    "(pruning railed in tests/test_skew_and_sinks.py).",
    tags=("operator", "join", "bench"),
)
def op_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filtered-fact join aggregate.

    Scale: the bitmap literal lives in whole-stage codegen (no
    Python); build is one distinct over the filtered dimension; at
    100 TB the fact-side shuffle shrinks by the dimension filter's
    selectivity while the result stays exact."""
    supp = spark.table("supplier").filter(F.col("s_acctbal") > 9000)
    filtered, _m = bloom_semi_filter(
        spark.table("lineitem"), supp.select("s_suppkey"), "l_suppkey"
    )
    # No broadcast hint: supplier scales with SF, so the strategy
    # choice belongs to AQE/stats (stats_broadcast_hint), not a
    # hardcoded hint — the bloom pre-filter is the operator's point.
    return filtered.join(
        supp.select("s_suppkey"),
        filtered["l_suppkey"] == F.col("s_suppkey"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )
