"""Layered serving stack contract (round 9, plans/serving.py).

Each layer must (a) win exactly when applicable — cache on a warm
digest, MV on a derivable aggregate, skipping index on an eligible
filter, base otherwise — and (b) be invisible in values. The plan
rails pin what each layer's winning frame actually reads."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from datafusion_rdbms_ext_spark.plans import read_schemas
from datafusion_rdbms_ext_spark.plans.result_cache import ResultCache
from datafusion_rdbms_ext_spark.plans.serving import serve
from datafusion_rdbms_ext_spark.queries.base import ensure_tables
from datafusion_rdbms_ext_spark.queries.olap import events_daily_mv
from datafusion_rdbms_ext_spark.sources.sinks import (
    _REWRITE_HI,
    _REWRITE_KEY,
    _REWRITE_LO,
    composed_skipping_index,
)

from .conftest import SF_DIR


def _stack(spark):
    ensure_tables(spark, SF_DIR)
    mv = events_daily_mv(spark)
    idx = composed_skipping_index(spark, SF_DIR)
    cache = ResultCache(tempfile.mkdtemp(prefix="serving_rail_"))
    return mv, idx, cache


def test_mv_then_cache_then_values(spark):
    mv, idx, cache = _stack(spark)

    def q():
        return (
            spark.table("events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    f1, via1 = serve(q(), cache=cache, snapshot_tokens=["t"], mvs=(mv,), indexes=(idx,))
    assert via1 == "mv"
    f2, via2 = serve(q(), cache=cache, snapshot_tokens=["t"], mvs=(mv,), indexes=(idx,))
    assert via2 == "cache"
    direct = sorted(map(tuple, q().collect()))
    assert sorted(map(tuple, f1.collect())) == direct
    assert sorted(map(tuple, f2.collect())) == direct
    # the cache hit reads the materialized entry, never the base table
    schemas = "".join(read_schemas(f2))
    assert "user_id" not in schemas and "props" not in schemas


def test_skip_layer_wins_for_indexed_filter(spark):
    mv, idx, cache = _stack(spark)
    q = spark.table("lineitem").filter(
        F.col("l_orderkey").between(_REWRITE_LO, _REWRITE_HI)
        & (F.col("l_suppkey") == _REWRITE_KEY)
    )
    served, via = serve(q, mvs=(mv,), indexes=(idx,))
    assert via == "skip"
    assert len(served.inputFiles()) < len(idx.manifest)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, q.collect())
    )


def test_base_fall_through(spark):
    mv, idx, cache = _stack(spark)
    q = spark.table("events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    served, via = serve(q, mvs=(mv,), indexes=(idx,))
    assert via == "base"
    assert served is q  # untouched frame — no cache, no rewrite


def test_cache_hit_after_lower_layer_materialization(spark):
    """A cache MISS served by the MV layer still materializes under
    the ORIGINAL digest — the next identical query hits the cache
    even with no MV registered."""
    mv, idx, cache = _stack(spark)

    def q():
        return (
            spark.table("events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    _, via1 = serve(q(), cache=cache, snapshot_tokens=["t"], mvs=(mv,))
    assert via1 == "mv"
    _, via2 = serve(q(), cache=cache, snapshot_tokens=["t"], mvs=())
    assert via2 == "cache"
