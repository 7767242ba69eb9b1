"""Regression tests for the round-8 ADVICE findings.

Each pins a corner the differential gate can't see: a filter literal
containing a dim's canonical SQL, a Bloom build side past the bitmap
cap, the scene-cut fixture slice's modality, and the result cache's
atomic miss path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_DIR


# ---------------------------------------------------------------------------
# ADVICE r8 #1 — _rewrite_dim_refs must be quote-aware: a string
# literal that happens to contain a dim's canonical SQL must pass
# through untouched (and then trip the residual-base-ref fall-through
# in _try_rewrite, never a silent semantics change).
# ---------------------------------------------------------------------------
def test_mv_dim_rewrite_skips_string_literals():
    from datafusion_rdbms_ext_spark.plans.mv import _rewrite_dim_refs

    dims = {"events.event_type": "event_type"}
    # literal containing the dim verbatim: untouched; real ref: rewritten
    assert (
        _rewrite_dim_refs(
            "(c = 'events.event_type' AND events.event_type = 'a')", dims
        )
        == "(c = 'events.event_type' AND event_type = 'a')"
    )
    # '' escape counts as two delimiters — parity stays correct
    assert (
        _rewrite_dim_refs(
            "(c = 'it''s events.event_type' AND events.event_type = 'a')",
            dims,
        )
        == "(c = 'it''s events.event_type' AND event_type = 'a')"
    )


def test_mv_rewrite_literal_dim_falls_through(spark):
    """End-to-end: a filter whose LITERAL contains the dim's canonical
    SQL is not derivable (the untouched literal leaves a base-table
    substring in the predicate) -> mv_rewrite returns the original
    frame, values unchanged."""
    from datafusion_rdbms_ext_spark.plans.mv import mv_rewrite
    from datafusion_rdbms_ext_spark.queries.base import ensure_tables
    from datafusion_rdbms_ext_spark.queries.olap import events_daily_mv

    ensure_tables(spark, SF_DIR)
    mv = events_daily_mv(spark)
    user = (
        spark.table("events")
        .filter(F.col("event_type") != "events.event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    served = mv_rewrite(user, mv)
    # fall-through: same object semantics — identical values either way
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, user.collect())
    )


# ---------------------------------------------------------------------------
# ADVICE r8 #2 — Bloom pre-filter saturation guard: past the bitmap
# cap the filter would be all-pass cost; it must be skipped entirely.
# ---------------------------------------------------------------------------
def test_bloom_semi_filter_saturation_skips(spark):
    from datafusion_rdbms_ext_spark.operators.bloomjoin import (
        _BLOOM_LOAD,
        _MAX_BITS,
        bloom_semi_filter,
    )

    n_keys = _MAX_BITS // _BLOOM_LOAD + 1  # one past the guard
    big = spark.range(0, 1000).withColumnRenamed("id", "k")
    keys = spark.range(0, n_keys).withColumnRenamed("id", "k")
    filtered, m = bloom_semi_filter(big, keys, "k")
    assert m == 0  # bitmap never built
    assert filtered is big  # unchanged frame: zero probe cost
    # under the cap the bitmap IS built and prunes
    small = spark.range(0, 10).withColumnRenamed("id", "k")
    f2, m2 = bloom_semi_filter(big, small, "k")
    assert m2 >= 64
    n = f2.count()
    assert 10 <= n < 1000  # no false negatives; real pruning happened


# ---------------------------------------------------------------------------
# ADVICE r8 #3 — mm_scene_cuts runs on the VIDEO fixture slice
# (doc_id % 3 == 2), matching its documented semantics and
# mm_frame_features' modality.
# ---------------------------------------------------------------------------
def test_scene_cuts_video_modality(spark):
    from datafusion_rdbms_ext_spark.queries.base import REGISTRY, ensure_tables
    from datafusion_rdbms_ext_spark.sources.multimodal import load_assets

    ensure_tables(spark, SF_DIR)
    rows = REGISTRY["mm_scene_cuts"].fn(spark, SF_DIR).collect()
    assert rows  # non-degenerate at sf0.001
    cut_ids = {r["doc_id"] for r in rows}
    modal = {
        r["doc_id"]: r["modality"]
        for r in load_assets(spark).select("doc_id", "modality").collect()
    }
    assert cut_ids and all(modal[d] == "video" for d in cut_ids)


# ---------------------------------------------------------------------------
# ADVICE r8 #5 — ResultCache miss path is write-to-temp + atomic
# rename: at no point is an existing entry's _SUCCESS marker deleted,
# and a marker that appears concurrently wins (entry immutability).
# ---------------------------------------------------------------------------
def test_result_cache_atomic_miss(spark, tmp_path):
    import os

    from datafusion_rdbms_ext_spark.plans.result_cache import (
        ResultCache,
        plan_digest,
    )

    cache = ResultCache(str(tmp_path / "rc"))
    df = spark.range(0, 5).withColumn("v", F.col("id") * 2)
    digest = plan_digest(df, ["tok1"])
    out1 = cache.get_or_compute(spark, df, ["tok1"]).collect()
    assert cache.misses == 1
    entry = cache._entry(digest)
    marker = os.path.join(entry, "_SUCCESS")
    assert os.path.exists(marker)
    # no .tmp-* residue after the rename
    assert not [
        p for p in os.listdir(cache.root) if ".tmp-" in p
    ], os.listdir(cache.root)
    # second call: pure hit, entry untouched (mtime identical)
    mtime = os.path.getmtime(marker)
    out2 = cache.get_or_compute(spark, df, ["tok1"]).collect()
    assert cache.hits == 1
    assert os.path.getmtime(marker) == mtime
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
