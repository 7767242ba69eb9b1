"""Late-data semantics: watermark drops, checkpoint restores.

The differential gate proves drained-stream == batch on the fixture;
this test proves the *incremental* semantics the gate can't see:
with a checkpointed append-mode aggregation, an event arriving after
the watermark has passed its window is DROPPED, not merged — the
late-data contract a 100 TB continuous pipeline depends on for
bounded state.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import functions as F

from .conftest import SMOKE_SF_DIR


def _write_batch(spark, path: Path, rows):
    spark.createDataFrame(rows, "event_id long, ts timestamp, v long").coalesce(
        1
    ).write.mode("append").parquet(str(path))


def _drain_counts(spark, src: Path, ckpt: Path, out: Path):
    """AvailableNow drain into a checkpointed parquet sink (the memory
    sink cannot recover from a checkpoint); returns all rows emitted
    so far as {window_start: count}."""
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, v long")
        .format("parquet")
        .load(str(src))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(str(out)).collect()
    counts: dict = {}
    for r in rows:
        counts[r["ws"]] = counts.get(r["ws"], 0) + r["n"]
    return counts


def test_watermark_drops_late_rows(spark):
    base = Path("spark-warehouse") / "_late_data"
    shutil.rmtree(base, ignore_errors=True)
    src, ckpt, out = base / "src", base / "ckpt", base / "out"
    src.mkdir(parents=True)

    ts = lambda s: __import__("datetime").datetime.fromisoformat(s)  # noqa: E731
    # Batch 1: three events in the 10:00 window, one at 20:00 that
    # advances the watermark to 19:00 — far past the 10:00 window.
    _write_batch(
        spark,
        src,
        [
            (1, ts("2024-01-01 10:05:00"), 1),
            (2, ts("2024-01-01 10:15:00"), 1),
            (3, ts("2024-01-01 10:45:00"), 1),
            (4, ts("2024-01-01 20:00:00"), 1),
        ],
    )
    first = _drain_counts(spark, src, ckpt, out)
    # Append mode emits the 10:00 window once it is below the watermark.
    assert first.get(ts("2024-01-01 10:00:00")) == 3

    # Batch 2: a straggler for the already-finalized 10:00 window plus
    # one on-time event. The straggler must be dropped by the restored
    # watermark, never re-opening the emitted window.
    _write_batch(
        spark,
        src,
        [
            (5, ts("2024-01-01 10:30:00"), 1),  # LATE: watermark is 19:00
            (6, ts("2024-01-01 21:00:00"), 1),
        ],
    )
    second = _drain_counts(spark, src, ckpt, out)
    assert second.get(ts("2024-01-01 10:00:00")) == 3, (
        "late row re-opened a finalized window — watermark state was not restored"
    )
    shutil.rmtree(base, ignore_errors=True)


def test_foreachbatch_sink_is_exactly_once_across_redrains(spark):
    """The production sink pattern: foreachBatch writes each epoch to
    a batchId-keyed directory with overwrite (idempotent re-delivery),
    and the checkpoint guarantees a finished epoch is never re-run —
    re-draining the SAME checkpoint with no new input must write
    nothing new, and the materialized rows equal the batch truth."""
    import shutil

    base = Path("spark-warehouse") / "_feb_sink"
    shutil.rmtree(base, ignore_errors=True)
    src, ckpt, out = base / "src", base / "ckpt", base / "out"
    src.mkdir(parents=True)
    out.mkdir(parents=True)

    _write_batch(
        spark,
        src,
        [(i, __import__("datetime").datetime(2024, 1, 1, h, 0, 0), i)
         for i, h in enumerate([1, 1, 2, 3, 3, 3])],
    )

    def sink(batch_df, batch_id: int) -> None:
        # Idempotent epoch write: same batch re-delivered -> same dir
        # overwritten, no duplicates (the foreachBatch contract).
        batch_df.write.mode("overwrite").parquet(str(out / f"epoch={batch_id}"))

    def drain():
        q = (
            spark.readStream.schema("event_id long, ts timestamp, v long")
            .format("parquet")
            .load(str(src))
            .groupBy("ts")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = sorted(
        (r["ts"], r["n"]) for r in spark.read.parquet(str(out)).collect()
    )
    epochs_after_first = set(p.name for p in out.iterdir())

    drain()  # re-drain same checkpoint, no new files
    second = sorted(
        (r["ts"], r["n"]) for r in spark.read.parquet(str(out)).collect()
    )
    assert second == first, "re-drain duplicated or mutated sink rows"
    assert set(p.name for p in out.iterdir()) == epochs_after_first

    truth = sorted(
        (r["ts"], r["n"])
        for r in spark.read.parquet(str(src))
        .groupBy("ts")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert first == truth
    shutil.rmtree(base, ignore_errors=True)


def test_file_sink_exactly_once_across_restart(spark, tmp_path):
    """Checkpoint recovery: a parquet-sink stream stopped mid-backlog
    and RESTARTED from the same checkpoint delivers every source row
    exactly once — the fault-tolerance half of the streaming story
    (the drain tests only ever run a query once).

    The source is the events fixture split into 8 files with
    maxFilesPerTrigger=1, so the first run stops with the backlog
    genuinely unfinished; the file sink's transaction log must then
    neither duplicate the committed batches nor lose the rest."""
    import time

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch = spark.read.parquet(os.path.join(SMOKE_SF_DIR, "events.parquet")).select(
        "event_id", "user_id", "value"
    )
    batch.repartition(8).write.parquet(src)
    n_src = batch.count()
    schema = spark.read.parquet(src).schema

    def start(trigger_kwargs):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    q1 = start({"processingTime": "200 milliseconds"})
    # Let SOME but not necessarily all micro-batches commit, then kill.
    deadline = time.time() + 30
    while time.time() < deadline and not q1.recentProgress:
        time.sleep(0.3)
    assert q1.recentProgress, "first run never made progress"
    q1.stop()
    q1.awaitTermination()

    # Restart from the same checkpoint; AvailableNow drains the rest.
    q2 = start({"availableNow": True})
    q2.awaitTermination()

    got = spark.read.parquet(out)
    assert got.count() == n_src  # no loss, no duplication
    assert got.select("event_id").distinct().count() == n_src


def test_versioned_stream_commit_replay_preserves_chain(spark, tmp_path):
    """A replayed batch id must be a PURE no-op: before the r7 fix,
    the replay overwrote gen{version} — deleting the exact part files
    the already-durable manifests referenced and re-landing the data
    under fresh UUID names, so committed manifests pointed at deleted
    paths (ADVICE r6 #1). Assert the file set, bytes, and readability
    of every manifest survive a redelivery."""
    import json as _json

    from datafusion_rdbms_ext_spark.streaming import versioned_stream_commit

    root = str(tmp_path / "versioned")
    os.makedirs(root)
    ev = spark.read.parquet(os.path.join(SMOKE_SF_DIR, "events.parquet")).select(
        "event_id", "event_type"
    )
    b0, b1 = ev.filter("event_id < 100"), ev.filter(
        "event_id >= 100 AND event_id < 200"
    )
    versioned_stream_commit(root, b0, 0)
    versioned_stream_commit(root, b1, 1)
    manifests = {
        v: _json.load(open(os.path.join(root, f"v{v}.json"))) for v in (1, 2)
    }
    sizes_before = {
        f: os.path.getsize(f) for f in manifests[2]["files"]
    }
    # Redeliver batch 0 (driver restart replays the last batch).
    versioned_stream_commit(root, b0, 0)
    # Chain intact: same manifests, same files, same bytes.
    for v in (1, 2):
        assert _json.load(open(os.path.join(root, f"v{v}.json"))) == manifests[v]
    for f, sz in sizes_before.items():
        assert os.path.exists(f), f"manifest-referenced file deleted: {f}"
        assert os.path.getsize(f) == sz
    # And the latest snapshot still reads exactly batches 0+1.
    snap = spark.read.parquet(*manifests[2]["files"])
    assert snap.count() == b0.count() + b1.count()


def test_durable_sketch_state_survives_restart_without_double_apply(tmp_path):
    """Kill-and-restart exactly-once for the streaming CMS/EWMA
    maintenance state (the round-7 graduation from the old
    process-local replay guard): a NEW DurableSketchState instance —
    simulating a restarted driver that lost all process state — must
    see the applied-batch set in the manifest chain, skip a replayed
    batch instead of double-adding, and keep accumulating from where
    the dead process stopped."""
    from datafusion_rdbms_ext_spark.streaming import DurableSketchState

    root = str(tmp_path / "state")
    s1 = DurableSketchState(root)
    s1.commit(0, {"a": 1, "b": 10})
    s1.commit(1, {"a": 2})
    assert s1.latest() == {"a": 3, "b": 10}

    # Driver dies; a fresh process replays the last batch (batch 1),
    # then continues with batch 2.
    s2 = DurableSketchState(root)
    assert s2.applied(0) and s2.applied(1) and not s2.applied(2)
    s2.commit(1, {"a": 2})  # replay: must NOT double-count
    assert s2.latest() == {"a": 3, "b": 10}
    s2.commit(2, {"b": 5})
    assert s2.latest() == {"a": 3, "b": 15}

    # Two writers racing the same batch: one winner, no double-add.
    s3 = DurableSketchState(root)
    s3.commit(3, {"a": 100})
    s2.commit(3, {"a": 100})
    assert s2.latest() == {"a": 103, "b": 15}


def test_late_policy_restart_and_redelivery_stay_dropped(spark, tmp_path):
    """Kill-and-restart for the late-data policy (VERDICT r7 next
    #5): after the registered two-drain replay, a THIRD drain from
    the same checkpoint (a restarted driver with no new data) must
    emit nothing, and a REDELIVERED copy of the late week must still
    be dropped by the checkpoint-restored watermark — finalized
    windows never change and never duplicate."""
    import os

    from pyspark.sql import functions as F

    from datafusion_rdbms_ext_spark.streaming import (
        _LATE_SPLIT_DAY,
        late_policy_drain,
        late_policy_land,
        late_policy_replay,
    )

    root = str(tmp_path / "late")
    os.makedirs(root)
    out = late_policy_replay(spark, SMOKE_SF_DIR, root)
    rows1 = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert rows1, "replay emitted no finalized windows"
    # Restart 1: no new data — the restored watermark and the file-
    # source log make the drain a pure no-op.
    ev = spark.read.parquet(os.path.join(SMOKE_SF_DIR, "events.parquet"))
    late_policy_drain(spark, root, ev.schema)
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == rows1
    # Restart 2: the late week is REDELIVERED as a new file (an
    # upstream replay after the restart). The restored watermark must
    # drop every row again: same finalized windows, no duplicates.
    late_policy_land(
        spark, root, 3, ev.filter(F.dayofmonth("ts") < _LATE_SPLIT_DAY)
    )
    late_policy_drain(spark, root, ev.schema)
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == rows1


def test_full_outer_stream_join_restart_no_duplicate_nulls(spark, tmp_path):
    """Kill-and-restart for the FULL OUTER interval join (VERDICT r7
    next #5): the source arrives as two file-batches into the same
    durable checkpoint; the second drain is a restarted driver whose
    join state and watermark come from the checkpoint. Unmatched-row
    (null-padded) emissions must not duplicate across the restart,
    and a third no-op drain must emit nothing."""
    import os

    from pyspark.sql import functions as F

    from datafusion_rdbms_ext_spark.catalog import normalize_ts
    from datafusion_rdbms_ext_spark.streaming import (
        full_outer_interval_join,
        late_policy_land,
    )

    root = str(tmp_path / "fo")
    os.makedirs(root)
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    ev = spark.read.parquet(os.path.join(SMOKE_SF_DIR, "events.parquet"))

    def drain() -> None:
        raw = (
            spark.readStream.schema(ev.schema)
            .format("parquet")
            .load(os.path.join(root, "src", "*.parquet"))
        )
        df = normalize_ts(raw, "events")
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        p = (
            df.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 30))
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "1 day")
        )
        c = (
            df.filter((F.col("event_type") == "click") & (F.col("user_id") < 30))
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "1 day")
        )
        q = (
            full_outer_interval_join(p, c)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    half = F.dayofmonth("ts") < 15
    late_policy_land(spark, root, 1, ev.filter(half))
    drain()  # run 1: builds join state, commits the watermark
    late_policy_land(spark, root, 2, ev.filter(~half))
    drain()  # run 2: RESTART — state + watermark restored
    got = spark.read.parquet(out)

    def _key(r):
        return tuple((v is None, v) for v in r)

    rows2 = sorted(map(tuple, got.collect()), key=_key)
    # No duplicated matched pairs and no duplicated null emissions:
    # every (purchase_id, click_id) combination — including the
    # null-padded ones — appears exactly once.
    keys = [
        (r["purchase_id"], r["click_id"]) for r in got.collect()
    ]
    assert len(keys) == len(set(keys)), "duplicate emission across restart"
    n_null = sum(1 for a, b in keys if a is None or b is None)
    assert n_null > 0, "restart run finalized no unmatched rows"
    # Run 3: no new data — nothing may be emitted again.
    drain()
    assert (
        sorted(map(tuple, spark.read.parquet(out).collect()), key=_key)
        == rows2
    )


def test_semi_stream_join_restart_no_duplicate_emission(spark, tmp_path):
    """Kill-and-restart for the LEFT SEMI interval join: two
    file-batches drain into the same durable checkpoint (the second
    drain is a restarted driver whose join state and watermark come
    from the checkpoint). Each qualifying purchase must be emitted
    exactly once ACROSS the restart — including purchases whose
    matching click arrived in the earlier batch (buffered click
    state must survive the restart) — and the final set must equal
    the batch EXISTS. A third no-op drain emits nothing."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_rdbms_ext_spark.catalog import normalize_ts
    from datafusion_rdbms_ext_spark.streaming import (
        late_policy_land,
        semi_interval_join,
    )

    root = str(tmp_path / "semi")
    os.makedirs(root)
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    ev = spark.read.parquet(os.path.join(SMOKE_SF_DIR, "events.parquet"))

    def drain() -> None:
        raw = (
            spark.readStream.schema(ev.schema)
            .format("parquet")
            .load(os.path.join(root, "src", "*.parquet"))
        )
        df = normalize_ts(raw, "events")
        if isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        p = (
            df.filter(
                (F.col("event_type") == "purchase") & (F.col("user_id") < 30)
            )
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "1 day")
        )
        c = (
            df.filter(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "1 day")
        )
        q = (
            semi_interval_join(p, c)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    half = F.dayofmonth("ts") < 15
    late_policy_land(spark, root, 1, ev.filter(half))
    drain()  # run 1: buffers click state, commits the watermark
    late_policy_land(spark, root, 2, ev.filter(~half))
    drain()  # run 2: RESTART — state + watermark restored
    got = spark.read.parquet(out)
    ids = [r["purchase_id"] for r in got.collect()]
    assert len(ids) == len(set(ids)), "duplicate emission across restart"
    # Semi matches emit eagerly (no watermark gate), so the final set
    # must equal the batch EXISTS over the full fixture.
    evn = normalize_ts(ev, "events")
    if isinstance(evn.schema["ts"].dataType, T.TimestampNTZType):
        evn = evn.withColumn("ts", F.col("ts").cast("timestamp"))
    evn.createOrReplaceTempView("semi_restart_events")
    expect = {
        r["event_id"]
        for r in spark.sql(
            """
            SELECT p.event_id FROM semi_restart_events p
            WHERE p.event_type = 'purchase' AND p.user_id < 30
              AND EXISTS (
                SELECT 1 FROM semi_restart_events c
                WHERE c.event_type = 'click' AND c.user_id = p.user_id
                  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
              )
            """
        ).collect()
    }
    assert set(ids) == expect
    # Run 3: no new data — nothing may be emitted again.
    drain()
    assert spark.read.parquet(out).count() == len(ids)
