"""Fixture timestamp-encoding robustness.

The driver regenerates /root/testdata between rounds and has already
switched the events.ts physical type once: TIMESTAMP(NANOS) (which the
vectorized reader only accepts as raw int64 under the legacy
``nanosAsLong`` conf) → TIMESTAMP(MICROS) (which Spark 4 infers as
TIMESTAMP_NTZ). The switch broke six driver-gate queries in round 3
(CORRECTNESS_r03: op_asof/op_range AnalysisException on
``unix_micros(TIMESTAMP_NTZ)``; four stream_* mismatches from the
then-hardcoded int64 stream schema dividing µs by 1000).

These tests pin the contract that protects against the NEXT rewrite:
batch catalog, streaming source, and epoch extraction must agree on
the same instants for EVERY encoding a fixture writer might choose.
"""

from __future__ import annotations

import calendar
import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_rdbms_ext_spark.catalog import normalize_ts
from datafusion_rdbms_ext_spark.functions.compat import ts_micros

#: One unambiguous instant (UTC) and its epoch microseconds —
#: computed with integer calendar arithmetic, not float seconds:
#: .timestamp() * 1e6 suffers double rounding (~0.4 µs at this epoch)
#: and int() truncation, which for unlucky microsecond values would
#: make this file fail spuriously against CORRECT engine output.
_INSTANT = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
_EPOCH_US = calendar.timegm(_INSTANT.timetuple()) * 1_000_000 + _INSTANT.microsecond


def _write_events(tmp_path, unit: str, tz: str | None) -> str:
    """A one-row events.parquet with ts in the requested encoding."""
    ts_type = pa.timestamp(unit, tz=tz)
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([_INSTANT], ts_type),
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    path = os.path.join(str(tmp_path), "events.parquet")
    pq.write_table(table, path)
    return path


@pytest.mark.parametrize(
    "unit,tz",
    [
        ("us", None),  # today's fixtures: µs naive → TIMESTAMP_NTZ
        ("us", "UTC"),  # µs instant-adjusted → TIMESTAMP (LTZ)
        ("ns", None),  # round-1/2 fixtures: ns → int64 under nanosAsLong
    ],
)
def test_batch_normalize_all_encodings(spark, tmp_path, unit, tz):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = _write_events(tmp_path, unit, tz)
    df = normalize_ts(spark.read.parquet(path), "events")
    # Whatever the physical encoding, the column must be a timestamp
    # flavor (never a raw long) and extract the identical epoch µs.
    assert isinstance(
        df.schema["ts"].dataType, (T.TimestampType, T.TimestampNTZType)
    )
    got = df.select(ts_micros(F.col("ts")).alias("us")).collect()[0]["us"]
    assert got == _EPOCH_US


@pytest.mark.parametrize("unit,tz", [("us", None), ("ns", None)])
def test_stream_source_matches_batch(spark, tmp_path, unit, tz):
    """events_stream must surface the same instants as the batch
    catalog — drained through a real micro-batch, not just planned."""
    from datafusion_rdbms_ext_spark.streaming import events_stream

    _write_events(tmp_path, unit, tz)
    stream = events_stream(spark, str(tmp_path))
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType)
    name = f"ts_enc_probe_{unit}_{tz or 'naive'}"
    q = (
        stream.select("event_id", "ts")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).select(ts_micros(F.col("ts")).alias("us")).collect()
    assert [r["us"] for r in rows] == [_EPOCH_US]


def test_ts_micros_accepts_both_flavors(spark):
    df = spark.range(1).select(
        F.lit("2024-03-01 12:30:45.123456").cast("timestamp").alias("ltz"),
        F.lit("2024-03-01 12:30:45.123456").cast("timestamp_ntz").alias("ntz"),
    )
    row = df.select(
        ts_micros(F.col("ltz")).alias("a"), ts_micros(F.col("ntz")).alias("b")
    ).collect()[0]
    assert row["a"] == row["b"] == _EPOCH_US
