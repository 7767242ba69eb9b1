"""Regression tests for the round-3 ADVICE findings.

Each pins a reviewer-identified hazard: uncompilable filter literals
crashing the DataSource read, nondeterministic LIMIT slicing across
partition re-executions, id()-reuse breaking the catalog memo,
codec-presence changing multimodal output, and as-of tie
nondeterminism.
"""

from __future__ import annotations

import datetime
import decimal

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan

from datafusion_rdbms_ext_spark.catalog import registered_dir
from datafusion_rdbms_ext_spark.queries.base import ensure_tables
from datafusion_rdbms_ext_spark.sources.federation import federated_scan
from datafusion_rdbms_ext_spark.sources.pyds import _filter_to_sql

from .conftest import SF_DIR


def test_pushfilters_declines_uncompilable_literals():
    """datetime/date/Decimal filter values have no safe SQL literal
    form — the classifier must DECLINE them (stay in the Spark plan),
    never emit repr() as SQL."""
    assert _filter_to_sql(GreaterThan(("ts",), datetime.datetime(1996, 1, 1))) is None
    assert _filter_to_sql(EqualTo(("d",), datetime.date(1996, 1, 1))) is None
    assert _filter_to_sql(EqualTo(("x",), decimal.Decimal("1.5"))) is None
    # ...while the whitelisted types still compile.
    assert _filter_to_sql(GreaterThan(("a",), 5)) == "a > 5"
    assert _filter_to_sql(EqualTo(("s",), "o'k")) == "s = 'o''k'"
    assert _filter_to_sql(EqualTo(("b",), True)) == "b = TRUE"


def test_federated_limit_deterministic_across_partitions(spark, oracle):
    """A limited federated scan re-executes its base query once per
    partition task; the compiled LIMIT must pin a deterministic row
    set (ORDER BY ALL) so slices neither overlap nor miss."""
    df = federated_scan(
        spark,
        SF_DIR,
        "customer",
        columns=["c_custkey", "c_acctbal"],
        predicates=["c_acctbal > 0.0"],
        limit=10,
        partitions=3,
    )
    got = sorted((r["c_custkey"], r["c_acctbal"]) for r in df.collect())
    want = sorted(
        oracle.execute(
            "SELECT c_custkey, c_acctbal FROM customer "
            "WHERE c_acctbal > 0.0 ORDER BY ALL LIMIT 10"
        ).fetchall()
    )
    assert got == want  # exactly the limited set, no dup/missing rows


def test_catalog_memo_is_session_scoped(spark):
    """The registration memo lives on the session itself, so a fresh
    session never inherits (or id-collides with) another session's
    memo."""
    ensure_tables(spark, SF_DIR)
    assert registered_dir(spark) == SF_DIR
    fresh = spark.newSession()
    assert registered_dir(fresh) is None  # must re-register, not skip


def test_fake_decode_ignores_codec_availability(monkeypatch):
    """Decode output is pinned to the deterministic stub regardless of
    which codec libraries happen to be importable."""
    from datafusion_rdbms_ext_spark.sources import multimodal

    monkeypatch.setattr(multimodal, "_HAS_CODEC", True)
    out = multimodal._fake_decode(b"abc")
    assert list(out) == [97, 98, 99]


def test_asof_join_breaks_right_ties_deterministically(spark):
    """Two right rows sharing a timestamp: the matched row must be the
    greatest right-row struct (documented contract), same on every
    run/partitioning."""
    from datafusion_rdbms_ext_spark.operators.temporal import asof_join

    left = (
        spark.createDataFrame([(1, 100)], "user_id long, t long")
        .withColumn("ts", F.timestamp_micros("t"))
        .drop("t")
    )
    right = (
        spark.createDataFrame(
            [(1, 90, "low"), (1, 90, "zhigh"), (1, 90, "mid")],
            "user_id long, t long, tag string",
        )
        .withColumn("ts", F.timestamp_micros("t"))
        .drop("t")
        .select("user_id", "ts", "tag")
    )
    for _ in range(3):
        out = asof_join(left, right.repartition(4), on="ts", by=("user_id",)).collect()
        assert len(out) == 1
        # struct ordering: (user_id, ts, tag) — ties resolved by tag desc-last.
        assert out[0]["matched"]["tag"] == "zhigh"
