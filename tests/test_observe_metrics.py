"""df.observe() — in-flight query metrics without a second pass.

At 100 TB you cannot afford a separate validation scan; observe()
rides the production query's single pass and surfaces row counts /
conditional sums to the driver as accumulator-style metrics. This
pins the API works and the metrics are exact."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from datafusion_rdbms_ext_spark.queries.base import ensure_tables

from .conftest import SF_DIR


def test_observe_rides_the_query_pass(spark):
    ensure_tables(spark, SF_DIR)
    d = spark.table("documents")
    obs = Observation("docs_audit")
    observed = d.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("n_chars") < 50).cast("long")).alias("n_short"),
        F.max("n_chars").alias("max_chars"),
    )
    # One action drives both the result and the metrics.
    result = observed.groupBy("lang").count().collect()
    expected = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("n_chars") < 50).cast("long")).alias("n_short"),
        F.max("n_chars").alias("max_chars"),
    ).first()
    got = obs.get
    assert got["n_rows"] == expected["n_rows"]
    assert got["n_short"] == expected["n_short"]
    assert got["max_chars"] == expected["max_chars"]
    assert sum(r["count"] for r in result) == expected["n_rows"]
