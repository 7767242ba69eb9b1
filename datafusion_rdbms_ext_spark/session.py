"""SparkSession factory tuned for the engine.

Mirrors the reference's session bootstrap ``make_rdbms_context``
(/root/reference/src/lib.rs:22-32), which builds a DataFusion
SessionContext with information-schema support and extra planner
hooks. Here the "extra hooks" are Spark confs: AQE (runtime
re-planning — the closest Spark analogue to the reference's
optimizer-rule slot), Arrow transfer for the pandas-UDF path, and a
shuffle-partition count sized to the machine instead of the
200-partition default.

Scale notes (100 TB / 1000-executor design intent):
* AQE + coalescePartitions + skewJoin handle runtime re-partitioning
  so a plan tuned at sf0.1 still behaves at sf1000.
* ``spark.sql.files.maxPartitionBytes`` stays at the 128 MB default —
  scan parallelism then scales linearly with input size.
* autoBroadcastJoinThreshold stays enabled so dimension tables
  (region/nation/supplier at TPC-H ratios) broadcast instead of
  shuffling the fact table.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "datafusion_rdbms_ext_spark") -> SparkSession:
    """Build (or fetch) the tuned local session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all
    cores). On a real cluster the same confs apply; only ``master``
    changes.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Split planning: maxPartitionBytes stays at the 128 MB
        # default (scan parallelism scales with data), but the
        # file-open cost model is tuned for fast local/object storage
        # so small files still split wide enough to feed all cores.
        # At 100 TB files are >=128 MB and these two are no-ops.
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.sql.files.minPartitionNum", os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource API: let custom readers take filters
        # (sources/pyds.py federation source).
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
