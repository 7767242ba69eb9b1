"""datafusion_rdbms_ext_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *capability surface* of
``nevi-me/datafusion-rdbms-ext`` (a DataFusion query-federation
extension, see /root/reference) on top of Apache Spark:

* catalog bootstrap from self-describing sources (mirrors the
  reference's ``load_catalog``, src/sqldb/postgres/mod.rs:67-125);
* the full relational operator surface its SQL unparser covers
  (src/parser.rs:28-548) plus everything it left ``todo!()`` —
  windows, grouping sets, set ops, the long tail of scalar and
  aggregate functions — all expressed through the DataFrame API /
  Spark SQL so Catalyst plans and Tungsten executes;
* the 22-query TPC-H correctness surface its test suite targets
  (tests/tpch.rs:54-206), adapted to the driver fixture schemas;
* large-scale data-pipeline extensions the reference never had:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
  similarity search, text analysis, multimodal column plumbing,
  and event-time windowing (batch + Structured Streaming).

Design rule: declare plans with DataFrame/SQL builtins (JVM-side,
whole-stage-codegen'd); drop to Arrow-batched pandas UDFs only where
builtins cannot express the semantics. No RDDs, no driver-side loops.
"""

__version__ = "0.1.0"

from .catalog import TABLES, register_tables  # noqa: F401
from .session import get_spark  # noqa: F401
