"""Catalog bootstrap: self-describing Parquet → registered views.

Rebuilds the reference's catalog-inference entry point
(``PostgresConnection::load_catalog``,
/root/reference/src/sqldb/postgres/mod.rs:67-125) Spark-first: where
the reference issues two ``information_schema`` queries against
Postgres and hand-converts column metadata to Arrow schemas
(src/sqldb/postgres/datatypes.rs:110-184), Parquet footers are
already self-describing, so registration is one ``spark.read.parquet``
per table — schema inferred once at registration, fixed thereafter
(the same contract as the reference, SURVEY.md §1.2).

The reference exposes tables under a 3-part name
(``bench.public.lineitem``, src/parser.rs:459-465); driver fixtures
are unambiguous, so names flatten to 1-part temp views (SURVEY.md §7
"What's genuinely hard" #2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Runtime-conf key recording which sf_dir is registered in a session.
#: Stored on the session itself (not a module-level dict keyed by
#: id(spark) — CPython can reuse a GC'd id for a new session, which
#: would falsely skip registration) so the memo's lifetime IS the
#: session's lifetime. Owned here (not by the query registry) so
#: deregistration invalidates it.
REGISTERED_DIR_CONF = "spark.datafusion_rdbms_ext.registered_sf_dir"


def registered_dir(spark: SparkSession) -> str | None:
    """The sf_dir whose tables are currently registered, or None."""
    return spark.conf.get(REGISTERED_DIR_CONF, None)

#: Every table the driver fixture set provides (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TABLES,
) -> dict[str, DataFrame]:
    """Register one temp view per Parquet table under ``sf_dir``.

    Mirror of the reference's ``load_catalog`` → ``register_table``
    loop (src/sqldb/postgres/mod.rs:88-120, src/catalog.rs:84-95).
    Idempotent: re-registering repoints the view. Also pins the
    session timezone to UTC so timestamp semantics are stable and
    oracle-comparable regardless of the ambient session default.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Spark's vectorized Parquet reader rejects TIMESTAMP(NANOS) (the
    # events.ts physical type); read nanos as raw int64 and rebase to
    # a microsecond TimestampType column JVM-side below. Same class of
    # work as the reference's epoch rebasing on its wire decoder
    # (src/sqldb/postgres/binary_reader.rs:19-20, 425-431).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            # Fail loudly: silently skipping would leave any previously
            # registered view for `name` pointing at stale data.
            raise FileNotFoundError(f"fixture table {name!r} not found at {path}")
        df = spark.read.parquet(path)
        df = normalize_ts(df, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    spark.conf.set(REGISTERED_DIR_CONF, sf_dir)
    return out


#: Columns that fixture generations have stored as TIMESTAMP(NANOS)
#: (read as raw int64 under the legacy conf) in some rounds and as
#: TIMESTAMP(MICROS) (read as TimestampNTZType) in others. The driver
#: regenerates /root/testdata between rounds, so the encoding is not
#: ours to pin — normalization must accept every variant.
_NANOS_COLS = {"events": ("ts",)}


def normalize_ts(df: DataFrame, table: str) -> DataFrame:
    """Make fixture timestamp encodings uniform without changing type
    semantics the oracles already verified.

    * int64 (legacy nanosAsLong read of TIMESTAMP(NANOS)) → rebased to
      a µs timestamp, truncating like DuckDB's ns→µs cast. Integer
      division — float division loses precision above 2^53 ns.
    * TIMESTAMP / TIMESTAMP_NTZ (µs physical) → left as read; the
      session timezone is pinned to UTC so NTZ and LTZ agree on epoch
      extraction downstream (see functions.compat.ts_micros).
    """
    for col in _NANOS_COLS.get(table, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def table_names(spark: SparkSession) -> list[str]:
    """List registered tables (reference: ``SchemaCatalog::table_names``,
    src/catalog.rs:69-74)."""
    return [t.name for t in spark.catalog.listTables()]


def table_exist(spark: SparkSession, name: str) -> bool:
    """Reference: ``SchemaCatalog::table_exist`` (src/catalog.rs:78-82)."""
    return spark.catalog.tableExists(name)


def deregister_table(spark: SparkSession, name: str) -> bool:
    """Reference: ``register/deregister_table`` (src/catalog.rs:84-102).

    Also invalidates the registration memo so the next registered
    query re-registers instead of trusting a catalog this call just
    made incomplete."""
    spark.conf.unset(REGISTERED_DIR_CONF)
    return spark.catalog.dropTempView(name)
