"""TLS+SCRAM overhead on the executor-parallel federation path
(VERDICT r11 next #5).

Round 11 landed SCRAM-SHA-256(-PLUS) auth and TLS transport with
correctness pins but no cost number. This probe times the SAME
4-partition binary-COPY customer scan (each Spark task opens its own
wire connection inside mapInPandas — the production bulk path)
under:

* ``trust``  — plaintext socket, trust auth (the fixture default)
* ``tls+scram`` — SCRAM-SHA-256-PLUS over TLS with channel binding

at 1x and ``TLS_PROBE_FACTOR``x replicated volume (the 10x row
separates the per-connection handshake tax — constant — from the
per-byte encryption tax — linear). Results go to SCALE.md; if the
tax exceeds ~1.5x the next step VERDICT names is SSLSocket write
chunking.

Run: python scripts/tls_overhead_probe.py
     TLS_PROBE_FACTOR=10 TLS_PROBE_RUNS=3 python scripts/tls_overhead_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("TLS_PROBE_FACTOR", "1"))
RUNS = int(os.environ.get("TLS_PROBE_RUNS", "3"))
KEY_OFFSET = 100_000_000


def main() -> None:
    from datafusion_rdbms_ext_spark.queries.base import ensure_tables
    from datafusion_rdbms_ext_spark.session import get_spark
    from datafusion_rdbms_ext_spark.sources.connector import (
        PostgresConnector,
        connector_scan,
    )
    from datafusion_rdbms_ext_spark.sources.pgserver import (
        PG_PORT,
        PG_USER,
        ensure_scram_role,
        ensure_ssl,
        load_fixture,
        schema_for,
    )
    from datafusion_rdbms_ext_spark.sources.pgwire import PgWireClient

    spark = get_spark("tls-overhead-probe")
    ensure_tables(spark, SF_DIR)
    params = load_fixture(spark, SF_DIR)
    scram = ensure_scram_role()
    ssl = ensure_ssl()
    schema = schema_for(SF_DIR)

    # replicate customer FACTOR x inside the server (key-offset, so
    # quantile partition planning sees a real spread)
    probe_tbl = f"tlsprobe_customer_{FACTOR}x"
    cli = PgWireClient(**params)
    try:
        cli.query(f"SET search_path TO {schema}, public")
        _, _, have = cli.query(
            "SELECT COUNT(*) FROM information_schema.tables WHERE "
            f"table_schema = '{schema}' AND table_name = '{probe_tbl}'"
        )
        if have[0][0] == 0:
            cli.query(
                f"CREATE TABLE {probe_tbl} AS "
                + " UNION ALL ".join(
                    f"SELECT c_custkey + {i * KEY_OFFSET} AS c_custkey, "
                    "c_name, c_nationkey, c_acctbal, c_mktsegment "
                    "FROM customer"
                    for i in range(FACTOR)
                )
            )
        _, _, n = cli.query(f"SELECT COUNT(*) FROM {probe_tbl}")
        n_rows = n[0][0]
    finally:
        cli.close()

    arms = {
        "trust": (
            f"host=127.0.0.1 port={PG_PORT} user={PG_USER} dbname=postgres"
        ),
        "tls_scram": (
            f"host=127.0.0.1 port={PG_PORT} user={scram['user']} "
            f"password={scram['password']} dbname=postgres "
            f"sslmode=require"
        ),
    }
    out: dict[str, float] = {}
    for arm, dsn in arms.items():
        con = PostgresConnector(dsn, schema=schema)
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = connector_scan(
                spark,
                con,
                probe_tbl,
                partitions=4,
                partition_key="c_custkey",
            )
            got = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("c_custkey").alias("k"),
            ).collect()[0]
            assert got["n"] == n_rows and got["k"] == n_rows, (arm, got)
            best = min(best, time.perf_counter() - t0)
        out[arm] = round(best, 3)
        print(f"# {arm}: best-of-{RUNS} {best:.3f}s rows={n_rows}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "tls_scram_overhead",
                "factor": FACTOR,
                "rows": n_rows,
                "trust_sec": out["trust"],
                "tls_scram_sec": out["tls_scram"],
                "ratio": round(out["tls_scram"] / out["trust"], 3),
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
