"""Capture `.explain("formatted")` output for bench queries.

Round-14 optimization deliverable: plans/r14/<query>_{before,after}.txt
for every query the round touches (guide §1: record the plan shape —
Exchange count, join strategy, PushedFilters, BatchEvalPython nodes —
before and after each change).

Usage:
    python scripts/capture_plans.py <suffix> [query ...]

Writes plans/r14/<query>_<suffix>.txt for each named query (default:
every bench-tagged query). Building the DataFrame may execute eager
prep (localCheckpoint) — that is fine; only the plan text is kept.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from datafusion_rdbms_ext_spark.queries import REGISTRY  # noqa: E402
from datafusion_rdbms_ext_spark.queries.base import ensure_tables  # noqa: E402
from datafusion_rdbms_ext_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [
        s.name for s in REGISTRY.values() if "bench" in s.tags
    ]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-capture")
    ensure_tables(spark, SF_DIR)
    for name in names:
        spec = REGISTRY[name]
        try:
            if spec.prepare is not None:
                spec.prepare(spark, SF_DIR)
            df = spec.fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — record and continue
            txt = f"ERROR {type(exc).__name__}: {exc}"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
