"""Isolate and time individual bench queries (guide §1.4).

Times each named query with the noop sink after an untimed warm-up,
and reports the number of Spark jobs and stages one execution costs —
at sf0.1 the semdedup/tree family's wall time is dominated by
sequential job count, not data volume, so the job/stage census is the
number the optimization has to shrink.

Usage:
    python scripts/isolate_query.py <query> [query ...]   # 3 timed runs each
    SPARK_GRAFT_REPEATS=5 python scripts/isolate_query.py <query>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from datafusion_rdbms_ext_spark.queries import REGISTRY  # noqa: E402
from datafusion_rdbms_ext_spark.queries.base import ensure_tables  # noqa: E402
from datafusion_rdbms_ext_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("isolate-query")
    sc = spark.sparkContext
    ensure_tables(spark, SF_DIR)
    out: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY[name]
        if spec.prepare is not None:
            spec.prepare(spark, SF_DIR)
        # untimed warm-up (bench prepass analogue)
        spec.fn(spark, SF_DIR).count()

        runs: list[float] = []
        jobs = stages = 0
        for i in range(REPEATS):
            sc.setJobGroup(f"{name}-{i}", name)
            tracker = sc.statusTracker()
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            ids = tracker.getJobIdsForGroup(f"{name}-{i}")
            if i == 0:
                jobs = len(ids)
                stages = sum(
                    len(tracker.getJobInfo(j).stageIds)
                    for j in ids
                    if tracker.getJobInfo(j) is not None
                )
            sc.setJobGroup("", "")
        out[name] = {
            "best": round(min(runs), 3),
            "median": round(sorted(runs)[len(runs) // 2], 3),
            "runs": [round(r, 3) for r in runs],
            "jobs": jobs,
            "stages": stages,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
