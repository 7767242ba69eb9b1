"""Per-job census for one query: job count, per-job stage call sites.

Round-15 probe (guide §1/§7): names WHERE the driver round-trips go —
each job's stages carry their call-site name (posexplode/collect/
broadcast/checkpoint), which is the evidence the Lloyd's job-floor
work needs before touching anything.

Usage:
    python scripts/job_census.py <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from datafusion_rdbms_ext_spark.queries import REGISTRY  # noqa: E402
from datafusion_rdbms_ext_spark.queries.base import ensure_tables  # noqa: E402
from datafusion_rdbms_ext_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("job-census")
    sc = spark.sparkContext
    ensure_tables(spark, SF_DIR)
    for name in names:
        spec = REGISTRY[name]
        if spec.prepare is not None:
            spec.prepare(spark, SF_DIR)
        spec.fn(spark, SF_DIR).count()  # warm-up (untimed)

        sc.setJobGroup(f"census-{name}", name)
        tracker = sc.statusTracker()
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        ids = sorted(tracker.getJobIdsForGroup(f"census-{name}"))
        sc.setJobGroup("", "")
        print(f"== {name}: {dt:.2f}s, {len(ids)} jobs")
        for j in ids:
            info = tracker.getJobInfo(j)
            if info is None:
                print(f"  job {j}: <expired>")
                continue
            stages = []
            for s in sorted(info.stageIds):
                si = tracker.getStageInfo(s)
                stages.append(si.name if si is not None else f"s{s}?")
            print(f"  job {j} ({len(info.stageIds)} stages): " + " | ".join(stages))


if __name__ == "__main__":
    main()
