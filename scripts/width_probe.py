"""Cluster-WIDTH scaling probe: strong scaling over executor threads.

Every round's 10x/100x probes measure DATA-volume scaling on a fixed
local[32] host; the standing caveat (SCALE.md, VERDICT r11-r13) is
that they say nothing about cluster-WIDTH effects — whether the plans
actually spread across more executors or serialize on a
single-partition stage (the classic 1000-executor failure mode:
a global window, an unpartitioned sort, a driver-side loop).

This probe re-times representative shuffle-heavy bench rows at sf0.1
under local[4] / local[8] / local[16] / local[32] — a strong-scaling
curve over an 8x width range. ``spark.sql.shuffle.partitions`` stays
at session.py's 32 for every width (partitions >= threads at each
point), so the curve isolates executor-width effects the way adding
executors under a fixed partitioning does on a real cluster.
Reading it:

* speedup(32/4) near the data-parallel fraction's ceiling => the plan
  spreads; a flat curve => something serializes (fixed overhead, a
  single-partition exchange, driver work).
* At sf0.1 fixed overhead (JVM scheduling, small stages) puts a hard
  floor under every row, so the HONEST summary is the trend, not the
  absolute ratio — perfectly-scaling rows still flatten once stage
  time approaches scheduling latency (~50-100ms/stage).

Each width runs in its OWN subprocess: a SparkSession's master is
fixed per JVM, and re-using one JVM across widths would let the
first width's warmed code cache subsidize the later ones. Per-query
best-of-RUNS within a width; queries run AFTER one untimed warm-up
pass of the first query to absorb one-time session costs.

Run:  python scripts/width_probe.py            (full table to stderr)
      WIDTH_PROBE_RUNS=3 WIDTH_PROBE_ONLY=a,b python scripts/width_probe.py
Results are recorded in SCALE.md (round-14 width table).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WIDTHS = [int(w) for w in os.environ.get("WIDTH_PROBE_WIDTHS", "4,8,16,32").split(",")]
RUNS = int(os.environ.get("WIDTH_PROBE_RUNS", "2"))

#: Shuffle-heavy representatives of the engine's main plan families:
#: scan+agg, multi-way join+agg, banded dedup shuffle, keyed-chain
#: k-means tree, event sessionization window, top-k similarity join.
DEFAULT_QUERIES = [
    "q01_pricing_summary",
    "q18_large_volume_customer",
    "llm_dedup_minhash_lsh",
    "llm_semdedup_tree_deep",
    "ev_markov_transitions",
    "llm_sim_topk_tree_beam",
]


def run_width(width: int, names: list[str]) -> dict[str, float]:
    """One width = one subprocess (fresh JVM, honest code cache)."""
    payload = json.dumps({"width": width, "names": names, "runs": RUNS})
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", payload],
        capture_output=True,
        text=True,
        cwd=ROOT,
        check=False,
    )
    for line in out.stdout.splitlines()[::-1]:
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"width {width} child failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def child(payload: str) -> None:
    cfg = json.loads(payload)
    width, names, runs = cfg["width"], cfg["names"], cfg["runs"]
    os.environ["SPARK_GRAFT_CPUS"] = str(width)
    from datafusion_rdbms_ext_spark.queries import REGISTRY
    from datafusion_rdbms_ext_spark.queries.base import ensure_tables
    from datafusion_rdbms_ext_spark.session import get_spark

    spark = get_spark(f"width-probe-{width}")
    ensure_tables(spark, SRC)
    # untimed warm-up: session/codegen one-time costs land here
    REGISTRY[names[0]].fn(spark, SRC).collect()
    times: dict[str, float] = {}
    for name in names:
        spec = REGISTRY[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.monotonic()
            spec.fn(spark, SRC).collect()
            best = min(best, time.monotonic() - t0)
        times[name] = round(best, 3)
    print(json.dumps(times), flush=True)
    os._exit(0)  # stop() can hang on callback-server threads


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return
    only = os.environ.get("WIDTH_PROBE_ONLY")
    names = only.split(",") if only else DEFAULT_QUERIES
    results = {w: run_width(w, names) for w in WIDTHS}
    print(f"\n| query | " + " | ".join(f"local[{w}] (s)" for w in WIDTHS)
          + " | speedup 4->32 |", file=sys.stderr)
    print("|---|" + "---|" * (len(WIDTHS) + 1), file=sys.stderr)
    for name in names:
        row = [results[w][name] for w in WIDTHS]
        sp = row[0] / row[-1] if row[-1] else float("inf")
        print(
            f"| {name} | " + " | ".join(f"{t:.2f}" for t in row)
            + f" | {sp:.1f}x |",
            file=sys.stderr,
        )
    print(json.dumps({str(w): results[w] for w in WIDTHS}))


if __name__ == "__main__":
    main()
