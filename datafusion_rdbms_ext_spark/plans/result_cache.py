"""Plan-digest result cache — serve a repeated query from its
materialized prior result.

The reference caches nothing (every query re-executes,
physical_plan.rs plans from scratch); a warehouse front-end serving
dashboard traffic re-runs the same rollups constantly, so this layer
adds the standard result-cache contract on top of the engine:

* The cache KEY is a digest of the ANALYZED logical plan's canonical
  string (the same plan surface the transparent pushdown and MV
  rewrite walk) joined with a caller-supplied list of input snapshot
  tokens. Alias choices and DataFrame-vs-SQL authoring differences
  that analyze to the same canonical plan hit the same entry.
* A HIT reads the materialized parquet — no source scan at all. A
  MISS executes the frame, materializes it, and records the entry.
* INVALIDATION is by snapshot token: any change to an input's token
  (a new versioned-table version, a refreshed fixture dir mtime)
  changes the digest, so a stale entry simply stops being addressed
  — the Iceberg-style immutable-snapshot discipline, never in-place
  mutation.

Scale: the cached artifact is the query RESULT (rollup-sized, not
corpus-sized); the digest is computed from driver-side metadata only.
At 100 TB this is the difference between a dashboard refresh reading
a few KB of parquet and re-scanning a fact table.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def plan_digest(df: DataFrame, snapshot_tokens: list[str]) -> str:
    """Digest of the analyzed plan + input snapshot identity."""
    # canonicalized() normalizes expression IDs, so two separately
    # authored frames with the same semantics share a digest.
    canonical = df._jdf.queryExecution().analyzed().canonicalized().toString()
    payload = json.dumps(
        {"plan": canonical, "snapshots": sorted(snapshot_tokens)},
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


class ResultCache:
    """Parquet-backed result cache rooted at ``root``."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def _entry(self, digest: str) -> str:
        return os.path.join(self.root, digest)

    def get_or_compute(
        self,
        spark: SparkSession,
        df: DataFrame,
        snapshot_tokens: list[str],
        via: DataFrame | None = None,
    ) -> DataFrame:
        """Serve ``df``'s result from cache, executing at most once
        per (plan, snapshots) digest. ``via`` (round 9, the serving
        stack) executes a cheaper semantically-equal plan on a miss
        (an MV/skipping rewrite of ``df``) while the entry stays
        keyed on the ORIGINAL plan's digest — a later identical
        query hits regardless of which layer computed it."""
        digest = plan_digest(df, snapshot_tokens)
        path = self._entry(digest)
        marker = os.path.join(path, "_SUCCESS")
        if os.path.exists(marker):
            self.hits += 1
            return spark.read.parquet(path)
        self.misses += 1
        # Entries are content-addressed and immutable (ADVICE r8 #5):
        # never overwrite in place — a concurrent reader of the same
        # digest could observe the _SUCCESS marker deleted mid-write.
        # Materialize into a private temp dir, then atomically rename
        # into the digest path; if another writer won the race (the
        # marker appeared meanwhile), discard ours and read theirs.
        tmp = f"{path}.tmp-{os.getpid()}-{id(df)}"
        (via if via is not None else df).write.mode("overwrite").parquet(tmp)
        if os.path.exists(marker):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            try:
                os.rename(tmp, path)
            except OSError:
                # lost an atomic-rename race: the winner's entry is
                # byte-equivalent (same digest), use it
                shutil.rmtree(tmp, ignore_errors=True)
        return spark.read.parquet(path)
