"""Layered transparent serving stack — the engine's three rewrite
layers composed into one front door, each with the
try-rewrite-else-fall-through contract the reference's optimizer
defines (/root/reference/src/optimizer.rs:14-39):

1. **Result cache** (plans/result_cache.py): a repeated plan digest
   serves from its materialized prior result — zero source work.
2. **MV rewrite** (plans/mv.py): an aggregate derivable from a
   registered rollup reads the MV instead of the base table.
3. **Skipping rewrite** (plans/skipping.py): an eligible point/range
   filter reads only the composed index's surviving files.
4. **Base**: anything else executes unchanged.

Every layer is semantics-preserving or absent, so the stack's answer
is always the base plan's answer — the registered query runs the
whole stack under the differential oracle. A miss at one layer falls
to the next; a cache MISS that a lower layer serves still
materializes under the ORIGINAL plan's digest, so the next identical
query hits the cache regardless of which layer computed it.

Scale: this is the warehouse front-end's request path at 100 TB —
dashboard traffic terminates at layers 1-2 (KB-sized reads),
point-lookups at layer 3 (a handful of files), and only genuinely
novel plans pay a full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .mv import MaterializedView, mv_rewrite
from .result_cache import ResultCache, plan_digest
from .skipping import SkippingIndex, skipping_rewrite


def serve(
    df: DataFrame,
    cache: ResultCache | None = None,
    snapshot_tokens: list[str] | None = None,
    mvs: tuple[MaterializedView, ...] = (),
    indexes: tuple[SkippingIndex, ...] = (),
) -> tuple[DataFrame, str]:
    """Serve ``df`` through the cheapest applicable layer.

    Returns ``(frame, layer)`` with layer in
    ``{"cache", "mv", "skip", "base"}`` — the layer that will
    actually produce rows when the frame executes."""
    import os

    spark = df.sparkSession
    tokens = list(snapshot_tokens or [])

    if cache is not None:
        digest = plan_digest(df, tokens)
        marker = os.path.join(cache._entry(digest), "_SUCCESS")
        if os.path.exists(marker):
            cache.hits += 1
            return spark.read.parquet(cache._entry(digest)), "cache"

    plan_frame, layer = df, "base"
    for mv in mvs:
        rewritten = mv_rewrite(df, mv)
        if rewritten is not df:
            plan_frame, layer = rewritten, "mv"
            break
    if layer == "base":
        for idx in indexes:
            rewritten = skipping_rewrite(df, idx)
            if rewritten is not df:
                plan_frame, layer = rewritten, "skip"
                break

    if cache is not None:
        # materialize under the ORIGINAL digest via the winning plan
        return cache.get_or_compute(spark, df, tokens, via=plan_frame), layer
    return plan_frame, layer
