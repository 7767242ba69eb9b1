"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime, but two shapes still need explicit salting at 100 TB:
a groupBy whose hottest key exceeds one task's memory, and a join
whose hot build key defeats even a split shuffle. Both classical
remedies are pure DataFrame compositions:

* Salted aggregation: shard each key into ``buckets`` sub-keys,
  partially aggregate (key, salt), then aggregate the partials —
  the hot key's work spreads over ``buckets`` tasks, and because
  the aggregate is reassociated, results are unchanged (pair with
  exact-decimal sums when the measure is floating point).
* Salted join: shard the skewed probe side by a row-content hash and
  replicate the (small-enough) build side across every shard — the
  hot key's probe rows now meet the build rows in ``buckets``
  separate tasks.

Salts are derived from row-content hashes, not rand(): determinism
keeps retries/speculative tasks consistent and results testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    ``aggs`` maps output names to REASSOCIABLE aggregate expressions:
    phase one computes them per (keys, salt), phase two refolds the
    partials per keys. The refold is dispatched on the output-name
    prefix — ``sum_``/``n_`` partials re-sum (a count of counts is a
    sum), ``min_`` re-mins, ``max_`` re-maxes; any other prefix is
    rejected because this function cannot know how to merge it
    (avg/median etc. are not refoldable from per-salt results —
    express avg as sum_x / n_x over two entries)."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    final_aggs = []
    for name in aggs:
        if name.startswith(("sum_", "n_")):
            final_aggs.append(F.sum(name).alias(name))
        elif name.startswith("min_"):
            final_aggs.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            final_aggs.append(F.max(name).alias(name))
        else:
            raise ValueError(
                f"salted_agg refolds sum_*/n_*/min_*/max_* outputs; got {name!r}"
            )
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    buckets: int = 8,
) -> DataFrame:
    """Equi-join with the left (skewed/probe) side salted and the
    right (build) side replicated across all salt shards.

    Build-side replication costs buckets× its size — use only when
    the build side is modest and a hot probe key is the bottleneck."""
    l_salted = left.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(buckets))
    )
    r_replicated = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    # Keys resolved through the DataFrame handles so left_key ==
    # right_key (the common case) is not an ambiguous reference.
    return (
        l_salted.join(
            r_replicated,
            (l_salted[left_key] == r_replicated[right_key])
            & (l_salted["_salt"] == r_replicated["_salt"]),
        )
        .drop("_salt")
    )
