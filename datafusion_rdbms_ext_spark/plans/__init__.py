"""Plan introspection — the engine's Explain/Analyze surface.

The reference leaves ``LogicalPlan::Explain``/``Analyze`` unparsed
(todo!() at /root/reference/src/parser.rs:505-509); Spark exposes the
whole plan tree through ``df.explain``/``queryExecution``. This
module wraps that into queryable helpers the scale tests (and users)
assert against: exchange counts, cartesian detection, pushed filters,
read schemas.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (``EXPLAIN FORMATTED`` equivalent)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan contains an unconstrained product — the #1
    scale failure for pair-generation operators."""
    p = plan_string(df)
    return "CartesianProduct" in p


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded) —
    the unit of 100 TB cost a plan should minimize.

    Handles both explain formats: formatted mode prints a bare
    ``(n) Exchange`` node header (arguments on the next line), simple
    mode prints ``+- Exchange hashpartitioning(...)`` inline."""
    p = plan_string(df)
    formatted = len(re.findall(r"^\(\d+\)\s+Exchange\s*$", p, re.M))
    simple = len(
        re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", p)
    )
    return max(formatted, simple)


def pushed_filters(df: DataFrame) -> list[str]:
    """Per-scan PushedFilters lines — empty means a filter the scan
    could have skipped is running post-scan."""
    return [
        line.strip()
        for line in plan_string(df).splitlines()
        if "PushedFilters" in line
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """Per-scan ReadSchema lines — verifies column pruning reached
    the Parquet reader."""
    return [
        line.strip() for line in plan_string(df).splitlines() if "ReadSchema" in line
    ]


def broadcast_joins(df: DataFrame) -> int:
    """Count of broadcast joins in the plan."""
    p = plan_string(df)
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", p))
