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


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Physical ``Window`` nodes with an EMPTY partition spec — the
    single-task global sort that dies first at 100 TB (every row of
    the input lands on one executor core).

    Detection: in simple-mode physical plans a Window prints its
    top-level bracket groups as ``[exprs], [partcols], [ordercols]``
    — a fully-specified window has three; with only two, the second
    is the ORDER spec (contains ``ASC``/``DESC``) when the partition
    spec is empty, or the partition spec when there is no ORDER; a
    single group is a global-frame window over one task. Returns the
    offending lines; whether the INPUT is bounded (metadata-sized —
    #partitions offset merges, K-row rank stamps, histogram picks)
    is the caller's audit, via the sweep whitelist in
    tests/test_plans.py."""
    out = []
    for line in plan_string(df, "simple").splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        groups: list[str] = []
        depth = 0
        for ch in m.group(1):
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth -= 1
            if depth > 0:
                groups[-1] += ch
        if len(groups) >= 3:
            continue  # [exprs], [part], [order]
        if len(groups) == 2 and not re.search(
            r"\b(ASC|DESC)\b", groups[1]
        ):
            continue  # [exprs], [partcols] — partitioned, no order
        out.append(line.strip())
    return out


def broadcast_joins(df: DataFrame) -> int:
    """Count of broadcast joins in the plan."""
    p = plan_string(df)
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", p))
